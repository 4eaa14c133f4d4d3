"""Johnson-Lindenstrauss random projection: 64-d → k-d with ±1 sign
matrices, plus the distance-distortion audit that justifies using the
projected space for coarse candidate generation.

The JL lemma says an n-point set embeds into O(log n / ε²) dimensions
with pairwise distances preserved within 1±ε; the ±1/√k matrix
(Achlioptas) achieves it without Gaussians, and md5-derived signs make
the matrix deterministic cross-engine — the oracle embeds the SAME
sign constants in SQL (the ann_lsh_cosine pattern).

Scale: projection is a pure column expression over one scan (zero
shuffle, codegen); the distortion audit caps its pair sample by id
(deterministic, not rand()) exactly like vec_cosine_distribution.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

RP_DIM = 16


def rp_signs(dim: int = 64, k: int = RP_DIM) -> list[list[int]]:
    """k rows of ±1 signs, row j entry i = sign bit of md5("rp{j}:{i}")."""
    return [
        [
            1 if hashlib.md5(f"rp{j}:{i}".encode()).digest()[0] & 0x80 else -1
            for i in range(dim)
        ]
        for j in range(k)
    ]


def _proj_cols(vec_col, signs: list[list[int]]):
    """One projected coordinate per sign row: ⟨v, s_j⟩ / √k with √k
    exact for k=16 (=4.0) — aggregate over the array in order, so the
    float sum is the same sequence in Spark and DuckDB's list_sum."""
    k = len(signs)
    scale = float(k) ** 0.5
    cols = []
    for j, row in enumerate(signs):
        lit_row = F.array(*[F.lit(float(s)) for s in row])
        dot = F.aggregate(
            F.zip_with(vec_col, lit_row, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append((dot / scale).alias(f"p{j}"))
    return cols


def rp_project(embeddings: DataFrame, k: int = RP_DIM, dim: int = 64) -> DataFrame:
    """→ (vec_id, label, p0..p{k-1}): the projected coordinates."""
    signs = rp_signs(dim, k)
    return embeddings.select(
        "vec_id", "label", *_proj_cols(F.col("embedding"), signs)
    )


def rp_distortion(
    embeddings: DataFrame,
    k: int = RP_DIM,
    dim: int = 64,
    sample_max_id: int = 300,
    buckets_per_unit: int = 10,
) -> DataFrame:
    """Distance-distortion histogram → (ratio_bucket, n_pairs):
    floor(round(‖Pa−Pb‖²/‖a−b‖², 6)·10) over a deterministic
    id-capped pair sample. A healthy projection concentrates mass in
    the buckets around 1.0 (ratio ≈ 1±ε); heavy tails mean k is too
    small for the point count. Integer bucket keys keep the histogram
    hash-exact cross-engine."""
    signs = rp_signs(dim, k)
    s = embeddings.where(F.col("vec_id") < sample_max_id).select(
        "vec_id", "embedding", *_proj_cols(F.col("embedding"), signs)
    )
    pk = [f"p{j}" for j in range(k)]
    a = s.select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        *[F.col(c).alias(f"a{j}") for j, c in enumerate(pk)],
    )
    b = s.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        *[F.col(c).alias(f"b{j}") for j, c in enumerate(pk)],
    )
    d2_orig = F.aggregate(
        F.zip_with(
            F.col("ea"),
            F.col("eb"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d2_proj = None
    for j in range(k):
        term = (F.col(f"a{j}") - F.col(f"b{j}")) * (
            F.col(f"a{j}") - F.col(f"b{j}")
        )
        d2_proj = term if d2_proj is None else d2_proj + term
    # identical vectors have d2_orig = 0 and no defined distortion —
    # filter them rather than DIVIDE_BY_ZERO under ANSI mode (exact
    # duplicates are expected in a dedup-oriented corpus); the oracle
    # applies the same predicate
    pairs = (
        a.join(b, F.col("va") < F.col("vb"))
        .where(d2_orig > 0)
        .select(
            F.floor(F.round(d2_proj / d2_orig, 6) * buckets_per_unit)
            .cast("bigint")
            .alias("ratio_bucket")
        )
    )
    return pairs.groupBy("ratio_bucket").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )
