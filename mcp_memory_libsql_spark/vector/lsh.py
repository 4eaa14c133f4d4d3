"""Approximate nearest neighbors: random-hyperplane (SimHash) LSH.

The scale path for similarity search: brute-force cosine is a full
scan per query; LSH bucket-joins instead — vectors are hashed to
``n_tables`` independent signatures of ``n_bits`` hyperplane signs,
candidates = vectors sharing a signature with the query in any
table, and only candidates get exact scoring. At 100 TB the bucketed
table is written partitioned by (table_id, signature) so a query
touches only its buckets (partition pruning), and signatures are
tiny regardless of vector width.

Hyperplanes are deterministic (seeded md5 → uniform in [-1,1]) and
embedded in the plan as array literals — no driver-side data
collection, no RNG divergence between runs.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from .similarity import cosine

# Tuning: recall per neighbor ≈ 1-(1-(1-θ/π)^N_BITS)^N_TABLES.
# Defaults favor recall on weakly-similar corpora (top cosine ~0.3);
# raise N_BITS for tight near-dup thresholds (0.9+) to cut candidates.
N_TABLES = 16
N_BITS = 4


def _plane(seed: str, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane coefficients."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        (u,) = struct.unpack("<Q", h[:8])
        out.append(u / float(1 << 64) * 2.0 - 1.0)
    return out


def planes(dim: int, n_tables: int = N_TABLES, n_bits: int = N_BITS):
    return [
        [_plane(f"t{t}b{b}", dim) for b in range(n_bits)]
        for t in range(n_tables)
    ]


def _signature(vec_col, table_planes: list[list[float]]):
    """Signature = integer of sign bits of ⟨v, plane⟩ (all JVM-side:
    zip_with/aggregate against literal plane arrays)."""
    sig = F.lit(0)
    for j, plane in enumerate(table_planes):
        lit_plane = F.array(*[F.lit(c) for c in plane])
        d = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig


def bucketize(
    embeddings: DataFrame,
    dim: int,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
) -> DataFrame:
    """(vec_id, table_id, sig) — the LSH index table. On a cluster:
    write once, partitioned by (table_id, sig), reuse across queries."""
    ps = planes(dim, n_tables, n_bits)
    parts = [
        embeddings.select(
            "vec_id",
            F.lit(t).alias("table_id"),
            _signature(F.col("embedding"), ps[t]).alias("sig"),
        )
        for t in range(n_tables)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ann_cosine(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dim: int = 64,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
) -> DataFrame:
    """Approximate top-k by cosine: candidates from LSH bucket
    agreement, exact rescoring of candidates only.
    → (vec_id, label, cosine_sim)."""
    index = bucketize(embeddings, dim, n_tables, n_bits)
    q_sigs = broadcast(
        index.where(F.col("vec_id") == query_vec_id).select("table_id", "sig")
    )
    cand_ids = (
        index.join(q_sigs, ["table_id", "sig"], "leftsemi")
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id")
        .distinct()
    )
    q = broadcast(
        embeddings.where(F.col("vec_id") == query_vec_id).select(
            F.col("embedding").alias("q_embedding")
        )
    )
    scored = (
        embeddings.join(cand_ids, "vec_id", "leftsemi")
        .crossJoin(q)
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col("vec_id")).limit(k)


def near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
) -> DataFrame:
    """Embedding near-dup pairs via LSH candidates + exact rescore —
    the 100 TB path replacing the brute N² cross join
    (textops.dedup.embedding_near_pairs): candidates must share a
    bucket in ≥1 table, so the self-join shuffles on (table, sig)
    instead of materializing all pairs.
    → (vec_a, vec_b, cosine_sim)."""
    index = bucketize(embeddings, dim, n_tables, n_bits)
    cand = (
        index.alias("a")
        .join(
            index.alias("b"),
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    ea = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    eb = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    scored = (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cosine_sim"),
        )
    )
    return scored.where(F.col("cosine_sim") >= threshold)
