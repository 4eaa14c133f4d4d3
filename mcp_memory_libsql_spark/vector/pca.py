"""Distributed PCA over an embedding column — the
"aggregate a small sufficient statistic, solve on the driver,
broadcast the model back" pattern.

At 100 TB the data never moves: one Arrow-batched pass computes each
partition's partial (count, sum, X^T X) — a d+d²-float payload per
partition regardless of row count — which reduce to the global
covariance on the driver; the d×d eigensolve is microseconds for
embedding-sized d; the top-k component matrix broadcasts back and the
projection is a second narrow map. This is how MLlib's own
RowMatrix.computePrincipalComponents works, re-expressed over
DataFrames (no RDD surface).

Sign convention: each component is flipped so its largest-magnitude
coordinate is positive (eigenvector sign is arbitrary; fixing it makes
projections deterministic run-to-run, though still basis-dependent —
hence the rows-only gate + pytest invariants instead of a SQL oracle).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("g", ArrayType(DoubleType())),  # flattened X^T X
    ]
)


def fit_pca(embeddings: DataFrame, k: int = 8):
    """Fit on the ``embedding`` column → (components [k×d] ndarray,
    mean [d], explained_variance [k]). One pass, no shuffle: partials
    are mapInPandas per partition, reduced driver-side (the reduce is
    over #partitions rows, not data rows).

    The worker fn is a nested def (ships by value — the repo needn't
    be importable on executors, same pattern as multimodal/media.py).
    """

    def _partial_moments(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        n, s, g = 0, None, None
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(0) if s is None else s + x.sum(0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    parts = embeddings.select("embedding").mapInPandas(
        _partial_moments, schema=_PARTIAL_SCHEMA
    )
    rows = parts.collect()  # one small row per partition
    n = sum(r.n for r in rows)
    s = np.sum([np.asarray(r.s) for r in rows], axis=0)
    g = np.sum([np.asarray(r.g) for r in rows], axis=0)
    d = s.shape[0]
    mu = s / n
    cov = g.reshape(d, d) / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)  # ascending
    idx = np.argsort(w)[::-1][:k]
    comps = v[:, idx].T
    flip = np.sign(comps[np.arange(len(idx)), np.abs(comps).argmax(1)])
    comps = comps * flip[:, None]
    return comps, mu, w[idx]


def project(embeddings: DataFrame, comps: np.ndarray, mu: np.ndarray) -> DataFrame:
    """(vec_id, label, pc array<double>) — center + project through
    the broadcast component matrix in one Arrow-batched narrow map."""
    c = comps.copy()
    m = mu.copy()
    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("label", LongType()),
            StructField("pc", ArrayType(DoubleType())),
        ]
    )

    def _proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            p = (x - m) @ c.T
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "label": pdf["label"].astype("int64"),
                    "pc": list(p),
                }
            )

    return embeddings.select("vec_id", "label", "embedding").mapInPandas(
        _proj, schema=out_schema
    )


def pca_projection(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """Fit + project; returns the first two PCs as scalar columns for
    the gated query (stable rounding for hash-free rows-only gate)."""
    comps, mu, _ = fit_pca(embeddings, k)
    proj = project(embeddings, comps, mu)
    return proj.select(
        "vec_id",
        "label",
        F.round(F.col("pc")[0], 6).alias("pc1"),
        F.round(F.col("pc")[1], 6).alias("pc2"),
    )


def gram_exact(embeddings: DataFrame, scale_bits: int = 20) -> DataFrame:
    """(i, j, gram) — integer-exact upper-triangle second-moment
    matrix of the corpus: coordinates quantized once to BIGINT
    (floor(x·2^scale_bits + 0.5) — the vector/quant.py rounding
    discipline, bit-identical across engines), then gram(i,j) =
    Σ_v q_i(v)·q_j(v) as an exact BIGINT sum. This is the distributed
    half of :func:`fit_pca`'s sufficient statistic (X^T X) under the
    hash gate — the driver-side eigensolve is deterministic LAPACK,
    so gating the accumulation is what proves the DISTRIBUTED part.

    Scale: no join — each row expands to its own d(d+1)/2 products
    in one narrow lambda (flatten(transform(...slice...))), and the
    groupBy's map-side partial aggregation collapses every partition
    to ≤ d(d+1)/2 rows before the exchange, so the shuffle is ~2080
    rows per partition regardless of corpus size. Overflow headroom:
    |x| < 1 in this corpus → product < 2^40, so BIGINT holds the sum
    beyond 2^22 vectors; shrink scale_bits if your corpus is larger
    or wider-valued.
    """
    s = float(1 << scale_bits)
    q = embeddings.select(
        F.expr(
            f"transform(embedding, x ->"
            f" CAST(floor(CAST(x AS DOUBLE) * {s} + 0.5) AS BIGINT))"
        ).alias("qe")
    )
    pairs = q.select(
        F.explode(
            F.expr(
                "flatten(transform(qe, (qi, i) ->"
                " transform(slice(qe, i + 1, size(qe) - i), (qj, k) ->"
                " struct(i AS i, i + k AS j, qi * qj AS p))))"
            )
        ).alias("t")
    )
    return (
        pairs.select("t.i", "t.j", "t.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("gram"))
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.col("gram").cast("bigint").alias("gram"),
        )
    )
