"""ANN quality evaluation: recall@k of each approximate index (LSH,
IVF) against the exact brute-force top-k, per probe query — the
regression harness a production vector service runs after every index
rebuild or parameter change.

Fully distributed: no driver-side loop over probe queries. The exact
truth is one batched brute pass (Q·N scored rows for small Q), each
ANN path generates candidates for ALL probes in one plan (the index
table is built/scanned once, not per query), and recall is a
(q_id, vec_id)-keyed join of the two top-k tables. At 100 TB the
index tables are written once and reused; the eval cost is the probe
batch, which is how online recall monitoring runs anyway.

Gate: rows-only (LSH planes / IVF cells are not SQL-expressible);
recall floors are pytest-asserted in tests/test_vector.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from . import ivf as ivf_mod
from . import lsh as lsh_mod
from .knn import knn_batch
from .similarity import cosine


def _probe_queries(embeddings: DataFrame, n_queries: int) -> DataFrame:
    """First ``n_queries`` vectors by vec_id as (q_id, q_embedding) —
    deterministic probe set."""
    return (
        embeddings.orderBy("vec_id")
        .limit(n_queries)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding"))
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id")
    )


def _rescore_topk(
    cands: DataFrame, embeddings: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """Exact-rescore (q_id, vec_id) candidates and keep top-k per
    probe. Candidates join the embeddings on vec_id; the probe set is
    broadcast."""
    scored = (
        cands.join(embeddings.select("vec_id", "embedding"), "vec_id")
        .join(broadcast(queries), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    return _topk(scored, k)


def _lsh_candidates(
    embeddings: DataFrame, queries: DataFrame, dim: int
) -> DataFrame:
    """(q_id, vec_id) LSH bucket-agreement candidates for every probe
    in ONE index scan (the probes' signature rows are broadcast)."""
    index = lsh_mod.bucketize(embeddings, dim)
    q_sigs = broadcast(
        index.join(
            queries.select(F.col("q_id").alias("vec_id")), "vec_id", "leftsemi"
        ).select(F.col("vec_id").alias("q_id"), "table_id", "sig")
    )
    return (
        index.join(q_sigs, ["table_id", "sig"])
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )


def _ivf_candidates(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    n_probe: int,
    cents: DataFrame | None = None,
) -> DataFrame:
    """(q_id, vec_id) IVF candidates: every probe scans only its
    ``n_probe`` nearest cells of the coarse quantizer (label-seeded +
    refined by default; pass ``cents`` to evaluate an externally
    trained quantizer, e.g. the integer-exact Lloyd centroids)."""
    if cents is None:
        cents = ivf_mod.kmeans_refine(
            embeddings, ivf_mod.label_centroids(embeddings, dim), dim, steps=1
        )
    assigned = ivf_mod.assign_cells(embeddings, cents)
    probe = (
        broadcast(queries)
        .crossJoin(broadcast(cents))
        .select(
            "q_id",
            "cell",
            ivf_mod._sq_dist(F.col("q_embedding"), F.col("centroid")).alias("d"),
        )
    )
    w = Window.partitionBy("q_id").orderBy("d", "cell")
    probe_cells = (
        probe.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n_probe)
        .select("q_id", "cell")
    )
    return (
        assigned.join(broadcast(probe_cells), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )


def recall_eval(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    dim: int = 64,
    n_probe: int = 3,
) -> DataFrame:
    """(method, q_id, n_hits, recall) — recall@k of each ANN path vs
    the exact brute top-k, one row per (method, probe query).

    ``recall`` is |approx ∩ exact| / k; the brute truth uses the same
    deterministic (cosine desc, vec_id) tiebreak as the ANN rescoring,
    so the metric is reproducible bit-for-bit across runs.
    """
    queries = _probe_queries(embeddings, n_queries)
    truth = knn_batch(embeddings, queries, k).select("q_id", "vec_id")

    paths = {
        "lsh": _rescore_topk(
            _lsh_candidates(embeddings, queries, dim), embeddings, queries, k
        ),
        "ivf": _rescore_topk(
            _ivf_candidates(embeddings, queries, dim, n_probe), embeddings, queries, k
        ),
        "ivfk": _rescore_topk(
            _ivf_candidates(
                embeddings, queries, dim, n_probe, cents=_kmeans_cents(embeddings)
            ),
            embeddings,
            queries,
            k,
        ),
    }
    outs = []
    for method, approx in paths.items():
        hits = approx.join(truth, ["q_id", "vec_id"]).groupBy("q_id").agg(
            F.count("*").alias("n_hits")
        )
        outs.append(
            queries.select("q_id")
            .join(hits, "q_id", "left")
            .select(
                F.lit(method).alias("method"),
                "q_id",
                F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
                F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(k), 6).alias("recall"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _kmeans_cents(embeddings: DataFrame) -> DataFrame:
    """(cell, centroid array<double>): the vec_kmeans Lloyd centroids
    dequantized — lets the recall harness compare the label-seeded
    quantizer against the geometry-only trained one."""
    from .kmeans import SCALE, fit_centroids

    return fit_centroids(embeddings).select(
        F.col("cluster").alias("cell"),
        F.expr(f"transform(q, v -> CAST(v AS DOUBLE) / {SCALE})").alias(
            "centroid"
        ),
    )


MATRYOSHKA_DIMS = (8, 16, 32)


def matryoshka_recall(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dims: tuple[int, ...] = MATRYOSHKA_DIMS,
) -> DataFrame:
    """Truncation-dimension recall curve → (q_id, dim_trunc,
    n_overlap, recall): overlap@k of cosine top-k computed on the
    first ``d`` dims vs the full vector, per probe query — the eval
    that decides how far Matryoshka-style embedding truncation
    (Kusupati et al. 2022) can cut serving cost before quality falls
    off.

    One corpus scan computes the full cosine AND every truncated
    cosine per row; the per-query ranks are window functions sharing
    one q_id exchange (different sort orders reuse the partitioning).
    Integer overlap counts + a /k display division keep the result
    fully oracle-checkable despite the float scoring (same
    round-to-6-then-rank contract as ``knn_batch``).

    Scale: probes are a bounded broadcast set, so cost is Q scans of
    the corpus fused into one; this is the offline eval-harness
    pattern, not a serving path."""
    exprs = [
        F.round(
            cosine(
                F.slice("embedding", 1, d), F.slice("q_embedding", 1, d)
            ),
            6,
        ).alias(f"cos_{d}")
        for d in dims
    ] + [F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6).alias("cos_full")]
    scored = (
        embeddings.crossJoin(broadcast(queries))
        .where(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", *exprs)
    )
    def rank(col):
        w = Window.partitionBy("q_id").orderBy(F.col(col).desc(), "vec_id")
        return F.row_number().over(w)

    ranked = scored.select(
        "q_id",
        rank("cos_full").alias("rank_full"),
        *[rank(f"cos_{d}").alias(f"rank_{d}") for d in dims],
    )
    stack = ", ".join(f"{d}, rank_{d}" for d in dims)
    unp = ranked.select(
        "q_id",
        "rank_full",
        F.expr(
            f"stack({len(dims)}, {stack}) AS (dim_trunc, rank_t)"
        ),
    )
    hit = (F.col("rank_t") <= k) & (F.col("rank_full") <= k)
    return (
        unp.groupBy("q_id", F.col("dim_trunc").cast("int").alias("dim_trunc"))
        .agg(F.sum(hit.cast("bigint")).alias("n_overlap"))
        .select(
            "q_id",
            "dim_trunc",
            "n_overlap",
            F.round(F.col("n_overlap") / F.lit(k), 6).alias("recall"),
        )
    )
