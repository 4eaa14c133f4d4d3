"""Deterministic Lloyd's k-means over the embedding table — the
clustering primitive a training-data pipeline runs for corpus
bucketing (domain discovery, per-cluster sampling quotas) and that
IVF-style ANN uses as its coarse quantizer (vector/ivf.py trains
cells the same way conceptually; this op exposes clustering as a
first-class, ORACLE-VERIFIED surface).

Cross-engine determinism (the whole trick — a naive float k-means
can NOT hash-match across engines because centroid means depend on
float addition order):

- components quantize to scaled BIGINTs once at the start
  (``q = floor(v·2²⁰ + 0.5)`` — floor of an exact double is
  engine-independent), so every distance is an EXACT integer:
  Σ(q_i−c_i)² ≤ 64·(2·2²⁰)² ≈ 2.8e14 ≪ 2⁶³;
- centroid updates are integer sums (order-independent, map-side
  combinable) floor-divided via double division — sums stay < 2⁵³ so
  the double quotient is exact and FLOOR matches bit-for-bit;
- init = the k vectors with smallest md5('km:'||vec_id) (tiebreak
  vec_id), the repo's standard seeded-hash convention;
- assignment argmin breaks ties by cluster id: min(struct(dist,
  cluster)) ≡ ROW_NUMBER() OVER (ORDER BY dist, cluster);
- a cluster that loses all members keeps its previous centroid
  (COALESCE in both engines).

The DuckDB oracle unrolls the identical ``iters`` rounds in SQL
(oracles_vector._kmeans_oracle), so the gate hash-verifies an
ITERATIVE clustering algorithm — same pattern as the PageRank /
k-core oracles.

Scale: per round, one broadcast of k·dim centroid ints against the
quantized table (narrow map — the k×N distance matrix never
materializes wider than k rows per vector), one (cluster, pos)
rollup with map-side partial sums. The quantized table is
localCheckpoint'd once and reused by every round — the loop
invariant the census wants. k and dim are constants; rounds are
fixed (static plan, oracle-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

K = 8
ITERS = 3
SCALE = 1 << 20


def _fit(embeddings: DataFrame, k: int = K, iters: int = ITERS):
    """Run the Lloyd loop → (quantized table, final centroid DF
    (cluster, q)) — shared by the batch assignment and the streaming
    serving twin (which collects the k·dim centroid ints as the
    deployed model)."""
    q = embeddings.select(
        "vec_id",
        F.expr(
            f"transform(embedding, v -> "
            f"CAST(FLOOR(CAST(v AS DOUBLE) * {SCALE} + 0.5) AS BIGINT))"
        ).alias("q"),
    ).localCheckpoint(eager=True)

    init = (
        q.select(
            "vec_id",
            "q",
            F.md5(F.concat(F.lit("km:"), F.col("vec_id").cast("string"))).alias(
                "h"
            ),
        )
        .orderBy("h", "vec_id")
        .limit(k)
    )
    from pyspark.sql.window import Window

    cents = init.withColumn(
        "cluster",
        (F.row_number().over(Window.orderBy("h", "vec_id")) - 1).cast("int"),
    ).select("cluster", "q")

    for _ in range(iters):
        a = _assign(q, cents)
        sums = (
            a.select("cluster", F.posexplode("q").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        )
        newc = (
            sums.select(
                "cluster",
                "pos",
                F.expr(
                    "CAST(FLOOR(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
                    "AS BIGINT)"
                ).alias("c"),
            )
            .groupBy("cluster")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc")
            )
            .select(
                "cluster", F.expr("transform(pc, x -> x.c)").alias("qn")
            )
        )
        # empty cluster keeps its previous centroid (deterministic)
        cents = (
            cents.join(newc, "cluster", "left")
            .select("cluster", F.coalesce("qn", "q").alias("q"))
            .localCheckpoint(eager=True)
        )

    return q, cents


DIST_EXPR = (
    "aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
)


def _assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    d = q.crossJoin(
        broadcast(cents.select("cluster", F.col("q").alias("c")))
    ).select("vec_id", "q", "cluster", F.expr(DIST_EXPR).alias("dist"))
    return (
        d.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cluster", "q")).alias("s"))
        .select(
            "vec_id",
            F.col("s.cluster").alias("cluster"),
            F.col("s.q").alias("q"),
            F.col("s.dist").alias("dist"),
        )
    )


def fit_centroids(
    embeddings: DataFrame, k: int = K, iters: int = ITERS
) -> DataFrame:
    """The deployable model: (cluster, q) — k rows of quantized
    centroid ints after ``iters`` Lloyd rounds."""
    _, cents = _fit(embeddings, k, iters)
    return cents


def kmeans_assign(
    embeddings: DataFrame, k: int = K, iters: int = ITERS
) -> DataFrame:
    """→ (vec_id, cluster, dist_q, cluster_size): final assignment
    against the round-``iters`` centroids, quantized squared distance
    (exact BIGINT at 2⁻²⁰ component resolution), and the size of the
    assigned cluster."""
    q, cents = _fit(embeddings, k, iters)
    final = _assign(q, cents)
    sizes = final.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return final.join(broadcast(sizes), "cluster").select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.col("dist").cast("bigint").alias("dist_q"),
        "cluster_size",
    )
