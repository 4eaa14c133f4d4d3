"""Brute-force and batch k-NN over the embeddings table.

Scale notes:
- Single-query top-k: the query vector joins in as a broadcast
  1-row side (kept in-plan — no driver collect), similarity is a
  projection over the scan, and the top-k is TakeOrderedAndProject
  (per-partition heaps + tiny driver merge). This is the exact shape
  a 100 TB brute-force scan wants.
- Batch top-k: Q query vectors broadcast, cross-join projection
  computes Q·N similarities, per-query rank via window on the query
  id. The shuffle carries only (query_id) partitions; for large Q
  switch to the LSH path (vector/lsh.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from .similarity import cosine, dot, norm2


def _query_vec(embeddings: DataFrame, vec_id: int) -> DataFrame:
    return embeddings.where(F.col("vec_id") == vec_id).select(
        F.col("embedding").alias("q_embedding")
    )


def knn_cosine(embeddings: DataFrame, query_vec_id: int, k: int = 20) -> DataFrame:
    """Top-k by cosine similarity to the embedding of ``query_vec_id``
    (query row itself excluded) → (vec_id, label, cosine_sim)."""
    q = broadcast(_query_vec(embeddings, query_vec_id))
    scored = (
        embeddings.where(F.col("vec_id") != query_vec_id)
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


def knn_dot(embeddings: DataFrame, query_vec_id: int, k: int = 20) -> DataFrame:
    q = broadcast(_query_vec(embeddings, query_vec_id))
    scored = (
        embeddings.where(F.col("vec_id") != query_vec_id)
        .crossJoin(q)
        .select(
            "vec_id",
            "label",
            F.round(dot(F.col("embedding"), F.col("q_embedding")), 6).alias(
                "dot_product"
            ),
        )
    )
    return scored.orderBy(F.col("dot_product").desc(), F.col("vec_id")).limit(k)


def knn_batch(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Per-query top-k: ``queries`` is (q_id, q_embedding), broadcast.
    → (q_id, vec_id, cosine_sim, rank).

    CONTRACT: q_ids share the corpus vec_id namespace — queries are
    corpus vectors asking for their neighbors, and the q_id != vec_id
    filter is SELF-exclusion. For an external query set, renumber
    q_ids outside the corpus id range (e.g. negative), or corpus
    vectors that happen to share an id are silently excluded from
    that query's candidates. Same contract in binary.hamming_knn and
    evaluate.matryoshka_recall."""
    scored = embeddings.crossJoin(broadcast(queries)).select(
        "q_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6).alias(
            "cosine_sim"
        ),
    ).where(F.col("q_id") != F.col("vec_id"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label per-dimension centroid → (label, pos, centroid).
    posexplode + groupBy(label,pos): one shuffle with map-side
    partial aggregation; emitting (label,pos) rows instead of
    re-assembled arrays keeps the result oracle-checkable."""
    exploded = embeddings.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    return exploded.groupBy("label", "pos").agg(
        F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid")
    )


def norm_stats(embeddings: DataFrame) -> DataFrame:
    """Per-label L2-norm statistics."""
    with_norm = embeddings.select(
        "label", norm2(F.col("embedding")).alias("norm")
    )
    return with_norm.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
        F.round(F.avg("norm"), 6).alias("avg_norm"),
    )


def knn_range(
    embeddings: DataFrame, query_vec_id: int, threshold: float = 0.2
) -> DataFrame:
    """Radius search: ALL vectors with cosine ≥ threshold to the
    query (query row excluded) → (vec_id, label, cosine_sim).
    Same broadcast-query single-scan plan as top-k, but the filter
    replaces the global sort — cheaper than knn when the radius is
    selective, and embarrassingly parallel at any corpus size."""
    q = broadcast(_query_vec(embeddings, query_vec_id))
    sim = F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6)
    return (
        embeddings.where(F.col("vec_id") != query_vec_id)
        .crossJoin(q)
        .select("vec_id", "label", sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-dimension corpus statistics over the embedding column:
    (pos, n, min_val, max_val, avg_val) — the normalization /
    dead-dimension audit a feature store runs before training.
    posexplode is a narrow 64× fan-out feeding one partial-agg
    shuffle on the dimension index (64 keys) — min/max/sum all
    combine map-side, so shuffle volume is O(dims × partitions)."""
    return (
        embeddings.select(F.posexplode("embedding").alias("pos", "v"))
        .select("pos", F.col("v").cast("double").alias("v"))
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("min_val"),
            F.max("v").alias("max_val"),
            F.round(F.avg("v"), 6).alias("avg_val"),
        )
    )


def cosine_distribution(
    embeddings: DataFrame, sample_max_id: int = 1000, buckets_per_unit: int = 10
) -> DataFrame:
    """Pairwise-cosine histogram over a bounded id-sample →
    (cos_bucket, n_pairs): the embedding-space health check (a
    healthy space spreads mass across buckets; collapse toward 1.0
    means the encoder lost discrimination — the signal behind
    'embedding collapse' monitoring).

    All-pairs is quadratic, so the scan is CAPPED to vec_id <
    ``sample_max_id`` (deterministic sample, not rand()); at 100 TB
    you'd feed the md5 exact-k sampler output instead. Buckets are
    floor(round(cos,6)·10) — integer keys, so the histogram is
    hash-exact cross-engine."""
    s = embeddings.where(F.col("vec_id") < sample_max_id).select(
        "vec_id", "embedding"
    )
    a = s.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = s.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("va") < F.col("vb")).select(
        F.floor(
            F.round(cosine(F.col("ea"), F.col("eb")), 6)
            * buckets_per_unit
        )
        .cast("bigint")
        .alias("cos_bucket")
    )
    return pairs.groupBy("cos_bucket").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )


def hard_negatives(
    embeddings: DataFrame, n_anchors: int = 10, k: int = 5
) -> DataFrame:
    """Contrastive-training hard-negative mining: for each anchor
    vector, the top-k most-similar vectors with a DIFFERENT label —
    the negatives that sit closest to the decision boundary and carry
    the most gradient signal.

    → (q_id, q_label, vec_id, neg_label, cosine_sim, rank).

    Plan: the anchor set broadcasts (it's tiny — the batch you mine
    for is bounded per training step), similarity is a projection
    over ONE corpus scan, and the per-anchor top-k is a window on the
    broadcast-side key, so the corpus never shuffles on anything
    wider than q_id. At 100 TB with large anchor sets you'd swap the
    scan for the LSH/IVF candidate path (vector/lsh.py, ivf.py) and
    rescore exactly — the mining rank logic is unchanged.
    """
    anchors = broadcast(
        embeddings.where(F.col("vec_id") < n_anchors).select(
            F.col("vec_id").alias("q_id"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("q_embedding"),
        )
    )
    scored = (
        embeddings.crossJoin(anchors)
        .where(F.col("label") != F.col("q_label"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            F.col("label").alias("neg_label"),
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).where(F.col("rank") <= k)


def knn_outliers(
    embeddings: DataFrame,
    k: int = 5,
    top: int = 20,
    sample_max_id: int = 300,
) -> DataFrame:
    """Embedding outliers by k-NN distance → (vec_id, label,
    knn_dist): the ``top`` vectors whose distance to their k-th
    nearest neighbor is largest — far-from-everything points are
    mislabel/misembed/junk candidates (the distance-based cousin of
    bridge_centroid_outliers' centroid test, catching outliers that
    sit far from ALL mass, not just their own label's).

    All-pairs is quadratic, so the scan caps to a deterministic id
    sample (the vec_cosine_distribution pattern); at 100 TB the
    candidate pairs come from the ANN index instead and the ranking
    logic is unchanged."""
    s = embeddings.where(F.col("vec_id") < sample_max_id).select(
        "vec_id", "label", "embedding"
    )
    a = s.select(
        F.col("vec_id").alias("va"),
        F.col("label").alias("la"),
        F.col("embedding").alias("ea"),
    )
    b = s.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    d = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("ea"),
                    F.col("eb"),
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        6,
    )
    pairs = a.join(b, F.col("va") != F.col("vb")).select(
        "va", "la", d.alias("dist")
    )
    w = Window.partitionBy("va").orderBy("dist", "la")
    kth = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == k)
        .select(
            F.col("va").alias("vec_id"),
            F.col("la").alias("label"),
            F.col("dist").alias("knn_dist"),
        )
    )
    return kth.orderBy(F.col("knn_dist").desc(), "vec_id").limit(top)
