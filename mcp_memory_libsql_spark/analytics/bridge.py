"""Doc↔embedding bridge rollups: analytics that join the text corpus
(``documents``) to its vector representation (``embeddings``,
1:1 on ``doc_id = vec_id``).

These are the "is my embedding table consistent with my corpus"
audits a training-data pipeline runs before spending GPU-hours:
per-language vector statistics, label↔language purity, and
per-document distance to its own language centroid (mislabeled /
misembedded outlier candidates).

Scale notes:
- The doc⋈emb join is big⋈big on the primary key. At 100 TB both
  tables should be bucketed by id (io/layout.write_bucketed) making
  the join exchange-free; unbucketed it is one co-partitioned hash
  shuffle on the key — the minimum possible.
- Centroids: posexplode fans out dim× rows but the groupBy(lang,pos)
  partial-aggregates map-side, so the shuffle carries only
  langs×dim rows; the centroid table (langs×1 after reassembly) is
  broadcast back. No second shuffle of the big side.
- All averages follow the proven cross-engine pattern (double sums
  + ROUND 6); counts and ratios of exact integers are
  order-independent and engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..vector.similarity import cosine, norm2


def _pairs(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    return documents.join(
        embeddings, documents["doc_id"] == embeddings["vec_id"]
    )


def lang_embedding_stats(
    documents: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """Per-language corpus/vector rollup → (lang, n_docs, n_labels,
    avg_chars, avg_norm)."""
    p = _pairs(documents, embeddings).select(
        "lang",
        "n_chars",
        "label",
        norm2(F.col("embedding")).alias("nrm"),
    )
    return p.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("label").alias("n_labels"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg("nrm"), 6).alias("avg_norm"),
    )


def label_purity(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Per-label language purity → (label, n_docs, n_langs,
    dominant_lang, dominant_share).

    dominant_lang = the label's most frequent language
    (deterministic tiebreak: lexicographically smallest);
    dominant_share = its fraction of the label's docs. Exactly the
    audit that catches 'cluster 7 is half English half code'."""
    by_ll = (
        _pairs(documents, embeddings)
        .groupBy("label", "lang")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("label").orderBy(F.col("n").desc(), F.col("lang"))
    top = by_ll.withColumn("_rn", F.row_number().over(w))
    return (
        top.groupBy("label")
        .agg(
            F.sum("n").alias("n_docs"),
            F.count("*").alias("n_langs"),
            F.max(F.when(F.col("_rn") == 1, F.col("lang"))).alias(
                "dominant_lang"
            ),
            F.round(
                F.max(F.when(F.col("_rn") == 1, F.col("n")))
                / F.sum("n"),
                6,
            ).alias("dominant_share"),
        )
    )


def lang_centroid_outliers(
    documents: DataFrame, embeddings: DataFrame, k: int = 20
) -> DataFrame:
    """Bottom-k documents by cosine to their own language's centroid
    → (doc_id, lang, centroid_cosine): mislabel/misembed candidates.

    Centroid components are rounded to 6 decimals BEFORE the cosine
    on both engines, collapsing sub-1e-6 summation-order noise so the
    comparison is stable."""
    p = _pairs(documents, embeddings).select(
        "doc_id", "lang", F.col("embedding")
    )
    cent = (
        p.select("lang", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("lang", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("c"))
        .groupBy("lang")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("cvec")
        )
    )
    scored = p.join(broadcast(cent), "lang").select(
        "doc_id",
        "lang",
        F.round(cosine(F.col("embedding"), F.col("cvec")), 6).alias(
            "centroid_cosine"
        ),
    )
    # NULL scores (zero-norm vector or all-zero rounded centroid)
    # would sort NULLS FIRST in Spark and eat bottom-k slots while
    # the oracle sorts them last — filter per cosine()'s contract
    return (
        scored.where(F.col("centroid_cosine").isNotNull())
        .orderBy("centroid_cosine", "doc_id")
        .limit(k)
    )


def centroid_drift(embeddings: DataFrame) -> DataFrame:
    """Embedding-drift monitor → (label, n_a, n_b, drift_cosine):
    cosine between each label's centroid in cohort A (even vec_id)
    and cohort B (odd vec_id). In production the cohorts are
    yesterday's batch vs today's — centroid cosine falling below ~1.0
    flags an embedding-model change or upstream distribution shift
    before it poisons ANN indexes built on the old geometry.

    Per-pos centroids are rounded to 6 decimals BEFORE the cosine on
    both engines (the bridge_centroid_outliers determinism trick), so
    summation-order noise never reaches the compared value. One
    posexplode + one (label, cohort, pos) rollup; centroid vectors
    are label-count-sized — broadcast side."""
    p = embeddings.select(
        "label",
        (F.col("vec_id") % 2 == 0).alias("is_a"),
        "embedding",
        "vec_id",
    )
    cent = (
        p.select(
            "label", "is_a", F.posexplode("embedding").alias("pos", "val")
        )
        .groupBy("label", "is_a", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("c"))
        .groupBy("label", "is_a")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("cvec")
        )
    )
    counts = p.groupBy("label").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).alias("n_b"),
    )
    ca = cent.where(F.col("is_a")).select("label", F.col("cvec").alias("va"))
    cb = cent.where(~F.col("is_a")).select("label", F.col("cvec").alias("vb"))

    return (
        counts.join(ca, "label")
        .join(cb, "label")
        .select(
            "label",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("drift_cosine"),
        )
    )
