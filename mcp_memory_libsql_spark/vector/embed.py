"""Batch embedding generation with Spark MLlib + semantic text search.

The north-star surface: generate document embeddings as a batch job
(MLlib TF-IDF here; a sentence-transformer via Pandas UDF drops into
the same shape when the model libs exist), then serve semantic
search as a DataFrame query — embed the query with the SAME fitted
model, broadcast it, cosine top-k over the embedding column.

Scale: HashingTF needs no vocabulary shuffle (feature hashing), IDF
is one treeAggregate over the corpus; transform is a narrow map. The
search plan is identical to vector/knn.py — scan + projection +
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.ml.feature import IDF, IDFModel, RegexTokenizer, HashingTF
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from .similarity import cosine

NUM_FEATURES = 256


def fit_tfidf(documents: DataFrame, num_features: int = NUM_FEATURES):
    """Fit the embedding pipeline → (tokenizer, hashing_tf, idf_model)."""
    tok = RegexTokenizer(
        inputCol="text", outputCol="_words", pattern="[^a-z0-9]+", minTokenLength=1
    )
    tf = HashingTF(inputCol="_words", outputCol="_tf", numFeatures=num_features)
    words = tok.transform(documents)
    tfs = tf.transform(words)
    idf_model: IDFModel = IDF(inputCol="_tf", outputCol="_emb").fit(tfs)
    return tok, tf, idf_model


def embed_documents(
    documents: DataFrame, pipeline=None, num_features: int = NUM_FEATURES
) -> DataFrame:
    """(doc_id, embedding array<double>) — TF-IDF document vectors."""
    tok, tf, idf_model = pipeline or fit_tfidf(documents, num_features)
    out = idf_model.transform(tf.transform(tok.transform(documents)))
    return out.select(
        "doc_id", vector_to_array(F.col("_emb")).alias("embedding")
    )


def embed_query(spark, pipeline, query_text: str) -> DataFrame:
    """Embed one query string through a FITTED pipeline (single-row
    transform — no refit) → 1-row (q_embedding) frame."""
    q_df = spark.createDataFrame(
        [(int(-1), query_text, "", "", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return embed_documents(q_df, pipeline).select(
        F.col("embedding").alias("q_embedding")
    )


def semantic_search(
    documents: DataFrame,
    query_text: str,
    k: int = 10,
    num_features: int = NUM_FEATURES,
    pipeline=None,
    doc_vecs: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents by TF-IDF cosine against a query string
    → (doc_id, cosine_sim). The query embeds through the SAME fitted
    pipeline (single-row transform), then broadcasts into the scan.

    Serve-path contract: pass a prefitted ``pipeline`` (and ideally
    the precomputed ``doc_vecs``) — fitting happens once at index
    build, NEVER per query; the fallback fit here is only for ad-hoc
    exploration."""
    spark = documents.sparkSession
    if pipeline is None:
        pipeline = fit_tfidf(documents, num_features)
    if doc_vecs is None:
        doc_vecs = embed_documents(documents, pipeline)
    q_vec = broadcast(embed_query(spark, pipeline, query_text))
    scored = doc_vecs.crossJoin(q_vec).select(
        "doc_id",
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6).alias(
            "cosine_sim"
        ),
    )
    return (
        scored.where(F.col("cosine_sim").isNotNull())
        .orderBy(F.col("cosine_sim").desc(), F.col("doc_id"))
        .limit(k)
    )


SEMANTIC_EXACT_SCALE = 1 << 30  # per-term quantization for the exact twin


def semantic_search_exact(
    documents: DataFrame, query_text: str, k: int = 10
) -> DataFrame:
    """Integer-exact sparse retrieval twin of :func:`semantic_search`
    (VERDICT r06 item 6) → (doc_id, n_terms, score_scaled): rational
    tf/df term weights (the log-free TF-IDF of textops.quality.
    keywords — ln differs in ulps across engines) scored against the
    query's own tf, each term's contribution quantized to an integer
    BEFORE summation:

        c(t) = (tf_doc · tf_query · 2³⁰) DIV df(t)²

    so the per-doc score is an exact BIGINT total — order-independent
    in both engines, the same millibit-quantization discipline as
    text_lm_score. The MLlib cosine path keeps the float serving
    (rows-only by necessity); this twin puts the embed+score
    semantics themselves under the hash gate.

    Scale shape: tf/df are the standard two map-side-combined rollups;
    the query filter (a handful of literal terms) broadcast-prunes the
    tf stream before the df join, so the scored stream is |q|·docs-
    containing-term rows, never the full posting matrix. Overflow-safe
    by construction: tf·qtf·2³⁰ < 2⁶³ for docs under ~80k tokens of
    one term, df² < 2⁶³ for corpora under 3B docs."""
    import re

    q_terms: dict[str, int] = {}
    for tok in re.findall("[a-z0-9]+", query_text.lower()):
        q_terms[tok] = q_terms.get(tok, 0) + 1
    spark = documents.sparkSession
    q = spark.createDataFrame(
        sorted(q_terms.items()), "token string, qtf long"
    )
    from ..textops.tokenize import words

    toks = documents.select(
        "doc_id", F.explode(words(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(broadcast(q), "token")
        .join(dfreq, "token")
        .select(
            "doc_id",
            F.expr(
                f"CAST((tf * qtf * {SEMANTIC_EXACT_SCALE})"
                " DIV (df * df) AS BIGINT)"
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.sum("c").cast("bigint").alias("score_scaled"),
        )
        .orderBy(F.col("score_scaled").desc(), "doc_id")
        .limit(k)
    )
