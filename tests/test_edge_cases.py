"""Degenerate-input robustness: empty tables, single rows, unicode,
and token-free documents through the text/dedup/vector operators.
A 100 TB pipeline hits every one of these in some partition (an
empty date shard, a doc of pure punctuation), and an operator that
throws on them kills the whole stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_memory_libsql_spark.textops import dedup as dd
from mcp_memory_libsql_spark.textops import quality as tq

DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        DOC_SCHEMA,
    )


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


def test_text_ops_on_empty_input(spark, empty_docs):
    assert tq.quality(empty_docs).count() == 0
    assert tq.char_classes(empty_docs).count() == 0
    assert tq.type_token(empty_docs).count() == 0
    assert tq.mixture_weights(empty_docs).count() == 0
    assert tq.top_terms(empty_docs).count() == 0


def test_dedup_ops_on_empty_input(spark, empty_docs):
    assert dd.exact_groups(empty_docs).count() == 0
    assert dd.ngram_jaccard_pairs(empty_docs).count() == 0
    assert dd.minhash_lsh_candidates(empty_docs).count() == 0
    assert dd.containment_pairs(empty_docs).count() == 0
    assert dd.lsh_eval(empty_docs).count() == 1  # one all-zero report row


def test_single_doc_produces_no_pairs(spark):
    one = _docs(spark, ["the quick brown fox jumps over the lazy dog"])
    assert dd.ngram_jaccard_pairs(one).count() == 0
    assert dd.containment_pairs(one).count() == 0
    sig = dd.minhash_signatures(one)
    assert sig.count() == 1


def test_tokenless_and_unicode_docs(spark):
    docs = _docs(
        spark,
        [
            "!!! ??? ...",  # no [a-z0-9] tokens at all
            "",  # empty string
            "héllo wörld añejo 日本語テキスト",  # non-ascii
            "abc " * 5,
        ],
    )
    q = tq.quality(docs)
    assert q.count() == 4  # quality never drops rows
    tt = {r.doc_id: r for r in tq.type_token(docs).collect()}
    # token-free docs are absent from the token rollup (no explode rows)
    assert 0 not in tt and 1 not in tt
    assert tt[3].n_types == 1 and tt[3].n_tokens == 5
    cc = {r.doc_id: r for r in tq.char_classes(docs).collect()}
    assert cc[2].n_nonascii > 0
    assert cc[1].n_alpha == 0
    # fingerprints stay defined for unicode text
    assert dd.exact_groups(docs).count() == 4


def test_knn_on_single_vector_corpus(spark):
    from mcp_memory_libsql_spark.vector import binary, knn

    emb = spark.createDataFrame(
        [(0, [1.0] * 64, 0), (1, [0.5] * 64, 1)],
        "vec_id bigint, embedding array<float>, label int",
    )
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_embedding"),
    )
    got = knn.knn_batch(emb, q, k=5).collect()
    assert len(got) == 1 and got[0].vec_id == 1
    ham = binary.hamming_knn(emb, q, k=5).collect()
    assert len(ham) == 1 and ham[0].hamming == 0  # same sign pattern


def test_empty_relations_graph_ops(spark):
    from mcp_memory_libsql_spark.kg import traverse

    rel = spark.createDataFrame(
        [], "source string, target string, relation_type string"
    )
    assert traverse.degree(rel).count() == 0
    assert traverse.k_core(rel, k=2).count() == 0
    assert traverse.pagerank(rel, iterations=2).count() == 0


def test_empty_graph_new_ops(spark):
    from pyspark.sql import functions as F

    from mcp_memory_libsql_spark.kg import traverse

    rel = spark.createDataFrame(
        [], "source string, target string, relation_type string"
    )
    ents = spark.createDataFrame(
        [], "name string, entity_type string, created_at bigint"
    )
    seeds = spark.createDataFrame([("X",)], "name string")
    assert traverse.personalized_pagerank(rel, seeds, iterations=2).count() == 0
    assert traverse.label_propagation(rel, iterations=2).count() == 0
    assert traverse.community_modularity(rel, iterations=2).count() == 0
    assert traverse.metapath_census(ents, rel).count() == 0


def test_ppr_no_seeds_all_zero(spark):
    from mcp_memory_libsql_spark.kg import traverse

    rel = spark.createDataFrame(
        [("A", "B", "r"), ("B", "C", "r")],
        "source string, target string, relation_type string",
    )
    empty_seeds = spark.createDataFrame([], "name string")
    rows = traverse.personalized_pagerank(rel, empty_seeds).collect()
    assert {r.rank for r in rows} == {0.0}
    # seeds outside the graph behave like no seeds
    outside = spark.createDataFrame([("ZZZ",)], "name string")
    rows2 = traverse.personalized_pagerank(rel, outside).collect()
    assert {r.rank for r in rows2} == {0.0}


def test_events_ntz_decode_is_timezone_independent(spark, tmp_path):
    """The NTZ-typed events encoding must decode to the same absolute
    epochs under ANY session time zone (a plain cast reinterprets the
    wall clock in the session zone; the epoch-nanos encoding of the
    same data would not shift)."""
    from pyspark.sql import functions as F

    from mcp_memory_libsql_spark.io.tables import load_table

    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    spark.sql(
        "SELECT 1::BIGINT AS event_id,"
        " TIMESTAMP_NTZ '2024-01-01 10:00:00' AS ts,"
        " 1::BIGINT AS user_id, 'x' AS event_type, 1.0 AS value,"
        " '{}' AS props"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")
    try:
        got = set()
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got.add(
                load_table(spark, str(tmp_path), "events")
                .select(F.unix_timestamp("ts").alias("e"))
                .collect()[0]
                .e
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert got == {1704103200}
