"""Intra-document repetition signals (Gopher-style quality rules).

Rae et al. (Gopher, 2021) filter web documents whose most frequent
word or n-gram covers too large a fraction of the text — a cheap,
high-precision signal for boilerplate / keyword-stuffed / generated
junk. The testdata documents are single-line word streams, so the
line-based variants don't apply; the word/bigram variants do.

All counts are integers and the repetitive flag is an integer
cross-multiplication (top_word_n * 5 > n_words means frac > 0.2), so
Spark and the DuckDB oracle agree bit-for-bit — no float division in
the gated output.

Scale: two explodes over the token stream with partial-agg (map-side
combine) shuffles on (doc_id, term) — the per-doc combine collapses
each document's repeated terms before the exchange, so shuffle volume
is bounded by per-doc vocabulary, not document length. The final
doc_id join co-partitions two already-aggregated (small) sides. No
windows over the corpus, no N² anywhere; this plan is unchanged at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tokenize import words

# Gopher-ish thresholds: most-common word > 20% of tokens, or
# most-common bigram > 10% of bigrams.
TOP_WORD_NUM, TOP_WORD_DEN = 1, 5
TOP_BIGRAM_NUM, TOP_BIGRAM_DEN = 1, 10


def _bigrams(tokens):
    idx = F.sequence(F.lit(1), F.size(tokens) - 1)
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(tokens, i), F.element_at(tokens, i + 1)
    )
    return F.when(F.size(tokens) >= 2, F.transform(idx, mk)).otherwise(
        F.array().cast("array<string>")
    )


def repetition(documents: DataFrame) -> DataFrame:
    """Per-doc repetition profile: (doc_id, n_words, n_distinct,
    top_word, top_word_n, n_bigrams, top_bigram, top_bigram_n,
    is_repetitive). Deterministic argmax: ties broken by the greater
    term string (max over (count, term) structs)."""
    toks = documents.select("doc_id", words(F.col("text")).alias("w"))

    wc = (
        toks.select("doc_id", F.explode("w").alias("term"))
        .groupBy("doc_id", "term")
        .count()
    )
    wagg = wc.groupBy("doc_id").agg(
        F.sum("count").cast("bigint").alias("n_words"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.max(F.struct(F.col("count").alias("n"), F.col("term"))).alias("_t"),
    )
    wagg = wagg.select(
        "doc_id",
        "n_words",
        "n_distinct",
        F.col("_t.term").alias("top_word"),
        F.col("_t.n").cast("bigint").alias("top_word_n"),
    )

    bc = (
        toks.select("doc_id", F.explode(_bigrams(F.col("w"))).alias("term"))
        .groupBy("doc_id", "term")
        .count()
    )
    bagg = bc.groupBy("doc_id").agg(
        F.sum("count").cast("bigint").alias("n_bigrams"),
        F.max(F.struct(F.col("count").alias("n"), F.col("term"))).alias("_t"),
    )
    bagg = bagg.select(
        "doc_id",
        "n_bigrams",
        F.col("_t.term").alias("top_bigram"),
        F.col("_t.n").cast("bigint").alias("top_bigram_n"),
    )

    out = wagg.join(bagg, "doc_id", "left")
    flag = (
        F.col("top_word_n") * TOP_WORD_DEN > F.col("n_words") * TOP_WORD_NUM
    ) | (
        F.coalesce(F.col("top_bigram_n"), F.lit(0)) * TOP_BIGRAM_DEN
        > F.coalesce(F.col("n_bigrams"), F.lit(0)) * TOP_BIGRAM_NUM
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_distinct",
        "top_word",
        "top_word_n",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce(F.col("top_bigram"), F.lit("")).alias("top_bigram"),
        F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast("bigint").alias("top_bigram_n"),
        flag.cast("boolean").alias("is_repetitive"),
    )
