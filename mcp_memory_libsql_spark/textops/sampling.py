"""Deterministic corpus partitioning and scrubbing for training-data
pipelines: hash-based train/val/test splits, per-language stratified
sampling, and PII redaction.

Everything is a pure column expression (zero shuffle, full codegen)
and every random-looking choice is an md5-derived hash of the row key
— reproducible across runs, engines, and cluster sizes, which is the
property a 100 TB ingest actually needs (resuming a failed run must
not re-roll the dice). The md5-hex → BIGINT bucket trick is the same
portable-hash contract the dedup family uses (xxhash64 differs across
engines; md5 doesn't).

The synthetic corpus contains no PII, so the gated scrub query
INJECTS deterministic synthetic PII (email/phone/URL derived from
doc_id) before redacting — the oracle performs the identical
injection, so the gate exercises the redaction regexes on every row
rather than vacuously hashing unchanged text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Redaction patterns — kept to the regex subset with identical
# semantics in Java regex (Spark) and RE2 (DuckDB): character
# classes, bounded repeats, alternation; no backrefs, no lookaround.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"


def _bucket(col, salt: str, mod: int):
    """Deterministic [0, mod) bucket from the first 4 md5 hex chars
    of salt||key — portable across Spark and DuckDB."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 4),
            16,
            10,
        ).cast("bigint")
        % mod
    )


def split_assign(
    documents: DataFrame, train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """(doc_id, bucket, split) — hash-partition the corpus into
    train/val/test by md5(doc_id) bucket. Narrow projection; the
    assignment is stable under any repartitioning or resume."""
    b = _bucket(F.col("doc_id"), "split:", 100)
    return documents.select(
        "doc_id",
        b.alias("bucket"),
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


# per-language keep rates (per-mille) for the gated stratified sample
SAMPLE_RATES = {"en": 300, "de": 500, "es": 500, "fr": 700, "zh": 700}


def stratified_sample(
    documents: DataFrame, rates: dict[str, int] | None = None
) -> DataFrame:
    """Deterministic per-language downsample: keep a doc iff its
    md5 bucket (per-mille) falls under its language's rate. The
    CASE-on-lang threshold stays in codegen; no shuffle, no RNG
    state — the 100 TB-safe way to rebalance a multilingual corpus."""
    rates = SAMPLE_RATES if rates is None else rates
    b = _bucket(F.col("doc_id"), "sample:", 1000)
    threshold = F.lit(0)
    for lang, rate in sorted(rates.items()):
        threshold = F.when(F.col("lang") == lang, rate).otherwise(threshold)
    return (
        documents.select(
            "doc_id", "lang", "source", b.alias("bucket"), threshold.alias("_t")
        )
        .where(F.col("bucket") < F.col("_t"))
        .select("doc_id", "lang", "source", "bucket")
    )


def inject_pii(documents: DataFrame) -> DataFrame:
    """Append deterministic synthetic PII (email, E.164-ish phone,
    URL — all derived from doc_id) to every document. Test-harness
    semantics for the scrub gate; documented as such."""
    return documents.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com, call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(", see https://example.com/u/"),
            F.col("doc_id").cast("string"),
            F.lit(" now."),
        ).alias("text"),
    )


def pii_scrub(documents: DataFrame) -> DataFrame:
    """(doc_id, scrubbed) — redact URLs, then emails, then phone
    numbers to typed placeholder tokens. Order matters: URLs first so
    the email pass can't partially match a URL userinfo section.
    Pure regexp_replace chain — one projection, zero shuffle."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), URL_RE, "<URL>"),
            EMAIL_RE,
            "<EMAIL>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return documents.select("doc_id", scrubbed.alias("scrubbed"))


def curate(documents: DataFrame) -> DataFrame:
    """The composed curation pipeline a training-data job actually
    runs: quality filter → cluster-level near-dup removal →
    per-language stratified sample → split assignment, in one lazy
    plan → (doc_id, lang, source, sample_bucket, split).

    Plan shape: quality signals are a narrow projection fused into
    the scan; the near-dup drop set (tiny) broadcasts into an
    anti-join; sampling/split are hash projections — so the whole
    curation adds ONE doc_id-keyed shuffle (joining the quality ids
    back to their rows) on top of the dedup clustering job."""
    from pyspark.sql.functions import broadcast

    from . import dedup as dd
    from .quality import quality

    qual_ids = (
        quality(documents)
        .where((F.col("n_tokens") >= 30) & (F.col("stopword_ratio") <= 0.2))
        .select("doc_id")
    )
    drops = (
        dd.dedup_clusters(documents)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    kept = (
        documents.select("doc_id", "lang", "source")
        .join(qual_ids, "doc_id")
        .join(broadcast(drops), "doc_id", "left_anti")
    )
    sb = _bucket(F.col("doc_id"), "sample:", 1000)
    threshold = F.lit(0)
    for lang, rate in sorted(SAMPLE_RATES.items()):
        threshold = F.when(F.col("lang") == lang, rate).otherwise(threshold)
    sampled = (
        kept.select(
            "doc_id", "lang", "source", sb.alias("sample_bucket"),
            threshold.alias("_t"),
        )
        .where(F.col("sample_bucket") < F.col("_t"))
        .drop("_t")
    )
    spb = _bucket(F.col("doc_id"), "split:", 100)
    return sampled.select(
        "doc_id",
        "lang",
        "source",
        "sample_bucket",
        F.when(spb < 80, "train")
        .when(spb < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


def curation_report(documents: DataFrame) -> DataFrame:
    """Pipeline observability for :func:`curate`: one row per funnel
    stage → (stage, n_docs) — raw corpus, quality survivors, after
    cluster dedup, after stratified sampling, and per-split sizes.
    This is the report a curation job publishes after every run to
    catch a filter suddenly dropping 90% of a crawl.

    Each stage count is a 1-row aggregate of a prefix of the same
    lazy curation plan (Spark reuses the shuffle outputs of the
    shared dedup-cluster stages across the counts); the union of
    seven 1-row frames is driver-trivial."""
    from pyspark.sql.functions import broadcast

    from . import dedup as dd
    from .quality import quality

    qual_ids = (
        quality(documents)
        .where((F.col("n_tokens") >= 30) & (F.col("stopword_ratio") <= 0.2))
        .select("doc_id")
    )
    drops = (
        dd.dedup_clusters(documents)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    kept = (
        documents.select("doc_id", "lang")
        .join(qual_ids, "doc_id")
        .join(broadcast(drops), "doc_id", "left_anti")
    )
    final = curate(documents)

    def n(df, stage):
        return df.agg(F.count("*").cast("bigint").alias("n_docs")).select(
            F.lit(stage).alias("stage"), "n_docs"
        )

    return (
        n(documents, "0_raw")
        .unionByName(n(qual_ids, "1_quality"))
        .unionByName(n(kept, "2_dedup"))
        .unionByName(n(final, "3_sample"))
        .unionByName(n(final.where(F.col("split") == "train"), "4_train"))
        .unionByName(n(final.where(F.col("split") == "val"), "5_val"))
        .unionByName(n(final.where(F.col("split") == "test"), "6_test"))
    )


def resample_balanced(documents: DataFrame) -> DataFrame:
    """Apply the uniform-target mixture weights as a deterministic
    downsample → the rebalanced corpus (doc_id, lang, bucket,
    keep_per_mille): keep a doc iff its md5 per-mille bucket falls
    under its language's computed weight (capped at 1000‰ —
    overrepresented languages shrink toward uniform; underrepresented
    ones are kept whole, since hash sampling can't replicate).

    Closes the loop from ``data_mixture_weights`` (the report) to the
    corpus that ships. The per-mille threshold is PURE INTEGER math —
    (1000·total) div (n_langs·n_docs) — so the kept set is bit-stable
    across engines and re-runs; the weight rollup is two tiny aggs
    broadcast back onto one corpus scan."""
    from pyspark.sql.functions import broadcast

    per_lang = documents.groupBy("lang").agg(F.count("*").alias("_n"))
    totals = per_lang.agg(
        F.sum("_n").alias("_total"), F.count("*").alias("_L")
    )
    weights = per_lang.crossJoin(broadcast(totals)).select(
        "lang",
        F.least(
            F.lit(1000).cast("bigint"),
            F.expr("(1000 * _total) div (_L * _n)"),
        ).alias("keep_per_mille"),
    )
    b = _bucket(F.col("doc_id"), "balance:", 1000)
    return (
        documents.select("doc_id", "lang", b.alias("bucket"))
        .join(broadcast(weights), "lang")
        .where(F.col("bucket") < F.col("keep_per_mille"))
        .select("doc_id", "lang", "bucket", "keep_per_mille")
    )


def dsir_scores(documents, target_lang: str = "en"):
    """DSIR-style example-level data selection score → (doc_id, lang,
    n_tokens, mean_target_share): how target-like each document's
    vocabulary is, as the mean over its token instances of the
    token's per-mille share in the target slice (tf_target·1000 //
    tf_all — integer-exact, so the per-doc sum is order-independent
    and the score is bit-identical cross-engine; true DSIR uses
    log-likelihood ratios of hashed n-gram models, which ln() makes
    engine-dependent — the integer share keeps the same ranking
    signal gate-checkable).

    Docs whose vocabulary only occurs in the target slice score
    ~1000; docs full of cross-language tokens score low — the
    importance-resampling signal for "select pretraining data that
    looks like the target domain" (Xie et al., DSIR; FineWeb-Edu's
    classifier is the learned twin — see text_quality_classifier).

    Scale: one explode, one term-table shuffle (map-side combined),
    one broadcast-back of the term shares (vocab is zipf-bounded; cap
    or hash it at 100 TB), one doc rollup.
    """
    from pyspark.sql import functions as F

    from .tokenize import words

    toks = documents.select(
        "doc_id", "lang", F.explode(words(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("term").agg(
        F.count("*").alias("tf_all"),
        F.sum(
            F.when(F.col("lang") == target_lang, 1).otherwise(0)
        ).alias("tf_target"),
    )
    # integer DIV, not `/` + cast: float-divide-then-cast truncates in
    # Spark but rounds in DuckDB — DIV//`//` floor identically
    share = tf.select(
        "term",
        F.expr("tf_target * 1000 DIV tf_all").alias("share_pm"),
    )
    scored = toks.join(share, "term").groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_tokens"),
        F.sum("share_pm").alias("share_sum"),
    )
    return scored.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.col("share_sum") / F.col("n_tokens"), 6).alias(
            "mean_target_share"
        ),
    )


def curriculum_order(documents: DataFrame, phases: int = 4) -> DataFrame:
    """Curriculum-learning ordering per language stratum → (doc_id,
    lang, fk_grade, rank, phase): documents ranked easy→hard by
    Flesch-Kincaid grade (ties by doc_id), then cut into ``phases``
    contiguous curriculum phases (phase = (rank−1)·phases div n — the
    training schedule feeds phase 0 first; cf. Bengio et al. 2009).

    The rank window PARTITIONS BY lang on purpose: a global
    ROW_NUMBER collapses to one task at 100 TB, while per-stratum
    curricula sort every language in parallel (and per-language
    scheduling is what multilingual curricula do anyway). The grade
    is the existing deterministic readability formula (integer
    counts, one fixed-shape double expression), so the whole op is
    oracle-exact. Docs with no words carry no curriculum signal and
    are excluded (mirrored)."""
    from pyspark.sql.window import Window

    from .quality import readability

    grades = readability(documents).select("doc_id", "fk_grade")
    d = documents.select("doc_id", "lang").join(grades, "doc_id")
    w = Window.partitionBy("lang").orderBy("fk_grade", "doc_id")
    n = Window.partitionBy("lang")
    ranked = d.select(
        "doc_id",
        "lang",
        "fk_grade",
        F.row_number().over(w).alias("rank"),
        F.count("*").over(n).alias("_n"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        "fk_grade",
        F.col("rank").cast("bigint").alias("rank"),
        F.expr(f"CAST((rank - 1) * {phases} DIV _n AS INTEGER)").alias(
            "phase"
        ),
    )


def epoch_plan(documents: DataFrame) -> DataFrame:
    """Integer epoch/repeat plan per source → (source, n_docs,
    src_tokens, weight_pm, repeats, extra_per_mille): how many times
    to repeat each source (and what per-mille fraction to sample for
    the remainder) so the trained-on mixture is UNIFORM across
    sources by token count — the executable follow-up to
    ``data_mixture_weights`` (which reports per-LANG weights but
    doesn't integerize them into an epoch schedule; cf. the
    "repeat small high-quality sources ~4 epochs" regime of Muennighoff
    et al. 2023).

    100% integer arithmetic: weight_pm = (1000·total) div
    (n_sources·src_tokens); repeats = weight_pm div 1000;
    extra_per_mille = weight_pm % 1000 (feed to the hash-threshold
    sampler). No float ever — byte-identical in any engine. One tiny
    rollup + a 1-row totals broadcast."""
    from pyspark.sql.functions import broadcast
    from .quality import token_counts

    toks = token_counts(documents).join(
        documents.select("doc_id", "source"), "doc_id"
    )
    per_src = toks.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").alias("src_tokens"),
    )
    totals = per_src.agg(
        F.sum("src_tokens").alias("_total"), F.count("*").alias("_n_src")
    )
    return per_src.crossJoin(broadcast(totals)).select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("src_tokens").cast("bigint").alias("src_tokens"),
        F.expr("1000 * _total DIV (_n_src * src_tokens)")
        .cast("bigint")
        .alias("weight_pm"),
        F.expr("(1000 * _total DIV (_n_src * src_tokens)) DIV 1000")
        .cast("bigint")
        .alias("repeats"),
        F.expr("(1000 * _total DIV (_n_src * src_tokens)) % 1000")
        .cast("bigint")
        .alias("extra_per_mille"),
    )
