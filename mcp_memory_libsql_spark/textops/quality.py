"""Text quality / language-ID / fingerprint operators (documents).

All pure column expressions — single scan, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from .tokenize import BPE_RE, WS_CLASS, WS_TOKEN_RE, words

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "it", "that", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "zu"],
    "fr": ["le", "la", "de", "et", "un", "est", "pour", "que"],
}

PUNCT_RE = "[^.,;:!?]"
UPPER_RE = "[^A-Z]"


def _hits(tokens, lang: str):
    wl = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda x: F.array_contains(wl, x)))


def quality(documents: DataFrame) -> DataFrame:
    """(doc_id, n_chars_q, n_tokens, punct_ratio, stopword_ratio,
    upper_ratio) — heuristic quality signals."""
    toks = words(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    punct = F.length(F.regexp_replace(F.col("text"), PUNCT_RE, ""))
    upper = F.length(F.regexp_replace(F.col("text"), UPPER_RE, ""))
    stop = _hits(toks, "en")
    # NULL (not a crash) for empty / token-free docs: under ANSI mode
    # (vanilla Spark 4 default) an unguarded ratio would throw
    # DIVIDE_BY_ZERO and one pure-punctuation doc anywhere in the
    # corpus would kill the whole curation job
    return documents.select(
        "doc_id",
        n_chars.cast("int").alias("n_chars_q"),
        n_tokens.cast("int").alias("n_tokens"),
        F.when(n_chars > 0, F.round(punct / n_chars, 4)).alias("punct_ratio"),
        F.when(n_tokens > 0, F.round(stop / n_tokens, 4)).alias(
            "stopword_ratio"
        ),
        F.when(n_chars > 0, F.round(upper / n_chars, 4)).alias("upper_ratio"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens) — whitespace + BPE-ish regex."""
    ws = F.size(F.regexp_extract_all(F.col("text"), F.lit(WS_TOKEN_RE), 0))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
    return documents.select(
        "doc_id",
        ws.cast("int").alias("ws_tokens"),
        bpe.cast("int").alias("bpe_tokens"),
    )


def tokenizer_fertility(documents: DataFrame) -> DataFrame:
    """Per-language tokenizer fertility → (lang, n_docs, ws_tokens,
    bpe_tokens, fertility): BPE-ish subword tokens per whitespace
    word. Fertility ≈ 1 for languages the tokenizer fits; ≫ 1 flags
    languages that will pay a context-length/compute tax in training
    (the standard multilingual-tokenizer audit, cf. SentencePiece
    coverage reports). Integer sums only; one division at the end —
    pure rollup, one map-side-combinable shuffle on lang."""
    ws = F.size(F.regexp_extract_all(F.col("text"), F.lit(WS_TOKEN_RE), 0))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
    agg = documents.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(ws).cast("bigint").alias("ws_tokens"),
        F.sum(bpe).cast("bigint").alias("bpe_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        F.when(
            F.col("ws_tokens") > 0,
            F.round(F.col("bpe_tokens") / F.col("ws_tokens"), 6),
        ).alias("fertility"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-list language ID → (doc_id, lang, lang_pred).
    Deterministic argmax with fixed priority en>es>de>fr>other."""
    toks = words(F.col("text"))
    en, es, de, fr = (_hits(toks, lang) for lang in ("en", "es", "de", "fr"))
    best = F.greatest(en, es, de, fr)
    pred = (
        F.when(best == 0, F.lit("other"))
        .when(en == best, F.lit("en"))
        .when(es == best, F.lit("es"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return documents.select("doc_id", "lang", pred.alias("lang_pred"))


def corpus_stats(documents: DataFrame) -> DataFrame:
    """Per-(lang, source) corpus composition: doc/char/token counts —
    the pipeline-health rollup a training-data curation job runs after
    every filter stage. One partial-agg shuffle on a tiny key space."""
    toks = F.size(words(F.col("text")))
    return (
        documents.select("lang", "source", "n_chars", toks.alias("_tok"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum("_tok").cast("bigint").alias("total_tokens"),
        )
    )


def top_terms(documents: DataFrame, k: int = 50) -> DataFrame:
    """Corpus-wide top-k terms by document frequency (distinct docs
    containing the term) AND total frequency — the vocabulary scan
    behind tokenizer/stopword curation. Distinct shingle-style
    explode, partial-agg shuffle on the term, tiny global top-k with
    a deterministic term tiebreak."""
    toks = documents.select(
        "doc_id", F.explode(words(F.col("text"))).alias("term")
    )
    return (
        toks.groupBy("term")
        .agg(
            F.count("*").alias("total_freq"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("total_freq").desc(), F.col("term"))
        .limit(k)
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp, fp64) — md5 of whitespace-normalized lowercase
    text, plus a 60-bit numeric variant for joins."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), f"[{WS_CLASS}]+", " ")
    )
    return documents.select(
        "doc_id",
        F.md5(norm).alias("fp"),
        F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("bigint").alias("fp64"),
    )


def chunk_documents(
    documents: DataFrame, size: int = 200, stride: int = 160
) -> DataFrame:
    """RAG-style fixed-window chunking with overlap: each doc explodes
    into substr windows of ``size`` chars every ``stride`` chars →
    (doc_id, chunk_idx, chunk_start, chunk_text, chunk_chars). Pure
    narrow explode — no shuffle, no Python; at 100 TB this is a map
    stage whose output feeds the embedding batch job."""
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - 1, F.lit(0)),
        F.lit(stride),
    )
    ch = documents.select(
        "doc_id", "text", F.posexplode(starts).alias("chunk_idx", "chunk_start")
    )
    chunk = F.expr(f"substring(text, chunk_start + 1, {size})")
    return ch.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("int").alias("chunk_chars"),
    )


def pack_bins(documents: DataFrame, target_chars: int = 2000) -> DataFrame:
    """Sequence packing: greedily assign docs (in doc_id order) to
    fixed-budget bins per language shard → (doc_id, lang, bin_id) —
    the batch-construction step of a training-data pipeline.

    The running prefix sum is a window per lang shard, so packing
    parallelizes across shards; a GLOBAL pack would need a two-pass
    distributed prefix sum (per-partition totals broadcast back), the
    standard trick when one shard must not straddle workers."""
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_df = documents.select(
        "doc_id", "lang", "n_chars", F.sum("n_chars").over(w).alias("_cum")
    )
    # integer division keeps the bin id exact cross-engine
    return cum_df.select(
        "doc_id",
        "lang",
        F.expr(f"(_cum - n_chars) div {target_chars}").alias("bin_id"),
    )


def shard_plan(
    documents: DataFrame,
    target_tokens: int = 2000,
    block: int = 65536,
    base_df: DataFrame | None = None,
) -> DataFrame:
    """GLOBAL training-shard assignment by cumulative token budget →
    (doc_id, n_tokens, shard_id, offset_tokens): docs in doc_id order
    pack greedily into ``target_tokens`` shards; ``offset_tokens`` is
    the doc's start offset inside its shard — the writer-side layout
    plan that turns a curated corpus into balanced training shards
    (pack_bins packs per-lang; this is the corpus-wide plan whose
    prefix sum cannot be one window).

    Scale shape — the two-pass distributed prefix sum pack_bins's
    docstring points at, with a DETERMINISTIC twist: blocks are fixed
    doc_id ranges (``doc_id div block``), NOT sampled range
    partitions (repartitionByRange boundaries are sample-dependent →
    not oracle-reproducible). Pass 1 windows WITHIN each block
    (parallel across blocks); pass 2 windows over per-block totals —
    N/block rows (150k at 10^10 docs), trivially one partition — and
    broadcast-joins the block offsets back. No global-order window
    ever sees the full corpus."""
    toks = F.size(words(F.col("text"))).cast("bigint")
    # two consumers (per-block window + block totals) read this tiny
    # (doc_id, n_tokens, _blk) projection — persist so the expensive
    # text tokenization scans the corpus ONCE, not once per branch
    d = documents.select(
        "doc_id",
        toks.alias("n_tokens"),
        F.expr(f"doc_id div {block}").alias("_blk"),
    ).persist()
    in_blk = Window.partitionBy("_blk").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    base = d
    d = d.withColumn("_cum_in", F.sum("n_tokens").over(in_blk))
    # totals from the BASE projection (not max of the cumsum): the
    # totals branch then carries no window node at all after pruning
    totals = base.groupBy("_blk").agg(F.sum("n_tokens").alias("_tot"))
    over_blk = Window.orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "_blk", (F.sum("_tot").over(over_blk) - F.col("_tot")).alias("_off")
    )
    start = (F.col("_off") + F.col("_cum_in") - F.col("n_tokens")).cast(
        "bigint"
    )
    joined = d.join(broadcast(offsets), "_blk")
    if base_df is not None:
        # incremental mode: shift the whole plan by the token total of
        # the already-planned corpus (a 1-row broadcast, in-plan — no
        # driver-side collect)
        joined = joined.crossJoin(broadcast(base_df))
        start = (start + F.col("_base")).cast("bigint")
    # integer div keeps shard ids exact cross-engine (pack_bins rule)
    return (
        joined
        .withColumn("_start", start)
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"_start div {target_tokens}").alias("shard_id"),
            F.expr(f"_start - (_start div {target_tokens}) * {target_tokens}")
            .alias("offset_tokens"),
        )
    )


def length_histogram(documents: DataFrame, bucket_chars: int = 50) -> DataFrame:
    """Doc-length distribution in ``bucket_chars`` buckets →
    (bucket, n_docs, min_chars, max_chars) — the before/after-filter
    health check. Partial-agg shuffle on a tiny key space."""
    # integer div keeps the bucket id exact cross-engine
    bucket = F.expr(f"(n_chars div {bucket_chars}) * {bucket_chars}")
    return (
        documents.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )


def ngram_counts(documents: DataFrame, n: int = 2, k: int = 100) -> DataFrame:
    """Corpus top-k word n-grams by OCCURRENCE count (not distinct
    per doc — this is the LM-data frequency table, where repeats
    matter) → (ngram, total_freq, doc_freq). Non-distinct n-gram
    explode, one partial-agg shuffle on the n-gram, deterministic
    top-k tiebreak."""
    toks = words(F.col("text"))
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = documents.select("doc_id", F.col("text")).select(
        "doc_id", F.explode(grams).alias("ngram")
    )
    return (
        exploded.groupBy("ngram")
        .agg(
            F.count("*").alias("total_freq"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("total_freq").desc(), F.col("ngram"))
        .limit(k)
    )


def lexical_rarity(documents: DataFrame, rare_df: int = 2) -> DataFrame:
    """Corpus-relative lexical rarity per doc → (doc_id,
    n_unique_tokens, mean_df, rare_frac): mean document-frequency of
    the doc's distinct tokens and the fraction with df ≤ ``rare_df``.

    Low mean_df / high rare_frac marks jargon-heavy or noisy docs —
    a quality-scoring signal next to the stopword/punct ratios, and
    (unlike a unigram-LM perplexity) built from integer counts only,
    so it is exactly portable across engines.

    One shuffle builds the df table (distinct (doc, token) → token
    rollup); the per-doc rollup reuses the same exploded rows. At
    100 TB the df table is vocabulary-sized — orders smaller than the
    corpus — and both aggregations are map-side combinable."""
    toks = documents.select(
        "doc_id", F.explode(F.array_distinct(words(F.col("text")))).alias("tok")
    )
    df = toks.groupBy("tok").agg(F.count("*").alias("df"))
    return (
        toks.join(df, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_unique_tokens"),
            F.round(F.sum("df") / F.count("*"), 6).alias("mean_df"),
            F.round(
                F.sum(F.when(F.col("df") <= rare_df, 1).otherwise(0))
                / F.count("*"),
                6,
            ).alias("rare_frac"),
        )
    )


def length_token_corr(documents: DataFrame) -> DataFrame:
    """Per-language Pearson correlation of char length vs token count
    → (lang, n_docs, corr).

    Built from EXACT integer moments (Σx, Σy, Σx², Σy², Σxy in
    BIGINT — never a streaming co-moment like ``F.corr``, whose
    result depends on aggregation order), then one double formula:
    products stay < 2^53 for corpora up to ~10⁹ docs × 10⁴ chars, so
    the double math is identical across engines. One scan, one tiny
    rollup."""
    x = F.length("text").cast("bigint")
    y = F.size(words(F.col("text"))).cast("bigint")
    m = documents.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n_docs")
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    # Pearson is undefined when either variance is zero (a language
    # with one doc, or all-equal lengths): emit NULL instead of
    # DIVIDE_BY_ZERO under ANSI mode; the oracle mirrors the guard
    return m.select(
        "lang",
        "n_docs",
        F.when(
            (vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)
        ).alias("corr"),
    )


def keywords(documents: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` distinctive terms per doc → (doc_id, token, tf, df,
    score): term frequency over corpus document frequency — the
    TF-IDF ranking with a RATIONAL score (tf/df) instead of a log
    idf, so the ranking is exactly portable across engines (ln
    differs in ulps between libm and the JVM).

    One shuffle builds the df table from distinct (doc, token); the
    rank window runs per doc with a deterministic (score DESC, token)
    tiebreak."""
    from pyspark.sql.window import Window

    toks = documents.select(
        "doc_id", F.explode(words(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.col("tf") / F.col("df")), "token"
    )
    return (
        tf.join(df, "token")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(F.col("tf") / F.col("df"), 6).alias("score"),
        )
    )


def char_classes(documents: DataFrame) -> DataFrame:
    """Per-doc character-class census → (doc_id, n_alpha, n_digit,
    n_space, n_punct, n_nonascii): the code-vs-prose / mojibake
    detector a curation pipeline runs next to the quality ratios
    (high digit/punct share flags tables and minified code; nonascii
    flags encoding damage in an ascii-expected source).

    All counts are length-difference expressions over one scan —
    integer-exact, zero shuffle, fully codegen'd."""
    total = F.length("text")

    def n(pattern: str):
        return total - F.length(F.regexp_replace(F.col("text"), pattern, ""))

    alpha, digit, space = n("[A-Za-z]"), n("[0-9]"), n(f"[{WS_CLASS}]")
    nonascii = n("[^\\x00-\\x7F]")
    return documents.select(
        "doc_id",
        alpha.cast("bigint").alias("n_alpha"),
        digit.cast("bigint").alias("n_digit"),
        space.cast("bigint").alias("n_space"),
        (total - alpha - digit - space - nonascii)
        .cast("bigint")
        .alias("n_punct"),
        nonascii.cast("bigint").alias("n_nonascii"),
    )


def type_token(documents: DataFrame) -> DataFrame:
    """Per-doc lexical-diversity rollup → (doc_id, n_tokens, n_types,
    n_hapax, ttr): type-token ratio and hapax-legomena count, the
    classic repetition/diversity quality signals (template spam has
    low TTR; OCR noise has high hapax share).

    Computed by exploding tokens and aggregating (doc, term) counts —
    one map-side-combinable shuffle keyed by (doc_id, term), never a
    per-doc O(len²) array scan, so a 100 TB corpus stays a two-level
    hash aggregate."""
    toks = documents.select(
        "doc_id", F.explode(words(F.col("text"))).alias("term")
    )
    per_term = toks.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    return per_term.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.round(F.count("*") / F.sum("c"), 6).alias("ttr"),
    )


def mixture_weights(documents: DataFrame) -> DataFrame:
    """Domain-mixture resampling weights → (lang, n_docs, share,
    weight): per-language corpus share and the sampling weight that
    rebalances the mixture to a UNIFORM target over languages
    (weight = target_share / actual_share) — the reweighting step of
    a training-data mixture job (cf. DoReMi/DSIR-style domain
    balancing; the uniform target keeps it parameter-free and
    oracle-checkable).

    One tiny rollup, then a 1-row totals broadcast back onto it —
    the corpus is scanned once; no per-doc shuffle."""
    per_lang = documents.groupBy("lang").agg(F.count("*").alias("n_docs"))
    totals = per_lang.agg(
        F.sum("n_docs").alias("_total"), F.count("*").alias("_n_langs")
    )
    return per_lang.crossJoin(broadcast(totals)).select(
        "lang",
        "n_docs",
        F.round(F.col("n_docs") / F.col("_total"), 6).alias("share"),
        F.round(
            F.col("_total") / (F.col("_n_langs") * F.col("n_docs")), 6
        ).alias("weight"),
    )


def lang_confusion(documents: DataFrame) -> DataFrame:
    """Confusion matrix of tagged vs predicted language →
    (lang, lang_pred, n_docs) — the eval rollup for the heuristic
    language-ID (accuracy per class, systematic confusions). Pure
    projection + one partial-agg shuffle on a ≤|langs|² key space."""
    return (
        lang_id(documents)
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


def sample_k_per_lang(documents: DataFrame, k: int = 50) -> DataFrame:
    """Deterministic EXACT-k stratified sample → the first ``k`` docs
    per language under the md5(doc_id) shuffle order → (doc_id, lang,
    sample_rank). Complements the hash-THRESHOLD sampler (which gives
    a k only in expectation): eval sets and human-review batches need
    exactly k.

    The md5 rank is a content-independent, engine-portable shuffle;
    the per-lang window ranks within each stratum in parallel. At
    100 TB, rank windows over full strata are wasteful — you'd
    pre-filter with the threshold sampler to ~4k candidates per
    stratum first, then rank exactly; composition left to the
    caller."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        documents.select(
            "doc_id", "lang", F.row_number().over(w).alias("sample_rank")
        )
        .where(F.col("sample_rank") <= k)
        .select(
            "doc_id", "lang", F.col("sample_rank").cast("int").alias("sample_rank")
        )
    )


def boilerplate_lines(documents: DataFrame, k: int = 50) -> DataFrame:
    """Corpus-frequent LINES → top-k (line, total_freq, doc_freq):
    the boilerplate detector ("Subscribe to our newsletter", cookie
    banners, license headers) that line-level curation strips before
    training — document-level dedup never sees these because the
    surrounding text differs.

    Narrow newline explode + one line-key rollup (map-side
    combinable), deterministic top-k tiebreak. At 100 TB the rollup
    output is boilerplate-vocabulary sized; a DF cap is unnecessary
    because the aggregate never materializes per-pair work."""
    lines = documents.select(
        "doc_id",
        F.explode(F.split(F.col("text"), "\n")).alias("raw"),
    ).select("doc_id", F.trim(F.col("raw")).alias("line"))
    return (
        lines.where(F.length("line") > 0)
        .groupBy("line")
        .agg(
            F.count("*").cast("bigint").alias("total_freq"),
            F.count_distinct("doc_id").cast("bigint").alias("doc_freq"),
        )
        .orderBy(F.col("total_freq").desc(), F.col("line"))
        .limit(k)
    )


def shingle_diversity(documents: DataFrame, n: int = 3) -> DataFrame:
    """Per-language corpus n-gram diversity → (lang,
    n_shingle_occurrences, n_distinct_shingles, diversity).

    diversity = distinct shingles / total per-doc-distinct shingle
    occurrences: 1.0 means every document contributes novel n-grams,
    low values mean a templated/self-repetitive corpus — the standard
    corpus-health readout next to dedup rates (per-doc repetition is
    ``repetition.signals``; this is the cross-doc aggregate).

    Scale: one explode + one groupBy(lang). The exact COUNT(DISTINCT)
    expands to a two-phase aggregate on (lang, shingle) — fine because
    shingle cardinality per language partitions well; at 100 TB swap
    in approx_count_distinct for one pass (the HLL trade shown in
    events_approx_users)."""
    from .tokenize import word_shingles

    toks = documents.select("lang", words(F.col("text")).alias("w"))
    sh = toks.select(
        "lang", F.explode(word_shingles(F.col("w"), n)).alias("shingle")
    )
    agg = sh.groupBy("lang").agg(
        F.count("*").alias("n_shingle_occurrences"),
        F.countDistinct("shingle").alias("n_distinct_shingles"),
    )
    return agg.select(
        "lang",
        F.col("n_shingle_occurrences").cast("bigint").alias(
            "n_shingle_occurrences"
        ),
        F.col("n_distinct_shingles").cast("bigint").alias(
            "n_distinct_shingles"
        ),
        F.round(
            F.col("n_distinct_shingles") / F.col("n_shingle_occurrences"), 6
        ).alias("diversity"),
    )


def shard_plan_incremental(
    documents: DataFrame,
    target_tokens: int = 2000,
    cutover: int = 250,
    block: int = 65536,
) -> DataFrame:
    """APPEND-ONLY shard planning: plan only the incoming docs
    (``doc_id >= cutover``), continuing exactly where the existing
    plan left off — the dedup_incremental analog for the writer side.
    A growing corpus must never replan (and so never re-scan) its
    history; the only state the append path needs from the old plan
    is its total token count, carried here as a 1-row broadcast.

    The gate derives that base total by scanning the old half (the
    corpus is one table at test scale); in production it is read off
    the persisted plan's tail row (last shard_id · target + offset +
    n_tokens) — O(1), no old-text scan. The DuckDB oracle is the
    RECOMPUTE path (the full-corpus global cumsum filtered to the
    incoming docs), so the hash gate pins the append path ≡ replan
    equivalence — the invariant that makes incremental planning safe
    to run forever."""
    old = documents.where(F.col("doc_id") < cutover)
    new = documents.where(F.col("doc_id") >= cutover)
    base = old.agg(
        F.coalesce(
            F.sum(F.size(words(F.col("text"))).cast("bigint")), F.lit(0)
        ).alias("_base")
    )
    return shard_plan(
        new, target_tokens=target_tokens, block=block, base_df=base
    )


def shingle_hll_registers(
    documents: DataFrame, n: int = 3, p: int = 8
) -> DataFrame:
    """Per-language distinct-shingle HLL register table → (lang,
    bucket, max_rho): the PORTABLE register twin of
    ``shingle_diversity_approx``. approx_count_distinct's HLL++
    sketch is engine-internal (rows-only by necessity); these
    registers come from the md5-60 shingle hash (the
    events_user_hll recipe: bucket = h mod 2^p, rho = leading-zero
    rank of the remaining bits via the binary-string length), so the
    sketch a 100 TB curation job would persist per corpus slice and
    max-merge across slices hash-matches DuckDB row-for-row — only
    the final float estimate stays client-side.

    Scale shape: the shingle explode (shared with every dedup op) then
    one map-side-combined max-rollup on (lang, bucket) — ≤ langs·2^p
    rows out regardless of corpus size."""
    from .tokenize import md5_hash60, word_shingles

    m = 1 << p
    toks = documents.select("lang", words(F.col("text")).alias("w"))
    sh = toks.select(
        "lang", F.explode(word_shingles(F.col("w"), n)).alias("shingle")
    )
    d = sh.select(
        "lang", md5_hash60(F.col("shingle")).alias("_h")
    ).select(
        "lang",
        F.expr(f"CAST(_h % {m} AS INT)").alias("bucket"),
        F.expr(f"_h div {m}").alias("_w"),
    )
    rho = F.when(
        F.col("_w") > 0, F.lit(61 - p) - F.length(F.bin(F.col("_w")))
    ).otherwise(F.lit(61 - p))
    return d.groupBy("lang", "bucket").agg(
        F.max(rho).cast("int").alias("max_rho")
    )


def shingle_diversity_approx(
    documents: DataFrame, n: int = 3, rsd: float = 0.02
) -> DataFrame:
    """One-pass HLL twin of ``shingle_diversity`` — the 100 TB path.

    Exact COUNT(DISTINCT shingle) expands to a two-phase aggregate
    that shuffles every (lang, shingle) pair; at corpus scale that is
    the whole shingle stream. approx_count_distinct keeps a fixed-size
    HLL sketch per language — map-side combinable, one shuffle of
    sketch bytes only, rsd=2% standard error. Rows-only by design
    (HLL estimates are engine-specific); the error bound vs the exact
    op is pytest-gated (test_text.py::test_diversity_approx_bound).
    """
    from .tokenize import word_shingles

    toks = documents.select("lang", words(F.col("text")).alias("w"))
    sh = toks.select(
        "lang", F.explode(word_shingles(F.col("w"), n)).alias("shingle")
    )
    agg = sh.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_shingle_occurrences"),
        F.approx_count_distinct("shingle", rsd)
        .cast("bigint")
        .alias("n_distinct_shingles_est"),
    )
    return agg.select(
        "lang",
        "n_shingle_occurrences",
        "n_distinct_shingles_est",
        F.round(
            F.col("n_distinct_shingles_est") / F.col("n_shingle_occurrences"),
            6,
        ).alias("diversity_est"),
    )


def lm_score(documents: DataFrame) -> DataFrame:
    """CCNet-style unigram language-model scoring → (doc_id,
    n_tokens, ce_millibits, cross_entropy): per-document cross-
    entropy under an add-one-smoothed unigram LM fit on the corpus
    itself. Low cross-entropy = fluent/common text, high = garbled or
    off-distribution — the perplexity-filter axis CCNet/LLaMA used
    for stage-one web curation (Wenzek et al. 2020 use a KenLM
    5-gram; the unigram version is the same signal class with an
    exactly-verifiable closed form).

    Cross-engine determinism: per-token information content is
    QUANTIZED to integer millibits — round(1000·log2((c+1)/(N+V))) —
    before any summation, so the per-doc total is exact BIGINT math
    (order-independent; a raw double Σ log p would depend on fold
    order, and libm log2 may differ in the last ulp between engines,
    which quantization absorbs). ce_millibits = −Σ m_t·mb_t;
    cross_entropy = ce_millibits / (1000·n_tokens), one deterministic
    division at the end.

    Scale: vocab rollup is one map-side-combinable shuffle; the
    (doc,token)→vocab join shuffles on token; per-doc rollup shuffles
    on doc_id. The 1-row (N, V) totals ride in via a broadcast cross
    join computed in-plan. At 100 TB you'd frequency-cap the vocab
    (tail singletons dominate V but carry no mass) and score against
    a FROZEN reference LM instead of refitting per batch — same
    plan, the vocab side becomes a static broadcast table."""
    toks = documents.select(
        "doc_id", F.explode(words(F.col("text"))).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count("*").cast("bigint").alias("c"))
    totals = vocab.agg(
        F.sum("c").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("v_size"),
    )
    doc_tok = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("bigint").alias("m")
    )
    scored = (
        doc_tok.join(vocab, "token")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "m",
            F.round(
                F.lit(1000.0)
                * F.log2((F.col("c") + 1) / (F.col("n_total") + F.col("v_size"))),
                0,
            )
            .cast("bigint")
            .alias("mb"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("m").cast("bigint").alias("n_tokens"),
        (-F.sum(F.col("m") * F.col("mb"))).cast("bigint").alias("ce_millibits"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "ce_millibits",
        F.round(
            F.col("ce_millibits") / (F.lit(1000.0) * F.col("n_tokens")), 6
        ).alias("cross_entropy"),
    )


def readability(documents: DataFrame) -> DataFrame:
    """Flesch-Kincaid grade level → (doc_id, n_words, n_sentences,
    n_syllables, fk_grade): the education-level curation signal
    (FineWeb-Edu selects by a learned version of exactly this axis;
    the formula is its century-old closed-form twin).

    Syllables ≈ vowel-group runs per word (min 1), sentences ≈
    [.!?]+ runs (min 1) — both integer counts summed order-
    independently, so the only floats are the final fixed-shape
    formula 0.39·(W/S) + 11.8·(Syl/W) − 15.59, written identically
    in the oracle (same literals, same operation tree → same IEEE
    doubles). Pure column expressions: zero shuffle.
    """
    ws = words(F.col("text"))
    syl = F.aggregate(
        F.transform(
            ws,
            lambda w: F.greatest(
                F.lit(1),
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)),
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sent = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0))
    )
    base = documents.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        sent.alias("n_sentences"),
        syl.alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    y = F.col("n_syllables").cast("double")
    return base.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_sentences").cast("bigint").alias("n_sentences"),
        F.col("n_syllables").cast("bigint").alias("n_syllables"),
        F.round(
            F.lit(0.39) * (w / s) + F.lit(11.8) * (y / w) - F.lit(15.59), 4
        ).alias("fk_grade"),
    )


def lm_score_bigram(documents: DataFrame, lam: float = 0.75) -> DataFrame:
    """Interpolated BIGRAM LM scoring → (doc_id, n_bigrams,
    ce_millibits, cross_entropy): per-document cross-entropy under
    p(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·(c(w2)+1)/(N+V), fit on the
    corpus itself — one order up from :func:`lm_score` toward the
    KenLM n-gram filter CCNet actually deploys (Jelinek-Mercer
    interpolation with a fixed λ keeps the closed form exactly
    verifiable; backoff weights would need per-context normalization
    state).

    Same determinism discipline as the unigram op: the interpolated
    probability is one fixed-shape double expression over exact
    BIGINT counts (identical IEEE evaluation in both engines),
    QUANTIZED to integer millibits before any summation, so the
    per-doc total is order-independent integer math. Docs with < 2
    tokens have no bigrams and are excluded (mirrored).

    Scale: bigrams pair IN-ROW (array zip — no self-join of the
    token stream); the count tables shuffle once each on their key;
    scoring joins shuffle on the bigram key with map-side combine.
    At 100 TB: frequency-cap the bigram vocab and freeze the LM as
    a static broadcast table (same plan shape, no refit)."""
    w = words(F.col("text"))
    bg = (
        documents.select("doc_id", w.alias("w"))
        .where(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1), "
                    "i -> struct(w[i-1] AS w1, w[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    toks = documents.select("doc_id", F.explode(w).alias("token"))
    uni = toks.groupBy("token").agg(F.count("*").cast("bigint").alias("c"))
    totals = uni.agg(
        F.sum("c").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("v_size"),
    )
    ctx = bg.groupBy("w1").agg(F.count("*").cast("bigint").alias("c1"))
    bgc = bg.groupBy("w1", "w2").agg(
        F.count("*").cast("bigint").alias("cb")
    )
    doc_bg = bg.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").cast("bigint").alias("m")
    )
    p = F.lit(lam) * (F.col("cb") / F.col("c1")) + F.lit(1.0 - lam) * (
        (F.col("c") + 1) / (F.col("n_total") + F.col("v_size"))
    )
    scored = (
        doc_bg.join(bgc, ["w1", "w2"])
        .join(ctx, "w1")
        .join(uni.select(F.col("token").alias("w2"), "c"), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "m",
            F.round(F.lit(1000.0) * F.log2(p), 0).cast("bigint").alias("mb"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("m").cast("bigint").alias("n_bigrams"),
        (-F.sum(F.col("m") * F.col("mb"))).cast("bigint").alias("ce_millibits"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        "ce_millibits",
        F.round(
            F.col("ce_millibits") / (F.lit(1000.0) * F.col("n_bigrams")), 6
        ).alias("cross_entropy"),
    )
