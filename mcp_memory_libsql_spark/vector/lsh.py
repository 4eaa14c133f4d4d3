"""Approximate nearest neighbors: random-hyperplane (SimHash) LSH.

The scale path for similarity search: brute-force cosine is a full
scan per query; LSH bucket-joins instead — vectors are hashed to
``n_tables`` independent signatures of ``n_bits`` hyperplane signs,
candidates = vectors sharing a signature with the query in any
table, and only candidates get exact scoring. At 100 TB the bucketed
table is written partitioned by (table_id, signature) so a query
touches only its buckets (partition pruning), and signatures are
tiny regardless of vector width.

Tuning (recall per neighbor ≈ 1-(1-(1-θ/π)^n_bits)^n_tables):
- ANN over weakly-similar corpora (top cosine ~0.3-0.5) needs NARROW
  signatures for recall — the defaults below.
- Near-dup mining at tight thresholds (τ≥0.9) needs WIDE signatures:
  with b bits a table has 2^b buckets and the bucket self-join pairs
  ~N²/2^b rows per table — at 4 bits that is the all-pairs blowup the
  operator exists to avoid. ``n_bits_for_threshold`` picks the width
  from τ, and ``bucket_cap`` bounds the worst bucket (the DF_CAP
  analog from textops.dedup), so no bucket can explode regardless of
  data skew.

Hyperplanes are deterministic (seeded md5 → uniform in [-1,1]) and
shipped to the workers as a small closure matrix — no driver-side
data collection, no RNG divergence between runs. Signature dots run
as one Arrow-batched numpy pass per scan (``_sig_family_udf``),
bit-identical by construction to the ``aggregate(zip_with(...))``
expression form they replaced (guide §4.2: batch-vectorized native
compute beats both interpreted lambdas and a 16k-node codegen tree).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from ..textops.tokenize import pair_combos
from .similarity import cosine

N_TABLES = 16
N_BITS = 4  # ANN default: recall-oriented (see module docstring)
BUCKET_CAP = 100  # max vectors per (table, sig) bucket in pair mining
# Widest signature the shared index stores. Plane seeds are per
# (table, bit) and independent of the total width, so the low w bits
# of a 16-bit signature EQUAL the w-bit signature — one stored index
# serves every consumer width via `sig % 2^w` masking. 16 (was 12 in
# r04): at 12 the width_for_corpus clamp bound at N≈131k — measured
# by the rehearsal's 30x point — and past the bind the mean bucket
# grows linearly again, re-creating the recall collapse the adaptive
# width exists to prevent. 16 bits carries ~2.1M vectors (covers the
# 100x sweep point); each +1 bit costs one plane dot per (vector,
# table) at index build and doubles capacity.
MAX_BITS = 16
# Adaptive-width target: mean vectors per (table, sig) bucket. With a
# FIXED width, bucket population grows linearly with corpus size and
# the pair-mining cap eventually drops EVERY bucket (measured by the
# cap-bite instrument: 100% of 4-bit buckets over cap at 2× sf0.1 —
# recall collapses to zero exactly when scale makes the op matter).
# Width must grow ~log2(N): pick the smallest w with N/2^w ≤ target.
TARGET_BUCKET = 32


def width_for_corpus(n: int) -> int:
    """Smallest signature width in [N_BITS, MAX_BITS] whose mean
    bucket width is ≤ TARGET_BUCKET at corpus size ``n`` — the same
    rule the DuckDB oracle applies via a COUNT-driven CASE, so both
    engines mask to the identical width at any sf. At 16 bits the
    clamp binds around N≈2.1M; a real deployment raises MAX_BITS
    with the corpus (each +1 bit doubles capacity and costs one more
    plane dot at index build). The rehearsal's cap-bite instrument
    emits ``clamp_bound`` whenever the clamp is the binding
    constraint, so the next scale jump is visible before it eats
    recall."""
    for w in range(N_BITS, MAX_BITS + 1):
        if n <= TARGET_BUCKET * (1 << w):
            return w
    return MAX_BITS


def n_bits_for_threshold(threshold: float) -> int:
    """Signature width scaled to the rescore threshold: per-bit
    agreement p = 1-arccos(τ)/π rises with τ, so tight thresholds
    tolerate wide signatures (recall holds) while slashing candidate
    volume — 16 bits at τ≥0.9 gives 65,536 buckets/table vs 16 at the
    ANN default."""
    if threshold >= 0.9:
        return 16
    if threshold >= 0.8:
        return 12
    if threshold >= 0.7:
        return 8
    if threshold >= 0.6:
        return 6
    return N_BITS


def _plane(seed: str, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane coefficients."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        (u,) = struct.unpack("<Q", h[:8])
        out.append(u / float(1 << 64) * 2.0 - 1.0)
    return out


def planes(dim: int, n_tables: int = N_TABLES, n_bits: int = N_BITS):
    return [
        [_plane(f"t{t}b{b}", dim) for b in range(n_bits)]
        for t in range(n_tables)
    ]


def _sig_family_udf(dim: int, n_tables: int, n_bits: int):
    """Vectorized signature family: a pandas UDF mapping one embedding
    to ``array<int>`` of every table's signature in one numpy pass.

    The expression form this replaces (r10) evaluated n_tables·n_bits
    interpreted ``aggregate(zip_with(...))`` lambdas per row — 256
    dots × 64 elements at the stored index's width, ~16k interpreted
    evals per row plus a codegen tree so large that janino compilation
    alone dominated a cold build (measured 25.0s → 1.9s cold / 2.8s →
    0.33s warm for the 16-bit index at sf0.1, rows bit-identical via
    exceptAll both directions).

    Bit-identity is by construction, not accident: the accumulation
    ``acc += v[i]·p[i]`` runs left-to-right over i per (row, plane) in
    float64 — the exact IEEE op sequence ``aggregate(zip_with(v, p,
    (x, y) -> double(x)·y), 0.0, +)`` executed — so every dot, sign
    bit and signature matches the old plan and the DuckDB oracle
    bit-for-bit. Rows whose embedding is NULL or whose length ≠
    ``dim`` signature to 0 in every table, matching the null-poisoned
    aggregate of the zip_with form (null element ⇒ null dot ⇒ every
    WHEN arm 0)."""
    ps = planes(dim, n_tables, n_bits)
    k = n_tables * n_bits
    # plane matrix P[i, t·n_bits+b] = plane(t,b)[i]; weights W fold
    # the (plane > 0) sign bits back into per-table integers
    p_mat = np.empty((dim, k), dtype=np.float64)
    for t in range(n_tables):
        for b in range(n_bits):
            p_mat[:, t * n_bits + b] = ps[t][b]
    w_mat = np.zeros((k, n_tables), dtype=np.int64)
    for t in range(n_tables):
        for b in range(n_bits):
            w_mat[t * n_bits + b, t] = 1 << b

    @F.pandas_udf("array<int>")
    def sig_family(col: pd.Series) -> pd.Series:
        vals = col.values
        n = len(vals)
        ok = np.zeros(n, dtype=bool)
        mat = np.zeros((n, dim), dtype=np.float64)
        for r, v in enumerate(vals):
            if v is not None and len(v) == dim:
                ok[r] = True
                mat[r] = np.asarray(v, dtype=np.float32).astype(np.float64)
        acc = np.zeros((n, k), dtype=np.float64)
        for i in range(dim):
            acc += mat[:, i : i + 1] * p_mat[i]
        bits = (acc > 0) & ok[:, None]
        sigs = (bits.astype(np.int64) @ w_mat).astype(np.int32)
        return pd.Series(list(sigs))

    return sig_family


def bucketize(
    embeddings: DataFrame,
    dim: int,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
) -> DataFrame:
    """(vec_id, table_id, sig) — the LSH index table. ONE scan of the
    embeddings computes every table's signature (one Arrow-batched
    numpy pass, :func:`_sig_family_udf`) and posexplodes — not a
    per-table union, which would re-read the source n_tables times.
    On a cluster: write once, partitioned by (table_id, sig), reuse
    across queries."""
    fam = _sig_family_udf(dim, n_tables, n_bits)
    return embeddings.select(
        "vec_id", F.posexplode(fam(F.col("embedding"))).alias("table_id", "sig")
    )


def refresh_index(
    old_index: DataFrame,
    new_embeddings: DataFrame,
    dim: int,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
) -> DataFrame:
    """Incremental signature-index maintenance (VERDICT r06 item 1):
    append the signatures of NEW vectors to an existing ``bucketize``
    index — a vector's signature is a pure per-row function of the
    md5-seeded planes (no corpus dependence), so the refreshed index
    is EXACTLY the full rebuild over old∪new (pytest-pinned in
    tests/test_refresh.py; cross-engine-pinned by the
    ``vec_lsh_refresh`` oracle twin, whose DuckDB side rebuilds from
    scratch). Cost is one scan of the delta (O(|new|·tables·bits)
    plane dots) vs the rebuild's full-corpus scan; at 100 TB this is
    the difference between re-ingesting the corpus and ingesting the
    day's arrivals.

    Contract: ``new_embeddings`` holds genuinely NEW vec_ids (the
    append-only ingest shape; the registry's stored index is
    immutable per corpus). Re-ingested or deleted ids need the
    rebuild path — signatures don't change, but index membership
    would double or linger. Build at the same (n_tables, n_bits) as
    the stored index; the registry stores MAX_BITS and every consumer
    masks down, so width never forces a rebuild."""
    return old_index.select("vec_id", "table_id", "sig").unionByName(
        bucketize(new_embeddings, dim, n_tables, n_bits)
    )


def refresh_pairs(
    old_index: DataFrame,
    old_pairs: DataFrame,
    base_embeddings: DataFrame,
    new_embeddings: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_tables: int = N_TABLES,
    n_bits: int | None = None,
    bucket_cap: int = BUCKET_CAP,
    check_disjoint: bool = False,
) -> DataFrame:
    """Incremental maintenance of the scored near-dup PAIR stream
    (the artifact one level above the signature index — the registry's
    `_lsh_pairs`, read by four dedup surfaces): merge an append-only
    embedding delta into an existing ``near_dup_pairs_lsh`` result
    and return EXACTLY the full rebuild over base∪delta.

    Unlike the signature index (a pure per-row function, so refresh =
    append), pair mining is bucket-LOCAL but count-DEPENDENT:
    ``split_fat_buckets`` sizes each bucket's md5 sub-buckets from the
    bucket's member count, so a delta member re-deals its whole
    bucket's sub-assignments. The refresh therefore works at bucket
    granularity:

    1. TOUCHED buckets = the delta signatures' (table_id, sig) keys.
       Untouched buckets keep identical membership, counts, and
       sub-assignments — their pairs are byte-identical in a rebuild.
    2. Re-mine touched buckets under NEW membership (old members of
       those buckets + delta) → ``new_cand``; re-mine them under OLD
       membership → ``old_cand`` (reproduces exactly what the stored
       stream's candidate pass emitted there, since the split is
       bucket-local).
    3. kept = old_pairs ∖ old_cand (pairs justified by some untouched
       bucket — at least one, because every touched-bucket
       justification is in old_cand).
    4. RESCUE: a pair in old_pairs ∩ old_cand ∖ new_cand might still
       be justified by an untouched bucket (multi-table LSH: the same
       pair can co-bucket in several tables). Those suspects are few
       (≤ the touched-bucket combo volume), so check them explicitly:
       re-derive sub-assignments ONLY for untouched buckets containing
       a suspect member and keep suspects co-sub-bucketed there.
    5. Rescore new_cand against base∪delta vectors and threshold.

    result = kept ∪ rescue ∪ new_scored = (untouched-bucket pairs) ∪
    (touched-bucket pairs under new membership) = the rebuild, exactly
    (pytest-pinned on cap-crossing synthetic buckets and the real sf
    split in tests/test_refresh.py; cross-engine-pinned by the
    ``vec_neardup_refresh`` twin whose DuckDB oracle rebuilds from
    scratch). Every stage is candidate-sized except map-side scans of
    the stored index and pair stream (broadcast-able candidate sets on
    the join build side); the stored data is never SHUFFLED — the
    first version's final union+distinct re-shuffled the whole pair
    stream and lost to the rebuild at the 30× rehearsal point even
    for a 40-row delta. No full-corpus re-mining.

    REGIME BOUNDARY (measured, in SCALE_REHEARSAL index_refresh): the
    refresh wins only while the delta is bucket-SPARSE — touched
    buckets ≈ |delta|·n_tables against ~N/TARGET_BUCKET total, so a
    delta above ~N/(TARGET_BUCKET·n_tables) rows re-mines a large
    corpus fraction AND pays candidate materialization on top: the
    +1-copy (~3% of rows) rehearsal delta touches ~half of all
    buckets and measures 0.35× (rebuild wins); a 40-row delta
    measures 1.24×. Batch arrivals past the boundary should take the
    rebuild path — which stays cheap precisely because it reuses the
    stored (separately refreshable) signature index. Contract: same (n_tables, n_bits,
    bucket_cap, threshold) as the stored stream, and ``n_bits`` must
    stay the corpus-adaptive width of the GROWN corpus — a delta big
    enough to cross a width_for_corpus boundary is a rebuild, the
    same boundary the signature index documents. And the delta must
    be APPEND-ONLY: ``new_embeddings`` vec_ids disjoint from
    ``base_embeddings`` — an overlapping id would duplicate rows in
    the rescore joins and silently break the kept/old_cand algebra
    (the exactness proof assumes old∪new is a disjoint union).
    ``check_disjoint=True`` verifies this with one early-exiting
    semi-join probe (an extra base scan — the registry gate runs it;
    production callers whose ingest already guarantees append-only
    can skip the scan)."""
    from ..textops.tokenize import split_fat_buckets

    if check_disjoint:
        overlap = (
            new_embeddings.select("vec_id")
            .join(base_embeddings.select("vec_id"), "vec_id", "leftsemi")
            .limit(3)
            .collect()
        )
        if overlap:
            ids = sorted(r.vec_id for r in overlap)
            raise ValueError(
                "refresh_pairs requires an append-only delta: vec_ids "
                f"{ids}… exist in base_embeddings — take the rebuild path "
                "(near_dup_pairs_lsh over the corrected corpus) instead"
            )
    if n_bits is None:
        n_bits = n_bits_for_threshold(threshold)
    # The candidate-sized intermediates (delta signatures, touched
    # mining results, suspects) are each consumed by SEVERAL
    # downstream joins; eager localCheckpoints evaluate the mining
    # subtree once instead of once per consumer (profiled at the 30×
    # rehearsal point with a 40-row delta: the re-evaluations were
    # ~15s of the 19s wall — the refresh was re-mining the touched
    # buckets five times).
    d_idx = bucketize(new_embeddings, dim, n_tables, n_bits).localCheckpoint(
        eager=True
    )
    touched = d_idx.select("table_id", "sig").distinct()

    def mine(idx: DataFrame) -> DataFrame:
        capped = split_fat_buckets(
            idx, ["table_id", "sig"], "vec_id", bucket_cap
        )
        return (
            capped.groupBy("table_id", "sig", "_sub")
            .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
            .select(F.explode(pair_combos("ids", "vec_a", "vec_b")).alias("p"))
            .select("p.vec_a", "p.vec_b")
            .distinct()
        )

    old_t = old_index.join(touched, ["table_id", "sig"], "leftsemi")
    new_cand = mine(old_t.unionByName(d_idx)).localCheckpoint(eager=True)
    old_cand = mine(old_t).localCheckpoint(eager=True)

    kept = old_pairs.join(old_cand, ["vec_a", "vec_b"], "left_anti")
    suspects = (
        old_pairs.join(old_cand, ["vec_a", "vec_b"], "leftsemi")
        .join(new_cand, ["vec_a", "vec_b"], "left_anti")
        .localCheckpoint(eager=True)
    )

    members = (
        suspects.select(F.col("vec_a").alias("vec_id"))
        .unionByName(suspects.select(F.col("vec_b").alias("vec_id")))
        .distinct()
    )
    suspect_buckets = (
        old_index.join(members, "vec_id", "leftsemi")
        .select("table_id", "sig")
        .distinct()
        .join(touched, ["table_id", "sig"], "left_anti")
    )
    unt = split_fat_buckets(
        old_index.join(suspect_buckets, ["table_id", "sig"], "leftsemi"),
        ["table_id", "sig"],
        "vec_id",
        bucket_cap,
    )
    co = (
        unt.select("table_id", "sig", "_sub", F.col("vec_id").alias("vec_a"))
        .join(
            unt.select(
                "table_id", "sig", "_sub", F.col("vec_id").alias("vec_b")
            ),
            ["table_id", "sig", "_sub"],
        )
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    rescued = suspects.join(co, ["vec_a", "vec_b"], "leftsemi")

    def side(df: DataFrame, key: str, emb: str) -> DataFrame:
        return df.select(
            F.col("vec_id").alias(key), F.col("embedding").alias(emb)
        )

    ea = side(base_embeddings, "vec_a", "emb_a").unionByName(
        side(new_embeddings, "vec_a", "emb_a")
    )
    eb = side(base_embeddings, "vec_b", "emb_b").unionByName(
        side(new_embeddings, "vec_b", "emb_b")
    )
    new_scored = (
        new_cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias(
                "cosine_sim"
            ),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
    # The three branches are made structurally DISJOINT instead of
    # union+distinct — a global distinct would shuffle the ENTIRE
    # stored pair stream (measured 97s for a 40-row delta at the 30×
    # rehearsal point, worse than the 48s rebuild), turning the
    # refresh into a full-corpus job. kept∩rescued = ∅ (anti vs semi
    # on old_cand); rescued∩new = ∅ (rescue is anti new_cand); the
    # only overlap is kept∩new_scored = old_pairs ∩ new_cand ∖
    # old_cand (`replay` — pairs the touched re-mine re-derives that
    # an untouched bucket already justifies), removed from the new
    # branch with candidate-sized joins. old_pairs is scanned
    # map-side (broadcast-able candidate sets on the build side) and
    # never shuffled.
    replay = (
        old_pairs.join(new_cand, ["vec_a", "vec_b"], "leftsemi")
        .join(old_cand, ["vec_a", "vec_b"], "left_anti")
        .select("vec_a", "vec_b")
    )
    new_fixed = new_scored.join(replay, ["vec_a", "vec_b"], "left_anti")
    return kept.unionByName(rescued).unionByName(new_fixed)


def ann_cosine(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dim: int = 64,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
    bucket_cap: int | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by cosine: candidates from LSH bucket
    agreement, exact rescoring of candidates only. ``bucket_cap``
    optionally drops overfull buckets (bounded per-query work in
    dense regions, at a recall cost). → (vec_id, label, cosine_sim).

    ``index`` accepts a prebuilt ``bucketize`` table (the registry's
    disk-backed per-session artifact, partitioned by (table_id, sig))
    — serving-path queries then never recompute the plane dots and
    the signature semi-join prunes to the query's partitions."""
    if index is None:
        index = bucketize(embeddings, dim, n_tables, n_bits)
    if bucket_cap is not None:
        ok = (
            index.groupBy("table_id", "sig")
            .count()
            .where(F.col("count") <= bucket_cap)
            .select("table_id", "sig")
        )
        index = index.join(ok, ["table_id", "sig"], "leftsemi")
    q_sigs = broadcast(
        index.where(F.col("vec_id") == query_vec_id).select("table_id", "sig")
    )
    cand_ids = (
        index.join(q_sigs, ["table_id", "sig"], "leftsemi")
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id")
        .distinct()
    )
    q = broadcast(
        embeddings.where(F.col("vec_id") == query_vec_id).select(
            F.col("embedding").alias("q_embedding")
        )
    )
    scored = (
        embeddings.join(cand_ids, "vec_id", "leftsemi")
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


def near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_tables: int = N_TABLES,
    n_bits: int | None = None,
    bucket_cap: int = BUCKET_CAP,
    index: DataFrame | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via LSH candidates + exact rescore —
    the 100 TB path replacing the brute N² cross join
    (textops.dedup.embedding_near_pairs). → (vec_a, vec_b, cosine_sim).

    Plan (never N², bounded per bucket):
    1. signature width auto-scales with ``threshold``
       (``n_bits_for_threshold``; ≥16 bits at τ≥0.9);
    2. ``split_fat_buckets`` bounds every bucket at ``bucket_cap``
       members: buckets over cap are SPLIT into ~2·count/cap md5
       sub-buckets instead of dropped — the r05 rehearsal measured a
       15.8% bucket drop rate at the 100× point under the old
       drop-rule (the mean-width target undersizes the fat tail), and
       the split recovers those pairs at the same bounded combo cost;
    3. surviving rows group per (bucket, sub) — the window pass has
       already partitioned by the bucket key, so the groupBy reuses
       the shuffle — and emit intra-bucket pairs from the sorted id
       array;
    4. distinct pairs get ONE exact rescore each.

    The signature index is a single-consumer pass under the window
    plan (the old count-pass + semi-join read it twice and needed a
    persist); a prebuilt ``index`` (the registry's parquet artifact)
    skips the plane-dot build entirely — the cluster analog of "write
    the index once, partitioned by (table_id, sig)".
    """
    from ..textops.tokenize import split_fat_buckets

    if n_bits is None:
        n_bits = n_bits_for_threshold(threshold)
    if index is None:
        index = bucketize(embeddings, dim, n_tables, n_bits)
    capped = split_fat_buckets(index, ["table_id", "sig"], "vec_id", bucket_cap)
    pairs = (
        capped.groupBy("table_id", "sig", "_sub")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
        .select(F.explode(pair_combos("ids", "vec_a", "vec_b")).alias("p"))
        .select("p.vec_a", "p.vec_b")
        .distinct()
    )
    ea = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    eb = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    scored = (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cosine_sim"),
        )
    )
    return scored.where(F.col("cosine_sim") >= threshold)


def bucket_profile(
    embeddings: DataFrame,
    dim: int = 64,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
    index: DataFrame | None = None,
) -> DataFrame:
    """LSH index-health readout → (table_id, n_buckets, n_vectors,
    min_width, max_width): per-table bucket occupancy — the tuning
    harness that shows whether the signature width actually spreads
    the corpus (a table whose max_width ≈ n_vectors is the N²/buckets
    blowup the bucket cap exists to stop; the vector-side twin of
    dedup_shingle_profile's DF_CAP readout). All values are exact
    BIGINT counts over the deterministic md5-seeded index, so the
    oracle rebuilds the identical index in SQL.

    Scale: one embeddings scan (bucketize explodes all tables from a
    single pass) + one (table, sig) rollup + one per-table rollup —
    output is n_tables rows at any corpus size."""
    idx = index if index is not None else bucketize(embeddings, dim, n_tables, n_bits)
    widths = idx.groupBy("table_id", "sig").agg(F.count("*").alias("w"))
    return widths.groupBy("table_id").agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.sum("w").cast("bigint").alias("n_vectors"),
        F.min("w").cast("bigint").alias("min_width"),
        F.max("w").cast("bigint").alias("max_width"),
    )
