"""Event-stream analytics (batch form; streaming twin lives in
``streaming/pipeline.py``).

Scale notes:
- windowed agg: one shuffle on (window, event_type) with map-side
  partials; window bucketing is a pure projection (no UDF).
- sessionize: one shuffle on user_id, then window functions within
  the user partition — the canonical gap-sessionization plan; at
  100 TB the user_id shuffle is the cost and AQE splits skewed
  users' ranges only if we salt; heavy-hitter users are rare for
  session data so default hash partitioning holds.
- topk_users: partial-agg shuffle then a tiny global top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

SESSION_GAP_MINUTES = 30


def windowed_counts(t, minutes: int = 60) -> DataFrame:
    """Tumbling window aggregation per event_type."""
    ev = t["events"]
    win = F.window("ts", f"{minutes} minutes")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def windowed_counts_exact(t, minutes: int = 60) -> DataFrame:
    """Oracle-checkable variant (exact distinct, epoch-second window)."""
    ev = t["events"]
    secs = minutes * 60
    bucket = (F.unix_timestamp("ts") / secs).cast("bigint") * secs
    return (
        ev.groupBy(bucket.alias("window_start_epoch"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


def sessionize(t, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Gap-based sessions → one row per (user_id, session_id) with
    bounds and size. session_id is the running count of gap-breaks
    per user (deterministic)."""
    ev = t["events"].select("user_id", "ts", "value")
    by_user = Window.partitionBy("user_id").orderBy("ts", "value")
    prev_ts = F.lag("ts").over(by_user)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > gap_minutes * 60)
    ).cast("int")
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_timestamp("ts")).alias("start_epoch"),
        F.max(F.unix_timestamp("ts")).alias("end_epoch"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def topk_users(t, k: int = 20) -> DataFrame:
    ev = t["events"]
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id"))
        .limit(k)
    )


def daily_type_counts(t) -> DataFrame:
    """Events per (day, type) — partition-pruning-shaped rollup (at
    scale the events table is date-partitioned and this reads only
    matching partitions)."""
    ev = t["events"]
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            # sum, not avg: a 2-decimal-cents sum rounds identically
            # across engines; an avg can land exactly on a rounding
            # boundary and flip the last digit per summation order
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def signup_purchase_funnel(t, days: int = 7) -> DataFrame:
    """Users whose first purchase followed their first signup within
    ``days`` → (user_id, signup_epoch, purchase_epoch). Two tiny
    pre-aggregations then a broadcastable equi-join on user_id."""
    ev = t["events"].select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("epoch")
    )
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("epoch").alias("signup_epoch"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("epoch").alias("p_epoch")
    )
    joined = purchases.join(signups, "user_id").where(
        (F.col("p_epoch") >= F.col("signup_epoch"))
        & (F.col("p_epoch") <= F.col("signup_epoch") + days * 86400)
    )
    return joined.groupBy("user_id", "signup_epoch").agg(
        F.min("p_epoch").alias("purchase_epoch")
    )


def weekly_cohorts(t) -> DataFrame:
    """Cohort analysis: users grouped by first-active week, counted at
    each week offset → (cohort_week, week_offset, n_users). The
    distinct (week, user) set and the per-user min share the user_id
    shuffle; rows are already unique per (user, week) so the final
    count needs no distinct."""
    ev = t["events"].select(
        (F.floor(F.unix_timestamp("ts") / 604800)).cast("bigint").alias("week"),
        "user_id",
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def props_stats(t) -> DataFrame:
    """Semi-structured payload analytics: extract the numeric ``k``
    field from the JSON ``props`` column and aggregate per event_type.
    JSON path extraction is a JVM-side expression (no UDF), so the
    scan + agg stays in whole-stage codegen; at scale, frequently-read
    JSON fields get promoted to real columns at ingest."""
    ev = t["events"]
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def weekly_retention(t) -> DataFrame:
    """Users active in week w who return in week w+1 → (week,
    n_retained). Distinct (week,user) first (partial-agg shuffle),
    then a self-join on user co-partitioned by the same key."""
    ev = t["events"].select(
        (F.floor(F.unix_timestamp("ts") / 604800)).cast("bigint").alias("week"),
        "user_id",
    ).distinct()
    nxt = ev.select((F.col("week") - 1).alias("week"), F.col("user_id"))
    return (
        ev.join(nxt, ["week", "user_id"])
        .groupBy("week")
        .agg(F.count("*").alias("n_retained"))
    )


def type_transitions(t) -> DataFrame:
    """Markov transition matrix over per-user event sequences →
    (prev_type, next_type, n, p) where p is the row-normalized
    transition probability.

    One shuffle on user_id orders each user's history (unique
    (epoch, event_id) tuple — ROWS-frame-safe per the repo invariant);
    the transition rollup then reduces bigram rows, and the
    per-prev_type normalizer is a tiny broadcast-size aggregate
    Catalyst folds into a second window-free join.
    """
    from pyspark.sql.window import Window

    by_user = Window.partitionBy("user_id").orderBy(
        F.unix_timestamp("ts"), "event_id"
    )
    bigrams = (
        t.select("user_id", "event_id", "ts", "event_type")
        .withColumn("next_type", F.lead("event_type").over(by_user))
        .where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("prev_type"), "next_type")
        .agg(F.count("*").alias("n"))
    )
    totals = bigrams.groupBy("prev_type").agg(F.sum("n").alias("_tot"))
    return (
        bigrams.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("_tot"), 6).alias("p"),
        )
    )


MAD_CONSISTENCY = 1.4826  # 1/Φ⁻¹(3/4): MAD → σ units under normality


def mad_outliers(t, k: float = 3.0) -> DataFrame:
    """Robust per-type outliers by median absolute deviation →
    (event_id, user_id, event_type, value, med, mad, score) for
    events with |value − median| > k·1.4826·MAD. The 1.4826
    normal-consistency constant (Iglewicz–Hoaglin; Leys et al.)
    rescales MAD to σ units so k=3 means "3 robust sigmas" — without
    it the same k fires at ≈2σ and flags ~17× more events than the
    moment-based twin (events_zscores) at its own |z|>3. MAD
    tolerates the heavy tails that wreck z-scores.

    Two tiny per-type aggregates (exact interpolated medians — the
    5-type groupBy collapses to a handful of rows) broadcast back
    against the big table; the big side is scanned twice but never
    shuffled on a wide key.
    """
    med = t.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    d = t.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = d.groupBy("event_type").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad")
    )
    scaled = F.lit(MAD_CONSISTENCY) * F.col("mad")
    return (
        d.join(F.broadcast(mad), "event_type")
        .where((F.col("mad") > 0) & (F.col("absdev") > k * scaled))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            # score in robust-sigma units (consistent with z-scores)
            F.round(F.col("absdev") / scaled, 6).alias("score"),
        )
    )


def user_activity_ranks(t) -> DataFrame:
    """Per-user activity rank features → (user_id, n_events,
    pct_rank, decile): percent_rank and ntile(10) over event count —
    the stratification key for activity-balanced train/eval splits.

    The window's ORDER BY (n_events, user_id) is a UNIQUE tuple, so
    ranks and tile boundaries are deterministic (the repo's ROWS-frame
    invariant); the window runs over the per-user rollup (|users|
    rows), not the raw table."""
    from pyspark.sql.window import Window

    counts = t.groupBy("user_id").agg(F.count("*").alias("n_events"))
    w = Window.orderBy("n_events", "user_id")
    return counts.select(
        "user_id",
        "n_events",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.ntile(10).over(w).alias("decile"),
    )


def seasonality_profile(t) -> DataFrame:
    """Hour-of-day × day-of-week activity profile → (dow, hour,
    n_events, sum_value, n_users). Calendar math is integer epoch
    arithmetic ((epoch//86400 + 4) % 7, Thursday anchor) rather than
    engine date functions, whose week-start conventions differ —
    portable by construction. Single scan, one rollup."""
    epoch = F.unix_timestamp("ts")
    return (
        t.groupBy(
            ((F.floor(epoch / 86400) + 4) % 7).cast("integer").alias("dow"),
            ((epoch % 86400) / 3600).cast("integer").alias("hour"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )


def ab_value_test(t) -> DataFrame:
    """Hash-split A/B readout on the value metric → one row (n_a,
    n_b, mean_a, mean_b, diff, t_stat): Welch two-sample t statistic
    between md5-parity user cohorts, computed at the USER level —
    the randomization unit. Observations are per-user value TOTALS
    (one per user), because event-level observations within a user
    are correlated: treating each event as independent shrinks the
    Welch denominator by ~√(events/user) and flags phantom
    significance (the unit-of-analysis error).

    The variant is the md5 parity of user_id (the portable
    hash-split the train/val splitter uses — deterministic, no
    assignment table). Per-user totals and their squares stay EXACT
    decimals (the 18×19-width square of nation_supplier_hhi), so the
    double formula downstream is bit-identical across engines."""
    from ..textops.tokenize import md5_hash32

    per_user = (
        t.select("user_id", F.col("value").cast("decimal(18,2)").alias("v"))
        .groupBy("user_id")
        .agg(F.sum("v").cast("decimal(18,2)").alias("vu"))
    )
    keyed = per_user.select(
        (md5_hash32(F.col("user_id").cast("string")) % 2).alias("variant"),
        F.col("vu").alias("v"),
        (
            F.col("vu").cast("decimal(18,2)")
            * F.col("vu").cast("decimal(19,2)")
        ).alias("v2"),
    )
    agg = keyed.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("v"))).alias("sa"),
        F.sum(F.when(F.col("variant") == 1, F.col("v"))).alias("sb"),
        F.sum(F.when(F.col("variant") == 0, F.col("v2"))).alias("sa2"),
        F.sum(F.when(F.col("variant") == 1, F.col("v2"))).alias("sb2"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    sa2, sb2 = F.col("sa2").cast("double"), F.col("sb2").cast("double")
    ma, mb = sa / na, sb / nb
    va = (sa2 - sa * sa / na) / (na - 1)
    vb = (sb2 - sb * sb / nb) / (nb - 1)
    return agg.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(mb - ma, 6).alias("diff"),
        F.round((mb - ma) / F.sqrt(va / na + vb / nb), 6).alias("t_stat"),
    )


def funnel_steps(t, steps=("signup", "click", "purchase"), within_secs: int = 604800) -> DataFrame:
    """K-step ordered funnel → (step, step_idx, n_users): users whose
    first qualifying event of each step falls at-or-after the previous
    step's and within ``within_secs`` of it.

    Each step is a per-user conditional-min rollup joined to the
    previous step's survivors — per-user tables only (the raw scan
    happens once per step type, pruned to that type at the parquet
    scan); user counts shrink monotonically down the funnel."""
    epochs = t.select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("epoch")
    )
    prev = (
        epochs.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("epoch").alias("t0"))
    )
    out = prev.agg(
        F.lit(steps[0]).alias("step"),
        F.lit(1).alias("step_idx"),
        F.count("*").cast("bigint").alias("n_users"),
    )
    for i, s in enumerate(steps[1:], start=2):
        ev = epochs.where(F.col("event_type") == s)
        nxt = (
            ev.join(prev, "user_id")
            .where(
                (F.col("epoch") >= F.col("t0"))
                & (F.col("epoch") <= F.col("t0") + within_secs)
            )
            .groupBy("user_id")
            .agg(F.min("epoch").alias("t0"))
        )
        out = out.unionByName(
            nxt.agg(
                F.lit(s).alias("step"),
                F.lit(i).alias("step_idx"),
                F.count("*").cast("bigint").alias("n_users"),
            )
        )
        prev = nxt
    return out


def value_equidepth_histogram(t, buckets: int = 10) -> DataFrame:
    """Equi-depth (equal-count) histogram of the value metric →
    (bucket, n, lo, hi): ntile over a UNIQUE (value, event_id)
    ordering, so bucket boundaries are deterministic even across tied
    values. The equi-depth shape is what a query optimizer or a
    drift monitor wants (equal-width histograms starve the tails)."""
    from pyspark.sql.window import Window

    w = Window.orderBy("value", "event_id")
    return (
        t.select("event_id", "value")
        .withColumn("bucket", F.ntile(buckets).over(w))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


def user_lifetime(t) -> DataFrame:
    """Per-user lifetime profile: first/last activity, span, volume.
    The feature a retention model or a data-retention audit starts
    from. One partial-agg shuffle on user_id; every column folds
    map-side, so shuffle volume is O(distinct users) regardless of
    event volume — unchanged at 100 TB."""
    ev = t["events"]
    ep = F.unix_timestamp("ts")
    day = (ep / 86400).cast("bigint")
    return (
        ev.select("user_id", "event_type", "value", ep.alias("ep"), day.alias("day"))
        .groupBy("user_id")
        .agg(
            F.min("ep").cast("bigint").alias("first_epoch"),
            F.max("ep").cast("bigint").alias("last_epoch"),
            (F.max("ep") - F.min("ep")).cast("bigint").alias("lifespan_secs"),
            F.count("*").alias("n_events"),
            F.count_distinct("day").alias("n_active_days"),
            F.count_distinct("event_type").alias("n_types"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def dau_wau(t) -> DataFrame:
    """Daily active users + trailing-7-day active users per day.

    Exact rolling distinct: dedupe to (day, user) pairs first (the
    big shrink — events → at most users×days rows), then each pair is
    replicated to the 7 target days it supports (bounded 7× explode,
    one shuffle on target day), counted distinct per day, and
    restricted to days that actually occur. No window over the
    corpus, no repeated scans; the classic scalable WAU plan."""
    ev = t["events"]
    day = ((F.unix_timestamp("ts") / 86400).cast("bigint") * 86400)
    du = ev.select(day.alias("day_epoch"), "user_id").distinct()
    dau = du.groupBy("day_epoch").agg(F.count("*").alias("dau"))
    contrib = du.select(
        F.explode(
            F.sequence(
                F.col("day_epoch"),
                F.col("day_epoch") + 6 * 86400,
                F.lit(86400),
            )
        ).alias("day_epoch"),
        "user_id",
    )
    wau = contrib.groupBy("day_epoch").agg(
        F.count_distinct("user_id").alias("wau")
    )
    return dau.join(wau, "day_epoch").select("day_epoch", "dau", "wau")


def sliding_windows(t, window_secs: int = 1800, slide_secs: int = 900) -> DataFrame:
    """Sliding-window counts (window = 2× slide): each event lands in
    exactly window/slide consecutive windows via a bounded explode —
    the batch twin of Spark's streaming `window(ts, w, s)` Expand
    plan, written with portable epoch arithmetic so the DuckDB oracle
    is bit-identical. One shuffle on (window_start, event_type) with
    map-side partials; replication factor is the constant w/s."""
    ev = t["events"]
    k = window_secs // slide_secs
    s0 = (F.unix_timestamp("ts") / slide_secs).cast("bigint") * slide_secs
    starts = F.sequence(
        s0 - (k - 1) * slide_secs, s0, F.lit(slide_secs)
    )
    return (
        ev.select(
            F.explode(starts).alias("window_start_epoch"),
            "event_type",
            "user_id",
            "value",
        )
        .groupBy("window_start_epoch", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def winsorize_stats(t, pct: int = 5) -> DataFrame:
    """Rank-based winsorization report per event_type: replace the
    lowest/highest ``pct``% of values (k = floor(n·pct/100) rows per
    tail) with the nearest surviving order statistic, and report the
    raw vs winsorized mean. Rank-based (not interpolated-quantile)
    clipping keeps every clipped value an actual 2-decimal data value,
    so both sums stay DECIMAL-exact and the means are deterministic
    double divisions — no order-dependent float summation.

    Plan: one shuffle on event_type for the rank window (5 groups;
    at 100 TB you'd compute approximate bounds with approx_percentile
    and clip in a scan — the sketch twin of this exact op), then a
    broadcast-back of the 5-row bounds table and one partial-agg
    rollup."""
    ev = t["events"].select(
        "event_id", "event_type", F.col("value").cast("decimal(12,2)").alias("val")
    )
    w = Window.partitionBy("event_type").orderBy("val", "event_id")
    ranked = ev.select(
        "event_type",
        "val",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    ).withColumn("k", F.expr(f"CAST((n * {pct}) DIV 100 AS BIGINT)"))
    bounds = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == F.col("k") + 1, F.col("val"))).alias("lo_val"),
        F.min(F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("val"))).alias(
            "hi_val"
        ),
    )
    clipped = ranked.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "val",
        "n",
        "k",
        "lo_val",
        "hi_val",
        F.when(F.col("rn") <= F.col("k"), F.col("lo_val"))
        .when(F.col("rn") > F.col("n") - F.col("k"), F.col("hi_val"))
        .otherwise(F.col("val"))
        .alias("wval"),
    )
    return clipped.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("k").cast("bigint").alias("k"),
        F.max("lo_val").cast("double").alias("lo_val"),
        F.max("hi_val").cast("double").alias("hi_val"),
        F.round(F.sum("val").cast("double") / F.max("n"), 6).alias("mean_raw"),
        F.round(F.sum("wval").cast("double") / F.max("n"), 6).alias(
            "mean_winsorized"
        ),
    )


def session_stats(t, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Corpus-level session distribution built ON TOP of
    ``sessionize`` — (n_sessions, n_single_event, avg_events,
    avg_duration_secs, max_duration_secs): the engagement rollup a
    product-analytics dashboard serves. The per-user windows of
    sessionize are the only big shuffle; this adds one 1-row global
    aggregate (all integer sums → deterministic double division)."""
    s = sessionize(t, gap_minutes=gap_minutes)
    dur = F.col("end_epoch") - F.col("start_epoch")
    return s.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("bigint")).alias("n_single_event"),
        F.round(F.sum("n_events") / F.count("*"), 6).alias("avg_events"),
        F.round(F.sum(dur) / F.count("*"), 6).alias("avg_duration_secs"),
        F.max(dur).cast("bigint").alias("max_duration_secs"),
    )


def daily_cusum(t) -> DataFrame:
    """CUSUM changepoint scan over the daily event-count series →
    (day, n_events, cusum, is_shift): cumulative sum of deviations
    from the overall daily mean, the standard drift/level-shift
    detector for pipeline-health monitoring (a data-source outage or
    ingest regression shows up as a sustained cusum run, not a
    single-day spike like the z-score op catches).

    Exactness: with D days and total N events, the running deviation
    sum after day i is  cumsum_i − i·N/D;  scaled by D it is the
    BIGINT  cumsum_i·D − i·N  — computed entirely in integer math and
    divided (one IEEE op) only for display, so cross-engine results
    are bit-identical. ``is_shift`` flags |cusum| > 2·mean.

    Scale: the raw scan collapses to a day-grain rollup first (one
    map-side-combinable shuffle); the ordered window then runs over
    D rows — a few thousand even at 100 TB — so the single-partition
    window is on the tiny rollup, never the raw events."""
    daily = (
        t["events"]
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    stats = daily.agg(
        F.sum("n_events").alias("_total"), F.count("*").alias("_days")
    )
    cum = daily.select(
        "day",
        "n_events",
        F.sum("n_events").over(w).alias("_cum"),
        F.row_number().over(Window.orderBy("day")).alias("_i"),
    ).crossJoin(F.broadcast(stats))
    scaled = (
        F.col("_cum") * F.col("_days") - F.col("_i") * F.col("_total")
    ).cast("bigint")
    return cum.select(
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(scaled / F.col("_days"), 4).alias("cusum"),
        (F.abs(scaled) > 2 * F.col("_total")).alias("is_shift"),
    )


def lateness_profile(t, bucket: int = 1024) -> DataFrame:
    """Watermark-choice profile → one row per candidate delay
    (delay_secs, n_late, late_share): how many events would arrive
    AFTER the watermark had already passed their timestamp, for
    candidate delays of 1 m / 10 m / 1 h / 6 h.

    Event-time disorder is measured against ARRIVAL order (event_id
    in the synthetic feed): an event is late for delay D when the
    running max event-time among earlier arrivals exceeds its own
    time by more than D — exactly the condition under which
    Structured Streaming's watermark (max event time − D) would drop
    it.

    The running max is a DISTRIBUTED two-level prefix scan, not one
    global window (which would serialize the whole feed through a
    single partition at 100 TB): per-bucket running maxes compute in
    parallel (window partitioned by event_id div bucket), the
    per-bucket rollup is tiny so ITS running max is a cheap ordered
    window, and each row combines the two with greatest() — the
    standard parallel prefix-aggregate decomposition. All epoch math
    is integer."""
    ev = t["events"].select(
        "event_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ep"),
        F.expr(f"event_id div {bucket}").alias("bkt"),
    )
    per_b = ev.groupBy("bkt").agg(F.max("ep").alias("bmax"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prior = per_b.select(
        "bkt", F.max("bmax").over(wb).alias("prior_max")
    )
    wi = (
        Window.partitionBy("bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    x = ev.join(F.broadcast(prior), "bkt").select(
        "ep",
        F.max("ep").over(wi).alias("in_max"),
        "prior_max",
    )
    late = x.where(
        F.col("in_max").isNotNull() | F.col("prior_max").isNotNull()
    ).select(
        (F.greatest("in_max", "prior_max") - F.col("ep")).alias("late_by")
    )
    delays = F.expr("stack(4, 60, 600, 3600, 21600) AS (delay_secs)")
    dtab = late.sparkSession.range(1).select(delays)
    return (
        late.crossJoin(F.broadcast(dtab))
        .groupBy("delay_secs")
        .agg(
            F.sum((F.col("late_by") > F.col("delay_secs")).cast("bigint"))
            .alias("n_late"),
            F.count("*").alias("_total"),
        )
        .select(
            F.col("delay_secs").cast("int").alias("delay_secs"),
            F.col("n_late").cast("bigint").alias("n_late"),
            F.round(F.col("n_late") / F.col("_total"), 6).alias("late_share"),
        )
    )


def session_paths(
    t, gap_minutes: int = SESSION_GAP_MINUTES, max_steps: int = 8, k: int = 20
) -> DataFrame:
    """Top-k user journeys → (path, n_sessions): the ordered
    event-type sequence of each gap session (first ``max_steps``
    steps, '>'-joined), ranked by frequency — the discovery query
    behind funnel design (you mine the real paths before you assert
    one in events_funnel_steps).

    Deterministic ordering via (epoch, event_id) — event_id is unique
    so path strings never depend on tie luck. Same per-user window
    shuffle as the sessionizer; the path rollup keys are short
    bounded strings (≤ max_steps types)."""
    ev = t["events"].select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").cast("bigint").alias("ep"),
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    prev = F.lag("ep").over(w)
    is_new = (
        prev.isNull() | ((F.col("ep") - prev) > gap_minutes * 60)
    ).cast("int")
    s = ev.withColumn("is_new", is_new).withColumn(
        "sid",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", "sid").orderBy("ep", "event_id")
    )
    r = s.withColumn("rn", rn).where(F.col("rn") <= max_steps)
    paths = r.groupBy("user_id", "sid").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(rn, event_type))), x -> x.event_type), '>')"
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(k)
    )


def ab_srm_check(t) -> DataFrame:
    """Sample-ratio-mismatch check for the md5-parity A/B split →
    ONE row (n_a, n_b, chi2, srm_suspect): the guardrail you run
    BEFORE reading the Welch t-test (events_ab_test) — an unbalanced
    split means assignment is broken and the experiment readout is
    invalid.

    For a 50/50 design, chi-square = (n_a − n_b)² / (n_a + n_b),
    computed from BIGINT counts with one display division;
    srm_suspect flags chi2 > 3.84 (the 5% critical value with 1 df).
    n_a/n_b count DISTINCT USERS — the randomization unit is the
    user (md5 parity of user_id), and published SRM (Kohavi et al.)
    counts units per variant: counting events would let one whale
    user's volume fire a false alarm on a perfectly balanced
    assignment, since the χ²(1) reference only applies to
    independent unit assignments. One scan, one user rollup."""
    from ..textops.tokenize import md5_hash32

    # the SAME cohort hash events_ab_test uses — an SRM check on a
    # different assignment would validate the wrong experiment
    parity = md5_hash32(F.col("user_id").cast("string")) % 2
    g = t["events"].select("user_id", parity.alias("grp")).distinct()
    agg = g.agg(
        F.sum((F.col("grp") == 0).cast("bigint")).alias("n_a"),
        F.sum((F.col("grp") == 1).cast("bigint")).alias("n_b"),
    )
    diff2 = (F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))
    chi2 = F.round(diff2 / (F.col("n_a") + F.col("n_b")), 6)
    return agg.select(
        "n_a",
        "n_b",
        chi2.alias("chi2"),
        (diff2 / (F.col("n_a") + F.col("n_b")) > 3.84).alias("srm_suspect"),
    )


def daily_dense(t) -> DataFrame:
    """Gap-filled daily counts → one row per (day, event_type) for
    EVERY day in the observed range, zero-filled where nothing
    happened — the densification step before charting or
    window-over-days math (a missing day silently breaks rolling
    averages and WoW ratios).

    The calendar spine is a sequence() over the min..max epoch-day
    span (driver-free, a few thousand rows at any corpus size)
    crossed with the distinct type set, then LEFT-joined with the
    real rollup — the fact table is scanned once; the spine join is
    broadcast."""
    ev = t["events"].select(
        F.expr("unix_timestamp(ts) div 86400").alias("day_num"),
        "event_type",
    )
    counts = ev.groupBy("day_num", "event_type").agg(
        F.count("*").alias("n")
    )
    span = ev.agg(
        F.min("day_num").alias("_lo"), F.max("day_num").alias("_hi")
    )
    days = span.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("day_num")
    )
    types = ev.select("event_type").distinct()
    spine = days.crossJoin(types)
    return (
        spine.join(counts, ["day_num", "event_type"], "left")
        .select(
            F.date_format(
                F.to_timestamp(F.col("day_num") * 86400), "yyyy-MM-dd"
            ).alias("day"),
            "event_type",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def daily_type_pivot(t) -> DataFrame:
    """Wide daily matrix via PIVOT → (day, n_click, n_purchase,
    n_signup, n_view): the reporting shape BI tools consume. The
    pivot column set is FIXED (never inferred — at 100 TB a
    distinct-scan just to learn column names is a wasted pass, and
    an unbounded type domain would explode the schema)."""
    ev = t["events"].select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    )
    return (
        ev.groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[
                F.coalesce(F.col(c), F.lit(0))
                .cast("bigint")
                .alias(f"n_{c}")
                for c in EVENT_TYPES
            ],
        )
    )


def new_vs_returning(t) -> DataFrame:
    """Daily acquisition split → (day, n_new, n_returning,
    n_active): users whose FIRST-ever event falls on the day vs
    users seen before — the product-health counterpart of the cohort
    matrix. Two rollups share the user_id shuffle (per-user first
    day, then per-(day,user) distinct activity); day math is integer
    epoch-days rendered once at the end."""
    ev = t["events"].select(
        "user_id",
        F.expr("unix_timestamp(ts) div 86400").alias("day_num"),
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("day_num").alias("first_day"))
    j = ev.join(first, "user_id")
    return (
        j.groupBy("day_num")
        .agg(
            F.sum((F.col("day_num") == F.col("first_day")).cast("bigint"))
            .alias("n_new"),
            F.sum((F.col("day_num") != F.col("first_day")).cast("bigint"))
            .alias("n_returning"),
            F.count("*").cast("bigint").alias("n_active"),
        )
        .select(
            F.date_format(
                F.to_timestamp(F.col("day_num") * 86400), "yyyy-MM-dd"
            ).alias("day"),
            "n_new",
            "n_returning",
            "n_active",
        )
    )


def sessionize_native(t, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Gap sessions via Spark's NATIVE ``session_window`` →
    (user_id, start_epoch, n_events, sum_value): the built-in
    operator the window-function sessionizer (``sessionize``) hand-
    rolls — in batch it plans as one aggregation over merging session
    windows, and the SAME expression drives streaming session aggs
    with watermark-bounded state.

    Boundary semantics differ from the lag rule by one instant: a
    pair exactly ``gap`` apart SPLITS here (merge condition is
    diff < gap) but merges in the lag-based sessionizer (split on
    diff > gap) — the oracle mirrors this operator's strict rule, and
    both operators stay registered because real pipelines must pick
    one convention and know why."""
    ev = t["events"].select("user_id", "ts", "value")
    sw = F.session_window("ts", f"{gap_minutes} minutes")
    return (
        ev.groupBy("user_id", sw.alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp("w.start").cast("bigint").alias("start_epoch"),
            "n_events",
            "sum_value",
        )
    )


def peak_concurrency(t, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Peak concurrent sessions per day → (day, peak_concurrent,
    n_boundaries): the capacity-planning readout (how many users are
    mid-session at the busiest instant of each day), computed with
    the classic interval sweep — +1 at each session start, −1 after
    each end, running max of the prefix sum.

    Sessions come from the batch sessionizer; the sweep's running sum
    is windowed PER DAY so the ordered scan parallelizes across days
    instead of serializing the whole timeline — and each day's sum
    starts from the CARRY of all prior days' net deltas (sessions
    still open at midnight), computed with one tiny day-grain window;
    without the carry a midnight-spanning session would understate
    the next day's peak (the same two-level decomposition as the
    lateness profiler). Boundary ties break deterministically
    (delta DESC: starts before ends at the same second, user_id)."""
    s = sessionize(t, gap_minutes=gap_minutes)
    starts = s.select(
        F.col("start_epoch").alias("ep"),
        F.lit(1).alias("delta"),
        "user_id",
    )
    ends = s.select(
        (F.col("end_epoch") + 1).alias("ep"),
        F.lit(-1).alias("delta"),
        "user_id",
    )
    b = starts.unionByName(ends).withColumn(
        "day_num", F.expr("ep div 86400")
    )
    w = (
        Window.partitionBy("day_num")
        .orderBy("ep", F.col("delta").desc(), "user_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = b.withColumn("running", F.sum("delta").over(w))
    per_day = swept.groupBy("day_num").agg(
        F.max("running").alias("max_run"),
        F.sum("delta").alias("day_net"),
        F.count("*").cast("bigint").alias("n_boundaries"),
    )
    # carry = sessions still open entering the day: prefix sum of
    # PRIOR days' net deltas over the tiny day-grain rollup
    wd = Window.orderBy("day_num").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return per_day.select(
        F.date_format(
            F.to_timestamp(F.col("day_num") * 86400), "yyyy-MM-dd"
        ).alias("day"),
        (
            F.coalesce(F.sum("day_net").over(wd), F.lit(0))
            + F.col("max_run")
        )
        .cast("bigint")
        .alias("peak_concurrent"),
        "n_boundaries",
    )


def sample_estimates(t, pct: int = 10) -> DataFrame:
    """Approximate query processing readout: per-event-type count and
    value-sum ESTIMATED from a deterministic ``pct``% hash sample,
    next to the exact figures → (event_type, n_sample, est_events,
    exact_events, est_value_sum, exact_value_sum).

    The sample predicate (md5 bucket < pct) evaluates inside the scan
    stage (codegen, no extra pass; with the corpus ingested bucketed
    on this hash the filter becomes partition pruning and reads only
    pct% of files) — the estimate path never shuffles more than the
    tiny per-type rollup. The exact
    columns exist here so the gate (and the reader) can see the error
    the sample trades away. Sums are DECIMAL-exact, scale-up is
    integer multiplication — bit-identical cross-engine.
    """
    from ..textops.tokenize import md5_hash32

    events = t["events"]
    val = F.col("value").cast("decimal(18,2)")
    bucket = md5_hash32(F.col("event_id").cast("string")) % 100
    sample = (
        events.where(bucket < pct)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_sample"),
            F.sum(val).alias("sample_sum"),
        )
    )
    exact = events.groupBy("event_type").agg(
        F.count("*").alias("exact_events"),
        F.sum(val).alias("exact_value_sum"),
    )
    scale = 100 // pct
    return (
        exact.join(sample, "event_type", "left")
        .select(
            "event_type",
            F.coalesce("n_sample", F.lit(0)).cast("bigint").alias("n_sample"),
            (F.coalesce("n_sample", F.lit(0)) * scale)
            .cast("bigint")
            .alias("est_events"),
            F.col("exact_events").cast("bigint").alias("exact_events"),
            (
                F.coalesce(F.col("sample_sum"), F.lit(0).cast("decimal(18,2)"))
                * scale
            )
            .cast("decimal(28,2)")
            .alias("est_value_sum"),
            F.col("exact_value_sum").cast("decimal(28,2)").alias(
                "exact_value_sum"
            ),
        )
    )


def conversion_windows(t, windows_days=(1, 3, 7)) -> DataFrame:
    """Attribution-window sensitivity sweep → (window_days,
    n_signups, n_converted, conversion_rate): signup→purchase
    conversion under several candidate windows, ALL from one pass —
    the sweep that justifies the 7-day choice hard-coded in
    events_funnel (a conversion count that keeps climbing with the
    window means attribution is leaking organic purchases).

    Per-user first-signup and first-purchase-after-signup come from
    one user_id rollup (two conditional MINs joined on the same
    shuffle key); each window is then a COUNT over the same tiny
    per-user frame — adding a candidate window adds one column, not
    one scan."""
    ev = t["events"].select("user_id", "event_type", "ts")
    su = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    pu = ev.where(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.sort_array(F.collect_list("ts")).alias("purchases")
    )
    j = su.join(pu, "user_id", "left").select(
        "user_id",
        "signup_ts",
        # first purchase at-or-after signup (array is sorted; filter
        # + element_at keeps it one pass, no re-shuffle)
        F.element_at(
            F.filter(
                F.coalesce("purchases", F.array().cast("array<timestamp>")),
                lambda x: x >= F.col("signup_ts"),
            ),
            1,
        ).alias("first_purchase"),
    )
    delta = F.unix_timestamp("first_purchase") - F.unix_timestamp("signup_ts")
    aggs = []
    for w in windows_days:
        aggs.append(
            F.sum(
                F.when(
                    F.col("first_purchase").isNotNull()
                    & (delta <= w * 86400),
                    1,
                ).otherwise(0)
            ).alias(f"conv_{w}")
        )
    one = j.agg(F.count("*").alias("n_signups"), *aggs)
    parts = [
        one.select(
            F.lit(w).cast("int").alias("window_days"),
            F.col("n_signups").cast("bigint").alias("n_signups"),
            F.col(f"conv_{w}").cast("bigint").alias("n_converted"),
            F.round(
                F.col(f"conv_{w}").cast("double")
                / F.col("n_signups").cast("double"),
                6,
            ).alias("conversion_rate"),
        )
        for w in windows_days
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def type_audience_overlap(t) -> DataFrame:
    """Audience-overlap matrix → (type_a, type_b, n_a, n_b, n_both,
    jaccard): which event types share users — the audience-overlap
    readout behind "do purchasers also click" segmentation, computed
    as a self-join of the distinct (type, user) set on user_id.

    The distinct set and the pair join share one user_id shuffle;
    type count is tiny (T² pairs ≤ 25 rows out). Jaccard is one
    double division of exact BIGINT counts."""
    tu = t["events"].select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count("*").alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    both = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        both.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_both").cast("bigint").alias("n_both"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def bounce_rate(t, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Daily bounce rate → (day, n_sessions, n_bounces, bounce_rate):
    share of sessions with exactly one event, per session-start day —
    the engagement-health staple computed over the SAME sessionizer
    the gate already verifies (sessionize), so the metric and the
    session definition cannot drift apart. One extra tiny rollup on
    the per-session frame."""
    s = sessionize(t, gap_minutes)
    day = F.date_format(F.timestamp_seconds(F.col("start_epoch")), "yyyy-MM-dd")
    return (
        s.groupBy(day.alias("day"))
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
                "n_bounces"
            ),
        )
        .select(
            "day",
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
            F.col("n_bounces").cast("bigint").alias("n_bounces"),
            F.round(
                F.col("n_bounces").cast("double")
                / F.col("n_sessions").cast("double"),
                6,
            ).alias("bounce_rate"),
        )
    )


def user_activity_histogram(t) -> DataFrame:
    """Log2-bucketed events-per-user distribution → (bucket,
    n_users, min_events, max_events): the heavy-tail readout that
    sizes sessionization skew and per-user state (the user-side twin
    of kg_degree_histogram). Integer bucket keys — hash-exact."""
    per_user = t["events"].groupBy("user_id").agg(
        F.count("*").alias("n_events")
    )
    bucket = F.floor(F.log2("n_events")).cast("bigint")
    return (
        per_user.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("n_events").cast("bigint").alias("min_events"),
            F.max("n_events").cast("bigint").alias("max_events"),
        )
    )


def time_to_convert(
    t,
    from_type: str = "signup",
    to_type: str = "purchase",
    within_secs: int = 2592000,
) -> DataFrame:
    """Conversion-delay distribution → (delay_bucket_s, n_users,
    min_delay_s, max_delay_s): log2-bucketed seconds between each
    user's FIRST ``from_type`` event and their first ``to_type`` event
    at-or-after it within ``within_secs`` — the "how long does the
    funnel take" readout next to events_funnel's "how many convert"
    (same first-touch attribution rule). Same-second conversions land
    in bucket 0 (log2(0) is undefined), mirroring gap_histogram.

    Scale: two per-user conditional-min rollups + one histogram over
    per-user rows; the raw scan is pruned to the two event types at
    the parquet scan, and the bucket key space is ~40 values at any
    scale."""
    ev = t["events"].select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("epoch")
    )
    first_from = (
        ev.where(F.col("event_type") == from_type)
        .groupBy("user_id")
        .agg(F.min("epoch").alias("t0"))
    )
    delays = (
        ev.where(F.col("event_type") == to_type)
        .join(first_from, "user_id")
        .where(
            (F.col("epoch") >= F.col("t0"))
            & (F.col("epoch") <= F.col("t0") + within_secs)
        )
        .groupBy("user_id")
        .agg((F.min("epoch") - F.min("t0")).alias("delay_s"))
    )
    bucket = F.when(F.col("delay_s") == 0, F.lit(0).cast("bigint")).otherwise(
        F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), "
            "CAST(floor(log2(delay_s)) AS INT)) AS BIGINT)"
        )
    )
    return (
        delays.groupBy(bucket.alias("delay_bucket_s"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("delay_s").cast("bigint").alias("min_delay_s"),
            F.max("delay_s").cast("bigint").alias("max_delay_s"),
        )
    )


def daily_ewma(t, alpha: float = 0.25) -> DataFrame:
    """EWMA anomaly scan per event type → (event_type, day, n_events,
    ewma, residual): exponentially-weighted moving average of the
    daily count series (s₁ = x₁, sₜ = sₜ₋₁ + α·(xₜ − sₜ₋₁)) with the
    one-step-ahead residual xₜ − sₜ₋₁ — the adaptive-baseline
    complement to daily_cusum (which detects sustained shifts; this
    scores each day against the recent past). α = 0.25 is exactly
    representable in binary, and every fold runs over the
    chronologically-sorted prefix, so the IEEE sequence is identical
    to the oracle's list_reduce — bit-exact cross-engine.

    Scale: the raw scan collapses to a (type, day) rollup first; the
    per-type series (a few thousand days at most) folds IN-ROW —
    O(T²) on a tiny T, zero extra shuffle, no global window."""
    daily = (
        t["events"]
        .groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(F.count("*").alias("n"))
    )
    per = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "n"))).alias("xs")
    )

    def build(xs):
        nsd = F.transform(xs, lambda s: s["n"].cast("double"))

        def fold_to(tpos):
            # s over prefix 1..tpos: init = x₁, fold x₂..xₜ
            return F.aggregate(
                F.slice(nsd, 2, tpos - 1),
                F.element_at(nsd, 1),
                lambda a, x: a + F.lit(alpha) * (x - a),
            )

        def row(tpos):
            x = F.element_at(xs, tpos)
            return F.struct(
                x["day"].alias("day"),
                x["n"].cast("bigint").alias("n_events"),
                F.round(fold_to(tpos), 4).alias("ewma"),
                F.when(tpos == 1, F.lit(None).cast("double"))
                .otherwise(
                    F.round(
                        F.element_at(nsd, tpos) - fold_to(tpos - F.lit(1)), 4
                    )
                )
                .alias("residual"),
            )

        return F.transform(F.sequence(F.lit(1), F.size(xs)), row)

    # bind xs as a lambda variable (single-element transform) so the
    # sorted series is evaluated once per row, not once per fold —
    # the same projection-collapse guard as winnowing_fingerprints
    rows = per.select(
        "event_type", F.explode(F.transform(F.array("xs"), build)[0]).alias("r")
    )
    return rows.select(
        "event_type",
        F.col("r.day").alias("day"),
        F.col("r.n_events").alias("n_events"),
        F.col("r.ewma").alias("ewma"),
        F.col("r.residual").alias("residual"),
    )


def orders_backlog(t) -> DataFrame:
    """Open-order backlog sweep → (day, n_opened, n_closed, backlog):
    how many orders are open (placed but not fully shipped) on each
    calendar day an order event occurs — the operational twin of
    events_peak_concurrency's ±1 interval sweep, over order
    lifespans (o_orderdate .. max lineitem shipdate).

    Scale: per-order close dates are one orderkey rollup; ±1 deltas
    aggregate to day grain (map-side combined) BEFORE the ordered
    prefix sum, so the single-partition window runs over a few
    thousand calendar days at any SF — never over raw orders."""
    closes = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.max("l_shipdate").alias("close_date"))
    )
    spans = t["orders"].select("o_orderkey", "o_orderdate").join(
        closes, "o_orderkey"
    )
    deltas = spans.select(
        F.to_date("o_orderdate").alias("day"), F.lit(1).alias("d")
    ).unionByName(
        # closed orders leave the backlog the day AFTER the last ship
        spans.select(
            F.date_add(F.to_date("close_date"), 1).alias("day"),
            F.lit(-1).alias("d"),
        )
    )
    day = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("n_opened"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0)).alias("n_closed"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_opened").cast("bigint").alias("n_opened"),
        F.col("n_closed").cast("bigint").alias("n_closed"),
        F.sum(F.col("n_opened") - F.col("n_closed"))
        .over(w)
        .cast("bigint")
        .alias("backlog"),
    )


def user_features(t) -> DataFrame:
    """Per-user behavioral feature vector → (user_id, n_events,
    n_active_days, n_click, n_view, n_purchase, n_signup, n_error,
    total_value, first_day, last_day): the feature-store layer of an
    events pipeline — one row per user, ready to join as ML features
    or feed the KNN/quantile ops. Typed counts use a FIXED event-type
    set (schema-by-contract, never schema-by-scan — the PIVOT
    discipline of events_type_pivot).

    Scale: ONE user_id shuffle computes every feature (conditional
    aggregation, map-side combined); adding a feature adds a column,
    not a pass. total_value is DECIMAL-exact before the final
    rendering round."""
    ev = t["events"].select(
        "user_id",
        "event_type",
        F.to_date("ts").alias("d"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    counts = [
        # eqNullSafe: a NULL event_type counts 0 in every typed
        # bucket (the oracle's CASE ... ELSE 0), not NULL-skipped
        F.sum(F.col("event_type").eqNullSafe(et).cast("bigint"))
        .cast("bigint")
        .alias(f"n_{et}")
        for et in ("click", "view", "purchase", "signup", "error")
    ]
    return ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count_distinct("d").cast("bigint").alias("n_active_days"),
        *counts,
        F.round(F.sum("v").cast("double"), 4).alias("total_value"),
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias("last_day"),
    )


def user_type_entropy(events: DataFrame) -> DataFrame:
    """Per-user event-type entropy → (user_id, n_events, n_types,
    h_millibits, entropy_bits): Shannon entropy of the user's
    event-type distribution — the behavioral-diversity axis of the
    automation screen (single-action scripts have H=0; organic users
    spread mass; cf. the entropy features in session-quality
    scoring). Complement of the timing-based bot score.

    Same millibit discipline as textops.quality.lm_score: per-type
    information round(1000·log2(n_t/n)) is quantized to an integer
    BEFORE the Σ n_t·mb_t summation, so the per-user total is exact
    BIGINT math in any engine; one division at the end. Two tiny
    rollups on (user, type) then user — map-side combinable."""
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("n_t")
    )
    per_user = per_type.groupBy("user_id").agg(
        F.sum("n_t").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_types"),
    )
    scored = per_type.join(per_user, "user_id").select(
        "user_id",
        "n",
        "n_types",
        "n_t",
        F.round(F.lit(1000.0) * F.log2(F.col("n_t") / F.col("n")), 0)
        .cast("bigint")
        .alias("mb"),
    )
    agg = scored.groupBy("user_id").agg(
        F.first("n").alias("n_events"),
        F.first("n_types").alias("n_types"),
        (-F.sum(F.col("n_t") * F.col("mb"))).cast("bigint").alias("h_millibits"),
    )
    return agg.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        "n_types",
        "h_millibits",
        F.round(
            F.col("h_millibits") / (F.lit(1000.0) * F.col("n_events")), 6
        ).alias("entropy_bits"),
    )


def user_hll_registers(events: DataFrame, p: int = 8) -> DataFrame:
    """Deterministic per-day HyperLogLog register table →
    (day, bucket, max_rho): the distinct-users sketch CONTENT as an
    oracle-exact surface. Spark's approx_count_distinct
    (events_approx_users) is engine-internal and rows-only by
    necessity; this twin builds the registers from the portable
    md5-60 hash (bucket = h mod 2^p, rho = leading-zero rank of the
    remaining 60-p bits via the binary-string length — pure integer
    math both engines), so the sketch that a 100 TB pipeline would
    persist and MERGE (max per bucket, the same OR/max-merge family
    as the Bloom and CMS twins) hash-matches DuckDB row-for-row.
    Estimation from the registers is client-side arithmetic; accuracy
    and mergeability are pinned in tests/test_analytics.py.

    Scale shape: one narrow projection then one map-side-combined
    max-rollup on (day, bucket) — ≤ days·2^p output rows; the
    register table for a year at p=8 is ~93k rows regardless of
    event volume."""
    from ..textops.tokenize import md5_hash60

    m = 1 << p
    d = events.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        md5_hash60(F.col("user_id").cast("string")).alias("_h"),
    ).select(
        "day",
        F.expr(f"CAST(_h % {m} AS INT)").alias("bucket"),
        F.expr(f"_h div {m}").alias("_w"),
    )
    rho = F.when(
        F.col("_w") > 0,
        F.lit(61 - p) - F.length(F.bin(F.col("_w"))),
    ).otherwise(F.lit(61 - p))
    return d.groupBy("day", "bucket").agg(
        F.max(rho).cast("int").alias("max_rho")
    )
