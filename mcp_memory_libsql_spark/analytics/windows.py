"""Window-function analytics: rolling aggregates, running totals,
per-key ranking and gap analysis — the per-entity sequential
statistics an event pipeline computes without ever collecting a
user's history to one machine.

All four ops share one physical shape: a single shuffle on the
partition key (user_id / partkey) followed by an in-partition sort —
the plan a 1000-executor cluster wants, since each key's history is
processed where it lands. Per-user event counts are bounded (≤ a few
thousand), so no partition outgrows memory; a pathological hot key
would be handled by AQE skew splitting on the preceding exchange.

Cross-engine determinism contract (same rules as analytics/tpch.py):
- money sums go through DECIMAL(12,2) (events.value is 2-decimal);
- ROWS frames always order by a UNIQUE key tuple (epoch, event_id) —
  a RANGE/peer frame or a tied ROWS order would make the result
  depend on engine-internal tie order;
- the trailing-hour frame is a RANGE frame, which is tie-safe by
  construction (peers contribute as a set, order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_VAL = "CAST(value AS DECIMAL(12,2))"


def _ev(t) -> DataFrame:
    return t["events"].select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_timestamp("ts").alias("epoch"),
    )


def rolling_hour(t) -> DataFrame:
    """Per event: count and value-sum of the SAME USER's events in
    the trailing hour (inclusive range frame on epoch seconds)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch")
        .rangeBetween(-3600, 0)
    )
    return _ev(t).select(
        "event_id",
        "user_id",
        "epoch",
        F.count("*").over(w).alias("roll_cnt"),
        F.expr(
            f"CAST(ROUND(SUM({_VAL}) OVER (PARTITION BY user_id ORDER BY epoch"
            f" RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)"
        ).alias("roll_sum"),
    )


def cumulative_value(t) -> DataFrame:
    """Per-user running value total and event ordinal, ordered by the
    unique (epoch, event_id) tuple with an explicit ROWS frame (the
    frame lives in the SQL expression below — the decimal-exact SUM
    needs the _VAL cast string)."""
    return _ev(t).select(
        "event_id",
        "user_id",
        "epoch",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("epoch", "event_id"))
        .alias("ordinal"),
        F.expr(
            f"CAST(ROUND(SUM({_VAL}) OVER (PARTITION BY user_id"
            f" ORDER BY epoch, event_id"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)"
            f" AS DOUBLE)"
        ).alias("running_value"),
    )


def event_gaps(t) -> DataFrame:
    """Seconds since the same user's previous event (NULL-free: first
    events are dropped so the gate schema stays bigint)."""
    w = Window.partitionBy("user_id").orderBy("epoch", "event_id")
    return (
        _ev(t)
        .select(
            "event_id",
            "user_id",
            "epoch",
            F.lag("epoch").over(w).alias("_prev"),
        )
        .where(F.col("_prev").isNotNull())
        .select(
            "event_id",
            "user_id",
            "epoch",
            (F.col("epoch") - F.col("_prev")).alias("gap_s"),
        )
    )


def top_suppliers_per_part(t, k: int = 3) -> DataFrame:
    """Top-k suppliers per part by shipped revenue — the grouped
    top-N reporting shape. One (part,supp) rollup shuffle (exact
    decimal revenue), then rank within part; revenue ties break on
    suppkey so top-k is deterministic."""
    from .tpch import _REV

    rev = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.expr(f"SUM({_REV})").alias("_rev"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("_rev").desc(), F.col("l_suppkey")
    )
    return (
        rev.select(
            "l_partkey",
            "l_suppkey",
            F.row_number().over(w).alias("rnk"),
            F.expr("CAST(ROUND(_rev, 2) AS DOUBLE)").alias("revenue"),
        )
        .where(F.col("rnk") <= k)
    )


def rollup_day_type(t) -> DataFrame:
    """GROUP BY ROLLUP(day, event_type) — per-(day,type) cells plus
    day subtotals plus a grand total in ONE aggregation pass
    (Catalyst expands the grouping sets map-side; still a single
    shuffle). Money sums exact-decimal as everywhere."""
    ev = t["events"].select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        "value",
    )
    return ev.rollup("day", "event_type").agg(
        F.count("*").alias("n_events"),
        F.expr(f"CAST(ROUND(SUM({_VAL}), 2) AS DOUBLE)").alias("sum_value"),
    )


def value_percentiles(t) -> DataFrame:
    """Exact interpolated p50/p90 of value per event type. Exact
    percentile needs the group's values together — one shuffle on
    event_type (5 groups; at 100 TB you'd reach for approx_percentile
    and accept the sketch error; this is the exact twin). Results
    round to 4: interpolation fractions here are ≤1-decimal and
    values 2-decimal, so true quantiles are ≤3-decimal — no rounding
    boundary exists for either engine to straddle."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.expr("CAST(ROUND(percentile(value, 0.5), 4) AS DOUBLE)").alias(
                "p50"
            ),
            F.expr("CAST(ROUND(percentile(value, 0.9), 4) AS DOUBLE)").alias(
                "p90"
            ),
        )
    )


def approx_user_counts(t, rsd: float = 0.02) -> DataFrame:
    """Per-type distinct users: HyperLogLog++ estimate next to the
    exact count. At 100 TB the exact count_distinct is a full shuffle
    of every (type, user) pair; the HLL sketch is a fixed-size
    mergeable state per partition — THE approximate op a large
    pipeline actually runs. Rows-only gate (sketch estimates are
    engine-specific); tests/test_analytics.py bounds the relative
    error at 3·rsd."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("n_users_approx"),
            F.count_distinct("user_id").alias("n_users_exact"),
        )
    )


def value_outliers(t, z_threshold: float = 3.0) -> DataFrame:
    """Events whose value is a |z| > threshold outlier within its
    event type. The moments come from exact DECIMAL sums (sum, sum of
    squares, count), so mean and variance are exact rationals; the
    only floating steps are one sqrt and one division — both IEEE
    correctly-rounded, hence identical cross-engine. Two passes over
    one shuffle: per-type moments (tiny) broadcast back into the
    scan."""
    from pyspark.sql.functions import broadcast

    ev = t["events"].select(
        "event_id", "event_type", F.expr(f"{_VAL}").alias("val")
    )
    stats = ev.groupBy(F.col("event_type").alias("_et")).agg(
        F.expr("SUM(val)").alias("_s"),
        F.expr("SUM(val * val)").alias("_s2"),
        F.count("*").alias("_n"),
    )
    # var = (n*s2 - s^2) / n^2, exact decimal until the final divide
    z = (
        "(CAST(val AS DOUBLE) - CAST(_s AS DOUBLE) / _n)"
        " / sqrt((CAST(_s2 AS DOUBLE) * _n - CAST(_s AS DOUBLE) * CAST(_s AS DOUBLE)) / (CAST(_n AS DOUBLE) * _n))"
    )
    return (
        ev.join(broadcast(stats), F.col("event_type") == F.col("_et"))
        # filter on the EXACT z, not the display-rounded column — a
        # true |z| in (3, 3.00005] would round to 3.0000 and be
        # silently dropped by a rounded-value filter
        .where(F.expr(f"abs({z}) > {z_threshold}"))
        .select(
            "event_id",
            "event_type",
            F.expr("CAST(val AS DOUBLE)").alias("value"),
            F.expr(f"CAST(ROUND({z}, 4) AS DOUBLE)").alias("z"),
        )
    )


def approx_value_percentiles(t, accuracy: int = 10000) -> DataFrame:
    """Sketch twin of ``value_percentiles``: approx_percentile's
    mergeable KLL-style digest replaces the exact per-group sort —
    fixed memory per partition, one partial-agg shuffle, the shape
    that survives a 100 TB group. Rows-only gate (sketch outputs are
    engine-specific); tests bound the error against the exact op."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.expr(
                f"CAST(ROUND(approx_percentile(value, 0.5, {accuracy}), 4)"
                " AS DOUBLE)"
            ).alias("p50_approx"),
            F.expr(
                f"CAST(ROUND(approx_percentile(value, 0.9, {accuracy}), 4)"
                " AS DOUBLE)"
            ).alias("p90_approx"),
        )
    )


def gap_histogram(t) -> DataFrame:
    """Inter-arrival gap distribution → (gap_bucket, n_gaps,
    n_zero): log2-bucketed per-user gap histogram (plus the
    same-second count separately, since log2(0) is undefined) — the
    corpus view of ``event_gaps`` that picks sessionization gaps and
    watermark delays from data instead of folklore. One rollup over
    the already-windowed gap stream; the bucket key space is ~40
    values at any scale."""
    g = event_gaps(t)
    # groupBy (not a global agg): no phantom zero-count row when the
    # corpus has no same-second gaps — every bucket is present only
    # if nonzero, like the positive buckets
    zero = (
        g.where(F.col("gap_s") == 0)
        .groupBy(F.lit(0).cast("bigint").alias("gap_bucket"))
        .agg(F.count("*").cast("bigint").alias("n_gaps"))
        .withColumn("is_zero", F.lit(True))
    )
    pos = (
        g.where(F.col("gap_s") > 0)
        .groupBy(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), "
                "CAST(floor(log2(gap_s)) AS INT)) AS BIGINT)"
            ).alias("gap_bucket")
        )
        .agg(F.count("*").cast("bigint").alias("n_gaps"))
        .withColumn("is_zero", F.lit(False))
    )
    return zero.unionByName(pos)


def bot_scores(t) -> DataFrame:
    """Gap-regularity bot detector → (user_id, n_gaps, total_gap_s,
    cv, is_regular): per-user coefficient of variation of inter-event
    gaps. Scripted traffic fires on a timer (cv → 0); humans are
    bursty (cv ≳ 1) — the first-pass automation screen a training-
    data pipeline runs before trusting behavioral events (cf. the
    periodicity features in classic click-fraud detection).

    Determinism: gaps are exact BIGINT seconds; per-user Σgap and
    Σgap² are integer sums (the square lifted to DECIMAL(38,0) —
    n·gap² can pass 2⁶³); the only floats are one fixed-shape
    mean/variance/сv expression evaluated from those exact integers
    (identical IEEE rounding both engines), variance clamped at 0
    against cancellation. Users need ≥ 2 gaps; zero-mean users (all
    events same second) get NULL cv — mirrored."""
    gaps = event_gaps(t)
    agg = gaps.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.sum("gap_s").cast("bigint").alias("total_gap_s"),
        F.sum(
            (F.col("gap_s").cast("decimal(19,0)") * F.col("gap_s"))
        ).cast("decimal(38,0)").alias("_ss"),
    ).where(F.col("n_gaps") >= 2)
    mean = F.col("total_gap_s") / F.col("n_gaps")
    var = F.greatest(
        F.col("_ss").cast("double") / F.col("n_gaps") - mean * mean,
        F.lit(0.0),
    )
    cv = F.when(
        F.col("total_gap_s") > 0, F.round(F.sqrt(var) / mean, 6)
    )
    return agg.select(
        "user_id",
        "n_gaps",
        "total_gap_s",
        cv.alias("cv"),
        (cv <= 0.1).alias("is_regular"),
    )
