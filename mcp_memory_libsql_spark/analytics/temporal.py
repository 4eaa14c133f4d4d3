"""Temporal operators Spark's DataFrame API lacks as primitives —
as-of join, range (interval) join, hypertable-style rollup reuse —
each re-expressed as compositions of built-in ops that keep the
big side to ONE shuffle and never materialize a cross product.

These are classic time-series-engine operators (kdb+ ``aj``,
TimescaleDB continuous aggregates, DuckDB ``ASOF JOIN``); the gated
instances run attribution analytics over the ``events`` table.

Scale notes:
- **As-of join** (union + ordered window): tag both sides, union,
  one shuffle on (user_id), per-partition sort, ``last(payload,
  ignorenulls)`` carries the most recent left-side row forward. No
  per-row probe, no range explosion — the sort-merge formulation an
  as-of join compiles to in engines that have it natively. State is
  one payload struct per partition scan, so it survives any key
  cardinality.
- **Range join** (bucket + replicate): equi-join on
  (user_id, time_bucket) with the PROBE side replicated to the 2
  adjacent buckets, then the exact interval predicate filters. The
  cross product is bounded per (user, bucket) — the standard
  interval-join binning; bucket width = window width keeps the
  replication factor at exactly 2.
- **Hypertable rollup**: aggregate the raw table ONCE at the finest
  granularity, then derive each coarser level from the next finer
  level's partials (sum-of-sums/sum-of-counts). The raw table is
  scanned once; coarser levels shuffle only pre-aggregated rows —
  TimescaleDB's continuous-aggregate refresh expressed as a lazy
  plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_attribution(
    events: DataFrame,
    right_type: str = "purchase",
    left_type: str = "click",
) -> DataFrame:
    """For every ``right_type`` event, the most recent ``left_type``
    event of the same user at-or-before it → (purchase_id, user_id,
    click_id, us_since_click).

    Deterministic tiebreak: equal timestamps resolve to the largest
    left event_id; a left row at exactly the right row's timestamp
    counts as "before" (ties sort left-side first in the union
    ordering, matching SQL ``l.ts <= r.ts``).
    """
    t_us = F.unix_micros(F.col("ts"))
    left = events.where(F.col("event_type") == left_type).select(
        "user_id",
        t_us.alias("t"),
        F.lit(0).alias("kind"),
        "event_id",
        F.struct(F.col("event_id").alias("click_id"), t_us.alias("click_t")).alias(
            "payload"
        ),
    )
    right = events.where(F.col("event_type") == right_type).select(
        "user_id",
        t_us.alias("t"),
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast(left.schema["payload"].dataType).alias("payload"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = left.unionByName(right).withColumn(
        "latest", F.last("payload", ignorenulls=True).over(w)
    )
    return (
        carried.where((F.col("kind") == 1) & F.col("latest").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("latest.click_id").alias("click_id"),
            (F.col("t") - F.col("latest.click_t")).alias("us_since_click"),
        )
    )


def range_attribution(
    events: DataFrame,
    window_secs: int = 21600,
    right_type: str = "purchase",
    left_type: str = "click",
) -> DataFrame:
    """ALL (purchase, click) pairs of the same user with the click in
    ``[purchase_ts - window_secs, purchase_ts]`` → (purchase_id,
    click_id, user_id, us_between) — the attribution-window interval
    join.

    Clicks are replicated to their own bucket and the next one
    (bucket width = window width), so the equi-join on
    (user_id, bucket) catches every qualifying pair exactly once and
    the exact predicate prunes the rest.
    """
    bucket_us = window_secs * 1_000_000
    t_us = F.unix_micros(F.col("ts"))
    clicks = (
        events.where(F.col("event_type") == left_type)
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            t_us.alias("click_t"),
        )
        .withColumn(
            # integer DIV: float division loses exactness past 2^53
            "bucket",
            F.explode(
                F.array(
                    F.expr(f"click_t DIV {bucket_us}"),
                    F.expr(f"click_t DIV {bucket_us} + 1"),
                )
            ),
        )
    )
    purchases = (
        events.where(F.col("event_type") == right_type)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            t_us.alias("purchase_t"),
        )
        .withColumn("bucket", F.expr(f"purchase_t DIV {bucket_us}"))
    )
    diff = F.col("purchase_t") - F.col("click_t")
    return (
        purchases.join(clicks, ["user_id", "bucket"])
        .where((diff >= 0) & (diff <= bucket_us))
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            diff.alias("us_between"),
        )
    )


def hypertable_rollup(events: DataFrame) -> DataFrame:
    """Minute/hour/day continuous aggregate in one pass over the raw
    table → (granularity, bucket_start, event_type, n_events,
    sum_value).

    The raw scan aggregates once at minute grain; hour and day are
    derived from the finer level's partials (sum-of-sums), which is
    what makes the rollup refresh affordable when the raw table is
    100 TB and the minute table is GBs."""
    minute_start = (F.unix_timestamp("ts") / 60).cast("bigint") * 60
    minutes = (
        events.groupBy(
            minute_start.alias("bucket_start"), F.col("event_type")
        ).agg(
            F.count("*").alias("n_events"),
            # decimal-exact partials: double sums are order-dependent
            # and would hash-diverge from the oracle (and from a
            # re-run of the same plan after a repartition)
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_sum"),
        )
    )
    return rollup_from_minutes(minutes)


def rollup_from_minutes(minutes: DataFrame) -> DataFrame:
    """Derive the hour/day levels and the stacked output from a
    minute-grain partials frame (bucket_start, event_type, n_events,
    _sum) — shared by the batch rollup and the streaming
    continuous-aggregate reader so both serve identical rows."""

    def _coarsen(finer: DataFrame, secs: int) -> DataFrame:
        return (
            finer.groupBy(
                ((F.col("bucket_start") / secs).cast("bigint") * secs).alias(
                    "bucket_start"
                ),
                "event_type",
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("_sum").alias("_sum"),
            )
        )

    hours = _coarsen(minutes, 3600)
    days = _coarsen(hours, 86400)
    out = None
    for gran, df in (("minute", minutes), ("hour", hours), ("day", days)):
        lvl = df.select(
            F.lit(gran).alias("granularity"),
            "bucket_start",
            "event_type",
            "n_events",
            F.col("_sum").cast("double").alias("sum_value"),
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out


def seasonal_naive_eval(events: DataFrame, period_secs: int = 604800) -> DataFrame:
    """Backtest of the seasonal-naive forecast (ŷ(t) = y(t − period),
    weekly by default) over the hourly series → (event_type, n_hours,
    mae, mean_error).

    The hourly rollup is computed once (decimal-exact sums); the
    forecast is an equi-join of that small aggregate to itself shifted
    by one period — robust to missing hours, no window gymnastics —
    and both error metrics are exact-decimal sums divided once at the
    end. The raw table is scanned exactly once."""
    hour_start = (F.unix_timestamp("ts") / 3600).cast("bigint") * 3600
    hourly = events.groupBy(
        hour_start.alias("bucket"), F.col("event_type")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("y"))
    actual = hourly.select("bucket", "event_type", "y")
    prior = hourly.select(
        (F.col("bucket") + period_secs).alias("bucket"),
        "event_type",
        F.col("y").alias("y_hat"),
    )
    err = F.col("y") - F.col("y_hat")
    return (
        actual.join(prior, ["bucket", "event_type"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.round(
                F.sum(F.abs(err)).cast("double") / F.count("*"), 6
            ).alias("mae"),
            F.round(F.sum(err).cast("double") / F.count("*"), 6).alias(
                "mean_error"
            ),
        )
    )
