"""Count-min sketch heavy hitters — the mergeable frequency sketch
for streams/shards too large to count exactly.

The sketch is a d×w counter matrix: each key increments one counter
per hash row; an estimate is the MIN over its d counters (never an
undercount, overcounts bounded by N·e/w with probability 1−e^−d).
Counters are plain (seed, bucket) → count rows, so the sketch is
mergeable by addition — per-partition sketches union+sum into the
global one, the same partial-aggregation shape Spark gives any
groupBy, and the same merge a streaming job applies across
micro-batches.

Hashes are md5-derived (portable — the DuckDB oracle computes the
IDENTICAL sketch), so estimates are deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..textops.tokenize import md5_hash32

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _seeds(depth: int):
    return F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")


def _bucket(width: int):
    """THE sketch position hash — shared by the build and probe sides
    so they can never drift (a one-sided change would silently turn
    every min-over-counters estimate into a garbage minimum)."""
    return md5_hash32(F.concat_ws(":", F.col("seed"), F.col("key"))) % width


def cms_counters(
    keyed: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """(seed, bucket, c) — the sketch matrix for ``keyed``'s ``key``
    column. One explode(×depth) + one tiny groupBy; the result is
    depth·width rows no matter how large the input."""
    rows = keyed.select("key", _seeds(depth))
    return (
        rows.withColumn("bucket", _bucket(width))
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("c"))
    )


def heavy_hitters(
    events: DataFrame,
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Top-k users by count-min-ESTIMATED event count, with the exact
    count alongside → (user_id, est_count, exact_count). est ≥ exact
    always (count-min never undercounts).

    The sketch (d·w counters) broadcasts to the candidate scoring
    join; candidates here are the distinct keys (the gate needs every
    estimate), in production a per-partition pre-top-k."""
    keyed = events.select(F.col("user_id").cast("string").alias("key"))
    sketch = cms_counters(keyed, depth, width)
    exact = keyed.groupBy("key").agg(F.count("*").alias("exact_count"))
    probes = exact.select("key", "exact_count", _seeds(depth)).withColumn(
        "bucket", _bucket(width)
    )
    est = (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("key", "exact_count")
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.select(
            F.col("key").cast("bigint").alias("user_id"),
            "est_count",
            "exact_count",
        )
        .orderBy(F.desc("est_count"), "user_id")
        .limit(k)
    )
