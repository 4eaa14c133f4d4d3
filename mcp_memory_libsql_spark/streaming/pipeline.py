"""Structured Streaming twins of the batch event/KG operators.

The reference is an always-on server mutating state per request; the
Spark-native equivalent of that "live" surface is Structured
Streaming: an events stream feeding watermarked windowed aggregates,
and an entity-upsert stream applied through the same last-writer-wins
merge as the batch store (via ``foreachBatch``).

Scale notes: windowed aggregation state is partitioned by
(window, event_type) in the state store; the 10-minute watermark
bounds state size; ``foreachBatch`` upserts give exactly-once table
maintenance when the sink table is an ACID format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, dir_path: str) -> DataFrame:
    """File-source stream of event JSON files (one file per micro-batch
    in tests; a Kafka source drops in unchanged on a cluster)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(dir_path)
    )


def windowed_agg_stream(
    events: DataFrame, minutes: int = 60, watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window aggregation — streaming twin of
    ``analytics.events.windowed_counts``; late data beyond the
    watermark is dropped and state is evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, mode: str = "update"
):
    """Drive a streaming DF into a memory sink (tests/demos)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .start()
    )


def dedup_stream(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup — the continuous-ingest twin of
    ``textops.dedup.exact_groups``: drop records whose content digest
    was already seen, with the watermark bounding dedup state (a
    pragmatic TTL: exact-once only within the watermark horizon, which
    is the standard trade at 100 TB/day ingest rates — unbounded
    dedup state would grow forever).

    State is partitioned by the digest, the same key the batch
    dedup's groupBy shuffles on."""
    keyed = events.withColumn(
        "digest", F.md5(F.concat_ws("|", "event_type", "props"))
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["digest"]
    )


def entity_upsert_stream(
    spark: SparkSession,
    dir_path: str,
    store,
    checkpoint_every: int = 8,
):
    """Micro-batch entity upserts: each arriving JSON file carries
    create_entities batches (name, entity_type, created_at, plus
    observation content rows) applied to a ``GraphStore`` through the
    same merge as the batch path — streaming and batch share one
    mutation semantics (no divergent code paths to keep correct).

    Each micro-batch is an O(batch) **delta write** (the base tables
    are never rewritten per batch — at 100 TB a full-snapshot rewrite
    per micro-batch would be the whole job's cost); after
    ``checkpoint_every`` deltas the store checkpoints, bounding the
    merge-on-read chain the way an LSM compacts.
    """
    batch_schema = StructType(
        [
            StructField("name", StringType()),
            StructField("entity_type", StringType()),
            StructField("created_at", LongType()),
            StructField("content", StringType()),
        ]
    )
    stream = spark.readStream.schema(batch_schema).option(
        "maxFilesPerTrigger", 1
    ).json(dir_path)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        batch_e = batch_df.select("name", "entity_type", "created_at").distinct()
        batch_o = batch_df.where(F.col("content").isNotNull()).select(
            F.col("name").alias("entity_name"), "content", "created_at"
        )
        store.apply_upsert(batch_e, batch_o)
        if checkpoint_every and store.delta_chain_length() >= checkpoint_every:
            store.checkpoint()

    return stream.writeStream.foreachBatch(apply_batch).outputMode("update").start()


def enrich_events(events: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Attach customer identity + nation to events (user_id maps to
    c_custkey = user_id + 1 in the synthetic data). Works identically
    on a batch frame and a streaming frame: a stream-static broadcast
    join needs no state store and no watermark — the dim is
    re-broadcast per micro-batch, which is exactly how a cluster
    enriches a Kafka stream against a slowly-changing dimension."""
    from pyspark.sql.functions import broadcast

    dim = customer.join(
        broadcast(nation.select("n_nationkey", "n_name")),
        customer["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "c_mktsegment", "n_name")
    return events.join(
        broadcast(dim), events["user_id"] + 1 == dim["c_custkey"]
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "c_name",
        "c_mktsegment",
        "n_name",
    )
