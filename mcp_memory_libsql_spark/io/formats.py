"""Source / sink formats beyond the testdata parquet: JSONL and CSV
readers with explicit schemas, a hive-partitioned parquet sink, and a
deterministic sharded-JSONL training-export writer.

Scale rules encoded here:
- **Readers take explicit schemas.** Schema inference is a full
  pre-pass over the data (2× the I/O at 100 TB) and can flip types
  between runs; production readers pin the schema.
- **Partitioned sinks partition on low-cardinality query keys**
  (lang, date, kind) so downstream filters become directory pruning —
  the parquet analog of an index. Partition columns must NEVER be
  high-cardinality (doc_id would create one directory per row).
- **Training shards are assigned by deterministic hash**, not
  round-robin: the same corpus always produces the same shard
  membership (resumable exports, reproducible training order), and
  hashing load-balances regardless of input order. Shard count sets
  file size; aim for 100 MB–1 GB per shard at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..textops.tokenize import md5_hash32, md5_hash60

DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
EVENTS_JSON_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def write_jsonl(df: DataFrame, path: str, partition_by: list[str] | None = None):
    """JSON-lines sink (one object per line — the LM-training
    interchange format). Optional hive partitioning."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSONL source with a pinned schema (no inference pass)."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str):
    """CSV sink with header — the interchange format for the
    relational tables."""
    df.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """CSV source with a pinned schema and header row."""
    return spark.read.schema(schema).option("header", True).csv(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Hive-partitioned parquet sink: filters on the partition
    columns prune whole directories at plan time (visible as
    ``PartitionFilters`` in the scan node)."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def export_training_shards(
    documents: DataFrame, path: str, n_shards: int = 8
) -> None:
    """Write the corpus as ``n_shards`` deterministic JSONL shards:
    shard = md5(doc_id) mod n_shards (stable across runs and input
    order), one output file per shard via a shard-key repartition —
    the exchange is on the shard key only, so each writer task
    streams exactly one shard."""
    sharded = documents.withColumn(
        "shard",
        (md5_hash32(F.col("doc_id").cast("string"))
         .cast("bigint") % n_shards).cast("int"),
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read back a sharded export (shard is a hive partition column,
    so shard-scoped reads prune to one directory)."""
    return spark.read.schema(DOCUMENTS_SCHEMA + ", shard int").json(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None):
    """ORC sink (Spark-native columnar alternative to parquet; some
    warehouse stacks are ORC-standardized). Same hive-partitioning
    contract as the parquet sink."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-media ingest via Spark's built-in ``binaryFile`` source →
    (path, modificationTime, length, content binary) — the first hop
    of the multimodal pipeline: crawl directories of image/audio
    files into the (payload, metadata) shape ``multimodal.media``
    processes, then write parquet and never touch small files again
    (binary columns in parquet give columnar stats + pruning; a
    million loose JPEGs give a million file-open round trips per
    scan).

    ``pathGlobFilter`` prunes by extension at listing time — no data
    read for excluded files."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def binary_files_to_media(files: DataFrame, kind: str) -> DataFrame:
    """Adapt a binaryFile scan to the multimodal media schema
    (media_id from the path hash, payload = content, meta stub) —
    hand the result to ``multimodal.media.extract_features``."""
    return files.select(
        md5_hash60(F.col("path")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            (F.length("content") % 10 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
