"""Parquet loaders for the testdata star schema.

Columnar parquet scans are the 100 TB story: column pruning and
predicate pushdown happen at the scan (verify via
``df.explain('formatted')`` → ``ReadSchema`` / ``PushedFilters``), so
every downstream operator should select only the columns it needs and
filter as early as possible.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# events.parquet's ts column has shipped as TIMESTAMP(NANOS) (decoded
# bigint under the nanosAsLong legacy conf on Spark ≤4.0; decoded
# natively as TIMESTAMP_NTZ with nanos truncated on Spark ≥4.1) and as
# TIMESTAMP(MICROS)/NTZ. Normalize by the *decoded dtype*, not by conf
# fiddling: all paths land on session-tz TimestampType with identical
# microsecond values (epoch-nanos DIV 1000 == native truncation).
def _events_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # integer DIV, not `/ 1000`: float division of epoch-nanos
        # (~1.7e18 > 2^53) loses microsecond precision
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if isinstance(ts_type, TimestampNTZType):
        # interpret the NTZ wall-clock AS UTC explicitly: a plain
        # cast("timestamp") reinterprets it in the SESSION time zone,
        # so the same parquet would decode to different epochs under
        # a non-UTC caller session than the epoch-nanos encoding does
        return raw.withColumn(
            "ts", F.from_utc_timestamp(F.col("ts").cast("timestamp"),
                                       F.expr("current_timezone()"))
        )
    return raw


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        return _events_normalized(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


class LazyTables(dict):
    """Dict-like table registry that defers parquet reads until a
    table is actually used — keeps unrelated queries from touching
    (or schema-inferring) tables they don't need."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir

    def __missing__(self, name: str) -> DataFrame:
        df = load_table(self._spark, self._sf_dir, name)
        self[name] = df
        return df


def load_tables(spark: SparkSession, sf_dir: str) -> LazyTables:
    return LazyTables(spark, sf_dir)
