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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark only reads it
        # via the nanosAsLong legacy conf → convert back to a proper
        # (microsecond) timestamp column.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("bigint"))
        )
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
