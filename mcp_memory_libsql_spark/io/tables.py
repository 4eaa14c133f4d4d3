"""Parquet loaders for the testdata star schema.

Columnar parquet scans are the 100 TB story: column pruning and
predicate pushdown happen at the scan (verify via
``df.explain('formatted')`` → ``ReadSchema`` / ``PushedFilters``), so
every downstream operator should select only the columns it needs and
filter as early as possible.
"""

from __future__ import annotations

import os
import tempfile

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


# events.parquet carries TIMESTAMP(NANOS), which Spark reads only via
# the nanosAsLong legacy conf. Leaving that conf set session-wide
# would silently decode ANY later nanos column as bigint, so events is
# normalized ONCE per (session, sf_dir) to a microsecond-ts parquet
# (the ingest-normalization pattern: at 100 TB this is the ingest
# job's problem, not a per-query conf), with the legacy conf scoped
# strictly to that one rewrite.
_EVENTS_MICROS: dict[tuple[str, str], str] = {}


def _events_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _EVENTS_MICROS.get(key)
    if path is None:
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            raw = spark.read.parquet(table_path(sf_dir, "events"))
            # integer DIV, not `/ 1000`: float division of epoch-nanos
            # (~1.7e18 > 2^53) loses microsecond precision
            micros = raw.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
            path = tempfile.mkdtemp(prefix="spark_events_micros_")
            # the write action executes inside the conf scope
            micros.write.mode("overwrite").parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)
        _EVENTS_MICROS[key] = path
    return spark.read.parquet(path)


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
