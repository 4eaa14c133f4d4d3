"""Physical-layout utilities for the 100 TB path: bucketed tables
(co-located, shuffle-free joins) and salted joins (hot-key skew).

Bucketing is the ingest-time answer to "this join shuffles every
query": write both sides bucketed+sorted on the join key once, and
every subsequent equi-join on that key is exchange-free (Spark reads
matching buckets pairwise). ``tests/test_layout.py`` asserts the
no-Exchange plan property directly, so a regression that silently
reintroduces the shuffle fails CI — the property IS the feature.

Salting is the query-time answer to "one key holds 10% of the rows":
spread the hot side's rows across ``n_salts`` sub-keys and replicate
the small side to all of them. AQE's skew-join handles sort-merge
skew automatically; explicit salting remains necessary for skewed
AGGREGATIONS and for broadcast-ineligible dimension joins, so both
tools belong in the box.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table. Bucket count
    is a layout contract: both sides of a co-located join must use
    the SAME n_buckets (at 100 TB pick n_buckets ≈ cluster cores so
    one bucket ≈ one task)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    distribute_on: str | None = None,
) -> DataFrame:
    """Inner equi-join with the big side's hot keys spread over
    ``n_salts`` sub-partitions and the small side replicated to all
    of them. Result is row-identical to ``big.join(small, key)``.

    The big side's salt must be deterministic but uniform per row —
    derived from ``distribute_on`` (default: every big-side column),
    never from rand() (retries/speculative tasks would re-roll it).
    Replication cost is n_salts× the SMALL side only."""
    salt_src = (
        [F.col(c) for c in big.columns]
        if distribute_on is None
        else [F.col(distribute_on)]
    )
    big_s = big.withColumn("_salt", F.pmod(F.hash(*salt_src), F.lit(n_salts)))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [key, "_salt"])
    return out.drop("_salt")
