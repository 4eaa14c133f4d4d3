"""ANALYZE-style column statistics — the stats a cost-based planner
(and a data engineer eyeballing a new table) needs: per-column null
fraction, distinct count, min/max. At 100 TB this is the nightly
stats job that feeds join-strategy choices (the manual inputs to
data_skew_report / join_cardinality_report); Spark's own CBO consumes
the same numbers via ANALYZE TABLE ... COMPUTE STATISTICS.

One aggregation pass computes every column's counts (no per-column
scans); distincts are exact two-phase count_distinct — swap in
approx_count_distinct at extreme widths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def column_stats(df: DataFrame, table_name: str) -> DataFrame:
    """→ (table_name, column_name, n_rows, n_nulls, null_frac,
    n_distinct, min_value, max_value) — min/max rendered as strings
    so one report covers every column type."""
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in df.columns:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.count_distinct(col).alias(f"{c}__distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    parts = []
    for c in df.columns:
        parts.append(
            one.select(
                F.lit(table_name).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.col("_rows").cast("bigint").alias("n_rows"),
                F.col(f"{c}__nulls").cast("bigint").alias("n_nulls"),
                F.round(
                    F.col(f"{c}__nulls").cast("double")
                    / F.col("_rows").cast("double"),
                    6,
                ).alias("null_frac"),
                F.col(f"{c}__distinct").cast("bigint").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
