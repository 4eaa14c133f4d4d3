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
            # coalesce: sum over ZERO rows is NULL, and an empty
            # table must profile as 0 nulls, not NULL nulls
            F.coalesce(
                F.sum(col.isNull().cast("bigint")), F.lit(0)
            ).alias(f"{c}__nulls"),
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
                F.when(
                    F.col("_rows") > 0,
                    F.round(
                        F.col(f"{c}__nulls").cast("double")
                        / F.col("_rows").cast("double"),
                        6,
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("null_frac"),
                F.col(f"{c}__distinct").cast("bigint").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def data_quality_checks(t) -> DataFrame:
    """Data-contract validation report → (check_name, n_checked,
    n_violations, passed): the dbt-test / Great-Expectations layer of
    a pipeline — declarative row-level rules evaluated as ONE
    aggregation per table plus key-level rules as rollups, emitted as
    a fixed small report.

    Checks: range (l_quantity 1..50, l_discount 0..0.1), enum
    (l_returnflag ∈ {A,N,R}, o_orderstatus ∈ {F,O,P}), non-null
    (o_custkey), referential integrity (lineitem.l_orderkey must
    exist in orders — an aggregated anti-join), and key uniqueness
    (o_orderkey). Every count is an exact BIGINT. A NULL in a
    range/enum column COUNTS AS A VIOLATION (a NULL quantity is
    exactly what a contract check must flag — and three-valued
    logic would otherwise let it slip through the negated filter).

    Scale: row-level rules ride one scan per table (all counted in a
    single agg — adding a rule adds a column, not a pass); the FK
    check is a key-rollup anti-join (shuffles key widths, never raw
    rows); uniqueness is one groupBy on the key.
    """
    li, od = t["lineitem"], t["orders"]

    def rowcheck(df, name, cond):
        # NULL cond → violation (NOT the SQL-filter semantics where
        # NULL silently passes both cond and ~cond)
        violated = cond.isNull() | ~cond
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count("*").cast("bigint").alias("n_checked"),
            # coalesce: an EMPTY table has 0 violations, not NULL
            # (sum over zero rows), which would make `passed` NULL
            # and slip through a ~passed filter
            F.coalesce(F.sum(violated.cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias("n_violations"),
        )

    checks = [
        rowcheck(
            li,
            "lineitem.quantity_in_1_50",
            (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
        ),
        rowcheck(
            li,
            "lineitem.discount_in_0_0.1",
            (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1),
        ),
        rowcheck(
            li,
            "lineitem.returnflag_enum",
            F.col("l_returnflag").isin("A", "N", "R"),
        ),
        rowcheck(
            od,
            "orders.orderstatus_enum",
            F.col("o_orderstatus").isin("F", "O", "P"),
        ),
        rowcheck(od, "orders.custkey_not_null", F.col("o_custkey").isNotNull()),
    ]
    # referential integrity: distinct lineitem order keys missing from
    # orders — key-width shuffle only
    li_keys = li.select(F.col("l_orderkey").alias("k")).distinct()
    od_keys = od.select(F.col("o_orderkey").alias("k")).distinct()
    orphans = li_keys.join(od_keys, "k", "left_anti")
    fk = li_keys.crossJoin(
        orphans.agg(F.count("*").alias("_v"))
    ).agg(
        F.lit("lineitem.orderkey_fk_orders").alias("check_name"),
        F.count("*").cast("bigint").alias("n_checked"),
        F.coalesce(F.min("_v"), F.lit(0)).cast("bigint").alias("n_violations"),
    )
    # key uniqueness: orders.o_orderkey
    dup_keys = (
        od.groupBy("o_orderkey")
        .agg(F.count("*").alias("c"))
        .agg(
            F.lit("orders.orderkey_unique").alias("check_name"),
            F.count("*").cast("bigint").alias("n_checked"),
            F.coalesce(F.sum((F.col("c") > 1).cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias("n_violations"),
        )
    )
    out = checks[0]
    for c in checks[1:] + [fk, dup_keys]:
        out = out.unionByName(c)
    return out.withColumn("passed", F.col("n_violations") == 0)
