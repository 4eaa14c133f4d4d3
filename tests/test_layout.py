"""Physical-layout properties: bucketed joins must not shuffle, and
salted joins must be row-identical to plain joins. The plan
assertions make the scale properties regression-tested facts rather
than docstring claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_memory_libsql_spark.io.layout import (
    read_table,
    salted_join,
    write_bucketed,
)
from mcp_memory_libsql_spark.io.tables import load_tables


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    write_bucketed(
        t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount"),
        "b_lineitem",
        ["l_orderkey"],
        n_buckets=8,
    )
    write_bucketed(
        t["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
        "b_orders",
        ["o_orderkey"],
        n_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed):
    li = read_table(spark, "b_lineitem")
    o = read_table(spark, "b_orders")
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    # force a non-broadcast join so the exchange question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    t = load_tables(spark, sf_dir)
    li = read_table(spark, "b_lineitem")
    o = read_table(spark, "b_orders")
    got = li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
    expect = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert got == expect


def test_salted_join_row_identical(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    big = t["lineitem"].select(
        F.col("l_suppkey").alias("k"), "l_orderkey", "l_extendedprice"
    )
    small = t["supplier"].select(F.col("s_suppkey").alias("k"), "s_name")
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k", n_salts=8)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_is_deterministic(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    big = t["lineitem"].select(F.col("l_suppkey").alias("k"), "l_orderkey")
    small = t["supplier"].select(F.col("s_suppkey").alias("k"), "s_name")
    a = salted_join(big, small, "k", n_salts=4, distribute_on="l_orderkey")
    b = salted_join(big, small, "k", n_salts=4, distribute_on="l_orderkey")
    assert a.exceptAll(b).count() == 0


def test_q6_predicates_reach_the_scan(spark, sf_dir):
    """The pushdown showcase stays pushed down: every q6 predicate
    must appear in the parquet scan's PushedFilters, and the scan
    must not read money columns the query never touches."""
    from mcp_memory_libsql_spark.analytics.tpch import q6_forecast_revenue

    df = q6_forecast_revenue(load_tables(spark, sf_dir))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in plan or col in plan.split("PushedFilters:")[1][:400]
    assert "l_tax" not in plan.split("ReadSchema:")[1][:400]


def test_dedup_exact_column_pruning(spark, sf_dir):
    """Exact dedup reads only (doc_id, text) — a scan that drags the
    full documents schema through md5 hashing is wrong at 100 TB."""
    from mcp_memory_libsql_spark.textops.dedup import exact_groups
    from mcp_memory_libsql_spark.io.tables import load_tables as _lt

    df = exact_groups(_lt(spark, sf_dir)["documents"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1][:400]
    assert "text" in read_schema
    assert "lang" not in read_schema
    assert "source" not in read_schema
