"""Relational analytics headliners (TPC-H-style) — the engine's
general query capability and the bench workload.

Scale notes per query:
- q1: single scan + hash agg on a low-cardinality key; partial
  aggregation map-side means the shuffle carries only
  (flag,status) groups — survives any SF.
- q3: customer filter → broadcast to orders join (small side after
  filter at bench SF; at 100 TB AQE picks SMJ), then join to
  lineitem on orderkey; aggregation re-uses the orderkey shuffle.
- q5: classic 6-way join; region/nation/supplier broadcast, the
  orders⋈lineitem join shuffles on orderkey once.

Money arithmetic is DECIMAL-exact: the testdata money columns are
2-decimal doubles, so casting to DECIMAL before the product/sum makes
every intermediate exact — ROUND(…, 2) then cannot diverge from the
DuckDB oracle when a sum lands on a half-cent boundary (double
summation order flipped tpch_q10 by one cent in r01). Outputs are
cast back to DOUBLE so the gate schema is engine-neutral. Averages
use exact scaled-integer round-half-up — see ``_avg4`` — because
DuckDB promotes decimal division to DOUBLE, which would reintroduce
the boundary flake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

# Exact 2-decimal money terms (DECIMAL widths sized to the data:
# l_extendedprice < 1.1e5, l_discount/l_tax ≤ 0.10, all 2-decimal).
_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC = "CAST(l_discount AS DECIMAL(4,2))"
_TAX = "CAST(l_tax AS DECIMAL(4,2))"
_ONE = "CAST(1 AS DECIMAL(3,2))"
# revenue term: price * (1 - discount), exact at scale 4
_REV = f"{_PRICE} * ({_ONE} - {_DISC})"


def _money_sum(expr_sql: str, alias: str):
    """SUM a decimal-exact money expression, ROUND to cents, render
    as DOUBLE (exact → identical in Spark and DuckDB)."""
    return F.expr(f"CAST(ROUND(SUM({expr_sql}), 2) AS DOUBLE)").alias(alias)


def _avg4(col_dec_sql: str, alias: str):
    """round-half-up(avg, 4 decimals) in exact integer math:
    A = sum of the column scaled to 1e4 BIGINTs (exact — inputs have
    ≤2 decimals), then q = (2A + N) div (2N) is the half-up-rounded
    scaled average; q/1e4 as DOUBLE is identical cross-engine.
    (DuckDB spelling: ``//`` instead of ``div``.)"""
    return F.expr(
        f"CAST((2 * SUM(CAST({col_dec_sql} * 10000 AS BIGINT)) + COUNT(*))"
        f" DIV (2 * COUNT(*)) AS DOUBLE) / 10000"
    ).alias(alias)


def q1_pricing_summary(t, cutoff: str = "2001-09-01") -> DataFrame:
    li = t["lineitem"].where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    qty = "CAST(l_quantity AS DECIMAL(12,2))"
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum(qty, "sum_qty"),
            _money_sum(_PRICE, "sum_base_price"),
            _money_sum(_REV, "sum_disc_price"),
            _money_sum(f"{_REV} * ({_ONE} + {_TAX})", "sum_charge"),
            _avg4(qty, "avg_qty"),
            _avg4(_PRICE, "avg_price"),
            _avg4(_DISC, "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(t, segment: str = "BUILDING", date: str = "1998-03-15") -> DataFrame:
    cust = t["customer"].where(F.col("c_mktsegment") == segment).select("c_custkey")
    orders = t["orders"].where(
        F.col("o_orderdate") < F.lit(date).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t["lineitem"].where(
        F.col("l_shipdate") > F.lit(date).cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        orders.join(broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money_sum(_REV, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        # date rendered as a string so the oracle value-hash is
        # engine-format independent
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def q6_forecast_revenue(
    t, date_from: str = "1996-01-01", date_to: str = "1997-01-01"
) -> DataFrame:
    """TPC-H Q6: pure scan + filter + scalar agg — the pushdown
    showcase (every predicate reaches the parquet scan)."""
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(_money_sum(f"{_PRICE} * {_DISC}", "revenue"))


def q10_returned_items(t, date_from: str = "1996-01-01", date_to: str = "1996-04-01") -> DataFrame:
    """TPC-H Q10: top customers by revenue lost to returns."""
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = t["customer"].select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nat = t["nation"].select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_money_sum(_REV, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q5_local_supplier_volume(
    t, region: str = "ASIA", date_from: str = "1996-01-01", date_to: str = "1997-01-01"
) -> DataFrame:
    reg = t["region"].where(F.col("r_name") == region)
    nat = t["nation"].join(
        broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = t["customer"].join(
        broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("c_nation"))
    supp = t["supplier"].join(
        broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("s_nation"))
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        # "local" supplier: customer and supplier in the same nation
        .where(F.col("c_nation") == F.col("s_nation"))
    )
    return (
        joined.groupBy(F.col("c_nation").alias("n_name"))
        .agg(_money_sum(_REV, "revenue"))
    )


def q7_volume_shipping(
    t, nation_a: str = "NATION_1", nation_b: str = "NATION_2"
) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations per year.
    Both nation dims broadcast; the only big shuffle is
    lineitem⋈orders on orderkey."""
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(t["orders"].select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["customer"].select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            F.expr(_REV).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.expr("CAST(ROUND(SUM(volume), 2) AS DOUBLE)").alias("revenue"))
    )


def q13_customer_distribution(t) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer. Left join
    shuffles on custkey with map-side combine; the regroup on c_count
    is over ≤ a few hundred distinct counts — negligible at any SF."""
    counts = (
        t["customer"].select("c_custkey")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q14_promo_effect(
    t, date_from: str = "1996-01-01", date_to: str = "1996-02-01"
) -> DataFrame:
    """TPC-H Q14 (adapted: p_type is categorical here, so "promo" =
    p_type = 'PROMO'). Revenues are decimal-exact; the percentage is
    a single IEEE division of two exactly-derived doubles, identical
    cross-engine without rounding."""
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    joined = li.join(
        broadcast(t["part"].select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = f"CASE WHEN p_type = 'PROMO' THEN {_REV} END"
    return joined.agg(
        _money_sum(promo, "promo_revenue"),
        _money_sum(_REV, "total_revenue"),
        F.expr(
            f"CAST(SUM({promo}) AS DOUBLE) / CAST(SUM({_REV}) AS DOUBLE) * 100"
        ).alias("promo_pct"),
    )


def q15_top_supplier(
    t, date_from: str = "1996-01-01", date_to: str = "1996-04-01"
) -> DataFrame:
    """TPC-H Q15: supplier(s) with the max revenue in a quarter.
    Per-supplier revenue is one partial-agg shuffle; the max is a
    1-row broadcast, and the winner set broadcasts into the supplier
    dim — the big tables never shuffle twice. The max-equality join
    is on EXACT decimals, so ties are exact, not float-fuzzy."""
    srev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.expr(f"SUM({_REV})").alias("_total"))
    )
    mx = srev.agg(F.max("_total").alias("_mx"))
    top = srev.join(broadcast(mx), F.col("_total") == F.col("_mx"))
    return (
        t["supplier"].select("s_suppkey", "s_name")
        .join(broadcast(top), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.expr("CAST(ROUND(_total, 2) AS DOUBLE)").alias("total_revenue"),
        )
    )


def q18_large_orders(t, min_qty: int = 300) -> DataFrame:
    """TPC-H Q18: large-volume orders. The quantity rollup is one
    orderkey shuffle; the survivor set (rare orders) broadcasts into
    orders, then the customer dim broadcasts in."""
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(12,2)))").alias("_qty"))
        .where(F.col("_qty") > min_qty)
    )
    return (
        t["orders"]
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .join(broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            broadcast(t["customer"].select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.expr("CAST(_qty AS DOUBLE)").alias("sum_qty"),
        )
    )


def q16_parts_supplier_count(t, exclude_brand: str = "Brand#1") -> DataFrame:
    """TPC-H Q16 (adapted: no partsupp table — supplier/part pairs
    come from observed lineitem shipments). Distinct (part, supplier)
    first (pair-key shuffle with partial agg), then the part dim
    broadcasts in and the rollup groups on a tiny key space."""
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    part = t["part"].where(F.col("p_brand") != exclude_brand).select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    return (
        pairs.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q4_priority_late(t, days: int = 100) -> DataFrame:
    """Q4-style order priority check (adapted: this schema has no
    commitdate/receiptdate, so "late" = any lineitem shipped > ``days``
    after the order date). Semi-join keeps the aggregation input
    minimal — the canonical EXISTS plan."""
    orders = t["orders"].select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {days} DAYS")
        )
        .select("o_orderkey")
        .distinct()
    )
    return (
        orders.join(late, "o_orderkey", "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
    )
