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


def q2_min_cost_supplier(
    t, size: int = 15, region: str = "EUROPE"
) -> DataFrame:
    """TPC-H Q2 (adapted: no partsupp, so supplier/part availability
    comes from observed lineitem shipments and the "minimum cost"
    criterion becomes the max-acctbal supplier — same correlated
    per-part extremum shape). Distinct pairs shuffle once on the pair
    key; part/supplier/nation dims broadcast; the per-part max joins
    back as a broadcast (tiny after the part filter). No arithmetic on
    the extremum column, so the equality join is exact."""
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    part = t["part"].where(F.col("p_size") == size).select("p_partkey")
    reg = t["region"].where(F.col("r_name") == region)
    nat = t["nation"].join(
        broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = t["supplier"].join(
        broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    cand = (
        pairs.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    best = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.max("s_acctbal").alias("_best_bal")
    )
    return (
        cand.join(
            broadcast(best),
            (F.col("p_partkey") == F.col("_pk"))
            & (F.col("s_acctbal") == F.col("_best_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def q8_market_share(
    t,
    region: str = "ASIA",
    ptype: str = "STANDARD",
    share_region: str = "EUROPE",
) -> DataFrame:
    """TPC-H Q8 (adapted: the market-share group is a supplying
    REGION rather than one nation — the synthetic supplier table is
    too thin at small SFs for single-nation shares to be non-trivial).
    Revenue sums are exact decimals; the share is one IEEE division
    of two exactly-derived doubles (same contract as q14). All dims
    broadcast — the only big shuffle is lineitem⋈orders on
    orderkey."""
    reg = t["region"].where(F.col("r_name") == region)
    nat_r = t["nation"].join(
        broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("_cn_key"))
    cust = t["customer"].join(
        broadcast(nat_r), F.col("c_nationkey") == F.col("_cn_key")
    ).select("c_custkey")
    part = t["part"].where(F.col("p_type") == ptype).select("p_partkey")
    supp_nat = t["nation"].join(
        broadcast(
            t["region"].select(
                F.col("r_regionkey").alias("_srk"),
                F.col("r_name").alias("supp_region"),
            )
        ),
        F.col("n_regionkey") == F.col("_srk"),
    ).select(F.col("n_nationkey").alias("_sn_key"), "supp_region")
    supp = t["supplier"].join(
        broadcast(supp_nat), F.col("s_nationkey") == F.col("_sn_key")
    ).select("s_suppkey", "supp_region")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    li = t["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    share = f"CASE WHEN supp_region = '{share_region}' THEN {_REV} END"
    return (
        li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            _money_sum(share, "share_volume"),
            _money_sum(_REV, "total_volume"),
            F.expr(
                f"CAST(COALESCE(SUM({share}), 0) AS DOUBLE)"
                f" / CAST(SUM({_REV}) AS DOUBLE)"
            ).alias("mkt_share"),
        )
    )


def q9_product_profit(t, name_like: str = "%widget%") -> DataFrame:
    """TPC-H Q9 (adapted: no partsupp.ps_supplycost — unit cost is
    modeled as 60% of p_retailprice, keeping the profit expression
    rev − cost·qty in exact decimal). Groups by supplier nation ×
    ship year; part/supplier/nation broadcast, one orderless scan of
    lineitem (no orders join needed: year comes from l_shipdate)."""
    part = t["part"].where(F.col("p_name").like(name_like)).select(
        "p_partkey", "p_retailprice"
    )
    supp_nat = t["nation"].select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("nation")
    )
    supp = t["supplier"].join(
        broadcast(supp_nat), F.col("s_nationkey") == F.col("_sn_key")
    ).select("s_suppkey", "nation")
    cost = (
        "CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.6 AS DECIMAL(2,1))"
        " * CAST(l_quantity AS DECIMAL(12,2))"
    )
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
                "l_extendedprice", "l_discount")
        .join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("l_shipdate").alias("o_year"))
        .agg(_money_sum(f"{_REV} - {cost}", "sum_profit"))
    )


def q11_important_parts(
    t, region: str = "EUROPE", fraction: str = "0.001"
) -> DataFrame:
    """TPC-H Q11 (adapted: part "stock value" = revenue shipped by
    one REGION's suppliers, from lineitem instead of partsupp; a
    single nation has too few synthetic suppliers at small SFs). The
    per-part rollup is one partkey shuffle; the grand total is a
    1-row broadcast; the threshold comparison stays in exact decimal
    so the cut is identical cross-engine."""
    reg = t["region"].where(F.col("r_name") == region)
    nat = t["nation"].join(
        broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    supp = t["supplier"].join(
        broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    value = (
        t["lineitem"]
        .join(broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.expr(f"SUM({_REV})").alias("_value"))
    )
    total = value.agg(F.expr("SUM(_value)").alias("_total"))
    return (
        value.join(broadcast(total))
        .where(
            F.expr(f"_value > CAST({fraction} AS DECIMAL(6,4)) * _total")
        )
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.expr("CAST(ROUND(_value, 2) AS DOUBLE)").alias("value"),
        )
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


def q12_shipmode_priority(
    t, date_from: str = "1996-01-01", date_to: str = "1997-01-01"
) -> DataFrame:
    """TPC-H Q12 (adapted: no l_shipmode/commitdate/receiptdate —
    lineitems bucket by ship delay vs the order date instead, keeping
    the shape: join + conditional priority counts per bucket). One
    orderkey shuffle; the priority CASE stays in codegen."""
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    orders = t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.expr(
                "CASE WHEN datediff(l_shipdate, o_orderdate) >= 90 THEN 'SLOW'"
                " WHEN datediff(l_shipdate, o_orderdate) >= 30 THEN 'MEDIUM'"
                " ELSE 'FAST' END"
            ).alias("ship_bucket"),
            "o_orderpriority",
        )
        .groupBy("ship_bucket")
        .agg(
            F.expr(
                "SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
                " THEN 1 ELSE 0 END)"
            ).alias("high_line_count"),
            F.expr(
                "SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')"
                " THEN 1 ELSE 0 END)"
            ).alias("low_line_count"),
        )
    )


def q17_small_quantity_revenue(t, brand: str = "Brand#3") -> DataFrame:
    """TPC-H Q17: revenue from small-quantity orders of one brand's
    parts. The per-part quantity average is re-expressed as the exact
    integer cross-multiplication 5·qty·cnt < sum_qty (inputs are
    2-decimal, so scaled sums are exact) — no float average, no
    cross-engine rounding. Per-part stats join back as a broadcast
    (one brand ≈ 1/25 of parts)."""
    part = t["part"].where(F.col("p_brand") == brand).select("p_partkey")
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
    branded = li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    # scale through DECIMAL, not double*100 (double CAST truncates in
    # Spark but rounds in DuckDB — DECIMAL makes the scaling exact)
    qty100 = "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"
    stats = branded.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.expr(f"SUM({qty100})").alias("_sum_qty100"),
        F.count("*").alias("_cnt"),
    )
    return (
        branded.join(broadcast(stats), F.col("p_partkey") == F.col("_pk"))
        .where(F.expr(f"5 * {qty100} * _cnt < _sum_qty100"))
        .agg(
            _money_sum(_PRICE, "total_price"),
            F.count("*").alias("n_items"),
        )
    )


def q19_discounted_revenue(t) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity predicates — the
    OR-of-ANDs stays a single codegen'd filter over one broadcast
    part join; no plan branching."""
    li = t["lineitem"].select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = t["part"].select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 5))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        li.join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(_money_sum(_REV, "revenue"))
    )


def q20_excess_shippers(
    t,
    region: str = "EUROPE",
    name_like: str = "small%",
    min_qty: int = 30,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q20 (adapted: no partsupp.availqty — a supplier
    qualifies by shipping more than ``min_qty`` units of any matching
    part in the window; same nested semi-join shape). The (supp,
    part) rollup shuffles once; the qualifying supplier set is a
    broadcast semi-join into the supplier dim."""
    part = t["part"].where(F.col("p_name").like(name_like)).select("p_partkey")
    shipped = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(12,2)))").alias("_qty"))
        .where(F.col("_qty") > min_qty)
        .select("l_suppkey")
        .distinct()
    )
    reg = t["region"].where(F.col("r_name") == region)
    nat = t["nation"].join(
        broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    return (
        t["supplier"]
        .join(broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(shipped), F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q21_waiting_suppliers(
    t, region: str = "EUROPE", late_days: int = 60, k: int = 20
) -> DataFrame:
    """TPC-H Q21 (adapted: "late" = shipped > ``late_days`` after the
    order date, replacing receipt/commit dates). A supplier waits an
    order if it was the ONLY late supplier in a multi-supplier 'F'
    order — the exists/not-exists pair becomes one per-(order,supp)
    rollup plus per-order totals as a WINDOW over orderkey (an
    order's supplier list is tiny, so the window sort is cheap and
    replaces the groupBy+join-back's extra shuffle + join of the big
    side)."""
    from pyspark.sql.window import Window
    orders = t["orders"].where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    per_os = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
                ).cast("int")
            ).alias("_late")
        )
    )
    w = Window.partitionBy("o_orderkey")
    waiting = (
        per_os.select(
            "o_orderkey",
            "l_suppkey",
            "_late",
            F.count("*").over(w).alias("_n_supp"),
            F.sum("_late").over(w).alias("_n_late"),
        )
        .where(
            (F.col("_late") == 1) & (F.col("_n_supp") > 1) & (F.col("_n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    reg = t["region"].where(F.col("r_name") == region)
    nat = t["nation"].join(
        broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    supp = t["supplier"].join(
        broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        waiting.join(broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(k)
    )


def q22_global_sales_opportunity(t, cutoff: str = "2000-01-01") -> DataFrame:
    """TPC-H Q22 (adapted: the phone country code becomes
    c_nationkey, and "never ordered" becomes "no orders since
    ``cutoff``" — every synthetic customer has at least one lifetime
    order). Same positive-balance-above-average + anti-join shape.
    The average threshold is an exact cross-multiplication
    (bal·cnt > sum), the stats row broadcasts, and the anti-join on
    custkey is the only shuffle."""
    cust = t["customer"].select(
        "c_custkey", "c_nationkey",
        F.expr("CAST(c_acctbal AS DECIMAL(12,2))").alias("_bal"),
    )
    stats = cust.where(F.col("_bal") > 0).agg(
        F.expr("SUM(_bal)").alias("_sum_bal"), F.count("*").alias("_cnt")
    )
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(broadcast(stats))
        .where(F.expr("_bal * _cnt > _sum_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "leftanti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.expr("CAST(ROUND(SUM(_bal), 2) AS DOUBLE)").alias("totacctbal"),
        )
    )


def supplier_cooccurrence(t, max_suppliers_per_part: int = 50) -> DataFrame:
    """Supplier co-occurrence: pairs of suppliers shipping ≥1 common
    part, with the shared-part count — the item-item co-occurrence
    shape (recommendations, substitution analysis). The pair
    explosion is bounded the same way the n-gram postings join is:
    parts with more than ``max_suppliers_per_part`` distinct
    suppliers are dropped (a part shipped by everyone carries no
    signal and would emit k² pairs), so per-part work is ≤ cap²."""
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    width = pairs.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.count("*").alias("_w")
    ).where(F.col("_w") <= max_suppliers_per_part)
    bounded = pairs.join(
        broadcast(width), F.col("l_partkey") == F.col("_pk")
    ).select("l_partkey", "l_suppkey")
    a = bounded.alias("a")
    b = bounded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("supp_a"),
            F.col("b.l_suppkey").alias("supp_b"),
        )
        .agg(F.count("*").alias("shared_parts"))
    )


def yoy_growth(t) -> DataFrame:
    """Year-over-year order revenue per nation: (n_name, o_year,
    revenue, prev_revenue, yoy_growth). Revenue is DECIMAL-exact;
    growth is one deterministic double division of two exact decimals
    (NULL for each nation's first year).

    Plan: orders joined to broadcast customer→nation dims, one
    partial-agg shuffle on (nation, year), then a lag window over the
    tiny (nation × year) rollup — the window never sees fact rows.
    """
    from pyspark.sql.window import Window

    customer, nation = t["customer"], t["nation"]
    dim = customer.join(
        nation, customer["c_nationkey"] == nation["n_nationkey"]
    ).select(F.col("c_custkey").alias("o_custkey"), "n_name")
    rev = (
        t["orders"]
        .select(
            "o_custkey",
            F.year("o_orderdate").alias("o_year"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .join(F.broadcast(dim), "o_custkey")
        .groupBy("n_name", "o_year")
        .agg(F.sum("price").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("o_year")
    prev = F.lag("revenue").over(w)
    return rev.select(
        "n_name",
        "o_year",
        F.col("revenue").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        F.round(
            (F.col("revenue") - prev).cast("double") / prev.cast("double"), 6
        ).alias("yoy_growth"),
    )


def data_skew_report(t) -> DataFrame:
    """Join-key skew diagnostics over lineitem → one row per join key
    (key_name, n_rows, n_keys, max_width, top_share, avg_width): the
    pre-flight a 100 TB join runs BEFORE choosing a strategy — a
    top_share near 1/shuffle-partitions means one reducer absorbs a
    partition's worth of a single key (→ salt it or let AQE split it),
    and avg_width sizes the expected per-key group.

    One scan unpivots the three join keys (narrow stack explode),
    then two map-side-combinable rollups. All counts are integers;
    the shares are single IEEE divisions — bit-identical across
    engines."""
    li = t["lineitem"].select(
        F.expr(
            "stack(3, 'l_orderkey', l_orderkey, "
            "'l_partkey', l_partkey, 'l_suppkey', l_suppkey) "
            "AS (key_name, key_value)"
        )
    )
    widths = li.groupBy("key_name", "key_value").agg(
        F.count("*").alias("w")
    )
    return widths.groupBy("key_name").agg(
        F.sum("w").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("w").cast("bigint").alias("max_width"),
        F.round(F.max("w") / F.sum("w"), 6).alias("top_share"),
        F.round(F.sum("w") / F.count("*"), 6).alias("avg_width"),
    )


def join_cardinality_report(t) -> DataFrame:
    """Pre-join cardinality forecast → one row per candidate join
    (join_name, n_keys, est_rows, max_key_rows): the EXACT output
    size Σ w_left(k)·w_right(k) computed from per-key width rollups —
    without running the join itself.

    At 100 TB this is how you decide a join strategy before paying
    for it: est_rows >> max(inputs) reveals a fan-out join that will
    explode (and max_key_rows shows whether one hot key causes it —
    the salt-or-AQE signal). The width tables are key-cardinality
    sized (orders smaller than the fact table) so the forecast costs
    two map-side-combinable rollups + a key-table join per
    candidate."""
    specs = [
        ("lineitem_x_orders", t["lineitem"], "l_orderkey",
         t["orders"], "o_orderkey"),
        ("lineitem_x_part", t["lineitem"], "l_partkey",
         t["part"], "p_partkey"),
        ("lineitem_x_supplier", t["lineitem"], "l_suppkey",
         t["supplier"], "s_suppkey"),
        ("orders_x_customer", t["orders"], "o_custkey",
         t["customer"], "c_custkey"),
    ]
    outs = []
    for name, left, lk, right, rk in specs:
        wa = left.groupBy(F.col(lk).alias("k")).agg(
            F.count("*").alias("wa")
        )
        wb = right.groupBy(F.col(rk).alias("k")).agg(
            F.count("*").alias("wb")
        )
        j = wa.join(wb, "k").select(
            (F.col("wa") * F.col("wb")).alias("prod")
        )
        outs.append(
            j.agg(
                F.count("*").cast("bigint").alias("n_keys"),
                F.sum("prod").cast("bigint").alias("est_rows"),
                F.max("prod").cast("bigint").alias("max_key_rows"),
            ).select(F.lit(name).alias("join_name"), "*")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def ship_latency(t) -> DataFrame:
    """Order-to-ship latency per order priority → (o_orderpriority,
    n_items, min_days, max_days, avg_days): the fulfillment-SLA
    rollup (which priority class actually ships faster, and by how
    much).

    Latency is integer epoch-day arithmetic (floor(epoch/86400)
    per side) — never engine-local date subtraction, whose
    timezone/rounding semantics differ. One orderkey equi-join
    shuffle (the q3/q10 plan shape), then a tiny priority rollup
    with exact integer sums."""
    li = t["lineitem"].select(
        "l_orderkey",
        F.expr("unix_timestamp(l_shipdate) div 86400").alias("ship_day"),
    )
    o = t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("order_day"),
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        (F.col("ship_day") - F.col("order_day")).alias("days"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.min("days").cast("bigint").alias("min_days"),
        F.max("days").cast("bigint").alias("max_days"),
        F.round(F.sum("days") / F.count("*"), 6).alias("avg_days"),
    )


def pricing_cube(t) -> DataFrame:
    """CUBE over (returnflag, linestatus) → all four grouping-set
    combinations (detail, each single-axis rollup, grand total) in
    ONE aggregation pass — the OLAP companion to events_rollup's
    ROLLUP. NULL group keys are rendered as 'ALL' so the output is
    join- and oracle-friendly (bare NULL grouping keys are
    ambiguous with genuinely-null data at 100 TB).

    Money is the decimal-exact q1 pattern; Spark computes the cube
    with map-side partial aggregation — one shuffle, four result
    granularities."""
    li = t["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            _money_sum("CAST(l_quantity AS DECIMAL(12,2))", "sum_qty"),
            _money_sum(f"{_PRICE} * ({_ONE} - {_DISC})", "revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
            "revenue",
        )
    )


def monthly_trend(t) -> DataFrame:
    """Monthly revenue trend → (month, revenue, prev_revenue,
    mom_delta): the decimal-exact month-over-month report (lag over
    the tiny month rollup; the big table is scanned once). Month keys
    are integer epoch-month math rendered once."""
    from pyspark.sql.window import Window

    li = t["lineitem"].select(
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        F.expr(f"{_REV}").alias("_rev"),
    )
    m = li.groupBy("month").agg(
        F.expr("CAST(ROUND(SUM(_rev), 2) AS DOUBLE)").alias("revenue")
    )
    w = Window.orderBy("month")
    return m.select(
        "month",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias(
            "mom_delta"
        ),
    )


def cohort_ltv(t) -> DataFrame:
    """Customer-cohort lifetime value → (cohort_year, age_years,
    n_customers, revenue, cum_revenue_per_customer): revenue of each
    first-order-year cohort by order age, cumulated per customer —
    the money-side cohort matrix (events_cohorts is the activity-side
    twin). Answers "do newer cohorts monetize faster".

    DECIMAL-exact money; the cumulative divide is one double division
    of exact decimals per (cohort, age) cell. Two shuffles on
    o_custkey (first-order rollup, then the fact join reuses it) +
    a window over the tiny cohort×age rollup."""
    from pyspark.sql.window import Window

    orders = t["orders"].select(
        "o_custkey",
        F.year("o_orderdate").alias("o_year"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    first = orders.groupBy("o_custkey").agg(
        F.min("o_year").alias("cohort_year")
    )
    sizes = first.groupBy("cohort_year").agg(
        F.count("*").alias("n_customers")
    )
    cells = (
        orders.join(first, "o_custkey")
        .groupBy("cohort_year", (F.col("o_year") - F.col("cohort_year")).alias("age_years"))
        .agg(F.sum("price").alias("revenue"))
    )
    w = (
        Window.partitionBy("cohort_year")
        .orderBy("age_years")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_year")
        .select(
            "cohort_year",
            F.col("age_years").cast("int").alias("age_years"),
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.col("revenue").cast("decimal(28,2)").alias("revenue"),
            # exact decimal running sum → ONE double division (cast
            # both operands first: decimal/bigint division promotes
            # differently across engines)
            F.round(
                F.sum(F.col("revenue").cast("decimal(28,2)"))
                .over(w)
                .cast("double")
                / F.col("n_customers").cast("double"),
                2,
            ).alias("cum_revenue_per_customer"),
        )
    )


def supplier_scorecard(t, late_days: int = 60, min_lines: int = 5) -> DataFrame:
    """Supplier reliability scorecard → (s_name, n_lines, n_late,
    late_rate, n_returned, return_rate, avg_delay_days): late- and
    return-rates per supplier (late = shipped more than ``late_days``
    after the order date; the marketplace seller-quality staple, and
    the per-supplier drill-down of q12's delay buckets / q21's
    late-supplier filter).

    Rates are one double division of exact BIGINT counts; the delay
    average is integer epoch-day arithmetic (the orders_ship_latency
    portability rule). One orderkey shuffle joins the two fact
    tables; the supplier dim broadcasts onto the rollup."""
    li = t["lineitem"].select(
        "l_orderkey",
        "l_suppkey",
        "l_returnflag",
        F.col("l_shipdate").cast("date").alias("ship_d"),
    )
    orders = t["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderdate").cast("date").alias("order_d"),
    )
    delay = F.datediff("ship_d", "order_d")
    rolled = (
        li.join(orders, "l_orderkey")
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(delay > late_days, 1).otherwise(0)).alias("n_late"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("n_returned"),
            F.sum(delay.cast("bigint")).alias("delay_sum"),
        )
        .where(F.col("n_lines") >= min_lines)
    )
    sup = t["supplier"].select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    return rolled.join(F.broadcast(sup), "l_suppkey").select(
        "s_name",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_late").cast("bigint").alias("n_late"),
        F.round(
            F.col("n_late").cast("double") / F.col("n_lines").cast("double"), 6
        ).alias("late_rate"),
        F.col("n_returned").cast("bigint").alias("n_returned"),
        F.round(
            F.col("n_returned").cast("double") / F.col("n_lines").cast("double"),
            6,
        ).alias("return_rate"),
        F.round(
            F.col("delay_sum").cast("double") / F.col("n_lines").cast("double"),
            4,
        ).alias("avg_delay_days"),
    )


def nation_supplier_hhi(t) -> DataFrame:
    """Supplier market concentration per nation → (nation,
    n_suppliers, revenue, hhi, equiv_suppliers): the
    Herfindahl-Hirschman index Σ share_i² over each nation's supplier
    revenue shares — the procurement-risk readout (hhi → 1 means one
    supplier owns the nation's volume; equiv_suppliers = 1/hhi is the
    "effective number of suppliers").

    Determinism: per-supplier revenue is rounded to exact DECIMAL
    cents FIRST, squares and sums stay in exact decimal (the square
    multiplies DECIMAL(18,2) by DECIMAL(19,2): 18+19+1 = exactly
    Spark's 38-digit cap so no precision truncation, and the 19-width
    side forces DuckDB onto hugeint storage instead of an overflowing
    int64 multiply), and the only floating-point ops
    are two exact-decimal→double casts, one multiply, one divide, one
    round — a fixed IEEE expression tree, never an engine-ordered
    double sum.

    Scale: one suppkey rollup (map-side combined), one broadcast dim
    join, one nation rollup. Never wider than the supplier table.
    """
    li = t["lineitem"]
    per_supp = li.groupBy("l_suppkey").agg(
        F.expr("CAST(ROUND(SUM(" + _REV + "), 2) AS DECIMAL(18,2))").alias(
            "r"
        )
    )
    sup = t["supplier"].select("s_suppkey", "s_nationkey")
    nat = t["nation"].select("n_nationkey", "n_name")
    joined = (
        per_supp.join(
            broadcast(sup), per_supp["l_suppkey"] == sup["s_suppkey"]
        )
        .join(broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .select(F.col("n_name").alias("nation"), "r")
    )
    agg = joined.groupBy("nation").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.expr("CAST(SUM(r) AS DOUBLE)").alias("_total"),
        F.expr(
            "CAST(SUM(CAST(r AS DECIMAL(18,2)) * CAST(r AS DECIMAL(19,2)))"
            " AS DOUBLE)"
        ).alias("_sumsq"),
    )
    hhi = F.round(F.col("_sumsq") / (F.col("_total") * F.col("_total")), 6)
    return agg.select(
        "nation",
        "n_suppliers",
        F.round("_total", 2).alias("revenue"),
        hhi.alias("hhi"),
        F.round(F.lit(1.0) / hhi, 2).alias("equiv_suppliers"),
    )
