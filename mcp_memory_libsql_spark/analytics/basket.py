"""Market-basket association rules over order baskets —
support / confidence / lift for part pairs co-purchased in one order
(the directional-rule extension of the symmetric
``supplier_cooccurrence`` pair counts).

Scale notes: baskets are naturally bounded (an order has at most a
handful of lineitems), so the per-basket pair explosion is O(1) per
order and the whole computation is two shuffles — one to the basket
key to build the in-row item list, one on the pair key to count.
The basket count and per-item counts are broadcast back; the big
table never joins itself. All rule metrics are exact rationals of
counts (portable across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..textops.tokenize import pair_combos


def association_rules(lineitem: DataFrame, min_pair: int = 3) -> DataFrame:
    """Directional rules a→b with co-occurrence ≥ ``min_pair`` →
    (antecedent, consequent, pair_n, n_a, n_b, support, confidence,
    lift)."""
    baskets = lineitem.select("l_orderkey", "l_partkey").distinct()
    item_cnt = baskets.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count("*").alias("cnt")
    )
    n_baskets = baskets.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    lists = baskets.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("ids")
    )
    combos = pair_combos("ids")
    und = (
        lists.select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("pair_n"))
        .where(F.col("pair_n") >= min_pair)
    )
    directed = und.unionByName(
        und.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "pair_n"
        )
    )
    ca = item_cnt.select(F.col("item").alias("a"), F.col("cnt").alias("n_a"))
    cb = item_cnt.select(F.col("item").alias("b"), F.col("cnt").alias("n_b"))
    return (
        directed.join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            "pair_n",
            "n_a",
            "n_b",
            F.round(F.col("pair_n") / F.col("n_baskets"), 6).alias("support"),
            F.round(F.col("pair_n") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                F.col("pair_n") * F.col("n_baskets")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


def rfm_segments(orders: DataFrame) -> DataFrame:
    """RFM customer segmentation → (o_custkey, recency_days,
    frequency, monetary, r_score, f_score, m_score, rfm_cell).

    Recency is days from the customer's last order to the corpus max
    date (1-row broadcast, the q11/q15 scalar pattern); monetary is
    decimal-exact; the three ntile(5) windows run over the per-customer
    rollup with UNIQUE (metric, custkey) orderings so scores are
    deterministic. Higher score = better (more recent / more
    frequent / higher spend)."""
    from pyspark.sql.window import Window

    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
        ).cast("double").alias("monetary"),
    )
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    scored = per_cust.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days",
        F.datediff(F.col("ref_date"), F.col("last_order")).cast("bigint"),
    )
    w_r = Window.orderBy(F.desc("recency_days"), "o_custkey")
    w_f = Window.orderBy("frequency", "o_custkey")
    w_m = Window.orderBy("monetary", "o_custkey")
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5).over(w_r).alias("r_score"),
        F.ntile(5).over(w_f).alias("f_score"),
        F.ntile(5).over(w_m).alias("m_score"),
    ).withColumn(
        "rfm_cell",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("integer"),
    )


def revenue_pareto(lineitem: DataFrame) -> DataFrame:
    """Revenue concentration (the 80/20 readout) → (l_partkey,
    revenue, share, cum_share, revenue_rank) over exact-decimal
    per-part revenue.

    The window runs over the per-part rollup (|parts| rows, not the
    fact table) with a UNIQUE (revenue DESC, partkey) ordering; the
    cumulative sum stays DECIMAL until the final share division, so
    cum_share is exact-input double math on both engines. The grand
    total is a 1-row broadcast."""
    from pyspark.sql.window import Window

    from .tpch import _REV  # one definition of decimal-exact revenue

    per_part = lineitem.groupBy("l_partkey").agg(
        F.expr(f"SUM({_REV})").alias("_rev")
    )
    total = per_part.agg(F.sum("_rev").alias("_total"))
    w = (
        Window.orderBy(F.desc("_rev"), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.orderBy(F.desc("_rev"), "l_partkey")
    return (
        per_part.withColumn("_cum", F.sum("_rev").over(w))
        .withColumn("revenue_rank", F.row_number().over(wr))
        .crossJoin(F.broadcast(total))
        .select(
            "l_partkey",
            F.round("_rev", 2).cast("double").alias("revenue"),
            F.round(
                F.col("_rev").cast("double") / F.col("_total").cast("double"), 6
            ).alias("share"),
            F.round(
                F.col("_cum").cast("double") / F.col("_total").cast("double"), 6
            ).alias("cum_share"),
            "revenue_rank",
        )
    )
