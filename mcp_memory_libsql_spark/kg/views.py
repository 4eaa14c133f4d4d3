"""Derive the knowledge-graph tables from the TPC-H star schema.

The reference stores ``entities(name PK, entity_type, created_at)``,
``observations(entity_name, content, created_at)`` and
``relations(source, target, relation_type)``
(src/db/migrations/schema.ts:1-34). The testdata has no such tables,
so we derive them deterministically from the relational tables — a
realistic "entity extraction" batch job. Every expression is a
built-in function (codegen'd, pushdown-friendly) and has an exact
ANSI-SQL equivalent so the DuckDB oracle can verify results.

``created_at`` is a deterministic BIGINT recency surrogate
(class_offset + key) standing in for the reference's insert
timestamp; numeric observation facts are rendered via integer casts
only, so Spark and DuckDB string formatting can never diverge.

Scale notes: entities/observations are narrow projections + unions —
no shuffle at all. Relations derive from FK equi-joins; nation/region
/supplier sides are broadcast, and the distinct() over
(supplier, part) / (customer, part) pairs shuffles on the pair key,
which is the natural partitioning for downstream graph ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

# Recency-surrogate offsets per entity class (keeps names unique and
# ordering deterministic across the union).
OFFSET_REGION = 0
OFFSET_NATION = 100
OFFSET_SUPPLIER = 1_000
OFFSET_CUSTOMER = 10_000
OFFSET_PART = 1_000_000


def _part_name(col):
    return F.concat(F.lit("Part#"), F.col(col).cast("string"))


def entities(t: dict[str, DataFrame]) -> DataFrame:
    """entities(name, entity_type, created_at) — union of 5 classes."""
    r = t["region"].select(
        F.col("r_name").alias("name"),
        F.lit("region").alias("entity_type"),
        (F.col("r_regionkey") + F.lit(OFFSET_REGION)).cast("bigint").alias("created_at"),
    )
    n = t["nation"].select(
        F.col("n_name").alias("name"),
        F.lit("nation").alias("entity_type"),
        (F.col("n_nationkey") + F.lit(OFFSET_NATION)).cast("bigint").alias("created_at"),
    )
    s = t["supplier"].select(
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("entity_type"),
        (F.col("s_suppkey") + F.lit(OFFSET_SUPPLIER)).cast("bigint").alias("created_at"),
    )
    c = t["customer"].select(
        F.col("c_name").alias("name"),
        F.lit("customer").alias("entity_type"),
        (F.col("c_custkey") + F.lit(OFFSET_CUSTOMER)).cast("bigint").alias("created_at"),
    )
    p = t["part"].select(
        _part_name("p_partkey").alias("name"),
        F.lit("part").alias("entity_type"),
        (F.col("p_partkey") + F.lit(OFFSET_PART)).cast("bigint").alias("created_at"),
    )
    return r.unionByName(n).unionByName(s).unionByName(c).unionByName(p)


def _cents(col) -> F.Column:
    """Money as integer cents → string; avoids float formatting skew."""
    return F.round(F.col(col) * 100, 0).cast("bigint").cast("string")


def observations(t: dict[str, DataFrame]) -> DataFrame:
    """observations(entity_name, content, created_at)."""
    cust = t["customer"]
    supp = t["supplier"]
    part = t["part"]
    nat = t["nation"]

    c_created = (F.col("c_custkey") + F.lit(OFFSET_CUSTOMER)).cast("bigint")
    s_created = (F.col("s_suppkey") + F.lit(OFFSET_SUPPLIER)).cast("bigint")
    p_created = (F.col("p_partkey") + F.lit(OFFSET_PART)).cast("bigint")
    n_created = (F.col("n_nationkey") + F.lit(OFFSET_NATION)).cast("bigint")

    rows = [
        cust.select(
            F.col("c_name").alias("entity_name"),
            F.concat(F.lit("segment="), F.col("c_mktsegment")).alias("content"),
            c_created.alias("created_at"),
        ),
        cust.select(
            F.col("c_name").alias("entity_name"),
            F.concat(F.lit("acctbal_cents="), _cents("c_acctbal")).alias("content"),
            c_created.alias("created_at"),
        ),
        supp.select(
            F.col("s_name").alias("entity_name"),
            F.concat(F.lit("acctbal_cents="), _cents("s_acctbal")).alias("content"),
            s_created.alias("created_at"),
        ),
        part.select(
            _part_name("p_partkey").alias("entity_name"),
            F.concat(F.lit("name="), F.col("p_name")).alias("content"),
            p_created.alias("created_at"),
        ),
        part.select(
            _part_name("p_partkey").alias("entity_name"),
            F.concat(F.lit("brand="), F.col("p_brand")).alias("content"),
            p_created.alias("created_at"),
        ),
        part.select(
            _part_name("p_partkey").alias("entity_name"),
            F.concat(F.lit("type="), F.col("p_type")).alias("content"),
            p_created.alias("created_at"),
        ),
        part.select(
            _part_name("p_partkey").alias("entity_name"),
            F.concat(F.lit("size="), F.col("p_size").cast("string")).alias("content"),
            p_created.alias("created_at"),
        ),
        nat.select(
            F.col("n_name").alias("entity_name"),
            F.concat(F.lit("region_key="), F.col("n_regionkey").cast("string")).alias(
                "content"
            ),
            n_created.alias("created_at"),
        ),
    ]
    out = rows[0]
    for df in rows[1:]:
        out = out.unionByName(df)
    return out


def relations(t: dict[str, DataFrame]) -> DataFrame:
    """relations(source, target, relation_type) — FK-derived edges.

    Dimension sides (nation, region, supplier, customer at small SF)
    are broadcast; the big fact-derived edges shuffle on the edge key
    for the distinct(), which is the partitioning downstream graph
    ops reuse.
    """
    cust_nat = (
        t["customer"]
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("c_name").alias("source"),
            F.col("n_name").alias("target"),
            F.lit("LOCATED_IN").alias("relation_type"),
        )
    )
    supp_nat = (
        t["supplier"]
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_name").alias("source"),
            F.col("n_name").alias("target"),
            F.lit("LOCATED_IN").alias("relation_type"),
        )
    )
    nat_reg = (
        t["nation"]
        .join(broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("n_name").alias("source"),
            F.col("r_name").alias("target"),
            F.lit("PART_OF").alias("relation_type"),
        )
    )
    supplies = (
        t["lineitem"]
        .select("l_suppkey", "l_partkey")
        .distinct()
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_name").alias("source"),
            _part_name("l_partkey").alias("target"),
            F.lit("SUPPLIES").alias("relation_type"),
        )
    )
    purchased = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey")
        .join(t["orders"].select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_partkey")
        .distinct()
        .join(broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_name").alias("source"),
            _part_name("l_partkey").alias("target"),
            F.lit("PURCHASED").alias("relation_type"),
        )
    )
    return (
        cust_nat.unionByName(supp_nat)
        .unionByName(nat_reg)
        .unionByName(supplies)
        .unionByName(purchased)
    )


def kg(t: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """All three KG tables."""
    return {
        "entities": entities(t),
        "observations": observations(t),
        "relations": relations(t),
    }
