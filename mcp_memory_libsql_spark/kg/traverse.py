"""Graph traversal / structure ops (implied by the reference's
"Explore entity relationships" surface, README.md:109).

Scale: degree is one shuffle on entity name with map-side partial
aggregation; n-hop traversal from a small seed set is a chain of
broadcast joins (frontier stays small), so the big relations table
never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast


def degree(relations: DataFrame) -> DataFrame:
    """(name, out_degree, in_degree, degree) per entity appearing in
    any relation."""
    out_d = relations.groupBy(F.col("source").alias("name")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = relations.groupBy(F.col("target").alias("name")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "name", "full_outer")
        .select(
            "name",
            F.coalesce("out_degree", F.lit(0)).cast("bigint").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).cast("bigint").alias("in_degree"),
        )
        .withColumn(
            "degree", (F.col("out_degree") + F.col("in_degree")).cast("bigint")
        )
    )


def neighbors(relations: DataFrame, seeds: DataFrame) -> DataFrame:
    """Directed 1-hop neighborhood of a seed name set → (name,)."""
    s = broadcast(seeds.select("name").distinct())
    fwd = relations.join(s, relations["source"] == s["name"], "leftsemi").select(
        F.col("target").alias("name")
    )
    bwd = relations.join(s, relations["target"] == s["name"], "leftsemi").select(
        F.col("source").alias("name")
    )
    return fwd.unionByName(bwd).distinct()


def neighbors_n_hop(
    relations: DataFrame, seeds: DataFrame, hops: int
) -> DataFrame:
    """Entities reachable (undirected) within ``hops`` hops, seeds
    excluded. Frontier-expansion via repeated broadcast joins —
    fine for the small-seed case the reference serves; a full BFS at
    cluster scale would checkpoint the frontier per hop."""
    frontier = seeds.select("name").distinct()
    seen = frontier
    for _ in range(hops):
        frontier = neighbors(relations, frontier).join(
            broadcast(seen), "name", "left_anti"
        )
        seen = seen.unionByName(frontier).distinct()
    return seen.join(seeds.select("name").distinct(), "name", "left_anti")


def entity_type_counts(entities: DataFrame) -> DataFrame:
    return entities.groupBy("entity_type").agg(
        F.count("*").cast("bigint").alias("n_entities"),
        F.min("created_at").alias("oldest"),
        F.max("created_at").alias("newest"),
    )
