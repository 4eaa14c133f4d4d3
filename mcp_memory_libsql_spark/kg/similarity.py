"""Entity similarity over the knowledge graph — neighbor-overlap
Jaccard via an inverted neighbor index (the graph analog of the
n-gram postings dedup in ``textops/dedup.py``).

Implied by the reference's "Explore entity relationships" surface
(README.md:109): "which entities look alike" is the link-prediction /
recommendation question over the same relations table the traversal
ops read.

Scale notes: the neighbor postings table shuffles ONCE on the
neighbor name; hub neighbors (a nation every customer links to, a
part everyone buys) are dropped by the postings cap, which is what
bounds the pair explosion — sum over neighbors of C(|postings|, 2)
with |postings| ≤ cap, the same skew bound DF_CAP provides for
shingles. Pairs never materialize as an entity×entity cross product.
Jaccard is computed over the capped index (sizes from surviving
postings), so scores are exact w.r.t. the hub-suppressed graph —
the standard co-occurrence-mining semantics, mirrored exactly by the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Drop neighbors with more incident entities than this: a hub neighbor
# contributes C(width, 2) candidate pairs, so the cap is the skew /
# output bound (and hubs carry no similarity signal anyway).
NEIGHBOR_CAP = 256


def undirected_neighbors(relations: DataFrame) -> DataFrame:
    """(name, nbr) — symmetric closure of the relation edges,
    relation types collapsed, self-loops dropped."""
    fwd = relations.select(F.col("source").alias("name"), F.col("target").alias("nbr"))
    bwd = relations.select(F.col("target").alias("name"), F.col("source").alias("nbr"))
    return fwd.unionByName(bwd).where(F.col("name") != F.col("nbr")).distinct()


def similar_entities(
    relations: DataFrame,
    threshold: float = 0.2,
    cap: int = NEIGHBOR_CAP,
) -> DataFrame:
    """Entity pairs with neighbor-set Jaccard ≥ threshold →
    (entity_a, entity_b, inter_size, size_a, size_b, jaccard),
    entity_a < entity_b.

    One shuffle builds the per-neighbor postings list; pairs are
    in-row explosions of each list (no second shuffle of the edge
    table); per-entity sizes reuse the persisted postings.
    """
    und = undirected_neighbors(relations)
    postings = (
        und.groupBy("nbr")
        .agg(F.sort_array(F.collect_list("name")).alias("ids"))
        .where(F.size("ids") <= cap)
        .persist()
    )
    sizes = (
        postings.select(F.explode("ids").alias("name"))
        .groupBy("name")
        .agg(F.count("*").alias("sz"))
    )
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        postings.select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.a").alias("entity_a"), F.col("p.b").alias("entity_b"))
        .agg(F.count("*").alias("inter_size"))
    )
    sa = sizes.select(F.col("name").alias("entity_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("name").alias("entity_b"), F.col("sz").alias("size_b"))
    scored = (
        pairs.join(sa, "entity_a")
        .join(sb, "entity_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter_size")
                / (F.col("size_a") + F.col("size_b") - F.col("inter_size")),
                6,
            ),
        )
    )
    return scored.where(F.col("jaccard") >= threshold).select(
        "entity_a", "entity_b", "inter_size", "size_a", "size_b", "jaccard"
    )
