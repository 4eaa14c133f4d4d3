"""IVF-style ANN: coarse quantization → probe nearest cells only.

The second scale path for similarity search (complement of
``lsh.py``): build K coarse centroids, assign every vector to its
nearest centroid ("cell"), and at query time rescore exactly only the
vectors in the ``n_probe`` cells nearest the query. At 100 TB the
assigned table is written partitioned by cell, so a query scans
``n_probe/K`` of the data (partition pruning), and the centroid set
(K × dim doubles) broadcasts everywhere.

Centroids are seeded from the ``label`` column, then refined with
``refine_steps`` Lloyd iterations (assign → mean-per-cell), so the
cells are learned from geometry, not just label structure;
everything is deterministic and JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from .similarity import cosine


def _sq_dist(a, b):
    d = F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def label_centroids(embeddings: DataFrame, dim: int) -> DataFrame:
    """(cell, centroid array<double>) — label means as coarse seeds."""
    aggs = [
        F.avg(F.col("embedding")[i].cast("double")).alias(f"c{i}")
        for i in range(dim)
    ]
    per_label = embeddings.groupBy(F.col("label").alias("cell")).agg(*aggs)
    return per_label.select(
        "cell", F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("centroid")
    )


def assign_cells(embeddings: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, label, embedding, cell) — nearest-centroid assignment.

    Broadcast cross join scores N·K rows, then ``min_by`` picks the
    nearest cell per vector: a hash aggregation with map-side partial
    combine, so the shuffle carries ~N rows — unlike a row_number
    window, which would shuffle and sort all N·K scored rows.
    Deterministic tiebreak via the (dist, cell) struct ordering."""
    scored = embeddings.crossJoin(broadcast(cents)).select(
        "vec_id",
        "label",
        "embedding",
        "cell",
        _sq_dist(F.col("embedding"), F.col("centroid")).alias("dist"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("label", "embedding", "cell"),
                F.struct("dist", "cell"),
            ).alias("_best")
        )
        .select("vec_id", "_best.label", "_best.embedding", "_best.cell")
    )


def kmeans_refine(
    embeddings: DataFrame, cents: DataFrame, dim: int, steps: int = 1
) -> DataFrame:
    """Lloyd refinement: reassign to nearest centroid, recompute cell
    means. Each step is one broadcast-scored pass + one partial-agg
    shuffle; empty cells drop out (fewer, tighter cells)."""
    for _ in range(steps):
        assigned = assign_cells(embeddings, cents)
        aggs = [
            F.avg(F.col("embedding")[i].cast("double")).alias(f"c{i}")
            for i in range(dim)
        ]
        cents = (
            assigned.groupBy("cell")
            .agg(*aggs)
            .select(
                "cell",
                F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("centroid"),
            )
        )
    return cents


def ivf_ann(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dim: int = 64,
    n_probe: int = 3,
    refine_steps: int = 1,
    cents: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k cosine via IVF probing
    → (vec_id, label, cosine_sim). Pass ``cents`` ((cell, centroid
    array<double>)) to serve against an EXTERNALLY trained coarse
    quantizer — e.g. the integer-exact Lloyd centroids of
    vector.kmeans (dequantized) — instead of the label-seeded cells;
    the serve path is identical either way."""
    if cents is None:
        cents = label_centroids(embeddings, dim)
        if refine_steps:
            cents = kmeans_refine(embeddings, cents, dim, refine_steps)
    assigned = assign_cells(embeddings, cents)

    q = broadcast(
        embeddings.where(F.col("vec_id") == query_vec_id).select(
            F.col("embedding").alias("q_embedding")
        )
    )
    probe_cells = broadcast(
        cents.crossJoin(q)
        .select(
            "cell", _sq_dist(F.col("q_embedding"), F.col("centroid")).alias("d")
        )
        .orderBy("d", "cell")
        .limit(n_probe)
        .select("cell")
    )
    cands = (
        assigned.join(probe_cells, "cell", "leftsemi")
        .where(F.col("vec_id") != query_vec_id)
    )
    scored = cands.crossJoin(q).select(
        "vec_id",
        "label",
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6).alias(
            "cosine_sim"
        ),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col("vec_id")).limit(k)
