"""IVF-style ANN: coarse quantization → probe nearest cells only.

The second scale path for similarity search (complement of
``lsh.py``): build K coarse centroids, assign every vector to its
nearest centroid ("cell"), and at query time rescore exactly only the
vectors in the ``n_probe`` cells nearest the query. At 100 TB the
assigned table is written partitioned by cell, so a query scans
``n_probe/K`` of the data (partition pruning), and the centroid set
(K × dim doubles) broadcasts everywhere.

Centroids here are seeded from the ``label`` column (k-means-lite:
one refinement step of mean-per-current-cell would drop in
unchanged); everything is deterministic and JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from .similarity import cosine


def _sq_dist(a, b):
    d = F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def label_centroids(embeddings: DataFrame, dim: int) -> DataFrame:
    """(cell, centroid array<double>) — label means as coarse cells."""
    aggs = [
        F.avg(F.col("embedding")[i].cast("double")).alias(f"c{i}")
        for i in range(dim)
    ]
    per_label = embeddings.groupBy(F.col("label").alias("cell")).agg(*aggs)
    return per_label.select(
        "cell", F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("centroid")
    )


def assign_cells(embeddings: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, label, embedding, cell) — nearest-centroid assignment
    via broadcast cross join + per-vector rank (K is small)."""
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist"), F.col("cell")
    )
    scored = embeddings.crossJoin(broadcast(cents)).select(
        "vec_id",
        "label",
        "embedding",
        "cell",
        _sq_dist(F.col("embedding"), F.col("centroid")).alias("dist"),
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "dist")
    )


def ivf_ann(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dim: int = 64,
    n_probe: int = 3,
) -> DataFrame:
    """Approximate top-k cosine via IVF probing
    → (vec_id, label, cosine_sim)."""
    cents = label_centroids(embeddings, dim)
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
