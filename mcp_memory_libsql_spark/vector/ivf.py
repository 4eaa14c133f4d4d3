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
        # persist each iterate (≤K rows): the loop-carried cents is
        # otherwise re-planned — full assign pass included — once per
        # downstream consumer AND once per later iteration, the same
        # multiplicative re-plan the exact path (pq_codes_exact) already
        # cuts with its per-round localCheckpoint
        cents = (
            assigned.groupBy("cell")
            .agg(*aggs)
            .select(
                "cell",
                F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("centroid"),
            )
            .persist()
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


def _int_means(assigned: DataFrame) -> DataFrame:
    """(cell, q array<bigint>) — per-cell integer centroid:
    floor(Σq_i / n) per position. Integer sums are order-independent
    and map-side combinable; Σ|q| < 2⁵³ keeps the double quotient
    exact, so FLOOR matches DuckDB bit-for-bit (the vec_kmeans
    argument, reference mcp_memory_libsql_spark/vector/kmeans.py)."""
    return (
        assigned.select("cell", F.posexplode("q").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(
            F.expr(
                "CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT)"
            ).alias("c")
        )
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("cell", F.expr("transform(pc, x -> x.c)").alias("q"))
    )


def _assign_exact(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, label, q, cell, dist) — exact-integer nearest-cell
    assignment: broadcast k·dim BIGINT centroids, min(struct) argmin
    with (dist, cell) tiebreak ≡ ROW_NUMBER() ORDER BY dist, cell."""
    from .kmeans import DIST_EXPR

    d = q.crossJoin(
        broadcast(cents.select("cell", F.col("q").alias("c")))
    ).select("vec_id", "label", "q", "cell", F.expr(DIST_EXPR).alias("dist"))
    return (
        d.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cell", "label", "q")).alias("s"))
        .select(
            "vec_id",
            F.col("s.label").alias("label"),
            F.col("s.q").alias("q"),
            F.col("s.cell").alias("cell"),
            F.col("s.dist").alias("dist"),
        )
    )


def ivf_cells_exact(
    embeddings: DataFrame, refine_steps: int = 2, scale: int = 1 << 20
) -> DataFrame:
    """The IVF coarse quantizer itself as an ORACLE-VERIFIED surface:
    label-seeded centroids + ``refine_steps`` Lloyd rounds over
    scaled-BIGINT components → (vec_id, label, cell, dist_q,
    cell_size). Same cross-engine-determinism recipe as vec_kmeans
    (quantize once → every distance/mean is exact integer math), so
    the cell ASSIGNMENT — the part of vec_ivf_ann that decides what a
    probe scans — hash-matches a DuckDB CTE unroll; only the serving
    top-k stays rows-only. At scale this is the partition layout of
    the ANN table (write partitioned by cell), so verifying it
    exactly verifies the data placement. `label` rides along so the
    output shows which vectors the geometry moved OUT of their seed
    cell (cell <> label)."""
    q = embeddings.select(
        "vec_id",
        "label",
        F.expr(
            f"transform(embedding, v -> "
            f"CAST(FLOOR(CAST(v AS DOUBLE) * {scale} + 0.5) AS BIGINT))"
        ).alias("q"),
    ).localCheckpoint(eager=True)
    cents = _int_means(q.select(F.col("label").alias("cell"), "q"))
    for _ in range(refine_steps):
        a = _assign_exact(q, cents)
        newc = _int_means(a.select("cell", "q")).withColumnRenamed("q", "qn")
        # an emptied cell keeps its previous centroid (COALESCE in
        # both engines) — same convention as vec_kmeans
        cents = (
            cents.join(newc, "cell", "left")
            .select("cell", F.coalesce("qn", "q").alias("q"))
            .localCheckpoint(eager=True)
        )
    final = _assign_exact(q, cents).select(
        "vec_id", "label", "cell", F.col("dist").alias("dist_q")
    )
    sizes = final.groupBy("cell").agg(F.count("*").alias("cell_size"))
    return final.join(broadcast(sizes), "cell").select(
        "vec_id", "label", "cell", "dist_q", "cell_size"
    )
