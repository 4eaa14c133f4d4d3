"""Product-quantization ANN: split each vector into M subspaces,
learn a tiny codebook per subspace, store each vector as M byte-sized
codes, and serve queries with asymmetric distance (exact query
subvector vs quantized database vector).

Why this is the third scale path (after LSH buckets and IVF cells):
PQ attacks STORAGE and SCAN bandwidth, not candidate count — a
64-dim float vector (256 B) becomes M=8 codes (8 B), a 32× shrink,
so the whole "index" fits in memory at sizes where raw vectors
don't. At 100 TB you compose them: IVF cells prune the scan, PQ
codes make each cell cheap to score, exact rescore on the short
list. Everything here is DataFrame algebra: codebooks are
label-seeded + Lloyd-refined per subspace (same recipe as ivf.py),
assignment is a broadcast ``min_by``, and the query-time scorer is
one broadcast LUT join + an M-term sum — no Python in the loop.

Rows-only gate (learned codebooks are engine-specific);
``tests/test_vector.py`` bounds recall against exact kNN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

M_SUB = 8  # subspaces per vector
K_CODES = 16  # codewords per subspace codebook


def _sq_dist(a, b):
    d = F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def subvectors(embeddings: DataFrame, dim: int, m: int = M_SUB) -> DataFrame:
    """(vec_id, label, sub, subvec array<double>) — one row per
    subspace. A single slice-projection + posexplode (narrow)."""
    if dim % m != 0:
        # FAISS errors here too: silently dropping the trailing
        # dim % m dimensions would quietly degrade every ADC distance
        raise ValueError(f"dim ({dim}) must be divisible by m ({m})")
    width = dim // m
    slices = F.array(
        *[
            F.transform(
                F.slice("embedding", i * width + 1, width),
                lambda x: x.cast("double"),
            )
            for i in range(m)
        ]
    )
    return embeddings.select(
        "vec_id", "label", F.posexplode(slices).alias("sub", "subvec")
    )


def train_codebooks(
    embeddings: DataFrame, dim: int, m: int = M_SUB, k: int = K_CODES,
    steps: int = 2,
) -> DataFrame:
    """(sub, code, centroid array<double>) — per-subspace codebooks.
    Seeds: means over label%k groups (deterministic, no RNG); then
    ``steps`` Lloyd iterations. All shuffles are on (sub, code) —
    M·K groups, tiny at any SF."""
    width = dim // m
    sv = subvectors(embeddings, dim, m).withColumn(
        "code", (F.col("label") % k).cast("int")
    )

    def _means(assigned: DataFrame) -> DataFrame:
        aggs = [
            F.avg(F.col("subvec")[i]).alias(f"c{i}") for i in range(width)
        ]
        per = assigned.groupBy("sub", "code").agg(*aggs)
        return per.select(
            "sub",
            "code",
            F.array(*[F.col(f"c{i}") for i in range(width)]).alias("centroid"),
        )

    # persist each iterate (m·k rows): the loop-carried books is
    # otherwise re-planned — the (vec_id, sub) assignment shuffle
    # included — once per later iteration and once per downstream
    # consumer (ann_ivfpq reads the final books twice); the exact
    # path (pq_codes_exact) already cuts this with per-round
    # localCheckpoints
    books = _means(sv).persist()
    for _ in range(steps):
        assigned = _assign(sv.select("vec_id", "sub", "subvec"), books)
        books = _means(assigned).persist()
    return books


def _assign(sv: DataFrame, books: DataFrame) -> DataFrame:
    """Nearest codeword per (vec_id, sub) via broadcast + min_by."""
    scored = sv.join(broadcast(books), "sub").select(
        "vec_id",
        "sub",
        "subvec",
        "code",
        _sq_dist(F.col("subvec"), F.col("centroid")).alias("dist"),
    )
    return (
        scored.groupBy("vec_id", "sub")
        .agg(
            F.min_by(
                F.struct("subvec", "code"), F.struct("dist", "code")
            ).alias("_best")
        )
        .select("vec_id", "sub", "_best.subvec", "_best.code")
    )


def encode(embeddings: DataFrame, books: DataFrame, dim: int, m: int = M_SUB) -> DataFrame:
    """(vec_id, codes array<int>) — the 32×-compressed index."""
    assigned = _assign(
        subvectors(embeddings, dim, m).select("vec_id", "sub", "subvec"), books
    )
    return (
        assigned.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("_sc"))
        .select("vec_id", F.expr("transform(_sc, x -> x.code)").alias("codes"))
    )


def _sub_int_means(assigned: DataFrame) -> DataFrame:
    """(sub, code, c array<bigint>) — per-(subspace, codeword) integer
    centroid: floor(Σq_i / n) per position (the ivf._int_means recipe
    with a subspace key)."""
    return (
        assigned.select("sub", "code", F.posexplode("q").alias("pos", "v"))
        .groupBy("sub", "code", "pos")
        .agg(
            F.expr(
                "CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT)"
            ).alias("cc")
        )
        .groupBy("sub", "code")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cc"))).alias("pc"))
        .select("sub", "code", F.expr("transform(pc, x -> x.cc)").alias("c"))
    )


def _sub_assign_exact(sv: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, sub, code, q, dist) — exact-integer nearest-codeword
    assignment per subspace: broadcast m·k BIGINT codewords,
    min(struct) argmin with (dist, code) tiebreak ≡ ROW_NUMBER()
    ORDER BY dist, code."""
    from .kmeans import DIST_EXPR

    d = sv.join(broadcast(cents), "sub").select(
        "vec_id", "sub", "q", "code", F.expr(DIST_EXPR).alias("dist")
    )
    return (
        d.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("dist", "code", "q")).alias("s"))
        .select(
            "vec_id",
            "sub",
            F.col("s.code").alias("code"),
            F.col("s.q").alias("q"),
            F.col("s.dist").alias("dist"),
        )
    )


def pq_codes_exact(
    embeddings: DataFrame,
    dim: int = 64,
    m: int = M_SUB,
    k: int = K_CODES,
    steps: int = 2,
    scale: int = 1 << 20,
) -> DataFrame:
    """The PQ ENCODER itself as an ORACLE-VERIFIED surface →
    (vec_id, sub, code, dist_q): label-seeded per-subspace codebooks
    + ``steps`` Lloyd rounds over scaled-BIGINT subvectors, then the
    final per-(vector, subspace) codeword assignment. Same
    cross-engine-determinism recipe as vec_ivf_cells
    (vector/ivf.ivf_cells_exact): quantize once, every distance and
    mean is exact integer math, floor-division means, COALESCE for
    emptied codewords, (dist, code) argmin tiebreak — so the code
    table that PQ serving scans (the 32×-compressed index CONTENT at
    scale) hash-matches a DuckDB CTE unroll; only the ADC top-k
    serving stays rows-only (vec_pq_ann).

    Scale shape: the quantized subvector table materializes once
    (localCheckpoint — seeds plus every round read it); each round is
    one broadcast of m·k codewords + one map-side-combined rollup on
    (sub, code, pos) — m·k·(dim/m) = k·dim cells regardless of N."""
    if dim % m != 0:
        raise ValueError(f"dim ({dim}) must be divisible by m ({m})")
    width = dim // m
    qe = F.expr(
        f"transform(embedding, v -> "
        f"CAST(FLOOR(CAST(v AS DOUBLE) * {scale} + 0.5) AS BIGINT))"
    )
    sv = (
        embeddings.select("vec_id", "label", qe.alias("qe"))
        .select(
            "vec_id",
            "label",
            F.posexplode(
                F.array(*[F.slice("qe", i * width + 1, width) for i in range(m)])
            ).alias("sub", "q"),
        )
        .localCheckpoint(eager=True)
    )
    cents = _sub_int_means(
        sv.select("sub", (F.col("label") % k).cast("int").alias("code"), "q")
    )
    for _ in range(steps):
        a = _sub_assign_exact(sv, cents)
        newc = _sub_int_means(a.select("sub", "code", "q")).withColumnRenamed(
            "c", "cn"
        )
        # an emptied codeword keeps its previous centroid (COALESCE in
        # both engines) — same convention as vec_kmeans / vec_ivf_cells
        cents = (
            cents.join(newc, ["sub", "code"], "left")
            .select("sub", "code", F.coalesce("cn", "c").alias("c"))
            .localCheckpoint(eager=True)
        )
    final = _sub_assign_exact(sv, cents)
    return final.select(
        "vec_id",
        F.col("sub").cast("int").alias("sub"),
        F.col("code").cast("int").alias("code"),
        F.col("dist").alias("dist_q"),
    )


def pq_distortion(
    embeddings: DataFrame,
    dim: int = 64,
    m: int = M_SUB,
    k: int = K_CODES,
    steps: int = 2,
) -> DataFrame:
    """Per-(subspace, codeword) quantization-error profile of the
    oracle-verified PQ encoder → (sub, code, n_vecs, sum_err_q,
    max_err_q): the FAISS-style distortion diagnostic that decides
    whether a codebook is good enough to serve — hot cells (large
    n_vecs) and high-error cells (large sum/max) are where ADC recall
    dies, and a missing (sub, code) row is a dead codeword. All
    values are the encoder's exact scaled-integer squared errors, so
    the profile hash-matches the same GROUP BY over the DuckDB CTE.

    Scale shape: one map-side-combined rollup on (sub, code) — m·k
    output cells regardless of N — on top of the encoder's own
    k·dim-bounded rounds."""
    codes = pq_codes_exact(embeddings, dim=dim, m=m, k=k, steps=steps)
    return codes.groupBy("sub", "code").agg(
        F.count("*").alias("n_vecs"),
        F.sum("dist_q").cast("bigint").alias("sum_err_q"),
        F.max("dist_q").cast("bigint").alias("max_err_q"),
    )


def ann_pq(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dim: int = 64,
    m: int = M_SUB,
    books: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Top-k by asymmetric PQ distance → (vec_id, adc_dist). The
    query's per-(sub, code) distance LUT (M·K rows) broadcasts into
    the codes table; scoring is an M-term lookup sum — the codes
    table is the ONLY big operand, and it's 32× smaller than the
    vectors. Ties break on vec_id for a deterministic top-k."""
    if books is None:
        books = train_codebooks(embeddings, dim, m)
    if codes is None:
        codes = encode(embeddings, books, dim, m)
    q = subvectors(
        embeddings.where(F.col("vec_id") == query_vec_id), dim, m
    ).select("sub", F.col("subvec").alias("q_sub"))
    lut = (
        books.join(broadcast(q), "sub")
        .select(
            "sub", "code", _sq_dist(F.col("q_sub"), F.col("centroid")).alias("d")
        )
    )
    scored = (
        codes.where(F.col("vec_id") != query_vec_id)
        .select("vec_id", F.posexplode("codes").alias("sub", "code"))
        .join(broadcast(lut), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    return scored.orderBy("adc_dist", "vec_id").limit(k)


def ann_ivfpq(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dim: int = 64,
    m: int = M_SUB,
    n_probe: int = 3,
    shortlist: int = 50,
) -> DataFrame:
    """Composed IVF+PQ serve path — the canonical billion-scale index
    (FAISS IVFADC, Jégou et al. 2011) in DataFrame algebra →
    (vec_id, label, cosine_sim):

    1. IVF cells prune the SCAN (probe the n_probe nearest cells —
       touches ~n_probe/K of the corpus);
    2. PQ codes make the probed cells cheap to SCORE (M-term LUT sum
       over 8-byte codes instead of 256-byte vectors);
    3. exact cosine RESCORES only the PQ shortlist.

    At 100 TB: step 1 is partition pruning (cells are the partition
    key), step 2 reads the codes column only (32× less bandwidth),
    step 3 fetches `shortlist` full vectors — per query the full-
    vector traffic is O(shortlist), independent of corpus size.

    Rows-only gate (learned structures are engine-specific); recall
    vs exact kNN is pytest-bounded like the IVF and PQ paths.
    """
    from .ivf import assign_cells, kmeans_refine, label_centroids

    cents = kmeans_refine(
        embeddings, label_centroids(embeddings, dim), dim, 1
    )
    assigned = assign_cells(embeddings, cents)
    q_full = broadcast(
        embeddings.where(F.col("vec_id") == query_vec_id).select(
            F.col("embedding").alias("q_embedding")
        )
    )
    probe_cells = broadcast(
        cents.crossJoin(q_full)
        .select(
            "cell",
            _sq_dist(
                F.transform(F.col("q_embedding"), lambda x: x.cast("double")),
                F.col("centroid"),
            ).alias("d"),
        )
        .orderBy("d", "cell")
        .limit(n_probe)
        .select("cell")
    )
    probed = assigned.join(probe_cells, "cell", "leftsemi").where(
        F.col("vec_id") != query_vec_id
    )
    books = train_codebooks(embeddings, dim, m)
    codes = encode(probed, books, dim, m)
    q_sub = subvectors(
        embeddings.where(F.col("vec_id") == query_vec_id), dim, m
    ).select("sub", F.col("subvec").alias("q_sub"))
    lut = books.join(broadcast(q_sub), "sub").select(
        "sub", "code", _sq_dist(F.col("q_sub"), F.col("centroid")).alias("d")
    )
    short = (
        codes.select("vec_id", F.posexplode("codes").alias("sub", "code"))
        .join(broadcast(lut), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.sum("d").alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(shortlist)
    )
    from .similarity import cosine

    rescored = (
        embeddings.join(broadcast(short.select("vec_id")), "vec_id")
        .crossJoin(q_full)
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    return rescored.orderBy(F.col("cosine_sim").desc(), "vec_id").limit(k)
