"""Vector ops vs numpy ground truth + ANN recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcp_memory_libsql_spark.io.tables import load_tables
from mcp_memory_libsql_spark.vector import knn, lsh


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_tables(spark, sf_dir)["embeddings"]


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def _brute_topk(ids, mat, qid, k):
    q = mat[ids == qid][0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(
        [(round(s, 6), i) for s, i in zip(sims, ids) if i != qid],
        key=lambda t: (-t[0], t[1]),
    )
    return [i for _, i in order[:k]]


def test_knn_cosine_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    got = [r.vec_id for r in knn.knn_cosine(emb, 0, k=20).collect()]
    assert got == _brute_topk(ids, mat, 0, 20)


def test_knn_batch_per_query(emb, emb_np):
    ids, mat = emb_np
    out = knn.knn_batch(
        emb,
        emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
        ),
        k=5,
    ).collect()
    for qid in range(3):
        got = [r.vec_id for r in sorted(out, key=lambda r: r.rank) if r.q_id == qid]
        assert got == _brute_topk(ids, mat, qid, 5)


def test_centroids_match_numpy(emb, emb_np):
    labels = {r.label for r in emb.select("label").distinct().collect()}
    cents = knn.centroids(emb).collect()
    rows = emb.select("label", "embedding").collect()
    for lbl in labels:
        mat = np.array(
            [r.embedding for r in rows if r.label == lbl], dtype=np.float64
        )
        want = mat.mean(axis=0)
        got = sorted(
            [(c.pos, c.centroid) for c in cents if c.label == lbl]
        )
        for (pos, val), w in zip(got, want):
            assert abs(val - round(w, 6)) <= 1e-6


def test_ann_recall_vs_brute(emb, emb_np):
    ids, mat = emb_np
    want = set(_brute_topk(ids, mat, 0, 10))
    got = {r.vec_id for r in lsh.ann_cosine(emb, 0, k=10, dim=64).collect()}
    # approximate: require decent overlap with the exact answer
    assert len(got & want) >= 5, f"recall too low: {got & want}"


def test_ann_deterministic(emb):
    a = [tuple(r) for r in lsh.ann_cosine(emb, 0, k=10, dim=64).collect()]
    b = [tuple(r) for r in lsh.ann_cosine(emb, 0, k=10, dim=64).collect()]
    assert a == b


def test_lsh_near_dup_pairs_subset_of_brute(emb):
    from mcp_memory_libsql_spark.textops import dedup

    brute = {
        (r.vec_a, r.vec_b): r.cosine_sim
        for r in dedup.embedding_near_pairs(emb, threshold=0.5).collect()
    }
    approx = {
        (r.vec_a, r.vec_b): r.cosine_sim
        for r in lsh.near_dup_pairs_lsh(emb, threshold=0.5).collect()
    }
    # every LSH pair must be a true pair with the identical score
    for k, v in approx.items():
        assert k in brute and brute[k] == v
    # and with 16 tables at sim≥0.5 recall should be decent
    if brute:
        assert len(approx) / len(brute) >= 0.5


def test_tfidf_semantic_search_self_retrieval(spark, sf_dir):
    from mcp_memory_libsql_spark.io.tables import load_tables
    from mcp_memory_libsql_spark.vector import embed

    docs = load_tables(spark, sf_dir)["documents"]
    target = docs.where(F.col("doc_id") == 7).collect()[0]
    out = embed.semantic_search(docs, target.text, k=5).collect()
    assert out[0].doc_id == 7  # a doc's own text retrieves it first
    assert out[0].cosine_sim > 0.99
    assert all(out[i].cosine_sim >= out[i + 1].cosine_sim for i in range(4))


def test_tfidf_embeddings_shape(spark, sf_dir):
    from mcp_memory_libsql_spark.io.tables import load_tables
    from mcp_memory_libsql_spark.vector import embed

    docs = load_tables(spark, sf_dir)["documents"]
    vecs = embed.embed_documents(docs)
    assert vecs.count() == docs.count()
    row = vecs.limit(1).collect()[0]
    assert len(row.embedding) == embed.NUM_FEATURES


def test_pq_ann_recall_vs_brute_l2(emb, emb_np):
    """PQ ADC top-10 must substantially overlap the exact L2 top-20
    (asymmetric distance is an estimate — overlap, not identity)."""
    from mcp_memory_libsql_spark.vector import pq

    ids, mat = emb_np
    q = mat[ids == 0][0]
    d2 = ((mat - q) ** 2).sum(axis=1)
    exact20 = {
        i
        for _, i in sorted(
            [(d, i) for d, i in zip(d2, ids) if i != 0], key=lambda t: (t[0], t[1])
        )[:20]
    }
    got = {r.vec_id for r in pq.ann_pq(emb, 0, k=10, dim=64).collect()}
    assert len(got) == 10
    assert len(got & exact20) >= 4


def test_pq_codes_shape_and_determinism(emb):
    from mcp_memory_libsql_spark.vector import pq

    books = pq.train_codebooks(emb, dim=64)
    codes = pq.encode(emb, books, dim=64)
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r.codes) == pq.M_SUB
        assert all(0 <= c < pq.K_CODES for c in r.codes)
    again = {
        r.vec_id: tuple(r.codes)
        for r in pq.encode(emb, books, dim=64).collect()
    }
    assert all(tuple(r.codes) == again[r.vec_id] for r in rows)


def test_pca_components_orthonormal_and_variance_ordered(spark, sf_dir):
    import numpy as np

    from mcp_memory_libsql_spark.io.tables import load_tables
    from mcp_memory_libsql_spark.vector import pca

    emb = load_tables(spark, sf_dir)["embeddings"]
    comps, mu, ev = pca.fit_pca(emb, k=8)
    assert comps.shape == (8, 64) and mu.shape == (64,)
    np.testing.assert_allclose(comps @ comps.T, np.eye(8), atol=1e-8)
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    assert (ev >= -1e-9).all()


def test_pca_projection_matches_numpy(spark, sf_dir):
    import numpy as np

    from mcp_memory_libsql_spark.io.tables import load_tables
    from mcp_memory_libsql_spark.vector import pca

    emb = load_tables(spark, sf_dir)["embeddings"]
    comps, mu, _ = pca.fit_pca(emb, k=4)
    got = {
        r.vec_id: np.asarray(r.pc)
        for r in pca.project(emb, comps, mu).collect()
    }
    pdfs = emb.select("vec_id", "embedding").toPandas()
    x = np.stack(pdfs["embedding"].to_numpy()).astype(np.float64)
    want = (x - mu) @ comps.T
    for i, vid in enumerate(pdfs["vec_id"]):
        np.testing.assert_allclose(got[vid], want[i], atol=1e-9)


def test_pca_first_component_maximizes_variance(spark, sf_dir):
    import numpy as np

    from mcp_memory_libsql_spark.io.tables import load_tables
    from mcp_memory_libsql_spark.vector import pca

    emb = load_tables(spark, sf_dir)["embeddings"]
    comps, mu, ev = pca.fit_pca(emb, k=2)
    pdfs = emb.select("embedding").toPandas()
    x = np.stack(pdfs["embedding"].to_numpy()).astype(np.float64) - mu
    # variance along pc1 >= variance along any coordinate axis
    v1 = ((x @ comps[0]) ** 2).mean()
    assert v1 + 1e-9 >= x.var(axis=0).max()
    np.testing.assert_allclose(v1, ev[0], rtol=1e-8)


def test_recall_eval_floors(spark, sf_dir):
    from mcp_memory_libsql_spark.io.tables import load_tables
    from mcp_memory_libsql_spark.vector import evaluate

    emb = load_tables(spark, sf_dir)["embeddings"]
    rows = evaluate.recall_eval(emb, n_queries=5, k=10).collect()
    by_method = {}
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        by_method.setdefault(r.method, []).append(r.recall)
    assert set(by_method) == {"lsh", "ivf", "ivfk"}
    assert all(len(v) == 5 for v in by_method.values())
    # floors: LSH with recall-oriented defaults beats IVF at n_probe=3
    assert sum(by_method["lsh"]) / 5 >= 0.6
    assert sum(by_method["ivf"]) / 5 >= 0.3
    assert sum(by_method["ivfk"]) / 5 >= 0.3


def test_rp_distortion_concentrates_near_one(spark, sf_dir):
    """JL sanity: with k=16 the squared-distance ratio mass sits
    around 1.0 (measured ~90% in [0.5, 1.6) at both SFs — assert a
    loose 75% floor so the test survives data regeneration)."""
    from mcp_memory_libsql_spark.vector import rp

    from mcp_memory_libsql_spark.io.tables import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    rows = rp.rp_distortion(emb).collect()
    tot = sum(r.n_pairs for r in rows)
    near = sum(r.n_pairs for r in rows if 5 <= r.ratio_bucket <= 15)
    assert tot > 0
    assert near / tot >= 0.75


def test_ivfpq_recall_vs_brute_cosine(emb, emb_np):
    """Composed IVF+PQ (prune → LUT-score → exact rescore) top-10
    must substantially overlap the exact cosine top-20."""
    import numpy as np

    from mcp_memory_libsql_spark.vector import pq

    ids, mat = emb_np
    q = mat[ids == 0][0]
    sims = (mat @ q) / (
        np.linalg.norm(mat, axis=1) * np.linalg.norm(q) + 1e-12
    )
    exact20 = {
        i
        for _, i in sorted(
            [(-s, i) for s, i in zip(sims, ids) if i != 0],
            key=lambda t: (t[0], t[1]),
        )[:20]
    }
    rows = pq.ann_ivfpq(emb, 0, k=10, dim=64).collect()
    got = {r.vec_id for r in rows}
    assert len(got) == 10
    assert len(got & exact20) >= 4
    # rescore column is the EXACT cosine for returned rows
    by_id = {r.vec_id: r.cosine_sim for r in rows}
    for i, s in zip(ids, sims):
        if i in by_id:
            assert abs(by_id[i] - s) < 1e-4


def test_lsh_bucket_profile_accounting(spark, sf_dir):
    from mcp_memory_libsql_spark.io.tables import load_tables
    from mcp_memory_libsql_spark.vector import lsh

    emb = load_tables(spark, sf_dir)["embeddings"]
    n = emb.count()
    prof = lsh.bucket_profile(emb, dim=64).collect()
    assert len(prof) == lsh.N_TABLES
    for r in prof:
        # every vector lands in exactly one bucket per table
        assert r.n_vectors == n
        assert 1 <= r.n_buckets <= 1 << lsh.N_BITS
        assert r.min_width >= 1 and r.max_width <= n


def test_lsh_prebuilt_index_identical_results(spark, sf_dir, emb, tmp_path):
    # The registry's disk-backed index must be a pure plan shortcut:
    # round-tripping bucketize through partitioned parquet changes
    # NOTHING in any consumer's output (signatures are deterministic).
    p = str(tmp_path / "lsh_idx")
    lsh.bucketize(emb, dim=64).write.partitionBy("table_id", "sig").parquet(p)
    idx = spark.read.parquet(p).select("vec_id", "table_id", "sig")

    ann_inline = [tuple(r) for r in lsh.ann_cosine(emb, 0, k=10, dim=64).collect()]
    ann_idx = [
        tuple(r)
        for r in lsh.ann_cosine(emb, 0, k=10, dim=64, index=idx).collect()
    ]
    assert ann_inline == ann_idx

    pairs_inline = {
        tuple(r)
        for r in lsh.near_dup_pairs_lsh(emb, threshold=0.4).collect()
    }
    pairs_idx = {
        tuple(r)
        for r in lsh.near_dup_pairs_lsh(emb, threshold=0.4, index=idx).collect()
    }
    assert pairs_inline == pairs_idx

    prof_inline = sorted(tuple(r) for r in lsh.bucket_profile(emb, dim=64).collect())
    prof_idx = sorted(
        tuple(r) for r in lsh.bucket_profile(emb, dim=64, index=idx).collect()
    )
    assert prof_inline == prof_idx


def test_lsh_fat_bucket_split_oracle_parity(spark):
    # 600 identical vectors land in ONE bucket per table — far over
    # BUCKET_CAP=100 — so the fat-bucket split fires in every table:
    # md5 sub-keying over (table_id, sig, vec_id), post-split 2..cap
    # keep-rule, pair mining per sub-bucket. The DuckDB mirror must
    # hash-match exactly (the sf corpora rarely exceed the cap, so
    # this synthetic corpus is the split's dedicated parity exercise;
    # the old drop-rule would have returned ZERO pairs here).
    import pandas as pd

    import duckdb
    from mcp_memory_libsql_spark.registry import ORACLES
    from tests.parity import compare

    vec = [((i * 37) % 13 - 6) / 7.0 for i in range(64)]
    rows = [(i, i % 5, vec) for i in range(600)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, label bigint, embedding array<double>"
    )
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(rows, columns=["vec_id", "label", "embedding"]),
    )
    # same effective mining width the registry gate picks: threshold
    # floor widened to the corpus-adaptive width (mirrors the oracle's
    # GREATEST(floor, COUNT-driven CASE))
    w = max(lsh.n_bits_for_threshold(0.4), lsh.width_for_corpus(len(rows)))
    res = compare(
        lsh.near_dup_pairs_lsh(emb, threshold=0.4, n_bits=w),
        con,
        ORACLES["dedup_embedding_lsh"],
    )
    con.close()
    assert res["ok"], res
    assert res["spark_rows"] > 0


def test_kmeans_assign_invariants(spark, sf_dir):
    from mcp_memory_libsql_spark.vector.kmeans import kmeans_assign
    from mcp_memory_libsql_spark.io.tables import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    out = kmeans_assign(emb).collect()
    n = emb.count()
    # total assignment: every vector exactly once
    assert len(out) == n
    assert len({r.vec_id for r in out}) == n
    clusters = {r.cluster for r in out}
    assert clusters <= set(range(8))
    # sizes are consistent with the assignment
    from collections import Counter

    sizes = Counter(r.cluster for r in out)
    assert all(sizes[r.cluster] == r.cluster_size for r in out)
    assert all(r.dist_q >= 0 for r in out)
    # deterministic: a second run yields the identical assignment
    again = {r.vec_id: (r.cluster, r.dist_q) for r in kmeans_assign(emb).collect()}
    assert all(again[r.vec_id] == (r.cluster, r.dist_q) for r in out)


def test_semantic_clusters_transitivity(spark, sf_dir):
    from mcp_memory_libsql_spark.registry import QUERIES

    rows = QUERIES["dedup_semantic_clusters"](spark, sf_dir).collect()
    pairs = QUERIES["dedup_embedding_lsh"](spark, sf_dir).collect()
    cl = {r.vec_id: r.cluster_id for r in rows}
    # every paired vector is clustered, both endpoints share a cluster
    for p in pairs:
        assert cl[p.vec_a] == cl[p.vec_b]
    # cluster id is the min member (HashMin canonical form)
    from collections import defaultdict

    members = defaultdict(list)
    for r in rows:
        members[r.cluster_id].append(r.vec_id)
    assert all(min(v) == c for c, v in members.items())


def test_ivf_kmeans_recall_vs_brute(spark, sf_dir):
    from mcp_memory_libsql_spark.registry import QUERIES
    from mcp_memory_libsql_spark.vector import knn

    emb = load_tables(spark, sf_dir)["embeddings"]
    truth = [r.vec_id for r in knn.knn_cosine(emb, 0, k=10).collect()]
    got = [r.vec_id for r in QUERIES["vec_ivf_kmeans_ann"](spark, sf_dir).collect()]
    assert len(got) == 10
    recall = len(set(truth) & set(got)) / 10
    assert recall >= 0.3, recall


def test_ivf_cells_lloyd_invariants(spark, sf_dir):
    """Refinement must not increase total inertia (the Lloyd descent
    property), every vector lands in exactly one cell, and cell ids
    stay within the label-seeded id space."""
    from mcp_memory_libsql_spark.vector import ivf

    emb = load_tables(spark, sf_dir)["embeddings"]
    seeded = ivf.ivf_cells_exact(emb, refine_steps=0)
    refined = ivf.ivf_cells_exact(emb, refine_steps=2)
    n = emb.count()
    assert seeded.count() == n
    assert refined.count() == n
    labels = {r.label for r in emb.select("label").distinct().collect()}
    assert {r.cell for r in refined.select("cell").distinct().collect()} <= labels
    inertia0 = seeded.agg({"dist_q": "sum"}).first()[0]
    inertia2 = refined.agg({"dist_q": "sum"}).first()[0]
    # Lloyd's descent guarantee assumes EXACT means; the floored
    # integer centroids can each be off by <1 per coordinate, which
    # perturbs a squared distance by at most 2·|q−c|+1 ≤ 2·(2·2²⁰)+1
    # per (vector, coordinate). Allow exactly that rounding slack so
    # the assertion tests the descent property, not float luck.
    slack = 64 * n * (2 * (2 * (1 << 20)) + 1)
    assert inertia2 <= inertia0 + slack
    # cell_size is consistent with the assignment rows
    sizes = {r.cell: r.cell_size for r in refined.select("cell", "cell_size").distinct().collect()}
    from collections import Counter

    counted = Counter(r.cell for r in refined.select("cell").collect())
    assert sizes == dict(counted)


def test_pq_codes_exact_invariants(spark, sf_dir):
    """PQ encoder invariants: exactly one codeword per (vector,
    subspace), codes within the k-codeword id space, and Lloyd
    refinement does not increase total quantization error beyond the
    floored-centroid rounding slack (the ivf_cells argument applied
    per subspace)."""
    from mcp_memory_libsql_spark.vector import pq

    emb = load_tables(spark, sf_dir)["embeddings"]
    n = emb.count()
    seeded = pq.pq_codes_exact(emb, steps=0)
    refined = pq.pq_codes_exact(emb, steps=2)
    rows = refined.collect()
    assert len(rows) == n * pq.M_SUB
    assert len({(r.vec_id, r.sub) for r in rows}) == n * pq.M_SUB
    assert all(0 <= r.code < pq.K_CODES for r in rows)
    assert all(0 <= r.sub < pq.M_SUB for r in rows)
    inertia0 = seeded.agg({"dist_q": "sum"}).first()[0]
    inertia2 = refined.agg({"dist_q": "sum"}).first()[0]
    slack = 64 * n * (2 * (2 * (1 << 20)) + 1)
    assert inertia2 <= inertia0 + slack

def test_pq_distortion_profile_consistent(spark, sf_dir):
    """The distortion profile is an exact rollup of the encoder's
    code table: cell counts sum to n·m, every cell's max ≤ sum, and
    recomputing the rollup from pq_codes_exact reproduces it
    row-for-row (parity vs DuckDB is covered by the oracle harness)."""
    from pyspark.sql import functions as F

    from mcp_memory_libsql_spark.vector import pq

    emb = load_tables(spark, sf_dir)["embeddings"]
    n = emb.count()
    prof = pq.pq_distortion(emb).collect()
    assert sum(r.n_vecs for r in prof) == n * pq.M_SUB
    assert all(r.max_err_q <= r.sum_err_q for r in prof)
    assert all(0 <= r.sub < pq.M_SUB and 0 <= r.code < pq.K_CODES
               for r in prof)
    want = {
        (r.sub, r.code): (r.n_vecs, r.sum_err_q, r.max_err_q)
        for r in pq.pq_codes_exact(emb)
        .groupBy("sub", "code")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("dist_q").alias("sum_err_q"),
            F.max("dist_q").alias("max_err_q"),
        )
        .collect()
    }
    got = {
        (r.sub, r.code): (r.n_vecs, r.sum_err_q, r.max_err_q)
        for r in prof
    }
    assert got == want


def test_semantic_search_exact_self_retrieval(spark):
    """The integer-exact retrieval twin must rank the document that
    IS the query first, and score docs sharing no query term not at
    all; contributions are integer-quantized so the score is an exact
    BIGINT in both engines (the parity suite pins the cross-engine
    hash)."""
    from mcp_memory_libsql_spark.vector.embed import semantic_search_exact

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta unrelated words here"),
            (3, "totally different content entirely"),
            (4, "alpha alpha alpha spam spam spam"),
        ],
        "doc_id long, text string",
    )
    out = semantic_search_exact(docs, "alpha beta gamma delta", k=4).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 1  # the verbatim match wins
    assert 3 not in ids  # no shared term, no score
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_terms == 4 and by_id[2].n_terms == 2


def test_gram_exact_matches_numpy(spark, sf_dir):
    """gram_exact ≡ the numpy integer computation on the real corpus:
    quantize with the same floor(x·2^20 + 0.5), accumulate X^T X in
    int64, compare every upper-triangle cell — proves the explode +
    partial-agg plan computes the exact sufficient statistic
    fit_pca's float path approximates."""
    import numpy as np

    from mcp_memory_libsql_spark.io.tables import load_table
    from mcp_memory_libsql_spark.vector.pca import gram_exact

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("embedding").collect()
    x = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    q = np.floor(x * (1 << 20) + 0.5).astype(np.int64)
    want = q.T @ q  # d×d, exact in int64 at this corpus size
    got = {(r.i, r.j): r.gram for r in gram_exact(emb).collect()}
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == want[i, j], (i, j)


def test_lloyd_iterates_are_persisted(spark, emb):
    """r09 pin: the float kmeans/PQ helpers persist their loop-carried
    iterates (kmeans_refine cents, train_codebooks books) so downstream
    consumers reuse one InMemoryRelation instead of re-planning the
    whole refinement chain per consumer (the exact-integer twin
    already materializes per round via localCheckpoint)."""
    from mcp_memory_libsql_spark.vector import pq
    from mcp_memory_libsql_spark.vector.ivf import (
        kmeans_refine,
        label_centroids,
    )

    cents = kmeans_refine(emb, label_centroids(emb, 64), 64, 1)
    assert cents.storageLevel.useMemory
    books = pq.train_codebooks(emb, 64)
    assert books.storageLevel.useMemory
    spark.catalog.clearCache()
