"""Binary (sign-bit) vector quantization + Hamming-distance KNN.

The third compression point on the quantization ladder next to
``vec_quantize_int8`` (8 bits/dim) and ``vec_pq_ann`` (codebook
codes): 1 bit/dim. A 64-dim float vector becomes ONE BIGINT — 256→7.5
bytes — and candidate scoring is `bit_count(xor)` — pure integer ALU,
whole-stage-codegen'd, no float math at all in the scan.

Semantics follow the classic sign-random-projection bound (Charikar
2002): P[sign bits agree] = 1 − θ/π, so Hamming distance on sign
codes is a monotone estimate of angular distance. Here the vectors
are used as their own projections (bit i = sign of dim i), which is
the common "binary quantization" serving trick (cf. faiss
IndexBinaryFlat) rather than LSH with random planes — planes live in
``lsh.py``.

Packing uses dims 0..59 → a 60-bit BIGINT, matching the repo's
portable-BIGINT convention (sign bit never set; DuckDB computes the
identical code, so the operator is FULLY oracle-checkable — unusual
for an ANN surface, possible because scoring is integer-exact).

Scale: queries broadcast (same contract as ``knn.knn_batch``); the
corpus side is one narrow scan over packed codes. At 100 TB you'd
precompute the code column at ingest (it is deterministic per row)
and scan 8 bytes/vector instead of 256 — the rerank-with-exact-cosine
step then touches only k·oversample full vectors per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

N_SIGN_BITS = 60  # BIGINT-safe (sign bit clear), repo-wide convention


def sign_code(vec: Column, n_bits: int = N_SIGN_BITS) -> Column:
    """Pack sign bits of the first ``n_bits`` dims into a BIGINT:
    bit i set iff vec[i] > 0. Pure column expression (zip_with +
    aggregate) — codegen'd, exactly reproducible in DuckDB."""
    weights = F.array(
        *[F.lit(1 << i).cast("bigint") for i in range(n_bits)]
    )
    bits = F.zip_with(
        F.slice(vec, 1, n_bits),
        weights,
        lambda x, w: F.when(x > 0, w).otherwise(F.lit(0).cast("bigint")),
    )
    return F.aggregate(
        bits, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


def hamming_knn(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Per-query top-k by Hamming distance on sign codes →
    (q_id, vec_id, hamming, rank). ``queries`` is (q_id, q_embedding),
    broadcast. Deterministic (hamming ASC, vec_id) tiebreak makes the
    integer ranking fully oracle-checkable."""
    corpus = embeddings.select(
        "vec_id", sign_code(F.col("embedding")).alias("code")
    )
    qcodes = queries.select(
        "q_id", sign_code(F.col("q_embedding")).alias("q_code")
    )
    ham = F.bit_count(
        F.col("code").bitwiseXOR(F.col("q_code"))
    ).cast("int")
    scored = (
        corpus.crossJoin(broadcast(qcodes))
        .where(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", ham.alias("hamming"))
    )
    w = Window.partitionBy("q_id").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )
