"""DuckDB oracle SQL for the vector queries."""

ORACLES: dict[str, str] = {}

ORACLES["vec_knn_cosine"] = """
WITH q AS (SELECT embedding AS q_embedding FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       ROUND(list_cosine_similarity(embedding::DOUBLE[], q_embedding::DOUBLE[]), 6)
         AS cosine_sim
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cosine_sim DESC, vec_id
LIMIT 20
"""

ORACLES["vec_knn_dot"] = """
WITH q AS (SELECT embedding AS q_embedding FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       ROUND(list_dot_product(embedding::DOUBLE[], q_embedding::DOUBLE[]), 6)
         AS dot_product
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY dot_product DESC, vec_id
LIMIT 20
"""

ORACLES["vec_knn_batch"] = """
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_embedding FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q_id, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q_embedding::DOUBLE[]), 6)
           AS cosine_sim
  FROM embeddings e CROSS JOIN q
  WHERE q_id <> e.vec_id
),
ranked AS (
  SELECT q_id, vec_id, cosine_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY cosine_sim DESC, vec_id) AS INTEGER)
           AS rank
  FROM scored
)
SELECT q_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""

ORACLES["vec_centroids"] = """
SELECT label, CAST(pos - 1 AS INTEGER) AS pos, ROUND(AVG(val), 6) AS centroid
FROM (
  SELECT label, unnest(embedding)::DOUBLE AS val,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
)
GROUP BY label, pos
"""

ORACLES["vec_norms"] = """
SELECT label, COUNT(*) AS n_vectors,
       ROUND(MIN(nrm), 6) AS min_norm,
       ROUND(MAX(nrm), 6) AS max_norm,
       ROUND(AVG(nrm), 6) AS avg_norm
FROM (
  SELECT label,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
GROUP BY label
"""

ORACLES["dedup_embedding"] = """
SELECT * FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
           AS cosine_sim
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
)
WHERE cosine_sim >= 0.4
"""

# Symmetric int8 quantization audit — all arithmetic forced to DOUBLE
# and half-up via floor(x+0.5), mirroring vector/quant.py exactly.
ORACLES["vec_quantize_int8"] = """
WITH m AS (
  SELECT vec_id, embedding,
         list_aggregate(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE))), 'max')
           AS maxabs
  FROM embeddings
)
SELECT vec_id,
  CAST(ROUND(CASE WHEN maxabs = 0 THEN 0 ELSE maxabs / 127 END, 6)
       AS DOUBLE) AS scale,
  CAST(ROUND(CASE WHEN maxabs = 0 THEN 0 ELSE
    list_aggregate(list_transform(embedding,
      x -> abs(floor(CAST(x AS DOUBLE) * 127 / maxabs + 0.5) * maxabs / 127
               - CAST(x AS DOUBLE))), 'max')
    END, 6) AS DOUBLE) AS max_err
FROM m
"""

# Integer-exact X^T X upper triangle (vector/pca.gram_exact): the
# same quantize-once BIGINT recipe as vec_quantize_int8
# (floor(x·2^20 + 0.5) — half-up spelled as floor, bit-identical
# across engines), then exact product sums. The oracle takes the
# self-join path where the Spark side explodes per-row products —
# identical integers either way.
ORACLES["vec_gram_exact"] = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))
           AS qe
  FROM embeddings
),
ex AS (
  SELECT vec_id, generate_subscripts(qe, 1) - 1 AS i, unnest(qe) AS qv
  FROM q
)
SELECT CAST(a.i AS INTEGER) AS i, CAST(b.i AS INTEGER) AS j,
       CAST(SUM(a.qv * b.qv) AS BIGINT) AS gram
FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY 1, 2
"""

# Doc↔embedding bridge rollups (analytics/bridge.py): 1:1 join on
# doc_id = vec_id, then per-lang / per-label audits.
ORACLES["bridge_lang_stats"] = """
SELECT d.lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT e.label) AS n_labels,
       ROUND(AVG(d.n_chars), 6) AS avg_chars,
       ROUND(AVG(sqrt(list_dot_product(e.embedding::DOUBLE[],
                                       e.embedding::DOUBLE[]))), 6)
         AS avg_norm
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
GROUP BY d.lang
"""

ORACLES["bridge_label_purity"] = """
WITH by_ll AS (
  SELECT e.label, d.lang, COUNT(*) AS n
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
  GROUP BY e.label, d.lang
),
ranked AS (
  SELECT label, lang, n,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY n DESC, lang) AS rn
  FROM by_ll
)
SELECT label,
       SUM(n) AS n_docs,
       COUNT(*) AS n_langs,
       MAX(CASE WHEN rn = 1 THEN lang END) AS dominant_lang,
       ROUND(MAX(CASE WHEN rn = 1 THEN n END) / SUM(n), 6)
         AS dominant_share
FROM ranked
GROUP BY label
"""

ORACLES["bridge_centroid_outliers"] = """
WITH pairs AS (
  SELECT d.doc_id, d.lang, e.embedding::DOUBLE[] AS emb
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
),
expl AS (
  SELECT lang, unnest(emb) AS val, generate_subscripts(emb, 1) AS pos
  FROM pairs
),
cent AS (
  SELECT lang, pos, ROUND(AVG(val), 6) AS c
  FROM expl GROUP BY lang, pos
),
cvecs AS (
  SELECT lang, list(c ORDER BY pos) AS cvec FROM cent GROUP BY lang
)
SELECT p.doc_id, p.lang,
       ROUND(list_dot_product(p.emb, v.cvec)
             / (sqrt(list_dot_product(p.emb, p.emb))
                * sqrt(list_dot_product(v.cvec, v.cvec))), 6)
         AS centroid_cosine
FROM pairs p JOIN cvecs v USING (lang)
WHERE sqrt(list_dot_product(p.emb, p.emb))
      * sqrt(list_dot_product(v.cvec, v.cvec)) > 0
ORDER BY centroid_cosine, p.doc_id
LIMIT 20
"""

ORACLES["vec_knn_range"] = """
WITH q AS (SELECT embedding AS q_embedding FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       ROUND(list_cosine_similarity(embedding::DOUBLE[], q_embedding::DOUBLE[]), 6)
         AS cosine_sim
FROM embeddings, q
WHERE vec_id <> 0
  AND ROUND(list_cosine_similarity(embedding::DOUBLE[], q_embedding::DOUBLE[]), 6) >= 0.2
"""

ORACLES["vec_dim_stats"] = """
WITH ex AS (
  SELECT CAST(unnest(range(0, len(embedding))) AS INTEGER) AS pos,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings
)
SELECT pos, COUNT(*) AS n,
       MIN(v) AS min_val, MAX(v) AS max_val,
       ROUND(AVG(v), 6) AS avg_val
FROM ex GROUP BY 1
"""

ORACLES["vec_hamming_knn"] = """
WITH codes AS (
  SELECT vec_id,
    CAST(list_sum(list_transform(range(1, 61),
      i -> CASE WHEN embedding[i] > 0
               THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END)) AS BIGINT)
    AS code
  FROM embeddings
),
q AS (SELECT vec_id AS q_id, code AS q_code FROM codes WHERE vec_id < 5),
scored AS (
  SELECT q_id, c.vec_id,
         CAST(bit_count(xor(code, q_code)) AS INT) AS hamming
  FROM codes c, q WHERE c.vec_id <> q_id
),
r AS (SELECT *, ROW_NUMBER()
        OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS rank
      FROM scored)
SELECT q_id, vec_id, hamming, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 5
"""

ORACLES["vec_matryoshka_recall"] = """
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_embedding
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q_id, e.vec_id,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
      ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                   q_embedding::DOUBLE[]), 6) DESC,
      e.vec_id) AS rank_full,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
      ROUND(list_cosine_similarity((e.embedding[1:8])::DOUBLE[],
                                   (q_embedding[1:8])::DOUBLE[]), 6) DESC,
      e.vec_id) AS rank_8,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
      ROUND(list_cosine_similarity((e.embedding[1:16])::DOUBLE[],
                                   (q_embedding[1:16])::DOUBLE[]), 6) DESC,
      e.vec_id) AS rank_16,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
      ROUND(list_cosine_similarity((e.embedding[1:32])::DOUBLE[],
                                   (q_embedding[1:32])::DOUBLE[]), 6) DESC,
      e.vec_id) AS rank_32
  FROM embeddings e CROSS JOIN q WHERE q_id <> e.vec_id
),
unp AS (
  SELECT q_id, CAST(8 AS INTEGER) AS dim_trunc, rank_8 AS rank_t, rank_full
  FROM scored
  UNION ALL
  SELECT q_id, CAST(16 AS INTEGER), rank_16, rank_full FROM scored
  UNION ALL
  SELECT q_id, CAST(32 AS INTEGER), rank_32, rank_full FROM scored
)
SELECT q_id, dim_trunc,
  CAST(SUM(CASE WHEN rank_t <= 10 AND rank_full <= 10 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_overlap,
  ROUND(SUM(CASE WHEN rank_t <= 10 AND rank_full <= 10 THEN 1 ELSE 0 END)
        / CAST(10 AS DOUBLE), 6) AS recall
FROM unp GROUP BY q_id, dim_trunc
"""


# ann_lsh_cosine: the random-hyperplane index is DETERMINISTIC (md5-
# seeded planes, sign-bit signatures), so the whole ANN path is
# SQL-expressible — the oracle embeds the SAME plane constants the
# Spark plan uses (imported from vector.lsh, so they cannot drift)
# and mirrors bucket-match candidate generation + exact rescoring.
# Sign(dot) is stable cross-engine: a flip needs |dot| within ulps of
# 0 (~1e-16 probability with continuous inputs).
def _ann_lsh_oracle() -> str:
    from .vector.lsh import N_BITS, N_TABLES, planes

    ps = planes(64, N_TABLES, N_BITS)

    def arr(vals):
        return "[" + ", ".join(repr(v) for v in vals) + "]::DOUBLE[]"

    sig_selects = []
    for t in range(N_TABLES):
        bits = " + ".join(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> embedding[i]::DOUBLE * ({arr(ps[t][j])})[i])) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(N_BITS)
        )
        sig_selects.append(
            f"SELECT vec_id, {t} AS table_id, ({bits}) AS sig"
            " FROM embeddings"
        )
    sigs_sql = "\nUNION ALL\n".join(sig_selects)
    return f"""
WITH sigs AS (
{sigs_sql}
),
q_sigs AS (SELECT table_id, sig FROM sigs WHERE vec_id = 0),
cand AS (
  SELECT DISTINCT s.vec_id FROM sigs s JOIN q_sigs q
    ON s.table_id = q.table_id AND s.sig = q.sig
  WHERE s.vec_id <> 0
),
qv AS (SELECT embedding AS q_embedding FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label,
  ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q_embedding::DOUBLE[]), 6)
    AS cosine_sim
FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN qv
ORDER BY cosine_sim DESC, e.vec_id
LIMIT 10
"""


ORACLES["ann_lsh_cosine"] = _ann_lsh_oracle()


def _neardup_lsh_oracle(threshold: float = 0.4) -> str:
    """dedup_embedding_lsh mirrored end-to-end: same planes, same
    signature width, same 2..cap bucket filter, same a<b distinct
    pair set, same rescore. Signatures are computed at the stored
    MAX_BITS width and masked to the CORPUS-ADAPTIVE width with the
    identical COUNT-driven rule as lsh.width_for_corpus (floored at
    the threshold width) — so the oracle picks the same effective
    width as the Spark side at ANY sf without a per-sf SQL string.
    MATERIALIZED sigs — a plain CTE would re-expand the 64-dot
    signature scan per reference."""
    from .vector.lsh import (
        BUCKET_CAP,
        MAX_BITS,
        N_BITS,
        N_TABLES,
        TARGET_BUCKET,
        n_bits_for_threshold,
        planes,
    )

    nb_floor = n_bits_for_threshold(threshold)
    ps = planes(64, N_TABLES, MAX_BITS)

    def arr(vals):
        return "[" + ", ".join(repr(v) for v in vals) + "]::DOUBLE[]"

    sig_selects = []
    for t in range(N_TABLES):
        bits = " + ".join(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> embedding[i]::DOUBLE * ({arr(ps[t][j])})[i])) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(MAX_BITS)
        )
        sig_selects.append(
            f"SELECT vec_id, {t} AS table_id, ({bits}) AS sig"
            " FROM embeddings"
        )
    sigs_sql = "\nUNION ALL\n".join(sig_selects)
    mod_case = (
        "CASE "
        + " ".join(
            f"WHEN cnt <= {TARGET_BUCKET * (1 << w)} THEN {1 << w}"
            for w in range(N_BITS, MAX_BITS + 1)
        )
        + f" ELSE {1 << MAX_BITS} END"
    )
    return f"""
WITH modv AS (
  SELECT GREATEST({1 << nb_floor}, {mod_case}) AS m
  FROM (SELECT COUNT(*) AS cnt FROM embeddings)
),
sigs0 AS MATERIALIZED (
{sigs_sql}
),
sigs AS MATERIALIZED (
  SELECT vec_id, table_id, sig % (SELECT m FROM modv) AS sig FROM sigs0
),
sc AS (
  SELECT *, COUNT(*) OVER (PARTITION BY table_id, sig) AS cnt FROM sigs
),
-- split_fat_buckets mirror: buckets over cap={BUCKET_CAP} split into
-- ceil(2*cnt/{BUCKET_CAP}) md5 sub-buckets, 2..cap keep-rule after
subbed AS MATERIALIZED (
  SELECT vec_id, table_id, sig,
         ('0x' || substr(md5(CAST(table_id AS VARCHAR) || '#' ||
                             CAST(sig AS VARCHAR) || '#' ||
                             CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
         % (CASE WHEN cnt <= {BUCKET_CAP} THEN 1
                 ELSE (2 * cnt + {BUCKET_CAP - 1}) // {BUCKET_CAP} END)
           AS sb
  FROM sc WHERE cnt >= 2
),
ok AS (
  SELECT table_id, sig, sb FROM subbed GROUP BY 1, 2, 3
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {BUCKET_CAP}
),
capped AS (SELECT s.* FROM subbed s JOIN ok USING (table_id, sig, sb)),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM capped a JOIN capped b
    ON a.table_id = b.table_id AND a.sig = b.sig AND a.sb = b.sb
   AND a.vec_id < b.vec_id
),
ea AS (SELECT vec_id AS vec_a, embedding AS emb_a FROM embeddings),
eb AS (SELECT vec_id AS vec_b, embedding AS emb_b FROM embeddings)
SELECT vec_a, vec_b,
  ROUND(list_cosine_similarity(emb_a::DOUBLE[], emb_b::DOUBLE[]), 6)
    AS cosine_sim
FROM pairs JOIN ea USING (vec_a) JOIN eb USING (vec_b)
WHERE ROUND(list_cosine_similarity(emb_a::DOUBLE[], emb_b::DOUBLE[]), 6)
      >= {threshold}
"""


ORACLES["dedup_embedding_lsh"] = _neardup_lsh_oracle(0.4)
# vec_neardup_refresh: the Spark side takes the INCREMENTAL path
# (refresh_pairs merging a vec_id%19==0 delta into the base pair
# stream); the oracle rebuilds the identical pair set from scratch
# over all rows — the opposite-path trick the other refresh twins
# use, so the hash match IS the refresh≡rebuild proof.
ORACLES["vec_neardup_refresh"] = _neardup_lsh_oracle(0.4)

ORACLES["vec_cosine_distribution"] = """
WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000)
SELECT CAST(FLOOR(ROUND(list_cosine_similarity(
         a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) * 10) AS BIGINT)
         AS cos_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM s a JOIN s b ON a.vec_id < b.vec_id
GROUP BY 1
"""

ORACLES["vec_hard_negatives"] = """
WITH q AS (
  SELECT vec_id AS q_id, label AS q_label, embedding AS q_embedding
  FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT q_id, q_label, e.vec_id, e.label AS neg_label,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q_embedding::DOUBLE[]), 6)
           AS cosine_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.label <> q_label
),
ranked AS (
  SELECT q_id, q_label, vec_id, neg_label, cosine_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                 ORDER BY cosine_sim DESC, vec_id) AS INTEGER)
           AS rank
  FROM scored
)
SELECT q_id, q_label, vec_id, neg_label, cosine_sim, rank
FROM ranked WHERE rank <= 5
"""

ORACLES["mm_dedup"] = """
WITH m0 AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         text
  FROM documents
),
m AS (
  SELECT * FROM m0
  UNION ALL
  SELECT media_id + 1000000, kind, text FROM m0 WHERE media_id % 10 = 0
)
SELECT md5(text) AS payload_md5, kind,
  CAST(COUNT(*) AS BIGINT) AS n_copies,
  CAST(MIN(media_id) AS BIGINT) AS keeper_id,
  CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
FROM m GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""

# Perceptual media near-dup: byte-histogram 60-bit SimHash over the
# DECODED payload (= the document's utf-8 bytes — encode_media wraps
# them in a real BMP/WAV container and the Spark decoder strips the
# container back off). The hist CTE expands each character into its
# UTF-8 BYTES via hex(encode(ch)) so the histogram is byte-exact —
# matching Spark's np.bincount over uint8 even for non-ASCII text
# (unicode(ch) code points would diverge from byte arithmetic the
# moment a 2-byte char appears). Candidates mirror the Spark side's
# pigeonhole banding
# EXACTLY — four 15-bit chunk buckets per signature, buckets with
# 2..256 members kept (overfull dropped, the high-DF convention) —
# so the capped output stays hash-verifiable. Gate injects a
# deterministic "re-encode" (text || ' ', id + 2.1M) so groups are
# non-trivial.
ORACLES["mm_neardup"] = """
WITH m0 AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         text
  FROM documents
),
m AS (
  SELECT * FROM m0
  UNION ALL
  SELECT media_id + 2100000, kind, text || ' ' FROM m0 WHERE media_id % 7 = 0
),
chars AS (
  SELECT media_id, kind, hex(encode(ch)) AS hx, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT media_id, kind, unnest(string_split(text, '')) AS ch
        FROM m WHERE strlen(text) > 0)
  GROUP BY 1, 2, 3
),
hist AS (
  -- expand each char into its utf-8 bytes (2 hex digits per byte) and
  -- re-aggregate: two chars sharing a byte must sum into one count
  SELECT media_id, kind, v, CAST(SUM(c) AS BIGINT) AS c
  FROM (
    SELECT media_id, kind, c,
           ('0x' || substr(hx, i * 2 + 1, 2))::BIGINT AS v
    FROM chars, (SELECT unnest(range(4)) AS i) idx
    WHERE i * 2 < strlen(hx)
  )
  GROUP BY 1, 2, 3
),
hv AS (
  SELECT media_id, kind, c,
         ('0x' || substr(md5('mmnd:' || CAST(v AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM hist
),
votes AS (
  SELECT media_id, kind, j,
         SUM(c * (2 * ((h >> j) & CAST(1 AS BIGINT)) - 1)) AS vote
  FROM hv, (SELECT unnest(range(60)) AS j) bits
  GROUP BY 1, 2, 3
),
sig AS (
  SELECT media_id, kind,
         CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j)
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
  FROM votes GROUP BY 1, 2
),
banded0 AS (
  SELECT media_id, kind, simhash,
         kind || '_' || CAST(chunk AS VARCHAR) || '_' ||
           CAST((simhash >> (chunk * 15)) & 32767 AS VARCHAR) AS chunk_key
  FROM sig, (SELECT unnest(range(4)) AS chunk) chunks
),
bc AS (
  SELECT *, COUNT(*) OVER (PARTITION BY chunk_key) AS cnt FROM banded0
),
banded AS (
  -- split_fat_buckets mirror: buckets over cap=256 split into
  -- ceil(2*cnt/256) md5 sub-buckets, 2..cap keep-rule post-split
  SELECT media_id, kind, simhash,
         chunk_key || '#' || CAST(
           ('0x' || substr(md5(chunk_key || '#' ||
                               CAST(media_id AS VARCHAR)), 1, 8))::BIGINT
           % (CASE WHEN cnt <= 256 THEN 1 ELSE (2 * cnt + 255) // 256 END)
         AS VARCHAR) AS chunk_key
  FROM bc WHERE cnt >= 2
),
ok AS (
  SELECT chunk_key FROM banded
  GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 256
),
cand AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
         a.kind AS kind, a.simhash AS sim_a, b.simhash AS sim_b
  FROM banded a
  JOIN banded b ON a.chunk_key = b.chunk_key AND a.media_id < b.media_id
  WHERE a.chunk_key IN (SELECT chunk_key FROM ok)
)
SELECT media_a, media_b, kind,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= 3
"""

ORACLES["vec_centroid_drift"] = """
WITH e AS (
  SELECT label, vec_id % 2 = 0 AS is_a, embedding FROM embeddings
),
cent AS (
  SELECT label, is_a, pos,
         ROUND(AVG(val), 6) AS c
  FROM (
    SELECT label, is_a,
           generate_subscripts(embedding, 1) AS pos,
           unnest(embedding)::DOUBLE AS val
    FROM e
  )
  GROUP BY 1, 2, 3
),
vecs AS (
  SELECT label, is_a, list(c ORDER BY pos) AS cvec
  FROM cent GROUP BY 1, 2
),
counts AS (
  SELECT label,
         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM e GROUP BY 1
)
SELECT counts.label, n_a, n_b,
  ROUND(list_cosine_similarity(va.cvec, vb.cvec), 6) AS drift_cosine
FROM counts
JOIN vecs va ON counts.label = va.label AND va.is_a
JOIN vecs vb ON counts.label = vb.label AND NOT vb.is_a
"""


def _rp_distortion_oracle() -> str:
    """vec_rp_distortion mirrored: same md5-derived ±1 sign rows
    embedded as literals, and list_reduce (left fold, exactly Spark's
    aggregate order) rather than list_sum so every float add happens
    in the same sequence."""
    from .vector.rp import RP_DIM, rp_signs

    signs = rp_signs(64, RP_DIM)

    def arr(vals):
        return "[" + ", ".join(f"{float(v):.1f}" for v in vals) + "]::DOUBLE[]"

    proj = ", ".join(
        f"list_reduce(list_transform(range(1, 65), "
        f"i -> embedding[i]::DOUBLE * ({arr(signs[j])})[i]), "
        f"(x, y) -> x + y) / 4.0 AS p{j}"
        for j in range(RP_DIM)
    )
    d2p = " + ".join(
        f"(a.p{j} - b.p{j}) * (a.p{j} - b.p{j})" for j in range(RP_DIM)
    )
    return f"""
WITH s AS MATERIALIZED (
  SELECT vec_id, embedding, {proj}
  FROM embeddings WHERE vec_id < 300
),
pairs AS (
  SELECT CAST(FLOOR(ROUND(({d2p}) /
    list_reduce(list_transform(range(1, 65),
      i -> (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)
           * (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)),
      (x, y) -> x + y), 6) * 10) AS BIGINT) AS ratio_bucket
  FROM s a JOIN s b ON a.vec_id < b.vec_id
  WHERE list_reduce(list_transform(range(1, 65),
      i -> (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)
           * (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)),
      (x, y) -> x + y) > 0
)
SELECT ratio_bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1
"""


ORACLES["vec_rp_distortion"] = _rp_distortion_oracle()


def _semantic_keep_oracle() -> str:
    """dedup_semantic_keep: documents minus the vec_b side of the
    LSH near-dup pair set (same generated SQL as dedup_embedding_lsh,
    wrapped as a drop-list anti-join)."""
    pairs_sql = _neardup_lsh_oracle(0.4)
    return f"""
WITH pairs AS MATERIALIZED ({pairs_sql})
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT DISTINCT vec_b FROM pairs)
"""


ORACLES["dedup_semantic_keep"] = _semantic_keep_oracle()

def _kmeans_oracle(k: int = 8, iters: int = 3, scale: int = 1 << 20) -> str:
    """vec_kmeans mirrored end-to-end: identical quantization
    (floor(v·2²⁰+0.5) BIGINTs), identical md5-seeded init, ``iters``
    Lloyd rounds UNROLLED as CTEs (exact integer distances, floor-avg
    centroid updates with the same <2⁵³ double-exactness argument,
    COALESCE for emptied clusters), final assignment against the
    round-``iters`` centroids — the PageRank-oracle pattern applied
    to clustering."""
    parts = [
        f"""
WITH q AS MATERIALIZED (
  SELECT vec_id,
         unnest(range(0, len(embedding))) AS pos,
         unnest(list_transform(range(1, len(embedding) + 1),
                i -> CAST(FLOOR(embedding[i]::DOUBLE * {scale} + 0.5)
                          AS BIGINT))) AS qv
  FROM embeddings
),
ids AS (
  SELECT vec_id, CAST(rn - 1 AS INTEGER) AS cluster
  FROM (
    SELECT vec_id, ROW_NUMBER() OVER (
      ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
    FROM embeddings
  ) WHERE rn <= {k}
),
c0 AS (
  SELECT i.cluster, q.pos, q.qv AS c
  FROM ids i JOIN q ON i.vec_id = q.vec_id
)"""
    ]
    for t in range(iters):
        parts.append(
            f""",
d{t} AS (
  SELECT q.vec_id, c.cluster,
         SUM((q.qv - c.c) * (q.qv - c.c)) AS dist
  FROM q JOIN c{t} c ON q.pos = c.pos
  GROUP BY 1, 2
),
a{t} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM d{t}
  ) WHERE rn = 1
),
s{t} AS (
  SELECT a.cluster, q.pos,
         CAST(FLOOR(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM a{t} a JOIN q ON a.vec_id = q.vec_id
  GROUP BY 1, 2
),
c{t + 1} AS (
  SELECT old.cluster, old.pos, COALESCE(s.c, old.c) AS c
  FROM c{t} old LEFT JOIN s{t} s
    ON old.cluster = s.cluster AND old.pos = s.pos
)"""
        )
    parts.append(
        f""",
df AS (
  SELECT q.vec_id, c.cluster,
         SUM((q.qv - c.c) * (q.qv - c.c)) AS dist
  FROM q JOIN c{iters} c ON q.pos = c.pos
  GROUP BY 1, 2
),
af AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT vec_id, cluster, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM df
  ) WHERE rn = 1
)
SELECT af.vec_id, af.cluster, CAST(af.dist AS BIGINT) AS dist_q,
       sz.n AS cluster_size
FROM af JOIN (
  SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n FROM af GROUP BY 1
) sz ON af.cluster = sz.cluster
"""
    )
    return "".join(parts)


ORACLES["vec_kmeans"] = _kmeans_oracle()


def _ivf_cells_oracle(refine_steps: int = 2, scale: int = 1 << 20) -> str:
    """vec_ivf_cells mirrored end-to-end (vector/ivf.ivf_cells_exact):
    identical quantization, LABEL-seeded integer centroids (vs
    vec_kmeans' md5-seeded init), ``refine_steps`` Lloyd rounds
    unrolled as CTEs, COALESCE for emptied cells, final assignment
    with the (dist, cell) tiebreak — so the IVF coarse quantizer's
    cell assignment (= the ANN table's partition layout at scale)
    gets a full hash gate."""
    parts = [
        f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, label,
         unnest(range(0, len(embedding))) AS pos,
         unnest(list_transform(range(1, len(embedding) + 1),
                i -> CAST(FLOOR(embedding[i]::DOUBLE * {scale} + 0.5)
                          AS BIGINT))) AS qv
  FROM embeddings
),
c0 AS (
  SELECT label AS cell, pos,
         CAST(FLOOR(CAST(SUM(qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM q GROUP BY 1, 2
)"""
    ]
    for t in range(refine_steps):
        parts.append(
            f""",
d{t} AS (
  SELECT q.vec_id, c.cell,
         SUM((q.qv - c.c) * (q.qv - c.c)) AS dist
  FROM q JOIN c{t} c ON q.pos = c.pos
  GROUP BY 1, 2
),
a{t} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist, cell) AS rn
    FROM d{t}
  ) WHERE rn = 1
),
s{t} AS (
  SELECT a.cell, q.pos,
         CAST(FLOOR(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM a{t} a JOIN q ON a.vec_id = q.vec_id
  GROUP BY 1, 2
),
c{t + 1} AS (
  SELECT old.cell, old.pos, COALESCE(s.c, old.c) AS c
  FROM c{t} old LEFT JOIN s{t} s
    ON old.cell = s.cell AND old.pos = s.pos
)"""
        )
    parts.append(
        f""",
df AS (
  SELECT q.vec_id, c.cell,
         SUM((q.qv - c.c) * (q.qv - c.c)) AS dist
  FROM q JOIN c{refine_steps} c ON q.pos = c.pos
  GROUP BY 1, 2
),
af AS (
  SELECT vec_id, cell, dist FROM (
    SELECT vec_id, cell, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist, cell) AS rn
    FROM df
  ) WHERE rn = 1
)
SELECT af.vec_id, l.label, af.cell, CAST(af.dist AS BIGINT) AS dist_q,
       sz.n AS cell_size
FROM af
JOIN (SELECT vec_id, label FROM embeddings) l ON af.vec_id = l.vec_id
JOIN (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM af GROUP BY 1
) sz ON af.cell = sz.cell
"""
    )
    return "".join(parts)


ORACLES["vec_ivf_cells"] = _ivf_cells_oracle()


def _pq_codes_oracle(
    m: int = 8, k: int = 16, steps: int = 2, scale: int = 1 << 20, dim: int = 64
) -> str:
    """vec_pq_codes mirrored end-to-end (vector/pq.pq_codes_exact):
    the per-subspace PQ codebook training + assignment as unrolled
    CTEs — identical quantization to vec_ivf_cells, subspace id =
    pos // width, label%k-seeded codewords, ``steps`` integer Lloyd
    rounds with COALESCE for emptied codewords, final (dist, code)
    argmin per (vector, subspace)."""
    width = dim // m
    parts = [
        f"""
WITH q0 AS MATERIALIZED (
  SELECT vec_id, label,
         unnest(range(0, len(embedding))) AS pos,
         unnest(list_transform(range(1, len(embedding) + 1),
                i -> CAST(FLOOR(embedding[i]::DOUBLE * {scale} + 0.5)
                          AS BIGINT))) AS qv
  FROM embeddings
),
q AS MATERIALIZED (
  SELECT vec_id, label,
         CAST(pos // {width} AS INTEGER) AS sub,
         CAST(pos % {width} AS INTEGER) AS spos, qv
  FROM q0
),
c0 AS (
  SELECT sub, CAST(label % {k} AS INTEGER) AS code, spos,
         CAST(FLOOR(CAST(SUM(qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM q GROUP BY 1, 2, 3
)"""
    ]
    for t in range(steps):
        parts.append(
            f""",
d{t} AS (
  SELECT q.vec_id, q.sub, c.code,
         SUM((q.qv - c.c) * (q.qv - c.c)) AS dist
  FROM q JOIN c{t} c ON q.sub = c.sub AND q.spos = c.spos
  GROUP BY 1, 2, 3
),
a{t} AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, code) AS rn
    FROM d{t}
  ) WHERE rn = 1
),
s{t} AS (
  SELECT a.sub, a.code, q.spos,
         CAST(FLOOR(CAST(SUM(q.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM a{t} a JOIN q ON a.vec_id = q.vec_id AND a.sub = q.sub
  GROUP BY 1, 2, 3
),
c{t + 1} AS (
  SELECT old.sub, old.code, old.spos, COALESCE(s.c, old.c) AS c
  FROM c{t} old LEFT JOIN s{t} s
    ON old.sub = s.sub AND old.code = s.code AND old.spos = s.spos
)"""
        )
    parts.append(
        f""",
df AS (
  SELECT q.vec_id, q.sub, c.code,
         SUM((q.qv - c.c) * (q.qv - c.c)) AS dist
  FROM q JOIN c{steps} c ON q.sub = c.sub AND q.spos = c.spos
  GROUP BY 1, 2, 3
)
SELECT vec_id, sub, code, CAST(dist AS BIGINT) AS dist_q FROM (
  SELECT vec_id, sub, code, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                            ORDER BY dist, code) AS rn
  FROM df
) WHERE rn = 1
"""
    )
    return "".join(parts)


ORACLES["vec_pq_codes"] = _pq_codes_oracle()

# vec_pq_distortion: the m·k-cell error profile is a plain GROUP BY
# over the SAME encoder CTE — any drift in training or assignment
# shows up as a sum/max mismatch here too
ORACLES["vec_pq_distortion"] = f"""
SELECT sub, code, COUNT(*) AS n_vecs,
       CAST(SUM(dist_q) AS BIGINT) AS sum_err_q,
       CAST(MAX(dist_q) AS BIGINT) AS max_err_q
FROM ({_pq_codes_oracle()}) codes
GROUP BY sub, code
"""

ORACLES["vec_knn_outliers"] = """
WITH s AS (
  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 300
),
pairs AS (
  SELECT a.vec_id AS va, a.label AS la,
    ROUND(sqrt(list_reduce(list_transform(range(1, 65),
      i -> (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)
           * (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)),
      (x, y) -> x + y)), 6) AS dist
  FROM s a JOIN s b ON a.vec_id <> b.vec_id
),
kth AS (
  SELECT va AS vec_id, la AS label, dist AS knn_dist
  FROM (
    SELECT va, la, dist,
      ROW_NUMBER() OVER (PARTITION BY va ORDER BY dist, la) AS rn
    FROM pairs
  ) WHERE rn = 5
)
SELECT vec_id, label, knn_dist FROM kth
ORDER BY knn_dist DESC, vec_id LIMIT 20
"""


def _bucket_profile_oracle() -> str:
    """vec_lsh_bucket_profile: the identical md5-seeded sign-bit
    index rebuilt in SQL (same plane constants as vector.lsh, so the
    two engines cannot drift), then pure integer occupancy rollups."""
    from .vector.lsh import N_BITS, N_TABLES, planes

    ps = planes(64, N_TABLES, N_BITS)

    def arr(vals):
        return "[" + ", ".join(repr(v) for v in vals) + "]::DOUBLE[]"

    sig_selects = []
    for t in range(N_TABLES):
        bits = " + ".join(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> embedding[i]::DOUBLE * ({arr(ps[t][j])})[i])) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(N_BITS)
        )
        sig_selects.append(
            f"SELECT vec_id, {t} AS table_id, ({bits}) AS sig"
            " FROM embeddings"
        )
    sigs_sql = "\nUNION ALL\n".join(sig_selects)
    return f"""
WITH sigs AS (
{sigs_sql}
),
widths AS (
  SELECT table_id, sig, COUNT(*) AS w FROM sigs GROUP BY 1, 2
)
SELECT table_id,
  CAST(COUNT(*) AS BIGINT) AS n_buckets,
  CAST(SUM(w) AS BIGINT) AS n_vectors,
  CAST(MIN(w) AS BIGINT) AS min_width,
  CAST(MAX(w) AS BIGINT) AS max_width
FROM widths GROUP BY table_id
"""


ORACLES["vec_lsh_bucket_profile"] = _bucket_profile_oracle()


def _semantic_clusters_oracle() -> str:
    """dedup_semantic_clusters: recursive-CTE connected components
    (min reachable vec_id) over the mirrored adaptive-width LSH
    near-dup pair SQL — the embedding twin of dedup_clusters'
    oracle."""
    pairs_sql = _neardup_lsh_oracle(0.4)
    return f"""
WITH p AS MATERIALIZED ({pairs_sql}),
edges AS (
  SELECT vec_a AS a, vec_b AS b FROM p
  UNION
  SELECT vec_b, vec_a FROM p
),
cc AS (
  WITH RECURSIVE walk(node, comp) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.b, walk.comp FROM walk JOIN edges e ON walk.node = e.a
  )
  SELECT node, MIN(comp) AS cluster_id FROM walk GROUP BY node
)
SELECT node AS vec_id, cluster_id FROM cc
"""


ORACLES["dedup_semantic_clusters"] = _semantic_clusters_oracle()


ORACLES["vec_kmeans_profile"] = f"""
WITH a AS ({_kmeans_oracle()})
SELECT cluster,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(dist_q) AS BIGINT) AS inertia_q,
       CAST(MAX(dist_q) AS BIGINT) AS max_dist_q
FROM a GROUP BY cluster
"""


ORACLES["bridge_cluster_lang"] = f"""
WITH a AS ({_kmeans_oracle()})
SELECT a.cluster, d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM a JOIN documents d ON a.vec_id = d.doc_id
GROUP BY a.cluster, d.lang
"""


ORACLES["dedup_semantic_cluster_keep"] = f"""
WITH members AS ({ORACLES["dedup_semantic_clusters"]})
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (
  SELECT vec_id FROM members WHERE vec_id <> cluster_id
)
"""


def _lsh_refresh_oracle() -> str:
    """vec_lsh_refresh: the incremental signature-index refresh twin.
    Spark builds the index on vec_id%5!=0 and appends signatures for
    the %5==0 delta through vector.lsh.refresh_index; this oracle
    rebuilds EVERY signature from scratch with the same md5-seeded
    plane constants — a hash match proves the append path emits
    byte-identical index content to a full rebuild."""
    from .vector.lsh import N_BITS, N_TABLES, planes

    ps = planes(64, N_TABLES, N_BITS)

    def arr(vals):
        return "[" + ", ".join(repr(v) for v in vals) + "]::DOUBLE[]"

    sig_selects = []
    for t in range(N_TABLES):
        bits = " + ".join(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> embedding[i]::DOUBLE * ({arr(ps[t][j])})[i])) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(N_BITS)
        )
        sig_selects.append(
            f"SELECT CAST(vec_id AS BIGINT) AS vec_id,"
            f" CAST({t} AS BIGINT) AS table_id,"
            f" CAST(({bits}) AS BIGINT) AS sig"
            " FROM embeddings"
        )
    return "\nUNION ALL\n".join(sig_selects)


ORACLES["vec_lsh_refresh"] = _lsh_refresh_oracle()
