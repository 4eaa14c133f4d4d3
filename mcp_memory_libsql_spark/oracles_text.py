"""DuckDB oracle SQL for the text/dedup queries.

The shingle CTE mirrors ``textops.tokenize`` / ``textops.dedup``
exactly: lowercase [a-z0-9]+ tokens, distinct 3-gram shingles,
document-frequency cap 100, md5-derived portable hashes.
"""

_STOP_EN = "['the','of','and','to','in','is','it','that','a']"
_STOP_ES = "['el','la','de','que','y','en','un','es']"
_STOP_DE = "['der','die','das','und','ist','von','mit','zu']"
_STOP_FR = "['le','la','de','et','un','est','pour','que']"

SHINGLE_CTE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
),
sh0 AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE []::VARCHAR[] END)) AS shingle
  FROM toks
),
freq AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > 100),
sh AS (SELECT doc_id, shingle FROM sh0
       WHERE shingle NOT IN (SELECT shingle FROM freq))
"""

_MINHASH_COLS = ", ".join(
    "MIN(('0x' || substr(md5("
    + ("shingle" if i < 4 else "'x:' || shingle")
    + f"), {1 + 8 * (i % 4)}, 8))::BIGINT) AS h{i}"
    for i in range(8)
)

MINHASH_CTE = (
    SHINGLE_CTE
    + f""",
sig AS (SELECT doc_id, {_MINHASH_COLS} FROM sh GROUP BY doc_id)
"""
)

_BAND_SELECTS = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, '{b}' || '_' || CAST(h{2 * b} AS VARCHAR) || '_' || "
    f"CAST(h{2 * b + 1} AS VARCHAR) AS band_key FROM sig"
    for b in range(4)
)

ORACLES: dict[str, str] = {}

ORACLES["dedup_exact"] = """
SELECT md5(text) AS h, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1
"""

ORACLES["dedup_ngram_jaccard"] = (
    SHINGLE_CTE
    + """,
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT doc_a, doc_b, inter_size, sa.sz AS size_a, sb.sz AS size_b,
         ROUND(inter_size / (sa.sz + sb.sz - inter_size), 6) AS jaccard
  FROM pairs
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
)
WHERE jaccard >= 0.1
"""
)

ORACLES["dedup_minhash"] = MINHASH_CTE + "SELECT * FROM sig"

ORACLES["dedup_minhash_lsh"] = (
    MINHASH_CTE
    + f""",
banded AS (
{_BAND_SELECTS}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_key = b.band_key AND a.doc_id < b.doc_id
"""
)

# Capped twin: identical banding, with split_fat_buckets mirrored —
# band buckets over 64 members split into ceil(2·count/64) md5
# sub-buckets (window count → sub-key → window recount), singleton
# and still-overfull sub-buckets dropped (2..cap keep-rule applied
# post-split).
ORACLES["dedup_minhash_lsh_capped"] = (
    MINHASH_CTE
    + f""",
banded0 AS (
{_BAND_SELECTS}
),
bc AS (
  SELECT *, COUNT(*) OVER (PARTITION BY band_key) AS cnt FROM banded0
),
banded AS (
  SELECT doc_id,
         band_key || '#' || CAST(
           ('0x' || substr(md5(band_key || '#' ||
                               CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % (CASE WHEN cnt <= 64 THEN 1 ELSE (2 * cnt + 63) // 64 END)
         AS VARCHAR) AS band_key
  FROM bc WHERE cnt >= 2
),
ok AS (
  SELECT band_key FROM banded GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 64
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_key = b.band_key AND a.doc_id < b.doc_id
WHERE a.band_key IN (SELECT band_key FROM ok)
"""
)

ORACLES["dedup_simhash"] = (
    SHINGLE_CTE
    + """,
hashes AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
),
bits AS (
  SELECT doc_id, j, (h >> j) & 1 AS bit
  FROM hashes CROSS JOIN (SELECT unnest(range(0, 60)) AS j) js
),
votes AS (
  SELECT doc_id, j, SUM(2 * bit - 1) AS vote FROM bits GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << CAST(j AS INTEGER))
                     ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""
)

ORACLES["text_quality"] = f"""
SELECT doc_id,
  CAST(length(text) AS INTEGER) AS n_chars_q,
  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS n_tokens,
  CASE WHEN length(text) > 0 THEN
    ROUND(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / length(text), 4)
  END AS punct_ratio,
  CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0 THEN
    ROUND(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                          x -> list_contains({_STOP_EN}, x)))
          / len(regexp_extract_all(lower(text), '[a-z0-9]+')), 4)
  END AS stopword_ratio,
  CASE WHEN length(text) > 0 THEN
    ROUND(length(regexp_replace(text, '[^A-Z]', '', 'g')) / length(text), 4)
  END AS upper_ratio
FROM documents
"""

ORACLES["text_tokens"] = """
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[^ \\t\\n\\r\\f\\x0B]+')) AS INTEGER) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f\\x0B]'))
       AS INTEGER) AS bpe_tokens
FROM documents
"""

ORACLES["text_fertility"] = """
WITH c AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '[^ \\t\\n\\r\\f\\x0B]+')) AS BIGINT) AS ws,
         CAST(len(regexp_extract_all(text,
              '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f\\x0B]')) AS BIGINT) AS bpe
  FROM documents
)
SELECT lang, COUNT(*)::BIGINT AS n_docs,
       SUM(ws)::BIGINT AS ws_tokens,
       SUM(bpe)::BIGINT AS bpe_tokens,
       CASE WHEN SUM(ws) > 0
            THEN ROUND(SUM(bpe)::BIGINT / SUM(ws)::BIGINT, 6) END
         AS fertility
FROM c GROUP BY lang
"""

ORACLES["text_langid"] = f"""
WITH t AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents
),
h AS (
  SELECT doc_id, lang,
    len(list_filter(w, x -> list_contains({_STOP_EN}, x))) AS en,
    len(list_filter(w, x -> list_contains({_STOP_ES}, x))) AS es,
    len(list_filter(w, x -> list_contains({_STOP_DE}, x))) AS de,
    len(list_filter(w, x -> list_contains({_STOP_FR}, x))) AS fr
  FROM t
)
SELECT doc_id, lang,
  CASE WHEN greatest(en, es, de, fr) = 0 THEN 'other'
       WHEN en = greatest(en, es, de, fr) THEN 'en'
       WHEN es = greatest(en, es, de, fr) THEN 'es'
       WHEN de = greatest(en, es, de, fr) THEN 'de'
       ELSE 'fr' END AS lang_pred
FROM h
"""

ORACLES["text_fingerprint"] = """
SELECT doc_id,
  md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))) AS fp,
  ('0x' || substr(md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))), 1, 15))::BIGINT
    AS fp64
FROM documents
"""

ORACLES["text_quality_filter"] = f"""
SELECT doc_id, n_tokens, stopword_ratio FROM ({ORACLES["text_quality"]})
WHERE n_tokens >= 30 AND stopword_ratio <= 0.2
"""

ORACLES["dedup_keep_docs"] = (
    SHINGLE_CTE
    + """,
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT doc_a, doc_b,
         ROUND(inter_size / (sa.sz + sb.sz - inter_size), 6) AS jaccard
  FROM pairs
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
)
SELECT d.doc_id, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_b FROM scored WHERE jaccard >= 0.5)
"""
)

ORACLES["dedup_simhash_pairs"] = (
    SHINGLE_CTE
    + """,
hashes AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
),
bits AS (
  SELECT doc_id, j, (h >> j) & 1 AS bit
  FROM hashes CROSS JOIN (SELECT unnest(range(0, 60)) AS j) js
),
votes AS (
  SELECT doc_id, j, SUM(2 * bit - 1) AS vote FROM bits GROUP BY doc_id, j
),
sims AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << CAST(j AS INTEGER))
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
),
banded AS (
  SELECT doc_id, simhash,
         CAST(c AS VARCHAR) || '_' ||
         CAST((simhash >> (CAST(c AS INTEGER) * 15)) & 32767 AS VARCHAR)
           AS chunk_key
  FROM sims CROSS JOIN (SELECT unnest(range(0, 4)) AS c) cs
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM banded a JOIN banded b
    ON a.chunk_key = b.chunk_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= 6
"""
)

# Capped twin: identical banding, with the Spark side's
# split_fat_buckets rule mirrored verbatim — chunk buckets over 64
# members are SPLIT into ceil(2·count/64) md5 sub-buckets (window
# count → sub-key → window recount), singleton and still-overfull
# sub-buckets dropped (the 2..cap keep-rule applied post-split).
ORACLES["dedup_simhash_capped"] = (
    SHINGLE_CTE
    + """,
hashes AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
),
bits AS (
  SELECT doc_id, j, (h >> j) & 1 AS bit
  FROM hashes CROSS JOIN (SELECT unnest(range(0, 60)) AS j) js
),
votes AS (
  SELECT doc_id, j, SUM(2 * bit - 1) AS vote FROM bits GROUP BY doc_id, j
),
sims AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << CAST(j AS INTEGER))
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
),
banded0 AS (
  SELECT doc_id, simhash,
         CAST(c AS VARCHAR) || '_' ||
         CAST((simhash >> (CAST(c AS INTEGER) * 15)) & 32767 AS VARCHAR)
           AS chunk_key
  FROM sims CROSS JOIN (SELECT unnest(range(0, 4)) AS c) cs
),
bc AS (
  SELECT *, COUNT(*) OVER (PARTITION BY chunk_key) AS cnt FROM banded0
),
banded AS (
  SELECT doc_id, simhash,
         chunk_key || '#' || CAST(
           ('0x' || substr(md5(chunk_key || '#' ||
                               CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % (CASE WHEN cnt <= 64 THEN 1 ELSE (2 * cnt + 63) // 64 END)
         AS VARCHAR) AS chunk_key
  FROM bc WHERE cnt >= 2
),
ok AS (
  SELECT chunk_key FROM banded
  GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM banded a JOIN banded b
    ON a.chunk_key = b.chunk_key AND a.doc_id < b.doc_id
  WHERE a.chunk_key IN (SELECT chunk_key FROM ok)
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= 6
"""
)

ORACLES["text_top_terms"] = """
SELECT term, COUNT(*) AS total_freq,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
)
GROUP BY term
ORDER BY total_freq DESC, term
LIMIT 50
"""

ORACLES["text_chunks"] = """
SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       CAST(i * 160 AS BIGINT) AS chunk_start,
       substr(text, CAST(i * 160 + 1 AS INTEGER), 200) AS chunk_text,
       CAST(length(substr(text, CAST(i * 160 + 1 AS INTEGER), 200)) AS INTEGER)
         AS chunk_chars
FROM (
  SELECT doc_id, text,
         unnest(range(0, (greatest(length(text), 1) - 1) // 160 + 1)) AS i
  FROM documents
)
"""

ORACLES["text_pack_bins"] = """
SELECT doc_id, lang, (cum - n_chars) // 2000 AS bin_id
FROM (
  SELECT doc_id, lang, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
"""

# data_shard_plan: the oracle IS the one-window global prefix sum the
# Spark side deliberately avoids (DuckDB runs single-node, so a global
# ORDER BY window is fine here) — if the block/offset two-pass drifts
# from a true global cumsum by even one token, the hash breaks
ORACLES["data_shard_plan"] = """
SELECT doc_id, n_tokens,
       (cum - n_tokens) // 2000 AS shard_id,
       (cum - n_tokens) - ((cum - n_tokens) // 2000) * 2000
         AS offset_tokens
FROM (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
              AS BIGINT) AS n_tokens,
         SUM(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                  AS BIGINT))
           OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
"""

# data_shard_plan_incremental: the oracle deliberately takes the
# RECOMPUTE path — a full-corpus cumsum filtered to the incoming docs
# — so the hash match proves the append-only plan (which never
# re-scans the old corpus) lands every new doc exactly where a full
# replan would
ORACLES["data_shard_plan_incremental"] = """
SELECT doc_id, n_tokens,
       (cum - n_tokens) // 2000 AS shard_id,
       (cum - n_tokens) - ((cum - n_tokens) // 2000) * 2000
         AS offset_tokens
FROM (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
              AS BIGINT) AS n_tokens,
         SUM(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                  AS BIGINT))
           OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
WHERE doc_id >= 250
"""

ORACLES["text_length_histogram"] = """
SELECT CAST(n_chars // 50 AS BIGINT) * 50 AS bucket,
       COUNT(*) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY 1
"""

ORACLES["text_corpus_stats"] = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
         AS total_tokens
FROM documents
GROUP BY lang, source
"""

ORACLES["mm_resize_meta"] = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(64 AS INTEGER) AS width,
       CAST(48 AS INTEGER) AS height,
       CAST(n_chars % 10 + 1 AS INTEGER) AS n_frames
FROM documents
"""

ORACLES["mm_kind_stats"] = """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       COUNT(*) AS n_media,
       CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
       CAST(MIN(length(text)) AS INTEGER) AS min_bytes,
       CAST(MAX(length(text)) AS INTEGER) AS max_bytes
FROM documents
GROUP BY 1
"""

# Multimodal feature extraction oracle. The synthesized media payload
# is the utf-8 document text (all testdata docs are pure ASCII, so
# byte arithmetic == character arithmetic in SQL): n_bytes = length,
# mean_intensity = mean byte value, frame_hashes = md5 of even
# byte-range frames (step = len // n_frames, remainder dropped),
# '|'-joined. Mirrors multimodal/media.py exactly.
# Frame geometry mirrors make_frame_parser: video = BALANCED split at
# the real AVI chunk boundaries ((i*n) div k .. ((i+1)*n) div k, covers
# every byte); image/audio = truncating even split (step = n div k).
ORACLES["mm_features"] = """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         text,
         greatest(CAST(n_chars % 10 + 1 AS INTEGER), 1) AS nf,
         CAST(length(text) AS INTEGER) AS n_bytes
  FROM documents
),
f AS (
  SELECT media_id, kind, text, nf, n_bytes,
         greatest(n_bytes // nf, 1) AS step
  FROM media
)
SELECT media_id, kind, n_bytes,
  CAST(list_sum(list_transform(string_split(text, ''), c -> unicode(c)))
       AS DOUBLE) / n_bytes AS mean_intensity,
  array_to_string(
    list_transform(
      list_filter(
        list_transform(range(0, nf),
          i -> CASE WHEN kind = 'video'
               THEN substr(text, CAST((i * n_bytes) // nf + 1 AS INTEGER),
                           CAST(((i + 1) * n_bytes) // nf
                                - (i * n_bytes) // nf AS INTEGER))
               ELSE substr(text, CAST(i * step + 1 AS INTEGER),
                           CAST(step AS INTEGER)) END),
        s -> s <> ''),
      s -> md5(s)),
    '|') AS frame_hashes
FROM f
"""

_EST_AGREE = " + ".join(
    f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(8)
)

ORACLES["dedup_minhash_est"] = (
    MINHASH_CTE
    + f""",
banded AS (
{_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(({_EST_AGREE}) / 8, 6) AS est_jaccard
FROM cand
JOIN sig sa ON doc_a = sa.doc_id
JOIN sig sb ON doc_b = sb.doc_id
"""
)

# Cluster-level dedup: recursive-CTE components over the same banded
# MinHash-LSH candidate pairs the dedup_minhash_lsh oracle derives —
# cluster = min doc_id reachable in the undirected pair graph.
_LSH_PAIRS_CTE = f""",
banded AS (
{_BAND_SELECTS}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
cc AS (
  WITH RECURSIVE walk(node, comp) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.b, walk.comp FROM walk JOIN edges e ON walk.node = e.a
  )
  SELECT node, MIN(comp) AS cluster_id FROM walk GROUP BY node
)
"""

ORACLES["dedup_clusters"] = (
    MINHASH_CTE + _LSH_PAIRS_CTE + "SELECT node AS doc_id, cluster_id FROM cc"
)

ORACLES["dedup_cluster_keep"] = (
    MINHASH_CTE
    + _LSH_PAIRS_CTE
    + """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)
"""
)

ORACLES["data_split_assign"] = """
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4))
           ::BIGINT % 100 AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""

ORACLES["text_stratified_sample"] = """
WITH b AS (
  SELECT doc_id, lang, source,
         ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 4))
           ::BIGINT % 1000 AS bucket
  FROM documents
)
SELECT doc_id, lang, source, bucket FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 500
                         WHEN 'es' THEN 500 WHEN 'fr' THEN 700
                         WHEN 'zh' THEN 700 ELSE 0 END
"""

ORACLES["text_pii_scrub"] = r"""
WITH pii AS (
  SELECT doc_id,
         text || ' Contact: user' || CAST(doc_id AS VARCHAR)
              || '@example.com, call +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ', see https://example.com/u/' || CAST(doc_id AS VARCHAR)
              || ' now.' AS text
  FROM documents
)
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}', '<PHONE>', 'g') AS scrubbed
FROM pii
"""


# The composed curation pipeline: quality filter -> cluster dedup
# keep -> stratified sample -> split assign, assembled from the same
# fragments the individual oracles use.
ORACLES["corpus_curate"] = (
    MINHASH_CTE
    + _LSH_PAIRS_CTE
    + f""",
quality AS (
  SELECT doc_id FROM ({ORACLES["text_quality"]})
  WHERE n_tokens >= 30 AND stopword_ratio <= 0.2
),
kept AS (
  SELECT d.doc_id, d.lang, d.source
  FROM documents d JOIN quality q ON d.doc_id = q.doc_id
  WHERE d.doc_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)
),
sampled AS (
  SELECT doc_id, lang, source,
         ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 4))
           ::BIGINT % 1000 AS sample_bucket
  FROM kept
)
SELECT doc_id, lang, source, sample_bucket,
  CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4))
            ::BIGINT % 100 < 80 THEN 'train'
       WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4))
            ::BIGINT % 100 < 90 THEN 'val'
       ELSE 'test' END AS split
FROM sampled
WHERE sample_bucket < CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 500
                                WHEN 'es' THEN 500 WHEN 'fr' THEN 700
                                WHEN 'zh' THEN 700 ELSE 0 END
"""
)

# Frame sampling over the synthesized (ASCII) payloads: frame i is
# the byte range [i*step, (i+1)*step), step = len // n_frames, kept
# when i % 2 = 0 — byte arithmetic == char arithmetic because the
# corpus is pure ASCII, so md5-of-substring is the frame hash.
# Video rows (doc_id % 3 = 2) cut at the REAL AVI chunk boundaries =
# the balanced split; image/audio keep the truncating even split.
ORACLES["mm_frame_sample"] = """
WITH m AS (
  SELECT doc_id AS media_id, text,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         CAST(n_chars % 10 + 1 AS INTEGER) AS n_frames,
         CAST(length(text) AS INTEGER) AS n,
         GREATEST(length(text) // (n_chars % 10 + 1), 1) AS step
  FROM documents
),
frames AS (
  SELECT media_id, kind, CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx,
         text, step, n, n_frames
  FROM m
),
cut AS (
  SELECT media_id, frame_idx,
         CASE WHEN kind = 'video'
              THEN substr(text, CAST((frame_idx * n) // n_frames + 1 AS INTEGER),
                          CAST(((frame_idx + 1) * n) // n_frames
                               - (frame_idx * n) // n_frames AS INTEGER))
              ELSE substr(text, frame_idx * step + 1, step) END AS fr
  FROM frames
)
SELECT media_id, frame_idx,
       CAST(length(fr) AS INTEGER) AS frame_bytes,
       md5(fr) AS frame_md5
FROM cut
WHERE frame_idx % 2 = 0 AND length(fr) > 0
"""

# Non-distinct bigram frequency table (repeats matter for LM data):
# mirror of textops.quality.ngram_counts at n=2, k=100.
ORACLES["text_ngram_counts"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) >= 2
                     THEN list_transform(range(1, len(w)),
                                         i -> w[i] || ' ' || w[i+1])
                     ELSE []::VARCHAR[] END) AS ngram
  FROM toks
)
SELECT ngram, COUNT(*) AS total_freq, COUNT(DISTINCT doc_id) AS doc_freq
FROM grams
GROUP BY ngram
ORDER BY total_freq DESC, ngram
LIMIT 100
"""

# Decontamination containment — note NO doc-frequency cap (unlike
# SHINGLE_CTE): the check must see common shingles too.
ORACLES["text_decontaminate"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
),
sh0 AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE []::VARCHAR[] END)) AS shingle
  FROM toks
),
bench AS (SELECT doc_id AS bench_id, shingle FROM sh0 WHERE doc_id % 20 = 0),
corp AS (SELECT doc_id, shingle FROM sh0 WHERE doc_id % 20 <> 0),
bs AS (SELECT bench_id, COUNT(*) AS bench_size FROM bench GROUP BY 1),
inter AS (
  SELECT c.doc_id, b.bench_id, COUNT(*) AS inter_size
  FROM corp c JOIN bench b USING (shingle) GROUP BY 1, 2
)
SELECT i.doc_id, i.bench_id, i.inter_size, bs.bench_size,
       ROUND(CAST(i.inter_size AS DOUBLE) / bs.bench_size, 6) AS containment
FROM inter i JOIN bs USING (bench_id)
WHERE ROUND(CAST(i.inter_size AS DOUBLE) / bs.bench_size, 6) >= 0.5
"""

# Lexical rarity — integer-exact df stats per doc.
# Unigram-LM cross-entropy (CCNet-style perplexity filter signal).
# Per-token information content quantized to integer millibits BEFORE
# summation, so the per-doc total is exact BIGINT math in both
# engines (raw double log-prob sums would be fold-order- and
# libm-dependent); one deterministic division renders cross_entropy.
ORACLES["text_lm_score"] = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
           AS token
  FROM documents
),
vocab AS (SELECT token, COUNT(*)::BIGINT AS c FROM tok GROUP BY 1),
tot AS (
  SELECT SUM(c)::BIGINT AS n_total, COUNT(*)::BIGINT AS v_size FROM vocab
),
dt AS (SELECT doc_id, token, COUNT(*)::BIGINT AS m FROM tok GROUP BY 1, 2),
scored AS (
  SELECT doc_id, m,
         CAST(round(1000.0 * log2((c + 1) / (n_total + v_size)), 0)
              AS BIGINT) AS mb
  FROM dt JOIN vocab USING (token), tot
),
agg AS (
  SELECT doc_id, SUM(m)::BIGINT AS n_tokens,
         (-SUM(m * mb))::BIGINT AS ce_millibits
  FROM scored GROUP BY 1
)
SELECT doc_id, n_tokens, ce_millibits,
       ROUND(ce_millibits / (1000.0 * n_tokens), 6) AS cross_entropy
FROM agg
"""

ORACLES["text_rarity"] = """
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(
           regexp_extract_all(lower(text), '[a-z0-9]+'))) AS tok
  FROM documents
),
df AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok)
SELECT t.doc_id,
       COUNT(*) AS n_unique_tokens,
       ROUND(CAST(SUM(d.df) AS DOUBLE) / COUNT(*), 6) AS mean_df,
       ROUND(CAST(SUM(CASE WHEN d.df <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS rare_frac
FROM toks t JOIN df d USING (tok)
GROUP BY t.doc_id
"""

# Per-lang Pearson corr from exact integer moments.
ORACLES["text_len_token_corr"] = """
WITH m AS (
  SELECT lang, COUNT(*) AS n_docs,
         SUM(CAST(length(text) AS BIGINT)) AS sx,
         SUM(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
             AS BIGINT)) AS sy,
         SUM(CAST(length(text) AS BIGINT) * length(text)) AS sxx,
         SUM(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
             AS BIGINT)
           * len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS syy,
         SUM(CAST(length(text) AS BIGINT)
           * len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS sxy
  FROM documents GROUP BY lang
)
SELECT lang, n_docs,
       CASE WHEN n_docs * sxx - sx * sx > 0
             AND n_docs * syy - sy * sy > 0 THEN
         ROUND(CAST(n_docs * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)
                    * CAST(n_docs * syy - sy * sy AS DOUBLE)), 6)
       END AS corr
FROM m
"""

# Distinctive keywords — rational tf/df score (no log), deterministic
# (score DESC, token) tiebreak.
ORACLES["doc_keywords"] = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
           AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
r AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.token) AS rnk
  FROM tf JOIN df USING (token)
)
SELECT doc_id, token, tf, df,
       ROUND(CAST(tf AS DOUBLE) / df, 6) AS score
FROM r WHERE rnk <= 3
"""

# Gopher-style repetition profile — integer counts + integer
# cross-multiplied flag; deterministic argmax via max over
# (count, term) structs (Spark max(struct) == row_number tiebreak).
ORACLES["text_repetition"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents
),
wx AS (SELECT doc_id, unnest(w) AS term FROM toks),
wc AS (SELECT doc_id, term, COUNT(*) AS n FROM wx GROUP BY 1, 2),
wr AS (
  SELECT doc_id, term, n,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY n DESC, term DESC) AS rn
  FROM wc
),
wagg AS (
  SELECT wc.doc_id,
         SUM(wc.n)::BIGINT AS n_words,
         COUNT(*)::BIGINT AS n_distinct
  FROM wc GROUP BY 1
),
wtop AS (SELECT doc_id, term AS top_word, n::BIGINT AS top_word_n
         FROM wr WHERE rn = 1),
bg0 AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 2
              THEN list_transform(range(1, len(w)),
                                  i -> w[i] || ' ' || w[i+1])
              ELSE []::VARCHAR[] END AS bgs
  FROM toks
),
bx AS (SELECT doc_id, unnest(bgs) AS term FROM bg0),
bc AS (SELECT doc_id, term, COUNT(*) AS n FROM bx GROUP BY 1, 2),
br AS (
  SELECT doc_id, term, n,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY n DESC, term DESC) AS rn
  FROM bc
),
bagg AS (SELECT doc_id, SUM(n)::BIGINT AS n_bigrams FROM bc GROUP BY 1),
btop AS (SELECT doc_id, term AS top_bigram, n::BIGINT AS top_bigram_n
         FROM br WHERE rn = 1)
SELECT w.doc_id, w.n_words, w.n_distinct,
       t.top_word, t.top_word_n,
       COALESCE(b.n_bigrams, 0)::BIGINT AS n_bigrams,
       COALESCE(bt.top_bigram, '') AS top_bigram,
       COALESCE(bt.top_bigram_n, 0)::BIGINT AS top_bigram_n,
       (t.top_word_n * 5 > w.n_words * 1
        OR COALESCE(bt.top_bigram_n, 0) * 10
           > COALESCE(b.n_bigrams, 0) * 1) AS is_repetitive
FROM wagg w
JOIN wtop t USING (doc_id)
LEFT JOIN bagg b USING (doc_id)
LEFT JOIN btop bt USING (doc_id)
"""

# Incremental dedup: incoming (odd doc_id) minus existing (even),
# lead-prefix fingerprint (first 6 word tokens).
ORACLES["dedup_incremental"] = """
WITH fps AS (
  SELECT doc_id,
         md5(array_to_string(
           regexp_extract_all(lower(text), '[a-z0-9]+')[1:6], ' ')) AS fp
  FROM documents
),
existing AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0),
incoming AS (
  SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_batch_copies
  FROM fps WHERE doc_id % 2 = 1 GROUP BY 1
)
SELECT i.fp, i.keep_id, i.n_batch_copies
FROM incoming i ANTI JOIN existing e ON i.fp = e.fp
"""

# Overlapping audio-window framing over the synthesized ASCII
# payloads: window 64B / hop 32B, trailing partial kept. Byte == char
# arithmetic (pure-ASCII corpus); mean_byte is the mean ASCII code.
# Only doc_id % 3 = 1 rows are audio-kind (media.synthesize_media).
ORACLES["mm_audio_windows"] = """
WITH m AS (
  SELECT doc_id AS media_id, text,
         GREATEST(length(text) - 64, 0) AS mw
  FROM documents WHERE doc_id % 3 = 1
),
wins AS (
  SELECT media_id, text,
         CAST(unnest(range(0, mw + 32, 32)) AS INTEGER) AS win_start
  FROM m
),
cut AS (
  SELECT media_id, win_start,
         substr(text, win_start + 1, 64) AS w
  FROM wins
)
SELECT media_id,
       CAST(win_start // 32 AS INTEGER) AS win_idx,
       win_start,
       CAST(length(w) AS INTEGER) AS win_bytes,
       md5(w) AS win_md5,
       ROUND(list_sum(list_transform(range(1, length(w) + 1),
                                     i -> ascii(substr(w, i, 1))))
             / CAST(length(w) AS DOUBLE), 6) AS mean_byte
FROM cut WHERE length(w) > 0
"""


# Funnel counts for the composed curation pipeline: one row per stage.
ORACLES["corpus_curation_report"] = (
    MINHASH_CTE
    + _LSH_PAIRS_CTE
    + f""",
quality AS (
  SELECT doc_id FROM ({ORACLES["text_quality"]})
  WHERE n_tokens >= 30 AND stopword_ratio <= 0.2
),
kept AS (
  SELECT d.doc_id, d.lang
  FROM documents d JOIN quality q ON d.doc_id = q.doc_id
  WHERE d.doc_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)
),
curated AS (
  SELECT doc_id, lang,
    CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4))
              ::BIGINT % 100 < 80 THEN 'train'
         WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4))
              ::BIGINT % 100 < 90 THEN 'val'
         ELSE 'test' END AS split
  FROM (
    SELECT doc_id, lang,
           ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 4))
             ::BIGINT % 1000 AS sample_bucket
    FROM kept
  )
  WHERE sample_bucket < CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 500
                                  WHEN 'es' THEN 500 WHEN 'fr' THEN 700
                                  WHEN 'zh' THEN 700 ELSE 0 END
)
SELECT '0_raw' AS stage, COUNT(*)::BIGINT AS n_docs FROM documents
UNION ALL SELECT '1_quality', COUNT(*)::BIGINT FROM quality
UNION ALL SELECT '2_dedup', COUNT(*)::BIGINT FROM kept
UNION ALL SELECT '3_sample', COUNT(*)::BIGINT FROM curated
UNION ALL SELECT '4_train', COUNT(*)::BIGINT FROM curated WHERE split = 'train'
UNION ALL SELECT '5_val', COUNT(*)::BIGINT FROM curated WHERE split = 'val'
UNION ALL SELECT '6_test', COUNT(*)::BIGINT FROM curated WHERE split = 'test'
"""
)


ORACLES["text_lang_confusion"] = f"""
SELECT lang, lang_pred, COUNT(*) AS n_docs
FROM ({ORACLES["text_langid"]})
GROUP BY 1, 2
"""


# Substring-window dedup: distinct fixed-width character windows
# (width 40, stride 10) hashed per doc — the CTE mirrors
# textops.dedup.substring_fingerprints (in-row list_distinct ==
# Spark's array_distinct before the explode).
_SUBSTR_CTE = """
WITH w AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(0, length(text) - 40 + 1, 10),
           s -> md5(substr(text, CAST(s AS INTEGER) + 1, 40))))) AS h
  FROM documents WHERE length(text) >= 40
)"""

ORACLES["dedup_substring"] = (
    _SUBSTR_CTE
    + """,
ok AS (SELECT h FROM w GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 100)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       COUNT(*)::BIGINT AS shared_windows
FROM w a
JOIN ok ON a.h = ok.h
JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""
)

# the star twin over SPAN witnesses: keys are md5 over each ADJACENT
# window-hash pair (positional, not deduplicated first — mirrors
# textops.dedup.substring_span_fingerprints), so one shared key
# already encodes two consecutive shared windows (≥ width+stride
# contiguous copied chars) and the keep-independent threshold is 1 —
# the min-per-key star then provably has the clique-over-spans
# components (no post-star filtering exists to condition on keep)
_SUBSTR_SPAN_CTE = """
WITH hp AS (
  SELECT doc_id, list_transform(
           range(0, length(text) - 40 + 1, 10),
           s -> md5(substr(text, CAST(s AS INTEGER) + 1, 40))) AS hs
  FROM documents WHERE length(text) >= 50
),
w AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(hs)),
           i -> ('0x' || substr(md5(hs[CAST(i AS INTEGER)] || ':'
                    || hs[CAST(i AS INTEGER) + 1]), 1, 15))::BIGINT))) AS h
  FROM hp
)"""

_SUBSTR_STAR_BODY = """,
wc AS (
  SELECT h, doc_id,
         COUNT(*) OVER (PARTITION BY h) AS c,
         MIN(doc_id) OVER (PARTITION BY h) AS keep
  FROM w
)
SELECT keep AS doc_keep, doc_id AS doc_dup,
       COUNT(*)::BIGINT AS shared_spans
FROM wc
WHERE c BETWEEN 2 AND 100 AND doc_id <> keep
GROUP BY 1, 2
"""

ORACLES["dedup_substring_star"] = _SUBSTR_SPAN_CTE + _SUBSTR_STAR_BODY

# connected components over the star pair stream (recursive walk,
# exactly the dedup_clusters recipe) — the keep-list consumers
_STAR_CC_BODY = """,
star AS (
  SELECT keep AS doc_keep, doc_id AS doc_dup
  FROM wc WHERE c BETWEEN 2 AND 100 AND doc_id <> keep
  GROUP BY 1, 2
),
edges AS (
  SELECT doc_keep AS a, doc_dup AS b FROM star
  UNION
  SELECT doc_dup, doc_keep FROM star
),
cc AS (
  WITH RECURSIVE walk(node, comp) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.b, walk.comp FROM walk JOIN edges e ON walk.node = e.a
  )
  SELECT node, MIN(comp) AS cluster_id FROM walk GROUP BY node
)
"""

_SUBSTR_WC = """,
wc AS (
  SELECT h, doc_id,
         COUNT(*) OVER (PARTITION BY h) AS c,
         MIN(doc_id) OVER (PARTITION BY h) AS keep
  FROM w
)"""

ORACLES["dedup_substring_clusters"] = (
    _SUBSTR_SPAN_CTE
    + _SUBSTR_WC
    + _STAR_CC_BODY
    + "SELECT node AS doc_id, cluster_id FROM cc"
)

ORACLES["dedup_substring_keep"] = (
    _SUBSTR_SPAN_CTE
    + _SUBSTR_WC
    + _STAR_CC_BODY
    + """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)
"""
)

ORACLES["dedup_substring_docs"] = (
    _SUBSTR_CTE
    + """,
df AS (SELECT h, COUNT(*) AS c FROM w GROUP BY h)
SELECT w.doc_id, COUNT(*)::BIGINT AS n_windows,
       SUM(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END)::BIGINT
         AS dup_windows,
       ROUND(SUM(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END)
             / COUNT(*), 6) AS dup_frac
FROM w JOIN df ON w.h = df.h
GROUP BY 1
"""
)

ORACLES["text_char_classes"] = """
SELECT doc_id,
  CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
  CAST(length(text) - length(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]', '', 'g')) AS BIGINT) AS n_space,
  CAST(
    length(regexp_replace(text, '[A-Za-z]', '', 'g'))
    + length(regexp_replace(text, '[0-9]', '', 'g'))
    + length(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]', '', 'g'))
    + length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))
    - 3 * length(text) AS BIGINT) AS n_punct,
  CAST(length(text) - length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) AS BIGINT) AS n_nonascii
FROM documents
"""

ORACLES["text_ttr"] = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tc AS (SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY 1, 2)
SELECT doc_id,
  CAST(SUM(c) AS BIGINT) AS n_tokens,
  CAST(COUNT(*) AS BIGINT) AS n_types,
  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
  ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS ttr
FROM tc GROUP BY doc_id
"""

ORACLES["data_mixture_weights"] = """
WITH per AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS _total,
               COUNT(*) AS _n_langs FROM per)
SELECT lang, n_docs,
  ROUND(n_docs / CAST(_total AS DOUBLE), 6) AS share,
  ROUND(_total / CAST(_n_langs * n_docs AS DOUBLE), 6) AS weight
FROM per, tot
"""


ORACLES["dedup_lsh_eval"] = (
    MINHASH_CTE
    + f""",
banded AS (
{_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
ip AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
exact AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           ROUND(inter_size / (sa.sz + sb.sz - inter_size), 6) AS jaccard
    FROM ip
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
  ) WHERE jaccard >= 0.5
),
j AS (
  SELECT COALESCE(e.doc_a, c.doc_a) AS doc_a,
         COALESCE(e.doc_b, c.doc_b) AS doc_b,
         (e.doc_a IS NOT NULL) AS in_e, (c.doc_a IS NOT NULL) AS in_c
  FROM exact e FULL OUTER JOIN cand c
    ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b
),
agg AS (
  SELECT CAST(SUM(CASE WHEN in_e THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         CAST(SUM(CASE WHEN in_c THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
         CAST(SUM(CASE WHEN in_e AND in_c THEN 1 ELSE 0 END) AS BIGINT)
           AS n_common
  FROM j
)
SELECT CAST(0.5 AS DOUBLE) AS threshold, n_exact, n_cand, n_common,
  CASE WHEN n_exact > 0
       THEN ROUND(n_common / CAST(n_exact AS DOUBLE), 6) END AS recall,
  CASE WHEN n_cand > 0
       THEN ROUND(n_common / CAST(n_cand AS DOUBLE), 6) END AS precision
FROM agg
"""
)

ORACLES["mm_image_patches"] = """
WITH m AS (
  SELECT doc_id AS media_id, text, length(text) AS n,
    ((CAST(n_chars % 64 + 1 AS INTEGER)) + 15) // 16 AS nx,
    ((CAST(n_chars % 48 + 1 AS INTEGER)) + 15) // 16 AS ny
  FROM documents WHERE doc_id % 3 = 0
),
p AS (
  SELECT media_id, text, n, nx, ny,
         unnest(range(0, nx * ny)) AS idx
  FROM m
)
SELECT media_id,
  CAST(idx % nx AS INTEGER) AS px,
  CAST(idx // nx AS INTEGER) AS py,
  CAST((idx + 1) * n // (nx * ny) - idx * n // (nx * ny) AS INTEGER)
    AS patch_chars,
  md5(substr(text, CAST(idx * n // (nx * ny) + 1 AS INTEGER),
             CAST((idx + 1) * n // (nx * ny) - idx * n // (nx * ny)
                  AS INTEGER))) AS patch_md5
FROM p
WHERE (idx + 1) * n // (nx * ny) - idx * n // (nx * ny) > 0
"""

ORACLES["dedup_containment"] = (
    SHINGLE_CTE
    + """,
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT doc_a, doc_b, inter_size, sa.sz AS size_a, sb.sz AS size_b,
         ROUND(inter_size / CAST(least(sa.sz, sb.sz) AS DOUBLE), 6)
           AS containment
  FROM pairs
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
)
WHERE containment >= 0.5
"""
)

# Same per-kind frame geometry as mm_frame_sample (video = real AVI
# chunk boundaries = balanced split), stride 1.
ORACLES["mm_scene_cuts"] = """
WITH m AS (
  SELECT doc_id AS media_id, text,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         CAST(n_chars % 10 + 1 AS INTEGER) AS n_frames,
         CAST(length(text) AS INTEGER) AS n,
         GREATEST(length(text) // (n_chars % 10 + 1), 1) AS step
  FROM documents
),
frames AS (
  SELECT media_id, kind, CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx,
         text, step, n, n_frames
  FROM m
),
f0 AS (
  SELECT media_id, frame_idx,
         CASE WHEN kind = 'video'
              THEN substr(text, CAST((frame_idx * n) // n_frames + 1 AS INTEGER),
                          CAST(((frame_idx + 1) * n) // n_frames
                               - (frame_idx * n) // n_frames AS INTEGER))
              ELSE substr(text, frame_idx * step + 1, step) END AS fr
  FROM frames
),
f AS (
  SELECT media_id, frame_idx, md5(fr) AS frame_md5
  FROM f0 WHERE length(fr) > 0
),
c AS (
  SELECT media_id,
    CASE WHEN lag(frame_md5) OVER (PARTITION BY media_id
                                   ORDER BY frame_idx) IS NULL
           OR frame_md5 <> lag(frame_md5) OVER (PARTITION BY media_id
                                                ORDER BY frame_idx)
         THEN 1 ELSE 0 END AS is_cut
  FROM f
)
SELECT media_id,
  CAST(COUNT(*) AS BIGINT) AS n_frames_sampled,
  CAST(SUM(is_cut) AS BIGINT) AS n_scenes,
  ROUND(SUM(is_cut) / CAST(COUNT(*) AS DOUBLE), 6) AS cut_frac
FROM c GROUP BY media_id
"""

ORACLES["text_sample_k_per_lang"] = """
SELECT doc_id, lang, CAST(sample_rank AS INTEGER) AS sample_rank
FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS sample_rank
  FROM documents
)
WHERE sample_rank <= 50
"""

ORACLES["text_resample_balanced"] = """
WITH per AS (SELECT lang, COUNT(*) AS _n FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(_n) AS BIGINT) AS _total, COUNT(*) AS _L FROM per),
w AS (
  SELECT lang,
         least(1000, (1000 * _total) // (_L * _n)) AS keep_per_mille
  FROM per, tot
),
b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('balance:' || CAST(doc_id AS VARCHAR)), 1, 4))
           ::BIGINT % 1000 AS bucket
  FROM documents
)
SELECT doc_id, b.lang, bucket, CAST(keep_per_mille AS BIGINT)
  AS keep_per_mille
FROM b JOIN w ON b.lang = w.lang
WHERE bucket < keep_per_mille
"""

ORACLES["dedup_shingle_profile"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents
),
sh0 AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE []::VARCHAR[] END)) AS shingle
  FROM toks
),
df AS (SELECT shingle, COUNT(*) AS df FROM sh0 GROUP BY 1)
SELECT CAST(1::BIGINT << CAST(FLOOR(log2(df)) AS INTEGER) AS BIGINT)
         AS df_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df > 100 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_capped_bucket
FROM df GROUP BY 1
"""


ORACLES["dedup_source_overlap"] = (
    MINHASH_CTE
    + f""",
banded AS (
{_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM cand
JOIN documents da ON doc_a = da.doc_id
JOIN documents db ON doc_b = db.doc_id
GROUP BY 1, 2
"""
)

ORACLES["dedup_inflation"] = """
WITH toks AS (
  SELECT md5(text) AS h,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
           AS tok
  FROM documents
),
per_group AS (
  SELECT h, COUNT(*) AS n, SUM(tok) AS gtok, MAX(tok) AS ktok
  FROM toks GROUP BY h
)
SELECT CAST(SUM(n) AS BIGINT) AS total_docs,
  CAST(SUM(gtok) AS BIGINT) AS total_tokens,
  CAST(COUNT(*) AS BIGINT) AS kept_docs,
  CAST(SUM(ktok) AS BIGINT) AS kept_tokens,
  ROUND(SUM(gtok) / CAST(SUM(ktok) AS DOUBLE), 6) AS inflation,
  ROUND((SUM(gtok) - SUM(ktok)) / CAST(SUM(gtok) AS DOUBLE), 6)
    AS dup_token_frac
FROM per_group
"""

ORACLES["text_boilerplate_lines"] = """
WITH lines AS (
  SELECT doc_id, trim(unnest(string_split(text, chr(10)))) AS line
  FROM documents
)
SELECT line, CAST(COUNT(*) AS BIGINT) AS total_freq,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM lines WHERE length(line) > 0
GROUP BY line
ORDER BY total_freq DESC, line
LIMIT 50
"""


ORACLES["dedup_cluster_sizes"] = f"""
WITH base AS ({ORACLES["dedup_clusters"]}),
sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM base GROUP BY 1
)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY 1
"""

ORACLES["text_diversity"] = """
WITH toks AS (
  SELECT doc_id, lang,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents
),
sh AS (
  SELECT lang, unnest(list_distinct(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE []::VARCHAR[] END)) AS shingle
  FROM toks
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_shingle_occurrences,
  CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct_shingles,
  ROUND(COUNT(DISTINCT shingle) / COUNT(*), 6) AS diversity
FROM sh GROUP BY lang
"""

# text_shingle_hll: same register math as events_user_hll, fed by the
# text_diversity shingle CTE (per-doc-distinct explode — duplicates
# can't change a max, so the registers equal the corpus-distinct ones)
ORACLES["text_shingle_hll"] = """
WITH toks AS (
  SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents
),
sh AS (
  SELECT lang, unnest(list_distinct(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE []::VARCHAR[] END)) AS shingle
  FROM toks
),
h AS (
  SELECT lang,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS hv
  FROM sh
)
SELECT lang, CAST(hv % 256 AS INTEGER) AS bucket,
       CAST(MAX(CASE WHEN hv // 256 > 0
                     THEN 53 - length(bin(hv // 256))
                     ELSE 53 END) AS INTEGER) AS max_rho
FROM h GROUP BY 1, 2
"""

ORACLES["text_dsir_scores"] = """
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (
  SELECT term, COUNT(*) AS tf_all,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tf_target
  FROM toks GROUP BY 1
),
share AS (SELECT term, tf_target * 1000 // tf_all AS share_pm FROM tf)
SELECT doc_id, lang,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  ROUND(SUM(share_pm) / COUNT(*), 6) AS mean_target_share
FROM toks JOIN share USING (term)
GROUP BY doc_id, lang
"""

ORACLES["text_bpe_pairs"] = """
WITH wtf AS (
  SELECT w, COUNT(*) AS tf FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
    FROM documents
  ) GROUP BY w
),
pairs AS (
  SELECT w, tf, substr(w, CAST(i AS INTEGER), 2) AS pair
  FROM wtf, unnest(range(1, length(w))) AS u(i)
  WHERE length(w) >= 2
)
SELECT pair, CAST(SUM(tf) AS BIGINT) AS pair_count,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
FROM pairs GROUP BY pair
ORDER BY pair_count DESC, pair
LIMIT 50
"""

ORACLES["text_readability"] = """
WITH base AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
    list_sum(list_transform(
      regexp_extract_all(lower(text), '[a-z0-9]+'),
      w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+')))
    )) AS n_syllables
  FROM documents
)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(n_sentences AS BIGINT) AS n_sentences,
  CAST(n_syllables AS BIGINT) AS n_syllables,
  ROUND(0.39 * (n_words::DOUBLE / n_sentences::DOUBLE)
        + 11.8 * (n_syllables::DOUBLE / n_words::DOUBLE)
        - 15.59, 4) AS fk_grade
FROM base WHERE n_words > 0
"""

# ANALYZE-style profile of the documents table (bigint/varchar
# columns only in the gate: double/timestamp → string rendering is
# engine-specific, so those columns stay in the pytest surface).
_STATS_COL = """
SELECT 'documents' AS table_name, '{c}' AS column_name,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  ROUND(CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS null_frac,
  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
  CAST(MIN({c}) AS VARCHAR) AS min_value,
  CAST(MAX({c}) AS VARCHAR) AS max_value
FROM documents"""

ORACLES["table_stats"] = "\nUNION ALL\n".join(
    _STATS_COL.format(c=c)
    for c in ("doc_id", "text", "lang", "source", "n_chars")
)

# Winnowing (MOSS) fingerprint pairs: the identical per-doc selection
# — dense k-gram md5 hashes, per-window min with rightmost tie — as
# textops.dedup.winnowing_fingerprints, rebuilt with list lambdas —
# the (h, p) pair packed into ONE BIGINT key = h·2²⁵ + (2²⁵−1−p)
# exactly as the Spark side does (min key = min h, ties to larger p =
# rightmost-on-ties), so each window's argmin is a flat list_min and
# h decodes with an integer shift; then the capped postings pair join.
ORACLES["dedup_winnowing"] = """
WITH hs AS (
  SELECT doc_id,
    list_transform(range(1, length(text) - 25 + 2),
      p -> ('0x' || substr(md5(substr(text, p::INTEGER, 25)), 1, 8))::BIGINT
             * 33554432 + (33554432 - 1 - p)) AS hps
  FROM documents WHERE length(text) >= 25
),
sel AS (
  SELECT doc_id,
    list_distinct(list_transform(
      range(1, greatest(2::BIGINT, len(hps)::BIGINT - 8 + 2)),
      j -> list_min(list_slice(hps, j, j + 7)) >> 25)) AS fps
  FROM hs
),
fp AS (SELECT doc_id, unnest(fps) AS h FROM sel),
kept AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 100),
p AS (SELECT fp.doc_id, fp.h FROM fp JOIN kept USING (h))
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared_fps
FROM p x JOIN p y ON x.h = y.h AND x.doc_id < y.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 3
"""

# star twin over winnowing SPAN witnesses: the positional per-window
# minima (same hps/list_min pipeline as dedup_winnowing), consecutive
# repeats run-collapsed, then md5 keys over each adjacent pair —
# mirrors textops.dedup.winnowing_span_fingerprints exactly (1-based
# list_filter index; ms[0] is NULL so i = 1 keeps the first element,
# matching Spark's null-safe compare against F.get(ms, -1))
_WINNOW_SPAN_CTE = """
WITH hs AS (
  SELECT doc_id,
    list_transform(range(1, length(text) - 25 + 2),
      p -> ('0x' || substr(md5(substr(text, p::INTEGER, 25)), 1, 8))::BIGINT
             * 33554432 + (33554432 - 1 - p)) AS hps
  FROM documents WHERE length(text) >= 25
),
mins AS (
  SELECT doc_id,
    list_transform(
      range(1, greatest(2::BIGINT, len(hps)::BIGINT - 8 + 2)),
      j -> list_min(list_slice(hps, j, j + 7)) >> 25) AS ms
  FROM hs
),
col AS (
  SELECT doc_id,
         list_filter(ms, (x, i) -> i = 1 OR x <> ms[i - 1]) AS cs
  FROM mins
),
w AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, len(cs)),
    i -> ('0x' || substr(md5(CAST(cs[CAST(i AS INTEGER)] AS VARCHAR) || ':'
             || CAST(cs[CAST(i AS INTEGER) + 1] AS VARCHAR)), 1, 15))
           ::BIGINT))) AS h
  FROM col
)"""

ORACLES["dedup_winnowing_star"] = _WINNOW_SPAN_CTE + _SUBSTR_STAR_BODY

ORACLES["dedup_winnowing_clusters"] = (
    _WINNOW_SPAN_CTE
    + _SUBSTR_WC
    + _STAR_CC_BODY
    + "SELECT node AS doc_id, cluster_id FROM cc"
)

ORACLES["dedup_winnowing_keep"] = (
    _WINNOW_SPAN_CTE
    + _SUBSTR_WC
    + _STAR_CC_BODY
    + """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)
"""
)

# Bloom-filter incremental dedup: the IDENTICAL md5-positioned filter
# (m=4096 bits as 60-bit BIGINT words, j=3 seeds) built and probed in
# SQL — maybe_dup is the filter verdict, is_dup the exact truth, so
# the gate re-proves "no false negatives" on every run.
ORACLES["dedup_bloom"] = """
WITH fps AS (
  SELECT doc_id,
         md5(array_to_string(
           regexp_extract_all(lower(text), '[a-z0-9]+')[1:6], ' ')) AS fp
  FROM documents
),
existing AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0),
bloom AS (
  SELECT CAST(floor(pos / 60) AS BIGINT) AS word_idx,
         bit_or(1::BIGINT << CAST(pos % 60 AS INTEGER)) AS mask
  FROM (
    SELECT (('0x' || substr(md5(s.seed || ':' || fp), 1, 8))::BIGINT
            % 4096) AS pos
    FROM existing CROSS JOIN unnest(['0','1','2']) AS s(seed)
  ) GROUP BY 1
),
incoming AS (
  SELECT fp, MIN(doc_id) AS keep_id FROM fps WHERE doc_id % 2 = 1 GROUP BY 1
),
probes AS (
  SELECT i.fp, i.keep_id,
    (('0x' || substr(md5(s.seed || ':' || i.fp), 1, 8))::BIGINT
     % 4096) AS pos
  FROM incoming i CROSS JOIN unnest(['0','1','2']) AS s(seed)
),
hits AS (
  SELECT fp, keep_id,
    MIN(COALESCE((w.mask >> CAST(pos % 60 AS INTEGER)) & 1, 0)) AS allhit
  FROM probes LEFT JOIN bloom w
    ON CAST(floor(pos / 60) AS BIGINT) = w.word_idx
  GROUP BY 1, 2
)
SELECT h.fp, h.keep_id, allhit = 1 AS maybe_dup, e.fp IS NOT NULL AS is_dup
FROM hits h LEFT JOIN existing e ON h.fp = e.fp
"""


# Per-language curriculum (easy->hard by FK grade, contiguous phase
# cut) — the rank window partitions by lang exactly like the Spark op.
ORACLES["text_curriculum_order"] = f"""
WITH g AS ({ORACLES["text_readability"]}),
d AS (
  SELECT doc.doc_id, doc.lang, g.fk_grade
  FROM documents doc JOIN g ON doc.doc_id = g.doc_id
),
r AS (
  SELECT doc_id, lang, fk_grade,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY fk_grade, doc_id) AS rank,
         COUNT(*) OVER (PARTITION BY lang) AS _n
  FROM d
)
SELECT doc_id, lang, fk_grade, CAST(rank AS BIGINT) AS rank,
       CAST((rank - 1) * 4 // _n AS INTEGER) AS phase
FROM r
"""

# Integer epoch/repeat plan per source: pure BIGINT per-mille math,
# uniform-by-tokens target across sources.
ORACLES["data_epoch_plan"] = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text, '[^ \\t\\n\\r\\f\\x0B]+'))
              AS BIGINT) AS ws
  FROM documents
),
per AS (
  SELECT source, COUNT(*) AS n_docs, SUM(ws) AS src_tokens
  FROM t GROUP BY source
),
tot AS (SELECT SUM(src_tokens) AS _total, COUNT(*) AS _n_src FROM per)
SELECT source,
  CAST(n_docs AS BIGINT) AS n_docs,
  CAST(src_tokens AS BIGINT) AS src_tokens,
  CAST(1000 * _total // (_n_src * src_tokens) AS BIGINT) AS weight_pm,
  CAST((1000 * _total // (_n_src * src_tokens)) // 1000 AS BIGINT)
    AS repeats,
  CAST((1000 * _total // (_n_src * src_tokens)) % 1000 AS BIGINT)
    AS extra_per_mille
FROM per, tot
"""


# Frame sizes of the balanced AVI chunk split: size_i =
# ((i+1)n)//k - (i*n)//k — min over i is n//k, max is ceil(n/k) when
# n>0; computed per-frame anyway so the mirror is structural.
ORACLES["mm_video_stats"] = """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(n_chars % 10 + 1 AS INTEGER) AS k,
         CAST(length(text) AS INTEGER) AS n
  FROM documents WHERE doc_id % 3 = 2
),
f AS (
  SELECT media_id, k,
         CAST(unnest(range(0, k)) AS INTEGER) AS i, n
  FROM m
),
s AS (
  SELECT media_id, k,
         ((i + 1) * n) // k - (i * n) // k AS sz
  FROM f
)
SELECT media_id,
       CAST(k AS INTEGER) AS n_frames,
       CAST(MIN(sz) AS INTEGER) AS min_frame_bytes,
       CAST(MAX(sz) AS INTEGER) AS max_frame_bytes,
       CAST(SUM(sz) AS BIGINT) AS total_bytes
FROM s GROUP BY media_id, k
"""


# Interpolated bigram LM (λ=0.75 Jelinek-Mercer) — same millibit
# quantization discipline as text_lm_score; probability is ONE
# fixed-shape double expression over exact BIGINT counts.
ORACLES["text_lm_score_bigram"] = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
           AS token
  FROM documents
),
wl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
         unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS w2
  FROM wl WHERE len(w) >= 2
),
vocab AS (SELECT token, COUNT(*)::BIGINT AS c FROM tok GROUP BY 1),
tot AS (
  SELECT SUM(c)::BIGINT AS n_total, COUNT(*)::BIGINT AS v_size FROM vocab
),
ctx AS (SELECT w1, COUNT(*)::BIGINT AS c1 FROM bg GROUP BY 1),
bgc AS (SELECT w1, w2, COUNT(*)::BIGINT AS cb FROM bg GROUP BY 1, 2),
db AS (
  SELECT doc_id, w1, w2, COUNT(*)::BIGINT AS m FROM bg GROUP BY 1, 2, 3
),
scored AS (
  SELECT db.doc_id, db.m,
    CAST(round(1000.0 * log2(
      0.75 * (cb / c1) + 0.25 * ((c + 1) / (n_total + v_size))), 0)
      AS BIGINT) AS mb
  FROM db
  JOIN bgc USING (w1, w2)
  JOIN ctx USING (w1)
  JOIN vocab ON vocab.token = db.w2, tot
),
agg AS (
  SELECT doc_id, SUM(m)::BIGINT AS n_bigrams,
         (-SUM(m * mb))::BIGINT AS ce_millibits
  FROM scored GROUP BY 1
)
SELECT doc_id, n_bigrams, ce_millibits,
       ROUND(ce_millibits / (1000.0 * n_bigrams), 6) AS cross_entropy
FROM agg
"""


# Keep list under the corpus-mean bigram cross-entropy: exact integer
# cross-multiplication (HUGEINT — BIGINT·BIGINT overflows at scale).
ORACLES["text_perplexity_keep"] = f"""
WITH ce AS ({ORACLES["text_lm_score_bigram"]}),
tot AS (
  SELECT SUM(ce_millibits)::HUGEINT AS s_ce,
         SUM(n_bigrams)::HUGEINT AS s_n
  FROM ce
),
kept AS (
  SELECT doc_id FROM ce, tot
  WHERE ce_millibits::HUGEINT * s_n < s_ce * n_bigrams::HUGEINT
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN kept USING (doc_id)
"""


# Container sizes recomputed from text length L (ascii testdata):
# BMP = 14 + 40 + 1024-byte palette + 4-aligned row (empty text stays
# raw); WAV = 44 + L; AVI = 12 (RIFF) + 76 (hdrl/avih) + 12 (movi
# LIST hdr) + per balanced frame (8 + size + odd-pad).
ORACLES["mm_container_audit"] = """
WITH m AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS L,
         CAST(n_chars % 10 + 1 AS BIGINT) AS k
  FROM documents
),
per AS (
  SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
                         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    CASE doc_id % 3
      WHEN 0 THEN CASE WHEN L > 0
                       THEN 14 + 40 + 1024 + ((L + 3) // 4) * 4
                       ELSE 0 END
      WHEN 1 THEN 44 + L
      ELSE 100 + list_sum(list_transform(range(0, CAST(k AS INTEGER)),
             i -> 8 + (((i + 1) * L) // k - (i * L) // k)
                  + (((i + 1) * L) // k - (i * L) // k) % 2))
    END AS pb,
    L AS cb
  FROM m
)
SELECT kind, COUNT(*)::BIGINT AS n_media,
       SUM(pb)::BIGINT AS payload_bytes,
       SUM(cb)::BIGINT AS content_bytes,
       CASE WHEN SUM(pb) > 0
            THEN ROUND((SUM(pb) - SUM(cb)) / CAST(SUM(pb) AS DOUBLE), 6)
       END AS overhead_ratio
FROM per GROUP BY kind
"""

# text_ngram_novelty: the UNCAPPED distinct-shingle stream (sh0 —
# novelty must see ubiquitous shingles; they are exactly the
# non-novel mass the DF cap would hide), window-min first occurrence,
# per-doc rollup. Mirrors textops/dedup.ngram_novelty.
ORACLES["text_ngram_novelty"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
),
sh0 AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE []::VARCHAR[] END)) AS shingle
  FROM toks
),
tagged AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY shingle) AS first_doc
  FROM sh0
),
per AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new
  FROM tagged GROUP BY doc_id
)
SELECT doc_id, n_shingles, n_new,
       ROUND(n_new / n_shingles, 6) AS novelty
FROM per
"""

# text_novelty_keep: the novelty rollup above, thresholded at 0.5 on
# the SAME round-6 value both engines compute, anti-joined back.
ORACLES["text_novelty_keep"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents
),
sh0 AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE []::VARCHAR[] END)) AS shingle
  FROM toks
),
tagged AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY shingle) AS first_doc
  FROM sh0
),
drops AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           ROUND(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS novelty
    FROM tagged GROUP BY doc_id
  ) WHERE novelty < 0.5
)
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM drops)
"""


def _semantic_exact_oracle(
    query_text: str = "hash join filter on the customer table"
    " with vector scan window",
    k: int = 10,
    scale: int = 1 << 30,
) -> str:
    """text_semantic_exact: the same rational-weight retrieval built
    from scratch in SQL — query tf from the IDENTICAL python-side
    tokenization of the same literal, per-term contribution
    (tf·qtf·2³⁰) // df², exact BIGINT sum, deterministic top-k."""
    import re

    q: dict[str, int] = {}
    for tok in re.findall("[a-z0-9]+", query_text.lower()):
        q[tok] = q.get(tok, 0) + 1
    values = ", ".join(f"('{t}', {n})" for t, n in sorted(q.items()))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
q(token, qtf) AS (VALUES {values}),
c AS (
  SELECT doc_id, (tf * qtf * {scale}) // (df * df) AS c
  FROM tf JOIN q USING (token) JOIN dfreq USING (token)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(c) AS BIGINT) AS score_scaled
FROM c GROUP BY doc_id
ORDER BY score_scaled DESC, doc_id
LIMIT {k}
"""


ORACLES["text_semantic_exact"] = _semantic_exact_oracle()
