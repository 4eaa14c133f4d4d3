"""DuckDB oracle SQL for the knowledge-graph queries.

The driver's correctness gate runs each ``queries()`` entry on Spark
AND the matching SQL here on DuckDB over the same parquet tables,
comparing row count + schema + order-insensitive value hash. The CTE
prefix below derives the KG tables exactly as
``mcp_memory_libsql_spark.kg.views`` does (same surrogate
``created_at``, same integer-only string rendering).
"""

KG_CTE = """
WITH entities AS (
  SELECT r_name AS name, 'region' AS entity_type,
         CAST(r_regionkey + 0 AS BIGINT) AS created_at FROM region
  UNION ALL
  SELECT n_name, 'nation', CAST(n_nationkey + 100 AS BIGINT) FROM nation
  UNION ALL
  SELECT s_name, 'supplier', CAST(s_suppkey + 1000 AS BIGINT) FROM supplier
  UNION ALL
  SELECT c_name, 'customer', CAST(c_custkey + 10000 AS BIGINT) FROM customer
  UNION ALL
  SELECT 'Part#' || CAST(p_partkey AS VARCHAR), 'part',
         CAST(p_partkey + 1000000 AS BIGINT) FROM part
),
observations AS (
  SELECT c_name AS entity_name, 'segment=' || c_mktsegment AS content,
         CAST(c_custkey + 10000 AS BIGINT) AS created_at FROM customer
  UNION ALL
  SELECT c_name,
         'acctbal_cents=' || CAST(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS VARCHAR),
         CAST(c_custkey + 10000 AS BIGINT) FROM customer
  UNION ALL
  SELECT s_name,
         'acctbal_cents=' || CAST(CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS VARCHAR),
         CAST(s_suppkey + 1000 AS BIGINT) FROM supplier
  UNION ALL
  SELECT 'Part#' || CAST(p_partkey AS VARCHAR), 'name=' || p_name,
         CAST(p_partkey + 1000000 AS BIGINT) FROM part
  UNION ALL
  SELECT 'Part#' || CAST(p_partkey AS VARCHAR), 'brand=' || p_brand,
         CAST(p_partkey + 1000000 AS BIGINT) FROM part
  UNION ALL
  SELECT 'Part#' || CAST(p_partkey AS VARCHAR), 'type=' || p_type,
         CAST(p_partkey + 1000000 AS BIGINT) FROM part
  UNION ALL
  SELECT 'Part#' || CAST(p_partkey AS VARCHAR), 'size=' || CAST(p_size AS VARCHAR),
         CAST(p_partkey + 1000000 AS BIGINT) FROM part
  UNION ALL
  SELECT n_name, 'region_key=' || CAST(n_regionkey AS VARCHAR),
         CAST(n_nationkey + 100 AS BIGINT) FROM nation
),
relations AS (
  SELECT c_name AS source, n_name AS target, 'LOCATED_IN' AS relation_type
    FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT s_name, n_name, 'LOCATED_IN'
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
  UNION ALL
  SELECT n_name, r_name, 'PART_OF'
    FROM nation JOIN region ON n_regionkey = r_regionkey
  UNION ALL
  SELECT DISTINCT s_name, 'Part#' || CAST(l_partkey AS VARCHAR), 'SUPPLIES'
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  UNION ALL
  SELECT DISTINCT c_name, 'Part#' || CAST(l_partkey AS VARCHAR), 'PURCHASED'
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
)
"""


def _search_sql(pattern: str, limit: int) -> str:
    return f"""{KG_CTE}
SELECT DISTINCT e.name, e.entity_type, e.created_at,
  CAST(CASE WHEN e.name ILIKE '{pattern}' THEN 3
            WHEN e.entity_type ILIKE '{pattern}' THEN 2
            ELSE 1 END AS INTEGER) AS relevance_score
FROM entities e
LEFT JOIN observations o ON e.name = o.entity_name
WHERE e.name ILIKE '{pattern}'
   OR e.entity_type ILIKE '{pattern}'
   OR o.content ILIKE '{pattern}'
ORDER BY relevance_score DESC, e.created_at DESC, e.name
LIMIT {limit}
"""


def _search_names(pattern: str, limit: int) -> str:
    """CTE fragment: names of the top-`limit` search hits."""
    return f"""matched AS (
  SELECT DISTINCT e.name, e.created_at,
    CASE WHEN e.name ILIKE '{pattern}' THEN 3
         WHEN e.entity_type ILIKE '{pattern}' THEN 2
         ELSE 1 END AS relevance_score
  FROM entities e
  LEFT JOIN observations o ON e.name = o.entity_name
  WHERE e.name ILIKE '{pattern}'
     OR e.entity_type ILIKE '{pattern}'
     OR o.content ILIKE '{pattern}'
  ORDER BY relevance_score DESC, e.created_at DESC, e.name
  LIMIT {limit}
)"""


ORACLES: dict[str, str] = {}

ORACLES["kg_entities"] = KG_CTE + "SELECT name, entity_type, created_at FROM entities"

ORACLES["kg_observations"] = (
    KG_CTE + "SELECT entity_name, content, created_at FROM observations"
)

ORACLES["kg_relations"] = (
    KG_CTE + "SELECT source, target, relation_type FROM relations"
)

ORACLES["kg_get_entity"] = f"""{KG_CTE}
SELECT e.name, e.entity_type, e.created_at,
       (SELECT string_agg(o.content, '|' ORDER BY o.content)
          FROM observations o WHERE o.entity_name = e.name) AS observations
FROM entities e
WHERE e.name = 'Customer#000000042'
"""

ORACLES["kg_search_entities"] = _search_sql("%customer%", 50)

ORACLES["kg_search_fuzzy"] = _search_sql("%middle%east%", 10)

ORACLES["kg_recent_entities"] = f"""{KG_CTE}
SELECT name, entity_type, created_at FROM entities
ORDER BY created_at DESC, name LIMIT 10
"""

ORACLES["kg_read_graph"] = f"""{KG_CTE},
recent AS (SELECT name FROM entities ORDER BY created_at DESC, name LIMIT 10)
SELECT DISTINCT source, target, relation_type FROM relations
WHERE source IN (SELECT name FROM recent)
   OR target IN (SELECT name FROM recent)
"""

ORACLES["kg_search_nodes"] = f"""{KG_CTE},
{_search_names('%economy%', 10)}
SELECT DISTINCT source, target, relation_type FROM relations
WHERE source IN (SELECT name FROM matched)
   OR target IN (SELECT name FROM matched)
"""

# upsert preserves the STORED created_at for existing names (the
# reference updates only entity_type on conflict, client.ts:145-156)
ORACLES["kg_create_entities"] = f"""{KG_CTE},
batch AS (
  SELECT c_name AS name, 'vip_customer' AS entity_type,
         CAST(c_custkey + 20000 AS BIGINT) AS created_at
  FROM customer WHERE c_custkey <= 5
)
SELECT e.name, e.entity_type, e.created_at FROM entities e
WHERE e.name NOT IN (SELECT name FROM batch)
UNION ALL
SELECT b.name, b.entity_type, COALESCE(e.created_at, b.created_at) AS created_at
FROM batch b LEFT JOIN entities e ON b.name = e.name
"""

ORACLES["kg_create_relations"] = f"""{KG_CTE},
batch AS (
  SELECT s_name AS source, n_name AS target, 'AUDITED_IN' AS relation_type
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE s_suppkey <= 5
)
SELECT source, target, relation_type FROM relations
UNION ALL
SELECT source, target, relation_type FROM batch
"""

_OBS_AGG = """(SELECT string_agg(o.content, '|' ORDER BY o.content)
     FROM observations o WHERE o.entity_name = m.name) AS observations"""

ORACLES["kg_search_entities_full"] = f"""{KG_CTE},
{_search_names('%middle%east%', 10).replace('e.name, e.created_at,',
               'e.name, e.entity_type, e.created_at,')}
SELECT m.name, m.entity_type, m.created_at,
       CAST(m.relevance_score AS INTEGER) AS relevance_score,
       {_OBS_AGG}
FROM matched m
"""

ORACLES["kg_recent_entities_full"] = f"""{KG_CTE},
matched AS (SELECT name, entity_type, created_at FROM entities
            ORDER BY created_at DESC, name LIMIT 10)
SELECT m.name, m.entity_type, m.created_at, {_OBS_AGG}
FROM matched m
"""

ORACLES["kg_read_graph_entities"] = f"""{KG_CTE},
matched AS (SELECT name, entity_type, created_at FROM entities
            ORDER BY created_at DESC, name LIMIT 25)
SELECT m.name, m.entity_type, m.created_at, {_OBS_AGG}
FROM matched m
"""

ORACLES["kg_delete_entity"] = f"""{KG_CTE},
del AS (SELECT c_name AS name FROM customer WHERE c_custkey <= 3)
SELECT source, target, relation_type FROM relations
WHERE source NOT IN (SELECT name FROM del)
  AND target NOT IN (SELECT name FROM del)
"""

ORACLES["kg_delete_relation"] = f"""{KG_CTE},
del AS (
  SELECT n_name AS source, r_name AS target, 'PART_OF' AS relation_type
  FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_regionkey = 0
)
SELECT r.source, r.target, r.relation_type FROM relations r
WHERE NOT EXISTS (
  SELECT 1 FROM del d
  WHERE d.source = r.source AND d.target = r.target
    AND d.relation_type = r.relation_type
)
"""

ORACLES["kg_degree"] = f"""{KG_CTE},
outs AS (SELECT source AS name, COUNT(*) AS out_degree FROM relations GROUP BY source),
ins AS (SELECT target AS name, COUNT(*) AS in_degree FROM relations GROUP BY target)
SELECT COALESCE(outs.name, ins.name) AS name,
       CAST(COALESCE(out_degree, 0) AS BIGINT) AS out_degree,
       CAST(COALESCE(in_degree, 0) AS BIGINT) AS in_degree,
       CAST(COALESCE(out_degree, 0) + COALESCE(in_degree, 0) AS BIGINT) AS degree
FROM outs FULL OUTER JOIN ins ON outs.name = ins.name
"""

ORACLES["kg_neighbors_2hop"] = f"""{KG_CTE},
seeds AS (SELECT s_name AS name FROM supplier WHERE s_suppkey = 1),
n1 AS (
  SELECT DISTINCT name FROM (
    SELECT target AS name FROM relations WHERE source IN (SELECT name FROM seeds)
    UNION
    SELECT source FROM relations WHERE target IN (SELECT name FROM seeds)
  ) WHERE name NOT IN (SELECT name FROM seeds)
),
seen1 AS (SELECT name FROM seeds UNION SELECT name FROM n1),
n2 AS (
  SELECT DISTINCT name FROM (
    SELECT target AS name FROM relations WHERE source IN (SELECT name FROM n1)
    UNION
    SELECT source FROM relations WHERE target IN (SELECT name FROM n1)
  ) WHERE name NOT IN (SELECT name FROM seen1)
)
SELECT name FROM n1 UNION SELECT name FROM n2
"""

ORACLES["kg_entity_type_counts"] = f"""{KG_CTE}
SELECT entity_type, CAST(COUNT(*) AS BIGINT) AS n_entities,
       MIN(created_at) AS oldest, MAX(created_at) AS newest
FROM entities GROUP BY entity_type
"""

ORACLES["kg_relation_type_counts"] = f"""{KG_CTE}
SELECT relation_type, COUNT(*) AS n_relations,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT target) AS BIGINT) AS n_targets
FROM relations GROUP BY relation_type
"""

ORACLES["kg_observation_counts"] = f"""{KG_CTE}
SELECT e.name, e.entity_type,
       CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_observations
FROM entities e
LEFT JOIN (SELECT entity_name, COUNT(*) AS n_obs
           FROM observations GROUP BY entity_name) c
  ON e.name = c.entity_name
"""

ORACLES["kg_isolated"] = f"""{KG_CTE}
SELECT name, entity_type, created_at FROM entities
WHERE name NOT IN (SELECT source FROM relations)
  AND name NOT IN (SELECT target FROM relations)
"""

# True connected components via recursive reachability: comp(v) = min
# name reachable over undirected edges. Labels are exact strings, so
# this oracle-gates the iterative HashMin operator (whose 8 rounds
# exceed the KG graph's diameter, i.e. it has converged).
ORACLES["kg_components"] = f"""{KG_CTE},
edges AS (
  SELECT source AS a, target AS b FROM relations
  UNION
  SELECT target, source FROM relations
),
cc AS (
  WITH RECURSIVE walk(name, comp) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.b, walk.comp FROM walk JOIN edges e ON walk.name = e.a
  )
  SELECT name, MIN(comp) AS component FROM walk GROUP BY name
)
SELECT name, component FROM cc
"""

ORACLES["kg_search_typed"] = f"""{KG_CTE},
entities_f AS (SELECT * FROM entities WHERE entity_type = 'part')
SELECT DISTINCT e.name, e.entity_type, e.created_at,
  CAST(CASE WHEN e.name ILIKE '%economy%' THEN 3
            WHEN e.entity_type ILIKE '%economy%' THEN 2
            ELSE 1 END AS INTEGER) AS relevance_score
FROM entities_f e
LEFT JOIN observations o ON e.name = o.entity_name
WHERE e.name ILIKE '%economy%'
   OR e.entity_type ILIKE '%economy%'
   OR o.content ILIKE '%economy%'
ORDER BY relevance_score DESC, e.created_at DESC, e.name
LIMIT 20
"""

# BFS min-depth from a seed entity over the undirected relation
# graph, capped at 3 hops — ground truth for the iterative
# frontier-expansion operator (kg/traverse.py bfs_depths).
ORACLES["kg_bfs_depth"] = f"""{KG_CTE},
edges AS (
  SELECT source AS a, target AS b FROM relations
  UNION
  SELECT target, source FROM relations
),
walk AS (
  WITH RECURSIVE w(name, d) AS (
    SELECT 'Customer#000000042', 0
    UNION
    SELECT e.b, w.d + 1 FROM w JOIN edges e ON w.name = e.a WHERE w.d < 3
  )
  SELECT name, d FROM w
)
SELECT name, CAST(MIN(d) AS INTEGER) AS depth FROM walk GROUP BY name
"""

# Neighbor-overlap Jaccard over the hub-capped inverted neighbor
# index — ground truth for kg/similarity.py similar_entities
# (cap=256, threshold=0.1; sizes are post-cap, like the Spark side).
ORACLES["kg_similar_entities"] = f"""{KG_CTE},
und AS (
  SELECT source AS name, target AS nbr FROM relations
  UNION
  SELECT target, source FROM relations
),
und2 AS (SELECT name, nbr FROM und WHERE name <> nbr),
kept AS (
  SELECT nbr FROM und2 GROUP BY nbr HAVING COUNT(*) <= 256
),
p AS (SELECT u.name, u.nbr FROM und2 u JOIN kept k USING (nbr)),
sizes AS (SELECT name, COUNT(*) AS sz FROM p GROUP BY name),
pairs AS (
  SELECT x.name AS entity_a, y.name AS entity_b, COUNT(*) AS inter_size
  FROM p x JOIN p y ON x.nbr = y.nbr AND x.name < y.name
  GROUP BY 1, 2
)
SELECT entity_a, entity_b, inter_size, sa.sz AS size_a, sb.sz AS size_b,
       ROUND(CAST(inter_size AS DOUBLE)
             / (sa.sz + sb.sz - inter_size), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.name = entity_a
JOIN sizes sb ON sb.name = entity_b
WHERE ROUND(CAST(inter_size AS DOUBLE)
            / (sa.sz + sb.sz - inter_size), 6) >= 0.1
"""

# MinHash twin of kg_similar_entities: identical md5-chunk signature
# family as the text minhash oracles, neighbors playing the shingle
# role; single-hash bands, bucket cap 256, est >= 0.25.
_KG_MINHASH_HASHES = ", ".join(
    "MIN(('0x' || substr(md5(" + ("nbr" if i < 4 else "'x:' || nbr")
    + f"), {1 + 8 * (i % 4)}, 8))::BIGINT) AS h{i}"
    for i in range(8)
)
_KG_MINHASH_BANDS = "\n  UNION ALL\n".join(
    f"  SELECT name, '{b}_' || CAST(h{b} AS VARCHAR) AS band_key FROM sig"
    for b in range(8)
)
_KG_MINHASH_AGREE = " + ".join(
    f"CAST(sa.h{i} = sb.h{i} AS INTEGER)" for i in range(8)
)
ORACLES["kg_similar_minhash"] = f"""{KG_CTE},
und AS (
  SELECT source AS name, target AS nbr FROM relations
  UNION
  SELECT target, source FROM relations
),
und2 AS (SELECT name, nbr FROM und WHERE name <> nbr),
sig AS (SELECT name, {_KG_MINHASH_HASHES} FROM und2 GROUP BY name),
banded AS (
{_KG_MINHASH_BANDS}
),
buckets AS (
  SELECT band_key FROM banded GROUP BY band_key
  HAVING COUNT(*) BETWEEN 2 AND 256
),
cand AS (
  SELECT DISTINCT a.name AS entity_a, b.name AS entity_b
  FROM banded a JOIN banded b ON a.band_key = b.band_key AND a.name < b.name
  WHERE a.band_key IN (SELECT band_key FROM buckets)
)
SELECT cand.entity_a, cand.entity_b,
       ROUND(({_KG_MINHASH_AGREE}) / 8.0, 6) AS est_jaccard
FROM cand
JOIN sig sa ON cand.entity_a = sa.name
JOIN sig sb ON cand.entity_b = sb.name
WHERE ROUND(({_KG_MINHASH_AGREE}) / 8.0, 6) >= 0.25
"""

ORACLES["kg_schema_profile"] = f"""{KG_CTE}
SELECT es.entity_type AS source_type, r.relation_type,
       et.entity_type AS target_type,
       COUNT(*) AS n_edges,
       COUNT(DISTINCT r.source) AS n_sources,
       COUNT(DISTINCT r.target) AS n_targets
FROM relations r
JOIN entities es ON r.source = es.name
JOIN entities et ON r.target = et.name
GROUP BY 1, 2, 3
"""

ORACLES["kg_degree_histogram"] = f"""{KG_CTE},
outs AS (SELECT source AS name, COUNT(*) AS out_degree FROM relations GROUP BY source),
ins AS (SELECT target AS name, COUNT(*) AS in_degree FROM relations GROUP BY target),
deg AS (
  SELECT CAST(COALESCE(out_degree, 0) + COALESCE(in_degree, 0) AS BIGINT) AS degree
  FROM outs FULL OUTER JOIN ins ON outs.name = ins.name
)
SELECT degree, COUNT(*) AS n_entities FROM deg GROUP BY 1
"""

ORACLES["kg_triangles"] = f"""{KG_CTE},
e AS (
  SELECT DISTINCT least(source, target) AS a, greatest(source, target) AS b
  FROM relations WHERE source <> target
),
und AS (SELECT a AS n, b AS m FROM e UNION ALL SELECT b, a FROM e),
keep AS (SELECT n FROM und GROUP BY n HAVING COUNT(*) <= 64),
e2 AS (
  SELECT e.a, e.b FROM e
  JOIN keep ka ON e.a = ka.n
  JOIN keep kb ON e.b = kb.n
),
und2 AS (SELECT a AS n, b AS m FROM e2 UNION ALL SELECT b, a FROM e2),
wedges AS (
  SELECT u1.m AS x, u2.m AS y
  FROM und2 u1 JOIN und2 u2 ON u1.n = u2.n AND u1.m < u2.m
),
nn AS (SELECT COUNT(*)::BIGINT AS n_nodes FROM keep),
ne AS (SELECT COUNT(*)::BIGINT AS n_edges FROM e2),
nw AS (SELECT COUNT(*)::BIGINT AS n_wedges FROM wedges),
nc AS (
  SELECT COUNT(*)::BIGINT AS n_closed
  FROM wedges w JOIN e2 ON w.x = e2.a AND w.y = e2.b
),
nb AS (
  SELECT CAST(SUM(c * (c - 1) // 2) // 2 AS BIGINT) AS n_butterflies
  FROM (SELECT x, y, COUNT(*) AS c FROM wedges GROUP BY 1, 2)
)
SELECT n_nodes, n_edges, n_wedges, n_closed,
       n_closed // 3 AS n_triangles, n_butterflies,
       ROUND(n_closed / n_wedges, 6) AS clustering
FROM nn, ne, nw, nc, nb
"""

ORACLES["kg_entity_neardup"] = (
    KG_CTE
    + """,
norm AS (
  SELECT name,
         array_to_string(regexp_extract_all(lower(name), '[a-z0-9]+'), ' ')
           AS nm
  FROM entities
),
g0 AS (
  SELECT name, unnest(list_distinct(
    CASE WHEN length(nm) >= 3
         THEN list_transform(range(1, length(nm) - 1),
                             i -> substr(nm, i, 3))
         ELSE []::VARCHAR[] END)) AS gram
  FROM norm
),
freq AS (SELECT gram FROM g0 GROUP BY gram HAVING COUNT(*) > 100),
g AS (SELECT name, gram FROM g0
      WHERE gram NOT IN (SELECT gram FROM freq)),
sizes AS (SELECT name, COUNT(*) AS sz FROM g GROUP BY name),
pairs AS (
  SELECT a.name AS entity_a, b.name AS entity_b, COUNT(*) AS inter_size
  FROM g a JOIN g b ON a.gram = b.gram AND a.name < b.name
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT entity_a, entity_b, inter_size, sa.sz AS size_a, sb.sz AS size_b,
         ROUND(inter_size / (sa.sz + sb.sz - inter_size), 6) AS jaccard
  FROM pairs
  JOIN sizes sa ON entity_a = sa.name
  JOIN sizes sb ON entity_b = sb.name
)
WHERE jaccard >= 0.6
"""
)

ORACLES["kg_merge_entities"] = f"""
WITH p2 AS ({ORACLES["kg_entity_neardup"]}),
edges AS (
  SELECT entity_a AS a, entity_b AS b FROM p2
  UNION
  SELECT entity_b, entity_a FROM p2
),
cc AS (
  WITH RECURSIVE walk(name, comp) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.b, walk.comp FROM walk JOIN edges e ON walk.name = e.a
  )
  SELECT name, MIN(comp) AS canonical FROM walk GROUP BY name
),
sizes AS (SELECT canonical AS c2, COUNT(*) AS cluster_size FROM cc GROUP BY 1)
SELECT name, canonical, cluster_size FROM cc JOIN sizes ON canonical = c2
"""

ORACLES["kg_growth"] = (
    KG_CTE
    + """
SELECT created_at // 1000 AS epoch_bucket, entity_type,
       CAST(COUNT(*) AS BIGINT) AS n_entities
FROM entities GROUP BY 1, 2
"""
)

# PageRank, 5 damped iterations UNROLLED (r0..r5): the same
# contribution sums the Spark loop computes, with every constant cast
# to DOUBLE and the teleport term written (1.0 - 0.85)/cnt — NOT the
# literal 0.15/cnt, which is a different IEEE double than what the
# Python driver computes. Matching to ROUND(rank, 8) verified at
# sf0.001 and sf0.01.
_PR_ITER = """
c{i} AS (
  SELECT e.target AS name, SUM(r.rank / d.out_degree) AS in_rank
  FROM edges e
  JOIN r{p} r ON e.source = r.name
  JOIN odeg d ON e.source = d.name
  GROUP BY 1
),
r{i} AS (
  SELECT nodes.name,
    ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / cnt)
    + CAST(0.85 AS DOUBLE) * COALESCE(in_rank, CAST(0 AS DOUBLE)) AS rank
  FROM nodes LEFT JOIN c{i} ON nodes.name = c{i}.name, n
),"""

_PR_BODY = """,
edges AS (SELECT DISTINCT source, target FROM relations),
nodes AS (SELECT source AS name FROM edges UNION SELECT target FROM edges),
odeg AS (SELECT source AS name, COUNT(*) AS out_degree FROM edges GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM nodes),
r0 AS (SELECT name, CAST(1.0 AS DOUBLE) / cnt AS rank FROM nodes, n),"""
for _i in range(1, 6):
    _PR_BODY += _PR_ITER.format(i=_i, p=_i - 1)
_PR_BODY = _PR_BODY.rstrip(",")

ORACLES["kg_pagerank"] = (
    KG_CTE + _PR_BODY + "\nSELECT name, ROUND(rank, 8) AS rank FROM r5"
)

ORACLES["kg_obs_history"] = (
    KG_CTE
    + """
SELECT entity_name, content,
  CAST(created_at AS BIGINT) AS valid_from,
  CAST(lead(created_at) OVER (
    PARTITION BY entity_name ORDER BY created_at, content
  ) AS BIGINT) AS valid_to,
  lead(created_at) OVER (
    PARTITION BY entity_name ORDER BY created_at, content
  ) IS NULL AS is_current
FROM observations
"""
)

ORACLES["kg_reciprocity"] = (
    KG_CTE
    + """,
e AS (SELECT DISTINCT source, target, relation_type FROM relations),
recip AS (
  SELECT a.relation_type, COUNT(*) AS n_reciprocal
  FROM e a JOIN e b
    ON a.source = b.target AND a.target = b.source
   AND a.relation_type = b.relation_type
  GROUP BY 1
),
totals AS (SELECT relation_type, COUNT(*) AS n_edges FROM e GROUP BY 1)
SELECT t.relation_type,
  CAST(n_edges AS BIGINT) AS n_edges,
  CAST(COALESCE(n_reciprocal, 0) AS BIGINT) AS n_reciprocal,
  ROUND(COALESCE(n_reciprocal, 0) / CAST(n_edges AS DOUBLE), 6)
    AS reciprocity
FROM totals t LEFT JOIN recip r ON t.relation_type = r.relation_type
"""
)

# k-core (k=3), peel loop UNROLLED to 12 MATERIALIZED rounds — plain
# CTEs re-expand per reference (3^12 scans blew the fd limit);
# MATERIALIZED pins each round. 12 rounds >> observed convergence
# (fixpoint well before round 12 at sf0.001 and sf0.01); extra rounds
# past the fixpoint are no-ops, matching Spark's early-stop loop.
_KCORE_BODY = """,
live0 AS MATERIALIZED (
  SELECT least(source, target) AS a, greatest(source, target) AS b
  FROM relations WHERE source <> target
  GROUP BY 1, 2
),
sym0 AS MATERIALIZED (SELECT a, b FROM live0 UNION ALL SELECT b, a FROM live0),"""
_prev = "sym0"
for _r in range(1, 13):
    _KCORE_BODY += f"""
keep{_r} AS MATERIALIZED (
  SELECT a FROM {_prev} GROUP BY a HAVING COUNT(*) >= 3
),
live{_r} AS MATERIALIZED (
  SELECT l.a, l.b FROM {_prev} l
  JOIN keep{_r} ka ON l.a = ka.a
  JOIN keep{_r} kb ON l.b = kb.a
),"""
    _prev = f"live{_r}"
_KCORE_BODY = _KCORE_BODY.rstrip(",")

ORACLES["kg_k_core"] = (
    KG_CTE
    + _KCORE_BODY
    + f"\nSELECT a AS name, CAST(COUNT(*) AS BIGINT) AS core_degree "
    f"FROM {_prev} GROUP BY a HAVING COUNT(*) >= 3"
)

ORACLES["kg_assortativity"] = (
    KG_CTE
    + """
SELECT relation_type,
  CAST(COUNT(*) AS BIGINT) AS n_edges,
  CAST(SUM(CASE WHEN st.entity_type = tt.entity_type THEN 1 ELSE 0 END)
       AS BIGINT) AS n_same_type,
  ROUND(SUM(CASE WHEN st.entity_type = tt.entity_type THEN 1 ELSE 0 END)
        / CAST(COUNT(*) AS DOUBLE), 6) AS same_type_frac
FROM relations r
JOIN entities st ON r.source = st.name
JOIN entities tt ON r.target = tt.name
GROUP BY relation_type
"""
)

ORACLES["kg_degree_assortativity"] = (
    KG_CTE
    + """,
und AS (
  SELECT least(source, target) AS a, greatest(source, target) AS b
  FROM relations WHERE source <> target
  GROUP BY 1, 2
),
sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT a, COUNT(*) AS d FROM sym GROUP BY a),
e AS (
  SELECT da.d AS dx, db.d AS dy
  FROM sym JOIN deg da ON sym.a = da.a JOIN deg db ON sym.b = db.a
),
m AS (
  SELECT COUNT(*) AS n,
         SUM(dx) AS sx, SUM(dy) AS sy,
         SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy,
         SUM(dx * dy) AS sxy
  FROM e
)
SELECT CAST(n // 2 AS BIGINT) AS n_edges,
  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
               * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr
FROM m
"""
)

# Personalized PageRank, 5 damped iterations UNROLLED — same IEEE
# discipline as kg_pagerank ((1.0 - 0.85)/cnt, never the literal
# 0.15), teleport mass confined to the supplier seed set.
_PPR_ITER = """
pc{i} AS (
  SELECT e.target AS name, SUM(r.rank / d.out_degree) AS in_rank
  FROM edges e
  JOIN p{p} r ON e.source = r.name
  JOIN odeg d ON e.source = d.name
  GROUP BY 1
),
p{i} AS (
  SELECT base.name,
    CASE WHEN is_seed = 1
      THEN ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / cnt)
      ELSE CAST(0 AS DOUBLE) END
    + CAST(0.85 AS DOUBLE) * COALESCE(in_rank, CAST(0 AS DOUBLE)) AS rank
  FROM base LEFT JOIN pc{i} ON base.name = pc{i}.name, ns
),"""

_PPR_BODY = """,
edges AS (SELECT DISTINCT source, target FROM relations),
nodes AS (SELECT source AS name FROM edges UNION SELECT target FROM edges),
odeg AS (SELECT source AS name, COUNT(*) AS out_degree FROM edges GROUP BY 1),
seeds AS (
  SELECT n.name FROM nodes n JOIN entities e ON n.name = e.name
  WHERE e.entity_type = 'supplier'
),
ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM seeds),
base AS (
  SELECT n.name, CASE WHEN s.name IS NOT NULL THEN 1 ELSE 0 END AS is_seed
  FROM nodes n LEFT JOIN seeds s ON n.name = s.name
),
p0 AS (
  SELECT name,
    CASE WHEN is_seed = 1 THEN CAST(1.0 AS DOUBLE) / cnt
         ELSE CAST(0 AS DOUBLE) END AS rank
  FROM base, ns
),"""
for _i in range(1, 6):
    _PPR_BODY += _PPR_ITER.format(i=_i, p=_i - 1)
_PPR_BODY = _PPR_BODY.rstrip(",")

ORACLES["kg_ppr"] = (
    KG_CTE + _PPR_BODY + "\nSELECT name, ROUND(rank, 8) AS rank FROM p5"
)

# Synchronous label propagation, 4 rounds UNROLLED — integer counts
# and string ordering only (no floats anywhere), ties broken by
# (count DESC, label ASC) ROW_NUMBER exactly as the Spark window.
_LPA_ITER = """
cnt{i} AS (
  SELECT e.b AS name, l.label, COUNT(*) AS c
  FROM sym_lpa e JOIN l{p} l ON e.a = l.name
  GROUP BY 1, 2
),
l{i} AS (
  SELECT name, label FROM (
    SELECT name, label,
      ROW_NUMBER() OVER (PARTITION BY name ORDER BY c DESC, label) AS rn
    FROM cnt{i}
  ) WHERE rn = 1
),"""

_LPA_BODY = """,
sym_lpa AS (
  SELECT source AS a, target AS b FROM relations
  UNION
  SELECT target, source FROM relations
),
l0 AS (SELECT DISTINCT a AS name, a AS label FROM sym_lpa),"""
for _i in range(1, 5):
    _LPA_BODY += _LPA_ITER.format(i=_i, p=_i - 1)
_LPA_BODY = _LPA_BODY.rstrip(",")

ORACLES["kg_communities"] = (
    KG_CTE
    + _LPA_BODY
    + """
SELECT l.name, l.label AS community, CAST(s.cs AS BIGINT) AS community_size
FROM l4 l JOIN (SELECT label, COUNT(*) AS cs FROM l4 GROUP BY 1) s
  ON l.label = s.label
"""
)

# Modularity profile of the LPA partition — reuses the 4 unrolled LPA
# rounds; every emitted value derives from exact BIGINT counts (the
# squared term via explicit multiply, never POWER).
ORACLES["kg_modularity"] = (
    KG_CTE
    + _LPA_BODY
    + """,
comms AS (SELECT name, label AS community FROM l4),
und AS (
  SELECT least(source, target) AS a, greatest(source, target) AS b
  FROM relations WHERE source <> target
  GROUP BY 1, 2
),
ej AS (
  SELECT la.community AS ca, lb.community AS cb
  FROM und
  JOIN comms la ON und.a = la.name
  JOIN comms lb ON und.b = lb.name
),
mt AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ej),
internal AS (
  SELECT ca AS community, CAST(COUNT(*) AS BIGINT) AS internal_edges
  FROM ej WHERE ca = cb GROUP BY 1
),
sym2 AS (SELECT a FROM und UNION ALL SELECT b FROM und),
deg2 AS (SELECT a, COUNT(*) AS d FROM sym2 GROUP BY a),
cd AS (
  SELECT c.community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(COALESCE(d, 0)) AS BIGINT) AS total_degree
  FROM comms c LEFT JOIN deg2 ON c.name = deg2.a
  GROUP BY 1
)
SELECT cd.community, n_nodes,
  CAST(COALESCE(internal_edges, 0) AS BIGINT) AS internal_edges,
  total_degree,
  ROUND(COALESCE(internal_edges, 0) / m
        - (total_degree / (2 * m)) * (total_degree / (2 * m)), 8)
    AS modularity_term
FROM cd LEFT JOIN internal ON cd.community = internal.community, mt
"""
)

ORACLES["kg_obs_duplicates"] = (
    KG_CTE
    + """
SELECT content,
  CAST(COUNT(DISTINCT entity_name) AS BIGINT) AS n_entities,
  CAST(COUNT(*) AS BIGINT) AS n_rows
FROM observations
GROUP BY content
HAVING COUNT(DISTINCT entity_name) >= 2
ORDER BY n_entities DESC, content
LIMIT 50
"""
)

# Char-budgeted context packing over the search_entities_full shape —
# same matched CTE, then a single-window running sum (the packed set
# is ≤50 rows by the reference's limit cap).
ORACLES["kg_context_pack"] = f"""{KG_CTE},
{_search_names('%economy%', 50).replace('e.name, e.created_at,',
               'e.name, e.entity_type, e.created_at,')},
packed AS (
  SELECT m.name, m.entity_type, m.created_at,
         CAST(m.relevance_score AS INTEGER) AS relevance_score,
         m.name || ' (' || m.entity_type || '): ' ||
           COALESCE((SELECT string_agg(o.content, '|' ORDER BY o.content)
                     FROM observations o WHERE o.entity_name = m.name),
                    '') AS context
  FROM matched m
),
win AS (
  SELECT name, relevance_score, context,
    CAST(length(context) AS INTEGER) AS n_chars,
    CAST(ROW_NUMBER() OVER ord AS INTEGER) AS rank,
    CAST(SUM(length(context)) OVER
           (ord ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
  FROM packed
  WINDOW ord AS (ORDER BY relevance_score DESC, created_at DESC, name)
)
SELECT rank, name, relevance_score, n_chars, cum_chars, context
FROM win WHERE cum_chars <= 2000
"""

# Point-in-time graph read at surrogate t=10500 (mid-customer range:
# parts/suppliers/regions/nations and half the customers exist).
ORACLES["kg_as_of"] = (
    KG_CTE
    + """,
hist AS (
  SELECT entity_name, content,
    CAST(created_at AS BIGINT) AS valid_from,
    CAST(lead(created_at) OVER (
      PARTITION BY entity_name ORDER BY created_at, content
    ) AS BIGINT) AS valid_to
  FROM observations
),
live_obs AS (
  SELECT entity_name, content FROM hist
  WHERE valid_from <= 10500 AND (valid_to IS NULL OR valid_to > 10500)
)
SELECT e.name, e.entity_type, o.content
FROM entities e LEFT JOIN live_obs o ON e.name = o.entity_name
WHERE e.created_at <= 10500
"""
)

ORACLES["kg_metapaths"] = (
    KG_CTE
    + """,
ty AS (SELECT name, entity_type FROM entities),
inc AS (
  SELECT r.target AS mid, ta.entity_type AS type_a,
         r.relation_type AS rel_ab, COUNT(*) AS n_in
  FROM relations r JOIN ty ta ON r.source = ta.name
  GROUP BY 1, 2, 3
),
outc AS (
  SELECT r.source AS mid, r.relation_type AS rel_bc,
         tc.entity_type AS type_c, COUNT(*) AS n_out
  FROM relations r JOIN ty tc ON r.target = tc.name
  GROUP BY 1, 2, 3
)
SELECT inc.type_a, inc.rel_ab, tb.entity_type AS type_b,
       outc.rel_bc, outc.type_c,
       CAST(SUM(n_in * n_out) AS BIGINT) AS n_paths
FROM inc
JOIN outc ON inc.mid = outc.mid
JOIN ty tb ON inc.mid = tb.name
GROUP BY 1, 2, 3, 4, 5
"""
)

# Link-prediction suggestions: the similar-pairs SQL minus already-
# connected pairs, deterministic top-k.
ORACLES["kg_suggest_relations"] = (
    ORACLES["kg_similar_entities"].replace(
        "SELECT entity_a, entity_b, inter_size, sa.sz AS size_a,"
        " sb.sz AS size_b,",
        "SELECT entity_a, entity_b,",
    ).replace(
        "       ROUND(CAST(inter_size AS DOUBLE)\n"
        "             / (sa.sz + sb.sz - inter_size), 6) AS jaccard",
        "       ROUND(CAST(inter_size AS DOUBLE)\n"
        "             / (sa.sz + sb.sz - inter_size), 6) AS jaccard",
    )
    + """
AND NOT EXISTS (
  SELECT 1 FROM (
    SELECT DISTINCT least(source, target) AS a,
                    greatest(source, target) AS b
    FROM relations WHERE source <> target
  ) e WHERE e.a = entity_a AND e.b = entity_b
)
ORDER BY jaccard DESC, entity_a, entity_b
LIMIT 25
"""
)

ORACLES["kg_obs_staleness"] = (
    KG_CTE
    + """,
latest AS (SELECT MAX(created_at) AS now_t FROM observations),
per_ent AS (
  SELECT now_t - lo.last_obs AS staleness
  FROM entities e
  LEFT JOIN (
    SELECT entity_name, MAX(created_at) AS last_obs
    FROM observations GROUP BY 1
  ) lo ON e.name = lo.entity_name, latest
)
SELECT CAST(CASE WHEN staleness IS NULL THEN -1
            WHEN staleness <= 0 THEN 0
            ELSE FLOOR(log2(staleness)) + 1 END AS BIGINT)
  AS staleness_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_entities,
  CAST(MIN(staleness) AS BIGINT) AS min_staleness,
  CAST(MAX(staleness) AS BIGINT) AS max_staleness
FROM per_ent GROUP BY 1
"""
)

# MinHash suggestion feed: the kg_similar_minhash SQL minus
# already-connected pairs, deterministic top-k.
ORACLES["kg_suggest_minhash"] = (
    ORACLES["kg_similar_minhash"]
    + """
AND NOT EXISTS (
  SELECT 1 FROM (
    SELECT DISTINCT least(source, target) AS a,
                    greatest(source, target) AS b
    FROM relations WHERE source <> target
  ) e WHERE e.a = cand.entity_a AND e.b = cand.entity_b
)
ORDER BY est_jaccard DESC, cand.entity_a, cand.entity_b
LIMIT 25
"""
)

# Unnormalized integer HITS, 2 rounds unrolled: with all-ones init
# every score is an exact BIGINT alternating-path count, so no
# engine-ordered double summation exists anywhere (see
# kg.traverse.hits). Round t: a_t = Σ h_{t-1} over in-edges, then
# h_t = Σ a_t over out-edges (hub update uses THIS round's a).
ORACLES["kg_hits"] = (
    KG_CTE
    + """,
e AS (SELECT DISTINCT source, target FROM relations),
nodes AS (SELECT source AS name FROM e UNION SELECT target FROM e),
h0 AS (SELECT name, CAST(1 AS BIGINT) AS h FROM nodes),
a1 AS (
  SELECT n.name, CAST(COALESCE(s.a, 0) AS BIGINT) AS a
  FROM nodes n LEFT JOIN (
    SELECT e.target AS name, SUM(h0.h) AS a
    FROM e JOIN h0 ON e.source = h0.name GROUP BY 1
  ) s ON n.name = s.name),
h1 AS (
  SELECT n.name, CAST(COALESCE(s.h, 0) AS BIGINT) AS h
  FROM nodes n LEFT JOIN (
    SELECT e.source AS name, SUM(a1.a) AS h
    FROM e JOIN a1 ON e.target = a1.name GROUP BY 1
  ) s ON n.name = s.name),
a2 AS (
  SELECT n.name, CAST(COALESCE(s.a, 0) AS BIGINT) AS a
  FROM nodes n LEFT JOIN (
    SELECT e.target AS name, SUM(h1.h) AS a
    FROM e JOIN h1 ON e.source = h1.name GROUP BY 1
  ) s ON n.name = s.name),
h2 AS (
  SELECT n.name, CAST(COALESCE(s.h, 0) AS BIGINT) AS h
  FROM nodes n LEFT JOIN (
    SELECT e.source AS name, SUM(a2.a) AS h
    FROM e JOIN a2 ON e.target = a2.name GROUP BY 1
  ) s ON n.name = s.name)
SELECT h2.name, h2.h AS hub_score, a2.a AS authority_score
FROM h2 JOIN a2 ON h2.name = a2.name
"""
)

# Resource-Allocation link prediction: per-pair Σ 1/deg(z) over
# shared neighbors with each 1/w quantized to a scaled BIGINT
# (2^40 + w//2) // w — pure integer math, so the per-pair sum is
# order-independent and bit-identical to Spark's (see
# kg.similarity.suggest_relations_weighted); one double division at
# the end.
ORACLES["kg_suggest_weighted"] = (
    KG_CTE
    + """,
und AS (
  SELECT source AS name, target AS nbr FROM relations
  UNION
  SELECT target, source FROM relations
),
und2 AS (SELECT name, nbr FROM und WHERE name <> nbr),
widths AS (
  SELECT nbr, CAST((1099511627776 + COUNT(*) // 2) // COUNT(*) AS BIGINT)
           AS c
  FROM und2 GROUP BY nbr
  HAVING COUNT(*) <= 256
),
p AS (SELECT u.name, u.nbr, widths.c FROM und2 u JOIN widths USING (nbr)),
pairs AS (
  SELECT x.name AS entity_a, y.name AS entity_b,
         CAST(COUNT(*) AS BIGINT) AS n_common,
         ROUND(CAST(SUM(x.c) AS DOUBLE) / 1099511627776.0, 6) AS ra_score
  FROM p x JOIN p y ON x.nbr = y.nbr AND x.name < y.name
  GROUP BY 1, 2
)
SELECT entity_a, entity_b, n_common, ra_score
FROM pairs
WHERE NOT EXISTS (
  SELECT 1 FROM (
    SELECT DISTINCT least(source, target) AS a,
                    greatest(source, target) AS b
    FROM relations WHERE source <> target
  ) e WHERE e.a = entity_a AND e.b = entity_b
)
ORDER BY ra_score DESC, entity_a, entity_b
LIMIT 25
"""
)

# Deterministic random-walk corpus (DeepWalk data-gen): the identical
# md5-indexed neighbor pick replayed step-by-step — walk step t from
# node v in the walk started at s picks sorted-neighbor index
# md5(s:t:v) % degree(v); dead ends self-absorb (see
# kg.traverse.random_walks).
_WALK_STEP = """
w{t} AS (
  SELECT start,
    COALESCE(a.nbrs[CAST(('0x' || substr(md5(start || ':{t}:' || cur), 1, 8))::BIGINT
                         % len(a.nbrs) + 1 AS INTEGER)], cur) AS cur,
    path || '->' ||
    COALESCE(a.nbrs[CAST(('0x' || substr(md5(start || ':{t}:' || cur), 1, 8))::BIGINT
                         % len(a.nbrs) + 1 AS INTEGER)], cur) AS path
  FROM w{p} LEFT JOIN adj a ON w{p}.cur = a.node
),"""

_WALK_BODY = """,
e AS (SELECT DISTINCT source, target FROM relations),
adj AS (SELECT source AS node, list(target ORDER BY target) AS nbrs
        FROM e GROUP BY 1),
nodes AS (SELECT source AS name FROM e UNION SELECT target FROM e),
w0 AS (
  SELECT name AS start, name AS cur, name AS path FROM nodes
  WHERE ('0x' || substr(md5(name), 1, 8))::BIGINT % 50 = 0
),"""
for _t in range(1, 5):
    _WALK_BODY += _WALK_STEP.format(t=_t, p=_t - 1)
_WALK_BODY = _WALK_BODY.rstrip(",")

ORACLES["kg_walks"] = KG_CTE + _WALK_BODY + "\nSELECT start, path FROM w4"

# Dangling-redistributed PageRank (the published formulation next to
# kg_pagerank's documented leaking variant): per iteration the rank
# mass on no-out-edge nodes returns uniformly. Same IEEE discipline
# ((1.0-0.85)/cnt, identical expression nesting) as kg_pagerank.
_PRF_ITER = """
dm{i} AS (
  SELECT COALESCE(SUM(rank), CAST(0 AS DOUBLE)) AS dm FROM r{p}
  WHERE name NOT IN (SELECT source FROM edges)
),
c{i} AS (
  SELECT e.target AS name, SUM(r.rank / d.out_degree) AS in_rank
  FROM edges e
  JOIN r{p} r ON e.source = r.name
  JOIN odeg d ON e.source = d.name
  GROUP BY 1
),
r{i} AS (
  SELECT nodes.name,
    ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / cnt)
    + CAST(0.85 AS DOUBLE)
      * (COALESCE(in_rank, CAST(0 AS DOUBLE)) + dm / cnt) AS rank
  FROM nodes LEFT JOIN c{i} ON nodes.name = c{i}.name, n, dm{i}
),"""

_PRF_BODY = """,
edges AS (SELECT DISTINCT source, target FROM relations),
nodes AS (SELECT source AS name FROM edges UNION SELECT target FROM edges),
odeg AS (SELECT source AS name, COUNT(*) AS out_degree FROM edges GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM nodes),
r0 AS (SELECT name, CAST(1.0 AS DOUBLE) / cnt AS rank FROM nodes, n),"""
for _i in range(1, 6):
    _PRF_BODY += _PRF_ITER.format(i=_i, p=_i - 1)
_PRF_BODY = _PRF_BODY.rstrip(",")

ORACLES["kg_pagerank_full"] = (
    KG_CTE + _PRF_BODY + "\nSELECT name, ROUND(rank, 8) AS rank FROM r5"
)


ORACLES["kg_similar_content"] = f"""{KG_CTE},
ot AS (
  SELECT entity_name AS eid,
         regexp_extract_all(lower(content), '[a-z0-9]+') AS w
  FROM observations
),
sh AS (
  SELECT DISTINCT eid, unnest(list_distinct(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE []::VARCHAR[] END)) AS shingle
  FROM ot
),
post AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) <= 100),
kept AS (SELECT sh.eid, sh.shingle FROM sh JOIN post USING (shingle)),
sizes AS (SELECT eid, COUNT(*) AS sz FROM kept GROUP BY 1),
pairs AS (
  SELECT a.eid AS entity_a, b.eid AS entity_b, COUNT(*)::BIGINT AS inter_size
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.eid < b.eid
  GROUP BY 1, 2
)
SELECT entity_a, entity_b, inter_size,
       CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
       ROUND(inter_size / (sa.sz + sb.sz - inter_size), 6) AS jaccard
FROM pairs
JOIN sizes sa ON pairs.entity_a = sa.eid
JOIN sizes sb ON pairs.entity_b = sb.eid
WHERE ROUND(inter_size / (sa.sz + sb.sz - inter_size), 6) >= 0.15
"""


# Incremental neighbor-index refresh twins (VERDICT r06 item 1): the
# Spark side builds the index on the md5-bucketed 80% base slice and
# MERGES the 20% delta through kg.refresh.refresh_neighbor_index; the
# oracle takes the OPPOSITE path — one from-scratch build over the
# whole graph — so a hash match proves refresh ≡ rebuild cross-engine
# (the data_shard_plan_incremental trick).
ORACLES["kg_postings_refresh"] = f"""{KG_CTE},
und AS (
  SELECT source AS name, target AS nbr FROM relations
  UNION
  SELECT target, source FROM relations
),
und2 AS (SELECT name, nbr FROM und WHERE name <> nbr),
kept AS (
  SELECT nbr FROM und2 GROUP BY nbr HAVING COUNT(*) <= 256
),
p AS (SELECT u.name, u.nbr FROM und2 u JOIN kept k USING (nbr)),
sizes AS (SELECT name, COUNT(*) AS sz FROM p GROUP BY name)
SELECT u.nbr, u.name, CAST(s.sz AS BIGINT) AS sz
FROM p u JOIN sizes s USING (name)
"""

# the signed pair-stream merge, gated over every counter it carries:
# n_common (additive count), size_a/size_b (rejoined post-merge),
# ra_sum (additive scaled-BIGINT Resource-Allocation sum, raw —
# integer-exact merge); output filtered to n_common >= 3 on BOTH
# engines to keep the parity payload bounded (the merge itself runs
# unfiltered).
ORACLES["kg_pairs_refresh"] = f"""{KG_CTE},
und AS (
  SELECT source AS name, target AS nbr FROM relations
  UNION
  SELECT target, source FROM relations
),
und2 AS (SELECT name, nbr FROM und WHERE name <> nbr),
widths AS (
  SELECT nbr, CAST((1099511627776 + COUNT(*) // 2) // COUNT(*) AS BIGINT)
           AS c
  FROM und2 GROUP BY nbr
  HAVING COUNT(*) <= 256
),
p AS (SELECT u.name, u.nbr, widths.c FROM und2 u JOIN widths USING (nbr)),
sizes AS (SELECT name, COUNT(*) AS sz FROM p GROUP BY name),
pairs AS (
  SELECT x.name AS entity_a, y.name AS entity_b,
         CAST(COUNT(*) AS BIGINT) AS n_common,
         CAST(SUM(x.c) AS BIGINT) AS ra_sum
  FROM p x JOIN p y ON x.nbr = y.nbr AND x.name < y.name
  GROUP BY 1, 2
)
SELECT entity_a, entity_b, n_common,
       CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
       ra_sum
FROM pairs
JOIN sizes sa ON sa.name = entity_a
JOIN sizes sb ON sb.name = entity_b
WHERE n_common >= 3
"""


# --------------------------------------------------------- maintenance gate

# refresh-vs-rebuild plan rows (maintenance.choose_refresh mirrored as
# SQL arithmetic): identical counts, identical width CASE, identical
# boundary constants — the hash match proves the in-plan gate computes
# exactly the documented policy on both engines.
_W = "CASE " + " ".join(
    f"WHEN {{n}} <= {32 * (1 << w)} THEN {w}" for w in range(4, 16)
) + " ELSE 16 END"


def _width(n: str) -> str:
    return _W.format(n=n)


def _plan_postings_cte(sfx: str, pred: str) -> str:
    return f""",
base_{sfx} AS (SELECT * FROM relations WHERE NOT ({pred})),
delta_{sfx} AS (SELECT * FROM relations WHERE ({pred})),
undb_{sfx} AS (
  SELECT DISTINCT least(source, target) AS a, greatest(source, target) AS b
  FROM base_{sfx} WHERE source <> target
),
newe_{sfx} AS (
  SELECT DISTINCT least(source, target) AS a, greatest(source, target) AS b
  FROM delta_{sfx} WHERE source <> target
  EXCEPT
  SELECT a, b FROM undb_{sfx}
),
endp_{sfx} AS (
  SELECT a AS name FROM newe_{sfx} UNION SELECT b FROM newe_{sfx}
),
bidir_{sfx} AS (
  SELECT a AS name, b AS nbr FROM undb_{sfx}
  UNION ALL
  SELECT b, a FROM undb_{sfx}
),
kept_{sfx} AS (
  SELECT nbr FROM bidir_{sfx} GROUP BY nbr HAVING COUNT(*) <= 256
),
sizes_{sfx} AS (
  SELECT name, COUNT(*) AS sz FROM bidir_{sfx}
  WHERE nbr IN (SELECT nbr FROM kept_{sfx}) GROUP BY name
),
stats_{sfx} AS (
  SELECT
    (SELECT COUNT(*) FROM base_{sfx})::BIGINT AS n_base,
    (SELECT COUNT(*) FROM delta_{sfx})::BIGINT AS n_delta,
    ((SELECT COUNT(*) FROM endp_{sfx})
     + COALESCE((SELECT SUM(s.sz) FROM endp_{sfx} e
                 JOIN sizes_{sfx} s USING (name)), 0)) AS n_rw,
    (SELECT COUNT(*) FROM kept_{sfx}) AS n_groups
)"""


_M32 = "('0x' || substr(md5({x}), 1, 8))::BIGINT"
_DENSE_PRED = (
    _M32.format(x="source || '|' || target || '|' || relation_type")
    + " % 20 = 0"
)
_SPARSE_PRED = (
    _M32.format(x="source") + " % 200 = 0 AND "
    + _M32.format(x="target") + " % 200 = 0"
)


def _emb_plan_row(artifact: str, kind: str, mod: int) -> str:
    nb, nd = f"nb{mod}", f"nd{mod}"
    crossed = f"{_width(nb)} <> {_width(f'({nb} + {nd})')}"
    if kind == "signatures":
        frac = f"CASE WHEN {crossed} THEN 1.0 ELSE 0.0 END"
        boundary = "0.5"
    else:
        frac = (
            f"CASE WHEN {crossed} THEN 1.0 ELSE "
            f"ROUND(LEAST(1.0, 32.0 * {nd} / GREATEST({nb}, 1)), 6) END"
        )
        boundary = "0.075"
    return f"""
SELECT '{artifact}' AS artifact, {nb} AS n_base, {nd} AS n_delta,
       CAST({frac} AS DOUBLE) AS est_frac,
       CAST({boundary} AS DOUBLE) AS boundary,
       CASE WHEN {frac} <= {boundary} THEN 'refresh' ELSE 'rebuild' END
         AS path
FROM embc"""


def _postings_plan_row(artifact: str, sfx: str) -> str:
    frac = "ROUND(LEAST(1.0, (n_rw * 1.0) / GREATEST(n_groups, 1)), 6)"
    return f"""
SELECT '{artifact}' AS artifact, n_base, n_delta,
       CAST({frac} AS DOUBLE) AS est_frac,
       CAST(0.5 AS DOUBLE) AS boundary,
       CASE WHEN {frac} <= 0.5 THEN 'refresh' ELSE 'rebuild' END AS path
FROM stats_{sfx}"""


ORACLES["index_refresh_plan"] = (
    KG_CTE
    + """,
embc AS (
  SELECT
    SUM(CASE WHEN vec_id % 19 <> 0 THEN 1 ELSE 0 END)::BIGINT AS nb19,
    SUM(CASE WHEN vec_id % 19 = 0 THEN 1 ELSE 0 END)::BIGINT AS nd19,
    SUM(CASE WHEN vec_id % 500 <> 0 THEN 1 ELSE 0 END)::BIGINT AS nb500,
    SUM(CASE WHEN vec_id % 500 = 0 THEN 1 ELSE 0 END)::BIGINT AS nd500
  FROM embeddings
)"""
    + _plan_postings_cte("d", _DENSE_PRED)
    + _plan_postings_cte("s", _SPARSE_PRED)
    + _emb_plan_row("lsh_signature", "signatures", 19)
    + "\nUNION ALL"
    + _emb_plan_row("lsh_pairs", "pairs", 19)
    + "\nUNION ALL"
    + _emb_plan_row("lsh_pairs_sparse", "pairs", 500)
    + "\nUNION ALL"
    + _postings_plan_row("nbr_postings", "d")
    + "\nUNION ALL"
    + _postings_plan_row("nbr_postings_sparse", "s")
)


# LPA refresh twin: the oracle IS the from-scratch full-graph
# propagation — same rounds, same tie-break — so the refresh path's
# hash match proves refresh ≡ rebuild cross-engine.
ORACLES["kg_lpa_refresh"] = ORACLES["kg_communities"]
