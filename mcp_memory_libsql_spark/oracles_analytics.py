"""DuckDB oracle SQL for the relational/event analytics queries.

Money arithmetic mirrors analytics/tpch.py exactly: DECIMAL casts
before product/sum (exact — inputs are 2-decimal), ROUND on the exact
decimal, CAST back to DOUBLE; averages via the same scaled-integer
half-up division ((2A+N) // (2N), DuckDB's ``//`` == Spark's ``div``
for positive BIGINTs).
"""

ORACLES: dict[str, str] = {}

# Decimal-exact money terms — keep in lockstep with analytics/tpch.py.
_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC = "CAST(l_discount AS DECIMAL(4,2))"
_TAX = "CAST(l_tax AS DECIMAL(4,2))"
_ONE = "CAST(1 AS DECIMAL(3,2))"
_REV = f"{_PRICE} * ({_ONE} - {_DISC})"
_QTY = "CAST(l_quantity AS DECIMAL(12,2))"


def _money_sum(expr_sql: str) -> str:
    return f"CAST(ROUND(SUM({expr_sql}), 2) AS DOUBLE)"


def _avg4(col_dec_sql: str) -> str:
    return (
        f"CAST((2 * SUM(CAST({col_dec_sql} * 10000 AS BIGINT)) + COUNT(*))"
        f" // (2 * COUNT(*)) AS DOUBLE) / 10000"
    )


ORACLES["tpch_q1"] = f"""
SELECT l_returnflag, l_linestatus,
  {_money_sum(_QTY)} AS sum_qty,
  {_money_sum(_PRICE)} AS sum_base_price,
  {_money_sum(_REV)} AS sum_disc_price,
  {_money_sum(f'{_REV} * ({_ONE} + {_TAX})')} AS sum_charge,
  {_avg4(_QTY)} AS avg_qty,
  {_avg4(_PRICE)} AS avg_price,
  {_avg4(_DISC)} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["tpch_q3"] = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       {_money_sum(_REV)} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

ORACLES["tpch_q5"] = f"""
SELECT n1.n_name AS n_name,
       {_money_sum(_REV)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND n1.n_name = n2.n_name
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n1.n_name
"""

ORACLES["events_windowed"] = """
SELECT CAST(FLOOR(FLOOR(epoch(ts)) / 3600) * 3600 AS BIGINT) AS window_start_epoch,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
"""

ORACLES["events_sessionize"] = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR FLOOR(epoch(ts)) - FLOOR(epoch(lag(ts) OVER w)) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
),
sess AS (
  SELECT user_id, ts, value,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, value
                      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       CAST(MIN(FLOOR(epoch(ts))) AS BIGINT) AS start_epoch,
       CAST(MAX(FLOOR(epoch(ts))) AS BIGINT) AS end_epoch,
       ROUND(SUM(value), 2) AS sum_value
FROM sess
GROUP BY user_id, session_id
"""

ORACLES["events_topk_users"] = """
SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id
LIMIT 20
"""

ORACLES["tpch_q3"] = ORACLES["tpch_q3"].replace(
    "SELECT o_orderkey, o_orderdate,",
    "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,",
).replace("GROUP BY o_orderkey, o_orderdate,", "GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'),")

ORACLES["tpch_q6"] = f"""
SELECT {_money_sum(f'{_PRICE} * {_DISC}')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""

ORACLES["tpch_q10"] = f"""
SELECT c_custkey, c_name, n_name,
       {_money_sum(_REV)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

ORACLES["events_daily"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""

# events_user_hll: the register build is pure integer math on the
# portable md5-60 hash — bucket = h mod 256, rho = 53 - bitlen of the
# remaining 52 bits (53 when they are all zero) — so the persisted
# sketch hash-matches across engines; estimation is client-side
ORACLES["events_user_hll"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(h % 256 AS INTEGER) AS bucket,
       CAST(MAX(CASE WHEN h // 256 > 0
                     THEN 53 - length(bin(h // 256))
                     ELSE 53 END) AS INTEGER) AS max_rho
FROM (
  SELECT ts,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM events
)
GROUP BY 1, 2
"""

ORACLES["events_funnel"] = """
WITH ev AS (
  SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch
  FROM events
),
s AS (SELECT user_id, MIN(epoch) AS signup_epoch FROM ev
      WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT user_id, epoch AS p_epoch FROM ev WHERE event_type = 'purchase')
SELECT p.user_id, signup_epoch, MIN(p_epoch) AS purchase_epoch
FROM p JOIN s ON p.user_id = s.user_id
WHERE p_epoch >= signup_epoch AND p_epoch <= signup_epoch + 604800
GROUP BY p.user_id, signup_epoch
"""

ORACLES["tpch_q7"] = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         {_REV} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
"""

ORACLES["events_retention"] = """
WITH wu AS (
  SELECT DISTINCT CAST(FLOOR(FLOOR(epoch(ts)) / 604800) AS BIGINT) AS week,
         user_id
  FROM events
)
SELECT a.week AS week, COUNT(*) AS n_retained
FROM wu a JOIN wu b ON a.user_id = b.user_id AND b.week = a.week + 1
GROUP BY a.week
"""

ORACLES["tpch_q13"] = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""

ORACLES["tpch_q14"] = f"""
SELECT
  {_money_sum(f"CASE WHEN p_type = 'PROMO' THEN {_REV} END")} AS promo_revenue,
  {_money_sum(_REV)} AS total_revenue,
  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} END) AS DOUBLE)
    / CAST(SUM({_REV}) AS DOUBLE) * 100 AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-02-01'
"""

ORACLES["tpch_q15"] = f"""
WITH srev AS (
  SELECT l_suppkey, SUM({_REV}) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(ROUND(total, 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN srev ON s_suppkey = l_suppkey
WHERE total = (SELECT MAX(total) FROM srev)
"""

ORACLES["tpch_q18"] = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice,
       CAST(qty AS DOUBLE) AS sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""

ORACLES["events_cohorts"] = """
WITH wu AS (
  SELECT DISTINCT CAST(FLOOR(FLOOR(epoch(ts)) / 604800) AS BIGINT) AS week,
         user_id
  FROM events
),
first AS (SELECT user_id, MIN(week) AS cohort_week FROM wu GROUP BY user_id)
SELECT cohort_week, week - cohort_week AS week_offset, COUNT(*) AS n_users
FROM wu JOIN first USING (user_id)
GROUP BY cohort_week, week_offset
"""

ORACLES["tpch_q16"] = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY p_brand, p_type, p_size
"""

ORACLES["events_props_stats"] = """
SELECT event_type, COUNT(*) AS n_events,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""

ORACLES["tpch_q4"] = """
WITH late AS (
  SELECT DISTINCT o_orderkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 100 DAY
)
SELECT o_orderpriority, COUNT(*) AS n_late_orders
FROM orders
WHERE o_orderkey IN (SELECT o_orderkey FROM late)
GROUP BY o_orderpriority
"""

ORACLES["tpch_q2"] = """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
cand AS (
  SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM pairs
  JOIN part p ON l_partkey = p.p_partkey
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey
FROM cand c
WHERE s_acctbal = (SELECT MAX(s_acctbal) FROM cand c2
                   WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

ORACLES["tpch_q8"] = f"""
WITH flat AS (
  SELECT YEAR(o_orderdate) AS o_year,
         {_REV} AS volume,
         r2.r_name AS supp_region
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
  WHERE r1.r_name = 'ASIA' AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
)
SELECT o_year,
  CAST(ROUND(SUM(CASE WHEN supp_region = 'EUROPE' THEN volume END), 2)
       AS DOUBLE) AS share_volume,
  CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_volume,
  CAST(COALESCE(SUM(CASE WHEN supp_region = 'EUROPE' THEN volume END), 0)
       AS DOUBLE) / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM flat
GROUP BY o_year
"""

ORACLES["tpch_q9"] = f"""
SELECT n_name AS nation, YEAR(l_shipdate) AS o_year,
  {_money_sum(
      f"{_REV} - CAST(p_retailprice AS DECIMAL(12,2))"
      " * CAST(0.6 AS DECIMAL(2,1)) * CAST(l_quantity AS DECIMAL(12,2))"
  )} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, YEAR(l_shipdate)
"""

ORACLES["tpch_q11"] = f"""
WITH value AS (
  SELECT l_partkey, SUM({_REV}) AS _value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey AS ps_partkey,
       CAST(ROUND(_value, 2) AS DOUBLE) AS value
FROM value
WHERE _value > CAST(0.001 AS DECIMAL(6,4)) * (SELECT SUM(_value) FROM value)
ORDER BY value DESC, ps_partkey
"""

ORACLES["tpch_q12"] = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) >= 90 THEN 'SLOW'
            WHEN datediff('day', o_orderdate, l_shipdate) >= 30 THEN 'MEDIUM'
            ELSE 'FAST' END AS ship_bucket,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS high_line_count,
  SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0
      END) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""

ORACLES["tpch_q17"] = f"""
WITH branded AS (
  SELECT l_partkey, l_quantity, l_extendedprice,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qty100
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
),
stats AS (
  SELECT l_partkey AS _pk, SUM(qty100) AS _sum_qty100, COUNT(*) AS _cnt
  FROM branded GROUP BY l_partkey
)
SELECT {_money_sum(_PRICE)} AS total_price, COUNT(*) AS n_items
FROM branded JOIN stats ON l_partkey = _pk
WHERE 5 * qty100 * _cnt < _sum_qty100
"""

ORACLES["tpch_q19"] = f"""
SELECT {_money_sum(_REV)} AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

ORACLES["tpch_q20"] = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 30
  )
ORDER BY s_suppkey
"""

ORACLES["tpch_q21"] = """
WITH per_os AS (
  SELECT o_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             THEN 1 ELSE 0 END) AS _late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY o_orderkey, l_suppkey
),
per_o AS (
  SELECT o_orderkey AS _ok, COUNT(*) AS _n_supp, SUM(_late) AS _n_late
  FROM per_os GROUP BY o_orderkey
),
waiting AS (
  SELECT l_suppkey, COUNT(*) AS numwait
  FROM per_os JOIN per_o ON o_orderkey = _ok
  WHERE _late = 1 AND _n_supp > 1 AND _n_late = 1
  GROUP BY l_suppkey
)
SELECT s_name, numwait
FROM waiting
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
ORDER BY numwait DESC, s_name
LIMIT 20
"""

ORACLES["tpch_q22"] = """
WITH cust AS (
  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS _bal
  FROM customer
),
stats AS (
  SELECT SUM(_bal) AS _sum_bal, COUNT(*) AS _cnt FROM cust WHERE _bal > 0
)
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(ROUND(SUM(_bal), 2) AS DOUBLE) AS totacctbal
FROM cust, stats
WHERE _bal * _cnt > _sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""

# Window-function family: ROWS frames always ordered by the unique
# (epoch, event_id) tuple; the trailing-hour frame is RANGE
# (tie-safe); money sums in DECIMAL — see analytics/windows.py.
_EV_CTE = """
WITH ev AS (
  SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch,
         CAST(value AS DECIMAL(12,2)) AS val
  FROM events
)
"""

ORACLES["events_rolling_hour"] = (
    _EV_CTE
    + """
SELECT event_id, user_id, epoch,
  COUNT(*) OVER w AS roll_cnt,
  CAST(ROUND(SUM(val) OVER w, 2) AS DOUBLE) AS roll_sum
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY epoch
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""
)

ORACLES["events_cumsum"] = (
    _EV_CTE
    + """
SELECT event_id, user_id, epoch,
  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch, event_id)
    AS ordinal,
  CAST(ROUND(SUM(val) OVER (PARTITION BY user_id ORDER BY epoch, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
       AS DOUBLE) AS running_value
FROM ev
"""
)

ORACLES["events_gaps"] = (
    _EV_CTE
    + """
SELECT event_id, user_id, epoch, gap_s FROM (
  SELECT event_id, user_id, epoch,
         epoch - LAG(epoch) OVER (PARTITION BY user_id
                                  ORDER BY epoch, event_id) AS gap_s
  FROM ev
)
WHERE gap_s IS NOT NULL
"""
)

ORACLES["part_top_suppliers"] = f"""
WITH rev AS (
  SELECT l_partkey, l_suppkey, SUM({_REV}) AS _rev
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT l_partkey, l_suppkey, rnk, revenue FROM (
  SELECT l_partkey, l_suppkey,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY _rev DESC, l_suppkey) AS rnk,
         CAST(ROUND(_rev, 2) AS DOUBLE) AS revenue
  FROM rev
)
WHERE rnk <= 3
"""

ORACLES["events_rollup"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS sum_value
FROM events
GROUP BY ROLLUP(day, event_type)
"""

ORACLES["events_percentiles"] = """
SELECT event_type, COUNT(*) AS n,
       CAST(ROUND(quantile_cont(value, 0.5), 4) AS DOUBLE) AS p50,
       CAST(ROUND(quantile_cont(value, 0.9), 4) AS DOUBLE) AS p90
FROM events
GROUP BY event_type
"""

# Stream-static enrichment twin: the same function runs on the batch
# frame (gated here) and on a streaming frame (tests/test_streaming).
ORACLES["events_enriched"] = """
SELECT event_id, user_id, event_type, value, c_name, c_mktsegment, n_name
FROM events
JOIN customer ON user_id + 1 = c_custkey
JOIN nation ON c_nationkey = n_nationkey
"""

ORACLES["events_zscores"] = """
WITH ev AS (
  SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) AS val
  FROM events
),
stats AS (
  SELECT event_type AS _et, SUM(val) AS _s, SUM(val * val) AS _s2,
         COUNT(*) AS _n
  FROM ev GROUP BY 1
)
SELECT event_id, event_type, value, z FROM (
  SELECT event_id, event_type, CAST(val AS DOUBLE) AS value,
    CAST(ROUND(
      (CAST(val AS DOUBLE) - CAST(_s AS DOUBLE) / _n)
      / sqrt((CAST(_s2 AS DOUBLE) * _n - CAST(_s AS DOUBLE) * CAST(_s AS DOUBLE))
             / (CAST(_n AS DOUBLE) * _n)), 4) AS DOUBLE) AS z,
    (CAST(val AS DOUBLE) - CAST(_s AS DOUBLE) / _n)
      / sqrt((CAST(_s2 AS DOUBLE) * _n - CAST(_s AS DOUBLE) * CAST(_s AS DOUBLE))
             / (CAST(_n AS DOUBLE) * _n)) AS z_exact
  FROM ev JOIN stats ON event_type = _et
)
WHERE abs(z_exact) > 3.0
"""

ORACLES["supplier_cooccurrence"] = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
width AS (
  SELECT l_partkey AS _pk FROM pairs GROUP BY 1 HAVING COUNT(*) <= 50
),
bounded AS (
  SELECT p.l_partkey, p.l_suppkey FROM pairs p JOIN width ON l_partkey = _pk
)
SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
       COUNT(*) AS shared_parts
FROM bounded a
JOIN bounded b ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
GROUP BY 1, 2
"""

# --- temporal operators (analytics/temporal.py) ---
# As-of join ground truth: rank qualifying clicks per purchase by
# (click_t DESC, click_id DESC) — same tiebreak as the Spark union +
# last(ignorenulls) ordering (t, kind, event_id).
ORACLES["events_asof_attribution"] = """
WITH c AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_t
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_t
  FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT p.purchase_id, p.user_id, c.click_id,
         p.purchase_t - c.click_t AS us_since_click,
         ROW_NUMBER() OVER (
           PARTITION BY p.purchase_id
           ORDER BY c.click_t DESC, c.click_id DESC) AS rn
  FROM p JOIN c
    ON p.user_id = c.user_id AND c.click_t <= p.purchase_t
)
SELECT purchase_id, user_id, click_id, us_since_click FROM j WHERE rn = 1
"""

ORACLES["events_range_attribution"] = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS us_between
FROM events p JOIN events c ON p.user_id = c.user_id
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
  AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND CAST(21600 AS BIGINT) * 1000000
"""

# Rollup: minute from raw, hour/day from finer partials; decimal-exact
# sums make the values engine-independent.
ORACLES["events_hypertable"] = """
WITH m AS (
  SELECT (CAST(FLOOR(epoch(ts)) AS BIGINT) // 60) * 60 AS bucket_start,
         event_type, COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,2))) AS _sum
  FROM events GROUP BY 1, 2
),
h AS (
  SELECT (bucket_start // 3600) * 3600 AS bucket_start, event_type,
         SUM(n_events) AS n_events, SUM(_sum) AS _sum
  FROM m GROUP BY 1, 2
),
d AS (
  SELECT (bucket_start // 86400) * 86400 AS bucket_start, event_type,
         SUM(n_events) AS n_events, SUM(_sum) AS _sum
  FROM h GROUP BY 1, 2
)
SELECT 'minute' AS granularity, bucket_start, event_type, n_events,
       CAST(_sum AS DOUBLE) AS sum_value FROM m
UNION ALL
SELECT 'hour', bucket_start, event_type, n_events,
       CAST(_sum AS DOUBLE) FROM h
UNION ALL
SELECT 'day', bucket_start, event_type, n_events,
       CAST(_sum AS DOUBLE) FROM d
"""

# Per-user event-type bigram transition counts + row-normalized
# probability — ground truth for analytics/events.py type_transitions.
ORACLES["events_transitions"] = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id
           ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) AS next_type
  FROM events
),
bi AS (
  SELECT event_type AS prev_type, next_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT prev_type, SUM(n) AS _tot FROM bi GROUP BY 1)
SELECT b.prev_type, b.next_type, b.n,
       ROUND(CAST(b.n AS DOUBLE) / t._tot, 6) AS p
FROM bi b JOIN tot t ON b.prev_type = t.prev_type
"""

# MAD outliers — exact interpolated medians (quantile_cont ==
# Spark percentile on these <=2-decimal inputs), IEEE-identical
# abs/div on both engines given identical inputs.
ORACLES["events_mad_outliers"] = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
),
d AS (
  SELECT e.event_id, e.user_id, e.event_type, e.value, m.med,
         ABS(e.value - m.med) AS absdev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(absdev, 0.5) AS mad FROM d GROUP BY 1
)
SELECT d.event_id, d.user_id, d.event_type, d.value,
       ROUND(d.med, 6) AS med, ROUND(mad.mad, 6) AS mad,
       ROUND(d.absdev / (1.4826 * mad.mad), 6) AS score
FROM d JOIN mad USING (event_type)
WHERE mad.mad > 0 AND d.absdev > 3.0 * (1.4826 * mad.mad)
"""

# Count-min heavy hitters — DuckDB builds the IDENTICAL md5-derived
# sketch (depth 4, width 1024), so estimates match exactly.
ORACLES["events_heavy_hitters_cms"] = """
WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
seeds AS (SELECT unnest(range(0, 4)) AS seed),
rws AS (
  SELECT key, seed,
         ('0x' || substr(md5(seed || ':' || key), 1, 8))::BIGINT % 1024
           AS bucket
  FROM keys CROSS JOIN seeds
),
sketch AS (SELECT seed, bucket, COUNT(*) AS c FROM rws GROUP BY 1, 2),
exact AS (SELECT key, COUNT(*) AS exact_count FROM keys GROUP BY 1),
probes AS (
  SELECT key, exact_count, seed,
         ('0x' || substr(md5(seed || ':' || key), 1, 8))::BIGINT % 1024
           AS bucket
  FROM exact CROSS JOIN seeds
),
est AS (
  SELECT p.key, p.exact_count, MIN(s.c) AS est_count
  FROM probes p JOIN sketch s USING (seed, bucket)
  GROUP BY 1, 2
)
SELECT CAST(key AS BIGINT) AS user_id, est_count, exact_count
FROM est
ORDER BY est_count DESC, user_id
LIMIT 20
"""

# Market-basket rules — all metrics exact rationals of counts.
ORACLES["basket_rules"] = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ic AS (SELECT l_partkey AS item, COUNT(*) AS cnt FROM b GROUP BY 1),
nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM b),
und AS (
  SELECT x.l_partkey AS a, y.l_partkey AS bb, COUNT(*) AS pair_n
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
d AS (
  SELECT a, bb FROM und UNION ALL SELECT bb, a FROM und
),
dd AS (
  SELECT d.a, d.bb, u.pair_n FROM d
  JOIN und u ON (u.a = LEAST(d.a, d.bb) AND u.bb = GREATEST(d.a, d.bb))
)
SELECT dd.a AS antecedent, dd.bb AS consequent, dd.pair_n,
       ca.cnt AS n_a, cb.cnt AS n_b,
       ROUND(CAST(dd.pair_n AS DOUBLE) / nb.n_baskets, 6) AS support,
       ROUND(CAST(dd.pair_n AS DOUBLE) / ca.cnt, 6) AS confidence,
       ROUND(CAST(dd.pair_n AS DOUBLE) * nb.n_baskets
             / (ca.cnt * cb.cnt), 6) AS lift
FROM dd
JOIN ic ca ON ca.item = dd.a
JOIN ic cb ON cb.item = dd.bb
CROSS JOIN nb
"""

# Activity ranks — unique (n_events, user_id) ordering makes
# percent_rank and ntile deterministic.
ORACLES["events_activity_ranks"] = """
WITH c AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1)
SELECT user_id, n_events,
       ROUND(PERCENT_RANK() OVER (ORDER BY n_events, user_id), 6)
         AS pct_rank,
       CAST(NTILE(10) OVER (ORDER BY n_events, user_id) AS INTEGER)
         AS decile
FROM c
"""

# RFM segmentation — decimal-exact monetary, unique-ordered ntiles.
ORACLES["orders_rfm"] = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS monetary
  FROM orders GROUP BY 1
),
ref AS (SELECT MAX(o_orderdate) AS ref_date FROM orders),
scored AS (
  SELECT p.*, CAST(date_diff('day', last_order, ref_date) AS BIGINT)
           AS recency_days
  FROM per_cust p CROSS JOIN ref
)
SELECT o_custkey, recency_days, frequency, monetary,
       CAST(NTILE(5) OVER (ORDER BY recency_days DESC, o_custkey)
            AS INTEGER) AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency, o_custkey)
            AS INTEGER) AS f_score,
       CAST(NTILE(5) OVER (ORDER BY monetary, o_custkey)
            AS INTEGER) AS m_score,
       CAST(NTILE(5) OVER (ORDER BY recency_days DESC, o_custkey) * 100
          + NTILE(5) OVER (ORDER BY frequency, o_custkey) * 10
          + NTILE(5) OVER (ORDER BY monetary, o_custkey)
            AS INTEGER) AS rfm_cell
FROM scored
"""

# Seasonality — integer epoch calendar math (portable week-start).
ORACLES["events_seasonality"] = """
WITH e AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch, user_id, value
  FROM events
)
SELECT CAST((epoch // 86400 + 4) % 7 AS INTEGER) AS dow,
       CAST((epoch % 86400) // 3600 AS INTEGER) AS hour,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS sum_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM e GROUP BY 1, 2
"""

# A/B value test — md5-parity split, Welch t from exact decimal moments.
ORACLES["events_ab_test"] = """
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS vu
  FROM events GROUP BY user_id
),
k AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2
           AS variant,
         vu AS v,
         CAST(vu AS DECIMAL(18,2)) * CAST(vu AS DECIMAL(19,2)) AS v2
  FROM per_user
),
agg AS (
  SELECT SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
         CAST(SUM(CASE WHEN variant = 0 THEN v END) AS DOUBLE) AS sa,
         CAST(SUM(CASE WHEN variant = 1 THEN v END) AS DOUBLE) AS sb,
         CAST(SUM(CASE WHEN variant = 0 THEN v2 END) AS DOUBLE) AS sa2,
         CAST(SUM(CASE WHEN variant = 1 THEN v2 END) AS DOUBLE) AS sb2
  FROM k
)
SELECT n_a, n_b,
       ROUND(sa / n_a, 6) AS mean_a,
       ROUND(sb / n_b, 6) AS mean_b,
       ROUND(sb / n_b - sa / n_a, 6) AS diff,
       ROUND((sb / n_b - sa / n_a)
           / sqrt(((sa2 - sa * sa / n_a) / (n_a - 1)) / n_a
                + ((sb2 - sb * sb / n_b) / (n_b - 1)) / n_b), 6) AS t_stat
FROM agg
"""

# Pareto — decimal-exact cumsum, unique (rev DESC, partkey) ordering.
ORACLES["parts_pareto"] = f"""
WITH per_part AS (
  SELECT l_partkey, SUM({_REV}) AS _rev
  FROM lineitem GROUP BY 1
),
tot AS (SELECT SUM(_rev) AS _total FROM per_part)
SELECT l_partkey,
       CAST(ROUND(_rev, 2) AS DOUBLE) AS revenue,
       ROUND(CAST(_rev AS DOUBLE) / CAST(_total AS DOUBLE), 6) AS share,
       ROUND(CAST(SUM(_rev) OVER (ORDER BY _rev DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / CAST(_total AS DOUBLE), 6) AS cum_share,
       CAST(ROW_NUMBER() OVER (ORDER BY _rev DESC, l_partkey) AS INTEGER)
         AS revenue_rank
FROM per_part CROSS JOIN tot
"""

# Seasonal-naive backtest — exact decimal errors, one division at end.
ORACLES["events_forecast_eval"] = """
WITH hourly AS (
  SELECT (CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket,
         event_type,
         SUM(CAST(value AS DECIMAL(18,2))) AS y
  FROM events GROUP BY 1, 2
)
SELECT a.event_type,
       COUNT(*) AS n_hours,
       ROUND(CAST(SUM(ABS(a.y - p.y)) AS DOUBLE) / COUNT(*), 6) AS mae,
       ROUND(CAST(SUM(a.y - p.y) AS DOUBLE) / COUNT(*), 6) AS mean_error
FROM hourly a
JOIN hourly p
  ON a.bucket = p.bucket + 604800 AND a.event_type = p.event_type
GROUP BY a.event_type
"""

# K-step ordered funnel — chained conditional-min rollups.
ORACLES["events_funnel_steps"] = """
WITH e AS (
  SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch
  FROM events
),
s1 AS (SELECT user_id, MIN(epoch) AS t0 FROM e
       WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.epoch) AS t0 FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click'
         AND e.epoch >= s1.t0 AND e.epoch <= s1.t0 + 604800
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.epoch) AS t0 FROM e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase'
         AND e.epoch >= s2.t0 AND e.epoch <= s2.t0 + 604800
       GROUP BY e.user_id)
SELECT 'signup' AS step, 1 AS step_idx, COUNT(*) AS n_users FROM s1
UNION ALL
SELECT 'click', 2, COUNT(*) FROM s2
UNION ALL
SELECT 'purchase', 3, COUNT(*) FROM s3
"""

# Equi-depth histogram — deterministic ntile boundaries.
ORACLES["events_value_histogram_ed"] = """
WITH b AS (
  SELECT value,
         NTILE(10) OVER (ORDER BY value, event_id) AS bucket
  FROM events
)
SELECT CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n,
       MIN(value) AS lo, MAX(value) AS hi
FROM b GROUP BY 1
"""

ORACLES["events_user_lifetime"] = """
SELECT user_id,
       MIN(FLOOR(epoch(ts)))::BIGINT AS first_epoch,
       MAX(FLOOR(epoch(ts)))::BIGINT AS last_epoch,
       (MAX(FLOOR(epoch(ts))) - MIN(FLOOR(epoch(ts))))::BIGINT
         AS lifespan_secs,
       COUNT(*) AS n_events,
       COUNT(DISTINCT FLOOR(FLOOR(epoch(ts)) / 86400)) AS n_active_days,
       COUNT(DISTINCT event_type) AS n_types,
       ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 1
"""

ORACLES["events_dau_wau"] = """
WITH du AS (
  SELECT DISTINCT
    CAST(FLOOR(FLOOR(epoch(ts)) / 86400) * 86400 AS BIGINT) AS day_epoch,
    user_id
  FROM events
),
dau AS (SELECT day_epoch, COUNT(*) AS dau FROM du GROUP BY 1),
contrib AS (
  SELECT day_epoch + 86400 * unnest(range(0, 7)) AS day_epoch, user_id
  FROM du
),
wau AS (SELECT day_epoch, COUNT(DISTINCT user_id) AS wau
        FROM contrib GROUP BY 1)
SELECT d.day_epoch, d.dau, w.wau
FROM dau d JOIN wau w USING (day_epoch)
"""

ORACLES["events_sliding"] = """
WITH ex AS (
  SELECT CAST(FLOOR(FLOOR(epoch(ts)) / 900) * 900
              - 900 * (1 - unnest(range(0, 2))) AS BIGINT)
           AS window_start_epoch,
         event_type, user_id, value
  FROM events
)
SELECT window_start_epoch, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 2) AS sum_value
FROM ex GROUP BY 1, 2
"""

ORACLES["orders_yoy_growth"] = """
WITH rev AS (
  SELECT n_name, year(o_orderdate) AS o_year,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
lagged AS (
  SELECT n_name, o_year, revenue,
         lag(revenue) OVER (PARTITION BY n_name ORDER BY o_year) AS prev
  FROM rev
)
SELECT n_name, o_year,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(prev AS DOUBLE) AS prev_revenue,
       ROUND(CAST(revenue - prev AS DOUBLE) / CAST(prev AS DOUBLE), 6)
         AS yoy_growth
FROM lagged
"""

ORACLES["events_winsorize"] = """
WITH ev AS (
  SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) AS val
  FROM events
),
ranked AS (
  SELECT event_type, val,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY val, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
kd AS (SELECT *, CAST(n * 5 // 100 AS BIGINT) AS k FROM ranked),
bounds AS (
  SELECT event_type,
         MIN(CASE WHEN rn = k + 1 THEN val END) AS lo_val,
         MIN(CASE WHEN rn = n - k THEN val END) AS hi_val
  FROM kd GROUP BY 1
),
clipped AS (
  SELECT kd.event_type, kd.val, kd.n, kd.k, b.lo_val, b.hi_val,
         CASE WHEN kd.rn <= kd.k THEN b.lo_val
              WHEN kd.rn > kd.n - kd.k THEN b.hi_val
              ELSE kd.val END AS wval
  FROM kd JOIN bounds b ON kd.event_type = b.event_type
)
SELECT event_type,
       MAX(n)::BIGINT AS n,
       MAX(k)::BIGINT AS k,
       CAST(MAX(lo_val) AS DOUBLE) AS lo_val,
       CAST(MAX(hi_val) AS DOUBLE) AS hi_val,
       ROUND(CAST(SUM(val) AS DOUBLE) / MAX(n), 6) AS mean_raw,
       ROUND(CAST(SUM(wval) AS DOUBLE) / MAX(n), 6) AS mean_winsorized
FROM clipped GROUP BY 1
"""


ORACLES["events_session_stats"] = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR FLOOR(epoch(ts)) - FLOOR(epoch(lag(ts) OVER w)) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
),
sess AS (
  SELECT user_id, ts,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, value
                      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
per AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         MAX(FLOOR(epoch(ts))) - MIN(FLOOR(epoch(ts))) AS dur
  FROM sess GROUP BY 1, 2
)
SELECT COUNT(*)::BIGINT AS n_sessions,
       SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT
         AS n_single_event,
       ROUND(SUM(n_events) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_events,
       ROUND(SUM(dur) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_duration_secs,
       MAX(dur)::BIGINT AS max_duration_secs
FROM per
"""

ORACLES["events_cusum"] = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS _total,
               COUNT(*) AS _days FROM daily),
cum AS (
  SELECT day, n_events,
    SUM(n_events) OVER (ORDER BY day) AS _cum,
    ROW_NUMBER() OVER (ORDER BY day) AS _i
  FROM daily
)
SELECT day, CAST(n_events AS BIGINT) AS n_events,
  ROUND(CAST(_cum * _days - _i * _total AS BIGINT)
        / CAST(_days AS DOUBLE), 4) AS cusum,
  abs(CAST(_cum * _days - _i * _total AS BIGINT)) > 2 * _total AS is_shift
FROM cum, tot
"""

ORACLES["data_skew_report"] = """
WITH keys AS (
  SELECT 'l_orderkey' AS key_name, l_orderkey AS key_value FROM lineitem
  UNION ALL
  SELECT 'l_partkey', l_partkey FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', l_suppkey FROM lineitem
),
widths AS (
  SELECT key_name, key_value, COUNT(*) AS w FROM keys GROUP BY 1, 2
)
SELECT key_name,
  CAST(SUM(w) AS BIGINT) AS n_rows,
  CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(MAX(w) AS BIGINT) AS max_width,
  ROUND(MAX(w) / CAST(SUM(w) AS DOUBLE), 6) AS top_share,
  ROUND(SUM(w) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_width
FROM widths GROUP BY key_name
"""

ORACLES["events_lateness_profile"] = """
WITH ev AS (
  SELECT event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep,
         event_id // 1024 AS bkt
  FROM events
),
pb AS (SELECT bkt, MAX(ep) AS bmax FROM ev GROUP BY 1),
pr AS (
  SELECT bkt, MAX(bmax) OVER (
    ORDER BY bkt ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ) AS prior_max
  FROM pb
),
x AS (
  SELECT e.ep,
    MAX(e.ep) OVER (
      PARTITION BY e.bkt ORDER BY e.event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS in_max,
    pr.prior_max
  FROM ev e JOIN pr ON e.bkt = pr.bkt
),
late AS (
  SELECT greatest(in_max, prior_max) - ep AS late_by
  FROM x
  WHERE in_max IS NOT NULL OR prior_max IS NOT NULL
),
d AS (
  SELECT * FROM late
  CROSS JOIN (VALUES (60), (600), (3600), (21600)) AS t(delay_secs)
)
SELECT CAST(delay_secs AS INTEGER) AS delay_secs,
  CAST(SUM(CASE WHEN late_by > delay_secs THEN 1 ELSE 0 END) AS BIGINT)
    AS n_late,
  ROUND(SUM(CASE WHEN late_by > delay_secs THEN 1 ELSE 0 END)
        / CAST(COUNT(*) AS DOUBLE), 6) AS late_share
FROM d GROUP BY delay_secs
"""

ORACLES["join_cardinality_report"] = """
WITH
la AS (SELECT l_orderkey AS k, COUNT(*) AS wa FROM lineitem GROUP BY 1),
oa AS (SELECT o_orderkey AS k, COUNT(*) AS wb FROM orders GROUP BY 1),
lp AS (SELECT l_partkey AS k, COUNT(*) AS wa FROM lineitem GROUP BY 1),
pp AS (SELECT p_partkey AS k, COUNT(*) AS wb FROM part GROUP BY 1),
ls AS (SELECT l_suppkey AS k, COUNT(*) AS wa FROM lineitem GROUP BY 1),
ss AS (SELECT s_suppkey AS k, COUNT(*) AS wb FROM supplier GROUP BY 1),
oc AS (SELECT o_custkey AS k, COUNT(*) AS wa FROM orders GROUP BY 1),
cc AS (SELECT c_custkey AS k, COUNT(*) AS wb FROM customer GROUP BY 1)
SELECT 'lineitem_x_orders' AS join_name,
  CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(wa * wb) AS BIGINT) AS est_rows,
  CAST(MAX(wa * wb) AS BIGINT) AS max_key_rows
FROM la JOIN oa USING (k)
UNION ALL
SELECT 'lineitem_x_part', CAST(COUNT(*) AS BIGINT),
  CAST(SUM(wa * wb) AS BIGINT), CAST(MAX(wa * wb) AS BIGINT)
FROM lp JOIN pp USING (k)
UNION ALL
SELECT 'lineitem_x_supplier', CAST(COUNT(*) AS BIGINT),
  CAST(SUM(wa * wb) AS BIGINT), CAST(MAX(wa * wb) AS BIGINT)
FROM ls JOIN ss USING (k)
UNION ALL
SELECT 'orders_x_customer', CAST(COUNT(*) AS BIGINT),
  CAST(SUM(wa * wb) AS BIGINT), CAST(MAX(wa * wb) AS BIGINT)
FROM oc JOIN cc USING (k)
"""

ORACLES["events_session_paths"] = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep
  FROM events
),
l AS (
  SELECT *, lag(ep) OVER (PARTITION BY user_id ORDER BY ep, event_id)
    AS prev
  FROM ev
),
s AS (
  SELECT *, SUM(CASE WHEN prev IS NULL OR ep - prev > 1800
                     THEN 1 ELSE 0 END)
    OVER (PARTITION BY user_id ORDER BY ep, event_id
          ROWS UNBOUNDED PRECEDING) AS sid
  FROM l
),
r AS (
  SELECT *, ROW_NUMBER()
    OVER (PARTITION BY user_id, sid ORDER BY ep, event_id) AS rn
  FROM s
),
p AS (
  SELECT user_id, sid, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 8 GROUP BY 1, 2
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM p GROUP BY 1
ORDER BY n_sessions DESC, path
LIMIT 20
"""

ORACLES["orders_ship_latency"] = """
WITH li AS (
  SELECT l_orderkey,
         CAST(FLOOR(epoch(l_shipdate)) AS BIGINT) // 86400 AS ship_day
  FROM lineitem
),
o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS order_day
  FROM orders
),
j AS (
  SELECT o_orderpriority, ship_day - order_day AS days
  FROM li JOIN o ON l_orderkey = o_orderkey
)
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(MIN(days) AS BIGINT) AS min_days,
  CAST(MAX(days) AS BIGINT) AS max_days,
  ROUND(SUM(days) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_days
FROM j GROUP BY 1
"""

ORACLES["events_ab_srm"] = """
WITH k AS (
  SELECT DISTINCT user_id,
    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2
           AS grp
  FROM events
),
agg AS (
  SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM k
)
SELECT n_a, n_b,
  ROUND((n_a - n_b) * (n_a - n_b) / CAST(n_a + n_b AS DOUBLE), 6) AS chi2,
  (n_a - n_b) * (n_a - n_b) / CAST(n_a + n_b AS DOUBLE) > 3.84
    AS srm_suspect
FROM agg
"""

ORACLES["events_daily_dense"] = """
WITH ev AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day_num, event_type
  FROM events
),
counts AS (
  SELECT day_num, event_type, COUNT(*) AS n FROM ev GROUP BY 1, 2
),
span AS (SELECT MIN(day_num) AS lo, MAX(day_num) AS hi FROM ev),
days AS (SELECT unnest(range(lo, hi + 1)) AS day_num FROM span),
types AS (SELECT DISTINCT event_type FROM ev)
SELECT strftime(to_timestamp(day_num * 86400), '%Y-%m-%d') AS day,
       event_type,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_events
FROM days CROSS JOIN types
LEFT JOIN counts USING (day_num, event_type)
"""

ORACLES["events_type_pivot"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_click,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_error,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_purchase,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_signup,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_view
FROM events GROUP BY 1
"""

ORACLES["tpch_cube"] = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {_money_sum(_QTY)} AS sum_qty,
       {_money_sum(_REV)} AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLES["events_new_vs_returning"] = """
WITH ev AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day_num
  FROM events
),
first AS (SELECT user_id, MIN(day_num) AS first_day FROM ev GROUP BY 1)
SELECT strftime(to_timestamp(day_num * 86400), '%Y-%m-%d') AS day,
  CAST(SUM(CASE WHEN day_num = first_day THEN 1 ELSE 0 END) AS BIGINT)
    AS n_new,
  CAST(SUM(CASE WHEN day_num <> first_day THEN 1 ELSE 0 END) AS BIGINT)
    AS n_returning,
  CAST(COUNT(*) AS BIGINT) AS n_active
FROM ev JOIN first USING (user_id)
GROUP BY day_num
"""

ORACLES["events_sessionize_native"] = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR FLOOR(epoch(ts)) - FLOOR(epoch(lag(ts) OVER w)) >= 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(MIN(FLOOR(epoch(ts))) AS BIGINT) AS start_epoch,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM sess
GROUP BY user_id, session_id
"""

ORACLES["events_peak_concurrency"] = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR FLOOR(epoch(ts)) - FLOOR(epoch(lag(ts) OVER w)) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
),
sess AS (
  SELECT user_id, ts,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, value
                      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
bounds AS (
  SELECT user_id, session_id,
         CAST(MIN(FLOOR(epoch(ts))) AS BIGINT) AS start_epoch,
         CAST(MAX(FLOOR(epoch(ts))) AS BIGINT) AS end_epoch
  FROM sess GROUP BY 1, 2
),
b AS (
  SELECT start_epoch AS ep, 1 AS delta, user_id FROM bounds
  UNION ALL
  SELECT end_epoch + 1, -1, user_id FROM bounds
),
swept AS (
  SELECT ep // 86400 AS day_num, delta,
    SUM(delta) OVER (PARTITION BY ep // 86400
                     ORDER BY ep, delta DESC, user_id
                     ROWS UNBOUNDED PRECEDING) AS running
  FROM b
),
per_day AS (
  SELECT day_num, MAX(running) AS max_run, SUM(delta) AS day_net,
         CAST(COUNT(*) AS BIGINT) AS n_boundaries
  FROM swept GROUP BY day_num
)
SELECT strftime(to_timestamp(day_num * 86400), '%Y-%m-%d') AS day,
       CAST(COALESCE(SUM(day_net) OVER (ORDER BY day_num
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + max_run AS BIGINT) AS peak_concurrent,
       n_boundaries
FROM per_day
"""

ORACLES["events_gap_histogram"] = """
WITH ev AS (
  SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch
  FROM events
),
g AS (
  SELECT epoch - lag(epoch) OVER (PARTITION BY user_id
                                  ORDER BY epoch, event_id) AS gap_s
  FROM ev
),
gg AS (SELECT gap_s FROM g WHERE gap_s IS NOT NULL)
SELECT CAST(0 AS BIGINT) AS gap_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_gaps, TRUE AS is_zero
FROM gg WHERE gap_s = 0 HAVING COUNT(*) > 0
UNION ALL
SELECT CAST(1::BIGINT << CAST(floor(log2(gap_s)) AS INTEGER) AS BIGINT),
       CAST(COUNT(*) AS BIGINT), FALSE
FROM gg WHERE gap_s > 0 GROUP BY 1
"""

ORACLES["orders_monthly_trend"] = f"""
WITH m AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY 1
)
SELECT month, revenue,
  lag(revenue) OVER (ORDER BY month) AS prev_revenue,
  ROUND(revenue - lag(revenue) OVER (ORDER BY month), 2) AS mom_delta
FROM m
"""

ORACLES["events_sample_est"] = """
WITH s AS (
  SELECT event_type, COUNT(*) AS n_sample,
         SUM(CAST(value AS DECIMAL(18,2))) AS sample_sum
  FROM events
  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
        % 100 < 10
  GROUP BY 1
),
x AS (
  SELECT event_type, COUNT(*) AS exact_events,
         SUM(CAST(value AS DECIMAL(18,2))) AS exact_value_sum
  FROM events GROUP BY 1
)
SELECT x.event_type,
  CAST(COALESCE(n_sample, 0) AS BIGINT) AS n_sample,
  CAST(COALESCE(n_sample, 0) * 10 AS BIGINT) AS est_events,
  CAST(exact_events AS BIGINT) AS exact_events,
  CAST(COALESCE(sample_sum, CAST(0 AS DECIMAL(18,2))) * 10
       AS DECIMAL(28,2)) AS est_value_sum,
  CAST(exact_value_sum AS DECIMAL(28,2)) AS exact_value_sum
FROM x LEFT JOIN s ON x.event_type = s.event_type
"""

ORACLES["orders_cohort_ltv"] = """
WITH o AS (
  SELECT o_custkey, year(o_orderdate) AS o_year,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
first AS (SELECT o_custkey, MIN(o_year) AS cohort_year FROM o GROUP BY 1),
sizes AS (SELECT cohort_year, COUNT(*) AS n_customers FROM first GROUP BY 1),
cells AS (
  SELECT f.cohort_year, o.o_year - f.cohort_year AS age_years,
         SUM(price) AS revenue
  FROM o JOIN first f USING (o_custkey)
  GROUP BY 1, 2
)
SELECT c.cohort_year,
  CAST(c.age_years AS INTEGER) AS age_years,
  CAST(s.n_customers AS BIGINT) AS n_customers,
  CAST(c.revenue AS DECIMAL(28,2)) AS revenue,
  ROUND(CAST(SUM(CAST(c.revenue AS DECIMAL(28,2))) OVER (
          PARTITION BY c.cohort_year ORDER BY c.age_years
          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        / CAST(s.n_customers AS DOUBLE), 2) AS cum_revenue_per_customer
FROM cells c JOIN sizes s USING (cohort_year)
"""

ORACLES["supplier_scorecard"] = """
WITH j AS (
  SELECT l_suppkey, l_returnflag,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) AS delay
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
r AS (
  SELECT l_suppkey, COUNT(*) AS n_lines,
         SUM(CASE WHEN delay > 60 THEN 1 ELSE 0 END) AS n_late,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned,
         SUM(delay) AS delay_sum
  FROM j GROUP BY 1 HAVING COUNT(*) >= 5
)
SELECT s_name,
  CAST(n_lines AS BIGINT) AS n_lines,
  CAST(n_late AS BIGINT) AS n_late,
  ROUND(CAST(n_late AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) AS late_rate,
  CAST(n_returned AS BIGINT) AS n_returned,
  ROUND(CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE), 6)
    AS return_rate,
  ROUND(CAST(delay_sum AS DOUBLE) / CAST(n_lines AS DOUBLE), 4)
    AS avg_delay_days
FROM r JOIN supplier ON l_suppkey = s_suppkey
"""

ORACLES["events_conversion_windows"] = """
WITH su AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
fp AS (
  SELECT s.user_id, s.signup_ts, MIN(e.ts) AS first_purchase
  FROM su s LEFT JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
   AND e.ts >= s.signup_ts
  GROUP BY 1, 2
),
base AS (
  SELECT COUNT(*) AS n_signups,
    SUM(CASE WHEN first_purchase IS NOT NULL AND
      epoch(first_purchase) - epoch(signup_ts) <= 1 * 86400
      THEN 1 ELSE 0 END) AS c1,
    SUM(CASE WHEN first_purchase IS NOT NULL AND
      epoch(first_purchase) - epoch(signup_ts) <= 3 * 86400
      THEN 1 ELSE 0 END) AS c3,
    SUM(CASE WHEN first_purchase IS NOT NULL AND
      epoch(first_purchase) - epoch(signup_ts) <= 7 * 86400
      THEN 1 ELSE 0 END) AS c7
  FROM fp
)
SELECT CAST(w AS INTEGER) AS window_days,
  CAST(n_signups AS BIGINT) AS n_signups,
  CAST(CASE w WHEN 1 THEN c1 WHEN 3 THEN c3 ELSE c7 END AS BIGINT)
    AS n_converted,
  ROUND(CAST(CASE w WHEN 1 THEN c1 WHEN 3 THEN c3 ELSE c7 END AS DOUBLE)
        / CAST(n_signups AS DOUBLE), 6) AS conversion_rate
FROM base, unnest([1, 3, 7]) AS t(w)
"""

ORACLES["events_type_overlap"] = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY 1),
ovl AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_both
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b,
  CAST(sa.n AS BIGINT) AS n_a,
  CAST(sb.n AS BIGINT) AS n_b,
  CAST(n_both AS BIGINT) AS n_both,
  ROUND(CAST(n_both AS DOUBLE)
        / CAST(sa.n + sb.n - n_both AS DOUBLE), 6) AS jaccard
FROM ovl
JOIN sizes sa ON type_a = sa.event_type
JOIN sizes sb ON type_b = sb.event_type
"""

ORACLES["events_bounce_rate"] = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR FLOOR(epoch(ts)) - FLOOR(epoch(lag(ts) OVER w)) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
),
sess AS (
  SELECT user_id, ts, value,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, value
                      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
per_sess AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         MIN(FLOOR(epoch(ts))) AS start_epoch
  FROM sess GROUP BY 1, 2
)
SELECT strftime(make_timestamp(CAST(start_epoch * 1000000 AS BIGINT)),
                '%Y-%m-%d') AS day,
  CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_bounces,
  ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
FROM per_sess GROUP BY 1
"""

ORACLES["events_user_histogram"] = """
WITH pu AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1)
SELECT CAST(FLOOR(log2(n_events)) AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(MIN(n_events) AS BIGINT) AS min_events,
  CAST(MAX(n_events) AS BIGINT) AS max_events
FROM pu GROUP BY 1
"""

ORACLES["events_time_to_convert"] = """
WITH ev AS (
  SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch
  FROM events
),
s AS (SELECT user_id, MIN(epoch) AS t0 FROM ev
      WHERE event_type = 'signup' GROUP BY user_id),
d AS (
  SELECT p.user_id, MIN(p.epoch) - MIN(t0) AS delay_s
  FROM ev p JOIN s ON p.user_id = s.user_id
  WHERE p.event_type = 'purchase'
    AND p.epoch >= t0 AND p.epoch <= t0 + 2592000
  GROUP BY p.user_id
)
SELECT CAST(0 AS BIGINT) AS delay_bucket_s,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(delay_s) AS BIGINT) AS min_delay_s,
       CAST(MAX(delay_s) AS BIGINT) AS max_delay_s
FROM d WHERE delay_s = 0 HAVING COUNT(*) > 0
UNION ALL
SELECT CAST(1::BIGINT << CAST(floor(log2(delay_s)) AS INTEGER) AS BIGINT),
       CAST(COUNT(*) AS BIGINT),
       CAST(MIN(delay_s) AS BIGINT), CAST(MAX(delay_s) AS BIGINT)
FROM d WHERE delay_s > 0 GROUP BY 1
"""

# EWMA anomaly scan: α=0.25 (exactly binary-representable), every
# smoothed value re-folded over the chronological prefix — the
# identical IEEE sequence Spark's aggregate() computes (list_reduce
# inits from element 1 = s₁ = x₁, exactly the Spark init).
ORACLES["events_ewma"] = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
per AS (
  SELECT event_type,
         list(day ORDER BY day) AS days,
         list_transform(list(n ORDER BY day), x -> x::DOUBLE) AS nsd,
         list(n ORDER BY day) AS ns
  FROM daily GROUP BY 1
),
rows_ AS (
  SELECT event_type,
    unnest(list_transform(range(1, len(ns) + 1), t -> struct_pack(
      day := days[t],
      n_events := ns[t],
      ewma := round(list_reduce(list_slice(nsd, 1, t),
                                (a, x) -> a + 0.25 * (x - a)), 4),
      residual := CASE WHEN t = 1 THEN NULL
                  ELSE round(nsd[t] - list_reduce(list_slice(nsd, 1, t - 1),
                                                  (a, x) -> a + 0.25 * (x - a)),
                             4)
                  END))) AS r
  FROM per
)
SELECT event_type, r.day AS day, r.n_events AS n_events,
       r.ewma AS ewma, r.residual AS residual
FROM rows_
"""

ORACLES["orders_backlog"] = """
WITH closes AS (
  SELECT l_orderkey AS o_orderkey, MAX(l_shipdate) AS close_date
  FROM lineitem GROUP BY 1
),
spans AS (
  SELECT o.o_orderkey, o.o_orderdate, close_date
  FROM orders o JOIN closes USING (o_orderkey)
),
deltas AS (
  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS opened, 0 AS closed
  FROM spans
  UNION ALL
  SELECT CAST(close_date AS DATE) + 1, 0, 1 FROM spans
),
d AS (
  SELECT day, CAST(SUM(opened) AS BIGINT) AS n_opened,
         CAST(SUM(closed) AS BIGINT) AS n_closed
  FROM deltas GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_opened, n_closed,
  CAST(SUM(n_opened - n_closed) OVER (ORDER BY day) AS BIGINT) AS backlog
FROM d
"""

ORACLES["data_quality_checks"] = """
SELECT 'lineitem.quantity_in_1_50' AS check_name,
  CAST(COUNT(*) AS BIGINT) AS n_checked,
  CAST(SUM(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
            THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
  SUM(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
      THEN 0 ELSE 1 END) = 0 AS passed
FROM lineitem
UNION ALL
SELECT 'lineitem.discount_in_0_0.1', CAST(COUNT(*) AS BIGINT),
  CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
            THEN 0 ELSE 1 END) AS BIGINT),
  SUM(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
      THEN 0 ELSE 1 END) = 0
FROM lineitem
UNION ALL
SELECT 'lineitem.returnflag_enum', CAST(COUNT(*) AS BIGINT),
  CAST(SUM(CASE WHEN l_returnflag IN ('A','N','R')
            THEN 0 ELSE 1 END) AS BIGINT),
  SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) = 0
FROM lineitem
UNION ALL
SELECT 'orders.orderstatus_enum', CAST(COUNT(*) AS BIGINT),
  CAST(SUM(CASE WHEN o_orderstatus IN ('F','O','P')
            THEN 0 ELSE 1 END) AS BIGINT),
  SUM(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END) = 0
FROM orders
UNION ALL
SELECT 'orders.custkey_not_null', CAST(COUNT(*) AS BIGINT),
  CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT),
  SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) = 0
FROM orders
UNION ALL
SELECT 'lineitem.orderkey_fk_orders',
  CAST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS BIGINT),
  CAST((SELECT COUNT(*) FROM (
     SELECT DISTINCT l_orderkey FROM lineitem
     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
  )) AS BIGINT),
  (SELECT COUNT(*) FROM (
     SELECT DISTINCT l_orderkey FROM lineitem
     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
  )) = 0
UNION ALL
SELECT 'orders.orderkey_unique',
  CAST(COUNT(*) AS BIGINT),
  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
  SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0
FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY 1)
"""

ORACLES["events_user_features"] = """
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_active_days,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_click,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_view,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_purchase,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_signup,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_error,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
    AS total_value,
  strftime(MIN(CAST(ts AS DATE)), '%Y-%m-%d') AS first_day,
  strftime(MAX(CAST(ts AS DATE)), '%Y-%m-%d') AS last_day
FROM events GROUP BY user_id
"""

ORACLES["nation_supplier_hhi"] = f"""
WITH per_supp AS (
  SELECT l_suppkey, CAST(ROUND(SUM({_REV}), 2) AS DECIMAL(18,2)) AS r
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT n_name AS nation, r
  FROM per_supp
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
),
agg AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
    CAST(SUM(r) AS DOUBLE) AS _total,
    CAST(SUM(CAST(r AS DECIMAL(18,2)) * CAST(r AS DECIMAL(19,2)))
         AS DOUBLE) AS _sumsq
  FROM j GROUP BY 1
)
SELECT nation, n_suppliers,
  ROUND(_total, 2) AS revenue,
  ROUND(_sumsq / (_total * _total), 6) AS hhi,
  ROUND(1.0 / ROUND(_sumsq / (_total * _total), 6), 2) AS equiv_suppliers
FROM agg
"""


ORACLES["events_bot_score"] = (
    _EV_CTE
    + """,
gaps AS (
  SELECT user_id, gap_s FROM (
    SELECT user_id,
           epoch - LAG(epoch) OVER (PARTITION BY user_id
                                    ORDER BY epoch, event_id) AS gap_s
    FROM ev
  ) WHERE gap_s IS NOT NULL
),
agg AS (
  SELECT user_id,
         COUNT(*)::BIGINT AS n_gaps,
         SUM(gap_s)::BIGINT AS total_gap_s,
         SUM(gap_s::DECIMAL(19,0) * gap_s)::DECIMAL(38,0) AS ss
  FROM gaps GROUP BY 1
  HAVING COUNT(*) >= 2
)
SELECT user_id, n_gaps, total_gap_s,
  CASE WHEN total_gap_s > 0 THEN
    ROUND(sqrt(GREATEST(
      ss::DOUBLE / n_gaps
      - (total_gap_s / n_gaps) * (total_gap_s / n_gaps), 0.0))
      / (total_gap_s / n_gaps), 6)
  END AS cv,
  CASE WHEN total_gap_s > 0 THEN
    ROUND(sqrt(GREATEST(
      ss::DOUBLE / n_gaps
      - (total_gap_s / n_gaps) * (total_gap_s / n_gaps), 0.0))
      / (total_gap_s / n_gaps), 6) <= 0.1
  END AS is_regular
FROM agg
"""
)


ORACLES["events_type_entropy"] = """
WITH pt AS (
  SELECT user_id, event_type, COUNT(*)::BIGINT AS n_t
  FROM events GROUP BY 1, 2
),
pu AS (
  SELECT user_id, SUM(n_t)::BIGINT AS n, COUNT(*)::BIGINT AS n_types
  FROM pt GROUP BY 1
),
scored AS (
  SELECT pt.user_id, pu.n, pu.n_types, pt.n_t,
         CAST(round(1000.0 * log2(pt.n_t / pu.n), 0) AS BIGINT) AS mb
  FROM pt JOIN pu USING (user_id)
),
agg AS (
  SELECT user_id, MIN(n) AS n_events, MIN(n_types) AS n_types,
         (-SUM(n_t * mb))::BIGINT AS h_millibits
  FROM scored GROUP BY 1
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_types AS BIGINT) AS n_types, h_millibits,
       ROUND(h_millibits / (1000.0 * n_events), 6) AS entropy_bits
FROM agg
"""
