"""Invariant tests for the relational-analytics and pipeline-op
families — semantic properties the DuckDB hash-parity gate can't
express (bounds, group extremum membership, convergence,
determinism)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_memory_libsql_spark.analytics import tpch
from mcp_memory_libsql_spark.io.tables import load_tables
from mcp_memory_libsql_spark.textops import dedup as dd
from mcp_memory_libsql_spark.textops import sampling
from mcp_memory_libsql_spark.vector import quant


def _t(spark, sf_dir):
    return load_tables(spark, sf_dir)


def test_q1_discount_bounds(spark, sf_dir):
    rows = tpch.q1_pricing_summary(_t(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert r.sum_disc_price <= r.sum_base_price
        assert 0.0 <= r.avg_disc <= 0.10


def test_q2_is_per_part_max(spark, sf_dir):
    t = _t(spark, sf_dir)
    rows = tpch.q2_min_cost_supplier(t).collect()
    assert rows
    # one winning balance per part; every reported row carries it
    best = {}
    for r in rows:
        best.setdefault(r.p_partkey, r.s_acctbal)
        assert r.s_acctbal == best[r.p_partkey]


def test_q8_share_is_a_ratio(spark, sf_dir):
    rows = tpch.q8_market_share(_t(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert (r.share_volume or 0.0) <= r.total_volume


def test_q12_counts_partition_the_join(spark, sf_dir):
    t = _t(spark, sf_dir)
    rows = tpch.q12_shipmode_priority(t).collect()
    total = sum(r.high_line_count + r.low_line_count for r in rows)
    expected = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert total == expected


def test_q21_waiting_suppliers_bounds(spark, sf_dir):
    t = _t(spark, sf_dir)
    rows = tpch.q21_waiting_suppliers(t).collect()
    europe = {
        r.s_suppkey
        for r in t["supplier"]
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey")
        .collect()
    }
    names = {
        r.s_name
        for r in t["supplier"].where(F.col("s_suppkey").isin(list(europe))).collect()
    }
    for r in rows:
        assert r.numwait > 0
        assert r.s_name in names


def test_q22_dormant_customers_positive(spark, sf_dir):
    rows = tpch.q22_global_sales_opportunity(_t(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert r.numcust >= 1
        assert r.totacctbal > 0


def test_split_assign_partitions_and_is_deterministic(spark, sf_dir):
    docs = _t(spark, sf_dir)["documents"]
    a = sampling.split_assign(docs)
    counts = dict(a.groupBy("split").count().collect())
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    b = sampling.split_assign(docs)
    assert a.exceptAll(b).count() == 0  # re-run → identical assignment


def test_stratified_sample_respects_thresholds(spark, sf_dir):
    docs = _t(spark, sf_dir)["documents"]
    out = sampling.stratified_sample(docs).collect()
    assert out
    for r in out:
        assert r.bucket < sampling.SAMPLE_RATES[r.lang]


def test_pii_scrub_removes_injected_pii(spark, sf_dir):
    docs = _t(spark, sf_dir)["documents"]
    out = sampling.pii_scrub(sampling.inject_pii(docs)).collect()
    assert out
    for r in out:
        assert "<EMAIL>" in r.scrubbed
        assert "<PHONE>" in r.scrubbed
        assert "<URL>" in r.scrubbed
        assert "@" not in r.scrubbed
        assert "example.com" not in r.scrubbed


def test_quantize_error_bounded_by_half_step(spark, sf_dir):
    emb = _t(spark, sf_dir)["embeddings"]
    rows = quant.quantize_stats_int8(emb).collect()
    assert rows
    for r in rows:
        # nearest-int quantization error can't exceed half a step
        # (rounding slack from the ROUND(…, 6) rendering)
        assert r.max_err <= r.scale / 2 + 1e-6


def test_dedup_clusters_converged(spark, sf_dir):
    docs = _t(spark, sf_dir)["documents"]
    members = {
        r.doc_id: r.cluster_id for r in dd.dedup_clusters(docs).collect()
    }
    pairs = dd.minhash_lsh_candidates(docs).collect()
    assert pairs
    for p in pairs:
        # min-label propagation converged: both endpoints of every
        # candidate edge share a cluster, and labels are min-ids
        assert members[p.doc_a] == members[p.doc_b]
        assert members[p.doc_a] <= p.doc_a


def test_approx_users_error_bounded(spark, sf_dir):
    from mcp_memory_libsql_spark.analytics import windows

    rows = windows.approx_user_counts(_t(spark, sf_dir), rsd=0.02).collect()
    assert rows
    for r in rows:
        assert abs(r.n_users_approx - r.n_users_exact) <= max(
            0.06 * r.n_users_exact, 2
        )


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    from mcp_memory_libsql_spark.analytics import windows

    t = _t(spark, sf_dir)
    exact = {r.event_type: r for r in windows.value_percentiles(t).collect()}
    approx = {
        r.event_type: r for r in windows.approx_value_percentiles(t).collect()
    }
    assert exact.keys() == approx.keys()
    for et, e in exact.items():
        a = approx[et]
        # KLL-style digest at accuracy=10000 on ≤100k-row groups:
        # rank error ≤ 1/accuracy → value error within a few units
        assert abs(a.p50_approx - e.p50) <= max(0.05 * e.p50, 2.0)
        assert abs(a.p90_approx - e.p90) <= max(0.05 * e.p90, 2.0)


def test_asof_picks_latest_click_at_or_before(spark, sf_dir):
    from mcp_memory_libsql_spark.analytics import temporal

    ev = _t(spark, sf_dir)["events"]
    out = temporal.asof_attribution(ev).collect()
    assert out
    clicks = {
        (r.user_id, r.event_id): r.t
        for r in ev.where(F.col("event_type") == "click")
        .select("user_id", "event_id", F.unix_micros("ts").alias("t"))
        .collect()
    }
    for r in out:
        assert r.us_since_click >= 0
        t_click = clicks[(r.user_id, r.click_id)]
        # no other click strictly between the chosen one and the purchase
        later = [
            t for (u, _), t in clicks.items()
            if u == r.user_id and t_click < t <= t_click + r.us_since_click
        ]
        assert not later


def test_range_join_window_and_no_duplicates(spark, sf_dir):
    from mcp_memory_libsql_spark.analytics import temporal

    ev = _t(spark, sf_dir)["events"]
    out = temporal.range_attribution(ev, window_secs=21600)
    rows = out.collect()
    assert rows
    assert all(0 <= r.us_between <= 21600 * 1_000_000 for r in rows)
    # bucket replication must not double-count any (purchase, click) pair
    assert out.count() == out.select("purchase_id", "click_id").distinct().count()


def test_hypertable_levels_are_consistent(spark, sf_dir):
    from mcp_memory_libsql_spark.analytics import temporal

    ev = _t(spark, sf_dir)["events"]
    out = temporal.hypertable_rollup(ev)
    by_gran = {
        r.granularity: (r.n, round(r.s, 2))
        for r in out.groupBy("granularity")
        .agg(F.sum("n_events").alias("n"), F.sum("sum_value").alias("s"))
        .collect()
    }
    assert by_gran["minute"] == by_gran["hour"] == by_gran["day"]
    assert by_gran["minute"][0] == ev.count()


def test_cms_never_undercounts_and_merges(spark, sf_dir):
    from mcp_memory_libsql_spark.analytics import sketches

    ev = _t(spark, sf_dir)["events"]
    top = sketches.heavy_hitters(ev, k=50).collect()
    assert top
    assert all(r.est_count >= r.exact_count for r in top)
    # mergeable: summing the two half-sketches == whole-table sketch
    keyed = ev.select(F.col("user_id").cast("string").alias("key"))
    h1 = keyed.where(F.col("key").cast("bigint") % 2 == 0)
    h2 = keyed.where(F.col("key").cast("bigint") % 2 == 1)
    merged = (
        sketches.cms_counters(h1)
        .unionByName(sketches.cms_counters(h2))
        .groupBy("seed", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    whole = sketches.cms_counters(keyed)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_user_features_consistency(spark, sf_dir):
    from mcp_memory_libsql_spark.analytics import events as ev_ops
    from mcp_memory_libsql_spark.io.tables import load_tables

    t = load_tables(spark, sf_dir)
    rows = ev_ops.user_features(t).collect()
    total = t["events"].count()
    assert sum(r.n_events for r in rows) == total
    for r in rows:
        assert (
            r.n_click + r.n_view + r.n_purchase + r.n_signup + r.n_error
            == r.n_events
        )
        assert 1 <= r.n_active_days <= r.n_events
        assert r.first_day <= r.last_day


def test_nation_hhi_bounds(spark, sf_dir):
    from mcp_memory_libsql_spark.analytics import tpch
    from mcp_memory_libsql_spark.io.tables import load_tables

    rows = tpch.nation_supplier_hhi(load_tables(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        # HHI of n equal shares is 1/n; bounds: 1/n <= hhi <= 1
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-6
        assert 1.0 <= r.equiv_suppliers <= r.n_suppliers + 1e-6


def test_data_quality_checks_empty_tables_pass_cleanly(spark, sf_dir):
    """Empty tables report 0 violations and passed=True — never NULL
    (which would slip through a ~passed filter)."""
    from mcp_memory_libsql_spark.io.stats import data_quality_checks

    t = load_tables(spark, sf_dir)
    empty = {
        "lineitem": t["lineitem"].where(F.lit(False)),
        "orders": t["orders"].where(F.lit(False)),
    }
    rows = data_quality_checks(empty).collect()
    assert len(rows) == 7
    for r in rows:
        assert r.n_violations == 0 and r.passed is True


def test_bot_score_flags_timer_traffic(spark, sf_dir):
    from mcp_memory_libsql_spark.analytics.windows import bot_scores
    from mcp_memory_libsql_spark.io.tables import load_tables

    # real corpus: sane ranges, sizes consistent
    rows = bot_scores(load_tables(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert r.n_gaps >= 2
        if r.cv is not None:
            assert r.cv >= 0.0
            assert r.is_regular == (r.cv <= 0.1)
    # synthetic: a metronome user is regular, a bursty user is not
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    evs = [(i, 900001, "c", float(i), base + dt.timedelta(seconds=60 * i)) for i in range(10)]
    evs += [(100 + i, 900002, "c", 0.0, base + dt.timedelta(seconds=s))
            for i, s in enumerate([0, 5, 6, 300, 301, 2000, 2004, 9000, 9001, 9002])]
    df = spark.createDataFrame(
        evs, "event_id long, user_id long, event_type string, value double, ts timestamp"
    )
    out = {r.user_id: r for r in bot_scores({"events": df}).collect()}
    assert out[900001].is_regular and out[900001].cv == 0.0
    assert not out[900002].is_regular


def test_type_entropy_bounds(spark, sf_dir):
    import math

    from mcp_memory_libsql_spark.analytics.events import user_type_entropy
    from mcp_memory_libsql_spark.io.tables import load_tables

    rows = user_type_entropy(load_tables(spark, sf_dir)["events"]).collect()
    assert rows
    for r in rows:
        # 0 <= H <= log2(n_types); millibit quantization error < 1e-3·n
        assert -1e-3 <= r.entropy_bits <= math.log2(r.n_types) + 1e-3
    # single-type user has exactly zero entropy
    import datetime as dt

    df = spark.createDataFrame(
        [(i, 900009, "only", 0.0, dt.datetime(2024, 1, 1, 0, 0, i)) for i in range(5)],
        "event_id long, user_id long, event_type string, value double, ts timestamp",
    )
    one = user_type_entropy(df).collect()[0]
    assert one.entropy_bits == 0.0 and one.n_types == 1


def test_user_hll_registers_estimate_and_merge(spark, sf_dir):
    """The oracle-exact HLL register table must (a) merge across days
    by per-bucket max into exactly the registers of the combined
    corpus, and (b) yield a distinct-user estimate within the
    standard ~1.04/sqrt(m) HLL band (3 sigma at m=256 ≈ 20%) of the
    exact count, using the plain Flajolet harmonic estimator with
    small-range correction."""
    import math

    from mcp_memory_libsql_spark.analytics import events as ev_ops
    from mcp_memory_libsql_spark.textops.tokenize import md5_hash60

    t = load_tables(spark, sf_dir)
    regs = ev_ops.user_hll_registers(t["events"]).collect()

    # (a) mergeability: max over days per bucket == registers built
    # from the day-blind distinct-user hash set
    merged: dict[int, int] = {}
    for r in regs:
        merged[r.bucket] = max(merged.get(r.bucket, 0), r.max_rho)
    direct = {
        (r.bucket, r.max_rho)
        for r in t["events"]
        .select(md5_hash60(F.col("user_id").cast("string")).alias("h"))
        .select(
            F.expr("CAST(h % 256 AS INT)").alias("bucket"),
            F.expr(
                "CAST(CASE WHEN h div 256 > 0 "
                "THEN 53 - length(bin(h div 256)) ELSE 53 END AS INT)"
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
        .collect()
    }
    assert set(merged.items()) == direct

    # (b) estimate accuracy on the merged sketch
    m = 256
    denom = sum(2.0 ** -rho for rho in merged.values()) + (m - len(merged))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / denom
    zeros = m - len(merged)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    exact = t["events"].select("user_id").distinct().count()
    assert abs(est - exact) / exact < 3 * 1.04 / math.sqrt(m)
