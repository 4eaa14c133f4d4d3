"""Property-based invariants (hypothesis) for core operator algebra —
generative inputs catch boundary shapes example tests never pick
(equal timestamps, single-event users, all-duplicate corpora)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from mcp_memory_libsql_spark.analytics import events as ev_ops
from mcp_memory_libsql_spark.textops import dedup as dd

GAP_S = 30 * 60

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # user_id
        st.integers(min_value=0, max_value=10**5),  # epoch seconds
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(events_strategy)
def test_sessionize_partitions_events_and_respects_gap(spark, evs):
    rows = [
        (u, i, f"1970-01-0{1 + ts // 86400} "
               f"{ts % 86400 // 3600:02d}:{ts % 3600 // 60:02d}:{ts % 60:02d}",
         1.0)
        for i, (u, ts) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts_s string, value double"
    ).select(
        "user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "value",
    )
    sessions = ev_ops.sessionize({"events": df}).collect()
    # invariant 1: sessions partition the events exactly
    assert sum(s.n_events for s in sessions) == len(rows)
    # invariant 2: per user, sessions are disjoint and separated by
    # MORE than the gap; inside a session, bounds are consistent
    by_user: dict[int, list] = {}
    for s in sessions:
        assert s.start_epoch <= s.end_epoch
        by_user.setdefault(s.user_id, []).append(s)
    for sess_list in by_user.values():
        sess_list.sort(key=lambda s: s.start_epoch)
        for a, b in zip(sess_list, sess_list[1:]):
            assert b.start_epoch - a.end_epoch > GAP_S


docs_strategy = st.lists(
    st.text(
        alphabet="ab c",
        min_size=0,
        max_size=30,
    ),
    min_size=1,
    max_size=15,
)


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_exact_dedup_partitions_corpus(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    groups = dd.exact_groups(df).collect()
    # groups partition the corpus; keepers are group minima
    assert sum(g.n_copies for g in groups) == len(texts)
    keep_ids = {g.keep_id for g in groups}
    assert keep_ids <= set(range(len(texts)))
    # determinism: same input → same groups
    again = dd.exact_groups(df).collect()
    assert {(g.h, g.n_copies, g.keep_id) for g in groups} == {
        (g.h, g.n_copies, g.keep_id) for g in again
    }


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_minhash_estimate_bounded_and_symmetric(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    est = dd.minhash_jaccard_estimates(df).collect()
    for r in est:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert r.doc_a < r.doc_b
