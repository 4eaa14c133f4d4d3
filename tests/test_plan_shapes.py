"""Physical-plan shape assertions for headline operators: the scale
claims in the docstrings (broadcast, shuffle counts, no Python in hot
paths) asserted against the actual executed plan, so a regression
that silently degrades a plan fails CI.

Counting ``Exchange`` occurrences in the executedPlan string counts
shuffle BOUNDARIES (each appears once; reused exchanges still matter
once); ``BroadcastExchange``/``BroadcastHashJoin`` mark the
broadcast paths.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mcp_memory_libsql_spark.io.tables import load_tables
from mcp_memory_libsql_spark.registry import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan: str) -> int:
    # shuffle exchanges only — broadcast exchanges are the GOOD kind
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def test_text_quality_is_shuffle_free(spark, sf_dir):
    plan = _plan(QUERIES["text_quality"](spark, sf_dir))
    assert _shuffles(plan) == 0, plan


def test_text_char_classes_is_shuffle_free(spark, sf_dir):
    plan = _plan(QUERIES["text_char_classes"](spark, sf_dir))
    assert _shuffles(plan) == 0, plan


def test_vec_knn_cosine_broadcasts_query_no_shuffle(spark, sf_dir):
    """Top-k over a broadcast query vector: TakeOrdered, not a sort
    shuffle; zero shuffle exchanges in the whole plan."""
    plan = _plan(QUERIES["vec_knn_cosine"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert _shuffles(plan) == 0, plan


def test_tpch_q3_dims_broadcast(spark, sf_dir):
    plan = _plan(QUERIES["tpch_q3"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_events_daily_single_shuffle(spark, sf_dir):
    plan = _plan(QUERIES["events_daily"](spark, sf_dir))
    assert _shuffles(plan) == 1, plan


def test_dedup_exact_single_shuffle(spark, sf_dir):
    plan = _plan(QUERIES["dedup_exact"](spark, sf_dir))
    assert _shuffles(plan) == 1, plan


def test_kg_search_entities_broadcasts_not_sorts(spark, sf_dir):
    """The reference's headline read: relevance scan + top-50. Must
    use TakeOrdered (bounded k), never a global sort shuffle."""
    plan = _plan(QUERIES["kg_search_entities"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_no_python_udfs_in_oracle_gated_plans(spark, sf_dir):
    """Hot-path contract: no row-at-a-time Python evaluation in any
    oracle-gated operator (pandas/Arrow stages are allowed only in
    the multimodal mm_* family, which is mapInPandas by design)."""
    offenders = []
    for key, fn in QUERIES.items():
        if key.startswith("mm_"):
            continue
        try:
            plan = _plan(fn(spark, sf_dir))
        except Exception:  # rows-only iterative ops may need actions
            continue
        if "BatchEvalPython" in plan:
            offenders.append((key, "BatchEvalPython"))
    assert not offenders, offenders


def test_hamming_knn_is_integer_only_scan(spark, sf_dir):
    """Binary-quantization promise: the scored scan contains no
    float ops — codes are bigint, distance is bit_count(xor)."""
    t = load_tables(spark, sf_dir)
    from mcp_memory_libsql_spark.vector import binary

    corpus = t["embeddings"].select(
        "vec_id", binary.sign_code(F.col("embedding")).alias("code")
    )
    plan = _plan(corpus)
    assert _shuffles(plan) == 0


def test_hard_negatives_broadcasts_anchors(spark, sf_dir):
    """Anchor set broadcasts; the corpus shuffles only on the tiny
    q_id key for the per-anchor rank window."""
    plan = _plan(QUERIES["vec_hard_negatives"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert _shuffles(plan) <= 1, plan


def test_sample_est_no_python_and_bounded_shuffles(spark, sf_dir):
    """The AQP sample estimate stays JVM-side (md5 bucket is a codegen
    expression, not a UDF) and aggregates on one tiny key."""
    plan = _plan(QUERIES["events_sample_est"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert _shuffles(plan) <= 3, plan


def test_winnowing_selection_is_shuffle_free(spark, sf_dir):
    """The whole fingerprint SELECTION (dense hash + window-min) is
    in-row; the only shuffles are the postings groupBy and the pair
    rollup."""
    from mcp_memory_libsql_spark.io.tables import load_tables
    from mcp_memory_libsql_spark.textops import dedup as dd

    docs = load_tables(spark, sf_dir)["documents"]
    plan = _plan(dd.winnowing_fingerprints(docs))
    assert _shuffles(plan) == 0, plan
    pair_plan = _plan(QUERIES["dedup_winnowing"](spark, sf_dir))
    assert _shuffles(pair_plan) <= 2, pair_plan


def test_bloom_probe_broadcasts_filter(spark, sf_dir):
    """The incoming batch joins the ~69-row bit-word table by
    broadcast — probing never shuffles against the corpus side."""
    plan = _plan(QUERIES["dedup_bloom"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_ewma_no_global_window(spark, sf_dir):
    """Per-type series folds happen in-row after the rollup — no
    single-partition window over the raw events."""
    plan = _plan(QUERIES["events_ewma"](spark, sf_dir))
    assert "Exchange SinglePartition" not in plan, plan


def test_bucket_profile_bounded_shuffles(spark, sf_dir):
    plan = _plan(QUERIES["vec_lsh_bucket_profile"](spark, sf_dir))
    assert _shuffles(plan) <= 2, plan
    assert "Python" not in plan, plan
