"""Every queries() entry must hash-match its DuckDB oracle — the
local version of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.parity import compare, duckdb_connection

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"


@pytest.mark.parametrize("key", sorted(ORACLES.keys()))
def test_parity(key, spark, sf_dir, con):
    assert key in QUERIES, f"oracle {key} has no Spark query"
    df = QUERIES[key](spark, sf_dir)
    res = compare(df, con, ORACLES[key])
    assert res["ok"], f"{key}: {res}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns


ROWS_ONLY = {
    # approximate / learned / iterative-serve ops, each with pytest
    # recall or invariant coverage instead of a SQL oracle
    "ann_recall_eval",
    "events_approx_percentiles",
    "events_approx_users",
    "text_diversity_approx",
    "text_quality_classifier",
    "text_semantic_search",
    "vec_ivf_ann",
    "vec_ivf_kmeans_ann",
    "vec_ivfpq_ann",
    "vec_pca",
    "vec_pq_ann",
}


def test_rows_only_set_is_exactly_the_documented_one():
    """Every registered query MUST have an oracle unless it is on the
    documented rows-only list — a new operator that forgets its
    oracle fails here instead of silently weakening the gate."""
    assert set(QUERIES) - set(ORACLES) == ROWS_ONLY
