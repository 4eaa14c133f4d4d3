#!/usr/bin/env python
"""Scale rehearsal: run the headline suite at ~sf1 (10× sf0.1) to
surface skew and memory pressure the sf0.1 numbers hide (VERDICT r02
item 9 — no sf1 testdata ships with the harness).

The rehearsal corpus is DERIVED, DISCLOSED, AND PERF-ONLY: ten
key-shifted copies of the driver-provided sf0.1 tables (fact keys
offset by 10M per copy so FK joins stay consistent and KG entity
names stay distinct; region/nation dims are copied once). It is
written under _rehearsal/ (gitignored) and used for NOTHING except
wall-time measurement — every correctness artifact in this repo runs
exclusively on the driver-generated /root/testdata parquet.

Usage: python tools/scale_rehearsal.py [copies]
Writes SCALE_REHEARSAL.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mcp_memory_libsql_spark.io.tables import (  # noqa: E402
    TABLE_NAMES,
    load_table,
)
from mcp_memory_libsql_spark.registry import QUERIES  # noqa: E402
from mcp_memory_libsql_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, "_rehearsal", "sf1")
OFF = 10_000_000

# (table, key columns to shift per copy); dims absent = copied once
SHIFT = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "kg_search_nodes",
    "kg_degree",
    "kg_recent_entities",
    "vec_knn_cosine",
    "vec_knn_batch",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_quality",
    "events_sessionize",
]
# the most expensive extended plans from bench_extended.json — the
# ones whose 10× behavior actually answers "does this survive scale"
HEAVY = [
    "kg_pagerank_full",
    "kg_communities",
    "kg_suggest_weighted",
    "dedup_winnowing",
    "dedup_semantic_keep",
    "text_lm_score",
    "mm_neardup",
]


def build(spark, copies: int) -> None:
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    for name in TABLE_NAMES:  # load_tables() is lazy — enumerate
        df = load_table(spark, SRC, name)
        keys = SHIFT.get(name)
        if keys is None:
            out = df
        else:
            parts = []
            for i in range(copies):
                d = df
                for k in keys:
                    d = d.withColumn(k, F.col(k) + F.lit(i * OFF))
                parts.append(d)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(DST, f"{name}.parquet"))


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    build(spark, copies)
    build_sec = round(time.time() - t0, 1)
    print(f"built {copies}x sf0.1 at {DST} in {build_sec}s", flush=True)

    # pay the one-time KG snapshot ingest (bucketed write of the 10×
    # graph) outside the per-query timings, and record it separately —
    # in production it is an ingest job, not query latency
    t0 = time.time()
    QUERIES["kg_recent_entities"](spark, DST).write.format("noop").mode(
        "overwrite"
    ).save()
    kg_ingest_sec = round(time.time() - t0, 1)
    print(f"kg ingest (one-time): {kg_ingest_sec}s", flush=True)

    timings: dict[str, float] = {}
    for key in HEADLINE + HEAVY:
        t0 = time.time()
        try:
            QUERIES[key](spark, DST).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[key] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — record the failure
            timings[key] = -1.0
            print(f"{key} FAILED: {type(exc).__name__}: {exc}"[:300], flush=True)
        print(f"{key}: {timings[key]}s", flush=True)

    out = {
        "copies": copies,
        "approx_sf": round(0.1 * copies, 2),
        "build_sec": build_sec,
        "kg_ingest_sec": kg_ingest_sec,
        "headline_total_sec": round(
            sum(v for k, v in timings.items() if k in HEADLINE and v > 0), 3
        ),
        "queries": timings,
        "note": (
            "perf-only corpus: ten key-shifted copies of the provided "
            "sf0.1 tables; all correctness gates run on /root/testdata"
        ),
    }
    with open(os.path.join(REPO, "SCALE_REHEARSAL.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
