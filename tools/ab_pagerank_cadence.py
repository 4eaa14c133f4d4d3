#!/usr/bin/env python
"""A/B the pagerank_full lineage-cut cadence (r09).

r08 switched pagerank_full's localCheckpoint from every round to
every OTHER round, and the driver/judge walls moved 4.4s -> 8.6-9.5s
at sf0.1.  Hypothesis (guide 5, "Caching"/localCheckpoint): with
cadence 2 the un-checkpointed round's subtree - including its O(E)
contribs join - appears twice in the downstream plan (once under the
next round's dangling-mass aggregate, once under its contribs join),
and exchange reuse does not cover every copy, so each un-cut round
can be computed up to twice.

Times kg_pagerank_full to the noop sink, reps per arm interleaved,
plus an exact-equality gate (exceptAll both ways on the rounded rank
rows).

Usage: python tools/ab_pagerank_cadence.py [sf_dir] [reps]
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mcp_memory_libsql_spark.session import get_spark  # noqa: E402


def calib() -> float:
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        h = b"x"
        for _ in range(10**6):
            h = hashlib.md5(h).digest()
        best.append(time.perf_counter() - t0)
    return round(statistics.median(best), 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-pagerank-cadence")
    spark.sparkContext.setLogLevel("ERROR")
    from mcp_memory_libsql_spark.kg import traverse as tv
    from mcp_memory_libsql_spark.registry import QUERIES

    out: dict = {"sf_dir": sf_dir, "calib_sec_pre": calib(), "walls": {}}

    def run(cadence: int) -> float:
        tv.PAGERANK_CKPT_EVERY = cadence
        spark.sparkContext.setJobDescription(
            f"ab-pagerank cadence={cadence}"
        )
        # bench.py methodology: cold SQL cache per timed run, and the
        # query-construction call (which runs the node count + persist
        # materializations) INSIDE the wall
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = QUERIES["kg_pagerank_full"](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(1)  # warm the scan caches once, uncounted
    for cadence in (1, 2):
        out["walls"][cadence] = []
    for _ in range(reps):
        for cadence in (1, 2):
            out["walls"][cadence].append(round(run(cadence), 3))
    for cadence in (1, 2):
        out[f"median_c{cadence}"] = round(
            statistics.median(out["walls"][cadence]), 3
        )

    # equality gate
    tv.PAGERANK_CKPT_EVERY = 1
    a = QUERIES["kg_pagerank_full"](spark, sf_dir)
    tv.PAGERANK_CKPT_EVERY = 2
    b = QUERIES["kg_pagerank_full"](spark, sf_dir)
    out["rows_equal"] = (
        a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    )
    out["calib_sec_post"] = calib()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
