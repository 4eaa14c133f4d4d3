#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

    python tools/dump_plans.py <tag> <suffix> key1 key2 ...

Writes plans/<tag>/<key>_<suffix>.txt for each key (e.g. tag=r09,
suffix=before). The optimization judge reads these files to check
plan-shape claims (Exchange counts, join strategies, PushedFilters)
without running Spark.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    from mcp_memory_libsql_spark.registry import QUERIES
    from mcp_memory_libsql_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        df = QUERIES[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
