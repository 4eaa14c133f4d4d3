#!/usr/bin/env python
"""Generic single-key A/B probe: bench-methodology walls (one untimed
warm-up, then N timed noop-sink reps, clearCache between reps) plus
the collected rows for value-diffing arms.

    python tools/probe_key.py <key> <label> [reps]

Writes walls + sorted rows to /tmp/probe_<key>_<label>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import cpu_calib_sec  # noqa: E402
from mcp_memory_libsql_spark.registry import QUERIES  # noqa: E402
from mcp_memory_libsql_spark.session import get_spark  # noqa: E402


def main() -> None:
    key, label = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    calib_pre = cpu_calib_sec()
    spark = get_spark(f"probe-{key}-{label}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setJobDescription(f"{key} warmup [{label}]")
    QUERIES[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    walls = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{key} rep{i} [{label}]")
        t0 = time.perf_counter()
        QUERIES[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    rows = sorted(
        [
            tuple(str(v) for v in r)
            for r in QUERIES[key](spark, sf_dir).collect()
        ]
    )
    out = {
        "key": key,
        "label": label,
        "walls": walls,
        "calib_pre": calib_pre,
        "calib_post": cpu_calib_sec(),
        "rows": rows,
    }
    with open(f"/tmp/probe_{key}_{label}.json", "w") as f:
        json.dump(out, f, default=str)
    print(json.dumps({"key": key, "label": label, "walls": walls,
                      "n_rows": len(rows),
                      "calib": [out["calib_pre"], out["calib_post"]]}))
    spark.stop()


if __name__ == "__main__":
    main()
