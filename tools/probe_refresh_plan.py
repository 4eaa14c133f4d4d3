#!/usr/bin/env python
"""A/B probe for index_refresh_plan (r09): bench-methodology walls
(one untimed warm-up, then N timed noop-sink reps) plus the 5 output
rows so the arms can be value-diffed.

    python tools/probe_refresh_plan.py <label> [reps]

Writes walls + rows to /tmp/refresh_plan_<label>.json.
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
    label = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    calib_pre = cpu_calib_sec()
    spark = get_spark(f"probe-refresh-plan-{label}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setJobDescription(f"index_refresh_plan warmup [{label}]")
    QUERIES["index_refresh_plan"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    walls = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(
            f"index_refresh_plan rep{i} [{label}]"
        )
        t0 = time.perf_counter()
        QUERIES["index_refresh_plan"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        walls.append(round(time.perf_counter() - t0, 3))
    rows = sorted(
        [r.asDict() for r in QUERIES["index_refresh_plan"](spark, sf_dir).collect()],
        key=lambda r: r["artifact"],
    )
    out = {
        "label": label,
        "walls": walls,
        "calib_pre": calib_pre,
        "calib_post": cpu_calib_sec(),
        "rows": rows,
    }
    path = f"/tmp/refresh_plan_{label}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps({"label": label, "walls": walls,
                      "calib": [out["calib_pre"], out["calib_post"]]}))
    spark.stop()


if __name__ == "__main__":
    main()
