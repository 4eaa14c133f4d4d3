#!/usr/bin/env python
"""VERDICT r08 item 3/6: settle the star twins' 30->100x tail.

The r08 rehearsal measured dedup_substring_star's 30->100x wall
segment at slope 2.25 (winnowing_star 1.68) on provably linear output
(exponents 1.08/1.05) — but the points were retaken across sessions
with a measured ~3x box-factor spread and no per-point calibration,
so the slope was unfalsifiable. This harness retakes the star points
SAME-SESSION with everything the clique investigation had:

  per point:  calib_sec (single-thread CPU reference), wall to the
              noop sink (warm run first), output rows, and the
              UI-REST shuffle write/read byte delta around the timed
              run — the quantity that separates a spill regime (bytes
              superlinear or constant-but-past-page-cache) from plan
              growth (bytes linear, wall linear after calib).
  per star:   an md5-default arm and a SPARK_GRAFT_FAST_HASH=1 arm
              (the 100 TB CPU lever, measured only on the cliques
              until now — VERDICT r08 item 3 explicitly asks for the
              fasthash/narrow-key levers on the star).

Results merge into SCALE_REHEARSAL.json under ``star_tails_r09``.
Perf-only corpus, perf-only flag: correctness artifacts all run on
the driver testdata with the flag off (md5 parity pytests pin it).

Usage: python tools/star_tails.py [points]    (default "30,100")
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

KEYS = ["dedup_substring_star", "dedup_winnowing_star"]


def make_session() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("star-tails")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        )
        .config("spark.ui.enabled", "true")  # REST API = shuffle bytes
        .getOrCreate()
    )


def shuffle_bytes(spark) -> tuple[int, int]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def timed_noop(spark, key, dst) -> dict:
    from mcp_memory_libsql_spark.registry import QUERIES

    def noop():
        QUERIES[key](spark, dst).write.format("noop").mode("overwrite").save()

    spark.sparkContext.setJobDescription(f"star-tails warm {key}")
    noop()  # warm: codegen JIT + page-cache state on this corpus
    w0, r0 = shuffle_bytes(spark)
    spark.sparkContext.setJobDescription(f"star-tails timed {key}")
    t0 = time.time()
    noop()
    wall = round(time.time() - t0, 1)
    w1, r1 = shuffle_bytes(spark)
    spark.sparkContext.setJobDescription(None)
    return {
        "wall_sec": wall,
        "shuffle_write_gb": round((w1 - w0) / 2**30, 3),
        "shuffle_read_gb": round((r1 - r0) / 2**30, 3),
    }


def main() -> None:
    points = sorted(
        (int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "30,100").split(",")),
        reverse=True,  # largest first: keep the judged point if the clock runs out
    )
    import shutil

    from bench import cpu_calib_sec
    from tools.scale_rehearsal import build

    spark = make_session()
    spark.sparkContext.setLogLevel("ERROR")
    from mcp_memory_libsql_spark.registry import QUERIES

    entry: dict = {"points": points, "keys": KEYS, "runs": {}}
    for copies in points:
        dst = os.path.join(REPO, "_rehearsal", f"x{copies}_star")
        t0 = time.time()
        build(spark, copies, dst, tables=["documents"])
        print(f"built {copies}x docs in {round(time.time() - t0, 1)}s", flush=True)
        point: dict = {"calib_sec": cpu_calib_sec()}
        print(f"calib_sec ({copies}x): {point['calib_sec']}", flush=True)
        for key in KEYS:
            point[key] = timed_noop(spark, key, dst)
            point[key]["rows"] = QUERIES[key](spark, dst).count()
            print(f"{key} ({copies}x): {json.dumps(point[key])}", flush=True)
        os.environ["SPARK_GRAFT_FAST_HASH"] = "1"
        try:
            for key in KEYS:
                point[f"{key}_fasthash"] = timed_noop(spark, key, dst)
                print(
                    f"{key}_fasthash ({copies}x): "
                    f"{json.dumps(point[f'{key}_fasthash'])}",
                    flush=True,
                )
        finally:
            os.environ.pop("SPARK_GRAFT_FAST_HASH", None)
        entry["runs"][str(copies)] = point
        shutil.rmtree(dst, ignore_errors=True)
        # checkpoint after every point — don't lose the big one
        _merge(entry)
    spark.stop()


def _merge(entry: dict) -> None:
    path = os.path.join(REPO, "SCALE_REHEARSAL.json")
    with open(path) as f:
        art = json.load(f)
    entry["driver_mem"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    entry["note"] = (
        "VERDICT r08 item 3: same-session star-twin retake, largest "
        "point first, one warm run per (point, key, arm), walls to "
        "the noop sink, shuffle bytes = UI REST delta around the "
        "timed run, calib_sec per point, output rows per key; "
        "fasthash arms per item 3's lever ask."
    )
    art["star_tails_r09"] = entry
    with open(path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print("merged star_tails_r09 into SCALE_REHEARSAL.json", flush=True)


if __name__ == "__main__":
    main()
