"""VERDICT r07 item 6: re-run the 30× BIGINT-window-key A/B at the
300×-equivalent SPILL regime, with shuffle bytes recorded, plus a
shuffle-codec (lz4 vs zstd) A/B on the same subject.

Subject: dedup_substring (the clique pair miner) over the PERTURBED
documents corpus at 300× sf0.1 — the regime the r07 rehearsal
attributed to single-disk shuffle bandwidth (~30 GB through one
spindle once the ~10 GB 100× point stops fitting page cache). The
r07 30× A/B reverted BIGINT keys because the conv fold cost more
than the narrower shuffle saved *in page cache*; here the bind is
bytes, so the 8-byte key vs ~36-byte hex string is re-measured where
it could actually matter.

Variants (each in a FRESH session — spark.io.compression.codec is a
SparkContext setting):
  md5hex/lz4 (the shipped default), bigint60/lz4,
  md5hex/zstd, bigint60/zstd

Protocol (memory: rehearsal-timing-discipline): no concurrent Spark;
one warm run per fresh session (codegen JIT + page-cache state on
the 300× data itself), then the timed run; shuffle write/read bytes
from the UI REST API as a before/after delta around the timed run.
Results merge into SCALE_REHEARSAL.json under substring_key_ab_300x.

Usage:  python tools/ab_substring_keys.py [copies]   (default 300)
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


def make_session(codec: str) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ab-substr-{codec}")
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
        .config("spark.io.compression.codec", codec)
        .getOrCreate()
    )


def shuffle_bytes(spark) -> tuple[int, int]:
    """(write_bytes, read_bytes) summed over all completed stages —
    callers take before/after deltas around the timed run."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def run_variant(codec: str, key_mode: str, pert_dir: str) -> dict:
    # Set the key mode EXPLICITLY for both arms: the default flipped to
    # bigint60 in r08, so a pop-only md5hex arm would silently measure
    # bigint60 in both arms (ADVICE r08). Restored in the finally.
    prev_key = os.environ.get("SPARK_GRAFT_SUBSTR_KEY")
    os.environ["SPARK_GRAFT_SUBSTR_KEY"] = key_mode
    spark = make_session(codec)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        from mcp_memory_libsql_spark.textops import dedup as dd

        docs = spark.read.parquet(os.path.join(pert_dir, "documents.parquet"))

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        # warm: JIT + scan cache state, not recorded
        noop(dd.substring_dup_pairs(docs))
        w0, r0 = shuffle_bytes(spark)
        t0 = time.time()
        noop(dd.substring_dup_pairs(docs))
        wall = round(time.time() - t0, 1)
        w1, r1 = shuffle_bytes(spark)
        out = {
            "codec": codec,
            "key": key_mode,
            "wall_sec": wall,
            "shuffle_write_gb": round((w1 - w0) / 2**30, 2),
            "shuffle_read_gb": round((r1 - r0) / 2**30, 2),
        }
        print(json.dumps(out), flush=True)
        return out
    finally:
        spark.stop()
        if prev_key is None:
            os.environ.pop("SPARK_GRAFT_SUBSTR_KEY", None)
        else:
            os.environ["SPARK_GRAFT_SUBSTR_KEY"] = prev_key


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    pert = os.path.join(REPO, "_rehearsal", f"x{copies}_pert_ab")
    if not os.path.isdir(pert):
        from tools.scale_rehearsal import build_perturbed_docs

        spark = make_session("lz4")
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        build_perturbed_docs(spark, copies, pert)
        print(f"built {copies}x perturbed docs in "
              f"{round(time.time() - t0, 1)}s", flush=True)
        spark.stop()

    variants = [
        ("lz4", "md5hex"),
        ("lz4", "bigint60"),
        ("zstd", "md5hex"),
        ("zstd", "bigint60"),
        # reverse order re-runs guard against drift (page cache, GC)
        ("zstd", "bigint60"),
        ("zstd", "md5hex"),
        ("lz4", "bigint60"),
        ("lz4", "md5hex"),
    ]
    results = [run_variant(c, k, pert) for c, k in variants]

    path = os.path.join(REPO, "SCALE_REHEARSAL.json")
    with open(path) as f:
        art = json.load(f)
    art["substring_key_ab_300x"] = {
        "copies": copies,
        "runs": results,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        "note": (
            "VERDICT r07 item 6: BIGINT-vs-hex window key and lz4-vs-"
            "zstd shuffle codec A/B for dedup_substring at the "
            "300x-equivalent perturbed spill point, fresh session per "
            "variant, one warm run each, shuffle bytes = REST-API "
            "delta around the timed run; both orders run to bound "
            "cache/GC drift."
        ),
    }
    with open(path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print("merged into SCALE_REHEARSAL.json")


if __name__ == "__main__":
    main()
