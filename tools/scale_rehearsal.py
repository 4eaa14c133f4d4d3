#!/usr/bin/env python
"""Scale rehearsal: run the headline suite at ~sf1 (10× sf0.1) to
surface skew and memory pressure the sf0.1 numbers hide (VERDICT r02
item 9 — no sf1 testdata ships with the harness), and sweep the five
HEAVIEST ops across multiple scale points to fit per-op growth
exponents (VERDICT r03 item 6: "no op superlinear" is a measured
claim, not an asserted one).

The rehearsal corpus is DERIVED, DISCLOSED, AND PERF-ONLY:
key-shifted copies of the driver-provided sf0.1 tables (fact keys
offset by 10M per copy so FK joins stay consistent and KG entity
names stay distinct; region/nation dims are copied once). It is
written under _rehearsal/ (gitignored) and used for NOTHING except
wall-time measurement — every correctness artifact in this repo runs
exclusively on the driver-generated /root/testdata parquet.

Usage: python tools/scale_rehearsal.py [copies[,copies...]]
  default "3,10,30": full suite at the 10× point (round-over-round
  continuity), the five heaviest ops at every point; growth exponent
  per heavy op = least-squares slope of log(wall) vs log(copies).
Also reports CAP-BITE RATES at each point (what fraction of postings/
buckets the skew caps actually dropped), so a cap that silently eats
recall at scale is visible next to the wall-times it buys.
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


# The growth-sweep subjects (VERDICT r03 item 6): the five most
# expensive plans in bench_extended; each must come out sublinear.
SWEEP = [
    "kg_suggest_weighted",
    "dedup_winnowing",
    "kg_communities",
    "dedup_semantic_keep",
    "mm_neardup",
]


def build(spark, copies: int, dst: str) -> None:
    if os.path.isdir(dst):
        shutil.rmtree(dst)
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
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))


def cap_bites(spark, sf_dir: str) -> dict:
    """Measured drop rates of every skew cap at this corpus size —
    the recall cost the caps trade for the bounded pair explosion.
    Each entry: total buckets/postings, how many exceeded the cap
    (and were dropped), and the dropped fraction."""
    from mcp_memory_libsql_spark.io.tables import load_tables
    from mcp_memory_libsql_spark.kg import similarity as sim
    from mcp_memory_libsql_spark.kg import views as kg_views
    from mcp_memory_libsql_spark.multimodal import media as mm
    from mcp_memory_libsql_spark.vector import lsh

    def rate(widths, cap):
        row = widths.agg(
            F.count("*").alias("n"),
            F.sum((F.col("count") > cap).cast("long")).alias("over"),
        ).first()
        n, over = row["n"], row["over"] or 0
        return {"buckets": n, "cap": cap, "dropped": over,
                "drop_rate": round(over / max(n, 1), 6)}

    t = load_tables(spark, sf_dir)
    g = kg_views.kg(t)
    out = {}
    und = sim.undirected_neighbors(g["relations"])
    out["neighbor_postings"] = rate(
        und.groupBy("nbr").count(), sim.NEIGHBOR_CAP
    )
    # measure at the width the pair miner ACTUALLY uses at this
    # corpus size (corpus-adaptive, floored at the τ=0.4 width)
    n_emb = t["embeddings"].count()
    w = max(lsh.n_bits_for_threshold(0.4), lsh.width_for_corpus(n_emb))
    out["embedding_lsh_buckets"] = {
        "mining_bits": w,
        **rate(
            lsh.bucketize(t["embeddings"], dim=64, n_bits=w)
            .groupBy("table_id", "sig")
            .count(),
            lsh.BUCKET_CAP,
        ),
    }
    sig = mm.media_signatures(mm.encode_media(t["documents"]))
    chunks = sig.select(
        "kind",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("ci"),
                    F.expr(f"(simhash >> {15 * i}) % {1 << 15}").alias("cv"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    )
    out["mm_simhash_buckets"] = rate(
        chunks.groupBy("kind", "c.ci", "c.cv").count(), 256
    )
    return out


def _exponent(points: dict[int, float]) -> float | None:
    """Least-squares slope of log(wall) vs log(copies) — the measured
    growth exponent (1.0 = linear, <1 sublinear)."""
    import math

    pts = [(math.log(c), math.log(t)) for c, t in points.items() if t > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    sxx = sum((x - mx) ** 2 for x, _ in pts)
    sxy = sum((x - mx) * (y - my) for x, y in pts)
    return round(sxy / sxx, 3) if sxx else None


def _run(spark, key: str, dst: str) -> float:
    t0 = time.time()
    try:
        QUERIES[key](spark, dst).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)
    except Exception as exc:  # noqa: BLE001 — record the failure
        print(f"{key} FAILED: {type(exc).__name__}: {exc}"[:300], flush=True)
        return -1.0


def main() -> None:
    points = sorted(
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "3,10,30").split(",")
    )
    anchor = 10 if 10 in points else points[-1]
    spark = get_spark("scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    sweep: dict[str, dict[int, float]] = {k: {} for k in SWEEP}
    bites: dict[int, dict] = {}
    ibuilds: dict[int, float] = {}
    full: dict = {}
    for copies in points:
        dst = os.path.join(REPO, "_rehearsal", f"x{copies}")
        t0 = time.time()
        build(spark, copies, dst)
        build_sec = round(time.time() - t0, 1)
        print(f"built {copies}x sf0.1 at {dst} in {build_sec}s", flush=True)

        # pay the one-time KG snapshot ingest (bucketed write of the
        # scaled graph) outside the per-query timings, and record it
        # separately — in production it is an ingest job, not latency
        t0 = time.time()
        QUERIES["kg_recent_entities"](spark, dst).write.format("noop").mode(
            "overwrite"
        ).save()
        kg_ingest_sec = round(time.time() - t0, 1)
        print(f"kg ingest (one-time, {copies}x): {kg_ingest_sec}s", flush=True)

        # Force-build the shared disk indexes OUTSIDE the sweep
        # timings (same attribution rule as bench.py): the sweep must
        # measure per-query growth, not one-time ingest artifacts.
        from mcp_memory_libsql_spark import registry as reg

        t0 = time.time()
        g, _ = reg._kg(spark, dst)
        reg._nbr_index(spark, dst, g)
        reg._lsh_index(spark, dst)
        index_build_sec = round(time.time() - t0, 1)
        print(f"index builds ({copies}x): {index_build_sec}s", flush=True)

        ibuilds[copies] = index_build_sec
        bites[copies] = cap_bites(spark, dst)
        print(f"cap bites ({copies}x): {json.dumps(bites[copies])}", flush=True)

        keys = HEADLINE + HEAVY if copies == anchor else SWEEP
        timings = {}
        for key in keys:
            timings[key] = _run(spark, key, dst)
            print(f"{key} ({copies}x): {timings[key]}s", flush=True)
        for k in SWEEP:
            if k in timings:
                sweep[k][copies] = timings[k]
        if copies == anchor:
            full = {
                "copies": copies,
                "approx_sf": round(0.1 * copies, 2),
                "build_sec": build_sec,
                "kg_ingest_sec": kg_ingest_sec,
                "index_build_sec": index_build_sec,
                "headline_total_sec": round(
                    sum(v for k, v in timings.items() if k in HEADLINE and v > 0),
                    3,
                ),
                "queries": timings,
            }
        shutil.rmtree(dst, ignore_errors=True)

    out = dict(full)
    out["sweep_points"] = points
    out["growth"] = {
        k: {
            "wall_sec_by_copies": {str(c): t for c, t in v.items()},
            "exponent": _exponent(v),
        }
        for k, v in sweep.items()
    }
    out["cap_bites_by_copies"] = {str(c): b for c, b in bites.items()}
    out["index_build_sec_by_copies"] = {str(c): v for c, v in ibuilds.items()}
    out["note"] = (
        "perf-only corpus: key-shifted copies of the provided sf0.1 "
        "tables; all correctness gates run on /root/testdata. "
        "growth.exponent = log-log slope of wall vs corpus size "
        "(1.0 linear; <1 sublinear)."
    )
    with open(os.path.join(REPO, "SCALE_REHEARSAL.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
