#!/usr/bin/env python
"""Emit PARITY_r{N}.json: the local oracle-parity gate over EVERY
oracle-backed queries() key, in the driver's CORRECTNESS row shape.

The driver gates a fixed 50-key sample per round; this artifact gives
the other ~180 oracle-backed keys an auditable correctness record the
judge can diff against CORRECTNESS_r{N}.json (VERDICT r02, item 2).

Usage:
    python tools/emit_parity.py [round_number] [sf_dir]

Defaults: round inferred from existing PARITY_r*.json + 1 (min 3),
sf_dir = $SPARK_GRAFT_TEST_SF_DIR or /root/testdata/sf0.01 — the same
scale the driver gates at.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from mcp_memory_libsql_spark.session import get_spark  # noqa: E402
from tests.parity import compare, duckdb_connection  # noqa: E402


def infer_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "PARITY_r*.json"))
        if (m := re.search(r"PARITY_r(\d+)\.json$", p))
    ]
    return max(rounds, default=2) + 1


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else infer_round()
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    spark = get_spark("parity")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(sf_dir)

    rows: dict[str, dict] = {}
    t_start = time.time()
    for i, key in enumerate(sorted(oracles)):
        try:
            df = queries[key](spark, sf_dir)
            res = compare(df, con, oracles[key])
            rows[key] = {
                "rows_match": res["count_match"],
                "schema_match": res["schema_match"],
                "hash_match": res["value_match"],
                "spark_rows": res["spark_rows"],
                "oracle_rows": res["duck_rows"],
                "err": None,
            }
        except Exception as exc:  # noqa: BLE001 — record, keep going
            rows[key] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": -1,
                "oracle_rows": -1,
                "err": f"{type(exc).__name__}: {exc}"[:500],
            }
        flag = "" if rows[key]["hash_match"] else "  <-- FAIL"
        print(f"[{i + 1}/{len(oracles)}] {key}{flag}", flush=True)

    # rows-only keys: record row counts so the artifact covers the full
    # registry, with the weaker check clearly labeled.
    for key in sorted(set(queries) - set(oracles)):
        try:
            n = queries[key](spark, sf_dir).count()
            rows[key] = {
                "rows_only": True,
                "spark_rows": n,
                "err": None,
            }
        except Exception as exc:  # noqa: BLE001
            rows[key] = {
                "rows_only": True,
                "spark_rows": -1,
                "err": f"{type(exc).__name__}: {exc}"[:500],
            }
        print(f"[rows-only] {key} rows={rows[key]['spark_rows']}", flush=True)

    ok = sum(1 for r in rows.values() if r.get("hash_match"))
    artifact = {
        "round": rnd,
        "sf_dir": sf_dir,
        "oracle_backed": len(oracles),
        "hash_matched": ok,
        "rows_only": len(queries) - len(oracles),
        "elapsed_sec": round(time.time() - t_start, 1),
        "results": rows,
    }
    out_path = os.path.join(REPO, f"PARITY_r{rnd:02d}.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"{ok}/{len(oracles)} hash-matched -> {out_path}")
    spark.stop()
    if ok != len(oracles):
        sys.exit(1)


if __name__ == "__main__":
    main()
