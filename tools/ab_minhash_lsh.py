#!/usr/bin/env python
"""A/B harness for the dedup_minhash_lsh / doc_shingles restructure (r09).

Times, with the noop sink per the optimization playbook (§1.4), the
candidate plans for the DF-cap + signature + banding pipeline and
verifies each candidate's OUTPUT ROWS are identical to the shipped
implementation before any timing is trusted:

  v0  shipped: Window DF-cap (shuffle+sort the pair stream) →
      md5 per (doc,shingle) → min-agg → string band keys
  v1  postings DF-cap: ONE ObjectHashAggregate on shingle (no sort),
      size(ids)<=cap filter, md5 ONCE per distinct shingle, explode
      postings into the per-doc min-agg
  v2  anti-join DF-cap: count per shingle (partial-agg'd), broadcast
      the tiny heavy list, left_anti — the pair stream never shuffles
      (tokenizes twice)
  band key variants: string concat_ws vs grouping on the numeric
      (band_idx, h_even, h_odd) triple (same groups, narrower key)

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_minhash_lsh.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mcp_memory_libsql_spark.io.tables import load_tables  # noqa: E402
from mcp_memory_libsql_spark.session import get_spark  # noqa: E402
from mcp_memory_libsql_spark.textops import dedup as dd  # noqa: E402
from mcp_memory_libsql_spark.textops.dedup import (  # noqa: E402
    BANDS,
    DF_CAP,
    MINHASH_K,
    _exploded_shingles,
)
from mcp_memory_libsql_spark.textops.tokenize import pair_combos  # noqa: E402


def doc_shingles_postings(documents, n=3):
    sh = _exploded_shingles(documents, n)
    postings = (
        sh.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") <= DF_CAP)
    )
    return postings.select("shingle", F.explode("ids").alias("doc_id"))


def doc_shingles_antijoin(documents, n=3):
    sh = _exploded_shingles(documents, n)
    heavy = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") > DF_CAP)
        .select("shingle")
    )
    return sh.join(F.broadcast(heavy), "shingle", "left_anti")


def minhash_from(shingles_df):
    sh = shingles_df.select(
        "doc_id",
        F.md5(F.col("shingle")).alias("d1"),
        F.md5(F.concat(F.lit("x:"), F.col("shingle"))).alias("d2"),
    )
    aggs = []
    for i in range(MINHASH_K):
        src = F.col("d1") if i < 4 else F.col("d2")
        chunk = F.substring(src, 1 + 8 * (i % 4), 8)
        aggs.append(F.min(F.conv(chunk, 16, 10).cast("bigint")).alias(f"h{i}"))
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_postings_md5_once(documents, n=3):
    """DF-cap + md5 per DISTINCT shingle (not per occurrence)."""
    sh = _exploded_shingles(documents, n)
    postings = (
        sh.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") <= DF_CAP)
    )
    hashed = postings.select(
        "ids",
        F.md5(F.col("shingle")).alias("d1"),
        F.md5(F.concat(F.lit("x:"), F.col("shingle"))).alias("d2"),
    ).select(
        F.explode("ids").alias("doc_id"),
        *[
            F.conv(
                F.substring(F.col("d1") if i < 4 else F.col("d2"), 1 + 8 * (i % 4), 8),
                16,
                10,
            )
            .cast("bigint")
            .alias(f"v{i}")
            for i in range(MINHASH_K)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"v{i}").alias(f"h{i}") for i in range(MINHASH_K)]
    )


def lsh_pairs_from_sig(sig, numeric_keys: bool):
    if numeric_keys:
        banded = sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("b"),
                            F.col(f"h{2 * b}").alias("x"),
                            F.col(f"h{2 * b + 1}").alias("y"),
                        )
                        for b in range(BANDS)
                    ]
                )
            ).alias("bk"),
        )
        grouped = banded.groupBy("bk").agg(
            F.sort_array(F.collect_list("doc_id")).alias("ids")
        )
    else:
        keys = F.array(
            *[
                F.concat_ws(
                    "_",
                    F.lit(str(b)),
                    F.col(f"h{2 * b}").cast("string"),
                    F.col(f"h{2 * b + 1}").cast("string"),
                )
                for b in range(BANDS)
            ]
        )
        banded = sig.select("doc_id", F.explode(keys).alias("band_key"))
        grouped = banded.groupBy("band_key").agg(
            F.sort_array(F.collect_list("doc_id")).alias("ids")
        )
    return (
        grouped.where(F.size("ids") >= 2)
        .select(F.explode(pair_combos("ids", "doc_a", "doc_b")).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def time_noop(df, runs=7):
    df.write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3), [round(s, 3) for s in samples]


def rows_equal(a, b, cols):
    d1 = a.select(*cols).exceptAll(b.select(*cols)).count()
    d2 = b.select(*cols).exceptAll(a.select(*cols)).count()
    return d1 == 0 and d2 == 0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-minhash-lsh")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    docs = t["documents"]

    results = {}

    # --- correctness gates first ---
    base_sh = dd.doc_shingles(docs, 3)
    for name, cand in [
        ("postings", doc_shingles_postings(docs, 3)),
        ("antijoin", doc_shingles_antijoin(docs, 3)),
    ]:
        ok = rows_equal(base_sh, cand, ["doc_id", "shingle"])
        results[f"doc_shingles_{name}_rows_equal"] = ok
        assert ok, f"doc_shingles variant {name} rows differ"

    base_sig = dd.minhash_signatures(docs, 3)
    sig_cols = ["doc_id"] + [f"h{i}" for i in range(MINHASH_K)]
    ok = rows_equal(base_sig, minhash_postings_md5_once(docs, 3), sig_cols)
    results["minhash_md5_once_rows_equal"] = ok
    assert ok

    base_pairs = dd.minhash_lsh_candidates(docs, 3)
    for nk in (False, True):
        cand = lsh_pairs_from_sig(minhash_postings_md5_once(docs, 3), nk)
        ok = rows_equal(base_pairs, cand, ["doc_a", "doc_b"])
        results[f"lsh_pairs_numeric{nk}_rows_equal"] = ok
        assert ok

    # --- timings (noop sink) ---
    sc = spark.sparkContext
    sc.setJobDescription("v0 shipped minhash_lsh")
    results["v0_shipped"] = time_noop(dd.minhash_lsh_candidates(docs, 3))
    sc.setJobDescription("v1 postings+md5once, string keys")
    results["v1_postings_strkeys"] = time_noop(
        lsh_pairs_from_sig(minhash_postings_md5_once(docs, 3), False)
    )
    sc.setJobDescription("v2 postings+md5once, numeric keys")
    results["v2_postings_numkeys"] = time_noop(
        lsh_pairs_from_sig(minhash_postings_md5_once(docs, 3), True)
    )
    sc.setJobDescription("v3 antijoin shingles -> per-pair md5, string keys")
    results["v3_antijoin"] = time_noop(
        lsh_pairs_from_sig(minhash_from(doc_shingles_antijoin(docs, 3)), False)
    )
    sc.setJobDescription("signature only: shipped vs md5-once")
    results["sig_v0"] = time_noop(dd.minhash_signatures(docs, 3))
    results["sig_md5once"] = time_noop(minhash_postings_md5_once(docs, 3))
    sc.setJobDescription(None)

    import json

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
