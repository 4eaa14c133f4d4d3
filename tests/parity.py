"""Local replica of the driver's correctness gate: run a Spark query
and its DuckDB oracle over the same parquet, compare row count,
sorted-column schema, and an order-insensitive value hash."""

from __future__ import annotations

import math

import duckdb


def duckdb_connection(sf_dir: str):
    con = duckdb.connect()
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def _row_set(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append("\x1f".join(_norm_value(row[i]) for i in order))
    return sorted(out)


def compare(spark_df, con, sql: str) -> dict:
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    rel = con.sql(sql)
    duck_rows = rel.fetchall()
    duck_cols = [d[0] for d in rel.description]

    result = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
    }
    result["count_match"] = result["spark_rows"] == result["duck_rows"]
    result["schema_match"] = result["spark_cols"] == result["duck_cols"]
    if result["count_match"] and result["schema_match"]:
        s = _row_set([tuple(r) for r in spark_rows], spark_cols)
        d = _row_set(duck_rows, duck_cols)
        result["value_match"] = s == d
        if not result["value_match"]:
            mism = [
                (a, b) for a, b in zip(s, d) if a != b
            ][:5]
            result["first_mismatches"] = mism
    else:
        result["value_match"] = False
    result["ok"] = (
        result["count_match"] and result["schema_match"] and result["value_match"]
    )
    return result
