"""Embedding quantization — the storage/bandwidth half of a vector
pipeline (int8 embeddings are ~4× smaller on the wire and in cache;
at 100 TB the embedding column IS the shuffle cost).

All arithmetic is forced to DOUBLE before any op (float32×int
promotion rules differ between engines; double is IEEE-identical),
and nearest-int rounding is spelled floor(x + 0.5) because
round-half behavior differs between Spark (HALF_UP on decimals) and
DuckDB (half away from zero) — floor is bit-identical in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_X = "CAST(x AS DOUBLE)"


def quantize_stats_int8(embeddings: DataFrame) -> DataFrame:
    """(vec_id, scale, max_err) — symmetric int8 quantization audit:
    per-vector scale = max|x|/127 and the worst dequantization error.
    Two narrow projections (maxabs first, then the error fold over
    it) so the maxabs aggregate isn't re-evaluated per element inside
    the second lambda; zero shuffle, scan-shaped at any SF."""
    with_max = embeddings.select(
        "vec_id",
        "embedding",
        F.expr(
            f"aggregate(embedding, CAST(0 AS DOUBLE),"
            f" (acc, x) -> greatest(acc, abs({_X})))"
        ).alias("maxabs"),
    )
    dequant_err = (
        f"aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> greatest(acc,"
        f" abs(floor({_X} * 127 / maxabs + 0.5) * maxabs / 127 - {_X})))"
    )
    return with_max.select(
        "vec_id",
        F.expr(
            "CAST(ROUND(CASE WHEN maxabs = 0 THEN 0 ELSE maxabs / 127 END, 6)"
            " AS DOUBLE)"
        ).alias("scale"),
        F.expr(
            f"CAST(ROUND(CASE WHEN maxabs = 0 THEN 0 ELSE {dequant_err} END, 6)"
            " AS DOUBLE)"
        ).alias("max_err"),
    )
