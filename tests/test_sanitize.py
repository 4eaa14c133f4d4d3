"""Sanitization property tests mirroring the reference's
sanitize.test.ts: control chars stripped (keeping \\n and \\t),
3+ newlines collapsed, trimmed, length-capped."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mcp_memory_libsql_spark.sanitize import (
    MAX_ENTITY_NAME_LENGTH,
    sanitize_entity_name,
)


def _sanitize(spark, values: list[str]) -> list[str]:
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [
        r.out
        for r in df.select(
            sanitize_entity_name(F.col("s")).alias("out")
        ).collect()
    ]


def test_strips_control_chars(spark):
    out = _sanitize(spark, ["a\x00b\x07c", "keep\tthis\nnewline"])
    assert out[0] == "abc"
    assert out[1] == "keep\tthis\nnewline"


def test_collapses_newlines(spark):
    out = _sanitize(spark, ["a\n\n\n\nb", "a\n\nb"])
    assert out[0] == "a\n\nb"
    assert out[1] == "a\n\nb"


def test_trims_and_caps(spark):
    out = _sanitize(spark, ["  hi  ", "x" * 500])
    assert out[0] == "hi"
    assert len(out[1]) == MAX_ENTITY_NAME_LENGTH


@settings(max_examples=20, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),
        ),
        max_size=300,
    )
)
def test_properties(spark, s):
    out = _sanitize(spark, [s])[0]
    assert len(out) <= MAX_ENTITY_NAME_LENGTH
    assert out == out.strip()
    assert "\n\n\n" not in out
    # no control chars except \n and \t survive
    for ch in out:
        if ch in ("\n", "\t"):
            continue
        assert not (ord(ch) < 32 or ord(ch) == 127)
