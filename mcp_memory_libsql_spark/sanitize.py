"""Input sanitization, re-expressed as JVM-side column expressions.

Mirrors the reference's ``sanitize_input`` (src/db/client.ts:22-31):
strip non-printable control chars (keeping \\n and \\t), collapse 3+
newlines to 2, trim — plus the reference's length caps
(src/db/client.ts:5-9). Implemented with built-in regexp functions so
it stays inside whole-stage codegen (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_ENTITY_NAME_LENGTH = 256
MAX_ENTITY_TYPE_LENGTH = 256
MAX_OBSERVATION_LENGTH = 4096
MAX_OBSERVATIONS_PER_ENTITY = 100
MAX_RELATION_TYPE_LENGTH = 256

# \p{C} minus \n\t : control/format/unassigned chars to strip.
_CONTROL_CHARS = r"[\p{Cc}\p{Cf}\p{Co}\p{Cn}&&[^\n\t]]"
# Unicode-aware trim (Spark's trim() only strips ASCII spaces).
_EDGE_WS = r"^[\s\p{Z}]+|[\s\p{Z}]+$"


def sanitize_col(col: Column, max_length: int) -> Column:
    """Sanitized, length-capped version of a string column."""
    cleaned = F.regexp_replace(col, _CONTROL_CHARS, "")
    collapsed = F.regexp_replace(cleaned, r"\n{3,}", "\n\n")
    trimmed = F.regexp_replace(collapsed, _EDGE_WS, "")
    capped = F.substring(trimmed, 1, max_length)
    # the cap can expose trailing whitespace → trim once more
    return F.regexp_replace(capped, _EDGE_WS, "")


def sanitize_entity_name(col: Column) -> Column:
    return sanitize_col(col, MAX_ENTITY_NAME_LENGTH)


def sanitize_entity_type(col: Column) -> Column:
    return sanitize_col(col, MAX_ENTITY_TYPE_LENGTH)


def sanitize_observation(col: Column) -> Column:
    return sanitize_col(col, MAX_OBSERVATION_LENGTH)


def sanitize_relation_type(col: Column) -> Column:
    return sanitize_col(col, MAX_RELATION_TYPE_LENGTH)
