"""Vector similarity as JVM-side column expressions.

Parity target: the reference's dropped-but-historical vector search
(CHANGELOG 0.0.16 "drop vector search"; earlier versions stored
F32_BLOB embeddings and served cosine top-k). Here embeddings are a
native ``array<float>`` column and similarity is computed with
``zip_with`` + ``aggregate`` — no Python in the loop, fully
codegen-able, scan-parallel at any SF.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    prods = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an error) for zero-norm inputs: a TF-IDF query whose
    every term is corpus-ubiquitous embeds to the zero vector, and
    under ANSI mode (the default in vanilla Spark 4 sessions) a plain
    division would throw DIVIDE_BY_ZERO mid-scan; every serve path
    here already filters ``isNotNull`` scores."""
    denom = norm2(a) * norm2(b)
    return F.when(denom != 0.0, dot(a, b) / denom)
