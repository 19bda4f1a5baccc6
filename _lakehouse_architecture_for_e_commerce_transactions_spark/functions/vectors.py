"""Vector column expressions over ``array<float|double>`` embeddings.

JVM-side higher-order functions (``zip_with`` + ``aggregate``) — no Python
boundary crossing per row, sums run sequentially in index order so results
are bit-reproducible against a sequential oracle.

For very wide vectors/huge corpora the same signatures can be swapped for an
Arrow-batched pandas_udf (numpy dot) without changing call sites; the
expression form keeps whole-stage codegen and zero serialization overhead,
which wins at the 64-1024-dim scale typical of embedding columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (index order, like any C loop)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a|*|b|) — association fixed so oracles can reproduce it exactly."""
    return dot(a, b) / (norm(a) * norm(b))
