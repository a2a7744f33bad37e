"""Vector math over ``array<float>`` columns as pure Column expressions.

Used by the similarity-search operators (SURVEY §2.8 N4/N5 and the
beyond-reference ANN layer). Higher-order functions (``zip_with`` +
``aggregate``) keep the arithmetic JVM-side — no Python round trip —
and whole-stage codegen fuses the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise product then sum, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity between two ``array<numeric>`` columns."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
