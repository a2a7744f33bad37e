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


def abs_max(a: Column) -> Column:
    """max(|v_i|) accumulated in double."""
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v.cast("double")))
    )


def quantize_int8(a: Column, scale: Column) -> Column:
    """Symmetric per-vector int8 quantization against a PRE-PROJECTED
    scale column (``abs_max(v)/127``): ``q_i = round(v_i / scale)``.

    The scale must be projected as its own column first — referencing
    ``abs_max`` inside this lambda would re-reduce the vector once per
    element (the HOF-CSE trap measured in dedup.py). Rounding is
    half-away-from-zero in both Spark (HALF_UP) and DuckDB, so the int
    codes are engine-exact. 4× memory vs float32 — the standard ANN
    corpus-compression step; dot products on int8 codes rescale by
    ``scale_a * scale_b``."""
    return F.transform(a, lambda v: F.round(v.cast("double") / scale).cast("int"))
