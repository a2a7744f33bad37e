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


# --------------------------------------------------------------- SQL twins
#
# Each builder below emits the SQL TEXT of its Column twin above —
# same zip_with/aggregate fold, same double (or long) accumulator,
# same cast and rounding nodes — for the hot constructors where the
# Column composition costs dozens of Py4J round-trips per call (the
# sign-RP/minhash precedent; bit-identity pinned by
# test_operators.test_vector_sql_twins_bit_identical). Arguments are
# SQL fragments (a column name or a nested expression), interpolated
# verbatim.

def dot_product_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )


def l2_norm_sql(a: str) -> str:
    return (
        f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + CAST(v AS DOUBLE) * "
        f"CAST(v AS DOUBLE)))"
    )


def cosine_similarity_sql(a: str, b: str) -> str:
    return f"({dot_product_sql(a, b)} / ({l2_norm_sql(a)} * {l2_norm_sql(b)}))"


def abs_max_sql(a: str) -> str:
    return f"aggregate({a}, 0.0D, (acc, v) -> greatest(acc, abs(CAST(v AS DOUBLE))))"


def quantize_int8_sql(a: str, scale: str) -> str:
    return f"transform({a}, v -> CAST(round(CAST(v AS DOUBLE) / {scale}) AS INT))"


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
