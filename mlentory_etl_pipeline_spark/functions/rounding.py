"""Driver-side rounding that matches the ENGINES, not Python.

Spark's ``F.round`` on DOUBLE and DuckDB's ``ROUND(double, n)`` both
round the value's SHORTEST DECIMAL REPR half-up (measured: both give
``round(2.675, 2) = 2.68`` and ``round(0.0625, 3) = 0.063``), while
Python's builtin ``round`` applies banker's rounding to the exact
binary value (``2.67`` / ``0.062``). Any driver-side close that feeds
a registry output compared against a DuckDB ``ROUND`` must therefore
use this helper, never the builtin — the builtin diverges on every
short-repr value whose digit ``nd+1`` is 5.

(For full-precision quotients the repr runs to 17 significant digits
and ties are measure-zero; the helper makes the convention exact
rather than probabilistic.)
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round_half_up(x: float, nd: int) -> float:
    """Round ``x`` to ``nd`` decimals exactly like Spark F.round /
    DuckDB ROUND on doubles: half-up on the shortest decimal repr."""
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP)
    )


def round_ties_up_col(col, nd: int):
    """ENGINE-IDENTICAL in-plan rounding for scale-robust closes:
    ``FLOOR(x * 10^nd + 0.5) / 10^nd`` — every step is an IEEE double
    op both Spark and DuckDB must compute bit-identically on identical
    inputs, unlike ``F.round``/``ROUND`` whose tie conventions diverge
    (measured at sf0.1: the exact rational 4098260.41325 — a TRUE
    half-tie, because cents/count quotients have small denominators,
    so ties are NOT measure-zero — rounds DOWN under Spark's
    binary-value HALF_UP and UP under DuckDB's multiply-based round).
    Write the oracle side as ``FLOOR(x * 1eN + 0.5) / 1eN`` verbatim.
    Ties round toward +infinity (documented, consistent)."""
    from pyspark.sql import functions as F

    p = float(10**nd)
    return F.floor(col * p + F.lit(0.5)) / F.lit(p)
