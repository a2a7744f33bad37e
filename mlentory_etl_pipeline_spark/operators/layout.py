"""Data-layout operators: Z-order (Morton) multi-dimensional
clustering for scan pruning.

Beyond-reference layer (build brief): the reference stores its graph
in Postgres/Virtuoso where the planner indexes b-tree-style
(``code/load/mlentory_load/core/`` sinks); a lake engine gets its
"index" from FILE-LEVEL min/max statistics instead, and those only
prune on columns the data is physically clustered by. Linear sort
clusters ONE column; interleaving the bits of several bucketized
columns (the classic Z-order / Morton curve, public technique used by
every lakehouse table format) clusters ALL of them at once: a query
box on any participating column maps to a bounded set of curve ranges,
so parquet row-group/file skipping works on every dimension.

Everything is a pure column expression (bit shifts and masks — inside
whole-stage codegen, SQL-replicable for the oracle), plus ONE range
repartition to lay files out along the curve. Fixed quantization
ranges (not data-dependent min/max) keep the curve stable across
ingestion batches so incremental writes land in the same key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Affine-quantize ``col`` from the FIXED range [lo, hi) onto
    integer buckets [0, 2**bits), clamping out-of-range values into the
    edge buckets. Fixed ranges (vs per-batch min/max) are what make the
    resulting curve stable across ingestion batches."""
    n = 1 << bits
    scaled = F.floor((col.cast("double") - lo) / (hi - lo) * n).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), scaled))


def z_value(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (already-bucketized)
    column into one Morton key: bit b of column i lands at position
    ``b * len(cols) + i``. A pure expression tree of shifts/masks —
    ``bits × len(cols)`` OR-terms, fully inside codegen, no UDF."""
    ncols = len(cols)
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), b * ncols + i)
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def z_order_layout(
    df: DataFrame,
    specs: list[tuple[str, float, float]],
    bits: int = 8,
    num_files: int | None = None,
    z_col: str = "zval",
) -> DataFrame:
    """Cluster ``df`` along the Z-order curve of the given columns:
    ``specs`` is ``[(col, lo, hi), ...]`` fixed quantization ranges.
    Adds the Morton key as ``z_col`` and range-repartitions + sorts by
    it, so a downstream ``write.parquet`` produces files whose min/max
    stats are tight on EVERY participating column — the one shuffle
    this costs is the same one any layout rewrite pays, and it is
    sampling-based range partitioning (no global sort of all rows in
    one task). Data-skipping effect is asserted in tests by counting
    files a box predicate actually touches."""
    zv = z_value([bucketize(F.col(c), lo, hi, bits) for c, lo, hi in specs], bits)
    out = df.withColumn(z_col, zv)
    parts = [num_files] if num_files is not None else []
    return out.repartitionByRange(*parts, F.col(z_col)).sortWithinPartitions(z_col)
