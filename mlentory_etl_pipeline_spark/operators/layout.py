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

Relation to ``sources/files.py``: ``files.zorder_write`` is the
one-shot WRITE path (2 columns, per-batch min/max normalization —
right when you rewrite a whole table once); this module is the
engine-level key computation — N columns, batch-stable fixed ranges,
usable inside any plan and verifiable by a SQL oracle. Likewise
``files.compact`` EXECUTES a directory rewrite, while
:func:`compaction_plan` PLANS bins over an arbitrary listing as data
(what a table-maintenance service schedules from).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def compaction_plan(
    files: DataFrame,
    size_col: str,
    target_bytes: int,
    name_col: str = "file_name",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Plan small-file compaction: group undersized files into bins of
    ~``target_bytes`` (the lake's OPTIMIZE/rewrite step — small files
    are the dominant operational failure of any streaming/incremental
    writer at scale: metadata pressure, per-file open cost, and broken
    min/max locality).

    Deterministic sorted-fill bin packing: files already >=
    ``target_bytes`` are kept as-is; the rest order by (size DESC,
    name) and fill bins by cumulative size — ``bin = floor((cumsum -
    size) / target)``, the classic one-window approximation of
    first-fit-decreasing (within 2x of optimal, and fully expressible
    as a single window aggregation, so a SQL oracle verifies it
    bit-for-bit). Compaction is per table-partition in practice: pass
    ``partition_cols`` and the fill windows partition by them (bins
    never span partitions, and the plan has no single-partition sort);
    the global default is for flat listings — a LISTING is metadata
    (~10^6 rows per million files), not data, so even global it is
    nowhere near data-scale. Planning only — execution is a
    groupBy(bin) rewrite the caller runs.

    Returns ``(partition_cols..., file_name, size_bytes, action,
    bin_id)`` with action ``keep`` (full-size, bin_id = -1) or
    ``compact``; bin ids are unique within a partition.
    """
    pcols = list(partition_cols or [])
    f = files.select(
        *pcols,
        F.col(name_col).alias("file_name"),
        F.col(size_col).cast("long").alias("size_bytes"),
    )
    big = f.where(F.col("size_bytes") >= target_bytes).select(
        *pcols, "file_name", "size_bytes",
        F.lit("keep").alias("action"), F.lit(-1).cast("long").alias("bin_id"),
    )
    w = (
        Window.partitionBy(*pcols)
        .orderBy(F.desc("size_bytes"), F.asc("file_name"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    small = (
        f.where(F.col("size_bytes") < target_bytes)
        .withColumn("_cum", F.sum("size_bytes").over(w))
        .select(
            *pcols, "file_name", "size_bytes",
            F.lit("compact").alias("action"),
            F.floor((F.col("_cum") - F.col("size_bytes")) / target_bytes).alias(
                "bin_id"
            ),
        )
    )
    return big.unionByName(small)


def range_partition_bounds(
    df: DataFrame,
    key_col: str,
    tiebreak_col: str,
    n_buckets: int,
    sample_mod: int | None = None,
    seed: str = "rpb-v1",
) -> DataFrame:
    """Plan balanced range-partition boundaries for a sort key — the
    planner step behind every ``repartitionByRange`` / global-sort
    write (Spark's RangePartitioner does exactly this internally, from
    an opaque reservoir sample; this operator makes the boundary
    computation an inspectable, DETERMINISTIC plan artifact a table-
    maintenance service can persist and reuse across writes).

    The total order is ``(key, tiebreak)`` — the tiebreak makes NTILE's
    row assignment unambiguous, so bucket membership is a pure function
    of the data. With ``sample_mod`` set, boundaries compute over the
    deterministic md5 row sample ``hash(seed|tiebreak) % mod == 0``
    (the tiebreak is the row identity; hashing it alone keeps the
    sample independent of the key AND avoids cross-engine float-to-
    string formatting in the hash input) —
    the honest posture at data scale, where the planner NEVER sorts the
    full table: the ntile window runs over |df|/mod rows, and the
    resulting bounds are approximate in exactly the way a sampled range
    planner is. Without it the bounds are exact (fine for metadata-
    sized inputs like file listings or group aggregates).

    Returns ``(bucket, lo_key, hi_key, n_rows)`` — one row per bucket,
    boundaries inclusive, ``n_rows`` counted over the (sampled) input.
    """
    base = df.select(F.col(key_col).alias("_k"), F.col(tiebreak_col).alias("_t"))
    if sample_mod is not None:
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(seed), F.col("_t").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        base = base.where(F.pmod(h, F.lit(sample_mod)) == 0)
    w = Window.orderBy("_k", "_t")
    tiled = base.select(
        "_k", F.ntile(n_buckets).over(w).cast("long").alias("bucket")
    )
    return (
        tiled.groupBy("bucket")
        .agg(
            F.min("_k").alias("lo_key"),
            F.max("_k").alias("hi_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("bucket")
    )


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding: each key goes to
    ``argmax_s md5(key ':' s)`` over shards ``0..n_shards-1`` — the
    consistent-placement primitive for a 100 TB lake: when a shard is
    added, ONLY keys whose new-shard weight wins move (≈ 1/(N+1) of
    them), versus ``hash % N`` reshuffling almost everything. Pure
    map-side Column expression (one transform over the shard range +
    array_max on (weight, shard) structs — deterministic total order),
    no shuffle, engine-replicable via the md5-prefix integer idiom
    (sketches.py:284).

    Scale note: cost is O(n_shards) per row map-side; for shard counts
    beyond a few hundred use the two-level variant (HRW over shard
    GROUPS, then within the group).
    """
    w = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.struct(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(key_col).cast("string"),
                            F.lit(":"),
                            s.cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("w"),
            s.alias("s"),
        ),
    )
    return df.withColumn(out_col, F.array_max(w).getField("s"))
