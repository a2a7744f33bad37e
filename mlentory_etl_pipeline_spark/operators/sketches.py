"""Mergeable-sketch operators: two-level HyperLogLog distinct counts
and a DataFrame-native count-min sketch.

The defining property at 100 TB is MERGEABILITY: a sketch computed per
partition/shard/day merges associatively into the global answer, so
distinct counts and frequency estimates never re-scan history — the
lake stores small sketch rows, and rollups union them. This is the
architecture behind every production approx-aggregation layer
(Druid/Pinot-style), expressed here with Spark's built-in DataSketches
HLL functions plus a pure-DataFrame CMS (no UDF, no driver state).

Reference parity: the reference computes exact distinct/frequency
counts in SQL at its scale (`SQLHandler.py` aggregate queries, Q8
SPARQL aggregates); these are the fixed-memory substitutes its own
stack would need at lake scale, same posture as `approx_aggregates`
(SURVEY §2.9 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partitioned_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_shards: int = 16,
    lg_k: int = 12,
) -> DataFrame:
    """Distinct count per group via two-level HLL sketch merge.

    Level 1 sketches each (group, shard) slice — in production the
    shard is the natural storage partition (ingest day / file), here a
    hash shard standing in for it. Level 2 unions the shard sketches
    per group with ``hll_union_agg`` and estimates. Both levels are
    map-side combinable aggregates; shuffle volume is |groups×shards|
    sketch blobs (~2^lg_k bytes each), never row data.

    Error ~1.04/√2^lg_k (≈1.6% at lg_k=12), test-bounded against the
    exact count. The two-level shape is the point: persisted level-1
    sketches make tomorrow's rollup an incremental union, not a
    re-scan — the same incremental posture as the SCD2 store.

    The shard hash is the engine-portable seeded-md5 family (the CMS
    scheme) rather than xxhash64, so the registry query's oracle can
    replicate ``n_shards`` exactly; any deterministic hash works —
    sharding only has to spread values, and the sketch union is
    shard-assignment-invariant.
    """
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(n_shards),
    )
    level1 = df.groupBy(F.col(group_col), shard.alias("_shard")).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("_sk")
    )
    return level1.groupBy(group_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("est_distinct"),
        F.count(F.lit(1)).alias("n_shards"),
    )


def _cms_cells(key: F.Column, depth: int, width: int) -> F.Column:
    """The d (row, bucket) cells a key hashes to — row i uses the first
    60 bits of ``md5(key || '#' || i)`` pmod'd onto the width: the same
    engine-portable hash family as the MinHash pipeline (one seeded md5
    per row, replicable byte-for-byte in any engine — what lets the CMS
    registry query carry a hard SQL oracle)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("h"),
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(F.concat(key, F.lit(f"#{i}"))), 1, 15
                        ),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(width),
                ).alias("b"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Build a count-min sketch as a (h, b, cnt) counter table.

    Each row fans out to its ``depth`` cells map-locally (explode of a
    literal-sized array), then one hash aggregation sums cell counts —
    map-side combine collapses the fan-out before the shuffle, so at
    most depth×width counter rows ever move. The result is a tiny
    relation (≤ depth×width rows) that BROADCASTS for estimation and
    MERGES with another sketch by cell-wise addition (`cms_merge`) —
    per-day sketches sum into per-month ones without re-scanning.

    No UDF, no binary blobs: the sketch is an honest DataFrame, so it
    stores as parquet and survives engine changes.
    """
    cells = df.select(
        F.explode(_cms_cells(F.col(key_col).cast("string"), depth, width)).alias("c")
    )
    return cells.groupBy(F.col("c.h").alias("h"), F.col("c.b").alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with identical (depth, width).
    CMS is a linear sketch: counts add, so sketch(A ∪ B) =
    sketch(A) + sketch(B) exactly (test-asserted)."""
    return (
        a.unionByName(b)
        .groupBy("h", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-query the sketch for each probe key: min over the key's
    depth cells (absent cell = 0). The sketch side broadcasts (≤
    depth×width rows); probes fan out depth-fold map-locally and
    collapse back with one min aggregation keyed by probe. Guarantees:
    estimate ≥ true count always; overshoot ≤ εN with probability
    1−(1/e)^depth, ε = e/width (test-bounded).
    """
    cand = probes.select(
        F.col(key_col),
        F.explode(_cms_cells(F.col(key_col).cast("string"), depth, width)).alias("c"),
    ).select(key_col, F.col("c.h").alias("h"), F.col("c.b").alias("b"))
    return (
        cand.join(F.broadcast(sketch), ["h", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Fixed-bin histogram sketch per key group — the simplest MERGEABLE
    quantile structure: bin counts add across shards/partitions/days,
    so a 100 TB lake keeps one tiny histogram per (partition, key) and
    folds them associatively instead of re-sorting raw data
    (the posture of every t-digest/KLL deployment; fixed bins trade
    adaptivity for exact mergeability and engine-portable determinism).

    Values clamp into ``[lo, hi)`` over ``n_bins`` equal bins
    (bin = clamp(floor((v-lo)/(hi-lo)*n_bins))). Returns
    ``keys + (bin, n)`` — one partial-aggregable groupBy.
    """
    span = float(hi) - float(lo)
    raw = F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(span) * n_bins)
    clamped = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw)).cast("int")
    return (
        df.select(*keys, clamped.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_histograms(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Associative merge of two histogram sketches (bin counts add)."""
    return (
        a.unionByName(b)
        .groupBy(*keys, "bin")
        .agg(F.sum("n").alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame,
    keys: list[str],
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: per key, the q-th
    quantile is the UPPER EDGE of the first bin whose cumulative count
    reaches ceil(q * total) — pure integer logic over ≤ n_bins rows per
    key, deterministic in any engine, error bounded by one bin width.

    Returns ``keys + (q, quantile_est)`` with one row per requested q.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        *keys,
        "bin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(Window.partitionBy(*keys)).alias("total"),
    )
    span = float(hi) - float(lo)
    qs = F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    return (
        cum.select(*keys, "bin", "cum", "total", qs)
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("total") - F.lit(1e-9)))
        .groupBy(*keys, "q")
        .agg(F.min("bin").alias("_b"), F.min("total").alias("total"))
        .select(
            *keys,
            "q",
            (F.lit(float(lo)) + (F.col("_b") + 1) * F.lit(span) / F.lit(n_bins)).alias(
                "quantile_est"
            ),
            "total",
        )
    )


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key foldable aggregate STATE (count / exact-decimal sum /
    min / max) — the incremental-view-maintenance summary: compute it
    per batch/partition/day, then :func:`merge_agg_states` folds states
    associatively so a refreshed rollup never rescans history (the
    reference's whole pipeline re-aggregates on every load; this is the
    Spark-native fix). Sum is exact DECIMAL so merge order can never
    drift the result."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("sum_dec"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_agg_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Associative merge of two :func:`agg_state` tables: counts and
    exact sums add, min/max fold — merging N daily states equals one
    aggregation over the union of their inputs (asserted in tests and
    by the registry oracle)."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


# --------------------------------------------- md5-register HLL

#: standard HLL bias constant for m >= 128 registers
def _hll_alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_md5_registers(
    df: DataFrame, group_cols: list[str], value_col: str, b: int = 8
) -> DataFrame:
    """Engine-portable HyperLogLog registers: one seeded-md5 60-bit
    hash per value, low ``b`` bits pick the register, and rho = leading
    zeros in the remaining 52-bit payload + 1 — computed EXACTLY via
    binary-string length (no float log), so registers are byte-
    replicable in any engine (the DataSketches twin
    ``hll_partitioned_distinct`` stays the production fast path; this
    one trades CPU for a hard SQL oracle and cross-engine parity).

    Returns ``(group_cols…, register, max_rho)`` — the mergeable state:
    ``merge = max per register`` (test-asserted exactly), so per-shard
    register tables union + groupBy-max into the global sketch without
    rescanning history.
    """
    m = 1 << b
    payload_bits = 60 - b
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    reg = F.pmod(h, F.lit(m))
    w = F.floor(h / F.lit(m)).cast("long")
    # floor(log2(w)) + 1 == length(bin(w)) for w > 0, exact integers
    rho = F.when(w > 0, F.lit(payload_bits + 1) - F.length(F.bin(w))).otherwise(
        F.lit(payload_bits + 1)
    )
    return (
        df.select(*group_cols, reg.alias("register"), rho.alias("_rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("_rho").alias("max_rho"))
    )


def hll_md5_estimate(
    registers: DataFrame, group_cols: list[str], b: int = 8
) -> DataFrame:
    """Distinct-count estimate from :func:`hll_md5_registers` state,
    with the standard small-range linear-counting correction.

    Determinism: the harmonic sum Σ 2^-rho runs as INTEGER arithmetic —
    ``N = Σ 2^(K - rho)`` with K the group's max rho (N < m·2^52 fits a
    long), then ``E = alpha·m²·2^K / N`` is one correctly-rounded
    double division — so the estimate is bit-identical on any
    partitioning or engine, and the registry query carries a hard SQL
    oracle.

    The harmonic sum covers ALL m registers — EMPTY registers
    contribute rho = 0, i.e. ``2^K`` each, added as the single term
    ``(m − present)·2^K``. Omitting them (a one-sided sum over present
    registers only) inflates estimates by up to ~50% in the
    2.5m–5m cardinality band just above the linear-counting cutoff —
    caught by the set-algebra accuracy test at n ≈ 2.3·m.
    """
    m = 1 << b
    alpha = _hll_alpha(m)
    kmax = registers.groupBy(*group_cols).agg(F.max("max_rho").alias("_k"))
    joined = registers.join(F.broadcast(kmax), group_cols)
    agg = joined.groupBy(*group_cols).agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), _k - max_rho)")
        ).alias("_np"),
        F.first("_k").alias("_k2"),
        F.count(F.lit(1)).alias("_present"),
    )
    agg = agg.withColumn(
        "_n",
        F.col("_np")
        + (F.lit(m) - F.col("_present"))
        * F.expr("shiftleft(CAST(1 AS BIGINT), _k2)"),
    )
    e_raw = (
        F.lit(alpha * m * m)
        * F.pow(F.lit(2.0), F.col("_k2").cast("double"))
        / F.col("_n")
    )
    v = F.lit(m) - F.col("_present")  # zero registers
    e_lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    est = F.when((e_raw <= 2.5 * m) & (v > 0), e_lc).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 4).alias("est_distinct"))


def hll_rolling_distinct(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    days: int = 7,
    b: int = 8,
) -> DataFrame:
    """Trailing-``days`` rolling distinct counts from MERGED daily HLL
    sketches — the production rolling-uniques pattern at lake scale:
    per-day register tables are tiny (m rows/day), immutable, and
    mergeable (``max`` per register), so "7-day uniques per day" costs
    an interval join over METADATA instead of re-scanning a week of
    raw events per day (the associativity law
    ``sketch(A∪B) = merge(sketch(A), sketch(B))`` is what the
    agg-state tests assert exactly).

    Shape: one raw-data pass builds daily registers
    (:func:`hll_md5_registers`); a broadcast day-spine interval join
    (|days| × m × window rows — metadata) re-groups ``max(rho)`` per
    (day, register); :func:`hll_md5_estimate` closes each day. The
    range join is on the SKETCH table, never the corpus. Engine-exact
    end-to-end (the md5-HLL determinism scheme), so the rolling
    APPROXIMATE series itself carries a hard SQL oracle.
    """
    base = df.select(
        F.to_date(F.col(ts_col)).alias("_day"), F.col(value_col)
    )
    regs = hll_md5_registers(base, ["_day"], value_col, b)
    epoch = F.lit("1970-01-01").cast("date")
    r = regs.select(
        F.datediff(F.col("_day"), epoch).alias("_dn"),
        "register",
        "max_rho",
    )
    spine = (
        regs.select("_day")
        .distinct()
        .select("_day", F.datediff(F.col("_day"), epoch).alias("_dd"))
    )
    merged = (
        F.broadcast(spine)
        .join(
            r,
            (F.col("_dn") <= F.col("_dd"))
            & (F.col("_dn") >= F.col("_dd") - F.lit(days - 1)),
        )
        .groupBy("_day", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    return (
        hll_md5_estimate(merged, ["_day"], b)
        .withColumnRenamed("_day", "day")
        .orderBy("day")
    )
