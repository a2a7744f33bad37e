"""Skew-mitigation operators.

AQE's skew-join splitting (`session.py`) handles sort-merge skew at
runtime, but two situations still need explicit salting at 100 TB:

- a *shuffled hash* join whose hot key overflows one task even after
  AQE splits (AQE splits partitions, not single keys on the build side);
- any key-shuffled operation that is NOT a join (e.g. collect_set per
  key) where one key dominates.

``salted_join`` implements the classic rewrite declaratively: the
skewed side gets a deterministic salt in ``[0, salt)``, the other side
is replicated ``salt``-fold via explode, and the join key becomes
(key, salt) — the hot key's rows spread over ``salt`` tasks. Results
are identical to the unsalted join (the oracle for the registry query
IS the plain join); only the shuffle distribution changes. Replication
multiplies the non-skewed side, so salt counts stay small (8–32) and
the replicated side should be the smaller one.

The measurement half of the toolkit: ``skew_key_profile`` (which
mitigation does this key distribution actually need?) and
``join_size_profile`` (how many rows will this join emit, and which
key pair straggles?) — run the diagnostics on the count tables before
paying for the join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``salt``
    shuffle tasks. ``other`` is replicated ``salt`` times — keep it the
    smaller side. Deterministic: the salt is a hash of the skewed row's
    non-key columns (mod salt), so re-runs shuffle identically.
    """
    if how.replace("_outer", "") in ("right", "full", "outer"):
        raise ValueError(
            "salted_join replicates the non-skewed side: unmatched rows there "
            "would appear `salt` times under right/full joins — use inner/left/"
            "semi/anti, or salt the other side"
        )
    non_key = [c for c in skewed.columns if c not in on] or on
    s = skewed.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in non_key]), F.lit(salt))
    )
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return s.join(o, [*on, "_salt"], how).drop("_salt")


def skew_key_profile(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 20,
    salt_share: float = 0.1,
    aqe_ratio: float = 5.0,
) -> DataFrame:
    """Join-key skew diagnostic: the measurement that decides BETWEEN
    the mitigation strategies this module and AQE provide, instead of
    guessing. For the ``top_k`` heaviest keys, report count, share of
    all rows, skew ratio vs the mean key, and a deterministic
    recommendation:

    - ``salt``       — one key holds > ``salt_share`` of the table: it
      overflows any single shuffle task no matter how AQE splits
      partitions → :func:`salted_join`.
    - ``aqe_skew_join`` — > ``aqe_ratio``× the mean key but under the
      salt bar: AQE's runtime partition splitting handles it.
    - ``hash_join_ok`` — within a ratio of the mean; plain shuffle.

    Plan shape: one hash-keyed count aggregation, a TakeOrdered top-k
    (never a global window over all keys — rank is computed on the
    ≤ top_k surviving rows), and a broadcast of the single totals row.
    Safe to point at a 100 TB fact table: cost is the one aggregation
    every groupBy already pays.
    """
    from pyspark.sql import Window

    # concat_ws silently DROPS null parts, so ('a', NULL, 'b') and
    # ('a', 'b', NULL) would collapse into one profile key and
    # overstate its count; coalesce each part to a NUL-prefixed
    # sentinel no real value carries so null keeps its position.
    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in key_cols
        ],
    )
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_k)
    # constant-partition window: the input is the ≤ top_k rows the
    # limit kept (TakeOrdered already returns one partition), so this
    # is bounded by k, not data size — the lit(0) partition key states
    # that on purpose instead of tripping the global-window warning
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("cnt"), F.asc("key"))
    share = F.col("cnt").cast("double") / F.col("_total").cast("double")
    ratio = (
        F.col("cnt").cast("double")
        * F.col("n_keys").cast("double")
        / F.col("_total").cast("double")
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "key",
            "cnt",
            "rank",
            "n_keys",
            F.round(share, 6).alias("share"),
            F.round(ratio, 4).alias("skew_ratio"),
            F.when(share > F.lit(salt_share), F.lit("salt"))
            .when(ratio > F.lit(aqe_ratio), F.lit("aqe_skew_join"))
            .otherwise(F.lit("hash_join_ok"))
            .alias("recommendation"),
        )
        .orderBy("rank")
    )


def join_size_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Predict an equi-join's output size WITHOUT executing the join —
    the other half of the join-planning toolkit next to
    :func:`skew_key_profile`. ``|A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k)``, so
    two per-key count aggregations plus a join OF THE COUNT TABLES
    (each |keys| rows, not |rows|) give the exact output cardinality,
    the hottest key pair (the single (cnt_A·cnt_B) argmax — the task
    that will straggle), and the key-overlap stats that say whether
    the join is selective or a fan-out bomb. At 100 TB this costs two
    groupBys; the join it predicts may cost hours — run the profile
    first, then pick the strategy (broadcast / salt / pre-aggregate)
    the numbers justify.

    One output row: n_left/n_right input rows, per-side distinct keys,
    common keys, exact join_rows, max_key_rows and its arg (ties break
    on key ASC).
    """
    cl = left.select(F.col(left_key).cast("string").alias("key")).groupBy(
        "key"
    ).agg(F.count(F.lit(1)).alias("_cl"))
    cr = right.select(F.col(right_key).cast("string").alias("key")).groupBy(
        "key"
    ).agg(F.count(F.lit(1)).alias("_cr"))
    lstats = cl.agg(
        F.sum("_cl").alias("n_left"), F.count(F.lit(1)).alias("left_keys")
    )
    rstats = cr.agg(
        F.sum("_cr").alias("n_right"), F.count(F.lit(1)).alias("right_keys")
    )
    # per-key products and their sum are exactly what a fan-out bomb
    # inflates — accumulate in decimal(38,0) (the exact_auc discipline)
    # so the profile never wraps or ANSI-faults in int64; the final
    # try_cast reports NULL join_rows iff the prediction exceeds int64
    # (by then the answer IS "do not run this join").
    joined = cl.join(cr, "key").select(
        "key",
        (F.col("_cl").cast("decimal(38,0)") * F.col("_cr")).alias("_prod"),
    )
    jstats = joined.agg(
        F.count(F.lit(1)).alias("common_keys"),
        F.coalesce(F.sum("_prod"), F.lit(0).cast("decimal(38,0)"))
        .try_cast("long")
        .alias("join_rows"),
        F.max("_prod").try_cast("long").alias("max_key_rows"),
        F.min_by("key", F.struct((-F.col("_prod")).alias("n"), F.col("key"))).alias(
            "hottest_key"
        ),
    )
    return (
        lstats.crossJoin(F.broadcast(rstats))
        .crossJoin(F.broadcast(jstats))
        .select(
            "n_left", "n_right", "left_keys", "right_keys",
            "common_keys", "join_rows", "max_key_rows", "hottest_key",
        )
    )
