"""Bloom-filter join pruning: build a compact bitset from a join's
small side and pre-filter the big side BEFORE its shuffle.

This is the engine-side version of the batched hash semi-joins the
reference issues as Postgres ``WHERE hash = ANY(%s)`` point lookups
(``GraphHandler.py:493-498``, ``SQLHandler.py:412-473``): at lake
scale the key array no longer fits in a SQL parameter, but its bloom
filter fits in ONE broadcast row. Spark injects bloom filters itself
under AQE (``spark.sql.optimizer.runtime.bloomFilter.enabled``); this
module makes the pattern explicit, deterministic (seeded-md5 hash
family → engine-portable, so the filter itself runs under a hard SQL
oracle) and composable with the repo's other operators.

Scale posture:

- ``bloom_build`` is one aggregation pass: keys fan out to
  ``n_hashes`` bit positions map-side, positions fold into 64-bit
  words (``bit_or`` combines map-side), and the ≤ m_bits/64 non-zero
  word rows collapse into ONE row holding a ``map<int, long>``.
  Shuffle volume is bounded by the bitset size, never the key count.
- ``bloom_prune`` broadcasts that single row and evaluates membership
  as pure column expressions (element_at + shiftright + bit-and) — a
  MAP-ONLY pass over the probe side: rows that fail the bloom never
  reach the join shuffle. With true match fraction f and FP rate p,
  shuffle input drops to ~(f + p) of the scan.
- ``bloom_semi_join`` = prune + exact semi-join confirm, so false
  positives cannot leak: output is bit-identical to a plain semi-join
  (which is exactly its oracle); the bloom only changes WHERE rows die.

False-positive rate ≈ (1 - e^{-kn/m})^k; no false negatives ever
(hypothesis property test in tests/test_pruning.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pos_sql(key_sql: str, seed: int, m_bits: int) -> str:
    """SQL for bit position ``seed``: first 60 bits of
    md5(key || '#seed') pmod m_bits — the same engine-portable hash
    family as the CMS/MinHash pipelines (bit-replicable in DuckDB via
    ``CAST(CONCAT('0x', SUBSTR(MD5(..), 1, 15)) AS BIGINT)``)."""
    return (
        f"pmod(CAST(conv(substring(md5(concat(CAST({key_sql} AS STRING), "
        f"'#{seed}')), 1, 15), 16, 10) AS BIGINT), {m_bits})"
    )


def bloom_position(col: Column, seed: int, m_bits: int) -> Column:
    h = F.conv(
        F.substring(
            F.md5(F.concat(col.cast("string"), F.lit(f"#{seed}"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(m_bits))


def bloom_build(
    df: DataFrame, key_col: str, n_hashes: int = 5, m_bits: int = 65536
) -> DataFrame:
    """Aggregate the build side into a ONE-ROW bloom bitset
    ``(bloom: map<int, long>, n_keys: long)``. The map holds only
    non-zero 64-bit words (sparse) — an under-filled filter broadcasts
    even smaller than m_bits/8 bytes."""
    keys = df.select(F.col(key_col).alias("_k")).distinct()
    pos = keys.select(
        F.explode(
            F.array(*[bloom_position(F.col("_k"), i, m_bits) for i in range(n_hashes)])
        ).alias("_pos")
    )
    words = pos.groupBy(F.expr("CAST(_pos DIV 64 AS INT)").alias("_w")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(_pos % 64 AS INT))")).alias("_bits")
    )
    n = keys.agg(F.count(F.lit(1)).alias("n_keys"))
    return words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_w", "_bits")))
        ).alias("bloom")
    ).crossJoin(F.broadcast(n))


def _member_pred(key_sql: str, map_col: str, n_hashes: int, m_bits: int) -> Column:
    """Membership predicate as ONE column expression: every one of the
    key's n_hashes bits is set. Spark SQL shiftright takes a column
    shift amount (the Python F.shiftright does not)."""
    checks = []
    for i in range(n_hashes):
        pos = _pos_sql(key_sql, i, m_bits)
        word = f"coalesce(element_at({map_col}, CAST(({pos}) DIV 64 AS INT)), 0L)"
        checks.append(
            f"(shiftright({word}, CAST(pmod({pos}, 64) AS INT)) & 1L) = 1L"
        )
    return F.expr(" AND ".join(checks))


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_hashes: int = 5,
    m_bits: int = 65536,
) -> DataFrame:
    """Keep only probe rows whose key passes the bloom filter.

    The one-row ``bloom`` frame broadcasts (BroadcastNestedLoopJoin of
    a single row — free); the membership test is then a map-only
    filter over ``probe``: no Exchange touches the probe side
    (plan-asserted in tests/test_plans.py)."""
    pruned = probe.crossJoin(F.broadcast(bloom.select("bloom")))
    return pruned.where(_member_pred(key_col, "bloom", n_hashes, m_bits)).drop(
        "bloom"
    )


def bloom_semi_join(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    n_hashes: int = 5,
    m_bits: int = 65536,
) -> DataFrame:
    """Exact semi-join with a bloom pre-filter on the probe side.

    Result is bit-identical to ``probe.join(build, semi)`` — the bloom
    pass only reduces the rows entering the join shuffle (at 100 TB:
    the difference between shuffling the full fact scan and shuffling
    the ~matching slice). The confirming join stays, so FP rate only
    costs shuffle bytes, never correctness."""
    bloom = bloom_build(build, build_key, n_hashes, m_bits)
    pruned = bloom_prune(probe, probe_key, bloom, n_hashes, m_bits)
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return pruned.join(keys, probe_key, "left_semi")


def bloom_audit(
    probe_keys: DataFrame,
    key_col: str,
    build: DataFrame,
    build_key: str,
    n_hashes: int = 3,
    m_bits: int = 16384,
) -> DataFrame:
    """One-row quality audit of a bloom filter: how many distinct probe
    keys pass, how many are true members, how many are false positives
    (and the FP rate among non-members, rounded). Deterministic — the
    seeded-md5 family makes even the FP count oracle-checkable."""
    bloom = bloom_build(build, build_key, n_hashes, m_bits)
    probes = probe_keys.select(F.col(key_col).alias("_k")).distinct()
    member = build.select(F.col(build_key).alias("_k")).distinct().withColumn(
        "_m", F.lit(1)
    )
    flagged = (
        bloom_prune(probes, "_k", bloom, n_hashes, m_bits)
        .withColumn("_pass", F.lit(1))
        .join(member, "_k", "left")
    )
    all_probes = probes.join(member, "_k", "left")
    passed = flagged.agg(
        F.count(F.lit(1)).alias("n_pass"),
        F.sum(F.coalesce(F.col("_m"), F.lit(0))).alias("n_pass_member"),
    )
    totals = all_probes.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.coalesce(F.col("_m"), F.lit(0))).alias("n_members"),
    )
    return (
        totals.crossJoin(F.broadcast(passed))
        .select(
            "n_probed",
            "n_members",
            "n_pass",
            (F.col("n_pass") - F.col("n_pass_member")).alias("n_false_pos"),
            F.round(
                (F.col("n_pass") - F.col("n_pass_member"))
                / F.greatest(
                    (F.col("n_probed") - F.col("n_members")).cast("double"),
                    F.lit(1.0),
                ),
                6,
            ).alias("fp_rate"),
        )
    )
