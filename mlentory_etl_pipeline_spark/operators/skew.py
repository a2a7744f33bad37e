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
