"""Incremental view maintenance (IVM) for joins: compute a join
view's DELTA from arriving deltas without re-joining the full inputs.

The reference recomputes derived state wholesale each run (the
`update_dbs_with_kg` pipeline re-derives search docs and current-graph
rows for every touched entity, `LoadProcessor.py:120-160`); its only
incremental machinery is the SCD2 store itself. At lake scale every
MATERIALIZED JOIN downstream of an incremental source needs the
classic delta rule instead of a rebuild:

    Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB

(for inserts under bag semantics — the same rule DBSP/differential
dataflow and every IVM engine implements). Cost is |ΔA|·sel + |ΔB|·sel
instead of |A|·|B| — the deltas drive the joins, and Catalyst
broadcasts them when they are micro-batch-sized, so maintaining the
view costs shuffle proportional to the CHANGE, not the history.

This module complements the aggregation-side incremental machinery
(`sketches.agg_state_*` mergeable rollups, `streaming/incremental.py`
foldable stores): together they cover the two derived-state shapes
(joins and aggregations) a lake pipeline materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_join_delta(
    a_old: DataFrame,
    b_old: DataFrame,
    a_delta: DataFrame,
    b_delta: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Insert-delta of ``(a_old ∪ a_delta) ⋈ (b_old ∪ b_delta)``
    relative to ``a_old ⋈ b_old``, WITHOUT computing either full join.

    Bag-semantics exact: returns precisely the multiset difference of
    the new and old join results (property-tested, and the registry
    query's oracle computes the full-minus-old definition with
    ``EXCEPT ALL`` while this side computes the delta rule — the two
    derivations must collide bit-for-bit).

    Plan shape: three joins, each keyed by ``on`` and each with a
    delta on at least one side — when deltas are micro-batch-sized
    Catalyst broadcasts them and the historical sides stream through
    map-side. Nothing scans A ⋈ B.
    """
    on = [on] if isinstance(on, str) else list(on)
    return (
        a_delta.join(b_old, on)
        .unionByName(a_old.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )


def zset_agg_delta(
    agg_old: DataFrame,
    delta: DataFrame,
    keys: list[str],
    n_col: str = "n",
    sum_cols: dict[str, str] | None = None,
    z_col: str = "z",
) -> DataFrame:
    """Maintain a grouped count/sum view under INSERTS AND DELETES:
    ``delta`` rows carry a multiplicity ``z`` (+1 insert, −1 retract —
    the Z-set encoding DBSP/differential dataflow uses), so the view's
    change per key is one aggregation of the delta (Δn = Σz,
    Δsum = Σ z·v) folded into the old state with an outer join;
    groups whose count reaches zero vanish.

    ``sum_cols`` maps view sum-column → delta value-column. Linear
    aggregates (count/sum, and anything derived from them — avg,
    rates) maintain exactly under retraction; MIN/MAX do not (a
    retracted extremum needs history) — that asymmetry is the
    textbook IVM boundary and is the module contract, not a TODO.

    Cost: one map-side-combined aggregation of |delta| rows + an
    outer join keyed by the view key against the |groups|-row state —
    never a rescan of the base table.
    """
    sum_cols = sum_cols or {}
    aggs = [F.sum(F.col(z_col)).alias("_dn")] + [
        F.sum(F.col(z_col) * F.col(src)).alias(f"_d_{dst}")
        for dst, src in sum_cols.items()
    ]
    d = delta.groupBy(*keys).agg(*aggs)
    joined = agg_old.join(d, keys, "full_outer")
    out_cols = list(keys) + [
        (
            F.coalesce(F.col(n_col), F.lit(0))
            + F.coalesce(F.col("_dn"), F.lit(0))
        ).alias(n_col)
    ]
    for dst in sum_cols:
        out_cols.append(
            (
                F.coalesce(F.col(dst), F.lit(0))
                + F.coalesce(F.col(f"_d_{dst}"), F.lit(0))
            ).alias(dst)
        )
    return joined.select(*out_cols).where(F.col(n_col) != 0)
