"""Matrix factorization for implicit-feedback recommendation — the
ALS family (the marquee Spark MLlib workload) re-expressed with the
repo's determinism contract.

:func:`als_rank1` is alternating least squares at rank 1: with a
single latent dimension the per-entity solve collapses to

    u_i = Σ_j r_ij·v_j / (Σ_{j∈J_i} v_j² + λ),

i.e. one aggregation per side per iteration — exactly pagerank's
"message + normalize" shape, which is what lets the fold run in EXACT
integer arithmetic: factors are stored in micro-units (round 1e6·f),
rating×factor products and factor-square sums are DECIMAL(38,0)
integer folds, and each update re-quantizes once with a single floored
division. No float summation anywhere → bit-identical across
partitionings and engines, and the fixed iteration count unrolls into
a hard SQL oracle (the pagerank/Lloyd's precedent). Rank-1 is the
dominant-factor model ("how much does this customer buy × how popular
is this supplier") — the higher-rank extension changes the per-entity
solve to a k×k system but not the data movement, which is what the
100 TB question cares about.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators.capping import lazy_cap

SCALE = 10**6


def als_rank1(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    iters: int = 4,
    lambda_millionths: int = 100000,  # λ = 0.1 in micro-units
) -> DataFrame:
    """Rank-1 ALS over an integer-rating matrix. Returns the item
    factors ``(item, factor)`` after ``iters`` alternations (factor =
    micro-units / 1e6, rounded 6 dp) — users initialize at 1.0 and the
    item pass runs first, so every engine's fold is the identical
    sequence of exact integer operations.

    Scale posture per iteration: TWO rating-keyed aggregations (item
    pass groups by item, user pass by user — each one shuffle of the
    ratings table keyed by the grouping side, partial-aggregated
    map-side), factor tables rejoin by key; localCheckpoint pins each
    half-iteration so the plan stays O(1) per round. λ rides in the
    same micro-unit algebra (den = Σ V² + λ·10¹²).
    """
    r = ratings.select(
        F.col(user_col).alias("_u"),
        F.col(item_col).alias("_i"),
        F.col(rating_col).cast("long").alias("_r"),
    )
    r = lazy_cap(r)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    lam = lambda_millionths * SCALE  # λ·10¹² in micro² units
    users = r.select("_u").distinct().select(
        "_u", F.lit(SCALE).cast("long").alias("_uf")
    )
    items = None
    for _ in range(iters):
        ru = r.join(users, "_u")
        items = (
            ru.groupBy("_i")
            .agg(
                F.sum(dec(F.col("_r")) * F.col("_uf")).alias("_num"),
                F.sum(dec(F.col("_uf")) * F.col("_uf")).alias("_den"),
            )
            .select(
                "_i",
                F.floor(
                    (F.col("_num") * F.lit(SCALE * SCALE)).cast("double")
                    / (F.col("_den") + F.lit(lam)).cast("double")
                )
                .cast("long")
                .alias("_if"),
            )
        )
        items = lazy_cap(items)
        ri = r.join(items, "_i")
        users = (
            ri.groupBy("_u")
            .agg(
                F.sum(dec(F.col("_r")) * F.col("_if")).alias("_num"),
                F.sum(dec(F.col("_if")) * F.col("_if")).alias("_den"),
            )
            .select(
                "_u",
                F.floor(
                    (F.col("_num") * F.lit(SCALE * SCALE)).cast("double")
                    / (F.col("_den") + F.lit(lam)).cast("double")
                )
                .cast("long")
                .alias("_uf"),
            )
        )
        users = lazy_cap(users)
    return items.select(
        F.col("_i").alias(item_col),
        F.round(F.col("_if").cast("double") / F.lit(float(SCALE)), 6).alias(
            "factor"
        ),
    )
