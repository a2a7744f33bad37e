"""Pairwise-preference rating operators (RLHF data-prep family).

Reward-model training data is pairwise preferences; before training
anything you want per-item strength estimates from those pairs —
which responses/sources/suppliers systematically win. Bradley–Terry
is the canonical model; Hunter's (2004, public) MM algorithm fits it
with a fixed-point iteration that maps exactly onto the pregel-style
join+aggregate shape every iterative operator in this repo uses
(pagerank/ALS/HITS precedent: graph.py:315, factorization.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bradley_terry_ratings(
    comparisons: DataFrame,
    winner_col: str,
    loser_col: str,
    iters: int = 4,
) -> DataFrame:
    """Bradley–Terry strength ratings from pairwise win counts via
    ``iters`` unrolled MM updates (Hunter 2004):

        π_i ← W_i / Σ_{j~i} m_ij / (π_i + π_j)

    with W_i = total wins of i, m_ij = comparisons between i and j,
    renormalized to mean 1 each round (BT is scale-free; the
    renormalization pins the gauge and bounds the integer state).

    Exactness contract (the pagerank/HITS scheme): ratings are
    micro-unit INTEGERS between rounds; each edge term closes as ONE
    integral divide ``m_ij·10^12 DIV (π_i + π_j)`` (exact long sums),
    the node update as ``W_i·10^12 DIV d_i`` clamped to ≥ 1 micro
    (a zero-rated pair would otherwise divide by zero), and the
    renormalization as ``π_i·(n·10^6) DIV Σπ`` — every step
    engine-replicable, so the registry oracle unrolls the same
    rounds.

    Scale posture per round: two broadcast-or-shuffle hash joins of
    the (node, rating) table onto the edge list + one node-keyed
    aggregation — the pregel message shape; O(1) plan via
    localCheckpoint pinning. Input needs ONE row per ordered
    (winner, loser) observation; ties must be dropped upstream.

    Returns ``(node, wins, comparisons, rating)`` with rating scaled
    to mean 1.0, rounded 6 dp.
    """
    obs = comparisons.select(
        F.col(winner_col).alias("_w"), F.col(loser_col).alias("_l")
    )
    wins = obs.groupBy(F.col("_w").alias("node")).agg(
        F.count(F.lit(1)).alias("_wins")
    )
    # symmetric comparison counts: m_ij listed from BOTH endpoints
    m = (
        obs.select(F.col("_w").alias("_i"), F.col("_l").alias("_j"))
        .unionByName(
            obs.select(F.col("_l").alias("_i"), F.col("_w").alias("_j"))
        )
        .groupBy("_i", "_j")
        .agg(F.count(F.lit(1)).alias("_m"))
        .localCheckpoint(eager=False)
    )
    nodes = m.select(F.col("_i").alias("node")).distinct()
    full = (
        nodes.join(wins, "node", "left")
        .select("node", F.coalesce("_wins", F.lit(0)).alias("_wins"))
        .localCheckpoint(eager=False)
    )
    n_nodes = F.broadcast(full.agg(F.count(F.lit(1)).alias("_n")))
    ratings = full.select(
        "node", F.lit(1_000_000).cast("long").alias("_p")
    )
    for _ in range(iters):
        ri = ratings.select(F.col("node").alias("_i"), F.col("_p").alias("_pi"))
        rj = ratings.select(F.col("node").alias("_j"), F.col("_p").alias("_pj"))
        d = (
            m.join(ri, "_i")
            .join(rj, "_j")
            .select(
                F.col("_i").alias("node"),
                F.expr(
                    "CAST(_m AS DECIMAL(38,0)) * 1000000000000"
                    " DIV (_pi + _pj)"
                ).alias("_t"),
            )
            .groupBy("node")
            .agg(F.sum(F.col("_t").cast("decimal(38,0)")).alias("_d"))
        )
        raw = (
            full.join(d, "node")
            .select(
                "node",
                F.greatest(
                    F.expr(
                        "CAST(_wins AS DECIMAL(38,0)) * 1000000000000"
                        " DIV _d"
                    ).cast("long"),
                    F.lit(1).cast("long"),
                ).alias("_pr"),
            )
        )
        tot = F.broadcast(raw.agg(F.sum("_pr").alias("_tp")))
        ratings = (
            raw.crossJoin(tot)
            .crossJoin(n_nodes)
            .select(
                "node",
                F.greatest(
                    F.expr(
                        "CAST(_pr AS DECIMAL(38,0)) * (_n * 1000000)"
                        " DIV _tp"
                    ).cast("long"),
                    F.lit(1).cast("long"),
                ).alias("_p"),
            )
            .localCheckpoint(eager=False)
        )
    comp_counts = m.groupBy(F.col("_i").alias("node")).agg(
        F.sum("_m").alias("comparisons")
    )
    return (
        full.join(ratings, "node")
        .join(comp_counts, "node")
        .select(
            "node",
            F.col("_wins").alias("wins"),
            "comparisons",
            F.round(F.col("_p") / F.lit(1000000.0), 6).alias("rating"),
        )
    )


def group_relative_advantages(
    df: DataFrame,
    group_col: str,
    reward_col,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """GRPO-style group-relative advantages (Shao et al. 2024): for a
    batch of sampled completions per prompt, the advantage of sample i
    is its reward standardized WITHIN the prompt group,
    ``(r_i - mean_g) / std_g`` — the critic-free baseline used by
    group-relative policy optimization; here the RL-data-prep
    primitive that turns raw reward logs into training advantages.

    Exactness: rewards enter as integers (quantize upstream — the
    cents/micros idiom), group moments come from integer sums
    (``n*ss - s*s`` stays in BIGINT), and the standardization is one
    fixed double chain rounded to 6 dp. Degenerate groups (single
    sample, or zero variance) yield NULL advantage — documented
    contract, same as welch/auc.

    Plan shape: one group-partitioned window carrying three partial-
    aggregable sums; no global window, no second pass. Returns the
    kept columns plus (reward_int, advantage).
    """
    w = Window.partitionBy(group_col)
    r = reward_col.cast("long")
    base = df.select(
        *keep_cols,
        F.col(group_col),
        r.alias("reward_int"),
    )
    s = F.sum("reward_int").over(w)
    ss = F.sum(F.col("reward_int") * F.col("reward_int")).over(w)
    n = F.count(F.lit(1)).over(w)
    mean = s.cast("double") / n.cast("double")
    var = (n * ss - s * s).cast("double") / (n * n).cast("double")
    adv = F.when(
        var > 0,
        F.round(
            (F.col("reward_int").cast("double") - mean) / F.sqrt(var),
            6,
        ),
    )
    return base.select(
        *keep_cols,
        group_col,
        "reward_int",
        adv.alias("advantage"),
    )


def best_of_n_curve(
    df: DataFrame,
    group_col: str,
    reward_col,
    ns: tuple[int, ...] = (1, 2, 4, 8, 16),
) -> DataFrame:
    """Best-of-n expected-maximum reward curve — the inference-time
    scaling primitive (how much does reward improve if we sample n
    completions and keep the best?): from the empirical reward
    distribution, ``E[max of n] = sum_x x * (F(x)^n - F(x-)^n)`` over
    distinct reward values x with empirical CDF F.

    Determinism: rewards enter as integers; the per-group CDF comes
    from a cumulative window over DISTINCT reward values (bounded by
    the value domain, never corpus rows — the weighted_percentiles
    category); powers are explicit squaring chains (u2 = u*u,
    u4 = u2*u2, ...) so both engines multiply in the same order; each
    term quantizes to ``floor(x * (u^n - uprev^n) * 1e6)`` BEFORE the
    sum, so the aggregation is an exact integer fold (the nDCG/PSI
    rule: never sum raw doubles across rows).

    Returns (group, n, n_samples, expected_max) with expected_max in
    reward units rounded to 6 dp.
    """
    vals = df.groupBy(
        F.col(group_col).alias("_g"),
        reward_col.cast("long").alias("_x"),
    ).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy("_g").orderBy("_x")
    cum = vals.select(
        "_g",
        "_x",
        F.sum("_c").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_cum"),
        F.sum("_c").over(
            Window.partitionBy("_g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    cum = cum.withColumn(
        "_cprev",
        F.coalesce(F.lag("_cum").over(w), F.lit(0).cast("long")),
    )

    def powers(col):
        # explicit squaring chain: identical association in any engine
        p = {1: col}
        p[2] = p[1] * p[1]
        p[4] = p[2] * p[2]
        p[8] = p[4] * p[4]
        p[16] = p[8] * p[8]
        return p

    lo = F.col("_cprev").cast("double") / F.col("_n").cast("double")
    hi = F.col("_cum").cast("double") / F.col("_n").cast("double")
    phi, plo = powers(hi), powers(lo)
    out = None
    for n in ns:
        if n not in phi:
            raise ValueError("ns must be drawn from {1,2,4,8,16}")
        term = F.floor(
            F.col("_x").cast("double")
            * (phi[n] - plo[n])
            * F.lit(1000000.0)
        ).cast("long")
        part = cum.groupBy(F.col("_g")).agg(
            F.max("_n").alias("n_samples"),
            F.sum(term).alias("_micros"),
        ).select(
            F.col("_g").alias(group_col),
            F.lit(n).alias("n"),
            "n_samples",
            F.round(
                F.col("_micros").cast("double") / F.lit(1000000.0), 6
            ).alias("expected_max"),
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy(group_col, "n")


def dpo_pair_construction(
    df: DataFrame,
    group_col: str,
    id_col: str,
    reward_col,
    min_margin: int = 1,
) -> DataFrame:
    """DPO preference-pair construction from scored samples: per
    prompt group, pair the highest-reward completion (chosen) with the
    lowest (rejected), keeping groups whose margin clears
    ``min_margin`` — the standard offline-preference dataset build
    feeding DPO/IPO trainers (the pair-mining half of what
    bradley_terry_ratings consumes).

    Deterministic: rewards are integers and ties break on the id
    (max_by/min_by over a (reward, id) struct with the id negated on
    the max side, so equal rewards pick the SMALLEST id on both
    sides); one group-keyed aggregation, no windows, no self-join.

    Returns (group, chosen_id, rejected_id, chosen_reward,
    rejected_reward, margin).
    """
    r = reward_col.cast("long")
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        r.alias("_r"),
    )
    agg = base.groupBy("_g").agg(
        F.max(F.struct(F.col("_r"), (-F.col("_id")).alias("_nid"))).alias(
            "_best"
        ),
        F.min(F.struct(F.col("_r"), F.col("_id"))).alias("_worst"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        agg.where(F.col("_n") >= 2)
        .select(
            F.col("_g").alias(group_col),
            (-F.col("_best._nid")).alias("chosen_id"),
            F.col("_worst._id").alias("rejected_id"),
            F.col("_best._r").alias("chosen_reward"),
            F.col("_worst._r").alias("rejected_reward"),
            (F.col("_best._r") - F.col("_worst._r")).alias("margin"),
        )
        .where(F.col("margin") >= min_margin)
        .orderBy(group_col)
    )
