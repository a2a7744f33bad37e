"""Entity resolution: blocked record linkage and set-similarity joins.

The reference resolves entities by exact identifier and by argmax name
disambiguation (`HFDatasetManager.py` ID lookups, G9 argmax in
`GraphHandlerEntities.py`); it never fuzzy-links ACROSS sources. At
training-data scale a linkage pass is unavoidable (merging model/dataset
records harvested from different platforms under slightly different
names), so this module adds the three classic scalable shapes, all as
compositions of DataFrame ops — no UDFs, no cartesian products:

- :func:`blocked_link` — blocking-key equi-join + edit-distance verify.
  The all-pairs O(N*M) comparison collapses to candidates sharing a
  cheap deterministic block key; only candidates pay the verify cost.
- :func:`sorted_neighborhood_pairs` — the other classic blocking
  strategy: one global sort, pair rows within a fixed window of ranks.
  Candidate count is exactly ``N * (w-1)/2`` regardless of key skew —
  the bound a hot block key breaks in :func:`blocked_link`.
- :func:`setsim_prefix_join` — PPJoin-style prefix-filtered Jaccard
  self-join: a pair can reach threshold ``t`` only if the two sets
  share a token inside their rarest-first prefixes, so the candidate
  join runs on exploded prefix tokens only, then verifies exactly.

At 100 TB: every shape is one equi-join keyed by something small
(block key / rank bucket / prefix token) plus a candidate-only verify;
the verify input is bounded by candidate count, not corpus size. Skewed
block keys (e.g. empty-name blocks) should be dropped or salted before
the join — ``max_block_size`` does the dropping declaratively.
"""

from __future__ import annotations

import decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators.capping import lazy_cap


def blocked_link(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_name: str,
    right_name: str,
    max_edit_distance: int = 3,
    prefix_len: int = 3,
    max_block_size: int | None = None,
) -> DataFrame:
    """Link records whose normalized names are within an edit distance,
    comparing only candidates that share a blocking key.

    The block key is ``(first prefix_len chars, length bucket)`` of the
    lower-cased alphanumeric-only name: cheap, deterministic, and
    computable identically in any engine. Edit distance ``<= k`` forces
    a length difference ``<= k``, so with buckets of width ``k + 1``
    matching pairs sit in the same or adjacent buckets; BOTH sides
    explode into ``{bucket, bucket + 1}`` so every adjacent pair shares
    a join key (standard blocking-with-overlap — duplicates collapse in
    the final group).

    Returns ``(left_id, right_id, edit_distance)`` for verified pairs.

    ``max_block_size`` drops blocks bigger than the bound on BOTH sides
    before joining (the skew guard: a degenerate key like the empty
    string otherwise quadratically explodes one reducer).
    """
    wbucket = max_edit_distance + 1

    def keyed(df: DataFrame, id_col: str, name_col: str, out_id: str):
        norm = F.lower(F.regexp_replace(F.col(name_col), r"[^A-Za-z0-9]", ""))
        # substring truncates safely, so names SHORTER than prefix_len
        # block under their full normalized form (e.g. "t5" → "t5") and
        # remain linkable; only empty-after-normalization names drop out
        # (no usable key, and the empty block would be the degenerate
        # hot key the skew guard exists for).
        base = df.select(
            F.col(id_col).alias(out_id),
            norm.alias(f"{out_id}_norm"),
            F.substring(norm, 1, prefix_len).alias("_pfx"),
            (F.length(norm) / wbucket).cast("long").alias("_b0"),
        ).where(F.length(f"{out_id}_norm") >= 1)
        return base.withColumn(
            "_lb", F.explode(F.array(F.col("_b0"), F.col("_b0") + F.lit(1)))
        ).drop("_b0")

    l = keyed(left, left_id, left_name, "_lid")
    r = keyed(right, right_id, right_name, "_rid")
    if max_block_size is not None:
        bw = Window.partitionBy("_pfx", "_lb")
        l = (
            l.withColumn("_bn", F.count(F.lit(1)).over(bw))
            .where(F.col("_bn") <= max_block_size)
            .drop("_bn")
        )
        r = (
            r.withColumn("_bn", F.count(F.lit(1)).over(bw))
            .where(F.col("_bn") <= max_block_size)
            .drop("_bn")
        )
    pairs = l.join(r, ["_pfx", "_lb"]).select(
        F.col("_lid"),
        F.col("_rid"),
        F.levenshtein(F.col("_lid_norm"), F.col("_rid_norm")).alias("edit_distance"),
    )
    return (
        pairs.where(F.col("edit_distance") <= max_edit_distance)
        # the overlap explode reaches the same pair through two buckets
        .groupBy("_lid", "_rid")
        .agg(F.min("edit_distance").alias("edit_distance"))
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            "edit_distance",
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_expr,
    window: int = 5,
) -> DataFrame:
    """Candidate pairs within ``window`` positions of a global sort.

    Classic sorted-neighborhood blocking: rank every row by
    ``sort_expr`` (ties broken by ``id_col`` for determinism), then
    pair each row with the ``window - 1`` rows after it. Candidate
    count is linear in N and independent of value skew.

    The rank is a zero-partition window in the naive formulation; here
    it is computed scalably as a two-level rank: rows are range-
    partitioned by the sort key, ranked within partitions, and offset
    by broadcast per-partition counts — the same distributed prefix-sum
    shape as ``versioned_store.entity_chunking``. The pairing join is
    an equi-join on the rank bucket (each row joins its own and the
    next bucket, buckets sized ``window``), so no theta join appears.

    Returns ``(a_id, b_id, a_rank, b_rank)`` with ``a_rank < b_rank``.
    """
    # localCheckpoint pins the range shuffle so spark_partition_id() is
    # consistent across the two consumers (counts branch + rank branch)
    # instead of relying on exchange reuse — same recipe as
    # versioned_store.entity_chunking.
    ranked = (
        df.select(F.col(id_col), sort_expr.alias("_sk"))
        .repartitionByRange(F.col("_sk"), F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    part_rank = F.row_number().over(Window.partitionBy("_pid").orderBy("_sk", id_col))
    with_part = ranked.withColumn("_pr", part_rank)
    counts = with_part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_pid", "_off")
    # offsets has one row per partition — broadcast-joined back
    g = with_part.join(F.broadcast(offsets), "_pid").withColumn(
        "_rank", F.col("_pr") + F.col("_off")
    )
    a = g.select(
        F.col(id_col).alias("a_id"), F.col("_rank").alias("a_rank")
    ).withColumn(
        "_bkt",
        F.explode(
            F.array(
                ((F.col("a_rank") - 1) / window).cast("long"),
                ((F.col("a_rank") - 1) / window).cast("long") + 1,
            )
        ),
    )
    b = g.select(F.col(id_col).alias("b_id"), F.col("_rank").alias("b_rank")).withColumn(
        "_bkt", ((F.col("b_rank") - 1) / window).cast("long")
    )
    return (
        a.join(b, "_bkt")
        .where(
            (F.col("b_rank") > F.col("a_rank"))
            & (F.col("b_rank") - F.col("a_rank") < window)
        )
        .select("a_id", "b_id", "a_rank", "b_rank")
    )


def setsim_prefix_join(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard self-join above ``threshold`` via prefix filtering.

    PPJoin's core pruning (Xiao et al., WWW'08, public): order each
    set's tokens by ascending global frequency (rarest first, ties by
    token); if ``J(a, b) >= t`` then ``|a ∩ b| >= ceil(t/(1+t) * (|a|+|b|))``
    and in particular the two sets must share at least one token among
    each one's first ``|s| - ceil(t * |s|) + 1`` ordered tokens. So:
    explode ONLY prefix tokens, equi-join on token, dedupe candidate
    pairs, then verify the exact Jaccard with a set intersection.

    Returns ``(a_id, b_id, jaccard)`` for verified pairs, ``a < b``,
    jaccard rounded to 6 dp. Results are exactly the all-pairs answer
    (the filter is lossless), which is what the oracle computes.

    At 100 TB the win is the candidate count: frequent tokens land at
    the END of the ordering and almost never inside a prefix, so the
    explode-join avoids the hot-token quadratic blowup a naive
    token-inverted-index join suffers.
    """
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.col(tokens_col)).alias("_set"),
    ).where(F.size("_set") > 0)
    # global token frequencies (the ordering key)
    freq = (
        tok.select(F.explode("_set").alias("_tk"))
        .groupBy("_tk")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    exploded = tok.select("_id", F.size("_set").alias("_sz"), F.explode("_set").alias("_tk"))
    ordered = exploded.join(freq, "_tk").withColumn(
        "_pos",
        F.row_number().over(Window.partitionBy("_id").orderBy("_f", "_tk")),
    )
    # ceil(t * sz) with an epsilon guard: in float, 0.07 * 100 =
    # 7.000000000000001 and a bare ceil overshoots to 8, which would
    # shorten the prefix / over-tighten the length filter and drop true
    # pairs. The epsilon only matters when t * sz sits within 1e-9 of an
    # integer, i.e. exactly the representation-noise cases.
    def _ceil_t(sz):
        return F.ceil(F.lit(threshold) * sz - F.lit(1e-9))

    prefix_len = (F.col("_sz") - _ceil_t(F.col("_sz")) + F.lit(1)).cast("int")
    prefixes = ordered.where(F.col("_pos") <= prefix_len).select("_id", "_tk", "_sz")
    cands = (
        prefixes.alias("a")
        .join(prefixes.alias("b"), "_tk")
        .where(F.col("a._id") < F.col("b._id"))
        # length filter: J >= t forces t*|a| <= |b| <= |a|/t
        .where(
            (F.col("b._sz") >= _ceil_t(F.col("a._sz")))
            & (F.col("a._sz") >= _ceil_t(F.col("b._sz")))
        )
        .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"))
        .distinct()
    )
    av = tok.select(F.col("_id").alias("a_id"), F.col("_set").alias("_aset"))
    bv = tok.select(F.col("_id").alias("b_id"), F.col("_set").alias("_bset"))
    inter = F.size(F.array_intersect("_aset", "_bset"))
    uni = F.size("_aset") + F.size("_bset") - inter
    # threshold on the UNROUNDED ratio; round only for output — rounding
    # first would admit pairs up to 5e-7 below threshold.
    return (
        cands.join(av, "a_id")
        .join(bv, "b_id")
        .withColumn("_j", inter.cast("double") / uni)
        .where(F.col("_j") >= threshold)
        .select("a_id", "b_id", F.round(F.col("_j"), 6).alias("jaccard"))
    )


def golden_record(
    df: DataFrame,
    cluster_col: str,
    order_key: Column,
    fields: list[str],
) -> DataFrame:
    """Survivorship merge: collapse each linked cluster of duplicate
    records into ONE golden record, field by field — the step AFTER
    record linkage (blocked/sorted-neighborhood/PPJoin find the
    clusters; this op decides which values survive). Policy:
    latest-non-null per field ("most recent system wins"), the
    standard MDM default.

    ``order_key`` must be a single orderable column expression that
    totally orders observations within a cluster (build it from
    (timestamp, id) as e.g. ``unix_seconds·2³¹ + id`` — the caller
    owns the encoding because only the caller knows the id range).

    Exactness: per field the survivor is ``max_by(field,
    CASE WHEN field IS NOT NULL THEN order_key END)`` — rows where
    the field is null carry a null key and are ignored by the
    aggregate in Spark AND DuckDB (arg_max), so the pick is a pure
    argmax under a total order, partition-invariant by construction.

    Scale posture: ONE cluster-keyed aggregation, map-side combined;
    no window, no sort, no second scan. Returns
    ``(cluster, n_obs, last_seen_key, <fields…>)``.
    """
    key = order_key.alias("_ok")
    base = df.select(F.col(cluster_col).alias("cluster"), key, *fields)
    aggs = [
        F.count(F.lit(1)).alias("n_obs"),
        F.max("_ok").alias("last_seen_key"),
    ]
    for f in fields:
        aggs.append(
            F.max_by(
                F.col(f),
                F.when(F.col(f).isNotNull(), F.col("_ok")),
            ).alias(f)
        )
    return base.groupBy("cluster").agg(*aggs).orderBy("cluster")


def cogroup_reconcile(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_total: str,
    right_total: str,
    cents: int = 100,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-key reconciliation of two sources via COGROUPED
    ``applyInPandas`` — the Spark surface for "line up both sides of a
    key and decide with arbitrary Python" (the reference's load-side
    consistency check between its Postgres store and what the ETL
    recomputed, `LoadProcessor.py:531-545`, done row-at-a-time there).

    ``df.groupby(b).cogroup(other.groupby(b)).applyInPandas`` shuffles
    BOTH sides once and hands each group's two row-sets to one Python
    function — the right shape when the merge logic is genuinely
    imperative (schema drift, fuzzy field compare, precedence chains).
    The cogroup key is a HASH BUCKET of the entity key, not the raw
    key: cogrouped applyInPandas pays a Python invocation per group,
    so keying by entity would cost one call (plus two pandas-frame
    constructions) per key — measured 80 s for 15 k orders at sf0.01,
    i.e. per-entity Python is the anti-pattern at any scale. Bucketing
    amortizes that to ``n_buckets`` calls with a vectorized pandas
    outer-merge on the true key inside each call (0.7 s same data,
    ~110×); per-key logic stays arbitrary Python, now over the
    bucket's aligned frame. THIS check (exact totals compare in
    integer cents) is deliberately SQL-expressible so the cogroup
    machinery itself runs under a hard full-outer-join oracle; swap
    the body for the messy real-world compare and the plan is
    unchanged.

    Emits one row per key: ``status`` in {match, mismatch, left_only,
    right_only} and the signed cent difference. Totals cross the
    Arrow boundary as DECIMAL -> ``decimal.Decimal`` (exact; never a
    float — the int-cents conversion happens on the Decimal). Scale:
    one co-partitioned shuffle per side, Arrow-batched groups, output
    one row per key; n_buckets bounds Python calls, AQE splits hot
    buckets.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} long, status string, left_total double, "
        "right_total double, diff_cents long"
    )

    def to_cents(v):
        # FLOOR(v*cents) on a repr-exact Decimal (ADVICE r9): the
        # documented path feeds decimal.Decimal (exact either way),
        # but if a caller feeds a float total (out_schema permits
        # double), the old int(v*cents) would truncate
        # 10.55*100 = 1054.999... to 1054 and flag a false mismatch.
        # Decimal(str(v)) re-reads the float at its shortest repr, so
        # 10.55 -> 1055 exactly; FLOOR (not half-even) is the
        # operator's written contract — it matches the reconciliation
        # oracle's CAST(FLOOR(tot*100) AS BIGINT) on sub-cent values.
        if v is None:
            return None
        d = v if isinstance(v, decimal.Decimal) else decimal.Decimal(str(v))
        return int((d * cents).to_integral_value(rounding=decimal.ROUND_FLOOR))

    def reconcile(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        # cent columns are built dtype=object (python ints), NOT int64:
        # an outer merge would NaN-fill and upcast int64 -> float64,
        # silently rounding totals past 2^53 cents — object columns
        # keep the "exact; never a float" contract. drop_duplicates
        # preserves the one-row-per-key output contract when an input
        # side carries repeated keys (the per-key cogroup took iloc[0];
        # first-row-wins is the same rule).
        lc = pd.DataFrame(
            {
                key_col: lpdf[key_col].to_numpy(),
                "_lc": pd.Series(
                    [to_cents(v) for v in lpdf[left_total]], dtype="object"
                ),
            }
        ).drop_duplicates(key_col)
        rc = pd.DataFrame(
            {
                key_col: rpdf[key_col].to_numpy(),
                "_rc": pd.Series(
                    [to_cents(v) for v in rpdf[right_total]], dtype="object"
                ),
            }
        ).drop_duplicates(key_col)
        m = lc.merge(rc, on=key_col, how="outer")
        status, diffs = [], []
        for lv, rv in zip(m["_lc"], m["_rc"]):
            if pd.isna(lv):
                status.append("right_only"); diffs.append(None)
            elif pd.isna(rv):
                status.append("left_only"); diffs.append(None)
            else:
                d = int(lv) - int(rv)
                status.append("match" if d == 0 else "mismatch")
                diffs.append(d)
        return pd.DataFrame(
            {
                key_col: m[key_col].astype("int64"),
                "status": status,
                "left_total": [None if pd.isna(v) else int(v) / cents for v in m["_lc"]],
                "right_total": [None if pd.isna(v) else int(v) / cents for v in m["_rc"]],
                "diff_cents": diffs,
            }
        )

    bucket = F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets)).alias("_b")
    lb = left.select("*", bucket)
    rb = right.select("*", bucket)
    return (
        lb.groupby("_b")
        .cogroup(rb.groupby("_b"))
        .applyInPandas(reconcile, schema=out_schema)
    )


def fellegi_sunter_em(
    pairs: DataFrame | None,
    agreement_cols: list[str],
    iters: int = 5,
    init_prior_u: int = 100000,
    init_m_u: int = 800000,
    init_u_u: int = 300000,
    pattern_counts: DataFrame | None = None,
) -> DataFrame:
    """Fellegi-Sunter record-linkage weights by EM — the statistical
    model behind every probabilistic matcher (Splink, dedupe.io): from
    UNLABELED candidate pairs with per-field agreement booleans, learn
    each field's m-probability (agreement | match) and u-probability
    (agreement | non-match) plus the match prior, and emit the
    log2 agreement/disagreement weights a scorer sums per pair.

    The scalable move: pairs collapse to their 2^F AGREEMENT PATTERNS
    first (one map-side-combinable aggregation — the only pass over
    the pair table), and EM iterates on that metadata-sized pattern
    table. Determinism: parameters live in exact micro-units; each
    E-step weight is ONE fixed-shape double expression of quantized
    params floored back to micro-units, so every M-step statistic is
    an exact integer sum — the fixed iteration count unrolls into a
    hard SQL oracle (the Lloyd's/pagerank/ALS precedent, now for EM).
    Degenerate corners (a step with zero expected matches) keep the
    previous parameters instead of dividing by zero.

    Returns one row per field: (field, m, u, w_agree, w_disagree,
    match_prior, n_pairs).

    ``pattern_counts`` feeds the collapse result directly: a DataFrame
    with the ``agreement_cols`` (boolean) plus a long ``_n`` pair count
    per pattern, when the caller can COUNT pairs without materializing
    them (e.g. within-block agreement counts via grouping-sets +
    inclusion-exclusion — Σ_g C(n_g, 2) per field subset; guide §3.4:
    the pair stream existed only to be counted). Zero-count rows are
    dropped so the pattern table matches what the pairs path groups to.
    CONTRACT: counts must equal the pairs path's — in particular the
    counting identity treats equal NULLs as agreeing, while a pair
    stream's ``a.col == b.col`` yields NULL (→ disagree); callers must
    guarantee non-null fields (or pre-coalesce) before using this path.
    """
    S = 1000000
    n_f = len(agreement_cols)
    if (pairs is None) == (pattern_counts is None):
        raise ValueError(
            "fellegi_sunter_em: pass exactly one of pairs / pattern_counts"
        )
    if pattern_counts is not None:
        pat = (
            pattern_counts.select(
                *[
                    F.col(c).cast("boolean").alias(f"_a{i}")
                    for i, c in enumerate(agreement_cols)
                ],
                F.col("_n").cast("long").alias("_n"),
            )
            .where(F.col("_n") > 0)
        )
        pat = lazy_cap(pat)
        spark = pattern_counts.sparkSession
    else:
        pat = (
            pairs.groupBy(
                *[
                    F.col(c).cast("boolean").alias(f"_a{i}")
                    for i, c in enumerate(agreement_cols)
                ]
            )
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        pat = lazy_cap(pat)
        spark = pairs.sparkSession
    params = spark.range(1).select(
        F.lit(init_prior_u).cast("long").alias("_p"),
        *[F.lit(init_m_u).cast("long").alias(f"_m{i}") for i in range(n_f)],
        *[F.lit(init_u_u).cast("long").alias(f"_u{i}") for i in range(n_f)],
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    for _ in range(iters):
        j = pat.crossJoin(F.broadcast(params))
        pm = F.col("_p").cast("double") / F.lit(float(S))
        qu = (F.lit(S) - F.col("_p")).cast("double") / F.lit(float(S))
        for i in range(n_f):
            mf = F.col(f"_m{i}").cast("double") / F.lit(float(S))
            uf = F.col(f"_u{i}").cast("double") / F.lit(float(S))
            pm = pm * F.when(F.col(f"_a{i}"), mf).otherwise(F.lit(1.0) - mf)
            qu = qu * F.when(F.col(f"_a{i}"), uf).otherwise(F.lit(1.0) - uf)
        w = F.floor(F.lit(1000000.0) * pm / (pm + qu)).cast("long")
        jw = j.withColumn("_w", w)
        aggs = [
            F.sum("_n").alias("_sn"),
            F.sum(dec(F.col("_n")) * F.col("_w")).alias("_snw"),
            F.sum(dec(F.col("_n")) * (F.lit(S) - F.col("_w"))).alias("_snq"),
        ]
        for i in range(n_f):
            af = F.when(F.col(f"_a{i}"), 1).otherwise(0)
            aggs += [
                F.sum(dec(F.col("_n")) * F.col("_w") * af).alias(f"_snwa{i}"),
                F.sum(
                    dec(F.col("_n")) * (F.lit(S) - F.col("_w")) * af
                ).alias(f"_snqa{i}"),
            ]
        a = jw.agg(*aggs).crossJoin(F.broadcast(params))
        upd = [
            F.when(
                F.col("_sn") > 0,
                F.floor(
                    F.col("_snw").cast("double") / F.col("_sn").cast("double")
                ).cast("long"),
            )
            .otherwise(F.col("_p"))
            .alias("_p")
        ]
        for i in range(n_f):
            upd.append(
                F.when(
                    F.col("_snw") > 0,
                    F.floor(
                        F.lit(1000000.0)
                        * F.col(f"_snwa{i}").cast("double")
                        / F.col("_snw").cast("double")
                    ).cast("long"),
                )
                .otherwise(F.col(f"_m{i}"))
                .alias(f"_m{i}")
            )
        for i in range(n_f):
            upd.append(
                F.when(
                    F.col("_snq") > 0,
                    F.floor(
                        F.lit(1000000.0)
                        * F.col(f"_snqa{i}").cast("double")
                        / F.col("_snq").cast("double")
                    ).cast("long"),
                )
                .otherwise(F.col(f"_u{i}"))
                .alias(f"_u{i}")
            )
        params = lazy_cap(a.select(*upd))
    n_pairs = pat.agg(F.sum("_n").alias("n_pairs"))
    LN2 = 0.6931471805599453
    rows = []
    for i, c in enumerate(agreement_cols):
        m_u = F.col(f"_m{i}")
        u_u = F.col(f"_u{i}")
        # degenerate-corner contract: a weight is NULL when its
        # log-ratio is undefined (u=0 / m=0 for agreement, m=1 / u=1
        # for disagreement) — matching welch_t_test's NULL posture
        lr = F.when(
            (m_u > 0) & (u_u > 0),
            F.floor(
                F.log(m_u.cast("double") / u_u.cast("double"))
                * F.lit(1000000)
            ).cast("long"),
        )
        dl = F.when(
            (m_u < S) & (u_u < S),
            F.floor(
                F.log(
                    (F.lit(S) - m_u).cast("double")
                    / (F.lit(S) - u_u).cast("double")
                )
                * F.lit(1000000)
            ).cast("long"),
        )
        rows.append(
            F.struct(
                F.lit(c).alias("field"),
                F.round(m_u.cast("double") / F.lit(float(S)), 6).alias("m"),
                F.round(u_u.cast("double") / F.lit(float(S)), 6).alias("u"),
                F.round(
                    lr.cast("double") / F.lit(1000000.0) / F.lit(LN2), 6
                ).alias("w_agree"),
                F.round(
                    dl.cast("double") / F.lit(1000000.0) / F.lit(LN2), 6
                ).alias("w_disagree"),
            )
        )
    return (
        params.crossJoin(F.broadcast(n_pairs))
        .select(
            F.explode(F.array(*rows)).alias("_f"),
            F.round(F.col("_p").cast("double") / F.lit(float(S)), 6).alias(
                "match_prior"
            ),
            "n_pairs",
        )
        .select("_f.*", "match_prior", "n_pairs")
        .orderBy("field")
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    id_cols: tuple[str, str],
    str_cols: tuple[str, str],
    k: int = 2,
    q: int = 2,
) -> DataFrame:
    """R⋈S edit-distance join: all pairs with ``levenshtein ≤ k``,
    without the all-pairs cross product — the scalable fuzzy-key join
    (Gravano et al., VLDB'01 q-gram filtering) behind approximate
    identifier reconciliation across sources.

    Lossless candidate filters:

    - length:  ``| |a| − |b| | ≤ k``;
    - count:   each edit destroys ≤ q grams, so a true pair shares
      BAG-intersection ≥ ``max(|a|,|b|) − q + 1 − k·q`` q-grams —
      applied via a gram equi-join with per-string gram counts and
      ``Σ min(cnt_a, cnt_b)``;
    - short strings (``len < q·(k+1)``, where the count bound can
      degenerate to ≤ 0) pair through an exploded-length equi-join
      instead (the short row emits lengths ``len−k … len+k``; cost
      (2k+1)× the short population, no cross join). A pair takes the
      gram path only when BOTH sides reach the cutoff; a pair with
      EITHER side short takes the length path — routed from the short
      side so mixed short×long pairs are never dropped.

    Candidates then verify with one ``levenshtein`` call (built-in,
    JVM-side; identical semantics in DuckDB, so the all-pairs oracle
    is exact). Returns ``(a_id, b_id, edit_distance)``.

    Scale posture: the gram join shuffles on the gram key; global
    rarest-vs-hot gram skew is the known hazard of q-gram joins —
    near-identical key populations (serial numbers sharing long
    prefixes) degrade toward quadratic candidates, which is a property
    of the DATA, not the plan; AQE skew-split applies.
    """
    lid, rid = id_cols
    lstr, rstr = str_cols
    short_cut = q * (k + 1)  # len < short_cut → degenerate count bound

    def grams(df, idc, sc, side):
        base = df.select(
            F.col(idc).alias(f"{side}_id"),
            F.col(sc).alias(f"_{side}s"),
            F.length(F.col(sc)).alias(f"_{side}len"),
        )
        g = base.where(F.col(f"_{side}len") >= short_cut).select(
            f"{side}_id",
            f"_{side}len",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.col(f"_{side}len") - F.lit(q - 1)
                    ),
                    lambda i: F.col(f"_{side}s").substr(i, F.lit(q)),
                )
            ).alias("_g"),
        )
        return base, g.groupBy(f"{side}_id", f"_{side}len", "_g").agg(
            F.count(F.lit(1)).alias(f"_{side}cnt")
        )

    lbase, lg = grams(left, lid, lstr, "a")
    rbase, rg = grams(right, rid, rstr, "b")
    common = (
        lg.join(rg, "_g")
        .where(
            F.abs(F.col("_alen") - F.col("_blen")) <= k
        )
        .groupBy("a_id", "b_id", "_alen", "_blen")
        .agg(F.sum(F.least("_acnt", "_bcnt")).alias("_common"))
        .where(
            F.col("_common")
            >= F.greatest("_alen", "_blen") - F.lit(q - 1) - F.lit(k * q)
        )
        .select("a_id", "b_id")
    )
    # pairs with EITHER side short: exploded-length equi-join routed
    # from the short side (the gram path above requires both sides at
    # the cutoff, so a mixed short x long pair must be caught here)
    lshort = lbase.where(F.col("_alen") < short_cut).select(
        "a_id",
        F.explode(
            F.sequence(
                F.greatest(F.col("_alen") - F.lit(k), F.lit(0)),
                F.col("_alen") + F.lit(k),
            )
        ).alias("_lmatch"),
    )
    rany = rbase.select("b_id", F.col("_blen").alias("_lmatch"))
    short_a = lshort.join(rany, "_lmatch").select("a_id", "b_id")
    rshort = rbase.where(F.col("_blen") < short_cut).select(
        "b_id",
        F.explode(
            F.sequence(
                F.greatest(F.col("_blen") - F.lit(k), F.lit(0)),
                F.col("_blen") + F.lit(k),
            )
        ).alias("_lmatch"),
    )
    llong = lbase.where(F.col("_alen") >= short_cut).select(
        "a_id", F.col("_alen").alias("_lmatch")
    )
    short_b = rshort.join(llong, "_lmatch").select("a_id", "b_id")
    cands = common.unionByName(short_a).unionByName(short_b).distinct()
    return (
        cands.join(lbase.select("a_id", "_as"), "a_id")
        .join(rbase.select("b_id", "_bs"), "b_id")
        .withColumn("edit_distance", F.levenshtein("_as", "_bs"))
        .where(F.col("edit_distance") <= k)
        .select("a_id", "b_id", "edit_distance")
    )


def b_cubed(
    df: DataFrame,
    item_col: str,
    pred_col: str,
    gold_col: str,
) -> DataFrame:
    """B-cubed clustering evaluation (Bagga & Baldwin 1998) — the
    standard entity-resolution / dedup-cluster quality metric that,
    unlike pairwise F1, weights every ITEM equally: per item,
    precision is the fraction of its predicted cluster sharing its
    gold cluster, recall the fraction of its gold cluster sharing its
    predicted cluster; both average over items.

    Exact-arithmetic shape: per-item sums collapse to contingency
    CELLS — for cell (p, g) with n_pg items, each contributes
    ``n_pg / n_p`` precision, so B3-precision = sum n_pg^2 / n_p / N.
    Cell terms quantize to ``floor(n_pg^2 * 1e6 / n_p)`` integer
    micros BEFORE summing (exact in double below 2^53), so the
    aggregation is an integer fold; F1 composes from the ROUNDED
    precision/recall (compose-from-rounded rule), NULL when both are
    zero.

    Plan shape: one (pred, gold) cell count (map-side combined,
    bounded by the contingency table), two marginal aggregations over
    cells, one single-row rollup — no windows, no self-joins. Returns
    one row: (n_items, b3_precision, b3_recall, b3_f1).
    """
    cell = df.groupBy(
        F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g")
    ).agg(F.count(F.lit(1)).alias("_npg"))
    psz = cell.groupBy("_p").agg(F.sum("_npg").alias("_np"))
    gsz = cell.groupBy("_g").agg(F.sum("_npg").alias("_ng"))
    terms = (
        cell.join(psz, "_p")
        .join(gsz, "_g")
        .select(
            "_npg",
            F.floor(
                (F.col("_npg") * F.col("_npg") * F.lit(1000000)).cast(
                    "double"
                )
                / F.col("_np").cast("double")
            ).cast("long").alias("_pm"),
            F.floor(
                (F.col("_npg") * F.col("_npg") * F.lit(1000000)).cast(
                    "double"
                )
                / F.col("_ng").cast("double")
            ).cast("long").alias("_rm"),
        )
    )
    agg = terms.agg(
        F.sum("_npg").alias("n_items"),
        F.sum("_pm").alias("_pmic"),
        F.sum("_rm").alias("_rmic"),
    )
    pr = agg.select(
        "n_items",
        F.round(
            F.col("_pmic").cast("double")
            / F.lit(1000000.0)
            / F.col("n_items").cast("double"),
            6,
        ).alias("b3_precision"),
        F.round(
            F.col("_rmic").cast("double")
            / F.lit(1000000.0)
            / F.col("n_items").cast("double"),
            6,
        ).alias("b3_recall"),
    )
    return pr.select(
        "n_items",
        "b3_precision",
        "b3_recall",
        F.when(
            F.col("b3_precision") + F.col("b3_recall") > 0,
            F.round(
                2
                * F.col("b3_precision")
                * F.col("b3_recall")
                / (F.col("b3_precision") + F.col("b3_recall")),
                6,
            ),
        ).alias("b3_f1"),
    )
