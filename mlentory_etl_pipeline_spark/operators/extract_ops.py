"""Extract-stage row-level operators (SURVEY §2.2 F1–F8, §2.3 T1/T3).

All pure Column expressions → full Catalyst pushdown: the quality
filter lands in ``PushedFilters`` of the parquet scan, pagination is a
global-sort TopK (Spark runs it as a per-partition TakeOrdered + final
merge, no full shuffle sort for small N).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_filter(
    df: DataFrame,
    text_col: str = "card",
    required_cols: tuple[str, ...] = (),
    min_len: int = 200,
    boilerplate_marker: str = "[More Information Needed]",
    max_marker_count: int = 38,
) -> DataFrame:
    """F1 — the reference's model-card quality filter
    (``HFDatasetManager.py:717-799``): drop rows with missing required
    fields, short text, or "default card" boilerplate (≥N markers).

    The marker count is ``(len(text) - len(replace(text, marker))) /
    len(marker)`` — a pure expression, no UDF (the reference uses a
    row-wise ``df.apply``).
    """
    text = F.col(text_col)
    marker_count = (
        F.length(text) - F.length(F.replace(text, F.lit(boilerplate_marker), F.lit("")))
    ) / F.lit(len(boilerplate_marker))
    cond = text.isNotNull() & (F.length(text) >= min_len) & (marker_count < max_marker_count)
    for c in required_cols:
        cond = cond & F.col(c).isNotNull()
    return df.where(cond)


def paginate(df: DataFrame, order_by: list[Column], offset: int, limit: int) -> DataFrame:
    """F2 — deterministic offset/limit pagination
    (``HFDatasetManager.py:234-241``). Requires a total order (pass
    tie-breaking columns)."""
    return df.orderBy(*order_by).offset(offset).limit(limit)


def top_n_recent(df: DataFrame, ts_col: str, n: int, tiebreak: str | None = None) -> DataFrame:
    """F3 — top-N recency trim (``HFDatasetManager.py:226-233``).
    Runs as TakeOrderedAndProject — no global sort materialized."""
    order = [F.desc(ts_col)] + ([F.asc(tiebreak)] if tiebreak else [])
    return df.orderBy(*order).limit(n)


def classify_tokens(
    df: DataFrame,
    id_cols: list[str],
    tokens_col: Column,
    classes: dict[str, list[str] | None],
    default_class: str | None = None,
) -> DataFrame:
    """T1 — tag-set classification (``ModelCardToSchemaParser.py:296-398``).

    Explode the token array, route each token into a class by vocabulary
    membership (vocab sets are literal/broadcast — they are tiny config
    tables), then fold back to one sorted distinct array per class.
    One shuffle (the groupBy); collect_set is map-side combined.

    ``classes``: ordered mapping class → vocabulary (None = fallback).
    """
    tok = F.explode(tokens_col).alias("_tok")
    exploded = df.select(*id_cols, tok)
    expr = None
    for cls, vocab in classes.items():
        if vocab is None:
            continue
        cond = F.col("_tok").isin(*vocab)
        expr = F.when(cond, F.lit(cls)) if expr is None else expr.when(cond, F.lit(cls))
    fallback = F.lit(default_class) if default_class else F.lit(None)
    exploded = exploded.withColumn("_cls", expr.otherwise(fallback) if expr is not None else fallback)
    aggs = [
        F.array_sort(
            F.array_distinct(F.collect_list(F.when(F.col("_cls") == cls, F.col("_tok"))))
        ).alias(cls)
        for cls in classes
        if classes[cls] is not None or default_class == cls
    ]
    if default_class and default_class not in classes:
        aggs.append(
            F.array_sort(
                F.array_distinct(
                    F.collect_list(F.when(F.col("_cls") == default_class, F.col("_tok")))
                )
            ).alias(default_class)
        )
    return exploded.groupBy(*id_cols).agg(*aggs)


def harvest_related(df: DataFrame, cols: list[str]) -> DataFrame:
    """T3 — union the values of several array columns into one distinct
    set of (kind, name) rows (``HFExtractor.py:365-402``): melt + explode
    + distinct."""
    parts = [
        df.select(F.lit(c).alias("kind"), F.explode_outer(F.col(c)).alias("name"))
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.col("name").isNotNull()).distinct()


def frontier_diff(refs: DataFrame, seen: DataFrame, key: str) -> DataFrame:
    """T4 — one round of the recursive base-model crawl
    (``HFExtractor.py:105-107``): referenced ids not yet processed =
    left-anti join. The BFS driver loops this until the frontier is
    empty; each round is one distributed anti-join, never a driver set."""
    return refs.join(seen, key, "left_anti")


def canonicalize_licenses(
    df: DataFrame,
    license_col: str,
    spdx_ref: DataFrame,
    ref_key: str = "alias",
) -> DataFrame:
    """S6 — SPDX license canonicalization as a broadcast join against a
    static reference table (the reference calls ``spdx_lookup`` per
    string, ``HFExtractor.py:612-667``). Match key is
    ``lower(trim(license))``; unmatched licenses keep their cleaned
    input with a null spdx_id."""
    cleaned = df.withColumn("_lic_key", F.lower(F.trim(F.col(license_col))))
    ref = F.broadcast(spdx_ref.withColumnRenamed(ref_key, "_lic_key"))
    return (
        cleaned.join(ref, "_lic_key", "left")
        .withColumn(
            "license_canonical", F.coalesce(F.col("spdx_id"), F.col("_lic_key"))
        )
        .drop("_lic_key")
    )


def coalesce_side_input(
    primary: DataFrame,
    side: DataFrame,
    key: str,
    cols: list[str],
    side_suffix: str = "_scraped",
) -> DataFrame:
    """S9 — merge a scraped/side-input table over API values:
    ``coalesce(scraped, api)`` per column after a left join on the key
    (``OpenMLExtractor.py:522-534``). The side input is broadcast — it
    is a per-batch scrape, small by construction."""
    renamed = side.select(
        F.col(key), *[F.col(c).alias(c + side_suffix) for c in cols]
    )
    out = primary.join(F.broadcast(renamed), key, "left")
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c + side_suffix), F.col(c))).drop(
            c + side_suffix
        )
    return out


def semi_join_fetch(
    df: DataFrame,
    wanted: DataFrame,
    key: str,
    last_by: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """S3 — specific-id fetch: restrict to requested ids (left-semi
    join) then dedup keeping the latest row per id
    (``HFDatasetManager.py:316-385``; ``drop_duplicates(keep="last")``
    at ``:384``). keep-last = one ``max_by`` aggregation on
    ``(last_by, tiebreak)`` — no window sort."""
    hit = df.join(wanted.select(key), key, "left_semi")
    order = F.struct(
        F.col(last_by), *( [F.col(tiebreak)] if tiebreak else [] )
    )
    payload = [c for c in df.columns]
    return (
        hit.groupBy(key)
        .agg(F.max_by(F.struct(*payload), order).alias("_r"))
        .select(*[F.col(f"_r.{c}").alias(c) for c in payload])
    )


YAML_META_SCHEMA = (
    "license string, license_name string, conditions_of_access string, "
    "yaml_error string"
)


def parse_yaml_front_matter(
    df: DataFrame, card_col: str, out_col: str = "card_meta"
) -> DataFrame:
    """T2 — YAML front-matter parse (``ModelCardToSchemaParser.py:
    400-506``): extract the leading ``---…---`` block, ``yaml.safe_load``
    it, and pull ``license`` / ``license_name`` / ``extra_gated_prompt``
    (→ conditionsOfAccess). One Arrow-batched pandas_udf — yaml parsing
    is the one part of T2 that genuinely needs Python (SURVEY §2.9);
    the downstream SPDX canonicalization is :func:`canonicalize_licenses`.

    Malformed YAML never kills the batch: the struct carries a
    ``yaml_error`` field instead (the reference wraps the parse in a
    bare try/except).
    """
    import re as _re

    import pandas as pd
    from pyspark.sql.types import StructType

    out_type = StructType.fromDDL(YAML_META_SCHEMA)
    fm_re = _re.compile(r"^---\s*\n(.*?)\n---", _re.DOTALL)

    # no inner type annotations: `from __future__ import annotations`
    # stringifies them and pandas_udf's signature inference rejects that
    @F.pandas_udf(out_type)
    def run(cards):
        import yaml

        rows = []
        for card in cards:
            lic = name = cond = err = None
            m = fm_re.match(card or "")
            if m:
                try:
                    data = yaml.safe_load(m.group(1))
                    if isinstance(data, dict):
                        lic = data.get("license")
                        if isinstance(lic, list):
                            lic = ", ".join(str(x) for x in lic)
                        elif lic is not None:
                            lic = str(lic)
                        name = data.get("license_name")
                        name = None if name is None else str(name)
                        cond = data.get("extra_gated_prompt")
                        cond = None if cond is None else str(cond)
                except Exception as e:  # malformed YAML -> error column
                    # class name only: message text varies across pyyaml
                    # versions, and the error column is a signal, not a log
                    err = type(e).__name__
            rows.append((lic, name, cond, err))
        return pd.DataFrame(
            rows, columns=["license", "license_name", "conditions_of_access", "yaml_error"]
        )

    return df.withColumn(out_col, run(F.col(card_col)))


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Classify every key across two snapshots of the same table:
    ``added`` (after only), ``removed`` (before only), ``changed``
    (both, compared columns differ), ``unchanged`` — the generic
    frame-vs-frame diff behind every ingestion audit and reconciliation
    report (the SCD2 store answers "what changed WHEN"; this answers
    "what differs between these two snapshots", no history required).
    Keys must be unique within each snapshot.

    One full-outer hash join on the keys; the column comparison is a
    null-safe md5 over the compared columns computed map-side BEFORE
    the join (16-byte hashes shuffle instead of wide rows, and the
    sentinel separators keep NULL distinct from '' and from column
    boundaries — engine-replicable, so a SQL oracle verifies the
    classification bit-for-bit). Returns ``(*keys, change_type)``.
    """

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        content = F.md5(
            F.concat_ws(
                "\x01",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in compare_cols
                ],
            )
        )
        return df.select(*keys, content.alias(alias))

    b = hashed(before, "_hb")
    a = hashed(after, "_ha")
    joined = b.join(a, keys, "full_outer")
    change = (
        F.when(F.col("_hb").isNull(), F.lit("added"))
        .when(F.col("_ha").isNull(), F.lit("removed"))
        .when(F.col("_hb") != F.col("_ha"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*keys, change.alias("change_type"))


def skyline_2d(
    df,
    maximize,
    minimize,
    id_col: str,
):
    """2-D skyline (Pareto frontier): rows not DOMINATED by any other
    — another row dominates if it is ≥ on the maximized dimension, ≤
    on the minimized one, and strictly better on at least one. The
    classic multi-criteria shortlist (best price-for-size, best
    quality-for-cost) that no single ORDER BY can express.

    Scalable 2-D formulation (not the quadratic all-pairs test): with
    mp[s] = min(minimize | maximize = s) and M[s] = min over s' > s of
    mp[s'], a row survives iff its cost equals mp[s] (nothing cheaper
    at the same level — equal-cost ties all survive, mutual
    non-domination) and beats every higher level (M[s] NULL or cost <
    M[s]). Exact comparisons only — no arithmetic at all, so the
    result is engine-identical by construction.

    Scale posture: one maximize-keyed aggregation (|levels| rows out,
    map-side combinable), ONE running-min window over the bounded
    level domain (metadata-sized — allowlisted, never corpus-sized),
    one broadcast join back; the dominance test is a per-row filter.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col), maximize.alias("_mx"), minimize.alias("_mn")
    ).where(F.col("_mx").isNotNull() & F.col("_mn").isNotNull())
    mp = base.groupBy("_mx").agg(F.min("_mn").alias("_mp"))
    # mp holds ONE row per level, so a ROWS frame ending 1 before the
    # current row is exactly "all strictly greater levels" — valid for
    # any orderable level type (a RANGE -1 frame would need integers)
    w = Window.orderBy(F.desc("_mx")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    levels = mp.withColumn("_hi", F.min("_mp").over(w))
    return (
        base.join(F.broadcast(levels), "_mx")
        .where(
            (F.col("_mn") == F.col("_mp"))
            & (F.col("_hi").isNull() | (F.col("_mn") < F.col("_hi")))
        )
        .select(
            F.col(id_col),
            F.col("_mx").alias("max_dim"),
            F.col("_mn").alias("min_dim"),
        )
        .orderBy(F.desc("max_dim"), F.asc("min_dim"), F.asc(id_col))
    )
