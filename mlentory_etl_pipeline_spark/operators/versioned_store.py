"""SCD2 temporal versioned triple store — the reference's load layer
re-expressed as declarative DataFrame MERGE logic.

Covers SURVEY §2.6 V2–V7 and the query surface Q7–Q10:

- V2 triplet get-or-create  (``GraphHandler.py:455-546``)  → left-anti + union
- V3 extraction-info get-or-create (``GraphHandler.py:548-633``) → same
- V4 version-range upsert   (``GraphHandler.py:635-714``)  → outer-join MERGE
- V5 deprecate changed subjects (``GraphHandler.py:372-419``)
- V6 touch unchanged        (``GraphHandler.py:348-370``)
- V7 current-graph delta publish (``GraphHandler.py:78-177``)
- Q7 current graph, Q8 counts, Q10 point-in-time history

Design (SURVEY §7.0): everything is keyed by *content hashes* —
``triplet_hash = md5(s+p+o)``, ``info_hash = md5(method+conf)`` — so
upserts are idempotent set operations and the keys double as shuffle
keys. No sequences, no driver-side state.

Scale posture: each merge is a handful of hash-partitioned joins on
``triplet_hash``; the store tables should be bucketed/partitioned by a
prefix of the hash at lake scale so successive merges co-locate. The
batch side is typically ≪ the store side → Spark picks broadcast or
shuffled-hash joins via AQE; nothing here materializes to the driver.

The merge core is *pure* (state-in → state-out DataFrames): the
persistence wrapper (:class:`VersionedTripleStore`) adds parquet
round-trips with atomic directory swap (a stand-in for Delta ACID —
on a real lake these writes become ``MERGE INTO`` on Delta/Iceberg).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.functions.hashing import (
    extraction_info_hash,
    triplet_hash,
)

TRIPLET_SCHEMA = "triplet_hash string, subject string, predicate string, object string"
INFO_SCHEMA = (
    "info_hash string, extraction_method string, extraction_confidence double"
)
RANGE_SCHEMA = (
    "triplet_hash string, info_hash string, subject string, "
    "use_start timestamp, use_end timestamp, deprecated boolean"
)

BATCH_COLUMNS = (
    "subject",
    "predicate",
    "object",
    "extraction_method",
    "confidence",
    "extraction_time",
)


@dataclass
class StoreState:
    """The three versioned tables (SURVEY §1.3 / ``init.sql:4-26``)."""

    triplet: DataFrame
    extraction_info: DataFrame
    version_range: DataFrame


def _empty_df(spark: SparkSession, schema: str):
    """Empty DataFrame as a true empty LocalRelation.

    ``spark.createDataFrame([], schema)`` goes through the Python-RDD
    path and scans an opaque ExistingRDD — the optimizer cannot prove
    it empty, so every join against a fresh store runs a real
    shuffle+SortMergeJoin. ``SELECT … LIMIT 0`` folds to an empty
    LocalRelation (OptimizeLimitZero), and PropagateEmptyRelation then
    collapses first-load joins to nothing.
    """
    cols = ", ".join(
        f"CAST(NULL AS {c.rsplit(' ', 1)[1]}) AS {c.rsplit(' ', 1)[0]}"
        for c in schema.split(", ")
    )
    return spark.sql(f"SELECT {cols} LIMIT 0")


def empty_state(spark: SparkSession) -> StoreState:
    return StoreState(
        triplet=_empty_df(spark, TRIPLET_SCHEMA),
        extraction_info=_empty_df(spark, INFO_SCHEMA),
        version_range=_empty_df(spark, RANGE_SCHEMA),
    )


def with_hashes(batch: DataFrame) -> DataFrame:
    """Attach content-hash keys to a raw (s, p, o, method, confidence,
    extraction_time) batch.

    One ``select("*", …)`` instead of two ``withColumn`` calls: each
    DataFrame op is a Py4J round-trip plus a JVM analysis pass over the
    whole tree, and this constructor sits inside every SCD2 merge
    (guide §1.2 "per-task work" applies to the driver too — measured
    ~85 ms → ~45 ms per call). Expressions unchanged."""
    return batch.select(
        "*",
        triplet_hash(
            F.col("subject"), F.col("predicate"), F.col("object")
        ).alias("triplet_hash"),
        extraction_info_hash(
            F.col("extraction_method"), F.col("confidence")
        ).alias("info_hash"),
    )


def disambiguate_statements(batch: DataFrame) -> DataFrame:
    """G9 statement-metadata disambiguation
    (``MlentoryTransformWithGraphBuilder.py:466-487``): for duplicate
    (s, p, o) keep the provenance with max confidence, ties broken by
    max extraction_time.

    ``max_by`` over a struct = single map-side-combinable aggregation —
    one shuffle on ``triplet_hash``, no window sort.
    """
    prov = F.struct(
        F.col("confidence"),
        F.col("extraction_time"),
        F.col("extraction_method"),
        F.col("info_hash"),
    )
    return (
        batch.groupBy("triplet_hash", "subject", "predicate", "object")
        .agg(F.max(prov).alias("p"))
        .selectExpr(
            "triplet_hash",
            "subject",
            "predicate",
            "object",
            "p.extraction_method AS extraction_method",
            "p.confidence AS confidence",
            "p.extraction_time AS extraction_time",
            "p.info_hash AS info_hash",
        )
    )


# ---- merge_batch SQL bodies (r10 §2: one parse+analysis per output
# table instead of ~28 chained DataFrame ops per merge, each of which
# is a Py4J round-trip plus an eager JVM analysis over the growing
# tree — measured 0.73 s of pure construction per 2-merge fold before,
# ~0.2 s after, identical Catalyst expressions).
#
# The disambiguated-batch constructor (with_hashes +
# disambiguate_statements fused into 4 ops of SQL text — same md5
# content hashes, same max(struct) G9 argmax with the lexicographic
# (confidence, extraction_time, extraction_method, info_hash)
# tie-break) deliberately stays on the DataFrame API rather than a
# temp-view SQL statement: its plan must be IDENTICAL across calls so
# the CacheManager dedups repeated merges of the same batch (warm
# bench runs, scenario folds). A per-call uuid view name inside the
# plan defeats sameResult and forced a re-materialization of the
# shuffle+agg on every call (measured: flagship warm exec 0.7 → 1.6 s
# before this was caught).
_MERGE_HASH_PROV_EXPRS = (
    "md5(concat(CAST(subject AS STRING), CAST(predicate AS STRING), "
    "CAST(object AS STRING))) AS triplet_hash",
    "subject",
    "predicate",
    "object",
    "named_struct("
    "'confidence', confidence, "
    "'extraction_time', extraction_time, "
    "'extraction_method', extraction_method, "
    "'info_hash', md5(concat(CAST(extraction_method AS STRING), "
    "format_number(CAST(confidence AS DOUBLE), 5)))"
    ") AS _prov",
)
_MERGE_DISAMBIG_OUT_EXPRS = (
    "triplet_hash",
    "subject",
    "predicate",
    "object",
    "p.extraction_method AS extraction_method",
    "p.confidence AS confidence",
    "p.extraction_time AS extraction_time",
    "p.info_hash AS info_hash",
)

# V2: store ∪ (batch anti-join store) on the content hash.
_MERGE_TRIPLET_SQL = """
SELECT triplet_hash, subject, predicate, object FROM {st}
UNION ALL
SELECT b.triplet_hash, b.subject, b.predicate, b.object
FROM {b} b LEFT ANTI JOIN {st} st ON b.triplet_hash = st.triplet_hash
"""

# V3: first() per info_hash is exactly what dropDuplicates(["info_hash"])
# compiles to (ReplaceDeduplicateWithAggregate).
_MERGE_INFO_SQL = """
SELECT info_hash, extraction_method, extraction_confidence FROM {si}
UNION ALL
SELECT d.info_hash, d.extraction_method, d.extraction_confidence
FROM (
  SELECT info_hash, first(extraction_method) AS extraction_method,
         first(confidence) AS extraction_confidence
  FROM {b} GROUP BY info_hash
) d LEFT ANTI JOIN {si} si ON d.info_hash = si.info_hash
"""

# V4+V5+V6 over the range table in TWO scans instead of three (r11,
# guide §2.4 fewer passes / §1.2 fewest-passes-first): the former body
# scanned {vr} three times (opened-join, anti-join for new ranges,
# deprecated passthrough) and unioned three branches — for a fold,
# every consumer of merge k re-executed merge k-1's subtree three
# times, and at 100 TB the range table would be read thrice per merge.
# The deprecated passthrough now folds into the main LEFT JOIN branch
# as CASE arms: the `AND NOT o.deprecated` join condition keeps
# deprecated rows unmatched (their touched counterpart, if any, still
# gets its fresh range from the anti-join branch, which was always
# against OPEN ranges only), and the joins stay broadcast-able — a
# FULL OUTER single-scan variant was measured and REJECTED: it forces
# a sort-merge join where this shape keeps broadcast hash joins (warm
# exec 0.7-1.0 s → 1.4-1.7 s at sf0.1).
# __ELSE_END__ is substituted per touch_unchanged BEFORE the formatter
# runs (str.format would eat the {b}/{vr} placeholders).
_MERGE_RANGE_SQL_TEMPLATE = """
WITH bt AS (SELECT max(extraction_time) AS _bt FROM {b}),
     touched AS (SELECT triplet_hash, info_hash, subject, true AS _touched FROM {b}),
     bsubj AS (
       SELECT subject, true AS _subj_in_batch
       FROM (SELECT DISTINCT subject FROM {b})
     )
SELECT /*+ BROADCAST(bt) */
       o.triplet_hash, o.info_hash, o.subject, o.use_start,
       CASE WHEN o.deprecated THEN o.use_end
            WHEN t._touched THEN greatest(o.use_end, bt._bt)
            WHEN coalesce(s._subj_in_batch, false) THEN o.use_end
            ELSE __ELSE_END__ END AS use_end,
       CASE WHEN o.deprecated THEN true
            ELSE (coalesce(s._subj_in_batch, false)
                  AND (NOT coalesce(t._touched, false))
                  AND o.use_end < bt._bt) END AS deprecated
FROM {vr} o
LEFT JOIN (SELECT triplet_hash, info_hash, _touched FROM touched) t
       ON o.triplet_hash = t.triplet_hash AND o.info_hash = t.info_hash
      AND NOT o.deprecated
LEFT JOIN bsubj s ON o.subject = s.subject
CROSS JOIN bt
UNION ALL
SELECT /*+ BROADCAST(bt) */
       t.triplet_hash, t.info_hash, t.subject,
       bt._bt AS use_start, bt._bt AS use_end, false AS deprecated
FROM touched t
LEFT ANTI JOIN (SELECT triplet_hash, info_hash FROM {vr} WHERE NOT deprecated) o
       ON t.triplet_hash = o.triplet_hash AND t.info_hash = o.info_hash
CROSS JOIN bt
"""
_MERGE_RANGE_SQL = _MERGE_RANGE_SQL_TEMPLATE.replace("__ELSE_END__", "o.use_end")
_MERGE_RANGE_SQL_TOUCH = _MERGE_RANGE_SQL_TEMPLATE.replace(
    "__ELSE_END__", "greatest(o.use_end, bt._bt)"
)


def _sql_on(spark: SparkSession, template: str, **dfs: DataFrame) -> DataFrame:
    """Run one SQL statement over DataFrame inputs, each exposed as a
    uuid-named GLOBAL temp view for the duration of the call.

    Global (not session-local) views because the SCD2 merge crosses
    sessions in the streaming path: ``foreachBatch`` hands merge_batch a
    micro-batch DataFrame owned by the stream's *cloned* session while
    the store state belongs to the outer one — a session-local view
    registered on one is unresolvable from the other, which is exactly
    how PySpark's ``spark.sql(..., df=df)`` formatter fails here.
    Views are dropped before returning; the returned DataFrame's plan
    is already analyzed, so the drop cannot invalidate it (the same
    contract the stock formatter relies on). The drop goes through the
    JVM SessionCatalog directly, NOT ``spark.catalog.dropGlobalTempView``:
    the Catalog-API wrapper also UNCACHES any cache entry whose plan
    sameResults the dropped view, which silently evicted the merge's
    cached disambiguated batch (measured as a re-materialization of
    its shuffle+agg on every downstream action)."""
    names: dict[str, str] = {}
    try:
        for k, df in dfs.items():
            n = "_vs_" + uuid.uuid4().hex
            df.createOrReplaceGlobalTempView(n)
            names[k] = "global_temp." + n
        return spark.sql(template.format(**names))
    finally:
        jcatalog = spark._jsparkSession.sessionState().catalog()
        for qualified in names.values():
            jcatalog.dropGlobalTempView(qualified.split(".", 1)[1])


def merge_batch(
    state: StoreState,
    batch: DataFrame,
    touch_unchanged: bool = False,
) -> StoreState:
    """One incremental load (the reference's ``update_graph`` V-sequence).

    ``batch`` columns: subject, predicate, object, extraction_method,
    confidence, extraction_time.

    Semantics (matching ``GraphHandler.py`` — see module docstring):

    1. batch is disambiguated (G9) so each (s,p,o) appears once;
    2. ``batch_time`` = max extraction_time in the batch
       (``GraphHandlerForKG.py:206-215``);
    3. unseen triplets / infos are appended (V2/V3, is_new = anti-join);
    4. per (triplet_hash, info_hash): an open non-deprecated range gets
       ``use_end = batch_time``; otherwise a fresh ``[t, t]`` range is
       inserted (V4);
    5. subjects present in the batch have their *untouched* open ranges
       flagged ``deprecated`` (V5) — the triple was dropped from the
       entity's current description;
    6. optionally, open ranges of subjects *not* in the batch get
       ``use_end`` advanced too (V6 — the reference's "touch unchanged
       models"; off by default because advancing validity without
       observation is a policy choice, not an invariant).
    """
    et = {f.name: f.dataType.simpleString() for f in batch.schema.fields}.get(
        "extraction_time"
    )
    if et not in ("timestamp", "timestamp_ntz"):
        raise TypeError(
            f"merge_batch: extraction_time must be a timestamp, got {et!r} "
            "(raw parquet ns-timestamps read as long? route through "
            "sources.tpch.load_table or cast explicitly)"
        )
    # The whole merge is FOUR spark.sql statements (r10 §2): one
    # parse+analysis per output table instead of ~28 chained DataFrame
    # ops, each of which was a Py4J round-trip plus an eager JVM
    # analysis over the growing tree. The SQL bodies above reproduce
    # the former per-op composition node for node:
    #   - disambiguation = with_hashes + disambiguate_statements
    #     (same md5 hashes, same max(struct) argmax);
    #   - V2/V3 anti-join appends (first() per info_hash is the exact
    #     ReplaceDeduplicateWithAggregate form of dropDuplicates);
    #   - V4+V5+V6 single pass over the open ranges, with the same
    #     out-of-order guard (the reference's ``vr.use_end <
    #     curr_update_date``, GraphHandler.py:319-345): a late batch
    #     neither regresses use_end (greatest keeps it monotone) nor
    #     deprecates ranges its batch-time has not passed. batch_time
    #     stays IN-PLAN as a broadcast 1-row aggregate (no collect, a
    #     fold of N batches issues no blocking job per batch).
    # The disambiguated batch feeds the batch-time scan plus four
    # joins: cache it so the shuffle+agg runs once.
    spark = batch.sparkSession
    b = (
        batch.selectExpr(*_MERGE_HASH_PROV_EXPRS)
        .groupBy("triplet_hash", "subject", "predicate", "object")
        .agg(F.expr("max(_prov)").alias("p"))
        .selectExpr(*_MERGE_DISAMBIG_OUT_EXPRS)
        .cache()
    )
    triplet = _sql_on(spark, _MERGE_TRIPLET_SQL, b=b, st=state.triplet)
    extraction_info = _sql_on(spark, _MERGE_INFO_SQL, b=b, si=state.extraction_info)
    version_range = _sql_on(
        spark,
        _MERGE_RANGE_SQL_TOUCH if touch_unchanged else _MERGE_RANGE_SQL,
        b=b,
        vr=state.version_range,
    )

    return StoreState(triplet=triplet, extraction_info=extraction_info, version_range=version_range)


# ---------------------------------------------------------------- queries

def current_graph(state: StoreState) -> DataFrame:
    """Q7 — triples having an open, non-deprecated range
    (the reference's Virtuoso "current" named graph, V7)."""
    open_hashes = (
        state.version_range.where(~F.col("deprecated"))
        .select("triplet_hash")
        .distinct()
    )
    return state.triplet.join(open_hashes, "triplet_hash").select(
        "subject", "predicate", "object"
    )


def reified_current_export(
    state: StoreState,
    subject_prefix: str = "",
    predicate_prefix: str = "",
    meta_namespace: str = "https://w3id.org/mlentory/mlentory_graph/meta/",
) -> DataFrame:
    """G7 end-to-end — export the CURRENT graph with its REAL stored
    provenance as reified StatementMetadata N-Triples: the store's
    columnar provenance (``extraction_info`` + the open range's
    ``use_start``) is what the reference spreads across 7 meta-triples
    per fact (``GraphBuilderBase.py:103-180``,
    ``GraphHandler.py:78-148``); this reassembles exactly those lines
    so an external SPARQL store ingests provenance the reference's
    consumers can query.

    Plan: open non-deprecated ranges → one provenance pick per triplet
    (``max_by``-style struct max on (use_start, info_hash) — a
    map-side-combinable aggregation, no window), hash-join to the
    triplet and info tables (all keyed by content hashes — co-
    partitionable at scale), then the pure formatting
    select+explode of
    :func:`~mlentory_etl_pipeline_spark.operators.graph.reified_ntriples`.
    Prefixes turn the store's raw ids into URIs at the export boundary
    (the store stays id-typed).
    """
    from mlentory_etl_pipeline_spark.operators.graph import reified_ntriples

    pick = (
        state.version_range.where(~F.col("deprecated"))
        .groupBy("triplet_hash")
        .agg(F.max(F.struct("use_start", "info_hash")).alias("_r"))
    )
    shaped = (
        state.triplet.join(pick, "triplet_hash")
        .join(
            state.extraction_info,
            F.col("_r.info_hash") == state.extraction_info.info_hash,
        )
        .select(
            F.concat(F.lit(subject_prefix), F.col("subject")).alias("subject"),
            F.concat(F.lit(predicate_prefix), F.col("predicate")).alias("predicate"),
            "object",
            F.lit(False).alias("object_is_uri"),
            "extraction_method",
            F.col("extraction_confidence").alias("confidence"),
            F.col("_r.use_start").alias("extraction_time"),
        )
    )
    return reified_ntriples(shaped, meta_namespace)


def deprecated_graph(state: StoreState) -> DataFrame:
    """The deprecated named graph (feeds the reference's S14 delta-delete)."""
    dep = state.version_range.groupBy("triplet_hash").agg(
        F.min(F.when(~F.col("deprecated"), F.lit(0)).otherwise(F.lit(1))).alias("_all_dep")
    )
    return (
        state.triplet.join(dep.where(F.col("_all_dep") == 1), "triplet_hash")
        .select("subject", "predicate", "object")
    )


def graph_at(state: StoreState, ts) -> DataFrame:
    """Q10 point-in-time query: triples valid at ``ts``
    (``use_start <= ts <= use_end`` — deprecated ranges were still valid
    inside their interval).

    ``ts`` may be a scalar timestamp or a 1-row/1-col DataFrame (e.g.
    ``events.agg(F.max("ts"))``): the DataFrame form joins in-plan as a
    broadcast 1-row aggregate — same pattern as ``merge_batch``'s
    batch-time — so deriving the point from data costs no driver
    ``collect()``."""
    if isinstance(ts, DataFrame):
        pit = F.broadcast(ts.toDF("_pit"))
        ranges = state.version_range.crossJoin(pit)
        t = F.col("_pit").cast("timestamp")
    else:
        ranges = state.version_range
        t = F.lit(ts).cast("timestamp")
    valid = (
        ranges.where((F.col("use_start") <= t) & (F.col("use_end") >= t))
        .select("triplet_hash")
        .distinct()
    )
    return state.triplet.join(valid, "triplet_hash").select("subject", "predicate", "object")


def history(state: StoreState, subject: str) -> DataFrame:
    """Q10 audit trail for one subject: every version range with its
    provenance."""
    return (
        state.triplet.where(F.col("subject") == subject)
        .join(state.version_range.drop("subject"), "triplet_hash")
        .join(state.extraction_info, "info_hash")
        .select(
            "subject",
            "predicate",
            "object",
            "use_start",
            "use_end",
            "deprecated",
            "extraction_method",
            "extraction_confidence",
        )
    )


def changes_between(state: StoreState, t1, t2, net: bool = False) -> DataFrame:
    """Change-data-feed over the store: every triple whose lifecycle
    changed in ``(t1, t2]``, labelled ``added`` (a range opened) or
    ``removed`` (a range was deprecated with its final ``use_end`` in
    the window). This is the incremental face of the S14 delta publish
    (``RDFHandler.py:112-144``): a downstream graph/index consumer
    replays exactly these rows instead of re-reading the current graph.

    Window semantics (``net=False``, the EVENT FEED): ``added`` = a
    range opened in ``(t1, t2]``; ``removed`` = a deprecated range
    whose final ``use_end`` (its last sighting — deprecation itself
    stamps no time in this store) lies in ``[t1, t2)``: the triple was
    still current at t1 but is gone by t2. A triple that CHURNS inside
    the window (added then removed, or removed then re-added) carries
    BOTH labels — the feed reports lifecycle events, so a set-replaying
    consumer cannot reconstruct the endpoint graph from it alone.
    NULL bounds follow the same contract as net mode: a NULL ``t1``
    reads as -infinity (everything up to ``t2`` is in the window) and a
    NULL ``t2`` reads as covers-nothing (empty feed).

    ``net=True`` emits the NET point-in-time diff instead (the Delta
    CDF "net changes" shape): ``added`` = valid at t2 but not at t1,
    ``removed`` = valid at t1 but not at t2 — validity as
    :func:`graph_at` defines it. Intra-window churn collapses to its
    net effect (at most one row per triple), so the replay identity
    ``graph_at(t2) == (graph_at(t1) - removed) + added`` holds EXACTLY
    (property-tested in ``tests/test_api.py``). Use this mode to keep
    a downstream copy of the graph consistent; use the event feed to
    audit what happened.

    One pass over version_range (range-pruned at lake scale when the
    table is partitioned on use_start/deprecated), one join to attach
    the triple terms, hash-keyed (net mode: one hash aggregation over
    version_range instead of two filtered distincts — same exchange).
    ``t1``/``t2`` may be scalars or 1-row/1-col DataFrames (broadcast
    in-plan — the ``graph_at`` / ``merge_batch`` batch-time pattern,
    no driver collect).
    """
    ranges = state.version_range
    if isinstance(t1, DataFrame):
        ranges = ranges.crossJoin(F.broadcast(t1.toDF("_lo")))
        lo = F.col("_lo").cast("timestamp")
    else:
        lo = F.lit(t1).cast("timestamp")
    if isinstance(t2, DataFrame):
        ranges = ranges.crossJoin(F.broadcast(t2.toDF("_hi")))
        hi = F.col("_hi").cast("timestamp")
    else:
        hi = F.lit(t2).cast("timestamp")
    if net:
        # coalesce: a NULL bound (e.g. max(ts) over an empty pre-split
        # slice) must read as "covers nothing", not poison the whole
        # comparison — with t1 NULL the correct net diff is "everything
        # valid at t2 is added", which the <=/>= NULL semantics would
        # otherwise silently turn into an empty result (r9 review).
        covers_lo = (F.col("use_start") <= lo) & (F.col("use_end") >= lo)
        covers_hi = (F.col("use_start") <= hi) & (F.col("use_end") >= hi)
        validity = ranges.groupBy("triplet_hash").agg(
            F.max(F.coalesce(covers_lo.cast("int"), F.lit(0))).alias("_at_lo"),
            F.max(F.coalesce(covers_hi.cast("int"), F.lit(0))).alias("_at_hi"),
        )
        delta = validity.where(F.col("_at_lo") != F.col("_at_hi")).select(
            "triplet_hash",
            F.when(F.col("_at_hi") == 1, F.lit("added"))
            .otherwise(F.lit("removed"))
            .alias("change"),
        )
        return delta.join(state.triplet, "triplet_hash").select(
            "subject", "predicate", "object", "change"
        )
    # Event-feed NULL-bound contract (mirrors net mode, r9 ADVICE): a
    # NULL lo (e.g. max(ts) over an empty pre-split slice) reads as
    # "-infinity" — every event up to hi is in the window — instead of
    # use_start > NULL silently emptying the feed. A NULL hi already
    # reads as "covers nothing" (both <= hi predicates go UNKNOWN →
    # empty feed), which is the correct mirror of net mode's empty
    # graph_at(NULL); no special-casing needed for it.
    after_lo_open = F.coalesce(F.col("use_start") > lo, lo.isNull())
    after_lo_closed = F.coalesce(F.col("use_end") >= lo, lo.isNull())
    added = (
        ranges.where(after_lo_open & (F.col("use_start") <= hi))
        .select("triplet_hash")
        .distinct()
        .withColumn("change", F.lit("added"))
    )
    removed = (
        ranges.where(
            F.col("deprecated") & after_lo_closed & (F.col("use_end") < hi)
        )
        .select("triplet_hash")
        .distinct()
        .withColumn("change", F.lit("removed"))
    )
    return (
        added.unionByName(removed)
        .join(state.triplet, "triplet_hash")
        .select("subject", "predicate", "object", "change")
    )


def vacuum_closed_ranges(state: StoreState, cutoff) -> StoreState:
    """Retention vacuum: drop deprecated ranges that closed before
    ``cutoff``, then drop triplets/infos no surviving range references.

    The reference never garbage-collects its Version_Range table — it
    grows monotonically (init.sql has no retention DDL and
    ``GraphHandler.py`` only ever inserts/updates). At lake scale that
    is untenable: the audit trail dominates storage. This keeps the
    SCD2 semantics intact for everything inside the retention horizon
    (``graph_at(t)`` is unchanged for ``t >= cutoff``; ``current_graph``
    is unchanged for any cutoff since open ranges are never dropped).

    Plan shape: one filter over version_range + two left-semi joins to
    prune the dimension tables — all hash-keyed on content hashes, no
    window, no driver state. On Delta/Iceberg this is a partition drop
    when version_range is partitioned by ``deprecated`` +
    ``date(use_end)``.
    """
    t = F.lit(cutoff).cast("timestamp")
    kept_ranges = state.version_range.where(
        ~F.col("deprecated") | (F.col("use_end") >= t)
    )
    live_triplets = kept_ranges.select("triplet_hash").distinct()
    live_infos = kept_ranges.select("info_hash").distinct()
    return StoreState(
        triplet=state.triplet.join(live_triplets, "triplet_hash", "left_semi"),
        extraction_info=state.extraction_info.join(live_infos, "info_hash", "left_semi"),
        version_range=kept_ranges,
    )


def counts(state: StoreState) -> DataFrame:
    """Q8-style store statistics."""
    return (
        current_graph(state)
        .agg(
            F.countDistinct("subject").alias("n_subjects"),
            F.count(F.lit(1)).alias("n_triples"),
        )
    )


# ---------------------------------------------------------- persistence

class VersionedTripleStore:
    """Parquet-backed persistence for :class:`StoreState`.

    Writes go to a temp dir then atomically swap into place — a local
    stand-in for Delta/Iceberg ACID commits (SURVEY §7.0 decision 3).
    At lake scale, swap this class for ``MERGE INTO`` statements; the
    pure merge logic above is unchanged.
    """

    TABLE_NAMES = ("triplet", "extraction_info", "version_range")

    def __init__(self, spark: SparkSession, path: str, keep_snapshots: int = 0):
        """``keep_snapshots > 0`` archives that many previous table
        versions under ``snapshots/v{N}/`` on every commit — the plain-
        parquet stand-in for Delta/Iceberg snapshot time travel
        (``VERSION AS OF``). Store-level travel complements the SCD2
        row-level history: ``graph_at(ts)`` answers "what was true at
        t", ``state_at_version(n)`` answers "what did the STORE say
        before commit n+1" (e.g. to diff or roll back a bad load)."""
        self.spark = spark
        self.path = path
        self.keep_snapshots = keep_snapshots
        os.makedirs(path, exist_ok=True)

    def _table_path(self, name: str) -> str:
        return os.path.join(self.path, name)

    def _snap_root(self) -> str:
        return os.path.join(self.path, "snapshots")

    def state(self) -> StoreState:
        if not os.path.exists(self._table_path("triplet")):
            return empty_state(self.spark)
        return StoreState(
            *(self.spark.read.parquet(self._table_path(n)) for n in self.TABLE_NAMES)
        )

    def versions(self) -> list[int]:
        """Archived snapshot versions, oldest first (empty when
        ``keep_snapshots == 0`` or nothing committed yet)."""
        root = self._snap_root()
        if not os.path.isdir(root):
            return []
        return sorted(
            int(d[1:]) for d in os.listdir(root) if d.startswith("v")
        )

    def state_at_version(self, version: int) -> StoreState:
        """Read an archived snapshot (``VERSION AS OF`` analogue)."""
        base = os.path.join(self._snap_root(), f"v{version}")
        if not os.path.isdir(base):
            raise ValueError(
                f"no snapshot v{version}; available: {self.versions()}"
            )
        return StoreState(
            *(self.spark.read.parquet(os.path.join(base, n)) for n in self.TABLE_NAMES)
        )

    def _write(self, state: StoreState) -> None:
        # Two-phase commit: materialize EVERY table to a temp dir first
        # (the new plans still read the old files — e.g. the new
        # version_range joins the old triplet table), then swap all.
        tmps = []
        for name, df in zip(
            self.TABLE_NAMES,
            (state.triplet, state.extraction_info, state.version_range),
        ):
            tmp = os.path.join(tempfile.gettempdir(), f"vts-{name}-{uuid.uuid4().hex}")
            # Keep files chunky: the store tables are small relative to
            # the cluster; at lake scale partition by hash prefix instead.
            df.coalesce(max(1, df.rdd.getNumPartitions() // 8)).write.mode(
                "overwrite"
            ).parquet(tmp)
            tmps.append((name, tmp))
        snap_dir = None
        if self.keep_snapshots > 0 and os.path.exists(self._table_path("triplet")):
            version = (self.versions() or [-1])[-1] + 1
            snap_dir = os.path.join(self._snap_root(), f"v{version}")
            os.makedirs(snap_dir, exist_ok=True)
        for name, tmp in tmps:
            target = self._table_path(name)
            old = target + ".old"
            if os.path.exists(target):
                os.rename(target, old)
            shutil.move(tmp, target)
            if snap_dir is not None and os.path.exists(old):
                os.rename(old, os.path.join(snap_dir, name))
            else:
                shutil.rmtree(old, ignore_errors=True)
        # retention: keep only the newest keep_snapshots versions
        for v in self.versions()[: -self.keep_snapshots or None]:
            shutil.rmtree(
                os.path.join(self._snap_root(), f"v{v}"), ignore_errors=True
            )

    def load_batch(self, batch: DataFrame, touch_unchanged: bool = False) -> StoreState:
        new_state = merge_batch(self.state(), batch, touch_unchanged=touch_unchanged)
        self._write(new_state)
        return self.state()


def entity_chunking(
    triples: DataFrame,
    chunk_size: int = 1000,
    meta_multiplier: int = 7,
    subject_col: str = "subject",
    range_partitions: int | None = None,
) -> DataFrame:
    """V8 — entity-colocated chunk assignment
    (``LoadProcessor.py:162-288``): all triples of one subject land in
    the same chunk; a chunk is cut when accumulated ``triples × 7``
    reaches ``chunk_size`` (7 = metadata fan-out per fact,
    ``LoadProcessor.py:240``).

    The reference's greedy sequential cut becomes a prefix-sum over
    subjects: ``chunk_id = floor(preceding_weight / chunk_size)`` —
    deterministic, order-insensitive to input partitioning, and each
    chunk still holds whole subjects. Returns one row per subject:
    ``(subject, n_triples, chunk_id)``.

    The prefix sum is DISTRIBUTED — never a global single-partition
    window:

    1. per-subject counts are ``repartitionByRange`` over the subject
       (range pid order == subject order, so global order is preserved
       across partitions);
    2. each range computes its local running sum in parallel (window
       partitioned by range id);
    3. per-range totals (one row per range) turn into cumulative
       offsets via a tiny triangular self-join — no single-partition
       WindowExec anywhere in the plan — and broadcast back.

    The result is boundary-independent: wherever the range sampler cuts,
    offset + local prefix equals the global prefix. Scales to any
    |subjects|: the only per-row work is one range shuffle + one local
    window; the offset side is |ranges| rows.
    """
    from pyspark.sql import Window

    counts_df = triples.groupBy(F.col(subject_col).alias("subject")).agg(
        F.count(F.lit(1)).alias("n_triples")
    )
    if range_partitions is None:
        range_partitions = int(
            triples.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    # localCheckpoint: ranged counts feed both the main pass and the
    # totals pass — pin them so the groupBy+range shuffle runs once.
    ranged = (
        counts_df.repartitionByRange(range_partitions, "subject")
        .withColumn("_rng", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("_rng")
        .orderBy("subject")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_prec = F.coalesce(F.sum("n_triples").over(w_local), F.lit(0))

    totals = ranged.groupBy("_rng").agg(F.sum("n_triples").alias("_tot"))
    offsets = (
        totals.alias("a")
        .join(totals.alias("b"), F.col("b._rng") < F.col("a._rng"), "left")
        .groupBy(F.col("a._rng").alias("_rng"))
        .agg(F.coalesce(F.sum("b._tot"), F.lit(0)).alias("_off"))
    )
    preceding = F.col("_off") + local_prec
    return (
        ranged.join(F.broadcast(offsets), "_rng")
        .select(
            "subject",
            "n_triples",
            F.floor(preceding * meta_multiplier / chunk_size).cast("int").alias("chunk_id"),
        )
    )


def materialized(state: StoreState, eager: bool = False) -> StoreState:
    """Truncate plan lineage between incremental loads.

    Each :func:`merge_batch` references every state table in several
    joins; folding N batches without materializing re-executes batch
    k's joins once per downstream branch — the plan grows
    super-linearly. ``localCheckpoint`` pins the computed partitions on
    the executors (the in-memory analogue of the parquet round-trip
    :class:`VersionedTripleStore` does), keeping each fold O(batch).
    """
    return StoreState(
        triplet=state.triplet.localCheckpoint(eager=eager),
        extraction_info=state.extraction_info.localCheckpoint(eager=eager),
        version_range=state.version_range.localCheckpoint(eager=eager),
    )
