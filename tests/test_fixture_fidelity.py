"""Fixture-fidelity golden-state test for the G2 + V2-V5 spine.

Re-encodes the reference's crown-jewel scenario
(``tests/unit/hf/load/test_GraphHandler.py:263-313``): load the
provenance-wrapped fixture
(``tests/fixtures/data/hf_transformed_fair4ml_example_small_1.json``)
into the versioned store, assert the golden table counts, then re-load
the *changed* fixture (``…_small_2.json``) and assert the update
choreography:

    fresh load:    16 triplets / 2 models / 16 ranges / 2 infos / 0 deprecated
    changed load:  19 triplets / 2 models / 20 ranges / 3 infos / 3 deprecated

The wide frame carries the reference's cell shape (SURVEY §1.1): each
property is ``array<struct<data, extraction_method, confidence,
extraction_time>>``. Row→triples follows ``GraphHandlerForDF.py:140-230``
(rdf:type + name literal + entity URIs with space→underscore minting +
date literal), with property handling driven by the Range column of
``data/configuration/hf/transform/FAIR4ML_schema.tsv`` (mlTask/sharedBy/
trainedOn are entity-ranged; name is Text; datePublished is Date).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators import versioned_store as vs

# Cell payloads re-encoded from the reference fixtures (data normalized
# to array<string>; scalar cells are 1-element arrays). Two models:
# audio_set and sentence-transformers.
_P = "Parsed_from_HF_dataset"
_T1 = "2024-07-16_09-14-40"
_T2 = "2025-07-16_09-14-40"


import pytest

pytestmark = pytest.mark.slow


def _cell(data, method=_P, conf=1.0, ts=_T1):
    return [(data, method, conf, ts)]


def _batch_rows(ts, m1_tasks, m1_shared_method, m2_shared, m2_train0):
    return [
        {
            "name": _cell(["audio_set"], ts=ts),
            "mlTask": _cell(m1_tasks, ts=ts),
            "sharedBy": _cell(["MIT"], method=m1_shared_method, ts=ts),
            "datePublished": _cell(["2022-03-02 23:29:05+00:00"], ts=ts),
            "trainedOn": _cell(["imagenet-1k"], ts=ts),
        },
        {
            "name": _cell(["sentence-transformers"], ts=ts),
            "mlTask": _cell(["feature extraction", "sentence similarity"], ts=ts),
            "sharedBy": _cell([m2_shared], ts=ts),
            "datePublished": _cell(["2022-03-02 23:29:05+00:00"], ts=ts),
            "trainedOn": _cell(
                [m2_train0, "flax-sentence-embeddings/stackexchange_xml", "ms_marco", "gooaq"],
                conf=0.9,
                ts=ts,
            ),
        },
    ]


# fixture small_1 vs small_2: model-1 mlTask gains "sound regression",
# model-1 sharedBy re-extracted by a new method, model-2 sharedBy
# changes to "MIT 2.0", model-2 trainedOn "s2orc" becomes "s2o".
BATCH_1 = _batch_rows(_T1, ["sound classification"], _P, "MIT", "s2orc")
BATCH_2 = _batch_rows(
    _T2,
    ["sound classification", "sound regression"],
    "NEWWWWW_parsed_from_HF_dataset",
    "MIT 2.0",
    "s2o",
)

_PROV = (
    "array<struct<data:array<string>,extraction_method:string,"
    "confidence:double,extraction_time:string>>"
)
_WIDE_SCHEMA = ", ".join(
    f"`{c}` {_PROV}" for c in ("name", "mlTask", "sharedBy", "datePublished", "trainedOn")
)

# Range-driven handling per FAIR4ML_schema.tsv (entity ranges mint URIs,
# Text stays literal, Date stays a typed literal).
ENTITY_PROPS = {"mlTask": "fair4ml:mlTask", "sharedBy": "fair4ml:sharedBy", "trainedOn": "fair4ml:trainedOn"}
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _uri(col):
    return F.concat(F.lit("mlentory:/hf/"), F.replace(col, F.lit(" "), F.lit("_")))


def _observations(spark, rows):
    """Wide provenance-wrapped frame → long (s,p,o,method,confidence,
    extraction_time) observations, the melt→dispatch of the load spine."""
    wide = spark.createDataFrame(
        [tuple(r[c] for c in ("name", "mlTask", "sharedBy", "datePublished", "trainedOn")) for r in rows],
        _WIDE_SCHEMA,
    )
    subj = _uri(F.col("name")[0]["data"][0])
    keyed = wide.select(subj.alias("subject"), "*")

    def _explode(col, predicate, obj_expr, one_value=False):
        prov = F.explode(F.col(f"`{col}`")).alias("prov")
        base = keyed.select("subject", prov)
        vals = base.select(
            "subject",
            (F.col("prov.data")[0] if one_value else F.explode(F.col("prov.data"))).alias("v"),
            "prov.extraction_method",
            "prov.confidence",
            "prov.extraction_time",
        )
        return vals.select(
            "subject",
            F.lit(predicate).alias("predicate"),
            obj_expr(F.col("v")).alias("object"),
            F.col("extraction_method"),
            F.col("confidence"),
            F.to_timestamp("extraction_time", "yyyy-MM-dd_HH-mm-ss").alias("extraction_time"),
        )

    # rdf:type triple carries the name cell's provenance (GraphHandlerForDF.py:148-153)
    parts = [
        _explode("name", RDF_TYPE, lambda v: F.lit("fair4ml:MLModel"), one_value=True),
        _explode("name", "schema.org:name", lambda v: v, one_value=True),
        _explode("datePublished", "schema.org:datePublished", lambda v: v, one_value=True),
    ]
    for col, pred in ENTITY_PROPS.items():
        parts.append(_explode(col, pred, _uri))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _counts(state):
    return {
        "triplets": state.triplet.count(),
        "models": state.triplet.select("subject").distinct().count(),
        "ranges": state.version_range.count(),
        "infos": state.extraction_info.count(),
        "deprecated": state.version_range.where("deprecated").count(),
    }


def test_reference_golden_counts(spark):
    state = vs.empty_state(spark)
    state = vs.materialized(vs.merge_batch(state, _observations(spark, BATCH_1)))
    assert _counts(state) == {
        "triplets": 16,
        "models": 2,
        "ranges": 16,
        "infos": 2,
        "deprecated": 0,
    }
    # all fresh ranges open at the batch time, none deprecated
    t1 = "2024-07-16 09:14:40"
    assert (
        state.version_range.where(
            (F.col("use_start") == F.lit(t1).cast("timestamp"))
            & (F.col("use_end") == F.lit(t1).cast("timestamp"))
        ).count()
        == 16
    )

    state = vs.materialized(vs.merge_batch(state, _observations(spark, BATCH_2)))
    assert _counts(state) == {
        "triplets": 19,
        "models": 2,
        "ranges": 20,
        "infos": 3,
        "deprecated": 3,
    }
    # the deprecated ranges are exactly: model-1 sharedBy/MIT under the
    # OLD extraction info (re-extracted by a new method), model-2
    # sharedBy/MIT, model-2 trainedOn/s2orc
    dep = {
        (r.subject, r.predicate)
        for r in state.version_range.where("deprecated")
        .select("triplet_hash", "subject")
        .join(state.triplet.select("triplet_hash", "predicate"), "triplet_hash")
        .collect()
    }
    assert dep == {
        ("mlentory:/hf/audio_set", "fair4ml:sharedBy"),
        ("mlentory:/hf/sentence-transformers", "fair4ml:sharedBy"),
        ("mlentory:/hf/sentence-transformers", "fair4ml:trainedOn"),
    }
    # touched unchanged triples extended to the new batch time, still open
    t2 = "2025-07-16 09:14:40"
    open_extended = state.version_range.where(
        (~F.col("deprecated")) & (F.col("use_end") == F.lit(t2).cast("timestamp"))
    )
    assert open_extended.count() == 17  # 13 carried + 4 inserted


def test_reference_golden_counts_add_new_model(spark):
    """The reference's add-new-models scenario
    (``test_GraphHandler.py:318-344``, fixture ``…_small_3.json``):
    a third model (distilbert: type+name+1 task+sharedBy+date+2
    trainedOn = 7 triples) joins, sentence-transformers re-observes
    unchanged, audio_set is absent from the batch — nothing deprecates:
    23 triplets / 3 models / 23 ranges / 2 infos / 0 deprecated."""
    t3 = "2026-07-16_09-14-40"
    batch_3 = [
        {
            "name": _cell(["distilbert"], ts=t3),
            "mlTask": _cell(["fill mask"], ts=t3),
            "sharedBy": _cell(["distilbert"], ts=t3),
            "datePublished": _cell(["2022-03-02 23:29:05+00:00"], ts=t3),
            "trainedOn": _cell(["bookcorpus", "wikipedia"], ts=t3),
        },
        {
            "name": _cell(["sentence-transformers"], ts=t3),
            "mlTask": _cell(["feature extraction", "sentence similarity"], ts=t3),
            "sharedBy": _cell(["MIT"], ts=t3),
            "datePublished": _cell(["2022-03-02 23:29:05+00:00"], ts=t3),
            "trainedOn": _cell(
                ["s2orc", "flax-sentence-embeddings/stackexchange_xml", "ms_marco", "gooaq"],
                conf=0.9,
                ts=t3,
            ),
        },
    ]
    state = vs.empty_state(spark)
    state = vs.materialized(vs.merge_batch(state, _observations(spark, BATCH_1)))
    state = vs.materialized(vs.merge_batch(state, _observations(spark, batch_3)))
    assert _counts(state) == {
        "triplets": 23,
        "models": 3,
        "ranges": 23,
        "infos": 2,
        "deprecated": 0,
    }
    # audio_set was absent from batch 3: its ranges stay open at t1
    t1 = "2024-07-16 09:14:40"
    stale_open = state.version_range.where(
        (F.col("subject") == "mlentory:/hf/audio_set")
        & (F.col("use_end") == F.lit(t1).cast("timestamp"))
        & (~F.col("deprecated"))
    )
    assert stale_open.count() == 6


def test_out_of_order_batch_is_time_guarded(spark):
    """The reference's 4th scenario (``test_GraphHandler.py:345-393``)
    loads batches out of chronological order: small_1 (2024) → small_3
    (2026) → small_2 (2025). Its deprecation predicate is time-guarded
    (``vr.use_end < curr_update_date``, GraphHandler.py:319-345), so the
    2025 batch cannot deprecate ranges already extended to 2026 by the
    2026 batch; our merge implements the same guard plus monotone
    use_end.

    Counts follow the reference's CODE: 26 triplets / 3 models / 27
    ranges / 3 infos and exactly ONE deprecation — audio_set's
    sharedBy/MIT under the old extraction info (use_end 2024 < 2025,
    re-extracted by a new method in the 2025 batch). The reference
    test file's literal expectation of 0 deprecations contradicts its
    own guard for that row (the fixture suite needs live
    postgres/virtuoso/elastic and the constant appears stale); we
    assert the code-derived semantics.
    """
    t3 = "2026-07-16_09-14-40"
    batch_3 = [
        {
            "name": _cell(["distilbert"], ts=t3),
            "mlTask": _cell(["fill mask"], ts=t3),
            "sharedBy": _cell(["distilbert"], ts=t3),
            "datePublished": _cell(["2022-03-02 23:29:05+00:00"], ts=t3),
            "trainedOn": _cell(["bookcorpus", "wikipedia"], ts=t3),
        },
        {
            "name": _cell(["sentence-transformers"], ts=t3),
            "mlTask": _cell(["feature extraction", "sentence similarity"], ts=t3),
            "sharedBy": _cell(["MIT"], ts=t3),
            "datePublished": _cell(["2022-03-02 23:29:05+00:00"], ts=t3),
            "trainedOn": _cell(
                ["s2orc", "flax-sentence-embeddings/stackexchange_xml", "ms_marco", "gooaq"],
                conf=0.9,
                ts=t3,
            ),
        },
    ]
    state = vs.empty_state(spark)
    state = vs.materialized(vs.merge_batch(state, _observations(spark, BATCH_1)))
    state = vs.materialized(vs.merge_batch(state, _observations(spark, batch_3)))
    state = vs.materialized(vs.merge_batch(state, _observations(spark, BATCH_2)))
    assert _counts(state) == {
        "triplets": 26,
        "models": 3,
        "ranges": 27,
        "infos": 3,
        "deprecated": 1,
    }
    # the 2026 observations survive the older 2025 batch untouched
    t26 = "2026-07-16 09:14:40"
    survived = state.version_range.where(
        (F.col("subject") == "mlentory:/hf/sentence-transformers")
        & (F.col("use_end") == F.lit(t26).cast("timestamp"))
        & (~F.col("deprecated"))
    )
    assert survived.count() == 10


def test_reference_golden_counts_idempotent_reload(spark):
    """Re-loading the same fixture must change nothing but use_end
    (the reference's test_small_graph_update_same_models precondition)."""
    state = vs.empty_state(spark)
    state = vs.materialized(vs.merge_batch(state, _observations(spark, BATCH_1)))
    state = vs.materialized(vs.merge_batch(state, _observations(spark, BATCH_1)))
    assert _counts(state) == {
        "triplets": 16,
        "models": 2,
        "ranges": 16,
        "infos": 2,
        "deprecated": 0,
    }
