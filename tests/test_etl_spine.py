"""End-to-end ETL spine (the reference's integration test,
``tests/integration/pipeline/test_HF_etl.py:149-225``, rebuilt): a wide
extract frame flows melt → range dispatch → side-entity minting →
versioned store (two loads, second with a changed value) → QueryInterface
reads → N-Triples serialization, asserting golden counts at each stage.
One lazy plan family end to end — the only actions are the asserts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.api import QueryInterface
from mlentory_etl_pipeline_spark.functions.hashing import entity_uri
from mlentory_etl_pipeline_spark.metrics import PhaseTimer, observed
from mlentory_etl_pipeline_spark.operators import graph as graph_ops
from mlentory_etl_pipeline_spark.operators import versioned_store as vs
from mlentory_etl_pipeline_spark.operators.melt import (
    melt,
    mint_side_entities,
    range_dispatch,
)
from mlentory_etl_pipeline_spark.operators.search import build_search_docs

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)


def _wide(spark, license_of_m2="mit"):
    return spark.createDataFrame(
        [
            ("hf/m1", "m1", "https://huggingface.co/hf/m1", "2021-03-01", "apache-2.0", "SQuAD"),
            ("hf/m2", "m2", "https://huggingface.co/hf/m2", "2022-07-15", license_of_m2, "GLUE"),
        ],
        "model_id string, name string, url string, date_created string, "
        "license string, trained_on string",
    )


def _schema(spark):
    return spark.createDataFrame(
        [
            ("name", "Text"),
            ("url", "URL"),
            ("date_created", "Date"),
            ("license", "CreativeWork"),
            ("trained_on", "Dataset"),
        ],
        "property string, range string",
    )


def _triples(spark, wide):
    schema = _schema(spark)
    long = melt(
        wide.withColumn("subject", entity_uri("hf", "Model", F.col("model_id"))),
        ["subject"],
        ["name", "url", "date_created", "license", "trained_on"],
    )
    plain = range_dispatch(
        long.where(F.col("property").isin("name", "url", "date_created")),
        schema,
    ).select("subject", F.col("property").alias("predicate"), "object", "object_is_uri")
    minted = mint_side_entities(long, schema)
    return plain.unionByName(minted)


def test_etl_spine_end_to_end(spark, tmp_path):
    timer = PhaseTimer()

    with timer.phase("transform"):
        triples = _triples(spark, _wide(spark))
        # 2 models × 3 plain props + 2 models × 2 entity links
        # + 4 side entities × 2 (type+name) = 18
        assert triples.count() == 18

    with timer.phase("load"):
        batch = triples.select(
            "subject",
            "predicate",
            "object",
            F.lit("Parsed_from_HF_dataset").alias("extraction_method"),
            F.lit(1.0).alias("confidence"),
            F.lit(T0).cast("timestamp").alias("extraction_time"),
        )
        inst, obs = observed(batch, "load1")
        store = vs.VersionedTripleStore(spark, str(tmp_path / "store"))
        store.load_batch(inst)
        assert obs.get["n_rows"] == 18

    docs = build_search_docs(
        _wide(spark).withColumn(
            "subject", entity_uri("hf", "Model", F.col("model_id"))
        ),
        "subject",
        "name",
        facet_cols=["license"],
    )
    qi = QueryInterface(store, docs)

    # -- read surface after first load
    assert qi.current_graph().count() == 18
    c = qi.counts().collect()[0]
    assert c.n_triples == 18 and c.n_subjects == 6  # 2 models + 4 side entities
    m1 = entity_uri("hf", "Model", F.lit("hf/m1"))
    m1_uri = spark.range(1).select(m1.alias("u")).collect()[0].u
    assert qi.history(m1_uri).count() == 5
    assert qi.search_prefix("m1", facets={"license": "apache-2.0"}).count() == 1

    # -- second load: m2's license changes → old link + its side triples
    #    for the orphaned license stay, link deprecates
    with timer.phase("reload"):
        triples2 = _triples(spark, _wide(spark, license_of_m2="bsd-3-clause"))
        batch2 = triples2.select(
            "subject",
            "predicate",
            "object",
            F.lit("Parsed_from_HF_dataset").alias("extraction_method"),
            F.lit(1.0).alias("confidence"),
            F.lit(T1).cast("timestamp").alias("extraction_time"),
        )
        store.load_batch(batch2)

    state = store.state()
    # new license entity: 2 new side triples + 1 changed link = 3 new triplets
    assert state.triplet.count() == 21
    # the old m2→mit link deprecated (its subject m2 was in batch 2);
    # mit's side triples keep open ranges (subject "mit" not re-observed)
    dep = state.version_range.where("deprecated").count()
    assert dep == 1
    cur = {(r.subject, r.predicate, r.object) for r in qi.current_graph().collect()}
    mit_uri = spark.range(1).select(
        entity_uri("hf", "CreativeWork", F.lit("mit")).alias("u")
    ).collect()[0].u
    m2_uri = spark.range(1).select(
        entity_uri("hf", "Model", F.lit("hf/m2")).alias("u")
    ).collect()[0].u
    assert (m2_uri, "license", mit_uri) not in cur
    bsd_links = [t for t in cur if t[0] == m2_uri and t[1] == "license"]
    assert len(bsd_links) == 1

    # -- point-in-time: at T0 the mit link was valid
    at_t0 = {(r.subject, r.predicate, r.object) for r in qi.graph_at(T0).collect()}
    assert (m2_uri, "license", mit_uri) in at_t0

    # -- change-data-feed between the two loads: the re-linked license
    #    shows as added, the dropped link as removed
    feed = {(r.subject, r.predicate, r.object, r.change)
            for r in qi.changes_between(T0, T1).collect()}
    assert any(s == m2_uri and p == "license" and c == "added" for s, p, o, c in feed)
    assert (m2_uri, "license", mit_uri, "removed") in feed

    # -- serialize the current graph to N-Triples (S12)
    nt = graph_ops.to_ntriples(
        qi.current_graph().select(
            "subject",
            "predicate",
            "object",
            F.col("object").rlike("^https?://").alias("object_is_uri"),
        )
    )
    lines = [r[0] for r in nt.collect()]
    assert len(lines) == len(cur)
    assert all(line.endswith(" .") for line in lines)

    # timings recorded for every phase (the reference's per-phase logs)
    assert {"transform", "load", "reload"} <= set(timer.timings)
