"""Stateful streaming: applyInPandasWithState running aggregates and
foreachBatch→SCD2 merge, both asserted for stream/batch parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators import versioned_store as vs
from mlentory_etl_pipeline_spark.streaming.stateful import (
    running_entity_stats,
    stream_into_store,
)

SF = "/root/testdata/sf0.001"


def test_running_stats_stream_batch_parity(spark, tmp_path):
    events = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "value")
        .where("user_id < 10")
    )
    src = str(tmp_path / "src")
    # several files → several micro-batches with maxFilesPerTrigger=1
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_entity_stats(stream)
        .writeStream.format("memory")
        .queryName("running_stats_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress is not None

    out = spark.table("running_stats_test")
    # last emitted update per key == the full-history aggregate
    final = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in out.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("m"))
        .select("user_id", "m.n_events", "m.total_value")
        .collect()
    }
    expected = {
        r.user_id: (r.n, round(r.total, 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert final == expected


def _events_as_triples(events):
    return events.select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("subject"),
        F.col("event_type").alias("predicate"),
        F.col("value").cast("string").alias("object"),
        F.lit("stream").alias("extraction_method"),
        F.lit(0.9).alias("confidence"),
        F.col("ts").alias("extraction_time"),
    )


def test_foreach_batch_merge_parity(spark, tmp_path):
    from mlentory_etl_pipeline_spark.sources.tpch import load_table

    # load_table normalizes the parquet ns-timestamps to TimestampType —
    # merge_batch's contract requires extraction_time: timestamp
    events = (
        load_table(spark, SF, "events")
        .where("user_id < 6")
        .orderBy("ts")
        .limit(200)
    )
    triples = _events_as_triples(events).cache()

    # batch path: one merge of everything
    batch_state = vs.merge_batch(vs.empty_state(spark), triples)
    batch_current = {
        (r.subject, r.predicate, r.object)
        for r in vs.current_graph(batch_state).collect()
    }

    # stream path: the same rows drained through foreachBatch
    src = str(tmp_path / "stream-src")
    triples.coalesce(1).write.parquet(src)
    store = vs.VersionedTripleStore(spark, str(tmp_path / "store"))
    stream = spark.readStream.schema(triples.schema).parquet(src)
    q = stream_into_store(stream, store, str(tmp_path / "stream-ckpt"))
    q.awaitTermination(120)

    stream_state = store.state()
    stream_current = {
        (r.subject, r.predicate, r.object)
        for r in vs.current_graph(stream_state).collect()
    }
    assert stream_current == batch_current
    assert (
        stream_state.triplet.count() == batch_state.triplet.count()
    )
    # replaying the same data is a no-op on the triple set (idempotent
    # content-hash merge) — version ranges may advance, triples don't
    store.load_batch(triples)
    assert store.state().triplet.count() == batch_state.triplet.count()


def test_rule_compile_errors(spark):
    import pytest

    from mlentory_etl_pipeline_spark.operators.rules import Rule, apply_rules

    df = spark.range(3).select(F.col("id").alias("x"))
    with pytest.raises(ValueError, match="unknown transformation function"):
        apply_rules(df, [Rule("y", "nope", {})])
    with pytest.raises(ValueError, match="missing param"):
        apply_rules(df, [Rule("y", "build_link", {"prefix": "p"})])
    rows = apply_rules(
        df, [Rule("y", "build_link", {"prefix": "p/", "source": "x"})]
    ).collect()
    assert rows[0].y == "p/0"
