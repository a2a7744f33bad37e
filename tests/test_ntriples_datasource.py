"""N-Triples Python DataSource: round-trip fidelity, per-file
partitioning, parse-time filter pushdown, and the malformed-line
fail-fast contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.sources import ntriples_ds

ROWS = [
    ("urn:a", "ex:p", "urn:b", True),
    ("urn:a", "ex:label", 'he said "hi"', False),
    ("urn:c", "ex:p", "urn:d", True),
    ("urn:c", "ex:label", "plain", False),
]
SCHEMA = "subject string, predicate string, object string, object_is_uri boolean"


@pytest.fixture()
def registered(spark):
    ntriples_ds.register(spark)
    ntriples_ds.register(spark)  # re-register must be idempotent
    return spark


def test_roundtrip_including_escaped_literals(registered, tmp_path):
    d = str(tmp_path / "g")
    df = registered.createDataFrame(ROWS, SCHEMA)
    df.write.format("ntriples").mode("overwrite").save(d)
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    back = registered.read.format("ntriples").load(d)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_roundtrip_backslash_and_control_literals(registered, tmp_path):
    """Quote-only escaping serialized 'ends with \\' as "...\\" which
    the reader's own grammar rejects — backslash must be escaped FIRST
    on write and properly unescaped on read (round-5 ADVICE)."""
    rows = [
        ("urn:a", "ex:label", "ends with \\", False),
        ("urn:a", "ex:label", "mid\\dle", False),
        ("urn:a", "ex:label", 'both \\ and "q"', False),
        ("urn:a", "ex:label", "tab\there\nline", False),
        ("urn:a", "ex:label", "\\\\double", False),
    ]
    d = str(tmp_path / "g")
    registered.createDataFrame(rows, SCHEMA).write.format(
        "ntriples"
    ).mode("overwrite").save(d)
    back = registered.read.format("ntriples").load(d)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_writer_output_matches_graph_to_ntriples(registered, tmp_path):
    """The DataSource writer and graph.to_ntriples are the two NT
    serializers — they must emit identical lines for the same triples
    (including backslash escapes), or a graph exported one way cannot
    be diffed against the other."""
    from mlentory_etl_pipeline_spark.operators import graph

    rows = [
        ("urn:a", "ex:p", "urn:b", True),
        ("urn:a", "ex:label", 'q "x" \\ end\\', False),
    ]
    df = registered.createDataFrame(rows, SCHEMA)
    d = str(tmp_path / "g")
    df.coalesce(1).write.format("ntriples").mode("overwrite").save(d)
    ds_lines = set()
    for f in os.listdir(d):
        if f.endswith(".nt"):
            with open(os.path.join(d, f)) as fh:
                ds_lines |= {ln.rstrip("\n") for ln in fh if ln.strip()}
    op_lines = {r.line for r in graph.to_ntriples(df).collect()}
    assert ds_lines == op_lines


def test_overwrite_replaces_previous_files(registered, tmp_path):
    d = str(tmp_path / "g")
    df = registered.createDataFrame(ROWS, SCHEMA)
    df.write.format("ntriples").mode("overwrite").save(d)
    df.limit(1).coalesce(1).write.format("ntriples").mode("overwrite").save(d)
    assert registered.read.format("ntriples").load(d).count() == 1


def test_one_partition_per_file(registered, tmp_path):
    d = tmp_path / "g"
    d.mkdir()
    (d / "a.nt").write_text("<s1> <p> <o> .\n")
    (d / "b.nt").write_text('<s2> <p> "x" .\n<s3> <p> "y" .\n')
    reader = ntriples_ds.NTriplesReader({"path": str(d)})
    assert len(reader.partitions()) == 2
    back = registered.read.format("ntriples").load(str(d))
    assert back.count() == 3
    assert back.rdd.getNumPartitions() == 2


def test_predicate_filter_pushed_into_parse(registered, tmp_path):
    d = str(tmp_path / "g")
    registered.createDataFrame(ROWS, SCHEMA).write.format("ntriples").mode(
        "overwrite"
    ).save(d)
    got = (
        registered.read.format("ntriples")
        .load(d)
        .where(F.col("predicate") == "ex:p")
        .collect()
    )
    assert sorted(r.subject for r in got) == ["urn:a", "urn:c"]
    # unit-level: equality on parse-time columns is absorbed, the rest
    # is handed back to Spark
    from pyspark.sql.datasource import EqualTo, GreaterThan

    reader = ntriples_ds.NTriplesReader({"path": d})
    left = list(
        reader.pushFilters(
            [EqualTo(("predicate",), "ex:p"), GreaterThan(("subject",), "a")]
        )
    )
    assert reader.eq == {"predicate": "ex:p"}
    assert len(left) == 1 and isinstance(left[0], GreaterThan)


def test_comments_and_blanks_skipped_malformed_raises(registered, tmp_path):
    d = tmp_path / "g"
    d.mkdir()
    (d / "a.nt").write_text("# comment\n\n<s> <p> <o> .\n")
    assert registered.read.format("ntriples").load(str(d)).count() == 1
    (d / "a.nt").write_text("<s> <p> missing-dot\n")
    with pytest.raises(Exception, match="malformed|MALFORMED|PYTHON"):
        registered.read.format("ntriples").load(str(d)).collect()


def test_ntriples_stream_reader_tails_new_files(registered, tmp_path):
    """The streaming reader's offset is the consumed-file count: a
    fresh checkpoint consumes everything present; a resumed one
    processes ONLY files that landed since (incremental, no
    reprocessing)."""
    spark = registered
    d = tmp_path / "land"
    d.mkdir()
    (d / "s_a.nt").write_text(
        "<s1> <p> <o1> .\n<s2> <p> \"lit\" .\n", encoding="utf-8"
    )

    q = (
        spark.readStream.format("ntriples")
        .option("path", str(d))
        .load()
        .writeStream.format("memory")
        .queryName("nt_tail")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    first = {
        (r.subject, r.object, r.object_is_uri)
        for r in spark.sql("SELECT * FROM nt_tail").collect()
    }
    assert first == {("s1", "o1", True), ("s2", "lit", False)}

    (d / "s_b.nt").write_text("<s3> <p> <o3> .\n", encoding="utf-8")
    seen: list[set] = []

    def capture(batch_df, batch_id):
        seen.append({r.subject for r in batch_df.collect()})

    def run_with_checkpoint():
        q2 = (
            spark.readStream.format("ntriples")
            .option("path", str(d))
            .load()
            .writeStream.foreachBatch(capture)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(60)

    # fresh checkpoint: first run consumes ALL files present
    run_with_checkpoint()
    assert set().union(*seen) == {"s1", "s2", "s3"}

    # resume from the committed offset: a further file is the ONLY new
    # data the next run processes (incremental, no reprocessing)
    seen.clear()
    (d / "s_c.nt").write_text("<s4> <p> <o4> .\n", encoding="utf-8")
    run_with_checkpoint()
    assert seen and set().union(*seen) == {"s4"}
