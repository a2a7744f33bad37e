"""File-sink round-trips (SURVEY §2.1 S11/S12): JSON / CSV-TSV /
N-Triples writes land re-readable, with content preserved."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators import graph


def test_json_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.0)], "id int, name string, score double"
    )
    path = str(tmp_path / "out-json")
    df.write.json(path)
    back = spark.read.json(path)
    assert {(r.id, r.name, r.score) for r in back.collect()} == {
        (1, "alpha", 1.5),
        (2, "beta", -2.0),
    }


def test_tsv_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "has\ttab?"), (2, "plain")], "id int, v string")
    path = str(tmp_path / "out-tsv")
    df.write.option("sep", "\t").option("header", True).csv(path)
    back = spark.read.option("sep", "\t").option("header", True).csv(path)
    vals = {r.v for r in back.collect()}
    assert "plain" in vals
    assert len(back.columns) == 2  # quoted tab did not split the column


def test_ntriples_sink_roundtrip(spark, tmp_path):
    triples = spark.createDataFrame(
        [
            ("http://ex/s1", "http://ex/p", "http://ex/o", True),
            ("http://ex/s2", "http://ex/p", 'literal with "quotes"', False),
        ],
        "subject string, predicate string, object string, object_is_uri boolean",
    )
    path = str(tmp_path / "out-nt")
    graph.to_ntriples(triples).write.text(path)
    lines = sorted(r.value for r in spark.read.text(path).collect())
    assert lines[0] == "<http://ex/s1> <http://ex/p> <http://ex/o> ."
    assert lines[1] == '<http://ex/s2> <http://ex/p> "literal with \\"quotes\\"" .'


def test_orc_sink_roundtrip(spark, tmp_path):
    """ORC round-trip — the remaining built-in columnar format beside
    parquet; same writer API, footer statistics, predicate pushdown."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    path = str(tmp_path / "orc_out")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == 100
    assert sorted(back.columns) == ["grp", "id", "s"]
    # pushdown reaches the ORC scan
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.where("grp = 3").explain("formatted")
    assert "PushedFilters" in buf.getvalue()
