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
