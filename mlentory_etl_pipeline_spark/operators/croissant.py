"""Croissant JSON-LD ingest (SURVEY §2.4 G3 + Q9 bnode scan).

The reference parses each dataset's Croissant JSON-LD into a temp
rdflib graph, deletes unwanted node types (FileSet/File/FileObject/
FileObjectSet), replaces typed blank nodes (Dataset/Organization/
Person) with sha256-hashed URIs, and drops any remaining blank-node
triples (``GraphBuilderCroissant.py:30-200,343-405``).

Spark-first rewrite — no rdflib, no per-row graph objects:

1. ``from_json`` parses the JSON-LD column into a typed struct
   (the Croissant vocabulary has a known shape);
2. node extraction is a ``select``/``explode`` into a *node table*
   ``(node_id, node_type, ...)``;
3. unwanted-type removal = anti-join against the drop-type list
   (broadcast — it is a literal);
4. blank-node replacement = computing the hashed URI directly from the
   node's (platform, type, name) — the join the reference does against
   an id→hash mapping collapses into the hash expression itself;
5. residual blank-node triples are dropped by a ``startswith("_:")``
   filter on both subject and object (Q9's bnode scan as a predicate).

Everything is a narrow projection except the explode; the JSON parse
is JVM-side (``from_json``), not a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from mlentory_etl_pipeline_spark.functions.hashing import entity_uri

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SCHEMA = "https://schema.org/"

#: Node types removed wholesale (``GraphBuilderCroissant.py:343-405``).
DROP_TYPES = ("FileObject", "FileSet", "File", "FileObjectSet")

#: Typed blank nodes that get hashed URIs (``GraphBuilderCroissant.py:103-151``).
HASHED_TYPES = ("Dataset", "Organization", "Person")

CROISSANT_SCHEMA = StructType(
    [
        StructField("@id", StringType()),
        StructField("@type", StringType()),
        StructField("name", StringType()),
        StructField("url", StringType()),
        StructField(
            "creator",
            StructType(
                [
                    StructField("@id", StringType()),
                    StructField("@type", StringType()),
                    StructField("name", StringType()),
                ]
            ),
        ),
        StructField(
            "distribution",
            ArrayType(
                StructType(
                    [
                        StructField("@id", StringType()),
                        StructField("@type", StringType()),
                        StructField("name", StringType()),
                        StructField("contentUrl", StringType()),
                    ]
                )
            ),
        ),
        StructField(
            "recordSet",
            ArrayType(
                StructType(
                    [
                        StructField("@id", StringType()),
                        StructField("@type", StringType()),
                        StructField("name", StringType()),
                    ]
                )
            ),
        ),
    ]
)


def _resolve(node_id, node_type, name, platform: str):
    """Blank-node replacement: typed bnodes get deterministic hashed
    URIs; non-blank ids pass through; everything else stays blank (and
    is filtered later)."""
    return (
        F.when(
            node_id.startswith("_:") & node_type.isin(*HASHED_TYPES),
            entity_uri(platform, node_type, name),
        )
        .otherwise(node_id)
    )


def flatten_croissant(
    df: DataFrame, json_col: str, platform: str = "hf"
) -> DataFrame:
    """G3 — JSON-LD column → ``(subject, predicate, object, object_is_uri)``
    triples with bnode surgery. See module docstring for the pipeline."""
    c = df.select(F.from_json(F.col(json_col), CROISSANT_SCHEMA).alias("c")).select("c.*")

    ds = _resolve(F.col("`@id`"), F.col("`@type`"), F.col("name"), platform)
    creator = _resolve(
        F.col("creator.`@id`"), F.col("creator.`@type`"), F.col("creator.name"), platform
    )

    def lit_triple(s, p, o, is_uri):
        return F.struct(
            s.alias("subject"),
            F.lit(p).alias("predicate"),
            o.alias("object"),
            F.lit(is_uri).alias("object_is_uri"),
        )

    # Dataset + creator facts. Distribution/recordSet nodes go through
    # the node table below so the type-delete is an explicit anti-join.
    fact_rows = c.select(
        F.explode(
            F.array(
                lit_triple(ds, RDF_TYPE, F.concat(F.lit(SCHEMA), F.col("`@type`")), True),
                lit_triple(ds, SCHEMA + "name", F.col("name"), False),
                lit_triple(ds, SCHEMA + "url", F.col("url"), True),
                lit_triple(ds, SCHEMA + "creator", creator, True),
                lit_triple(
                    creator,
                    RDF_TYPE,
                    F.concat(F.lit(SCHEMA), F.col("creator.`@type`")),
                    True,
                ),
                lit_triple(creator, SCHEMA + "name", F.col("creator.name"), False),
            )
        ).alias("t")
    ).select("t.*")

    # Sub-entity node table: (parent, node) for distribution + recordSet.
    nodes = c.select(
        ds.alias("parent"),
        F.explode(
            F.concat(
                F.coalesce("distribution", F.array()),
                F.coalesce(
                    F.transform(
                        "recordSet",
                        lambda r: F.struct(
                            r["@id"].alias("@id"),
                            r["@type"].alias("@type"),
                            r["name"].alias("name"),
                            F.lit(None).cast("string").alias("contentUrl"),
                        ),
                    ),
                    F.array(),
                ),
            )
        ).alias("n"),
    ).select("parent", "n.*")

    # Unwanted-type removal: anti-join on the (broadcast) drop list.
    drop_list = F.broadcast(
        nodes.sparkSession.createDataFrame(
            [(t,) for t in DROP_TYPES], "`@type` string"
        )
    )
    kept_nodes = nodes.join(drop_list, on="@type", how="left_anti")

    node_rows = kept_nodes.select(
        F.explode(
            F.array(
                lit_triple(
                    F.col("`@id`"), RDF_TYPE, F.concat(F.lit(SCHEMA), F.col("`@type`")), True
                ),
                lit_triple(F.col("`@id`"), SCHEMA + "name", F.col("name"), False),
                lit_triple(F.col("parent"), SCHEMA + "hasPart", F.col("`@id`"), True),
            )
        ).alias("t")
    ).select("t.*")

    all_rows = fact_rows.unionByName(node_rows)

    # Residual blank-node drop (Q9 as a filter predicate).
    return all_rows.where(
        ~F.col("subject").startswith("_:")
        & ~(F.col("object_is_uri") & F.col("object").startswith("_:"))
    )


def bnode_scan(triples: DataFrame) -> DataFrame:
    """Q9 — distinct blank nodes and their rdf:type
    (``GraphBuilderCroissant.py:166-176``)."""
    return (
        triples.where(F.col("subject").startswith("_:") & (F.col("predicate") == RDF_TYPE))
        .select(F.col("subject").alias("node"), F.col("object").alias("type"))
        .distinct()
    )
