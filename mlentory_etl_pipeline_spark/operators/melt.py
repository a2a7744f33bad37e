"""Wide→long transform: the reference's G2 range-dispatch re-expressed
as melt + broadcast schema join + a typed expression tree (SURVEY §2.4).

The reference iterates rows and dispatches per-property Python branches
(``GraphBuilderFAIR4ML.py:260-704``, 440 LoC). Spark-first, this is:

1. ``unpivot`` the wide frame once (no shuffle — narrow);
2. broadcast-join the property→Range schema table (§1.2 — config data,
   not code);
3. one ``when`` expression tree producing the typed object term and
   ``object_is_uri`` — whole-stage-codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "property",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long unpivot. Values are cast to string (the long-form
    object column is a string term, typed downstream by range dispatch)."""
    casted = df.select(
        *id_cols, *[F.col(c).cast("string").alias(c) for c in value_cols]
    )
    return casted.unpivot(id_cols, value_cols, var_name, value_name)


def range_dispatch(
    long_df: DataFrame,
    schema_df: DataFrame,
    property_col: str = "property",
    value_col: str = "value",
) -> DataFrame:
    """Type the object term by its schema Range (G2).

    ``schema_df``: (property, range) — broadcast (it is a 46-row config
    table in the reference, ``FAIR4ML_schema.tsv``).

    Emits ``object`` (lexical form), ``object_is_uri``, ``object_type``
    (the XSD-ish datatype tag). Date parsing tolerates ISO timestamps
    and bare dates — the reference's "date-format chaos" normalized in
    one place (SURVEY §7.3).
    """
    joined = long_df.join(F.broadcast(schema_df), property_col, "left")
    v = F.col(value_col)
    rng = F.coalesce(F.col("range"), F.lit("Text"))
    is_url = v.rlike(r"^https?://")
    as_ts = F.coalesce(
        F.try_to_timestamp(v),
        F.try_to_timestamp(v, F.lit("yyyy-MM-dd_HH-mm-ss")),
        F.try_to_timestamp(v, F.lit("yyyy-MM-dd")),
    )
    obj = (
        F.when(rng == "Date", F.date_format(as_ts, "yyyy-MM-dd'T'HH:mm:ss"))
        .when(rng == "Boolean", F.lower(v).cast("boolean").cast("string"))
        .when(rng == "Number", v.cast("double").cast("string"))
        .when(rng == "URL", v)
        .otherwise(v)
    )
    obj_type = (
        F.when(rng == "Date", F.lit("xsd:dateTime"))
        .when(rng == "Boolean", F.lit("xsd:boolean"))
        .when(rng == "Number", F.lit("xsd:double"))
        .when(rng == "URL", F.lit("xsd:anyURI"))
        .otherwise(F.when(is_url, F.lit("xsd:anyURI")).otherwise(F.lit("xsd:string")))
    )
    return joined.select(
        *[c for c in long_df.columns if c not in (value_col,)],
        obj.alias("object"),
        ((rng == "URL") | ((rng == "Text") & is_url)).alias("object_is_uri"),
        obj_type.alias("object_type"),
    ).where(F.col("object").isNotNull())


def mint_side_entities(
    long_df: DataFrame,
    schema_df: DataFrame,
    platform: str = "hf",
    subject_col: str = "subject",
    property_col: str = "property",
    value_col: str = "value",
    entity_ranges: tuple[str, ...] = (
        "Dataset",
        "Person",
        "Organization",
        "ScholarlyArticle",
        "DefinedTerm",
        "CreativeWork",
    ),
) -> DataFrame:
    """G2 side-entity minting (``GraphBuilderFAIR4ML.py:336-704``): for
    long-form rows whose schema Range names an entity type, mint a
    deterministic hashed URI for the referenced entity and emit

    - the link triple   ``(subject, property, entity_uri)``, and
    - the side triples  ``(entity_uri, rdf:type, schema:<Range>)`` and
      ``(entity_uri, schema:name, value)`` — deduplicated, since many
      rows reference the same entity.

    One broadcast join against the (46-row) schema table, one distinct
    over the minted entities — the reference's per-row branchy minting
    becomes two projections and a dedup.
    """
    from mlentory_etl_pipeline_spark.functions.hashing import entity_uri

    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    schema_ns = "https://schema.org/"

    typed = long_df.join(F.broadcast(schema_df), property_col)
    ent = typed.where(F.col("range").isin(*entity_ranges))
    uri = entity_uri(platform, F.col("range"), F.col(value_col))

    links = ent.select(
        F.col(subject_col).alias("subject"),
        F.col(property_col).alias("predicate"),
        uri.alias("object"),
        F.lit(True).alias("object_is_uri"),
    )
    side = (
        ent.select(F.col("range"), F.col(value_col), uri.alias("uri"))
        .distinct()
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("uri").alias("subject"),
                        F.lit(rdf_type).alias("predicate"),
                        F.concat(F.lit(schema_ns), F.col("range")).alias("object"),
                        F.lit(True).alias("object_is_uri"),
                    ),
                    F.struct(
                        F.col("uri").alias("subject"),
                        F.lit(schema_ns + "name").alias("predicate"),
                        F.col(value_col).alias("object"),
                        F.lit(False).alias("object_is_uri"),
                    ),
                )
            ).alias("t")
        )
        .select("t.*")
    )
    return links.unionByName(side)
