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


# Nested-dict value shape for the DatasetObject branch
# (GraphBuilderFAIR4ML.py:351-415): {"name", "url", "estimationProcedure":
# {"type", "data_splits_url", "parameters": {k: v, ...}}}.
NESTED_DATASET_SCHEMA = (
    "name string, url string, "
    "estimationProcedure struct<type: string, data_splits_url: string, "
    "parameters: map<string,string>>"
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SCHEMA_NS = "https://schema.org/"
FAIR4ML_NS = "https://w3id.org/fair4ml/"


def mint_nested_entities(
    long_df: DataFrame,
    schema_df: DataFrame,
    platform: str = "hf",
    subject_col: str = "subject",
    property_col: str = "property",
    value_col: str = "value",
) -> DataFrame:
    """G2 nested-dict object branches: JSON-encoded dict values minting
    multi-property side entities.

    Mirrors the reference's two dict-typed dispatch branches
    (``GraphBuilderFAIR4ML.py:351-415`` DatasetObject, ``:462-484``
    EvaluationObject), which the scalar :func:`range_dispatch` /
    :func:`mint_side_entities` pair cannot express:

    - Range ``DatasetObject``: value is ``{"name", "url",
      "estimationProcedure": {"type", "data_splits_url", "parameters"}}``.
      Mint a DatasetObject entity (rdf:type + schema:name + schema:url),
      a sub-entity for the estimation procedure (hash-chained off the
      dataset-object hash, exactly the reference's
      ``"estimationProcedure" + id_hash`` recipe) with type/url triples
      plus one triple per ``parameters`` entry, and the link triples.
    - Range ``EvaluationObject``: value is a flat metric dict — one
      triple per (metric, value) on the minted evaluation entity
      (dynamic keys via ``from_json`` to ``map<string,string>`` +
      ``explode``), plus rdf:type and the link triple.

    All JVM-side: ``from_json`` / ``get_json_object`` / map ``explode``
    — no Python in the row path. One broadcast join against the config
    schema table routes rows to branches; entity-side triples are
    ``distinct``-deduplicated (many subjects may reference one entity).
    At scale this is a narrow map + one dedup shuffle over the minted
    side triples, same shape as :func:`mint_side_entities`.
    """
    from mlentory_etl_pipeline_spark.functions.hashing import entity_hash, entity_uri

    typed = long_df.join(F.broadcast(schema_df), property_col)
    v = F.col(value_col)

    # ---- DatasetObject branch -------------------------------------
    ds = typed.where(F.col("range") == "DatasetObject")
    ds_hash = entity_hash(platform, "DatasetObject", v)
    ds_uri = entity_uri(platform, "DatasetObject", v)
    # est-proc id = raw JSON substring of the nested object; hash is
    # chained off the parent hash (reference: "estimationProcedure"+id_hash)
    est_raw = F.get_json_object(v, "$.estimationProcedure")
    est_uri = entity_uri(
        platform, F.concat(F.lit("estimationProcedure"), ds_hash), est_raw
    )
    parsed = F.from_json(v, NESTED_DATASET_SCHEMA)
    ds_rows = ds.select(
        F.col(subject_col).alias("subject"),
        F.col(property_col).alias("predicate"),
        ds_uri.alias("ds_uri"),
        est_uri.alias("est_uri"),
        parsed.alias("p"),
    )

    ds_links = ds_rows.select(
        "subject",
        "predicate",
        F.col("ds_uri").alias("object"),
        F.lit(True).alias("object_is_uri"),
    )

    def _t(s, p, o, is_uri):
        return F.struct(
            s.alias("subject"),
            p.alias("predicate"),
            o.alias("object"),
            F.lit(is_uri).alias("object_is_uri"),
        )

    ds_fixed = (
        # project map-free scalars before distinct (Spark set ops
        # reject MapType columns)
        ds_rows.select(
            "ds_uri",
            "est_uri",
            F.col("p.name").alias("_name"),
            F.col("p.url").alias("_url"),
            F.col("p.estimationProcedure.type").alias("_ep_type"),
            F.col("p.estimationProcedure.data_splits_url").alias("_ep_url"),
        )
        .distinct()
        .select(
            F.explode(
                F.array(
                    _t(F.col("ds_uri"), F.lit(RDF_TYPE), F.lit(FAIR4ML_NS + "DatasetObject"), True),
                    _t(F.col("ds_uri"), F.lit(SCHEMA_NS + "name"), F.col("_name"), False),
                    _t(F.col("ds_uri"), F.lit(SCHEMA_NS + "url"), F.col("_url"), False),
                    _t(F.col("ds_uri"), F.lit(FAIR4ML_NS + "estimationProcedure"), F.col("est_uri"), True),
                    _t(F.col("est_uri"), F.lit(RDF_TYPE), F.lit(FAIR4ML_NS + "estimationProcedure"), True),
                    _t(F.col("est_uri"), F.lit(SCHEMA_NS + "type"), F.col("_ep_type"), False),
                    _t(F.col("est_uri"), F.lit(SCHEMA_NS + "url"), F.col("_ep_url"), False),
                )
            ).alias("t")
        )
        .select("t.*")
        .where(F.col("object").isNotNull())
    )
    ds_params = (
        ds_rows.select(
            "est_uri", F.explode_outer(F.col("p.estimationProcedure.parameters")).alias("k", "val")
        )
        .where(F.col("k").isNotNull())
        .distinct()
        .select(
            F.col("est_uri").alias("subject"),
            F.concat(F.lit(FAIR4ML_NS), F.col("k")).alias("predicate"),
            F.col("val").alias("object"),
            F.lit(False).alias("object_is_uri"),
        )
    )

    # ---- EvaluationObject branch ----------------------------------
    ev = typed.where(F.col("range") == "EvaluationObject")
    ev_uri = entity_uri(platform, "EvaluationObject", v)
    ev_rows = ev.select(
        F.col(subject_col).alias("subject"),
        F.col(property_col).alias("predicate"),
        ev_uri.alias("ev_uri"),
        F.from_json(v, "map<string,string>").alias("metrics"),
    )
    ev_links = ev_rows.select(
        "subject",
        "predicate",
        F.col("ev_uri").alias("object"),
        F.lit(True).alias("object_is_uri"),
    )
    ev_types = (
        ev_rows.select("ev_uri")
        .distinct()
        .select(
            F.col("ev_uri").alias("subject"),
            F.lit(RDF_TYPE).alias("predicate"),
            F.lit(FAIR4ML_NS + "EvaluationObject").alias("object"),
            F.lit(True).alias("object_is_uri"),
        )
    )
    ev_metrics = (
        ev_rows.select("ev_uri", F.explode_outer("metrics").alias("k", "val"))
        .where(F.col("k").isNotNull())
        .distinct()
        .select(
            F.col("ev_uri").alias("subject"),
            F.concat(F.lit(FAIR4ML_NS), F.col("k")).alias("predicate"),
            F.col("val").alias("object"),
            F.lit(False).alias("object_is_uri"),
        )
    )

    out = ds_links
    for part in (ds_fixed, ds_params, ev_links, ev_types, ev_metrics):
        out = out.unionByName(part)
    return out


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
