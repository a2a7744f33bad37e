"""Column-expression building blocks (all JVM-side, no Python UDFs)."""

from mlentory_etl_pipeline_spark.functions.hashing import (
    entity_hash,
    entity_uri,
    extraction_info_hash,
    statement_hash,
    triplet_hash,
)
from mlentory_etl_pipeline_spark.functions.text import (
    edge_ngram_prefixes,
    normalize_arxiv_id,
    normalize_license,
    sanitize_nul,
    strip_yaml_front_matter,
)
from mlentory_etl_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "entity_hash",
    "entity_uri",
    "extraction_info_hash",
    "statement_hash",
    "triplet_hash",
    "edge_ngram_prefixes",
    "normalize_arxiv_id",
    "normalize_license",
    "sanitize_nul",
    "strip_yaml_front_matter",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
