"""Deterministic content-hash keys.

The reference keys everything by content hashes (SURVEY §4): entity URIs
are sha256 of a sorted-JSON ``{platform, type, id}`` payload
(``GraphBuilderBase.py:208-237``), triplets by md5 of the concatenated
N3 terms (``GraphHandler.py:200-203``), extraction-info rows by md5 of
``method + round(confidence, 5)`` (``GraphHandler.py:573-582``).

We reproduce those keys as pure Column expressions so they double as
join/partition keys (hash-distributed by construction — no sequence
bottleneck, idempotent upserts, scale-safe).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE_NAMESPACE = "https://w3id.org/mlentory/mlentory_graph/"


def entity_hash(platform: Column | str, entity_type: Column | str, entity_id: Column) -> Column:
    """sha256 hex of the sorted-keys JSON ``{"id": …, "platform": …, "type": …}``.

    Byte-compatible with the reference's ``json.dumps(payload,
    sort_keys=True)`` (which emits ``", "`` / ``": "`` separators), so
    the same logical entity gets the same URI in both systems
    (``GraphBuilderBase.py:208-237``).
    """
    platform = F.lit(platform) if isinstance(platform, str) else platform
    entity_type = F.lit(entity_type) if isinstance(entity_type, str) else entity_type
    payload = F.concat(
        F.lit('{"id": "'),
        entity_id.cast("string"),
        F.lit('", "platform": "'),
        platform,
        F.lit('", "type": "'),
        entity_type,
        F.lit('"}'),
    )
    return F.sha2(payload, 256)


def entity_uri(platform: Column | str, entity_type: Column | str, entity_id: Column) -> Column:
    """Entity URI under the mlentory base namespace."""
    return F.concat(F.lit(BASE_NAMESPACE), entity_hash(platform, entity_type, entity_id))


def triplet_hash(subject: Column, predicate: Column, obj: Column) -> Column:
    """md5 of the concatenated subject+predicate+object terms
    (``GraphHandler.py:200-203``)."""
    return F.md5(F.concat(subject.cast("string"), predicate.cast("string"), obj.cast("string")))


def statement_hash(subject: Column, predicate: Column, obj: Column) -> Column:
    """Alias of :func:`triplet_hash` — used to key the columnar
    provenance table (replaces the reference's reified StatementMetadata
    bnodes, ``MlentoryTransformWithGraphBuilder.py:436-440``)."""
    return triplet_hash(subject, predicate, obj)


def extraction_info_hash(method: Column, confidence: Column) -> Column:
    """md5 of ``method + round(confidence, 5)``.

    Canonical confidence format is ``%.5f`` (the reference relies on
    Python ``str(round(c, 5))``, which is ill-defined for floats; we fix
    a zero-padded 5-decimal rendering so the key is total and stable —
    documented deviation, see ``GraphHandler.py:573-582``).
    """
    return F.md5(F.concat(method.cast("string"), F.format_number(confidence.cast("double"), 5)))
