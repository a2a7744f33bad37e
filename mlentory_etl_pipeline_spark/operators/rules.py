"""Rule-table row mapper (SURVEY §2.5 L1).

The reference's legacy transform drives per-column derivations from a
CSV of ``(target_column, transformation_function, json-params)`` rows
dispatched to registered Python functions
(``FieldProcessorHF.py:31-203``, driver loop ``TransformHF.py:39-90``).

Spark-first: each rule row compiles to a *Column expression*; the whole
rule table becomes one ``select()`` — a single narrow projection that
Catalyst folds/prunes like any hand-written plan. No per-row dispatch,
no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    """One rule-table row: ``target`` column name, registered function
    name, and its parameters (the reference's JSON params column)."""

    target: str
    fn: str
    params: dict = field(default_factory=dict)


def _copy(p):
    return F.col(p["source"])


def _constant(p):
    return F.lit(p["value"])


def _build_link(p):
    # build_HF_link: f"https://huggingface.co/{id}" (FieldProcessorHF).
    return F.concat(F.lit(p["prefix"]), F.col(p["source"]).cast("string"))


def _concat_fields(p):
    # process_trainedOn-style: join several answer columns.
    return F.concat_ws(p.get("sep", " "), *[F.col(c).cast("string") for c in p["sources"]])


def _lower_strip(p):
    return F.lower(F.trim(F.col(p["source"])))


def _not_extracted(p):
    # process_not_extracted: the reference's missing sentinel.
    return F.lit("Information not found")


RULE_FUNCTIONS = {
    "copy": _copy,
    "constant": _constant,
    "build_link": _build_link,
    "concat_fields": _concat_fields,
    "lower_strip": _lower_strip,
    "not_extracted": _not_extracted,
}


def compile_rules(rules: list[Rule]) -> list[Column]:
    """Rule rows → aliased Column expressions. Unknown function names
    raise immediately with the known set (mirrors the reference's
    invalid-function test, ``test_FieldProcessorHF.py:688-716``)."""
    cols = []
    for r in rules:
        if r.fn not in RULE_FUNCTIONS:
            raise ValueError(
                f"unknown transformation function {r.fn!r}; "
                f"known: {sorted(RULE_FUNCTIONS)}"
            )
        try:
            col = RULE_FUNCTIONS[r.fn](r.params)
        except KeyError as e:
            raise ValueError(f"rule {r.target!r}: missing param {e}") from e
        cols.append(col.alias(r.target))
    return cols


def apply_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """L1 — the whole rule table as one ``select``."""
    return df.select(*compile_rules(rules))
