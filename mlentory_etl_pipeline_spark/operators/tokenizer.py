"""Distributed BPE tokenizer: merge-rule TRAINING and rank-ordered
APPLICATION as pure DataFrame plans.

The reference counts tokens only through a HuggingFace tokenizer on
the driver (QAMatchingEngine.py:84-99 tokenizes per GPU batch); a lake
pipeline needs the corpus-scale half of that story — learning a
subword vocabulary FROM the corpus and segmenting the corpus with it —
without a per-row Python loop. Both halves here are expressible as
ordinary Spark SQL because byte-pair encoding is, at heart, iterated
"count adjacent pairs, pick argmax, replace": the classic Sennrich et
al. 2016 recipe.

Representation: each word becomes a symbol sequence with DOUBLE
spaces between symbols and single-space sentinels (``"the"`` →
``" t  h  e "``); a merge of pair ``"t h"`` is the literal replace
``" t  h " → " th "``. The double-space delimiter is load-bearing
twice over: every symbol owns a space on each side, so (a) a pair
match can never start or end inside a longer symbol (``" ab  b "``
has no ``" b  b "``), and (b) ADJACENT occurrences don't share
characters — ``" a  b  a  b "`` matches ``" a  b "`` at both sites in
one left-to-right pass, which makes plain non-overlapping replace
semantics (identical in Spark, DuckDB, Python) exactly greedy BPE
application, including on repeated-symbol runs (`` a  a  a `` merges
left-first like the sequential algorithm). Everything is deterministic: argmax ties
break on pair text, so training is replayable — the registry queries
run both training and application under hard DuckDB oracles that
unroll the same rounds.

Scale posture: training state is the (seq, n) WORD-frequency table —
|vocab| rows, not corpus rows (the classic BPE trick; the corpus is
touched once to build it). Each round is one weighted pair count
(map-side combined, ≤ |vocab|·max_len pair rows) + a 1-row argmax
broadcast back into a literal replace — no UDF, no driver loop over
data, and ``localCheckpoint`` pins each round so the plan stays O(1)
per merge. Application replays R replaces as a single projection
chain over whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_seq(word: Column) -> Column:
    """Word → sentinel-delimited character sequence (``"the"`` →
    ``" t  h  e "``, double spaces between symbols)."""
    return F.concat(F.lit(" "), F.concat_ws("  ", F.split(word, "")), F.lit(" "))


def _find_repl(pair: Column, merged: Column) -> tuple[Column, Column]:
    """The literal search/replacement strings for a merge: pair
    ``"a b"`` → search ``" a  b "``, replacement ``" ab "`` (one space
    restored on each consumed boundary)."""
    find = F.concat(
        F.lit(" "), F.replace(pair, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    return find, F.concat(F.lit(" "), merged, F.lit(" "))


def _adjacent_pairs(seq_col: str) -> Column:
    """All adjacent symbol pairs of a sequence, as ``"a b"`` strings
    (empty array for single-symbol sequences)."""
    sym = f"split(trim({seq_col}), '  ')"
    return F.zip_with(
        F.expr(f"slice({sym}, 1, size({sym}) - 1)"),
        F.expr(f"slice({sym}, 2, size({sym}) - 1)"),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def bpe_train(words: DataFrame, word_col: str, n_col: str, rounds: int = 8) -> DataFrame:
    """Learn ``rounds`` BPE merges from a word-frequency table.

    Each round: weighted count of adjacent symbol pairs → argmax
    (ties: lexicographic pair, so training is deterministic) → apply
    the merge to every word. Returns the merge table
    ``(rank, pair, merged, cnt)`` in learned order — the input to
    :func:`bpe_apply`.
    """
    w = words.select(
        _to_seq(F.col(word_col)).alias("_seq"), F.col(n_col).alias("_n")
    ).localCheckpoint(eager=True)
    merge_frames = []
    for r in range(rounds):
        counts = (
            w.select(F.explode(_adjacent_pairs("_seq")).alias("_pair"), "_n")
            .groupBy("_pair")
            .agg(F.sum("_n").alias("cnt"))
        )
        best = (
            counts.orderBy(F.desc("cnt"), F.asc("_pair"))
            .limit(1)
            .select(
                F.lit(r).alias("rank"),
                F.col("_pair").alias("pair"),
                F.replace(F.col("_pair"), F.lit(" "), F.lit("")).alias("merged"),
                "cnt",
            )
            .localCheckpoint(eager=True)
        )
        merge_frames.append(best)
        find, repl = _find_repl(F.col("pair"), F.col("merged"))
        w = (
            w.crossJoin(F.broadcast(best))
            .select(F.replace(F.col("_seq"), find, repl).alias("_seq"), "_n")
            .localCheckpoint(eager=True)
        )
    out = merge_frames[0]
    for f in merge_frames[1:]:
        out = out.unionAll(f)
    return out


def bpe_apply(
    df: DataFrame, word_col: str, merges: DataFrame, rounds: int
) -> DataFrame:
    """Segment words with a learned merge table: replay the ``rounds``
    merges in rank order as a chain of literal replaces (greedy BPE
    application — identical left-to-right semantics in any engine).

    The merge table is tiny (``rounds`` rows); it is collected once and
    inlined as literals so the whole application is ONE generated
    projection (no joins, no UDF — the same broadcast-as-literal
    pattern as the schema rule table). Adds ``bpe_symbols``
    (array of subword symbols) alongside the input columns.
    """
    rules = {
        r.rank: (" " + r.pair.replace(" ", "  ") + " ", f" {r.merged} ")
        for r in merges.select("rank", "pair", "merged").collect()
    }
    seq = _to_seq(F.col(word_col))
    for r in sorted(rules):
        find, repl = rules[r]
        seq = F.replace(seq, F.lit(find), F.lit(repl))
    return df.withColumn("bpe_symbols", F.split(F.trim(seq), "  "))
