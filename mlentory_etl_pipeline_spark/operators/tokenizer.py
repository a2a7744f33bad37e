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


def unigram_lm_round(
    words: DataFrame,
    word_col: str,
    n_col: str,
    max_piece_len: int = 4,
    min_piece_count: int = 100,
) -> DataFrame:
    """SentencePiece-style unigram-LM tokenizer, one training round
    (Kudo 2018): seed a substring vocabulary from corpus counts, score
    pieces with quantized log-likelihoods, VITERBI-segment every word
    under the seed model, and re-estimate piece probabilities from the
    best segmentations — the other real-world subword tokenizer beside
    BPE, and the one whose training step is a per-word dynamic
    program rather than an iterated global replace.

    Everything is engine-exact:

    - seed counts are integer occurrence sums (every (word, start,
      len<=max_piece_len) substring weighted by word frequency);
      pieces below ``min_piece_count`` are dropped except single
      characters (so every word stays segmentable);
    - piece scores are ``floor(1e6*ln(cnt/total))`` — integer micros;
    - the Viterbi DP maximizes integer score sums with a smallest-
      start tiebreak, so the best segmentation is unique and
      replayable (the oracle unrolls the same DP by position level);
    - re-estimated probabilities are Laplace-smoothed rationals of the
      Viterbi counts, quantized the same way.

    Scale posture: the model state (piece table) is vocab-bounded and
    broadcast; the DP runs entirely MAP-SIDE as higher-order functions
    over each distinct word's edge list (one fold builds best[pos],
    one fold walks the backpointers) — per-word local work, no joins
    in the hot loop, no UDF; the only shuffles are the word/piece
    aggregations, all map-side combinable and bounded by |distinct
    words| x word_len x max_piece_len, never raw-corpus-sized.

    Returns (piece, seed_count, viterbi_count, p_micro) per vocab
    piece.
    """
    w = words.select(
        F.col(word_col).alias("_w"), F.col(n_col).alias("_freq")
    ).localCheckpoint(eager=False)
    positions = (
        w.select(
            "_w",
            "_freq",
            F.explode(
                F.sequence(F.lit(0), F.length("_w") - 1)
            ).alias("_s"),
        )
        .select(
            "_w",
            "_freq",
            "_s",
            F.explode(
                F.sequence(F.lit(1), F.lit(max_piece_len))
            ).alias("_plen"),
        )
        .where(F.col("_s") + F.col("_plen") <= F.length("_w"))
        .select(
            "_w",
            "_freq",
            "_s",
            (F.col("_s") + F.col("_plen")).alias("_e"),
            F.col("_w").substr(
                F.col("_s") + 1, F.col("_plen")
            ).alias("_piece"),
        )
    )
    piece_cnt = positions.groupBy("_piece").agg(
        F.sum("_freq").alias("_cnt")
    )
    vocab = piece_cnt.where(
        (F.col("_cnt") >= min_piece_count) | (F.length("_piece") == 1)
    ).localCheckpoint(eager=False)
    total = vocab.agg(F.sum("_cnt").alias("_total"))
    vq = vocab.crossJoin(F.broadcast(total)).select(
        "_piece",
        "_cnt",
        F.floor(
            F.log(
                F.col("_cnt").cast("double")
                / F.col("_total").cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("_q"),
    )
    edges = positions.join(F.broadcast(vq.select("_piece", "_q")), "_piece")
    edge_arr = edges.groupBy("_w", "_freq").agg(
        F.collect_list(F.struct("_s", "_e", "_q")).alias("_edges")
    )

    wlen = F.length("_w")
    zero = F.array(
        F.struct(
            F.lit(0).cast("long").alias("score"),
            F.lit(0).alias("negs"),
        )
    )

    def _dp_step(acc, _):
        cands = F.filter(
            F.col("_edges"), lambda e: e["_e"] == F.size(acc)
        )
        scored = F.transform(
            cands,
            lambda e: F.struct(
                (
                    F.element_at(acc, e["_s"] + 1)["score"] + e["_q"]
                ).alias("score"),
                (-e["_s"]).alias("negs"),
            ),
        )
        return F.concat(acc, F.array(F.array_max(scored)))

    best = F.aggregate(F.sequence(F.lit(1), wlen), zero, _dp_step)
    with_best = edge_arr.select(
        "_w", "_freq", best.alias("_best")
    )

    bt_zero = F.struct(
        wlen.alias("pos"),
        F.array().cast("array<string>").alias("pieces"),
    )

    def _bt_step(acc, _):
        prev = -F.element_at(F.col("_best"), acc["pos"] + 1)["negs"]
        piece = F.col("_w").substr(prev + 1, acc["pos"] - prev)
        return F.when(
            acc["pos"] > 0,
            F.struct(
                prev.alias("pos"),
                F.concat(acc["pieces"], F.array(piece)).alias(
                    "pieces"
                ),
            ),
        ).otherwise(acc)

    paths = with_best.select(
        "_freq",
        F.aggregate(
            F.sequence(F.lit(1), wlen), bt_zero, _bt_step
        )["pieces"].alias("_pieces"),
    )
    vcounts = paths.select(
        "_freq", F.explode("_pieces").alias("_piece")
    ).groupBy("_piece").agg(F.sum("_freq").alias("_vcnt"))
    vtotals = vcounts.agg(
        F.sum("_vcnt").alias("_vtotal")
    ).crossJoin(F.broadcast(vocab.agg(F.count(F.lit(1)).alias("_V"))))
    return (
        vq.join(vcounts, "_piece", "left")
        .crossJoin(F.broadcast(vtotals))
        .select(
            F.col("_piece").alias("piece"),
            F.col("_cnt").alias("seed_count"),
            F.coalesce(F.col("_vcnt"), F.lit(0)).cast("long").alias(
                "viterbi_count"
            ),
            F.floor(
                F.log(
                    (
                        F.coalesce(F.col("_vcnt"), F.lit(0)) + 1
                    ).cast("double")
                    / (F.col("_vtotal") + F.col("_V")).cast("double")
                )
                * 1000000
            )
            .cast("long")
            .alias("p_micro"),
        )
        .orderBy("piece")
    )
