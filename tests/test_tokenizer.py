"""Distributed BPE (operators/tokenizer.py) vs a sequential model.

The Python model below is the textbook Sennrich recipe (pair counts
over a word-frequency dict, argmax with lexicographic tie-break,
left-to-right merge). The Spark fold must reproduce its merge table
and its segmentation exactly — including on adversarial repeated-
symbol words where overlapping-merge order matters.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators import tokenizer


def _model_train(freqs: dict[str, int], rounds: int):
    words = {tuple(w): n for w, n in freqs.items()}
    merges = []
    for _ in range(rounds):
        pc: Counter = Counter()
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best, pc[best]))
        new_words = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges, words


CORPORA = [
    {"low": 5, "lower": 2, "newest": 6, "widest": 3},  # the textbook example
    {"aaaa": 3, "aaab": 2, "abab": 4},  # overlapping repeated symbols
    {"x": 7, "yz": 1},  # degenerate short words
]


def test_bpe_train_matches_sequential_model(spark):
    for freqs in CORPORA:
        df = spark.createDataFrame(list(freqs.items()), "w string, n long")
        got = [
            (tuple(r.pair.split(" ")), r.cnt)
            for r in tokenizer.bpe_train(df, "w", "n", rounds=5)
            .orderBy("rank")
            .collect()
        ]
        want, _ = _model_train(freqs, 5)
        assert got == want[: len(got)], f"corpus {freqs}"


def test_bpe_apply_matches_sequential_segmentation(spark):
    freqs = CORPORA[1]  # the adversarial overlap corpus
    df = spark.createDataFrame(list(freqs.items()), "w string, n long")
    merges = tokenizer.bpe_train(df, "w", "n", rounds=4)
    applied = {
        r.w: tuple(r.bpe_symbols)
        for r in tokenizer.bpe_apply(df, "w", merges, rounds=4).collect()
    }
    _, model_words = _model_train(freqs, 4)
    model_seg = {"".join(sym): sym for sym in model_words}
    for w, sym in applied.items():
        assert sym == model_seg[w], (w, sym, model_seg[w])


def test_bpe_train_weighted_counts(spark):
    # frequency weighting must drive the argmax: 'zq' appears in one
    # word but with weight 100, beating the unweighted majority pair
    df = spark.createDataFrame(
        [("zq", 100), ("ab", 3), ("abc", 3)], "w string, n long"
    )
    first = tokenizer.bpe_train(df, "w", "n", rounds=1).first()
    assert first.pair == "z q" and first.cnt == 100


def test_unigram_lm_round_viterbi_semantics(spark):
    """'abab'x10 + 'ab'x5 + 'cd'x3 with threshold 8: 'abab' must win
    as a whole piece over ab+ab (ln(10/121) > 2*ln(25/121)), 'ab'
    segments as itself, and 'cd' (seed count 3 < 8, not in vocab)
    falls back to single chars. Viterbi counts follow."""
    from mlentory_etl_pipeline_spark.operators.tokenizer import (
        unigram_lm_round,
    )

    w = spark.createDataFrame(
        [("abab", 10), ("ab", 5), ("cd", 3)], "word string, n long"
    )
    out = {
        r.piece: (r.seed_count, r.viterbi_count)
        for r in unigram_lm_round(w, "word", "n", min_piece_count=8).collect()
    }
    assert out["abab"] == (10, 10)
    assert out["ab"] == (25, 5)
    assert out["c"] == (3, 3)
    assert out["d"] == (3, 3)
    assert out["a"] == (25, 0) and out["b"] == (25, 0)
    assert "cd" not in out
