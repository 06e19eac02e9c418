"""Unigram-LM scoring: hand-checked means vs a Python reference, OOV
floor behavior, determinism, and plan purity (broadcast vocab join, no
Python in the scoring path)."""

import math

import pytest

from pyspark.sql import functions as F

from mini_data_platform_spark.operators.lm import (
    unigram_logprob,
    vocab_logprobs,
)


def _py_reference(rows, vocab_size):
    """The operator's contract, in plain Python. Tokenization mirrors
    functions.text.tokens (split(trim(s), ' +')): an empty/whitespace
    text yields ONE empty-string token, same as both engines."""
    import re

    toks = {i: re.split(" +", t.strip()) for i, t in rows if t is not None}
    counts: dict[str, int] = {}
    for ws in toks.values():
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    table, oov = vocab_logprobs(top, total)
    logp = dict(table)
    out = {}
    for i, ws in toks.items():
        if not ws:
            continue
        terms = [logp.get(w, oov) for w in ws]
        # decimal-exact mean: terms are 6dp-true by construction
        s = round(sum(round(t * 1e6) for t in terms))
        out[i] = (len(ws), sum(1 for w in ws if w not in logp),
                  (s / 1e6) / len(ws))
    return out


class TestUnigramLm:
    def test_hand_checked_against_python_reference(self, spark):
        rows = [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "zyxqq unseen gibberish zyxqq"),
            (4, "the the the"),
            (5, ""),          # one empty-string token (split-of-empty)
            (6, None),        # null -> absent
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_oov"], r["mean_logprob"])
            for r in unigram_logprob(df, "doc_id", "text", vocab_size=4).collect()
        }
        want = _py_reference(rows, vocab_size=4)
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0], i
            assert got[i][1] == want[i][1], i
            assert got[i][2] == pytest.approx(want[i][2], abs=1e-12), i

    def test_common_words_score_higher_than_gibberish(self, spark):
        rows = [(i, "common words appear here often common words") for i in range(20)]
        rows.append((100, f"unique{0} unique{1} unique{2} unique{3}"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["mean_logprob"]
               for r in unigram_logprob(df, "doc_id", "text", vocab_size=6).collect()}
        assert out[0] > out[100]

    def test_empty_corpus_rejected(self, spark):
        df = spark.createDataFrame([], "doc_id long, text string")
        with pytest.raises(ValueError, match="no tokens"):
            unigram_logprob(df, "doc_id", "text")

    def test_plan_broadcasts_vocab_and_stays_jvm(self, spark):
        df = spark.createDataFrame(
            [(i, "a b c d e") for i in range(50)], "doc_id long, text string"
        )
        out = unigram_logprob(df, "doc_id", "text", vocab_size=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "EvalPython" not in plan
