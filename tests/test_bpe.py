"""BPE tokenizer-training parity: the distributed pair-count /
fold-merge loop must equal the independent pure-Python reference
(same regex, weighting, tiebreak, non-overlapping merge, early stop).
"""

from __future__ import annotations

from sema_spark.functions.bpe import bpe_python, bpe_train


def _df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_bpe_matches_python_reference(spark):
    texts = [
        "the theme thesis",
        "the theatre them",
        "aaaa aaa banana banana",   # cascade + repeated-char merges
        "MIXED case Words mixed",   # lowercasing
        "x",                         # 1-char word: no pairs ever
    ]
    got = bpe_train(_df(spark, texts), 10)
    exp = bpe_python(texts, 10)
    assert got == exp and len(got) > 3


def test_bpe_nonoverlapping_merge_fold(spark):
    # merge (a,a) on "aaaa"/"aaa": left-to-right non-overlapping
    # -> aaaa=[aa,aa], aaa=[aa,a]; pair (a,a) count = 3+2 = 5
    got = bpe_train(_df(spark, ["aaaa aaa"]), 2)
    exp = bpe_python(["aaaa aaa"], 2)
    assert got == exp
    assert got[0][:4] == (0, "a", "a", "aa") and got[0][4] == 5
    # round 2 best pair is (aa, aa) from "aaaa" (count 1 < 2 -> stops)
    # or (aa, a) from "aaa" -- both count 1, so training stops at 1 rule
    assert len(got) == 1


def test_bpe_count_tiebreak_is_lexicographic(spark):
    # "ab" and "cd" both occur twice; (a,b) < (c,d) lexicographically
    texts = ["ab ab cd cd"]
    got = bpe_train(_df(spark, texts), 1)
    assert got == bpe_python(texts, 1)
    assert got[0][1:4] == ("a", "b", "ab")


def test_bpe_early_stop_when_no_repeated_pair(spark):
    got = bpe_train(_df(spark, ["ab cd ef"]), 5)  # every pair count 1
    assert got == bpe_python(["ab cd ef"], 5) == []
