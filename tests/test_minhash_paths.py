"""Both minhash signature paths (built-in HOF and Arrow/numpy) satisfy
the minhash contract; values intentionally differ (different token
hash), behavior must not."""

import pytest
from pyspark.sql import functions as F

from sema_spark.functions.minhash import estimated_jaccard, tokenize, with_minhash


@pytest.mark.parametrize("use_arrow", [False, True])
def test_minhash_contract(spark, use_arrow):
    df = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the lazy dog"),
            ("b", "the quick brown fox jumps over the lazy dog"),
            ("c", "the quick brown fox leaps over the lazy dog"),
            ("d", "completely different words entirely unrelated text"),
            ("e", None),
        ],
        "id string, content string",
    )
    out = with_minhash(df, use_arrow=use_arrow)
    sigs = {r.id: r.mh_sig for r in out.select("id", "mh_sig").collect()}
    assert sigs["a"] == sigs["b"]  # identical sets → identical signatures
    assert all(len(s) == 64 for s in sigs.values())
    paired = spark.createDataFrame(
        [(sigs["a"], sigs["c"]), (sigs["a"], sigs["d"])], "x array<bigint>, y array<bigint>"
    )
    jac = [r.j for r in paired.select(estimated_jaccard("x", "y").alias("j")).collect()]
    assert jac[0] > 0.6 and jac[1] < 0.2
    # determinism across invocations
    again = {r.id: r.mh_sig for r in with_minhash(df, use_arrow=use_arrow).select("id", "mh_sig").collect()}
    assert again == sigs
