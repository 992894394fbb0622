"""Both minhash signature paths (built-in HOF and the Arrow/numpy
hybrid) must produce IDENTICAL signature values — the base hash is the
same JVM-side xxhash64 pass, so flipping paths can never change dedup
results.  Same contract for the two simhash paths."""

import pytest
from pyspark.sql import functions as F

from sema_spark.functions.minhash import estimated_jaccard, with_minhash
from sema_spark.operators.dedup import simhash, simhash_arrow

ROWS = [
    ("a", "the quick brown fox jumps over the lazy dog"),
    ("b", "the quick brown fox jumps over the lazy dog"),
    ("c", "the quick brown fox leaps over the lazy dog"),
    ("d", "completely different words entirely unrelated text"),
    ("e", None),
    ("f", "   "),  # empty token set → sentinel signature
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, "id string, content string")


@pytest.mark.parametrize("use_arrow", [False, True])
def test_minhash_contract(spark, docs, use_arrow):
    out = with_minhash(docs, use_arrow=use_arrow)
    sigs = {r.id: r.mh_sig for r in out.select("id", "mh_sig").collect()}
    assert sigs["a"] == sigs["b"]  # identical sets → identical signatures
    assert all(len(s) == 64 for s in sigs.values())
    paired = spark.createDataFrame(
        [(sigs["a"], sigs["c"]), (sigs["a"], sigs["d"])], "x array<bigint>, y array<bigint>"
    )
    jac = [r.j for r in paired.select(estimated_jaccard("x", "y").alias("j")).collect()]
    assert jac[0] > 0.6 and jac[1] < 0.2
    # determinism across invocations
    again = {r.id: r.mh_sig for r in with_minhash(docs, use_arrow=use_arrow).select("id", "mh_sig").collect()}
    assert again == sigs


def test_minhash_paths_value_identical(spark, docs):
    hof = {r.id: r.mh_sig for r in with_minhash(docs, use_arrow=False).select("id", "mh_sig").collect()}
    arrow = {r.id: r.mh_sig for r in with_minhash(docs, use_arrow=True).select("id", "mh_sig").collect()}
    assert hof == arrow


def test_minhash_sha_base(spark, docs):
    """sha base: both paths identical to each other AND to a pure-Python
    recomputation of the sha256-derived base hash + permutation grid
    (the arithmetic the DuckDB dedup_minhash_sha oracle replicates)."""
    import hashlib

    from sema_spark.functions.minhash import _coefficients

    hof = {r.id: r.mh_sig for r in with_minhash(docs, use_arrow=False, base="sha").select("id", "mh_sig").collect()}
    arrow = {r.id: r.mh_sig for r in with_minhash(docs, use_arrow=True, base="sha").select("id", "mh_sig").collect()}
    assert hof == arrow
    # sha base must differ from xxhash64 base (it's a different hash)
    xx = {r.id: r.mh_sig for r in with_minhash(docs, use_arrow=True).select("id", "mh_sig").collect()}
    assert hof["a"] != xx["a"]

    P, H = (1 << 61) - 1, 1 << 31
    A, B = _coefficients(64)
    import re

    for rid, text in ROWS:
        toks = list(dict.fromkeys(t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t))
        hs = [int(hashlib.sha256(t.encode()).hexdigest()[:8], 16) % H for t in toks]
        expect = [min(((a * h + b) % P) % H for h in hs) if hs else P for a, b in zip(A, B)]
        assert hof[rid] == expect, rid


def test_simhash_paths_value_identical(spark, docs):
    out = docs.select(
        "id",
        simhash(F.col("content")).alias("hof"),
        simhash_arrow(F.col("content")).alias("arrow"),
    ).collect()
    for r in out:
        assert r.hof == r.arrow, r.id
        assert len(r.arrow) == 60 and set(r.arrow) <= {"0", "1"}
