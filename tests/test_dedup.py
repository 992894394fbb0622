import pytest
from pyspark.sql import functions as F

from sema_spark.operators.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    exact_dup_groups,
    minhash_candidate_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup,
    simhash_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, "  " + BASE.upper() + "  "),  # normalized-exact dup of 0
        (3, BASE.replace("jumps", "leaps")),  # near dup
        (4, "completely different content about spark dataframes and shuffles at scale"),
        (5, "another unrelated document mentioning catalyst optimizer and codegen"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_dedup(spark, docs):
    kept = exact_dedup(docs)
    ids = {r.id for r in kept.select("id").collect()}
    assert 0 in ids and 1 not in ids and 2 not in ids
    assert {3, 4, 5} <= ids
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1 and groups[0].group_size == 3 and groups[0].canonical_id == 0


def test_minhash_candidates_and_dedup(spark, docs):
    pairs = {(r.a, r.b) for r in minhash_candidate_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and (0, 3) in pairs
    assert not any({a, b} == {0, 4} or {a, b} == {4, 5} for a, b in pairs)
    kept = {r.id for r in minhash_dedup(docs, threshold=0.5).select("id").collect()}
    assert kept == {0, 4, 5}  # 1,2,3 all collapse into 0's component


def test_simhash_blocking(spark):
    """Simhash is a long-document sketch: a couple of changed words in a
    150-word doc moves only a few of 64 bits (tiny docs flip many — see
    the hamming=10 measurement for a 16-word doc in the module history)."""
    words = [f"tok{i}" for i in range(150)]
    rows = [
        (0, " ".join(words)),
        (1, " ".join(words)),  # identical
        (2, " ".join(words + ["suffixword"])),  # near dup (measured ham=1)
        (3, " ".join(f"other{i}" for i in range(150))),  # unrelated
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    sh = {r.id: r.s for r in docs.select("id", simhash(F.col("text")).alias("s")).collect()}
    assert sh[0] == sh[1]
    pairs = {(r.a, r.b): r.hamming for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 3
    assert not any(3 in p for p in pairs)
    kept = {r.id for r in simhash_dedup(docs, max_hamming=3).select("id").collect()}
    assert kept == {0, 3}


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 3) in pairs and 0.8 <= pairs[(0, 3)] < 1.0


def test_ngram_hash_collision_free(spark):
    """The re-rank computes Jaccard over xxhash64(gram) instead of gram
    strings; |∩|/|∪| is identical iff no two distinct grams collide.
    Assert absence over BOTH corpora the re-rank actually runs on: the
    driver-gate corpus (sf0.01) and the bench corpus (sf0.1)."""
    from sema_spark.functions.minhash import char_shingles

    for sf in ("sf0.01", "sf0.1"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        g = docs.select(F.explode(char_shingles(F.col("text"), 3)).alias("g")).distinct()
        n_grams = g.count()
        n_hashes = g.select(F.xxhash64("g")).distinct().count()
        assert n_grams == n_hashes, sf


def test_embedding_dup_pairs(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    v0 = rng.standard_normal(64)
    v1 = v0 + rng.standard_normal(64) * 0.05  # near dup
    v2 = rng.standard_normal(64)  # unrelated
    rows = [(i, [float(x) for x in v]) for i, v in enumerate([v0, v1, v2])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_dup_pairs(df, dim=64, threshold=0.9).collect()
    assert {(r.a, r.b) for r in pairs} == {(0, 1)}
    assert pairs[0].cos > 0.99


def test_dedup_negative_ids_keep_numeric_min(spark):
    """Sign-safe id encoding: among negative ids the NUMERIC min
    survives (raw zero-padding would invert the order of negatives)."""
    rows = [(-13, BASE), (-12, BASE), (7, BASE), (-20, "totally unrelated words here and more")]
    docs = spark.createDataFrame(rows, "id long, text string")
    kept = {r.id for r in minhash_dedup(docs, threshold=0.5).select("id").collect()}
    assert kept == {-13, -20}


def test_minhash_dedup_exact_pairs_mode(spark, docs):
    kept = {r.id for r in minhash_dedup(docs, threshold=0.5, exact_pairs=True).select("id").collect()}
    assert kept == {0, 4, 5}


def test_simhash_dedup_exact_pairs_mode(spark):
    """exact_pairs=True links every same-band pair with Hamming ≤ max
    (full within-bucket semantics), mirroring minhash_dedup's option."""
    rows = [
        (0, BASE),
        (1, BASE),
        (2, BASE + " extra tail words appended here"),
        (3, "totally unrelated content entirely different words"),
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    kept_star = {r.id for r in simhash_dedup(docs, max_hamming=3).select("id").collect()}
    kept_exact = {r.id for r in simhash_dedup(docs, max_hamming=3, exact_pairs=True).select("id").collect()}
    # on this corpus both modes agree (hub links verify); exact mode may
    # only ever link MORE pairs, never fewer.  Doc 2's appended tail
    # flips > 3 bits, so only the exact dup (1) collapses into 0.
    assert kept_exact <= kept_star
    assert kept_exact == {0, 2, 3}


def test_ngram_two_paths_agree(spark, docs):
    """The bitmap exact-verify path (small universe) and the est +
    hashed-array fallback must return the same pair set and jaccards.
    ``max_universe=1`` forces the fallback on the same input the
    default run answers with the bitmap path."""
    fast = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    slow = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.8, max_universe=1).collect()
    }
    assert fast == slow and fast  # identical, and non-empty

    # word-63 boundary: a universe > 64 grams exercises multi-word
    # bitmaps including bit 63 (sign bit of the long)
    import string

    alphabet = string.ascii_lowercase + string.digits
    long_docs = spark.createDataFrame(
        [
            (0, alphabet + alphabet[::-1]),
            (1, alphabet + alphabet[::-1]),          # exact dup
            (2, alphabet),                           # subset, J < 0.8
        ],
        "id long, text string",
    )
    got = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(long_docs, threshold=0.8).collect()}
    assert got == {(0, 1): 1.0}


def test_numeric_cc_matches_string_cc(spark):
    """r7: the numeric min-label driver CC must drop the exact loser set
    the padded-string connected_components drops (negative ids, chains,
    cliques, singletons-in-pairs)."""
    import random

    import pandas as pd
    from pyspark.sql import functions as F

    from sema_spark.operators.canonicalize import connected_components
    from sema_spark.operators.dedup import _numeric_cc_losers

    rng = random.Random(17)
    edges = [(-5, 3), (3, 9), (100, 101)]  # chain crossing zero + pair
    nodes = list(range(-50, 200, 7))
    for _ in range(300):
        a, b = rng.choice(nodes), rng.choice(nodes)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    pdf = pd.DataFrame({"a": [a for a, _ in edges], "b": [b for _, b in edges]})
    fast = set(int(x) for x in _numeric_cc_losers(spark, pdf))
    offset = F.lit("9223372036854775808").cast("decimal(20,0)")
    pad = lambda c: F.lpad(
        (F.col(c).cast("decimal(20,0)") + offset).cast("decimal(20,0)").cast("string"),
        20,
        "0",
    )
    e = spark.createDataFrame(pdf, "a long, b long")
    comp = connected_components(e.select(pad("a").alias("a"), pad("b").alias("b")))
    slow = {
        int(r[0])
        for r in comp.filter(F.col("id") != F.col("component"))
        .select((F.col("id").cast("decimal(20,0)") - offset).cast("long"))
        .collect()
    }
    assert fast == slow and len(fast) > 0


def test_sha_signature_memo_path_value_identical(spark):
    """r7: the memoized-Python sha base path must produce the identical
    signatures as the JVM sha base (HOF and hash-UDF forms)."""
    from pyspark.sql import functions as F

    from sema_spark.functions.minhash import minhash_signature, tokenize, with_minhash

    docs = spark.createDataFrame(
        [(i, f"alpha beta_{i % 7} gamma DELTA_{i % 3} é中 x") for i in range(40)]
        + [(99, ""), (100, None)],
        "id long, content string",
    )
    fast = with_minhash(docs, use_arrow=True, base="sha").select("id", "mh_sig")
    slow = docs.withColumn("mh_sig", minhash_signature(tokenize(F.col("content")), base="sha")).select(
        "id", "mh_sig"
    )
    got = {r.id: r.mh_sig for r in fast.collect()}
    want = {r.id: r.mh_sig for r in slow.collect()}
    assert got == want


def test_minhash_est_broadcast_equals_join_path(spark):
    """r7: broadcast-signature est verification must yield identical
    candidate pairs as the signature-join path (forced by shrinking the
    broadcast budget)."""
    from sema_spark.operators.dedup import minhash_candidate_pairs

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + ("x" * (i % 4)))
         for i in range(60)],
        "id long, text string",
    )
    fast = {(r.a, r.b, r.est_jaccard) for r in minhash_candidate_pairs(docs, "id", "text").collect()}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        slow = {(r.a, r.b, r.est_jaccard) for r in minhash_candidate_pairs(docs, "id", "text").collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert fast == slow and len(fast) > 0
