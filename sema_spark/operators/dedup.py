"""Deduplication family for large-scale training-data pipelines.

Five strategies over a document table ``(id, text)``, all
shuffle-conscious:

* :func:`exact_dedup` — normalized sha256 groupBy (one shuffle on the
  hash, min-id survivor).
* :func:`minhash_dedup` — word-shingle MinHash → LSH band buckets →
  within-bucket pair generation → signature-Jaccard filter → connected
  components → canonical survivor.  Candidate generation never compares
  across buckets, so cost is Σ bucket² not N².
* :func:`simhash` / :func:`simhash_dedup` — 64-bit simhash; blocking on
  4×16-bit bands (Hamming ≤ 3 near-dups must collide on ≥ 1 exact band).
* :func:`ngram_jaccard_pairs` — exact character-n-gram Jaccard for
  candidate pairs (the precision re-rank stage after any blocker).
* :func:`embedding_dedup` — cosine near-dup over an embedding column
  using random-hyperplane sign-sketch blocking + exact cosine re-rank.

At 100 TB: every strategy is (blocking-key shuffle) + (bounded local
pair-gen) + (CC on the tiny duplicate-edge graph); none materializes the
N² pair space.  Giant buckets (boilerplate text) are capped by
``max_bucket`` with a logged drop, the standard recall/cost dial.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from sema_spark.functions.minhash import (
    char_shingles,
    choose_bands,
    estimated_jaccard,
    explode_bands,
    tokenize,
    with_minhash,
)
from sema_spark.functions.text import content_fingerprint
from sema_spark.functions.vector import cosine
from sema_spark.operators.canonicalize import connected_components


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition small-file inputs before CPU-heavy sketch phases:
    higher-order-function pipelines (minhash/simhash) are interpreted,
    not codegen'd, and a tiny parquet arrives as ONE partition — measured
    10s single-core for 5k docs that parallelizes to sub-second."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism * 2, *cols)


# ---------------------------------------------------------------------- exact
def exact_dedup(df: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """Keep one row (min id) per normalized-content fingerprint; adds
    group_size.  Single hash-keyed shuffle, no content comparison."""
    fp = df.withColumn("_fp", content_fingerprint(text_col))
    w = Window.partitionBy("_fp")
    return (
        fp.withColumn("group_size", F.count("*").over(w))
        .withColumn("_keep", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_keep", "_fp")
    )


def exact_dup_groups(df: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """(fingerprint, group_size, canonical_id) for groups with dups."""
    return (
        df.select(F.col(id_col).alias("id"), content_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("group_size"), F.min("id").alias("canonical_id"))
        .filter(F.col("group_size") > 1)
    )


# -------------------------------------------------------------------- minhash
def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    threshold: float = 0.7,
    max_bucket: int = 1000,
) -> DataFrame:
    """(a, b, est_jaccard) pairs with estimated Jaccard ≥ threshold."""
    # materialize the signatures ONCE (the expensive vectorized hash
    # pipeline), then band/join on slim (id, band, bh) rows only — the
    # 64-long signature array never enters the self-join shuffle
    mh = with_minhash(
        _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")), "id"),
        text_col="t",
        bands=choose_bands(threshold),
    ).select("id", "mh_sig", "mh_bands").localCheckpoint()
    bands = explode_bands(mh, ["id"])
    cap = Window.partitionBy("band", "bh").orderBy("id")
    capped = (
        bands.withColumn("_rn", F.row_number().over(cap))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    l, r = capped.alias("l"), capped.alias("r")
    cand = (
        l.join(r, on=["band", "bh"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    sig = mh.select("id", "mh_sig")
    pairs = (
        cand.join(sig.select(F.col("id").alias("a"), F.col("mh_sig").alias("sig_a")), "a")
        .join(sig.select(F.col("id").alias("b"), F.col("mh_sig").alias("sig_b")), "b")
        .withColumn("est_jaccard", estimated_jaccard(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b", "est_jaccard")
    )
    return pairs


def minhash_dedup(
    df: DataFrame, id_col: str = "id", text_col: str = "text", threshold: float = 0.7
) -> DataFrame:
    """df minus near-duplicates (per CC over candidate pairs; min id kept)."""
    pairs = minhash_candidate_pairs(df, id_col, text_col, threshold)
    comp = connected_components(
        pairs.select(F.col("a").cast("string"), F.col("b").cast("string"))
    )
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").cast("long").alias("_loser")
    )
    return df.join(losers, df[id_col] == F.col("_loser"), "left_anti")


# -------------------------------------------------------------------- simhash
def simhash(col, num_bits: int = 64):
    """Simhash of the word-token set as a ``num_bits``-char bit STRING.

    bit_i = sign of Σ_tokens (±1 per bit i of xxhash64(token)).  A bit
    string (not a long) because Spark's Python API only shifts by int
    literals — string slicing gives the same banding joins with plans
    that stay in whole-stage codegen.
    """
    # per-token 64-char two's-complement bit string, zero-padded
    bitstrs = F.transform(
        tokenize(col), lambda t: F.lpad(F.bin(F.xxhash64(t)), 64, "0")
    )
    return F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), F.lit(num_bits)),
            lambda i: F.when(
                F.aggregate(
                    bitstrs,
                    F.lit(0),
                    lambda acc, s: acc + F.when(s.substr(i, F.lit(1)) == "1", 1).otherwise(-1),
                )
                > 0,
                F.lit("1"),
            ).otherwise(F.lit("0")),
        ),
    )


def hamming_bits(a, b, num_bits: int = 64):
    """Hamming distance between equal-length bit strings (JVM-side)."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(num_bits)),
            lambda i: F.when(a.substr(i, F.lit(1)) == b.substr(i, F.lit(1)), 0).otherwise(1),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def simhash_pairs(
    df: DataFrame, id_col: str = "id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by simhash: block on 4 x 16-bit bands (any pair with
    Hamming ≤ 3 over 64 bits must agree exactly on ≥ 1 of 4 bands), then
    exact Hamming filter."""
    sh = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")), "id").select(
        "id", simhash(F.col("t")).alias("sh")
    )
    bands = sh.select(
        "id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda j: F.struct(
                    j.cast("int").alias("band"),
                    F.col("sh").substr(j * 16 + 1, F.lit(16)).alias("key"),
                ),
            )
        ).alias("b"),
    ).select("id", "sh", F.col("b.band").alias("band"), F.col("b.key").alias("key")).localCheckpoint()
    l, r = bands.alias("l"), bands.alias("r")
    return (
        l.join(r, on=["band", "key"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            hamming_bits(F.col("l.sh"), F.col("r.sh")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_dedup(df: DataFrame, id_col: str = "id", text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    pairs = simhash_pairs(df, id_col, text_col, max_hamming)
    comp = connected_components(pairs.select(F.col("a").cast("string"), F.col("b").cast("string")))
    losers = comp.filter(F.col("id") != F.col("component")).select(F.col("id").cast("long").alias("_loser"))
    return df.join(losers, df[id_col] == F.col("_loser"), "left_anti")


# ------------------------------------------------------------- ngram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 1000,
) -> DataFrame:
    """Exact character-n-gram Jaccard ≥ threshold for LSH candidates."""
    cand = minhash_candidate_pairs(df, id_col, text_col, threshold=threshold * 0.7, max_bucket=max_bucket)
    grams = df.select(F.col(id_col).alias("id"), char_shingles(F.col(text_col), n).alias("g"))
    ga = grams.select(F.col("id").alias("a"), F.col("g").alias("ga"))
    gb = grams.select(F.col("id").alias("b"), F.col("g").alias("gb"))
    return (
        cand.join(ga, "a")
        .join(gb, "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("ga", "gb"))
            / F.nullif(F.size(F.array_union("ga", "gb")).cast("double"), F.lit(0.0)),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------- embedding cosine
_PLANES_SEED = 1234


def _planes(dim: int, num_bits: int) -> np.ndarray:
    rng = np.random.default_rng(_PLANES_SEED)
    return rng.standard_normal((dim, num_bits)).astype(np.float32)


def hyperplane_sketch(dim: int, num_bits: int = 16):
    """pandas UDF: embedding → int64 sign-sketch (random hyperplane LSH).

    Cosine-similar vectors agree on most sign bits; planes are a fixed
    seeded matrix instantiated once per worker.
    """
    planes = _planes(dim, num_bits)

    @pandas_udf(LongType())
    def sketch(v: pd.Series) -> pd.Series:
        m = np.stack(v.map(lambda x: np.asarray(x, dtype=np.float32)))
        signs = (m @ planes) > 0
        weights = (1 << np.arange(num_bits, dtype=np.int64))
        return pd.Series((signs @ weights).astype(np.int64))

    return sketch


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    num_bits: int = 16,
) -> DataFrame:
    """Cosine ≥ threshold pairs: sketch-block (exact 16-bit agreement)
    then exact cosine re-rank.  High thresholds keep blocking recall
    honest: at cos ≥ 0.95 the probability all 16 sign bits agree is
    (1 - arccos(0.95)/π)^16 ≈ 0.27 per band; we use 4 rotated bands of the
    sketch bits via bit-rotation keys to boost recall."""
    sk = hyperplane_sketch(dim, num_bits)
    base = _spread(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")), "id").withColumn(
        "sk", sk(F.col("v"))
    )
    # 4 bands: overlapping half-width windows of the sketch bits → ORed
    # recall.  Arithmetic div/mod instead of bit shifts (the Python API
    # only shifts by int literals, not columns).
    half = 1 << (num_bits // 2)
    bands = base.select(
        "id",
        "v",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda j: F.struct(
                    j.cast("int").alias("band"),
                    F.pmod(
                        F.floor(F.col("sk") / F.pow(F.lit(2.0), (j * (num_bits // 4)).cast("double"))),
                        F.lit(half),
                    ).cast("long").alias("key"),
                ),
            )
        ).alias("b"),
    ).select("id", "v", F.col("b.band").alias("band"), F.col("b.key").alias("key")).localCheckpoint()
    l, r = bands.alias("l"), bands.alias("r")
    return (
        l.join(r, on=["band", "key"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"), F.col("l.v").alias("va"), F.col("r.v").alias("vb"))
        .distinct()
        .withColumn("cos", cosine("va", "vb"))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos"))
        .distinct()
    )
