"""MinHash signatures and LSH banding — pure built-in higher-order
functions, entirely JVM-side.

Replaces the reference's Lance ANN index
(/root/reference/src/storage/lance_indexer.rs:107-141) with a
shuffle-friendly blocking scheme: token shingles → k-permutation minhash
signature → banded hashes → equi-join on (band_idx, band_hash).
Candidate pairs then get exact re-ranking (cosine or Jaccard), so LSH
only affects recall, never precision.

Permutations are ``((a_i * h(t) + b_i) mod P) mod 2^31`` with a single
base ``xxhash64`` per token; coefficients come from a fixed LCG seed so
signatures are stable across runs/processes (determinism is load-bearing:
triple parity is judged set-wise).  Bounds chosen so no 64-bit overflow:
h < 2**31, a,b < 2**31 ⇒ a*h+b < 2**62.  The final ``mod 2^31`` fold is
essential: a*h spans only [0, 2P), so values mod P alone are NOT
min-wise uniform (empirically 3/64 signature agreement at true J=0.78;
folding restores ~J·k agreement — see tests/test_functions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = (1 << 61) - 1  # Mersenne prime
_H_SPACE = 1 << 31

NUM_PERM = 64
LSH_BANDS = 16  # 16 bands x 4 rows; s-curve threshold ~ (1/16)^(1/4) ≈ 0.5


def choose_bands(threshold: float, num_perm: int = NUM_PERM) -> int:
    """Pick the band count whose S-curve midpoint (1/b)^(r/num_perm... )
    ≈ (1/b)^(1/r) sits at the requested similarity threshold.  A banding
    far below the threshold floods candidate generation: on corpora with
    small vocabularies (boilerplate), 16x4 banding at threshold 0.7
    produced near-N² candidates (measured 77s for 5k docs)."""
    best, best_gap = LSH_BANDS, 1e9
    b = 2
    while b <= num_perm:
        r = num_perm // b
        mid = (1.0 / b) ** (1.0 / r)
        gap = abs(mid - threshold)
        if gap < best_gap:
            best, best_gap = b, gap
        b *= 2
    return best


def _coefficients(num_perm: int, seed: int = 42) -> tuple[list[int], list[int]]:
    # fixed LCG (MMIX constants) — deterministic, no RNG state dependency
    state = seed
    out = []
    for _ in range(2 * num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) & ((1 << 63) - 1)
        out.append(state % (_H_SPACE - 1) + 1)
    return out[:num_perm], out[num_perm:]


def tokenize(col: Column | str, pattern: str = "[^a-z0-9]+") -> Column:
    """Lowercased word-token set (distinct, no empties)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.array_distinct(F.split(F.lower(col), pattern)), "")


def char_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct character k-shingles in ONE compiled regex pass.

    ``(?s)(?=(.{k}))`` captures the k chars starting at every position
    via a zero-width lookahead (the standard overlapping-match trick);
    DOTALL keeps newline-crossing shingles, matching plain substring
    semantics.  Replaces the round-1..3 sequence+substr HOF — transform
    lambdas are interpreted per element, one substr per char position,
    which made shingling the single hottest step of the minhash family
    (measured at sf0.1: 3.6s HOF → 0.8s regex, sets identical on every
    doc incl. short/empty/newline/case edges)."""
    col = F.lower(F.col(col) if isinstance(col, str) else col)
    return F.array_distinct(
        F.regexp_extract_all(col, F.lit(f"(?s)(?=(.{{{k}}}))"), 1)
    )


def _base_hash(t: Column, base: str) -> Column:
    """Per-token base hash < 2^31.  ``xxhash64`` is the fast JVM default;
    ``sha`` derives the hash from the first 8 hex chars of sha256 so a
    DuckDB oracle can compute the IDENTICAL value (xxhash64 does not
    exist there) — the same trick simhash uses for its oracle."""
    if base == "sha":
        return F.pmod(F.conv(F.substring(F.sha2(t, 256), 1, 8), 16, 10).cast("long"), F.lit(_H_SPACE))
    return F.pmod(F.xxhash64(t), F.lit(_H_SPACE))


def minhash_signature(tokens: Column, num_perm: int = NUM_PERM, base: str = "xxhash64") -> Column:
    """array<bigint> minhash signature of a token array."""
    a_co, b_co = _coefficients(num_perm)
    hs = F.transform(tokens, lambda t: _base_hash(t, base))
    pairs = F.arrays_zip(
        F.array(*[F.lit(a) for a in a_co]).alias("a"),
        F.array(*[F.lit(b) for b in b_co]).alias("b"),
    )
    return F.transform(
        pairs,
        lambda p: F.coalesce(
            F.array_min(
                F.transform(
                    hs,
                    lambda h: F.pmod(F.pmod(p["a"] * h + p["b"], F.lit(_P)), F.lit(_H_SPACE)),
                )
            ),
            F.lit(_P),  # empty token set → sentinel signature value
        ),
    )


def lsh_bands(sig: Column, bands: int = LSH_BANDS, num_perm: int = NUM_PERM) -> Column:
    """array<struct<band:int, bh:bigint>> — hash per signature band."""
    rows = num_perm // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.struct(
            j.cast("int").alias("band"),
            F.xxhash64(F.concat_ws("_", F.slice(sig, j * rows + 1, rows)), j).alias("bh"),
        ),
    )


def token_base_hashes(tokens: Column, base: str = "xxhash64") -> Column:
    """array<bigint>: base hash mod 2^31 per token — the single JVM-side
    pass shared by BOTH signature paths, which is what makes the Arrow
    path value-identical to the HOF path."""
    return F.transform(tokens, lambda t: _base_hash(t, base))


def signature_from_hashes_udf(num_perm: int = NUM_PERM):
    """Arrow-batched numpy permutation-min over precomputed base hashes.

    The hybrid fast path: Spark computes one xxhash64 per token (a single
    interpreted-HOF pass), numpy does the num_perm×tokens permutation
    grid that made the pure-HOF path the round-1 bench hotspot (HOF
    lambdas are interpreted, not codegen'd — 64 interpreted passes,
    ~2ms/doc/core measured).  Identical arithmetic in uint64 —
    ``(a*h+b) mod P mod 2^31`` with a,h < 2^31 so a*h+b < 2^63 never
    overflows — makes it VALUE-IDENTICAL to :func:`minhash_signature`
    (asserted in tests/test_minhash_paths.py), so flipping paths can
    never change dedup results."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    a_co, b_co = _coefficients(num_perm)
    A = np.array(a_co, dtype=np.uint64)[:, None]
    B = np.array(b_co, dtype=np.uint64)[:, None]
    sentinel = [int(_P)] * num_perm

    def sig_one(hashes) -> list[int]:
        if hashes is None or len(hashes) == 0:
            return sentinel
        h = np.asarray(hashes, dtype=np.uint64)[None, :]
        m = (A * h + B) % _P % _H_SPACE
        return m.min(axis=1).astype(np.int64).tolist()

    # no type hints: they'd be unresolvable strings in this local scope
    def _impl(s):
        return s.map(sig_one)

    return pandas_udf(_impl, ArrayType(LongType()))


# per-worker token→base-hash memo for the sha base (a pure function;
# corpora repeat a small vocabulary, so one hashlib call per DISTINCT
# token replaces one interpreted JVM sha2+conv per token OCCURRENCE —
# measured the dominant cost of the sha signature stage at sf1.0).
# Bounded like the simhash memo.
_SHA_BASE_MEMO: dict[str, int] = {}


def signature_from_tokens_sha_udf(num_perm: int = NUM_PERM):
    """token array → minhash signature with the sha base hash computed
    in Python under a per-worker distinct-token memo.  VALUE-IDENTICAL
    to the JVM path: ``int(sha256(t).hexdigest()[:8], 16) % 2^31`` is
    exactly ``pmod(conv(substring(sha2(t,256),1,8),16,10), 2^31)``
    (asserted in tests/test_minhash_paths.py), and the permutation grid
    is the same uint64 arithmetic as signature_from_hashes_udf."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    a_co, b_co = _coefficients(num_perm)
    A = np.array(a_co, dtype=np.uint64)[:, None]
    B = np.array(b_co, dtype=np.uint64)[:, None]
    sentinel = [int(_P)] * num_perm

    def sig_one(tokens) -> list[int]:
        if tokens is None or len(tokens) == 0:
            return sentinel
        memo = _SHA_BASE_MEMO
        if len(memo) > 1_000_000:
            memo.clear()
        vals = []
        for t in tokens:
            v = memo.get(t)
            if v is None:
                v = int(hashlib.sha256(t.encode("utf-8")).hexdigest()[:8], 16) % _H_SPACE
                memo[t] = v
            vals.append(v)
        h = np.asarray(vals, dtype=np.uint64)[None, :]
        m = (A * h + B) % _P % _H_SPACE
        return m.min(axis=1).astype(np.int64).tolist()

    def _impl(s):
        return s.map(sig_one)

    return pandas_udf(_impl, ArrayType(LongType()))


def with_minhash(
    df: DataFrame,
    text_col: str = "content",
    shingle_words: bool = True,
    num_perm: int = NUM_PERM,
    bands: int = LSH_BANDS,
    use_arrow: bool = True,
    base: str = "xxhash64",
    tokens_ready: bool = False,
) -> DataFrame:
    """Add mh_sig + mh_bands.  Both paths produce IDENTICAL signatures;
    the Arrow hybrid is the default (the pure-HOF path was the round-1
    bench hotspot), the HOF path remains as the no-Python-workers option
    and as the independent implementation the equality test checks
    against.  ``base="sha"`` makes signatures DuckDB-replicable (see
    :func:`_base_hash`).  ``tokens_ready=True`` means ``text_col``
    already holds the token/shingle ARRAY (callers that shingled once
    for their own verify tier pass it through instead of paying the
    shingle scan twice)."""
    if tokens_ready:
        tokens = F.col(text_col)
    else:
        tokens = tokenize(text_col) if shingle_words else char_shingles(text_col)
    if use_arrow:
        if base == "sha":
            # r7: the sha base hash moves into the Python batch under a
            # distinct-token memo (bit-identical — see the UDF)
            sig = signature_from_tokens_sha_udf(num_perm)(tokens)
        else:
            sig = signature_from_hashes_udf(num_perm)(token_base_hashes(tokens, base))
    else:
        sig = minhash_signature(tokens, num_perm, base)
    return df.withColumn("mh_sig", sig).withColumn(
        "mh_bands", lsh_bands(F.col("mh_sig"), bands, num_perm)
    )


def explode_bands(df: DataFrame, id_cols: list[str]) -> DataFrame:
    """(id..., band, bh) rows — the LSH bucket join key."""
    return df.select(*id_cols, F.explode("mh_bands").alias("b")).select(
        *id_cols, F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )


def estimated_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Signature agreement rate — unbiased Jaccard estimate."""
    return F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.size(sig_a)


def estimated_jaccard_arrow(sig_a: Column, sig_b: Column) -> Column:
    """Arrow-batched :func:`estimated_jaccard` — VALUE-IDENTICAL (the
    agreement count is an exact integer, so no summation-order concern
    exists, and count/size is the same int/int→double quotient the HOF
    form produces; asserted in tests/test_minhash_paths.py).  The HOF
    form is 64 interpreted lambda evaluations per pair — the measured
    hot half of the star-edge verify at sf1.0."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _est(sa, sb):
        if len(sa) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(sa.map(lambda x: np.asarray(x, dtype=np.int64)))
        B = np.stack(sb.map(lambda x: np.asarray(x, dtype=np.int64)))
        return pd.Series((A == B).sum(axis=1) / A.shape[1])

    return _est(sig_a, sig_b)
