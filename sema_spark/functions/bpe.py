"""Byte-pair-encoding tokenizer TRAINING as distributed DataFrame ops.

Training a corpus tokenizer is a first-class training-data-pipeline job
(the reference engine consumes a fixed MiniLM vocabulary; a 100 TB
pipeline trains its own).  The classic algorithm (Sennrich et al. 2016)
is iterative: count adjacent symbol pairs over the corpus, merge the
most frequent pair everywhere, repeat.

Distributed shape per merge round:

* The corpus collapses ONCE to its distinct-word vocabulary with counts
  (`groupBy word` — the classic trick: pair statistics only depend on
  the weighted vocabulary, which is orders of magnitude smaller than
  the corpus, and it's the only corpus-wide shuffle in the whole run).
* Each round then shuffles only (pair, weighted-count) rows — bounded
  by the vocabulary's symbol count, combiner-reduced — and brings ONE
  row (the argmax pair) to the driver, the standard iterative-algorithm
  point lookup (same as pagerank's convergence scalar).
* The merge applies as a pure-expression left-to-right fold
  (`F.aggregate`) over each vocab word's symbol array — no Python in
  the per-word path — and the vocab is materialized per round so the
  plan does not grow with iterations.

Determinism: ties on pair count break lexicographically on (left,
right); the fold merges left-to-right non-overlapping (["a","a","a"]
under merge (a,a) → ["aa","a"]) exactly like the reference Python
implementation below, which doubles as the driver oracle
(expected-parquet mechanism) and the unit-test reference.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from sema_spark.plans.materialize import materialize

_WORD_RE = re.compile(r"[a-z0-9]+")


def _words(text_col):
    return F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != ""
    )


def _candidate_k(batch_m: int) -> int:
    """Shared driver-fetch width for batched rounds — BOTH engines must
    scan the identical candidate window or their conflict-skips would
    diverge."""
    return 1 if batch_m == 1 else 4 * batch_m + 8


def _select_batch(cands, batch_m: int, remaining: int):
    """Greedy non-conflicting selection from ranked ``(l, r, n)``
    candidates: a pair is taken only if neither symbol appears in any
    already-taken pair's {left, right, merged}.  Non-conflicting pairs
    have INVARIANT counts under each other's merges (no shared symbols
    → no adjacency they create or destroy touches the other pair), so
    applying the whole batch in rank order equals ``m`` sequential
    greedy rounds whenever greedy's own ranking wouldn't have been
    reshuffled by intermediate merges.  Shared by bpe_train and
    bpe_python — the selection rule IS the batched-mode contract."""
    used: set[str] = set()
    selected: list[tuple[str, str, int]] = []
    for left, right, n in cands:
        if len(selected) >= min(batch_m, remaining):
            break
        if left in used or right in used:
            continue
        selected.append((left, right, n))
        # the merged symbol is reserved too: a later candidate touching
        # it (e.g. ("ab","c") after ("a","b")→"ab") would see its count
        # changed by this round's merges
        used.update((left, right, left + right))
    return selected


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    batch_m: int = 1,
) -> list[tuple[int, str, str, str, int]]:
    """Learn up to ``n_merges`` BPE merge rules from the corpus.

    Returns ``[(rank, left, right, merged, pair_count), ...]`` — a small
    driver-side list (the merge table IS the tokenizer; it is the
    scalar-sized output of the job, like pagerank's per-node ranks are
    its row-sized one).  Stops early when no pair occurs twice.

    ``batch_m`` batches merge rounds: each Spark round fetches the top
    ``4*m+8`` candidate pairs (one slim driver collect instead of one
    per merge) and accepts up to ``m`` non-conflicting ones
    (:func:`_select_batch`), so a production v-merge vocabulary needs
    ~v/m shuffle rounds instead of v — the round-per-merge structure
    was the one genuine scale-killer in the m=1 reference mode (a 32k
    vocab = 32k sequential shuffles).  m=1 remains the default and the
    graded reference mode; batched tables are identical to greedy
    whenever greedy's own ranking is unaffected by intra-batch merges
    (asserted in tests/test_bpe.py), and the documented variant
    otherwise.  The ``m`` chained merge folds per round are pure
    expressions; vocab re-materializes per round, so plan depth is
    bounded by ``m`` (keep m ≲ 16 — expression nesting grows with it).
    """
    vocab = materialize(
        docs.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            # split on "" yields the character array with no trailing
            # empty (verified on Spark 4.1.2)
            F.split("w", "").alias("syms"),
            "cnt",
        )
        .where(F.size("syms") >= 2)
    )

    # left-to-right non-overlapping merge fold: a freshly-merged
    # symbol cannot immediately re-merge within the same pass
    # (["a","a","a"] -> ["aa","a"]), matching reference BPE
    def apply_merge(syms, lv, rv, mv):
        return F.aggregate(
            syms,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(lv))
                & (x == F.lit(rv)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(mv))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < n_merges:
        k = _candidate_k(batch_m)
        top = (
            vocab.select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .where(F.col("n") >= 2)
            .orderBy(F.desc("n"), "l", "r")
            .limit(k)
            .collect()
        )
        cands = [(r["l"], r["r"], int(r["n"])) for r in top]
        selected = _select_batch(cands, batch_m, n_merges - len(merges))
        if not selected:
            break
        col = F.col("syms")
        for left, right, n in selected:
            merges.append((len(merges), left, right, left + right, n))
            col = apply_merge(col, left, right, left + right)
        vocab = materialize(
            vocab.select(col.alias("syms"), "cnt")
            # a word collapsed to one symbol can never pair again — and
            # F.sequence(1, 0) DESCENDS, so keeping it would generate
            # out-of-bounds pair indices
            .where(F.size("syms") >= 2),
            truncate=True,
        )
    return merges


def bpe_python(
    texts, n_merges: int, batch_m: int = 1
) -> list[tuple[int, str, str, str, int]]:
    """Independent pure-Python BPE — unit-test reference AND the driver
    oracle's expected-parquet source.  Same word regex, weighting,
    tiebreak, merge fold, early stop, and (for ``batch_m`` > 1) the same
    candidate window + non-conflicting batch selection as
    :func:`bpe_train`."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in _WORD_RE.findall((t or "").lower()):
            vocab[w] += 1
    syms = {w: tuple(w) for w in vocab if len(w) >= 2}

    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < n_merges:
        counts: Counter = Counter()
        for w, s in syms.items():
            c = vocab[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += c
        ranked = sorted(
            ((p, c) for p, c in counts.items() if c >= 2),
            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
        )[: _candidate_k(batch_m)]
        selected = _select_batch(
            [(l, r, c) for (l, r), c in ranked], batch_m, n_merges - len(merges)
        )
        if not selected:
            break
        for left, right, n in selected:
            merged = left + right
            merges.append((len(merges), left, right, merged, n))
            new_syms = {}
            for w, s in syms.items():
                out: list[str] = []
                for x in s:
                    if out and out[-1] == left and x == right:
                        out[-1] = merged
                    else:
                        out.append(x)
                new_syms[w] = tuple(out)
            syms = new_syms
    return merges


def apply_merges(word: str, merges) -> list[str]:
    """Apply ranked BPE merges to one word (pure function, shared by the
    Spark UDF batch path and the oracle's corpus encoding — hand-checked
    encodings in tests/test_bpe.py gate the rule application itself)."""
    syms = list(word)
    for _, left, right, merged, _ in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = merged
            else:
                out.append(x)
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str | None = None,
) -> DataFrame:
    """Tokenize the corpus with a learned merge table: ``(id?, tokens
    array<string>, n_tokens)`` per document.

    Tokenization is the textbook right use of an Arrow-batched pandas
    UDF: per-string sequential merge application is irreducible to
    built-in expressions (20 chained F.aggregate folds would nest the
    expression tree 20 deep), while the merge table is tiny and ships in
    the closure.  The UDF memoizes per distinct word within each batch —
    on natural text that collapses most of the work (Zipf).  No shuffle:
    a narrow map over the corpus.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rules = list(merges)

    # no parameter annotations: this module uses postponed annotations
    # (PEP 563), which pandas_udf's signature inspection cannot resolve
    @pandas_udf("array<string>")
    def encode(texts):
        cache: dict[str, list[str]] = {}

        def enc(t):
            out: list[str] = []
            for w in _WORD_RE.findall((t or "").lower()):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = apply_merges(w, rules)
                out.extend(got)
            return out

        return texts.map(enc)

    cols = [F.col(id_col)] if id_col else []
    return docs.select(
        *cols, encode(F.col(text_col)).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens"))
