"""Tantivy-subset query parser + BM25 search semantics."""

import pytest

from sema_spark.operators.search import ParsedQuery, bm25_search, parse_query


def test_parse_query_clauses():
    pq = parse_query('spark "Hash  Join" +shuffle -python CATALYST')
    assert pq.should == ("spark", "catalyst")
    assert pq.must == ("shuffle",)
    assert pq.must_not == ("python",)
    assert pq.phrases == ("hash join",)
    # scored = should + must + phrase words, deduped, order-stable
    assert pq.scored_terms == ("spark", "catalyst", "shuffle", "hash", "join")


def test_parse_query_empty_phrase_and_punct():
    pq = parse_query('"" +x-y foo.bar')
    assert pq.phrases == ()
    assert pq.must == ("x", "y")  # punctuation splits into words
    assert pq.should == ("foo", "bar")


def test_bm25_search_constraints(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join window"),          # no phrase → dropped
            (2, "hash join spark shuffle"),            # all constraints pass
            (3, "hash join spark python shuffle"),     # -python → dropped
            (4, "hash join window sort"),              # no +shuffle → dropped
            (5, "spark spark spark hash join shuffle"),  # passes, more tf
        ],
        "doc_id long, text string",
    )
    out = bm25_search(docs, 'spark "hash join" +shuffle -python', k=10)
    rows = out.collect()
    assert [r.doc_id for r in rows] == [5, 2]  # 5 outscores 2 on spark tf
    assert all(r.score > 0 for r in rows)


def test_bm25_search_requires_scorable_terms(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_search(docs, "-only -negations")


def test_phrase_is_token_adjacency_not_substring(spark):
    docs = spark.createDataFrame(
        [
            (1, "we resort keyed maps hash shuffle"),  # substring 'sort key' but not tokens
            (2, "please sort, key hash shuffle now"),  # punctuation-adjacent tokens → match
            (3, "sort the key hash shuffle"),          # tokens present but not adjacent
        ],
        "doc_id long, text string",
    )
    out = bm25_search(docs, '"sort key" +hash', k=10)
    assert {r.doc_id for r in out.collect()} == {2}
