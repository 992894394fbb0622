import hashlib

from sema_spark.corpus import SCALES, corpus_df, generate_corpus


def test_deterministic():
    a_rows, a_tr = generate_corpus("xs")
    b_rows, b_tr = generate_corpus("xs")
    assert a_rows == b_rows
    assert a_tr == b_tr


def test_scale_counts():
    rows, triples = generate_corpus("xs")
    n_repos, base, _, _ = SCALES["xs"]
    assert len(rows) >= n_repos * base
    assert len(triples) > 100
    # every triple subj/obj references a known repo/path namespace
    paths = {f"{r.repo}/{r.path}" for r in rows}
    for s, p, o in triples:
        assert s.split("#")[0] in paths


def test_edge_files_present():
    rows, _ = generate_corpus("xs")
    by_path = {(r.repo, r.path): r for r in rows}
    tiny = next(r for r in rows if r.path == "src/tiny.py")
    assert len(tiny.content) < 50
    exact = next(r for r in rows if r.path == "src/exact1000.py")
    assert len(exact.content) == 1000
    notrail = next(r for r in rows if r.path == "src/notrail.py")
    assert not notrail.content.endswith("\n")
    # duplicate content appears in >1 repo (canonicalization fixture)
    dups = [r for r in rows if r.path == "src/dup_shared.py"]
    assert len(dups) > 1
    assert len({r.content for r in dups}) == 1
    assert len({hashlib.sha256(r.content.encode()).hexdigest() for r in dups}) == 1
    assert by_path  # sanity


def test_corpus_df_schema(spark):
    df = corpus_df(spark, "xs")
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    assert df.count() == len(generate_corpus("xs")[0])
