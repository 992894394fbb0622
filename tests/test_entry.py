import sys

import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert rows
    assert df.columns == ["source", "doc_id", "tf", "matches_in_source"]


def test_queries_registry_sanity():
    qs, oracles = E.queries(), E.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)  # every oracle has a query
    # every rows-only query documents why (docstring mentions its gate)
    for name in set(qs) - set(oracles):
        assert qs[name].__doc__, name


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_each_query_runs_sf0001(spark, name):
    df = E.queries()[name](spark, SF)
    n = df.count()
    # empty results are only acceptable for selective filters; all current
    # queries are designed to return rows at sf0.001
    assert n > 0, name


def test_incremental_rebuild_canaries_emit_triples(spark):
    """The kg_incremental_rebuild gate works by LEAK DETECTION: the
    wave-1 stale content and the tombstoned scratch file must each emit
    triples, or supersede/tombstone breakage could never surface as an
    oracle mismatch.  Pin that the canary contents are live under the
    current extractor."""
    from sema_spark.operators.mentions import extract_triples, with_content_sha
    from sema_spark.schemas import REPOS

    rows = [
        {"repo": "r/r", "path": "src/a.py", "commit": "c", "lang": "py", "content": E._STALE_CONTENT},
        {"repo": "r/r", "path": "src/b.py", "commit": "c", "lang": "py", "content": E._ZOMBIE_CONTENT},
    ]
    src = with_content_sha(spark.createDataFrame(rows, REPOS))
    objs = {r.obj for r in extract_triples(src).collect()}
    assert any("stale_zombie_fn" in o for o in objs)
    assert any("doomed_tombstone_fn" in o for o in objs)


def test_every_oracle_binds_in_duckdb():
    """EXPLAIN each oracle against the sf0.001 views: catches SQL typos,
    missing expected-parquet files, and schema-binding breaks in
    seconds, without the full value comparison (tools/check_oracles)."""
    import duckdb

    oracles = E.oracle_sql()  # also (re)writes the expected parquet sets
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    for name, sql in oracles.items():
        try:
            con.execute("explain " + sql)
        except Exception as e:  # pragma: no cover - failure detail
            raise AssertionError(f"oracle {name} failed to bind: {e}") from e
