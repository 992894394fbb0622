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
