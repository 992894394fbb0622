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
