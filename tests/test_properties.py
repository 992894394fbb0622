"""Property-based tests (SURVEY §5.4): canonicalization forms a
partition; minhash estimates track true Jaccard."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

_ids = st.integers(min_value=0, max_value=30).map(lambda i: f"n{i:03d}")
_edge_sets = st.lists(st.tuples(_ids, _ids), min_size=1, max_size=25)


def _python_cc(pairs):
    """Union-find ground truth."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


class TestConnectedComponentsProperties:
    @given(_edge_sets)
    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    def test_matches_union_find(self, pairs):
        """Both execution tiers (driver union-find AND the distributed
        contraction + label-propagation path) must match ground truth."""
        from sema_spark.operators.canonicalize import connected_components
        from sema_spark.session import get_spark

        spark = get_spark(cores=4)
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            return
        edges = spark.createDataFrame(pairs, "a string, b string")
        expect = _python_cc(pairs)
        got_driver = {r.id: r.component for r in connected_components(edges).collect()}
        assert got_driver == expect
        got_dist = {
            r.id: r.component
            for r in connected_components(edges, driver_max_edges=0).collect()
        }
        assert got_dist == expect

    def test_partition_property(self):
        """Components partition the node set: every node exactly one
        component; component representative is a member; transitivity."""
        from sema_spark.operators.canonicalize import connected_components
        from sema_spark.session import get_spark

        spark = get_spark(cores=4)
        pairs = [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f2"), ("f2", "a")]
        edges = spark.createDataFrame(pairs, "a string, b string")
        rows = connected_components(edges).collect()
        seen = {}
        for r in rows:
            assert r.id not in seen  # exactly one assignment
            seen[r.id] = r.component
        comps = set(seen.values())
        for c in comps:
            assert seen[c] == c  # representative maps to itself
        assert seen["a"] == seen["c"] == seen["f"]  # transitive chain a-b-c, f-f2-a
        assert seen["d"] == seen["e"] != seen["a"]
