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


class TestCodecProperties:
    """Pure-python codecs: encode→decode is the identity for every
    geometry and content (no Spark involved — these run fast enough
    for hypothesis)."""

    @given(
        st.integers(min_value=1, max_value=40),
        st.integers(min_value=1, max_value=23),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_image_codecs_round_trip(self, w, h, seed):
        import numpy as np

        from sema_spark.operators.multimodal import (
            decode_bmp,
            decode_png,
            decode_ppm,
            encode_bmp,
            encode_png,
            encode_ppm,
        )

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(px)), px)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)
        # h >= 5 exercises all five PNG scanline filters; smaller h
        # exercises a prefix of them — both must reconstruct
        assert np.array_equal(decode_png(encode_png(px)), px)

    @given(
        st.integers(min_value=1, max_value=30),
        st.integers(min_value=1, max_value=30),
        st.integers(min_value=1, max_value=30),
        st.integers(min_value=1, max_value=30),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_resize_matches_index_map(self, w, h, ow, oh, seed):
        import numpy as np

        from sema_spark.operators.multimodal import resize_nearest

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = resize_nearest(px, ow, oh)
        assert out.shape == (oh, ow, 3)
        for i in (0, oh - 1):
            for j in (0, ow - 1):
                assert (out[i, j] == px[(i * h) // oh, (j * w) // ow]).all()

    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=400
        ),
        st.sampled_from([8000, 16000, 44100]),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_round_trip(self, samples, rate):
        import numpy as np

        from sema_spark.operators.multimodal import decode_wav, encode_wav_pcm16

        arr = np.array(samples, dtype=np.int16)
        got_rate, got = decode_wav(encode_wav_pcm16(arr, rate))
        assert got_rate == rate and np.array_equal(got, arr)
