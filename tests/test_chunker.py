import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from sema_spark.corpus import corpus_df, generate_corpus
from sema_spark.operators.chunker import (
    CHUNK_SIZE,
    MIN_CHUNK_SIZE,
    OVERLAP_SIZE,
    chunk_files,
    chunk_python,
)


def test_small_file_no_chunks():
    assert chunk_python("x" * (MIN_CHUNK_SIZE - 1)) == []
    assert chunk_python("") == []


def test_single_chunk_file():
    text = "line one\nline two\nline three\n" + "x" * 40
    chunks = chunk_python(text)
    assert len(chunks) == 1
    idx, sl, el, content = chunks[0]
    assert (idx, sl) == (0, 1)
    assert content == text
    assert el == text.count("\n") + 1


def test_exactly_1000_chars():
    """Reference quirk (processor.rs:41-82): when the file is exactly
    CHUNK_SIZE, the loop re-enters at start=900 and emits the 100-byte
    tail again as chunk 1.  We preserve that behavior for parity."""
    text = "a" * 1000
    chunks = chunk_python(text)
    assert len(chunks) == 2
    assert chunks[0][3] == text
    assert chunks[1][3] == "a" * OVERLAP_SIZE


def test_overlap_and_newline_snap():
    text = "".join(f"line {i:04d} padded out to be long\n" for i in range(200))
    chunks = chunk_python(text)
    assert len(chunks) > 1
    for idx, (i, sl, el, content) in enumerate(chunks):
        assert i == idx
        assert content.endswith("\n")  # snapped to newline
        assert len(content.encode()) <= CHUNK_SIZE
    # overlap: next chunk starts at most OVERLAP_SIZE bytes before prev end
    joined = "".join(c[3] for c in chunks)
    assert len(joined) >= len(text)  # full coverage (overlap re-reads)
    # line numbers are monotone and consistent
    for (_, sl1, _, _), (_, sl2, _, _) in zip(chunks, chunks[1:]):
        assert sl2 >= sl1


def test_multibyte_boundary():
    text = "é" * 1200  # 2 bytes each → boundary at 1000 falls mid-char
    chunks = chunk_python(text)
    assert chunks
    for _, _, _, content in chunks:
        assert "�" not in content
        assert len(content.encode()) <= CHUNK_SIZE


@given(st.text(min_size=0, max_size=5000))
@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_chunker_properties(text):
    chunks = chunk_python(text)
    b = text.encode()
    if len(b) < MIN_CHUNK_SIZE:
        assert chunks == []
        return
    assert chunks
    # coverage: concatenation minus overlaps reconstructs the text
    # (verify via byte accounting: first chunk starts at 0; consecutive
    # chunk starts advance; end of last chunk == end of text)
    for i, (idx, sl, el, content) in enumerate(chunks):
        assert idx == i
        assert sl >= 1 and el >= sl
        cb = content.encode()
        assert len(cb) <= CHUNK_SIZE
        if not (i == 0 and len(chunks) == 1):
            assert len(cb) >= MIN_CHUNK_SIZE or i == 0
    assert text.endswith(chunks[-1][3])  # last chunk reaches EOF
    assert text.startswith(chunks[0][3])  # first chunk starts at 0


def test_spark_chunker_matches_python(spark):
    rows, _ = generate_corpus("xs")
    got = chunk_files(corpus_df(spark, "xs")).collect()
    by_file: dict[tuple, list] = {}
    for r in got:
        by_file.setdefault((r.repo, r.path), []).append(r)
    for fr in rows:
        expect = chunk_python(fr.content)
        have = sorted(by_file.get((fr.repo, fr.path), []), key=lambda r: r.chunk_idx)
        assert len(have) == len(expect), (fr.repo, fr.path)
        for r, (idx, sl, el, content) in zip(have, expect):
            assert (r.chunk_idx, r.start_line, r.end_line, r.content) == (idx, sl, el, content)
            assert r.id == f"{fr.repo}/{fr.path}:{idx}"  # repo-qualified: no cross-repo collisions
