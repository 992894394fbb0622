from sema_spark.corpus import corpus_df, write_corpus
from sema_spark.operators.mentions import extract_triples
from sema_spark.streaming.ingest import run_triples_stream, windowed_event_counts


def test_streaming_matches_batch(spark, tmp_path):
    """The same operator graph under readStream produces the same triple
    set as the batch run (dedup'd for comparison)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_corpus(spark, src, "xs")
    q = run_triples_stream(spark, src, out, ckpt)
    q.awaitTermination(300)
    got = {
        (r.subj, r.pred, r.obj)
        for r in spark.read.parquet(out).select("subj", "pred", "obj").distinct().collect()
    }
    expect = {
        (r.subj, r.pred, r.obj)
        for r in extract_triples(corpus_df(spark, "xs")).select("subj", "pred", "obj").collect()
    }
    assert got == expect


def test_streaming_incremental_new_files_only(spark, tmp_path):
    """New source files are picked up; already-processed ones are not
    re-emitted (file-source checkpoint semantics)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_corpus(spark, src, "xs")
    run_triples_stream(spark, src, out, ckpt).awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    extra = spark.createDataFrame(
        [("org9/new", "src/late.py", "f" * 40, "py",
          '"""late arrival."""\nimport os\n\n\ndef late_fn(x):\n    y = late_fn(x)\n    return y\n')],
        "repo string, path string, commit string, lang string, content string",
    )
    extra.write.mode("append").parquet(src)
    run_triples_stream(spark, src, out, ckpt).awaitTermination(300)
    df = spark.read.parquet(out)
    assert df.count() > n1
    new_rows = df.filter("repo = 'org9/new'")
    assert {r.obj for r in new_rows.select("obj").collect()} == {
        "os", "org9/new/src/late.py#late_fn", "late_fn",
    }
    # old rows not duplicated
    assert df.count() == n1 + new_rows.count()


def test_windowed_event_counts_batch_parity(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(events).collect()
    assert out
    total = sum(r.n for r in out)
    assert total == events.count()
