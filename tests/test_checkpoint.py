import pytest
from pyspark.sql import functions as F

from sema_spark.corpus import corpus_df
from sema_spark.operators.mentions import extract_triples, with_content_sha
from sema_spark.sources import checkpoint as ck


@pytest.fixture()
def src(spark):
    return with_content_sha(corpus_df(spark, "xs"))


def _transform(pending):
    return extract_triples(pending, apply_filters=True, dedup=True)


def test_incremental_run_and_skip(spark, src, tmp_path):
    base = str(tmp_path / "kg")
    r1 = ck.run_incremental_stage(spark, src, "triples", base, _transform)
    assert not r1.skipped and r1.output_rows > 0
    out1 = ck.read_stage_output(spark, base, "triples")
    n1 = out1.count()
    assert n1 == r1.output_rows

    # identical rerun → everything skipped, snapshot unchanged
    r2 = ck.run_incremental_stage(spark, src, "triples", base, _transform)
    assert r2.skipped and r2.input_files == 0
    assert ck.read_stage_output(spark, base, "triples").count() == n1


def test_changed_file_supersedes(spark, src, tmp_path):
    base = str(tmp_path / "kg")
    ck.run_incremental_stage(spark, src, "triples", base, _transform)
    before = {
        (r.subj, r.pred, r.obj)
        for r in ck.read_stage_output(spark, base, "triples")
        .filter("path = 'src/m0.py' and repo = 'org0/proj0'")
        .collect()
    }
    assert before

    mutated = with_content_sha(
        src.drop("content_sha").withColumn(
            "content",
            F.when(
                (F.col("repo") == "org0/proj0") & (F.col("path") == "src/m0.py"),
                F.lit('"""changed."""\nimport zz_new_module\n# padding to pass the fifty char guard\n'),
            ).otherwise(F.col("content")),
        )
    )
    r = ck.run_incremental_stage(spark, mutated, "triples", base, _transform)
    assert r.input_files == 1  # only the changed file reprocessed
    after_rows = (
        ck.read_stage_output(spark, base, "triples")
        .filter("path = 'src/m0.py' and repo = 'org0/proj0'")
        .collect()
    )
    after = {(r.subj, r.pred, r.obj) for r in after_rows}
    assert after == {("org0/proj0/src/m0.py", "imports", "zz_new_module")}
    assert not (before & after)  # old rows invisible


def test_before_run_time_travel(spark, src, tmp_path):
    """current_checkpoint/read_stage_output(before_run=...) reconstruct
    the state as of before a given run committed — superseded versions
    stay readable until compaction."""
    base = str(tmp_path / "kg")
    r1 = ck.run_incremental_stage(spark, src, "triples", base, _transform)
    before = {
        (r.subj, r.pred, r.obj)
        for r in ck.read_stage_output(spark, base, "triples").collect()
    }
    mutated = with_content_sha(
        src.drop("content_sha").withColumn(
            "content",
            F.when(
                (F.col("repo") == "org0/proj0") & (F.col("path") == "src/m0.py"),
                F.lit('"""changed."""\nimport zz_new_module\n# padding to pass the fifty char guard\n'),
            ).otherwise(F.col("content")),
        )
    )
    r2 = ck.run_incremental_stage(spark, mutated, "triples", base, _transform)
    # as-of before r2: the ORIGINAL state, byte-for-byte
    asof = {
        (r.subj, r.pred, r.obj)
        for r in ck.read_stage_output(spark, base, "triples", before_run=r2.run_id).collect()
    }
    assert asof == before
    now = {
        (r.subj, r.pred, r.obj)
        for r in ck.read_stage_output(spark, base, "triples").collect()
    }
    assert now != before
    # as-of before the first run: empty state
    assert ck.current_checkpoint(spark, base, "triples", before_run=r1.run_id).count() == 0


def test_crash_before_checkpoint_reprocesses(spark, src, tmp_path):
    """Data written, checkpoint append never happened → rows invisible,
    rerun re-processes (reference ordering, src/storage/mod.rs:59-67)."""
    base = str(tmp_path / "kg")
    orphan_rid = "00000000T000000-deadbeef"
    _transform(src).withColumn("run_id", F.lit(orphan_rid)).write.mode("append").partitionBy(
        "run_id"
    ).parquet(f"{base}/triples/data")
    # orphan rows are not visible
    assert ck.current_checkpoint(spark, base, "triples").count() == 0
    assert ck.read_stage_output(spark, base, "triples").count() == 0
    # rerun processes everything (never skips unprocessed work)
    r = ck.run_incremental_stage(spark, src, "triples", base, _transform)
    assert not r.skipped
    assert ck.read_stage_output(spark, base, "triples").count() == r.output_rows


def test_tombstone_delete(spark, src, tmp_path):
    base = str(tmp_path / "kg")
    ck.run_incremental_stage(spark, src, "triples", base, _transform)
    victim = spark.createDataFrame([("org0/proj0", "src/m0.py")], "repo string, path string")
    ck.delete_files(spark, base, "triples", victim)
    out = ck.read_stage_output(spark, base, "triples")
    assert out.filter("repo = 'org0/proj0' and path = 'src/m0.py'").count() == 0
    assert out.count() > 0


def test_lineage_rows(spark, src, tmp_path):
    base = str(tmp_path / "kg")
    r = ck.run_incremental_stage(spark, src, "triples", base, _transform)
    lin = ck.read_lineage(spark, base, "triples")
    rows = lin.filter(F.col("run_id") == r.run_id).collect()
    assert rows and sum(x.rows for x in rows) == r.output_rows


def test_compact_incremental_stage(spark, src, tmp_path):
    """compact() rewrites the log-structured stage to one live run and
    SWAPS it in: snapshot identical, superseded/tombstoned rows gone
    from disk, checkpoint log collapsed to the compacted run."""
    base = str(tmp_path / "kg")
    ck.run_incremental_stage(spark, src, "triples", base, _transform)
    mutated = with_content_sha(
        src.drop("content_sha").withColumn(
            "content",
            F.when(
                (F.col("repo") == "org0/proj0") & (F.col("path") == "src/m0.py"),
                F.lit('"""changed."""\nimport zz_compact\n# padding to pass the fifty char guard\n'),
            ).otherwise(F.col("content")),
        )
    )
    ck.run_incremental_stage(spark, mutated, "triples", base, _transform)
    victim = spark.createDataFrame([("org0/proj0", "src/m1.py")], "repo string, path string")
    ck.delete_files(spark, base, "triples", victim)

    before = {
        (r.subj, r.pred, r.obj)
        for r in ck.read_stage_output(spark, base, "triples").select("subj", "pred", "obj").collect()
    }
    raw_before = spark.read.parquet(f"{base}/triples/data").count()

    rid = ck.compact(spark, base, "triples")
    after = {
        (r.subj, r.pred, r.obj)
        for r in ck.read_stage_output(spark, base, "triples").select("subj", "pred", "obj").collect()
    }
    assert after == before  # reader-visible snapshot unchanged
    raw = spark.read.parquet(f"{base}/triples/data")
    assert raw.count() < raw_before  # superseded + tombstoned rows physically gone
    assert {r.run_id for r in raw.select("run_id").distinct().collect()} == {rid}
    log = ck.read_checkpoint_log(spark, base, "triples")
    assert {r.run_id for r in log.select("run_id").distinct().collect()} == {rid}
    assert log.filter(F.col("content_sha") == ck.TOMBSTONE).count() == 0
    # incremental still works after compaction: rerunning the ORIGINAL
    # src reprocesses exactly m0.py (sha differs from the compacted
    # mutated version) and m1.py (tombstone dropped with its data)
    r = ck.run_incremental_stage(spark, src, "triples", base, _transform)
    assert not r.skipped and r.input_files == 2


def test_compact_snapshot_stage(spark, src, tmp_path):
    base = str(tmp_path / "kg")
    keys = src.select("repo", "path", "content_sha")
    ck.run_snapshot_stage(spark, keys, "nodes", base, lambda: src.select("repo", "path"))
    # second snapshot with different input → supersedes the first
    ck.run_snapshot_stage(
        spark, keys.limit(10), "nodes", base, lambda: src.select("repo", "path").limit(10)
    )
    before = ck.read_snapshot(spark, base, "nodes").count()
    raw_before = spark.read.parquet(f"{base}/nodes/data").count()
    assert raw_before > before  # old snapshot still on disk
    rid = ck.compact(spark, base, "nodes")
    assert ck.read_snapshot(spark, base, "nodes").count() == before
    assert spark.read.parquet(f"{base}/nodes/data").count() == before
    # fingerprint preserved → unchanged input still skips
    r = ck.run_snapshot_stage(
        spark, keys.limit(10), "nodes", base, lambda: src.select("repo", "path").limit(10)
    )
    assert r.skipped and r.run_id == rid


def test_run_ids_sortable_and_unique_within_second(spark):
    ids = [ck.new_run_id() for _ in range(200)]
    assert ids == sorted(ids), "run ids must sort in creation order (max_by(run_id) resolution)"
    assert len(set(ids)) == 200
    # new format supersedes old-format ids from the same second
    old_style = ids[0].split(".")[0] + "-deadbeef"
    assert ids[0] > old_style


def test_compact_partitioned_snapshot_stage(spark, src, tmp_path):
    """compact must preserve the stage's partition layout below run_id —
    a different depth would mix leaf levels and make the dir unreadable."""
    base = str(tmp_path / "kg")
    keys = src.select("repo", "path", "content_sha")

    def prod():
        return src.select(
            "repo", "path",
            F.when(F.col("path").endswith(".py"), "py").otherwise("other").alias("kind"),
        )

    ck.run_snapshot_stage(spark, keys, "nodes", base, prod, partition_cols=["kind"])
    ck.run_snapshot_stage(
        spark, keys.limit(10), "nodes", base, lambda: prod().limit(10), partition_cols=["kind"]
    )
    before = ck.read_snapshot(spark, base, "nodes").count()
    ck.compact(spark, base, "nodes")
    after = ck.read_snapshot(spark, base, "nodes")
    assert after.count() == before and "kind" in after.columns
    assert spark.read.parquet(f"{base}/nodes/data").count() == before
