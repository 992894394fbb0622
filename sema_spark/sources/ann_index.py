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

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sema_spark.operators.clustering import _assign_udf, kmeans_fit

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
) -> np.ndarray:
    """Train the quantizer on ``df`` and write the stored index.

    Returns the converged centroids (driver-side k×dim ndarray).  The
    stored column names are canonicalized to ``(vec_id, embedding,
    cluster)`` so readers need no schema hints.
    """
    cents, src = kmeans_fit(df, n_clusters, iterations, id_col, vec_col)
    _write_centroids(index_dir, cents)
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
    return cents


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
    same discipline as checkpoint.pending_files)."""
    spark = df.sparkSession
    cents = load_centroids(spark, index_dir)
    existing = spark.read.parquet(f"{index_dir}/vectors").select("vec_id")
    from sema_spark.plans.materialize import materialize

    # cut so the count and the write share one anti-join execution;
    # materialize() keeps the cut mode a deployment decision (persist /
    # reliable on a cluster) instead of hardcoding localCheckpoint
    fresh = materialize(
        df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
        .join(existing, "vec_id", "left_anti")
    )
    n = fresh.count()
    if n:
        (
            fresh.withColumn(
                "cluster", _assign_udf(cents)(F.col("embedding")).cast("int")
            )
            .write.mode("append")
            .partitionBy("cluster")
            .parquet(f"{index_dir}/vectors")
        )
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
    Scores use the sequential zip_with/aggregate cosine rounded at 6
    with id tiebreaks — the same contract the python oracle replicates.
    """
    from sema_spark.functions.vector import cosine

    cents = load_centroids(spark, index_dir)
    q = np.asarray(qvec, dtype=np.float64)
    dist = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(x) for x in np.argsort(dist, kind="stable")[:probes]]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        spark.read.parquet(f"{index_dir}/vectors")
        .where(F.col("cluster").isin(probe))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), qlit), 6).alias("score"),
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


def build_semantic_index(docs: DataFrame, index_dir: str) -> None:
    """Chunk + embed ``docs`` (repo, path, content) once and persist the
    chunk-embedding table, with each chunk's L2 norm PRECOMPUTED (the
    identical ``l2_norm`` expression a query would run, so the stored
    float64 is bit-equal to in-query recomputation — queries then pay
    one interpreted aggregate per chunk instead of three)."""
    from sema_spark.functions.vector import l2_norm
    from sema_spark.operators.chunker import chunk_and_embed

    (
        chunk_and_embed(docs)
        .withColumn("emb_norm", l2_norm(F.col("embedding")))
        .write.mode("overwrite")
        .parquet(f"{index_dir}/chunks")
    )


def semantic_index_append(docs: DataFrame, index_dir: str) -> int:
    """Incrementally index NEW files only: (repo, path) not yet present
    are chunked + embedded and appended; existing files are skipped
    (J1 anti-join — re-submitting an already-indexed corpus appends
    nothing).  Returns the number of newly indexed FILES."""
    from sema_spark.operators.chunker import chunk_and_embed

    from sema_spark.functions.vector import l2_norm

    spark = docs.sparkSession
    existing = (
        spark.read.parquet(f"{index_dir}/chunks").select("repo", "path").distinct()
    )
    from sema_spark.plans.materialize import materialize

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


def semantic_search_stored(spark: SparkSession, index_dir: str, query: str, k: int = 50) -> DataFrame:
    """Entry point B served from the stored index — no re-chunk, no
    re-encode: only the query string is encoded (driver-side literal),
    then exact cosine top-k + the per-file window over the precomputed
    chunk table."""
    from sema_spark.plans.pipeline import semantic_search

    chunks = spark.read.parquet(f"{index_dir}/chunks")
    # indexes written before the emb_norm column existed still answer
    # correctly through the three-aggregate path
    norm_col = "emb_norm" if "emb_norm" in chunks.columns else None
    out = semantic_search(spark, chunks, query, k=k, norm_col=norm_col)
    return out.drop("emb_norm")


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
) -> None:
    """Rewrite a stored-index table into few large files (the Lance
    ``optimize``/compaction analog — every append above leaves one file
    set per batch, and a long-lived incrementally-maintained index
    degrades into a small-files problem without this).

    Single-writer maintenance op, crash-safe for READERS-after-crash on
    a rename-capable filesystem: the rewrite lands in a sibling temp
    dir, then two renames swap it in; a crash before the first rename
    leaves the live table untouched, between renames there is a gap a
    retry fixes (rerun compact — the ``.old`` dir still holds the
    data).  On an object store without atomic rename, use the
    checkpoint log's append-then-GC compaction instead
    (sources/checkpoint.compact)."""
    import shutil

    df = spark.read.parquet(table_dir)
    tmp = f"{table_dir}.compact-tmp-{os.getpid()}"
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
    old = f"{table_dir}.old-{os.getpid()}"
    os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old, ignore_errors=True)


def compact_ivf_index(spark: SparkSession, index_dir: str) -> None:
    """Compact the vector table to one file per cluster partition."""
    _compact_table(spark, f"{index_dir}/vectors", partition_by="cluster")


def compact_semantic_index(spark: SparkSession, index_dir: str) -> None:
    """Compact the chunk table into a single file set."""
    _compact_table(spark, f"{index_dir}/chunks")
