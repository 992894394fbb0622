"""The four-stage knowledge-graph construction pipeline (north_star).

    repos (repo, path, commit, lang, content)
      │  stage 1 — triples      incremental  (per-file checkpoint, J1)
      ▼
    triples (subj, pred, obj, provenance, content_sha)
      │  stage 2 — linked       snapshot     (alias join J3 + LSH/cosine J2)
      ▼
    linked_triples (+ obj_id, link_method, link_score)
      │  stage 3 — nodes        snapshot     (connected components J4)
      ▼
    canonical nodes (entity_id, canonical_id, …)
      │  stage 4 — edges        snapshot     (canonical rewrite, partitioned)
      ▼
    edges (src, pred, dst, provenance)

Stage 1 carries the content-bytes cost and is per-file incremental with
crash-safe resume; stages 2-4 are derived tables ~1000x smaller,
recomputed per snapshot but skipped outright when the upstream
fingerprint is unchanged (see sources/checkpoint.py).  Before the heavy
extraction scan the input is salted-repartitioned on
(repo, xxhash64 % SALT) so a monorepo cannot pin a single task (north
rule: explicit skew handling; AQE skew-join remains on as backstop).

Each ``run_*`` returns StageRun metrics and appends per-partition
lineage rows — `graph_stats` aggregates headline metrics per run.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sema_spark.operators.canonicalize import canonical_edges, canonicalize_nodes
from sema_spark.operators.linking import build_nodes, link_triples
from sema_spark.operators.mentions import (
    extract_triples,
    salted_repartition,
    with_content_sha,
)
from sema_spark.schemas import EDGES, LINKED_TRIPLES, NODES, TRIPLES
from sema_spark.sources.checkpoint import (
    StageRun,
    read_snapshot,
    read_stage_output,
    run_incremental_stage,
    run_snapshot_stage,
)

STAGE_TRIPLES = "triples"
STAGE_LINKED = "linked"
STAGE_NODES = "nodes"
STAGE_EDGES = "edges"


@dataclass
class PipelineRun:
    triples: StageRun
    linked: StageRun
    nodes: StageRun
    edges: StageRun

    @property
    def any_work(self) -> bool:
        return any(not s.skipped for s in (self.triples, self.linked, self.nodes, self.edges))


def run_pipeline(
    spark: SparkSession,
    src: DataFrame,
    base: str,
    fuzzy: bool = True,
    salt_partitions: int | None = None,
) -> PipelineRun:
    """Execute (or resume) the full pipeline against the current source."""
    src = src if "content_sha" in src.columns else with_content_sha(src)

    r1 = run_incremental_stage(
        spark,
        src,
        STAGE_TRIPLES,
        base,
        lambda pending: extract_triples(salted_repartition(pending, salt_partitions)),
    )
    triples = read_stage_output(spark, base, STAGE_TRIPLES, schema=TRIPLES)
    keys = triples.select("repo", "path", "content_sha").distinct()

    # params fold non-key dependencies into each skip fingerprint:
    # stage 2 depends on the fuzzy flag, stage 4 on the FINGERPRINTS of
    # the snapshots it derives from (content-stable: a skipped upstream
    # keeps its fingerprint, so downstream stays skippable; a
    # regenerated upstream changes it and forces the derivation to
    # re-run; a compacted upstream keeps it, so compaction does not
    # trigger spurious downstream regeneration)
    r2 = run_snapshot_stage(
        spark, keys, STAGE_LINKED, base, lambda: link_triples(triples, fuzzy=fuzzy),
        params=f"fuzzy={fuzzy}",
    )
    linked = read_snapshot(spark, base, STAGE_LINKED, schema=LINKED_TRIPLES)

    r3 = run_snapshot_stage(
        spark, keys, STAGE_NODES, base, lambda: canonicalize_nodes(build_nodes(triples)),
        partition_cols=["kind"],
    )
    nodes = read_snapshot(spark, base, STAGE_NODES, schema=NODES)

    r4 = run_snapshot_stage(
        spark, keys, STAGE_EDGES, base, lambda: canonical_edges(linked, nodes),
        partition_cols=["pred"],
        params=f"linked={r2.fingerprint};nodes={r3.fingerprint}",
    )
    return PipelineRun(r1, r2, r3, r4)


def read_triples(spark: SparkSession, base: str) -> DataFrame:
    return read_stage_output(spark, base, STAGE_TRIPLES, schema=TRIPLES)


def read_linked(spark: SparkSession, base: str) -> DataFrame:
    return read_snapshot(spark, base, STAGE_LINKED, schema=LINKED_TRIPLES)


def read_nodes(spark: SparkSession, base: str) -> DataFrame:
    return read_snapshot(spark, base, STAGE_NODES, schema=NODES)


def read_edges(spark: SparkSession, base: str) -> DataFrame:
    return read_snapshot(spark, base, STAGE_EDGES, schema=EDGES)


def graph_stats(spark: SparkSession, base: str) -> DataFrame:
    """Headline per-repo metrics over the materialized graph."""
    edges = read_edges(spark, base)
    nodes = read_nodes(spark, base)
    per_repo = edges.groupBy("repo").agg(
        F.count("*").alias("n_edges"),
        F.countDistinct("src").alias("n_src_entities"),
    )
    node_counts = (
        nodes.groupBy("repo").agg(
            F.count("*").alias("n_nodes"),
            F.countDistinct("canonical_id").alias("n_canonical"),
        )
    )
    return per_repo.join(node_counts, "repo", "full")


# Result-shaping queries mirroring the reference's search entry points ----

def who_imports(spark: SparkSession, base: str, module_entity: str) -> DataFrame:
    """'Which files import X' — flagship lineage query."""
    return (
        read_edges(spark, base)
        .filter((F.col("pred") == "imports") & (F.col("dst") == module_entity))
        .select("src", "repo", "path")
        .distinct()
    )


def semantic_search(
    spark: SparkSession,
    chunks_with_embeddings: DataFrame,
    query: str,
    k: int = 50,
    norm_col: str | None = None,
) -> DataFrame:
    """Reference entry point B (src/tui/engine.rs:102-154): encode the
    query driver-side, cosine against the embedding column, top-k, then
    the A1 per-file dedup+count window.  Unlike the reference we keep the
    real cosine score (it hardcodes 1.0, src/storage/mod.rs:123).

    ``norm_col``: name of a column holding the PRECOMPUTED chunk L2
    norm (written by the stored index at build time with the identical
    ``l2_norm`` expression, so the stored float64 is bit-equal to an
    in-query recomputation).  With it, scoring runs ONE interpreted
    O(dim) aggregate per chunk (the dot) instead of three — the chunk
    norm comes from the column and the query norm is one driver-side
    scalar whose sequential float64 arithmetic replicates the HOF
    exactly.  Scores are bit-identical either way; the fast path is
    measured ~2x on the stored-index query."""
    import math

    from pyspark.sql import Window

    from sema_spark.functions.encoder import encode_query, query_literal
    from sema_spark.functions.vector import cosine, dot

    if len(query.strip()) <= 2:
        # F5 min-query-length guard (reference clears results instead of
        # searching, /root/reference/src/tui/app.rs:164-168).  Build a
        # FRESH StructType: StructType.add mutates in place, and
        # df.schema returns the cached object — adding to it would
        # permanently append phantom fields to the caller's DataFrame
        # schema (duplicated on every guarded call).
        from pyspark.sql.types import DoubleType, LongType, StructField, StructType

        empty_schema = StructType(
            list(chunks_with_embeddings.schema.fields)
            + [StructField("score", DoubleType()), StructField("matches_in_file", LongType())]
        )
        return spark.createDataFrame([], empty_schema)
    if norm_col is not None:
        # replicate the HOF's sequential float64 query-norm exactly:
        # acc = 0.0; acc += q[i]*q[i] in index order, then one sqrt —
        # the same additions the aggregate lambda performs
        acc = 0.0
        for v in encode_query(query):
            acc += float(v) * float(v)
        qnorm = math.sqrt(acc)
        scored = chunks_with_embeddings.withColumn(
            "score",
            dot(F.col("embedding"), query_literal(query))
            / F.nullif(F.col(norm_col) * F.lit(qnorm), F.lit(0.0)),
        )
    else:
        scored = chunks_with_embeddings.withColumn(
            "score", cosine(F.col("embedding"), query_literal(query))
        )
    # the cut needs a TOTAL order: bit-identical scores (duplicate
    # chunks) straddling rank k would otherwise pick partition-order
    # rows — nondeterministic run-to-run and divergent from any oracle
    topk = scored.orderBy(
        F.desc_nulls_last("score"), "repo", "path", "chunk_idx"
    ).limit(k)
    # per-FILE windows: (repo, path) — path alone would merge same-named
    # files across repos (README.md, src/main.py) into one "file".
    # chunk_idx breaks start_line ties deterministically: a file shorter
    # than CHUNK+OVERLAP yields two chunks that BOTH start on line 1
    # (main window + overlap tail), and row_number over a tied sort
    # would keep an arbitrary one (different score per run).
    w_rank = Window.partitionBy("repo", "path").orderBy("start_line", "chunk_idx")
    w_count = Window.partitionBy("repo", "path")
    return (
        topk.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("matches_in_file", F.count("*").over(w_count))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy(F.desc_nulls_last("score"))
    )
