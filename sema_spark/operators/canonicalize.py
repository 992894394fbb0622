"""Stage 3 — canonicalization via connected components.

Generalizes the reference's exact-hash identity dedup
(/root/reference/src/storage/mod.rs:40-47, group-by-file dedup
/root/reference/src/tui/engine.rs:156-174) to equivalence-class merging
(north_star stage 3): entities are equivalent when they share a merge
key — ``content_sha`` for file entities, ``content_sha#normalized(symbol)``
for symbol entities — and transitively closed into components.

Connected components is label propagation with **pointer jumping**:
each iteration does (1) a 1-hop min-propagation over edges and (2) a
path-halving step comp(v) ← comp(comp(v)), giving O(log diameter)
iterations instead of O(diameter) — a 25-node chain converges in ~5
rounds, not 25.  Every iteration ends in an eager ``localCheckpoint`` to
cut the lineage chain (iterative Catalyst plans otherwise grow without
bound), and convergence is detected by a bit_xor fingerprint of the
assignment (one cheap agg on checkpointed data, no extra join).  A
GraphFrames ``connectedComponents`` drop-in is noted for clusters that
ship it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from sema_spark.plans.materialize import materialize


def _contract(e: DataFrame, rounds: int = 2):
    """Min-label contraction: label every node min(self, min neighbor),
    rewrite edges in the quotient graph.  Dense components (near-cliques
    from dedup candidate pairs) collapse to almost nothing in one round —
    measured 2.09M edges / 4.4k nodes: CC went 57s → seconds.  Returns
    (contracted edges, list of (id → label) mapping DataFrames)."""
    mappings = []
    for _ in range(rounds):
        lab = (
            e.groupBy("x")
            .agg(F.min("y").alias("mn"))
            .select("x", F.least(F.col("x"), F.col("mn")).alias("l"))
            .transform(lambda d: materialize(d, truncate=True))
        )
        mappings.append(lab)
        la = lab.select(F.col("x").alias("_xa"), F.col("l").alias("_la"))
        lb = lab.select(F.col("x").alias("_xb"), F.col("l").alias("_lb"))
        e = (
            e.join(la, e["x"] == F.col("_xa"))
            .join(lb, e["y"] == F.col("_xb"))
            .select(F.col("_la").alias("x"), F.col("_lb").alias("y"))
            .filter(F.col("x") != F.col("y"))
        )
        e = e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y"))).distinct().transform(
            lambda d: materialize(d, truncate=True)
        )
    return e, mappings


def driver_cc_budget(spark) -> int:
    """Edge count the union-find tier may pull to the driver, scaled
    from spark.driver.memory instead of a fixed constant: the Arrow
    frame + parent dict cost ~0.5 KB/edge of string ids, and the budget
    must never eat more than ~1/4 of the heap (the rest is the driver's
    normal working set).  Bounds: [100k, 64M]."""
    import re

    try:
        mem = spark.conf.get("spark.driver.memory")
    except Exception:
        mem = "2g"
    m = re.fullmatch(r"(\d+)([kmgt]?)b?", str(mem).lower().strip())
    # a bare number means MiB for spark.driver.memory (JVM memory confs
    # parse via byteStringAsMb), not bytes
    mult = {"": 2**20, "k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}
    nbytes = int(m.group(1)) * mult[m.group(2)] if m else 2**31
    return max(100_000, min(64_000_000, nbytes // 4 // 512))


def _driver_cc(spark, e: DataFrame) -> DataFrame:
    """Union-find on the driver — for edge sets that fit trivially in
    driver memory this beats the iterative-join path by ~10x wall clock
    (each distributed iteration costs scheduler round-trips regardless
    of data size).  The distributed path remains for graphs that don't."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    pdf = e.toPandas()  # Arrow transfer — toLocalIterator's py4j row
    # stream measured ~10s for 2M edges; this is sub-second
    for a, b in zip(pdf.iloc[:, 0].to_numpy(), pdf.iloc[:, 1].to_numpy()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    import pandas as pd

    # Arrow path back up (r7): createDataFrame over a pandas frame rides
    # spark.sql.execution.arrow.pyspark.enabled — the list-of-tuples
    # form pickled every row through the RDD path (measured seconds at
    # 10^5 nodes, the dominant cost of the driver CC tier)
    nodes = list(parent)
    return spark.createDataFrame(
        pd.DataFrame({"id": nodes, "component": [find(n) for n in nodes]}),
        schema="id string, component string",
    )


def connected_components(
    edges: DataFrame, max_iter: int = 25, driver_max_edges: int | None = None
) -> DataFrame:
    """edges(a string, b string) → (id string, component string).

    Component id = lexicographic min node id in the component.
    Includes singleton handling for any id appearing in edges.
    Hybrid execution: small edge sets union-find on the driver (budget
    scaled from spark.driver.memory; pass driver_max_edges=0 to force
    the distributed path); larger ones run min-label contraction +
    pointer-jumping label propagation.
    """
    if driver_max_edges is None:
        driver_max_edges = driver_cc_budget(edges.sparkSession)
    if driver_max_edges:
        e_simple = edges.filter(F.col("a") != F.col("b")).persist()
        n_edges = e_simple.count()
        if n_edges <= driver_max_edges:
            out = _driver_cc(edges.sparkSession, e_simple)
            e_simple.unpersist()
            return out
        e_simple.unpersist()
    e0 = (
        edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .union(edges.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .filter(F.col("x") != F.col("y"))
        .distinct()
        .persist()
    )
    e, mappings = _contract(e0)
    comp = (
        e.select(F.col("x").alias("id"))
        .union(e.select(F.col("y").alias("id")))
        .distinct()
        .withColumn("component", F.col("id"))
        .transform(materialize)
    )

    def fingerprint(c: DataFrame) -> int:
        row = c.select(F.bit_xor(F.xxhash64("id", "component")).alias("f")).collect()[0]
        return row.f if row.f is not None else 0

    fp = fingerprint(comp)
    for _ in range(max_iter):
        # (1) 1-hop min propagation: each node offers its label to neighbors
        msgs = (
            e.join(comp, e["x"] == comp["id"], "inner")
            .select(F.col("y").alias("id"), F.col("component"))
        )
        hop = (
            comp.select("id", "component")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # (2) pointer jumping: follow the label's own label (path halving)
        parent = hop.select(F.col("id").alias("pid"), F.col("component").alias("pcomp"))
        new_comp = (
            hop.join(parent, hop["component"] == parent["pid"], "left")
            .select("id", F.coalesce(F.least("pcomp", "component"), F.col("component")).alias("component"))
            .transform(lambda d: materialize(d, truncate=True))
        )
        new_fp = fingerprint(new_comp)
        comp = new_comp
        if new_fp == fp:
            break
        fp = new_fp
    # compose back through the contraction chain: comp(v) = comp(l_k(…l_1(v)))
    # — labels are themselves component members, so min-composition is exact
    out = comp
    for lab in reversed(mappings):
        c = out.select(F.col("id").alias("_cid"), F.col("component").alias("_comp"))
        out = (
            lab.join(c, lab["l"] == F.col("_cid"), "left")
            .select(
                F.col("x").alias("id"),
                F.coalesce(F.col("_comp"), F.col("l")).alias("component"),
            )
        )
    e0.unpersist()
    return out


def _normalize_symbol(col):
    return F.lower(F.regexp_replace(col, "_", ""))


def merge_key(nodes: DataFrame) -> DataFrame:
    """One merge key per node (north_star: normalized FQN + content sha)."""
    key = F.when(
        F.col("kind") == "symbol",
        F.concat_ws("#", F.col("content_sha"), _normalize_symbol(F.col("symbol"))),
    ).otherwise(F.col("content_sha"))
    return nodes.withColumn("merge_key", key)


def canonicalize_nodes(nodes: DataFrame) -> DataFrame:
    """NODES(-canonical_id) → NODES with canonical_id.

    canonical id = min entity id per merge-key group, computed as ONE
    aggregation + one join.  No connected-components pass: merge_key is
    a pure function of the node, so no entity can belong to two key
    groups and the equivalence classes ARE the groups — running CC over
    the star edges (as an earlier version did) provably recomputed the
    hub it already had, at the cost of a full CC invocation per stage-3
    run.  :func:`connected_components` remains the tool for genuinely
    transitive merges (dedup duplicate graphs, J4) and is the drop-in
    here if nodes ever carry MULTIPLE merge keys.  Entities with a NULL
    merge key (kind='external' / no sha) canonicalize to themselves —
    the null join key matches nothing, exactly as the old star edges
    dropped null keys.
    """
    keyed = merge_key(nodes)
    hubs = keyed.groupBy("merge_key").agg(F.min("entity_id").alias("hub"))
    out = keyed.join(hubs, "merge_key", "left").select(
        keyed["entity_id"],
        F.coalesce(F.col("hub"), keyed["entity_id"]).alias("canonical_id"),
        "kind",
        keyed["repo"],
        keyed["path"],
        "symbol",
        "content_sha",
    )
    return out


def canonical_edges(linked_triples: DataFrame, canonical_nodes: DataFrame) -> DataFrame:
    """Rewrite linked triples onto canonical ids → EDGES."""
    cmap = canonical_nodes.select("entity_id", "canonical_id")
    src_map = cmap.withColumnRenamed("entity_id", "subj").withColumnRenamed(
        "canonical_id", "src_canon"
    )
    dst_map = cmap.withColumnRenamed("entity_id", "obj_id").withColumnRenamed(
        "canonical_id", "dst_canon"
    )
    return (
        linked_triples.join(src_map, "subj", "left")
        .join(dst_map, "obj_id", "left")
        .select(
            F.coalesce("src_canon", "subj").alias("src"),
            "pred",
            F.coalesce("dst_canon", "obj_id").alias("dst"),
            "repo",
            "path",
            "line",
            # per-row sha invariant; also the per-file supersede key the
            # log-structured stage-4 storage needs (distinct stays
            # file-local: (repo, path) determines content_sha)
            "content_sha",
        )
        .distinct()
    )
