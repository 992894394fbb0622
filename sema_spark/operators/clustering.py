"""Deterministic k-means over embedding columns — the coarse quantizer
a 100 TB similarity-search stack trains for IVF indexes, and the
clustering member of the dedup/ANN family (no reference analog; the
reference consumes a fixed index, cf. /root/reference/src/semantic/
embeddings.rs which embeds into a prebuilt store).

Determinism contract (what makes a value-exact cross-engine oracle
possible for an iterative float algorithm):

* init: the centroids are the vectors of the ``k`` smallest ids —
  no RNG, no data-order dependence.
* assignment: ``argmin_j(-2·x·C_j + |C_j|²)`` computed in numpy
  float64 on BOTH engines via non-optimized ``einsum`` (Arrow-batched
  UDF here, full-matrix oracle there).  ``einsum(optimize=False)``
  accumulates each output element with a plain sequential loop over
  the dim axis — unlike ``@``/BLAS gemm, whose kernel (and thus
  last-bit rounding) can change with the batch's row count — so
  results are bit-identical regardless of how rows are batched;
  ``np.argmin`` breaks distance ties toward the smallest cluster
  index on both sides.
* update: per-cluster component sums are taken in ``decimal(38,12)``
  — exact and ORDER-INDEPENDENT, where a double sum would depend on
  Spark's partitioning.  Scale 12 leaves 26 integer digits of
  headroom (a scale-30 draft overflowed Spark's decimal sum to NULL
  past ~10^8 total — only 8 integer digits); the cast DOES round
  components at 1e-12, but identically on both engines (HALF_UP on
  the shortest repr), so parity is preserved by construction.  The
  division (mean) happens driver-side in Python from the collected
  k×dim sums — both engines literally share that arithmetic, the
  same driver-scalar pattern as BPE's argmax.
* empty clusters keep their previous centroid.

Scale: per iteration one narrow Arrow-batched assignment pass over the
vectors plus one (cluster, dim) combiner-friendly aggregation shuffle
of k×dim slim rows; centroids (k×dim doubles) ride in the UDF closure
— broadcast-sized at any corpus scale.  Vectors themselves shuffle
only if the caller's layout forces it.
"""

from __future__ import annotations

import decimal
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sema_spark.plans.materialize import materialize

_DEC_Q = Decimal("1e-12")
# wide working precision (Python's default context of 28 digits can
# raise InvalidOperation when quantize/sum digits exceed it); mirrors
# Spark's decimal(38,12) headroom
_CTX = decimal.Context(prec=60, rounding=ROUND_HALF_UP)


def _dec(x: float) -> Decimal:
    """Python replica of Spark's double→decimal(38,12) cast: both go
    through the shortest decimal repr (BigDecimal.valueOf /
    ``repr``), then quantize HALF_UP at scale 12 — identical rounding
    on both engines, so the two casts cannot disagree."""
    return _CTX.quantize(Decimal(repr(float(x))), _DEC_Q)


def _assign_udf(centroids: np.ndarray):
    c = centroids.astype(np.float64)
    c_sq = (c * c).sum(axis=1)

    # no parameter annotations (PEP-563 postponed annotations break
    # pandas_udf signature inspection in this package)
    @pandas_udf("int")
    def assign(v):
        m = np.stack(
            v.map(lambda x: np.asarray(x, dtype=np.float32).astype(np.float64))
        )
        d = -2.0 * np.einsum("nd,kd->nk", m, c, optimize=False) + c_sq[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign


def kmeans(
    df: DataFrame,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, cluster) after ``iterations`` Lloyd rounds + one final
    assignment with the converged centroids (see module docstring for
    the determinism contract)."""
    cents, src = kmeans_fit(df, k, iterations, id_col, vec_col)
    return assigned_final(src, cents, id_col)


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train the quantizer: returns ``(centroids ndarray, materialized
    (_id, _v) source)`` — the IVF index-build half, reused by
    :func:`kmeans` and the IVF ANN query."""
    # SIZE-ADAPTIVE parallelism (r7, guide §2): a single-row-group
    # parquet arrives as ONE split, serializing every Lloyd pass (the
    # per-iteration posexplode + decimal aggregation was the measured
    # cost of the sf1.0 index build at 20k×64).  The r6 note that a
    # blanket repartition(32) was ~30% SLOWER at 2k×64 still holds — so
    # the partition count is DERIVED FROM THE ROW COUNT (~2k rows per
    # task, capped at 2×cores), which leaves tiny inputs alone and
    # parallelizes real ones; the determinism contract (batch-invariant
    # einsum, order-independent decimal sums) makes results identical
    # under any partitioning.
    src = materialize(df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")))
    n_rows = src.count()
    want = min(
        2 * df.sparkSession.sparkContext.defaultParallelism, max(1, n_rows // 2048)
    )
    if want > src.rdd.getNumPartitions():
        src = materialize(src.repartition(want))
    init = src.orderBy("_id").limit(k).collect()
    cents = np.stack(
        [np.asarray(r._v, dtype=np.float32).astype(np.float64) for r in init]
    )
    dim = cents.shape[1]
    for _ in range(iterations):
        assigned = src.withColumn("_c", _assign_udf(cents)(F.col("_v")))
        sums = (
            assigned.select("_c", F.posexplode("_v").alias("_p", "_x"))
            .groupBy("_c", "_p")
            .agg(
                F.sum(F.col("_x").cast("double").cast("decimal(38,12)")).alias("_s"),
                F.count("*").alias("_n"),
            )
            .collect()
        )
        new_cents = cents.copy()
        by_cluster: dict[int, list] = {}
        for r in sums:
            by_cluster.setdefault(int(r._c), []).append(r)
        for j, rows in by_cluster.items():
            vec = [None] * dim
            for r in rows:
                if r._s is None:
                    # Spark's non-ANSI decimal sum returns NULL on
                    # overflow; 26 integer digits of headroom make this
                    # unreachable below ~10^26 total per component, but
                    # an opaque TypeError would hide the cause
                    raise ArithmeticError(
                        f"decimal(38,12) component sum overflowed for "
                        f"cluster {int(r._c)} dim {int(r._p)} "
                        f"(n={int(r._n)}); corpus magnitude exceeds the "
                        f"26-digit headroom — rescale the vectors"
                    )
                # identical arithmetic to kmeans_python: exact decimal
                # sum, then one float division on the driver
                vec[int(r._p)] = float(r._s) / int(r._n)
            new_cents[j] = np.array(vec, dtype=np.float64)
        cents = new_cents
    return cents, src


def assigned_final(src: DataFrame, cents: np.ndarray, id_col: str) -> DataFrame:
    return src.select(
        F.col("_id").alias(id_col),
        _assign_udf(cents)(F.col("_v")).cast("bigint").alias("cluster"),
    )


def kmeans_python(ids, vectors, k: int = 8, iterations: int = 5) -> dict:
    """Independent full-matrix oracle: same determinism contract, none
    of the Spark machinery.  ``vectors`` are float32 rows (as stored);
    returns {id: cluster}."""
    ids = list(ids)
    _, a, _ = _kmeans_python_fit(ids, vectors, k, iterations)
    return {ids[i]: int(a[i]) for i in range(len(ids))}


def ivf_kmeans_topk(
    df: DataFrame,
    qvec,
    k: int = 10,
    n_clusters: int = 8,
    iterations: int = 3,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat ANN: the k-means quantizer above as the coarse index.
    The query vector picks its ``probes`` nearest centroids (squared-L2
    on the driver — centroids are k×dim, a scalar cost), and cosine is
    brute-forced only inside those clusters' member lists, i.e.
    ~probes/n_clusters of the corpus.  Scores use the sequential
    zip_with/aggregate cosine (functions/vector.dot) so an oracle can
    replicate the summation order bit-for-bit, rounded at 6; ties break
    on id.  At 100 TB: the assignment column is the partition key — a
    stored IVF index clusters/bucket-sorts vectors by it so a probe
    reads only its clusters' files (partition pruning does the rest).
    """
    from sema_spark.functions.vector import cosine_literal_fold

    cents, src = kmeans_fit(df, n_clusters, iterations, id_col, vec_col)
    q = np.asarray(qvec, dtype=np.float64)
    dist = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(x) for x in np.argsort(dist, kind="stable")[:probes]]
    return (
        src.withColumn("_c", _assign_udf(cents)(F.col("_v")))
        .where(F.col("_c").isin(probe))
        .select(
            F.col("_id").alias(id_col),
            F.round(cosine_literal_fold(F.col("_v"), qvec), 6).alias("score"),
        )
        # zero-norm vectors score NULL — not results (the python oracle
        # filters its None scores identically); without this, desc
        # ordering parks them last but limit(k) still admits them when
        # the probed cells hold fewer than k scoreable vectors
        .where(F.col("score").isNotNull())
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def _kmeans_python_fit(ids, vectors, k: int, iterations: int):
    ids = list(ids)
    m = np.stack(
        [np.asarray(v, dtype=np.float32).astype(np.float64) for v in vectors]
    )
    order = sorted(range(len(ids)), key=lambda i: ids[i])[:k]
    c = m[order].copy()
    for _ in range(iterations):
        d = -2.0 * np.einsum("nd,kd->nk", m, c, optimize=False) + (c * c).sum(axis=1)[None, :]
        a = np.argmin(d, axis=1)
        for j in range(len(c)):
            members = m[a == j]
            if len(members):
                with decimal.localcontext(_CTX):
                    c[j] = np.array(
                        [
                            float(sum((_dec(x) for x in members[:, p]), Decimal(0)))
                            / len(members)
                            for p in range(m.shape[1])
                        ],
                        dtype=np.float64,
                    )
    d = -2.0 * np.einsum("nd,kd->nk", m, c, optimize=False) + (c * c).sum(axis=1)[None, :]
    return c, np.argmin(d, axis=1), m


def _seq_cosine(v, q) -> float | None:
    """Replica of functions/vector.cosine's SEQUENTIAL zip_with +
    aggregate summation (numpy pairwise sums differ in the last bits,
    which an unrounded-value oracle cannot tolerate)."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for i in range(len(q)):
        x = float(np.float32(v[i]))
        dot += x * float(q[i])
        na += x * x
        nb += float(q[i]) * float(q[i])
    import math

    den = math.sqrt(na) * math.sqrt(nb)
    return dot / den if den != 0.0 else None


def _r6(x: float) -> float:
    """Spark F.round(_, 6): HALF_UP on the shortest decimal repr."""
    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def ivf_kmeans_topk_python(
    ids, vectors, qvec, k: int = 10, n_clusters: int = 8,
    iterations: int = 3, probes: int = 2,
):
    """Independent oracle for :func:`ivf_kmeans_topk`: same quantizer
    contract, sequential-summation cosine, (score desc, id asc) order.
    Returns [(id, score), ...]."""
    ids = list(ids)
    c, a, _ = _kmeans_python_fit(ids, vectors, n_clusters, iterations)
    q = np.asarray(qvec, dtype=np.float64)
    dist = ((c - q[None, :]) ** 2).sum(axis=1)
    probe = set(int(x) for x in np.argsort(dist, kind="stable")[:probes])
    scored = [
        (ids[i], _r6(s))
        for i in range(len(ids))
        if int(a[i]) in probe
        and (s := _seq_cosine(vectors[i], q)) is not None
    ]
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def ivf_incremental_topk_python(
    ids, vectors, qvec, id_threshold, k: int = 10, n_clusters: int = 8,
    iterations: int = 3, probes: int = 2,
):
    """Oracle for the INCREMENTALLY-built stored index: the quantizer is
    trained only on rows with id < ``id_threshold`` (the build half),
    then FROZEN — every vector (old and appended) is assigned by it,
    exactly :func:`sema_spark.sources.ann_index.ivf_index_append`'s
    contract.  Probe + sequential cosine + (score desc, id) top-k as in
    :func:`ivf_kmeans_topk_python`."""
    ids = list(ids)
    sub = [i for i in range(len(ids)) if ids[i] < id_threshold]
    c, _, _ = _kmeans_python_fit(
        [ids[i] for i in sub], [vectors[i] for i in sub], n_clusters, iterations
    )
    m = np.stack(
        [np.asarray(v, dtype=np.float32).astype(np.float64) for v in vectors]
    )
    d = -2.0 * np.einsum("nd,kd->nk", m, c, optimize=False) + (c * c).sum(axis=1)[None, :]
    a = np.argmin(d, axis=1)
    q = np.asarray(qvec, dtype=np.float64)
    dist = ((c - q[None, :]) ** 2).sum(axis=1)
    probe = set(int(x) for x in np.argsort(dist, kind="stable")[:probes])
    scored = [
        (ids[i], _r6(s))
        for i in range(len(ids))
        if int(a[i]) in probe
        and (s := _seq_cosine(vectors[i], q)) is not None
    ]
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def write_expected_kmeans(
    out_dir: str, parquet_path: str, k: int = 8, iterations: int = 5
) -> None:
    """Materialize the oracle assignment for the embeddings table at
    ``parquet_path`` as ``kmeans.parquet`` (pyarrow only, no Spark) —
    the expected-parquet mechanism the KG/pagerank oracles use."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = t.column("embedding").to_pylist()
    got = kmeans_python(ids, vecs, k, iterations)
    ordered = sorted(got)
    os.makedirs(out_dir, exist_ok=True)

    def write(name, table):
        tmp = f"{out_dir}/.tmp-{os.getpid()}-{name}"
        pq.write_table(table, tmp)
        os.replace(tmp, f"{out_dir}/{name}")

    write(
        "kmeans.parquet",
        pa.table({"vec_id": ordered, "cluster": [got[i] for i in ordered]}),
    )
    # IVF ANN twin: query = vec_id 0's embedding, 3-round quantizer,
    # 2 probes (same parameters as q_ann_ivf_kmeans_topk)
    qvec = vecs[ids.index(0)]
    top = ivf_kmeans_topk_python(
        ids, vecs, qvec, k=10, n_clusters=k, iterations=3, probes=2
    )
    write(
        "ivf_kmeans.parquet",
        pa.table(
            {
                "vec_id": [i for i, _ in top],
                "score": [s for _, s in top],
            }
        ),
    )
    # incremental-stored-index twin: quantizer trained on ids below
    # count//2, frozen, rest appended (same parameters as
    # q_ann_ivf_incr_topk)
    incr = ivf_incremental_topk_python(
        ids, vecs, qvec, len(ids) // 2, k=10, n_clusters=k, iterations=3, probes=2
    )
    write(
        "ivf_kmeans_incr.parquet",
        pa.table(
            {
                "vec_id": [i for i, _ in incr],
                "score": [s for _, s in incr],
            }
        ),
    )
