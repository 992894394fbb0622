"""Pluggable materialization primitive for iterative / branch-shared plans.

Catalyst does not share common subtrees across a union-of-branches DAG
and iterative plans (connected components) grow lineage without bound,
so the pipeline cuts plans at explicit points.  HOW the cut happens is a
deployment decision, not an algorithm decision:

* ``local``    — ``DataFrame.localCheckpoint``: fastest (executor-local
  blocks, no lineage), the right call in local mode and for short jobs.
  NOT resilient: localCheckpoint blocks are unrecoverable after executor
  loss, so a 1000-executor job would die mid-stage on one lost node.
* ``reliable`` — ``DataFrame.checkpoint`` to a durable checkpoint dir
  (``SPARK_GRAFT_CHECKPOINT_DIR``; HDFS/object-store path on a cluster).
  Survives executor loss; costs a write+read of the cut dataset.
* ``persist``  — ``persist(MEMORY_AND_DISK)`` + eager count.  Blocks are
  RE-COMPUTABLE from lineage on executor loss (Spark's native resilience)
  and stay in memory when they fit — the default we'd ship on a cluster.
  Two documented limits vs the checkpoint modes: (a) persist cuts
  RECOMPUTATION (downstream reads InMemoryTableScan) but not the
  LOGICAL plan, so per-iteration analysis cost grows with iteration
  count — fine for this repo's bounded loops (CC max_iter=25, PageRank
  ~10), wrong for unbounded iteration; (b) cached blocks live until the
  session ends or ``spark.catalog.clearCache()`` — call it between
  pipelines when running many in one session.

Select with ``set_materialize_mode()`` or ``$SPARK_GRAFT_MATERIALIZE``.
All call sites use ``df.transform(materialize)`` so the mode is a pure
runtime switch; the e2e pipeline test runs in every mode.

Note: every mode preserves attribute exprIds, so joining a materialized
derivative back against its source still needs physically renamed
columns (the ambiguous-self-join caveat documented in linking.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

MODES = ("local", "reliable", "persist")
_mode_override: str | None = None
_DEFAULT_CKPT_DIR = "/tmp/sema_spark_reliable_ckpt"


def set_materialize_mode(mode: str | None) -> None:
    """Process-wide override; ``None`` returns control to the env var."""
    global _mode_override
    if mode is not None and mode not in MODES:
        raise ValueError(f"materialize mode must be one of {MODES}, got {mode!r}")
    _mode_override = mode


def materialize_mode() -> str:
    mode = _mode_override or os.environ.get("SPARK_GRAFT_MATERIALIZE", "local")
    if mode not in MODES:
        raise ValueError(f"$SPARK_GRAFT_MATERIALIZE must be one of {MODES}, got {mode!r}")
    return mode


def materialize(df: DataFrame) -> DataFrame:
    """Cut the logical plan here, per the configured mode (eager)."""
    mode = materialize_mode()
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(
                os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR", _DEFAULT_CKPT_DIR)
            )
        return df.checkpoint(eager=True)
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    return out
