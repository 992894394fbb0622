"""Deterministic hashing text encoder — the test/parity stand-in for the
reference's MiniLM ONNX encoder.

Contract parity with /root/reference/src/semantic/embeddings.rs:26-91:

* tokenize with truncation at :data:`MAX_TOKENS` (reference MAX_LENGTH=256,
  embeddings.rs:7) — here "tokens" are UTF-8 byte 3-grams;
* per-token embedding — here a signed basis vector chosen by a stable
  multiplicative hash (no model download, fully deterministic across
  processes: never Python's seeded ``hash``);
* masked mean-pool over tokens, then L2 normalization (embeddings.rs:61-91);
* output: 384-dim float32 (lance_indexer.rs:43).

Exposed as an Arrow-batched ``pandas_udf`` with the per-worker state held
at module level — deliberately fixing the reference's
encoder-reload-per-batch inefficiency
(/root/reference/src/storage/lance_indexer.rs:60-73): nothing to reload,
and a real model would be a module-level singleton in the same slot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

from sema_spark.schemas import EMBEDDING_DIM

MAX_TOKENS = 256  # parity: reference MAX_LENGTH
_MULT = 2654435761  # Knuth multiplicative hash constant


def encode_numpy(text: str | None) -> np.ndarray:
    """Encode one string; reference implementation for parity tests."""
    out = np.zeros(EMBEDDING_DIM, dtype=np.float64)
    if not text:
        return out.astype(np.float32)
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    if len(b) < 3:
        return out.astype(np.float32)
    codes = (b[:-2] << 16) + (b[1:-1] << 8) + b[2:]
    codes = codes[:MAX_TOKENS]  # truncation parity
    h = (codes * _MULT) & 0xFFFFFFFF
    idx = h % EMBEDDING_DIM
    sign = np.where((h >> 16) & 1, 1.0, -1.0)
    np.add.at(out, idx, sign)
    out /= len(codes)  # mean pool
    n = np.linalg.norm(out)
    if n > 0:
        out /= n  # L2 normalize
    return out.astype(np.float32)


def encode_batch_numpy(texts) -> np.ndarray:
    """Whole-batch encoder, VALUE-IDENTICAL to a per-row
    :func:`encode_numpy` loop (asserted in tests/test_encoder_parity.py)
    but vectorized across rows — the per-row path was the measured
    hotspot of u1_encoder / semantic_index_build (one ``np.add.at`` +
    two tiny array allocations per document).

    Why bit-identity holds despite batching:

    * the scatter-accumulate sums ±1.0 values — exact integers in
      float64, so ANY accumulation order (here one ``np.bincount`` over
      the whole batch) produces the identical sums ``np.add.at`` did;
    * mean-pool and normalize are elementwise float64 ops with the same
      operands per row;
    * the norm is ``sqrt(np.dot(row, row))`` per row — literally the
      reduction ``np.linalg.norm`` performs for 1-D input.
    """
    n = len(texts)
    dim = EMBEDDING_DIM
    if n == 0:
        return np.zeros((0, dim), dtype=np.float32)
    # truncate at the byte level: code j reads bytes [j, j+2] and only
    # j < MAX_TOKENS survive, so bytes past MAX_TOKENS+2 never matter —
    # slicing them off before the join bounds the buffer at 258 B/row
    # regardless of document size (the unsliced version was measured
    # SLOWER than the per-row loop on long-document batches)
    enc = [
        t.encode("utf-8")[: MAX_TOKENS + 2] if t else b""  # falsy → no tokens
        for t in texts
    ]
    counts = np.array(
        [min(len(e) - 2, MAX_TOKENS) if len(e) >= 3 else 0 for e in enc],
        dtype=np.int64,
    )
    total = int(counts.sum())
    if total == 0:
        return np.zeros((n, dim), dtype=np.float32)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.int64)
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    # absolute position of each row's code window starts: for row i the
    # codes are buf[starts[i] + j] for j in [0, counts[i])
    row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
    # within-row offsets 0..counts[i]-1 via the cumsum-reset trick
    seq = np.arange(total, dtype=np.int64)
    row_first = np.concatenate(([0], np.cumsum(counts)[:-1]))
    offs = seq - np.repeat(row_first, counts)
    p = np.repeat(starts, counts) + offs
    codes = (buf[p] << 16) + (buf[p + 1] << 8) + buf[p + 2]
    h = (codes * _MULT) & 0xFFFFFFFF
    idx = h % dim
    sign = np.where((h >> 16) & 1, 1.0, -1.0)
    sums = np.bincount(row_ids * dim + idx, weights=sign, minlength=n * dim).reshape(
        n, dim
    )
    nz = counts > 0
    sums[nz] /= counts[nz, None]  # mean pool
    # per-row norm: same sqrt(dot(x, x)) np.linalg.norm computes for 1-D
    norms = np.sqrt(np.array([np.dot(r, r) for r in sums]))
    pos = norms > 0
    sums[pos] /= norms[pos, None]  # L2 normalize
    return sums.astype(np.float32)


@pandas_udf(ArrayType(FloatType()))
def encode_text(s: pd.Series) -> pd.Series:
    return pd.Series(list(encode_batch_numpy(s.tolist())))


def with_embedding(df, text_col: str = "content", out_col: str = "embedding"):
    return df.withColumn(out_col, encode_text(F.col(text_col)))


# ---------------------------------------------------------------------------
# mapInArrow encoder with the PRODUCTION model-object lifecycle.  This is
# the slot a real MiniLM ONNX session plugs into
# (/root/reference/src/semantic/embeddings.rs:93-103): an expensive
# model object loaded ONCE per worker process (lazy module-level
# singleton — the reference reloads per batch,
# /root/reference/src/storage/lance_indexer.rs:60-73), fed bounded
# sub-batches so peak memory is model + batch_rows rows regardless of
# Arrow batch size.  The "weights" here are the deterministic hashing
# encoder, so outputs are value-identical to encode_text (tested).


class _EncoderModel:
    """Stand-in for an ONNX session: expensive to construct, cheap to
    call, must be reused across batches.  ``loads`` counts constructions
    so tests can assert the once-per-worker lifecycle."""

    loads = 0

    def __init__(self) -> None:
        type(self).loads += 1
        self.dim = EMBEDDING_DIM

    def encode_batch(self, texts: list[str | None]) -> np.ndarray:
        return encode_batch_numpy(texts)  # value-identical to per-row encode_numpy


_MODEL: _EncoderModel | None = None


def _get_model() -> _EncoderModel:
    global _MODEL
    if _MODEL is None:
        _MODEL = _EncoderModel()
    return _MODEL


def encode_with_model(df, text_col: str = "content", out_col: str = "embedding", batch_rows: int = 1024):
    """Append an embedding column via ``mapInArrow`` with load-once model
    lifecycle and explicit inference batch sizing."""
    import pyarrow as pa

    from pyspark.sql.types import StructField, StructType

    names = df.schema.names
    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, ArrayType(FloatType()))])

    def run(batches):
        model = _get_model()  # loaded once per worker process, not per batch
        for batch in batches:
            texts = batch.column(names.index(text_col)).to_pylist()
            chunks = [
                model.encode_batch(texts[i : i + batch_rows])
                for i in range(0, len(texts), batch_rows)
            ]
            vecs = [v.tolist() for c in chunks for v in c]
            emb = pa.array(vecs, type=pa.list_(pa.float32()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)] + [emb],
                names=names + [out_col],
            )

    return df.mapInArrow(run, schema=out_schema)


def encode_query(text: str) -> list[float]:
    """Driver-side single-query encoding (search entry point B,
    /root/reference/src/storage/lance_indexer.rs:113-118)."""
    return [float(x) for x in encode_numpy(text)]


def query_literal(text: str) -> Column:
    return F.array(*[F.lit(v) for v in encode_query(text)])
