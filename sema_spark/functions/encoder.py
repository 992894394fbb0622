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


@pandas_udf(ArrayType(FloatType()))
def encode_text(s: pd.Series) -> pd.Series:
    return s.map(lambda t: encode_numpy(t).tolist())


def with_embedding(df, text_col: str = "content", out_col: str = "embedding"):
    return df.withColumn(out_col, encode_text(F.col(text_col)))


def encode_query(text: str) -> list[float]:
    """Driver-side single-query encoding (search entry point B,
    /root/reference/src/storage/lance_indexer.rs:113-118)."""
    return [float(x) for x in encode_numpy(text)]


def query_literal(text: str) -> Column:
    return F.array(*[F.lit(v) for v in encode_query(text)])
