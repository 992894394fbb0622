"""Vector math over array columns.

Re-expresses the reference's f32 vector ops
(/root/reference/src/semantic/embeddings.rs:83-88 — L2 norm, dot) two
ways:

* ``zip_with`` + ``aggregate`` HOFs — no Python workers, sequential
  summation (bit-compatible with the DuckDB oracle's
  list_cosine_similarity), the right call for small result sets;
* :func:`cosine_arrow` — Arrow-batched numpy for BULK re-ranking
  (e.g. 10^5+ blocked candidate pairs, where interpreted HOF lambdas
  are the bottleneck).  numpy's pairwise summation differs from
  sequential in the last bits, so use the HOF path when an oracle
  compares unrounded values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null/zero-norm safe (returns NULL)."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


@pandas_udf(DoubleType())
def cosine_arrow(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Vectorized cosine for bulk pair re-ranking (float64; NaN-free:
    zero-norm pairs return NULL like the HOF path)."""
    if len(va) == 0:
        return pd.Series([], dtype="float64")
    a = np.stack(va.map(lambda x: np.asarray(x, dtype=np.float64)))
    b = np.stack(vb.map(lambda x: np.asarray(x, dtype=np.float64)))
    num = (a * b).sum(axis=1)
    den = np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1))
    out = np.where(den > 0, num / np.where(den > 0, den, 1.0), np.nan)
    return pd.Series(out).where(den > 0, other=None)


def l2_normalize(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    n = F.nullif(l2_norm(a), F.lit(0.0))
    return F.transform(a, lambda x: (x.cast("double") / n).cast("float"))
