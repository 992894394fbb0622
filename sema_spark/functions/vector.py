"""Vector math as built-in higher-order functions — JVM-side, codegen'd.

Re-expresses the reference's f32 vector ops
(/root/reference/src/semantic/embeddings.rs:83-88 — L2 norm, dot) as
``zip_with`` + ``aggregate`` so cosine ranking never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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


def l2_normalize(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    n = F.nullif(l2_norm(a), F.lit(0.0))
    return F.transform(a, lambda x: (x.cast("double") / n).cast("float"))
