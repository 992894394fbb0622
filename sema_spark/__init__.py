"""sema_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the data-processing capabilities of the
reference engine ``akshitsinha/sema`` (a Rust crawl→chunk→embed→search
loop) as an idiomatic Spark pipeline over a table of source-code repos
``(repo, path, commit, lang, content)``:

1. :mod:`sema_spark.operators.mentions` — triple extraction
2. :mod:`sema_spark.operators.linking` — entity linking (encoder UDF +
   MinHash-LSH blocking + broadcast alias dictionary)
3. :mod:`sema_spark.operators.canonicalize` — connected-components
   canonicalization
4. :mod:`sema_spark.plans.pipeline` — graph materialization with
   checkpoint/resume and per-partition lineage

plus the large-scale training-data operators (dedup family, similarity
search, text analysis, multimodal plumbing) under
:mod:`sema_spark.operators`.

Everything is DataFrame/Catalyst-first: built-in ``pyspark.sql.functions``
in hot paths, Arrow-batched pandas UDFs where per-string logic is
unavoidable, never row-at-a-time Python.
"""

__version__ = "0.1.0"
