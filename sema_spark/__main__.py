"""spark-submit entry point (north rule: runs via
``spark-submit --py-files sema_spark.zip -m``-style deployment).

    spark-submit --py-files sema_spark.zip run_pipeline.py \
        --src  s3://bucket/repos/          \
        --base s3://bucket/kg/             \
        [--config config.toml] [--no-fuzzy] [--salt-partitions N]

Locally: ``python -m sema_spark --src <parquet> --base <dir>``.
The session factory only sets a local master when spark-submit hasn't
configured one, so the same module works in both environments.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sema_spark")
    ap.add_argument("--src", required=True, help="input repos table (parquet dir / Iceberg table path)")
    ap.add_argument("--base", required=True, help="output base dir for stage tables")
    ap.add_argument("--config", default=None, help="optional TOML config (reference-compatible)")
    ap.add_argument("--no-fuzzy", action="store_true", help="disable LSH/cosine fuzzy linking")
    ap.add_argument("--salt-partitions", type=int, default=None)
    ap.add_argument("--stats", action="store_true", help="print per-repo graph stats after the run")
    args = ap.parse_args(argv)

    from sema_spark.config import PipelineConfig
    from sema_spark.plans.pipeline import graph_stats, run_pipeline
    from sema_spark.session import get_spark

    spark = get_spark(app_name="sema_spark-pipeline")
    cfg = PipelineConfig.from_toml(args.config) if args.config else PipelineConfig()
    src = cfg.apply(spark.read.parquet(args.src))
    run = run_pipeline(
        spark, src, args.base, fuzzy=not args.no_fuzzy, salt_partitions=args.salt_partitions
    )
    out = {
        s.stage: {"run_id": s.run_id, "input_files": s.input_files, "output_rows": s.output_rows, "skipped": s.skipped}
        for s in (run.triples, run.linked, run.nodes, run.edges)
    }
    print(json.dumps(out))
    if args.stats:
        graph_stats(spark, args.base).orderBy("repo").show(50, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
