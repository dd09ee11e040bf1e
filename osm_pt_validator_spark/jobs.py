"""spark-submit entry point: validate a work-list of relations against
OSM-shaped parquet tables and write verdict/error tables.

    spark-submit --py-files .osm_pt_validator_spark.zip \
        -m osm_pt_validator_spark.jobs  (or python -m ... locally)
        --tables /data/osm --routes routes/ --out /data/verdicts

Mirrors the reference's CLI/Lambda lifecycle (scripts/validate/main.go,
cmd/trigger + cmd/validate-rm + cmd/validate-route) as one batch plan:
work-list -> semi-join relations -> validate_all -> grouped sink.
Exit code 1 when any verdicts exist (O4, main.go:122-125).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", required=True, help="dir with nodes/ways/relations parquet")
    ap.add_argument("--routes", help="RoutesFile JSON path/glob (default: all relations)")
    ap.add_argument("--out", required=True, help="output dir (checkpointed stages)")
    ap.add_argument("--relation-id", type=int, help="validate a single relation (-r)")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from osm_pt_validator_spark.config import DEFAULT_CONFIG
    from osm_pt_validator_spark.operators.pipeline import collect_invalid, validate_all
    from osm_pt_validator_spark.plans.checkpoint import run_stage
    from osm_pt_validator_spark.session import ensure_py_files, get_spark
    from osm_pt_validator_spark.sources.routes_file import read_routes_files

    spark = get_spark("osm-pt-validate", cores=args.cpus)
    ensure_py_files(spark)

    nodes = spark.read.parquet(f"{args.tables}/nodes.parquet")
    ways = spark.read.parquet(f"{args.tables}/ways.parquet")
    relations = spark.read.parquet(f"{args.tables}/relations.parquet")

    config = DEFAULT_CONFIG
    if args.relation_id:
        relations = relations.filter(F.col("relation_id") == args.relation_id)
    elif args.routes:
        worklist, configs = read_routes_files(spark, args.routes)
        # one config per job run (reference: per-file validator); use the
        # first file's config — heterogeneous files => run per file.
        if configs:
            config = next(iter(configs.values()))
        relations = relations.join(
            F.broadcast(worklist.select("relation_id").distinct()),
            "relation_id",
            "left_semi",
        )

    # validate_all fans relations into several branches (routes /
    # masters / unknown / master-member join) — persist so the filtered
    # work-set is scanned once, not once per branch
    from pyspark.storagelevel import StorageLevel

    relations = relations.persist(StorageLevel.MEMORY_AND_DISK)

    def _validate():
        verdicts, errors = validate_all(relations, nodes, ways, config)
        return verdicts

    verdicts = run_stage(spark, args.out, "verdicts", _validate)
    run_stage(spark, args.out, "invalid_relations", lambda: collect_invalid(verdicts))

    n = verdicts.count()
    print(f"relations with verdicts: {verdicts.select('relation_id').distinct().count()}; verdicts: {n}")
    return 1 if n > 0 else 0


if __name__ == "__main__":
    sys.exit(main())
