"""Routes-file reader (reference S7/S8/F6).

The reference reads job manifests — JSON RoutesFiles of shape
``{"config": {...}, "routes": {"<group>": [{"name", "relation_id",
"skip"}...]}}`` (pkg/routes/types.go:7-16, schema/routefile.schema.json)
— from a local path (scripts/validate/main.go:54-75) or an S3 prefix
listing (cmd/trigger/main.go:86-151). Spark's native globbing replaces
the S3 pagination loop: pass a directory/glob and every file becomes
rows of one work-list DataFrame.

Rows with ``relation_id < 1`` or ``skip`` are dropped (F6,
scripts/validate/main.go:82-84; cmd/trigger/main.go:143-147).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm_pt_validator_spark.config import ValidationConfig

WORKLIST_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType(), False),
        T.StructField("group", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("relation_id", T.LongType(), False),
        T.StructField("skip", T.BooleanType(), False),
    ]
)


def parse_config(raw: dict) -> ValidationConfig:
    """JSON config block -> ValidationConfig (config.go:3-13 keys)."""
    return ValidationConfig(
        naptan_platform_tags=bool(raw.get("naptanPlatformTags", False)),
        minimum_node_members=int(raw.get("minimumNodeMembers", 0)),
        ignore_traversal_direction_ways=tuple(
            raw.get("ignoreTraversalDirectionWays", []) or []
        ),
        minimum_route_variants=int(raw.get("minimumRouteVariants", 0)),
    )


def read_routes_files(
    spark: SparkSession, path_or_glob: str
) -> tuple[DataFrame, dict[str, ValidationConfig]]:
    """Read one or many RoutesFiles.

    Returns (work-list DataFrame filtered per F6, {source_file:
    ValidationConfig}). The manifest files are small (driver-side
    parse is correct here — they're job *descriptions*, not data;
    the reference's trigger lambda does the same S3-side).
    """
    if os.path.isdir(path_or_glob):
        paths = sorted(glob.glob(os.path.join(path_or_glob, "**", "*.json"), recursive=True))
    else:
        paths = sorted(glob.glob(path_or_glob))
    rows: list[tuple] = []
    configs: dict[str, ValidationConfig] = {}
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        configs[p] = parse_config(doc.get("config", {}) or {})
        for group, routes in (doc.get("routes", {}) or {}).items():
            for r in routes:
                rows.append(
                    (
                        p,
                        group,
                        r.get("name"),
                        int(r.get("relation_id", 0)),
                        bool(r.get("skip", False)),
                    )
                )
    df = spark.createDataFrame(rows, WORKLIST_SCHEMA)
    return df.filter((F.col("relation_id") >= 1) & ~F.col("skip")), configs


def parent_relations(relations: DataFrame) -> DataFrame:
    """S2 — GetRelationRelations (osm.go:82-114) as a set operation:
    (relation_id, parent_relation_id) for every relation-type
    membership, i.e. the member->parent edge list reversed."""
    return (
        relations.select(
            F.col("relation_id").alias("parent_relation_id"),
            F.explode("members").alias("m"),
        )
        .filter(F.col("m.type") == "relation")
        .select(F.col("m.ref").alias("relation_id"), "parent_relation_id")
    )
