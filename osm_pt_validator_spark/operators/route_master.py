"""Route-master validator (A2 + T6) — RouteMaster
(pkg/validation/route_master.go:7-27), set-based single pass.

Emission order (mirrored via seq): per-member "member is not a
relation" in member order, then "not enough route variants", then
missing name/ref/operator tags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_pt_validator_spark.operators.tags import (
    RM_REQUIRED_TAGS,
    missing_tag_checks,
)

#: route-master verdicts use their own single stage (the reference has
#: no multi-stage pipeline for masters)
STAGE_MASTER = 0

MSG_NOT_RELATION = "member is not a relation"
MSG_NOT_ENOUGH_VARIANTS = "not enough route variants"

_TAIL_SEQ = 1_000_000_000


def validate_route_masters(
    relations: DataFrame, minimum_route_variants: int
) -> DataFrame:
    rel_url = F.format_string(
        "https://www.openstreetmap.org/relation/%d", F.col("relation_id")
    )

    m = relations.select(
        "relation_id", F.posexplode("members").alias("member_idx", "m")
    )
    member_verdicts = m.filter(F.col("m.type") != "relation").select(
        "relation_id",
        F.lit(STAGE_MASTER).alias("stage_no"),
        F.col("member_idx").cast("long").alias("seq"),
        F.format_string(
            "https://www.openstreetmap.org/%s/%d", F.col("m.type"), F.col("m.ref")
        ).alias("url"),
        F.lit(MSG_NOT_RELATION).alias("message"),
    )

    rel_count = F.size(F.filter(F.col("members"), lambda x: x["type"] == "relation"))
    tail_checks = []
    if minimum_route_variants > 0:
        tail_checks.append(
            F.when(
                rel_count < minimum_route_variants,
                F.struct(
                    rel_url.alias("url"), F.lit(MSG_NOT_ENOUGH_VARIANTS).alias("message")
                ),
            )
        )
    tail_checks.extend(missing_tag_checks(F.col("tags"), rel_url, RM_REQUIRED_TAGS))
    tail_arr = F.filter(F.array(*tail_checks), lambda v: v.isNotNull())
    tail_verdicts = relations.select(
        "relation_id", F.posexplode(tail_arr).alias("i", "v")
    ).select(
        "relation_id",
        F.lit(STAGE_MASTER).alias("stage_no"),
        (F.lit(_TAIL_SEQ) + F.col("i")).alias("seq"),
        F.col("v.url").alias("url"),
        F.col("v.message").alias("message"),
    )
    return member_verdicts.unionByName(tail_verdicts)


def split_route_master_members(route_masters: DataFrame) -> DataFrame:
    """O2 — every relation-type member of a route_master becomes a new
    work-list row (cmd/validate-rm/main.go:118-168; one level deep, no
    fixpoint needed). Returns (master_id, relation_id)."""
    return (
        route_masters.select(
            F.col("relation_id").alias("master_id"),
            F.explode("members").alias("m"),
        )
        .filter(F.col("m.type") == "relation")
        .select("master_id", F.col("m.ref").alias("relation_id"))
    )
