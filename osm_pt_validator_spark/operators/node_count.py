"""Node-member count check (A1) — validateNodeMembersCount
(pkg/validation/node_count.go:7-21), set-based, zero shuffles.

``minimum_node_members < 1`` disables the check entirely
(node_count.go:9-11); we return an empty plan so Catalyst prunes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_pt_validator_spark.schemas import STAGE_NODE_COUNT

MSG_NOT_ENOUGH = "relation does not have enough node members"


def validate_node_count(relations: DataFrame, minimum_node_members: int) -> DataFrame:
    if minimum_node_members < 1:
        return relations.select(
            "relation_id",
            F.lit(STAGE_NODE_COUNT).alias("stage_no"),
            F.lit(0).cast("long").alias("seq"),
            F.lit("").alias("url"),
            F.lit("").alias("message"),
        ).limit(0)

    node_count = F.size(F.filter(F.col("members"), lambda m: m["type"] == "node"))
    return (
        relations.filter(node_count < minimum_node_members)
        .select(
            "relation_id",
            F.lit(STAGE_NODE_COUNT).alias("stage_no"),
            F.lit(0).cast("long").alias("seq"),
            F.format_string(
                "https://www.openstreetmap.org/relation/%d", F.col("relation_id")
            ).alias("url"),
            F.lit(MSG_NOT_ENOUGH).alias("message"),
        )
    )
