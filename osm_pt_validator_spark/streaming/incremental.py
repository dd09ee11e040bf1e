"""Streaming incremental validation — only first-seen-or-changed
relations reach the validator across micro-batches.

The batch incremental operator (operators/incremental.py) diffs two
snapshots; the streaming equivalent must suppress re-validation of
unchanged relations that keep re-arriving (recrawls re-emit every
relation).  The Spark-native form needs NO custom state code at all:

    rels.withColumn("content_hash", relation_content_hash(...))
        .dropDuplicates(["relation_id", "content_hash"])

Streaming ``dropDuplicates`` keeps the seen-key set in the state store
(partitioned by key, scales with executors, fault-tolerant via the
checkpoint), emits the FIRST occurrence of each (relation_id,
content_hash) pair and drops repeats — which is exactly "validate when
new or changed": a changed relation is a new pair, an unchanged
recrawl is a dropped repeat.

Semantics note (deliberate): a relation that changes A -> B -> back to
A is NOT re-validated on the revert — the (id, hash-of-A) pair is
already in state, and the A-verdicts are already in the sink
(streaming/validate.py's per-batch partitions are never rewritten), so
re-validating would only produce duplicate rows.  This matches the
resume-from-checkpoint contract of plans/checkpoint.py.

State growth: one row per distinct (relation, content version).  For
bounded state on endless streams pass ``within_watermark_col`` (an
event-time column, e.g. warc_ts) and ``delay``: the operator then uses
``withWatermark + dropDuplicatesWithinWatermark`` so pairs older than
the delay are evicted — the streaming analogue of the batch TTL in
streaming/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from osm_pt_validator_spark.config import DEFAULT_CONFIG, ValidationConfig
from osm_pt_validator_spark.operators.incremental import relation_content_hash


def streaming_changed_only(
    relations_stream: DataFrame,
    within_watermark_col: str | None = None,
    delay: str = "1 hour",
) -> DataFrame:
    """Pass through only relations whose validation-relevant content
    was never seen before (new relation OR changed content)."""
    hashed = relations_stream.withColumn(
        "content_hash",
        relation_content_hash(F.col("members"), F.col("tags")),
    )
    if within_watermark_col is not None:
        return hashed.withWatermark(
            within_watermark_col, delay
        ).dropDuplicatesWithinWatermark(["relation_id", "content_hash"])
    return hashed.dropDuplicates(["relation_id", "content_hash"])


def streaming_validate_incremental(
    relations_stream: DataFrame,
    nodes: DataFrame,
    ways: DataFrame,
    out_path: str,
    checkpoint_path: str,
    config: ValidationConfig = DEFAULT_CONFIG,
    trigger_available_now: bool = True,
    within_watermark_col: str | None = None,
    delay: str = "1 hour",
) -> StreamingQuery:
    """streaming_changed_only -> the foreachBatch validator sink
    (streaming/validate.py): unchanged recrawls never reach the
    validation fan-out, and each micro-batch's verdicts land in an
    idempotent batch_id partition."""
    from osm_pt_validator_spark.streaming.validate import streaming_validate

    changed = streaming_changed_only(
        relations_stream, within_watermark_col, delay
    ).drop("content_hash")
    return streaming_validate(
        changed,
        nodes,
        ways,
        out_path,
        checkpoint_path,
        config=config,
        trigger_available_now=trigger_available_now,
    )
