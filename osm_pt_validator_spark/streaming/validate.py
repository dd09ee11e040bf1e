"""Streaming route validation — the validator pipeline applied to a
continuously arriving relations stream.

The reference's production shape is event-driven (SQS CheckRelationEvent
per relation, cmd/validate-route/main.go); the Spark-native equivalent
is a Structured Streaming source of relation rows micro-batched through
the SAME batch operators via ``foreachBatch``: each micro-batch runs
`validate_all` (dims joined as static DataFrames — stream-static joins
in their natural Spark form) and appends to a verdicts sink. Exactly-
once comes from the streaming checkpoint: a replayed micro-batch
re-runs deterministically and the sink epoch dedupes.

Why foreachBatch and not a fully incremental plan: the validator needs
multi-join + grouped-Arrow stages per relation, which are per-row
independent — there is no cross-batch state, so micro-batch reuse of
the batch plan IS the idiomatic Spark solution (state would only enter
for cross-batch dedup, which `streaming/dedup.py` provides upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from osm_pt_validator_spark.config import DEFAULT_CONFIG, ValidationConfig


def streaming_validate(
    relations_stream: DataFrame,
    nodes: DataFrame,
    ways: DataFrame,
    out_path: str,
    checkpoint_path: str,
    config: ValidationConfig = DEFAULT_CONFIG,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Validate a stream of relation rows; append verdicts to parquet.

    relations_stream: streaming DataFrame with the relations schema
    (relation_id, version, members, tags). nodes/ways: static dims.
    Returns the started StreamingQuery (caller awaits/stops).
    """
    from osm_pt_validator_spark.operators.pipeline import validate_all

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        verdicts, _errors = validate_all(batch_df, nodes, ways, config)
        (
            verdicts.write.mode("append").parquet(out_path)
        )

    writer = (
        relations_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
