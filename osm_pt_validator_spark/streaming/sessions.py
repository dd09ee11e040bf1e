"""Streaming sessionization: the batch gap-session operator
(operators/temporal.py:sessionize) re-expressed for continuously
arriving events with Spark's NATIVE session_window — no custom state
handler needed, so the session state store, watermark eviction, and
merge-on-late-arrival all come from the engine.

Semantics parity with batch: a session closes after `gap` of
inactivity per key; counts/bounds match session_stats() for the same
gap once the stream is fully drained (asserted in
tests/test_checkpoint_streaming.py against the batch operator on the
same rows — the batch side IS the oracle).

Scale shape: state is one (key, open-session) entry, evicted by the
watermark; the shuffle is on the grouping key exactly like the batch
plan, so a 1000-executor run partitions the state store the same way
it would partition the batch window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def session_stats_frame(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """The sessionization itself: per-(key, session_window) rollups.

    Shared by the streaming entry point below and by batch replay —
    `F.session_window` is a plain Catalyst aggregation that runs
    identically on a batch frame, which is what lets the driver's
    DuckDB oracle gate value-check this operator (a session breaks
    only when the gap to the previous event is STRICTLY GREATER than
    `gap`, microsecond precision — session_window merges the closed
    [ts, ts+gap] intervals, so an event landing exactly at prev+gap
    still extends the session; pinned by the boundary test in
    test_checkpoint_streaming.py).
    """
    return (
        df.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_timestamp(F.col(ts_col))).alias("start_epoch"),
            F.max(F.unix_timestamp(F.col(ts_col))).alias("end_epoch"),
        )
        .select(key_col, "n_events", "start_epoch", "end_epoch")
    )


def streaming_session_stats(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """readStream(parquet dir) -> per-(key, session) rollups.

    Returns the streaming DataFrame (append mode emits a session only
    after the watermark passes its close — the correct at-scale
    contract; tests drain with availableNow + complete mode).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return session_stats_frame(
        stream.withWatermark(ts_col, watermark),
        key_col=key_col,
        ts_col=ts_col,
        gap=gap,
    )
