"""Structured-streaming variants of the batch operators.

The reference is batch-only (daily EventBridge cron — SURVEY §2.8), so
streaming here extends the engine for continuously arriving pages:
a file-source stream of mention rows -> watermarked windowed tile
heatmap. Late mentions beyond the watermark are dropped by Spark's
state eviction; the sink is append-mode per closed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_pt_validator_spark.functions.geo import tile_x, tile_y


def tile_window_counts(
    df: DataFrame,
    z: int = 12,
    window_duration: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """The heatmap transformation itself: (ts, lon, lat) rows ->
    per-(time window, slippy tile) counts.

    Shared by the streaming entry point below and by batch replay
    (`F.window` and the tile encoders are plain Catalyst expressions,
    so the SAME plan runs on a batch frame — that is what makes the
    streaming operator oracle-checkable: the driver gate replays this
    function in batch against a DuckDB twin, and the pytest
    stream≡batch test proves the streaming execution emits the same
    rows for closed windows).
    """
    return (
        df.withColumn("tile_x", tile_x(F.col("lon"), z))
        .withColumn("tile_y", tile_y(F.col("lat"), z))
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col("tile_x"),
            F.col("tile_y"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "tile_x",
            "tile_y",
            "n",
        )
    )


def streaming_tile_heatmap(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    z: int = 12,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """readStream(parquet dir) -> windowed tile counts with watermark.

    Returns the streaming DataFrame; callers attach writeStream (tests
    use trigger(availableNow=True) + memory sink).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return tile_window_counts(
        stream.withWatermark(ts_col, watermark),
        z=z,
        window_duration=window_duration,
        ts_col=ts_col,
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> None:
    """Drain everything currently available into an in-memory table
    named `query_name` (complete mode so all windows are visible)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
