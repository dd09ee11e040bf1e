"""Trending tokens over a document stream — windowed frequency with a
per-window top-k.

Streaming-legal decomposition (Spark forbids rank windows on a
streaming aggregate):

  1. the STREAMING part is only what must be incremental: watermarked
     (window x token) counts — explode + map-side-combining agg, the
     same state shape as the tile heatmap;
  2. the top-k rank runs per MICRO-BATCH over the closed windows via
     ``foreachBatch`` (or over the finished sink table in batch) —
     rank-per-window on the tiny aggregate, never on raw tokens.

The foreachBatch sink follows streaming/validate.py's idempotence
contract: each micro-batch overwrites its own deterministic
``batch_id=<id>`` partition directory, so an at-least-once replay
rewrites the same rows instead of appending duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def streaming_token_counts(
    stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """timestamped doc stream -> watermarked (window_start, token, n)
    counts. `stream` is any streaming DataFrame with (ts, text)."""
    from osm_pt_validator_spark.operators.text import tokens

    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col), F.explode(tokens(F.col(text_col))).alias("token")
        )
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col("token"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "token", "n")
    )


def top_k_per_window(counts: DataFrame, k: int = 5) -> DataFrame:
    """Batch rank over the (window, token, n) aggregate: top-k tokens
    per window, ties broken by token for determinism. Runs over the
    aggregate (tiny), so the rank window is cheap; WindowGroupLimit
    still prunes map-side."""
    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def start_trending_sink(
    counts: DataFrame, out_path: str, k: int = 5, checkpoint: str | None = None
):
    """writeStream(foreachBatch): rank each micro-batch's closed
    windows and overwrite that batch's own partition dir (idempotent
    under at-least-once replay)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        top = top_k_per_window(batch_df, k=k)
        top.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    # default (append) output mode: batch_df carries only windows the
    # watermark has CLOSED — state is evicted, which is the 100 TB
    # shape (complete mode would pin every window ever seen in state)
    writer = counts.writeStream.foreachBatch(_process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()
