"""Stream-stream watermarked interval join — streaming enrichment.

The one Structured Streaming operator class the rest of streaming/
does not cover: joining TWO unbounded streams (e.g. enriching a stream
of page-mention events with the route-update events they refer to,
clicks with impressions, verdicts with crawl manifests).

Spark buffers both sides in state; what makes this viable at scale is
the pair (watermark, time-range join condition): the range bound lets
the engine compute, per side, the oldest row that can still find a
match, and the watermark lets it EVICT everything older. An equi-join
without the range condition is legal for inner joins but its state
grows without bound — at 100 TB/day that is an OOM with extra steps,
so this module's API makes the lag bound mandatory.

Semantics: inner join; a right row matches a left row when the keys are
equal and right_ts is in [left_ts - lag, left_ts] (the "enriching event
precedes the enriched one by at most `lag`" contract — the streaming
analogue of operators/temporal.asof_join's backward window, except
stream-stream yields ALL matches in the interval, not just the latest:
picking one row per left key would need the full interval in state
anyway, so Spark exposes the multi-match form and a downstream agg
picks winners).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_from_dir(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    ts_col: str,
    watermark: str,
) -> DataFrame:
    """File-source stream with its watermark attached (both join sides
    need one, or state never evicts)."""
    return (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark(ts_col, watermark)
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lag: str = "10 minutes",
) -> DataFrame:
    """Inner stream-stream join: keys equal AND
    right_ts BETWEEN left_ts - lag AND left_ts.

    Both inputs must already carry watermarks (stream_from_dir). The
    range predicate is what bounds the join state: each side keeps only
    rows younger than (other side's watermark - lag). Output columns:
    all left columns, then the right's non-key columns (key columns are
    emitted once, from the left); a right column whose name collides
    with a left column is emitted as r_<name> so the result is always
    selectable/sinkable (duplicate names raise on any downstream
    reference).
    """
    cond = " AND ".join(
        [f"l.{k} = r.{k}" for k in keys]
        + [
            f"r.{right_ts} >= l.{left_ts} - INTERVAL {lag}",
            f"r.{right_ts} <= l.{left_ts}",
        ]
    )
    joined = left.alias("l").join(right.alias("r"), F.expr(cond), "inner")
    right_cols = [c for c in right.columns if c not in keys]
    taken = set(left.columns)
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[
            F.col(f"r.{c}").alias(f"r_{c}" if c in taken else c)
            for c in right_cols
        ],
    )
