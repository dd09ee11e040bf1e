"""Stateful streaming dedup — first-seen-wins across micro-batches.

The batch engine's exact dedup (operators/dedup.py) keys on a text
fingerprint within one dataset; at stream-ingestion time (continuously
arriving Common-Crawl-style pages) the same guarantee needs state that
survives micro-batches: a url/fingerprint that appeared in ANY earlier
batch must not be re-emitted.

Implemented with ``applyInPandasWithState`` (Arrow-batched per-group
user state — the Spark-native custom stateful operator). State per key
is a single int flag; Spark partitions state by the grouping key so
state size scales horizontally with executors, and a TTL can be
attached via ProcessingTimeTimeout when keys are known to expire.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def streaming_first_seen(
    stream: DataFrame,
    key_col: str = "url",
    output_schema: str | StructType | None = None,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Emit only the first row ever seen for each `key_col` value.

    Rows after the first (within a batch or in any later micro-batch)
    are dropped. Output schema defaults to the input schema.

    `state_ttl_ms` bounds per-key state: with a TTL, a key idle for
    that long is evicted (ProcessingTimeTimeout) and a later arrival is
    treated as first-seen again. On a 10^12-url stream, unbounded keyed
    state is a scale-killer — production runs should always set a TTL
    matched to the re-crawl horizon.
    """
    out_schema = output_schema or stream.schema
    ttl = state_ttl_ms

    def _first_seen(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expired with no new rows this batch: evict the key
            state.remove()
            return
        if state.exists:
            # key already emitted in an earlier micro-batch: consume
            # and drop everything, but keep refreshing the TTL so a
            # *hot* duplicate key stays deduped
            for _ in pdfs:
                pass
            if ttl is not None:
                state.setTimeoutDuration(ttl)
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if first is None and len(pdf) > 0:
                first = pdf.iloc[:1]
        if first is not None:
            state.update((1,))
            if ttl is not None:
                state.setTimeoutDuration(ttl)
            yield first

    return stream.groupBy(key_col).applyInPandasWithState(
        _first_seen,
        outputStructType=out_schema,
        stateStructType="seen integer",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
