"""Custom stateful streaming operator: per-conversation progress state.

The reference's only streaming state is the flushed cursor map
(``/root/reference/types/state.go:64-70``). A transcripts pipeline also
wants LIVE per-entity rollups — how many events each conversation has
produced, its highest turn, the last LSN seen — maintained incrementally
across micro-batches without re-scanning the table.

Spark-native: ``applyInPandasWithState`` (Arrow-batched per-group state,
never row-at-a-time Python). State per conv_id is a single tuple; groups
idle past ``timeout_min`` minutes of EVENT time are finalized and evicted
(watermark-driven GroupStateTimeout), bounding state size on unbounded
keyspaces — the 10^10-event requirement.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, n_events long, max_turn int, last_lsn long, "
    "finalized boolean"
)
STATE_SCHEMA = "n_events long, max_turn int, last_lsn long"


def _track(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        n, mt, lsn = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "n_events": n,
                    "max_turn": mt,
                    "last_lsn": lsn,
                    "finalized": True,
                }
            ]
        )
        return
    n, mt, lsn = state.get if state.exists else (0, -1, -1)
    for pdf in pdfs:
        n += len(pdf)
        mt = max(mt, int(pdf["turn_idx"].max()))
        lsn = max(lsn, int(pdf["lsn"].max()))
    state.update((n, mt, lsn))
    # Evict once the watermark passes idle-timeout beyond the latest data.
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 30 * 60 * 1000)
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_events": n,
                "max_turn": mt,
                "last_lsn": lsn,
                "finalized": False,
            }
        ]
    )


def conversation_progress(changes: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming per-conversation rollup with evicted-on-idle state.

    Input: the streaming change feed (lsn, ts_ms, conv_id, turn_idx, ...).
    Output (update mode): one row per conv per micro-batch it appeared
    in, plus a ``finalized=True`` row when its state times out.
    """
    ev = changes.withColumn(
        "event_time", F.timestamp_millis(F.col("ts_ms"))
    ).withWatermark("event_time", watermark)
    return (
        ev.groupBy("conv_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
