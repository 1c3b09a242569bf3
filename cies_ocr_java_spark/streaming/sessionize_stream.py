"""Streaming sessionization with EVENT-TIME timeouts: sessions close when
the watermark passes last_event + gap, not when more data happens to show
up for the key.

Batch sessionization (queries.events_sessionize) sees the whole history;
a stream cannot — the open session lives in the state store and the
WATERMARK is the clock that closes it (GroupStateTimeout.EventTimeTimeout:
the timeout callback fires for a key once the watermark passes its
registered timestamp, even if that key never receives another event —
exactly what a lag-window can't do incrementally).

Emitted rows are CLOSED sessions only (append semantics): one row per
(user_id, session) with start/end/count. State per key is O(1); the
watermark bounds how long an idle key's state survives, so state size is
active-users x gap, not lifetime users.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

SESSION_GAP_MS = 30 * 60 * 1000  # 30 minutes, matching the batch query

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    closed: list[tuple[int, int, int]] = []
    if state.hasTimedOut:
        # watermark passed last_event + gap with no new events: close
        start_us, last_us, n = state.get
        closed.append((start_us, last_us, n))
        state.remove()
    else:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            us = (rows["ts"].astype("int64") // 1000).sort_values().tolist()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = us[0]
                n = 0
            for t in us:
                if t - last_us > SESSION_GAP_MS * 1000:
                    closed.append((start_us, last_us, n))
                    start_us, n = t, 0
                last_us = t
                n += 1
            state.update((start_us, last_us, n))
            # close this session when the WATERMARK passes last + gap
            state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_MS)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start_us": [c[0] for c in closed],
                "session_end_us": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )


def streaming_sessionize(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """events(user_id, ts, ...) -> closed sessions, watermark-driven."""
    src = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    ).withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
