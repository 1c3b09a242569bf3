"""Streaming vocabulary heavy hitters: a Misra-Gries sketch maintained in
keyed state with applyInPandasWithState.

The batch operator (operators/sketches.py heavy_hitters) sees the whole
corpus; an ingestion stream must track the top vocabulary INCREMENTALLY —
the sketch lives in Spark's state store, keyed by hash shard, surviving
triggers and restarts. Each shard holds at most ``k`` (token, count)
entries regardless of stream length: per-trigger state work is O(k + batch
distinct), never O(stream) — the whole point of the sketch.

Semantics per shard and trigger: merge the batch's token counts into the
sketch, and if more than ``k`` entries remain, subtract the (k+1)-th
largest count from every entry and drop the non-positives (the batched
Misra-Gries decrement). The surviving counts are LOWER bounds on true
counts; every token whose true count exceeds N_shard/(k+1) is guaranteed
to survive — the same guarantee the batch operator documents, maintained
online. After each trigger the shard emits its current sketch (update
mode); a downstream batch merge over shards yields the global candidate
set for an exact recount, exactly like the batch path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("token", StringType()),
        StructField("lower_count", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("tokens", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _make_mg_group(k: int):
    def mg_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tokens, counts = state.get
            sketch = dict(zip(tokens, (int(c) for c in counts)))
        else:
            sketch = {}
        for pdf in pdfs:
            for tok, c in pdf["token"].value_counts().items():
                sketch[tok] = sketch.get(tok, 0) + int(c)
        if len(sketch) > k:
            cut = sorted(sketch.values(), reverse=True)[k]
            sketch = {t: c - cut for t, c in sketch.items() if c - cut > 0}
        state.update((list(sketch.keys()), list(sketch.values())))
        out = sorted(sketch.items())
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(out),
                "token": [t for t, _ in out],
                "lower_count": [c for _, c in out],
            }
        )

    return mg_group


def streaming_heavy_hitters(
    stream: DataFrame,
    token_col: str = "token",
    k: int = 8,
    shards: int = 4,
) -> DataFrame:
    """stream(token, ...) -> per-shard Misra-Gries candidates (shard,
    token, lower_count), updated every trigger. Sharding is by token hash
    so a shard always sees ALL occurrences of its tokens (the per-shard
    MG guarantee stays exact); ``shards`` spreads state across executors."""
    keyed = stream.select(
        (F.abs(F.hash(F.col(token_col))) % shards).cast("int").alias("shard"),
        F.col(token_col).cast("string").alias("token"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_mg_group(k),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
