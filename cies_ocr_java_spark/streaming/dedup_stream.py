"""Stateful streaming dedup: drop content-duplicate documents ACROSS
microbatches with applyInPandasWithState.

The batch dedup operators (operators/dedup.py) see the whole corpus at
once; an ingestion stream does not — the "seen" set must live in Spark's
state store, keyed by content fingerprint, surviving across triggers and
restarts (checkpointed). This is the custom-stateful-operator pattern
(applyInPandasWithState) applied to the training-data pipeline's most
common streaming need: don't ingest what you already have.

Semantics: the FIRST document with a given fingerprint (min doc_id within a
batch for determinism) is emitted; every later arrival — same batch or any
later batch — is dropped.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from cies_ocr_java_spark.functions.text import fingerprint

OUTPUT_SCHEMA = StructType(
    [
        StructField("fp", StringType()),
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)
STATE_SCHEMA = StructType([StructField("seen", BooleanType())])


def _dedup_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        (seen,) = state.get
    else:
        seen = False
    if not seen:
        first = None
        for pdf in pdfs:
            cand = pdf.sort_values("doc_id").iloc[0]
            if first is None or cand["doc_id"] < first["doc_id"]:
                first = cand
        if first is not None:
            state.update((True,))
            yield pd.DataFrame(
                {"fp": [key[0]], "doc_id": [first["doc_id"]], "text": [first["text"]]}
            )
    else:
        for _ in pdfs:  # drain; everything is a duplicate
            pass
    # NOTE: no state timeout — the seen-set is permanent by design; at scale
    # bound it with a TTL (GroupStateTimeout.ProcessingTimeTimeout) if the
    # stream's dedup horizon is finite.


def streaming_exact_dedup(
    stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """stream(doc_id, text, ...) -> first-occurrence rows only (fp, doc_id,
    text), exact-deduplicated across ALL microbatches via keyed state."""
    keyed = stream.select(
        fingerprint(F.col(text_col)).alias("fp"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        _dedup_group,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
