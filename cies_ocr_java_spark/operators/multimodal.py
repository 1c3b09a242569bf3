"""Multimodal (image/audio/video) column handling.

Media payloads are opaque ``binary`` columns with typed metadata, processed
via Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema,
batching, partitioning) is real and tested; the actual codec step is STUBBED
(no image/audio libraries in this environment) behind
``decode_media_payload``: by default it raises NotImplementedError, and the
pipeline uses ``fake_decode=True`` which derives deterministic pseudo-
metadata from the bytes so the dataflow is exercisable end-to-end.

At scale: media bytes never leave the executor as Python objects row-by-row
— Arrow ships whole batches, batch size bounded by
spark.sql.execution.arrow.maxRecordsPerBatch (session.py) so a 4K-video row
cannot blow the heap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_FEATURES_SCHEMA = (
    "media_ref string, n_bytes long, width int, height int, n_frames int, "
    "mime string"
)


def decode_media_payload(content: bytes) -> dict:
    """REAL codec hook — wire PIL/ffmpeg here on a cluster with the libs.

    Stubbed: this sandbox ships no image/audio libraries (SURVEY.md §7.0).
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; use fake_decode=True for the deterministic stub"
    )


def _fake_decode(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic pseudo-decode: metadata derived from payload size.
    Stands in for the codec so plumbing/partitioning/batching are testable."""
    return pd.DataFrame(
        {
            "width": (n_bytes % 640).astype("int32"),
            "height": ((n_bytes * 7) % 480).astype("int32"),
            "n_frames": (1 + n_bytes % 5).astype("int32"),
        }
    )


def extract_media_features(
    df: DataFrame,
    ref_col: str = "media_ref",
    content_col: str = "content",
    fake_decode: bool = True,
) -> DataFrame:
    """(media_ref, content:binary) -> typed feature rows via mapInPandas."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf[content_col].map(lambda b: len(b) if b is not None else 0)
            if fake_decode:
                meta = _fake_decode(n_bytes.astype("int64"))
            else:  # pragma: no cover - requires codec libs
                meta = pd.DataFrame(
                    [decode_media_payload(b) for b in pdf[content_col]]
                )
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": meta["width"],
                    "height": meta["height"],
                    "n_frames": meta["n_frames"],
                    "mime": "application/octet-stream",
                }
            )

    return df.select(ref_col, content_col).mapInPandas(op, MEDIA_FEATURES_SCHEMA)
