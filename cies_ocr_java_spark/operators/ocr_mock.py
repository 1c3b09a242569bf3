"""Mock-OCR block decode + ordered assembly — the OCR path of EP2/EP3.

Reference parity: async Textract submission + paginated block retrieval with
the BlockType.PAGE filter and in-order text concatenation
(DocumentExtractManager.java:500-517 submit; 540-599 retrieve: nextToken loop,
maxResults(1000), PAGE filter at 554-556/585-587, Collectors.joining()).

The synthetic grammar carries the scanned content as ``%%OCRBlock <TYPE> <b64>``
lines (formats.py). Decoding is expressed ENTIRELY with built-in column
functions — the PAGE filter is the regex itself, base64 decode is
``unbase64``, per-block transforms run inside codegen, and the ordered
concat is ``array_join`` over the match array (which preserves document
order, exactly like the reference consumes blocks in service-returned order).
No Python in this path: at 100 TB the OCR decode is a pure JVM map stage.

``ocr_decode_udf`` is the Arrow-vectorized equivalent kept for parity tests
and as the extension point for real image decoding (see multimodal.py).
"""

from __future__ import annotations

import base64
import re

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

from cies_ocr_java_spark.formats import OCR_MARKER

# Only PAGE blocks contribute text — the BlockType.PAGE filter (P5) fused
# into the extraction regex.
_PAGE_BLOCK_PATTERN = rf"{re.escape(OCR_MARKER)} PAGE (\S+)"
_PAGE_RE = re.compile(_PAGE_BLOCK_PATTERN)
_WS_RE = re.compile(r"\s+")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def ocr_text_col(payload: Column | str) -> Column:
    """Decode PAGE blocks in document order and join with ' ', normalized.

    array_join(transform(regexp_extract_all(...), decode∘unbase64)) — the
    whole OCR retrieval+filter+concat contract as one codegen'd expression.
    """
    blocks = F.regexp_extract_all(_col(payload), F.lit(_PAGE_BLOCK_PATTERN), 1)
    decoded = F.transform(blocks, lambda b: F.decode(F.unbase64(b), "UTF-8"))
    return F.trim(F.regexp_replace(F.array_join(decoded, " "), r"\s+", " "))


def ocr_block_count(payload: Column | str) -> Column:
    """Number of PAGE blocks — drives batch-chunk metrics and skew salting."""
    return F.size(F.regexp_extract_all(_col(payload), F.lit(_PAGE_BLOCK_PATTERN), 1))


# --- pandas-UDF parity path ------------------------------------------------


def _decode_ocr_batch(payload: pd.Series) -> pd.Series:
    s = payload.fillna("")
    rid = pd.RangeIndex(len(s))
    s.index = rid
    matches = s.str.extractall(_PAGE_BLOCK_PATTERN)[0]
    if len(matches):
        decoded = matches.map(
            lambda b: base64.b64decode(b).decode("utf-8", errors="replace")
        )
        joined = decoded.groupby(level=0).agg(" ".join)
    else:
        joined = pd.Series(dtype="object")
    out = joined.reindex(rid).fillna("")
    return out.str.replace(_WS_RE, " ", regex=True).str.strip()


@F.pandas_udf(T.StringType())
def ocr_decode_udf(payload: pd.Series) -> pd.Series:
    return _decode_ocr_batch(payload)
