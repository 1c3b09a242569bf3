"""Span classification: declared kind + content sniffing.

Reference parity: MIME guessing from filename extension with fallback
(Utility.java:99-106) and the content-type predicate P2 gating the PDF
shortcut (DocumentExtractManager.java:414). Here the declared span ``kind``
plays the content-type role; when it is null/unknown we sniff the payload —
all as codegen'd Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from cies_ocr_java_spark.formats import PDF_HEADER

KNOWN_KINDS = ("html", "pdf", "text", "media")


def sniff_kind(kind: Column, text: Column, media_ref: Column) -> Column:
    """Resolve the effective kind: declared if valid, else sniffed."""
    sniffed = (
        F.when(media_ref.isNotNull(), F.lit("media"))
        .when(text.startswith(PDF_HEADER), F.lit("pdf"))
        .when(F.lower(text).rlike(r"^\s*<(!doctype\s+html|html)"), F.lit("html"))
        .otherwise(F.lit("text"))
    )
    return F.when(kind.isin(*KNOWN_KINDS), kind).otherwise(sniffed)


def span_invalid(kind: Column, text: Column, media_ref: Column) -> Column:
    """Request-validation analog (P7, CanonicalRequest.java:56-101): a
    non-media span must carry a body; a media span must carry a media_ref."""
    return F.when(kind == "media", media_ref.isNull()).otherwise(text.isNull())
