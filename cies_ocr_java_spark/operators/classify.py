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


def sniff_charset_cols(payload: Column) -> dict[str, Column]:
    """Charset sniff + transcode for raw document bytes — the ingest-edge
    concern the reference delegates to Textract/Tika defaults; a crawl
    corpus arrives in mixed encodings and mis-decoding silently corrupts
    every downstream span offset.

    Detection is from the BYTES alone, entirely JVM-side codegen:
      1. byte-order marks win: EF BB BF -> utf-8-bom, FF FE -> utf-16le,
         FE FF -> utf-16be (FF/FE can never begin well-formed UTF-8, so
         BOM-first ordering cannot misfire on real UTF-8 text);
      2. else strict UTF-8 validation (F.is_valid_utf8) -> utf-8 — UNLESS
         the bytes contain a NUL: real text never does, but BOM-less
         UTF-16 of ASCII content is all NULs and happens to be valid
         UTF-8. First-NUL parity disambiguates byte order (ASCII-LE is
         ``ch 00`` -> first NUL at even 1-based position; BE is ``00 ch``
         -> odd) — the chardet/ICU null-pattern heuristic, exact on any
         ASCII-content BOM-less UTF-16 stream;
      3. else latin-1 — the only single-byte fallback that is total (every
         byte sequence decodes), so the chain can never fail: the classic
         chardet lattice collapsed to its safe floor.

    Returns {"charset", "text", "had_bom"} columns; ``text`` is decoded
    with the matching charset, BOM stripped (Java's UTF-16LE/BE decoders
    do NOT strip BOMs — only the auto-detecting UTF-16 does — so the
    strip is explicit). substring() on BinaryType slices bytes (not
    codepoints), which is what makes the BOM strip, the hex probes, and
    the NUL-parity position exact."""
    h3 = F.hex(F.substring(payload, 1, 3))
    h2 = F.hex(F.substring(payload, 1, 2))
    # byte-faithful view for the NUL probe: latin-1 decode is total and
    # position-preserving (1 byte = 1 char)
    nul_pos = F.instr(F.decode(payload, "ISO-8859-1"), "\x00")
    has_bom = (h3 == "EFBBBF") | h2.isin("FFFE", "FEFF")
    charset = (
        F.when(h3 == "EFBBBF", F.lit("utf-8-bom"))
        .when(h2 == "FFFE", F.lit("utf-16le"))
        .when(h2 == "FEFF", F.lit("utf-16be"))
        .when(F.is_valid_utf8(payload) & (nul_pos == 0), F.lit("utf-8"))
        .when(
            F.is_valid_utf8(payload) & (nul_pos % 2 == 0),
            F.lit("utf-16le"),
        )
        .when(F.is_valid_utf8(payload), F.lit("utf-16be"))
        .otherwise(F.lit("latin-1"))
    )
    strip2 = F.substring(payload, 3, F.lit(2147483647))
    text = (
        F.when(
            charset == "utf-8-bom",
            F.decode(F.substring(payload, 4, F.lit(2147483647)), "UTF-8"),
        )
        .when(
            charset == "utf-16le",
            F.decode(
                F.when(h2 == "FFFE", strip2).otherwise(payload), "UTF-16LE"
            ),
        )
        .when(
            charset == "utf-16be",
            F.decode(
                F.when(h2 == "FEFF", strip2).otherwise(payload), "UTF-16BE"
            ),
        )
        .when(charset == "utf-8", F.decode(payload, "UTF-8"))
        .otherwise(F.decode(payload, "ISO-8859-1"))
    )
    return {"charset": charset, "text": text, "had_bom": has_bom}
