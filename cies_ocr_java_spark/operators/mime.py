"""MIME multipart parsing + transfer-encoding decode, all codegen.

Mail archives and HTTP bodies carry multipart MIME: a boundary declared
in the top Content-Type header splits the message into parts, each with
its own headers and a Content-Transfer-Encoding (7bit / quoted-printable
/ base64). A corpus built from mail or mixed crawl payloads must decode
these or it trains on ``caf=C3=A9`` and base64 walls.

Decode strategy (RFC 2045): base64 is the built-in ``unbase64`` after
whitespace strip; quoted-printable has no builtin, so the decoder
HEX-NORMALIZES the whole string — every literal run becomes the hex of
its UTF-8 bytes (``hex(encode(..))``), every ``=XX`` escape contributes
``XX`` verbatim — then ONE ``unhex`` + ``decode(…, 'utf-8')`` rebuilds
the text. That per-byte assembly is what makes multi-byte escapes
(``=C3=A9`` → é) come out as characters instead of the Latin-1 mojibake
a chr()-per-byte decoder produces. Malformed escapes (``=Z…``, trailing
``=``) stay literal — defined degradation, never an exception.

Scale: everything is map-side whole-stage codegen over the message
column — no Python, no shuffle until the caller aggregates. The split
regex is a per-row column (the boundary differs per message), which
Spark compiles per row; boundaries are short and anchored so this stays
linear in message size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# A quoted-printable escape: '=' + exactly two hex digits.
_QP_HEX = r"^[0-9A-Fa-f]{2}"


def decode_quoted_printable(c: Column) -> Column:
    """Decode RFC 2045 quoted-printable: soft line breaks (``=\\n`` /
    ``=\\r\\n``) vanish, ``=XX`` escapes become bytes, byte runs decode
    as UTF-8. Malformed escapes stay literal."""
    c = F.regexp_replace(c, "=\r?\n", "")
    parts = F.split(c, "=", -1)
    first = F.hex(F.encode(F.element_at(parts, 1), "utf-8"))
    rest = F.transform(
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
        lambda x: F.when(
            x.rlike(_QP_HEX),
            F.concat(
                F.upper(F.substring(x, 1, 2)),
                F.hex(F.encode(F.substring(x, 3, 2 ** 30), "utf-8")),
            ),
        ).otherwise(F.hex(F.encode(F.concat(F.lit("="), x), "utf-8"))),
    )
    return F.decode(
        F.unhex(F.concat(first, F.array_join(rest, ""))), "utf-8"
    )


def decode_transfer(body: Column, encoding: Column) -> Column:
    """Apply a part's Content-Transfer-Encoding (case-insensitive):
    base64 → unbase64 over whitespace-stripped payload; quoted-printable
    → decode_quoted_printable; anything else passes through."""
    enc = F.lower(encoding)
    return (
        F.when(
            enc == "base64",
            F.decode(F.unbase64(F.regexp_replace(body, r"\s", "")), "utf-8"),
        )
        .when(enc == "quoted-printable", decode_quoted_printable(body))
        .otherwise(body)
    )


def parse_mime_parts_raw(df: DataFrame, payload,
                         doc_col: str = "doc_id") -> DataFrame:
    """Split a multipart MIME message into one row per part WITHOUT
    decoding: (doc_id, part_idx, content_type, encoding, body). The
    body stays in its transfer encoding — callers decode text parts
    with decode_transfer and BINARY parts (images, audio) with a plain
    ``unbase64``, which a UTF-8 text decode would corrupt. The boundary
    comes from the top-level Content-Type header; preamble (before the
    first boundary) and epilogue (after the closing ``--boundary--``)
    are dropped per RFC 2046 §5.1.1. Messages with no parseable
    boundary yield zero rows (defined degradation). Both \\n and
    \\r\\n line conventions accepted."""
    msg = F.coalesce(payload, F.lit(""))
    boundary = F.regexp_extract(msg, r'boundary="([^"]*)"', 1)
    # split on the delimiter line start '--' + boundary; literal-quote
    # the boundary (\Q..\E) so regex metachars in it cannot misfire
    pieces = F.split(
        msg, F.concat(F.lit("--"), F.lit("\\Q"), boundary, F.lit("\\E"))
    )
    rows = df.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(
            F.when(boundary == "", F.array().cast("array<string>"))
            .otherwise(pieces)
        ).alias("piece_idx", "piece"),
    ).where(
        (F.col("piece_idx") > 0) & ~F.col("piece").startswith("--")
    )
    hdrs = F.regexp_extract(F.col("piece"), r"(?s)^(.*?)\r?\n\r?\n", 1)
    body = F.regexp_replace(
        F.regexp_replace(F.col("piece"), r"(?s)^.*?\r?\n\r?\n", ""),
        r"\r?\n$", "",
    )
    ctype = F.lower(
        F.regexp_extract(hdrs, r"(?i)content-type:\s*([^;\s]+)", 1)
    )
    enc = F.lower(
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    hdrs, r"(?i)content-transfer-encoding:\s*(\S+)", 1
                ),
                F.lit(""),
            ),
            F.lit("7bit"),
        )
    )
    # part_idx = piece_idx - 1: piece 0 is always the preamble (the
    # Content-Type header precedes the first delimiter) and the epilogue
    # piece is last, so part indices are dense with NO window — the
    # parser stays fully stateless (streaming-capable, zero exchange).
    # A hostile mid-message '--boundary--' gaps the indices instead of
    # renumbering them (defined degradation, order still correct).
    return rows.select(
        "doc_id",
        (F.col("piece_idx") - 1).cast("int").alias("part_idx"),
        ctype.alias("content_type"),
        enc.alias("encoding"),
        body.alias("body"),
    )


def parse_mime_multipart(df: DataFrame, payload,
                         doc_col: str = "doc_id") -> DataFrame:
    """Parse a multipart MIME message column into one row per TEXT part:
    (doc_id, part_idx, content_type, encoding, decoded_text,
    decoded_len) — parse_mime_parts_raw plus decode_transfer."""
    parts = parse_mime_parts_raw(df, payload, doc_col)
    decoded = decode_transfer(F.col("body"), F.col("encoding"))
    return parts.select(
        "doc_id",
        "part_idx",
        "content_type",
        "encoding",
        decoded.alias("decoded_text"),
        F.length(decoded).cast("int").alias("decoded_len"),
    )
