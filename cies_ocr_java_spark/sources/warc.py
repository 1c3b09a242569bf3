"""WARC-subset reader: the web-archive record format (Common Crawl's
container) as a scalable Spark source.

A WARC file is a sequence of records: a version line (``WARC/1.0``),
header lines (``Name: value``), a blank line, then the payload. The
scalable trick: set the text source's record delimiter (``lineSep``) to
the version line, so Spark hands back ONE ROW PER RECORD with ordinary
byte-split parallelism — no wholeTextFiles (whole file on one executor),
no custom InputFormat. Header/payload parsing is then plain codegen'd
column work (split on the first blank line, regexp_extract the headers).

Constraints of the subset (deliberate, same philosophy as the PDF parser —
SURVEY.md §7.0): text payloads (content is not gzip-compressed per
record), LF or CRLF line endings, headers we care about are
WARC-Target-URI / WARC-Date / WARC-Record-ID / WARC-Type / Content-Type.
Real Common Crawl WARCs are per-record gzip members; that variant needs a
binaryFile + mapInPandas gunzip pass in front of the same parse — the
schema and downstream pipeline are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

RECORD_DELIM = "WARC/1.0"

_HDR = {
    "url": "WARC-Target-URI",
    "warc_date": "WARC-Date",
    "record_id": "WARC-Record-ID",
    "warc_type": "WARC-Type",
    "content_type": "Content-Type",
}


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Parse a WARC-subset file into
    (record_id, warc_type, url, warc_date, content_type, content).

    One text-source scan, records split by the WARC version line; every
    parse step is a built-in expression (no UDF). Records before the first
    delimiter (empty preamble) and non-document types are kept — filter
    ``warc_type = 'response'`` downstream for page bodies."""
    raw = spark.read.option("lineSep", RECORD_DELIM).text(path)
    rec = F.col("value")
    # normalize CRLF so header parsing is single-grammar
    rec = F.regexp_replace(rec, "\r\n", "\n")
    # header block = up to the first blank line; payload = the rest
    hdr = F.substring_index(rec, "\n\n", 1)
    # the payload may itself contain blank lines: strip exactly the header
    # block + the separator, keep everything else verbatim
    body = F.expr(
        "substring(value_n, length(hdr_block) + 3)"
    )
    df = (
        raw.where(F.length(F.trim(rec)) > 0)
        .select(rec.alias("value_n"))
        .withColumn("hdr_block", F.substring_index(F.col("value_n"), "\n\n", 1))
    )
    cols = [
        F.regexp_extract(
            F.col("hdr_block"), rf"(?m)^{header}:\s*(.*)$", 1
        ).alias(name)
        for name, header in _HDR.items()
    ]
    return df.select(
        *cols,
        F.rtrim(body).alias("content"),
    )


def warc_to_documents(warc: DataFrame) -> DataFrame:
    """Map parsed WARC responses onto the engine's interleaved documents
    shape (doc_id, spans): the page body becomes a single span whose kind
    is sniffed downstream by the extraction pipeline."""
    resp = warc.where(F.col("warc_type") == "response")
    kind = F.when(
        F.col("content_type").startswith("text/html"), F.lit("html")
    ).otherwise(F.lit("text"))
    return resp.select(
        F.col("record_id").alias("doc_id"),
        F.array(
            F.struct(
                kind.alias("kind"),
                F.col("content").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
