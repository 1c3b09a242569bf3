"""Multi-format document ingest: parquet / JSONL / CSV sources with a
corrupt-record side channel.

The reference ingests via ALB POST with per-request validation that
*collects* failures instead of aborting (CanonicalRequest.java:56-101,
InstanceValidationException.java:20-45 — a bad request 400s, the service
keeps running). The batch analog at the I/O boundary: a malformed line in
a 100 TB JSONL drop must not kill the job, and silently dropping it is
worse — it must land in a failure side output with the raw payload for
replay.

Spark mechanics: PERMISSIVE mode + ``columnNameOfCorruptRecord`` parses
bad lines to NULL columns and preserves the raw line in ``_corrupt``; one
pass splits the frame into (valid, rejects). The schema is always supplied
explicitly — schema inference over 100 TB is a full extra scan AND a
correctness hazard (a day's sample can infer a narrower type than
tomorrow's data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CORRUPT_COL = "_corrupt"

# flat documents-table shape (the driver testdata / text-corpus shape)
FLAT_DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


# one-row-per-span flat shape: what a CSV/TSV drop of the interleaved
# documents table looks like (CSV cannot carry array<struct>, so the nested
# DOCUMENTS schema is unreachable by the CSV reader — Spark's CSV source
# rejects array/struct read schemas with AnalysisException)
FLAT_SPAN_ROWS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)


def assemble_flat_spans(flat: DataFrame) -> DataFrame:
    """Flat (doc_id, kind, text, media_ref, offset) span rows -> nested
    DOCUMENTS shape (doc_id, spans array<struct> in offset order).

    ``sort_array`` over structs compares field-by-field, so putting
    ``offset`` first sorts each doc's spans by reading position regardless
    of arrival order — the same never-trust-arrival-order rule the
    assembly operator enforces (operators/assemble.py). One shuffle on
    doc_id; no Python."""
    return (
        flat.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ).alias("_s")
        )
        .select(
            "doc_id",
            F.transform(
                "_s",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


def _fmt_from_path(path: str) -> str:
    p = path.rstrip("/").lower()
    if p.endswith((".jsonl", ".json", ".ndjson")):
        return "json"
    if p.endswith((".csv", ".tsv")):
        return "csv"
    return "parquet"


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: T.StructType = FLAT_DOCUMENTS,
) -> tuple[DataFrame, DataFrame]:
    """Read a documents table from parquet/JSONL/CSV; returns
    ``(valid, rejects)``.

    ``valid`` has exactly ``schema``'s columns; ``rejects`` is
    (raw:string) — unparseable lines, preserved verbatim for replay (the
    P7 validation side channel at the format boundary). Parquet is
    self-describing, so its rejects frame is empty by construction."""
    fmt = fmt or _fmt_from_path(path)
    if fmt == "parquet":
        df = spark.read.parquet(path)
        valid = df.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])
        rejects = spark.createDataFrame([], "raw string")
        return valid, rejects

    with_corrupt = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    reader = spark.read.schema(with_corrupt).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if fmt == "json":
        df = reader.json(path)
    elif fmt == "csv":
        df = reader.option("header", "true").option(
            "sep", "\t" if path.rstrip("/").lower().endswith(".tsv") else ","
        ).csv(path)
    else:
        raise ValueError(f"unknown ingest format {fmt!r}")

    # Spark marks a bad line by populating CORRUPT_COL; a doc without an id
    # is rejected too (the reference 400s a bodyless/idless request).
    bad = F.col(CORRUPT_COL).isNotNull() | F.col("doc_id").isNull()
    valid = df.where(~bad).drop(CORRUPT_COL)
    rejects = df.where(bad).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct(*schema.names))).alias(
            "raw"
        )
    )
    return valid, rejects
