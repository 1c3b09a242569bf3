"""Document-lifecycle API — the reference's HTTP verb surface re-expressed
over snapshot tables, so a user of cies-ocr-java can drive the same
operations here:

    reference (DocumentLambda.java:46-64)          this API
    ------------------------------------------     ------------------------------
    POST /{id}    ingest document                  ingest_documents(...)
    GET  /{id}    fetch body+metadata              get_document(...)
    HEAD /{id}    metadata+status only             get_document_metadata(...)
    DELETE /{id}  remove from source store         delete_documents(...)
    GET /text/{id}   extracted text                get_text(...)
    GET /text/{id} (Accept: json)  span JSON       get_json(...)
    HEAD polling loop (DocumentProcessor)          poll_status(...)

Semantics pinned to the reference:
  * POST of an existing id is a conflict (DocumentLambda.java:107-110).
  * HEAD never reads the body — column-pruned scan (S3).
  * .txt vs .json is the flat text column vs to_json(spans) (Utility.java:108-118).
  * unknown status -> 'New' (DocumentExtractStatus.java:12-18).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cies_ocr_java_spark.functions.paths import coerce_status
from cies_ocr_java_spark.schema import STATUS_NEW
from cies_ocr_java_spark.sources.snapshots import SnapshotTable


class DocumentStore:
    """Source + destination stores over one output root (documents /
    extracted_spans / doc_state snapshot tables)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.documents = SnapshotTable(os.path.join(root, "documents"))
        self.extracted = SnapshotTable(os.path.join(root, "extracted_spans"))
        self.state = SnapshotTable(os.path.join(root, "doc_state"))

    # --- POST ----------------------------------------------------------------
    def ingest_documents(self, docs: DataFrame, on_conflict: str = "error") -> int:
        """Append new documents; duplicate doc_ids are conflicts
        (reference returns 409). on_conflict: 'error' | 'skip'.

        F8: a document arriving WITHOUT an identifier gets a UUID
        assigned at ingest (DocumentExtractManager.java:160,
        ``UUID.randomUUID()`` when absent) — the one intentionally
        nondeterministic column in the engine; everything downstream
        keys on it, and fixtures/tests pass explicit doc_ids precisely
        so their runs replay deterministically."""
        if "doc_id" not in docs.columns:
            docs = docs.withColumn("doc_id", F.expr("uuid()"))
        else:
            docs = docs.withColumn(
                "doc_id", F.coalesce(F.col("doc_id"), F.expr("uuid()"))
            )
        if self.documents.exists():
            existing = self.documents.read(self.spark).select("doc_id")
            if on_conflict == "error":
                n = docs.join(existing, "doc_id", "left_semi").count()
                if n:
                    raise ValueError(f"conflict: {n} doc_id(s) already ingested")
            else:
                docs = docs.join(existing, "doc_id", "left_anti")
        return self.documents.commit(docs, mode="append")

    # --- PUT -----------------------------------------------------------------
    def put_documents(self, docs: DataFrame) -> int:
        """PUT /{id}: idempotent create-or-replace. The reference's PUT
        branch writes without an existence check (DocumentLambda.java PUT
        path — only POST conflicts); here that is a row-level upsert
        committed as one overwrite snapshot (SnapshotTable.merge)."""
        return self.documents.merge(self.spark, docs, key="doc_id")

    # --- GET / HEAD -----------------------------------------------------------
    def get_document(self, doc_id: str) -> DataFrame:
        """Body + metadata point lookup (S2) — predicate pushed to parquet."""
        return self.documents.read(self.spark).where(F.col("doc_id") == doc_id)

    def get_document_metadata(self, doc_id: str | None = None) -> DataFrame:
        """HEAD: metadata + coerced status, NO body column read (S3/P1).
        Column pruning reaches the scan — spans are never deserialized."""
        docs = self.documents.read(self.spark).select("doc_id")
        if doc_id is not None:
            docs = docs.where(F.col("doc_id") == doc_id)
        if self.state.exists():
            st = (
                self.state.read(self.spark)
                .groupBy("doc_id")
                .agg(F.max_by("status", "snapshot_id").alias("status"),
                     F.max_by("job_id", "snapshot_id").alias("job_id"))
            )
            docs = docs.join(st, "doc_id", "left")
        else:
            docs = docs.withColumn("status", F.lit(None).cast("string")).withColumn(
                "job_id", F.lit(None).cast("string")
            )
        # last-state-wins single-valued status; unknown/null -> New — the
        # reference's INTENDED tag semantics (its updateStatusAndJobId
        # appends duplicate tags and reads first-match; we pin the intent,
        # SURVEY.md §2.7)
        return docs.select(
            "doc_id", coerce_status(F.col("status")).alias("status"), "job_id"
        )

    def poll_status(self, doc_id: str) -> str:
        """The DocumentProcessor HEAD-poll answer, one value."""
        rows = self.get_document_metadata(doc_id).collect()
        return rows[0]["status"] if rows else STATUS_NEW

    # --- results ---------------------------------------------------------------
    def get_text(self, doc_id: str) -> DataFrame:
        """GET /text/{id} with Accept: text/plain — the flat text column."""
        return (
            self.extracted.read(self.spark)
            .where(F.col("doc_id") == doc_id)
            .select("doc_id", "text")
        )

    def get_json(self, doc_id: str) -> DataFrame:
        """GET /text/{id} with Accept: application/json — span JSON."""
        return (
            self.extracted.read(self.spark)
            .where(F.col("doc_id") == doc_id)
            .select("doc_id", F.to_json("spans").alias("spans_json"))
        )

    # --- DELETE ---------------------------------------------------------------
    def delete_documents(self, doc_ids: list[str]) -> int:
        """S8 (DocumentExtractManager.java:233-265): row-level delete as
        file-granular copy-on-write (SnapshotTable.delete_where) — only
        data files containing a hit are rewritten, untouched files are
        re-referenced, and time travel to the pre-delete snapshot still
        works until expire_snapshots reclaims it. To erase a doc from
        the DERIVED tables too (spans/state/pair tables), compose with
        sources.takedown.takedown_docs."""
        return self.documents.delete_where(
            self.spark, F.col("doc_id").isin(doc_ids)
        )
