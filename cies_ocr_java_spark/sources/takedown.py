"""Takedown propagation: one request, every table.

The reference's DELETE verb (DocumentExtractManager.java:233-265) removes a
document and its extraction results from the mutable store. At corpus scale
the same request (GDPR erasure, DMCA takedown) must ALSO reach every table
derived from the document — extracted spans, per-doc state, and any pair
table whose rows reference the doc as either endpoint — or the content
survives its own deletion. This module composes SnapshotTable.delete_where
across the fleet of tables so one call erases a doc-id set everywhere,
atomically per table, with pre-delete snapshots retained for audit until
``expire_snapshots`` runs the physical reclaim.

Scale note: the doc-id list is a TAKEDOWN BATCH (bounded — a legal request,
not a data-sized set), so an ``IN`` predicate is the right shape: it pushes
down into every table's parquet scan and the delete rewrites only files
that contain a hit. For data-sized deletion sets (e.g. "drop every doc the
quality filter rejected"), express the filter as a predicate on the table's
own columns instead and call delete_where directly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession

from cies_ocr_java_spark.sources.snapshots import SnapshotTable


def takedown_docs(
    spark: SparkSession,
    doc_ids: Sequence,
    *,
    doc_tables: dict[str, SnapshotTable] | None = None,
    pair_tables: dict[str, tuple[SnapshotTable, str, str]] | None = None,
    key: str = "doc_id",
) -> dict[str, dict]:
    """Delete ``doc_ids`` from every table.

    ``doc_tables``: name -> table keyed by ``key`` (documents,
    extracted_spans, doc_state, ...). ``pair_tables``: name ->
    (table, left_col, right_col); a pair row dies when EITHER endpoint
    is taken down — a near-dup pair referencing an erased doc leaks its
    existence otherwise.

    Returns per-table {"snapshot_id", "rows_deleted"}; a table with no
    matching rows reports rows_deleted=0 and its snapshot id unchanged
    (delete_where no-ops rather than committing empty snapshots).
    """
    from pyspark.sql import functions as F

    ids = list(doc_ids)
    if not ids:
        raise ValueError("takedown with empty doc_id set")
    report: dict[str, dict] = {}
    for name, tbl in (doc_tables or {}).items():
        before = tbl.read(spark).filter(F.col(key).isin(ids)).count()
        sid = tbl.delete_where(spark, F.col(key).isin(ids)) \
            if before else tbl.current_snapshot_id()
        report[name] = {"snapshot_id": sid, "rows_deleted": before}
    for name, (tbl, left, right) in (pair_tables or {}).items():
        pred = F.col(left).isin(ids) | F.col(right).isin(ids)
        before = tbl.read(spark).filter(pred).count()
        sid = tbl.delete_where(spark, pred) \
            if before else tbl.current_snapshot_id()
        report[name] = {"snapshot_id": sid, "rows_deleted": before}
    return report
