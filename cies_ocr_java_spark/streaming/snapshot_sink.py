"""Streaming sink into SnapshotTable: exactly-once microbatch commits.

foreachBatch gives at-least-once batch delivery — after a crash between
the sink's write and the checkpoint advance, Structured Streaming REPLAYS
the last batch. A sink is exactly-once only if it makes replays no-ops.
Here idempotence comes from the snapshot manifest itself: every committed
batch records its ``stream_batch_id`` in the snapshot's meta, and a
replayed batch id is skipped before any write happens. (This is the same
mechanism Iceberg/Delta use: the sink's transaction log carries the batch
id, so "has this batch committed?" is one metadata read.)

This closes the loop between the streaming operators and the table layer:
a streaming dedup/extraction/sessionization can land in the SAME
crash-safe, time-travelable tables the batch pipeline commits to, and
downstream incremental consumers pick new batches up via
``SnapshotTable.read_changes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cies_ocr_java_spark.sources.snapshots import SnapshotTable


def committed_batch_ids(table: SnapshotTable) -> set[int]:
    return {
        s.meta["stream_batch_id"]
        for s in table.history()
        if s.meta and "stream_batch_id" in s.meta
    }


def make_batch_committer(table: SnapshotTable):
    """The idempotent foreachBatch callback (exposed so tests can drive
    the crash-replay path directly)."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(table):
            return  # replay after a crash: already durable, skip
        table.commit(
            batch_df, mode="append", meta={"stream_batch_id": int(batch_id)}
        )

    return commit_batch


def write_stream_to_snapshot(
    stream_df: DataFrame,
    table_root: str,
    checkpoint: str,
    query_name: str = "snapshot_sink",
):
    """Start a foreachBatch query committing each microbatch as one
    idempotent append snapshot. Returns the StreamingQuery."""
    commit_batch = make_batch_committer(SnapshotTable(table_root))

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(commit_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .start()
    )
