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


def max_committed_batch_id(table: SnapshotTable) -> int:
    """Highest stream_batch_id in the manifest, or -1 if none."""
    ids = committed_batch_ids(table)
    return max(ids) if ids else -1


def make_batch_committer(table: SnapshotTable):
    """The idempotent foreachBatch callback (exposed so tests can drive
    the crash-replay path directly).

    Replay detection is O(1) per batch, not O(history): Structured
    Streaming's batch ids are monotonically increasing and a replayed id
    is always <= the last one this query committed, so the committer reads
    the manifest ONCE at query (re)start for the high-water mark and then
    tracks it in the closure. Without this, a long-lived append stream
    pays an O(total-batches) manifest parse per microbatch — quadratic
    over the stream's lifetime."""
    state = {"max_id": max_committed_batch_id(table)}

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state["max_id"]:
            return  # replay after a crash: already durable, skip
        table.commit(
            batch_df, mode="append", meta={"stream_batch_id": int(batch_id)}
        )
        state["max_id"] = batch_id

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
