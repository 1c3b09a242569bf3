"""Streaming sink into SnapshotTable: exactly-once microbatch commits.

foreachBatch gives at-least-once batch delivery — after a crash between
the sink's write and the checkpoint advance, Structured Streaming REPLAYS
the last batch. A sink is exactly-once only if it makes replays no-ops.
Here idempotence comes from the snapshot manifest itself: every committed
batch records its ``(stream_query, stream_batch_id)`` in the snapshot's
meta, and a replayed batch id is skipped before any write happens. (This
is the same mechanism Iceberg/Delta use: the sink's transaction log
carries the batch id, so "has this batch committed?" is one metadata
read.)

Replay keys are QUERY-SCOPED: batch ids restart from 0 per streaming
query, so two different queries appending into one table (the
multi-writer case the table layer now arbitrates) must not dedupe each
other's ids — each committer tracks the high-water mark of ITS
``query_name`` only. Pre-scoping history (entries without
``stream_query``) counts ONLY toward the default query name — counting
it toward every name would make a brand-new named query silently drop
its first batches as phantom replays (real data, never committed).
Migration note: a stream started under a custom name BEFORE scoping
existed must resume under the default name to keep its replay guard;
post-scoping streams carry their name in every commit.

This closes the loop between the streaming operators and the table layer:
a streaming dedup/extraction/sessionization can land in the SAME
crash-safe, time-travelable tables the batch pipeline commits to, and
downstream incremental consumers pick new batches up via
``SnapshotTable.read_changes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cies_ocr_java_spark.sources.snapshots import SnapshotTable

DEFAULT_QUERY_NAME = "snapshot_sink"


def committed_batch_ids(
    table: SnapshotTable, query_name: str = DEFAULT_QUERY_NAME
) -> set[int]:
    return {
        s.meta["stream_batch_id"]
        for s in table.history()
        if s.meta
        and "stream_batch_id" in s.meta
        and s.meta.get("stream_query", DEFAULT_QUERY_NAME) == query_name
    }


def max_committed_batch_id(
    table: SnapshotTable, query_name: str = DEFAULT_QUERY_NAME
) -> int:
    """Highest stream_batch_id this query committed, or -1 if none."""
    ids = committed_batch_ids(table, query_name)
    return max(ids) if ids else -1


def make_batch_committer(
    table: SnapshotTable, query_name: str = DEFAULT_QUERY_NAME
):
    """The idempotent foreachBatch callback (exposed so tests can drive
    the crash-replay path directly).

    Replay detection is O(1) per batch, not O(history): Structured
    Streaming's batch ids are monotonically increasing and a replayed id
    is always <= the last one this query committed, so the committer reads
    the manifest ONCE at query (re)start for the high-water mark and then
    tracks it in the closure. Without this, a long-lived append stream
    pays an O(total-batches) manifest parse per microbatch — quadratic
    over the stream's lifetime."""
    state = {"max_id": max_committed_batch_id(table, query_name)}

    def commit_batch(batch_df: DataFrame, batch_id: int) -> bool:
        """Returns True if the batch was committed, False for a replay
        no-op — so tests (and metrics hooks) can assert which path ran."""
        if batch_id <= state["max_id"]:
            return False  # replay after a crash: already durable, skip
        table.commit(
            batch_df,
            mode="append",
            meta={
                "stream_batch_id": int(batch_id),
                "stream_query": query_name,
            },
        )
        state["max_id"] = batch_id
        return True

    return commit_batch


def make_upsert_committer(
    table: SnapshotTable,
    key: str = "doc_id",
    version_col: str | None = None,
    query_name: str = DEFAULT_QUERY_NAME,
):
    """Idempotent foreachBatch callback applying each microbatch as a
    MERGE (upsert) instead of an append — the streaming CDC-apply path:
    a stream of row versions keyed by ``key`` keeps the snapshot table at
    the latest version per key, exactly once.

    Within-batch conflicts (two versions of one key in one microbatch)
    are resolved BEFORE the merge: when ``version_col`` is given, the
    highest version wins (ties broken by the row's md5 fingerprint so the
    pick is deterministic under any partitioning); without it the caller
    guarantees per-batch key uniqueness.

    Replay guard is the same O(1) high-water mark as the append
    committer. A replayed merge would also be SEMANTICALLY idempotent
    (merging the same rows twice is a fixpoint), but skipping it avoids
    burning a snapshot id + a full copy-on-write rewrite on every crash
    recovery. Scale note: merge() is copy-on-write over the current
    snapshot — at 10^12 rows partition the table so each microbatch
    rewrites only matched partitions (see SnapshotTable.merge)."""
    state = {"max_id": max_committed_batch_id(table, query_name)}

    def commit_batch(batch_df: DataFrame, batch_id: int) -> bool:
        if batch_id <= state["max_id"]:
            return False
        updates = batch_df
        if version_col is not None:
            from pyspark.sql import Window, functions as F

            w = Window.partitionBy(key).orderBy(
                F.col(version_col).desc(),
                F.md5(F.to_json(F.struct(*batch_df.columns))).asc(),
            )
            updates = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        table.merge(
            batch_df.sparkSession,
            updates,
            key=key,
            meta={
                "stream_batch_id": int(batch_id),
                "stream_query": query_name,
            },
        )
        state["max_id"] = batch_id
        return True

    return commit_batch


def write_stream_upsert_to_snapshot(
    stream_df: DataFrame,
    table_root: str,
    checkpoint: str,
    key: str = "doc_id",
    version_col: str | None = None,
    query_name: str = DEFAULT_QUERY_NAME,
):
    """Start a foreachBatch query MERGING each microbatch by key (the
    streaming upsert/CDC-apply sink). Returns the StreamingQuery."""
    commit_batch = make_upsert_committer(
        SnapshotTable(table_root), key, version_col, query_name
    )
    return (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(commit_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def write_stream_to_snapshot(
    stream_df: DataFrame,
    table_root: str,
    checkpoint: str,
    query_name: str = DEFAULT_QUERY_NAME,
):
    """Start a foreachBatch query committing each microbatch as one
    idempotent append snapshot. Returns the StreamingQuery.
    ``query_name`` scopes the replay keys — give each distinct stream
    writing into one table its own name (and its own checkpoint)."""
    commit_batch = make_batch_committer(SnapshotTable(table_root), query_name)

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(commit_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .start()
    )
