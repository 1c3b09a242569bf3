"""Structured Streaming analogs of the reference's event plumbing.

The reference's "streaming" is control-flow eventing, not data streaming
(SURVEY.md §2.7): S3 ObjectCreated -> NewDocumentLambda, Textract -> SNS ->
ExtractStatusNotificationLambda, clients polling HEAD for the status tag.
Here those become actual Structured Streaming jobs:

* ``status_counts_stream`` — a running count of documents per lifecycle
  status over the doc_state snapshot directory (the HEAD-poll answer,
  maintained incrementally instead of polled).
* ``windowed_event_agg`` — watermarked tumbling-window aggregation over an
  event stream (late data handled by the watermark instead of retry loops).

Both are testable synchronously with the memory sink +
``processAllAvailable()`` (no always-on cluster needed in CI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cies_ocr_java_spark.schema import DOC_STATE


def status_counts_stream(
    spark: SparkSession, state_data_dir: str, query_name: str = "status_counts"
):
    """Stream doc_state parquet appends -> running per-status counts."""
    stream = (
        spark.readStream.schema(DOC_STATE)
        .option("pathGlobFilter", "*.parquet")
        .parquet(state_data_dir)
    )
    agg = stream.groupBy("status").agg(F.count("*").alias("n_docs"))
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_agg(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event_type. Works on a
    streaming OR batch DataFrame (same plan either way — that's the point
    of the unified API)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(F.window("ts", window).alias("win"), "event_type").agg(
        F.count("*").alias("n_events"),
        # decimal sum: exact + order-independent, matches the batch oracle
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    ).select(
        F.unix_micros(F.col("win.start")).alias("bucket_start_us"),
        "event_type",
        "n_events",
        "sum_value",
    )
