"""Corpus sequence packing: lay every document's tokens end-to-end into one
global token stream and slice it into fixed-length training sequences —
the packing manifest an LLM data loader consumes (which doc contributes
which token range to which sequence).

The hard part at 10^12 docs is the GLOBAL exclusive prefix sum of token
counts: the naive form is a window over a global ORDER BY, i.e. every row
through ONE task. Here it is the classic two-level scan instead (the same
shape as the distributed-ntile fix in plans/queries.py
customer_revenue_quartiles):

  1. range-repartition on the pack order (a distributed sort — each
     partition owns a contiguous key range);
  2. partition-LOCAL exclusive running sum (window partitioned by
     spark_partition_id — per-task state only);
  3. per-partition token subtotals (one row per shuffle partition) get
     their own exclusive prefix in a single-partition window over that
     PARTITIONS-sized table — the post-aggregate-tiny-input exception —
     and are broadcast back;
  4. global offset = local prefix + partition offset. Exact, and
     bit-identical to the single-task form because the pack order is a
     strict total order.

Sequence assignment is then pure per-row math: a doc covering global token
range [off, off+n) intersects sequences floor(off/L) .. floor((off+n-1)/L),
exploded via F.sequence — linear in output rows (a doc lands in at most
n/L + 1 sequences), so a giant document fans out into many rows instead of
one hot task (same skew posture as the extraction pipeline's salt shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from cies_ocr_java_spark.functions.text import token_count


def with_global_offset(df: DataFrame, n_col: str,
                       order_cols: Sequence[Column | str],
                       out_col: str = "offset") -> DataFrame:
    """Exclusive global prefix sum of ``n_col`` in ``order_cols`` order
    (which must be a strict total order for the result to be well-defined),
    WITHOUT a global single-partition window. Adds ``out_col`` (long)."""
    parts = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parts.withColumn(
        "_loff", F.coalesce(F.sum(n_col).over(w_local), F.lit(0))
    )
    counts = local.groupBy("_pid").agg(F.sum(n_col).alias("_c"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_poff")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_loff") + F.col("_poff")).cast("long"))
        .drop("_pid", "_loff", "_poff")
    )


def pack_sequences(df: DataFrame, text_col: str, id_col: str,
                   seq_len: int) -> DataFrame:
    """Fixed-length sequence-packing manifest over whitespace tokens.

    Returns one row per (sequence, contributing document):
      (seq_id, id, doc_tok_start, doc_tok_end, n_tokens, seq_tok_start)
    with 1-based inclusive doc-local token ranges and the 0-based position
    within the sequence where the fragment starts. Every sequence holds
    exactly ``seq_len`` tokens (the last one may be short); concatenating
    fragments by (seq_id, seq_tok_start) reproduces the global stream.
    Zero-token documents contribute nothing (guarded: an unguarded
    F.sequence(first, last) would step -1 for them and fabricate rows)."""
    d = df.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).cast("long").alias("n_tok"),
    ).where(F.col("n_tok") > 0)
    offs = with_global_offset(d, "n_tok", [F.asc("id")])
    # integer `div`, NOT floor(a / b): the double division loses exactness
    # once global offsets pass 2^53 — i.e. precisely the 10^12-doc regime
    # this module targets (the DuckDB oracle's `//` is exact too)
    first = F.expr(f"offset div {seq_len}")
    last = F.expr(f"(offset + n_tok - 1) div {seq_len}")
    ex = offs.select(
        "id", "n_tok", "offset",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    g_start = F.greatest(F.col("offset"), F.col("seq_id") * seq_len)
    g_end = F.least(
        F.col("offset") + F.col("n_tok"), (F.col("seq_id") + 1) * seq_len
    ) - 1
    return ex.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        "id",
        (g_start - F.col("offset") + 1).cast("int").alias("doc_tok_start"),
        (g_end - F.col("offset") + 1).cast("int").alias("doc_tok_end"),
        (g_end - g_start + 1).cast("int").alias("n_tokens"),
        (g_start - F.col("seq_id") * seq_len).cast("int").alias("seq_tok_start"),
    )


def pack_interleaved_spans(spans: DataFrame, seq_len: int,
                           media_tokens: int = 16,
                           id_col: str = "doc_id",
                           order_col: str = "span_order") -> DataFrame:
    """Multimodal sequence packing over an INTERLEAVED span stream (the
    Flamingo/Chameleon-style training-prep step): text spans cost their
    whitespace token count, media spans cost a fixed ``media_tokens``
    placeholder budget, and every document's spans are laid end-to-end IN
    READING ORDER (documents atomic, ordered by id) into fixed-length
    context windows.

    Returns one row per (window, contributing span):
      (seq_id, doc_id, span_order, kind, span_tok_start, span_tok_end,
       n_tokens, seq_tok_start)
    with 1-based inclusive span-local token ranges; concatenating
    fragments by (seq_id, seq_tok_start) reproduces the interleaved
    global stream, media placeholders in position.

    Scale shape: the within-doc prefix is a DOC-partitioned window (one
    doc's spans per task — assembly-class state); only the doc-LEVEL
    totals go through the two-level distributed scan
    (with_global_offset), so the global-order structure never sees
    span-granularity rows. Window straddling explodes a span into at
    most n/seq_len + 1 fragments — a giant span fans out instead of
    hot-spotting one window task."""
    cost = F.when(
        F.col("kind") == "media", F.lit(media_tokens).cast("long")
    ).otherwise(token_count(F.col("text")).cast("long"))
    # the narrow cost projection feeds THREE consumers (the within-doc
    # window, the doc totals, and the final join back) — persist it once
    # or the upstream span stream (often a full extraction DAG, e.g.
    # pipeline_end_to_end) is recomputed per consumer; the cached form is
    # 4 skinny columns, not the payloads (same rule as dedup.py's shingle
    # table). check_queries/bench clearCache() between queries.
    s = spans.select(
        F.col(id_col).alias("doc_id"),
        F.col(order_col).alias("span_order"),
        "kind",
        cost.alias("n_tok"),
    ).where(F.col("n_tok") > 0).persist()
    w_doc = (
        Window.partitionBy("doc_id")
        .orderBy("span_order")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = s.withColumn("loff", F.coalesce(F.sum("n_tok").over(w_doc), F.lit(0)))
    totals = s.groupBy("doc_id").agg(F.sum("n_tok").alias("doc_tok"))
    offs = with_global_offset(
        totals, "doc_tok", [F.asc("doc_id")], out_col="doc_off"
    )
    j = s.join(offs.select("doc_id", "doc_off"), "doc_id").withColumn(
        "gstart", (F.col("doc_off") + F.col("loff")).cast("long")
    )
    first = F.expr(f"gstart div {seq_len}")
    last = F.expr(f"(gstart + n_tok - 1) div {seq_len}")
    ex = j.withColumn("seq_id", F.explode(F.sequence(first, last)))
    f_start = F.greatest(F.col("gstart"), F.col("seq_id") * seq_len)
    f_end = F.least(
        F.col("gstart") + F.col("n_tok"), (F.col("seq_id") + 1) * seq_len
    ) - 1
    return ex.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        "doc_id",
        F.col("span_order").cast("int").alias("span_order"),
        "kind",
        (f_start - F.col("gstart") + 1).cast("int").alias("span_tok_start"),
        (f_end - F.col("gstart") + 1).cast("int").alias("span_tok_end"),
        (f_end - f_start + 1).cast("int").alias("n_tokens"),
        (f_start - F.col("seq_id") * seq_len).cast("int").alias("seq_tok_start"),
    )
