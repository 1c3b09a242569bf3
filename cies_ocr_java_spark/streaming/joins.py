"""Watermarked stream-stream join: click -> purchase attribution.

The reference correlates an async completion event back to its document via
JobTag (ExtractStatusNotificationLambda.java:36 — the job was tagged with
the identifier at submission). That is a stream-stream correlation with a
time horizon: a completion only makes sense within the job's lifetime.
Generalized here as the canonical streaming correlation: join purchases to
the same user's clicks from the preceding hour.

Scale design: Spark plans this as StreamingSymmetricHashJoin keyed on
user_id. The event-time bound (`purchase_ts` within (click_ts, click_ts+1h])
plus watermarks on BOTH sides is what makes state finite — each side
retains only rows younger than watermark+horizon, so state size is
rate x horizon, independent of stream lifetime. Without the time bound the
join state grows forever; Spark refuses some of those shapes outright and
the ones it allows are the classic production OOM.

The same function body works on batch DataFrames (the unified-API
guarantee) — the batch plan is an ordinary equi-join + range filter, which
is exactly the DuckDB oracle for the streaming result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ATTRIBUTION_HORIZON = "1 hour"
DEFAULT_WATERMARK = "2 hours"


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = ATTRIBUTION_HORIZON,
    watermark: str = DEFAULT_WATERMARK,
    how: str = "inner",
) -> DataFrame:
    """(user_id, click_id, purchase_id, lag_us) for every purchase within
    ``horizon`` after a click by the same user. Streaming in, streaming
    out (append mode); batch in, batch out. ``how='leftOuter'`` adds one
    null-purchase row per never-matched click, emitted when the watermark
    evicts the click's state (see click_purchase_attribution_outer for
    the eviction semantics and their oracle)."""
    # join-state watermarks require TIMESTAMP (not NTZ); the session runs
    # UTC so the cast preserves the wall-clock value and epoch micros
    ts = F.col("ts").cast("timestamp")
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        ts.alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        ts.alias("purchase_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (c.c_user == p.p_user)
        & (p.purchase_ts > c.click_ts)
        & (p.purchase_ts <= c.click_ts + F.expr(f"INTERVAL {horizon}"))
    )
    out = c.join(p, cond, how).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (
            F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))
        ).alias("lag_us"),
    )
    if how == "leftOuter":
        out = out.withColumn("attributed", F.col("purchase_id").isNotNull())
    return out


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
) -> DataFrame:
    """STREAM-STATIC enrichment join: decorate each event with dimension
    attributes at arrival time. Unlike the stream-stream join above this
    keeps NO join state at all — the static side is re-resolved against
    each microbatch (so a dim table updated between triggers is picked up
    on the next one), and no watermark is required.

    Scale design: the static side's join strategy is the ordinary batch
    planner's choice per microbatch — broadcast when the dim fits
    (customer/nation-sized dims at 100 TB usually don't; nation-sized
    ones do), shuffled hash otherwise. For a large dim joined every
    trigger, pre-bucket it by the join key so each microbatch co-locates
    without reshuffling the dim (the bucketed-join evidence in
    tests/test_plan_properties.py). Batch in, batch out — the unified-API
    guarantee makes the DuckDB oracle the plain equi-join."""
    return stream.join(dim, stream[stream_key] == dim[dim_key])


def click_purchase_attribution_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = ATTRIBUTION_HORIZON,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """LEFT OUTER stream-stream attribution: every matched (click,
    purchase) pair AND, for each never-matched click, exactly one
    null-purchase row emitted when the watermark evicts the click's
    state — the "which impressions converted, which expired" query shape
    that an inner join cannot answer incrementally.

    State/eviction semantics (probed empirically on this Spark, pinned by
    the registry oracle): the global watermark is the MIN of both sides'
    (ms-floored max event time - delay) [multipleWatermarkPolicy=min];
    a click row is evicted — and its null row emitted iff it never
    matched — when click_us <= (wm_ms - horizon_ms - 1) * 1000 (Spark
    keeps a 1 ms strictness margin when deriving the state-value
    watermark from the non-strict `pts <= cts + horizon` bound). Rows
    younger than that stay in state and are NOT emitted at stream end —
    the oracle replays exactly this rule, like the sessionize oracle
    replays EventTimeTimeout.

    Same finite-state story as the inner join: each side retains only
    rows above its state watermark, so memory is rate x horizon."""
    return click_purchase_attribution(
        clicks, purchases, horizon, watermark, how="leftOuter"
    )

