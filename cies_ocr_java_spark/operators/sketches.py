"""Streaming-summary sketches for corpus statistics — the operators a
100 TB vocabulary needs when a full groupBy of the token table is the
bottleneck.

Misra-Gries heavy hitters, structured as sketch -> candidates -> exact
recount:

  1. per-partition Misra-Gries(k) summaries over the exploded token
     stream (mapInPandas: Arrow batches in, pandas value_counts per
     batch, a k-bounded mergeable-summary fold across batches — the
     Agarwal et al. 2012 "Mergeable Summaries" merge: add, subtract the
     (k+1)-th largest, drop non-positives). Output is <= k rows per
     partition, NO shuffle of the token stream;
  2. the distinct survivors form a candidate superset: any token with
     global frequency > N/(k+1) exceeds N_p/(k+1) in at least one
     partition (pigeonhole), so it survives that partition's summary —
     the superset property holds under ANY partitioning;
  3. exact recount of candidates only: the token stream semi-joins the
     broadcast candidate set (<= k * partitions rows), one map-side
     combinable groupBy over the filtered stream, then the support
     threshold applied to EXACT counts.

Because step 3 recounts exactly, the operator's output is deterministic
and partitioning-independent — equal to "tokens with exact global count
> s*N" — which is what makes a sketch-based scale path oracle-checkable
to the value.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from cies_ocr_java_spark.operators.dedup import tokens_col


def _mg_merge(acc: dict[str, int], batch: pd.Series, k: int) -> dict[str, int]:
    """Fold one batch's value_counts into a Misra-Gries summary, keeping
    at most k counters (mergeable-summary semantics: the result's count
    for any item lower-bounds its true count within N/(k+1))."""
    for tok, cnt in batch.items():
        acc[tok] = acc.get(tok, 0) + int(cnt)
    if len(acc) > k:
        cut = sorted(acc.values(), reverse=True)[k]
        acc = {t: c - cut for t, c in acc.items() if c - cut > 0}
    return acc


def heavy_hitters(df: DataFrame, text_col: str,
                  support: float, k: int | None = None) -> DataFrame:
    """Exact corpus-level heavy hitters (tokens with count > support * N)
    without a full-vocabulary shuffle. ``k`` defaults to ceil(1/support),
    the smallest sketch size whose survivors are a guaranteed superset of
    the support-level hitters.

    Two passes over the corpus total: the sketch pass (which also folds
    the per-partition token totals into its <= k+1 output rows, so N
    costs no extra scan) and the candidate recount pass. The summary
    table is partitions-sized, so its persist is a few KB per task.

    Returns (token, cnt, share): exact count and its decimal(12,6)-rounded
    corpus share, for every token whose exact count strictly exceeds
    support * N (N = total token count)."""
    k_min = int(1.0 / support) + 1
    # The superset guarantee needs k+1 >= 1/support IN EVERY PARTITION;
    # a smaller caller-supplied k would silently drop true heavy hitters
    # (no error, just missing rows), so clamp rather than trust it.
    k = k_min if k is None else max(k, k_min)
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, int] = {}
        n_part = 0
        for b in batches:
            n_part += len(b)
            acc = _mg_merge(acc, b["token"].value_counts(), k)
        yield pd.DataFrame(
            {"token": list(acc.keys()) + [None],
             "n": [0] * len(acc) + [n_part]}
        )

    summ = toks.mapInPandas(sketch, "token string, n long").persist()
    cands = summ.where(F.col("token").isNotNull()).select("token").distinct()
    total = summ.where(F.col("token").isNull()).agg(
        F.sum("n").cast("bigint").alias("n_total")
    )
    counted = (
        toks.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    return (
        counted.join(F.broadcast(total))
        .where(F.col("cnt") > F.lit(support) * F.col("n_total"))
        .select(
            "token",
            "cnt",
            (F.col("cnt") / F.col("n_total"))
            .cast("decimal(12,6)")
            .cast("double")
            .alias("share"),
        )
    )
