"""Distributed logistic-regression training for quality classification.

The fastText/DCLM-style curation step (Li et al. 2024, arXiv:2406.11794;
the FineWeb-Edu classifier analog): train a linear quality classifier on
labeled documents with full-batch gradient descent, where each round is
ONE map-side-combinable aggregation over the corpus and the weight vector
lives on the driver (constant size — the same topology real distributed
LR uses: executors reduce gradients, the driver applies the update).

Cross-engine exactness discipline (the kmeans_refine/doc_unigram_surprisal
rules, BASELINE.md "decimal absorption"):

  * features quantize to decimal(12,6) once, up front; the margin uses
    their double image, so both engines multiply identical doubles,
  * the sigmoid (the one transcendental) quantizes to decimal(12,6)
    immediately — a <=1-ulp libm difference cannot survive the rounding,
  * the gradient is a DECIMAL sum of decimal products (exact,
    order-independent, map-side combinable) — never a double sum,
  * the weight update runs in IEEE doubles with a FIXED operation order
    (w - (lr * (g / n))) and re-quantizes to decimal(12,8); the driver's
    Python floats and the oracle's SQL doubles are the same arithmetic.

Reference parity: none (beyond-reference training-data operator).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession, functions as F

FEAT_DEC = "decimal(12,6)"
W_DEC = Decimal("0.00000001")  # decimal(12,8) quantum
LR = 0.5


def lr_features(df: DataFrame, stopwords: tuple[str, ...],
                label_len: int = 35, flip_mod: int = 17) -> DataFrame:
    """Map-only feature/label projection: (doc_id, y, xq0..xq3).

    Features: bias, word_count/100, n_chars/1000, stopword ratio — each
    quantized to decimal(12,6). Label: long-document indicator XOR a
    deterministic doc_id-keyed flip (label noise, so the loss surface is
    not separable and every round moves the weights)."""
    words = F.split(F.col("text"), " ")
    wc = F.size(words)
    nstop = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
    return df.select(
        "doc_id",
        F.when(
            (wc >= label_len) != (F.col("doc_id") % flip_mod == 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("y"),
        F.lit(1).cast(FEAT_DEC).alias("xq0"),
        (wc.cast("double") / 100.0).cast(FEAT_DEC).alias("xq1"),
        (F.col("n_chars").cast("double") / 1000.0).cast(FEAT_DEC).alias("xq2"),
        (nstop.cast("double") / wc.cast("double")).cast(FEAT_DEC).alias("xq3"),
    )


def _quant8(x: float) -> float:
    """decimal(12,8) quantization of an IEEE double, as both engines'
    CAST(x AS DECIMAL(12,8)) computes it: the EXACT binary value (hence
    Decimal(x), never Decimal(repr(x))) rounded half-away-from-zero, then
    back to the nearest double (what a later CAST(w AS DOUBLE) reads)."""
    return float(Decimal(x).quantize(W_DEC, rounding=ROUND_HALF_UP))


def logreg_train(feats: DataFrame, rounds: int = 3,
                 lr: float = LR) -> list[tuple[int, int, float]]:
    """Full-batch GD: returns [(round, j, weight)] for every round.

    Each round is ONE aggregation returning 4 decimal sums + a count —
    constant driver traffic regardless of corpus size (this is the
    documented exception to the no-collect rule: LR weights are the
    textbook driver-resident state, like bpe_train_merges' argmax row).
    ``feats`` should be persisted by the caller if the input scan is
    expensive — each round re-reads it."""
    w = [0.0, 0.0, 0.0, 0.0]
    out: list[tuple[int, int, float]] = []
    for r in range(1, rounds + 1):
        m = (
            F.lit(w[0])
            + F.lit(w[1]) * F.col("xq1").cast("double")
            + F.lit(w[2]) * F.col("xq2").cast("double")
            + F.lit(w[3]) * F.col("xq3").cast("double")
        )
        p = (F.lit(1.0) / (F.lit(1.0) + F.exp(-m))).cast(FEAT_DEC)
        e = p - F.col("y")  # decimal - int: exact
        row = (
            feats.select(
                F.count("*").alias("n"),
                F.sum(e * F.col("xq0")).alias("g0"),
                F.sum(e * F.col("xq1")).alias("g1"),
                F.sum(e * F.col("xq2")).alias("g2"),
                F.sum(e * F.col("xq3")).alias("g3"),
            )
            .collect()[0]
        )
        n = row["n"]
        w = [
            _quant8(w[j] - (lr * (float(row[f"g{j}"]) / n)))
            for j in range(4)
        ]
        out.extend((r, j, w[j]) for j in range(4))
    return out
