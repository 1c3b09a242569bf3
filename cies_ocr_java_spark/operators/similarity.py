"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and a sign-LSH bucketed
variant as the scale path (candidates restricted to the query's hyperplane-
sign bucket — at 10^9 vectors the bucket join replaces the full cross
product; recall is tunable via the number of sign bits).

All arithmetic is done element-wise in DOUBLE via built-in higher-order
functions (zip_with + aggregate = a fused JVM loop, no Python), scores
rounded to 6 decimals BEFORE ranking so rankings are reproducible across
engines (the DuckDB oracle replicates the same math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


# Exactness scheme: every element is cast double -> decimal(12,8) (one
# well-defined rounding), products/sums stay in DECIMAL (exact, order-
# independent), and only the final score returns to double. Double sums
# would drift ulps with partition order and break reproducibility; decimal
# sums are associative so map-side partial aggregation stays correct.
_ELEM_DEC = "decimal(12,8)"
# accumulator sized so decimal(30,16) + decimal(25,16) -> decimal(31,16)
# (no scale truncation under Spark's precision-38 cap), then re-cast; the
# running sum stays exact for |sum| < 10^14.
_SUM_DEC = "decimal(30,16)"


def _dec_sum(arr) -> F.Column:
    return F.aggregate(
        arr, F.lit(0).cast(_SUM_DEC), lambda acc, x: (acc + x).cast(_SUM_DEC)
    )


def _dot_dec(a, b) -> F.Column:
    return _dec_sum(
        F.zip_with(
            a,
            b,
            lambda x, y: x.cast("double").cast(_ELEM_DEC)
            * y.cast("double").cast(_ELEM_DEC),
        )
    )


def _sumsq_dec(a) -> F.Column:
    e = lambda x: x.cast("double").cast(_ELEM_DEC)  # noqa: E731
    return _dec_sum(F.transform(a, lambda x: e(x) * e(x)))


def cosine_score(a, b) -> F.Column:
    raw = _dot_dec(a, b).cast("double") / (
        F.sqrt(_sumsq_dec(a).cast("double")) * F.sqrt(_sumsq_dec(b).cast("double"))
    )
    return raw.cast("decimal(12,6)").cast("double")


def l2_norm(a) -> F.Column:
    return (
        F.sqrt(_sumsq_dec(a).cast("double")).cast("decimal(12,6)").cast("double")
    )


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast the (small) query set,
    score every corpus vector, window-rank. Rank order: rounded score desc,
    neighbor id asc (deterministic under ties).

    Norms are hoisted OUT of the pair loop: computed once per vector
    (O(n*d)) before the join instead of per pair (O(n*q*d)) — same decimal
    values, so oracle equality is unaffected."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.sqrt(_sumsq_dec(F.col(vec_col)).cast("double")).alias("qnorm"),
    )
    e = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        F.sqrt(_sumsq_dec(F.col(vec_col)).cast("double")).alias("enorm"),
    )
    scored = e.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    raw = _dot_dec(F.col("vec"), F.col("qvec")).cast("double") / (
        F.col("enorm") * F.col("qnorm")
    )
    scored = scored.select(
        "query_id", "neighbor_id",
        raw.cast("decimal(12,6)").cast("double").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def sign_bucket(vec, bits: int = 4) -> F.Column:
    """Sign-LSH bucket: concat of sign bits of the first ``bits`` dims."""
    return F.concat_ws(
        "",
        *[
            F.when(F.element_at(vec, i + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bits)
        ],
    )


def lsh_bucketed_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10, bits: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's sign bucket; the
    bucket equi-join replaces the cross product at scale."""
    e = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
        F.sqrt(_sumsq_dec(F.col(vec_col)).cast("double")).alias("enorm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
        F.sqrt(_sumsq_dec(F.col(vec_col)).cast("double")).alias("qnorm"),
    )
    scored = e.join(F.broadcast(q), "bucket").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    raw = _dot_dec(F.col("vec"), F.col("qvec")).cast("double") / (
        F.col("enorm") * F.col("qnorm")
    )
    scored = scored.select(
        "query_id", "neighbor_id",
        raw.cast("decimal(12,6)").cast("double").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
