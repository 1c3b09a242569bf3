"""Multi-page article stitching over ``rel="next"`` pagination chains.

Long-form articles ship as N crawl documents linked head→tail by
``<link rel="next">``; a training corpus that treats each page as its own
document truncates every chapter at the page boundary and a dedup pass
sees N near-identical boilerplate frames instead of one article. The
stitcher reassembles the chain: heads are pages no other page points to
(one anti-join), then a BOUNDED pointer chase — one equi-join on the
resolved URL per hop — accumulates page texts in chain order.

Scale shape: each hop is a plain shuffled equi-join on the url key (the
natural crawl-table layout); ``max_hops`` bounds the unrolled depth, so
the plan is max_hops-1 joins regardless of corpus size. Real pagination
chains are short (the P99 is single digits); for genuinely unbounded
chains the same edge table feeds pointer-doubling (log₂ rounds — the
connected-components precedent in dedup.py), which this module
deliberately does not pay for on the common case.

Defined degradations (never a crash): a cycle has no head, so its pages
yield no chain row; a self-loop likewise; a next pointer leaving the
corpus ends the chain at the last resolvable page; duplicate urls fan
out one chain row per duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stitch_rel_next_chains(pages: DataFrame, max_hops: int = 8) -> DataFrame:
    """``pages``: (url, next_url, text, doc_id), url the page's resolved
    canonical key, next_url null for chain tails. Returns one row per
    chain head: (head_doc, head_url, n_pages, stitched_text) with texts
    space-joined in chain order, truncated at ``max_hops`` pages."""
    # PERSIST the slim parsed edge table: it has max_hops+2 consumers
    # (targets, heads, one per chase round) and without materialization
    # each consumer re-parses the whole corpus — 5 scans for the default
    # bound (the dedup.py shared-table precedent; at 10^12 docs the
    # (url, next_url, text, doc_id) projection is a fraction of the
    # page bytes it replaces).
    pages = pages.persist()
    targets = (
        pages.where(F.col("next_url").isNotNull())
        .select(F.col("next_url").alias("url"))
        .distinct()
    )
    heads = pages.join(targets, "url", "left_anti")
    cur = heads.select(
        F.col("url").alias("head_url"),
        F.col("doc_id").alias("head_doc"),
        F.array(F.col("text")).alias("parts"),
        F.col("next_url").alias("cursor"),
    )
    step = pages.select(
        F.col("url").alias("cursor"),
        F.col("text").alias("_t"),
        F.col("next_url").alias("_n"),
    )
    for _ in range(1, max_hops):
        hit = F.col("_t").isNotNull()
        cur = cur.join(step, "cursor", "left").select(
            "head_url",
            "head_doc",
            F.when(hit, F.concat(F.col("parts"), F.array(F.col("_t"))))
            .otherwise(F.col("parts"))
            .alias("parts"),
            F.when(hit, F.col("_n")).alias("cursor"),
        )
    return cur.select(
        "head_doc",
        "head_url",
        F.size("parts").cast("int").alias("n_pages"),
        F.array_join("parts", " ").alias("stitched_text"),
    )
