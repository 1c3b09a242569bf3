"""Headline benchmark: runs the representative heavy queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through the noop sink (df.write.format("noop")) so the
FULL plan executes — count() would let Catalyst skip projected expressions
and fake the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cies_ocr_java_spark.plans.queries import QUERIES  # noqa: E402
from cies_ocr_java_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pipeline_end_to_end",
    "extract_html_maincontent",
    "extract_html_maincontent_jvm",
    "extract_pdf_ocr_route",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_ivf_topk",
    "text_quality_scores",
    "bpe_token_stats",
    "media_frame_sample",
    "events_asof_join",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "events_sessionize",
    "events_window_agg",
    "events_range_join",
    "revenue_rollup",
    "kmv_distinct_sketch",
    "tfidf_top_terms",
    "pii_scrub",
    "media_phash_near_dup",
    "dedup_clusters",
    "customer_order_full_outer",
    "training_corpus_curation",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")

    # Warm-up, discarded (BASELINE.md protocol): run every headline query
    # once at the smallest SF so per-query timings measure the PLAN, not
    # one-time whole-stage-codegen compilation or Python worker startup.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()

    # Some operators (dedup.py) persist an internal shingle table that the
    # returned plan consumes lazily; drop those blocks between queries so a
    # 19-query sweep doesn't accumulate caches (and so no query is ever
    # accidentally served from a previous query's identical cached subtree).
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
