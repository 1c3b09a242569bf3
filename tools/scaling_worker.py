"""Worker for the two-parallelism scaling benchmark (run via spark-submit).

Protocol per BASELINE.md: one JVM per parallelism level; a discarded warm-up
run, then --runs timed full-pipeline runs (read -> extract -> commit
snapshots); correctness (span-sequence equality vs the golden oracle output)
is asserted IN the same process so throughput numbers can never come from a
wrong-answer build. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="bench corpus dir")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cies_ocr_java_spark.plans import pipeline
    from cies_ocr_java_spark.session import get_spark
    from cies_ocr_java_spark.sources.snapshots import SnapshotTable

    spark = get_spark(app_name="bench_scaling")
    n_threads = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    n_docs = docs.count()
    n_bytes = docs.select(
        F.sum(F.aggregate(
            F.transform("spans", lambda s: F.coalesce(F.length(s["text"]), F.lit(0))),
            F.lit(0), lambda a, x: a + x,
        ))
    ).collect()[0][0]

    walls = []
    last_out = None
    for i in range(args.runs + 1):  # +1 warm-up, discarded
        out = os.path.join(args.workdir, f"run-{n_threads}-{i}")
        shutil.rmtree(out, ignore_errors=True)
        m = pipeline.run(spark, docs, out, run_id=f"s{i}", resume=False)
        if i > 0:
            walls.append(m["wall_seconds"])
        last_out = out

    # correctness gate in the same process: span-sequence equality vs golden.
    # Only (doc_id, md5-of-canonical-string) crosses to the driver — full
    # span payloads for a large corpus would exceed
    # spark.driver.maxResultSize. The canonical form is raw fields joined
    # with \x01/\x02/\x03 sentinels (never emitted by the grammar), NOT
    # JSON: Jackson (Spark to_json) and Python json.dumps escape unicode
    # and control characters differently, so a JSON-text hash would flag
    # false mismatches on the adversarial/mixed-encoding corpus tier even
    # when the spans are identical.
    import hashlib

    got = SnapshotTable(os.path.join(last_out, "extracted_spans")).read(spark)
    canon_col = F.array_join(
        F.transform(
            "spans",
            lambda s: F.concat_ws(
                "\x01",
                F.coalesce(s["kind"], F.lit("\x02")),
                F.coalesce(s["text"], F.lit("\x02")),
                F.coalesce(s["media_ref"], F.lit("\x02")),
                s["order"].cast("string"),
            ),
        ),
        "\x03",
    )
    got_pdf = got.select(
        "doc_id", F.md5(canon_col).alias("spans_hash")
    ).toPandas()
    con = duckdb.connect()
    exp = con.sql(
        f"""SELECT doc_id, spans FROM read_parquet('{args.input}/expected_spans.parquet')"""
    ).df()

    _S = "\x02"

    def canon_exp(spans):
        return "\x03".join(
            "\x01".join(
                [
                    s["kind"] if s["kind"] is not None else _S,
                    s["text"] if s["text"] is not None else _S,
                    s["media_ref"] if s["media_ref"] is not None else _S,
                    str(int(s["order"])),
                ]
            )
            for s in spans
        )

    exp_map = {
        r.doc_id: hashlib.md5(canon_exp(r.spans).encode("utf-8")).hexdigest()
        for r in exp.itertuples()
    }
    got_map = dict(zip(got_pdf["doc_id"], got_pdf["spans_hash"]))
    n_match = sum(1 for d, j in exp_map.items() if got_map.get(d) == j)
    pass_rate = n_match / max(len(exp_map), 1)

    median_wall = statistics.median(walls)
    print(
        json.dumps(
            {
                "threads": n_threads,
                "n_docs": n_docs,
                "payload_bytes": int(n_bytes),
                "walls": [round(w, 2) for w in walls],
                "median_wall": round(median_wall, 2),
                "docs_per_sec": round(n_docs / median_wall, 1),
                "span_equality_pass_rate": pass_rate,
                "golden_docs": len(exp_map),
            }
        )
    )
    spark.stop()
    return 0 if pass_rate == 1.0 else 1


if __name__ == "__main__":
    sys.exit(main())
