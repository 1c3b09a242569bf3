"""spark-submit entry point.

Usage (local or cluster — master comes from spark-submit / env):

    spark-submit --py-files cies_ocr_java_spark.zip \
        cies_ocr_java_spark/main.py \
        --input fixtures/sf-small/documents.parquet \
        --output out/ [--run-id r1] [--no-resume] [--partitions 64]

Prints one JSON line with the run metrics (docs/spans/bytes/failures/wall).
"""

from __future__ import annotations

import argparse
import json
import sys

from cies_ocr_java_spark.plans.pipeline import run
from cies_ocr_java_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cies_ocr_java_spark")
    ap.add_argument(
        "--query",
        default=None,
        metavar="NAME",
        help="run a registry query (plans/queries.py) instead of the "
        "extraction pipeline; prints rows as JSON lines. Use --query list "
        "to enumerate.",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="table dir for --query mode")
    ap.add_argument("--limit", type=int, default=20, help="--query row cap")
    ap.add_argument("--input", default=None, help="documents parquet path")
    ap.add_argument("--output", default=None, help="output table root")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--master", default=None, help="override spark master (tests)")
    ap.add_argument(
        "--incremental",
        action="store_true",
        help="treat --input as a SnapshotTable root and process ONLY the "
        "snapshots appended since the last run (read_changes cursor in "
        "<output>/ingest_cursor) — already-processed snapshots cost zero "
        "scan I/O",
    )
    ap.add_argument(
        "--ocr-mode",
        default="DETECTION",
        choices=("DETECTION", "ANALYSIS"),
        help="TextractMode analog (application.properties:3): DETECTION "
        "concatenates PAGE blocks; ANALYSIS extracts typed LAYOUT blocks "
        "and drops page furniture",
    )
    ap.add_argument(
        "--compact-after",
        type=int,
        default=0,
        metavar="N",
        help="after the run, compact output tables whose append history "
        "exceeds N snapshots and expire all but the last N (0 = off). "
        "Periodic maintenance for long-lived incremental deployments: "
        "bounds the small-file count without a separate ops job.",
    )
    args = ap.parse_args(argv)

    if args.query:
        from cies_ocr_java_spark.plans.queries import QUERIES

        if args.query == "list":
            for name in QUERIES:
                print(name)
            return 0
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; --query list to enumerate",
                  file=sys.stderr)
            return 2
        spark = get_spark(master=args.master)
        try:
            df = QUERIES[args.query](spark, args.sf_dir)
            for row in df.limit(args.limit).toJSON().collect():
                print(row)
        finally:
            spark.stop()
        return 0

    if not args.input or not args.output:
        ap.error("--input and --output are required unless --query is given")

    if args.incremental and args.no_resume:
        # resume semantics are what make a replayed delta safe; running an
        # incremental tick without them would re-append processed docs
        ap.error("--no-resume is incompatible with --incremental")

    spark = get_spark(master=args.master)
    try:
        if args.incremental:
            from cies_ocr_java_spark.plans.pipeline import run_incremental

            metrics = run_incremental(
                spark,
                args.input,
                args.output,
                run_id=args.run_id,
                repartition_to=args.partitions,
                ocr_mode=args.ocr_mode,
            )
            return _maintain_and_report(spark, args, metrics)

        from cies_ocr_java_spark.sources.ingest import read_documents

        if args.input.rstrip("/").lower().endswith(
            (".jsonl", ".json", ".ndjson", ".csv", ".tsv")
        ):
            # text formats parse through the PERMISSIVE reject channel;
            # unparseable lines are committed for replay, never dropped
            import os

            from cies_ocr_java_spark import schema as S
            from cies_ocr_java_spark.sources.snapshots import SnapshotTable

            if args.input.rstrip("/").lower().endswith((".csv", ".tsv")):
                # CSV can't carry the nested spans array<struct>; ingest the
                # flat one-row-per-span shape and assemble it (offset order)
                from cies_ocr_java_spark.sources.ingest import (
                    FLAT_SPAN_ROWS,
                    assemble_flat_spans,
                )

                flat, rejects = read_documents(
                    spark, args.input, schema=FLAT_SPAN_ROWS
                )
                docs = assemble_flat_spans(flat)
            else:
                docs, rejects = read_documents(
                    spark, args.input, schema=S.DOCUMENTS
                )
            n_rejects = rejects.count()
            if n_rejects:
                SnapshotTable(os.path.join(args.output, "ingest_rejects")).commit(
                    rejects, mode="append"
                )
        else:
            docs = spark.read.parquet(args.input)
        metrics = run(
            spark,
            docs,
            args.output,
            run_id=args.run_id,
            resume=not args.no_resume,
            repartition_to=args.partitions,
            ocr_mode=args.ocr_mode,
        )
        return _maintain_and_report(spark, args, metrics)
    finally:
        spark.stop()


def _maintain_and_report(spark, args, metrics: dict) -> int:
    """Shared tail for batch AND incremental runs: --compact-after
    maintenance (the long-lived incremental deployment is exactly who
    needs the small-file bound), then the one-line metrics JSON."""
    if args.compact_after:
        import os

        from cies_ocr_java_spark.sources.snapshots import SnapshotTable

        for name in ("extracted_spans", "doc_state"):
            t = SnapshotTable(os.path.join(args.output, name))
            if t.exists() and len(t.history()) > args.compact_after:
                t.compact(spark)
                t.expire_snapshots(keep_last=args.compact_after)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
