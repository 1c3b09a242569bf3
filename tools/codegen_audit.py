"""Codegen-fallback audit (round-4): execute every registered query at
sf0.001 with spark.sql.codegen.fallback=false, so a generated method past
the JVM 64 KB limit THROWS instead of silently interpreting (the
intel_hex_parse lesson — interpreted fallback 10x'd the per-task cost and
was invisible in every green correctness run). Usage:

    python tools/codegen_audit.py [--sf /root/testdata/sf0.001] [name ...]

Prints one line per query: OK / COMPILE-FAIL / ERROR(<type>).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from cies_ocr_java_spark.plans.queries import QUERIES
    from cies_ocr_java_spark.session import get_spark

    spark = get_spark(app_name="codegen_audit")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    names = args.names or list(QUERIES)
    n_fail = 0
    for name in names:
        try:
            QUERIES[name](spark, args.sf).write.format("noop") \
                .mode("overwrite").save()
            print(f"OK    {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "InternalCompilerException" in msg or "grows beyond" in msg \
                    or "Failed to compile" in msg:
                n_fail += 1
                print(f"COMPILE-FAIL {name}", flush=True)
            else:
                n_fail += 1
                print(f"ERROR {name}: {type(e).__name__}", flush=True)
    print(f"DONE {len(names) - n_fail}/{len(names)} ok", flush=True)
    spark.stop()
    return 0 if not n_fail else 1


if __name__ == "__main__":
    sys.exit(main())
