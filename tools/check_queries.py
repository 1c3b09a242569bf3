"""Local stand-in for the driver's correctness gate: runs each registered
query on Spark AND its oracle SQL on DuckDB over the same parquet tables,
then compares row count + (sorted-by-name) columns + order-insensitive
values EXACTLY. Usage:

    python tools/check_queries.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(rows: list[tuple]) -> list[tuple]:
    def key(row):
        return tuple("\0" if v is None else str(v) for v in row)

    return sorted(rows, key=key)


def _values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


def compare(name: str, spark_df, con, sql: str | None) -> tuple[bool, str]:
    t0 = time.time()
    sp = spark_df.toPandas()
    t_spark = time.time() - t0
    if sql is None:
        return True, f"rows-only ({len(sp)} rows, {t_spark:.1f}s spark)"
    dk = con.sql(sql).df()
    sp_cols, dk_cols = sorted(sp.columns), sorted(dk.columns)
    if sp_cols != dk_cols:
        return False, f"columns differ: spark={sp_cols} duckdb={dk_cols}"
    if len(sp) != len(dk):
        return False, f"row count differs: spark={len(sp)} duckdb={len(dk)}"
    a = _canon([tuple(r) for r in sp[sp_cols].itertuples(index=False)])
    b = _canon([tuple(r) for r in dk[dk_cols].itertuples(index=False)])
    for i, (ra, rb) in enumerate(zip(a, b)):
        for j, (va, vb) in enumerate(zip(ra, rb)):
            if not _values_equal(va, vb):
                return (
                    False,
                    f"value mismatch row {i} col {sp_cols[j]}: spark={va!r} duckdb={vb!r}",
                )
    return True, f"{len(sp)} rows, {t_spark:.1f}s spark"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from cies_ocr_java_spark.plans.queries import ORACLES, QUERIES
    from cies_ocr_java_spark.session import get_spark

    spark = get_spark(app_name="check_queries", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    names = args.names or list(QUERIES)
    failures = 0
    for name in names:
        try:
            ok, msg = compare(name, QUERIES[name](spark, args.sf), con, ORACLES.get(name))
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "PASS" if ok else "FAIL"
        print(f"{status}  {name}: {msg}")
        failures += 0 if ok else 1
        # drop operators' internal persists (dedup.py) between queries
        spark.catalog.clearCache()
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
