"""Synthesize a K-times scale-up of a testdata sf dir (round-4 verdict
item 3: one scale-factor step past sf0.1 to surface spill-sensitive
plans before a real cluster does). The driver only ships sf0.001/0.01/
0.1, so the sfbig corpus is derived deterministically from sf0.1 by
replicating every table K times with key-consistent offsets:

  - region/nation: copied (dimensions).
  - customer/supplier/part/orders/lineitem: all keys AND foreign keys
    offset by replica*max_key, so join cardinalities scale linearly
    (each replica is a self-contained TPC-H-ish world).
  - events: event_id/user_id offset (per-user sessionization scales
    linearly; no cross-replica user merges).
  - documents: doc_id offset AND text mutated per replica (one vowel
    substituted by a replica-distinct letter) — verbatim replication
    would make every doc a 10-way exact duplicate and blow the near-dup
    pair space quadratically in K, which measures the replication
    artifact, not the engine.
  - embeddings: vec_id offset, components scaled by (1 + k/1000) —
    verbatim vectors would create exact distance ties in every top-k.

Correctness at the new scale is still oracle-exact: every oracle reads
the SAME parquet files, so generation choices cannot desynchronize the
two engines.

Usage: python tools/make_scaled_sf.py --src /root/testdata/sf0.1 \
           --out /tmp/sfbig --k 10
"""

from __future__ import annotations

import argparse
import os

import duckdb


def scale(src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def t(name: str) -> str:
        return f"read_parquet('{os.path.join(src, name)}.parquet')"

    def write(name: str, sql: str) -> None:
        dst = os.path.join(out, f"{name}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET, "
            f"COMPRESSION SNAPPY, ROW_GROUP_SIZE 262144)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"  {name}: {n} rows")

    # stride = max+1: the driver's keys are 0-based, so an offset of
    # max alone would collide the last row of replica r with the first
    # of replica r+1
    maxes = {}
    for tbl, key in (("customer", "c_custkey"), ("supplier", "s_suppkey"),
                     ("part", "p_partkey"), ("orders", "o_orderkey"),
                     ("events", "event_id"), ("documents", "doc_id"),
                     ("embeddings", "vec_id")):
        maxes[tbl] = con.sql(
            f"SELECT max({key}) + 1 FROM {t(tbl)}").fetchone()[0]
    umax = con.sql(
        f"SELECT max(user_id) + 1 FROM {t('events')}").fetchone()[0]

    rep = f"(SELECT unnest(range({k})) AS r)"
    write("region", f"SELECT * FROM {t('region')}")
    write("nation", f"SELECT * FROM {t('nation')}")
    write("customer", f"""
        SELECT c_custkey + r * {maxes['customer']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {t('customer')}, {rep}""")
    write("supplier", f"""
        SELECT s_suppkey + r * {maxes['supplier']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM {t('supplier')}, {rep}""")
    write("part", f"""
        SELECT p_partkey + r * {maxes['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {t('part')}, {rep}""")
    write("orders", f"""
        SELECT o_orderkey + r * {maxes['orders']} AS o_orderkey,
               o_custkey + r * {maxes['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')}, {rep}""")
    write("lineitem", f"""
        SELECT l_orderkey + r * {maxes['orders']} AS l_orderkey,
               l_partkey + r * {maxes['part']} AS l_partkey,
               l_suppkey + r * {maxes['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')}, {rep}""")
    write("events", f"""
        SELECT event_id + r * {maxes['events']} AS event_id, ts,
               user_id + r * {umax} AS user_id, event_type, value, props
        FROM {t('events')}, {rep}""")
    # one vowel swapped per replica keeps replicas linguistically close
    # but below near-dup thresholds (replica 0 is the verbatim original)
    write("documents", f"""
        SELECT doc_id + r * {maxes['documents']} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE replace(text, 'e', chr(106 + CAST(r AS INT) % 20))
               END AS text,
               lang, source,
               CAST(length(CASE WHEN r = 0 THEN text
                    ELSE replace(text, 'e', chr(106 + CAST(r AS INT) % 20))
               END) AS BIGINT) AS n_chars
        FROM {t('documents')}, {rep}""")
    write("embeddings", f"""
        SELECT vec_id + r * {maxes['embeddings']} AS vec_id,
               CAST(list_transform(embedding,
                    x -> CAST(x * (1.0 + r / 1000.0) AS FLOAT))
                    AS FLOAT[]) AS embedding,
               label
        FROM {t('embeddings')}, {rep}""")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    a = ap.parse_args()
    print(f"scaling {a.src} x{a.k} -> {a.out}")
    scale(a.src, a.out, a.k)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
