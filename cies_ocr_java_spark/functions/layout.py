"""Data-layout functions: Z-order (Morton) clustering keys.

At 100 TB the scan is the query plan's dominant cost, and min/max
row-group pruning only skips data the LAYOUT makes skippable: a table
sorted by one column prunes on that column and nothing else. Writing
files range-partitioned + sorted by an interleaved-bit key of TWO
columns gives every file a tight bounding BOX in (x, y), so a predicate
on either column — or both — skips most files. This is the standard
Z-ORDER OPTIMIZE of lakehouse table formats, expressed as plain
DataFrame ops: ``repartitionByRange(zorder_key(...))`` + sort-within-
partitions, no engine extension needed.

The key is pure integer bit math (shifts, masks, adds) — codegen'd
JVM-side in Spark and replayed exactly by the DuckDB oracle via
``zorder_key_sql`` (same unrolled expression, dialect-local shift
operators). No hashing, no floats.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: x's bit i lands at position 2i, y's at 2i+1.
    Monotone in neither input — that is the point: close in the key
    implies close in BOTH inputs, so files sorted by the key have small
    (x, y) bounding boxes."""
    xb = x.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    yb = y.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(
            F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return out


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical unrolled expression in DuckDB SQL (>> / << / &),
    for oracle replay."""
    mask = (1 << bits) - 1
    xs = f"(CAST({x} AS BIGINT) & {mask})"
    ys = f"(CAST({y} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xs} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ys} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
