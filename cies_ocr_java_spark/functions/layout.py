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


# ---------------------------------------------------------------------------
# Hilbert clustering keys — the better-locality sibling of Z-order
# ---------------------------------------------------------------------------
# A Z-order key jumps (the "seam" between quadrants) — a box query maps to
# many disjoint key ranges. The Hilbert curve visits every cell of each
# quadrant before leaving it, so the same box covers FEWER, LONGER key
# runs -> fewer row groups read at 100 TB. Algorithm: the classic
# quadrant-fold iteration (d += s²·((3·rx) XOR ry), then flip+swap the
# frame); the flip uses mask-x ≡ bitwise complement, whose low bits equal
# the in-quadrant flip, so the whole state update is branch-free integer
# arithmetic — exactly replayable in SQL.
#
# Both renderers below are generated from the SAME per-round recurrence:
# Spark gets one Project per round (keeps the expression tree linear —
# CollapseProject will not inline multiply-referenced CASEs), the oracle
# gets one chained CTE per round.

def with_hilbert_key(df, x: Column, y: Column, bits: int = 8,
                     out: str = "hkey"):
    """Append the Hilbert d-index of (x, y) over a 2^bits x 2^bits grid
    as column ``out`` — one narrow Project per round, pure codegen."""
    mask = (1 << bits) - 1
    df = df.withColumn("_hx", x.cast("bigint").bitwiseAND(F.lit(mask)))
    df = df.withColumn("_hy", y.cast("bigint").bitwiseAND(F.lit(mask)))
    df = df.withColumn(out, F.lit(0).cast("bigint"))
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        rx = F.shiftright(F.col("_hx"), b).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), b).bitwiseAND(F.lit(1))
        quad = (F.lit(3) * rx).bitwiseXOR(ry)
        flip = (ry == 0) & (rx == 1)
        nx = F.when(
            ry == 0,
            F.when(flip, F.lit(mask) - F.col("_hy")).otherwise(F.col("_hy")),
        ).otherwise(F.col("_hx"))
        ny = F.when(
            ry == 0,
            F.when(flip, F.lit(mask) - F.col("_hx")).otherwise(F.col("_hx")),
        ).otherwise(F.col("_hy"))
        df = (
            df.withColumn(out, F.col(out) + F.lit(s * s) * quad)
            .withColumn("_nhx", nx)
            .withColumn("_nhy", ny)
            .drop("_hx", "_hy")
            .withColumnRenamed("_nhx", "_hx")
            .withColumnRenamed("_nhy", "_hy")
        )
    return df.drop("_hx", "_hy")


def hilbert_sql_ctes(src: str, x: str, y: str, bits: int = 8,
                     out: str = "hkey") -> str:
    """Chained-CTE DuckDB replay of the identical recurrence: reads
    relation ``src`` (must expose columns ``{x}``/``{y}`` plus anything
    to carry through), returns the final CTE name 'hfin' exposing
    src.* plus ``out``."""
    mask = (1 << bits) - 1
    parts = [
        f"h0 AS (SELECT *, CAST({x} AS BIGINT) & {mask} AS _hx, "
        f"CAST({y} AS BIGINT) & {mask} AS _hy, CAST(0 AS BIGINT) AS {out} "
        f"FROM {src})"
    ]
    step = 0
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        prev, cur = f"h{step}", f"h{step + 1}"
        parts.append(
            f"{cur} AS (SELECT * EXCLUDE (_hx, _hy, {out}),\n"
            f"  {out} + {s * s} * CAST(xor(3 * ((_hx >> {b}) & 1), "
            f"(_hy >> {b}) & 1) AS BIGINT) AS {out},\n"
            f"  CASE WHEN ((_hy >> {b}) & 1) = 0 THEN (CASE WHEN "
            f"((_hx >> {b}) & 1) = 1 THEN {mask} - _hy ELSE _hy END) "
            f"ELSE _hx END AS _hx,\n"
            f"  CASE WHEN ((_hy >> {b}) & 1) = 0 THEN (CASE WHEN "
            f"((_hx >> {b}) & 1) = 1 THEN {mask} - _hx ELSE _hx END) "
            f"ELSE _hy END AS _hy\n"
            f"  FROM {prev})"
        )
        step += 1
    parts.append(
        f"hfin AS (SELECT * EXCLUDE (_hx, _hy) FROM h{step})"
    )
    return ",\n".join(parts)
