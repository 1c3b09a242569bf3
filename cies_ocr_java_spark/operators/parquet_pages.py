"""Parquet DATA PAGES decoded through the hand-written thrift reader
— one level deeper than parquet_footer.py: the footer's
data_page_offset leads to a PageHeader (ANOTHER thrift compact
struct, parsed by the same _Reader the footer walk built), then the
v1 data page body: definition levels as a 4-byte-length-prefixed RLE
run (pyarrow marks columns OPTIONAL, so a single bit-width-1 RLE run
of 1s precedes every page even with zero nulls — the levels nobody
expects), then PLAIN little-endian INT64 values, read back and
summed exactly.

Writer = pyarrow with use_dictionary=False (forcing PLAIN — the
default dictionary encoding is a different page kind, rejected here
by name), reader = ours end to end: footer thrift -> page thrift ->
RLE levels -> values.

Failure contract (the MediaCodec discipline, multimodal.py): every
malformed file yields an error ROW — never an exception.

Reference parity: none — beyond-reference columnar-storage operator.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from cies_ocr_java_spark.operators.parquet_footer import (
    ParquetFooterError,
    _Reader,
    parse_parquet_footer,
)


def build_parquet_plain(n_rows: int, val_step: int,
                        row_group_size: int = 2) -> bytes:
    """id/val int64 columns, PLAIN-encoded (no dictionary)."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "id": pa.array(range(1, n_rows + 1), pa.int64()),
        "val": pa.array([(r + 1) * val_step for r in range(n_rows)],
                        pa.int64()),
    })
    buf = io.BytesIO()
    pq.write_table(table, buf, row_group_size=row_group_size,
                   compression="none", use_dictionary=False,
                   write_statistics=False)
    return buf.getvalue()


_PP_NONE = {"n_row_groups": None, "n_pages": None,
            "total_values": None, "values_sum": None,
            "min_val": None, "max_val": None}


def parse_parquet_values(data: bytes | None, column: str = "val"
                         ) -> dict:
    if data is None or len(data) < 12:
        return {**_PP_NONE, "error": "file shorter than parquet "
                                     "envelope"}
    data = bytes(data)
    try:
        meta = parse_parquet_footer(data)
    except ParquetFooterError as e:
        return {**_PP_NONE, "error": str(e)}
    try:
        n_pages = 0
        total_values = 0
        vsum = 0
        vmin = vmax = None
        for rg in meta["row_groups"]:
            for col in rg["cols"]:
                if col["path"] != column:
                    continue
                if col["codec"] != "UNCOMPRESSED":
                    raise ValueError(
                        f"unsupported codec {col['codec']}")
                pos = col["data_page_offset"]
                remaining = col["num_values"]
                while remaining > 0:
                    r = _Reader(data[pos:])
                    hdr = r.struct()
                    header_len = r.pos
                    ptype = hdr.get(1)
                    if ptype != 0:
                        raise ValueError(
                            f"unsupported page type {ptype}")
                    comp_size = hdr.get(3)
                    dph = hdr.get(5) or {}
                    nvals = dph.get(1)
                    enc = dph.get(2)
                    if enc != 0:
                        raise ValueError(
                            f"unsupported encoding {enc}")
                    body_at = pos + header_len
                    if body_at + comp_size > len(data):
                        raise ValueError("page overruns file")
                    body = data[body_at:body_at + comp_size]
                    # v1 optional column: 4-byte-length-prefixed RLE
                    # definition levels (bit width 1)
                    (lvl_len,) = struct.unpack_from("<I", body, 0)
                    if 4 + lvl_len > len(body):
                        raise ValueError("levels overrun page")
                    q = 4 + lvl_len
                    # exact consumption: a stray 1..7 trailing bytes
                    # would otherwise vanish under the floor division
                    if (len(body) - q) % 8:
                        raise ValueError(
                            "trailing bytes after plain values")
                    n = (len(body) - q) // 8
                    if n != nvals:
                        raise ValueError(
                            "plain value count disagrees with header")
                    vals = struct.unpack_from(f"<{n}q", body, q)
                    vsum += sum(vals)
                    if vals:
                        lo, hi = min(vals), max(vals)
                        vmin = lo if vmin is None else min(vmin, lo)
                        vmax = hi if vmax is None else max(vmax, hi)
                    total_values += n
                    remaining -= n
                    n_pages += 1
                    pos = body_at + comp_size
    except (ValueError, ParquetFooterError, struct.error,
            TypeError) as e:
        msg = str(e) if isinstance(e, (ValueError,
                                       ParquetFooterError)) \
            else "malformed page structure"
        return {**_PP_NONE, "error": msg}
    return {
        "n_row_groups": len(meta["row_groups"]),
        "n_pages": n_pages,
        "total_values": total_values,
        "values_sum": vsum,
        "min_val": vmin, "max_val": vmax,
        "error": None,
    }


PP_SCHEMA = ("doc_id long, n_row_groups int, n_pages int, "
             "total_values bigint, values_sum bigint, "
             "min_val bigint, max_val bigint, error string")


def extract_parquet_values(df: DataFrame,
                           content_col: str = "content",
                           id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> decoded column facts via one
    Arrow-batched mapInPandas pass (no shuffle)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_parquet_values(b) for b in pdf[content_col]]
            out = {"doc_id": pdf[id_col].astype("int64")}
            for k, dt in [
                ("n_row_groups", "Int32"), ("n_pages", "Int32"),
                ("total_values", "Int64"), ("values_sum", "Int64"),
                ("min_val", "Int64"), ("max_val", "Int64"),
                ("error", None),
            ]:
                vals = [r[k] for r in rows]
                out[k] = pd.array(vals, dtype=dt) if dt else vals
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(op, PP_SCHEMA)
