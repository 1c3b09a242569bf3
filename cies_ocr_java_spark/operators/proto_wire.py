"""Protobuf WIRE-FORMAT walker on pure stdlib — the serialization format
training-data pipelines actually ship records in (TFRecord payloads,
gRPC ingest, WARC sidecars).

The wire format (protobuf encoding spec): a message is a sequence of
``tag`` + payload, where tag is a base-128 VARINT carrying
``(field_number << 3) | wire_type``.  Wire types: 0 = varint, 1 = fixed64,
2 = length-delimited (strings, bytes, SUB-MESSAGES), 5 = fixed32.  Two
obligations make a reader real:

* UNKNOWN-FIELD SKIP — forward compatibility demands unknown field
  numbers be skipped BY WIRE TYPE (you cannot skip what you cannot
  frame); a reader that errors on unknown fields breaks on every schema
  evolution;
* BOUNDED VARINTS — a varint longer than 10 bytes or running past EOF
  is malformed, not "keep reading" (the token_bin fail-loud rule).

Failure contract (the MediaCodec discipline): every malformed payload
yields an error ROW, never an exception.

Reference parity: none — the reference's payloads are JSON through API
Gateway; wire-format ingest is beyond-reference.  Schema registry
analog: the closed test message is
``Doc { int64 id=1; string name=2; int64 big=3; Inner nested=4; }``
with ``Inner { int64 n=1; string s=2; }``; unknown fields appear under
numbers >= 9 in fixtures."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_MAX_VARINT_BYTES = 10


def encode_varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("varint must be non-negative here")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    """(value, new_pos); raises ValueError on truncation/overlength."""
    result = 0
    shift = 0
    start = pos
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        if pos - start >= _MAX_VARINT_BYTES:
            raise ValueError("varint too long")
        b = data[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7


def build_proto_doc(doc_id: int, name: str, big: int,
                    inner_n: int, inner_s: str,
                    unknown_fields: int = 0) -> bytes:
    """Emit the closed Doc message, optionally followed by
    ``unknown_fields`` extra fields under numbers 9.. (alternating
    varint / length-delimited wire types) a forward-compatible reader
    must skip."""
    def field(num: int, wt: int, payload: bytes) -> bytes:
        return encode_varint((num << 3) | wt) + payload

    inner = (field(1, 0, encode_varint(inner_n))
             + field(2, 2, encode_varint(len(inner_s.encode()))
                     + inner_s.encode()))
    nb = name.encode()
    out = (field(1, 0, encode_varint(doc_id))
           + field(2, 2, encode_varint(len(nb)) + nb)
           + field(3, 0, encode_varint(big))
           + field(4, 2, encode_varint(len(inner)) + inner))
    for u in range(unknown_fields):
        if u % 2 == 0:
            out += field(9 + u, 0, encode_varint(777 + u))
        else:
            body = b"skipme" + bytes([u])
            out += field(9 + u, 2, encode_varint(len(body)) + body)
    return out


_PROTO_NONE = {"f_id": None, "name": None, "big": None,
               "inner_n": None, "inner_s": None, "n_unknown": None}


def parse_proto_doc(data: bytes | None) -> dict:
    """Walk the wire: known fields decode, unknown fields skip by wire
    type, field 4 recurses into Inner.  Error rows for truncated
    varints/lengths, unskippable wire types, and over-length frames."""
    if data is None or len(data) == 0:
        return {**_PROTO_NONE, "error": "short or missing payload"}
    data = bytes(data)

    def walk(lo: int, hi: int, depth: int) -> dict:
        if depth > 8:
            raise ValueError("message nesting too deep")
        out: dict = {}
        unknown = 0
        pos = lo
        while pos < hi:
            tag, pos = _decode_varint(data, pos)
            num, wt = tag >> 3, tag & 0x07
            if wt == 0:
                val, pos = _decode_varint(data, pos)
            elif wt == 2:
                ln, pos = _decode_varint(data, pos)
                if pos + ln > hi:
                    raise ValueError("length-delimited field overruns")
                val = (pos, pos + ln)
                pos += ln
            elif wt == 1:
                if pos + 8 > hi:
                    raise ValueError("fixed64 overruns")
                val = int.from_bytes(data[pos:pos + 8], "little")
                pos += 8
            elif wt == 5:
                if pos + 4 > hi:
                    raise ValueError("fixed32 overruns")
                val = int.from_bytes(data[pos:pos + 4], "little")
                pos += 4
            else:
                raise ValueError(f"unskippable wire type {wt}")
            key = (num, wt)
            if depth == 0 and key in ((1, 0), (2, 2), (3, 0), (4, 2)):
                out[num] = val
            elif depth == 1 and key in ((1, 0), (2, 2)):
                out[num] = val
            else:
                unknown += 1
        out["_unknown"] = unknown
        return out

    try:
        top = walk(0, len(data), 0)
        f_id = top.get(1)
        name = None
        if 2 in top:
            a, b = top[2]
            name = data[a:b].decode("utf-8", "replace")
        big = top.get(3)
        inner_n = inner_s = None
        n_unknown = top["_unknown"]
        if 4 in top:
            a, b = top[4]
            inner = walk(a, b, 1)
            inner_n = inner.get(1)
            if 2 in inner:
                ia, ib = inner[2]
                inner_s = data[ia:ib].decode("utf-8", "replace")
            n_unknown += inner["_unknown"]
        return {"f_id": f_id, "name": name, "big": big,
                "inner_n": inner_n, "inner_s": inner_s,
                "n_unknown": n_unknown, "error": None}
    except ValueError as e:
        return {**_PROTO_NONE, "error": str(e)}


PROTO_DOC_SCHEMA = (
    "doc_id long, f_id bigint, name string, big bigint, inner_n bigint, "
    "inner_s string, n_unknown int, error string"
)


def extract_proto_docs(df: DataFrame, content_col: str = "content",
                       id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> decoded Doc rows via one Arrow-batched
    mapInPandas pass (no shuffle)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_proto_doc(b) for b in pdf[content_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "f_id": pd.array([r["f_id"] for r in rows], dtype="Int64"),
                "name": [r["name"] for r in rows],
                "big": pd.array([r["big"] for r in rows], dtype="Int64"),
                "inner_n": pd.array(
                    [r["inner_n"] for r in rows], dtype="Int64"),
                "inner_s": [r["inner_s"] for r in rows],
                "n_unknown": pd.array(
                    [r["n_unknown"] for r in rows], dtype="Int32"),
                "error": [r["error"] for r in rows],
            })

    return df.select(id_col, content_col).mapInPandas(
        op, PROTO_DOC_SCHEMA)
