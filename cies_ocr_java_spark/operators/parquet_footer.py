"""Parquet FOOTERS decoded from scratch — a hand-written Thrift Compact
Protocol reader over REAL parquet files (writer = pyarrow/parquet-cpp).

Parquet's metadata is a Thrift ``FileMetaData`` struct serialized with
the COMPACT protocol (parquet-format/src/main/thrift/parquet.thrift,
public) and trailed by ``<4-byte LE footer length> PAR1``. The engine
reads parquet all day through Spark's vectorized reader; this module
proves the format itself is understood at the wire level:

- compact-protocol primitives: ULEB128 varints, zigzag ints, field
  headers as (delta << 4 | type) with long form for delta 0, BOOL
  values folded into the field-header type nibble, list headers as
  (size << 4 | elem-type) with the size-15 escape, doubles, binaries;
- the FileMetaData tree: version, flat SchemaElement list (re-nested
  by num_children to recover LEAF columns), num_rows, RowGroup ->
  ColumnChunk -> ColumnMetaData (type, codec, num_values, sizes,
  data-page offset) and Statistics (min_value/max_value plain-encoded
  per physical type, null_count);
- structural gates: head/tail magic, footer length vs file bounds,
  truncated-struct detection, unknown field types fail loudly.

This is the same one-two as sqlite_real/proto_wire: the WRITER is the
real library, the READER is first-principles — so parity against
pyarrow's own ``ParquetFile.metadata`` pins correctness of both the
walk and the closed-form oracle arithmetic.

Degradation contract: all failures raise ``ParquetFooterError`` with a
stable kind; callers emit error rows, never exceptions.
"""

from __future__ import annotations

import struct

__all__ = ["ParquetFooterError", "parse_parquet_footer", "build_parquet"]


class ParquetFooterError(Exception):
    """Typed footer-parse failure; str(e) starts with a stable kind."""


# compact-protocol wire types
_T_STOP, _T_TRUE, _T_FALSE, _T_BYTE, _T_I16, _T_I32, _T_I64 = range(7)
_T_DOUBLE, _T_BINARY, _T_LIST, _T_SET, _T_MAP, _T_STRUCT = range(7, 13)


class _Reader:
    __slots__ = ("data", "pos", "depth")

    _MAX_DEPTH = 64

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.depth = 0

    def byte(self) -> int:
        if self.pos >= len(self.data):
            raise ParquetFooterError("truncated thrift struct")
        b = self.data[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        v = shift = 0
        while True:
            b = self.byte()
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7
            if shift > 63:
                raise ParquetFooterError("varint too long")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def binary(self) -> bytes:
        n = self.varint()
        if self.pos + n > len(self.data):
            raise ParquetFooterError("truncated thrift struct")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def value(self, wtype: int):
        if wtype == _T_TRUE:
            return True
        if wtype == _T_FALSE:
            return False
        if wtype == _T_BYTE:
            return self.byte()
        if wtype in (_T_I16, _T_I32, _T_I64):
            return self.zigzag()
        if wtype == _T_DOUBLE:
            if self.pos + 8 > len(self.data):
                raise ParquetFooterError("truncated thrift struct")
            v = struct.unpack("<d", self.data[self.pos:self.pos + 8])[0]
            self.pos += 8
            return v
        if wtype == _T_BINARY:
            return self.binary()
        if wtype in (_T_LIST, _T_SET):
            head = self.byte()
            n = head >> 4
            etype = head & 0x0F
            if n == 15:
                n = self.varint()
            # every element costs >= 1 byte: a corrupt size varint must
            # not allocate past the buffer
            if n > len(self.data) - self.pos:
                raise ParquetFooterError("truncated thrift struct")
            if etype == _T_TRUE:  # bools are one byte each inside lists
                return [self.byte() == 1 for _ in range(n)]
            return [self.value(etype) for _ in range(n)]
        if wtype == _T_MAP:
            n = self.varint()
            if n > (len(self.data) - self.pos) // 2:
                raise ParquetFooterError("truncated thrift struct")
            if n == 0:
                return []
            kv = self.byte()
            kt, vt = kv >> 4, kv & 0x0F
            # keys may decode to unhashable wire shapes under
            # corruption — pairs, not a dict (FileMetaData has no maps)
            return [(self.value(kt), self.value(vt)) for _ in range(n)]
        if wtype == _T_STRUCT:
            return self.struct()
        raise ParquetFooterError(f"unknown thrift field type {wtype}")

    def struct(self) -> dict[int, object]:
        self.depth += 1
        if self.depth > self._MAX_DEPTH:
            raise ParquetFooterError("thrift struct too deep")
        fields: dict[int, object] = {}
        fid = 0
        while True:
            head = self.byte()
            if head == _T_STOP:
                self.depth -= 1
                return fields
            delta = head >> 4
            wtype = head & 0x0F
            fid = fid + delta if delta else self.zigzag()
            fields[fid] = self.value(wtype)


_PHYS = {0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
         4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY",
         7: "FIXED_LEN_BYTE_ARRAY"}
_CODEC = {0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
          4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW"}


def _decode_stat(raw: bytes, phys: str):
    """Plain-encoded min/max per physical type (Statistics values)."""
    if raw is None:
        return None
    if not isinstance(raw, (bytes, bytearray)):
        raise ParquetFooterError("malformed statistics value")
    if phys == "INT64" and len(raw) != 8:
        raise ParquetFooterError("malformed statistics value")
    if phys == "INT32" and len(raw) != 4:
        raise ParquetFooterError("malformed statistics value")
    if phys in ("DOUBLE", "FLOAT") and len(raw) != (8 if phys == "DOUBLE" else 4):
        raise ParquetFooterError("malformed statistics value")
    if phys == "INT64":
        return struct.unpack("<q", raw)[0]
    if phys == "INT32":
        return struct.unpack("<i", raw)[0]
    if phys == "DOUBLE":
        return struct.unpack("<d", raw)[0]
    if phys == "FLOAT":
        return struct.unpack("<f", raw)[0]
    if phys == "BOOLEAN":
        return raw != b"\x00"
    return raw.decode("utf-8", "replace")  # BYTE_ARRAY strings


def parse_parquet_footer(data: bytes) -> dict:
    """Walk the footer of a real parquet file.

    Returns num_rows, version, leaf columns (name, physical type), and
    per-row-group column chunks with codec/num_values/sizes/stats."""
    if len(data) < 12:
        raise ParquetFooterError("file shorter than parquet envelope")
    if data[:4] != b"PAR1":
        raise ParquetFooterError("bad head magic")
    if data[-4:] != b"PAR1":
        raise ParquetFooterError("bad footer magic")
    flen = int.from_bytes(data[-8:-4], "little")
    if flen + 8 > len(data) - 4:
        raise ParquetFooterError("footer length out of bounds")
    r = _Reader(data[len(data) - 8 - flen:len(data) - 8])
    md = r.struct()
    try:
        return _interpret(md)
    except (TypeError, AttributeError, KeyError, IndexError):
        # a corrupted footer can decode "successfully" into the wrong
        # wire shapes (e.g. an int where a list belongs) — same typed
        # failure as a truncation
        raise ParquetFooterError("malformed FileMetaData") from None


def _interpret(md: dict) -> dict:
    version = md.get(1)
    schema = md.get(2) or []
    num_rows = md.get(3)
    if num_rows is None or not schema:
        raise ParquetFooterError("missing FileMetaData fields")
    # flat SchemaElement list: root first; leaves are num_children == 0
    leaves: list[tuple[str, str]] = []
    for el in schema[1:]:
        nchild = el.get(5, 0) or 0
        if nchild == 0:
            name = el.get(4, b"").decode("utf-8", "replace")
            leaves.append((name, _PHYS.get(el.get(1), "UNKNOWN")))
    groups = []
    for rg in md.get(4) or []:
        cols = []
        for cc in rg.get(1) or []:
            cm = cc.get(3) or {}
            phys = _PHYS.get(cm.get(1), "UNKNOWN")
            st = cm.get(12) or {}
            cols.append({
                "path": b".".join(cm.get(3, [])).decode("utf-8", "replace")
                if isinstance(cm.get(3), list) else "",
                "type": phys,
                "codec": _CODEC.get(cm.get(4), "UNKNOWN"),
                "num_values": cm.get(5),
                "uncompressed": cm.get(6),
                "compressed": cm.get(7),
                "data_page_offset": cm.get(9),
                "dictionary_page_offset": cm.get(11),
                "null_count": st.get(3),
                "min": _decode_stat(st.get(6), phys),
                "max": _decode_stat(st.get(5), phys),
            })
        groups.append({"num_rows": rg.get(3), "cols": cols})
    return {
        "version": version,
        "num_rows": num_rows,
        "leaves": leaves,
        "row_groups": groups,
    }


def build_parquet(text: str, chunk: int = 24, row_group_size: int = 7,
                  val_step: int = 1000003) -> bytes:
    """A real parquet file from ``text``: ``chunk``-codepoint rows with
    (id int64, chunk string, val int64 = (i+1)*val_step) columns,
    pinned row-group size so multi-group footers appear at fixture
    scale. Writer = pyarrow (parquet-cpp), reader = ours."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    chunks = [text[i:i + chunk] for i in range(0, len(text), chunk)] or [""]
    n = len(chunks)
    table = pa.table({
        "id": pa.array(range(1, n + 1), pa.int64()),
        "chunk": pa.array(chunks, pa.string()),
        "val": pa.array([(i + 1) * val_step for i in range(n)], pa.int64()),
    })
    buf = io.BytesIO()
    pq.write_table(table, buf, row_group_size=row_group_size,
                   compression="none")
    return buf.getvalue()
