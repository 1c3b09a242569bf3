"""REAL Snappy codec from first principles — the storage tier's other
fast codec beside LZ4 (lz4_real.py), and a sibling with instructive
differences: where LZ4 interleaves literal/match inside one token,
Snappy streams self-contained TAGS (low 2 bits select the element
kind) after a VARINT uncompressed-length preamble:

- tag 00: literal — lengths up to 60 live in the tag's high 6 bits;
  61..64 mean "length is the next 1..4 little-endian bytes + 1";
- tag 01: copy1 — 3-bit length (4..11) + 11-bit offset (3 high bits
  in the tag, low byte follows);
- tag 10: copy2 — 6-bit length-1 + u16le offset;
- tag 11: copy4 — u32le offset (emitted only for huge windows; read
  here, never written by this encoder).

Copies may overlap forward (offset < length = RLE, the LZ4 rule) and
a zero offset is corruption, not a degenerate copy.  The decoded
length must land EXACTLY on the preamble's claim.

Failure contract (the MediaCodec discipline, multimodal.py): every
malformed stream yields an error ROW — never an exception.

Reference parity: none — beyond-reference codec operator (feeds
leveldb_sst's block compression, the real-world pairing).
"""

from __future__ import annotations


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if pos >= len(data) or shift > 35:
            raise ValueError("bad length preamble")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return v, pos


def _emit_literal(out: bytearray, lit: bytes) -> None:
    n = len(lit)
    if n == 0:
        return
    if n <= 60:
        out.append((n - 1) << 2)
    elif n <= 0x100:
        out.append(60 << 2)
        out.append(n - 1)
    else:
        out.append(61 << 2)
        out += (n - 1).to_bytes(2, "little")
    out += lit


def snappy_compress(data: bytes) -> bytes:
    """Greedy hash-table matcher (the reference implementation's
    shape at its simplest): 4-byte probes, copy1/copy2 emission."""
    out = bytearray(_uvarint(len(data)))
    n = len(data)
    table: dict[bytes, int] = {}
    pos = 0
    lit_start = 0
    while pos + 4 <= n:
        key = data[pos:pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand > 0xFFFF:
            pos += 1
            continue
        length = 4
        while pos + length < n and length < 64 \
                and data[cand + length] == data[pos + length]:
            length += 1
        _emit_literal(out, data[lit_start:pos])
        off = pos - cand
        if 4 <= length <= 11 and off <= 0x7FF:
            out.append(0x01 | ((length - 4) << 2) | ((off >> 8) << 5))
            out.append(off & 0xFF)
        else:
            out.append(0x02 | ((length - 1) << 2))
            out += off.to_bytes(2, "little")
        pos += length
        lit_start = pos
    _emit_literal(out, data[lit_start:])
    return bytes(out)


def snappy_decompress(data: bytes, max_out: int = 1 << 24) -> bytes:
    expect, pos = _read_uvarint(bytes(data), 0)
    if expect > max_out:
        raise ValueError("declared size exceeds cap")
    data = bytes(data)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("literal length overruns stream")
                ln = int.from_bytes(data[pos:pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("literal overruns stream")
            out += data[pos:pos + ln]
            pos += ln
        else:
            if kind == 1:
                if pos >= n:
                    raise ValueError("copy1 overruns stream")
                ln = ((tag >> 2) & 0x07) + 4
                off = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:
                if pos + 2 > n:
                    raise ValueError("copy2 overruns stream")
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos:pos + 2], "little")
                pos += 2
            else:
                if pos + 4 > n:
                    raise ValueError("copy4 overruns stream")
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos:pos + 4], "little")
                pos += 4
            if off == 0:
                raise ValueError("zero copy offset")
            if off > len(out):
                raise ValueError("copy offset out of window")
            start = len(out) - off
            for k in range(ln):  # overlap-forward, the RLE rule
                out.append(out[start + k])
        if len(out) > expect:
            raise ValueError("output overruns declared length")
    if len(out) != expect:
        raise ValueError("output short of declared length")
    return bytes(out)
