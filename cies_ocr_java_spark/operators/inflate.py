"""Raw DEFLATE (RFC 1951) decoded FROM SCRATCH — no zlib on the read side.

Every other compressed surface in the engine (gzip members, PNG IDAT,
PDF FlateDecode, DOCX/EPUB zip members) inflates through the stdlib;
this module is the one place the actual bitstream format is walked:
LSB-first bit reader, stored blocks with LEN/NLEN complement gates,
the fixed literal/length code of 3.2.6, and full dynamic blocks —
the HCLEN-ordered code-length code, 16/17/18 run-length expansion of
the code-length sequence, canonical Huffman reconstruction for both
alphabets with oversubscription/incompleteness gates, and the
length/distance extra-bit tables with back-reference copies that may
overlap their own output. ``inflate_zlib`` adds the RFC 1950 wrapper:
CMF/FLG header checks (method, window, FCHECK, FDICT) and the Adler-32
trailer verification.

Degradation contract (the repo-wide rule): every malformed input maps
to a typed error string via ``InflateError`` — never an uncaught
exception. The reference consumes flate data through PDFBox/commons
(DocumentExtractManager.java:438-461 via pdfbox 3.x, pom.xml:66-70);
this is the from-first-principles equivalent of that dependency's core.

Parity is pinned against the stdlib ENCODER (zlib.compressobj at the
stored / Z_FIXED / dynamic settings) — writer real, reader ours —
plus hand-crafted bitstreams for the corners an encoder never emits.
"""

from __future__ import annotations

import zlib

__all__ = [
    "InflateError",
    "inflate_raw",
    "inflate_zlib",
    "deflate_raw",
    "deflate_zlib",
]


class InflateError(Exception):
    """Typed decode failure; str(e) starts with a stable error kind."""


# RFC 1951 3.2.5 — length codes 257..285: (extra bits, base length)
_LEN_EXTRA = (
    (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 9), (0, 10),
    (1, 11), (1, 13), (1, 15), (1, 17), (2, 19), (2, 23), (2, 27),
    (2, 31), (3, 35), (3, 43), (3, 51), (3, 59), (4, 67), (4, 83),
    (4, 99), (4, 115), (5, 131), (5, 163), (5, 195), (5, 227), (0, 258),
)
# distance codes 0..29: (extra bits, base distance)
_DIST_EXTRA = (
    (0, 1), (0, 2), (0, 3), (0, 4), (1, 5), (1, 7), (2, 9), (2, 13),
    (3, 17), (3, 25), (4, 33), (4, 49), (5, 65), (5, 97), (6, 129),
    (6, 193), (7, 257), (7, 385), (8, 513), (8, 769), (9, 1025),
    (9, 1537), (10, 2049), (10, 3073), (11, 4097), (11, 6145),
    (12, 8193), (12, 12289), (13, 16385), (13, 24577),
)
# 3.2.7 — the order code-length-code lengths are transmitted in
_CLC_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
              14, 1, 15)

_MAX_BITS = 15


class _Bits:
    """LSB-first bit reader over a bytes object."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def take(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise InflateError("unexpected end of stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0


def _build_table(lengths: list[int], what: str,
                 allow_incomplete: bool = False) -> dict[tuple[int, int], int]:
    """Canonical Huffman table per 3.2.2: {(nbits, code): symbol}.

    Over-subscribed length sets always fail. Incomplete sets fail for
    the literal/length and code-length alphabets but are PERMITTED for
    distance alphabets (``allow_incomplete``): the spec's own fixed
    distance table leaves codes 30-31 unassigned ("they will never
    actually occur"), and zlib likewise defers — an unassigned code
    only errors if the data actually uses it (decode-time
    'invalid distance code')."""
    bl_count = [0] * (_MAX_BITS + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (_MAX_BITS + 1)
    remaining = 1
    for bits in range(1, _MAX_BITS + 1):
        remaining = remaining * 2 - bl_count[bits]
        if remaining < 0:
            raise InflateError(f"oversubscribed {what} code lengths")
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    nsyms = sum(bl_count)
    if remaining > 0 and nsyms > 1 and not allow_incomplete:
        raise InflateError(f"incomplete {what} code lengths")
    table: dict[tuple[int, int], int] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
    return table


def _decode_sym(bits: _Bits, table: dict[tuple[int, int], int],
                what: str) -> int:
    code = 0
    for ln in range(1, _MAX_BITS + 1):
        code = (code << 1) | bits.take(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise InflateError(f"invalid {what} code")


def _fixed_tables() -> tuple[dict, dict]:
    lit = ([8] * 144) + ([9] * 112) + ([7] * 24) + ([8] * 8)
    dist = [5] * 30
    return (_build_table(lit, "fixed literal"),
            _build_table(dist, "fixed distance", allow_incomplete=True))


_FIXED_LIT, _FIXED_DIST = _fixed_tables()


def _dynamic_tables(bits: _Bits) -> tuple[dict, dict]:
    hlit = bits.take(5) + 257
    hdist = bits.take(5) + 1
    hclen = bits.take(4) + 4
    if hlit > 286 or hdist > 30:
        raise InflateError("too many literal/distance codes")
    cl_lengths = [0] * 19
    for i in range(hclen):
        cl_lengths[_CLC_ORDER[i]] = bits.take(3)
    cl_table = _build_table(cl_lengths, "code-length")
    lengths: list[int] = []
    while len(lengths) < hlit + hdist:
        sym = _decode_sym(bits, cl_table, "code-length")
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            if not lengths:
                raise InflateError("repeat with no previous length")
            lengths.extend([lengths[-1]] * (3 + bits.take(2)))
        elif sym == 17:
            lengths.extend([0] * (3 + bits.take(3)))
        else:
            lengths.extend([0] * (11 + bits.take(7)))
    if len(lengths) > hlit + hdist:
        raise InflateError("code length repeat past end")
    lit_table = _build_table(lengths[:hlit], "literal/length")
    dist_table = _build_table(lengths[hlit:], "distance",
                              allow_incomplete=True)
    return lit_table, dist_table


def inflate_raw(data: bytes, max_out: int = 1 << 26) -> tuple[bytes, int]:
    """Decode a raw DEFLATE stream. Returns (payload, n_blocks)."""
    payload, n_blocks, _consumed = _inflate_raw_full(data, max_out)
    return payload, n_blocks


def _inflate_raw_full(data: bytes, max_out: int = 1 << 26
                      ) -> tuple[bytes, int, int]:
    """Like inflate_raw, but also returns the CONSUMED byte count —
    what lets container walks (git packs) find the next header after
    an embedded stream of undeclared length."""
    bits = _Bits(data)
    out = bytearray()
    n_blocks = 0
    while True:
        bfinal = bits.take(1)
        btype = bits.take(2)
        n_blocks += 1
        if btype == 3:
            raise InflateError("bad block type")
        if btype == 0:
            bits.align()
            pos = bits.pos
            if pos + 4 > len(data):
                raise InflateError("unexpected end of stream")
            ln = data[pos] | (data[pos + 1] << 8)
            nlen = data[pos + 2] | (data[pos + 3] << 8)
            if ln ^ nlen != 0xFFFF:
                raise InflateError("stored length mismatch")
            if pos + 4 + ln > len(data):
                raise InflateError("unexpected end of stream")
            out += data[pos + 4:pos + 4 + ln]
            bits.pos = pos + 4 + ln
        else:
            if btype == 1:
                lit_table, dist_table = _FIXED_LIT, _FIXED_DIST
            else:
                lit_table, dist_table = _dynamic_tables(bits)
            while True:
                sym = _decode_sym(bits, lit_table, "literal/length")
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise InflateError("invalid literal/length code")
                    ebits, base = _LEN_EXTRA[sym - 257]
                    length = base + bits.take(ebits)
                    dsym = _decode_sym(bits, dist_table, "distance")
                    if dsym > 29:
                        raise InflateError("invalid distance code")
                    debits, dbase = _DIST_EXTRA[dsym]
                    dist = dbase + bits.take(debits)
                    if dist > len(out):
                        raise InflateError("distance too far back")
                    # overlap-correct copy: byte at a time when the
                    # match reaches into its own output
                    if dist >= length:
                        out += out[-dist:len(out) - dist + length]
                    else:
                        start = len(out) - dist
                        for k in range(length):
                            out.append(out[start + k])
        if len(out) > max_out:
            raise InflateError("output size cap exceeded")
        if bfinal:
            return bytes(out), n_blocks, bits.pos - bits.nbits // 8


def inflate_zlib(data: bytes) -> tuple[bytes, int]:
    """RFC 1950 wrapper: header gates + raw inflate + Adler-32 check."""
    if len(data) < 6:
        raise InflateError("zlib stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise InflateError("unsupported zlib compression method")
    if cmf >> 4 > 7:
        raise InflateError("zlib window size too large")
    if (cmf * 256 + flg) % 31 != 0:
        raise InflateError("bad zlib header check")
    if flg & 0x20:
        raise InflateError("preset dictionary not supported")
    payload, n_blocks = inflate_raw(data[2:-4])
    stated = int.from_bytes(data[-4:], "big")
    if zlib.adler32(payload) & 0xFFFFFFFF != stated:
        raise InflateError("adler32 mismatch")
    return payload, n_blocks


def inflate_zlib_stream(data: bytes) -> tuple[bytes, int]:
    """PREFIX decode of an RFC 1950 stream that may be followed by
    unrelated bytes (a pack's next object header): returns
    (payload, consumed) where consumed covers header + deflate bits +
    Adler-32."""
    if len(data) < 6:
        raise InflateError("zlib stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise InflateError("unsupported zlib compression method")
    if cmf >> 4 > 7:
        raise InflateError("zlib window size too large")
    if (cmf * 256 + flg) % 31 != 0:
        raise InflateError("bad zlib header check")
    if flg & 0x20:
        raise InflateError("preset dictionary not supported")
    payload, _nb, used = _inflate_raw_full(data[2:])
    end = 2 + used
    if end + 4 > len(data):
        raise InflateError("truncated adler32")
    stated = int.from_bytes(data[end:end + 4], "big")
    if zlib.adler32(payload) & 0xFFFFFFFF != stated:
        raise InflateError("adler32 mismatch")
    return payload, end + 4


# ---------------------------------------------------------------------------
# writers — the REAL stdlib encoder at pinned settings (reader is ours)
# ---------------------------------------------------------------------------

def deflate_raw(data: bytes, level: int = 9,
                strategy: int = zlib.Z_DEFAULT_STRATEGY) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15, 9, strategy)
    return co.compress(data) + co.flush()


def deflate_zlib(data: bytes, level: int = 9) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, 15)
    return co.compress(data) + co.flush()
