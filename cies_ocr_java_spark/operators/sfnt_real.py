"""REAL TTF/sfnt font files: table-directory walk, checksum discipline,
cmap format-4 character mapping.

Web crawls are full of fonts (@font-face TTF/WOFF payloads), and for an
extraction pipeline their payload is the CHARACTER MAP: which code
points the font can render, and which glyphs they map to — the input to
glyph-coverage scoring, subset-font fingerprinting, and the CID work in
pdf_cid.py (a PDF's embedded font subset IS one of these). The sfnt
format brings two disciplines worth gating exactly:

* the CHECKSUM system (OpenType §"Calculating checksums"): every table
  checksums as big-endian u32 sums over its zero-padded length; the
  ``head`` table's checkSumAdjustment is set so the WHOLE FILE sums to
  0xB1B0AFBA — verifying it (with the adjustment field zeroed during
  the sum, the rule naive implementations get wrong) proves the file
  end-to-end the way DER/CBOR canonical gates do;
* the offset-table SEARCH FIELDS (searchRange/entrySelector/rangeShift)
  are redundant derivations of numTables — canonical-form checks, since
  inconsistent values mark tampered or truncated fonts.

The cmap FORMAT 4 subtable is the classic binary-search segment array:
sorted endCode[] with a mandatory 0xFFFF sentinel, parallel startCode/
idDelta/idRangeOffset arrays — and idRangeOffset's infamous
SELF-RELATIVE addressing (a live pointer into glyphIdArray measured in
bytes from the idRangeOffset slot itself), which this reader implements
exactly, including the "glyph 0 stays 0 before idDelta" rule.

Writer emits real minimal fonts (head/maxp/cmap + name filler) with
correct checksums and both mapping mechanisms; reader re-verifies
everything and projects the char->glyph map. Failure contract: error
rows, never exceptions."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["build_ttf", "parse_ttf", "extract_sfnt_features",
           "SFNT_FEATURES_SCHEMA"]

_MAGIC_SUM = 0xB1B0AFBA
_HEAD_MAGIC = 0x5F0F3CF5


def _csum(data: bytes) -> int:
    """Big-endian u32 sum over the zero-padded table."""
    pad = data + b"\x00" * (-len(data) % 4)
    return sum(
        struct.unpack(">I", pad[i:i + 4])[0] for i in range(0, len(pad), 4)
    ) & 0xFFFFFFFF


def _cmap4(delta_seg: tuple[int, int, int],
           array_seg: tuple[int, int, list[int]]) -> bytes:
    """Format-4 subtable with one idDelta segment (start, end, delta),
    one idRangeOffset segment (start, end, glyph ids via glyphIdArray —
    the self-relative pointer path), and the 0xFFFF sentinel."""
    s1, e1, delta1 = delta_seg
    s2, e2, glyphs = array_seg
    assert e2 - s2 + 1 == len(glyphs)
    segc = 3
    ends = [e1, e2, 0xFFFF]
    starts = [s1, s2, 0xFFFF]
    deltas = [delta1 & 0xFFFF, 0, 1]
    # idRangeOffset[i] is a BYTE distance from its own slot into
    # glyphIdArray (which begins right after the offsets array): for
    # segment index i pointing at glyphIdArray[0] that is 2*(segc - i)
    offsets = [0, 2 * (segc - 1), 0]
    seg_x2 = segc * 2
    msb = 1 << (segc.bit_length() - 1)
    search_range = 2 * msb
    entry_selector = msb.bit_length() - 1
    range_shift = seg_x2 - search_range
    arrs = b"".join(struct.pack(">H", v) for v in ends)
    arrs += struct.pack(">H", 0)  # reservedPad
    arrs += b"".join(struct.pack(">H", v) for v in starts)
    arrs += b"".join(struct.pack(">H", v) for v in deltas)
    arrs += b"".join(struct.pack(">H", v) for v in offsets)
    arrs += b"".join(struct.pack(">H", v) for v in glyphs)
    sub_len = 14 + len(arrs)
    sub = (struct.pack(">HHHHHHH", 4, sub_len, 0, seg_x2, search_range,
                       entry_selector, range_shift) + arrs)
    # cmap table: version 0, one encoding record (platform 3, encoding 1)
    return struct.pack(">HHHHI", 0, 1, 3, 1, 12) + sub


def build_ttf(delta_seg: tuple[int, int, int],
              array_seg: tuple[int, int, list[int]],
              num_glyphs: int, *, poison: str | None = None) -> bytes:
    """Emit a real minimal TTF: head/maxp/cmap/name tables, correct
    per-table checksums, and a checkSumAdjustment that makes the whole
    file sum to 0xB1B0AFBA. ``poison``: ``search_range`` (offset-table
    search fields inconsistent), ``table_sum`` (cmap directory checksum
    off by one), ``font_sum`` (checkSumAdjustment corrupted),
    ``no_sentinel`` (cmap's final endCode != 0xFFFF)."""
    cmap = _cmap4(delta_seg, array_seg)
    if poison == "no_sentinel":
        at = cmap.index(struct.pack(">H", 0xFFFF))
        cmap = cmap[:at] + struct.pack(">H", 0xFFFE) + cmap[at + 2:]
    head = struct.pack(
        ">IIIIHHqqhhhhHHhhh",
        0x00010000, 0, 0, _HEAD_MAGIC, 0b0000000000001011, 1000,
        3_500_000_000, 3_500_000_000, 0, -200, 1000, 800, 0, 8, 2, 0, 0,
    )
    maxp = struct.pack(">IH", 0x00005000, num_glyphs)
    name = struct.pack(">HHH", 0, 0, 6)
    tables = [(b"cmap", cmap), (b"head", head), (b"maxp", maxp),
              (b"name", name)]
    n = len(tables)
    # canonical search fields: largest power of two <= numTables
    msb = 1 << (n.bit_length() - 1)
    search_range = 16 * msb
    entry_selector = msb.bit_length() - 1
    range_shift = 16 * n - search_range
    if poison == "search_range":
        search_range -= 16
        range_shift = 16 * n - search_range
    off = 12 + 16 * n
    directory = b""
    blobs = b""
    head_off = None
    for tag, data in tables:
        cs = _csum(data)
        if poison == "table_sum" and tag == b"cmap":
            cs = (cs + 1) & 0xFFFFFFFF
        if tag == b"head":
            head_off = off
        directory += struct.pack(">4sIII", tag, cs, off, len(data))
        pad = data + b"\x00" * (-len(data) % 4)
        blobs += pad
        off += len(pad)
    font = bytearray(
        struct.pack(">IHHHH", 0x00010000, n, search_range, entry_selector,
                    range_shift) + directory + blobs
    )
    adjustment = (_MAGIC_SUM - _csum(bytes(font))) & 0xFFFFFFFF
    if poison == "font_sum":
        adjustment = (adjustment + 7) & 0xFFFFFFFF
    struct.pack_into(">I", font, head_off + 8, adjustment)
    return bytes(font)


def _map_char(c: int, segs: list[tuple[int, int, int, int, int]],
              data: bytes) -> int:
    """format-4 lookup: first segment with endCode >= c; 0 if unmapped.
    segs rows are (end, start, delta, range_offset, offset_slot_pos)."""
    for end, start, delta, roff, slot in segs:
        if c <= end:
            if c < start:
                return 0
            if roff == 0:
                return (c + delta) & 0xFFFF
            at = slot + roff + 2 * (c - start)
            if at + 2 > len(data):
                raise _SfntError("idRangeOffset beyond subtable")
            (g,) = struct.unpack_from(">H", data, at)
            return (g + delta) & 0xFFFF if g else 0
    return 0


class _SfntError(Exception):
    pass


def parse_ttf(data: bytes | None, chars: str = "") -> dict:
    """Structural parse + char->glyph projection.

    Returns {n_tables, num_glyphs, n_segments, glyph_sum, error}:
    glyph_sum = sum of mapped glyph ids over ``chars`` (0 for unmapped).
    Gates: sfnt version, canonical search fields, per-table checksums
    (head's adjustment zeroed during its sum), whole-font 0xB1B0AFBA,
    head magic, cmap 3/1 format-4 walk with sorted endCodes and the
    0xFFFF sentinel."""
    none = {"n_tables": None, "num_glyphs": None, "n_segments": None,
            "glyph_sum": None}
    if data is None or len(data) < 12:
        return {**none, "error": "short or missing payload"}
    data = bytes(data)
    try:
        ver, n, sr, es, rs = struct.unpack_from(">IHHHH", data, 0)
        if ver != 0x00010000:
            raise _SfntError("bad sfnt version")
        if n == 0 or 12 + 16 * n > len(data):
            raise _SfntError("truncated table directory")
        msb = 1 << (n.bit_length() - 1)
        if sr != 16 * msb or es != msb.bit_length() - 1 or rs != 16 * n - sr:
            raise _SfntError("bad search range")
        tables: dict[bytes, tuple[int, int, int]] = {}
        prev_tag = b""
        for k in range(n):
            tag, cs, off, length = struct.unpack_from(
                ">4sIII", data, 12 + 16 * k)
            if tag <= prev_tag:
                raise _SfntError("table directory not sorted")
            prev_tag = tag
            if off + length > len(data):
                raise _SfntError("table beyond EOF")
            tables[tag] = (cs, off, length)
        if b"head" not in tables or b"cmap" not in tables:
            raise _SfntError("missing required table")
        # per-table checksums; head sums with its adjustment zeroed
        for tag, (cs, off, length) in tables.items():
            blob = data[off:off + length]
            if tag == b"head":
                blob = blob[:8] + b"\x00\x00\x00\x00" + blob[12:]
            if _csum(blob) != cs:
                raise _SfntError("table checksum mismatch")
        hcs, hoff, hlen = tables[b"head"]
        if hlen < 54:
            raise _SfntError("short head table")
        if struct.unpack_from(">I", data, hoff + 12)[0] != _HEAD_MAGIC:
            raise _SfntError("bad head magic")
        (adjustment,) = struct.unpack_from(">I", data, hoff + 8)
        whole = bytearray(data)
        struct.pack_into(">I", whole, hoff + 8, 0)
        if (_csum(bytes(whole)) + adjustment) & 0xFFFFFFFF != _MAGIC_SUM:
            raise _SfntError("font checksum mismatch")
        num_glyphs = None
        if b"maxp" in tables:
            _, moff, mlen = tables[b"maxp"]
            if mlen < 6:
                raise _SfntError("short maxp table")
            (num_glyphs,) = struct.unpack_from(">H", data, moff + 4)
        # cmap: pick the (3, 1) encoding record, require format 4
        _, coff, clen = tables[b"cmap"]
        cver, n_enc = struct.unpack_from(">HH", data, coff)
        sub_off = None
        for k in range(n_enc):
            pid, eid, so = struct.unpack_from(">HHI", data, coff + 4 + 8 * k)
            if (pid, eid) == (3, 1):
                sub_off = coff + so
        if sub_off is None:
            raise _SfntError("no windows unicode cmap")
        fmt, length, _lang = struct.unpack_from(">HHH", data, sub_off)
        if fmt != 4:
            raise _SfntError(f"unsupported cmap format {fmt}")
        seg_x2, _sr, _es, _rs = struct.unpack_from(">HHHH", data,
                                                   sub_off + 6)
        if seg_x2 % 2 or seg_x2 == 0:
            raise _SfntError("bad segCountX2")
        segc = seg_x2 // 2
        ends_at = sub_off + 14
        starts_at = ends_at + seg_x2 + 2  # skip reservedPad
        deltas_at = starts_at + seg_x2
        offs_at = deltas_at + seg_x2
        if offs_at + seg_x2 > len(data):
            raise _SfntError("truncated cmap segments")
        segs = []
        prev_end = -1
        for k in range(segc):
            (end,) = struct.unpack_from(">H", data, ends_at + 2 * k)
            (start,) = struct.unpack_from(">H", data, starts_at + 2 * k)
            (delta,) = struct.unpack_from(">h", data, deltas_at + 2 * k)
            (roff,) = struct.unpack_from(">H", data, offs_at + 2 * k)
            if end <= prev_end:
                raise _SfntError("cmap segments not sorted")
            prev_end = end
            segs.append((end, start, delta, roff, offs_at + 2 * k))
        if segs[-1][0] != 0xFFFF:
            raise _SfntError("cmap missing sentinel")
        glyph_sum = 0
        for ch in chars:
            glyph_sum += _map_char(ord(ch), segs, data)
        return {"n_tables": n, "num_glyphs": num_glyphs,
                "n_segments": segc, "glyph_sum": glyph_sum, "error": None}
    except (_SfntError, struct.error) as e:
        if isinstance(e, struct.error):
            return {**none, "error": "truncated sfnt structure"}
        return {**none, "error": str(e)}


SFNT_FEATURES_SCHEMA = (
    "doc_id long, n_tables int, num_glyphs int, n_segments int, "
    "glyph_sum bigint, error string"
)


def extract_sfnt_features(df: DataFrame, content_col: str = "content",
                          chars_col: str = "chars",
                          id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary, chars:string) -> parsed font rows with the
    char->glyph projection over each row's own query chars."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_ttf(b, c or "")
                    for b, c in zip(pdf[content_col], pdf[chars_col])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_tables": pd.array(
                        [r["n_tables"] for r in rows], dtype="Int32"),
                    "num_glyphs": pd.array(
                        [r["num_glyphs"] for r in rows], dtype="Int32"),
                    "n_segments": pd.array(
                        [r["n_segments"] for r in rows], dtype="Int32"),
                    "glyph_sum": pd.array(
                        [r["glyph_sum"] for r in rows], dtype="Int64"),
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col, chars_col).mapInPandas(
        op, SFNT_FEATURES_SCHEMA
    )
