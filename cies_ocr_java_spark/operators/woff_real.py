"""WOFF 1.0 web-font wrapper: the form fonts actually cross the wire in.

@font-face serves fonts as WOFF — a per-table zlib wrapper around the
sfnt (TTF) format sfnt_real.py walks: a header (``wOFF`` signature, the
wrapped flavor, numTables, the DECLARED reconstructed size
totalSfntSize), a directory of (tag, offset, compLength, origLength,
origChecksum) entries, and per-table data streams that are zlib when
that helps and stored when it would not (compLength == origLength; a
compLength GREATER than origLength is invalid per spec §5).

The reader is a RECONSTRUCTOR: it inflates each table, rebuilds the
original sfnt byte-for-byte (offset table with recomputed canonical
search fields, directory sorted by tag, tables 4-byte padded), verifies
each table's origChecksum and the declared totalSfntSize against what
it actually built, and then hands the reconstruction to
sfnt_real.parse_ttf — so the ENTIRE sfnt gate suite (whole-font
0xB1B0AFBA identity, cmap format-4 walk) re-runs on the rebuilt bytes.
Round trip is exact: build_woff(build_ttf(..)) reconstructs the input
identically. Error rows, never exceptions."""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from cies_ocr_java_spark.operators.sfnt_real import _csum, parse_ttf

__all__ = ["build_woff", "reconstruct_sfnt", "parse_woff",
           "extract_woff_features", "WOFF_FEATURES_SCHEMA"]

_WOFF_HDR = struct.Struct(">4sIIHHIHHIIIII")
_WOFF_ENTRY = struct.Struct(">4sIIII")
_SFNT_ENTRY = struct.Struct(">4sIII")


def build_woff(sfnt: bytes, *, poison: str | None = None) -> bytes:
    """Wrap a real sfnt into WOFF 1.0: per-table zlib (stored when
    compression does not shrink), directory in sfnt order, declared
    totalSfntSize. ``poison``: ``signature`` (wOFX), ``sfnt_size``
    (declared size off by 4), ``orig_checksum`` (first entry's
    checksum flipped), ``overlong`` (first table's compLength >
    origLength)."""
    ver, n, _sr, _es, _rs = struct.unpack_from(">IHHHH", sfnt, 0)
    tables = []
    for k in range(n):
        tag, cs, off, ln = _SFNT_ENTRY.unpack_from(sfnt, 12 + 16 * k)
        tables.append((tag, cs, sfnt[off:off + ln]))
    total_sfnt = 12 + 16 * n + sum(
        len(d) + (-len(d) % 4) for _, _, d in tables)
    if poison == "sfnt_size":
        total_sfnt += 4
    entries = b""
    blobs = b""
    data_at = _WOFF_HDR.size + _WOFF_ENTRY.size * n
    first = True
    for tag, cs, data in tables:
        comp = zlib.compress(data, 9)
        blob = comp if len(comp) < len(data) else data
        comp_len = len(blob)
        if poison == "overlong" and first:
            blob = data + b"\x00\x00"
            comp_len = len(blob)
        if poison == "orig_checksum" and first:
            cs ^= 0xFF
        first = False
        entries += _WOFF_ENTRY.pack(tag, data_at, comp_len, len(data), cs)
        pad = blob + b"\x00" * (-len(blob) % 4)
        blobs += pad
        data_at += len(pad)
    sig = b"wOFX" if poison == "signature" else b"wOFF"
    hdr = _WOFF_HDR.pack(sig, ver, _WOFF_HDR.size + len(entries)
                         + len(blobs), n, 0, total_sfnt, 1, 0,
                         0, 0, 0, 0, 0)
    return hdr + entries + blobs


class _WoffError(Exception):
    pass


def reconstruct_sfnt(data: bytes) -> bytes:
    """WOFF -> original sfnt bytes, verifying as it goes (signature,
    reserved field, per-table inflate + origLength + origChecksum,
    declared totalSfntSize)."""
    if len(data) < _WOFF_HDR.size:
        raise _WoffError("truncated woff header")
    (sig, flavor, length, n, reserved, total_sfnt, _maj, _min,
     _mo, _ml, _mol, _po, _pl) = _WOFF_HDR.unpack_from(data, 0)
    if sig != b"wOFF":
        raise _WoffError("bad woff signature")
    if reserved != 0:
        raise _WoffError("reserved field set")
    if length != len(data):
        raise _WoffError("declared length mismatch")
    if _WOFF_HDR.size + _WOFF_ENTRY.size * n > len(data):
        raise _WoffError("truncated woff directory")
    tables = []
    for k in range(n):
        tag, off, comp_len, orig_len, cs = _WOFF_ENTRY.unpack_from(
            data, _WOFF_HDR.size + _WOFF_ENTRY.size * k)
        if comp_len > orig_len:
            raise _WoffError("compressed longer than original")
        if off + comp_len > len(data):
            raise _WoffError("table beyond eof")
        blob = data[off:off + comp_len]
        if comp_len == orig_len:
            raw = blob
        else:
            try:
                raw = zlib.decompress(blob)
            except zlib.error as e:
                raise _WoffError(f"table inflate failed: {e}") from None
        if len(raw) != orig_len:
            raise _WoffError("origLength mismatch")
        # the sfnt rule carries over: head's checkSumAdjustment is
        # zeroed during its own checksum (spec: directory checksums are
        # computed before the adjustment is written)
        check = raw
        if tag == b"head" and len(raw) >= 12:
            check = raw[:8] + b"\x00\x00\x00\x00" + raw[12:]
        if _csum(check) != cs:
            raise _WoffError("origChecksum mismatch")
        tables.append((tag, cs, raw))
    # rebuild: canonical search fields from numTables, directory in
    # the woff order (which preserved sfnt order = sorted tags)
    msb = 1 << (max(n, 1).bit_length() - 1)
    sr, es, rs = 16 * msb, msb.bit_length() - 1, 16 * n - 16 * msb
    out = bytearray(struct.pack(">IHHHH", flavor, n, sr, es, rs))
    off = 12 + 16 * n
    body = bytearray()
    for tag, cs, raw in tables:
        out += _SFNT_ENTRY.pack(tag, cs, off, len(raw))
        pad = raw + b"\x00" * (-len(raw) % 4)
        body += pad
        off += len(pad)
    out += body
    if len(out) != total_sfnt:
        raise _WoffError("totalSfntSize mismatch")
    return bytes(out)


def parse_woff(data: bytes | None, chars: str = "") -> dict:
    """Reconstruct + full sfnt re-verification (parse_ttf). Returns the
    sfnt feature row plus the woff envelope's table count."""
    none = {"n_tables": None, "num_glyphs": None, "n_segments": None,
            "glyph_sum": None}
    if data is None or len(data) < _WOFF_HDR.size:
        return {**none, "error": "short or missing payload"}
    try:
        sfnt = reconstruct_sfnt(bytes(data))
    except _WoffError as e:
        return {**none, "error": str(e)}
    except struct.error:
        return {**none, "error": "truncated woff structure"}
    return parse_ttf(sfnt, chars)


WOFF_FEATURES_SCHEMA = (
    "doc_id long, n_tables int, num_glyphs int, n_segments int, "
    "glyph_sum bigint, error string"
)


def extract_woff_features(df: DataFrame, content_col: str = "content",
                          chars_col: str = "chars",
                          id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary, chars) -> reconstructed-font rows."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_woff(b, c or "")
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
        op, WOFF_FEATURES_SCHEMA
    )
