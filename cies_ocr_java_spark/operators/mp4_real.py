"""REAL MP4 / ISO-BMFF container walker on stdlib struct — the video
container format of the web (ISO/IEC 14496-12).

An ISO-BMFF file is a tree of length-prefixed boxes: ``size:uint32-BE +
type:4cc``, where size==1 escapes to a 64-bit largesize and size==0 means
"to end of file".  Container boxes (``moov``/``trak``/``mdia``/``minf``/
``stbl``) hold child boxes; leaf boxes hold binary payloads.  Sample DATA
lives in ``mdat``; the index that makes it randomly accessible lives in the
``stbl`` sample tables: ``stts`` (decode deltas), ``stsz`` (per-sample
sizes), ``stsc`` (sample->chunk map), ``stco`` (chunk file offsets).  The
reader below is the same trust-then-verify discipline as the PDF xref walk
(operators/pdf_real.py): every declared size/offset is bounds-checked
against its parent before use, and every sample is actually READ back out
of ``mdat`` through stco+stsz (proving the random-access path, the
container analog of decoding pixels instead of trusting headers).

Writer (``build_mp4``) emits a genuine progressive-download layout:
``ftyp`` + ``mdat`` + trailing ``moov`` whose chunk offsets point back
into the already-written mdat — the structure ffmpeg/mp4box produce for
streaming-unfriendly ("moov at end") files.  Deterministic fields keep
output byte-stable for the closed-form oracles.

Failure contract (the MediaCodec discipline, multimodal.py): every
malformed payload yields an error ROW — never an exception out of the
parser.  Fuzz tests pin this.

Reference parity: the reference's media path hands bytes to Textract and
never inspects containers (DocumentExtractManager.java:463-599 consumes
Textract's output); container structure is exactly what a Spark-native
pipeline must recover itself.  Beyond-reference operator.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from cies_ocr_java_spark.operators.multimodal import MediaCodec

_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")

# container boxes we recurse into (full set the subset writer can emit,
# plus the usual suspects so real files don't confuse the walk)
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts",
               b"udta", b"mvex"}

MP4_TIMESCALE = 600  # movie + media timescale the writer uses


def _box(btype: bytes, payload: bytes) -> bytes:
    return _U32.pack(8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


def build_mp4(n_frames: int, delta: int, value: int,
              width: int = 16, height: int = 16) -> bytes:
    """Emit a real single-track ISO-BMFF file: ftyp + mdat (frame k is
    ``3 + k%3`` bytes of value+k) + moov with mvhd/tkhd/mdhd/hdlr/stbl
    whose stco offsets index the mdat that was already written.  All
    durations are in MP4_TIMESCALE units (``delta`` per frame)."""
    if n_frames <= 0 or delta <= 0:
        raise ValueError("n_frames and delta must be positive")
    if not 0 <= value <= 249:
        raise ValueError("value must leave headroom for value+k byte fill")
    ftyp = _box(b"ftyp", b"isom" + _U32.pack(0x200) + b"isom" + b"mp41")
    sizes = [3 + k % 3 for k in range(n_frames)]
    frames = [bytes([value + k]) * sizes[k] for k in range(n_frames)]
    mdat = _box(b"mdat", b"".join(frames))
    # one chunk per sample: offsets into the file as finally laid out
    data_start = len(ftyp) + 8
    offsets, off = [], data_start
    for s in sizes:
        offsets.append(off)
        off += s
    dur = n_frames * delta

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0x5AB1, 0x5AB1, MP4_TIMESCALE, dur)
        + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + _U32.pack(2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0x5AB1, 0x5AB1, 1, 0, dur) + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0x5AB1, 0x5AB1, MP4_TIMESCALE, dur)
        + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0,
                 _U32.pack(0) + b"vide" + b"\x00" * 12 + b"raw video\x00")
    # stsd: one opaque 'raw ' visual sample entry (header-only subset)
    entry = _box(b"raw ", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                 + struct.pack(">HH", width, height) + b"\x00" * 50)
    stsd = _full(b"stsd", 0, 0, _U32.pack(1) + entry)
    stts = _full(b"stts", 0, 0,
                 _U32.pack(1) + struct.pack(">II", n_frames, delta))
    stsc = _full(b"stsc", 0, 0, _U32.pack(1) + struct.pack(">III", 1, 1, 1))
    stsz = _full(b"stsz", 0, 0, _U32.pack(0) + _U32.pack(n_frames)
                 + b"".join(_U32.pack(s) for s in sizes))
    stco = _full(b"stco", 0, 0, _U32.pack(n_frames)
                 + b"".join(_U32.pack(o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, start: int, end: int,
          depth: int = 0) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, payload_start, payload_end) for each box in
    [start, end); recurse into containers.  Raises ValueError on any
    bound violation — callers convert to error rows."""
    if depth > 16:
        raise ValueError("box nesting too deep")
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size = _U32.unpack_from(data, pos)[0]
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 0:
            size = end - pos
        elif size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize")
            size = _U64.unpack_from(data, pos + 8)[0]
            body = pos + 16
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"box {btype!r} overruns parent ({size} bytes at {pos})"
            )
        yield btype, body, pos + size
        if btype in _CONTAINERS:
            yield from _walk(data, body, pos + size, depth + 1)
        pos += size


_MP4_NONE = {"brand": None, "duration_ms": None, "n_tracks": None,
             "n_samples": None, "width": None, "height": None,
             "payload_sum": None}


def parse_mp4(data: bytes | None) -> dict:
    """Structural decode of the ISO-BMFF subset: box tree walk, ftyp
    brand, mvhd timescale->duration_ms, trak count, tkhd 16.16 dims, and
    the full sample-table resolution — stsz sizes + stco offsets verified
    against stts counts and file bounds, every sample READ from mdat and
    byte-summed (payload_sum).  Returns an error row for every malformed
    payload."""
    if data is None or len(data) < 16:
        return {**_MP4_NONE, "error": "short or missing payload"}
    data = bytes(data)
    if data[4:8] != b"ftyp":
        return {**_MP4_NONE, "error": "missing ftyp"}
    try:
        boxes = list(_walk(data, 0, len(data)))
    except ValueError as e:
        return {**_MP4_NONE, "error": str(e)}
    brand = data[boxes[0][1]:boxes[0][1] + 4].decode("latin-1")
    timescale = duration = None
    n_tracks = 0
    width = height = None
    # per-stbl sample tables, in document order
    stts_total: list[int] = []
    sizes_per: list[list[int]] = []
    offs_per: list[list[int]] = []
    for btype, b0, b1 in boxes:
        body = data[b0:b1]
        if btype == b"mvhd":
            if len(body) < 20:
                return {**_MP4_NONE, "error": "truncated mvhd"}
            timescale, duration = struct.unpack_from(">II", body, 12)
            if timescale == 0:
                return {**_MP4_NONE, "error": "zero timescale"}
        elif btype == b"trak":
            n_tracks += 1
        elif btype == b"tkhd" and width is None:
            if len(body) < 84:
                return {**_MP4_NONE, "error": "truncated tkhd"}
            w16, h16 = struct.unpack_from(">II", body, 76)
            width, height = w16 >> 16, h16 >> 16
        elif btype == b"stts":
            if len(body) < 8:
                return {**_MP4_NONE, "error": "truncated stts"}
            n_ent = _U32.unpack_from(body, 4)[0]
            if len(body) < 8 + 8 * n_ent:
                return {**_MP4_NONE, "error": "stts entries out of bounds"}
            stts_total.append(sum(
                _U32.unpack_from(body, 8 + 8 * i)[0] for i in range(n_ent)
            ))
        elif btype == b"stsz":
            if len(body) < 12:
                return {**_MP4_NONE, "error": "truncated stsz"}
            fixed, cnt = struct.unpack_from(">II", body, 4)
            if fixed:
                sizes_per.append([fixed] * cnt)
            else:
                if len(body) < 12 + 4 * cnt:
                    return {**_MP4_NONE,
                            "error": "stsz entries out of bounds"}
                sizes_per.append([
                    _U32.unpack_from(body, 12 + 4 * i)[0] for i in range(cnt)
                ])
        elif btype == b"stco":
            if len(body) < 8:
                return {**_MP4_NONE, "error": "truncated stco"}
            cnt = _U32.unpack_from(body, 4)[0]
            if len(body) < 8 + 4 * cnt:
                return {**_MP4_NONE, "error": "stco entries out of bounds"}
            offs_per.append([
                _U32.unpack_from(body, 8 + 4 * i)[0] for i in range(cnt)
            ])
    if timescale is None:
        return {**_MP4_NONE, "error": "missing moov/mvhd"}
    if not (len(stts_total) == len(sizes_per) == len(offs_per) == n_tracks):
        return {**_MP4_NONE, "error": "incomplete sample tables"}
    n_samples = 0
    payload_sum = 0
    for tot, sizes, offs in zip(stts_total, sizes_per, offs_per):
        if not (tot == len(sizes) == len(offs)):
            return {**_MP4_NONE, "error": "sample table count mismatch"}
        for s, o in zip(sizes, offs):
            if o + s > len(data):
                return {**_MP4_NONE, "error": "sample outside file"}
            payload_sum += sum(data[o:o + s])
        n_samples += tot
    return {
        "brand": brand,
        "duration_ms": duration * 1000 // timescale,
        "n_tracks": n_tracks,
        "n_samples": n_samples,
        "width": width,
        "height": height,
        "payload_sum": payload_sum,
        "error": None,
    }


def iter_mp4_samples(data: bytes | None) -> list[dict]:
    """Per-sample random access through stco+stsz: (sample_idx, offset,
    size, byte_sum) for the FIRST track — the frame-sampling surface.
    Malformed payloads yield a single error row (sample_idx NULL)."""
    meta = parse_mp4(data)
    if meta["error"] is not None:
        return [{"sample_idx": None, "offset": None, "size": None,
                 "byte_sum": None, "error": meta["error"]}]
    data = bytes(data)
    rows = []
    # re-walk only the first track's stsz/stco (parse_mp4 validated them)
    sizes: list[int] | None = None
    offs: list[int] | None = None
    for btype, b0, b1 in _walk(data, 0, len(data)):
        body = data[b0:b1]
        if btype == b"stsz" and sizes is None:
            fixed, cnt = struct.unpack_from(">II", body, 4)
            sizes = ([fixed] * cnt if fixed else
                     [_U32.unpack_from(body, 12 + 4 * i)[0]
                      for i in range(cnt)])
        elif btype == b"stco" and offs is None:
            cnt = _U32.unpack_from(body, 4)[0]
            offs = [_U32.unpack_from(body, 8 + 4 * i)[0]
                    for i in range(cnt)]
    for k, (s, o) in enumerate(zip(sizes or [], offs or [])):
        rows.append({"sample_idx": k, "offset": o, "size": s,
                     "byte_sum": sum(data[o:o + s]), "error": None})
    return rows


class Mp4Codec(MediaCodec):
    """Real video-container decode for the ISO-BMFF subset — registered
    as 'mp4' in the MediaCodec registry (multimodal.py). Frames report
    through n_frames; width/height from tkhd; mime video/mp4."""

    name = "mp4"

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        rows = [parse_mp4(b) for b in content]
        ok = [r["error"] is None for r in rows]
        return pd.DataFrame(
            {
                "width": pd.array(
                    [r["width"] for r in rows], dtype="Int32"),
                "height": pd.array(
                    [r["height"] for r in rows], dtype="Int32"),
                "n_frames": pd.array(
                    [r["n_samples"] for r in rows], dtype="Int32"),
                "mime": ["video/mp4" if o else None for o in ok],
                "error": [r["error"] for r in rows],
            },
            index=content.index,
        )


MP4_FEATURES_SCHEMA = (
    "doc_id long, brand string, duration_ms bigint, n_tracks int, "
    "n_samples int, width int, height int, payload_sum bigint, "
    "error string"
)

MP4_SAMPLES_SCHEMA = (
    "doc_id long, sample_idx int, offset int, size int, byte_sum bigint, "
    "error string"
)


def extract_mp4_features(df: DataFrame, content_col: str = "content",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> container metadata + verified sample sums
    via one Arrow-batched mapInPandas pass (no shuffle)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_mp4(b) for b in pdf[content_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "brand": [r["brand"] for r in rows],
                "duration_ms": pd.array(
                    [r["duration_ms"] for r in rows], dtype="Int64"),
                "n_tracks": pd.array(
                    [r["n_tracks"] for r in rows], dtype="Int32"),
                "n_samples": pd.array(
                    [r["n_samples"] for r in rows], dtype="Int32"),
                "width": pd.array(
                    [r["width"] for r in rows], dtype="Int32"),
                "height": pd.array(
                    [r["height"] for r in rows], dtype="Int32"),
                "payload_sum": pd.array(
                    [r["payload_sum"] for r in rows], dtype="Int64"),
                "error": [r["error"] for r in rows],
            })

    return df.select(id_col, content_col).mapInPandas(
        op, MP4_FEATURES_SCHEMA)


def extract_mp4_samples(df: DataFrame, content_col: str = "content",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> one row per sample read back through
    stco+stsz — REAL frame sampling over a real container; one
    mapInPandas pass, no shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "sample_idx": [], "offset": [],
                   "size": [], "byte_sum": [], "error": []}
            for i, b in zip(pdf[id_col], pdf[content_col]):
                for r in iter_mp4_samples(b):
                    out["doc_id"].append(int(i))
                    out["sample_idx"].append(r["sample_idx"])
                    out["offset"].append(r["offset"])
                    out["size"].append(r["size"])
                    out["byte_sum"].append(r["byte_sum"])
                    out["error"].append(r["error"])
            yield pd.DataFrame({
                "doc_id": pd.array(out["doc_id"], dtype="int64"),
                "sample_idx": pd.array(out["sample_idx"], dtype="Int32"),
                "offset": pd.array(out["offset"], dtype="Int32"),
                "size": pd.array(out["size"], dtype="Int32"),
                "byte_sum": pd.array(out["byte_sum"], dtype="Int64"),
                "error": out["error"],
            })

    return df.select(id_col, content_col).mapInPandas(
        op, MP4_SAMPLES_SCHEMA)


# register on import (multimodal's dispatch imports this module lazily)
from cies_ocr_java_spark.operators.multimodal import register_codec  # noqa: E402

register_codec(Mp4Codec())
