"""Multimodal (image/audio/video) column handling.

Media payloads are opaque ``binary`` columns with typed metadata, processed
via Arrow-batched ``mapInPandas``. The decode step goes through the
``MediaCodec`` interface (below): the shipped implementations are the
deterministic ``StubCodec`` (no image/audio libraries exist in this
environment — SURVEY.md §7.0) and the ``NativeCodec`` placeholder that
raises until a real PIL/ffmpeg-backed codec is registered on a cluster
that has the libraries. The Spark-side plumbing — schema, batching,
partitioning, failure rows — is real and identical for every codec.

At scale: media bytes never leave the executor as Python objects row-by-row
— Arrow ships whole batches, batch size bounded by
spark.sql.execution.arrow.maxRecordsPerBatch (session.py) so a 4K-video row
cannot blow the heap.
"""

from __future__ import annotations

import struct
from abc import ABC, abstractmethod
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_FEATURES_SCHEMA = (
    "media_ref string, n_bytes long, width int, height int, n_frames int, "
    "mime string, error string"
)


class MediaCodec(ABC):
    """The codec contract: one Arrow batch of payloads in, one metadata
    frame out.

    ``decode_batch`` receives a pandas Series of ``bytes | None`` and MUST
    return a DataFrame with columns (width, height, n_frames, mime, error),
    one row per input IN ORDER. A payload that fails to decode produces a
    FAILURE ROW — null metadata, ``error`` set — never an exception: on a
    100 TB crawl one corrupt JPEG must not kill the task. Raising is
    reserved for environment faults (the codec's library is missing),
    which is a configuration error, not a data error."""

    name: str = "abstract"

    @abstractmethod
    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        ...


class StubCodec(MediaCodec):
    """Deterministic pseudo-decode: metadata derived from payload size.
    Stands in for a real codec so plumbing/partitioning/batching/failure
    rows are testable in a no-libs environment."""

    name = "stub"

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        n = content.map(lambda b: len(b) if b is not None else -1).astype("int64")
        missing = n < 0
        nb = n.clip(lower=0)
        out = pd.DataFrame(
            {
                "width": (nb % 640).astype("Int32"),
                "height": ((nb * 7) % 480).astype("Int32"),
                "n_frames": (1 + nb % 5).astype("Int32"),
                "mime": "application/octet-stream",
                "error": pd.Series([None] * len(n), dtype="object"),
            },
            index=content.index,
        )
        out.loc[missing, ["width", "height", "n_frames"]] = pd.NA
        out.loc[missing, "mime"] = None
        out.loc[missing, "error"] = "missing payload"
        return out


class NativeCodec(MediaCodec):
    """REAL codec hook — register a PIL/ffmpeg-backed implementation under
    this name on a cluster that ships the libraries. Unavailable here."""

    name = "native"

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this environment; register a real MediaCodec as 'native' or "
            "use the 'stub' codec"
        )


# ---------------------------------------------------------------------------
# REAL codec: uncompressed 24-bit BMP via stdlib struct (round-2 verdict #3)
# ---------------------------------------------------------------------------

_BMP_FILE_HDR = struct.Struct("<2sIHHI")   # magic, file size, res, res, data offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def build_bmp(width: int, height: int, value: int) -> bytes:
    """Emit a REAL uncompressed 24-bit BI_RGB BMP (BITMAPINFOHEADER),
    every pixel the solid gray (value, value, value). Rows bottom-up,
    4-byte padded — any image viewer opens these files."""
    if width <= 0 or height <= 0 or not (0 <= value <= 255):
        raise ValueError("bad bmp dimensions/value")
    stride = (width * 3 + 3) // 4 * 4
    row = bytes([value]) * (width * 3) + b"\x00" * (stride - width * 3)
    pixels = row * height
    off = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    return (
        _BMP_FILE_HDR.pack(b"BM", off + len(pixels), 0, 0, off)
        + _BMP_INFO_HDR.pack(40, width, height, 1, 24, 0, len(pixels),
                             2835, 2835, 0, 0)
        + pixels
    )


def decode_bmp(data: bytes | None) -> dict:
    """Structural decode of the 24-bit uncompressed BMP subset.

    Returns {width, height, ink_sum, error}: ink_sum is the exact integer
    sum of all PIXEL bytes (padding excluded) — the 'ink stats' the
    feature extractor exposes. Every malformed payload yields an error
    row, never an exception (the MediaCodec failure contract)."""
    none = {"width": None, "height": None, "ink_sum": None}
    if data is None or len(data) < _BMP_FILE_HDR.size + _BMP_INFO_HDR.size:
        return {**none, "error": "short or missing payload"}
    data = bytes(data)
    magic, _fsize, _r1, _r2, off = _BMP_FILE_HDR.unpack_from(data, 0)
    if magic != b"BM":
        return {**none, "error": "bad magic"}
    (hsize, w, h, planes, bpp, comp, _isize, _xppm, _yppm, _clr, _imp) = (
        _BMP_INFO_HDR.unpack_from(data, _BMP_FILE_HDR.size)
    )
    if hsize < 40:
        return {**none, "error": "bad info header size"}
    if planes != 1 or comp != 0:
        return {**none, "error": "unsupported planes/compression"}
    if bpp != 24:
        return {**none, "error": f"unsupported bpp {bpp}"}
    if w <= 0 or h == 0 or off < _BMP_FILE_HDR.size + hsize or off > len(data):
        return {**none, "error": "bad dimensions or data offset"}
    rows = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if off + stride * rows > len(data):
        return {**none, "error": "truncated pixel data"}
    ink = 0
    for r in range(rows):
        start = off + r * stride
        ink += sum(data[start:start + w * 3])
    return {"width": w, "height": rows, "ink_sum": ink, "error": None}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def build_png(width: int, height: int, value: int) -> bytes:
    """Emit a REAL 8-bit grayscale PNG of one solid level (see
    build_png_pixels — this is the solid-image special case the
    closed-form oracles use)."""
    if width <= 0 or height <= 0 or not (0 <= value <= 255):
        raise ValueError("bad png dimensions/value")
    return build_png_pixels(
        [bytes([value]) * width for _ in range(height)]
    )


def build_png_pixels(rows) -> bytes:
    """Emit a REAL 8-bit grayscale PNG from arbitrary pixel rows
    (list of equal-length byte rows, or a 2-D uint8 array): signature,
    IHDR, one zlib-compressed IDAT, IEND — every chunk with its correct
    CRC32. Scanline filters CYCLE through all five spec types
    (None/Sub/Up/Average/Paeth by row index), so a decoder must
    implement the whole filter suite. Any image viewer opens these
    files."""
    import zlib

    rows = [bytes(bytearray(r)) for r in rows]
    if not rows or not rows[0] or any(len(r) != len(rows[0]) for r in rows):
        raise ValueError("bad png pixel rows")
    width, height = len(rows[0]), len(rows)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width)  # the row above row 0 is all zeros per spec
    for y in range(height):
        row = rows[y]
        ft = y % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += row
        elif ft == 1:  # Sub: x - left
            left = 0
            for x in row:
                raw.append((x - left) & 0xFF)
                left = x
        elif ft == 2:  # Up: x - above
            raw += bytes((x - b) & 0xFF for x, b in zip(row, prev))
        elif ft == 3:  # Average: x - (left+above)//2
            left = 0
            for x, b in zip(row, prev):
                raw.append((x - (left + b) // 2) & 0xFF)
                left = x
        else:  # Paeth
            left = 0
            ul = 0
            for x, b in zip(row, prev):
                p = left + b - ul
                pa, pb, pc = abs(p - left), abs(p - b), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else ul
                )
                raw.append((x - pred) & 0xFF)
                ul = b
                left = x
        prev = row
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes | None) -> dict:
    """Structural decode of the 8-bit grayscale PNG subset: signature,
    chunk walk with CRC32 VERIFICATION per chunk, IHDR format gates,
    IDAT concatenation + zlib inflate, and full scanline unfiltering
    (None/Sub/Up/Average/Paeth). Returns {width, height, ink_sum,
    error}; every malformed payload yields an error row."""
    r = _decode_png_impl(data, want_pixels=False)
    return {k: r[k] for k in ("width", "height", "ink_sum", "error")}


def decode_png_pixels(data: bytes | None) -> dict:
    """decode_png, but returning the reconstructed pixel BYTES
    (row-major) instead of just the ink sum — the image-consuming
    operators' entry point (glyph OCR reads these)."""
    r = _decode_png_impl(data, want_pixels=True)
    return {k: r[k] for k in ("width", "height", "pixels", "error")}


def _decode_png_impl(data: bytes | None, want_pixels: bool) -> dict:
    import zlib

    none = {"width": None, "height": None, "ink_sum": None, "pixels": None}
    if data is None or len(data) < len(_PNG_SIG) + 12:
        return {**none, "error": "short or missing payload"}
    data = bytes(data)
    if not data.startswith(_PNG_SIG):
        return {**none, "error": "bad png signature"}
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos + 12 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + clen]
        # the 4 CRC bytes must also fit — a chunk clipped inside its
        # body OR its trailer is the same truncation failure
        if len(body) != clen or pos + 12 + clen > len(data):
            return {**none, "error": "truncated chunk"}
        (crc,) = struct.unpack_from(">I", data, pos + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            return {**none, "error": f"crc mismatch in {ctype.decode('latin1')}"}
        if ctype == b"IHDR":
            if clen != 13:
                return {**none, "error": "bad IHDR length"}
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + clen
    if ihdr is None or not idat or not seen_end:
        return {**none, "error": "missing IHDR/IDAT/IEND"}
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    if depth != 8 or ctype_i != 0:
        return {**none, "error": f"unsupported depth/colortype {depth}/{ctype_i}"}
    if comp != 0 or filt != 0 or interlace != 0:
        return {**none, "error": "unsupported compression/filter/interlace"}
    if w <= 0 or h <= 0:
        return {**none, "error": "bad dimensions"}
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        return {**none, "error": f"idat inflate failed: {e}"}
    if len(raw) != h * (w + 1):
        return {**none, "error": "scanline data size mismatch"}
    ink = 0
    px = bytearray() if want_pixels else None
    prev = bytes(w)
    for y in range(h):
        ft = raw[y * (w + 1)]
        line = raw[y * (w + 1) + 1:(y + 1) * (w + 1)]
        out = bytearray(w)
        if ft == 0:
            out[:] = line
        elif ft == 1:
            left = 0
            for i, v in enumerate(line):
                left = (v + left) & 0xFF
                out[i] = left
        elif ft == 2:
            for i, v in enumerate(line):
                out[i] = (v + prev[i]) & 0xFF
        elif ft == 3:
            left = 0
            for i, v in enumerate(line):
                left = (v + (left + prev[i]) // 2) & 0xFF
                out[i] = left
        elif ft == 4:
            left = 0
            ul = 0
            for i, v in enumerate(line):
                b = prev[i]
                p = left + b - ul
                pa, pb, pc = abs(p - left), abs(p - b), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else ul
                )
                left = (v + pred) & 0xFF
                out[i] = left
                ul = b
        else:
            return {**none, "error": f"unknown filter type {ft}"}
        ink += sum(out)
        if px is not None:
            px += out
        prev = bytes(out)
    return {"width": w, "height": h, "ink_sum": ink,
            "pixels": bytes(px) if px is not None else None, "error": None}


class PngCodec(MediaCodec):
    """Real decode for the 8-bit grayscale PNG subset — the COMPRESSED
    image format (zlib IDAT + five-filter scanline reconstruction + CRC
    verification), one step beyond BMP's raw pixels. Registered 'png'."""

    name = "png"

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        rows = [decode_png(b) for b in content]
        ok = [r["error"] is None for r in rows]
        return pd.DataFrame(
            {
                "width": pd.array([r["width"] for r in rows], dtype="Int32"),
                "height": pd.array([r["height"] for r in rows], dtype="Int32"),
                "n_frames": pd.array(
                    [1 if o else None for o in ok], dtype="Int32"
                ),
                "mime": ["image/png" if o else None for o in ok],
                "error": [r["error"] for r in rows],
            },
            index=content.index,
        )


def extract_png_features(df: DataFrame, content_col: str = "content",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> decoded width/height/ink rows via one
    Arrow-batched mapInPandas pass (shares BMP_FEATURES_SCHEMA — same
    feature shape, different codec)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_png(b) for b in pdf[content_col]]
            ok = [r["error"] is None for r in rows]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.array(
                        [r["width"] for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r["height"] for r in rows], dtype="Int32"
                    ),
                    "mime": ["image/png" if o else None for o in ok],
                    "ink_sum": pd.array(
                        [r["ink_sum"] for r in rows], dtype="Int64"
                    ),
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(op, BMP_FEATURES_SCHEMA)


_WAV_RIFF = struct.Struct("<4sI4s")      # 'RIFF', chunk size, 'WAVE'
_WAV_FMT = struct.Struct("<HHIIHH")      # audio fmt, ch, rate, byterate, align, bits


def build_wav(n_samples: int, sample_rate: int, amplitude: int,
              channels: int = 1) -> bytes:
    """Emit a REAL PCM WAV (RIFF/fmt/data chunks, 16-bit little-endian),
    every sample the constant ``amplitude`` — any audio player opens it."""
    if n_samples <= 0 or channels <= 0 or not (-32768 <= amplitude <= 32767):
        raise ValueError("bad wav parameters")
    frame = struct.pack("<h", amplitude) * channels
    data = frame * n_samples
    fmt = _WAV_FMT.pack(1, channels, sample_rate,
                        sample_rate * channels * 2, channels * 2, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _WAV_RIFF.pack(b"RIFF", 4 + len(body), b"WAVE") + body


def decode_wav(data: bytes | None) -> dict:
    """Structural decode of the 16-bit PCM WAV subset: RIFF header, chunk
    walk to fmt/data (unknown chunks skipped by size, word-aligned),
    format gates, sample arithmetic, and the exact integer sum of
    absolute sample values (the audio 'ink'). Malformed -> error row."""
    none = {"channels": None, "sample_rate": None, "n_samples": None,
            "abs_sum": None}
    if data is None or len(data) < _WAV_RIFF.size:
        return {**none, "error": "short or missing payload"}
    data = bytes(data)
    riff, _size, wave = _WAV_RIFF.unpack_from(data, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        return {**none, "error": "bad riff header"}
    pos, fmt, pcm = _WAV_RIFF.size, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            return {**none, "error": "truncated chunk"}
        if cid == b"fmt ":
            if clen < _WAV_FMT.size:
                return {**none, "error": "short fmt chunk"}
            fmt = _WAV_FMT.unpack_from(body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        return {**none, "error": "missing fmt or data chunk"}
    audio_fmt, channels, rate, _br, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        return {**none, "error": f"unsupported format {audio_fmt}/{bits}bit"}
    if channels <= 0 or rate <= 0:
        return {**none, "error": "bad channel/rate"}
    frame = channels * 2
    if len(pcm) % frame:
        return {**none, "error": "partial frame in data chunk"}
    n = len(pcm) // frame
    samples = struct.unpack(f"<{len(pcm) // 2}h", pcm)
    return {
        "channels": channels, "sample_rate": rate, "n_samples": n,
        "abs_sum": sum(abs(s) for s in samples), "error": None,
    }


class WavCodec(MediaCodec):
    """Real audio decode for the 16-bit PCM WAV subset (stdlib struct).
    Maps into the generic codec schema: width=sample_rate,
    height=channels, n_frames=n_samples (the schema's closest typed
    slots — documented, deterministic). Registered as 'wav'."""

    name = "wav"

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        rows = [decode_wav(b) for b in content]
        ok = [r["error"] is None for r in rows]
        return pd.DataFrame(
            {
                "width": pd.array(
                    [r["sample_rate"] for r in rows], dtype="Int32"
                ),
                "height": pd.array(
                    [r["channels"] for r in rows], dtype="Int32"
                ),
                "n_frames": pd.array(
                    [r["n_samples"] for r in rows], dtype="Int32"
                ),
                "mime": ["audio/wav" if o else None for o in ok],
                "error": [r["error"] for r in rows],
            },
            index=content.index,
        )


WAV_FEATURES_SCHEMA = (
    "doc_id long, channels int, sample_rate int, n_samples int, "
    "abs_sum long, error string"
)


def extract_wav_features(df: DataFrame, content_col: str = "content",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> decoded PCM stats via one Arrow-batched
    mapInPandas pass (abs_sum needs the sample bytes, which the generic
    codec schema does not carry)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_wav(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "channels": pd.array(
                        [r["channels"] for r in rows], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [r["sample_rate"] for r in rows], dtype="Int32"
                    ),
                    "n_samples": pd.array(
                        [r["n_samples"] for r in rows], dtype="Int32"
                    ),
                    "abs_sum": pd.array(
                        [r["abs_sum"] for r in rows], dtype="Int64"
                    ),
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(op, WAV_FEATURES_SCHEMA)


class BmpCodec(MediaCodec):
    """Real image decode for the uncompressed 24-bit BMP subset — proves
    the MediaCodec interface with genuine bytes (stdlib struct, no
    external libraries). Registered as 'bmp'."""

    name = "bmp"

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        rows = [decode_bmp(b) for b in content]
        ok = [r["error"] is None for r in rows]
        return pd.DataFrame(
            {
                "width": pd.array([r["width"] for r in rows], dtype="Int32"),
                "height": pd.array([r["height"] for r in rows], dtype="Int32"),
                "n_frames": pd.array(
                    [1 if o else None for o in ok], dtype="Int32"
                ),
                "mime": ["image/bmp" if o else None for o in ok],
                "error": [r["error"] for r in rows],
            },
            index=content.index,
        )


BMP_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, mime string, ink_sum long, "
    "error string"
)


def extract_bmp_features(df: DataFrame, content_col: str = "content",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> real decoded width/height/ink rows via one
    Arrow-batched mapInPandas pass (the ink statistic needs the pixel
    bytes, which the generic 5-column codec schema does not carry)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_bmp(b) for b in pdf[content_col]]
            ok = [r["error"] is None for r in rows]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.array(
                        [r["width"] for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r["height"] for r in rows], dtype="Int32"
                    ),
                    "mime": ["image/bmp" if o else None for o in ok],
                    "ink_sum": pd.array(
                        [r["ink_sum"] for r in rows], dtype="Int64"
                    ),
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(op, BMP_FEATURES_SCHEMA)


# --- GIF: the LZW-compressed, multi-frame image container ------------------
# PNG proved zlib/DEFLATE; GIF proves the OTHER compression family (LZW,
# variable-width codes, LSB-first bit packing, 255-byte sub-block framing)
# plus multi-frame animation — the container shape video-style media spans
# arrive in. Writer + decoder are both real (any image viewer opens the
# generated files); stdlib only.

_GIF_SIGS = (b"GIF87a", b"GIF89a")
_GIF_MAX_CODE = 1 << 12  # LZW codes are capped at 12 bits


def _gif_lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Real GIF-LZW: variable-width codes growing 9..12 bits (for
    min_code_size=8), CLEAR emitted up front and on table overflow,
    LSB-first bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, code_size = fresh()
    emit(clear, code_size)
    prefix = b""
    for b in bytes(data):
        nxt = prefix + bytes([b])
        if nxt in table:
            prefix = nxt
            continue
        emit(table[prefix], code_size)
        if next_code < _GIF_MAX_CODE:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:  # table full: clear and start over
            emit(clear, code_size)
            table, next_code, code_size = fresh()
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int, max_pixels: int):
    """Inverse of _gif_lzw_encode (returns (pixels, error)): handles
    code-size growth, CLEAR resets, the deferred-clear full-table state,
    and the prev+prev[0] self-referencing code. Bounded by max_pixels so
    a hostile stream cannot balloon memory."""
    if not (2 <= min_code_size <= 8):
        return None, "bad lzw code size"
    clear = 1 << min_code_size
    end = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in bytes(data):
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out), None
            if prev is None:
                if code >= len(table):
                    return None, "bad first lzw code"
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < _GIF_MAX_CODE:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < _GIF_MAX_CODE:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None, "bad lzw code"
            if (
                len(table) == (1 << code_size)
                and code_size < 12
            ):
                code_size += 1
            out += entry
            if len(out) > max_pixels:
                return None, "lzw output overrun"
            prev = entry
    return None, "missing lzw end code"


def build_gif(width: int, height: int, value: int, n_frames: int = 1) -> bytes:
    """Emit a REAL GIF89a: logical screen descriptor, 256-entry grayscale
    global color table, and per frame a Graphic Control Extension + image
    descriptor + genuine LZW-compressed indices in 255-byte sub-blocks.
    Frame f is solid (value+f) — multi-frame files are real animations
    any viewer plays."""
    if (
        width <= 0 or height <= 0 or n_frames <= 0
        or not (0 <= value + n_frames - 1 <= 255)
    ):
        raise ValueError("bad gif dimensions/value/frames")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # 256-color GCT
    for i in range(256):
        out += bytes((i, i, i))  # grayscale palette: red channel == index
    for f in range(n_frames):
        # Graphic Control Extension (forces decoders to walk extensions)
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)  # LZW minimum code size
        lzw = _gif_lzw_encode(bytes([value + f]) * (width * height), 8)
        for i in range(0, len(lzw), 255):
            blk = lzw[i:i + 255]
            out.append(len(blk))
            out += blk
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(data: bytes | None) -> dict:
    """Structural decode of the GIF subset: signature, logical screen
    descriptor, global color table, extension walk, per-frame image
    descriptor + LZW decode + pixel-count check. Returns {width, height,
    n_frames, ink_sum, error}; ink is the palette RED channel summed over
    every pixel of every frame (grayscale tables make that the gray sum).
    Every malformed payload yields an error row."""
    none = {"width": None, "height": None, "n_frames": None, "ink_sum": None}
    if data is None or len(data) < 13:
        return {**none, "error": "short or missing payload"}
    data = bytes(data)
    if data[:6] not in _GIF_SIGS:
        return {**none, "error": "bad gif signature"}
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    if w <= 0 or h <= 0:
        return {**none, "error": "bad dimensions"}
    pos = 13
    if not packed & 0x80:
        return {**none, "error": "no global color table"}
    gct_n = 2 << (packed & 0x07)
    gct = data[pos:pos + 3 * gct_n]
    if len(gct) != 3 * gct_n:
        return {**none, "error": "truncated color table"}
    pos += 3 * gct_n
    n_frames = 0
    ink = 0
    while True:
        if pos >= len(data):
            return {**none, "error": "missing trailer"}
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1  # label
            while True:
                if pos >= len(data):
                    return {**none, "error": "truncated extension"}
                n = data[pos]
                pos += 1 + n
                if n == 0:
                    break
            continue
        if b != 0x2C:
            return {**none, "error": f"unknown block 0x{b:02x}"}
        if pos + 9 > len(data):
            return {**none, "error": "truncated image descriptor"}
        fl, ft, fw, fh, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if ipacked & 0x40:
            return {**none, "error": "unsupported interlace"}
        pal = gct
        if ipacked & 0x80:  # local color table
            lct_n = 2 << (ipacked & 0x07)
            pal = data[pos:pos + 3 * lct_n]
            if len(pal) != 3 * lct_n:
                return {**none, "error": "truncated color table"}
            pos += 3 * lct_n
        if fw <= 0 or fh <= 0 or fl + fw > w or ft + fh > h:
            return {**none, "error": "frame exceeds screen"}
        if pos >= len(data):
            return {**none, "error": "truncated image data"}
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            if pos >= len(data):
                return {**none, "error": "truncated image data"}
            n = data[pos]
            pos += 1
            if n == 0:
                break
            blk = data[pos:pos + n]
            if len(blk) != n:
                return {**none, "error": "truncated image data"}
            lzw += blk
            pos += n
        pixels, err = _gif_lzw_decode(bytes(lzw), mcs, fw * fh)
        if err is not None:
            return {**none, "error": err}
        if len(pixels) != fw * fh:
            return {**none, "error": "pixel count mismatch"}
        npal = len(pal) // 3
        for p in pixels:
            if p >= npal:
                return {**none, "error": "pixel index out of palette"}
            ink += pal[3 * p]  # red channel
        n_frames += 1
    if n_frames == 0:
        return {**none, "error": "no image frames"}
    return {
        "width": w, "height": h, "n_frames": n_frames,
        "ink_sum": ink, "error": None,
    }


class GifCodec(MediaCodec):
    """Real decode for the GIF subset — LZW variable-width codes,
    sub-block framing, extension walk, multi-frame. Registered 'gif'."""

    name = "gif"

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        rows = [decode_gif(b) for b in content]
        ok = [r["error"] is None for r in rows]
        return pd.DataFrame(
            {
                "width": pd.array([r["width"] for r in rows], dtype="Int32"),
                "height": pd.array([r["height"] for r in rows], dtype="Int32"),
                "n_frames": pd.array(
                    [r["n_frames"] for r in rows], dtype="Int32"
                ),
                "mime": ["image/gif" if o else None for o in ok],
                "error": [r["error"] for r in rows],
            },
            index=content.index,
        )


GIF_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, n_frames int, mime string, "
    "ink_sum long, error string"
)


def extract_gif_features(df: DataFrame, content_col: str = "content",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> decoded width/height/frames/ink rows via
    one Arrow-batched mapInPandas pass."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_gif(b) for b in pdf[content_col]]
            ok = [r["error"] is None for r in rows]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.array(
                        [r["width"] for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r["height"] for r in rows], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [r["n_frames"] for r in rows], dtype="Int32"
                    ),
                    "mime": ["image/gif" if o else None for o in ok],
                    "ink_sum": pd.array(
                        [r["ink_sum"] for r in rows], dtype="Int64"
                    ),
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(op, GIF_FEATURES_SCHEMA)


def sniff_media_format(data: bytes | None) -> str | None:
    """Magic-byte sniff over the real-codec suite: 'bmp' / 'png' / 'wav'
    / 'gif', or None when no registered container signature matches.
    Content sniffing, never trusting an extension/metadata column — the
    crawl reality where both lie."""
    if data is None or len(data) < 12:
        return None
    data = bytes(data[:16])
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"BM"):
        return "bmp"
    if data.startswith(b"RIFF") and data[8:12] == b"WAVE":
        return "wav"
    if data[:6] in _GIF_SIGS:
        return "gif"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"\x00\x00\x01\x00":
        return "ico"
    if data.startswith(b"FORM") and data[8:12] == b"AIFF":
        return "aiff"
    if data[4:8] == b"ftyp":
        return "mp4"
    if data[:3] == b"ID3" or (
        data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        return "mp3"
    return None


DISPATCH_SCHEMA = (
    "doc_id long, format string, width int, height int, n_samples int, "
    "ink_sum long, error string"
)


def extract_media_dispatch(df: DataFrame, content_col: str = "content",
                           id_col: str = "doc_id") -> DataFrame:
    """Mixed-format payload column -> per-row sniff + decode through the
    matching REAL codec, one Arrow-batched pass. Images report
    width/height/ink_sum; audio reports n_samples and the absolute-sample
    sum in ink_sum (the shared 'energy' slot); unrecognized payloads
    become ('unknown format') failure rows — the multi-format ingest
    front door where media arrives as opaque bytes of unknown kind."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, ns, inks, errs = [], [], [], [], [], []
            for b in pdf[content_col]:
                fmt = sniff_media_format(b)
                if fmt == "bmp":
                    r = decode_bmp(b)
                    ws.append(r["width"]); hs.append(r["height"])
                    ns.append(None); inks.append(r["ink_sum"])
                    errs.append(r["error"])
                elif fmt == "png":
                    r = decode_png(b)
                    ws.append(r["width"]); hs.append(r["height"])
                    ns.append(None); inks.append(r["ink_sum"])
                    errs.append(r["error"])
                elif fmt == "gif":
                    r = decode_gif(b)
                    ws.append(r["width"]); hs.append(r["height"])
                    ns.append(None); inks.append(r["ink_sum"])
                    errs.append(r["error"])
                elif fmt == "jpeg":
                    from cies_ocr_java_spark.operators.jpeg_real import (
                        decode_jpeg,
                    )

                    r = decode_jpeg(b)
                    ws.append(r["width"]); hs.append(r["height"])
                    ns.append(None); inks.append(r["ink_sum"])
                    errs.append(r["error"])
                elif fmt == "wav":
                    r = decode_wav(b)
                    ws.append(None); hs.append(None)
                    ns.append(r["n_samples"]); inks.append(r["abs_sum"])
                    errs.append(r["error"])
                elif fmt == "ico":
                    r = decode_ico(b)
                    ws.append(r["width"]); hs.append(r["height"])
                    ns.append(r["n_images"]); inks.append(r["ink_sum"])
                    errs.append(r["error"])
                elif fmt == "aiff":
                    r = decode_aiff(b)
                    ws.append(None); hs.append(None)
                    ns.append(r["n_samples"]); inks.append(r["abs_sum"])
                    errs.append(r["error"])
                elif fmt == "mp4":
                    from cies_ocr_java_spark.operators.mp4_real import (
                        parse_mp4,
                    )

                    r = parse_mp4(b)
                    ws.append(r["width"]); hs.append(r["height"])
                    ns.append(r["n_samples"]); inks.append(r["payload_sum"])
                    errs.append(r["error"])
                elif fmt == "mp3":
                    from cies_ocr_java_spark.operators.mp3_real import (
                        parse_mp3,
                    )

                    r = parse_mp3(b)
                    ws.append(None); hs.append(None)
                    ns.append(r["n_frames"]); inks.append(r["audio_bytes"])
                    errs.append(r["error"])
                else:
                    r = None
                    ws.append(None); hs.append(None)
                    ns.append(None); inks.append(None)
                    errs.append("unknown format")
                fmts.append(fmt if (r is None or r["error"] is None) else fmt)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "n_samples": pd.array(ns, dtype="Int32"),
                    "ink_sum": pd.array(inks, dtype="Int64"),
                    "error": errs,
                }
            )

    return df.select(id_col, content_col).mapInPandas(op, DISPATCH_SCHEMA)


_CODEC_REGISTRY: dict[str, MediaCodec] = {}


def register_codec(codec: MediaCodec) -> None:
    """Register (or replace) a codec by its ``name`` — the pluggable seam
    where a real decoder slots in without touching the Spark plumbing."""
    _CODEC_REGISTRY[codec.name] = codec


def get_codec(codec: str | MediaCodec) -> MediaCodec:
    if isinstance(codec, MediaCodec):
        return codec
    try:
        return _CODEC_REGISTRY[codec]
    except KeyError:
        raise KeyError(
            f"no codec registered under {codec!r}; "
            f"available: {sorted(_CODEC_REGISTRY)}"
        ) from None


register_codec(StubCodec())
register_codec(NativeCodec())
register_codec(BmpCodec())
register_codec(WavCodec())
register_codec(PngCodec())
register_codec(GifCodec())


def decode_media_payload(content: bytes) -> dict:
    """Single-payload convenience over the 'native' codec (kept for the
    original extension-point contract; still raises in this sandbox)."""
    row = get_codec("native").decode_batch(pd.Series([content])).iloc[0]
    return row.to_dict()  # pragma: no cover - requires codec libs


def extract_media_features(
    df: DataFrame,
    ref_col: str = "media_ref",
    content_col: str = "content",
    codec: str | MediaCodec = "stub",
) -> DataFrame:
    """(media_ref, content:binary) -> typed feature rows via mapInPandas.

    ``codec`` is a registry name or a MediaCodec instance; decode failures
    surface as rows with null metadata and ``error`` set (never a task
    failure). The codec object is shipped to executors inside the closure
    — implementations must be picklable and stateless."""
    c = get_codec(codec)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf[content_col].map(lambda b: len(b) if b is not None else 0)
            meta = c.decode_batch(pdf[content_col])
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": meta["width"],
                    "height": meta["height"],
                    "n_frames": meta["n_frames"],
                    "mime": meta["mime"],
                    "error": meta["error"],
                }
            )

    return df.select(ref_col, content_col).mapInPandas(op, MEDIA_FEATURES_SCHEMA)


RESIZE_PLAN_SCHEMA = (
    "media_ref string, width int, height int, out_w int, out_h int, "
    "scale_pct int"
)


def plan_resize(
    features: DataFrame, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """Letterbox resize plan over decoded feature rows: scale = min(max_w/w,
    max_h/h, 1), output dims floored. The arithmetic runs vectorized on
    whole Arrow batches (numpy broadcasting inside mapInPandas) — this is
    the stand-in for the real resample kernel, which would slot into the
    same batch loop. scale_pct is an integer (floor of 100*scale) so the
    plan is float-free and engine-exact."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].clip(lower=1).astype("int64")
            h = pdf["height"].clip(lower=1).astype("int64")
            # integer min(100*max_w/w, 100*max_h/h, 100): floor division
            scale_pct = (
                pd.concat([100 * max_w // w, 100 * max_h // h], axis=1)
                .min(axis=1)
                .clip(upper=100)
            )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "out_w": (w * scale_pct // 100).astype("int32"),
                    "out_h": (h * scale_pct // 100).astype("int32"),
                    "scale_pct": scale_pct.astype("int32"),
                }
            )

    return features.select("media_ref", "width", "height").mapInPandas(
        op, RESIZE_PLAN_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = "media_ref string, frame_idx int, frame_ref string"


def sample_frames(features: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling plan: one output row per sampled frame index
    (0, stride, 2*stride, ... < n_frames). The explode happens inside the
    Arrow batch via numpy repeat/concatenate — no per-row Python, and the
    output batch is bounded because n_frames is bounded per input batch.
    The real decoder would attach pixel payloads to these rows."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["n_frames"].clip(lower=0).astype("int64").to_numpy()
            counts = (n + stride - 1) // stride  # frames sampled per row
            refs = np.repeat(pdf["media_ref"].to_numpy(), counts)
            idx = (
                np.concatenate([np.arange(c) * stride for c in counts])
                if len(counts)
                else np.array([], dtype="int64")
            )
            refs_s = pd.Series(refs, dtype="object")
            idx_s = pd.Series(idx, dtype="int64")
            yield pd.DataFrame(
                {
                    "media_ref": refs_s,
                    "frame_idx": idx_s.astype("int32"),
                    "frame_ref": refs_s + "#f" + idx_s.astype("string").astype("object"),
                }
            )

    return features.select("media_ref", "n_frames").mapInPandas(
        op, FRAME_SAMPLE_SCHEMA
    )


def phash_col(content_text):
    """60-bit perceptual-hash stand-in over the stubbed decode: hash of the
    decoded payload's leading 'perceptual window' (first 64 bytes). With a
    real codec this becomes DCT-low-frequency pHash over pixels; the
    Spark-side shape — fixed-width integer hash, band-bucketed self-join,
    hamming verify — is identical and is what this models. 15 hex chars =
    60 bits keeps the value positive in a signed BIGINT for both engines."""
    from pyspark.sql import functions as F

    return F.conv(
        F.substring(F.md5(F.substring(content_text, 1, 64)), 1, 15), 16, 10
    ).cast("long")


REGION_SCHEMA = (
    "media_ref string, region_id int, y0 int, y1 int, n_tiles int, "
    "ink_sum long"
)


def _ink_rows(features: DataFrame, tile: int, ink_threshold: int) -> DataFrame:
    """Horizontal projection profile over the decoded canvas: one row per
    ``tile``-pixel band, with a deterministic pseudo ink density in [0,100)
    derived from md5(media_ref:band) — the stub stand-in for summing dark
    pixels per band, which a real codec would produce from the bitmap.
    Zero-height / failed decodes contribute no bands (the degradation
    contract: no regions, never an error row here)."""
    n_rows = F.expr(f"CAST((height + {tile - 1}) DIV {tile} AS INT)")
    return (
        features.where(F.col("height").isNotNull() & (F.col("height") > 0))
        .select(
            "media_ref",
            "height",
            F.explode(F.sequence(F.lit(0), n_rows - 1)).alias("r"),
        )
        .withColumn(
            "ink",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col("media_ref"), F.col("r").cast("string")
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 100,
        )
        .where(F.col("ink") >= ink_threshold)
    )


def segment_regions(
    features: DataFrame,
    tile: int = 64,
    ink_threshold: int = 40,
    use_pandas: bool = False,
) -> DataFrame:
    """Image-region segmentation for media spans: the first pass of
    recursive XY-cut document-layout analysis — maximal runs of consecutive
    inked horizontal bands become regions (text blocks / figures), each
    reported as (region_id, y0, y1, n_tiles, ink_sum) with region_id
    numbered top-to-bottom. The real-codec version replaces the md5 ink
    stand-in with per-band dark-pixel sums; the segmentation math is
    identical.

    Default path is 100% JVM codegen: band explode + gaps-and-islands
    (r - row_number -> run key), windows partitioned BY IMAGE — no global
    window, scale-free. ``use_pandas=True`` swaps the run-merge stage for
    the vectorized-numpy kernel (`_merge_runs_pd`, applyInPandas) — the
    Arrow-batched shape a real pixel-domain connected-components kernel
    slots into; pytest pins both paths row-equal."""
    rows = _ink_rows(features, tile, ink_threshold)
    if use_pandas:
        return rows.groupBy("media_ref").applyInPandas(
            _make_merge_runs_pd(tile), REGION_SCHEMA
        )
    from pyspark.sql import Window

    w = Window.partitionBy("media_ref").orderBy("r")
    grp = rows.withColumn("g", F.col("r") - F.row_number().over(w))
    reg = grp.groupBy("media_ref", "g").agg(
        F.min("r").alias("r0"),
        F.max("r").alias("r1"),
        F.count("*").alias("n_tiles"),
        F.sum("ink").alias("ink_sum"),
        F.first("height").alias("height"),
    )
    w2 = Window.partitionBy("media_ref").orderBy("r0")
    return reg.select(
        "media_ref",
        F.row_number().over(w2).cast("int").alias("region_id"),
        (F.col("r0") * tile).cast("int").alias("y0"),
        F.least(F.col("r1") * tile + tile, F.col("height"))
        .cast("int")
        .alias("y1"),
        F.col("n_tiles").cast("int").alias("n_tiles"),
        F.col("ink_sum").cast("long").alias("ink_sum"),
    )


def _make_merge_runs_pd(tile: int):
    """Vectorized run-merge kernel: run boundaries via np.diff, per-run
    aggregates via np.*.reduceat — no per-row Python, one numpy pass per
    image group."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("r")
        r = pdf["r"].to_numpy(dtype="int64")
        ink = pdf["ink"].to_numpy(dtype="int64")
        height = int(pdf["height"].iloc[0])
        new = np.ones(len(r), dtype=bool)
        new[1:] = np.diff(r) > 1
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:] - 1, len(r) - 1]
        r0, r1 = r[starts], r[ends]
        return pd.DataFrame(
            {
                "media_ref": pdf["media_ref"].iloc[0],
                "region_id": np.arange(1, len(starts) + 1, dtype="int32"),
                "y0": (r0 * tile).astype("int32"),
                "y1": np.minimum(r1 * tile + tile, height).astype("int32"),
                "n_tiles": (ends - starts + 1).astype("int32"),
                "ink_sum": np.add.reduceat(ink, starts).astype("int64"),
            }
        )

    return merge


AUDIO_CHUNK_SCHEMA = "media_ref string, chunk_idx int, start_ms long, end_ms long"


def plan_audio_chunks(
    features: DataFrame,
    chunk_ms: int = 30_000,
    overlap_ms: int = 5_000,
) -> DataFrame:
    """Audio chunking plan: overlapping windows (ASR-style 30s/5s) over a
    stub duration derived from n_bytes (the fake codec's '1 byte = 1 ms').
    Window math is numpy over whole Arrow batches; one output row per
    chunk, clipped to the duration. The real decoder would attach PCM
    slices to these rows — schema, batching, and chunk arithmetic are the
    production plumbing."""
    import numpy as np

    step = chunk_ms - overlap_ms
    assert step > 0

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dur = pdf["n_bytes"].clip(lower=0).astype("int64").to_numpy()
            counts = np.maximum((dur + step - 1) // step, (dur > 0).astype("int64"))
            refs = np.repeat(pdf["media_ref"].to_numpy(), counts)
            durs = np.repeat(dur, counts)
            idx = (
                np.concatenate([np.arange(c) for c in counts])
                if len(counts)
                else np.array([], dtype="int64")
            )
            start = idx * step
            end = np.minimum(start + chunk_ms, durs)
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype="object"),
                    "chunk_idx": pd.Series(idx, dtype="int64").astype("int32"),
                    "start_ms": pd.Series(start, dtype="int64"),
                    "end_ms": pd.Series(end, dtype="int64"),
                }
            )

    return features.select("media_ref", "n_bytes").mapInPandas(
        op, AUDIO_CHUNK_SCHEMA
    )


# --- TIFF: the IFD-structured, dual-endian, multi-page container -----------
# (session-3) TIFF is the only common image container whose metadata is a
# linked list of tag directories in EITHER byte order — the decode walk is
# offset-chasing like the PDF xref, not chunk streaming like PNG/GIF.

_TIFF_SHORT, _TIFF_LONG = 3, 4


def build_tiff(width: int, height: int, value: int, pages: int = 1,
               big_endian: bool = False) -> bytes:
    """Emit a REAL baseline TIFF: 8-bit grayscale, uncompressed
    (Compression=1, PhotometricInterpretation=BlackIsZero), ``pages``
    chained IFDs (page p is solid ``(value+p) % 256``), each page split
    into TWO strips when it has >=2 rows (so StripOffsets/ByteCounts are
    genuine out-of-line LONG arrays, not inline values), in either byte
    order. Any image tool opens these files."""
    import struct

    if width <= 0 or height <= 0 or pages <= 0 or not (0 <= value <= 255):
        raise ValueError("bad tiff dimensions/value")
    e = ">" if big_endian else "<"
    buf = bytearray(
        struct.pack(e + "2sHI", b"MM" if big_endian else b"II", 42, 0)
    )
    rps = (height + 1) // 2 if height >= 2 else height
    page_meta = []
    for p in range(pages):
        pix = bytes([(value + p) % 256]) * (width * height)
        offs, cnts = [], []
        pos = 0
        while pos < len(pix):
            chunk = pix[pos:pos + rps * width]
            offs.append(len(buf))
            cnts.append(len(chunk))
            buf += chunk
            pos += len(chunk)
        page_meta.append((offs, cnts))

    def entry(tag: int, typ: int, vals: list[int]) -> tuple[bytes, list]:
        """(12-byte entry, deferred-array-or-None): arrays that do not
        fit the 4-byte value field are appended after the IFD chain."""
        size = 2 if typ == _TIFF_SHORT else 4
        if len(vals) * size <= 4:
            fmt = "H" if typ == _TIFF_SHORT else "I"
            raw = b"".join(struct.pack(e + fmt, v) for v in vals)
            raw += b"\x00" * (4 - len(raw))
            return struct.pack(e + "HHI", tag, typ, len(vals)) + raw, None
        return struct.pack(e + "HHI", tag, typ, len(vals)), vals

    ifd_positions = []
    deferred_all = []
    for p, (offs, cnts) in enumerate(page_meta):
        ifd_positions.append(len(buf))
        entries = [
            entry(256, _TIFF_LONG, [width]),
            entry(257, _TIFF_LONG, [height]),
            entry(258, _TIFF_SHORT, [8]),
            entry(259, _TIFF_SHORT, [1]),
            entry(262, _TIFF_SHORT, [1]),
            entry(273, _TIFF_LONG, offs),
            entry(277, _TIFF_SHORT, [1]),
            entry(278, _TIFF_LONG, [rps]),
            entry(279, _TIFF_LONG, cnts),
        ]
        buf += struct.pack(e + "H", len(entries))
        ifd_body_at = len(buf)
        for ent, deferred in entries:
            buf += ent if deferred is None else ent + b"\x00\x00\x00\x00"
        buf += b"\x00\x00\x00\x00"  # next-IFD placeholder
        # place deferred arrays now, patching their offset fields
        slot = ifd_body_at
        for ent, deferred in entries:
            if deferred is not None:
                struct.pack_into(e + "I", buf, slot + 8, len(buf))
                for v in deferred:
                    buf += struct.pack(e + "I", v)
            slot += 12
        deferred_all.append(ifd_body_at)
    # chain: header -> IFD0, IFD p -> IFD p+1
    struct.pack_into(e + "I", buf, 4, ifd_positions[0])
    for p in range(pages - 1):
        nxt_at = deferred_all[p] + 12 * 9
        struct.pack_into(e + "I", buf, nxt_at, ifd_positions[p + 1])
    return bytes(buf)


def decode_tiff(data: bytes | None) -> dict:
    """Structural decode of the baseline-TIFF subset: endian-aware header,
    IFD chain walk (cycle-guarded), typed tag reads with inline-vs-offset
    value resolution, strip reassembly with byte-count validation.

    Returns {width, height, n_pages, ink_sum, error}: dims from the FIRST
    page, ink summed across ALL pages' strips. Every malformed payload
    yields an error row, never an exception (the MediaCodec contract);
    offsets are trusted then bounds-VERIFIED like the PDF xref walk."""
    import struct

    none = {"width": None, "height": None, "n_pages": None, "ink_sum": None}
    if data is None or len(data) < 8:
        return {**none, "error": "short or missing payload"}
    data = bytes(data)
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        return {**none, "error": "bad magic"}
    (ver,) = struct.unpack_from(e + "H", data, 2)
    if ver != 42:
        return {**none, "error": "bad version"}
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)

    def read_values(typ: int, cnt: int, field: bytes) -> list[int] | None:
        size = 2 if typ == _TIFF_SHORT else 4
        fmt = "H" if typ == _TIFF_SHORT else "I"
        if cnt * size <= 4:
            return list(struct.unpack_from(e + str(cnt) + fmt, field, 0))
        (off,) = struct.unpack_from(e + "I", field, 0)
        if off + cnt * size > len(data):
            return None
        return list(struct.unpack_from(e + str(cnt) + fmt, data, off))

    first_w = first_h = None
    n_pages = 0
    ink = 0
    seen: set[int] = set()
    while ifd_off != 0:
        if ifd_off in seen or len(seen) >= 64:
            return {**none, "error": "cyclic or runaway ifd chain"}
        seen.add(ifd_off)
        if ifd_off + 2 > len(data):
            return {**none, "error": "ifd out of bounds"}
        (n_ent,) = struct.unpack_from(e + "H", data, ifd_off)
        end = ifd_off + 2 + 12 * n_ent + 4
        if end > len(data):
            return {**none, "error": "ifd out of bounds"}
        tags: dict[int, list[int]] = {}
        for k in range(n_ent):
            at = ifd_off + 2 + 12 * k
            tag, typ, cnt = struct.unpack_from(e + "HHI", data, at)
            if typ not in (_TIFF_SHORT, _TIFF_LONG):
                continue  # unknown-type tags are skipped, not fatal
            vals = read_values(typ, cnt, data[at + 8:at + 12])
            if vals is None:
                return {**none, "error": f"tag {tag} array out of bounds"}
            tags[tag] = vals
        (ifd_off,) = struct.unpack_from(e + "I", data, end - 4)

        def first(tag: int, default: int | None = None) -> int | None:
            vals = tags.get(tag)
            if not vals:  # absent OR a hostile zero-count entry
                return default
            return vals[0]

        w, h = first(256), first(257)
        offs, cnts = tags.get(273), tags.get(279)
        if w is None or h is None or not offs or not cnts:
            return {**none, "error": "missing required tag"}
        if first(259, 1) != 1:
            return {**none, "error": "unsupported compression"}
        if first(258, 8) != 8 or first(277, 1) != 1:
            return {**none, "error": "unsupported sample layout"}
        if w <= 0 or h <= 0 or len(offs) != len(cnts):
            return {**none, "error": "bad dimensions or strip tables"}
        if sum(cnts) != w * h:
            return {**none, "error": "strip byte counts mismatch"}
        for o, c in zip(offs, cnts):
            if o + c > len(data):
                return {**none, "error": "truncated strip"}
            ink += sum(data[o:o + c])
        if n_pages == 0:
            first_w, first_h = w, h
        n_pages += 1
    if n_pages == 0:
        return {**none, "error": "empty ifd chain"}
    return {
        "width": first_w, "height": first_h,
        "n_pages": n_pages, "ink_sum": ink, "error": None,
    }


class TiffCodec(MediaCodec):
    """Real decode for the baseline-TIFF subset (both byte orders,
    multi-page IFD chains). Registered as 'tiff'."""

    name = "tiff"

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        rows = [decode_tiff(b) for b in content]
        ok = [r["error"] is None for r in rows]
        return pd.DataFrame(
            {
                "width": pd.array([r["width"] for r in rows], dtype="Int32"),
                "height": pd.array(
                    [r["height"] for r in rows], dtype="Int32"
                ),
                "n_frames": pd.array(
                    [r["n_pages"] for r in rows], dtype="Int32"
                ),
                "mime": ["image/tiff" if o else None for o in ok],
                "error": [r["error"] for r in rows],
            },
            index=content.index,
        )


TIFF_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, n_pages int, mime string, "
    "ink_sum long, error string"
)


def extract_tiff_features(df: DataFrame, content_col: str = "content",
                          id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> decoded TIFF rows via one Arrow-batched
    mapInPandas pass (ink needs the strip bytes)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_tiff(b) for b in pdf[content_col]]
            ok = [r["error"] is None for r in rows]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.array(
                        [r["width"] for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r["height"] for r in rows], dtype="Int32"
                    ),
                    "n_pages": pd.array(
                        [r["n_pages"] for r in rows], dtype="Int32"
                    ),
                    "mime": ["image/tiff" if o else None for o in ok],
                    "ink_sum": pd.array(
                        [r["ink_sum"] for r in rows], dtype="Int64"
                    ),
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        op, TIFF_FEATURES_SCHEMA
    )


register_codec(TiffCodec())


# ---------------------------------------------------------------------------
# ICO container (favicons): the codec suite's CONTAINER-OF-CODECS case —
# each directory entry's payload is EITHER a complete embedded PNG file
# (Vista+ icons) or a headerless DIB whose BITMAPINFOHEADER declares
# DOUBLE height (XOR pixel mask + 1-bpp AND transparency mask). A crawl
# sees one per site; the favicon is the smallest real multi-resolution
# container in the wild.
# ---------------------------------------------------------------------------

_ICO_DIR = struct.Struct("<HHH")          # reserved=0, type=1, count
_ICO_ENTRY = struct.Struct("<BBBBHHII")   # w, h, colors, res, planes, bpp, size, offset


def build_ico(entries: list[tuple]) -> bytes:
    """Emit a REAL .ico: ICONDIR + ICONDIRENTRY table + payloads. An
    entry is ('png', w, h, value) — a complete embedded PNG — or
    ('dib', w, h, value) — a BITMAPINFOHEADER with biHeight = 2*h, 24-bit
    XOR rows, and an all-zero 1-bpp AND mask, both 4-byte-padded. Any
    icon viewer opens these files."""
    payloads = []
    for kind, w, h, value in entries:
        if w <= 0 or h <= 0 or w > 256 or h > 256:
            raise ValueError("bad ico entry dimensions")
        if kind == "png":
            payloads.append(build_png(w, h, value))
        elif kind == "dib":
            xor_stride = (w * 3 + 3) // 4 * 4
            xor_row = bytes([value]) * (w * 3) + b"\x00" * (
                xor_stride - w * 3
            )
            and_stride = (w + 31) // 32 * 4
            payloads.append(
                _BMP_INFO_HDR.pack(40, w, 2 * h, 1, 24, 0, 0, 0, 0, 0, 0)
                + xor_row * h
                + b"\x00" * (and_stride * h)
            )
        else:
            raise ValueError(f"unknown ico entry kind {kind!r}")
    off = _ICO_DIR.size + _ICO_ENTRY.size * len(entries)
    head = [_ICO_DIR.pack(0, 1, len(entries))]
    for (kind, w, h, _v), payload in zip(entries, payloads):
        head.append(
            _ICO_ENTRY.pack(w % 256, h % 256, 0, 0, 1, 24 if kind == "dib"
                            else 32, len(payload), off)
        )
        off += len(payload)
    return b"".join(head) + b"".join(payloads)


def decode_ico(data: bytes | None) -> dict:
    """Structural decode of an ICO container: directory walk with
    bounds-verified (offset, size) slices per entry, payload SNIFFED
    (PNG signature -> the real PNG codec; else BITMAPINFOHEADER DIB with
    the double-height XOR/AND layout). Returns {n_images, width, height,
    fmt0, ink_sum, error}: width/height/fmt0 from entry 0 (the
    resolution ladder's base), ink_sum totalled over every entry's
    PIXEL bytes (AND masks and padding excluded). Every malformed
    payload -> error row, never an exception."""
    none = {"n_images": None, "width": None, "height": None,
            "fmt0": None, "ink_sum": None}
    if data is None or len(data) < _ICO_DIR.size:
        return {**none, "error": "short or missing payload"}
    data = bytes(data)
    res, typ, count = _ICO_DIR.unpack_from(data, 0)
    if res != 0 or typ != 1:
        return {**none, "error": "bad icondir header"}
    if count == 0:
        return {**none, "error": "empty icon directory"}
    if _ICO_DIR.size + _ICO_ENTRY.size * count > len(data):
        return {**none, "error": "truncated entry table"}
    ink = 0
    w0 = h0 = fmt0 = None
    for i in range(count):
        ew, eh, _c, _r, _pl, _bpp, size, off = _ICO_ENTRY.unpack_from(
            data, _ICO_DIR.size + _ICO_ENTRY.size * i
        )
        ew, eh = ew or 256, eh or 256
        if off + size > len(data) or size <= 0:
            return {**none, "error": f"entry {i} payload out of bounds"}
        payload = data[off:off + size]
        if payload.startswith(_PNG_SIG):
            r = decode_png(payload)
            if r["error"] is not None:
                return {**none,
                        "error": f"entry {i} png: {r['error']}"}
            if (r["width"], r["height"]) != (ew, eh):
                return {**none, "error": f"entry {i} size mismatch"}
            ink += r["ink_sum"]
            fmt = "png"
        else:
            if len(payload) < _BMP_INFO_HDR.size:
                return {**none, "error": f"entry {i} short dib header"}
            (hsize, w, h2, planes, bpp, comp, _is, _x, _y, _cl, _im) = (
                _BMP_INFO_HDR.unpack_from(payload, 0)
            )
            if hsize != 40 or planes != 1 or comp != 0:
                return {**none, "error": f"entry {i} bad dib header"}
            if bpp != 24:
                return {**none, "error": f"entry {i} unsupported bpp"}
            if w != ew or h2 != 2 * eh:
                # the DIB's double-height rule IS the format: height
                # covers XOR pixels + AND mask
                return {**none, "error": f"entry {i} size mismatch"}
            xor_stride = (w * 3 + 3) // 4 * 4
            and_stride = (w + 31) // 32 * 4
            need = hsize + xor_stride * eh + and_stride * eh
            if len(payload) < need:
                return {**none, "error": f"entry {i} truncated dib"}
            for r_ in range(eh):
                start = hsize + r_ * xor_stride
                ink += sum(payload[start:start + w * 3])
            fmt = "dib"
        if i == 0:
            w0, h0, fmt0 = ew, eh, fmt
    return {"n_images": count, "width": w0, "height": h0, "fmt0": fmt0,
            "ink_sum": ink, "error": None}


class IcoCodec(MediaCodec):
    """Real decode for the ICO favicon container (PNG or DIB members).
    Maps into the generic codec schema: width/height from entry 0,
    n_frames = member count. Registered 'ico'."""

    name = "ico"

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        rows = [decode_ico(b) for b in content]
        ok = [r["error"] is None for r in rows]
        return pd.DataFrame(
            {
                "width": pd.array([r["width"] for r in rows], dtype="Int32"),
                "height": pd.array(
                    [r["height"] for r in rows], dtype="Int32"
                ),
                "n_frames": pd.array(
                    [r["n_images"] for r in rows], dtype="Int32"
                ),
                "mime": ["image/x-icon" if o else None for o in ok],
                "error": [r["error"] for r in rows],
            },
            index=content.index,
        )


ICO_FEATURES_SCHEMA = (
    "doc_id long, n_images int, width int, height int, fmt0 string, "
    "mime string, ink_sum long, error string"
)


def extract_ico_features(df: DataFrame, content_col: str = "content",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> per-container decode rows via one
    Arrow-batched mapInPandas pass, no shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_ico(b) for b in pdf[content_col]]
            ok = [r["error"] is None for r in rows]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_images": pd.array(
                        [r["n_images"] for r in rows], dtype="Int32"
                    ),
                    "width": pd.array(
                        [r["width"] for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r["height"] for r in rows], dtype="Int32"
                    ),
                    "fmt0": [r["fmt0"] for r in rows],
                    "mime": ["image/x-icon" if o else None for o in ok],
                    "ink_sum": pd.array(
                        [r["ink_sum"] for r in rows], dtype="Int64"
                    ),
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        op, ICO_FEATURES_SCHEMA
    )


register_codec(IcoCodec())


# ---------------------------------------------------------------------------
# AIFF (the OTHER audio container): big-endian IFF chunks, and the one
# genuinely exotic scalar in common media formats — the COMM chunk's
# sample rate is an 80-bit IEEE 754 EXTENDED-precision float (15-bit
# exponent, explicit-integer-bit 64-bit mantissa). A decoder that
# byte-swaps WAV logic reads garbage; the extended parse is the format.
# ---------------------------------------------------------------------------


def _extended80_pack(value: int) -> bytes:
    """Pack a positive integer as 80-bit extended (sign 0): exponent
    16383+floor(log2(v)), mantissa v left-justified with the explicit
    integer bit at bit 63."""
    if value <= 0:
        raise ValueError("extended80 subset packs positive integers only")
    e = value.bit_length() - 1
    mant = value << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def _extended80_unpack(b: bytes) -> int | None:
    """Unpack the 80-bit extended subset: positive, integral, in-range.
    Returns None for anything else (negative, NaN/inf exponent, values
    that are not exact integers)."""
    se, mant = struct.unpack(">HQ", b)
    if se & 0x8000:
        return None  # negative rate is nonsense
    e = se - 16383
    if se == 0x7FFF or e < 0 or e > 62:
        return None
    shift = 63 - e
    if mant & ((1 << shift) - 1):
        return None  # fractional rate: outside the subset
    return mant >> shift


def build_aiff(n_frames: int, sample_rate: int, amplitude: int,
               channels: int = 1) -> bytes:
    """Emit a REAL AIFF (FORM/COMM/SSND, 16-bit big-endian PCM), every
    sample the constant ``amplitude`` — any audio tool opens it."""
    if n_frames <= 0 or channels <= 0 or not (-32768 <= amplitude <= 32767):
        raise ValueError("bad aiff parameters")
    if sample_rate <= 0:
        raise ValueError("bad aiff sample rate")
    frame = struct.pack(">h", amplitude) * channels
    data = frame * n_frames
    comm = (
        struct.pack(">HIH", channels, n_frames, 16)
        + _extended80_pack(sample_rate)
    )
    body = (
        b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">III", 8 + len(data), 0, 0)[:4]
        + struct.pack(">II", 0, 0) + data
    )
    return b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body


def decode_aiff(data: bytes | None) -> dict:
    """Structural decode of the 16-bit PCM AIFF subset: FORM header,
    big-endian chunk walk (unknown chunks skipped by size,
    word-aligned), the 80-bit extended sample-rate parse, frame
    arithmetic, and the exact integer sum of absolute sample values.
    Malformed -> error row, never an exception."""
    none = {"channels": None, "sample_rate": None, "n_samples": None,
            "abs_sum": None}
    if data is None or len(data) < 12:
        return {**none, "error": "short or missing payload"}
    data = bytes(data)
    if data[:4] != b"FORM" or data[8:12] != b"AIFF":
        return {**none, "error": "bad form header"}
    pos, comm, ssnd = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack_from(">I", data, pos + 4)
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            return {**none, "error": "truncated chunk"}
        if cid == b"COMM":
            if clen < 18:
                return {**none, "error": "short comm chunk"}
            comm = body
        elif cid == b"SSND":
            if clen < 8:
                return {**none, "error": "short ssnd chunk"}
            off, _blk = struct.unpack_from(">II", body, 0)
            if 8 + off > clen:
                return {**none, "error": "bad ssnd offset"}
            ssnd = body[8 + off:]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        return {**none, "error": "missing comm or ssnd chunk"}
    channels, n_frames, bits = struct.unpack_from(">HIH", comm, 0)
    rate = _extended80_unpack(comm[8:18])
    if bits != 16:
        return {**none, "error": f"unsupported sample size {bits}bit"}
    if rate is None or channels <= 0:
        return {**none, "error": "bad channel/rate"}
    frame = channels * 2
    if len(ssnd) % frame:
        return {**none, "error": "partial frame in ssnd chunk"}
    if len(ssnd) // frame != n_frames:
        return {**none, "error": "frame count mismatch"}
    samples = struct.unpack(f">{len(ssnd) // 2}h", ssnd)
    return {
        "channels": channels, "sample_rate": rate, "n_samples": n_frames,
        "abs_sum": sum(abs(s) for s in samples), "error": None,
    }


class AiffCodec(MediaCodec):
    """Real audio decode for the 16-bit PCM AIFF subset (stdlib struct;
    big-endian dual of WavCodec). Same schema mapping: width=rate,
    height=channels, n_frames=frames. Registered 'aiff'."""

    name = "aiff"

    def decode_batch(self, content: pd.Series) -> pd.DataFrame:
        rows = [decode_aiff(b) for b in content]
        ok = [r["error"] is None for r in rows]
        return pd.DataFrame(
            {
                "width": pd.array(
                    [r["sample_rate"] for r in rows], dtype="Int32"
                ),
                "height": pd.array(
                    [r["channels"] for r in rows], dtype="Int32"
                ),
                "n_frames": pd.array(
                    [r["n_samples"] for r in rows], dtype="Int32"
                ),
                "mime": ["audio/aiff" if o else None for o in ok],
                "error": [r["error"] for r in rows],
            },
            index=content.index,
        )


AIFF_FEATURES_SCHEMA = (
    "doc_id long, channels int, sample_rate int, n_samples int, "
    "abs_sum long, mime string, error string"
)


def extract_aiff_features(df: DataFrame, content_col: str = "content",
                          id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> decoded audio rows via one Arrow-batched
    mapInPandas pass, no shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_aiff(b) for b in pdf[content_col]]
            ok = [r["error"] is None for r in rows]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "channels": pd.array(
                        [r["channels"] for r in rows], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [r["sample_rate"] for r in rows], dtype="Int32"
                    ),
                    "n_samples": pd.array(
                        [r["n_samples"] for r in rows], dtype="Int32"
                    ),
                    "abs_sum": pd.array(
                        [r["abs_sum"] for r in rows], dtype="Int64"
                    ),
                    "mime": ["audio/aiff" if o else None for o in ok],
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        op, AIFF_FEATURES_SCHEMA
    )


register_codec(AiffCodec())
