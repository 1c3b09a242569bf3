"""LZW-TIFF composition (operators/tiff_lzw.py): round-trip identity,
the PDF/TIFF LZW identity, size-verification gates, fuzz."""

import random

from cies_ocr_java_spark.operators.pdf_real import (
    _lzw_decode,
    _lzw_encode,
)
from cies_ocr_java_spark.operators.tiff_lzw import (
    build_tiff_lzw,
    decode_tiff_lzw,
)


def _mk(i, **kw):
    w, h = 16 * (1 + i % 3), 8 * (1 + i % 4)
    rows = [(i + r) % 251 for r in range(h)]
    return build_tiff_lzw(w, h, rows, big_endian=i % 2 == 1,
                          **kw), w, h, rows


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12, 30]:
        b, w, h, rows = _mk(i)
        r = decode_tiff_lzw(b)
        assert r["error"] is None
        assert (r["width"], r["height"]) == (w, h)
        assert r["compression"] == 5 and r["n_strips"] == 2
        assert r["ink_sum"] == w * sum(rows)


def test_strips_actually_compress():
    """Solid rows are LZW's best case; the compressed strips must be
    smaller than the raw pixel data — proof the codec is genuinely in
    the path, not a stored passthrough."""
    b, w, h, _ = _mk(7)
    assert len(b) < w * h  # file incl. headers under raw pixel bytes


def test_pdf_tiff_lzw_identity():
    """The composition's premise: pdf_real's LZW decodes what this
    module's strips contain — same MSB-first EarlyChange=1 stream."""
    raw = bytes([9] * 640)
    assert _lzw_decode(_lzw_encode(raw)) == raw


def test_decoded_size_gate():
    """A strip whose LZW output disagrees with RowsPerStrip*width is
    rejected — splice strip 1's data into strip 0's slot."""
    b, w, h, rows = _mk(2)
    r = decode_tiff_lzw(b)
    assert r["error"] is None
    # widen the declared image: every strip now decodes short of
    # rows*width (RowsPerStrip is clamped, so bumping Height alone
    # would cancel out -- Width is the load-bearing dimension)
    b2 = build_tiff_lzw(w, h, rows)
    import struct
    bad = bytearray(b2)
    (ifd_at,) = struct.unpack_from("<I", b2, 4)
    struct.pack_into("<I", bad, ifd_at + 2 + 12 * 0 + 8, w + 4)
    assert decode_tiff_lzw(bytes(bad))["error"] \
        == "strip 0 decodes to wrong pixel count"


def test_poison_tiers():
    assert decode_tiff_lzw(_mk(3, bad_compression=True)[0])["error"] \
        == "unsupported compression 6"
    assert decode_tiff_lzw(_mk(3, lie_byte_count=True)[0])["error"] \
        == "tag 279 array out of bounds"
    assert decode_tiff_lzw(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(61)
    base, _, _, _ = _mk(5)
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in decode_tiff_lzw(blob)
