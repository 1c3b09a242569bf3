"""DICOM walker (operators/dicom_real.py): VR-dependent length split,
even-padding rule, tag ordering, transfer-syntax gate, fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.dicom_real import (
    build_dicom,
    parse_dicom,
)


def _mk(i, **kw):
    r, c = 4 + i % 5, 6 + i % 4

    def fn(x, y):
        return (i * 29 + 13 * x + 3 * y) % 251

    return build_dicom("CT" if i % 2 else "MR",
                       f"GRAFT^P{i % 23:02d}", 1 + i % 99, r, c, fn,
                       **kw), r, c, fn


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        b, r, c, fn = _mk(i)
        m = parse_dicom(b)
        assert m["error"] is None
        assert m["modality"] == ("CT" if i % 2 else "MR")
        assert m["patient"] == f"GRAFT^P{i % 23:02d}"
        assert (m["rows"], m["cols"]) == (r, c)
        assert m["pixel_sum"] == sum(fn(x, y) for y in range(r)
                                     for x in range(c))
        assert m["n_elements"] == 9


def test_vr_length_split_is_load_bearing():
    """PixelData (OB) uses reserved+u32; rewriting its VR to a
    short-length one desynchronizes into an error, proving the walk
    honors the split."""
    b, *_ = _mk(2)
    at = b.index(struct.pack("<HH", 0x7FE0, 0x0010))
    bad = bytearray(b)
    bad[at + 4:at + 6] = b"SS"  # u16-length VR over u32-length layout
    assert parse_dicom(bytes(bad))["error"] is not None


def test_even_padding_and_ordering():
    assert parse_dicom(_mk(3, odd_length=True)[0])["error"] \
        == "odd value length at tag (0010,0010)"
    # swap Rows and Columns elements: tags out of order
    b, *_ = _mk(2)
    at1 = b.index(struct.pack("<HH", 0x0028, 0x0010))
    at2 = b.index(struct.pack("<HH", 0x0028, 0x0011))
    e1 = b[at1:at2]
    e2_end = at2 + len(e1)
    bad = b[:at1] + b[at2:e2_end] + e1 + b[e2_end:]
    assert "tags out of order" in parse_dicom(bad)["error"]


def test_magic_and_preamble():
    b, *_ = _mk(3)
    assert parse_dicom(_mk(3, bad_magic=True)[0])["error"] \
        == "missing dicm magic"
    # the 128-byte preamble is IGNORABLE: garbage there must not
    # affect the parse
    noisy = bytes(range(128))[:128] + b[128:]
    assert parse_dicom(noisy)["error"] is None
    assert parse_dicom(None)["error"] == "short or missing file"


def test_fuzz_never_raises():
    rng = random.Random(109)
    for seed in (5, 8):
        base, *_ = _mk(seed)
        for _ in range(500):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_dicom(blob)
