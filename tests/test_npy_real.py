"""npy/npz walker (operators/npy_real.py): numpy interop (np.save
byte-identity, np.savez through the shared ZIP walk), 64-byte
header alignment, rank-1 trailing comma, gates, fuzz."""

import io
import random

import numpy as np
import pytest

from cies_ocr_java_spark.operators.npy_real import (
    build_npy,
    parse_npy,
    parse_npz,
)


def test_builder_byte_identical_to_np_save():
    buf = io.BytesIO()
    np.save(buf, np.arange(12, dtype="<i8").reshape(3, 4))
    assert buf.getvalue() == build_npy("<i8", (3, 4),
                                       list(range(12)))


def test_parse_np_save_all_dtypes():
    for arr, want in (
        (np.arange(12, dtype="<i8").reshape(3, 4) * 7,
         ("<i8", (3, 4), 66 * 7 * 256)),
        (np.array([1.5, 2.25, -3.125]),
         ("<f8", (3,), int(0.625 * 256))),
        (np.arange(5, dtype="u1"), ("|u1", (5,), 10 * 256)),
    ):
        buf = io.BytesIO()
        np.save(buf, arr)
        r = parse_npy(buf.getvalue())
        assert (r["descr"], r["shape"]) == want[:2]
        assert r["vsum_x256"] == want[2]


def test_fortran_order_flag():
    buf = io.BytesIO()
    np.save(buf, np.asfortranarray(
        np.arange(6, dtype="<i4").reshape(2, 3)))
    assert parse_npy(buf.getvalue())["fortran"] is True


def test_npz_rides_the_shared_zip_walk():
    buf = io.BytesIO()
    np.savez(buf, x=np.arange(4, dtype="<i8"),
             y=np.array([0.5, 1.5]))
    r = parse_npz(buf.getvalue())
    assert r["error"] is None
    assert r["n_arrays"] == 2 and r["n_values"] == 6
    assert r["vsum_x256"] == 6 * 256 + 512


def test_alignment_gate():
    blob = build_npy("<i8", (3,), [1, 2, 3], bad_align=True)
    with pytest.raises(ValueError,
                       match="not 64-byte aligned"):
        parse_npy(blob)


def test_shape_size_gate():
    blob = build_npy("<i8", (3,), [1, 2, 3], lie_shape=True)
    with pytest.raises(ValueError, match="disagrees with shape"):
        parse_npy(blob)


def test_fuzz_never_raises_npz():
    from cies_ocr_java_spark.operators.archive import build_zip
    rng = random.Random(0x4B1)
    base = build_zip([
        ("a.npy", build_npy("<i8", (4,), [10, 20, 30, 40]), 0),
        ("b.npy", build_npy("|u1", (2, 3),
                            [1, 2, 3, 4, 5, 6]), 8),
    ])
    r = parse_npz(base)
    assert r["error"] is None and r["n_arrays"] == 2
    for _ in range(300):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_npz(blob)


def test_non_finite_f8_body_degrades():
    """An f8 body containing +/-inf made int(round(total)) raise
    OverflowError past the ValueError net — must be an error row."""
    import struct

    from cies_ocr_java_spark.operators.archive import build_zip

    base = bytearray(build_npy("<f8", (2,), [256, 512]))
    for v in (float("inf"), float("-inf")):
        member = bytes(base[:-16]) + struct.pack("<2d", v, 1.0)
        r = parse_npz(build_zip([("a.npy", member, 0)]))
        assert r["error"] == "non-finite value", (v, r)
