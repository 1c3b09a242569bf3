"""LZMA decoder (operators/lzma_real.py): stdlib FORMAT_ALONE interop
across the (lc, lp, pb) matrix, matched-literal mode, rep distances,
end-marker discipline, fuzz-never-raises."""

import lzma
import random

import pytest

from cies_ocr_java_spark.operators.lzma_real import (
    lzma_decode_alone,
    parse_lzma_doc,
)


def _z(data, lc=3, lp=0, pb=2):
    return lzma.compress(
        data, format=lzma.FORMAT_ALONE,
        filters=[{"id": lzma.FILTER_LZMA1, "preset": 6,
                  "lc": lc, "lp": lp, "pb": pb}])


def test_stdlib_interop_identity():
    rng = random.Random(42)
    cases = [
        b"",
        b"hello world\n",
        b"a" * 1000,                # long rep0 runs
        bytes(range(256)) * 10,     # full literal alphabet
        b"The quick brown fox jumps over the lazy dog. " * 300,
        bytes(rng.randrange(256) for _ in range(5000)),
        b"".join(b"doc %d line with token %d\n" % (k, k % 17)
                 for k in range(3000)),
    ]
    for c in cases:
        assert lzma_decode_alone(_z(c)) == c


def test_props_matrix():
    """lc/lp/pb reshape the literal-context and position-state model
    layout; liblzma enforces lc+lp <= 4."""
    cases = [b"hello world\n", b"ab" * 700,
             b"The quick brown fox. " * 100]
    for lc, lp, pb in [(0, 0, 0), (3, 0, 2), (0, 2, 0), (2, 2, 3),
                       (1, 1, 1), (4, 0, 4)]:
        for c in cases:
            z = _z(c, lc, lp, pb)
            assert z[0] == (pb * 5 + lp) * 9 + lc
            assert lzma_decode_alone(z) == c


def test_rep_distance_rotation():
    """Alternating between a small set of match distances exercises
    rep0..rep3 rotation paths."""
    pat = (b"alpha beta gamma " * 20 + b"alpha gamma beta " * 20
           + b"beta alpha gamma " * 20) * 5
    assert lzma_decode_alone(_z(pat)) == pat


def test_structural_errors():
    assert parse_lzma_doc(None)["error"] == "short or missing payload"
    assert parse_lzma_doc(b"\xff" + _z(b"x" * 50)[1:])["error"] \
        == "bad lzma properties byte"
    assert parse_lzma_doc(_z(b"x" * 500)[:-5])["error"] \
        == "unexpected end of stream"
    with pytest.raises(ValueError, match="output size cap"):
        lzma_decode_alone(_z(b"y" * 100000), max_out=1000)


def test_fuzz_never_raises():
    rng = random.Random(7)
    z = _z(b"Fuzz target content. " * 100)
    for _ in range(300):
        x = bytearray(z)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_lzma_doc(blob)
