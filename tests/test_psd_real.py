"""PSD walker (operators/psd_real.py): PackBits two-part RLE rows,
negative layer counts, per-layer-per-channel data, gates, fuzz."""

import random

from cies_ocr_java_spark.operators.psd_real import (
    build_psd,
    packbits_decode,
    packbits_encode,
    parse_psd,
)


def _layers(i):
    out = []
    for j in range(1 + i % 3):
        h, w = 2 + (i + j) % 4, 3 + (i + 2 * j) % 5
        chans = []
        for c in range(3):
            if j == 0 and c == 0:
                blob = bytes((i + t) % 256 for t in range(h * w))
            else:
                blob = bytes([(i + 11 * j + 29 * c) % 251]) * (h * w)
            chans.append(blob)
        out.append({"name": f"L{j}", "top": j, "left": 2 * j,
                    "h": h, "w": w, "channels": chans})
    return out


def test_packbits_round_trip_property():
    rng = random.Random(0xB175)
    for _ in range(500):
        n = rng.randrange(0, 80)
        row = bytes(rng.choice((rng.randrange(256), 7))
                    for _ in range(n))
        assert packbits_decode(packbits_encode(row), n) == row


def test_packbits_128_is_noop():
    assert packbits_decode(b"\x80\x01ab", 2) == b"ab"


def test_round_trip_sweep():
    for i in range(40):
        ls = _layers(i)
        r = parse_psd(build_psd(10 + i % 6, 8 + i % 5, ls,
                                alpha_merge=i % 2 == 0))
        assert r["error"] is None, (i, r)
        assert r["n_layers"] == len(ls)
        assert r["alpha_merge"] == (1 if i % 2 == 0 else 0)
        assert r["layer_px"] == sum(x["h"] * x["w"] for x in ls)
        assert r["content_sum"] == sum(
            sum(c) for x in ls for c in x["channels"])


def test_negative_layer_count_means_alpha():
    ls = _layers(2)
    with_a = parse_psd(build_psd(10, 8, ls, alpha_merge=True))
    without = parse_psd(build_psd(10, 8, ls, alpha_merge=False))
    assert with_a["n_layers"] == without["n_layers"] == len(ls)
    assert (with_a["alpha_merge"], without["alpha_merge"]) == (1, 0)


def test_gates():
    ls = _layers(3)
    assert parse_psd(build_psd(10, 8, ls, bad_version=True)) \
        ["error"] == "unsupported version"
    assert parse_psd(build_psd(10, 8, ls, lie_rowcount=True)) \
        ["error"] == "rle row length mismatch"
    assert parse_psd(build_psd(10, 8, ls, chop=5))["error"] \
        == "merged image size mismatch"
    assert parse_psd(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0xB176)
    base = build_psd(10, 8, _layers(5))
    for _ in range(400):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_psd(blob)
