"""deb walker (operators/deb_real.py): four-layer composition
round-trip, ar header grammar, per-layer error attribution, fuzz."""

import hashlib
import random

import pytest

from cies_ocr_java_spark.operators.deb_real import (
    build_ar,
    build_deb,
    parse_ar,
    parse_deb,
)


def _mk(i, **kw):
    pkg = f"pkg-{i % 13}"
    files = [(f"./usr/share/doc/{pkg}/f{k}.txt",
              f"data {i} file {k}\n" * (2 + (i + k) % 3))
             for k in range(1 + i % 3)]
    return build_deb(pkg, f"1.{i % 7}.{i % 5}",
                     "amd64" if i % 2 else "arm64", files,
                     data_compression="xz" if i % 2 == 0 else "gz",
                     **kw), files


def test_four_layer_round_trip():
    for i in [0, 1, 2, 3, 7, 12]:
        deb, files = _mk(i)
        m = parse_deb(deb)
        assert m["error"] is None
        assert m["n_ar_members"] == 3
        assert m["package"] == f"pkg-{i % 13}"
        assert m["version"] == f"1.{i % 7}.{i % 5}"
        assert m["control_fields"] == 4
        assert m["data_files"] == len(files)
        text = "".join(t for _, t in files)
        assert m["data_bytes"] == len(text)
        assert m["data_md5"] == hashlib.md5(text.encode()).hexdigest()
        assert m["compression"] == ("xz" if i % 2 == 0 else "gz")


def test_ar_grammar():
    ms = [("a", b"x"), ("b", b"yz"), ("longest-name-16c", b"")]
    assert parse_ar(build_ar(ms)) == ms
    # odd-size members are newline-padded to even offsets
    raw = build_ar([("odd", b"abc")])
    assert len(raw) % 2 == 0
    with pytest.raises(ValueError, match="bad ar magic"):
        parse_ar(b"!<arch>!" + raw[8:])
    with pytest.raises(ValueError, match="name too long"):
        build_ar([("x" * 17, b"")])


def test_per_layer_error_attribution():
    assert parse_deb(_mk(3, bad_version=True)[0])["error"] \
        == "unsupported deb version"
    deb, _ = _mk(3)
    bad = bytearray(deb)
    bad[72 + 58] = 0x21
    assert parse_deb(bytes(bad))["error"] \
        == "bad ar member magic in member 1"
    # corrupt a byte INSIDE the gzip control member: the gzip layer
    # must name itself
    deb, _ = _mk(5)
    members = parse_ar(deb)
    control_off = deb.index(members[1][1])
    bad = bytearray(deb)
    bad[control_off + 20] ^= 0xFF
    err = parse_deb(bytes(bad))["error"]
    assert err.startswith("control: ") or err.startswith("bad ")
    assert parse_deb(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(29)
    for seed in (4, 5):
        base, _ = _mk(seed)
        for _ in range(300):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_deb(blob)
