"""RPM walker (operators/rpm_real.py): lead/header/cpio round-trip,
the IFD-style header store, newc hex grammar, alignment, fuzz."""

import hashlib
import random

import pytest

from cies_ocr_java_spark.operators.rpm_real import (
    build_cpio,
    build_rpm,
    parse_cpio,
    parse_rpm,
)


def _mk(i, **kw):
    pkg = f"pkg-{i % 13}"
    files = [(f"./opt/{pkg}/f{k}.txt",
              (f"rpm {i} file {k}\n" * (2 + (i + k) % 3)).encode())
             for k in range(1 + i % 3)]
    return build_rpm(pkg, f"2.{i % 5}", str(1 + i % 7),
                     "noarch" if i % 2 else "x86_64", files,
                     **kw), files


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        rpm, files = _mk(i)
        m = parse_rpm(rpm)
        assert m["error"] is None
        assert m["name"] == f"pkg-{i % 13}"
        assert m["version"] == f"2.{i % 5}"
        assert m["release"] == str(1 + i % 7)
        blob = b"".join(d for _n, d in files)
        assert m["size_tag"] == len(blob) == m["file_bytes"]
        assert m["n_files"] == len(files)
        assert m["files_md5"] == hashlib.md5(blob).hexdigest()


def test_cpio_newc_grammar():
    files = [("a.txt", b"xyz"), ("dir/b.bin", bytes(range(7)))]
    got = parse_cpio(build_cpio(files))
    assert got == files
    # 4-alignment: every header starts on a 4-byte boundary
    raw = build_cpio(files)
    pos = 0
    while raw[pos:pos + 6] == b"070701":
        assert pos % 4 == 0
        nsize = int(raw[pos + 94:pos + 102], 16)
        fsize = int(raw[pos + 54:pos + 62], 16)
        pos += 110 + nsize
        pos += -((110 + nsize) % 4) % 4
        pos += fsize + (-fsize % 4)
    with pytest.raises(ValueError, match="bad cpio magic"):
        parse_cpio(b"070702" + raw[6:])
    with pytest.raises(ValueError, match="bad cpio hex field"):
        parse_cpio(b"070701" + b"ZZ" + raw[8:])


def test_poison_tiers():
    assert parse_rpm(_mk(3, bad_hdr_magic=True)[0])["error"] \
        == "bad header magic in main"
    assert parse_rpm(_mk(3, bad_cpio_magic=True)[0])["error"] \
        == "payload: bad cpio magic in entry 1"
    assert parse_rpm(None)["error"] == "short or missing payload"
    rpm, _ = _mk(3)
    assert parse_rpm(b"\xed\xab\xee\xdc" + rpm[4:])["error"] \
        == "bad rpm lead magic"
    bad = bytearray(rpm)
    bad[4] = 4
    assert parse_rpm(bytes(bad))["error"] == "unsupported rpm version"


def test_fuzz_never_raises():
    rng = random.Random(43)
    for seed in (4, 5):
        base, _ = _mk(seed)
        for _ in range(400):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_rpm(blob)
