"""Real ustar reader/writer (operators/archive.py): checksum-verified
header walk, cross-validation against stdlib tarfile both directions,
and the failure contract."""

from __future__ import annotations

import io
import random
import tarfile

from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.archive import (
    build_tar,
    extract_tar_features,
    parse_tar,
)


def test_round_trip_and_tarfile_cross_validation():
    members = [("a.txt", "hello"), ("b/c", "wörld 中文 🙂"),
               ("big", "x" * 1500), ("empty", "")]
    b = build_tar(members)
    r = parse_tar(b)
    assert r["error"] is None and r["n_members"] == 4
    assert r["text"] == "".join(t for _, t in members)
    tf = tarfile.open(fileobj=io.BytesIO(b))
    assert tf.getnames() == [n for n, _ in members]
    for n, t in members:
        assert tf.extractfile(n).read().decode() == t


def test_parses_tarfile_written_archives():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for n, t in [("m1", "from tarfile"), ("m2", "second")]:
            d = t.encode()
            info = tarfile.TarInfo(n)
            info.size = len(d)
            tf.addfile(info, io.BytesIO(d))
    r = parse_tar(buf.getvalue())
    assert r["error"] is None and r["text"] == "from tarfilesecond"


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=300), min_size=1, max_size=4))
def test_round_trip_property(texts):
    members = [(f"m{i}", t) for i, t in enumerate(texts)]
    r = parse_tar(build_tar(members))
    assert r["error"] is None and r["text"] == "".join(texts)


def test_checksum_gate_catches_header_corruption():
    b = build_tar([("a", "data")])
    bad = bytes([b[0] ^ 0x01]) + b[1:]
    assert parse_tar(bad)["error"] == "header checksum mismatch"


def test_failure_contract():
    b = build_tar([("a", "data")])
    assert parse_tar(b[:1200])["error"] == "missing end-of-archive blocks"
    assert parse_tar(b[:700])["error"] in (
        "short or missing payload", "truncated member data"
    )
    assert parse_tar(None)["error"] == "short or missing payload"
    assert parse_tar(b"\x00" * 512)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(29)
    for _ in range(200):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 1600)))
        r = parse_tar(blob)
        assert (r["text"] is None) == (r["error"] is not None)


def test_spark_tar_extraction(spark):
    rows = [
        (1, build_tar([("a", "one"), ("b", "two")])),
        (2, build_tar([("a", "x")])[:1200]),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in extract_tar_features(df).collect()}
    assert out[1]["text"] == "onetwo" and out[1]["n_members"] == 2
    assert out[2]["error"] == "missing end-of-archive blocks"
    assert out[3]["error"] == "short or missing payload"


# ---------------------------------------------------------------------------
# pax / GNU long-name extensions (build_tar_pax / parse_tar_names)
# ---------------------------------------------------------------------------

def test_pax_longnames_round_trip_and_system_tar_interop():
    import os
    import subprocess
    import tempfile

    from cies_ocr_java_spark.operators.archive import (
        build_tar_pax,
        parse_tar_names,
    )

    members = [
        ("short.txt", "hello "),
        ("dir/" + "x" * 150 + ".txt", "gnu "),     # odd idx -> GNU 'L'
        ("deep/" + "y" * 200 + "/f.md", "pax "),   # even idx -> pax 'x'
        ("z.txt", "tail"),
    ]
    t = build_tar_pax(members)
    r = parse_tar_names(t)
    assert r["error"] is None
    assert r["names"].split("|") == [m[0] for m in members]
    assert r["longest_name"] == 210
    assert r["text"] == "hello gnu pax tail"
    # interop: the SYSTEM tar must list the same names
    with tempfile.NamedTemporaryFile(suffix=".tar", delete=False) as f:
        f.write(t)
        path = f.name
    try:
        out = subprocess.run(["tar", "-tf", path], capture_output=True,
                             text=True)
    finally:
        os.unlink(path)
    if out.returncode == 0:  # tar binary present
        assert out.stdout.strip().split("\n") == [m[0] for m in members]


def test_pax_length_is_self_counting():
    from cies_ocr_java_spark.operators.archive import build_tar_pax

    name = "p/" + "q" * 120
    t = build_tar_pax([(name, "v"), ("r.txt", "w")])
    # locate the pax record: "<len> path=<name>\n" where len counts its
    # own digits
    at = t.index(b" path=")
    digits = t[:at].split(b"\x00")[-1]
    rec_len = int(digits)
    assert rec_len == len(digits) + 1 + len(b"path=" + name.encode()) + 1


def test_pax_poisons():
    from cies_ocr_java_spark.operators.archive import (
        build_tar_pax,
        parse_tar_names,
    )

    members = [("a" * 150 + ".txt", "x"), ("b.txt", "y")]
    r = parse_tar_names(build_tar_pax(members, poison="bad_pax_len"))
    assert r["error"] == "bad pax record length"
    t = bytearray(build_tar_pax(members))
    t[148] = ord("1")
    assert parse_tar_names(bytes(t))["error"] == (
        "header checksum mismatch")


def test_parse_tar_names_fuzz_never_raises():
    import random

    from cies_ocr_java_spark.operators.archive import (
        build_tar_pax,
        parse_tar_names,
    )

    base = build_tar_pax([("n" * 130, "x"), ("m.txt", "y")])
    rng = random.Random(11)
    for _ in range(120):
        mode = rng.randrange(3)
        if mode == 0:
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(
                1200)))
        elif mode == 1:
            at = rng.randrange(len(base))
            data = base[:at] + bytes([rng.randrange(256)]) + base[at + 1:]
        else:
            data = base[: rng.randrange(len(base))]
        r = parse_tar_names(data)
        assert (r["error"] is None) != (r["names"] is None)
