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
