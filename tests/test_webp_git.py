"""WebP container (operators/webp_real.py) and git loose objects
(operators/git_objects.py): dialect/identity round trips, gates, fuzz."""

from __future__ import annotations

import hashlib
import random
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.git_objects import (
    build_commit,
    build_tree,
    pack_loose,
    parse_loose,
)
from cies_ocr_java_spark.operators.webp_real import build_webp, parse_webp


# --- webp -----------------------------------------------------------------

def test_three_dialects():
    assert parse_webp(build_webp("lossy", 320, 240))["format"] == "lossy"
    r = parse_webp(build_webp("lossless", 16383, 100, alpha=True))
    assert (r["width"], r["height"], r["has_alpha"]) == (16383, 100, 1)
    r = parse_webp(build_webp("extended", 64, 48, alpha=True, exif=True))
    assert r["format"] == "extended" and r["flags"] == "alpha,exif"
    assert r["n_chunks"] == 3


def test_odd_chunk_pad_rule():
    # the EXIF chunk body is odd-sized; the walker must step the pad
    data = build_webp("extended", 32, 32, exif=True)
    r = parse_webp(data)
    assert r["error"] is None and "exif" in r["flags"]


@pytest.mark.parametrize(
    "kind,poison,err",
    [
        ("lossy", "riff_size", "riff size mismatch"),
        ("lossless", "vp8l_sig", "bad vp8l signature"),
        ("lossy", "start_code", "bad vp8 start code"),
        ("extended", "canvas_mismatch", "canvas/coded size mismatch"),
    ],
)
def test_webp_poisons(kind, poison, err):
    assert parse_webp(build_webp(kind, 64, 48, poison=poison))[
        "error"] == err


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=200), st.integers(0, 2 ** 32 - 1))
def test_webp_fuzz_never_raises(blob: bytes, seed: int):
    base = build_webp("extended", 64, 48, alpha=True, exif=True)
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_webp(data)
    assert (r["error"] is None) != (r["format"] is None)


# --- git loose objects ----------------------------------------------------

def test_object_id_is_envelope_digest():
    oid, blob = pack_loose("blob", b"hello")
    assert oid == hashlib.sha256(b"blob 5\x00hello").hexdigest()
    r = parse_loose(blob, oid)
    assert r["verified"] == 1 and r["otype"] == "blob" and r["size"] == 5


def test_tree_walk_sorted_and_commit_refs():
    b_oid, _ = pack_loose("blob", b"x")
    tc = build_tree([("100644", "z.txt", b_oid), ("40000", "a", b_oid)])
    t_oid, t_blob = pack_loose("tree", tc)
    r = parse_loose(t_blob, t_oid)
    assert r["tree_names"] == "a|z.txt" and r["tree_entries"] == 2
    c_oid, c_blob = parse_commit = pack_loose(
        "commit", build_commit(t_oid, [b_oid, b_oid], "A <a@x>", "m"))
    r = parse_loose(c_blob, c_oid)
    assert r["commit_tree"] == t_oid and r["n_parents"] == 2


def test_any_content_bitflip_changes_oid():
    oid, _ = pack_loose("blob", b"content-v1")
    oid2, _ = pack_loose("blob", b"content-v2")
    assert oid != oid2
    _, blob = pack_loose("blob", b"content-v1")
    assert parse_loose(blob, oid2)["verified"] == 0


@pytest.mark.parametrize(
    "env,err",
    [
        (b"tree 0\x00" + b"junk", "declared size mismatch"),
        (b"blobx 3\x00abc", "unknown object type 'blobx'"),
        (b"blob x\x00a", "malformed object header"),
        (b"noheader", "malformed object header"),
    ],
)
def test_git_envelope_gates(env: bytes, err: str):
    assert parse_loose(zlib.compress(env))["error"] == err


def test_unsorted_tree_rejected():
    b_oid, _ = pack_loose("blob", b"x")
    raw = (b"100644 b\x00" + bytes.fromhex(b_oid)
           + b"100644 a\x00" + bytes.fromhex(b_oid))
    env = b"tree %d\x00" % len(raw) + raw
    assert parse_loose(zlib.compress(env))["error"] == "unsorted tree"


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=200), st.integers(0, 2 ** 32 - 1))
def test_git_fuzz_never_raises(blob: bytes, seed: int):
    _, base = pack_loose("blob", b"fuzz target content")
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_loose(data, "0" * 64)
    assert (r["error"] is None) != (r["otype"] is None)
