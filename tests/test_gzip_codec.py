"""Real gzip (RFC 1952) member walker (operators/archive.py): multi-member
streams, optional-field walk (FEXTRA/FNAME/FCOMMENT/FHCRC), trailer
verification, cross-validation against stdlib gzip both directions, the
tar.gz composition, and the failure contract."""

from __future__ import annotations

import gzip
import struct
import zlib

from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.archive import (
    build_gzip,
    build_gzip_member,
    build_tar,
    gunzip_members,
    parse_gzip,
    parse_targz,
)


def test_round_trip_and_stdlib_cross_validation():
    members = [("a.txt", "hello".encode()),
               ("b.txt", " wörld 中文 🙂".encode()),
               ("empty", b"")]
    b = build_gzip(members, extra=b"XT\x02\x00ab", comment="note")
    r = parse_gzip(b)
    assert r["error"] is None
    assert r["n_members"] == 3
    assert r["member_names"] == "a.txt,b.txt,empty"
    assert r["text"] == "hello wörld 中文 🙂"
    assert r["total_bytes"] == sum(len(d) for _, d in members)
    # stdlib gzip must read the whole multi-member stream
    assert gzip.decompress(b) == b"".join(d for _, d in members)


def test_parses_stdlib_written_streams():
    b = gzip.compress(b"from stdlib", mtime=0) + gzip.compress(
        b" second member", mtime=0
    )
    r = parse_gzip(b)
    assert r["error"] is None
    assert r["n_members"] == 2
    assert r["text"] == "from stdlib second member"
    # stdlib writes no FNAME: names join to empty strings
    assert r["member_names"] == ","


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=300), min_size=1, max_size=4),
       st.booleans(), st.booleans())
def test_round_trip_property(texts, use_extra, use_comment):
    members = [(f"m{i}", t.encode()) for i, t in enumerate(texts)]
    b = build_gzip(
        members,
        extra=b"AB\x01\x00x" if use_extra else None,
        comment="c" if use_comment else None,
    )
    r = parse_gzip(b)
    assert r["error"] is None and r["text"] == "".join(texts)
    assert gzip.decompress(b) == "".join(texts).encode()


def test_fixed_check_order_and_failure_contract():
    b = build_gzip([("a", b"data"), ("b", b"more")])
    # reserved FLG bit (byte 3 of member 0) — fires before the FHCRC check
    assert parse_gzip(b[:3] + bytes([b[3] | 0x80]) + b[4:])["error"] == (
        "reserved FLG bits set"
    )
    # last member's stored CRC32 (fixed offset len-8)
    assert parse_gzip(b[:-8] + bytes([b[-8] ^ 0xFF]) + b[-7:])["error"] == (
        "member crc32 mismatch"
    )
    # ISIZE field (fixed offset len-4)
    assert parse_gzip(b[:-4] + bytes([b[-4] ^ 0xFF]) + b[-3:])["error"] == (
        "isize mismatch"
    )
    one = build_gzip_member("n", b"x" * 4096)
    assert parse_gzip(one[:-12])["error"] == "truncated member"
    assert parse_gzip(one[:-3])["error"] == "truncated member trailer"
    assert parse_gzip(None)["error"] == "short or missing payload"
    assert parse_gzip(b"\x1f\x8c" + b"x" * 20)["error"] == "bad magic"
    cm = b[:2] + b"\x09" + b[3:]
    assert parse_gzip(cm)["error"] == "unsupported compression method"
    # header crc gate: flip a byte of the stored FNAME (inside FHCRC scope)
    j = b.index(b"a\x00")
    hb = b[:j] + b"q" + b[j + 1:]
    assert parse_gzip(hb)["error"] == "header crc mismatch"
    # non-utf8 member payload: valid gzip of invalid utf-8
    bad = build_gzip_member(None, b"\xff\xfe\x00")
    assert parse_gzip(bad)["error"] == "non-utf8 member payload"
    assert gunzip_members(bad)["error"] is None  # binary view still walks


def test_targz_composition_and_two_tier_degradation():
    tar = build_tar([("p1", "alpha"), ("p2", "beta")])
    ok = build_gzip([("doc.tar", tar)])
    r = parse_targz(ok)
    assert r["error"] is None and r["n_members"] == 2
    assert r["text"] == "alphabeta"
    # multi-member gzip decompresses to the concatenation: split the tar
    # bytes across two members and the tar walk must not notice
    half = len(tar) // 2
    split = build_gzip([("x", tar[:half]), ("y", tar[half:])])
    assert parse_targz(split)["text"] == "alphabeta"
    # gzip tier fires first
    gz_bad = ok[:-4] + bytes([ok[-4] ^ 0xFF]) + ok[-3:]
    assert parse_targz(gz_bad)["error"] == "isize mismatch"
    # tar tier keeps its own error string
    tar_bad = build_gzip([("doc.tar", bytes([tar[0] ^ 1]) + tar[1:])])
    assert parse_targz(tar_bad)["error"] == "header checksum mismatch"


def test_trailer_fields_match_rfc1952():
    data = b"rfc1952 payload bytes"
    b = build_gzip_member("n", data)
    crc, isize = struct.unpack("<II", b[-8:])
    assert crc == zlib.crc32(data) & 0xFFFFFFFF
    assert isize == len(data)
