"""Real ZIP reader/writer (operators/archive.py): round trips
cross-validated against stdlib zipfile in BOTH directions, the
trust-then-verify local-header rule, and the failure contract."""

from __future__ import annotations

import io
import random
import struct
import zipfile

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.archive import (
    build_zip,
    extract_zip_features,
    parse_zip,
)


def test_round_trip_and_zipfile_cross_validation():
    members = [
        ("a.txt", "hello", 0),
        ("b/c.txt", "wörld 中文 🙂", 8),
        ("empty", "", 0),
        ("big", "y" * 5000, 8),
    ]
    b = build_zip(members)
    r = parse_zip(b)
    assert r["error"] is None
    assert r["n_members"] == 4 and r["methods"] == "0,8,0,8"
    assert r["text"] == "".join(t for _, t, _ in members)
    # an INDEPENDENT implementation must accept the writer's output...
    zf = zipfile.ZipFile(io.BytesIO(b))
    assert zf.namelist() == [n for n, _, _ in members]
    assert zf.testzip() is None
    for n, t, _ in members:
        assert zf.read(n).decode() == t


def test_parses_zipfile_written_archives():
    """...and the reader must accept archives an independent writer made."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("m1.txt", "from zipfile")
        z.writestr("m2.txt", "second member")
    r = parse_zip(buf.getvalue())
    assert r["error"] is None
    assert r["text"] == "from zipfilesecond member"
    assert r["methods"] == "8,8"


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=200), min_size=1, max_size=4),
       st.integers(0, 1))
def test_round_trip_property(texts, parity):
    members = [
        (f"m{i}", t, 8 if (i + parity) % 2 == 0 else 0)
        for i, t in enumerate(texts)
    ]
    r = parse_zip(build_zip(members))
    assert r["error"] is None and r["text"] == "".join(texts)


def test_crc_gate_catches_flipped_byte():
    b = build_zip([("a", "payload-here", 0)])
    i = b.index(b"payload-here")
    assert parse_zip(b[:i] + b"X" + b[i + 1:])["error"] == "crc mismatch"


def test_wrong_local_offset_fails_never_scans():
    b = bytearray(build_zip([("a", "data", 8)]))
    cd = b.rindex(b"PK\x01\x02")
    struct.pack_into("<I", b, cd + 42, 7)  # poison the local-header offset
    r = parse_zip(bytes(b))
    assert r["error"] in (
        "local header offset is wrong", "central/local name mismatch"
    )


def test_failure_contract():
    b = build_zip([("a", "x", 0)])
    assert parse_zip(b[:-4])["error"] == "truncated end-of-central-directory"
    assert parse_zip(b"")["error"] == "short or missing payload"
    assert parse_zip(b"garbage" * 10)["error"] == (
        "missing end-of-central-directory"
    )


def test_fuzz_never_raises():
    rng = random.Random(23)
    for _ in range(300):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        for data in (blob, b"PK\x03\x04" + blob):
            r = parse_zip(data)
            assert (r["text"] is None) == (r["error"] is not None)


def test_spark_zip_extraction(spark):
    rows = [
        (1, build_zip([("a", "one", 0), ("b", "two", 8)])),
        (2, build_zip([("a", "x", 0)])[:-4]),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in extract_zip_features(df).collect()}
    assert out[1]["text"] == "onetwo" and out[1]["methods"] == "0,8"
    assert out[2]["error"] == "truncated end-of-central-directory"
    assert out[3]["error"] == "short or missing payload"


# ---------------------------------------------------------------------------
# ZIP64 (build_zip64 grafted into the shared walk)
# ---------------------------------------------------------------------------

def test_zip64_round_trip_and_zipfile_interop():
    import io
    import zipfile

    from cies_ocr_java_spark.operators.archive import build_zip64, parse_zip

    members = [("a.txt", "hello ", 0), ("b/c.md", "deflated " * 30, 8)]
    z = build_zip64(members)
    r = parse_zip(z)
    assert r["error"] is None and r["n_members"] == 2
    assert r["text"].startswith("hello deflated")
    zf = zipfile.ZipFile(io.BytesIO(z))
    assert zf.namelist() == ["a.txt", "b/c.md"]
    assert zf.read("a.txt") == b"hello "


def test_zip64_extra_is_conditional_per_field():
    # only saturated fields get u64s: a hand-built entry with ONLY the
    # offset saturated must read a 8-byte extra, not 24
    import struct

    from cies_ocr_java_spark.operators.archive import (
        build_zip,
        walk_zip_members,
    )

    z = bytearray(build_zip([("k.txt", "vv", 0)]))
    # saturate the central entry's local-header offset (last I field)
    at = z.index(b"PK\x01\x02")
    off_at = at + 42
    (real_off,) = struct.unpack_from("<I", z, off_at)
    struct.pack_into("<I", z, off_at, 0xFFFFFFFF)
    # splice an 8-byte zip64 extra after the name, fix elen + eocd sizes
    name_end = at + 46 + 5
    extra = struct.pack("<HHQ", 0x0001, 8, real_off)
    struct.pack_into("<H", z, at + 30, len(extra))  # extra length field
    z2 = z[:name_end] + extra + z[name_end:]
    # fix EOCD cd_size (+len(extra)); cd_off unchanged
    e = z2.index(b"PK\x05\x06")
    (cd_size,) = struct.unpack_from("<I", z2, e + 12)
    z2 = bytearray(z2)
    struct.pack_into("<I", z2, e + 12, cd_size + len(extra))
    members, err = walk_zip_members(bytes(z2))
    assert err is None and members[0][0] == "k.txt"


def test_zip64_poisons():
    from cies_ocr_java_spark.operators.archive import (
        build_zip64,
        walk_zip_members,
    )

    members = [("a.txt", "x", 0)]
    for pz, want in (("locator_sig", "bad zip64 locator"),
                     ("eocd64_sig", "bad zip64 eocd"),
                     ("no_extra", "missing zip64 extra")):
        _, err = walk_zip_members(build_zip64(members, poison=pz))
        assert err == want, (pz, err)


def test_zip64_fuzz_never_raises():
    import random

    from cies_ocr_java_spark.operators.archive import (
        build_zip64,
        parse_zip,
    )

    base = build_zip64([("a.txt", "fuzz " * 20, 8), ("b.txt", "x", 0)])
    rng = random.Random(13)
    for _ in range(150):
        mode = rng.randrange(3)
        if mode == 0:
            data = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(400)))
        elif mode == 1:
            at = rng.randrange(len(base))
            data = base[:at] + bytes([rng.randrange(256)]) + base[at + 1:]
        else:
            data = base[: rng.randrange(len(base))]
        r = parse_zip(data)
        assert (r["error"] is None) != (r["text"] is None)


class TestStreamedZip:
    """Bit-3 streamed members: zero local sizes, data descriptors
    (signed AND signatureless), descriptor-vs-directory agreement,
    stdlib interop."""

    def _members(self, i):
        return [(f"m{k}.bin",
                 bytes((i + k + t) % 256
                       for t in range(20 + (i + 13 * k) % 60)),
                 8 if (i + k) % 2 else 0)
                for k in range(2 + i % 3)]

    def test_round_trip_sweep(self):
        from cies_ocr_java_spark.operators.archive import (
            build_zip_streamed,
            parse_zip_streamed,
        )
        for i in range(30):
            ms = self._members(i)
            r = parse_zip_streamed(build_zip_streamed(ms))
            assert r["error"] is None, (i, r)
            assert r["n_members"] == r["n_streamed"] == len(ms)
            # every 2nd descriptor carries the PK\x07\x08 signature
            assert r["n_signed_desc"] == (len(ms) + 1) // 2
            assert r["content_sum"] == sum(
                sum(d) for _, d, _ in ms)

    def test_stdlib_zipfile_opens_streamed_output(self):
        import io
        import zipfile

        from cies_ocr_java_spark.operators.archive import (
            build_zip_streamed,
        )
        ms = self._members(3)
        z = zipfile.ZipFile(io.BytesIO(build_zip_streamed(ms)))
        for name, d, _m in ms:
            assert z.read(name) == d

    def test_gates(self):
        from cies_ocr_java_spark.operators.archive import (
            build_zip_streamed,
            parse_zip_streamed,
        )
        ms = self._members(3)
        assert parse_zip_streamed(build_zip_streamed(
            ms, nonzero_local=True))["error"] \
            == "streamed member with nonzero local sizes"
        assert parse_zip_streamed(build_zip_streamed(
            ms, lie_descriptor=True))["error"] \
            == "descriptor disagrees with directory"

    def test_signatureless_descriptor_crc_collides_with_signature(self):
        """APPNOTE ambiguity: a signatureless descriptor whose CRC field
        equals 0x08074B50 (the PK\\x07\\x08 magic, little-endian) sniffs
        as signed. The parser must fall back to the signatureless
        interpretation when the signed reading fails the central-
        directory cross-check — forged here by solving the affine CRC32
        map for a 4-byte suffix over GF(2)."""
        import zlib

        from cies_ocr_java_spark.operators.archive import (
            build_zip_streamed,
            parse_zip_streamed,
        )

        def forge_crc(prefix: bytes, target: int) -> bytes:
            # crc32(prefix + x) is affine in the 32 bits of x for
            # fixed-length messages: f(x) = f(0) XOR L(x). Build L's
            # basis, then Gaussian-eliminate L(x) = target XOR f(0).
            f0 = zlib.crc32(prefix + b"\x00\x00\x00\x00") & 0xFFFFFFFF
            basis = []
            for bit in range(32):
                xb = (1 << bit).to_bytes(4, "little")
                basis.append((zlib.crc32(prefix + xb) ^ f0)
                             & 0xFFFFFFFF)
            want = (target ^ f0) & 0xFFFFFFFF
            # solve sum of chosen basis vectors == want
            rows = [(basis[i], 1 << i) for i in range(32)]
            x = 0
            for col in range(31, -1, -1):
                piv = next((j for j, (v, _) in enumerate(rows)
                            if v >> col & 1), None)
                assert piv is not None, "CRC basis is full rank"
                pv, px = rows.pop(piv)
                rows = [(v ^ pv, m ^ px) if v >> col & 1 else (v, m)
                        for v, m in rows]
                if want >> col & 1:
                    want ^= pv
                    x ^= px
            assert want == 0
            return prefix + x.to_bytes(4, "little")

        payload = forge_crc(b"ambiguous-descriptor-", 0x08074B50)
        assert zlib.crc32(payload) & 0xFFFFFFFF == 0x08074B50
        # member 0 signed, member 1 signatureless with the forged CRC
        ms = [("a.bin", b"plain first member", 0),
              ("b.bin", payload, 0)]
        r = parse_zip_streamed(
            build_zip_streamed(ms, signed_desc_every=1000))
        assert r["error"] is None, r
        assert r["n_members"] == r["n_streamed"] == 2
        assert r["n_signed_desc"] == 1
        assert r["content_sum"] == sum(sum(d) for _, d, _ in ms)

    def test_fuzz_never_raises(self):
        import random

        from cies_ocr_java_spark.operators.archive import (
            build_zip_streamed,
            parse_zip_streamed,
        )
        rng = random.Random(0x708)
        base = build_zip_streamed(self._members(7))
        for _ in range(300):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_zip_streamed(blob)
