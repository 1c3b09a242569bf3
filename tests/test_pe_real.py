"""PE walker (operators/pe_real.py): e_lfanew chase, two-level RVA
resolution, section roster, poison tiers, fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.pe_real import build_pe, parse_pe


def _mk(i, **kw):
    ne = 1 + i % 4
    return build_pe(
        machine=0x8664 if i % 2 == 0 else 0xAA64,
        subsystem=3 if i % 3 else 2,
        timestamp=1700000000 + i * 37,
        exports=[f"Graft{i % 9}Fn{k}" for k in range(ne)],
        dll_name=f"graft{i % 7}.dll",
        extra_sections=[f".g{k}" for k in range(i % 3)], **kw), ne


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        b, ne = _mk(i)
        r = parse_pe(b)
        assert r["error"] is None
        assert r["machine"] == ("x86_64" if i % 2 == 0 else "arm64")
        assert r["subsystem"] == ("console" if i % 3 else "gui")
        assert r["n_sections"] == 2 + i % 3
        assert r["dll_name"] == f"graft{i % 7}.dll"
        assert r["n_exports"] == ne
        assert r["export_names"] \
            == ",".join(f"Graft{i % 9}Fn{k}" for k in range(ne))


def test_lfanew_is_honored_not_assumed():
    """Growing the DOS stub (moving PE\\0\\0) must still parse as long
    as e_lfanew is updated — the pointer is the interface."""
    b, _ = _mk(2)
    (lfanew,) = struct.unpack_from("<I", b, 0x3C)
    grown = bytearray(b[:lfanew] + b"\x90" * 32 + b[lfanew:])
    struct.pack_into("<I", grown, 0x3C, lfanew + 32)
    # raw section offsets shifted by 32: fix them up in the table
    opt_at = lfanew + 32 + 24
    (opt_size,) = struct.unpack_from("<H", grown, lfanew + 32 + 20)
    (nsect,) = struct.unpack_from("<H", grown, lfanew + 32 + 6)
    sect_at = opt_at + opt_size
    for k in range(nsect):
        (off,) = struct.unpack_from("<I", grown, sect_at + 40 * k + 20)
        struct.pack_into("<I", grown, sect_at + 40 * k + 20, off + 32)
    r = parse_pe(bytes(grown).ljust(len(b) + 32, b"\x00"))
    assert r["error"] is None
    assert r["dll_name"] == "graft2.dll"


def test_poison_tiers():
    assert parse_pe(_mk(3, bad_lfanew=True)[0])["error"] \
        == "e_lfanew out of file"
    assert parse_pe(_mk(3, bad_export_rva=True)[0])["error"] \
        == "export directory rva not mapped by any section"
    assert parse_pe(None)["error"] == "not a dos/pe executable"
    b, _ = _mk(3)
    (lfanew,) = struct.unpack_from("<I", b, 0x3C)
    bad = bytearray(b)
    bad[lfanew + 3] = 1
    assert parse_pe(bytes(bad))["error"] == "bad pe signature"
    # PE32 (0x10B) instead of PE32+
    bad = bytearray(b)
    struct.pack_into("<H", bad, lfanew + 24, 0x10B)
    assert parse_pe(bytes(bad))["error"] \
        == "unsupported optional magic 0x10b"


def test_fuzz_never_raises():
    rng = random.Random(59)
    base, _ = _mk(5)
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_pe(blob)
