"""ELF walker (operators/elf_real.py): two-level string resolution,
note alignment, both byte orders, bounds gates, fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.elf_real import (
    build_elf,
    build_note,
    parse_elf,
)


def _mk(i, **kw):
    return build_elf(
        machine=0x3E if i % 2 == 0 else 0xB7,
        etype=3 if i % 3 else 2,
        comment=f"GCC: (graft) 13.{i % 3}.0",
        build_id=bytes((i * 7 + k) % 256 for k in range(20)),
        symbols=[f"fn_{i}_{k}" for k in range(1 + i % 4)],
        big_endian=i % 5 == 0, **kw)


def test_round_trip_both_byte_orders():
    for i in [0, 1, 2, 3, 4, 5, 7, 12, 30]:
        m = parse_elf(_mk(i))
        assert m["error"] is None
        assert m["machine"] == ("x86_64" if i % 2 == 0 else "aarch64")
        assert m["etype"] == ("DYN" if i % 3 else "EXEC")
        assert m["endian"] == ("BE" if i % 5 == 0 else "LE")
        assert m["n_sections"] == 6
        assert m["comment"] == f"GCC: (graft) 13.{i % 3}.0"
        assert m["build_id"] \
            == bytes((i * 7 + k) % 256 for k in range(20)).hex()
        assert m["n_symbols"] == 1 + i % 4
        assert m["sym_names"] \
            == ",".join(f"fn_{i}_{k}" for k in range(1 + i % 4))


def test_symbol_names_come_from_strtab_not_shstrtab():
    """Repointing the symtab's sh_link at .shstrtab (index 5) makes
    symbol names read as section names — the conflation bug must be
    visible, proving the parser honors sh_link."""
    b = bytearray(_mk(2))
    # section header table is last: entries of 64 bytes; symtab is
    # entry 3 (after NULL); its sh_link field sits at offset 40
    shoff = struct.unpack_from("<Q", b, 40)[0]
    link_at = shoff + 64 * 3 + 40
    assert struct.unpack_from("<I", b, link_at)[0] == 4
    struct.pack_into("<I", b, link_at, 5)
    m = parse_elf(bytes(b))
    assert m["error"] is None
    assert m["sym_names"] != parse_elf(_mk(2))["sym_names"]


def test_note_alignment_padding():
    n = build_note("GNU", 3, b"\x01\x02\x03", "<")  # desc not 4-aligned
    assert len(n) % 4 == 0
    nsz, dsz, typ = struct.unpack_from("<III", n, 0)
    assert (nsz, dsz, typ) == (4, 3, 3)


def test_bounds_gates():
    assert parse_elf(_mk(3, bad_shoff=True))["error"] \
        == "section headers out of bounds"
    assert parse_elf(_mk(3, bad_shstrndx=True))["error"] \
        == "bad shstrndx"
    assert parse_elf(None)["error"] == "not an elf binary"
    b = bytearray(_mk(3))
    b[4] = 1  # ELF32
    assert parse_elf(bytes(b))["error"] == "not elf64"


def test_fuzz_never_raises():
    rng = random.Random(23)
    for seed in (6, 5):
        base = _mk(seed)
        for _ in range(500):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            m = parse_elf(bytes(x[:rng.randrange(len(x) + 1)]))
            assert "error" in m
