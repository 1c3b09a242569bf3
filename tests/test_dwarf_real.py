"""DWARF line-program VM (operators/dwarf_real.py): per-unit tuned
special opcodes, const_add_pc non-emission, end_sequence reset,
gcc/readelf interop (committed section + live toolchain when
present), gates, fuzz."""

import pathlib
import random
import re
import shutil
import subprocess

import pytest

from cies_ocr_java_spark.operators.dwarf_real import (
    build_line_program,
    parse_line_programs,
)

_VEC = pathlib.Path(__file__).parent / "data" / "gcc_debug_line_dw4.bin"

_SEQS = [
    [("addr", 0x1000), ("special", 0), ("special", 14),
     ("adv_pc", 5), ("copy",), ("adv_line", 10), ("special", 30),
     ("const_pc",), ("fixed_pc", 7), ("copy",)],
    [("addr", 0x2000), ("file", 2), ("col", 9), ("neg_stmt",),
     ("special", 25)],
]

_C_SRC = """
int add(int a, int b) {
    int s = a + b;
    if (s > 10)
        s -= 3;
    return s;
}
int main(void) {
    int x = add(4, 9);
    for (int k = 0; k < 3; k++)
        x += add(k, x);
    return x & 0xFF;
}
"""


def test_vm_hand_computed_rows():
    r = parse_line_programs(build_line_program(["a.c", "b.h"],
                                               _SEQS))
    assert r["error"] is None
    # line_base=-3 line_range=12 opcode_base=13: seq 1 emits at
    # (0x1000,-2)(0x1001,-3)(0x1006,-3)(0x1008,10)(0x1023,10) and
    # the end row repeats (0x1023,10); const_add_pc advanced 20
    # WITHOUT emitting; seq 2 emits (0x2002,-1) twice
    rows = [(0x1000, -2), (0x1001, -3), (0x1006, -3),
            (0x1008, 10), (0x1023, 10), (0x1023, 10),
            (0x2002, -1), (0x2002, -1)]
    assert r["n_rows"] == len(rows)
    assert r["addr_sum"] == sum(a for a, _ in rows)
    assert r["line_sum"] == sum(ln for _, ln in rows)
    assert r["n_sequences"] == 2
    assert r["end_addr_sum"] == 0x1023 + 0x2002


def test_parse_committed_gcc_section():
    # gcc -gdwarf-4 -O0 of the _C_SRC below; readelf decodedline
    # shows 17 rows with address sum 984
    r = parse_line_programs(_VEC.read_bytes())
    assert r["error"] is None
    assert (r["n_units"], r["n_files"], r["n_sequences"]) \
        == (1, 1, 1)
    assert r["n_rows"] == 17
    assert r["addr_sum"] == 984


@pytest.mark.skipif(
    shutil.which("gcc") is None or shutil.which("objcopy") is None
    or shutil.which("readelf") is None,
    reason="no binutils in container")
def test_live_gcc_readelf_interop(tmp_path):
    (tmp_path / "t.c").write_text(_C_SRC)
    subprocess.run(["gcc", "-gdwarf-4", "-O0", "-c", "t.c",
                    "-o", "t.o"], cwd=tmp_path, check=True)
    subprocess.run(["objcopy", "--dump-section",
                    ".debug_line=dl.bin", "t.o"], cwd=tmp_path,
                   check=True)
    r = parse_line_programs((tmp_path / "dl.bin").read_bytes())
    assert r["error"] is None
    out = subprocess.run(
        ["readelf", "--debug-dump=decodedline", "t.o"],
        cwd=tmp_path, capture_output=True, text=True).stdout
    rows = re.findall(r"^\S+\s+(\d+|-)\s+(0x[0-9a-f]+|\d+)", out,
                      re.M)
    addrs = [int(a, 16) if a.startswith("0x") else int(a)
             for _, a in rows]
    assert r["n_rows"] == len(rows)
    assert r["addr_sum"] == sum(addrs)


def test_gates():
    assert parse_line_programs(build_line_program(
        ["a.c"], _SEQS, bad_version=True))["error"] \
        == "unsupported dwarf version 9"
    assert parse_line_programs(build_line_program(
        ["a.c"], _SEQS, lie_header_len=True))["error"] \
        == "header length disagrees with tables"
    assert parse_line_programs(build_line_program(
        ["a.c"], _SEQS, lie_unit_len=True))["error"] \
        == "unit overruns section"
    assert parse_line_programs(None)["error"] \
        == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0xD4A2F)
    base = build_line_program(["a.c", "b.h"], _SEQS)
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_line_programs(blob)
