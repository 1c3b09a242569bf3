"""wasm walker (operators/wasm_real.py): section frames, uleb edges,
exact-consumption gates, name section, fuzz."""

import random

import pytest

from cies_ocr_java_spark.operators.wasm_real import (
    build_wasm,
    parse_wasm,
    read_uleb,
    uleb,
)


def _mk(i, **kw):
    nf = 1 + i % 3
    return build_wasm(
        func_param_counts=list(range(nf)),
        exports=[f"f{i}_{k}" for k in range(nf)],
        mem_min=1 + i % 4,
        func_names=[f"wasm_fn_{i}_{k}" for k in range(nf)],
        **kw), nf


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        b, nf = _mk(i)
        r = parse_wasm(b)
        assert r["error"] is None
        assert r["n_types"] == nf and r["n_funcs"] == nf
        assert r["n_exports"] == nf + 1
        assert r["export_names"].endswith(",memory")
        assert r["mem_min"] == 1 + i % 4
        assert r["func_names"] \
            == ",".join(f"wasm_fn_{i}_{k}" for k in range(nf))
        assert r["code_bytes"] == 1 + 3 * nf + nf * (nf - 1) // 2


def test_uleb_edges():
    for v in [0, 1, 127, 128, 129, 16383, 16384, 2**28 - 1]:
        got, pos = read_uleb(uleb(v), 0)
        assert got == v and pos == len(uleb(v))
    assert len(uleb(127)) == 1 and len(uleb(128)) == 2
    with pytest.raises(ValueError, match="unterminated uleb128"):
        read_uleb(b"\x80\x80\x80\x80\x80\x80", 0)
    with pytest.raises(ValueError, match="overruns"):
        read_uleb(b"\x80", 0)


def test_multibyte_size_actually_present():
    """The pad custom section guarantees at least one section size is
    a 2-byte uleb — remove the pad and the property would vanish."""
    b, _ = _mk(2)
    # find a section with a 0x80-set size byte following its id
    assert any(b[k] & 0x80 for k in range(8, len(b))
               if b[k - 1] == 0x00)  # crude but sufficient witness


def test_exact_consumption_gate():
    """A section whose content stops short of its frame is an error —
    append a stray byte inside the function section's frame."""
    b, _ = _mk(1)
    # locate section id 3 and inflate its size by 1, inserting a byte
    pos = 8
    while b[pos] != 3:
        size, p = read_uleb(b, pos + 1)
        pos = p + size
    size, p = read_uleb(b, pos + 1)
    bad = b[:pos + 1] + uleb(size + 1) + b[p:p + size] + b"\x00" \
        + b[p + size:]
    assert parse_wasm(bad)["error"] == "section 3 not fully consumed"


def test_poison_tiers():
    assert parse_wasm(_mk(3, export_oversize=1000)[0])["error"] \
        == "section 7 overruns module"
    assert parse_wasm(_mk(3, bad_export_kind=True)[0])["error"] \
        == "bad export kind 9"
    assert parse_wasm(None)["error"] == "bad wasm magic"
    b, _ = _mk(3)
    assert parse_wasm(b[:4] + b"\x02\x00\x00\x00" + b[8:])["error"] \
        == "unsupported wasm version"


def test_fuzz_never_raises():
    rng = random.Random(41)
    base, _ = _mk(5)
    for _ in range(600):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_wasm(blob)
