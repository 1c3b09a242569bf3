"""GGUF walker (operators/gguf_real.py): typed KV enum with nested
arrays, the alignment contract, tensor read-back, fuzz."""

import random

from cies_ocr_java_spark.operators.gguf_real import (
    build_gguf,
    parse_gguf,
)


def _mk(i, **kw):
    nt = 1 + i % 3
    tensors = []
    for k in range(nt):
        dims = [4 + (i + k) % 3, 8]
        n = dims[0] * dims[1]
        vals = [((i * 11 + k * 7 + j) % 200) - 100 for j in range(n)]
        tensors.append((f"blk.{k}.weight", dims, vals))
    vocab = [f"tok{v}" for v in range(5 + i % 6)]
    return build_gguf("graft", f"graft-model-{i % 9}", vocab,
                      tensors, **kw), tensors, vocab


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        b, tensors, vocab = _mk(i)
        r = parse_gguf(b)
        assert r["error"] is None
        assert r["arch"] == "graft"
        assert r["n_tensors"] == len(tensors)
        assert r["total_params"] == sum(len(t[2]) for t in tensors)
        assert r["value_sum"] == sum(sum(t[2]) for t in tensors)
        assert r["n_vocab"] == len(vocab)


def test_alignment_contract():
    b, *_ = _mk(3, misalign=True)
    assert parse_gguf(b)["error"] \
        == "tensor blk.0.weight offset not aligned"
    # a non-power-of-two alignment kv is itself corruption
    b2, *_ = _mk(2, align=24)
    assert parse_gguf(b2)["error"] == "bad alignment value"


def test_string_array_vocab():
    b, _, vocab = _mk(7)
    assert parse_gguf(b)["n_vocab"] == len(vocab)


def test_magic_and_version():
    assert parse_gguf(_mk(3, bad_magic=True)[0])["error"] \
        == "bad gguf magic"
    b, *_ = _mk(3)
    bad = b[:4] + b"\x02\x00\x00\x00" + b[8:]
    assert parse_gguf(bad)["error"] == "unsupported gguf version 2"
    assert parse_gguf(None)["error"] == "bad gguf magic"


def test_fuzz_never_raises():
    rng = random.Random(127)
    for seed in (5, 8):
        base, *_ = _mk(seed)
        for _ in range(500):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_gguf(blob)
