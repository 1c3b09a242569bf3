"""safetensors walker (operators/safetensors_real.py): the safety
gates as designed — bounds, byte-exactness, contiguity — plus value
read-back and fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.safetensors_real import (
    build_safetensors,
    parse_safetensors,
)


def _mk(i, **kw):
    nt = 2 + i % 3
    tensors = []
    for k in range(nt):
        shape = [2 + (i + k) % 3, 3]
        n = shape[0] * shape[1]
        dtype = ["I8", "F32", "I32"][k % 3]
        lim = 100 if dtype == "I8" else 10000
        vals = [((i * 7 + k * 13 + j * 3) % lim) - (lim // 2)
                for j in range(n)]
        tensors.append((f"layer{k}.weight", dtype, shape, vals))
    return build_safetensors(
        tensors, metadata={"format": "pt"}, **kw), tensors


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        b, tensors = _mk(i)
        r = parse_safetensors(b)
        assert r["error"] is None
        assert r["n_tensors"] == len(tensors)
        assert r["total_params"] == sum(len(t[3]) for t in tensors)
        assert r["value_sum"] == sum(sum(t[3]) for t in tensors)
        assert r["meta_format"] == "pt"


def test_safety_gates():
    assert parse_safetensors(_mk(3, gap=True)[0])["error"] \
        == "non-contiguous buffer before layer1.weight"
    assert "offsets out of buffer" in \
        parse_safetensors(_mk(3, oob=True)[0])["error"]
    # dtype*shape disagreement
    b, _ = _mk(2)
    (hlen,) = struct.unpack_from("<Q", b, 0)
    hdr = b[8:8 + hlen].decode()
    bad = hdr.replace('"shape": [2, 3]', '"shape": [2, 4]', 1)
    blob = struct.pack("<Q", len(bad)) + bad.encode() + b[8 + hlen:]
    assert "disagree" in parse_safetensors(blob)["error"]
    # trailing smuggled bytes after the last tensor
    assert parse_safetensors(b + b"\x00" * 4)["error"] \
        == "trailing bytes after last tensor"
    # metadata must be str->str
    bad2 = hdr.replace('"format": "pt"', '"format": 7', 1)
    blob2 = struct.pack("<Q", len(bad2)) + bad2.encode() + b[8 + hlen:]
    assert parse_safetensors(blob2)["error"] \
        == "metadata must be str-to-str"


def test_fuzz_never_raises():
    rng = random.Random(113)
    base, _ = _mk(5)
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_safetensors(blob)
