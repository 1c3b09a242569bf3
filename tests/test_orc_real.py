"""ORC metadata walk (operators/orc_real.py): pyarrow-written files,
zigzag int statistics (negatives), packed subtypes, gates, fuzz."""

import io
import random

import pyarrow as pa
import pyarrow.orc as orc

from cies_ocr_java_spark.operators.orc_real import parse_orc_meta


def _make(i=7, n=12, compression="uncompressed"):
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "val": pa.array([(i * 13 + r * 5) % 500 - 100
                         for r in range(n)], pa.int64()),
        "name": pa.array([f"s{r}" for r in range(n)], pa.utf8()),
    })
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=compression)
    return buf.getvalue()


def test_pyarrow_orc_stats_replayed_exactly():
    r = parse_orc_meta(_make())
    vals = [(7 * 13 + k * 5) % 500 - 100 for k in range(12)]
    assert r["error"] is None
    assert (r["n_stripes"], r["n_rows"], r["n_cols"]) == (1, 12, 3)
    assert r["col_kinds"] == "long,long,string"
    # sint64 zigzag: negatives must survive
    assert (r["val_min"], r["val_max"], r["val_sum"]) \
        == (min(vals), max(vals), sum(vals))
    assert r["val_min"] < 0


def test_gates():
    b = _make()
    assert parse_orc_meta(_make(compression="zlib"))["error"] \
        == "compressed orc unsupported"
    assert parse_orc_meta(b[3:])["error"] == "bad orc header magic"
    assert parse_orc_meta(b[:-1] + b"\x00")["error"] \
        == "postscript overruns file"
    assert parse_orc_meta(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x08C)
    t = _make()
    for _ in range(400):
        x = bytearray(t)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_orc_meta(blob)
