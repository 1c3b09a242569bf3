"""Arrow IPC walk (operators/arrow_ipc_real.py): pyarrow-written
files decoded exactly (schema/batches/rows/nulls/sums), stream form
rejected, magic/continuation/popcount gates, fuzz."""

import io
import random
import struct

import pyarrow as pa

from cies_ocr_java_spark.operators.arrow_ipc_real import (
    parse_arrow_file,
)


def _make(n=25, batch=10, null_every=7):
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "val": pa.array(
            [None if null_every and k % null_every == 0 else k * 3
             for k in range(n)], pa.int64()),
        "name": pa.array([f"s{k}" for k in range(n)], pa.utf8()),
    })
    buf = io.BytesIO()
    with pa.ipc.new_file(buf, t.schema) as w:
        for b in t.to_batches(max_chunksize=batch):
            w.write_batch(b)
    return buf.getvalue()


def test_pyarrow_file_decodes_exactly():
    r = parse_arrow_file(_make())
    assert r["error"] is None
    assert r["schema_names"] == "id,val,name"
    assert r["schema_types"] == "int,int,utf8"
    assert (r["n_fields"], r["n_batches"], r["total_rows"]) == (3, 3, 25)
    assert r["null_count"] == 4  # rows 0,7,14,21
    assert r["val_sum"] == sum(k * 3 for k in range(25) if k % 7)


def test_no_null_column_and_single_batch():
    r = parse_arrow_file(_make(n=8, batch=100, null_every=0))
    assert r["error"] is None
    assert (r["n_batches"], r["null_count"]) == (1, 0)
    assert r["val_sum"] == sum(k * 3 for k in range(8))


def test_stream_form_rejected_by_name():
    t = pa.table({"val": pa.array([1, 2], pa.int64())})
    buf = io.BytesIO()
    with pa.ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    assert parse_arrow_file(buf.getvalue())["error"] \
        == "bad leading magic"


def test_gates():
    b = _make()
    assert parse_arrow_file(b[:-3] + b"xyz")["error"] \
        == "bad trailing magic"
    assert parse_arrow_file(b[: len(b) // 2])["error"] \
        == "bad trailing magic"
    assert parse_arrow_file(None)["error"] == "short or missing payload"
    # continuation marker of the first record batch (the second
    # 8-aligned 0xFFFFFFFF in the file; data values are small so the
    # body cannot fake one)
    pos = b.index(b"\xff\xff\xff\xff", 8)
    pos = b.index(b"\xff\xff\xff\xff", pos + 4)
    x = bytearray(b)
    x[pos] = 0x00
    assert parse_arrow_file(bytes(x))["error"] \
        == "missing continuation marker"


def test_validity_popcount_gate():
    """Flip one validity bit in the first batch's val column — the
    declared null_count no longer matches the bitmap."""
    b = _make(n=8, batch=100)  # one batch; null at row 0
    # locate the val validity buffer via the footer/message walk the
    # module itself uses (white-box, but the assertion is black-box)
    import cies_ocr_java_spark.operators.arrow_ipc_real as ar

    data = bytes(b)
    (flen,) = struct.unpack_from("<i", data, len(data) - 10)
    footer = ar._Fb.root(data, len(data) - 10 - flen)
    at, count = footer.vector(3, 24)
    off, mlen = struct.unpack_from("<qi", data, at)
    msg = ar._Fb.root(data, off + 8)
    rb = msg.table_at(2)
    bat, _ = rb.vector(2, 16)
    # buffers: id(v,d)=0,1  val validity = index 2
    voff, vlen = struct.unpack_from("<qq", data, bat + 16 * 2)
    assert vlen > 0
    x = bytearray(data)
    x[off + mlen + voff] ^= 0x02  # flip validity of row 1
    assert parse_arrow_file(bytes(x))["error"] \
        == "validity popcount disagrees with null count"


def test_fuzz_never_raises():
    rng = random.Random(1312)
    t = _make()
    for _ in range(400):
        x = bytearray(t)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_arrow_file(blob)
