"""Parquet page decoder (operators/parquet_pages.py): pyarrow-interop
round-trip, the optional-column RLE levels, count agreement, fuzz."""

import random

from cies_ocr_java_spark.operators.parquet_pages import (
    build_parquet_plain,
    parse_parquet_values,
)


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        n, step = 3 + i % 4, 1000 + i % 97
        r = parse_parquet_values(build_parquet_plain(n, step))
        assert r["error"] is None
        assert r["total_values"] == n
        assert r["values_sum"] == step * n * (n + 1) // 2
        assert (r["min_val"], r["max_val"]) == (step, n * step)
        assert r["n_row_groups"] == -(-n // 2)


def test_multi_page_row_groups():
    r = parse_parquet_values(build_parquet_plain(20, 7,
                                                 row_group_size=5))
    assert r["error"] is None
    assert r["n_row_groups"] == 4 and r["total_values"] == 20
    assert r["values_sum"] == 7 * 20 * 21 // 2


def test_dictionary_pages_rejected_by_name():
    """A dictionary-encoded file has a different first page kind —
    rejected, not misread."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "val": pa.array([5, 5], pa.int64())})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="none", use_dictionary=True)
    r = parse_parquet_values(buf.getvalue())
    assert r["error"] is not None


def test_trailing_page_body_bytes_rejected():
    """Round-3 advice item: up to 7 trailing non-value bytes in a v1
    page body used to pass silently under the floor division. Shrink
    the levels-length prefix by one so the body carries exactly one
    extra byte ahead of the values — the %8 gate must name it."""
    from cies_ocr_java_spark.operators.parquet_footer import (
        _Reader,
        parse_parquet_footer,
    )

    b = build_parquet_plain(4, 3)
    meta = parse_parquet_footer(b)
    col = next(c for c in meta["row_groups"][0]["cols"]
               if c["path"] == "val")
    pos = col["data_page_offset"]
    r = _Reader(b[pos:])
    r.struct()
    body_at = pos + r.pos
    lvl_len = int.from_bytes(b[body_at:body_at + 4], "little")
    x = (b[:body_at] + (lvl_len - 1).to_bytes(4, "little")
         + b[body_at + 4:])
    assert parse_parquet_values(x)["error"] \
        == "trailing bytes after plain values"


def test_envelope_gates_and_fuzz():
    b = build_parquet_plain(5, 11)
    assert parse_parquet_values(b[:-5])["error"] == "bad footer magic"
    assert parse_parquet_values(b"XAR1" + b[4:])["error"] \
        == "bad head magic"
    assert parse_parquet_values(None)["error"] \
        == "file shorter than parquet envelope"
    rng = random.Random(149)
    for _ in range(300):
        x = bytearray(b)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_parquet_values(blob)


def test_dictionary_pages_decoded_end_to_end():
    """The OTHER half: pyarrow's DEFAULT dictionary encoding decoded
    through the RLE/bit-packed hybrid (def levels AND indices), values
    mapped through the per-row-group dictionary."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cies_ocr_java_spark.operators.parquet_pages import (
        parse_parquet_dict_values,
    )

    i, n = 4, 23
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "val": pa.array([None if (r + i) % 5 == 0
                         else ((r + i) % 7) * 11 + i % 3
                         for r in range(n)], pa.int64()),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="none", use_dictionary=True,
                   write_statistics=False, row_group_size=10)
    r = parse_parquet_dict_values(buf.getvalue())
    vals = [None if (k + i) % 5 == 0 else ((k + i) % 7) * 11 + i % 3
            for k in range(n)]
    pres = [v for v in vals if v is not None]
    assert r["error"] is None
    assert (r["n_row_groups"], r["n_pages"]) == (3, 3)
    assert r["dict_entries"] == sum(
        len({v for v in vals[g * 10:(g + 1) * 10] if v is not None})
        for g in range(3))
    assert (r["total_values"], r["n_nulls"]) == (n, vals.count(None))
    assert (r["values_sum"], r["min_val"], r["max_val"]) \
        == (sum(pres), min(pres), max(pres))
    # the two readers reject each other's files BY NAME
    buf2 = io.BytesIO()
    pq.write_table(t, buf2, compression="none", use_dictionary=False,
                   write_statistics=False, row_group_size=10)
    assert parse_parquet_dict_values(buf2.getvalue())["error"] \
        == "first page is not a dictionary page"
    assert parse_parquet_values(buf.getvalue())["error"] is not None


def test_dictionary_fuzz_never_raises():
    import io
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cies_ocr_java_spark.operators.parquet_pages import (
        parse_parquet_dict_values,
    )

    t = pa.table({"val": pa.array([k % 5 for k in range(30)],
                                  pa.int64())})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="none", use_dictionary=True,
                   write_statistics=False, row_group_size=12)
    b = buf.getvalue()
    rng = random.Random(1259)
    for _ in range(300):
        x = bytearray(b)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_parquet_dict_values(blob)


class TestDeltaBinaryPacked:
    """DELTA_BINARY_PACKED (encoding 5): pyarrow is the writer, the
    from-scratch decoder reads header geometry, zigzag first value /
    min-deltas, per-miniblock bitwidths, and discards the padding of
    the last started miniblock."""

    def test_property_against_pyarrow(self):
        import random

        from cies_ocr_java_spark.operators.parquet_pages import (
            build_parquet_delta,
            parse_parquet_delta_values,
        )
        rng = random.Random(0xDE17A)
        for _ in range(30):
            n = rng.randrange(1, 400)
            vals = [rng.randrange(-10**12, 10**12)
                    for _ in range(n)]
            r = parse_parquet_delta_values(build_parquet_delta(
                vals, row_group_size=rng.choice((5, 10, 50, 1000))))
            assert r["error"] is None
            assert r["total_values"] == n
            assert r["values_sum"] == sum(vals)
            assert r["min_val"] == min(vals)
            assert r["max_val"] == max(vals)

    def test_constant_stride_uses_zero_bitwidths(self):
        # arithmetic sequence -> all deltas equal min_delta ->
        # bw=0 miniblocks carrying zero bytes
        from cies_ocr_java_spark.operators.parquet_pages import (
            build_parquet_delta,
            parse_parquet_delta_values,
        )
        vals = list(range(0, 7000, 7))
        r = parse_parquet_delta_values(
            build_parquet_delta(vals, row_group_size=10000))
        assert r["error"] is None
        assert r["values_sum"] == sum(vals)
        assert (r["min_val"], r["max_val"]) == (0, 6993)

    def test_plain_reader_rejects_delta_by_name(self):
        from cies_ocr_java_spark.operators.parquet_pages import (
            build_parquet_delta,
            parse_parquet_values,
        )
        r = parse_parquet_values(build_parquet_delta([1, 2, 3]))
        assert r["error"] == "unsupported encoding 5"

    def test_delta_reader_rejects_plain_by_name(self):
        from cies_ocr_java_spark.operators.parquet_pages import (
            build_parquet_plain,
            parse_parquet_delta_values,
        )
        r = parse_parquet_delta_values(build_parquet_plain(6, 10))
        assert r["error"] == "unsupported encoding 0 (want delta)"

    def test_fuzz_never_raises(self):
        import random

        from cies_ocr_java_spark.operators.parquet_pages import (
            build_parquet_delta,
            parse_parquet_delta_values,
        )
        rng = random.Random(0xDE17B)
        base = build_parquet_delta(
            [rng.randrange(-1000, 1000) for _ in range(50)])
        for _ in range(400):
            x = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                x[rng.randrange(len(x))] = rng.randrange(256)
            blob = (bytes(x[:rng.randrange(len(x) + 1)])
                    if rng.random() < 0.3 else bytes(x))
            assert "error" in parse_parquet_delta_values(blob)
