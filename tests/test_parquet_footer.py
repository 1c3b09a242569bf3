"""Thrift-compact parquet footer reader (operators/parquet_footer.py):
field-by-field parity with pyarrow's OWN metadata object over real
parquet-cpp files, envelope gates, and corruption fuzz."""

from __future__ import annotations

import io
import random

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.parquet_footer import (
    ParquetFooterError,
    build_parquet,
    parse_parquet_footer,
)


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=700))
def test_parity_with_pyarrow_metadata(text):
    data = build_parquet(text)
    r = parse_parquet_footer(data)
    md = pq.ParquetFile(io.BytesIO(data)).metadata
    assert r["num_rows"] == md.num_rows
    assert len(r["row_groups"]) == md.num_row_groups
    assert [nm for nm, _ in r["leaves"]] == ["id", "chunk", "val"]
    for gi, g in enumerate(r["row_groups"]):
        mg = md.row_group(gi)
        assert g["num_rows"] == mg.num_rows
        for ci, c in enumerate(g["cols"]):
            pc = mg.column(ci)
            assert c["num_values"] == pc.num_values
            assert c["codec"] == pc.compression
            assert c["type"] == pc.physical_type
            assert c["data_page_offset"] == pc.data_page_offset
            s = pc.statistics
            assert c["null_count"] == s.null_count
            if pc.physical_type == "INT64":
                assert c["min"] == s.min and c["max"] == s.max


def test_multi_group_closed_form():
    text = "x" * (24 * 30)  # 30 rows -> ceil(30/7) = 5 groups
    r = parse_parquet_footer(build_parquet(text))
    assert r["num_rows"] == 30
    assert len(r["row_groups"]) == 5
    assert [g["num_rows"] for g in r["row_groups"]] == [7, 7, 7, 7, 2]
    vals = [c for g in r["row_groups"] for c in g["cols"]
            if c["path"] == "val"]
    assert min(c["min"] for c in vals) == 1000003
    assert max(c["max"] for c in vals) == 30 * 1000003


def test_envelope_gates():
    data = build_parquet("gate probe " * 10)
    with pytest.raises(ParquetFooterError, match="bad footer magic"):
        parse_parquet_footer(data[:-4] + b"PARX")
    with pytest.raises(ParquetFooterError, match="bad head magic"):
        parse_parquet_footer(b"XXXX" + data[4:])
    too_big = data[:-8] + len(data).to_bytes(4, "little") + data[-4:]
    with pytest.raises(ParquetFooterError, match="footer length out of bounds"):
        parse_parquet_footer(too_big)
    with pytest.raises(ParquetFooterError, match="shorter than parquet"):
        parse_parquet_footer(b"PAR1PAR1")


def test_footer_fuzz_never_raises_uncaught():
    data = build_parquet("fuzz the compact protocol " * 15)
    flen = int.from_bytes(data[-8:-4], "little")
    rng = random.Random(31)
    for _ in range(800):
        m = bytearray(data)
        for _ in range(rng.randint(1, 8)):
            m[len(m) - 8 - rng.randrange(flen)] = rng.randrange(256)
        try:
            parse_parquet_footer(bytes(m))
        except ParquetFooterError:
            pass


def test_size_bomb_guard():
    # a corrupt list header claiming 2^40 elements must fail fast,
    # not allocate: craft footer = one struct field, list, huge size
    body = bytes([0x19, 0xFF]) + (1 << 40).to_bytes(6, "little")
    blob = b"PAR1" + body + len(body).to_bytes(4, "little") + b"PAR1"
    with pytest.raises(ParquetFooterError):
        parse_parquet_footer(blob)
