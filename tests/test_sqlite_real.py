"""SQLite file walker (operators/sqlite_real.py): real-engine writer vs
our byte-level reader — b-tree recursion, overflow chains, the full
serial-type surface, header gates, and synthetic corrupt structures."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.sqlite_real import (
    SqliteError,
    _read_payload,
    _walk_table,
    build_sqlite_db,
    parse_sqlite_header,
    sqlite_table_rows,
)


def _reassemble(db: bytes) -> str:
    return "".join(v[1] for _, v in sorted(sqlite_table_rows(db, "docs")))


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=800))
def test_round_trip_property(text):
    db = build_sqlite_db(text)
    assert _reassemble(db) == text
    assert sqlite_table_rows(db, "meta")[0][1][1] == text


def test_serial_type_surface():
    db = build_sqlite_db("abcdefgh" * 12)  # 96 chars -> 3 rows
    rows = sqlite_table_rows(db, "docs")
    assert len(rows) == 3
    for rid, v in rows:
        assert v[0] is None            # INTEGER PRIMARY KEY -> rowid alias
        assert v[2] == rid * 4294967311  # 8-byte big-endian int
        assert v[3] == rid % 2           # const-0/1 serial types 8/9
        assert v[4] == rid * 0.5         # float64
        assert v[5] == v[1].encode()     # blob mirrors the text bytes


def test_interior_pages_and_overflow():
    text = "word " * 2000  # 313 rows over 512-byte pages -> interior nodes
    db = build_sqlite_db(text)
    assert parse_sqlite_header(db)["n_pages"] > 50
    assert _reassemble(db) == text
    # meta body (577+ bytes in one cell) must have spilled to overflow
    assert sqlite_table_rows(db, "meta")[0][1][1] == text


def test_header_gates():
    db = build_sqlite_db("gate test " * 30)
    with pytest.raises(SqliteError, match="bad magic"):
        sqlite_table_rows(bytes([db[0] ^ 1]) + db[1:], "docs")
    with pytest.raises(SqliteError, match="shorter than header page count"):
        sqlite_table_rows(db[: len(db) // 2], "docs")
    enc = db[:56] + (2).to_bytes(4, "big") + db[60:]
    with pytest.raises(SqliteError, match="unsupported text encoding"):
        sqlite_table_rows(enc, "docs")
    with pytest.raises(SqliteError, match="shorter than header"):
        parse_sqlite_header(db[:50])
    bad_ps = db[:16] + (300).to_bytes(2, "big") + db[18:]
    with pytest.raises(SqliteError, match="bad page size"):
        parse_sqlite_header(bad_ps)


def test_table_not_found():
    db = build_sqlite_db("x")
    with pytest.raises(SqliteError, match="table not found"):
        sqlite_table_rows(db, "nonexistent")


def test_broken_overflow_chain():
    # synthetic leaf page whose big payload points at overflow page 0
    usable = 512
    payload_len = 600  # > X = 477 -> must spill
    page = bytearray(512)
    local = ((usable - 12) * 32) // 255 - 23
    k = local + (payload_len - local) % (usable - 4)
    if k <= usable - 35:
        local = k
    body = bytes(range(256)) * 3
    cell = body[:local] + (0).to_bytes(4, "big")
    page[0:0 + len(cell)] = cell
    with pytest.raises(SqliteError, match="broken overflow chain"):
        _read_payload(bytes(page) * 4, bytes(page), 0, payload_len,
                      usable, 512, 4)


def test_btree_cycle_guard():
    # interior page whose rightmost pointer is itself
    page = bytearray(512)
    page[0] = 0x05
    page[3:5] = (0).to_bytes(2, "big")     # no cells
    page[8:12] = (1).to_bytes(4, "big")    # rightmost -> page 1 (itself)
    hdr = {"page_size": 512, "usable": 512, "n_pages": 1}
    data = bytes(512)[:100] + bytes(page)[100:]  # page 1 body at offset 100
    data = bytes(page)  # offset-100 header only applies to page 1 walk
    with pytest.raises(SqliteError, match="cycle|too deep|beyond EOF|bad"):
        _walk_table(bytes(data), 1, hdr)


def test_fuzz_never_raises_uncaught():
    db = build_sqlite_db("fuzz corpus text " * 40)
    rng = random.Random(13)
    for _ in range(400):
        m = bytearray(db)
        for _ in range(rng.randint(1, 10)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        try:
            sqlite_table_rows(bytes(m), "docs")
        except SqliteError:
            pass


def test_deterministic_serialization():
    a = build_sqlite_db("same input " * 25)
    b = build_sqlite_db("same input " * 25)
    assert a == b
