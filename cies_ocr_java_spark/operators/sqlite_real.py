"""SQLite database FILES walked at the byte level — writer is the real
stdlib ``sqlite3`` engine (``Connection.serialize()``), reader is ours.

The format (sqlite.org/fileformat2.html, public spec) is the archive
family's database member: a 100-byte header (magic, big-endian page
size, text encoding, page count), then fixed-size pages forming
per-table B-TREES. The reader implements the real on-disk structures:

- header gates: magic string, page-size power-of-two (1 == 65536),
  utf-8 text encoding only, file length >= header page count;
- table b-tree pages: leaf (0x0D) and interior (0x05) — cell-pointer
  arrays, interior cells as (left-child u32, rowid-key varint) with the
  rightmost pointer in the page header, recursion with depth and cycle
  guards (a corrupt file may point pages at each other);
- leaf cells: (payload-length varint, rowid varint, record), with the
  SPILL algorithm from the spec — X = U-35, M = ((U-12)*32)/255-23,
  K = M + (P-M) % (U-4) — and 4-byte overflow-page chains walked with
  zero/cycle/range gates;
- the RECORD format: header-length varint then serial types — NULL,
  1/2/3/4/6/8-byte big-endian two's-complement ints, float64, the
  constant-0/1 types (8/9), and odd/even text/blob length encodings.
  A NULL first value under INTEGER PRIMARY KEY aliases the rowid
  (the caller substitutes — the reader stays schema-agnostic);
- bootstrapping through ``sqlite_master`` (root at page 1, offset 100):
  table name -> rootpage, exactly how the engine itself finds tables.

Degradation contract: every malformed input raises ``SqliteError``
with a stable kind — callers map it to an error row, never a crash.
The reference's document store keeps payloads in S3+DynamoDB
(DocumentRepository.java); a SQLite file is the single-file analog a
crawler actually meets (sidecar .db droppings), hence first-class here.
"""

from __future__ import annotations

__all__ = ["SqliteError", "parse_sqlite_header", "sqlite_table_rows",
           "build_sqlite_db"]

_MAGIC = b"SQLite format 3\x00"
_MAX_DEPTH = 32


class SqliteError(Exception):
    """Typed parse failure; str(e) starts with a stable error kind."""


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    """SQLite varint: 1-9 bytes, big-endian 7-bit groups, 9th byte is
    all 8 bits. Returns (value, next_pos)."""
    v = 0
    for k in range(8):
        if pos >= len(data):
            raise SqliteError("bad varint: past end of page")
        b = data[pos]
        pos += 1
        if k == 7 and b & 0x80:
            pass
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos
    if pos >= len(data):
        raise SqliteError("bad varint: past end of page")
    v = (v << 8) | data[pos]
    return v, pos + 1


def parse_sqlite_header(data: bytes) -> dict:
    if len(data) < 100:
        raise SqliteError("file shorter than header")
    if data[:16] != _MAGIC:
        raise SqliteError("bad magic")
    ps = int.from_bytes(data[16:18], "big")
    if ps == 1:
        ps = 65536
    if ps < 512 or ps & (ps - 1):
        raise SqliteError("bad page size")
    reserved = data[20]
    n_pages = int.from_bytes(data[28:32], "big")
    if len(data) < ps * n_pages:
        raise SqliteError("file shorter than header page count")
    enc = int.from_bytes(data[56:60], "big")
    # 0 appears only in zero-table DBs before the first write
    if enc not in (0, 1):
        raise SqliteError("unsupported text encoding")
    return {"page_size": ps, "usable": ps - reserved, "n_pages": n_pages}


def _page(data: bytes, num: int, ps: int, n_pages: int) -> bytes:
    if num < 1 or num > n_pages:
        raise SqliteError(f"page {num} beyond EOF")
    return data[(num - 1) * ps: num * ps]


def _read_payload(data: bytes, page: bytes, pos: int, payload_len: int,
                  usable: int, ps: int, n_pages: int) -> bytes:
    """Local bytes + overflow chain per the table-leaf spill formula."""
    u, p = usable, payload_len
    x = u - 35
    if p <= x:
        if pos + p > len(page):
            raise SqliteError("record past payload end")
        return page[pos:pos + p]
    m = ((u - 12) * 32) // 255 - 23
    k = m + (p - m) % (u - 4)
    local = k if k <= x else m
    if pos + local + 4 > len(page):
        raise SqliteError("record past payload end")
    out = bytearray(page[pos:pos + local])
    nxt = int.from_bytes(page[pos + local:pos + local + 4], "big")
    seen: set[int] = set()
    while len(out) < p:
        if nxt == 0 or nxt in seen:
            raise SqliteError("broken overflow chain")
        seen.add(nxt)
        opage = _page(data, nxt, ps, n_pages)
        nxt = int.from_bytes(opage[:4], "big")
        out += opage[4:4 + min(u - 4, p - len(out))]
    return bytes(out[:p])


def _record(payload: bytes) -> list:
    """Decode one record: header-length varint, serial types, body."""
    hlen, pos = _varint(payload, 0)
    if hlen > len(payload):
        raise SqliteError("record past payload end")
    serials: list[int] = []
    while pos < hlen:
        st, pos = _varint(payload, pos)
        serials.append(st)
    if pos != hlen:
        raise SqliteError("record header overrun")
    values: list = []
    body = pos
    for st in serials:
        if st == 0:
            values.append(None)
        elif st in (1, 2, 3, 4, 5, 6):
            n = (1, 2, 3, 4, 6, 8)[st - 1]
            chunk = payload[body:body + n]
            if len(chunk) != n:
                raise SqliteError("record past payload end")
            values.append(int.from_bytes(chunk, "big", signed=True))
            body += n
        elif st == 7:
            import struct

            chunk = payload[body:body + 8]
            if len(chunk) != 8:
                raise SqliteError("record past payload end")
            values.append(struct.unpack(">d", chunk)[0])
            body += 8
        elif st == 8:
            values.append(0)
        elif st == 9:
            values.append(1)
        elif st >= 12:
            n = (st - 12) // 2
            chunk = payload[body:body + n]
            if len(chunk) != n:
                raise SqliteError("record past payload end")
            if st % 2:  # odd: text
                try:
                    values.append(chunk.decode("utf-8"))
                except UnicodeDecodeError:
                    raise SqliteError("invalid utf-8 in text value") from None
            else:
                values.append(bytes(chunk))
            body += n
        else:
            raise SqliteError(f"reserved serial type {st}")
    return values


def _walk_table(data: bytes, root: int, hdr: dict,
                depth: int = 0, seen: frozenset = frozenset()) -> list:
    """DFS over a table b-tree; returns [(rowid, values), ...] in rowid
    order (the tree IS rowid-ordered — no sort needed)."""
    if depth > _MAX_DEPTH:
        raise SqliteError("b-tree too deep")
    if root in seen:
        raise SqliteError("b-tree page cycle")
    ps, usable, n_pages = hdr["page_size"], hdr["usable"], hdr["n_pages"]
    page = _page(data, root, ps, n_pages)
    base = 100 if root == 1 else 0
    if base >= len(page):
        raise SqliteError(f"page {root} beyond EOF")
    ptype = page[base]
    ncells = int.from_bytes(page[base + 3:base + 5], "big")
    rows: list = []
    if ptype == 0x05:  # interior table page
        hsize = 12
        right = int.from_bytes(page[base + 8:base + 12], "big")
        kids: list[int] = []
        for c in range(ncells):
            off = int.from_bytes(
                page[base + hsize + 2 * c:base + hsize + 2 * c + 2], "big"
            )
            if off + 4 > len(page):
                raise SqliteError("cell pointer beyond page")
            kids.append(int.from_bytes(page[off:off + 4], "big"))
        kids.append(right)
        nseen = seen | {root}
        for kid in kids:
            rows.extend(_walk_table(data, kid, hdr, depth + 1, nseen))
        return rows
    if ptype != 0x0D:  # must be a table leaf
        raise SqliteError(f"bad b-tree page type 0x{ptype:02x}")
    hsize = 8
    for c in range(ncells):
        off = int.from_bytes(
            page[base + hsize + 2 * c:base + hsize + 2 * c + 2], "big"
        )
        if off >= len(page):
            raise SqliteError("cell pointer beyond page")
        plen, pos = _varint(page, off)
        rowid, pos = _varint(page, pos)
        payload = _read_payload(data, page, pos, plen, usable, ps, n_pages)
        rows.append((rowid, _record(payload)))
    return rows


def sqlite_table_rows(data: bytes, table: str) -> list[tuple[int, list]]:
    """All (rowid, values) of ``table``, resolved via sqlite_master."""
    hdr = parse_sqlite_header(data)
    root = None
    for _rowid, vals in _walk_table(data, 1, hdr):
        # sqlite_master: (type, name, tbl_name, rootpage, sql)
        if len(vals) >= 4 and vals[0] == "table" and vals[1] == table:
            root = vals[3]
    if root is None:
        raise SqliteError(f"table not found: {table}")
    if not isinstance(root, int):
        raise SqliteError("bad rootpage in sqlite_master")
    return _walk_table(data, root, hdr)


# ---------------------------------------------------------------------------
# writer — the REAL engine, pinned settings (512-byte pages force
# interior nodes and overflow chains even on small fixtures)
# ---------------------------------------------------------------------------

def build_sqlite_db(text: str, chunk: int = 32,
                    page_size: int = 512) -> bytes:
    """Serialize ``text`` into a genuine SQLite db with two tables:
    ``docs`` (the text in ``chunk``-codepoint rows plus int/bool/real/
    blob columns spanning the serial-type surface) and ``meta`` (the
    whole text as ONE row — longer than a 512-byte page, forcing a
    real overflow chain)."""
    import sqlite3

    con = sqlite3.connect(":memory:")
    try:
        con.execute(f"PRAGMA page_size={page_size}")
        con.execute(
            "CREATE TABLE docs(id INTEGER PRIMARY KEY, chunk TEXT,"
            " big INTEGER, flag INTEGER, ratio REAL, raw BLOB)"
        )
        con.execute("CREATE TABLE meta(id INTEGER PRIMARY KEY, body TEXT)")
        chunks = [text[i:i + chunk] for i in range(0, len(text), chunk)]
        if not chunks:
            chunks = [""]
        for i, c in enumerate(chunks, start=1):
            con.execute(
                "INSERT INTO docs VALUES (?,?,?,?,?,?)",
                (i, c, i * 4294967311, i % 2, i * 0.5,
                 c.encode("utf-8")),
            )
        con.execute("INSERT INTO meta VALUES (1, ?)", (text,))
        con.commit()
        return con.serialize()
    finally:
        con.close()
