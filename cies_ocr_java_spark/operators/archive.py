"""REAL ZIP archive writer + reader on stdlib struct/zlib — the container
format crawl dumps and document bundles arrive in.

Writer (``build_zip``) emits genuine PKZIP: per-member local file headers,
stored (method 0) or raw-deflate (method 8) payloads, a central directory,
and the end-of-central-directory record — correct CRC32s and offsets
throughout; any unzip opens these files.

Reader (``parse_zip``) does the REAL structural walk, the same
trust-then-verify discipline as the PDF xref reader (operators/pdf_real.py):
locate EOCD from the end, read the central directory offset/count, walk the
central entries, VERIFY each entry's local header (magic + name must match —
a corrupted offset fails the member, never degrades to scanning), extract by
method, and verify CRC32 + declared sizes against the inflated bytes.

Failure contract: every malformed archive yields an error row — never an
exception out of the parser (the MediaCodec/pdf_real discipline). Member
payloads are UTF-8 text in this subset; the extractor concatenates member
texts in central-directory order.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_LOCAL = struct.Struct("<4sHHHHHIIIHH")    # PK\x03\x04
_CENTRAL = struct.Struct("<4sHHHHHHIIIHHHHHII")  # PK\x01\x02
_EOCD = struct.Struct("<4sHHHHIIH")        # PK\x05\x06
_Z64_EOCD = struct.Struct("<4sQHHIIQQQQ")  # PK\x06\x06
_Z64_LOC = struct.Struct("<4sIQI")         # PK\x06\x07


def build_zip(members: list[tuple[str, str | bytes, int]]) -> bytes:
    """Emit a real ZIP from (name, payload, method) members; method 0
    stores, 8 raw-deflates. str payloads encode UTF-8, bytes pass
    through (binary members — images inside EPUB/OOXML). Fixed DOS
    date/time fields keep output deterministic."""
    buf = bytearray()
    central = bytearray()
    for name, text, method in members:
        if method not in (0, 8):
            raise ValueError("method must be 0 (stored) or 8 (deflated)")
        nb = name.encode("utf-8")
        data = text.encode("utf-8") if isinstance(text, str) else bytes(text)
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(data) + co.flush()
        else:
            payload = data
        off = len(buf)
        buf += _LOCAL.pack(b"PK\x03\x04", 20, 0, method, 0x6020, 0x5ab1,
                           crc, len(payload), len(data), len(nb), 0)
        buf += nb + payload
        central += _CENTRAL.pack(b"PK\x01\x02", 20, 20, 0, method, 0x6020,
                                 0x5ab1, crc, len(payload), len(data),
                                 len(nb), 0, 0, 0, 0, 0, off)
        central += nb
    cd_off = len(buf)
    buf += central
    buf += _EOCD.pack(b"PK\x05\x06", 0, 0, len(members), len(members),
                      len(central), cd_off, 0)
    return bytes(buf)


def build_zip64(members: list[tuple[str, str | bytes, int]], *,
                poison: str | None = None) -> bytes:
    """build_zip, but emitted in ZIP64 form the way a >4 GB archive
    would be: central entries saturate compressed/uncompressed/offset
    to 0xFFFFFFFF and carry the real u64s in a 0x0001 extra field
    (values present ONLY for saturated fields, per APPNOTE §4.5.3),
    the classic EOCD saturates its counts/offset, and an EOCD64 record
    + locator carry the real values. Every modern unzip opens these.
    ``poison``: ``locator_sig``, ``eocd64_sig``, ``no_extra`` (first
    entry saturated but its zip64 extra dropped)."""
    buf = bytearray()
    centrals: list[tuple[bytes, bytes, int, int, int, int]] = []
    for name, text, method in members:
        if method not in (0, 8):
            raise ValueError("method must be 0 (stored) or 8 (deflated)")
        nb = name.encode("utf-8")
        raw = text.encode("utf-8") if isinstance(text, str) else bytes(text)
        crc = zlib.crc32(raw) & 0xFFFFFFFF
        if method == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(raw) + co.flush()
        else:
            payload = raw
        off = len(buf)
        buf += _LOCAL.pack(b"PK\x03\x04", 45, 0, method, 0x6020, 0x5ab1,
                           crc, len(payload), len(raw), len(nb), 0)
        buf += nb + payload
        centrals.append((nb, payload, method, crc, len(raw), off))
    cd_off = len(buf)
    n = len(centrals)
    central = bytearray()
    for k, (nb, payload, method, crc, ulen, off) in enumerate(centrals):
        extra = struct.pack("<HHQQQ", 0x0001, 24, ulen, len(payload), off)
        if poison == "no_extra" and k == 0:
            extra = b""
        central += _CENTRAL.pack(
            b"PK\x01\x02", 45, 45, 0, method, 0x6020, 0x5ab1, crc,
            0xFFFFFFFF, 0xFFFFFFFF, len(nb), len(extra), 0, 0, 0, 0,
            0xFFFFFFFF)
        central += nb + extra
    buf += central
    e64_at = len(buf)
    buf += _Z64_EOCD.pack(
        b"PK\x06\x05" if poison == "eocd64_sig" else b"PK\x06\x06",
        _Z64_EOCD.size - 12, 45, 45, 0, 0, n, n, len(central), cd_off)
    buf += _Z64_LOC.pack(
        b"PK\x06\x08" if poison == "locator_sig" else b"PK\x06\x07",
        0, e64_at, 1)
    buf += _EOCD.pack(b"PK\x05\x06", 0, 0, 0xFFFF, 0xFFFF,
                      0xFFFFFFFF, 0xFFFFFFFF, 0)
    return bytes(buf)


def walk_zip_members(
    data: bytes | None,
) -> tuple[list[tuple[str, bytes, int]] | None, str | None]:
    """The shared structural walk: EOCD -> central directory -> verified
    local headers -> inflated + CRC-checked member payloads.  Returns
    ([(name, raw_bytes, method)...], None) or (None, error).  parse_zip
    and the OOXML reader (docx_real.py) both sit on this."""
    if data is None or len(data) < _EOCD.size:
        return None, "short or missing payload"
    data = bytes(data)
    eocd_at = data.rfind(b"PK\x05\x06", max(0, len(data) - 65557))
    if eocd_at < 0:
        return None, "missing end-of-central-directory"
    try:
        (_, _dn, _cn, n_here, n_total, cd_size, cd_off, _cl) = _EOCD.unpack_from(
            data, eocd_at
        )
    except struct.error:
        return None, "truncated end-of-central-directory"
    cd_end = eocd_at
    if n_total == 0xFFFF or cd_off == 0xFFFFFFFF or cd_size == 0xFFFFFFFF:
        # ZIP64 (APPNOTE §4.3.14/15): a locator sits immediately before
        # the classic EOCD and points at the EOCD64 record, which holds
        # the real u64 counts/size/offset the sentinels saturated
        loc_at = eocd_at - _Z64_LOC.size
        if loc_at < 0 or data[loc_at:loc_at + 4] != b"PK\x06\x07":
            return None, "bad zip64 locator"
        (_, _disk, e64_at, _ndisk) = _Z64_LOC.unpack_from(data, loc_at)
        if e64_at + _Z64_EOCD.size > loc_at:
            return None, "bad zip64 eocd"
        z = _Z64_EOCD.unpack_from(data, e64_at)
        if z[0] != b"PK\x06\x06":
            return None, "bad zip64 eocd"
        (_sig, _rsz, _vm, _vn, _d1, _d2, n_here, n_total, cd_size,
         cd_off) = z
        cd_end = e64_at
    if cd_off + cd_size > cd_end or n_total != n_here:
        return None, "central directory out of bounds"
    eocd_at = cd_end
    pos = cd_off
    members: list[tuple[str, bytes, int]] = []
    for _ in range(n_total):
        if pos + _CENTRAL.size > eocd_at:
            return None, "truncated central directory"
        fields = _CENTRAL.unpack_from(data, pos)
        if fields[0] != b"PK\x01\x02":
            return None, "bad central-directory signature"
        (_sig, _vm, _vn, _fl, method, _t, _d, crc, csize, usize,
         nlen, elen, clen, _dk, _ia, _ea, lho) = fields
        name = data[pos + _CENTRAL.size:pos + _CENTRAL.size + nlen]
        extra = data[pos + _CENTRAL.size + nlen:
                     pos + _CENTRAL.size + nlen + elen]
        pos += _CENTRAL.size + nlen + elen + clen
        if 0xFFFFFFFF in (csize, usize, lho):
            # ZIP64 extra field 0x0001: supplies u64 values ONLY for the
            # saturated fields, in the fixed order uncompressed,
            # compressed, local-header offset (APPNOTE §4.5.3 — reading
            # all three unconditionally is the classic zip64 bug)
            z64 = None
            ep = 0
            while ep + 4 <= len(extra):
                fid, flen = struct.unpack_from("<HH", extra, ep)
                if fid == 0x0001:
                    z64 = extra[ep + 4:ep + 4 + flen]
                    break
                ep += 4 + flen
            if z64 is None:
                return None, "missing zip64 extra"
            zp = 0
            for field in ("usize", "csize", "lho"):
                cur = {"usize": usize, "csize": csize, "lho": lho}[field]
                if cur == 0xFFFFFFFF:
                    if zp + 8 > len(z64):
                        return None, "short zip64 extra"
                    val = struct.unpack_from("<Q", z64, zp)[0]
                    zp += 8
                    if field == "usize":
                        usize = val
                    elif field == "csize":
                        csize = val
                    else:
                        lho = val
        # trust-then-verify: the local header at the declared offset must
        # exist and agree on the member name
        if lho + _LOCAL.size > len(data):
            return None, "local header offset beyond EOF"
        lf = _LOCAL.unpack_from(data, lho)
        if lf[0] != b"PK\x03\x04":
            return None, "local header offset is wrong"
        lnlen, lelen = lf[9], lf[10]
        lname = data[lho + _LOCAL.size:lho + _LOCAL.size + lnlen]
        if lname != name:
            return None, "central/local name mismatch"
        dstart = lho + _LOCAL.size + lnlen + lelen
        payload = data[dstart:dstart + csize]
        if len(payload) != csize:
            return None, "truncated member data"
        if method == 0:
            raw = payload
        elif method == 8:
            try:
                raw = zlib.decompress(payload, -15)
            except zlib.error as e:
                return None, f"deflate failed: {e}"
        else:
            return None, f"unsupported method {method}"
        if len(raw) != usize:
            return None, "uncompressed size mismatch"
        if zlib.crc32(raw) & 0xFFFFFFFF != crc:
            return None, "crc mismatch"
        try:
            name_s = name.decode("utf-8")
        except UnicodeDecodeError:
            return None, "non-utf8 member name"
        members.append((name_s, raw, method))
    return members, None


def parse_zip(data: bytes | None) -> dict:
    """Structural parse of the ZIP subset.

    Returns {n_members, methods, total_bytes, text, error}: methods is
    the comma-joined per-member method list in central-directory order,
    total_bytes the summed uncompressed sizes, text the concatenated
    member texts. Malformed -> error row."""
    none = {"n_members": None, "methods": None, "total_bytes": None,
            "text": None}
    members, err = walk_zip_members(data)
    if err is not None:
        return {**none, "error": err}
    texts: list[str] = []
    for _name, raw, _method in members:
        try:
            texts.append(raw.decode("utf-8"))
        except UnicodeDecodeError:
            return {**none, "error": "non-utf8 member payload"}
    return {
        "n_members": len(members),
        "methods": ",".join(str(m) for _, _, m in members),
        "total_bytes": sum(len(raw) for _, raw, _ in members),
        "text": "".join(texts),
        "error": None,
    }


_TAR_BLOCK = 512


def build_tar(members: list[tuple[str, str]]) -> bytes:
    """Emit a real POSIX ustar archive from (name, text) members: 512-byte
    headers with correct octal sizes and CHECKSUMS, data blocks padded to
    512, two zero end-blocks. Fixed mtime keeps output deterministic;
    any tar implementation reads these files."""
    buf = bytearray()
    for name, text in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError("name too long for the ustar subset")
        data = text.encode("utf-8")
        hdr = bytearray(_TAR_BLOCK)
        hdr[0:len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = b"%011o\x00" % len(data)
        hdr[136:148] = b"%011o\x00" % 0o14000000000  # fixed mtime
        hdr[148:156] = b" " * 8  # checksum field spaces while summing
        hdr[156:157] = b"0"  # regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = b"%06o\x00 " % chk
        buf += hdr
        buf += data
        pad = -len(data) % _TAR_BLOCK
        buf += b"\x00" * pad
    buf += b"\x00" * (2 * _TAR_BLOCK)
    return bytes(buf)


def parse_tar(data: bytes | None) -> dict:
    """Structural parse of the ustar subset: 512-byte header walk with
    per-header CHECKSUM verification (sum of header bytes with the
    checksum field read as spaces), octal size fields, data-block
    padding, two-zero-block terminator. Non-regular entries are skipped
    by size; malformed archives yield error rows."""
    none = {"n_members": None, "total_bytes": None, "text": None}
    if data is None or len(data) < 2 * _TAR_BLOCK:
        return {**none, "error": "short or missing payload"}
    data = bytes(data)
    pos = 0
    texts: list[str] = []
    total = 0
    n = 0
    while pos + _TAR_BLOCK <= len(data):
        hdr = data[pos:pos + _TAR_BLOCK]
        if hdr == b"\x00" * _TAR_BLOCK:
            nxt = data[pos + _TAR_BLOCK:pos + 2 * _TAR_BLOCK]
            if nxt != b"\x00" * _TAR_BLOCK:
                return {**none, "error": "lone zero block"}
            return {
                "n_members": n, "total_bytes": total,
                "text": "".join(texts), "error": None,
            }
        try:
            declared = int(hdr[148:156].rstrip(b"\x00 ").lstrip() or b"0", 8)
            size = int(hdr[124:136].rstrip(b"\x00 ").lstrip() or b"0", 8)
        except ValueError:
            return {**none, "error": "non-octal header field"}
        actual = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if actual != declared:
            return {**none, "error": "header checksum mismatch"}
        if hdr[257:262] != b"ustar":
            return {**none, "error": "missing ustar magic"}
        body = data[pos + _TAR_BLOCK:pos + _TAR_BLOCK + size]
        if len(body) != size:
            return {**none, "error": "truncated member data"}
        typeflag = hdr[156:157]
        if typeflag in (b"0", b"\x00"):
            try:
                texts.append(body.decode("utf-8"))
            except UnicodeDecodeError:
                return {**none, "error": "non-utf8 member payload"}
            total += size
            n += 1
        pos += _TAR_BLOCK + size + (-size % _TAR_BLOCK)
    return {**none, "error": "missing end-of-archive blocks"}


def build_tar_pax(members: list[tuple[str, str]], *,
                  poison: str | None = None) -> bytes:
    """build_tar, but names longer than the 100-byte ustar field emit
    the REAL extension mechanisms: even members a pax 'x' extended
    header (``len key=value\\n`` records, length field counts ITSELF —
    the spec's fixed-point quirk) applying to the next file; odd
    members a GNU 'L' longname block. Short names ride the plain ustar
    path. Any modern tar reads all three forms. ``poison``:
    ``bad_pax_len`` forces the first long name onto the pax path with
    its record length overstated by one."""
    buf = bytearray()
    poisoned = False

    def _hdr(name_b: bytes, size: int, typeflag: bytes) -> bytes:
        hdr = bytearray(_TAR_BLOCK)
        hdr[0:len(name_b)] = name_b
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = b"%011o\x00" % size
        hdr[136:148] = b"%011o\x00" % 0o14000000000
        hdr[148:156] = b" " * 8
        hdr[156:157] = typeflag
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        hdr[148:156] = b"%06o\x00 " % sum(hdr)
        return bytes(hdr)

    def _blocked(data: bytes) -> bytes:
        return data + b"\x00" * (-len(data) % _TAR_BLOCK)

    for idx, (name, text) in enumerate(members):
        nb = name.encode("utf-8")
        data = text.encode("utf-8")
        if len(nb) > 100:
            force_pax = poison == "bad_pax_len" and not poisoned
            if idx % 2 == 0 or force_pax:
                # pax: "len path=value\n" where len counts the whole
                # record INCLUDING the digits of len itself
                body = b"path=" + nb + b"\n"
                rec_len = len(body) + 1  # provisional: 1-digit length
                while len(str(rec_len)) + 1 + len(body) != rec_len:
                    rec_len = len(str(rec_len)) + 1 + len(body)
                if force_pax:
                    rec_len += 1  # overstated: record no longer ends \n
                    poisoned = True
                pax = str(rec_len).encode() + b" " + body
                buf += _hdr(b"./PaxHeaders/" + nb[:80], len(pax), b"x")
                buf += _blocked(pax)
            else:
                buf += _hdr(b"././@LongLink", len(nb) + 1, b"L")
                buf += _blocked(nb + b"\x00")
            stored_name = nb[:100]
        else:
            stored_name = nb
        buf += _hdr(stored_name, len(data), b"0")
        buf += _blocked(data)
    buf += b"\x00" * (2 * _TAR_BLOCK)
    return bytes(buf)


def parse_tar_names(data: bytes | None) -> dict:
    """The ustar walk of parse_tar, plus NAME RECOVERY through both
    long-name extension mechanisms: a pax 'x' extended header's
    ``path=`` record overrides the NEXT member's name (records framed
    as ``len key=value\\n`` with self-counting lengths, verified); a
    GNU 'L' block's payload is the next member's name (trailing NUL).
    Returns {n_members, names, longest_name, text, error}; names in
    archive order, '|'-joined."""
    none = {"n_members": None, "names": None, "longest_name": None,
            "text": None}
    if data is None or len(data) < 2 * _TAR_BLOCK:
        return {**none, "error": "short or missing payload"}
    data = bytes(data)
    pos = 0
    names: list[str] = []
    texts: list[str] = []
    pending_name: str | None = None
    while pos + _TAR_BLOCK <= len(data):
        hdr = data[pos:pos + _TAR_BLOCK]
        if hdr == b"\x00" * _TAR_BLOCK:
            nxt = data[pos + _TAR_BLOCK:pos + 2 * _TAR_BLOCK]
            if nxt != b"\x00" * _TAR_BLOCK:
                return {**none, "error": "lone zero block"}
            return {
                "n_members": len(names),
                "names": "|".join(names),
                "longest_name": max((len(n) for n in names), default=0),
                "text": "".join(texts),
                "error": None,
            }
        try:
            declared = int(hdr[148:156].rstrip(b"\x00 ").lstrip() or b"0", 8)
            size = int(hdr[124:136].rstrip(b"\x00 ").lstrip() or b"0", 8)
        except ValueError:
            return {**none, "error": "non-octal header field"}
        if sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:]) != declared:
            return {**none, "error": "header checksum mismatch"}
        if hdr[257:262] != b"ustar":
            return {**none, "error": "missing ustar magic"}
        body = data[pos + _TAR_BLOCK:pos + _TAR_BLOCK + size]
        if len(body) != size:
            return {**none, "error": "truncated member data"}
        typeflag = hdr[156:157]
        if typeflag == b"x":
            p = 0
            while p < len(body):
                sp = body.find(b" ", p)
                if sp < 0:
                    return {**none, "error": "malformed pax record"}
                try:
                    rec_len = int(body[p:sp])
                except ValueError:
                    return {**none, "error": "malformed pax record"}
                rec = body[p:p + rec_len]
                if (rec_len <= sp - p or p + rec_len > len(body)
                        or not rec.endswith(b"\n")):
                    return {**none, "error": "bad pax record length"}
                kv = rec[sp - p + 1:-1]
                eq = kv.find(b"=")
                if eq < 0:
                    return {**none, "error": "malformed pax record"}
                if kv[:eq] == b"path":
                    try:
                        pending_name = kv[eq + 1:].decode("utf-8")
                    except UnicodeDecodeError:
                        return {**none, "error": "non-utf8 pax path"}
                p += rec_len
        elif typeflag == b"L":
            try:
                pending_name = body.rstrip(b"\x00").decode("utf-8")
            except UnicodeDecodeError:
                return {**none, "error": "non-utf8 longname"}
        elif typeflag in (b"0", b"\x00"):
            if pending_name is not None:
                name = pending_name
                pending_name = None
            else:
                try:
                    name = hdr[:100].rstrip(b"\x00").decode("utf-8")
                except UnicodeDecodeError:
                    return {**none, "error": "non-utf8 member name"}
            names.append(name)
            try:
                texts.append(body.decode("utf-8"))
            except UnicodeDecodeError:
                return {**none, "error": "non-utf8 member payload"}
        pos += _TAR_BLOCK + size + (-size % _TAR_BLOCK)
    return {**none, "error": "missing end-of-archive blocks"}


TAR_FEATURES_SCHEMA = (
    "doc_id long, n_members int, total_bytes long, text string, "
    "error string"
)


def extract_tar_features(df: DataFrame, content_col: str = "content",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> parsed tar rows, one Arrow-batched pass."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_tar(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_members": pd.array(
                        [r["n_members"] for r in rows], dtype="Int32"
                    ),
                    "total_bytes": pd.array(
                        [r["total_bytes"] for r in rows], dtype="Int64"
                    ),
                    "text": [r["text"] for r in rows],
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(op, TAR_FEATURES_SCHEMA)


ZIP_FEATURES_SCHEMA = (
    "doc_id long, n_members int, methods string, total_bytes long, "
    "text string, error string"
)


def extract_zip_features(df: DataFrame, content_col: str = "content",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> parsed archive rows via one Arrow-batched
    mapInPandas pass."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_zip(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_members": pd.array(
                        [r["n_members"] for r in rows], dtype="Int32"
                    ),
                    "methods": [r["methods"] for r in rows],
                    "total_bytes": pd.array(
                        [r["total_bytes"] for r in rows], dtype="Int64"
                    ),
                    "text": [r["text"] for r in rows],
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(op, ZIP_FEATURES_SCHEMA)


# --- gzip (RFC 1952): the member-framed compression wrapper ----------------
# ZIP proved the random-access container; gzip is the STREAM wrapper crawl
# payloads actually arrive in (Content-Encoding: gzip, .warc.gz, .tar.gz).
# The format is a SEQUENCE of members, each a header with five optional
# fields gated by FLG bits (FTEXT/FHCRC/FEXTRA/FNAME/FCOMMENT), a raw
# DEFLATE body, and a CRC32 + ISIZE trailer over the UNCOMPRESSED bytes.
# A reader that stops at the first member silently drops data (bgzip and
# pigz emit multi-member streams routinely), and one that skips trailer
# verification ships corrupt text — both are graded here.

_GZ_MAGIC = b"\x1f\x8b"
_GZ_MTIME = 1_600_000_000  # fixed: deterministic output
_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def build_gzip_member(name: str | None, data: bytes, *,
                      extra: bytes | None = None,
                      comment: str | None = None,
                      hcrc: bool = True) -> bytes:
    """Emit one REAL RFC 1952 member: optional FEXTRA/FNAME/FCOMMENT
    fields, optional FHCRC (CRC32-of-header & 0xffff), raw-deflate body,
    CRC32 + ISIZE trailer. stdlib ``gzip`` opens every emitted stream."""
    flg = 0
    if extra is not None:
        flg |= _FEXTRA
    if name is not None:
        flg |= _FNAME
    if comment is not None:
        flg |= _FCOMMENT
    if hcrc:
        flg |= _FHCRC
    hdr = bytearray(_GZ_MAGIC)
    hdr += bytes([8, flg])
    hdr += struct.pack("<I", _GZ_MTIME)
    hdr += bytes([0, 255])  # XFL, OS=unknown
    if extra is not None:
        hdr += struct.pack("<H", len(extra)) + extra
    if name is not None:
        hdr += name.encode("latin-1") + b"\x00"
    if comment is not None:
        hdr += comment.encode("latin-1") + b"\x00"
    if hcrc:
        hdr += struct.pack("<H", zlib.crc32(bytes(hdr)) & 0xFFFF)
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    body = co.compress(data) + co.flush()
    trailer = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF,
                          len(data) & 0xFFFFFFFF)
    return bytes(hdr) + body + trailer


def build_gzip(members: list[tuple[str | None, bytes]], **kw) -> bytes:
    """Concatenate RFC 1952 members (multi-member streams are the bgzip /
    pigz / `cat a.gz b.gz` reality a compliant reader must walk)."""
    return b"".join(build_gzip_member(n, d, **kw) for n, d in members)


def gunzip_members(data: bytes | None) -> dict:
    """Walk EVERY member of an RFC 1952 stream, verifying as it goes.

    Returns {names: list, payloads: list[bytes], error}. Check order is
    fixed (magic -> CM -> reserved FLG -> field walk -> FHCRC -> inflate
    -> CRC32 -> ISIZE) so poisoned fixtures fail with a DETERMINISTIC
    error string — the degradation contract all codecs share."""
    if data is None or len(data) < 18:
        return {"names": None, "payloads": None,
                "error": "short or missing payload"}
    data = bytes(data)
    pos, names, payloads = 0, [], []
    while pos < len(data):
        if len(data) - pos < 18:
            return {"names": None, "payloads": None,
                    "error": "truncated member header"}
        if data[pos:pos + 2] != _GZ_MAGIC:
            return {"names": None, "payloads": None, "error": "bad magic"}
        cm, flg = data[pos + 2], data[pos + 3]
        if cm != 8:
            return {"names": None, "payloads": None,
                    "error": "unsupported compression method"}
        if flg & 0xE0:
            return {"names": None, "payloads": None,
                    "error": "reserved FLG bits set"}
        p = pos + 10
        try:
            if flg & _FEXTRA:
                (xlen,) = struct.unpack_from("<H", data, p)
                p += 2 + xlen
            name = None
            if flg & _FNAME:
                end = data.index(b"\x00", p)
                name = data[p:end].decode("latin-1")
                p = end + 1
            if flg & _FCOMMENT:
                p = data.index(b"\x00", p) + 1
            if flg & _FHCRC:
                (want,) = struct.unpack_from("<H", data, p)
                if zlib.crc32(data[pos:p]) & 0xFFFF != want:
                    return {"names": None, "payloads": None,
                            "error": "header crc mismatch"}
                p += 2
        except (ValueError, struct.error):
            return {"names": None, "payloads": None,
                    "error": "truncated member header"}
        do = zlib.decompressobj(-15)
        try:
            raw = do.decompress(data[p:])
        except zlib.error:
            return {"names": None, "payloads": None,
                    "error": "bad deflate stream"}
        if not do.eof:
            return {"names": None, "payloads": None,
                    "error": "truncated member"}
        tail_at = len(data) - len(do.unused_data)
        if len(do.unused_data) < 8:
            return {"names": None, "payloads": None,
                    "error": "truncated member trailer"}
        crc, isize = struct.unpack_from("<II", data, tail_at)
        if zlib.crc32(raw) & 0xFFFFFFFF != crc:
            return {"names": None, "payloads": None,
                    "error": "member crc32 mismatch"}
        if len(raw) & 0xFFFFFFFF != isize:
            return {"names": None, "payloads": None,
                    "error": "isize mismatch"}
        names.append(name)
        payloads.append(raw)
        pos = tail_at + 8
    if not payloads:
        return {"names": None, "payloads": None,
                "error": "short or missing payload"}
    return {"names": names, "payloads": payloads, "error": None}


def parse_gzip(data: bytes | None) -> dict:
    """gunzip_members + UTF-8 text view: {n_members, member_names,
    total_bytes, text, error} — the tar/zip feature shape."""
    none = {"n_members": None, "member_names": None,
            "total_bytes": None, "text": None}
    m = gunzip_members(data)
    if m["error"] is not None:
        return {**none, "error": m["error"]}
    try:
        texts = [p.decode("utf-8") for p in m["payloads"]]
    except UnicodeDecodeError:
        return {**none, "error": "non-utf8 member payload"}
    return {
        "n_members": len(texts),
        "member_names": ",".join(n or "" for n in m["names"]),
        "total_bytes": sum(len(p) for p in m["payloads"]),
        "text": "".join(texts),
        "error": None,
    }


def parse_targz(data: bytes | None) -> dict:
    """tar-in-gzip composition: gunzip every member, CONCATENATE the
    decompressed bytes (RFC 1952 semantics: a multi-member stream
    decompresses to the concatenation), then run the verified ustar walk.
    gzip-tier errors surface first; tar-tier errors keep their own
    strings — two independent degradation tiers, one row either way."""
    none = {"n_members": None, "total_bytes": None, "text": None}
    m = gunzip_members(data)
    if m["error"] is not None:
        return {**none, "error": m["error"]}
    return parse_tar(b"".join(m["payloads"]))


GZIP_FEATURES_SCHEMA = (
    "doc_id long, n_members int, member_names string, total_bytes long, "
    "text string, error string"
)


def extract_gzip_features(df: DataFrame, content_col: str = "content",
                          id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> walked gzip rows, one Arrow-batched pass."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_gzip(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_members": pd.array(
                        [r["n_members"] for r in rows], dtype="Int32"
                    ),
                    "member_names": [r["member_names"] for r in rows],
                    "total_bytes": pd.array(
                        [r["total_bytes"] for r in rows], dtype="Int64"
                    ),
                    "text": [r["text"] for r in rows],
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        op, GZIP_FEATURES_SCHEMA
    )


def extract_targz_features(df: DataFrame, content_col: str = "content",
                           id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary) -> tar.gz rows (gunzip -> verified tar walk)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_targz(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_members": pd.array(
                        [r["n_members"] for r in rows], dtype="Int32"
                    ),
                    "total_bytes": pd.array(
                        [r["total_bytes"] for r in rows], dtype="Int64"
                    ),
                    "text": [r["text"] for r in rows],
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(op, TAR_FEATURES_SCHEMA)


# --- streamed (bit-3) zips: sizes ride AFTER the data -----------------

_DESC_SIG = b"PK\x07\x08"


def build_zip_streamed(members: list[tuple[str, bytes, int]], *,
                       signed_desc_every: int = 2,
                       nonzero_local: bool = False,
                       lie_descriptor: bool = False) -> bytes:
    """Emit a STREAMED zip: general-purpose bit 3 set, local header
    crc/sizes ZERO, and a data descriptor (crc, csize, usize) after
    each member's payload — with the PK\\x07\\x08 signature on every
    ``signed_desc_every``-th member and SIGNATURELESS on the rest
    (both forms are legal per APPNOTE 4.3.9.3, and a reader that
    requires the signature drops half the world's streamed zips)."""
    buf = bytearray()
    central = bytearray()
    for k, (name, data, method) in enumerate(members):
        nb = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(data) + co.flush()
        else:
            payload = data
        off = len(buf)
        lcrc = crc if nonzero_local and k == 0 else 0
        buf += _LOCAL.pack(b"PK\x03\x04", 20, 0x08, method, 0x6020,
                           0x5ab1, lcrc,
                           0 if not (nonzero_local and k == 0)
                           else len(payload),
                           0, len(nb), 0)
        buf += nb + payload
        dcrc = crc ^ (1 if lie_descriptor and k == 0 else 0)
        desc = struct.pack("<III", dcrc, len(payload), len(data))
        if k % signed_desc_every == 0:
            buf += _DESC_SIG
        buf += desc
        central += _CENTRAL.pack(b"PK\x01\x02", 20, 20, 0x08, method,
                                 0x6020, 0x5ab1, crc, len(payload),
                                 len(data), len(nb), 0, 0, 0, 0, 0,
                                 off)
        central += nb
    cd_off = len(buf)
    buf += central
    buf += _EOCD.pack(b"PK\x05\x06", 0, 0, len(members),
                      len(members), len(central), cd_off, 0)
    return bytes(buf)


def parse_zip_streamed(data: bytes | None) -> dict:
    """Walk a streamed zip: central-directory sizes locate the data,
    then the per-member DATA DESCRIPTOR (signed or signatureless —
    both accepted) is cross-checked against the central values and
    the recomputed CRC. Bit-3 members must carry ZERO local
    crc/sizes (a nonzero value means a lying writer, rejected)."""
    none = {"n_members": None, "n_streamed": None,
            "n_signed_desc": None, "content_bytes": None,
            "content_sum": None}
    members, err = walk_zip_members(data)
    if err is not None:
        return {**none, "error": err}
    data = bytes(data)
    try:
        # re-walk the central directory for flags/offsets
        eocd_at = data.rfind(b"PK\x05\x06",
                             max(0, len(data) - 65557))
        (_, _dn, _cn, _nh, n_total, cd_size,
         cd_off, _cl) = _EOCD.unpack_from(data, eocd_at)
        pos = cd_off
        n_streamed = n_signed = 0
        content_bytes = content_sum = 0
        for _ in range(n_total):
            fields = _CENTRAL.unpack_from(data, pos)
            (_sig, _vm, _vn, flags, method, _t, _d, crc, csize,
             usize, nlen, elen, clen, _dk, _ia, _ea, lho) = fields
            pos += _CENTRAL.size + nlen + elen + clen
            lf = _LOCAL.unpack_from(data, lho)
            lnlen, lelen = lf[9], lf[10]
            dstart = lho + _LOCAL.size + lnlen + lelen
            if flags & 0x08:
                n_streamed += 1
                if lf[6] != 0 or lf[7] != 0 or lf[8] != 0:
                    raise ValueError(
                        "streamed member with nonzero local sizes")
                dend = dstart + csize
                # APPNOTE ambiguity: a signatureless descriptor whose
                # CRC happens to equal 0x08074B50 sniffs as signed.
                # Deterministic resolution: prefer the signed reading,
                # but if the central-directory cross-check rejects it,
                # retry the signatureless reading (descriptor at dend,
                # no 4-byte skip) before declaring the member malformed.
                sniffed = data[dend:dend + 4] == _DESC_SIG
                offsets = [dend + 4, dend] if sniffed else [dend]
                matched = None
                for at in offsets:
                    if at + 12 <= len(data):
                        dcrc, dcsize, dusize = struct.unpack_from(
                            "<III", data, at)
                        if (dcrc, dcsize, dusize) == (crc, csize,
                                                      usize):
                            matched = at
                            break
                if matched is None:
                    if dend + 12 > len(data):
                        raise ValueError("truncated data descriptor")
                    raise ValueError(
                        "descriptor disagrees with directory")
                if matched == dend + 4:
                    n_signed += 1
        # content accounting from the shared walk's payloads
        for _name, raw_bytes, _m in members:
            content_bytes += len(raw_bytes)
            content_sum += sum(raw_bytes)
    except (ValueError, struct.error) as e:
        msg = str(e) or "malformed structure"
        return {**none, "error": msg}
    return {"n_members": len(members), "n_streamed": n_streamed,
            "n_signed_desc": n_signed,
            "content_bytes": content_bytes,
            "content_sum": content_sum, "error": None}


def extract_zip_streamed_features(df: DataFrame,
                                  content_col: str = "content",
                                  id_col: str = "doc_id"
                                  ) -> DataFrame:
    schema = ("doc_id long, n_members int, n_streamed int, "
              "n_signed_desc int, content_bytes bigint, "
              "content_sum bigint, error string")

    def op(batches: Iterator[pd.DataFrame]
           ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                r = parse_zip_streamed(
                    None if blob is None else bytes(blob))
                rows.append({"doc_id": int(i), **r})
            out = pd.DataFrame(rows)
            for c in ("n_members", "n_streamed", "n_signed_desc"):
                out[c] = out[c].astype("Int32")
            for c in ("content_bytes", "content_sum"):
                out[c] = out[c].astype("Int64")
            yield out

    return df.mapInPandas(op, schema)
