"""ASN.1 DER walked from scratch + an X.509-subset certificate grammar.

TLS certificates are the wire metadata a crawler sees on every HTTPS
fetch; their envelope is ASN.1 under the Distinguished Encoding Rules
(X.690, public). This module implements the DER core generically and
a TBSCertificate-shaped subset on top (the proto_wire.py precedent:
closed grammar, own writer, oracle stated from the spec):

- TLV reader: identifier octets (class / constructed bit / tag number
  with the 0x1F high-tag-number base-128 continuation), length octets
  (short form; long form with DER's MINIMALITY gate — a long-form
  length that fits short form, or leading zero length octets, fail;
  the BER indefinite form 0x80 is forbidden in DER), value bounds;
- typed values with DER's canonical-form gates: INTEGER (two's
  complement, redundant leading 0x00/0xFF octets fail), BOOLEAN
  (exactly 0x00 or 0xFF), NULL (empty), OBJECT IDENTIFIER (40*X+Y
  first arc, base-128 sub-identifiers, non-minimal 0x80 lead fails),
  BIT STRING (unused-bit count 0..7, padding bits must be ZERO in
  DER), OCTET/UTF8String/PrintableString/IA5String, UTCTime
  (YYMMDDHHMMSSZ with the RFC 5280 50-year pivot) and
  GeneralizedTime, SEQUENCE/SET recursion with depth guards;
- trailing-garbage detection at every nesting level.

Degradation contract: malformed input raises ``DerError`` with a
stable kind — callers emit error rows, never exceptions. Cited
parity target: the reference terminates TLS in its HTTP layer
(pom.xml's spring-boot web stack) — certificate metadata extraction
is the crawl-side analog.
"""

from __future__ import annotations

import calendar

__all__ = ["DerError", "der_decode", "build_certificate",
           "parse_certificate", "encode_tlv", "encode_integer",
           "encode_oid"]

_MAX_DEPTH = 32


class DerError(Exception):
    """Typed DER failure; str(e) starts with a stable error kind."""


# ---------------------------------------------------------------------------
# generic decoder
# ---------------------------------------------------------------------------

def _read_tlv(data: bytes, pos: int) -> tuple[int, bool, bytes, int]:
    """One TLV: returns (tag_number_with_class, constructed, value,
    next_pos). Tag is (class << 8) | number so context tags don't
    collide with universal ones."""
    if pos >= len(data):
        raise DerError("truncated TLV header")
    ident = data[pos]
    pos += 1
    cls = ident >> 6
    constructed = bool(ident & 0x20)
    num = ident & 0x1F
    if num == 0x1F:  # high-tag-number form
        num = 0
        while True:
            if pos >= len(data):
                raise DerError("truncated TLV header")
            b = data[pos]
            pos += 1
            num = (num << 7) | (b & 0x7F)
            if num > 0xFFFF:
                raise DerError("tag number too large")
            if not b & 0x80:
                break
    if pos >= len(data):
        raise DerError("truncated TLV header")
    lb = data[pos]
    pos += 1
    if lb < 0x80:
        length = lb
    elif lb == 0x80:
        raise DerError("indefinite length forbidden in DER")
    else:
        n = lb & 0x7F
        if n > 8:
            raise DerError("length too large")
        if pos + n > len(data):
            raise DerError("truncated length octets")
        chunk = data[pos:pos + n]
        pos += n
        if chunk[0] == 0:
            raise DerError("non-minimal length encoding")
        length = int.from_bytes(chunk, "big")
        if length < 0x80:
            raise DerError("non-minimal length encoding")
    if pos + length > len(data):
        raise DerError("value past end of input")
    return (cls << 8) | num, constructed, data[pos:pos + length], pos + length


def der_decode(data: bytes, depth: int = 0):
    """Full decode of ONE value; trailing bytes fail. Returns a tree of
    (tag, python-value) pairs; constructed values hold child lists."""
    node, end = _decode_one(data, 0, depth)
    if end != len(data):
        raise DerError("trailing garbage after value")
    return node


def _decode_one(data: bytes, pos: int, depth: int):
    if depth > _MAX_DEPTH:
        raise DerError("nesting too deep")
    tag, constructed, val, end = _read_tlv(data, pos)
    if constructed:
        kids = []
        p = 0
        while p < len(val):
            kid, p = _decode_one(val, p, depth + 1)
            kids.append(kid)
        return (tag, kids), end
    return (tag, _primitive(tag, val)), end


def _primitive(tag: int, val: bytes):
    if tag == 0x02:  # INTEGER
        if not val:
            raise DerError("empty INTEGER")
        if len(val) > 1 and (
            (val[0] == 0x00 and not val[1] & 0x80)
            or (val[0] == 0xFF and val[1] & 0x80)
        ):
            raise DerError("non-minimal INTEGER")
        return int.from_bytes(val, "big", signed=True)
    if tag == 0x01:  # BOOLEAN
        if val not in (b"\x00", b"\xff"):
            raise DerError("bad DER BOOLEAN")
        return val == b"\xff"
    if tag == 0x05:  # NULL
        if val:
            raise DerError("non-empty NULL")
        return None
    if tag == 0x06:  # OID
        if not val:
            raise DerError("empty OID")
        arcs = [val[0] // 40, val[0] % 40]
        cur = 0
        started = False
        for b in val[1:]:
            if not started and b == 0x80:
                raise DerError("non-minimal OID arc")
            started = True
            cur = (cur << 7) | (b & 0x7F)
            if not b & 0x80:
                arcs.append(cur)
                cur = 0
                started = False
        if started:
            raise DerError("truncated OID arc")
        return ".".join(str(a) for a in arcs)
    if tag == 0x03:  # BIT STRING
        if not val:
            raise DerError("empty BIT STRING")
        unused = val[0]
        if unused > 7:
            raise DerError("bad BIT STRING unused count")
        if unused and len(val) == 1:
            raise DerError("bad BIT STRING unused count")
        if unused and val[-1] & ((1 << unused) - 1):
            raise DerError("nonzero BIT STRING padding")
        return (len(val) - 1) * 8 - unused, val[1:]
    if tag in (0x0C, 0x13, 0x16):  # UTF8 / Printable / IA5
        try:
            return val.decode("utf-8")
        except UnicodeDecodeError:
            raise DerError("invalid utf-8 in string") from None
    if tag == 0x17:  # UTCTime, RFC 5280 profile: YYMMDDHHMMSSZ
        s = val.decode("ascii", "replace")
        if len(s) != 13 or s[-1] != "Z" or not s[:-1].isdigit():
            raise DerError("bad UTCTime")
        yy = int(s[0:2])
        year = 2000 + yy if yy < 50 else 1900 + yy
        return _epoch(year, s[2:12])
    if tag == 0x18:  # GeneralizedTime: YYYYMMDDHHMMSSZ
        s = val.decode("ascii", "replace")
        if len(s) != 15 or s[-1] != "Z" or not s[:-1].isdigit():
            raise DerError("bad GeneralizedTime")
        return _epoch(int(s[0:4]), s[4:14])
    return bytes(val)  # OCTET STRING and anything else: raw


def _epoch(year: int, mdhms: str) -> int:
    mo, d, h, mi, se = (int(mdhms[i:i + 2]) for i in range(0, 10, 2))
    if not (1 <= mo <= 12 and 1 <= d <= 31 and h < 24 and mi < 60
            and se < 60):
        raise DerError("bad UTCTime")
    return calendar.timegm((year, mo, d, h, mi, se, 0, 0, 0))


# ---------------------------------------------------------------------------
# encoder (writer side of the closed grammar)
# ---------------------------------------------------------------------------

def encode_tlv(tag: int, value: bytes) -> bytes:
    n = len(value)
    if n < 0x80:
        return bytes([tag, n]) + value
    lb = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([tag, 0x80 | len(lb)]) + lb + value


def encode_integer(v: int) -> bytes:
    n = max(1, (v.bit_length() + 8) // 8) if v >= 0 else (
        (v + 1).bit_length() // 8 + 1
    )
    return encode_tlv(0x02, v.to_bytes(n, "big", signed=True))


def encode_oid(dotted: str) -> bytes:
    arcs = [int(a) for a in dotted.split(".")]
    body = bytearray([arcs[0] * 40 + arcs[1]])
    for a in arcs[2:]:
        enc = bytearray([a & 0x7F])
        a >>= 7
        while a:
            enc.insert(0, 0x80 | (a & 0x7F))
            a >>= 7
        body += enc
    return encode_tlv(0x06, bytes(body))


def _utctime(epoch: int) -> bytes:
    import time

    t = time.gmtime(epoch)
    s = "%02d%02d%02d%02d%02d%02dZ" % (
        t.tm_year % 100, t.tm_mon, t.tm_mday, t.tm_hour, t.tm_min,
        t.tm_sec,
    )
    return encode_tlv(0x17, s.encode("ascii"))


_OID_CN = "2.5.4.3"
_OID_SHA256_RSA = "1.2.840.113549.1.1.11"
_OID_RSA = "1.2.840.113549.1.1.1"


def _name(cn: str) -> bytes:
    atv = encode_tlv(
        0x30, encode_oid(_OID_CN) + encode_tlv(0x0C, cn.encode("utf-8"))
    )
    return encode_tlv(0x30, encode_tlv(0x31, atv))  # Name = SEQ of SET


def build_certificate(serial: int, subject_cn: str, issuer_cn: str,
                      not_before: int, not_after: int,
                      key: bytes, unused_bits: int = 0,
                      poison: str | None = None) -> bytes:
    """A TBSCertificate-shaped DER blob. ``poison`` emits one specific
    malformation: 'indefinite' (BER indefinite length), 'nonminimal'
    (INTEGER with a redundant leading zero), 'padding' (nonzero BIT
    STRING padding bits)."""
    if unused_bits:
        key = key[:-1] + bytes([key[-1] & ~((1 << unused_bits) - 1) & 0xFF])
    serial_enc = encode_integer(serial)
    if poison == "nonminimal":
        body = serial_enc[2:]
        serial_enc = encode_tlv(0x02, b"\x00" + body) \
            if body[0] < 0x80 else encode_tlv(0x02, b"\x00" + body)
    key_body = bytes([unused_bits]) + key
    if poison == "padding":
        key_body = bytes([7]) + key[:-1] + b"\x01"
    algo = encode_tlv(0x30, encode_oid(_OID_SHA256_RSA) + encode_tlv(0x05, b""))
    spki = encode_tlv(
        0x30,
        encode_tlv(0x30, encode_oid(_OID_RSA) + encode_tlv(0x05, b""))
        + encode_tlv(0x03, key_body),
    )
    tbs = (
        encode_tlv(0xA0, encode_integer(2))  # [0] EXPLICIT version v3
        + serial_enc
        + algo
        + _name(issuer_cn)
        + encode_tlv(0x30, _utctime(not_before) + _utctime(not_after))
        + _name(subject_cn)
        + spki
    )
    out = encode_tlv(0x30, tbs)
    if poison == "indefinite":
        out = b"\x30\x80" + out[2:]
    return out


def parse_certificate(data: bytes) -> dict:
    """Walk the TBS subset back out of the DER tree."""
    tag, kids = der_decode(data)
    # decoded tags are (class << 8) | number: SEQUENCE 0x30 -> 0x10,
    # the [0] EXPLICIT context tag -> 0x200
    if tag != 0x10 or not isinstance(kids, list) or len(kids) != 7:
        raise DerError("not a TBSCertificate")
    try:
        (ver_t, ver_v), (ser_t, serial), (alg_t, alg_kids), issuer, \
            (val_t, val_kids), subject, (spki_t, spki_kids) = kids
        if ver_t != 0x200 or ser_t != 0x02:
            raise DerError("not a TBSCertificate")

        def cn(node) -> str:
            _t, sets = node
            (_st, atvs) = sets[0]
            (_at, pair) = atvs[0]
            if pair[0][1] != _OID_CN:
                raise DerError("unexpected attribute OID")
            out = pair[1][1]
            if not isinstance(out, str):
                raise DerError("malformed certificate structure")
            return out

        nb, na = val_kids[0][1], val_kids[1][1]
        bits, _raw = spki_kids[1][1]
        out = {
            "version": ver_v[0][1],
            "serial": serial,
            "sig_oid": alg_kids[0][1],
            "issuer_cn": cn(issuer),
            "subject_cn": cn(subject),
            "not_before": nb,
            "not_after": na,
            "key_bits": bits,
            "key_oid": spki_kids[0][1][0][1],
        }
    except (TypeError, ValueError, IndexError, KeyError):
        # corruption can flip constructed bits so a field decodes into
        # the wrong python shape — same typed failure as a bad tag
        raise DerError("malformed certificate structure") from None
    if not all(isinstance(out[k], int)
               for k in ("serial", "not_before", "not_after", "key_bits")):
        raise DerError("malformed certificate structure")
    if not isinstance(out["sig_oid"], str) or not isinstance(
        out["key_oid"], str
    ):
        raise DerError("malformed certificate structure")
    return out
