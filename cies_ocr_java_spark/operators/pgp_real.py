"""OpenPGP (RFC 4880) armor + packet walker — two stacked grammars:
the ASCII armor envelope (BEGIN/END dash lines that must AGREE on
the armor type, optional Key: Value headers, a blank-line seam,
radix-64 body, and the "=XXXX" CRC24 line whose checksum — poly
0x1864CFB, init 0xB704CE — covers the DECODED bytes, so any
single-byte payload corruption is caught at the armor layer before
packet parsing even starts), then the packet stream with BOTH
header encodings: old format (bits 10TTLLLL, 2-bit tag, length
type 0/1/2 = 1/2/4 octets; type 3 "indeterminate" is rejected by
name at rest — the token_bin/EBML lesson), and new format
(11TTTTTT, 6-bit tag, lengths 1-octet < 192, 2-octet 192..223 as
((b0-192)<<8)+b1+192, 5-octet 255, and PARTIAL body lengths
224..254 encoding 1<<(b&0x1F) that chain until a definite length —
RFC 4880 requires the FIRST partial to be >= 512 octets, enforced
here, and partials only on data packets).

Old-format length type 3 ("indeterminate": the body runs to the
end of the enclosing stream) is accepted because the armor bounds
it exactly — gpg --store emits precisely this shape — but only as
the FINAL packet by construction.

Literal data packets (tag 11) are opened: format octet, filename
length + name, 4-byte date, then the literal bytes that are the
payload census. Compressed packets (tag 8) are OPENED and recursed
into: algo 0 = stored, 1 = raw deflate, 2 = zlib, both decoded by
the repo's own from-scratch inflate (operators/inflate.py), depth-
capped. Other tags are counted and skipped by length. Interop:
tests parse real `gpg --store` output and gpg round-trips our
armor (tests/test_pgp_real.py).

Failure contract: every malformed message yields an error ROW.

Reference parity: none — crypto envelope recovery is
beyond-reference.
"""

from __future__ import annotations

import base64
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_CRC24_INIT = 0xB704CE
_CRC24_POLY = 0x1864CFB


def crc24(data: bytes) -> int:
    c = _CRC24_INIT
    for b in data:
        c ^= b << 16
        for _ in range(8):
            c <<= 1
            if c & 0x1000000:
                c ^= _CRC24_POLY
    return c & 0xFFFFFF


def _new_len(n: int) -> bytes:
    if n < 192:
        return bytes((n,))
    if n < 8384:
        v = n - 192
        return bytes((192 + (v >> 8), v & 0xFF))
    return b"\xff" + n.to_bytes(4, "big")


def compressed_body(algo: int, inner: bytes) -> bytes:
    """Body of a tag-8 compressed packet: algo octet + stream."""
    if algo == 0:
        return bytes((0,)) + inner
    if algo == 1:
        from cies_ocr_java_spark.operators.inflate import deflate_raw
        return bytes((1,)) + deflate_raw(inner)
    if algo == 2:
        from cies_ocr_java_spark.operators.inflate import deflate_zlib
        return bytes((2,)) + deflate_zlib(inner)
    return bytes((algo,)) + inner


def build_packets(packets: list[tuple[int, bytes, str]], *,
                  short_first_partial: bool = False,
                  chop: int = 0) -> bytes:
    """packets: (tag, body, style); style in new/old/partial/indet
    (indet = old format, length-to-end — only valid last)."""
    out = bytearray()
    for tag, body, style in packets:
        if style == "indet":
            out.append(0x80 | (tag << 2) | 3)
            out += body
        elif style == "old":
            if len(body) < 256:
                out.append(0x80 | (tag << 2) | 0)
                out.append(len(body))
                out += body
            else:
                out.append(0x80 | (tag << 2) | 1)
                out += len(body).to_bytes(2, "big")
                out += body
        elif style == "partial":
            out.append(0xC0 | tag)
            first = 256 if short_first_partial else 512
            pos = 0
            seg = first
            while len(body) - pos > seg:
                out.append(224 + seg.bit_length() - 1)
                out += body[pos:pos + seg]
                pos += seg
                seg = 512
            out += _new_len(len(body) - pos)
            out += body[pos:]
        else:
            out.append(0xC0 | tag)
            out += _new_len(len(body))
            out += body
    if chop:
        del out[-chop:]
    return bytes(out)


def literal_body(data: bytes, fname: bytes = b"doc.txt",
                 date: int = 1_700_000_000) -> bytes:
    return (b"b" + bytes((len(fname),)) + fname
            + date.to_bytes(4, "big") + data)


def armor(payload: bytes, *, kind: str = "PGP MESSAGE",
          headers: list[tuple[str, str]] | None = None,
          bad_crc: bool = False, mismatched_end: bool = False) -> str:
    lines = [f"-----BEGIN {kind}-----"]
    for k, v in headers or []:
        lines.append(f"{k}: {v}")
    lines.append("")
    b64 = base64.b64encode(payload).decode()
    for k in range(0, len(b64), 64):
        lines.append(b64[k:k + 64])
    c = crc24(payload)
    if bad_crc:
        c ^= 1
    lines.append("=" + base64.b64encode(c.to_bytes(3, "big")).decode())
    end_kind = "PGP SIGNATURE" if mismatched_end else kind
    lines.append(f"-----END {end_kind}-----")
    return "\n".join(lines) + "\n"


_PGP_NONE = {
    "n_packets": None, "n_literal": None, "literal_bytes": None,
    "n_partial_segs": None, "n_old_format": None,
    "n_compressed": None, "n_armor_headers": None,
}


class _PacketWalk:
    def __init__(self) -> None:
        self.n_packets = 0
        self.n_literal = 0
        self.literal_bytes = 0
        self.n_partial = 0
        self.n_old = 0
        self.n_compressed = 0

    def walk(self, data: bytes, depth: int = 0) -> None:
        if depth > 4:
            raise ValueError("compression nesting too deep")
        pos = 0

        def take(n: int) -> bytes:
            nonlocal pos
            if pos + n > len(data):
                raise ValueError("truncated packet")
            b = data[pos:pos + n]
            pos += n
            return b

        while pos < len(data):
            hdr = take(1)[0]
            if not hdr & 0x80:
                raise ValueError("bad packet header bit")
            body = b""
            if hdr & 0x40:  # new format
                tag = hdr & 0x3F
                first = True
                while True:
                    b0 = take(1)[0]
                    if b0 < 192:
                        body += take(b0)
                        break
                    if b0 < 224:
                        b1 = take(1)[0]
                        body += take(((b0 - 192) << 8) + b1 + 192)
                        break
                    if b0 == 255:
                        body += take(int.from_bytes(take(4), "big"))
                        break
                    seg = 1 << (b0 & 0x1F)
                    if first and seg < 512:
                        raise ValueError("first partial too short")
                    self.n_partial += 1
                    body += take(seg)
                    first = False
            else:  # old format
                tag = (hdr >> 2) & 0x0F
                ltype = hdr & 3
                self.n_old += 1
                if ltype == 0:
                    body = take(take(1)[0])
                elif ltype == 1:
                    body = take(int.from_bytes(take(2), "big"))
                elif ltype == 2:
                    body = take(int.from_bytes(take(4), "big"))
                else:
                    # indeterminate: to end of the bounded stream;
                    # final by construction
                    body = data[pos:]
                    pos = len(data)
            self.n_packets += 1
            if tag == 11:
                if len(body) < 6:
                    raise ValueError("literal packet too short")
                fn_len = body[1]
                if 6 + fn_len > len(body):
                    raise ValueError("literal filename overruns")
                self.n_literal += 1
                self.literal_bytes += len(body) - 6 - fn_len
            elif tag == 8:
                if not body:
                    raise ValueError("empty compressed packet")
                algo, blob = body[0], body[1:]
                if algo == 0:
                    inner = blob
                elif algo in (1, 2):
                    from cies_ocr_java_spark.operators.inflate import (
                        InflateError,
                        inflate_raw,
                        inflate_zlib,
                    )
                    try:
                        if algo == 1:
                            inner, used = inflate_raw(blob)
                        else:
                            inner, used = inflate_zlib(blob)
                    except InflateError as e:
                        raise ValueError(
                            f"bad compressed stream: {e}") from None
                else:
                    raise ValueError(
                        "unsupported compression algorithm")
                self.n_compressed += 1
                self.walk(inner, depth + 1)


def parse_pgp(text: str | None) -> dict:
    if text is None or len(text) < 30:
        return {**_PGP_NONE, "error": "short or missing payload"}
    try:
        lines = text.strip("\n").split("\n")
        if (not lines[0].startswith("-----BEGIN ")
                or not lines[0].endswith("-----")
                or not lines[-1].startswith("-----END ")
                or not lines[-1].endswith("-----")):
            raise ValueError("bad armor envelope")
        kind0 = lines[0][len("-----BEGIN "):-5]
        kind1 = lines[-1][len("-----END "):-5]
        if kind0 != kind1:
            raise ValueError("armor type mismatch")
        body = lines[1:-1]
        n_headers = 0
        while body and body[0]:
            if ": " not in body[0]:
                raise ValueError("bad armor header")
            n_headers += 1
            body = body[1:]
        if not body or body[0]:
            raise ValueError("missing armor blank line")
        body = body[1:]
        if not body or not body[-1].startswith("="):
            raise ValueError("missing crc line")
        crc_line = body[-1][1:]
        try:
            want = int.from_bytes(
                base64.b64decode(crc_line, validate=True), "big")
            data = base64.b64decode("".join(body[:-1]),
                                    validate=True)
        except Exception:
            raise ValueError("bad base64") from None
        if crc24(data) != want:
            raise ValueError("crc24 mismatch")

        w = _PacketWalk()
        w.walk(data)
    except ValueError as e:
        return {**_PGP_NONE, "error": str(e)}
    return {
        "n_packets": w.n_packets, "n_literal": w.n_literal,
        "literal_bytes": w.literal_bytes,
        "n_partial_segs": w.n_partial, "n_old_format": w.n_old,
        "n_compressed": w.n_compressed,
        "n_armor_headers": n_headers, "error": None,
    }


_PGP_SCHEMA = (
    "doc_id long, n_packets int, n_literal int, "
    "literal_bytes bigint, n_partial_segs int, n_old_format int, "
    "n_compressed int, n_armor_headers int, error string"
)


def extract_pgp_features(df: DataFrame, content_col: str = "content",
                         id_col: str = "doc_id") -> DataFrame:
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, txt in zip(pdf[id_col], pdf[content_col]):
                r = parse_pgp(None if txt is None else str(txt))
                rows.append({"doc_id": int(i), **r})
            out = pd.DataFrame(rows)
            for c in ("n_packets", "n_literal", "n_partial_segs",
                      "n_old_format", "n_compressed",
                      "n_armor_headers"):
                out[c] = out[c].astype("Int32")
            out["literal_bytes"] = out["literal_bytes"].astype("Int64")
            yield out

    return df.mapInPandas(op, _PGP_SCHEMA)
