"""Punycode (RFC 3492) decoded from scratch + the IDNA ACE envelope.

Internationalized hostnames reach a crawler as ASCII-Compatible
Encoding labels (``xn--bcher-kva``); resolving them back to Unicode is
frontier-normalization work (the url_canonicalize / hreflang family
feed on hostnames). The ENCODER here is the real stdlib ``punycode``
codec; the DECODER is first-principles RFC 3492 §6.2:

- basic/extended split at the LAST delimiter, basic-range gate;
- generalized variable-length integers: base 36, per-position
  threshold t clamped to [tmin=1, tmax=26] around the bias;
- the full bias ADAPTATION function (damp=700, skew=38) after every
  decoded delta;
- the spec's overflow discipline (§6.4 "Overflow handling"): every
  ``i + digit*w`` and ``w *= base-t`` step is gated against maxint
  (2^31-1) BEFORE it happens — the exact checks the RFC's reference
  decoder performs;
- code-point validity: > U+10FFFF and surrogate range fail.

Case-insensitive digits are accepted (the RFC requires it) even
though the stdlib encoder emits lowercase only.

Degradation contract: malformed labels raise ``PunycodeError`` with a
stable kind; Spark callers map to error rows, never exceptions.
"""

from __future__ import annotations

__all__ = ["PunycodeError", "decode_punycode", "encode_punycode",
           "ace_to_unicode", "unicode_to_ace"]

_MAXINT = (1 << 31) - 1
_BASE, _TMIN, _TMAX, _SKEW, _DAMP = 36, 1, 26, 38, 700
_INITIAL_BIAS, _INITIAL_N = 72, 128


class PunycodeError(Exception):
    """Typed decode failure; str(e) starts with a stable error kind."""


def _digit(ch: str) -> int:
    o = ord(ch)
    if 0x61 <= o <= 0x7A:  # a-z
        return o - 0x61
    if 0x41 <= o <= 0x5A:  # A-Z (case-insensitive per RFC)
        return o - 0x41
    if 0x30 <= o <= 0x39:  # 0-9 -> 26..35
        return o - 0x30 + 26
    raise PunycodeError("bad punycode digit")


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + ((_BASE - _TMIN + 1) * delta) // (delta + _SKEW)


def decode_punycode(s: str) -> str:
    d = s.rfind("-")
    if d >= 0:
        basic, ext = s[:d], s[d + 1:]
    else:
        basic, ext = "", s
    for ch in basic:
        if ord(ch) >= 0x80:
            raise PunycodeError("non-basic code point before delimiter")
    output = list(basic)
    n, i, bias = _INITIAL_N, 0, _INITIAL_BIAS
    pos = 0
    while pos < len(ext):
        oldi, w = i, 1
        k = _BASE
        while True:
            if pos >= len(ext):
                raise PunycodeError("truncated punycode")
            digit = _digit(ext[pos])
            pos += 1
            if digit > (_MAXINT - i) // w:
                raise PunycodeError("punycode overflow")
            i += digit * w
            t = _TMIN if k <= bias + _TMIN else (
                _TMAX if k >= bias + _TMAX else k - bias
            )
            if digit < t:
                break
            if w > _MAXINT // (_BASE - t):
                raise PunycodeError("punycode overflow")
            w *= _BASE - t
            k += _BASE
        npoints = len(output) + 1
        bias = _adapt(i - oldi, npoints, oldi == 0)
        if i // npoints > _MAXINT - n:
            raise PunycodeError("punycode overflow")
        n += i // npoints
        i %= npoints
        if n > 0x10FFFF or 0xD800 <= n <= 0xDFFF:
            raise PunycodeError("invalid code point")
        output.insert(i, chr(n))
        i += 1
    return "".join(output)


def encode_punycode(s: str) -> str:
    """The REAL stdlib codec — the writer side of the parity pin."""
    return s.encode("punycode").decode("ascii")


def unicode_to_ace(label: str) -> str:
    """IDNA ToASCII minus nameprep: pure-ASCII labels pass through,
    anything else gets the ACE prefix + punycode."""
    if all(ord(c) < 0x80 for c in label):
        return label
    return "xn--" + encode_punycode(label)


def ace_to_unicode(label: str) -> str:
    """IDNA ToUnicode minus nameprep; non-ACE labels pass through."""
    if label[:4].lower() != "xn--":
        return label
    return decode_punycode(label[4:])
