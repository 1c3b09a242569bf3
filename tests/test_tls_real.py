"""TLS ClientHello walker (operators/tls_real.py): round-trip, GREASE
tolerance, nested length gates, max-version selection, fuzz."""

import random

from cies_ocr_java_spark.operators.tls_real import (
    build_client_hello,
    parse_client_hello,
)


def _mk(i, oversize=0):
    nc = 2 + i % 4
    ciphers = [0x1301, 0x1302, 0x1303, 0xC02B, 0xC02F][:nc]
    if i % 3 == 0:
        ciphers.insert(i % len(ciphers), 0x0A0A + 0x1010 * (i % 16))
    return build_client_hello(
        sni=f"h{i % 13}.edge{i % 7}.example", ciphers=ciphers,
        alpn=["h2", "http/1.1"] if i % 2 == 0 else ["http/1.1"],
        versions=[0x0304, 0x0303] if i % 2 == 0 else [0x0303],
        session_id_len=i % 33,
        groups=[29, 23, 24] if i % 5 == 0 else None,
        alpn_oversize=oversize)


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 4, 5, 7, 15, 30]:
        m = parse_client_hello(_mk(i))
        assert m["error"] is None
        assert m["sni"] == f"h{i % 13}.edge{i % 7}.example"
        assert m["n_ciphers"] == 2 + i % 4 + (1 if i % 3 == 0 else 0)
        assert m["n_grease"] == (1 if i % 3 == 0 else 0)
        assert m["alpn"] == ("h2,http/1.1" if i % 2 == 0
                             else "http/1.1")
        assert m["max_version"] == ("TLS1.3" if i % 2 == 0
                                    else "TLS1.2")
        assert m["n_extensions"] == (4 if i % 5 == 0 else 3)
        assert m["session_id_len"] == i % 33


def test_grease_never_wins_max_version():
    """A GREASE value numerically above TLS1.3 must not be reported as
    the max supported version."""
    b = build_client_hello("a.b", [0x1301], ["h2"],
                           [0xFAFA, 0x0304, 0x0303])
    m = parse_client_hello(b)
    assert m["error"] is None and m["max_version"] == "TLS1.3"


def test_nested_length_gates():
    assert parse_client_hello(_mk(3, oversize=1000))["error"] \
        == "extension 16 overruns block"
    assert parse_client_hello(_mk(3)[:-4])["error"] \
        == "record overruns payload"
    assert parse_client_hello(None)["error"] \
        == "not a tls handshake record"
    assert parse_client_hello(b"\x17\x03\x01\x00\x02ab")["error"] \
        == "not a tls handshake record"
    # handshake length lying beyond the record
    b = bytearray(_mk(2))
    b[6:9] = (len(b)).to_bytes(3, "big")
    assert parse_client_hello(bytes(b))["error"] \
        == "handshake overruns record"


def test_fuzz_never_raises():
    rng = random.Random(11)
    base = _mk(6)
    for _ in range(600):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        m = parse_client_hello(bytes(x[:rng.randrange(len(x) + 1)]))
        assert "error" in m
