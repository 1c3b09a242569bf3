"""Java class walker (operators/javaclass_real.py): two-slot wart,
1-based pool, modified UTF-8, slot-accurate census, fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.javaclass_real import (
    _mutf8_decode,
    _mutf8_encode,
    build_class,
    parse_class,
)


def _mk(i, **kw):
    m, nl = 1 + i % 3, i % 3
    return build_class(
        f"com/graft/Doc{i % 50}", "java/lang/Object",
        [(f"run{k}", "()V") for k in range(m)],
        [2**40 + i * 1000 + k for k in range(nl)],
        major=55 + i % 7, **kw), m, nl


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12, 30]:
        b, m, nl = _mk(i)
        r = parse_class(b)
        assert r["error"] is None
        assert r["class_name"] == f"com/graft/Doc{i % 50}"
        assert r["super_name"] == "java/lang/Object"
        assert r["n_pool"] == 5 + 2 * nl + 3 * m
        assert r["n_wide"] == nl
        assert r["n_methods"] == m
        assert r["n_utf8"] == m + 3


def test_two_slot_wart_is_load_bearing():
    """With a long constant in the pool, entries AFTER it sit at
    +1 slot; the this_class index in the builder already accounts for
    it, so a one-slot parser would resolve the wrong entries.  Pin by
    asserting the pool gap: the entry after a long has index
    long_idx + 2."""
    b, _, _ = _mk(1)  # one long constant
    r = parse_class(b)
    assert r["error"] is None and r["n_wide"] == 1
    # ...and a class whose long sits before the method names still
    # resolves those names correctly
    assert r["method_names"].startswith("run0")


def test_modified_utf8():
    assert _mutf8_encode("A\x00B") == b"A\xc0\x80B"
    assert _mutf8_decode(b"A\xc0\x80B") == "A\x00B"
    b = build_class("A\x00B", "S", [], [])
    assert parse_class(b)["class_name"] == "A\x00B"
    b = build_class("Ünïcode", "S", [], [])
    assert parse_class(b)["class_name"] == "Ünïcode"


def test_poison_tiers():
    assert parse_class(_mk(3, bad_tag=True)[0])["error"] \
        == "undefined pool tag 2 at entry 1"
    assert parse_class(_mk(3)[0][:-4])["error"] \
        == "truncated class body"
    assert parse_class(None)["error"] == "short or missing payload"
    b, _, _ = _mk(3)
    assert parse_class(b"\xca\xfe\xba\xbf" + b[4:])["error"] \
        == "bad class magic"
    # this_class pointing at a utf8 (not a class) entry
    bad = bytearray(b)
    body_at = len(b) - 2 - 8 * parse_class(b)["n_methods"] - 2 - 2 \
        - 2 - 6
    struct.pack_into(">H", bad, body_at + 2, 1)  # utf8 entry index
    assert "not a class entry" in parse_class(bytes(bad))["error"]


def test_fuzz_never_raises():
    rng = random.Random(37)
    base, _, _ = _mk(5)
    for _ in range(600):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_class(blob)
