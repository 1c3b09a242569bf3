"""AcroForm field extraction (operators/pdf_forms.py): dotted fully
qualified names, /FT inheritance, /Btn name values, unfilled fields,
poison tiers, encrypted-document string decryption, fuzz."""

import random

from cies_ocr_java_spark.operators.pdf_forms import (
    build_pdf_form,
    parse_pdf_form,
)

FIELDS = [
    ("applicant", "Tx", "Ada (Analyst) \\ Lovelace", []),
    ("addr", "Tx", None, [
        ("street", None, "12 Analytical Way", []),
        ("city", None, None, []),
    ]),
    ("subscribe", "Btn", "Yes", []),
    ("country", "Ch", "GB", []),
]


def test_fqn_inheritance_and_values():
    r = parse_pdf_form(build_pdf_form(FIELDS))
    assert r["error"] is None
    assert r["fields"] == [
        (0, "applicant", "Tx", "Ada (Analyst) \\ Lovelace"),
        (1, "addr.street", "Tx", "12 Analytical Way"),
        (2, "addr.city", "Tx", None),  # unfilled, NOT an error
        (3, "subscribe", "Btn", "Yes"),
        (4, "country", "Ch", "GB"),
    ]


def test_no_acroform_is_empty_not_error():
    from cies_ocr_java_spark.operators.pdf_real import build_real_pdf

    r = parse_pdf_form(build_real_pdf("plain document"))
    assert r == {"fields": [], "error": None}


def test_poison_tiers():
    assert parse_pdf_form(build_pdf_form(FIELDS, cyclic_kids=True))[
        "error"] == "cyclic field tree"
    assert parse_pdf_form(build_pdf_form(FIELDS, missing_ft=True))[
        "error"] == "field chain missing /FT"
    assert "not in xref" in parse_pdf_form(
        build_pdf_form(FIELDS, dangling_ref=True))["error"]
    assert parse_pdf_form(None)["error"] == "missing %PDF header"


def test_deep_nesting_builds_long_fqn():
    spec = ("l0", "Tx", None,
            [("l1", None, None, [("l2", None, "deep", [])])])
    r = parse_pdf_form(build_pdf_form([spec]))
    assert r["fields"] == [(0, "l0.l1.l2", "Tx", "deep")]


def test_fuzz_never_raises():
    rng = random.Random(0xF0A2)
    base = build_pdf_form(FIELDS)
    for _ in range(300):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        r = parse_pdf_form(blob)
        assert "error" in r


def test_encrypted_form_equals_plaintext_twin():
    """Field-dict strings are INDIVIDUALLY encrypted under their own
    object's key; decoded fields must equal the plaintext form's
    exactly, and a password-protected form must reject — never emit
    half-decrypted fields. Ciphertext literals octal-escape control
    bytes and angle brackets (a raw '<<' inside a literal desyncs
    balanced-dict scanning)."""
    plain = parse_pdf_form(build_pdf_form(FIELDS))
    for m in ("rc4-40", "rc4-128", "aes-128"):
        r = parse_pdf_form(build_pdf_form(FIELDS, encrypt_method=m))
        assert r["error"] is None, (m, r["error"])
        assert r["fields"] == plain["fields"]
        rp = parse_pdf_form(build_pdf_form(
            FIELDS, encrypt_method=m, user_pw=b"secret"))
        assert rp["error"] == "password handshake failed"


def test_encrypted_form_ciphertext_sweep_many_keys():
    """200 distinct documents (distinct ids -> distinct ciphertexts):
    every one must round-trip — this is the sweep that catches a
    hostile ciphertext byte class the escaper misses."""
    for i in range(200):
        fields = [(f"f{i}", "Tx", f"value-{i} (x) \\ y", []),
                  (f"g{i}", "Tx", None,
                   [("kid", None, f"deep-{i}", [])])]
        enc = parse_pdf_form(build_pdf_form(
            fields, encrypt_method=("rc4-40", "rc4-128",
                                    "aes-128")[i % 3]))
        assert enc["error"] is None, (i, enc["error"])
        assert enc["fields"] == parse_pdf_form(
            build_pdf_form(fields))["fields"], i
