"""MIME multipart + transfer-encoding decode (operators/mime.py):
quoted-printable must agree with Python's quopri on well-formed input
(including multi-byte UTF-8 escapes), degrade definedly on malformed
escapes, and the whole parse must stay zero-Python."""

import base64
import quopri
import random

from pyspark.sql import functions as F

from cies_ocr_java_spark.operators.mime import (
    decode_quoted_printable,
    parse_mime_multipart,
)


def _decode_many(spark, encoded):
    df = spark.createDataFrame(
        list(enumerate(encoded)), "i long, s string"
    )
    rows = df.select("i", decode_quoted_printable(F.col("s")).alias("d")) \
        .collect()
    return {r.i: r.d for r in rows}


def test_qp_matches_quopri_on_encoded_corpus(spark):
    rng = random.Random(7)
    texts = []
    for _ in range(40):
        n = rng.randint(0, 60)
        texts.append(
            "".join(
                rng.choice("ab =é€\n\tzж?0")
                for _ in range(n)
            )
        )
    enc = [
        quopri.encodestring(t.encode("utf-8")).decode("ascii")
        for t in texts
    ]
    got = _decode_many(spark, enc)
    for i, t in enumerate(texts):
        exp = quopri.decodestring(enc[i].encode("ascii")).decode("utf-8")
        assert got[i] == exp, (enc[i], got[i], exp)


def test_qp_malformed_escapes_stay_literal(spark):
    got = _decode_many(spark, ["a=Zq", "tail=", "=", "", "x=3", "ok=3Dx"])
    assert got[0] == "a=Zq"
    assert got[1] == "tail="
    assert got[2] == "="
    assert got[3] == ""
    assert got[4] == "x=3"
    assert got[5] == "ok=x"


def _msg(boundary, parts, preamble="pre\n", epilogue="post\n"):
    out = (
        f'Content-Type: multipart/mixed; boundary="{boundary}"\n\n'
        + preamble
    )
    for hdrs, body in parts:
        out += f"--{boundary}\n{hdrs}\n\n{body}\n"
    return out + f"--{boundary}--\n{epilogue}"


def test_multipart_parts_and_encodings(spark):
    b64 = base64.b64encode("bin payload".encode()).decode()
    m = _msg(
        "XbX",
        [
            ("Content-Type: text/plain", "hello"),
            (
                "Content-Type: text/html\n"
                "Content-Transfer-Encoding: quoted-printable",
                "caf=C3=A9=\n joined",
            ),
            (
                "Content-Type: application/octet-stream\n"
                "Content-Transfer-Encoding: BASE64",
                b64,
            ),
        ],
    )
    df = spark.createDataFrame([(1, m)], "doc_id long, msg string")
    rows = sorted(
        parse_mime_multipart(df, F.col("msg")).collect(),
        key=lambda r: r.part_idx,
    )
    assert [
        (r.part_idx, r.content_type, r.encoding, r.decoded_text)
        for r in rows
    ] == [
        (0, "text/plain", "7bit", "hello"),
        (1, "text/html", "quoted-printable", "café joined"),
        (2, "application/octet-stream", "base64", "bin payload"),
    ]
    assert all(r.decoded_len == len(r.decoded_text) for r in rows)


def test_multipart_hostile_inputs_defined(spark):
    cases = [
        (1, "no boundary here at all"),
        (2, 'Content-Type: multipart/mixed; boundary=""\n\n--\nx\n----\n'),
        (3, _msg("q+*[", [("Content-Type: text/plain", "meta boundary")])),
        (4, 'Content-Type: multipart/mixed; boundary="b"\n\n--b\nnoblank'),
    ]
    df = spark.createDataFrame(cases, "doc_id long, msg string")
    rows = parse_mime_multipart(df, F.col("msg")).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc and 2 not in by_doc
    # regex-metachar boundary is literal-quoted, parses normally
    assert [r.decoded_text for r in by_doc[3]] == ["meta boundary"]
    # part with no blank line: whole piece is body, defaults applied
    assert by_doc[4][0].encoding == "7bit"


def test_multipart_zero_python_plan(spark):
    from cies_ocr_java_spark.plans.queries import QUERIES

    plan = (
        QUERIES["mime_multipart_extract"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange SinglePartition" not in plan


def test_raw_parts_preserve_binary_through_base64(spark):
    """A binary part must survive unbase64 byte-exact — the text
    decoder's UTF-8 pass would corrupt it (why parse_mime_parts_raw
    exists)."""
    from cies_ocr_java_spark.operators.mime import parse_mime_parts_raw
    from cies_ocr_java_spark.operators.multimodal import (
        build_bmp,
        decode_bmp,
    )

    bmp = build_bmp(5, 4, 200)
    m = _msg(
        "bb",
        [
            (
                "Content-Type: image/bmp\n"
                "Content-Transfer-Encoding: base64",
                base64.b64encode(bmp).decode(),
            )
        ],
    )
    df = spark.createDataFrame([(1, m)], "doc_id long, msg string")
    parts = parse_mime_parts_raw(df, F.col("msg"))
    row = parts.select(
        F.unbase64(F.regexp_replace("body", r"\s", "")).alias("content")
    ).collect()[0]
    assert bytes(row.content) == bmp
    d = decode_bmp(bytes(row.content))
    assert (d["width"], d["height"], d["error"]) == (5, 4, None)
