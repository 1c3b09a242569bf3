"""Round-3 session-4 operators: ICO container codec, PDF inline images
(BI/ID/EI), PDF /Annots extraction, the JSON-LD / srcset / sitemap
crawl-markup extractors, and RFC 3986 URL resolution (checked against
urllib.parse.urljoin as an independent reference implementation)."""

from __future__ import annotations

import random
import struct
from urllib.parse import urljoin

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cies_ocr_java_spark.operators.multimodal import (
    _BMP_INFO_HDR,
    build_ico,
    decode_ico,
    extract_ico_features,
    get_codec,
    sniff_media_format,
)
from cies_ocr_java_spark.operators.pdf_real import (
    build_pdf_inline_images,
    build_pdf_with_annots,
    extract_annotations,
    parse_pdf_anchored,
    parse_pdf_inline_images,
    parse_pdf_interleaved,
    parse_real_pdf,
)


# ---------------------------------------------------------------------------
# ICO container
# ---------------------------------------------------------------------------


def test_ico_round_trip_dib_png_mixed():
    r = decode_ico(build_ico([("dib", 5, 3, 100), ("png", 4, 2, 9)]))
    assert r == {
        "n_images": 2, "width": 5, "height": 3, "fmt0": "dib",
        "ink_sum": 5 * 3 * 3 * 100 + 4 * 2 * 9, "error": None,
    }


def test_ico_png_first_entry_reports_png():
    r = decode_ico(build_ico([("png", 7, 7, 30)]))
    assert (r["fmt0"], r["width"], r["ink_sum"]) == ("png", 7, 7 * 7 * 30)


def test_ico_double_height_rule_enforced():
    # craft a DIB member whose header claims SINGLE height — the ICO
    # double-height (XOR+AND) rule must reject it
    b = bytearray(build_ico([("dib", 4, 2, 50)]))
    hdr_off = 6 + 16  # ICONDIR + one entry
    (hs, w, h2) = struct.unpack_from("<Iii", b, hdr_off)
    assert (hs, w, h2) == (40, 4, 4)
    struct.pack_into("<Iii", b, hdr_off, hs, w, 2)  # h2=2 == entry h
    assert decode_ico(bytes(b))["error"] == "entry 0 size mismatch"


def test_ico_truncation_and_header_failures():
    p = build_ico([("dib", 5, 3, 10)])
    assert decode_ico(p[:-4])["error"] == "entry 0 payload out of bounds"
    assert decode_ico(b"\x00\x00\x02\x00" + p[4:])["error"] == (
        "bad icondir header"
    )
    assert decode_ico(None)["error"] == "short or missing payload"
    empty = struct.pack("<HHH", 0, 1, 0)
    assert decode_ico(empty)["error"] == "empty icon directory"


def test_ico_nested_png_error_surfaces_with_entry_ordinal():
    p = bytearray(build_ico([("dib", 3, 3, 1), ("png", 4, 4, 7)]))
    # corrupt bytes INSIDE the png payload (size stays valid)
    p[-6] ^= 0xFF
    err = decode_ico(bytes(p))["error"]
    assert err.startswith("entry 1 png: ")


def test_ico_fuzz_never_raises():
    rng = random.Random(11)
    base = build_ico([("dib", 6, 4, 77), ("png", 5, 5, 31)])
    for _ in range(300):
        m = bytearray(base)
        for _ in range(rng.randint(1, 10)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        r = decode_ico(bytes(m))
        assert (r["ink_sum"] is None) == (r["error"] is not None)


def test_ico_sniff_and_codec_registry():
    p = build_ico([("dib", 2, 2, 9)])
    assert sniff_media_format(p) == "ico"
    out = get_codec("ico").decode_batch(pd.Series([p, b"nope"]))
    assert out["n_frames"][0] == 1 and out["mime"][0] == "image/x-icon"
    assert out["error"][1] is not None


def test_ico_spark_extractor(spark):
    df = spark.createDataFrame(
        [(1, build_ico([("dib", 5, 3, 100), ("png", 4, 2, 9)])),
         (2, b"not an ico")],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in extract_ico_features(df).collect()}
    assert rows[1]["ink_sum"] == 5 * 3 * 3 * 100 + 4 * 2 * 9
    assert rows[1]["n_images"] == 2 and rows[1]["fmt0"] == "dib"
    assert rows[2]["error"] is not None and rows[2]["mime"] is None


# ---------------------------------------------------------------------------
# PDF inline images
# ---------------------------------------------------------------------------


def _inline_doc():
    return build_pdf_inline_images([
        [("text", "hello", 72, 720),
         ("img", 8, 8, 40, 100, 500),   # samples cover '(' and 'EI' bytes
         ("text", "world", 72, 640),
         ("img", 4, 3, 7, 200, 300)],
        [("img", 5, 2, 99, 50, 50)],
    ])


def test_inline_images_round_trip_with_anchors():
    r = parse_pdf_inline_images(_inline_doc())
    assert r["error"] is None
    assert r["images"] == [
        (0, 100.0, 500.0, 8, 8, 64 * 40 + 63 * 64 // 2),
        (0, 200.0, 300.0, 4, 3, 12 * 7 + 11 * 12 // 2),
        (1, 50.0, 50.0, 5, 2, 10 * 99 + 45),
    ]


def test_inline_images_interleave_through_every_parser():
    p = _inline_doc()
    # text-layer parse unaffected
    assert parse_real_pdf(p)["text"] == "helloworld"
    # anchored parse keeps stream order and CTM anchors
    spans = parse_pdf_anchored(p)["spans"]
    assert [s[0] for s in spans] == [
        "text", "media", "text", "media", "media",
    ]
    assert spans[1] == ("media", "inline 8x8", 100.0, 500.0)
    # interleaved parse assigns ordinal media_refs and decodes ink
    ispans = parse_pdf_interleaved(p)["spans"]
    assert [s["kind"] for s in ispans] == [
        "text", "media", "text", "media", "media",
    ]
    assert ispans[1]["media_ref"] == "pdf://inline/0"
    assert ispans[1]["ink_sum"] == 64 * 40 + 63 * 64 // 2
    assert ispans[4]["media_ref"] == "pdf://inline/2"


def test_inline_image_samples_skipped_by_count_not_resync():
    # an image whose samples CONTAIN ' EI ' must not terminate early:
    # base 30, w*h=64 covers bytes 30..93 which includes 0x20,'E','I'
    p = build_pdf_inline_images([[("img", 8, 8, 30, 10, 10),
                                  ("text", "after", 72, 700)]])
    r = parse_pdf_inline_images(p)
    assert r["error"] is None and r["images"][0][5] == 64 * 30 + 2016
    assert parse_real_pdf(p)["text"] == "after"


def test_inline_image_failure_modes():
    t = build_pdf_inline_images([[("img", 8, 8, 40, 0, 0)]],
                                truncate_last=True)
    assert parse_pdf_inline_images(t)["error"] == "inline image truncated"
    # missing EI: valid count but garbage after the samples
    raw = build_pdf_inline_images([[("img", 2, 2, 5, 0, 0)]])
    assert parse_pdf_inline_images(raw)["error"] is None


def test_inline_image_fuzz_never_raises():
    rng = random.Random(7)
    base = _inline_doc()
    for _ in range(200):
        m = bytearray(base)
        for _ in range(rng.randint(1, 8)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        r = parse_pdf_inline_images(bytes(m))
        assert (r["images"] is None) == (r["error"] is not None)


# ---------------------------------------------------------------------------
# PDF annotations
# ---------------------------------------------------------------------------


def test_annots_round_trip_all_kinds():
    p = build_pdf_with_annots("x", [
        [("uri", "https://ex.test/a?b=(1)", (10, 700, 110, 712)),
         ("note", "a note", (20, 650, 36, 666))],
        [("goto", "sec2", (30, 600, 130, 612))],
    ])
    r = extract_annotations(p)
    assert r["error"] is None
    kinds = [(a["page_idx"], a["kind"], a["target"]) for a in r["annots"]]
    assert kinds == [
        (0, "uri", "https://ex.test/a?b=(1)"),
        (0, "note", "a note"),
        (1, "goto", "sec2"),
    ]
    assert r["annots"][0]["x0"] == 10.0 and r["annots"][2]["y1"] == 612.0


def test_annots_page_without_annots_contributes_nothing():
    p = build_pdf_with_annots("x", [[], [("note", "n", (0, 0, 1, 1))]])
    r = extract_annotations(p)
    assert [a["page_idx"] for a in r["annots"]] == [1]


def test_annots_broken_ref_fails_document():
    p = build_pdf_with_annots("x", [[("uri", "u", (0, 0, 1, 1))]],
                              broken_ref=True)
    assert extract_annotations(p)["error"] == "object 999 not in xref"


def test_annots_fuzz_never_raises():
    rng = random.Random(3)
    base = build_pdf_with_annots("y", [
        [("uri", "https://f.test/z", (1, 2, 3, 4))],
        [("goto", "d", (5, 6, 7, 8))],
    ])
    for _ in range(200):
        m = bytearray(base)
        for _ in range(rng.randint(1, 8)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        r = extract_annotations(bytes(m))
        assert (r["annots"] is None) == (r["error"] is not None)


# ---------------------------------------------------------------------------
# JSON-LD / srcset / sitemap extractors
# ---------------------------------------------------------------------------


def test_jsonld_blocks_exclude_non_ld_scripts(spark):
    from cies_ocr_java_spark.operators.dom_tree import extract_jsonld

    page = (
        '<html><head>'
        '<script type="application/ld+json">{"a": "x &amp; y"}</script>'
        '<script>var notld = 1;</script>'
        "<script type='application/ld+json'>{\"b\":2}</script>"
        '</head><body><p>t</p></body></html>'
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    rows = extract_jsonld(df, F.col("page")).orderBy("block_idx").collect()
    assert [(r["block_idx"], r["raw_json"]) for r in rows] == [
        (0, '{"a": "x &amp; y"}'),   # entities NOT decoded in script
        (1, '{"b":2}'),
    ]


def test_srcset_ordinals_skip_plain_imgs(spark):
    from cies_ocr_java_spark.operators.dom_tree import extract_srcset

    page = (
        '<html><body><img src="plain.jpg">'
        '<img srcset="a.jpg  480w,b.jpg 900w">'
        "<img srcset='c.jpg 2x , d.jpg'></body></html>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    rows = extract_srcset(df, F.col("page")).orderBy(
        "img_idx", "cand_idx"
    ).collect()
    got = [(r["img_idx"], r["cand_idx"], r["url"], r["width_w"],
            r["density_x"]) for r in rows]
    assert got == [
        (0, 0, "a.jpg", 480, None),
        (0, 1, "b.jpg", 900, None),
        (1, 0, "c.jpg", None, 2.0),
        (1, 1, "d.jpg", None, 1.0),
    ]


def test_sitemap_urlset_and_index(spark):
    from cies_ocr_java_spark.operators.dom_tree import extract_sitemap

    urlset = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a.test/?x=1&amp;y=2</loc>"
        "<lastmod>2023-04-05</lastmod><priority>0.8</priority></url>"
        "<url><loc>https://a.test/b</loc></url></urlset>"
    )
    index = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>https://a.test/s1.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [(1, urlset), (2, index)], "doc_id long, page string"
    )
    rows = extract_sitemap(df, F.col("page")).orderBy(
        "doc_id", "entry_idx"
    ).collect()
    got = [(r["doc_id"], r["entry_idx"], r["loc"], r["lastmod"],
            r["priority"], r["is_index"]) for r in rows]
    assert got == [
        (1, 0, "https://a.test/?x=1&y=2", "2023-04-05", "0.8", False),
        (1, 1, "https://a.test/b", None, None, False),
        (2, 0, "https://a.test/s1.xml", None, None, True),
    ]


# ---------------------------------------------------------------------------
# URL resolution vs urllib (independent RFC 3986 implementation)
# ---------------------------------------------------------------------------

_BASES = [
    "https://h.test/dir1/dir2/page.html?q=1#top",
    "https://h.test/",
    "http://u.test/a/b/c?z=9",
]
_REFS = [
    "https://other.test/abs", "//cdn.test/lib.js", "/rooted/x.html",
    "sub/page2.html", "./same.html", "../up.html", "../../../over.html",
    "?only=query", "#frag", "", "a/b/../c.html", "d/.", "mailto:x@y.test",
    "x/./y/../../z", "..", ".", "/a/../b/./c/../../d",
]


def test_resolve_url_agrees_with_urllib(spark):
    from cies_ocr_java_spark.functions.urls import resolve_url

    cases = [(b, r) for b in _BASES for r in _REFS]
    df = spark.createDataFrame(cases, "base string, ref string")
    got = df.select(
        "base", "ref", resolve_url(F.col("base"), F.col("ref")).alias("res")
    ).collect()
    for row in got:
        if row["ref"] == "":
            # strict RFC 3986 §5.2.2: an empty ref yields the base
            # WITHOUT its fragment; urllib documents that it returns
            # the base verbatim instead — pin the RFC behavior
            expect = urljoin(row["base"], "").split("#")[0]
        else:
            expect = urljoin(row["base"], row["ref"])
        assert row["res"] == expect, (row["base"], row["ref"],
                                      row["res"], expect)
