"""Pixel-level glyph OCR (operators/ocr_glyph.py): font separation
properties, render->PNG->decode->recognize round trips, noise
absorption bounds, failure contract, and the Spark extractor."""

from __future__ import annotations

import random

import numpy as np
import pytest

from cies_ocr_java_spark.operators.ocr_glyph import (
    ALPHABET,
    FONT_MIN_DIST,
    GLYPH_PITCH,
    _TEMPLATES,
    ocr_pixels,
    ocr_png,
    render_text_pixels,
    render_text_png,
)


def test_font_minimum_separation_is_what_recognition_assumes():
    """Every glyph pair differs in >= FONT_MIN_DIST pixels (computed at
    import; recognition's acceptance radius derives from it), and the
    guarantee is >= 3 so ANY single-pixel corruption decodes uniquely."""
    n = len(_TEMPLATES)
    dmin = min(
        int(np.abs(
            _TEMPLATES[i].astype(int) - _TEMPLATES[j].astype(int)
        ).sum())
        for i in range(n) for j in range(i + 1, n)
    )
    assert dmin == FONT_MIN_DIST >= 3


def test_round_trip_every_glyph_and_random_strings():
    assert ocr_png(render_text_png(ALPHABET))["text"] == ALPHABET
    rng = random.Random(3)
    for _ in range(60):
        t = "".join(rng.choice(ALPHABET) for _ in range(rng.randint(1, 30)))
        assert ocr_png(render_text_png(t))["text"] == t


def test_single_pixel_noise_is_always_absorbed():
    t = "HELLO WORLD 0123456789"
    size = render_text_pixels(t).size
    for fp in range(0, size, 3):
        assert ocr_png(render_text_png(t, flip_pixel=fp))["text"] == t


def test_heavy_noise_degrades_to_question_mark_never_misreads():
    """Corrupting many pixels of one cell must yield '?' or the true
    glyph — never silently the WRONG letter (the acceptance radius is
    strictly inside half the font separation)."""
    rng = random.Random(9)
    for _ in range(200):
        t = "ABC"
        px = render_text_pixels(t)
        flat = px.reshape(-1).copy()
        # corrupt 2-6 pixels inside the middle glyph's columns
        cols = range(GLYPH_PITCH, GLYPH_PITCH + 5)
        idxs = [r * px.shape[1] + c for r in range(7) for c in cols]
        for j in rng.sample(idxs, rng.randint(2, 6)):
            flat[j] = 255 - flat[j]
        got = ocr_pixels(flat.reshape(px.shape))
        assert got[0] == "A" and got[2] == "C"
        assert got[1] in ("B", "?")


def test_failure_contract():
    png = render_text_png("XYZ")
    assert ocr_png(png[:-14])["error"] == "truncated chunk"
    assert ocr_png(None)["error"] == "short or missing payload"
    assert ocr_png(b"\x00" * 40)["error"] == "bad png signature"


def test_empty_string_renders_and_reads_back_empty():
    assert ocr_png(render_text_png(""))["text"] == ""


def test_spark_extractor(spark):
    from cies_ocr_java_spark.operators.ocr_glyph import extract_ocr_glyph

    rows = [
        (1, render_text_png("SPARK 42")),
        (2, render_text_png("NOISY", flip_pixel=11)),
        (3, render_text_png("BROKEN")[:-14]),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r.doc_id: r for r in extract_ocr_glyph(df).collect()}
    assert out[1].text == "SPARK 42" and out[1].height == 7
    assert out[1].width == 6 * 8 - 1
    assert out[2].text == "NOISY"
    assert out[3].error == "truncated chunk"
    assert out[4].error == "short or missing payload"


def test_pdf_embedded_image_ocr_end_to_end(spark):
    """PDF text layer + embedded rendered-text image -> structural walk
    + pixel OCR reassembles BOTH modalities in reading order."""
    from pyspark.sql import functions as F  # noqa: F401

    from cies_ocr_java_spark.operators.pdf_real import (
        build_pdf_interleaved,
        extract_pdf_ocr_spans,
    )

    px = render_text_pixels("SCANNED PAGE 7")
    pdf_bytes = build_pdf_interleaved(
        "lead text tail text",
        [(px.shape[1], px.shape[0], px.tobytes(), "pixels")],
    )
    df = spark.createDataFrame(
        [(1, pdf_bytes)], "doc_id long, payload binary"
    )
    rows = sorted(
        extract_pdf_ocr_spans(df).collect(), key=lambda r: r.span_order
    )
    assert [r.kind for r in rows] == ["text", "media", "text"]
    assert rows[1].ocr_text == "SCANNED PAGE 7"
    assert rows[1].media_ref == "pdf://im/5"
    assert "".join(r.text for r in rows if r.kind == "text") == (
        "lead text tail text"
    )
