"""REAL pixel-level OCR: glyph template matching over decoded image
bytes — the engine's first image-to-TEXT path that actually reads
pixels.

The reference delegates OCR to Textract (DocumentExtractManager.java:
571-599); the repo's ocr_mock models Textract's BLOCK STREAM. This
module closes the remaining gap at the pixel level, the way early
commercial OCR engines worked: a fixed-pitch 5x7 bitmap font renders
text into a GENUINE PNG (the real zlib/filter writer in multimodal.py),
and recognition segments the decoded pixel grid into glyph cells and
matches each cell against the font templates — exact match first, then
nearest-Hamming for noisy pixels (FONT_MIN_DIST below guarantees any
single-bit corruption still decodes uniquely; cells beyond the
acceptance radius come back as '?', never a crash).

render -> real PNG bytes -> structural PNG decode -> template match is
a full round trip through genuine image bytes, so the whole path is
oracle-checkable: the recovered string must equal the rendered string
(closed form), including under the 1-bit-noise tier.

Everything is numpy-vectorized inside Arrow batches; glyph matching is
one (cells x glyphs) Hamming-distance matrix multiply per image.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

GLYPH_W, GLYPH_H, GLYPH_PITCH = 5, 7, 6  # 5px glyph + 1px gap

# 5x7 fixed-pitch font: '#' = ink. Covers A-Z, 0-9, space.
_FONT_ROWS = {
    "A": [".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "B": ["####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."],
    "C": [".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."],
    "D": ["###..", "#..#.", "#...#", "#...#", "#...#", "#..#.", "###.."],
    "E": ["#####", "#....", "#....", "####.", "#....", "#....", "#####"],
    "F": ["#####", "#....", "#....", "####.", "#....", "#....", "#...."],
    "G": [".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".###."],
    "H": ["#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "I": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "#####"],
    "J": ["..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."],
    "K": ["#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"],
    "L": ["#....", "#....", "#....", "#....", "#....", "#....", "#####"],
    "M": ["#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"],
    "N": ["#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"],
    "O": [".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "P": ["####.", "#...#", "#...#", "####.", "#....", "#....", "#...."],
    "Q": [".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"],
    "R": ["####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"],
    "S": [".####", "#....", "#....", ".###.", "....#", "....#", "####."],
    "T": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."],
    "U": ["#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "V": ["#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."],
    "W": ["#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"],
    "X": ["#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"],
    "Y": ["#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."],
    "Z": ["#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"],
    "0": [".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."],
    "1": ["..#..", ".##..", "..#..", "..#..", "..#..", "..#..", "#####"],
    "2": [".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"],
    "3": [".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."],
    "4": ["...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."],
    "5": ["#####", "#....", "####.", "....#", "....#", "#...#", ".###."],
    "6": [".###.", "#....", "#....", "####.", "#...#", "#...#", ".###."],
    "7": ["#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."],
    "8": [".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."],
    "9": [".###.", "#...#", "#...#", ".####", "....#", "....#", ".###."],
    " ": [".....", ".....", ".....", ".....", ".....", ".....", "....."],
}

ALPHABET = "".join(sorted(_FONT_ROWS))


def _glyph_bits(ch: str) -> np.ndarray:
    rows = _FONT_ROWS[ch]
    return np.array(
        [[1 if c == "#" else 0 for c in r] for r in rows], dtype=np.uint8
    )


# (n_glyphs, 35) template matrix in ALPHABET order
_TEMPLATES = np.stack([_glyph_bits(c).reshape(-1) for c in ALPHABET])

# minimum pairwise Hamming distance across the whole font — recognition
# accepts a nearest match iff dist < FONT_MIN_DIST/2, so any corruption
# of fewer than FONT_MIN_DIST/2 pixels decodes uniquely and correctly.
FONT_MIN_DIST = int(
    min(
        int(np.abs(_TEMPLATES[i] - _TEMPLATES[j]).sum())
        for i in range(len(_TEMPLATES))
        for j in range(i + 1, len(_TEMPLATES))
    )
)


def render_text_pixels(s: str, ink: int = 255) -> np.ndarray:
    """(7, 6*len-1) uint8 pixel grid of ``s`` (chars outside the font
    raise — callers filter first; '' renders a 1px-wide blank)."""
    if not s:
        return np.zeros((GLYPH_H, 1), dtype=np.uint8)
    w = GLYPH_PITCH * len(s) - 1
    px = np.zeros((GLYPH_H, w), dtype=np.uint8)
    for i, ch in enumerate(s):
        px[:, i * GLYPH_PITCH:i * GLYPH_PITCH + GLYPH_W] = (
            _glyph_bits(ch) * ink
        )
    return px


def ocr_pixels(px: np.ndarray) -> str:
    """Template-match a (7, w) grid back to text. Fixed-pitch
    segmentation; per cell: exact match, else nearest Hamming within
    the unique-decoding radius, else '?'."""
    if px.shape[0] != GLYPH_H:
        return ""
    w = px.shape[1]
    n = (w + 1) // GLYPH_PITCH
    if n <= 0:
        return ""
    bits = (px > 127).astype(np.uint8)
    cells = np.zeros((n, GLYPH_H * GLYPH_W), dtype=np.uint8)
    for i in range(n):
        c = bits[:, i * GLYPH_PITCH:i * GLYPH_PITCH + GLYPH_W]
        if c.shape[1] < GLYPH_W:  # ragged last cell: pad with background
            c = np.pad(c, ((0, 0), (0, GLYPH_W - c.shape[1])))
        cells[i] = c.reshape(-1)
    # (cells x glyphs) Hamming distances in one matrix op
    d = np.abs(
        cells[:, None, :].astype(np.int16) - _TEMPLATES[None, :, :]
    ).sum(axis=2)
    best = d.argmin(axis=1)
    bestd = d[np.arange(n), best]
    # strict unique-decoding bound: accepting dist <= r is unambiguous
    # iff 2r < FONT_MIN_DIST
    radius = (FONT_MIN_DIST - 1) // 2
    out = [
        ALPHABET[b] if bd <= radius else "?"
        for b, bd in zip(best, bestd)
    ]
    return "".join(out)


def render_text_png(s: str, flip_pixel: int | None = None) -> bytes:
    """Render ``s`` into a REAL 8-bit grayscale PNG (the multimodal
    writer: zlib IDAT, cycling filters, CRC32s). ``flip_pixel`` inverts
    one pixel by flat index — the noise tier recognition must absorb."""
    from cies_ocr_java_spark.operators.multimodal import build_png_pixels

    px = render_text_pixels(s)
    if flip_pixel is not None and px.size:
        j = flip_pixel % px.size
        flat = px.reshape(-1)
        flat[j] = 255 - flat[j]
    return build_png_pixels(px)


def ocr_png(data: bytes | None) -> dict:
    """PNG bytes -> {text, width, height, error}: structural PNG decode
    (CRC-verified, all five filters) then glyph template matching."""
    from cies_ocr_java_spark.operators.multimodal import decode_png_pixels

    r = decode_png_pixels(data)
    if r["error"] is not None:
        return {"text": None, "width": None, "height": None,
                "error": r["error"]}
    px = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(
        r["height"], r["width"]
    )
    return {
        "text": ocr_pixels(px),
        "width": r["width"],
        "height": r["height"],
        "error": None,
    }


OCR_GLYPH_SCHEMA = (
    "doc_id long, text string, width int, height int, error string"
)


def extract_ocr_glyph(df: DataFrame, content_col: str = "content",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary PNG) -> recognized text rows via one
    Arrow-batched mapInPandas pass."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [ocr_png(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "text": [r["text"] for r in rows],
                    "width": pd.array(
                        [r["width"] for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r["height"] for r in rows], dtype="Int32"
                    ),
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(op, OCR_GLYPH_SCHEMA)
