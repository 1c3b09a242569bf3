"""Real PCM-WAV codec (operators/multimodal.py): round trip, chunk-walk
robustness, failure contract, and the Spark feature extractor."""

from __future__ import annotations

import random
import struct

import pandas as pd
import pytest

from cies_ocr_java_spark.operators.multimodal import (
    build_wav,
    decode_wav,
    extract_wav_features,
    get_codec,
)


@pytest.mark.parametrize(
    "n,sr,amp,ch",
    [(1, 8000, 0, 1), (100, 16000, 1000, 1), (50, 44100, -32768, 2),
     (7, 22050, 32767, 3)],
)
def test_round_trip(n, sr, amp, ch):
    r = decode_wav(build_wav(n, sr, amp, ch))
    assert r == {"channels": ch, "sample_rate": sr, "n_samples": n,
                 "abs_sum": abs(amp) * n * ch, "error": None}


def test_unknown_chunks_are_skipped_word_aligned():
    """A LIST chunk (odd length, so padded) before fmt must be walked
    over by size, not break the parse."""
    b = build_wav(100, 8000, 500)
    extra = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"
    hacked = b[:12] + extra + b[12:]
    r = decode_wav(hacked)
    assert r["error"] is None and r["n_samples"] == 100


def test_failure_contract():
    b = build_wav(100, 8000, 500)
    assert decode_wav(b[:-3])["error"] == "truncated chunk"
    assert decode_wav(b"XIFF" + b[4:])["error"] == "bad riff header"
    assert decode_wav(None)["error"] == "short or missing payload"
    # 8-bit format rejected, not misread
    hacked = bytearray(b)
    struct.pack_into("<H", hacked, 34, 8)  # bits-per-sample field
    assert "unsupported format" in decode_wav(bytes(hacked))["error"]
    # stereo data chunk with a partial frame
    b2 = build_wav(10, 8000, 7, channels=2)
    hacked2 = bytearray(b2)
    struct.pack_into("<I", hacked2, 40, 38)  # data clen 40 -> 38: not %4
    assert decode_wav(bytes(hacked2[:len(hacked2) - 2]))["error"] in (
        "partial frame in data chunk", "truncated chunk"
    )


def test_fuzz_never_raises():
    rng = random.Random(9)
    for _ in range(300):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 100)))
        for data in (blob, b"RIFF" + blob):
            r = decode_wav(data)
            assert (r["n_samples"] is None) == (r["error"] is not None)


def test_registry_codec_batch():
    c = get_codec("wav")
    b = build_wav(20, 16000, 100, channels=2)
    out = c.decode_batch(pd.Series([b, b[:-1], None]))
    assert out["mime"][0] == "audio/wav"
    assert (out["width"][0], out["height"][0], out["n_frames"][0]) == (
        16000, 2, 20)
    assert out["error"][1] is not None and out["error"][2] is not None


def test_spark_wav_feature_extraction(spark):
    rows = [(1, build_wav(30, 8000, -200)), (2, build_wav(5, 44100, 9)[:-2]),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in extract_wav_features(df).collect()}
    assert out[1]["abs_sum"] == 200 * 30 and out[1]["sample_rate"] == 8000
    assert out[2]["error"] == "truncated chunk"
    assert out[3]["error"] == "short or missing payload"
