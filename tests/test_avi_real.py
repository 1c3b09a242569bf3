"""AVI walker (operators/avi_real.py): RIFF alignment, stream
recovery, the tolerant index cross-check, fuzz."""

import random
import struct

from cies_ocr_java_spark.operators.avi_real import build_avi, parse_avi


def _mk(i, **kw):
    nv, na = 2 + i % 4, i % 3
    return build_avi(
        us_per_frame=33333 + i % 100, total_frames=nv,
        width=320 + 16 * (i % 5), height=240 + 8 * (i % 3),
        video_handler=b"MJPG" if i % 2 else b"DIB ",
        frame_sizes=[100 + ((i + k) % 7) * 30 for k in range(nv)],
        audio_sizes=[50 + ((i + k) % 5) * 20 for k in range(na)],
        **kw), nv, na


def test_round_trip_identity():
    for i in [0, 1, 2, 3, 7, 12]:
        b, nv, na = _mk(i)
        r = parse_avi(b)
        assert r["error"] is None
        assert r["us_per_frame"] == 33333 + i % 100
        assert r["n_streams"] == (2 if na else 1)
        assert r["video_handler"] == ("MJPG" if i % 2 else "DIB ")
        assert r["n_video_chunks"] == nv
        assert r["n_audio_chunks"] == na
        assert r["idx_entries"] == nv + na
        assert r["idx_consistent"] == 1


def test_word_alignment_pads_odd_chunks():
    """Odd-sized frame payloads get a pad byte the size field does
    NOT count; the walk must still land on the next header."""
    b = build_avi(40000, 2, 16, 16, b"DIB ", [101, 103], [])
    r = parse_avi(b)
    assert r["error"] is None
    assert r["n_video_chunks"] == 2 and r["movi_bytes"] == 204
    assert r["idx_consistent"] == 1


def test_lying_index_is_a_flag_not_an_error():
    b, nv, na = _mk(3, bad_index=True)
    r = parse_avi(b)
    assert r["error"] is None
    assert r["idx_consistent"] == 0
    assert r["n_video_chunks"] == nv  # data facts survive the lie


def test_structural_errors():
    b, _, _ = _mk(3)
    assert parse_avi(_mk(3, truncate_movi=True)[0])["error"] \
        == "riff size overruns file"
    assert parse_avi(None)["error"] == "not a riff file"
    assert parse_avi(b[:8] + b"WAVE" + b[12:])["error"] \
        == "not an avi file"
    # idx1 with a ragged size
    bad = bytearray(b)
    at = bytes(b).rindex(b"idx1")
    struct.pack_into("<I", bad, at + 4,
                     struct.unpack_from("<I", b, at + 4)[0] - 3)
    assert "idx1 size" in (parse_avi(bytes(bad))["error"] or "") \
        or "overruns" in (parse_avi(bytes(bad))["error"] or "")


def test_fuzz_never_raises():
    rng = random.Random(47)
    base, _, _ = _mk(5)
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_avi(blob)
