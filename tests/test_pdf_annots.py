"""PDF link annotations (operators/pdf_annots.py): geometric anchor
recovery, dest resolution by page object number, non-link skipping,
poison tiers, and the fuzz contract."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from cies_ocr_java_spark.operators.pdf_annots import (
    build_pdf_links,
    parse_pdf_links,
)


def test_links_anchor_to_their_own_span_only():
    r = parse_pdf_links(build_pdf_links(1))
    assert r["error"] is None
    for pidx, lidx, _kind, _target, anchor in r["links"]:
        assert anchor == f"L1_{pidx}_{lidx}"


def test_dest_resolves_to_other_page_index():
    r = parse_pdf_links(build_pdf_links(0))
    dests = [(p, t) for p, _l, k, t, _a in r["links"] if k == "dest"]
    assert dests and all(t == f"page:{1 - p}" for p, t in dests)


def test_note_annotation_is_skipped():
    # every page carries a trailing /Text note; link_idx stays dense
    r = parse_pdf_links(build_pdf_links(4))
    for pidx in (0, 1):
        idxs = [l for p, l, *_ in r["links"] if p == pidx]
        assert idxs == list(range(len(idxs)))


def test_uri_escaping_round_trips():
    data = build_pdf_links(2)
    # builder escapes parens in URIs via _esc; verify a real URI parses
    r = parse_pdf_links(data)
    uris = [t for _p, _l, k, t, _a in r["links"] if k == "uri"]
    assert all(u.startswith("https://ex.org/2/") for u in uris)


@pytest.mark.parametrize(
    "poison,err",
    [
        ("bad_rect", "bad rect"),
        ("dangling_annot", "object 99 not in xref"),
        ("dest_not_page", "dest is not a page"),
    ],
)
def test_poison_tiers(poison: str, err: str):
    r = parse_pdf_links(build_pdf_links(7, poison=poison))
    assert r["links"] is None and r["error"] == err


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 2 ** 32 - 1))
def test_fuzz_never_raises(blob: bytes, seed: int):
    base = build_pdf_links(9)
    rng = random.Random(seed)
    mode = rng.randrange(3)
    if mode == 0:
        data = blob
    elif mode == 1:
        at = rng.randrange(len(base))
        data = base[:at] + blob + base[at + len(blob):]
    else:
        data = base[: rng.randrange(len(base))]
    r = parse_pdf_links(data)
    assert (r["error"] is None) != (r["links"] is None)
