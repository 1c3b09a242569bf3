"""HTML main-content extraction: block segmentation + text/link-density
boilerplate scoring, as both a codegen'd expression tree and an
Arrow-vectorized pandas UDF.

This generalizes the reference's per-document text-sufficiency predicate
(DocumentExtractManager.java:410-429) to a per-node density heuristic
(jusText/Arc90 family): a text block survives iff it is long enough AND not
link-dominated, and anything inside structurally-boilerplate containers
(head/nav/footer/header/aside) or non-content tags (script/style) is dropped
outright.

Phases (the degradation contract, formats.py — identical in the JVM path,
this pandas path, and tools/oracle.py; every tag scan is QUOTE-AWARE so an
attribute value containing '>' cannot truncate a tag, and a '<' not
followed by [a-zA-Z!?/] is text, matching the HTML5 tokenizer's
bogus-markup rules):
  1. closed comments -> ' ' (an unclosed '<!--' degrades to a '<!'
     declaration in phase 3);
  2. script/style then boilerplate containers stripped with content,
     first-closing semantics (the script-CDATA rule applied uniformly);
  3. segment into candidate blocks at block-level tag boundaries;
  4. per block: visible text = tag-strip + entity-decode + ws-normalize;
     link text = the same over every <a>...</a> inner body;
  5. keep blocks with chars >= HTML_MIN_BLOCK_CHARS and
     link_chars/chars <= HTML_MAX_LINK_DENSITY; join survivors with ' '.

Whitespace is WS_RUN (ASCII), never Python's unicode \\s, and all pandas
regexes compile with re.ASCII so \\b agrees with Java's ASCII \\b.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F, types as T

from cies_ocr_java_spark.formats import (
    HTML_BLOCK_TAGS,
    HTML_BOILERPLATE_CONTAINERS,
    HTML_ENTITIES,
    HTML_MAX_LINK_DENSITY,
    HTML_MIN_BLOCK_CHARS,
    HTML_STRIP_CONTENT_TAGS,
    TAG_BODY,
    WS_OPT,
    WS_RUN,
)

# Shared pattern STRINGS (flag-free; each side adds its own flags so the
# same source text drives Java regex and Python re identically).
COMMENT_PATTERN = r"<!--.*?-->"                      # + DOTALL
CONTAINER_PATTERNS = [                                # + DOTALL|IGNORECASE
    rf"<{tag}\b{TAG_BODY}>.*?</{tag}{WS_OPT}>"
    for tag in (*HTML_STRIP_CONTENT_TAGS, *HTML_BOILERPLATE_CONTAINERS)
]
BLOCK_SPLIT_PATTERN = rf"</?(?:{'|'.join(HTML_BLOCK_TAGS)})\b{TAG_BODY}>"  # + I
ANCHOR_PATTERN = rf"<a\b{TAG_BODY}>(.*?)</a{WS_OPT}>"  # + DOTALL|IGNORECASE
# Only [a-zA-Z!?/] opens a tag; any other '<' is character data.
TAG_STRIP_PATTERN = rf"<[a-zA-Z!?/]{TAG_BODY}>"

_ASCII = re.ASCII
_COMMENT_RE = re.compile(COMMENT_PATTERN, re.S | _ASCII)
_DROP_CONTENT_RES = [
    re.compile(p, re.S | re.I | _ASCII) for p in CONTAINER_PATTERNS
]
_BLOCK_SPLIT_RE = re.compile(BLOCK_SPLIT_PATTERN, re.I | _ASCII)
_ANCHOR_RE = re.compile(ANCHOR_PATTERN, re.S | re.I | _ASCII)
_TAG_RE = re.compile(TAG_STRIP_PATTERN, _ASCII)
_WS_RE = re.compile(WS_RUN)


def _clean_text(s: pd.Series) -> pd.Series:
    """Visible text of a markup fragment: strip tags, decode entities,
    normalize whitespace. Vectorized."""
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for ent, ch in HTML_ENTITIES.items():  # '&amp;' last — see formats.py
        s = s.str.replace(ent, ch, regex=False)
    # strip(" ") not strip(): Spark's trim removes spaces only
    return s.str.replace(_WS_RE, " ", regex=True).str.strip(" ")


def extract_main_text_batch(html: pd.Series) -> pd.Series:
    """One Arrow batch of HTML payloads -> main-content text per document."""
    s = html.fillna("")
    rid = pd.RangeIndex(len(s))
    s.index = rid

    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    for rx in _DROP_CONTENT_RES:
        s = s.str.replace(rx, " ", regex=True)

    # candidate blocks: one row per fragment, original doc id in 'rid'
    frags = s.str.split(_BLOCK_SPLIT_RE, regex=True)
    fr = pd.DataFrame({"rid": rid, "frag": frags}).explode("frag", ignore_index=True)
    fr["frag"] = fr["frag"].fillna("")

    fr["text"] = _clean_text(fr["frag"])
    fr["chars"] = fr["text"].str.len()

    # link chars: explode anchors, clean, sum lengths back per block
    anchors = fr["frag"].str.findall(_ANCHOR_RE)
    la = (
        pd.DataFrame({"bid": fr.index, "inner": anchors})
        .explode("inner")
        .dropna(subset=["inner"])
    )
    if len(la):
        la["llen"] = _clean_text(la["inner"].astype(str)).str.len()
        link_chars = la.groupby("bid")["llen"].sum()
    else:
        link_chars = pd.Series(dtype="int64")
    fr["link_chars"] = link_chars.reindex(fr.index).fillna(0).astype("int64")

    keep = (fr["chars"] >= HTML_MIN_BLOCK_CHARS) & (
        fr["link_chars"] / fr["chars"].clip(lower=1) <= HTML_MAX_LINK_DENSITY
    )
    kept = fr[keep].groupby("rid")["text"].agg(" ".join)
    return kept.reindex(rid).fillna("")


@F.pandas_udf(T.StringType())
def html_main_text_udf(html: pd.Series) -> pd.Series:
    return extract_main_text_batch(html)


# --- pure-JVM expression path ---------------------------------------------
# Same algorithm, as built-in column functions: with this the ENTIRE
# extraction pipeline is zero-Python (the pandas UDF above remains the
# parity reference and the extension point for an open-grammar parser).
# Exactness notes vs the batch implementation: the density predicate uses
# the identical float expression `lc / max(chars,1) <= d` (same IEEE ops),
# entity replacement applies in the same dict order ('&amp;' last), and the
# pattern STRINGS are shared verbatim — Java gets inline (?si) flags where
# the pandas side compiled with re.S/re.I, and Java's ASCII \b/\s match the
# pandas side's re.ASCII compilation.


def _clean_text_col(x) -> F.Column:
    t = F.regexp_replace(x, TAG_STRIP_PATTERN, " ")
    for ent, ch in HTML_ENTITIES.items():
        t = F.regexp_replace(t, re.escape(ent), ch)
    return F.trim(F.regexp_replace(t, WS_RUN, " "))


def html_main_text_col(payload) -> F.Column:
    """Main-content text as ONE codegen'd expression tree (no Python)."""
    c = F.coalesce(payload, F.lit(""))
    c = F.regexp_replace(c, f"(?s){COMMENT_PATTERN}", " ")
    for p in CONTAINER_PATTERNS:
        c = F.regexp_replace(c, f"(?si){p}", " ")
    frags = F.split(c, f"(?i){BLOCK_SPLIT_PATTERN}")

    def link_chars(frag):
        inners = F.regexp_extract_all(frag, F.lit(f"(?si){ANCHOR_PATTERN}"), 1)
        return F.aggregate(
            inners,
            F.lit(0),
            lambda acc, a: acc + F.length(_clean_text_col(a)),
        )

    kept = F.filter(
        F.transform(
            frags,
            lambda frag: F.struct(
                _clean_text_col(frag).alias("t"),
                link_chars(frag).alias("lc"),
            ),
        ),
        lambda s: (F.length(s["t"]) >= HTML_MIN_BLOCK_CHARS)
        & (
            s["lc"] / F.greatest(F.length(s["t"]), F.lit(1))
            <= F.lit(HTML_MAX_LINK_DENSITY)
        ),
    )
    return F.array_join(F.transform(kept, lambda s: s["t"]), " ")


# Anchor/outlink extraction: the link-graph feed (hosts -> pagerank /
# blocklists) that runs BESIDE main-content extraction on the same scan.
# Conservative Java/RE2-common regex (no lookaround, no lazy dot): an <a>
# tag with a double-quoted href and a text-only body. Deliberately shared
# verbatim with the DuckDB oracle so candidate extraction itself is
# oracle-verifiable (same rule as the dedup md5 hashes).
ANCHOR_LINK_PATTERN = '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


def anchor_links_col(html) -> F.Column:
    """array<struct<href,anchor>> of every matching anchor, in document
    order — pure codegen (two regexp_extract_all passes zipped), zero
    Python, zero shuffle: at 10^12 docs link extraction is a free rider
    on whatever scan already reads the page bytes."""
    hrefs = F.regexp_extract_all(html, F.lit(ANCHOR_LINK_PATTERN), F.lit(1))
    anchors = F.regexp_extract_all(html, F.lit(ANCHOR_LINK_PATTERN), F.lit(2))
    return F.zip_with(
        hrefs, anchors,
        lambda h, a: F.struct(h.alias("href"), a.alias("anchor")),
    )
