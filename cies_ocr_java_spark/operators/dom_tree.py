"""DOM-tree main-content extraction: tag/link-density scoring over a
PARSED NODE TREE, computed distributively as prefix sums over the token
stream.

This is the north rule's "DOM-tree text-density heuristics (tag/link-density
scoring over a parsed node tree)" implemented Spark-first. A sequential
parser builds an explicit node tree with a stack; the distributed
formulation represents the SAME tree as ancestor counters over the
tokenized tag/text stream — the classic parallel-parsing reduction (each
token's depth and its per-tag-name enclosure state are running sums of
+1/-1 deltas, so the whole "parse" is one doc-partitioned window pass).
Every fact a density heuristic needs about a text node's position in the
tree — its depth, whether any ancestor is <nav>/<footer>/<script>/…,
whether it is inside a link — is exactly such a counter. The reference
reaches the same decision per whole document via its text-sufficiency
predicate (DocumentExtractManager.java:410-429); this operator makes the
per-NODE generalization the flat block extractor (html_extract.py)
approximates, with true ancestor semantics instead of first-closing
container strips.

Pipeline (all JVM-side; ZERO Python anywhere):

  1. strip closed comments (``<!--...-->`` -> ' '; COMMENT_PATTERN);
  2. tokenize: ``F.split`` on the quote-aware TAG_PATTERN yields the n+1
     text runs, ``regexp_extract_all`` the n tags; ``zip_with`` + ``flatten``
     interleaves them into one array (text_0, tag_0, text_1, …) and ONE
     ``posexplode`` makes the token stream;
  3. classify each tag: close (``</``), declaration (``<!``/``<?`` — inert),
     self-closing (``/>``) or HTML void element (DOM_VOID_TAGS) — inert for
     depth; element name = leading ``[a-zA-Z][a-zA-Z0-9]*`` lowercased;
  4. ONE window spec (partitionBy doc, orderBy pos, rows unbounded-to--1)
     carries ALL the running sums: depth, one enclosure counter per tracked
     tag (head/nav/footer/header/aside/script/style/a), and the block id
     (running count of block-level boundary tags, HTML_BLOCK_TAGS);
  5. per (doc, block): visible text (entity decode in HTML_ENTITIES order,
     then ASCII ws-normalize) of nodes with NO boilerplate ancestor, its
     char count, the link-chars subtotal (nodes with an <a> ancestor), and
     the inline tag count;
  6. density gates, ALL-INTEGER so both engines compare identically:
       chars >= HTML_MIN_BLOCK_CHARS
       AND 100*link_chars <= 35*chars          (HTML_MAX_LINK_DENSITY)
       AND chars >= DOM_MIN_TEXT_DENSITY * (n_inline_tags + 1)
     — the third gate is the jusText/boilerpipe text-vs-tag-density rule
     the flat extractor cannot express (it has no per-block tag counts);
  7. survivors join in block order.

Scale: the only exchange is the hash partition by doc_id for the window —
at 10^12 documents that is the natural layout (and the giant-doc salt
shuffle in plans/pipeline.py is the skew answer). Everything else is
map-side codegen. A sequential DOM library in a UDF would serialize every
page through Python; this keeps whole-stage codegen end to end.

Counter semantics vs a forgiving HTML5 parser: mis-nested or stray close
tags move counters down instead of being re-parented (defined, never a
crash — the formats.py degradation contract); text inside <script> is
excluded by the script counter, but a literal "</x>" inside script source
still tokenizes as a tag (no CDATA mode). These are the documented
approximations of the counter representation; the closed fixture grammar
never emits them, and hostile inputs get defined output (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from cies_ocr_java_spark.operators.html_extract import COMMENT_PATTERN
from cies_ocr_java_spark.formats import (
    HTML_BLOCK_TAGS,
    HTML_BOILERPLATE_CONTAINERS,
    HTML_ENTITIES,
    HTML_MAX_LINK_DENSITY,
    HTML_MIN_BLOCK_CHARS,
    HTML_STRIP_CONTENT_TAGS,
    TAG_BODY,
    WS_RUN,
)

# A tag token: '<' + [a-zA-Z!?/] + quote-aware body + '>'. Identical to
# html_extract.TAG_STRIP_PATTERN; any other '<' is character data.
TAG_PATTERN = rf"<[a-zA-Z!?/]{TAG_BODY}>"

# Element name of a tag token ('' for <!...>/<?...> declarations).
TAG_NAME_PATTERN = r"^</?([a-zA-Z][a-zA-Z0-9]*)"

# HTML5 void elements: no content, no close tag, depth-inert.
DOM_VOID_TAGS = (
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
)

# Ancestor counters tracked per text node: content-stripping tags,
# boilerplate containers, and <a> (for link density).
DOM_TRACKED_TAGS = (*HTML_STRIP_CONTENT_TAGS, *HTML_BOILERPLATE_CONTAINERS, "a")

# jusText-style text-vs-tag density gate: a surviving block needs at least
# this many visible chars per inline tag (+1 so tag-free blocks pass on
# chars alone). Integer, compared multiplicatively — exact in any engine.
DOM_MIN_TEXT_DENSITY = 8

# 100*link_chars <= LINK_DENSITY_PCT*chars  <=>  ratio <= 0.35, all-integer.
LINK_DENSITY_PCT = int(round(HTML_MAX_LINK_DENSITY * 100))


def visible_text_col(raw) -> Column:
    """Visible text of a text node: entity decode (HTML_ENTITIES order,
    '&amp;' last) then ASCII whitespace normalize + trim."""
    t = raw
    for ent, ch in HTML_ENTITIES.items():
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, WS_RUN, " "))


def dom_tokens(df: DataFrame, payload, doc_col: str = "doc_id") -> DataFrame:
    """Tokenize ``payload`` into the interleaved (pos, is_tag, raw) stream,
    one row per token, comments pre-stripped. Pure codegen: split +
    regexp_extract_all + zip_with/flatten + one posexplode."""
    c = F.regexp_replace(
        F.coalesce(payload, F.lit("")), f"(?s){COMMENT_PATTERN}", " "
    )
    texts = F.split(c, TAG_PATTERN)          # n+1 runs (empties kept)
    tags = F.regexp_extract_all(c, F.lit(TAG_PATTERN), F.lit(0))  # n tags
    # interleave: zip_with pads the shorter (tags) with null -> filter.
    toks = F.filter(
        F.flatten(
            F.zip_with(
                texts,
                tags,
                lambda t, g: F.array(
                    F.struct(t.alias("raw"), F.lit(False).alias("is_tag")),
                    F.struct(g.alias("raw"), F.lit(True).alias("is_tag")),
                ),
            )
        ),
        lambda s: s["raw"].isNotNull(),
    )
    return df.select(
        F.col(doc_col).alias("doc_id"), F.posexplode(toks).alias("pos", "tok")
    ).select(
        "doc_id",
        "pos",
        F.col("tok.is_tag").alias("is_tag"),
        F.col("tok.raw").alias("raw"),
    )


def dom_annotate(tokens: DataFrame) -> DataFrame:
    """Attach the tree structure to every token: element name, depth
    BEFORE the token, one enclosure counter per tracked tag, and the
    block id — all running sums over ONE doc-partitioned window."""
    name = F.when(
        F.col("is_tag"),
        F.lower(F.regexp_extract("raw", TAG_NAME_PATTERN, 1)),
    ).otherwise(F.lit(""))
    is_close = F.col("is_tag") & F.col("raw").startswith("</")
    is_inert = F.col("is_tag") & (
        (F.length(F.col("_name")) == 0)          # <!...> / <?...>
        | F.col("raw").endswith("/>")             # self-closing
        | F.col("_name").isin(*DOM_VOID_TAGS)     # HTML void element
    )
    t = tokens.withColumn("_name", name)
    d_depth = (
        F.when(~F.col("is_tag") | is_inert, F.lit(0))
        .when(is_close, F.lit(-1))
        .otherwise(F.lit(1))
    )
    t = t.withColumn("_d", d_depth)
    # block boundary: any block-level tag token (open, close, or void like
    # <br/>) advances the block id for the tokens AFTER it.
    t = t.withColumn(
        "_b",
        F.when(
            F.col("is_tag") & F.col("_name").isin(*HTML_BLOCK_TAGS), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    for tag in DOM_TRACKED_TAGS:
        t = t.withColumn(
            f"_d_{tag}",
            F.when(F.col("_name") == tag, F.col("_d")).otherwise(F.lit(0)),
        )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = t.select(
        "doc_id",
        "pos",
        "is_tag",
        "raw",
        F.col("_name").alias("name"),
        F.col("_d").alias("d_depth"),
        F.coalesce(F.sum("_d").over(w), F.lit(0)).cast("int").alias("depth"),
        F.coalesce(F.sum("_b").over(w), F.lit(0)).cast("int").alias("block_id"),
        *[
            F.coalesce(F.sum(f"_d_{tag}").over(w), F.lit(0))
            .cast("int")
            .alias(f"in_{tag}")
            for tag in DOM_TRACKED_TAGS
        ],
    )
    boiler = F.lit(False)
    for tag in (*HTML_STRIP_CONTENT_TAGS, *HTML_BOILERPLATE_CONTAINERS):
        boiler = boiler | (F.col(f"in_{tag}") > 0)
    return out.withColumn("in_boiler", boiler).withColumn(
        "visible",
        F.when(~F.col("is_tag"), visible_text_col(F.col("raw"))).otherwise(
            F.lit("")
        ),
    )


def dom_blocks(ann: DataFrame) -> DataFrame:
    """Per (doc_id, block_id): ordered visible text of non-boilerplate
    text nodes, char/link-char totals, inline tag count, and the three
    integer density gates."""
    contrib = (~F.col("is_tag")) & (~F.col("in_boiler")) & (
        F.length("visible") > 0
    )
    g = ann.groupBy("doc_id", "block_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(contrib, F.struct("pos", "visible"))
                    )
                ),
                lambda s: s["visible"],
            ),
            " ",
        ).alias("text"),
        F.sum(
            F.when(contrib, F.length("visible")).otherwise(F.lit(0))
        ).cast("int").alias("chars"),
        F.sum(
            F.when(contrib & (F.col("in_a") > 0), F.length("visible"))
            .otherwise(F.lit(0))
        ).cast("int").alias("link_chars"),
        F.sum(F.when(F.col("is_tag"), 1).otherwise(0))
        .cast("int")
        .alias("n_inline_tags"),
        F.min(F.when(contrib, F.col("pos"))).alias("first_pos"),
    )
    keep = (
        (F.col("chars") >= HTML_MIN_BLOCK_CHARS)
        & (100 * F.col("link_chars") <= LINK_DENSITY_PCT * F.col("chars"))
        & (
            F.col("chars")
            >= DOM_MIN_TEXT_DENSITY * (F.col("n_inline_tags") + 1)
        )
    )
    return g.withColumn("keep", keep)


def dom_main_text(df: DataFrame, payload, doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, main_text, n_blocks, n_kept): the DOM-density extraction
    end to end. n_blocks counts blocks with any non-boilerplate text."""
    blocks = dom_blocks(dom_annotate(dom_tokens(df, payload, doc_col)))
    return blocks.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("block_id", "text"))
                    )
                ),
                lambda s: s["text"],
            ),
            " ",
        ).alias("main_text"),
        F.sum(F.when(F.col("chars") > 0, 1).otherwise(0))
        .cast("int")
        .alias("n_blocks"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("int").alias("n_kept"),
    )


# src attribute of a media tag: double-quoted only (the closed grammar's
# writer always double-quotes); shared verbatim with the oracle.
IMG_SRC_PATTERN = 'src="([^"]*)"'


def dom_interleaved_spans(
    df: DataFrame, payload, doc_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, span_order, kind, text, media_ref): the interleaved
    text+media span sequence of a page, in READING ORDER — the north
    rule's span schema (kind, text, media_ref, order) extracted from real
    markup. Text spans are the density-surviving blocks (anchored at
    their first visible text node's token position); media spans are
    ``<img>`` elements with a src, EXCLUDED when any ancestor is
    boilerplate (a nav logo is furniture, not content media). Both ride
    the one annotated token stream, so ordering is token-position-exact
    and the merge needs no second parse."""
    ann = dom_annotate(dom_tokens(df, payload, doc_col))
    blocks = dom_blocks(ann)
    text_spans = blocks.where(F.col("keep")).select(
        "doc_id",
        F.col("first_pos").alias("pos"),
        F.lit("text").alias("kind"),
        F.col("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )
    src = F.regexp_extract("raw", IMG_SRC_PATTERN, 1)
    media_spans = ann.where(
        F.col("is_tag")
        & (F.col("name") == "img")
        & ~F.col("in_boiler")
        & (src != "")
    ).select(
        "doc_id",
        F.col("pos"),
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        src.alias("media_ref"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        text_spans.unionByName(media_spans)
        .select(
            "doc_id",
            (F.row_number().over(w) - 1).cast("int").alias("span_order"),
            "kind",
            "text",
            "media_ref",
        )
    )


def dom_node_stats(df: DataFrame, payload, doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tags, n_text_nodes, max_depth, content_chars,
    boiler_chars, link_chars): structural statistics of the parsed tree —
    the per-document evidence that the counter representation really is a
    tree (depth, ancestor classes) and the inputs to corpus-level
    boilerplate dashboards."""
    ann = dom_annotate(dom_tokens(df, payload, doc_col))
    vis = F.length("visible")
    return ann.groupBy("doc_id").agg(
        F.sum(F.when(F.col("is_tag"), 1).otherwise(0)).cast("int").alias("n_tags"),
        F.sum(F.when(~F.col("is_tag") & (vis > 0), 1).otherwise(0))
        .cast("int")
        .alias("n_text_nodes"),
        F.max(F.col("depth") + F.greatest(F.col("d_depth"), F.lit(0)))
        .cast("int")
        .alias("max_depth"),
        F.sum(
            F.when(~F.col("is_tag") & ~F.col("in_boiler"), vis).otherwise(0)
        ).cast("int").alias("content_chars"),
        F.sum(
            F.when(~F.col("is_tag") & F.col("in_boiler"), vis).otherwise(0)
        ).cast("int").alias("boiler_chars"),
        F.sum(
            F.when(
                ~F.col("is_tag") & ~F.col("in_boiler") & (F.col("in_a") > 0),
                vis,
            ).otherwise(0)
        ).cast("int").alias("link_chars"),
    )


# ---------------------------------------------------------------------------
# Structured table extraction (session-3)
# ---------------------------------------------------------------------------

def extract_table_cells(df: DataFrame, payload,
                        doc_col: str = "doc_id") -> DataFrame:
    """Extract every ``<table>`` into structured (doc_id, table_idx,
    row_idx, col_idx, is_header, cell_text) rows — the DOM counter
    technique applied to tabular structure instead of density scoring.

    Same parallel-parse reduction as dom_annotate: the nesting facts a
    cell needs — which table, which row, which cell, header-or-data —
    are all RUNNING COUNTS over the token stream, so one doc-partitioned
    window carries the whole parse (pure codegen, zero Python):

      table ordinal  = count of <table> opens so far;
      row ordinal    = count of <tr> opens so far (global per doc);
      cell ordinal   = count of <td>/<th> opens so far;
      inside-a-cell  = td/th opens minus closes (with the table open).

    Grouping text tokens by (doc, table, row, cell) ordinals rebuilds the
    cells; per-table/per-row RELATIVE indices are the ordinal minus its
    group minimum (two more windows over the already-grouped cell rows —
    bounded by cell count, not token count). Cell text is the raw text
    tokens concatenated in pos order FIRST, then entity-decoded and
    ws-normalized once at the cell level, so inline markup inside a cell
    (``<b>``, ``<span>``) splits tokens without corrupting spacing.

    Subset contract (degradation discipline of formats.py): non-nested
    tables parse exactly; a NESTED <table> inside a cell folds its
    ordinals into the outer walk (defined output, never a crash); stray
    </td>/</tr> move counters down like every other counter here. The
    reference has no table extractor — this is training-data surface
    (tables -> structured records) the engine adds; closest reference
    behavior is the per-block type tagging of Textract's TABLE blocks
    (DocumentExtractManager.java's Textract call returns BlockType.TABLE
    which the reference flattens to LINE text — we keep the structure).

    PLAN: tokenize (split + regexp_extract_all + one posexplode), ONE
    window pass for the counters over the doc-hash partition, one
    groupBy(cell ordinals), two bounded index windows. The only exchange
    is the doc-hash shuffle — the natural layout at 10^12 docs.
    """
    toks = dom_tokens(df, payload, doc_col)
    name = F.when(
        F.col("is_tag"),
        F.lower(F.regexp_extract("raw", TAG_NAME_PATTERN, 1)),
    ).otherwise(F.lit(""))
    t = toks.withColumn("_name", name)
    is_open = F.col("is_tag") & ~F.col("raw").startswith("</") & ~F.col(
        "raw"
    ).endswith("/>")
    is_close = F.col("is_tag") & F.col("raw").startswith("</")

    def delta(tags: tuple, sign_open: int, sign_close: int):
        return (
            F.when(is_open & F.col("_name").isin(*tags), F.lit(sign_open))
            .when(is_close & F.col("_name").isin(*tags), F.lit(sign_close))
            .otherwise(F.lit(0))
        )

    t = (
        t.withColumn("_tbl_o", delta(("table",), 1, 0))
        .withColumn("_tbl", delta(("table",), 1, -1))
        .withColumn("_tr_o", delta(("tr",), 1, 0))
        .withColumn("_cell_o", delta(("td", "th"), 1, 0))
        .withColumn("_cell", delta(("td", "th"), 1, -1))
        .withColumn("_th_o", delta(("th",), 1, 0))
    )
    # include the CURRENT row: text tokens carry zero deltas, and the
    # opening <td> token then belongs to its own cell group (that is how
    # the cell learns whether it opened as <th>)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ann = t.select(
        "doc_id",
        "pos",
        "is_tag",
        "raw",
        F.sum("_tbl_o").over(w).cast("int").alias("tbl_ord"),
        F.sum("_tbl").over(w).cast("int").alias("in_table"),
        F.sum("_tr_o").over(w).cast("int").alias("tr_ord"),
        F.sum("_cell_o").over(w).cast("int").alias("cell_ord"),
        F.sum("_cell").over(w).cast("int").alias("in_cell"),
        F.when(
            F.col("is_tag") & is_open & (F.col("_name") == "th"), F.lit(1)
        ).otherwise(F.lit(0)).alias("is_th_open"),
    )
    members = ann.where(
        (F.col("in_table") > 0)
        & (F.col("in_cell") > 0)
        & (F.col("tr_ord") > 0)
        & (F.col("cell_ord") > 0)
    )
    cells = members.groupBy("doc_id", "tbl_ord", "tr_ord", "cell_ord").agg(
        visible_text_col(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_tag"), F.struct("pos", "raw")
                            )
                        )
                    ),
                    lambda s: s["raw"],
                ),
                "",
            )
        ).alias("cell_text"),
        (F.max("is_th_open") == 1).alias("is_header"),
    )
    wt = Window.partitionBy("doc_id", "tbl_ord")
    wr = Window.partitionBy("doc_id", "tbl_ord", "tr_ord")
    return cells.select(
        "doc_id",
        (F.col("tbl_ord") - 1).alias("table_idx"),
        (F.col("tr_ord") - F.min("tr_ord").over(wt)).alias("row_idx"),
        (F.col("cell_ord") - F.min("cell_ord").over(wr)).alias("col_idx"),
        "is_header",
        "cell_text",
    )


# ---------------------------------------------------------------------------
# Document outline extraction (session-3)
# ---------------------------------------------------------------------------

def extract_outline(df: DataFrame, payload,
                    doc_col: str = "doc_id") -> DataFrame:
    """Extract the heading outline: one row per <h1>..<h6> with its text,
    level, ordinal, and the hierarchical SECTION PATH ("2.1.3") — the
    table-of-contents structure a training pipeline wants as metadata
    and the reference flattens away (Textract LAYOUT_SECTION_HEADER
    blocks become plain LINE text).

    Section numbering is the interesting part distributively: the number
    at level l resets whenever a SHALLOWER heading appears, which is a
    prefix scan WITH RESETS. Formulated as pure running sums (one
    doc-partitioned window over the per-doc heading rows, bounded by
    heading count, never token count):

        n_l  =  cum_l  -  cum_l(at the last heading with level < l)

    where cum_l is the running count of level-l headings: F.sum for the
    cumulative, F.last(ignorenulls) over a WHEN(level < l) projection
    for the reset baseline. The path is the first ``level`` entries of
    [n_1..n_6] joined with dots. Heading text reuses the enclosure
    counters of dom_annotate's representation: a text token belongs to
    heading instance ``h_ord`` (running count of heading opens) while
    any per-level open-minus-close counter is positive.

    Subset contract: headings do not nest in valid HTML and the closed
    grammar never nests them; a hostile nested heading folds into the
    outer instance (defined output, degradation discipline).
    """
    toks = dom_tokens(df, payload, doc_col)
    name = F.when(
        F.col("is_tag"),
        F.lower(F.regexp_extract("raw", TAG_NAME_PATTERN, 1)),
    ).otherwise(F.lit(""))
    t = toks.withColumn("_name", name)
    is_open = F.col("is_tag") & ~F.col("raw").startswith("</") & ~F.col(
        "raw"
    ).endswith("/>")
    is_close = F.col("is_tag") & F.col("raw").startswith("</")
    levels = [f"h{i}" for i in range(1, 7)]
    hopen = is_open & F.col("_name").isin(*levels)
    t = t.withColumn("_h_open", F.when(hopen, 1).otherwise(0))
    for h in levels:
        t = t.withColumn(
            f"_d_{h}",
            F.when(is_open & (F.col("_name") == h), 1)
            .when(is_close & (F.col("_name") == h), -1)
            .otherwise(0),
        )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ann = t.select(
        "doc_id",
        "pos",
        "is_tag",
        "raw",
        F.sum("_h_open").over(w).cast("int").alias("h_ord"),
        *[
            F.sum(f"_d_{h}").over(w).cast("int").alias(f"in_{h}")
            for h in levels
        ],
    )
    in_any = None
    lvl = F.lit(0)
    for i, h in enumerate(levels, start=1):
        cond = F.col(f"in_{h}") > 0
        in_any = cond if in_any is None else (in_any | cond)
        lvl = F.when(cond, F.lit(i)).otherwise(lvl)
    heads = (
        ann.where(in_any & (F.col("h_ord") > 0))
        .withColumn("_lvl", lvl)
        .groupBy("doc_id", "h_ord")
        .agg(
            F.max("_lvl").alias("level"),
            visible_text_col(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(~F.col("is_tag"),
                                       F.struct("pos", "raw"))
                            )
                        ),
                        lambda s: s["raw"],
                    ),
                    "",
                )
            ).alias("heading"),
        )
    )
    hw = (
        Window.partitionBy("doc_id")
        .orderBy("h_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for i in range(1, 7):
        heads = heads.withColumn(
            f"_cum_{i}",
            F.sum((F.col("level") == i).cast("int")).over(hw),
        )
    for i in range(1, 7):
        heads = heads.withColumn(
            f"_n_{i}",
            F.col(f"_cum_{i}")
            - F.coalesce(
                F.last(
                    F.when(F.col("level") < i, F.col(f"_cum_{i}")),
                    ignorenulls=True,
                ).over(hw),
                F.lit(0),
            ),
        )
    path = F.array_join(
        F.slice(
            F.array(*[F.col(f"_n_{i}").cast("string") for i in range(1, 7)]),
            1,
            F.col("level"),
        ),
        ".",
    )
    ow = Window.partitionBy("doc_id").orderBy("h_ord")
    return heads.select(
        "doc_id",
        (F.row_number().over(ow) - 1).alias("idx"),
        "level",
        path.alias("path"),
        "heading",
    )


# ---------------------------------------------------------------------------
# Nested list extraction (session-3)
# ---------------------------------------------------------------------------

LIST_MAX_DEPTH = 4  # tracked nesting depths (the closed grammar uses <= 3)


def extract_list_items(df: DataFrame, payload,
                       doc_col: str = "doc_id") -> DataFrame:
    """Extract <ul>/<ol> items into (doc_id, idx, depth, kind, ordinal,
    item_text) rows — nesting resolved, ordinals counted PER LIST
    INSTANCE, tail text after a nested sublist credited back to its
    parent item.

    The stack a sequential parser keeps is replaced by PER-DEPTH
    LAST-INSTANCE counters (bounded by LIST_MAX_DEPTH): the innermost
    open list at depth k is the most recent list-open token whose
    inclusive depth is k (F.last(ignorenulls) over the doc window), and
    the same trick resolves the innermost <li> per depth — so a text
    token's owning item is ``li_inst[list_depth]`` evaluated at the
    token, which is exactly the stack top without a stack. Ordinals are
    a row_number per (doc, list instance) over the li-open tokens —
    bounded windows, zero Python, one doc-hash exchange.

    Subset contract: nesting deeper than LIST_MAX_DEPTH folds into the
    deepest tracked level (defined output, degradation discipline);
    stray closes move counters down like every counter here."""
    toks = dom_tokens(df, payload, doc_col)
    name = F.when(
        F.col("is_tag"),
        F.lower(F.regexp_extract("raw", TAG_NAME_PATTERN, 1)),
    ).otherwise(F.lit(""))
    t = toks.withColumn("_name", name)
    is_open = F.col("is_tag") & ~F.col("raw").startswith("</") & ~F.col(
        "raw"
    ).endswith("/>")
    is_close = F.col("is_tag") & F.col("raw").startswith("</")
    lst = F.col("_name").isin("ul", "ol")
    li = F.col("_name") == "li"
    t = (
        t.withColumn("_l_d", F.when(is_open & lst, 1)
                     .when(is_close & lst, -1).otherwise(0))
        .withColumn("_l_o", F.when(is_open & lst, 1).otherwise(0))
        .withColumn("_li_d", F.when(is_open & li, 1)
                    .when(is_close & li, -1).otherwise(0))
        .withColumn("_li_o", F.when(is_open & li, 1).otherwise(0))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    depth_cap = F.least(
        F.sum("_l_d").over(w).cast("int"), F.lit(LIST_MAX_DEPTH)
    )
    ann = t.select(
        "doc_id",
        "pos",
        "is_tag",
        "raw",
        "_name",
        (is_open & lst).alias("_lopen"),
        (is_open & li).alias("_liopen"),
        depth_cap.alias("ldepth"),
        F.sum("_l_o").over(w).cast("int").alias("l_ord"),
        F.sum("_li_o").over(w).cast("int").alias("li_ord"),
        (F.sum("_li_d").over(w) > 0).alias("in_li"),
    )
    # per tracked depth k: innermost open list instance + its kind, and
    # the innermost open <li> instance — the stack top, stackless
    for k in range(1, LIST_MAX_DEPTH + 1):
        ann = (
            ann.withColumn(
                f"_inst_{k}",
                F.last(
                    F.when(F.col("_lopen") & (F.col("ldepth") == k),
                           F.col("l_ord")),
                    ignorenulls=True,
                ).over(w),
            )
            .withColumn(
                f"_kind_{k}",
                F.last(
                    F.when(F.col("_lopen") & (F.col("ldepth") == k),
                           F.col("_name")),
                    ignorenulls=True,
                ).over(w),
            )
            .withColumn(
                f"_li_inst_{k}",
                F.last(
                    F.when(F.col("_liopen") & (F.col("ldepth") == k),
                           F.col("li_ord")),
                    ignorenulls=True,
                ).over(w),
            )
        )
    inst = F.lit(None)
    kind = F.lit(None)
    li_inst = F.lit(None)
    for k in range(1, LIST_MAX_DEPTH + 1):
        inst = F.when(F.col("ldepth") == k, F.col(f"_inst_{k}")).otherwise(inst)
        kind = F.when(F.col("ldepth") == k, F.col(f"_kind_{k}")).otherwise(kind)
        li_inst = F.when(
            F.col("ldepth") == k, F.col(f"_li_inst_{k}")
        ).otherwise(li_inst)
    ann = ann.select(
        "doc_id", "pos", "is_tag", "raw", "ldepth", "in_li", "_liopen",
        inst.alias("inst"), kind.alias("kind"), li_inst.alias("li_inst"),
    )
    members = ann.where(
        (F.col("ldepth") > 0) & F.col("in_li") & F.col("li_inst").isNotNull()
    )
    items = members.groupBy("doc_id", "li_inst").agg(
        F.max(F.when(F.col("_liopen"), F.col("ldepth"))).alias("depth"),
        F.max(F.when(F.col("_liopen"), F.col("kind"))).alias("kind"),
        F.max(F.when(F.col("_liopen"), F.col("inst"))).alias("inst"),
        visible_text_col(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~F.col("is_tag"),
                                   F.struct("pos", "raw"))
                        )
                    ),
                    lambda s: s["raw"],
                ),
                "",
            )
        ).alias("item_text"),
    )
    ow = Window.partitionBy("doc_id", "inst").orderBy("li_inst")
    iw = Window.partitionBy("doc_id").orderBy("li_inst")
    return items.select(
        "doc_id",
        (F.row_number().over(iw) - 1).alias("idx"),
        "depth",
        "kind",
        F.row_number().over(ow).alias("ordinal"),
        "item_text",
    )


# ---------------------------------------------------------------------------
# Feed (RSS/Atom) item extraction (session-3)
# ---------------------------------------------------------------------------

def extract_feed_items(df: DataFrame, payload,
                       doc_col: str = "doc_id") -> DataFrame:
    """Extract syndication-feed entries into (doc_id, item_idx, title,
    link, guid) rows — the same token/counter machinery as the HTML
    extractors applied to the OTHER crawl markup: RSS (``<item>`` /
    ``<guid>``) and Atom (``<entry>`` / ``<id>``) handled as synonyms,
    the real-world feed duality. Item ordinal = running count of
    item/entry opens; field text = pos-ordered concat of text tokens
    while the field's open-minus-close counter is positive, entity-
    decoded once per field. One doc-partitioned window, zero Python."""
    toks = dom_tokens(df, payload, doc_col)
    name = F.when(
        F.col("is_tag"),
        F.lower(F.regexp_extract("raw", TAG_NAME_PATTERN, 1)),
    ).otherwise(F.lit(""))
    t = toks.withColumn("_name", name)
    is_open = F.col("is_tag") & ~F.col("raw").startswith("</") & ~F.col(
        "raw"
    ).endswith("/>")
    is_close = F.col("is_tag") & F.col("raw").startswith("</")

    def delta(tags: tuple):
        return (
            F.when(is_open & F.col("_name").isin(*tags), 1)
            .when(is_close & F.col("_name").isin(*tags), -1)
            .otherwise(0)
        )

    t = (
        t.withColumn(
            "_it_o",
            F.when(is_open & F.col("_name").isin("item", "entry"), 1)
            .otherwise(0),
        )
        .withColumn("_it", delta(("item", "entry")))
        .withColumn("_ti", delta(("title",)))
        .withColumn("_li", delta(("link",)))
        .withColumn("_gu", delta(("guid", "id")))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ann = t.select(
        "doc_id",
        "pos",
        "is_tag",
        "raw",
        F.sum("_it_o").over(w).cast("int").alias("item_ord"),
        (F.sum("_it").over(w) > 0).alias("in_item"),
        (F.sum("_ti").over(w) > 0).alias("in_title"),
        (F.sum("_li").over(w) > 0).alias("in_link"),
        (F.sum("_gu").over(w) > 0).alias("in_guid"),
    )

    def field(flag: str):
        return visible_text_col(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_tag") & F.col(flag),
                                F.struct("pos", "raw"),
                            )
                        )
                    ),
                    lambda s: s["raw"],
                ),
                "",
            )
        )

    items = (
        ann.where(F.col("in_item") & (F.col("item_ord") > 0))
        .groupBy("doc_id", "item_ord")
        .agg(
            field("in_title").alias("title"),
            field("in_link").alias("link"),
            field("in_guid").alias("guid"),
        )
    )
    return items.select(
        "doc_id",
        (F.col("item_ord") - 1).alias("item_idx"),
        "title",
        "link",
        "guid",
    )


# type attribute marking a JSON-LD script block (both quote styles; the
# MIME is matched case-insensitively like a browser does).
_LDJSON_TYPE = r"""(?i)type\s*=\s*("application/ld\+json"|'application/ld\+json')"""


def extract_jsonld(df: DataFrame, payload,
                   doc_col: str = "doc_id") -> DataFrame:
    """Extract the RAW text of every ``<script type="application/ld+json">``
    block into (doc_id, block_idx, raw_json) — the schema.org structured
    data that rides most commercial pages, and the one HTML region where
    the usual text rules INVERT: script content is raw character data, so
    entity references must NOT be decoded (``&amp;`` stays five chars) and
    JSON's own ``\\u003c`` escapes are the author's way of keeping ``<``
    out of the markup (the parser downstream decodes them, not the DOM).

    Distributed formulation: a text token belongs to block k iff the most
    recent script-boundary tag before it is the k-th ld+json OPEN (one
    ``F.last(ignorenulls)`` + one running count over the same
    doc-partitioned window — non-ld scripts write a 0 marker, so their
    bodies are excluded without a second pass). Block text = pos-ordered
    raw concat, trimmed only. Zero Python; ONE doc-hash exchange.

    Reference parity: none (Textract never sees markup; a web-crawl
    extraction tier lives on structured data). Malformed JSON is the
    CONSUMER's problem by design — this operator reproduces bytes."""
    toks = dom_tokens(df, payload, doc_col)
    name = F.when(
        F.col("is_tag"),
        F.lower(F.regexp_extract("raw", TAG_NAME_PATTERN, 1)),
    ).otherwise(F.lit(""))
    t = toks.withColumn("_name", name)
    is_ld_open = (
        F.col("is_tag")
        & (F.col("_name") == "script")
        & ~F.col("raw").startswith("</")
        & F.col("raw").rlike(_LDJSON_TYPE)
    )
    is_script_edge = F.col("is_tag") & (F.col("_name") == "script")
    # marker: 1 = ld+json open, 0 = any other script open/close; null else
    t = t.withColumn(
        "_m",
        F.when(is_ld_open, F.lit(1))
        .when(is_script_edge, F.lit(0))
        .otherwise(F.lit(None).cast("int")),
    ).withColumn("_o", F.when(is_ld_open, 1).otherwise(0))
    wb = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ann = t.select(
        "doc_id",
        "pos",
        "is_tag",
        "raw",
        (F.last("_m", ignorenulls=True).over(wb) == 1).alias("in_ld"),
        F.coalesce(F.sum("_o").over(wb), F.lit(0)).cast("int").alias("blk"),
    )
    return (
        ann.where(~F.col("is_tag") & F.col("in_ld"))
        .groupBy("doc_id", "blk")
        .agg(
            F.trim(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "raw"))
                        ),
                        lambda s: s["raw"],
                    ),
                    "",
                )
            ).alias("raw_json")
        )
        .select(
            "doc_id",
            (F.col("blk") - 1).cast("int").alias("block_idx"),
            "raw_json",
        )
    )


def _attr_value(name: str) -> Column:
    """Attribute value of a tag token, both quote styles, PRESENCE-based
    (an empty value is a value; absent attribute is null) — the
    html_meta_og rule, shared by the srcset extractor."""
    return (
        F.when(
            F.col("raw").rlike(name + r'\s*=\s*"'),
            F.regexp_extract("raw", name + r'\s*=\s*"([^"]*)"', 1),
        )
        .when(
            F.col("raw").rlike(name + r"\s*=\s*'"),
            F.regexp_extract("raw", name + r"\s*=\s*'([^']*)'", 1),
        )
    )


def extract_srcset(df: DataFrame, payload,
                   doc_col: str = "doc_id") -> DataFrame:
    """Parse responsive-image ``srcset`` attributes into one row per
    candidate: (doc_id, img_idx, cand_idx, url, width_w, density_x) —
    the HTML §4.8.4.3 image-candidate grammar (comma-separated, each
    candidate a URL plus an optional ``<int>w`` width or ``<float>x``
    density descriptor; a bare URL means 1x). img ordinal = running
    count of ``<img>`` tags CARRYING a srcset, in token order, so docs
    mixing plain and responsive imgs index densely. All codegen: one
    split-on-comma + transform + posexplode; ONE doc-hash exchange for
    the ordinal window, no Python, no join.

    Reference parity: none (beyond-reference crawl operator) — at
    extraction scale srcset is where the HIGH-RES variant of every
    content image hides, and a media-span table keyed only on ``src``
    systematically picks the low-res fallback."""
    toks = dom_tokens(df, payload, doc_col)
    name = F.when(
        F.col("is_tag"),
        F.lower(F.regexp_extract("raw", TAG_NAME_PATTERN, 1)),
    ).otherwise(F.lit(""))
    imgs = toks.withColumn("_name", name).where(
        F.col("is_tag") & (F.col("_name") == "img")
        & _attr_value("srcset").isNotNull()
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    imgs = imgs.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("int").alias("img_idx"),
        _attr_value("srcset").alias("_srcset"),
    )
    cands = F.filter(
        F.transform(
            F.split(F.col("_srcset"), ","),
            lambda c: F.trim(F.regexp_replace(c, WS_RUN, " ")),
        ),
        lambda c: F.length(c) > 0,
    )
    ex = imgs.select(
        "doc_id",
        "img_idx",
        F.posexplode(cands).alias("cand_idx", "cand"),
    )
    parts = F.split(F.col("cand"), " ")
    url = parts.getItem(0)
    desc = F.when(F.size(parts) > 1, parts.getItem(1))
    return ex.select(
        "doc_id",
        "img_idx",
        F.col("cand_idx").cast("int").alias("cand_idx"),
        url.alias("url"),
        F.when(
            desc.rlike(r"^\d+w$"),
            F.regexp_extract(desc, r"^(\d+)w$", 1).cast("int"),
        ).alias("width_w"),
        F.when(
            desc.rlike(r"^\d+(\.\d+)?x$"),
            F.regexp_extract(desc, r"^(\d+(\.\d+)?)x$", 1).cast("double"),
        )
        .when(desc.isNull(), F.lit(1.0))
        .alias("density_x"),
    )


def extract_sitemap(df: DataFrame, payload,
                    doc_col: str = "doc_id") -> DataFrame:
    """Parse sitemap XML (sitemaps.org protocol) into one row per entry:
    (doc_id, entry_idx, loc, lastmod, priority, is_index). Handles BOTH
    document kinds — ``<urlset>`` of ``<url>`` entries and
    ``<sitemapindex>`` of ``<sitemap>`` entries (the recursion node of
    the protocol; is_index marks it so a crawl frontier can re-enqueue
    rather than fetch). Same counter machinery as extract_feed_items:
    entry ordinal = running count of url/sitemap opens, field text =
    pos-ordered concat while the field counter is positive, entity-
    decoded once (``&amp;`` in a loc is the ONE entity the protocol
    requires escaping). lastmod/priority stay strings here — the typed
    casts (date → unix micros, priority → decimal) are query-side so
    the operator is schema-stable across partial entries (absent fields
    → empty string → null in the query). One doc-partitioned window,
    zero Python. Reference parity: none (crawl-frontier operator)."""
    toks = dom_tokens(df, payload, doc_col)
    name = F.when(
        F.col("is_tag"),
        F.lower(F.regexp_extract("raw", TAG_NAME_PATTERN, 1)),
    ).otherwise(F.lit(""))
    t = toks.withColumn("_name", name)
    is_open = F.col("is_tag") & ~F.col("raw").startswith("</") & ~F.col(
        "raw"
    ).endswith("/>")
    is_close = F.col("is_tag") & F.col("raw").startswith("</")

    def delta(tags: tuple):
        return (
            F.when(is_open & F.col("_name").isin(*tags), 1)
            .when(is_close & F.col("_name").isin(*tags), -1)
            .otherwise(0)
        )

    t = (
        t.withColumn(
            "_e_o",
            F.when(is_open & F.col("_name").isin("url", "sitemap"), 1)
            .otherwise(0),
        )
        .withColumn(
            "_ix_o",
            F.when(is_open & (F.col("_name") == "sitemap"), 1).otherwise(0),
        )
        .withColumn("_en", delta(("url", "sitemap")))
        .withColumn("_lo", delta(("loc",)))
        .withColumn("_lm", delta(("lastmod",)))
        .withColumn("_pr", delta(("priority",)))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ann = t.select(
        "doc_id",
        "pos",
        "is_tag",
        "raw",
        F.sum("_e_o").over(w).cast("int").alias("entry_ord"),
        (F.sum("_ix_o").over(w) > 0).alias("is_index"),
        (F.sum("_en").over(w) > 0).alias("in_entry"),
        (F.sum("_lo").over(w) > 0).alias("in_loc"),
        (F.sum("_lm").over(w) > 0).alias("in_lastmod"),
        (F.sum("_pr").over(w) > 0).alias("in_priority"),
    )

    def field(flag: str):
        return visible_text_col(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_tag") & F.col(flag),
                                F.struct("pos", "raw"),
                            )
                        )
                    ),
                    lambda s: s["raw"],
                ),
                "",
            )
        )

    entries = (
        ann.where(F.col("in_entry") & (F.col("entry_ord") > 0))
        .groupBy("doc_id", "entry_ord")
        .agg(
            field("in_loc").alias("loc"),
            field("in_lastmod").alias("lastmod"),
            field("in_priority").alias("priority"),
            F.max("is_index").alias("is_index"),
        )
    )
    return entries.select(
        "doc_id",
        (F.col("entry_ord") - 1).cast("int").alias("entry_idx"),
        "loc",
        F.nullif(F.col("lastmod"), F.lit("")).alias("lastmod"),
        F.nullif(F.col("priority"), F.lit("")).alias("priority"),
        "is_index",
    )


def extract_microdata(df: DataFrame, payload,
                      doc_col: str = "doc_id") -> DataFrame:
    """Extract schema.org MICRODATA — the third structured-data
    vocabulary beside JSON-LD (extract_jsonld) and OpenGraph
    (html_meta_og), the one that rides ATTRIBUTES on ordinary content
    markup: ``itemscope``/``itemtype`` mark an item, ``itemprop`` marks
    a property whose value is (in precedence order) the tag's
    ``content`` attribute (meta), its ``href`` (a/link), or the
    element's text. Subset: items do not nest and a text-valued
    itemprop element contains exactly one text node (the closed-grammar
    simplification; hostile inputs still get defined output — the next
    token is either the value or not text at all, yielding '').

    One doc-partitioned window carries the item ordinal (running count
    of itemscope opens) and each prop tag's NEXT token (F.lead) — zero
    Python, ONE doc-hash exchange. Returns (doc_id, item_idx, itemtype,
    prop_idx, prop, value) with text values entity-decoded, attribute
    values raw-then-decoded like html_meta_og."""
    toks = dom_tokens(df, payload, doc_col)
    is_scope = F.col("is_tag") & F.col("raw").rlike(r"\bitemscope\b")
    w = Window.partitionBy("doc_id").orderBy("pos")
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    ann = toks.select(
        "doc_id",
        "pos",
        "is_tag",
        "raw",
        F.sum(F.when(is_scope, 1).otherwise(0)).over(wb).cast("int")
        .alias("item_ord"),
        F.last(
            F.when(is_scope, _attr_value("itemtype")), ignorenulls=True
        ).over(wb).alias("itemtype"),
        F.lead("raw").over(w).alias("next_raw"),
        F.lead("is_tag").over(w).alias("next_is_tag"),
    )
    props = ann.where(
        F.col("is_tag")
        & F.col("raw").rlike(r"\bitemprop\s*=")
        & (F.col("item_ord") > 0)
    )
    # raw value first, ONE entity decode at the end (a text node decoded
    # here and again below would double-decode '&amp;amp;')
    value = F.coalesce(
        _attr_value("content"),
        _attr_value("href"),
        F.when(~F.col("next_is_tag"), F.col("next_raw")),
        F.lit(""),
    )
    pw = Window.partitionBy("doc_id", "item_ord").orderBy("pos")
    return props.select(
        "doc_id",
        (F.col("item_ord") - 1).cast("int").alias("item_idx"),
        "itemtype",
        (F.row_number().over(pw) - 1).cast("int").alias("prop_idx"),
        _attr_value("itemprop").alias("prop"),
        visible_text_col(value).alias("value"),
    )


# A tag that hides its whole subtree from rendering: inline
# style display:none, the HTML5 `hidden` boolean attribute (word-bounded
# so `aria-hidden` cannot false-match), or aria-hidden="true"/'true'.
HIDDEN_TAG_PATTERN = (
    r"""(?i)style\s*=\s*("[^"]*display\s*:\s*none[^"]*"|"""
    r"""'[^']*display\s*:\s*none[^']*')"""
    r"""|\shidden(?=[\s=>/])"""
    r"""|aria-hidden\s*=\s*("true"|'true')"""
)


def extract_hidden_text(df: DataFrame, payload,
                        doc_col: str = "doc_id") -> DataFrame:
    """Split a page's text into RENDERED vs HIDDEN — the subtree-hiding
    attributes (``style="display:none"``, the HTML5 ``hidden`` boolean
    attribute, ``aria-hidden="true"``) that every real extraction engine
    must honor or it ships invisible SEO-spam text into the corpus and
    silently drops nothing a reader ever saw. Hiding is SUBTREE-scoped:
    the attribute rides the OPEN tag but the exclusion covers every
    descendant token until the MATCHING close — an ancestor property the
    per-tag-name enclosure counters of dom_annotate cannot carry (close
    tags have no attributes, so ``</div>`` cannot know whether it closes
    a hidden or a visible div).

    Distributed formulation (no stack, no Python):

      1. dom_annotate gives every token its depth-before prefix sum;
      2. open/close tags pair by RANK-AT-DEPTH: in well-formed nesting,
         same-depth elements cannot overlap, so the k-th open at depth D
         matches the k-th close at depth D+1 (close tokens sit one
         deeper because their own -1 lands after them) — two
         row_numbers partitioned by (doc, depth) and ONE slim equi-join
         on (doc, depth, k), tags only, no text rows shuffled twice;
      3. matched hidden intervals become +1/-1 deltas re-joined to the
         stream; a second prefix sum yields hid_level — nested hidden
         inside hidden counts text once, an UNCLOSED hidden open (no
         matching close) hides to end-of-document (defined hostile
         output per the formats.py degradation contract, never a crash).

    Returns (doc_id, visible_text, hidden_text, n_hidden, hidden_chars)
    with <script>/<style> content excluded from BOTH sides (it is code,
    not copy). ~3 doc-hash exchanges (window, rank windows, final agg) +
    one broadcast-sized interval join; all codegen."""
    ann = dom_annotate(dom_tokens(df, payload, doc_col))
    is_open = F.col("is_tag") & (F.col("d_depth") == 1)
    is_close = F.col("is_tag") & (F.col("d_depth") == -1)
    opens = ann.where(is_open).select(
        "doc_id", "pos", "depth",
        F.col("raw").rlike(HIDDEN_TAG_PATTERN).alias("is_hidden"),
        F.row_number()
        .over(Window.partitionBy("doc_id", "depth").orderBy("pos"))
        .alias("k"),
    )
    closes = ann.where(is_close).select(
        "doc_id", F.col("pos").alias("close_pos"),
        (F.col("depth") - 1).alias("depth"),
        F.row_number()
        .over(Window.partitionBy("doc_id", "depth").orderBy("pos"))
        .alias("k"),
    )
    hidden = (
        opens.where("is_hidden")
        .join(closes, ["doc_id", "depth", "k"], "left")
    )
    # ONE reference to the hidden-interval subtree: explode each matched
    # interval into its +1/-1 endpoint events (a second reference — e.g.
    # a unionAll of open and close projections — would recompute the
    # whole rank-join per consumer: scans of the corpus, not of a temp)
    deltas = (
        hidden.select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(F.col("pos").alias("p"), F.lit(1).alias("d")),
                    F.struct(
                        F.col("close_pos").alias("p"), F.lit(-1).alias("d")
                    ),
                )
            ).alias("e"),
        )
        .select("doc_id", F.col("e.p").alias("pos"), F.col("e.d").alias("delta"))
        .where(F.col("pos").isNotNull())
        .groupBy("doc_id", "pos")
        .agg(F.sum("delta").alias("delta"))
    )
    lv = (
        ann.join(deltas, ["doc_id", "pos"], "left")
        .withColumn(
            "hid_level",
            F.coalesce(
                F.sum(F.coalesce(F.col("delta"), F.lit(0))).over(
                    Window.partitionBy("doc_id")
                    .orderBy("pos")
                    .rowsBetween(Window.unboundedPreceding, 0)
                ),
                F.lit(0),
            ),
        )
    )
    strip = F.lit(False)
    for tag in HTML_STRIP_CONTENT_TAGS:
        strip = strip | (F.col(f"in_{tag}") > 0)
    txt = (~F.col("is_tag")) & (~strip) & (F.length("visible") > 0)

    def _joined(cond):
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(cond, F.struct("pos", "visible")))
                ),
                lambda s: s["visible"],
            ),
            " ",
        )

    # n_hidden folds into the SAME final aggregate as the sum of
    # positive deltas (each hidden open contributed exactly +1) — no
    # doc-list join-back, no second pass over the interval table. Every
    # payload tokenizes to >=1 row, so the doc-grain grouping is total.
    return lv.groupBy("doc_id").agg(
        _joined(txt & (F.col("hid_level") == 0)).alias("visible_text"),
        _joined(txt & (F.col("hid_level") > 0)).alias("hidden_text"),
        F.sum(
            F.when(F.coalesce(F.col("delta"), F.lit(0)) > 0, F.col("delta"))
            .otherwise(F.lit(0))
        ).cast("int").alias("n_hidden"),
        F.sum(
            F.when(txt & (F.col("hid_level") > 0), F.length("visible"))
            .otherwise(F.lit(0))
        ).cast("int").alias("hidden_chars"),
    ).select(
        "doc_id", "visible_text", "hidden_text", "n_hidden", "hidden_chars"
    )


def extract_svg_text(df: DataFrame, payload,
                     doc_col: str = "doc_id") -> DataFrame:
    """Positioned text from inline SVG — ``<text x= y=>`` elements carry
    their own layout, so extraction order must come from GEOMETRY, not
    document order (charts and diagrams emit labels in draw order, which
    is arbitrary). Reading order is raster (y asc, then x asc, pos as
    the deterministic tiebreak) — the flat sibling of
    pdf_column_reading_order's column detection; SVG labels are sparse
    annotations, not column text, so raster is the correct default.

    Tokenizes with dom_tokens (SVG is XML; the quote-aware tag grammar
    applies unchanged); a ``<text>`` open tag's x/y attributes plus its
    NEXT token (the label, F.lead) make a span; missing coordinates
    default to 0 per the SVG lacuna rules. Returns (doc_id, span_idx,
    x, y, text) with span_idx the reading-order rank. ONE doc-hash
    exchange carries both the lead and the rank window; zero Python."""
    toks = dom_tokens(df, payload, doc_col)
    name = F.lower(F.regexp_extract("raw", TAG_NAME_PATTERN, 1))
    w = Window.partitionBy("doc_id").orderBy("pos")
    ann = toks.select(
        "doc_id", "pos", "is_tag", "raw",
        F.lead("raw").over(w).alias("next_raw"),
        F.lead("is_tag").over(w).alias("next_is_tag"),
    )
    opens = ann.where(
        F.col("is_tag")
        & ~F.col("raw").startswith("</")
        & (name == "text")
    )
    # try_cast: a malformed coordinate degrades to 0, never an
    # ANSI cast exception (the formats.py degradation contract)
    x = F.coalesce(_attr_value("x").try_cast("int"), F.lit(0))
    y = F.coalesce(_attr_value("y").try_cast("int"), F.lit(0))
    label = F.when(
        ~F.col("next_is_tag"), visible_text_col(F.col("next_raw"))
    ).otherwise(F.lit(""))
    ro = Window.partitionBy("doc_id").orderBy("y", "x", "pos")
    return opens.select(
        "doc_id", x.alias("x"), y.alias("y"), label.alias("text"), "pos"
    ).select(
        "doc_id",
        (F.row_number().over(ro) - 1).cast("int").alias("span_idx"),
        "x", "y", "text",
    )
