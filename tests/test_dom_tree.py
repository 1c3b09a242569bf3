"""DOM-tree extraction (operators/dom_tree.py): the counter-tree must
equal a SEQUENTIAL STACK PARSE on well-nested input (the prefix-sum ==
stack theorem, probed over randomized balanced pages), behave definedly on
hostile input (mis-nesting, stray '<', stack-bomb attributes), and keep
its single-exchange zero-Python plan.
"""

import random
import re

import pytest
from pyspark.sql import functions as F

from cies_ocr_java_spark.formats import (
    HTML_BLOCK_TAGS,
    HTML_BOILERPLATE_CONTAINERS,
    HTML_ENTITIES,
    HTML_MIN_BLOCK_CHARS,
    HTML_STRIP_CONTENT_TAGS,
    WS_RUN,
)
from cies_ocr_java_spark.operators.dom_tree import (
    DOM_MIN_TEXT_DENSITY,
    DOM_VOID_TAGS,
    LINK_DENSITY_PCT,
    TAG_NAME_PATTERN,
    TAG_PATTERN,
    dom_main_text,
    dom_node_stats,
)
from cies_ocr_java_spark.operators.html_extract import COMMENT_PATTERN

_BOILER = set(HTML_STRIP_CONTENT_TAGS) | set(HTML_BOILERPLATE_CONTAINERS)


def _vis(s: str) -> str:
    for e, c in HTML_ENTITIES.items():
        s = s.replace(e, c)
    return re.sub(WS_RUN, " ", s).strip(" ")


def seq_dom_main_text(html: str):
    """Independent SEQUENTIAL reference: an explicit-stack DOM walk (the
    textbook parser), with the same density gates. On well-nested input
    the distributed counter formulation must produce identical output."""
    html = re.sub("(?s)" + COMMENT_PATTERN, " ", html or "")
    toks, last = [], 0
    for m in re.finditer(TAG_PATTERN, html, re.ASCII):
        toks.append((False, html[last : m.start()]))
        toks.append((True, m.group(0)))
        last = m.end()
    toks.append((False, html[last:]))

    stack: list[str] = []
    block_id = 0
    blocks: dict[int, dict] = {}

    def blk(i):
        return blocks.setdefault(
            i, {"texts": [], "chars": 0, "link": 0, "tags": 0}
        )

    for is_tag, raw in toks:
        if is_tag:
            m = re.match(TAG_NAME_PATTERN, raw, re.ASCII)
            name = (m.group(1) or "").lower() if m else ""
            blk(block_id)["tags"] += 1
            is_boundary = bool(name) and name in HTML_BLOCK_TAGS
            inert = (
                not name or raw.endswith("/>") or name in DOM_VOID_TAGS
            )
            if not inert:
                if raw.startswith("</"):
                    if stack and stack[-1] == name:
                        stack.pop()
                    # mis-nested close on balanced input never happens
                else:
                    stack.append(name)
            if is_boundary:
                block_id += 1
        else:
            v = _vis(raw)
            if not v and not raw:
                continue
            b = blk(block_id)
            if not any(s in _BOILER for s in stack):
                if v:
                    b["texts"].append(v)
                b["chars"] += len(v)
                if "a" in stack:
                    b["link"] += len(v)

    kept, n_blocks, n_kept = [], 0, 0
    for i in sorted(blocks):
        b = blocks[i]
        if b["chars"] > 0:
            n_blocks += 1
        if (
            b["chars"] >= HTML_MIN_BLOCK_CHARS
            and 100 * b["link"] <= LINK_DENSITY_PCT * b["chars"]
            and b["chars"] >= DOM_MIN_TEXT_DENSITY * (b["tags"] + 1)
        ):
            kept.append(" ".join(b["texts"]))
            n_kept += 1
    return " ".join(kept), n_blocks, n_kept


_PAGE = (
    '<!doctype html><html><head><title>T</title><script>var x = 1;</script>'
    '</head><body><nav><ul><li><a href="/">Home</a></li><li>'
    '<a href="/a">About</a></li></ul></nav><div id="main">'
    "<h2>Section one &amp; notes</h2>"
    '<p>the quick brown fox jumps over the lazy dog see '
    '<a href="/ref">ref</a> tail &lt;ok&gt;</p>'
    "<div><span>tiny</span><br/><b>x</b></div></div>"
    "<!-- comment with > inside -->"
    '<footer>&copy; 2024 <a href="/about">about</a> legal</footer>'
    "</body></html>"
)


def test_dom_main_text_handcrafted(spark):
    df = spark.createDataFrame([(1, _PAGE)], "doc_id int, html string")
    row = dom_main_text(df, F.col("html")).collect()[0]
    assert row.main_text == (
        "Section one & notes the quick brown fox jumps over the "
        "lazy dog see ref tail <ok>"
    )
    # blocks with content: h2, p, tiny-div, footer-side empty? footer is
    # boiler (0 chars). nav is boiler. -> h2, p, tiny div, plus the 'x'
    # fragment div: counted only if chars>0.
    assert row.n_kept == 2
    st = dom_node_stats(df, F.col("html")).collect()[0]
    assert st.max_depth == 6  # html>body>nav>ul>li>a
    assert st.link_chars == 3  # 'ref' — the only non-boiler anchor text
    assert st.boiler_chars > 0 and st.content_chars > st.link_chars


def test_dom_counter_tree_equals_sequential_stack_parse(spark):
    """Prefix-sum tree == explicit-stack tree on balanced pages: 60
    randomized well-nested documents (nested containers, inline anchors,
    attributes with '>' inside quotes, entities, void tags), one Spark
    pass, row-for-row equality with the sequential reference parser."""
    rng = random.Random(42)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    inline = ["b", "i", "span", "em"]
    containers = ["div", "p", "li", "section", "article", "nav", "footer"]

    def text(n):
        return " ".join(rng.choice(words) for _ in range(n))

    def node(depth):
        if depth >= 4 or rng.random() < 0.35:
            t = text(rng.randint(1, 8))
            if rng.random() < 0.2:
                t += " &amp; x &lt;raw"
            return t
        tag = rng.choice(containers + inline)
        attr = ""
        r = rng.random()
        if r < 0.25:
            attr = ' class="x>y"'  # '>' inside quotes must not close
        elif r < 0.35:
            attr = " id='q>z'"
        body = "".join(node(depth + 1) for _ in range(rng.randint(1, 3)))
        if rng.random() < 0.25:
            body += '<a href="/l">' + text(rng.randint(1, 3)) + "</a>"
        if rng.random() < 0.15:
            body += "<br/>"
        return f"<{tag}{attr}>{body}</{tag}>"

    pages = [
        "<html><body>" + "".join(node(0) for _ in range(rng.randint(1, 4)))
        + "</body></html>"
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        list(enumerate(pages)), "doc_id int, html string"
    )
    got = {
        r.doc_id: (r.main_text, r.n_blocks, r.n_kept)
        for r in dom_main_text(df, F.col("html")).collect()
    }
    for i, page in enumerate(pages):
        assert got[i] == seq_dom_main_text(page), f"doc {i}: {page[:200]}"


def test_dom_hostile_inputs_are_defined(spark):
    """Degradation contract: mis-nesting, stray close tags, a bare '<',
    an unterminated quote (the whole tail is then text), a null payload,
    and a 70 KB unquoted attribute (the BENCH_r02 stack-bomb class) all
    produce rows, never an executor crash."""
    bomb = "<div " + "x" * 70_000 + '><p>hello world content text</p></div>'
    cases = [
        (0, "</div></div><p>stray closes still yield this text</p>"),
        (1, "<p>a < b and c > d arithmetic survives as text</p>"),
        (2, '<p class="unterminated>this whole tail is character data'),
        (3, None),
        (4, bomb),
        (5, "<nav><p>misnested </nav> still inside nav by counter</p>"),
    ]
    df = spark.createDataFrame(cases, "doc_id int, html string")
    rows = {r.doc_id: r for r in dom_main_text(df, F.col("html")).collect()}
    assert len(rows) == 6
    assert rows[0].main_text == "stray closes still yield this text"
    # '<' not followed by [a-zA-Z!?/] is text; '< b and c >' survives
    assert "arithmetic survives as text" in rows[1].main_text
    # unterminated quote: the tag never closes, so the WHOLE string is
    # character data and survives verbatim (formats.py degradation rule 3)
    assert rows[2].main_text == (
        '<p class="unterminated>this whole tail is character data'
    )
    assert rows[3].main_text == ""
    assert rows[4].main_text == "hello world content text"
    # counter semantics: text after the stray </nav> has nav counter 0,
    # but 'misnested ' before it is inside nav -> dropped
    assert rows[5].main_text == "still inside nav by counter"


def test_dom_queries_plan_single_exchange_zero_python(spark):
    """dom_tree_extract / dom_node_stats: the ONLY shuffle is the one
    doc-partitioned hash exchange feeding the window (the groupBys reuse
    it — doc_id partitioning satisfies (doc_id, block_id) clustering),
    and the whole parse is codegen — no Arrow/Python nodes, no
    SinglePartition exchange."""
    from cies_ocr_java_spark.plans.queries import QUERIES

    for name in ("dom_tree_extract", "dom_node_stats"):
        plan = (
            QUERIES[name](spark, "/root/testdata/sf0.01")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan and "Arrow" not in plan, name
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "Exchange SinglePartition" not in plan, name


def test_dom_interleaved_spans_reading_order_and_ancestry(spark):
    """Text and media spans merge in token order; an <img> under nav is
    furniture (excluded by ancestry), content/figure images are kept with
    their src; a src-less <img> contributes nothing."""
    from cies_ocr_java_spark.operators.dom_tree import dom_interleaved_spans

    page = (
        '<html><body><nav><img src="media://d/logo"/><a href="/">Home</a></nav>'
        "<p>leading paragraph with enough characters</p>"
        '<img src="media://d/1"/>'
        "<p>second paragraph also long enough to keep</p>"
        '<figure><img src="media://d/2"/></figure>'
        "<img/>"
        "</body></html>"
    )
    df = spark.createDataFrame([(7, page)], "doc_id int, html string")
    rows = sorted(
        dom_interleaved_spans(df, F.col("html")).collect(),
        key=lambda r: r.span_order,
    )
    assert [(r.kind, r.text, r.media_ref) for r in rows] == [
        ("text", "leading paragraph with enough characters", None),
        ("media", None, "media://d/1"),
        ("text", "second paragraph also long enough to keep", None),
        ("media", None, "media://d/2"),
    ]
    assert [r.span_order for r in rows] == [0, 1, 2, 3]


def test_dom_interleaved_spans_plan_bounded_exchanges(spark):
    """The span merge reuses the doc-partitioned token exchange for the
    block aggregation; the union + final ordering window adds at most one
    more doc-keyed exchange. Never SinglePartition, never Python."""
    from cies_ocr_java_spark.plans.queries import QUERIES

    plan = (
        QUERIES["dom_interleaved_spans"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "Exchange SinglePartition" not in plan


# ---------------------------------------------------------------------------
# structured table extraction (session-3: extract_table_cells)
# ---------------------------------------------------------------------------

def _cells(spark, html):
    from pyspark.sql import functions as F
    from cies_ocr_java_spark.operators.dom_tree import extract_table_cells

    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return sorted(
        (r.table_idx, r.row_idx, r.col_idx, r.is_header, r.cell_text)
        for r in extract_table_cells(df, F.col("html")).collect()
    )


def test_table_cells_grid_and_header(spark):
    got = _cells(
        spark,
        "<html><body><table><tr><th>A</th><th>B</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table></body></html>",
    )
    assert got == [
        (0, 0, 0, True, "A"), (0, 0, 1, True, "B"),
        (0, 1, 0, False, "1"), (0, 1, 1, False, "2"),
    ]


def test_table_cells_second_table_and_hazards(spark):
    # entity decode at cell level; inline markup splits tokens but not
    # the cell; an empty <td></td> still yields its row
    got = _cells(
        spark,
        "<table><tr><td>fo&amp;o</td><td><b>b</b>ar</td><td></td></tr>"
        "</table><p>x</p><table><tr><td>z</td></tr></table>",
    )
    assert got == [
        (0, 0, 0, False, "fo&o"), (0, 0, 1, False, "bar"),
        (0, 0, 2, False, ""),
        (1, 0, 0, False, "z"),
    ]


def test_table_cells_text_outside_cells_excluded(spark):
    # prose, <caption> text, and text between </tr> and <tr> never
    # become cells
    got = _cells(
        spark,
        "<p>before</p><table><caption>cap</caption>"
        "<tr><td>a</td></tr>stray</table><p>after</p>",
    )
    assert got == [(0, 0, 0, False, "a")]


def test_table_cells_hostile_never_crashes(spark):
    # stray closes and a nested table: DEFINED output (counters move),
    # never an exception — the degradation contract
    got = _cells(
        spark,
        "</td></tr></table><table><tr><td>a<table><tr><td>n</td></tr>"
        "</table>b</td></tr></table>",
    )
    assert any(t[4] == "n" for t in got)  # nested cell text recovered
    assert all(isinstance(t[4], str) for t in got)


def test_table_cells_zero_python_plan(spark):
    from cies_ocr_java_spark.plans.queries import QUERIES

    plan = (
        QUERIES["html_table_cells"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange SinglePartition" not in plan


# ---------------------------------------------------------------------------
# outline extraction (session-3: extract_outline)
# ---------------------------------------------------------------------------

def test_outline_numbering_with_resets(spark):
    from pyspark.sql import functions as F
    from cies_ocr_java_spark.operators.dom_tree import extract_outline

    html = (
        "<html><body><h1>Alpha</h1><p>x</p><h2>Beta</h2><h3>Gamma</h3>"
        "<p>y</p><h3>Gam2</h3><h2>Delta</h2><h3>Eps</h3><h1>Omega</h1>"
        "<h2>Last &amp; one</h2></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = [
        (r.idx, r.level, r.path, r.heading)
        for r in extract_outline(df, F.col("html")).orderBy("idx").collect()
    ]
    assert got == [
        (0, 1, "1", "Alpha"),
        (1, 2, "1.1", "Beta"),
        (2, 3, "1.1.1", "Gamma"),
        (3, 3, "1.1.2", "Gam2"),
        (4, 2, "1.2", "Delta"),
        (5, 3, "1.2.1", "Eps"),
        (6, 1, "2", "Omega"),
        (7, 2, "2.1", "Last & one"),
    ]


def test_outline_deep_jump_and_empty_heading(spark):
    # an h3 with no h2 ancestor gets a 0 at the skipped level (defined
    # output); empty headings still emit their row
    from pyspark.sql import functions as F
    from cies_ocr_java_spark.operators.dom_tree import extract_outline

    html = "<h1>A</h1><h3>deep</h3><h2></h2>"
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = [
        (r.idx, r.level, r.path, r.heading)
        for r in extract_outline(df, F.col("html")).orderBy("idx").collect()
    ]
    assert got == [
        (0, 1, "1", "A"),
        (1, 3, "1.0.1", "deep"),
        (2, 2, "1.1", ""),
    ]


def test_outline_zero_python_plan(spark):
    from cies_ocr_java_spark.plans.queries import QUERIES

    plan = (
        QUERIES["html_outline_extract"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange SinglePartition" not in plan


# ---------------------------------------------------------------------------
# nested list extraction (session-3: extract_list_items)
# ---------------------------------------------------------------------------

def test_list_items_nesting_ordinals_tail_text(spark):
    from pyspark.sql import functions as F
    from cies_ocr_java_spark.operators.dom_tree import extract_list_items

    html = (
        "<ul><li>A</li><li>B<ol><li>C</li><li>D</li></ol> tail</li>"
        "<li>E</li></ul><p>x</p><ol><li>F &amp; G</li></ol>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = [
        (r.idx, r.depth, r.kind, r.ordinal, r.item_text)
        for r in extract_list_items(df, F.col("html"))
        .orderBy("idx").collect()
    ]
    assert got == [
        (0, 1, "ul", 1, "A"),
        (1, 1, "ul", 2, "B tail"),   # tail text credits the PARENT item
        (2, 2, "ol", 1, "C"),        # nested items own their text
        (3, 2, "ol", 2, "D"),
        (4, 1, "ul", 3, "E"),
        (5, 1, "ol", 1, "F & G"),    # second list restarts at 1
    ]


def test_list_items_hostile_never_crashes(spark):
    from pyspark.sql import functions as F
    from cies_ocr_java_spark.operators.dom_tree import extract_list_items

    html = "</li></ul><ul><li>a<ul><li>b<ul><li>c<ul><li>d<ul><li>e"
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = extract_list_items(df, F.col("html")).collect()
    # DEFINED degradation: the stray leading closes push the counter to
    # -1, so the first list opens at net depth 0 and its direct item 'a'
    # folds out; deeper items surface, depth capping at LIST_MAX_DEPTH
    assert sorted(r.item_text for r in rows) == ["b", "c", "d", "e"]
    assert max(r.depth for r in rows) == 4


def test_list_items_zero_python_plan(spark):
    from cies_ocr_java_spark.plans.queries import QUERIES

    plan = (
        QUERIES["html_list_items"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange SinglePartition" not in plan


def test_feed_items_rss_and_atom_synonyms(spark):
    from pyspark.sql import functions as F
    from cies_ocr_java_spark.operators.dom_tree import extract_feed_items

    rss = ("<rss><channel><title>chan &amp; co</title>"
           "<item><title>T0 &amp; x</title><link>u0</link><guid>g0</guid>"
           "</item><item><title>T1</title><link>u1</link><guid>g1</guid>"
           "</item></channel></rss>")
    atom = ("<feed><title>chan</title>"
            "<entry><title>A0</title><link>v0</link><id>i0</id></entry>"
            "</feed>")
    df = spark.createDataFrame(
        [(1, rss), (2, atom)], "doc_id long, page string"
    )
    got = sorted(
        (r.doc_id, r.item_idx, r.title, r.link, r.guid)
        for r in extract_feed_items(df, F.col("page")).collect()
    )
    assert got == [
        (1, 0, "T0 & x", "u0", "g0"),   # channel title excluded; entity
        (1, 1, "T1", "u1", "g1"),
        (2, 0, "A0", "v0", "i0"),       # Atom entry/id as synonyms
    ]


def test_feed_items_zero_python_plan(spark):
    from cies_ocr_java_spark.plans.queries import QUERIES

    plan = (
        QUERIES["feed_items_extract"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange SinglePartition" not in plan


def test_meta_og_attribute_hazards(spark):
    from cies_ocr_java_spark.plans.queries import QUERIES

    rows = (
        QUERIES["html_meta_og"](spark, "/root/testdata/sf0.001")
        .where("doc_id = 1").collect()
    )
    by_prop = {r.property: r.content for r in rows}
    # the og:type content carries a literal '>' INSIDE its quotes — a
    # naive [^>]* tag scan truncates there; quote-aware TAG_BODY survives
    assert by_prop["og:type"] == "a > b"
    assert by_prop["og:description"].endswith("& more")  # entity decoded
    assert "og:image" in by_prop  # odd id
    assert len(by_prop) == 4  # charset meta (no property) excluded


# ---------------------------------------------------------------------------
# hidden-subtree exclusion (session-5: extract_hidden_text)
# ---------------------------------------------------------------------------

def seq_hidden_split(html: str):
    """Sequential stack reference for the hidden split: an explicit
    (name, hidden?) stack; a text node is hidden iff any ancestor open
    carried a hiding attribute. Must equal the distributed rank-match
    formulation on well-nested input."""
    from cies_ocr_java_spark.operators.dom_tree import HIDDEN_TAG_PATTERN

    html = re.sub("(?s)" + COMMENT_PATTERN, " ", html or "")
    toks, last = [], 0
    for m in re.finditer(TAG_PATTERN, html, re.ASCII):
        toks.append((False, html[last: m.start()]))
        toks.append((True, m.group(0)))
        last = m.end()
    toks.append((False, html[last:]))
    hid_pat = re.compile(HIDDEN_TAG_PATTERN)
    stack = []
    vis, hid, n_hidden, hid_chars = [], [], 0, 0
    for is_tag, raw in toks:
        if is_tag:
            m = re.match(TAG_NAME_PATTERN, raw)
            name = (m.group(1).lower() if m else "")
            inert = (not name) or raw.endswith("/>") or name in DOM_VOID_TAGS
            if raw.startswith("</"):
                if stack:
                    stack.pop()
            elif not inert:
                h = bool(hid_pat.search(raw))
                n_hidden += h
                stack.append((name, h))
        else:
            t = _vis(raw)
            if not t:
                continue
            if any(n in HTML_STRIP_CONTENT_TAGS for n, _ in stack):
                continue
            if any(h for _, h in stack):
                hid.append(t)
                hid_chars += len(t)
            else:
                vis.append(t)
    return " ".join(vis), " ".join(hid), n_hidden, hid_chars


def _run_hidden(spark, pages):
    from cies_ocr_java_spark.operators.dom_tree import extract_hidden_text

    df = spark.createDataFrame(
        list(enumerate(pages)), "doc_id long, html string"
    )
    out = extract_hidden_text(df, F.col("html")).collect()
    return {
        r.doc_id: (r.visible_text, r.hidden_text, r.n_hidden, r.hidden_chars)
        for r in out
    }


def test_hidden_text_matches_sequential_stack(spark):
    rng = random.Random(55)
    tags = ["div", "span", "p", "section"]
    attrs = ['', '', '', ' style="display:none"', " hidden",
             ' aria-hidden="true"', " style='display : none'",
             ' class="x"', ' aria-hidden="false"']

    def page(depth=0):
        parts = []
        for _ in range(rng.randint(1, 3)):
            if depth < 3 and rng.random() < 0.6:
                t = rng.choice(tags)
                parts.append(
                    f"<{t}{rng.choice(attrs)}>{page(depth + 1)}</{t}>"
                )
            else:
                parts.append(rng.choice(["alpha", "beta b", " ", "gamma"]))
        return " ".join(parts)

    pages = [f"<html><body>{page()}</body></html>" for _ in range(24)]
    got = _run_hidden(spark, pages)
    for i, p in enumerate(pages):
        assert got[i] == seq_hidden_split(p), p


def test_hidden_text_unclosed_hides_to_end(spark):
    got = _run_hidden(
        spark, ["<p>pre</p><div hidden><p>gone</p><p>after</p>"]
    )
    assert got[0] == ("pre", "gone after", 1, 9)


def test_hidden_text_hostile_misnesting_defined(spark):
    # stray closes + overlap: defined output, never a crash
    got = _run_hidden(
        spark,
        ["</div></div><p>a<div hidden>x</p>y</div><p>b</p>",
         "<div style=\"display:none\">" * 40 + "deep"],
    )
    assert set(got) == {0, 1}
    for v in got.values():
        assert v[0] is not None and v[1] is not None


def test_hidden_text_aria_word_boundary(spark):
    # aria-hidden must not false-match the bare-hidden branch;
    # hidden="false" is still hidden (HTML5 boolean presence semantics);
    # class="hidden" (value, not attribute) must NOT hide
    got = _run_hidden(
        spark,
        ['<p aria-hidden="false">shown</p>'
         '<p hidden="false">boolean</p>'
         '<p class="hidden">classy</p>'],
    )
    assert got[0] == ("shown classy", "boolean", 1, 7)


def test_hidden_text_zero_python_plan(spark):
    from cies_ocr_java_spark.plans.queries import QUERIES

    plan = (
        QUERIES["html_hidden_text_extract"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange SinglePartition" not in plan


# ---------------------------------------------------------------------------
# positioned SVG text (session-5: extract_svg_text)
# ---------------------------------------------------------------------------

def test_svg_text_raster_order_and_defaults(spark):
    from cies_ocr_java_spark.operators.dom_tree import extract_svg_text

    svg = (
        '<svg><text x="200" y="40">d</text>'
        '<text x="10" y="40">c</text>'
        "<text>origin</text>"            # missing coords default to 0
        '<rect x="1" y="1"/>'
        '<text x="10" y="20">a</text>'
        '<text x="200" y="20">b &amp; e</text></svg>'
    )
    df = spark.createDataFrame([(1, svg)], "doc_id long, html string")
    rows = sorted(
        extract_svg_text(df, F.col("html")).collect(),
        key=lambda r: r.span_idx,
    )
    assert [(r.span_idx, r.x, r.y, r.text) for r in rows] == [
        (0, 0, 0, "origin"),
        (1, 10, 20, "a"),
        (2, 200, 20, "b & e"),
        (3, 10, 40, "c"),
        (4, 200, 40, "d"),
    ]


def test_svg_text_hostile_defined(spark):
    from cies_ocr_java_spark.operators.dom_tree import extract_svg_text

    df = spark.createDataFrame(
        [(1, '<text x="zz" y="-3"><b>nested</b></text><text')],
        "doc_id long, html string",
    )
    rows = extract_svg_text(df, F.col("html")).collect()
    # non-numeric x -> 0; tag follows open -> empty label; trailing
    # unterminated '<text' is character data, not a tag
    assert [(r.x, r.y, r.text) for r in rows] == [(0, -3, "")]


def test_svg_text_zero_python_plan(spark):
    from cies_ocr_java_spark.plans.queries import QUERIES

    plan = (
        QUERIES["svg_text_extract"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange SinglePartition" not in plan
