"""CSS CASCADE resolution — selector matching + specificity ordering,
zero Python end to end.

The north rule's extraction story eventually hits styling: whether an
element is rendered (display, visibility, color) is decided by the
cascade — all matching rules ranked by SPECIFICITY (id=100 beats
class=10 beats type=1; compounds add) with SOURCE ORDER breaking ties
(CSS 2.1 §6.4.1 / Selectors L3, public spec). dom_tree's
extract_hidden_text handles the attribute form (style="display:none");
this module resolves the STYLESHEET form.

Shape (the dom_tree precedent): pages render from ONE closed spec —
``page_col`` builds a real ``<style>`` block + body as a JVM string
column, ``resolve_cascade`` REGEX-PARSES that string back into rule
and element tables (it never peeks at the arithmetic), matches
selectors relationally (doc-keyed equi-join + predicate: type / .class
/ type.class / #id against a two-class attribute), and picks each
element's winner with one max_by over (specificity, rule index). The
oracle restates the winner from the SPEC arithmetic alone — two
independent derivations meeting at the checker.

Supported selector grammar (closed): ``tag``, ``.class``,
``tag.class``, ``#id`` — one compound, no combinators; extending to
descendant combinators needs dom_tree ancestry (rank-at-depth pairing,
see CLAUDE.md session-5), deliberately out of scope here.

PLAN: build + parse are map-side codegen; the only shuffles are the
doc_id-keyed rule×element join and the winner aggregation. Rules per
page are bounded by the spec (<=6), so the join fan-out is O(docs),
never quadratic in corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TAGS = ("p", "div", "span")
CLASSES = ("alpha", "beta", "gamma")

__all__ = ["TAGS", "CLASSES", "page_col", "resolve_cascade"]


def _elem(idx: Column, doc: Column) -> tuple[Column, Column, Column, Column]:
    tag = F.element_at(F.array(*[F.lit(t) for t in TAGS]),
                       ((doc + idx) % 3 + 1).cast("int"))
    cls1 = F.element_at(F.array(*[F.lit(c) for c in CLASSES]),
                        ((doc * 2 + idx) % 3 + 1).cast("int"))
    cls2 = F.element_at(F.array(*[F.lit(c) for c in CLASSES]),
                        ((doc + 2 * idx + 1) % 3 + 1).cast("int"))
    eid = F.concat(F.lit("e"), idx.cast("string"))
    return tag, cls1, cls2, eid


def _rule(k: Column, doc: Column, n_elems: Column) -> tuple[Column, Column]:
    """(selector string, value string) for rule k of the page."""
    rtype = (doc + k) % 4
    tag = F.element_at(F.array(*[F.lit(t) for t in TAGS]),
                       ((doc + 2 * k) % 3 + 1).cast("int"))
    cls = F.element_at(F.array(*[F.lit(c) for c in CLASSES]),
                       ((doc * 3 + k) % 3 + 1).cast("int"))
    sel = (
        F.when(rtype == 0, tag)
        .when(rtype == 1, F.concat(F.lit("."), cls))
        .when(rtype == 2, F.concat(tag, F.lit("."), cls))
        .otherwise(F.concat(F.lit("#e"), (k % n_elems).cast("string")))
    )
    return sel, F.concat(F.lit("v"), k.cast("string"))


def page_col(doc: Column) -> Column:
    """The page as ONE string column: a <style> block of
    ``selector{color:value}`` rules, then the body elements with
    id + two-token class attributes. Pure JVM concat/transform."""
    n_elems = (doc % 5 + 1).cast("int")
    n_rules = (doc % 4 + 3).cast("int")
    rules = F.transform(
        F.sequence(F.lit(0), n_rules - 1),
        lambda k: F.concat_ws(
            "", _rule(k.cast("bigint"), doc, n_elems)[0], F.lit("{color:"),
            _rule(k.cast("bigint"), doc, n_elems)[1], F.lit("}"),
        ),
    )
    elems = F.transform(
        F.sequence(F.lit(0), n_elems - 1),
        lambda j: _elem_html(j.cast("bigint"), doc),
    )
    return F.concat(
        F.lit("<style>"), F.array_join(rules, "\n"), F.lit("</style>"),
        F.array_join(elems, ""),
    )


def _elem_html(idx: Column, doc: Column) -> Column:
    tag, cls1, cls2, eid = _elem(idx, doc)
    return F.concat(
        F.lit("<"), tag, F.lit(' id="'), eid, F.lit('" class="'),
        cls1, F.lit(" "), cls2, F.lit('">x</'), tag, F.lit(">"),
    )


_RULE_RE = r"([#.\w]+)\{color:(v\d+)\}"
_ELEM_RE = r'<(p|div|span) id="([^"]+)" class="([^"]+)">'


def resolve_cascade(pages: DataFrame, page: str = "page",
                    doc_id: str = "doc_id") -> DataFrame:
    """(doc_id, page) -> one row per element with the cascade winner.

    Parses the page with regex only, then: selector decomposition ->
    doc-keyed join -> match predicate -> max_by((specificity, order)).

    The style/body SPLIT is substring_index, not regex (round-4 bench
    finding): the reluctant ``[\\s\\S]*?`` derivations cost ~1 ms/row
    in the JVM regex engine AND were re-evaluated once per referencing
    column (three extract_all columns each inlined the body
    subexpression), making the split 15 of the query's 22 measured
    seconds. substring_index is a linear scan; the page grammar
    guarantees exactly one style block, so "after the last </style>"
    equals "after the first"."""
    style = F.substring_index(
        F.substring_index(F.col(page), "</style>", 1), "<style>", -1)
    rules = (
        pages.select(
            doc_id,
            F.arrays_zip(
                F.regexp_extract_all(style, F.lit(_RULE_RE), F.lit(1))
                .alias("sel"),
                F.regexp_extract_all(style, F.lit(_RULE_RE), F.lit(2))
                .alias("val"),
            ).alias("rv"),
        )
        .select(doc_id, F.posexplode("rv").alias("k", "r"))
        .select(
            doc_id,
            "k",
            F.col("r.sel").alias("sel"),
            F.col("r.val").alias("val"),
        )
        .withColumn(
            "sel_id",
            F.when(F.col("sel").startswith("#"),
                   F.expr("substring(sel, 2)")).otherwise(F.lit("")),
        )
        .withColumn(
            "sel_tag",
            F.when(F.col("sel").startswith("#") |
                   F.col("sel").startswith("."), F.lit(""))
            .otherwise(F.split("sel", "\\.").getItem(0)),
        )
        .withColumn(
            "sel_cls",
            F.when(F.col("sel").startswith("#"), F.lit(""))
            .when(F.col("sel").startswith("."),
                  F.expr("substring(sel, 2)"))
            .when(F.col("sel").contains("."),
                  F.split("sel", "\\.").getItem(1))
            .otherwise(F.lit("")),
        )
        .withColumn(
            "spec",
            F.when(F.col("sel_id") != "", F.lit(100)).otherwise(
                F.when(F.col("sel_cls") != "", F.lit(10)).otherwise(F.lit(0))
                + F.when(F.col("sel_tag") != "", F.lit(1)).otherwise(F.lit(0))
            ),
        )
    )
    body = F.substring_index(F.col(page), "</style>", -1)
    elems = (
        pages.select(
            doc_id,
            F.arrays_zip(
                F.regexp_extract_all(body, F.lit(_ELEM_RE), F.lit(1))
                .alias("tag"),
                F.regexp_extract_all(body, F.lit(_ELEM_RE), F.lit(2))
                .alias("eid"),
                F.regexp_extract_all(body, F.lit(_ELEM_RE), F.lit(3))
                .alias("cls"),
            ).alias("te"),
        )
        .select(doc_id, F.posexplode("te").alias("elem_idx", "e"))
        .select(
            doc_id,
            "elem_idx",
            F.col("e.tag").alias("tag"),
            F.col("e.eid").alias("eid"),
            F.split("e.cls", " ").alias("classes"),
        )
    )
    # Both join sides are DATA-SIZED (O(docs) elements x O(docs) rules).
    # The shuffle_hash hint forbids Catalyst from ever electing either
    # side as a broadcast build (round-3 verdict #4: at local small
    # stats it picked BuildLeft over the element side — harmless at
    # 500 docs, a driver OOM at 10^12): the join stays the doc-keyed
    # co-partitioned exchange at every scale, enforced by plan pin.
    matched = (
        elems.hint("shuffle_hash").join(rules, doc_id)
        .where(
            ((F.col("sel_tag") == "") | (F.col("sel_tag") == F.col("tag")))
            & ((F.col("sel_cls") == "")
               | F.array_contains("classes", F.col("sel_cls")))
            & ((F.col("sel_id") == "") | (F.col("sel_id") == F.col("eid")))
        )
        .groupBy(doc_id, "elem_idx")
        .agg(
            F.max_by("val", F.struct("spec", "k")).alias("color"),
            F.count("*").cast("int").alias("n_matches"),
        )
    )
    return (
        elems.hint("shuffle_hash")
        .join(matched, [doc_id, "elem_idx"], "left")
        .select(
            doc_id,
            "elem_idx",
            "tag",
            F.col("eid").alias("elem_id"),
            "color",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
        )
    )
