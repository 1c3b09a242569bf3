"""RTF text extraction — the brace-group markup format (Word's
interchange format, RTF 1.9): ``{\\rtf1\\ansi ...}`` documents where
formatting rides CONTROL WORDS (``\\b``, ``\\par``), bytes outside the
ASCII plane ride HEX ESCAPES (``\\'e9``), and metadata lives in
DESTINATION GROUPS (``{\\fonttbl...}``, ``{\\*\\generator...}``) whose
entire subtree must be excluded from the extracted text or font names and
tool stamps leak into the corpus.

Distributed formulation — zero Python, the dom_tree.extract_hidden_text
rank-at-depth move applied to braces instead of tags:

  1. one ``regexp_extract_all`` tokenizes the document into control
     words / control symbols / hex escapes / braces / text runs
     (control words CONSUME their delimiter space, per spec §"Control
     Words" — so no token-level trimming is ever needed);
  2. brace depth is a prefix sum; ``{`` ... ``}`` pairs match by
     RANK-AT-DEPTH (the k-th open at depth D matches the k-th close
     whose depth-before is D+1 — same-depth groups cannot overlap);
  3. a ``{`` is a DESTINATION open when its immediately-following token
     is ``\\*`` or a destination control word (lead() over the token
     stream); matched destination intervals become +1/-1 deltas and a
     second prefix sum carries hid_level — nested destinations count
     once, an UNCLOSED destination hides to end-of-document (defined
     hostile degradation, the formats.py contract);
  4. visible tokens render: text runs as-is, ``\\'hh`` via
     chr(conv(hh,16,10)), ``\\\\ \\{ \\}`` as their literal, ``\\par``
     as a paragraph break (a prefix sum of visible ``\\par`` tokens is
     the paragraph ordinal); all other control words render empty.

Reference parity: the reference routes RTF through Textract like every
other binary (DocumentExtractManager.java:438-461); native markup walk is
beyond-reference depth on the S10 family."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# control words opening a destination group whose subtree is dropped
RTF_DESTINATIONS = ("fonttbl", "colortbl", "stylesheet", "info", "pict")

_TOKEN_PATTERN = (
    r"\\'[0-9a-fA-F]{2}"      # hex escape
    r"|\\[a-z]+-?\d* ?"        # control word (+ consumed delimiter)
    r"|\\."                    # control symbol (\*, \\, \{, \})
    r"|\{|\}"                  # group braces
    r"|[^\\{}]+"               # text run
)


def rtf_tokens(df: DataFrame, payload: Column,
               doc_col: str = "doc_id") -> DataFrame:
    """(doc, pos, tok) token stream via ONE regexp_extract_all +
    posexplode — no Python, no shuffle."""
    return df.select(
        doc_col,
        F.posexplode(
            F.regexp_extract_all(payload, F.lit(_TOKEN_PATTERN), 0)
        ).alias("pos", "tok"),
    )


def extract_rtf_paragraphs(df: DataFrame, payload: Column,
                           doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, para_idx, text): extracted paragraphs in stream order
    with destination subtrees excluded. All codegen; shuffles are the
    doc-hash window exchanges + one slim rank join (tags only)."""
    toks = rtf_tokens(df, payload, doc_col)
    d_depth = (
        F.when(F.col("tok") == "{", 1)
        .when(F.col("tok") == "}", -1)
        .otherwise(0)
    )
    w = Window.partitionBy(doc_col).orderBy("pos")
    ann = toks.select(
        doc_col, "pos", "tok",
        F.coalesce(
            F.sum(d_depth).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("depth"),
        F.lead("tok").over(w).alias("nxt"),
    )
    dest_next = F.col("nxt") == F.lit("\\*")
    for word in RTF_DESTINATIONS:
        dest_next = dest_next | F.col("nxt").startswith(f"\\{word}")
    opens = ann.where(F.col("tok") == "{").select(
        doc_col, "pos", "depth",
        dest_next.alias("is_dest"),
        F.row_number()
        .over(Window.partitionBy(doc_col, "depth").orderBy("pos"))
        .alias("k"),
    )
    closes = ann.where(F.col("tok") == "}").select(
        doc_col, F.col("pos").alias("close_pos"),
        (F.col("depth") - 1).alias("depth"),
        F.row_number()
        .over(Window.partitionBy(doc_col, "depth").orderBy("pos"))
        .alias("k"),
    )
    dest = (
        opens.where("is_dest")
        .join(closes, [doc_col, "depth", "k"], "left")
    )
    deltas = (
        dest.select(
            doc_col,
            F.explode(
                F.array(
                    F.struct(F.col("pos").alias("p"), F.lit(1).alias("d")),
                    F.struct(
                        F.col("close_pos").alias("p"),
                        F.lit(-1).alias("d"),
                    ),
                )
            ).alias("e"),
        )
        .select(doc_col, F.col("e.p").alias("pos"),
                F.col("e.d").alias("delta"))
        .where(F.col("pos").isNotNull())
        .groupBy(doc_col, "pos")
        .agg(F.sum("delta").alias("delta"))
    )
    lv = ann.join(deltas, [doc_col, "pos"], "left").withColumn(
        "hid_level",
        F.coalesce(
            F.sum(F.coalesce(F.col("delta"), F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            F.lit(0),
        ),
    )
    tok = F.col("tok")
    is_hex = tok.rlike(r"^\\'[0-9a-fA-F]{2}$")
    is_ctrl = tok.rlike(r"^\\[a-z]")
    is_esc = tok.isin("\\\\", "\\{", "\\}")
    piece = (
        F.when(tok.isin("{", "}"), F.lit(""))
        .when(is_hex,
              F.chr(F.conv(F.substring(tok, 3, 2), 16, 10)
                    .cast("bigint")))
        .when(is_esc, F.substring(tok, 2, 1))
        .when(is_ctrl, F.lit(""))
        .otherwise(tok)
    )
    visible = (F.col("hid_level") == 0) & (F.col("depth") >= 1)
    is_par = tok.rlike(r"^\\par(\d+)? ?$")
    body = lv.select(
        doc_col, "pos",
        F.when(visible, piece).otherwise(F.lit("")).alias("piece"),
        F.coalesce(
            F.sum(
                F.when(visible & is_par, 1).otherwise(0)
            ).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("int").alias("para_idx"),
    )
    return (
        body.groupBy(doc_col, "para_idx")
        .agg(
            F.trim(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "piece"))
                        ),
                        lambda s: s["piece"],
                    ),
                    "",
                )
            ).alias("text")
        )
        .where(F.length("text") > 0)
        .select(doc_col, "para_idx", "text")
    )
