"""Text-analysis column functions — all pure Column expressions (JVM-side).

These generalize the reference's single text heuristic (the text-sufficiency
predicate, DocumentExtractManager.java:410-429) into the text-statistics
toolkit a large-scale training-data pipeline needs: token counting, quality
scoring, language id, and content fingerprinting. Everything here compiles
into whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Canonical whitespace normalization used EVERYWHERE extracted text is
# emitted or compared: collapse runs of whitespace to one space and trim.
WS_PATTERN = r"\s+"

# Tiny marker-word lists for the n-gram/stopword language heuristic.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
}

EN_STOPWORDS = ("the", "and", "of", "to", "in", "a", "is", "it", "for", "on")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_ws(c: Column | str) -> Column:
    """Collapse all whitespace runs to single spaces and trim."""
    return F.trim(F.regexp_replace(_col(c), WS_PATTERN, " "))


def token_count(c: Column | str) -> Column:
    """Whitespace token count; 0 for empty/null-ish text."""
    t = normalize_ws(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


# GPT-2-style pretokenizer regex, restricted to the Java-regex / RE2 common
# subset (no lookarounds, no \p classes) so Spark and the DuckDB oracle
# tokenize identically. Whitespace alternatives are deliberately ABSENT:
# the scan just skips between matches, so every match is one BPE-ish token.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(c: Column | str) -> Column:
    """BPE-ish token count: number of GPT-2-style pretokenizer matches
    (contractions split, letters/digits/punctuation runs with optional
    leading space). The standard 'how many LLM tokens is this corpus'
    estimator; pure JVM regex, no Python."""
    return F.size(F.regexp_extract_all(_col(c), F.lit(BPE_TOKEN_PATTERN), 0))


def _word_occurrences(c: Column, word: str) -> Column:
    # \b word boundaries; case-insensitive via lower() on the caller side.
    return F.size(F.regexp_extract_all(c, F.lit(rf"\b{word}\b"), 0))


def stopword_count(c: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    low = F.lower(normalize_ws(c))
    expr: Column = F.lit(0)
    for w in stopwords:
        expr = expr + _word_occurrences(low, w)
    return expr


def quality_score_cols(c: Column | str) -> dict[str, Column]:
    """Document quality signals: length, punctuation ratio, stopword ratio,
    mean token length — the usual pretraining-corpus filters."""
    t = normalize_ws(c)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), 0))
    n_stop = stopword_count(t)
    safe_tokens = F.greatest(n_tokens, F.lit(1))

    def _d6(c: Column) -> Column:
        # decimal(12,6) cast, not round(): Spark's round/cast both go through
        # the shortest-decimal repr + HALF_UP; the DuckDB oracle mirrors it
        # with CAST(CAST(x AS VARCHAR) AS DECIMAL(12,6)).
        return c.cast("decimal(12,6)").cast("double")

    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": _d6(n_punct / F.greatest(n_chars, F.lit(1))),
        "stopword_ratio": _d6(n_stop / safe_tokens),
        "mean_token_len": _d6(n_chars / safe_tokens),
    }


def char_entropy_cols(c: Column | str) -> dict[str, Column]:
    """Character-level Shannon entropy — the gibberish/repetition filter
    signal (low entropy = keyboard-mash or repeated-char pages, the class
    Gopher's repetition rules miss when the repeat unit is ONE char).

    MAP-ONLY at any scale: the per-doc char distribution is computed with
    higher-order array functions (distinct chars -> per-char counts via a
    codegen'd filter — O(distinct x len) per doc with distinct bounded by
    the alphabet), never an explode: a character explode is one row per
    corpus CHARACTER, catastrophic at 100 TB. The oracle uses the explode
    form (fine at oracle scale) — both reduce to the same counts.

    Each -p*log2(p) term is decimal(12,6)-quantized BEFORE the exact
    decimal sum (absorbs libm log2 ulp differences — the transcendental
    rule in plans/queries.py), so the entropy is engine-exact. Char
    arithmetic is codepoint-based and the fixture corpus is ASCII (probed
    0 non-ASCII docs at every SF); non-BMP text would need grapheme care.

    Returns {n_chars, n_distinct_chars, char_entropy}."""
    t = normalize_ws(c)
    cs = F.filter(F.split(t, ""), lambda x: x != F.lit(""))
    n = F.size(cs)
    dc = F.array_distinct(cs)
    term_dec = "decimal(12,6)"
    sum_dec = "decimal(30,6)"

    def _term(ch):
        k = F.size(F.filter(cs, lambda x: x == ch)).cast("double")
        p = k / n.cast("double")
        return (-(p) * F.log2(p)).cast(term_dec)

    s = F.aggregate(
        F.transform(dc, _term),
        F.lit(0).cast(sum_dec),
        lambda acc, x: (acc + x).cast(sum_dec),
    )
    return {
        "n_chars": n.cast("bigint"),
        "n_distinct_chars": F.size(dc).cast("int"),
        "char_entropy": F.when(n == 0, F.lit(0.0)).otherwise(
            s.cast("double")
        ),
    }


# De-hyphenation / line-wrap repair. Shared VERBATIM with the DuckDB
# oracle (conservative Java/RE2-common subset) — same rule as the anchor
# pattern in operators/html_extract.py: the repair itself is what the
# oracle verifies.
DEHYPHEN_PATTERN = "([a-z])-\n([a-z])"
LINEWRAP_PATTERN = "\n"


def dehyphenate_col(c: Column | str) -> Column:
    """Repair PDF/OCR line wrapping: a lowercase-letter + '-' + newline +
    lowercase-letter sequence is a hyphenated word split (rejoin, drop
    the hyphen); any remaining newline is an ordinary wrap (becomes a
    space). The lowercase guard keeps real compounds ('state-of-the-art'
    at a break) conservative the way pdftotext/Grobid do. Pure codegen —
    two regexp_replace passes, zero Python, zero shuffle: at 10^12 docs
    this rides whatever scan already touches the text."""
    joined = F.regexp_replace(_col(c), DEHYPHEN_PATTERN, "$1$2")
    return F.regexp_replace(joined, LINEWRAP_PATTERN, " ")


def readability_cols(c: Column | str) -> dict[str, Column]:
    """Flesch reading-ease signals (the classic prose-quality filter —
    pairs with stopword/punct ratios for curation): words, sentences
    (terminal-punct runs, floored at 1), syllables (vowel-group
    approximation, the standard regex estimator), and
    flesch = 206.835 - 1.015*(W/S) - 84.6*(Syl/W). Ratios are
    decimal(12,6)-quantized before the linear combination and the result
    re-quantized, so the score is engine-exact. Map-only codegen."""
    t = normalize_ws(c)
    words = F.greatest(token_count(t), F.lit(1)).cast("bigint")
    sents = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), F.lit(0))), F.lit(1)
    ).cast("bigint")
    syll = F.greatest(
        F.size(F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"), F.lit(0))),
        F.lit(1),
    ).cast("bigint")
    wps = (words.cast("double") / sents.cast("double")).cast("decimal(12,6)")
    spw = (syll.cast("double") / words.cast("double")).cast("decimal(12,6)")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * wps.cast("double")
        - F.lit(84.6) * spw.cast("double")
    ).cast("decimal(12,6)").cast("double")
    return {
        "n_words": words,
        "n_sentences": sents,
        "n_syllables": syll,
        "flesch": flesch,
    }


def lang_id(c: Column | str) -> Column:
    """Marker-word language heuristic: argmax over per-language marker counts
    (ties broken by language code order en<es<fr<de via strict > comparison)."""
    low = F.lower(normalize_ws(c))
    scores = {
        lang: sum(
            (_word_occurrences(low, w) for w in words), start=F.lit(0)
        )
        for lang, words in LANG_MARKERS.items()
    }
    best_lang: Column = F.lit("und")
    best_score: Column = F.lit(0)
    for lang in ("de", "fr", "es", "en"):  # later-applied when() wins ties -> en first
        s = scores[lang]
        best_lang = F.when(s > best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(s > best_score, s).otherwise(best_score)
    return best_lang


def fingerprint(c: Column | str) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized, lowercased text.
    Used for exact dedup; stable across engines (same md5 in DuckDB)."""
    return F.md5(F.lower(normalize_ws(c)))


# --- PII scrubbing (training-data hygiene) --------------------------------
# Patterns restricted to the Java-regex / RE2 common subset (no backrefs,
# no lookaround) so the DuckDB oracle evaluates them identically.
EMAIL_PATTERN = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def scrub_pii(text_col):
    """Replace emails then phone numbers with typed placeholder tokens —
    one codegen'd projection, no Python."""
    from pyspark.sql import functions as F

    no_email = F.regexp_replace(text_col, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_PATTERN, "<PHONE>")


# --- token-window document chunking (context-window prep) ------------------
# The training/RAG preprocessing step: split each document into overlapping
# windows of CHUNK_TOKENS whitespace tokens with CHUNK_OVERLAP carried
# between neighbors. Chunk rule (shared by the codegen path, the UDTF
# parity path, and the DuckDB oracle): starts = 0, step, 2*step, ... with
# step = tokens - overlap; a start s > 0 is kept only if s + overlap < n
# (every chunk past the first must contribute at least one NEW token —
# without this, a doc longer than one stride but shorter than a full
# window emits a suffix chunk wholly contained in its predecessor).
CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def chunk_text_col(c: Column | str, chunk_tokens: int = CHUNK_TOKENS,
                   overlap: int = CHUNK_OVERLAP) -> Column:
    """array<struct<chunk_idx,n_tokens,chunk>> — the SCALE path: sequence +
    filter + slice as one codegen'd expression, no Python, no shuffle.
    Callers should filter empty-normalized-text rows first (a zero-token
    doc has no chunks)."""
    step = chunk_tokens - overlap
    assert step > 0
    toks = F.split(normalize_ws(c), " ")
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(step)),
        lambda s: (s == 0) | (s + overlap < n),
    )
    return F.transform(
        starts,
        lambda s: F.struct(
            (s / step).cast("int").alias("chunk_idx"),
            F.least(n - s, F.lit(chunk_tokens)).cast("int").alias("n_tokens"),
            F.array_join(F.slice(toks, s + 1, chunk_tokens), " ").alias("chunk"),
        ),
    )


def make_chunk_udtf(chunk_tokens: int = CHUNK_TOKENS,
                    overlap: int = CHUNK_OVERLAP):
    """Python UDTF with the identical chunk rule — the §2.8 table-function
    surface (SELECT ... FROM docs, LATERAL chunk_text(text)). This is the
    SLOW path (row-at-a-time Python, no Arrow batching): it exists as the
    parity reference and as the extension point for chunkers a column
    expression can't express (real tokenizers, sentence-boundary models);
    production chunking is chunk_text_col. Register with
    spark.udtf.register(name, make_chunk_udtf())."""
    import re

    from pyspark.sql.functions import udtf

    from cies_ocr_java_spark.formats import WS_RUN

    step = chunk_tokens - overlap
    assert step > 0
    ws = re.compile(WS_RUN)

    @udtf(returnType="chunk_idx int, n_tokens int, chunk string")
    class ChunkText:
        def eval(self, text: str):
            norm = ws.sub(" ", text or "").strip(" ")
            if not norm:
                return
            toks = norm.split(" ")
            n = len(toks)
            for i, s in enumerate(range(0, n, step)):
                if s > 0 and s + overlap >= n:
                    break
                window = toks[s : s + chunk_tokens]
                yield i, len(window), " ".join(window)

    return ChunkText


def accent_fold_udf():
    """Arrow-vectorized accent folding: NFKD-decompose, drop combining
    marks. Unicode normalization has no JVM builtin in Spark SQL, so this
    is a legitimate pandas-UDF surface (unlike the extraction kernels,
    which stay codegen by default) — one Arrow batch in, one out, no
    per-row Python. The oracle (DuckDB strip_accents) agrees with NFKD
    mark-stripping on the synthesized accent set; full-Unicode parity is
    NOT claimed (ligatures, stroked letters differ between the two
    definitions — a corpus using those needs a golden-fixture contract
    like formats.py's)."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fold(s):
        def fold(x):
            if x is None:
                return None
            return "".join(
                c
                for c in unicodedata.normalize("NFKD", x)
                if not unicodedata.combining(c)
            )

        return s.map(fold)

    # annotations as real class objects: pandas is imported locally, so
    # string annotations would not resolve in this module's globals when
    # pandas_udf re-evaluates them via get_type_hints
    _fold.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_fold, "string")


def markdown_line_blocks(df, md_col: str = "md", doc_col: str = "doc_id"):
    """Markdown line-block classification — the lightweight-markup side
    of the extraction surface (crawl corpora carry READMEs and forum
    posts as Markdown, not HTML). One posexplode over the line split,
    then pure-codegen classification with the ONE stateful rule done as
    a window: CODE-FENCE PARITY. A line inside a ``` fence is 'code' no
    matter what it looks like — '# x' between fences is code, not a
    heading — and fence state is (count of fence markers among PRECEDING
    lines) % 2, a prefix sum over the same doc window every other
    operator here uses.

    Returns (doc_id, line_idx, kind, level, content): kind in
    fence|code|heading|ul_item|ol_item|quote|blank|para; level is the
    ATX heading depth (# run length) for headings, NULL otherwise;
    content is the raw line. PLAN: one doc-hash exchange for the window;
    everything else map-side."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(F.split(_col(md_col), "\n")).alias("line_idx", "line"),
    )
    is_fence = F.col("line").rlike(r"^```")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("line_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    in_code = (
        F.coalesce(
            F.sum(is_fence.cast("int")).over(w), F.lit(0)
        ) % 2 == 1
    )
    hashes = F.length(F.regexp_extract("line", r"^(#{1,6})\s", 1))
    kind = (
        F.when(is_fence, F.lit("fence"))
        .when(in_code, F.lit("code"))
        .when(hashes > 0, F.lit("heading"))
        .when(F.col("line").rlike(r"^[-*+]\s"), F.lit("ul_item"))
        .when(F.col("line").rlike(r"^\d+\.\s"), F.lit("ol_item"))
        .when(F.col("line").rlike(r"^>"), F.lit("quote"))
        .when(F.trim(F.col("line")) == "", F.lit("blank"))
        .otherwise(F.lit("para"))
    )
    return lines.select(
        "doc_id",
        "line_idx",
        kind.alias("kind"),
        F.when(
            ~is_fence & ~in_code & (hashes > 0), hashes
        ).cast("int").alias("level"),
        F.col("line").alias("content"),
    )
