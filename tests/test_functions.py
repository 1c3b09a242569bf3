"""Scalar function tests — reference parity per SURVEY.md §2.6, including
pinned intended-semantics for the reference's bugs (F6 split bug)."""

from pyspark.sql import functions as F

from cies_ocr_java_spark.functions.paths import (
    coerce_status,
    doc_id_from_result_id,
    guess_mime_type,
    json_result_id,
    last_path_element,
    remove_leading_slash,
    text_result_id,
)
from cies_ocr_java_spark.functions.text import (
    fingerprint,
    lang_id,
    normalize_ws,
    token_count,
)


def _one(spark, value, col_fn):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col_fn(F.col("v")).alias("r")).collect()[0]["r"]


def test_remove_leading_slash(spark):
    assert _one(spark, "/text/abc", remove_leading_slash) == "text/abc"
    assert _one(spark, "text/abc", remove_leading_slash) == "text/abc"
    # only ONE leading slash, like Utility.java:74-80
    assert _one(spark, "//x", remove_leading_slash) == "/x"


def test_last_path_element(spark):
    assert _one(spark, "/text/doc-1", last_path_element) == "doc-1"
    assert _one(spark, "doc-1", last_path_element) == "doc-1"


def test_mime_guess(spark):
    assert _one(spark, "a/b/scan.PDF", guess_mime_type) == "application/pdf"
    assert _one(spark, "x.html", guess_mime_type) == "text/html"
    assert _one(spark, "noext", guess_mime_type) == "application/octet-stream"


def test_result_ids_idempotent(spark):
    assert _one(spark, "d1", text_result_id) == "d1.txt"
    assert _one(spark, "d1.txt", text_result_id) == "d1.txt"
    assert _one(spark, "d1", json_result_id) == "d1.json"
    # F6 intended semantics (reference impl is dead/broken, Utility.java:126-130)
    assert _one(spark, "d1.txt", doc_id_from_result_id) == "d1"
    assert _one(spark, "d1.json", doc_id_from_result_id) == "d1"
    assert _one(spark, "d1.pdf", doc_id_from_result_id) == "d1.pdf"


def test_status_coercion(spark):
    # unknown/null -> New (DocumentExtractStatus.java:12-18)
    df = spark.createDataFrame(
        [("SUCCEEDED",), ("garbage",), (None,), ("Submitted",)], "v string"
    )
    got = [r["r"] for r in df.select(coerce_status(F.col("v")).alias("r")).collect()]
    assert got == ["SUCCEEDED", "New", "New", "Submitted"]


def test_normalize_and_tokens(spark):
    assert _one(spark, "  a \t b\n\nc  ", normalize_ws) == "a b c"
    df = spark.createDataFrame([("a b  c",), ("",), ("   ",)], "v string")
    got = [r["r"] for r in df.select(token_count(F.col("v")).alias("r")).collect()]
    assert got == [3, 0, 0]


def test_lang_id(spark):
    en = "the cat and the dog went to the market in town"
    es = "el perro y la casa de que los hombres"
    assert _one(spark, en, lang_id) == "en"
    assert _one(spark, es, lang_id) == "es"


def test_fingerprint_ws_insensitive(spark):
    a = _one(spark, "Hello   World", fingerprint)
    b = _one(spark, "hello world", fingerprint)
    assert a == b and len(a) == 32


def test_bpe_token_count(spark):
    from cies_ocr_java_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [
            (1, "Hello, it's 42 worlds!"),
            (2, ""),
            (3, "   "),
            (4, "we'll don't I'm you're they've he'd"),
            (5, "a2b"),
        ],
        "id long, t string",
    )
    out = {r["id"]: r["n"] for r in df.select("id", bpe_token_count("t").alias("n")).collect()}
    # Hello | , | ' it' | 's | ' 42' | ' worlds' | !
    assert out[1] == 7
    assert out[2] == 0 and out[3] == 0
    # each word splits word + contraction suffix: 6 words -> 12 tokens
    assert out[4] == 12
    # letters/digits alternate: a | 2 | b
    assert out[5] == 3


def test_http_status_description_f7(spark):
    """F7 (Utility.java:12-71): known codes map to the reference's exact
    strings (incl. 'Ok', 'Moved temporarily', 419/420); unknown and null
    codes return null (Map.get)."""
    from cies_ocr_java_spark.functions.paths import (
        STATUS_DESCRIPTIONS,
        http_status_description,
    )

    rows = [(200,), (302,), (419,), (420,), (999,), (None,)]
    df = spark.createDataFrame(rows, "code int")
    got = {
        r["code"]: r["d"]
        for r in df.select(
            "code", http_status_description("code").alias("d")
        ).collect()
    }
    assert got[200] == "Ok"
    assert got[302] == "Moved temporarily"
    assert got[419] == "Insufficient space on resource"
    assert got[420] == "Method failure"
    assert got[999] is None and got[None] is None
    assert len(STATUS_DESCRIPTIONS) == 48


def test_chunk_udtf_matches_codegen_path(spark, corpus_dir):
    """§2.8 UDTF surface: the Python table function (LATERAL chunk_text)
    must produce exactly the codegen chunker's rows on the fixture corpus
    texts (incl. adversarial/mixed-encoding docs), and the chunk rule's
    edge cases hold: overlap carried, no wholly-contained suffix chunk,
    empty text yields no rows."""
    from pyspark.sql import functions as F

    from cies_ocr_java_spark.functions.text import (
        chunk_text_col,
        make_chunk_udtf,
        normalize_ws,
    )
    from cies_ocr_java_spark.plans.pipeline import extract_spans

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    texts = (
        extract_spans(docs)
        .where(~F.col("failed"))
        .select("doc_id", "text")
        .where(F.length(normalize_ws(F.col("text"))) > 0)
    )
    texts.createOrReplaceTempView("chunk_src")
    spark.udtf.register("chunk_text_udtf", make_chunk_udtf())

    codegen = {
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk"])
        for r in texts.select(
            "doc_id", F.explode(chunk_text_col(F.col("text"))).alias("c")
        )
        .select("doc_id", "c.chunk_idx", "c.n_tokens", "c.chunk")
        .collect()
    }
    via_udtf = {
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk"])
        for r in spark.sql(
            "SELECT s.doc_id, u.* FROM chunk_src s, LATERAL chunk_text_udtf(s.text) u"
        ).collect()
    }
    assert codegen == via_udtf and len(codegen) > 100

    # edge cases: a doc longer than one stride but within a window (n=60:
    # starts 0 and 48, but chunk@48 would be wholly inside chunk@0) must
    # emit ONE chunk; n=65 legitimately emits a second chunk carrying the
    # one token chunk 0 cannot hold; overlap is carried between chunks.
    one = spark.createDataFrame(
        [("e1", " ".join(f"w{i}" for i in range(60))),
         ("e1b", " ".join(f"w{i}" for i in range(65))),
         ("e2", " ".join(f"w{i}" for i in range(81)))],
        "doc_id string, text string",
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in one.select(
            "doc_id", F.explode(chunk_text_col(F.col("text"))).alias("c")
        ).select("doc_id", "c.*").collect()
    }
    assert ("e1", 1) not in out and out[("e1", 0)]["n_tokens"] == 60
    assert ("e1b", 1) in out and out[("e1b", 1)]["n_tokens"] == 17
    assert ("e2", 1) in out and out[("e2", 1)]["n_tokens"] == 33
    assert out[("e2", 1)]["chunk"].split(" ")[0] == "w48"  # overlap carried


def test_host_suffixes_single_label_is_empty_not_crash(spark):
    """A 1-label host (localhost, intranet names) must yield an EMPTY
    suffix list — not a descending sequence feeding slice(arr, 0, ...)
    which kills the whole job (review finding, round 2)."""
    from pyspark.sql import functions as F

    from cies_ocr_java_spark.functions.urls import host_suffixes

    df = spark.createDataFrame(
        [("localhost",), ("a.b.com",), ("example.com",)], "host string"
    )
    got = {
        r["host"]: r["s"]
        for r in df.select(
            "host", host_suffixes(F.col("host")).alias("s")
        ).collect()
    }
    assert got["localhost"] == []
    assert got["a.b.com"] == ["b.com", "a.b.com"]
    assert got["example.com"] == ["example.com"]


def test_tracking_prefix_fold_honors_every_prefix(spark, monkeypatch):
    """url_query_canonical must fold ALL of TRACKING_PREFIXES — extending
    the tuple must actually strip the new prefix (review finding: the
    original lambda hardcoded element [0])."""
    from pyspark.sql import functions as F

    from cies_ocr_java_spark.functions import urls

    monkeypatch.setattr(urls, "TRACKING_PREFIXES", ("utm_", "gclid"))
    df = spark.createDataFrame(
        [("http://x.com/p?gclid=9&utm_a=1&z=2",)], "url string"
    )
    q = df.select(urls.url_query_canonical(F.col("url")).alias("q")).collect()
    assert q[0]["q"] == "z=2"


def test_markdown_fence_parity_and_kinds(spark):
    from cies_ocr_java_spark.functions.text import markdown_line_blocks

    md = "\n".join([
        "# Title",
        "plain text",
        "```",
        "# not a heading",
        "- not a list",
        "```",
        "- item",
        "12. ordered",
        "> quoted",
        "",
        "### deep",
    ])
    df = spark.createDataFrame([(1, md)], "doc_id long, md string")
    got = [
        (r.kind, r.level)
        for r in markdown_line_blocks(df).orderBy("line_idx").collect()
    ]
    assert got == [
        ("heading", 1), ("para", None), ("fence", None),
        ("code", None), ("code", None), ("fence", None),
        ("ul_item", None), ("ol_item", None), ("quote", None),
        ("blank", None), ("heading", 3),
    ]
