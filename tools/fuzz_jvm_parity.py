"""Ad-hoc three-way parity fuzzer: JVM column paths vs the pure-Python
oracle on adversarial payload soup (the degradation-contract grammar).
Used during development; the durable pins live in
tests/test_property_extractors.py and tests/test_operators.py."""

import random
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cies_ocr_java_spark.operators.html_extract import html_main_text_col
from cies_ocr_java_spark.operators.ocr_mock import ocr_text_col
from cies_ocr_java_spark.operators.pdf_extract import pdf_layer_cols
from cies_ocr_java_spark.session import get_spark
from tools import oracle

PDF_ATOMS = [
    "%PDF-1.4\n", "%%Page: 1\n", "%%EOF\n", "BT\n", "ET\n", "(", ")", " Tj",
    "\\", "\\(", "\\)", "\\\\", "(text) Tj\n", "(a\\) Tj\n", "((nested) Tj\n",
    "\n", "\r", "\x0b", "\xa0", " ", "word ", "\t",
    "%%OCRBlock PAGE aGVsbG8=\n", "%%OCRBlock PAGE !!bad!!\n",
    "%%OCRBlock PAGE /w==\n", "%%OCRBlock PAGE abc\n",
    "%%OCRBlock PAGE a=b=\n", "%%OCRBlock WORD aGk=\n", "%%OCRBlock PAGE \n",
    "junk (x) Tj more", "(unterminated", "\\(esc) Tj", "(\\z) Tj\n",
    "%%Page:", "x%%EOF", "(a\\\rb) Tj", "(a\\\nb) Tj", "(ok) Tjx",
    "(a\\b) Tj", "(a b) Tj",
]
HTML_ATOMS = [
    "<p>", "</p>", "<div>", "</div>", "<nav>", "</nav>", "<script>",
    "</script>", "<a href='/x'>", "<a>", "</a>", "plain words here ",
    "<b>", "</b>", "<!-- comment -->", "<!-- unclosed", "-->",
    '<p class="x>y">', "<p a='q>r'>", '<img alt="<p>">', "&amp;", "&lt;",
    "&copy;", "&amp", "&#39;", "&#160;", "< notag", "<1abc>", "</ x>", "<",
    ">", '"', "'", '<p a="unclosed', "\xa0", "\x0b", "\t", "\n",
    "text with enough length to pass the block filter ", "<aside>",
    "</aside>", "<table>", "<td>", "</td>", "</table>", "<li>", "<ul>",
    "</ul>", "<NAV>", "</NAV>", "<navx>", "<pre>", "</pre>", "<prex>",
    "<h1>", "</h1>", "<style>p{}</style>", "<?pi >", "<! decl >",
    "<a href=x>link text</a>", "<footer>", "</footer>",
]


def main(n: int = 800, seed: int = 7) -> int:
    rng = random.Random(seed)
    pdfs = ["".join(rng.choice(PDF_ATOMS) for _ in range(rng.randint(1, 25)))
            for _ in range(n)]
    htmls = ["".join(rng.choice(HTML_ATOMS) for _ in range(rng.randint(1, 30)))
             for _ in range(n)]

    spark = get_spark(master="local[8]")
    total_fails = 0
    pdf_df = spark.createDataFrame(
        list(enumerate(pdfs)), "i int, payload string"
    )
    cols = pdf_layer_cols(F.col("payload"))
    rows = pdf_df.select(
        "i", cols["pdf_text"].alias("t"), cols["page_count"].alias("pc"),
        cols["pdf_malformed"].alias("m"),
        ocr_text_col(F.col("payload")).alias("o"),
    ).collect()
    fails = 0
    for r in rows:
        want = oracle.parse_pdf(pdfs[r["i"]])
        if (r["t"] != want["text"] or r["pc"] != want["page_count"]
                or bool(r["m"]) != want["malformed"]
                or r["o"] != want["ocr_text"]):
            fails += 1
            if fails <= 3:
                print("PDF MISMATCH:", repr(pdfs[r["i"]][:200]))
                print("  jvm:", repr(r["t"]), r["pc"], r["m"], repr(r["o"]))
                print("  orc:", repr(want["text"]), want["page_count"],
                      want["malformed"], repr(want["ocr_text"]))
    print(f"jvm pdf fails: {fails}/{n}")
    total_fails += fails

    html_df = spark.createDataFrame(
        list(enumerate(htmls)), "i int, payload string"
    )
    rows = html_df.select(
        "i", html_main_text_col(F.col("payload")).alias("t")
    ).collect()
    fails = 0
    for r in rows:
        want = oracle.extract_html(htmls[r["i"]])
        if r["t"] != want:
            fails += 1
            if fails <= 3:
                print("HTML MISMATCH:", repr(htmls[r["i"]][:250]))
                print("  jvm:", repr(r["t"]))
                print("  orc:", repr(want))
    print(f"jvm html fails: {fails}/{n}")
    total_fails += fails
    spark.stop()
    return 1 if total_fails else 0


if __name__ == "__main__":
    sys.exit(main(*(int(a) for a in sys.argv[1:])))
