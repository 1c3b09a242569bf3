"""rel=next chain stitching (operators/pagination.py): chain order,
hop cap, and the defined degradations (cycles vanish, dangling next ends
the chain, duplicate urls fan out)."""

from pyspark.sql import functions as F

from cies_ocr_java_spark.operators.pagination import stitch_rel_next_chains

SCHEMA = "url string, next_url string, text string, doc_id long"


def _run(spark, rows, max_hops=8):
    df = spark.createDataFrame(rows, SCHEMA)
    out = stitch_rel_next_chains(df, max_hops=max_hops).collect()
    return {r.head_url: (r.head_doc, r.n_pages, r.stitched_text) for r in out}


def test_chain_order_and_singletons(spark):
    got = _run(
        spark,
        [
            ("a/1", "a/2", "one", 10),
            ("a/2", "a/3", "two", 11),
            ("a/3", None, "three", 12),
            ("s/9", None, "solo", 13),
        ],
    )
    assert got == {
        "a/1": (10, 3, "one two three"),
        "s/9": (13, 1, "solo"),
    }


def test_dangling_next_ends_chain(spark):
    got = _run(spark, [("a/1", "a/2", "one", 1), ("a/2", "gone", "two", 2)])
    assert got == {"a/1": (1, 2, "one two")}


def test_cycle_and_self_loop_yield_no_rows(spark):
    got = _run(
        spark,
        [
            ("c/1", "c/2", "x", 1),
            ("c/2", "c/1", "y", 2),
            ("loop", "loop", "z", 3),
            ("ok", None, "fine", 4),
        ],
    )
    assert got == {"ok": (4, 1, "fine")}


def test_max_hops_truncates(spark):
    rows = [(f"p/{i}", f"p/{i + 1}", f"t{i}", i) for i in range(6)]
    rows[-1] = ("p/5", None, "t5", 5)
    got = _run(spark, rows, max_hops=3)
    assert got == {"p/0": (0, 3, "t0 t1 t2")}


def test_stitch_plan_has_no_python(spark):
    df = spark.createDataFrame([("u", None, "t", 1)], SCHEMA)
    plan = (
        stitch_rel_next_chains(df, max_hops=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan


def test_query_registered():
    from cies_ocr_java_spark.plans.queries import ORACLES, QUERIES

    assert "html_pagination_stitch" in QUERIES
    assert "html_pagination_stitch" in ORACLES
