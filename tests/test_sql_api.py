"""SQL-API equivalence: the engine is fully reachable through spark.sql —
the DataFrame registry and a plain SQL statement over registered views
produce identical results (same Catalyst plans underneath)."""

from pyspark.sql import functions as F

from cies_ocr_java_spark.plans.queries import QUERIES, register_views

SF = "/root/testdata/sf0.01"


def test_sql_and_dataframe_agree_on_q1(spark):
    register_views(spark, SF)
    sql = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """)
    df = QUERIES["q1_pricing_summary"](spark, SF).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    got = {(r[0], r[1]): (r[2], r[3]) for r in sql.collect()}
    want = {(r[0], r[1]): (r[2], r[3]) for r in df.collect()}
    assert got == want


def test_sql_window_and_dedup_exact_agree(spark):
    register_views(spark, SF)
    sql = spark.sql("""
        SELECT fp, count(*) AS n_docs, min(id) AS canonical_id FROM (
          SELECT md5(trim(regexp_replace(lower(text), '\\\\s+', ' '))) AS fp,
                 doc_id AS id
          FROM documents) GROUP BY fp
    """)
    from cies_ocr_java_spark.operators.dedup import exact_duplicates

    docs = spark.table("documents")
    df = exact_duplicates(docs, "text", "doc_id")
    got = {r["fp"]: (r["n_docs"], r["canonical_id"]) for r in sql.collect()}
    want = {r["fp"]: (r["n_docs"], r["canonical_id"]) for r in df.collect()}
    assert got == want
