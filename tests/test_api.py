"""Document-lifecycle API tests — the reference's verb surface (POST/GET/
HEAD/DELETE + text/json retrieval + status polling), including the pinned
intended semantics for its quirks (conflict on duplicate POST, last-state-
wins status, unknown->New coercion)."""

import pytest
from pyspark.sql import functions as F

from cies_ocr_java_spark.api import DocumentStore
from cies_ocr_java_spark.plans import pipeline
from cies_ocr_java_spark.schema import STATUS_NEW, STATUS_SUCCEEDED


@pytest.fixture()
def store(spark, corpus_dir, tmp_path):
    root = str(tmp_path / "store")
    s = DocumentStore(spark, root)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    s.ingest_documents(docs.where(F.col("doc_id") < "doc-000050"))
    return s


def test_post_conflict_on_duplicate(spark, store, corpus_dir):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    dup = docs.where(F.col("doc_id") == "doc-000001")
    with pytest.raises(ValueError, match="conflict"):
        store.ingest_documents(dup)
    # skip mode ingests nothing new
    before = store.documents.read(spark).count()
    store.ingest_documents(dup, on_conflict="skip")
    assert store.documents.read(spark).count() == before


def test_get_and_head(spark, store):
    got = store.get_document("doc-000001").collect()
    assert len(got) == 1 and got[0]["spans"] is not None
    head = store.get_document_metadata("doc-000001").collect()
    assert len(head) == 1
    assert "spans" not in head[0].asDict()          # HEAD never reads the body
    assert head[0]["status"] == STATUS_NEW          # no state yet -> New


def test_lifecycle_status_and_results(spark, store):
    docs = store.documents.read(spark)
    pipeline.run(spark, docs, store.documents.root.rsplit("/", 1)[0], run_id="api1")
    ok_id = (
        store.state.read(spark)
        .where(F.col("status") == STATUS_SUCCEEDED)
        .first()["doc_id"]
    )
    assert store.poll_status(ok_id) == STATUS_SUCCEEDED
    txt = store.get_text(ok_id).collect()
    assert len(txt) == 1 and isinstance(txt[0]["text"], str)
    js = store.get_json(ok_id).collect()
    assert js[0]["spans_json"].startswith("[")


def test_delete_keeps_history(spark, store):
    pre = store.documents.current_snapshot_id()
    n_before = store.documents.read(spark).count()
    store.delete_documents(["doc-000001", "doc-000002"])
    assert store.documents.read(spark).count() == n_before - 2
    assert store.documents.read(spark, snapshot_id=pre).count() == n_before
    assert store.get_document("doc-000001").count() == 0


def test_put_upserts_and_keeps_history(spark, store):
    """PUT replaces an existing doc's spans and creates missing docs in
    one overwrite snapshot; the pre-merge snapshot stays readable."""
    docs = store.documents.read(spark)
    n_before = docs.count()
    pre = store.documents.current_snapshot_id()
    one = docs.where(F.col("doc_id") == "doc-000001").limit(1)
    replaced = one.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.lit("REPLACED BODY").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    fresh = replaced.select(
        F.lit("doc-999999").alias("doc_id"), F.col("spans")
    )
    store.put_documents(replaced.unionByName(fresh))
    after = store.documents.read(spark)
    assert after.count() == n_before + 1
    got = after.where(F.col("doc_id") == "doc-000001").first()
    assert got["spans"][0]["text"] == "REPLACED BODY"
    assert after.where(F.col("doc_id") == "doc-999999").count() == 1
    # time travel: the pre-PUT snapshot still has the original body
    old = store.documents.read(spark, snapshot_id=pre)
    assert old.where(F.col("doc_id") == "doc-000001").first()["spans"][0]["text"] != "REPLACED BODY"
    assert old.where(F.col("doc_id") == "doc-999999").count() == 0


def test_ingest_assigns_uuid_when_identifier_absent(spark, tmp_path):
    """F8 (DocumentExtractManager.java:160): UUID.randomUUID() when the
    identifier is absent — generate, assert shape + uniqueness, and pin
    that a provided doc_id passes through untouched (the deterministic
    override every fixture relies on)."""
    import re

    s = DocumentStore(spark, str(tmp_path / "store"))
    docs = spark.createDataFrame(
        [("doc-keep", "a"), (None, "b"), (None, "c")],
        "doc_id string, body string")
    s.ingest_documents(docs)
    got = {r["body"]: r["doc_id"]
           for r in s.documents.read(spark).collect()}
    assert got["a"] == "doc-keep"
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}"
        r"-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")
    assert pat.match(got["b"]) and pat.match(got["c"])
    assert got["b"] != got["c"]
    # a frame with NO doc_id column at all also gets ids
    s2 = DocumentStore(spark, str(tmp_path / "store2"))
    s2.ingest_documents(
        spark.createDataFrame([("x",), ("y",)], "body string"))
    ids = [r["doc_id"] for r in s2.documents.read(spark).collect()]
    assert len(ids) == 2 and all(pat.match(i) for i in ids)
    assert len(set(ids)) == 2


def test_delete_documents_is_file_granular(spark, store):
    """S8 via delete_where: the delete snapshot's manifest must record a
    copy-on-write rewrite (op='delete' with file accounting), not a full
    table overwrite."""
    sid = store.delete_documents(["doc-000003"])
    entry = next(s for s in store.documents.history()
                 if s.snapshot_id == sid)
    assert entry.op == "delete"
    assert entry.meta["files_rewritten"] >= 1
    assert store.get_document("doc-000003").count() == 0
