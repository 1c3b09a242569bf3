"""Row-level DELETE (SnapshotTable.delete_where) and takedown
propagation across derived tables — the reference's DELETE verb
(DocumentExtractManager.java:233-265) with snapshot semantics.

Pins the file-granular copy-on-write contract: unaffected data dirs
stay referenced unchanged, untouched files inside affected dirs are
HARDLINKED (same inode) into the replacement dir, only files containing
matches are rewritten, and pre-delete snapshots still read the deleted
rows (audit/time travel) until expire_snapshots reclaims them.
"""

import os

import pytest
from pyspark.sql import functions as F

from cies_ocr_java_spark.sources.snapshots import SnapshotTable
from cies_ocr_java_spark.sources.takedown import takedown_docs


def test_delete_where_row_semantics_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(spark.createDataFrame(
        [(1, "keep"), (2, "drop"), (3, None), (4, "drop")],
        "id int, v string"))
    sid = t.delete_where(spark, F.col("v") == "drop")
    assert sid == 2
    # NULL predicate rows are KEPT (SQL DELETE three-valued semantics)
    assert sorted(r["id"] for r in t.read(spark).collect()) == [1, 3]
    # pre-delete snapshot intact
    assert sorted(r["id"] for r in
                  t.read(spark, snapshot_id=1).collect()) == [1, 2, 3, 4]


def test_delete_where_noop_commits_nothing(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1,), (2,)], "id int"))
    assert t.delete_where(spark, "id > 100") == 1
    assert t.current_snapshot_id() == 1


def test_delete_where_empty_table_raises(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    with pytest.raises(KeyError):
        t.delete_where(spark, "id = 1")


def test_delete_is_file_granular_copy_on_write(spark, tmp_path):
    """Three append snapshots -> three data dirs. Deleting rows that
    live only in dir 2 must (a) keep dirs 1 and 3 referenced unchanged,
    (b) hardlink dir 2's untouched files, (c) rewrite only the files
    that contain matches."""
    t = SnapshotTable(str(tmp_path / "t"))
    for lo in (0, 100, 200):
        df = spark.createDataFrame(
            [(lo + i,) for i in range(10)], "id int").repartition(2)
        t.commit(df, mode="append")
    pre_dirs = {d: set(SnapshotTable._parquet_files(
        os.path.join(t.data_root, d)))
        for d in ("snap-000001", "snap-000002", "snap-000003")}
    sid = t.delete_where(spark, "id >= 105 AND id < 110")
    log_entry = next(s for s in t.history() if s.snapshot_id == sid)
    assert log_entry.op == "delete"
    # dirs 1 and 3 referenced as-is; dir 2 replaced by the new dir
    assert "snap-000001" in log_entry.data_dirs
    assert "snap-000003" in log_entry.data_dirs
    assert "snap-000002" not in log_entry.data_dirs
    new_rel = log_entry.data_dirs[-1]
    assert log_entry.meta["dirs_kept"] == 2
    # untouched files of dir 2 are hardlinks, not copies
    new_files = SnapshotTable._parquet_files(
        os.path.join(t.data_root, new_rel))
    src_inodes = {os.stat(f).st_ino: f for f in pre_dirs["snap-000002"]}
    linked = [f for f in new_files if os.stat(f).st_ino in src_inodes]
    rewritten = [f for f in new_files
                 if os.stat(f).st_ino not in src_inodes]
    assert log_entry.meta["files_linked"] == len(linked)
    assert log_entry.meta["files_rewritten"] >= 1
    assert rewritten, "matching files must be rewritten, not linked"
    # row-level result exact
    got = sorted(r["id"] for r in t.read(spark).collect())
    assert got == (list(range(10)) + list(range(100, 105))
                   + list(range(200, 210)))
    # dir-2 originals untouched on disk (time travel reads them)
    assert sorted(r["id"] for r in
                  t.read(spark, snapshot_id=2).collect()) \
        == sorted(list(range(10)) + list(range(100, 110)))


def test_delete_where_preserves_hive_partitioning(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id int, b int")
    t.commit(df, partition_by=["b"])
    sid = t.delete_where(spark, "id % 5 = 0")
    assert t.current_partitioning() == ["b"]
    entry = next(s for s in t.history() if s.snapshot_id == sid)
    new_dir = os.path.join(t.data_root, entry.data_dirs[-1])
    assert any(d.startswith("b=") for d in os.listdir(new_dir)), \
        "hive layout must survive the rewrite"
    got = t.read(spark)
    # b=1 ids: 1,4,...,28 (ten); deleted among them: 10 and 25
    assert got.filter("b = 1").count() == 8
    assert sorted(r["id"] for r in got.collect()) \
        == [i for i in range(30) if i % 5]


def test_takedown_propagates_to_derived_and_pair_tables(spark, tmp_path):
    docs = SnapshotTable(str(tmp_path / "documents"))
    spans = SnapshotTable(str(tmp_path / "spans"))
    state = SnapshotTable(str(tmp_path / "state"))
    pairs = SnapshotTable(str(tmp_path / "pairs"))
    d = spark.createDataFrame([(i, f"body{i}") for i in range(20)],
                              "doc_id int, body string")
    docs.commit(d)
    spans.commit(d.selectExpr(
        "doc_id", "explode(sequence(0, doc_id % 3)) AS span_idx"))
    state.commit(d.selectExpr("doc_id", "'SUCCEEDED' AS status"))
    pairs.commit(spark.createDataFrame(
        [(i, i + 1) for i in range(0, 19, 2)], "id_a int, id_b int"))
    report = takedown_docs(
        spark, [3, 4, 17],
        doc_tables={"documents": docs, "spans": spans, "state": state},
        pair_tables={"pairs": (pairs, "id_a", "id_b")},
    )
    assert report["documents"]["rows_deleted"] == 3
    assert report["spans"]["rows_deleted"] == (3 % 3 + 1) + (4 % 3 + 1) \
        + (17 % 3 + 1)
    assert report["state"]["rows_deleted"] == 3
    # pairs (2,3), (4,5), (16,17) reference a taken-down doc
    assert report["pairs"]["rows_deleted"] == 3
    for tbl, key_cols in [(docs, ["doc_id"]), (spans, ["doc_id"]),
                          (state, ["doc_id"])]:
        left = tbl.read(spark).filter(F.col("doc_id").isin([3, 4, 17]))
        assert left.count() == 0
    assert pairs.read(spark).filter(
        F.col("id_a").isin([3, 4, 17])
        | F.col("id_b").isin([3, 4, 17])).count() == 0
    # audit trail: pre-takedown snapshots still show the docs
    assert docs.read(spark, snapshot_id=1).filter(
        "doc_id = 17").count() == 1
    # physical reclaim: after retention, the deleted rows' files go away
    removed = docs.expire_snapshots(keep_last=1)
    assert removed, "expire must GC the pre-delete data dir"
    assert docs.read(spark).filter("doc_id = 17").count() == 0


def test_takedown_empty_ids_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        takedown_docs(spark, [])
