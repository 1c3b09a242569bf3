"""Iceberg metadata walk (operators/iceberg_real.py): round-trip
identity, little-endian bound serialization, pruning math, the four
integrity gates, fuzz-never-raises."""

import random
import struct

from cies_ocr_java_spark.operators.iceberg_real import (
    build_iceberg_table,
    parse_iceberg_table,
)


def test_round_trip_identity_and_pruning():
    t = build_iceberg_table(
        [[(10, 30, 12), (35, 50, 7)], [(5, 15, 3)]], n_hist=1)
    r = parse_iceberg_table(t, 20, 40)
    assert r["error"] is None
    assert r["format_version"] == 2
    assert r["n_snapshots"] == 2          # 1 historical + current
    assert r["n_manifests"] == 2
    assert r["n_data_files"] == 3
    assert r["total_records"] == 22
    # [10,30] and [35,50] intersect [20,40]; [5,15] is pruned
    assert r["n_scanned"] == 2


def test_pruning_boundaries_are_inclusive():
    # upper == scan_lo and lower == scan_hi are both scans, not prunes
    t = build_iceberg_table([[(0, 20, 1), (40, 60, 1), (61, 70, 1)]])
    assert parse_iceberg_table(t, 20, 40)["n_scanned"] == 2


def test_bounds_are_little_endian_per_iceberg_spec(monkeypatch):
    """Iceberg single-value serialization (spec Appendix D): long
    bounds are 8-byte LITTLE-endian. A builder/reader pair that agreed
    on big-endian would round-trip identically — so build one table
    with a big-endian bound writer and prove the reader decodes those
    bytes as the (giant) little-endian value, while the honest table
    prunes by the true bounds."""
    import cies_ocr_java_spark.operators.iceberg_real as ir

    honest = build_iceberg_table([[(1, 2, 5)]])
    monkeypatch.setattr(ir, "_le_long",
                        lambda v: struct.pack(">q", v))
    swapped = build_iceberg_table([[(1, 2, 5)]])
    monkeypatch.undo()
    # honest [1,2]: scanned at [1,5], pruned at [2**56, 2**56]
    assert parse_iceberg_table(honest, 1, 5)["n_scanned"] == 1
    assert parse_iceberg_table(honest, 1 << 56, 1 << 56)["n_scanned"] == 0
    # BE-written bytes read little-endian become [2**56, 2**57]
    assert parse_iceberg_table(swapped, 1, 5)["n_scanned"] == 0
    assert parse_iceberg_table(swapped, 1 << 56, 1 << 56)["n_scanned"] == 1


def test_integrity_gates():
    base = [[(0, 5, 2), (6, 9, 4)]]
    assert parse_iceberg_table(
        build_iceberg_table(base, bad_manifest_length=True), 0, 9
    )["error"] == "manifest length mismatch"
    assert parse_iceberg_table(
        build_iceberg_table(base, bad_sync=True), 0, 9
    )["error"] == "sync marker mismatch"
    assert parse_iceberg_table(
        build_iceberg_table(base, bad_current=True), 0, 9
    )["error"] == "current snapshot not found"
    assert parse_iceberg_table(None, 0, 9)["error"] \
        == "short or missing payload"


def test_count_accounting_gates():
    """added_rows_count in the manifest list must match the rows the
    manifest's entries actually carry (the list is derived metadata the
    planner trusts — disagreement means a torn commit)."""
    t = build_iceberg_table([[(0, 5, 2)]], bad_row_count=True)
    assert parse_iceberg_table(t, 0, 9)["error"] \
        == "manifest count mismatch"


def test_fuzz_never_raises():
    rng = random.Random(4242)
    t = build_iceberg_table([[(10, 30, 12)], [(5, 15, 3)]], n_hist=1)
    for _ in range(300):
        x = bytearray(t)
        for _ in range(rng.randrange(1, 6)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        r = parse_iceberg_table(blob, 0, 100)
        assert "error" in r
