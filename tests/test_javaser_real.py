"""Java serialization walker (operators/javaser_real.py): handle
accounting, superclass-first class data, JVM interop (committed
vector from java.io.ObjectOutputStream + live re-generation when a
JDK is present), gates, fuzz."""

import pathlib
import random
import shutil
import subprocess

import pytest

from cies_ocr_java_spark.operators.javaser_real import (
    build_javaser,
    parse_javaser,
)

_VEC = pathlib.Path(__file__).parent / "data" / "javaser_jvm_vector.bin"

_SUP = {"name": "Gen$Base", "uid": 42,
        "fields": [("I", "base_id", None)], "super": None}
_CLS = {"name": "Gen$Doc0", "uid": 1000,
        "fields": [("I", "count", None), ("J", "total", None),
                   ("L", "name", "Ljava/lang/String;")],
        "super": _SUP}
_OBJS = [(_CLS, {"base_id": 10, "count": 7, "total": 12345,
                 "name": "doc-0"}),
         (_CLS, {"base_id": 11, "count": 24, "total": 22345,
                 "name": "doc-1"}),
         (_CLS, {"base_id": 12, "count": 41, "total": 32345,
                 "name": "doc-0"})]

_JAVA_SRC = """
import java.io.*;
public class Gen {
    static class Base implements Serializable {
        private static final long serialVersionUID = 42L;
        int base_id;
        Base(int b) { base_id = b; }
    }
    static class Doc0 extends Base {
        private static final long serialVersionUID = 1000L;
        int count; long total; String name;
        Doc0(int b, int c, long t, String n)
            { super(b); count = c; total = t; name = n; }
    }
    public static void main(String[] a) throws Exception {
        ObjectOutputStream o = new ObjectOutputStream(
            new FileOutputStream(a[0]));
        o.writeObject(new Doc0(10, 7, 12345L, "doc-0"));
        o.writeObject(new Doc0(11, 24, 22345L, "doc-1"));
        o.writeObject(new Doc0(12, 41, 32345L, "doc-0"));
        o.close();
    }
}
"""


def test_builder_matches_committed_jvm_vector_byte_identical():
    assert build_javaser(_OBJS) == _VEC.read_bytes()


def test_parse_jvm_vector():
    r = parse_javaser(_VEC.read_bytes())
    assert r["error"] is None
    # 3 objects of Gen$Doc0 (super Gen$Base); strings are the
    # className1 descriptor + "doc-0" + "doc-1"; refs are 2 class
    # re-uses + 1 string re-use
    assert (r["n_objects"], r["n_classes"], r["n_strings"],
            r["n_refs"]) == (3, 2, 3, 3)
    assert r["int_sum"] == (10 + 11 + 12) + (7 + 24 + 41) \
        + (12345 + 22345 + 32345)
    assert r["max_fields"] == 4


@pytest.mark.skipif(shutil.which("javac") is None,
                    reason="no JDK in container")
def test_live_jvm_interop(tmp_path):
    src = tmp_path / "Gen.java"
    src.write_text(_JAVA_SRC)
    subprocess.run(["javac", "Gen.java"], cwd=tmp_path, check=True)
    out = tmp_path / "v.bin"
    subprocess.run(["java", "Gen", str(out)], cwd=tmp_path,
                   check=True)
    assert out.read_bytes() == build_javaser(_OBJS)


def test_handle_accounting_counts_classname1_strings():
    # two classes sharing the SAME field-type string: the second
    # class's className1 must be a TC_REFERENCE, not a new string
    c1 = {"name": "A", "uid": 1,
          "fields": [("L", "s", "Ljava/lang/String;")], "super": None}
    c2 = {"name": "B", "uid": 2,
          "fields": [("L", "t", "Ljava/lang/String;")], "super": None}
    r = parse_javaser(build_javaser([
        (c1, {"s": "x"}), (c2, {"t": "x"})]))
    assert r["error"] is None
    assert r["n_strings"] == 2  # one className1 + one value "x"
    assert r["n_refs"] == 2     # className1 reuse + value reuse


def test_null_string_field():
    c = {"name": "A", "uid": 1,
         "fields": [("I", "n", None), ("L", "s", "Ljava/lang/String;")],
         "super": None}
    r = parse_javaser(build_javaser([(c, {"n": 5, "s": None})]))
    assert r["error"] is None
    assert (r["n_strings"], r["int_sum"]) == (1, 5)


def test_gates():
    assert parse_javaser(build_javaser(_OBJS, bad_magic=True)) \
        ["error"] == "bad magic or version"
    assert parse_javaser(build_javaser(_OBJS, forward_ref=True)) \
        ["error"] == "reference to unallocated handle"
    assert parse_javaser(build_javaser(_OBJS, chop=5))["error"] \
        == "truncated stream"
    assert parse_javaser(None)["error"] == "short or missing payload"


def test_fuzz_never_raises():
    rng = random.Random(0x7E0000)
    base = build_javaser(_OBJS)
    for _ in range(500):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        assert "error" in parse_javaser(blob)
