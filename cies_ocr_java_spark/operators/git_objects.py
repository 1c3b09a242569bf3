"""Git LOOSE OBJECTS: content addressing verified from first principles.

Exposed ``.git`` directories are a standing fixture of web crawls (the
classic security-crawl find), and the loose-object store is the
simplest real content-addressed format in the wild: an object is
``zlib(<type> SP <size> NUL <content>)`` and its NAME is the digest of
those UNCOMPRESSED envelope bytes (SHA-256 here —
git's ``--object-format=sha256`` repository format, 32-byte ids) —
identity and integrity in one rule, the same canonicity-is-identity discipline as
torrent_metainfo_decode's infohash.

Three object kinds in the subset:
  * ``blob`` — raw file bytes;
  * ``tree`` — sorted entries ``<octal mode> SP <name> NUL <32-byte
    binary sha>`` (names MUST be sorted; git sorts trees, and an
    unsorted tree is corrupt);
  * ``commit`` — a text envelope (``tree <hex>``, ``parent <hex>``*,
    ``author``/``committer`` lines, blank line, message).

The reader inflates, re-verifies the declared size AND the digest
against the expected object id, walks tree entries with the sort
gate, and resolves a commit's tree/parent references. Error rows,
never exceptions."""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["pack_loose", "parse_loose", "build_tree", "build_commit",
           "extract_git_features", "GIT_FEATURES_SCHEMA"]


def pack_loose(otype: str, content: bytes) -> tuple[str, bytes]:
    """-> (object id hex, zlib loose bytes)."""
    env = b"%s %d\x00" % (otype.encode(), len(content)) + content
    return hashlib.sha256(env).hexdigest(), zlib.compress(env, 6)


def build_tree(entries: list[tuple[str, str, str]]) -> bytes:
    """(mode, name, sha_hex) -> canonical tree content (sorted by
    name, git's byte order)."""
    out = b""
    for mode, name, sha in sorted(entries, key=lambda e: e[1]):
        out += (mode.encode() + b" " + name.encode() + b"\x00"
                + bytes.fromhex(sha))
    return out


def build_commit(tree_sha: str, parents: list[str], author: str,
                 message: str) -> bytes:
    lines = [f"tree {tree_sha}"]
    lines += [f"parent {p}" for p in parents]
    lines += [f"author {author} 1600000000 +0000",
              f"committer {author} 1600000000 +0000", "", message]
    return "\n".join(lines).encode()


class _GitError(Exception):
    pass


def parse_loose(data: bytes | None, expect_id: str | None = None) -> dict:
    """-> {otype, size, oid, verified, tree_entries, tree_names,
    commit_tree, n_parents, error}. ``verified`` is 1 iff the digest of
    the inflated envelope equals ``expect_id`` (when given)."""
    none = {"otype": None, "size": None, "oid": None, "verified": None,
            "tree_entries": None, "tree_names": None,
            "commit_tree": None, "n_parents": None}
    if data is None or len(data) < 8:
        return {**none, "error": "short or missing payload"}
    try:
        try:
            env = zlib.decompress(bytes(data))
        except zlib.error as e:
            raise _GitError(f"inflate failed: {e}") from None
        nul = env.find(b"\x00")
        sp = env.find(b" ")
        if sp < 0 or nul < 0 or sp > nul:
            raise _GitError("malformed object header")
        otype = env[:sp].decode("latin-1")
        if otype not in ("blob", "tree", "commit", "tag"):
            raise _GitError(f"unknown object type {otype!r}")
        try:
            size = int(env[sp + 1:nul])
        except ValueError:
            raise _GitError("malformed object header") from None
        content = env[nul + 1:]
        if len(content) != size:
            raise _GitError("declared size mismatch")
        oid = hashlib.sha256(env).hexdigest()
        verified = None
        if expect_id is not None:
            verified = int(oid == expect_id)
        tree_entries = tree_names = None
        commit_tree = None
        n_parents = None
        if otype == "tree":
            names = []
            p = 0
            prev = None
            while p < len(content):
                z = content.find(b"\x00", p)
                if z < 0 or z + 33 > len(content):
                    raise _GitError("truncated tree entry")
                head = content[p:z]
                sp2 = head.find(b" ")
                if sp2 < 1:
                    raise _GitError("malformed tree entry")
                mode = head[:sp2]
                if not mode.isdigit() or mode[:1] == b"0" and mode != b"0":
                    # git modes: 100644/100755/40000/120000 — no leading
                    # zero except the bare '0' never occurs
                    raise _GitError("bad tree mode")
                name = head[sp2 + 1:]
                if prev is not None and name <= prev:
                    raise _GitError("unsorted tree")
                prev = name
                names.append(name.decode("utf-8", "replace"))
                p = z + 33
            tree_entries = len(names)
            tree_names = "|".join(names)
        elif otype == "commit":
            lines = content.decode("utf-8").split("\n")
            if not lines or not lines[0].startswith("tree "):
                raise _GitError("commit missing tree")
            commit_tree = lines[0][5:]
            if len(commit_tree) != 64:
                raise _GitError("bad tree reference")
            n_parents = sum(1 for ln in lines[1:]
                            if ln.startswith("parent "))
        return {"otype": otype, "size": size, "oid": oid,
                "verified": verified, "tree_entries": tree_entries,
                "tree_names": tree_names, "commit_tree": commit_tree,
                "n_parents": n_parents, "error": None}
    except (_GitError, UnicodeDecodeError) as e:
        if isinstance(e, UnicodeDecodeError):
            return {**none, "error": "non-utf8 commit"}
        return {**none, "error": str(e)}


GIT_FEATURES_SCHEMA = (
    "doc_id long, otype string, size bigint, oid string, verified int, "
    "tree_entries int, tree_names string, commit_tree string, "
    "n_parents int, error string"
)


def extract_git_features(df: DataFrame, content_col: str = "content",
                         expect_col: str = "expect_id",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, content:binary, expect_id) -> object rows."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_loose(b, e)
                    for b, e in zip(pdf[content_col], pdf[expect_col])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "otype": [r["otype"] for r in rows],
                    "size": pd.array(
                        [r["size"] for r in rows], dtype="Int64"),
                    "oid": [r["oid"] for r in rows],
                    "verified": pd.array(
                        [r["verified"] for r in rows], dtype="Int32"),
                    "tree_entries": pd.array(
                        [r["tree_entries"] for r in rows], dtype="Int32"),
                    "tree_names": [r["tree_names"] for r in rows],
                    "commit_tree": [r["commit_tree"] for r in rows],
                    "n_parents": pd.array(
                        [r["n_parents"] for r in rows], dtype="Int32"),
                    "error": [r["error"] for r in rows],
                }
            )

    return df.select(id_col, content_col, expect_col).mapInPandas(
        op, GIT_FEATURES_SCHEMA
    )
