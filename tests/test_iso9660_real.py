"""ISO 9660 walker (operators/iso9660_real.py): tree round-trip, the
both-endian integrity gate, version-suffix stripping, cycle guard,
fuzz."""

import hashlib
import random
import struct

from cies_ocr_java_spark.operators.iso9660_real import (
    SECTOR,
    build_iso,
    parse_iso,
)


def _mk(i, **kw):
    nf = 1 + i % 3
    tree = {
        "README.TXT": (f"Readme for volume {i}\n" * nf).encode(),
        "DATA": {
            f"FILE{k}.TXT": "".join(
                f"{(i + k + j) % 97:02d}"
                for j in range(50 + ((i + k) % 5) * 150)).encode()
            for k in range(nf)
        },
    }
    return build_iso(f"VOL{i}", tree, **kw), tree


def test_tree_round_trip():
    for i in [0, 1, 2, 3, 7, 12]:
        iso, tree = _mk(i)
        rows, err = parse_iso(iso)
        assert err is None
        paths = {r["path"]: r for r in rows}
        r = paths["/README.TXT"]
        assert r["size"] == len(tree["README.TXT"])
        assert r["content_md5"] \
            == hashlib.md5(tree["README.TXT"]).hexdigest()
        assert paths["/DATA"]["is_dir"] == 1
        for name, content in tree["DATA"].items():
            f = paths[f"/DATA/{name}"]
            assert f["size"] == len(content)
            assert f["content_md5"] == hashlib.md5(content).hexdigest()
        assert rows[0]["volume_id"] == f"VOL{i}"


def test_version_suffix_stripped():
    iso, _ = _mk(2)
    rows, _ = parse_iso(iso)
    assert all(";" not in r["path"] for r in rows)


def test_both_endian_gate():
    """Only the BIG-endian size copy is inflated — a lazy LE-only
    reader would pass; the dual read must flag it."""
    iso, _ = _mk(3, bad_be_size_name="FILE0.TXT")
    assert parse_iso(iso)[1] == "both-endian mismatch in extent size"
    iso, _ = _mk(3, bad_pvd_magic=True)
    assert parse_iso(iso)[1] == "bad primary volume descriptor"


def test_directory_cycle_guard():
    """Repoint DATA's extent at the root directory's LBA: the walk
    must detect the cycle, not recurse forever."""
    iso, _ = _mk(1)
    rows, _ = parse_iso(iso)
    root_rec = iso[16 * SECTOR + 156:16 * SECTOR + 156 + 34]
    root_lba = struct.unpack_from("<I", root_rec, 2)[0]
    # find DATA's record inside the root directory sector and point
    # it back at the root
    buf = bytearray(iso)
    sec = root_lba * SECTOR
    pos = sec
    while buf[pos]:
        rlen, nlen = buf[pos], buf[pos + 32]
        name = bytes(buf[pos + 33:pos + 33 + nlen])
        if name == b"DATA":
            struct.pack_into("<I", buf, pos + 2, root_lba)
            struct.pack_into(">I", buf, pos + 6, root_lba)
            break
        pos += rlen
    rows, err = parse_iso(bytes(buf))
    assert err is not None and "cycle" in err


def test_fuzz_never_raises():
    rng = random.Random(13)
    base, _ = _mk(5)
    for _ in range(300):
        x = bytearray(base)
        for _ in range(rng.randrange(1, 8)):
            x[rng.randrange(len(x))] = rng.randrange(256)
        blob = (bytes(x[:rng.randrange(len(x) + 1)])
                if rng.random() < 0.3 else bytes(x))
        rows, err = parse_iso(blob)
        assert (rows is None) == (err is not None)
