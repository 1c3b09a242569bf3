"""Fixed-width binary token shards (.bin + .idx.json) as a Spark 4
Python DataSource — the Megatron-style format a pretraining loader
actually mmaps, produced and re-read by Spark.

Layout: a shard is raw little-endian uint32 tokens, EXACTLY
``record_len`` tokens per record, records concatenated — no header, no
delimiters (that is what makes loader-side mmap + pointer arithmetic
possible). The sidecar ``<shard>.idx.json`` carries
``{"record_len": R, "n_records": N, "dtype": "uint32"}`` so a reader
never infers geometry from file size alone (a size that is not a
multiple of 4*R is a truncated write and must FAIL, not round down).

    spark.dataSource.register(TokenBinDataSource)
    df = spark.read.format("token_bin").load("/data/shards")
    # schema: shard string, rec_idx bigint, tokens array<bigint>
    # (bigint, not int: the on-disk dtype is uint32 and tokens in
    # [2^31, 2^32) are legal — an int32 read schema would round-trip
    # them as silently negative values, the exact silent corruption
    # this format's fail-loud contract forbids)

Scale design (same rules as warc_gz.py, the sibling DataSource):

* one InputPartition per shard — the shard is the loader's parallelism
  unit too, so Spark-side parallelism mirrors training-side sharding;
* Arrow RecordBatch hand-off with numpy frombuffer/reshape — the token
  matrix never exists as Python objects;
* bounded memory: records stream in ``_BATCH_RECORDS`` slabs.

Writer: ``write_token_shards(df, out_dir, record_len)`` writes one
shard per input partition via ``mapInPandas`` (imperative binary IO is
exactly the narrow case the per-partition escape hatch exists for) and
returns the manifest; repartition/sort upstream to control shard count
and record order. Tokens must fit uint32; record arrays must be exactly
``record_len`` long (the packer's contract — corpus_pack_sequences
produces exactly this shape).
"""

from __future__ import annotations

import glob as _glob
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

TOKEN_BIN_SCHEMA = "shard string, rec_idx bigint, tokens array<bigint>"

_BATCH_RECORDS = 4096
_DTYPE = "uint32"


def write_token_shards(df: DataFrame, out_dir: str, record_len: int,
                       prefix: str = "shard") -> list[dict]:
    """Write (seq_id, tokens) rows as fixed-width binary shards, one
    shard per input partition (named by partition id — deterministic
    under a deterministic upstream partitioning). Returns the manifest
    [{path, n_records}]. Rows whose token array is not exactly
    ``record_len`` long fail the task loudly — padding/packing is the
    upstream packer's job, and silently truncating a training record
    is the worst possible default."""
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    os.makedirs(out_dir, exist_ok=True)

    def _write(iterator):
        import numpy as np
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}-{pid:05d}.bin")
        n = 0
        with open(path + ".tmp", "wb") as f:
            for pdf in iterator:
                for toks in pdf["tokens"]:
                    arr = np.asarray(toks, dtype="int64")
                    if arr.shape[0] != record_len:
                        raise ValueError(
                            f"token_bin: record of {arr.shape[0]} tokens, "
                            f"expected exactly {record_len}"
                        )
                    if arr.min(initial=0) < 0 or arr.max(initial=0) >= 2**32:
                        raise ValueError("token_bin: token out of uint32 range")
                    f.write(arr.astype("<u4").tobytes())
                    n += 1
        if n == 0:
            os.remove(path + ".tmp")
            yield pd.DataFrame({"path": [], "n_records": []})
            return
        with open(path + ".idx.json.tmp", "w") as f:
            json.dump(
                {"record_len": record_len, "n_records": n, "dtype": _DTYPE}, f
            )
        # data before index: a visible .idx.json implies a complete .bin
        os.rename(path + ".tmp", path)
        os.rename(path + ".idx.json.tmp", path + ".idx.json")
        yield pd.DataFrame({"path": [path], "n_records": [n]})

    manifest = (
        df.select("tokens")
        .mapInPandas(_write, "path string, n_records long")
        .collect()
    )
    return [
        {"path": r["path"], "n_records": int(r["n_records"])} for r in manifest
    ]


def _list_shards(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.bin")))
    if _glob.has_magic(path):
        return sorted(_glob.glob(path))
    return [path] if os.path.exists(path) else []


def _read_shard(path: str):
    import numpy as np
    import pyarrow as pa

    idx_path = path + ".idx.json"
    if not os.path.exists(idx_path):
        raise FileNotFoundError(
            f"token_bin: missing sidecar {idx_path!r} — shard incomplete "
            "or not produced by write_token_shards"
        )
    with open(idx_path) as f:
        idx = json.load(f)
    r, n, dtype = idx["record_len"], idx["n_records"], idx["dtype"]
    if dtype != _DTYPE:
        raise ValueError(f"token_bin: unsupported dtype {dtype!r}")
    expect = 4 * r * n
    actual = os.path.getsize(path)
    if actual != expect:
        raise EOFError(
            f"token_bin: {path!r} is {actual} bytes, sidecar implies "
            f"{expect} — truncated or corrupt; refusing to round down"
        )
    shard = os.path.basename(path)
    with open(path, "rb") as f:
        rec0 = 0
        while rec0 < n:
            take = min(_BATCH_RECORDS, n - rec0)
            buf = f.read(4 * r * take)
            # uint32 -> int64: lossless for the whole on-disk range
            # (tokens in [2^31, 2^32) must NOT wrap negative)
            mat = np.frombuffer(buf, dtype="<u4").reshape(take, r).astype(
                "int64"
            )
            flat = pa.array(mat.ravel(), type=pa.int64())
            toks = pa.ListArray.from_arrays(
                pa.array(range(0, (take + 1) * r, r), type=pa.int32()), flat
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([shard] * take, type=pa.string()),
                    pa.array(range(rec0, rec0 + take), type=pa.int64()),
                    toks,
                ],
                names=["shard", "rec_idx", "tokens"],
            )
            rec0 += take


class _TokenBinReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("token_bin: .load(path) is required")
        self._path = path

    def partitions(self):
        files = _list_shards(self._path)
        if not files:
            raise FileNotFoundError(f"token_bin: no shards match {self._path!r}")
        return [InputPartition(f) for f in files]

    def read(self, partition):
        yield from _read_shard(partition.value)


class TokenBinDataSource(DataSource):
    @classmethod
    def name(cls):
        return "token_bin"

    def schema(self):
        return TOKEN_BIN_SCHEMA

    def reader(self, schema):
        return _TokenBinReader(self.options)
