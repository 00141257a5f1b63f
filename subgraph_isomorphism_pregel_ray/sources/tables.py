"""Readers for the driver-provided parquet tables (TESTDATA.md).

Always pass ``columns=`` — at 100 TB a read that loads every column for a
two-column transform is the first thing to get wrong.
"""

from __future__ import annotations

import os

__all__ = ["table_path", "read_table", "read_jsonl", "read_csv",
           "write_csv", "to_parquet_shards", "read_arrow_ipc",
           "write_arrow_ipc"]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(table_path(sf_dir, name), columns=columns)


def table_col_max(sf_dir: str, name: str, col: str):
    """Column max from the parquet FOOTER statistics — O(row groups), no
    data scan (the 100-TB path: key-width decisions must not cost a table
    pass). Falls back to a Ray full-column max when any row group lacks
    stats. Returns None for an empty table."""
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    try:
        md = pq.ParquetFile(path).metadata
        ci = md.schema.to_arrow_schema().get_field_index(col)
        mx = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                raise ValueError("row group without stats")
            mx = st.max if mx is None else max(mx, st.max)
        return mx
    except Exception:
        import ray.data as rd

        return rd.read_parquet(path, columns=[col]).max(col)


def read_jsonl(path: str, columns: list[str] | None = None):
    """Newline-delimited JSON source (the interchange format most raw
    web-scrape corpora arrive in before parquet conversion). A thin wrapper
    over ``ray.data.read_json`` — Ray splits by file and streams blocks, so
    a directory of ``.jsonl`` shards parallelizes like parquet. Column
    pruning happens AFTER parse (JSONL is row-major — there is nothing to
    push down), so convert to parquet once (``to_parquet_shards``) before
    iterating at scale.
    """
    import ray.data as rd

    ds = rd.read_json(path)
    return ds.select_columns(columns) if columns else ds


def to_parquet_shards(ds, out_dir: str, partition_col: str | None = None):
    """One-time JSONL→parquet conversion: columnar, prunable, resumable
    (hive-partitioned when ``partition_col`` is given — one directory per
    value, so re-runs and readers can skip finished/irrelevant shards)."""
    if partition_col is not None:
        ds.write_parquet(out_dir, partition_cols=[partition_col])
    else:
        ds.write_parquet(out_dir)
    return out_dir


def read_csv(path: str, columns: list[str] | None = None, **arrow_kwargs):
    """CSV source — the lowest-common-denominator interchange format. A
    thin wrapper over ``ray.data.read_csv`` (pyarrow's multithreaded CSV
    parser under the hood; a directory of shards parallelizes per file).
    Like JSONL, CSV is row-major: column pruning happens after parse, so
    convert long-lived data to parquet once (``to_parquet_shards``)."""
    import ray.data as rd

    ds = rd.read_csv(path, **arrow_kwargs)
    return ds.select_columns(columns) if columns else ds


def write_csv(ds, out_dir: str):
    """CSV sink via ``Dataset.write_csv`` — one shard per block (never one
    giant file), so the write parallelizes and downstream readers re-split
    for free. Round-trips with :func:`read_csv` for the scalar types the
    sf tables use (ints, floats, strings; timestamps survive as ISO text)."""
    ds.write_csv(out_dir)
    return out_dir


def read_arrow_ipc(path: str, columns: list[str] | None = None):
    """Arrow IPC / Feather-v2 source: a directory of ``.arrow`` shards (or
    one file) → Dataset, one read task per file. IPC is the zero-copy
    spill/interchange format between Arrow-native engines (what Flight
    and memory-mapped handoffs speak); unlike CSV/JSONL it is columnar,
    so ``columns=`` prunes at the FILE read (``pa.ipc`` reads only the
    requested columns' buffers), not after parse.

    Scale shape: built on ``ray.data.read_binary_files`` (per-file
    parallelism, streaming blocks) + a stateless per-file decode; each
    task holds one shard. Pair with :func:`write_arrow_ipc` for a
    round-trip that preserves Arrow types exactly (timestamps, binary,
    lists — no CSV/JSON lossiness)."""
    import ray.data as rd

    def _decode(t):
        import pyarrow as pa

        out = []
        for buf in t["bytes"].to_pylist():
            tbl = pa.ipc.open_file(pa.BufferReader(buf)).read_all()
            if columns:
                tbl = tbl.select(columns)
            out.append(tbl)
        return pa.concat_tables(out)

    return rd.read_binary_files(path, file_extensions=["arrow"]).map_batches(
        _decode, batch_format="pyarrow"
    )


def write_arrow_ipc(ds, out_dir: str) -> str:
    """Arrow IPC / Feather-v2 sink: one ``part-<hash>.arrow`` shard per
    block (never one giant file), content-hashed names with atomic
    rename publish — the same resumable/deterministic shard contract as
    ``stages/sink.py::write_jsonl``, but type-exact (binary, timestamp,
    list columns survive byte-for-byte). Round-trips with
    :func:`read_arrow_ipc` re-parallelizing per shard."""
    import os

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def _write(t: pa.Table) -> pa.Table:
        import hashlib

        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
        payload = sink.getvalue().to_pybytes()
        name = f"part-{hashlib.md5(payload).hexdigest()[:16]}.arrow"
        tmp = os.path.join(out_dir, "." + name)
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))  # atomic publish
        return pa.table({"rows_written": pa.array([t.num_rows])})

    n = 0
    for b in ds.map_batches(_write, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        n += int(b["rows_written"].to_numpy().sum())
    return out_dir
