"""Readers for the driver-provided parquet tables (TESTDATA.md).

Always pass ``columns=`` — at 100 TB a read that loads every column for a
two-column transform is the first thing to get wrong.
"""

from __future__ import annotations

import os

__all__ = ["table_path", "read_table", "read_jsonl", "read_csv",
           "write_csv", "to_parquet_shards"]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(table_path(sf_dir, name), columns=columns)


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
