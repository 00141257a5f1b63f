"""Readers for the driver-provided parquet tables (TESTDATA.md).

Always pass ``columns=`` — at 100 TB a read that loads every column for a
two-column transform is the first thing to get wrong.
"""

from __future__ import annotations

import os

__all__ = ["table_path", "read_table"]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(table_path(sf_dir, name), columns=columns)
