"""Distributed sort with global ordinal — the TeraSort analogue.

The reference ships a standalone TeraSort (``utils/TeraSort.h:37-343``):
sample 1% → range-partition → local sort → exclusive prefix-sum of partition
sizes → global ordinal. Ray Data's ``Dataset.sort`` already does the
sample/range/local-sort part; the ordinal is the same two-phase trick
(``TeraSort.h:244-283``): count rows per sorted block, exclusive-scan on the
driver (P scalars, not data), then add the block's base offset in a second
vectorized pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["sort_with_ordinal", "sort_with_prefix_sum"]


def sort_with_ordinal(ds, key, descending=False, ordinal_col: str = "ordinal"):
    """→ Dataset sorted by ``key`` with a global 0-based ``ordinal`` column.

    ``key``/``descending`` accept a single column or a list (passed straight
    to ``Dataset.sort``); use a tie-breaking key list when the ordinal must
    be deterministic (``TeraSort.h`` sorts unique 10-byte keys, so a single
    column suffices there).
    """
    import ray

    sorted_ds = ds.sort(key, descending=descending)
    # phase 1: per-block row counts (metadata-sized driver traffic)
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_num_rows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    # phase 2: stamp ordinals per block
    stamped = [_stamp.remote(r, int(off), ordinal_col) for r, off in zip(refs, offsets)]
    import ray.data as rd

    return rd.from_arrow_refs(stamped)


import ray


@ray.remote
def _num_rows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _stamp(tbl: pa.Table, offset: int, col: str) -> pa.Table:
    return tbl.append_column(
        col, pa.array(np.arange(offset, offset + tbl.num_rows, dtype=np.int64))
    )


def sort_with_prefix_sum(
    ds, key, value_col: str, out_col: str = "prefix", descending=False
):
    """→ Dataset sorted by ``key`` with an EXCLUSIVE global prefix sum of
    ``value_col`` (the value-generalized form of ``sort_with_ordinal`` —
    the reference's prefix-sum aggregator, ``TeraSort.h:244-283``, over an
    arbitrary int column instead of the constant 1).

    Same two-phase shape: per-block column sums (P scalars to the driver),
    exclusive scan, then one vectorized stamping pass per block. The first
    row's prefix is 0; row i's prefix is the sum of all earlier rows'
    values in global ``key`` order.
    """
    sorted_ds = ds.sort(key, descending=descending)
    refs = sorted_ds.to_arrow_refs()
    sums = ray.get([_col_sum.remote(r, value_col) for r in refs])
    bases = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)
    stamped = [
        _stamp_prefix.remote(r, int(b), value_col, out_col)
        for r, b in zip(refs, bases)
    ]
    import ray.data as rd

    return rd.from_arrow_refs(stamped)


@ray.remote
def _col_sum(tbl: pa.Table, col: str) -> int:
    # zero-row upstream datasets can hand over schema-less empty blocks
    if col not in tbl.column_names or tbl.num_rows == 0:
        return 0
    return int(tbl[col].to_numpy().sum())


@ray.remote
def _stamp_prefix(tbl: pa.Table, base: int, col: str, out: str) -> pa.Table:
    if col not in tbl.column_names:  # schema-less empty block: passthrough
        return tbl
    v = tbl[col].to_numpy().astype(np.int64)
    prefix = base + np.cumsum(v) - v  # exclusive within the block
    return tbl.append_column(out, pa.array(prefix))
