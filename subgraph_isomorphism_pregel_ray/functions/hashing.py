"""Stable 64-bit hashing and partition assignment.

The reference partitions vertices with ``vID % num_workers`` chosen at parse
time and carries the worker id inside every key (``SItypes/SIKey.h:7-45``,
``pregel_app_subgraph.h:697``). Here vertex ids are themselves stable 64-bit
hashes of normalized urls, and the partition is a pure function of the id —
``part = vid % P`` — recomputable anywhere, so no routing info ever needs to
travel with the data.

``hash64`` uses pandas' SipHash-based ``hash_array`` with its fixed default
key, which is deterministic across processes and machines and vectorized in C
— the right tool for hashing millions of urls per batch. Content hashes for
dedup use md5 (hex) so the DuckDB oracle (`md5(text)`) reproduces them
byte-identically.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = [
    "hash64",
    "hash64_one",
    "part_for",
    "md5_hex",
    "md5_hex_batch",
    "md5_lower64",
]


def hash64(values) -> np.ndarray:
    """Vectorized stable 64-bit hash of an array of strings → uint64.

    Deterministic across processes (pandas uses a fixed SipHash key by
    default). Input may be a list, numpy object array, or pandas/pyarrow
    string column (anything ``np.asarray(..., dtype=object)`` accepts).
    """
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def hash64_one(value: str) -> int:
    """Scalar variant of :func:`hash64` (same bits)."""
    return int(hash64(np.array([value], dtype=object))[0])


def part_for(vids, num_parts: int) -> np.ndarray:
    """Partition assignment ``vid % P`` → int32.

    ``vids`` are uint64/int64 hashes (already uniform), so plain modulo is an
    adequate partitioner; it is re-derived wherever needed instead of being
    stored (unlike the reference's ``SIKey.wID``).
    """
    v = np.asarray(vids).astype(np.uint64, copy=False)
    return (v % np.uint64(num_parts)).astype(np.int32)


def md5_hex(text: str) -> str:
    """md5 hex digest of utf-8 text — matches DuckDB's ``md5(text)``."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def md5_hex_batch(values) -> np.ndarray:
    """Per-row md5 hex digests (md5 itself is C; the loop is cheap vs I/O)."""
    return np.array(
        [hashlib.md5(v.encode("utf-8")).hexdigest() for v in values], dtype=object
    )


def md5_lower64(values) -> np.ndarray:
    """64-bit hash = little-endian uint64 of md5-digest bytes 8..16 → uint64.

    Bit-identical to DuckDB 1.0's ``md5_number_lower(text)`` (verified:
    ``md5_number_lower('abc') = 8250560606382298838``), which is what makes
    the shingle/token/window hashes of the dedup and text-fingerprint
    operators SQL-oracle-checkable end to end. md5 is C (OpenSSL); the
    Python loop costs ~1 µs/item — linear, per-batch parallel, and only used
    where oracle reproducibility matters (``hash64`` remains the fast path
    for internal ids).
    """
    return np.array(
        [
            int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[8:], "little")
            for v in values
        ],
        dtype=np.uint64,
    )
