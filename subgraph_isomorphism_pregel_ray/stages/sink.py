"""Resumable partitioned parquet sink.

The reference's result dump is a stub (``pregel_app_subgraph.h:716-747``,
disabled); this is the production-shaped replacement the 100 TB deployment
needs: output is laid out one hive directory per shard-key value, each
directory sealed with a ``_SUCCESS`` marker after its rows are fully
written, so a failed/re-run job SKIPS sealed shards at the read stage —
the write stream only ever carries unfinished shards. Never one giant file.

Assumes the output directory is on storage every node sees (object store /
NFS / local fs in this sandbox) — the same assumption any checkpointing
sink makes. The skip set is read once on the driver and broadcast into the
filter via closure (it is a set of key values, not data).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa

__all__ = ["write_parquet_resumable", "sealed_shards", "write_jsonl"]

_MARKER = "_SUCCESS"

# shard keys must round-trip identically through a hive directory name:
# integers and plain strings do; anything the writer percent-encodes
# (spaces, '=', '/', …) or formats differently (floats, timestamps) would
# make the sealed-set compare miss and re-write sealed shards
_SAFE_KEY = __import__("re").compile(r"^[A-Za-z0-9_.\-]+$")


def _check_keys(keys) -> None:
    bad = [k for k in keys if not _SAFE_KEY.match(k)]
    if bad:
        raise ValueError(
            f"shard keys not hive-safe (would break resume matching): {bad[:5]!r} "
            "— use integer or [A-Za-z0-9_.-] string shard columns"
        )


def sealed_shards(out_dir: str, shard_col: str) -> set:
    """Shard-key values whose hive directory is sealed with a marker."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    prefix = f"{shard_col}="
    for name in os.listdir(out_dir):
        if name.startswith(prefix) and os.path.exists(
            os.path.join(out_dir, name, _MARKER)
        ):
            done.add(name[len(prefix):])
    return done


def write_parquet_resumable(ds, out_dir: str, shard_col: str) -> dict:
    """Write ``ds`` hive-partitioned by ``shard_col``, skipping shards that
    already finished in a previous run; seal every newly-written shard.

    Returns {"skipped": n_sealed_before, "written": n_sealed_now}.

    The filter is a vectorized ``np.isin`` against the (small) sealed-key
    set inside ``map_batches`` — whole blocks of finished shards are
    dropped before they reach the write operator, so a 99%-done restart
    re-ships ~1% of the data.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = sealed_shards(out_dir, shard_col)

    # a crashed run may have left PARTIAL files in unsealed shard dirs;
    # re-writing would append uniquely-named new files NEXT TO the stale
    # ones and then seal duplicated rows — clear unsealed dirs first
    prefix = f"{shard_col}="
    for name in os.listdir(out_dir):
        d = os.path.join(out_dir, name)
        if (
            name.startswith(prefix)
            and os.path.isdir(d)
            and not os.path.exists(os.path.join(d, _MARKER))
        ):
            shutil.rmtree(d)

    out = ds
    if done:
        # match against the string form of the key — hive dir names are
        # strings regardless of the column's arrow type
        # object dtype on BOTH sides: a fixed-width unicode dtype taken from
        # the done set would silently truncate longer new keys into false
        # matches (e.g. new "123" truncated to sealed "12" → row dropped)
        done_arr = np.array(sorted(done), dtype=object)

        def _drop_done(t: pa.Table) -> pa.Table:
            keys = np.array(
                [str(v) for v in t[shard_col].to_pylist()], dtype=object
            )
            _check_keys(np.unique(keys))
            return t.filter(pa.array(~np.isin(keys, done_arr)))

        out = ds.map_batches(_drop_done, batch_format="pyarrow")

    out.write_parquet(out_dir, partition_cols=[shard_col])

    written = 0
    # first-run guard (no done set → _drop_done never vetted the keys):
    # percent-encoded dir names would never match a later str() compare
    _check_keys(
        name[len(prefix):]
        for name in os.listdir(out_dir)
        if name.startswith(prefix) and os.path.isdir(os.path.join(out_dir, name))
    )
    for name in os.listdir(out_dir):
        d = os.path.join(out_dir, name)
        if name.startswith(prefix) and not os.path.exists(os.path.join(d, _MARKER)):
            with open(os.path.join(d, _MARKER), "w"):
                pass
            written += 1
    return {"skipped": len(done), "written": written}


def write_jsonl(ds, out_dir: str) -> int:
    """Streaming JSONL sink — the interchange format most training-data
    tooling reads: one ``part-<block>.jsonl`` file per input block under
    ``out_dir`` (never one giant file), rows serialized with sorted keys
    and NaN-free JSON. Shard names are content-hashed, so when the block
    split is stable the directory is byte-identical across runs (a rerun
    overwrites each shard with the same bytes); distinct blocks with
    identical content get ``-1``/``-2`` suffixes rather than silently
    coalescing. Returns the number of rows written.

    Scale shape: pure per-block ``map_batches`` — each task serializes and
    writes only its block (the driver sees one count per block), mirroring
    ``read_jsonl``'s shard-per-file contract so a round-trip re-parallelizes
    identically."""
    import json
    import os
    import time

    os.makedirs(out_dir, exist_ok=True)
    # worker-clock skew tolerance: a shard stamped within 60 s before this
    # run started still counts as "this run" (suffix, don't overwrite)
    run_start = time.time() - 60.0

    def _write(t: pa.Table) -> pa.Table:
        import hashlib
        import os

        rows = t.to_pylist()
        payload = "".join(
            json.dumps(r, sort_keys=True, allow_nan=False, default=str) + "\n"
            for r in rows
        ).encode("utf-8")
        stem = f"part-{hashlib.md5(payload).hexdigest()[:16]}"
        name = f"{stem}.jsonl"
        k = 0
        while os.path.exists(os.path.join(out_dir, name)):
            # an existing shard predating this run is a previous run's
            # copy of the same bytes → idempotent overwrite; one written
            # DURING this run is a distinct block with identical content
            # (or an astronomically unlikely hash collision) and must not
            # coalesce → suffix it
            if os.path.getmtime(os.path.join(out_dir, name)) < run_start:
                break
            k += 1
            name = f"{stem}-{k}.jsonl"
        tmp = os.path.join(out_dir, "." + name)
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))  # atomic publish
        return pa.table({"n": np.array([len(rows)], np.int64)})

    counts = ds.map_batches(_write, batch_format="pyarrow").to_pandas()
    return int(counts["n"].sum())
