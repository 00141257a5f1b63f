"""Deterministic 10x scale-bump input for the sf1-class bench sample.

Replicates every /root/testdata/sf0.1 table R times (default 10) into
OUT_DIR with per-replica key offsets, giving an input with exactly R x the
rows and the SAME per-replica distributions — so every headline leg's ideal
cost is R x its sf0.1 cost, and the measured exponent separates the fixed
Ray-orchestration floor from the data-proportional work (VERDICT r4 item 3:
"turn the fixed-floor-amortizes argument into a measurement").

Replication rules (replica i in 0..R-1, i=0 is the original rows verbatim):
  * every entity key (partkey / orderkey / custkey / suppkey / event_id /
    user_id / doc_id / vec_id) shifts by i * OFF — the graph becomes R
    disjoint copies of the sf0.1 co-purchase graph (same degree
    distribution, R x vertices/edges), relational joins stay within-replica
    by construction;
  * timestamps are left as-is (R x the events per time bucket — linear
    work for sessionize / range-join / windows);
  * document text gets a deterministic replica salt token injected every
    SALT_EVERY words for i > 0 ("grb{i}w{k}"): near-dup legs (MinHash /
    SimHash / winnow 9-gram shingles) see ~9/SALT_EVERY of shingles broken
    per replica pair, pushing cross-replica Jaccard far below the dup
    thresholds — so dedup workloads scale linearly instead of exploding on
    R x exact copies (the honest 10x-corpus shape: more docs, not the same
    docs repeated);
  * p_size / labels / categorical columns are untouched, so label
    distributions (match queries) are identical per replica.

No external data, no randomness: byte-deterministic given (R, SALT_EVERY).
Usage:  python make_scale_bump.py [OUT_DIR] [R]     (defaults /tmp/graft_sf1 10)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
# Graph-side tables get 2^33 offsets — past 32 bits, deliberately exercising
# the wide-pair-key path (this is what caught the fixed-shift pack bug).
# Document / embedding / event ids stay under the engine's DOCUMENTED 32-bit
# pair-pack contract (the dedup span/winnow pair keys guard loudly on ≥2^32
# doc ids), so their replicas use a 2^24 offset instead.
OFF = 1 << 33
SMALL_OFF = 1 << 24
SALT_EVERY = 12  # one alien token per 12 words breaks ~9/12 of 9-gram shingles

KEY_COLS = {
    "customer": (OFF, ["c_custkey"]),
    "supplier": (OFF, ["s_suppkey"]),
    "part": (OFF, ["p_partkey"]),
    "orders": (OFF, ["o_orderkey", "o_custkey"]),
    "lineitem": (OFF, ["l_orderkey", "l_partkey", "l_suppkey"]),
    "events": (SMALL_OFF, ["event_id", "user_id"]),
    "documents": (SMALL_OFF, ["doc_id"]),
    "embeddings": (SMALL_OFF, ["vec_id"]),
    # region / nation are dimension tables: copied once, never replicated
}


def _salt_text(texts: list, i: int) -> pa.Array:
    out = []
    for k, t in enumerate(texts):
        if t is None:
            out.append(t)
            continue
        w = t.split(" ")
        salt = f"grb{i}w{k & 1023}"
        for p in range(SALT_EVERY, len(w) + 1, SALT_EVERY + 1):
            w.insert(p, salt)
        out.append(" ".join(w))
    return pa.array(out, pa.string())


def make(out_dir: str = "/tmp/graft_sf1", reps: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{out_dir}/{t}.parquet")
    for t, (off, keys) in KEY_COLS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        chunks = []
        for i in range(reps):
            tab = base
            for c in keys:
                col = tab[c].to_numpy() + np.int64(i) * off
                tab = tab.set_column(
                    tab.schema.get_field_index(c), tab.schema.field(c),
                    pa.array(col, tab.schema.field(c).type),
                )
            if t == "documents" and i > 0:
                ix = tab.schema.get_field_index("text")
                tab = tab.set_column(
                    ix, tab.schema.field(ix),
                    _salt_text(tab["text"].to_pylist(), i),
                )
            chunks.append(tab)
        big = pa.concat_tables(chunks)
        if t == "documents":  # n_chars must stay consistent with text
            ix = big.schema.get_field_index("n_chars")
            nch = pa.array(
                [len(x) if x is not None else 0
                 for x in big["text"].to_pylist()],
                pa.int64(),
            )
            big = big.set_column(ix, big.schema.field(ix), nch)
        pq.write_table(big, f"{out_dir}/{t}.parquet",
                       row_group_size=1 << 20)
        print(t, big.num_rows, "rows", flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    make(out, reps)
    print("wrote", out)
