"""Similarity search over an embedding column (``list<float>``).

* ``ann_topk`` — brute-force cosine top-k per query: the query matrix is
  broadcast ONCE via ``ray.put`` and every ``map_batches`` task scores its
  batch against it with one numpy matmul (never re-shipped per batch). This
  is the exact baseline; at 100 TB the corpus side streams in blocks and the
  per-block partial top-k is folded by a tiny groupby — implemented below as
  partial top-k per batch → global reduce (so driver memory is
  O(queries × k), not O(corpus)).
* ``ann_topk_ivf`` — IVF-style scale path: k-means-lite coarse centroids
  (sampled, fixed seed) assign each vector to a cell; queries probe the
  ``nprobe`` nearest cells only. Recall < 1 by construction; exactness only
  within probed cells (stated, not silent).

Deterministic tie-break everywhere: (-score, vec_id) — matches the SQL
oracle's ``ORDER BY cos DESC, vec_id``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["ann_topk", "ann_topk_ivf"]


def _norm_rows(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _topk_fold(parts: list, k: int) -> pa.Table:
    """Fold per-batch partial top-k tables into the global top-k per query."""
    import pandas as pd

    df = pd.concat(parts, ignore_index=True)
    df = df.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(df, preserve_index=False)


def ann_topk(emb_ds, query_ids: list[int], k: int = 5, include_self: bool = False):
    """→ Table(query_id, vec_id, cos, rank) — exact cosine top-k per query."""
    import ray

    qset = set(int(q) for q in query_ids)

    def _pick(batch: pa.Table) -> pa.Table:
        m = np.array([int(v) in qset for v in batch["vec_id"].to_numpy()])
        return batch.filter(pa.array(m))

    qtbl = emb_ds.map_batches(_pick, batch_format="pyarrow").to_pandas()
    qids = qtbl["vec_id"].to_numpy()
    Q = _norm_rows(np.stack(qtbl["embedding"].to_numpy()).astype(np.float64))
    qref = ray.put((qids, Q))

    def _score(batch: pa.Table) -> pa.Table:
        ids_q, Qn = ray.get(qref)
        vids = batch["vec_id"].to_numpy()
        M = _norm_rows(np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64))
        cos = Qn @ M.T  # (nq, nb)
        rows = []
        for qi, qid in enumerate(ids_q):
            c = cos[qi]
            mask = np.ones(len(vids), dtype=bool)
            if not include_self:
                mask &= vids != qid
            idx = np.nonzero(mask)[0]
            # partial top-k inside the batch (deterministic tie-break)
            order = np.lexsort((vids[idx], -np.round(c[idx], 12)))[:k]
            sel = idx[order]
            rows.append(
                pa.table(
                    {
                        "query_id": np.full(len(sel), qid, dtype=np.int64),
                        "vec_id": vids[sel].astype(np.int64),
                        "cos": np.round(c[sel], 6),
                    }
                )
            )
        return pa.concat_tables(rows) if rows else pa.table(
            {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "cos": pa.array([], pa.float64())}
        )

    parts = [
        b.to_pandas()
        for b in emb_ds.map_batches(_score, batch_format="pyarrow", batch_size=4096)
        .iter_batches(batch_format="pyarrow")
    ]
    return _topk_fold(parts, k)


def ann_topk_ivf(
    emb_ds,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 13,
    sample_n: int = 2048,
):
    """IVF-bucketed approximate top-k (see module doc). Same output schema."""
    import ray

    # coarse centroids from a deterministic sample (k-means-lite: one
    # assignment refinement pass — enough for bucketing, not for quality)
    sample = emb_ds.limit(sample_n).to_pandas()
    S = _norm_rows(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    cent = S[rng.choice(len(S), min(n_cells, len(S)), replace=False)]
    for _ in range(2):
        assign = (S @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = S[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    cref = ray.put(cent)

    qset = set(int(q) for q in query_ids)

    def _pick(batch: pa.Table) -> pa.Table:
        m = np.array([int(v) in qset for v in batch["vec_id"].to_numpy()])
        return batch.filter(pa.array(m))

    qtbl = emb_ds.map_batches(_pick, batch_format="pyarrow").to_pandas()
    qids = qtbl["vec_id"].to_numpy()
    Q = _norm_rows(np.stack(qtbl["embedding"].to_numpy()).astype(np.float64))
    probe = np.argsort(-(Q @ cent.T), axis=1)[:, :nprobe]  # cells per query
    qref = ray.put((qids, Q, probe))

    def _score(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        ids_q, Qn, probes = ray.get(qref)
        vids = batch["vec_id"].to_numpy()
        M = _norm_rows(np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64))
        cell = (M @ cents.T).argmax(axis=1)
        cos = Qn @ M.T
        rows = []
        for qi, qid in enumerate(ids_q):
            mask = np.isin(cell, probes[qi]) & (vids != qid)
            idx = np.nonzero(mask)[0]
            order = np.lexsort((vids[idx], -np.round(cos[qi][idx], 12)))[:k]
            sel = idx[order]
            rows.append(
                pa.table(
                    {
                        "query_id": np.full(len(sel), qid, dtype=np.int64),
                        "vec_id": vids[sel].astype(np.int64),
                        "cos": np.round(cos[qi][sel], 6),
                    }
                )
            )
        return pa.concat_tables(rows)

    parts = [
        b.to_pandas()
        for b in emb_ds.map_batches(_score, batch_format="pyarrow", batch_size=4096)
        .iter_batches(batch_format="pyarrow")
    ]
    return _topk_fold(parts, k)
