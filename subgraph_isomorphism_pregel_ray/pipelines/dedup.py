"""Deduplication operators for training-data pipelines.

* ``exact_dedup`` — md5 content hash → keep the min doc_id per hash. The
  content hash is md5 hex so the DuckDB oracle (``md5(text)``) reproduces it
  byte-identically. Pattern: vectorized hash in ``map_batches`` → groupby on
  the hash (the only shuffle) → first-per-group.
* ``minhash_lsh_pairs`` — near-dup candidate generation + exact verification:
  char-shingle → 128 minhash permutations → band to ``(band, bandhash)``
  buckets → groupby → within-bucket candidate pairs → exact n-gram Jaccard
  verify ≥ threshold. The shuffle moves only (band, hash, doc_id) triples,
  never text; verification re-reads only candidate docs' shingle sets.
* ``simhash`` near-dup — see ``textops.simhash64``; pairs within Hamming
  distance via banding the 64 bits into 8 bytes (same LSH machinery).
* ``embedding_dup_pairs`` — cosine near-dup over an embedding column;
  ``method="exact"`` (block × broadcast matrix, for oracle parity) or
  ``method="lsh"`` (random-hyperplane buckets then exact verify — the scale
  path: only same-bucket pairs are scored).

Scale notes: every candidate-pair step is bounded by bucket size; hot buckets
(boilerplate shingles) should be capped in production — we log-and-cap at
``max_bucket`` docs per bucket (dropping a bucket loses only near-universal
shingles, stated in the docstring rather than silently).
"""

from __future__ import annotations

import numpy as np

from ..functions.rounding import round_half_away
import pyarrow as pa

from ..functions.hashing import hash64, md5_hex_batch

__all__ = [
    "exact_dedup",
    "minhash_signature_batch",
    "minhash_lsh_pairs",
    "jaccard_ngrams",
    "embedding_dup_pairs",
    "dedup_groups",
]

_MERSENNE = np.uint64((1 << 61) - 1)


def exact_dedup(docs_ds):
    """→ Dataset(doc_id, content_hash): the kept (min-doc_id) row per hash."""

    def _hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "content_hash": md5_hex_batch(batch["text"].to_pylist()),
            }
        )

    from ray.data.aggregate import Min

    return (
        docs_ds.map_batches(_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id", "content_hash"])
    )


def _shingles(text: str, k: int) -> np.ndarray:
    """Distinct char k-gram hashes of a document."""
    if len(text) < k:
        arr = np.array([text], dtype=object)
    else:
        arr = np.array([text[i : i + k] for i in range(len(text) - k + 1)], dtype=object)
    return np.unique(hash64(arr))


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


def minhash_signature_batch(
    batch: pa.Table, k: int = 5, num_perm: int = 128, seed: int = 7
) -> pa.Table:
    """(doc_id, text) → (doc_id, sig: fixed list<uint64>[num_perm])."""
    a, b = _perm_params(num_perm, seed)
    sigs = np.empty((batch.num_rows, num_perm), dtype=np.uint64)
    for i, t in enumerate(batch["text"].to_pylist()):
        sh = _shingles(t, k)
        # (a*x + b) mod Mersenne61 — universal-ish hashing, vectorized
        vals = (sh[:, None] * a[None, :] + b[None, :]) % _MERSENNE
        sigs[i] = vals.min(axis=0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1)), num_perm
            ),
        }
    )


def jaccard_ngrams(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact char k-gram Jaccard (the verification kernel / test oracle)."""
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


def minhash_lsh_pairs(
    docs_ds,
    k: int = 5,
    num_perm: int = 128,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 7,
    max_bucket: int = 200,
):
    """→ Dataset(doc_a, doc_b, jaccard) of verified near-duplicate pairs.

    doc_a < doc_b; jaccard is the exact char-k-gram Jaccard (≥ threshold).
    """
    import ray
    import ray.data as rd

    rows_per_band = num_perm // bands

    sigs = docs_ds.map_batches(
        lambda t: minhash_signature_batch(t, k, num_perm, seed),
        batch_format="pyarrow",
    )

    def _bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = (
            np.asarray(batch["sig"].combine_chunks().flatten(), dtype=np.uint64)
            .reshape(n, num_perm)
        )
        doc = batch["doc_id"].to_numpy()
        out_doc = np.repeat(doc, bands)
        band_id = np.tile(np.arange(bands, dtype=np.int32), n)
        bh = np.empty((n, bands), dtype=np.uint64)
        for bi in range(bands):
            seg = sig[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            h = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):  # fold the band rows (order-dep.)
                h = h * np.uint64(1099511628211) + seg[:, c]
            bh[:, bi] = h
        return pa.table(
            {
                "doc_id": out_doc,
                "band": band_id,
                "bandhash": bh.reshape(-1).view(np.int64),
            }
        )

    buckets = sigs.map_batches(_bands, batch_format="pyarrow")

    # shuffle by (band, bandhash); emit candidate pairs within buckets
    def _pairs(group):
        import pandas as pd

        docs = np.sort(group["doc_id"].to_numpy())
        if len(docs) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        if len(docs) > max_bucket:  # hot-bucket cap (see module doc)
            docs = docs[:max_bucket]
        ia, ib = np.triu_indices(len(docs), 1)
        return pd.DataFrame({"doc_a": docs[ia], "doc_b": docs[ib]})

    cand = (
        buckets.groupby(["band", "bandhash"])
        .map_groups(_pairs, batch_format="pandas")
    )
    cand_tbl = cand.to_pandas()
    if len(cand_tbl) == 0:
        return rd.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
        )
    cand_tbl = cand_tbl.drop_duplicates().reset_index(drop=True)

    # exact verification: broadcast candidate docs' texts (only candidates!)
    need = np.unique(np.concatenate([cand_tbl["doc_a"], cand_tbl["doc_b"]]))
    need_set = set(need.tolist())

    def _texts(batch: pa.Table) -> pa.Table:
        m = np.array([d in need_set for d in batch["doc_id"].to_numpy()])
        return batch.filter(pa.array(m)).select(["doc_id", "text"])

    texts = docs_ds.map_batches(_texts, batch_format="pyarrow").to_pandas()
    text_ref = ray.put(dict(zip(texts["doc_id"], texts["text"])))

    def _verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(text_ref)
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        jac = np.array(
            [jaccard_ngrams(lookup[x], lookup[y], k) for x, y in zip(a, b)]
        )
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": a[keep].astype(np.int64),
                "doc_b": b[keep].astype(np.int64),
                "jaccard": round_half_away(jac[keep], 6),
            }
        )

    return rd.from_pandas(cand_tbl).map_batches(_verify, batch_format="pyarrow")


def embedding_dup_pairs(
    emb_ds,
    threshold: float = 0.9,
    method: str = "exact",
    num_planes: int = 12,
    seed: int = 11,
):
    """→ Dataset(vec_a, vec_b, cos) of embedding near-duplicate pairs.

    ``exact``: each batch × the broadcast full matrix (numpy matmul) — O(n²·d)
    but embarrassingly parallel across batches; right up to ~10⁶ vectors.
    ``lsh``: random-hyperplane bucket signatures, pairs only within buckets,
    then exact cosine — the 100 TB path (recall < 1 for borderline pairs, by
    construction of LSH; stated, not silent).
    """
    import ray

    mat_tbl = emb_ds.to_pandas()  # id + embedding of the *smaller* side
    ids = mat_tbl["vec_id"].to_numpy()
    M = np.stack(mat_tbl["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)

    if method == "lsh":
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((M.shape[1], num_planes))
        sig = (Mn @ planes > 0).astype(np.uint64) @ (
            np.uint64(1) << np.arange(num_planes, dtype=np.uint64)
        )
        order = np.argsort(sig, kind="stable")
        out_a, out_b, out_c = [], [], []
        s = 0
        sig_s = sig[order]
        for e in list(np.nonzero(np.diff(sig_s))[0] + 1) + [len(sig_s)]:
            grp = order[s:e]
            s = e
            if len(grp) < 2:
                continue
            sub = Mn[grp] @ Mn[grp].T
            ia, ib = np.triu_indices(len(grp), 1)
            cos = sub[ia, ib]
            keep = cos >= threshold
            a, b = ids[grp[ia[keep]]], ids[grp[ib[keep]]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_a.append(lo); out_b.append(hi); out_c.append(cos[keep])
        import ray.data as rd

        if not out_a:
            return rd.from_arrow(pa.table({"vec_a": pa.array([], pa.int64()),
                                           "vec_b": pa.array([], pa.int64()),
                                           "cos": pa.array([], pa.float64())}))
        return rd.from_arrow(
            pa.table(
                {
                    "vec_a": np.concatenate(out_a).astype(np.int64),
                    "vec_b": np.concatenate(out_b).astype(np.int64),
                    "cos": round_half_away(np.concatenate(out_c), 6),
                }
            )
        )

    ref = ray.put((ids, Mn))

    def _block(batch: pa.Table) -> pa.Table:
        all_ids, allM = ray.get(ref)
        bids = batch["vec_id"].to_numpy()
        B = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
        Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        cos = Bn @ allM.T
        ri, ci = np.nonzero((cos >= threshold) & (bids[:, None] < all_ids[None, :]))
        return pa.table(
            {
                "vec_a": bids[ri].astype(np.int64),
                "vec_b": all_ids[ci].astype(np.int64),
                "cos": round_half_away(cos[ri, ci], 6),
            }
        )

    return emb_ds.map_batches(_block, batch_format="pyarrow", batch_size=1024)


def dedup_groups(docs_ds, threshold: float = 0.5, num_parts: int = 4, **lsh_kw):
    """Near-duplicate GROUP resolution: MinHash-LSH pairs → connected
    components over the duplicate graph → (doc_id, group, keep).

    The composition the guide sketches (LSH buckets → candidate pairs →
    verify → min-label components): the verified pair set becomes an edge
    Dataset fed to the same hash-min CC engine the link graph uses, so group
    resolution scales exactly like components do — no driver-side union-find.
    ``keep`` marks the canonical (min doc_id) member of each group; docs with
    no near-duplicate form singleton groups (keep = True).
    """
    import pyarrow as pa
    import ray.data as rd

    from .algorithms import connected_components

    pairs = minhash_lsh_pairs(docs_ds, threshold=threshold, **lsh_kw)
    pair_tbl = pairs.to_pandas()  # candidate pairs are small by construction
    doc_ids = docs_ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"]}), batch_format="pyarrow"
    ).to_pandas()["doc_id"].to_numpy()

    if len(pair_tbl) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": doc_ids,
                    "group": doc_ids,
                    "keep": np.ones(len(doc_ids), dtype=bool),
                }
            )
        )

    edges = rd.from_arrow(
        pa.table(
            {
                "src": pair_tbl["doc_a"].to_numpy().astype(np.uint64),
                "dst": pair_tbl["doc_b"].to_numpy().astype(np.uint64),
            }
        )
    )
    comp, _ = connected_components(edges, num_parts=num_parts)
    comp_map = dict(
        zip(comp["vid"].to_numpy().view(np.int64), comp["component"].to_numpy().view(np.int64))
    )
    group = np.array([comp_map.get(int(d), int(d)) for d in doc_ids], dtype=np.int64)
    order = np.lexsort((doc_ids, group))
    keep = np.zeros(len(doc_ids), dtype=bool)
    first = np.concatenate([[True], group[order][1:] != group[order][:-1]])
    keep[order[first]] = True
    return rd.from_arrow(
        pa.table({"doc_id": doc_ids, "group": group, "keep": keep})
    )
