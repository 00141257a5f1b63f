"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public).

The scale split follows the classic trainer: the CORPUS-scale work is one
distributed word-histogram pass (per-batch ``np.unique`` combiners, one
groupby-sum shuffle); the iterative merge learning then runs on the compact
(word, count) vocabulary — a Heaps-law reduction (distinct words grow
~O(corpus^0.5)), the same compression every production BPE trainer
(subword-nmt, HF tokenizers) relies on. At 100 TB the histogram is ~10^8
rows: cap it with ``min_count`` (rare words cannot influence early merges
by more than their total count) and the driver-side state stays bounded.
Encoding re-streams the corpus with the learned merge table broadcast into
the batch fn — one pass, no shuffle.

No reference-repo counterpart (the reference is a graph engine); this is
part of the training-data operator family (SURVEY §2 addendum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["word_histogram", "bpe_train", "bpe_encode_counts",
           "train_from_histogram"]


def _words(text: str) -> list[str]:
    """Whitespace tokenizer shared with the other text ops (lower, split
    on ' ', drop empties)."""
    return [x for x in text.lower().split(" ") if x]


def word_histogram(docs_ds, min_count: int = 1):
    """Distributed word histogram → Dataset(word, n).

    Per-batch combine: each batch ships its DISTINCT words with partial
    counts, so the single shuffle carries vocabulary-sized blocks, not the
    token stream. ``min_count`` filters AFTER the global sum (a word rare
    in every batch can still be globally frequent)."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(_words(t))
        if not toks:
            return pa.table(
                {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {"word": pa.array(list(u), pa.string()), "n": c.astype(np.int64)}
        )

    hist = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )
    if min_count > 1:
        hist = hist.filter(lambda r: r["n"] >= min_count)
    return hist


def _pair_counts(seqs: list[tuple[str, ...]], counts: np.ndarray) -> dict:
    """Adjacent-pair counts over the vocabulary, weighted by word count
    (overlapping positions counted, the standard pre-merge statistic)."""
    pc: dict = {}
    for seq, c in zip(seqs, counts):
        for i in range(len(seq) - 1):
            p = (seq[i], seq[i + 1])
            pc[p] = pc.get(p, 0) + int(c)
    return pc


def _merge_seq(seq: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Left-to-right non-overlapping replacement of ``pair`` in ``seq``."""
    out: list[str] = []
    i, n = 0, len(seq)
    ab = pair[0] + pair[1]
    while i < n:
        if i + 1 < n and seq[i] == pair[0] and seq[i + 1] == pair[1]:
            out.append(ab)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def train_from_histogram(words: list[str], counts, n_merges: int) -> list[tuple]:
    """Pure merge-learning core over a (word, count) histogram →
    [(rank, left, right, n), ...]. Deterministic: ties on the count break
    to the lexicographically smallest (left, right) pair — no hash-order
    dependence. Property-tested against an independent naive
    implementation (tests/test_bpe.py)."""
    seqs = [tuple(w) for w in words]
    counts = np.asarray(counts, dtype=np.int64)
    rows: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pc = _pair_counts(seqs, counts)
        if not pc:
            break
        # max count; tie -> lexicographically smallest pair
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        rows.append((rank, l, r, int(n)))
        seqs = [_merge_seq(s, (l, r)) if l in s else s for s in seqs]
    return rows


def bpe_train(docs_ds, n_merges: int = 32, min_count: int = 1) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges → DataFrame(rank, left, right, n) with
    n the pre-merge adjacency count of the chosen pair.

    The merge loop runs on the compact histogram (driver-side by design,
    like every production trainer); the corpus is read exactly once."""
    hist = word_histogram(docs_ds, min_count=min_count).to_pandas()
    if len(hist) == 0:
        return pd.DataFrame(
            {"rank": pd.Series([], dtype=np.int64), "left": pd.Series([], dtype=str),
             "right": pd.Series([], dtype=str), "n": pd.Series([], dtype=np.int64)}
        )
    rows = train_from_histogram(
        list(hist["word"]), hist["n"].to_numpy(), n_merges
    )
    return pd.DataFrame(rows, columns=["rank", "left", "right", "n"]).astype(
        {"rank": np.int64, "n": np.int64}
    )


def bpe_encode_counts(docs_ds, merges: pd.DataFrame):
    """Apply a learned merge table to the corpus → Dataset(doc_id,
    n_tokens_bpe): per-document BPE token counts.

    Scale shape: the merge table (the small side) is broadcast via
    ``ray.put`` once and applied inside ``map_batches`` with a per-batch
    word→length memo (words repeat heavily, so each distinct word is
    encoded once per batch) — one corpus pass, no shuffle."""
    import ray

    ranks = {
        (l, r): i for i, (l, r) in enumerate(zip(merges["left"], merges["right"]))
    }
    ranks_ref = ray.put(ranks)

    def _encode_len(word: str, ranks: dict) -> int:
        seq: tuple = tuple(word)
        while len(seq) > 1:
            best_rank, best_pair = None, None
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                rk = ranks.get(p)
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_rank, best_pair = rk, p
            if best_pair is None:
                break
            seq = _merge_seq(seq, best_pair)
        return len(seq)

    def _batch(batch: pa.Table) -> pa.Table:
        ranks = ray.get(ranks_ref)
        memo: dict = {}
        ids = batch["doc_id"].to_numpy()
        out = np.zeros(len(ids), np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            tot = 0
            for w in _words(t):
                n = memo.get(w)
                if n is None:
                    n = _encode_len(w, ranks)
                    memo[w] = n
                tot += n
            out[i] = tot
        return pa.table({"doc_id": ids, "n_tokens_bpe": out})

    return docs_ds.map_batches(_batch, batch_format="pyarrow")
