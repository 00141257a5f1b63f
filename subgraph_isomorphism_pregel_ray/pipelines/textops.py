"""Text-analysis operators over a documents table (doc_id, text, …).

Large-scale training-data pipeline primitives, each a single vectorized
``map_batches`` stage (stateless tasks — per-row work is regex/hashing with
module-level compiled patterns; no shuffle):

* ``token_count``   — whitespace tokenization (ASCII ``\\s``; matches the
  DuckDB oracle's ``regexp_split_to_array(trim(text), '\\s+')`` exactly on
  the test corpora) plus a BPE-ish subword proxy count.
* ``text_stats``    — quality-scoring features: chars, tokens, alnum ratio,
  avg token length, stopword ratio (all reproducible in ANSI SQL).
* ``lang_id``       — n-gram/stopword-scoring language guess (en/de/fr/es/zh)
  with deterministic tie-break.
* ``fingerprint``   — 64-bit rolling-hash document fingerprint (min-hash of
  byte 8-grams, Rabin–Karp style): stable content id robust to containerness.
* ``simhash64``     — 64-bit SimHash over whitespace tokens.

Scale notes: every function is a pure batch kernel → linear scan, no driver
materialization; outputs are narrow int/float columns.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64

__all__ = [
    "token_count_batch",
    "text_stats_batch",
    "lang_id_batch",
    "fingerprint_batch",
    "simhash_batch",
    "token_count",
    "text_stats",
    "lang_id",
    "fingerprint",
    "simhash64",
]

_ALNUM_RE = re.compile(r"[a-zA-Z0-9]")
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "nicht", "von"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "por", "para"},
}
_SQL_STOP = sorted(set().union(*STOPWORDS.values()))  # shared by SQL oracle
_LANGS = ["de", "en", "es", "fr", "zh"]  # deterministic tie order


def _tokens(text: str) -> list[str]:
    return text.split()


def token_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    n_tok = np.array([len(_tokens(t)) for t in texts], dtype=np.int64)
    n_sub = np.array([len(_BPE_RE.findall(t)) for t in texts], dtype=np.int64)
    return pa.table(
        {"doc_id": batch["doc_id"], "n_tokens": n_tok, "n_subtokens": n_sub}
    )


def text_stats_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_tokens = np.empty(n, dtype=np.int64)
    alnum_ratio = np.empty(n)
    avg_token_len = np.empty(n)
    stop_ratio = np.empty(n)
    stopset = set(_SQL_STOP)
    for i, t in enumerate(texts):
        toks = _tokens(t)
        n_chars[i] = len(t)
        n_tokens[i] = len(toks)
        alnum_ratio[i] = (len(_ALNUM_RE.findall(t)) / len(t)) if t else 0.0
        avg_token_len[i] = (sum(len(w) for w in toks) / len(toks)) if toks else 0.0
        stop_ratio[i] = (
            sum(1 for w in toks if w.lower() in stopset) / len(toks) if toks else 0.0
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "alnum_ratio": np.round(alnum_ratio, 6),
            "avg_token_len": np.round(avg_token_len, 6),
            "stop_ratio": np.round(stop_ratio, 6),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    preds = []
    for t in texts:
        toks = [w.lower() for w in _tokens(t)]
        # CJK heuristic first: any han codepoint → zh
        if any("一" <= c <= "鿿" for c in t):
            preds.append("zh")
            continue
        scores = {
            lang: sum(1 for w in toks if w in sw) for lang, sw in STOPWORDS.items()
        }
        best = max(sorted(scores), key=lambda L: scores[L])  # tie → alphabetical
        preds.append(best if scores[best] > 0 else "en")
    return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array(preds)})


def fingerprint_batch(batch: pa.Table, k: int = 8) -> pa.Table:
    """Min of Rabin–Karp rolling hashes over byte k-grams → 64-bit id."""
    texts = batch["text"].to_pylist()
    B = np.uint64(1099511628211)  # FNV prime as rolling base
    out = np.empty(len(texts), dtype=np.uint64)
    Bk = B ** np.uint64(k - 1)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < k:
            out[i] = hash64(np.array([t], dtype=object))[0]
            continue
        # vectorized rolling hash: h_j = Σ b[j+i] * B^(k-1-i)
        powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        n = len(b) - k + 1
        windows = np.lib.stride_tricks.sliding_window_view(b, k)
        hashes = (windows * powers).sum(axis=1)
        out[i] = hashes.min()
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": out.view(np.int64)})


def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = _tokens(t)
        if not toks:
            out[i] = 0
            continue
        hs = hash64(np.array(toks, dtype=object))
        bitmat = ((hs[:, None] >> bits) & np.uint64(1)).astype(np.int64)
        vote = bitmat.sum(axis=0) * 2 - len(toks)  # +1/-1 votes
        out[i] = np.uint64(((vote > 0).astype(np.uint64) << bits).sum())
    return pa.table({"doc_id": batch["doc_id"], "simhash": out.view(np.int64)})


def _stage(fn):
    def run(docs_ds, batch_size: int = 2048):
        return docs_ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)

    return run


token_count = _stage(token_count_batch)
text_stats = _stage(text_stats_batch)
lang_id = _stage(lang_id_batch)
fingerprint = _stage(fingerprint_batch)
simhash64 = _stage(simhash_batch)
