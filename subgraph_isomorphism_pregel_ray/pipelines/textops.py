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

from ..functions.hashing import md5_lower64
from ..functions.rounding import round_half_away

__all__ = [
    "dsir_weights",
    "stratified_topk_sample",
    "quality_mixture_report",
    "token_count_batch",
    "text_stats_batch",
    "lang_id_batch",
    "fingerprint_batch",
    "winnow_batch",
    "winnow_fingerprints",
    "countmin_topk",
    "nb_classifier",
    "lang_by_source",
    "curriculum_buckets",
    "zipf_slope",
    "simhash_batch",
    "token_count",
    "text_stats",
    "lang_id",
    "fingerprint",
    "simhash64",
    "vocab_topk",
    "oov_rate",
    "salient_terms",
    "search_topk",
    "stratified_sample",
    "train_val_test_split",
    "doc_cross_entropy",
    "doc_repetition_batch",
    "doc_repetition",
    "contamination",
    "unigram_quality",
    "redact_pii_batch",
    "redact_pii",
    "collocations_topk",
    "readability_by_source",
    "heaps_law_curve",
    "lang_confusion",
    "token_freq_spectrum",
    "doclen_percentiles_by_lang",
    "gopher_quality_by_source",
    "length_filter_sweep",
    "temperature_mixture",
    "tokenizer_fertility",
    "vocab_coverage_curve",
    "shard_balance",
]

_ALNUM_RE = re.compile(r"[a-zA-Z0-9]")
_ALPHA_ANY_RE = re.compile(r"[a-zA-Z]")
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
            "alnum_ratio": round_half_away(alnum_ratio, 6),
            "avg_token_len": round_half_away(avg_token_len, 6),
            "stop_ratio": round_half_away(stop_ratio, 6),
        }
    )


_STOP_LANGS = sorted(STOPWORDS)  # alphabetical → argmax tie-break = min lang
_STOP_FLAT = np.array(
    [w for lang in _STOP_LANGS for w in sorted(STOPWORDS[lang])], dtype=object
)
_STOP_LANG_IDX = np.array(
    [i for i, lang in enumerate(_STOP_LANGS) for _ in STOPWORDS[lang]], dtype=np.int64
)
_STOP_ORDER = np.argsort(_STOP_FLAT)


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Whole-batch kernels, no per-row char scans:

    * CJK test — one UTF-32 decode of the concatenated batch → uint32
      codepoint array → han-range mask → per-row any via ``add.reduceat``.
    * stopword scores — flatten all lowered tokens with row ids, one
      ``searchsorted`` membership against the per-language stopword table,
      2-D ``bincount`` by (row, lang); argmax with alphabetical tie-break.
    """
    texts = batch["text"].to_pylist()
    n = len(texts)
    if n == 0:
        return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array([], pa.string())})
    # --- CJK: vectorized codepoint scan over the whole batch ---------------
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    cp = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
    han = (cp >= 0x4E00) & (cp <= 0x9FFF)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    nonempty = lens > 0
    has_han = np.zeros(n, dtype=bool)
    if nonempty.any():
        has_han[nonempty] = (
            np.add.reduceat(han, starts[nonempty]) > 0
        ) if han.any() else False
    # --- stopword scores: flattened tokens, one membership pass ------------
    row_ids, toks = [], []
    for i, t in enumerate(texts):
        tt = t.lower().split()
        toks.extend(tt)
        row_ids.append(len(tt))
    rows = np.repeat(np.arange(n, dtype=np.int64), row_ids)
    nlang = len(_STOP_LANGS)
    scores = np.zeros((n, nlang), dtype=np.int64)
    if toks:
        tarr = np.asarray(toks, dtype=object)
        svals = _STOP_FLAT[_STOP_ORDER]
        slang = _STOP_LANG_IDX[_STOP_ORDER]
        # equal-range per token: a word may be a stopword of SEVERAL languages
        # ("la", "un", "que" ∈ {fr, es}) — credit each one.
        lo = np.searchsorted(svals, tarr, side="left")
        hi = np.searchsorted(svals, tarr, side="right")
        cnt = hi - lo
        tot = int(cnt.sum())
        if tot:
            rep = np.repeat(np.arange(len(tarr)), cnt)
            seg0 = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            flat = np.repeat(lo, cnt) + (np.arange(tot) - np.repeat(seg0, cnt))
            np.add.at(scores, (rows[rep], slang[flat]), 1)
    best = scores.argmax(axis=1)  # first (alphabetical) max
    preds = np.where(
        has_han,
        "zh",
        np.where(
            scores[np.arange(n), best] > 0,
            np.asarray(_STOP_LANGS, dtype=object)[best],
            "en",
        ),
    )
    return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array(preds.tolist())})


def fingerprint_batch(batch: pa.Table, k: int = 8) -> pa.Table:
    """Min of Rabin–Karp rolling hashes over CODE-POINT k-grams → 64-bit id.

    h_j = (Σ_i cp[j+i] · B^(k-1-i)) mod 2⁶⁴ with B the FNV prime; the base
    sequence is Unicode code points (not utf-8 bytes) so a SQL oracle can
    reproduce it exactly via ``unicode(substring(text, j, 1))`` and HUGEINT
    arithmetic — numpy's uint64 wrap-around IS mod-2⁶⁴. Texts shorter than
    ``k`` fall back to ``md5_lower64(text)`` ≡ ``md5_number_lower(text)``.
    """
    texts = batch["text"].to_pylist()
    B = np.uint64(1099511628211)  # FNV prime as rolling base
    out = np.empty(len(texts), dtype=np.uint64)
    powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    for i, t in enumerate(texts):
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        if len(cp) < k:
            out[i] = md5_lower64([t])[0]
            continue
        windows = np.lib.stride_tricks.sliding_window_view(cp, k)
        hashes = (windows * powers).sum(axis=1)  # uint64 wraps == mod 2^64
        out[i] = hashes.min()
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": out.view(np.int64)})


def winnow_batch(batch: pa.Table, k: int = 8, w: int = 12) -> pa.Table:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    the MOSS local document-fingerprinting scheme) → rows
    (doc_id, pos, fp): over the SAME code-point Rabin–Karp k-gram hash
    stream as :func:`fingerprint_batch`, every window of ``w`` consecutive
    hashes selects its minimum — RIGHTMOST gram on ties (the paper's rule) —
    and the distinct selected (position, hash) pairs are the document's
    fingerprint set. Guarantees: any shared substring of length ≥ w+k−1
    yields a shared fingerprint, and selected positions are never more
    than w apart (density 2/(w+1)) — the local-guarantee property MinHash
    lacks. ``pos`` is the 1-based gram start so the SQL oracle's
    ``generate_series(1, …)``/``substring`` replay aligns.

    Per row the work is vectorized over the gram stream (stride-trick
    window view + reversed argmin for the rightmost-tie rule); docs with
    fewer than ``w`` grams degenerate to one fingerprint (rightmost global
    min — the paper's short-document convention); docs shorter than ``k``
    emit nothing. Linear map_batches, no shuffle — scale-safe.
    """
    docs = batch["doc_id"].to_numpy()
    B = np.uint64(1099511628211)
    powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    ids, poss, fps = [], [], []
    for did, t in zip(docs, batch["text"].to_pylist()):
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        if len(cp) < k:
            continue
        grams = np.lib.stride_tricks.sliding_window_view(cp, k)
        h = (grams * powers).sum(axis=1)  # uint64 wrap == mod 2^64
        m = len(h)
        if m < w:
            j = m - 1 - int(h[::-1].argmin())  # rightmost global min
            sel_pos = np.array([j], dtype=np.int64)
            sel_fp = h[sel_pos]
        else:
            win = np.lib.stride_tricks.sliding_window_view(h, w)
            arg = (w - 1) - win[:, ::-1].argmin(axis=1)  # rightmost tie
            pos = np.arange(m - w + 1, dtype=np.int64) + arg
            sel_pos = np.unique(pos)
            sel_fp = h[sel_pos]
        ids.append(np.full(len(sel_pos), did, dtype=np.int64))
        poss.append(sel_pos + 1)  # 1-based for the SQL replay
        fps.append(sel_fp.view(np.int64))
    if not ids:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "fp": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "doc_id": np.concatenate(ids),
            "pos": np.concatenate(poss),
            "fp": np.concatenate(fps),
        }
    )


def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over space-split tokens; token hash = ``md5_lower64``
    ≡ DuckDB ``md5_number_lower`` so the bit-vote fold is SQL-reproducible.
    Distinct tokens are hashed once and their votes weighted by count.

    Tokenizer = ``split(' ')`` dropping empties — the exact counterpart of
    the oracle's ``list_filter(string_split(text, ' '), x -> x <> '')``
    (NOT ``str.split()``: any-whitespace splitting would silently diverge
    from the SQL on tabs/newlines)."""
    texts = batch["text"].to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x]
        if not toks:
            out[i] = 0
            continue
        uniq, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        hs = md5_lower64(uniq)
        bitmat = ((hs[:, None] >> bits) & np.uint64(1)).astype(np.int64)
        vote = (bitmat * cnt[:, None]).sum(axis=0) * 2 - len(toks)  # ±1 votes
        out[i] = np.uint64(((vote > 0).astype(np.uint64) << bits).sum())
    return pa.table({"doc_id": batch["doc_id"], "simhash": out.view(np.int64)})


def vocab_topk(docs_ds, k: int = 100):
    """→ Dataset(token, cnt): the ``k`` most frequent whitespace tokens,
    ties broken by token (ascending) so the cut at rank ``k`` is total.

    The canonical combiner-before-shuffle shape: each batch emits its OWN
    (token, count) histogram via ``np.unique`` — at 100 TB the all-to-all
    exchange moves per-batch vocabularies (bounded by Heaps' law), not one
    row per token occurrence; the groupby key is a token string, naturally
    high-cardinality and unskewed after local combining.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(_tokens(t))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {"token": pa.array(u.tolist(), pa.string()), "cnt": c.astype(np.int64)}
        )

    from ray.data.aggregate import Sum

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
    )


def oov_rate(docs_ds, k: int = 100, round_to: int = 6):
    """Per-document OUT-OF-VOCABULARY rate against the corpus top-``k``
    vocabulary (``vocab_topk``'s total (cnt DESC, token ASC) order, so the
    cut is deterministic) → (doc_id, n_tokens, n_oov, oov_rate) — the
    tokenizer-coverage metric every corpus/vocab pairing gets checked
    with. Empty docs: 0 tokens, rate 0.0.

    Scale shape: pass 1 is vocab_topk (per-batch histograms, ONE groupby,
    k rows to the driver); the sorted vocab is broadcast ONCE via
    ``ray.put`` (read per task, zero-copy, never re-shipped per batch);
    pass 2 is one stateless map_batches with an np.isin membership test
    per batch. No per-token shuffle ever happens — the only exchange is
    the vocabulary histogram."""
    import ray

    vocab = np.sort(
        np.asarray(vocab_topk(docs_ds, k).to_pandas()["token"], dtype=object)
    )
    vref = ray.put(vocab)

    def _rate(batch: pa.Table) -> pa.Table:
        v = ray.get(vref)
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        n_tok = np.zeros(len(texts), dtype=np.int64)
        n_oov = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = np.asarray(_tokens(t), dtype=object)
            n_tok[i] = len(toks)
            if len(toks):
                n_oov[i] = int((~np.isin(toks, v)).sum())
        rate = round_half_away(n_oov / np.maximum(n_tok, 1), round_to)
        return pa.table(
            {
                "doc_id": doc_ids,
                "n_tokens": n_tok,
                "n_oov": n_oov,
                "oov_rate": rate,
            }
        )

    return docs_ds.map_batches(_rate, batch_format="pyarrow")


def heavy_hitters(docs_ds, denom: int = 500):
    """Exact corpus heavy hitters: tokens with count ≥ ceil(N/denom), N the
    corpus token total → Dataset(token, cnt) sorted (cnt DESC, token ASC).

    The scale path ``vocab_topk`` can't take: when the vocabulary itself is
    too large to shuffle (per-batch histograms are bounded by Heaps' law but
    at 100 TB even those dominate the exchange), a frequent-items sketch
    bounds the exchange by the SKETCH size instead. Two linear passes:

      1. **Misra–Gries pass** — each batch builds its exact histogram
         (``np.unique``) and prunes it to ``k = 2·denom`` counters by
         subtracting the (k+1)-th largest count (the histogram form of MG
         decrement; per-token undercount ≤ n_batch/(k+1), *Mergeable
         Summaries*, Agarwal et al. PODS'12). Summing the per-batch
         summaries with ONE groupby undercounts any token by at most
         ⌊N/(k+1)⌋ < threshold/2, so
         ``mg_sum ≥ threshold − ⌊N/(k+1)⌋`` is a provable candidate
         SUPERSET of the true heavy hitters — and it has ≤ 2·denom members
         (each claims ≥ N/(2·denom) of the N total), so it broadcasts.
      2. **Exact verify pass** — re-tokenize, count ONLY candidate tokens
         (``np.isin`` against the broadcast sorted array), one small
         groupby, exact integer threshold filter. Every surviving count is
         exact, so the result is bit-identical to the SQL oracle's
         ``HAVING count(*) >= (N + denom − 1) // denom``.

    All thresholds are exact integer arithmetic (no float ε). Empty corpus
    → typed empty result. Tokenizer = ``str.split()`` ≡ the oracle's
    ``regexp_split_to_array(trim(text), '\\s+')`` on trim-nonempty rows.
    """
    import ray
    from ray.data.aggregate import Sum

    k = 2 * denom
    empty = pa.table(
        {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
    )

    def _mg_partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(_tokens(t))
        if not toks:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        c = c.astype(np.int64)
        if len(u) > k:
            d = np.partition(c, len(c) - (k + 1))[len(c) - (k + 1)]
            keep = c > d
            u, c = u[keep], c[keep] - d
        n = np.zeros(len(u), dtype=np.int64)
        n[0] = len(toks)  # batch token total rides on one sentinel row
        return pa.table(
            {"token": pa.array(u.tolist(), pa.string()), "cnt": c, "n": n}
        )

    partials = docs_ds.map_batches(_mg_partial, batch_format="pyarrow").materialize()
    total = partials.sum("n")
    if not total:
        return ray.data.from_arrow(empty)
    threshold = (total + denom - 1) // denom
    cand_floor = threshold - total // (k + 1)

    mg = partials.groupby("token").aggregate(Sum("cnt", alias_name="cnt"))

    def _cand_filter(batch: pa.Table) -> pa.Table:
        mask = batch["cnt"].to_numpy(zero_copy_only=False) >= cand_floor
        return batch.filter(pa.array(mask))

    cand_rows = mg.map_batches(_cand_filter, batch_format="pyarrow").take_all()
    cand = np.sort(np.asarray([r["token"] for r in cand_rows], dtype=object))
    if len(cand) == 0:
        return ray.data.from_arrow(empty)
    cand_ref = ray.put(cand)

    def _exact_partial(batch: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(_tokens(t))
        if not toks:
            return empty
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        keep = np.isin(u, cset)
        return pa.table(
            {
                "token": pa.array(u[keep].tolist(), pa.string()),
                "cnt": c[keep].astype(np.int64),
            }
        )

    def _thresh(batch: pa.Table) -> pa.Table:
        mask = batch["cnt"].to_numpy(zero_copy_only=False) >= threshold
        return batch.filter(pa.array(mask))

    return (
        docs_ds.map_batches(_exact_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(_thresh, batch_format="pyarrow")
        .sort(["cnt", "token"], descending=[True, False])
    )


def lang_by_source(docs_ds):
    """Corpus-composition crosstab → Dataset(source, lang_pred, n_docs):
    predicted language (the ``lang_id_batch`` heuristic) × declared source
    — the sanity dashboard every multi-source crawl ingest gets checked
    with (a source whose language mix shifts is a scraper regression).
    One linear pass (the lang kernel + an in-batch (source, pred) count
    combine), one tiny groupby-sum — exchange volume is
    O(|sources| × |langs|) per batch."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        pred = lang_id_batch(batch)["lang_pred"].to_pylist()
        src = batch["source"].to_pylist()
        keys = np.asarray([f"{s}\x00{p}" for s, p in zip(src, pred)], dtype=object)
        if len(keys) == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "lang_pred": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        u, c = np.unique(keys, return_counts=True)
        pairs = [k.split("\x00") for k in u]
        return pa.table(
            {
                "source": pa.array([p[0] for p in pairs], pa.string()),
                "lang_pred": pa.array([p[1] for p in pairs], pa.string()),
                "n_docs": c.astype(np.int64),
            }
        )

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["source", "lang_pred"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def countmin_topk(docs_ds, k: int = 32, d: int = 4, width: int = 1024):
    """CountMin sketch (Cormode & Muthukrishnan 2005, "An improved data
    stream summary") → Arrow table (token, cnt, est): the exact corpus
    top-``k`` tokens (``vocab_topk``'s total (cnt DESC, token ASC) order)
    annotated with the sketch's estimate ``est = min_r cm[r][h_r(token)]``
    — always ≥ the true count, and ≤ true + 2N/width w.p. 1−2^−d. The
    ``cnt`` column makes the ε-overestimate property directly auditable.

    The sketch is the OTHER mergeable frequency summary next to
    ``heavy_hitters``'s Misra–Gries pass: counter ADDITION is the merge,
    so each batch emits its local d×width partials as (r, cell, cnt) rows
    (combined in-batch with a packed-key ``np.unique``) and ONE groupby-sum
    folds the corpus sketch — exchange volume is bounded by d·width per
    batch regardless of vocabulary size, the property that matters when
    even per-batch vocabularies would dominate the shuffle at 100 TB.
    Row hashes are ``md5_lower64(f"{r}:{token}") % width`` ≡ DuckDB
    ``md5_number_lower(concat(r, ':', token)) % width``, so the folded
    sketch AND the estimates are bit-reproducible in SQL. The materialized
    state is O(d·width + k) — independent of corpus size — which is what
    makes the driver-side estimate lookup legitimate.
    """
    from ray.data.aggregate import Sum

    def _sketch_partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(_tokens(t))
        if not toks:
            return pa.table(
                {"key": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        c = c.astype(np.int64)
        keys, cnts = [], []
        for r in range(d):
            cell = (
                md5_lower64(np.array([f"{r}:{t}" for t in u], dtype=object))
                % np.uint64(width)
            ).astype(np.int64)
            keys.append(np.int64(r) * np.int64(width) + cell)
            cnts.append(c)
        key = np.concatenate(keys)
        cnt = np.concatenate(cnts)
        uk, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(acc, inv, cnt)
        return pa.table({"key": uk, "cnt": acc})

    sketch_rows = (
        docs_ds.map_batches(_sketch_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )  # ≤ d·width rows — the sketch, not the data
    cm = np.zeros(d * width, dtype=np.int64)
    for row in sketch_rows:
        cm[row["key"]] = row["cnt"]

    top = vocab_topk(docs_ds, k=k).to_pandas()
    toks = top["token"].tolist()
    if toks:
        cells = np.stack(
            [
                (
                    md5_lower64(np.array([f"{r}:{t}" for t in toks], dtype=object))
                    % np.uint64(width)
                ).astype(np.int64)
                + r * width
                for r in range(d)
            ]
        )
        est = cm[cells].min(axis=0)
    else:
        est = np.array([], dtype=np.int64)
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "cnt": top["cnt"].to_numpy().astype(np.int64),
            "est": est,
        }
    )


def salient_terms(docs_ds, n_docs: int, k: int = 3, num_buckets: int = 32):
    """Per-document keyword extraction: the ``k`` most salient terms by
    TF-IDF-style scoring → (doc_id, term, rank, salience).

    salience = (tf / doc_len) / (df / N) — relative in-document frequency
    over relative corpus frequency (linear idf). Every factor is an exact
    small integer and each IEEE division is correctly rounded, so the
    score is BIT-IDENTICAL to the SQL oracle's, with a total (salience
    DESC, term ASC) tie-break — no float-rounding epsilon anywhere.

    Scale shape — one tokenize pass, two shuffles:
      1. each batch emits per-doc (term, tf, doc_len) rows AND its own
         per-term distinct-doc partial (the df combiner), both routed by
         hash(term): ONE groupby computes global df and joins it to the
         tf rows in the same ``map_groups`` (no second pass over text,
         no ``Dataset.join``), scores, and PRE-CUTS to ≤ k rows per doc
         per bucket (global top-k ⊆ union of per-bucket top-k);
      2. a doc-bucketed groupby ranks the ≤ k·num_buckets survivors per
         doc. Exchanges carry (term, int, int) partials — never text.

    Tokenizer = ``lower().split(' ')`` dropping empties, exactly DuckDB's
    ``list_filter(string_split(lower(text), ' '), x -> x <> '')``.
    """
    from ..functions.hashing import hash64

    N = float(n_docs)

    def _rank_within_doc(doc, sal, tcode):
        """(salience desc, term asc) order + 0-based rank within each doc.
        Term codes sort lexicographically because ``np.unique`` is sorted."""
        order = np.lexsort((tcode, -sal, doc))
        doc_s = doc[order]
        first = np.concatenate([[True], doc_s[1:] != doc_s[:-1]])
        seg = np.arange(len(doc_s)) - np.maximum.accumulate(
            np.where(first, np.arange(len(doc_s)), 0)
        )
        return order, seg

    def _tf_partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy()
        rows, toks = [], []
        for i, t in enumerate(texts):
            tt = [x for x in t.lower().split(" ") if x]
            toks.extend(tt)
            rows.append(len(tt))
        counts = np.asarray(rows, dtype=np.int64)
        empty = pa.table(
            {
                "b": pa.array([], pa.int32()),
                "side": pa.array([], pa.int8()),
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "doc_len": pa.array([], pa.int64()),
            }
        )
        if not toks:
            return empty
        row_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        tarr = np.asarray(toks, dtype=object)
        uterm, tcode = np.unique(tarr, return_inverse=True)
        key = row_of * len(uterm) + tcode
        ukey, tf = np.unique(key, return_counts=True)
        r, c = ukey // len(uterm), ukey % len(uterm)
        # batch-local df partial: #docs in this batch containing each term
        dterm, dcnt = np.unique(c, return_counts=True)
        term_col = np.concatenate([uterm[c], uterm[dterm]])
        return pa.table(
            {
                "b": (hash64(term_col) % np.uint64(num_buckets)).astype(np.int32),
                "side": np.concatenate(
                    [np.zeros(len(r), np.int8), np.ones(len(dterm), np.int8)]
                ),
                "doc_id": np.concatenate([doc_ids[r], np.full(len(dterm), -1)]),
                "term": term_col,
                "tf": np.concatenate([tf.astype(np.int64), dcnt.astype(np.int64)]),
                "doc_len": np.concatenate(
                    [counts[r], np.zeros(len(dterm), np.int64)]
                ),
            }
        )

    def _score_precut(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy()
        term = g["term"].to_numpy(zero_copy_only=False)
        tfv = g["tf"].to_numpy()
        uterm, code = np.unique(term, return_inverse=True)
        df = np.bincount(
            code[side == 1], weights=tfv[side == 1], minlength=len(uterm)
        )
        tf_rows = side == 0
        if not tf_rows.any():
            return pa.table(
                {
                    "db": pa.array([], pa.int32()),
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "salience": pa.array([], pa.float64()),
                }
            )
        doc = g["doc_id"].to_numpy()[tf_rows]
        dl = g["doc_len"].to_numpy()[tf_rows]
        tf = tfv[tf_rows]
        tcode = code[tf_rows]
        sal = (tf.astype(np.float64) / dl.astype(np.float64)) / (
            df[tcode] / N
        )
        # pre-cut: top-k per doc within this term-bucket
        order, seg = _rank_within_doc(doc, sal, tcode)
        keep = order[seg < k]
        return pa.table(
            {
                "db": (doc[keep] % num_buckets).astype(np.int32),
                "doc_id": doc[keep],
                "term": uterm[tcode[keep]],
                "salience": sal[keep],
            }
        )

    def _final_topk(g: pa.Table) -> pa.Table:
        doc = g["doc_id"].to_numpy()
        sal = g["salience"].to_numpy()
        term = g["term"].to_numpy(zero_copy_only=False)
        uterm, tcode = np.unique(term, return_inverse=True)
        order, seg = _rank_within_doc(doc, sal, tcode)
        keep = seg < k
        return pa.table(
            {
                "doc_id": doc[order][keep],
                "term": uterm[tcode[order][keep]],
                "rank": (seg[keep] + 1).astype(np.int64),
                "salience": sal[order][keep],
            }
        )

    return (
        docs_ds.map_batches(_tf_partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_score_precut, batch_format="pyarrow")
        .groupby("db")
        .map_groups(_final_topk, batch_format="pyarrow")
    )


def _qterm_match_fn(qterms: np.ndarray):
    """Batch fn emitting (doc_id, term, tf, doc_len) rows for query terms
    only (≤ |Q| rows per doc — the inverted-index reduction shared by
    search_topk and bm25_topk). Tokenizer = lower().split(' ') dropping
    empties, exactly the oracle's list_filter(string_split(lower(text)))."""

    def _match(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy()
        out_doc, out_term, out_tf, out_dl = [], [], [], []
        for i, t in enumerate(texts):
            tt = [x for x in t.lower().split(" ") if x]
            if not tt:
                continue
            uniq, cnt = np.unique(np.asarray(tt, dtype=object), return_counts=True)
            pos = np.searchsorted(uniq, qterms)
            pos_c = np.minimum(pos, len(uniq) - 1)
            hit = uniq[pos_c] == qterms
            if not hit.any():
                continue
            nh = int(hit.sum())
            out_doc.append(np.full(nh, doc_ids[i]))
            out_term.append(qterms[hit])
            out_tf.append(cnt[pos_c[hit]])
            out_dl.append(np.full(nh, len(tt)))
        if not out_doc:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "doc_len": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": np.concatenate(out_doc),
                "term": np.concatenate(out_term),
                "tf": np.concatenate(out_tf).astype(np.int64),
                "doc_len": np.concatenate(out_dl).astype(np.int64),
            }
        )

    return _match


def bm25_topk(docs_ds, terms, k: int = 10, k1: float = 1.2, b: float = 0.75,
              round_to: int = 6):
    """BM25 ranked retrieval (Robertson & Sparck Jones probabilistic
    weighting, the Okapi BM25 formula — public) → top-k
    (doc_id, score, rank), rank ties broken by doc_id asc.

    score(d) = Σ_{t∈Q∩d} ln(1 + (N−df+0.5)/(df+0.5)) ·
               tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))

    Determinism: every factor mirrors the SQL oracle's expression tree
    term for term (same literals, same division order); N/avgdl come from
    exact int sums so their float divisions agree bit-exactly; the per-doc
    sum is ≤ |Q| addends whose ~1-ulp order noise sits ~1e-10 below the
    6-decimal half-away round; ranking uses the ROUNDED score so the k-cut
    is total on both sides.

    Scale shape: one corpus pass folds (Σdl, N) as int partials; a second
    pass keeps only query-term rows (the ~10³× inverted-index reduction,
    materialized once and reused for df + scoring); df (≤ |Q| rows) folds
    to the driver and broadcasts into the scoring map; per-doc sums
    combine via groupby, and the final k-cut sorts only matched docs."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    qterms = np.array(sorted({t.lower() for t in terms}), dtype=object)

    def _dl_partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dls = np.array(
            [len([x for x in t.lower().split(" ") if x]) for t in texts], np.int64
        )
        dls = dls[dls > 0]
        return pa.table(
            {"s": np.array([dls.sum()], np.int64), "n": np.array([len(dls)], np.int64)}
        )

    stats = docs_ds.map_batches(_dl_partial, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n")
    )
    S, N = int(stats["s"] or 0), int(stats["n"] or 0)
    avgdl = S / N if N else 1.0
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    tf_rows = docs_ds.map_batches(
        _qterm_match_fn(qterms), batch_format="pyarrow"
    ).materialize()
    df_tbl = tf_rows.groupby("term").count().to_pandas()
    df_map = (
        dict(zip(df_tbl["term"], df_tbl["count()"].astype(np.int64)))
        if "term" in df_tbl.columns
        else {}
    )
    df_vec = np.array([df_map.get(t, 0) for t in qterms], dtype=np.int64)

    def _score(batch: pa.Table) -> pa.Table:
        term = batch["term"].to_numpy(zero_copy_only=False)
        qi = np.searchsorted(qterms, term)
        df = df_vec[qi].astype(np.float64)
        idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5))
        tf = batch["tf"].to_numpy().astype(np.float64)
        dl = batch["doc_len"].to_numpy().astype(np.float64)
        sc = idf * (tf * k1p1) / (tf + k1 * (one_minus_b + b * (dl / avgdl)))
        return pa.table({"doc_id": batch["doc_id"], "sc": sc})

    summed = (
        tf_rows.map_batches(_score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("sc", alias_name="sc"))
    )

    def _round_precut(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy().astype(np.int64)
        sc = round_half_away(t["sc"].to_numpy(), round_to)
        pick = np.lexsort((doc, -sc))[:k]  # per-block precut
        return pa.table(
            {
                "one": np.ones(len(pick), np.int32),
                "doc_id": doc[pick],
                "score": sc[pick],
            }
        )

    def _final(g: pa.Table) -> pa.Table:
        doc = g["doc_id"].to_numpy()
        sc = g["score"].to_numpy()
        pick = np.lexsort((doc, -sc))[:k]
        return pa.table(
            {
                "doc_id": doc[pick],
                "score": sc[pick],
                "rank": np.arange(1, len(pick) + 1, dtype=np.int64),
            }
        )

    return (
        summed.map_batches(_round_precut, batch_format="pyarrow")
        .groupby("one")
        .map_groups(_final, batch_format="pyarrow")
    )


def search_topk(docs_ds, terms, k: int = 10):
    """Inverted-index text search: rank documents against a bag of query
    terms → top-k (doc_id, n_matched, max_salience).

    Scoring is MaxSim-shaped (à la ColBERT late interaction): a document
    is ranked by (number of distinct query terms it contains DESC, max
    per-term salience DESC, doc_id ASC) where salience is the same
    division-only (tf/doc_len)/(df/N) as ``salient_terms``. Both max and
    count are summation-order-free, so the result is BIT-identical to the
    SQL oracle — no float-epsilon at the top-k boundary, and doc_id makes
    the cut total.

    Scale shape: one tokenize pass keeps only query-term rows (≤ |Q| per
    doc — a ~10³× reduction from the token stream), which are
    ``materialize()``d ONCE (legitimately: this is the reduced
    intermediate, reused for df and scoring without re-reading the
    corpus). df (≤ |Q| rows) is folded to the driver and broadcast into
    the scoring map; a per-doc groupby then a k-cut sort finish. No
    per-term ``map_groups`` — a common term's inverted list never lands
    on one worker.
    """
    from ray.data.aggregate import Count, Max

    qterms = np.array(sorted({t.lower() for t in terms}), dtype=object)
    N_ds = docs_ds

    n_docs = float(N_ds.count())
    tf_rows = docs_ds.map_batches(
        _qterm_match_fn(qterms), batch_format="pyarrow"
    ).materialize()
    df_tbl = tf_rows.groupby("term").count().to_pandas()  # ≤ |Q| rows
    # a hash aggregate over zero rows yields a schema-less empty frame
    df_map = (
        dict(zip(df_tbl["term"], df_tbl["count()"].astype(np.int64)))
        if "term" in df_tbl.columns
        else {}
    )
    df_vec = np.array([df_map.get(t, 0) for t in qterms], dtype=np.int64)

    def _score(batch: pa.Table) -> pa.Table:
        term = batch["term"].to_numpy(zero_copy_only=False)
        qi = np.searchsorted(qterms, term)
        tf = batch["tf"].to_numpy().astype(np.float64)
        dl = batch["doc_len"].to_numpy().astype(np.float64)
        sal = (tf / dl) / (df_vec[qi] / n_docs)
        return pa.table({"doc_id": batch["doc_id"], "salience": sal})

    out = (
        tf_rows.map_batches(_score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Count(alias_name="n_matched"),
            Max("salience", alias_name="max_salience"),
        )
        .sort(["n_matched", "max_salience", "doc_id"], descending=[True, True, False])
        .limit(k)
    )

    def _cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_matched": t["n_matched"].to_numpy().astype(np.int64),
                "max_salience": t["max_salience"],
            }
        )

    return out.map_batches(_cast, batch_format="pyarrow")


def _stage(fn):
    def run(docs_ds, batch_size: int = 2048):
        return docs_ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)

    return run


token_count = _stage(token_count_batch)
text_stats = _stage(text_stats_batch)
lang_id = _stage(lang_id_batch)
fingerprint = _stage(fingerprint_batch)
winnow_fingerprints = _stage(winnow_batch)
simhash64 = _stage(simhash_batch)


def doc_repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition quality scores per document (Rae et al. 2021,
    "Scaling Language Models", §A1.1 repetition filters — public paper):

    * ``dup_token_ratio``  — fraction of tokens that are repeats of an
      earlier token: ``(n - n_distinct) / n``.
    * ``top_token_ratio``  — fraction taken by the single most frequent
      token (the "most common word" filter).
    * ``dup_bigram_ratio`` — fraction of adjacent-token bigrams that are
      duplicates: ``(nb - nb_distinct) / nb`` with ``nb = n - 1``.

    Tokenizer = ``split(' ')`` dropping empties — exactly the oracle's
    ``list_filter(string_split(text, ' '), x -> x <> '')``. Every ratio is
    ONE IEEE division of exact small ints → bit-identical to the SQL.
    Tokens contain no spaces, so ``' '.join`` bigram keys are injective.
    Pure batch kernel: linear scan, no shuffle, narrow output.
    """
    texts = batch["text"].to_pylist()
    n_rows = len(texts)
    n_tok = np.zeros(n_rows, dtype=np.int64)
    dup_tok = np.zeros(n_rows)
    top_tok = np.zeros(n_rows)
    dup_big = np.zeros(n_rows)
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x]
        n = len(toks)
        n_tok[i] = n
        if n == 0:
            continue
        _, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        dup_tok[i] = (n - len(cnt)) / n
        top_tok[i] = int(cnt.max()) / n
        if n >= 2:
            bigrams = np.asarray(
                [toks[j] + " " + toks[j + 1] for j in range(n - 1)], dtype=object
            )
            nbd = len(np.unique(bigrams))
            dup_big[i] = (n - 1 - nbd) / (n - 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tok,
            "dup_token_ratio": dup_tok,
            "top_token_ratio": top_tok,
            "dup_bigram_ratio": dup_big,
        }
    )


doc_repetition = _stage(doc_repetition_batch)


def _space_tokens(t: str) -> list[str]:
    """split(' ') dropping empties — the SQL-exact tokenizer shared by the
    repetition / contamination / chunking / packing operators."""
    return [x for x in t.split(" ") if x]


def _word_ngrams_unique(toks: list[str], n: int) -> np.ndarray:
    """DISTINCT space-joined word n-grams (tokens contain no spaces, so the
    join is injective)."""
    if len(toks) < n:
        return np.asarray([], dtype=object)
    joined = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
    return np.unique(np.asarray(joined, dtype=object))


def benchmark_gram_hashes(docs_ds, bench_mod: int = 37, n: int = 3):
    """Sorted uint64 md5 hashes of the benchmark subset's distinct word
    n-grams — the broadcast-small side of the decontamination probe (the
    benchmark is a fixed eval suite, small at ANY corpus scale)."""
    def _bench(batch: pa.Table) -> pa.Table:
        mask = (batch["doc_id"].to_numpy() % bench_mod) == 0
        out = []
        for t, m in zip(batch["text"].to_pylist(), mask):
            if not m:
                continue
            g = _word_ngrams_unique(_space_tokens(t), n)
            if len(g):
                out.append(md5_lower64(g))
        h = np.unique(np.concatenate(out)) if out else np.asarray([], np.uint64)
        return pa.table({"gram_hash": h.view(np.int64)})

    df = docs_ds.map_batches(_bench, batch_format="pyarrow").to_pandas()
    return np.unique(
        df["gram_hash"].to_numpy().view(np.uint64)
        # a zero-row aggregate yields a schema-less empty frame
        if "gram_hash" in df.columns
        else np.asarray([], dtype=np.uint64)
    )


def contamination(docs_ds, bench_mod: int = 37, n: int = 3):
    """Benchmark-contamination check: for every non-benchmark document, the
    fraction of its DISTINCT word ``n``-grams that also occur in the
    benchmark set (docs with ``doc_id % bench_mod == 0`` — a deterministic
    stand-in for a held-out eval suite). The standard decontamination pass
    before training (e.g. GPT-3 appendix C / Dodge et al. 2021 C4 audit).

    → Dataset(doc_id, n_grams, n_hit, contamination_ratio).

    Scale shape — broadcast-small, no shuffle: the benchmark side is a
    fixed eval suite (thousands of docs even at 100 TB corpus scale), so
    its distinct-gram set is collected ONCE, hashed to uint64
    (``md5_lower64`` of the space-joined gram; membership survives hashing
    barring md5 collisions), sorted, ``ray.put`` once, and every scoring
    batch does a vectorized ``searchsorted`` membership probe. The corpus
    side is a single linear ``map_batches`` pass. Ratio is one IEEE
    division of exact ints → bit-identical to the SQL oracle's string-set
    version.
    """
    import ray

    _toks, _grams = _space_tokens, lambda tt: _word_ngrams_unique(tt, n)
    bench_ref = ray.put(benchmark_gram_hashes(docs_ds, bench_mod, n))

    class _Score:
        def __init__(self, ref):
            self.bench = ray.get(ref)  # fetched once per actor, zero-copy

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch["text"].to_pylist()
            doc_ids = batch["doc_id"].to_numpy()
            keep = (doc_ids % bench_mod) != 0
            n_rows = len(texts)
            ng = np.zeros(n_rows, dtype=np.int64)
            nh = np.zeros(n_rows, dtype=np.int64)
            for i, t in enumerate(texts):
                if not keep[i]:
                    continue
                g = _grams(_toks(t))
                if not len(g):
                    continue
                h = md5_lower64(g)
                pos = np.searchsorted(self.bench, h)
                pos_c = np.minimum(pos, max(len(self.bench) - 1, 0))
                ng[i] = len(g)
                if len(self.bench):
                    nh[i] = int((self.bench[pos_c] == h).sum())
            ratio = np.where(ng > 0, nh / np.maximum(ng, 1), 0.0)
            return pa.table(
                {
                    "doc_id": doc_ids[keep],
                    "n_grams": ng[keep],
                    "n_hit": nh[keep],
                    "contamination_ratio": ratio[keep],
                }
            )

    return docs_ds.map_batches(
        _Score,
        fn_constructor_args=(bench_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def unigram_quality(docs_ds, num_buckets: int = 32):
    """LM-flavoured quality scoring against the corpus's own unigram model
    → Dataset(doc_id, n_tokens, mean_relfreq, hapax_ratio).

    * ``mean_relfreq`` — the document's mean token corpus-frequency,
      ``Σ_t tf_doc(t)·F_corpus(t) / (n_doc · T)``: high = stereotyped
      common-word text, low = rare-vocabulary text (a division-only
      stand-in for unigram log-perplexity that stays BIT-identical to SQL —
      one IEEE division of exact int64s, no transcendental functions).
    * ``hapax_ratio`` — fraction of the doc's tokens that are corpus
      hapax legomena (F = 1): the classic OCR-garbage / gibberish signal.

    Scale shape (the ``salient_terms`` one-pass shuffle): each batch emits
    per-doc (term, tf, doc_len) rows AND per-batch corpus term-count
    partials into a single hash(term)-bucketed groupby, which folds the
    global frequency and reduces each doc's contribution to TWO int64
    partials per bucket (``Σ tf·F`` and ``Σ tf·[F=1]``); a doc-keyed
    groupby-sum finishes. Exchanges carry ints, never text; the corpus
    total T is the scalar fold of the same partials.
    """
    from ..functions.hashing import hash64
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy()
        rows, toks = [], []
        for t in texts:
            tt = [x for x in t.split(" ") if x]
            toks.extend(tt)
            rows.append(len(tt))
        counts = np.asarray(rows, dtype=np.int64)
        empty = pa.table(
            {
                "b": pa.array([], pa.int32()),
                "side": pa.array([], pa.int8()),
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "doc_len": pa.array([], pa.int64()),
            }
        )
        if not toks:
            return empty
        row_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        tarr = np.asarray(toks, dtype=object)
        uterm, tcode = np.unique(tarr, return_inverse=True)
        key = row_of * len(uterm) + tcode
        ukey, tf = np.unique(key, return_counts=True)
        r, c = ukey // len(uterm), ukey % len(uterm)
        # batch-local corpus-count partial per term
        ccnt = np.bincount(tcode, minlength=len(uterm)).astype(np.int64)
        term_col = np.concatenate([uterm[c], uterm])
        return pa.table(
            {
                "b": (hash64(term_col) % np.uint64(num_buckets)).astype(np.int32),
                "side": np.concatenate(
                    [np.zeros(len(r), np.int8), np.ones(len(uterm), np.int8)]
                ),
                "doc_id": np.concatenate([doc_ids[r], np.full(len(uterm), -1)]),
                "term": term_col,
                "tf": np.concatenate([tf.astype(np.int64), ccnt]),
                "doc_len": np.concatenate([counts[r], np.zeros(len(uterm), np.int64)]),
            }
        )

    def _fold_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy()
        term = g["term"].to_numpy(zero_copy_only=False)
        tfv = g["tf"].to_numpy()
        uterm, code = np.unique(term, return_inverse=True)
        F = np.bincount(
            code[side == 1], weights=tfv[side == 1], minlength=len(uterm)
        ).astype(np.int64)
        tf_rows = side == 0
        # tok_total piggybacks this bucket's share of the corpus total T on
        # one row; the driver folds it with a scalar `.sum()` (P ints).
        bucket_T = int(F.sum())
        if not tf_rows.any():
            return pa.table(
                {
                    "doc_id": pa.array([-1], pa.int64()),
                    "num": pa.array([0], pa.int64()),
                    "hap": pa.array([0], pa.int64()),
                    "ntok": pa.array([0], pa.int64()),
                    "tok_total": pa.array([bucket_T], pa.int64()),
                }
            )
        doc = g["doc_id"].to_numpy()[tf_rows]
        tf = tfv[tf_rows]
        Fr = F[code[tf_rows]]
        udoc, dcode = np.unique(doc, return_inverse=True)
        # int64 accumulation via add.at (NOT float-weighted bincount, whose
        # float64 path loses exactness past 2^53 — Σ tf·F can cross that at
        # full corpus scale; groups here are small so add.at costs nothing)
        num = np.zeros(len(udoc), dtype=np.int64)
        np.add.at(num, dcode, tf * Fr)
        hap = np.zeros(len(udoc), dtype=np.int64)
        np.add.at(hap, dcode, tf * (Fr == 1))
        # this bucket's share of the doc's length: Σ tf over terms here;
        # summed across buckets it reconstructs n_tokens exactly.
        ntok = np.zeros(len(udoc), dtype=np.int64)
        np.add.at(ntok, dcode, tf)
        tok_total = np.zeros(len(udoc), dtype=np.int64)
        tok_total[0] = bucket_T
        return pa.table(
            {
                "doc_id": udoc,
                "num": num,
                "hap": hap,
                "ntok": ntok,
                "tok_total": tok_total,
            }
        )

    folded = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_fold_bucket, batch_format="pyarrow")
        .materialize()
    )
    T = int(folded.sum("tok_total") or 0)
    per_doc = folded.groupby("doc_id").aggregate(
        Sum("num", alias_name="num"),
        Sum("hap", alias_name="hap"),
        Sum("ntok", alias_name="n_tokens"),
    )

    def _finish(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy()
        keep = doc >= 0  # drop the sentinel rows that carried tok_total
        num = t["num"].to_numpy().astype(np.int64)[keep]
        hap = t["hap"].to_numpy().astype(np.int64)[keep]
        nt = t["n_tokens"].to_numpy().astype(np.int64)[keep]
        denom = np.maximum(nt * np.int64(T), 1)
        mean_relfreq = np.where(nt > 0, num / denom, 0.0)
        hapax_ratio = np.where(nt > 0, hap / np.maximum(nt, 1), 0.0)
        return pa.table(
            {
                "doc_id": doc[keep],
                "n_tokens": nt,
                "mean_relfreq": mean_relfreq,
                "hapax_ratio": hapax_ratio,
            }
        )

    return per_doc.map_batches(_finish, batch_format="pyarrow")


def stratified_sample(
    docs_ds,
    rates: dict[str, float],
    default_rate: float = 1.0,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
):
    """Deterministic per-stratum Bernoulli sample — the classic
    downsample-the-majority-language curation step, reproducible at any
    parallelism because the keep decision is a pure function of the row key:

        keep ⇔ ((key mod 2³¹) · 2654435761) mod 2³¹  <  rate · 2³¹

    (Knuth multiplicative hash over a 2³¹ ring; all intermediates stay
    < 2⁶³ for ANY int64 key, so the SQL oracle can reproduce it with plain
    BIGINT arithmetic — no float hashing, no engine RNG). numpy's ``%``
    is floored (non-negative result) while SQL ``%`` is truncated — the
    oracle mirrors floored semantics with ``((x % m) + m) % m`` so parity
    holds for negative keys too. Embarrassingly
    parallel: one vectorized map_batches, no shuffle, no state.
    """
    ring = np.int64(1) << 31

    def _keep(t: pa.Table) -> pa.Table:
        key = t[key_col].to_numpy().astype(np.int64)
        h = ((key % ring) * np.int64(2654435761)) % ring
        strat = t[stratum_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(strat, return_inverse=True)
        per = np.array(
            [int(float(rates.get(s, default_rate)) * (1 << 31)) for s in uniq],
            np.int64,
        )
        thresh = per[inv]
        return t.filter(pa.array(h < thresh))

    return docs_ds.map_batches(_keep, batch_format="pyarrow")


def doc_cross_entropy(docs_ds, num_partitions: int = 8):
    """Per-document cross-entropy under the corpus unigram model — the
    classic perplexity filter (a document of globally-rare tokens scores
    high): H(d) = −(1/|d|)·Σ_{t∈d} ln(cnt(t)/N), N the corpus token
    total → Dataset(doc_id, n_tokens, cross_entropy).

    Scale shape: pass 1 emits per-doc per-token counts (np.unique
    combiner — the exchange carries distinct (doc, token) pairs, not
    occurrences); global counts fold from the SAME table with one
    groupby-sum; counts flow back to (doc, token) rows via a
    ``Dataset.join`` on token (never a driver-side vocabulary dict);
    per-doc partial sums combine per batch before the final doc groupby.
    Whitespace tokens identical to ``vocab_topk``; empty documents are
    dropped on both sides. ln-noise (~1 ulp between numpy and DuckDB
    libm) is ~1e-16 — far below the 6-decimal round."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def _doc_tokens(b: pa.Table) -> pa.Table:
        ids: list[int] = []
        toks: list[str] = []
        ks: list[int] = []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            tt = _tokens(t)
            if not tt:
                continue
            u, c = np.unique(np.asarray(tt, dtype=object), return_counts=True)
            ids.extend([did] * len(u))
            toks.extend(u.tolist())
            ks.extend(c.tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "k": pa.array(ks, pa.int64()),
            }
        )

    dt = docs_ds.map_batches(_doc_tokens, batch_format="pyarrow").materialize()
    counts = dt.groupby("token").aggregate(Sum("k", alias_name="cnt"))
    N = int(dt.sum("k"))
    joined = dt.join(counts, "inner", num_partitions, on=("token",))

    def _partial(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        k = t["k"].to_numpy()
        cnt = t["cnt"].to_numpy()
        contrib = k * -np.log(cnt / N)
        order = np.argsort(did, kind="stable")
        u, starts = np.unique(did[order], return_index=True)
        return pa.table(
            {
                "doc_id": u,
                "s": np.add.reduceat(contrib[order], starts),
                "n": np.add.reduceat(k[order], starts).astype(np.int64),
            }
        )

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n_tokens"))
    )

    def _final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "cross_entropy": round_half_away(
                    t["s"].to_numpy() / t["n_tokens"].to_numpy(), 6
                ),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def bigram_cross_entropy(docs_ds, num_partitions: int = 8):
    """Per-document cross-entropy under the corpus BIGRAM model — the
    conditional-LM upgrade of :func:`doc_cross_entropy` (a document whose
    word *transitions* are globally unusual scores high even when its
    unigrams are common): H₂(d) = −(1/m)·Σ ln(c(w₋₁,w)/c_left(w₋₁)) over
    the document's m bigram occurrences →
    Dataset(doc_id, n_bigrams, bigram_cross_entropy). Documents with < 2
    tokens have no bigrams and are dropped on both sides.

    Scale shape: pass 1 emits per-doc DISTINCT bigram counts (np.unique
    combiner); corpus bigram counts AND left-token totals both fold from
    the SAME table (two groupby-sums, no second corpus read); counts flow
    back through TWO bucket-joins (union-under-common-schema + md5-bucket
    groupby — never a driver-side vocabulary, never a chained
    ``Dataset.join``, which is schema-fragile on sparse partitions).
    ln-ulp noise ≪ the 6-decimal round."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def _doc_bigrams(b: pa.Table) -> pa.Table:
        ids: list[int] = []
        bgs: list[str] = []
        lefts: list[str] = []
        ks: list[int] = []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            tt = _tokens(t)
            if len(tt) < 2:
                continue
            pairs = np.asarray(
                [f"{a} {b_}" for a, b_ in zip(tt, tt[1:])], dtype=object
            )
            u, c = np.unique(pairs, return_counts=True)
            ids.extend([did] * len(u))
            bgs.extend(u.tolist())
            lefts.extend([x.split(" ", 1)[0] for x in u])
            ks.extend(c.tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bg": pa.array(bgs, pa.string()),
                "left": pa.array(lefts, pa.string()),
                "k": pa.array(ks, pa.int64()),
            }
        )

    from ..functions.hashing import md5_lower64

    dt = docs_ds.map_batches(_doc_bigrams, batch_format="pyarrow").materialize()
    cnt_bg = dt.groupby("bg").aggregate(Sum("k", alias_name="c12"))
    cnt_left = dt.groupby("left").aggregate(Sum("k", alias_name="cl"))
    B = np.uint64(max(num_partitions, 8))

    # Two bucket-joins (the repo's union-under-common-schema idiom — the
    # chained Dataset.join is schema-fragile on sparse partitions):
    # stage 1 attaches the left-token total to each VOCAB row (both sides
    # vocabulary-sized), stage 2 attaches (c12, cl) to the per-doc rows.
    def _sbucket(strs) -> np.ndarray:
        return (md5_lower64(strs) % B).astype(np.int32)

    def _bg_rows(t: pa.Table) -> pa.Table:
        bg = t["bg"].to_numpy(zero_copy_only=False)
        left = np.asarray([x.split(" ", 1)[0] for x in bg], dtype=object)
        z = np.zeros(len(bg), np.int64)
        return pa.table(
            {
                "key": pa.array(list(left), pa.string()),
                "bg": t["bg"],
                "c12": t["c12"].to_numpy().astype(np.int64),
                "cl": z,
                "is_dim": np.zeros(len(bg), bool),
                "b": _sbucket(left),
            }
        )

    def _left_rows(t: pa.Table) -> pa.Table:
        left = t["left"].to_numpy(zero_copy_only=False)
        z = np.zeros(len(left), np.int64)
        return pa.table(
            {
                "key": t["left"],
                "bg": pa.array([""] * len(left), pa.string()),
                "c12": z,
                "cl": t["cl"].to_numpy().astype(np.int64),
                "is_dim": np.ones(len(left), bool),
                "b": _sbucket(left),
            }
        )

    def _attach_cl(g: pa.Table) -> pa.Table:
        from .relational import _sorted_dim_lookup

        key = g["key"].to_numpy(zero_copy_only=False)
        is_dim = g["is_dim"].to_numpy(zero_copy_only=False)
        order, pos_c, _hit = _sorted_dim_lookup(key[is_dim], key[~is_dim])
        dcl = g["cl"].to_numpy()[is_dim][order]
        # every bigram's left token exists in cnt_left by construction
        return pa.table(
            {
                "bg": pa.array(list(g["bg"].to_numpy(zero_copy_only=False)[~is_dim]),
                               pa.string()),
                "c12": g["c12"].to_numpy()[~is_dim],
                "cl": dcl[pos_c],
            }
        )

    ratio = (
        cnt_bg.map_batches(_bg_rows, batch_format="pyarrow")
        .union(cnt_left.map_batches(_left_rows, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_attach_cl, batch_format="pyarrow")
    )

    def _dt_rows(t: pa.Table) -> pa.Table:
        bg = t["bg"].to_numpy(zero_copy_only=False)
        z = np.zeros(len(bg), np.int64)
        return pa.table(
            {
                "key": t["bg"],
                "doc_id": t["doc_id"].to_numpy().astype(np.int64),
                "k": t["k"].to_numpy().astype(np.int64),
                "c12": z,
                "cl": z,
                "is_dim": np.zeros(len(bg), bool),
                "b": _sbucket(bg),
            }
        )

    def _ratio_rows(t: pa.Table) -> pa.Table:
        bg = t["bg"].to_numpy(zero_copy_only=False)
        z = np.zeros(len(bg), np.int64)
        return pa.table(
            {
                "key": t["bg"],
                "doc_id": z,
                "k": z,
                "c12": t["c12"].to_numpy().astype(np.int64),
                "cl": t["cl"].to_numpy().astype(np.int64),
                "is_dim": np.ones(len(bg), bool),
                "b": _sbucket(bg),
            }
        )

    def _contrib(g: pa.Table) -> pa.Table:
        from .relational import _sorted_dim_lookup

        key = g["key"].to_numpy(zero_copy_only=False)
        is_dim = g["is_dim"].to_numpy(zero_copy_only=False)
        order, pos, _hit = _sorted_dim_lookup(key[is_dim], key[~is_dim])
        dc12 = g["c12"].to_numpy()[is_dim][order].astype(np.float64)
        dcl = g["cl"].to_numpy()[is_dim][order].astype(np.float64)
        did = g["doc_id"].to_numpy()[~is_dim]
        k = g["k"].to_numpy()[~is_dim]
        contrib = k * -np.log(dc12[pos] / dcl[pos])
        sorder = np.argsort(did, kind="stable")
        u, starts = np.unique(did[sorder], return_index=True)
        return pa.table(
            {
                "doc_id": u,
                "s": np.add.reduceat(contrib[sorder], starts)
                if len(u)
                else np.array([], np.float64),
                "n": (
                    np.add.reduceat(k[sorder], starts).astype(np.int64)
                    if len(u)
                    else np.array([], np.int64)
                ),
            }
        )

    agg = (
        dt.map_batches(_dt_rows, batch_format="pyarrow")
        .union(ratio.map_batches(_ratio_rows, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_contrib, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n_bigrams"))
    )

    def _final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": t["n_bigrams"],
                "bigram_cross_entropy": round_half_away(
                    t["s"].to_numpy() / t["n_bigrams"].to_numpy(), 6
                ),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def nb_classifier(
    docs_ds,
    label_col: str = "source",
    num_buckets: int = 32,
    num_partitions: int = 8,
):
    """Multinomial Naive Bayes document classifier with add-one smoothing
    (the CCNet / fastText-style linear domain filter, trained and applied
    in one pipeline) → Dataset(doc_id, pred, score):

        score(d, s) = ln P(s) − n_d·ln(tot_s + V) + Σ_{t∈d} k_t·ln(c_{t,s}+1)

    with P(s) the doc-count prior, tot_s the source's token total, V the
    corpus vocabulary size, c_{t,s} the source's token count. α = 1 makes
    every unseen-token term ln(1) = 0, so scoring needs ONLY the sparse
    (token seen in source) pairs — one Dataset join of per-doc token
    counts against the trained model on ``token``, never a dense
    doc × vocab product. ``pred`` is the argmax source over scores rounded
    to 6 decimals (ties → source ascending), the same round-then-rank
    determinism rule as ``knn_graph``; the ~1-ulp numpy-vs-DuckDB ``ln``
    noise sits ~8 orders below the round.

    Scale shape: model training is the vocab_topk combiner shape (in-batch
    (label, token) histograms, one groupby-sum); scoring is ONE join +
    per-batch partial sums; the final argmax resolves per doc-bucket
    vectorized (union of score partials and per-doc token totals under a
    common schema — the repo's bucket-groupby idiom, no chained joins).
    Labels with zero tokens in the corpus cannot be predicted (no
    likelihood exists) and are excluded from the grid on both sides; empty
    documents score ln P(s) alone and take the max-prior label.
    Per-label constants (priors, totals) are O(|labels|) driver state.
    """
    from ray.data.aggregate import Count, Sum

    def _doc_tok(b: pa.Table) -> pa.Table:
        ids: list[int] = []
        toks: list[str] = []
        lbls: list[str] = []
        ks: list[int] = []
        for did, lbl, t in zip(
            b["doc_id"].to_pylist(), b[label_col].to_pylist(), b["text"].to_pylist()
        ):
            tt = _tokens(t)
            if not tt:
                continue
            u, c = np.unique(np.asarray(tt, dtype=object), return_counts=True)
            ids.extend([did] * len(u))
            lbls.extend([lbl] * len(u))
            toks.extend(u.tolist())
            ks.extend(c.tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "label": pa.array(lbls, pa.string()),
                "token": pa.array(toks, pa.string()),
                "k": pa.array(ks, pa.int64()),
            }
        )

    dt = docs_ds.map_batches(_doc_tok, batch_format="pyarrow").materialize()
    model = (
        dt.groupby(["label", "token"])
        .aggregate(Sum("k", alias_name="c"))
        .materialize()
    )
    tot_rows = model.groupby("label").aggregate(Sum("c", alias_name="t")).take_all()
    vocab_size = dt.groupby("token").aggregate(Count()).count()
    prior_rows = docs_ds.groupby(label_col).aggregate(Count()).take_all()
    n_docs = sum(r["count()"] for r in prior_rows)
    prior_by_label = {r[label_col]: r["count()"] for r in prior_rows}

    labels = sorted(r["label"] for r in tot_rows)  # token-having labels only
    if not labels:
        return docs_ds.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pred": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
    lidx = {s: i for i, s in enumerate(labels)}
    t_by_label = {r["label"]: r["t"] for r in tot_rows}
    ln_prior = np.array(
        [np.log(prior_by_label[s] / n_docs) for s in labels], dtype=np.float64
    )
    ln_tot = np.array(
        [np.log(float(t_by_label[s] + vocab_size)) for s in labels],
        dtype=np.float64,
    )

    sj = dt.select_columns(["doc_id", "token", "k"]).join(
        model, "inner", num_partitions, on=("token",)
    )

    def _partial(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy()
        li = np.array([lidx[s] for s in b["label"].to_pylist()], dtype=np.int64)
        s = b["k"].to_numpy() * np.log(b["c"].to_numpy() + 1.0)
        key = did * np.int64(len(labels)) + li
        uk, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(uk), dtype=np.float64)
        np.add.at(acc, inv, s)
        return pa.table(
            {
                "doc_id": uk // np.int64(len(labels)),
                "li": (uk % np.int64(len(labels))).astype(np.int64),
                "s": acc,
                "tag": np.zeros(len(uk), dtype=np.int8),
            }
        )

    def _nd(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy()
        n = np.array(
            [len(_tokens(t)) for t in b["text"].to_pylist()], dtype=np.float64
        )
        return pa.table(
            {
                "doc_id": did,
                "li": np.zeros(len(did), dtype=np.int64),
                "s": n,
                "tag": np.ones(len(did), dtype=np.int8),
            }
        )

    parts = sj.map_batches(_partial, batch_format="pyarrow").union(
        docs_ds.map_batches(_nd, batch_format="pyarrow")
    )

    def _bucket(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy()
        return b.append_column(
            "bkt", pa.array((did % num_buckets).astype(np.int32))
        )

    def _resolve(g: pa.Table) -> pa.Table:
        did = g["doc_id"].to_numpy()
        li = g["li"].to_numpy()
        s = g["s"].to_numpy()
        tag = g["tag"].to_numpy()
        docs = np.unique(did)
        di = {int(v): i for i, v in enumerate(docs)}
        row = np.array([di[int(v)] for v in did], dtype=np.int64)
        n = np.zeros(len(docs), dtype=np.float64)
        n[row[tag == 1]] = s[tag == 1]
        scores = ln_prior[None, :] - n[:, None] * ln_tot[None, :]
        m = tag == 0
        np.add.at(scores, (row[m], li[m]), s[m])
        scores = round_half_away(scores, 6)
        best = scores.argmax(axis=1)  # first max = label-asc tie-break
        return pa.table(
            {
                "doc_id": docs,
                "pred": pa.array([labels[i] for i in best], pa.string()),
                "score": scores[np.arange(len(docs)), best],
            }
        )

    return (
        parts.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(_resolve, batch_format="pyarrow")
    )


def zipf_slope(docs_ds):
    """Corpus Zipf-law fit → one row (n_types, n_tokens, slope, intercept):
    OLS of ln(freq) on ln(rank) over the full ranked vocabulary (rank 1 =
    most frequent, ties broken token-asc so ranks are total). A healthy
    natural-language corpus fits slope ≈ −1 (Zipf 1949); templated or
    synthetic text bends the tail — a one-number corpus-health check.

    Scale shape: the ``vocab_topk`` combiner builds (token, cnt) with one
    shuffle; ranks come from the distributed sort ordinal (TeraSort
    two-phase — no driver vocabulary); each batch then folds exact float
    moments of (ln rank, ln cnt) and ONE tiny aggregate finishes the
    closed-form slope/intercept. ln-sum order noise ~1e-12 sits far below
    the 6-decimal round (doc_cross_entropy's stated posture)."""
    from ray.data.aggregate import Sum

    from ..stages.sort import sort_with_ordinal

    def _partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(_tokens(t))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {"token": pa.array(u.tolist(), pa.string()), "cnt": c.astype(np.int64)}
        )

    vocab = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    ranked = sort_with_ordinal(vocab, ["cnt", "token"], descending=[True, False])

    def _moments(t: pa.Table) -> pa.Table:
        x = np.log(t["ordinal"].to_numpy() + 1.0)  # rank, 1-based
        y = np.log(t["cnt"].to_numpy().astype(np.float64))
        return pa.table(
            {
                "n": np.array([len(x)], np.int64),
                "ntok": np.array([int(t["cnt"].to_numpy().sum())], np.int64),
                "sx": np.array([x.sum()]),
                "sy": np.array([y.sum()]),
                "sxy": np.array([(x * y).sum()]),
                "sxx": np.array([(x * x).sum()]),
            }
        )

    m = (
        ranked.map_batches(_moments, batch_format="pyarrow")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("ntok", alias_name="ntok"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
    )
    n = float(m["n"])
    sx, sy, sxy, sxx = (float(m[k]) for k in ("sx", "sy", "sxy", "sxx"))
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den if den > 0 else 0.0
    intercept = (sy - slope * sx) / n if n > 0 else 0.0
    return pa.table(
        {
            "n_types": pa.array([int(m["n"])], pa.int64()),
            "n_tokens": pa.array([int(m["ntok"])], pa.int64()),
            "slope": round_half_away(np.array([slope]), 6),
            "intercept": round_half_away(np.array([intercept]), 6),
        }
    )


def curriculum_buckets(docs_ds, k: int = 4):
    """Curriculum-learning split → Dataset(doc_id, n_tokens, cross_entropy,
    bucket): NTILE(k) difficulty buckets over the corpus-unigram
    perplexity score (``doc_cross_entropy``), ordered (cross_entropy ASC,
    doc_id ASC) — bucket 1 = the easiest quarter, the order
    easy-to-hard curricula feed batches in (Bengio et al. 2009,
    "Curriculum Learning"). The tile is computed with the SAME
    distributed-sort-ordinal closed form as ``customer_rfm`` (NTILE
    without a window engine, nothing materialized on the driver); the
    ordering key is the round-6 score both sides emit, so the cut is
    deterministic."""
    from ..stages.sort import sort_with_ordinal

    ce = doc_cross_entropy(docs_ds).materialize()
    n = ce.count()
    K = np.int64(k)

    def _tile(t: pa.Table) -> pa.Table:
        p = t["ordinal"].to_numpy()
        small = np.int64(n) // K
        n_big = np.int64(n) % K
        cut = n_big * (small + 1)
        tile = np.where(
            p < cut,
            p // np.maximum(small + 1, 1),
            n_big + (p - cut) // np.maximum(small, 1),
        ) + 1
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "cross_entropy": t["cross_entropy"],
                "bucket": tile.astype(np.int64),
            }
        )

    return sort_with_ordinal(ce, ["cross_entropy", "doc_id"]).map_batches(
        _tile, batch_format="pyarrow"
    )


def source_mixture_weights(docs_ds, round_to: int = 6):
    """Data-mixing weights per source: how much to over/under-sample each
    source so the training mixture hits a UNIFORM token share →
    (source, n_tokens, token_share, weight) with weight =
    (1/|sources|)/token_share. The op every multi-source pretraining
    pipeline runs before sampling (mixture re-weighting).

    Scale shape: one pass, per-batch (source → token-count) partials
    (the exchange carries one row per source per batch), one tiny
    groupby-sum; |sources| rows reach the driver. Shares/weights are
    single IEEE divisions of exact ints, rounded half-away at 6."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def _partial(b: pa.Table) -> pa.Table:
        src = b["source"].to_numpy(zero_copy_only=False)
        ntok = np.array([len(_tokens(t)) for t in b["text"].to_pylist()], np.int64)
        u, inv = np.unique(src, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, ntok)
        return pa.table(
            {"source": pa.array(list(u), pa.string()), "n": s}
        )

    tot = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_tokens"))
        .to_pandas()  # |sources| rows
    )
    T = int(tot["n_tokens"].sum())
    S = len(tot)
    share = tot["n_tokens"].to_numpy() / T if T else np.zeros(S)
    weight = np.where(share > 0, (1.0 / S) / np.where(share > 0, share, 1.0), 0.0)
    import pandas as pd

    return pd.DataFrame(
        {
            "source": tot["source"],
            "n_tokens": tot["n_tokens"].astype(np.int64),
            "token_share": round_half_away(share, round_to),
            "weight": round_half_away(weight, round_to),
        }
    )


def train_val_test_split(docs_ds, train_pct: int = 80, val_pct: int = 10,
                         key_col: str = "doc_id"):
    """Deterministic train/val/test corpus split — the leakage-free
    assignment every training pipeline needs: the split is a pure
    function of the row key, so it is stable across runs, parallelism
    levels, and re-shards (a document can never drift between splits):

        bucket = ((key · 2654435761 + 40503) mod 2³¹) mod 100
        split  = train if bucket < train_pct, val if < train_pct+val_pct,
                 else test

    Salted (+40503) so the bucket is independent of
    :func:`stratified_sample`'s keep-hash — sampling then splitting does
    not bias either. Pure BIGINT arithmetic (all intermediates < 2⁶³),
    reproducible in SQL; keys are normalized to the non-negative ring
    first so numpy's floored ``%`` and SQL's truncated ``%`` agree.
    One vectorized map_batches — no shuffle, no state."""
    ring = np.int64(1) << 31
    cut1, cut2 = np.int64(train_pct), np.int64(train_pct + val_pct)

    def _split(t: pa.Table) -> pa.Table:
        key = t[key_col].to_numpy().astype(np.int64)
        b = (
            ((key % ring) * np.int64(2654435761) + np.int64(40503)) % ring
        ) % np.int64(100)
        lab = np.where(b < cut1, "train", np.where(b < cut2, "val", "test"))
        return t.append_column("split", pa.array(lab, type=pa.string()))

    return docs_ds.map_batches(_split, batch_format="pyarrow")


_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_IP_RE = re.compile(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")


def redact_pii_batch(batch: pa.Table) -> pa.Table:
    """PII scrubbing — the pre-release redaction pass every public-corpus
    pipeline runs: replace e-mail addresses then IPv4 literals with typed
    placeholders → (doc_id, clean_text, n_emails, n_ips).

    Both patterns use only syntax with IDENTICAL semantics in Python ``re``
    and DuckDB's RE2 (character classes, bounded/unbounded repeats — no
    backrefs, no lookaround), and both engines substitute non-overlapping
    matches left-to-right, so ``regexp_replace(..., 'g')`` reproduces the
    output byte-for-byte. E-mails are replaced FIRST so an address's host
    part is never double-counted as an IP-like token. Pure linear
    map_batches; compiled patterns are module-level (no per-batch setup).
    """
    texts = batch["text"].to_pylist()
    n = len(texts)
    n_em = np.empty(n, dtype=np.int64)
    n_ip = np.empty(n, dtype=np.int64)
    out = []
    for i, t in enumerate(texts):
        t2, c_em = _EMAIL_RE.subn("<EMAIL>", t)
        t3, c_ip = _IP_RE.subn("<IP>", t2)
        n_em[i], n_ip[i] = c_em, c_ip
        out.append(t3)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "clean_text": pa.array(out, pa.string()),
            "n_emails": n_em,
            "n_ips": n_ip,
        }
    )


redact_pii = _stage(redact_pii_batch)


def collocations_topk(docs_ds, k: int = 50, min_count: int = 5, num_buckets: int = 32):
    """Corpus collocation extraction — the ``k`` adjacent-token bigrams most
    associated by (linear) pointwise mutual information
    → Dataset(w1, w2, pair_cnt, score).

    score = (c₁₂ · T²) / (B · c₁ · c₂) — the PMI argument before the log
    (log is monotone, so the ranking is identical) — ONE IEEE division of
    exact int64 products, bit-identical to the SQL oracle. (At full corpus
    scale the products exceed 2⁵³: switch to log-space there; the
    exact-int form is the oracle-checkable contract.) Ties broken
    (score DESC, w1 ASC, w2 ASC) — a total order.

    Scale shape — combine-before-shuffle everywhere: each batch emits its
    OWN bigram + unigram histograms (``np.unique``); shuffle 1 groups by
    hash(w1) and joins c₁ to each bigram inside ``map_groups`` (the
    unigram partials ride the same exchange); shuffle 2 regroups by
    hash(w2) — bigram rows and globally-folded unigram rows share ONE
    unified schema, so the union is a plain concatenation — and joins c₂,
    filters ``min_count``, scores. T and B fold from the materialized
    narrow partials with two scalar sums. Text never enters a shuffle.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import hash64

    def _partials(batch: pa.Table) -> pa.Table:
        toks_all, big_all = [], []
        for t in batch["text"].to_pylist():
            tt = _space_tokens(t)
            toks_all.extend(tt)
            big_all.extend(tt[j] + " " + tt[j + 1] for j in range(len(tt) - 1))
        if not toks_all:
            return pa.table(
                {
                    "b": pa.array([], pa.int32()),
                    "side": pa.array([], pa.int8()),
                    "key": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        uu, cu = np.unique(np.asarray(toks_all, dtype=object), return_counts=True)
        if big_all:
            ub, cb = np.unique(np.asarray(big_all, dtype=object), return_counts=True)
            w1 = np.asarray([x.split(" ", 1)[0] for x in ub], dtype=object)
            bb = (hash64(w1) % np.uint64(num_buckets)).astype(np.int32)
        else:
            ub = np.asarray([], dtype=object)
            cb = np.asarray([], np.int64)
            bb = np.asarray([], np.int32)
        return pa.table(
            {
                "b": np.concatenate(
                    [bb, (hash64(uu) % np.uint64(num_buckets)).astype(np.int32)]
                ),
                "side": np.concatenate(
                    [np.zeros(len(ub), np.int8), np.ones(len(uu), np.int8)]
                ),
                "key": np.concatenate([ub, uu]),
                "cnt": np.concatenate([cb.astype(np.int64), cu.astype(np.int64)]),
            }
        )

    partials = docs_ds.map_batches(_partials, batch_format="pyarrow").materialize()
    # T (tokens) and B (bigrams): two scalar folds over the narrow partials
    side_sum = lambda want: int(  # noqa: E731
        partials.map_batches(
            lambda t, w=want: pa.table(
                {"s": [int(pc.sum(t.filter(pc.equal(t["side"], w))["cnt"]).as_py() or 0)]}
            ),
            batch_format="pyarrow",
        ).sum("s")
        or 0
    )
    B, T = side_sum(0), side_sum(1)

    # unified intermediate schema: (b2, side, key=bigram|word, c12, c1, c)
    def _join_c1(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "b2": pa.array([], pa.int32()),
                "side": pa.array([], pa.int8()),
                "key": pa.array([], pa.string()),
                "c12": pa.array([], pa.int64()),
                "c1": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        side = g["side"].to_numpy()
        key = g["key"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy()
        uni, big = side == 1, side == 0
        uk, ukcode = np.unique(key[uni], return_inverse=True)
        uc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(uc, ukcode, cnt[uni])
        if not big.any():
            return empty
        bk, bkcode = np.unique(key[big], return_inverse=True)
        bc = np.zeros(len(bk), dtype=np.int64)
        np.add.at(bc, bkcode, cnt[big])
        w1 = np.asarray([x.split(" ", 1)[0] for x in bk], dtype=object)
        if len(uk):
            pos = np.minimum(np.searchsorted(uk, w1), len(uk) - 1)
            c1 = np.where(uk[pos] == w1, uc[pos], 0).astype(np.int64)
        else:
            c1 = np.zeros(len(bk), dtype=np.int64)
        w2 = np.asarray([x.split(" ", 1)[1] for x in bk], dtype=object)
        return pa.table(
            {
                "b2": (hash64(w2) % np.uint64(num_buckets)).astype(np.int32),
                "side": np.zeros(len(bk), np.int8),
                "key": bk,
                "c12": bc,
                "c1": c1,
                "c": np.zeros(len(bk), np.int64),
            }
        )

    def _uni_fold(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy()
        key = g["key"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy()
        uni = side == 1
        if not uni.any():
            return pa.table(
                {
                    "b2": pa.array([], pa.int32()),
                    "side": pa.array([], pa.int8()),
                    "key": pa.array([], pa.string()),
                    "c12": pa.array([], pa.int64()),
                    "c1": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        uk, code = np.unique(key[uni], return_inverse=True)
        uc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(uc, code, cnt[uni])
        return pa.table(
            {
                "b2": (hash64(uk) % np.uint64(num_buckets)).astype(np.int32),
                "side": np.ones(len(uk), np.int8),
                "key": uk,
                "c12": np.zeros(len(uk), np.int64),
                "c1": np.zeros(len(uk), np.int64),
                "c": uc,
            }
        )

    bigram_rows = partials.groupby("b").map_groups(_join_c1, batch_format="pyarrow")
    uni_rows = partials.groupby("b").map_groups(_uni_fold, batch_format="pyarrow")

    def _join_c2(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy()
        key = g["key"].to_numpy(zero_copy_only=False)
        uni, big = side == 1, side == 0
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "pair_cnt": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if not big.any():
            return empty
        uk = key[uni].astype(object)
        order = np.argsort(uk)
        uk = uk[order]
        uc = g["c"].to_numpy()[uni][order].astype(np.int64)
        bg = key[big].astype(object)
        c12 = g["c12"].to_numpy()[big].astype(np.int64)
        c1 = g["c1"].to_numpy()[big].astype(np.int64)
        w1 = np.asarray([x.split(" ", 1)[0] for x in bg], dtype=object)
        w2 = np.asarray([x.split(" ", 1)[1] for x in bg], dtype=object)
        if len(uk):
            pos = np.minimum(np.searchsorted(uk, w2), len(uk) - 1)
            c2 = np.where(uk[pos] == w2, uc[pos], 0).astype(np.int64)
        else:
            c2 = np.zeros(len(bg), dtype=np.int64)
        keep = (c12 >= min_count) & (c1 > 0) & (c2 > 0)
        num = c12[keep] * np.int64(T) * np.int64(T)
        den = np.int64(B) * c1[keep] * c2[keep]
        score = num / np.maximum(den, 1)
        return pa.table(
            {
                "w1": pa.array(w1[keep].tolist(), pa.string()),
                "w2": pa.array(w2[keep].tolist(), pa.string()),
                "pair_cnt": c12[keep],
                "score": score,
            }
        )

    merged = bigram_rows.union(uni_rows).groupby("b2").map_groups(
        _join_c2, batch_format="pyarrow"
    )
    return merged.sort(["score", "w1", "w2"], descending=[True, False, False]).limit(k)


def duplicate_ngram_fraction(docs_ds, n: int = 5, num_buckets: int = 32,
                             round_to: int = 6):
    """Cross-document duplicate-n-gram fraction — the FineWeb/RefinedWeb
    dedup-health signal: per document, the share of its DISTINCT word
    n-grams that occur in ≥ 2 documents corpus-wide → (doc_id, n_grams,
    n_dup, dup_frac). Documents shorter than ``n`` tokens emit no rows.

    Scale shape: each batch emits (md5-hash, doc_id) rows for its distinct
    grams (hashes, never gram strings, enter the exchange); ONE
    gram-hash-bucketed groupby counts distinct docs per gram and folds
    per-doc (total, dup) partials inside the bucket; a doc_id groupby sums
    the partials. The fraction is one int/int IEEE division +
    round-half-away, bit-equal to the SQL oracle."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_lower64
    from ..functions.rounding import round_half_away

    B = np.int64(num_buckets)

    def _grams(batch: pa.Table) -> pa.Table:
        ids, hs = [], []
        for d, t in zip(batch["doc_id"].to_numpy(), batch["text"].to_pylist()):
            g = _word_ngrams_unique(_space_tokens(t), n)
            if len(g):
                ids.append(np.full(len(g), d, np.int64))
                hs.append(md5_lower64(g))
        if not ids:
            return pa.table(
                {"h": np.array([], np.int64), "doc_id": np.array([], np.int64),
                 "b": np.array([], np.int32)}
            )
        h = np.concatenate(hs)
        return pa.table(
            {
                "h": h.view(np.int64),
                "doc_id": np.concatenate(ids),
                "b": (h % np.uint64(B)).astype(np.int32),
            }
        )

    def _mark(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        d = g["doc_id"].to_numpy()
        _, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        dup = cnt[inv] >= 2
        dk, dinv = np.unique(d, return_inverse=True)
        tot = np.bincount(dinv, minlength=len(dk)).astype(np.int64)
        nd = np.zeros(len(dk), np.int64)
        np.add.at(nd, dinv, dup.astype(np.int64))
        return pa.table({"doc_id": dk, "t": tot, "d": nd})

    per_doc = (
        docs_ds.map_batches(_grams, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_mark, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("t", alias_name="n_grams"), Sum("d", alias_name="n_dup"))
    )

    def _frac(t: pa.Table) -> pa.Table:
        tot = t["n_grams"].to_numpy().astype(np.int64)
        nd = t["n_dup"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].to_numpy().astype(np.int64),
                "n_grams": tot,
                "n_dup": nd,
                "dup_frac": round_half_away(nd / tot, round_to),
            }
        )

    return per_doc.map_batches(_frac, batch_format="pyarrow")


def tfidf_cosine_pairs(docs_ds, n_docs: int, n: int = 3, min_df: int = 2,
                       max_df: int = 20, scale: int = 10000,
                       tau: float = 0.1, num_buckets: int = 32,
                       round_to: int = 6):
    """All-pairs TF-IDF cosine similarity over word-n-gram terms — the
    Bayardo et al. WWW'07 sparse all-pairs shape: documents are sparse
    TF-IDF vectors over their word n-grams; every pair sharing ≥ 1
    retained term is scored; pairs with cosine ≥ ``tau`` survive →
    (doc_a, doc_b, cos).  Terms with df < ``min_df`` contribute nothing
    (no pair shares them) and terms with df > ``max_df`` are stop-terms
    (sklearn's max_df pruning) — the pruning bounds per-term pair fanout
    at C(max_df, 2), which is what makes all-pairs tractable at corpus
    scale.

    Scale shape: THREE bucketed exchanges, hashes/ints only. (1) term-hash
    bucket: df + integer TF-IDF weights (round-half-away of
    tf·ln(N/df)·scale, so DuckDB reproduces them bit-exactly), emitting
    per-doc norm partials and per-pair dot-product partials expanded
    within the term group; (2) doc_a bucket: norms fold per doc, pair
    partials fold per pair and pick up ‖a‖²; (3) doc_b bucket: pairs pick
    up ‖b‖²; cos = int-dot / sqrt(double·double) is ONE division + ONE
    sqrt, identical op order to the SQL oracle. The corpus text never
    re-enters an exchange and the driver never sees a vector."""
    from ..functions.hashing import md5_lower64
    from ..functions.rounding import round_half_away

    B = np.int64(num_buckets)
    ND = float(n_docs)

    def _grams(batch: pa.Table) -> pa.Table:
        ids, hs, tfs = [], [], []
        for d, t in zip(batch["doc_id"].to_numpy(), batch["text"].to_pylist()):
            toks = _space_tokens(t)
            if len(toks) < n:
                continue
            joined = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
            h = md5_lower64(np.asarray(joined, dtype=object))
            uh, cnt = np.unique(h, return_counts=True)
            ids.append(np.full(len(uh), d, np.int64))
            hs.append(uh)
            tfs.append(cnt.astype(np.int64))
        if not ids:
            return pa.table(
                {"h": np.array([], np.int64), "doc_id": np.array([], np.int64),
                 "tf": np.array([], np.int64), "b": np.array([], np.int32)}
            )
        h = np.concatenate(hs)
        return pa.table(
            {
                "h": h.view(np.int64),
                "doc_id": np.concatenate(ids),
                "tf": np.concatenate(tfs),
                "b": (h % np.uint64(B)).astype(np.int32),
            }
        )

    def _weights(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        doc = g["doc_id"].to_numpy()
        tf = g["tf"].to_numpy()
        order = np.lexsort((doc, h))
        h, doc, tf = h[order], doc[order], tf[order]
        uh, inv, df = np.unique(h, return_inverse=True, return_counts=True)
        keep = (df[inv] >= min_df) & (df[inv] <= max_df)
        doc, tf, inv = doc[keep], tf[keep], inv[keep]
        dff = df[inv].astype(np.float64)
        wi = round_half_away(
            tf.astype(np.float64) * np.log(ND / dff) * float(scale), 0
        ).astype(np.int64)
        # per-doc norm partials
        dk, dinv = np.unique(doc, return_inverse=True)
        ss = np.zeros(len(dk), np.int64)
        np.add.at(ss, dinv, wi * wi)
        # per-pair dot partials: docs sorted asc within each term group
        starts = np.nonzero(np.r_[True, inv[1:] != inv[:-1]])[0]
        ends = np.r_[starts[1:], len(inv)]
        pa_, pb_, pv_ = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            dv, wv = doc[s:e], wi[s:e]
            ia, ib = np.triu_indices(m, k=1)
            pa_.append(dv[ia]); pb_.append(dv[ib]); pv_.append(wv[ia] * wv[ib])
        if pa_:
            da = np.concatenate(pa_); db = np.concatenate(pb_)
            dp = np.concatenate(pv_)
            o = np.lexsort((db, da))
            da, db, dp = da[o], db[o], dp[o]
            first = np.ones(len(da), bool)
            first[1:] = (da[1:] != da[:-1]) | (db[1:] != db[:-1])
            idx = np.nonzero(first)[0]
            da, db, dp = da[first], db[first], np.add.reduceat(dp, idx)
        else:
            da = db = dp = np.array([], np.int64)
        ka = np.concatenate([dk, da])
        kb = np.concatenate([np.full(len(dk), -1, np.int64), db])
        val = np.concatenate([ss, dp])
        return pa.table(
            {"ka": ka, "kb": kb, "val": val, "na": np.zeros(len(ka), np.int64),
             "b2": (ka % B).astype(np.int32)}
        )

    def _attach_na(g: pa.Table) -> pa.Table:
        ka = g["ka"].to_numpy()
        kb = g["kb"].to_numpy()
        val = g["val"].to_numpy()
        nm = kb == -1
        dk, dinv = np.unique(ka[nm], return_inverse=True)
        ss = np.zeros(len(dk), np.int64)
        np.add.at(ss, dinv, val[nm])
        da, db, dp = ka[~nm], kb[~nm], val[~nm]
        o = np.lexsort((db, da))
        da, db, dp = da[o], db[o], dp[o]
        if len(da):
            first = np.ones(len(da), bool)
            first[1:] = (da[1:] != da[:-1]) | (db[1:] != db[:-1])
            idx = np.nonzero(first)[0]
            da, db, dp = da[first], db[first], np.add.reduceat(dp, idx)
        na = ss[np.searchsorted(dk, da)] if len(da) else np.array([], np.int64)
        ka_out = np.concatenate([dk, da])
        kb_out = np.concatenate([np.full(len(dk), -1, np.int64), db])
        val_out = np.concatenate([ss, dp])
        na_out = np.concatenate([np.zeros(len(dk), np.int64), na])
        bkey = np.where(kb_out == -1, ka_out, kb_out)
        return pa.table(
            {"ka": ka_out, "kb": kb_out, "val": val_out, "na": na_out,
             "b2": (bkey % B).astype(np.int32)}
        )

    def _attach_nb(g: pa.Table) -> pa.Table:
        ka = g["ka"].to_numpy()
        kb = g["kb"].to_numpy()
        val = g["val"].to_numpy()
        na = g["na"].to_numpy()
        nm = kb == -1
        dk = ka[nm]
        ss = val[nm]
        o = np.argsort(dk)
        dk, ss = dk[o], ss[o]
        da, db, dp, naa = ka[~nm], kb[~nm], val[~nm], na[~nm]
        nb = ss[np.searchsorted(dk, db)] if len(da) else np.array([], np.int64)
        cos = round_half_away(
            dp.astype(np.float64)
            / np.sqrt(naa.astype(np.float64) * nb.astype(np.float64)),
            round_to,
        )
        keep = cos >= tau
        o = np.lexsort((db[keep], da[keep]))
        return pa.table(
            {"doc_a": da[keep][o], "doc_b": db[keep][o], "cos": cos[keep][o]}
        )

    return (
        docs_ds.map_batches(_grams, batch_format="pyarrow")
        .groupby("b").map_groups(_weights, batch_format="pyarrow")
        .groupby("b2").map_groups(_attach_na, batch_format="pyarrow")
        .groupby("b2").map_groups(_attach_nb, batch_format="pyarrow")
    )


def source_gram_overlap(docs_ds, n: int = 5, num_buckets: int = 32):
    """Cross-source content-leakage matrix: for every pair of corpus
    sources, the number of DISTINCT word n-grams appearing in documents of
    BOTH sources → (source_a, source_b, n_shared), source_a < source_b.
    The pairwise complement of :func:`duplicate_ngram_fraction` — it tells
    you WHICH sources share boilerplate/content, the first question after
    a dedup-health alarm at corpus scale.

    Scale shape: hashes-only exchange — each batch emits distinct
    (gram-hash, source-id) pairs (sources dictionary-encoded to int at the
    batch boundary); ONE gram-bucket groupby expands each gram's sorted
    source set into pairs (deduped per gram) and emits per-pair partials;
    the final fold is over a source²-sized table (tiny at any corpus
    scale). Source names rejoin from the broadcast dictionary."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_lower64

    B = np.int64(num_buckets)

    def _grams(batch: pa.Table) -> pa.Table:
        srcs, hs = [], []
        for s, t in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
            g = _word_ngrams_unique(_space_tokens(t), n)
            if len(g):
                srcs.append(np.full(len(g), hash_src(s), np.int64))
                hs.append(md5_lower64(g))
        if not srcs:
            return pa.table(
                {"h": np.array([], np.int64), "src": np.array([], np.int64),
                 "b": np.array([], np.int32)}
            )
        h = np.concatenate(hs)
        src = np.concatenate(srcs)
        # distinct (h, src) within the batch
        o = np.lexsort((src, h.view(np.int64)))
        hv, src = h.view(np.int64)[o], src[o]
        keep = np.ones(len(hv), bool)
        keep[1:] = (hv[1:] != hv[:-1]) | (src[1:] != src[:-1])
        hv, src = hv[keep], src[keep]
        return pa.table(
            {"h": hv, "src": src,
             "b": (hv.view(np.uint64) % np.uint64(B)).astype(np.int32)}
        )

    def _pairs(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        src = g["src"].to_numpy()
        o = np.lexsort((src, h))
        h, src = h[o], src[o]
        keep = np.ones(len(h), bool)  # cross-batch (h, src) dedup
        keep[1:] = (h[1:] != h[:-1]) | (src[1:] != src[:-1])
        h, src = h[keep], src[keep]
        starts = np.nonzero(np.r_[True, h[1:] != h[:-1]])[0]
        ends = np.r_[starts[1:], len(h)]
        aa, bb = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, k=1)
            aa.append(src[s:e][ia]); bb.append(src[s:e][ib])
        if not aa:
            return pa.table({"sa": np.array([], np.int64),
                             "sb": np.array([], np.int64),
                             "n": np.array([], np.int64)})
        sa, sb = np.concatenate(aa), np.concatenate(bb)
        key, cnt = np.unique(sa << np.int64(32) | sb, return_counts=True)
        return pa.table(
            {"sa": key >> np.int64(32), "sb": key & np.int64(0xFFFFFFFF),
             "n": cnt.astype(np.int64)}
        )

    # dictionary-encode sources on the driver: the source set is a small
    # fixed vocabulary (a dim), so the dictionary broadcast is cheap
    src_names = sorted(
        set(docs_ds.select_columns(["source"]).unique("source"))
    )
    sid = {s: i for i, s in enumerate(src_names)}

    def hash_src(s: str) -> int:
        return sid[s]

    df = (
        docs_ds.map_batches(_grams, batch_format="pyarrow")
        .groupby("b").map_groups(_pairs, batch_format="pyarrow")
        .to_pandas()
        .groupby(["sa", "sb"], sort=True)["n"].sum().reset_index()
    )
    names = np.asarray(src_names, dtype=object)
    return pa.table(
        {
            "source_a": pa.array(list(names[df["sa"].to_numpy()]), pa.string()),
            "source_b": pa.array(list(names[df["sb"].to_numpy()]), pa.string()),
            "n_shared": df["n"].to_numpy().astype(np.int64),
        }
    )


def source_kl(docs_ds, num_buckets: int = 32, round_to: int = 6):
    """Domain-shift detector: per corpus source, the KL divergence of its
    unigram distribution from the corpus-wide distribution →
    (source, kl, n_tokens). D(Pₛ‖P) = Σ_t (c_st/nₛ)·ln((c_st/nₛ)/(c_t/n))
    from EXACT integer counts — the standard "how different is this
    source's language" screen when balancing a training mixture
    (complements :func:`source_mixture_weights`, which reweights, and
    lang_id, which classifies).

    Scale shape: pass 1 folds per-source token totals (a source-sized
    table, broadcast back); pass 2 is ONE token-hash-bucketed exchange of
    per-batch (source-id, token-hash, count) partials — each bucket owns
    its tokens' GLOBAL counts, so every KL term is computed exactly once,
    inside the bucket, and only per-source float partials leave. Every
    ratio is formed in the same op order as the SQL (c·1.0/n before the
    ln), so agreement is within one ulp per term (well inside the 1e-9
    gate; the term SUM order is the only non-mirrored reduction)."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_lower64

    B = np.int64(num_buckets)

    src_names = sorted(set(docs_ds.select_columns(["source"]).unique("source")))
    sid = {s: i for i, s in enumerate(src_names)}

    def _counts(batch: pa.Table) -> pa.Table:
        sids, hs, cs = [], [], []
        for s, t in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
            toks = _space_tokens(t)
            if not toks:
                continue
            h = md5_lower64(np.asarray(toks, dtype=object))
            uh, cnt = np.unique(h, return_counts=True)
            sids.append(np.full(len(uh), sid[s], np.int64))
            hs.append(uh.view(np.int64))
            cs.append(cnt.astype(np.int64))
        if not sids:
            return pa.table(
                {"sid": np.array([], np.int64), "h": np.array([], np.int64),
                 "c": np.array([], np.int64), "b": np.array([], np.int32)}
            )
        h = np.concatenate(hs)
        return pa.table(
            {
                "sid": np.concatenate(sids),
                "h": h,
                "c": np.concatenate(cs),
                "b": (h.view(np.uint64) % np.uint64(B)).astype(np.int32),
            }
        )

    counted = docs_ds.map_batches(_counts, batch_format="pyarrow").materialize()

    # pass 1: per-source token totals (source-sized — broadcast back)
    tot = (
        counted.groupby("sid").aggregate(Sum("c", alias_name="n")).to_pandas()
    )
    ns = np.zeros(len(src_names), np.int64)
    ns[tot["sid"].to_numpy()] = tot["n"].to_numpy()
    n_all = float(int(ns.sum()))
    ns_f = ns.astype(np.float64)

    def _kl(g: pa.Table) -> pa.Table:
        s = g["sid"].to_numpy()
        h = g["h"].to_numpy()
        c = g["c"].to_numpy()
        # fold duplicate (sid, h) partials from different batches
        order = np.lexsort((s, h))
        s, h, c = s[order], h[order], c[order]
        start = np.ones(len(h), bool)
        start[1:] = (h[1:] != h[:-1]) | (s[1:] != s[:-1])
        idx = np.nonzero(start)[0]
        s, h, c = s[start], h[start], np.add.reduceat(c, idx)
        # global token counts (bucket owns all rows of its tokens)
        uh, hinv = np.unique(h, return_inverse=True)
        ct = np.zeros(len(uh), np.int64)
        np.add.at(ct, hinv, c)
        p_s = c * 1.0 / ns_f[s]
        p_t = ct[hinv] * 1.0 / n_all
        term = p_s * np.log(p_s / p_t)
        kl = np.zeros(len(src_names), np.float64)
        np.add.at(kl, s, term)
        present = np.unique(s)  # keep exact-zero partials (p_s ≡ p_t)
        return pa.table({"sid": present, "kl": kl[present]})

    parts = (
        counted.groupby("b").map_groups(_kl, batch_format="pyarrow")
        .groupby("sid").aggregate(Sum("kl", alias_name="kl"))
        .to_pandas().sort_values("sid")
    )
    sids = parts["sid"].to_numpy().astype(np.int64)
    names = np.asarray(src_names, dtype=object)
    from ..functions.rounding import round_half_away

    return pa.table(
        {
            "source": pa.array(list(names[sids]), pa.string()),
            "kl": round_half_away(parts["kl"].to_numpy(), round_to),
            "n_tokens": ns[sids],
        }
    )


def pii_density_by_source(docs_ds, round_to: int = 6):
    """Per-source PII exposure rollup — the go/no-go release metric on
    top of :func:`redact_pii`'s per-document scrub: → (source, n_docs,
    n_emails, n_ips, docs_with_pii, pii_rate). A source whose rate spikes
    gets quarantined before the redaction pass is even run.

    Scale shape: one linear map_batches COUNTING matches only (the
    redaction rewrite is skipped — counts are what the rollup needs),
    per-batch partials per source, one source-sized groupby; rate = one
    int/int division + round-half-away (bit-exact vs SQL). Same
    re/RE2-compatible patterns as redact_pii (counted e-mails-first so
    an address's host is never double-counted as an IP)."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def _count(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        srcs = batch["source"].to_pylist()
        agg: dict[str, list[int]] = {}
        for s, t in zip(srcs, texts):
            t2, c_em = _EMAIL_RE.subn("<EMAIL>", t)
            c_ip = len(_IP_RE.findall(t2))
            a = agg.setdefault(s, [0, 0, 0, 0])
            a[0] += 1
            a[1] += c_em
            a[2] += c_ip
            a[3] += 1 if (c_em or c_ip) else 0
        keys = sorted(agg)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "d": pa.array([agg[k][0] for k in keys], pa.int64()),
                "e": pa.array([agg[k][1] for k in keys], pa.int64()),
                "i": pa.array([agg[k][2] for k in keys], pa.int64()),
                "p": pa.array([agg[k][3] for k in keys], pa.int64()),
            }
        )

    out = (
        docs_ds.map_batches(_count, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("d", alias_name="n_docs"),
            Sum("e", alias_name="n_emails"),
            Sum("i", alias_name="n_ips"),
            Sum("p", alias_name="docs_with_pii"),
        )
        .to_pandas()
        .sort_values("source")
    )
    nd = out["n_docs"].to_numpy().astype(np.int64)
    dp = out["docs_with_pii"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "source": pa.array(out["source"].to_numpy(), pa.string()),
            "n_docs": nd,
            "n_emails": out["n_emails"].to_numpy().astype(np.int64),
            "n_ips": out["n_ips"].to_numpy().astype(np.int64),
            "docs_with_pii": dp,
            "pii_rate": round_half_away(dp / nd, round_to),
        }
    )


def ngram_novelty(docs_ds, n: int = 5, num_buckets: int = 32,
                  round_to: int = 6):
    """Per-document content novelty in corpus order — the "is this doc
    adding anything" curation signal (the mirror of
    :func:`duplicate_ngram_fraction`'s corpus-health view): a doc's
    DISTINCT word n-gram is NOVEL iff no lower-doc_id document contains
    it → (doc_id, n_grams, n_novel, novelty). Streams ordered corpora
    (e.g. by crawl date) to find where marginal novelty collapses.

    Scale shape: identical to duplicate_ngram_fraction — (gram-hash,
    doc_id) rows, ONE gram-bucket groupby that computes each gram's MIN
    doc_id and folds per-doc (total, novel) partials in-bucket, then a
    doc_id groupby sums. One int/int division + round-half-away."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_lower64
    from ..functions.rounding import round_half_away

    B = np.int64(num_buckets)

    def _grams(batch: pa.Table) -> pa.Table:
        ids, hs = [], []
        for d, t in zip(batch["doc_id"].to_numpy(), batch["text"].to_pylist()):
            g = _word_ngrams_unique(_space_tokens(t), n)
            if len(g):
                ids.append(np.full(len(g), d, np.int64))
                hs.append(md5_lower64(g))
        if not ids:
            return pa.table(
                {"h": np.array([], np.int64), "doc_id": np.array([], np.int64),
                 "b": np.array([], np.int32)}
            )
        h = np.concatenate(hs)
        return pa.table(
            {
                "h": h.view(np.int64),
                "doc_id": np.concatenate(ids),
                "b": (h % np.uint64(B)).astype(np.int32),
            }
        )

    def _mark(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        d = g["doc_id"].to_numpy()
        uh, hinv = np.unique(h, return_inverse=True)
        first = np.full(len(uh), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, hinv, d)
        novel = first[hinv] == d
        dk, dinv = np.unique(d, return_inverse=True)
        tot = np.bincount(dinv, minlength=len(dk)).astype(np.int64)
        nv = np.zeros(len(dk), np.int64)
        np.add.at(nv, dinv, novel.astype(np.int64))
        return pa.table({"doc_id": dk, "t": tot, "nv": nv})

    per_doc = (
        docs_ds.map_batches(_grams, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_mark, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("t", alias_name="n_grams"), Sum("nv", alias_name="n_novel"))
    )

    def _frac(t: pa.Table) -> pa.Table:
        tot = t["n_grams"].to_numpy().astype(np.int64)
        nv = t["n_novel"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].to_numpy().astype(np.int64),
                "n_grams": tot,
                "n_novel": nv,
                "novelty": round_half_away(nv / tot, round_to),
            }
        )

    return per_doc.map_batches(_frac, batch_format="pyarrow")


def doclen_histogram(docs_ds, bucket_tokens: int = 64):
    """Corpus sequence-length profile: documents histogrammed by
    whitespace-token count in ``bucket_tokens``-wide buckets →
    (len_bucket, bucket_lo, n_docs). The first thing to look at before
    choosing :func:`chunk_documents` / ``pack_sequences`` parameters —
    packing efficiency is a pure function of this histogram.

    Scale shape: one linear map_batches emitting per-batch bucket
    partials; a bucket-count-sized fold. Token counts use the corpus
    convention (whitespace split, empties dropped)."""
    from ray.data.aggregate import Sum

    W = np.int64(bucket_tokens)

    def _partial(batch: pa.Table) -> pa.Table:
        n = np.array(
            [len(_space_tokens(t)) for t in batch["text"].to_pylist()],
            np.int64,
        )
        b = n // W
        u, c = np.unique(b, return_counts=True)
        return pa.table({"len_bucket": u, "n": c.astype(np.int64)})

    out = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("len_bucket")
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
        .sort_values("len_bucket")
    )
    lb = out["len_bucket"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "len_bucket": lb,
            "bucket_lo": lb * int(W),
            "n_docs": out["n_docs"].to_numpy().astype(np.int64),
        }
    )


def split_leakage(docs_ds, train_pct: int = 80, val_pct: int = 10,
                  num_buckets: int = 32):
    """Train/val/test LEAKAGE audit: distinct text hashes appearing in
    MORE THAN ONE split of :func:`train_val_test_split` →
    (split_a, split_b, n_shared_texts), lexicographic pairs. The release
    gate after splitting: any nonzero row means eval numbers are
    contaminated by memorizable duplicates.

    Scale shape: one linear pass emits distinct (text-hash, split-id)
    pairs per batch (split recomputed from the SAME pure-BIGINT
    arithmetic as the split op — no join back); ONE hash-bucket groupby
    dedups globally and expands each hash's split set into pairs; the
    fold is 3×3-sized."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_lower64

    B = np.int64(num_buckets)
    ring = np.int64(1) << 31
    cut1, cut2 = np.int64(train_pct), np.int64(train_pct + val_pct)
    code = {"train": 1, "val": 2, "test": 0}

    def _pairs(batch: pa.Table) -> pa.Table:
        key = batch["doc_id"].to_numpy().astype(np.int64)
        b = (
            ((key % ring) * np.int64(2654435761) + np.int64(40503)) % ring
        ) % np.int64(100)
        sid = np.where(b < cut1, code["train"],
                       np.where(b < cut2, code["val"], code["test"]))
        h = md5_lower64(np.asarray(batch["text"].to_pylist(), dtype=object))
        hv = h.view(np.int64)
        k = np.unique(hv << np.int64(2) | sid)  # split id < 4
        hv2 = k >> np.int64(2)
        return pa.table(
            {"h": hv2, "sid": (k & np.int64(3)),
             "b": (hv2.view(np.uint64) % np.uint64(B)).astype(np.int32)}
        )

    def _expand(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        sid = g["sid"].to_numpy()
        k = np.unique(h << np.int64(2) | sid)
        h, sid = k >> np.int64(2), k & np.int64(3)
        starts = np.nonzero(np.r_[True, h[1:] != h[:-1]])[0]
        ends = np.r_[starts[1:], len(h)]
        aa, bb = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ss = np.sort(sid[s:e])
            ia, ib = np.triu_indices(len(ss), k=1)
            aa.append(ss[ia]); bb.append(ss[ib])
        if not aa:
            return pa.table({"sa": np.array([], np.int64),
                             "sb": np.array([], np.int64),
                             "n": np.array([], np.int64)})
        sa, sb = np.concatenate(aa), np.concatenate(bb)
        key, cnt = np.unique(sa << np.int64(2) | sb, return_counts=True)
        return pa.table(
            {"sa": key >> np.int64(2), "sb": key & np.int64(3),
             "n": cnt.astype(np.int64)}
        )

    raw = (
        docs_ds.map_batches(_pairs, batch_format="pyarrow")
        .groupby("b").map_groups(_expand, batch_format="pyarrow")
        .to_pandas()
    )
    empty = pa.table(
        {
            "split_a": pa.array([], pa.string()),
            "split_b": pa.array([], pa.string()),
            "n_shared_texts": pa.array([], pa.int64()),
        }
    )
    if len(raw) == 0:  # clean corpus: an all-empty groupby drops columns
        return empty
    df = raw.groupby(["sa", "sb"], sort=True)["n"].sum().reset_index()
    # split codes 0=test, 1=train, 2=val are chosen so numeric order ==
    # lexicographic name order — pairs sorted by code are already sorted
    # by name
    code_names = np.asarray(["test", "train", "val"], dtype=object)
    return pa.table(
        {
            "split_a": pa.array(
                list(code_names[df["sa"].to_numpy()]), pa.string()
            ),
            "split_b": pa.array(
                list(code_names[df["sb"].to_numpy()]), pa.string()
            ),
            "n_shared_texts": df["n"].to_numpy().astype(np.int64),
        }
    )


def dup_cluster_histogram(docs_ds, num_buckets: int = 32):
    """Exact-duplicate cluster-size distribution: texts grouped by md5,
    clusters histogrammed by size → (cluster_size, n_clusters). The
    shape of this histogram decides the dedup strategy: a fat tail of
    big clusters = boilerplate (cheap wins); all-2 clusters = true
    near-dups (needs MinHash).

    Scale shape: per-batch (hash, count) partials, ONE hash groupby, a
    cluster-size-sized second fold."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_lower64

    def _partial(batch: pa.Table) -> pa.Table:
        h = md5_lower64(np.asarray(batch["text"].to_pylist(), dtype=object))
        u, c = np.unique(h.view(np.int64), return_counts=True)
        return pa.table({"h": u, "n": c.astype(np.int64)})

    per_hash = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
    )

    def _sizes(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["n"].to_numpy().astype(np.int64), return_counts=True)
        return pa.table({"cluster_size": u, "nc": c.astype(np.int64)})

    out = (
        per_hash.map_batches(_sizes, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("nc", alias_name="n_clusters"))
        .to_pandas()
        .sort_values("cluster_size")
    )
    return pa.table(
        {
            "cluster_size": out["cluster_size"].to_numpy().astype(np.int64),
            "n_clusters": out["n_clusters"].to_numpy().astype(np.int64),
        }
    )


def gram_entropy(docs_ds, n: int = 3, num_buckets: int = 32,
                 round_to: int = 6):
    """Corpus n-gram Shannon entropy → one row (n_total, n_distinct,
    entropy): H = ln N − (Σ c·ln c)/N over exact integer n-gram counts.
    The one-number redundancy gauge — entropy collapse after a pipeline
    change means boilerplate flooded in (duplicate_ngram_fraction's
    aggregate cousin).

    Scale shape: hashed-gram exchange, ONE gram-bucket groupby owning
    each gram's global count; buckets emit (Σc, distinct, Σ c·ln c)
    partials; the driver folds three numbers. The c·ln c sum is the only
    float reduction (same tolerance note as source_kl)."""
    from ..functions.hashing import md5_lower64

    B = np.int64(num_buckets)

    def _grams(batch: pa.Table) -> pa.Table:
        hs, cs = [], []
        for t in batch["text"].to_pylist():
            toks = _space_tokens(t)
            if len(toks) < n:
                continue
            joined = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
            h = md5_lower64(np.asarray(joined, dtype=object))
            uh, cnt = np.unique(h, return_counts=True)
            hs.append(uh.view(np.int64))
            cs.append(cnt.astype(np.int64))
        if not hs:
            return pa.table({"h": np.array([], np.int64),
                             "c": np.array([], np.int64),
                             "b": np.array([], np.int32)})
        h = np.concatenate(hs)
        return pa.table(
            {"h": h, "c": np.concatenate(cs),
             "b": (h.view(np.uint64) % np.uint64(B)).astype(np.int32)}
        )

    def _fold(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        c = g["c"].to_numpy()
        uh, hinv = np.unique(h, return_inverse=True)
        ct = np.zeros(len(uh), np.int64)
        np.add.at(ct, hinv, c)
        return pa.table(
            {
                "tot": np.array([int(ct.sum())], np.int64),
                "dist": np.array([len(uh)], np.int64),
                "clnc": np.array(
                    [float(np.sum(ct.astype(np.float64) * np.log(ct.astype(np.float64))))],
                    np.float64,
                ),
            }
        )

    out = (
        docs_ds.map_batches(_grams, batch_format="pyarrow")
        .groupby("b").map_groups(_fold, batch_format="pyarrow")
        .to_pandas()
    )
    from ..functions.rounding import round_half_away

    N = int(out["tot"].sum())
    dist = int(out["dist"].sum())
    clnc = float(out["clnc"].sum())
    ent = np.log(np.float64(N)) - clnc / np.float64(N)
    return pa.table(
        {
            "n_total": np.array([N], np.int64),
            "n_distinct": np.array([dist], np.int64),
            "entropy": round_half_away(np.array([ent]), round_to),
        }
    )


def lexical_diversity(docs_ds, round_to: int = 6):
    """Per-document lexical-diversity profile → (doc_id, n_tokens,
    n_types, ttr, avg_token_len): type–token ratio (distinct/total
    whitespace tokens) and mean token length — the classic "is this doc
    degenerate boilerplate or real prose" curation signals (a TTR near 0
    means the doc repeats a tiny vocabulary; avg token length far from
    ~4–6 chars flags code/garbage). Docs with zero tokens are omitted
    (mirrors the SQL oracle, where ``unnest`` yields no rows for them).

    Scale shape: ONE stateless ``map_batches`` — every statistic is
    computed inside the batch from that row's own text (no vocabulary
    shuffle, no cross-doc state), so it streams at any corpus size.
    Divisions are single IEEE ops on exact int64 counts, rounded
    half-away-from-zero to match DuckDB ``round()`` bit-exactly."""

    def _stats(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        n_tok = np.zeros(len(texts), np.int64)
        n_typ = np.zeros(len(texts), np.int64)
        s_len = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            toks = _tokens(t)
            n_tok[i] = len(toks)
            n_typ[i] = len(set(toks))
            s_len[i] = sum(len(x) for x in toks)
        keep = n_tok > 0
        n_tok, n_typ, s_len = n_tok[keep], n_typ[keep], s_len[keep]
        return pa.table(
            {
                "doc_id": doc_ids[keep],
                "n_tokens": n_tok,
                "n_types": n_typ,
                "ttr": round_half_away(
                    n_typ.astype(np.float64) / n_tok.astype(np.float64), round_to
                ),
                "avg_token_len": round_half_away(
                    s_len.astype(np.float64) / n_tok.astype(np.float64), round_to
                ),
            }
        )

    return docs_ds.map_batches(_stats, batch_format="pyarrow")


def hapax_stats(docs_ds, round_to: int = 6):
    """Corpus hapax-legomenon gauge → ONE row (n_tokens_total, n_vocab,
    n_hapax, hapax_fraction = hapax/vocab, hapax_token_share =
    hapax/total tokens). A healthy natural corpus sits near the Zipfian
    ~50 % hapax fraction; a low value screams template/duplicated text,
    a very high one screams OCR noise — the companion corpus-health
    number to :func:`zipf_slope` and :func:`gram_entropy`.

    Scale shape: per-batch (token, count) histograms (``np.unique``
    combiner — the exchange moves per-batch vocabularies, bounded by
    Heaps' law, never one row per occurrence) → ONE ``groupby(token)``
    sum → per-output-batch 3-int partials → a constant-size driver fold.
    The two divisions are single IEEE ops on exact ints."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(_tokens(t))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {"token": pa.array(u.tolist(), pa.string()), "cnt": c.astype(np.int64)}
        )

    def _fold(batch: pa.Table) -> pa.Table:
        c = batch["cnt"].to_numpy()
        return pa.table(
            {
                "tot": np.array([int(c.sum())], np.int64),
                "voc": np.array([len(c)], np.int64),
                "hap": np.array([int((c == 1).sum())], np.int64),
            }
        )

    out = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(_fold, batch_format="pyarrow")
        .to_pandas()
    )
    tot = int(out["tot"].sum())
    voc = int(out["voc"].sum())
    hap = int(out["hap"].sum())
    return pa.table(
        {
            "n_tokens_total": np.array([tot], np.int64),
            "n_vocab": np.array([voc], np.int64),
            "n_hapax": np.array([hap], np.int64),
            "hapax_fraction": round_half_away(
                np.array([hap / voc if voc else 0.0]), round_to
            ),
            "hapax_token_share": round_half_away(
                np.array([hap / tot if tot else 0.0]), round_to
            ),
        }
    )


def lang_source_chi2(docs_ds, round_to: int = 6):
    """Chi-square independence audit of the declared lang × source
    contingency table → one row per observed cell (lang, source,
    observed, expected, contrib) where expected = row·col/total and
    contrib = (observed·total − row·col)² / (total·row·col) — the
    per-cell Pearson X² term. A cell with a large contrib is a
    lang/source pairing far off the independence hypothesis (a scraper
    pulling the wrong language, a source dominating one language).
    Per-cell output (no float grand total) keeps every value a single
    IEEE op on exact integer counts, so the SQL oracle reproduces it
    bit-exactly at any scale.

    Scale shape: per-batch (lang, source) count combine (exchange is
    O(|langs|·|sources|) per batch, constant for any corpus) → ONE tiny
    groupby-sum → driver computes marginals from the folded cells in
    arbitrary-precision Python ints (observed·total and row·col overflow
    int64 near 10¹² docs; HUGEINT mirrors exactly)."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_pylist()
        src = batch["source"].to_pylist()
        keys = np.asarray(
            [f"{a}\x00{s}" for a, s in zip(lang, src)], dtype=object
        )
        if len(keys) == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()),
                 "source": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        u, c = np.unique(keys, return_counts=True)
        pairs = [k.split("\x00") for k in u]
        return pa.table(
            {"lang": pa.array([p[0] for p in pairs], pa.string()),
             "source": pa.array([p[1] for p in pairs], pa.string()),
             "n": c.astype(np.int64)}
        )

    cells = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = cells.groupby("lang")["n"].sum().to_dict()
    cols = cells.groupby("source")["n"].sum().to_dict()
    total = int(cells["n"].sum())
    lang_v, src_v, obs_v, exp_v, contrib_v = [], [], [], [], []
    from ..functions.rounding import round_half_away

    for r in cells.itertuples():
        o, rr, cc = int(r.n), int(rows[r.lang]), int(cols[r.source])
        num = np.float64(o * total - rr * cc)
        lang_v.append(r.lang)
        src_v.append(r.source)
        obs_v.append(o)
        exp_v.append(np.float64(rr * cc) / np.float64(total))
        contrib_v.append(num * num / np.float64(total * rr * cc))
    return pa.table(
        {
            "lang": pa.array(lang_v, pa.string()),
            "source": pa.array(src_v, pa.string()),
            "observed": pa.array(obs_v, pa.int64()),
            "expected": round_half_away(np.asarray(exp_v, np.float64), round_to),
            "contrib": round_half_away(np.asarray(contrib_v, np.float64), round_to),
        }
    )


def lang_log_odds(docs_ds, k: int = 10, round_to: int = 6):
    """Distinguishing terms per language by informative-Dirichlet
    LOG-ODDS z-score (Monroe, Colaresi & Quinn 2008, "Fightin' Words"),
    flat prior α_w = 1, α₀ = |V| → top-``k`` tokens per lang by
    z = (ln((y+1)/(n_L+V−y−1)) − ln((y'+1)/(n_rest+V−y'−1))) / √(1/(y+1)
    + 1/(y'+1)), y' the token's count OUTSIDE the lang — the
    "what words make this slice different" report; raw frequency ranks
    stopwords, log-odds cancels them.

    Scale shape: per-batch (token, lang) count combine (Heaps-bounded
    exchange) → ONE token groupby emitting (token, lang, y, yw, first)
    rows (yw = the token's corpus count, first = 1 on one row per token
    so |V| folds as a plain Sum) → the vocab-sized intermediate is
    materialized ONCE; scalar marginals (per-lang totals, corpus total,
    |V|) fold from it and broadcast; the z pass is stateless map_batches
    with per-batch per-lang top-k partials, so the driver folds ≤
    k·L·#batches rows. Every z is a fixed chain of single IEEE ops on
    exact ints, rounded half-away BEFORE ranking (round-then-rank) so
    the SQL oracle reproduces the cut exactly."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        keys: list[str] = []
        for lg, t in zip(langs, batch["text"].to_pylist()):
            keys.extend(f"{lg}\x00{w}" for w in _tokens(t))
        if not keys:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "lang": pa.array([], pa.string()),
                 "y": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(keys, dtype=object), return_counts=True)
        pairs = [s.split("\x00", 1) for s in u]
        return pa.table(
            {"token": pa.array([p[1] for p in pairs], pa.string()),
             "lang": pa.array([p[0] for p in pairs], pa.string()),
             "y": c.astype(np.int64)}
        )

    def _per_token(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby(["token", "lang"], as_index=False)["y"].sum()
        df = df.sort_values(["token", "lang"])
        yw = df.groupby("token")["y"].transform("sum")
        tok = df["token"].tolist()
        first = np.ones(len(tok), np.int64)
        first[1:] = [int(tok[i] != tok[i - 1]) for i in range(1, len(tok))]
        return pa.table(
            {"token": pa.array(tok, pa.string()),
             "lang": pa.array(df["lang"].tolist(), pa.string()),
             "y": df["y"].to_numpy(np.int64),
             "yw": yw.to_numpy(np.int64),
             "first": first}
        )

    g = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .map_groups(_per_token, batch_format="pyarrow")
        .materialize()
    )
    V = int(g.sum("first"))
    N = int(g.sum("y"))
    n_by_lang = {
        r["lang"]: int(r["sum(y)"])
        for r in g.groupby("lang").sum("y").take_all()
    }

    def _z(t: pa.Table) -> pa.Table:
        lang = np.asarray(t["lang"].to_pylist(), dtype=object)
        tok = np.asarray(t["token"].to_pylist(), dtype=object)
        y = t["y"].to_numpy().astype(np.int64)
        yw = t["yw"].to_numpy().astype(np.int64)
        nl = np.array([n_by_lang[x] for x in lang], np.int64)
        yj = yw - y
        a = (y + 1).astype(np.float64) / (nl + V - y - 1).astype(np.float64)
        b = (yj + 1).astype(np.float64) / (
            (N - nl) + V - yj - 1
        ).astype(np.float64)
        delta = np.log(a) - np.log(b)
        var = 1.0 / (y + 1).astype(np.float64) + 1.0 / (yj + 1).astype(
            np.float64
        )
        z = round_half_away(delta / np.sqrt(var), round_to)
        # per-batch per-lang top-k partial (z desc, token asc)
        keep = np.zeros(len(z), bool)
        for lg in np.unique(lang):
            m = np.nonzero(lang == lg)[0]
            order = sorted(m.tolist(), key=lambda i: (-z[i], tok[i]))
            keep[order[:k]] = True
        return pa.table(
            {"lang": pa.array(lang[keep].tolist(), pa.string()),
             "token": pa.array(tok[keep].tolist(), pa.string()),
             "y": y[keep], "z": z[keep]}
        )

    cand = g.map_batches(_z, batch_format="pyarrow").to_pandas()
    out = []
    for lg, grp in cand.groupby("lang"):
        grp = grp.sort_values(
            ["z", "token"], ascending=[False, True]
        ).head(k)
        out.append(grp)
    res = (
        __import__("pandas").concat(out).sort_values(["lang", "token"])
        if out else cand
    )
    return pa.table(
        {"lang": pa.array(res["lang"].tolist(), pa.string()),
         "token": pa.array(res["token"].tolist(), pa.string()),
         "y": res["y"].to_numpy(np.int64),
         "z": res["z"].to_numpy(np.float64)}
    )


def rrf_fusion(docs_ds, terms, k: int = 10, c: int = 60, round_to: int = 6):
    """Reciprocal-Rank-Fusion of the two ranked-retrieval systems
    (Cormack, Clarke & Büttcher SIGIR'09): fuse :func:`bm25_topk` and
    :func:`search_topk` top-``k`` lists by rrf = Σ 1/(c + rank) over the
    systems that returned the doc → (doc_id, bm25_rank, search_rank,
    rrf), absent rank = −1. RRF is THE zero-tuning way to combine
    lexical rankers — it only consumes ranks, so the systems' scores
    never need calibrating against each other.

    Scale shape: both inputs are already top-k folds (each ≤ k rows on
    the driver by construction); the fusion itself is O(k). Every rrf
    term is ONE division on exact ints, summed in fixed system order,
    rounded half-away — bit-exact vs the SQL mirror."""
    from ..functions.rounding import round_half_away

    b = bm25_topk(docs_ds, terms, k=k).to_pandas()
    s = search_topk(docs_ds, terms, k=k).to_pandas()
    branks = {int(r.doc_id): int(r.rank) for r in b.itertuples()}
    sranks = {int(r.doc_id): i + 1 for i, r in enumerate(s.itertuples())}
    docs = sorted(set(branks) | set(sranks))
    br = np.array([branks.get(d, -1) for d in docs], np.int64)
    sr = np.array([sranks.get(d, -1) for d in docs], np.int64)
    rrf = np.where(br > 0, 1.0 / (c + br).astype(np.float64), 0.0) + np.where(
        sr > 0, 1.0 / (c + sr).astype(np.float64), 0.0
    )
    return pa.table(
        {
            "doc_id": np.asarray(docs, np.int64),
            "bm25_rank": br,
            "search_rank": sr,
            "rrf": round_half_away(rrf, round_to),
        }
    )


_VOWEL_RUN_RE = re.compile(r"[aeiouyAEIOUY]+")


def readability_by_source(docs_ds, round_to: int = 6):
    """Per-source Flesch-style readability panel → (source, n_docs,
    n_words, n_sentences, n_syllables, words_per_sentence,
    syllables_per_word, flesch): the classic reading-ease screen a
    curation pipeline runs per provenance bucket to spot sources whose
    prose is degenerate (legalese, OCR noise, keyword-stuffed spam).
    Deterministic proxies keep it SQL-auditable: a "syllable" is a
    maximal vowel run ``[aeiouyAEIOUY]+`` (the standard cheap estimator),
    a sentence terminator is any of ``. ! ?`` (clamped to >=1 per doc so
    fragments count as one sentence), a word is a space-delimited token.
    Docs with zero words are omitted on both sides (mirrors the SQL
    oracle, where they contribute no tokens).

    Scale shape: ONE stateless ``map_batches`` computing per-batch
    per-source int64 partial sums (the combiner — the exchange moves a
    handful of rows per batch, never per-doc rows) → ONE small
    ``groupby(source)`` sum → a constant-size ratio map. The two ratios
    are single IEEE divisions on exact int64 sums; ``flesch`` is
    evaluated from the ROUNDED ratios with the literal expression
    ``206.835 - 1.015*wps - 84.6*spw`` so DuckDB reproduces it bit-exactly.
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        texts = batch["text"].to_pylist()
        agg: dict[str, list[int]] = {}
        for s, t in zip(srcs, texts):
            toks = [x for x in t.split(" ") if x]
            nw = len(toks)
            if nw == 0:
                continue
            ns = t.count(".") + t.count("!") + t.count("?")
            if ns < 1:
                ns = 1
            ny = len(_VOWEL_RUN_RE.findall(t))
            a = agg.setdefault(s, [0, 0, 0, 0])
            a[0] += 1
            a[1] += nw
            a[2] += ns
            a[3] += ny
        keys = sorted(agg)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
                "n_words": pa.array([agg[k][1] for k in keys], pa.int64()),
                "n_sentences": pa.array([agg[k][2] for k in keys], pa.int64()),
                "n_syllables": pa.array([agg[k][3] for k in keys], pa.int64()),
            }
        )

    def _ratios(batch: pa.Table) -> pa.Table:
        nw = batch["n_words"].to_numpy().astype(np.float64)
        ns = batch["n_sentences"].to_numpy().astype(np.float64)
        ny = batch["n_syllables"].to_numpy().astype(np.float64)
        wps = round_half_away(nw / ns, round_to)
        spw = round_half_away(ny / nw, round_to)
        flesch = round_half_away(206.835 - 1.015 * wps - 84.6 * spw, round_to)
        return pa.table(
            {
                "source": batch["source"],
                "n_docs": batch["n_docs"],
                "n_words": batch["n_words"],
                "n_sentences": batch["n_sentences"],
                "n_syllables": batch["n_syllables"],
                "words_per_sentence": wps,
                "syllables_per_word": spw,
                "flesch": flesch,
            }
        )

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_sentences", alias_name="n_sentences"),
            Sum("n_syllables", alias_name="n_syllables"),
        )
        .map_batches(_ratios, batch_format="pyarrow")
    )


def heaps_law_curve(docs_ds, n_buckets: int = 10):
    """Heaps'-law vocabulary-growth curve → ``n_buckets`` rows (bucket,
    n_docs_cum, tokens_cum, vocab_cum): distinct-token count after each
    decile of the corpus in ``doc_id`` order — the standard "is the
    vocabulary still growing or has the corpus gone stale/duplicated"
    curation gauge (healthy natural text grows ~N^0.5±; a flattening
    curve screams template reuse). All-integer output → hash-exact.

    Scale shape (three narrow passes, no wide shuffle of text):
    (1) decile boundaries = exact order statistics of the ``doc_id``
    column via the TeraSort ordinal machine (``sort_with_ordinal`` —
    sorts ONE int64 column, then a 10-row filter+take; the driver holds
    10 scalars); (2) vocab pass: per-batch (token → min bucket) combiner
    partials → ONE ``groupby(token).min`` → 10-int histogram partials
    folded on the driver; (3) occupancy pass: per-batch 10-row
    (bucket, docs, occurrences) partials → driver fold. Buckets are
    assigned by ``searchsorted`` against the broadcast 10-value boundary
    array — no doc→bucket table ever materializes."""
    from ray.data.aggregate import Min
    from ..stages.sort import sort_with_ordinal

    ids = docs_ds.select_columns(["doc_id"])
    n_total = ids.count()
    if n_total < n_buckets:
        raise ValueError(f"need >= {n_buckets} docs, got {n_total}")
    ranks = {(n_total * b) // n_buckets - 1 for b in range(1, n_buckets + 1)}

    def _pick(batch: pa.Table) -> pa.Table:
        keep = np.isin(batch["ordinal"].to_numpy(), np.fromiter(ranks, np.int64))
        return batch.filter(pa.array(keep))

    brows = (
        sort_with_ordinal(ids, "doc_id")
        .map_batches(_pick, batch_format="pyarrow")
        .take_all()
    )
    bounds = np.sort(np.array([r["doc_id"] for r in brows], dtype=np.int64))

    def _vocab_partial(batch: pa.Table) -> pa.Table:
        buckets = np.searchsorted(bounds, batch["doc_id"].to_numpy(), "left") + 1
        first: dict[str, int] = {}
        for t, b in zip(batch["text"].to_pylist(), buckets):
            bi = int(b)
            for w in t.split(" "):
                if w and (w not in first or first[w] > bi):
                    first[w] = bi
        return pa.table(
            {
                "token": pa.array(list(first.keys()), pa.string()),
                "bucket": pa.array(list(first.values()), pa.int64()),
            }
        )

    def _vocab_hist(batch: pa.Table) -> pa.Table:
        cnt = np.bincount(batch["bucket"].to_numpy(), minlength=n_buckets + 1)
        return pa.table(
            {
                "bucket": np.arange(1, n_buckets + 1, dtype=np.int64),
                "vnew": cnt[1:].astype(np.int64),
            }
        )

    vhist = (
        docs_ds.map_batches(_vocab_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Min("bucket", alias_name="bucket"))
        .map_batches(_vocab_hist, batch_format="pyarrow")
        .to_pandas()
    )
    vnew = vhist.groupby("bucket")["vnew"].sum().reindex(
        range(1, n_buckets + 1), fill_value=0
    )

    def _occ_partial(batch: pa.Table) -> pa.Table:
        buckets = np.searchsorted(bounds, batch["doc_id"].to_numpy(), "left") + 1
        nd = np.bincount(buckets, minlength=n_buckets + 1)
        occ = np.zeros(n_buckets + 1, dtype=np.int64)
        for t, b in zip(batch["text"].to_pylist(), buckets):
            occ[int(b)] += sum(1 for w in t.split(" ") if w)
        return pa.table(
            {
                "bucket": np.arange(1, n_buckets + 1, dtype=np.int64),
                "nd": nd[1:].astype(np.int64),
                "occ": occ[1:],
            }
        )

    ohist = (
        docs_ds.map_batches(_occ_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("bucket")[["nd", "occ"]]
        .sum()
        .reindex(range(1, n_buckets + 1), fill_value=0)
    )
    return pa.table(
        {
            "bucket": np.arange(1, n_buckets + 1, dtype=np.int64),
            "n_docs_cum": ohist["nd"].cumsum().to_numpy().astype(np.int64),
            "tokens_cum": ohist["occ"].cumsum().to_numpy().astype(np.int64),
            "vocab_cum": vnew.cumsum().to_numpy().astype(np.int64),
        }
    )


def lang_confusion(docs_ds):
    """Language-metadata audit crosstab → Dataset(lang, lang_pred, n_docs):
    the declared ``lang`` column × the ``lang_id_batch`` prediction — the
    confusion matrix a curation pipeline uses to decide whether crawl
    metadata is trustworthy enough to filter on (off-diagonal mass =
    mislabeled docs that a lang-filter would wrongly keep/drop).

    Scale shape: identical to :func:`lang_by_source` — one linear pass
    (lang kernel + in-batch pair-count combiner), one tiny groupby-sum;
    exchange volume is O(|langs|²) rows per batch. All-integer output."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        pred = lang_id_batch(batch)["lang_pred"].to_pylist()
        dec = batch["lang"].to_pylist()
        keys = np.asarray([f"{d}\x00{p}" for d, p in zip(dec, pred)], dtype=object)
        if len(keys) == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "lang_pred": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        u, c = np.unique(keys, return_counts=True)
        pairs = [k.split("\x00") for k in u]
        return pa.table(
            {
                "lang": pa.array([p[0] for p in pairs], pa.string()),
                "lang_pred": pa.array([p[1] for p in pairs], pa.string()),
                "n_docs": c.astype(np.int64),
            }
        )

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def token_freq_spectrum(docs_ds, cap: int = 11):
    """Zipfian frequency-of-frequencies spectrum → ``cap`` rows
    (occur_cap, n_types, n_occurrences): how many distinct tokens occur
    exactly c times (c = 1..cap-1) plus one tail row at ``occur_cap =
    cap`` pooling everything rarer-than-rare — the companion diagnostic
    to :func:`hapax_stats` (the full spectrum shape distinguishes natural
    Zipf decay from template-duplicated corpora, which show a hollow
    mid-spectrum). All-integer output → hash-exact.

    Scale shape: per-batch (token, count) combiner partials (bounded by
    Heaps' law) → ONE ``groupby(token)`` sum → per-output-batch
    ``cap``-row histogram partials → constant-size driver fold."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(x for x in t.split(" ") if x)
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {"token": pa.array(u.tolist(), pa.string()), "cnt": c.astype(np.int64)}
        )

    def _hist(batch: pa.Table) -> pa.Table:
        c = batch["cnt"].to_numpy()
        capped = np.minimum(c, cap)
        types = np.bincount(capped, minlength=cap + 1)[1:]
        occ = np.bincount(capped, weights=c.astype(np.float64), minlength=cap + 1)[1:]
        return pa.table(
            {
                "occur_cap": np.arange(1, cap + 1, dtype=np.int64),
                "n_types": types.astype(np.int64),
                "n_occurrences": occ.astype(np.int64),
            }
        )

    hist = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(_hist, batch_format="pyarrow")
        .to_pandas()
        .groupby("occur_cap")[["n_types", "n_occurrences"]]
        .sum()
        .reindex(range(1, cap + 1), fill_value=0)
    )
    return pa.table(
        {
            "occur_cap": np.arange(1, cap + 1, dtype=np.int64),
            "n_types": hist["n_types"].to_numpy().astype(np.int64),
            "n_occurrences": hist["n_occurrences"].to_numpy().astype(np.int64),
        }
    )


def doclen_percentiles_by_lang(docs_ds, pcts=(25, 50, 75, 90, 99)):
    """Per-language exact document-length percentiles → Dataset-shaped
    table (lang, n_docs, p25, p50, p75, p90, p99): the length-distribution
    audit behind per-language length filters (a lang whose p50 collapses
    is a boilerplate leak; cutting at a GLOBAL length threshold silently
    biases against terse-script languages). Percentile = the order
    statistic at 1-based rank max(1, (n*p)//100) — explicit boundary
    ranks, no interpolation, so every output is an exact int64.

    Scale shape: the value-histogram compression trick — ONE
    ``groupby(lang, n_chars)`` count (the exchange carries one row per
    DISTINCT (lang, length) pair, bounded by the length domain, never per
    doc) → per-lang cumulative scan over the sorted length histogram on
    the driver (≤ |langs| × |distinct lengths| tiny rows)."""
    from ray.data.aggregate import Count

    hist = (
        docs_ds.groupby(["lang", "n_chars"])
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    out = {"lang": [], "n_docs": []}
    for p in pcts:
        out[f"p{p}"] = []
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("n_chars")
        lens = g["n_chars"].to_numpy().astype(np.int64)
        cum = g["cnt"].to_numpy().astype(np.int64).cumsum()
        n = int(cum[-1])
        out["lang"].append(lang)
        out["n_docs"].append(n)
        for p in pcts:
            r = max(1, (n * p) // 100)
            out[f"p{p}"].append(int(lens[np.searchsorted(cum, r, "left")]))
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "n_docs": pa.array(out["n_docs"], pa.int64()),
            **{
                f"p{p}": pa.array(out[f"p{p}"], pa.int64())
                for p in pcts
            },
        }
    )


_GOPHER_STOP_EN = sorted(STOPWORDS["en"])  # the distinct-stopword presence probe


def gopher_quality_by_source(
    docs_ds,
    min_words: int = 25,
    max_words: int = 5000,
    min_mwl: int = 4,
    max_mwl: int = 10,
    min_stop_hits: int = 2,
):
    """Gopher-style quality-rule panel per source → (source, n_docs,
    fail_word_count, fail_mean_word_len, fail_alpha_frac, fail_stopwords,
    n_pass): how many documents from each provenance bucket trip each of
    the four classic Rae-et-al.-2021 repetition/degeneracy screens —
    word count outside [min_words, max_words], mean word length outside
    [min_mwl, max_mwl], fewer than 80% of words containing an alphabetic
    character, fewer than ``min_stop_hits`` DISTINCT common stop words —
    plus the count passing all four. The per-source failure profile is
    the first dashboard a curation run reads before choosing mixture
    weights. All comparisons are integer-exact (mean word length is
    tested as ``sum_len <?> bound * n_words``, alpha fraction as
    ``5 * n_alpha <?> 4 * n_words``) so the output is all-int64 and
    hash-stable against the SQL oracle.

    Zero-word documents count toward ``fail_word_count`` only (the other
    rules are vacuous on an empty token list) and never pass.

    Scale shape: ONE stateless ``map_batches`` computing per-batch
    per-source int64 flag sums (the combiner — each batch emits at most
    |sources| rows) → ONE small ``groupby(source)`` sum. No text crosses
    the exchange; at 100 TB the shuffle carries a few counters per block.
    """
    from ray.data.aggregate import Sum

    stopset = set(_GOPHER_STOP_EN)

    def _partial(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        texts = batch["text"].to_pylist()
        agg: dict[str, list[int]] = {}
        for s, t in zip(srcs, texts):
            toks = t.split()
            nw = len(toks)
            a = agg.setdefault(s, [0, 0, 0, 0, 0, 0])
            a[0] += 1
            if nw == 0:
                a[1] += 1
                continue
            sumlen = sum(len(w) for w in toks)
            n_alpha = sum(1 for w in toks if _ALPHA_ANY_RE.search(w))
            hits = len(stopset.intersection(w.lower() for w in toks))
            f_wc = nw < min_words or nw > max_words
            f_mwl = sumlen < min_mwl * nw or sumlen > max_mwl * nw
            f_al = 5 * n_alpha < 4 * nw
            f_st = hits < min_stop_hits
            a[1] += f_wc
            a[2] += f_mwl
            a[3] += f_al
            a[4] += f_st
            a[5] += not (f_wc or f_mwl or f_al or f_st)
        keys = sorted(agg)
        cols = [
            "n_docs",
            "fail_word_count",
            "fail_mean_word_len",
            "fail_alpha_frac",
            "fail_stopwords",
            "n_pass",
        ]
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                **{
                    c: pa.array([agg[k][i] for k in keys], pa.int64())
                    for i, c in enumerate(cols)
                },
            }
        )

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("fail_word_count", alias_name="fail_word_count"),
            Sum("fail_mean_word_len", alias_name="fail_mean_word_len"),
            Sum("fail_alpha_frac", alias_name="fail_alpha_frac"),
            Sum("fail_stopwords", alias_name="fail_stopwords"),
            Sum("n_pass", alias_name="n_pass"),
        )
    )


def length_filter_sweep(docs_ds, thresholds=(10, 25, 50, 100, 200)):
    """C4-style length-filter threshold sweep → one row per candidate
    minimum-token threshold (threshold, n_docs_pass, tokens_retained):
    how many documents and how much token mass survive each cutoff.
    Curation runs this BEFORE committing to a filter so the
    docs-vs-tokens tradeoff is explicit (C4 chose >=3 sentences / >=5
    words per line; Gopher chose >=50 words — the right value is always
    corpus-specific). All-integer output → hash-exact.

    Scale shape: ONE stateless ``map_batches`` emitting a
    |thresholds|-row int64 partial per batch (searchsorted of the
    batch's token counts against the sorted threshold vector — one
    vectorized pass, no per-threshold rescan) → ONE tiny
    ``groupby(threshold)`` sum. No text crosses the exchange."""
    from ray.data.aggregate import Sum

    th = np.asarray(sorted(thresholds), dtype=np.int64)

    def _partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        nw = np.array([len(t.split()) for t in texts], dtype=np.int64)
        order = np.sort(nw)
        csum = np.concatenate([[0], np.cumsum(order)])
        total_docs = len(order)
        total_toks = int(csum[-1])
        # docs with nw >= T: suffix beyond searchsorted-left
        lo = np.searchsorted(order, th, "left")
        return pa.table(
            {
                "threshold": pa.array(th, pa.int64()),
                "n_docs_pass": pa.array(total_docs - lo, pa.int64()),
                "tokens_retained": pa.array(
                    [total_toks - int(csum[i]) for i in lo], pa.int64()
                ),
            }
        )

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("threshold")
        .aggregate(
            Sum("n_docs_pass", alias_name="n_docs_pass"),
            Sum("tokens_retained", alias_name="tokens_retained"),
        )
    )


def temperature_mixture(docs_ds, alpha: float = 0.3, round_to: int = 6):
    """Temperature-scaled source-sampling panel (the multilingual /
    multi-source sampling rule of Lample & Conneau 2019 §3.1, q_i ∝
    p_i^alpha) → (source, n_tokens, token_share, sampling_score) with
    token_share = n_i / N and sampling_score = (n_i / N)^alpha — the
    UNNORMALIZED temperature weight. Normalization (÷ Σ scores) is left
    to the caller on the |sources|-row result: a cross-row float sum has
    engine-dependent addend order, so the hash-checked contract stops at
    per-row functions of exact int64 sums (same discipline as
    ``source_mixture_weights``, whose uniform-target weight is expressible
    per-row; the temperature weight is not).

    Scale shape: identical to ``source_mixture_weights`` — per-batch
    (source → token-count) int64 partials, one tiny groupby-sum,
    |sources| rows reach the driver; share and pow are single IEEE
    evaluations of the exact ints (numpy and the SQL oracle both call
    libm pow → bit-equal), rounded half-away."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def _partial(b: pa.Table) -> pa.Table:
        src = b["source"].to_numpy(zero_copy_only=False)
        ntok = np.array([len(_tokens(t)) for t in b["text"].to_pylist()], np.int64)
        u, inv = np.unique(src, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, ntok)
        return pa.table({"source": pa.array(list(u), pa.string()), "n": s})

    agg = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_tokens"))
    )

    def _score(t: pa.Table) -> pa.Table:
        raw = t["n_tokens"].to_numpy()
        total = float(int(raw.sum()))  # exact int64 sum, ONE conversion
        share = raw.astype(np.float64) / total
        return pa.table(
            {
                "source": t["source"],
                "n_tokens": t["n_tokens"],
                "token_share": round_half_away(share, round_to),
                "sampling_score": round_half_away(share**alpha, round_to),
            }
        )

    # repartition(1) pins the |sources|-row result into ONE block so the
    # exact-int total inside _score is global (cheap: ≤ |sources| rows)
    return agg.repartition(1).map_batches(
        _score, batch_format="pyarrow", batch_size=None
    )


def tokenizer_fertility(docs_ds, round_to: int = 6):
    """Tokenizer-fertility panel per language → (lang, n_words, n_pieces,
    fertility): whitespace words vs pre-tokenizer pieces (the
    letter-run / digit-run / single-symbol split of ``_BPE_RE`` — the
    GPT-2-style pre-tokenization) and their ratio. Fertility (pieces per
    word) is THE standard multilingual tokenizer-cost metric (Rust et
    al. 2021): a lang with fertility 3× another consumes 3× the sequence
    length per word, which drives per-language sampling and cost models.

    Scale shape: one stateless ``map_batches`` emitting per-batch
    per-lang int64 (word, piece) sums → one tiny ``groupby(lang)`` sum;
    fertility is a single IEEE division of the exact int64 sums, rounded
    half-away — bit-equal to the SQL oracle's regexp replay."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def _partial(b: pa.Table) -> pa.Table:
        langs = b["lang"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        u, inv = np.unique(langs, return_inverse=True)
        w = np.zeros(len(u), np.int64)
        p = np.zeros(len(u), np.int64)
        for i, t in enumerate(texts):
            w[inv[i]] += len(t.split())
            p[inv[i]] += len(_BPE_RE.findall(t))
        return pa.table(
            {
                "lang": pa.array(list(u), pa.string()),
                "n_words": w,
                "n_pieces": p,
            }
        )

    def _ratio(t: pa.Table) -> pa.Table:
        w = t["n_words"].to_numpy().astype(np.float64)
        p = t["n_pieces"].to_numpy().astype(np.float64)
        return t.append_column(
            "fertility", pa.array(round_half_away(p / w, round_to))
        )

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_words", alias_name="n_words"),
            Sum("n_pieces", alias_name="n_pieces"),
        )
        .map_batches(_ratio, batch_format="pyarrow")
    )


def vocab_coverage_curve(docs_ds, ks=(10, 50, 100, 1000, 10000), round_to: int = 6):
    """Vocabulary-size selection curve → one row per candidate vocab size
    (k, covered_tokens, coverage): how much of the corpus token mass the
    top-k most frequent tokens cover. THE plot a tokenizer build reads
    before fixing its vocab size (coverage elbows are where extra vocab
    stops paying for embedding-table bytes). Rank order is the total
    (cnt DESC, token ASC) order of ``vocab_topk``, so the cut at every k
    is deterministic on both sides; coverage is ONE IEEE division of
    exact int64 sums per row.

    Scale shape: per-batch (token, count) histograms (Heaps'-law-bounded
    combine) → ONE ``groupby(token)`` sum → each post-groupby block emits
    its local top-max(ks) candidates PLUS one total-mass marker row (the
    global top-k is a subset of the union of per-block top-k's, since
    blocks hold disjoint tokens after the groupby) → the ≤ blocks·max(ks)
    candidate rows fold in ONE final block. The full vocabulary never
    reaches the driver."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ks = sorted(ks)
    kmax = ks[-1]

    def _partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(_tokens(t))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {"token": pa.array(u.tolist(), pa.string()), "cnt": c.astype(np.int64)}
        )

    def _candidates(t: pa.Table) -> pa.Table:
        tok = np.asarray(t["token"].to_pylist(), dtype=object)
        cnt = t["cnt"].to_numpy()
        order = np.lexsort((tok, -cnt))[:kmax]
        return pa.table(
            {
                # marker row: is_total=1 carries this block's exact mass
                "token": pa.array(list(tok[order]) + [""], pa.string()),
                "cnt": pa.array(list(cnt[order]) + [int(cnt.sum())], pa.int64()),
                "is_total": pa.array([0] * len(order) + [1], pa.int64()),
            }
        )

    def _fold(t: pa.Table) -> pa.Table:
        is_total = t["is_total"].to_numpy()
        cnt = t["cnt"].to_numpy()
        total = int(cnt[is_total == 1].sum())
        tok = np.asarray(t["token"].to_pylist(), dtype=object)[is_total == 0]
        c = cnt[is_total == 0]
        order = np.lexsort((tok, -c))
        csum = np.cumsum(c[order])
        covered = np.array(
            [int(csum[min(k, len(csum)) - 1]) if len(csum) else 0 for k in ks],
            np.int64,
        )
        return pa.table(
            {
                "k": pa.array(ks, pa.int64()),
                "covered_tokens": covered,
                "coverage": round_half_away(
                    covered.astype(np.float64) / float(total), round_to
                ),
            }
        )

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(_candidates, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(_fold, batch_format="pyarrow", batch_size=None)
    )


def shard_balance(docs_ds, num_shards: int = 64):
    """Partition-balance audit → one row per content-hash shard
    (shard, n_docs, n_bytes): how evenly a ``md5 % P`` layout would
    spread this corpus over P workers, in both row count and byte mass.
    The pre-flight check before committing a 100 TB run to a fixed
    partitioner — a byte-skewed shard is the straggler, and the fix
    (salting, splitting) is chosen from exactly this table. Uses
    ``md5_lower64`` (≡ DuckDB ``md5_number_lower``) so the audit itself
    is oracle-checkable; the production ``hash64`` partitioner has the
    same uniformity by construction.

    Scale shape: ONE stateless ``map_batches`` emitting ≤ P-row int64
    partials per batch (np.add.at combine) → ONE tiny ``groupby(shard)``
    sum. Text never crosses the exchange."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_lower64

    P = np.uint64(num_shards)

    def _partial(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        sh = (md5_lower64(np.asarray(texts, dtype=object)) % P).astype(np.int64)
        # utf-8 BYTES (DuckDB strlen), not codepoints — bytes are what
        # skew a worker's disk/network at scale
        nb = np.array([len(t.encode("utf-8")) for t in texts], np.int64)
        u, inv = np.unique(sh, return_inverse=True)
        docs = np.bincount(inv).astype(np.int64)
        bytes_ = np.zeros(len(u), np.int64)
        np.add.at(bytes_, inv, nb)
        return pa.table({"shard": u, "n_docs": docs, "n_bytes": bytes_})

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_bytes", alias_name="n_bytes"),
        )
    )


def dsir_weights(docs_ds, target_lang: str = "en", num_buckets: int = 4096):
    """DSIR importance log-weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public): score every raw
    document by how target-like its hashed n-gram profile is →
    (doc_id, n_feats, dsir_logw) with dsir_logw = Σ_features
    [ln p̂_target(b) − ln p̂_raw(b)], the log importance ratio under
    Laplace-smoothed hashed unigram+bigram bag models. Selection then
    resamples ∝ exp(dsir_logw) — this table IS the mixing knob for
    "make my 100 TB crawl look like Wikipedia". Here target = the
    corpus's own ``lang == target_lang`` slice (self-contained; callers
    pass any target slice the same way).

    Exactness: bucket weights are QUANTIZED to integer micro-nats
    (round-half-away of 10⁶·Δln, matching DuckDB ``round(x, 0)``), so the
    per-doc reduction is an exact int64 sum — order-free, hence bit-equal
    to the SQL replay regardless of shuffle/aggregation order; the one
    trailing division by 10⁶ is the same IEEE op on both sides. Features
    are space-split lowercase tokens + adjacent bigrams hashed with
    ``md5_lower64`` (≡ DuckDB ``md5_number_lower``) mod ``num_buckets``.

    Scale shape: pass 1 folds ≤2·num_buckets-row integer partials per
    batch (np.add.at combine) → ONE tiny groupby; the bucket→weight
    array (num_buckets int64s, ~32 KB at the default) is built on the
    driver and ``ray.put`` ONCE; pass 2 is a stateless ``map_batches``
    probe — text never crosses an exchange and nothing unbounded reaches
    the driver. Docs with zero features (empty text) are omitted, as in
    the SQL replay."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_lower64
    from ..functions.rounding import round_half_away

    B = int(num_buckets)

    def _doc_buckets(text: str) -> np.ndarray:
        toks = [w for w in text.lower().split(" ") if w]
        grams = toks + [
            toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
        ]
        if not grams:
            return np.empty(0, np.int64)
        return (
            md5_lower64(np.asarray(grams, dtype=object)) % np.uint64(B)
        ).astype(np.int64)

    def _counts(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        nr = np.zeros(B, np.int64)
        nt = np.zeros(B, np.int64)
        for text, lang in zip(t["text"].to_pylist(), langs):
            bk = _doc_buckets(text)
            np.add.at(nr, bk, 1)
            if lang == target_lang:
                np.add.at(nt, bk, 1)
        obs = np.nonzero(nr)[0]
        return pa.table(
            {"b": obs, "n_raw": nr[obs], "n_tgt": nt[obs]}
        )

    cnt = (
        docs_ds.map_batches(_counts, batch_format="pyarrow")
        .groupby("b")
        .aggregate(
            Sum("n_raw", alias_name="n_raw"),
            Sum("n_tgt", alias_name="n_tgt"),
        )
        .to_pandas()
    )
    b_obs = cnt["b"].to_numpy(np.int64)
    n_raw = cnt["n_raw"].to_numpy(np.int64)
    n_tgt = cnt["n_tgt"].to_numpy(np.int64)
    T = int(n_tgt.sum())
    R = int(n_raw.sum())
    w = np.zeros(B, np.int64)
    w[b_obs] = round_half_away(
        1e6
        * (
            np.log((n_tgt + 1).astype(np.float64) / np.float64(T + B))
            - np.log((n_raw + 1).astype(np.float64) / np.float64(R + B))
        ),
        0,
    ).astype(np.int64)
    w_ref = ray.put(w)

    def _score(t: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        ids, nf, s = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            bk = _doc_buckets(text)
            if not len(bk):
                continue
            ids.append(doc_id)
            nf.append(len(bk))
            s.append(int(wv[bk].sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_feats": pa.array(nf, pa.int64()),
                "dsir_logw": pa.array(
                    np.asarray(s, np.float64) / 1e6
                    if s
                    else np.empty(0, np.float64)
                ),
            }
        )

    return docs_ds.map_batches(_score, batch_format="pyarrow")


def stratified_topk_sample(docs_ds, k: int = 20, strata_col: str = "lang",
                           salt: str = "sample"):
    """Equal-allocation DETERMINISTIC stratified sample → (lang, doc_id,
    rn): the first ``k`` documents per stratum under the salted-md5
    total order ``(md5('salt:doc_id'), doc_id)``. The balanced-eval-set
    primitive — a uniform sample of a 90 %-English crawl contains almost
    no Thai; per-stratum equal allocation is how eval and ablation sets
    are actually drawn. Salting makes draws independent across salts
    while every draw stays reproducible (and SQL-replayable via
    ``md5_number_lower``).

    Scale shape: per-batch per-stratum top-k COMBINER (vectorized
    lexsort + segment-position cut — each batch forwards ≤ k·|strata|
    rows, so the exchange carries candidates, not the corpus) → ONE
    ``groupby(stratum)`` whose map_groups repeats the same cut on the
    ≤ k·#batches survivors. Text never leaves the first pass."""
    from ..functions.hashing import md5_lower64

    def _topk(t: pa.Table) -> pa.Table:
        lang = np.asarray(t[strata_col].to_pylist(), dtype=object)
        ids = t["doc_id"].to_numpy()
        if "rk" in t.column_names:
            rk = t["rk"].to_numpy()
        else:
            rk = md5_lower64(
                np.asarray([f"{salt}:{i}" for i in ids], dtype=object)
            )
        order = np.lexsort((ids, rk, lang))
        lang, ids, rk = lang[order], ids[order], rk[order]
        new = np.concatenate([[True], lang[1:] != lang[:-1]]) if len(lang) else np.empty(0, bool)
        starts = np.nonzero(new)[0]
        grp = np.cumsum(new) - 1
        pos = np.arange(len(lang)) - starts[grp] if len(lang) else np.empty(0, np.int64)
        keep = pos < k
        return pa.table(
            {
                strata_col: pa.array(lang[keep], pa.string()),
                "doc_id": pa.array(ids[keep], pa.int64()),
                "rk": pa.array(rk[keep], pa.uint64()),
                "rn": pa.array((pos[keep] + 1).astype(np.int64)),
            }
        )

    def _final(g: pa.Table) -> pa.Table:
        out = _topk(g)
        return out.drop_columns(["rk"])

    return (
        docs_ds.map_batches(_topk, batch_format="pyarrow")
        .groupby(strata_col)
        .map_groups(_final, batch_format="pyarrow")
    )


def quality_mixture_report(docs_ds, num_deciles: int = 10,
                           num_buckets: int = 32):
    """Source × quality-decile MIXING panel → (source, decile, n_docs,
    n_tokens): rank every document by its :func:`unigram_quality`
    ``mean_relfreq`` score (global rank, ties → doc_id), cut into
    ``num_deciles`` equal-rank buckets (decile 0 = rarest-vocabulary
    text, 9 = most stereotyped), and cross-tab document and token mass
    by source. This is the table a data-mixing decision actually reads:
    which sources fill the low-quality deciles, and how much token mass
    a per-decile sampling temperature would move (the quality-bucket
    companion to ``dsir_weights``' target-likeness scores).

    Scale shape: the quality pass is the salient_terms one-shuffle
    machine; the global decile needs a TRUE distributed rank — the
    TeraSort sort-ordinal machine (``stages/sort.py``), the same
    two-phase prefix-sum used by every order-statistic op here; the
    doc→source attachment is the bucketed repartition-join (union under
    a common schema, ONE groupby(bucket), per-bucket searchsorted) —
    no acero join, no driver-side map; the final fold is a
    #sources×#deciles-row groupby. Docs with zero tokens are absent
    (no quality row), as in the SQL replay."""
    from ray.data.aggregate import Sum

    from ..stages.sort import sort_with_ordinal

    D = int(num_deciles)
    B = int(num_buckets)

    q = unigram_quality(docs_ds)
    ranked = sort_with_ordinal(
        q.select_columns(["doc_id", "n_tokens", "mean_relfreq"]),
        key=["mean_relfreq", "doc_id"],
    ).materialize()
    n = ranked.count()

    def _fact(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        o = t["ordinal"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(t["n_tokens"].to_numpy(), pa.int64()),
                "decile": pa.array((o * D // n).astype(np.int64)),
                "source": pa.array([""] * len(ids), pa.string()),
                "b": pa.array((ids % B).astype(np.int32)),
            }
        )

    def _dim(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(np.full(len(ids), -1, np.int64)),
                "decile": pa.array(np.full(len(ids), -1, np.int64)),
                "source": t["source"],
                "b": pa.array((ids % B).astype(np.int32)),
            }
        )

    def _merge(g: pa.Table) -> pa.Table:
        dec = g["decile"].to_numpy()
        is_dim = dec == -1
        d_ids = g["doc_id"].to_numpy()[is_dim]
        d_src = np.asarray(g["source"].to_pylist(), dtype=object)[is_dim]
        order = np.argsort(d_ids)
        d_ids, d_src = d_ids[order], d_src[order]
        f_ids = g["doc_id"].to_numpy()[~is_dim]
        f_dec = dec[~is_dim]
        f_tok = g["n_tokens"].to_numpy()[~is_dim]
        idx = np.searchsorted(d_ids, f_ids)
        src = d_src[idx]
        # per-bucket partial fold to (source, decile) rows
        key = np.asarray([f"{s}\x00{d}" for s, d in zip(src, f_dec)], dtype=object)
        u, inv = np.unique(key, return_inverse=True)
        nd = np.bincount(inv).astype(np.int64)
        nt = np.zeros(len(u), np.int64)
        np.add.at(nt, inv, f_tok)
        srcs = [s.split("\x00")[0] for s in u]
        decs = [int(s.split("\x00")[1]) for s in u]
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "decile": pa.array(decs, pa.int64()),
                "n_docs": pa.array(nd),
                "n_tokens": pa.array(nt),
            }
        )

    facts = ranked.map_batches(_fact, batch_format="pyarrow")
    dims = docs_ds.select_columns(["doc_id", "source"]).map_batches(
        _dim, batch_format="pyarrow"
    )
    return (
        facts.union(dims)
        .groupby("b")
        .map_groups(_merge, batch_format="pyarrow")
        .groupby(["source", "decile"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
    )


DEFAULT_BLOCKLIST = ("dup", "spam")


def blocklist_stats(docs_ds, blocklist: tuple = DEFAULT_BLOCKLIST):
    """C4-style blocklist filter census (Raffel et al. 2020 §2.2 drop any
    page containing a word on a fixed list) → per-source
    (source, docs, flagged_docs, hits, flagged_rate): how many documents
    contain at least one blocked token and the total blocked-token
    occurrences — the audit you run BEFORE enabling the filter so you know
    what fraction of each source it would delete.

    Scale shape: the contamination pattern — the blocklist is a tiny sorted
    array broadcast in the closure (shipped once per task, bytes), each
    batch probes its whitespace tokens with ``np.isin`` and emits per-source
    partials, ONE #sources-row groupby folds them.  Tokenization is the
    repo-wide whitespace ``_tokens`` (≡ SQL
    ``regexp_split_to_array(trim(text), '\\s+')`` on trim-nonempty rows);
    empty documents count in ``docs`` but can never be flagged."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    block = np.sort(np.asarray(sorted(set(blocklist)), dtype=object))

    def _partial(b: pa.Table) -> pa.Table:
        srcs: dict[str, list] = {}
        for src, t in zip(b["source"].to_pylist(), b["text"].to_pylist()):
            tt = _tokens(t)
            h = int(np.isin(np.asarray(tt, dtype=object), block).sum()) if tt else 0
            row = srcs.setdefault(src, [0, 0, 0])
            row[0] += 1
            row[1] += 1 if h else 0
            row[2] += h
        keys = sorted(srcs)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "docs": pa.array([srcs[s][0] for s in keys], pa.int64()),
                "flagged_docs": pa.array([srcs[s][1] for s in keys], pa.int64()),
                "hits": pa.array([srcs[s][2] for s in keys], pa.int64()),
            }
        )

    agg = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("docs", alias_name="docs"),
            Sum("flagged_docs", alias_name="flagged_docs"),
            Sum("hits", alias_name="hits"),
        )
        .to_pandas()
        .sort_values("source")
    )
    return pa.table(
        {
            "source": pa.array(agg["source"].tolist(), pa.string()),
            "docs": agg["docs"].to_numpy().astype(np.int64),
            "flagged_docs": agg["flagged_docs"].to_numpy().astype(np.int64),
            "hits": agg["hits"].to_numpy().astype(np.int64),
            "flagged_rate": round_half_away(
                agg["flagged_docs"].to_numpy() * 1.0 / agg["docs"].to_numpy(), 6
            ),
        }
    )


def rake_keywords(docs_ds, top_k: int = 25, num_partitions: int = 8):
    """RAKE keyword extraction (Rose et al. 2010 §1.2): split each document
    into candidate phrases at stopword boundaries, score every word by
    deg/freq (deg = Σ phrase length over the word's occurrences, freq = its
    occurrence count — words living in long phrases beat frequent isolated
    ones), score a phrase by the sum of its words' scores, and return the
    global top-k distinct phrases → pa.table(phrase, n_occurrences, score).

    Scale shape: phrase extraction is one ``map_batches`` pass emitting
    (doc, phrase-ordinal, phrase, word, phrase_len) rows; word stats fold
    via ONE groupby (the vocabulary table — never a driver dict); scores
    flow back to phrase-word rows via ``Dataset.join`` on word (the
    doc_cross_entropy routing); per-occurrence scores fold to distinct
    phrases with one more groupby, and the top-k is a distributed sort on
    the ROUNDED score + limit. Tokens are lowercased on both sides; the
    stopword set is the shared _SQL_STOP list, so the SQL oracle replays
    the phrase segmentation exactly; float sum-order noise ≪ the 6-decimal
    round (doc_cross_entropy posture)."""
    from ray.data.aggregate import Count, Max, Sum

    from ..functions.rounding import round_half_away

    stop = frozenset(_SQL_STOP)

    def _phrases(b: pa.Table) -> pa.Table:
        docs: list[int] = []
        pids: list[int] = []
        phrases: list[str] = []
        words: list[str] = []
        plens: list[int] = []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            toks = [w.lower() for w in _tokens(t)]
            pid, cur = 0, []
            for w in toks + [None]:  # sentinel flushes the last phrase
                if w is None or w in stop:
                    if cur:
                        ph = " ".join(cur)
                        for cw in cur:
                            docs.append(did)
                            pids.append(pid)
                            phrases.append(ph)
                            words.append(cw)
                            plens.append(len(cur))
                        pid += 1
                    cur = []
                else:
                    cur.append(w)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "pid": pa.array(pids, pa.int64()),
                "phrase": pa.array(phrases, pa.string()),
                "word": pa.array(words, pa.string()),
                "plen": pa.array(plens, pa.int64()),
            }
        )

    pw = docs_ds.map_batches(_phrases, batch_format="pyarrow").materialize()
    ws = pw.groupby("word").aggregate(
        Count(alias_name="freq"), Sum("plen", alias_name="sdeg")
    )

    def _wscore(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "word": t["word"],
                "wscore": t["sdeg"].to_numpy() / t["freq"].to_numpy(),
            }
        )

    joined = pw.join(
        ws.map_batches(_wscore, batch_format="pyarrow"),
        "inner",
        num_partitions,
        on=("word",),
    )
    # per-occurrence score: fold word scores within (doc, pid); the phrase
    # string rides along via Max (constant within the group)
    occ = joined.groupby(["doc_id", "pid"]).aggregate(
        Sum("wscore", alias_name="pscore"), Max("phrase", alias_name="phrase")
    )
    # distinct phrases: every occurrence of a phrase has the same word
    # multiset, so Max(pscore) is exact (not a tie-break)
    agg = occ.groupby("phrase").aggregate(
        Count(alias_name="n_occurrences"), Max("pscore", alias_name="score")
    )

    def _round(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "phrase": t["phrase"],
                "n_occurrences": t["n_occurrences"].to_numpy().astype(np.int64),
                "score": round_half_away(t["score"].to_numpy(), 6),
            }
        )

    top = (
        agg.map_batches(_round, batch_format="pyarrow")
        .sort(["score", "phrase"], descending=[True, False])
        .limit(top_k)
        .to_pandas()
    )
    return pa.table(
        {
            "phrase": pa.array(top["phrase"].tolist(), pa.string()),
            "n_occurrences": top["n_occurrences"].to_numpy().astype(np.int64),
            "score": top["score"].to_numpy(),
        }
    )


def doclen_mannwhitney(
    docs_ds, source_a: str = "src0", source_b: str = "src1", round_to: int = 6
):
    """Mann–Whitney U rank-sum test (Mann & Whitney 1947) comparing two
    sources' document-length distributions → one row
    (n_a, n_b, u2, z): u2 = 2·U_A kept as an EXACT integer (midranks with
    ties step in halves, so doubled ranks are integers: 2·midrank =
    2·c_less + c_eq + 1), z = tie-corrected normal approximation — the
    canonical nonparametric drift test between two crawl slices.

    Scale shape: the doclen-histogram machine — per-batch (length, source)
    count partials, ONE groupby over the distinct-length keyspace (bounded
    by max document length at ANY corpus size), the driver folds the
    ≤|lengths| histogram with exact integer cumulative sums; the only
    floats are the final μ/σ/z, operand-tree-mirrored by the oracle."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def _partial(b: pa.Table) -> pa.Table:
        src = b["source"].to_numpy(zero_copy_only=False)
        v = b["n_chars"].to_numpy().astype(np.int64)
        m = (src == source_a) | (src == source_b)
        v, src = v[m], src[m]
        isa = (src == source_a).astype(np.int64)
        u, inv = np.unique(v, return_inverse=True)
        ca = np.zeros(len(u), np.int64)
        ct = np.zeros(len(u), np.int64)
        np.add.at(ca, inv, isa)
        np.add.at(ct, inv, 1)
        return pa.table({"v": u, "ca": ca, "ct": ct})

    h = (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("ca", alias_name="ca"), Sum("ct", alias_name="ct"))
        .to_pandas()
        .sort_values("v")
    )
    ca = h["ca"].to_numpy().astype(object)  # Python ints: exact cubes
    ct = h["ct"].to_numpy().astype(object)
    cless = np.concatenate([[0], np.cumsum(ct)[:-1]])
    r2a = int(sum(a * (2 * c + t + 1) for a, c, t in zip(ca, cless, ct)))
    na = int(sum(ca))
    N = int(sum(ct))
    nb = N - na
    T = int(sum(t * t * t - t for t in ct))
    u2 = r2a - na * (na + 1)
    if na and nb and N > 1:
        sigma = float(
            np.sqrt((na * nb / 12.0) * ((N + 1) - float(T) / (N * (N - 1))))
        )
        z = (u2 / 2.0 - na * nb / 2.0) / sigma if sigma > 0 else 0.0
    else:
        z = 0.0
    return pa.table(
        {
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "u2": pa.array([u2], pa.int64()),
            "z": pa.array([float(round_half_away(z, round_to))], pa.float64()),
        }
    )
