"""End-to-end corpus cleaning: quality filter → exact dedup, one streaming pass.

The composition a 100 TB training-data run starts with (the reference's
load-then-filter step generalized to documents; cf. the candidate filtering
stage ``pregel_app_subgraph.h:689-714`` — parse, gate, keep): a single
``map_batches`` computes the quality gates and drops failing rows *and* the
wide ``text`` column before anything is shuffled, so the only all-to-all
exchange (the dedup groupby) moves three narrow columns of survivors.

Scale shape:
* one pass over the corpus, filter applied per batch (nothing materialized);
* ``md5`` + token stats are whole-batch kernels reused from
  :mod:`..functions.hashing` / :mod:`.textops`;
* the groupby key is the content hash — uniform by construction, no skew;
* within a hash group the text is identical, so any per-doc stat is a valid
  group aggregate (``Min`` below) — no join back to the corpus is needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_hex_batch
from .textops import _ALNUM_RE, _tokens

__all__ = ["corpus_clean", "chunk_documents", "pack_sequences", "curate_corpus", "write_clean_corpus"]


def corpus_clean(docs_ds, min_tokens: int = 20, min_alnum_ratio: float = 0.82):
    """→ Dataset(doc_id, content_hash, n_tokens): quality-passing documents,
    exact-deduplicated (min ``doc_id`` kept per identical text).

    The filter compares raw ``int/int`` double ratios (no rounding), so the
    predicate is bit-identical to the SQL oracle's ``alnum*1.0/length(text)``.
    """

    def _gate(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        n_tokens = np.fromiter((len(_tokens(t)) for t in texts), np.int64, count=n)
        lens = np.fromiter((len(t) for t in texts), np.int64, count=n)
        alnum = np.fromiter(
            (len(_ALNUM_RE.findall(t)) for t in texts), np.int64, count=n
        )
        ratio = np.divide(alnum, lens, out=np.zeros(n), where=lens > 0)
        keep = (n_tokens >= min_tokens) & (ratio >= min_alnum_ratio)
        idx = np.flatnonzero(keep)
        kept_texts = [texts[i] for i in idx]
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(pa.array(idx)),
                # explicit type: an all-filtered batch must not emit a
                # null-typed column (blocks with conflicting schemas poison
                # downstream aggregation — see the round-2 join landmines)
                "content_hash": pa.array(md5_hex_batch(kept_texts), type=pa.string()),
                "n_tokens": n_tokens[idx],
            }
        )

    from ray.data.aggregate import Min

    return (
        docs_ds.map_batches(_gate, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"), Min("n_tokens", alias_name="n_tokens"))
        .select_columns(["doc_id", "content_hash", "n_tokens"])
    )


def chunk_documents(docs_ds, window: int = 20):
    """Token-window chunking — split each document into fixed-size token
    chunks (the pre-tokenization step of every LLM training pipeline)
    → Dataset(doc_id, chunk_id, n_tokens, chunk_text).

    Tokenizer = ``split(' ')`` dropping empties; chunk text rejoins with a
    single space, exactly the SQL oracle's ``string_agg(tok, ' ' ORDER BY
    pos)`` — byte-identical reconstruction. Empty docs produce no chunks.
    Pure linear ``map_batches``: no shuffle, output rows ≈ tokens/window.
    """

    def _chunk(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        out_doc, out_chunk, out_n, out_text = [], [], [], []
        for i, t in enumerate(batch["text"].to_pylist()):
            toks = [x for x in t.split(" ") if x]
            for c in range(0, len(toks), window):
                piece = toks[c : c + window]
                out_doc.append(doc_ids[i])
                out_chunk.append(c // window)
                out_n.append(len(piece))
                out_text.append(" ".join(piece))
        return pa.table(
            {
                "doc_id": np.asarray(out_doc, dtype=np.int64),
                "chunk_id": np.asarray(out_chunk, dtype=np.int64),
                "n_tokens": np.asarray(out_n, dtype=np.int64),
                "chunk_text": pa.array(out_text, type=pa.string()),
            }
        )

    return docs_ds.map_batches(_chunk, batch_format="pyarrow")


def pack_sequences(docs_ds, seq_len: int = 512):
    """Sequence packing — lay every document head-to-tail in global
    ``doc_id`` order and cut the stream every ``seq_len`` tokens (GPT-style
    packed pretraining batches); each doc is stamped with the training
    sequence its first token lands in and its offset within it
    → Dataset(doc_id, n_tokens, seq_id, seq_offset).

    The packing IS a distributed exclusive prefix sum over token counts
    (``sort_with_prefix_sum`` — the reference's TeraSort prefix-sum
    aggregator generalized from row counts to values): one narrow
    tokenize-count pass (doc_id + one int leave each batch, never text),
    a range-partitioned sort, P scalars to the driver, one stamping pass.
    Deterministic at any parallelism; empty docs keep their slot with
    ``n_tokens = 0``.
    """
    from ..stages.sort import sort_with_prefix_sum

    def _count(batch: pa.Table) -> pa.Table:
        n = np.fromiter(
            (
                sum(1 for x in t.split(" ") if x)
                for t in batch["text"].to_pylist()
            ),
            np.int64,
            count=batch.num_rows,
        )
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})

    counted = docs_ds.map_batches(_count, batch_format="pyarrow")
    stamped = sort_with_prefix_sum(counted, "doc_id", "n_tokens", out_col="prefix")

    def _assign(t: pa.Table) -> pa.Table:
        if "prefix" not in t.column_names:  # zero-row input: typed empty out
            e = pa.array([], pa.int64())
            return pa.table(
                {"doc_id": e, "n_tokens": e, "seq_id": e, "seq_offset": e}
            )
        p = t["prefix"].to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "seq_id": (p // seq_len).astype(np.int64),
                "seq_offset": (p % seq_len).astype(np.int64),
            }
        )

    return stamped.map_batches(_assign, batch_format="pyarrow")


def curate_corpus(
    docs_ds,
    min_tokens: int = 20,
    min_alnum_ratio: float = 0.82,
    max_dup_token_ratio: float = 0.65,
    max_top_token_ratio: float = 0.25,
    max_contamination: float = 0.5,
    bench_mod: int = 37,
):
    """The full curation decision a training-data run makes per document —
    length gate → alnum-quality gate → Gopher repetition gates →
    benchmark decontamination → exact dedup — with an auditable verdict:
    → Dataset(doc_id, keep: bool, reason ∈ {ok, short, alnum, repetitive,
    contaminated, duplicate}). ``reason`` is the FIRST failing gate (fixed
    precedence, so the verdict is deterministic and SQL-replayable);
    benchmark documents themselves skip the contamination gate.

    Scale shape: ONE linear pass computes every per-document gate (the
    benchmark gram set rides the same broadcast as ``contamination`` —
    ``ray.put`` once, ``searchsorted`` per batch); the narrow verdict table
    (doc_id, reason, content_hash) is materialized once, survivors take a
    single md5-keyed groupby for the duplicate verdict (uniform key, no
    skew), and rejected rows bypass that shuffle entirely via ``union``.
    Every ratio compares a single exact-int IEEE division against the
    threshold literal — bit-identical to the SQL oracle's CASE ladder.
    """
    import ray

    from .textops import (
        _space_tokens,
        _word_ngrams_unique,
        benchmark_gram_hashes,
    )

    bench_ref = ray.put(benchmark_gram_hashes(docs_ds, bench_mod, 3))

    from ..functions.hashing import md5_lower64

    class _Gate:
        def __init__(self, ref):
            self.bench = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch["text"].to_pylist()
            doc_ids = batch["doc_id"].to_numpy()
            reasons, hashes = [], []
            for i, t in enumerate(texts):
                toks = _space_tokens(t)
                n = len(toks)
                if n < min_tokens:
                    reasons.append("short")
                    hashes.append("")
                    continue
                alnum = len(_ALNUM_RE.findall(t))
                if len(t) == 0 or alnum / len(t) < min_alnum_ratio:
                    reasons.append("alnum")
                    hashes.append("")
                    continue
                _, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
                if (n - len(cnt)) / n > max_dup_token_ratio or int(
                    cnt.max()
                ) / n > max_top_token_ratio:
                    reasons.append("repetitive")
                    hashes.append("")
                    continue
                if doc_ids[i] % bench_mod != 0 and len(self.bench):
                    g = _word_ngrams_unique(toks, 3)
                    if len(g):
                        h = md5_lower64(g)
                        pos = np.minimum(
                            np.searchsorted(self.bench, h), len(self.bench) - 1
                        )
                        nh = int((self.bench[pos] == h).sum())
                        if nh / len(g) > max_contamination:
                            reasons.append("contaminated")
                            hashes.append("")
                            continue
                reasons.append("pass")
                hashes.append(md5_hex_batch([t])[0])
            return pa.table(
                {
                    "doc_id": doc_ids,
                    "reason": pa.array(reasons, pa.string()),
                    "content_hash": pa.array(hashes, pa.string()),
                }
            )

    verdicts = docs_ds.map_batches(
        _Gate,
        fn_constructor_args=(bench_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).materialize()  # narrow (id, enum, hash) — read twice below

    import pyarrow.compute as pc

    def _is(flag):
        def f(t: pa.Table) -> pa.Table:
            mask = pc.equal(t["reason"], "pass")
            return t.filter(mask if flag else pc.invert(mask))

        return f

    def _dedup_group(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy()
        keep = ids == ids.min()
        return pa.table(
            {
                "doc_id": ids,
                "keep": keep,
                "reason": pa.array(
                    np.where(keep, "ok", "duplicate").tolist(), pa.string()
                ),
            }
        )

    passed = (
        verdicts.map_batches(_is(True), batch_format="pyarrow")
        .groupby("content_hash")
        .map_groups(_dedup_group, batch_format="pyarrow")
    )

    def _rejected(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "keep": np.zeros(t.num_rows, dtype=bool),
                "reason": t["reason"],
            }
        )

    rejected = verdicts.map_batches(_is(False), batch_format="pyarrow").map_batches(
        _rejected, batch_format="pyarrow"
    )
    return passed.union(rejected)


def write_clean_corpus(
    docs_ds, out_dir: str, num_shards: int = 32, **curate_kwargs
):
    """Materialize the curated training corpus: ``curate_corpus`` verdicts
    joined back to the documents (keeps only ``keep``) and written as
    RESUMABLE hive-sharded parquet — the actual "produce the dataset" step
    after the audit. Returns the sink's summary dict (shards written /
    skipped) plus ``kept`` row count.

    Scale shape: the verdict side is (doc_id, bool) — narrow — joined via
    Ray's hash join on doc_id (both sides partition by the same key; no
    broadcast of anything document-sized); shard = ``doc_id % num_shards``
    so re-runs skip sealed shards (``stages/sink.py``).
    """
    import pyarrow.compute as pc

    from ..stages.sink import write_parquet_resumable

    verdicts = curate_corpus(docs_ds, **curate_kwargs)
    keep = verdicts.map_batches(
        lambda t: t.filter(pc.field("keep") == True).select(["doc_id"]),  # noqa: E712
        batch_format="pyarrow",
    )
    kept_docs = docs_ds.join(keep, "inner", 8, on=("doc_id",))

    def _shard(t: pa.Table) -> pa.Table:
        return t.append_column(
            "shard",
            pa.array((t["doc_id"].to_numpy() % num_shards).astype(np.int64)),
        )

    sharded = kept_docs.map_batches(_shard, batch_format="pyarrow")
    summary = write_parquet_resumable(sharded, out_dir, "shard")
    summary["kept"] = int(keep.count())
    return summary
