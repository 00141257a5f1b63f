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

__all__ = ["corpus_clean"]


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
