"""Extraction stages: pages → (url, text, hrefs) → edge table.

Ray-Data analogue of the reference's parse + shuffle-on-load
(``pregel_app_subgraph.h:689-714`` toVertex, ``basic/Worker.h:77-103``
sync_graph): a stateless ``map_batches`` parse followed by hash partitioning.

Scale notes: ``html`` (the wide binary column) is dropped inside the very
first stage — everything downstream moves only int64 hashes. The per-row
Python loop here is the regex extractor itself (compiled once per process);
there is no faster public vectorized HTML parser in this container, and the
stage parallelizes across blocks, which is what matters at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.extract import extract_hrefs, extract_text, host_of, normalize_url
from ..functions.hashing import hash64

__all__ = [
    "extract_batch",
    "edges_batch",
    "extract_stage",
    "edge_stage",
    "host_edges_batch",
    "host_graph",
    "host_locality",
    "host_reciprocity",
    "page_indegree_histogram",
    "crawl_recency",
    "host_lang_mix",
    "host_rank",
    "anchor_batch",
    "anchor_index",
]


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html, …) → (url, text, hrefs:list<string>). Drops html."""
    htmls = batch["html"].to_pylist()
    texts = [extract_text(h) for h in htmls]
    hrefs = [extract_hrefs(h) for h in htmls]
    return pa.table(
        {
            "url": batch["url"],
            "text": pa.array(texts, type=pa.string()),
            "hrefs": pa.array(hrefs, type=pa.list_(pa.string())),
        }
    )


def edges_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html) → edges(src:uint64, dst:uint64) via href explode."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    src_urls: list[str] = []
    dst_urls: list[str] = []
    for u, h in zip(urls, htmls):
        nu = normalize_url(u)
        for t in extract_hrefs(h):
            src_urls.append(nu)
            dst_urls.append(normalize_url(t))
    if src_urls:
        src = hash64(np.array(src_urls, dtype=object))
        dst = hash64(np.array(dst_urls, dtype=object))
    else:
        src = np.empty(0, dtype=np.uint64)
        dst = np.empty(0, dtype=np.uint64)
    return pa.table({"src": pa.array(src), "dst": pa.array(dst)})


def host_edges_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html) → PARTIAL host-graph counts
    (src_host, dst_host, n) — one row per distinct host pair in the batch.

    The host graph is the Common-Crawl "host-level webgraph" aggregation
    (public cc-webgraph tooling): every href edge is mapped to the hosts
    of its endpoints; relative hrefs resolve to the linking page's own
    host. Counts are combined INSIDE the batch (np.unique on the pair
    ids) before any shuffle, so the exchange volume is bounded by the
    number of distinct host pairs per batch — the combine-before-shuffle
    rule for a power-law host distribution."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    src_hosts: list[str] = []
    dst_hosts: list[str] = []
    for u, h in zip(urls, htmls):
        sh = host_of(u)
        for t in extract_hrefs(h):
            th = host_of(t)
            src_hosts.append(sh)
            dst_hosts.append(th if th else sh)
    if not src_hosts:
        return pa.table(
            {
                "src_host": pa.array([], type=pa.string()),
                "dst_host": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    us, si = np.unique(np.asarray(src_hosts, dtype=str), return_inverse=True)
    ud, di = np.unique(np.asarray(dst_hosts, dtype=str), return_inverse=True)
    key = si.astype(np.int64) * len(ud) + di
    uk, counts = np.unique(key, return_counts=True)
    return pa.table(
        {
            "src_host": pa.array(us[uk // len(ud)]),
            "dst_host": pa.array(ud[uk % len(ud)]),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def anchor_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html) → PARTIAL anchor-text counts
    (dst_url, anchor, n) — one row per distinct (target, anchor-text)
    pair in the batch, combined in-batch before any shuffle (same rule as
    ``host_edges_batch``; popular targets receive the same anchor from
    thousands of pages, so the partial combine is the volume bound)."""
    from ..functions.extract import extract_links

    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    dsts: list[str] = []
    anchors: list[str] = []
    for _u, h in zip(urls, htmls):
        for href, anchor in extract_links(h):
            if not anchor:
                continue
            dsts.append(normalize_url(href))
            anchors.append(anchor)
    if not dsts:
        return pa.table(
            {
                "dst_url": pa.array([], type=pa.string()),
                "anchor": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    ud, di = np.unique(np.asarray(dsts, dtype=str), return_inverse=True)
    ua, ai = np.unique(np.asarray(anchors, dtype=str), return_inverse=True)
    key = di.astype(np.int64) * len(ua) + ai
    uk, counts = np.unique(key, return_counts=True)
    return pa.table(
        {
            "dst_url": pa.array(ud[uk // len(ua)]),
            "anchor": pa.array(ua[uk % len(ua)]),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def anchor_index(pages_ds, batch_size: int = 512):
    """Pages → the ANCHOR-TEXT INDEX: per linked-to url, how other pages
    describe it — (dst_url, n_links, n_anchors, top_anchor, top_n) with
    top_anchor = the most frequent anchor text (ties → lexicographically
    smallest). The classic web-search relevance signal (anchor text
    indexing, Brin & Page 1998 §2.2 — public); at 100 TB this is partial
    per-batch counts → ONE (dst, anchor) groupby-sum → ONE per-dst fold.
    """
    from ray.data.aggregate import Sum

    partial = pages_ds.map_batches(
        anchor_batch, batch_format="pyarrow", batch_size=batch_size
    )
    agg = (
        partial.groupby(["dst_url", "anchor"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    def _fold(g: pa.Table) -> pa.Table:
        n = g["n"].to_numpy()
        anchors = np.asarray(g["anchor"].to_pylist(), dtype=str)
        order = np.lexsort((anchors, -n))  # max count, then lexicographic
        top = order[0]
        return pa.table(
            {
                "dst_url": g["dst_url"][:1],
                "n_links": pa.array([int(n.sum())], type=pa.int64()),
                "n_anchors": pa.array([len(n)], type=pa.int64()),
                "top_anchor": pa.array([str(anchors[top])], type=pa.string()),
                "top_n": pa.array([int(n[top])], type=pa.int64()),
            }
        )

    return agg.groupby("dst_url").map_groups(_fold, batch_format="pyarrow")


def host_graph(pages_ds, batch_size: int = 512):
    """Dataset pipeline: pages → host-level link graph
    (src_host, dst_host, n_links), n_links = number of href edges between
    the two hosts (self-host links kept — they dominate real webgraphs
    and callers filter them). Partial per-batch counts, then ONE
    groupby-sum over the (already tiny) host-pair keyspace."""
    from ray.data.aggregate import Sum

    partial = pages_ds.map_batches(
        host_edges_batch, batch_format="pyarrow", batch_size=batch_size
    )
    agg = partial.groupby(["src_host", "dst_host"]).aggregate(Sum("n"))
    return agg.map_batches(
        lambda t: t.rename_columns(["src_host", "dst_host", "n_links"]),
        batch_format="pyarrow",
    )


def host_locality(pages_ds, batch_size: int = 512):
    """Pages → per-host link-locality panel (host, n_links, n_self_links,
    self_fraction): of all href edges leaving pages on a host, how many
    stay on the same host. The intra-host fraction is the standard
    webgraph block-structure diagnostic (cc-webgraph publishes it per
    crawl) and the quantity that justifies host-partitioning the edge
    table — a high fraction means a host-hashed layout keeps most BSP
    messages partition-local.

    Scale shape: builds on :func:`host_graph` (per-batch host-pair
    combiner → ONE groupby over the tiny host-pair keyspace), then a
    second per-batch combiner folds pairs to per-host totals — the only
    exchanges carry (host, int, int) rows. ``self_fraction`` is a single
    IEEE division of the exact int64 sums, rounded half-away-from-zero
    (``functions/rounding.py``) to stay bit-equal to the SQL oracle."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    hg = host_graph(pages_ds, batch_size=batch_size)

    def _partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t["src_host"].to_pylist(), dtype=object)
        dst = np.asarray(t["dst_host"].to_pylist(), dtype=object)
        n = t["n_links"].to_numpy()
        is_self = (src == dst).astype(np.int64)
        return pa.table(
            {
                "host": pa.array(src, pa.string()),
                "n_links": pa.array(n, pa.int64()),
                "n_self_links": pa.array(n * is_self, pa.int64()),
            }
        )

    def _frac(t: pa.Table) -> pa.Table:
        tot = t["n_links"].to_numpy().astype(np.float64)
        self_ = t["n_self_links"].to_numpy().astype(np.float64)
        return t.append_column(
            "self_fraction", pa.array(round_half_away(self_ / tot, 6))
        )

    return (
        hg.map_batches(_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_links", alias_name="n_links"),
            Sum("n_self_links", alias_name="n_self_links"),
        )
        .map_batches(_frac, batch_format="pyarrow")
    )


def host_rank(pages_ds, iters: int = 20, damping: float = 0.85,
              num_parts: int = 4, batch_size: int = 512):
    """Host-level PageRank (the Common Crawl host-ranking composition,
    public cc-webgraph tooling): pages → host graph → distinct host-pair
    edges with self-host links dropped (cc-webgraph convention; a host
    linking only to itself therefore has no rank row) → the engine's
    PageRank → (host, rank) ordered by rank desc.

    The vid↔host name map is rebuilt vectorized from the host-graph
    Dataset (np.unique over batch columns) and applied by searchsorted —
    driver memory is O(#hosts), the same order as the returned table."""
    from ..pipelines.algorithms import pagerank

    hg = host_graph(pages_ds, batch_size=batch_size).materialize()

    def eb(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src_host"].to_pylist(), dtype=object)
        d = np.asarray(t["dst_host"].to_pylist(), dtype=object)
        keep = s != d
        return pa.table(
            {"src": pa.array(hash64(s[keep])), "dst": pa.array(hash64(d[keep]))}
        )

    edges = hg.map_batches(eb, batch_format="pyarrow")
    res, lineage = pagerank(edges, iters=iters, damping=damping,
                            num_parts=num_parts)

    chunks = []
    for b in hg.iter_batches(batch_format="pyarrow"):
        for col in ("src_host", "dst_host"):
            chunks.append(np.asarray(b[col].to_pylist(), dtype=str))
    hosts = np.unique(np.concatenate(chunks)) if chunks else np.empty(0, str)
    vids = hash64(hosts.astype(object))
    order = np.argsort(vids)
    vids, hosts = vids[order], hosts[order]
    rv = res["vid"].to_numpy()
    idx = np.searchsorted(vids, rv)
    rank = res["rank"].to_numpy()
    out = pa.table({"host": pa.array(hosts[idx]), "rank": pa.array(rank)})
    return out.take(np.argsort(-rank, kind="stable")), lineage


def extract_stage(pages_ds, batch_size: int = 512):
    """Dataset stage: pages → extracted text+hrefs (html dropped)."""
    return pages_ds.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=batch_size
    )


def edge_stage(pages_ds, batch_size: int = 512):
    """Dataset stage: pages → edge table of url-hash pairs."""
    return pages_ds.map_batches(
        edges_batch, batch_format="pyarrow", batch_size=batch_size
    )


def page_indegree_histogram(pages_ds, batch_size: int = 512):
    """Pages → page-level in-degree power-law census → (indeg_bucket,
    n_urls) with indeg_bucket = floor(log2(in-degree)): how many distinct
    normalized target urls receive 1, 2-3, 4-7, … in-links. The classic
    webgraph degree-distribution check (Broder et al. 2000 report it per
    crawl — public); a curation run reads it to size hot-key salting for
    any per-url shuffle (the top bucket IS the skew).

    Scale shape: per-batch (dst_url, n) partial counts (in-batch
    ``np.unique`` combine — popular targets collapse before the
    exchange) → ONE ``groupby(dst_url)`` sum over url strings → per-batch
    log2-bucket partials → one tiny ``groupby(bucket)`` sum. ``log2`` of
    an exact int64 < 2⁵³ and ``floor`` are both exact IEEE ops, so the
    output is all-int64 and hash-stable against the SQL replay."""
    from ray.data.aggregate import Sum

    def _dsts(batch: pa.Table) -> pa.Table:
        dsts: list[str] = []
        for h in batch["html"].to_pylist():
            for t in extract_hrefs(h):
                dsts.append(normalize_url(t))
        if not dsts:
            return pa.table(
                {
                    "dst_url": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        u, counts = np.unique(np.asarray(dsts, dtype=str), return_counts=True)
        return pa.table(
            {"dst_url": pa.array(list(u)), "n": counts.astype(np.int64)}
        )

    def _bucket(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        buck = np.floor(np.log2(n.astype(np.float64))).astype(np.int64)
        u, counts = np.unique(buck, return_counts=True)
        return pa.table(
            {"indeg_bucket": u, "n_urls": counts.astype(np.int64)}
        )

    return (
        pages_ds.map_batches(_dsts, batch_format="pyarrow", batch_size=batch_size)
        .groupby("dst_url")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(_bucket, batch_format="pyarrow")
        .groupby("indeg_bucket")
        .aggregate(Sum("n_urls", alias_name="n_urls"))
    )


def crawl_recency(pages_ds, batch_size: int = 512):
    """Pages → per-host crawl-freshness panel (host, n_pages,
    first_ts_us, last_ts_us, span_s): page count, oldest and newest
    WARC capture time (epoch microseconds) and their span in whole
    seconds. The recrawl-scheduling input of every crawl pipeline —
    hosts whose newest capture is stale get priority, hosts with a wide
    span already have change-rate history (Common Crawl publishes this
    per-host census with each crawl — public).

    Scale shape: per-batch (host, count, min_ts, max_ts) partials
    (in-batch np.minimum/maximum.at combine) → ONE tiny
    ``groupby(host)`` with Sum/Min/Max folds. All-int64 output →
    hash-exact against the SQL replay."""
    from ray.data.aggregate import Max, Min, Sum

    def _partial(batch: pa.Table) -> pa.Table:
        hosts = np.asarray([host_of(u) for u in batch["url"].to_pylist()], dtype=object)
        ts = batch["warc_ts"].cast(pa.int64()).to_numpy()
        u, inv = np.unique(hosts, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        lo = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        hi = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.minimum.at(lo, inv, ts)
        np.maximum.at(hi, inv, ts)
        return pa.table(
            {
                "host": pa.array(list(u), pa.string()),
                "n_pages": n,
                "first_ts_us": lo,
                "last_ts_us": hi,
            }
        )

    def _span(t: pa.Table) -> pa.Table:
        span = (t["last_ts_us"].to_numpy() - t["first_ts_us"].to_numpy()) // 1_000_000
        return t.append_column("span_s", pa.array(span.astype(np.int64)))

    return (
        pages_ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("host")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Min("first_ts_us", alias_name="first_ts_us"),
            Max("last_ts_us", alias_name="last_ts_us"),
        )
        .map_batches(_span, batch_format="pyarrow")
    )


def host_lang_mix(pages_ds, batch_size: int = 512):
    """Pages → per-(host, declared-lang) page census (host, lang,
    n_pages, host_share): the language mix of every host and each
    language's share of that host's pages. The language-census-by-host
    table Common Crawl publishes per crawl (public); curation reads it
    to decide host-level language routing (a host that is 95% one
    language gets a fast path; mixed hosts go to per-page lang-id).

    Scale shape: per-batch (host, lang, count) partials (np.unique on
    the pair ids — the host_edges_batch combine pattern) → ONE tiny
    ``groupby(host, lang)`` sum → a per-host share from a second small
    host-total fold joined back by broadcast-free groupby(host)
    map_groups over the ≤ |hosts|·|langs| row table. host_share is ONE
    IEEE division of exact int64 sums, rounded half-away."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def _partial(batch: pa.Table) -> pa.Table:
        hosts = np.asarray([host_of(u) for u in batch["url"].to_pylist()], dtype=object)
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        uh, hi = np.unique(hosts, return_inverse=True)
        ul, li = np.unique(langs, return_inverse=True)
        key = hi.astype(np.int64) * len(ul) + li
        uk, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "host": pa.array(list(uh[uk // len(ul)]), pa.string()),
                "lang": pa.array(list(ul[uk % len(ul)]), pa.string()),
                "n_pages": counts.astype(np.int64),
            }
        )

    agg = (
        pages_ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby(["host", "lang"])
        .aggregate(Sum("n_pages", alias_name="n_pages"))
    )

    def _share(g: pa.Table) -> pa.Table:
        n = g["n_pages"].to_numpy()
        tot = float(int(n.sum()))
        return g.append_column(
            "host_share", pa.array(round_half_away(n.astype(np.float64) / tot, 6))
        )

    return agg.groupby("host").map_groups(_share, batch_format="pyarrow")


def host_reciprocity(pages_ds, batch_size: int = 512, round_to: int = 6):
    """Pages → ONE-row host-graph reciprocity panel (n_directed_pairs,
    n_reciprocated, reciprocity): over the distinct directed host-pair
    links (self-host pairs dropped), how many are returned by a link in
    the opposite direction — the classic directed-webgraph mutuality
    statistic (Broder et al. 2000 report it per crawl; Garlaschelli &
    Loffredo 2004 formalize it — both public). High reciprocity means an
    undirected (flag-symmetrized) layout loses little information; low
    means direction carries real signal (host_rank ≠ its reverse).

    Scale shape: builds on :func:`host_graph` (per-batch host-pair
    combiner → ONE groupby over the tiny host-pair keyspace); pairs are
    then folded ORDER-FREE — each directed pair contributes a direction
    bit keyed by its unordered pair, one more groupby-sum over ≤ the
    same keyspace, and the driver folds two ints. ``reciprocity`` is one
    IEEE division of exact int64 counts, rounded half-away."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    hg = host_graph(pages_ds, batch_size=batch_size)

    def _bits(t: pa.Table) -> pa.Table:
        src = np.asarray(t["src_host"].to_pylist(), dtype=object)
        dst = np.asarray(t["dst_host"].to_pylist(), dtype=object)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        lo = np.where(src < dst, src, dst)
        hi = np.where(src < dst, dst, src)
        bit = np.where(src < dst, 1, 2).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(lo, pa.string()),
                "b": pa.array(hi, pa.string()),
                "bit": pa.array(bit, pa.int64()),
            }
        )

    def _fold(t: pa.Table) -> pa.Table:
        bits = t["bit"].to_numpy()
        both = int((bits == 3).sum())
        single = int((bits != 3).sum())
        return pa.table(
            {
                "n_pairs": pa.array([2 * both + single], pa.int64()),
                "n_recip": pa.array([2 * both], pa.int64()),
            }
        )

    folded = (
        hg.map_batches(_bits, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("bit", alias_name="bit"))
        .map_batches(_fold, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    n_pairs = int(folded["n_pairs"])
    n_recip = int(folded["n_recip"])
    return pa.table(
        {
            "n_directed_pairs": pa.array([n_pairs], pa.int64()),
            "n_reciprocated": pa.array([n_recip], pa.int64()),
            "reciprocity": pa.array(
                [
                    float(
                        round_half_away(
                            np.float64(n_recip) / np.float64(n_pairs), round_to
                        )
                    )
                    if n_pairs
                    else 0.0
                ],
                pa.float64(),
            ),
        }
    )
