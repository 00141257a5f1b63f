"""Extraction byte-identity + href parsing (FIXTURES.md F1 invariant)."""

import numpy as np

from subgraph_isomorphism_pregel_ray.functions.extract import (
    extract_hrefs,
    extract_text,
    normalize_url,
)
from subgraph_isomorphism_pregel_ray.functions.hashing import hash64, hash64_one, part_for
from subgraph_isomorphism_pregel_ray.sources.pages import page_row, synth_pages_table


def test_extract_text_basics():
    html = b"<html><head><title>T</title><style>x{}</style></head><body><p>a &amp; b</p><script>1<2</script>c</body></html>"
    assert extract_text(html) == "T a & b c"


def test_extract_text_edge_cases():
    assert extract_text(b"<b>x</b ><i>y") == "x y"  # unclosed / spaced tags
    assert extract_text("<!-- <p>no</p> -->yes") == "yes"
    assert extract_text("a\n\n  b\tc") == "a b c"
    assert extract_text("&lt;tag&gt; &nbsp;ok") == "<tag> ok"  # entity-decoded, \xa0 collapsed
    # non-ascii survives
    assert extract_text("<p>köln 数据</p>") == "köln 数据"


def test_extract_hrefs():
    html = (
        '<a href="https://x.example/1">a</a>'
        "<a class='q' href='https://x.example/2'>b</a>"
        "<a href=https://x.example/3>c</a>"
        '<a href="https://x.example/4#frag">d</a>'
        '<a name="no-href">e</a>'
    )
    assert extract_hrefs(html) == [
        "https://x.example/1",
        "https://x.example/2",
        "https://x.example/3",
        "https://x.example/4#frag",
    ]


def test_normalize_url():
    assert normalize_url("HTTPS://Site1.Example/p/1#frag") == "https://site1.example/p/1"
    assert normalize_url("https://a.example/p/1/") == "https://a.example/p/1"
    assert normalize_url("https://a.example/") == "https://a.example/"


def test_synth_pages_deterministic_and_byte_identical():
    t1 = synth_pages_table(50, seed=42)
    t2 = synth_pages_table(50, seed=42)
    assert t1.equals(t2)
    # stored text == scalar extractor output (byte identity)
    for html, text in zip(t1["html"].to_pylist(), t1["text"].to_pylist()):
        assert extract_text(html) == text
    # slices generate identically
    t3 = synth_pages_table(50, seed=42, start=10, stop=20)
    assert t1.slice(10, 10).equals(t3)


def test_page_row_links_closed():
    n = 200
    r = page_row(7, n, seed=42)
    for href in extract_hrefs(r["html"]):
        assert "/p/" in href


def test_hash64_stable():
    assert hash64_one("https://site1.example/p/1") == hash64_one("https://site1.example/p/1")
    arr = hash64(np.array(["a", "b", "a"], dtype=object))
    assert arr[0] == arr[2] and arr[0] != arr[1]
    assert arr.dtype == np.uint64


def test_part_for_range():
    vids = hash64(np.array([f"u{i}" for i in range(1000)], dtype=object))
    parts = part_for(vids, 8)
    assert parts.min() >= 0 and parts.max() < 8
    assert len(np.unique(parts)) == 8


def test_extract_links_pairs():
    """extract_links pairs hrefs with their text-rule-normalized anchors;
    unclosed anchors yield no pair; entities decode in both fields."""
    from subgraph_isomorphism_pregel_ray.functions.extract import extract_links

    html = (
        '<a href="https://a.example/x">first &amp; <b>bold</b></a>'
        "<a href='https://b.example/y#f'>two&nbsp;words</a>"
        '<a href=https://c.example/z>  spaced   out </a>'
        '<a href="https://d.example/unclosed">no close'
    )
    assert extract_links(html) == [
        ("https://a.example/x", "first & bold"),
        ("https://b.example/y#f", "two words"),  # &nbsp; collapses to space
        ("https://c.example/z", "spaced out"),
    ]


def test_anchor_index_vs_scalar_reference(ray_session):
    """anchor_index == a pure-Python Counter over extract_links of every
    page, including the top-anchor tie-break, at two batch sizes."""
    from collections import Counter, defaultdict

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.extract import (
        extract_links,
        normalize_url,
    )
    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import anchor_index

    pages = synth_pages_table(600, seed=42)
    counts: dict[str, Counter] = defaultdict(Counter)
    for h in pages["html"].to_pylist():
        for href, anchor in extract_links(h):
            if anchor:
                counts[normalize_url(href)][anchor] += 1
    exp = {}
    for dst, c in counts.items():
        top = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        exp[dst] = (sum(c.values()), len(c), top[0], top[1])

    for bs in (64, 512):
        got = anchor_index(
            rd.from_arrow(pages), batch_size=bs
        ).to_pandas()
        gmap = {
            r.dst_url: (r.n_links, r.n_anchors, r.top_anchor, r.top_n)
            for r in got.itertuples()
        }
        assert gmap == exp, bs


def test_host_locality_vs_scalar_reference(ray_session):
    """host_locality == a per-host Counter over host_of of every href
    edge (relative hrefs resolve to the linking page's own host), with
    self_fraction the rounded IEEE division of the exact int sums."""
    from collections import defaultdict

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.extract import host_of
    from subgraph_isomorphism_pregel_ray.functions.rounding import (
        round_half_away,
    )
    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import host_locality

    pages = synth_pages_table(600, seed=42)
    tot: dict[str, int] = defaultdict(int)
    self_: dict[str, int] = defaultdict(int)
    for u, h in zip(pages["url"].to_pylist(), pages["html"].to_pylist()):
        sh = host_of(u)
        for t in extract_hrefs(h):
            th = host_of(t) or sh
            tot[sh] += 1
            self_[sh] += th == sh
    got = host_locality(rd.from_arrow(pages), batch_size=128).to_pandas()
    assert sorted(got["host"]) == sorted(tot)
    for r in got.itertuples():
        assert int(r.n_links) == tot[r.host]
        assert int(r.n_self_links) == self_[r.host]
        assert r.self_fraction == float(
            round_half_away(
                np.array([self_[r.host] / tot[r.host]]), 6
            )[0]
        )
    # the synthetic web must exercise both intra- and cross-host links
    assert got["n_self_links"].sum() > 0
    assert (got["n_links"] - got["n_self_links"]).sum() > 0


def test_page_indegree_histogram_vs_scalar_reference(ray_session):
    """Log2 in-degree buckets equal a direct Counter over normalized
    hrefs, at two batch sizes."""
    import math
    from collections import Counter

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.extract import normalize_url
    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import (
        page_indegree_histogram,
    )

    pages = synth_pages_table(600, seed=42)
    indeg: Counter = Counter()
    for h in pages["html"].to_pylist():
        for t in extract_hrefs(h):
            indeg[normalize_url(t)] += 1
    exp: Counter = Counter()
    for n in indeg.values():
        exp[int(math.floor(math.log2(n)))] += 1
    for bs in (64, 512):
        got = page_indegree_histogram(
            rd.from_arrow(pages), batch_size=bs
        ).to_pandas()
        gmap = dict(zip(got["indeg_bucket"], got["n_urls"]))
        assert gmap == dict(exp), bs
    # the synthetic web is preferential-attachment skewed → ≥ 4 buckets
    assert len(exp) >= 4


def test_crawl_recency_vs_scalar_reference(ray_session):
    """Per-host page counts and min/max capture times equal a direct
    replay over host_of(url) + the raw timestamps."""
    from collections import defaultdict

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.extract import host_of
    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import crawl_recency

    pages = synth_pages_table(600, seed=42)
    ts = pages["warc_ts"].cast("int64").to_pylist()
    agg: dict = defaultdict(lambda: [0, None, None])
    for u, t in zip(pages["url"].to_pylist(), ts):
        a = agg[host_of(u)]
        a[0] += 1
        a[1] = t if a[1] is None else min(a[1], t)
        a[2] = t if a[2] is None else max(a[2], t)
    for bs in (64, 512):
        got = crawl_recency(rd.from_arrow(pages), batch_size=bs).to_pandas()
        assert sorted(got["host"]) == sorted(agg), bs
        for r in got.itertuples():
            n, lo, hi = agg[r.host]
            assert (
                int(r.n_pages),
                int(r.first_ts_us),
                int(r.last_ts_us),
                int(r.span_s),
            ) == (n, lo, hi, (hi - lo) // 1_000_000), (bs, r.host)
    # the synthetic crawl spans > 0 seconds on every multi-page host
    assert (got.loc[got["n_pages"] > 1, "span_s"] > 0).all()


def test_host_lang_mix_vs_scalar_reference(ray_session):
    """(host, lang) counts and within-host shares equal a direct Counter
    replay over a host count coprime with the lang cycle (real mixing)."""
    from collections import Counter, defaultdict

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.extract import host_of
    from subgraph_isomorphism_pregel_ray.functions.rounding import (
        round_half_away,
    )
    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import host_lang_mix

    pages = synth_pages_table(600, seed=42, n_hosts=13)
    c: Counter = Counter()
    tot: dict = defaultdict(int)
    for u, l in zip(pages["url"].to_pylist(), pages["lang"].to_pylist()):
        h = host_of(u)
        c[(h, l)] += 1
        tot[h] += 1
    got = host_lang_mix(rd.from_arrow(pages), batch_size=128).to_pandas()
    assert len(got) == len(c)
    for r in got.itertuples():
        assert int(r.n_pages) == c[(r.host, r.lang)], (r.host, r.lang)
        assert r.host_share == float(
            round_half_away(
                np.array([c[(r.host, r.lang)] / tot[r.host]]), 6
            )[0]
        )
    # real mixing: every host carries > 1 language
    assert got.groupby("host")["lang"].nunique().min() > 1
