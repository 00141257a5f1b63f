"""Hypothesis property tests: extractor determinism/robustness and matcher
vs brute force on arbitrary small labeled graphs (FIXTURES.md F4 extension)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from subgraph_isomorphism_pregel_ray.functions.extract import (
    extract_hrefs,
    extract_text,
    normalize_url,
)
from subgraph_isomorphism_pregel_ray.pipelines.match import (
    brute_force_count,
    build_plan,
)
from subgraph_isomorphism_pregel_ray.state.local import LocalBSP


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_extract_text_total_and_deterministic(s):
    # never raises, idempotent inputs give identical outputs, no raw tags
    a = extract_text(s)
    b = extract_text(s)
    assert a == b
    assert isinstance(a, str)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_extract_hrefs_total(s):
    out = extract_hrefs(s)
    assert all(isinstance(h, str) and h for h in out)


@settings(max_examples=40, deadline=None)
@given(st.text(min_size=1, max_size=100))
def test_normalize_url_idempotent(u):
    assert normalize_url(normalize_url(u)) == normalize_url(u)


_graph = st.integers(1, 10**6).flatmap(
    lambda seed: st.tuples(st.just(seed), st.integers(8, 40), st.integers(2, 4))
)


@settings(max_examples=15, deadline=None)
@given(_graph, st.sampled_from(["P3", "tri", "star3", "P4"]))
def test_match_matches_brute_force_on_arbitrary_graphs(g, qname):
    seed, n, nlab = g
    rng = np.random.default_rng(seed)
    m = n * 3
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    keep = s != d
    s, d = s[keep], d[keep]
    if len(s) == 0:
        return
    queries = {
        "P3": ([0, 1, 0], [(0, 1), (1, 2)]),
        "tri": ([0, 1, 1], [(0, 1), (1, 2), (2, 0)]),
        "star3": ([1, 0, 0, 0], [(0, 1), (0, 2), (0, 3)]),
        "P4": ([0, 1, 1, 0], [(0, 1), (1, 2), (2, 3)]),
    }
    ql, qe = queries[qname]
    ql = [l % nlab for l in ql]
    verts = np.unique(np.concatenate([s, d]))
    labels = {int(v): int(v % nlab) for v in verts}
    edges = list({(int(min(a, b)), int(max(a, b))) for a, b in zip(s, d)})
    oracle = brute_force_count(labels, edges, ql, qe)
    eng = LocalBSP(s, d, num_parts=3, labels=labels, directed=False)
    eng.run("match", {"plan": build_plan(ql, qe)}, max_steps=2 * len(ql) + 4)
    assert eng.scalars()["embeddings"] == oracle
