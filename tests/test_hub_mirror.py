"""Hub-mirroring skew mitigation: identical counts with and without it."""

import numpy as np
import pytest

from subgraph_isomorphism_pregel_ray.pipelines.match import brute_force_count, build_plan
from subgraph_isomorphism_pregel_ray.state.local import LocalBSP

QUERIES = {
    "tri": ([0, 1, 2], [(0, 1), (1, 2), (2, 0)]),
    "4cyc": ([0, 2, 1, 2], [(0, 1), (1, 2), (2, 3), (3, 0)]),
    "chair": ([0, 1, 2, 0, 1], [(0, 1), (1, 2), (2, 3), (1, 4)]),
    "P4": ([0, 1, 1, 0], [(0, 1), (1, 2), (2, 3)]),
}


@pytest.fixture(scope="module")
def skewed_graph():
    rng = np.random.default_rng(11)
    n, m = 200, 1500
    s = rng.integers(0, n, m)
    # 40% of edges point at 4 hub vertices — web-hub-style in-degree skew
    d = np.where(rng.random(m) < 0.4, rng.integers(0, 4, m), rng.integers(0, n, m))
    keep = s != d
    s, d = s[keep], d[keep]
    verts = np.unique(np.concatenate([s, d]))
    labels = {int(v): int(v % 3) for v in verts}
    edges = list({(int(min(a, b)), int(max(a, b))) for a, b in zip(s, d)})
    return s, d, labels, edges


@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_mirror_counts_equal_oracle(skewed_graph, qname):
    s, d, labels, edges = skewed_graph
    ql, qe = QUERIES[qname]
    oracle = brute_force_count(labels, edges, ql, qe)
    eng = LocalBSP(s, d, num_parts=4, labels=labels, directed=False)
    eng.exchange_attr("label")
    n_hubs = eng.prepare_hub_mirror(min_deg=5)  # force a large mirror
    assert n_hubs > 0
    eng._exchanged.add("hubs")
    eng.run("match", {"plan": build_plan(ql, qe)}, max_steps=30, hub_mirror=True)
    assert eng.scalars()["embeddings"] == oracle


def test_mirror_tail_fold_bushy_counts_equal_oracle():
    """The trailing-leaf FACTOR FOLD under hub mirroring: a 3-branch bushy
    query (all three leaves folded, tail_start = k-3) over a hub-skewed
    graph matches brute force with a forced large mirror — hub anchors'
    factors come from hub_lcsr + _hub_member, spread rows included."""
    rng = np.random.default_rng(23)
    n, m = 60, 400
    s = rng.integers(0, n, m)
    d = np.where(rng.random(m) < 0.4, rng.integers(0, 3, m), rng.integers(0, n, m))
    keep = s != d
    s, d = s[keep], d[keep]
    verts = np.unique(np.concatenate([s, d]))
    labels = {int(v): int(v % 3) for v in verts}
    edges = list({(int(min(a, b)), int(max(a, b))) for a, b in zip(s, d)})
    ql = [2, 0, 1, 1, 2, 2, 0]
    qe = [(0, 1), (1, 2), (0, 3), (3, 4), (0, 5), (5, 6)]
    plan = build_plan(ql, qe)
    assert plan["tail_start"] == len(ql) - 3
    oracle = brute_force_count(labels, edges, ql, qe)
    eng = LocalBSP(s, d, num_parts=4, labels=labels, directed=False)
    eng.exchange_attr("label")
    assert eng.prepare_hub_mirror(min_deg=5) > 0
    eng._exchanged.add("hubs")
    eng.run("match", {"plan": plan}, max_steps=30, hub_mirror=True)
    assert eng.scalars()["embeddings"] == oracle


def test_mirror_budget_caps_size(skewed_graph):
    s, d, labels, _ = skewed_graph
    eng = LocalBSP(s, d, num_parts=4, labels=labels, directed=False)
    eng.exchange_attr("label")
    n = eng.prepare_hub_mirror(min_deg=2, budget_entries=100)
    hv, hptr, _, _ = eng.csrs[0].hub_mirror
    assert n == len(hv)
    # Σ mirrored degrees within budget (except the guaranteed single top hub)
    assert hptr[-1] <= 100 or len(hv) == 1
