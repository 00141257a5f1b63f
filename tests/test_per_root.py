"""Per-root embedding counts (the reference's per-vertex mapping_count)."""

import numpy as np
import pytest

from subgraph_isomorphism_pregel_ray.pipelines.match import (
    brute_force_per_root,
    build_plan,
    toy_graph,
    toy_query,
)
from subgraph_isomorphism_pregel_ray.state.local import LocalBSP

QUERIES = {
    "P3": ([0, 1, 0], [(0, 1), (1, 2)]),
    "tri": ([0, 1, 2], [(0, 1), (1, 2), (2, 0)]),
    "4cyc": ([0, 2, 1, 2], [(0, 1), (1, 2), (2, 3), (3, 0)]),
    "chair": ([0, 1, 2, 0, 1], [(0, 1), (1, 2), (2, 3), (1, 4)]),
}


@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_per_root_vs_brute_force(qname):
    rng = np.random.default_rng(21)
    n, m = 150, 900
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    keep = s != d
    s, d = s[keep], d[keep]
    verts = np.unique(np.concatenate([s, d]))
    labels = {int(v): int(v % 3) for v in verts}
    edges = list({(int(min(a, b)), int(max(a, b))) for a, b in zip(s, d)})

    ql, qe = QUERIES[qname]
    plan = build_plan(ql, qe)
    oracle = brute_force_per_root(labels, edges, ql, qe, plan["order"][0])
    eng = LocalBSP(s, d, num_parts=4, labels=labels, directed=False)
    eng.run("match", {"plan": plan, "per_root": True}, max_steps=20)
    tbl = eng.result().to_pandas()
    got = dict(zip(tbl["vid"].astype(int), tbl["n_embeddings"].astype(int)))
    assert got == {k: v for k, v in oracle.items() if v > 0}
    assert eng.scalars()["embeddings"] == sum(oracle.values())


def test_per_root_toy_golden():
    labels, edges = toy_graph()
    ql, qe = toy_query()
    plan = build_plan(ql, qe)
    e = np.array(edges)
    eng = LocalBSP(e[:, 0], e[:, 1], num_parts=3, labels=labels, directed=False)
    eng.run("match", {"plan": plan, "per_root": True}, max_steps=14)
    tbl = eng.result().to_pandas()
    # all 4 golden embeddings root at data vertex 1 (the only 'a' with the
    # right 4-cycle neighborhood)
    assert dict(zip(tbl["vid"].astype(int), tbl["n_embeddings"].astype(int))) == {1: 4}
