"""K-core decomposition (distributed h-index iteration) vs exact peeling."""

import numpy as np
import pytest

from subgraph_isomorphism_pregel_ray.state.local import LocalBSP


def core_oracle(s, d):
    """Exact peeling (single-process oracle)."""
    verts = np.unique(np.concatenate([s, d]))
    vmap = {int(v): i for i, v in enumerate(verts)}
    adj = [set() for _ in verts]
    for a, b in zip(s.tolist(), d.tolist()):
        if a == b:
            continue
        adj[vmap[a]].add(vmap[b])
        adj[vmap[b]].add(vmap[a])
    deg = np.array([len(x) for x in adj])
    core = deg.copy()
    alive = np.ones(len(verts), bool)
    k = 0
    while alive.any():
        k = max(k, min(deg[alive]))
        while True:
            rem = np.nonzero(alive & (deg <= k))[0]
            if len(rem) == 0:
                break
            for r in rem:
                core[r] = k
                alive[r] = False
                for nb in adj[r]:
                    if alive[nb]:
                        deg[nb] -= 1
    return {int(v): int(c) for v, c in zip(verts, core)}


@pytest.mark.parametrize("trial", range(4))
def test_kcore_vs_peeling(trial):
    rng = np.random.default_rng(trial)
    n = [30, 100, 200, 60][trial]
    m = n * [2, 4, 6, 3][trial]
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    keep = s != d
    s, d = s[keep], d[keep]
    oracle = core_oracle(s, d)
    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("kcore", max_steps=200)
    got = {int(r.vid): int(r.core) for r in eng.result().to_pandas().itertuples()}
    assert got == oracle


def test_kcore_ray(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import kcore
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import edges_from_arrays

    rng = np.random.default_rng(9)
    n = 150
    s = rng.integers(0, n, 700)
    d = rng.integers(0, n, 700)
    keep = s != d
    s, d = s[keep], d[keep]
    oracle = core_oracle(s, d)
    res, _ = kcore(edges_from_arrays(s, d), num_parts=4)
    got = dict(zip(res["vid"].to_numpy().astype(int), res["core"].to_numpy().astype(int)))
    assert got == oracle
