"""Algorithm correctness vs single-process oracles, Ray-free (LocalBSP runs
the exact production superstep kernels; FIXTURES.md F3/F4)."""

from itertools import combinations

import numpy as np
import pytest

from subgraph_isomorphism_pregel_ray.pipelines.match import (
    brute_force_count,
    build_plan,
    toy_graph,
    toy_query,
)
from subgraph_isomorphism_pregel_ray.state.local import LocalBSP

QUERIES = {
    "P3": ([0, 1, 0], [(0, 1), (1, 2)]),
    "P4": ([0, 1, 1, 0], [(0, 1), (1, 2), (2, 3)]),
    "tri": ([0, 1, 2], [(0, 1), (1, 2), (2, 0)]),
    "tri_same": ([0, 0, 0], [(0, 1), (1, 2), (2, 0)]),
    "4cyc": ([0, 2, 1, 2], [(0, 1), (1, 2), (2, 3), (3, 0)]),
    "star3": ([1, 0, 0, 0], [(0, 1), (0, 2), (0, 3)]),
    "chair": ([0, 1, 0, 1, 2], [(0, 1), (1, 2), (2, 3), (1, 4)]),
    "diamond": ([0, 1, 1, 0], [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]),
}


def random_graph(trial, n, density=3):
    rng = np.random.default_rng(100 + trial)
    m = n * density
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    keep = s != d
    return s[keep], d[keep]


def adjacency(s, d):
    adj = {}
    for a, b in zip(s.tolist(), d.tolist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def test_toy_golden_mapping_count():
    """The reference's golden example: count must be 4 (README.md:83)."""
    labels, edges = toy_graph()
    qlab, qe = toy_query()
    assert brute_force_count(labels, edges, qlab, qe) == 4
    src = np.array([a for a, _ in edges])
    dst = np.array([b for _, b in edges])
    eng = LocalBSP(src, dst, num_parts=3, labels=labels, directed=False)
    eng.run("match", {"plan": build_plan(qlab, qe)}, max_steps=12)
    assert eng.scalars()["embeddings"] == 4


@pytest.mark.parametrize("trial", range(4))
def test_match_random_vs_brute_force(trial):
    n = [30, 80, 150, 60][trial]
    nlab = [2, 3, 4, 8][trial]
    s, d = random_graph(trial, n)
    verts = np.unique(np.concatenate([s, d]))
    labels = {int(v): int(v % nlab) for v in verts}
    edges = list({(int(min(a, b)), int(max(a, b))) for a, b in zip(s, d)})
    for qname, (ql, qe) in QUERIES.items():
        if max(ql) >= nlab:
            continue
        oracle = brute_force_count(labels, edges, ql, qe)
        eng = LocalBSP(s, d, num_parts=4, labels=labels, directed=False)
        eng.run("match", {"plan": build_plan(ql, qe)}, max_steps=2 * len(ql) + 2)
        assert eng.scalars()["embeddings"] == oracle, qname


def test_match_chunked_expansion_same_count():
    s, d = random_graph(9, 100)
    verts = np.unique(np.concatenate([s, d]))
    labels = {int(v): int(v % 2) for v in verts}
    ql, qe = QUERIES["P4"]
    counts = []
    for chunk in (10, 500_000):  # tiny chunk forces the hub-fan-out path
        eng = LocalBSP(s, d, num_parts=4, labels=labels, directed=False)
        eng.run("match", {"plan": build_plan(ql, qe), "max_chunk": chunk}, max_steps=20)
        counts.append(eng.scalars()["embeddings"])
    assert counts[0] == counts[1]


@pytest.mark.parametrize("trial", range(3))
def test_pagerank_vs_numpy(trial):
    n = [40, 100, 200][trial]
    s, d = random_graph(trial, n)
    eng = LocalBSP(s, d, num_parts=4)
    eng.run("pagerank", {"iters": 40, "damping": 0.85, "n_global": None}, max_steps=41)
    res = eng.result().to_pandas().sort_values("vid")

    vids = np.unique(np.concatenate([s, d]))
    vmap = {int(v): i for i, v in enumerate(vids)}
    N = len(vids)
    A = np.zeros((N, N))
    for a, b in zip(s, d):
        A[vmap[b], vmap[a]] = 1.0  # dedup like the CSR
    outdeg = A.sum(axis=0)
    r = np.full(N, 1 / N)
    for _ in range(40):
        dang = r[outdeg == 0].sum()
        contrib = np.where(outdeg > 0, r / np.where(outdeg == 0, 1, outdeg), 0)
        r = 0.15 / N + 0.85 * (A @ contrib + dang / N)
    assert np.allclose(res["rank"].to_numpy(), r, atol=1e-6)


@pytest.mark.parametrize("trial", range(3))
def test_cc_vs_union_find(trial):
    # several disconnected clusters
    rng = np.random.default_rng(trial)
    s_list, d_list = [], []
    for c in range(4):
        base = c * 50
        a = rng.integers(base, base + 50, 60)
        b = rng.integers(base, base + 50, 60)
        s_list.append(a)
        d_list.append(b)
    s = np.concatenate(s_list)
    d = np.concatenate(d_list)
    keep = s != d
    s, d = s[keep], d[keep]

    parent = list(range(200))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(s.tolist(), d.tolist()):
        parent[find(a)] = find(b)
    groups = {}
    for v in np.unique(np.concatenate([s, d])).tolist():
        groups.setdefault(find(v), []).append(v)
    oracle = {v: min(mem) for mem in groups.values() for v in mem}

    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("cc", max_steps=200)
    res = eng.result().to_pandas()
    assert all(oracle[int(r.vid)] == int(r.component) for r in res.itertuples())


@pytest.mark.parametrize("trial", range(3))
def test_sssp_vs_bfs_oracle(trial):
    """Multi-source BFS distances vs a queue-based single-process BFS,
    including unreachable components (dist = -1)."""
    from collections import deque

    # sparse graph + an isolated far cluster with PROVABLY no seed in it:
    # every iso vid ≡ 3 (mod seed_mod), so its component must come out -1
    rng = np.random.default_rng(40 + trial)
    n = [60, 150, 90][trial]
    seed_mod = 7
    s, d = random_graph(40 + trial, n, density=1)
    iso = (n + 1050) // seed_mod * seed_mod + seed_mod * np.arange(10) + 3
    assert not (iso % seed_mod == 0).any()
    s = np.concatenate([s, iso[:-1]])
    d = np.concatenate([d, iso[1:]])
    adj = adjacency(s, d)
    seeds = [v for v in adj if v % seed_mod == 0]
    dist = {v: 0 for v in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        for w in adj[u]:
            if w not in dist:
                dist[w] = dist[u] + 1
                dq.append(w)

    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("sssp", {"seed_mod": seed_mod}, max_steps=200)
    res = eng.result().to_pandas()
    assert len(res) == len(adj)
    assert (res["dist"].to_numpy() == -1).sum() >= len(iso)  # unreached path hit
    for r in res.itertuples():
        assert dist.get(int(r.vid), -1) == int(r.dist), r.vid


@pytest.mark.parametrize("trial", range(3))
def test_mis_independent_maximal_deterministic(trial):
    """Luby-MIS output must be an independent set, maximal, equal to the
    single-process sequential computation with the same priorities, and
    identical at any partition count."""
    import hashlib

    s, d = random_graph(60 + trial, [50, 120, 80][trial], density=2)
    adj = adjacency(s, d)

    def prio(v):
        h = int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
        return (h & 0xFFFFFFFF00000000) | v

    # sequential oracle: repeatedly take the strict priority-local-minima
    active = set(adj)
    mis = set()
    while active:
        sel = {
            v
            for v in active
            if all(prio(v) < prio(u) for u in adj[v] if u in active)
        }
        assert sel, "deterministic Luby must progress"
        mis |= sel
        active -= sel | {u for v in sel for u in adj[v]}

    results = []
    for parts in (1, 4):
        eng = LocalBSP(s, d, num_parts=parts, directed=False)
        eng.run("mis", max_steps=200)
        res = eng.result().to_pandas()
        got = {int(r.vid) for r in res.itertuples() if r.in_mis}
        results.append(got)
    assert results[0] == results[1] == mis
    # independence + maximality (direct properties, not via the oracle)
    for v in mis:
        assert not (adj[v] & mis), v
    for v in set(adj) - mis:
        assert adj[v] & mis, v


@pytest.mark.parametrize("trial", range(3))
def test_triangles_vs_oracle(trial):
    s, d = random_graph(20 + trial, [40, 100, 60][trial])
    adj = adjacency(s, d)
    pv = {}
    for v in adj:
        pv[v] = sum(1 for a, b in combinations(sorted(adj[v]), 2) if b in adj.get(a, ()))
    total = sum(pv.values()) // 3

    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("triangles", max_steps=4)
    assert eng.scalars()["triangles"] == total
    res = eng.result().to_pandas()
    assert all(pv.get(int(r.vid), 0) == int(r.triangles) for r in res.itertuples())


@pytest.mark.parametrize("trial", range(3))
def test_lpa_vs_sync_oracle(trial):
    s, d = random_graph(30 + trial, 80)
    adj = adjacency(s, d)

    lab = {v: v for v in adj}
    for _ in range(10):
        new = {}
        for v in adj:
            cnt = {}
            for u in adj[v]:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if new == lab:
            break
        lab = new

    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("lpa", {"iters": 10}, max_steps=12)
    res = eng.result().to_pandas()
    assert all(lab[int(r.vid)] == int(r.label) for r in res.itertuples())


def test_partition_count_invariance():
    """Results identical for any P — the partitioning is pure plumbing."""
    s, d = random_graph(5, 100)
    verts = np.unique(np.concatenate([s, d]))
    labels = {int(v): int(v % 3) for v in verts}
    ql, qe = QUERIES["tri"]
    base = None
    for P in (1, 2, 7):
        eng = LocalBSP(s, d, num_parts=P, labels=labels, directed=False)
        eng.run("match", {"plan": build_plan(ql, qe)}, max_steps=12)
        c = eng.scalars()["embeddings"]
        base = c if base is None else base
        assert c == base


@pytest.mark.parametrize("trial", range(3))
def test_assortativity_vs_numpy(trial):
    s, d = random_graph(60 + trial, 50)
    adj = adjacency(s, d)
    deg = {v: len(nb) for v, nb in adj.items()}
    x = np.array([deg[v] for v in adj for _ in adj[v]], dtype=np.float64)
    y = np.array([deg[u] for v in adj for u in adj[v]], dtype=np.float64)
    n = float(len(x))
    num = n * (x * y).sum() - x.sum() * y.sum()
    den = np.sqrt((n * (x * x).sum() - x.sum() ** 2) * (n * (y * y).sum() - y.sum() ** 2))
    expected = num / den

    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("assortativity", max_steps=3)
    sm = eng.scalars()
    n2 = float(sm["asrt_n"])
    sx, sy = float(sm["asrt_sx"]), float(sm["asrt_sy"])
    sxy, sxx, syy = float(sm["asrt_sxy"]), float(sm["asrt_sxx"]), float(sm["asrt_syy"])
    r = (n2 * sxy - sx * sy) / np.sqrt((n2 * sxx - sx * sx) * (n2 * syy - sy * sy))
    assert n2 == n
    assert abs(r - expected) < 1e-12


@pytest.mark.parametrize("parts", [1, 4])
def test_personalized_pagerank_mass_on_seeds(parts):
    s, d = random_graph(70, 60)
    eng = LocalBSP(s, d, num_parts=parts, directed=False)
    eng.run("ppr", {"iters": 8, "seed_mod": 5}, max_steps=11)
    res = eng.result().to_pandas()
    assert abs(res["rank"].sum() - 1.0) < 1e-9  # teleport conserves mass
    seeds = res[res.vid % 5 == 0]["rank"]
    others = res[res.vid % 5 != 0]["rank"]
    # restart mass concentrates on (and near) seeds
    assert seeds.mean() > others.mean()
    assert (others >= 0).all() and (others <= seeds.max()).all()


@pytest.mark.parametrize("parts", [1, 4])
def test_random_walks_vs_bruteforce(parts):
    s, d = random_graph(80, 40)
    adj = {v: sorted(nb) for v, nb in adjacency(s, d).items()}

    def h(start, t):
        return ((start * 2654435761 + t * 40503) % 2147483647)

    L = 5
    expected = {}
    for v in adj:
        cur = v
        for t in range(1, L + 1):
            nb = adj[cur]
            cur = nb[h(v, t) % len(nb)]
        expected[v] = cur

    eng = LocalBSP(s, d, num_parts=parts, directed=False)
    eng.run("walk", {"walk_len": L}, max_steps=L + 2)
    res = eng.result().to_pandas()
    assert len(res) == len(adj)  # no walker lost or duplicated
    got = dict(zip(res.start_vid.astype(int), res.end_vid.astype(int)))
    assert got == expected


@pytest.mark.parametrize("radius", [1, 2])
def test_hyperball_accuracy_vs_exact_balls(radius):
    """nf_est tracks exact BFS ball sizes (m=1024 → linear-counting regime
    on this graph, so the relative error bound is tight), and the integer
    register invariants are identical at any partition count."""
    import collections

    rng = np.random.default_rng(5)
    n = 300
    src = rng.integers(0, n, 1500)
    dst = rng.integers(0, n, 1500)
    keep = src != dst
    src, dst = src[keep], dst[keep]

    eng = LocalBSP(src, dst, num_parts=4, directed=False)
    eng.run("hyperball", {"radius": radius, "p": 10}, max_steps=radius + 3)
    res = eng.result().to_pandas().set_index("vid").sort_index()

    adj = collections.defaultdict(set)
    for s, d in zip(src, dst):
        adj[int(s)].add(int(d))
        adj[int(d)].add(int(s))
    errs = []
    for v in sorted(set(src.tolist()) | set(dst.tolist())):
        ball = {v}
        frontier = {v}
        for _ in range(radius):
            frontier = set().union(*(adj[u] for u in frontier)) - ball
            ball |= frontier
        errs.append(abs(res.loc[v, "nf_est"] - len(ball)) / len(ball))
    errs = np.asarray(errs)
    assert errs.mean() < 0.05 and errs.max() < 0.2

    eng2 = LocalBSP(src, dst, num_parts=7, directed=False)
    eng2.run("hyperball", {"radius": radius, "p": 10}, max_steps=radius + 3)
    res2 = eng2.result().to_pandas().set_index("vid").sort_index()
    assert (res["reg_sum"] == res2["reg_sum"]).all()
    assert (res["reg_zeros"] == res2["reg_zeros"]).all()


def test_hyperball_converges_before_radius_cap():
    """On a graph with diameter < radius the frontier dries up and the run
    stops early (active==0 and sent==0), registers saturated to the whole
    component."""
    # star: diameter 2, ask for radius 10
    src = np.zeros(20, dtype=np.int64)
    dst = np.arange(1, 21, dtype=np.int64)
    eng = LocalBSP(src, dst, num_parts=3, directed=False)
    glob = eng.run("hyperball", {"radius": 10, "p": 10}, max_steps=20)
    res = eng.result().to_pandas()
    # every vertex sees all 21: with m=1024 the linear-count estimate is
    # near-exact
    assert np.allclose(res["nf_est"], 21, rtol=0.05)
    # register invariants identical across vertices (same ball everywhere)
    assert res["reg_sum"].nunique() == 1


def test_hyperball_nf_curve_in_lineage():
    """The folded nf_sum per superstep is the global neighborhood function:
    non-decreasing in radius and ending at Σ ball sizes."""
    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 4], dtype=np.int64)  # path graph 0-1-2-3-4
    eng = LocalBSP(src, dst, num_parts=2, directed=False)
    curve = []
    # LocalBSP.run folds only the final step; replay manually to capture all
    from subgraph_isomorphism_pregel_ray.state.programs import PROGRAMS

    progs = [PROGRAMS["hyperball"]() for _ in range(2)]
    for p, csr in zip(progs, eng.csrs):
        p.init(csr, radius=4, p=10)
    inbox = [[], []]
    for step in range(7):
        outs, nf = [], 0.0
        for i, p in enumerate(progs):
            sa = p.apply(step, inbox[i], {})
            ob, _ = p.scatter(step)
            outs.append(ob)
            nf += sa.get("nf_sum", 0.0)
        inbox = [[outs[q][i] for q in range(2)] for i in range(2)]
        if step > 0:
            curve.append(nf)
    assert all(b >= a for a, b in zip(curve, curve[1:]))  # non-decreasing
    # path graph radius-4 balls: sizes 5,5,5,5,5 -> Σ = 25 (m=1024 ≈ exact)
    assert abs(curve[-1] - 25) / 25 < 0.05


def brute_betweenness(adj, seeds):
    """Single-process Brandes (2001) from the given source set."""
    from collections import deque

    bc = {v: 0.0 for v in adj}
    for s in seeds:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = [s]
        preds = {s: []}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in sorted(adj.get(u, ())):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0.0
                    preds[w] = []
                    q.append(w)
                    order.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


@pytest.mark.parametrize("trial", range(4))
def test_betweenness_random_vs_brandes(trial):
    """Batched multi-source engine == textbook Brandes from the same pivots
    (includes disconnected leftovers and seeds in separate components)."""
    n = [12, 40, 80, 150][trial]
    seed_mod = [3, 5, 7, 11][trial]
    s, d = random_graph(trial + 40, n)
    adj = adjacency(s, d)
    seeds = sorted(v for v in adj if v % seed_mod == 0)
    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("betweenness", {"seed_mod": seed_mod, "round_to": 9}, max_steps=100)
    res = eng.result().to_pandas().set_index("vid")["bc"]
    exp = brute_betweenness(adj, seeds)
    assert len(res) == len(exp)
    for v in res.index:
        assert abs(res[v] - exp[int(v)]) < 1e-6, int(v)


@pytest.mark.parametrize("trial", range(3))
def test_closeness_random_vs_bfs(trial):
    """Harmonic closeness == brute BFS Σ 1/d from the same pivots
    (unreachable pairs contribute 0; pivot's own level-0 excluded)."""
    from collections import deque

    n = [15, 50, 120][trial]
    seed_mod = [3, 5, 9][trial]
    s, d = random_graph(trial + 70, n)
    adj = adjacency(s, d)
    seeds = sorted(v for v in adj if v % seed_mod == 0)
    exp = {v: 0.0 for v in adj}
    for src in seeds:
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for v, dv in dist.items():
            if dv > 0:
                exp[v] += 1.0 / dv
    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("closeness", {"seed_mod": seed_mod, "round_to": 9}, max_steps=100)
    res = eng.result().to_pandas().set_index("vid")["hc"]
    assert len(res) == len(exp)
    for v in res.index:
        assert abs(res[v] - exp[int(v)]) < 1e-6, int(v)


def test_betweenness_partition_invariance():
    """bc independent of the partition count (round_to=4 output bit-equal)."""
    s, d = random_graph(55, 90)
    outs = []
    for P in (1, 2, 5):
        eng = LocalBSP(s, d, num_parts=P, directed=False)
        eng.run("betweenness", {"seed_mod": 7}, max_steps=100)
        outs.append(
            eng.result().to_pandas().sort_values("vid").reset_index(drop=True)
        )
    for o in outs[1:]:
        assert np.array_equal(outs[0]["vid"].values, o["vid"].values)
        assert np.array_equal(outs[0]["bc"].values, o["bc"].values)


@pytest.mark.parametrize("trial", range(3))
def test_weighted_sssp_vs_dijkstra(trial):
    """Bellman-Ford engine == brute Dijkstra under the endpoint-derived
    weights (paths cheaper-but-longer than the BFS tree must win)."""
    import heapq

    n = [15, 60, 130][trial]
    seed_mod = [3, 7, 11][trial]
    wbase, wmod = [1, 10, 2][trial], [9, 5, 7][trial]  # incl. wide ratios
    s, d = random_graph(trial + 90, n)
    adj = adjacency(s, d)
    seeds = [v for v in adj if v % seed_mod == 0]
    dist = {v: None for v in adj}
    pq = [(0, v) for v in seeds]
    heapq.heapify(pq)
    while pq:
        du, u = heapq.heappop(pq)
        if dist[u] is not None:
            continue
        dist[u] = du
        for w_ in adj[u]:
            if dist[w_] is None:
                heapq.heappush(pq, (du + wbase + (u + w_) % wmod, w_))
    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run(
        "wsssp",
        {"seed_mod": seed_mod, "wbase": wbase, "wmod": wmod},
        max_steps=500,
    )
    res = eng.result().to_pandas().set_index("vid")["wdist"]
    assert len(res) == len(dist)
    for v in res.index:
        exp = dist[int(v)]
        assert res[v] == (-1 if exp is None else exp), int(v)


@pytest.mark.parametrize("trial", range(3))
def test_coloring_valid_and_matches_sequential_jp(trial):
    """Jones–Plassmann engine output == sequential JP simulation with the
    same md5 priorities; proper (no adjacent equal colors); identical at
    any partition count."""
    import hashlib

    s, d = random_graph(80 + trial, [40, 100, 160][trial], density=2)
    adj = adjacency(s, d)

    def prio(v):
        h = int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
        return (h & 0xFFFFFFFF00000000) | v

    # sequential oracle: rounds of "color if no smaller-prio uncolored nbr"
    color = {}
    while len(color) < len(adj):
        sel = [
            v
            for v in adj
            if v not in color
            and all(prio(u) > prio(v) for u in adj[v] if u not in color)
        ]
        assert sel, "unique priorities must always unblock someone"
        # sel is an independent set in the uncolored subgraph (of two
        # adjacent uncolored vertices the smaller-prio one blocks the
        # other), so simultaneous mex over prior rounds is well-defined
        new = {}
        for v in sel:
            used = {color[u] for u in adj[v] if u in color}
            c = 0
            while c in used:
                c += 1
            new[v] = c
        color.update(new)

    outs = []
    for P in (1, 4):
        eng = LocalBSP(s, d, num_parts=P, directed=False)
        eng.run("coloring", max_steps=300)
        res = eng.result().to_pandas().sort_values("vid").reset_index(drop=True)
        outs.append(res)
    assert np.array_equal(outs[0]["color"].values, outs[1]["color"].values)
    got = dict(zip(outs[0]["vid"], outs[0]["color"]))
    assert len(got) == len(adj)
    for v, nbrs in adj.items():
        for u in nbrs:
            assert got[v] != got[u], (v, u)  # proper coloring
    for v in adj:
        assert got[v] == color[v], v  # exact JP parity


def test_eccentricity_vs_bfs():
    """Per-pivot eccentricity == brute BFS max level, partials max-folded
    across partitions (seeds in separate components keep their own ecc)."""
    from collections import deque

    s, d = random_graph(95, 100)
    adj = adjacency(s, d)
    seed_mod = 7
    exp = {}
    for src in (v for v in adj if v % seed_mod == 0):
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        exp[src] = max(dist.values())
    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("eccentricity", {"seed_mod": seed_mod}, max_steps=100)
    partial = eng.result().to_pandas()
    got = partial.groupby("s")["ecc"].max()
    assert len(got) == len(exp)
    for sdd, e in exp.items():
        assert got[sdd] == e, sdd


def test_katz_vs_numpy():
    """Katz centrality == dense numpy iteration (dedup'd symmetric A)."""
    s, d = random_graph(98, 120)
    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("katz", {"iters": 8, "alpha": 0.01, "beta": 1.0, "round_to": 9},
            max_steps=10)
    res = eng.result().to_pandas().sort_values("vid")
    vids = res["vid"].to_numpy()
    vmap = {int(v): i for i, v in enumerate(vids)}
    N = len(vids)
    A = np.zeros((N, N))
    for a, b in zip(s.tolist(), d.tolist()):
        A[vmap[b], vmap[a]] = 1.0
        A[vmap[a], vmap[b]] = 1.0
    x = np.ones(N)
    for _ in range(8):
        x = 1.0 + 0.01 * (A @ x)
    assert np.allclose(res["katz"].to_numpy(), x, atol=1e-8)


# ---------------------------------------------------------------------------
def _tarjan_scc(edges):
    """Iterative Tarjan; → dict vid → min member vid of its SCC (oracle)."""
    adj = {}
    verts = set()
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        verts.add(u)
        verts.add(v)
    index, low, on, st, out = {}, {}, set(), [], {}
    counter = [0]
    for root in sorted(verts):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = counter[0]
                counter[0] += 1
                st.append(node)
                on.add(node)
            advanced = False
            for i in range(pi, len(adj.get(node, ()))):
                w = adj[node][i]
                if w not in index:
                    work[-1] = (node, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on:
                    low[node] = min(low[node], index[w])
            if advanced:
                continue
            if low[node] == index[node]:
                comp = []
                while True:
                    w = st.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                low[work[-1][0]] = min(low[work[-1][0]], low[node])
    return out


def _scc_local(src, dst, num_parts=4):
    """Flag-symmetrize directed (src, dst) like algorithms._flag_symmetrize
    and run the SCC program Ray-free."""
    src = np.asarray(src, dtype=np.uint64)
    dst = np.asarray(dst, dtype=np.uint64)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    fl = np.concatenate(
        [np.ones(len(src), np.uint8), np.full(len(src), 2, np.uint8)]
    )
    eng = LocalBSP(s2, d2, num_parts=num_parts, eflags=fl)
    eng.run("scc", max_steps=2000)
    res = eng.result().to_pandas()
    return dict(zip(res["vid"].astype(int), res["scc"].astype(int)))


def test_scc_handcrafted_bowtie():
    """Two 3-cycles bridged one-way + a tail + a disconnected arc: the SCC
    labels are each component's minimum vid (Tarjan-checked shape)."""
    src = [0, 1, 2, 2, 3, 4, 5, 5, 7]
    dst = [1, 2, 0, 3, 4, 5, 3, 6, 8]
    got = _scc_local(src, dst, num_parts=3)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6, 7: 7, 8: 8}


@pytest.mark.parametrize("trial", range(4))
def test_scc_random_vs_tarjan(trial):
    """Min-label FW-BW peeling == iterative Tarjan on random digraphs,
    across partition counts (same-answer-any-P invariance)."""
    rng = np.random.default_rng(7_000 + trial)
    n = 80
    s = rng.integers(0, n, 3 * n)
    d = rng.integers(0, n, 3 * n)
    keep = s != d
    s, d = s[keep], d[keep]
    exp = _tarjan_scc(list(zip(s.tolist(), d.tolist())))
    for parts in (1, 3, 5):
        got = _scc_local(s, d, num_parts=parts)
        assert got == exp


def test_scc_worst_case_path_terminates():
    """A directed path is the peeling worst case (one SCC per round) —
    still exact, just more rounds."""
    n = 40
    s = np.arange(n - 1)
    d = np.arange(1, n)
    got = _scc_local(s, d, num_parts=4)
    assert got == {i: i for i in range(n)}


def test_reach_and_bowtie_classes_vs_bruteforce():
    """ReachProgram fwd/bwd from the core's min member + the bow-tie
    classification == brute-force reachability closure (Broder et al.
    4-class variant: core / in / out / other)."""
    rng = np.random.default_rng(31337)
    n = 70
    s = rng.integers(0, n, 2 * n)
    d = rng.integers(0, n, 2 * n)
    keep = s != d
    s, d = s[keep], d[keep]
    edges = list(zip(s.tolist(), d.tolist()))

    scc = _tarjan_scc(edges)
    # brute closure
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    def reach_from(v0):
        seen = {v0}
        stack = [v0]
        while stack:
            u = stack.pop()
            for w in adj.get(u, ()):
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        return seen
    verts = sorted(scc)
    fwd_of = {v: reach_from(v) for v in verts}
    sizes = {}
    for v, c in scc.items():
        sizes[c] = sizes.get(c, 0) + 1
    core = min(c for c in sizes if sizes[c] == max(sizes.values()))
    exp = {}
    for v in verts:
        if scc[v] == core:
            exp[v] = "core"
        elif core in fwd_of[v]:
            exp[v] = "in"
        elif v in fwd_of[core]:
            exp[v] = "out"
        else:
            exp[v] = "other"

    # LocalBSP composition: scc → core → reach(seed=core)
    got_scc = _scc_local(s, d, num_parts=4)
    u, c = np.unique(np.array(sorted(got_scc.values())), return_counts=True)
    got_core = int(u[np.lexsort((u, -c))[0]])
    assert got_core == core
    s2 = np.concatenate([s, d]).astype(np.uint64)
    d2 = np.concatenate([d, s]).astype(np.uint64)
    fl = np.concatenate([np.ones(len(s), np.uint8), np.full(len(s), 2, np.uint8)])
    eng = LocalBSP(s2, d2, num_parts=4, eflags=fl)
    eng.run("reach", {"seed_vid": got_core}, max_steps=2000)
    rr = eng.result().to_pandas()
    got = {}
    for vid, fwd, bwd in zip(rr["vid"].astype(int), rr["fwd"], rr["bwd"]):
        if got_scc[vid] == got_core:
            got[vid] = "core"
        elif bwd:
            got[vid] = "in"
        elif fwd:
            got[vid] = "out"
        else:
            got[vid] = "other"
    assert got == exp


def test_weighted_pagerank_vs_numpy():
    """Edge-weighted PageRank == dense numpy power iteration with the same
    w/W normalization and dangling redistribution (stored-weight channel)."""
    rng = np.random.default_rng(4242)
    n = 90
    s = rng.integers(0, n, 3 * n)
    d = rng.integers(0, n, 3 * n)
    keep = s != d
    s, d = s[keep], d[keep]
    w = rng.integers(1, 6, keep.sum()).astype(np.int64)
    # dedup (src,dst) keep-first, mirroring build_csr
    key = s.astype(np.int64) * n + d
    _, first = np.unique(key, return_index=True)
    s, d, w = s[first], d[first], w[first]

    eng = LocalBSP(s, d, num_parts=4, eweights=w)
    eng.run(
        "wpagerank",
        {"iters": 12, "damping": 0.85, "n_global": None},
        max_steps=13,
    )
    res = eng.result().to_pandas().sort_values("vid")
    vids = res["vid"].to_numpy().astype(int)
    vmap = {int(v): i for i, v in enumerate(vids)}
    N = len(vids)
    A = np.zeros((N, N))
    for a, b, ww in zip(s.tolist(), d.tolist(), w.tolist()):
        if a in vmap and b in vmap:
            A[vmap[b], vmap[a]] += ww
    W = A.sum(axis=0)
    dangling = W == 0
    r = np.full(N, 1.0 / N)
    for _ in range(12):
        contrib = np.where(dangling, 0.0, r / np.where(W == 0, 1.0, W))
        r = 0.15 / N + 0.85 * (A @ contrib + r[dangling].sum() / N)
    assert np.allclose(res["rank"].to_numpy(), r, atol=1e-10)
    assert abs(res["rank"].sum() - 1.0) < 1e-9


def test_stored_weight_sssp_vs_dijkstra():
    """Bellman-Ford over the STORED weight channel == heapq Dijkstra with
    the same data weights (multi-source, vid % 7 == 0 seeds)."""
    import heapq

    rng = np.random.default_rng(909)
    n = 100
    s = rng.integers(0, n, 3 * n)
    d = rng.integers(0, n, 3 * n)
    keep = s != d
    s, d = s[keep], d[keep]
    w = rng.integers(1, 9, keep.sum()).astype(np.int64)
    # symmetrize with weights; duplicate (src,dst) keep-first like build_csr
    s2 = np.concatenate([s, d])
    d2 = np.concatenate([d, s])
    w2 = np.concatenate([w, w])
    key = s2.astype(np.int64) * n + d2
    _, first = np.unique(key, return_index=True)
    s2, d2, w2 = s2[first], d2[first], w2[first]

    eng = LocalBSP(s2, d2, num_parts=4, eweights=w2)
    eng.run("wsssp_stored", {"seed_mod": 7}, max_steps=1000)
    res = eng.result().to_pandas().sort_values("vid")
    got = dict(zip(res["vid"].astype(int), res["wdist"].astype(int)))

    adj = {}
    for a, b, ww in zip(s2.tolist(), d2.tolist(), w2.tolist()):
        adj.setdefault(a, []).append((b, ww))
    verts = sorted(set(s2.tolist()) | set(d2.tolist()))
    INF = float("inf")
    dist = {v: (0 if v % 7 == 0 else INF) for v in verts}
    heap = [(0, v) for v in verts if v % 7 == 0]
    heapq.heapify(heap)
    while heap:
        du, u = heapq.heappop(heap)
        if du > dist[u]:
            continue
        for v, ww in adj.get(u, ()):
            if du + ww < dist[v]:
                dist[v] = du + ww
                heapq.heappush(heap, (dist[v], v))
    exp = {v: (-1 if dist[v] is INF else int(dist[v])) for v in verts}
    assert got == exp


@pytest.mark.parametrize("trial", range(3))
def test_seeded_lpa_vs_sync_oracle(trial):
    """Seeded LPA: clamped seeds, mode-of-labeled-neighbors rounds,
    unlabeled stays -1 — vs a literal dict replay."""
    s, d = random_graph(60 + trial, 60)
    adj = adjacency(s, d)

    seeds = {v: v % 3 for v in adj if v % 10 == 0}
    lab = dict(seeds)
    for _ in range(5):
        new = {}
        for v in adj:
            if v in seeds:
                new[v] = seeds[v]
                continue
            cnt = {}
            for u in adj[v]:
                if u in lab:
                    cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            if cnt:
                new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new

    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("seeded_lpa", {"iters": 5, "seed_mod": 10, "label_mod": 3},
            max_steps=7)
    res = eng.result().to_pandas()
    got = {int(r.vid): int(r.label) for r in res.itertuples() if r.label >= 0}
    assert got == lab
    unlabeled = {int(r.vid) for r in res.itertuples() if r.label < 0}
    assert unlabeled == set(adj) - set(lab)


def test_bfs_layer_histogram_path_graph():
    """sssp distances -> layer histogram on a path seeded at vertex 0."""
    s = np.array([0, 101, 202])
    d = np.array([101, 202, 303])
    eng = LocalBSP(s, d, num_parts=2, directed=False)
    eng.run("sssp", {"seed_mod": 101101103}, max_steps=10)  # seeds: vid%mod==0 -> only 0
    res = eng.result().to_pandas()
    dist = res.set_index("vid")["dist"]
    got = dist.value_counts().to_dict()
    assert got == {0: 1, 1: 1, 2: 1, 3: 1}


def test_wcc_vs_scc_contrast():
    """Directed chain 1->2->3: WCC = one component, SCC = three."""
    s = np.array([1, 2])
    d = np.array([2, 3])
    eng = LocalBSP(s, d, num_parts=2, directed=False)  # symmetrized
    eng.run("cc", {}, max_steps=50)
    wcc = eng.result().to_pandas()
    assert wcc["component"].nunique() == 1


def test_dag_level_longest_path():
    """Diamond + chain DAG: level(v) = longest path ending at v.
    1→2, 1→3, 2→4, 3→4, 4→5: levels 1:0 2:1 3:1 4:2 5:3; isolated-ish
    source 9→5 must not shortcut 5's max."""
    src = np.asarray([1, 1, 2, 3, 4, 9], dtype=np.uint64)
    dst = np.asarray([2, 3, 4, 4, 5, 5], dtype=np.uint64)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    fl = np.concatenate(
        [np.ones(len(src), np.uint8), np.full(len(src), 2, np.uint8)]
    )
    eng = LocalBSP(s2, d2, num_parts=3, eflags=fl)
    eng.run("dag_level", max_steps=50)
    res = eng.result().to_pandas()
    lev = dict(zip(res["vid"].astype(int), res["level"].astype(int)))
    assert lev == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3, 9: 0}


def test_ltm_cascade_chain():
    """Star + chain with θ=1/2 (num=1, den=2): seed 0 (vid%5==0 with
    vids 0..4 -> seed {0}) activates its degree-1 leaf next round; the
    high-degree hub never reaches θ. Rounds replay the sync semantics."""
    # 0-1, 1-2, 2-3, 2-4: deg 1:[0,2] so 1 fires when one of {0,2} active
    src = np.asarray([0, 1, 2, 2], dtype=np.uint64)
    dst = np.asarray([1, 2, 3, 4], dtype=np.uint64)
    eng = LocalBSP(src, dst, num_parts=3, directed=False)
    eng.run("ltm", {"seed_mod": 5, "num": 1, "den": 2}, max_steps=50)
    res = eng.result().to_pandas()
    ra = dict(zip(res["vid"].astype(int), res["activated_round"].astype(int)))
    # seed 0 at round 0; 1 has deg 2, one active nbr -> 2*1 >= 1*2 fires
    # round 1; 2 (deg 3) needs 2 of 3: after 1 fires, 2*1 < 3 -> never;
    # 3,4 depend on 2 -> never... wait 2's nbrs = {1,3,4}: only 1 active
    # -> 2*1 >= 3 false -> inactive. 3/4 nbr = {2} inactive -> -1.
    assert ra == {0: 0, 1: 1, 2: -1, 3: -1, 4: -1}


def test_attack_tolerance_barbell(ray_session, tmp_path):
    """Two cliques bridged by one hub: removing it (k=1) splits the giant.
    Writes a synthetic lineitem whose successor graph IS the barbell."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # orders as part chains: clique-ish blobs {1..4}, {11..14}, bridge 4-7-11
    chains = [
        [1, 2, 3, 4], [1, 3], [2, 4], [1, 4, 2],
        [11, 12, 13, 14], [11, 13], [12, 14], [11, 14, 12],
        [4, 7, 11],
    ]
    ok, ln, pk = [], [], []
    for o, ch in enumerate(chains):
        for i, p in enumerate(ch):
            ok.append(o)
            ln.append(i)
            pk.append(p)
    pq.write_table(
        pa.table(
            {"l_orderkey": pa.array(ok, pa.int64()),
             "l_linenumber": pa.array(ln, pa.int32()),
             "l_partkey": pa.array(pk, pa.int64()),
             "l_quantity": pa.array([1.0] * len(ok))}
        ),
        tmp_path / "lineitem.parquet",
    )
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        attack_tolerance,
    )

    got = attack_tolerance(str(tmp_path), ks=(0, 1), num_parts=2).to_pandas()
    k0 = got[got["k_removed"] == 0].iloc[0]
    k1 = got[got["k_removed"] == 1].iloc[0]
    assert k0["n_components"] == 1 and k0["n_vertices"] == 9
    # hub 7 has degree 2; the clique nodes have more — top-1 hub is a
    # clique node (4 or 11, whichever has max symmetric degree, tie→min
    # vid). Removing it must NOT disconnect its own clique from the
    # bridge... the curve still must drop giant_size by ≥ 1.
    assert k1["n_vertices"] == 8
    assert k1["giant_size"] <= k0["giant_size"] - 1
