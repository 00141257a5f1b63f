"""Ray-path integration: partitioned layout, actors, exchange, checkpoints.

Kernel correctness is covered Ray-free in test_programs_local.py; these tests
assert the distributed plumbing produces identical results plus the
FIXTURES.md F1 (byte-identity) and F5 (resume-equivalence) invariants.
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
    connected_components,
    pagerank,
    pagerank_dataset,
    triangle_count,
)
from subgraph_isomorphism_pregel_ray.pipelines.bsp import BSPEngine
from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
    edges_from_arrays,
    partition_graph,
)
from subgraph_isomorphism_pregel_ray.pipelines.match import match_count, toy_graph, toy_query
from subgraph_isomorphism_pregel_ray.state.local import LocalBSP


@pytest.fixture(scope="module")
def graph_arrays():
    rng = np.random.default_rng(3)
    n = 300
    s = rng.integers(0, n, 1200)
    d = rng.integers(0, n, 1200)
    keep = s != d
    return s[keep], d[keep]


def test_pagerank_ray_matches_local(ray_session, graph_arrays):
    s, d = graph_arrays
    res, lin = pagerank(edges_from_arrays(s, d), iters=15, num_parts=4)
    eng = LocalBSP(s, d, num_parts=4)
    eng.run("pagerank", {"iters": 15, "damping": 0.85, "n_global": None}, max_steps=16)
    local = eng.result().to_pandas().sort_values("vid").reset_index(drop=True)
    rayr = res.to_pandas().sort_values("vid").reset_index(drop=True)
    assert np.allclose(local["rank"], rayr["rank"], atol=1e-12)
    assert abs(rayr["rank"].sum() - 1.0) < 1e-9


def test_cc_and_triangles_ray(ray_session, graph_arrays):
    s, d = graph_arrays
    cres, _ = connected_components(edges_from_arrays(s, d), num_parts=4)
    eng = LocalBSP(s, d, num_parts=4, directed=False)
    eng.run("cc", max_steps=100)
    local = eng.result().to_pandas().sort_values("vid").reset_index(drop=True)
    rayr = cres.to_pandas().sort_values("vid").reset_index(drop=True)
    assert np.array_equal(local["component"].values, rayr["component"].values)

    tot, _, _ = triangle_count(edges_from_arrays(s, d), num_parts=4)
    eng2 = LocalBSP(s, d, num_parts=4, directed=False)
    eng2.run("triangles", max_steps=4)
    assert tot == eng2.scalars()["triangles"]


def test_match_toy_golden_ray(ray_session):
    import ray.data as rd

    labels, edges = toy_graph()
    lab_ds = rd.from_arrow(
        pa.table(
            {
                "vid": np.array(sorted(labels), dtype=np.uint64),
                "label": np.array([labels[v] for v in sorted(labels)], dtype=np.int64),
            }
        )
    )
    e = np.array(edges)
    cnt, _ = match_count(
        edges_from_arrays(e[:, 0], e[:, 1]), *toy_query(), labels_ds=lab_ds, num_parts=3
    )
    assert cnt == 4  # /root/reference/README.md:83


def test_checkpoint_resume_equivalence(ray_session, graph_arrays, tmp_path):
    s, d = graph_arrays
    gdir, ckdir = str(tmp_path / "g"), str(tmp_path / "ck")
    partition_graph(edges_from_arrays(s, d), 4, gdir)
    params = {"iters": 20, "damping": 0.85, "n_global": None, "tol": 0.0}

    eng = BSPEngine(gdir, 4)
    eng.run("pagerank", params, max_steps=21)
    ref = eng.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    eng.shutdown()

    engA = BSPEngine(gdir, 4)  # "killed" after step 10
    engA.run("pagerank", params, max_steps=11, checkpoint_dir=ckdir, checkpoint_every=5)
    engA.shutdown()
    assert os.path.isdir(os.path.join(ckdir, "step=10"))

    engB = BSPEngine(gdir, 4)
    engB.run("pagerank", params, max_steps=21, checkpoint_dir=ckdir,
             checkpoint_every=5, resume=True)
    resumed = engB.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    engB.shutdown()
    assert np.array_equal(ref["rank"].values, resumed["rank"].values)  # bit-identical


def test_cc_checkpoint_resume(ray_session, graph_arrays, tmp_path):
    s, d = graph_arrays
    gdir, ckdir = str(tmp_path / "g2"), str(tmp_path / "ck2")
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize

    partition_graph(edges_from_arrays(s, d), 4, gdir, directed=False)
    eng = BSPEngine(gdir, 4)
    eng.run("cc", {}, max_steps=100)
    ref = eng.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    eng.shutdown()

    engA = BSPEngine(gdir, 4)
    engA.run("cc", {}, max_steps=3, checkpoint_dir=ckdir, checkpoint_every=2)
    engA.shutdown()
    engB = BSPEngine(gdir, 4)
    engB.run("cc", {}, max_steps=100, checkpoint_dir=ckdir, checkpoint_every=2, resume=True)
    resumed = engB.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    engB.shutdown()
    assert np.array_equal(ref["component"].values, resumed["component"].values)


def test_flagship_extraction_byte_identity(ray_session):
    from subgraph_isomorphism_pregel_ray.sources.pages import (
        synth_pages_dataset,
        synth_pages_table,
    )
    from subgraph_isomorphism_pregel_ray.stages.extract import extract_stage

    ext = extract_stage(synth_pages_dataset(300, seed=42)).take_all()
    exp = synth_pages_table(300, seed=42)
    expect = dict(zip(exp["url"].to_pylist(), exp["text"].to_pylist()))
    assert len(ext) == 300
    assert all(expect[r["url"]] == r["text"] for r in ext)


def test_cc_dataset_path_matches_actor_path(ray_session, graph_arrays):
    s, d = graph_arrays
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import cc_dataset
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize

    ds_res = cc_dataset(symmetrize(edges_from_arrays(s, d))).to_pandas()
    actor_res, _ = connected_components(edges_from_arrays(s, d), num_parts=4)
    a = actor_res.to_pandas()
    b = ds_res
    b["vid"] = b["vid"].values.view(np.uint64)
    b["component"] = b["component"].values.view(np.uint64)
    a = a.sort_values("vid").reset_index(drop=True)
    b = b.sort_values("vid").reset_index(drop=True)
    assert np.array_equal(a["vid"].values, b["vid"].values)
    assert np.array_equal(a["component"].values, b["component"].values)


def test_pagerank_dataset_path_matches_actor_path(ray_session, graph_arrays):
    s, d = graph_arrays
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize

    sym = symmetrize(edges_from_arrays(s, d))
    ds_res = pagerank_dataset(symmetrize(edges_from_arrays(s, d)), iters=5).to_pandas()
    actor_res, _ = pagerank(sym, iters=5, num_parts=4)
    a = actor_res.to_pandas()
    b = ds_res
    b["vid"] = b["vid"].values.view(np.uint64)  # dataset path uses int64 bits
    a = a.sort_values("vid").reset_index(drop=True)
    b = b.sort_values("vid").reset_index(drop=True)
    assert np.array_equal(a["vid"].values, b["vid"].values)
    assert np.allclose(a["rank"].values, b["pr"].values, atol=1e-7)


def test_hyperball_checkpoint_resume(ray_session, graph_arrays, tmp_path):
    """FixedSizeList register state round-trips parquet checkpoints and a
    mid-run resume reproduces the straight run bit-for-bit."""
    s, d = graph_arrays
    gdir, ckdir = str(tmp_path / "g3"), str(tmp_path / "ck3")
    partition_graph(edges_from_arrays(s, d), 4, gdir, directed=False)
    params = {"radius": 4, "p": 8}

    eng = BSPEngine(gdir, 4)
    eng.run("hyperball", params, max_steps=8)
    ref = eng.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    eng.shutdown()

    engA = BSPEngine(gdir, 4)  # "killed" after step 2
    engA.run("hyperball", params, max_steps=3, checkpoint_dir=ckdir, checkpoint_every=1)
    engA.shutdown()
    assert os.path.isdir(os.path.join(ckdir, "step=2"))
    engB = BSPEngine(gdir, 4)
    engB.run("hyperball", params, max_steps=8, checkpoint_dir=ckdir,
             checkpoint_every=1, resume=True)
    resumed = engB.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    engB.shutdown()
    assert np.array_equal(ref["reg_sum"].values, resumed["reg_sum"].values)
    assert np.array_equal(ref["nf_est"].values, resumed["nf_est"].values)


def test_ktruss_vs_brute_peeling(ray_session):
    """Dataset-path k-truss == single-process peeling fixpoint on a sparse
    graph with a planted clique (the clique survives, stragglers peel)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import ktruss

    def brute(E, k):
        E = set(E)
        while True:
            adj = {}
            for u, v in E:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
            drop = {(u, v) for (u, v) in E if len(adj[u] & adj[v]) < k - 2}
            if not drop:
                return E
            E -= drop

    rng = np.random.default_rng(6)
    src = rng.integers(0, 30, 60)
    dst = rng.integers(0, 30, 60)
    keep = src < dst
    E = set(zip(src[keep].tolist(), dst[keep].tolist()))
    E |= {(a, b) for a in range(6) for b in range(a + 1, 6)}  # planted 6-clique
    E = sorted(E)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": np.asarray([e[0] for e in E], np.int64),
                "dst": np.asarray([e[1] for e in E], np.int64),
            }
        )
    ).repartition(3)
    out, rounds = ktruss(ds, k=5)
    got = set(map(tuple, out.to_pandas().itertuples(index=False)))
    exp = brute(E, 5)
    assert got == exp
    assert {(a, b) for a in range(6) for b in range(a + 1, 6)} <= got  # clique kept


def test_betweenness_checkpoint_resume(ray_session, graph_arrays, tmp_path):
    """Census + (K,n) forward/backward state round-trips parquet checkpoints
    (schema-metadata seed list included); mid-run resume is bit-identical."""
    s, d = graph_arrays
    gdir, ckdir = str(tmp_path / "g4"), str(tmp_path / "ck4")
    partition_graph(edges_from_arrays(s, d), 4, gdir, directed=False)
    params = {"seed_mod": 7, "round_to": 9}

    eng = BSPEngine(gdir, 4)
    eng.run("betweenness", params, max_steps=100)
    ref = eng.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    eng.shutdown()

    engA = BSPEngine(gdir, 4)  # "killed" after step 3 (mid forward/backward)
    engA.run("betweenness", params, max_steps=4, checkpoint_dir=ckdir,
             checkpoint_every=1)
    engA.shutdown()
    assert os.path.isdir(os.path.join(ckdir, "step=3"))
    engB = BSPEngine(gdir, 4)
    engB.run("betweenness", params, max_steps=100, checkpoint_dir=ckdir,
             checkpoint_every=1, resume=True)
    resumed = engB.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    engB.shutdown()
    assert np.array_equal(ref["vid"].values, resumed["vid"].values)
    assert np.array_equal(ref["bc"].values, resumed["bc"].values)


def test_host_graph_vs_scalar_reference(ray_session):
    """Host-level link graph == per-link scalar recomputation (host_of on
    every href, relative hrefs resolving to the page's own host), with
    batch-size invariance so the per-batch partial combine is proven
    associative."""
    import collections

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.extract import (
        extract_hrefs,
        host_of,
    )
    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import host_graph

    t = synth_pages_table(400, seed=7)
    exp: collections.Counter = collections.Counter()
    for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        sh = host_of(u)
        for href in extract_hrefs(h):
            th = host_of(href)
            exp[(sh, th if th else sh)] += 1
    assert sum(exp.values()) > 0 and len(exp) > 2

    for bs in (32, 512):
        got = (
            host_graph(rd.from_arrow(t), batch_size=bs)
            .to_pandas()
            .sort_values(["src_host", "dst_host"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp)
        for _, r in got.iterrows():
            assert exp[(r["src_host"], r["dst_host"])] == r["n_links"]
        assert int(got["n_links"].sum()) == sum(exp.values())


def test_host_of_scalar():
    from subgraph_isomorphism_pregel_ray.functions.extract import host_of

    assert host_of("HTTPS://Site1.Example/p/1") == "site1.example"
    assert host_of("http://a.example") == "a.example"
    assert host_of("/relative/path") == ""
    assert host_of("mailto:x@y.example") == ""  # no //host authority


def test_host_rank_vs_direct_pagerank(ray_session):
    """host_rank == PageRank run directly on the manually-built host edge
    list, with names mapped back correctly and self-host links dropped."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.extract import (
        extract_hrefs,
        host_of,
    )
    from subgraph_isomorphism_pregel_ray.functions.hashing import hash64
    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import host_rank

    t = synth_pages_table(300, seed=11)
    pairs = set()
    for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        sh = host_of(u)
        for href in extract_hrefs(h):
            th = host_of(href) or sh
            if th != sh:
                pairs.add((sh, th))
    s = np.array([p[0] for p in sorted(pairs)], dtype=object)
    d = np.array([p[1] for p in sorted(pairs)], dtype=object)
    ref_edges = rd.from_arrow(
        pa.table({"src": pa.array(hash64(s)), "dst": pa.array(hash64(d))})
    )
    exp, _ = pagerank(ref_edges, iters=10, num_parts=4)
    exp_by_vid = dict(zip(exp["vid"].to_numpy(), exp["rank"].to_numpy()))

    got, _ = host_rank(rd.from_arrow(t), iters=10, num_parts=4)
    assert len(got) == len(exp_by_vid)
    ranks = got["rank"].to_numpy()
    assert np.all(ranks[:-1] >= ranks[1:])  # rank-desc ordering
    for host, rank in zip(got["host"].to_pylist(), ranks):
        vid = hash64(np.array([host], dtype=object))[0]
        assert rank == exp_by_vid[vid], host


def test_wsssp_checkpoint_resume(ray_session, graph_arrays, tmp_path):
    """Weighted Bellman-Ford mid-run resume is bit-identical — distances
    can still IMPROVE after the checkpoint step, so this exercises the
    changed-frontier round-trip, not just settled state."""
    s, d = graph_arrays
    gdir, ckdir = str(tmp_path / "g5"), str(tmp_path / "ck5")
    partition_graph(edges_from_arrays(s, d), 4, gdir, directed=False)
    params = {"seed_mod": 7, "wbase": 1, "wmod": 9}  # wide ratio: many rounds

    eng = BSPEngine(gdir, 4)
    eng.run("wsssp", params, max_steps=500)
    ref = eng.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    eng.shutdown()

    engA = BSPEngine(gdir, 4)
    engA.run("wsssp", params, max_steps=3, checkpoint_dir=ckdir, checkpoint_every=1)
    engA.shutdown()
    engB = BSPEngine(gdir, 4)
    engB.run("wsssp", params, max_steps=500, checkpoint_dir=ckdir,
             checkpoint_every=1, resume=True)
    resumed = engB.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    engB.shutdown()
    assert np.array_equal(ref["vid"].values, resumed["vid"].values)
    assert np.array_equal(ref["wdist"].values, resumed["wdist"].values)


def test_rich_club_vs_pandas_brute(ray_session):
    """Rich-club curve == pandas brute force over the same distinct
    co-purchase pairs (degrees, hub-subgraph edge counts, rc formula)."""
    import duckdb

    from subgraph_isomorphism_pregel_ray.pipelines.relational import rich_club

    sf = "/root/testdata/sf0.001"
    got = rich_club(sf, kmax=16).to_pandas().sort_values("k").reset_index(drop=True)
    eu = duckdb.sql(
        "SELECT a.l_partkey AS src, b.l_partkey AS dst FROM "
        f"read_parquet('{sf}/lineitem.parquet') a JOIN "
        f"read_parquet('{sf}/lineitem.parquet') b ON a.l_orderkey = b.l_orderkey "
        "WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2"
    ).df()
    deg = (
        eu["src"].value_counts().add(eu["dst"].value_counts(), fill_value=0).astype(int)
    )
    for _, r in got.iterrows():
        k = int(r["k"])
        hubs = set(deg[deg > k].index)
        ek = int(((eu["src"].isin(hubs)) & (eu["dst"].isin(hubs))).sum())
        nk = len(hubs)
        assert r["n_nodes"] == nk and r["n_edges"] == ek, k
        exp = 2.0 * ek / (nk * (nk - 1.0)) if nk >= 2 else 0.0
        assert abs(r["rc"] - exp) < 1e-6, k


def test_coloring_checkpoint_resume(ray_session, graph_arrays, tmp_path):
    """JP coloring resume is bit-identical — the ragged per-edge neighbor
    color state round-trips parquet as an Arrow ListArray over indptr."""
    s, d = graph_arrays
    gdir, ckdir = str(tmp_path / "g6"), str(tmp_path / "ck6")
    partition_graph(edges_from_arrays(s, d), 4, gdir, directed=False)

    eng = BSPEngine(gdir, 4)
    eng.run("coloring", {}, max_steps=1000)
    ref = eng.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    eng.shutdown()
    assert (ref["color"] >= 0).all()

    engA = BSPEngine(gdir, 4)
    engA.run("coloring", {}, max_steps=4, checkpoint_dir=ckdir, checkpoint_every=1)
    engA.shutdown()
    engB = BSPEngine(gdir, 4)
    engB.run("coloring", {}, max_steps=1000, checkpoint_dir=ckdir,
             checkpoint_every=1, resume=True)
    resumed = engB.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    engB.shutdown()
    assert np.array_equal(ref["vid"].values, resumed["vid"].values)
    assert np.array_equal(ref["color"].values, resumed["color"].values)


def test_lpa_modularity_vs_pandas_brute(ray_session):
    """Per-community modularity table == pandas brute force computed from
    the engine's own LPA labels (tests the distributed join/aggregation
    plumbing; LPA labels themselves carry their own SQL oracle)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import lpa_modularity
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import label_propagation
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        strong_copurchase_edges,
    )

    sf = "/root/testdata/sf0.001"
    got = lpa_modularity(sf, iters=5, num_parts=4).to_pandas()
    eu = strong_copurchase_edges(sf).to_pandas()
    labels_tbl, _ = label_propagation(symmetrize(
        __import__("ray").data.from_pandas(eu)), iters=5, num_parts=4)
    lab = dict(zip(labels_tbl["vid"].to_numpy().view(np.int64),
                   labels_tbl["label"].to_numpy().view(np.int64)))
    m = float(len(eu))
    import collections

    ic = collections.Counter()
    dg = collections.Counter()
    nm = collections.Counter(lab.values())
    for s, d in zip(eu["src"], eu["dst"]):
        ls, ld = lab[int(s)], lab[int(d)]
        dg[ls] += 1
        dg[ld] += 1
        if ls == ld:
            ic[ls] += 1
    assert len(got) == len(nm)
    for _, r in got.iterrows():
        L = int(r["label"])
        assert r["n_members"] == nm[L] and r["internal_edges"] == ic[L]
        assert r["degree_sum"] == dg[L]
        exp = ic[L] / m - (dg[L] / (2.0 * m)) * (dg[L] / (2.0 * m))
        assert abs(r["q"] - exp) < 1e-6, L
    assert got["n_members"].sum() == len(lab)
    assert got["degree_sum"].sum() == 2 * int(m)


def test_link_prediction_vs_pandas_brute(ray_session):
    """Common-neighbor/Jaccard scores == pandas brute force over the same
    strong co-purchase adjacency."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import link_prediction
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        strong_copurchase_edges,
    )

    sf = "/root/testdata/sf0.001"
    got = link_prediction(sf).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    eu = strong_copurchase_edges(sf).to_pandas()
    adj = {}
    for a, b in zip(eu["src"], eu["dst"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    assert len(got) == len(eu)
    assert (got["common_neighbors"] == 0).any()  # zero-cn edges survive the left join
    for _, r in got.iterrows():
        u, v = int(r["src"]), int(r["dst"])
        cn = len(adj[u] & adj[v])
        assert r["common_neighbors"] == cn, (u, v)
        exp = cn / (len(adj[u]) + len(adj[v]) - cn)
        assert abs(r["jaccard"] - exp) < 1e-6, (u, v)


def test_max_spanning_forest_vs_kruskal(ray_session):
    """Boruvka maximum spanning forest == brute Kruskal with the identical
    (n_orders desc, (src,dst) asc) total order — unique tie-broken weights
    make the forest edge set deterministic; per-component edge counts and
    total weight must match exactly."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        max_spanning_forest,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_weights,
    )

    sf = "/root/testdata/sf0.001"
    forest, rounds = max_spanning_forest(sf)
    got = {
        (int(s), int(d))
        for s, d in zip(forest["src"].to_numpy(), forest["dst"].to_numpy())
    }
    ew = copurchase_weights(sf).to_pandas()
    edges = sorted(
        zip(ew["n_orders"], ew["src"], ew["dst"]),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    exp = set()
    for n, s, d in edges:
        rs, rd_ = find(int(s)), find(int(d))
        if rs != rd_:
            parent[rs] = rd_
            exp.add((int(s), int(d)))
    assert got == exp
    assert rounds >= 1
    wmap = {(int(s), int(d)): int(n) for n, s, d in edges}
    assert int(forest["n_orders"].to_numpy().sum()) == sum(
        wmap[e] for e in exp
    )


def test_build_csr_eflags_or_combine():
    """Duplicate (src, dst) rows OR-combine their direction flags at CSR
    build: a two-way pair symmetrized as (u,v,1)+(u,v,2) → one edge, flag 3."""
    from subgraph_isomorphism_pregel_ray.state.csr import build_csr

    src = np.array([1, 1, 1, 2], dtype=np.uint64)
    dst = np.array([2, 2, 3, 3], dtype=np.uint64)
    fl = np.array([1, 2, 1, 2], dtype=np.uint8)
    csr = build_csr(0, 1, src, dst, np.array([1, 2, 3], np.uint64), eflags=fl)
    assert csr.num_edges == 3
    # edges lexsorted by (src, dst): (1,2) (1,3) (2,3)
    assert csr.eflags.tolist() == [3, 1, 2]


def test_scc_checkpoint_resume(ray_session, tmp_path):
    """SCC mid-run resume is bit-identical — checkpoints can land inside a
    propagation round OR at a peel boundary; both replay exactly
    (FIXTURES.md F5)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        _flag_symmetrize,
        scc,
    )

    rng = np.random.default_rng(11)
    n = 120
    s = rng.integers(0, n, 2 * n)
    d = rng.integers(0, n, 2 * n)
    keep = s != d
    s, d = s[keep], d[keep]
    flagged = _flag_symmetrize(edges_from_arrays(s, d))
    gdir, ckdir = str(tmp_path / "gscc"), str(tmp_path / "ckscc")
    partition_graph(flagged, 4, gdir, directed=True)

    eng = BSPEngine(gdir, 4)
    eng.run("scc", max_steps=500)
    ref = eng.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    eng.shutdown()

    engA = BSPEngine(gdir, 4)
    engA.run("scc", max_steps=3, checkpoint_dir=ckdir, checkpoint_every=1)
    engA.shutdown()
    engB = BSPEngine(gdir, 4)
    engB.run("scc", max_steps=500, checkpoint_dir=ckdir, checkpoint_every=1,
             resume=True)
    resumed = engB.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    engB.shutdown()
    assert np.array_equal(ref["vid"].values, resumed["vid"].values)
    assert np.array_equal(ref["scc"].values, resumed["scc"].values)
    assert (resumed["scc"].values != np.uint64(0xFFFFFFFFFFFFFFFF)).all()


def test_ktruss_bsp_matches_dataset_path(ray_session):
    """BSP-actor k-truss (period-3 superstep peeling) reaches the same
    fixpoint edge set as the Dataset-shuffle path on the planted-clique
    graph — two engines, one algorithm."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import ktruss, ktruss_bsp

    rng = np.random.default_rng(6)
    src = rng.integers(0, 30, 60)
    dst = rng.integers(0, 30, 60)
    keep = src < dst
    E = set(zip(src[keep].tolist(), dst[keep].tolist()))
    E |= {(a, b) for a in range(6) for b in range(a + 1, 6)}  # planted 6-clique
    E = sorted(E)
    tbl = pa.table(
        {
            "src": np.asarray([e[0] for e in E], np.int64),
            "dst": np.asarray([e[1] for e in E], np.int64),
        }
    )
    ds_out, _ = ktruss(rd.from_arrow(tbl).repartition(3), k=5)
    got_ds = set(map(tuple, ds_out.to_pandas().itertuples(index=False)))
    bsp_out, _ = ktruss_bsp(rd.from_arrow(tbl), k=5, num_parts=4)
    got_bsp = set(map(tuple, bsp_out.to_pandas().itertuples(index=False)))
    assert got_bsp == got_ds


def test_ktruss_bsp_checkpoint_resume(ray_session, graph_arrays, tmp_path):
    """Mid-ROUND resume (kill after a phase-1 apply, pending credits in the
    checkpoint) reproduces the straight run's surviving edge set exactly —
    the slot+credit state table round-trips parquet."""
    s, d = graph_arrays
    gdir, ckdir = str(tmp_path / "gkt"), str(tmp_path / "ckkt")
    partition_graph(edges_from_arrays(s, d), 4, gdir, directed=False)
    params = {"k": 4}

    eng = BSPEngine(gdir, 4)
    eng.run("ktruss", params, max_steps=100)
    ref = eng.result_table().to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    eng.shutdown()

    engA = BSPEngine(gdir, 4)  # "killed" after step 4 (round 2, phase 1)
    engA.run("ktruss", params, max_steps=5, checkpoint_dir=ckdir, checkpoint_every=1)
    engA.shutdown()
    assert os.path.isdir(os.path.join(ckdir, "step=4"))
    engB = BSPEngine(gdir, 4)
    engB.run("ktruss", params, max_steps=100, checkpoint_dir=ckdir,
             checkpoint_every=1, resume=True)
    resumed = engB.result_table().to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    engB.shutdown()
    assert np.array_equal(ref["src"].values, resumed["src"].values)
    assert np.array_equal(ref["dst"].values, resumed["dst"].values)
