"""Round-2 regression tests: SQL-exact rounding, single-partition exchange,
PageRank tol short-circuit, the IVF inverted index, and vectorized lang_id."""

import numpy as np
import pyarrow as pa
import pytest

from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away


def _edges_ds(pairs):
    import ray.data as rd

    src = np.array([a for a, b in pairs] + [b for a, b in pairs], dtype=np.int64)
    dst = np.array([b for a, b in pairs] + [a for a, b in pairs], dtype=np.int64)
    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


# ---------------------------------------------------------------------------
def test_round_half_away_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(7)
    xs = np.concatenate(
        [
            rng.random(20000) * 100,
            -rng.random(5000) * 10,
            rng.integers(0, 2 * 10**6, 20000).astype(float) / (2 * 10**6),
            np.array([0.8203125, -0.8203125, 0.0, 2.675, 1e-7]),
        ]
    )
    con = duckdb.connect()
    con.register("t", pa.table({"x": xs}))
    for nd in (4, 6, 8):
        d = con.sql(f"select round(x,{nd}) r from t").fetchnumpy()["r"]
        assert (round_half_away(xs, nd) == d).all()
    # the exact regression that broke text_stats in round 1
    assert round_half_away(0.8203125, 6) == 0.820313
    assert np.round(0.8203125, 6) == 0.820312  # numpy banker's — the old bug


# ---------------------------------------------------------------------------
def test_exchange_attr_single_partition(ray_session):
    """num_parts=1 exercises the local self-serve path (ADVICE: the remote
    round mis-shapes under num_returns=1). Triangles need the degree
    exchange; 4-clique = 4 triangles."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import triangle_count

    edges = _edges_ds([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    total, _, _ = triangle_count(edges, num_parts=1)
    assert total == 4


def test_pagerank_tol_short_circuit(ray_session):
    """tol-driven convergence must actually end the run (active==0 AND
    sent==0), not just report active=0 while scatter keeps sending."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import pagerank

    edges = _edges_ds([(0, 1), (1, 2), (2, 0), (3, 4)])
    res, run = pagerank(edges, iters=500, tol=1e-6, num_parts=2)
    steps = run["steps"]
    assert steps < 100, f"tol never stopped the loop: ran {steps} supersteps"
    assert run["lineage"][-1]["sent"] == 0
    # ranks are still a valid distribution
    assert res["rank"].to_numpy().sum() == pytest.approx(1.0, rel=1e-6)


# ---------------------------------------------------------------------------
def test_ivf_inverted_index_prunes_and_matches(ray_session, tmp_path):
    """The IVF path must (a) read only probed cells — scored rows ≈
    nprobe/n_cells of the corpus, (b) agree with the full-scan-masked
    formulation, (c) reuse the on-disk index on the second call."""
    import os

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        _norm_rows,
        _train_centroids,
        ann_topk_ivf,
    )

    rng = np.random.default_rng(11)
    n, dim, n_cells, nprobe, k = 600, 16, 8, 3, 7
    M = rng.standard_normal((n, dim)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.array(list(M), type=pa.list_(pa.float32())),
            }
        )
    )
    idx = str(tmp_path / "ivf")
    out, stats = ann_topk_ivf(
        ds, [3, 17], k=k, n_cells=n_cells, nprobe=nprobe, index_dir=idx,
        return_stats=True,
    )
    out = out.to_pandas()

    # (a) pruning: per query we score ≈ nprobe/n_cells of the corpus; the
    # union across 2 queries is ≤ 2× that (cells can overlap). Generous slack
    # for uneven k-means-lite cells.
    assert stats["corpus_rows"] == n
    assert stats["scored_rows"] < 2 * n * (nprobe / n_cells) * 2.5
    assert len(stats["probed_cells"]) <= 2 * nprobe

    # (b) parity with the full-scan-masked oracle (the round-1 semantics)
    cent = _train_centroids(ds, n_cells, seed=13, sample_n=2048)
    Mn = _norm_rows(M.astype(np.float64))
    cell = (Mn @ cent.T).argmax(axis=1)
    for qid in (3, 17):
        probes = np.argsort(-(Mn[qid] @ cent.T))[:nprobe]
        mask = np.isin(cell, probes) & (np.arange(n) != qid)
        cos = Mn @ Mn[qid]
        idxs = np.nonzero(mask)[0]
        # final fold sorts on the 6-rounded cos, vec_id tie-break
        order = np.lexsort((idxs, -round_half_away(cos[idxs], 6)))[:k]
        want = idxs[order]
        got = out[out.query_id == qid].sort_values("rank")["vec_id"].to_numpy()
        assert np.array_equal(got, want), f"query {qid}: {got} vs {want}"

    # (c) index reuse: _SUCCESS short-circuits the rebuild
    marker = os.path.join(idx, "_SUCCESS")
    mtime = os.path.getmtime(marker)
    out2 = ann_topk_ivf(
        ds, [3, 17], k=k, n_cells=n_cells, nprobe=nprobe, index_dir=idx
    ).to_pandas()
    assert os.path.getmtime(marker) == mtime
    assert out2.equals(out)


# ---------------------------------------------------------------------------
_QUERIES = {
    "P3": ([0, 1, 0], [(0, 1), (1, 2)]),
    "tri": ([0, 1, 2], [(0, 1), (1, 2), (2, 0)]),
    "4cyc": ([0, 2, 1, 2], [(0, 1), (1, 2), (2, 3), (3, 0)]),
    "chair": ([0, 1, 0, 1, 2], [(0, 1), (1, 2), (2, 3), (1, 4)]),
    "star3": ([1, 0, 0, 0], [(0, 1), (0, 2), (0, 3)]),
}


def _local_cand_stats(labels, edges, ql, qe):
    """Test-side candidate stats with the engine's directed-symmetric edge
    convention (each undirected edge counted in both directions)."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    k = len(ql)
    qadj = [set() for _ in range(k)]
    for a, b in qe:
        qadj[a].add(b)
        qadj[b].add(a)
    qdeg = [len(s) for s in qadj]
    diag = [
        sum(1 for v in labels if labels[v] == ql[u] and deg.get(v, 0) >= qdeg[u])
        for u in range(k)
    ]
    pair = {}
    for a, b in qe:
        u1, u2 = (max(a, b), min(a, b))
        c = 0
        for v, w in edges:
            for x, y in ((v, w), (w, v)):
                if (
                    labels[x] == ql[u1] and deg[x] >= qdeg[u1]
                    and labels[y] == ql[u2] and deg[y] >= qdeg[u2]
                ):
                    c += 1
        pair[(u1, u2)] = c
    return diag, pair


@pytest.mark.parametrize("strategy", ["degree", "anti-degree", "random", "candidate"])
def test_match_order_strategies_vs_brute_force(strategy):
    """Counts must be invariant across plan order strategies and match the
    brute-force oracle (reference -order modes, SItypes/SIQuery.h:234-268)."""
    from subgraph_isomorphism_pregel_ray.pipelines.match import (
        brute_force_count,
        build_plan,
    )
    from subgraph_isomorphism_pregel_ray.state.local import LocalBSP

    for trial in range(3):
        rng = np.random.default_rng(300 + trial)
        n = [30, 60, 100][trial]
        m = n * 3
        s, d = rng.integers(0, n, m), rng.integers(0, n, m)
        keep = s != d
        s, d = s[keep], d[keep]
        verts = np.unique(np.concatenate([s, d]))
        labels = {int(v): int(v % 3) for v in verts}
        edges = list({(int(min(a, b)), int(max(a, b))) for a, b in zip(s, d)})
        for qname, (ql, qe) in _QUERIES.items():
            if max(ql) >= 3:
                continue
            stats = (
                _local_cand_stats(labels, edges, ql, qe)
                if strategy == "candidate"
                else None
            )
            plan = build_plan(ql, qe, order=strategy, cand_stats=stats, seed=trial)
            oracle = brute_force_count(labels, edges, ql, qe)
            eng = LocalBSP(s, d, num_parts=4, labels=labels, directed=False)
            eng.run("match", {"plan": plan}, max_steps=2 * len(ql) + 2)
            assert eng.scalars()["embeddings"] == oracle, (strategy, trial, qname)


def test_candidate_stats_on_engine(ray_session):
    """candidate_stats on the real BSP engine matches the local oracle, and
    order='candidate' reproduces the toy golden count of 4."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import build_engine
    from subgraph_isomorphism_pregel_ray.pipelines.match import (
        candidate_stats,
        match_count,
        toy_graph,
        toy_query,
    )

    labels, edges = toy_graph()
    ql, qe = toy_query()
    src = np.array([a for a, _ in edges], dtype=np.int64)
    dst = np.array([b for _, b in edges], dtype=np.int64)
    edges_ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    labels_ds = rd.from_arrow(
        pa.table(
            {
                "vid": np.array(sorted(labels), dtype=np.uint64),
                "label": np.array([labels[v] for v in sorted(labels)], dtype=np.int64),
            }
        )
    )
    eng = build_engine(edges_ds, 3, labels_ds=labels_ds, directed=False)
    try:
        diag, pair = candidate_stats(eng, ql, qe)
        want_diag, want_pair = _local_cand_stats(labels, edges, ql, qe)
        assert diag == want_diag
        assert pair == want_pair
        count, _ = match_count(eng, ql, qe, order="candidate")
        assert count == 4
    finally:
        eng.shutdown()


# ---------------------------------------------------------------------------
SF_SMOKE = "/root/testdata/sf0.001"


def test_copurchase_min_orders_vs_duckdb(ray_session):
    """Strong co-purchase graph (pairs sharing ≥ 2 distinct orders) must
    reproduce the SQL HAVING count(DISTINCT orderkey) >= 2 exactly."""
    import duckdb

    from subgraph_isomorphism_pregel_ray.pipelines.relational import copurchase_edges

    got = (
        copurchase_edges(SF_SMOKE, min_orders=2)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(
        f"""SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM read_parquet('{SF_SMOKE}/lineitem.parquet') a
        JOIN read_parquet('{SF_SMOKE}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2
        HAVING count(DISTINCT a.l_orderkey) >= 2 ORDER BY 1, 2"""
    ).df()
    assert len(got) == len(want)
    assert (got["src"].to_numpy() == want["src"].to_numpy()).all()
    assert (got["dst"].to_numpy() == want["dst"].to_numpy()).all()


def test_deep_query_engine_vs_bruteforce(ray_session):
    """7-vertex branchy query (depth 4, 3-way branch) on the strong graph:
    engine count == brute force, and the lineage reports per-superstep
    message bytes (the frontier-width bound the bench tracks)."""
    import duckdb

    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.match import (
        brute_force_count,
        match_count,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_edges,
        part_labels,
    )

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        strong_copurchase_edges,
    )

    ql = [0, 1, 2, 0, 1, 0, 2]
    qe = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (2, 6)]
    strong = strong_copurchase_edges(SF_SMOKE).to_pandas()
    edges = list(zip(strong["src"].astype(int), strong["dst"].astype(int)))
    con = duckdb.connect()
    lab_df = con.sql(
        f"SELECT p_partkey AS vid, p_size % 3 AS l FROM "
        f"read_parquet('{SF_SMOKE}/part.parquet')"
    ).df()
    labels = dict(zip(lab_df["vid"].astype(int), lab_df["l"].astype(int)))
    oracle = brute_force_count(labels, edges, ql, qe)

    count, lineage = match_count(
        symmetrize(strong_copurchase_edges(SF_SMOKE)),
        ql,
        qe,
        labels_ds=part_labels(SF_SMOKE, mod=3),
        num_parts=4,
    )
    assert count == oracle
    rows = lineage["lineage"]
    assert all("sent_bytes" in r for r in rows)
    assert max(r["sent_bytes"] for r in rows) > 0


# ---------------------------------------------------------------------------
def test_ngram_jaccard_pairs_exact(ray_session):
    """Exact all-pairs Jaccard via the shingle inverted index must equal the
    brute-force pairwise oracle (every pair, not LSH-recall-limited)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import (
        jaccard_ngrams,
        ngram_jaccard_pairs,
    )

    rng = np.random.default_rng(3)
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = []
    for i in range(60):
        t = base + f" tail{i % 7}"
        if i % 5 == 0:
            t = t.replace("quick", "rapid")
        texts.append(t)
    ds = rd.from_arrow(
        pa.table({"doc_id": np.arange(60, dtype=np.int64), "text": texts})
    )
    got = ngram_jaccard_pairs(ds, k=5, threshold=0.6).to_pandas()
    got_set = {
        (int(r.doc_a), int(r.doc_b)): r.jaccard for r in got.itertuples()
    }
    want = {}
    for a in range(60):
        for b in range(a + 1, 60):
            j = jaccard_ngrams(texts[a], texts[b], 5)
            if j >= 0.6:
                want[(a, b)] = float(round_half_away(j, 6))
    assert got_set == want
    assert len(want) > 50  # the corpus genuinely has near-dups


def test_simhash_dup_pairs_complete(ray_session):
    """Byte-band SimHash pairs must equal the brute-force all-pairs Hamming
    scan (banding is COMPLETE for distance ≤ 7 by pigeonhole)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import simhash_dup_pairs
    from subgraph_isomorphism_pregel_ray.pipelines.textops import simhash_batch

    base = "pack my box with five dozen liquor jugs and some extra words here"
    texts = [
        base if i % 4 else base.replace("five", f"f{i}ve") + f" v{i % 3}"
        for i in range(80)
    ]
    t = pa.table({"doc_id": np.arange(80, dtype=np.int64), "text": texts})
    sigs = simhash_batch(t)["simhash"].to_numpy().view(np.uint64)
    want = {}
    for a in range(80):
        for b in range(a + 1, 80):
            h = int(bin(int(sigs[a] ^ sigs[b])).count("1"))
            if h <= 7:
                want[(a, b)] = h
    got = simhash_dup_pairs(rd.from_arrow(t), max_hamming=7).to_pandas()
    got_map = {(int(r.doc_a), int(r.doc_b)): int(r.hamming) for r in got.itertuples()}
    assert got_map == want
    assert len(want) > 100  # corpus genuinely has near-identical docs


# ---------------------------------------------------------------------------
def test_match_output_throttling(ray_session):
    """max_out_rows must bound the per-superstep exchange (deferred work
    arrives as self-messages) while leaving the count unchanged."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.match import match_count

    rng = np.random.default_rng(55)
    s, d = rng.integers(0, 100, 900), rng.integers(0, 100, 900)
    keep = s != d
    verts = np.unique(np.concatenate([s[keep], d[keep]]))
    eds = rd.from_arrow(
        pa.table({"src": s[keep].astype(np.int64), "dst": d[keep].astype(np.int64)})
    )
    lds = rd.from_arrow(
        pa.table(
            {
                "vid": verts.astype(np.uint64),
                "label": (verts % 2).astype(np.int64),
            }
        )
    )
    ql, qe = [0, 1, 0, 1], [(0, 1), (1, 2), (2, 3)]  # P4: wide frontier
    base, lin0 = match_count(eds, ql, qe, labels_ds=lds, num_parts=3)
    throttled, lin1 = match_count(
        eds, ql, qe, labels_ds=lds, num_parts=3,
        max_out_rows=50, max_steps=4000,
    )
    assert throttled == base
    assert lin1["steps"] > lin0["steps"]  # work was spread across supersteps
    # per-step emitted rows bounded: budget per partition + one overflow item
    peak0 = max(r["sent"] for r in lin0["lineage"])
    peak1 = max(r["sent"] for r in lin1["lineage"])
    assert peak1 < peak0


def test_match_bushy_tail_fold_parity(ray_session):
    """Trailing-leaf factor fold (plan tail_start / MatchProgram._fold_tail —
    the SIBranch factor-carry): a 7-vertex 3-branch bushy query's count over
    a random labeled graph equals full brute-force enumeration, and the plan
    actually engages the fold (3 trailing leaves)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.match import (
        build_plan,
        match_count,
    )

    ql = [3, 0, 1, 1, 2, 2, 0]
    qe = [(0, 1), (1, 2), (0, 3), (3, 4), (0, 5), (5, 6)]
    plan = build_plan(ql, qe)
    assert plan["tail_start"] == len(ql) - 3  # all three leaves fold

    rng = np.random.default_rng(7)
    s, d = rng.integers(0, 24, 90), rng.integers(0, 24, 90)
    keep = s != d
    pairs = sorted({(min(a, b), max(a, b)) for a, b in zip(s[keep], d[keep])})
    verts = sorted({v for e in pairs for v in e})
    labels = {v: (3 if v % 8 == 0 else int(v % 3)) for v in verts}
    expected = len(_brute_force_embeddings(labels, pairs, ql, qe))

    eds = rd.from_arrow(
        pa.table(
            {
                "src": np.array([a for a, b in pairs] + [b for a, b in pairs], np.int64),
                "dst": np.array([b for a, b in pairs] + [a for a, b in pairs], np.int64),
            }
        )
    )
    lds = rd.from_arrow(
        pa.table(
            {
                "vid": np.array(verts, np.uint64),
                "label": np.array([labels[v] for v in verts], np.int64),
            }
        )
    )
    count, _ = match_count(eds, ql, qe, labels_ds=lds, num_parts=3)
    assert count == expected


def test_match_bushy_peak_bytes_bounded(ray_session):
    """The bushy driver query's exchange stays bounded: per-branch
    multiplicity is ≥ the leaf fanout, yet max sent_bytes per superstep is
    capped by max_out_rows × row width (the factors cross the exchange,
    never the branch product), and the count is throttle-invariant."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.match import match_count

    rng = np.random.default_rng(11)
    n, m = 120, 2400
    s, d = rng.integers(0, n, m), rng.integers(0, n, m)
    keep = s != d
    pairs = sorted({(min(a, b), max(a, b)) for a, b in zip(s[keep], d[keep])})
    verts = sorted({v for e in pairs for v in e})
    ql = [3, 0, 1, 1, 2, 2, 0]
    qe = [(0, 1), (1, 2), (0, 3), (3, 4), (0, 5), (5, 6)]
    eds = rd.from_arrow(
        pa.table(
            {
                "src": np.array([a for a, b in pairs] + [b for a, b in pairs], np.int64),
                "dst": np.array([b for a, b in pairs] + [a for a, b in pairs], np.int64),
            }
        )
    )

    def _lds():
        return rd.from_arrow(
            pa.table(
                {
                    "vid": np.array(verts, np.uint64),
                    "label": np.array(
                        [3 if v % 29 == 0 else int(v % 3) for v in verts], np.int64
                    ),
                }
            )
        )

    base, lin0 = match_count(eds, ql, qe, labels_ds=_lds(), num_parts=3)
    budget = 64
    throttled, lin1 = match_count(
        eds, ql, qe, labels_ds=_lds(), num_parts=3,
        max_out_rows=budget, max_steps=4000,
    )
    assert throttled == base and base > 0
    peak_rows = max(r["sent"] for r in lin1["lineage"])
    # lineage "sent" is the GLOBAL sum: per partition the cap is budget +
    # one item's emission overshoot (≤ one row's fanout ≈ max degree)
    deg = np.zeros(n, np.int64)
    for a, b in pairs:
        deg[a] += 1; deg[b] += 1
    assert peak_rows <= 3 * (budget + int(deg.max()))


def _brute_force_embeddings(data_labels, data_edges, ql, qe):
    """All embeddings as a set of full mapping tuples (test oracle)."""
    k = len(ql)
    qadj = [set() for _ in range(k)]
    for a, b in qe:
        qadj[a].add(b)
        qadj[b].add(a)
    dadj = {v: set() for v in data_labels}
    for a, b in data_edges:
        if a == b:
            continue
        dadj.setdefault(a, set()).add(b)
        dadj.setdefault(b, set()).add(a)
    verts = sorted(data_labels)
    out = set()
    mapping = []

    def rec(u):
        if u == k:
            out.add(tuple(mapping))
            return
        back = [q for q in qadj[u] if q < u]
        cand = dadj[mapping[back[0]]] if back else verts
        for v in cand:
            if data_labels.get(v) != ql[u] or v in mapping:
                continue
            if all(mapping[q] in dadj[v] for q in back):
                mapping.append(v)
                rec(u + 1)
                mapping.pop()

    rec(0)
    return out


def test_match_embeddings_enumeration(ray_session):
    """ENUMERATE mode must return the exact embedding SET (not just its
    size), on the toy golden graph and on random labeled graphs."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.match import (
        match_embeddings,
        toy_graph,
        toy_query,
    )

    cases = []
    labels, edges = toy_graph()
    cases.append((labels, edges, *toy_query()))
    rng = np.random.default_rng(77)
    s, d = rng.integers(0, 40, 120), rng.integers(0, 40, 120)
    keep = s != d
    verts = np.unique(np.concatenate([s[keep], d[keep]]))
    labels2 = {int(v): int(v % 3) for v in verts}
    edges2 = list({(int(min(a, b)), int(max(a, b))) for a, b in zip(s[keep], d[keep])})
    cases.append((labels2, edges2, [0, 1, 2], [(0, 1), (1, 2), (2, 0)]))
    cases.append((labels2, edges2, [0, 1, 0], [(0, 1), (1, 2)]))

    for labels, edges, ql, qe in cases:
        want = _brute_force_embeddings(labels, edges, ql, qe)
        src = np.array([a for a, _ in edges], dtype=np.int64)
        dst = np.array([b for _, b in edges], dtype=np.int64)
        eds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
        lds = rd.from_arrow(
            pa.table(
                {
                    "vid": np.array(sorted(labels), dtype=np.uint64),
                    "label": np.array(
                        [labels[v] for v in sorted(labels)], dtype=np.int64
                    ),
                }
            )
        )
        df = match_embeddings(eds, ql, qe, labels_ds=lds, num_parts=3).to_pandas()
        got = set(
            tuple(int(df[f"v{u}"].iloc[i]) for u in range(len(ql)))
            for i in range(len(df))
        )
        assert got == want, (ql, len(got), len(want))


# ---------------------------------------------------------------------------
def test_multimodal_codec_seam(ray_session):
    """The decoder is injectable per actor (fn_constructor_kwargs seam): a
    custom fake must actually be used by every actor."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.multimodal import (
        decode_features,
        synth_media_table,
    )

    def all_sevens(payload):
        return np.full((4, 4, 3), 7, dtype=np.uint8)

    tbl = synth_media_table(50, seed=1)
    ds = rd.from_arrow(tbl)
    kinds = dict(zip(tbl["media_id"].to_pylist(), tbl["kind"].to_pylist()))
    out = decode_features(ds, decoder=all_sevens).to_pandas()
    assert len(out) == 50
    img = out[out["media_id"].map(kinds) == "image"]
    assert (img["px_mean"] == 7.0).all() and (img["px_std"] == 0.0).all()
    # the default REAL ppm decoder produces non-constant pixels
    base = decode_features(ds).to_pandas()
    bimg = base[base["media_id"].map(kinds) == "image"]
    assert not (bimg["px_std"] == 0.0).any()


# ---------------------------------------------------------------------------
def test_lang_id_overlapping_stopwords(ray_session):
    """'la'/'un'/'que' belong to BOTH fr and es stopword sets — the
    vectorized membership must credit every language (equal-range, not
    leftmost hit)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import lang_id_batch

    t = pa.table(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "la que un",          # fr == es == 3 → tie → alphabetical 'es'
                "le la et les",       # fr wins
                "el los la",          # es wins
                "xyzzy plugh",        # no hits → en
                "一 some text",       # han → zh
            ],
        }
    )
    out = lang_id_batch(t)["lang_pred"].to_pylist()
    assert out == ["es", "fr", "es", "en", "zh"]


def test_events_asof_strictness_and_ties(ray_session, tmp_path):
    """Equal-timestamp rights are NOT prior (strict as-of); among rights at
    the kept max-ts, the max event_id wins — mirrors the SQL oracle."""
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_asof_prior

    us = np.int64(1_000_000)
    t = pa.table(
        {
            "event_id": np.array([100, 101, 102, 103, 200, 201, 202], np.int64),
            "ts": pa.array(
                np.array([10, 10, 10, 20, 5, 6, 7], np.int64) * us
            ).cast(pa.timestamp("us")),
            "user_id": np.array([1, 1, 1, 1, 2, 2, 2], np.int64),
            "event_type": [
                "purchase", "purchase", "click", "click",
                "click", "purchase", "click",
            ],
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = (
        events_asof_prior(str(tmp_path), num_buckets=2)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # click 102 (ts==purchase ts) and click 200 (nothing prior) are dropped
    assert out["event_id"].tolist() == [103, 202]
    assert out["prior_event_id"].tolist() == [101, 201]  # 101 = max id at tie
    assert out["prior_ts"].astype("int64").tolist() == [10 * us, 6 * us]


def test_revenue_by_nation_vs_duckdb(ray_session):
    """TPC-H-Q5-shaped rollup: the two bucketed repartition joins plus exact
    integer-cents revenue must reproduce the SQL 4-table join bit-exactly
    (the int64 partial sums make the result summation-order-independent)."""
    import duckdb

    from subgraph_isomorphism_pregel_ray.pipelines.relational import revenue_by_nation

    got = (
        revenue_by_nation(SF_SMOKE, num_buckets=8)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(
        f"""SELECT n_name, sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
               (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
        FROM read_parquet('{SF_SMOKE}/lineitem.parquet') li
        JOIN read_parquet('{SF_SMOKE}/orders.parquet') o ON o_orderkey = l_orderkey
        JOIN read_parquet('{SF_SMOKE}/customer.parquet') c ON c_custkey = o_custkey
        JOIN read_parquet('{SF_SMOKE}/nation.parquet') n ON n_nationkey = c_nationkey
        GROUP BY 1 ORDER BY 1"""
    ).df()
    assert got.shape == want.shape
    assert (got["n_name"].to_numpy() == want["n_name"].to_numpy()).all()
    assert (got["revenue"].to_numpy() == want["revenue"].to_numpy()).all()


def test_hits_vs_numpy_reference(ray_session):
    """HITSProgram (DAG orientation u→v iff u<v, simultaneous updates, one
    final L2 normalization) must reproduce a direct numpy iteration exactly,
    at a partition count that forces cross-partition exchanges."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import hits

    rng = np.random.default_rng(11)
    pairs = sorted(
        {(min(u, v), max(u, v)) for u, v in rng.integers(0, 80, (400, 2)) if u != v}
    )
    src = np.array([p[0] for p in pairs], np.uint64)
    dst = np.array([p[1] for p in pairs], np.uint64)
    edges = rd.from_arrow(
        pa.table({"src": np.concatenate([src, dst]), "dst": np.concatenate([dst, src])})
    )
    res, _ = hits(edges, iters=7, num_parts=3)
    got = res.to_pandas().sort_values("vid").reset_index(drop=True)

    verts = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(verts)}
    a = np.ones(len(verts))
    h = np.ones(len(verts))
    for _ in range(7):
        na, nh = np.zeros(len(verts)), np.zeros(len(verts))
        for u, v in pairs:
            na[idx[v]] += h[idx[u]]
            nh[idx[u]] += a[idx[v]]
        a, h = na, nh
    a /= np.sqrt(a @ a)
    h /= np.sqrt(h @ h)
    assert (got["vid"].to_numpy() == verts.astype(np.int64)).all()
    np.testing.assert_allclose(got["auth"].to_numpy(), a, atol=1e-12, rtol=0)
    np.testing.assert_allclose(got["hub"].to_numpy(), h, atol=1e-12, rtol=0)


def test_topk_parts_per_nation_vs_duckdb(ray_session):
    """Grouped top-k (broadcast supplier lookup + single groupby) must match
    the SQL row_number formulation exactly, including the partkey tie-break."""
    import duckdb

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        topk_parts_per_nation,
    )

    got = (
        topk_parts_per_nation(SF_SMOKE, k=3)
        .to_pandas()
        .sort_values(["nation", "rnk"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(
        f"""WITH r AS (SELECT s_nationkey AS nation, l_partkey AS partkey,
              sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet') li
            JOIN read_parquet('{SF_SMOKE}/supplier.parquet') su ON s_suppkey = l_suppkey
            GROUP BY 1, 2),
        t AS (SELECT nation, partkey, rev, row_number() OVER
              (PARTITION BY nation ORDER BY rev DESC, partkey) AS rn FROM r)
        SELECT CAST(nation AS BIGINT) AS nation, partkey,
               rev / 10000.0 AS revenue, CAST(rn AS BIGINT) AS rnk
        FROM t WHERE rn <= 3 ORDER BY nation, rnk"""
    ).df()
    assert got.shape == want.shape
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_distinct_users_daily_and_anti_join_vs_duckdb(ray_session):
    """Partial-dedup COUNT DISTINCT and the bucketed anti-join must match
    their SQL formulations exactly (semi/anti share the np.isin kernel)."""
    import duckdb

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        distinct_users_daily,
        parts_never_ordered,
    )

    con = duckdb.connect()
    got = (
        distinct_users_daily(SF_SMOKE)
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    want = con.sql(
        f"""SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
            CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2"""
    ).df()
    assert got.shape == want.shape
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    got2 = np.sort(
        parts_never_ordered(SF_SMOKE, min_qty=45).to_pandas()["p_partkey"].to_numpy()
    )
    want2 = con.sql(
        f"""SELECT p_partkey FROM read_parquet('{SF_SMOKE}/part.parquet') p
        WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{SF_SMOKE}/lineitem.parquet') l
            WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
        ORDER BY 1"""
    ).df()["p_partkey"].to_numpy()
    assert np.array_equal(got2, want2)


def test_kmeans_embeddings_vs_numpy_lloyd(ray_session):
    """Distributed partial-sufficient-statistics Lloyd's must match the
    single-process reference bit-for-bit (deterministic init, lowest-id
    tie-break, empty clusters keep their centroid)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        kmeans_embeddings,
    )

    rng = np.random.default_rng(5)
    n, dim, k, iters = 400, 12, 6, 4
    M = rng.standard_normal((n, dim))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.array(list(M), type=pa.list_(pa.float64())),
            }
        )
    ).repartition(7)
    assign_ds, cent = kmeans_embeddings(ds, k=k, iters=iters)
    got = (
        assign_ds.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    )

    C = M[:k].copy()
    for _ in range(iters):
        d = -2.0 * (M @ C.T) + (C * C).sum(axis=1)[None, :]
        a = d.argmin(axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = M[a == c].mean(axis=0)
    d = -2.0 * (M @ C.T) + (C * C).sum(axis=1)[None, :]
    want = d.argmin(axis=1)
    np.testing.assert_allclose(cent, C, atol=1e-12, rtol=0)
    assert (got == want).all()


def test_stratified_sample_batchsize_invariant(ray_session):
    """The keep decision is a pure function of the key — the sampled id set
    must be identical at any batch size / partitioning, and per-stratum
    rates must land near their targets."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import stratified_sample

    n = 4000
    t = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": np.where(np.arange(n) % 3 == 0, "en", "de"),
        }
    )
    rates = {"en": 0.2, "de": 0.7}
    a = (
        stratified_sample(rd.from_arrow(t), rates, stratum_col="lang")
        .to_pandas()["doc_id"].to_numpy()
    )
    b = (
        stratified_sample(rd.from_arrow(t).repartition(13), rates, stratum_col="lang")
        .to_pandas()["doc_id"].to_numpy()
    )
    assert np.array_equal(np.sort(a), np.sort(b))
    en = np.sum(np.sort(a) % 3 == 0) / (n // 3 + 1)
    de = (len(a) - np.sum(np.sort(a) % 3 == 0)) / (n - n // 3 - 1)
    assert abs(en - 0.2) < 0.05 and abs(de - 0.7) < 0.05


def test_resumable_sink_skips_sealed_shards(ray_session, tmp_path):
    """A re-run must not rewrite sealed shards (files untouched) and must
    complete the missing ones; total rows come out exactly once."""
    import glob
    import os

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.stages.sink import (
        sealed_shards,
        write_parquet_resumable,
    )

    out = str(tmp_path / "sink")
    t = pa.table(
        {
            "shard": np.repeat(np.arange(4, dtype=np.int64), 25),
            "x": np.arange(100, dtype=np.int64),
        }
    )
    r1 = write_parquet_resumable(rd.from_arrow(t), out, "shard")
    assert r1 == {"skipped": 0, "written": 4}
    assert sealed_shards(out, "shard") == {"0", "1", "2", "3"}

    # simulate a partial failure: shard 2 lost its data AND its seal
    import shutil

    shutil.rmtree(os.path.join(out, "shard=2"))
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{out}/shard=[013]/*.parquet")
    }
    r2 = write_parquet_resumable(rd.from_arrow(t), out, "shard")
    assert r2["skipped"] == 3 and r2["written"] == 1
    for f, m in before.items():
        assert os.path.getmtime(f) == m, f"sealed shard rewritten: {f}"
    got = rd.read_parquet(out).to_pandas()
    assert len(got) == 100 and sorted(got["x"]) == list(range(100))


def test_resumable_sink_no_prefix_truncation(ray_session, tmp_path):
    """Regression: a new shard key longer than every sealed key must NOT be
    truncated into a sealed key's width and silently dropped."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.stages.sink import write_parquet_resumable

    out = str(tmp_path / "sink2")
    t1 = pa.table({"shard": ["12"] * 3, "x": np.arange(3, dtype=np.int64)})
    write_parquet_resumable(rd.from_arrow(t1), out, "shard")
    t2 = pa.table(
        {"shard": ["12", "123", "123"], "x": np.array([0, 10, 11], np.int64)}
    )
    r = write_parquet_resumable(rd.from_arrow(t2), out, "shard")
    assert r == {"skipped": 1, "written": 1}
    got = rd.read_parquet(out).to_pandas()
    assert sorted(got[got["shard"] == "123"]["x"]) == [10, 11]
    assert len(got) == 5


def test_hits_checkpoint_resume_final_step(ray_session, tmp_path):
    """Resuming a HITS run from a checkpoint taken AT the final update step
    must still normalize (regression: the re-folded glob loses a2/h2 and a
    fresh program fell into the empty-inbox message branch → zeros)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import build_engine, hits

    rng = np.random.default_rng(23)
    pairs = sorted(
        {(min(u, v), max(u, v)) for u, v in rng.integers(0, 50, (200, 2)) if u != v}
    )
    src = np.array([p[0] for p in pairs], np.uint64)
    dst = np.array([p[1] for p in pairs], np.uint64)
    edges = rd.from_arrow(
        pa.table({"src": np.concatenate([src, dst]), "dst": np.concatenate([dst, src])})
    )
    iters = 6
    want, _ = hits(edges, iters=iters, num_parts=2)
    want = want.to_pandas().sort_values("vid").reset_index(drop=True)

    eng = build_engine(edges, 2, directed=False)
    ck = str(tmp_path / "ck")
    # checkpoint lands exactly on the final-update step (step == iters)
    eng.run(
        "hits", {"iters": iters}, max_steps=iters + 3,
        checkpoint_dir=ck, checkpoint_every=iters,
    )
    import os

    assert os.path.isdir(os.path.join(ck, f"step={iters}"))
    eng.shutdown()

    eng2 = build_engine(edges, 2, directed=False)
    lin2 = eng2.run(
        "hits", {"iters": iters}, max_steps=iters + 3,
        checkpoint_dir=ck, checkpoint_every=0, resume=True,
    )
    assert len(lin2["lineage"]) <= 4, "did not actually resume from the checkpoint" 
    got = eng2.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    eng2.shutdown()
    assert np.sqrt((got["auth"] ** 2).sum()) == pytest.approx(1.0, abs=1e-9)
    np.testing.assert_allclose(
        got["auth"].to_numpy(), want["auth"].to_numpy(), atol=1e-12, rtol=0
    )
    np.testing.assert_allclose(
        got["hub"].to_numpy(), want["hub"].to_numpy(), atol=1e-12, rtol=0
    )


def test_salient_terms_vs_brute_force_and_partition_invariant(ray_session):
    """TF-IDF-style top-k: hand-computed salience on a crafted corpus with a
    salience TIE (broken by term asc), identical at 1 vs 13 partitions."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import salient_terms

    texts = [
        "apple banana apple cherry",          # tf(apple)=2/4, unique-ish terms
        "banana banana banana date",          # heavy banana
        "cherry date elder fig",              # all singleton tf=1/4 → tie
        "apple fig fig fig",
        "",                                   # empty doc → no rows
    ]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    N = 5

    # brute-force oracle
    import collections

    docs = [[w for w in s.lower().split(" ") if w] for s in texts]
    df = collections.Counter(w for d in docs for w in set(d))
    exp = {}
    for i, d in enumerate(docs):
        if not d:
            continue
        tf = collections.Counter(d)
        scored = sorted(
            ((-(c / len(d)) / (df[w] / N), w) for w, c in tf.items())
        )[:3]
        exp[i] = [(w, r + 1, -s) for r, (s, w) in enumerate(scored)]

    outs = []
    for parts in (1, 13):
        ds = rd.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        out = (
            salient_terms(ds, n_docs=N, k=3, num_buckets=4)
            .to_pandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
        outs.append(out)
        got = {
            int(d): list(zip(g["term"], g["rank"], g["salience"]))
            for d, g in out.groupby("doc_id")
        }
        assert set(got) == set(exp)
        for i in exp:
            assert [(w, r) for w, r, _ in got[i]] == [(w, r) for w, r, _ in exp[i]], i
            for (gw, gr, gs), (ew, er, es) in zip(got[i], exp[i]):
                assert gs == es  # bit-exact: division-only scoring
    assert outs[0].equals(outs[1])
    # doc 2: elder (df=1) outranks the cherry/date tie (tf=1/4, df=2 both),
    # and the tie is broken alphabetically
    d2 = [w for w, _, _ in exp[2]]
    assert d2 == ["elder", "cherry", "date"]
    assert exp[2][1][2] == exp[2][2][2]  # equal salience → term-asc order


def test_search_topk_vs_brute_force(ray_session):
    """MaxSim search ranking vs a hand-rolled scorer; query includes a term
    absent from the corpus and the corpus includes an empty doc."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import search_topk

    texts = [
        "hash join hash hash",      # tf(hash)=3/4
        "join stream join merge",   # two query terms
        "scan filter merge sort",   # no query term
        "stream",                   # tf(stream)=1/1 → huge salience
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    got = (
        search_topk(rd.from_arrow(t), ("hash", "stream", "join", "zzz_absent"), k=3)
        .to_pandas()
        .sort_values(["n_matched", "max_salience"], ascending=[False, False])
        .reset_index(drop=True)
    )
    # brute force
    N = 5
    docs = [[w for w in s.lower().split(" ") if w] for s in texts]
    q = {"hash", "stream", "join", "zzz_absent"}
    import collections

    df = collections.Counter(w for d in docs for w in set(d) if w in q)
    scores = {}
    for i, d in enumerate(docs):
        tf = collections.Counter(w for w in d if w in q)
        if not tf:
            continue
        scores[i] = (
            len(tf),
            max((c / len(d)) / (df[w] / N) for w, c in tf.items()),
        )
    exp = sorted(scores.items(), key=lambda kv: (-kv[1][0], -kv[1][1], kv[0]))[:3]
    assert got["doc_id"].tolist() == [i for i, _ in exp]
    assert got["n_matched"].tolist() == [s[0] for _, s in exp]
    assert got["max_salience"].tolist() == [s[1] for _, s in exp]  # bit-exact


def test_text_and_event_ops_on_empty_tables(ray_session, tmp_path):
    """Zero-row inputs must stream through cleanly with typed empty output
    (the all-filtered-batch landmine: untyped empty arrays produce
    null-typed columns that break downstream kernels)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_dup_pairs,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        events_lag,
        events_range_join,
        events_sessionize,
        events_window,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.sketch import hll_registers_daily
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        salient_terms,
        search_topk,
    )

    for t in ("documents", "events"):
        src = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(src.empty_table(), tmp_path / f"{t}.parquet")
    sf = str(tmp_path)
    docs = rd.read_parquet(str(tmp_path / "documents.parquet"),
                           columns=["doc_id", "text"])

    for name, ds in {
        "exact_dedup": exact_dedup(docs),
        "minhash": minhash_lsh_pairs(docs, threshold=0.5),
        "ngram": ngram_jaccard_pairs(docs, k=5, threshold=0.5),
        "simhash_pairs": simhash_dup_pairs(docs, max_hamming=7),
        "salient": salient_terms(docs, n_docs=0, k=3),
        "search": search_topk(docs, ("hash",), k=5),
        "window": events_window(sf),
        "sessionize": events_sessionize(sf),
        "lag": events_lag(sf),
        "range_join": events_range_join(sf),
        "hll": hll_registers_daily(sf),
    }.items():
        df = ds.to_pandas()
        assert len(df) == 0, name


def test_round2_curation_ops_on_empty_tables(ray_session, tmp_path):
    """The round-2 curation ops stream zero-row inputs cleanly too."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import neighbor_sample
    from subgraph_isomorphism_pregel_ray.pipelines.corpus import (
        chunk_documents,
        pack_sequences,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        contamination,
        doc_repetition,
        unigram_quality,
    )

    src = pq.read_schema("/root/testdata/sf0.001/documents.parquet")
    pq.write_table(src.empty_table(), tmp_path / "documents.parquet")
    docs = rd.read_parquet(
        str(tmp_path / "documents.parquet"), columns=["doc_id", "text"]
    )
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
            }
        )
    )

    for name, ds in {
        "doc_repetition": doc_repetition(docs),
        "contamination": contamination(docs),
        "unigram_quality": unigram_quality(docs),
        "chunk_documents": chunk_documents(docs),
        "pack_sequences": pack_sequences(docs),
        "neighbor_sample": neighbor_sample(edges),
    }.items():
        df = ds.to_pandas()
        assert len(df) == 0, name


# ---------------------------------------------------------------------------
def test_spam_mass_vs_numpy_replay(ray_session):
    """spam_mass = (pr − tr)/pr on rounded ranks, both fixpoints replayed
    in dense numpy; trusted seeds must carry negative/low spam mass and the
    two engine runs must reuse one CSR (single partition_graph)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import spam_mass
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away

    rng = np.random.default_rng(11)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 40, (120, 2)) if a != b}
    pairs = {(min(a, b), max(a, b)) for a, b in pairs}
    out = spam_mass(_edges_ds(sorted(pairs)), iters=6, trust_mod=3, num_parts=3)
    df = out.to_pandas().sort_values("vid").reset_index(drop=True)

    vids = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    outdeg = A.sum(axis=1)
    P = A / outdeg[:, None]
    d = 0.85
    pr = np.full(n, 1.0 / n)
    for _ in range(6):
        pr = (1 - d) / n + d * (P.T @ pr)
    seed = np.array([1.0 if v % 3 == 0 else 0.0 for v in vids])
    tele = seed / seed.sum()
    tr = tele.copy()
    for _ in range(6):
        tr = (1 - d) * tele + d * (P.T @ tr)

    assert list(df.vid) == vids
    np.testing.assert_allclose(df.pr, round_half_away(pr, 8), atol=2e-8)
    np.testing.assert_allclose(df.tr, round_half_away(tr, 8), atol=2e-8)
    exp_mass = np.where(df.pr > 0, (df.pr - df.tr) / df.pr, 0.0)
    np.testing.assert_allclose(df.spam_mass, round_half_away(exp_mass, 8), atol=1e-9)
    # trusted seeds receive concentrated restart mass → lower spam mass
    m_seed = df[df.vid % 3 == 0].spam_mass.mean()
    m_rest = df[df.vid % 3 != 0].spam_mass.mean()
    assert m_seed < m_rest


def test_spam_mass_partition_invariance(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import spam_mass

    rng = np.random.default_rng(23)
    pairs = sorted(
        {
            (min(int(a), int(b)), max(int(a), int(b)))
            for a, b in rng.integers(0, 30, (80, 2))
            if a != b
        }
    )
    a = spam_mass(_edges_ds(pairs), iters=5, trust_mod=4, num_parts=1).to_pandas()
    b = spam_mass(_edges_ds(pairs), iters=5, trust_mod=4, num_parts=5).to_pandas()
    a = a.sort_values("vid").reset_index(drop=True)
    b = b.sort_values("vid").reset_index(drop=True)
    assert (a.vid == b.vid).all()
    np.testing.assert_allclose(a.pr, b.pr, atol=2e-8)
    np.testing.assert_allclose(a.tr, b.tr, atol=2e-8)
    np.testing.assert_allclose(a.spam_mass, b.spam_mass, atol=2e-7)


def test_bipartite_check_vs_bruteforce(ray_session):
    """Mixed components: even cycle (bipartite), odd cycle (not), path
    (bipartite), triangle+pendant (not) — verdicts must match BFS
    2-coloring, component ids must be min-vids, sizes exact."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import bipartite_check

    comps = {
        # vertices, edges
        "even_cycle": ([0, 1, 2, 3], [(0, 1), (1, 2), (2, 3), (3, 0)]),
        "odd_cycle": ([10, 11, 12, 13, 14], [(10, 11), (11, 12), (12, 13), (13, 14), (14, 10)]),
        "path": ([20, 21, 22], [(20, 21), (21, 22)]),
        "tri_pendant": ([30, 31, 32, 33], [(30, 31), (31, 32), (32, 30), (32, 33)]),
    }
    pairs = [e for _, (_, es) in comps.items() for e in es]
    got = (
        bipartite_check(_edges_ds(pairs), num_parts=3)
        .to_pandas()
        .sort_values("component")
        .reset_index(drop=True)
    )

    def two_colorable(vs, es):
        import collections
        adj = collections.defaultdict(list)
        for a, b in es:
            adj[a].append(b); adj[b].append(a)
        color = {}
        for s in vs:
            if s in color:
                continue
            color[s] = 0
            q = [s]
            while q:
                u = q.pop()
                for w in adj[u]:
                    if w not in color:
                        color[w] = 1 - color[u]
                        q.append(w)
                    elif color[w] == color[u]:
                        return False
        return True

    exp = sorted(
        (min(vs), len(vs), two_colorable(vs, es)) for vs, es in comps.values()
    )
    assert list(map(tuple, got[["component", "n_vertices", "is_bipartite"]].values)) == exp


@pytest.mark.parametrize("trial", range(3))
def test_bipartite_check_random(ray_session, trial):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import bipartite_check

    rng = np.random.default_rng(100 + trial)
    # random bipartite graph (parts A/B) plus, on trial 2, one odd edge
    A = np.arange(0, 12)
    B = np.arange(12, 25)
    es = {(int(rng.choice(A)), int(rng.choice(B))) for _ in range(40)}
    if trial == 2:
        es.add((0, 1))  # same-side edge → odd cycle somewhere if 0,1 connected
    got = bipartite_check(_edges_ds(sorted(es)), num_parts=4).to_pandas()

    import collections
    adj = collections.defaultdict(list)
    for a, b in es:
        adj[a].append(b); adj[b].append(a)
    verdicts = {}
    seen = set()
    for s in sorted(adj):
        if s in seen:
            continue
        color, q, ok, members = {s: 0}, [s], True, []
        while q:
            u = q.pop()
            members.append(u)
            for w in adj[u]:
                if w not in color:
                    color[w] = 1 - color[u]; q.append(w)
                elif color[w] == color[u]:
                    ok = False
        seen.update(members)
        verdicts[min(members)] = (len(set(members)), ok)
    for _, row in got.iterrows():
        n, ok = verdicts[row.component]
        assert (row.n_vertices, row.is_bipartite) == (n, ok)
    assert len(got) == len(verdicts)


# ---------------------------------------------------------------------------
def _semi_cluster_reference(pairs, iters, c_max, m_max, f_b):
    """Scalar replay of the Pregel-paper §5.3 semi-clustering rules."""
    import collections

    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    vs = sorted(adj)

    def score(mm, I, B):
        n = len(mm)
        return 0.0 if n < 2 else (I - f_b * B) / (n * (n - 1) / 2)

    clusters = {v: [((v,), 0, len(adj[v]))] for v in vs}
    for _ in range(iters):
        nxt = {}
        for v in vs:
            cand = {c[0]: c for c in clusters[v]}
            for u in sorted(adj[v]):
                for mm, I, B in clusters[u]:
                    if mm not in cand:
                        cand[mm] = (mm, I, B)
                    if v not in mm and len(mm) < m_max:
                        nm = tuple(sorted(mm + (v,)))
                        if nm not in cand:
                            kin = len(set(mm) & adj[v])
                            cand[nm] = (nm, I + kin, B - kin + len(adj[v]) - kin)
            nxt[v] = sorted(cand.values(), key=lambda c: (-score(*c), c[0]))[:c_max]
        clusters = nxt
    out = {}
    for v in vs:
        own = [c for c in clusters[v] if v in c[0]]
        mm, I, B = own[0] if own else ((v,), 0, len(adj[v]))
        out[v] = (",".join(map(str, mm)), score(mm, I, B))
    return out


def test_semi_clustering_two_triangles(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import semi_clustering

    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    res, _ = semi_clustering(_edges_ds(pairs), iters=4, num_parts=3)
    df = res.to_pandas().sort_values("vid").reset_index(drop=True)
    assert list(df.cluster[:3]) == ["0,1,2"] * 3
    assert list(df.cluster[3:]) == ["3,4,5"] * 3
    # score of a triangle with one boundary edge: (3 − 0.1·1)/3
    assert np.allclose(df.score, (3 - 0.1) / 3)


@pytest.mark.parametrize("trial", range(3))
def test_semi_clustering_vs_scalar(ray_session, trial):
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import semi_clustering

    rng = np.random.default_rng(40 + trial)
    pairs = sorted(
        {
            (min(int(a), int(b)), max(int(a), int(b)))
            for a, b in rng.integers(0, 25, (45, 2))
            if a != b
        }
    )
    exp = _semi_cluster_reference(pairs, iters=3, c_max=2, m_max=4, f_b=0.1)
    for parts in (1, 4):
        res, _ = semi_clustering(_edges_ds(pairs), iters=3, num_parts=parts)
        df = res.to_pandas().sort_values("vid").reset_index(drop=True)
        for _, row in df.iterrows():
            mm, sc = exp[int(row.vid)]
            assert row.cluster == mm, (trial, parts, row.vid)
            assert row.score == round_half_away(np.array([sc]), 6)[0]


def test_label_mixing_matrix_properties(ray_session):
    """Matrix is symmetric (symmetrized edges), totals equal 2×|pairs|
    with both-endpoint labels, and entries match a pandas replay."""
    import duckdb

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        label_mixing_matrix,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        label_mixing_matrix(sf, mod=3)
        .to_pandas()
        .sort_values(["label_a", "label_b"])
        .reset_index(drop=True)
    )
    M = got.pivot(index="label_a", columns="label_b", values="n_edges").to_numpy()
    assert (M == M.T).all()
    exp = duckdb.sql(
        f"""WITH e AS (SELECT a.l_partkey s, b.l_partkey d
        FROM read_parquet('{sf}/lineitem.parquet') a
        JOIN read_parquet('{sf}/lineitem.parquet') b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey <> b.l_partkey GROUP BY 1, 2),
        l AS (SELECT p_partkey vid, p_size % 3 lbl
        FROM read_parquet('{sf}/part.parquet'))
        SELECT la.lbl, lb.lbl, count(*) FROM e
        JOIN l la ON la.vid = e.s JOIN l lb ON lb.vid = e.d
        GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    assert list(map(tuple, got.astype("int64").values)) == [tuple(map(int, r)) for r in exp]


def test_customer_rfm_vs_duckdb(ray_session):
    import duckdb

    from subgraph_isomorphism_pregel_ray.pipelines.relational import customer_rfm

    sf = "/root/testdata/sf0.001"
    got = customer_rfm(sf, k=5).to_pandas().sort_values("custkey").reset_index(drop=True)
    exp = duckdb.sql(
        f"""WITH agg AS (SELECT o_custkey custkey, max(o_orderdate) r, count(*) f,
        sum(CAST(round(o_totalprice*100) AS BIGINT)) m
        FROM read_parquet('{sf}/orders.parquet') GROUP BY 1)
        SELECT custkey, ntile(5) OVER (ORDER BY r DESC, custkey) r_tile,
        ntile(5) OVER (ORDER BY f DESC, custkey) f_tile,
        ntile(5) OVER (ORDER BY m DESC, custkey) m_tile FROM agg ORDER BY custkey"""
    ).df()
    for c in ["r_tile", "f_tile", "m_tile"]:
        assert (got[c].values == exp[c].astype("int64").values).all(), c
    assert (got.rfm == got.r_tile * 100 + got.f_tile * 10 + got.m_tile).all()
    # quintiles are balanced: tile sizes differ by at most 1
    for c in ["r_tile", "f_tile", "m_tile"]:
        sizes = got[c].value_counts()
        assert sizes.max() - sizes.min() <= 1


def _scalar_handshake(pairs):
    import collections

    from subgraph_isomorphism_pregel_ray.functions.hashing import md5_lower64

    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    prio = {
        (min(a, b), max(a, b)): int(
            md5_lower64(np.array([f"{min(a,b)}:{max(a,b)}"], dtype=object))[0]
        )
        for a, b in pairs
    }
    partner = {v: -1 for v in adj}
    live = set(pairs)
    while live:
        tgt = {}
        for v in {x for e in live for x in e}:
            c = [
                (prio[(min(v, u), max(v, u))], u)
                for u in adj[v]
                if (min(v, u), max(v, u)) in live
            ]
            if c:
                tgt[v] = min(c)[1]
        matched = {(v, u) for v, u in tgt.items() if tgt.get(u) == v and v < u}
        if not matched:
            break
        for v, u in matched:
            partner[v], partner[u] = u, v
        dead = {x for e in matched for x in e}
        live = {e for e in live if e[0] not in dead and e[1] not in dead}
    return partner


@pytest.mark.parametrize("trial", range(3))
def test_maximal_matching_vs_scalar(ray_session, trial):
    """Engine matching == the scalar handshake replay; output is a valid
    MAXIMAL matching (symmetric partners, no live edge left) at both
    partition counts."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import maximal_matching

    rng = np.random.default_rng(60 + trial)
    pairs = sorted(
        {
            (min(int(a), int(b)), max(int(a), int(b)))
            for a, b in rng.integers(0, 35, (70, 2))
            if a != b
        }
    )
    exp = _scalar_handshake(pairs)
    for parts in (1, 4):
        res, _ = maximal_matching(_edges_ds(pairs), num_parts=parts)
        df = res.to_pandas()
        got = dict(zip(df.vid.astype(int), df.partner.astype(int)))
        assert got == exp, (trial, parts)
        assert all(got[v] == -1 or got[got[v]] == v for v in got)
        assert all(got[a] != -1 or got[b] != -1 for a, b in pairs)  # maximal


def test_vertex_cover_covers_every_edge(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import vertex_cover

    rng = np.random.default_rng(77)
    pairs = sorted(
        {
            (min(int(a), int(b)), max(int(a), int(b)))
            for a, b in rng.integers(0, 30, (50, 2))
            if a != b
        }
    )
    res, _ = vertex_cover(_edges_ds(pairs), num_parts=3)
    df = res.to_pandas()
    cover = set(df[df.in_cover].vid.astype(int))
    assert all(a in cover or b in cover for a, b in pairs)  # covers every edge
    # 2-approx witness: cover size is even (matched endpoints come in pairs)
    assert len(cover) % 2 == 0


def test_butterfly_count_vs_brute(ray_session):
    """Σ C(shared,2) identity vs brute 4-cycle enumeration on a tiny
    synthetic bipartite graph (validated via the lineitem-shaped parquet)."""
    import itertools

    import duckdb

    from subgraph_isomorphism_pregel_ray.pipelines.relational import butterfly_count

    sf = "/root/testdata/sf0.001"
    got = int(butterfly_count(sf).to_pandas().n_butterflies[0])
    li = duckdb.sql(
        f"SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        f"FROM read_parquet('{sf}/lineitem.parquet')"
    ).df()
    parts_by_order = li.groupby("o")["p"].apply(set)
    from collections import Counter

    pair_orders: Counter = Counter()
    for ps in parts_by_order:
        for a, b in itertools.combinations(sorted(ps), 2):
            pair_orders[(a, b)] += 1
    exp = sum(w * (w - 1) // 2 for w in pair_orders.values())
    assert got == exp


def test_brand_elasticity_vs_numpy_polyfit(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        brand_discount_elasticity,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    got = brand_discount_elasticity(sf).to_pandas().set_index("brand")
    li = read_table(sf, "lineitem", columns=["l_partkey", "l_discount", "l_quantity"]).to_pandas()
    parts = read_table(sf, "part", columns=["p_partkey", "p_brand"]).to_pandas()
    df = li.merge(parts, left_on="l_partkey", right_on="p_partkey")
    for brand, grp in df.groupby("p_brand"):
        x = np.round(grp.l_discount.to_numpy() * 100)
        y = np.round(grp.l_quantity.to_numpy())
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got.loc[brand, "slope"] - slope) < 1e-6, brand
        assert abs(got.loc[brand, "intercept"] - intercept) < 1e-5, brand
        assert got.loc[brand, "n"] == len(grp)


def test_repeat_purchase_rate_vs_pandas(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        repeat_purchase_rate,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    got = repeat_purchase_rate(sf).to_pandas().set_index("part")
    li = read_table(sf, "lineitem", columns=["l_orderkey", "l_partkey"]).to_pandas()
    orders = read_table(sf, "orders", columns=["o_orderkey", "o_custkey"]).to_pandas()
    df = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    trip = df[["l_partkey", "o_custkey", "o_orderkey"]].drop_duplicates()
    per_pc = trip.groupby(["l_partkey", "o_custkey"]).size()
    for part, grp in per_pc.groupby(level=0):
        n_cust, n_rep = len(grp), int((grp >= 2).sum())
        assert got.loc[part, "n_cust"] == n_cust
        assert got.loc[part, "n_repeat"] == n_rep
        assert abs(got.loc[part, "repeat_rate"] - n_rep / n_cust) < 1e-6


def test_part_supplier_hhi_properties(ray_session, tmp_path):
    """Single-supplier part scores HHI exactly 1; an even 4-way split
    scores exactly 0.25; values equal the scalar share computation."""
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        part_supplier_hhi,
    )

    rows = []
    rows += [(1, 10, 100.0)] * 3               # part 1: single supplier
    rows += [(2, s, 50.0) for s in (20, 21, 22, 23)]  # part 2: even 4-way
    rows += [(3, 30, 90.0), (3, 31, 10.0)]     # part 3: 90/10 split
    tbl = pa.table(
        {
            "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "lineitem.parquet"))
    got = part_supplier_hhi(str(d)).to_pandas().set_index("part")
    assert got.loc[1, "hhi"] == 1.0 and got.loc[1, "n_suppliers"] == 1
    assert got.loc[2, "hhi"] == 0.25 and got.loc[2, "n_suppliers"] == 4
    assert got.loc[3, "hhi"] == 0.82  # 0.9² + 0.1², round-6
