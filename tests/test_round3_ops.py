"""Round-3 operator batch: edge_cut_parts, host_reciprocity,
session_depth_histogram, match_k4_labeled — scalar/golden checks
independent of the DuckDB oracle harness."""

import numpy as np
import pyarrow as pa
import pytest


def test_edge_cut_parts_golden(ray_session):
    """Tiny graph with hand-computed cuts: vids 0..5, P=2 and P=3."""
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        edge_cut_parts,
        edges_from_arrays,
    )

    # directed rows (already symmetrized by the caller in production; here
    # we audit the raw rows so the expectation is hand-checkable)
    src = [0, 1, 2, 3, 4, 5]
    dst = [1, 2, 3, 4, 5, 0]
    out = edge_cut_parts(edges_from_arrays(src, dst), parts=(2, 3)).to_pydict()
    # P=2: parts of src = [0,1,0,1,0,1]; every edge flips parity → all cut
    i = out["num_parts"].index(2)
    assert out["n_edges"][i] == 6
    assert out["n_cut"][i] == 6
    assert out["cut_fraction"][i] == 1.0
    assert out["max_part_edges"][i] == 3 and out["min_part_edges"][i] == 3
    assert out["imbalance"][i] == 1.0
    # P=3: src parts [0,1,2,0,1,2]; dst parts [1,2,0,1,2,0] → all cut,
    # loads 2/2/2
    j = out["num_parts"].index(3)
    assert out["n_cut"][j] == 6 and out["max_part_edges"][j] == 2


def test_edge_cut_parts_no_cut_when_p1_like(ray_session):
    """Edges inside one part (all vids ≡ 0 mod 4) are never cut at P=4."""
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        edge_cut_parts,
        edges_from_arrays,
    )

    out = edge_cut_parts(
        edges_from_arrays([0, 4, 8], [4, 8, 0]), parts=(4,)
    ).to_pydict()
    assert out["n_cut"] == [0]
    assert out["cut_fraction"] == [0.0]
    # all three edges land in part 0 → imbalance = max*P/total = 3*4/3
    assert out["imbalance"] == [4.0]


def test_host_reciprocity_synthetic(ray_session):
    """Hand-built pages: A→B and B→A (reciprocated), A→C (not)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.stages.extract import host_reciprocity

    def page(url, hrefs):
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return {
            "url": url,
            "warc_ts": np.datetime64("2024-01-01", "us"),
            "html": f"<html><body>{body}</body></html>".encode(),
            "text": "x",
            "lang": "en",
        }

    rows = [
        page("https://a.example/1", ["https://b.example/1", "https://c.example/1"]),
        page("https://b.example/1", ["https://a.example/1"]),
        page("https://c.example/1", []),
    ]
    out = host_reciprocity(rd.from_items(rows)).to_pydict()
    # directed pairs: a→b, a→c, b→a → 3; reciprocated: a→b & b→a → 2
    assert out["n_directed_pairs"] == [3]
    assert out["n_reciprocated"] == [2]
    assert out["reciprocity"] == [round(2 / 3, 6)]


def test_session_depth_histogram_sums_to_sessions(ray_session):
    """Depth histogram mass equals the session count and its depth-1 bin
    equals bounce_rate_daily's bounce total (same gap rule)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        bounce_rate_daily,
        events_sessionize,
        session_depth_histogram,
    )

    sf = "/root/testdata/sf0.001"
    hist = session_depth_histogram(sf).to_pydict()
    n_sessions = events_sessionize(sf).count()
    assert sum(hist["n_sessions"]) == n_sessions
    b = bounce_rate_daily(sf).to_pydict()
    depth1 = dict(zip(hist["n_events_in_session"], hist["n_sessions"])).get(1, 0)
    assert sum(b["n_bounces"]) == depth1
    # depths are positive and strictly increasing (sorted output)
    d = hist["n_events_in_session"]
    assert all(x >= 1 for x in d) and d == sorted(d)


def test_match_k4_vs_brute_force(ray_session):
    """K4 labeled count on a small random graph: engine vs itertools."""
    import itertools

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        edges_from_arrays,
        partition_graph,
        symmetrize,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.bsp import BSPEngine
    from subgraph_isomorphism_pregel_ray.pipelines.match import build_plan

    rng = np.random.default_rng(7)
    n = 24
    dense = rng.random((n, n)) < 0.35
    adj = np.triu(dense, 1)
    src, dst = np.nonzero(adj)
    labels = (np.arange(n) % 3).astype(np.int64)

    QL = [0, 1, 2, 0]
    QE = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    sym = adj | adj.T
    expected = 0
    for quad in itertools.permutations(range(n), 4):
        if [labels[v] for v in quad] != QL:
            continue
        if all(sym[quad[a]][quad[b]] for a, b in QE):
            expected += 1

    gdir = "/tmp/graft_test_k4_brute"
    import shutil

    shutil.rmtree(gdir, ignore_errors=True)
    lab_ds = rd.from_arrow(
        pa.table({"vid": np.arange(n, dtype=np.uint64), "label": labels})
    )
    partition_graph(
        symmetrize(edges_from_arrays(src, dst)), 2, gdir,
        labels_ds=lab_ds, directed=True,
    )
    eng = BSPEngine(gdir, 2)
    try:
        eng.run("match", {"plan": build_plan(QL, QE)}, max_steps=10)
        got = eng.scalar_results().get("embeddings", 0)
    finally:
        eng.shutdown()
    assert got == expected and expected > 0


def test_dsir_weights_scalar_replay(ray_session):
    """dsir_weights vs a pure-Python replay on a tiny bilingual corpus,
    plus the semantic sanity check: target-language docs score higher."""
    import math

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.hashing import md5_lower64
    from subgraph_isomorphism_pregel_ray.pipelines.textops import dsir_weights

    docs = [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "the dog sat on the rug"),
        (2, "de", "der hund sitzt auf dem teppich"),
        (3, "de", "die katze sitzt auf der matte"),
        (4, "en", "the cat and the dog"),
        (5, "de", ""),  # zero-feature doc → omitted
    ]
    ds = rd.from_items(
        [{"doc_id": i, "lang": l, "text": t} for i, l, t in docs]
    )
    B = 64
    got = dsir_weights(ds, target_lang="en", num_buckets=B).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    def feats(text):
        toks = [w for w in text.lower().split(" ") if w]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        # NB: % must happen in uint64 (uint64 % python-int promotes to
        # float64 in numpy and corrupts the low bits)
        return [int(md5_lower64([g])[0] % np.uint64(B)) for g in grams]

    from collections import Counter

    raw, tgt = Counter(), Counter()
    for _, lang, text in docs:
        f = feats(text)
        raw.update(f)
        if lang == "en":
            tgt.update(f)
    T, R = sum(tgt.values()), sum(raw.values())

    def wi(b):
        x = 1e6 * (
            math.log((tgt.get(b, 0) + 1) / (T + B))
            - math.log((raw.get(b, 0) + 1) / (R + B))
        )
        return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)

    expected = {}
    for i, lang, text in docs:
        f = feats(text)
        if f:
            expected[i] = (len(f), sum(wi(b) for b in f) / 1e6)

    assert list(got["doc_id"]) == sorted(expected)
    for _, row in got.iterrows():
        nf, lw = expected[row["doc_id"]]
        assert row["n_feats"] == nf
        assert row["dsir_logw"] == lw
    # target-likeness separation: mean en weight > mean de weight
    en = got[got["doc_id"].isin([0, 1, 4])]["dsir_logw"].mean()
    de = got[got["doc_id"].isin([2, 3])]["dsir_logw"].mean()
    assert en > de


def test_stratified_sample_properties(ray_session):
    """k per stratum, deterministic across runs, subset of the stratum."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import stratified_topk_sample

    rng = np.random.default_rng(3)
    langs = ["en", "de", "fr"]
    rows = [
        {"doc_id": int(i), "lang": langs[int(rng.integers(0, 3))]}
        for i in range(200)
    ]
    ds = rd.from_items(rows)
    a = stratified_topk_sample(ds, k=5).to_pandas().sort_values(["lang", "rn"])
    b = stratified_topk_sample(ds, k=5).to_pandas().sort_values(["lang", "rn"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert set(a["lang"]) == set(langs)
    assert (a.groupby("lang").size() == 5).all()
    assert (a.groupby("lang")["rn"].apply(lambda s: sorted(s) == [1, 2, 3, 4, 5])).all()
    by_lang = {l: {r["doc_id"] for r in rows if r["lang"] == l} for l in langs}
    for _, row in a.iterrows():
        assert row["doc_id"] in by_lang[row["lang"]]
    # a different salt draws a different sample (independence knob)
    c = stratified_topk_sample(ds, k=5, salt="other").to_pandas()
    assert set(map(tuple, c[["lang", "doc_id"]].values)) != set(
        map(tuple, a[["lang", "doc_id"]].values)
    )


def test_quality_mixture_report_mass_conservation(ray_session):
    """Decile cross-tab conserves doc and token mass and balances deciles."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        quality_mixture_report,
        unigram_quality,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    docs = read_table(sf, "documents", columns=["doc_id", "source", "text"])
    rep = quality_mixture_report(docs).to_pandas()
    q = unigram_quality(
        read_table(sf, "documents", columns=["doc_id", "text"])
    ).to_pandas()
    assert rep["n_docs"].sum() == len(q)
    assert rep["n_tokens"].sum() == q["n_tokens"].sum()
    # equal-rank cut: decile sizes differ by at most 1
    sizes = rep.groupby("decile")["n_docs"].sum()
    assert set(sizes.index) == set(range(10))
    assert sizes.max() - sizes.min() <= 1


def test_arrow_ipc_round_trip(ray_session, tmp_path):
    """write_arrow_ipc -> read_arrow_ipc preserves Arrow types exactly
    (timestamps, binary, floats) and column pruning works at the read."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.sources.tables import (
        read_arrow_ipc,
        write_arrow_ipc,
    )

    t = pa.table(
        {
            "i": pa.array([1, 2, 3], pa.int64()),
            "f": pa.array([1.5, float("nan"), -0.25], pa.float64()),
            "s": pa.array(["a", "b", ""], pa.string()),
            "bin": pa.array([b"\x00\x01", b"", b"xyz"], pa.binary()),
            "ts": pa.array(
                np.array(["2024-01-01T00:00:00", "2024-06-01T12:34:56",
                          "2025-01-01T01:02:03"], dtype="datetime64[us]")
            ),
        }
    )
    out = str(tmp_path / "ipc")
    write_arrow_ipc(rd.from_arrow(t), out)
    back = read_arrow_ipc(out).to_pandas().sort_values("i").reset_index(drop=True)
    orig = t.to_pandas().sort_values("i").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(back, orig)
    # pruned read returns only the requested columns
    pruned = read_arrow_ipc(out, columns=["i", "ts"]).to_pandas()
    assert list(pruned.columns) == ["i", "ts"]
    # shard naming is content-hashed → a rerun overwrites, not duplicates
    import os

    before = sorted(os.listdir(out))
    write_arrow_ipc(rd.from_arrow(t), out)
    assert sorted(os.listdir(out)) == before


def test_graph_summary_and_transitivity_golden(ray_session):
    """Hand-checked K4 ∪ P2: V=6, E=7, wedges, triangles, transitivity."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        graph_summary,
        transitivity,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        edges_from_arrays,
        symmetrize,
    )

    # K4 on {0,1,2,3} plus path 3-4-5
    src = [0, 0, 0, 1, 1, 2, 3, 4]
    dst = [1, 2, 3, 2, 3, 3, 4, 5]
    sym = symmetrize(edges_from_arrays(src, dst))
    gs = graph_summary(sym).to_pydict()
    assert gs["n_vertices"] == [6]
    assert gs["n_edges"] == [8]
    # degrees: 3,3,3,4,2,1 → sum 16, avg 16/6
    assert gs["avg_degree"] == [round(16 / 6, 6)]
    assert gs["max_degree"] == [4]
    assert gs["density"] == [round(16 / 30, 6)]
    tr = transitivity(sym, num_parts=2).to_pydict()
    # wedges: C(3,2)*3 + C(4,2) + C(2,2→1,2)=1 + 0 = 9+6+1 = 16
    assert tr["n_wedges"] == [16]
    assert tr["n_triangles"] == [4]  # the 4 triangles of K4
    assert tr["transitivity"] == [round(12 / 16, 6)]


def test_match_diamond_unlabeled_vs_brute_force(ray_session):
    """Wildcard-label (mod-1) diamond count on a random graph vs itertools
    — exercises the matcher's all-same-label path on a non-clique motif."""
    import itertools

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        edges_from_arrays,
        partition_graph,
        symmetrize,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.bsp import BSPEngine
    from subgraph_isomorphism_pregel_ray.pipelines.match import build_plan

    rng = np.random.default_rng(11)
    n = 20
    adj = np.triu(rng.random((n, n)) < 0.3, 1)
    src, dst = np.nonzero(adj)
    sym = adj | adj.T

    QL = [0, 0, 0, 0]
    QE = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]
    expected = 0
    for quad in itertools.permutations(range(n), 4):
        if all(sym[quad[a]][quad[b]] for a, b in QE):
            expected += 1

    gdir = "/tmp/graft_test_diamond_brute"
    import shutil

    shutil.rmtree(gdir, ignore_errors=True)
    lab_ds = rd.from_arrow(
        pa.table(
            {
                "vid": np.arange(n, dtype=np.uint64),
                "label": np.zeros(n, np.int64),
            }
        )
    )
    partition_graph(
        symmetrize(edges_from_arrays(src, dst)), 2, gdir,
        labels_ds=lab_ds, directed=True,
    )
    eng = BSPEngine(gdir, 2)
    try:
        eng.run("match", {"plan": build_plan(QL, QE)}, max_steps=10)
        got = eng.scalar_results().get("embeddings", 0)
    finally:
        eng.shutdown()
    assert got == expected and expected > 0


def test_lsh_bucket_histogram_mass(ray_session):
    """Every document lands in exactly `bands` buckets → entry mass =
    bands × n_docs; bucket count ≤ entries; size buckets are log2 bins."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import (
        lsh_bucket_histogram,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    docs = read_table(sf, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()
    h = lsh_bucket_histogram(docs, bands=16).to_pydict()
    assert sum(h["n_entries"]) == 16 * n_docs
    assert sum(h["n_buckets"]) <= sum(h["n_entries"])
    assert all(b >= 0 for b in h["size_bucket"])
    # singleton bin exists on any real corpus and dominates
    assert 0 in h["size_bucket"]


# ---------------------------------------------------------------------------
# embedding_moments / kmeans_assign / semantic_dedup / blocklist_stats
# ---------------------------------------------------------------------------


def _toy_embeddings(n=60, d=8, seed=7):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, d))
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    # plant near-duplicates: rows 50..54 are tiny perturbations of rows 0..4
    M[50:55] = M[0:5] + rng.normal(scale=1e-3, size=(5, d))
    M[50:55] /= np.linalg.norm(M[50:55], axis=1, keepdims=True)
    return M.astype(np.float32)


def _emb_ds(M):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(M), dtype=np.int64)),
                "embedding": pa.array(
                    [row.tolist() for row in M], pa.list_(pa.float32())
                ),
            }
        )
    )


def test_embedding_moments_matches_numpy(ray_session):
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        embedding_moments,
    )

    M = _toy_embeddings()
    out = embedding_moments(_emb_ds(M)).to_pydict()
    Md = M.astype(np.float64)
    mean = Md.sum(axis=0) / len(Md)
    var = (Md * Md).sum(axis=0) / len(Md) - mean * mean
    assert out["dim"] == list(range(M.shape[1]))
    assert out["n"] == [len(M)] * M.shape[1]
    np.testing.assert_allclose(out["mean"], round_half_away(mean, 6), atol=1e-12)
    np.testing.assert_allclose(out["var"], round_half_away(var, 6), atol=1e-12)


def test_kmeans_assign_partition_invariance(ray_session):
    """The census is a deterministic function of the set of rows — block
    layout must not change it (the exchange carries exact int64 partials)."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import kmeans_assign

    M = _toy_embeddings()
    a = kmeans_assign(_emb_ds(M), k=4).to_pydict()
    b = kmeans_assign(_emb_ds(M).repartition(7), k=4).to_pydict()
    assert a == b
    assert sum(a["n"]) == len(M)
    assert all(v >= 0 for v in a["inertia"])


def test_kmeans_assign_matches_brute_force(ray_session):
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import kmeans_assign

    M = _toy_embeddings()
    k, scale = 4, 10_000
    out = kmeans_assign(_emb_ds(M), k=k, scale=scale).to_pydict()
    Q = round_half_away(M.astype(np.float64) * scale, 0).astype(np.int64)
    C = Q[:k]  # vec_ids are 0..n-1, so seeds are the first k rows
    d2 = (
        (Q * Q).sum(axis=1)[:, None]
        - 2 * (Q @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    assign = d2.argmin(axis=1)
    best = d2[np.arange(len(Q)), assign]
    for i, c in enumerate(out["cluster"]):
        assert out["n"][i] == int((assign == c).sum())
        assert out["inertia"][i] == int(best[assign == c].sum())


def test_semantic_dedup_keep_rule_brute_force(ray_session):
    """Every planted near-duplicate of a lower-id row is dropped; verdicts
    equal the brute-force within-cluster keep-lowest-id rule."""
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import semantic_dedup

    M = _toy_embeddings()
    k, tau, scale = 4, 0.95, 10_000
    out = (
        semantic_dedup(_emb_ds(M), k=k, tau=tau, scale=scale)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(M)
    # brute force
    Q = round_half_away(M.astype(np.float64) * scale, 0).astype(np.int64)
    C = Q[:k]
    d2 = (
        (Q * Q).sum(axis=1)[:, None]
        - 2 * (Q @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )
    assign = d2.argmin(axis=1)
    Mn = M.astype(np.float64)
    Mn /= np.linalg.norm(Mn, axis=1, keepdims=True)
    cos6 = round_half_away(Mn @ Mn.T, 6)
    keep = np.ones(len(M), bool)
    for i in range(len(M)):
        for j in range(i):
            if assign[j] == assign[i] and cos6[i, j] >= tau:
                keep[i] = False
                break
    assert out["cluster"].tolist() == assign.tolist()
    assert out["keep"].tolist() == keep.tolist()
    # the planted dups 50..54 share a cluster with their source rows 0..4
    # (perturbation 1e-3 ≪ cluster radius) and must be dropped
    planted = out.set_index("vec_id").loc[50:54, "keep"]
    assert not planted.any()


def test_blocklist_stats_golden(ray_session):
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import blocklist_stats

    rows = [
        {"source": "a", "text": "clean text here"},
        {"source": "a", "text": "dup dup spam"},
        {"source": "a", "text": ""},
        {"source": "b", "text": "spam only"},
        {"source": "b", "text": "nothing bad"},
    ]
    out = blocklist_stats(rd.from_items(rows)).to_pydict()
    assert out["source"] == ["a", "b"]
    assert out["docs"] == [3, 2]
    assert out["flagged_docs"] == [1, 1]
    assert out["hits"] == [3, 1]
    assert out["flagged_rate"] == [
        pytest.approx(1 / 3, abs=1e-6),
        pytest.approx(0.5),
    ]


# ---------------------------------------------------------------------------
# densest_subgraph (Bahmani 2012 parallel peeling)
# ---------------------------------------------------------------------------


def _densest_brute(src, dst):
    """Sequential mirror of the ε=1/2 peel: per round compute alive-degrees,
    peel every v with 2·deg·V ≤ 3·ΣD."""
    E = list(zip(src, dst))
    alive = set(src) | set(dst)
    rnd, out = 0, {}
    while alive:
        deg = {v: 0 for v in alive}
        for a, b in E:
            if a in alive and b in alive:
                deg[a] += 1
        V, SD = len(alive), sum(deg.values())
        peel = {v for v in alive if 2 * deg[v] * V <= 3 * SD}
        for v in peel:
            out[v] = rnd
        alive -= peel
        rnd += 1
    return out


def test_densest_subgraph_vs_brute_force(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        densest_subgraph,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        edges_from_arrays,
    )

    rng = np.random.default_rng(11)
    # random sparse graph + a planted dense K8 core on vids 100..107
    n, m = 80, 160
    src = rng.integers(0, n, m).tolist()
    dst = rng.integers(0, n, m).tolist()
    pairs = sorted({(a, b) for a, b in zip(src, dst) if a != b})
    core = [(100 + i, 100 + j) for i in range(8) for j in range(i + 1, 8)]
    pairs += core
    s = [a for a, b in pairs] + [b for a, b in pairs]
    d = [b for a, b in pairs] + [a for a, b in pairs]
    exp = _densest_brute(s, d)
    for parts in (1, 3):
        out, _ = densest_subgraph(edges_from_arrays(s, d), num_parts=parts)
        got = dict(
            zip(out["vid"].to_pylist(), out["peel_round"].to_pylist())
        )
        assert {int(k): int(v) for k, v in got.items()} == exp
    # the planted clique outlives the sparse background
    bg_max = max(v for k, v in exp.items() if k < 100)
    core_min = min(v for k, v in exp.items() if k >= 100)
    assert core_min >= bg_max


def test_densest_subgraph_checkpoint_resume(ray_session, tmp_path):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        densest_subgraph,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        edges_from_arrays,
    )

    rng = np.random.default_rng(5)
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 40, 90), rng.integers(0, 40, 90))
            if a != b
        }
    )
    s = [a for a, b in pairs] + [b for a, b in pairs]
    d = [b for a, b in pairs] + [a for a, b in pairs]
    base, _ = densest_subgraph(edges_from_arrays(s, d), num_parts=2)
    ck = str(tmp_path / "ck")
    densest_subgraph(
        edges_from_arrays(s, d),
        num_parts=2,
        checkpoint_dir=ck,
        checkpoint_every=1,
    )
    resumed, _ = densest_subgraph(
        edges_from_arrays(s, d),
        num_parts=2,
        checkpoint_dir=ck,
        checkpoint_every=1,
        resume=True,
    )
    a = base.to_pandas().sort_values("vid").reset_index(drop=True)
    b = resumed.to_pandas().sort_values("vid").reset_index(drop=True)
    assert a.equals(b)


def test_minhash_calibration_identical_docs(ray_session):
    """Planted exact duplicates calibrate to est = exact = 1.0; near-misses
    land within the Broder σ = √(J(1−J)/128) ≈ 0.05 band (5σ guard)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import (
        minhash_calibration,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                      # exact dup
        {"doc_id": 3, "text": base + "and then some more words here"},
        {"doc_id": 4, "text": "completely different content entirely " * 8},
    ]
    out = (
        minhash_calibration(rd.from_items(rows))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    exact = out[(out.doc_a == 1) & (out.doc_b == 2)]
    assert len(exact) == 1
    assert exact.iloc[0]["est_jaccard"] == 1.0
    assert exact.iloc[0]["jaccard"] == 1.0
    # every candidate's estimate is within 5σ of its exact Jaccard
    j = out["jaccard"].to_numpy()
    sigma = np.sqrt(np.maximum(j * (1 - j), 1e-12) / 128)
    assert (np.abs(out["est_jaccard"].to_numpy() - j) <= 5 * sigma + 1e-9).all()


def test_rake_keywords_golden(ray_session):
    """Hand-computed RAKE on the canonical toy: phrases split at the shared
    stopword list, word score = deg/freq, phrase score = Σ word scores."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import rake_keywords

    rows = [
        {"doc_id": 1, "text": "deep learning of neural networks"},
        {"doc_id": 2, "text": "deep learning and gradient descent"},
    ]
    out = rake_keywords(rd.from_items(rows), top_k=10).to_pydict()
    # phrases: "deep learning"×2, "neural networks", "gradient descent"
    # freq: deep 2, learning 2, neural 1, networks 1, gradient 1, descent 1
    # deg:  deep 4, learning 4, others 2 → scores 2.0 each
    # phrase scores: deep learning 4.0, neural networks 4.0,
    #                gradient descent 4.0 → tie broken by phrase asc
    assert out["phrase"] == [
        "deep learning",
        "gradient descent",
        "neural networks",
    ]
    assert out["n_occurrences"] == [2, 1, 1]
    assert out["score"] == [4.0, 4.0, 4.0]


def test_degree_discount_vs_brute_force(ray_session):
    """Greedy picks, order and exact dd·100 scores equal the sequential
    reference at two partition counts."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        degree_discount_seeds,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        edges_from_arrays,
    )

    rng = np.random.default_rng(17)
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 50, 200), rng.integers(0, 50, 200))
            if a != b
        }
    )
    s = [a for a, b in pairs] + [b for a, b in pairs]
    d = [b for a, b in pairs] + [a for a, b in pairs]
    adj: dict = {}
    for a, b in zip(s, d):
        adj.setdefault(a, set()).add(b)
    deg = {v: len(ns) for v, ns in adj.items()}
    t = {v: 0 for v in deg}
    exp = []
    for _ in range(7):
        chosen = {v for v, _ in exp}
        best = max(
            ((100 * deg[v] - 200 * t[v] - (deg[v] - t[v]) * t[v], -v)
             for v in deg if v not in chosen)
        )
        v = -best[1]
        exp.append((v, best[0]))
        for nb in adj[v]:
            t[nb] += 1
    for parts in (1, 4):
        out, _ = degree_discount_seeds(
            edges_from_arrays(s, d), k=7, num_parts=parts
        )
        got = list(zip(out["vid"].to_pylist(), out["dd100"].to_pylist()))
        assert got == exp
        assert out["rank"].to_pylist() == list(range(7))


def test_ivf_recall_full_probe_is_exact(ray_session, tmp_path):
    """recall@k audit invariants: nprobe = n_cells degrades to the exact
    scan (recall 1.0), and the default-probe recall is within [0, 1] with
    the corpus row summing the per-query hits."""
    import __ray_entry__ as entry

    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        ann_topk,
        ann_topk_ivf,
    )

    SF = "/root/testdata/sf0.001"
    exact = ann_topk(entry._emb(SF), [0, 1, 2, 3], k=5).to_pandas()
    full = ann_topk_ivf(
        entry._emb(SF), [0, 1, 2, 3], k=5, n_cells=8, nprobe=8,
        index_dir=str(tmp_path / "ivf_full"),
    ).to_pandas()
    for qid in (0, 1, 2, 3):
        e = set(exact.loc[exact.query_id == qid, "vec_id"])
        g = set(full.loc[full.query_id == qid, "vec_id"])
        assert e == g
    audit = entry.queries()["ivf_recall"](SF).to_pandas()
    per_q = audit[audit.query_id >= 0]
    corpus = audit[audit.query_id == -1].iloc[0]
    assert corpus["hits"] == per_q["hits"].sum()
    assert corpus["k"] == per_q["k"].sum()
    assert ((per_q["recall"] >= 0) & (per_q["recall"] <= 1)).all()


def test_kmv_overlap_daily_paths(ray_session):
    """sf0.001 days have <64 users → the sketch is exact (est == exact);
    the estimator columns always stay within the KMV relative-error
    envelope (~1/√k with generous 6σ-ish margin) of the exact values."""
    import __ray_entry__ as entry

    out1 = entry.queries()["kmv_overlap_daily"]("/root/testdata/sf0.001").to_pandas()
    assert len(out1) == 29
    assert (out1["est_union"] == out1["exact_union"]).all()
    assert (out1["est_inter"] == out1["exact_inter"]).all()

    out2 = entry.queries()["kmv_overlap_daily"]("/root/testdata/sf0.01").to_pandas()
    rel = np.abs(out2["est_union"] - out2["exact_union"]) / out2["exact_union"]
    assert (rel < 6 / np.sqrt(64)).all()  # ~0.75 cap, observed ~0.05
    ri = np.abs(out2["est_inter"] - out2["exact_inter"]) / np.maximum(
        out2["exact_inter"], 1
    )
    assert (ri < 6 / np.sqrt(64)).all()


def test_lsh_recall_invariants(ray_session):
    """Precision is 1.0 by construction (LSH pairs are exact-verified
    subsets of the ground truth); planted exact duplicates are found by
    both pipelines."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import lsh_recall

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},
        {"doc_id": 3, "text": base[: len(base) // 2] + "totally different tail " * 4},
        {"doc_id": 4, "text": "unrelated content entirely " * 10},
    ]
    out = lsh_recall(rd.from_items(rows)).to_pandas().iloc[0]
    assert out["precision"] == 1.0
    assert out["n_hit"] <= min(out["n_exact"], out["n_lsh"])
    assert out["n_exact"] >= 1  # the planted exact dup
    assert out["n_hit"] >= 1


def test_revenue_jackknife_equals_classic_sem(ray_session):
    """For the mean, the jackknife SE equals the classic s/√n (ddof=1) —
    verify the integer-moment formula against numpy on real data."""
    import duckdb

    import __ray_entry__ as entry

    SF = "/root/testdata/sf0.001"
    out = entry.queries()["revenue_jackknife"](SF).to_pandas().iloc[0]
    daily = duckdb.sql(
        "SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
        f"FROM '{SF}/orders.parquet' GROUP BY epoch_us(o_orderdate) // 86400000000"
    ).df()["cents"].to_numpy().astype(np.float64)
    sem = daily.std(ddof=1) / np.sqrt(len(daily))
    assert out["n_days"] == len(daily)
    assert abs(out["jk_se_cents"] - sem) / sem < 1e-9


def test_update_graph_incremental_equals_full_rebuild(ray_session, tmp_path):
    """Split a graph's edges in half; partition_graph(half1) +
    update_graph(half2) must produce the same PageRank as
    partition_graph(all). A re-applied (duplicate) delta is idempotent."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import pagerank
    from subgraph_isomorphism_pregel_ray.pipelines.bsp import BSPEngine
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        edges_from_arrays,
        partition_graph,
        update_graph,
    )

    rng = np.random.default_rng(23)
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 60, 250), rng.integers(0, 60, 250))
            if a != b
        }
    )
    half = len(pairs) // 2
    p1, p2 = pairs[:half], pairs[half:]

    def _sym(ps):
        s = [a for a, b in ps] + [b for a, b in ps]
        d = [b for a, b in ps] + [a for a, b in ps]
        return edges_from_arrays(s, d)

    full_dir = str(tmp_path / "full")
    inc_dir = str(tmp_path / "inc")
    partition_graph(_sym(pairs), 3, full_dir)
    partition_graph(_sym(p1), 3, inc_dir)
    update_graph(_sym(p2), inc_dir)

    def _pr(gdir):
        eng = BSPEngine(gdir, 3)
        res, _ = pagerank(eng, iters=10, num_parts=3)
        eng.shutdown()
        return (
            res.to_pandas().sort_values("vid").reset_index(drop=True)
        )

    a, b = _pr(full_dir), _pr(inc_dir)
    assert a.equals(b)
    # idempotency: re-applying the same delta changes nothing
    update_graph(_sym(p2), inc_dir)
    c = _pr(inc_dir)
    assert a.equals(c)
    import json as _json

    man = _json.load(open(str(tmp_path / "inc" / "manifest.json")))
    assert man["updates"] == 2


def _kruskal(pairs, w):
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    mst = []
    for ww, u, v in sorted(zip(w, [a for a, b in pairs], [b for a, b in pairs])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            mst.append((u, v, ww))
    return sorted(mst)


def test_boruvka_mst_vs_kruskal(ray_session):
    """Borůvka under the (w,u,v) total order equals Kruskal under the same
    order — including on a disconnected graph (spanning FOREST) and with
    heavy weight ties."""
    import pyarrow as pa
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import boruvka_mst

    rng = np.random.default_rng(41)
    # two disjoint blobs: vids 0..29 and 100..129, tie-heavy weights (1..4)
    def blob(lo, n, m):
        return sorted(
            {
                (int(a), int(b))
                for a, b in zip(
                    rng.integers(lo, lo + n, m), rng.integers(lo, lo + n, m)
                )
                if a < b
            }
        )

    pairs = blob(0, 30, 120) + blob(100, 30, 120)
    w = rng.integers(1, 5, len(pairs)).tolist()
    wedges = rd.from_arrow(
        pa.table(
            {
                "src": np.array([a for a, b in pairs], np.int64),
                "dst": np.array([b for a, b in pairs], np.int64),
                "w": np.array(w, np.int64),
            }
        )
    )
    out = sorted(
        zip(*(boruvka_mst(wedges).to_pandas()[c] for c in ("src", "dst", "w")))
    )
    exp = _kruskal(pairs, w)
    assert [(int(a), int(b), int(c)) for a, b, c in out] == exp
    # forest: |MST| = V - #components
    vids = {x for p in pairs for x in p}
    assert len(out) == len(vids) - 2


def test_degree_powerlaw_mle_synthetic(ray_session):
    """On a hand-built degree multiset the MLE equals the closed form
    1 + n/Σln(d/(xmin−0.5)); sub-xmin degrees are excluded."""
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        degree_powerlaw_mle,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        edges_from_arrays,
    )

    # star-ish graph: vertex 0 has degree 12, vertices 1..12 degree 1 each,
    # plus a K6 on 20..25 (degrees 5)
    s, d = [], []
    for i in range(1, 13):
        s += [0, i]
        d += [i, 0]
    for i in range(20, 26):
        for j in range(20, 26):
            if i != j:
                s.append(i)
                d.append(j)
    out = degree_powerlaw_mle(edges_from_arrays(s, d), xmin=5).to_pydict()
    degs = np.array([12] + [5] * 6, dtype=np.float64)  # tail d >= 5
    alpha = 1.0 + len(degs) / np.log(degs / 4.5).sum()
    assert out["n_tail"] == [7]
    assert out["alpha"] == [float(round_half_away(alpha, 6))]


def test_embedding_outliers_planted(ray_session):
    """A vector scaled 10× off the unit shell dominates the diagonal
    Mahalanobis ranking; ordering is (d2 desc, vec_id) and stable across
    block layouts."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        embedding_outliers,
    )

    M = _toy_embeddings()
    M[7] = M[7] * 10.0  # planted outlier
    out = embedding_outliers(_emb_ds(M), top_k=5).to_pydict()
    assert out["vec_id"][0] == 7
    assert out["d2"] == sorted(out["d2"], reverse=True)
    out2 = embedding_outliers(_emb_ds(M).repartition(6), top_k=5).to_pydict()
    assert out == out2


def test_doclen_mannwhitney_golden(ray_session):
    """Hand-computed U on a tiny tie-bearing sample: A = [1,3,3], B = [2,3]
    → midranks 1, 2, 4, 4, 4; R_A = 9, U_A = R_A − n_A(n_A+1)/2 = 3."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        doclen_mannwhitney,
    )

    rows = [
        {"source": "src0", "n_chars": 1},
        {"source": "src0", "n_chars": 3},
        {"source": "src0", "n_chars": 3},
        {"source": "src1", "n_chars": 2},
        {"source": "src1", "n_chars": 3},
        {"source": "ignored", "n_chars": 999},
    ]
    out = doclen_mannwhitney(rd.from_items(rows)).to_pydict()
    assert out["n_a"] == [3] and out["n_b"] == [2]
    assert out["u2"] == [6]  # 2·U_A: 2·9 − 3·4 = 6


def test_adamic_adar_toy_and_kanonymity_golden(ray_session):
    """AA brute-force on the strong graph at sf0.001 (small enough to
    enumerate); k-anonymity golden on a synthetic frame via the oracle's
    semantics."""
    import duckdb

    import __ray_entry__ as entry

    SF = "/root/testdata/sf0.001"
    out = entry.queries()["adamic_adar_copurchase"](SF).to_pandas()
    # brute force from the strong edge set
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{SF}/part.parquet'")
    eu = con.sql(entry.oracle_sql()["adamic_adar_copurchase"]).df()
    m = out.sort_values(["src", "dst"]).reset_index(drop=True)
    e = eu.sort_values(["src", "dst"]).reset_index(drop=True)
    assert len(m) == len(e)
    assert np.allclose(m["aa"], e["aa"], atol=1e-9)
    assert (m["aa"] >= 0).all() and m["aa"].max() > 0

    k = entry.queries()["kanonymity_customers"](SF).to_pydict()
    assert k["n_rows"][0] > 0
    assert k["n_exposed_rows"][0] <= k["n_rows"][0]
    assert k["n_violating_groups"][0] <= k["n_groups"][0]
    # sf0.001 has 150 customers over up to 125 QI cells → violations exist
    assert k["n_violating_groups"][0] > 0


def test_kcenter_coreset_brute_force(ray_session):
    """Greedy farthest-point picks equal the sequential reference; d2 is
    non-increasing (Gonzalez's max-min radius monotonicity) and layout-
    invariant."""
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        kcenter_coreset,
    )

    M = _toy_embeddings()
    k, scale = 5, 10_000
    out = kcenter_coreset(_emb_ds(M), k=k, scale=scale).to_pydict()
    Q = round_half_away(M.astype(np.float64) * scale, 0).astype(np.int64)
    sel = [0]
    exp = [(0, 0, 0)]
    for r in range(1, k):
        C = Q[sel]
        d2 = (
            (Q * Q).sum(axis=1)[:, None]
            - 2 * (Q @ C.T)
            + (C * C).sum(axis=1)[None, :]
        ).min(axis=1)
        i = int(np.lexsort((np.arange(len(Q)), -d2))[0])
        sel.append(i)
        exp.append((r, i, int(d2[i])))
    assert list(zip(out["rank"], out["vec_id"], out["d2"])) == exp
    assert out["d2"][1:] == sorted(out["d2"][1:], reverse=True)
    out2 = kcenter_coreset(_emb_ds(M).repartition(7), k=k, scale=scale).to_pydict()
    assert out == out2


def test_rapid_repeat_orders_golden(ray_session, tmp_path):
    """Synthetic orders: pairs within the window (any price) are emitted
    with exact cent deltas; cross-customer and out-of-window pairs are
    not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        rapid_repeat_orders,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_custkey": pa.array([10, 10, 10, 20, 20], pa.int64()),
            "o_totalprice": pa.array([100.00, 100.50, 90.00, 55.0, 55.0]),
            "o_orderdate": pa.array(
                np.array(
                    ["2024-01-01", "2024-01-03", "2024-02-01",
                     "2024-01-01", "2024-01-20"],
                    dtype="datetime64[us]",
                )
            ),
        }
    )
    pq.write_table(t, str(sf / "orders.parquet"))
    out = (
        rapid_repeat_orders(str(sf))
        .to_pandas()
        .sort_values(["o1", "o2"])
        .reset_index(drop=True)
    )
    # only (1,2): same cust, 2 days apart, 50 cents delta; (1,3)/(2,3) are
    # out of window; cust 20's orders are 19 days apart
    assert out.to_dict("records") == [
        {"o1": 1, "o2": 2, "custkey": 10, "day_gap": 2, "cents_diff": 50}
    ]


def test_profile_and_fd_audit_invariants(ray_session):
    """Profiler: key column has n_distinct == n_rows; date range sane.
    FD audit: the key FD holds, the known-violated ones do not, and
    n_violating ≤ n_lhs."""
    import __ray_entry__ as entry

    SF = "/root/testdata/sf0.001"
    p = entry.queries()["orders_profile"](SF).to_pandas().set_index("col")
    assert p.loc["o_orderkey", "n_distinct"] == p.loc["o_orderkey", "n_rows"]
    assert p.loc["o_orderdate", "min_val"] <= p.loc["o_orderdate", "max_val"]
    assert (p["n_distinct"] <= p["n_rows"]).all()

    fd = entry.queries()["fd_audit"](SF).to_pandas().set_index("fd")
    assert bool(fd.loc["c_custkey->c_nationkey", "holds"])
    assert not bool(fd.loc["o_custkey->o_orderpriority", "holds"])
    assert (fd["n_violating"] <= fd["n_lhs"]).all()


def test_ucc_audit_invariants(ray_session):
    import __ray_entry__ as entry

    out = (
        entry.queries()["ucc_audit"]("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("combo")
    )
    assert (out["n_distinct"] <= out["n_rows"]).all()
    # a superset combo is at least as distinct as its subset
    assert (
        out.loc["o_custkey,o_orderdate", "n_distinct"]
        >= out.loc["o_custkey", "n_distinct"]
    )
    assert out["is_unique"].equals(out["n_distinct"] == out["n_rows"])


def test_edge_backbone_invariants(ray_session):
    """Union-of-top-k semantics: ≤ k·V edges survive, every vertex with
    any edge keeps ≥1 incident edge, n_directions ∈ {1,2}, and the kept
    set is a subset of the full weighted edge set."""
    import duckdb

    import __ray_entry__ as entry

    SF = "/root/testdata/sf0.001"
    out = entry.queries()["edge_backbone"](SF).to_pandas()
    full = duckdb.sql(
        "SELECT a.l_partkey AS src, b.l_partkey AS dst "
        f"FROM '{SF}/lineitem.parquet' a JOIN '{SF}/lineitem.parquet' b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2"
    ).df()
    verts = set(full["src"]) | set(full["dst"])
    assert len(out) <= 5 * len(verts)
    assert set(out["n_directions"].unique()) <= {1, 2}
    kept_pairs = set(zip(out["src"], out["dst"]))
    full_pairs = set(zip(full["src"], full["dst"]))
    assert kept_pairs <= full_pairs
    covered = set(out["src"]) | set(out["dst"])
    assert covered == verts  # union semantics orphan nobody


def test_disparity_filter_invariants(ray_session):
    """p ∈ [0,1]; keep ⟺ rounded p_min < α; a hub-concentrated edge is
    significant while uniform edges are not (checked via the known
    deterministic keep count at sf0.001)."""
    import __ray_entry__ as entry

    out = entry.queries()["disparity_filter"]("/root/testdata/sf0.001").to_pandas()
    assert ((out["p_min"] >= 0) & (out["p_min"] <= 1)).all()
    assert out["keep"].equals(out["p_min"] < 0.05)
    assert 0 < out["keep"].sum() < len(out)


def test_dow_seasonal_index_invariants(ray_session):
    """7 weekday rows, indices average ≈ 1 (ratio-to-MA property), and a
    planted strong weekday shows the largest index."""
    import __ray_entry__ as entry

    out = entry.queries()["dow_seasonal_index"]("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 7
    assert abs(out["seasonal_index"].mean() - 1.0) < 0.1
    assert (out["n_days"] >= 1).all()


def test_source_centroid_shift_invariants(ray_session):
    """Every source present, n_docs sums to the embedding count, shifts
    are positive and bounded by 2 (unit-norm vectors)."""
    import __ray_entry__ as entry

    out = entry.queries()["source_centroid_shift"]("/root/testdata/sf0.001").to_pandas()
    assert out["n_docs"].sum() == 500
    assert len(out) == 20
    assert ((out["centroid_shift"] > 0) & (out["centroid_shift"] < 2)).all()


def test_knn_source_purity_baseline(ray_session):
    """With 20 source-agnostic synthetic embeddings the purity sits at the
    1/|sources| random baseline; coverage and bounds hold."""
    import __ray_entry__ as entry

    out = entry.queries()["knn_source_purity"]("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 20
    assert out["n_vecs"].sum() == 500
    assert ((out["purity"] >= 0) & (out["purity"] <= 1)).all()
    assert abs(out["purity"].mean() - 0.05) < 0.04  # ≈ 1/20 baseline


def test_quality_geometry_corr_bounds(ray_session):
    import __ray_entry__ as entry

    out = entry.queries()["quality_geometry_corr"]("/root/testdata/sf0.001").to_pandas()
    assert out["n"][0] == 500
    assert -1.0 <= out["r"][0] <= 1.0
    # synthetic embeddings are independent of text → near-zero correlation
    assert abs(out["r"][0]) < 0.2


def test_granger_daily_vs_numpy_ols(ray_session):
    """F statistic equals the numpy-lstsq restricted/full RSS computation
    on the same dense day series."""
    import duckdb

    import __ray_entry__ as entry

    SF = "/root/testdata/sf0.001"
    out = entry.queries()["granger_daily"](SF).to_pandas().set_index("direction")
    d = duckdb.sql(
        "SELECT epoch_us(ts) // 86400000000 AS day, "
        "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x, "
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y "
        f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    lo, hi = int(d.day.min()), int(d.day.max())
    dx = np.zeros(hi - lo + 1)
    dy = np.zeros(hi - lo + 1)
    dx[d.day.to_numpy() - lo] = d.x.to_numpy()
    dy[d.day.to_numpy() - lo] = d.y.to_numpy()

    def f_ols(y, x):
        yt, y1, x1 = y[1:], y[:-1], x[:-1]
        n = len(yt)
        Ar = np.column_stack([np.ones(n), y1])
        Af = np.column_stack([np.ones(n), y1, x1])
        rr = yt - Ar @ np.linalg.lstsq(Ar, yt, rcond=None)[0]
        rf = yt - Af @ np.linalg.lstsq(Af, yt, rcond=None)[0]
        rss_r, rss_f = (rr * rr).sum(), (rf * rf).sum()
        return (rss_r - rss_f) / (rss_f / (n - 3))

    assert abs(out.loc["view->purchase", "f_stat"] - f_ols(dy, dx)) < 1e-4
    assert abs(out.loc["purchase->view", "f_stat"] - f_ols(dx, dy)) < 1e-4


def test_markov_attribution_invariants(ray_session):
    import __ray_entry__ as entry

    out = entry.queries()["markov_attribution"]("/root/testdata/sf0.001").to_pandas()
    assert list(out["channel"]) == ["FULL", "click", "error", "signup", "view"]
    assert ((out["p_conv"] >= 0) & (out["p_conv"] <= 1)).all()
    full = out[out.channel == "FULL"].iloc[0]
    assert full["removal_effect"] == 0.0
    ch = out[out.channel != "FULL"]
    # removing a channel can only lower reachability of conversion
    assert (ch["p_conv"] <= full["p_conv"] + 1e-9).all()
    assert ((ch["removal_effect"] >= 0) & (ch["removal_effect"] <= 1)).all()


def test_shapley_attribution_efficiency(ray_session):
    """Shapley efficiency: Σφ_c = v(all channels) − v(∅) — the channel-
    attributable conversion share — verified against direct coalition
    values from SQL."""
    import duckdb

    import __ray_entry__ as entry

    SF = "/root/testdata/sf0.001"
    out = entry.queries()["shapley_attribution"](SF).to_pandas()
    assert (out["shapley"] >= -1e-9).all()
    # direct v(C) − v(∅): all-converting share minus no-channel share
    d = duckdb.sql(
        "WITH e AS (SELECT user_id, event_type, row_number() OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS rn "
        f"FROM '{SF}/events.parquet'), "
        "cut AS (SELECT user_id, min(rn) AS prn FROM e "
        "WHERE event_type = 'purchase' GROUP BY 1), "
        "seq AS (SELECT e.user_id, CASE WHEN e.event_type = 'purchase' "
        "THEN 'conv' ELSE e.event_type END AS st FROM e "
        "LEFT JOIN cut USING (user_id) "
        "WHERE e.rn <= coalesce(cut.prn, 2147483647)), "
        "jm AS (SELECT user_id, count(DISTINCT CASE WHEN st <> 'conv' "
        "THEN st END) AS nch, max(CASE WHEN st = 'conv' THEN 1 ELSE 0 END) "
        "AS conv FROM seq GROUP BY 1) "
        "SELECT sum(conv) * 1.0 / count(*) AS v_full, "
        "sum(CASE WHEN nch = 0 THEN conv ELSE 0 END) * 1.0 / count(*) "
        "AS v_empty FROM jm"
    ).df().iloc[0]
    assert abs(out["shapley"].sum() - (d["v_full"] - d["v_empty"])) < 1e-4
