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
