"""User-facing graph algorithm entry points over the BSP engine.

Each takes an edge Dataset (or a pre-built ``graph_dir``), partitions it
(``build_graph.partition_graph``), runs the program on a pool of partition
actors, and returns per-vertex results as a Dataset / Arrow table plus the
run's lineage. The algorithms and their convergence/tie-break semantics match
the single-process oracles in ``tests/`` (FIXTURES.md F4).

``pagerank_dataset`` additionally provides the *pure Dataset* path — message
exchange expressed as ``groupby().aggregate()`` shuffles with no actors —
both as the SURVEY §4.3 alternative and as the shape the driver's DuckDB
oracle can replay. It streams: per iteration one map_batches (scatter with
in-batch pre-aggregation) + one groupby (combine) + one broadcast-free join
back via a second groupby over the union. The actor path is the scale path
(CSR built once, per-step cost ∝ frontier).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from ..functions.rounding import round_half_away
import pyarrow as pa

from .bsp import BSPEngine
from .build_graph import partition_graph


def _check_pack_width(vids: np.ndarray, shift: np.int64, op: str) -> None:
    """Loud guard for the 'vids < 2^21' packed-pair-key convention.

    ``left * shift + right`` silently merges unrelated pairs when an id
    reaches ``shift``; raise instead (ADVICE r3 — mirror boruvka_mst's
    refusal to assume a vid width)."""
    if len(vids) and int(vids.max()) >= int(shift):
        raise ValueError(
            f"{op}: vertex id >= 2^{int(shift).bit_length() - 1} would "
            "collide in the packed pair key; re-map ids or widen the shift"
        )

__all__ = [
    "graph_summary",
    "transitivity",
    "build_engine",
    "pagerank",
    "connected_components",
    "sssp",
    "mis",
    "label_propagation",
    "seeded_labels",
    "triangle_count",
    "kcore",
    "densest_subgraph",
    "degree_discount_seeds",
    "pagerank_dataset",
    "cc_dataset",
    "neighbor_sample",
    "hyperball",
    "ktruss",
    "betweenness",
    "closeness",
    "weighted_sssp",
    "greedy_coloring",
    "eccentricity",
    "lpa_modularity",
    "katz",
    "link_prediction",
    "max_spanning_forest",
    "scc",
    "bowtie",
    "weighted_pagerank",
    "weighted_sssp_stored",
    "spam_mass",
    "bipartite_check",
    "semi_clustering",
    "maximal_matching",
    "vertex_cover",
    "component_size_histogram",
]


def build_engine(
    edges_ds=None,
    num_parts: int = 8,
    graph_dir: str | None = None,
    labels_ds=None,
    directed: bool = True,
) -> BSPEngine:
    if graph_dir is None:
        graph_dir = tempfile.mkdtemp(prefix="graph_", dir="/tmp")
    if edges_ds is not None:
        partition_graph(edges_ds, num_parts, graph_dir, labels_ds=labels_ds, directed=directed)
    return BSPEngine(graph_dir, num_parts)


def _run(engine_or_edges, program, params, num_parts, max_steps, directed=True,
         labels_ds=None, checkpoint_dir=None, checkpoint_every=0, resume=False):
    own = not isinstance(engine_or_edges, BSPEngine)
    eng = (
        build_engine(engine_or_edges, num_parts, labels_ds=labels_ds, directed=directed)
        if own
        else engine_or_edges
    )
    lineage = eng.run(
        program,
        params,
        max_steps=max_steps,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
    return eng, lineage, own


def pagerank(
    edges_or_engine,
    iters: int = 20,
    damping: float = 0.85,
    num_parts: int = 8,
    tol: float = 0.0,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
):
    """Directed PageRank with dangling redistribution → (result table, lineage)."""
    eng, lineage, own = _run(
        edges_or_engine,
        "pagerank",
        {"iters": iters, "damping": damping, "tol": tol, "n_global": None},
        num_parts,
        max_steps=iters + 1,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def _weight_symmetrize(edges_ds):
    """(src, dst, weight) Dataset with ONE row per undirected pair → both
    directions, weight duplicated (build_csr's keep-first dedup then leaves
    one row per directed edge with its stored weight)."""

    def _wsym(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.uint64)
        d = t["dst"].to_numpy().astype(np.uint64)
        w = t["weight"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "src": np.concatenate([s, d]),
                "dst": np.concatenate([d, s]),
                "weight": np.concatenate([w, w]),
            }
        )

    return edges_ds.map_batches(_wsym, batch_format="pyarrow")


def weighted_sssp_stored(edges_or_engine, seed_mod: int = 101,
                         num_parts: int = 8, max_steps: int = 300,
                         checkpoint_dir=None, checkpoint_every=0,
                         resume=False):
    """Multi-source weighted shortest paths over STORED per-edge weights —
    a (src, dst, weight) Dataset (one row per undirected pair, e.g.
    copurchase_weights) → (vid, wdist); wdist = min-plus distance to the
    nearest seed (vid % seed_mod == 0), -1 unreachable. The data-weighted
    Bellman-Ford (StoredWeightSSSPProgram) through the CSR weight channel."""
    if not isinstance(edges_or_engine, BSPEngine):
        edges_or_engine = _weight_symmetrize(edges_or_engine)
    eng, lineage, own = _run(
        edges_or_engine, "wsssp_stored", {"seed_mod": seed_mod}, num_parts,
        max_steps, directed=True, checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every, resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def weighted_pagerank(
    edges_or_engine,
    iters: int = 20,
    damping: float = 0.85,
    num_parts: int = 8,
    tol: float = 0.0,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
):
    """Edge-WEIGHTED PageRank over a (src, dst, weight) edge Dataset with
    ONE row per undirected pair — weight-symmetrized here, weights stored
    in the partition layout's `weight` column (``CSRPartition.eweights``).
    → (result table (vid, rank), lineage). See WeightedPageRankProgram."""
    if not isinstance(edges_or_engine, BSPEngine):
        edges_or_engine = _weight_symmetrize(edges_or_engine)
    eng, lineage, own = _run(
        edges_or_engine,
        "wpagerank",
        {"iters": iters, "damping": damping, "tol": tol, "n_global": None},
        num_parts,
        max_steps=iters + 1,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def connected_components(edges_or_engine, num_parts: int = 8, max_steps: int = 200,
                         checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Hash-min components over the symmetrized edge set → (vid, component)."""
    eng, lineage, own = _run(
        edges_or_engine, "cc", {}, num_parts, max_steps, directed=False,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every, resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def connected_components_ds(edges_or_engine, num_parts: int = 8,
                            max_steps: int = 200):
    """Hash-min components as a streaming Dataset(vid, component): result
    blocks flow actor → object store → downstream consumers via
    ``from_arrow_refs`` (the bsp ``result_dataset`` path) — the component
    table never lands on the driver, so a 100 TB-scale dup graph's
    |dup-docs|-row result is bounded by object-store RAM, not driver heap."""
    import ray
    import ray.data as rd

    eng, lineage, own = _run(
        edges_or_engine, "cc", {}, num_parts, max_steps, directed=False,
    )
    refs = [a.result_table.remote() for a in eng.actors]
    ray.wait(refs, num_returns=len(refs))  # blocks exist before any kill
    ds = rd.from_arrow_refs(refs)
    if own:
        eng.shutdown()
    return ds, lineage


def maximal_matching(edges_or_engine, num_parts: int = 8, max_steps: int = 200):
    """Distributed maximal matching (handshake mutual-min; see
    ``MaximalMatchingProgram``) → (table(vid, partner), lineage); partner
    = −1 for unmatched vertices. Deterministic (symmetric md5 edge
    priorities) and partition-count invariant."""
    eng, lineage, own = _run(
        edges_or_engine, "matching", {}, num_parts, max_steps, directed=False
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def vertex_cover(edges_or_engine, num_parts: int = 8, max_steps: int = 200):
    """2-approximate minimum vertex cover (Gavril / Gallai folklore: the
    endpoints of ANY maximal matching cover every edge, and no cover can
    take fewer than one endpoint per matched edge) → (vid, in_cover).
    One run of :func:`maximal_matching`; in_cover = matched."""
    res, lineage = maximal_matching(
        edges_or_engine, num_parts=num_parts, max_steps=max_steps
    )
    return (
        pa.table(
            {
                "vid": res["vid"],
                "in_cover": pa.array(res["partner"].to_numpy() != -1),
            }
        ),
        lineage,
    )


def semi_clustering(
    edges_or_engine,
    iters: int = 4,
    c_max: int = 2,
    m_max: int = 4,
    f_b: float = 0.1,
    num_parts: int = 8,
):
    """Pregel-paper semi-clustering (Malewicz et al. 2010 §5.3) →
    (table(vid, cluster, score), lineage): per vertex its best overlapping
    semi-cluster (comma-joined sorted member vids) and the cluster's score
    rounded to 6. See ``SemiClusteringProgram`` for semantics, determinism
    and the sparse-graph sizing note."""
    eng, lineage, own = _run(
        edges_or_engine,
        "semicluster",
        {"iters": iters, "c_max": c_max, "m_max": m_max, "f_b": f_b},
        num_parts,
        max_steps=iters + 2,
        directed=False,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def bipartite_check(edges_ds, num_parts: int = 8, max_steps: int = 200):
    """Per-component bipartiteness (odd-cycle detection) → Arrow table
    (component, n_vertices, is_bipartite), via the BIPARTITE DOUBLE COVER:
    every vertex v becomes (2v, 2v+1) and every undirected edge {u, v}
    becomes {2u, 2v+1} and {2u+1, 2v}. A classical equivalence (König
    lineage): an original component is bipartite iff its double cover
    splits into TWO components — i.e. iff comp(2v) ≠ comp(2v+1). So the
    whole op is the EXISTING hash-min CC engine run once on 2|E| edges, no
    new vertex program and no parity bookkeeping: the reduction reads the
    doubled label table, pairs (2v, 2v+1) rows (both always exist — each
    copy inherits an edge), and folds per-component verdicts in numpy.
    ``component`` is the original min-vid label: both double-cover labels
    of a component are 2·minvid (+0/1), so ``comp2 >> 1`` recovers it on
    either side. The label table is O(V) driver state — the same posture
    as every other cc-family query.
    """

    def _double(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "src": np.concatenate([2 * s, 2 * s + 1]),
                "dst": np.concatenate([2 * d + 1, 2 * d]),
            }
        )

    res, _ = connected_components(
        edges_ds.map_batches(_double, batch_format="pyarrow"),
        num_parts=num_parts,
        max_steps=max_steps,
    )
    vid2 = res["vid"].to_numpy().view(np.int64)
    comp2 = res["component"].to_numpy().view(np.int64)
    order = np.argsort(vid2, kind="stable")  # (2v, 2v+1) become adjacent
    c2s = comp2[order]
    comp_v = c2s[0::2] >> 1
    conflict_v = c2s[0::2] == c2s[1::2]
    uc, inv = np.unique(comp_v, return_inverse=True)
    nv = np.bincount(inv).astype(np.int64)
    confl = np.zeros(len(uc), dtype=bool)
    np.logical_or.at(confl, inv, conflict_v)
    return pa.table(
        {"component": uc, "n_vertices": nv, "is_bipartite": ~confl}
    )


def component_size_histogram(edges_or_engine, num_parts: int = 8,
                             max_steps: int = 200, num_buckets: int = 32):
    """Connected-component SIZE DISTRIBUTION → (csize, n_components):
    how many components have exactly N vertices.

    Scale shape: the per-vertex labels STREAM out of the partition actors
    as a Dataset (``result_dataset`` — never concatenated on the driver,
    unlike the per-vertex queries that return |V| rows by design); each
    batch partial-counts its components, one bucketed groupby finishes
    per-component sizes, and a second tiny groupby folds the histogram.
    The driver sees only (distinct sizes) rows."""
    from ray.data.aggregate import Sum

    eng, _lineage, own = _run(
        edges_or_engine, "cc", {}, num_parts, max_steps, directed=False,
    )
    ds = eng.result_dataset()
    B = np.int64(num_buckets)

    def _partial(t: pa.Table) -> pa.Table:
        comp = t["component"].to_numpy().view(np.int64)
        k, cnt = np.unique(comp, return_counts=True)
        return pa.table(
            {"comp": k, "n": cnt.astype(np.int64), "b": (k % B).astype(np.int32)}
        )

    def _sizes(g: pa.Table) -> pa.Table:
        k, inv = np.unique(g["comp"].to_numpy(), return_inverse=True)
        s = np.zeros(len(k), np.int64)
        np.add.at(s, inv, g["n"].to_numpy())
        size, cnt = np.unique(s, return_counts=True)
        return pa.table({"csize": size, "n": cnt.astype(np.int64)})

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_sizes, batch_format="pyarrow")
        .groupby("csize")
        .aggregate(Sum("n", alias_name="n_components"))
        .to_pandas()
    )
    if own:
        eng.shutdown()
    return out


def sssp(edges_or_engine, seed_mod: int = 101, num_parts: int = 8,
         max_steps: int = 200, checkpoint_dir=None, checkpoint_every=0,
         resume=False):
    """Multi-source BFS over the symmetrized edge set → (vid, dist) with
    dist = hops to the nearest seed (vid % seed_mod == 0), -1 unreachable."""
    eng, lineage, own = _run(
        edges_or_engine, "sssp", {"seed_mod": seed_mod}, num_parts, max_steps,
        directed=False, checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every, resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def betweenness(edges_or_engine, seed_mod: int = 101, num_parts: int = 8,
                max_steps: int = 200, round_to: int = 4,
                checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Batched multi-source Brandes betweenness centrality over the
    symmetrized edge set → (vid, bc) with bc the dependency sum from the
    deterministic pivot set {v : vid % seed_mod == 0} (Brandes 2001 /
    Bader et al. 2007 pivot sampling; see BetweennessProgram)."""
    eng, lineage, own = _run(
        edges_or_engine, "betweenness",
        {"seed_mod": seed_mod, "round_to": round_to}, num_parts, max_steps,
        directed=False, checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every, resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def weighted_sssp(edges_or_engine, seed_mod: int = 101, wbase: int = 10,
                  wmod: int = 5, num_parts: int = 8, max_steps: int = 200,
                  checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Multi-source weighted shortest paths (distributed Bellman-Ford)
    over the symmetrized edge set → (vid, wdist); wdist = min-plus
    distance to the nearest seed (vid % seed_mod == 0) under
    w(u,v) = wbase + (u+v) mod wmod, -1 unreachable
    (see WeightedSSSPProgram)."""
    eng, lineage, own = _run(
        edges_or_engine, "wsssp",
        {"seed_mod": seed_mod, "wbase": wbase, "wmod": wmod},
        num_parts, max_steps, directed=False, checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every, resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def closeness(edges_or_engine, seed_mod: int = 101, num_parts: int = 8,
              max_steps: int = 200, round_to: int = 4,
              checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Harmonic closeness centrality over the symmetrized edge set →
    (vid, hc) with hc = Σ 1/dist from the deterministic pivot set
    {v : vid % seed_mod == 0} (Boldi & Vigna 2014 harmonic variant; see
    HarmonicClosenessProgram — forward phase of batched Brandes only)."""
    eng, lineage, own = _run(
        edges_or_engine, "closeness",
        {"seed_mod": seed_mod, "round_to": round_to}, num_parts, max_steps,
        directed=False, checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every, resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def _flag_symmetrize(edges_ds):
    """Directed (src, dst) Dataset → symmetrized (src, dst, flag) rows with
    per-edge direction bits (bit0 = real edge src→dst, bit1 = the reverse);
    a two-way pair's duplicate rows OR-combine at CSR build
    (``state.csr.build_csr``), so the partition layout stays one row per
    undirected pair while keeping the orientation recoverable."""

    def _sym(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy().astype(np.uint64)
        dst = t["dst"].to_numpy().astype(np.uint64)
        return pa.table(
            {
                "src": np.concatenate([src, dst]),
                "dst": np.concatenate([dst, src]),
                "flag": np.concatenate(
                    [
                        np.ones(len(src), np.uint8),
                        np.full(len(src), 2, np.uint8),
                    ]
                ),
            }
        )

    return edges_ds.map_batches(_sym, batch_format="pyarrow")


def scc(edges_or_engine, num_parts: int = 8, max_steps: int = 500,
        checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Strongly connected components of a DIRECTED edge Dataset →
    (pa.table(vid:uint64, scc:uint64), lineage). scc = the minimum vid in
    the component (see ``SCCProgram`` for the min-label FW-BW peeling
    algorithm and its termination argument). Accepts a pre-built engine
    whose graph layout was written from ``_flag_symmetrize`` output."""
    if not isinstance(edges_or_engine, BSPEngine):
        edges_or_engine = _flag_symmetrize(edges_or_engine)
    eng, lineage, own = _run(
        edges_or_engine, "scc", {}, num_parts, max_steps, directed=True,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def bowtie(edges_or_engine, num_parts: int = 8, max_steps: int = 500):
    """Bow-tie decomposition of a DIRECTED edge Dataset (Broder et al. 2000,
    "Graph structure in the web" — the canonical webgraph macro-structure):
    → (pa.table(vid:uint64, cls:string), core_id, lineage) with cls ∈
    {core, in, out, other}. core = the largest SCC (ties → smaller label);
    in = reaches the core; out = reached from it; other = the rest
    (tendrils, tubes, disconnected — the coarse 4-class variant).

    Composition on ONE flag-symmetrized partition layout: SCCProgram, a
    driver-side O(#SCCs) fold to pick the core, then ReachProgram from the
    core's min-member vertex — the core is strongly connected, so a single
    seed's fwd/bwd reachability equals the whole core's and no seed-set
    broadcast is needed."""
    own = not isinstance(edges_or_engine, BSPEngine)
    eng = (
        build_engine(_flag_symmetrize(edges_or_engine), num_parts, directed=True)
        if own
        else edges_or_engine
    )
    lin1 = eng.run("scc", {}, max_steps=max_steps)
    sc = eng.result_table()
    scc_l = sc["scc"].to_numpy()
    uniq, cnt = np.unique(scc_l, return_counts=True)
    core = uniq[np.lexsort((uniq, -cnt))[0]] if len(uniq) else np.uint64(0)
    lin2 = eng.run("reach", {"seed_vid": int(core)}, max_steps=max_steps)
    rc = eng.result_table()
    # both result tables enumerate the same partitions in actor order with
    # per-partition-sorted vids — but align defensively by vid anyway
    order_s = np.argsort(sc["vid"].to_numpy())
    order_r = np.argsort(rc["vid"].to_numpy())
    vid = sc["vid"].to_numpy()[order_s]
    scc_l = scc_l[order_s]
    fwd = rc["fwd"].to_numpy()[order_r]
    bwd = rc["bwd"].to_numpy()[order_r]
    cls = np.where(
        scc_l == core,
        "core",
        np.where(bwd, "in", np.where(fwd, "out", "other")),
    )
    out = pa.table({"vid": vid, "cls": pa.array(cls.tolist(), type=pa.string())})
    if own:
        eng.shutdown()
    return out, int(core), {"scc": lin1, "reach": lin2}


def max_spanning_forest(sf_dir: str, num_partitions: int = 8,
                        max_rounds: int = 30):
    """Borůvka maximum spanning forest of the WEIGHTED co-purchase graph
    (Borůvka 1926 / the GHS distributed-MST lineage — public): the
    strongest-tie backbone — per component, repeatedly take the
    maximum-weight outgoing edge (weight = shared-order count, ties
    broken by the packed (src,dst) key so every weight is UNIQUE and the
    forest is deterministic), contract, repeat. Returns
    (pa.table(src, dst, n_orders) canonical src < dst, rounds_run).

    Pure-Dataset contraction path, no actors: per round, labels join to
    the weighted edges (both directions), per-batch reduceat picks the
    in-batch best edge per component BEFORE the one groupby-max, a
    join-back recovers the argmax edge, and the union graph (one edge
    per component) is contracted with the existing ``cc_dataset``
    pointer-free hash-min loop. O(log n) rounds; the accumulated forest
    (n−1 rows total — the result itself) is the only driver-side state.

    Library operator, not a driver query: like ``ktruss``, the
    ~log n rounds × (joins + a nested cc_dataset fixpoint) each pay this
    sandbox's per-shuffle orchestration floor (BENCH/STATS.md), which
    exceeds the driver's per-query budget while compute is milliseconds;
    nested fixpoints also put it out of SQL-unroll scope, so correctness
    is pinned by the brute-Kruskal parity pytest
    (``test_max_spanning_forest_vs_kruskal``)."""
    from .relational import copurchase_weights

    SHIFT = np.int64(1) << np.int64(21)
    PAIR_BITS = np.int64(1) << np.int64(42)

    ew = copurchase_weights(sf_dir).materialize()  # src < dst, n_orders

    def _both_dirs(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        n = t["n_orders"].to_numpy()
        pair = s * SHIFT + d
        # max key ⇔ (max n, then min (src,dst)) — a TOTAL order
        key = n * PAIR_BITS + (PAIR_BITS - np.int64(1) - pair)
        return pa.table(
            {
                "u": np.concatenate([s, d]),
                "v": np.concatenate([d, s]),
                "key": np.concatenate([key, key]),
                "pair": np.concatenate([pair, pair]),
            }
        )

    es = ew.map_batches(_both_dirs, batch_format="pyarrow").materialize()

    def _verts(t: pa.Table) -> pa.Table:
        u = np.unique(t["u"].to_numpy())
        return pa.table({"vid": u, "comp": u})

    from ray.data.aggregate import Min

    labels = (
        es.map_batches(_verts, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Min("comp", alias_name="comp"))
        .materialize()
    )

    forest_keys: list[np.ndarray] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        lu = labels.map_batches(
            lambda t: pa.table({"u": t["vid"], "cu": t["comp"]}),
            batch_format="pyarrow",
        )
        lv = labels.map_batches(
            lambda t: pa.table({"v": t["vid"], "cv": t["comp"]}),
            batch_format="pyarrow",
        )
        cross = (
            es.join(lu, "inner", num_partitions, on=("u",))
            .join(lv, "inner", num_partitions, on=("v",))
            .map_batches(
                lambda t: t.filter(
                    pa.array(t["cu"].to_numpy() != t["cv"].to_numpy())
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        if cross.count() == 0:
            rounds -= 1
            break

        def _pre_max(t: pa.Table) -> pa.Table:  # in-batch combiner (argmax rows)
            c = t["cu"].to_numpy()
            k = t["key"].to_numpy()
            order = np.lexsort((k, c))
            last = np.concatenate([c[order][1:] != c[order][:-1], [True]])
            idx = order[last]
            keep = t.take(idx)
            return keep.append_column(
                "bb", pa.array((keep["cu"].to_numpy() % 32).astype(np.int32))
            )

        def _best_in_bucket(g: pa.Table) -> pa.Table:  # global argmax per cu
            c = g["cu"].to_numpy()
            k = g["key"].to_numpy()
            order = np.lexsort((k, c))
            last = np.concatenate([c[order][1:] != c[order][:-1], [True]])
            return g.take(order[last]).drop_columns(["bb"])

        chosen = (
            cross.map_batches(_pre_max, batch_format="pyarrow")
            .groupby("bb")
            .map_groups(_best_in_bucket, batch_format="pyarrow")
        )

        def _dedup_pairs(t: pa.Table) -> pa.Table:
            # an edge picked from both directions appears once per side;
            # the key encodes (n_orders, pair) so no weight lookup later
            return pa.table({"key": np.unique(t["key"].to_numpy())})

        keys = np.unique(
            np.concatenate(
                [
                    b["key"].to_numpy()
                    for b in chosen.map_batches(
                        _dedup_pairs, batch_format="pyarrow"
                    ).iter_batches(batch_format="pyarrow")
                ]
                or [np.empty(0, np.int64)]
            )
        )
        forest_keys.append(keys)

        union = chosen.map_batches(
            lambda t: pa.table(
                {
                    "src": np.concatenate(
                        [t["cu"].to_numpy(), t["cv"].to_numpy()]
                    ),
                    "dst": np.concatenate(
                        [t["cv"].to_numpy(), t["cu"].to_numpy()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        cmap = cc_dataset(union).map_batches(
            lambda t: pa.table({"comp": t["vid"], "newc": t["component"]}),
            batch_format="pyarrow",
        )
        relabeled = labels.join(cmap, "left_outer", num_partitions, on=("comp",))

        def _apply(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            new = pc.fill_null(t["newc"], np.iinfo(np.int64).max).to_numpy()
            comp = t["comp"].to_numpy()
            return pa.table(
                {
                    "vid": t["vid"],
                    "comp": np.where(new != np.iinfo(np.int64).max, new, comp),
                }
            )

        labels = relabeled.map_batches(_apply, batch_format="pyarrow").materialize()

    allk = (
        np.unique(np.concatenate(forest_keys))
        if forest_keys
        else np.empty(0, np.int64)
    )
    pair = PAIR_BITS - np.int64(1) - (allk % PAIR_BITS)
    order = np.argsort(pair)
    pair = pair[order]
    n_orders = (allk // PAIR_BITS)[order]
    return (
        pa.table(
            {
                "src": pair // SHIFT,
                "dst": pair % SHIFT,
                "n_orders": n_orders.astype(np.int64),
            }
        ),
        rounds,
    )


def link_prediction(sf_dir: str, num_buckets: int = 32,
                    num_partitions: int = 8):
    """Common-neighbor and Jaccard link-prediction scores (Liben-Nowell &
    Kleinberg 2003, public) for every edge of the STRONG co-purchase
    graph → (src, dst, common_neighbors, jaccard) with
    jaccard = cn / (deg(u) + deg(v) − cn) over strong-graph neighbor sets.

    Scale shape: wedges expand per hub inside hub-hash buckets (lexsort +
    segment expansion with in-bucket np.unique partial counts — the
    co-purchase pair machinery over the adjacency instead of orders); one
    groupby folds pair counts; the pair table LEFT-joins back to the edge
    list (cn = 0 edges kept) and degrees join per endpoint. The driver
    never sees an adjacency set."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away
    from ..state.csr import flat_gather
    from .build_graph import symmetrize
    from .relational import strong_copurchase_edges

    SHIFT = np.int64(1) << np.int64(21)  # partkeys < 2^21, as elsewhere
    eu = strong_copurchase_edges(sf_dir).materialize()  # src < dst
    es = symmetrize(eu).materialize()

    def _bucket(t: pa.Table) -> pa.Table:
        d = t["dst"].to_numpy()
        return t.append_column(
            "b", pa.array((d % num_buckets).astype(np.int32))
        )

    def _wedges(g: pa.Table) -> pa.Table:
        w = g["dst"].to_numpy()  # hub
        u = g["src"].to_numpy()  # hub's neighbor
        order = np.lexsort((u, w))
        w_s, u_s = w[order], u[order]
        _, starts, counts = np.unique(w_s, return_index=True, return_counts=True)
        cpe = np.repeat(counts, counts)
        left = np.repeat(u_s, cpe)
        right = u_s[flat_gather(np.repeat(starts, counts), cpe)]
        m = left < right
        _check_pack_width(u_s, SHIFT, "packed wedge key")
        key = left[m].astype(np.int64) * SHIFT + right[m].astype(np.int64)
        uk, c = np.unique(key, return_counts=True)
        return pa.table({"k": uk, "c": c.astype(np.int64)})

    cn = (
        es.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_wedges, batch_format="pyarrow")
        .groupby("k", num_partitions=num_partitions)
        .aggregate(Sum("c", alias_name="cn"))
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t["k"].to_numpy() // SHIFT,
                    "dst": t["k"].to_numpy() % SHIFT,
                    "cn": t["cn"],
                }
            ),
            batch_format="pyarrow",
        )
    )

    def _deg_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["src"].to_numpy(), return_counts=True)
        return pa.table({"vid": u, "c": c.astype(np.int64)})

    deg = (
        es.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("vid", num_partitions=num_partitions)
        .aggregate(Sum("c", alias_name="deg"))
    )
    dsrc = deg.map_batches(
        lambda t: pa.table({"src": t["vid"], "dsrc": t["deg"]}),
        batch_format="pyarrow",
    )
    ddst = deg.map_batches(
        lambda t: pa.table({"dst": t["vid"], "ddst": t["deg"]}),
        batch_format="pyarrow",
    )
    joined = (
        eu.join(cn, "left_outer", num_partitions, on=("src", "dst"))
        .join(dsrc, "inner", num_partitions, on=("src",))
        .join(ddst, "inner", num_partitions, on=("dst",))
    )

    def _score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.fill_null(t["cn"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
        da = t["dsrc"].to_numpy()
        db = t["ddst"].to_numpy()
        jac = c / (da + db - c)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "common_neighbors": c,
                "jaccard": round_half_away(jac, 6),
            }
        )

    return joined.map_batches(_score, batch_format="pyarrow")


def katz(edges_or_engine, iters: int = 8, alpha: float = 0.001,
         beta: float = 1.0, num_parts: int = 8, round_to: int = 6,
         checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Katz centrality over the symmetrized edge set → (vid, katz);
    fixed-iteration series x = β·Σ αᵗAᵗ1 (see KatzCentralityProgram)."""
    eng, lineage, own = _run(
        edges_or_engine, "katz",
        {"iters": iters, "alpha": alpha, "beta": beta, "round_to": round_to},
        num_parts, max_steps=iters + 2, directed=False,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def lpa_modularity(sf_dir: str, iters: int = 5, num_parts: int = 4,
                   num_partitions: int = 8):
    """Newman modularity (Newman & Girvan 2004, public) of the LPA
    communities over the co-purchase graph →
    (label, n_members, internal_edges, degree_sum, q) with
    q_c = ic/m − (dg/(2m))² per community, m = undirected edge count.
    Runs on the STRONG co-purchase graph (the dense ≥1-order graph
    collapses to one LPA community — Q = 0, uninformative).

    Scale shape: the per-vid label table ships to the edges via two
    ``Dataset.join``s (never a driver-side label dict); internal-edge and
    degree-sum partials combine per batch with np.unique BEFORE the one
    small per-label groupby; the driver only assembles the per-community
    table (#communities rows)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away
    from .build_graph import symmetrize
    from .relational import strong_copurchase_edges

    eu = strong_copurchase_edges(sf_dir).materialize()  # distinct src<dst pairs
    m = eu.count()
    labels_tbl, _ = label_propagation(
        symmetrize(eu), iters=iters, num_parts=num_parts
    )
    lab = pa.table(
        {
            "vid": labels_tbl["vid"].to_numpy().view(np.int64),
            "label": labels_tbl["label"].to_numpy().view(np.int64),
        }
    )
    lab_src = rd.from_arrow(lab.rename_columns(["src", "lsrc"]))
    lab_dst = rd.from_arrow(lab.rename_columns(["dst", "ldst"]))
    both = eu.join(lab_src, "inner", num_partitions, on=("src",)).join(
        lab_dst, "inner", num_partitions, on=("dst",)
    )

    def _partials(t: pa.Table) -> pa.Table:
        ls = t["lsrc"].to_numpy()
        ld = t["ldst"].to_numpy()
        iu, ic = np.unique(ls[ls == ld], return_counts=True)
        du, dc = np.unique(np.concatenate([ls, ld]), return_counts=True)
        return pa.table(
            {
                "label": np.concatenate([iu, du]),
                "ic": np.concatenate([ic, np.zeros(len(du), np.int64)]).astype(np.int64),
                "dg": np.concatenate([np.zeros(len(iu), np.int64), dc]).astype(np.int64),
            }
        )

    agg = (
        both.map_batches(_partials, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("ic", alias_name="internal_edges"),
                   Sum("dg", alias_name="degree_sum"))
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )

    def _members(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["label"].to_numpy(), return_counts=True)
        return pa.table({"label": u, "c": c.astype(np.int64)})

    nm = (
        rd.from_arrow(lab)
        .map_batches(_members, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("c", alias_name="n_members"))
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    assert len(nm) == len(agg) and (nm["label"].values == agg["label"].values).all()
    mf = float(m)
    ic = agg["internal_edges"].to_numpy().astype(np.float64)
    dg = agg["degree_sum"].to_numpy().astype(np.float64)
    q = ic / mf - (dg / (2.0 * mf)) * (dg / (2.0 * mf))
    return pa.table(
        {
            "label": agg["label"].to_numpy(),
            "n_members": nm["n_members"].to_numpy().astype(np.int64),
            "internal_edges": agg["internal_edges"].to_numpy().astype(np.int64),
            "degree_sum": agg["degree_sum"].to_numpy().astype(np.int64),
            "q": round_half_away(q, 6),
        }
    )


def eccentricity(edges_or_engine, seed_mod: int = 101, num_parts: int = 8,
                 max_steps: int = 200, checkpoint_dir=None,
                 checkpoint_every=0, resume=False):
    """Per-pivot eccentricity over the symmetrized edge set → (s, ecc)
    for the deterministic pivot set (see EccentricityProgram); the
    per-partition partials (K·P tiny rows) are max-folded here."""
    eng, lineage, own = _run(
        edges_or_engine, "eccentricity", {"seed_mod": seed_mod},
        num_parts, max_steps, directed=False, checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every, resume=resume,
    )
    partial = eng.result_table()
    if own:
        eng.shutdown()
    folded = partial.group_by("s").aggregate([("ecc", "max")])
    out = pa.table(
        {"s": folded["s"], "ecc": folded["ecc_max"]}
    ).sort_by("s")
    return out, lineage


def greedy_coloring(edges_or_engine, num_parts: int = 8, max_steps: int = 300,
                    checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Jones–Plassmann greedy graph coloring over the symmetrized edge
    set → (vid, color), deterministic via md5 priorities (see
    GreedyColoringProgram)."""
    eng, lineage, own = _run(
        edges_or_engine, "coloring", {}, num_parts, max_steps,
        directed=False, checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every, resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def mis(edges_or_engine, num_parts: int = 8, max_steps: int = 200,
        checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Deterministic Luby maximal independent set → (vid, in_mis)."""
    eng, lineage, own = _run(
        edges_or_engine, "mis", {}, num_parts, max_steps, directed=False,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def label_propagation(edges_or_engine, iters: int = 10, num_parts: int = 8,
                      checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Synchronous LPA (min tie-break) → (vid, label)."""
    eng, lineage, own = _run(
        edges_or_engine, "lpa", {"iters": iters}, num_parts, iters + 2, directed=False,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every, resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def seeded_labels(edges_or_engine, iters: int = 5, seed_mod: int = 10,
                  label_mod: int = 3, num_parts: int = 8,
                  checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Semi-supervised seeded LPA (clamped seeds, min tie-break) →
    (vid, label); label = −1 where the flood never arrived."""
    eng, lineage, own = _run(
        edges_or_engine, "seeded_lpa",
        {"iters": iters, "seed_mod": seed_mod, "label_mod": label_mod},
        num_parts, iters + 2, directed=False,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def triangle_count(edges_or_engine, num_parts: int = 8):
    """Exact triangle count → (global count, per-vertex table, lineage)."""
    eng, lineage, own = _run(edges_or_engine, "triangles", {}, num_parts, 4, directed=False)
    total = eng.scalar_results().get("triangles", 0)
    per_vertex = eng.result_table()
    if own:
        eng.shutdown()
    return total, per_vertex, lineage


def personalized_pagerank(
    edges_or_engine,
    iters: int = 10,
    damping: float = 0.85,
    seed_mod: int = 10,
    num_parts: int = 8,
    tol: float = 0.0,
):
    """Seeded-teleport PageRank (restart mass only on ``vid % seed_mod == 0``)
    → (result table(vid, rank), lineage). Superstep 0 is a seed census
    through the scalar fold; update k lands at step k+1 (max_steps = iters+3).
    """
    eng, lineage, own = _run(
        edges_or_engine,
        "ppr",
        {"iters": iters, "damping": damping, "seed_mod": seed_mod, "tol": tol},
        num_parts,
        max_steps=iters + 3,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out.select(["vid", "rank"]), lineage


def spam_mass(
    edges_or_engine,
    iters: int = 10,
    damping: float = 0.85,
    trust_mod: int = 17,
    num_parts: int = 8,
):
    """TrustRank + spam mass over the link graph → Arrow table
    (vid, pr, tr, spam_mass), the classic link-spam signal of Gyöngyi,
    Garcia-Molina & Pedersen ("Combating Web Spam with TrustRank",
    VLDB 2004): ``tr`` is PageRank whose teleport mass restarts only on a
    trusted seed set (here the deterministic predicate
    ``vid % trust_mod == 0``, so the SQL oracle can reproduce it), and
    ``spam_mass = (pr − tr) / pr`` is the fraction of a page's global rank
    NOT attributable to trusted sources — ≈1 for pages ranked by spam
    farms, ≤0 inside the trusted neighborhood.

    Scale shape: the CSR is partitioned ONCE and both fixpoints run on the
    same engine (the second ``eng.run`` re-inits program state only — no
    re-partition, no second graph shuffle); each run exchanges O(V) rank
    partials per superstep through the store with the static dst-index
    combiner. The final join is a per-partition vid-aligned numpy merge of
    two (vid, rank) tables. ``pr``/``tr`` are rounded half-away to 8
    digits FIRST and the ratio is taken on the rounded values, so the
    division is bit-reproducible against the DuckDB oracle.
    """
    eng, lin_pr, own = _run(
        edges_or_engine,
        "pagerank",
        {"iters": iters, "damping": damping, "tol": 0.0, "n_global": None},
        num_parts,
        max_steps=iters + 1,
    )
    pr_t = eng.result_table()
    eng.run(
        "ppr",
        {"iters": iters, "damping": damping, "seed_mod": trust_mod, "tol": 0.0},
        max_steps=iters + 3,
    )
    tr_t = eng.result_table()
    if own:
        eng.shutdown()
    vid_p = pr_t["vid"].to_numpy().view(np.int64)
    vid_t = tr_t["vid"].to_numpy().view(np.int64)
    op, ot = np.argsort(vid_p, kind="stable"), np.argsort(vid_t, kind="stable")
    pr8 = round_half_away(pr_t["rank"].to_numpy()[op], 8)
    tr8 = round_half_away(tr_t["rank"].to_numpy()[ot], 8)
    with np.errstate(divide="ignore", invalid="ignore"):
        mass = np.where(pr8 > 0, (pr8 - tr8) / pr8, 0.0)
    return pa.table(
        {
            "vid": vid_p[op],
            "pr": pr8,
            "tr": tr8,
            "spam_mass": round_half_away(mass, 8),
        }
    )


def random_walks(edges_or_engine, walk_len: int = 4, num_parts: int = 8):
    """One deterministic ``walk_len``-step walk per vertex →
    table(start_vid, end_vid). See ``RandomWalkProgram`` for the hash
    transition that makes the sampler oracle-checkable; at scale the walker
    set IS the exchanged data (O(#walkers) per superstep, graph untouched).
    """
    eng, lineage, own = _run(
        edges_or_engine, "walk", {"walk_len": walk_len}, num_parts, walk_len + 2,
        directed=False,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def hits(edges_or_engine, iters: int = 8, num_parts: int = 8):
    """HITS hubs/authorities on the DAG orientation (u→v iff u<v) of the
    symmetric edge set → (table(vid, auth, hub) L2-normalized, lineage).
    See ``HITSProgram`` for the exchange/normalization shape."""
    eng, lineage, own = _run(
        edges_or_engine, "hits", {"iters": iters}, num_parts, iters + 3,
        directed=False,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def assortativity(edges_or_engine, num_parts: int = 8):
    """Degree assortativity coefficient → 1-row table(assortativity).

    Partitions fold six exact-integer sums (``AssortativityProgram``); the
    coefficient is computed here with cast-to-double THEN arithmetic — the
    same order as ``CAST(sum(..) AS DOUBLE)`` in the SQL oracle — so every
    double operation rounds identically on both sides.
    """
    eng, _lin, own = _run(
        edges_or_engine, "assortativity", {}, num_parts, 3, directed=False
    )
    s = eng.scalar_results()
    if own:
        eng.shutdown()
    return pa.table(
        {"assortativity": round_half_away(np.array([assortativity_from_sums(s)]), 6)}
    )


def spectral_radius(edges_or_engine, iters: int = 5, num_parts: int = 8,
                    round_to: int = 6):
    """Spectral-radius estimate of the symmetric adjacency by exact
    int64 power iteration (walk counts; see SpectralRadiusProgram) →
    1-row table(iters, max_walks, lambda_est) with
    λ = max(w_T)/max(w_{T-1}) rounded, bit-exact vs the SQL unroll."""
    eng, _lin, own = _run(
        edges_or_engine, "spectral_radius", {"iters": iters}, num_parts,
        iters + 2, directed=False,
    )
    t = eng.result_table().to_pandas()
    if own:
        eng.shutdown()
    mp, mc = int(t["max_prev"].max()), int(t["max_cur"].max())
    lam = float(mc) / float(mp) if mp > 0 else 0.0
    return pa.table(
        {
            "iters": pa.array([iters], pa.int64()),
            "max_walks": pa.array([mc], pa.int64()),
            "lambda_est": round_half_away(np.array([lam]), round_to),
        }
    )


def diameter_double_sweep(edges_ds, num_parts: int = 8, max_steps: int = 200):
    """Double-sweep diameter bounds (Magnien, Latapy & Habib 2009) →
    1-row table(pivot, ecc_pivot, far_vid, diameter_lb, diameter_ub):
    BFS from the deterministic pivot (max degree, tie → min vid) gives
    ecc(pivot) (so diameter ≤ 2·ecc(pivot)); a second BFS from the
    farthest vertex (min-vid witness) gives the classic lower bound
    diameter ≥ ecc(far). Exact ints end to end.

    Scale shape: TWO batched-BFS runs on one engine (the betweenness
    forward machinery with explicit seeds); the pivot pick is a
    per-block partial argmax fold — the driver only ever sees one
    (deg, vid) pair per block."""
    from .build_graph import partition_graph

    def _best(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"vid": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
            )
        u = t["src"].to_numpy().astype(np.int64)
        cnt = t["count()"].to_numpy().astype(np.int64)
        order = np.lexsort((u, -cnt))
        return pa.table(
            {
                "vid": pa.array([int(u[order[0]])], pa.int64()),
                "deg": pa.array([int(cnt[order[0]])], pa.int64()),
            }
        )

    # degree groupby → per-block partial argmax → one tiny driver fold
    deg_parts = (
        edges_ds.groupby("src")
        .count()
        .map_batches(_best, batch_format="pyarrow")
        .to_pandas()
    )
    order = np.lexsort((deg_parts["vid"].to_numpy(), -deg_parts["deg"].to_numpy()))
    pivot = int(deg_parts["vid"].to_numpy()[order[0]])

    eng, _lin, own = _run(
        edges_ds, "pivot_ecc", {"seed_list": [pivot]}, num_parts, max_steps,
        directed=False,
    )

    def _fold(partial: pa.Table) -> tuple[int, int]:
        df = partial.to_pandas()
        ecc = int(df["ecc"].max())
        far = int(df.loc[df["ecc"] == ecc, "far"].min())
        return ecc, far

    ecc_p, far = _fold(eng.result_table())
    eng.run("pivot_ecc", {"seed_list": [far]}, max_steps=max_steps)
    ecc_f, _ = _fold(eng.result_table())
    if own:
        eng.shutdown()
    return pa.table(
        {
            "pivot": pa.array([pivot], pa.int64()),
            "ecc_pivot": pa.array([ecc_p], pa.int64()),
            "far_vid": pa.array([far], pa.int64()),
            "diameter_lb": pa.array([ecc_f], pa.int64()),
            "diameter_ub": pa.array([2 * ecc_p], pa.int64()),
        }
    )


def coarsen_matching(edges_ds, num_parts: int = 8):
    """ONE level of multilevel graph coarsening by maximal matching (the
    Metis/heavy-edge idiom, Karypis & Kumar 1998, with the deterministic
    handshake matching): contract every matched pair to the smaller
    endpoint id, keep unmatched vertices, and emit the coarse multi-edge
    table → Dataset(src, dst, n_multi) with src < dst (self-loops from
    intra-pair edges dropped; n_multi = collapsed original pair count).

    Scale shape: the matching runs on the BSP engine; the vid→coarse map
    (one row per graph vertex — 1000× smaller than the raw fact table)
    is broadcast via ``ray.put`` + searchsorted inside ``map_batches``
    (the dimension-broadcast posture); the coarse edge fold is one
    map_batches partial-dedup + one groupby."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    res, _lin = maximal_matching(edges_ds, num_parts=num_parts)
    vid = res["vid"].to_numpy().view(np.int64)
    partner = res["partner"].to_numpy()
    label = np.where(partner >= 0, np.minimum(vid, partner), vid)
    order = np.argsort(vid)
    mref = ray.put((vid[order], label[order]))

    def _coarse(t: pa.Table) -> pa.Table:
        mv, ml = ray.get(mref)
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        one = s < d  # symmetrized input: count each undirected pair once
        s, d = s[one], d[one]
        cs = ml[np.searchsorted(mv, s)]
        cd = ml[np.searchsorted(mv, d)]
        keep = cs != cd  # intra-pair edges vanish in the coarse graph
        lo = np.minimum(cs[keep], cd[keep])
        hi = np.maximum(cs[keep], cd[keep])
        _check_pack_width(hi, np.int64(1) << 31, "coarse edge key")
        key = (lo << np.int64(31)) | hi
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "src": uk >> np.int64(31),
                "dst": uk & ((np.int64(1) << 31) - 1),
                "n_multi": cnt.astype(np.int64),
            }
        )

    return (
        edges_ds.map_batches(_coarse, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("n_multi", alias_name="n_multi"))
    )


def walk_skipgram_pmi(edges_or_engine, walk_len: int = 4, window: int = 2,
                      num_parts: int = 8, num_buckets: int = 32,
                      num_partitions: int = 8, round_to: int = 6):
    """DeepWalk-style skip-gram statistics over DETERMINISTIC walks →
    Dataset(u, v, n, pmi): run the oracle-checkable random walks
    (RandomWalkProgram, trace mode) from every vertex, emit directed
    skip-gram pairs (v_t, v_{t+d}) for d ≤ window within each walk, and
    score each pair with PMI = ln(n(u,v)·N / (n_l(u)·n_r(v))) — the
    matrix whose implicit factorization IS DeepWalk/word2vec (Levy &
    Goldberg 2014). The graph→training-data bridge op: the pair corpus
    is what a skip-gram embedding trainer consumes.

    Scale shape: walk visits stay distributed (per-partition trace,
    streamed out via result blocks); pair extraction reshapes each
    walk's FIXED-width (L+1) path inside start-hash buckets (one
    shuffle, vectorized slicing, in-bucket pre-aggregation); pair
    counts, both marginals and the scalar N fold through groupbys; the
    two marginal joins are repartition-normalized (the Ray 2.49 acero
    seam). Exact-integer counts ⇒ one double expression per row."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    eng, _lin, own = _run(
        edges_or_engine, "walk", {"walk_len": walk_len, "trace": True},
        num_parts, walk_len + 2, directed=False,
    )
    visits = eng.result_dataset().materialize()
    if own:
        eng.shutdown()

    Lp1 = walk_len + 1

    def _bucket(t: pa.Table) -> pa.Table:
        s = t["start_vid"].to_numpy()
        return t.append_column(
            "b", pa.array((s % num_buckets).astype(np.int32))
        )

    def _pairs(g: pa.Table) -> pa.Table:
        s = g["start_vid"].to_numpy()
        tt = g["t"].to_numpy()
        v = g["vid"].to_numpy()
        order = np.lexsort((tt, s))
        path = v[order].reshape(-1, Lp1)  # every walk has exactly L+1 rows
        us, vs = [], []
        for d in range(1, window + 1):
            us.append(path[:, :-d].ravel())
            vs.append(path[:, d:].ravel())
        u = np.concatenate(us)
        w = np.concatenate(vs)
        _check_pack_width(np.concatenate([u, w]), np.int64(1) << 31,
                          "walk skip-gram pair key")
        key = (u << np.int64(31)) | w
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "u": uk >> np.int64(31),
                "v": uk & ((np.int64(1) << 31) - 1),
                "n": cnt.astype(np.int64),
            }
        )

    pairs = (
        visits.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_pairs, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .repartition(num_partitions)
        .materialize()
    )
    N = int(pairs.aggregate(Sum("n"))["sum(n)"])
    nl = (
        pairs.groupby("u").aggregate(Sum("n", alias_name="nl"))
        .repartition(num_partitions).materialize()
    )
    nr = (
        pairs.groupby("v").aggregate(Sum("n", alias_name="nr"))
        .repartition(num_partitions).materialize()
    )
    joined = pairs.join(nl, "inner", num_partitions, on=("u",)).join(
        nr, "inner", num_partitions, on=("v",)
    )

    def _pmi(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        a = t["nl"].to_numpy().astype(np.float64)
        b = t["nr"].to_numpy().astype(np.float64)
        pmi = np.log((n * float(N)) / (a * b))
        return pa.table(
            {
                "u": t["u"],
                "v": t["v"],
                "n": t["n"],
                "pmi": round_half_away(pmi, round_to),
            }
        )

    return joined.map_batches(_pmi, batch_format="pyarrow")


def weighted_assortativity(edges_or_engine, num_parts: int = 8):
    """Strength assortativity over a (src, dst, weight) edge Dataset (one
    row per undirected pair) → 1-row table(wassortativity). Same folded
    six-integer-sum shape as :func:`assortativity`, with strength = Σ
    incident stored weights via the 'strength' attribute exchange."""
    if not isinstance(edges_or_engine, BSPEngine):
        edges_or_engine = _weight_symmetrize(edges_or_engine)
    eng, _lin, own = _run(
        edges_or_engine, "wassortativity", {}, num_parts, 3, directed=True
    )
    s = eng.scalar_results()
    if own:
        eng.shutdown()
    return pa.table(
        {
            "wassortativity": round_half_away(
                np.array([assortativity_from_sums(s)]), 6
            )
        }
    )


def assortativity_from_sums(s: dict) -> float:
    """Pearson r from the six folded integer sums (cast-then-operate)."""
    n = float(s["asrt_n"])
    sx, sy = float(s["asrt_sx"]), float(s["asrt_sy"])
    sxy, sxx, syy = float(s["asrt_sxy"]), float(s["asrt_sxx"]), float(s["asrt_syy"])
    den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (n * sxy - sx * sy) / den if den > 0 else 0.0


def clustering_coefficient(edges_or_engine, num_parts: int = 8):
    """Local clustering coefficient per vertex → Dataset(vid, clustering).

    cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)); 0 for deg < 2. T(v) and deg(v)
    both come out of the triangle program's result table (degree rides along
    from the CSR), so the metric needs no join against the edge table and no
    extra shuffle — at scale, apply the same kernel to ``engine.dump``'s
    partitioned output instead of the driver-side ``result_table``.
    """
    _total, t, _lin = triangle_count(edges_or_engine, num_parts=num_parts)
    tri = t["triangles"].to_numpy().astype(np.float64)
    deg = t["degree"].to_numpy().astype(np.int64)
    denom = deg * (deg - 1)
    # operation order mirrors the SQL oracle: (2.0·T) / (d·(d−1)), one
    # double division of exact integers → bit-identical
    cc = np.divide(2.0 * tri, denom, out=np.zeros(len(deg)), where=denom > 0)
    return pa.table({"vid": t["vid"], "clustering": round_half_away(cc, 6)})


def ktruss_bsp(edges_or_engine, k: int = 6, num_parts: int = 8, max_steps: int = 400,
               checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Maximal k-truss edge set (iterated triangle-support peeling) →
    ((src, dst) table with src < dst, lineage).

    BSP-actor twin of the Dataset-path :func:`ktruss` below: supersteps on
    pinned partition actors cost ~ms each instead of the Dataset shuffle
    floor, so peeling's O(rounds × 3) exchanges stay cheap enough for the
    driver-contract budget (the Dataset path stays the pure-shuffle
    expression for clusters where actor state is undesirable)."""
    eng, lineage, own = _run(
        edges_or_engine, "ktruss", {"k": k}, num_parts, max_steps, directed=False,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every, resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def kcore(edges_or_engine, num_parts: int = 8, max_steps: int = 300,
          checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Exact core numbers (distributed h-index iteration) → (vid, core)."""
    eng, lineage, own = _run(
        edges_or_engine, "kcore", {}, num_parts, max_steps, directed=False,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every, resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def s_core(edges_or_engine, num_parts: int = 8, max_steps: int = 300,
           checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Weighted core decomposition (s-core, Eidsaa & Almaas 2013) by the
    weighted h-index fixpoint over a (src, dst, weight) edge Dataset →
    (vid, core). See ``SCoreProgram`` — for unit weights this IS k-core,
    and the same frontier/convergence shape applies (per-round cost ∝
    changed vertices, all-to-all only at the exchange)."""
    if not isinstance(edges_or_engine, BSPEngine):
        edges_or_engine = _weight_symmetrize(edges_or_engine)
    # directed=True: _weight_symmetrize already emitted both directions
    # with their stored weights (the wsssp_stored layout convention)
    eng, lineage, own = _run(
        edges_or_engine, "score", {}, num_parts, max_steps, directed=True,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def degree_discount_seeds(edges_or_engine, k: int = 10, num_parts: int = 8,
                          checkpoint_dir=None, checkpoint_every=0,
                          resume=False):
    """Chen-2009 DegreeDiscount influence seeds over the symmetrized edge
    set → (pa.table(rank, vid, dd100), lineage) with the k greedy picks in
    selection order and their exact-integer 100·dd scores at selection.
    See ``DegreeDiscountProgram``."""
    eng, lineage, own = _run(
        edges_or_engine, "degdiscount", {"k": k}, num_parts,
        max_steps=3 * k + 3, directed=False,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        resume=resume,
    )
    res = eng.result_table()
    if own:
        eng.shutdown()
    rank = res["rank"].to_numpy()
    sel = rank >= 0
    order = np.argsort(rank[sel])
    return (
        pa.table(
            {
                "rank": rank[sel][order],
                "vid": res["vid"].to_numpy()[sel][order],
                "dd100": res["dd100"].to_numpy()[sel][order],
            }
        ),
        lineage,
    )


def densest_subgraph(edges_or_engine, num_parts: int = 8, max_steps: int = 200,
                     checkpoint_dir=None, checkpoint_every=0, resume=False):
    """Bahmani-2012 parallel densest-subgraph peeling (ε = 1/2) over the
    symmetrized edge set → (pa.table(vid, peel_round), lineage). See
    ``DensestSubgraphProgram`` for the exact-integer peel rule and the
    2-supersteps-per-round aggregator shape."""
    eng, lineage, own = _run(
        edges_or_engine, "densest", {}, num_parts, max_steps, directed=False,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        resume=resume,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


# ---------------------------------------------------------------------------
def cc_dataset(edges_ds, max_iters: int = 60):
    """Pure-Dataset hash-min components: groupby-min message exchange per
    iteration, no actors (the SURVEY §4.3 Dataset-only path; same semantics
    as the actor program, verified in tests). Edges are symmetrized by the
    caller. Returns Dataset(vid:int64, component:int64)."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    def _i64(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch["src"].to_numpy().astype(np.uint64).view(np.int64),
                "dst": batch["dst"].to_numpy().astype(np.uint64).view(np.int64),
            }
        )

    edges = edges_ds.map_batches(_i64, batch_format="pyarrow").materialize()

    def _verts(t: pa.Table) -> pa.Table:
        v = np.unique(t["src"].to_numpy())
        return pa.table({"vid": v, "comp": v})

    labels = (
        edges.map_batches(_verts, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Min("comp", alias_name="comp"))
        .materialize()
    )
    np_join = max(2, min(16, labels.count() // 50_000 + 2))

    for _ in range(max_iters):
        src_lab = labels.map_batches(
            lambda t: pa.table({"src": t["vid"], "scomp": t["comp"]}),
            batch_format="pyarrow",
        )
        prop = edges.join(src_lab, "inner", np_join, on=("src",))

        def _pre_min(t: pa.Table) -> pa.Table:  # in-batch combiner
            dst = t["dst"].to_numpy()
            c = t["scomp"].to_numpy()
            order = np.argsort(dst, kind="stable")
            u, starts = np.unique(dst[order], return_index=True)
            return pa.table({"vid": u, "m": np.minimum.reduceat(c[order], starts)})

        incoming = (
            prop.map_batches(_pre_min, batch_format="pyarrow")
            .groupby("vid")
            .aggregate(Min("m", alias_name="m"))
        )
        joined = labels.join(incoming, "left_outer", np_join, on=("vid",))

        def _merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            comp = t["comp"].to_numpy()
            # integer-preserving null fill — comp values are 64-bit hash bits,
            # a float round-trip would corrupt anything above 2^53
            m = pc.fill_null(t["m"], np.iinfo(np.int64).max).to_numpy()
            new = np.minimum(comp, m)
            return pa.table(
                {"vid": t["vid"], "comp": new, "chg": (new != comp).astype(np.int64)}
            )

        merged = joined.map_batches(_merge, batch_format="pyarrow").materialize()
        changed = merged.sum("chg")
        labels = merged.select_columns(["vid", "comp"]).materialize()
        if not changed:
            break

    return labels.map_batches(
        lambda t: pa.table({"vid": t["vid"], "component": t["comp"]}),
        batch_format="pyarrow",
    )


def pagerank_dataset(edges_ds, iters: int = 5, damping: float = 0.85):
    """Pure-Dataset PageRank (no actors): per-iteration groupby shuffles.

    Semantics identical to the actor path on graphs whose every vertex has
    outdegree ≥ 1 (no dangling mass) — which holds for symmetrized edge
    tables; the DuckDB oracle in ``__ray_entry__.oracle_sql`` replays exactly
    this recurrence. Returns Dataset(vid:uint64, pr:float64 rounded 1e-8).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    # int64 vids throughout this path: Dataset joins need matching key types
    # across groupby outputs (int64) and DuckDB's BIGINT — same 64 bits.
    def _to_i64(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch["src"].to_numpy().astype(np.uint64).view(np.int64),
                "dst": batch["dst"].to_numpy().astype(np.uint64).view(np.int64),
            }
        )

    from ray.data.aggregate import Count

    # distinct edge set (the CSR build dedups too, build_csr dedup=True)
    edges = (
        edges_ds.map_batches(_to_i64, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["src", "dst"])
        .materialize()
    )

    # out-degree per src (one shuffle, reused): Dataset(vid, outdeg)
    def _deg_partial(batch: pa.Table) -> pa.Table:
        src, cnt = np.unique(batch["src"].to_numpy(), return_counts=True)
        return pa.table({"vid": src, "cnt": cnt.astype(np.int64)})

    deg = (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("cnt", alias_name="outdeg"))
        .materialize()
    )
    n = deg.count()

    # ranks live as a Dataset(vid, pr); contributions via co-groupby on vid
    ranks = deg.map_batches(
        lambda t: pa.table({"vid": t["vid"], "pr": np.full(t.num_rows, 1.0 / n)}),
        batch_format="pyarrow",
    ).materialize()

    np_join = max(2, min(32, n // 10_000 + 2))
    for _ in range(iters):
        # join ranks+outdeg to edges by src: tag and union, group by vid
        r = ranks.join(deg, "inner", np_join, on=("vid",))

        def _rate(t: pa.Table) -> pa.Table:
            return pa.table(
                {"src": t["vid"], "rate": t["pr"].to_numpy() / t["outdeg"].to_numpy()}
            )

        rates = r.map_batches(_rate, batch_format="pyarrow")
        contrib = edges.join(rates, "inner", np_join, on=("src",))

        def _pre(t: pa.Table) -> pa.Table:  # in-batch combiner before the groupby
            dst = t["dst"].to_numpy()
            rate = t["rate"].to_numpy()
            u, inv = np.unique(dst, return_inverse=True)
            return pa.table({"vid": u, "c": np.bincount(inv, weights=rate)})

        insum = contrib.map_batches(_pre, batch_format="pyarrow").groupby("vid").aggregate(
            Sum("c", alias_name="insum")
        )
        base = (1.0 - damping) / n
        joined = deg.join(insum, "left_outer", np_join, on=("vid",))

        def _apply(t: pa.Table) -> pa.Table:
            s = t["insum"].to_numpy(zero_copy_only=False)
            s = np.where(np.isnan(s), 0.0, s)
            return pa.table({"vid": t["vid"], "pr": base + damping * s})

        ranks = joined.map_batches(_apply, batch_format="pyarrow").materialize()

    def _round(t: pa.Table) -> pa.Table:
        return pa.table({"vid": t["vid"], "pr": round_half_away(t["pr"].to_numpy(), 8)})

    return ranks.map_batches(_round, batch_format="pyarrow")


def neighbor_sample(edges_ds, k: int = 5, num_buckets: int = 32):
    """Degree-capped neighbor sampling — the GNN mini-batch fanout primitive
    (GraphSAGE-style, Hamilton et al. 2017): for every source vertex keep at
    most ``k`` neighbors, chosen by a DETERMINISTIC per-edge hash so the
    sample is reproducible at any parallelism and SQL-checkable (no RNG):

        h(src, dst) = ((src·2²¹ + dst) mod 2³¹) · 2654435761 mod 2³¹

    (the Knuth multiplicative hash on a 2³¹ ring; all intermediates < 2⁶³
    *for vids < 2²¹* — the co-purchase partkey range; url-hash-scale vids
    wrap identically on the engine side (numpy mod-2⁶⁴) but would overflow
    a BIGINT oracle, so re-shift the packing for wider key spaces). Rank =
    position in (h ASC, dst ASC) order — a total order, so the cut at
    ``k`` is exact.

    → Dataset(src:int64, dst:int64, rnk:int64), rnk ∈ [1, k].

    Scale shape — partial-top-k combiner BEFORE the shuffle: each batch
    pre-cuts to its own k smallest (h, dst) per src (global top-k ⊆ union
    of per-batch top-k), so the exchange carries ≤ k rows per (src, batch)
    — a hub with 10⁷ neighbors ships k·(blocks it spans) rows, not 10⁷.
    One hash(src)-bucketed groupby then ranks each bucket with a single
    lexsort (vectorized across ALL its srcs — no per-vertex callbacks).
    """
    ring = np.int64(1) << 31
    shift = np.int64(1) << 21
    knuth = np.int64(2654435761)

    def _rank_segments(src, h, dst):
        """0-based rank of each edge within its src by (h, dst) order."""
        order = np.lexsort((dst, h, src))
        s = src[order]
        first = np.concatenate([[True], s[1:] != s[:-1]])
        start = np.maximum.accumulate(np.where(first, np.arange(len(s)), 0))
        return order, np.arange(len(s)) - start

    def _precut(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy().astype(np.uint64).view(np.int64)
        dst = t["dst"].to_numpy().astype(np.uint64).view(np.int64)
        h = ((src * shift + dst) % ring * knuth) % ring
        order, seg = _rank_segments(src, h, dst)
        keep = order[seg < k]
        return pa.table(
            {
                "b": (src[keep] % num_buckets).astype(np.int32),
                "src": src[keep],
                "dst": dst[keep],
                "h": h[keep],
            }
        )

    def _rank_bucket(g: pa.Table) -> pa.Table:
        src = g["src"].to_numpy()
        dst = g["dst"].to_numpy()
        h = g["h"].to_numpy()
        order, seg = _rank_segments(src, h, dst)
        keep = seg < k
        return pa.table(
            {
                "src": src[order][keep],
                "dst": dst[order][keep],
                "rnk": (seg[keep] + 1).astype(np.int64),
            }
        )

    return (
        edges_ds.map_batches(_precut, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_rank_bucket, batch_format="pyarrow")
    )


def hyperball(edges_or_engine, radius: int = 2, p: int = 8, num_parts: int = 8):
    """HyperBall approximate neighborhood function over the symmetrized edge
    set → (table(vid, reg_sum, reg_zeros, nf_est), lineage). See
    ``HyperBallProgram`` — registers are SQL-bit-exact; ``nf_est`` is the
    HLL ball-size estimate (probabilistic, pytest-checked vs exact BFS)."""
    eng, lineage, own = _run(
        edges_or_engine, "hyperball", {"radius": radius, "p": p},
        num_parts, radius + 3, directed=False,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def ktruss(edges_ds, k: int = 4, num_buckets: int = 32, max_rounds: int = 30):
    """k-truss decomposition — the surviving edge set after iteratively
    peeling every edge in fewer than ``k − 2`` triangles (the EDGE analogue
    of the ``kcore`` vertex program; Cohen 2008, public)
    → (Dataset(src, dst) canonical ``src < dst``, rounds_run).

    Pure Dataset path, three bucketed shuffles per round, no actors:

    1. ORIENT once (not per round): edges directed low→high by (initial
       degree, vid) — a total order, so any surviving subset stays acyclic
       and each triangle is generated exactly once from its lightest
       vertex: wedge work is Σ outdeg² = O(E^1.5), the same bound the
       triangle program uses.
    2. per round — WEDGES: one ``map_groups`` per src-hash bucket expands
       each vertex's out-neighbor pairs (lexsort + segment expansion, no
       per-vertex Python); CLOSE: wedges and edge-existence rows meet in a
       key-hash bucket (same-schema union), matched wedges emit all three
       edge keys with in-group ``np.unique`` partial counts; SUPPORT →
       FILTER: counts fold by key and edges with support < k−2 drop.
    3. stop when no edge dropped (or ``max_rounds``).

    Packed int64 edge keys assume vids < 2²¹ (the co-purchase partkey
    range — same packing as ``copurchase_edges``).

    Library operator, not a driver query: peeling needs ~O(k) rounds × 3
    all-to-all exchanges, and on this sandbox's Ray build each exchange
    pays the documented ~seconds-scale shuffle-orchestration floor
    (BENCH/STATS.md) regardless of data size — at sf0.01 the floor alone
    exceeds the driver's per-query budget while actual compute is
    milliseconds.  At real scale the floor amortizes; correctness is
    pinned by ``test_ktruss_vs_brute_peeling`` (planted-clique fixpoint
    parity against single-process peeling).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..state.csr import flat_gather

    SHIFT = np.int64(1) << np.int64(21)
    thresh = k - 2

    def _canon_i64(batch: pa.Table) -> pa.Table:
        u = batch["src"].to_numpy().astype(np.uint64).view(np.int64)
        v = batch["dst"].to_numpy().astype(np.uint64).view(np.int64)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        keep = lo != hi
        key = lo[keep] * SHIFT + hi[keep]
        return pa.table({"key": np.unique(key)})

    # canonical distinct edges (u < v) as packed keys
    canon = (
        edges_ds.map_batches(_canon_i64, batch_format="pyarrow")
        .groupby("key")
        .count()
        .select_columns(["key"])
        .materialize()
    )

    # initial degree over the canonical set → orientation rank (deg, vid)
    def _deg_partial(t: pa.Table) -> pa.Table:
        keys = t["key"].to_numpy()
        vids = np.concatenate([keys // SHIFT, keys % SHIFT])
        u, c = np.unique(vids, return_counts=True)
        return pa.table({"vid": u, "c": c.astype(np.int64)})

    deg_ds = (
        canon.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("c", alias_name="deg"))
        .materialize()
    )
    # per-vertex degree is |V|-sized: ship it through the same bucket
    # exchange as the edges (side rows), never broadcast.
    def _edge_side(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        u = key // SHIFT
        return pa.table(
            {
                "b": (u % num_buckets).astype(np.int32),
                "side": np.zeros(len(key), np.int8),
                "key": key,
                "vid": u,
                "deg": np.zeros(len(key), np.int64),
            }
        )

    def _deg_side(t: pa.Table) -> pa.Table:
        vid = t["vid"].to_numpy()
        return pa.table(
            {
                "b": (vid % num_buckets).astype(np.int32),
                "side": np.ones(len(vid), np.int8),
                "key": np.zeros(len(vid), np.int64),
                "vid": vid,
                "deg": t["deg"].to_numpy().astype(np.int64),
            }
        )

    def _orient_u(g: pa.Table) -> pa.Table:
        """Attach deg(u) to each edge (bucketed by u)."""
        side = g["side"].to_numpy()
        vid = g["vid"].to_numpy()
        deg = g["deg"].to_numpy()
        dv, dd = vid[side == 1], deg[side == 1]
        order = np.argsort(dv)
        dv, dd = dv[order], dd[order]
        e = side == 0
        key = g["key"].to_numpy()[e]
        u = vid[e]
        pos = np.searchsorted(dv, u)
        du = dd[np.minimum(pos, max(len(dv) - 1, 0))]
        return pa.table(
            {
                "b": ((key % SHIFT) % num_buckets).astype(np.int32),
                "side": np.zeros(len(key), np.int8),
                "key": key,
                "vid": key % SHIFT,  # now bucket by v for deg(v)
                "deg": du,  # deg(u) piggybacks in the deg column
            }
        )

    def _orient_v(g: pa.Table) -> pa.Table:
        """Attach deg(v), emit oriented (src, dst) by (deg, vid) order."""
        side = g["side"].to_numpy()
        vid = g["vid"].to_numpy()
        deg = g["deg"].to_numpy()
        dv, dd = vid[side == 1], deg[side == 1]
        order = np.argsort(dv)
        dv, dd = dv[order], dd[order]
        e = side == 0
        key = g["key"].to_numpy()[e]
        du = deg[e]
        v = vid[e]
        pos = np.searchsorted(dv, v)
        dvv = dd[np.minimum(pos, max(len(dv) - 1, 0))]
        u = key // SHIFT
        u_first = (du < dvv) | ((du == dvv) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        return pa.table({"src": src, "dst": dst})

    oriented = (
        canon.map_batches(_edge_side, batch_format="pyarrow")
        .union(deg_ds.map_batches(_deg_side, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_orient_u, batch_format="pyarrow")
        .union(deg_ds.map_batches(_deg_side, batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_orient_v, batch_format="pyarrow")
        .materialize()
    )
    n_edges = oriented.count()

    def _wedge_bucket(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        return t.append_column("b", pa.array((src % num_buckets).astype(np.int32)))

    def _wedges(g: pa.Table) -> pa.Table:
        """Per-src out-neighbor pairs → (b2, side=1, chk, e1, e2)."""
        src = g["src"].to_numpy()
        dst = g["dst"].to_numpy()
        order = np.lexsort((dst, src))
        s, d = src[order], dst[order]
        first = np.concatenate([[True], s[1:] != s[:-1]])
        starts = np.flatnonzero(first)
        counts = np.diff(np.concatenate([starts, [len(s)]]))
        cpe = np.repeat(counts, counts)
        left = np.repeat(d, cpe)
        anchor = np.repeat(s, cpe)
        right = d[flat_gather(np.repeat(starts, counts), cpe)]
        m = left < right  # each unordered out-pair once
        la, ra, aa = left[m], right[m], anchor[m]
        chk = la * SHIFT + ra
        e1 = np.minimum(aa, la) * SHIFT + np.maximum(aa, la)
        e2 = np.minimum(aa, ra) * SHIFT + np.maximum(aa, ra)
        return pa.table(
            {
                "b2": (chk % num_buckets).astype(np.int32),
                "side": np.ones(len(chk), np.int8),
                "chk": chk,
                "e1": e1,
                "e2": e2,
            }
        )

    def _exists_rows(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        key = np.minimum(src, dst) * SHIFT + np.maximum(src, dst)
        return pa.table(
            {
                "b2": (key % num_buckets).astype(np.int32),
                "side": np.zeros(len(key), np.int8),
                "chk": key,
                "e1": np.zeros(len(key), np.int64),
                "e2": np.zeros(len(key), np.int64),
            }
        )

    def _close(g: pa.Table) -> pa.Table:
        """Match wedges to existing edges; emit per-key triangle-count
        PARTIALS already bucketed by key hash (b3) so the filter groupby
        can fold them in-group — one fewer shuffle per round."""
        side = g["side"].to_numpy()
        chk = g["chk"].to_numpy()
        ex = np.unique(chk[side == 0])
        w = side == 1
        empty = pa.table(
            {
                "b3": pa.array([], pa.int32()),
                "side": pa.array([], pa.int8()),
                "key": pa.array([], pa.int64()),
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "support": pa.array([], pa.int64()),
            }
        )
        if not w.any() or len(ex) == 0:
            return empty
        wc = chk[w]
        pos = np.minimum(np.searchsorted(ex, wc), len(ex) - 1)
        hit = ex[pos] == wc
        tri_keys = np.concatenate(
            [wc[hit], g["e1"].to_numpy()[w][hit], g["e2"].to_numpy()[w][hit]]
        )
        u, c = np.unique(tri_keys, return_counts=True)
        return pa.table(
            {
                "b3": (u % num_buckets).astype(np.int32),
                "side": np.ones(len(u), np.int8),
                "key": u,
                "src": np.zeros(len(u), np.int64),
                "dst": np.zeros(len(u), np.int64),
                "support": c.astype(np.int64),
            }
        )

    def _edge_rows(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        key = np.minimum(src, dst) * SHIFT + np.maximum(src, dst)
        return pa.table(
            {
                "b3": (key % num_buckets).astype(np.int32),
                "side": np.zeros(len(key), np.int8),
                "key": key,
                "src": src,
                "dst": dst,
                "support": np.zeros(len(key), np.int64),
            }
        )

    def _filter(g: pa.Table) -> pa.Table:
        """Fold support partials per key in-group, keep edges ≥ k-2."""
        side = g["side"].to_numpy()
        key = g["key"].to_numpy()
        sup_rows = side == 1
        sup_k, code = np.unique(key[sup_rows], return_inverse=True)
        sup_v = np.zeros(len(sup_k), dtype=np.int64)
        np.add.at(sup_v, code, g["support"].to_numpy()[sup_rows])
        e = side == 0
        ek = key[e]
        if len(sup_k):
            pos = np.minimum(np.searchsorted(sup_k, ek), len(sup_k) - 1)
            sup = np.where(sup_k[pos] == ek, sup_v[pos], 0)
        else:
            sup = np.zeros(len(ek), dtype=np.int64)
        keep = sup >= thresh
        return pa.table(
            {"src": g["src"].to_numpy()[e][keep], "dst": g["dst"].to_numpy()[e][keep]}
        )

    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        support_partials = (
            oriented.map_batches(_wedge_bucket, batch_format="pyarrow")
            .groupby("b")
            .map_groups(_wedges, batch_format="pyarrow")
            .union(oriented.map_batches(_exists_rows, batch_format="pyarrow"))
            .groupby("b2")
            .map_groups(_close, batch_format="pyarrow")
        )
        oriented = (
            oriented.map_batches(_edge_rows, batch_format="pyarrow")
            .union(support_partials)
            .groupby("b3")
            .map_groups(_filter, batch_format="pyarrow")
            .materialize()
        )
        n_new = oriented.count()
        if n_new == n_edges:
            break
        n_edges = n_new

    def _to_canon(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        return pa.table(
            {"src": np.minimum(src, dst), "dst": np.maximum(src, dst)}
        )

    return oriented.map_batches(_to_canon, batch_format="pyarrow"), rounds


def condensation_levels(sf_dir: str, num_parts: int = 8,
                        num_buckets: int = 64):
    """Topological LEVELS of the SCC condensation of the directed
    part-successor graph → pa.table(scc, level): collapse each strongly
    connected component to one node (the condensation is a DAG by
    construction), then level(C) = longest directed path ending at C —
    the critical-path / scheduling-depth layering of the cycle-free
    macro-structure (what "how deep is this dependency graph really"
    asks once cycles are squashed).

    Composition: SCCProgram (min-label FW-BW peeling) → per-batch
    vid→scc relabel of the edge stream (the scc map rides ``ray.put``
    + searchsorted — same broadcast budget as the scc result itself;
    at vertex counts where that map outgrows the driver, swap the
    relabel for two bucketed label joins) → per-batch np.unique partial
    dedup + ONE bucket groupby global distinct → DagLevelProgram
    (max-propagation Bellman-Ford along forward flags; converges in
    longest-path+1 supersteps BECAUSE the condensation is acyclic)."""
    import ray

    from ..pipelines.relational import succ_edges

    sc, _ = scc(succ_edges(sf_dir), num_parts=num_parts)
    vids = sc["vid"].to_numpy().astype(np.int64)
    lbl = sc["scc"].to_numpy().astype(np.int64)
    order = np.argsort(vids)
    ref = ray.put((vids[order], lbl[order]))
    B = np.int64(num_buckets)

    def _relabel(t: pa.Table) -> pa.Table:
        v, s = ray.get(ref)
        src = t["src"].to_numpy().astype(np.int64)
        dst = t["dst"].to_numpy().astype(np.int64)
        cs = s[np.searchsorted(v, src)]
        cd = s[np.searchsorted(v, dst)]
        keep = cs != cd
        if max(int(cs.max(initial=0)), int(cd.max(initial=0))) >= (1 << 31):
            raise ValueError("condensation_levels: scc id exceeds 31-bit pack")
        key = np.unique(cs[keep] << np.int64(31) | cd[keep])
        return pa.table(
            {"key": key, "b": (key % B).astype(np.int32)}
        )

    def _distinct(g: pa.Table) -> pa.Table:
        key = np.unique(g["key"].to_numpy())
        return pa.table(
            {"src": key >> np.int64(31),
             "dst": key & np.int64((1 << 31) - 1)}
        )

    cedges = (
        succ_edges(sf_dir)
        .map_batches(_relabel, batch_format="pyarrow")
        .groupby("b").map_groups(_distinct, batch_format="pyarrow")
    )
    eng, lineage, own = _run(
        _flag_symmetrize(cedges), "dag_level", {}, num_parts,
        max_steps=500, directed=True,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    # isolated SCCs (no condensed edge touches them) never enter the
    # engine's vertex set — they are level 0 by definition
    seen = out["vid"].to_numpy().astype(np.int64)
    lev = out["level"].to_numpy().astype(np.int64)
    allc = np.unique(lbl)
    missing = allc[~np.isin(allc, seen)]
    return pa.table(
        {
            "scc": np.concatenate([seen, missing]),
            "level": np.concatenate([lev, np.zeros(len(missing), np.int64)]),
        }
    ).sort_by("scc")


def ltm_cascade(edges_or_engine, seed_mod: int = 13, num: int = 1,
                den: int = 8, num_parts: int = 8, max_steps: int = 200):
    """Deterministic linear-threshold influence cascade over a
    SYMMETRIZED edge Dataset → (pa.table(vid, activated_round), lineage);
    −1 = never activated. See ``LinearThresholdProgram`` (Kempe,
    Kleinberg & Tardos KDD'03 with a fixed uniform θ = num/den, exact —
    no Monte-Carlo): seeds are ``vid % seed_mod == 0``; monotone, so the
    run converges when a round fires nothing."""
    eng, lineage, own = _run(
        edges_or_engine, "ltm",
        {"seed_mod": seed_mod, "num": num, "den": den},
        num_parts, max_steps, directed=False,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, lineage


def attack_tolerance(sf_dir: str, ks=(0, 2, 4, 6, 8), num_parts: int = 4):
    """Targeted-attack robustness curve (Albert, Jeong & Barabási 2000,
    "Error and attack tolerance of complex networks"): remove the top-k
    highest-degree hubs from the symmetrized part-successor graph and
    re-measure connectivity after each cut → pa.table(k_removed,
    n_vertices, n_components, giant_size) over the edge-induced
    subgraph. The scale-free signature: hub removal fragments a
    power-law graph far faster than random failure.

    Composition: degrees fold from ONE groupby pass; the ≤ max(ks) hub
    list (deg DESC, vid ASC — total order) broadcasts; each k is an
    edge-stream filter (stateless map_batches against the tiny hub set)
    feeding a fresh ConnectedComponentsProgram run; component stats fold
    per run. max(ks)+1 BSP runs total — the curve is the deliverable, so
    the repeats ARE the workload, each over a strictly smaller graph."""
    import ray
    from ray.data.aggregate import Sum

    from ..pipelines.build_graph import symmetrize
    from ..pipelines.relational import succ_edges

    sym = symmetrize(succ_edges(sf_dir))

    def _pairs(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy().astype(np.int64)
        dst = t["dst"].to_numpy().astype(np.int64)
        if len(src) and (int(src.max()) >= (1 << 22) or int(dst.max()) >= (1 << 22)):
            raise ValueError("attack_tolerance: vid exceeds the 22-bit pack")
        # succ_edges leaves cross-batch duplicates for the consumer: dedup
        # per batch here, globally in the src-owning bucket below
        key = np.unique(src << np.int64(22) | dst)
        return pa.table(
            {"key": key, "b": ((key >> np.int64(22)) % 32).astype(np.int32)}
        )

    def _degs(g: pa.Table) -> pa.Table:
        key = np.unique(g["key"].to_numpy())
        u, c = np.unique(key >> np.int64(22), return_counts=True)
        return pa.table({"v": u, "dg": c.astype(np.int64)})

    deg = (
        sym.map_batches(_pairs, batch_format="pyarrow")
        .groupby("b").map_groups(_degs, batch_format="pyarrow")
        .to_pandas()
    )
    deg = deg.sort_values(["dg", "v"], ascending=[False, True])
    hubs = deg["v"].to_numpy(np.int64)[: max(ks)]

    rows = []
    for k in ks:
        hset = np.sort(hubs[:k])

        def _filter(t: pa.Table, hs=hset) -> pa.Table:
            src = t["src"].to_numpy().astype(np.int64)
            dst = t["dst"].to_numpy().astype(np.int64)
            keep = ~(np.isin(src, hs) | np.isin(dst, hs))
            return pa.table({"src": src[keep], "dst": dst[keep]})

        filtered = sym.map_batches(_filter, batch_format="pyarrow")
        res, _ = connected_components(filtered, num_parts=num_parts)
        comp = res["component"].to_numpy()
        _, counts = np.unique(comp, return_counts=True)
        rows.append(
            (int(k), len(comp), len(counts), int(counts.max()))
        )
    k_, v_, c_, g_ = zip(*rows)
    return pa.table(
        {
            "k_removed": np.asarray(k_, np.int64),
            "n_vertices": np.asarray(v_, np.int64),
            "n_components": np.asarray(c_, np.int64),
            "giant_size": np.asarray(g_, np.int64),
        }
    )


def graph_summary(edges_ds, round_to: int = 6):
    """ONE-row macro census of a symmetrized edge Dataset → (n_vertices,
    n_edges, avg_degree, max_degree, density): the first table any graph
    job prints (and the sizing input for every partitioning decision —
    avg_degree prices a superstep's exchange, max_degree flags hub skew,
    density picks matcher plan order). n_edges counts UNDIRECTED pairs
    (= symmetrized rows / 2).

    Scale shape: ONE groupby(src)-count pass folds the degree table
    (|V| rows) to three-int partials per batch (count, sum, max) —
    the driver folds a ≤#blocks-row table; both ratios are single IEEE
    divisions of exact int64s, rounded half-away."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def _deg(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        u, c = np.unique(src, return_counts=True)
        return pa.table({"vid": u, "d": c.astype(np.int64)})

    def _fold(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy()
        return pa.table(
            {
                "nv": pa.array([len(d)], pa.int64()),
                "ds": pa.array([int(d.sum())], pa.int64()),
                "dm": pa.array([int(d.max()) if len(d) else 0], pa.int64()),
            }
        )

    deg = (
        edges_ds.map_batches(_deg, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("d", alias_name="d"))
    )
    f = deg.map_batches(_fold, batch_format="pyarrow").to_pandas()
    nv = int(f["nv"].sum())
    ds_ = int(f["ds"].sum())
    dm = int(f["dm"].max()) if len(f) else 0
    ne = ds_ // 2
    avg = float(round_half_away(np.float64(ds_) / np.float64(nv), round_to)) if nv else 0.0
    dens = (
        float(
            round_half_away(
                np.float64(ds_) / np.float64(nv * (nv - 1)), round_to
            )
        )
        if nv > 1
        else 0.0
    )
    return pa.table(
        {
            "n_vertices": pa.array([nv], pa.int64()),
            "n_edges": pa.array([ne], pa.int64()),
            "avg_degree": pa.array([avg], pa.float64()),
            "max_degree": pa.array([dm], pa.int64()),
            "density": pa.array([dens], pa.float64()),
        }
    )


def transitivity(edges_ds, num_parts: int = 4, round_to: int = 6):
    """Global clustering coefficient (transitivity) of a symmetrized edge
    Dataset → ONE row (n_wedges, n_triangles, transitivity = 3T / W with
    W = Σ_v C(d_v, 2)) — the Watts–Strogatz global companion to the
    per-vertex ``clustering_coeff`` table: one number separating
    community-structured graphs (high) from degree-matched random ones
    (low ~ d̄/n).

    Scale shape: the wedge sum folds from the same ONE degree groupby as
    :func:`graph_summary` (int64-exact: degrees < 2³² make d·(d−1)/2
    safe); the triangle count is the engine's BSP
    :func:`triangle_count`; ONE IEEE division at the end."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def _deg(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        u, c = np.unique(src, return_counts=True)
        return pa.table({"vid": u, "d": c.astype(np.int64)})

    def _wedges(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy()
        return pa.table(
            {"w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64())}
        )

    w = int(
        edges_ds.map_batches(_deg, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("d", alias_name="d"))
        .map_batches(_wedges, batch_format="pyarrow")
        .to_pandas()["w"]
        .sum()
    )
    tri, _, _ = triangle_count(edges_ds, num_parts=num_parts)
    t3 = 3 * int(tri)
    val = float(round_half_away(np.float64(t3) / np.float64(w), round_to)) if w else 0.0
    return pa.table(
        {
            "n_wedges": pa.array([w], pa.int64()),
            "n_triangles": pa.array([int(tri)], pa.int64()),
            "transitivity": pa.array([val], pa.float64()),
        }
    )


def boruvka_mst(wedges_ds, max_rounds: int = 40, jump_iters: int = 40):
    """Borůvka minimum spanning forest (the canonical Pregel-beyond-PageRank
    algorithm; Chung & Condon 1996 give the parallel form) over an
    undirected weighted edge table Dataset(src, dst, w) with canonical
    src < dst rows → Dataset(src, dst, w) of forest edges.

    Determinism: edges are totally ordered by (w, src, dst), so each
    component's minimum outgoing edge is unique and the result equals
    Kruskal under the same order — brute-force-testable and SQL-unrollable.

    Scale shape (pure Dataset ops, no driver materialization of any
    unbounded table): per round, TWO label joins annotate edges with
    endpoint components; per-component minimum selection is a
    ``groupby(comp).map_groups`` lexicographic pick; the picked edges form
    a functional pseudo-forest whose only cycles are 2-cycles on mutual
    picks (broken toward the smaller id), resolved by POINTER JUMPING —
    parent ← parent∘parent, O(log depth) Dataset self-joins with an
    early-exit change count; labels re-join through the resolved roots.
    Components at least halve per round (Borůvka's invariant), so rounds ≤
    log₂V at any scale. At 100 TB the per-round cost is the two bucketed
    edge-label joins — the honest price of distributed MSF."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    def _canon(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": t["src"].to_numpy().astype(np.uint64).view(np.int64),
                "v": t["dst"].to_numpy().astype(np.uint64).view(np.int64),
                "w": t["w"].to_numpy().astype(np.int64),
            }
        )

    edges = wedges_ds.map_batches(_canon, batch_format="pyarrow").materialize()

    def _jready(ds):
        """Join-operand normalization: repartition collapses the empty
        schema-less partitions that groupby/map_groups chains produce on
        this Ray build and which the acero hash join rejects (the
        _verify_pairs_exact caveat), then materialize so each join reads
        a concrete, schema-bearing table."""
        return ds.repartition(npj).materialize()

    def _verts(t: pa.Table) -> pa.Table:
        vid = np.unique(np.concatenate([t["u"].to_numpy(), t["v"].to_numpy()]))
        return pa.table({"vid": vid, "comp": vid})

    labels = (
        edges.map_batches(_verts, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Min("comp", alias_name="comp"))
        .materialize()
    )
    npj = 4
    picked_rounds = []

    for _ in range(max_rounds):
        lu = labels.map_batches(
            lambda t: pa.table({"u": t["vid"], "cu": t["comp"]}),
            batch_format="pyarrow",
        )
        lv = labels.map_batches(
            lambda t: pa.table({"v": t["vid"], "cv": t["comp"]}),
            batch_format="pyarrow",
        )
        ann = edges.join(_jready(lu), "inner", npj, on=("u",)).join(
            _jready(lv), "inner", npj, on=("v",)
        )

        def _cross2(t: pa.Table) -> pa.Table:
            cu = t["cu"].to_numpy()
            cv = t["cv"].to_numpy()
            m = cu != cv
            u, v, w = (
                t["u"].to_numpy()[m],
                t["v"].to_numpy()[m],
                t["w"].to_numpy()[m],
            )
            cu, cv = cu[m], cv[m]
            return pa.table(
                {
                    "comp": np.concatenate([cu, cv]),
                    "oc": np.concatenate([cv, cu]),
                    "w": np.concatenate([w, w]),
                    "u": np.concatenate([u, u]),
                    "v": np.concatenate([v, v]),
                }
            )

        cand = ann.map_batches(_cross2, batch_format="pyarrow").materialize()
        if cand.count() == 0:
            break

        def _pick_min(g: pa.Table) -> pa.Table:
            i = int(
                np.lexsort(
                    (g["v"].to_numpy(), g["u"].to_numpy(), g["w"].to_numpy())
                )[0]
            )
            return g.take(pa.array([i]))

        picked = (
            cand.groupby("comp")
            .map_groups(_pick_min, batch_format="pyarrow")
            .materialize()
        )
        picked_rounds.append(
            picked.map_batches(
                lambda t: pa.table(
                    {"u": t["u"], "v": t["v"], "w": t["w"]}
                ),
                batch_format="pyarrow",
            )
        )

        # parent pointers with 2-cycle break toward the smaller id
        # (repartition: collapse map_groups' empty schema-less partitions
        # before this table reaches a join — the _verify_pairs_exact caveat)
        par = (
            picked.map_batches(
                lambda t: pa.table({"c": t["comp"], "p": t["oc"]}),
                batch_format="pyarrow",
            )
            .repartition(npj)
            .materialize()
        )

        def _self_rows(t: pa.Table) -> pa.Table:
            # comps with no outgoing pick keep parent = self
            return pa.table({"c": t["comp"], "p_self": t["comp"]})

        allc = (
            labels.map_batches(
                lambda t: pa.table({"comp": np.unique(t["comp"].to_numpy())}),
                batch_format="pyarrow",
            )
            .groupby("comp")
            .aggregate(Min("comp", alias_name="x"))
            .map_batches(_self_rows, batch_format="pyarrow")
            # repartition collapses the aggregate's empty schema-less
            # partitions, which this Ray build's acero join rejects (the
            # _verify_pairs_exact caveat)
            .repartition(npj)
            .materialize()
        )
        def _fill_self(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # integer-preserving null fill (comp ids are int64; a pandas
            # round-trip would go through float64 — the cc_dataset caveat)
            p = pc.fill_null(t["p"], -1).to_numpy()
            return pa.table(
                {
                    "c": t["c"],
                    "p": np.where(p == -1, t["p_self"].to_numpy(), p),
                }
            )

        par = _jready(
            allc.join(par, "left_outer", npj, on=("c",)).map_batches(
                _fill_self, batch_format="pyarrow"
            )
        )

        gp = par.map_batches(
            lambda t: pa.table({"p": t["c"], "gp": t["p"]}),
            batch_format="pyarrow",
        )
        par = _jready(
            par.join(_jready(gp), "inner", npj, on=("p",)).map_batches(
                lambda t: pa.table(
                    {
                        "c": t["c"],
                        "p": np.where(
                            (t["gp"].to_numpy() == t["c"].to_numpy())
                            & (t["c"].to_numpy() < t["p"].to_numpy()),
                            t["c"].to_numpy(),
                            t["p"].to_numpy(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )

        for _ in range(jump_iters):
            pj = par.map_batches(
                lambda t: pa.table({"p": t["c"], "pp": t["p"]}),
                batch_format="pyarrow",
            )
            nxt = (
                par.join(_jready(pj), "inner", npj, on=("p",))
                .map_batches(
                    lambda t: pa.table(
                        {
                            "c": t["c"],
                            "p": t["pp"],
                            "chg": (
                                t["pp"].to_numpy() != t["p"].to_numpy()
                            ).astype(np.int64),
                        }
                    ),
                    batch_format="pyarrow",
                )
                .materialize()
            )
            changed = nxt.sum("chg")
            par = _jready(nxt.select_columns(["c", "p"]))
            if not changed:
                break

        root = par.map_batches(
            lambda t: pa.table({"comp": t["c"], "root": t["p"]}),
            batch_format="pyarrow",
        )
        labels = _jready(
            _jready(labels).join(_jready(root), "inner", npj, on=("comp",))
            .map_batches(
                lambda t: pa.table({"vid": t["vid"], "comp": t["root"]}),
                batch_format="pyarrow",
            )
        )

    if not picked_rounds:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        )
    mst = picked_rounds[0]
    for p in picked_rounds[1:]:
        mst = mst.union(p)

    # dedupe (an edge is picked by both of its components in the same
    # round) — full-width multi-key groupby, no vid-width assumption
    return (
        mst.groupby(["u", "v"])
        .aggregate(Min("w", alias_name="w"))
        .map_batches(
            lambda t: pa.table(
                {"src": t["u"], "dst": t["v"], "w": t["w"]}
            ),
            batch_format="pyarrow",
        )
    )


def degree_powerlaw_mle(edges_ds, xmin: int = 5, round_to: int = 6):
    """Discrete power-law exponent of the degree distribution by MLE
    (Clauset, Shalizi & Newman 2009, eq. 3.7: α̂ = 1 + n/Σ ln(dᵢ/(xmin−½))
    over the tail dᵢ ≥ xmin) → one row (xmin, n_tail, alpha). THE webgraph
    summary statistic — α ≈ 2.1 is the canonical in-degree exponent of the
    web; a drifting α on a recrawl flags frontier skew.

    Scale shape: degrees from one groupby over the symmetrized edges, then
    per-batch (n, Σln) partials — two numbers per block cross the fold; ln
    sum-order noise ≪ the 6-decimal round (doc_cross_entropy posture)."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def _dpart(t: pa.Table) -> pa.Table:
        v, c = np.unique(t["src"].to_numpy(), return_counts=True)
        return pa.table({"vid": v.astype(np.int64), "c": c.astype(np.int64)})

    deg = (
        edges_ds.map_batches(_dpart, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("c", alias_name="degree"))
    )

    def _partial(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy().astype(np.float64)
        tail = d[d >= xmin]
        return pa.table(
            {
                "n": pa.array([len(tail)], pa.int64()),
                "s": pa.array(
                    [float(np.log(tail / (xmin - 0.5)).sum())], pa.float64()
                ),
            }
        )

    parts = deg.map_batches(_partial, batch_format="pyarrow").to_pandas()
    n, s = int(parts["n"].sum()), float(parts["s"].sum())
    alpha = 1.0 + n / s if s > 0 else 0.0
    return pa.table(
        {
            "xmin": pa.array([xmin], pa.int64()),
            "n_tail": pa.array([n], pa.int64()),
            "alpha": pa.array(
                [float(round_half_away(alpha, round_to))], pa.float64()
            ),
        }
    )


def adamic_adar(sf_dir: str, num_buckets: int = 32, num_partitions: int = 8,
                round_to: int = 6, weight: str = "aa"):
    """Adamic–Adar link-prediction score (Adamic & Adar 2003) for every
    edge of the STRONG co-purchase graph → (src, dst, aa) with
    aa(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg(z)) — the frequency-weighted
    upgrade of :func:`link_prediction`'s common-neighbor count (rare hubs
    are stronger evidence than ubiquitous ones).

    Scale shape: the same hub-bucket wedge machinery as link_prediction —
    bucketing by hub colocates each hub's FULL adjacency, so deg(z) is the
    group-local row count and every wedge pair's 1/ln(deg) weight is
    emitted as an in-bucket partial; ONE groupby folds pair scores; edges
    without common neighbors keep aa = 0 through the LEFT join."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away
    from ..state.csr import flat_gather
    from .build_graph import symmetrize
    from .relational import strong_copurchase_edges

    SHIFT = np.int64(1) << np.int64(21)
    eu = strong_copurchase_edges(sf_dir).materialize()
    es = symmetrize(eu).materialize()

    def _bucket(t: pa.Table) -> pa.Table:
        d = t["dst"].to_numpy()
        return t.append_column(
            "b", pa.array((d % num_buckets).astype(np.int32))
        )

    def _wedges(g: pa.Table) -> pa.Table:
        w = g["dst"].to_numpy()
        u = g["src"].to_numpy()
        order = np.lexsort((u, w))
        w_s, u_s = w[order], u[order]
        _, starts, counts = np.unique(w_s, return_index=True, return_counts=True)
        # bucket-by-hub ⇒ counts IS deg(hub); weight each of the hub's
        # wedge pairs by 1/ln(deg)
        wt_hub = np.zeros(len(counts))
        m2 = counts >= 2
        if weight == "ra":  # resource-allocation: 1/deg (Zhou et al. 2009)
            wt_hub[m2] = 1.0 / counts[m2].astype(np.float64)
        else:               # adamic-adar: 1/ln(deg)
            wt_hub[m2] = 1.0 / np.log(counts[m2].astype(np.float64))
        cpe = np.repeat(counts, counts)
        left = np.repeat(u_s, cpe)
        right = u_s[flat_gather(np.repeat(starts, counts), cpe)]
        wpe = np.repeat(wt_hub, counts * counts)
        m = left < right
        _check_pack_width(u_s, SHIFT, "packed wedge key")
        key = left[m].astype(np.int64) * SHIFT + right[m].astype(np.int64)
        order2 = np.argsort(key, kind="stable")
        uk, kstarts = np.unique(key[order2], return_index=True)
        s = np.add.reduceat(wpe[m][order2], kstarts)
        return pa.table({"k": uk, "s": s})

    aa = (
        es.map_batches(_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(_wedges, batch_format="pyarrow")
        .groupby("k", num_partitions=num_partitions)
        .aggregate(Sum("s", alias_name="aa"))
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t["k"].to_numpy() // SHIFT,
                    "dst": t["k"].to_numpy() % SHIFT,
                    "aa": t["aa"],
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
        .materialize()
    )

    def _edge_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src"].to_numpy().astype(np.int64),
                "dst": t["dst"].to_numpy().astype(np.int64),
            }
        )

    joined = (
        eu.map_batches(_edge_rows, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
        .join(aa, "left_outer", num_partitions, on=("src", "dst"))
    )

    def _final(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.fill_null(t["aa"], 0.0).to_numpy()
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "aa": round_half_away(v, round_to),
            }
        )

    return joined.map_batches(_final, batch_format="pyarrow")
