"""Driver contract for the Ray-Data link-graph engine.

``entry()`` — flagship pipeline (co-purchase graph → actor-pool PageRank) on
sf0.001. ``queries()`` — one callable per implemented operator (SURVEY.md §2
+ the training-data operators); each takes ``sf_dir`` and returns a Dataset /
DataFrame / Arrow table. ``oracle_sql()`` — DuckDB-equivalent SQL per query
(omitted for non-SQL-expressible ops → driver records rows-only).

Ray is initialised by the driver before import; nothing here calls
``ray.init``/``ray.shutdown``. Column names and rounding match the SQL
exactly (the driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
import pyarrow as pa

SF_SMOKE = "/root/testdata/sf0.001"

PR_ITERS = 5
LPA_ITERS = 5
HITS_ITERS = 8
EMB_THRESHOLD = 0.35  # synthetic embeddings are near-orthogonal (max cos ≈ 0.51)
ANN_QUERY_IDS = [0, 1, 2, 3]
ANN_K = 5
WINDOW_SEC = 300
GAP_SEC = 600


# ---------------------------------------------------------------------------
def _sym_copurchase(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.relational import copurchase_edges

    return symmetrize(copurchase_edges(sf_dir))


def entry() -> Any:
    """Flagship: lineitem → co-purchase edge table → partitioned CSR actors →
    PageRank supersteps → per-vertex ranks (Dataset)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import pagerank

    res, _lineage = pagerank(_sym_copurchase(SF_SMOKE), iters=PR_ITERS, num_parts=4)
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vid": res["vid"].to_numpy().view(np.int64),
                "pr": round_half_away(res["rank"].to_numpy(), 8),
            }
        )
    )


# ---------------------------------------------------------------------------
def _q_copurchase_edges(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import copurchase_edges

    return copurchase_edges(sf_dir)


def _q_degree(sf_dir: str):
    from ray.data.aggregate import Sum

    edges = _sym_copurchase(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(t["src"].to_numpy(), return_counts=True)
        return pa.table({"vid": v.astype(np.int64), "c": c.astype(np.int64)})

    return (
        edges.map_batches(_partial, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("c", alias_name="degree"))
    )


def _q_pagerank(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import pagerank_dataset

    return pagerank_dataset(_sym_copurchase(sf_dir), iters=PR_ITERS)


def _q_cc(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import connected_components

    res, _ = connected_components(_sym_copurchase(sf_dir), num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "component": res["component"].to_numpy().view(np.int64),
        }
    )


def _q_sssp(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import sssp

    res, _ = sssp(_sym_copurchase(sf_dir), seed_mod=101, num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "dist": res["dist"].to_numpy().view(np.int64),
        }
    )

def _q_bfs_layer_sizes(sf_dir: str):
    """Hop-distance histogram of the multi-source BFS (sssp program):
    (dist, n_vertices), unreached = −1 — the neighborhood-growth curve
    read alongside hyperball's effective-diameter estimate."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import sssp

    res, _ = sssp(_sym_copurchase(sf_dir), seed_mod=101, num_parts=4)
    d = res["dist"].to_numpy().view(np.int64)
    u, c = np.unique(d, return_counts=True)
    return pa.table({"dist": u, "n_vertices": c.astype(np.int64)})


def _q_betweenness(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import betweenness

    res, _ = betweenness(_sym_copurchase(sf_dir), seed_mod=101, num_parts=4)
    import ray.data as rd

    return rd.from_arrow(res)



def _q_link_prediction(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import link_prediction

    return link_prediction(sf_dir)


def _q_katz(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import katz

    res, _ = katz(_sym_copurchase(sf_dir), iters=8, alpha=0.001, num_parts=4)
    import ray.data as rd

    return rd.from_arrow(res)


def _q_lpa_modularity(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import lpa_modularity

    import ray.data as rd

    return rd.from_arrow(lpa_modularity(sf_dir, iters=LPA_ITERS, num_parts=4))


def _q_eccentricity(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import eccentricity

    res, _ = eccentricity(_sym_copurchase(sf_dir), seed_mod=101, num_parts=4)
    import ray.data as rd

    return rd.from_arrow(res)


def _q_coloring(sf_dir: str):
    """Jones–Plassmann greedy coloring → (vid, color). Oracled by
    _coloring_sql(): a DuckDB recursive CTE that replays the exact JP
    fixpoint — md5|vid priorities replayed via md5_number_lower (the
    _mis_sql scheme), each recursion level colors the vertices whose
    lower-priority neighbors are all colored with the mex over those
    neighbors' colors, full state carried per level so the
    data-dependent depth (~108 levels at sf0.001) needs no unroll.
    Sequential-JP parity + properness + partition invariance also in
    tests/test_programs_local.py::test_coloring_valid_and_matches_sequential_jp."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import greedy_coloring

    res, _ = greedy_coloring(_sym_copurchase(sf_dir), num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "color": res["color"].to_numpy().astype(np.int64, copy=False),
        }
    )


def _q_rich_club(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import rich_club

    return rich_club(sf_dir, kmax=16)


def _q_wsssp(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import weighted_sssp

    res, _ = weighted_sssp(_sym_copurchase(sf_dir), seed_mod=101, num_parts=4)
    import ray.data as rd

    return rd.from_arrow(res)


def _q_closeness(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import closeness

    res, _ = closeness(_sym_copurchase(sf_dir), seed_mod=101, num_parts=4)
    import ray.data as rd

    return rd.from_arrow(res)


def _q_mis(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import mis

    res, _ = mis(_sym_copurchase(sf_dir), num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "in_mis": res["in_mis"],
        }
    )


def _q_triangles(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import triangle_count

    total, _, _ = triangle_count(_sym_copurchase(sf_dir), num_parts=4)
    return pa.table({"n_triangles": pa.array([total], type=pa.int64())})


def _q_walk_pmi(sf_dir: str):
    """DeepWalk skip-gram PMI matrix over deterministic walks (L=4,
    window=2) on the co-purchase graph — the graph→training-data bridge:
    the (u, v, n) pair corpus is what a skip-gram trainer consumes, and
    PMI is its implicit factorization target (Levy & Goldberg 2014)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        walk_skipgram_pmi,
    )

    return walk_skipgram_pmi(_sym_copurchase(sf_dir), num_parts=4)


def _q_random_walks(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import random_walks

    res, _ = random_walks(_sym_copurchase(sf_dir), walk_len=4, num_parts=4)
    return res


def _q_ppr(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        personalized_pagerank,
    )

    res, _ = personalized_pagerank(
        _sym_copurchase(sf_dir), iters=PR_ITERS, seed_mod=10, num_parts=4
    )
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "pr": round_half_away(res["rank"].to_numpy(), 8),
        }
    )


def _q_semi_clustering(sf_dir: str):
    """Pregel-paper semi-clustering (§5.3) over the STRONG co-purchase
    graph → per-vertex best semi-cluster + score. Oracled by
    _semi_clustering_sql(): because (I, B) are pure functions of the
    member set (I = |E(mem)|, B = Σdeg(mem) − 2I — the program's
    incremental updates preserve exactly this invariant), the 4
    supersteps unroll into 4 list-valued CTE rounds in DuckDB
    (candidates = own ∪ received ∪ received+self, rescored from
    scratch, row_number-top-c_max by (score DESC, mem ASC)).
    Scalar-replay + partition-invariance pytests:
    test_round2.py::test_semi_clustering_*."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import semi_clustering
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        strong_copurchase_edges,
    )

    res, _ = semi_clustering(
        symmetrize(strong_copurchase_edges(sf_dir)), iters=4, num_parts=4
    )
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "cluster": res["cluster"],
            "score": res["score"],
        }
    )


def _q_matching(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import maximal_matching

    res, _ = maximal_matching(_sym_copurchase(sf_dir), num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "partner": res["partner"],
        }
    )


def _q_spectral_radius(sf_dir: str):
    """Spectral radius of the co-purchase adjacency via exact-int64 walk
    counts (5 power iterations): λ ≈ max(w5)/max(w4) — one float
    division, bit-exact vs SQL."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        spectral_radius,
    )

    return spectral_radius(_sym_copurchase(sf_dir), num_parts=4)


def _q_diameter(sf_dir: str):
    """Double-sweep diameter bounds of the co-purchase graph: BFS from
    the max-degree pivot (diameter ≤ 2·ecc) then from its farthest
    min-vid witness (diameter ≥ ecc(far)) — Magnien et al. 2009."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        diameter_double_sweep,
    )

    return diameter_double_sweep(_sym_copurchase(sf_dir), num_parts=4)


def _q_coarsen_matching(sf_dir: str):
    """One multilevel-coarsening level (heavy-edge idiom with the
    deterministic handshake matching): matched pairs contract to the
    smaller id; coarse multi-edge table with collapse counts."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        coarsen_matching,
    )

    return coarsen_matching(_sym_copurchase(sf_dir), num_parts=4)


def _q_part_supplier_hhi(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        part_supplier_hhi,
    )

    return part_supplier_hhi(sf_dir)


def _q_repeat_purchase(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        repeat_purchase_rate,
    )

    return repeat_purchase_rate(sf_dir)


def _q_brand_elasticity(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        brand_discount_elasticity,
    )

    return brand_discount_elasticity(sf_dir)


def _q_butterflies(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import butterfly_count

    return butterfly_count(sf_dir)


def _q_vertex_cover(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import vertex_cover

    res, _ = vertex_cover(_sym_copurchase(sf_dir), num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "in_cover": res["in_cover"],
        }
    )


def _q_label_mixing(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        label_mixing_matrix,
    )

    return label_mixing_matrix(sf_dir, mod=3)


def _q_bipartite(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import bipartite_check

    return bipartite_check(_sym_copurchase(sf_dir), num_parts=4)


def _q_spam_mass(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import spam_mass

    return spam_mass(
        _sym_copurchase(sf_dir), iters=PR_ITERS, trust_mod=17, num_parts=4
    )


def _q_hits(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import hits

    res, _ = hits(_sym_copurchase(sf_dir), iters=HITS_ITERS, num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "auth": round_half_away(res["auth"].to_numpy(), 8),
            "hub": round_half_away(res["hub"].to_numpy(), 8),
        }
    )


def _q_assortativity(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import assortativity

    return assortativity(_sym_copurchase(sf_dir), num_parts=4)


def _q_clustering(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        clustering_coefficient,
    )

    res = clustering_coefficient(_sym_copurchase(sf_dir), num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "clustering": res["clustering"],
        }
    )


def _q_kcore(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import kcore

    res, _ = kcore(_sym_copurchase(sf_dir), num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "core": res["core"].to_numpy(),
        }
    )


def _q_kshell_histogram(sf_dir: str):
    """k-shell occupancy: vertices per coreness value (the onion summary
    of the kcore decomposition)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import kcore

    res, _ = kcore(_sym_copurchase(sf_dir), num_parts=4)
    core = res["core"].to_numpy().astype(np.int64)
    u, c = np.unique(core, return_counts=True)
    return pa.table(
        {"core": u, "n_vertices": c.astype(np.int64)}
    )


def _q_ktruss(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import ktruss_bsp

    res, _ = ktruss_bsp(_sym_copurchase(sf_dir), k=6, num_parts=4)
    return pa.table(
        {
            "src": res["src"].to_numpy(),
            "dst": res["dst"].to_numpy(),
        }
    )


def _q_lpa(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import label_propagation

    res, _ = label_propagation(_sym_copurchase(sf_dir), iters=LPA_ITERS, num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "label": res["label"].to_numpy().view(np.int64),
        }
    )


def _q_seeded_labels(sf_dir: str):
    """Semi-supervised seeded LPA over the co-purchase graph: clamped
    seeds (vid%10==0 labeled vid%3) flood 5 rounds; labeled vertices out."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import seeded_labels

    res, _ = seeded_labels(_sym_copurchase(sf_dir), iters=LPA_ITERS, num_parts=4)
    vid = res["vid"].to_numpy().view(np.int64)
    lab = res["label"].to_numpy().view(np.int64)
    m = lab >= 0
    return pa.table({"vid": vid[m], "label": lab[m]})


_ENGINES: dict[str, Any] = {}


def _match_engine(sf_dir: str):
    """One cached partitioned layout + actor pool per sf_dir — the three
    match queries share it (layout build is the expensive part)."""
    import os

    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        partition_graph,
        symmetrize,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.bsp import BSPEngine
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_edges,
        part_labels,
    )

    if sf_dir not in _ENGINES:
        gdir = f"/tmp/graft_entry_graph_{os.path.basename(os.path.normpath(sf_dir))}_p4_mod3"
        partition_graph(
            symmetrize(copurchase_edges(sf_dir)),
            4,
            gdir,
            labels_ds=part_labels(sf_dir, mod=3),
            directed=True,
        )
        _ENGINES[sf_dir] = BSPEngine(gdir, 4)
    return _ENGINES[sf_dir]


def _match(sf_dir: str, qlabels, qedges):
    from subgraph_isomorphism_pregel_ray.pipelines.match import build_plan

    eng = _match_engine(sf_dir)
    eng.run(
        "match",
        {"plan": build_plan(qlabels, qedges)},
        max_steps=2 * len(qlabels) + 2,
    )
    cnt = eng.scalar_results().get("embeddings", 0)
    return pa.table({"n_embeddings": pa.array([cnt], type=pa.int64())})


def _q_match_triangle(sf_dir: str):
    return _match(sf_dir, [0, 1, 2], [(0, 1), (1, 2), (2, 0)])


def _q_match_p3(sf_dir: str):
    return _match(sf_dir, [0, 1, 0], [(0, 1), (1, 2)])


def _q_match_4cycle(sf_dir: str):
    return _match(sf_dir, [0, 2, 1, 2], [(0, 1), (1, 2), (2, 3), (3, 0)])


# 7-vertex branchy deep query (reference benchmark shape, dev/tmp.out:14-19
# scaled up: depth 4, 3-way branch at the root) over the STRONG co-purchase
# graph. The min-orders threshold is SCALE-ADAPTIVE (smallest m with
# undirected strong pairs ≤ 8 × |part|): the ≥2-order graph's relative
# density varies wildly with sf (avg degree 23 at sf0.001 vs 3.7 at sf0.01)
# and a 7-vertex count explodes on the dense one. The SQL oracle replays the
# same rule.
DEEP_QL = [0, 1, 2, 0, 1, 0, 2]
DEEP_QE = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (2, 6)]


def _q_match_deep_tree(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.match import match_count
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        part_labels,
        strong_copurchase_edges,
    )

    edges = symmetrize(strong_copurchase_edges(sf_dir))
    count, _ = match_count(
        edges, DEEP_QL, DEEP_QE, labels_ds=part_labels(sf_dir, mod=3), num_parts=4
    )
    return pa.table({"n_embeddings": pa.array([count], type=pa.int64())})


# 7-vertex BUSHY query (VERDICT r02 item 2: |V(Q)| ≥ 7, max_branch_number
# ≥ 2, per-branch multiplicity ≥ 10³ — the shape the reference compresses
# with SIBranch AND-OR factors, src/SItypes/SIBranch.h:81-131): root with
# THREE depth-2 legs over the FULL co-purchase graph (avg degree ~116 at
# sf0.01 → per-branch multiplicity ≈ (116/3)² ≈ 1.5×10³). The flat plan
# stays feasible because (a) the root label is RARE (vid % 97 == 0 → ~20
# roots at sf0.01) so the materialized frontier is root-bounded, and (b)
# the three leaves fold combinatorially (A5 pseudo-child counting — the
# factors, not the product, cross the exchange) with max_out_rows bounding
# every outbox. Leaf labels are pairwise distinct and each equals exactly
# one internal's label, so injectivity reduces to one adjacency indicator
# per leg — which the SQL oracle replays in closed form.
BUSHY_QL = [3, 0, 1, 1, 2, 2, 0]  # root 3; internals v1/v3/v5 = 0/1/2; leaves v2/v4/v6 = 1/2/0
BUSHY_QE = [(0, 1), (1, 2), (0, 3), (3, 4), (0, 5), (5, 6)]
BUSHY_MAX_OUT_ROWS = 200_000


def _bushy_labels(sf_dir: str):
    """Dataset(vid, label): 3 (rare root class) on p_partkey % 97 == 0,
    else p_size % 3 — replayed verbatim by the oracle's CASE."""
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_size"])

    def _lab(t: pa.Table) -> pa.Table:
        vid = t["p_partkey"].to_numpy().astype(np.uint64)
        lab = t["p_size"].to_numpy().astype(np.int64) % 3
        lab[vid % 97 == 0] = 3
        return pa.table({"vid": vid, "label": lab})

    return parts.map_batches(_lab, batch_format="pyarrow")


def _q_match_bushy(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.match import match_count
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_edges,
    )

    count, _ = match_count(
        symmetrize(copurchase_edges(sf_dir)),
        BUSHY_QL,
        BUSHY_QE,
        labels_ds=_bushy_labels(sf_dir),
        num_parts=4,
        max_out_rows=BUSHY_MAX_OUT_ROWS,
        max_steps=200,
    )
    return pa.table({"n_embeddings": pa.array([count], type=pa.int64())})


BUSHY_DEEP_QL = [4, 0, 1, 0, 2, 3, 2]  # root 4; branch A 0-1-0; branch B 2-3-2
BUSHY_DEEP_QE = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6)]


def _deep_labels(sf_dir: str):
    """Dataset(vid, label): 4 (rare root class) on p_partkey % 97 == 0,
    else p_size % 4 — replayed verbatim by the oracle's CASE."""
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_size"])

    def _lab(t: pa.Table) -> pa.Table:
        vid = t["p_partkey"].to_numpy().astype(np.uint64)
        lab = t["p_size"].to_numpy().astype(np.int64) % 4
        lab[vid % 97 == 0] = 4
        return pa.table({"vid": vid, "label": lab})

    return parts.map_batches(_lab, batch_format="pyarrow")


def _q_match_bushy_deep(sf_dir: str):
    """Internal-branch factor fold (round 4): a 7-vertex query with TWO
    label-disjoint depth-3 branch chains (per-branch multiplicity ≈ 2·10⁴
    at sf0.01, total count 1.3·10¹⁰) — the flat-plan analogue of the
    reference's SIBranch AND-OR enumeration (SItypes/SIBranch.h:81-131).
    Each branch is counted per root as a FACTOR (rows collapse back to
    [root, product] between branches), so the branch cross product never
    materializes; the flat path would ship ~10¹⁰ rows."""
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.match import match_count
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_edges,
    )

    count, _ = match_count(
        symmetrize(copurchase_edges(sf_dir)),
        BUSHY_DEEP_QL,
        BUSHY_DEEP_QE,
        labels_ds=_deep_labels(sf_dir),
        num_parts=4,
        max_out_rows=BUSHY_MAX_OUT_ROWS,
        max_steps=400,
    )
    return pa.table({"n_embeddings": pa.array([count], type=pa.int64())})


BUSHY_SHARED_QL = [4, 0, 1, 0, 2, 1, 2]  # branches 0-1-0 / 2-1-2 SHARE label 1
BUSHY_SHARED_QE = BUSHY_DEEP_QE


def _q_match_bushy_shared(sf_dir: str):
    """Shared-label branch fold (round 5): the bushy_deep shape but with the
    two depth-3 branch chains SHARING their middle label — the exact case
    the round-4 label-disjoint fold had to expand flat. The relaxed fold
    counts per-root branch products with the cross-branch (a2, b2)
    injectivity pair dropped, then subtracts the single conflict term — the
    merged-middle quotient query counted exactly on the SAME engine — the
    Ray analogue of the reference's SIBranch conflict markers + subtraction
    (/root/reference/src/SItypes/SIQuery.h:604-702, SIBranch.h:161-248)."""
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.match import match_count
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_edges,
    )

    count, _ = match_count(
        symmetrize(copurchase_edges(sf_dir)),
        BUSHY_SHARED_QL,
        BUSHY_SHARED_QE,
        labels_ds=_deep_labels(sf_dir),
        num_parts=4,
        max_out_rows=BUSHY_MAX_OUT_ROWS,
        max_steps=400,
        shared_fold=True,
    )
    return pa.table({"n_embeddings": pa.array([count], type=pa.int64())})


def _q_match_bushy_fold3(sf_dir: str):
    """The round-3 bushy query (three depth-2 branches whose labels are
    shared PAIRWISE across branches — 3 cross-branch conflict pairs)
    counted through the round-5 shared-label fold: relaxed three-factor
    product minus SEVEN conflict terms (every non-empty subset of the 3
    vertex-disjoint pairs merged → 2³−1 quotient queries, each counted
    exactly on the same engine). Same count as ``match_bushy`` (which runs
    the trailing-leaf fold) — one result, two independent fold algebras,
    one closed-form SQL oracle."""
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.match import match_count
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_edges,
    )

    count, _ = match_count(
        symmetrize(copurchase_edges(sf_dir)),
        BUSHY_QL,
        BUSHY_QE,
        labels_ds=_bushy_labels(sf_dir),
        num_parts=4,
        max_out_rows=BUSHY_MAX_OUT_ROWS,
        max_steps=400,
        shared_fold=True,
    )
    return pa.table({"n_embeddings": pa.array([count], type=pa.int64())})


def _q_match_embeddings_tri(sf_dir: str):
    """Embedding ENUMERATION (not just the count): labeled triangles of the
    strong co-purchase graph as (v0, v1, v2) rows — the reference's disabled
    per-embedding dump, working."""
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.match import match_embeddings
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_edges,
        part_labels,
    )

    return match_embeddings(
        symmetrize(copurchase_edges(sf_dir, min_orders=2)),
        [0, 1, 2],
        [(0, 1), (1, 2), (2, 0)],
        labels_ds=part_labels(sf_dir, mod=3),
        num_parts=4,
    )


def _q_match_triangle_per_root(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.match import build_plan

    eng = _match_engine(sf_dir)
    eng.run(
        "match",
        {"plan": build_plan([0, 1, 2], [(0, 1), (1, 2), (2, 0)]), "per_root": True},
        max_steps=10,
    )
    t = eng.result_table()
    return pa.table(
        {
            "vid": t["vid"].to_numpy().view(np.int64),
            "n_embeddings": t["n_embeddings"],
        }
    )


# ---- text / docs ----------------------------------------------------------
def _docs(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return read_table(sf_dir, "documents", columns=["doc_id", "text"])


def _q_token_count(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import token_count

    return token_count(_docs(sf_dir))


def _q_text_stats(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import text_stats

    return text_stats(_docs(sf_dir))


def _q_exact_dedup(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def _q_vocab_topk(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import vocab_topk

    return vocab_topk(_docs(sf_dir), k=100)


def _q_oov_rate(sf_dir: str):
    """Per-document OOV rate vs the corpus top-25 vocabulary (tokenizer
    coverage; k=25 < the synthetic corpus's 31 distinct tokens, so the
    metric has real spread): two passes — vocab_topk's deterministic cut
    broadcast once via ray.put, then a stateless membership map."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import oov_rate

    return oov_rate(_docs(sf_dir), k=25)


def _q_heavy_hitters(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import heavy_hitters

    return heavy_hitters(_docs(sf_dir), denom=500)


def _q_doc_repetition(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import doc_repetition

    return doc_repetition(_docs(sf_dir))


def _q_contamination(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import contamination

    return contamination(_docs(sf_dir))


def _q_unigram_quality(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import unigram_quality

    return unigram_quality(_docs(sf_dir))


def _q_neighbor_sample(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import neighbor_sample

    return neighbor_sample(_sym_copurchase(sf_dir), k=5)


def _q_collocations(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import collocations_topk

    return collocations_topk(_docs(sf_dir), k=50, min_count=5)


def _q_events_hopping(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_hopping

    return events_hopping(sf_dir, window_sec=600, hop_sec=300)


def _q_knn_graph(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import knn_graph

    return knn_graph(_emb(sf_dir), k=5)


def _q_redact_pii(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import redact_pii

    return redact_pii(_docs(sf_dir))


def _q_curate_corpus(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.corpus import curate_corpus

    return curate_corpus(_docs(sf_dir))


def _q_hyperball(sf_dir: str):
    """HyperBall registers at radius 2 (m=256). The float ``nf_est`` is
    projected out so the compared columns are exact ints; the estimate's
    accuracy has its own pytest oracle vs exact BFS balls."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import hyperball

    tbl, _ = hyperball(_sym_copurchase(sf_dir), radius=2, p=8, num_parts=4)
    return tbl.select(["vid", "reg_sum", "reg_zeros"])


def _q_chunk_documents(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.corpus import chunk_documents

    return chunk_documents(_docs(sf_dir), window=20)


def _q_pack_sequences(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.corpus import pack_sequences

    return pack_sequences(_docs(sf_dir), seq_len=512)


def _q_events_sorted(sf_dir: str):
    """TeraSort analogue over the events stream: distributed sort by
    (value DESC, event_id ASC) + global 0-based ordinal (two-phase
    prefix-sum, ``stages/sort.py`` ↔ ``utils/TeraSort.h:244-283``)."""
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table
    from subgraph_isomorphism_pregel_ray.stages.sort import sort_with_ordinal

    ev = read_table(sf_dir, "events", columns=["event_id", "value"])
    return sort_with_ordinal(ev, ["value", "event_id"], descending=[True, False])


def _q_revenue_by_nation(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import revenue_by_nation

    return revenue_by_nation(sf_dir)


def _q_product_type_profit(sf_dir: str):
    """Q9-shaped: revenue from parts whose name contains 'red', by supplier
    nation and order year — three bucketed re-keying joins with a
    batch-boundary substring semi-filter on part."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        product_type_profit,
    )

    return product_type_profit(sf_dir)


def _q_late_shipment_rate(sf_dir: str):
    """Q12-shaped conditional aggregate: late-shipment share per order
    priority — one bucketed orderkey join, int64 day arithmetic, CASE-sum
    partials, ONE double division after the final fold."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        late_shipment_rate,
    )

    return late_shipment_rate(sf_dir)


def _q_nation_market_share(sf_dir: str):
    """Q8-shaped market share: revenue share supplied by one nation among
    region-filtered customers' orders, per year — supplier/nation dims
    broadcast, two bucketed re-keying joins, one final division."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        nation_market_share,
    )

    return nation_market_share(sf_dir)


def _q_top_supplier_revenue(sf_dir: str):
    """Q15-shaped scalar-subquery max with ties: per-supplier window
    revenue, suppliers achieving the max; exact-int units."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        top_supplier_revenue,
    )

    return top_supplier_revenue(sf_dir)


def _q_supplier_variety(sf_dir: str):
    """Q16-shaped distinct-supplier count per (brand, size) with a
    broadcast NOT-IN anti-join; two bucketed exchanges, triples deduped
    in the suppkey-keyed bucket."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        supplier_variety,
    )

    return supplier_variety(sf_dir)


def _q_min_cost_supplier(sf_dir: str):
    """Q2-shaped correlated min: cheapest-unit-price supplier per part
    (suppkey tiebreak), one bucketed shuffle after per-batch partial
    argmin; supplier/nation dims broadcast."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        min_cost_supplier,
    )

    return min_cost_supplier(sf_dir)


def _q_disjunctive_revenue(sf_dir: str):
    """Q19-shaped three-branch OR predicate over a lineitem ⋈ part bucket
    join; quantity-range union pre-filter at the batch boundary."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        disjunctive_revenue,
    )

    return disjunctive_revenue(sf_dir)


def _q_returned_customer_topk(sf_dir: str):
    """Q10-shaped: top-20 customers by returned-lineitem revenue, per-bucket
    local top-k then a ≤ k·B driver fold; names via pruned point reads."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        returned_customer_topk,
    )

    return returned_customer_topk(sf_dir)


def _q_nation_trade_volume(sf_dir: str):
    """Q7-shaped cross-nation trade flow: revenue per (customer nation,
    supplier nation) ordered pair, different nations only — three bucketed
    re-keying joins (suppkey → orderkey → custkey), exact int64 cents."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        nation_trade_volume,
    )

    return nation_trade_volume(sf_dir)


def _q_revenue_by_region(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import revenue_by_region

    return revenue_by_region(sf_dir)


def _q_distinct_users(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        distinct_users_daily,
    )

    return distinct_users_daily(sf_dir)


def _q_parts_never_ordered(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        parts_never_ordered,
    )

    return parts_never_ordered(sf_dir, min_qty=45)


def _q_events_rolling(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_rolling

    return events_rolling(sf_dir, window_rows=5)


def _q_session_conversion(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        session_conversion,
    )

    return session_conversion(sf_dir, gap_sec=GAP_SEC)


def _q_user_type_entropy(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        user_type_entropy,
    )

    return user_type_entropy(sf_dir)


def _q_user_gap_cv(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import user_gap_cv

    return user_gap_cv(sf_dir, min_gaps=5)


def _q_events_zscore(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_zscore

    return events_zscore(sf_dir, window_rows=20, min_n=5)


def _q_copurchase_weights(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_weights,
    )

    return copurchase_weights(sf_dir)


def _q_documents_sample(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import stratified_sample
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return stratified_sample(docs, rates={"en": 0.25}, default_rate=1.0)


def _q_zipf_slope(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import zipf_slope

    return zipf_slope(_docs(sf_dir))


def _q_curriculum_buckets(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import curriculum_buckets

    return curriculum_buckets(_docs(sf_dir), k=4)


def _q_doc_cross_entropy(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import doc_cross_entropy

    return doc_cross_entropy(_docs(sf_dir))


def _q_train_val_test(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        train_val_test_split,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    return train_val_test_split(docs, train_pct=80, val_pct=10)


def _q_kmeans(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        kmeans_embeddings,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assign, _cent = kmeans_embeddings(emb, k=8, iters=5)
    return assign


def _q_topk_parts(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        topk_parts_per_nation,
    )

    return topk_parts_per_nation(sf_dir, k=5)


def _q_events_quantiles(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_quantiles

    return events_quantiles(sf_dir)


def _q_events_asof(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_asof_prior

    return events_asof_prior(sf_dir)


def _q_corpus_clean(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.corpus import corpus_clean

    return corpus_clean(_docs(sf_dir))


def _q_lang_id(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import lang_id

    return lang_id(_docs(sf_dir))


def _q_fingerprint(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import fingerprint

    return fingerprint(_docs(sf_dir))


def _q_embedding_label_centroids(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        embedding_label_centroids,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    emb = read_table(sf_dir, "embeddings", columns=["embedding", "label"])
    return embedding_label_centroids(emb)


def _q_lang_by_source(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import lang_by_source
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return lang_by_source(docs)


def _q_nb_source_pred(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import nb_classifier

    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return nb_classifier(docs, label_col="source")


def _q_countmin(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import countmin_topk

    return countmin_topk(_docs(sf_dir), k=32, d=4, width=1024)


def _q_winnow(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import winnow_fingerprints

    return winnow_fingerprints(_docs(sf_dir))


def _q_simhash(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import simhash64

    return simhash64(_docs(sf_dir))


def _q_minhash_pairs(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir), threshold=0.5)


# ---- embeddings -----------------------------------------------------------
def _emb(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])


def _q_embedding_dups(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import embedding_dup_pairs

    return embedding_dup_pairs(_emb(sf_dir), threshold=EMB_THRESHOLD, method="exact")


def _q_ann_topk(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import ann_topk

    return ann_topk(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K)


def _q_ann_topk_ivf(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import ann_topk_ivf

    import os

    idx = f"/tmp/graft_ivf_{os.path.basename(os.path.normpath(sf_dir))}_c16_s13"
    return ann_topk_ivf(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K, index_dir=idx)


def _q_ivf_recall(sf_dir: str):
    """Recall@k of the IVF index against the exact brute-force top-k, per
    query id plus a corpus-level row — the audit that prices the IVF
    recall<1 trade before trusting it at scale. rows-only: the IVF side
    depends on k-means-lite centroids (iterative float), the same reason
    ann_topk_ivf itself is rows-only; the exact side IS oracled as
    ann_topk."""
    import os

    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        ann_topk,
        ann_topk_ivf,
    )

    idx = f"/tmp/graft_ivf_{os.path.basename(os.path.normpath(sf_dir))}_c16_s13"
    exact = ann_topk(_emb(sf_dir), ANN_QUERY_IDS, k=ANN_K).to_pandas()
    ivf = ann_topk_ivf(
        _emb(sf_dir), ANN_QUERY_IDS, k=ANN_K, index_dir=idx
    ).to_pandas()
    rows = []
    hits_all = n_all = 0
    for qid in sorted(set(exact["query_id"].tolist())):
        e = set(exact.loc[exact.query_id == qid, "vec_id"].tolist())
        g = set(ivf.loc[ivf.query_id == qid, "vec_id"].tolist())
        hits, n = len(e & g), len(e)
        hits_all += hits
        n_all += n
        rows.append((int(qid), hits, n, round(hits / n, 6) if n else 1.0))
    rows.append((-1, hits_all, n_all,
                 round(hits_all / n_all, 6) if n_all else 1.0))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "hits": pa.array([r[1] for r in rows], pa.int64()),
            "k": pa.array([r[2] for r in rows], pa.int64()),
            "recall": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def _q_dup_rate_by_source(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import dup_rate_by_source
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return dup_rate_by_source(docs)


def _q_tfidf_cosine_pairs(sf_dir: str):
    """Bayardo-style sparse all-pairs similarity: TF-IDF over word
    3-grams (df-pruned vocabulary), integer weights, three hash-bucketed
    exchanges; pairs with cosine ≥ 0.1."""
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        tfidf_cosine_pairs,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_cosine_pairs(docs, n_docs)


def _q_ngram_novelty(sf_dir: str):
    """Per-doc first-occurrence novelty over 5-grams (min-doc_id owner);
    one gram-bucket exchange, per-doc fold."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import ngram_novelty
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_novelty(docs)


def _q_split_leakage(sf_dir: str):
    """Cross-split exact-duplicate audit over train_val_test_split's
    pure-BIGINT bucket arithmetic; hash-bucket pair expansion."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import split_leakage
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return split_leakage(docs)


def _q_dup_cluster_histogram(sf_dir: str):
    """Exact-dup cluster-size distribution (md5 groups)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        dup_cluster_histogram,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dup_cluster_histogram(docs)


def _q_pii_density_by_source(sf_dir: str):
    """Per-source PII exposure rollup (emails-first counting, docs-with-
    PII rate); one linear pass + source-sized groupby."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        pii_density_by_source,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return pii_density_by_source(docs)


def _q_source_kl(sf_dir: str):
    """Per-source unigram KL divergence vs the corpus distribution;
    exact integer counts, one token-bucket exchange."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import source_kl
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return source_kl(docs)


def _q_source_gram_overlap(sf_dir: str):
    """Cross-source content-leakage matrix: distinct 5-grams shared per
    source pair; hashes-only gram-bucket exchange, source²-sized fold."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        source_gram_overlap,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return source_gram_overlap(docs)


def _q_events_cusum(sf_dir: str):
    """Page's one-sided CUSUM drift detector per user; recurrence-order
    parity vs a recursive CTE (same max/add/sub order per step)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_cusum

    return events_cusum(sf_dir)


def _q_events_holt(sf_dir: str):
    """Holt double-exponential smoothing (level+trend) per user;
    recurrence-order parity vs a two-column recursive CTE."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_holt

    return events_holt(sf_dir)


def _q_important_parts_value(sf_dir: str):
    """Q11-shaped scalar-subquery HAVING: parts above 1.5× the average
    per-part value; exact-int cents, one groupby."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        important_parts_value,
    )

    return important_parts_value(sf_dir)


def _q_bulk_suppliers(sf_dir: str):
    """Q20-shaped nested IN with per-(supplier, part) HAVING over the
    lineitem bridge; part-name semi-filter broadcast."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import bulk_suppliers

    return bulk_suppliers(sf_dir)


def _q_succ_triad_motifs(sf_dir: str):
    """Directed triangle census (cyclic vs transitive) of the
    part-successor graph; wedge expansion + pair-bucket closure."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        succ_triad_motifs,
    )

    return succ_triad_motifs(sf_dir)


def _q_avg_neighbor_degree(sf_dir: str):
    """knn(k) degree-correlation curve, degree-weighted exact-int form;
    two bucketed attaches over the co-purchase graph."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        avg_neighbor_degree,
    )

    return avg_neighbor_degree(sf_dir)


def _q_events_disorder(sf_dir: str):
    """Kendall-tau stream-disorder audit per user (ingestion order vs
    event time); exact inversion counts."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_disorder

    return events_disorder(sf_dir)


def _q_weekday_revenue(sf_dir: str):
    """ISO day-of-week revenue seasonality; pure int64 day arithmetic."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import weekday_revenue

    return weekday_revenue(sf_dir)


def _q_window_distinct_users(sf_dir: str):
    """Exact distinct users per tumbling hour window (the exact
    counterpart of the HLL pair)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        window_distinct_users,
    )

    return window_distinct_users(sf_dir)


def _q_scc_size_histogram(sf_dir: str):
    """SCC size distribution of the part-successor graph (the bow-tie
    core plus periphery, summarized): (n_members, n_components)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import scc
    from subgraph_isomorphism_pregel_ray.pipelines.relational import succ_edges

    out, _ = scc(succ_edges(sf_dir), num_parts=8)
    comp = out["scc"].to_numpy().view(np.int64)
    _, sizes = np.unique(comp, return_counts=True)
    u, c = np.unique(sizes, return_counts=True)
    return pa.table(
        {"n_members": u.astype(np.int64), "n_components": c.astype(np.int64)}
    )


def _q_doclen_histogram(sf_dir: str):
    """Token-length histogram of the corpus in 64-token buckets — the
    sequence-length profile that sizes pack_sequences' bins."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import doclen_histogram
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return doclen_histogram(docs)


def _q_user_activity_streaks(sf_dir: str):
    """Gaps-and-islands: longest consecutive-active-day streak per user;
    one user-hash bucket shuffle, loop-free run detection."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        user_activity_streaks,
    )

    return user_activity_streaks(sf_dir)


def _q_events_mad(sf_dir: str):
    """Two-pass exact median-absolute-deviation via the sort-ordinal
    quantile machine."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_mad

    return events_mad(sf_dir)


def _q_events_heatmap(sf_dir: str):
    """(isodow, hour) activity heatmap from pure int64 calendar math."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_heatmap

    return events_heatmap(sf_dir)


def _q_wcc_parts(sf_dir: str):
    """Weak connectivity of the directed successor graph (contrast with
    scc_parts: WCC merges what direction separates)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        connected_components,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.relational import succ_edges

    res, _ = connected_components(symmetrize(succ_edges(sf_dir)), num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "component": res["component"].to_numpy().view(np.int64),
        }
    )


def _q_weekly_stickiness(sf_dir: str):
    """DAU/WAU per epoch week; global distinct via week-keyed buckets."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        weekly_stickiness,
    )

    return weekly_stickiness(sf_dir)


def _q_gram_entropy(sf_dir: str):
    """Corpus 3-gram Shannon entropy from exact integer counts."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import gram_entropy
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return gram_entropy(docs)


def _q_lexical_diversity(sf_dir: str):
    """Per-doc type-token ratio + mean token length (one map_batches)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import lexical_diversity
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return lexical_diversity(docs)


def _q_hapax_stats(sf_dir: str):
    """Corpus hapax-legomenon fraction from exact token counts."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import hapax_stats
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return hapax_stats(docs)


def _q_length_filter_sweep(sf_dir: str):
    """C4-style min-token threshold sweep (docs/tokens surviving each cut)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        length_filter_sweep,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["text"])
    return length_filter_sweep(docs)


def _q_host_locality(sf_dir: str):
    """Per-host intra-host link fraction (webgraph block-structure panel).
    Deterministic synthetic pages, independent of sf_dir by design
    (same table as host_graph/host_rank/anchor_index)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import host_locality

    return host_locality(
        rd.from_arrow(synth_pages_table(_PAGES_ORACLE_N, seed=_PAGES_ORACLE_SEED))
    )


def _q_gopher_quality(sf_dir: str):
    """Gopher-rule (Rae et al. 2021) quality-failure panel per source."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        gopher_quality_by_source,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["source", "text"])
    return gopher_quality_by_source(docs)


def _q_incremental_dedup(sf_dir: str):
    """Incremental-ingest anti-join: new-snapshot docs (odd doc_id) whose
    exact text never appeared in the old snapshot (even doc_id)."""
    import pyarrow.compute as pc

    from subgraph_isomorphism_pregel_ray.pipelines.dedup import incremental_dedup
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    def _parity(par: int):
        def _f(t):
            mask = pc.equal(pc.bit_wise_and(t["doc_id"], 1), par)
            return t.filter(mask)

        return _f

    old = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"]).map_batches(
        _parity(0), batch_format="pyarrow"
    )
    new = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"]).map_batches(
        _parity(1), batch_format="pyarrow"
    )
    return incremental_dedup(old, new)


def _q_vocab_coverage_curve(sf_dir: str):
    """Top-k vocabulary coverage curve (tokenizer vocab-size selection)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        vocab_coverage_curve,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["text"])
    return vocab_coverage_curve(docs)


def _q_shard_balance(sf_dir: str):
    """md5 % 64 shard balance audit (docs + utf-8 bytes per shard)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import shard_balance
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["text"])
    return shard_balance(docs)


def _q_temperature_mixture(sf_dir: str):
    """Temperature-scaled (alpha=0.3) source-sampling panel."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import temperature_mixture
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["source", "text"])
    return temperature_mixture(docs)


def _q_tokenizer_fertility(sf_dir: str):
    """Pre-tokenizer pieces-per-word fertility panel per language."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import tokenizer_fertility
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["lang", "text"])
    return tokenizer_fertility(docs)


def _q_page_indegree_histogram(sf_dir: str):
    """Page-level in-degree power-law census (log2 buckets).
    Deterministic synthetic pages, independent of sf_dir by design."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import (
        page_indegree_histogram,
    )

    return page_indegree_histogram(
        rd.from_arrow(synth_pages_table(_PAGES_ORACLE_N, seed=_PAGES_ORACLE_SEED))
    )


def _q_crawl_recency(sf_dir: str):
    """Per-host crawl-freshness panel (recrawl-scheduling input).
    Deterministic synthetic pages, independent of sf_dir by design."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import crawl_recency

    return crawl_recency(
        rd.from_arrow(synth_pages_table(_PAGES_ORACLE_N, seed=_PAGES_ORACLE_SEED))
    )


def _q_host_lang_mix(sf_dir: str):
    """Per-host language census with within-host shares.
    Deterministic synthetic pages, independent of sf_dir by design."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import host_lang_mix

    return host_lang_mix(
        rd.from_arrow(
            synth_pages_table(
                _PAGES_ORACLE_N, seed=_PAGES_ORACLE_SEED, n_hosts=_PAGES_MIX_HOSTS
            )
        )
    )


def _q_order_value_trimmed_mean(sf_dir: str):
    """Rank-trimmed (n//10 each side) robust mean of order values."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        order_value_trimmed_mean,
    )

    return order_value_trimmed_mean(sf_dir)


def _q_readability_by_source(sf_dir: str):
    """Per-source Flesch reading-ease panel from exact int64 count sums."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        readability_by_source,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["source", "text"])
    return readability_by_source(docs)


def _q_heaps_law_curve(sf_dir: str):
    """Vocabulary-growth deciles (all-integer Heaps'-law curve)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import heaps_law_curve
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return heaps_law_curve(docs)


def _q_sentence_dedup(sf_dir: str):
    """C4-style global exact sentence dedup (first occurrence wins)."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import sentence_dedup
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return sentence_dedup(docs)


def _q_lang_confusion(sf_dir: str):
    """Declared-lang × predicted-lang confusion matrix (metadata audit)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import lang_confusion
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return lang_confusion(docs)


def _q_token_freq_spectrum(sf_dir: str):
    """Frequency-of-frequencies spectrum (capped at 11+)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import token_freq_spectrum
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return token_freq_spectrum(docs)


def _q_doclen_percentiles_by_lang(sf_dir: str):
    """Per-language exact n_chars percentiles via the length-histogram
    compression (one groupby over distinct (lang, length) pairs)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        doclen_percentiles_by_lang,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"])
    return doclen_percentiles_by_lang(docs)


def _q_events_acf(sf_dir: str):
    """Daily-count autocorrelation panel, lags 1..7 (HUGEINT moments)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_acf

    return events_acf(sf_dir)


def _q_returns_rate_by_brand(sf_dir: str):
    """Per-brand return-flag rate via the broadcast-dimension machine."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        returns_rate_by_brand,
    )

    return returns_rate_by_brand(sf_dir)


def _q_degree_quantiles(sf_dir: str):
    """Exact degree-distribution corners via boundary-rank picks."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        degree_quantiles,
    )

    return degree_quantiles(sf_dir)


def _q_cohort_ltv(sf_dir: str):
    """First-seen-week cohort LTV curve (running cents per user)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import cohort_ltv

    return cohort_ltv(sf_dir)


def _q_customer_order_gaps(sf_dir: str):
    """Exact per-customer median reorder gap (uniform two-rank median)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        customer_order_gaps,
    )

    return customer_order_gaps(sf_dir)


def _q_markov_stationary(sf_dir: str):
    """Power-iteration stationary distribution of the event-type chain."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        markov_stationary,
    )

    return markov_stationary(sf_dir)


def _q_survival_km(sf_dir: str):
    """Kaplan–Meier signup→purchase survival with right-censoring."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import survival_km

    return survival_km(sf_dir)


def _q_order_value_gini(sf_dir: str):
    """Gini of order values via the distributed sort-ordinal machine."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        order_value_gini,
    )

    return order_value_gini(sf_dir)


def _q_user_hour_entropy(sf_dir: str):
    """Circadian activity entropy per user (bot fingerprint)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        user_hour_entropy,
    )

    return user_hour_entropy(sf_dir)


def _q_attack_tolerance(sf_dir: str):
    """Albert–Jeong–Barabási targeted-attack robustness curve over the
    symmetrized successor graph; one CC program run per hub cut."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        attack_tolerance,
    )

    return attack_tolerance(sf_dir)


def _q_revenue_trend_theilsen(sf_dir: str):
    """Theil–Sen robust daily-revenue trend (median of pairwise slopes)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        revenue_trend_theilsen,
    )

    return revenue_trend_theilsen(sf_dir)


def _q_bounce_rate_daily(sf_dir: str):
    """One-event-session rate per day over the sessionize machine."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        bounce_rate_daily,
    )

    return bounce_rate_daily(sf_dir, gap_sec=GAP_SEC)


def _q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of bm25_topk and search_topk lists."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import rrf_fusion

    return rrf_fusion(_docs(sf_dir), SEARCH_TERMS, k=10)


def _q_ltm_cascade(sf_dir: str):
    """Deterministic linear-threshold cascade (θ=1/8, seeds vid%13==0)
    over the co-purchase graph; per-vertex activation round."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import ltm_cascade

    out, _ = ltm_cascade(_sym_copurchase(sf_dir), num_parts=4)
    return pa.table(
        {
            "vid": out["vid"].to_numpy().view(np.int64),
            "activated_round": out["activated_round"].to_numpy(),
        }
    ).sort_by("vid")


def _q_weekly_churn(sf_dir: str):
    """Week-over-week churn: in-bucket (user, week+1) membership probe."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import weekly_churn

    return weekly_churn(sf_dir)


def _q_user_acquisition_curve(sf_dir: str):
    """First-seen-day user growth curve (min-fold + driver cumsum)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        user_acquisition_curve,
    )

    return user_acquisition_curve(sf_dir)


def _q_dow_revenue_anomaly(sf_dir: str):
    """Weekday-conditioned revenue z-score outliers (|z| > 2)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        dow_revenue_anomaly,
    )

    return dow_revenue_anomaly(sf_dir)


def _q_lang_log_odds(sf_dir: str):
    """Monroe 'Fightin' Words' log-odds top terms per language."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import lang_log_odds
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["lang", "text"])
    return lang_log_odds(docs)


def _q_condensation_levels(sf_dir: str):
    """Topological levels of the SCC condensation DAG (DagLevelProgram
    max-propagation after SCCProgram peeling + distributed relabel)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        condensation_levels,
    )

    return condensation_levels(sf_dir)


def _q_late_events(sf_dir: str):
    """Watermark lateness audit: two-phase distributed prefix max."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import late_events

    return late_events(sf_dir)


def _q_weighted_sample_orders(sf_dir: str):
    """Efraimidis–Spirakis A-Res weighted reservoir sample (k=50)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        weighted_sample_orders,
    )

    return weighted_sample_orders(sf_dir)


def _q_revenue_outlier_days(sf_dir: str):
    """Tukey-fence outlier days with explicit-arithmetic quartiles."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        revenue_outlier_days,
    )

    return revenue_outlier_days(sf_dir)


def _q_lang_source_chi2(sf_dir: str):
    """Pearson X² per-cell contributions of the lang × source crosstab."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import lang_source_chi2
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["lang", "source"])
    return lang_source_chi2(docs)


def _q_frequent_triples(sf_dir: str):
    """Apriori 3-itemsets over order baskets (support ≥ 2)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        frequent_triples,
    )

    return frequent_triples(sf_dir)


def _q_etype_cooccur_lift(sf_dir: str):
    """Event-type pair lift at user-day granularity (Gram-matrix fold)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        etype_cooccur_lift,
    )

    return etype_cooccur_lift(sf_dir)


def _q_revenue_pareto(sf_dir: str):
    """Smallest top-k customer set carrying ≥80% of revenue; exact
    integer 5·cum ≥ 4·total test."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import revenue_pareto

    return revenue_pareto(sf_dir)


def _q_isolated_parts(sf_dir: str):
    """Singleton-vertex audit: parts outside the co-purchase graph."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import isolated_parts

    return isolated_parts(sf_dir)


def _q_conversion_latency(sf_dir: str):
    """First-view→first-subsequent-purchase latency rollup; whole-second
    exact int fold, one division."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        conversion_latency,
    )

    return conversion_latency(sf_dir)


def _q_benford_first_digit(sf_dir: str):
    """Benford leading-digit screen on exact integer cents; observed vs
    log10(1+1/d) expectation."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        benford_first_digit,
    )

    return benford_first_digit(sf_dir)


def _q_order_value_magnitude(sf_dir: str):
    """Decimal-magnitude histogram of order values; exact integer
    power-of-ten binning (no float log)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        order_value_magnitude,
    )

    return order_value_magnitude(sf_dir)


def _q_customer_migration(sf_dir: str):
    """Year-over-year revenue-quartile transition matrix (NTILE closed
    form over sort ordinals, both-years inner join)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        customer_migration,
    )

    return customer_migration(sf_dir)


def _q_local_bridges(sf_dir: str):
    """Easley–Kleinberg local bridges (zero-common-neighbor edges) on the
    strong co-purchase graph; wedge-witness anti-join."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import local_bridges

    return local_bridges(sf_dir)


def _q_two_hop_reach(sf_dir: str):
    """Distinct ≤2-hop audience per vertex; wedge expansion + v-keyed
    global pair dedup."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import two_hop_reach

    return two_hop_reach(sf_dir)


def _q_label_conductance(sf_dir: str):
    """Per-label conductance over the co-purchase graph (cut / min-vol);
    one edge pass with broadcast label lookup."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        label_conductance,
    )

    return label_conductance(sf_dir)


def _q_top_customer_share(sf_dir: str):
    """Revenue concentration in the top-10 customers; round-then-rank
    over the dim-sized per-customer fold."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        top_customer_share,
    )

    return top_customer_share(sf_dir)


def _q_orders_fill_rate(sf_dir: str):
    """Per-order ALL-lines-on-time SLA (bool_and shape) via max-ship-day
    folds and one bucketed join."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        orders_fill_rate,
    )

    return orders_fill_rate(sf_dir)


def _q_revenue_autocorr(sf_dir: str):
    """Lag-1 Pearson autocorrelation of daily revenue; day-level moments
    folded exactly (Python bigints vs SQL HUGEINT)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        revenue_autocorr,
    )

    return revenue_autocorr(sf_dir)


def _q_degree_gini(sf_dir: str):
    """Gini coefficient of the co-purchase degree distribution via the
    distributed sort-ordinal machine; exact int64 moments."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import degree_gini

    return degree_gini(sf_dir)


def _q_basket_lift(sf_dir: str):
    """Apriori 2-itemset lift per co-purchased part pair; pair machine +
    two-hop basket-count attach, one rounded division."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import basket_lift

    return basket_lift(sf_dir)


def _q_cosine_histogram(sf_dir: str):
    """All-pairs cosine histogram (20 bins over [−1,1]) — embedding-space
    collapse probe; broadcast matrix, per-batch binning."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        cosine_histogram,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    emb = read_table(sf_dir, "embeddings")
    return cosine_histogram(emb)


def _q_knn_label_vote(sf_dir: str):
    """Leave-one-out k-NN majority-vote classifier over embeddings;
    broadcast matrix + per-batch top-k, deterministic vote."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import knn_label_vote
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    emb = read_table(sf_dir, "embeddings")
    return knn_label_vote(emb)


def _q_duplicate_ngram_fraction(sf_dir: str):
    """FineWeb-style dedup-health signal: per doc, share of its distinct
    word 5-grams occurring in ≥2 docs corpus-wide; hashes-only exchange,
    gram-bucket counting, per-doc partial fold."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        duplicate_ngram_fraction,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return duplicate_ngram_fraction(docs)


def _q_shingle_containment(sf_dir: str):
    """Broder containment ≥ 0.6 over char-5-gram shingles: the directional
    quote/subset detector (short doc inside long doc) resemblance misses."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import shingle_containment

    return shingle_containment(_docs(sf_dir), k=5, threshold=0.6)


def _q_winnow_dup_pairs(sf_dir: str):
    """MOSS pairwise match scores: ordered doc pairs sharing ≥5 distinct
    winnow fingerprints (k=20, w=16 — any shared run ≥ 35 chars is
    guaranteed a fingerprint)."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import winnow_dup_pairs

    return winnow_dup_pairs(_docs(sf_dir), k=20, w=16, min_shared=5)


def _q_dup_span_pairs(sf_dir: str):
    """ExactSubstr-style duplicate-span pairs (Lee et al. 2022 shape):
    ordered doc pairs sharing ≥5 distinct 40-char windows, with the
    shared-window count. Absolute span overlap — the verbatim-quotation /
    boilerplate detector the Jaccard family can't see."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import dup_span_pairs

    return dup_span_pairs(_docs(sf_dir), span_len=40, min_shared=5)


def _q_simhash_pairs(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import simhash_dup_pairs

    return simhash_dup_pairs(_docs(sf_dir), max_hamming=7)


def _q_ngram_jaccard(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir), k=5, threshold=0.5)


def _q_media_features(sf_dir: str):
    """Multimodal decode query (rows-only: binary payload features are not
    SQL-expressible; pytest covers codec roundtrips). Decode is REAL for
    numpy-decodable formats — PPM images, PCM audio, concatenated-PPM
    video — with the pluggable per-actor decoder seam for compressed
    codecs (no codec libs in this container). Deterministic synthetic
    media table, independent of sf_dir by design."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.pipelines.multimodal import (
        decode_features,
        synth_media_table,
    )

    return decode_features(rd.from_arrow(synth_media_table(300, seed=42)))


_PAGES_ORACLE_N, _PAGES_ORACLE_SEED = 2000, 42


def _pages_oracle_parquet() -> str:
    """Materialize the deterministic synthetic pages table (the exact
    Arrow table the host_graph/anchor_index/host_rank queries consume)
    as a parquet file the DuckDB oracle can read — the pages table is
    not among the driver's pre-registered views, so the oracle SQL
    reads this file instead. Written atomically (tmp + rename) so a
    concurrent driver/test run never sees a half-written file; the
    generator is pure in (n, seed), so any two writers produce
    byte-identical content. Called from ``oracle_sql()`` so the file
    exists regardless of whether the driver runs queries or oracles
    first."""
    import os

    import pyarrow.parquet as _pq

    path = f"/tmp/graft_pages_oracle_{_PAGES_ORACLE_N}_{_PAGES_ORACLE_SEED}.parquet"
    if not os.path.exists(path):
        from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table

        tmp = f"{path}.tmp.{os.getpid()}"
        _pq.write_table(
            synth_pages_table(_PAGES_ORACLE_N, seed=_PAGES_ORACLE_SEED), tmp
        )
        os.replace(tmp, path)
    return path


# host_lang_mix uses a 13-host variant: the default generator's host id
# (i % 20) DETERMINES the lang (i % 4, and 4 | 20), which would make every
# host single-language; 13 is coprime with 4, so hosts carry a real mix.
_PAGES_MIX_HOSTS = 13


def _pages_mix_oracle_parquet() -> str:
    """n_hosts=13 variant of :func:`_pages_oracle_parquet` (same atomic
    write discipline; pure in (n, seed, n_hosts))."""
    import os

    import pyarrow.parquet as _pq

    path = (
        f"/tmp/graft_pages_oracle_{_PAGES_ORACLE_N}_{_PAGES_ORACLE_SEED}"
        f"_h{_PAGES_MIX_HOSTS}.parquet"
    )
    if not os.path.exists(path):
        from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table

        tmp = f"{path}.tmp.{os.getpid()}"
        _pq.write_table(
            synth_pages_table(
                _PAGES_ORACLE_N, seed=_PAGES_ORACLE_SEED, n_hosts=_PAGES_MIX_HOSTS
            ),
            tmp,
        )
        os.replace(tmp, path)
    return path


def _q_host_graph(sf_dir: str):
    """Host-level webgraph (cc-webgraph-style aggregation of the href edge
    table to (src_host, dst_host, n_links)). Oracle: DuckDB replays the
    href regex + host extraction over the SAME deterministic pages
    parquet (``_pages_oracle_parquet``); the pytest scalar-reference +
    batch-size-invariance check remains
    (tests/test_ray_integration.py::test_host_graph_vs_scalar_reference).
    Deterministic synthetic pages, independent of sf_dir by design."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import host_graph

    return host_graph(
        rd.from_arrow(synth_pages_table(_PAGES_ORACLE_N, seed=_PAGES_ORACLE_SEED))
    )


def _q_anchor_index(sf_dir: str):
    """Anchor-text index (Brin & Page 1998 §2.2): per linked-to url, total
    in-links, distinct anchor texts, and the most frequent anchor (ties →
    lexicographically smallest). Oracle: DuckDB replays link extraction +
    anchor-text normalization + the per-url fold over the same pages
    parquet; the pure-scalar Counter reference pytest remains
    (tests/test_extract.py::test_anchor_index_vs_scalar_reference).
    Deterministic synthetic pages, independent of sf_dir by design."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import anchor_index

    return anchor_index(
        rd.from_arrow(synth_pages_table(_PAGES_ORACLE_N, seed=_PAGES_ORACLE_SEED))
    )


def _q_host_rank(sf_dir: str):
    """Host-level PageRank (Common Crawl host-ranking composition:
    pages → host graph → PageRank → named ranks), rank rounded(8)
    half-away like every hash-compared float. Oracle: DuckDB replays
    extraction + a 10-iteration directed-PageRank unroll WITH the
    dangling-mass term (the host graph is directed, unlike the
    symmetric copurchase graph) over the same pages parquet; the pytest
    engine-parity check remains
    (tests/test_ray_integration.py::test_host_rank_vs_direct_pagerank).
    Deterministic synthetic pages, independent of sf_dir by design."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import host_rank

    out, _ = host_rank(
        rd.from_arrow(synth_pages_table(_PAGES_ORACLE_N, seed=_PAGES_ORACLE_SEED)),
        iters=10,
    )
    return pa.table(
        {
            "host": out["host"],
            "rank": round_half_away(out["rank"].to_numpy(), 8),
        }
    )


# ---- relational / streaming-shaped ---------------------------------------
def _q_q1(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import q1_lineitem

    return q1_lineitem(sf_dir)


def _q_events_window(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_window

    return events_window(sf_dir, WINDOW_SEC)


def _q_events_sessionize(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_sessionize

    return events_sessionize(sf_dir, gap_sec=GAP_SEC)


def _q_dedup_groups(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import dedup_groups

    return dedup_groups(_docs(sf_dir), threshold=0.5)


def _q_salient_terms(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import salient_terms

    docs = _docs(sf_dir)
    return salient_terms(docs, n_docs=docs.count(), k=3)


SEARCH_TERMS = ("hash", "join", "stream")


def _q_search_topk(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.textops import search_topk

    return search_topk(_docs(sf_dir), SEARCH_TERMS, k=10)


def _q_bm25_topk(sf_dir: str):
    """Okapi BM25 ranked retrieval for the shared query terms; expression
    tree mirrored term for term in the SQL oracle, ranking on the rounded
    score so the k-cut is total."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import bm25_topk

    return bm25_topk(_docs(sf_dir), SEARCH_TERMS, k=10)


def _q_events_range_join(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_range_join

    return events_range_join(sf_dir, window_sec=600)


def _q_events_lag(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_lag

    return events_lag(sf_dir)


def _q_events_retention(sf_dir: str):
    """Retention cohorts: users by first-activity day × active-day offset
    → (cohort_day, offset_days, n_users); int day columns so the hash
    compare is type-stable."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_retention

    return events_retention(sf_dir)


def _q_fk_integrity(sf_dir: str):
    """Referential-integrity audit across all 7 FK edges of the star
    schema: distinct child keys + orphan count per relation (distinct-key
    anti-join machine; orphan DETECTION is proven by the injected-orphan
    pytest — the shipped tables are expected to audit clean)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import fk_integrity

    return fk_integrity(sf_dir)


def _q_order_priority_semi(sf_dir: str):
    """Q4-shaped EXISTS semi-join: orders with >=1 qty>=48 lineitem,
    counted per priority (distinct-key semi-join machine)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import order_priority_semi

    return order_priority_semi(sf_dir)


def _q_customer_order_histogram(sf_dir: str):
    """Q13-shaped left-join distribution: customers by exact order count,
    zero-order customers included."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        customer_order_histogram,
    )

    return customer_order_histogram(sf_dir)


def _q_small_qty_revenue(sf_dir: str):
    """Q17-shaped correlated-average join with the below-average predicate
    evaluated in exact integer arithmetic (no float-ulp flips)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import small_qty_revenue

    return small_qty_revenue(sf_dir)


def _q_large_volume_orders(sf_dir: str):
    """Q18-shaped HAVING filter + join: orders with total quantity > 250
    and their customer/price attributes."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        large_volume_orders,
    )

    return large_volume_orders(sf_dir)


def _q_shipping_priority_topk(sf_dir: str):
    """Q3-shaped filtered join + global top-10 by revenue, per-bucket
    local top-k partials so the fold never sorts the joined table."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        shipping_priority_topk,
    )

    return shipping_priority_topk(sf_dir)


def _q_waiting_suppliers(sf_dir: str):
    """Q21-shaped multi-predicate same-key join: suppliers who were the
    sole returner on multi-supplier orders, counted."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import waiting_suppliers

    return waiting_suppliers(sf_dir)


def _q_sales_opportunity(sf_dir: str):
    """Q22-shaped scalar subquery + anti-join: never-ordered customers
    above the global average positive balance, per nation."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import sales_opportunity

    return sales_opportunity(sf_dir)


def _q_events_cumsum(sf_dir: str):
    """Per-user running-sum window function, folded as exact int cents."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_cumsum

    return events_cumsum(sf_dir)


def _q_succ_reciprocity(sf_dir: str):
    """Reciprocity of the directed part-successor graph (fraction of
    directed edges whose reverse exists)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import succ_reciprocity

    return succ_reciprocity(sf_dir)


def _q_revenue_rollup(sf_dir: str):
    """GROUPING SETS rollup ((region,nation),(region),()) — one fact pass,
    higher levels folded from the finest (exact int cents)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import revenue_rollup

    return revenue_rollup(sf_dir)


def _q_user_event_pivot(sf_dir: str):
    """PIVOT events to one row per user (count per type + exact total)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import user_event_pivot

    return user_event_pivot(sf_dir)


def _q_component_size_histogram(sf_dir: str):
    """Component size distribution streamed out of the CC partition actors
    (two tiny partial-count shuffles; the driver never sees |V| rows)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        component_size_histogram,
    )

    return component_size_histogram(_sym_copurchase(sf_dir), num_parts=4)


def _q_events_ntile(sf_dir: str):
    """NTILE(4) quartile per event within its user's timeline (SQL tile
    sizing: first n%k tiles take the extra row)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_ntile

    return events_ntile(sf_dir, k=4)


def _q_user_first_last(sf_dir: str):
    """FIRST_VALUE/LAST_VALUE + count per user via partial-able
    arg-min/arg-max (per-batch one row per user)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import user_first_last

    return user_first_last(sf_dir)


def _q_events_daily_delta(sf_dir: str):
    """Window-over-aggregate: daily value totals per type with
    day-over-day delta, exact int-cent folds."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_daily_delta

    return events_daily_delta(sf_dir)


def _q_succ_inout_correlation(sf_dir: str):
    """Directed in/out-degree Pearson correlation, exact int64 moment
    partials, one mirrored float expression at the end."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        succ_inout_correlation,
    )

    return succ_inout_correlation(sf_dir)


def _q_embedding_pca(sf_dir: str):
    """One-pass distributed PCA (top-2 components of the embedding
    covariance). NO SQL ORACLE by nature: the d x d eigensolve is not
    SQL-expressible; pinned by a pytest against numpy SVD of the full
    matrix (tests/test_pca.py) — the distributed part is only the exact
    scatter/mean fold."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import embedding_pca_top
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return embedding_pca_top(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    )


def _q_quantile_sketch(sf_dir: str):
    """Mergeable bottom-k quantile sketch (deterministic md5-hash sample)
    — the oracle reconstructs the identical sample in SQL."""
    from subgraph_isomorphism_pregel_ray.pipelines.sketch import quantile_sketch_events

    return quantile_sketch_events(sf_dir)


def _q_forecast_revenue(sf_dir: str):
    """Q6-shaped pure filter-aggregate with exact int-cent predicates."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import forecast_revenue

    return forecast_revenue(sf_dir)


def _q_events_value_stats(sf_dir: str):
    """Per-type mean/variance/stddev from exact integer moments —
    no Welford/summation-order drift on either side."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_value_stats

    return events_value_stats(sf_dir)


def _q_events_ema(sf_dir: str):
    """Per-user EMA; bit-exact via recurrence-order parity with the
    recursive-CTE oracle (see relational.events_ema)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_ema

    return events_ema(sf_dir, alpha=0.25)


def _q_customer_rfm(sf_dir: str):
    """RFM quintile segmentation; NTILE replicated as closed-form integer
    arithmetic over distributed sort ordinals (TeraSort two-phase)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import customer_rfm

    return customer_rfm(sf_dir, k=5)


def _q_events_path_trigrams(sf_dir: str):
    """Second-order journey triples (the paths a first-order transition
    matrix can't see)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        events_path_trigrams,
    )

    return events_path_trigrams(sf_dir)


def _q_events_transition_matrix(sf_dir: str):
    """Markov transition counts over per-user event-type sequences."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        events_transition_matrix,
    )

    return events_transition_matrix(sf_dir)


def _q_promo_revenue(sf_dir: str):
    """Q14-shaped conditional revenue share (PROMO parts), one bucketed
    join, both sums exact int cents."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import promo_revenue

    return promo_revenue(sf_dir)


def _q_orders_active_backlog(sf_dir: str):
    """Sweep-line interval aggregation: trailing-30-day active-order
    concurrency curve via the difference-array technique."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        orders_active_backlog,
    )

    return orders_active_backlog(sf_dir)


def _q_bloom_filtered_revenue(sf_dir: str):
    """Semi-join with bloom-filter pushdown (the reference's dead T6
    concept made real): the bloom prunes the exchange, the exact bucketed
    semi-join removes false positives."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        bloom_filtered_revenue,
    )

    return bloom_filtered_revenue(sf_dir)


def _q_basket_jaccard(sf_dir: str):
    """Exact set-similarity join (PPJoin prefix filter) over order
    baskets: pairs with part-set Jaccard >= 0.5."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import basket_jaccard_pairs

    return basket_jaccard_pairs(sf_dir, threshold_pct=50)


def _q_name_near_pairs(sf_dir: str):
    """SymSpell deletion-neighborhood string-similarity self-join over
    distinct part names (edit distance <= 1)."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import name_near_pairs
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return name_near_pairs(read_table(sf_dir, "part", columns=["p_name"]))


def _q_events_props_stats(sf_dir: str):
    """Semi-structured JSON field extraction (props.k) + per-type stats."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_props_stats

    return events_props_stats(sf_dir)


def _q_parts_skyline(sf_dir: str):
    """Distributed Pareto frontier on (min price, min size): local
    skylines per batch, one frontier-only fold (skyline is associative)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import parts_skyline

    return parts_skyline(sf_dir)


def _q_bigram_cross_entropy(sf_dir: str):
    """Per-doc cross-entropy under the corpus bigram LM (conditional
    transition probabilities); docs with < 2 tokens dropped."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import bigram_cross_entropy

    return bigram_cross_entropy(_docs(sf_dir))


def _q_source_mixture_weights(sf_dir: str):
    """Uniform-target data-mixing weights per document source."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        source_mixture_weights,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return source_mixture_weights(
        read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    )


def _q_bpe_encode(sf_dir: str):
    """Train 32 BPE merges then ENCODE the whole corpus with the broadcast
    merge table → (doc_id, n_tokens_bpe): the tokenize-and-count pass every
    pretraining budget estimate runs. Oracled by _bpe_encode_sql (the
    32-round DuckDB merge replay's final word state, exploded per doc —
    valid because min-rank-first encoding ≡ the training trace for
    in-vocabulary words); also pinned by tests/test_bpe.py parity and the
    compression pytest there."""
    from subgraph_isomorphism_pregel_ray.pipelines.bpe import (
        bpe_encode_counts,
        bpe_train,
    )

    docs = _docs(sf_dir)
    return bpe_encode_counts(docs, bpe_train(docs, n_merges=32))


def _q_bpe_merges(sf_dir: str):
    """BPE tokenizer training over documents (32 merges). Oracled by
    _bpe_merges_sql: the merge fixpoint unrolls into 32 DuckDB rounds over
    the word histogram (chr(31)-separated sequence strings, pair explode →
    max-count/lex-min pick → one non-overlapping string replace per round
    — see _bpe_train_parts for why replace() ≡ _merge_seq). Also pinned by
    the hand-traced-corpus + determinism/tie-break pytests
    (tests/test_bpe.py)."""
    from subgraph_isomorphism_pregel_ray.pipelines.bpe import bpe_train

    return bpe_train(_docs(sf_dir), n_merges=32)


def _q_events_percent_rank(sf_dir: str):
    """PERCENT_RANK of value within each user's events (SQL tie
    semantics), rounded half-away at 6 for the hash compare."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        events_percent_rank,
    )

    return events_percent_rank(sf_dir)


def _q_scc_parts(sf_dir: str):
    """Strongly connected components of the DIRECTED part-successor graph
    (within each order, part of line k → part of line k+1 by l_linenumber,
    lines filtered to l_quantity <= 8 so the graph keeps real SCC structure
    — one giant component plus a periphery, the webgraph bow-tie shape).
    Engine: min-label forward/backward peeling over a flag-symmetrized CSR
    (SCCProgram); scc = the component's minimum part id, which is exactly
    what the oracle's mutual-reachability closure computes."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import scc
    from subgraph_isomorphism_pregel_ray.pipelines.relational import succ_edges

    out, _ = scc(succ_edges(sf_dir), num_parts=8)
    t = pa.table(
        {
            "vid": out["vid"].to_numpy().view(np.int64),
            "scc": out["scc"].to_numpy().view(np.int64),
        }
    )
    return t.sort_by("vid")


def _q_wpagerank(sf_dir: str):
    """Edge-WEIGHTED PageRank over the co-purchase graph with weight =
    shared-order count (copurchase_weights): w/W contribution in place of
    1/outdeg, stored in the partition layout's per-edge weight channel
    (CSRPartition.eweights). Symmetric weighted graph has no dangling
    vertices, so the comparison is a pure unroll."""
    from subgraph_isomorphism_pregel_ray.functions.rounding import round_half_away
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import weighted_pagerank
    from subgraph_isomorphism_pregel_ray.pipelines.relational import copurchase_weights

    ew = copurchase_weights(sf_dir).map_batches(
        lambda t: t.rename_columns(["src", "dst", "weight"]),
        batch_format="pyarrow",
    )
    res, _ = weighted_pagerank(ew, iters=PR_ITERS, num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "pr": round_half_away(res["rank"].to_numpy(), 8),
        }
    )


def _q_events_funnel(sf_dir: str):
    """Windowed signup→view→click→purchase funnel, first-touch semantics
    (stage k+1 strictly after — and within 48 h of — the first qualifying
    stage-k event); steps_completed yields a real drop-off curve."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import events_funnel

    return events_funnel(sf_dir)


def _q_clique5_strong(sf_dir: str):
    """5-clique count over the STRONG co-purchase graph via unlabeled
    subgraph matching: K5 with every label 0 counts each clique 120× (the
    5! automorphisms — injective embeddings), so n_cliques = count / 120.
    K5 has no degree-1 vertices, so this exercises the pure flat
    expand/verify path (every level has backward constraints). Fixed
    min_orders=2 (the match_embeddings_tri convention — the adaptive
    strong graph thins too aggressively for 5-cliques): 35 cliques at
    sf0.001; the pair density falls with sf (see the bench match_deep
    note) so larger sfs legitimately count 0."""
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.match import match_count
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_edges,
        part_labels,
    )

    ql = [0, 0, 0, 0, 0]
    qe = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    count, _ = match_count(
        symmetrize(copurchase_edges(sf_dir, min_orders=2)),
        ql,
        qe,
        labels_ds=part_labels(sf_dir, mod=1),
        num_parts=4,
        max_out_rows=BUSHY_MAX_OUT_ROWS,
        max_steps=200,
    )
    assert count % 120 == 0
    return pa.table({"n_cliques": pa.array([count // 120], type=pa.int64())})


def _q_weighted_assortativity(sf_dir: str):
    """Strength assortativity of the weighted co-purchase graph (weight =
    shared-order count): do strong co-purchasers attach to other strong
    co-purchasers? Exact-integer moment fold, one double expression."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        weighted_assortativity,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_weights,
    )

    ew = copurchase_weights(sf_dir).map_batches(
        lambda t: t.rename_columns(["src", "dst", "weight"]),
        batch_format="pyarrow",
    )
    return weighted_assortativity(ew, num_parts=4)


def _q_s_core(sf_dir: str):
    """Weighted core decomposition (s-core, Eidsaa & Almaas 2013) over the
    co-purchase graph with weight = shared-order count: the weighted
    h-index fixpoint (SCoreProgram — core_0 = strength, then
    max-over-neighbors of min(cumulative weight, estimate), neighbors
    ordered by estimate desc) — the strength analogue of kcore_copurchase;
    for unit weights the two coincide (pytest-verified)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import s_core
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_weights,
    )

    ew = copurchase_weights(sf_dir).map_batches(
        lambda t: t.rename_columns(["src", "dst", "weight"]),
        batch_format="pyarrow",
    )
    res, _ = s_core(ew, num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "core": res["core"].to_numpy(),
        }
    )


def _q_wsssp_weighted(sf_dir: str):
    """Multi-source shortest paths over STORED data weights (shared-order
    counts via the CSR weight channel) — the data-weighted Bellman-Ford
    completing WSSSP's vid-derived-weight seam. Seeds vid % 101 == 0;
    -1 unreachable."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        weighted_sssp_stored,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_weights,
    )

    ew = copurchase_weights(sf_dir).map_batches(
        lambda t: t.rename_columns(["src", "dst", "weight"]),
        batch_format="pyarrow",
    )
    res, _ = weighted_sssp_stored(ew, seed_mod=101, num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "wdist": res["wdist"].to_numpy().view(np.int64),
        }
    )


def _q_bowtie_parts(sf_dir: str):
    """Bow-tie decomposition (Broder et al. 2000) of the directed
    part-successor graph: cls ∈ {core, in, out, other} with core = the
    largest SCC (ties → smaller label), in/out = reaches / reached-from
    the core. One flag-symmetrized partition layout serves both phases
    (SCCProgram then single-seed ReachProgram from the core's min member)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import bowtie
    from subgraph_isomorphism_pregel_ray.pipelines.relational import succ_edges

    out, _core, _lin = bowtie(succ_edges(sf_dir), num_parts=8)
    t = pa.table(
        {
            "vid": out["vid"].to_numpy().view(np.int64),
            "cls": out["cls"],
        }
    )
    return t.sort_by("vid")


def _q_hll_registers(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.sketch import hll_registers_daily

    return hll_registers_daily(sf_dir)


def _q_approx_distinct(sf_dir: str):
    from subgraph_isomorphism_pregel_ray.pipelines.sketch import (
        approx_distinct_users_daily,
    )

    return approx_distinct_users_daily(sf_dir)


def _q_edge_cut_parts(sf_dir: str):
    """Partition-quality audit of the layout's vid % P partitioner over the
    symmetrized co-purchase graph: per candidate P, the cut fraction (=
    cross-partition BSP messages per superstep) and the straggler factor."""
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import edge_cut_parts

    return edge_cut_parts(_sym_copurchase(sf_dir))


def _q_host_reciprocity(sf_dir: str):
    """Directed host-graph link mutuality (Broder 2000 crawl panel).
    Deterministic synthetic pages, independent of sf_dir by design
    (same table as host_graph/host_locality)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.sources.pages import synth_pages_table
    from subgraph_isomorphism_pregel_ray.stages.extract import host_reciprocity

    return host_reciprocity(
        rd.from_arrow(synth_pages_table(_PAGES_ORACLE_N, seed=_PAGES_ORACLE_SEED))
    )


def _q_dsir_weights(sf_dir: str):
    """DSIR hashed-ngram importance log-weights vs the lang='en' target
    slice (Xie et al. 2023) — the data-mixing/selection scoring table."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import dsir_weights
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    return dsir_weights(docs)


# UNLABELED motif matches on the STRONG graph (labels = mod-1, i.e. every
# vertex label 0 — the wildcard-label path through the same match engine):
# diamond = K4 minus an edge (two triangles sharing an edge), tailed
# triangle = triangle + pendant. Non-induced ordered embedding counts,
# replayed by SQL joins with the same injectivity predicates.
DIAMOND_QL = [0, 0, 0, 0]
DIAMOND_QE = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]
TAILED_QL = [0, 0, 0, 0]
TAILED_QE = [(0, 1), (1, 2), (2, 0), (0, 3)]


def _match_strong_unlabeled(sf_dir: str, ql, qe):
    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import symmetrize
    from subgraph_isomorphism_pregel_ray.pipelines.match import match_count
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        part_labels,
        strong_copurchase_edges,
    )

    edges = symmetrize(strong_copurchase_edges(sf_dir))
    count, _ = match_count(
        edges, ql, qe, labels_ds=part_labels(sf_dir, mod=1), num_parts=4
    )
    return pa.table({"n_embeddings": pa.array([count], type=pa.int64())})


def _q_match_diamond(sf_dir: str):
    return _match_strong_unlabeled(sf_dir, DIAMOND_QL, DIAMOND_QE)


def _q_match_tailed_tri(sf_dir: str):
    return _match_strong_unlabeled(sf_dir, TAILED_QL, TAILED_QE)


def _q_lsh_bucket_histogram(sf_dir: str):
    """LSH band-bucket occupancy census (the minhash hot-bucket skew audit)."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import lsh_bucket_histogram
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return lsh_bucket_histogram(docs)


def _q_graph_summary(sf_dir: str):
    """One-row macro census of the co-purchase graph (sizing panel)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import graph_summary

    return graph_summary(_sym_copurchase(sf_dir))


def _q_transitivity(sf_dir: str):
    """Global clustering coefficient 3T/W over the co-purchase graph."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import transitivity

    return transitivity(_sym_copurchase(sf_dir), num_parts=4)


def _q_stratified_sample(sf_dir: str):
    """Equal-allocation deterministic per-lang sample (balanced eval set)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        stratified_topk_sample,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_topk_sample(docs, k=20)


def _q_quality_mixture_report(sf_dir: str):
    """Source × quality-decile doc/token-mass cross-tab (data-mixing panel)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        quality_mixture_report,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])
    return quality_mixture_report(docs)


def _q_session_depth_histogram(sf_dir: str):
    """Session-depth census over the gap-based sessionize machine."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        session_depth_histogram,
    )

    return session_depth_histogram(sf_dir)


# K4 (4-clique) labeled match over the mod-5 INDUCED co-purchase subgraph:
# the densest query the matcher faces (6 query edges, every level closes a
# cycle). The induced restriction (both endpoints ≡ 0 mod 5) is the standard
# density control — the FULL graph's K4 join is a ~10-minute DuckDB query at
# sf0.01 while the induced one oracles in <1 s with a non-trivial count
# (444 @ sf0.001, 74 @ sf0.01).
K4_MOD = 5
K4_QL = [0, 1, 2, 0]
K4_QE = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _q_match_k4(sf_dir: str):
    import os

    from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
        partition_graph,
        symmetrize,
    )
    from subgraph_isomorphism_pregel_ray.pipelines.bsp import BSPEngine
    from subgraph_isomorphism_pregel_ray.pipelines.match import build_plan
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_edges,
        part_labels,
    )

    key = f"{sf_dir}#k4mod{K4_MOD}"
    if key not in _ENGINES:

        def _induce(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy()
            dst = t["dst"].to_numpy()
            return t.filter(
                pa.array((src % K4_MOD == 0) & (dst % K4_MOD == 0))
            )

        gdir = (
            f"/tmp/graft_entry_graph_{os.path.basename(os.path.normpath(sf_dir))}"
            f"_k4mod{K4_MOD}_p4"
        )
        partition_graph(
            symmetrize(
                copurchase_edges(sf_dir).map_batches(_induce, batch_format="pyarrow")
            ),
            4,
            gdir,
            labels_ds=part_labels(sf_dir, mod=3),
            directed=True,
        )
        _ENGINES[key] = BSPEngine(gdir, 4)
    eng = _ENGINES[key]
    eng.run(
        "match",
        {"plan": build_plan(K4_QL, K4_QE)},
        max_steps=2 * len(K4_QL) + 2,
    )
    cnt = eng.scalar_results().get("embeddings", 0)
    return pa.table({"n_embeddings": pa.array([cnt], type=pa.int64())})


def _q_shapley_attribution(sf_dir: str):
    """Exact 4-channel Shapley conversion credit (the cooperative-game
    dual of markov_attribution)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        shapley_attribution,
    )

    return shapley_attribution(sf_dir)


def _q_markov_attribution(sf_dir: str):
    """Anderl-2014 Markov removal-effect channel attribution over user
    journeys (first-purchase conversion)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        markov_attribution,
    )

    return markov_attribution(sf_dir)


def _q_granger(sf_dir: str):
    """Granger 1-lag F-test between view and purchase daily series, both
    directions."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import granger_daily

    return granger_daily(sf_dir)


def _q_quality_geometry_corr(sf_dir: str):
    """Pearson r between per-doc LM cross-entropy and embedding
    Mahalanobis distance — does geometry encode quality?"""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        quality_geometry_corr,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return quality_geometry_corr(
        _emb(sf_dir), read_table(sf_dir, "documents", columns=["doc_id", "text"])
    )


def _q_knn_source_purity(sf_dir: str):
    """Per-source k-NN purity (fraction of k=5 nearest neighbors sharing
    the source) — embedding-space separability audit."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        knn_source_purity,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return knn_source_purity(
        _emb(sf_dir), read_table(sf_dir, "documents", columns=["doc_id", "source"])
    )


def _q_source_centroid_shift(sf_dir: str):
    """Per-source embedding-centroid L2 drift from the corpus centroid
    (doc_id ↔ vec_id cross-modal join)."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        source_centroid_shift,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return source_centroid_shift(
        _emb(sf_dir), read_table(sf_dir, "documents", columns=["doc_id", "source"])
    )


def _q_dow_seasonal(sf_dir: str):
    """Ratio-to-centered-7-day-MA weekly seasonal indices of the daily
    event count series."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        dow_seasonal_index,
    )

    return dow_seasonal_index(sf_dir)


def _q_disparity_filter(sf_dir: str):
    """Serrano-2009 disparity-filter backbone (α=0.05) — locally
    significant edges; zero-join per-bucket stats."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        disparity_filter,
    )

    return disparity_filter(sf_dir)


def _q_edge_backbone(sf_dir: str):
    """Top-k-per-vertex strongest-edge backbone of the weighted
    co-purchase graph (k=5, union semantics)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        edge_backbone,
    )

    return edge_backbone(sf_dir, k=5)


def _q_ucc_audit(sf_dir: str):
    """Unique-column-combination audit (Metanome UCC) over orders."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import ucc_audit

    return ucc_audit(sf_dir)


def _q_orders_profile(sf_dir: str):
    """Classic per-column profiler of orders (n, distinct, min, max as one
    typed frame) — the unknown-table first scan."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        orders_profile,
    )

    return orders_profile(sf_dir)


def _q_fd_audit(sf_dir: str):
    """Functional-dependency violation audit over three cross-table
    candidates (Metanome-style profiling)."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import fd_audit

    return fd_audit(sf_dir)


def _q_rapid_repeat_orders(sf_dir: str):
    """Burst-ordering audit: same-customer order pairs ≤7 days apart with
    exact cent deltas — customer-bucketed run expansion."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        rapid_repeat_orders,
    )

    return rapid_repeat_orders(sf_dir)


def _q_kcenter_coreset(sf_dir: str):
    """Gonzalez k-center greedy coreset over embeddings (k=8), integer-
    quantized so the farthest-point argmax replays in SQL."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        kcenter_coreset,
    )

    return kcenter_coreset(_emb(sf_dir), k=8)


def _q_adamic_adar(sf_dir: str):
    """Adamic–Adar per strong-graph edge (rare common neighbors weigh
    more) — the weighted upgrade of link_prediction_copurchase."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import adamic_adar

    return adamic_adar(sf_dir)


def _q_jl_distortion(sf_dir: str):
    """JL distortion audit: deterministic ±1 (md5-sign) projection of the
    embedding table to 8 dims; per natural pair (2t, 2t+1) the quantized
    squared-distance ratio — int64-exact up to one double division."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import jl_distortion

    return jl_distortion(_emb(sf_dir))


def _q_resource_allocation(sf_dir: str):
    """Resource-allocation index (Zhou, Lü & Zhang 2009) per strong-graph
    edge: ra(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/deg(z) — the 1/deg sibling of
    adamic_adar_copurchase (same hub-bucket wedge machinery, no ln)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import adamic_adar

    ds = adamic_adar(sf_dir, weight="ra")
    return ds.map_batches(
        lambda t: t.rename_columns(["src", "dst", "ra"]),
        batch_format="pyarrow",
    )


def _q_ldiversity(sf_dir: str):
    """Machanavajjhala l-diversity audit (l=3) of customer under
    (nation, mktsegment) with acctbal-kilobucket sensitive values."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        ldiversity_customers,
    )

    return ldiversity_customers(sf_dir, l=3)


def _q_candidate_stats(sf_dir: str):
    """The reference's PREPROCESS aggregation as a driver artifact
    (SItypes/SIAggregator.h:4-13): per chair-query vertex u the count of
    data vertices passing u's label+LDF filter (diag), and per query edge
    the count of data edges passing both endpoint filters (pair) — the
    statistics the 'candidate' plan order consumes. Rows: (kind, u1, u2,
    n) with kind 'diag' (u2 = u1) or 'pair' (u1 > u2)."""
    from subgraph_isomorphism_pregel_ray.pipelines.match import candidate_stats

    ql = [0, 1, 2, 0, 1]  # chair over the mod-3 label domain
    qe = [(0, 1), (1, 2), (2, 3), (1, 4)]
    eng = _match_engine(sf_dir)  # shared cached engine — do NOT shut down
    diag, pair = candidate_stats(eng, ql, qe)
    rows = [("diag", u, u, int(diag[u])) for u in range(len(ql))]
    rows += [("pair", a, b, int(n)) for (a, b), n in sorted(pair.items())]
    return pa.table(
        {
            "kind": pa.array([r[0] for r in rows], pa.string()),
            "u1": pa.array([r[1] for r in rows], pa.int64()),
            "u2": pa.array([r[2] for r in rows], pa.int64()),
            "n": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _q_markov_entropy(sf_dir: str):
    """Entropy rate of the user-journey chain: per-state next-event
    unpredictability weighted by the stationary distribution."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        markov_entropy_rate,
    )

    return markov_entropy_rate(sf_dir)


def _q_basket_hist(sf_dir: str):
    """Items-per-order histogram — prices the co-purchase pair-expansion
    cost (sum of C(basket, 2))."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        basket_size_histogram,
    )

    return basket_size_histogram(sf_dir)


def _q_lineitem_corr(sf_dir: str):
    """Exact-integer Pearson correlation matrix over the numeric lineitem
    measures — the profiling companion of orders_profile."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        lineitem_corr_profile,
    )

    return lineitem_corr_profile(sf_dir)


def _q_kanonymity(sf_dir: str):
    """Sweeney k-anonymity audit of customer under (nation, mktsegment)
    quasi-identifiers, k=5."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        kanonymity_customers,
    )

    return kanonymity_customers(sf_dir, k=5)


def _q_doclen_mannwhitney(sf_dir: str):
    """Mann–Whitney U (tie-corrected, integer-exact doubled ranks) between
    src0 and src1 document lengths."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        doclen_mannwhitney,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return doclen_mannwhitney(
        read_table(sf_dir, "documents", columns=["source", "n_chars"])
    )


def _q_embedding_outliers(sf_dir: str):
    """Diagonal-Mahalanobis embedding outlier top-20 (corpus per-dim
    moments broadcast once; partial top-k per block)."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        embedding_outliers,
    )

    return embedding_outliers(_emb(sf_dir), top_k=20)


def _q_degree_powerlaw(sf_dir: str):
    """CSN-2009 discrete power-law MLE over the co-purchase degree tail
    (xmin=5) — the webgraph exponent statistic."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        degree_powerlaw_mle,
    )

    return degree_powerlaw_mle(_sym_copurchase(sf_dir), xmin=5)


def _q_mst(sf_dir: str):
    """Borůvka minimum spanning forest of the weighted co-purchase graph
    (weight = co-order count, (w,u,v) total-order tie-break ≡ Kruskal)."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import boruvka_mst
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        copurchase_weights,
    )

    we = copurchase_weights(sf_dir).map_batches(
        lambda t: t.rename_columns(["src", "dst", "w"]), batch_format="pyarrow"
    )
    return boruvka_mst(we)


def _q_influence_seeds(sf_dir: str):
    """Chen-2009 DegreeDiscount greedy influence seeds (k=10) over the
    co-purchase graph — exact-integer scores, 3 supersteps per pick."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        degree_discount_seeds,
    )

    res, _ = degree_discount_seeds(_sym_copurchase(sf_dir), k=10, num_parts=4)
    return pa.table(
        {
            "rank": res["rank"].to_numpy(),
            "vid": res["vid"].to_numpy().view(np.int64),
            "dd100": res["dd100"].to_numpy(),
        }
    )


def _q_revenue_bootstrap(sf_dir: str):
    """RNG-free bootstrap of mean daily revenue: md5-indexed resampling of
    the day list (32 resamples), exact int sums, one division per row."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        revenue_bootstrap,
    )

    return revenue_bootstrap(sf_dir)


def _q_revenue_jackknife(sf_dir: str):
    """Efron jackknife SE of mean daily revenue — exact integer moments,
    one float division + sqrt."""
    from subgraph_isomorphism_pregel_ray.pipelines.relational import (
        revenue_jackknife,
    )

    return revenue_jackknife(sf_dir)


def _q_lsh_recall(sf_dir: str):
    """LSH pair-harvest recall/precision vs the exact all-pairs ground
    truth at threshold 0.5 — the dedup governance number."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import lsh_recall
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return lsh_recall(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_kmv_overlap(sf_dir: str):
    """KMV bottom-k set-overlap sketch between consecutive days' user sets
    (Beyer 2007) — estimator and exact priced side by side."""
    from subgraph_isomorphism_pregel_ray.pipelines.sketch import (
        kmv_overlap_daily,
    )

    return kmv_overlap_daily(sf_dir, k=64)


def _q_rake_keywords(sf_dir: str):
    """RAKE (Rose 2010) corpus keywords: top-25 stopword-delimited phrases
    by summed deg/freq word scores."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import rake_keywords
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return rake_keywords(
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
    )


def _q_minhash_calibration(sf_dir: str):
    """MinHash estimator calibration: est vs exact Jaccard for every LSH
    candidate pair (Broder-1997 agreement estimator audit)."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import (
        minhash_calibration,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return minhash_calibration(
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
    )


def _q_densest_subgraph(sf_dir: str):
    """Bahmani-2012 parallel densest-subgraph peel schedule over the
    co-purchase graph: (vid, peel_round); the max-density subgraph is a
    downstream fold over the schedule."""
    from subgraph_isomorphism_pregel_ray.pipelines.algorithms import (
        densest_subgraph,
    )

    res, _ = densest_subgraph(_sym_copurchase(sf_dir), num_parts=4)
    return pa.table(
        {
            "vid": res["vid"].to_numpy().view(np.int64),
            "peel_round": res["peel_round"].to_numpy(),
        }
    )


def _q_embedding_moments(sf_dir: str):
    """Per-dimension mean/variance of the embedding column — dead-dim /
    drift monitor; O(d) partials per batch, one tiny groupby."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        embedding_moments,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return embedding_moments(read_table(sf_dir, "embeddings"))


def _q_kmeans_assign(sf_dir: str):
    """One integer-quantized k-means assignment step (the oracled kernel of
    every Lloyd iteration): census of (cluster, n, inertia) against the 8
    lowest-vec_id seeds."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        kmeans_assign,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return kmeans_assign(read_table(sf_dir, "embeddings"), k=8)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup: quantized cluster assignment + within-cluster cosine ≥ τ
    keep-lowest-id verdicts; pair work bounded per cluster group."""
    from subgraph_isomorphism_pregel_ray.pipelines.similarity import (
        semantic_dedup,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return semantic_dedup(read_table(sf_dir, "embeddings"), k=8, tau=0.35)


def _q_blocklist_stats(sf_dir: str):
    """C4 blocklist filter audit per source: docs / flagged docs / token
    hits / flagged rate with the broadcast-wordlist probe."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import (
        blocklist_stats,
    )
    from subgraph_isomorphism_pregel_ray.sources.tables import read_table

    return blocklist_stats(
        read_table(sf_dir, "documents", columns=["source", "text"])
    )


# Round-5 driver window (VERDICT r4 #2): the driver oracle-checks the FIRST
# 50 registry entries, so rotate a different 50 to the front each round —
# r5 ∩ (r1∪r2∪r3∪r4) = 4 staples (pagerank/cc/triangles/match_bushy); the
# other 46 have NEVER been driver-hash-checked in any round (45 from the
# 207-entry never-checked backlog + the new round-5 match_bushy_shared),
# spanning every subsystem (graph, match, sketch, dedup, text, relational,
# events/time-series, attribution/stats, privacy, profiling, web/pages,
# embeddings). All 50 have oracle_sql entries.
_R5_WINDOW = [
    # staples kept for cross-round continuity
    "pagerank_copurchase", "cc_copurchase", "triangle_count_copurchase",
    "match_bushy",
    # NEW round 5: shared-label branch fold + conflict subtraction
    "match_bushy_shared",
    # graph algorithms (never driver-checked)
    "coarsen_matching_copurchase", "diameter_copurchase",
    "spectral_radius_copurchase", "walk_pmi_copurchase",
    "weighted_assortativity_copurchase", "clique5_strong",
    "resource_allocation_copurchase",
    # matching-side aggregation
    "candidate_stats_chair",
    # sketches
    "approx_distinct_users_daily", "lsh_bucket_histogram",
    "minhash_calibration",
    # dedup family
    "sentence_dedup", "winnow_dup_pairs", "shingle_containment",
    "dup_rate_by_source", "dup_cluster_histogram",
    # text analysis
    "lexical_diversity", "hapax_stats", "zipf_slope",
    "readability_by_source", "tokenizer_fertility", "oov_rate",
    # relational / TPC-H
    "nation_trade_volume", "top_supplier_revenue", "parts_skyline",
    "customer_rfm", "revenue_rollup",
    # events / time series
    "events_cusum", "events_holt", "revenue_trend_theilsen", "survival_km",
    "markov_stationary", "dow_seasonal_index",
    # attribution / resampling / profiling stats
    "shapley_attribution", "revenue_bootstrap", "lineitem_corr_profile",
    # privacy
    "kanonymity_customers", "ldiversity_customers",
    # data profiling
    "fd_audit", "ucc_audit",
    # web / pages-table
    "host_reciprocity", "page_indegree_histogram",
    # embeddings
    "embedding_outliers", "knn_label_vote", "cosine_histogram",
]


def queries() -> dict[str, Callable[[str], Any]]:
    base = _queries_base()
    win = set(_R5_WINDOW)
    missing = win - base.keys()
    assert not missing, f"window names absent from registry: {missing}"
    order = _R5_WINDOW + [k for k in base if k not in win]
    return {k: base[k] for k in order}


def _queries_base() -> dict[str, Callable[[str], Any]]:
    return {
        "copurchase_edges": _q_copurchase_edges,
        "degree_distribution": _q_degree,
        "graph_summary": _q_graph_summary,
        "edge_cut_parts": _q_edge_cut_parts,
        "transitivity_copurchase": _q_transitivity,
        "pagerank_copurchase": _q_pagerank,
        "cc_copurchase": _q_cc,
        "sssp_copurchase": _q_sssp,
        "betweenness_copurchase": _q_betweenness,
        "closeness_copurchase": _q_closeness,
        "wsssp_copurchase": _q_wsssp,
        "rich_club_copurchase": _q_rich_club,
        "coloring_copurchase": _q_coloring,
        "events_sorted": _q_events_sorted,
        "lpa_modularity_copurchase": _q_lpa_modularity,
        "katz_copurchase": _q_katz,
        "link_prediction_copurchase": _q_link_prediction,
        "mis_copurchase": _q_mis,
        "triangle_count_copurchase": _q_triangles,
        "clustering_coeff_copurchase": _q_clustering,
        "assortativity_copurchase": _q_assortativity,
        "ppr_copurchase": _q_ppr,
        "hll_registers_daily": _q_hll_registers,
        "bipartite_copurchase": _q_bipartite,
        "semi_clustering_strong": _q_semi_clustering,
        "revenue_by_nation": _q_revenue_by_nation,
        "matching_copurchase": _q_matching,
        "coarsen_matching_copurchase": _q_coarsen_matching,
        "diameter_copurchase": _q_diameter,
        "spectral_radius_copurchase": _q_spectral_radius,
        "semantic_dedup": _q_semantic_dedup,
        "butterfly_count_orders": _q_butterflies,
        "brand_discount_elasticity": _q_brand_elasticity,
        "repeat_purchase_rate": _q_repeat_purchase,
        "part_supplier_hhi": _q_part_supplier_hhi,
        "hits_copurchase": _q_hits,
        "random_walks_copurchase": _q_random_walks,
        "walk_pmi_copurchase": _q_walk_pmi,
        "lpa_copurchase": _q_lpa,
        "kmeans_assign": _q_kmeans_assign,
        "kcore_copurchase": _q_kcore,
        "ktruss_copurchase": _q_ktruss,
        "match_triangle_labeled": _q_match_triangle,
        "match_p3_labeled": _q_match_p3,
        "match_4cycle_labeled": _q_match_4cycle,
        "match_deep_tree": _q_match_deep_tree,
        "match_bushy": _q_match_bushy,
        "match_bushy_deep": _q_match_bushy_deep,
        "match_bushy_fold3": _q_match_bushy_fold3,
        "match_bushy_shared": _q_match_bushy_shared,
        "match_embeddings_tri": _q_match_embeddings_tri,
        "match_triangle_per_root": _q_match_triangle_per_root,
        "match_k4_labeled": _q_match_k4,
        "token_count": _q_token_count,
        "text_stats": _q_text_stats,
        "exact_dedup": _q_exact_dedup,
        "dsir_weights": _q_dsir_weights,
        "sentence_dedup": _q_sentence_dedup,
        "incremental_dedup": _q_incremental_dedup,
        "corpus_clean": _q_corpus_clean,
        "gopher_quality_by_source": _q_gopher_quality,
        "vocab_topk": _q_vocab_topk,
        "vocab_coverage_curve": _q_vocab_coverage_curve,
        "shard_balance": _q_shard_balance,
        "heavy_hitters": _q_heavy_hitters,
        "eccentricity_copurchase": _q_eccentricity,
        "events_asof": _q_events_asof,
        "events_quantiles": _q_events_quantiles,
        "spam_mass_copurchase": _q_spam_mass,
        "nation_trade_volume": _q_nation_trade_volume,
        "returned_customer_topk": _q_returned_customer_topk,
        "disjunctive_revenue": _q_disjunctive_revenue,
        "product_type_profit": _q_product_type_profit,
        "late_shipment_rate": _q_late_shipment_rate,
        "nation_market_share": _q_nation_market_share,
        "top_supplier_revenue": _q_top_supplier_revenue,
        "supplier_variety": _q_supplier_variety,
        "min_cost_supplier": _q_min_cost_supplier,
        "duplicate_ngram_fraction": _q_duplicate_ngram_fraction,
        "tfidf_cosine_pairs": _q_tfidf_cosine_pairs,
        "source_gram_overlap": _q_source_gram_overlap,
        "events_cusum": _q_events_cusum,
        "events_holt": _q_events_holt,
        "important_parts_value": _q_important_parts_value,
        "bulk_suppliers": _q_bulk_suppliers,
        "succ_triad_motifs": _q_succ_triad_motifs,
        "source_kl": _q_source_kl,
        "basket_lift": _q_basket_lift,
        "knn_label_vote": _q_knn_label_vote,
        "cosine_histogram": _q_cosine_histogram,
        "pii_density_by_source": _q_pii_density_by_source,
        "degree_gini": _q_degree_gini,
        "avg_neighbor_degree": _q_avg_neighbor_degree,
        "ngram_novelty": _q_ngram_novelty,
        "revenue_autocorr": _q_revenue_autocorr,
        "top_customer_share": _q_top_customer_share,
        "orders_fill_rate": _q_orders_fill_rate,
        "bfs_layer_sizes": _q_bfs_layer_sizes,
        "label_conductance": _q_label_conductance,
        "two_hop_reach": _q_two_hop_reach,
        "local_bridges": _q_local_bridges,
        "customer_migration": _q_customer_migration,
        "events_disorder": _q_events_disorder,
        "scc_size_histogram": _q_scc_size_histogram,
        "doclen_histogram": _q_doclen_histogram,
        "split_leakage": _q_split_leakage,
        "dup_cluster_histogram": _q_dup_cluster_histogram,
        "kshell_histogram": _q_kshell_histogram,
        "order_value_magnitude": _q_order_value_magnitude,
        "user_activity_streaks": _q_user_activity_streaks,
        "benford_first_digit": _q_benford_first_digit,
        "conversion_latency": _q_conversion_latency,
        "isolated_parts": _q_isolated_parts,
        "events_mad": _q_events_mad,
        "revenue_pareto": _q_revenue_pareto,
        "wcc_parts": _q_wcc_parts,
        "weekly_stickiness": _q_weekly_stickiness,
        "gram_entropy": _q_gram_entropy,
        "lexical_diversity": _q_lexical_diversity,
        "hapax_stats": _q_hapax_stats,
        "frequent_triples": _q_frequent_triples,
        "etype_cooccur_lift": _q_etype_cooccur_lift,
        "lang_source_chi2": _q_lang_source_chi2,
        "condensation_levels": _q_condensation_levels,
        "lang_log_odds": _q_lang_log_odds,
        "user_acquisition_curve": _q_user_acquisition_curve,
        "weekly_churn": _q_weekly_churn,
        "ltm_cascade_copurchase": _q_ltm_cascade,
        "rrf_fusion": _q_rrf_fusion,
        "bounce_rate_daily": _q_bounce_rate_daily,
        "revenue_trend_theilsen": _q_revenue_trend_theilsen,
        "attack_tolerance_parts": _q_attack_tolerance,
        "order_value_gini": _q_order_value_gini,
        "order_value_trimmed_mean": _q_order_value_trimmed_mean,
        "user_hour_entropy": _q_user_hour_entropy,
        "survival_km": _q_survival_km,
        "markov_stationary": _q_markov_stationary,
        "customer_order_gaps": _q_customer_order_gaps,
        "cohort_ltv": _q_cohort_ltv,
        "returns_rate_by_brand": _q_returns_rate_by_brand,
        "degree_quantiles": _q_degree_quantiles,
        "events_acf": _q_events_acf,
        "dow_revenue_anomaly": _q_dow_revenue_anomaly,
        "late_events": _q_late_events,
        "weighted_sample_orders": _q_weighted_sample_orders,
        "revenue_outlier_days": _q_revenue_outlier_days,
        "events_heatmap": _q_events_heatmap,
        "weekday_revenue": _q_weekday_revenue,
        "window_distinct_users": _q_window_distinct_users,
        "revenue_by_region": _q_revenue_by_region,
        "topk_parts_per_nation": _q_topk_parts,
        "documents_sample": _q_documents_sample,
        "train_val_test_split": _q_train_val_test,
        "copurchase_weights": _q_copurchase_weights,
        "events_rolling": _q_events_rolling,
        "events_zscore": _q_events_zscore,
        "user_gap_cv": _q_user_gap_cv,
        "user_type_entropy": _q_user_type_entropy,
        "session_conversion": _q_session_conversion,
        "doc_cross_entropy": _q_doc_cross_entropy,
        "curriculum_buckets": _q_curriculum_buckets,
        "zipf_slope": _q_zipf_slope,
        "kmeans_embeddings": _q_kmeans,
        "distinct_users_daily": _q_distinct_users,
        "parts_never_ordered": _q_parts_never_ordered,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "winnow_fingerprints": _q_winnow,
        "countmin_topk": _q_countmin,
        "nb_source_pred": _q_nb_source_pred,
        "lang_by_source": _q_lang_by_source,
        "tokenizer_fertility": _q_tokenizer_fertility,
        "embedding_label_centroids": _q_embedding_label_centroids,
        "simhash": _q_simhash,
        "minhash_dup_pairs": _q_minhash_pairs,
        "embedding_dup_pairs": _q_embedding_dups,
        "ann_topk": _q_ann_topk,
        "ann_topk_ivf": _q_ann_topk_ivf,
        "q1_pricing_summary": _q_q1,
        "events_window": _q_events_window,
        "events_sessionize": _q_events_sessionize,
        "dedup_groups": _q_dedup_groups,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "dup_span_pairs": _q_dup_span_pairs,
        "winnow_dup_pairs": _q_winnow_dup_pairs,
        "shingle_containment": _q_shingle_containment,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "simhash_dup_pairs": _q_simhash_pairs,
        "media_features": _q_media_features,
        "host_graph": _q_host_graph,
        "host_locality": _q_host_locality,
        "page_indegree_histogram": _q_page_indegree_histogram,
        "crawl_recency": _q_crawl_recency,
        "host_lang_mix": _q_host_lang_mix,
        "host_rank": _q_host_rank,
        "events_range_join": _q_events_range_join,
        "events_lag": _q_events_lag,
        "scc_parts": _q_scc_parts,
        "bowtie_parts": _q_bowtie_parts,
        "wpagerank_copurchase": _q_wpagerank,
        "wsssp_weighted_copurchase": _q_wsssp_weighted,
        "s_core_copurchase": _q_s_core,
        "weighted_assortativity_copurchase": _q_weighted_assortativity,
        "clique5_strong": _q_clique5_strong,
        "events_funnel": _q_events_funnel,
        "anchor_index": _q_anchor_index,
        "oov_rate": _q_oov_rate,
        "events_retention": _q_events_retention,
        "events_percent_rank": _q_events_percent_rank,
        "fk_integrity": _q_fk_integrity,
        "order_priority_semi": _q_order_priority_semi,
        "customer_order_histogram": _q_customer_order_histogram,
        "small_qty_revenue": _q_small_qty_revenue,
        "large_volume_orders": _q_large_volume_orders,
        "shipping_priority_topk": _q_shipping_priority_topk,
        "waiting_suppliers": _q_waiting_suppliers,
        "sales_opportunity": _q_sales_opportunity,
        "events_cumsum": _q_events_cumsum,
        "succ_reciprocity": _q_succ_reciprocity,
        "revenue_rollup": _q_revenue_rollup,
        "user_event_pivot": _q_user_event_pivot,
        "component_size_histogram": _q_component_size_histogram,
        "salient_terms": _q_salient_terms,
        "search_topk": _q_search_topk,
        "bm25_topk": _q_bm25_topk,
        "bpe_merges": _q_bpe_merges,
        "bpe_encode": _q_bpe_encode,
        "events_ntile": _q_events_ntile,
        "user_first_last": _q_user_first_last,
        "bigram_cross_entropy": _q_bigram_cross_entropy,
        "source_mixture_weights": _q_source_mixture_weights,
        "temperature_mixture": _q_temperature_mixture,
        "events_daily_delta": _q_events_daily_delta,
        "events_props_stats": _q_events_props_stats,
        "parts_skyline": _q_parts_skyline,
        "name_near_pairs": _q_name_near_pairs,
        "basket_jaccard_pairs": _q_basket_jaccard,
        "bloom_filtered_revenue": _q_bloom_filtered_revenue,
        "orders_active_backlog": _q_orders_active_backlog,
        "promo_revenue": _q_promo_revenue,
        "events_transition_matrix": _q_events_transition_matrix,
        "events_path_trigrams": _q_events_path_trigrams,
        "customer_rfm": _q_customer_rfm,
        "events_ema": _q_events_ema,
        "succ_inout_correlation": _q_succ_inout_correlation,
        "forecast_revenue": _q_forecast_revenue,
        "events_value_stats": _q_events_value_stats,
        "quantile_sketch_events": _q_quantile_sketch,
        "embedding_pca_top": _q_embedding_pca,
        "label_mixing_copurchase": _q_label_mixing,
        "approx_distinct_users_daily": _q_approx_distinct,
        "doc_repetition": _q_doc_repetition,
        "contamination": _q_contamination,
        "unigram_quality": _q_unigram_quality,
        "length_filter_sweep": _q_length_filter_sweep,
        "neighbor_sample_copurchase": _q_neighbor_sample,
        "chunk_documents": _q_chunk_documents,
        "pack_sequences": _q_pack_sequences,
        "hyperball_copurchase": _q_hyperball,
        "redact_pii": _q_redact_pii,
        "curate_corpus": _q_curate_corpus,
        "knn_graph": _q_knn_graph,
        "events_hopping": _q_events_hopping,
        "collocations_topk": _q_collocations,
        "readability_by_source": _q_readability_by_source,
        "heaps_law_curve": _q_heaps_law_curve,
        "lang_confusion": _q_lang_confusion,
        "token_freq_spectrum": _q_token_freq_spectrum,
        "doclen_percentiles_by_lang": _q_doclen_percentiles_by_lang,
        "stratified_sample": _q_stratified_sample,
        "quality_mixture_report": _q_quality_mixture_report,
        "host_reciprocity": _q_host_reciprocity,
        "session_depth_histogram": _q_session_depth_histogram,
        "match_diamond_strong": _q_match_diamond,
        "match_tailed_tri_strong": _q_match_tailed_tri,
        "lsh_bucket_histogram": _q_lsh_bucket_histogram,
        "densest_subgraph_copurchase": _q_densest_subgraph,
        "minhash_calibration": _q_minhash_calibration,
        "rake_keywords": _q_rake_keywords,
        "influence_seeds_copurchase": _q_influence_seeds,
        "mst_copurchase": _q_mst,
        "degree_powerlaw_mle": _q_degree_powerlaw,
        "embedding_outliers": _q_embedding_outliers,
        "doclen_mannwhitney": _q_doclen_mannwhitney,
        "adamic_adar_copurchase": _q_adamic_adar,
        "resource_allocation_copurchase": _q_resource_allocation,
        "kanonymity_customers": _q_kanonymity,
        "candidate_stats_chair": _q_candidate_stats,
        "ldiversity_customers": _q_ldiversity,
        "markov_entropy_rate": _q_markov_entropy,
        "basket_size_histogram": _q_basket_hist,
        "lineitem_corr_profile": _q_lineitem_corr,
        "kcenter_coreset": _q_kcenter_coreset,
        "rapid_repeat_orders": _q_rapid_repeat_orders,
        "orders_profile": _q_orders_profile,
        "fd_audit": _q_fd_audit,
        "ucc_audit": _q_ucc_audit,
        "edge_backbone": _q_edge_backbone,
        "disparity_filter": _q_disparity_filter,
        "dow_seasonal_index": _q_dow_seasonal,
        "source_centroid_shift": _q_source_centroid_shift,
        "knn_source_purity": _q_knn_source_purity,
        "quality_geometry_corr": _q_quality_geometry_corr,
        "granger_daily": _q_granger,
        "markov_attribution": _q_markov_attribution,
        "shapley_attribution": _q_shapley_attribution,
        "kmv_overlap_daily": _q_kmv_overlap,
        "lsh_recall": _q_lsh_recall,
        "revenue_jackknife": _q_revenue_jackknife,
        "revenue_bootstrap": _q_revenue_bootstrap,
        "ivf_recall": _q_ivf_recall,
        "embedding_moments": _q_embedding_moments,
        "jl_distortion": _q_jl_distortion,
        "vertex_cover_copurchase": _q_vertex_cover,
        "seeded_labels_copurchase": _q_seeded_labels,
        "blocklist_stats": _q_blocklist_stats,
    }


# ---------------------------------------------------------------------------
_EU = (
    "eu AS (SELECT a.l_partkey AS src, b.l_partkey AS dst "
    "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
    "WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2)"
)
_ESYM = (
    "e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst "
    "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
    "WHERE a.l_partkey <> b.l_partkey GROUP BY 1, 2)"
)
_ESYM_MAT = _ESYM.replace("e AS (", "e AS MATERIALIZED (", 1)


def _acf_sql(max_lag: int = 7) -> str:
    """Per-lag Pearson r over (count(d), count(d+lag)) day pairs —
    HUGEINT moments, engine op order, one UNION ALL row per lag."""
    head = (
        "WITH d AS (SELECT epoch_us(ts) // 86400000000 dy, "
        "CAST(count(*) AS BIGINT) c FROM events GROUP BY 1) "
    )
    rows = []
    for lag in range(1, max_lag + 1):
        rows.append(
            f"SELECT CAST({lag} AS BIGINT) AS \"lag\", "
            "CAST(count(*) AS BIGINT) AS n_pairs, "
            "round(CAST(count(*) * sum(CAST(x AS HUGEINT) * y) - "
            "sum(x) * sum(y) AS DOUBLE) / "
            "(sqrt(CAST(count(*) * sum(CAST(x AS HUGEINT) * x) - "
            "sum(x) * sum(x) AS DOUBLE)) * "
            "sqrt(CAST(count(*) * sum(CAST(y AS HUGEINT) * y) - "
            "sum(y) * sum(y) AS DOUBLE))), 6) AS acf "
            f"FROM (SELECT a.c x, b.c y FROM d a JOIN d b "
            f"ON b.dy = a.dy + {lag})"
        )
    return head + " UNION ALL ".join(rows)


def _degree_quantiles_sql(qs=(0.5, 0.9, 0.99)) -> str:
    """Explicit percentile_cont interpolation per q over the ranked
    co-purchase degree table (mirrors v[lo] + frac·(v[hi]−v[lo]))."""
    head = (
        f"WITH {_ESYM_MAT}, "
        "deg AS (SELECT src AS vid, CAST(count(*) AS BIGINT) d "
        "FROM e GROUP BY 1), "
        "o AS MATERIALIZED (SELECT d, row_number() OVER (ORDER BY d, vid) rn "
        "FROM deg), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) n FROM deg) "
    )
    rows = []
    for q in qs:
        pos = f"(SELECT CAST(n - 1 AS DOUBLE) * {q} FROM nn)"
        lo = f"CAST(floor({pos}) AS BIGINT) + 1"
        hi = f"least(CAST(floor({pos}) AS BIGINT) + 2, (SELECT n FROM nn))"
        rows.append(
            f"SELECT {q} AS quantile, (SELECT n FROM nn) AS n_vertices, "
            f"round((SELECT CAST(d AS DOUBLE) FROM o WHERE rn = {lo}) + "
            f"({pos} - floor({pos})) * "
            f"(SELECT CAST(h.d - l.d AS DOUBLE) FROM o l, o h "
            f"WHERE l.rn = {lo} AND h.rn = {hi}), 6) AS value"
        )
    return head + " UNION ALL ".join(rows)


def _markov_sql(iters: int = 8) -> str:
    """Unrolled power iteration π ← πP over the lag-pair transition
    chain; P row-normalized in DOUBLE exactly as the engine."""
    parts = [
        "WITH x AS (SELECT event_type t, lag(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) f FROM events)",
        "c AS (SELECT f, t, CAST(count(*) AS BIGINT) n FROM x "
        "WHERE f IS NOT NULL GROUP BY 1, 2)",
        "types AS (SELECT f AS ty FROM c UNION SELECT t FROM c)",
        "tn AS (SELECT CAST(count(*) AS DOUBLE) k FROM types)",
        "rs AS (SELECT f, CAST(sum(n) AS BIGINT) s FROM c GROUP BY 1)",
        "m AS MATERIALIZED (SELECT c.f, c.t, "
        "CAST(c.n AS DOUBLE) / CAST(rs.s AS DOUBLE) p FROM c "
        "JOIN rs USING (f))",
        "p0 AS (SELECT ty, 1.0 / (SELECT k FROM tn) pr FROM types)",
    ]
    for r in range(1, iters + 1):
        parts.append(
            f"p{r} AS (SELECT m.t ty, sum(p{r-1}.pr * m.p) pr "
            f"FROM p{r-1} JOIN m ON m.f = p{r-1}.ty GROUP BY 1)"
        )
    return ", ".join(parts) + (
        f" SELECT ty AS event_type, round(pr, 6) AS stationary_prob "
        f"FROM p{iters}"
    )



def _markov_entropy_sql(iters: int = 8) -> str:
    """markov_stationary's unrolled chain + per-row Shannon entropies:
    H-contribution per state = π_i · (−Σ_j P_ij ln P_ij)."""
    base = _markov_sql(iters)
    head = base[: base.rindex(" SELECT ")]
    return (
        head
        + ", rh AS (SELECT f AS ty, -sum(p * ln(p)) AS rh FROM m GROUP BY 1) "
        + f"SELECT p{iters}.ty AS event_type, round(p{iters}.pr, 6) "
        "AS stationary_prob, round(rh.rh, 6) AS row_entropy, "
        f"round(p{iters}.pr * rh.rh, 6) AS contrib "
        f"FROM p{iters} JOIN rh USING (ty)"
    )


def _ltm_sql(rounds: int = 10, seed_mod: int = 13, num: int = 1,
             den: int = 8) -> str:
    """Unrolled linear-threshold cascade: a_r = a_{r-1} ∪ {v : den·|N(v)
    ∩ a_{r-1}| ≥ num·deg(v)}. The cascade is MONOTONE, so once it hits
    its fixpoint extra unrolled rounds are idempotent — ``rounds`` = 10
    is double the observed convergence (≤ 5 at both test sfs; the
    engine runs to true convergence, so only the fixpoint must agree)."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "deg AS MATERIALIZED (SELECT src AS vid, "
        "CAST(count(*) AS BIGINT) d FROM e GROUP BY 1)",
        f"a0 AS MATERIALIZED (SELECT vid FROM verts WHERE vid % {seed_mod} = 0)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT vid FROM a{r-1} UNION "
            f"SELECT t.vid FROM (SELECT e.dst AS vid, "
            f"CAST(count(*) AS BIGINT) c FROM e JOIN a{r-1} s "
            f"ON s.vid = e.src GROUP BY 1) t "
            f"JOIN deg ON deg.vid = t.vid WHERE {den} * t.c >= {num} * deg.d)"
        )
    acts = " UNION ALL ".join(
        f"SELECT vid, {r} r FROM a{r}" for r in range(rounds + 1)
    )
    parts.append(f"acts AS (SELECT vid, min(r) ra FROM ({acts}) GROUP BY 1)")
    return ", ".join(parts) + (
        " SELECT v.vid, CAST(COALESCE(acts.ra, -1) AS BIGINT) "
        "AS activated_round FROM verts v LEFT JOIN acts ON acts.vid = v.vid "
        "ORDER BY 1"
    )


def _attack_sql(ks=(0, 2, 4, 6, 8)) -> str:
    """Per-k hub removal + symmetric reachability closure (comp = min
    reachable vid — no round unroll to size, the closure IS the
    fixpoint); one stat row per k, UNION ALL'd."""
    head = (
        "WITH seq AS (SELECT l_orderkey, l_linenumber, l_partkey, "
        "lag(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) "
        "AS prev FROM lineitem WHERE l_quantity <= 8), "
        "edges AS (SELECT DISTINCT prev AS src, l_partkey AS dst FROM seq "
        "WHERE prev IS NOT NULL AND prev <> l_partkey), "
        "es AS MATERIALIZED (SELECT src, dst FROM edges "
        "UNION SELECT dst, src FROM edges), "
        "deg AS MATERIALIZED (SELECT src AS v, CAST(count(*) AS BIGINT) dg "
        "FROM es GROUP BY 1), "
        "hubs AS MATERIALIZED (SELECT v, row_number() OVER "
        "(ORDER BY dg DESC, v) rn FROM deg)"
    )
    blocks, stats = [], []
    for k in ks:
        blocks.append(
            f"e{k} AS MATERIALIZED (SELECT src, dst FROM es "
            f"WHERE src NOT IN (SELECT v FROM hubs WHERE rn <= {k}) "
            f"AND dst NOT IN (SELECT v FROM hubs WHERE rn <= {k})), "
            f"c{k} AS MATERIALIZED (WITH RECURSIVE r(u, v) AS ("
            f"SELECT src, src FROM e{k} UNION "
            f"SELECT r.u, e.dst FROM r JOIN e{k} e ON e.src = r.v) "
            f"SELECT u, min(v) AS c FROM r GROUP BY u)"
        )
        stats.append(
            f"SELECT CAST({k} AS BIGINT) AS k_removed, "
            f"CAST(sum(cnt) AS BIGINT) AS n_vertices, "
            f"CAST(count(*) AS BIGINT) AS n_components, "
            f"CAST(max(cnt) AS BIGINT) AS giant_size FROM "
            f"(SELECT c, count(*) cnt FROM c{k} GROUP BY 1)"
        )
    return (
        head + ", " + ", ".join(blocks) + " " + " UNION ALL ".join(stats)
    )


def _pagerank_sql(iters: int, damping: float = 0.85) -> str:
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "nv AS MATERIALIZED (SELECT count(*) AS n FROM v)",
        "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS outdeg FROM e GROUP BY 1)",
        "r0 AS MATERIALIZED (SELECT vid, 1.0 / (SELECT n FROM nv) AS pr FROM v)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT d.vid, (1 - {damping}) / (SELECT n FROM nv) + "
            f"{damping} * coalesce(s.c, 0) AS pr FROM deg d LEFT JOIN ("
            f"SELECT e.dst AS vid, sum(r.pr / d2.outdeg) AS c "
            f"FROM e JOIN r{i-1} r ON r.vid = e.src "
            f"JOIN deg d2 ON d2.vid = e.src GROUP BY e.dst) s ON s.vid = d.vid)"
        )
    return (
        ", ".join(parts) + f" SELECT vid, round(pr, 8) AS pr FROM r{iters}"
    )


def _pages_oracle_sqls() -> dict[str, str]:
    """DuckDB oracles for the pages-derived queries (host_graph,
    anchor_index, host_rank). The pages table is not among the driver's
    pre-registered views, so each statement reads the byte-identical
    deterministic parquet that :func:`_pages_oracle_parquet` writes —
    the same input table the Ray queries generate in memory (the
    generator is pure in (n, seed)).

    The RE2 patterns are exact on this corpus — every href is quoted
    and free of whitespace/quotes, anchors contain no nested tags and
    no entities other than ``&nbsp;``, urls are lowercase with no
    trailing slash — so the narrower single-group patterns here are
    equivalent to ``functions/extract.py``'s alternation patterns on
    that domain (same corpus-restriction rationale as ``redact_pii``).
    Validated cell-exact against the pure-scalar extractor references
    before wiring (host_graph 400 rows, anchor_index 1939 rows,
    host_rank 20 hosts at n=2000/seed=42)."""
    path = _pages_oracle_parquet()
    pat_href = r"""<a\s[^>]*?href\s*=\s*["']?([^"'\s>]+)"""
    pat_link = r"""<a\s[^>]*?href\s*=\s*["']?[^"'\s>]+[^>]*>[^<]*</a\s*>"""
    pat_link_href = r"""href\s*=\s*["']?([^"'\s>]+)"""
    host_pat = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
    scheme_host_pat = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"

    hosts_cte = (
        f"WITH pages AS (SELECT url, decode(html) AS h "
        f"FROM read_parquet('{path}')), "
        f"raw AS (SELECT url, unnest(regexp_extract_all(h, "
        f"$re${pat_href}$re$, 1)) AS href FROM pages), "
        f"hosts AS (SELECT lower(regexp_extract(url, '{host_pat}', 1)) "
        f"AS sh, lower(regexp_extract(href, '{host_pat}', 1)) AS dh "
        f"FROM raw)"
    )

    host_graph_sql = (
        f"{hosts_cte} "
        "SELECT sh AS src_host, "
        "CASE WHEN dh = '' THEN sh ELSE dh END AS dst_host, "
        "CAST(count(*) AS BIGINT) AS n_links FROM hosts GROUP BY 1, 2"
    )

    anchor_index_sql = (
        f"WITH pages AS (SELECT decode(html) AS h "
        f"FROM read_parquet('{path}')), "
        f"lnk AS (SELECT unnest(regexp_extract_all(h, "
        f"$re${pat_link}$re$)) AS l FROM pages), "
        f"pairs0 AS (SELECT regexp_extract(l, $re${pat_link_href}$re$, 1) "
        "AS href, trim(regexp_replace(replace("
        "regexp_extract(l, '>([^<]*)</a', 1), '&nbsp;', ' '), "
        r"'\s+', ' ', 'g')) AS anchor FROM lnk), "
        "pairs1 AS (SELECT CASE WHEN position('#' IN href) > 0 "
        "THEN substr(href, 1, position('#' IN href) - 1) ELSE href END "
        "AS u, anchor FROM pairs0 WHERE anchor <> ''), "
        f"pairs AS (SELECT concat(lower(regexp_extract(u, "
        f"'{scheme_host_pat}', 1)), regexp_replace(u, "
        f"'{scheme_host_pat}', '')) AS dst_url, anchor FROM pairs1), "
        "agg AS (SELECT dst_url, anchor, count(*) AS n FROM pairs "
        "GROUP BY 1, 2), "
        "ranked AS (SELECT dst_url, anchor, n, row_number() OVER ("
        "PARTITION BY dst_url ORDER BY n DESC, anchor ASC) AS rk, "
        "sum(n) OVER (PARTITION BY dst_url) AS tot, "
        "count(*) OVER (PARTITION BY dst_url) AS na FROM agg) "
        "SELECT dst_url, CAST(tot AS BIGINT) AS n_links, "
        "CAST(na AS BIGINT) AS n_anchors, anchor AS top_anchor, "
        "CAST(n AS BIGINT) AS top_n FROM ranked WHERE rk = 1"
    )

    # host_rank: directed PageRank unroll (10 iters, d=0.85) WITH the
    # dangling-mass term — r_i(v) = (1-d)/n + d*(Σ_in r/outdeg + D/n),
    # D = Σ r_{i-1} over outdeg-0 hosts; matches PageRankProgram.apply's
    # op order ((1-d)/n + d*(in_sum + dangling/n)) so round(8) is exact.
    parts = [
        f"{hosts_cte}, "
        "e AS MATERIALIZED (SELECT DISTINCT sh AS src, "
        "CASE WHEN dh = '' THEN sh ELSE dh END AS dst FROM hosts "
        "WHERE sh <> CASE WHEN dh = '' THEN sh ELSE dh END), "
        "v AS MATERIALIZED (SELECT src AS vid FROM e "
        "UNION SELECT dst FROM e), "
        "nv AS MATERIALIZED (SELECT count(*) AS n FROM v), "
        "deg AS MATERIALIZED (SELECT v.vid, coalesce(o.c, 0) AS outdeg "
        "FROM v LEFT JOIN (SELECT src AS vid, count(*) AS c FROM e "
        "GROUP BY 1) o ON o.vid = v.vid), "
        "r0 AS MATERIALIZED (SELECT vid, 1.0 / (SELECT n FROM nv) "
        "AS pr FROM v)"
    ]
    for i in range(1, 11):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT d.vid, "
            "(1 - 0.85) / (SELECT n FROM nv) + 0.85 * ("
            "coalesce(s.c, 0) + (SELECT coalesce(sum(p.pr), 0) "
            f"FROM r{i - 1} p JOIN deg dg ON dg.vid = p.vid "
            "AND dg.outdeg = 0) / (SELECT n FROM nv)) AS pr "
            "FROM deg d LEFT JOIN (SELECT e.dst AS vid, "
            f"sum(r.pr / d2.outdeg) AS c FROM e JOIN r{i - 1} r "
            "ON r.vid = e.src JOIN deg d2 ON d2.vid = e.src "
            "GROUP BY e.dst) s ON s.vid = d.vid)"
        )
    host_rank_sql = (
        ", ".join(parts) + " SELECT vid AS host, round(pr, 8) AS rank FROM r10"
    )

    host_locality_sql = (
        # per-host intra-host link share over the SAME normalized host
        # pairs as host_graph (relative hrefs → own host); counts are
        # exact ints, the fraction one IEEE division of the int64 sums
        f"{hosts_cte}, "
        "e AS (SELECT sh, CASE WHEN dh = '' THEN sh ELSE dh END AS dh2 "
        "FROM hosts) "
        "SELECT sh AS host, CAST(count(*) AS BIGINT) AS n_links, "
        "CAST(sum(CASE WHEN dh2 = sh THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_self_links, "
        "round(CAST(sum(CASE WHEN dh2 = sh THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ CAST(count(*) AS DOUBLE), 6) AS self_fraction "
        "FROM e GROUP BY 1"
    )
    page_indegree_sql = (
        # in-degree per normalized target url (fragment strip + lowercase
        # scheme+host — normalize_url restricted to this corpus: urls are
        # lowercase, non-root, no trailing slash), then floor(log2) buckets;
        # log2/floor of exact ints < 2^53 are exact IEEE ops
        f"WITH pages AS (SELECT decode(html) AS h "
        f"FROM read_parquet('{path}')), "
        f"raw AS (SELECT unnest(regexp_extract_all(h, "
        f"$re${pat_href}$re$, 1)) AS href FROM pages), "
        "u1 AS (SELECT CASE WHEN position('#' IN href) > 0 "
        "THEN substr(href, 1, position('#' IN href) - 1) ELSE href END "
        "AS u FROM raw), "
        f"norm AS (SELECT concat(lower(regexp_extract(u, "
        f"'{scheme_host_pat}', 1)), regexp_replace(u, "
        f"'{scheme_host_pat}', '')) AS dst FROM u1), "
        "c AS (SELECT dst, count(*) AS n FROM norm GROUP BY 1) "
        "SELECT CAST(floor(log2(n)) AS BIGINT) AS indeg_bucket, "
        "CAST(count(*) AS BIGINT) AS n_urls FROM c GROUP BY 1"
    )
    crawl_recency_sql = (
        # per-host capture-time census over page urls (no href parse);
        # epoch_us and the floor-div span are exact int64
        f"WITH p AS (SELECT lower(regexp_extract(url, '{host_pat}', 1)) "
        f"AS host, epoch_us(warc_ts) AS ts FROM read_parquet('{path}')) "
        "SELECT host, CAST(count(*) AS BIGINT) AS n_pages, "
        "CAST(min(ts) AS BIGINT) AS first_ts_us, "
        "CAST(max(ts) AS BIGINT) AS last_ts_us, "
        "CAST((max(ts) - min(ts)) // 1000000 AS BIGINT) AS span_s "
        "FROM p GROUP BY 1"
    )
    mix_path = _pages_mix_oracle_parquet()
    host_lang_mix_sql = (
        # (host, lang) census; host_share is ONE IEEE division of the
        # exact int64 counts, rounded half-away like every hashed float
        f"WITH p AS (SELECT lower(regexp_extract(url, '{host_pat}', 1)) "
        f"AS host, lang FROM read_parquet('{mix_path}')), "
        "c AS (SELECT host, lang, CAST(count(*) AS BIGINT) AS n_pages "
        "FROM p GROUP BY 1, 2), "
        "t AS (SELECT host, sum(n_pages) AS tot FROM c GROUP BY 1) "
        "SELECT c.host, c.lang, c.n_pages, "
        "round(c.n_pages * 1.0 / t.tot, 6) AS host_share "
        "FROM c JOIN t ON t.host = c.host"
    )
    host_reciprocity_sql = (
        # distinct directed host pairs (self dropped, relative hrefs → own
        # host, hence never cross-host) vs their reverses; one IEEE division
        f"{hosts_cte}, "
        "e AS MATERIALIZED (SELECT DISTINCT sh AS s, "
        "CASE WHEN dh = '' THEN sh ELSE dh END AS d FROM hosts "
        "WHERE sh <> CASE WHEN dh = '' THEN sh ELSE dh END), "
        "r AS (SELECT CAST(count(*) AS BIGINT) AS np, "
        "CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM e x "
        "WHERE x.s = e.d AND x.d = e.s) THEN 1 ELSE 0 END) AS BIGINT) "
        "AS nr FROM e) "
        "SELECT np AS n_directed_pairs, nr AS n_reciprocated, "
        "round(CAST(nr AS DOUBLE) / CAST(np AS DOUBLE), 6) AS reciprocity "
        "FROM r"
    )
    return {
        "host_graph": host_graph_sql,
        "host_locality": host_locality_sql,
        "host_reciprocity": host_reciprocity_sql,
        "anchor_index": anchor_index_sql,
        "host_rank": host_rank_sql,
        "page_indegree_histogram": page_indegree_sql,
        "crawl_recency": crawl_recency_sql,
        "host_lang_mix": host_lang_mix_sql,
    }


def _wpagerank_sql(iters: int, damping: float = 0.85) -> str:
    """Unrolled edge-WEIGHTED PageRank: weight = shared-order count,
    contribution w/W(u) (matching WeightedPageRankProgram's r/W·w order of
    operations: pr / tw * w, left-assoc); the symmetric weighted graph has
    no dangling vertices so that term is identically zero on both sides."""
    parts = [
        "WITH ew AS MATERIALIZED ("
        "SELECT a.l_partkey AS src, b.l_partkey AS dst, "
        "count(DISTINCT a.l_orderkey) AS w "
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "WHERE a.l_partkey <> b.l_partkey GROUP BY 1, 2)",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM ew)",
        "nv AS MATERIALIZED (SELECT count(*) AS n FROM v)",
        "ws AS MATERIALIZED (SELECT src AS vid, sum(w) AS tw FROM ew GROUP BY 1)",
        "r0 AS MATERIALIZED (SELECT vid, 1.0 / (SELECT n FROM nv) AS pr FROM v)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT d.vid, "
            f"(1 - {damping}) / (SELECT n FROM nv) + "
            f"{damping} * coalesce(s.c, 0) AS pr FROM ws d LEFT JOIN ("
            f"SELECT ew.dst AS vid, sum(r.pr / w2.tw * ew.w) AS c "
            f"FROM ew JOIN r{i-1} r ON r.vid = ew.src "
            f"JOIN ws w2 ON w2.vid = ew.src GROUP BY ew.dst) s ON s.vid = d.vid)"
        )
    return ", ".join(parts) + f" SELECT vid, round(pr, 8) AS pr FROM r{iters}"


def _wsssp_stored_sql(iters: int = 8, seed_mod: int = 101) -> str:
    """Unrolled min-plus relaxation over stored shared-order-count weights.
    The dense co-purchase graph converges in 2 rounds at sf0.001/sf0.01
    (measured); 8 is the safety margin. All-integer arithmetic → exact."""
    big = "9223372036854775807"
    parts = [
        "WITH ew AS MATERIALIZED ("
        "SELECT a.l_partkey AS src, b.l_partkey AS dst, "
        "count(DISTINCT a.l_orderkey) AS w "
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "WHERE a.l_partkey <> b.l_partkey GROUP BY 1, 2)",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM ew)",
        f"d0 AS MATERIALIZED (SELECT vid, CASE WHEN vid % {seed_mod} = 0 "
        "THEN CAST(0 AS BIGINT) ELSE NULL END AS d FROM v)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT p.vid, "
            "CASE WHEN p.d IS NULL AND m.md IS NULL THEN NULL "
            f"ELSE least(coalesce(p.d, {big}), coalesce(m.md, {big})) END AS d "
            f"FROM d{i-1} p LEFT JOIN ("
            f"SELECT e.dst AS vid, min(p2.d + e.w) AS md FROM ew e "
            f"JOIN d{i-1} p2 ON p2.vid = e.src AND p2.d IS NOT NULL "
            "GROUP BY e.dst) m ON m.vid = p.vid)"
        )
    return (
        ", ".join(parts)
        + f" SELECT vid, coalesce(d, -1) AS wdist FROM d{iters} ORDER BY vid"
    )


def _ppr_sql(iters: int, damping: float = 0.85, seed_mod: int = 10) -> str:
    """Unrolled personalized PageRank: restart mass on vid % seed_mod == 0
    only (no dangling vertices exist in the symmetrized graph, so the
    dangling-to-seeds term is identically zero on both sides)."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS outdeg FROM e GROUP BY 1)",
        f"s AS MATERIALIZED (SELECT vid, CASE WHEN vid % {seed_mod} = 0 "
        "THEN 1.0 ELSE 0.0 END AS is_seed FROM v)",
        "ns AS MATERIALIZED (SELECT sum(is_seed) AS k FROM s)",
        "r0 AS MATERIALIZED (SELECT vid, is_seed / (SELECT k FROM ns) AS pr FROM s)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT sd.vid, "
            f"(1 - {damping}) * sd.is_seed / (SELECT k FROM ns) + "
            f"{damping} * coalesce(c.c, 0) AS pr FROM s sd LEFT JOIN ("
            f"SELECT e.dst AS vid, sum(r.pr / d2.outdeg) AS c "
            f"FROM e JOIN r{i-1} r ON r.vid = e.src "
            f"JOIN deg d2 ON d2.vid = e.src GROUP BY e.dst) c ON c.vid = sd.vid)"
        )
    return ", ".join(parts) + f" SELECT vid, round(pr, 8) AS pr FROM r{iters}"


def _matching_sql(rounds: int = 24) -> str:
    """Unrolled handshake maximal matching (programs.MaximalMatchingProgram):
    per round every live vertex points along its min-(md5 edge hash, dst)
    live edge; mutual pointers match and deactivate. The globally minimal
    live edge always matches, so rounds needed ≤ matched edges; the
    sf0.001/sf0.01 co-purchase graphs converge in ≤ 8 rounds (hash
    priorities shuffle any adversarial chain); 24 is the safety margin —
    empty rounds are identity."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "ep AS MATERIALIZED (SELECT src, dst, md5_number_lower(concat("
        "CAST(least(src, dst) AS VARCHAR), ':', "
        "CAST(greatest(src, dst) AS VARCHAR))) AS ph FROM e)",
        "a0 AS MATERIALIZED (SELECT vid FROM v)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT src, dst FROM ("
            "SELECT ep.src, ep.dst, row_number() OVER ("
            "PARTITION BY ep.src ORDER BY ep.ph, ep.dst) AS rn "
            f"FROM ep JOIN a{i-1} x ON x.vid = ep.src "
            f"JOIN a{i-1} y ON y.vid = ep.dst) WHERE rn = 1)"
        )
        parts.append(
            f"n{i} AS MATERIALIZED (SELECT p1.src AS u, p1.dst AS w "
            f"FROM p{i} p1 JOIN p{i} p2 ON p2.src = p1.dst "
            "AND p2.dst = p1.src WHERE p1.src < p1.dst)"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT vid FROM a{i-1} WHERE vid NOT IN "
            f"(SELECT u FROM n{i} UNION ALL SELECT w FROM n{i}))"
        )
    match_union = " UNION ALL ".join(
        f"SELECT u, w FROM n{i}" for i in range(1, rounds + 1)
    )
    return ", ".join(parts) + (
        f", nn AS (SELECT u, w FROM ({match_union})) "
        "SELECT v.vid, coalesce(m.partner, -1) AS partner FROM v "
        "LEFT JOIN (SELECT u AS vid, w AS partner FROM nn "
        "UNION ALL SELECT w, u FROM nn) m ON m.vid = v.vid"
    )


def _bipartite_sql(iters: int = 16) -> str:
    """Double-cover replay of ``algorithms.bipartite_check``: the cc unroll
    over the doubled edge set (2u ↔ 2v+1, 2u+1 ↔ 2v), then pair the two
    copies of each vertex — bipartite iff they landed in different
    double-cover components. 16 rounds = 2× the cc margin (double-cover
    shortest paths can be up to ~2× the original ones)."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "de AS MATERIALIZED (SELECT src * 2 AS src, dst * 2 + 1 AS dst FROM e "
        "UNION ALL SELECT src * 2 + 1, dst * 2 FROM e)",
        "v2 AS MATERIALIZED (SELECT DISTINCT src AS vid FROM de)",
        "c0 AS MATERIALIZED (SELECT vid, vid AS comp FROM v2)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT x.vid, min(x.comp) AS comp FROM ("
            f"SELECT vid, comp FROM c{i-1} "
            f"UNION ALL SELECT de.dst AS vid, c.comp FROM de JOIN c{i-1} c "
            "ON c.vid = de.src) x GROUP BY x.vid)"
        )
    return ", ".join(parts) + (
        f" SELECT a.comp // 2 AS component, count(*) AS n_vertices, "
        "CAST(max(CASE WHEN a.comp = b.comp THEN 1 ELSE 0 END) = 0 AS BOOLEAN) "
        f"AS is_bipartite FROM c{iters} a JOIN c{iters} b ON b.vid = a.vid + 1 "
        "WHERE a.vid % 2 = 0 GROUP BY 1"
    )


def _spam_mass_sql(iters: int, damping: float = 0.85, trust_mod: int = 17) -> str:
    """Unrolled TrustRank spam mass: the global-PageRank unroll
    (``_pagerank_sql``) and the trust-seeded unroll (``_ppr_sql`` with
    ``vid % trust_mod = 0`` seeds) side by side over the same symmetric
    edge CTE, then ``spam_mass = (pr − tr) / pr`` taken on the ROUNDED
    ranks — mirroring ``algorithms.spam_mass``, which also divides the
    half-away-rounded values so the ratio is bit-reproducible."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "nv AS MATERIALIZED (SELECT count(*) AS n FROM v)",
        "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS outdeg FROM e GROUP BY 1)",
        "g0 AS MATERIALIZED (SELECT vid, 1.0 / (SELECT n FROM nv) AS pr FROM v)",
        f"s AS MATERIALIZED (SELECT vid, CASE WHEN vid % {trust_mod} = 0 "
        "THEN 1.0 ELSE 0.0 END AS is_seed FROM v)",
        "ns AS MATERIALIZED (SELECT sum(is_seed) AS k FROM s)",
        "t0 AS MATERIALIZED (SELECT vid, is_seed / (SELECT k FROM ns) AS pr FROM s)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT d.vid, (1 - {damping}) / (SELECT n FROM nv) + "
            f"{damping} * coalesce(s2.c, 0) AS pr FROM deg d LEFT JOIN ("
            f"SELECT e.dst AS vid, sum(r.pr / d2.outdeg) AS c "
            f"FROM e JOIN g{i-1} r ON r.vid = e.src "
            f"JOIN deg d2 ON d2.vid = e.src GROUP BY e.dst) s2 ON s2.vid = d.vid)"
        )
        parts.append(
            f"t{i} AS MATERIALIZED (SELECT sd.vid, "
            f"(1 - {damping}) * sd.is_seed / (SELECT k FROM ns) + "
            f"{damping} * coalesce(c.c, 0) AS pr FROM s sd LEFT JOIN ("
            f"SELECT e.dst AS vid, sum(r.pr / d2.outdeg) AS c "
            f"FROM e JOIN t{i-1} r ON r.vid = e.src "
            f"JOIN deg d2 ON d2.vid = e.src GROUP BY e.dst) c ON c.vid = sd.vid)"
        )
    return ", ".join(parts) + (
        f" SELECT vid, pr, tr, round(CASE WHEN pr > 0 THEN (pr - tr) / pr "
        "ELSE 0 END, 8) AS spam_mass FROM ("
        f"SELECT g.vid, round(g.pr, 8) AS pr, round(t.pr, 8) AS tr "
        f"FROM g{iters} g JOIN t{iters} t ON t.vid = g.vid)"
    )


def _hits_sql(iters: int = 8) -> str:
    """Unrolled simultaneous-update HITS on the DAG orientation (u→v iff
    u<v) of the co-purchase graph, normalization-free until the final L2 —
    mirrors ``HITSProgram``'s semantics exactly (scale-free iteration)."""
    eu_mat = _EU.replace("eu AS (", "eu AS MATERIALIZED (", 1)
    parts = [
        f"WITH {eu_mat}",
        "v AS MATERIALIZED (SELECT src AS vid FROM eu UNION SELECT dst FROM eu)",
        "s0 AS MATERIALIZED (SELECT vid, 1.0 AS a, 1.0 AS h FROM v)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT v.vid, "
            "coalesce(ha.s, 0) AS a, coalesce(ah.s, 0) AS h FROM v "
            f"LEFT JOIN (SELECT eu.dst AS vid, sum(p.h) AS s FROM eu "
            f"JOIN s{i-1} p ON p.vid = eu.src GROUP BY 1) ha ON ha.vid = v.vid "
            f"LEFT JOIN (SELECT eu.src AS vid, sum(p.a) AS s FROM eu "
            f"JOIN s{i-1} p ON p.vid = eu.dst GROUP BY 1) ah ON ah.vid = v.vid)"
        )
    return ", ".join(parts) + (
        f" SELECT vid, round(a / sqrt((SELECT sum(a*a) FROM s{iters})), 8) AS auth, "
        f"round(h / sqrt((SELECT sum(h*h) FROM s{iters})), 8) AS hub FROM s{iters}"
    )


def _lang_id_sql() -> str:
    """SQL mirror of ``lang_id_batch``: han codepoint → 'zh'; else argmax
    of per-language stopword hits over whitespace tokens (alphabetical
    tie-break, 0 hits → 'en'). The stopword VALUES list is generated from
    the SAME table the kernel uses (single source of truth)."""
    from subgraph_isomorphism_pregel_ray.pipelines.textops import STOPWORDS

    vals = ", ".join(
        f"('{w}', '{lang}')"
        for lang in sorted(STOPWORDS)
        for w in sorted(STOPWORDS[lang])
    )
    return (
        f"WITH sw(word, lang) AS (VALUES {vals}), "
        "tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), "
        r"'\s+')) AS w FROM documents), "
        "hits AS (SELECT t.doc_id, s.lang, count(*) AS c FROM tok t "
        "JOIN sw s ON s.word = t.w GROUP BY 1, 2), "
        "best AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY c DESC, lang) AS rn FROM hits) "
        "SELECT d.doc_id, CASE WHEN regexp_matches(d.text, "
        r"'[\x{4E00}-\x{9FFF}]') THEN 'zh' "
        "WHEN b.lang IS NOT NULL THEN b.lang ELSE 'en' END AS lang_pred "
        "FROM documents d LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b "
        "ON b.doc_id = d.doc_id"
    )


def _walk_sql(walk_len: int = 4) -> str:
    """Unrolled deterministic random walk: neighbor pick k = h(start, t) %
    deg over row_number()-indexed sorted adjacency (RandomWalkProgram's
    transition, exactly)."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS outdeg FROM e GROUP BY 1)",
        "nbr AS MATERIALIZED (SELECT src, dst, row_number() OVER "
        "(PARTITION BY src ORDER BY dst) - 1 AS idx FROM e)",
        "w0 AS MATERIALIZED (SELECT vid AS start, vid AS cur FROM v)",
    ]
    for i in range(1, walk_len + 1):
        parts.append(
            f"w{i} AS MATERIALIZED (SELECT w.start, nbr.dst AS cur "
            f"FROM w{i-1} w JOIN deg d ON d.vid = w.cur "
            f"JOIN nbr ON nbr.src = w.cur AND nbr.idx = "
            f"((w.start * 2654435761 + {i} * 40503) % 2147483647) % d.outdeg)"
        )
    return (
        ", ".join(parts)
        + f" SELECT start AS start_vid, cur AS end_vid FROM w{walk_len}"
    )


def _walk_pmi_sql(walk_len: int = 4, window: int = 2) -> str:
    """Skip-gram pairs from the unrolled deterministic walks (_walk_sql's
    w0..wL CTEs track per-start positions, so joining w_t ⋈ w_{t+d} on
    start recovers each walk's (v_t, v_{t+d}) pair), then exact-integer
    pair counts, both marginals, and ONE double expression per row —
    ln((n·N)/(n_l·n_r)) round 6 in the engine's operand order."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS outdeg FROM e GROUP BY 1)",
        "nbr AS MATERIALIZED (SELECT src, dst, row_number() OVER "
        "(PARTITION BY src ORDER BY dst) - 1 AS idx FROM e)",
        "w0 AS MATERIALIZED (SELECT vid AS start, vid AS cur FROM v)",
    ]
    for i in range(1, walk_len + 1):
        parts.append(
            f"w{i} AS MATERIALIZED (SELECT w.start, nbr.dst AS cur "
            f"FROM w{i-1} w JOIN deg d ON d.vid = w.cur "
            f"JOIN nbr ON nbr.src = w.cur AND nbr.idx = "
            f"((w.start * 2654435761 + {i} * 40503) % 2147483647) % d.outdeg)"
        )
    pair_sel = " UNION ALL ".join(
        f"SELECT a.cur AS u, b.cur AS v FROM w{t} a "
        f"JOIN w{t + d} b ON b.start = a.start"
        for d in range(1, window + 1)
        for t in range(0, walk_len + 1 - d)
    )
    parts.append(f"pr AS MATERIALIZED ({pair_sel})")
    parts.append(
        "pc AS MATERIALIZED (SELECT u, v, CAST(count(*) AS BIGINT) AS n "
        "FROM pr GROUP BY 1, 2)"
    )
    parts.append("nl AS (SELECT u, CAST(sum(n) AS BIGINT) AS nl FROM pc GROUP BY 1)")
    parts.append("nr AS (SELECT v, CAST(sum(n) AS BIGINT) AS nr FROM pc GROUP BY 1)")
    parts.append("tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM pc)")
    return (
        ", ".join(parts)
        + " SELECT pc.u, pc.v, pc.n, "
        "round(ln((CAST(pc.n AS DOUBLE) * (SELECT nn FROM tot)) / "
        "(CAST(nl.nl AS DOUBLE) * nr.nr)), 6) AS pmi "
        "FROM pc JOIN nl ON nl.u = pc.u JOIN nr ON nr.v = pc.v"
    )




def _spectral_sql(iters: int = 5) -> str:
    """Exact-integer power iteration (mirrors SpectralRadiusProgram):
    w_t(v) = Σ neighbors' w_{t-1} in BIGINT — t-walk counts — and
    λ = max(w_T)/max(w_{T-1}) as ONE double division."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "x0 AS MATERIALIZED (SELECT vid, CAST(1 AS BIGINT) AS x FROM v)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"x{i} AS MATERIALIZED (SELECT e.dst AS vid, "
            f"CAST(sum(x.x) AS BIGINT) AS x "
            f"FROM e JOIN x{i-1} x ON x.vid = e.src GROUP BY 1)"
        )
    return (
        ", ".join(parts)
        + f" SELECT CAST({iters} AS BIGINT) AS iters, "
        f"(SELECT max(x) FROM x{iters}) AS max_walks, "
        f"round(CAST((SELECT max(x) FROM x{iters}) AS DOUBLE) / "
        f"CAST((SELECT max(x) FROM x{iters - 1}) AS DOUBLE), 6) "
        "AS lambda_est"
    )


def _diameter_sql(levels: int = 16) -> str:
    """Double-sweep diameter bounds (mirrors algorithms.
    diameter_double_sweep): min-dist BFS unroll from the max-degree pivot
    (tie min vid), farthest min-vid witness, second BFS from it. Extra
    levels past the true eccentricity are identity (min-dist fixpoint)."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS d FROM e GROUP BY 1)",
        "pv AS MATERIALIZED (SELECT vid FROM deg ORDER BY d DESC, vid LIMIT 1)",
        "a0 AS MATERIALIZED (SELECT (SELECT vid FROM pv) AS vid, 0 AS d)",
    ]
    for i in range(1, levels + 1):
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT vid, min(d) AS d FROM ("
            f"SELECT vid, d FROM a{i-1} "
            f"UNION ALL SELECT e.dst, a.d + 1 FROM e JOIN a{i-1} a "
            "ON a.vid = e.src) x GROUP BY 1)"
        )
    parts.append(f"ae AS (SELECT CAST(max(d) AS BIGINT) AS ecc FROM a{levels})")
    parts.append(
        f"fv AS (SELECT CAST(min(vid) AS BIGINT) AS far FROM a{levels} "
        "WHERE d = (SELECT ecc FROM ae))"
    )
    parts.append("b0 AS MATERIALIZED (SELECT (SELECT far FROM fv) AS vid, 0 AS d)")
    for i in range(1, levels + 1):
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT vid, min(d) AS d FROM ("
            f"SELECT vid, d FROM b{i-1} "
            f"UNION ALL SELECT e.dst, b.d + 1 FROM e JOIN b{i-1} b "
            "ON b.vid = e.src) x GROUP BY 1)"
        )
    parts.append(f"be AS (SELECT CAST(max(d) AS BIGINT) AS ecc FROM b{levels})")
    return (
        ", ".join(parts)
        + " SELECT CAST((SELECT vid FROM pv) AS BIGINT) AS pivot, "
        "(SELECT ecc FROM ae) AS ecc_pivot, "
        "(SELECT far FROM fv) AS far_vid, "
        "(SELECT ecc FROM be) AS diameter_lb, "
        "2 * (SELECT ecc FROM ae) AS diameter_ub"
    )


def _cc_sql(iters: int = 8) -> str:
    """Unrolled synchronous min-label propagation — exact once converged
    (the sf0.001/sf0.01 co-purchase graphs converge in 3 rounds; 8 is the
    safety margin). ~50× faster than the equivalent recursive-CTE closure."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "c0 AS MATERIALIZED (SELECT vid, vid AS comp FROM v)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT x.vid, min(x.comp) AS comp FROM ("
            f"SELECT vid, comp FROM c{i-1} "
            f"UNION ALL SELECT e.dst AS vid, c.comp FROM e JOIN c{i-1} c ON c.vid = e.src"
            f") x GROUP BY x.vid)"
        )
    return ", ".join(parts) + f" SELECT vid, comp AS component FROM c{iters}"


def _wcc_succ_sql(iters: int = 24) -> str:
    """Unrolled min-label propagation over the SYMMETRIZED part-successor
    graph (weak connectivity of the directed graph scc_parts peels) —
    measured convergence is 11/15 rounds at sf0.001/sf0.01; 24 is the
    safety margin (extra rounds are identity at the fixpoint)."""
    parts = [
        "WITH seq AS MATERIALIZED (SELECT l_orderkey, l_linenumber, "
        "l_partkey, lag(l_partkey) OVER (PARTITION BY l_orderkey "
        "ORDER BY l_linenumber, l_partkey) AS prev FROM lineitem "
        "WHERE l_quantity <= 8)",
        "eu AS MATERIALIZED (SELECT DISTINCT prev AS src, l_partkey AS dst "
        "FROM seq WHERE prev IS NOT NULL AND prev <> l_partkey)",
        "e AS MATERIALIZED (SELECT src, dst FROM eu "
        "UNION SELECT dst, src FROM eu)",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "c0 AS MATERIALIZED (SELECT vid, vid AS comp FROM v)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT x.vid, min(x.comp) AS comp FROM ("
            f"SELECT vid, comp FROM c{i-1} "
            f"UNION ALL SELECT e.dst AS vid, c.comp FROM e "
            f"JOIN c{i-1} c ON c.vid = e.src"
            f") x GROUP BY x.vid)"
        )
    return ", ".join(parts) + f" SELECT vid, comp AS component FROM c{iters}"


def _sssp_sql(iters: int = 6, seed_mod: int = 101) -> str:
    """Unrolled multi-source BFS (min-dist relaxation) — exact once
    converged (max hop distance is 2 on the sf0.001/sf0.01 co-purchase
    graphs; 6 rounds is the safety margin, extra rounds are identity).
    Unreached vertices → -1, mirroring SSSPProgram.result_table."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        f"d0 AS MATERIALIZED (SELECT vid, 0 AS d FROM v WHERE vid % {seed_mod} = 0)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT x.vid, min(x.d) AS d FROM ("
            f"SELECT vid, d FROM d{i-1} "
            f"UNION ALL SELECT e.dst, c.d + 1 FROM e JOIN d{i-1} c ON c.vid = e.src"
            f") x GROUP BY x.vid)"
        )
    return (
        ", ".join(parts)
        + f" SELECT v.vid, CAST(coalesce(d.d, -1) AS BIGINT) AS dist "
        f"FROM v LEFT JOIN d{iters} d ON d.vid = v.vid"
    )


def _bfs_forward_parts(levels: int, seed_mod: int) -> list[str]:
    """Shared unrolled per-source BFS CTEs (forward phase of batched
    Brandes, mirrors BetweennessProgram): D{levels} holds one
    (source s, vid, level d, path-count sig) row per visited pair."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        f"f0 AS MATERIALIZED (SELECT vid AS s, vid, 0 AS d, "
        f"CAST(1 AS DOUBLE) AS sig FROM v WHERE vid % {seed_mod} = 0)",
        "D0 AS MATERIALIZED (SELECT * FROM f0)",
    ]
    for t in range(1, levels + 1):
        parts.append(
            f"f{t} AS MATERIALIZED (SELECT c.s, e.dst AS vid, {t} AS d, "
            f"CAST(sum(c.sig) AS DOUBLE) AS sig "
            f"FROM e JOIN f{t-1} c ON c.vid = e.src "
            f"WHERE NOT EXISTS (SELECT 1 FROM D{t-1} p "
            f"WHERE p.s = c.s AND p.vid = e.dst) GROUP BY 1, 2)"
        )
        parts.append(
            f"D{t} AS MATERIALIZED (SELECT * FROM D{t-1} UNION ALL SELECT * FROM f{t})"
        )
    return parts


def _betweenness_sql(levels: int = 5, seed_mod: int = 101) -> str:
    """Unrolled batched Brandes (mirrors BetweennessProgram): forward
    per-source BFS with path counts sigma, then backward dependency
    accumulation level by level — delta(v) = sigma_v * SUM over
    shortest-path successors w of (1+delta_w)/sigma_w; bc = SUM of deltas
    over sources, seeds' own level-0 deltas excluded. Per-source BFS
    depth is 2-3 on the sf0.001/sf0.01 co-purchase graphs; 5 levels is
    the safety margin (extra levels are empty → identity). Rounded 4
    decimals on both sides (round_half_away ≡ DuckDB round on
    non-negative doubles)."""
    parts = _bfs_forward_parts(levels, seed_mod)
    L = levels
    parts.append(
        f"bd{L} AS MATERIALIZED (SELECT s, vid, CAST(0 AS DOUBLE) AS delta "
        f"FROM D{L} WHERE d = {L})"
    )
    for lev in range(L - 1, 0, -1):
        parts.append(
            f"bd{lev} AS MATERIALIZED (SELECT dd.s, dd.vid, "
            f"dd.sig * coalesce(sum((1 + bw.delta) / dw.sig), 0) AS delta "
            f"FROM D{L} dd "
            f"LEFT JOIN e ON e.src = dd.vid "
            f"LEFT JOIN D{L} dw ON dw.s = dd.s AND dw.vid = e.dst "
            f"AND dw.d = {lev + 1} "
            f"LEFT JOIN bd{lev + 1} bw ON bw.s = dd.s AND bw.vid = dw.vid "
            f"WHERE dd.d = {lev} GROUP BY dd.s, dd.vid, dd.sig)"
        )
    union = " UNION ALL ".join(
        f"SELECT vid, delta FROM bd{lev}" for lev in range(1, L)
    )
    return (
        ", ".join(parts)
        + f" SELECT v.vid, round(coalesce(b.bc, 0), 4) AS bc FROM v "
        f"LEFT JOIN (SELECT vid, sum(delta) AS bc FROM ({union}) GROUP BY vid) b "
        f"ON b.vid = v.vid"
    )


def _rich_club_sql(kmax: int = 16) -> str:
    """Rich-club curve (mirrors relational.rich_club): N_k / E_k counted
    over nodes with degree > k; rc = 2·E_k/(N_k·(N_k−1)) with the SAME
    expression tree as the numpy side so the 6-decimal half-away rounds
    agree bit-exactly."""
    return (
        f"WITH {_EU}, "
        "deg AS MATERIALIZED (SELECT vid, count(*) AS deg FROM ("
        "SELECT src AS vid FROM eu UNION ALL SELECT dst AS vid FROM eu"
        ") GROUP BY vid), "
        f"ks AS (SELECT k FROM range(0, {kmax}) t(k)), "
        "nk AS (SELECT ks.k, count(d.vid) AS n_nodes FROM ks "
        "LEFT JOIN deg d ON d.deg > ks.k GROUP BY ks.k), "
        "ek AS (SELECT ks.k, count(*) AS n_edges FROM ks "
        "JOIN eu e ON TRUE JOIN deg a ON a.vid = e.src "
        "JOIN deg b ON b.vid = e.dst "
        "WHERE a.deg > ks.k AND b.deg > ks.k GROUP BY ks.k) "
        "SELECT nk.k, nk.n_nodes, coalesce(ek.n_edges, 0) AS n_edges, "
        "round(CASE WHEN nk.n_nodes >= 2 THEN "
        "2.0 * coalesce(ek.n_edges, 0) / (nk.n_nodes * (nk.n_nodes - 1.0)) "
        "ELSE 0 END, 6) AS rc "
        "FROM nk LEFT JOIN ek ON ek.k = nk.k"
    )


def _wsssp_sql(rounds: int = 8, seed_mod: int = 101,
               wbase: int = 10, wmod: int = 5) -> str:
    """Unrolled min-plus relaxation (mirrors WeightedSSSPProgram's
    Bellman-Ford): d_t(v) = min(d_{t-1}(v), min over in-edges of
    d_{t-1}(u) + wbase + (u+v) % wmod). With weight ratio
    (wbase+wmod-1)/wbase = 1.4 an optimal path uses at most
    ⌊1.4 · BFS-depth⌋ hops; BFS depth is 2-3 on the sf co-purchase
    graphs, so 8 rounds is the safety margin (extra rounds are
    identity). -1 = unreachable, matching the engine."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        f"d0 AS MATERIALIZED (SELECT vid, CAST(0 AS BIGINT) AS dist "
        f"FROM v WHERE vid % {seed_mod} = 0)",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"d{t} AS MATERIALIZED (SELECT vid, min(dist) AS dist FROM ("
            f"SELECT vid, dist FROM d{t-1} UNION ALL "
            f"SELECT e.dst AS vid, p.dist + {wbase} + (e.src + e.dst) % {wmod} "
            f"FROM e JOIN d{t-1} p ON p.vid = e.src) GROUP BY vid)"
        )
    return (
        ", ".join(parts)
        + f" SELECT v.vid, coalesce(d.dist, -1) AS wdist FROM v "
        f"LEFT JOIN d{rounds} d ON d.vid = v.vid"
    )


def _closeness_sql(levels: int = 5, seed_mod: int = 101) -> str:
    """Unrolled harmonic closeness (mirrors HarmonicClosenessProgram):
    hc(v) = SUM over pivot sources s of 1/d(s, v) for d > 0, unreachable
    pairs contributing 0 — the forward-BFS CTEs shared with the Brandes
    oracle, folded by 1/d. Rounded 4 decimals on both sides."""
    parts = _bfs_forward_parts(levels, seed_mod)
    return (
        ", ".join(parts)
        + f" SELECT v.vid, round(coalesce(h.hc, 0), 4) AS hc FROM v "
        f"LEFT JOIN (SELECT vid, sum(1.0 / d) AS hc FROM D{levels} "
        f"WHERE d > 0 GROUP BY vid) h ON h.vid = v.vid"
    )


def _link_prediction_sql() -> str:
    """Common-neighbor + Jaccard scores per strong-graph edge (mirrors
    algorithms.link_prediction); DuckDB's integer ``/`` is float division
    with the same operand tree as the numpy side, so 6-decimal
    half-away rounds agree bit-exactly."""
    return (
        f"WITH {_ESTRONG}, "
        "eu2 AS (SELECT src, dst FROM e WHERE src < dst), "
        "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS dg FROM e GROUP BY 1), "
        "cn AS MATERIALIZED (SELECT a.src AS u, b.src AS v, count(*) AS c "
        "FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src GROUP BY 1, 2) "
        "SELECT eu2.src, eu2.dst, coalesce(cn.c, 0) AS common_neighbors, "
        "round(coalesce(cn.c, 0) / (da.dg + db.dg - coalesce(cn.c, 0)), 6) AS jaccard "
        "FROM eu2 LEFT JOIN cn ON cn.u = eu2.src AND cn.v = eu2.dst "
        "JOIN deg da ON da.vid = eu2.src JOIN deg db ON db.vid = eu2.dst"
    )


def _katz_sql(iters: int = 8, alpha: float = 0.001, beta: float = 1.0) -> str:
    """Unrolled Katz iteration (mirrors KatzCentralityProgram):
    x_t(v) = beta + alpha·sum of in-neighbors' x_{t-1}, x_0 = beta,
    exactly ``iters`` rounds; 6-decimal half-away rounds agree (α keeps
    magnitudes O(1), so float sum-order noise is ~1e-16 — far below the
    round)."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        f"x0 AS MATERIALIZED (SELECT vid, CAST({beta} AS DOUBLE) AS x FROM v)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"x{t} AS MATERIALIZED (SELECT d.vid, {beta} + {alpha} * "
            f"coalesce(s.c, 0) AS x FROM v d LEFT JOIN ("
            f"SELECT e.dst AS vid, sum(p.x) AS c FROM e "
            f"JOIN x{t-1} p ON p.vid = e.src GROUP BY e.dst) s "
            f"ON s.vid = d.vid)"
        )
    return ", ".join(parts) + f" SELECT vid, round(x, 6) AS katz FROM x{iters}"


def _eccentricity_sql(levels: int = 5, seed_mod: int = 101) -> str:
    """Per-pivot eccentricity (mirrors EccentricityProgram): max BFS
    level over reached vertices per source — the third consumer of the
    shared forward-BFS CTEs (`_bfs_forward_parts`)."""
    parts = _bfs_forward_parts(levels, seed_mod)
    return (
        ", ".join(parts)
        + f" SELECT s, max(d) AS ecc FROM D{levels} GROUP BY s"
    )


def _mis_sql(rounds: int = 8) -> str:
    """Unrolled deterministic Luby MIS (programs.MaximalIndependentSetProgram):
    per round, active vertices whose priority is a strict local minimum among
    active neighbors join the MIS and deactivate their neighborhood.
    priority = high 32 bits of md5_number_lower(vid) | vid — unique by
    construction, bit-equal to the engine's md5_lower64 priorities. The
    sf0.001/sf0.01 co-purchase graphs converge in ≤ 4 rounds; 8 is the
    safety margin (empty-frontier rounds are identity)."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "pt AS MATERIALIZED (SELECT vid, "
        "(md5_number_lower(CAST(vid AS VARCHAR)) // 4294967296) * 4294967296 "
        "+ CAST(vid AS UBIGINT) AS p FROM v)",
        "a0 AS MATERIALIZED (SELECT vid FROM v)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT x.vid FROM a{i-1} x "
            "JOIN pt px ON px.vid = x.vid WHERE NOT EXISTS ("
            f"SELECT 1 FROM e JOIN a{i-1} w ON w.vid = e.dst "
            "JOIN pt pw ON pw.vid = w.vid "
            "WHERE e.src = x.vid AND pw.p < px.p))"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT vid FROM a{i-1} "
            f"WHERE vid NOT IN (SELECT vid FROM s{i}) "
            f"AND vid NOT IN (SELECT e.dst FROM e JOIN s{i} s ON e.src = s.vid))"
        )
    mis_union = " UNION ALL ".join(f"SELECT vid FROM s{i}" for i in range(1, rounds + 1))
    return (
        ", ".join(parts)
        + f", m AS (SELECT vid FROM ({mis_union})) "
        "SELECT v.vid, v.vid IN (SELECT vid FROM m) AS in_mis FROM v"
    )


def _coloring_sql() -> str:
    """Recursive-CTE replay of Jones–Plassmann coloring
    (programs.GreedyColoringProgram): priority = high 32 bits of
    md5_number_lower(vid) | vid (bit-equal to md5_lower64), smaller
    priority colors first, color(v) = mex over the colors of v's
    lower-priority neighbors. Each recursion level carries the FULL
    colored state forward (it, vid, color) and additionally colors every
    vertex whose lower-priority neighbors are all colored — so the
    data-dependent fixpoint depth (longest priority-increasing path,
    ~108 at sf0.001) needs no manual unroll; the recursion terminates
    when no vertex is newly colorable (all colored — JP is
    deadlock-free). mex via a per-vertex candidate range 0..deg
    (mex ≤ deg always leaves a free slot)."""
    return f"""
WITH RECURSIVE {_ESYM_MAT},
v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e),
pt AS MATERIALIZED (SELECT vid,
  (md5_number_lower(CAST(vid AS VARCHAR)) // 4294967296) * 4294967296
  + CAST(vid AS UBIGINT) AS p FROM v),
lo AS MATERIALIZED (
  SELECT e.src, e.dst FROM e
  JOIN pt ps ON ps.vid = e.src JOIN pt pd ON pd.vid = e.dst
  WHERE pd.p < ps.p),
deg AS MATERIALIZED (SELECT src AS vid, count(*) AS d FROM e GROUP BY 1),
nlo AS MATERIALIZED (SELECT v.vid, count(lo.dst) AS nl FROM v
  LEFT JOIN lo ON lo.src = v.vid GROUP BY 1),
cand AS MATERIALIZED (SELECT vid, unnest(range(0, d + 1)) AS c FROM deg),
st(it, vid, color) AS (
  SELECT 0 AS it, vid, CAST(0 AS BIGINT) AS color FROM nlo WHERE nl = 0
  UNION ALL
  (WITH cur AS (SELECT * FROM st),
   newv AS (
     SELECT n.vid FROM nlo n
     WHERE n.vid NOT IN (SELECT vid FROM cur)
       AND n.nl = (SELECT count(*) FROM lo JOIN cur s ON s.vid = lo.dst
                   WHERE lo.src = n.vid)),
   mexed AS (
     SELECT c.vid, min(c.c) AS color
     FROM cand c JOIN newv ON newv.vid = c.vid
     WHERE NOT EXISTS (SELECT 1 FROM lo JOIN cur s
                       ON s.vid = lo.dst AND s.color = c.c
                       WHERE lo.src = c.vid)
     GROUP BY 1)
   SELECT (SELECT max(it) FROM cur) + 1 AS it, vid, color FROM mexed
   UNION ALL
   SELECT (SELECT max(it) FROM cur) + 1 AS it, cur.vid, cur.color FROM cur
   WHERE EXISTS (SELECT 1 FROM mexed))
)
SELECT CAST(vid AS BIGINT) AS vid, color
FROM st WHERE it = (SELECT max(it) FROM st)
"""


def _semi_clustering_sql(
    iters: int = 4, c_max: int = 2, m_max: int = 4, f_b: float = 0.1
) -> str:
    """Unrolled Pregel §5.3 semi-clustering over the strong graph
    (programs.SemiClusteringProgram): the program carries (I, B)
    incrementally, but they are pure functions of the member set
    (I = |E(mem)|, B = Σdeg(mem) − 2I — proven invariant in the program
    docstring), so each SQL round recomputes them from scratch:
    candidates = own clusters ∪ received neighbor clusters ∪ received
    clusters extended by the receiver (if absent and < m_max), deduped
    by (v, mem), rescored (I − f_b·B) / (n(n−1)/2) with the engine's
    operation order, top c_max by (score DESC, member-list ASC).
    Final row per vertex: best cluster CONTAINING it, singleton
    fallback, score round()ed to 6 (round_half_away ≡ DuckDB round)."""
    parts = [
        f"WITH {_ESTRONG}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "deg AS MATERIALIZED (SELECT src AS vid, CAST(count(*) AS BIGINT) d "
        "FROM e GROUP BY 1)",
        "eu2 AS MATERIALIZED (SELECT src, dst FROM e WHERE src < dst)",
        "st0 AS MATERIALIZED (SELECT v.vid AS v, [CAST(v.vid AS BIGINT)] AS mem, "
        "CAST(0.0 AS DOUBLE) AS score FROM v)",
    ]
    for r in range(1, iters + 1):
        p = f"st{r-1}"
        parts.append(
            f"cand{r} AS MATERIALIZED ("
            f"SELECT v, mem FROM {p} "
            f"UNION "
            f"SELECT e.dst AS v, s.mem FROM e JOIN {p} s ON s.v = e.src "
            f"UNION "
            f"SELECT e.dst AS v, "
            f"list_sort(list_append(s.mem, CAST(e.dst AS BIGINT))) AS mem "
            f"FROM e JOIN {p} s ON s.v = e.src "
            f"WHERE NOT list_contains(s.mem, CAST(e.dst AS BIGINT)) "
            f"AND len(s.mem) < {m_max})"
        )
        parts.append(
            f"cx{r} AS MATERIALIZED (SELECT v, mem, unnest(mem) AS m FROM cand{r})"
        )
        parts.append(
            f"ci{r} AS MATERIALIZED (SELECT a.v, a.mem, "
            f"CAST(count(eu2.src) AS BIGINT) AS i "
            f"FROM cx{r} a LEFT JOIN eu2 ON eu2.src = a.m "
            f"AND list_contains(a.mem, CAST(eu2.dst AS BIGINT)) GROUP BY 1, 2)"
        )
        parts.append(
            f"cb{r} AS MATERIALIZED (SELECT a.v, a.mem, "
            f"CAST(sum(deg.d) AS BIGINT) AS ds "
            f"FROM cx{r} a JOIN deg ON deg.vid = a.m GROUP BY 1, 2)"
        )
        parts.append(
            f"sc{r} AS MATERIALIZED (SELECT ci.v, ci.mem, "
            f"CASE WHEN len(ci.mem) < 2 THEN 0.0 ELSE "
            f"(ci.i - {f_b} * (cb.ds - 2 * ci.i)) / "
            f"((len(ci.mem) * (len(ci.mem) - 1)) / 2.0) END AS score "
            f"FROM ci{r} ci JOIN cb{r} cb ON cb.v = ci.v AND cb.mem = ci.mem)"
        )
        parts.append(
            f"st{r} AS MATERIALIZED (SELECT v, mem, score FROM ("
            f"SELECT *, row_number() OVER "
            f"(PARTITION BY v ORDER BY score DESC, mem ASC) rn "
            f"FROM sc{r}) WHERE rn <= {c_max})"
        )
    return ", ".join(parts) + (
        f", own AS (SELECT v, mem, score, row_number() OVER "
        f"(PARTITION BY v ORDER BY score DESC, mem ASC) rn "
        f"FROM st{iters} WHERE list_contains(mem, CAST(v AS BIGINT))) "
        f"SELECT CAST(vv.vid AS BIGINT) AS vid, "
        f"COALESCE(array_to_string(o.mem, ','), CAST(vv.vid AS VARCHAR)) "
        f"AS cluster, round(COALESCE(o.score, 0.0), 6) AS score "
        f"FROM v vv LEFT JOIN own o ON o.v = vv.vid AND o.rn = 1"
    )


def _bpe_train_parts(merges: int = 32) -> str:
    """Unrolled BPE merge learning in DuckDB (pipelines/bpe.py
    train_from_histogram): word sequences ride as chr(31)-separated
    strings (documents are printable ASCII — verified — so the separator
    cannot collide); each round explodes adjacent token pairs
    (list_extract over range — overlapping positions, the pre-merge
    statistic), picks max-count / lexicographically-smallest, and applies
    the merge with ONE string replace() — SQL replace is left-to-right
    non-overlapping, exactly ``_merge_seq``'s semantics (the shared
    boundary separator is consumed by the first match, so an overlapping
    second occurrence cannot fire, same as the engine's i += 2)."""
    sep = "chr(31)"
    parts = [
        "WITH hist AS MATERIALIZED ("
        "SELECT w AS word, CAST(count(*) AS BIGINT) n FROM ("
        "SELECT unnest(list_filter(string_split(lower(text), ' '), "
        "x -> x <> '')) AS w FROM documents) GROUP BY 1)",
        f"st0 AS MATERIALIZED (SELECT word, n, {sep} || "
        f"regexp_replace(word, '(.)', '\\1' || {sep}, 'g') AS s FROM hist)",
    ]
    for r in range(1, merges + 1):
        parts.append(
            f"tk{r} AS (SELECT n, list_filter(string_split(s, {sep}), "
            f"x -> x <> '') AS toks FROM st{r-1})"
        )
        parts.append(
            f"pr{r} AS MATERIALIZED (SELECT list_extract(toks, i) AS lt, "
            f"list_extract(toks, i + 1) AS rt, CAST(sum(n) AS BIGINT) c "
            f"FROM tk{r}, UNNEST(range(1, len(toks))) AS u(i) GROUP BY 1, 2)"
        )
        parts.append(
            f"bs{r} AS MATERIALIZED (SELECT lt, rt, c FROM pr{r} "
            f"ORDER BY c DESC, lt, rt LIMIT 1)"
        )
        parts.append(
            f"st{r} AS MATERIALIZED (SELECT word, n, "
            f"replace(s, {sep} || b.lt || {sep} || b.rt || {sep}, "
            f"{sep} || b.lt || b.rt || {sep}) AS s FROM st{r-1}, bs{r} b)"
        )
    return ", ".join(parts)


def _bpe_merges_sql(merges: int = 32) -> str:
    return _bpe_train_parts(merges) + " " + " UNION ALL ".join(
        f'SELECT CAST({r} AS BIGINT) AS "rank", lt AS "left", '
        f'rt AS "right", c AS n FROM bs{r}'
        for r in range(1, merges + 1)
    )


def _bpe_encode_sql(merges: int = 32) -> str:
    """Corpus encode replay: the final train state st{merges} IS the
    encoded form of every corpus word (min-rank-first encoding ≡ rank-
    sequential replay for in-vocabulary words: a merge only creates
    higher-rank adjacencies, so ranks fire in increasing order —
    bpe.py::bpe_encode_counts), so per-doc token counts are one explode +
    join + sum; zero-word docs kept at 0 via the LEFT JOIN."""
    sep = "chr(31)"
    return _bpe_train_parts(merges) + (
        f", wl AS (SELECT word, CAST(len(list_filter(string_split(s, {sep}), "
        f"x -> x <> '')) AS BIGINT) k FROM st{merges}), "
        "dw AS (SELECT doc_id, unnest(list_filter(string_split(lower(text), "
        "' '), x -> x <> '')) AS w FROM documents), "
        "agg AS (SELECT dw.doc_id, CAST(sum(wl.k) AS BIGINT) nt FROM dw "
        "JOIN wl ON wl.word = dw.w GROUP BY 1) "
        "SELECT d.doc_id, CAST(coalesce(agg.nt, 0) AS BIGINT) AS n_tokens_bpe "
        "FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id"
    )


def _lpa_sql(iters: int = 5) -> str:
    """Unrolled synchronous label propagation: label_i(v) = mode of
    neighbors' labels_{i-1}, tie → min label (``ORDER BY count DESC, label``),
    exactly ``iters`` update rounds — the engine's semantics
    (``state/programs.py`` LabelPropagationProgram; early global convergence
    is a fixpoint, so extra SQL rounds are identity). MATERIALIZED keeps
    DuckDB from inlining the CTE chain (24× planner blowup otherwise)."""
    parts = _lpa_parts(iters)
    return ", ".join(parts) + f" SELECT vid, label FROM l{iters}"


_ESTRONG = (
    # adaptive strong graph (replays relational.strong_copurchase_edges):
    # smallest m∈{2,3,4,5} with |pairs(c≥m)| ≤ 8·|part|, symmetrized
    "cnts AS MATERIALIZED (SELECT a.l_partkey AS s, b.l_partkey AS d, "
    "count(DISTINCT a.l_orderkey) AS c "
    "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
    "WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2), "
    "np AS MATERIALIZED (SELECT count(*) AS n FROM part), "
    "mo AS MATERIALIZED (SELECT CASE "
    "WHEN (SELECT count(*) FROM cnts WHERE c >= 2) <= 8 * (SELECT n FROM np) THEN 2 "
    "WHEN (SELECT count(*) FROM cnts WHERE c >= 3) <= 8 * (SELECT n FROM np) THEN 3 "
    "WHEN (SELECT count(*) FROM cnts WHERE c >= 4) <= 8 * (SELECT n FROM np) THEN 4 "
    "ELSE 5 END AS m), "
    "e AS MATERIALIZED ("
    "SELECT s AS src, d AS dst FROM cnts WHERE c >= (SELECT m FROM mo) "
    "UNION ALL "
    "SELECT d AS src, s AS dst FROM cnts WHERE c >= (SELECT m FROM mo))"
)


def _lpa_parts(iters: int, edges_cte: str | None = None) -> list[str]:
    """Shared unrolled-LPA CTEs (l{iters} = final per-vid labels)."""
    parts = [
        f"WITH {edges_cte or _ESYM_MAT}",
        "l0 AS MATERIALIZED (SELECT DISTINCT src AS vid, src AS label FROM e)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT vid, label FROM ("
            f"SELECT e.src AS vid, c.label AS label, "
            f"row_number() OVER (PARTITION BY e.src "
            f"ORDER BY count(*) DESC, c.label ASC) AS rn "
            f"FROM e JOIN l{i-1} c ON c.vid = e.dst GROUP BY e.src, c.label"
            f") WHERE rn = 1)"
        )
    return parts


def _seeded_lpa_sql(iters: int = 5, seed_mod: int = 10, label_mod: int = 3) -> str:
    """Unrolled seeded (clamped) label propagation: seeds vid%seed_mod==0
    carry vid%label_mod forever; non-seeds take the mode (min on ties) of
    their LABELED neighbors each round; unlabeled vertices are absent from
    each round's table (exactly the engine's label ≥ 0 filter)."""
    parts = [
        f"WITH {_ESYM_MAT}",
        f"s0 AS MATERIALIZED (SELECT DISTINCT src AS vid, "
        f"src % {label_mod} AS label FROM e WHERE src % {seed_mod} = 0)",
        "l0 AS MATERIALIZED (SELECT vid, label FROM s0)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT vid, label FROM ("
            f"SELECT e.src AS vid, c.label AS label, "
            f"row_number() OVER (PARTITION BY e.src "
            f"ORDER BY count(*) DESC, c.label ASC) AS rn "
            f"FROM e JOIN l{i-1} c ON c.vid = e.dst "
            f"WHERE e.src NOT IN (SELECT vid FROM s0) "
            f"GROUP BY e.src, c.label) WHERE rn = 1 "
            f"UNION ALL SELECT vid, label FROM s0)"
        )
    return (
        ", ".join(parts)
        + f" SELECT CAST(vid AS BIGINT) AS vid, "
          f"CAST(label AS BIGINT) AS label FROM l{iters}"
    )


def _lpa_modularity_sql(iters: int = 5) -> str:
    """Newman modularity of the unrolled-LPA communities (mirrors
    algorithms.lpa_modularity): per community c with ic internal
    undirected edges and dg total degree, q_c = ic/m − (dg/(2m))², m =
    total undirected edges. Runs on the STRONG co-purchase graph — the
    dense ≥1-order graph collapses to one community under LPA (Q = 0,
    uninformative). The float expression tree matches the numpy side
    term for term so 6-decimal half-away rounds agree bit-exactly."""
    parts = _lpa_parts(iters, edges_cte=_ESTRONG)
    parts.append(f"lab AS MATERIALIZED (SELECT vid, label FROM l{iters})")
    parts.append("mm AS (SELECT count(*) / 2.0 AS m FROM e)")
    parts.append(
        "ic AS (SELECT a.label, count(*) AS internal_edges FROM e "
        "JOIN lab a ON a.vid = e.src JOIN lab b ON b.vid = e.dst "
        "WHERE e.src < e.dst AND a.label = b.label GROUP BY a.label)"
    )
    parts.append(
        "dg AS (SELECT a.label, count(*) AS degree_sum FROM e "
        "JOIN lab a ON a.vid = e.src GROUP BY a.label)"
    )
    parts.append(
        "nm AS (SELECT label, count(*) AS n_members FROM lab GROUP BY label)"
    )
    return (
        ", ".join(parts)
        + " SELECT nm.label, nm.n_members, coalesce(ic.internal_edges, 0) AS internal_edges, "
        "dg.degree_sum, round(coalesce(ic.internal_edges, 0) / (SELECT m FROM mm) "
        "- (dg.degree_sum / (2.0 * (SELECT m FROM mm))) "
        "* (dg.degree_sum / (2.0 * (SELECT m FROM mm))), 6) AS q "
        "FROM nm JOIN dg ON dg.label = nm.label "
        "LEFT JOIN ic ON ic.label = nm.label"
    )


def _kcore_sql(iters: int = 30) -> str:
    """Unrolled h-index iteration (Lü et al. 2016): core_0 = degree,
    core_i(v) = h-index of neighbors' core_{i-1} — converges to the exact
    core number (the engine's Montresor-style fixpoint). sf0.001/sf0.01
    converge in 10/19 rounds; 30 gives margin (30 == 36 verified on both —
    extra rounds are identity, the sequence is monotone decreasing with a
    stable fixpoint)."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "k0 AS MATERIALIZED (SELECT src AS vid, count(*) AS core FROM e GROUP BY 1)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT vid, max(least(rnk, v)) AS core FROM ("
            f"SELECT e.src AS vid, c.core AS v, "
            f"row_number() OVER (PARTITION BY e.src ORDER BY c.core DESC) AS rnk "
            f"FROM e JOIN k{i-1} c ON c.vid = e.dst) GROUP BY vid)"
        )
    return ", ".join(parts) + f" SELECT vid, core FROM k{iters}"


def _score_sql(iters: int = 40) -> str:
    """Unrolled WEIGHTED h-index fixpoint (s-core, Eidsaa & Almaas 2013 —
    mirrors SCoreProgram): core_0 = strength; core_i(v) = max over
    neighbors ordered by capped estimate desc of least(cumulative weight,
    estimate), estimate capped at v's own core (the engine's
    min(nbr_est, core[v]) — keeps the sequence monotone so extra rounds
    are identity). Within-tie neighbor order provably cannot change the
    max-least value; ORDER BY (est DESC, dst) pins the window anyway.
    sf0.001/sf0.01 converge well under 40 rounds (engine fixpoints in
    ~15-25 supersteps)."""
    parts = [
        "WITH ew AS MATERIALIZED (SELECT a.l_partkey AS src, "
        "b.l_partkey AS dst, "
        "CAST(count(DISTINCT a.l_orderkey) AS BIGINT) AS w "
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "WHERE a.l_partkey <> b.l_partkey GROUP BY 1, 2)",
        "k0 AS MATERIALIZED (SELECT src AS vid, CAST(sum(w) AS BIGINT) "
        "AS core FROM ew GROUP BY 1)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT vid, max(least(cw, v)) AS core "
            f"FROM (SELECT e.src AS vid, least(c.core, s.core) AS v, "
            "CAST(sum(e.w) OVER (PARTITION BY e.src "
            "ORDER BY least(c.core, s.core) DESC, e.dst "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw "
            f"FROM ew e JOIN k{i-1} c ON c.vid = e.dst "
            f"JOIN k{i-1} s ON s.vid = e.src) t GROUP BY vid)"
        )
    return ", ".join(parts) + f" SELECT vid, core FROM k{iters}"


def _ktruss_sql(k: int = 6, rounds: int = 10) -> str:
    """Unrolled k-truss peeling (Cohen 2008): round r recomputes per-edge
    triangle support over the surviving edge set (wedge self-join on the
    symmetric closure, restricted to edges) and keeps support ≥ k−2. The
    engine peels to the true fixpoint; the unroll is safe because peeling is
    monotone (edge sets only shrink) with a stable fixpoint, so extra rounds
    are identity. sf0.001/sf0.01 converge in 1/6 rounds; 10 gives margin.
    MATERIALIZED blocks stop DuckDB's CTE inlining from exploding
    exponentially across rounds (same trick as _kcore_sql)."""
    thresh = k - 2
    parts = [
        "WITH s0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, "
        "b.l_partkey AS v FROM lineitem a JOIN lineitem b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"
    ]
    for r in range(rounds):
        parts.append(
            f", sym{r} AS MATERIALIZED (SELECT u AS a, v AS b FROM s{r} "
            f"UNION ALL SELECT v, u FROM s{r})"
            f", s{r + 1} AS MATERIALIZED (SELECT x.a AS u, y.a AS v "
            f"FROM sym{r} x JOIN sym{r} y ON x.b = y.b AND x.a < y.a "
            f"JOIN s{r} e ON e.u = x.a AND e.v = y.a "
            f"GROUP BY x.a, y.a HAVING count(*) >= {thresh})"
        )
    parts.append(f" SELECT u AS src, v AS dst FROM s{rounds}")
    return "".join(parts)


def _stopword_sql_list() -> str:
    from subgraph_isomorphism_pregel_ray.pipelines.textops import _SQL_STOP

    return "[" + ", ".join(f"'{w}'" for w in _SQL_STOP) + "]"


# ---- md5-keyed text-hash oracles ------------------------------------------
# The shingle/token/window hashes are md5_lower64 ≡ DuckDB md5_number_lower
# (functions/hashing.py), so fingerprint / simhash / MinHash banding are
# SQL-reproducible BIT-EXACTLY — including the LSH candidate generation, not
# just the verified output. numpy uint64 wrap-arithmetic is replayed with
# HUGEINT ... % 2^64.
_TWO64 = 1 << 64
_I64MIN_CUT = 1 << 63  # unsigned m >= 2^63  →  signed m - 2^64


def _fingerprint_sql(k: int = 8) -> str:
    """Rolling code-point Rabin–Karp min-hash (textops.fingerprint_batch):
    h_j = Σ cp[j+i]·B^(k-1-i) mod 2⁶⁴; numpy wraps each op mod 2⁶⁴ but mod is
    a ring hom, so one final % 2⁶⁴ over exact HUGEINT products is identical."""
    B = 1099511628211
    terms = " + ".join(
        "CAST(unicode(substring(text, CAST(j + %d AS INT), 1)) AS HUGEINT) * %d"
        % (i, pow(B, k - 1 - i, _TWO64))
        for i in range(k)
    )
    return (
        "WITH w AS MATERIALIZED ("
        f"SELECT doc_id, text, unnest(generate_series(1, length(text) - {k - 1})) AS j "
        f"FROM documents WHERE length(text) >= {k}), "
        "mn AS ("
        f"SELECT doc_id, min(({terms}) % {_TWO64}) AS m FROM w GROUP BY doc_id "
        "UNION ALL "
        "SELECT doc_id, CAST(md5_number_lower(text) AS HUGEINT) AS m "
        f"FROM documents WHERE length(text) < {k}) "
        "SELECT doc_id, "
        f"CAST(CASE WHEN m >= {_I64MIN_CUT} THEN m - {_TWO64} ELSE m END AS BIGINT) "
        "AS fingerprint FROM mn"
    )


def _winnow_sql(k: int = 8, w: int = 12) -> str:
    """Winnowing replay (textops.winnow_batch): same HUGEINT Rabin–Karp
    gram hashes as ``_fingerprint_sql``; per window-start the frame-min is
    taken with a ROWS window, the rightmost tying gram wins via max(j),
    short docs (< w grams) degenerate to the rightmost global min, and the
    distinct (pos, hash) pairs are the fingerprint set."""
    B = 1099511628211
    terms = " + ".join(
        "CAST(unicode(substring(text, CAST(j + %d AS INT), 1)) AS HUGEINT) * %d"
        % (i, pow(B, k - 1 - i, _TWO64))
        for i in range(k)
    )
    return (
        "WITH g AS MATERIALIZED ("
        f"SELECT doc_id, j, ({terms}) % {_TWO64} AS h FROM ("
        f"SELECT doc_id, text, unnest(generate_series(1, length(text) - {k - 1})) "
        f"AS j FROM documents WHERE length(text) >= {k})), "
        "cnt AS MATERIALIZED (SELECT doc_id, count(*) AS m FROM g GROUP BY 1), "
        "mn AS MATERIALIZED (SELECT doc_id, j AS ws, min(h) OVER ("
        "PARTITION BY doc_id ORDER BY j "
        f"ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mh FROM g), "
        "full_sel AS (SELECT m.doc_id, max(g.j) AS pos, m.mh AS fph "
        "FROM mn m JOIN cnt c ON c.doc_id = m.doc_id "
        f"JOIN g ON g.doc_id = m.doc_id AND g.j BETWEEN m.ws AND m.ws + {w - 1} "
        f"AND g.h = m.mh WHERE c.m >= {w} AND m.ws <= c.m - {w} + 1 "
        "GROUP BY m.doc_id, m.ws, m.mh), "
        "short_sel AS (SELECT g.doc_id, max(g.j) AS pos, mn2.mh AS fph "
        "FROM (SELECT doc_id, min(h) AS mh FROM g GROUP BY 1) mn2 "
        "JOIN g ON g.doc_id = mn2.doc_id AND g.h = mn2.mh "
        f"JOIN cnt c ON c.doc_id = g.doc_id WHERE c.m < {w} "
        "GROUP BY g.doc_id, mn2.mh) "
        "SELECT DISTINCT doc_id, pos, "
        f"CAST(CASE WHEN fph >= {_I64MIN_CUT} THEN fph - {_TWO64} ELSE fph END "
        "AS BIGINT) AS fp FROM "
        "(SELECT * FROM full_sel UNION ALL SELECT * FROM short_sel)"
    )


def _simhash_cte() -> str:
    """CTE chain ending in s(doc_id, simhash) — the exact bit-vote fold of
    textops.simhash_batch (every token occurrence votes ±1 per bit of its
    md5_number_lower hash; ties → 0 bit; tokenizer = split on whitespace)."""
    bits_vals = ", ".join(f"({i}, {1 << i}::HUGEINT)" for i in range(64))
    return (
        "toks AS MATERIALIZED ("
        "SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) "
        "AS tok FROM documents), "
        "h AS MATERIALIZED (SELECT doc_id, md5_number_lower(tok) AS h FROM toks), "
        f"bits(i, w) AS (VALUES {bits_vals}), "
        "v AS (SELECT doc_id, b.i, b.w, "
        "sum(CASE WHEN (h.h // CAST(b.w AS UBIGINT)) % 2 = 1 THEN 1 ELSE -1 END) "
        "AS vote FROM h CROSS JOIN bits b GROUP BY 1, 2, 3), "
        "u AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN w ELSE 0::HUGEINT END) "
        "AS uh FROM v GROUP BY 1), "
        "s AS MATERIALIZED (SELECT d.doc_id, "
        "CAST(CASE WHEN uh IS NULL THEN 0 "
        f"WHEN uh >= {_I64MIN_CUT} THEN uh - {_TWO64} ELSE uh END AS BIGINT) "
        "AS simhash FROM documents d LEFT JOIN u ON u.doc_id = d.doc_id)"
    )


def _simhash_sql() -> str:
    return f"WITH {_simhash_cte()} SELECT doc_id, simhash FROM s"


def _simhash_pairs_sql(max_hamming: int = 7) -> str:
    """Exhaustive-pair oracle: the engine's 8 byte-bands are COMPLETE for
    Hamming ≤ 7 by pigeonhole (dedup.simhash_dup_pairs), so banded output ==
    all-pairs popcount filter."""
    return (
        f"WITH {_simhash_cte()} "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
        "FROM s a JOIN s b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"
    )


def _minhash_bsig_ctes(
    k: int = 5,
    num_perm: int = 128,
    bands: int = 16,
    seed: int = 7,
) -> str:
    """Prefix of :func:`_minhash_ctes` ending in bsig(doc_id, band, sig) —
    the per-doc per-band signature lists (shared by the pairs/groups
    oracles and the lsh_bucket_histogram occupancy oracle)."""
    from subgraph_isomorphism_pregel_ray.pipelines.dedup import _perm_params

    a_p, b_p = _perm_params(num_perm, seed)
    perm_vals = ", ".join(
        f"({i}, {int(a_p[i])}::HUGEINT, {int(b_p[i])}::HUGEINT)"
        for i in range(num_perm)
    )
    m61 = (1 << 61) - 1
    rpb = num_perm // bands
    return (
        "grams AS MATERIALIZED (SELECT DISTINCT doc_id, "
        f"CASE WHEN length(text) < {k} THEN text "
        f"ELSE substr(text, CAST(i AS INT), {k}) END AS g "
        "FROM (SELECT doc_id, text, "
        f"unnest(generate_series(1, greatest(1, length(text) - {k - 1}))) AS i "
        "FROM documents)), "
        "sh AS MATERIALIZED ("
        "SELECT doc_id, CAST(md5_number_lower(g) AS HUGEINT) AS h FROM grams), "
        f"perms(pi, a, b) AS (VALUES {perm_vals}), "
        "mins AS MATERIALIZED (SELECT doc_id, p.pi, "
        f"min(((h * p.a) % {_TWO64} + p.b) % {_TWO64} % {m61}) AS mh "
        "FROM sh CROSS JOIN perms p GROUP BY 1, 2), "
        "bsig AS MATERIALIZED ("
        f"SELECT doc_id, pi // {rpb} AS band, list(mh ORDER BY pi) AS sig "
        "FROM mins GROUP BY 1, 2)"
    )


def _minhash_ctes(
    k: int = 5,
    num_perm: int = 128,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 200,
    seed: int = 7,
) -> str:
    """CTE chain ending in pairs(doc_a, doc_b, i, na, nb) — the FULL MinHash
    LSH pipeline of dedup.minhash_lsh_pairs: md5 shingle hashes → the same
    128 (a·x+b) mod-2⁶⁴-then-Mersenne61 permutations (literal a/b from the
    shared seeded rng) → band signature grouping (signature LIST equality ≡
    the engine's collision-free fold hash) → sorted-cap-200 buckets → distinct
    candidate pairs → exact gram-set intersection (grams ↔ md5 hashes are
    1:1 bar md5 collisions)."""
    return (
        _minhash_bsig_ctes(k=k, num_perm=num_perm, bands=bands, seed=seed)
        + ", "
        "bdocs AS MATERIALIZED ("
        f"SELECT band, sig, (list(doc_id ORDER BY doc_id))[1:{max_bucket}] AS docs "
        "FROM bsig GROUP BY band, sig HAVING count(*) >= 2), "
        "expl AS (SELECT band, sig, unnest(docs) AS d FROM bdocs), "
        "cand AS MATERIALIZED (SELECT DISTINCT a.d AS doc_a, b.d AS doc_b "
        "FROM expl a JOIN expl b ON a.band = b.band AND a.sig = b.sig "
        "AND a.d < b.d), "
        "cnt AS MATERIALIZED (SELECT doc_id, count(*) AS nsh FROM grams GROUP BY 1), "
        "inter AS MATERIALIZED (SELECT c.doc_a, c.doc_b, count(*) AS i "
        "FROM cand c JOIN grams a ON a.doc_id = c.doc_a "
        "JOIN grams b ON b.doc_id = c.doc_b AND b.g = a.g GROUP BY 1, 2), "
        "pairs AS MATERIALIZED (SELECT doc_a, doc_b, i, ca.nsh AS na, cb.nsh AS nb "
        "FROM inter JOIN cnt ca ON ca.doc_id = doc_a "
        "JOIN cnt cb ON cb.doc_id = doc_b "
        f"WHERE i * 1.0 / (ca.nsh + cb.nsh - i) >= {threshold})"
    )


def _minhash_pairs_sql() -> str:
    return (
        f"WITH {_minhash_ctes()} "
        "SELECT doc_a, doc_b, round(i * 1.0 / (na + nb - i), 6) AS jaccard "
        "FROM pairs"
    )


def _dedup_groups_sql(iters: int = 8) -> str:
    """MinHash pairs → min-label connected components (unrolled like
    ``_cc_sql``; near-dup groups are small cliques/chains, 8 rounds is ample
    margin and extra rounds are identity) → (doc_id, group, keep=min-member).
    Mirrors dedup.dedup_groups end to end."""
    parts = [
        f"WITH {_minhash_ctes()}",
        "de AS MATERIALIZED (SELECT doc_a AS s, doc_b AS t FROM pairs "
        "UNION ALL SELECT doc_b, doc_a FROM pairs)",
        "l0 AS MATERIALIZED (SELECT doc_id, doc_id AS lbl FROM documents)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT v.doc_id, "
            f"least(v.lbl, coalesce(min(w.lbl), v.lbl)) AS lbl "
            f"FROM l{i-1} v LEFT JOIN de ON de.s = v.doc_id "
            f"LEFT JOIN l{i-1} w ON w.doc_id = de.t "
            "GROUP BY v.doc_id, v.lbl)"
        )
    return (
        ", ".join(parts)
        + f' SELECT doc_id, lbl AS "group", '
        f"doc_id = min(doc_id) OVER (PARTITION BY lbl) AS keep FROM l{iters}"
    )


def _boruvka_sql(rounds: int = 22, jumps: int = 16) -> str:
    """Unrolled Borůvka MSF (mirrors algorithms.boruvka_mst): per round,
    cross-component edges under the current labels, each component's
    (w, u, v)-lexicographic minimum pick, parent pointers with the 2-cycle
    break toward the smaller id, then `jumps` pointer-jumping doublings
    (depth coverage 2^jumps ≫ any chain at oracle scale; extra jumps and
    extra rounds are identity). Total-order tie-break makes the forest
    unique ≡ Kruskal under (w, src, dst).

    Round bound: Borůvka at least halves the live-component count per
    round, so ``rounds`` ≥ ceil(log2 V) suffices; 22 covers V ≤ 4.2M
    vertices — far above any sf the driver runs (sf0.1 has 2·10^5
    partkeys, needing 18). Once converged the cross-component CTE
    ``x{r}`` is empty, so surplus rounds join-and-produce-nothing and
    cost ~nothing; an 8-round unroll (the pre-round-4 default) could
    under-run the engine's max_rounds=40 on chain-shaped components."""
    parts = [
        "WITH we AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v, "
        "count(DISTINCT a.l_orderkey) AS w "
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2)",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS vid, u AS comp FROM we "
        "UNION SELECT DISTINCT v, v FROM we)",
    ]
    for r in range(rounds):
        parts.append(
            f"x{r} AS MATERIALIZED (SELECT we.u, we.v, we.w, "
            f"la.comp AS cu, lb.comp AS cv FROM we "
            f"JOIN l{r} la ON la.vid = we.u JOIN l{r} lb ON lb.vid = we.v "
            "WHERE la.comp <> lb.comp)"
        )
        parts.append(
            f"c{r} AS (SELECT cu AS c, cv AS oc, w, u, v FROM x{r} "
            f"UNION ALL SELECT cv, cu, w, u, v FROM x{r})"
        )
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT c, oc, w, u, v FROM "
            f"(SELECT *, row_number() OVER (PARTITION BY c "
            f"ORDER BY w, u, v) AS rn FROM c{r}) WHERE rn = 1)"
        )
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT l.comp AS c, "
            f"coalesce(k.oc, l.comp) AS p FROM "
            f"(SELECT DISTINCT comp FROM l{r}) l "
            f"LEFT JOIN k{r} k ON k.c = l.comp)"
        )
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT a.c, CASE WHEN b.p = a.c "
            f"AND a.c < a.p THEN a.c ELSE a.p END AS p "
            f"FROM a{r} a JOIN a{r} b ON b.c = a.p)"
        )
        prev = f"b{r}"
        for j in range(jumps):
            parts.append(
                f"j{r}_{j} AS MATERIALIZED (SELECT a.c, b.p FROM {prev} a "
                f"JOIN {prev} b ON b.c = a.p)"
            )
            prev = f"j{r}_{j}"
        parts.append(
            f"l{r + 1} AS MATERIALIZED (SELECT l.vid, p.p AS comp "
            f"FROM l{r} l JOIN {prev} p ON p.c = l.comp)"
        )
    union = " UNION ".join(
        f"SELECT u, v, w FROM k{r}" for r in range(rounds)
    )
    return (
        ", ".join(parts)
        + f" SELECT u AS src, v AS dst, CAST(w AS BIGINT) AS w FROM ({union})"
    )


def _degdiscount_sql(k: int = 10) -> str:
    """Unrolled Chen-2009 DegreeDiscount greedy (mirrors
    DegreeDiscountProgram): per round, the exact-integer score
    100·d − 200·t − (d−t)·t over unselected vertices, argmax by
    (dd DESC, vid) via ORDER BY … LIMIT 1, then t+1 for the winner's
    neighbors. k rounds ⇒ k winner CTEs unioned with literal ranks."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "dg AS MATERIALIZED (SELECT src AS vid, count(*) AS d FROM e GROUP BY 1)",
        "t0 AS MATERIALIZED (SELECT vid, 0 AS t FROM dg)",
        "sel0 AS (SELECT vid FROM dg WHERE 1 = 0)",
    ]
    for r in range(k):
        parts.append(
            f"dd{r} AS MATERIALIZED (SELECT g.vid, "
            "100 * g.d - 200 * t.t - (g.d - t.t) * t.t AS dd "
            f"FROM dg g JOIN t{r} t USING (vid) "
            f"WHERE NOT EXISTS (SELECT 1 FROM sel{r} s WHERE s.vid = g.vid))"
        )
        parts.append(
            f"w{r} AS MATERIALIZED (SELECT vid, dd FROM dd{r} "
            "ORDER BY dd DESC, vid LIMIT 1)"
        )
        parts.append(
            f"t{r + 1} AS MATERIALIZED (SELECT t.vid, "
            "t.t + CASE WHEN ex.vid IS NOT NULL THEN 1 ELSE 0 END AS t "
            f"FROM t{r} t LEFT JOIN (SELECT e.src AS vid FROM e "
            f"JOIN w{r} w ON w.vid = e.dst) ex ON ex.vid = t.vid)"
        )
        parts.append(
            f"sel{r + 1} AS MATERIALIZED (SELECT vid FROM sel{r} "
            f"UNION ALL SELECT vid FROM w{r})"
        )
    union = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, vid, dd AS dd100 FROM w{r}"
        for r in range(k)
    )
    return ", ".join(parts) + " " + union


def _rake_sql(top_k: int = 25) -> str:
    """RAKE replay (mirrors textops.rake_keywords): stopword-boundary
    phrase ids via a windowed stop-count, word deg/freq over phrase-word
    occurrence rows, per-occurrence score sums, max-folded to distinct
    phrases (occurrences of one phrase share a word multiset, so max is
    exact up to float sum order ≪ the round), top-k on the ROUNDED score
    with phrase tie-break."""
    stoplist = _stopword_sql_list()
    toks = "regexp_split_to_array(trim(text), '\\s+')"
    return (
        f"WITH t AS (SELECT doc_id, unnest({toks}) AS rtok, "
        f"generate_subscripts({toks}, 1) AS pos "
        "FROM documents WHERE trim(text) <> ''), "
        "f AS (SELECT doc_id, pos, lower(rtok) AS tok, "
        f"CASE WHEN list_contains({stoplist}, lower(rtok)) THEN 1 ELSE 0 END "
        "AS st FROM t), "
        "g AS (SELECT *, sum(st) OVER (PARTITION BY doc_id ORDER BY pos) "
        "AS pid FROM f), "
        "pw AS MATERIALIZED (SELECT doc_id, pid, tok AS word, pos FROM g "
        "WHERE st = 0), "
        "pl AS MATERIALIZED (SELECT doc_id, pid, count(*) AS plen, "
        "string_agg(word, ' ' ORDER BY pos) AS phrase FROM pw GROUP BY 1, 2), "
        "ws AS MATERIALIZED (SELECT word, count(*) AS freq, sum(plen) AS sdeg "
        "FROM pw JOIN pl USING (doc_id, pid) GROUP BY 1), "
        "occ AS (SELECT pw.doc_id, pw.pid, sum(ws.sdeg / ws.freq) AS pscore "
        "FROM pw JOIN ws USING (word) GROUP BY 1, 2), "
        "ph AS (SELECT pl.phrase, count(*) AS n_occurrences, "
        "max(occ.pscore) AS score FROM occ JOIN pl USING (doc_id, pid) "
        "GROUP BY 1) "
        "SELECT phrase, CAST(n_occurrences AS BIGINT) AS n_occurrences, "
        "round(score, 6) AS score FROM ph "
        f"ORDER BY round(score, 6) DESC, phrase LIMIT {top_k}"
    )


def _minhash_calibration_sql(
    k: int = 5,
    num_perm: int = 128,
    bands: int = 16,
    max_bucket: int = 200,
    seed: int = 7,
) -> str:
    """est-vs-exact Jaccard per LSH candidate pair (mirrors
    dedup.minhash_calibration): the shared bsig replay, the SAME
    bdocs/expl/cand fragment as _minhash_ctes, signature agreement counted
    over the per-position mins rows, exact Jaccard LEFT-joined so a
    zero-overlap candidate (possible in principle, unlike _minhash_ctes's
    thresholded pairs) keeps its row with jaccard 0."""
    return (
        f"WITH {_minhash_bsig_ctes(k=k, num_perm=num_perm, bands=bands, seed=seed)}, "
        "bdocs AS MATERIALIZED ("
        f"SELECT band, sig, (list(doc_id ORDER BY doc_id))[1:{max_bucket}] AS docs "
        "FROM bsig GROUP BY band, sig HAVING count(*) >= 2), "
        "expl AS (SELECT band, sig, unnest(docs) AS d FROM bdocs), "
        "cand AS MATERIALIZED (SELECT DISTINCT a.d AS doc_a, b.d AS doc_b "
        "FROM expl a JOIN expl b ON a.band = b.band AND a.sig = b.sig "
        "AND a.d < b.d), "
        "agree AS MATERIALIZED (SELECT c.doc_a, c.doc_b, "
        "sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS eq "
        "FROM cand c JOIN mins ma ON ma.doc_id = c.doc_a "
        "JOIN mins mb ON mb.doc_id = c.doc_b AND mb.pi = ma.pi GROUP BY 1, 2), "
        "cnt AS MATERIALIZED (SELECT doc_id, count(*) AS nsh FROM grams GROUP BY 1), "
        "inter AS MATERIALIZED (SELECT c.doc_a, c.doc_b, count(*) AS i "
        "FROM cand c JOIN grams a ON a.doc_id = c.doc_a "
        "JOIN grams b ON b.doc_id = c.doc_b AND b.g = a.g GROUP BY 1, 2) "
        "SELECT c.doc_a, c.doc_b, "
        f"round(ag.eq / {num_perm}, 6) AS est_jaccard, "
        "round(coalesce(i.i, 0) * 1.0 / "
        "(ca.nsh + cb.nsh - coalesce(i.i, 0)), 6) AS jaccard "
        "FROM cand c JOIN agree ag ON ag.doc_a = c.doc_a AND ag.doc_b = c.doc_b "
        "LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b "
        "JOIN cnt ca ON ca.doc_id = c.doc_a "
        "JOIN cnt cb ON cb.doc_id = c.doc_b"
    )


def _densest_sql(rounds: int = 12) -> str:
    """Unrolled Bahmani-2012 peeling (mirrors DensestSubgraphProgram): per
    round, alive-degrees via the alive-restricted join, the global (V, ΣD)
    census, then the EXACT integer peel rule 2·deg·V ≤ 3·ΣD. The unroll is
    safe with margin because each round peels ≥ V/3 (Markov), so rounds ≥
    log_{3/2}(V) suffice and extra rounds operate on an empty alive set,
    contributing nothing. sf0.001/sf0.01 converge in ≤ 5 rounds; 12 gives
    margin."""
    parts = [
        f"WITH {_ESYM_MAT}",
        "a0 AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
    ]
    for r in range(rounds):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT v.vid, count(b.vid) AS deg "
            f"FROM a{r} v LEFT JOIN e ON e.src = v.vid "
            f"LEFT JOIN a{r} b ON b.vid = e.dst GROUP BY 1)"
        )
        parts.append(
            f"g{r} AS MATERIALIZED (SELECT count(*) AS V, "
            f"coalesce(sum(deg), 0) AS SD FROM d{r})"
        )
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT vid, {r} AS peel_round "
            f"FROM d{r}, g{r} WHERE 2 * deg * V <= 3 * SD)"
        )
        parts.append(
            f"a{r + 1} AS MATERIALIZED (SELECT vid FROM a{r} "
            f"EXCEPT SELECT vid FROM p{r})"
        )
    union = " UNION ALL ".join(f"SELECT * FROM p{r}" for r in range(rounds))
    return (
        ", ".join(parts)
        + f" SELECT vid, CAST(peel_round AS BIGINT) AS peel_round "
        f"FROM ({union})"
    )


def _shapley_attr_sql() -> str:
    """Unrolled 4-channel Shapley attribution (mirrors
    relational.shapley_attribution): per-user journey masks via
    sum(DISTINCT power-of-two), the 16-coalition value table by bitwise
    containment, and each φ_c emitted as the explicit left-associative
    weighted sum IN THE ENGINE'S SUBSET ORDER with repr()-exact double
    weight literals — every float op mirrored."""
    from math import factorial

    channels = ["click", "error", "signup", "view"]
    nch = len(channels)
    fact = [factorial(i) for i in range(nch + 1)]
    case = " ".join(
        f"WHEN '{c}' THEN {1 << i}" for i, c in enumerate(channels)
    )
    svals = ", ".join(f"({s})" for s in range(1 << nch))
    parts = [
        "WITH e AS MATERIALIZED (SELECT user_id, event_type, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS rn FROM events)",
        "cut AS (SELECT user_id, min(rn) AS prn FROM e "
        "WHERE event_type = 'purchase' GROUP BY 1)",
        "seq AS MATERIALIZED (SELECT e.user_id, "
        "CASE WHEN e.event_type = 'purchase' THEN 'conv' ELSE e.event_type "
        "END AS st FROM e LEFT JOIN cut USING (user_id) "
        "WHERE e.rn <= coalesce(cut.prn, 2147483647))",
        "jm AS MATERIALIZED (SELECT user_id, "
        f"coalesce(sum(DISTINCT CASE st {case} END), 0) AS mask, "
        "max(CASE WHEN st = 'conv' THEN 1 ELSE 0 END) AS conv "
        "FROM seq GROUP BY 1)",
        "g AS MATERIALIZED (SELECT mask, conv, count(*) AS n FROM jm "
        "GROUP BY 1, 2)",
        f"sv(s) AS (VALUES {svals})",
        "tot AS (SELECT sum(n) AS t FROM g)",
        "vt AS MATERIALIZED (SELECT sv.s, "
        "CASE WHEN tot.t > 0 THEN "
        "CAST(coalesce(sum(CASE WHEN g.conv = 1 THEN g.n END), 0) AS DOUBLE) "
        "/ tot.t ELSE 0.0 END AS v "
        "FROM sv LEFT JOIN g ON (g.mask & sv.s) = g.mask "
        "CROSS JOIN tot GROUP BY sv.s, tot.t)",
    ]
    selects = []
    for i, c in enumerate(channels):
        bit = 1 << i
        terms = []
        for S in range(1 << nch):
            if S & bit:
                continue
            s = bin(S).count("1")
            w = fact[s] * fact[nch - s - 1] / fact[nch]
            terms.append(
                f"{w!r} * ((SELECT v FROM vt WHERE s = {S | bit}) - "
                f"(SELECT v FROM vt WHERE s = {S}))"
            )
        selects.append(
            f"SELECT '{c}' AS channel, round({' + '.join(terms)}, 6) AS shapley"
        )
    return ", ".join(parts) + " " + " UNION ALL ".join(selects)


def _markov_attr_sql(iters: int = 32) -> str:
    """Unrolled Markov removal-effect attribution (mirrors
    relational.markov_attribution): journey transitions via per-user
    row_number + first-purchase cutoff, probability table n/rowsum, and
    ``iters`` value-iteration rounds per variant (full + one per removed
    channel); removal re-routes the removed channel's incoming mass to
    null by excluding it from the recursion."""
    channels = ["click", "error", "signup", "view"]
    transients = ["start"] + channels
    st_vals = ", ".join(f"('{s}')" for s in transients)
    ch_list = ", ".join(f"'{c}'" for c in channels)
    parts = [
        "WITH e AS MATERIALIZED (SELECT user_id, event_type, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS rn FROM events)",
        "cut AS (SELECT user_id, min(rn) AS prn FROM e "
        "WHERE event_type = 'purchase' GROUP BY 1)",
        "seq AS MATERIALIZED (SELECT e.user_id, e.rn, "
        "CASE WHEN e.event_type = 'purchase' THEN 'conv' ELSE e.event_type "
        "END AS st, max(e.rn) OVER (PARTITION BY e.user_id) AS lastrn "
        "FROM e LEFT JOIN cut USING (user_id) "
        "WHERE e.rn <= coalesce(cut.prn, 2147483647))",
        "tr AS MATERIALIZED ("
        "SELECT 'start' AS f, st AS t FROM seq WHERE rn = 1 "
        "UNION ALL SELECT a.st, b.st FROM seq a JOIN seq b "
        "ON b.user_id = a.user_id AND b.rn = a.rn + 1 "
        "UNION ALL SELECT st, 'null' FROM seq "
        "WHERE rn = lastrn AND st <> 'conv')",
        "tc AS MATERIALIZED (SELECT f, t, count(*) AS n FROM tr GROUP BY 1, 2)",
        "rsum AS (SELECT f, sum(n) AS rs FROM tc GROUP BY 1)",
        "tp AS MATERIALIZED (SELECT tc.f, tc.t, "
        "CAST(tc.n AS DOUBLE) / CAST(rsum.rs AS DOUBLE) AS prob "
        "FROM tc JOIN rsum USING (f))",
        f"stv(s) AS (VALUES {st_vals})",
    ]
    variants = [("full", "'<none>'")] + [(c, f"'{c}'") for c in channels]
    for vname, removed in variants:
        v = vname.replace("-", "_")
        parts.append(
            f"p_{v}_0 AS (SELECT s AS state, CAST(0 AS DOUBLE) AS p FROM stv)"
        )
        for k in range(1, iters + 1):
            parts.append(
                f"p_{v}_{k} AS MATERIALIZED (SELECT stv.s AS state, "
                "coalesce(sum(tp.prob * CASE WHEN tp.t = 'conv' THEN 1.0 "
                f"WHEN tp.t IN ({ch_list}) AND tp.t <> {removed} "
                "THEN coalesce(pp.p, 0) ELSE 0 END), 0) AS p "
                "FROM stv LEFT JOIN tp ON tp.f = stv.s "
                f"LEFT JOIN p_{v}_{k - 1} pp ON pp.state = tp.t GROUP BY 1)"
            )
    full_p = f"(SELECT p FROM p_full_{iters} WHERE state = 'start')"
    selects = [
        f"SELECT 'FULL' AS channel, round({full_p}, 6) AS p_conv, "
        "0.0 AS removal_effect"
    ]
    for c in channels:
        pc = f"(SELECT p FROM p_{c}_{iters} WHERE state = 'start')"
        selects.append(
            f"SELECT '{c}', round({pc}, 6), "
            f"round(CASE WHEN {full_p} > 0 THEN 1.0 - {pc} / {full_p} "
            "ELSE 0.0 END, 6)"
        )
    return ", ".join(parts) + " " + " UNION ALL ".join(selects)


def _granger_sql(type_x: str = "view", type_y: str = "purchase") -> str:
    """Two-direction Granger 1-lag F-test replay (mirrors
    relational.granger_daily): dense-calendar daily counts, LAG pairs,
    HUGEINT raw moments, n-scaled centered moments and the closed-form
    restricted/full RSS with the engine's exact operand tree (all
    intermediates < 2⁵³ at oracle scale, so double arithmetic is exact
    until the final divisions)."""

    def one(yx: str, xx: str, label: str) -> str:
        return (
            f"SELECT '{label}' AS direction, CAST(c.n AS BIGINT) AS n, "
            "round(CASE WHEN c.n > 3 AND c.c11 > 0 AND "
            "(c.c11 * c.cxx - c.c1x * c.c1x) > 0 AND "
            "(c.cyy - ((c.cxx * c.c1y - c.c1x * c.cxy) / "
            "(c.c11 * c.cxx - c.c1x * c.c1x)) * c.c1y - "
            "((c.c11 * c.cxy - c.c1x * c.c1y) / "
            "(c.c11 * c.cxx - c.c1x * c.c1x)) * c.cxy) > 0 THEN "
            "((c.cyy - (c.c1y * c.c1y) / c.c11) - "
            "(c.cyy - ((c.cxx * c.c1y - c.c1x * c.cxy) / "
            "(c.c11 * c.cxx - c.c1x * c.c1x)) * c.c1y - "
            "((c.c11 * c.cxy - c.c1x * c.c1y) / "
            "(c.c11 * c.cxx - c.c1x * c.c1x)) * c.cxy)) / "
            "((c.cyy - ((c.cxx * c.c1y - c.c1x * c.cxy) / "
            "(c.c11 * c.cxx - c.c1x * c.c1x)) * c.c1y - "
            "((c.c11 * c.cxy - c.c1x * c.c1y) / "
            "(c.c11 * c.cxx - c.c1x * c.c1x)) * c.cxy) / (c.n - 3)) "
            "ELSE 0.0 END, 6) AS f_stat FROM ("
            f"SELECT m.n, "
            "CAST(m.n * m.syy - m.sy * m.sy AS DOUBLE) AS cyy, "
            "CAST(m.n * m.s11 - m.sy1 * m.sy1 AS DOUBLE) AS c11, "
            "CAST(m.n * m.sxx - m.sx1 * m.sx1 AS DOUBLE) AS cxx, "
            "CAST(m.n * m.syy1 - m.sy1 * m.sy AS DOUBLE) AS c1y, "
            "CAST(m.n * m.syx1 - m.sx1 * m.sy AS DOUBLE) AS cxy, "
            "CAST(m.n * m.s1x - m.sy1 * m.sx1 AS DOUBLE) AS c1x FROM ("
            f"SELECT count(*) AS n, sum({yx}) AS sy, sum({yx}1) AS sy1, "
            f"sum({xx}1) AS sx1, sum({yx} * {yx}) AS syy, "
            f"sum({yx}1 * {yx}1) AS s11, sum({xx}1 * {xx}1) AS sxx, "
            f"sum({yx} * {yx}1) AS syy1, sum({yx} * {xx}1) AS syx1, "
            f"sum({yx}1 * {xx}1) AS s1x FROM l WHERE y1 IS NOT NULL) m) c"
        )

    return (
        "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
        f"sum(CASE WHEN event_type = '{type_x}' THEN 1 ELSE 0 END) AS x, "
        f"sum(CASE WHEN event_type = '{type_y}' THEN 1 ELSE 0 END) AS y "
        "FROM events GROUP BY 1), "
        "b AS (SELECT min(day) AS lo, max(day) AS hi FROM d), "
        "cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b), "
        "dd AS (SELECT cal.day, coalesce(d.x, 0) AS x, coalesce(d.y, 0) AS y "
        "FROM cal LEFT JOIN d USING (day)), "
        "l AS (SELECT day, x, y, lag(x) OVER (ORDER BY day) AS x1, "
        "lag(y) OVER (ORDER BY day) AS y1 FROM dd) "
        + one("y", "x", f"{type_x}->{type_y}")
        + " UNION ALL "
        + one("x", "y", f"{type_y}->{type_x}")
    )


def _kcenter_sql(k: int = 8, scale: int = 10_000) -> str:
    """Unrolled Gonzalez k-center greedy (mirrors similarity.kcenter_coreset):
    the same int64 quantization as _kmeans_assign_ctes, per-round exact
    min-distance to the selected set via the dim-aligned join, argmax by
    (d2 DESC, vec_id) LIMIT 1."""
    parts = [
        f"WITH q AS MATERIALIZED (SELECT vec_id, [CAST(round(CAST(v AS DOUBLE) "
        f"* {scale}) AS BIGINT) for v in embedding] AS qv FROM embeddings)",
        "xe AS MATERIALIZED (SELECT vec_id, generate_subscripts(qv, 1) AS i, "
        "unnest(qv) AS v FROM q)",
        "cs1 AS MATERIALIZED (SELECT vec_id FROM q ORDER BY vec_id LIMIT 1)",
    ]
    for r in range(1, k):
        parts.append(
            f"dc{r} AS MATERIALIZED (SELECT x.vec_id, c.vec_id AS cid, "
            f"sum((x.v - y.v) * (x.v - y.v)) AS d FROM xe x "
            f"JOIN cs{r} c ON true JOIN xe y ON y.vec_id = c.vec_id "
            "AND y.i = x.i GROUP BY 1, 2)"
        )
        parts.append(
            f"w{r} AS MATERIALIZED (SELECT vec_id, min(d) AS d2 FROM dc{r} "
            "GROUP BY 1 ORDER BY min(d) DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f"cs{r + 1} AS MATERIALIZED (SELECT vec_id FROM cs{r} "
            f"UNION ALL SELECT vec_id FROM w{r})"
        )
    union = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, vec_id, "
        f"CAST(d2 AS BIGINT) AS d2 FROM w{r}"
        for r in range(1, k)
    )
    return (
        ", ".join(parts)
        + " SELECT CAST(0 AS BIGINT) AS rank, vec_id, "
        "CAST(0 AS BIGINT) AS d2 FROM cs1 UNION ALL " + union
    )


def _kmeans_assign_ctes(k: int = 8, scale: int = 10_000) -> str:
    """Shared CTE chain replaying similarity.kmeans_assign's integer
    assignment bit-exactly: quantize every embedding to int64 by half-away
    rounding of x·scale (list comprehension — DuckDB rounds half away like
    functions.rounding.round_half_away), take the k lowest-vec_id rows as
    seeds, form EXACT integer squared-L2 per (vector, seed) via the
    dim-aligned unnest join, and keep the (d2, cid)-min row per vector.
    Ends with ``asg(vec_id, cid, d2)``."""
    return (
        f"q AS MATERIALIZED (SELECT vec_id, [CAST(round(CAST(v AS DOUBLE) * "
        f"{scale}) AS BIGINT) for v in embedding] AS qv FROM embeddings), "
        f"seeds AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) "
        f"- 1 AS cid, qv AS cv FROM q ORDER BY vec_id LIMIT {k}), "
        "xe AS MATERIALIZED (SELECT vec_id, generate_subscripts(qv, 1) AS i, "
        "unnest(qv) AS v FROM q), "
        "ce AS MATERIALIZED (SELECT cid, generate_subscripts(cv, 1) AS i, "
        "unnest(cv) AS v FROM seeds), "
        "dist AS MATERIALIZED (SELECT xe.vec_id, ce.cid, "
        "sum((xe.v - ce.v) * (xe.v - ce.v)) AS d2 "
        "FROM xe JOIN ce ON ce.i = xe.i GROUP BY 1, 2), "
        "asg AS MATERIALIZED (SELECT vec_id, cid, d2 FROM "
        "(SELECT *, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY d2, cid) AS rn FROM dist) WHERE rn = 1)"
    )


_BUSHY_SQL = (
            # closed-form leaf fold: for each injective (root, v1, v3, v5)
            # star (labels 3/0/1/2 distinct → injective automatically),
            # each leg's leaf count = c(internal, leaf_label) minus ONE
            # adjacency indicator (the only same-label assigned vertex the
            # leaf could collide with); the embedding count is the product
            f"WITH {_ESYM_MAT}, "
            "lab AS MATERIALIZED (SELECT p_partkey AS vid, "
            "CASE WHEN p_partkey % 97 = 0 THEN 3 ELSE p_size % 3 END AS l "
            "FROM part), "
            "cnt AS MATERIALIZED (SELECT e.src AS vid, lab.l, "
            "CAST(count(*) AS BIGINT) c FROM e "
            "JOIN lab ON lab.vid = e.dst GROUP BY 1, 2), "
            "fr AS (SELECT e1.dst v1, e3.dst v3, e5.dst v5 "
            "FROM lab r "
            "JOIN e e1 ON e1.src = r.vid "
            "JOIN lab l1 ON l1.vid = e1.dst AND l1.l = 0 "
            "JOIN e e3 ON e3.src = r.vid "
            "JOIN lab l3 ON l3.vid = e3.dst AND l3.l = 1 "
            "JOIN e e5 ON e5.src = r.vid "
            "JOIN lab l5 ON l5.vid = e5.dst AND l5.l = 2 "
            "WHERE r.l = 3) "
            "SELECT CAST(coalesce(sum("
            "(cA.c - CASE WHEN a13.src IS NULL THEN 0 ELSE 1 END) * "
            "(cB.c - CASE WHEN a35.src IS NULL THEN 0 ELSE 1 END) * "
            "(cC.c - CASE WHEN a51.src IS NULL THEN 0 ELSE 1 END)), 0) "
            "AS BIGINT) AS n_embeddings "
            "FROM fr "
            "JOIN cnt cA ON cA.vid = fr.v1 AND cA.l = 1 "
            "JOIN cnt cB ON cB.vid = fr.v3 AND cB.l = 2 "
            "JOIN cnt cC ON cC.vid = fr.v5 AND cC.l = 0 "
            "LEFT JOIN e a13 ON a13.src = fr.v1 AND a13.dst = fr.v3 "
            "LEFT JOIN e a35 ON a35.src = fr.v3 AND a35.dst = fr.v5 "
            "LEFT JOIN e a51 ON a51.src = fr.v5 AND a51.dst = fr.v1"
        )


def oracle_sql() -> dict[str, str]:
    toks = "regexp_split_to_array(trim(text), '\\s+')"
    ntok = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({toks}) END"
    nonws = "length(regexp_replace(text, '\\s', '', 'g'))"
    alnum = "length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))"
    stop = (
        f"len(list_filter({toks}, x -> list_contains({_stopword_sql_list()}, lower(x))))"
    )
    # positions CTE for the space-split tokenizer (split(' ') dropping
    # empties): unnest + generate_subscripts stay aligned in DuckDB, giving
    # (doc_id, pos, tok) — word n-grams are then plain pos self-joins.
    sp_toks = "list_filter(string_split(text, ' '), x -> x <> '')"
    tok_cte = (
        f"tok AS (SELECT doc_id, unnest({sp_toks}) AS tok, "
        f"generate_subscripts({sp_toks}, 1) AS pos FROM documents)"
    )
    return {
        "copurchase_edges": f"WITH {_EU} SELECT src, dst FROM eu",
        "degree_distribution": (
            f"WITH {_ESYM} SELECT src AS vid, count(*) AS degree FROM e GROUP BY 1"
        ),
        "pagerank_copurchase": _pagerank_sql(PR_ITERS),
        "wpagerank_copurchase": _wpagerank_sql(PR_ITERS),
        "wsssp_weighted_copurchase": _wsssp_stored_sql(),
        "ppr_copurchase": _ppr_sql(PR_ITERS),
        "spam_mass_copurchase": _spam_mass_sql(PR_ITERS),
        "bipartite_copurchase": _bipartite_sql(),
        "matching_copurchase": _matching_sql(),
        "diameter_copurchase": _diameter_sql(),
        "spectral_radius_copurchase": _spectral_sql(),
        "coarsen_matching_copurchase": (
            # contract the ORACLE's matching (same 24-round handshake
            # unroll, as a subquery), map both edge endpoints, drop
            # intra-pair edges, count collapsed pairs
            f"WITH m AS MATERIALIZED (SELECT vid, partner FROM ({_matching_sql()})), "
            "lab AS MATERIALIZED (SELECT vid, CASE WHEN partner >= 0 THEN "
            "least(vid, partner) ELSE vid END AS l FROM m), "
            "eu AS (SELECT a.l_partkey AS src, b.l_partkey AS dst "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2), "
            "ce AS (SELECT least(ls.l, ld.l) AS src, "
            "greatest(ls.l, ld.l) AS dst FROM eu "
            "JOIN lab ls ON ls.vid = eu.src JOIN lab ld ON ld.vid = eu.dst "
            "WHERE ls.l <> ld.l) "
            "SELECT src, dst, CAST(count(*) AS BIGINT) AS n_multi "
            "FROM ce GROUP BY 1, 2"
        ),
        "part_supplier_hhi": (
            # HHI = Σr² / (double(Σr)·double(Σr)) — op order mirrors the
            # engine exactly (see relational.part_supplier_hhi)
            "WITH ps AS (SELECT l_partkey AS part, l_suppkey AS supp, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev "
            "FROM lineitem GROUP BY 1, 2) "
            "SELECT part, CAST(count(*) AS BIGINT) AS n_suppliers, "
            "round(CASE WHEN sum(rev) > 0 THEN "
            "CAST(sum(rev * rev) AS DOUBLE) / "
            "(CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE)) "
            "ELSE 0 END, 6) AS hhi FROM ps GROUP BY 1"
        ),
        "repeat_purchase_rate": (
            # per-part loyalty: distinct customers vs ≥2-distinct-order
            # customers; rate is one int/int IEEE division
            "WITH pco AS (SELECT DISTINCT l_partkey AS part, o_custkey AS "
            "cust, o_orderkey AS okey FROM lineitem "
            "JOIN orders ON o_orderkey = l_orderkey), "
            "pc AS (SELECT part, cust, count(*) AS n_orders FROM pco "
            "GROUP BY 1, 2) "
            "SELECT part, CAST(count(*) AS BIGINT) AS n_cust, "
            "CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_repeat, "
            "round(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1.0 "
            "/ count(*), 6) AS repeat_rate FROM pc GROUP BY 1"
        ),
        "brand_discount_elasticity": (
            # exact int64 moments; slope/intercept mirror the engine's op
            # order term for term (one division; intercept reuses slope)
            "WITH m AS MATERIALIZED (SELECT p_brand AS brand, "
            "CAST(count(*) AS BIGINT) AS n, "
            "sum(CAST(round(l_discount * 100) AS BIGINT)) AS sx, "
            "sum(CAST(round(l_quantity) AS BIGINT)) AS sy, "
            "sum(CAST(round(l_discount * 100) AS BIGINT) * "
            "CAST(round(l_quantity) AS BIGINT)) AS sxy, "
            "sum(CAST(round(l_discount * 100) AS BIGINT) * "
            "CAST(round(l_discount * 100) AS BIGINT)) AS sxx "
            "FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY 1), "
            "s AS (SELECT brand, n, sx, sy, "
            "CASE WHEN n * sxx - sx * sx > 0 THEN "
            "(n * sxy - sx * sy) / (n * sxx - sx * sx) ELSE 0 END AS slope "
            "FROM m) "
            "SELECT brand, n, round(slope, 6) AS slope, "
            "round(CASE WHEN n > 0 THEN (sy - slope * sx) / n ELSE 0 END, 6) "
            "AS intercept FROM s"
        ),
        "butterfly_count_orders": (
            # Σ over part pairs C(shared-orders, 2) — exact-int bipartite
            # 4-cycle count over the order×part graph
            "WITH ew AS MATERIALIZED (SELECT a.l_partkey AS s, "
            "b.l_partkey AS d, count(DISTINCT a.l_orderkey) AS w "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2) "
            "SELECT CAST(coalesce(sum(w * (w - 1) // 2), 0) AS BIGINT) "
            "AS n_butterflies FROM ew"
        ),
        "vertex_cover_copurchase": (
            # Gavril 2-approx: in_cover ⇔ matched in the handshake unroll
            f"WITH mm AS MATERIALIZED (FROM ({_matching_sql()})) "
            "SELECT vid, partner <> -1 AS in_cover FROM mm"
        ),
        "label_mixing_copurchase": (
            # mixing matrix over the symmetric edge CTE; labels are the
            # part_labels p_size % 3 classes joined on both endpoints
            f"WITH {_ESYM_MAT}, "
            "l AS MATERIALIZED (SELECT p_partkey AS vid, "
            "p_size % 3 AS lbl FROM part) "
            "SELECT la.lbl AS label_a, lb.lbl AS label_b, "
            "count(*) AS n_edges FROM e "
            "JOIN l la ON la.vid = e.src JOIN l lb ON lb.vid = e.dst "
            "GROUP BY 1, 2"
        ),
        "hits_copurchase": _hits_sql(HITS_ITERS),
        "random_walks_copurchase": _walk_sql(4),
        "walk_pmi_copurchase": _walk_pmi_sql(),
        "cc_copurchase": _cc_sql(),
        "sssp_copurchase": _sssp_sql(),
        "bfs_layer_sizes": (
            f"SELECT dist, CAST(count(*) AS BIGINT) AS n_vertices "
            f"FROM ({_sssp_sql()}) GROUP BY 1"
        ),
        "betweenness_copurchase": _betweenness_sql(),
        "closeness_copurchase": _closeness_sql(),
        "wsssp_copurchase": _wsssp_sql(),
        "rich_club_copurchase": _rich_club_sql(),
        "eccentricity_copurchase": _eccentricity_sql(),
        "lpa_modularity_copurchase": _lpa_modularity_sql(LPA_ITERS),
        "katz_copurchase": _katz_sql(),
        "link_prediction_copurchase": _link_prediction_sql(),
        "mis_copurchase": _mis_sql(),
        "coloring_copurchase": _coloring_sql(),
        "semi_clustering_strong": _semi_clustering_sql(),
        "bpe_merges": _bpe_merges_sql(),
        "bpe_encode": _bpe_encode_sql(),
        "triangle_count_copurchase": (
            f"WITH {_EU} SELECT count(*) AS n_triangles FROM eu e1 "
            "JOIN eu e2 ON e2.src = e1.dst "
            "JOIN eu e3 ON e3.src = e1.src AND e3.dst = e2.dst"
        ),
        "assortativity_copurchase": (
            # exact-integer sums cast to DOUBLE, then the same operation
            # order as pipelines/algorithms.assortativity → bit-exact
            f"WITH {_ESYM_MAT}, "
            "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS d FROM e GROUP BY 1), "
            "j AS MATERIALIZED (SELECT d1.d AS x, d2.d AS y FROM e "
            "JOIN deg d1 ON d1.vid = e.src JOIN deg d2 ON d2.vid = e.dst), "
            "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
            "CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy, "
            "CAST(sum(x*y) AS DOUBLE) AS sxy, CAST(sum(x*x) AS DOUBLE) AS sxx, "
            "CAST(sum(y*y) AS DOUBLE) AS syy FROM j) "
            "SELECT round((n * sxy - sx * sy) / "
            "sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS assortativity "
            "FROM s"
        ),
        "clustering_coeff_copurchase": (
            # per-vertex triangles: ordered neighbor pairs (a<b) of v that
            # are themselves adjacent; cc = 2T/(d(d-1)) with the exact
            # operation order of the engine kernel (algorithms.py)
            f"WITH {_ESYM_MAT}, "
            "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS d FROM e GROUP BY 1), "
            "tri AS MATERIALIZED (SELECT e1.src AS vid, count(*) AS t FROM e e1 "
            "JOIN e e2 ON e2.src = e1.src AND e2.dst > e1.dst "
            "JOIN e e3 ON e3.src = e1.dst AND e3.dst = e2.dst GROUP BY 1) "
            "SELECT deg.vid, round(CASE WHEN deg.d < 2 THEN 0 ELSE "
            "2.0 * coalesce(tri.t, 0) / (deg.d * (deg.d - 1)) END, 6) AS clustering "
            "FROM deg LEFT JOIN tri ON tri.vid = deg.vid"
        ),
        "match_triangle_labeled": (
            f"WITH {_ESYM}, lab AS (SELECT p_partkey AS vid, p_size % 3 AS l FROM part) "
            "SELECT count(*) AS n_embeddings FROM e e1 "
            "JOIN e e2 ON e2.src = e1.dst JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src "
            "JOIN lab a ON a.vid = e1.src JOIN lab b ON b.vid = e1.dst "
            "JOIN lab c ON c.vid = e2.dst "
            "WHERE a.l = 0 AND b.l = 1 AND c.l = 2"
        ),
        "match_p3_labeled": (
            f"WITH {_ESYM}, lab AS (SELECT p_partkey AS vid, p_size % 3 AS l FROM part) "
            "SELECT count(*) AS n_embeddings FROM e e1 "
            "JOIN e e2 ON e2.src = e1.dst AND e2.dst <> e1.src "
            "JOIN lab a ON a.vid = e1.src JOIN lab b ON b.vid = e1.dst "
            "JOIN lab c ON c.vid = e2.dst "
            "WHERE a.l = 0 AND b.l = 1 AND c.l = 0"
        ),
        "match_4cycle_labeled": (
            f"WITH {_ESYM}, lab AS (SELECT p_partkey AS vid, p_size % 3 AS l FROM part) "
            "SELECT count(*) AS n_embeddings FROM e e1 "
            "JOIN e e2 ON e2.src = e1.dst "
            "JOIN e e3 ON e3.src = e2.dst "
            "JOIN e e4 ON e4.src = e3.dst AND e4.dst = e1.src "
            "JOIN lab a ON a.vid = e1.src JOIN lab b ON b.vid = e1.dst "
            "JOIN lab c ON c.vid = e2.dst JOIN lab d ON d.vid = e3.dst "
            "WHERE a.l = 0 AND b.l = 2 AND c.l = 1 AND d.l = 2 "
            "AND e1.src <> e2.dst AND e1.dst <> e3.dst"
        ),
        "match_deep_tree": (
            f"WITH {_ESTRONG}, "
            "lab AS MATERIALIZED (SELECT p_partkey AS vid, p_size % 3 AS l FROM part) "
            "SELECT count(*) AS n_embeddings "
            "FROM e e01 "
            "JOIN e e12 ON e12.src = e01.dst "
            "JOIN e e23 ON e23.src = e12.dst "
            "JOIN e e34 ON e34.src = e23.dst "
            "JOIN e e45 ON e45.src = e34.dst "
            "JOIN e e26 ON e26.src = e12.dst "
            "JOIN lab l0 ON l0.vid = e01.src AND l0.l = 0 "
            "JOIN lab l1 ON l1.vid = e01.dst AND l1.l = 1 "
            "JOIN lab l2 ON l2.vid = e12.dst AND l2.l = 2 "
            "JOIN lab l3 ON l3.vid = e23.dst AND l3.l = 0 "
            "JOIN lab l4 ON l4.vid = e34.dst AND l4.l = 1 "
            "JOIN lab l5 ON l5.vid = e45.dst AND l5.l = 0 "
            "JOIN lab l6 ON l6.vid = e26.dst AND l6.l = 2 "
            "WHERE e01.src <> e23.dst AND e01.src <> e45.dst "
            "AND e23.dst <> e45.dst AND e01.dst <> e34.dst "
            "AND e12.dst <> e26.dst"
        ),
        "match_bushy": _BUSHY_SQL,
        "match_bushy_fold3": _BUSHY_SQL,
        "match_bushy_deep": (
            # closed-form branch fold: labels make every cross-branch /
            # root pair automatically injective; the only same-label pairs
            # are within-branch (a3<>a1, b3<>b1 — explicit predicates), so
            # the count is sum over roots of (#branch-A chains) × (#branch-B
            # chains) — exactly the engine's per-root factor product
            f"WITH {_ESYM_MAT}, "
            "lab AS MATERIALIZED (SELECT p_partkey AS vid, "
            "CASE WHEN p_partkey % 97 = 0 THEN 4 ELSE p_size % 4 END AS l "
            "FROM part), "
            "el AS MATERIALIZED (SELECT e.src, e.dst, ls.l AS sl, ld.l AS dl "
            "FROM e JOIN lab ls ON ls.vid = e.src "
            "JOIN lab ld ON ld.vid = e.dst), "
            "ca AS (SELECT e1.src AS root, CAST(count(*) AS BIGINT) AS c "
            "FROM el e1 JOIN el e2 ON e2.src = e1.dst "
            "JOIN el e3 ON e3.src = e2.dst "
            "WHERE e1.sl = 4 AND e1.dl = 0 AND e2.dl = 1 AND e3.dl = 0 "
            "AND e3.dst <> e1.dst GROUP BY 1), "
            "cb AS (SELECT e1.src AS root, CAST(count(*) AS BIGINT) AS c "
            "FROM el e1 JOIN el e2 ON e2.src = e1.dst "
            "JOIN el e3 ON e3.src = e2.dst "
            "WHERE e1.sl = 4 AND e1.dl = 2 AND e2.dl = 3 AND e3.dl = 2 "
            "AND e3.dst <> e1.dst GROUP BY 1) "
            "SELECT CAST(coalesce(sum(ca.c * cb.c), 0) AS BIGINT) "
            "AS n_embeddings FROM ca JOIN cb USING (root)"
        ),
        "match_bushy_shared": (
            # shared-label branch fold, closed form: the two chains share
            # their MIDDLE label (a2, b2 both label 1), so
            #   exact = Σ_root A(root)·B(root)  −  #collisions
            # where the subtrahend counts the merged-middle quotient (one
            # vertex m = a2 = b2 adjacent to a1, a3, b1, b3) with full
            # injectivity — exactly the engine's relaxed product minus its
            # single conflict-partition term (shared_quotients)
            f"WITH {_ESYM_MAT}, "
            "lab AS MATERIALIZED (SELECT p_partkey AS vid, "
            "CASE WHEN p_partkey % 97 = 0 THEN 4 ELSE p_size % 4 END AS l "
            "FROM part), "
            "el AS MATERIALIZED (SELECT e.src, e.dst, ls.l AS sl, ld.l AS dl "
            "FROM e JOIN lab ls ON ls.vid = e.src "
            "JOIN lab ld ON ld.vid = e.dst), "
            "ca AS (SELECT e1.src AS root, CAST(count(*) AS BIGINT) AS c "
            "FROM el e1 JOIN el e2 ON e2.src = e1.dst "
            "JOIN el e3 ON e3.src = e2.dst "
            "WHERE e1.sl = 4 AND e1.dl = 0 AND e2.dl = 1 AND e3.dl = 0 "
            "AND e3.dst <> e1.dst GROUP BY 1), "
            "cb AS (SELECT e1.src AS root, CAST(count(*) AS BIGINT) AS c "
            "FROM el e1 JOIN el e2 ON e2.src = e1.dst "
            "JOIN el e3 ON e3.src = e2.dst "
            "WHERE e1.sl = 4 AND e1.dl = 2 AND e2.dl = 1 AND e3.dl = 2 "
            "AND e3.dst <> e1.dst GROUP BY 1), "
            "rel AS (SELECT coalesce(sum(ca.c * cb.c), 0) AS n "
            "FROM ca JOIN cb USING (root)), "
            "col AS (SELECT count(*) AS n FROM el e1 "
            "JOIN el e2 ON e2.src = e1.dst "
            "JOIN el e3 ON e3.src = e2.dst "
            "JOIN el e4 ON e4.src = e1.src "
            "JOIN el e5 ON e5.src = e4.dst AND e5.dst = e2.dst "
            "JOIN el e6 ON e6.src = e2.dst "
            "WHERE e1.sl = 4 AND e1.dl = 0 AND e2.dl = 1 "
            "AND e3.dl = 0 AND e3.dst <> e1.dst "
            "AND e4.dl = 2 AND e6.dl = 2 AND e6.dst <> e4.dst) "
            "SELECT CAST(rel.n - col.n AS BIGINT) AS n_embeddings "
            "FROM rel, col"
        ),
        "match_embeddings_tri": (
            "WITH e AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "WHERE a.l_partkey <> b.l_partkey GROUP BY 1, 2 "
            "HAVING count(DISTINCT a.l_orderkey) >= 2), "
            "lab AS MATERIALIZED (SELECT p_partkey AS vid, p_size % 3 AS l FROM part) "
            "SELECT e1.src AS v0, e1.dst AS v1, e2.dst AS v2 FROM e e1 "
            "JOIN e e2 ON e2.src = e1.dst "
            "JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src "
            "JOIN lab a ON a.vid = e1.src AND a.l = 0 "
            "JOIN lab b ON b.vid = e1.dst AND b.l = 1 "
            "JOIN lab c ON c.vid = e2.dst AND c.l = 2"
        ),
        "match_triangle_per_root": (
            f"WITH {_ESYM}, lab AS (SELECT p_partkey AS vid, p_size % 3 AS l FROM part) "
            "SELECT e1.src AS vid, count(*) AS n_embeddings FROM e e1 "
            "JOIN e e2 ON e2.src = e1.dst JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src "
            "JOIN lab a ON a.vid = e1.src JOIN lab b ON b.vid = e1.dst "
            "JOIN lab c ON c.vid = e2.dst "
            "WHERE a.l = 0 AND b.l = 1 AND c.l = 2 GROUP BY e1.src"
        ),
        "token_count": (
            f"SELECT doc_id, {ntok} AS n_tokens, "
            "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) "
            "AS n_subtokens FROM documents"
        ),
        "text_stats": (
            f"SELECT doc_id, length(text) AS n_chars, {ntok} AS n_tokens, "
            f"round(CASE WHEN length(text) = 0 THEN 0 ELSE {alnum} * 1.0 / length(text) END, 6) AS alnum_ratio, "
            f"round(CASE WHEN {ntok} = 0 THEN 0 ELSE {nonws} * 1.0 / {ntok} END, 6) AS avg_token_len, "
            f"round(CASE WHEN {ntok} = 0 THEN 0 ELSE {stop} * 1.0 / {ntok} END, 6) AS stop_ratio "
            "FROM documents"
        ),
        "exact_dedup": (
            "SELECT min(doc_id) AS doc_id, md5(text) AS content_hash "
            "FROM documents GROUP BY md5(text)"
        ),
        "corpus_clean": (
            # quality gate (raw int/int double ratios — bit-identical to the
            # engine's numpy divide) then exact dedup keeping min doc_id;
            # text is constant within a hash group, so min(n_tokens) is the
            # kept doc's token count.
            f"WITH s AS MATERIALIZED (SELECT doc_id, text, {ntok} AS n_tokens "
            "FROM documents "
            f"WHERE {ntok} >= 20 AND length(text) > 0 "
            f"AND {alnum} * 1.0 / length(text) >= 0.82) "
            "SELECT min(doc_id) AS doc_id, md5(text) AS content_hash, "
            "min(n_tokens) AS n_tokens FROM s GROUP BY md5(text)"
        ),
        "bigram_cross_entropy": (
            # corpus bigram LM: -(1/m) sum ln(c(bg)/c_left(w1)) over each
            # doc's bigram occurrences; same ln/round discipline as
            # doc_cross_entropy; < 2-token docs have no bigrams
            f"WITH {tok_cte}, "
            "big AS (SELECT a.doc_id, a.tok AS w1, a.tok || ' ' || b.tok AS bg "
            "FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1), "
            "bc AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM big GROUP BY 1), "
            "lc AS (SELECT w1, CAST(count(*) AS BIGINT) AS cl FROM big GROUP BY 1), "
            "d AS (SELECT doc_id, bg, w1, CAST(count(*) AS BIGINT) AS k "
            "FROM big GROUP BY 1, 2, 3), "
            "s AS (SELECT doc_id, sum(k * -ln(bc.c12 * 1.0 / lc.cl)) AS s, "
            "sum(k) AS n FROM d JOIN bc USING (bg) JOIN lc USING (w1) "
            "GROUP BY doc_id) "
            "SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams, "
            "round(s / n, 6) AS bigram_cross_entropy FROM s"
        ),
        "incremental_dedup": (
            # new snapshot (odd doc_id) anti-joined against old (even) on
            # exact text content — md5 in the engine, text equality here
            # (same convention as exact_dedup)
            "SELECT d.doc_id, d.source FROM documents d "
            "WHERE d.doc_id % 2 = 1 AND NOT EXISTS ("
            "SELECT 1 FROM documents o WHERE o.doc_id % 2 = 0 "
            "AND o.text = d.text)"
        ),
        "vocab_coverage_curve": (
            # rank by the vocab_topk total order (cnt DESC, token ASC);
            # covered mass and total are exact int64 sums, coverage ONE
            # IEEE division per row
            f"WITH tok AS (SELECT unnest({toks}) AS token FROM documents "
            "WHERE trim(text) <> ''), "
            "cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY 1), "
            "r AS (SELECT c, row_number() OVER (ORDER BY c DESC, token) "
            "AS rk FROM cnt), "
            "tot AS (SELECT sum(c) AS t FROM cnt), "
            "kk AS (SELECT unnest([10, 50, 100, 1000, 10000]) AS k) "
            "SELECT CAST(kk.k AS BIGINT) AS k, "
            "CAST((SELECT coalesce(sum(c), 0) FROM r WHERE rk <= kk.k) "
            "AS BIGINT) AS covered_tokens, "
            "round((SELECT coalesce(sum(c), 0) FROM r WHERE rk <= kk.k) "
            "* 1.0 / tot.t, 6) AS coverage FROM kk, tot"
        ),
        "shard_balance": (
            # md5_number_lower % 64 replays the engine's md5_lower64
            # shard id bit-exactly; counts and utf-8 byte sums are
            # exact int64
            "SELECT CAST(md5_number_lower(text) % 64 AS BIGINT) AS shard, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(strlen(text)) AS BIGINT) AS n_bytes "
            "FROM documents GROUP BY 1"
        ),
        "temperature_mixture": (
            # alpha=0.3 temperature panel; share and pow are per-row IEEE
            # evaluations of exact int64 sums (libm pow both sides);
            # normalization is deliberately NOT done (cross-row float sum
            # has engine-dependent addend order — see engine docstring)
            "WITH st AS (SELECT source, "
            f"sum(CASE WHEN trim(text) = '' THEN 0 ELSE len({sp_toks}) END) "
            "AS n_tokens FROM documents GROUP BY 1), "
            "tot AS (SELECT sum(n_tokens) AS t FROM st) "
            "SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "round(n_tokens * 1.0 / tot.t, 6) AS token_share, "
            "round(pow(n_tokens * 1.0 / tot.t, 0.3), 6) AS sampling_score "
            "FROM st, tot"
        ),
        "tokenizer_fertility": (
            # whitespace words vs GPT-2-style pre-tokenizer pieces per
            # lang; fertility = ONE division of the exact int64 sums
            f"WITH d AS (SELECT lang, {ntok} AS nw, "
            "len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS np FROM documents), "
            "s AS (SELECT lang, CAST(sum(nw) AS BIGINT) AS n_words, "
            "CAST(sum(np) AS BIGINT) AS n_pieces FROM d GROUP BY 1) "
            "SELECT lang, n_words, n_pieces, "
            "round(n_pieces * 1.0 / n_words, 6) AS fertility FROM s"
        ),
        "source_mixture_weights": (
            # uniform-target mixing weights; share/weight are single IEEE
            # divisions of exact ints in the engine's exact order
            "WITH st AS (SELECT source, "
            f"sum(CASE WHEN trim(text) = '' THEN 0 ELSE len({sp_toks}) END) "
            "AS n_tokens FROM documents GROUP BY 1), "
            "tot AS (SELECT sum(n_tokens) AS t, count(*) AS s FROM st) "
            "SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "round(n_tokens * 1.0 / tot.t, 6) AS token_share, "
            "CASE WHEN n_tokens = 0 THEN 0.0 ELSE "
            "round((1.0 / tot.s) / (n_tokens * 1.0 / tot.t), 6) END AS weight "
            "FROM st, tot"
        ),
        "doc_cross_entropy": (
            # mirrors textops.doc_cross_entropy: per-(doc,token) counts
            # first, then the SAME k · (−ln p) term structure, so float
            # noise is bounded by sum order (≪ the 6-decimal round)
            f"WITH tok AS (SELECT doc_id, unnest({toks}) AS token "
            "FROM documents WHERE trim(text) <> ''), "
            "dt AS (SELECT doc_id, token, count(*) AS k FROM tok GROUP BY 1, 2), "
            "cnt AS (SELECT token, CAST(sum(k) AS BIGINT) AS c FROM dt GROUP BY token), "
            "tot AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM dt) "
            "SELECT dt.doc_id, CAST(sum(dt.k) AS BIGINT) AS n_tokens, "
            "round(sum(dt.k * -ln(cnt.c / (SELECT n FROM tot))) / sum(dt.k), 6) "
            "AS cross_entropy FROM dt JOIN cnt ON cnt.token = dt.token "
            "GROUP BY dt.doc_id"
        ),
        "zipf_slope": (
            # log-log OLS over the fully-ranked vocabulary; ln-sum order
            # noise ≪ the round-6 (doc_cross_entropy posture)
            f"WITH t AS (SELECT unnest({toks}) AS token FROM documents "
            "WHERE trim(text) <> ''), "
            "v AS (SELECT token, count(*) AS cnt FROM t GROUP BY 1), "
            "r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) "
            "AS rank FROM v), "
            "m AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(ln(rank)) AS sx, "
            "sum(ln(cnt)) AS sy, sum(ln(rank) * ln(cnt)) AS sxy, "
            "sum(ln(rank) * ln(rank)) AS sxx, "
            "(SELECT count(*) FROM t) AS ntok FROM r), "
            "s AS (SELECT m.*, CASE WHEN n * sxx - sx * sx > 0 THEN "
            "(n * sxy - sx * sy) / (n * sxx - sx * sx) ELSE 0 END AS slope "
            "FROM m) "
            "SELECT CAST(n AS BIGINT) AS n_types, CAST(ntok AS BIGINT) AS "
            "n_tokens, round(slope, 6) AS slope, "
            "round(CASE WHEN n > 0 THEN (sy - slope * sx) / n ELSE 0 END, 6) "
            "AS intercept FROM s"
        ),
        "curriculum_buckets": (
            # NTILE(4) over the doc_cross_entropy CTE's ROUND-6 score
            # (cross_entropy, doc_id) — the same rounded key the engine's
            # sort-ordinal closed form orders by
            f"WITH tok AS (SELECT doc_id, unnest({toks}) AS token "
            "FROM documents WHERE trim(text) <> ''), "
            "dt AS (SELECT doc_id, token, count(*) AS k FROM tok GROUP BY 1, 2), "
            "cnt AS (SELECT token, CAST(sum(k) AS BIGINT) AS c FROM dt "
            "GROUP BY token), "
            "tot AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM dt), "
            "ce AS (SELECT dt.doc_id, CAST(sum(dt.k) AS BIGINT) AS n_tokens, "
            "round(sum(dt.k * -ln(cnt.c / (SELECT n FROM tot))) / sum(dt.k), 6) "
            "AS cross_entropy FROM dt JOIN cnt ON cnt.token = dt.token "
            "GROUP BY dt.doc_id) "
            "SELECT doc_id, n_tokens, cross_entropy, "
            "CAST(ntile(4) OVER (ORDER BY cross_entropy, doc_id) AS BIGINT) "
            "AS bucket FROM ce"
        ),
        "oov_rate": (
            # per-doc OOV vs the same deterministic top-100 vocabulary cut;
            # rate = n_oov*1.0/max(n,1) — identical IEEE op order to numpy
            f"WITH v AS MATERIALIZED (SELECT token FROM ("
            f"SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM "
            f"(SELECT unnest({toks}) AS token FROM documents "
            "WHERE trim(text) <> '') GROUP BY token "
            "ORDER BY cnt DESC, token LIMIT 25)), "
            f"t AS (SELECT doc_id, unnest({toks}) AS token FROM documents "
            "WHERE trim(text) <> ''), "
            "per AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_oov FROM t LEFT JOIN v ON v.token = t.token GROUP BY t.doc_id) "
            "SELECT d.doc_id, coalesce(per.n_tokens, 0) AS n_tokens, "
            "coalesce(per.n_oov, 0) AS n_oov, "
            "round(coalesce(per.n_oov, 0) * 1.0 / "
            "greatest(coalesce(per.n_tokens, 0), 1), 6) AS oov_rate "
            "FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id "
            "ORDER BY d.doc_id"
        ),
        "vocab_topk": (
            # (cnt DESC, token ASC) is a total order, so the LIMIT cut is
            # deterministic on both sides.
            f"SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM "
            f"(SELECT unnest({toks}) AS token FROM documents "
            "WHERE trim(text) <> '') GROUP BY token "
            "ORDER BY cnt DESC, token LIMIT 100"
        ),
        "nb_source_pred": (
            # Multinomial NB replay (textops.nb_classifier): α=1 so only
            # sparse (token-in-source) pairs contribute; argmax on rounded
            # scores with label-asc tie-break on both sides
            f"WITH tok AS MATERIALIZED (SELECT doc_id, source AS lbl, "
            f"unnest({toks}) AS token FROM documents WHERE trim(text) <> ''), "
            "dt AS MATERIALIZED (SELECT doc_id, token, count(*) AS k "
            "FROM tok GROUP BY 1, 2), "
            "m AS MATERIALIZED (SELECT lbl, token, count(*) AS c "
            "FROM tok GROUP BY 1, 2), "
            "tot AS MATERIALIZED (SELECT lbl, count(*) AS t FROM tok GROUP BY 1), "
            "vc AS (SELECT count(DISTINCT token) AS v FROM tok), "
            "pri AS (SELECT source AS lbl, count(*) AS dn FROM documents "
            "GROUP BY 1), "
            f"nd AS (SELECT doc_id, {ntok} AS n FROM documents), "
            "ps AS (SELECT dt.doc_id, m.lbl, sum(dt.k * ln(m.c + 1)) AS s "
            "FROM dt JOIN m ON m.token = dt.token GROUP BY 1, 2), "
            "grid AS (SELECT d.doc_id, t.lbl, "
            "round(ln(p.dn / (SELECT sum(dn) FROM pri)) "
            "- d.n * ln(t.t + (SELECT v FROM vc)) + coalesce(ps.s, 0), 6) "
            "AS score FROM nd d CROSS JOIN tot t JOIN pri p ON p.lbl = t.lbl "
            "LEFT JOIN ps ON ps.doc_id = d.doc_id AND ps.lbl = t.lbl) "
            "SELECT doc_id, lbl AS pred, score FROM (SELECT grid.*, "
            "row_number() OVER (PARTITION BY doc_id "
            "ORDER BY score DESC, lbl) AS rn FROM grid) WHERE rn = 1"
        ),
        "countmin_topk": (
            # CountMin replay: cell sums are exact ints; estimate = min over
            # the d row-cells; md5_number_lower ≡ md5_lower64 (engine hash)
            f"WITH t AS MATERIALIZED (SELECT unnest({toks}) AS token "
            "FROM documents WHERE trim(text) <> ''), "
            "cnts AS MATERIALIZED (SELECT token, count(*) AS c FROM t GROUP BY 1), "
            "rws AS (SELECT unnest(generate_series(0, 3)) AS r), "
            "cells AS MATERIALIZED (SELECT r.r AS r, "
            "CAST(md5_number_lower(concat(CAST(r.r AS VARCHAR), ':', token)) "
            "% 1024 AS BIGINT) AS cell, sum(c) AS cnt "
            "FROM cnts CROSS JOIN rws r GROUP BY 1, 2), "
            "topk AS (SELECT token, c FROM cnts ORDER BY c DESC, token LIMIT 32) "
            "SELECT tk.token, CAST(tk.c AS BIGINT) AS cnt, "
            "CAST(min(ce.cnt) AS BIGINT) AS est "
            "FROM topk tk CROSS JOIN rws r JOIN cells ce ON ce.r = r.r "
            "AND ce.cell = CAST(md5_number_lower(concat(CAST(r.r AS VARCHAR), "
            "':', tk.token)) % 1024 AS BIGINT) GROUP BY 1, 2"
        ),
        "heavy_hitters": (
            # exact integer threshold ceil(N/500) = (N + 499) // 500 — the
            # engine's two-pass MG sketch + verify returns exact counts, so
            # both sides are bit-identical ints.
            f"WITH t AS (SELECT unnest({toks}) AS token FROM documents "
            "WHERE trim(text) <> ''), "
            "tot AS (SELECT count(*) AS n FROM t) "
            "SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY token "
            "HAVING count(*) >= (SELECT (n + 499) // 500 FROM tot) "
            "ORDER BY cnt DESC, token"
        ),
        "doc_repetition": (
            # every ratio is one division of exact ints — bit-identical to
            # the engine's numpy divide; docs with no tokens keep 0 ratios.
            f"WITH {tok_cte}, "
            "cnts AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2), "
            "stats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, "
            "count(*) AS nd, max(c) AS topc FROM cnts GROUP BY 1), "
            "big AS (SELECT a.doc_id, count(*) AS nb, "
            "count(DISTINCT a.tok || ' ' || b.tok) AS nbd "
            "FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 "
            "GROUP BY 1) "
            "SELECT d.doc_id, COALESCE(s.n, 0) AS n_tokens, "
            "CASE WHEN s.n IS NULL THEN 0 ELSE (s.n - s.nd) * 1.0 / s.n END "
            "AS dup_token_ratio, "
            "CASE WHEN s.n IS NULL THEN 0 ELSE s.topc * 1.0 / s.n END "
            "AS top_token_ratio, "
            "CASE WHEN b.nb IS NULL OR b.nb = 0 THEN 0 "
            "ELSE (b.nb - b.nbd) * 1.0 / b.nb END AS dup_bigram_ratio "
            "FROM documents d LEFT JOIN stats s USING (doc_id) "
            "LEFT JOIN big b USING (doc_id)"
        ),
        "contamination": (
            # word-trigram overlap vs the doc_id % 37 == 0 benchmark subset;
            # engine compares md5-hashed grams, SQL the strings — identical
            # membership barring md5 collisions.
            f"WITH {tok_cte}, "
            "tri AS (SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS g "
            "FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 "
            "JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2), "
            "bench AS (SELECT DISTINCT g FROM tri WHERE doc_id % 37 = 0), "
            "dg AS (SELECT DISTINCT doc_id, g FROM tri WHERE doc_id % 37 <> 0), "
            "hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
            "CAST(sum(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_hit FROM dg GROUP BY 1) "
            "SELECT d.doc_id, COALESCE(h.n_grams, 0) AS n_grams, "
            "COALESCE(h.n_hit, 0) AS n_hit, "
            "CASE WHEN h.n_grams IS NULL THEN 0 "
            "ELSE h.n_hit * 1.0 / h.n_grams END AS contamination_ratio "
            "FROM documents d LEFT JOIN hits h USING (doc_id) "
            "WHERE d.doc_id % 37 <> 0"
        ),
        "unigram_quality": (
            # Σ tf·F and Σ tf·[F=1] are exact int64 sums on both sides; each
            # ratio is ONE IEEE division → bit-identical. Docs with ≥1 token
            # only (the engine's groupby sees no empty docs).
            f"WITH {tok_cte}, "
            "tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2), "
            "dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1), "
            "cf AS (SELECT tok, count(*) AS f FROM tok GROUP BY 1), "
            "tot AS (SELECT count(*) AS t FROM tok), "
            "agg AS (SELECT tf.doc_id, CAST(sum(tf.tf * cf.f) AS BIGINT) AS num, "
            "CAST(sum(CASE WHEN cf.f = 1 THEN tf.tf ELSE 0 END) AS BIGINT) AS hap "
            "FROM tf JOIN cf USING (tok) GROUP BY 1) "
            "SELECT dl.doc_id, dl.n AS n_tokens, "
            "agg.num * 1.0 / (dl.n * (SELECT t FROM tot)) AS mean_relfreq, "
            "agg.hap * 1.0 / dl.n AS hapax_ratio "
            "FROM dl JOIN agg USING (doc_id)"
        ),
        "neighbor_sample_copurchase": (
            # deterministic Knuth-hash fanout sample: all intermediates are
            # < 2^63 so BIGINT replays the engine's int64 arithmetic exactly;
            # (hv, dst) is a total order → the rnk <= k cut is unambiguous.
            f"WITH {_EU}, "
            "es AS (SELECT src, dst FROM eu UNION SELECT dst, src FROM eu), "
            "h AS (SELECT src, dst, ((src * 2097152 + dst) % 2147483648) "
            "* 2654435761 % 2147483648 AS hv FROM es), "
            "r AS (SELECT src, dst, row_number() OVER "
            "(PARTITION BY src ORDER BY hv, dst) AS rnk FROM h) "
            "SELECT src, dst, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 5"
        ),
        "collocations_topk": (
            # linear-PMI score = one division of exact int64 products on
            # both sides (bigrams are unique, so (score, w1, w2) is total).
            f"WITH {tok_cte}, "
            "big AS (SELECT a.tok AS w1, b.tok AS w2 FROM tok a "
            "JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1), "
            "bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 "
            "FROM big GROUP BY 1, 2), "
            "uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1), "
            "tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tok), "
            "btot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM big), "
            "s AS (SELECT bc.w1, bc.w2, bc.c12 AS pair_cnt, "
            "CAST(bc.c12 * (SELECT t FROM tot) * (SELECT t FROM tot) AS BIGINT) "
            "* 1.0 / CAST((SELECT b FROM btot) * u1.c * u2.c AS BIGINT) AS score "
            "FROM bc JOIN uc u1 ON u1.tok = bc.w1 "
            "JOIN uc u2 ON u2.tok = bc.w2 WHERE bc.c12 >= 5) "
            "SELECT w1, w2, pair_cnt, score FROM s "
            "ORDER BY score DESC, w1, w2 LIMIT 50"
        ),
        "length_filter_sweep": (
            # threshold × documents cross join; pass-counts and retained
            # token mass are exact int64 sums — hash-stable
            "WITH nt AS (SELECT CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(list_filter(string_split(text, ' '), x -> x <> '')) END "
            "AS nw FROM documents), "
            "t AS (SELECT unnest([10, 25, 50, 100, 200]) AS threshold) "
            "SELECT CAST(threshold AS BIGINT) AS threshold, "
            "CAST(sum(CASE WHEN nw >= threshold THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_docs_pass, "
            "CAST(sum(CASE WHEN nw >= threshold THEN nw ELSE 0 END) "
            "AS BIGINT) AS tokens_retained "
            "FROM t, nt GROUP BY 1"
        ),
        "gopher_quality_by_source": (
            # integer-form Gopher rules: mean-word-length bounds become
            # sum_len <?> bound*n_words, alpha fraction 0.8 becomes
            # 5*n_alpha < 4*n_words, stop-hit is DISTINCT presence of the
            # 10 en stop words — every flag an exact int compare, so the
            # per-source sums hash bit-equal to the engine combiner.
            "WITH d AS (SELECT source, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS toks, "
            "length(regexp_replace(text, '\\s', '', 'g')) AS sumlen "
            "FROM documents), "
            "m AS (SELECT source, len(toks) AS nw, sumlen, "
            "len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) "
            "AS n_alpha, "
            + "("
            + " + ".join(
                "CASE WHEN list_contains(list_transform(toks, "
                f"x -> lower(x)), '{w}') THEN 1 ELSE 0 END"
                for w in [
                    "a", "and", "for", "in", "is",
                    "it", "of", "that", "the", "to",
                ]
            )
            + ") AS hits FROM d), "
            "f AS (SELECT source, "
            "CASE WHEN nw = 0 OR nw < 25 OR nw > 5000 THEN 1 ELSE 0 END "
            "AS f_wc, "
            "CASE WHEN nw > 0 AND (sumlen < 4 * nw OR sumlen > 10 * nw) "
            "THEN 1 ELSE 0 END AS f_mwl, "
            "CASE WHEN nw > 0 AND 5 * n_alpha < 4 * nw THEN 1 ELSE 0 END "
            "AS f_al, "
            "CASE WHEN nw > 0 AND hits < 2 THEN 1 ELSE 0 END AS f_st "
            "FROM m) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(f_wc) AS BIGINT) AS fail_word_count, "
            "CAST(sum(f_mwl) AS BIGINT) AS fail_mean_word_len, "
            "CAST(sum(f_al) AS BIGINT) AS fail_alpha_frac, "
            "CAST(sum(f_st) AS BIGINT) AS fail_stopwords, "
            "CAST(sum(CASE WHEN f_wc + f_mwl + f_al + f_st = 0 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_pass "
            "FROM f GROUP BY 1"
        ),
        "readability_by_source": (
            # per-doc counts are exact ints; the two ratios are single IEEE
            # divisions of the int64 sums, and flesch is evaluated from the
            # ROUNDED ratios with the literal expression used by the engine
            # (206.835 - 1.015*wps - 84.6*spw) — bit-exact both sides.
            "WITH d AS (SELECT source, "
            "len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw, "
            "greatest(1, length(text) - length(replace(replace(replace("
            "text, '.', ''), '!', ''), '?', ''))) AS ns, "
            "len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS ny "
            "FROM documents), "
            "s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(nw) AS BIGINT) AS n_words, "
            "CAST(sum(ns) AS BIGINT) AS n_sentences, "
            "CAST(sum(ny) AS BIGINT) AS n_syllables "
            "FROM d WHERE nw > 0 GROUP BY 1), "
            "r AS (SELECT *, "
            "round(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE), 6) "
            "AS words_per_sentence, "
            "round(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE), 6) "
            "AS syllables_per_word FROM s) "
            "SELECT source, n_docs, n_words, n_sentences, n_syllables, "
            "words_per_sentence, syllables_per_word, "
            "round(CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE) * "
            "words_per_sentence - CAST(84.6 AS DOUBLE) * syllables_per_word, 6) "
            "AS flesch FROM r"
        ),
        "heaps_law_curve": (
            # decile boundaries are exact order statistics of doc_id
            # (rank = (N*b)//10); a doc's bucket is the smallest b whose
            # boundary id >= its own (searchsorted-left on the engine side).
            # All-integer output -> hash-exact.
            "WITH n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents), "
            "rk AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS r "
            "FROM documents), "
            "bs AS (SELECT unnest(generate_series(1, 10)) AS b), "
            "bd AS (SELECT bs.b, rk.doc_id AS bid FROM bs, rk, n "
            "WHERE rk.r = (n.nn * bs.b) // 10), "
            "db AS (SELECT d.doc_id, (SELECT min(b) FROM bd "
            "WHERE bd.bid >= d.doc_id) AS bucket FROM documents d), "
            "tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS tok FROM documents), "
            "tm AS (SELECT t.tok, min(db.bucket) AS mb FROM tok t "
            "JOIN db USING (doc_id) GROUP BY 1), "
            "vn AS (SELECT mb AS bucket, CAST(count(*) AS BIGINT) AS vnew "
            "FROM tm GROUP BY 1), "
            "oc AS (SELECT db.bucket, CAST(count(*) AS BIGINT) AS occ "
            "FROM tok JOIN db USING (doc_id) GROUP BY 1), "
            "dc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS nd "
            "FROM db GROUP BY 1) "
            "SELECT CAST(bs.b AS BIGINT) AS bucket, "
            "CAST(sum(coalesce(dc.nd, 0)) OVER w AS BIGINT) AS n_docs_cum, "
            "CAST(sum(coalesce(oc.occ, 0)) OVER w AS BIGINT) AS tokens_cum, "
            "CAST(sum(coalesce(vn.vnew, 0)) OVER w AS BIGINT) AS vocab_cum "
            "FROM bs LEFT JOIN dc ON dc.bucket = bs.b "
            "LEFT JOIN vn ON vn.bucket = bs.b "
            "LEFT JOIN oc ON oc.bucket = bs.b "
            "WINDOW w AS (ORDER BY bs.b ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW)"
        ),
        "sentence_dedup": (
            # winner = min(doc_id<<20 | pos) per md5_number_lower(segment)
            # (≡ the engine's md5_lower64 keys); structural (space-only)
            # segments never participate; clean_text = '.'-join of
            # survivors in original order — byte-identical strings.
            "WITH segs AS (SELECT doc_id, "
            "unnest(string_split(text, '.')) AS s, "
            "unnest(generate_series(1, len(string_split(text, '.')))) AS pos "
            "FROM documents), "
            "part AS (SELECT doc_id, s, pos FROM segs "
            "WHERE trim(s, ' ') <> ''), "
            "win AS (SELECT md5_number_lower(s) AS sh, "
            "min(doc_id * 1048576 + pos) AS wp FROM part GROUP BY 1), "
            "rm AS (SELECT p.doc_id, p.pos FROM part p JOIN win w "
            "ON w.sh = md5_number_lower(p.s) "
            "WHERE p.doc_id * 1048576 + p.pos <> w.wp), "
            "k AS (SELECT g.doc_id, g.s, g.pos FROM segs g LEFT JOIN rm "
            "ON rm.doc_id = g.doc_id AND rm.pos = g.pos "
            "WHERE rm.doc_id IS NULL), "
            "np_ AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_part "
            "FROM part GROUP BY 1), "
            "nr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rm "
            "FROM rm GROUP BY 1), "
            "ct AS (SELECT doc_id, coalesce(string_agg(s, '.' ORDER BY pos), "
            "'') AS clean_text FROM k GROUP BY 1) "
            "SELECT d.doc_id, ct.clean_text, "
            "CAST(coalesce(np_.n_part, 0) - coalesce(nr.n_rm, 0) AS BIGINT) "
            "AS n_kept, "
            "CAST(coalesce(nr.n_rm, 0) AS BIGINT) AS n_removed "
            "FROM documents d JOIN ct ON ct.doc_id = d.doc_id "
            "LEFT JOIN np_ ON np_.doc_id = d.doc_id "
            "LEFT JOIN nr ON nr.doc_id = d.doc_id"
        ),
        "lang_confusion": (
            # reuses the lang_id replay verbatim (single source of truth for
            # the stopword table); the crosstab itself is a pure int count.
            "SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n_docs "
            f"FROM documents d JOIN ({_lang_id_sql()}) p "
            "ON p.doc_id = d.doc_id GROUP BY 1, 2"
        ),
        "token_freq_spectrum": (
            "WITH tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM "
            "(SELECT unnest(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS tok FROM documents) GROUP BY 1), "
            "sp AS (SELECT least(c, 11) AS occur_cap, "
            "CAST(count(*) AS BIGINT) AS n_types, "
            "CAST(sum(c) AS BIGINT) AS n_occurrences FROM tf GROUP BY 1), "
            "b AS (SELECT unnest(generate_series(1, 11)) AS occur_cap) "
            "SELECT CAST(b.occur_cap AS BIGINT) AS occur_cap, "
            "CAST(coalesce(sp.n_types, 0) AS BIGINT) AS n_types, "
            "CAST(coalesce(sp.n_occurrences, 0) AS BIGINT) AS n_occurrences "
            "FROM b LEFT JOIN sp ON sp.occur_cap = b.occur_cap"
        ),
        "doclen_percentiles_by_lang": (
            # percentile = order statistic at 1-based rank max(1,(n*p)//100)
            # — explicit boundary ranks over the stored n_chars, no
            # interpolation; all-integer output.
            "WITH r AS (SELECT lang, n_chars, row_number() OVER "
            "(PARTITION BY lang ORDER BY n_chars) AS rn, "
            "count(*) OVER (PARTITION BY lang) AS n FROM documents) "
            "SELECT lang, CAST(max(n) AS BIGINT) AS n_docs, "
            + ", ".join(
                "CAST(max(CASE WHEN rn = greatest(1, (n * {p}) // 100) "
                "THEN n_chars END) AS BIGINT) AS p{p}".format(p=p)
                for p in (25, 50, 75, 90, 99)
            )
            + " FROM r GROUP BY 1"
        ),
        "events_hopping": (
            # every event lands in window/hop = 2 overlapping windows; the
            # cross join with range(2) replays the engine's replication.
            "SELECT user_id, "
            "((CAST(floor(epoch(ts)) AS BIGINT) // 300) - j) * 300 AS wstart, "
            "count(*) AS n_events, round(sum(value), 6) AS sum_value "
            "FROM events, (SELECT unnest(range(2)) AS j) r GROUP BY 1, 2"
        ),
        "knn_graph": (
            # same cosine/round/tie-break conventions as ann_topk; ranks are
            # ordered on the ROUNDED(6) cosine on BOTH sides, so the top-k
            # cut is deterministic.
            "WITH s AS (SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cos "
            "FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY vec_id "
            "ORDER BY cos DESC, nbr_id) AS rank FROM s) "
            "SELECT vec_id, nbr_id, cos, CAST(rank AS BIGINT) AS rank "
            "FROM r WHERE rank <= 5"
        ),
        "redact_pii": (
            # both regexes use only syntax with identical re/RE2 semantics
            # and both engines replace non-overlapping matches left-to-right
            # (e-mails first, so an address's host never double-counts as an
            # IP-like token) — clean_text is byte-identical.
            "SELECT doc_id, "
            "regexp_replace(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g') "
            "AS clean_text, "
            "len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails, "
            "len(regexp_extract_all(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS n_ips "
            "FROM documents"
        ),
        "curate_corpus": (
            # the full gate ladder (short → alnum → repetitive →
            # contaminated → duplicate) with FIRST-failing-gate precedence;
            # every ratio is one exact-int division vs a literal, and the
            # duplicate verdict is min-doc_id-per-md5 over survivors only.
            f"WITH {tok_cte}, "
            "cnts AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2), "
            "stats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS nd, "
            "max(c) AS topc FROM cnts GROUP BY 1), "
            "tri AS (SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS g "
            "FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 "
            "JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2), "
            "bench AS (SELECT DISTINCT g FROM tri WHERE doc_id % 37 = 0), "
            "dgr AS (SELECT DISTINCT doc_id, g FROM tri WHERE doc_id % 37 <> 0), "
            "hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ng, "
            "CAST(sum(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END) "
            "AS BIGINT) AS nh FROM dgr GROUP BY 1), "
            "base AS (SELECT d.doc_id, d.text, COALESCE(s.n, 0) AS n, s.nd, "
            "s.topc, COALESCE(h.ng, 0) AS ng, COALESCE(h.nh, 0) AS nh, "
            "length(d.text) AS len, "
            "length(regexp_replace(d.text, '[^a-zA-Z0-9]', '', 'g')) AS aln "
            "FROM documents d LEFT JOIN stats s USING (doc_id) "
            "LEFT JOIN hits h USING (doc_id)), "
            "g AS (SELECT doc_id, text, CASE "
            "WHEN n < 20 THEN 'short' "
            "WHEN len = 0 OR aln * 1.0 / len < 0.82 THEN 'alnum' "
            "WHEN (n - nd) * 1.0 / n > 0.65 OR topc * 1.0 / n > 0.25 "
            "THEN 'repetitive' "
            "WHEN doc_id % 37 <> 0 AND ng > 0 AND nh * 1.0 / ng > 0.5 "
            "THEN 'contaminated' "
            "ELSE 'pass' END AS reason FROM base), "
            "k AS (SELECT doc_id, CASE WHEN doc_id = min(doc_id) OVER "
            "(PARTITION BY md5(text)) THEN 'ok' ELSE 'duplicate' END AS r2 "
            "FROM g WHERE reason = 'pass') "
            "SELECT g.doc_id, COALESCE(k.r2, g.reason) = 'ok' AS keep, "
            "COALESCE(k.r2, g.reason) AS reason "
            "FROM g LEFT JOIN k USING (doc_id)"
        ),
        "hyperball_copurchase": (
            # registers are BIT-exact: both multiplicative hashes stay on
            # the 2^31 ring (all intermediates < 2^63 → BIGINT replays the
            # engine's int64 math) and rho = 32 - bit_length(w) is 31 pure
            # integer comparisons — no float log on either side. The ball
            # at radius 2 is the unrolled dist<=2 closure; register j of v
            # = max rho over ball members hashing to j.
            "WITH e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "WHERE a.l_partkey <> b.l_partkey GROUP BY 1, 2), "
            "v AS (SELECT DISTINCT src AS vid FROM e), "
            "hh AS (SELECT vid, ((vid * 2654435761) % 2147483648) % 256 AS idx, "
            "(vid * 2246822519 + 1) % 2147483648 AS w FROM v), "
            "rr AS (SELECT vid, idx, 32 - ("
            + " + ".join(
                f"CASE WHEN w >= {1 << k} THEN 1 ELSE 0 END" for k in range(31)
            )
            + ") AS rho FROM hh), "
            "ball AS (SELECT vid, vid AS member FROM v "
            "UNION SELECT src, dst FROM e "
            "UNION SELECT a.src, b.dst FROM e a JOIN e b ON b.src = a.dst), "
            "regs AS (SELECT ball.vid, r.idx, max(r.rho) AS reg "
            "FROM ball JOIN rr r ON r.vid = ball.member GROUP BY 1, 2) "
            "SELECT v.vid, CAST(COALESCE(sum(regs.reg), 0) AS BIGINT) AS reg_sum, "
            "CAST(256 - count(regs.idx) AS BIGINT) AS reg_zeros "
            "FROM v LEFT JOIN regs ON regs.vid = v.vid GROUP BY 1"
        ),
        "chunk_documents": (
            # string_agg(tok, ' ' ORDER BY pos) rebuilds the engine's
            # ' '.join byte-identically (tokens contain no spaces).
            f"WITH {tok_cte} "
            "SELECT doc_id, CAST((pos - 1) // 20 AS BIGINT) AS chunk_id, "
            "CAST(count(*) AS BIGINT) AS n_tokens, "
            "string_agg(tok, ' ' ORDER BY pos) AS chunk_text "
            "FROM tok GROUP BY 1, 2"
        ),
        "pack_sequences": (
            # exclusive prefix sum over token counts in doc_id order —
            # exactly the engine's sort_with_prefix_sum; // and % replay
            # the int64 arithmetic (all values non-negative).
            f"WITH lens AS (SELECT doc_id, CAST(len({sp_toks}) AS BIGINT) "
            "AS n FROM documents), "
            "p AS (SELECT doc_id, n, COALESCE(sum(n) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix "
            "FROM lens) "
            "SELECT doc_id, n AS n_tokens, CAST(prefix // 512 AS BIGINT) AS seq_id, "
            "CAST(prefix % 512 AS BIGINT) AS seq_offset FROM p"
        ),
        "events_sorted": (
            "SELECT event_id, value, CAST(row_number() OVER "
            "(ORDER BY value DESC, event_id ASC) - 1 AS BIGINT) AS ordinal "
            "FROM events"
        ),
        "lang_id": _lang_id_sql(),
        "lang_by_source": (
            # crosstab over the SAME lang_id CTE, joined back to source
            f"WITH lp AS MATERIALIZED (FROM ({_lang_id_sql()})) "
            "SELECT d.source, lp.lang_pred, count(*) AS n_docs "
            "FROM documents d JOIN lp ON lp.doc_id = d.doc_id GROUP BY 1, 2"
        ),
        "documents_sample": (
            # Knuth multiplicative hash on a 2^31 ring: pure BIGINT
            # arithmetic on both sides; thresholds are the engine's
            # int(rate * 2^31) written as literals (0.25 -> 536870912)
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE ((((doc_id % 2147483648) + 2147483648) % 2147483648) "
            "* 2654435761) % 2147483648 < "
            "CASE WHEN lang = 'en' THEN 536870912 ELSE 2147483648 END"
        ),
        "events_rolling": (
            "SELECT event_id, round(avg(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS rolling_avg "
            "FROM events"
        ),
        "session_conversion": (
            # the sessionize CTE + purchase flag per session, folded per
            # UTC start day; rate is one int/int division
            "WITH x AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL OR "
            f"epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_SEC} * 1000000 "
            "THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM x), "
            "s AS (SELECT user_id, sess, "
            "epoch_us(min(ts)) // 86400000000 AS day, "
            "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv "
            "FROM y GROUP BY 1, 2) "
            "SELECT day, CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(sum(conv) AS BIGINT) AS n_converted, "
            "round(sum(conv) * 1.0 / count(*), 6) AS rate FROM s GROUP BY 1"
        ),
        "user_type_entropy": (
            # H = ln n − (Σ c·ln c)/n from exact integer counts; ln-noise
            # ≪ round-6 (doc_cross_entropy posture)
            "WITH ct AS (SELECT user_id, event_type, count(*) AS c "
            "FROM events GROUP BY 1, 2) "
            "SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events, "
            "CAST(count(*) AS BIGINT) AS n_types, "
            "round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c), 6) "
            "AS entropy FROM ct GROUP BY 1"
        ),
        "user_gap_cv": (
            # whole-second gaps: exact int moments; cv = √(n·SS−S²)/S —
            # one sqrt + one divide, mirrored verbatim
            "WITH g AS (SELECT user_id, (epoch_us(ts) - "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id)) // 1000000 AS gap FROM events), "
            "m AS (SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps, "
            "CAST(sum(gap) AS BIGINT) AS s, "
            "CAST(sum(gap * gap) AS BIGINT) AS ss FROM g GROUP BY 1) "
            "SELECT user_id, n_gaps, "
            "round(CASE WHEN n_gaps > 0 THEN s / CAST(n_gaps AS DOUBLE) "
            "ELSE 0 END, 6) AS mean_gap_s, "
            "round(CASE WHEN n_gaps >= 5 AND s > 0 THEN "
            "sqrt(CAST(n_gaps * ss - s * s AS DOUBLE)) / s ELSE 0 END, 6) "
            "AS cv FROM m"
        ),
        "events_zscore": (
            # exact int64 cents moments over the trailing window; the
            # z algebra collapses to int numerator / sqrt(int) — bit-exact
            "WITH b AS (SELECT event_id, user_id, ts, "
            "CAST(round(value * 100) AS BIGINT) AS c FROM events), "
            "w AS (SELECT event_id, c, "
            "count(*) OVER win AS np, sum(c) OVER win AS s, "
            "sum(c * c) OVER win AS ss FROM b WINDOW win AS ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)) "
            "SELECT event_id, CAST(coalesce(np, 0) AS BIGINT) AS n_prev, "
            "round(CASE WHEN coalesce(np, 0) >= 5 AND np * ss - s * s > 0 "
            "THEN (np * c - s) / sqrt(np * ss - s * s) ELSE 0 END, 6) "
            "AS zscore FROM w"
        ),
        "copurchase_weights": (
            "SELECT a.l_partkey AS src, b.l_partkey AS dst, "
            "count(DISTINCT a.l_orderkey) AS n_orders "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2"
        ),
        "train_val_test_split": (
            # salted Knuth bucket: independent of documents_sample's hash;
            # pure BIGINT, non-negative ring → SQL % == numpy %
            "SELECT doc_id, lang, CASE WHEN b < 80 THEN 'train' "
            "WHEN b < 90 THEN 'val' ELSE 'test' END AS split FROM ("
            "SELECT doc_id, lang, (((((doc_id % 2147483648) + 2147483648) "
            "% 2147483648) * 2654435761 + 40503) % 2147483648) % 100 AS b "
            "FROM documents)"
        ),
        "distinct_users_daily": (
            "SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1, 2"
        ),
        "parts_never_ordered": (
            "SELECT p_partkey FROM part p WHERE NOT EXISTS ("
            "SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey "
            "AND l.l_quantity >= 45)"
        ),
        "topk_parts_per_nation": (
            # same exact-integer revenue as revenue_by_nation; rnk via
            # row_number with the engine's (rev desc, partkey asc) tie-break
            "WITH r AS (SELECT s_nationkey AS nation, l_partkey AS partkey, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev "
            "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey GROUP BY 1, 2), "
            "t AS (SELECT nation, partkey, rev, row_number() OVER "
            "(PARTITION BY nation ORDER BY rev DESC, partkey) AS rn FROM r) "
            "SELECT CAST(nation AS BIGINT) AS nation, partkey, "
            "rev / 10000.0 AS revenue, CAST(rn AS BIGINT) AS rnk FROM t WHERE rn <= 5"
        ),
        "revenue_by_nation": (
            # revenue summed as exact integers (prices/discounts carry two
            # decimals) so the result is summation-order-independent —
            # matches the engine's int64 partial sums bit-exactly
            "SELECT n_name, sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey GROUP BY 1"
        ),
        "duplicate_ngram_fraction": (
            # distinct word-5-gram md5s per doc vs corpus-wide doc counts;
            # same md5_number_lower hashing as the engine, one int/int
            # division + round
            "WITH base AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS toks "
            "FROM documents), "
            "g AS (SELECT doc_id, md5_number_lower(array_to_string("
            "list_slice(toks, i, i + 4), ' ')) AS h "
            "FROM (SELECT doc_id, toks, "
            "unnest(generate_series(1, len(toks) - 4)) AS i "
            "FROM base WHERE len(toks) >= 5)), "
            "dg AS (SELECT DISTINCT doc_id, h FROM g), "
            "c AS (SELECT h, count(*) AS nd FROM dg GROUP BY 1) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
            "CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup, "
            "round(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) "
            "AS dup_frac FROM dg JOIN c USING (h) GROUP BY 1"
        ),
        "product_type_profit": (
            # Q9-shaped (profit = revenue; no partsupp in this schema),
            # exact-int-cents fold, year from o_orderdate
            "SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS sum_profit "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN orders ON o_orderkey = l_orderkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "WHERE p_name LIKE '%red%' GROUP BY 1, 2"
        ),
        "succ_triad_motifs": (
            # Milo-style directed triangle census on the qty≤25 successor
            # graph: cycles via the 3-rotation join (//3), transitive
            # triples by role (middle = e1.dst)
            "WITH seq AS (SELECT l_orderkey, l_linenumber, l_partkey, "
            "lag(l_partkey) OVER (PARTITION BY l_orderkey "
            "ORDER BY l_linenumber, l_partkey) AS prev FROM lineitem "
            "WHERE l_quantity <= 25), "
            "e AS (SELECT DISTINCT prev AS src, l_partkey AS dst FROM seq "
            "WHERE prev IS NOT NULL AND prev <> l_partkey) "
            "SELECT (SELECT count(*) // 3 FROM e e1 "
            "JOIN e e2 ON e2.src = e1.dst "
            "JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src) AS n_cyclic, "
            "(SELECT count(*) FROM e e1 JOIN e e2 ON e2.src = e1.dst "
            "JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst "
            "WHERE e2.dst <> e1.src) AS n_transitive"
        ),
        "important_parts_value": (
            # Q11-shaped: scalar-subquery threshold at 1.5× the average
            # per-part value; exact-int cents, /100.0 mirrored
            "WITH v AS (SELECT l_partkey AS p_partkey, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS c "
            "FROM lineitem GROUP BY 1) "
            "SELECT p_partkey, c / 100.0 AS value FROM v "
            "WHERE c * 1.0 > 1.5 * ((SELECT sum(c) FROM v) * 1.0 / "
            "(SELECT count(*) FROM v))"
        ),
        "bulk_suppliers": (
            # Q20-shaped: nested IN with per-(supplier, part) HAVING over
            # the lineitem bridge; integer quantities
            "WITH sp AS (SELECT l_suppkey, l_partkey, "
            "sum(CAST(round(l_quantity) AS BIGINT)) AS q FROM lineitem "
            "WHERE l_partkey IN "
            "(SELECT p_partkey FROM part WHERE p_name LIKE '%ol%') "
            "GROUP BY 1, 2 HAVING q > 80) "
            "SELECT s_suppkey, s_name, "
            "CAST(count(*) AS BIGINT) AS n_bulk_parts "
            "FROM sp JOIN supplier ON s_suppkey = l_suppkey GROUP BY 1, 2"
        ),
        "events_holt": (
            # Holt level+trend via a recursive CTE carrying both columns;
            # the engine replays identical op order per position
            "WITH RECURSIVE b AS (SELECT event_id, user_id, value, "
            "CAST(row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS BIGINT) - 1 AS pos FROM events), "
            "r AS (SELECT event_id, user_id, pos, value AS l, "
            "CAST(0.0 AS DOUBLE) AS t FROM b WHERE pos = 0 "
            "UNION ALL SELECT b.event_id, b.user_id, b.pos, "
            "0.25 * b.value + 0.75 * (r.l + r.t), "
            "0.125 * ((0.25 * b.value + 0.75 * (r.l + r.t)) - r.l) + 0.875 * r.t "
            "FROM b JOIN r ON r.user_id = b.user_id AND b.pos = r.pos + 1) "
            "SELECT event_id, round(l, 6) AS level, round(t, 6) AS trend FROM r"
        ),
        "events_cusum": (
            # Page CUSUM via recursive CTE; the engine replays the same
            # greatest(0, s + (x − k)) per position (recurrence parity);
            # alarm compares the UNROUNDED statistic on both sides
            "WITH RECURSIVE b AS (SELECT event_id, user_id, value, "
            "CAST(row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS BIGINT) - 1 AS pos FROM events), "
            "r AS (SELECT event_id, user_id, pos, "
            "greatest(0, value - 60.0) AS s FROM b WHERE pos = 0 "
            "UNION ALL SELECT b.event_id, b.user_id, b.pos, "
            "greatest(0, r.s + (b.value - 60.0)) FROM b "
            "JOIN r ON r.user_id = b.user_id AND b.pos = r.pos + 1) "
            "SELECT event_id, round(s, 6) AS cusum, s > 200.0 AS alarm FROM r"
        ),
        "scc_size_histogram": (
            # histogram over the scc_parts closure (same reachability CTE)
            "WITH seq AS (SELECT l_orderkey, l_linenumber, l_partkey, "
            "lag(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) "
            "AS prev FROM lineitem WHERE l_quantity <= 8), "
            "edges AS (SELECT DISTINCT prev AS src, l_partkey AS dst FROM seq "
            "WHERE prev IS NOT NULL AND prev <> l_partkey), "
            "verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges), "
            "reach AS (WITH RECURSIVE r(u, v) AS ("
            "SELECT v, v FROM verts "
            "UNION "
            "SELECT r.u, e.dst FROM r JOIN edges e ON r.v = e.src) "
            "SELECT u, v FROM r), "
            "comp AS (SELECT a.u AS vid, MIN(a.v) AS scc FROM reach a "
            "JOIN reach b ON a.u = b.v AND a.v = b.u GROUP BY a.u), "
            "sz AS (SELECT scc, CAST(count(*) AS BIGINT) m FROM comp "
            "GROUP BY 1) "
            "SELECT m AS n_members, CAST(count(*) AS BIGINT) AS n_components "
            "FROM sz GROUP BY 1"
        ),
        "wcc_parts": _wcc_succ_sql(),
        "weekly_stickiness": (
            "WITH a AS (SELECT (epoch_us(ts) // 86400000000) // 7 AS wk, "
            "(epoch_us(ts) // 86400000000) % 7 AS dow, user_id FROM events), "
            "dd AS (SELECT DISTINCT wk, dow, user_id FROM a), "
            "per AS (SELECT CAST(wk AS BIGINT) AS \"week\", "
            "CAST(count(DISTINCT dow) AS BIGINT) n_days_active, "
            "CAST(count(*) AS BIGINT) sum_dau, "
            "CAST(count(DISTINCT user_id) AS BIGINT) wau FROM dd GROUP BY 1) "
            "SELECT \"week\", n_days_active, sum_dau, wau, "
            "round(CAST(sum_dau AS DOUBLE) / "
            "CAST(n_days_active * wau AS DOUBLE), 6) AS stickiness FROM per"
        ),
        "gram_entropy": (
            "WITH base AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS toks "
            "FROM documents), "
            "g AS (SELECT "
            "md5_number_lower(array_to_string(list_slice(toks, i, i + 2), ' ')) AS h "
            "FROM (SELECT doc_id, toks, "
            "unnest(generate_series(1, len(toks) - 2)) AS i "
            "FROM base WHERE len(toks) >= 3)), "
            "tf AS (SELECT h, CAST(count(*) AS BIGINT) c FROM g GROUP BY 1) "
            "SELECT CAST(sum(c) AS BIGINT) AS n_total, "
            "CAST(count(*) AS BIGINT) AS n_distinct, "
            "round(ln(CAST(sum(c) AS DOUBLE)) - "
            "sum(c * ln(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE), 6) "
            "AS entropy FROM tf"
        ),
        "lexical_diversity": (
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(count(DISTINCT tok) AS BIGINT) AS n_types, "
            "round(CAST(count(DISTINCT tok) AS DOUBLE) / count(*), 6) AS ttr, "
            "round(CAST(sum(length(tok)) AS DOUBLE) / count(*), 6) "
            "AS avg_token_len "
            "FROM (SELECT doc_id, "
            "unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok "
            "FROM documents) GROUP BY doc_id"
        ),
        "hapax_stats": (
            "WITH tf AS (SELECT tok, CAST(count(*) AS BIGINT) c FROM "
            "(SELECT unnest(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS tok FROM documents) GROUP BY 1) "
            "SELECT CAST(sum(c) AS BIGINT) AS n_tokens_total, "
            "CAST(count(*) AS BIGINT) AS n_vocab, "
            "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_hapax, "
            "round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ count(*), 6) AS hapax_fraction, "
            "round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ sum(c), 6) AS hapax_token_share FROM tf"
        ),
        "attack_tolerance_parts": _attack_sql(),
        "markov_stationary": _markov_sql(),
        "markov_entropy_rate": _markov_entropy_sql(),
        "lineitem_corr_profile": (
            # quantized-int moments in HUGEINT, cast-then-operate r
            "WITH q AS MATERIALIZED (SELECT CAST(round(l_quantity) AS BIGINT) AS qv, CAST(round(l_extendedprice * 100) AS BIGINT) AS pv, CAST(round(l_discount * 100) AS BIGINT) AS dv, CAST(round(l_tax * 100) AS BIGINT) AS tv FROM lineitem) "
            "SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r FROM (SELECT count(*) AS n, sum(CAST(qv AS HUGEINT)) AS sx, sum(CAST(pv AS HUGEINT)) AS sy, sum(CAST(qv AS HUGEINT) * pv) AS sxy, sum(CAST(qv AS HUGEINT) * qv) AS sxx, sum(CAST(pv AS HUGEINT) * pv) AS syy FROM q) t UNION ALL SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b, round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r FROM (SELECT count(*) AS n, sum(CAST(qv AS HUGEINT)) AS sx, sum(CAST(dv AS HUGEINT)) AS sy, sum(CAST(qv AS HUGEINT) * dv) AS sxy, sum(CAST(qv AS HUGEINT) * qv) AS sxx, sum(CAST(dv AS HUGEINT) * dv) AS syy FROM q) t UNION ALL SELECT 'l_quantity' AS col_a, 'l_tax' AS col_b, round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r FROM (SELECT count(*) AS n, sum(CAST(qv AS HUGEINT)) AS sx, sum(CAST(tv AS HUGEINT)) AS sy, sum(CAST(qv AS HUGEINT) * tv) AS sxy, sum(CAST(qv AS HUGEINT) * qv) AS sxx, sum(CAST(tv AS HUGEINT) * tv) AS syy FROM q) t UNION ALL SELECT 'l_extendedprice' AS col_a, 'l_discount' AS col_b, round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r FROM (SELECT count(*) AS n, sum(CAST(pv AS HUGEINT)) AS sx, sum(CAST(dv AS HUGEINT)) AS sy, sum(CAST(pv AS HUGEINT) * dv) AS sxy, sum(CAST(pv AS HUGEINT) * pv) AS sxx, sum(CAST(dv AS HUGEINT) * dv) AS syy FROM q) t UNION ALL SELECT 'l_extendedprice' AS col_a, 'l_tax' AS col_b, round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r FROM (SELECT count(*) AS n, sum(CAST(pv AS HUGEINT)) AS sx, sum(CAST(tv AS HUGEINT)) AS sy, sum(CAST(pv AS HUGEINT) * tv) AS sxy, sum(CAST(pv AS HUGEINT) * pv) AS sxx, sum(CAST(tv AS HUGEINT) * tv) AS syy FROM q) t UNION ALL SELECT 'l_discount' AS col_a, 'l_tax' AS col_b, round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r FROM (SELECT count(*) AS n, sum(CAST(dv AS HUGEINT)) AS sx, sum(CAST(tv AS HUGEINT)) AS sy, sum(CAST(dv AS HUGEINT) * tv) AS sxy, sum(CAST(dv AS HUGEINT) * dv) AS sxx, sum(CAST(tv AS HUGEINT) * tv) AS syy FROM q) t"
        ),
        "basket_size_histogram": (
            "WITH po AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS b "
            "FROM lineitem GROUP BY 1) "
            "SELECT b AS basket_size, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM po GROUP BY 1"
        ),
        "returns_rate_by_brand": (
            "SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_returned, "
            "round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
            "AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS return_rate "
            "FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY 1"
        ),
        "degree_quantiles": _degree_quantiles_sql(),
        "events_acf": _acf_sql(),
        "cohort_ltv": (
            "WITH e AS (SELECT user_id, "
            "(epoch_us(ts) // 86400000000) // 7 wk, event_type, "
            "CAST(round(value * 100) AS BIGINT) cents FROM events), "
            "ch AS (SELECT user_id, min(wk) cw FROM e GROUP BY 1), "
            "nu AS (SELECT cw, CAST(count(*) AS BIGINT) n FROM ch "
            "GROUP BY 1), "
            "p AS (SELECT ch.cw, e.wk - ch.cw ow, "
            "CAST(sum(e.cents) AS BIGINT) c FROM e "
            "JOIN ch USING (user_id) WHERE e.event_type = 'purchase' "
            "GROUP BY 1, 2), "
            "cum AS (SELECT cw, ow, CAST(sum(c) OVER (PARTITION BY cw "
            "ORDER BY ow ROWS UNBOUNDED PRECEDING) AS BIGINT) cc FROM p) "
            "SELECT CAST(cw AS BIGINT) AS cohort_week, "
            "CAST(ow AS BIGINT) AS offset_weeks, nu.n AS n_users, "
            "cc AS cum_cents, "
            "round(CAST(cc AS DOUBLE) / CAST(nu.n AS DOUBLE), 6) "
            "AS ltv_per_user FROM cum JOIN nu USING (cw)"
        ),
        "customer_order_gaps": (
            # uniform two-rank median: (v[(m+1)//2] + v[m//2+1]) / 2.0 —
            # odd m picks the same rank twice, (v+v)/2.0 ≡ v in IEEE
            "WITH o AS (SELECT o_custkey c, "
            "epoch_us(o_orderdate) // 86400000000 dy FROM orders), "
            "g AS (SELECT c, dy - lag(dy) OVER "
            "(PARTITION BY c ORDER BY dy) gp FROM o), "
            "g2 AS (SELECT c, gp, row_number() OVER "
            "(PARTITION BY c ORDER BY gp) rn FROM g WHERE gp IS NOT NULL), "
            "cnt AS (SELECT c, CAST(count(*) AS BIGINT) m FROM g2 "
            "GROUP BY 1), "
            "sel AS (SELECT g2.c, "
            "sum(CASE WHEN rn = (m + 1) // 2 THEN CAST(gp AS DOUBLE) "
            "ELSE 0 END) a, "
            "sum(CASE WHEN rn = m // 2 + 1 THEN CAST(gp AS DOUBLE) "
            "ELSE 0 END) b2 "
            "FROM g2 JOIN cnt ON cnt.c = g2.c GROUP BY 1) "
            "SELECT sel.c AS o_custkey, cnt.m + 1 AS n_orders, "
            "round((sel.a + sel.b2) / 2.0, 6) AS median_gap "
            "FROM sel JOIN cnt ON cnt.c = sel.c"
        ),
        "survival_km": (
            # product-limit estimator; the running product is an exp of a
            # window-ORDERED ln sum, so the op order is pinned on both sides
            "WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 dy, "
            "event_type FROM events), "
            "mx AS (SELECT max(dy) m FROM d), "
            "su AS (SELECT user_id, min(dy) sd FROM d "
            "WHERE event_type = 'signup' GROUP BY 1), "
            "pu AS (SELECT d.user_id, min(dy) pd FROM d "
            "JOIN su ON su.user_id = d.user_id "
            "WHERE d.event_type = 'purchase' AND d.dy >= su.sd GROUP BY 1), "
            "ue AS (SELECT su.user_id, CASE WHEN pu.pd IS NOT NULL "
            "THEN pu.pd - su.sd ELSE (SELECT m FROM mx) - su.sd END t, "
            "CASE WHEN pu.pd IS NOT NULL THEN 1 ELSE 0 END ev "
            "FROM su LEFT JOIN pu ON pu.user_id = su.user_id), "
            "g AS (SELECT t, CAST(sum(ev) AS BIGINT) d_ev, "
            "CAST(count(*) AS BIGINT) n_at FROM ue GROUP BY 1), "
            "r AS (SELECT t, d_ev, CAST(sum(n_at) OVER (ORDER BY t DESC "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) n_risk FROM g), "
            "k AS (SELECT t, n_risk, d_ev, exp(sum(CASE WHEN n_risk = d_ev "
            "THEN -1000000000.0 ELSE ln(CAST(n_risk - d_ev AS DOUBLE) / "
            "CAST(n_risk AS DOUBLE)) END) OVER (ORDER BY t "
            "ROWS UNBOUNDED PRECEDING)) s FROM r) "
            "SELECT CAST(t AS BIGINT) AS t_days, n_risk, d_ev AS n_events, "
            "round(s, 6) AS survival FROM k"
        ),
        "order_value_trimmed_mean": (
            # window-rank replay of the (cents, orderkey) total order;
            # the trim count is integer n//10; mean is ONE division
            "WITH c AS (SELECT o_orderkey AS k, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders), "
            "r AS (SELECT c, row_number() OVER (ORDER BY c, k) - 1 AS i "
            "FROM c), "
            "n AS (SELECT count(*) AS n, count(*) // 10 AS lo FROM c), "
            "kept AS (SELECT r.c FROM r, n WHERE r.i >= n.lo "
            "AND r.i < n.n - n.lo) "
            "SELECT n.n AS n_orders, n.lo AS n_trim, "
            "CAST(count(*) AS BIGINT) AS n_kept, "
            "CAST(sum(kept.c) AS BIGINT) AS sum_cents, "
            "round(sum(kept.c) * 1.0 / count(*), 6) AS trimmed_mean_cents "
            "FROM kept, n GROUP BY n.n, n.lo"
        ),
        "order_value_gini": (
            "WITH r AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) c, "
            "CAST(row_number() OVER (ORDER BY "
            "CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey) "
            "AS BIGINT) i FROM orders) "
            "SELECT CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(c) AS BIGINT) AS sum_cents, "
            "round((2.0 * CAST(sum(CAST(i AS HUGEINT) * c) AS DOUBLE)) / "
            "(CAST(count(*) AS DOUBLE) * CAST(sum(c) AS DOUBLE)) - "
            "CAST(count(*) + 1 AS DOUBLE) * 1.0 / "
            "CAST(count(*) AS DOUBLE), 6) AS gini FROM r"
        ),
        "user_hour_entropy": (
            "WITH h AS (SELECT user_id, "
            "(epoch_us(ts) // 3600000000) % 24 hr, "
            "CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2) "
            "SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events, "
            "round(ln(CAST(sum(c) AS DOUBLE)) - "
            "sum(c * ln(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE), 6) "
            "AS hour_entropy FROM h GROUP BY 1"
        ),
        "revenue_trend_theilsen": (
            # explicit order-statistic median (mid-pair (a+b)/2.0 for even
            # counts) so the engine's op order is mirrored, not an opaque
            # median() builtin
            "WITH d AS (SELECT epoch_us(l_shipdate) // 86400000000 dy, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) c "
            "FROM lineitem GROUP BY 1), "
            "p AS (SELECT CAST(b.c - a.c AS DOUBLE) / "
            "CAST(b.dy - a.dy AS DOUBLE) s FROM d a JOIN d b ON b.dy > a.dy), "
            "p2 AS MATERIALIZED (SELECT s, row_number() OVER (ORDER BY s) rn "
            "FROM p), "
            "pm AS (SELECT CAST(count(*) AS BIGINT) m FROM p), "
            "sl AS (SELECT CASE WHEN (SELECT m FROM pm) % 2 = 1 "
            "THEN (SELECT s FROM p2 WHERE rn = (SELECT (m + 1) // 2 FROM pm)) "
            "ELSE ((SELECT s FROM p2 WHERE rn = (SELECT m // 2 FROM pm)) + "
            "(SELECT s FROM p2 WHERE rn = (SELECT m // 2 + 1 FROM pm))) / 2.0 "
            "END AS mval), "
            "r AS (SELECT CAST(c AS DOUBLE) - "
            "(SELECT mval FROM sl) * CAST(dy AS DOUBLE) v FROM d), "
            "r2 AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY v) rn "
            "FROM r), "
            "rm AS (SELECT CAST(count(*) AS BIGINT) m FROM r), "
            "ic AS (SELECT CASE WHEN (SELECT m FROM rm) % 2 = 1 "
            "THEN (SELECT v FROM r2 WHERE rn = (SELECT (m + 1) // 2 FROM rm)) "
            "ELSE ((SELECT v FROM r2 WHERE rn = (SELECT m // 2 FROM rm)) + "
            "(SELECT v FROM r2 WHERE rn = (SELECT m // 2 + 1 FROM rm))) / 2.0 "
            "END AS mval) "
            "SELECT (SELECT m FROM rm) AS n_days, (SELECT m FROM pm) "
            "AS n_pairs, round((SELECT mval FROM sl), 6) AS slope, "
            "round((SELECT mval FROM ic), 6) AS intercept"
        ),
        "bounce_rate_daily": (
            "WITH x AS (SELECT user_id, ts, event_id, "
            "CASE WHEN lag(ts) OVER w IS NULL OR "
            f"epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_SEC} * 1000000 "
            "THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "y AS (SELECT *, sum(brk) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sess FROM x), "
            "s AS (SELECT user_id, sess, epoch_us(min(ts)) st, "
            "count(*) ne FROM y GROUP BY 1, 2), "
            "d AS (SELECT st // 86400000000 dy, "
            "CAST(count(*) AS BIGINT) ns, "
            "CAST(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS BIGINT) nb "
            "FROM s GROUP BY 1) "
            "SELECT CAST(dy AS BIGINT) AS \"day\", ns AS n_sessions, "
            "nb AS n_bounces, "
            "round(CAST(nb AS DOUBLE) / CAST(ns AS DOUBLE), 6) "
            "AS bounce_rate FROM d"
        ),
        "ltm_cascade_copurchase": _ltm_sql(),
        "rrf_fusion": (
            # shared token CTEs of the bm25_topk and search_topk oracles,
            # both ranked exactly as there, fused by 1/(60+rank)
            "WITH toks AS MATERIALIZED (SELECT doc_id, "
            "unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) "
            "AS term FROM documents), "
            "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1), "
            "stats AS (SELECT count(*) AS n, sum(dl) AS s FROM dl), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
            f"WHERE term IN {SEARCH_TERMS!r} GROUP BY 1, 2), "
            "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), "
            "nn AS (SELECT count(*) AS n FROM documents), "
            "bsc AS (SELECT tf.doc_id, "
            "sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * "
            "(tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * "
            "(dl.dl / (stats.s * 1.0 / stats.n))))) AS sc "
            "FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats "
            "GROUP BY tf.doc_id), "
            "btop AS (SELECT doc_id, rank FROM (SELECT doc_id, "
            "row_number() OVER (ORDER BY round(sc, 6) DESC, doc_id) AS rank "
            "FROM bsc) WHERE rank <= 10), "
            "ssal AS (SELECT tf.doc_id, "
            "(CAST(tf.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE)) / "
            "(CAST(df.df AS DOUBLE) / CAST(nn.n AS DOUBLE)) AS sal "
            "FROM tf JOIN dl USING (doc_id) JOIN df USING (term) "
            "CROSS JOIN nn), "
            "sagg AS (SELECT doc_id, count(*) AS nm, max(sal) AS ms "
            "FROM ssal GROUP BY 1), "
            "stop AS (SELECT doc_id, rank FROM (SELECT doc_id, "
            "row_number() OVER (ORDER BY nm DESC, ms DESC, doc_id) AS rank "
            "FROM sagg) WHERE rank <= 10), "
            "u AS (SELECT COALESCE(b.doc_id, s.doc_id) AS doc_id, "
            "b.rank AS brank, s.rank AS srank FROM btop b "
            "FULL OUTER JOIN stop s ON s.doc_id = b.doc_id) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(COALESCE(brank, -1) AS BIGINT) AS bm25_rank, "
            "CAST(COALESCE(srank, -1) AS BIGINT) AS search_rank, "
            "round(COALESCE(1.0 / (60 + brank), 0.0) + "
            "COALESCE(1.0 / (60 + srank), 0.0), 6) AS rrf FROM u"
        ),
        "weekly_churn": (
            "WITH a AS (SELECT DISTINCT user_id u, "
            "(epoch_us(ts) // 86400000000) // 7 w FROM events), "
            "j AS (SELECT a.w, a.u, "
            "CASE WHEN b.u IS NULL THEN 1 ELSE 0 END ch "
            "FROM a LEFT JOIN a b ON b.u = a.u AND b.w = a.w + 1), "
            "agg AS (SELECT w, CAST(count(*) AS BIGINT) n_active, "
            "CAST(sum(ch) AS BIGINT) n_churned FROM j GROUP BY 1) "
            "SELECT CAST(w AS BIGINT) AS week, n_active, n_churned, "
            "round(CAST(n_churned AS DOUBLE) / CAST(n_active AS DOUBLE), 6) "
            "AS churn_rate FROM agg WHERE w < (SELECT max(w) FROM a)"
        ),
        "user_acquisition_curve": (
            "WITH f AS (SELECT user_id, "
            "min(epoch_us(ts) // 86400000000) AS dy FROM events GROUP BY 1), "
            "d AS (SELECT dy, CAST(count(*) AS BIGINT) n FROM f GROUP BY 1) "
            "SELECT CAST(dy AS BIGINT) AS \"day\", n AS n_new_users, "
            "CAST(sum(n) OVER (ORDER BY dy "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS cum_users FROM d"
        ),
        "dow_revenue_anomaly": (
            # weekday-conditioned sample z; exact HUGEINT moments, the
            # engine's (n·x−S)/√(varn·n/(n−1)) op order, round-then-compare
            "WITH d AS (SELECT epoch_us(l_shipdate) // 86400000000 dy, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) c "
            "FROM lineitem GROUP BY 1), "
            "g AS (SELECT dy % 7 w, CAST(count(*) AS BIGINT) n, "
            "CAST(sum(c) AS HUGEINT) s, "
            "CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) ss "
            "FROM d GROUP BY 1), "
            "z AS (SELECT dy, c, "
            "round(CAST(CAST(g.n AS HUGEINT) * d.c - g.s AS DOUBLE) / "
            "sqrt(CAST(CAST(g.n AS HUGEINT) * g.ss - g.s * g.s AS DOUBLE) * "
            "CAST(g.n AS DOUBLE) / CAST(g.n - 1 AS DOUBLE)), 6) AS z "
            "FROM d JOIN g ON g.w = d.dy % 7 WHERE g.n >= 2) "
            "SELECT CAST(dy AS BIGINT) AS \"day\", c AS rev_cents, z "
            "FROM z WHERE abs(z) > 2.0"
        ),
        "lang_log_odds": (
            # Monroe log-odds, flat prior a_w=1 a0=|V|; round-then-rank
            "WITH tok AS (SELECT lang, "
            "unnest(list_filter(string_split(text, ' '), x -> x <> '')) t "
            "FROM documents), "
            "c AS (SELECT lang, t, CAST(count(*) AS BIGINT) y "
            "FROM tok GROUP BY 1, 2), "
            "w AS (SELECT t, CAST(sum(y) AS BIGINT) yw FROM c GROUP BY 1), "
            "nl AS (SELECT lang, CAST(sum(y) AS BIGINT) n FROM c GROUP BY 1), "
            "tot AS (SELECT CAST(sum(y) AS BIGINT) nn, "
            "(SELECT CAST(count(*) AS BIGINT) FROM w) vv FROM c), "
            "z AS (SELECT c.lang, c.t, c.y, "
            "round((ln(CAST(c.y + 1 AS DOUBLE) / "
            "CAST(nl.n + tot.vv - c.y - 1 AS DOUBLE)) - "
            "ln(CAST(w.yw - c.y + 1 AS DOUBLE) / "
            "CAST((tot.nn - nl.n) + tot.vv - (w.yw - c.y) - 1 AS DOUBLE))) / "
            "sqrt(1.0 / CAST(c.y + 1 AS DOUBLE) + "
            "1.0 / CAST(w.yw - c.y + 1 AS DOUBLE)), 6) AS z "
            "FROM c JOIN w ON w.t = c.t JOIN nl ON nl.lang = c.lang "
            "CROSS JOIN tot), "
            "r AS (SELECT lang, t AS token, y, z, row_number() OVER "
            "(PARTITION BY lang ORDER BY z DESC, t) rn FROM z) "
            "SELECT lang, token, y, z FROM r WHERE rn <= 10"
        ),
        "condensation_levels": (
            # SCC condensation (reusing the scc_parts closure), then
            # longest path per condensed node via a recursive CTE whose
            # UNION dedup bounds the state at V × maxlevel
            "WITH seq AS (SELECT l_orderkey, l_linenumber, l_partkey, "
            "lag(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) "
            "AS prev FROM lineitem WHERE l_quantity <= 8), "
            "edges AS (SELECT DISTINCT prev AS src, l_partkey AS dst FROM seq "
            "WHERE prev IS NOT NULL AND prev <> l_partkey), "
            "verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges), "
            "reach AS MATERIALIZED (WITH RECURSIVE r(u, v) AS ("
            "SELECT v, v FROM verts "
            "UNION "
            "SELECT r.u, e.dst FROM r JOIN edges e ON r.v = e.src) "
            "SELECT u, v FROM r), "
            "sccs AS MATERIALIZED (SELECT a.u AS vid, MIN(a.v) AS scc "
            "FROM reach a JOIN reach b ON a.u = b.v AND a.v = b.u "
            "GROUP BY a.u), "
            "cedges AS MATERIALIZED (SELECT DISTINCT sa.scc s, sb.scc d "
            "FROM edges e JOIN sccs sa ON sa.vid = e.src "
            "JOIN sccs sb ON sb.vid = e.dst WHERE sa.scc <> sb.scc), "
            "comps AS (SELECT DISTINCT scc FROM sccs), "
            "lp AS (WITH RECURSIVE l(v, d) AS ("
            "SELECT scc, 0 FROM comps "
            "UNION "
            "SELECT c.d, l.d + 1 FROM l JOIN cedges c ON c.s = l.v) "
            "SELECT v, max(d) AS lev FROM l GROUP BY 1) "
            "SELECT CAST(v AS BIGINT) AS scc, CAST(lev AS BIGINT) AS level "
            "FROM lp ORDER BY 1"
        ),
        "late_events": (
            # deterministic shuffled-arrival replay: arrival key =
            # md5_number_lower(event_id); watermark = running max(ts)
            "WITH a AS (SELECT event_id, epoch_us(ts) tsu, "
            "md5_number_lower(CAST(event_id AS VARCHAR)) h FROM events), "
            "w AS (SELECT event_id, tsu, max(tsu) OVER "
            "(ORDER BY h, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) wm FROM a) "
            "SELECT event_id, CAST((wm - tsu) // 1000000 AS BIGINT) "
            "AS late_by_s FROM w "
            "WHERE wm IS NOT NULL AND wm - tsu > 3600000000"
        ),
        "weighted_sample_orders": (
            "WITH kx AS (SELECT o_orderkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) w_cents, "
            "-ln((CAST(md5_number_lower(CAST(o_orderkey AS VARCHAR)) "
            "% 9007199254740992 AS DOUBLE) + 1.0) / 9007199254740992.0) "
            "/ CAST(round(o_totalprice * 100) AS BIGINT) AS k "
            "FROM orders) "
            "SELECT o_orderkey, w_cents, round(k, 6) AS key FROM kx "
            "ORDER BY k, o_orderkey LIMIT 50"
        ),
        "revenue_outlier_days": (
            # Tukey fences; quartiles as EXPLICIT interpolation mirroring
            # the engine op order (v[lo] + frac*CAST(v[hi]-v[lo] AS DOUBLE))
            "WITH d AS (SELECT epoch_us(l_shipdate) // 86400000000 AS dy, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) c "
            "FROM lineitem GROUP BY 1), "
            "o AS MATERIALIZED (SELECT c, row_number() OVER (ORDER BY c) rn "
            "FROM d), "
            "nn AS (SELECT CAST(count(*) AS BIGINT) n FROM d), "
            "p1 AS (SELECT CAST(n - 1 AS DOUBLE) * 0.25 AS pos, n FROM nn), "
            "p3 AS (SELECT CAST(n - 1 AS DOUBLE) * 0.75 AS pos, n FROM nn), "
            "q1 AS (SELECT (SELECT CAST(c AS DOUBLE) FROM o "
            "WHERE rn = CAST(floor(p1.pos) AS BIGINT) + 1) + "
            "(p1.pos - floor(p1.pos)) * "
            "(SELECT CAST(h.c - l.c AS DOUBLE) FROM o l, o h "
            "WHERE l.rn = CAST(floor(p1.pos) AS BIGINT) + 1 "
            "AND h.rn = least(CAST(floor(p1.pos) AS BIGINT) + 2, p1.n)) "
            "AS v FROM p1), "
            "q3 AS (SELECT (SELECT CAST(c AS DOUBLE) FROM o "
            "WHERE rn = CAST(floor(p3.pos) AS BIGINT) + 1) + "
            "(p3.pos - floor(p3.pos)) * "
            "(SELECT CAST(h.c - l.c AS DOUBLE) FROM o l, o h "
            "WHERE l.rn = CAST(floor(p3.pos) AS BIGINT) + 1 "
            "AND h.rn = least(CAST(floor(p3.pos) AS BIGINT) + 2, p3.n)) "
            "AS v FROM p3), "
            "f AS (SELECT q1.v - 1.5 * (q3.v - q1.v) AS lo, "
            "q3.v + 1.5 * (q3.v - q1.v) AS hi FROM q1, q3) "
            "SELECT CAST(dy AS BIGINT) AS \"day\", c AS rev_cents, "
            "CASE WHEN CAST(c AS DOUBLE) < f.lo THEN 'low' ELSE 'high' END "
            "AS side FROM d, f "
            "WHERE CAST(c AS DOUBLE) < f.lo OR CAST(c AS DOUBLE) > f.hi"
        ),
        "lang_source_chi2": (
            "WITH cells AS (SELECT lang, source, "
            "CAST(count(*) AS BIGINT) o FROM documents GROUP BY 1, 2), "
            "r AS (SELECT lang, CAST(sum(o) AS BIGINT) rn FROM cells "
            "GROUP BY 1), "
            "c AS (SELECT source, CAST(sum(o) AS BIGINT) cn FROM cells "
            "GROUP BY 1), "
            "t AS (SELECT CAST(sum(o) AS BIGINT) n FROM cells) "
            "SELECT cells.lang, cells.source, o AS observed, "
            "round(CAST(rn * cn AS DOUBLE) / CAST(t.n AS DOUBLE), 6) "
            "AS expected, "
            "round(CAST(o * t.n - rn * cn AS DOUBLE) * "
            "CAST(o * t.n - rn * cn AS DOUBLE) / "
            "CAST(t.n * rn * cn AS DOUBLE), 6) AS contrib "
            "FROM cells CROSS JOIN t "
            "JOIN r ON r.lang = cells.lang "
            "JOIN c ON c.source = cells.source"
        ),
        "frequent_triples": (
            "WITH b AS (SELECT DISTINCT l_orderkey o, l_partkey p "
            "FROM lineitem) "
            "SELECT CAST(b1.p AS BIGINT) p1, CAST(b2.p AS BIGINT) p2, "
            "CAST(b3.p AS BIGINT) p3, CAST(count(*) AS BIGINT) support "
            "FROM b b1 JOIN b b2 ON b1.o = b2.o AND b1.p < b2.p "
            "JOIN b b3 ON b2.o = b3.o AND b2.p < b3.p "
            "GROUP BY 1, 2, 3 HAVING count(*) >= 2"
        ),
        "etype_cooccur_lift": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day, event_type FROM events), "
            "tot AS (SELECT count(*) AS n FROM "
            "(SELECT DISTINCT user_id, day FROM d)), "
            "s AS (SELECT event_type, CAST(count(*) AS BIGINT) n "
            "FROM d GROUP BY 1), "
            "p AS (SELECT d1.event_type ta, d2.event_type tb, "
            "CAST(count(*) AS BIGINT) nb FROM d d1 JOIN d d2 "
            "ON d1.user_id = d2.user_id AND d1.day = d2.day "
            "AND d1.event_type < d2.event_type GROUP BY 1, 2) "
            "SELECT ta AS type_a, tb AS type_b, nb AS n_days_both, "
            "round(CAST(nb * tot.n AS DOUBLE) / "
            "CAST(sa.n * sb.n AS DOUBLE), 6) AS lift "
            "FROM p CROSS JOIN tot "
            "JOIN s sa ON sa.event_type = p.ta "
            "JOIN s sb ON sb.event_type = p.tb"
        ),
        "revenue_pareto": (
            # smallest k with 5·cum ≥ 4·total (exact ints), rev DESC +
            # custkey tiebreak ranking
            "WITH r AS (SELECT o_custkey, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "GROUP BY 1), "
            "o AS (SELECT rev, row_number() OVER "
            "(ORDER BY rev DESC, o_custkey) rn FROM r), "
            "c AS (SELECT rn, sum(rev) OVER (ORDER BY rn "
            "ROWS UNBOUNDED PRECEDING) cum FROM o), "
            "t AS (SELECT sum(rev) total, CAST(count(*) AS BIGINT) n FROM r), "
            "k AS (SELECT CAST(min(rn) AS BIGINT) k80 FROM c CROSS JOIN t "
            "WHERE cum * 5 >= 4 * total) "
            "SELECT t.n AS n_customers, k.k80, "
            "round(CAST((SELECT cum FROM c WHERE rn = k.k80) AS DOUBLE) / "
            "CAST(t.total AS DOUBLE), 6) AS share_k80 "
            "FROM t CROSS JOIN k"
        ),
        "events_mad": (
            "SELECT round(median(value), 6) AS median, "
            "round(median(abs(value - (SELECT median(value) FROM events))), 6) "
            "AS mad FROM events"
        ),
        "events_heatmap": (
            "SELECT CAST(isodow(ts) AS BIGINT) AS isodow, "
            "CAST(hour(ts) AS BIGINT) AS hour, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY 1, 2"
        ),
        "isolated_parts": (
            "WITH v AS (SELECT DISTINCT l_partkey FROM lineitem a "
            "WHERE EXISTS (SELECT 1 FROM lineitem b "
            "WHERE b.l_orderkey = a.l_orderkey "
            "AND b.l_partkey <> a.l_partkey)), "
            "np AS (SELECT CAST(count(*) AS BIGINT) n FROM part), "
            "nc AS (SELECT CAST(count(*) AS BIGINT) n FROM v) "
            "SELECT np.n AS n_parts, nc.n AS n_connected, "
            "np.n - nc.n AS n_isolated, "
            "CAST(np.n - nc.n AS DOUBLE) / CAST(np.n AS DOUBLE) "
            "AS isolation_rate FROM np CROSS JOIN nc"
        ),
        "conversion_latency": (
            # first view → first purchase at/after it; integer-µs floor
            # division (datediff('second') would count boundaries, not
            # elapsed seconds)
            "WITH f AS (SELECT user_id, min(ts) ft FROM events "
            "WHERE event_type = 'view' GROUP BY 1), "
            "c AS (SELECT f.user_id, f.ft, min(e.ts) AS ct FROM f "
            "JOIN events e ON e.user_id = f.user_id "
            "AND e.event_type = 'purchase' AND e.ts >= f.ft GROUP BY 1, 2), "
            "l AS (SELECT (epoch_us(ct) - epoch_us(ft)) // 1000000 AS lat "
            "FROM c) "
            "SELECT CAST(count(*) AS BIGINT) AS n_converters, "
            "CAST(sum(lat) AS BIGINT) AS total_latency_sec, "
            "CAST(sum(lat) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
            "AS avg_latency_sec FROM l"
        ),
        "benford_first_digit": (
            # leading digit from the decimal string of exact cents
            "WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) "
            "AS cents FROM orders WHERE round(o_totalprice * 100) > 0), "
            "d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) "
            "AS BIGINT) AS digit, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM c GROUP BY 1), t AS (SELECT sum(n_orders) tn FROM d) "
            "SELECT digit, n_orders, "
            "round(CAST(n_orders AS DOUBLE) / CAST(tn AS DOUBLE), 6) AS share, "
            "round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected "
            "FROM d CROSS JOIN t"
        ),
        "user_activity_streaks": (
            # classic islands: day − row_number() groups consecutive runs
            "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
            "FROM events), "
            "r AS (SELECT user_id, day, day - CAST(row_number() OVER "
            "(PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp FROM d), "
            "runs AS (SELECT user_id, CAST(count(*) AS BIGINT) len "
            "FROM r GROUP BY user_id, grp) "
            "SELECT user_id, "
            "(SELECT CAST(count(*) AS BIGINT) FROM d d2 "
            "WHERE d2.user_id = runs.user_id) AS n_active_days, "
            "CAST(max(len) AS BIGINT) AS longest_streak "
            "FROM runs GROUP BY user_id"
        ),
        "order_value_magnitude": (
            # digit count of exact integer cents = ⌊log10⌋ + 1
            "WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) "
            "AS cents FROM orders) "
            "SELECT CAST(length(CAST(cents AS VARCHAR)) - 1 AS BIGINT) "
            "AS magnitude, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM c GROUP BY 1"
        ),
        "split_leakage": (
            # split arithmetic identical to train_val_test_split; pairs
            # of splits sharing a text hash
            "WITH s AS (SELECT md5_number_lower(text) AS h, "
            "CASE WHEN ((doc_id % 2147483648) * 2654435761 + 40503) "
            "% 2147483648 % 100 < 80 THEN 'train' "
            "WHEN ((doc_id % 2147483648) * 2654435761 + 40503) "
            "% 2147483648 % 100 < 90 THEN 'val' ELSE 'test' END AS sp "
            "FROM documents), "
            "ds AS (SELECT DISTINCT h, sp FROM s) "
            "SELECT a.sp AS split_a, b.sp AS split_b, "
            "CAST(count(*) AS BIGINT) AS n_shared_texts "
            "FROM ds a JOIN ds b ON a.h = b.h AND a.sp < b.sp GROUP BY 1, 2"
        ),
        "dup_cluster_histogram": (
            "WITH c AS (SELECT md5(text) h, CAST(count(*) AS BIGINT) n "
            "FROM documents GROUP BY 1) "
            "SELECT n AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters "
            "FROM c GROUP BY 1"
        ),
        "doclen_histogram": (
            "WITH n AS (SELECT CAST(len(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS BIGINT) AS nt FROM documents) "
            "SELECT nt // 64 AS len_bucket, (nt // 64) * 64 AS bucket_lo, "
            "CAST(count(*) AS BIGINT) AS n_docs FROM n GROUP BY 1, 2"
        ),
        "events_disorder": (
            # inversions = (i, j) pairs with event_id_i < event_id_j but
            # ts_i > ts_j; τ = 1 − 4·inv/(n(n−1))
            "WITH inv AS (SELECT a.user_id, CAST(count(*) AS BIGINT) AS iv "
            "FROM events a JOIN events b2 ON a.user_id = b2.user_id "
            "AND a.event_id < b2.event_id AND a.ts > b2.ts GROUP BY 1), "
            "n AS (SELECT user_id, CAST(count(*) AS BIGINT) n FROM events "
            "GROUP BY 1 HAVING count(*) >= 5) "
            "SELECT n.user_id, n.n AS n_events, "
            "CAST(coalesce(iv, 0) AS BIGINT) AS n_inversions, "
            "round(1.0 - 4.0 * CAST(coalesce(iv, 0) AS DOUBLE) / "
            "(CAST(n.n AS DOUBLE) * CAST(n.n - 1 AS DOUBLE)), 6) AS tau "
            "FROM n LEFT JOIN inv USING (user_id)"
        ),
        "weekday_revenue": (
            "WITH d AS (SELECT CAST(isodow(l_shipdate) AS BIGINT) dow, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) c "
            "FROM lineitem GROUP BY 1), t AS (SELECT sum(c) tc FROM d) "
            "SELECT dow AS isodow, c / 100.0 AS revenue, "
            "round(CAST(c AS DOUBLE) / CAST(tc AS DOUBLE), 6) AS rev_share "
            "FROM d CROSS JOIN t"
        ),
        "window_distinct_users": (
            "WITH a AS (SELECT make_timestamp((epoch_us(ts) // 3600000000) "
            "* 3600000000) AS ws, user_id FROM events) "
            "SELECT ws AS window_start, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM a GROUP BY 1"
        ),
        "customer_migration": (
            # NTILE(4) per year over exact cents (rev DESC, custkey ASC),
            # transition counts over customers active both years
            "WITH r1 AS (SELECT o_custkey, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) rev FROM orders "
            "WHERE year(o_orderdate) = 1995 GROUP BY 1), "
            "r2 AS (SELECT o_custkey, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) rev FROM orders "
            "WHERE year(o_orderdate) = 1996 GROUP BY 1), "
            "t1 AS (SELECT o_custkey, CAST(ntile(4) OVER "
            "(ORDER BY rev DESC, o_custkey) AS BIGINT) tile FROM r1), "
            "t2 AS (SELECT o_custkey, CAST(ntile(4) OVER "
            "(ORDER BY rev DESC, o_custkey) AS BIGINT) tile FROM r2) "
            "SELECT t1.tile AS tile_from, t2.tile AS tile_to, "
            "CAST(count(*) AS BIGINT) AS n_customers "
            "FROM t1 JOIN t2 USING (o_custkey) GROUP BY 1, 2"
        ),
        "local_bridges": (
            # edges with no common neighbor on the strong graph
            f"WITH {_ESTRONG}, "
            "eu AS (SELECT s AS src, d AS dst FROM cnts "
            "WHERE c >= (SELECT m FROM mo)) "
            "SELECT src, dst FROM eu WHERE NOT EXISTS ("
            "SELECT 1 FROM e x JOIN e y ON x.dst = y.src "
            "WHERE x.src = eu.src AND y.dst = eu.dst "
            "AND x.dst <> eu.src AND x.dst <> eu.dst)"
        ),
        "two_hop_reach": (
            # distinct vertices within ≤2 hops, self excluded
            f"WITH {_ESYM_MAT}, "
            "p AS (SELECT e1.src v, e2.dst w FROM e e1 "
            "JOIN e e2 ON e2.src = e1.dst WHERE e2.dst <> e1.src "
            "UNION SELECT src, dst FROM e) "
            "SELECT v AS vid, CAST(count(DISTINCT w) AS BIGINT) AS reach2 "
            "FROM p GROUP BY 1"
        ),
        "label_conductance": (
            # φ(S) = cut / min(vol, total−vol), vol = 2·internal + cut;
            # labels = p_size % 3 on the src<dst edge set
            "WITH eu AS (SELECT a.l_partkey AS src, b.l_partkey AS dst "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2), "
            "lab AS (SELECT p_partkey vid, p_size % 3 AS l FROM part), "
            "le AS (SELECT a.l la, b.l lb FROM eu "
            "JOIN lab a ON a.vid = src JOIN lab b ON b.vid = dst), "
            "s AS (SELECT la AS l, 1 AS i, 0 AS c FROM le WHERE la = lb "
            "UNION ALL SELECT la, 0, 1 FROM le WHERE la <> lb "
            "UNION ALL SELECT lb, 0, 1 FROM le WHERE la <> lb), "
            "agg AS (SELECT l, CAST(sum(i) AS BIGINT) i, "
            "CAST(sum(c) AS BIGINT) c FROM s GROUP BY 1), "
            "tot AS (SELECT sum(2 * i + c) AS tv FROM agg) "
            "SELECT l AS label, i AS n_internal, c AS n_cut, "
            "round(CAST(c AS DOUBLE) / "
            "CAST(least(2 * i + c, tv - (2 * i + c)) AS DOUBLE), 6) "
            "AS conductance FROM agg CROSS JOIN tot"
        ),
        "top_customer_share": (
            # top-10 by exact-int revenue, custkey tiebreak; one division
            "WITH r AS (SELECT o_custkey, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "GROUP BY 1), "
            "t AS (SELECT rev, row_number() OVER "
            "(ORDER BY rev DESC, o_custkey) AS rn FROM r) "
            "SELECT CAST(least(10, (SELECT count(*) FROM r)) AS BIGINT) "
            "AS top_k, "
            "CAST((SELECT sum(rev) FROM t WHERE rn <= 10) AS BIGINT) "
            "AS top_revenue, "
            "CAST(sum(rev) AS BIGINT) AS total_revenue, "
            "CAST((SELECT sum(rev) FROM t WHERE rn <= 10) AS DOUBLE) / "
            "CAST(sum(rev) AS DOUBLE) AS share FROM r"
        ),
        "orders_fill_rate": (
            # bool_and per order: every line within 90 days of order date
            "WITH f AS (SELECT l_orderkey, "
            "bool_and(datediff('day', o_orderdate, l_shipdate) <= 90) AS ok "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_filled, "
            "CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS DOUBLE) / "
            "CAST(count(*) AS DOUBLE) AS fill_rate FROM f"
        ),
        "ngram_novelty": (
            # novelty = grams whose min owner doc_id is this doc / grams
            "WITH base AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS toks "
            "FROM documents), "
            "g AS (SELECT doc_id, "
            "md5_number_lower(array_to_string(list_slice(toks, i, i + 4), ' ')) AS h "
            "FROM (SELECT doc_id, toks, "
            "unnest(generate_series(1, len(toks) - 4)) AS i "
            "FROM base WHERE len(toks) >= 5)), "
            "dg AS (SELECT DISTINCT doc_id, h FROM g), "
            "mn AS (SELECT h, min(doc_id) AS first FROM dg GROUP BY 1) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
            "CAST(sum(CASE WHEN first = doc_id THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_novel, "
            "round(sum(CASE WHEN first = doc_id THEN 1 ELSE 0 END) * 1.0 "
            "/ count(*), 6) AS novelty "
            "FROM dg JOIN mn USING (h) GROUP BY 1"
        ),
        "revenue_autocorr": (
            # lag-1 Pearson r over consecutive-day revenue pairs; HUGEINT
            # moments, two sqrts + one division mirroring the engine
            "WITH d AS (SELECT CAST(l_shipdate AS DATE) dd, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) c "
            "FROM lineitem GROUP BY 1), "
            "p AS (SELECT a.c x, b.c y FROM d a JOIN d b ON b.dd = a.dd + 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_pairs, "
            "round(CAST(count(*) * sum(CAST(x AS HUGEINT) * y) "
            "- sum(x) * sum(y) AS DOUBLE) / "
            "(sqrt(CAST(count(*) * sum(CAST(x AS HUGEINT) * x) "
            "- sum(x) * sum(x) AS DOUBLE)) * "
            "sqrt(CAST(count(*) * sum(CAST(y AS HUGEINT) * y) "
            "- sum(y) * sum(y) AS DOUBLE))), 6) "
            "AS autocorr FROM p"
        ),
        "avg_neighbor_degree": (
            # Pastor-Satorras knn(k), degree-weighted exact-int form:
            # Σ S_v / (k · cnt) — one double division
            f"WITH {_ESYM_MAT}, "
            "deg AS (SELECT src AS vid, CAST(count(*) AS BIGINT) d "
            "FROM e GROUP BY 1), "
            "s AS (SELECT e.src AS vid, CAST(sum(n.d) AS BIGINT) sd "
            "FROM e JOIN deg n ON n.vid = e.dst GROUP BY 1) "
            "SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_vertices, "
            "round(CAST(sum(sd) AS DOUBLE) / "
            "(CAST(d AS DOUBLE) * CAST(count(*) AS DOUBLE)), 6) "
            "AS avg_nbr_degree "
            "FROM s JOIN deg USING (vid) GROUP BY d"
        ),
        "degree_gini": (
            # Gini over ascending degree ranks; (2·Σi·d)/(n·Σd) − (n+1)/n
            # with the engine's float op order
            f"WITH {_ESYM_MAT}, "
            "deg AS (SELECT src AS vid, CAST(count(*) AS BIGINT) d "
            "FROM e GROUP BY 1), "
            "r AS (SELECT d, CAST(row_number() OVER (ORDER BY d, vid) "
            "AS BIGINT) i FROM deg) "
            "SELECT CAST(count(*) AS BIGINT) AS n_vertices, "
            "CAST(sum(d) AS BIGINT) AS sum_degree, "
            "round((2.0 * CAST(sum(i * d) AS DOUBLE)) / "
            "(CAST(count(*) AS DOUBLE) * CAST(sum(d) AS DOUBLE)) - "
            "CAST(count(*) + 1 AS DOUBLE) * 1.0 / "
            "CAST(count(*) AS DOUBLE), 6) AS gini FROM r"
        ),
        "pii_density_by_source": (
            # per-source rollup of redact_pii's counting semantics
            # (emails replaced first, then IPs counted on the residue)
            "WITH c AS (SELECT source, "
            "len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS e, "
            "len(regexp_extract_all(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "'<EMAIL>', 'g'), "
            "'[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS i "
            "FROM documents) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(e) AS BIGINT) AS n_emails, "
            "CAST(sum(i) AS BIGINT) AS n_ips, "
            "CAST(sum(CASE WHEN e > 0 OR i > 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS docs_with_pii, "
            "round(sum(CASE WHEN e > 0 OR i > 0 THEN 1 ELSE 0 END) * 1.0 "
            "/ count(*), 6) AS pii_rate "
            "FROM c GROUP BY 1"
        ),
        "cosine_histogram": (
            # bins on the ROUNDED cosine so edges agree bit-exactly
            "WITH s AS (SELECT "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cos "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) "
            "SELECT CAST(least(floor((cos + 1.0) * 10.0), 19) AS BIGINT) "
            "AS bin, CAST(count(*) AS BIGINT) AS n_pairs "
            "FROM s GROUP BY 1"
        ),
        "knn_label_vote": (
            # Cover–Hart leave-one-out k-NN vote on knn_graph's
            # deterministic ranking; vote tie → min label
            "WITH s AS (SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cos "
            "FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY vec_id "
            "ORDER BY cos DESC, nbr_id) AS rank FROM s), "
            "v AS (SELECT r.vec_id, e.label, count(*) AS c FROM r "
            "JOIN embeddings e ON e.vec_id = r.nbr_id "
            "WHERE r.rank <= 5 GROUP BY 1, 2), "
            "w AS (SELECT vec_id, label, row_number() OVER "
            "(PARTITION BY vec_id ORDER BY c DESC, label) AS rn FROM v) "
            "SELECT w.vec_id, CAST(w.label AS BIGINT) AS pred_label, "
            "CAST(e.label AS BIGINT) AS true_label, "
            "w.label = e.label AS correct "
            "FROM w JOIN embeddings e ON e.vec_id = w.vec_id WHERE rn = 1"
        ),
        "basket_lift": (
            # Apriori 2-itemset lift: n_ab·N / (n_a·n_b) over distinct
            # baskets; doubles formed in the engine's op order
            "WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
            "FROM lineitem), "
            "np AS (SELECT p, CAST(count(*) AS BIGINT) n FROM po GROUP BY 1), "
            "nn AS (SELECT CAST(count(*) AS BIGINT) n FROM orders), "
            "pr AS (SELECT a.p pa, b.p pb, CAST(count(*) AS BIGINT) nab "
            "FROM po a JOIN po b ON a.o = b.o AND a.p < b.p "
            "GROUP BY 1, 2 HAVING count(*) >= 2) "
            "SELECT pa AS part_a, pb AS part_b, nab AS n_both, "
            "round(CAST(nab AS DOUBLE) * CAST(nn.n AS DOUBLE) / "
            "(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)), 6) AS lift "
            "FROM pr JOIN np na ON na.p = pa JOIN np nb ON nb.p = pb "
            "CROSS JOIN nn"
        ),
        "source_kl": (
            # KL(source ‖ corpus) over unigram counts; ratios formed
            # c*1.0/n before ln, mirroring the engine's op order
            "WITH tok AS (SELECT source, md5_number_lower(t) AS h FROM "
            "(SELECT source, unnest(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS t FROM documents)), "
            "cst AS (SELECT source, h, CAST(count(*) AS BIGINT) c "
            "FROM tok GROUP BY 1, 2), "
            "ns AS (SELECT source, CAST(count(*) AS BIGINT) n "
            "FROM tok GROUP BY 1), "
            "ct AS (SELECT h, CAST(count(*) AS BIGINT) c FROM tok GROUP BY 1), "
            "nn AS (SELECT CAST(count(*) AS BIGINT) n FROM tok) "
            "SELECT source, round(sum((cst.c * 1.0 / ns.n) * "
            "ln((cst.c * 1.0 / ns.n) / (ct.c * 1.0 / nn.n))), 6) AS kl, "
            "ns.n AS n_tokens "
            "FROM cst JOIN ns USING (source) JOIN ct USING (h) CROSS JOIN nn "
            "GROUP BY source, ns.n"
        ),
        "source_gram_overlap": (
            # distinct 5-grams shared between source pairs (content
            # leakage); source_a < source_b lexicographic
            "WITH base AS (SELECT source, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS toks "
            "FROM documents), "
            "g AS (SELECT source, "
            "md5_number_lower(array_to_string(list_slice(toks, i, i + 4), ' ')) AS h "
            "FROM (SELECT source, toks, "
            "unnest(generate_series(1, len(toks) - 4)) AS i "
            "FROM base WHERE len(toks) >= 5)), "
            "ds AS (SELECT DISTINCT source, h FROM g) "
            "SELECT a.source AS source_a, b.source AS source_b, "
            "CAST(count(*) AS BIGINT) AS n_shared "
            "FROM ds a JOIN ds b ON a.h = b.h AND a.source < b.source "
            "GROUP BY 1, 2"
        ),
        "tfidf_cosine_pairs": (
            # Bayardo WWW'07 all-pairs cosine over df-pruned TF-IDF word
            # 3-gram vectors; integer weights round(tf*ln(N/df)*1e4) make
            # dot products exact; ONE division + ONE sqrt mirrored
            "WITH base AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS toks "
            "FROM documents), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) nd FROM documents), "
            "g AS (SELECT doc_id, "
            "md5_number_lower(array_to_string(list_slice(toks, i, i + 2), ' ')) AS h "
            "FROM (SELECT doc_id, toks, "
            "unnest(generate_series(1, len(toks) - 2)) AS i "
            "FROM base WHERE len(toks) >= 3)), "
            "tf AS (SELECT doc_id, h, CAST(count(*) AS BIGINT) tf "
            "FROM g GROUP BY 1, 2), "
            "df AS (SELECT h, count(*) df FROM tf GROUP BY 1), "
            "w AS (SELECT doc_id, h, CAST(round(tf * "
            "ln(nd / CAST(df AS DOUBLE)) * 10000) AS BIGINT) AS wi "
            "FROM tf JOIN df USING (h) CROSS JOIN nn "
            "WHERE df BETWEEN 2 AND 20), "
            "nrm AS (SELECT doc_id, sum(wi * wi) AS ss FROM w GROUP BY 1), "
            "dot AS (SELECT a.doc_id da, b.doc_id db, sum(a.wi * b.wi) AS dp "
            "FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2) "
            "SELECT da AS doc_a, db AS doc_b, "
            "round(CAST(dp AS DOUBLE) / "
            "sqrt(CAST(na.ss AS DOUBLE) * CAST(nb.ss AS DOUBLE)), 6) AS cos "
            "FROM dot JOIN nrm na ON na.doc_id = da "
            "JOIN nrm nb ON nb.doc_id = db "
            "WHERE round(CAST(dp AS DOUBLE) / "
            "sqrt(CAST(na.ss AS DOUBLE) * CAST(nb.ss AS DOUBLE)), 6) >= 0.1"
        ),
        "min_cost_supplier": (
            # Q2-shaped: per-part min unit price over the lineitem bridge
            # (no partsupp in this schema), min suppkey on ties; the raw
            # double division matches the engine bit-exactly
            "WITH u AS (SELECT l_partkey, l_suppkey, "
            "l_extendedprice / l_quantity AS unit FROM lineitem), "
            "m AS (SELECT l_partkey, min(unit) AS mu FROM u GROUP BY 1), "
            "w AS (SELECT u.l_partkey AS pk, min(u.l_suppkey) AS sk "
            "FROM u JOIN m ON u.l_partkey = m.l_partkey AND u.unit = m.mu "
            "GROUP BY 1) "
            "SELECT w.pk AS p_partkey, w.sk AS s_suppkey, s_name, n_name, "
            "m.mu AS unit_price "
            "FROM w JOIN m ON m.l_partkey = w.pk "
            "JOIN supplier ON s_suppkey = w.sk "
            "JOIN nation ON n_nationkey = s_nationkey"
        ),
        "supplier_variety": (
            # Q16-shaped (s_acctbal < 0 plays the complaint filter — no
            # s_comment in this schema)
            "SELECT p_brand, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE l_suppkey NOT IN "
            "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
            "GROUP BY 1, 2"
        ),
        "top_supplier_revenue": (
            # Q15-shaped: scalar-subquery max, ties kept; exact-int units,
            # /10000.0 mirrors the engine's one division
            "WITH r AS (SELECT l_suppkey AS s_suppkey, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS units "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' "
            "AND l_shipdate < TIMESTAMP '1995-04-01' GROUP BY 1) "
            "SELECT s_suppkey, s_name, units / 10000.0 AS total_revenue "
            "FROM r JOIN supplier USING (s_suppkey) "
            "WHERE units = (SELECT max(units) FROM r)"
        ),
        "nation_market_share": (
            # Q8-shaped: exact-int cents·(100−disc) units, share = one
            # double division mirroring the engine's final fold
            "WITH f AS (SELECT year(o_orderdate) AS yr, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS units, "
            "sn.n_name AS supp_nation "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation cn ON cn.n_nationkey = c_nationkey "
            "JOIN region ON r_regionkey = cn.n_regionkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation sn ON sn.n_nationkey = s_nationkey "
            "WHERE r_name = 'ASIA') "
            "SELECT CAST(yr AS BIGINT) AS o_year, "
            "CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN units ELSE 0 END) "
            "AS BIGINT) AS target_units, "
            "CAST(sum(units) AS BIGINT) AS total_units, "
            "CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN units ELSE 0 END) "
            "AS DOUBLE) / CAST(sum(units) AS DOUBLE) AS mkt_share "
            "FROM f GROUP BY 1"
        ),
        "late_shipment_rate": (
            # Q12-shaped (priority plays shipmode's role — no l_returnflag in
            # this schema); rate mirrors the engine's one final division
            "SELECT o_orderpriority, "
            "CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_late, "
            "CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60 "
            "THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
            "AS late_rate "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey GROUP BY 1"
        ),
        "disjunctive_revenue": (
            # Q19-shaped disjunction, same exact-int-cents fold; brand
            # number parsed from 'Brand#N'
            "SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 "
            "AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 "
            "AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 "
            "AND l_quantity BETWEEN 20 AND 30)"
        ),
        "returned_customer_topk": (
            # Q10-shaped: exact-int revenue ranking with custkey tiebreak —
            # the same round-then-rank determinism as shipping_priority_topk
            "WITH r AS (SELECT o_custkey AS c_custkey, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "WHERE l_returnflag = 'R' GROUP BY 1), "
            "rk AS (SELECT c_custkey, rev, "
            "row_number() OVER (ORDER BY rev DESC, c_custkey) AS rnk FROM r) "
            "SELECT rk.c_custkey, c_name, n_name, rev / 10000.0 AS revenue, rnk "
            "FROM rk JOIN customer ON customer.c_custkey = rk.c_custkey "
            "JOIN nation ON n_nationkey = c_nationkey WHERE rnk <= 20"
        ),
        "nation_trade_volume": (
            # Q7-shaped nation-pair flow, same exact-int-cents fold; the
            # engine packs (cust, supp) nationkeys and filters equal pairs
            "SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation cn ON cn.n_nationkey = c_nationkey "
            "JOIN nation sn ON sn.n_nationkey = s_nationkey "
            "WHERE c_nationkey <> s_nationkey GROUP BY 1, 2"
        ),
        "revenue_by_region": (
            # the five-way snowflake join, same exact-int-cents fold
            "SELECT r_name, sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey "
            "JOIN region ON r_regionkey = n_regionkey GROUP BY 1"
        ),
        "events_quantiles": (
            "SELECT event_type, 0.5 AS quantile, CAST(count(*) AS BIGINT) AS n, "
            "round(quantile_cont(value, 0.5), 6) AS value FROM events GROUP BY 1 "
            "UNION ALL "
            "SELECT event_type, 0.95 AS quantile, CAST(count(*) AS BIGINT) AS n, "
            "round(quantile_cont(value, 0.95), 6) AS value FROM events GROUP BY 1"
        ),
        "events_asof": (
            # as-of with explicit strictness + max-event_id tie-break (plain
            # joins rather than DuckDB ASOF JOIN, whose tie choice is
            # unspecified)
            "WITH pr AS MATERIALIZED (SELECT l.event_id AS event_id, "
            "r.ts AS rts, r.event_id AS rid FROM events l JOIN events r "
            "ON r.user_id = l.user_id AND r.ts < l.ts "
            "WHERE l.event_type = 'click' AND r.event_type = 'purchase'), "
            "m AS (SELECT event_id, max(rts) AS prior_ts FROM pr GROUP BY 1) "
            "SELECT m.event_id, max(p.rid) AS prior_event_id, m.prior_ts "
            "FROM m JOIN pr p ON p.event_id = m.event_id AND p.rts = m.prior_ts "
            "GROUP BY m.event_id, m.prior_ts"
        ),
        "embedding_label_centroids": (
            # per-(label, dim) float means; unnest WITH ORDINALITY replayed
            # via generate_subscripts (1-based, matching the engine)
            "WITH u AS (SELECT label, unnest(embedding) AS x, "
            "generate_subscripts(embedding, 1) AS dim FROM embeddings) "
            "SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim, "
            "CAST(count(*) AS BIGINT) AS n, "
            "round(sum(CAST(x AS DOUBLE)) / count(*), 6) AS centroid "
            "FROM u GROUP BY 1, 2"
        ),
        "embedding_dup_pairs": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cos "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            f"CAST(b.embedding AS DOUBLE[])) >= {EMB_THRESHOLD}"
        ),
        "ann_topk": (
            "WITH q AS (SELECT vec_id, embedding FROM embeddings "
            f"WHERE vec_id IN ({', '.join(map(str, ANN_QUERY_IDS))})), "
            "s AS (SELECT q.vec_id AS query_id, e.vec_id AS vec_id, "
            "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])), 6) AS cos "
            "FROM q JOIN embeddings e ON e.vec_id <> q.vec_id), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY query_id "
            "ORDER BY cos DESC, vec_id) AS rank FROM s) "
            f"SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= {ANN_K}"
        ),
        "q1_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 4) AS sum_qty, "
            "round(sum(l_extendedprice), 4) AS sum_base_price, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price, "
            "count(*) AS count_order FROM lineitem "
            "WHERE l_shipdate < TIMESTAMP '1998-09-01' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "events_window": (
            "SELECT user_id, "
            f"(CAST(floor(epoch(ts)) AS BIGINT) // {WINDOW_SEC}) * {WINDOW_SEC} AS wstart, "
            "count(*) AS n_events, round(sum(value), 6) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "events_sessionize": (
            "WITH x AS (SELECT user_id, ts, event_id, value, "
            "CASE WHEN lag(ts) OVER w IS NULL OR "
            f"epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_SEC} * 1000000 "
            "THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "y AS (SELECT *, sum(brk) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sess FROM x) "
            "SELECT user_id, epoch_us(min(ts)) AS session_start_us, "
            "count(*) AS n_events, round(sum(value), 6) AS sum_value "
            "FROM y GROUP BY user_id, sess"
        ),
        "ngram_jaccard_pairs": (
            "WITH pos AS MATERIALIZED ("
            "SELECT doc_id, text, "
            "unnest(generate_series(1, greatest(1, length(text) - 4))) AS i "
            "FROM documents), "
            "sh AS MATERIALIZED ("
            "SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g FROM pos), "
            "cnt AS MATERIALIZED (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1), "
            "inter AS MATERIALIZED ("
            "SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i "
            "FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT da AS doc_a, db AS doc_b, "
            "round(i * 1.0 / (ca.nsh + cb.nsh - i), 6) AS jaccard "
            "FROM inter JOIN cnt ca ON ca.doc_id = da "
            "JOIN cnt cb ON cb.doc_id = db "
            "WHERE i * 1.0 / (ca.nsh + cb.nsh - i) >= 0.5"
        ),
        "dup_rate_by_source": (
            # distinct-text ≡ distinct-md5 (the engine hashes; md5
            # collisions are the stated 2^-64 caveat); one int division
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(count(DISTINCT text) AS BIGINT) AS n_unique, "
            "round(1.0 - count(DISTINCT text) * 1.0 / count(*), 6) "
            "AS dup_rate FROM documents GROUP BY 1"
        ),
        "shingle_containment": (
            # directional containment over the SAME shingle CTEs as the
            # Jaccard oracle; the engine joins on md5 of the gram — counts
            # identical modulo 2^-64 collisions (stated md5_lower64 caveat)
            "WITH pos AS MATERIALIZED (SELECT doc_id, text, "
            "unnest(generate_series(1, greatest(1, length(text) - 4))) AS i "
            "FROM documents), "
            "sh AS MATERIALIZED (SELECT DISTINCT doc_id, "
            "substr(text, CAST(i AS INT), 5) AS g FROM pos), "
            "cnt AS MATERIALIZED (SELECT doc_id, count(*) AS nsh FROM sh "
            "GROUP BY 1), "
            "inter AS MATERIALIZED (SELECT a.doc_id AS da, b.doc_id AS db, "
            "count(*) AS n FROM sh a JOIN sh b ON a.g = b.g "
            "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT da AS src, db AS dst, n AS n_shared, "
            "round(n * 1.0 / ca.nsh, 6) AS containment "
            "FROM inter JOIN cnt ca ON ca.doc_id = da "
            "WHERE n * 1.0 / ca.nsh >= 0.6 "
            "UNION ALL "
            "SELECT db, da, n, round(n * 1.0 / cb.nsh, 6) "
            "FROM inter JOIN cnt cb ON cb.doc_id = db "
            "WHERE n * 1.0 / cb.nsh >= 0.6"
        ),
        "dup_span_pairs": (
            # ExactSubstr replay (pipelines/dedup.py dup_span_pairs): every
            # stride-1 40-char window, per-doc DISTINCT, self-joined on the
            # window STRING (the engine groups on md5_lower64 of the same
            # string — identical counts modulo 2^-64 collisions, the stated
            # md5_lower64 caveat); docs shorter than 40 chars emit nothing.
            "WITH pos AS MATERIALIZED ("
            "SELECT doc_id, text, "
            "unnest(generate_series(1, length(text) - 39)) AS i "
            "FROM documents WHERE length(text) >= 40), "
            "dw AS MATERIALIZED ("
            "SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 40) AS win "
            "FROM pos) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(count(*) AS BIGINT) AS n_shared "
            "FROM dw a JOIN dw b ON a.win = b.win AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2 HAVING count(*) >= 5"
        ),
        "lpa_copurchase": _lpa_sql(LPA_ITERS),
        "seeded_labels_copurchase": _seeded_lpa_sql(LPA_ITERS),
        "kcore_copurchase": _kcore_sql(),
        "s_core_copurchase": _score_sql(),
        "clique5_strong": (
            # ordered 5-cliques (v1<v2<v3<v4<v5, all 10 edges) over the
            # min_orders=2 co-purchase graph = engine count / 5!
            "WITH e AS MATERIALIZED (SELECT a.l_partkey AS src, "
            "b.l_partkey AS dst "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "WHERE a.l_partkey <> b.l_partkey GROUP BY 1, 2 "
            "HAVING count(DISTINCT a.l_orderkey) >= 2) "
            "SELECT CAST(count(*) AS BIGINT) AS n_cliques FROM e e12 "
            "JOIN e e13 ON e13.src = e12.src AND e13.dst > e12.dst "
            "JOIN e e14 ON e14.src = e12.src AND e14.dst > e13.dst "
            "JOIN e e15 ON e15.src = e12.src AND e15.dst > e14.dst "
            "JOIN e e23 ON e23.src = e12.dst AND e23.dst = e13.dst "
            "JOIN e e24 ON e24.src = e12.dst AND e24.dst = e14.dst "
            "JOIN e e25 ON e25.src = e12.dst AND e25.dst = e15.dst "
            "JOIN e e34 ON e34.src = e13.dst AND e34.dst = e14.dst "
            "JOIN e e35 ON e35.src = e13.dst AND e35.dst = e15.dst "
            "JOIN e e45 ON e45.src = e14.dst AND e45.dst = e15.dst "
            "WHERE e12.src < e12.dst"
        ),
        "weighted_assortativity_copurchase": (
            # strength = Σ incident shared-order-count weights over BOTH
            # orientations; exact-integer sums cast to DOUBLE then the
            # assortativity_from_sums operation order — bit-exact
            "WITH ew AS MATERIALIZED (SELECT a.l_partkey AS src, "
            "b.l_partkey AS dst, "
            "CAST(count(DISTINCT a.l_orderkey) AS BIGINT) AS w "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "WHERE a.l_partkey <> b.l_partkey GROUP BY 1, 2), "
            "st AS MATERIALIZED (SELECT src AS vid, "
            "CAST(sum(w) AS BIGINT) AS s FROM ew GROUP BY 1), "
            "j AS (SELECT s1.s AS x, s2.s AS y FROM ew "
            "JOIN st s1 ON s1.vid = ew.src JOIN st s2 ON s2.vid = ew.dst), "
            "m AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
            "CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy, "
            "CAST(sum(x*y) AS DOUBLE) AS sxy, "
            "CAST(sum(x*x) AS DOUBLE) AS sxx, "
            "CAST(sum(y*y) AS DOUBLE) AS syy FROM j) "
            "SELECT round((n * sxy - sx * sy) / "
            "sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) "
            "AS wassortativity FROM m"
        ),
        "kshell_histogram": (
            f"SELECT core, CAST(count(*) AS BIGINT) AS n_vertices "
            f"FROM ({_kcore_sql()}) GROUP BY 1"
        ),
        "ktruss_copurchase": _ktruss_sql(),
        "fingerprint": _fingerprint_sql(),
        "winnow_fingerprints": _winnow_sql(),
        "winnow_dup_pairs": (
            # MOSS match: distinct shared winnow fingerprints per doc pair;
            # the winnow CTE chain (k=20, w=16) nested as a subquery
            f"WITH wf AS MATERIALIZED (FROM ({_winnow_sql(20, 16)})), "
            "d AS MATERIALIZED (SELECT DISTINCT doc_id, fp FROM wf) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "count(*) AS n_shared FROM d a JOIN d b "
            "ON a.fp = b.fp AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2 HAVING count(*) >= 5"
        ),
        "simhash": _simhash_sql(),
        "simhash_dup_pairs": _simhash_pairs_sql(),
        "minhash_dup_pairs": _minhash_pairs_sql(),
        "dedup_groups": _dedup_groups_sql(),
        "events_lag": (
            # per-user LAG window (relational.events_lag); delta is one IEEE
            # subtraction of raw doubles → bit-exact
            "SELECT event_id, "
            "CAST(coalesce(lag(event_id) OVER w, -1) AS BIGINT) AS prev_event_id, "
            "CAST(coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, 0) AS BIGINT) "
            "AS gap_us, "
            "coalesce(value - lag(value) OVER w, 0.0) AS delta_value "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "fk_integrity": (
            # distinct child FK values and those with no parent row,
            # one UNION ALL arm per star-schema FK edge
            "SELECT relation, n_keys, n_orphans FROM ("
            "SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relation, "
            "count(DISTINCT l_orderkey) AS n_keys, "
            "count(DISTINCT CASE WHEN o_orderkey IS NULL THEN l_orderkey END) "
            "AS n_orphans FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey "
            "UNION ALL "
            "SELECT 'lineitem.l_partkey->part.p_partkey', "
            "count(DISTINCT l_partkey), "
            "count(DISTINCT CASE WHEN p_partkey IS NULL THEN l_partkey END) "
            "FROM lineitem LEFT JOIN part ON l_partkey = p_partkey "
            "UNION ALL "
            "SELECT 'lineitem.l_suppkey->supplier.s_suppkey', "
            "count(DISTINCT l_suppkey), "
            "count(DISTINCT CASE WHEN s_suppkey IS NULL THEN l_suppkey END) "
            "FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey "
            "UNION ALL "
            "SELECT 'orders.o_custkey->customer.c_custkey', "
            "count(DISTINCT o_custkey), "
            "count(DISTINCT CASE WHEN c_custkey IS NULL THEN o_custkey END) "
            "FROM orders LEFT JOIN customer ON o_custkey = c_custkey "
            "UNION ALL "
            "SELECT 'customer.c_nationkey->nation.n_nationkey', "
            "count(DISTINCT c_nationkey), "
            "count(DISTINCT CASE WHEN n_nationkey IS NULL THEN c_nationkey END) "
            "FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey "
            "UNION ALL "
            "SELECT 'supplier.s_nationkey->nation.n_nationkey', "
            "count(DISTINCT s_nationkey), "
            "count(DISTINCT CASE WHEN n_nationkey IS NULL THEN s_nationkey END) "
            "FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey "
            "UNION ALL "
            "SELECT 'nation.n_regionkey->region.r_regionkey', "
            "count(DISTINCT n_regionkey), "
            "count(DISTINCT CASE WHEN r_regionkey IS NULL THEN n_regionkey END) "
            "FROM nation LEFT JOIN region ON n_regionkey = r_regionkey"
            ") ORDER BY relation"
        ),
        "order_priority_semi": (
            "SELECT o_orderpriority, count(*) AS n_orders FROM orders "
            "WHERE EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = o_orderkey AND l_quantity >= 48) GROUP BY 1"
        ),
        "customer_order_histogram": (
            "SELECT n_orders, count(*) AS n_custs FROM ("
            "SELECT c_custkey, count(o_orderkey) AS n_orders "
            "FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
            "GROUP BY 1) GROUP BY 1"
        ),
        "small_qty_revenue": (
            # below-average predicate in exact integer arithmetic:
            # q < 0.2*(S/n)  <=>  5*q100*n < S100 (hundredths-scaled ints)
            "SELECT coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0) "
            "/ 700.0 AS avg_yearly FROM lineitem JOIN ("
            "SELECT l_partkey AS pk, "
            "sum(CAST(round(l_quantity * 100) AS BIGINT)) AS s100, "
            "count(*) AS n FROM lineitem GROUP BY 1) s ON l_partkey = pk "
            "WHERE CAST(round(l_quantity * 100) AS BIGINT) * 5 * n < s100"
        ),
        "large_volume_orders": (
            "SELECT o_orderkey, o_custkey, o_totalprice, "
            "sum_qty / 100.0 AS total_qty FROM ("
            "SELECT l_orderkey, sum(CAST(round(l_quantity * 100) AS BIGINT)) "
            "AS sum_qty FROM lineitem GROUP BY 1) q "
            "JOIN orders ON o_orderkey = l_orderkey WHERE sum_qty > 25000"
        ),
        "shipping_priority_topk": (
            # exact int-cents revenue; rank ties broken by orderkey asc
            "WITH r AS (SELECT l_orderkey AS k, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev "
            "FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-06-15' GROUP BY 1), "
            "j AS (SELECT k AS o_orderkey, rev, "
            "strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate "
            "FROM r JOIN orders ON o_orderkey = k "
            "WHERE o_orderdate < TIMESTAMP '1997-06-15'), "
            "ranked AS (SELECT *, row_number() OVER "
            "(ORDER BY rev DESC, o_orderkey) AS rnk FROM j) "
            "SELECT o_orderkey, rev / 10000.0 AS revenue, o_orderdate, rnk "
            "FROM ranked WHERE rnk <= 10"
        ),
        "revenue_rollup": (
            # same exact-int-cents fold as revenue_by_nation; 'ALL' is the
            # rollup placeholder on both sides (no NULL-semantics in the
            # hash compare)
            "SELECT CASE WHEN GROUPING(r_name) = 1 THEN 'ALL' ELSE r_name END "
            "AS r_name, "
            "CASE WHEN GROUPING(n_name) = 1 THEN 'ALL' ELSE n_name END "
            "AS n_name, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 "
            "AS revenue "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey "
            "JOIN region ON r_regionkey = n_regionkey "
            "GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())"
        ),
        "user_event_pivot": (
            # fixed pivot schema; total as exact int cents
            "SELECT user_id, "
            "count(*) FILTER (WHERE event_type = 'click') AS n_click, "
            "count(*) FILTER (WHERE event_type = 'error') AS n_error, "
            "count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase, "
            "count(*) FILTER (WHERE event_type = 'signup') AS n_signup, "
            "count(*) FILTER (WHERE event_type = 'view') AS n_view, "
            "sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value "
            "FROM events GROUP BY 1"
        ),
        "component_size_histogram": (
            "SELECT csize, count(*) AS n_components FROM ("
            f"SELECT component, count(*) AS csize FROM ({_cc_sql()}) x "
            "GROUP BY component) GROUP BY csize"
        ),
        "quantile_sketch_events": (
            # identical deterministic sample: bottom-256 by
            # md5_number_lower(event_id) per type (event_id tie-break),
            # quantile_cont interpolation == the engine's v0+(v1-v0)*f
            "WITH smp AS (SELECT event_type, value FROM ("
            "SELECT event_type, value, row_number() OVER ("
            "PARTITION BY event_type ORDER BY "
            "md5_number_lower(CAST(event_id AS VARCHAR)), event_id) AS rn "
            "FROM events) WHERE rn <= 256) "
            "SELECT event_type, 0.5 AS quantile, "
            "CAST(count(*) AS BIGINT) AS n_sample, "
            "round(quantile_cont(value, 0.5), 6) AS value_est FROM smp "
            "GROUP BY 1 UNION ALL "
            "SELECT event_type, 0.95 AS quantile, "
            "CAST(count(*) AS BIGINT) AS n_sample, "
            "round(quantile_cont(value, 0.95), 6) AS value_est FROM smp "
            "GROUP BY 1"
        ),
        "forecast_revenue": (
            # Q6 shape; every predicate on exact int hundredths
            "SELECT coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* CAST(round(l_discount * 100) AS BIGINT)), 0) / 10000.0 "
            "AS revenue FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
            "AND CAST(round(l_quantity * 100) AS BIGINT) < 2400"
        ),
        "events_value_stats": (
            # exact integer moments; float expressions mirrored term for
            # term (cents and cents^2 scale folded out at the end)
            "WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "sum(CAST(round(value * 100) AS BIGINT)) AS s, "
            "sum(CAST(round(value * 100) AS BIGINT) * "
            "CAST(round(value * 100) AS BIGINT)) AS ss FROM events GROUP BY 1) "
            "SELECT event_type, n, "
            "round(s * 1.0 / (n * 100.0), 6) AS mean, "
            "round((n * ss - s * s) / (n * 1.0 * n * 10000.0), 6) AS var_pop, "
            "round(sqrt((n * ss - s * s) / (n * 1.0 * n * 10000.0)), 6) "
            "AS stddev_pop FROM m"
        ),
        "succ_inout_correlation": (
            # exact int64 moments; the one float expression mirrors the
            # engine term for term (HUGEINT->double conversions identical)
            "WITH seq AS (SELECT l_orderkey, l_linenumber, l_partkey, "
            "lag(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) "
            "AS prev FROM lineitem WHERE l_quantity <= 8), "
            "edges AS (SELECT DISTINCT prev AS src, l_partkey AS dst FROM seq "
            "WHERE prev IS NOT NULL AND prev <> l_partkey), "
            "od AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS o "
            "FROM edges GROUP BY 1), "
            "idg AS (SELECT dst AS vid, CAST(count(*) AS BIGINT) AS i "
            "FROM edges GROUP BY 1), "
            "v AS (SELECT src AS vid FROM edges UNION SELECT dst FROM edges), "
            "dd AS (SELECT v.vid, coalesce(o, 0) AS x, coalesce(i, 0) AS y "
            "FROM v LEFT JOIN od USING (vid) LEFT JOIN idg USING (vid)), "
            "m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, "
            "sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy, "
            "sum(x * y) AS sxy FROM dd) "
            "SELECT n AS n_vertices, round((n * sxy - sx * sy) / "
            "sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6) AS r "
            "FROM m"
        ),
        "events_transition_matrix": (
            "WITH o AS (SELECT user_id, event_type, "
            "lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS prev FROM events) "
            "SELECT prev AS from_type, event_type AS to_type, "
            "CAST(count(*) AS BIGINT) AS n FROM o "
            "WHERE prev IS NOT NULL GROUP BY 1, 2"
        ),
        "events_ema": (
            # recursive CTE advancing one within-user position per step —
            # the SAME 0.25*x + 0.75*y_prev recurrence, same float order,
            # as the engine's step-vectorized bucket kernel
            "WITH RECURSIVE b AS (SELECT event_id, user_id, value, "
            "CAST(row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS BIGINT) - 1 AS pos FROM events), "
            "r AS (SELECT event_id, user_id, pos, value AS ema FROM b "
            "WHERE pos = 0 UNION ALL "
            "SELECT b.event_id, b.user_id, b.pos, "
            "0.25 * b.value + 0.75 * r.ema "
            "FROM b JOIN r ON r.user_id = b.user_id AND b.pos = r.pos + 1) "
            "SELECT event_id, round(ema, 6) AS ema FROM r"
        ),
        "customer_rfm": (
            # NTILE(5) per dimension with custkey tie-break — the engine's
            # closed-form (ordinal, n) tile arithmetic IS SQL NTILE
            "WITH agg AS MATERIALIZED (SELECT o_custkey AS custkey, "
            "max(o_orderdate) AS r, count(*) AS f, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS m "
            "FROM orders GROUP BY 1) "
            "SELECT custkey, r_tile, f_tile, m_tile, "
            "r_tile * 100 + f_tile * 10 + m_tile AS rfm FROM ("
            "SELECT custkey, "
            "CAST(ntile(5) OVER (ORDER BY r DESC, custkey) AS BIGINT) AS r_tile, "
            "CAST(ntile(5) OVER (ORDER BY f DESC, custkey) AS BIGINT) AS f_tile, "
            "CAST(ntile(5) OVER (ORDER BY m DESC, custkey) AS BIGINT) AS m_tile "
            "FROM agg)"
        ),
        "events_path_trigrams": (
            "WITH o AS (SELECT user_id, event_type, "
            "lag(event_type, 1) OVER w AS p1, "
            "lag(event_type, 2) OVER w AS p2 FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT p2 AS t1, p1 AS t2, event_type AS t3, "
            "CAST(count(*) AS BIGINT) AS n FROM o "
            "WHERE p2 IS NOT NULL GROUP BY 1, 2, 3"
        ),
        "promo_revenue": (
            # Q14 shape; both sums exact int cents, one final division
            "SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN "
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT)) ELSE 0 END) / "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))), 6) AS promo_pct "
            "FROM lineitem JOIN part ON p_partkey = l_partkey"
        ),
        "orders_active_backlog": (
            # same difference-array technique in SQL: per-day deltas, then
            # a cumulative window over event days — exact ints throughout
            "WITH d AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, "
            "1 AS delta FROM orders UNION ALL "
            "SELECT strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d'), -1 "
            "FROM orders), "
            "g AS (SELECT day, CAST(sum(delta) AS BIGINT) AS delta FROM d "
            "GROUP BY 1) "
            "SELECT day, CAST(sum(delta) OVER (ORDER BY day "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_active FROM g"
        ),
        "bloom_filtered_revenue": (
            # bit-equal to the plain semi-join (the bloom only prunes)
            "SELECT coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT))), 0) / 10000.0 "
            "AS revenue, CAST(count(*) AS BIGINT) AS n_rows "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "WHERE o_orderpriority = '1-URGENT'"
        ),
        "basket_jaccard_pairs": (
            # exact set-similarity join; threshold as exact ints
            # (100*i >= 50*(n1+n2-i)); jaccard = i/union rounded 6
            "WITH b AS (SELECT l_orderkey AS o, l_partkey AS p "
            "FROM lineitem GROUP BY 1, 2), "
            "sz AS (SELECT o, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1), "
            "inter AS (SELECT a.o AS o1, c.o AS o2, "
            "CAST(count(*) AS BIGINT) AS i FROM b a "
            "JOIN b c ON a.p = c.p AND a.o < c.o GROUP BY 1, 2) "
            "SELECT o1, o2, i AS isect, "
            "round(i * 1.0 / (n1.n + n2.n - i), 6) AS jaccard "
            "FROM inter JOIN sz n1 ON n1.o = o1 JOIN sz n2 ON n2.o = o2 "
            "WHERE 100 * i >= 50 * (n1.n + n2.n - i)"
        ),
        "name_near_pairs": (
            "SELECT a.name AS name_a, b.name AS name_b FROM "
            "(SELECT DISTINCT p_name AS name FROM part) a JOIN "
            "(SELECT DISTINCT p_name AS name FROM part) b ON a.name < b.name "
            "WHERE levenshtein(a.name, b.name) <= 1"
        ),
        "events_props_stats": (
            # JSON field extraction; avg = one IEEE division of exact ints
            "SELECT event_type, count(*) AS n, "
            "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) "
            "AS sum_k, "
            "round(sum(CAST(json_extract(props, '$.k') AS BIGINT)) * 1.0 "
            "/ count(*), 6) AS avg_k "
            "FROM events WHERE json_extract(props, '$.k') IS NOT NULL "
            "GROUP BY 1"
        ),
        "parts_skyline": (
            # Pareto frontier by NOT EXISTS dominance (min price, min size)
            "SELECT p_partkey, p_retailprice, p_size FROM part p "
            "WHERE NOT EXISTS (SELECT 1 FROM part q WHERE "
            "q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size "
            "AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))"
        ),
        "events_daily_delta": (
            # aggregate-then-window; int-cent totals, delta as int
            # difference, the /100.0 divisions are the only float ops
            "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
            "sum(CAST(round(value * 100) AS BIGINT)) AS c FROM events "
            "GROUP BY 1, 2) "
            "SELECT event_type, day, c / 100.0 AS day_value, "
            "coalesce(c - lag(c) OVER (PARTITION BY event_type ORDER BY day), "
            "0) / 100.0 AS delta_value FROM d"
        ),
        "events_ntile": (
            "SELECT event_id, ntile(4) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS tile FROM events"
        ),
        "user_first_last": (
            "WITH o AS (SELECT user_id, value, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS rf, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, "
            "event_id DESC) AS rl FROM events) "
            "SELECT user_id, max(CASE WHEN rf = 1 THEN value END) "
            "AS first_value, max(CASE WHEN rl = 1 THEN value END) "
            "AS last_value, count(*) AS n_events FROM o GROUP BY 1"
        ),
        "waiting_suppliers": (
            # Q21 shape: distinct (order, supplier, any-R) pairs; a supplier
            # waits on an order iff it returned, no other supplier returned,
            # and the order had >= 2 distinct suppliers
            "WITH pairs AS (SELECT l_orderkey, l_suppkey, "
            "max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r "
            "FROM lineitem GROUP BY 1, 2), "
            "agg AS (SELECT l_orderkey, count(*) AS nsupp, sum(has_r) AS nr "
            "FROM pairs GROUP BY 1) "
            "SELECT l_suppkey, count(*) AS numwait FROM pairs "
            "JOIN agg USING (l_orderkey) "
            "WHERE has_r = 1 AND nr = 1 AND nsupp >= 2 GROUP BY 1"
        ),
        "sales_opportunity": (
            # Q22 shape: above-average predicate in exact ints
            # (c100*n > S100), no-RECENT-orders anti-join, per-nation rollup
            "WITH g AS (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) "
            "AS s100, count(*) AS n FROM customer WHERE c_acctbal > 0) "
            "SELECT c_nationkey, count(*) AS numcust, "
            "sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal "
            "FROM customer, g "
            "WHERE CAST(round(c_acctbal * 100) AS BIGINT) * g.n > g.s100 "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND o_orderdate >= TIMESTAMP '2000-06-01') GROUP BY 1"
        ),
        "events_cumsum": (
            # running sum as exact int cents (values carry 2 decimals) so
            # the window's summation order can't produce float ulp drift
            "SELECT event_id, "
            "sum(CAST(round(value * 100) AS BIGINT)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) / 100.0 AS cum_value FROM events"
        ),
        "succ_reciprocity": (
            # same successor-edge CTE as scc_parts; reciprocity = fraction
            # of distinct directed edges whose reverse edge exists
            "WITH seq AS (SELECT l_orderkey, l_linenumber, l_partkey, "
            "lag(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) "
            "AS prev FROM lineitem WHERE l_quantity <= 8), "
            "edges AS (SELECT DISTINCT prev AS src, l_partkey AS dst FROM seq "
            "WHERE prev IS NOT NULL AND prev <> l_partkey) "
            "SELECT count(*) AS n_edges, count(r.src) AS n_recip, "
            "round(count(r.src) * 1.0 / count(*), 6) AS reciprocity "
            "FROM edges e LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src"
        ),
        "events_percent_rank": (
            # same IEEE division (rank-1)*1.0/(n-1); round 6 half-away
            "SELECT event_id, round(CASE WHEN n = 1 THEN 0.0 "
            "ELSE (r - 1) * 1.0 / (n - 1) END, 6) AS pr FROM ("
            "SELECT event_id, rank() OVER w AS r, "
            "count(*) OVER (PARTITION BY user_id) AS n FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY value)) "
            "ORDER BY event_id"
        ),
        "events_retention": (
            # cohort = first active day; n_users = distinct cohort users
            # active at each day offset; int epoch-day columns both sides
            "WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort "
            "FROM events GROUP BY 1), "
            "a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events) "
            "SELECT CAST(datediff('day', DATE '1970-01-01', f.cohort) AS BIGINT) "
            "AS cohort_day, "
            "CAST(datediff('day', f.cohort, a.day) AS BIGINT) AS offset_days, "
            "count(*) AS n_users "
            "FROM a JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "events_funnel": (
            # windowed first-touch funnel: each stage's first event strictly
            # after — and within 48 h of — the previous stage's first
            # qualifying event
            "WITH u AS (SELECT DISTINCT user_id FROM events), "
            "s1 AS (SELECT user_id, min(ts) AS t FROM events "
            "WHERE event_type = 'signup' GROUP BY 1), "
            "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN s1 ON s1.user_id = e.user_id "
            "WHERE e.event_type = 'view' AND e.ts > s1.t "
            "AND epoch_us(e.ts) - epoch_us(s1.t) <= 172800000000 GROUP BY 1), "
            "s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN s2 ON s2.user_id = e.user_id "
            "WHERE e.event_type = 'click' AND e.ts > s2.t "
            "AND epoch_us(e.ts) - epoch_us(s2.t) <= 172800000000 GROUP BY 1), "
            "s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN s3 ON s3.user_id = e.user_id "
            "WHERE e.event_type = 'purchase' AND e.ts > s3.t "
            "AND epoch_us(e.ts) - epoch_us(s3.t) <= 172800000000 GROUP BY 1) "
            "SELECT u.user_id, "
            "CASE WHEN s1.t IS NULL THEN 0 ELSE 1 END + "
            "CASE WHEN s2.t IS NULL THEN 0 ELSE 1 END + "
            "CASE WHEN s3.t IS NULL THEN 0 ELSE 1 END + "
            "CASE WHEN s4.t IS NULL THEN 0 ELSE 1 END AS steps_completed "
            "FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) "
            "LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id) "
            "ORDER BY u.user_id"
        ),
        "scc_parts": (
            # SCC of the directed part-successor graph: mutual-reachability
            # via a recursive transitive closure, scc = min member vid —
            # exactly SCCProgram's min-label FW-BW peeling invariant
            "WITH seq AS (SELECT l_orderkey, l_linenumber, l_partkey, "
            "lag(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) "
            "AS prev FROM lineitem WHERE l_quantity <= 8), "
            "edges AS (SELECT DISTINCT prev AS src, l_partkey AS dst FROM seq "
            "WHERE prev IS NOT NULL AND prev <> l_partkey), "
            "verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges), "
            "reach AS (WITH RECURSIVE r(u, v) AS ("
            "SELECT v, v FROM verts "
            "UNION "
            "SELECT r.u, e.dst FROM r JOIN edges e ON r.v = e.src) "
            "SELECT u, v FROM r) "
            "SELECT a.u AS vid, MIN(a.v) AS scc FROM reach a "
            "JOIN reach b ON a.u = b.v AND a.v = b.u "
            "GROUP BY a.u ORDER BY vid"
        ),
        "bowtie_parts": (
            # bow-tie classes over the same part-successor closure: core =
            # largest SCC (ties → smaller label); in reaches it, out is
            # reached from it (any member ⇔ the core's min-member seed)
            "WITH seq AS (SELECT l_orderkey, l_linenumber, l_partkey, "
            "lag(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) "
            "AS prev FROM lineitem WHERE l_quantity <= 8), "
            "edges AS (SELECT DISTINCT prev AS src, l_partkey AS dst FROM seq "
            "WHERE prev IS NOT NULL AND prev <> l_partkey), "
            "verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges), "
            "reach AS MATERIALIZED (WITH RECURSIVE r(u, v) AS ("
            "SELECT v, v FROM verts "
            "UNION "
            "SELECT r.u, e.dst FROM r JOIN edges e ON r.v = e.src) "
            "SELECT u, v FROM r), "
            "sccs AS MATERIALIZED (SELECT a.u AS vid, MIN(a.v) AS scc "
            "FROM reach a JOIN reach b ON a.u = b.v AND a.v = b.u GROUP BY a.u), "
            "core AS (SELECT scc AS cid FROM ("
            "SELECT scc, count(*) AS c FROM sccs GROUP BY scc) "
            "ORDER BY c DESC, scc ASC LIMIT 1) "
            "SELECT s.vid, CASE "
            "WHEN s.scc = (SELECT cid FROM core) THEN 'core' "
            "WHEN EXISTS (SELECT 1 FROM reach r WHERE r.u = s.vid "
            "AND r.v = (SELECT cid FROM core)) THEN 'in' "
            "WHEN EXISTS (SELECT 1 FROM reach r WHERE r.v = s.vid "
            "AND r.u = (SELECT cid FROM core)) THEN 'out' "
            "ELSE 'other' END AS cls "
            "FROM sccs s ORDER BY vid"
        ),
        "salient_terms": (
            # TF-IDF-style keyword top-3 (textops.salient_terms); salience is
            # division-only over exact ints → bit-identical, total tie-break
            "WITH toks AS MATERIALIZED (SELECT doc_id, "
            "unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) "
            "AS term FROM documents), "
            "tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf "
            "FROM toks GROUP BY 1, 2), "
            "dl AS (SELECT doc_id, count(*) AS doc_len FROM toks GROUP BY 1), "
            "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1), "
            "nn AS (SELECT count(*) AS n FROM documents), "
            "s AS (SELECT tf.doc_id, tf.term, "
            "(CAST(tf.tf AS DOUBLE) / CAST(dl.doc_len AS DOUBLE)) / "
            "(CAST(df.df AS DOUBLE) / CAST(nn.n AS DOUBLE)) AS salience "
            "FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN nn) "
            "SELECT doc_id, term, CAST(rank AS BIGINT) AS rank, salience FROM ("
            "SELECT *, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY salience DESC, term) AS rank FROM s) WHERE rank <= 3"
        ),
        "bm25_topk": (
            # Okapi BM25 with the engine's exact expression tree: idf =
            # ln(1+(N-df+0.5)/(df+0.5)); tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl))
            # with k1=1.2, b=0.75 as the same double literals; N/avgdl from
            # exact int sums; rank on the ROUNDED score (doc_id tie-break)
            "WITH toks AS MATERIALIZED (SELECT doc_id, "
            "unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) "
            "AS term FROM documents), "
            "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1), "
            "stats AS (SELECT count(*) AS n, sum(dl) AS s FROM dl), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
            f"WHERE term IN {SEARCH_TERMS!r} GROUP BY 1, 2), "
            "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), "
            "sc AS (SELECT tf.doc_id, "
            "sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5)) * "
            "(tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * "
            "(dl.dl / (stats.s * 1.0 / stats.n))))) AS sc "
            "FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats "
            "GROUP BY tf.doc_id), "
            "r AS (SELECT doc_id, round(sc, 6) AS score, row_number() OVER "
            "(ORDER BY round(sc, 6) DESC, doc_id) AS rank FROM sc) "
            "SELECT doc_id, score, rank FROM r WHERE rank <= 10"
        ),
        "search_topk": (
            # MaxSim-style inverted-index search (textops.search_topk): max
            # and count are order-free, saliences division-only → bit-exact;
            # doc_id tie-break makes the k-cut total
            "WITH toks AS MATERIALIZED (SELECT doc_id, "
            "unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) "
            "AS term FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
            f"WHERE term IN {SEARCH_TERMS!r} GROUP BY 1, 2), "
            "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1), "
            "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), "
            "nn AS (SELECT count(*) AS n FROM documents), "
            "s AS (SELECT tf.doc_id, "
            "(CAST(tf.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE)) / "
            "(CAST(df.df AS DOUBLE) / CAST(nn.n AS DOUBLE)) AS sal "
            "FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN nn) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched, "
            "max(sal) AS max_salience FROM s GROUP BY doc_id "
            "ORDER BY n_matched DESC, max_salience DESC, doc_id LIMIT 10"
        ),
        "events_range_join": (
            # pure time-range join, exact int-cents sums (relational.py
            # events_range_join) — the engine's bucketed form must equal the
            # oracle's O(n²) nested-loop form exactly
            "SELECT a.event_id, CAST(count(b.event_id) AS BIGINT) AS n_prior, "
            "coalesce(sum(CAST(round(b.value * 100) AS BIGINT)), 0) / 100.0 "
            "AS sum_prior "
            "FROM events a LEFT JOIN events b ON b.event_type = 'click' "
            "AND b.ts >= a.ts - INTERVAL 600 SECOND AND b.ts < a.ts "
            "WHERE a.event_type = 'purchase' GROUP BY a.event_id"
        ),
        "hll_registers_daily": (
            # bit-exact HLL register replay (pipelines/sketch.py): hash =
            # md5_number_lower ≡ md5_lower64, bucket = top 8 bits, register
            # = CLZ of the low 56 bits + 1 via length(bin(x)), merged by max
            "WITH h AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "md5_number_lower(CAST(user_id AS VARCHAR)) AS h FROM events), "
            "b AS (SELECT day, h // 72057594037927936 AS bucket, "
            "h % 72057594037927936 AS low FROM h) "
            "SELECT CAST(day AS BIGINT) AS day, CAST(bucket AS BIGINT) AS bucket, "
            "CAST(max(CASE WHEN low = 0 THEN 57 "
            "ELSE 57 - length(bin(low)) END) AS BIGINT) AS register "
            "FROM b GROUP BY day, bucket"
        ),
        "approx_distinct_users_daily": (
            # the HLL estimator replayed over the (independently
            # hash-checked) registers: harmonic mean of 2^-register over
            # all 256 registers (absent rows are zeros → 2^0 = 1 each),
            # Flajolet alpha_256, linear-counting small-range branch.
            # Both sides round(4) half-away: numpy vs DuckDB libm drift
            # is ~1e-12 relative (measured 11/30 days differ pre-round),
            # 10 orders below the rounding grid — bit-exact after round.
            "WITH h AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "md5_number_lower(CAST(user_id AS VARCHAR)) AS h FROM events), "
            "b AS (SELECT day, h // 72057594037927936 AS bucket, "
            "h % 72057594037927936 AS low FROM h), "
            "regs AS (SELECT day, bucket, "
            "max(CASE WHEN low = 0 THEN 57 ELSE 57 - length(bin(low)) END) "
            "AS register FROM b GROUP BY day, bucket), "
            "agg AS (SELECT day, sum(power(2.0, -register)) AS s, "
            "count(*) AS nb FROM regs GROUP BY day), "
            "est AS (SELECT day, "
            "(0.7213/(1.0 + 1.079/256.0)) * 65536.0 / (s + (256.0 - nb)) "
            "AS raw, 256 - nb AS zeros FROM agg) "
            "SELECT CAST(day AS BIGINT) AS day, "
            "round(CASE WHEN raw <= 640.0 AND zeros > 0 "
            "THEN 256.0 * ln(256.0 / zeros) ELSE raw END, 4) "
            "AS approx_distinct FROM est"
        ),
        # host_graph / anchor_index / host_rank: DuckDB replays the href
        # regex extraction + aggregation (+ directed-PR unroll) over the
        # byte-identical deterministic pages parquet (see
        # _pages_oracle_sqls / _pages_oracle_parquet).
        **_pages_oracle_sqls(),
        "edge_cut_parts": (
            # the engine's partitioner is vid % P on non-negative part keys,
            # so SQL % replays it exactly; both sides aggregate only over
            # OBSERVED parts and divide exact int64s once
            f"WITH {_ESYM_MAT}, "
            "pp AS (SELECT unnest([4, 8, 16, 32]) AS p), "
            "l AS (SELECT pp.p, e.src % pp.p AS part, "
            "count(*) AS n, sum(CASE WHEN e.src % pp.p <> e.dst % pp.p "
            "THEN 1 ELSE 0 END) AS cut FROM e, pp GROUP BY 1, 2) "
            "SELECT CAST(p AS BIGINT) AS num_parts, "
            "CAST(sum(n) AS BIGINT) AS n_edges, "
            "CAST(sum(cut) AS BIGINT) AS n_cut, "
            "round(CAST(sum(cut) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) "
            "AS cut_fraction, "
            "CAST(max(n) AS BIGINT) AS max_part_edges, "
            "CAST(min(n) AS BIGINT) AS min_part_edges, "
            "round(CAST(max(n) * p AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) "
            "AS imbalance FROM l GROUP BY p"
        ),
        "dsir_weights": (
            # DSIR replay: same lowercase space-split tokens + adjacent
            # bigrams, same md5_number_lower % B buckets, same Laplace
            # log-ratio quantized to integer micro-nats (round(x, 0) is
            # half-away on both sides), so the per-doc reduction is an
            # exact BIGINT sum; ONE trailing division by 10⁶ each side
            "WITH t0 AS MATERIALIZED (SELECT doc_id, lang, "
            "unnest(list_filter(string_split(lower(text), ' '), "
            "x -> x <> '')) AS tok, "
            "generate_subscripts(list_filter(string_split(lower(text), ' '), "
            "x -> x <> ''), 1) AS pos FROM documents), "
            "f AS MATERIALIZED (SELECT doc_id, lang, "
            "CAST(md5_number_lower(tok) % 4096 AS BIGINT) AS b FROM ("
            "SELECT doc_id, lang, tok FROM t0 "
            "UNION ALL "
            "SELECT a.doc_id, a.lang, a.tok || ' ' || b.tok AS tok "
            "FROM t0 a JOIN t0 b ON b.doc_id = a.doc_id "
            "AND b.pos = a.pos + 1)), "
            "cr AS MATERIALIZED (SELECT b, count(*) AS c FROM f GROUP BY 1), "
            "ct AS MATERIALIZED (SELECT b, count(*) AS c FROM f "
            "WHERE lang = 'en' GROUP BY 1), "
            "tot AS (SELECT (SELECT sum(c) FROM cr) AS r, "
            "(SELECT coalesce(sum(c), 0) FROM ct) AS t), "
            "w AS MATERIALIZED (SELECT cr.b, CAST(round(1000000.0 * ("
            "ln((coalesce(ct.c, 0) + 1) / CAST((SELECT t FROM tot) + 4096 "
            "AS DOUBLE)) - "
            "ln((cr.c + 1) / CAST((SELECT r FROM tot) + 4096 AS DOUBLE))"
            "), 0) AS BIGINT) AS wi FROM cr LEFT JOIN ct ON ct.b = cr.b) "
            "SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats, "
            "CAST(sum(w.wi) AS DOUBLE) / 1000000.0 AS dsir_logw "
            "FROM f JOIN w ON w.b = f.b GROUP BY 1"
        ),
        "graph_summary": (
            # degrees over the symmetrized pairs; both ratios ONE IEEE
            # division of exact int64s (sum(d) = 2E, V(V-1) < 2^53)
            f"WITH {_ESYM_MAT}, "
            "deg AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS d "
            "FROM e GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_vertices, "
            "CAST(sum(d) // 2 AS BIGINT) AS n_edges, "
            "round(CAST(sum(d) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) "
            "AS avg_degree, "
            "CAST(max(d) AS BIGINT) AS max_degree, "
            "round(CAST(sum(d) AS DOUBLE) / "
            "CAST(count(*) * (count(*) - 1) AS DOUBLE), 6) AS density "
            "FROM deg"
        ),
        "transitivity_copurchase": (
            # W = Σ C(d,2) int64-exact; T = the triangle_count 3-join;
            # transitivity = 3T/W in ONE IEEE division
            f"WITH {_ESYM_MAT}, "
            "deg AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS d "
            "FROM e GROUP BY 1), "
            "w AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS w FROM deg), "
            "t AS (SELECT CAST(count(*) AS BIGINT) AS t FROM e e1 "
            "JOIN e e2 ON e2.src = e1.dst AND e2.dst > e1.dst "
            "JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst "
            "WHERE e1.src < e1.dst) "
            "SELECT w.w AS n_wedges, t.t AS n_triangles, "
            "round(CAST(3 * t.t AS DOUBLE) / CAST(w.w AS DOUBLE), 6) "
            "AS transitivity FROM w, t"
        ),
        "stratified_sample": (
            # salted-md5 total order (ties → doc_id, though md5 ties are
            # astronomically unlikely) replayed with row_number
            "SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn FROM ("
            "SELECT lang, doc_id, row_number() OVER (PARTITION BY lang "
            "ORDER BY md5_number_lower('sample:' || CAST(doc_id AS VARCHAR)), "
            "doc_id) AS rn FROM documents) WHERE rn <= 20"
        ),
        "quality_mixture_report": (
            # the unigram_quality chain (identical CTEs — both mean_relfreq
            # ratios are ONE IEEE division of exact int64s, so the global
            # rank over (mean_relfreq, doc_id) is the same total order),
            # then integer decile (rk*10)//n and a source cross-tab
            f"WITH {tok_cte}, "
            "tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2), "
            "dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1), "
            "cf AS (SELECT tok, count(*) AS f FROM tok GROUP BY 1), "
            "tot AS (SELECT count(*) AS t FROM tok), "
            "agg AS (SELECT tf.doc_id, CAST(sum(tf.tf * cf.f) AS BIGINT) AS num "
            "FROM tf JOIN cf USING (tok) GROUP BY 1), "
            "q AS (SELECT dl.doc_id, dl.n AS n_tokens, "
            "agg.num * 1.0 / (dl.n * (SELECT t FROM tot)) AS mean_relfreq "
            "FROM dl JOIN agg USING (doc_id)), "
            "r AS (SELECT doc_id, n_tokens, "
            "row_number() OVER (ORDER BY mean_relfreq, doc_id) - 1 AS rk, "
            "count(*) OVER () AS n FROM q) "
            "SELECT d.source, CAST((r.rk * 10) // r.n AS BIGINT) AS decile, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(r.n_tokens) AS BIGINT) AS n_tokens "
            "FROM r JOIN documents d USING (doc_id) GROUP BY 1, 2"
        ),
        "session_depth_histogram": (
            # the bounce_rate_daily session CTEs, folded by depth instead
            "WITH x AS (SELECT user_id, ts, event_id, "
            "CASE WHEN lag(ts) OVER w IS NULL OR "
            f"epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_SEC} * 1000000 "
            "THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "y AS (SELECT *, sum(brk) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sess FROM x), "
            "s AS (SELECT user_id, sess, count(*) ne FROM y GROUP BY 1, 2) "
            "SELECT CAST(ne AS BIGINT) AS n_events_in_session, "
            "CAST(count(*) AS BIGINT) AS n_sessions FROM s GROUP BY 1"
        ),
        "lsh_bucket_histogram": (
            # the _minhash_ctes signature replay up to bsig (same shingles,
            # permutations, band grouping — sig-list equality ≡ the engine's
            # collision-free fold), then the occupancy log2 census;
            # log2/floor of exact ints < 2^53 are exact IEEE ops
            f"WITH {_minhash_bsig_ctes()} , "
            "sizes AS (SELECT band, sig, CAST(count(*) AS BIGINT) AS s "
            "FROM bsig GROUP BY 1, 2) "
            "SELECT CAST(floor(log2(s)) AS BIGINT) AS size_bucket, "
            "CAST(count(*) AS BIGINT) AS n_buckets, "
            "CAST(sum(s) AS BIGINT) AS n_entries FROM sizes GROUP BY 1"
        ),
        "match_diamond_strong": (
            # ordered non-induced diamond (K4 − edge) embeddings on the
            # adaptive strong graph; the only non-adjacent query pair (c, d)
            # carries the explicit injectivity predicate
            f"WITH {_ESTRONG} "
            "SELECT count(*) AS n_embeddings FROM e ab "
            "JOIN e ac ON ac.src = ab.src "
            "JOIN e ad ON ad.src = ab.src "
            "JOIN e bc ON bc.src = ab.dst AND bc.dst = ac.dst "
            "JOIN e bd ON bd.src = ab.dst AND bd.dst = ad.dst "
            "WHERE ac.dst <> ad.dst"
        ),
        "match_tailed_tri_strong": (
            # ordered non-induced tailed-triangle embeddings (triangle abc +
            # pendant d on a); d's two non-adjacent pairs carry the
            # injectivity predicates
            f"WITH {_ESTRONG} "
            "SELECT count(*) AS n_embeddings FROM e ab "
            "JOIN e bc ON bc.src = ab.dst "
            "JOIN e ca ON ca.src = bc.dst AND ca.dst = ab.src "
            "JOIN e ad ON ad.src = ab.src "
            "WHERE ad.dst <> ab.dst AND ad.dst <> bc.dst"
        ),
        "match_k4_labeled": (
            # ordered labeled K4 embeddings on the mod-5 induced co-purchase
            # subgraph; labels 0/1/2/0 — the only same-label pair (a, d)
            # needs the explicit injectivity predicate, every other pair is
            # forced distinct by its adjacency (no self-loops in e)
            "WITH e AS MATERIALIZED (SELECT a.l_partkey AS src, "
            "b.l_partkey AS dst "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            f"WHERE a.l_partkey <> b.l_partkey AND a.l_partkey % {K4_MOD} = 0 "
            f"AND b.l_partkey % {K4_MOD} = 0 GROUP BY 1, 2), "
            "lab AS MATERIALIZED (SELECT p_partkey AS vid, p_size % 3 AS l "
            "FROM part) "
            "SELECT count(*) AS n_embeddings FROM e ab "
            "JOIN e ac ON ac.src = ab.src "
            "JOIN e ad ON ad.src = ab.src "
            "JOIN e bc ON bc.src = ab.dst AND bc.dst = ac.dst "
            "JOIN e bd ON bd.src = ab.dst AND bd.dst = ad.dst "
            "JOIN e cd ON cd.src = ac.dst AND cd.dst = ad.dst "
            "JOIN lab la ON la.vid = ab.src AND la.l = 0 "
            "JOIN lab lb ON lb.vid = ab.dst AND lb.l = 1 "
            "JOIN lab lc ON lc.vid = ac.dst AND lc.l = 2 "
            "JOIN lab ld ON ld.vid = ad.dst AND ld.l = 0 "
            "WHERE ab.src <> ad.dst"
        ),
        "densest_subgraph_copurchase": _densest_sql(),
        "minhash_calibration": _minhash_calibration_sql(),
        "rake_keywords": _rake_sql(),
        "influence_seeds_copurchase": _degdiscount_sql(),
        "mst_copurchase": _boruvka_sql(),
        "degree_powerlaw_mle": (
            # CSN eq. 3.7 over the symmetric degree table; ln-sum noise ≪
            # round-6 and α = 1 + n/s shares the operand tree
            f"WITH {_ESYM_MAT}, "
            "dg AS (SELECT src, count(*) AS d FROM e GROUP BY 1), "
            "t AS (SELECT count(*) AS n, sum(ln(d / 4.5)) AS s FROM dg "
            "WHERE d >= 5) "
            "SELECT CAST(5 AS BIGINT) AS xmin, CAST(n AS BIGINT) AS n_tail, "
            "round(CASE WHEN s > 0 THEN 1.0 + n / s ELSE 0.0 END, 6) AS alpha "
            "FROM t"
        ),
        "adamic_adar_copurchase": (
            # hub-degree-weighted wedges over the SAME strong-graph CTEs as
            # link_prediction; 1/ln sums fold in arbitrary order ≪ round-6
            f"WITH {_ESTRONG}, "
            "eu2 AS (SELECT src, dst FROM e WHERE src < dst), "
            "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS dg FROM e "
            "GROUP BY 1), "
            "aa AS MATERIALIZED (SELECT a.src AS u, b.src AS v, "
            "sum(1.0 / ln(dz.dg)) AS aa FROM e a "
            "JOIN e b ON a.dst = b.dst AND a.src < b.src "
            "JOIN deg dz ON dz.vid = a.dst GROUP BY 1, 2) "
            "SELECT eu2.src, eu2.dst, round(coalesce(aa.aa, 0), 6) AS aa "
            "FROM eu2 LEFT JOIN aa ON aa.u = eu2.src AND aa.v = eu2.dst"
        ),
        "resource_allocation_copurchase": (
            # 1/deg wedge weights over the SAME strong-graph CTEs as
            # adamic_adar; float fold order ≪ round-6
            f"WITH {_ESTRONG}, "
            "eu2 AS (SELECT src, dst FROM e WHERE src < dst), "
            "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS dg FROM e "
            "GROUP BY 1), "
            "ra AS MATERIALIZED (SELECT a.src AS u, b.src AS v, "
            "sum(1.0 / dz.dg) AS ra FROM e a "
            "JOIN e b ON a.dst = b.dst AND a.src < b.src "
            "JOIN deg dz ON dz.vid = a.dst GROUP BY 1, 2) "
            "SELECT eu2.src, eu2.dst, round(coalesce(ra.ra, 0), 6) AS ra "
            "FROM eu2 LEFT JOIN ra ON ra.u = eu2.src AND ra.v = eu2.dst"
        ),
        "kcenter_coreset": _kcenter_sql(),
        "orders_profile": (
            # per-column n/distinct/min/max normalized to DOUBLE (dates as
            # epoch days); engine distinct = md5-free exact value dedup
            "SELECT 'o_custkey' AS col, CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct, "
            "CAST(min(o_custkey) AS DOUBLE) AS min_val, "
            "CAST(max(o_custkey) AS DOUBLE) AS max_val FROM orders "
            "UNION ALL SELECT 'o_orderdate', count(*), "
            "count(DISTINCT o_orderdate), "
            "CAST(min(epoch_us(o_orderdate) // 86400000000) AS DOUBLE), "
            "CAST(max(epoch_us(o_orderdate) // 86400000000) AS DOUBLE) "
            "FROM orders "
            "UNION ALL SELECT 'o_orderkey', count(*), "
            "count(DISTINCT o_orderkey), CAST(min(o_orderkey) AS DOUBLE), "
            "CAST(max(o_orderkey) AS DOUBLE) FROM orders "
            "UNION ALL SELECT 'o_totalprice', count(*), "
            "count(DISTINCT o_totalprice), CAST(min(o_totalprice) AS DOUBLE), "
            "CAST(max(o_totalprice) AS DOUBLE) FROM orders"
        ),
        "granger_daily": _granger_sql(),
        "markov_attribution": _markov_attr_sql(),
        "shapley_attribution": _shapley_attr_sql(),
        "quality_geometry_corr": (
            # compose the doc_cross_entropy and embedding_outliers score
            # CTEs (both ROUND-6, the same values their own oracles check),
            # join on doc_id ↔ vec_id, fold float Pearson moments
            f"WITH tok AS (SELECT doc_id, unnest({toks}) AS token "
            "FROM documents WHERE trim(text) <> ''), "
            "dt AS (SELECT doc_id, token, count(*) AS k FROM tok GROUP BY 1, 2), "
            "wcnt AS (SELECT token, CAST(sum(k) AS BIGINT) AS c FROM dt "
            "GROUP BY token), "
            "wtot AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM dt), "
            "ce AS (SELECT dt.doc_id, "
            "round(sum(dt.k * -ln(wcnt.c / (SELECT n FROM wtot))) / sum(dt.k), 6) "
            "AS x FROM dt JOIN wcnt ON wcnt.token = dt.token GROUP BY dt.doc_id), "
            "ex AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim, "
            "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings), "
            "em AS (SELECT dim, count(*) AS n, sum(v) AS s, sum(v * v) AS ss "
            "FROM ex GROUP BY 1), "
            "est AS (SELECT dim, s / n AS mu, "
            "sqrt(ss / n - (s / n) * (s / n)) AS sigma FROM em), "
            "d2 AS (SELECT ex.vec_id, round(sum(CASE WHEN est.sigma > 0 THEN "
            "((ex.v - est.mu) / est.sigma) * ((ex.v - est.mu) / est.sigma) "
            "ELSE 0 END), 6) AS y FROM ex JOIN est USING (dim) GROUP BY 1), "
            "j AS (SELECT ce.x, d2.y FROM ce JOIN d2 ON d2.vec_id = ce.doc_id), "
            "m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
            "sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM j) "
            "SELECT CAST(n AS BIGINT) AS n, "
            "round(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0 "
            "THEN (n * sxy - sx * sy) / "
            "sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) ELSE 0 END, 6) "
            "AS r FROM m"
        ),
        "knn_source_purity": (
            # the knn_label_vote ranking (rounded cos DESC, nbr_id) with
            # source agreement instead of the label vote
            "WITH s AS (SELECT a.vec_id, b.vec_id AS nbr_id, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cos "
            "FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY vec_id "
            "ORDER BY cos DESC, nbr_id) AS rank FROM s), "
            "p AS (SELECT r.vec_id, "
            "sum(CASE WHEN dn.source = dq.source THEN 1 ELSE 0 END) / 5 "
            "AS share FROM r JOIN documents dn ON dn.doc_id = r.nbr_id "
            "JOIN documents dq ON dq.doc_id = r.vec_id "
            "WHERE r.rank <= 5 GROUP BY 1), "
            "j AS (SELECT dq.source, p.share FROM p "
            "JOIN documents dq ON dq.doc_id = p.vec_id) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_vecs, "
            "round(sum(share) / count(*), 6) AS purity FROM j GROUP BY 1"
        ),
        "source_centroid_shift": (
            # centroids as Σ/n per (source, dim); the corpus centroid is
            # the same sums' grand fold — one shared operand tree
            "WITH j AS (SELECT d.source, e.embedding FROM embeddings e "
            "JOIN documents d ON d.doc_id = e.vec_id), "
            "x AS (SELECT source, generate_subscripts(embedding, 1) - 1 "
            "AS dim, CAST(unnest(embedding) AS DOUBLE) AS v FROM j), "
            "sc AS (SELECT source, dim, sum(v) AS s, count(*) AS n FROM x "
            "GROUP BY 1, 2), "
            "tot AS (SELECT dim, sum(s) AS s, sum(n) AS n FROM sc GROUP BY 1), "
            "dist AS (SELECT sc.source, "
            "sum((sc.s / sc.n - tot.s / tot.n) * "
            "(sc.s / sc.n - tot.s / tot.n)) AS d2, max(sc.n) AS n "
            "FROM sc JOIN tot USING (dim) GROUP BY 1) "
            "SELECT source, CAST(n AS BIGINT) AS n_docs, "
            "round(sqrt(d2), 6) AS centroid_shift FROM dist"
        ),
        "dow_seasonal_index": (
            # centered 7-day MA over the DENSE day series (missing days 0,
            # 3 edge days dropped each side); integer-valued count sums are
            # order-exact, the ratio means round-6
            "WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "count(*) AS n FROM events GROUP BY 1), "
            "b AS (SELECT min(day) AS lo, max(day) AS hi FROM d), "
            "cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b), "
            "dd AS (SELECT cal.day, coalesce(d.n, 0) AS n FROM cal "
            "LEFT JOIN d USING (day)), "
            "w AS (SELECT day, n, avg(n) OVER (ORDER BY day "
            "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ma, "
            "row_number() OVER (ORDER BY day) AS rn, count(*) OVER () AS m "
            "FROM dd), "
            "r AS (SELECT (day + 3) % 7 + 1 AS isodow, n / ma AS ratio "
            "FROM w WHERE rn > 3 AND rn <= m - 3 AND ma > 0) "
            "SELECT CAST(isodow AS BIGINT) AS isodow, "
            "CAST(count(*) AS BIGINT) AS n_days, "
            "round(sum(ratio) / count(*), 6) AS seasonal_index "
            "FROM r GROUP BY 1"
        ),
        "disparity_filter": (
            # p = (1 − w/s)^(k−1) per direction with per-vertex (s, k) from
            # the same symmetric rows; keep on the ROUNDED p (tau posture);
            # numpy power and DuckDB power share libm on this platform
            "WITH we AS MATERIALIZED (SELECT a.l_partkey AS src, "
            "b.l_partkey AS dst, count(DISTINCT a.l_orderkey) AS w "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2), "
            "sym AS MATERIALIZED (SELECT src, dst, w FROM we "
            "UNION ALL SELECT dst, src, w FROM we), "
            "st AS MATERIALIZED (SELECT src, CAST(sum(w) AS DOUBLE) AS s, "
            "count(*) AS k FROM sym GROUP BY 1), "
            "p AS (SELECT least(sym.src, sym.dst) AS u, "
            "greatest(sym.src, sym.dst) AS v, sym.w, "
            "round(power(1.0 - sym.w / st.s, st.k - 1.0), 6) AS p "
            "FROM sym JOIN st ON st.src = sym.src) "
            "SELECT u AS src, v AS dst, CAST(min(w) AS BIGINT) AS n_orders, "
            "min(p) AS p_min, min(p) < 0.05 AS keep FROM p GROUP BY 1, 2"
        ),
        "edge_backbone": (
            # per-direction top-k by (w DESC, dst) over the symmetric
            # weighted edges; canonical pairs fold direction counts
            "WITH we AS MATERIALIZED (SELECT a.l_partkey AS src, "
            "b.l_partkey AS dst, count(DISTINCT a.l_orderkey) AS w "
            "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2), "
            "sym AS (SELECT src, dst, w FROM we "
            "UNION ALL SELECT dst, src, w FROM we), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY src "
            "ORDER BY w DESC, dst) AS rn FROM sym), "
            "kept AS (SELECT least(src, dst) AS u, greatest(src, dst) AS v, "
            "w FROM r WHERE rn <= 5) "
            "SELECT u AS src, v AS dst, CAST(min(w) AS BIGINT) AS n_orders, "
            "CAST(count(*) AS BIGINT) AS n_directions FROM kept GROUP BY 1, 2"
        ),
        "ucc_audit": (
            # distinct over normalized int values (dates → epoch days,
            # prices → exact cents) per candidate combo
            "WITH n AS (SELECT count(*) AS r FROM orders) "
            "SELECT 'o_custkey' AS combo, CAST(n.r AS BIGINT) AS n_rows, "
            "CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct, "
            "count(DISTINCT o_custkey) = n.r AS is_unique "
            "FROM orders, n GROUP BY n.r "
            "UNION ALL SELECT 'o_custkey,o_orderdate', n.r, "
            "count(DISTINCT (o_custkey, epoch_us(o_orderdate) // 86400000000)), "
            "count(DISTINCT (o_custkey, epoch_us(o_orderdate) // 86400000000)) "
            "= n.r FROM orders, n GROUP BY n.r "
            "UNION ALL SELECT 'o_custkey,o_totalprice', n.r, "
            "count(DISTINCT (o_custkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT))), "
            "count(DISTINCT (o_custkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT))) = n.r "
            "FROM orders, n GROUP BY n.r "
            "UNION ALL SELECT 'o_orderdate', n.r, "
            "count(DISTINCT o_orderdate), count(DISTINCT o_orderdate) = n.r "
            "FROM orders, n GROUP BY n.r"
        ),
        "fd_audit": (
            # FD X→Y holds iff no X-group has 2 distinct Y; three candidate
            # FDs unioned with literal labels (engine hashes string RHS —
            # the stated md5 2^-64 caveat)
            "WITH f1 AS (SELECT c_custkey AS l, "
            "count(DISTINCT c_nationkey) AS c FROM customer GROUP BY 1), "
            "f2 AS (SELECT o_custkey AS l, "
            "count(DISTINCT o_orderpriority) AS c FROM orders GROUP BY 1), "
            "f3 AS (SELECT l_orderkey AS l, "
            "count(DISTINCT l_returnflag) AS c FROM lineitem GROUP BY 1) "
            "SELECT 'c_custkey->c_nationkey' AS fd, "
            "CAST(count(*) AS BIGINT) AS n_lhs, "
            "CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_violating, "
            "sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0 AS holds FROM f1 "
            "UNION ALL SELECT 'o_custkey->o_orderpriority', count(*), "
            "sum(CASE WHEN c > 1 THEN 1 ELSE 0 END), "
            "sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0 FROM f2 "
            "UNION ALL SELECT 'l_orderkey->l_returnflag', count(*), "
            "sum(CASE WHEN c > 1 THEN 1 ELSE 0 END), "
            "sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0 FROM f3"
        ),
        "rapid_repeat_orders": (
            # same-customer day-window self-join; exact cent deltas (both
            # sides round x*100 — near-integer cents, no .5 boundary)
            "SELECT a.o_orderkey AS o1, b.o_orderkey AS o2, "
            "a.o_custkey AS custkey, "
            "CAST(abs(epoch_us(a.o_orderdate) // 86400000000 - "
            "epoch_us(b.o_orderdate) // 86400000000) AS BIGINT) AS day_gap, "
            "CAST(abs(round(a.o_totalprice * 100) - "
            "round(b.o_totalprice * 100)) AS BIGINT) AS cents_diff "
            "FROM orders a JOIN orders b ON b.o_custkey = a.o_custkey "
            "AND a.o_orderkey < b.o_orderkey "
            "AND abs(epoch_us(a.o_orderdate) // 86400000000 - "
            "epoch_us(b.o_orderdate) // 86400000000) <= 7"
        ),
        "ldiversity_customers": (
            # bucket = floor(acctbal/1000) computed in DOUBLE exactly as
            # numpy does (2-decimal balances /1000 then floor)
            "WITH b AS (SELECT c_nationkey AS nation, "
            "c_mktsegment AS segment, "
            "CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT) "
            "AS bucket FROM customer), "
            "ps AS (SELECT nation, segment, bucket, "
            "CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2, 3) "
            "SELECT nation, segment, CAST(sum(c) AS BIGINT) AS n_rows, "
            "CAST(count(*) AS BIGINT) AS n_distinct_sensitive, "
            "count(*) >= 3 AS l_diverse FROM ps GROUP BY 1, 2"
        ),
        "candidate_stats_chair": (
            # PREPROCESS aggregation replay: diag = label+LDF vertex
            # census; pair[(u1>u2)] = directed edges whose src passes u1's
            # filter and dst passes u2's (chair ql=[0,1,2,0,1],
            # qdeg=[1,3,2,1,1])
            f"WITH {_ESYM_MAT}, "
            "lab AS MATERIALIZED (SELECT p_partkey AS vid, "
            "p_size % 3 AS l FROM part), "
            "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS d "
            "FROM e GROUP BY 1), "
            "f AS MATERIALIZED (SELECT lab.vid, lab.l, "
            "coalesce(deg.d, 0) AS d FROM lab "
            "LEFT JOIN deg ON deg.vid = lab.vid) "
            "SELECT 'diag' AS kind, 0 AS u1, 0 AS u2, "
            "CAST(count(*) AS BIGINT) AS n FROM f WHERE l = 0 AND d >= 1 "
            "UNION ALL SELECT 'diag', 1, 1, count(*) FROM f "
            "WHERE l = 1 AND d >= 3 "
            "UNION ALL SELECT 'diag', 2, 2, count(*) FROM f "
            "WHERE l = 2 AND d >= 2 "
            "UNION ALL SELECT 'diag', 3, 3, count(*) FROM f "
            "WHERE l = 0 AND d >= 1 "
            "UNION ALL SELECT 'diag', 4, 4, count(*) FROM f "
            "WHERE l = 1 AND d >= 1 "
            "UNION ALL SELECT 'pair', 1, 0, count(*) FROM e "
            "JOIN f a ON a.vid = e.src AND a.l = 1 AND a.d >= 3 "
            "JOIN f b ON b.vid = e.dst AND b.l = 0 AND b.d >= 1 "
            "UNION ALL SELECT 'pair', 2, 1, count(*) FROM e "
            "JOIN f a ON a.vid = e.src AND a.l = 2 AND a.d >= 2 "
            "JOIN f b ON b.vid = e.dst AND b.l = 1 AND b.d >= 3 "
            "UNION ALL SELECT 'pair', 3, 2, count(*) FROM e "
            "JOIN f a ON a.vid = e.src AND a.l = 0 AND a.d >= 1 "
            "JOIN f b ON b.vid = e.dst AND b.l = 2 AND b.d >= 2 "
            "UNION ALL SELECT 'pair', 4, 1, count(*) FROM e "
            "JOIN f a ON a.vid = e.src AND a.l = 1 AND a.d >= 1 "
            "JOIN f b ON b.vid = e.dst AND b.l = 1 AND b.d >= 3"
        ),
        "kanonymity_customers": (
            "WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS c "
            "FROM customer GROUP BY 1, 2) "
            "SELECT CAST(5 AS BIGINT) AS k, CAST(sum(c) AS BIGINT) AS n_rows, "
            "CAST(count(*) AS BIGINT) AS n_groups, "
            "CAST(sum(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_violating_groups, "
            "CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT) "
            "AS n_exposed_rows, "
            "CAST(min(c) AS BIGINT) AS min_group_size FROM g"
        ),
        "doclen_mannwhitney": (
            # doubled midranks are exact integers (2·c_less + c_eq + 1);
            # HUGEINT cubes for the tie correction; one sqrt mirrors the
            # engine's operand tree
            "WITH d AS (SELECT source, n_chars AS v FROM documents "
            "WHERE source IN ('src0', 'src1')), "
            "h AS (SELECT v, sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) "
            "AS ca, count(*) AS ct FROM d GROUP BY 1), "
            "o AS (SELECT v, ca, ct, coalesce(sum(ct) OVER (ORDER BY v "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cless "
            "FROM h), "
            "s AS (SELECT sum(ca * (2 * cless + ct + 1)) AS r2a, "
            "sum(ca) AS na, sum(ct) - sum(ca) AS nb, sum(ct) AS N, "
            "sum(ct * ct * ct - ct) AS T FROM o) "
            "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, "
            "CAST(r2a - na * (na + 1) AS BIGINT) AS u2, "
            "round(CASE WHEN na > 0 AND nb > 0 AND N > 1 THEN "
            "((r2a - na * (na + 1)) / 2.0 - na * nb / 2.0) / "
            "sqrt((na * nb / 12.0) * ((N + 1) - CAST(T AS DOUBLE) / "
            "(N * (N - 1)))) ELSE 0.0 END, 6) AS z FROM s"
        ),
        "embedding_outliers": (
            # same moments CTE as embedding_moments (unrounded), z² summed
            # per vector, top-k on the ROUNDED distance with vec_id ties
            "WITH x AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 "
            "AS dim, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings), "
            "m AS (SELECT dim, count(*) AS n, sum(v) AS s, sum(v * v) AS ss "
            "FROM x GROUP BY 1), "
            "st AS (SELECT dim, s / n AS mu, "
            "sqrt(ss / n - (s / n) * (s / n)) AS sigma FROM m), "
            "d2 AS (SELECT x.vec_id, round(sum(CASE WHEN st.sigma > 0 THEN "
            "((x.v - st.mu) / st.sigma) * ((x.v - st.mu) / st.sigma) "
            "ELSE 0 END), 6) AS d2 FROM x JOIN st USING (dim) GROUP BY 1) "
            "SELECT vec_id, d2 FROM d2 ORDER BY d2 DESC, vec_id LIMIT 20"
        ),
        "revenue_bootstrap": (
            # md5-indexed resampling replayed verbatim: sorted-day index =
            # row_number-1, pick = md5_number_lower("b:i") % n, exact int
            # sums, ONE double division per resample
            "WITH d AS MATERIALIZED (SELECT "
            "epoch_us(o_orderdate) // 86400000000 AS day, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS c FROM orders GROUP BY 1), "
            "sd AS MATERIALIZED (SELECT c, "
            "row_number() OVER (ORDER BY day) - 1 AS rn FROM d), "
            "cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d), "
            "draws AS (SELECT bb.b, ii.i, "
            "CAST(md5_number_lower(CAST(bb.b AS VARCHAR) || ':' || "
            "CAST(ii.i AS VARCHAR)) % (SELECT n FROM cnt) AS BIGINT) AS pick "
            "FROM (SELECT unnest(range(0, 32)) AS b) bb "
            "CROSS JOIN (SELECT unnest(range(0, (SELECT n FROM cnt))) AS i) ii), "
            "s AS (SELECT b, CAST(sum(sd.c) AS BIGINT) AS sc "
            "FROM draws JOIN sd ON sd.rn = draws.pick GROUP BY b) "
            "SELECT b AS resample, "
            "round(CAST(sc AS DOUBLE) / (SELECT n FROM cnt), 6) "
            "AS boot_mean_cents FROM s"
        ),
        "revenue_jackknife": (
            # jackknife-for-the-mean collapses to Σ(S−n·xᵢ)²/(n³(n−1)) —
            # exact HUGEINT cents moments, one double division + sqrt
            "WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS dy, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1), "
            "s AS (SELECT count(*) AS n, sum(cents) AS S FROM d), "
            "sd AS (SELECT sum((s.S - s.n * d.cents) * (s.S - s.n * d.cents)) "
            "AS sd2 FROM d, s) "
            "SELECT CAST(s.n AS BIGINT) AS n_days, "
            "CAST(s.S AS BIGINT) AS total_cents, "
            "round(CAST(s.S AS DOUBLE) / s.n, 6) AS mean_daily_cents, "
            "round(CASE WHEN s.n > 1 THEN sqrt(CAST(sd.sd2 AS DOUBLE) / "
            "CAST(s.n * s.n * s.n * (s.n - 1) AS DOUBLE)) ELSE 0.0 END, 6) "
            "AS jk_se_cents FROM s, sd"
        ),
        "lsh_recall": (
            # both pair sets replayed in ONE chain: the full MinHash-LSH
            # CTEs end in `pairs` (the engine's LSH output), and the exact
            # ground truth reuses the SAME grams/cnt CTEs (complete because
            # any Jaccard>0 pair shares a gram)
            f"WITH {_minhash_ctes()}, "
            "exact_i AS MATERIALIZED (SELECT a.doc_id AS da, b.doc_id AS db, "
            "count(*) AS i FROM grams a JOIN grams b ON b.g = a.g "
            "AND a.doc_id < b.doc_id GROUP BY 1, 2), "
            "exactp AS MATERIALIZED (SELECT da, db FROM exact_i x "
            "JOIN cnt ca ON ca.doc_id = x.da JOIN cnt cb ON cb.doc_id = x.db "
            "WHERE x.i * 1.0 / (ca.nsh + cb.nsh - x.i) >= 0.5), "
            "hit AS (SELECT count(*) AS h FROM exactp e "
            "JOIN pairs p ON p.doc_a = e.da AND p.doc_b = e.db), "
            "ne AS (SELECT count(*) AS n FROM exactp), "
            "nl AS (SELECT count(*) AS n FROM pairs) "
            "SELECT CAST(ne.n AS BIGINT) AS n_exact, "
            "CAST(nl.n AS BIGINT) AS n_lsh, CAST(hit.h AS BIGINT) AS n_hit, "
            "round(CASE WHEN ne.n = 0 THEN 1.0 ELSE hit.h * 1.0 / ne.n END, 6) "
            "AS recall, "
            "round(CASE WHEN nl.n = 0 THEN 1.0 ELSE hit.h * 1.0 / nl.n END, 6) "
            "AS precision FROM ne, nl, hit"
        ),
        "kmv_overlap_daily": (
            # full KMV replay (mirrors sketch.kmv_overlap_daily): md5-keyed
            # bottom-64 per day, per-pair distinct-union ranking, the SAME
            # θ = h_k/2⁶⁴ and ρ/k estimator operand trees; ≤ k union rows
            # means both sketches were exact and the counts pass through
            "WITH ev AS MATERIALIZED (SELECT DISTINCT "
            "epoch_us(ts) // 86400000000 AS day, user_id FROM events), "
            "h AS MATERIALIZED (SELECT day, user_id, "
            "CAST(md5_number_lower(CAST(user_id AS VARCHAR)) AS HUGEINT) "
            "AS hh FROM ev), "
            "sk AS MATERIALIZED (SELECT day, user_id, hh FROM "
            "(SELECT *, row_number() OVER (PARTITION BY day "
            "ORDER BY hh, user_id) AS rn FROM h) WHERE rn <= 64), "
            "dn AS MATERIALIZED (SELECT day, count(*) AS n FROM ev GROUP BY 1), "
            "ei AS MATERIALIZED (SELECT a.day, count(*) AS inter FROM ev a "
            "JOIN ev b ON b.user_id = a.user_id AND b.day = a.day + 1 "
            "GROUP BY 1), "
            "pr AS (SELECT d.day AS day0 FROM dn d "
            "JOIN dn e ON e.day = d.day + 1), "
            "su AS MATERIALIZED (SELECT p.day0, s.user_id, min(s.hh) AS hh, "
            "count(*) AS pres FROM pr p JOIN sk s "
            "ON s.day = p.day0 OR s.day = p.day0 + 1 GROUP BY 1, 2), "
            "ru AS MATERIALIZED (SELECT *, row_number() OVER "
            "(PARTITION BY day0 ORDER BY hh, user_id) AS rn, "
            "count(*) OVER (PARTITION BY day0) AS m FROM su), "
            "st AS (SELECT day0, max(m) AS m, "
            "max(CASE WHEN rn = 64 THEN hh END) AS hk, "
            "sum(CASE WHEN pres = 2 THEN 1 ELSE 0 END) AS c2all, "
            "sum(CASE WHEN pres = 2 AND rn <= 64 THEN 1 ELSE 0 END) AS c2top "
            "FROM ru GROUP BY 1) "
            "SELECT st.day0 AS day, "
            "round(CASE WHEN m <= 64 THEN CAST(m AS DOUBLE) "
            "ELSE 63 / (CAST(hk AS DOUBLE) / 18446744073709551616.0) END, 6) "
            "AS est_union, "
            "round(CASE WHEN m <= 64 THEN CAST(c2all AS DOUBLE) "
            "ELSE (CAST(c2top AS DOUBLE) / 64) * "
            "(63 / (CAST(hk AS DOUBLE) / 18446744073709551616.0)) END, 6) "
            "AS est_inter, "
            "CAST(dn.n + dn2.n - coalesce(ei.inter, 0) AS BIGINT) "
            "AS exact_union, "
            "CAST(coalesce(ei.inter, 0) AS BIGINT) AS exact_inter "
            "FROM st JOIN dn ON dn.day = st.day0 "
            "JOIN dn dn2 ON dn2.day = st.day0 + 1 "
            "LEFT JOIN ei ON ei.day = st.day0"
        ),
        "jl_distortion": (
            # quantize (×10⁶ half-away), pair (2t, 2t+1), sign-project with
            # md5-parity ±1 (d 1-based = generate_subscripts), integer sums,
            # ONE double division — bit-exact vs the engine
            "WITH q AS MATERIALIZED (SELECT vec_id, "
            "generate_subscripts(embedding, 1) AS d, "
            "CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) "
            "AS BIGINT) AS qv FROM embeddings), "
            "pr AS MATERIALIZED (SELECT a.vec_id // 2 AS pair_id, a.d, "
            "a.qv - b.qv AS xd FROM q a "
            "JOIN q b ON b.vec_id = a.vec_id + 1 AND b.d = a.d "
            "WHERE a.vec_id % 2 = 0), "
            "sx AS (SELECT pair_id, CAST(sum(xd * xd) AS BIGINT) AS sx "
            "FROM pr GROUP BY 1), "
            "sg AS (SELECT dd.d, jj.j, CASE WHEN md5_number_lower("
            "CAST(dd.d AS VARCHAR) || ':' || CAST(jj.j AS VARCHAR)) % 2 = 0 "
            "THEN 1 ELSE -1 END AS s "
            "FROM (SELECT unnest(range(1, 65)) AS d) dd "
            "CROSS JOIN (SELECT unnest(range(0, 8)) AS j) jj), "
            "yd AS (SELECT pr.pair_id, sg.j, "
            "CAST(sum(pr.xd * sg.s) AS BIGINT) AS yd FROM pr "
            "JOIN sg ON sg.d = pr.d GROUP BY 1, 2), "
            "sy AS (SELECT pair_id, CAST(sum(yd * yd) AS BIGINT) AS sy "
            "FROM yd GROUP BY 1) "
            "SELECT sx.pair_id, sx.sx, sy.sy, "
            "round(CASE WHEN sx.sx > 0 THEN "
            "(CAST(sy.sy AS DOUBLE) / 8) / CAST(sx.sx AS DOUBLE) "
            "ELSE 0 END, 6) AS ratio FROM sx JOIN sy USING (pair_id)"
        ),
        "embedding_moments": (
            # mirrors similarity.embedding_moments: same var = ss/n − mean²
            # operand tree; float32→double casts are exact on both sides
            "WITH x AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim, "
            "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings), "
            "m AS (SELECT dim, count(*) AS n, sum(v) AS s, sum(v * v) AS ss "
            "FROM x GROUP BY 1) "
            "SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n, "
            "round(s / n, 6) AS mean, "
            "round(ss / n - (s / n) * (s / n), 6) AS var FROM m"
        ),
        "kmeans_assign": (
            # INT64 distances on both sides — the Lloyd-step kernel is
            # hash-checkable even though full k-means is iterative float
            f"WITH {_kmeans_assign_ctes()} "
            "SELECT CAST(cid AS BIGINT) AS cluster, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(d2) AS BIGINT) AS inertia FROM asg GROUP BY 1"
        ),
        "semantic_dedup": (
            # SemDeDup verdicts: same-cluster pair, lower-id neighbor,
            # round-6 cosine ≥ τ (the cosine_histogram round posture)
            f"WITH {_kmeans_assign_ctes()}, "
            "dup AS (SELECT DISTINCT a.vec_id FROM asg a "
            "JOIN asg b ON b.cid = a.cid AND b.vec_id < a.vec_id "
            "JOIN embeddings ea ON ea.vec_id = a.vec_id "
            "JOIN embeddings eb ON eb.vec_id = b.vec_id "
            "WHERE round(list_cosine_similarity("
            "CAST(ea.embedding AS DOUBLE[]), "
            "CAST(eb.embedding AS DOUBLE[])), 6) >= 0.35) "
            "SELECT asg.vec_id, CAST(cid AS BIGINT) AS cluster, "
            "dup.vec_id IS NULL AS keep "
            "FROM asg LEFT JOIN dup ON dup.vec_id = asg.vec_id"
        ),
        "blocklist_stats": (
            # C4 badwords audit; whitespace tokens ≡ textops._tokens,
            # empty docs count in docs but can never be flagged
            "WITH h AS (SELECT source, CASE WHEN trim(text) = '' THEN 0 "
            f"ELSE len(list_filter({toks}, "
            "t -> t = 'dup' OR t = 'spam')) END AS hits FROM documents) "
            "SELECT source, CAST(count(*) AS BIGINT) AS docs, "
            "CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS flagged_docs, CAST(sum(hits) AS BIGINT) AS hits, "
            "round(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) * 1.0 "
            "/ count(*), 6) AS flagged_rate FROM h GROUP BY 1"
        ),
        # Still rows-only, with reasons:
        #  * ivf_recall — recall@k audit of ann_topk_ivf vs the (oracled)
        #    exact ann_topk; inherits ann_topk_ivf's iterative-float
        #    centroid dependence. Pytest asserts recall bounds instead.
        #  * ann_topk_ivf — result depends on k-means centroids (iterative
        #    float averaging); pytest asserts recall + pruning vs ann_topk.
        #  * kmeans_embeddings — iterative float sums whose summation ORDER
        #    differs between numpy and SQL; numpy-parity pytest instead.
        #  * media_features — decode stub→real-numpy codecs; binary payload
        #    features are not SQL-expressible, rows-only by design.
        #  * embedding_pca_top — iterative eigensolve, out of SQL-unroll
        #    scope; numpy-SVD parity pytest instead.
    }
