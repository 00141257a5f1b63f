"""Subgraph-isomorphism matching: query planner + distributed count.

Planner = the Ray-side ``SIQuery::init`` (``SItypes/SIQuery.h:226-427``):
root selection by max degree (the reference's ``-order degree`` mode,
``SIQuery.h:234-268``), DFS preorder with children sorted by (degree desc,
id) (``SIQuery.h:373-402``), and per-level derived fields — parent position,
backward-neighbor positions (``addBNIC``, ``SIQuery.h:429-486``) and
same-label positions for injectivity (``SIQuery.h:359-365,531-542``). The
branch-number / index-chain / conflict machinery (``SIQuery.h:509-702``)
supports the reference's compressed-result encoding only; the flat plan's
counts are identical (SURVEY.md §7.5).

A query graph is ``(labels: list[int], edges: list[(int, int)])`` over query
vertex ids 0..k-1, undirected, connected.

``match_count`` runs the MATCH phase on the BSP engine (``MatchProgram``) and
returns the global embedding count — the reference's shipped deliverable
("Mapping count", ``pregel_app_subgraph.h:914-919``).

``brute_force_count`` is the single-process oracle (VF2-style backtracking)
used by the tests (FIXTURES.md F4) — deliberately a different algorithm.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "build_plan",
    "candidate_stats",
    "shared_quotients",
    "shared_fold_count",
    "match_count",
    "match_embeddings",
    "brute_force_count",
    "toy_graph",
    "toy_query",
    "ORDER_STRATEGIES",
]


ORDER_STRATEGIES = ("degree", "anti-degree", "random", "candidate")


def build_plan(
    labels: list[int],
    edges: list[tuple[int, int]],
    root: int | None = None,
    order: str = "degree",
    cand_stats: tuple[list[int], dict] | None = None,
    seed: int = 13,
    allow_shared: bool = False,
) -> dict:
    """Compute the flat matching plan (see module doc).

    ``order`` selects root + DFS child ordering, mirroring the reference's
    ``-order`` strategies (``SItypes/SIQuery.h:234-268`` root,
    ``:373-402`` children):

    * ``degree``      — root = max query degree; children high-degree first.
    * ``anti-degree`` — root = min query degree; children low-degree first.
    * ``random``      — seeded random root and child order (the reference's
      "random" is root 0 + hash-set iteration order; any order is count-
      preserving, so we make it reproducibly random instead).
    * ``candidate``   — root = smallest data-graph candidate set
      (``agg_mat[u][u]``); children by fewest candidate edges to the parent
      (``agg_mat[curr][next]``) — pass ``cand_stats`` = (diag, pair) from
      :func:`candidate_stats`.
    Embedding counts are strategy-invariant (tested); only cost differs.

    ``allow_shared`` (round 5) relaxes branch-fold eligibility rule (a):
    branch subtrees (and post-branch tail leaves) may SHARE labels across
    branches. Every cross-branch / branch-vs-tail same-label injectivity
    constraint the fold cannot carry is DROPPED from the slp indicator
    lists and recorded in ``plan["shared_pairs"]`` — the plan then counts
    the RELAXED quantity (injectivity not enforced on those pairs), and
    the caller must subtract the conflict terms (:func:`shared_quotients`,
    the Ray analogue of the reference's SIBranch conflict subtraction,
    ``SItypes/SIQuery.h:604-702`` / ``SIBranch.h:161-248``). With
    ``allow_shared=False`` (default) such queries fall back to flat
    expansion and the plan is exact on its own.
    """
    k = len(labels)
    adj: list[set[int]] = [set() for _ in range(k)]
    for a, b in edges:
        if a == b:
            raise ValueError("query self-loops unsupported")
        adj[a].add(b)
        adj[b].add(a)
    if any(not a for a in adj) and k > 1:
        raise ValueError("query must be connected")
    if order not in ORDER_STRATEGIES:
        raise ValueError(f"order must be one of {ORDER_STRATEGIES}")
    if order == "candidate" and cand_stats is None:
        raise ValueError("order='candidate' needs cand_stats (candidate_stats())")
    rng = np.random.default_rng(seed)
    rnd = {u: rng.random() for u in range(k)} if order == "random" else None
    diag, pair = cand_stats if cand_stats is not None else (None, None)

    def _root_key(u: int):
        if order == "degree":
            return (len(adj[u]), -u)  # max degree, tie → min id
        if order == "anti-degree":
            return (-len(adj[u]), -u)  # min degree, tie → min id
        if order == "random":
            return (rnd[u], -u)
        return (-diag[u], -u)  # candidate: min candidate count, tie → min id

    def _child_key(u: int, c: int):
        # sorted ASC then pushed to a stack → the LAST element pops FIRST;
        # each key is built so the preferred child sorts last.
        if order == "degree":
            return (len(adj[c]), -c)  # prefer high degree
        if order == "anti-degree":
            return (-len(adj[c]), -c)  # prefer low degree
        if order == "random":
            return (rnd[c], -c)
        a, b = (u, c) if u > c else (c, u)
        return (-pair.get((a, b), 0), -c)  # prefer few candidate edges

    if root is None:
        root = max(range(k), key=_root_key)

    order_l: list[int] = []
    parent: dict[int, int] = {root: -1}
    seen = {root}
    stack = [root]
    while stack:
        u = stack.pop()
        order_l.append(u)
        children = sorted(
            (c for c in adj[u] if c not in seen),
            key=lambda c: _child_key(u, c),
        )
        for c in children:  # stack pops the last (preferred) child first
            seen.add(c)
            parent[c] = u
            stack.append(c)
    order = order_l
    if len(order) != k:
        raise ValueError("query must be connected")

    # Leaves-last: move query-leaves (degree 1, non-root) to the end of the
    # plan, preserving relative order — the reference's pseudo-children
    # separation (addPsdChildren, pregel_app_subgraph.h:153-209). Counts are
    # order-invariant; frontiers only shrink (expanding a leaf early
    # multiplies every later level by its fanout), and a trailing leaf run
    # is what the tail factor fold (below) needs to engage. Parent-before-
    # child holds: leaf parents are internal/root (first group), and the
    # internals keep their DFS relative order.
    branch_groups: list[tuple[int, list[int]]] = []  # (branch root, members)
    if k > 2:
        internals = [u for u in order if len(adj[u]) > 1 or u == root]
        leaves = [u for u in order if u not in internals]

        # ---- internal-branch factorization (round 4) ---------------------
        # The generalization of the trailing-leaf factor fold to branch
        # subtrees of depth >= 2 — the flat-plan analogue of the reference's
        # SIBranch AND-OR trees (/root/reference/src/SItypes/SIBranch.h:81-131,
        # enumerate/expand pregel_app_subgraph.h:515-612). Select pairwise
        # DISJOINT plan subtrees ("branches") hanging off the core such that
        #   (a) branches are pairwise LABEL-disjoint (cross-branch
        #       injectivity can then never bind — a data vertex has one
        #       label — so per-branch completion counts multiply exactly;
        #       same-label conflicts fall back to flat expansion, the same
        #       compatibility rule the leaf fold uses),
        #   (b) no query edge spans two branches (each branch's backward
        #       constraints stay inside branch ∪ core, whose columns the
        #       row carries),
        #   (c) core-attached tail leaves share no label with any branch
        #       (their fold indicators must reference carried columns), and
        #   (d) the post-branch leaf run is fold-compatible (same label ⇒
        #       same parent) — otherwise leftover leaves would need flat
        #       expansion after branch columns are dropped.
        # With >= 2 branches selected, MatchProgram counts each branch's
        # completions per core row as a FACTOR (sequentially, collapsing
        # back to [core, product] rows between branches) instead of
        # materializing the branch cross product.
        children: dict[int, list[int]] = {u: [] for u in order}
        for u in order:
            if parent[u] != -1:
                children[parent[u]].append(u)

        def _subtree(u: int) -> list[int]:
            out = [u]
            i = 0
            while i < len(out):
                out.extend(children[out[i]])
                i += 1
            return out

        posd = {u: i for i, u in enumerate(order)}
        cands = [
            (u, _subtree(u))
            for u in order
            if u != root and len(adj[u]) > 1 and len(_subtree(u)) >= 2
        ]
        sel: list[tuple[int, list[int]]] = []
        taken: set[int] = set()
        for u, S in sorted(cands, key=lambda t2: (-len(t2[1]), posd[t2[0]])):
            if taken.isdisjoint(S):
                sel.append((u, S))
                taken.update(S)

        def _labelset(S):
            return {int(labels[v]) for v in S}

        while sel:
            if len(sel) < 2:
                sel = []
                break
            drop = None
            for i in range(len(sel)):
                for j2 in range(i + 1, len(sel)):
                    # rule (a): cross-branch label overlap — hard drop in
                    # exact mode; in allow_shared mode the overlap becomes
                    # recorded shared_pairs instead (conflict subtraction).
                    if not allow_shared and (
                        _labelset(sel[i][1]) & _labelset(sel[j2][1])
                    ):
                        drop = j2
                        break
                    Si, Sj = set(sel[i][1]), set(sel[j2][1])
                    if any(
                        (a in Si and b in Sj) or (a in Sj and b in Si)
                        for a, b in edges
                    ):
                        drop = j2
                        break
                if drop is not None:
                    break
            if drop is None:
                member = set().union(*(S for _, S in sel))
                tl = [v for v in leaves if v not in member]
                tl_labels = {int(labels[v]) for v in tl}
                for i in range(len(sel)):
                    # rule (c): likewise relaxed-and-recorded when shared
                    if not allow_shared and (
                        _labelset(sel[i][1]) & tl_labels
                    ):
                        drop = i
                        break
                if drop is None:
                    seen_pv: dict[int, int] = {}
                    for v in tl:  # rule (d): post-branch leaf run must fold
                        l = int(labels[v])
                        if l in seen_pv and seen_pv[l] != parent[v]:
                            sel = []
                            break
                        seen_pv[l] = parent[v]
                    break
            sel.pop(drop)

        if sel:
            sel.sort(key=lambda t2: posd[t2[0]])
            member = set().union(*(S for _, S in sel))
            core_int = [u for u in internals if u not in member]
            order2 = list(core_int)
            for u, S in sel:
                Sset = set(S)
                b_int = [v for v in order if v in Sset and len(adj[v]) > 1]
                b_lv = [v for v in order if v in Sset and len(adj[v]) == 1]
                branch_groups.append((u, b_int + b_lv))
                order2 += b_int + b_lv
            order = order2 + [v for v in leaves if v not in member]
        else:
            order = internals + leaves

    pos = {u: i for i, u in enumerate(order)}
    plan_labels = [int(labels[u]) for u in order]
    parent_pos = [(-1 if parent[u] == -1 else pos[parent[u]]) for u in order]
    back_pos = []
    same_label_pos = []
    for i, u in enumerate(order):
        bp = sorted(
            pos[v] for v in adj[u] if pos[v] < i and pos[v] != parent_pos[i]
        )
        back_pos.append(bp)
        same_label_pos.append(
            [j for j in range(i) if plan_labels[j] == plan_labels[i]]
        )
    plan = {
        "labels": plan_labels,
        "parent_pos": parent_pos,
        "back_pos": back_pos,
        "same_label_pos": same_label_pos,
        "order": order,
        # LDF pruning (the working form of the reference's vestigial FILTER
        # stage, SIQuery::LDFFilter SItypes/SIQuery.h:724-737): a data vertex
        # mapping query vertex u needs degree ≥ deg_Q(u) — necessary, so
        # pruning on it never changes counts.
        "qdeg": [len(adj[u]) for u in order],
    }

    # Leaf pair-dedup — the flat-plan analogue of the reference's branch
    # compression (SIBranch, SItypes/SIBranch.h:7-44): the leaf count for a
    # mapping row depends only on (parent, backward targets); rows that agree
    # on those columns share one expansion, carried with a multiplicity.
    # Injectivity corrections for same-label prefix columns OUTSIDE that key
    # are constant 1 per row iff the query graph already forces the excluded
    # candidate's adjacency (edge to the leaf's parent and to every backward
    # target) — then count(row) = F(key) - (#such columns). If any such
    # column's adjacency is not query-forced, dedup is off (fallback path).
    # Trailing-leaf FACTOR FOLD — the multi-leaf form of the reference's
    # SIBranch factor-carry (SItypes/SIBranch.h:81-131): the maximal suffix
    # of plan positions that are query-leaves (degree 1 ⇒ back_pos empty,
    # parent materialized earlier — a degree-1 vertex is never a DFS parent,
    # so every tail parent sits before tail_start) is counted as a per-row
    # PRODUCT of label-degree factors: one narrow [prefix, product] row per
    # partial mapping crosses the exchange per tail leaf, never the branch
    # cross product. Exactness constraints:
    #   * tail leaf vs same-label PREFIX vertex → adjacency-indicator
    #     subtraction (tail_slp, the proven single-leaf rule);
    #   * two tail leaves, same label, SAME parent → falling factorial
    #     (tail_dec: each earlier same-label sibling shrinks the shared
    #     candidate set by exactly 1);
    #   * two tail leaves, same label, DIFFERENT parents → candidate sets
    #     overlap by a common-neighbor count the fold cannot see — shrink
    #     the tail until no such pair remains (flat expansion handles them).
    # With branches selected, the global tail run never descends into the
    # last branch's own leaves (those fold inside the branch).
    tail_floor = (
        max(1, pos[branch_groups[-1][1][-1]] + 1) if branch_groups else 1
    )
    t = k
    while t - 1 >= tail_floor and len(adj[order[t - 1]]) == 1:
        t -= 1

    def _tail_compatible(t0: int) -> bool:
        seen_parent: dict[int, int] = {}
        for j in range(t0, k):
            l = plan_labels[j]
            if l in seen_parent and seen_parent[l] != parent_pos[j]:
                return False
            seen_parent[l] = parent_pos[j]
        return True

    while t < k and not _tail_compatible(t):
        t += 1
    plan["tail_start"] = t
    plan["tail_slp"] = {
        j: [c for c in same_label_pos[j] if c < t] for j in range(t, k)
    }
    plan["tail_dec"] = {
        j: sum(1 for j2 in range(t, j) if plan_labels[j2] == plan_labels[j])
        for j in range(t, k)
    }

    # ---- branch metadata (round 4 internal-branch fold) -------------------
    # branches = [(start, end, branch_tail_start)] in plan positions; rows in
    # branch mode are [core (core_n cols), product, own-branch cols...], so a
    # global position q maps to row column q (core) or core_n + 1 + (q - bs)
    # (own branch). btail_slp/btail_dec are the within-branch analogues of
    # tail_slp/tail_dec, already remapped to row columns.
    branches_meta: list[tuple[int, int, int]] = []
    btail_slp: dict[int, list[int]] = {}
    btail_dec: dict[int, int] = {}
    branch_slp: dict[int, list[int]] = {}
    shared_pairs: list[tuple[int, int]] = []
    if branch_groups:
        nc = pos[branch_groups[0][1][0]]  # first branch start == |core|
        plan["core_n"] = nc

        def _rowcol(q: int, bs: int) -> int:
            return q if q < nc else nc + 1 + (q - bs)

        for _, members in branch_groups:
            bs, be = pos[members[0]], pos[members[-1]] + 1
            bt = be
            while bt - 1 > bs and len(adj[order[bt - 1]]) == 1:
                bt -= 1

            def _bcompat(t0: int) -> bool:
                seen_p: dict[int, int] = {}
                for j in range(t0, be):
                    l = plan_labels[j]
                    if l in seen_p and seen_p[l] != parent_pos[j]:
                        return False
                    seen_p[l] = parent_pos[j]
                return True

            while bt < be and not _bcompat(bt):
                bt += 1
            # branch-row-visible columns = core ∪ own branch; a same-label
            # reference into ANOTHER branch is uncheckable from the row —
            # exact mode forbids it (rule (a)); shared mode drops the
            # constraint and records the pair for conflict subtraction.
            for j in range(bs, bt):
                kept = [
                    c for c in same_label_pos[j] if c < nc or c >= bs
                ]
                if len(kept) != len(same_label_pos[j]):
                    assert allow_shared
                    shared_pairs += [
                        (c, j) for c in same_label_pos[j] if c not in kept
                    ]
                branch_slp[j] = kept
            for j in range(bt, be):
                kept = [
                    c
                    for c in same_label_pos[j]
                    if c < bt and (c < nc or c >= bs)
                ]
                dropped = [
                    c
                    for c in same_label_pos[j]
                    if c < bt and not (c < nc or c >= bs)
                ]
                if dropped:
                    assert allow_shared
                    shared_pairs += [(c, j) for c in dropped]
                btail_slp[j] = [_rowcol(c, bs) for c in kept]
                btail_dec[j] = sum(
                    1 for j2 in range(bt, j) if plan_labels[j2] == plan_labels[j]
                )
            branches_meta.append((bs, be, bt))
        # global tail: rows are [core, product] — only core columns are
        # checkable; branch references are shared pairs (rule (c) relaxed)
        for j in range(t, k):
            dropped = [c for c in plan["tail_slp"][j] if c >= nc]
            if dropped:
                assert allow_shared
                shared_pairs += [(c, j) for c in dropped]
                plan["tail_slp"][j] = [
                    c for c in plan["tail_slp"][j] if c < nc
                ]
    else:
        plan["core_n"] = None
    plan["branches"] = branches_meta
    plan["btail_slp"] = btail_slp
    plan["btail_dec"] = btail_dec
    plan["branch_slp"] = branch_slp
    plan["shared_pairs"] = sorted(set(shared_pairs))

    if k >= 2:
        j = k - 1
        key_cols = [parent_pos[j]] + back_pos[j]
        subtract = 0
        applicable = bool(back_pos[j])
        for c in same_label_pos[j]:
            if c in key_cols:
                continue  # candidate == key value fails verify adjacency anyway
            qc = order[c]
            need = {order[p] for p in key_cols}
            if need.issubset(adj[qc]):
                subtract += 1
            else:
                applicable = False
                break
        if len(set(key_cols)) >= j:
            applicable = False  # key spans the whole prefix — nothing to dedup
        plan["leaf_dedup"] = (
            {"key_cols": key_cols, "subtract": subtract} if applicable else None
        )
    else:
        plan["leaf_dedup"] = None
    return plan


def shared_quotients(
    labels: list[int],
    edges: list[tuple[int, int]],
    plan: dict,
    cap: int = 64,
) -> list[tuple[list[int], list[tuple[int, int]]]] | None:
    """Conflict-subtraction terms for a shared-label branch-fold plan.

    The relaxed fold (``allow_shared=True``) counts mappings with
    injectivity NOT enforced on ``plan["shared_pairs"]`` (cross-branch /
    branch-vs-tail same-label pairs — every other pair stays enforced by
    the carried-column indicators). Every relaxed mapping has a unique
    coincidence pattern π — a partition of the pair-touched vertices into
    cliques of the relaxation graph — and quotienting by π yields a fully
    injective mapping of the merged query Q/π. Hence

        relaxed(Q) = Σ_π  exact(Q/π)        (π over clique partitions)
        exact(Q)   = relaxed(Q) − Σ_{π≠discrete} exact(Q/π)

    — the flat-plan form of the reference's SIBranch conflict markers +
    subtraction (``/root/reference/src/SItypes/SIQuery.h:604-702``,
    ``SIBranch.h:161-248``). Each quotient is a strictly smaller query the
    engine counts exactly (recursively, if it again decomposes).

    Returns the list of quotient queries ``(labels2, edges2)`` — one per
    non-discrete partition — or ``None`` if more than ``cap`` partitions
    (caller should fall back to an exact disjoint/flat plan). Partitions
    merging two query-adjacent vertices are omitted: their term counts
    mappings needing a data self-loop, and the engine's graphs are
    loop-free (``symmetrize`` / ``LocalBSP`` drop self-edges on load).
    """
    order = plan["order"]
    pairs = {
        (min(order[a], order[b]), max(order[a], order[b]))
        for a, b in plan.get("shared_pairs", [])
    }
    if not pairs:
        return []
    verts = sorted({v for p in pairs for v in p})
    relax: dict[int, set[int]] = {v: set() for v in verts}
    for a, b in pairs:
        relax[a].add(b)
        relax[b].add(a)

    found: list[list[list[int]]] = []

    def _rec(i: int, classes: list[list[int]]):
        if len(found) > cap:
            return
        if i == len(verts):
            if any(len(c) > 1 for c in classes):
                found.append([list(c) for c in classes])
            return
        v = verts[i]
        for c in classes:  # join an existing class (clique constraint)
            if all(u in relax[v] for u in c):
                c.append(v)
                _rec(i + 1, classes)
                c.pop()
        classes.append([v])  # or stay a singleton
        _rec(i + 1, classes)
        classes.pop()

    _rec(0, [])
    if len(found) > cap:
        return None
    k = len(labels)
    out: list[tuple[list[int], list[tuple[int, int]]]] = []
    for classes in found:
        rep = list(range(k))
        for c in classes:
            r = min(c)
            for v in c:
                rep[v] = r
        if any(rep[a] == rep[b] for a, b in edges):
            continue  # merged vertices adjacent → needs a data self-loop
        keep = sorted(set(rep))
        nid = {v: i for i, v in enumerate(keep)}
        labels2 = [int(labels[v]) for v in keep]
        edges2 = sorted(
            {
                (min(nid[rep[a]], nid[rep[b]]), max(nid[rep[a]], nid[rep[b]]))
                for a, b in edges
            }
        )
        out.append((labels2, edges2))
    return out


def shared_fold_count(
    run_plan,
    labels: list[int],
    edges: list[tuple[int, int]],
    order: str = "degree",
    cand_stats: tuple[list[int], dict] | None = None,
    seed: int = 13,
) -> int:
    """Exact count via the shared-label branch fold + conflict subtraction.

    ``run_plan(plan, k) -> int`` executes one plan on whatever engine the
    caller holds (distributed ``BSPEngine`` or test-side ``LocalBSP``) and
    returns its embedding count. Quotient terms recurse (a merged query may
    itself decompose); correction terms always use ``order='degree'`` —
    counts are strategy-invariant, and candidate stats for merged queries
    would cost an extra PREPROCESS pass each."""
    plan = build_plan(
        labels, edges, order=order, cand_stats=cand_stats, seed=seed,
        allow_shared=True,
    )
    if plan.get("shared_pairs"):
        terms = shared_quotients(labels, edges, plan)
        if terms is None:  # too many conflict partitions — exact fallback
            plan = build_plan(
                labels, edges, order=order, cand_stats=cand_stats, seed=seed
            )
            return int(run_plan(plan, len(labels)))
        relaxed = int(run_plan(plan, len(labels)))
        corr = sum(
            shared_fold_count(run_plan, l2, e2, seed=seed) for l2, e2 in terms
        )
        return relaxed - corr
    return int(run_plan(plan, len(labels)))


def candidate_stats(engine, query_labels, query_edges):
    """Data-graph candidate statistics for ``order='candidate'`` planning —
    the Ray analogue of the reference's PREPROCESS aggregation
    (``SItypes/SIAggregator.h:4-13``): ``diag[u]`` = # data vertices passing
    u's label+LDF filter; ``pair[(u1,u2)]`` (u1 > u2, query-adjacent only) =
    # data edges whose endpoints pass the two filters. One vectorized pass
    over each partition's edge arrays, folded on the driver (k² ints)."""
    k = len(query_labels)
    adj: list[set[int]] = [set() for _ in range(k)]
    for a, b in query_edges:
        adj[a].add(b)
        adj[b].add(a)
    qdeg = [len(adj[u]) for u in range(k)]
    qpairs = sorted({(max(a, b), min(a, b)) for a, b in query_edges})

    import ray

    engine.exchange_attr("label")
    engine.exchange_attr("degree")
    parts = ray.get(
        [
            a.candidate_counts.remote(list(query_labels), qdeg, qpairs)
            for a in engine.actors
        ]
    )
    diag = [0] * k
    pair: dict[tuple[int, int], int] = {p: 0 for p in qpairs}
    for d, pr in parts:
        for u in range(k):
            diag[u] += int(d[u])
        for p, c in zip(qpairs, pr):
            pair[p] += int(c)
    return diag, pair


def match_count(
    edges_or_engine,
    query_labels: list[int],
    query_edges: list[tuple[int, int]],
    labels_ds=None,
    num_parts: int = 8,
    max_chunk: int = 500_000,
    order: str = "degree",
    seed: int = 13,
    max_out_rows: int | None = None,
    max_steps: int | None = None,
    shared_fold: bool = False,
) -> tuple[int, dict]:
    """Count embeddings of the labeled query in the labeled data graph.

    ``edges_or_engine``: edge Dataset (symmetrized internally) + ``labels_ds``
    Dataset(vid:uint64, label:int64), or a prepared BSPEngine whose verts
    layout already carries labels. ``order``: plan strategy (see
    :func:`build_plan`); ``candidate`` computes its data-graph statistics on
    the engine first.

    ``shared_fold`` (round 5): let the branch factor fold engage even when
    branch subtrees SHARE labels — the relaxed fold count is corrected by
    subtracting exact counts of the merged-vertex quotient queries
    (:func:`shared_quotients`, the reference's conflict subtraction). Each
    non-discrete conflict partition costs one extra (strictly smaller)
    engine run on the SAME graph/actors, so this pays off exactly when the
    branch multiplicities are large (the cross product the fold avoids
    dwarfs the collision terms); leave it off for small/flat-cheap queries.
    Returned lineage is the top-level relaxed run's.
    """
    from .algorithms import build_engine
    from .bsp import BSPEngine

    own = not isinstance(edges_or_engine, BSPEngine)
    eng = (
        build_engine(edges_or_engine, num_parts, labels_ds=labels_ds, directed=False)
        if own
        else edges_or_engine
    )
    stats = (
        candidate_stats(eng, query_labels, query_edges)
        if order == "candidate"
        else None
    )
    lineages: list[dict] = []

    def _run_plan(plan: dict, k: int) -> int:
        params = {"plan": plan, "max_chunk": max_chunk}
        if max_out_rows is not None:
            # per-superstep exchange bound (deep/bushy queries): defers
            # overflow work as self-messages; needs ≈ total_rows /
            # max_out_rows extra steps
            params["max_out_rows"] = max_out_rows
        lineages.append(
            eng.run(
                "match",
                params,
                max_steps=max_steps if max_steps is not None else 2 * k + 2,
            )
        )
        return int(eng.scalar_results().get("embeddings", 0))

    if shared_fold:
        count = shared_fold_count(
            _run_plan, query_labels, query_edges,
            order=order, cand_stats=stats, seed=seed,
        )
    else:
        plan = build_plan(
            query_labels, query_edges, order=order, cand_stats=stats, seed=seed
        )
        count = _run_plan(plan, len(query_labels))
    if own:
        eng.shutdown()
    return count, lineages[0]


def match_count_multi(
    edges_or_engine,
    queries: list[tuple[list[int], list[tuple[int, int]]]],
    labels_ds=None,
    num_parts: int = 8,
    max_chunk: int = 500_000,
    order: str = "degree",
    seed: int = 13,
    max_out_rows: int | None = None,
    max_steps: int | None = None,
) -> tuple[list[int], dict]:
    """Count N queries through ONE superstep loop (``MultiMatchProgram``):
    one graph load, one actor fleet, one label exchange / hub mirror, and
    every query's frontier traffic sharing the same per-superstep barrier —
    the Ray analogue of the reference's multi-query driver
    (``dev/basic/Worker.h:349-376``). Returns ([count_i...], lineage).

    With ``order='candidate'`` the data-graph statistics are computed once
    per query over the SAME engine (attribute exchanges are cached after
    the first), so the shared session also amortizes PREPROCESS."""
    from .algorithms import build_engine
    from .bsp import BSPEngine

    own = not isinstance(edges_or_engine, BSPEngine)
    eng = (
        build_engine(edges_or_engine, num_parts, labels_ds=labels_ds, directed=False)
        if own
        else edges_or_engine
    )
    plans = []
    for ql, qe in queries:
        stats = candidate_stats(eng, ql, qe) if order == "candidate" else None
        plans.append(build_plan(ql, qe, order=order, cand_stats=stats, seed=seed))
    params: dict = {"plans": plans, "max_chunk": max_chunk}
    if max_out_rows is not None:
        params["max_out_rows"] = max_out_rows
    kmax = max(len(ql) for ql, _ in queries)
    lineage = eng.run(
        "multi_match",
        params,
        max_steps=max_steps if max_steps is not None else 2 * kmax + 2,
    )
    scal = eng.scalar_results()
    counts = [int(scal.get(f"embeddings_q{i}", 0)) for i in range(len(queries))]
    if own:
        eng.shutdown()
    return counts, lineage


def match_per_root(
    edges_or_engine,
    query_labels: list[int],
    query_edges: list[tuple[int, int]],
    labels_ds=None,
    num_parts: int = 8,
):
    """Per-root embedding counts: Arrow table (vid, n_embeddings) over data
    vertices mapped to the plan root (the reference's per-vertex
    ``mapping_count``, pregel_app_subgraph.h:44). Returns (table, plan)."""
    from .algorithms import build_engine
    from .bsp import BSPEngine

    plan = build_plan(query_labels, query_edges)
    own = not isinstance(edges_or_engine, BSPEngine)
    eng = (
        build_engine(edges_or_engine, num_parts, labels_ds=labels_ds, directed=False)
        if own
        else edges_or_engine
    )
    eng.run(
        "match",
        {"plan": plan, "per_root": True},
        max_steps=2 * len(query_labels) + 4,
    )
    out = eng.result_table()
    if own:
        eng.shutdown()
    return out, plan


def match_embeddings(
    edges_or_engine,
    query_labels: list[int],
    query_edges: list[tuple[int, int]],
    labels_ds=None,
    num_parts: int = 8,
    order: str = "degree",
    out_path: str | None = None,
):
    """ENUMERATE the embeddings, not just count them — the working form of
    the reference's disabled per-embedding output
    (``pregel_app_subgraph.h:716-747``). Returns a Ray Dataset with columns
    ``v0..v{k-1}`` (data vid mapped to each query vertex), streamed from the
    partition actors (no driver concat); pass ``out_path`` to instead write
    partitioned parquet (one shard per partition) and get the path back.

    Memory note: each partition holds the embeddings IT verified; use this
    for queries whose result set is bounded (the strong-graph regime), and
    ``match_count`` when only the number is needed.
    """
    from .algorithms import build_engine
    from .bsp import BSPEngine

    own = not isinstance(edges_or_engine, BSPEngine)
    eng = (
        build_engine(edges_or_engine, num_parts, labels_ds=labels_ds, directed=False)
        if own
        else edges_or_engine
    )
    stats = (
        candidate_stats(eng, query_labels, query_edges)
        if order == "candidate"
        else None
    )
    plan = build_plan(query_labels, query_edges, order=order, cand_stats=stats)
    eng.run(
        "match",
        {"plan": plan, "enumerate": True},
        max_steps=2 * len(query_labels) + 2,
    )
    if out_path is not None:
        eng.dump(out_path)
        if own:
            eng.shutdown()
        return out_path
    ds = eng.result_dataset()
    if own:
        # materialize before tearing down the actors backing the refs
        ds = ds.materialize()
        eng.shutdown()
    return ds


def brute_force_count(
    data_labels: dict[int, int], data_edges: list[tuple[int, int]],
    query_labels: list[int], query_edges: list[tuple[int, int]],
) -> int:
    """Single-process VF2-style backtracking oracle (tests only)."""
    k = len(query_labels)
    qadj: list[set[int]] = [set() for _ in range(k)]
    for a, b in query_edges:
        qadj[a].add(b)
        qadj[b].add(a)
    dadj: dict[int, set[int]] = {v: set() for v in data_labels}
    for a, b in data_edges:
        if a == b:
            continue
        dadj.setdefault(a, set()).add(b)
        dadj.setdefault(b, set()).add(a)
    verts = sorted(data_labels)
    count = 0
    mapping: list[int] = []

    def rec(u: int):
        nonlocal count
        if u == k:
            count += 1
            return
        back = [q for q in qadj[u] if q < u]
        cand = dadj[mapping[back[0]]] if back else verts
        for v in cand:
            if data_labels.get(v) != query_labels[u] or v in mapping:
                continue
            if all(mapping[q] in dadj[v] for q in back):
                mapping.append(v)
                rec(u + 1)
                mapping.pop()

    rec(0)
    return count


def brute_force_per_root(
    data_labels, data_edges, query_labels, query_edges, root_qv: int
) -> dict[int, int]:
    """Embedding counts grouped by the data vertex mapped to query vertex
    ``root_qv`` (test oracle for per-root counting)."""
    k = len(query_labels)
    qadj: list[set[int]] = [set() for _ in range(k)]
    for a, b in query_edges:
        qadj[a].add(b)
        qadj[b].add(a)
    dadj: dict[int, set[int]] = {v: set() for v in data_labels}
    for a, b in data_edges:
        if a == b:
            continue
        dadj.setdefault(a, set()).add(b)
        dadj.setdefault(b, set()).add(a)
    verts = sorted(data_labels)
    out: dict[int, int] = {}
    mapping: list[int] = []

    def rec(u: int):
        if u == k:
            out[mapping[root_qv]] = out.get(mapping[root_qv], 0) + 1
            return
        back = [q for q in qadj[u] if q < u]
        cand = dadj[mapping[back[0]]] if back else verts
        for v in cand:
            if data_labels.get(v) != query_labels[u] or v in mapping:
                continue
            if all(mapping[q] in dadj[v] for q in back):
                mapping.append(v)
                rec(u + 1)
                mapping.pop()

    rec(0)
    return out


def toy_graph():
    """The reference's golden 15-vertex example (``graphs/toy.txt:1-15``),
    labels a/b/c/d → 0/1/2/3. Returns (labels: dict vid→label, edges)."""
    raw = {
        1: ("a", [2, 4, 5]), 2: ("c", [1, 3, 5]), 3: ("b", [2, 4, 5, 13]),
        4: ("c", [1, 3, 5, 9]), 5: ("b", [1, 2, 3, 4]), 6: ("d", [7, 9, 10]),
        7: ("a", [6, 8, 10, 11]), 8: ("d", [7, 9, 10]), 9: ("b", [4, 6, 8, 10]),
        10: ("d", [6, 7, 8, 9]), 11: ("a", [7, 12, 14, 15]), 12: ("b", [11, 13, 15]),
        13: ("d", [3, 12, 14, 15]), 14: ("b", [11, 13, 15]), 15: ("c", [11, 12, 13, 14]),
    }
    lmap = {"a": 0, "b": 1, "c": 2, "d": 3}
    labels = {v: lmap[l] for v, (l, _) in raw.items()}
    edges = sorted({(min(v, n), max(v, n)) for v, (_, ns) in raw.items() for n in ns})
    return labels, edges


def toy_query():
    """The reference's golden query (``graphs/query.txt:1-4``): 4-cycle
    a–c–b–c → labels [0, 2, 1, 2], edges of the cycle. Expected count: 4
    (``/root/reference/README.md:83``)."""
    return [0, 2, 1, 2], [(0, 1), (1, 2), (2, 3), (3, 0)]
