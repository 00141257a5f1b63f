"""Vertex programs: vectorized per-partition superstep kernels.

The Ray-side analogue of the reference's vertex-program hook
(``basic/Vertex.h:52`` ``virtual void compute(MessageContainer&)`` dispatched
by ``Worker::run_type`` ``basic/Worker.h:105-149``) — except that where the
reference runs a scalar ``compute`` per vertex, each program here processes an
entire partition per superstep with numpy kernels (no Python loop over
vertices in any hot path).

Protocol (driven by the BSP engine, ``pipelines/bsp.py``):

* ``init(csr, **params)`` — bind to a partition's CSR, allocate state.
* ``apply(step, inbox, glob)`` — merge delivered messages into vertex state;
  returns stats incl. ``active`` (vertices still driving iteration). ``glob``
  is the driver-folded stats dict of the *previous* superstep (the analogue
  of the reference's aggregator broadcast, ``basic/Worker.h:158-215``).
* ``scatter(step)`` — produce per-destination-partition message dicts
  (pre-aggregated: the combiner the reference disabled,
  ``src/utils/vecs.h:101-125``); returns ``(outbox, stats)`` with ``sent``.
* ``state_table()`` / ``load_state(table)`` — checkpointable state as Arrow
  (engine writes/reads parquet; checkpoints are taken after ``apply`` and
  before ``scatter`` so resume = load state + rerun ``scatter``).
* ``result_table()`` / ``scalar_result()`` — per-vertex results / global
  scalars (driver folds scalars like the reference's ``AggMat``
  ``SItypes/SIAggregator.h:43-51``).

Messages are dicts of numpy arrays; an outbox entry of ``None`` means "no
message to that partition this step".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import part_for
from .csr import CSRPartition, flat_gather

__all__ = [
    "PageRankProgram",
    "ConnectedComponentsProgram",
    "SSSPProgram",
    "MaximalIndependentSetProgram",
    "LabelPropagationProgram",
    "TriangleCountProgram",
    "KTrussProgram",
    "MatchProgram",
    "BetweennessProgram",
    "HarmonicClosenessProgram",
    "WeightedSSSPProgram",
    "GreedyColoringProgram",
    "EccentricityProgram",
    "KatzCentralityProgram",
    "SCCProgram",
    "ReachProgram",
    "WeightedPageRankProgram",
    "StoredWeightSSSPProgram",
    "PROGRAMS",
]


def _group_min(dst_sorted: np.ndarray, vals: np.ndarray):
    """(sorted dst, vals) → (unique dst, per-dst min) via reduceat."""
    if len(dst_sorted) == 0:
        return dst_sorted, vals
    uniq, starts = np.unique(dst_sorted, return_index=True)
    return uniq, np.minimum.reduceat(vals, starts)


def _group_max(dst_sorted: np.ndarray, vals: np.ndarray):
    """(sorted dst, vals) → (unique dst, per-dst max) via reduceat."""
    if len(dst_sorted) == 0:
        return dst_sorted, vals
    uniq, starts = np.unique(dst_sorted, return_index=True)
    return uniq, np.maximum.reduceat(vals, starts)


class VertexProgram:
    needs_nbr_attrs: tuple[str, ...] = ()
    wants_hub_mirror: bool = False

    def init(self, csr: CSRPartition, **params):
        raise NotImplementedError

    def apply(self, step: int, inbox: list[dict], glob: dict) -> dict:
        return {"active": 0}

    def scatter(self, step: int):
        return [None] * self.csr.num_parts, {"sent": 0}

    def state_table(self) -> pa.Table:
        raise NotImplementedError

    def load_state(self, table: pa.Table, step: int):
        raise NotImplementedError

    def result_table(self) -> pa.Table:
        raise NotImplementedError

    def scalar_result(self) -> dict:
        return {}


# --------------------------------------------------------------------------
class PageRankProgram(VertexProgram):
    """PageRank with dangling-mass redistribution.

    rank_{t+1}(v) = (1-d)/n + d * (Σ_{u→v} rank_t(u)/outdeg(u) + dangling_t/n)

    Fixed ``iters`` (for oracle comparability) or ``tol``-driven convergence.
    The scatter pre-aggregates contributions per destination vertex inside the
    sending partition (``DstIndex``), so the exchange carries one float per
    *distinct* (src-partition, dst-vertex) pair — at web scale this is the
    difference between shuffling |E| rows and shuffling ~|V| rows.
    """

    def init(self, csr: CSRPartition, iters=20, damping=0.85, n_global=None, tol=0.0):
        self.csr = csr
        self.iters = int(iters)
        self.d = float(damping)
        self.n = float(n_global)
        self.tol = float(tol)
        self.rank = np.full(csr.num_vertices, 1.0 / self.n)
        self.outdeg = csr.degrees().astype(np.float64)
        self.dangling_mask = self.outdeg == 0
        # the destination sets per (src-part → here) pair are STATIC: senders
        # ship them once; we cache the local-index map and subsequent steps
        # carry only the float sums — half the exchange bytes, no per-step
        # searchsorted (the reference re-serializes keys every superstep,
        # utils/vecs.h:74-79; static topology makes that pure waste).
        self._in_li: dict[int, np.ndarray] = {}
        self._sent_dst = False

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": 1}
        in_sum = np.zeros(self.csr.num_vertices)
        for i, msg in enumerate(inbox):
            if msg is None or len(msg["sum"]) == 0:
                continue
            li = self._in_li.get(i)
            if "dst" in msg:
                li = self.csr.local_index(msg["dst"])
                self._in_li[i] = li
            np.add.at(in_sum, li, msg["sum"])
        dangling = glob.get("dangling", 0.0)
        new_rank = (1.0 - self.d) / self.n + self.d * (in_sum + dangling / self.n)
        delta = float(np.abs(new_rank - self.rank).sum())
        self.rank = new_rank
        # Persist a done flag that scatter consults, so a tol-driven stop
        # actually ends the run (the engine needs active==0 AND sent==0).
        # The tol test uses the GLOBAL delta folded from the previous step
        # (`glob["delta"]` is Σ over partitions) — every partition sees the
        # same value, so they all stop on the same superstep; a local-delta
        # test would let partitions stop asymmetrically and corrupt ranks.
        glob_delta = glob.get("delta")
        self._done = step >= self.iters or (
            self.tol > 0 and glob_delta is not None and glob_delta < self.tol
        )
        return {"active": 0 if self._done else 1, "delta": delta}

    def scatter(self, step):
        P = self.csr.num_parts
        if step >= self.iters or getattr(self, "_done", False):
            return [None] * P, {"sent": 0, "dangling": 0.0}
        dix = self.csr.dst_index()
        contrib = np.where(self.dangling_mask, 0.0, self.rank / np.where(self.outdeg == 0, 1.0, self.outdeg))
        edge_val = contrib[dix.src_row][dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            if s == e:
                outbox.append(None)
                continue
            sums = np.bincount(dix.inverse[p], weights=edge_val[s:e], minlength=len(dix.uniq_dst[p]))
            msg = {"sum": sums}
            if not self._sent_dst:
                msg["dst"] = dix.uniq_dst[p]
            outbox.append(msg)
            sent += len(sums)
        self._sent_dst = True
        dangling = float(self.rank[self.dangling_mask].sum())
        return outbox, {"sent": sent, "dangling": dangling}

    def state_table(self):
        return pa.table({"vid": self.csr.vids, "rank": self.rank})

    def load_state(self, table, step):
        self.rank = table["rank"].to_numpy().copy()

    def result_table(self):
        return pa.table({"vid": self.csr.vids, "rank": self.rank})


class KatzCentralityProgram(PageRankProgram):
    """Katz centrality (Katz 1953, public): x_{t+1}(v) = β + α·Σ_{u→v}
    x_t(u), x_0 = β, exactly ``iters`` update rounds (α is kept well
    below 1/λmax so the series converges, but the FIXED iteration count
    is what the SQL oracle unrolls — the comparison is exact either
    way). Inherits PageRank's static-topology message compression; only
    the per-edge contribution (no out-degree division, no dangling
    redistribution) and the apply update differ. Result rounded
    half-away at ``round_to`` decimals for the oracle hash."""

    def init(self, csr: CSRPartition, iters=8, alpha=0.001, beta=1.0,
             round_to=6):
        super().init(csr, iters=int(iters), damping=0.0, n_global=1.0)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.round_to = int(round_to)
        self.rank = np.full(csr.num_vertices, self.beta)

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": 1}
        in_sum = np.zeros(self.csr.num_vertices)
        for i, msg in enumerate(inbox):
            if msg is None or len(msg["sum"]) == 0:
                continue
            li = self._in_li.get(i)
            if "dst" in msg:
                li = self.csr.local_index(msg["dst"])
                self._in_li[i] = li
            np.add.at(in_sum, li, msg["sum"])
        self.rank = self.beta + self.alpha * in_sum
        self._done = step >= self.iters
        return {"active": 0 if self._done else 1}

    def scatter(self, step):
        P = self.csr.num_parts
        if step >= self.iters or getattr(self, "_done", False):
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        edge_val = self.rank[dix.src_row][dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            if s == e:
                outbox.append(None)
                continue
            sums = np.bincount(
                dix.inverse[p], weights=edge_val[s:e],
                minlength=len(dix.uniq_dst[p]),
            )
            msg = {"sum": sums}
            if not self._sent_dst:
                msg["dst"] = dix.uniq_dst[p]
            outbox.append(msg)
            sent += len(sums)
        self._sent_dst = True
        return outbox, {"sent": sent}

    def result_table(self):
        from ..functions.rounding import round_half_away

        return pa.table(
            {
                "vid": self.csr.vids,
                "katz": round_half_away(self.rank, self.round_to),
            }
        )


# --------------------------------------------------------------------------
class WeightedPageRankProgram(PageRankProgram):
    """Edge-WEIGHTED PageRank over STORED per-edge weights
    (``CSRPartition.eweights`` — the data-dependent channel the plain
    programs don't need):

        rank_{t+1}(v) = (1-d)/n + d·(Σ_{u→v} w(u,v)/W(u)·rank_t(u) + dangling_t/n)

    W(u) = Σ_v w(u,v); a vertex with total weight 0 is dangling. Everything
    else — static-destination message compression, tol-driven stop, the
    dangling fold — is inherited; only the per-edge contribution changes
    (w/W in place of 1/outdeg)."""

    def init(self, csr: CSRPartition, iters=20, damping=0.85, n_global=None,
             tol=0.0):
        super().init(csr, iters=iters, damping=damping, n_global=n_global,
                     tol=tol)
        if csr.eweights is None and csr.num_edges > 0:
            raise ValueError(
                "wpagerank needs stored per-edge weights (a `weight` column "
                "in the partitioned edge layout)"
            )
        self._w = (
            csr.eweights.astype(np.float64)
            if csr.eweights is not None
            else np.zeros(0)
        )
        self.wsum = np.add.reduceat(
            np.concatenate([self._w, [0.0]]), csr.indptr[:-1]
        ) if csr.num_vertices else np.zeros(0)
        self.wsum[csr.degrees() == 0] = 0.0  # reduceat repeats on empty rows
        self.dangling_mask = self.wsum == 0

    def scatter(self, step):
        P = self.csr.num_parts
        if step >= self.iters or getattr(self, "_done", False):
            return [None] * P, {"sent": 0, "dangling": 0.0}
        dix = self.csr.dst_index()
        contrib = np.where(
            self.dangling_mask, 0.0,
            self.rank / np.where(self.wsum == 0, 1.0, self.wsum),
        )
        edge_val = contrib[dix.src_row][dix.order] * self._w[dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            if s == e:
                outbox.append(None)
                continue
            sums = np.bincount(
                dix.inverse[p], weights=edge_val[s:e],
                minlength=len(dix.uniq_dst[p]),
            )
            msg = {"sum": sums}
            if not self._sent_dst:
                msg["dst"] = dix.uniq_dst[p]
            outbox.append(msg)
            sent += len(sums)
        self._sent_dst = True
        dangling = float(self.rank[self.dangling_mask].sum())
        return outbox, {"sent": sent, "dangling": dangling}


class PersonalizedPageRankProgram(PageRankProgram):
    """Personalized (seeded-teleport) PageRank: the (1−d) restart mass — and
    any dangling mass — goes to the seed set only, not uniformly.

    Seeds are ``vid % seed_mod == 0`` (a deterministic predicate so the SQL
    oracle can reproduce the set). |S| is global state no partition knows at
    init, so superstep 0 is a seed census: each partition reports its local
    seed count through the engine's scalar fold, step 1 reads the folded
    total from ``glob``, initializes r₀ = 1[seed]/|S| and starts the normal
    superstep cadence — update k lands at apply step k+1.
    """

    def init(self, csr: CSRPartition, iters=20, damping=0.85, seed_mod=10, tol=0.0):
        super().init(csr, iters=int(iters) + 1, damping=damping, n_global=1, tol=tol)
        self.seed_mask = (csr.vids % np.uint64(int(seed_mod))) == np.uint64(0)
        self.rank = np.zeros(csr.num_vertices)
        self._tele: np.ndarray | None = None

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": 1, "n_seeds": int(self.seed_mask.sum())}
        if step == 1:
            self._tele = self.seed_mask.astype(np.float64) / float(glob["n_seeds"])
            self.rank = self._tele.copy()
            return {"active": 1}
        in_sum = np.zeros(self.csr.num_vertices)
        for i, msg in enumerate(inbox):
            if msg is None or len(msg["sum"]) == 0:
                continue
            li = self._in_li.get(i)
            if "dst" in msg:
                li = self.csr.local_index(msg["dst"])
                self._in_li[i] = li
            np.add.at(in_sum, li, msg["sum"])
        dangling = glob.get("dangling", 0.0)
        new_rank = (1.0 - self.d) * self._tele + self.d * (in_sum + dangling * self._tele)
        delta = float(np.abs(new_rank - self.rank).sum())
        self.rank = new_rank
        glob_delta = glob.get("delta")
        self._done = step >= self.iters or (
            self.tol > 0 and glob_delta is not None and glob_delta < self.tol
        )
        return {"active": 0 if self._done else 1, "delta": delta}

    def scatter(self, step):
        if step == 0:  # census step — nothing to send yet
            return [None] * self.csr.num_parts, {"sent": 0, "dangling": 0.0}
        return super().scatter(step)

    def state_table(self):
        return pa.table(
            {
                "vid": self.csr.vids,
                "rank": self.rank,
                "tele": self._tele
                if self._tele is not None
                else np.zeros(self.csr.num_vertices),
            }
        )

    def load_state(self, table, step):
        self.rank = table["rank"].to_numpy().copy()
        if step >= 1:
            self._tele = table["tele"].to_numpy().copy()


# --------------------------------------------------------------------------
class _MinPropagationProgram(VertexProgram):
    """Shared frontier-based min-value propagation: hash-min CC and
    multi-source BFS are the same machine — only the initial values and the
    per-hop increment differ. Only vertices whose value improved last step
    scatter; messages are group-min pre-aggregated per destination
    partition; the run converges when nothing improves (active == 0 and
    sent == 0)."""

    VAL_COL = "val"  # state/checkpoint column name
    STEP_DELTA = np.int64(0)  # added to scattered values (1 for hop counts)

    def _init_values(self, csr: CSRPartition, **params):
        """→ (initial int64 values, initial frontier mask)."""
        raise NotImplementedError

    def init(self, csr: CSRPartition, **params):
        self.csr = csr
        self.val, self.changed = self._init_values(csr, **params)

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": int(self.changed.sum())}
        new_changed = np.zeros(self.csr.num_vertices, dtype=bool)
        for msg in inbox:
            if msg is None or len(msg["dst"]) == 0:
                continue
            li = self.csr.local_index(msg["dst"])
            better = msg["min"] < self.val[li]
            if better.any():
                np.minimum.at(self.val, li, msg["min"])
                new_changed[li[better]] = True
        self.changed = new_changed
        return {"active": int(new_changed.sum())}

    def scatter(self, step):
        P = self.csr.num_parts
        dix = self.csr.dst_index()
        edge_sel = self.changed[dix.src_row][dix.order]
        # +DELTA may wrap on INF sentinels — harmless, INF rows never scatter
        edge_val = self.val[dix.src_row][dix.order] + self.STEP_DELTA
        sorted_dst = self.csr.indices[dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            sel = edge_sel[s:e]
            if not sel.any():
                outbox.append(None)
                continue
            dsts, mins = _group_min(sorted_dst[s:e][sel], edge_val[s:e][sel])
            outbox.append({"dst": dsts, "min": mins})
            sent += len(dsts)
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table(
            {"vid": self.csr.vids, self.VAL_COL: self.val, "changed": self.changed}
        )

    def load_state(self, table, step):
        self.val = table[self.VAL_COL].to_numpy().copy()
        self.changed = table["changed"].to_numpy().copy()


class ConnectedComponentsProgram(_MinPropagationProgram):
    """Hash-min connected components over a symmetrized edge table.

    component(v) = min vid reachable from v; frontier-based: only vertices
    whose component label changed last step scatter (so total work is
    O(E · diameter-ish) but per-step volume shrinks geometrically).
    """

    VAL_COL = "comp"

    def _init_values(self, csr: CSRPartition):
        return csr.vids.copy(), np.ones(csr.num_vertices, dtype=bool)

    def result_table(self):
        return pa.table({"vid": self.csr.vids, "component": self.val})


# --------------------------------------------------------------------------
_DIST_INF = np.int64(np.iinfo(np.int64).max)


class SSSPProgram(_MinPropagationProgram):
    """Multi-source BFS / unit-weight SSSP — THE canonical Pregel workload
    (Malewicz et al. 2010 §5.2 uses it as the running example; the
    reference's vertex-compute loop shape, src/basic/Vertex.h).

    dist(v) = hops to the nearest seed (vid % seed_mod == 0), -1 if
    unreachable. Exactly the CC machine with dist values and a +1 hop
    increment (``_MinPropagationProgram``).
    """

    VAL_COL = "dist"
    STEP_DELTA = np.int64(1)

    def _init_values(self, csr: CSRPartition, seed_mod=101):
        dist = np.full(csr.num_vertices, _DIST_INF, dtype=np.int64)
        seeds = (csr.vids % int(seed_mod)) == 0
        dist[seeds] = 0
        return dist, seeds

    def result_table(self):
        out = np.where(self.val == _DIST_INF, np.int64(-1), self.val)
        return pa.table({"vid": self.csr.vids, "dist": out})


class WeightedSSSPProgram(SSSPProgram):
    """Multi-source WEIGHTED shortest paths — distributed Bellman-Ford
    (min-plus relaxation; the other canonical Pregel workload, Malewicz
    et al. 2010 §5.2's generalization). Unlike BFS, a vertex's distance
    can improve across many supersteps; the frontier-based
    ``_MinPropagationProgram`` machine already IS asynchronous
    Bellman-Ford — only the per-edge increment changes from the constant
    +1 hop to a per-edge weight.

    Edge weight w(u, v) = wbase + (u + v) mod wmod, computed from the
    endpoint ids at scatter time: the partition layout carries no edge
    payload, and a deterministic endpoint-derived weight keeps the SQL
    oracle bit-exact (swap ``_edge_weights`` for a stored per-edge
    attribute when weights come from data). The default 10 + (u+v)%5
    keeps max/min weight ratio at 1.4, so optimal paths use at most
    ⌊1.4 · BFS-depth⌋ hops — which bounds both the superstep count here
    and the unroll depth the oracle needs.
    """

    VAL_COL = "wdist"

    def _init_values(self, csr: CSRPartition, seed_mod=101, wbase=10, wmod=5):
        self.wbase = np.uint64(int(wbase))
        self.wmod = np.uint64(int(wmod))
        return super()._init_values(csr, seed_mod=seed_mod)

    def _edge_weights(self, src_vids, dst_vids):
        # uint64 sum may wrap for hash-derived vids; the SQL oracle only
        # runs on small integer keys where BIGINT and uint64 agree
        return (self.wbase + (src_vids + dst_vids) % self.wmod).astype(np.int64)

    def scatter(self, step):
        P = self.csr.num_parts
        dix = self.csr.dst_index()
        edge_sel = self.changed[dix.src_row][dix.order]
        sorted_dst = self.csr.indices[dix.order]
        src_vid = self.csr.vids[dix.src_row][dix.order]
        # INF rows never changed, so wrap on INF + w is never selected
        edge_val = self.val[dix.src_row][dix.order] + self._edge_weights(
            src_vid, sorted_dst
        )
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            sel = edge_sel[s:e]
            if not sel.any():
                outbox.append(None)
                continue
            dsts, mins = _group_min(sorted_dst[s:e][sel], edge_val[s:e][sel])
            outbox.append({"dst": dsts, "min": mins})
            sent += len(dsts)
        return outbox, {"sent": sent}

    def result_table(self):
        out = np.where(self.val == _DIST_INF, np.int64(-1), self.val)
        return pa.table({"vid": self.csr.vids, "wdist": out})


class StoredWeightSSSPProgram(WeightedSSSPProgram):
    """Bellman-Ford over STORED per-edge weights (``CSRPartition.eweights``)
    — the data-weighted completion of WeightedSSSPProgram's documented seam
    ("swap _edge_weights for a stored per-edge attribute when weights come
    from data"). Same frontier machine; the per-edge increment is read from
    the weight channel instead of derived from endpoint vids."""

    def _init_values(self, csr: CSRPartition, seed_mod=101):
        if csr.eweights is None and csr.num_edges > 0:
            raise ValueError(
                "wsssp_stored needs stored per-edge weights (a `weight` "
                "column in the partitioned edge layout)"
            )
        dist = np.full(csr.num_vertices, _DIST_INF, dtype=np.int64)
        seeds = (csr.vids % int(seed_mod)) == 0
        dist[seeds] = 0
        return dist, seeds

    def scatter(self, step):
        P = self.csr.num_parts
        if self.csr.num_edges == 0 or not self.changed.any():
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        edge_sel = self.changed[dix.src_row][dix.order]
        sorted_dst = self.csr.indices[dix.order]
        # INF rows never changed, so wrap on INF + w is never selected
        edge_val = (
            self.val[dix.src_row][dix.order] + self.csr.eweights[dix.order]
        )
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            sel = edge_sel[s:e]
            if not sel.any():
                outbox.append(None)
                continue
            dsts, mins = _group_min(sorted_dst[s:e][sel], edge_val[s:e][sel])
            outbox.append({"dst": dsts, "min": mins})
            sent += len(dsts)
        return outbox, {"sent": sent}


class GreedyColoringProgram(VertexProgram):
    """Jones–Plassmann greedy graph coloring (Jones & Plassmann 1993,
    "A parallel graph coloring heuristic" — public): a vertex takes the
    MINIMUM color unused by its already-colored neighbors as soon as no
    UNCOLORED neighbor with smaller priority remains. Priorities are the
    MIS program's md5|vid scheme — unique, so the priority order is a DAG
    and the algorithm is deadlock-free; rounds = longest
    priority-decreasing path (O(log n) expected for random priorities).

    Distribution shape: neighbor PRIORITIES are pure functions of the dst
    vids already in the CSR — computed once per partition in ``init``, no
    attribute exchange. The only messages are (colored src, dst, color)
    announcements, delivered straight onto a per-edge color array via the
    membership-key edge-position lookup (``CSRPartition.edge_positions``,
    O(log E) vectorized); the mex (minimum excluded color) is computed
    for all newly unblocked rows at once in a flat arena of Σ(deg+1)
    slots. Checkpoint stores the ragged per-edge color state as an Arrow
    ListArray over the CSR indptr.
    """

    def init(self, csr: CSRPartition):
        from ..functions.hashing import md5_lower64

        self.csr = csr

        def _prio(vids):
            h = md5_lower64(vids.astype(str))
            return (h & np.uint64(0xFFFFFFFF00000000)) | vids.astype(np.uint64)

        self.prio = _prio(csr.vids)
        self.nbr_prio = _prio(csr.indices)  # O(E) hashing, once per partition
        n = csr.num_vertices
        rows = np.repeat(np.arange(n, dtype=np.int64), csr.degrees())
        blocked = self.nbr_prio < self.prio[rows]  # smaller prio colors first
        self.wait = np.bincount(rows[blocked], minlength=n).astype(np.int64)
        self.color = np.full(n, -1, dtype=np.int64)
        self.nbr_color = np.full(len(csr.indices), -1, dtype=np.int64)
        self.newly = np.zeros(n, dtype=bool)

    def _mex(self, rows: np.ndarray) -> np.ndarray:
        """Minimum excluded color per row over its neighbors' known colors —
        one flat boolean arena, no per-row Python."""
        csr = self.csr
        deg = csr.degrees()[rows]
        eidx = flat_gather(csr.indptr[rows], deg)
        cols = self.nbr_color[eidx]
        seg = np.repeat(np.arange(len(rows), dtype=np.int64), deg)
        size = deg + 1  # mex ≤ deg, so deg+1 slots always hold a free one
        base = np.concatenate([[0], np.cumsum(size)[:-1]]).astype(np.int64)
        arena = np.zeros(int(size.sum()), dtype=bool)
        ok = (cols >= 0) & (cols <= deg[seg])
        arena[base[seg[ok]] + cols[ok]] = True
        free = np.flatnonzero(~arena)
        return free[np.searchsorted(free, base)] - base

    def apply(self, step, inbox, glob):
        if step > 0:
            for msg in inbox:
                if msg is None or len(msg.get("dst", ())) == 0:
                    continue
                li = self.csr.local_index(msg["dst"])
                epos = self.csr.edge_positions(li, msg["src"])
                self.nbr_color[epos] = msg["col"]
                unblocked = self.nbr_prio[epos] < self.prio[li]
                np.add.at(self.wait, li[unblocked], -1)
        sel = (self.color < 0) & (self.wait == 0)
        if sel.any():
            rows = np.flatnonzero(sel)
            self.color[rows] = self._mex(rows)
        self.newly = sel
        return {"active": int((self.color < 0).sum())}

    def scatter(self, step):
        P = self.csr.num_parts
        if not self.newly.any():
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        edge_sel = self.newly[dix.src_row][dix.order]
        sorted_dst = self.csr.indices[dix.order]
        src_vid = self.csr.vids[dix.src_row][dix.order]
        col = self.color[dix.src_row][dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            sel = edge_sel[s:e]
            if not sel.any():
                outbox.append(None)
                continue
            outbox.append(
                {
                    "src": src_vid[s:e][sel],
                    "dst": sorted_dst[s:e][sel],
                    "col": col[s:e][sel],
                }
            )
            sent += int(sel.sum())
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table(
            {
                "vid": self.csr.vids,
                "color": self.color,
                "wait": self.wait,
                "newly": self.newly,
                "nbr_color": pa.ListArray.from_arrays(
                    pa.array(self.csr.indptr, type=pa.int32()),
                    pa.array(self.nbr_color),
                ),
            }
        )

    def load_state(self, table, step):
        self.color = table["color"].to_numpy().copy()
        self.wait = table["wait"].to_numpy().copy()
        self.newly = table["newly"].to_numpy().copy()
        self.nbr_color = (
            table["nbr_color"].combine_chunks().flatten().to_numpy().copy()
        )

    def result_table(self):
        return pa.table({"vid": self.csr.vids, "color": self.color})


# --------------------------------------------------------------------------
class MaximalIndependentSetProgram(VertexProgram):
    """Luby-style maximal independent set with DETERMINISTIC hash
    priorities (Luby 1986 made reproducible): v joins the MIS when its
    priority is a strict local minimum among still-active neighbors; its
    neighbors then drop out. Two supersteps per round (select, then
    announce), frontier shrinks geometrically, O(log n) rounds expected.

    priority(v) = high 32 bits of md5_lower64(str(v)) | v — pseudo-random
    by the hash, COLLISION-FREE by construction (vid < 2³² rides in the
    low bits), and bit-reproducible in SQL via ``md5_number_lower``.
    Messages: even steps send group-min priorities (pre-aggregated per
    destination), odd steps send MIS announcements (unique dst ids).
    """

    _ACTIVE, _MIS, _OUT = np.int8(0), np.int8(1), np.int8(2)

    def init(self, csr: CSRPartition):
        from ..functions.hashing import md5_lower64

        self.csr = csr
        h = md5_lower64(csr.vids.astype(str))
        self.prio = (h & np.uint64(0xFFFFFFFF00000000)) | csr.vids.astype(
            np.uint64
        )
        self.status = np.zeros(csr.num_vertices, dtype=np.int8)
        self.new_mis = np.zeros(csr.num_vertices, dtype=bool)

    def apply(self, step, inbox, glob):
        active = self.status == self._ACTIVE
        if step == 0:
            return {"active": int(active.sum())}
        if step % 2 == 1:  # receive active-neighbor min priorities → select
            min_in = np.full(self.csr.num_vertices, np.uint64(2**64 - 1))
            got = np.zeros(self.csr.num_vertices, dtype=bool)
            for msg in inbox:
                if msg is None or len(msg["dst"]) == 0:
                    continue
                li = self.csr.local_index(msg["dst"])
                np.minimum.at(min_in, li, msg["min"])
                got[li] = True
            # strict local minimum (priorities are unique), or no active nbr
            sel = active & (~got | (self.prio < min_in))
            self.status[sel] = self._MIS
            self.new_mis = sel
            return {"active": int((self.status == self._ACTIVE).sum())}
        # even step: receive MIS announcements → neighbors drop out
        for msg in inbox:
            if msg is None or len(msg["dst"]) == 0:
                continue
            li = self.csr.local_index(msg["dst"])
            out = self.status[li] == self._ACTIVE
            self.status[li[out]] = self._OUT
        return {"active": int((self.status == self._ACTIVE).sum())}

    def scatter(self, step):
        P = self.csr.num_parts
        dix = self.csr.dst_index()
        sorted_dst = self.csr.indices[dix.order]
        outbox, sent = [], 0
        if step % 2 == 0:  # active vertices send priorities
            edge_sel = (self.status == self._ACTIVE)[dix.src_row][dix.order]
            edge_val = self.prio[dix.src_row][dix.order]
            for p in range(P):
                s, e = dix.slices[p]
                sel = edge_sel[s:e]
                if not sel.any():
                    outbox.append(None)
                    continue
                dsts, mins = _group_min(sorted_dst[s:e][sel], edge_val[s:e][sel])
                outbox.append({"dst": dsts, "min": mins})
                sent += len(dsts)
            return outbox, {"sent": sent}
        # odd step: newly selected MIS members announce to neighbors
        edge_sel = self.new_mis[dix.src_row][dix.order]
        for p in range(P):
            s, e = dix.slices[p]
            sel = edge_sel[s:e]
            if not sel.any():
                outbox.append(None)
                continue
            dsts = np.unique(sorted_dst[s:e][sel])
            outbox.append({"dst": dsts})
            sent += len(dsts)
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table(
            {
                "vid": self.csr.vids,
                "status": self.status,
                "new_mis": self.new_mis,
            }
        )

    def load_state(self, table, step):
        self.status = table["status"].to_numpy().copy()
        self.new_mis = table["new_mis"].to_numpy().copy()

    def result_table(self):
        return pa.table(
            {"vid": self.csr.vids, "in_mis": self.status == self._MIS}
        )


# --------------------------------------------------------------------------
class MaximalMatchingProgram(VertexProgram):
    """Distributed maximal matching by the HANDSHAKE rule (the matching
    analogue of Luby's MIS; Israeli & Itai 1986 lineage, made
    deterministic): every round, each live vertex points along its
    minimum-priority live edge; an edge is matched when BOTH endpoints
    point at each other (the globally minimal live edge always is, so ≥ 1
    edge matches per round); matched vertices announce and their incident
    edges die. Edge priority = ``md5_lower64(f"{min}:{max}")`` — symmetric
    and SQL-replayable (``md5_number_lower(concat(...))``), ties broken by
    neighbor vid, so the run is deterministic and partition-count
    invariant.

    Cadence mirrors MIS: even steps scatter proposals (consumed at the
    next odd apply, which resolves mutual pairs), odd steps scatter death
    announcements (consumed at the next even apply, which kills edges).
    A live vertex whose edges have all died can never be proposed to
    again (a live edge needs two live endpoints), so it silently leaves
    the active count. → result (vid, partner), partner −1 if unmatched.
    """

    _ACTIVE, _MATCHED = np.int8(0), np.int8(1)

    def init(self, csr: CSRPartition):
        from ..functions.hashing import md5_lower64

        self.csr = csr
        rows = np.repeat(
            np.arange(csr.num_vertices, dtype=np.int64), np.diff(csr.indptr)
        )
        u = csr.vids[rows].astype(np.int64)
        v = csr.indices.astype(np.int64)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        self.eprio = md5_lower64(
            np.array([f"{a}:{b}" for a, b in zip(lo, hi)], dtype=object)
        )
        self.erow = rows
        self.edge_live = np.ones(csr.num_edges, dtype=bool)
        self.status = np.zeros(csr.num_vertices, dtype=np.int8)
        self.partner = np.full(csr.num_vertices, -1, dtype=np.int64)
        self.cur_target = np.full(csr.num_vertices, -1, dtype=np.int64)
        self.new_matched = np.zeros(csr.num_vertices, dtype=bool)

    def _n_active(self) -> int:
        live_row = np.zeros(self.csr.num_vertices, dtype=bool)
        if self.edge_live.any():
            live_row[np.unique(self.erow[self.edge_live])] = True
        return int((live_row & (self.status == self._ACTIVE)).sum())

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": self._n_active()}
        if step % 2 == 1:  # proposals arrive → resolve mutual pairs
            prop: dict[int, set] = {}
            for msg in inbox:
                if msg is None or len(msg["dst"]) == 0:
                    continue
                li = self.csr.local_index(msg["dst"])
                for i, src in zip(li, msg["src"]):
                    prop.setdefault(int(i), set()).add(int(src))
            self.new_matched[:] = False
            for i, senders in prop.items():
                t = self.cur_target[i]
                if self.status[i] == self._ACTIVE and t != -1 and t in senders:
                    self.status[i] = self._MATCHED
                    self.partner[i] = t
                    self.new_matched[i] = True
            return {"active": self._n_active()}
        # even step: death announcements → kill incident edges
        dead: list[np.ndarray] = []
        for msg in inbox:
            if msg is None or len(msg["dst"]) == 0:
                continue
            dead.append(msg["dead"])
        if dead:
            ds = np.unique(np.concatenate(dead))
            self.edge_live &= ~np.isin(
                self.csr.indices.astype(np.int64), ds
            )
            # announcements also retire our own matched rows' edges
            li = self.csr.local_index(
                ds[np.isin(ds, self.csr.vids.astype(np.int64))].astype(
                    self.csr.vids.dtype
                )
            )
            mask = np.zeros(self.csr.num_vertices, dtype=bool)
            mask[li] = True
            self.edge_live &= ~mask[self.erow]
        return {"active": self._n_active()}

    def scatter(self, step):
        P = self.csr.num_parts
        dix = self.csr.dst_index()
        outbox, sent = [], 0
        if step % 2 == 0:  # propose along the min live edge
            live = self.edge_live & (self.status[self.erow] == self._ACTIVE)
            self.cur_target[:] = -1
            idx = np.nonzero(live)[0]
            if len(idx):
                dstv = self.csr.indices.astype(np.int64)
                order = idx[np.lexsort((dstv[idx], self.eprio[idx], self.erow[idx]))]
                rows_first, first = np.unique(
                    self.erow[order], return_index=True
                )
                self.cur_target[rows_first] = dstv[order][first]
            src_vid = self.csr.vids.astype(np.int64)
            proposers = np.nonzero(self.cur_target != -1)[0]
            tgt = self.cur_target[proposers]
            tpart = part_for(tgt.astype(np.uint64), P)
            for p in range(P):
                m = tpart == p
                if not m.any():
                    outbox.append(None)
                    continue
                outbox.append(
                    {"dst": tgt[m].astype(np.uint64), "src": src_vid[proposers[m]]}
                )
                sent += int(m.sum())
            return outbox, {"sent": sent}
        # odd step: newly matched vertices announce to all their neighbors
        sorted_dst = self.csr.indices[dix.order]
        edge_sel = self.new_matched[dix.src_row][dix.order]
        dead_src = self.csr.vids[dix.src_row][dix.order].astype(np.int64)
        for p in range(P):
            s, e = dix.slices[p]
            sel = edge_sel[s:e]
            if not sel.any():
                outbox.append(None)
                continue
            outbox.append(
                {
                    "dst": sorted_dst[s:e][sel],
                    "dead": dead_src[s:e][sel],
                }
            )
            sent += int(sel.sum())
        return outbox, {"sent": sent}

    def state_table(self):
        """Per-vertex state + the per-edge live mask PACKED to bits (row 0
        of a list column): E/8 bytes per partition — the round-3 refusal
        priced this as "O(E)", but packed it is an order of magnitude
        below one message exchange, so checkpointing is now supported.
        ``cur_target`` is deliberately absent: it is recomputed by every
        even scatter before any odd apply reads it, and resume re-runs the
        checkpointed step's scatter."""
        n = self.csr.num_vertices
        packed = np.packbits(self.edge_live)
        off = np.zeros(n + 1, np.int32)
        off[1:] = len(packed)  # row 0 carries the mask; rows 1.. are empty
        return pa.table(
            {
                "vid": self.csr.vids,
                "status": pa.array(self.status, pa.int8()),
                "partner": pa.array(self.partner, pa.int64()),
                "new_matched": pa.array(self.new_matched, pa.bool_()),
                "edge_live": pa.ListArray.from_arrays(
                    pa.array(off), pa.array(packed, pa.uint8())
                ),
            }
        )

    def load_state(self, table, step):
        self.status = np.asarray(
            table["status"].to_numpy(zero_copy_only=False), np.int8
        ).copy()
        self.partner = np.asarray(
            table["partner"].to_numpy(zero_copy_only=False), np.int64
        ).copy()
        self.new_matched = np.asarray(
            table["new_matched"].to_numpy(zero_copy_only=False), bool
        ).copy()
        packed = np.asarray(
            table["edge_live"][0].as_py() if table.num_rows else [], np.uint8
        )
        self.edge_live = (
            np.unpackbits(packed, count=self.csr.num_edges).astype(bool)
            if self.csr.num_edges
            else np.ones(0, dtype=bool)
        )
        self.cur_target = np.full(self.csr.num_vertices, -1, dtype=np.int64)

    def result_table(self):
        return pa.table({"vid": self.csr.vids, "partner": self.partner})


# --------------------------------------------------------------------------
class LabelPropagationProgram(VertexProgram):
    """Synchronous community label propagation, deterministic tie-break.

    label_{t+1}(v) = min over { labels with max count among N(v)'s labels_t }.
    Initial label = vid. Runs ``iters`` steps or until no label changes.
    Messages are pre-aggregated (dst, label, count) triples per partition.
    """

    def init(self, csr: CSRPartition, iters=10):
        self.csr = csr
        self.iters = int(iters)
        self.label = csr.vids.copy()
        self.done = False

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": 1}
        # Unlike CC there is no per-partition frontier: every neighborhood's
        # full label multiset is needed each iteration, so scattering stops
        # only on GLOBAL convergence (previous step's folded active == 0 —
        # the aggregator-broadcast pattern, basic/Worker.h:158-215).
        if glob.get("active", 1) == 0 or step > self.iters:
            self.done = True
            return {"active": 0}
        dsts, labs, cnts = [], [], []
        for msg in inbox:
            if msg is None or len(msg["dst"]) == 0:
                continue
            dsts.append(msg["dst"]); labs.append(msg["label"]); cnts.append(msg["cnt"])
        if not dsts:
            return {"active": 0}
        dst = np.concatenate(dsts); lab = np.concatenate(labs); cnt = np.concatenate(cnts)
        li = self.csr.local_index(dst)
        # merge duplicate (vertex, label) across source partitions
        ulab, lab_dense = np.unique(lab, return_inverse=True)
        key = li.astype(np.uint64) << np.uint64(32) | lab_dense.astype(np.uint64)
        ukey, kinv = np.unique(key, return_inverse=True)
        tot = np.bincount(kinv, weights=cnt.astype(np.float64))
        kli = (ukey >> np.uint64(32)).astype(np.int64)
        klab = ulab[(ukey & np.uint64(0xFFFFFFFF)).astype(np.int64)]
        # per vertex: max count, tie → min label (lexsort: last key primary)
        order = np.lexsort((klab, -tot, kli))
        first_li, first_pos = np.unique(kli[order], return_index=True)
        winner = klab[order][first_pos]
        changed = winner != self.label[first_li]
        self.label[first_li] = winner
        if step >= self.iters:
            self.done = True
            return {"active": 0}
        return {"active": int(changed.sum())}

    def scatter(self, step):
        P = self.csr.num_parts
        if self.done:
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        edge_lab = self.label[dix.src_row][dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            if s == e:
                outbox.append(None)
                continue
            lab = edge_lab[s:e]
            ulab, lab_dense = np.unique(lab, return_inverse=True)
            key = dix.inverse[p].astype(np.uint64) << np.uint64(32) | lab_dense.astype(np.uint64)
            ukey, ucnt = np.unique(key, return_counts=True)
            outbox.append(
                {
                    "dst": dix.uniq_dst[p][(ukey >> np.uint64(32)).astype(np.int64)],
                    "label": ulab[(ukey & np.uint64(0xFFFFFFFF)).astype(np.int64)],
                    "cnt": ucnt.astype(np.int64),
                }
            )
            sent += len(ukey)
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table({"vid": self.csr.vids, "label": self.label,
                         "done": pa.array(np.full(self.csr.num_vertices, self.done, dtype=bool))})

    def load_state(self, table, step):
        self.label = table["label"].to_numpy().copy()
        dn = table["done"].to_numpy()
        self.done = bool(dn[0]) if len(dn) else False

    def result_table(self):
        return pa.table({"vid": self.csr.vids, "label": self.label})


# --------------------------------------------------------------------------
def _membership(indptr, indices, uniq, keys, li, targets):
    """Vectorized membership for (local row li, global target) pairs against a
    row-lexsorted adjacency (see CSRPartition._membership_keys)."""
    if len(uniq) == 0 or len(keys) == 0:
        return np.zeros(len(targets), dtype=bool)
    pos = np.searchsorted(uniq, targets)
    pos_c = np.minimum(pos, len(uniq) - 1)
    valid = uniq[pos_c] == targets
    qkey = li.astype(np.uint64) << np.uint64(32) | pos_c.astype(np.uint64)
    kpos = np.minimum(np.searchsorted(keys, qkey), len(keys) - 1)
    return valid & (keys[kpos] == qkey)


class TriangleCountProgram(VertexProgram):
    """Exact triangle counting by degree orientation + oriented-list exchange.

    Orient u→w iff (deg(w), w) > (deg(u), u); for every oriented edge (u,v),
    u ships N+(u) to v, which counts |N+(u) ∩ N+(v)| — each triangle counted
    exactly once, at its middle vertex. A third superstep routes +1 credits to
    the other two corners for exact per-vertex counts.

    Neighbor degrees come from the engine's attribute-exchange preprocessing
    (the analogue of the reference's PREPROCESS phase building ``nbs_set``,
    ``pregel_app_subgraph.h:55-63``). Message volume is Σ deg+(u)² — the
    orientation bounds it by O(E^1.5) regardless of hub skew, which is the
    standard web-scale mitigation for high-degree vertices.
    """

    needs_nbr_attrs = ("degree",)

    def init(self, csr: CSRPartition):
        self.csr = csr
        self.tri_global = 0
        self.per_vertex = np.zeros(csr.num_vertices, dtype=np.int64)
        self.credit_out: list | None = None
        deg = csr.degrees()
        src_row = csr.dst_index().src_row
        nbr_deg = csr.nbr_attr["degree"]
        own_deg = deg[src_row]
        own_vid = csr.vids[src_row]
        self._orient = (nbr_deg > own_deg) | ((nbr_deg == own_deg) & (csr.indices > own_vid))
        # N+ CSR (row-lexsorted subset keeps sorted-within-row property)
        self.np_counts = np.bincount(src_row[self._orient], minlength=csr.num_vertices)
        self.np_indptr = np.concatenate([[0], np.cumsum(self.np_counts)]).astype(np.int64)
        self.np_indices = csr.indices[self._orient]
        self._np_uniq = np.unique(self.np_indices) if len(self.np_indices) else self.np_indices
        dense = np.searchsorted(self._np_uniq, self.np_indices).astype(np.uint64)
        row = np.repeat(np.arange(csr.num_vertices, dtype=np.uint64), self.np_counts)
        self._np_keys = (row << np.uint64(32)) | dense

    def apply(self, step, inbox, glob):
        P = self.csr.num_parts
        if step == 1:
            # count intersections; build per-corner credits
            credit_dst = []
            for msg in inbox:
                if msg is None or len(msg["dst"]) == 0:
                    continue
                v = msg["dst"]              # receiving vertex per segment
                u = msg["src"]              # sender per segment
                lens = msg["lens"]
                data = msg["data"]          # concatenated N+(u) segments
                li_v = self.csr.local_index(v)
                li_elem = np.repeat(li_v, lens)
                hit = _membership(self.np_indptr, self.np_indices, self._np_uniq,
                                  self._np_keys, li_elem, data)
                nhit = int(hit.sum())
                self.tri_global += nhit
                if nhit:
                    np.add.at(self.per_vertex, li_elem[hit], 1)      # middle corner v
                    credit_dst.append(np.repeat(u, lens)[hit])       # corner u
                    credit_dst.append(data[hit])                     # corner w
            # pre-aggregate credits per destination partition
            self.credit_out = [None] * P
            if credit_dst:
                allc = np.concatenate(credit_dst)
                dpart = part_for(allc, P)
                order = np.argsort(dpart, kind="stable")
                sc = allc[order]; sp = dpart[order]
                bounds = np.searchsorted(sp, np.arange(P + 1))
                for p in range(P):
                    s, e = int(bounds[p]), int(bounds[p + 1])
                    if s == e:
                        continue
                    uniq, cnt = np.unique(sc[s:e], return_counts=True)
                    self.credit_out[p] = {"dst": uniq, "cnt": cnt}
            return {"active": 1}
        if step == 2:
            for msg in inbox:
                if msg is None or "cnt" not in msg or len(msg["dst"]) == 0:
                    continue
                li = self.csr.local_index(msg["dst"])
                np.add.at(self.per_vertex, li, msg["cnt"])
            return {"active": 0}
        return {"active": 1}

    def scatter(self, step):
        P = self.csr.num_parts
        if step == 0:
            dix = self.csr.dst_index()
            # oriented edges, regrouped by destination partition
            orient_sorted = self._orient[dix.order]
            sorted_dst = self.csr.indices[dix.order]
            src_row_sorted = dix.src_row[dix.order]
            outbox, sent = [], 0
            for p in range(P):
                s, e = dix.slices[p]
                sel = orient_sorted[s:e]
                if not sel.any():
                    outbox.append(None)
                    continue
                rows = src_row_sorted[s:e][sel]
                lens = self.np_counts[rows]
                data = self.np_indices[flat_gather(self.np_indptr[rows], lens)]
                outbox.append(
                    {
                        "dst": sorted_dst[s:e][sel],
                        "src": self.csr.vids[rows],
                        "lens": lens.astype(np.int64),
                        "data": data,
                    }
                )
                sent += int(sel.sum())
            return outbox, {"sent": sent}
        if step == 1 and self.credit_out is not None:
            out = self.credit_out
            self.credit_out = None
            sent = sum(len(m["dst"]) for m in out if m is not None)
            return out, {"sent": sent}
        return [None] * P, {"sent": 0}

    def state_table(self):
        return pa.table({"vid": self.csr.vids, "tri": self.per_vertex,
                         "tri_global": pa.array(np.full(self.csr.num_vertices, self.tri_global, dtype=np.int64))})

    def load_state(self, table, step):
        self.per_vertex = table["tri"].to_numpy().copy()
        g = table["tri_global"].to_numpy()
        self.tri_global = int(g[0]) if len(g) else 0

    def result_table(self):
        # degree rides along so downstream metrics (clustering coefficient)
        # need no join back to the edge table
        return pa.table(
            {
                "vid": self.csr.vids,
                "triangles": self.per_vertex,
                "degree": self.csr.degrees().astype(np.int64),
            }
        )

    def scalar_result(self):
        return {"triangles": self.tri_global}


# --------------------------------------------------------------------------
class KTrussProgram(TriangleCountProgram):
    """k-truss decomposition by iterated triangle-support peeling (Cohen 2008,
    "Trusses: cohesive subgraphs for social network analysis"): repeatedly
    delete every edge contained in fewer than k−2 triangles of the surviving
    subgraph; the fixpoint is the (maximal) k-truss.

    Distribution reuses the degree-oriented triangle machinery (each
    undirected edge has exactly ONE owner slot — the N+ list of its
    lower-(degree, vid) endpoint — so edge aliveness needs no cross-partition
    mirroring). Supersteps run in period-3 rounds:

    * phase 0 (``step % 3 == 0``) — decide from the driver-folded ``glob``
      whether the previous round removed anything anywhere (the aggregator
      broadcast, ``basic/Worker.h:158-215``); if yes, zero supports and ship
      every ALIVE oriented edge's alive-N+ list to its destination partition
      (volume Σ deg+(u)² = O(E^1.5), the same hub-skew bound as triangles).
    * phase 1 — count intersections at the middle vertex: support of the
      local (v,w) slot bumps in place; credits for the (u,v)/(u,w) slots are
      pre-aggregated per (owner, neighbor) and routed to u's partition.
    * phase 2 — apply credits, then peel: alive slots with support < k−2 die;
      local removal count is reported in stats (folded → next phase-0 glob).

    Support is recomputed from scratch every round, so rounds = peeling depth
    (sf0.01 co-purchase, k=6: 6 rounds) and no decremental bookkeeping is
    needed across partitions.
    """

    def init(self, csr: CSRPartition, k: int = 6):
        super().init(csr)
        self.k = int(k)
        self.thresh = self.k - 2
        n_slots = len(self.np_indices)
        self.np_row = np.repeat(
            np.arange(csr.num_vertices, dtype=np.int64), self.np_counts
        )
        self.alive = np.ones(n_slots, dtype=bool)
        self.support = np.zeros(n_slots, dtype=np.int64)
        self.credit_out = None
        self.done = False
        # csr.indices positions of the oriented slots (for scatter masking)
        self._slot_pos = np.nonzero(self._orient)[0]

    # ---- (owned local row, neighbor vid) → oriented-slot index ----------
    def _np_slot_lookup(self, li: np.ndarray, targets: np.ndarray):
        keys, uniq = self._np_keys, self._np_uniq
        if len(keys) == 0 or len(targets) == 0:
            z = np.zeros(len(targets), dtype=np.int64)
            return z, np.zeros(len(targets), dtype=bool)
        pos = np.searchsorted(uniq, targets)
        pos_c = np.minimum(pos, len(uniq) - 1)
        valid = uniq[pos_c] == targets
        qkey = li.astype(np.uint64) << np.uint64(32) | pos_c.astype(np.uint64)
        kpos = np.minimum(np.searchsorted(keys, qkey), len(keys) - 1)
        valid &= keys[kpos] == qkey
        return kpos.astype(np.int64), valid

    def apply(self, step, inbox, glob):
        phase = step % 3
        if phase == 0:
            if step > 0:
                if int(glob.get("removed", 0)) == 0:
                    self.done = True
                    return {"active": 0}
                self.support[:] = 0
            return {"active": 1}
        if phase == 1:
            # middle-vertex intersection counting + credit routing
            P = self.csr.num_parts
            cu, cn = [], []
            for msg in inbox:
                if msg is None or len(msg["dst"]) == 0:
                    continue
                lens = msg["lens"]
                data = msg["data"]
                li_elem = np.repeat(self.csr.local_index(msg["dst"]), lens)
                slots, valid = self._np_slot_lookup(li_elem, data)
                idx = np.nonzero(valid)[0]
                s2 = slots[idx]
                keep = self.alive[s2]
                idx = idx[keep]
                if len(idx) == 0:
                    continue
                np.add.at(self.support, s2[keep], 1)  # (v,w) slot, local
                u_elem = np.repeat(msg["src"], lens)
                v_elem = np.repeat(msg["dst"], lens)
                cu.append(u_elem[idx]); cn.append(v_elem[idx])   # (u,v)
                cu.append(u_elem[idx]); cn.append(data[idx])     # (u,w)
            self.credit_out = [None] * P
            if cu:
                u_all = np.concatenate(cu)
                n_all = np.concatenate(cn)
                dpart = part_for(u_all, P)
                order = np.lexsort((n_all, u_all, dpart))
                du, dn, dp = u_all[order], n_all[order], dpart[order]
                bounds = np.searchsorted(dp, np.arange(P + 1))
                for p in range(P):
                    s, e = int(bounds[p]), int(bounds[p + 1])
                    if s == e:
                        continue
                    su, sn = du[s:e], dn[s:e]
                    new = np.ones(e - s, dtype=bool)
                    new[1:] = (su[1:] != su[:-1]) | (sn[1:] != sn[:-1])
                    starts = np.nonzero(new)[0]
                    cnt = np.diff(np.concatenate([starts, [e - s]]))
                    self.credit_out[p] = {
                        "dst": su[starts], "nbr": sn[starts],
                        "cnt": cnt.astype(np.int64),
                    }
            return {"active": 1}
        # phase 2: apply remote credits, then peel
        for msg in inbox:
            if msg is None or "nbr" not in msg or len(msg["dst"]) == 0:
                continue
            li = self.csr.local_index(msg["dst"])
            slots, valid = self._np_slot_lookup(li, msg["nbr"])
            np.add.at(self.support, slots[valid], msg["cnt"][valid])
        sel = self.alive & (self.support < self.thresh)
        removed = int(sel.sum())
        if removed:
            self.alive[sel] = False
        return {"active": 1, "removed": removed}

    def scatter(self, step):
        P = self.csr.num_parts
        phase = step % 3
        if phase == 0 and not self.done:
            # alive-compacted N+ adjacency for this round
            aidx = np.nonzero(self.alive)[0]
            a_indices = self.np_indices[aidx]
            a_counts = np.bincount(
                self.np_row[aidx], minlength=self.csr.num_vertices
            ).astype(np.int64)
            a_indptr = np.concatenate([[0], np.cumsum(a_counts)]).astype(np.int64)
            alive_full = np.zeros(self.csr.num_edges, dtype=bool)
            alive_full[self._slot_pos] = self.alive
            dix = self.csr.dst_index()
            sel_sorted = alive_full[dix.order]
            sorted_dst = self.csr.indices[dix.order]
            src_row_sorted = dix.src_row[dix.order]
            outbox, sent = [], 0
            for p in range(P):
                s, e = dix.slices[p]
                sel = sel_sorted[s:e]
                if not sel.any():
                    outbox.append(None)
                    continue
                rows = src_row_sorted[s:e][sel]
                lens = a_counts[rows]
                data = a_indices[flat_gather(a_indptr[rows], lens)]
                outbox.append(
                    {
                        "dst": sorted_dst[s:e][sel],
                        "src": self.csr.vids[rows],
                        "lens": lens,
                        "data": data,
                    }
                )
                sent += int(sel.sum())
            return outbox, {"sent": sent}
        if phase == 1 and self.credit_out is not None:
            out = self.credit_out
            self.credit_out = None
            sent = sum(len(m["dst"]) for m in out if m is not None)
            return out, {"sent": sent}
        return [None] * P, {"sent": 0}

    def state_table(self):
        # slot rows (kind 0) + flattened pending-credit rows (kind 1) so a
        # post-apply checkpoint at ANY phase resumes exactly (scatter reruns)
        n = len(self.alive)
        kind = [np.zeros(n, dtype=np.int8)]
        alive = [self.alive]
        support = [self.support]
        cu = [np.zeros(n, dtype=np.int64)]
        cn = [np.zeros(n, dtype=np.int64)]
        cc = [np.zeros(n, dtype=np.int64)]
        if self.credit_out is not None:
            for m in self.credit_out:
                if m is None or len(m["dst"]) == 0:
                    continue
                ln = len(m["dst"])
                kind.append(np.ones(ln, dtype=np.int8))
                alive.append(np.zeros(ln, dtype=bool))
                support.append(np.zeros(ln, dtype=np.int64))
                cu.append(m["dst"].astype(np.int64))
                cn.append(m["nbr"].astype(np.int64))
                cc.append(m["cnt"].astype(np.int64))
        return pa.table(
            {
                "kind": np.concatenate(kind),
                "alive": np.concatenate(alive),
                "support": np.concatenate(support),
                "cu": np.concatenate(cu),
                "cn": np.concatenate(cn),
                "cc": np.concatenate(cc),
                "done": np.full(sum(len(x) for x in kind), self.done, dtype=bool),
            }
        )

    def load_state(self, table, step):
        kind = table["kind"].to_numpy()
        slot = kind == 0
        self.alive = table["alive"].to_numpy()[slot].copy()
        self.support = table["support"].to_numpy()[slot].copy()
        dn = table["done"].to_numpy()
        self.done = bool(dn[0]) if len(dn) else False
        self.credit_out = None
        if (kind == 1).any():
            P = self.csr.num_parts
            cu = table["cu"].to_numpy()[~slot]
            cn = table["cn"].to_numpy()[~slot]
            cc = table["cc"].to_numpy()[~slot]
            dpart = part_for(cu, P)
            self.credit_out = [None] * P
            for p in range(P):
                m = dpart == p
                if m.any():
                    self.credit_out[p] = {"dst": cu[m], "nbr": cn[m], "cnt": cc[m]}

    def result_table(self):
        rows = self.np_row[self.alive]
        src = self.csr.vids[rows]
        dst = self.np_indices[self.alive]
        return pa.table(
            {
                "src": np.minimum(src, dst).astype(np.int64),
                "dst": np.maximum(src, dst).astype(np.int64),
            }
        )

    def scalar_result(self):
        return {"truss_edges": int(self.alive.sum())}


# --------------------------------------------------------------------------
class AssortativityProgram(VertexProgram):
    """Degree assortativity — Pearson r of (deg(u), deg(v)) over the directed
    edge list of the symmetrized graph. One superstep, zero messages:
    neighbor degrees come from the PREPROCESS attribute exchange (the same
    ``nbs_set``-analogue the triangle program uses), each partition folds six
    partial sums over its own edges, and the engine's scalar fold adds them
    as exact Python ints. The coefficient itself is computed by the caller
    from the six sums (``pipelines/algorithms.assortativity``) with the same
    cast-then-operate order as the SQL oracle, so the result is bit-exact at
    any partition count. Per-partition sums are int64: deg·deg products
    overflow only past ~10⁹-degree hubs, far beyond a valid web graph.
    """

    needs_nbr_attrs = ("degree",)

    def init(self, csr: CSRPartition):
        self.csr = csr
        deg = csr.degrees().astype(np.int64)
        x = deg[csr.dst_index().src_row]                  # own degree per edge
        y = csr.nbr_attr["degree"].astype(np.int64)       # neighbor degree
        self._sums = {
            "asrt_n": int(len(y)),
            "asrt_sx": int(x.sum()),
            "asrt_sy": int(y.sum()),
            "asrt_sxy": int((x * y).sum()),
            "asrt_sxx": int((x * x).sum()),
            "asrt_syy": int((y * y).sum()),
        }

    def apply(self, step, inbox, glob):
        return {"active": 0}

    def state_table(self):
        return pa.table(
            {k: pa.array([v], pa.int64()) for k, v in self._sums.items()}
        )

    def load_state(self, table, step):
        self._sums = {c: int(table[c][0].as_py()) for c in table.column_names}

    def result_table(self):
        return self.state_table()

    def scalar_result(self):
        return dict(self._sums)


class SpectralRadiusProgram(VertexProgram):
    """Dominant-eigenvalue (spectral radius) estimate of the symmetric
    adjacency by EXACT-INTEGER power iteration: w_0 = 1 everywhere,
    w_t(v) = Σ_{u→v} w_{t-1}(u) — the t-walk counts ending at v — and
    λ ≈ max(w_T) / max(w_{T-1}) (max-norm Rayleigh quotient; converges
    as (λ₂/λ₁)^T). Walk counts stay int64 end to end (loud overflow
    guard at 2⁶¹ — Δ^T for web-scale max degree Δ bounds T ≈ 5), so the
    single float division replays bit-for-bit in SQL — no float
    fold-order posture needed, unlike PageRank."""

    def init(self, csr: CSRPartition, iters: int = 5):
        self.csr = csr
        self.iters = int(iters)
        self.x = np.ones(csr.num_vertices, dtype=np.int64)
        self.max_prev = 1
        self.max_cur = 1

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": 1}
        y = np.zeros(self.csr.num_vertices, dtype=np.int64)
        for msg in inbox:
            if msg is None or len(msg["dst"]) == 0:
                continue
            li = self.csr.local_index(msg["dst"])
            np.add.at(y, li, msg["sum"])
        if len(y) and int(y.max()) >= (1 << 61):
            raise OverflowError(
                "spectral_radius walk counts near int64 overflow; lower iters"
            )
        self.max_prev = int(self.x.max()) if len(self.x) else 0
        self.max_cur = int(y.max()) if len(y) else 0
        self.x = y
        return {"active": 0 if step >= self.iters else 1}

    def scatter(self, step):
        P = self.csr.num_parts
        if step >= self.iters:
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        edge_val = self.x[dix.src_row][dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            if s == e:
                outbox.append(None)
                continue
            sums = np.zeros(len(dix.uniq_dst[p]), dtype=np.int64)
            np.add.at(sums, dix.inverse[p], edge_val[s:e])
            outbox.append({"dst": dix.uniq_dst[p], "sum": sums})
            sent += len(sums)
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table(
            {
                "vid": self.csr.vids,
                "x": pa.array(self.x, pa.int64()),
                "max_prev": pa.array(
                    [self.max_prev] * self.csr.num_vertices, pa.int64()
                ),
            }
        )

    def load_state(self, table, step):
        self.x = np.asarray(
            table["x"].to_numpy(zero_copy_only=False), np.int64
        ).copy()
        self.max_prev = (
            int(table["max_prev"][0].as_py()) if table.num_rows else 1
        )
        self.max_cur = int(self.x.max()) if len(self.x) else 0

    def result_table(self):
        return pa.table(
            {
                "part": pa.array([self.csr.part], pa.int32()),
                "max_prev": pa.array([self.max_prev], pa.int64()),
                "max_cur": pa.array([self.max_cur], pa.int64()),
            }
        )


class WeightedAssortativityProgram(AssortativityProgram):
    """STRENGTH assortativity — Pearson r of (strength(u), strength(v))
    over the directed edge list, strength = Σ incident stored edge
    weights. Same one-superstep six-integer-sum fold as the degree
    version; the 'strength' attribute exchange is the PREPROCESS round.
    Falls back to degree (≡ AssortativityProgram) on unweighted layouts."""

    needs_nbr_attrs = ("strength",)

    def init(self, csr: CSRPartition):
        self.csr = csr
        if csr.eweights is None:
            st = csr.degrees().astype(np.int64)
        else:
            st = np.zeros(csr.num_vertices, dtype=np.int64)
            rows = np.repeat(
                np.arange(csr.num_vertices, dtype=np.int64),
                np.diff(csr.indptr),
            )
            np.add.at(st, rows, csr.eweights.astype(np.int64))
        x = st[csr.dst_index().src_row]
        y = csr.nbr_attr["strength"].astype(np.int64)
        self._sums = {
            "asrt_n": int(len(y)),
            "asrt_sx": int(x.sum()),
            "asrt_sy": int(y.sum()),
            "asrt_sxy": int((x * y).sum()),
            "asrt_sxx": int((x * x).sum()),
            "asrt_syy": int((y * y).sum()),
        }


# --------------------------------------------------------------------------
class RandomWalkProgram(VertexProgram):
    """Deterministic random-walk sampling (the GNN-training neighborhood
    sampler, made oracle-checkable): one walker starts at every vertex and
    takes ``walk_len`` steps; at step t a walker started at ``s`` standing
    on ``v`` moves to ``sorted_neighbors(v)[h(s,t) % deg(v)]`` with
    ``h(s,t) = (s·2654435761 + t·40503) mod 2147483647`` — pure int64
    arithmetic a SQL oracle reproduces with row_number() over sorted
    adjacency. Walkers live on their current vertex's partition, so the
    transition needs only local CSR state; each superstep routes walkers
    (start, current) through the regular exchange — walk state IS the
    message, nothing else is shuffled.
    """

    def init(self, csr: CSRPartition, walk_len=4, trace=False):
        self.csr = csr
        self.L = int(walk_len)
        self.start = csr.vids.astype(np.int64)
        self.cur_li = np.arange(csr.num_vertices, dtype=np.int64)  # local idx
        # trace mode (round 4, the DeepWalk corpus emitter): each partition
        # keeps the (start, t, vertex) visits of walkers it hosted — the
        # full walk paths, distributed by position, never folded centrally.
        self.trace = bool(trace)
        self.visits: list[tuple[np.ndarray, int, np.ndarray]] = (
            [(self.start, 0, self.start.copy())] if self.trace else []
        )

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": 1}
        starts, curs = [], []
        for msg in inbox:
            if msg is None or len(msg["start"]) == 0:
                continue
            starts.append(msg["start"])
            curs.append(msg["cur"])
        self.start = (
            np.concatenate(starts) if starts else np.empty(0, dtype=np.int64)
        )
        cur = np.concatenate(curs) if curs else np.empty(0, dtype=np.uint64)
        self.cur_li = self.csr.local_index(cur)
        if self.trace and len(self.start):
            self.visits.append((self.start, step, cur.view(np.int64).copy()))
        return {"active": 1 if step < self.L else 0}

    def scatter(self, step):
        P = self.csr.num_parts
        if step >= self.L:
            return [None] * P, {"sent": 0}
        deg = self.csr.degrees().astype(np.int64)[self.cur_li]
        t = np.int64(step + 1)
        h = (self.start * np.int64(2654435761) + t * np.int64(40503)) % np.int64(
            2147483647
        )
        nxt = self.csr.indices[
            self.csr.indptr[self.cur_li] + (h % deg)
        ]  # sorted-by-dst within row, matches row_number() ORDER BY dst
        dpart = part_for(nxt, P)
        order = np.argsort(dpart, kind="stable")
        sp, ss, sn = dpart[order], self.start[order], nxt[order]
        bounds = np.searchsorted(sp, np.arange(P + 1))
        outbox = []
        for p in range(P):
            s, e = int(bounds[p]), int(bounds[p + 1])
            outbox.append(
                {"start": ss[s:e], "cur": sn[s:e]} if e > s else None
            )
        return outbox, {"sent": int(len(sn))}

    def state_table(self):
        return pa.table(
            {
                "start": self.start,
                "cur": self.csr.vids[self.cur_li].astype(np.uint64),
            }
        )

    def load_state(self, table, step):
        self.start = table["start"].to_numpy().copy()
        self.cur_li = self.csr.local_index(
            table["cur"].to_numpy().astype(np.uint64)
        )

    def result_table(self):
        if self.trace:
            s = np.concatenate([v[0] for v in self.visits])
            t = np.concatenate(
                [np.full(len(v[0]), v[1], dtype=np.int64) for v in self.visits]
            )
            c = np.concatenate([v[2] for v in self.visits])
            return pa.table({"start_vid": s, "t": t, "vid": c})
        return pa.table(
            {
                "start_vid": self.start,
                "end_vid": self.csr.vids[self.cur_li].view(np.int64),
            }
        )


# --------------------------------------------------------------------------
def _label_csrs(csr, labels, nbr_label=None) -> dict:
    """Label-bucketed sub-CSRs over a partition's owned adjacency: for each
    query label, (indptr, indices) restricted to neighbors carrying that
    label. One vectorized mask+bincount pass per label; built once per actor
    per (multi-)query batch."""
    if nbr_label is None:
        nbr_label = csr.nbr_attr["label"]
    src_row = csr.dst_index().src_row
    out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for lab in labels:
        m = nbr_label == lab
        cnt = np.bincount(src_row[m], minlength=csr.num_vertices)
        indptr = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int64)
        out[lab] = (indptr, csr.indices[m])
    return out


def _hub_label_csrs(csr, labels) -> dict:
    """Label-bucketed sub-CSRs over the replicated hub-mirror adjacency
    (same layout as :func:`_label_csrs`, rows indexed by hub position)."""
    hv, hptr, hidx, hlab = csr.hub_mirror
    hub_row = np.repeat(np.arange(len(hv), dtype=np.int64), np.diff(hptr))
    out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for lab in labels:
        m = hlab == lab
        cnt = np.bincount(hub_row[m], minlength=len(hv))
        indptr = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int64)
        out[lab] = (indptr, hidx[m])
    return out


class MatchProgram(VertexProgram):
    """Distributed subgraph-isomorphism embedding counting (flat plan).

    The Ray-side re-expression of the reference's MATCH phase
    (``pregel_app_subgraph.h:211-513``): partial embeddings are dense integer
    matrices that flow down the query plan's DFS order; at each level the
    vertex mapped to the DFS parent *expands* along its adjacency (label
    filter from the CSR's exchanged neighbor labels — the analogue of
    ``SIValue.nbs_vector``'s per-neighbor labels), applies the row-local
    injectivity check (``pregel_app_subgraph.h:73-76``), and the candidate's
    owner *verifies* backward-edge adjacency against its own CSR
    (``check_feasibility``, ``pregel_app_subgraph.h:70-83``). The reference's
    branch compression / dummy vertices / conflict resolution
    (``SItypes/SIBranch.h``) are an encoding optimization with identical
    counts (SURVEY.md §7.5); the flat plan checks injectivity directly.

    Messages addressed to the local partition are processed in the same
    superstep (a work-queue cascade), so a query of depth k completes in at
    most 2k+1 exchanges and purely-local matches take one.

    ``plan`` is a dict from ``pipelines/match.build_plan``:
      labels[k], parent_pos[k], back_pos[k][…], same_label_pos[k][…].
    Expansion is chunked (``max_chunk`` rows) so a hub vertex's fan-out never
    materializes one giant matrix (the reference materializes the full
    mapping matrix per message, ``SItypes/SIMessage.h:20`` — unbounded).
    """

    needs_nbr_attrs = ("label",)
    wants_hub_mirror = True

    def init(self, csr: CSRPartition, plan=None, max_chunk: int = 2_000_000,
             per_root: bool = False, enumerate: bool = False,
             max_out_rows: int | None = None,
             lcsr: dict | None = None, hub_lcsr: dict | None = None):
        self.csr = csr
        self.plan = plan
        self.k = len(plan["labels"])
        self.count = 0
        # per-root counts (the reference's per-vertex mapping_count,
        # pregel_app_subgraph.h:44): leaf contributions are attributed to the
        # row's root data vertex and routed home as aggregated "n" messages.
        self.per_root = bool(per_root)
        self.root_counts = (
            np.zeros(csr.num_vertices, dtype=np.int64) if per_root else None
        )
        # ENUMERATE mode (the working form of the reference's disabled
        # per-embedding output, pregel_app_subgraph.h:716-747): leaf rows are
        # materialized full-width and kept per partition; result_table()
        # returns (v0..v{k-1}) mapped back to query-vertex ids. Embeddings
        # live wherever they were verified — dump via engine.dump() streams
        # each partition's shard straight to parquet, never via the driver.
        # Mutually exclusive with per_root; not checkpointed (a resumed run
        # recounts but does not re-emit prior embeddings).
        self.enumerate = bool(enumerate)
        if self.enumerate and self.per_root:
            raise ValueError("enumerate and per_root are mutually exclusive")
        self.emb_chunks: list[np.ndarray] = []
        self.max_chunk = int(max_chunk)
        # Output throttling: bound the TOTAL rows this partition emits per
        # superstep. Work beyond the budget is PARKED in an in-actor backlog
        # (never enters the exchange — unlike round-2's self-message defer,
        # whose parked rows inflated sent/outbox bytes past the budget), so
        # a deep/bushy query's frontier is spread across supersteps and
        # max_outbox_bytes is genuinely bounded by budget + one item's
        # emission (round-2 evidence: the 5-cycle match ships ~100M rows ≈
        # 3 GB in a single step unthrottled). A non-empty backlog keeps the
        # partition ACTIVE so the engine's active==0 && sent==0 convergence
        # still holds; max_steps must budget ≈ total_work / max_out_rows
        # extra supersteps. Backlog items checkpoint as self-addressed
        # outbox entries (state_table), so resume replays them.
        self.max_out_rows = None if max_out_rows is None else int(max_out_rows)
        self._outrows = 0
        self.backlog: list = []
        # trailing-leaf factor fold (plan["tail_start"], the SIBranch
        # factor-carry): active only when ≥ 2 trailing leaves fold (a single
        # trailing leaf keeps the original _expand_leaf path) and never in
        # ENUMERATE mode (which needs the actual rows).
        self.tail_start = (
            self.k if self.enumerate else int(plan.get("tail_start", self.k))
        )
        # internal-branch factor fold (plan["branches"], the SIBranch AND-OR
        # analogue, SItypes/SIBranch.h:81-131): label-disjoint subtrees are
        # counted per core row as sequential FACTORS — rows collapse back to
        # [core, product] between branches — instead of materializing the
        # branch cross product. Disabled in ENUMERATE mode (needs the rows).
        self.branches = (
            [] if self.enumerate else [tuple(b) for b in plan.get("branches") or []]
        )
        if self.branches:
            self.core_n = int(plan["core_n"])
            # global plan position -> (branch meta, remapped row columns)
            self.b_of: dict[int, tuple[int, int, int]] = {}
            self.b_back: dict[int, list[int]] = {}
            self.b_slp: dict[int, list[int]] = {}
            # expand-level same-label columns: prefer the plan's filtered
            # branch_slp (round 5 — shared-label mode drops cross-branch
            # references, recorded as plan["shared_pairs"] for the caller's
            # conflict subtraction); older plans carry the unfiltered lists.
            bslp_src = plan.get("branch_slp") or {}
            for bs, be, bt in self.branches:
                for j in range(bs, be):
                    self.b_of[j] = (bs, be, bt)
                    self.b_back[j] = [
                        self._rowcol(c, bs) for c in plan["back_pos"][j]
                    ]
                    self.b_slp[j] = [
                        self._rowcol(c, bs)
                        for c in bslp_src.get(j, plan["same_label_pos"][j])
                    ]
            self.fold_start = self.branches[0][0]
        else:
            self.fold_start = self.tail_start
        # outbuf[p][key] is a LIST of matrices, concatenated once at scatter
        # (repeated vstack would be quadratic in chunked expansions)
        self.outbuf: list[dict] = [dict() for _ in range(csr.num_parts)]
        self._nbr_label = csr.nbr_attr["label"]
        # label-bucketed sub-CSRs: adjacency restricted to neighbors with a
        # given query label, so expansion gathers only viable candidates —
        # the analogue of SIValue's per-neighbor labels driving label-filtered
        # expansion (pregel_app_subgraph.h:446-452) without the 1/|labels|
        # wasted gather+filter pass. An enclosing MultiMatchProgram passes a
        # prebuilt superset via ``lcsr``/``hub_lcsr`` (round 5: the per-label
        # candidate census is built ONCE per actor per batch, not once per
        # sub-query — the reference dev-driver's shared-preprocess point,
        # dev/basic/Worker.h:349-376).
        need = sorted(set(plan["labels"]))
        if lcsr is not None and all(l in lcsr for l in need):
            self.lcsr = lcsr
        else:
            self.lcsr = _label_csrs(csr, need, self._nbr_label)
        # hub mirror (skew): label-bucketed sub-CSR over replicated hub
        # adjacency; hub-anchored EXPAND rows are spread by row hash across
        # all partitions instead of hammering the hub's owner.
        self.hub_vids = None
        if csr.hub_mirror is not None:
            self.hub_vids = csr.hub_mirror[0]
            if hub_lcsr is not None and all(l in hub_lcsr for l in need):
                self.hub_lcsr = hub_lcsr
            else:
                self.hub_lcsr = _hub_label_csrs(csr, need)

    # -- core kernels ------------------------------------------------------
    def _emit(self, p: int, key: str, M: np.ndarray):
        """Append an out-message and account its rows (throttling budget)."""
        self.outbuf[p].setdefault(key, []).append(M)
        self._outrows += len(M)

    def _defer(self, kind: str, j: int, M: np.ndarray):
        """Over budget: park the work item in the in-actor backlog — it is
        re-queued at the next apply() without ever crossing the exchange."""
        self.backlog.append((kind, j, M))

    def _hub_member(self, hli: np.ndarray, targets: np.ndarray) -> np.ndarray:
        """Membership (hub row, target) against the mirrored hub adjacency."""
        hv, hptr, hidx, _ = self.csr.hub_mirror
        if not hasattr(self, "_hub_keys"):
            self._hub_uniq = np.unique(hidx)
            dense = np.searchsorted(self._hub_uniq, hidx).astype(np.uint64)
            row = np.repeat(np.arange(len(hv), dtype=np.uint64), np.diff(hptr))
            keys = (row << np.uint64(32)) | dense
            self._hub_keys = np.sort(keys)
        return _membership(hptr, hidx, self._hub_uniq, self._hub_keys, hli, targets)

    def _candidates_at(self, j: int, li: np.ndarray, lcsr=None):
        """Label-filtered neighbor gather: (cand, row_rep) for level j."""
        indptr, indices = (lcsr or self.lcsr)[self.plan["labels"][j]]
        starts = indptr[li]
        counts = indptr[li + 1] - starts
        cand = indices[flat_gather(starts, counts)]
        row_rep = np.repeat(np.arange(len(li), dtype=np.int64), counts)
        return cand, row_rep

    def _candidates(self, j: int, M: np.ndarray, li: np.ndarray, lcsr=None):
        return self._candidates_at(j, li, lcsr)

    def _expand(self, j: int, M: np.ndarray, li: np.ndarray, lcsr=None):
        """EXPAND level j: anchors = M[:, parent_pos[j]] (owned or hub-mirrored)."""
        plan = self.plan
        cand, row_rep = self._candidates(j, M, li, lcsr)
        if len(cand) == 0:
            return None
        Mrep = M[row_rep]  # gather once; reused by both checks and output
        slp = plan["same_label_pos"][j]
        if slp:
            dup = (Mrep[:, slp] == cand[:, None]).any(axis=1)
            if dup.any():
                keep = ~dup
                cand = cand[keep]; Mrep = Mrep[keep]
                if len(cand) == 0:
                    return None
        out = np.empty((len(cand), Mrep.shape[1] + 1), dtype=np.uint64)
        out[:, :-1] = Mrep
        out[:, -1] = cand
        return out

    def _expand_leaf(self, j, M, li, queue, lcsr=None, hub=False):
        """Leaf level (j == k-1): count without materializing full mappings.

        The Ray-side analogue of the reference's pseudo-child counting
        (``addPsdChildren``, ``pregel_app_subgraph.h:153-209`` — its key
        message-avoidance trick): when the leaf has no backward constraints
        beyond its parent, the count is Σ label-degree(anchor) minus the
        candidates already used at same-label positions — no candidate rows
        are built at all. With backward constraints, only the projected
        columns [back…, cand] are routed for remote adjacency verification.
        """
        plan = self.plan
        bp = plan["back_pos"][j]
        slp = plan["same_label_pos"][j]
        if self.enumerate:
            # materialize full-width leaf rows; backward-constrained rows are
            # verified (and stored) at the candidate's owner
            cand, row_rep = self._candidates_at(j, li, lcsr)
            if len(cand) == 0:
                return
            Mrep = M[row_rep]
            if slp:
                dup = (Mrep[:, slp] == cand[:, None]).any(axis=1)
                if dup.any():
                    keep = ~dup
                    cand = cand[keep]; Mrep = Mrep[keep]
                    if len(cand) == 0:
                        return
            rows = np.empty((len(cand), self.k), dtype=np.uint64)
            rows[:, :-1] = Mrep
            rows[:, -1] = cand
            if not bp:  # parent adjacency is guaranteed by the gather
                self.count += len(rows)
                self.emb_chunks.append(rows)
            else:
                self._route_full(rows, queue)
            return
        indptr, _ = (lcsr or self.lcsr)[plan["labels"][j]]
        if not bp:
            per_row = (indptr[li + 1] - indptr[li]).astype(np.int64)
            # subtract candidates that collide with same-label prefix entries:
            # M[:,c] is injective across the prefix, so each collision is a
            # distinct candidate — subtract the adjacency indicator directly.
            for c in slp:
                member = (
                    self._hub_member(li, M[:, c])
                    if hub
                    else self.csr.has_edges(li, M[:, c])
                )
                per_row -= member.astype(np.int64)
            self.count += int(per_row.sum())
            if self.per_root:
                self._credit_roots(M[:, 0], per_row, queue)
            return
        dd = plan.get("leaf_dedup")
        if dd is not None and not self.per_root:
            # pair-dedup (branch-compression analogue, SIBranch.h): collapse
            # rows sharing (parent, back targets); carry multiplicity; apply
            # the constant injectivity correction per original row.
            K = M[:, dd["key_cols"]]
            order = np.lexsort(K.T[::-1])
            Ks = K[order]
            if len(Ks) > 1:
                neq = np.any(Ks[1:] != Ks[:-1], axis=1)
                starts = np.concatenate([[0], np.nonzero(neq)[0] + 1])
            else:
                starts = np.array([0], dtype=np.int64)
            mult = np.diff(np.concatenate([starts, [len(Ks)]])).astype(np.uint64)
            Mu = Ks[starts]  # cols: [anchor, bp...]
            self.count -= dd["subtract"] * len(M)
            uli = (
                np.searchsorted(self.hub_vids, Mu[:, 0])
                if hub
                else self.csr.local_index(Mu[:, 0])
            )
            cand, row_rep = self._candidates_at(j, uli, lcsr)
            if len(cand) == 0:
                return
            proj = np.empty((len(cand), Mu.shape[1] + 1), dtype=np.uint64)
            proj[:, : Mu.shape[1] - 1] = Mu[:, 1:][row_rep]  # back targets
            proj[:, -2] = cand
            proj[:, -1] = mult[row_rep]
            self._route_mult(proj, queue)
            return
        cand, row_rep = self._candidates(j, M, li, lcsr)
        if len(cand) == 0:
            return
        if slp:  # column-sliced gather: never materialize full-width copies
            Ms = M[:, slp]
            dup = (Ms[row_rep] == cand[:, None]).any(axis=1)
            if dup.any():
                keep = ~dup
                cand = cand[keep]; row_rep = row_rep[keep]
                if len(cand) == 0:
                    return
        extra = 1 if self.per_root else 0  # root column rides along
        proj = np.empty((len(cand), len(bp) + 1 + extra), dtype=np.uint64)
        if extra:
            proj[:, 0] = M[:, 0][row_rep]
        proj[:, extra:-1] = M[:, bp][row_rep]
        proj[:, -1] = cand
        self._route_leaf(proj, queue)

    def _is_hub(self, vids: np.ndarray) -> np.ndarray | None:
        if self.hub_vids is None or len(self.hub_vids) == 0:
            return None
        pos = np.minimum(np.searchsorted(self.hub_vids, vids), len(self.hub_vids) - 1)
        m = self.hub_vids[pos] == vids
        return m if m.any() else None

    def _owner_of(self, M: np.ndarray, anchors: np.ndarray) -> np.ndarray:
        """Owner partition per row; hub-anchored rows spread by full-row hash
        (any partition serves them from the mirror) — the skew mitigation."""
        owner = part_for(anchors, self.csr.num_parts)
        is_hub = self._is_hub(anchors)
        if is_hub is not None:
            h = np.zeros(len(M), dtype=np.uint64)
            for c in range(M.shape[1]):  # cheap full-row hash
                h = h * np.uint64(0x9E3779B97F4A7C15) + M[:, c]
            owner = np.where(
                is_hub, (h % np.uint64(self.csr.num_parts)).astype(np.int32), owner
            )
        return owner

    def _fold_tail(self, j: int, M: np.ndarray, queue: list,
                   li: np.ndarray | None = None, hub: bool = False):
        """Tail factor fold: M = [prefix (tail_start cols), product].

        Multiplies each row's running product by this tail leaf's candidate
        count (label-degree of the anchor, minus same-label-prefix adjacency
        indicators, minus the same-(parent,label) falling-factorial
        decrement) and routes the narrow row to the next tail leaf's anchor
        owner — the factors cross the exchange, never the branch product
        (SIBranch.h:81-131). ``li``/``hub`` are passed by the "e"/"h"
        entry (rows already owner-split); "p" arrivals split here."""
        pp = self.plan["parent_pos"][j]
        if li is None:
            anchors = M[:, pp]
            is_hub = self._is_hub(anchors)
            if is_hub is not None and is_hub.any():
                if (~is_hub).any():
                    Mo = M[~is_hub]
                    self._fold_tail(
                        j, Mo, queue, li=self.csr.local_index(Mo[:, pp])
                    )
                Mh = M[is_hub]
                self._fold_tail(
                    j, Mh, queue,
                    li=np.searchsorted(self.hub_vids, Mh[:, pp]), hub=True,
                )
                return
            li = self.csr.local_index(anchors)
        indptr, _ = (self.hub_lcsr if hub else self.lcsr)[self.plan["labels"][j]]
        f = (indptr[li + 1] - indptr[li]).astype(np.int64)
        for c in self.plan["tail_slp"][j]:
            member = (
                self._hub_member(li, M[:, c])
                if hub
                else self.csr.has_edges(li, M[:, c])
            )
            f -= member.astype(np.int64)
        f -= self.plan["tail_dec"][j]
        np.maximum(f, 0, out=f)  # empty candidate set → the row contributes 0
        prod = M[:, -1].astype(np.int64) * f
        if j == self.k - 1:
            self.count += int(prod.sum())
            if self.per_root:
                self._credit_roots(M[:, 0], prod, queue)
            return
        keep = prod > 0
        if not keep.any():
            return
        out = M[keep].copy() if not keep.all() else M.copy()
        out[:, -1] = prod[keep].astype(np.uint64)
        self._route_tail(j + 1, out, queue)

    # -- internal-branch factor fold (round 4) -----------------------------
    def _rowcol(self, q: int, bs: int) -> int:
        """Global plan position -> row column in branch mode.

        Branch rows are [core (core_n), product, own-branch cols...]; q in
        core keeps its position, q in the CURRENT branch (start bs) lands
        after the product column. Label-disjointness + the no-cross-edge
        rule guarantee no reference into another branch."""
        return q if q < self.core_n else self.core_n + 1 + (q - bs)

    def _lim(self) -> int:
        return (
            self.max_chunk
            if self.max_out_rows is None
            else max(1, min(self.max_chunk, self.max_out_rows - self._outrows))
        )

    def _route_generic(self, kind: str, j: int, M: np.ndarray, queue: list,
                       anchor_col: int):
        """Owner-split rows by M[:, anchor_col] (hub rows hash-spread)."""
        owner = self._owner_of(M, M[:, anchor_col])
        order = np.argsort(owner, kind="stable")
        Ms = M[order]; po = owner[order]
        bounds = np.searchsorted(po, np.arange(self.csr.num_parts + 1))
        for p in range(self.csr.num_parts):
            s, e = int(bounds[p]), int(bounds[p + 1])
            if s == e:
                continue
            if p == self.csr.part:
                queue.append((kind, j, Ms[s:e]))
            else:
                self._emit(p, f"{kind}{j}", Ms[s:e])

    def _preagg_core(self, M: np.ndarray) -> np.ndarray:
        """Collapse [core..., product] rows sharing the core columns by
        summing products (sound by linearity: partial sums that stay split —
        across partitions or supersteps — multiply through the remaining
        branches and add up to the same total)."""
        if len(M) <= 1:
            return M
        C = M[:, :-1]
        order = np.lexsort(C.T[::-1])
        Cs = C[order]
        neq = np.any(Cs[1:] != Cs[:-1], axis=1)
        starts = np.concatenate([[0], np.nonzero(neq)[0] + 1])
        sums = np.add.reduceat(M[order, -1].astype(np.int64), starts)
        out = np.empty((len(starts), M.shape[1]), dtype=np.uint64)
        out[:, :-1] = Cs[starts]
        out[:, -1] = sums.astype(np.uint64)
        return out

    def _branch_level(self, j: int, M: np.ndarray, queue: list,
                      li: np.ndarray | None = None, hub: bool = False):
        """Process branch level j (rows at the anchor's owner / hub-spread).

        M = [core, product, own-branch cols so far]. Levels below the
        branch-tail start EXPAND (materializing the candidate column and
        routing to candidate-owner verification, like the flat e->v path);
        branch-tail levels FOLD into the product (``_fold_branch``)."""
        bs, be, bt = self.b_of[j]
        pp_col = self._rowcol(self.plan["parent_pos"][j], bs)
        if li is None:
            anchors = M[:, pp_col]
            is_hub = self._is_hub(anchors)
            if is_hub is not None and is_hub.any():
                if (~is_hub).any():
                    Mo = M[~is_hub]
                    self._branch_level(
                        j, Mo, queue, li=self.csr.local_index(Mo[:, pp_col])
                    )
                Mh = M[is_hub]
                self._branch_level(
                    j, Mh, queue,
                    li=np.searchsorted(self.hub_vids, Mh[:, pp_col]), hub=True,
                )
                return
            li = self.csr.local_index(anchors)
        if j >= bt:
            self._fold_branch(j, M, queue, li, hub)
            return
        lim = self._lim()
        lcsr = self.hub_lcsr if hub else None
        indptr = (lcsr or self.lcsr)[self.plan["labels"][j]][0]
        csum = np.cumsum(indptr[li + 1] - indptr[li])
        if len(csum) and csum[-1] > lim and len(M) > 1:
            cut = max(1, int(np.searchsorted(csum, lim)))
            queue.append(("B", j, M[cut:]))
            M, li = M[:cut], li[:cut]
        cand, row_rep = self._candidates_at(j, li, lcsr)
        if len(cand) == 0:
            return
        Mrep = M[row_rep]
        slp = self.b_slp[j]
        if slp:
            dup = (Mrep[:, slp] == cand[:, None]).any(axis=1)
            if dup.any():
                keep = ~dup
                cand = cand[keep]; Mrep = Mrep[keep]
                if len(cand) == 0:
                    return
        out = np.empty((len(cand), Mrep.shape[1] + 1), dtype=np.uint64)
        out[:, :-1] = Mrep
        out[:, -1] = cand
        self._route_generic("C", j, out, queue, anchor_col=out.shape[1] - 1)

    def _fold_branch(self, j: int, M: np.ndarray, queue: list,
                     li: np.ndarray, hub: bool):
        """Branch-tail fold: product *= this leaf's candidate count (label
        degree of the anchor, minus same-label carried-column adjacency
        indicators, minus the within-run falling-factorial decrement) — the
        within-branch mirror of ``_fold_tail``'s exactness rules."""
        bs, be, bt = self.b_of[j]
        indptr, _ = (self.hub_lcsr if hub else self.lcsr)[self.plan["labels"][j]]
        f = (indptr[li + 1] - indptr[li]).astype(np.int64)
        for c in self.plan["btail_slp"][j]:
            member = (
                self._hub_member(li, M[:, c])
                if hub
                else self.csr.has_edges(li, M[:, c])
            )
            f -= member.astype(np.int64)
        f -= self.plan["btail_dec"][j]
        np.maximum(f, 0, out=f)
        prod = M[:, self.core_n].astype(np.int64) * f
        keep = prod > 0
        if not keep.any():
            return
        M2 = M[keep].copy() if not keep.all() else M.copy()
        M2[:, self.core_n] = prod[keep].astype(np.uint64)
        self._branch_next(j, M2, queue)

    def _branch_verify(self, j: int, M: np.ndarray, queue: list):
        """Verify branch candidates at their owner: backward adjacency
        (remapped row columns) + LDF degree pruning, like the flat 'v'."""
        bs, be, bt = self.b_of[j]
        qd = self.plan.get("qdeg")
        ok = self._adjacency_ok(
            M, M.shape[1] - 1, self.b_back[j], qd[j] if qd is not None else 0
        )
        if not ok.any():
            return
        out = M if ok.all() else M[ok]
        self._branch_next(j, out, queue)

    def _branch_next(self, j: int, M: np.ndarray, queue: list):
        bs, be, bt = self.b_of[j]
        if j + 1 < be:
            pp_col = self._rowcol(self.plan["parent_pos"][j + 1], bs)
            self._route_generic("B", j + 1, M, queue, anchor_col=pp_col)
        else:
            self._branch_done(be, M, queue)

    def _branch_done(self, be: int, M: np.ndarray, queue: list):
        """Branch complete: collapse to [core, product] and dispatch to the
        next branch, the global tail fold, or the final count."""
        rows = self._preagg_core(np.ascontiguousarray(M[:, : self.core_n + 1]))
        bi = next(i for i, b in enumerate(self.branches) if b[1] == be)
        if bi + 1 < len(self.branches):
            nb = self.branches[bi + 1][0]
            self._route_generic(
                "B", nb, rows, queue, anchor_col=self.plan["parent_pos"][nb]
            )
        elif self.tail_start < self.k:
            self._route_tail(self.tail_start, rows, queue)
        else:
            prods = rows[:, -1].astype(np.int64)
            self.count += int(prods.sum())
            if self.per_root:
                self._credit_roots(rows[:, 0], prods, queue)

    def _route_tail(self, j: int, M: np.ndarray, queue: list):
        """Route tail factor rows by the NEXT tail leaf's anchor owner
        (hub anchors hash-spread, like _route)."""
        owner = self._owner_of(M, M[:, self.plan["parent_pos"][j]])
        order = np.argsort(owner, kind="stable")
        Ms = M[order]; po = owner[order]
        bounds = np.searchsorted(po, np.arange(self.csr.num_parts + 1))
        for p in range(self.csr.num_parts):
            s, e = int(bounds[p]), int(bounds[p + 1])
            if s == e:
                continue
            if p == self.csr.part:
                queue.append(("p", j, Ms[s:e]))
            else:
                self._emit(p, f"p{j}", Ms[s:e])

    def _route_mult(self, proj: np.ndarray, queue: list):
        """Route dedup leaf rows [back…, cand, mult] by the candidate's owner."""
        owner = self._owner_of(proj, proj[:, -2])
        order = np.argsort(owner, kind="stable")
        Ms = proj[order]; po = owner[order]
        bounds = np.searchsorted(po, np.arange(self.csr.num_parts + 1))
        for p in range(self.csr.num_parts):
            s, e = int(bounds[p]), int(bounds[p + 1])
            if s == e:
                continue
            if p == self.csr.part:
                queue.append(("m", self.k - 1, Ms[s:e]))
            else:
                self._emit(p, f"m{self.k - 1}", Ms[s:e])

    def _route_full(self, rows: np.ndarray, queue: list):
        """ENUMERATE: route full-width leaf rows to the candidate's owner."""
        owner = self._owner_of(rows, rows[:, -1])
        order = np.argsort(owner, kind="stable")
        Ms = rows[order]; po = owner[order]
        bounds = np.searchsorted(po, np.arange(self.csr.num_parts + 1))
        for p in range(self.csr.num_parts):
            s, e = int(bounds[p]), int(bounds[p + 1])
            if s == e:
                continue
            if p == self.csr.part:
                queue.append(("f", self.k - 1, Ms[s:e]))
            else:
                self._emit(p, f"f{self.k - 1}", Ms[s:e])

    def _store_leaf_full(self, M: np.ndarray):
        """ENUMERATE: verify backward adjacency of the full-width leaf rows
        and keep the survivors."""
        j = self.k - 1
        ok = self._adjacency_ok(M, j, self.plan["back_pos"][j], 0)
        sel = M[ok] if not ok.all() else M
        if len(sel):
            self.count += len(sel)
            self.emb_chunks.append(sel)

    def _count_leaf_mult(self, M: np.ndarray):
        """Verify dedup rows [back…, cand, mult]; add multiplicities."""
        ok = self._adjacency_ok(M, M.shape[1] - 2, range(M.shape[1] - 2), 0)
        self.count += int(M[ok, -1].view(np.int64).sum())

    def _route_leaf(self, proj: np.ndarray, queue: list):
        """Route projected leaf rows by owner of the candidate (last col)."""
        owner = self._owner_of(proj, proj[:, -1])
        order = np.argsort(owner, kind="stable")
        Ms = proj[order]; po = owner[order]
        bounds = np.searchsorted(po, np.arange(self.csr.num_parts + 1))
        for p in range(self.csr.num_parts):
            s, e = int(bounds[p]), int(bounds[p + 1])
            if s == e:
                continue
            if p == self.csr.part:
                queue.append(("c", self.k - 1, Ms[s:e]))
            else:
                self._emit(p, f"c{self.k - 1}", Ms[s:e])

    def _adjacency_ok(self, M: np.ndarray, cand_col: int, check_cols, min_deg: int):
        """Per-row feasibility of candidate M[:, cand_col]: degree ≥ min_deg
        and adjacency to every M[:, c] for c in check_cols. Owned candidates
        use the local CSR; hub candidates the mirror (either may appear here
        because hub rows are hash-spread)."""
        cand = M[:, cand_col]
        ok = np.ones(len(M), dtype=bool)
        is_hub = self._is_hub(cand)
        owned = ~is_hub if is_hub is not None else np.ones(len(M), dtype=bool)
        if owned.any():
            li = self.csr.local_index(cand[owned])
            sub = np.ones(int(owned.sum()), dtype=bool)
            if min_deg > 1:
                sub &= (self.csr.indptr[li + 1] - self.csr.indptr[li]) >= min_deg
            for c in check_cols:
                sub &= self.csr.has_edges(li, M[owned, c])
            ok[owned] = sub
        if is_hub is not None and is_hub.any():
            hv, hptr, _, _ = self.csr.hub_mirror
            hli = np.searchsorted(hv, cand[is_hub])
            sub = np.ones(int(is_hub.sum()), dtype=bool)
            if min_deg > 1:
                sub &= (hptr[hli + 1] - hptr[hli]) >= min_deg
            for c in check_cols:
                sub &= self._hub_member(hli, M[is_hub, c])
            ok[is_hub] = sub
        return ok

    def _credit_roots(self, roots: np.ndarray, cnts: np.ndarray, queue: list):
        """Attribute leaf counts to their root vertices (owner-routed,
        pre-aggregated per root — an 'n' message)."""
        nz = cnts != 0
        roots, cnts = roots[nz], cnts[nz]
        if len(roots) == 0:
            return
        uniq, inv = np.unique(roots, return_inverse=True)
        tot = np.bincount(inv, weights=cnts.astype(np.float64)).astype(np.int64)
        owner = part_for(uniq, self.csr.num_parts)
        for p in np.unique(owner):
            m = owner == p
            if p == self.csr.part:
                li = self.csr.local_index(uniq[m])
                np.add.at(self.root_counts, li, tot[m])
            else:
                self._emit(
                    p, "n0", np.column_stack([uniq[m], tot[m].astype(np.uint64)])
                )

    def _count_leaf(self, M: np.ndarray, queue: list):
        """Verify projected leaf rows [root?, back…, cand] and count survivors."""
        extra = 1 if self.per_root else 0
        ok = self._adjacency_ok(M, M.shape[1] - 1, range(extra, M.shape[1] - 1), 0)
        self.count += int(ok.sum())
        if self.per_root:
            self._credit_roots(M[ok, 0], np.ones(int(ok.sum()), dtype=np.int64), queue)

    def _verify(self, j: int, M: np.ndarray):
        """VERIFY level j: candidates = M[:, j].

        Backward-adjacency (check_feasibility, pregel_app_subgraph.h:70-83)
        plus LDF degree pruning (plan["qdeg"]) — both necessary conditions,
        so counts are unchanged while doomed subtrees die early.
        """
        qd = self.plan.get("qdeg")
        ok = self._adjacency_ok(
            M, j, self.plan["back_pos"][j], qd[j] if qd is not None else 0
        )
        if ok.all():
            return M
        if not ok.any():
            return None
        return M[ok]

    def _route(self, kind: str, j: int, M: np.ndarray, local_queue: list):
        """Split rows by owner partition: local → queue, remote → outbuf.

        Hub-anchored EXPAND rows are spread by a full-row hash instead of the
        anchor's owner (any partition can expand them from the mirror) —
        this is what keeps hot web hubs from serializing a superstep.
        """
        anchor_col = self.plan["parent_pos"][j] if kind == "e" else j
        owner = self._owner_of(M, M[:, anchor_col])
        if (owner == self.csr.part).all():
            local_queue.append((kind, j, M))
            return
        order = np.argsort(owner, kind="stable")
        Ms = M[order]; po = owner[order]
        bounds = np.searchsorted(po, np.arange(self.csr.num_parts + 1))
        for p in range(self.csr.num_parts):
            s, e = int(bounds[p]), int(bounds[p + 1])
            if s == e:
                continue
            if p == self.csr.part:
                local_queue.append((kind, j, Ms[s:e]))
            else:
                self._emit(p, f"{kind}{j}", Ms[s:e])

    def _process(self, queue: list):
        k = self.k
        while queue:
            kind, j, M = queue.pop()
            if (
                self.max_out_rows is not None
                and self._outrows >= self.max_out_rows
                and kind != "n"  # credits are tiny pre-aggregated rows
            ):
                self._defer(kind, j, M)
                continue
            # per-item processing cap: the smaller of the materialization
            # bound and the REMAINING emission budget, so one item's output
            # cannot overshoot max_out_rows by more than ~one row's fanout
            lim = (
                self.max_chunk
                if self.max_out_rows is None
                else max(1, min(self.max_chunk, self.max_out_rows - self._outrows))
            )
            if kind == "e":
                anchors = M[:, self.plan["parent_pos"][j]]
                if self.hub_vids is not None and len(self.hub_vids):
                    pos = np.minimum(
                        np.searchsorted(self.hub_vids, anchors), len(self.hub_vids) - 1
                    )
                    is_hub = self.hub_vids[pos] == anchors
                    if is_hub.any():  # split: hub rows expand from the mirror
                        queue.append(("h", j, M[is_hub]))
                        M = M[~is_hub]
                        if len(M) == 0:
                            continue
                        anchors = M[:, self.plan["parent_pos"][j]]
                # chunk by OUTPUT volume: a frontier chunk times hub degrees
                # must never materialize one giant matrix (the reference's
                # unbounded mapping matrices, SItypes/SIMessage.h:20).
                li = self.csr.local_index(anchors)
                indptr = self.lcsr[self.plan["labels"][j]][0]
                csum = np.cumsum(indptr[li + 1] - indptr[li])
                if csum[-1] > lim and len(M) > 1:
                    cut = max(1, int(np.searchsorted(csum, lim)))
                    queue.append(("e", j, M[cut:]))
                    M, li = M[:cut], li[:cut]
                if j == self.fold_start and j < k - 1:
                    # enter the fold region: append product=1, then either
                    # the branch fold (round 4) or the trailing-leaf fold
                    Mp = np.empty((len(M), M.shape[1] + 1), dtype=np.uint64)
                    Mp[:, :-1] = M
                    Mp[:, -1] = 1
                    if self.branches:
                        self._branch_level(j, Mp, queue, li=li)
                    else:
                        self._fold_tail(j, Mp, queue, li=li)
                elif j == k - 1:
                    self._expand_leaf(j, M, li, queue)
                else:
                    out = self._expand(j, M, li)
                    if out is not None:
                        self._route("v", j, out, queue)
            elif kind == "h":  # hub-anchored expand via the mirror
                hli = np.searchsorted(
                    self.hub_vids, M[:, self.plan["parent_pos"][j]]
                )
                indptr = self.hub_lcsr[self.plan["labels"][j]][0]
                csum = np.cumsum(indptr[hli + 1] - indptr[hli])
                if csum[-1] > lim and len(M) > 1:
                    cut = max(1, int(np.searchsorted(csum, lim)))
                    queue.append(("h", j, M[cut:]))
                    M, hli = M[:cut], hli[:cut]
                if j == self.fold_start and j < k - 1:
                    Mp = np.empty((len(M), M.shape[1] + 1), dtype=np.uint64)
                    Mp[:, :-1] = M
                    Mp[:, -1] = 1
                    if self.branches:
                        self._branch_level(j, Mp, queue, li=hli, hub=True)
                    else:
                        self._fold_tail(j, Mp, queue, li=hli, hub=True)
                elif j == k - 1:
                    self._expand_leaf(j, M, hli, queue, lcsr=self.hub_lcsr, hub=True)
                else:
                    out = self._expand(j, M, hli, lcsr=self.hub_lcsr)
                    if out is not None:
                        self._route("v", j, out, queue)
            elif kind == "p":  # tail factor rows [prefix, product]
                if len(M) > lim:
                    queue.append((kind, j, M[lim:]))
                    M = M[:lim]
                self._fold_tail(j, M, queue)
            elif kind == "B":  # branch-mode level [core, product, branch…]
                if len(M) > lim:
                    queue.append((kind, j, M[lim:]))
                    M = M[:lim]
                self._branch_level(j, M, queue)
            elif kind == "C":  # branch candidate verify at candidate owner
                if len(M) > lim:
                    queue.append((kind, j, M[lim:]))
                    M = M[:lim]
                self._branch_verify(j, M, queue)
            elif kind == "c":
                if len(M) > lim:
                    queue.append((kind, j, M[lim:]))
                    M = M[:lim]
                self._count_leaf(M, queue)
            elif kind == "m":  # dedup leaf rows with multiplicities
                if len(M) > lim:
                    queue.append((kind, j, M[lim:]))
                    M = M[:lim]
                self._count_leaf_mult(M)
            elif kind == "f":  # ENUMERATE: full-width leaf rows to verify+keep
                if len(M) > lim:
                    queue.append((kind, j, M[lim:]))
                    M = M[:lim]
                self._store_leaf_full(M)
            elif kind == "n":  # per-root count credits arriving home
                li = self.csr.local_index(M[:, 0])
                np.add.at(self.root_counts, li, M[:, 1].view(np.int64))
            else:
                if len(M) > lim:
                    queue.append((kind, j, M[lim:]))
                    M = M[:lim]
                out = self._verify(j, M)
                if out is None or len(out) == 0:
                    continue
                if j == k - 1:
                    self.count += len(out)
                else:
                    self._route("e", j + 1, out, queue)

    # -- protocol ----------------------------------------------------------
    def apply(self, step, inbox, glob):
        queue: list = self.backlog  # parked over-budget work goes first
        self.backlog = []
        if step == 0:
            lab0 = self.plan["labels"][0]
            mask = self.csr.labels == lab0
            qd = self.plan.get("qdeg")
            if qd is not None and qd[0] > 0:  # LDF root filter (M2 analogue)
                mask &= self.csr.degrees() >= qd[0]
            roots = self.csr.vids[mask]
            if len(roots):
                M = roots[:, None].astype(np.uint64)
                if self.k == 1:
                    self.count += len(M)
                    if self.enumerate:
                        self.emb_chunks.append(M)
                    if self.per_root:
                        self._credit_roots(
                            roots, np.ones(len(roots), dtype=np.int64), queue
                        )
                else:
                    self._route("e", 1, M, queue)
        else:
            for msg in inbox:
                if not msg:
                    continue
                for key, M in msg.items():
                    queue.append((key[0], int(key[1:]), M))
        self._process(queue)
        # a non-empty backlog must keep the engine running even when this
        # superstep's emissions were all parked (sent == 0)
        return {"active": sum(len(M) for _, _, M in self.backlog)}

    def scatter(self, step):
        out, sent = [], 0
        for p in range(self.csr.num_parts):
            buf = self.outbuf[p]
            if buf:
                merged = {
                    k: (v[0] if len(v) == 1 else np.concatenate(v))
                    for k, v in buf.items()
                }
                out.append(merged)
                sent += sum(len(m) for m in merged.values())
            else:
                out.append(None)
        self.outbuf = [dict() for _ in range(self.csr.num_parts)]
        self._outrows = 0
        return out, {"sent": sent}

    def state_table(self):
        # count + buffered out-messages (flattened) — enough to resume
        cols = {"count": pa.array([self.count], type=pa.int64())}
        flat_keys, flat_p, flat_ncol, flat_data = [], [], [], []
        for p, buf in enumerate(self.outbuf):
            for key, parts in buf.items():
                M = parts[0] if len(parts) == 1 else np.concatenate(parts)
                flat_keys.append(key); flat_p.append(p)
                flat_ncol.append(M.shape[1]); flat_data.append(M.ravel())
        # backlog → self-addressed outbox entries: load_state re-delivers
        # them next step, which is semantically the same re-queue
        for kind, j, M in self.backlog:
            flat_keys.append(f"{kind}{j}"); flat_p.append(self.csr.part)
            flat_ncol.append(M.shape[1]); flat_data.append(M.ravel())
        if self.per_root:  # checkpoint the per-root accumulators too
            flat_keys.append("__rc__"); flat_p.append(self.csr.part)
            flat_ncol.append(1); flat_data.append(self.root_counts.view(np.uint64))
        cols = pa.table(
            {
                "count": pa.array([self.count] * max(1, len(flat_keys)), type=pa.int64()),
                "key": pa.array(flat_keys or [""], type=pa.string()),
                "dest": pa.array(flat_p or [-1], type=pa.int32()),
                "ncol": pa.array(flat_ncol or [0], type=pa.int32()),
                "data": pa.array([d for d in flat_data] or [np.empty(0, np.uint64)],
                                  type=pa.list_(pa.uint64())),
            }
        )
        return cols

    def load_state(self, table, step):
        self.count = int(table["count"][0].as_py()) if table.num_rows else 0
        self.outbuf = [dict() for _ in range(self.csr.num_parts)]
        for i in range(table.num_rows):
            key = table["key"][i].as_py()
            if not key:
                continue
            p = table["dest"][i].as_py()
            ncol = table["ncol"][i].as_py()
            data = np.asarray(table["data"][i].as_py(), dtype=np.uint64)
            if key == "__rc__":
                self.root_counts = data.view(np.int64).copy()
                continue
            self.outbuf[p].setdefault(key, []).append(data.reshape(-1, ncol))

    def result_table(self):
        if self.enumerate:
            E = (
                np.concatenate(self.emb_chunks)
                if self.emb_chunks
                else np.empty((0, self.k), np.uint64)
            )
            pos = {u: i for i, u in enumerate(self.plan["order"])}
            return pa.table(
                {f"v{u}": E[:, pos[u]].view(np.int64) for u in range(self.k)}
            )
        if self.per_root:
            m = self.root_counts > 0
            return pa.table(
                {
                    "vid": self.csr.vids[m],
                    "n_embeddings": self.root_counts[m],
                }
            )
        return pa.table({"part": pa.array([self.csr.part], type=pa.int32()),
                         "count": pa.array([self.count], type=pa.int64())})

    def scalar_result(self):
        return {"embeddings": self.count}


class MultiMatchProgram(VertexProgram):
    """N subgraph-count queries through ONE superstep loop / actor fleet /
    message exchange — the Ray analogue of the reference's multi-query
    driver (``dev/basic/Worker.h:349-376``, which batches queries through
    one wl_sync pass). Each query runs as an inner :class:`MatchProgram`
    over the SHARED partition CSR (one graph load, one hub mirror, one
    label exchange); on the wire each sub-program's message keys are
    namespaced ``{qi}|{key}``, so all queries' frontier traffic rides the
    same per-superstep exchange and barrier — N queries cost max(steps_i)
    barriers instead of Σ steps_i. Per-query counts come back as
    ``embeddings_q{i}`` scalars; checkpoints concat the sub-states with a
    ``qi`` column. ``max_out_rows`` (if set) applies PER SUB-QUERY, so the
    combined exchange bound is N × budget."""

    needs_nbr_attrs = ("label",)
    wants_hub_mirror = True

    def init(self, csr: CSRPartition, plans=None, **kw):
        self.csr = csr
        # shared per-label candidate census (round 5, VERDICT r4 #4): build
        # the label-bucketed sub-CSRs ONCE over the union of the batch's
        # query labels and hand them to every sub-program — N queries pay
        # one O(E·|labels|) bucketing pass per actor instead of N (the
        # reference dev-driver's shared-preprocess point,
        # dev/basic/Worker.h:349-376).
        union = sorted({int(l) for plan in plans for l in plan["labels"]})
        lcsr = _label_csrs(csr, union)
        hub_lcsr = (
            _hub_label_csrs(csr, union) if csr.hub_mirror is not None else None
        )
        self.subs: list[MatchProgram] = []
        for plan in plans:
            p = MatchProgram()
            p.init(csr, plan=plan, lcsr=lcsr, hub_lcsr=hub_lcsr, **kw)
            self.subs.append(p)

    def apply(self, step, inbox, glob):
        if step == 0:
            active = 0
            for p in self.subs:
                active += int(p.apply(step, [], glob).get("active", 0))
            return {"active": active}
        split: list[list] = [[] for _ in self.subs]
        for msg in inbox:
            if not msg:
                continue
            per: dict[int, dict] = {}
            for key, M in msg.items():
                qi, sub_key = key.split("|", 1)
                per.setdefault(int(qi), {})[sub_key] = M
            for qi, d in per.items():
                split[qi].append(d)
        active = 0
        for qi, p in enumerate(self.subs):
            active += int(p.apply(step, split[qi], glob).get("active", 0))
        return {"active": active}

    def scatter(self, step):
        P = self.csr.num_parts
        merged: list[dict | None] = [None] * P
        sent = 0
        for qi, p in enumerate(self.subs):
            outbox, stats = p.scatter(step)
            sent += int(stats.get("sent", 0))
            for part, buf in enumerate(outbox):
                if not buf:
                    continue
                if merged[part] is None:
                    merged[part] = {}
                for key, M in buf.items():
                    merged[part][f"{qi}|{key}"] = M
        return merged, {"sent": sent}

    def state_table(self):
        tabs = []
        for qi, p in enumerate(self.subs):
            t = p.state_table()
            tabs.append(t.append_column("qi", pa.array([qi] * t.num_rows,
                                                      pa.int32())))
        return pa.concat_tables(tabs)

    def load_state(self, table, step):
        qi_col = table["qi"].to_numpy()
        for qi, p in enumerate(self.subs):
            p.load_state(
                table.filter(pa.array(qi_col == qi)).drop_columns(["qi"]),
                step,
            )

    def result_table(self):
        return pa.table(
            {
                "qi": pa.array(range(len(self.subs)), pa.int32()),
                "count": pa.array([p.count for p in self.subs], pa.int64()),
                "part": pa.array([self.csr.part] * len(self.subs), pa.int32()),
            }
        )

    def scalar_result(self):
        return {f"embeddings_q{qi}": p.count for qi, p in enumerate(self.subs)}


class KCoreProgram(VertexProgram):
    """Core-number decomposition via distributed h-index iteration
    (Montresor et al., "Distributed k-core decomposition", 2011): every
    vertex starts at its degree and repeatedly lowers its estimate to the
    h-index of its neighbors' estimates; the fixpoint is the exact core
    number. Estimates only decrease, so a vertex scatters only when its
    value changed (frontier semantics like CC).
    """

    def init(self, csr: CSRPartition):
        self.csr = csr
        self.core = csr.degrees().astype(np.int64)
        self.changed = np.ones(csr.num_vertices, dtype=bool)
        # neighbor estimates cache, aligned with csr.indices
        self.nbr_est = np.full(csr.num_edges, np.iinfo(np.int64).max, dtype=np.int64)

    def _recompute(self, rows: np.ndarray) -> int:
        """Vectorized h-index over cached neighbor estimates for `rows`:
        gather each row's edge estimates, sort desc within row (lexsort),
        h(row) = #positions where sorted est ≥ 1-based position."""
        indptr = self.csr.indptr
        starts = indptr[rows]
        counts = (indptr[rows + 1] - starts).astype(np.int64)
        eidx = flat_gather(starts, counts)
        if len(eidx) == 0:
            self.changed = np.zeros(self.csr.num_vertices, dtype=bool)
            return 0
        rrep = np.repeat(np.arange(len(rows), dtype=np.int64), counts)
        est = np.minimum(self.nbr_est[eidx], self.core[rows][rrep])
        order = np.lexsort((-est, rrep))
        row_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(len(est), dtype=np.int64) - row_start[rrep]  # 0-based in row
        hmask = est[order] >= pos + 1
        h = np.bincount(rrep[hmask], minlength=len(rows))
        new_changed = np.zeros(self.csr.num_vertices, dtype=bool)
        dec = (h < self.core[rows]) & (counts > 0)
        self.core[rows[dec]] = h[dec]
        new_changed[rows[dec]] = True
        self.changed = new_changed
        return int(dec.sum())

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": self.csr.num_vertices}
        touched = np.zeros(self.csr.num_vertices, dtype=bool)
        dix = self.csr.dst_index()
        for msg in inbox:
            if msg is None or len(msg["dst"]) == 0:
                continue
            li = self.csr.local_index(msg["dst"])
            # update the per-edge neighbor-estimate cache: entries of (li, src)
            # edges; sender pre-grouped per (dst, value) — store min estimate
            # via the membership-key trick would be overkill: scatter sends
            # (dst, src, est) triples grouped by dst.
            dsts = np.repeat(li, msg["cnt"])  # per-edge receiver rows
            srcs = msg["src"]                 # per-edge sender vids
            ests = msg["est"]                 # per-edge sender estimates
            # vectorized per-edge slot lookup via the packed-key membership arrays
            keys, uniq = self.csr._membership_keys()
            spos = np.searchsorted(uniq, srcs)
            spos = np.minimum(spos, len(uniq) - 1)
            qkey = dsts.astype(np.uint64) << np.uint64(32) | spos.astype(np.uint64)
            kpos = np.searchsorted(keys, qkey)
            valid = (kpos < len(keys)) & (uniq[spos] == srcs)
            kpos = np.minimum(kpos, len(keys) - 1)
            valid &= keys[kpos] == qkey
            slot = kpos[valid]
            np.minimum.at(self.nbr_est, slot, ests[valid])
            touched[dsts[valid]] = True
        if step == 1:  # first estimates just arrived everywhere
            rows = np.arange(self.csr.num_vertices)
        else:
            rows = np.nonzero(touched)[0]
        n = self._recompute(rows) if len(rows) else 0
        if len(rows) == 0:
            self.changed = np.zeros(self.csr.num_vertices, dtype=bool)
        return {"active": n}

    def scatter(self, step):
        P = self.csr.num_parts
        dix = self.csr.dst_index()
        send_mask = self.changed if step > 0 else np.ones(self.csr.num_vertices, bool)
        edge_sel = send_mask[dix.src_row][dix.order]
        src_vid = self.csr.vids[dix.src_row][dix.order]
        est = self.core[dix.src_row][dix.order]
        sorted_dst = self.csr.indices[dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            sel = edge_sel[s:e]
            if not sel.any():
                outbox.append(None)
                continue
            d = sorted_dst[s:e][sel]
            # runs are contiguous per dst (slice is dst-sorted); receiver
            # re-expands with np.repeat(li, cnt) to align per-edge arrays
            uniq, cnt = np.unique(d, return_counts=True)
            outbox.append(
                {
                    "dst": uniq,
                    "cnt": cnt.astype(np.int64),
                    "src": src_vid[s:e][sel],
                    "est": est[s:e][sel],
                }
            )
            sent += len(d)
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table({"vid": self.csr.vids, "core": self.core,
                         "changed": self.changed})

    def load_state(self, table, step):
        self.core = table["core"].to_numpy().copy()
        self.changed = table["changed"].to_numpy().copy()
        self.nbr_est = np.full(self.csr.num_edges, np.iinfo(np.int64).max, dtype=np.int64)
        self.changed[:] = True  # resend estimates after resume

    def result_table(self):
        return pa.table({"vid": self.csr.vids, "core": self.core})


# --------------------------------------------------------------------------
class SCoreProgram(KCoreProgram):
    """Weighted core decomposition (s-core, Eidsaa & Almaas 2013) by the
    WEIGHTED h-index fixpoint — the strength analogue of KCoreProgram's
    Montresor iteration: core_0(v) = strength(v) = Σ edge weights;
    core_i(v) = max over neighbors sorted by estimate desc of
    min(cumulative weight, estimate). For unit weights the cumulative
    weight is the 1-based rank and this is exactly the h-index, so the
    program degrades to k-core when the layout has no weight channel.
    Estimates only decrease (frontier scatter like k-core); within-tie
    neighbor order provably cannot change the max-least value, so the
    fixpoint is deterministic and the SQL unroll (ORDER BY core DESC,
    dst) replays it bit-for-bit."""

    def init(self, csr: CSRPartition):
        super().init(csr)
        self.ew = (
            csr.eweights.astype(np.int64)
            if csr.eweights is not None
            else np.ones(csr.num_edges, dtype=np.int64)
        )
        # strength start (== degree when unweighted)
        self.core = np.zeros(csr.num_vertices, dtype=np.int64)
        np.add.at(
            self.core,
            np.repeat(np.arange(csr.num_vertices, dtype=np.int64),
                      np.diff(csr.indptr)),
            self.ew,
        )

    def _recompute(self, rows: np.ndarray) -> int:
        indptr = self.csr.indptr
        starts = indptr[rows]
        counts = (indptr[rows + 1] - starts).astype(np.int64)
        eidx = flat_gather(starts, counts)
        if len(eidx) == 0:
            self.changed = np.zeros(self.csr.num_vertices, dtype=bool)
            return 0
        rrep = np.repeat(np.arange(len(rows), dtype=np.int64), counts)
        est = np.minimum(self.nbr_est[eidx], self.core[rows][rrep])
        w = self.ew[eidx]
        order = np.lexsort((-est, rrep))
        ws = w[order]
        cws = np.cumsum(ws)
        row_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        base = cws[row_start] - ws[row_start]  # segmented cumsum reset
        cw = cws - base[rrep]
        val = np.minimum(cw, est[order])
        nz = counts > 0
        h = np.zeros(len(rows), dtype=np.int64)
        h[nz] = np.maximum.reduceat(val, row_start[nz])
        new_changed = np.zeros(self.csr.num_vertices, dtype=bool)
        dec = (h < self.core[rows]) & nz
        self.core[rows[dec]] = h[dec]
        new_changed[rows[dec]] = True
        self.changed = new_changed
        return int(dec.sum())


class HITSProgram(VertexProgram):
    """HITS (hubs & authorities) on the DAG orientation of the symmetric
    graph: the directed edge set is u→v iff {u,v} ∈ E and u < v, so
    orientation is recoverable from vids alone — no per-edge attribute and
    no second (reverse) CSR. Each superstep carries BOTH half-updates in one
    exchange (two pre-aggregated floats per distinct dst):

        a_t(v) = Σ_{u→v} h_{t-1}(u)      h_t(u) = Σ_{u→v} a_{t-1}(v)

    i.e. the simultaneous-update variant, WITHOUT per-iteration
    normalization — the iteration is scale-free (power iteration of the
    [[0,Aᵀ],[A,0]] block operator), so one L2 normalization at the end
    yields the same direction while keeping the SQL oracle a plain unroll.
    Norms are global: the last update's apply() reports local Σa²/Σh²
    through the engine's scalar fold (the reference's aggregator seam,
    ``basic/Worker.h`` aggregator sync) and a final message-free superstep
    normalizes everywhere from ``glob`` — no driver-side pass over vertices.
    """

    def init(self, csr: CSRPartition, iters=8):
        self.csr = csr
        self.iters = int(iters)
        self.auth = np.ones(csr.num_vertices)
        self.hub = np.ones(csr.num_vertices)
        self._in_li: dict[int, np.ndarray] = {}
        self._sent_dst = False
        self._fwd: list[np.ndarray] | None = None  # static per-edge orientation

    def _orientation(self, dix):
        """Per dest-part boolean mask over the grouped edge order: True where
        the edge points forward (src vid < dst vid). Static — cached."""
        if self._fwd is None:
            sr = dix.src_row[dix.order]
            src_v = self.csr.vids[sr]
            fwd = []
            for p in range(self.csr.num_parts):
                s, e = dix.slices[p]
                dstv = dix.uniq_dst[p][dix.inverse[p]]
                fwd.append(dstv > src_v[s:e])
            self._fwd = fwd
            self._sr = sr
        return self._fwd

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": 1}
        if getattr(self, "_norm_step", False):
            if "a2" not in glob:
                # resumed from a checkpoint at/after the publish step: the
                # engine re-folds glob from the resumed superstep's stats,
                # which discards the manifest's a2/h2 — re-publish the local
                # norms and stay active one more (message-free) superstep
                return {
                    "active": 1,
                    "a2": float(self.auth @ self.auth),
                    "h2": float(self.hub @ self.hub),
                }
            a2, h2 = glob["a2"], glob.get("h2", 0.0)
            if a2 > 0:
                self.auth = self.auth / np.sqrt(a2)
            if h2 > 0:
                self.hub = self.hub / np.sqrt(h2)
            return {"active": 0}
        a_sum = np.zeros(self.csr.num_vertices)
        h_sum = np.zeros(self.csr.num_vertices)
        for i, msg in enumerate(inbox):
            if msg is None or len(msg["sh"]) == 0:
                continue
            li = self._in_li.get(i)
            if "dst" in msg:
                li = self.csr.local_index(msg["dst"])
                self._in_li[i] = li
            np.add.at(a_sum, li, msg["sh"])  # hubs of smaller nbrs → authority
            np.add.at(h_sum, li, msg["sa"])  # auths of larger nbrs → hub
        self.auth, self.hub = a_sum, h_sum
        if step >= self.iters:  # vectors final — publish norms, then normalize
            self._norm_step = True
            return {
                "active": 1,
                "a2": float(self.auth @ self.auth),
                "h2": float(self.hub @ self.hub),
            }
        return {"active": 1}

    def scatter(self, step):
        P = self.csr.num_parts
        if step >= self.iters or getattr(self, "_norm_step", False):
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        fwd = self._orientation(dix)
        sr = self._sr
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            if s == e:
                outbox.append(None)
                continue
            f = fwd[p]
            n_uniq = len(dix.uniq_dst[p])
            inv = dix.inverse[p]
            rows = sr[s:e]
            sh = np.bincount(inv[f], weights=self.hub[rows[f]], minlength=n_uniq)
            sa = np.bincount(inv[~f], weights=self.auth[rows[~f]], minlength=n_uniq)
            msg = {"sh": sh, "sa": sa}
            if not self._sent_dst:
                msg["dst"] = dix.uniq_dst[p]
            outbox.append(msg)
            sent += 2 * n_uniq
        self._sent_dst = True
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table({"vid": self.csr.vids, "auth": self.auth, "hub": self.hub})

    def load_state(self, table, step):
        self.auth = table["auth"].to_numpy().copy()
        self.hub = table["hub"].to_numpy().copy()
        # a checkpoint at/after the final update must resume into the
        # normalize branch, not the (empty-inbox) message-sum branch
        self._norm_step = step >= self.iters

    def result_table(self):
        return pa.table({"vid": self.csr.vids, "auth": self.auth, "hub": self.hub})


# --------------------------------------------------------------------------
_HB_RING = np.int64(1) << 31


def _hb_hashes(vids: np.ndarray, m: int):
    """Per-vertex HLL (idx, rho) from two Knuth-style multiplicative hashes
    on the 2³¹ ring — every intermediate < 2⁶³, so a SQL oracle replays the
    arithmetic in plain BIGINT and the registers are BIT-comparable.
    rho = 32 − bit_length(w) for the 31-bit w (w = 0 → 32): computed via
    31 integer comparisons, no float log anywhere."""
    v = vids.astype(np.uint64).view(np.int64)
    idx = ((v * np.int64(2654435761)) % _HB_RING) % np.int64(m)
    w = (v * np.int64(2246822519) + 1) % _HB_RING
    bits = np.zeros(len(v), dtype=np.uint8)
    for k in range(31):
        bits += (w >= (np.int64(1) << k)).astype(np.uint8)
    return idx.astype(np.int64), (32 - bits).astype(np.uint8)


class HyperBallProgram(VertexProgram):
    """HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
    Centralities with HyperBall", 2013 — public): every vertex keeps an
    HLL counter of its ball B(v, t); one superstep = elementwise register
    max with all neighbors, so after t exchanges the counter summarizes
    the radius-t ball. THE web-scale neighborhood-function algorithm
    (designed for exactly this engine's target: billion-node link graphs
    where exact ball enumeration is hopeless).

    Scale shape: registers are uint8[m] per vertex (m = 2^p); scatter is
    frontier-based (only vertices whose counter changed send) and
    pre-aggregates per destination inside the sender — a group-max
    ``np.maximum.reduceat`` per dst, so the exchange carries one register
    row per DISTINCT (src-partition, dst) pair, the elementwise-max
    combiner analogue of PageRank's pre-summed floats. Convergence =
    no register changes anywhere (≤ diameter supersteps) or ``radius``.

    Result: per vertex ``reg_sum`` / ``reg_zeros`` (exact int invariants of
    the register array — SQL-oracle-checkable via an unrolled ball join)
    and ``nf_est`` (the HLL ball-size estimate with linear-counting
    small-range correction, pytest-checked against exact BFS balls).
    """

    def init(self, csr: CSRPartition, radius: int = 3, p: int = 8):
        self.csr = csr
        self.radius = int(radius)
        self.m = 1 << int(p)
        idx, rho = _hb_hashes(csr.vids, self.m)
        self.reg = np.zeros((csr.num_vertices, self.m), dtype=np.uint8)
        self.reg[np.arange(csr.num_vertices), idx] = rho
        self.changed = np.ones(csr.num_vertices, dtype=bool)

    def apply(self, step, inbox, glob):
        if step == 0:
            self._done = self.radius <= 0
            return {"active": 0 if self._done else int(self.changed.sum())}
        new_changed = np.zeros(self.csr.num_vertices, dtype=bool)
        for msg in inbox:
            if msg is None or len(msg["dst"]) == 0:
                continue
            li = self.csr.local_index(msg["dst"])
            cur = self.reg[li]
            grew = (msg["reg"] > cur).any(axis=1)
            if grew.any():
                self.reg[li] = np.maximum(cur, msg["reg"])
                new_changed[li[grew]] = True
        self.changed = new_changed
        self._done = step >= self.radius
        # nf_sum folds to Σ_v |B(v, step)| — the global neighborhood
        # function per radius, i.e. the distance distribution, lands in the
        # lineage for free (Boldi & Vigna §4 report exactly this curve).
        return {
            "active": 0 if self._done else int(new_changed.sum()),
            "nf_sum": float(self._est().sum()),
        }

    def scatter(self, step):
        P = self.csr.num_parts
        if getattr(self, "_done", False) or not self.changed.any():
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        sel_all = self.changed[dix.src_row][dix.order]
        rows_all = dix.src_row[dix.order]
        dst_all = self.csr.indices[dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            sel = sel_all[s:e]
            if not sel.any():
                outbox.append(None)
                continue
            dsts = dst_all[s:e][sel]  # still sorted by dst within the slice
            rows = rows_all[s:e][sel]
            first = np.concatenate([[True], dsts[1:] != dsts[:-1]])
            starts = np.flatnonzero(first)
            merged = np.maximum.reduceat(self.reg[rows], starts, axis=0)
            outbox.append({"dst": dsts[first], "reg": merged})
            sent += len(starts)
        return outbox, {"sent": sent}

    def _est(self) -> np.ndarray:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
        pow2 = np.power(2.0, -self.reg.astype(np.float64))
        raw = alpha * m * m / pow2.sum(axis=1)
        zeros = (self.reg == 0).sum(axis=1)
        small = (raw <= 2.5 * m) & (zeros > 0)
        est = raw.copy()
        est[small] = m * np.log(m / zeros[small])
        return est

    def state_table(self):
        flat = pa.array(self.reg.reshape(-1), pa.uint8())
        return pa.table(
            {
                "vid": self.csr.vids,
                "reg": pa.FixedSizeListArray.from_arrays(flat, self.m),
                "changed": self.changed,
            }
        )

    def load_state(self, table, step):
        self.reg = (
            table["reg"].combine_chunks().flatten().to_numpy().reshape(-1, self.m).copy()
        )
        self.changed = table["changed"].to_numpy().copy()
        self._done = step >= self.radius

    def result_table(self):
        return pa.table(
            {
                "vid": self.csr.vids,
                "reg_sum": self.reg.sum(axis=1, dtype=np.int64),
                "reg_zeros": (self.reg == 0).sum(axis=1).astype(np.int64),
                "nf_est": self._est(),
            }
        )


class BetweennessProgram(VertexProgram):
    """Batched multi-source Brandes betweenness centrality (Brandes 2001,
    "A Faster Algorithm for Betweenness Centrality" — public).

    bc(v) = Σ_{s ∈ S} Σ_{t} σ_st(v)/σ_st over the deterministic pivot set
    S = {u : vid % seed_mod == 0} — the standard sampled estimator (Bader
    et al. 2007 pivot sampling) with hash-style pivot choice so a SQL
    oracle can reproduce the set exactly. Three phases in ONE program run:

    * **census** (steps 0→1): every partition broadcasts its local seed
      vids through the message plane; step 1 unions them into the same
      sorted global seed list everywhere, so message seed indices agree
      (the J5 small-side broadcast without driver participation).
    * **forward** (BFS levels): batched over all K seeds — state is
      (K, n) dist/σ per partition; one superstep per level; messages are
      (seed, dst, σ-contribution) rows pre-aggregated per destination
      inside the sender. A vertex's σ is the sum of ALL level-(d−1)
      contributions, which BSP delivers in the same superstep.
    * **backward** (dependency accumulation): when a superstep reports
      zero new visits globally, partitions switch in lockstep (the fold
      is global state — same trigger everywhere) and agree on the global
      max level via the engine's ``max_``-fold. Then one superstep per
      level from Lmax down: level-(d+1) vertices send c = (1+δ)/σ to all
      neighbors; receivers keep only credits matching their own level d
      (same-level edges drop out naturally — they lie on no shortest
      path), set δ_v = σ_v·Σc, and fold δ into bc. Credits into level 0
      would only reach the seed itself (never counted) — skipped, which
      also terminates the run.

    Scale shape: K·n state per partition is the declared batched-Brandes
    memory cost — at web scale run pivots in waves of K_max (several
    program runs, bc sums across waves). Exchange volume per superstep is
    pre-aggregated per (seed, dst) and frontier-based in both phases.
    Checkpoint/resume carries the census result + phase in the state
    table's schema metadata. Result bc is rounded half-away at
    ``round_to`` decimals so the SQL oracle reproduces it.
    """

    def init(self, csr: CSRPartition, seed_mod: int = 101, round_to: int = 4):
        self.csr = csr
        self.seed_mod = int(seed_mod)
        self.round_to = int(round_to)
        self.local_seeds = csr.vids[
            (csr.vids % np.uint64(self.seed_mod)) == np.uint64(0)
        ]
        self.seeds: np.ndarray | None = None
        self.bc = np.zeros(csr.num_vertices)
        self.phase = "census"
        self.Lmax: int | None = None
        self._s0: int | None = None
        self._max_seen = 0

    # ---- helpers -----------------------------------------------------
    def _recv_into(self, inbox, buf, got=None):
        for msg in inbox:
            if msg is None or "k" not in msg or len(msg["dst"]) == 0:
                continue
            li = self.csr.local_index(msg["dst"])
            np.add.at(buf, (msg["k"], li), msg["val"])
            if got is not None:
                got[msg["k"], li] = True

    def _send(self, ks, rows, vals):
        """Fan (seed k, local row, value) over the rows' adjacency,
        pre-aggregated per (k, dst) per destination partition."""
        P = self.csr.num_parts
        csr = self.csr
        deg = csr.degrees()[rows]
        eidx = flat_gather(csr.indptr[rows], deg)
        if len(eidx) == 0:
            return [None] * P, {"sent": 0}
        dsts = csr.indices[eidx]
        kk = np.repeat(ks, deg).astype(np.int64)
        vv = np.repeat(vals, deg)
        pp = part_for(dsts, P)
        order = np.lexsort((dsts, kk, pp))
        dsts, kk, vv, pp = dsts[order], kk[order], vv[order], pp[order]
        bounds = np.searchsorted(pp, np.arange(P + 1))
        outbox, sent = [], 0
        for p in range(P):
            s, e = int(bounds[p]), int(bounds[p + 1])
            if s == e:
                outbox.append(None)
                continue
            k_s, d_s, v_s = kk[s:e], dsts[s:e], vv[s:e]
            first = np.concatenate(
                [[True], (k_s[1:] != k_s[:-1]) | (d_s[1:] != d_s[:-1])]
            )
            starts = np.flatnonzero(first)
            outbox.append(
                {"k": k_s[first], "dst": d_s[first], "val": np.add.reduceat(v_s, starts)}
            )
            sent += len(starts)
        return outbox, {"sent": sent}

    # ---- protocol ----------------------------------------------------
    def apply(self, step, inbox, glob):
        n = self.csr.num_vertices
        if step == 0:
            return {"active": 1 if len(self.local_seeds) else 0}
        if step == 1:
            got = [
                m["seeds"]
                for m in inbox
                if m is not None and len(m.get("seeds", ())) > 0
            ]
            self.seeds = (
                np.unique(np.concatenate(got)) if got else np.empty(0, np.uint64)
            )
            K = len(self.seeds)
            self.dist = np.full((K, n), _DIST_INF, dtype=np.int64)
            self.sigma = np.zeros((K, n))
            self.delta = np.zeros((K, n))
            self.front = np.zeros((K, n), dtype=bool)
            if K and len(self.local_seeds):
                k = np.searchsorted(self.seeds, self.local_seeds)
                li = self.csr.local_index(self.local_seeds)
                self.dist[k, li] = 0
                self.sigma[k, li] = 1.0
                self.front[k, li] = True
            self.phase = "forward"
            return {
                "active": 1 if K else 0,
                "new_visits": int(self.front.sum()),
                "max_level": 0,
            }
        if self.phase == "forward":
            if glob.get("new_visits", 1) == 0:
                # no seed made progress anywhere → switch in lockstep
                self.phase = "backward"
                self.Lmax = int(glob.get("max_level", 0))
                self._s0 = step
                self.front = None
                return {"active": 1 if self.Lmax >= 2 else 0}
            level = step - 1
            buf = np.zeros_like(self.sigma)
            got = np.zeros(self.dist.shape, dtype=bool)
            self._recv_into(inbox, buf, got)
            new = got & (self.dist == _DIST_INF)
            self.dist[new] = level
            self.sigma[new] = buf[new]
            self.front = new
            if new.any():
                self._max_seen = max(self._max_seen, level)
            return {
                "active": 1,
                "new_visits": int(new.sum()),
                "max_level": self._max_seen,
            }
        # backward: credits sent at step-1 came from level recv+1
        recv = self.Lmax - (step - self._s0)
        buf = np.zeros_like(self.sigma)
        self._recv_into(inbox, buf)
        mask = self.dist == recv
        self.delta[mask] = self.sigma[mask] * buf[mask]
        self.bc += np.where(mask, self.delta, 0.0).sum(axis=0)
        return {"active": 1 if recv >= 2 else 0}

    def scatter(self, step):
        P = self.csr.num_parts
        if step == 0:
            if len(self.local_seeds) == 0:
                return [None] * P, {"sent": 0}
            out = [{"seeds": self.local_seeds} for _ in range(P)]
            return out, {"sent": len(self.local_seeds) * P}
        if self.phase == "forward":
            if self.front is None or not self.front.any():
                return [None] * P, {"sent": 0}
            ks, rows = np.nonzero(self.front)
            return self._send(ks, rows, self.sigma[ks, rows])
        level = self.Lmax - (step - self._s0)
        if level < 2:  # level-1 credits reach only the seed — never counted
            return [None] * P, {"sent": 0}
        ks, rows = np.nonzero(self.dist == level)
        if len(ks) == 0:
            return [None] * P, {"sent": 0}
        vals = (1.0 + self.delta[ks, rows]) / self.sigma[ks, rows]
        return self._send(ks, rows, vals)

    # ---- checkpoint --------------------------------------------------
    def state_table(self):
        import json

        n = self.csr.num_vertices
        K = 0 if self.seeds is None else len(self.seeds)
        meta = {
            "phase": self.phase,
            "Lmax": self.Lmax,
            "s0": self._s0,
            "max_seen": self._max_seen,
            "seeds": [int(v) for v in (self.seeds if K else [])],
        }
        cols: dict = {"vid": self.csr.vids, "bc": self.bc}
        if K:
            for name, arr, typ in (
                ("dist", self.dist, pa.int64()),
                ("sigma", self.sigma, pa.float64()),
                ("delta", self.delta, pa.float64()),
            ):
                flat = pa.array(arr.T.reshape(-1), typ)
                cols[name] = pa.FixedSizeListArray.from_arrays(flat, K)
            front = (
                self.front
                if self.front is not None
                else np.zeros((K, n), dtype=bool)
            )
            cols["front"] = pa.FixedSizeListArray.from_arrays(
                pa.array(front.T.reshape(-1)), K
            )
        t = pa.table(cols)
        return t.replace_schema_metadata({b"betweenness": json.dumps(meta).encode()})

    def load_state(self, table, step):
        import json

        meta = json.loads(table.schema.metadata[b"betweenness"])
        self.phase = meta["phase"]
        self.Lmax = meta["Lmax"]
        self._s0 = meta["s0"]
        self._max_seen = meta["max_seen"]
        self.seeds = np.asarray(meta["seeds"], dtype=np.uint64)
        self.bc = table["bc"].to_numpy().copy()
        n = self.csr.num_vertices
        K = len(self.seeds)
        if K:
            def _mat(col, dt):
                return (
                    table[col].combine_chunks().flatten().to_numpy(zero_copy_only=False)
                    .astype(dt).reshape(n, K).T.copy()
                )

            self.dist = _mat("dist", np.int64)
            self.sigma = _mat("sigma", np.float64)
            self.delta = _mat("delta", np.float64)
            self.front = (
                _mat("front", bool) if self.phase == "forward" else None
            )

    def result_table(self):
        from ..functions.rounding import round_half_away

        return pa.table(
            {"vid": self.csr.vids, "bc": round_half_away(self.bc, self.round_to)}
        )


class HarmonicClosenessProgram(BetweennessProgram):
    """Harmonic closeness centrality hc(v) = Σ_{s ∈ S, s ≠ v} 1/d(s, v)
    from the same deterministic pivot set as BetweennessProgram (harmonic
    variant per Boldi & Vigna 2014, "Axioms for Centrality" — well-defined
    on disconnected graphs: unreachable pairs contribute 0).

    Reuses the parent's census + batched forward-BFS phases verbatim and
    simply stops at the lockstep phase switch (no backward dependency
    pass), so per-superstep exchange stays the pre-aggregated frontier
    volume and the (K, n) dist matrix is the whole state. Checkpoint
    format is inherited; ``result_table`` folds 1/dist over the seed axis.
    """

    def apply(self, step, inbox, glob):
        out = super().apply(step, inbox, glob)
        if self.phase == "backward":  # forward converged — we're done
            return {"active": 0}
        return out

    def scatter(self, step):
        if self.phase == "backward":
            return [None] * self.csr.num_parts, {"sent": 0}
        return super().scatter(step)

    def result_table(self):
        from ..functions.rounding import round_half_away

        if self.seeds is None or len(self.seeds) == 0:
            hc = np.zeros(self.csr.num_vertices)
        else:
            d = self.dist
            hc = np.where(
                (d > 0) & (d != _DIST_INF), 1.0 / np.maximum(d, 1), 0.0
            ).sum(axis=0)
        return pa.table(
            {"vid": self.csr.vids, "hc": round_half_away(hc, self.round_to)}
        )


class EccentricityProgram(HarmonicClosenessProgram):
    """Per-pivot eccentricity ecc(s) = max_v d(s, v) over vertices
    reachable from s — the standard pivot-based radius/diameter bounds
    (max ecc ≤ diameter, min ecc ≥ radius; Magnien et al. 2009 BFS-bound
    methodology, public). Same census + batched forward BFS as harmonic
    closeness; ``result_table`` returns per-PARTITION partial
    (s, ecc) rows — K·P tiny rows — and the pipeline folds the global
    max per seed."""

    def result_table(self):
        if self.seeds is None or len(self.seeds) == 0:
            return pa.table(
                {
                    "s": pa.array([], type=pa.uint64()),
                    "ecc": pa.array([], type=pa.int64()),
                }
            )
        d = np.where(self.dist == _DIST_INF, np.int64(-1), self.dist)
        return pa.table({"s": self.seeds, "ecc": d.max(axis=1).astype(np.int64)})


class PivotEccProgram(HarmonicClosenessProgram):
    """Explicit-seed BFS eccentricity with a farthest-vertex WITNESS —
    the building block of the double-sweep diameter bound (Magnien et
    al. 2009): per seed, each partition reports (ecc over owned
    vertices, min owned vid attaining it); the pipeline folds the global
    max and its min-vid witness. Seeds are an explicit list (vs the
    sampled seed_mod sets of the parent family)."""

    def init(self, csr: CSRPartition, seed_list=(), round_to: int = 4):
        super().init(csr, seed_mod=1, round_to=round_to)
        sl = np.asarray(sorted(int(s) for s in seed_list), dtype=np.uint64)
        self.local_seeds = csr.vids[np.isin(csr.vids, sl)]

    def result_table(self):
        if self.seeds is None or len(self.seeds) == 0:
            return pa.table(
                {
                    "s": pa.array([], type=pa.uint64()),
                    "ecc": pa.array([], type=pa.int64()),
                    "far": pa.array([], type=pa.int64()),
                }
            )
        d = np.where(self.dist == _DIST_INF, np.int64(-1), self.dist)
        eccs, fars = [], []
        for k in range(len(self.seeds)):
            dk = d[k]
            m = int(dk.max()) if len(dk) else -1
            eccs.append(m)
            if m < 0:
                fars.append(-1)
            else:
                fars.append(int(self.csr.vids[dk == m].min()))
        return pa.table(
            {
                "s": self.seeds,
                "ecc": pa.array(eccs, pa.int64()),
                "far": pa.array(fars, pa.int64()),
            }
        )


_SCC_UNSET = np.uint64(0xFFFFFFFFFFFFFFFF)


class SCCProgram(VertexProgram):
    """Strongly connected components of a DIRECTED graph by min-label
    forward/backward peeling (the label-propagation SCC family: Orzan's
    coloring algorithm, 2004; Slota et al. "BFS and Coloring-based Parallel
    Algorithms for Strongly Connected Components", 2014 — both public).
    The reference engine has no SCC, but its vertex-compute seam
    (``basic/Vertex.h:52``) is exactly this shape; the CSR here is built
    over the SYMMETRIZED edge set with per-edge direction bits
    (``CSRPartition.eflags``: bit0 = real edge u→v exists, bit1 = the
    reverse v→u exists), so ONE partition layout serves both propagation
    directions — no second reverse CSR.

    Per round, two interleaved min-label propagations run in the SAME
    supersteps (one exchange carries both) over the still-unassigned
    subgraph:

        f(v) = min unassigned u with u →* v   (forward reachability)
        b(v) = min unassigned u with v →* u   (backward reachability)

    The round's fixpoint is detected from the engine's folded ``glob``
    (the previous superstep sent nothing anywhere); then every vertex with
    f(v) == b(v) is assigned scc = f(v): f and b are constant on an SCC,
    and f==b==m implies m →* v →* m, so exactly whole SCCs peel, labeled
    by their MINIMUM member vid (f(v) ≤ min-member ≤ m = f(v)). The SCC
    containing the smallest unassigned vid always satisfies the test
    (nothing smaller exists to reach it or be reached), so every round
    assigns ≥ 1 SCC and the run terminates. Labels reset, propagation
    restarts on the remainder; done when nothing is unassigned.
    """

    def init(self, csr: CSRPartition, **_params):
        self.csr = csr
        n = csr.num_vertices
        if csr.eflags is None and csr.num_edges > 0:
            raise ValueError(
                "scc needs per-edge direction flags: build the graph from "
                "flag-symmetrized directed edges (algorithms.scc does this)"
            )
        self.scc = np.full(n, _SCC_UNSET, dtype=np.uint64)
        self.f = csr.vids.copy()
        self.b = csr.vids.copy()
        self.fch = np.ones(n, dtype=bool)
        self.bch = np.ones(n, dtype=bool)
        # TRIM counters (Slota et al.'s trim step, run CONTINUOUSLY): per
        # vertex, how many of its in-/out-neighbors are still unassigned.
        # A vertex with in_un==0 or out_un==0 is a singleton SCC *whenever*
        # observed (nothing unassigned reaches it / it reaches nothing
        # unassigned), so trims happen every apply — not just at round
        # fixpoints — and cascade one DAG layer per superstep instead of
        # one per full propagation round. Mid-round removal is safe: labels
        # already in flight represent real paths of the round-start
        # subgraph, and the f==b peel argument is stated over that graph.
        if csr.num_edges:
            fwd = ((csr.eflags & 1) != 0).astype(np.int64)
            bwd = ((csr.eflags & 2) != 0).astype(np.int64)
            pad = np.concatenate([fwd, [0]])
            self.out_un = np.add.reduceat(pad, csr.indptr[:-1]) if n else fwd[:0]
            pad = np.concatenate([bwd, [0]])
            self.in_un = np.add.reduceat(pad, csr.indptr[:-1]) if n else bwd[:0]
            empty = csr.degrees() == 0
            self.out_un[empty] = 0
            self.in_un[empty] = 0
        else:
            self.out_un = np.zeros(n, dtype=np.int64)
            self.in_un = np.zeros(n, dtype=np.int64)
        self.notify = np.zeros(n, dtype=bool)  # assigned, neighbors not yet told

    def _trim(self, un):
        """Assign every currently-trimmable vertex (cascades locally)."""
        trimmed = 0
        while True:
            t = un & ((self.in_un == 0) | (self.out_un == 0))
            if not t.any():
                return trimmed
            self.scc[t] = self.csr.vids[t]
            self.notify |= t
            un &= ~t
            trimmed += int(t.sum())
            # local cascade: decrement counters for OWNED neighbors of the
            # just-trimmed vertices (remote ones learn via notify messages)
            self._decrement_local(t)

    def _decrement_local(self, assigned_mask):
        csr = self.csr
        if csr.num_edges == 0 or not assigned_mask.any():
            return
        dix = csr.dst_index()
        rows = assigned_mask[dix.src_row]
        if not rows.any():
            return
        dst = csr.indices[rows]
        owned = (dst >= csr.vids[0]) & (dst <= csr.vids[-1]) if csr.num_vertices else np.zeros(0, bool)
        li = np.searchsorted(csr.vids, dst[owned])
        ok = csr.vids[li] == dst[owned] if len(li) else np.zeros(0, bool)
        li = li[ok]
        ef = csr.eflags[rows][owned][ok]
        # edge u→v real (bit0) means v loses an unassigned IN-neighbor
        np.subtract.at(self.in_un, li[(ef & 1) != 0], 1)
        np.subtract.at(self.out_un, li[(ef & 2) != 0], 1)

    def apply(self, step, inbox, glob):
        un = self.scc == _SCC_UNSET
        if step == 0:
            t = self._trim(un)
            return {"active": int(un.sum()), "improved": 0, "peeled": t}
        if glob.get("sent", 0) == 0:
            # global fixpoint of this round's propagation — peel & restart
            peel = un & (self.f == self.b)
            self.scc[peel] = self.f[peel]
            self.notify |= peel
            un &= ~peel
            self._decrement_local(peel)
            peeled = int(peel.sum()) + self._trim(un)
            self.f = np.where(un, self.csr.vids, self.f)
            self.b = np.where(un, self.csr.vids, self.b)
            self.fch = un.copy()
            self.bch = un.copy()
            return {
                "active": int(un.sum()),
                "improved": 0,
                "peeled": peeled,
            }
        improved = 0
        for msg in inbox:
            if msg is None:
                continue
            for dk, vk, val, ch in (
                ("fd", "fm", self.f, self.fch),
                ("bd", "bm", self.b, self.bch),
            ):
                if dk not in msg or len(msg[dk]) == 0:
                    continue
                li = self.csr.local_index(msg[dk])
                sel = un[li] & (msg[vk] < val[li])
                if sel.any():
                    idx = li[sel]
                    val[idx] = msg[vk][sel]
                    ch[idx] = True
                    improved += int(sel.sum())
            if "ad" in msg and len(msg["ad"]):
                li = self.csr.local_index(msg["ad"])
                np.subtract.at(self.in_un, li, msg["di"])
                np.subtract.at(self.out_un, li, msg["do"])
        trimmed = self._trim(un)
        return {
            "active": int(un.sum()),
            "improved": improved,
            "peeled": trimmed,
        }

    def scatter(self, step):
        P = self.csr.num_parts
        any_flood = self.fch.any() or self.bch.any()
        any_notify = self.notify.any()
        if (not (any_flood or any_notify)) or self.csr.num_edges == 0:
            self.notify[:] = False  # edgeless partitions have no one to tell
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        ef = self.csr.eflags[dix.order]
        src_ord = dix.src_row[dix.order]
        # assigned vertices never flood (their labels are final/stale)
        un_src = self.scc[src_ord] == _SCC_UNSET
        fsel_e = self.fch[src_ord] & un_src & ((ef & 1) != 0)
        bsel_e = self.bch[src_ord] & un_src & ((ef & 2) != 0)
        nsel_e = self.notify[src_ord]
        fval = self.f[src_ord]
        bval = self.b[src_ord]
        sorted_dst = self.csr.indices[dix.order]
        dec_in = (nsel_e & ((ef & 1) != 0)).astype(np.int64)
        dec_out = (nsel_e & ((ef & 2) != 0)).astype(np.int64)
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            fs, bs, ns = fsel_e[s:e], bsel_e[s:e], nsel_e[s:e]
            if not (fs.any() or bs.any() or ns.any()):
                outbox.append(None)
                continue
            msg = {}
            if fs.any():
                fd, fm = _group_min(sorted_dst[s:e][fs], fval[s:e][fs])
                msg["fd"], msg["fm"] = fd, fm
                sent += len(fd)
            if bs.any():
                bd, bm = _group_min(sorted_dst[s:e][bs], bval[s:e][bs])
                msg["bd"], msg["bm"] = bd, bm
                sent += len(bd)
            # own-partition decrements were already applied in-place by
            # _decrement_local (the local trim cascade) — don't resend them
            if ns.any() and p != self.csr.part:
                di = np.bincount(
                    dix.inverse[p], weights=dec_in[s:e],
                    minlength=len(dix.uniq_dst[p]),
                ).astype(np.int64)
                do = np.bincount(
                    dix.inverse[p], weights=dec_out[s:e],
                    minlength=len(dix.uniq_dst[p]),
                ).astype(np.int64)
                nz = (di != 0) | (do != 0)
                if nz.any():
                    msg["ad"] = dix.uniq_dst[p][nz]
                    msg["di"] = di[nz]
                    msg["do"] = do[nz]
                    sent += int(nz.sum())
            if msg:
                outbox.append(msg)
                continue
            outbox.append(None)
        self.fch[:] = False
        self.bch[:] = False
        self.notify[:] = False
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table(
            {
                "vid": self.csr.vids,
                "scc": self.scc,
                "f": self.f,
                "b": self.b,
                "fch": self.fch,
                "bch": self.bch,
                "in_un": self.in_un,
                "out_un": self.out_un,
                "notify": self.notify,
            }
        )

    def load_state(self, table, step):
        self.scc = table["scc"].to_numpy().astype(np.uint64).copy()
        self.f = table["f"].to_numpy().astype(np.uint64).copy()
        self.b = table["b"].to_numpy().astype(np.uint64).copy()
        self.fch = table["fch"].to_numpy().copy()
        self.bch = table["bch"].to_numpy().copy()
        self.in_un = table["in_un"].to_numpy().astype(np.int64).copy()
        self.out_un = table["out_un"].to_numpy().astype(np.int64).copy()
        self.notify = table["notify"].to_numpy().copy()

    def result_table(self):
        return pa.table({"vid": self.csr.vids, "scc": self.scc})


class DagLevelProgram(VertexProgram):
    """Longest-path layering of a DAG (topological levels): level(v) =
    length of the longest directed path ENDING at v — max-propagation
    Bellman-Ford along forward ``eflags`` edges. Converges in
    (longest path + 1) supersteps on a DAG; a cyclic input never
    converges, so run it on the SCC CONDENSATION (see
    ``pipelines.algorithms.condensation_levels``). The scheduling-depth /
    pipeline-stage number every DAG consumer wants (critical-path
    layering). Frontier-based: only vertices whose level grew last step
    scatter; messages are group-max pre-aggregated per destination
    partition (the combiner), mirroring _MinPropagationProgram with the
    lattice flipped."""

    def init(self, csr: CSRPartition, **params):
        self.csr = csr
        if csr.eflags is None and csr.num_edges > 0:
            raise ValueError("dag_level needs per-edge direction flags")
        self.level = np.zeros(csr.num_vertices, np.int64)
        self.changed = np.ones(csr.num_vertices, dtype=bool)

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": int(self.changed.sum())}
        new_changed = np.zeros(self.csr.num_vertices, dtype=bool)
        for msg in inbox:
            if msg is None or len(msg["dst"]) == 0:
                continue
            li = self.csr.local_index(msg["dst"])
            better = msg["max"] > self.level[li]
            if better.any():
                np.maximum.at(self.level, li, msg["max"])
                new_changed[li[better]] = True
        self.changed = new_changed
        return {"active": int(new_changed.sum())}

    def scatter(self, step):
        P = self.csr.num_parts
        if not self.changed.any() or self.csr.num_edges == 0:
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        src_ord = dix.src_row[dix.order]
        sel_e = self.changed[src_ord]
        if self.csr.eflags is not None:
            sel_e = sel_e & ((self.csr.eflags[dix.order] & 1) != 0)
        edge_val = self.level[src_ord] + np.int64(1)
        sorted_dst = self.csr.indices[dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            sel = sel_e[s:e]
            if not sel.any():
                outbox.append(None)
                continue
            dsts, maxs = _group_max(sorted_dst[s:e][sel], edge_val[s:e][sel])
            outbox.append({"dst": dsts, "max": maxs})
            sent += len(dsts)
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table(
            {"vid": self.csr.vids, "level": self.level, "changed": self.changed}
        )

    def load_state(self, table, step):
        self.level = table["level"].to_numpy().copy()
        self.changed = table["changed"].to_numpy().copy()

    def result_table(self):
        return pa.table({"vid": self.csr.vids, "level": self.level})


class LinearThresholdProgram(VertexProgram):
    """Deterministic linear-threshold cascade (Kempe, Kleinberg & Tardos
    KDD'03 — the LTM influence-propagation model with a FIXED uniform
    threshold, so the spread is exact, not Monte-Carlo): seeds are
    ``vid % seed_mod == 0``; an inactive vertex activates the round
    ``den·|N(v) ∩ active| ≥ num·deg(v)`` first holds (θ = num/den as an
    integer cross-multiplication — no float threshold) →
    result (vid, activated_round), −1 = never. Monotone, so the cascade
    converges; frontier-based: only NEWLY activated vertices scatter,
    and each sends a plain +1-per-neighbor count, pre-summed per
    destination inside the sender (the combiner).

    The who-to-seed / how-far-does-influence-reach primitive every
    viral-marketing / contagion analysis starts from."""

    def init(self, csr: CSRPartition, seed_mod=101, num=1, den=3):
        self.csr = csr
        self.num = np.int64(num)
        self.den = np.int64(den)
        self.deg = csr.degrees().astype(np.int64)
        seeds = (csr.vids % np.uint64(int(seed_mod))) == 0
        self.active = seeds.copy()
        self.round_act = np.where(seeds, np.int64(0), np.int64(-1))
        self.acc = np.zeros(csr.num_vertices, np.int64)  # active nbr count
        self.new = seeds.copy()

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": int(self.new.sum())}
        for msg in inbox:
            if msg is None or len(msg["dst"]) == 0:
                continue
            li = self.csr.local_index(msg["dst"])
            np.add.at(self.acc, li, msg["cnt"])
        fire = (
            ~self.active
            & (self.deg > 0)
            & (self.den * self.acc >= self.num * self.deg)
        )
        self.active |= fire
        self.round_act[fire] = step
        self.new = fire
        return {"active": int(fire.sum())}

    def scatter(self, step):
        P = self.csr.num_parts
        if not self.new.any() or self.csr.num_edges == 0:
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        sel_e = self.new[dix.src_row][dix.order]
        sorted_dst = self.csr.indices[dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            sel = sel_e[s:e]
            if not sel.any():
                outbox.append(None)
                continue
            dsts, cnts = np.unique(sorted_dst[s:e][sel], return_counts=True)
            outbox.append({"dst": dsts, "cnt": cnts.astype(np.int64)})
            sent += len(dsts)
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table(
            {"vid": self.csr.vids, "active": self.active,
             "round_act": self.round_act, "acc": self.acc, "new": self.new}
        )

    def load_state(self, table, step):
        self.active = table["active"].to_numpy().copy()
        self.round_act = table["round_act"].to_numpy().copy()
        self.acc = table["acc"].to_numpy().copy()
        self.new = table["new"].to_numpy().copy()

    def result_table(self):
        return pa.table(
            {"vid": self.csr.vids, "activated_round": self.round_act}
        )


class ReachProgram(VertexProgram):
    """Single-seed bidirectional reachability over a flag-symmetrized
    DIRECTED graph (``CSRPartition.eflags`` direction bits, see SCCProgram):
    fwd(v) = seed →* v, bwd(v) = v →* seed, both propagated in the same
    supersteps as frontier-based bit floods. The bow-tie building block
    (Broder et al. 2000, "Graph structure in the web" — public): with the
    seed chosen INSIDE the core SCC, fwd/bwd from that one vertex equal
    fwd/bwd from the whole core, so IN/OUT/OTHER classification needs no
    seed-set broadcast."""

    def init(self, csr: CSRPartition, seed_vid=0):
        self.csr = csr
        if csr.eflags is None and csr.num_edges > 0:
            raise ValueError("reach needs per-edge direction flags")
        seed = csr.vids == np.uint64(int(seed_vid))
        self.fwd = seed.copy()
        self.bwd = seed.copy()
        self.fch = seed.copy()
        self.bch = seed.copy()

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": int(self.fch.sum())}
        changed = 0
        for msg in inbox:
            if msg is None:
                continue
            for dk, reached, ch in (("fd", self.fwd, self.fch), ("bd", self.bwd, self.bch)):
                if dk not in msg or len(msg[dk]) == 0:
                    continue
                li = self.csr.local_index(msg[dk])
                new = ~reached[li]
                if new.any():
                    idx = li[new]
                    reached[idx] = True
                    ch[idx] = True
                    changed += int(new.sum())
        return {"active": changed}

    def scatter(self, step):
        P = self.csr.num_parts
        if not (self.fch.any() or self.bch.any()) or self.csr.num_edges == 0:
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        ef = self.csr.eflags[dix.order]
        src_ord = dix.src_row[dix.order]
        fsel_e = self.fch[src_ord] & ((ef & 1) != 0)
        bsel_e = self.bch[src_ord] & ((ef & 2) != 0)
        sorted_dst = self.csr.indices[dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            fs, bs = fsel_e[s:e], bsel_e[s:e]
            if not (fs.any() or bs.any()):
                outbox.append(None)
                continue
            msg = {}
            if fs.any():
                msg["fd"] = np.unique(sorted_dst[s:e][fs])
                sent += len(msg["fd"])
            if bs.any():
                msg["bd"] = np.unique(sorted_dst[s:e][bs])
                sent += len(msg["bd"])
            outbox.append(msg)
        self.fch[:] = False
        self.bch[:] = False
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table(
            {
                "vid": self.csr.vids,
                "fwd": self.fwd,
                "bwd": self.bwd,
                "fch": self.fch,
                "bch": self.bch,
            }
        )

    def load_state(self, table, step):
        self.fwd = table["fwd"].to_numpy().copy()
        self.bwd = table["bwd"].to_numpy().copy()
        self.fch = table["fch"].to_numpy().copy()
        self.bch = table["bch"].to_numpy().copy()

    def result_table(self):
        return pa.table(
            {"vid": self.csr.vids, "fwd": self.fwd, "bwd": self.bwd}
        )


class SemiClusteringProgram(VertexProgram):
    """Semi-clustering from THE Pregel paper (Malewicz et al., SIGMOD 2010
    §5.3 — the engine's lineage paper, and the one canonical example the
    registry was missing): every vertex maintains at most ``c_max``
    overlapping semi-clusters of at most ``m_max`` members; a cluster's
    score is S_c = (I_c − f_b·B_c) / (|V_c|·(|V_c|−1)/2) with I_c the
    internal and B_c the boundary edge count (unit weights here) —
    singletons score 0. Per superstep a vertex merges the cluster lists
    arriving from its neighbors, additionally extends every arriving
    cluster that does not contain it (and is below ``m_max``) with itself
    — I/B updated incrementally from its OWN adjacency
    (I' = I + k_in, B' = B − k_in + (deg − k_in), so I/B stay exact
    functions of the member set regardless of join order — which makes
    the member-set dedup safe), keeps the ``c_max`` best by
    (score desc, member-tuple asc) and re-broadcasts.

    Deterministic and partition-count invariant: every vertex sees exactly
    its neighbors' previous-step lists, scores are pure functions of int
    (I, B), and the ranking is a total order. This is the ONE program in
    the registry whose inner loop is Python set objects by design — the
    paper's own formulation is per-vertex set manipulation; cost is
    bounded by deg·c_max per vertex per superstep with ≤ m_max-member
    sets, sized for the sparse strong graph, not the raw co-purchase
    blow-up. Messages carry (dst, I, B, off, cnt, mem) flattened arrays.
    """

    def init(self, csr: CSRPartition, iters=4, c_max=2, m_max=4, f_b=0.1):
        self.csr = csr
        self.iters = int(iters)
        self.c_max = int(c_max)
        self.m_max = int(m_max)
        self.f_b = float(f_b)
        self.adj = [
            set(int(u) for u in csr.indices[s:e])
            for s, e in zip(csr.indptr[:-1], csr.indptr[1:])
        ]
        self.vlist = [int(v) for v in csr.vids]
        self.clusters = [
            [((v,), 0, len(a))] for v, a in zip(self.vlist, self.adj)
        ]
        self.done = False

    def _score(self, mem, I, B):
        n = len(mem)
        if n < 2:
            return 0.0
        return (I - self.f_b * B) / (n * (n - 1) / 2)

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": 1}
        recv: list[list] = [[] for _ in range(self.csr.num_vertices)]
        for msg in inbox:
            if msg is None or len(msg["dst"]) == 0:
                continue
            li = self.csr.local_index(msg["dst"])
            mem, off, cnt = msg["mem"], msg["off"], msg["cnt"]
            I, B = msg["I"], msg["B"]
            for j in range(len(li)):
                mm = tuple(int(u) for u in mem[off[j] : off[j] + cnt[j]])
                recv[li[j]].append((mm, int(I[j]), int(B[j])))
        changed = 0
        for li in range(self.csr.num_vertices):
            if not recv[li]:
                continue
            v = self.vlist[li]
            adj = self.adj[li]
            degv = len(adj)
            cand = {c[0]: c for c in self.clusters[li]}
            for mm, I, B in recv[li]:
                if mm not in cand:
                    cand[mm] = (mm, I, B)
                if v not in mm and len(mm) < self.m_max:
                    nm = tuple(sorted(mm + (v,)))
                    if nm not in cand:
                        kin = sum(1 for u in mm if u in adj)
                        cand[nm] = (nm, I + kin, B - kin + (degv - kin))
            ranked = sorted(
                cand.values(), key=lambda c: (-self._score(*c), c[0])
            )[: self.c_max]
            if ranked != self.clusters[li]:
                changed += 1
            self.clusters[li] = ranked
        self.done = step >= self.iters
        return {"active": 0 if self.done else int(changed)}

    def scatter(self, step):
        P = self.csr.num_parts
        if self.done:
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        sorted_dst = self.csr.indices[dix.order]
        rows = dix.src_row[dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            if s == e:
                outbox.append(None)
                continue
            dsts: list[int] = []
            Is: list[int] = []
            Bs: list[int] = []
            cnts: list[int] = []
            mems: list[int] = []
            for j in range(s, e):
                d = int(sorted_dst[j])
                for mm, I, B in self.clusters[rows[j]]:
                    dsts.append(d)
                    Is.append(I)
                    Bs.append(B)
                    cnts.append(len(mm))
                    mems.extend(mm)
            cnt = np.asarray(cnts, dtype=np.int64)
            off = np.zeros(len(cnt), dtype=np.int64)
            if len(cnt) > 1:
                np.cumsum(cnt[:-1], out=off[1:])
            outbox.append(
                {
                    "dst": np.asarray(dsts, dtype=np.uint64),
                    "I": np.asarray(Is, dtype=np.int64),
                    "B": np.asarray(Bs, dtype=np.int64),
                    "cnt": cnt,
                    "off": off,
                    "mem": np.asarray(mems, dtype=np.uint64),
                }
            )
            sent += len(dsts)
        return outbox, {"sent": sent}

    def result_table(self):
        from ..functions.rounding import round_half_away

        best_mem, best_score = [], []
        for li in range(self.csr.num_vertices):
            # best cluster CONTAINING v — the per-vertex community
            # assignment (foreign clusters circulate per the paper but are
            # not v's own membership); singleton fallback if none survived
            v = self.vlist[li]
            own = [c for c in self.clusters[li] if v in c[0]]
            mm, I, B = own[0] if own else ((v,), 0, len(self.adj[li]))
            best_mem.append(",".join(str(u) for u in mm))
            best_score.append(self._score(mm, I, B))
        return pa.table(
            {
                "vid": self.csr.vids,
                "cluster": pa.array(best_mem, pa.string()),
                "score": round_half_away(
                    np.asarray(best_score, dtype=np.float64), 6
                ),
            }
        )

    def state_table(self):
        # flatten (li, rank, I, B, members…) — enough to resume mid-run
        lis, rks, Is, Bs, cnts, mems = [], [], [], [], [], []
        for li, cl in enumerate(self.clusters):
            for r, (mm, I, B) in enumerate(cl):
                lis.append(li)
                rks.append(r)
                Is.append(I)
                Bs.append(B)
                cnts.append(len(mm))
                mems.extend(mm)
        return pa.table(
            {
                "li": pa.array(lis, pa.int64()),
                "rank": pa.array(rks, pa.int64()),
                "I": pa.array(Is, pa.int64()),
                "B": pa.array(Bs, pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
                "mem": pa.array(
                    np.split(np.asarray(mems, dtype=np.int64), np.cumsum(cnts)[:-1])
                    if cnts
                    else [],
                    pa.list_(pa.int64()),
                ),
            }
        )

    def load_state(self, table, step):
        self.clusters = [[] for _ in range(self.csr.num_vertices)]
        for li, I, B, mm in zip(
            table["li"].to_pylist(),
            table["I"].to_pylist(),
            table["B"].to_pylist(),
            table["mem"].to_pylist(),
        ):
            self.clusters[li].append((tuple(mm), I, B))
        self.done = False


class SeededLabelProgram(VertexProgram):
    """Semi-supervised seeded label propagation (Zhu & Ghahramani 2002
    shape, synchronous, deterministic): seed vertices (vid % seed_mod == 0)
    carry a CLAMPED class label (vid % label_mod); every other vertex takes,
    each round, the most frequent label among its LABELED neighbors (min
    label on ties), starting unlabeled (−1). Labels flood outward from the
    seeds for exactly ``iters`` rounds — the label-inference workhorse for
    sparsely-annotated web/content graphs (vs
    :class:`LabelPropagationProgram`, whose labels are self-initialized
    communities and nothing is clamped).

    Messages are pre-aggregated (dst, label, cnt) triples from LABELED
    vertices only, so early rounds ship only the seed frontier — at web
    scale the first supersteps cost O(seed-adjacent edges), not O(E)."""

    def init(self, csr: CSRPartition, iters=5, seed_mod=10, label_mod=3):
        self.csr = csr
        self.iters = int(iters)
        self.seed = (csr.vids % int(seed_mod)) == 0
        self.label = np.where(self.seed, csr.vids % int(label_mod), -1).astype(np.int64)
        self.done = False

    def apply(self, step, inbox, glob):
        if step == 0:
            return {"active": 1}
        dsts, labs, cnts = [], [], []
        for msg in inbox:
            if msg is None or len(msg["dst"]) == 0:
                continue
            dsts.append(msg["dst"]); labs.append(msg["label"]); cnts.append(msg["cnt"])
        if dsts:
            dst = np.concatenate(dsts); lab = np.concatenate(labs); cnt = np.concatenate(cnts)
            li = self.csr.local_index(dst)
            ulab, lab_dense = np.unique(lab, return_inverse=True)
            key = li.astype(np.uint64) << np.uint64(32) | lab_dense.astype(np.uint64)
            ukey, kinv = np.unique(key, return_inverse=True)
            tot = np.bincount(kinv, weights=cnt.astype(np.float64))
            kli = (ukey >> np.uint64(32)).astype(np.int64)
            klab = ulab[(ukey & np.uint64(0xFFFFFFFF)).astype(np.int64)]
            order = np.lexsort((klab, -tot, kli))
            first_li, first_pos = np.unique(kli[order], return_index=True)
            winner = klab[order][first_pos]
            upd = ~self.seed[first_li]  # seeds are clamped
            self.label[first_li[upd]] = winner[upd]
        if step >= self.iters:
            self.done = True
            return {"active": 0}
        return {"active": 1}

    def scatter(self, step):
        P = self.csr.num_parts
        if self.done:
            return [None] * P, {"sent": 0}
        dix = self.csr.dst_index()
        edge_lab = self.label[dix.src_row][dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            lab = edge_lab[s:e]
            m = lab >= 0  # only labeled vertices speak
            if not m.any():
                outbox.append(None)
                continue
            lab = lab[m]
            inv = dix.inverse[p][m]
            ulab, lab_dense = np.unique(lab, return_inverse=True)
            key = inv.astype(np.uint64) << np.uint64(32) | lab_dense.astype(np.uint64)
            ukey, ucnt = np.unique(key, return_counts=True)
            outbox.append(
                {
                    "dst": dix.uniq_dst[p][(ukey >> np.uint64(32)).astype(np.int64)],
                    "label": ulab[(ukey & np.uint64(0xFFFFFFFF)).astype(np.int64)],
                    "cnt": ucnt.astype(np.int64),
                }
            )
            sent += len(ukey)
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table({"vid": self.csr.vids, "label": self.label,
                         "done": pa.array(np.full(self.csr.num_vertices, self.done, dtype=bool))})

    def load_state(self, table, step):
        self.label = table["label"].to_numpy().copy()
        dn = table["done"].to_numpy()
        self.done = bool(dn[0]) if len(dn) else False

    def result_table(self):
        return pa.table({"vid": self.csr.vids, "label": self.label})


class DensestSubgraphProgram(VertexProgram):
    """Parallel greedy densest-subgraph peeling (Bahmani, Kumar & Vassilvitskii,
    VLDB 2012, ε = 1/2): in round r, every alive vertex whose alive-degree
    satisfies 2·deg·V ≤ 3·ΣD (i.e. deg ≤ (1+ε)·avg_deg, compared EXACTLY in
    integers — ΣD = Σ alive degrees = 2·E_alive) is peeled; the densest
    prefix of the peel order 2-approximates (1+ε)-approximates the maximum
    density (the surviving-set density is within 2(1+ε) of optimal). Output
    is the full peel schedule (vid, peel_round) — density per round is a
    downstream fold over it, and the max-density alive set is
    {v : peel_round ≥ argmax_r density_r}.

    BSP shape: TWO supersteps per round. Even steps are the census — apply
    folds inbox degree decrements, then publishes partial (V, SD) which the
    driver sums and re-broadcasts as ``glob`` (the T5 aggregator path). Odd
    steps peel with the EXACT global integer rule and scatter one decrement
    message per (peeled → neighbor) edge, grouped per destination. At most
    ~log_{3/2}(V) rounds (each peels ≥ V/3 vertices, Markov bound), so a
    trillion-vertex graph converges in ≤ ~70 supersteps. Integer-overflow
    bound: the rule forms 2·deg·V in int64 — exact while deg·V < 2⁶²
    (shard or re-scale beyond ~10⁹ vertices × 10⁹ max-degree; far past any
    real web graph's product)."""

    def init(self, csr: CSRPartition):
        self.csr = csr
        self.deg = csr.degrees().astype(np.int64)
        self.alive = np.ones(csr.num_vertices, dtype=bool)
        self.peel_round = np.full(csr.num_vertices, -1, dtype=np.int64)
        self.last_peel = np.zeros(csr.num_vertices, dtype=bool)

    def apply(self, step, inbox, glob):
        if step % 2 == 0:  # census phase: fold decrements, publish (V, SD)
            for msg in inbox:
                if msg is None or len(msg["dst"]) == 0:
                    continue
                li = self.csr.local_index(msg["dst"])
                np.subtract.at(self.deg, li, msg["dec"])
            V = int(self.alive.sum())
            SD = int(self.deg[self.alive].sum())
            self.last_peel = np.zeros(self.csr.num_vertices, dtype=bool)
            return {"active": V, "V": V, "SD": SD}
        # peel phase: exact integer (1+ε) average-degree rule, ε = 1/2
        V = int(glob.get("V", 0))
        SD = int(glob.get("SD", 0))
        if V == 0:
            self.last_peel = np.zeros(self.csr.num_vertices, dtype=bool)
            return {"active": 0}
        peel = self.alive & (2 * self.deg * V <= 3 * SD)
        self.peel_round[peel] = (step - 1) // 2
        self.alive[peel] = False
        self.last_peel = peel
        return {"active": int(self.alive.sum()), "peeled": int(peel.sum())}

    def scatter(self, step):
        if step % 2 == 0 or not self.last_peel.any():
            return [None] * self.csr.num_parts, {"sent": 0}
        P = self.csr.num_parts
        dix = self.csr.dst_index()
        edge_sel = self.last_peel[dix.src_row][dix.order]
        sorted_dst = self.csr.indices[dix.order]
        outbox, sent = [], 0
        for p in range(P):
            s, e = dix.slices[p]
            sel = edge_sel[s:e]
            if not sel.any():
                outbox.append(None)
                continue
            uniq, cnt = np.unique(sorted_dst[s:e][sel], return_counts=True)
            outbox.append({"dst": uniq, "dec": cnt.astype(np.int64)})
            sent += int(cnt.sum())
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table(
            {
                "vid": self.csr.vids,
                "deg": self.deg,
                "alive": self.alive,
                "peel_round": self.peel_round,
            }
        )

    def load_state(self, table, step):
        self.deg = table["deg"].to_numpy().copy()
        self.alive = table["alive"].to_numpy().copy()
        self.peel_round = table["peel_round"].to_numpy().copy()
        # resume re-runs the checkpointed step's scatter: reconstruct the
        # just-peeled mask from the schedule (odd steps peeled round
        # (step−1)//2; even steps scatter nothing)
        if step % 2 == 1:
            self.last_peel = self.peel_round == (step - 1) // 2
        else:
            self.last_peel = np.zeros(self.csr.num_vertices, dtype=bool)

    def result_table(self):
        return pa.table({"vid": self.csr.vids, "peel_round": self.peel_round})


class DegreeDiscountProgram(VertexProgram):
    """DegreeDiscount influence-maximization seeds (Chen, Wang & Yang, KDD
    2009, algorithm 4) at propagation probability p = 0.01, run EXACTLY in
    integers: dd(v)·100 = 100·d_v − 200·t_v − (d_v − t_v)·t_v, where t_v is
    v's count of already-selected neighbors. Greedy k rounds; each round
    selects the global (dd, −vid)-max unselected vertex and discounts its
    neighbors. Deterministic and integer-exact, so a k-round SQL unroll
    replays it bit-for-bit — unlike simulation-based influence
    maximization, which is Monte-Carlo.

    BSP shape: THREE supersteps per round through the T5 aggregator —
    (0) every partition publishes its local max dd over unselected vertices
    (``max_dd`` folds by max); (1) holders of the global max publish
    ``max_negvid`` (= −min vid, the tie-break); (2) the winner's owner
    records (rank, vid, dd) and scatters one discount message per neighbor,
    folded into t at the next round's phase 0. 3k supersteps total — the
    superstep count is O(k), independent of graph size."""

    _NEG = -(1 << 62)

    def init(self, csr: CSRPartition, k: int = 10):
        self.csr = csr
        self.k = int(k)
        self.d = csr.degrees().astype(np.int64)
        self.t = np.zeros(csr.num_vertices, dtype=np.int64)
        self.selected = np.zeros(csr.num_vertices, dtype=bool)
        self.sel_rank = np.full(csr.num_vertices, -1, dtype=np.int64)
        self.sel_dd = np.zeros(csr.num_vertices, dtype=np.int64)
        self.winner_row = -1

    def _dd(self) -> np.ndarray:
        return 100 * self.d - 200 * self.t - (self.d - self.t) * self.t

    def apply(self, step, inbox, glob):
        phase, rnd = step % 3, step // 3
        if phase == 0:
            for msg in inbox:
                if msg is None or len(msg["dst"]) == 0:
                    continue
                li = self.csr.local_index(msg["dst"])
                np.add.at(self.t, li, 1)
            if rnd >= self.k:
                return {"active": 0}
            alive = ~self.selected
            dd = self._dd()
            mx = int(dd[alive].max()) if alive.any() else self._NEG
            return {"active": 1, "max_dd": mx}
        if phase == 1:
            mx = int(glob.get("max_dd", self._NEG))
            hold = (~self.selected) & (self._dd() == mx)
            negvid = (
                int((-self.csr.vids[hold].astype(np.int64)).max())
                if hold.any()
                else self._NEG
            )
            return {"active": 1, "max_dd": mx, "max_negvid": negvid}
        # phase 2: select the winner, remember it for scatter
        w = -int(glob.get("max_negvid", self._NEG))
        self.winner_row = -1
        pos = int(np.searchsorted(self.csr.vids, w))
        if pos < len(self.csr.vids) and int(self.csr.vids[pos]) == w:
            self.winner_row = pos
            self.selected[pos] = True
            self.sel_rank[pos] = rnd
            self.sel_dd[pos] = int(glob.get("max_dd", 0))
        return {"active": 1}

    def scatter(self, step):
        P = self.csr.num_parts
        if step % 3 != 2 or self.winner_row < 0:
            return [None] * P, {"sent": 0}
        # Keep dst as raw uint64 and route via the repo-wide ``part_for``
        # (uint64 modulo): an int64 cast would flip the residue for hashed
        # vids >= 2^63 under a non-power-of-2 P, and the float64 promotion in
        # searchsorted(int64, uint64) silently mis-lands the discount.
        nbrs = np.sort(self.csr.row_slice(self.winner_row))
        outbox, sent = [], 0
        owner = part_for(nbrs, P)
        for p in range(P):
            d = nbrs[owner == p]
            if len(d) == 0:
                outbox.append(None)
                continue
            outbox.append({"dst": d})
            sent += len(d)
        return outbox, {"sent": sent}

    def state_table(self):
        return pa.table(
            {
                "vid": self.csr.vids,
                "d": self.d,
                "t": self.t,
                "selected": self.selected,
                "sel_rank": self.sel_rank,
                "sel_dd": self.sel_dd,
            }
        )

    def load_state(self, table, step):
        self.d = table["d"].to_numpy().copy()
        self.t = table["t"].to_numpy().copy()
        self.selected = table["selected"].to_numpy().copy()
        self.sel_rank = table["sel_rank"].to_numpy().copy()
        self.sel_dd = table["sel_dd"].to_numpy().copy()
        # resume re-runs the checkpointed step's scatter: recover the
        # winner of round step//3 if this partition owns it
        self.winner_row = -1
        if step % 3 == 2:
            rows = np.nonzero(self.sel_rank == step // 3)[0]
            if len(rows):
                self.winner_row = int(rows[0])

    def result_table(self):
        return pa.table(
            {
                "vid": self.csr.vids,
                "rank": self.sel_rank,
                "dd100": self.sel_dd,
            }
        )


PROGRAMS = {
    "pagerank": PageRankProgram,
    "cc": ConnectedComponentsProgram,
    "sssp": SSSPProgram,
    "mis": MaximalIndependentSetProgram,
    "lpa": LabelPropagationProgram,
    "triangles": TriangleCountProgram,
    "match": MatchProgram,
    "multi_match": MultiMatchProgram,
    "kcore": KCoreProgram,
    "score": SCoreProgram,
    "ktruss": KTrussProgram,
    "assortativity": AssortativityProgram,
    "wassortativity": WeightedAssortativityProgram,
    "spectral_radius": SpectralRadiusProgram,
    "ppr": PersonalizedPageRankProgram,
    "walk": RandomWalkProgram,
    "hits": HITSProgram,
    "hyperball": HyperBallProgram,
    "betweenness": BetweennessProgram,
    "closeness": HarmonicClosenessProgram,
    "wsssp": WeightedSSSPProgram,
    "coloring": GreedyColoringProgram,
    "eccentricity": EccentricityProgram,
    "pivot_ecc": PivotEccProgram,
    "katz": KatzCentralityProgram,
    "scc": SCCProgram,
    "reach": ReachProgram,
    "dag_level": DagLevelProgram,
    "ltm": LinearThresholdProgram,
    "wpagerank": WeightedPageRankProgram,
    "wsssp_stored": StoredWeightSSSPProgram,
    "semicluster": SemiClusteringProgram,
    "matching": MaximalMatchingProgram,
    "seeded_lpa": SeededLabelProgram,
    "densest": DensestSubgraphProgram,
    "degdiscount": DegreeDiscountProgram,
}
