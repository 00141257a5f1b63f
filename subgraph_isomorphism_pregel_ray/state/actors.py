"""GraphPartition — the Ray actor hosting one partition's CSR + program state.

The analogue of the reference's per-rank ``Worker`` (``basic/Worker.h:16``),
decoupled the Ray way (SURVEY.md §4.3): Datasets move data, this actor holds
state. One actor per partition, created once per job (or resume), addressed
explicitly by the BSP driver — because ``map_batches(Cls)`` gives no
batch→actor affinity, which cross-superstep vertex state requires.

Message exchange is an explicit all-to-all through the object store: each
``superstep`` call returns P+1 values (``num_returns``), one outbox per
destination partition plus a stats dict; the driver hands ref ``[p]`` of
every sender to actor ``p`` next step, so payloads move store-to-store
(node-to-node on a real cluster) without driver materialization — the
analogue of ``all_to_all_cat`` (``utils/communication.h:159-211``).
"""

from __future__ import annotations

import glob as _glob
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .csr import build_csr
from .programs import PROGRAMS


def _read_part_dir(path_glob: str, columns=None) -> pa.Table | None:
    files = sorted(_glob.glob(path_glob))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f, columns=columns) for f in files])


def _outbox_bytes(outbox) -> int:
    """Payload bytes of one scatter's outbox (numpy arrays inside the
    per-destination message dicts) — the per-superstep exchange volume the
    deep-query benchmark tracks (peak frontier width)."""
    total = 0
    for msg in outbox or ():
        if msg is None:
            continue
        if isinstance(msg, dict):
            vals = msg.values()
        elif isinstance(msg, (list, tuple)):
            vals = msg
        else:
            vals = (msg,)
        for v in vals:
            if isinstance(v, np.ndarray):
                total += v.nbytes
            elif isinstance(v, (list, tuple)):
                total += sum(
                    x.nbytes for x in v if isinstance(x, np.ndarray)
                )
    return total


@ray.remote
class GraphPartition:
    """Holds one partition's CSR and runs program supersteps on it."""

    def __init__(self, part: int, num_parts: int, graph_dir: str):
        """Load this partition's slice of the partitioned graph layout
        written by ``pipelines.build_graph.partition_graph``:
        ``graph_dir/edges/part=<p>/*.parquet`` (src, dst) and
        ``graph_dir/verts/part=<p>/*.parquet`` (vid[, label])."""
        self.part = part
        self.num_parts = num_parts
        edges = _read_part_dir(os.path.join(graph_dir, "edges", f"part={part}", "*.parquet"))
        verts = _read_part_dir(os.path.join(graph_dir, "verts", f"part={part}", "*.parquet"))
        eflags, eweights = None, None
        if edges is not None:
            src = edges["src"].to_numpy().astype(np.uint64)
            dst = edges["dst"].to_numpy().astype(np.uint64)
            if "flag" in edges.column_names:
                eflags = edges["flag"].to_numpy().astype(np.uint8)
            if "weight" in edges.column_names:
                eweights = edges["weight"].to_numpy().astype(np.int64)
        else:
            src = np.empty(0, np.uint64); dst = np.empty(0, np.uint64)
        if verts is not None:
            vids = verts["vid"].to_numpy().astype(np.uint64)
            labels = verts["label"].to_numpy() if "label" in verts.column_names else None
        else:
            vids, labels = np.empty(0, np.uint64), None
        self.csr = build_csr(part, num_parts, src, dst, vids, labels,
                             eflags=eflags, eweights=eweights)
        self.program = None

    # ---- introspection ---------------------------------------------------
    def stats(self) -> dict:
        return {
            "part": self.part,
            "vertices": self.csr.num_vertices,
            "edges": self.csr.num_edges,
        }

    # ---- attribute exchange (PREPROCESS analogue) ------------------------
    def attr_requests(self):
        """Per destination partition: the distinct dst vids this partition's
        edges reference there (P return values via num_returns)."""
        dix = self.csr.dst_index()
        return tuple(dix.uniq_dst)

    def _strengths(self) -> np.ndarray:
        """Per-vertex strength = Σ incident stored edge weights (falls back
        to degree when the layout has no weight channel); cached."""
        if not hasattr(self, "_strength_cache"):
            if self.csr.eweights is None:
                self._strength_cache = self.csr.degrees().astype(np.int64)
            else:
                s = np.zeros(self.csr.num_vertices, dtype=np.int64)
                rows = np.repeat(
                    np.arange(self.csr.num_vertices, dtype=np.int64),
                    np.diff(self.csr.indptr),
                )
                np.add.at(s, rows, self.csr.eweights.astype(np.int64))
                self._strength_cache = s
        return self._strength_cache

    def attr_serve(self, name: str, requests: list):
        """Answer other partitions' vid→attribute lookups (P return values)."""
        out = []
        for req in requests:
            req = ray.get(req) if isinstance(req, ray.ObjectRef) else req
            li = self.csr.local_index(req)
            if name == "degree":
                out.append(self.csr.degrees()[li])
            elif name == "strength":
                out.append(self._strengths()[li])
            elif name == "label":
                out.append(self.csr.labels[li])
            else:
                raise KeyError(name)
        return tuple(out)

    def attr_store(self, name: str, values: list):
        """Scatter served values back onto per-edge arrays."""
        dix = self.csr.dst_index()
        arr = None
        for p, vals in enumerate(values):
            vals = ray.get(vals) if isinstance(vals, ray.ObjectRef) else vals
            s, e = dix.slices[p]
            if s == e:
                continue
            if arr is None:
                arr = np.zeros(self.csr.num_edges, dtype=np.asarray(vals).dtype)
            arr[dix.order[s:e]] = np.asarray(vals)[dix.inverse[p]]
        if arr is None:
            arr = np.zeros(self.csr.num_edges, dtype=np.int64)
        self.csr.nbr_attr[name] = arr
        if name == "label":
            self.csr.nbr_labels = arr
        return True

    def attr_self_exchange(self, name: str):
        """P==1 path: serve this partition's own requests locally.

        With a single partition the remote round degenerates (``num_returns=1``
        returns the whole 1-tuple as one object, mis-shaping the re-wrapping
        in ``BSPEngine.exchange_attr``), so the engine calls this instead.
        """
        (req,) = self.attr_requests()
        (vals,) = self.attr_serve(name, [req])
        return self.attr_store(name, [vals])

    def candidate_counts(self, qlabels: list, qdegs: list, qpairs: list):
        """Candidate statistics for ``-order candidate`` planning (the
        reference PREPROCESS aggregation, ``SItypes/SIAggregator.h:4-13``):
        per query vertex u, # owned vertices with label(u) and degree ≥
        deg_Q(u); per query edge (u1,u2), # owned edges whose src passes u1's
        filter and whose neighbor passes u2's (requires the label+degree
        attribute exchange). Vectorized over the partition's edge arrays."""
        deg = self.csr.degrees()
        lab = (
            self.csr.labels
            if self.csr.labels is not None
            else np.zeros(self.csr.num_vertices, dtype=np.int64)
        )
        diag = [int(((lab == l) & (deg >= d)).sum()) for l, d in zip(qlabels, qdegs)]
        counts = np.diff(self.csr.indptr)
        src_row = np.repeat(np.arange(self.csr.num_vertices, dtype=np.int64), counts)
        s_lab, s_deg = lab[src_row], deg[src_row]
        n_lab = self.csr.nbr_labels
        n_deg = self.csr.nbr_attr["degree"]
        pair = []
        for u1, u2 in qpairs:  # symmetric edge list → one direction suffices
            m = (
                (s_lab == qlabels[u1]) & (s_deg >= qdegs[u1])
                & (n_lab == qlabels[u2]) & (n_deg >= qdegs[u2])
            )
            pair.append(int(m.sum()))
        return diag, pair

    # ---- hub mirror (skew handling) --------------------------------------
    def hub_degrees(self, min_deg: int):
        """Owned vertices with degree ≥ min_deg → (vids, degrees)."""
        deg = self.csr.degrees()
        m = deg >= min_deg
        return self.csr.vids[m], deg[m]

    def hub_adjacency(self, vids):
        """Adjacency slices (with neighbor labels) for owned hub vids."""
        li = self.csr.local_index(np.asarray(vids, dtype=np.uint64))
        starts = self.csr.indptr[li]
        counts = (self.csr.indptr[li + 1] - starts).astype(np.int64)
        from .csr import flat_gather

        eidx = flat_gather(starts, counts)
        nbr_lab = (
            self.csr.nbr_labels[eidx]
            if self.csr.nbr_labels is not None
            else np.zeros(len(eidx), dtype=np.int64)
        )
        return counts, self.csr.indices[eidx], nbr_lab

    def store_hub_mirror(self, mirror_ref):
        self.csr.hub_mirror = (
            ray.get(mirror_ref) if isinstance(mirror_ref, ray.ObjectRef) else mirror_ref
        )
        return True

    # ---- program lifecycle ----------------------------------------------
    def init_program(self, name: str, params: dict):
        self.program = PROGRAMS[name]()
        self.program.init(self.csr, **params)
        return True

    def load_checkpoint(self, path: str, step: int):
        self.program.load_state(pq.read_table(path), step)
        return True

    def superstep(
        self,
        step: int,
        inbox: list,
        glob: dict,
        checkpoint_path: str | None,
        skip_apply: bool = False,
        packed: bool = False,
    ):
        """apply → (optional checkpoint) → scatter.

        Returns P outboxes + stats (``num_returns=P+1``), or in ``packed``
        mode the full outbox list + stats (``num_returns=2``) — one object
        per sender per step, the per-node batching granularity; receivers
        slice their partition out of each sender's list (numpy payloads are
        zero-copy views out of the shared object store, so deserializing a
        sender's full list costs near nothing on the same node).

        ``skip_apply`` is the resume path: state was just loaded from the
        post-apply checkpoint of this step, so only scatter re-runs.
        """
        t0 = time.perf_counter()
        if skip_apply:
            msgs = []
            t_get = time.perf_counter()
            stats_a = {"active": int(glob.get("active", 1))}
            checkpoint_path = None
        else:
            if packed:
                msgs = [
                    (ray.get(r) if isinstance(r, ray.ObjectRef) else r)[self.part]
                    for r in inbox
                ]
            else:
                msgs = [ray.get(r) if isinstance(r, ray.ObjectRef) else r for r in inbox]
            t_get = time.perf_counter()
            stats_a = self.program.apply(step, msgs, glob)
        t_apply = time.perf_counter()
        if checkpoint_path is not None:
            tmp = checkpoint_path + ".tmp"
            pq.write_table(self.program.state_table(), tmp)
            os.replace(tmp, checkpoint_path)  # atomic per-partition checkpoint
        t_ck = time.perf_counter()
        outbox, stats_s = self.program.scatter(step)
        t1 = time.perf_counter()
        stats = dict(stats_a)
        stats.update(stats_s)
        stats["sent_bytes"] = _outbox_bytes(outbox)
        stats.update(
            part=self.part,
            t_fetch=t_get - t0,
            t_apply=t_apply - t_get,
            t_checkpoint=t_ck - t_apply,
            t_scatter=t1 - t_ck,
        )
        if packed:
            return outbox, stats
        return (*outbox, stats)

    def result_table(self) -> pa.Table:
        return self.program.result_table()

    def scalar_result(self) -> dict:
        return self.program.scalar_result()
