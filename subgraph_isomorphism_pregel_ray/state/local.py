"""LocalBSP — in-process, Ray-free harness running the same vertex programs.

Used by unit tests (and quick debugging) to exercise the exact numpy
superstep kernels with a simulated all-to-all, so program logic is testable
without a Ray session; the Ray integration tests then only need to cover the
engine plumbing (actors, exchange, checkpointing). The partitioning,
messages, and fold logic intentionally mirror ``pipelines/bsp.py``.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import part_for
from .csr import build_csr
from .programs import PROGRAMS


def _fold(stats):
    out = {}
    for s in stats:
        for k, v in s.items():
            if not isinstance(v, (int, float)) or k == "part":
                continue
            if k.startswith("max_"):  # max-fold keys, mirrors bsp._fold
                out[k] = max(out.get(k, v), v)
            else:
                out[k] = out.get(k, 0) + v
    return out


class LocalBSP:
    def __init__(self, src, dst, num_parts=4, labels=None, directed=True,
                 eflags=None, eweights=None):
        src = np.asarray(src, dtype=np.uint64)
        dst = np.asarray(dst, dtype=np.uint64)
        if eflags is not None:  # per-edge bit flags aligned with (src, dst)
            eflags = np.asarray(eflags, dtype=np.uint8)
        if eweights is not None:  # stored per-edge weights
            eweights = np.asarray(eweights, dtype=np.int64)
        if not directed:
            keep = src != dst
            src, dst = src[keep], dst[keep]
            if eflags is not None:
                eflags = np.tile(eflags[keep], 2)
            if eweights is not None:
                eweights = np.tile(eweights[keep], 2)
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        self.P = num_parts
        vids = np.unique(np.concatenate([src, dst]))
        vlab = None
        if labels is not None:  # labels: dict vid -> label
            vlab = np.array([labels[int(v)] for v in vids], dtype=np.int64)
        epart = part_for(src, num_parts)
        vpart = part_for(vids, num_parts)
        self.csrs = []
        for p in range(num_parts):
            em = epart == p
            vm = vpart == p
            self.csrs.append(
                build_csr(
                    p, num_parts, src[em], dst[em], vids[vm],
                    vlab[vm] if vlab is not None else None,
                    eflags=eflags[em] if eflags is not None else None,
                    eweights=eweights[em] if eweights is not None else None,
                )
            )
        self.num_vertices = len(vids)
        self._exchanged = set()

    def exchange_attr(self, name):
        def _csr_strengths(csr):
            if csr.eweights is None:
                return csr.degrees().astype(np.int64)
            s = np.zeros(csr.num_vertices, dtype=np.int64)
            rows = np.repeat(
                np.arange(csr.num_vertices, dtype=np.int64),
                np.diff(csr.indptr),
            )
            np.add.at(s, rows, csr.eweights.astype(np.int64))
            return s

        if name in self._exchanged:
            return
        for csr in self.csrs:
            dix = csr.dst_index()
            arr = None
            for p in range(self.P):
                s, e = dix.slices[p]
                if s == e:
                    continue
                owner = self.csrs[p]
                li = owner.local_index(dix.uniq_dst[p])
                if name == "degree":
                    vals = owner.degrees()[li]
                elif name == "strength":
                    vals = _csr_strengths(owner)[li]
                else:
                    vals = owner.labels[li]
                if arr is None:
                    arr = np.zeros(csr.num_edges, dtype=np.asarray(vals).dtype)
                arr[dix.order[s:e]] = np.asarray(vals)[dix.inverse[p]]
            if arr is None:
                arr = np.zeros(csr.num_edges, dtype=np.int64)
            csr.nbr_attr[name] = arr
            if name == "label":
                csr.nbr_labels = arr
        self._exchanged.add(name)

    def prepare_hub_mirror(self, budget_entries=2_000_000, min_deg=None):
        """In-process mirror build (mirrors BSPEngine.prepare_hub_mirror)."""
        self.exchange_attr("label")  # mirror carries neighbor labels
        if min_deg is None:
            total_e = sum(c.num_edges for c in self.csrs)
            avg = max(1, total_e // max(1, self.num_vertices))
            min_deg = max(64, 8 * avg)
        vids, degs, counts_l, idx_l, lab_l = [], [], [], [], []
        for csr in self.csrs:
            deg = csr.degrees()
            m = deg >= min_deg
            for v in csr.vids[m]:
                li = int(np.searchsorted(csr.vids, v))
                s, e = csr.indptr[li], csr.indptr[li + 1]
                vids.append(v)
                degs.append(e - s)
                counts_l.append(e - s)
                idx_l.append(csr.indices[s:e])
                lab_l.append(
                    csr.nbr_labels[s:e]
                    if csr.nbr_labels is not None
                    else np.zeros(e - s, dtype=np.int64)
                )
        if not vids:
            return 0
        order = np.argsort(-np.asarray(degs), kind="stable")
        keep = order[np.cumsum(np.asarray(degs)[order]) <= budget_entries]
        if len(keep) == 0:
            keep = order[:1]
        keep = keep[np.argsort(np.asarray(vids, dtype=np.uint64)[keep])]
        hv = np.asarray(vids, dtype=np.uint64)[keep]
        cnts = np.asarray(counts_l)[keep]
        mirror = (
            hv,
            np.concatenate([[0], np.cumsum(cnts)]).astype(np.int64),
            np.concatenate([idx_l[i] for i in keep]),
            np.concatenate([lab_l[i] for i in keep]),
        )
        for csr in self.csrs:
            csr.hub_mirror = mirror
        return len(hv)

    def run(self, program, params=None, max_steps=100, hub_mirror=None):
        params = dict(params or {})
        if "n_global" in params and params["n_global"] is None:
            params["n_global"] = self.num_vertices
        cls = PROGRAMS[program]
        for attr in cls.needs_nbr_attrs:
            self.exchange_attr(attr)
        if hub_mirror or (hub_mirror is None and cls.wants_hub_mirror):
            if "hubs" not in self._exchanged:
                self.prepare_hub_mirror()
                self._exchanged.add("hubs")
        self.programs = [cls() for _ in range(self.P)]
        for prog, csr in zip(self.programs, self.csrs):
            prog.init(csr, **params)
        inbox = [[] for _ in range(self.P)]
        glob = {}
        for step in range(max_steps):
            outs, stats = [], []
            for p, prog in enumerate(self.programs):
                sa = prog.apply(step, inbox[p], glob)
                ob, ss = prog.scatter(step)
                outs.append(ob)
                stats.append({**sa, **ss})
            inbox = [[outs[q][p] for q in range(self.P)] for p in range(self.P)]
            glob = _fold(stats)
            if glob.get("active", 0) == 0 and glob.get("sent", 0) == 0:
                break
        return glob

    def result(self):
        import pyarrow as pa

        return pa.concat_tables([p.result_table() for p in self.programs])

    def scalars(self):
        out = {}
        for p in self.programs:
            for k, v in p.scalar_result().items():
                out[k] = out.get(k, 0) + v
        return out
