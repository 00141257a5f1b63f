"""Per-partition CSR adjacency as numpy/Arrow tensors.

This is the Ray-side analogue of the reference's per-rank vertex partition
(``basic/Worker.h:584`` ``vector<VertexT*> vertexes`` with per-vertex
``SIValue.nbs_vector`` adjacency, ``SItypes/SIValue.h:31-42``): one
``CSRPartition`` per partition ``p`` holds all vertices ``v`` with
``part_for(v) == p`` and their out-adjacency, neighbor-sorted so membership
tests are binary searches (the analogue of ``SIValue.nbs_set``,
``SItypes/SIValue.h:38-41``, built in the reference's PREPROCESS superstep
``pregel_app_subgraph.h:55-63`` — here it's simply the lexsorted build).

``DstIndex`` is the precomputed scatter structure: edges grouped by
destination partition with per-destination-unique compression, so every
superstep's message construction is a handful of vectorized gathers +
``np.bincount``/``reduceat`` — this is the pre-shuffle combiner the reference
plumbed but disabled (``src/utils/vecs.h:101-125``), which at web scale is
what keeps the all-to-all exchange proportional to *distinct destination
vertices* rather than edges.

All arrays here are plain numpy (zero-copy in/out of the Ray object store).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..functions.hashing import part_for

__all__ = ["CSRPartition", "DstIndex", "build_csr", "flat_gather"]


def flat_gather(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Indices flattening ragged slices [starts[i], starts[i]+counts[i]) —
    the vectorized replacement for ``concatenate([arange(s, s+c) …])``."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    # offset of each output position within its slice
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.repeat(starts - cum, counts) + np.arange(total, dtype=np.int64)


@dataclass
class DstIndex:
    """Static per-partition scatter index over CSR edge list (see module doc)."""

    order: np.ndarray  # argsort of edges by (part(dst), dst)
    slices: list[tuple[int, int]]  # per dest part: [start, stop) into `order`
    uniq_dst: list[np.ndarray]  # per dest part: sorted unique dst vids
    inverse: list[np.ndarray]  # per dest part: edge→uniq_dst position
    src_row: np.ndarray  # per edge: owning local row (aligned with indices)


@dataclass
class CSRPartition:
    part: int
    num_parts: int
    vids: np.ndarray  # sorted uint64 — vertices owned by this partition
    indptr: np.ndarray  # int64, len(vids)+1
    indices: np.ndarray  # uint64 dst vids, sorted within each row
    labels: np.ndarray | None = None  # int64 per owned vertex
    # per-edge bit flags aligned with ``indices`` (e.g. direction bits for
    # programs over a symmetrized view of a DIRECTED graph: bit0 = the real
    # edge u→v exists, bit1 = the reverse v→u exists). None for plain graphs.
    eflags: np.ndarray | None = None  # uint8 per edge
    # per-edge stored weight aligned with ``indices`` (data-dependent edge
    # weights, e.g. co-purchase counts; vid-derived weights need no storage).
    eweights: np.ndarray | None = None  # int64 per edge
    nbr_labels: np.ndarray | None = None  # int64 per edge (filled by exchange)
    nbr_attr: dict = field(default_factory=dict)  # other per-edge remote attrs
    # hub mirror (skew handling): adjacency of globally-hot vertices
    # replicated to every partition — (sorted vids, indptr, indices, labels)
    hub_mirror: tuple | None = None
    _dst_index: DstIndex | None = None
    _adj_keys: np.ndarray | None = None  # packed (row, dense-dst) membership keys
    _all_uniq_dst: np.ndarray | None = None

    # ---- basic accessors -------------------------------------------------
    @property
    def num_vertices(self) -> int:
        return len(self.vids)

    @property
    def num_edges(self) -> int:
        return len(self.indices)

    def degrees(self) -> np.ndarray:
        return np.diff(self.indptr)

    def local_index(self, vids: np.ndarray) -> np.ndarray:
        """Global vid → local row (caller guarantees ownership)."""
        return np.searchsorted(self.vids, vids)

    def row_slice(self, li: int) -> np.ndarray:
        return self.indices[self.indptr[li] : self.indptr[li + 1]]

    # ---- scatter index ---------------------------------------------------
    def dst_index(self) -> DstIndex:
        if self._dst_index is None:
            P = self.num_parts
            dpart = part_for(self.indices, P)
            order = np.lexsort((self.indices, dpart))
            sorted_part = dpart[order]
            bounds = np.searchsorted(sorted_part, np.arange(P + 1))
            slices, uniq, inv = [], [], []
            sorted_dst = self.indices[order]
            for p in range(P):
                s, e = int(bounds[p]), int(bounds[p + 1])
                slices.append((s, e))
                u, iv = np.unique(sorted_dst[s:e], return_inverse=True)
                uniq.append(u)
                inv.append(iv)
            src_row = np.repeat(
                np.arange(self.num_vertices, dtype=np.int64), self.degrees()
            )
            self._dst_index = DstIndex(order, slices, uniq, inv, src_row)
        return self._dst_index

    # ---- O(log E) membership: is (owned u, v) an edge? -------------------
    def _membership_keys(self):
        """Pack (local row, dense dst id) into one sorted uint64 key array.

        dst hashes are 64-bit so they can't be packed directly; instead each
        distinct dst referenced by this partition gets a dense id (< 2^32),
        and key = row << 32 | dense. ``indices`` is lexsorted by (row, dst)
        so the key array is already sorted — built once, O(E log E).
        """
        if self._adj_keys is None:
            self._all_uniq_dst = np.unique(self.indices)
            dense = np.searchsorted(self._all_uniq_dst, self.indices).astype(np.uint64)
            row = self.dst_index().src_row.astype(np.uint64)
            self._adj_keys = (row << np.uint64(32)) | dense
        return self._adj_keys, self._all_uniq_dst

    def edge_positions(self, src_li: np.ndarray, dst: np.ndarray) -> np.ndarray:
        """Edge-array positions of pairs (owned local row, global dst) the
        CALLER GUARANTEES exist (e.g. a symmetric graph's reverse edges).
        The membership keys are sorted in edge-array order, so the
        searchsorted hit index IS the edge index — O(log E) vectorized."""
        keys, uniq = self._membership_keys()
        dense = np.searchsorted(uniq, dst).astype(np.uint64)
        qkey = (src_li.astype(np.uint64) << np.uint64(32)) | dense
        return np.searchsorted(keys, qkey)

    def has_edges(self, src_li: np.ndarray, dst: np.ndarray) -> np.ndarray:
        """Vectorized membership test for pairs (owned local row, global dst)."""
        keys, uniq = self._membership_keys()
        if len(uniq) == 0:
            return np.zeros(len(dst), dtype=bool)
        pos = np.searchsorted(uniq, dst)
        pos_c = np.minimum(pos, len(uniq) - 1)
        valid = uniq[pos_c] == dst
        qkey = (src_li.astype(np.uint64) << np.uint64(32)) | pos_c.astype(np.uint64)
        kpos = np.searchsorted(keys, qkey)
        kpos_c = np.minimum(kpos, len(keys) - 1)
        return valid & (keys[kpos_c] == qkey) if len(keys) else np.zeros(len(dst), bool)


def build_csr(
    part: int,
    num_parts: int,
    src: np.ndarray,
    dst: np.ndarray,
    owned_vids: np.ndarray,
    labels: np.ndarray | None = None,
    dedup: bool = True,
    eflags: np.ndarray | None = None,
    eweights: np.ndarray | None = None,
) -> CSRPartition:
    """Build one partition's CSR from its edge slice.

    ``owned_vids`` is the full (possibly unsorted / duplicated) set of vids
    this partition owns — including dst-only sinks, which never appear as a
    ``src`` here but must still exist as rows (PageRank dangling mass, message
    delivery targets). ``labels`` aligns with ``owned_vids`` when given.
    ``eflags`` aligns with (src, dst): per-edge bit flags; duplicate (src,
    dst) rows are OR-combined on dedup (so a directed graph symmetrized as
    (u,v,1)+(v,u,2) collapses a two-way edge into one row with flags 3).
    ``eweights`` aligns with (src, dst): stored int64 edge weights; duplicate
    rows keep the FIRST weight (duplicates of a weighted edge are assumed
    equal-weight, as a symmetrized weighted pair's two rows are).
    """
    src = np.asarray(src, dtype=np.uint64)
    dst = np.asarray(dst, dtype=np.uint64)
    owned, first = np.unique(np.asarray(owned_vids, dtype=np.uint64), return_index=True)
    lab = None
    if labels is not None:
        lab = np.asarray(labels)[first].astype(np.int64)

    order = np.lexsort((dst, src))
    src_s, dst_s = src[order], dst[order]
    ef_s = np.asarray(eflags, dtype=np.uint8)[order] if eflags is not None else None
    ew_s = np.asarray(eweights, dtype=np.int64)[order] if eweights is not None else None
    if dedup and len(src_s):
        keep = np.concatenate(
            [[True], (src_s[1:] != src_s[:-1]) | (dst_s[1:] != dst_s[:-1])]
        )
        if ef_s is not None:
            ef_s = np.bitwise_or.reduceat(ef_s, np.flatnonzero(keep))
        if ew_s is not None:
            ew_s = ew_s[keep]
        src_s, dst_s = src_s[keep], dst_s[keep]
    li = np.searchsorted(owned, src_s)
    counts = np.bincount(li, minlength=len(owned))
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return CSRPartition(
        part=part,
        num_parts=num_parts,
        vids=owned,
        indptr=indptr,
        indices=dst_s,
        labels=lab,
        eflags=ef_s,
        eweights=ew_s,
    )
