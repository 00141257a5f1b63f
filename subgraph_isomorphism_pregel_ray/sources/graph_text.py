"""Reader for the reference's line-oriented graph text format.

Format (``/root/reference/README.md:14-21``, parser parity with ``toVertex``
``pregel_app_subgraph.h:689-714`` and ``SIQuery::addNode``
``SItypes/SIQuery.h:280-305``):

    <vID> <label> <nbr1ID> <nbr1Label> <nbr2ID> <nbr2Label> ...

whitespace-separated, ``#`` comment lines skipped, labels are the first byte
of the token cast to int (``pregel_app_subgraph.h:701``), undirected edges
appear in both endpoint lines. This makes the engine a drop-in consumer of
the reference's own graph files (e.g. ``graphs/toy.txt``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["parse_graph_text", "read_graph_text", "parse_query_text"]


def parse_graph_text(text: str):
    """→ (labels: dict vid→label, edges: list[(src, dst)]) — scalar oracle."""
    labels: dict[int, int] = {}
    edges: list[tuple[int, int]] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        toks = line.split()
        vid = int(toks[0])
        labels[vid] = ord(toks[1][0])  # first byte cast, like the reference
        for i in range(2, len(toks) - 1, 2):
            edges.append((vid, int(toks[i])))
    return labels, edges


def read_graph_text(path: str):
    """→ (labels_ds(vid:uint64, label:int64), edges_ds(src:uint64, dst:uint64)).

    ``ray.data.read_text`` (the S1 line-reader analogue) → vectorized parse.
    Vertex lines are self-contained, so the parse is embarrassingly parallel
    over line blocks — exactly the property the reference's per-rank line
    loader exploits (``basic/Worker.h:226-241``).
    """
    import ray.data as rd

    lines = rd.read_text(path)

    def _verts(batch: pa.Table) -> pa.Table:
        vids, labs = [], []
        for line in batch["text"].to_pylist():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            toks = line.split()
            vids.append(int(toks[0]))
            labs.append(ord(toks[1][0]))
        return pa.table(
            {
                "vid": np.array(vids, dtype=np.uint64),
                "label": np.array(labs, dtype=np.int64),
            }
        )

    def _edges(batch: pa.Table) -> pa.Table:
        srcs, dsts = [], []
        for line in batch["text"].to_pylist():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            toks = line.split()
            vid = int(toks[0])
            for i in range(2, len(toks) - 1, 2):
                srcs.append(vid)
                dsts.append(int(toks[i]))
        return pa.table(
            {
                "src": np.array(srcs, dtype=np.uint64),
                "dst": np.array(dsts, dtype=np.uint64),
            }
        )

    return (
        lines.map_batches(_verts, batch_format="pyarrow"),
        lines.map_batches(_edges, batch_format="pyarrow"),
    )


def parse_query_text(text: str):
    """Query file → (labels list indexed 0..k-1, edges) for build_plan.

    The reference's query ids are arbitrary ints (``SIQuery::addNode`` remaps
    them); here they are densified in first-appearance order.
    """
    labels_d, edges = parse_graph_text(text)
    ids = sorted(labels_d)
    remap = {v: i for i, v in enumerate(ids)}
    labels = [labels_d[v] for v in ids]
    qedges = sorted({(min(remap[a], remap[b]), max(remap[a], remap[b])) for a, b in edges})
    return labels, list(qedges)
