"""Graph build: edge Dataset → hash-partitioned on-disk layout → CSR actors.

The Ray-side analogue of the reference's load + shuffle-on-load
(``basic/Worker.h:304-344`` load_data, ``basic/Worker.h:77-103`` sync_graph):
one Dataset pass adds ``part = vid % P`` and writes a hive-partitioned
parquet layout

    graph_dir/edges/part=<p>/*.parquet   (src:uint64, dst:uint64)
    graph_dir/verts/part=<p>/*.parquet   (vid:uint64[, label:int64])
    graph_dir/manifest.json              (P, row counts)

that each ``GraphPartition`` actor then reads independently — so graph
construction is resumable (the layout is the checkpoint) and actor creation
is embarrassingly parallel. The same ``part`` function is reused for message
exchange and algorithm checkpoints (SURVEY.md §7.3: ONE partitioning key).

Scale note: at 100 TB you would ``repartition`` the edge Dataset to ~P×k
blocks before the partitioned write so each write task covers few partitions;
the hive layout itself (many part files per partition) is already what a
256-node cluster wants — each actor reads only its own directory.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ..functions.hashing import part_for

__all__ = [
    "add_part_column",
    "symmetrize",
    "partition_graph",
    "update_graph",
    "edges_from_arrays",
    "edge_cut_parts",
]


def add_part_column(col: str, num_parts: int):
    def _add(batch: pa.Table) -> pa.Table:
        part = part_for(batch[col].to_numpy(zero_copy_only=False), num_parts)
        return batch.append_column("part", pa.array(part))

    return _add


def symmetrize(edges_ds, drop_self_loops: bool = True):
    """Undirected view: emit both directions, drop self-loops."""

    def _sym(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy().astype(np.uint64)
        dst = batch["dst"].to_numpy().astype(np.uint64)
        if drop_self_loops:
            keep = src != dst
            src, dst = src[keep], dst[keep]
        return pa.table(
            {
                "src": np.concatenate([src, dst]),
                "dst": np.concatenate([dst, src]),
            }
        )

    return edges_ds.map_batches(_sym, batch_format="pyarrow")


def _vert_stubs(num_parts: int):
    """edges batch → unique vids (from both endpoints) with part column.
    Pre-uniqued per batch so the verts layout is ~|V| not 2|E| rows."""

    def _stub(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy().astype(np.uint64)
        dst = batch["dst"].to_numpy().astype(np.uint64)
        vids = np.unique(np.concatenate([src, dst]))
        return pa.table({"vid": vids, "part": part_for(vids, num_parts)})

    return _stub


def partition_graph(
    edges_ds,
    num_parts: int,
    graph_dir: str,
    labels_ds=None,
    directed: bool = True,
) -> str:
    """Write the partitioned graph layout (see module doc). Returns graph_dir.

    ``edges_ds``: Dataset(src:uint64, dst:uint64). If ``directed=False`` the
    edge set is symmetrized first. ``labels_ds``: optional Dataset(vid, label)
    covering every vertex — becomes the verts layout; otherwise verts are
    derived from edge endpoints.
    """
    if os.path.exists(os.path.join(graph_dir, "manifest.json")):
        return graph_dir  # already built — resumable
    if not directed:
        edges_ds = symmetrize(edges_ds)
    edges_ds = edges_ds.map_batches(add_part_column("src", num_parts), batch_format="pyarrow")
    edges_path = os.path.join(graph_dir, "edges")
    edges_ds.write_parquet(edges_path, partition_cols=["part"])

    if labels_ds is not None:
        verts = labels_ds.map_batches(add_part_column("vid", num_parts), batch_format="pyarrow")
    else:
        # derive verts from the WRITTEN edges, not the input Dataset — a lazy
        # input would otherwise re-execute its whole upstream pipeline here.
        import ray.data as rd

        verts = rd.read_parquet(edges_path, columns=["src", "dst"]).map_batches(
            _vert_stubs(num_parts), batch_format="pyarrow"
        )
    verts.write_parquet(os.path.join(graph_dir, "verts"), partition_cols=["part"])

    with open(os.path.join(graph_dir, "manifest.json"), "w") as f:
        json.dump({"num_parts": num_parts, "directed": directed}, f)
    return graph_dir


def update_graph(delta_edges_ds, graph_dir: str, labels_ds=None) -> str:
    """Incrementally fold a DELTA edge batch into an EXISTING partitioned
    layout — the daily-crawl append path: no full rebuild, no read of the
    resident data. New hive-partitioned files land NEXT TO the existing
    ones under ``edges/part=p/`` and ``verts/part=p/`` (Ray's parquet
    writer never truncates a directory), and the next ``BSPEngine`` build
    reads the union; duplicate (src, dst) rows — overlap between delta and
    resident edges, or a re-applied delta — collapse at CSR build
    (``build_csr`` dedups with flag OR-combine), so updates are IDEMPOTENT.
    At 100 TB this is the difference between touching |delta| bytes and
    re-shuffling the whole graph. Respects the manifest's num_parts /
    directed settings; bumps an ``updates`` counter in the manifest
    (atomic rewrite) for observability."""
    man_path = os.path.join(graph_dir, "manifest.json")
    with open(man_path) as f:
        manifest = json.load(f)
    num_parts = int(manifest["num_parts"])
    if not manifest.get("directed", True):
        delta_edges_ds = symmetrize(delta_edges_ds)
    # materialize the delta once (it is |delta|-bounded) so the edge write
    # and the vert-stub derivation don't re-execute its upstream twice
    delta_edges_ds = delta_edges_ds.map_batches(
        add_part_column("src", num_parts), batch_format="pyarrow"
    ).materialize()
    edges_path = os.path.join(graph_dir, "edges")
    delta_edges_ds.write_parquet(edges_path, partition_cols=["part"])

    if labels_ds is not None:
        verts = labels_ds.map_batches(
            add_part_column("vid", num_parts), batch_format="pyarrow"
        )
    else:
        # stubs from the DELTA only — resident verts are already on disk
        verts = delta_edges_ds.map_batches(
            _vert_stubs(num_parts), batch_format="pyarrow"
        )
    verts.write_parquet(os.path.join(graph_dir, "verts"), partition_cols=["part"])

    manifest["updates"] = int(manifest.get("updates", 0)) + 1
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, man_path)
    return graph_dir


def edges_from_arrays(src, dst):
    """Tiny-graph helper (tests): numpy arrays → edge Dataset."""
    import ray.data as rd

    t = pa.table(
        {
            "src": np.asarray(src, dtype=np.uint64),
            "dst": np.asarray(dst, dtype=np.uint64),
        }
    )
    return rd.from_arrow(t)


def edge_cut_parts(edges_ds, parts=(4, 8, 16, 32), round_to: int = 6):
    """Partition-quality AUDIT of the layout's own hash partitioner
    (``part_for`` = ``vid % P``, the function :func:`partition_graph`
    stores the graph with) → one row per candidate partition count P:
    ``(num_parts, n_edges, n_cut, cut_fraction, max_part_edges,
    min_part_edges, imbalance)``. An edge is OWNED by its src's part (the
    layout rule) and CUT when its dst lives elsewhere — cut edges are
    exactly the messages that cross partitions every BSP superstep, and
    ``imbalance`` (= max part load ÷ mean part load) is the straggler
    factor of the slowest actor. This is the panel a 256-node deployment
    reads before picking P: cut_fraction prices the exchange, imbalance
    prices the barrier. (Reference analogue: the hash partitioner of
    ``utils/communication.h`` wID assignment, audited rather than assumed.)

    Scale shape: ONE pass over the edge Dataset; each batch folds to at
    most Σ|parts| partial rows (np.unique over observed part ids), then
    ONE groupby over the ≤Σ|parts| keyspace; the driver folds a ≤60-row
    table. Parts with zero edges are simply absent (min is over OBSERVED
    parts), which the SQL replay mirrors. A symmetrized input counts each
    undirected pair once per direction — consistent in numerator and
    denominator, so cut_fraction is unaffected."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    plist = [int(p) for p in parts]

    def _partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy().astype(np.uint64)
        dst = t["dst"].to_numpy().astype(np.uint64)
        ps, pp, nn, cc = [], [], [], []
        for p in plist:
            sp = (src % np.uint64(p)).astype(np.int64)
            cut = (sp != (dst % np.uint64(p)).astype(np.int64)).astype(np.int64)
            u, inv = np.unique(sp, return_inverse=True)
            n = np.bincount(inv, minlength=len(u)).astype(np.int64)
            c = np.zeros(len(u), np.int64)
            np.add.at(c, inv, cut)
            ps.append(np.full(len(u), p, np.int64))
            pp.append(u)
            nn.append(n)
            cc.append(c)
        return pa.table(
            {
                "p": np.concatenate(ps) if ps else np.empty(0, np.int64),
                "part": np.concatenate(pp) if pp else np.empty(0, np.int64),
                "n": np.concatenate(nn) if nn else np.empty(0, np.int64),
                "cut": np.concatenate(cc) if cc else np.empty(0, np.int64),
            }
        )

    loads = (
        edges_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["p", "part"])
        .aggregate(Sum("n", alias_name="n"), Sum("cut", alias_name="cut"))
        .to_pandas()
    )
    rows = {k: [] for k in (
        "num_parts", "n_edges", "n_cut", "cut_fraction",
        "max_part_edges", "min_part_edges", "imbalance",
    )}
    for p in plist:
        g = loads[loads["p"] == p]
        if not len(g):
            continue
        n = g["n"].to_numpy(np.int64)
        tot, cut = int(n.sum()), int(g["cut"].to_numpy(np.int64).sum())
        rows["num_parts"].append(p)
        rows["n_edges"].append(tot)
        rows["n_cut"].append(cut)
        rows["cut_fraction"].append(
            float(round_half_away(np.float64(cut) / np.float64(tot), round_to))
        )
        rows["max_part_edges"].append(int(n.max()))
        rows["min_part_edges"].append(int(n.min()))
        rows["imbalance"].append(
            float(round_half_away(np.float64(n.max() * p) / np.float64(tot), round_to))
        )
    return pa.table(
        {
            "num_parts": pa.array(rows["num_parts"], pa.int64()),
            "n_edges": pa.array(rows["n_edges"], pa.int64()),
            "n_cut": pa.array(rows["n_cut"], pa.int64()),
            "cut_fraction": pa.array(rows["cut_fraction"], pa.float64()),
            "max_part_edges": pa.array(rows["max_part_edges"], pa.int64()),
            "min_part_edges": pa.array(rows["min_part_edges"], pa.int64()),
            "imbalance": pa.array(rows["imbalance"], pa.float64()),
        }
    )
