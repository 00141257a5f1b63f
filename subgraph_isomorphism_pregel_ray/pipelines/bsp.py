"""BSP superstep driver: the Ray-side ``Worker::run_type``.

Mirrors the reference's superstep engine (``basic/Worker.h:410-569``) with
Ray Data idioms per SURVEY.md §3.3 / §4.3:

* the driver loop IS the barrier (``ray.get`` of the round's stats refs ↔
  ``MPI_Barrier``, ``basic/Worker.h:524-526``);
* message exchange is store-to-store: every actor's ``superstep`` returns
  P outbox refs (``num_returns=P+1``); the driver only shuffles *refs*, never
  payloads (↔ ``all_to_all_cat``, ``utils/communication.h:159-211``);
* per-step stats are folded on the driver and re-broadcast as ``glob``
  (↔ aggregator gather/fold/bcast, ``basic/Worker.h:158-215``);
* convergence = global ``active == 0 and sent == 0`` — the generic test the
  reference commented out (``basic/Worker.h:440-460``) restored;
* every ``checkpoint_every`` steps each partition atomically writes its
  post-apply state to ``ckpt/step=<K>/part=<p>.parquet`` and the driver a
  ``manifest.json`` with lineage metrics; resume loads the last complete
  step and re-runs its scatter (deterministic kernels ⇒ identical results).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import ray

from ..state.actors import GraphPartition

__all__ = ["BSPEngine", "latest_checkpoint"]


def _fold(stats: list[dict]) -> dict:
    """Sum numeric stats across partitions; track straggler time.
    Keys starting with ``max_`` fold by max instead (the reference's
    aggregator protocol supports arbitrary folds, utils/Aggregator.h)."""
    out: dict = {}
    for s in stats:
        for k, v in s.items():
            if k == "part" or not isinstance(v, (int, float)):
                continue
            if k.startswith("max_"):
                out[k] = max(out.get(k, v), v)
                continue
            out[k] = out.get(k, 0) + v
            if k.startswith("t_"):
                out[k + "_max"] = max(out.get(k + "_max", 0.0), v)
    return out


def latest_checkpoint(ckpt_dir: str, num_parts: int):
    """Highest step with a manifest and all P part files, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        if not name.startswith("step="):
            continue
        step = int(name.split("=")[1])
        d = os.path.join(ckpt_dir, name)
        if not os.path.exists(os.path.join(d, "manifest.json")):
            continue
        if all(os.path.exists(os.path.join(d, f"part={p}.parquet")) for p in range(num_parts)):
            best = step if best is None else max(best, step)
    return best


class BSPEngine:
    """P pinned partition actors + the superstep loop over them."""

    def __init__(self, graph_dir: str, num_parts: int):
        self.graph_dir = graph_dir
        self.P = num_parts
        self.actors = [
            GraphPartition.remote(p, num_parts, graph_dir) for p in range(num_parts)
        ]
        self.part_stats = ray.get([a.stats.remote() for a in self.actors])
        self.num_vertices = sum(s["vertices"] for s in self.part_stats)
        self.num_edges = sum(s["edges"] for s in self.part_stats)
        self._exchanged: set[str] = set()

    # ---- PREPROCESS: fetch remote per-edge attributes ---------------------
    def exchange_attr(self, name: str):
        """One all-to-all round so every partition learns `name` (label /
        degree) for each neighbor its edges reference — the analogue of the
        reference's PREPROCESS superstep (``pregel_app_subgraph.h:55-63``)."""
        if name in self._exchanged:
            return
        P = self.P
        if P == 1:
            # num_returns=1 would hand back the whole 1-tuple as one object
            # and mis-shape the rewrapping below — serve locally instead.
            ray.get(self.actors[0].attr_self_exchange.remote(name))
            self._exchanged.add(name)
            return
        reqs = [
            a.attr_requests.options(num_returns=P).remote() for a in self.actors
        ]
        served = [
            self.actors[p]
            .attr_serve.options(num_returns=P)
            .remote(name, [reqs[q][p] for q in range(P)])
            for p in range(P)
        ]
        ray.get(
            [
                self.actors[q].attr_store.remote(name, [served[p][q] for p in range(P)])
                for q in range(P)
            ]
        )
        self._exchanged.add(name)

    # ---- hub mirroring (skew handling) ------------------------------------
    def prepare_hub_mirror(self, budget_entries: int | None = None, min_deg: int | None = None):
        """Replicate the adjacency of the globally hottest vertices to every
        partition, so hub-anchored work can be spread by row hash instead of
        landing on the hub's owner — the web-hub skew mitigation SURVEY §4.2
        calls for (the reference has none; its per-superstep barrier makes
        the hottest rank the step time, ``basic/Worker.h:561``).

        Mirror size is budgeted (Σ mirrored degrees ≤ budget_entries), top
        hubs first, so replication cost is bounded: budget × 16 B × P.

        Default budget = min(whole graph, 64M entries ≈ 1 GB/node): the
        broadcast-small-side rule applied to adjacency. When the graph fits
        the cap, FULL replication makes every expansion local and row-hash
        spread perfectly balanced (measured on the sf0.1 co-purchase graph:
        5-cycle match 14.8 s → 4.7 s, straggler t_apply_max 8.2 s → 1.6 s);
        above the cap, top hubs first — the skew tail is exactly where the
        budget buys the most.
        """
        if budget_entries is None:
            budget_entries = max(2_000_000, min(self.num_edges, 64_000_000))
        import numpy as np

        self.exchange_attr("label")  # mirror carries neighbor labels
        if min_deg is None:
            avg = max(1, self.num_edges // max(1, self.num_vertices))
            min_deg = max(64, 8 * avg)
        cands = ray.get([a.hub_degrees.remote(min_deg) for a in self.actors])
        vids = np.concatenate([c[0] for c in cands]) if cands else np.empty(0, np.uint64)
        if len(vids) == 0:
            return 0
        degs = np.concatenate([c[1] for c in cands])
        order = np.argsort(-degs, kind="stable")
        keep = order[np.cumsum(degs[order]) <= budget_entries]
        if len(keep) == 0:
            keep = order[:1]
        hub_vids = vids[keep]
        from ..functions.hashing import part_for

        owner = part_for(hub_vids, self.P)
        per_part_vids = [hub_vids[owner == p] for p in range(self.P)]
        adj = ray.get(
            [
                self.actors[p].hub_adjacency.remote(per_part_vids[p])
                for p in range(self.P)
            ]
        )
        all_vids = np.concatenate(per_part_vids)
        counts = np.concatenate([a[0] for a in adj])
        indices = np.concatenate([a[1] for a in adj])
        labels = np.concatenate([a[2] for a in adj])
        o = np.argsort(all_vids, kind="stable")
        sorted_vids = all_vids[o]
        # reorder the ragged adjacency to match sorted vid order
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        from ..state.csr import flat_gather

        gidx = flat_gather(starts[o], counts[o])
        mirror = (
            sorted_vids,
            np.concatenate([[0], np.cumsum(counts[o])]).astype(np.int64),
            indices[gidx],
            labels[gidx],
        )
        ref = ray.put(mirror)
        ray.get([a.store_hub_mirror.remote(ref) for a in self.actors])
        return len(sorted_vids)

    def prepare(self, program: str):
        """Run `program`'s one-time graph preparation (neighbor-attribute
        exchange, hub mirror) WITHOUT running supersteps — the analogue of
        the reference's offline PREPROCESS phase (its timing report counts
        preprocessing separately from match time, ``dev/tmp.out:8-10``).
        ``run`` performs this lazily anyway; call this first to keep
        per-query timings free of one-time costs."""
        from ..state.programs import PROGRAMS

        for attr in PROGRAMS[program].needs_nbr_attrs:
            self.exchange_attr(attr)
        if PROGRAMS[program].wants_hub_mirror and "hubs" not in self._exchanged:
            self.prepare_hub_mirror()
            self._exchanged.add("hubs")

    # ---- the superstep loop ------------------------------------------------
    def run(
        self,
        program: str,
        params: dict | None = None,
        max_steps: int = 100,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 0,
        resume: bool = False,
        exchange: str = "packed",
    ) -> dict:
        """Run `program` to convergence (or max_steps). Returns lineage dict."""
        from ..state.programs import PROGRAMS

        params = dict(params or {})
        if "n_global" in params and params["n_global"] is None:
            params["n_global"] = self.num_vertices
        self.prepare(program)

        ray.get([a.init_program.remote(program, params) for a in self.actors])

        start_step, glob = 0, {}
        skip_apply = False
        if resume and checkpoint_dir:
            last = latest_checkpoint(checkpoint_dir, self.P)
            if last is not None:
                d = os.path.join(checkpoint_dir, f"step={last}")
                with open(os.path.join(d, "manifest.json")) as f:
                    manifest = json.load(f)
                ray.get(
                    [
                        a.load_checkpoint.remote(
                            os.path.join(d, f"part={p}.parquet"), last
                        )
                        for p, a in enumerate(self.actors)
                    ]
                )
                start_step, glob = last, manifest.get("glob", {})
                skip_apply = True

        P = self.P
        lineage: list[dict] = []
        inbox: list[list] = [[] for _ in range(P)]
        step = start_step
        for step in range(start_step, max_steps):
            ck_paths = [None] * P
            ck_dir = None
            if (
                checkpoint_dir
                and checkpoint_every
                and step > 0
                and step % checkpoint_every == 0
                and not skip_apply
            ):
                ck_dir = os.path.join(checkpoint_dir, f"step={step}")
                os.makedirs(ck_dir, exist_ok=True)
                ck_paths = [os.path.join(ck_dir, f"part={p}.parquet") for p in range(P)]

            t0 = time.perf_counter()
            packed = exchange == "packed"
            nret = 2 if packed else P + 1
            rets = [
                self.actors[p]
                .superstep.options(num_returns=nret)
                .remote(step, inbox[p], glob, ck_paths[p], skip_apply, packed)
                for p in range(P)
            ]
            stats = ray.get([r[nret - 1] for r in rets])  # ← the BSP barrier
            wall = time.perf_counter() - t0
            skip_apply = False
            if packed:
                # every receiver gets the same ref per sender; slices inside
                inbox = [[rets[q][0] for q in range(P)] for p in range(P)]
            else:
                inbox = [[rets[q][p] for q in range(P)] for p in range(P)]
            glob = _fold(stats)
            row = {
                "step": step,
                "active": int(glob.get("active", 0)),
                "sent": int(glob.get("sent", 0)),
                "sent_bytes": int(glob.get("sent_bytes", 0)),
                "wall_sec": wall,
                "t_fetch_max": glob.get("t_fetch_max", 0.0),
                "t_apply_max": glob.get("t_apply_max", 0.0),
                "t_scatter_max": glob.get("t_scatter_max", 0.0),
            }
            lineage.append(row)
            if ck_dir:
                with open(os.path.join(ck_dir, "manifest.json.tmp"), "w") as f:
                    json.dump(
                        {
                            "step": step,
                            "num_parts": P,
                            "program": program,
                            "glob": {k: v for k, v in glob.items()},
                            "lineage": lineage,
                        },
                        f,
                    )
                os.replace(
                    os.path.join(ck_dir, "manifest.json.tmp"),
                    os.path.join(ck_dir, "manifest.json"),
                )
            if row["active"] == 0 and row["sent"] == 0:
                break
        return {"steps": step + 1, "lineage": lineage}

    # ---- results -----------------------------------------------------------
    def result_dataset(self):
        """Per-vertex results as a Ray Dataset (streams; no driver concat)."""
        import ray.data as rd

        return rd.from_arrow_refs([a.result_table.remote() for a in self.actors])

    def dump(self, path: str):
        """Write per-vertex results as partitioned parquet — the working form
        of the reference's disabled dump stage (``Worker::dump_partition``,
        ``basic/Worker.h:289-300``): one part file per partition, streamed
        from the actors, never concatenated on the driver."""
        self.result_dataset().write_parquet(path)
        return path

    def result_table(self) -> pa.Table:
        return pa.concat_tables(ray.get([a.result_table.remote() for a in self.actors]))

    def scalar_results(self) -> dict:
        parts = ray.get([a.scalar_result.remote() for a in self.actors])
        out: dict = {}
        for d in parts:
            for k, v in d.items():
                out[k] = out.get(k, 0) + v
        return out

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
