"""Command-line entry point — the analogue of the reference's ``run.cpp`` +
``MatchingCommand`` CLI (``utils/global.h:249-327``: ``-d`` data graph,
``-q`` query graph, ``-out`` output, ``-order``, ``-preprocess`` …).

    python -m subgraph_isomorphism_pregel_ray match -d graphs/toy.txt -q graphs/query.txt
    python -m subgraph_isomorphism_pregel_ray pagerank -d edges.parquet -out /tmp/pr --iters 20
    python -m subgraph_isomorphism_pregel_ray cc|sssp|mis|lpa|triangles|kcore|ppr|walk|hits|assortativity|betweenness|closeness -d <edges> [-out DIR]
    python -m subgraph_isomorphism_pregel_ray extract --pages <pages parquet> -out <edges dir>
    python -m subgraph_isomorphism_pregel_ray bm25 --docs docs.parquet --terms hash,join [-k 10]
    python -m subgraph_isomorphism_pregel_ray bpe --docs docs.parquet --merges 32 [-out DIR]

``-d`` accepts the reference's text graph format (*.txt) or a parquet edge
table (src, dst[, label via --labels]). Results are written as partitioned
parquet when ``-out`` is given (the working version of the reference's
disabled dump stage, ``pregel_app_subgraph.h:907``), else summarized to
stdout. Owns its Ray session (guarded for embedding in a live session).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False


def _load_graph(path: str, labels_path: str | None):
    """-d argument → (edges_ds, labels_ds | None)."""
    import ray.data as rd

    if path.endswith(".txt"):
        from .sources.graph_text import read_graph_text

        labels_ds, edges_ds = read_graph_text(path)
        return edges_ds, labels_ds
    edges_ds = rd.read_parquet(path, columns=["src", "dst"])
    labels_ds = rd.read_parquet(labels_path, columns=["vid", "label"]) if labels_path else None
    return edges_ds, labels_ds


def _print_report(lineage: dict) -> None:
    """Per-superstep console table — the working form of the reference's
    ``-report`` mode (``src/basic/Worker.h:479-488``: per-superstep message
    and vertex-activity counters printed to the console); columns come from
    the engine's lineage rows (A3 message counters + A4 timing matrix)."""
    print("step  active        sent  sent_bytes   wall_s  t_fetch  t_apply  t_scatter")
    for r in lineage.get("lineage", []):
        print(
            f"{r['step']:>4}  {r['active']:>6}  {r['sent']:>10}  "
            f"{r['sent_bytes']:>10}  {r['wall_sec']:>7.3f}  "
            f"{r['t_fetch_max']:>7.3f}  {r['t_apply_max']:>7.3f}  "
            f"{r['t_scatter_max']:>9.3f}"
        )


def _run_query(args) -> int:
    """``query`` subcommand: the full registry surface from the CLI — list,
    run over any sf-dir, sink to parquet, print the ``ds.stats()``
    execution breakdown (the STATS.md tuning loop, on demand)."""
    import importlib
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    entry = importlib.import_module("__ray_entry__")
    qs = entry.queries()
    if args.list or not args.name:
        oracled = set(entry.oracle_sql())
        print(
            json.dumps(
                {
                    "count": len(qs),
                    "queries": sorted(qs),
                    "rows_only": sorted(set(qs) - oracled),
                }
            )
        )
        return 0
    if args.name not in qs:
        print(json.dumps({"error": f"unknown query: {args.name}"}), file=sys.stderr)
        return 2
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    res = qs[args.name](args.sf_dir)
    is_ds = isinstance(res, rd.Dataset)
    if args.out:
        if is_ds:
            res.write_parquet(args.out)
            rows = None
        else:
            import pyarrow.parquet as pq

            t = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(t, os.path.join(args.out, "part-0.parquet"))
            rows = t.num_rows
        if args.stats and is_ds:
            print(res.stats(), file=sys.stderr)
        print(
            json.dumps(
                {"status": "ok", "query": args.name, "out": args.out, "rows": rows}
            )
        )
        return 0
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    if args.stats and is_ds:
        print(res.stats(), file=sys.stderr)
    print(
        json.dumps(
            {
                "query": args.name,
                "rows": len(df),
                "head": df.head(args.head).to_dict("records"),
            },
            default=str,
        )
    )
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="subgraph_isomorphism_pregel_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("-d", "--data", required=True, help="graph: .txt (reference format) or parquet edges")
        p.add_argument("--labels", help="parquet (vid,label) when -d is parquet")
        p.add_argument("-out", "--out", help="output directory (partitioned parquet)")
        p.add_argument("--parts", type=int, default=8, help="partition count P")
        p.add_argument("--cpus", type=int, default=None)
        p.add_argument("--checkpoint-dir", help="per-superstep checkpoint dir")
        p.add_argument("--checkpoint-every", type=int, default=0)
        p.add_argument("--resume", action="store_true")
        p.add_argument("--report", action="store_true",
                       help="print the per-superstep lineage table (the "
                       "reference's -report console mode, basic/Worker.h:479-488)")

    for name in ("pagerank", "cc", "sssp", "mis", "lpa", "triangles", "kcore",
                 "ppr", "walk", "hits", "assortativity", "hyperball", "betweenness",
                 "closeness", "wsssp", "coloring", "katz", "scc", "matching",
                 "semicluster", "seeded-lpa", "densest"):
        p = sub.add_parser(name)
        common(p)
        if name in ("pagerank", "lpa", "ppr", "hits", "katz", "seeded-lpa"):
            p.add_argument(
                "--iters", type=int,
                default={"lpa": 10, "hits": 8, "katz": 8,
                         "seeded-lpa": 5}.get(name, 20),
            )
        if name == "katz":
            p.add_argument("--alpha", type=float, default=0.001)
        if name == "seeded-lpa":
            p.add_argument("--seed-mod", type=int, default=10,
                           help="clamped seeds are vid %% seed-mod == 0")
            p.add_argument("--label-mod", type=int, default=3,
                           help="seed label = vid %% label-mod")
        if name in ("pagerank", "ppr"):
            p.add_argument("--damping", type=float, default=0.85)
        if name == "ppr":
            p.add_argument("--seed-mod", type=int, default=10,
                           help="teleport seeds are vid %% seed-mod == 0")
        if name == "sssp":
            p.add_argument("--seed-mod", type=int, default=101,
                           help="BFS sources are vid %% seed-mod == 0")
        if name == "wsssp":
            p.add_argument("--seed-mod", type=int, default=101)
            p.add_argument("--wbase", type=int, default=10,
                           help="edge weight = wbase + (u+v) %% wmod")
            p.add_argument("--wmod", type=int, default=5)
        if name in ("betweenness", "closeness"):
            p.add_argument("--seed-mod", type=int, default=101,
                           help="centrality pivots are vid %% seed-mod == 0")
        if name == "walk":
            p.add_argument("--walk-len", type=int, default=4)
        if name == "hyperball":
            p.add_argument("--radius", type=int, default=3)
            p.add_argument("--hll-p", type=int, default=8,
                           help="register index bits (m = 2^p per vertex)")
        if name == "semicluster":
            p.add_argument("--iters", type=int, default=4)
            p.add_argument("--c-max", type=int, default=2)
            p.add_argument("--m-max", type=int, default=4)
            p.add_argument("--f-b", type=float, default=0.1)

    p = sub.add_parser("match")
    common(p)
    p.add_argument("-q", "--query", help="query graph (.txt, reference format)")
    p.add_argument("--queries", help="file listing one query-graph path per "
                   "line: run them all over ONE loaded graph + actor fleet "
                   "(the reference's dev/ batch driver, dev/basic/Worker.h:349-376)")
    p.add_argument("-order", "--order", default="degree",
                   choices=["degree", "anti-degree", "random", "candidate"],
                   help="root/DFS ordering strategy (reference -order)")
    p.add_argument("--seed", type=int, default=13,
                   help="seed for -order random (deterministic)")
    p.add_argument("--enumerate", action="store_true", dest="enumerate_",
                   help="dump the embeddings themselves (requires -out): "
                        "partitioned parquet with columns v0..v{k-1}")
    p.add_argument("--shared-fold", action="store_true", dest="shared_fold",
                   help="let the branch factor fold engage across SHARED-"
                        "label branches (relaxed fold + conflict-term "
                        "subtraction, the reference's SIBranch conflict "
                        "resolution); best for bushy queries with large "
                        "branch multiplicities")

    p = sub.add_parser("extract")
    p.add_argument("--pages", required=True, help="pages parquet (url, html, …)")
    p.add_argument("-out", "--out", required=True)
    p.add_argument("--cpus", type=int, default=None)

    p = sub.add_parser("bm25", help="Okapi BM25 ranked retrieval over a documents parquet")
    p.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    p.add_argument("--terms", required=True, help="comma-separated query terms")
    p.add_argument("-k", "--topk", type=int, default=10)
    p.add_argument("-out", "--out", help="output directory (partitioned parquet)")
    p.add_argument("--cpus", type=int, default=None)

    p = sub.add_parser("bpe", help="train BPE merges over a documents parquet")
    p.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    p.add_argument("--merges", type=int, default=32)
    p.add_argument("--min-count", type=int, default=1)
    p.add_argument("-out", "--out", help="write the merge table as parquet")
    p.add_argument("--cpus", type=int, default=None)

    p = sub.add_parser(
        "query",
        help="run any registry pipeline by name over an sf-dir of parquet "
        "tables (the full __ray_entry__.queries() surface, CLI-accessible)",
    )
    p.add_argument("name", nargs="?", help="query name (omit with --list)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="directory with the parquet tables")
    p.add_argument("--list", action="store_true",
                   help="list available query names and exit")
    p.add_argument("-out", "--out", help="write result as partitioned parquet")
    p.add_argument("--stats", action="store_true",
                   help="print ds.stats() execution breakdown to stderr")
    p.add_argument("--head", type=int, default=10,
                   help="rows to print when no -out is given")
    p.add_argument("--cpus", type=int, default=None)

    args = ap.parse_args(argv)
    _ensure_ray(getattr(args, "cpus", None))

    if args.cmd == "query":
        return _run_query(args)

    if args.cmd == "extract":
        import ray.data as rd

        from .stages.extract import edge_stage

        edge_stage(rd.read_parquet(args.pages, columns=["url", "html"])).write_parquet(args.out)
        print(json.dumps({"status": "ok", "out": args.out}))
        return 0

    if args.cmd == "bm25":
        import ray.data as rd

        from .pipelines.textops import bm25_topk

        docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
        terms = [t for t in args.terms.split(",") if t]
        out = bm25_topk(docs, terms, k=args.topk)
        if args.out:
            out.write_parquet(args.out)
            print(json.dumps({"status": "ok", "out": args.out, "k": args.topk}))
        else:
            rows = out.to_pandas().to_dict("records")
            print(json.dumps({"results": rows}))
        return 0

    if args.cmd == "bpe":
        import ray.data as rd

        from .pipelines.bpe import bpe_train

        docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
        merges = bpe_train(docs, n_merges=args.merges, min_count=args.min_count)
        if args.out:
            import os

            import pyarrow as _pa
            import pyarrow.parquet as _pq

            os.makedirs(args.out, exist_ok=True)
            _pq.write_table(
                _pa.Table.from_pandas(merges, preserve_index=False),
                os.path.join(args.out, "merges.parquet"),
            )
            print(json.dumps({"status": "ok", "out": args.out, "n_merges": len(merges)}))
        else:
            print(json.dumps({"merges": merges.to_dict("records")[:10],
                              "n_merges": len(merges)}))
        return 0

    edges_ds, labels_ds = _load_graph(args.data, args.labels)
    ck = dict(
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
    )

    if args.cmd == "scc":
        # the -d edges are taken as DIRECTED; scc() flag-symmetrizes them
        from .pipelines.algorithms import scc

        out, lineage = scc(edges_ds, num_parts=args.parts, **ck)
        if args.report:
            _print_report(lineage)
        import numpy as _np

        n_scc = len(_np.unique(out["scc"].to_numpy()))
        summary = {"supersteps": lineage["steps"], "vertices": out.num_rows,
                   "sccs": n_scc}
        if args.out:
            import pyarrow.parquet as _pq

            import os as _os

            _os.makedirs(args.out, exist_ok=True)
            _pq.write_table(out, _os.path.join(args.out, "scc.parquet"))
            summary.update(status="ok", out=args.out)
        print(json.dumps(summary))
        return 0

    if args.cmd == "match":
        from .pipelines.match import build_plan, match_count
        from .sources.graph_text import parse_query_text

        if bool(args.query) == bool(args.queries):
            raise SystemExit("match needs exactly one of -q / --queries")
        if args.queries:
            # batch mode (round 4): ONE graph load + ONE actor fleet + ONE
            # superstep loop shared across every query — all queries'
            # frontier traffic rides the same exchange/barrier
            # (MultiMatchProgram, the reference's dev/ multi-query driver)
            from .pipelines.algorithms import build_engine
            from .pipelines.match import match_count_multi

            with open(args.queries) as f:
                qpaths = [ln.strip() for ln in f if ln.strip()
                          and not ln.lstrip().startswith("#")]
            qs = []
            for qp in qpaths:
                with open(qp) as f:
                    qs.append(parse_query_text(f.read()))
            eng = build_engine(
                edges_ds, args.parts, labels_ds=labels_ds, directed=False
            )
            counts, lineage = match_count_multi(
                eng, qs, order=args.order, seed=args.seed,
            )
            if args.report:
                _print_report(lineage)
            results = []
            for qp, count in zip(qpaths, counts):
                results.append(
                    {"query": qp, "mapping_count": int(count),
                     "supersteps": lineage["steps"]}
                )
                print(f"Mapping count: {count}")
            eng.shutdown()
            print(json.dumps({"queries": results}))
            return 0

        with open(args.query) as f:
            qlabels, qedges = parse_query_text(f.read())
        if args.enumerate_:
            from .pipelines.match import match_embeddings

            if not args.out:
                raise SystemExit("--enumerate requires -out")
            match_embeddings(
                edges_ds, qlabels, qedges, labels_ds=labels_ds,
                num_parts=args.parts, order=args.order, out_path=args.out,
            )
            print(json.dumps({"status": "ok", "out": args.out}))
            return 0
        count, lineage = match_count(
            edges_ds, qlabels, qedges, labels_ds=labels_ds, num_parts=args.parts,
            order=args.order, seed=args.seed, shared_fold=args.shared_fold,
        )
        if args.report:
            _print_report(lineage)
        # the reference's shipped deliverable (pregel_app_subgraph.h:914-919)
        print(f"Mapping count: {count}")
        print(json.dumps({"mapping_count": int(count), "supersteps": lineage["steps"]}))
        return 0

    from .pipelines.algorithms import build_engine

    # thunks: each subcommand only defines its own flags, so entries must
    # not touch another command's argparse attributes
    iters = getattr(args, "iters", 0)
    walk_len = getattr(args, "walk_len", 0)
    program, params, max_steps, directed = {
        "pagerank": lambda: (
            "pagerank",
            {"iters": iters, "damping": args.damping, "n_global": None, "tol": 0.0},
            iters + 1,
            True,
        ),
        "cc": lambda: ("cc", {}, 300, False),
        "sssp": lambda: ("sssp", {"seed_mod": args.seed_mod}, 300, False),
        "mis": lambda: ("mis", {}, 300, False),
        "lpa": lambda: ("lpa", {"iters": iters}, iters + 2, False),
        "kcore": lambda: ("kcore", {}, 300, False),
        "densest": lambda: ("densest", {}, 200, False),
        "triangles": lambda: ("triangles", {}, 4, False),
        "ppr": lambda: (
            "ppr",
            {"iters": iters, "damping": args.damping, "seed_mod": args.seed_mod},
            iters + 3,
            False,
        ),
        "walk": lambda: ("walk", {"walk_len": walk_len}, walk_len + 2, False),
        "hits": lambda: ("hits", {"iters": iters}, iters + 3, False),
        "katz": lambda: (
            "katz", {"iters": iters, "alpha": args.alpha}, iters + 2, False,
        ),
        "assortativity": lambda: ("assortativity", {}, 3, False),
        "hyperball": lambda: (
            "hyperball",
            {"radius": getattr(args, "radius", 3), "p": getattr(args, "hll_p", 8)},
            getattr(args, "radius", 3) + 3,
            False,
        ),
        "betweenness": lambda: (
            "betweenness", {"seed_mod": args.seed_mod}, 300, False,
        ),
        "closeness": lambda: (
            "closeness", {"seed_mod": args.seed_mod}, 300, False,
        ),
        "wsssp": lambda: (
            "wsssp",
            {"seed_mod": args.seed_mod, "wbase": args.wbase, "wmod": args.wmod},
            500, False,
        ),
        "coloring": lambda: ("coloring", {}, 1000, False),
        "seeded-lpa": lambda: (
            "seeded_lpa",
            {"iters": iters, "seed_mod": args.seed_mod,
             "label_mod": args.label_mod},
            iters + 2,
            False,
        ),
        "matching": lambda: ("matching", {}, 1000, False),
        "semicluster": lambda: (
            "semicluster",
            {"iters": iters, "c_max": args.c_max, "m_max": args.m_max,
             "f_b": args.f_b},
            iters + 2,
            False,
        ),
    }[args.cmd]()

    eng = build_engine(edges_ds, args.parts, labels_ds=labels_ds, directed=directed)
    lineage = eng.run(program, params, max_steps=max_steps, **ck)
    if args.report:
        _print_report(lineage)
    summary = {"supersteps": lineage["steps"], "vertices": eng.num_vertices,
               "edges": eng.num_edges}
    if args.cmd == "triangles":
        summary["triangles"] = int(eng.scalar_results().get("triangles", 0))
    if args.cmd == "assortativity":
        from .pipelines.algorithms import assortativity_from_sums

        summary["assortativity"] = round(
            assortativity_from_sums(eng.scalar_results()), 6
        )
    if args.out:
        # streamed dump: actor tables → partitioned parquet, no driver concat
        eng.dump(args.out)
        summary.update(status="ok", out=args.out)
    eng.shutdown()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
