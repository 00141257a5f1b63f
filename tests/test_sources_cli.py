"""Reference text-format sources, TeraSort-with-ordinal, and the CLI."""

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

REF_TOY = "/root/reference/graphs/toy.txt"
REF_QUERY = "/root/reference/graphs/query.txt"


def test_parse_graph_text_matches_toy_fixture():
    from subgraph_isomorphism_pregel_ray.pipelines.match import toy_graph
    from subgraph_isomorphism_pregel_ray.sources.graph_text import parse_graph_text

    with open(REF_TOY) as f:
        labels, edges = parse_graph_text(f.read())
    fix_labels, fix_edges = toy_graph()
    # reference labels are char codes; fixture remaps a..d → 0..3
    remap = {ord(c): i for i, c in enumerate("abcd")}
    assert {v: remap[l] for v, l in labels.items()} == fix_labels
    assert sorted({(min(a, b), max(a, b)) for a, b in edges}) == fix_edges


def test_parse_query_text():
    from subgraph_isomorphism_pregel_ray.sources.graph_text import parse_query_text

    with open(REF_QUERY) as f:
        labels, edges = parse_query_text(f.read())
    assert labels == [ord("a"), ord("c"), ord("b"), ord("c")]
    assert edges == [(0, 1), (0, 3), (1, 2), (2, 3)]


def test_read_graph_text_and_match(ray_session):
    from subgraph_isomorphism_pregel_ray.pipelines.match import match_count
    from subgraph_isomorphism_pregel_ray.sources.graph_text import (
        parse_query_text,
        read_graph_text,
    )

    labels_ds, edges_ds = read_graph_text(REF_TOY)
    with open(REF_QUERY) as f:
        qlabels, qedges = parse_query_text(f.read())
    cnt, _ = match_count(edges_ds, qlabels, qedges, labels_ds=labels_ds, num_parts=2)
    assert cnt == 4  # the reference's golden output, from its own files


def test_sort_with_ordinal(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.stages.sort import sort_with_ordinal

    rng = np.random.default_rng(3)
    vals = rng.permutation(5000)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    out = sort_with_ordinal(ds, "v").to_pandas()
    assert np.array_equal(out.sort_values("ordinal")["v"].to_numpy(), np.arange(5000))

    # multi-key with per-key direction: ties on k broken by v ascending →
    # the ordinal is a deterministic total order
    ties = pa.table({"k": vals % 7, "v": vals})
    out2 = (
        sort_with_ordinal(
            rd.from_arrow(ties).repartition(8), ["k", "v"], descending=[True, False]
        )
        .to_pandas()
        .sort_values("ordinal")
    )
    exp = (
        ties.to_pandas()
        .sort_values(["k", "v"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert np.array_equal(out2["v"].to_numpy(), exp["v"].to_numpy())


def test_cli_match_golden():
    r = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "match",
         "-d", REF_TOY, "-q", REF_QUERY, "--parts", "2", "--cpus", "4"],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Mapping count: 4" in r.stdout  # README.md:83 golden line


def test_cli_match_batch_queries(tmp_path):
    """`match --queries <file>` runs N query graphs over ONE loaded graph
    + ONE actor fleet (the reference's dev/ batch driver,
    dev/basic/Worker.h:349-376) and each count equals the golden/individual
    single-query runs."""
    q_edge = tmp_path / "q_edge.txt"
    q_edge.write_text("1 a\t2 c\n2 c\t1 a\n")
    q_path = tmp_path / "q_path.txt"
    q_path.write_text("1 a\t2 c\n2 c\t1 a 3 b\n3 b\t2 c\n")
    listing = tmp_path / "queries.txt"
    listing.write_text(f"{REF_QUERY}\n{q_edge}\n{q_path}\n")
    r = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "match",
         "-d", REF_TOY, "--queries", str(listing), "--parts", "2",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    batch = json.loads(r.stdout.strip().splitlines()[-1])
    got = {e["query"]: e["mapping_count"] for e in batch["queries"]}
    # golden 4 for the reference query; 3 a–c edges and 7 a–c–b paths in
    # toy.txt (validated against individual `match -q` runs)
    assert got == {REF_QUERY: 4, str(q_edge): 3, str(q_path): 7}


def test_cli_match_report_mode():
    """--report prints the per-superstep lineage table (the reference's
    -report console mode) above the golden count."""
    r = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "match",
         "-d", REF_TOY, "-q", REF_QUERY, "--parts", "2", "--cpus", "4",
         "--report"],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Mapping count: 4" in r.stdout
    head = [ln for ln in r.stdout.splitlines() if ln.startswith("step")]
    assert head and "sent_bytes" in head[0]
    # one row per superstep, ending in the empty convergence step
    rows = [ln for ln in r.stdout.splitlines()
            if ln.strip()[:1].isdigit() and "  " in ln]
    assert len(rows) >= 3


def test_cli_match_requires_exactly_one_query_source():
    r = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "match",
         "-d", REF_TOY, "--parts", "2", "--cpus", "4"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode != 0
    assert "exactly one of" in r.stderr


def test_cli_pagerank_writes_parquet(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "pagerank",
         "-d", REF_TOY, "-out", str(tmp_path / "pr"), "--iters", "5",
         "--parts", "2", "--cpus", "4"],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import pyarrow.parquet as pq
    import glob as g

    files = g.glob(str(tmp_path / "pr" / "*.parquet"))
    assert files
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == 15


def test_cli_ppr_walk_assortativity(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "ppr",
         "-d", REF_TOY, "-out", str(tmp_path / "ppr"), "--iters", "5",
         "--seed-mod", "3", "--parts", "2", "--cpus", "4"],
        capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import glob as g

    import pyarrow.parquet as pq

    ranks = [
        pq.read_table(f) for f in g.glob(str(tmp_path / "ppr" / "*.parquet"))
    ]
    total = sum(float(t["rank"].to_numpy().sum()) for t in ranks)
    assert abs(total - 1.0) < 1e-9  # teleport mass conserved

    out = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "walk",
         "-d", REF_TOY, "-out", str(tmp_path / "wk"), "--walk-len", "3",
         "--parts", "2", "--cpus", "4"],
        capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    walks = sum(
        pq.read_table(f).num_rows for f in g.glob(str(tmp_path / "wk" / "*.parquet"))
    )
    assert walks == 15  # one walker per vertex, none lost

    out = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "assortativity",
         "-d", REF_TOY, "--parts", "2", "--cpus", "4"],
        capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import json as _json

    summary = _json.loads(out.stdout.strip().splitlines()[-1])
    assert -1.0 <= summary["assortativity"] <= 1.0


def test_jsonl_roundtrip(ray_session, tmp_path):
    """JSONL source parses shards and converts to prunable parquet."""
    import json

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.sources.tables import (
        read_jsonl,
        to_parquet_shards,
    )

    rows = [
        {"doc_id": i, "text": f"doc {i} body", "lang": ["en", "de"][i % 2]}
        for i in range(20)
    ]
    for shard in range(2):
        with open(tmp_path / f"part-{shard}.jsonl", "w") as f:
            for r in rows[shard * 10 : (shard + 1) * 10]:
                f.write(json.dumps(r) + "\n")

    ds = read_jsonl(str(tmp_path), columns=["doc_id", "text"])
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "text"]
    assert len(got) == 20 and got.loc[3, "text"] == "doc 3 body"

    out = tmp_path / "pq"
    to_parquet_shards(read_jsonl(str(tmp_path)), str(out), partition_col="lang")
    back = rd.read_parquet(str(out)).to_pandas()
    assert len(back) == 20 and set(back["lang"]) == {"en", "de"}


def test_cli_scc_directed_chain(ray_session, tmp_path):
    """CLI scc: a directed parquet edge list (2-cycle + tail) → per-vertex
    scc parquet with min-member labels."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.cli import main

    edges = pa.table(
        {"src": [1, 2, 2, 3], "dst": [2, 1, 3, 4]}  # {1,2} cycle, 3, 4
    )
    epath = tmp_path / "edges.parquet"
    pq.write_table(edges, str(epath))
    out = tmp_path / "out"
    rc = main(["scc", "-d", str(epath), "--parts", "2", "-out", str(out)])
    assert rc == 0
    res = pq.read_table(str(out / "scc.parquet")).to_pandas()
    got = dict(zip(res["vid"].astype(int), res["scc"].astype(int)))
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}


def test_cli_bm25_and_bpe(ray_session, tmp_path, capsys):
    """CLI text subcommands: bm25 prints ranked docs, bpe trains merges."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.cli import main

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["stream join hash", "stream stream stream", "nothing here"]
            ),
        }
    )
    dpath = tmp_path / "docs.parquet"
    pq.write_table(docs, str(dpath))

    rc = main(["bm25", "--docs", str(dpath), "--terms", "stream,hash", "-k", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["doc_id"] for r in out["results"]][0] == 0  # matches 2 terms

    outdir = tmp_path / "merges"
    rc = main(["bpe", "--docs", str(dpath), "--merges", "4", "-out", str(outdir)])
    assert rc == 0
    m = pq.read_table(str(outdir / "merges.parquet")).to_pandas()
    # top pair: (r,e) appears in 'stream' x4 and 'here' x1 -> count 5
    assert len(m) == 4
    assert (m["left"].iloc[0], m["right"].iloc[0], m["n"].iloc[0]) == ("r", "e", 5)


def test_cli_matching_and_semicluster(ray_session, tmp_path):
    """CLI matching: path a-b-c-d leaves exactly one vertex unmatched;
    CLI semicluster: a triangle clusters as itself."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from subgraph_isomorphism_pregel_ray.cli import main

    edges = pa.table({"src": [0, 1, 2, 1, 2, 3], "dst": [1, 2, 3, 0, 1, 2]})
    epath = tmp_path / "edges.parquet"
    pq.write_table(edges, str(epath))
    out = tmp_path / "m"
    assert main(["matching", "-d", str(epath), "--parts", "2", "-out", str(out)]) == 0
    import glob

    import pandas as pd

    res = pd.concat(
        pd.read_parquet(f) for f in glob.glob(str(out / "**/*.parquet"), recursive=True)
    )
    got = dict(zip(res.vid.astype(int), res.partner.astype(int)))
    assert sum(1 for v in got.values() if v == -1) in (0, 2)  # path of 4: ≥1 edge each side
    assert all(v == -1 or got[v] == k for k, v in got.items())

    tri = pa.table({"src": [0, 1, 2, 1, 2, 0], "dst": [1, 2, 0, 0, 1, 2]})
    tpath = tmp_path / "tri.parquet"
    pq.write_table(tri, str(tpath))
    out2 = tmp_path / "s"
    assert main(["semicluster", "-d", str(tpath), "--parts", "2", "-out", str(out2)]) == 0
    res2 = pd.concat(
        pd.read_parquet(f) for f in glob.glob(str(out2 / "**/*.parquet"), recursive=True)
    )
    assert set(res2.cluster) == {"0,1,2"}


def test_write_jsonl_roundtrip(ray_session, tmp_path):
    """write_jsonl -> read_jsonl round-trips rows and values; one shard
    file per block, atomic names, no dotfiles left behind."""
    import os

    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.sources.tables import read_jsonl
    from subgraph_isomorphism_pregel_ray.stages.sink import write_jsonl

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100), pa.int64()),
                "text": pa.array([f"doc {i} text" for i in range(100)]),
            }
        )
    ).repartition(4)
    out = str(tmp_path / "jsonl")
    n = write_jsonl(ds, out)
    assert n == 100
    files = sorted(os.listdir(out))
    assert all(f.endswith(".jsonl") and not f.startswith(".") for f in files)
    assert len(files) >= 2  # one per block
    back = read_jsonl(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(back) == 100
    assert back["text"].iloc[42] == "doc 42 text"


def test_cli_seeded_lpa_runs_and_dumps(tmp_path):
    """seeded-lpa subcommand: runs on the reference toy graph, dumps a
    parquet with clamped seed labels intact."""
    import glob

    import pyarrow.parquet as pq

    out = tmp_path / "sl"
    r = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "seeded-lpa",
         "-d", REF_TOY, "-out", str(out), "--parts", "2", "--cpus", "4",
         "--iters", "3", "--seed-mod", "5", "--label-mod", "2"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["status"] == "ok"
    files = glob.glob(str(out) + "/**/*.parquet", recursive=True)
    import pandas as pd

    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    seeds = df[df.vid % 5 == 0]
    assert len(seeds) and (seeds.label == seeds.vid % 2).all()


def test_csv_round_trip(ray_session, tmp_path):
    """write_csv shards one file per block; read_csv restores values and
    column pruning works (post-parse)."""
    import ray.data as rd

    from subgraph_isomorphism_pregel_ray.sources.tables import read_csv, write_csv

    t = pa.table(
        {
            "k": pa.array([3, 1, 2], pa.int64()),
            "v": pa.array([0.5, -1.25, 2.0]),
            "s": pa.array(["a", "b,c", "d"]),
        }
    )
    out = tmp_path / "csvdir"
    write_csv(rd.from_arrow(t).repartition(2), str(out))
    files = list(out.glob("*.csv"))
    assert len(files) >= 2  # sharded, never one giant file
    back = read_csv(str(out)).to_pandas().sort_values("k").reset_index(drop=True)
    assert back["k"].tolist() == [1, 2, 3]
    assert back["v"].tolist() == [-1.25, 2.0, 0.5]
    assert back["s"].tolist() == ["b,c", "d", "a"]  # quoting survives
    pruned = read_csv(str(out), columns=["k"]).to_pandas()
    assert list(pruned.columns) == ["k"]


def test_cli_query_list_and_run(tmp_path):
    """The `query` subcommand exposes the full registry: --list names every
    queries() entry, and a run over sf0.001 sinks partitioned parquet."""
    r = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "query",
         "--list"],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json as _json

    listing = _json.loads(r.stdout.strip().splitlines()[-1])
    assert listing["count"] >= 278
    assert "pagerank_copurchase" in listing["queries"]

    r = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "query",
         "graph_summary", "--sf-dir", "/root/testdata/sf0.001",
         "-out", str(tmp_path / "gs"), "--cpus", "4"],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import glob as g

    import pyarrow.parquet as pq

    files = g.glob(str(tmp_path / "gs" / "*.parquet"))
    assert files
    t = pq.read_table(files[0])
    assert t.num_rows == 1 and "n_vertices" in t.column_names

    r = subprocess.run(
        [sys.executable, "-m", "subgraph_isomorphism_pregel_ray", "query",
         "no_such_query"],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 2
