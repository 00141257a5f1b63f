"""FIXTURES F5 for matching: kill after step K, resume, identical counts."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from subgraph_isomorphism_pregel_ray.pipelines.bsp import BSPEngine
from subgraph_isomorphism_pregel_ray.pipelines.build_graph import (
    edges_from_arrays,
    partition_graph,
)
from subgraph_isomorphism_pregel_ray.pipelines.match import build_plan


def test_match_checkpoint_resume_identical(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 400
    s = rng.integers(0, n, 2400)
    d = rng.integers(0, n, 2400)
    keep = s != d
    s, d = s[keep], d[keep]
    verts = np.unique(np.concatenate([s, d]))
    lab_ds = rd.from_arrow(
        pa.table(
            {"vid": verts.astype(np.uint64), "label": (verts % 3).astype(np.int64)}
        )
    )
    gdir, ck = str(tmp_path / "g"), str(tmp_path / "ck")
    partition_graph(edges_from_arrays(s, d), 4, gdir, labels_ds=lab_ds, directed=False)
    plan = build_plan([0, 2, 1, 2], [(0, 1), (1, 2), (2, 3), (3, 0)])

    eng = BSPEngine(gdir, 4)
    eng.run("match", {"plan": plan, "per_root": True}, max_steps=14)
    full = eng.scalar_results()["embeddings"]
    full_t = eng.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    eng.shutdown()

    engA = BSPEngine(gdir, 4)  # "killed" after step 2
    engA.run("match", {"plan": plan, "per_root": True}, max_steps=3,
             checkpoint_dir=ck, checkpoint_every=1)
    engA.shutdown()
    assert os.path.isdir(os.path.join(ck, "step=2"))

    engB = BSPEngine(gdir, 4)
    engB.run("match", {"plan": plan, "per_root": True}, max_steps=14,
             checkpoint_dir=ck, checkpoint_every=1, resume=True)
    assert engB.scalar_results()["embeddings"] == full
    res_t = engB.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    engB.shutdown()
    assert full_t.equals(res_t)


def test_semicluster_checkpoint_resume_identical(ray_session, tmp_path):
    """Kill the semi-clustering run mid-fixpoint, resume from the
    checkpointed cluster lists, end with byte-identical output."""
    rng = np.random.default_rng(31)
    pairs = sorted(
        {
            (min(int(a), int(b)), max(int(a), int(b)))
            for a, b in rng.integers(0, 40, (90, 2))
            if a != b
        }
    )
    s = np.array([a for a, b in pairs], dtype=np.int64)
    d = np.array([b for a, b in pairs], dtype=np.int64)
    gdir, ck = str(tmp_path / "g"), str(tmp_path / "ck")
    partition_graph(edges_from_arrays(s, d), 3, gdir, directed=False)
    params = {"iters": 5, "c_max": 2, "m_max": 4, "f_b": 0.1}

    eng = BSPEngine(gdir, 3)
    eng.run("semicluster", dict(params), max_steps=7)
    full = eng.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    eng.shutdown()

    engA = BSPEngine(gdir, 3)  # "killed" after step 2
    engA.run("semicluster", dict(params), max_steps=3,
             checkpoint_dir=ck, checkpoint_every=1)
    engA.shutdown()
    assert os.path.isdir(os.path.join(ck, "step=2"))

    engB = BSPEngine(gdir, 3)
    engB.run("semicluster", dict(params), max_steps=7,
             checkpoint_dir=ck, checkpoint_every=1, resume=True)
    res = engB.result_table().to_pandas().sort_values("vid").reset_index(drop=True)
    engB.shutdown()
    assert full.equals(res)
