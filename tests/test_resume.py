"""Checkpoint / lineage / resume contract (BASELINE.md north rule):
kill-after-k resume must reproduce a fresh run bit-for-bit, digests gate
checkpoint reuse, and a converged run resumes with zero new work."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from igraph_ray import Graph, connected_components, pagerank
from igraph_ray.superstep import CheckpointConfig
from tests import fixtures as fx


@pytest.fixture()
def ckdir(tmp_path):
    return str(tmp_path / "ck")


def _vec(res):
    return {r["vertex"]: r["pr"] for r in res.state.take_all()}


def test_kill_and_resume_bit_identical(ckdir):
    n, src, dst = fx.er_digraph(n=300, m=1800, seed=4)
    g = Graph.from_numpy(src, dst, n=n)
    # "killed" run: only 3 iterations checkpointed
    pagerank(g, checkpoint=CheckpointConfig(path=ckdir, every=1, input_digest="D"),
             fixed_iterations=3)
    # resume and continue to 10
    r2 = pagerank(g, checkpoint=CheckpointConfig(path=ckdir, every=1, input_digest="D"),
                  fixed_iterations=10)
    resumed_iters = len([m for m in r2.metrics if m.get("iteration", -1) >= 0])
    assert resumed_iters == 7  # iterations 3..9 only
    fresh = pagerank(g, fixed_iterations=10)
    a, b = _vec(r2), _vec(fresh)
    assert max(abs(a[v] - b[v]) for v in a) == 0.0


def test_digest_mismatch_ignores_checkpoint(ckdir):
    n, src, dst = fx.er_digraph(n=100, m=500, seed=6)
    g = Graph.from_numpy(src, dst, n=n)
    pagerank(g, checkpoint=CheckpointConfig(path=ckdir, every=1, input_digest="A"),
             fixed_iterations=4)
    r = pagerank(g, checkpoint=CheckpointConfig(path=ckdir, every=1, input_digest="B"),
                 fixed_iterations=2)
    assert len([m for m in r.metrics if m.get("iteration", -1) >= 0]) == 2


def test_converged_resume_is_noop(ckdir):
    n, src, dst = fx.er_digraph(n=100, m=600, seed=8)
    g = Graph.from_numpy(src, dst, n=n)
    r1 = pagerank(g, checkpoint=CheckpointConfig(path=ckdir, every=1, input_digest="X"),
                  tol=1e-10)
    assert r1.converged
    r2 = pagerank(g, checkpoint=CheckpointConfig(path=ckdir, every=1, input_digest="X"),
                  tol=1e-10)
    assert r2.converged
    assert len([m for m in r2.metrics if m.get("iteration", -1) >= 0]) == 0
    a, b = _vec(r1), _vec(r2)
    assert max(abs(a[v] - b[v]) for v in a) == 0.0


def test_lineage_columns_and_manifest(ckdir):
    n, src, dst = fx.er_digraph(n=80, m=400, seed=12)
    g = Graph.from_numpy(src, dst, n=n)
    pagerank(g, checkpoint=CheckpointConfig(path=ckdir, every=1, input_digest="LIN"),
             fixed_iterations=2)
    iters = sorted(d for d in os.listdir(ckdir) if d.startswith("iter="))
    assert iters == ["iter=00000", "iter=00001"]
    files = [f for f in os.listdir(os.path.join(ckdir, iters[-1])) if f.endswith(".parquet")]
    t = pq.read_table(os.path.join(ckdir, iters[-1], files[0]))
    assert {"partition", "iteration", "input_digest", "vertex", "pr"} <= set(t.column_names)
    assert t["input_digest"][0].as_py() == "LIN"
    with open(os.path.join(ckdir, iters[-1], "_MANIFEST.json")) as f:
        m = json.load(f)
    assert m["iteration"] == 1 and m["input_digest"] == "LIN"
    # metrics sidecar exists
    assert os.path.exists(os.path.join(ckdir, "metrics.jsonl"))


def test_components_checkpoint_resume(ckdir):
    n, src, dst = fx.forest(seed=3)
    g = Graph.from_numpy(src, dst, n=n)
    r1 = connected_components(
        g, checkpoint=CheckpointConfig(path=ckdir, every=1, input_digest="CC")
    )
    g2 = Graph.from_numpy(src, dst, n=n)
    r2 = connected_components(
        g2, checkpoint=CheckpointConfig(path=ckdir, every=1, input_digest="CC")
    )
    a = {r["vertex"]: r["label"] for r in r1.state.take_all()}
    b = {r["vertex"]: r["label"] for r in r2.state.take_all()}
    assert a == b
