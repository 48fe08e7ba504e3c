"""CLI smoke: the config → read → one transform → write lifecycle
(SURVEY.md §3.3). Runs in a subprocess with its own Ray session."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_components_roundtrip(tmp_path):
    edges = tmp_path / "edges.parquet"
    out = tmp_path / "out"
    rng = np.random.default_rng(11)
    src = rng.integers(0, 60, 200)
    dst = rng.integers(0, 60, 200)
    pq.write_table(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}),
        edges,
    )
    p = subprocess.run(
        [sys.executable, "-m", "igraph_ray", "components",
         "--edges", str(edges), "--out", str(out), "--n", "60"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    summary = json.loads([l for l in p.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["converged"]
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    total = sum(pq.read_table(os.path.join(out, f)).num_rows for f in files)
    assert total == 60
