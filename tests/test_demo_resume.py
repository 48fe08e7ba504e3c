"""North-star demo command (python -m igraph_ray demo): kill/resume
reproduces a fresh run bit-for-bit.

Runs the full corpus -> curate -> extract -> PR+CC+LPA+triangles chain
in a subprocess (the demo owns its Ray session, so it must not share
the test session): once to completion (reference run), once SIGKILLed
mid-graph-loop, then re-invoked — the resumed run must skip completed
stages, resume the interrupted loop from its last committed superstep,
and produce IDENTICAL pagerank/components/lpa outputs."""
import json
import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pyarrow.parquet as pq
import pytest


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARGS = ["--repos", "1200", "--edges", "9000", "--pr-iterations", "6",
        "--partitions", "4"]


def _run(workdir, timeout=600):
    return subprocess.run(
        [sys.executable, "-m", "igraph_ray", "demo",
         "--workdir", workdir] + ARGS,
        cwd=REPO, capture_output=True, text=True, timeout=timeout)


def _read_sorted(path, key):
    files = [os.path.join(path, f) for f in os.listdir(path)
             if f.endswith(".parquet")]
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    return df.sort_values(key).reset_index(drop=True)


def test_demo_kill_resume_bit_for_bit(tmp_path):
    fresh = str(tmp_path / "fresh")
    killed = str(tmp_path / "killed")

    r = _run(fresh)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["extract"]["sha256_mismatches"] == 0

    # second run: SIGKILL while the graph loops are in flight — wait
    # for the extract marker, then give the pagerank loop a beat to
    # commit at least one superstep checkpoint before the kill
    proc = subprocess.Popen(
        [sys.executable, "-m", "igraph_ray", "demo",
         "--workdir", killed] + ARGS,
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(os.path.join(killed, "extract.done.json")):
            break
        if proc.poll() is not None:
            pytest.fail("demo exited before it could be killed")
        time.sleep(0.5)
    else:
        proc.kill()
        pytest.fail("extract stage never finished")
    time.sleep(3.0)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
        killed_midway = not os.path.exists(
            os.path.join(killed, "triangles.done.json"))
    else:
        killed_midway = False  # machine too fast: run completed anyway

    r2 = _run(killed)
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    # completed pre-kill stages must be skipped, not recomputed
    assert s2["corpus"].get("resumed_skip")
    assert s2["curate"].get("resumed_skip")
    assert s2["extract"].get("resumed_skip")
    if killed_midway and not s2["pagerank"].get("resumed_skip"):
        # the interrupted loop picked up from a committed superstep
        assert s2["pagerank"]["resumed_from"] >= 0

    # bit-for-bit: every loop output identical to the fresh run
    for stage, key in (("pagerank", "vertex"), ("components", "vertex"),
                       ("lpa", "vertex"), ("triangles", "vertex")):
        a = _read_sorted(os.path.join(fresh, stage), key)
        b = _read_sorted(os.path.join(killed, stage), key)
        pd.testing.assert_frame_equal(a, b, check_exact=True)
