"""Global min cut: exact path vs brute-force subset enumeration, Karger
sampling concentration on a planted sparse cut."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.algorithms.mincut import (
    global_edge_connectivity,
    global_mincut_exact,
    global_mincut_karger,
)


def _ds(pairs, weights=None):
    cols = {
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    }
    if weights is not None:
        cols["weight"] = pa.array(weights, pa.float64())
    return ray.data.from_arrow(pa.table(cols))


def _brute_mincut(pairs, n, weights=None):
    w = weights or [1.0] * len(pairs)
    best = float("inf")
    for r in range(1, n // 2 + 1):
        for side in itertools.combinations(range(n), r):
            s = set(side)
            cut = sum(wi for (a, b), wi in zip(pairs, w)
                      if (a in s) != (b in s))
            best = min(best, cut)
    return best


def test_exact_cycle():
    # C6: edge connectivity 2
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    assert global_edge_connectivity(_ds(pairs), num_partitions=2) == 2


def test_exact_bridge():
    # two triangles joined by one bridge: mincut 1
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    assert global_edge_connectivity(_ds(pairs), num_partitions=2) == 1


def test_exact_disconnected():
    pairs = [(0, 1), (2, 3)]
    val, t = global_mincut_exact(_ds(pairs), num_partitions=2)
    assert val == 0.0 and t == -1


@pytest.mark.parametrize("seed", [5, 6])
def test_exact_random_matches_brute(seed):
    rng = np.random.default_rng(seed)
    n = 8
    pairs = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, n, (24, 2)) if a != b})
    pairs = [(min(a, b), max(a, b)) for a, b in pairs]
    pairs = sorted(set(pairs))
    w = [float(x) for x in rng.integers(1, 5, len(pairs))]
    val, _ = global_mincut_exact(_ds(pairs, w), weight_col="weight",
                                 num_partitions=2)
    assert val == pytest.approx(_brute_mincut(pairs, n, w), abs=1e-9)


def test_exact_guard():
    pairs = [(i, i + 1) for i in range(20)]
    with pytest.raises(NotImplementedError):
        global_mincut_exact(_ds(pairs), num_partitions=2,
                            exact_vertex_limit=10)


def test_karger_planted_cut():
    """Two K8 blobs joined by 2 edges: contraction concentrates on the
    planted cut (per-trial success probability is high when the cut is
    distinctly sparse); 8 deterministic trials find value 2."""
    pairs = []
    for base in (0, 8):
        for i in range(8):
            for j in range(i + 1, 8):
                pairs.append((base + i, base + j))
    pairs += [(0, 8), (7, 15)]
    out = global_mincut_karger(_ds(pairs), trials=8, num_partitions=4)
    assert out["value_e6"][0].as_py() == 2_000_000
    assert out["side_size"][0].as_py() == 8


def test_karger_is_upper_bound():
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    out = global_mincut_karger(_ds(pairs), trials=4, num_partitions=2)
    assert out["value_e6"][0].as_py() >= 2_000_000  # true cut is 2


def test_karger_plans_agree():
    """The guarded small-input Kruskal plan and the distributed keyed
    (trial-striped) plan are value-identical: same md5 trial weights,
    same (weight, lo, hi) total order, same unique forest per stripe."""
    import igraph_ray.algorithms.mincut as mc

    pairs = []
    for base in (0, 8):
        for i in range(8):
            for j in range(i + 1, 8):
                pairs.append((base + i, base + j))
    pairs += [(0, 8), (7, 15)]
    ds = _ds(pairs)
    fast = mc.global_mincut_karger(ds, trials=4, num_partitions=4)
    saved = mc._KARGER_SMALL_INPUT_ROWS
    try:
        mc._KARGER_SMALL_INPUT_ROWS = 0  # force the distributed plan
        dist = mc.global_mincut_karger(ds, trials=4, num_partitions=4)
    finally:
        mc._KARGER_SMALL_INPUT_ROWS = saved
    assert fast.equals(dist)
