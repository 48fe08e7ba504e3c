"""Hierarchical random graphs (igraph_hrg_* family, igraph_hrg.cc
semantics, deterministic greedy-MLE variant): dendrogram validity,
likelihood cross-checks, missing-link prediction on planted structure,
hrg_game exactness vs a local replay, determinism, degenerate inputs."""

from __future__ import annotations

import hashlib

import numpy as np

from igraph_ray import Graph
from igraph_ray.algorithms.hrg import (
    HEX15, hrg_fit, hrg_game, hrg_loglik)
from tests.fixtures import karate


def _mk(src, dst, n):
    return Graph.from_numpy(np.asarray(src, np.int64),
                            np.asarray(dst, np.int64), n=n)


def _two_cliques(k=4, bridge=False):
    src, dst = [], []
    for base in (0, k):
        for i in range(k):
            for j in range(i + 1, k):
                src.append(base + i)
                dst.append(base + j)
    if bridge:
        src.append(0)
        dst.append(k)
    return src, dst, 2 * k


def test_dendrogram_shape_and_loglik_consistency():
    n, s, d = karate()
    res = hrg_fit(_mk(s, d, n))
    t = res.dendrogram
    assert t.num_rows == n - 1
    nodes = t["node"].to_pylist()
    assert nodes == list(range(n, 2 * n - 1))
    # every node except the root is someone's child, exactly once
    children = t["left"].to_pylist() + t["right"].to_pylist()
    assert sorted(children) == list(range(2 * n - 2))
    # pairs = product of subtree sizes: reconstruct sizes bottom-up
    size = {v: 1 for v in range(n)}
    for row in t.to_pylist():
        assert row["pairs"] == size[row["left"]] * size[row["right"]]
        assert 0 <= row["edges"] <= row["pairs"]
        size[row["node"]] = size[row["left"]] + size[row["right"]]
    assert size[2 * n - 2] == n
    assert res.loglik < 0.0
    assert abs(res.loglik - hrg_loglik(t)) < 1e-9


def test_perfect_hierarchy_max_likelihood():
    """Two disconnected cliques: every merge is p=1 (inside) or p=0
    (across), so the greedy dendrogram attains the global maximum
    log-likelihood 0."""
    s, d, n = _two_cliques(4, bridge=False)
    res = hrg_fit(_mk(s, d, n))
    assert abs(res.loglik) < 1e-12
    # root must split the two cliques: its edges count is 0
    root = res.dendrogram.to_pylist()[-1]
    assert root["node"] == 2 * n - 2 and root["edges"] == 0


def test_predict_recovers_removed_clique_edge():
    s, d, n = _two_cliques(5, bridge=True)
    # remove one intra-clique edge (1, 3); prediction must rank it first
    keep = [(a, b) != (1, 3) for a, b in zip(s, d)]
    s2 = [a for a, k in zip(s, keep) if k]
    d2 = [b for b, k in zip(d, keep) if k]
    res = hrg_fit(_mk(s2, d2, n), predict_k=3)
    preds = res.predictions.to_pylist()
    assert preds, "no predictions returned"
    assert (preds[0]["src"], preds[0]["dst"]) == (1, 3)
    assert preds[0]["prob_e9"] > 500_000_000


def test_fit_deterministic_across_partitioning():
    n, s, d = karate()
    g1 = _mk(s, d, n)
    a = hrg_fit(g1).dendrogram
    import ray.data
    import pyarrow as pa
    g2 = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array(np.asarray(s, np.int64)),
        "dst": pa.array(np.asarray(d, np.int64))}))
        .repartition(7), n=n)
    b = hrg_fit(g2).dendrogram
    assert a.equals(b)


def test_empty_graph():
    res = hrg_fit(_mk([], [], n=4))
    t = res.dendrogram
    assert t.num_rows == 3  # chain of zero-edge merges
    assert res.loglik == 0.0
    assert all(r == 0 for r in t["edges"].to_pylist())


def _game_replay(depth, p_e6, seed):
    n = 1 << depth
    thr = [int(p) * HEX15 // 1_000_000 for p in p_e6]
    out = set()
    for i in range(n):
        for j in range(i + 1, n):
            lvl = (i ^ j).bit_length() - 1
            h = int(hashlib.md5(f"{seed}:h:{i}:{j}".encode())
                    .hexdigest()[:15], 16)
            if h < thr[lvl]:
                out.add((i, j))
    return out


def test_hrg_game_exact_replay_and_determinism():
    depth, p_e6, seed = 5, [900_000, 400_000, 150_000, 50_000, 10_000], 7
    got = {(r["src"], r["dst"])
           for r in hrg_game(depth, p_e6, seed, num_partitions=4).take_all()}
    assert got == _game_replay(depth, p_e6, seed)
    again = {(r["src"], r["dst"])
             for r in hrg_game(depth, p_e6, seed, num_partitions=2).take_all()}
    assert again == got


def test_hrg_game_probability_one_level():
    """p=1 at level 0, 0 elsewhere: exactly the sibling pairs."""
    got = {(r["src"], r["dst"])
           for r in hrg_game(3, [1_000_000, 0, 0], 1, num_partitions=2)
           .take_all()}
    assert got == {(2 * b, 2 * b + 1) for b in range(4)}


def test_hrg_game_density_tracks_levels():
    """Expected density per LCA level ~ the level probability."""
    depth, p_e6 = 7, [800_000, 400_000, 200_000, 100_000, 50_000,
                      25_000, 12_500]
    n = 1 << depth
    got = hrg_game(depth, p_e6, 3, num_partitions=4).take_all()
    cnt = np.zeros(depth, np.int64)
    for r in got:
        cnt[(r["src"] ^ r["dst"]).bit_length() - 1] += 1
    pairs = np.array([n * (1 << lv) // 2 for lv in range(depth)], np.float64)
    rates = cnt / pairs
    for lv in range(depth):
        p = p_e6[lv] / 1e6
        sd = (p * (1 - p) / pairs[lv]) ** 0.5
        assert abs(rates[lv] - p) < 5 * sd + 1e-9, (lv, rates[lv], p)
