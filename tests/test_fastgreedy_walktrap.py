"""CNM fastgreedy + walktrap (fast_community.c / walktrap.cpp
semantics): planted-partition recovery, modularity-sequence
cross-validation against the distributed modularity(), determinism,
disconnected inputs."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.algorithms.fastgreedy import community_fastgreedy
from igraph_ray.algorithms.modularity import modularity
from igraph_ray.algorithms.walktrap import community_walktrap
from igraph_ray.graph import Graph


def _two_triangles():
    src = np.array([0, 1, 2, 3, 4, 5, 2], np.int64)
    dst = np.array([1, 2, 0, 4, 5, 3, 3], np.int64)
    return Graph(ray.data.from_arrow(pa.table({"src": src, "dst": dst})), n=6)


def _planted(seed=0, blocks=4, bs=16, cross=10):
    rng = np.random.default_rng(seed)
    n = blocks * bs
    es = set()
    for b in range(blocks):
        vs = np.arange(b * bs, (b + 1) * bs)
        for i in vs:
            for j in rng.choice(vs, 6, replace=False):
                if i != j:
                    es.add((min(i, j), max(i, j)))
    for _ in range(cross):
        a, b = rng.integers(0, n, 2)
        if a // bs != b // bs:
            es.add((min(a, b), max(a, b)))
    src = np.array([e[0] for e in es], np.int64)
    dst = np.array([e[1] for e in es], np.int64)
    g = Graph(ray.data.from_arrow(pa.table({"src": src, "dst": dst})), n=n)
    return g, n, blocks, bs


def _is_planted(comm, blocks, bs):
    return (all(len(set(comm[b * bs:(b + 1) * bs])) == 1
                for b in range(blocks))
            and len(set(comm)) == blocks)


def test_fastgreedy_two_triangles(ray_session):
    steps, mem = community_fastgreedy(_two_triangles())
    comm = np.array(mem["community"].to_pylist())
    assert len(set(comm[:3])) == 1 and len(set(comm[3:])) == 1
    assert comm[0] != comm[3]
    # last merge unifies everything -> Q == 0
    assert steps["q_e9"].to_pylist()[-1] == 0


def test_fastgreedy_q_sequence_matches_modularity(ray_session):
    g = _two_triangles()
    steps, _ = community_fastgreedy(g)
    parent = np.arange(6)

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for k in range(len(steps)):
        parent[find(steps["c2"][k].as_py())] = find(steps["c1"][k].as_py())
        lab = np.array([find(v) for v in range(6)])
        ms = ray.data.from_arrow(pa.table({
            "vertex": pa.array(np.arange(6, dtype=np.int64)),
            "community": pa.array(lab.astype(np.int64))}))
        q = modularity(g.edges, ms)
        assert abs(q - steps["q_e9"][k].as_py() / 1e9) < 2e-9


def test_fastgreedy_planted(ray_session):
    g, n, blocks, bs = _planted()
    _, mem = community_fastgreedy(g)
    comm = np.array(mem["community"].to_pylist())
    assert _is_planted(comm, blocks, bs)


def test_fastgreedy_weighted(ray_session):
    # path 0-1-2 with heavy (0,1): CNM must merge (0,1) first
    src = np.array([0, 1], np.int64)
    dst = np.array([1, 2], np.int64)
    w = np.array([10.0, 1.0])
    g = Graph(ray.data.from_arrow(pa.table({"src": src, "dst": dst,
                                            "weight": w})),
              n=3, weighted=True)
    steps, _ = community_fastgreedy(g)
    assert (steps["c1"][0].as_py(), steps["c2"][0].as_py()) == (0, 1)


def test_fastgreedy_deterministic(ray_session):
    g, *_ = _planted(seed=3)
    s1, m1 = community_fastgreedy(g)
    s2, m2 = community_fastgreedy(g)
    assert s1.equals(s2) and m1.equals(m2)


def test_walktrap_two_triangles(ray_session):
    merges, mem = community_walktrap(_two_triangles())
    comm = np.array(mem["community"].to_pylist())
    assert len(set(comm[:3])) == 1 and len(set(comm[3:])) == 1
    assert comm[0] != comm[3]


def test_walktrap_planted(ray_session):
    g, n, blocks, bs = _planted(seed=1)
    _, mem = community_walktrap(g)
    comm = np.array(mem["community"].to_pylist())
    assert _is_planted(comm, blocks, bs)


def test_walktrap_q_matches_modularity_at_best_cut(ray_session):
    g, n, *_ = _planted(seed=2)
    merges, mem = community_walktrap(g)
    qs = merges["q_e9"].to_pylist()
    best_q = max(qs) / 1e9
    q = modularity(g.edges, ray.data.from_arrow(mem))
    assert abs(q - best_q) < 2e-9


def test_walktrap_disconnected(ray_session):
    # two disjoint triangles: merges stop at 4 (no adjacent pair left)
    src = np.array([0, 1, 2, 3, 4, 5], np.int64)
    dst = np.array([1, 2, 0, 4, 5, 3], np.int64)
    g = Graph(ray.data.from_arrow(pa.table({"src": src, "dst": dst})), n=6)
    merges, mem = community_walktrap(g)
    assert len(merges) == 4
    comm = np.array(mem["community"].to_pylist())
    assert len(set(comm[:3])) == 1 and len(set(comm[3:])) == 1


def test_walktrap_deterministic(ray_session):
    g, *_ = _planted(seed=4)
    m1, mem1 = community_walktrap(g)
    m2, mem2 = community_walktrap(g)
    assert m1.equals(m2) and mem1.equals(mem2)
