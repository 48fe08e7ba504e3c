"""Closeness / harmonic / eccentricity / diameter vs a sequential BFS
oracle (igraph_closeness / igraph_harmonic_centrality /
igraph_eccentricity / igraph_diameter semantics — see
algorithms/paths.py docstrings)."""

import collections

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.algorithms.paths import (
    closeness_centrality,
    diameter_radius,
    distance_profile,
    eccentricity,
    harmonic_centrality,
)
from igraph_ray.graph import Graph


@pytest.fixture(scope="module")
def fixture_graph():
    rng = np.random.default_rng(3)
    n, m = 50, 160
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = Graph(
        ray.data.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                      "dst": pa.array(dst, pa.int64())})),
        n=n,
    )
    return g, src, dst, n


def _bfs_all(src, dst, n, sym=False):
    adj = collections.defaultdict(set)
    for s, d in zip(src, dst):
        adj[s].add(d)
        if sym:
            adj[d].add(s)
    out = {}
    for s in range(n):
        dist = {s: 0}
        q = [s]
        while q:
            nq = []
            for u in q:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nq.append(v)
            q = nq
        out[s] = {v: d for v, d in dist.items() if v != s}
    return out


def test_closeness_and_harmonic(fixture_graph):
    g, src, dst, n = fixture_graph
    ref = _bfs_all(src, dst, n)
    clo = {int(r["vertex"]): r["closeness"]
           for r in closeness_centrality(g, chunk=16).take_all()}
    har = {int(r["vertex"]): r["harmonic"]
           for r in harmonic_centrality(g, chunk=16).take_all()}
    want_clo = {s: len(d) / sum(d.values()) for s, d in ref.items() if d}
    want_har = {s: sum(1.0 / x for x in d.values()) for s, d in ref.items() if d}
    assert set(clo) == set(want_clo)
    for v in want_clo:
        assert clo[v] == pytest.approx(want_clo[v], abs=1e-12)
        assert har[v] == pytest.approx(want_har[v], abs=1e-9)


def test_eccentricity_sym_default(fixture_graph):
    g, src, dst, n = fixture_graph
    ref = _bfs_all(src, dst, n, sym=True)
    ecc = {int(r["vertex"]): r["ecc"] for r in eccentricity(g, chunk=16).take_all()}
    for s, d in ref.items():
        if d:
            assert ecc[s] == max(d.values())


def test_diameter_radius(fixture_graph):
    g, src, dst, n = fixture_graph
    ref = _bfs_all(src, dst, n)
    dia = max(max(d.values()) for d in ref.values() if d)
    rad = min(max(d.values()) for d in ref.values() if d)
    t = diameter_radius(g, variant="out")
    assert t["diameter"][0].as_py() == dia
    assert t["radius"][0].as_py() == rad


def test_distance_profile_counts(fixture_graph):
    g, src, dst, n = fixture_graph
    ref = _bfs_all(src, dst, n)
    prof = collections.Counter()
    for s, d in ref.items():
        for v, x in d.items():
            prof[(s, x)] += 1
    got = {(int(r["source"]), int(r["dist"])): int(r["count"])
           for r in distance_profile(g, chunk=16).take_all()}
    assert got == dict(prof)
