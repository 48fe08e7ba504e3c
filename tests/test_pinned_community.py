"""Pinned-replay community variants — the SQL-oracle-paired forms of
louvain/leiden/spinglass/scg_groups/graphlets (driver gate positions
44-48): louvain_pinned (multilevel with contraction), leiden_pinned
(one local-move + one guarded refine sweep), spinglass_sweeps (exact
rational gamma), scg_grouping_power (integer Krylov grouping),
graphlets_candidate_basis with the join-based threshold lookup."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igraph_ray import Graph
from igraph_ray.algorithms.louvain import louvain_pinned, louvain_sweeps
from igraph_ray.algorithms.leiden import leiden_pinned
from igraph_ray.algorithms.spinglass import spinglass_sweeps
from igraph_ray.algorithms.scg import scg_grouping_power
from igraph_ray.algorithms.graphlets import graphlets_candidate_basis


def _mk(src, dst, n, w=None):
    if w is None:
        return Graph.from_numpy(np.asarray(src, np.int64),
                                np.asarray(dst, np.int64), n=n)
    import ray.data

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "weight": pa.array(w, pa.int64())})).materialize()
    return Graph(edges, n=n, weighted=True)


def _two_triangles():
    # two triangles joined by one bridge edge
    src = [0, 0, 1, 3, 3, 4, 2]
    dst = [1, 2, 2, 4, 5, 5, 3]
    return _mk(src, dst, 6)


def test_louvain_pinned_merges_triangles():
    out = {r["vertex"]: r["community"]
           for r in louvain_pinned(_two_triangles(),
                                   level_sweeps=(2, 1)).take_all()}
    assert len(out) == 6
    assert out[0] == out[1] == out[2]
    assert out[3] == out[4] == out[5]
    assert out[0] != out[3]


def test_louvain_pinned_single_level_matches_sweeps():
    g = _two_triangles()
    a = sorted((r["vertex"], r["community"])
               for r in louvain_pinned(g, level_sweeps=(2,)).take_all())
    b = sorted((r["vertex"], r["community"])
               for r in louvain_sweeps(g, sweeps=2).take_all())
    assert a == b


def test_leiden_pinned_refined_within_phase1():
    rows = leiden_pinned(_two_triangles()).take_all()
    assert len(rows) == 6
    comm = {r["vertex"]: r["community"] for r in rows}
    ref = {r["vertex"]: r["refined"] for r in rows}
    # refinement is constrained to intra-community edges: two vertices
    # sharing a refined label must share the phase-1 label
    by_ref: dict = {}
    for v, rl in ref.items():
        by_ref.setdefault(rl, []).append(v)
    for members in by_ref.values():
        assert len({comm[v] for v in members}) == 1


def test_spinglass_sweeps_deterministic_and_merging():
    g = _two_triangles()
    a = sorted((r["vertex"], r["community"])
               for r in spinglass_sweeps(g, gamma_num=3, gamma_den=2,
                                         sweeps=2).take_all())
    b = sorted((r["vertex"], r["community"])
               for r in spinglass_sweeps(g, gamma_num=3, gamma_den=2,
                                         sweeps=2).take_all())
    assert a == b
    lab = dict(a)
    assert lab[0] == lab[1] == lab[2]


def test_scg_grouping_power_bins_by_structure():
    # K4 plus an isolated path: clearly separated Krylov magnitudes
    src = [0, 0, 0, 1, 1, 2, 4]
    dst = [1, 2, 3, 2, 3, 3, 5]
    g = _mk(src, dst, 6)
    rows = scg_grouping_power(g, intervals=4, steps=(2, 3)).take_all()
    grp = {r["vertex"]: r["group"] for r in rows}
    assert len(grp) == 6
    # K4 members have identical iterates -> identical group; the path
    # pair has much smaller iterates -> a different group
    assert grp[0] == grp[1] == grp[2] == grp[3]
    assert grp[4] != grp[0]
    # dense labels start at 0 (first appearance = vertex 0)
    assert grp[0] == 0


def test_graphlets_basis_threshold_join():
    # triangle at weight 3 inside a weight-1 star: basis must contain
    # the triangle with threshold 3 and the level-1 cliques
    src = [0, 0, 1, 0, 0]
    dst = [1, 2, 2, 3, 4]
    w = [3, 3, 3, 1, 1]
    g = _mk(src, dst, 5, w=w)
    cliques, thr = graphlets_candidate_basis(g)
    as_set = {(c, int(t)) for c, t in zip(cliques, thr)}
    assert ((0, 1, 2), 3) in as_set
    # ordering: ascending (threshold, members)
    order = sorted(range(len(cliques)),
                   key=lambda i: (thr[i], cliques[i]))
    assert order == list(range(len(cliques)))
