"""Dynamic velist reader + NEIGHBORS/EVENT union-graph projections
(dynamic.c:75 reader contract, :751 neighbors selector, :826 event
selector) on hand-computed fixtures."""

import pyarrow as pa
import pytest
import ray.data

from igraph_ray.ops.temporal import (projection_event,
                                     projection_neighbors, union_edges)
from igraph_ray.sources.velist import (dynamic_snapshots,
                                       read_dynamic_velist,
                                       write_dynamic_velist)


@pytest.fixture
def snap():
    # w=0: {(0,1),(1,2)}  w=1: {(0,1),(2,3)}  w=2: {(0,1),(2,3)}
    return ray.data.from_arrow(pa.table({
        "w":   [0, 0, 1, 1, 2, 2],
        "src": [0, 1, 0, 2, 0, 2],
        "dst": [1, 2, 1, 3, 1, 3]}))


def _rows(ds, cols):
    df = ds.to_pandas().sort_values(cols).reset_index(drop=True)
    return [tuple(r) for r in df[cols].itertuples(index=False)]


def test_union_edges(snap):
    got = _rows(union_edges(snap), ["w", "src", "dst", "color"])
    assert got == [(0, 0, 1, 3), (0, 1, 2, 2), (0, 2, 3, 1),
                   (1, 0, 1, 3), (1, 2, 3, 3)]


def test_projection_neighbors(snap):
    got = _rows(projection_neighbors(snap),
                ["w", "src", "dst", "color", "src_local", "dst_local"])
    # pair 0: changed {1,2,3}, joint neighborhood {0,1,2,3}; all edges
    # pair 1: identical snapshots -> no changed vertices -> empty
    assert got == [(0, 0, 1, 3, 0, 1), (0, 1, 2, 2, 1, 2),
                   (0, 2, 3, 1, 2, 3)]


def test_projection_event(snap):
    got = _rows(projection_event(snap),
                ["w", "ea", "eb", "src", "dst", "color"])
    # events of pair 0: (1,2) deleted, (2,3) inserted
    # selector of (1,2): {1,2} u N = {0,1,2,3}; of (2,3): {1,2,3}
    assert got == [(0, 1, 2, 0, 1, 3), (0, 1, 2, 1, 2, 2),
                   (0, 1, 2, 2, 3, 1),
                   (0, 2, 3, 1, 2, 2), (0, 2, 3, 2, 3, 1)]


def test_dynamic_velist_roundtrip(tmp_path):
    p = tmp_path / "a.dvelist"
    p.write_text("v 0\nv 1\nv 2\nv 3\n"
                 "e 0 1 0 -1\ne 1 2 0 2\ne 2 3 1 -1\ne 0 2 2 -1\n")
    edges, verts = read_dynamic_velist(str(p))
    got = _rows(dynamic_snapshots(edges), ["w", "src", "dst"])
    assert got == [(0, 0, 1), (0, 1, 2),
                   (1, 0, 1), (1, 1, 2), (1, 2, 3),
                   (2, 0, 1), (2, 0, 2), (2, 2, 3)]
    q = tmp_path / "b.dvelist"
    write_dynamic_velist(edges, verts, str(q))
    assert q.read_text() == p.read_text()


def test_deletion_never_and_gap(tmp_path):
    # deletion timestamp with no later insertion never materializes a
    # snapshot; dtime beyond the last insertion keeps the edge present
    p = tmp_path / "c.dvelist"
    p.write_text("e 0 1 0 9\ne 1 2 3 -1\n")
    edges, _ = read_dynamic_velist(str(p))
    got = _rows(dynamic_snapshots(edges), ["w", "src", "dst"])
    assert got == [(0, 0, 1), (3, 0, 1), (3, 1, 2)]
