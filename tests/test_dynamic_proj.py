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


def test_write_dynamic_union_projection_round_trip(ray_session, tmp_path):
    """dynamic.c:939 writer: the projection stream round-trips through
    the velist transaction reader (plain and gz)."""
    import pyarrow as pa
    import ray.data

    from igraph_ray.ops.temporal import write_dynamic_union_projection
    from igraph_ray.sources.velist import read_velist

    proj = ray.data.from_arrow(pa.table({
        "w": pa.array([0, 0, 0, 1, 1], pa.int64()),
        "src": pa.array([0, 1, 2, 0, 3], pa.int64()),
        "dst": pa.array([1, 2, 3, 2, 4], pa.int64()),
        "color": pa.array([3, 2, 1, 3, 2], pa.int64())}))
    import gzip

    for gz in (False, True):
        p = str(tmp_path / ("u.txt.gz" if gz else "u.txt"))
        nt = write_dynamic_union_projection(proj, 5, p, gz=gz)
        assert nt == 2
        if gz:
            # gz content must decompress to exactly the plain bytes
            with gzip.open(p, "rt") as f:
                assert f.read() == open(str(tmp_path / "u.txt")).read()
            continue
        edges, verts, headers = read_velist(p, has_ecolors=True)
        ed = edges.to_pandas().sort_values(["gid", "src", "dst"])
        assert len(ed) == 5
        assert ed["ecolor"].tolist() == [3, 2, 1, 3, 2]
        assert headers.to_pandas()["tid"].tolist() == [0, 1]
        assert verts.to_pandas().groupby("gid").size().tolist() == [5, 5]
