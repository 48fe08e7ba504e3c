"""Bipartite utility surfaces (/root/reference/src/bipartite.c):
create_bipartite validation, incidence matrix round-trip,
projection sizes."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.ops.bipartite import (
    bipartite_projection_size,
    create_bipartite,
    get_incidence,
    incidence_from_matrix,
)


def _ds(rows, names):
    return ray.data.from_arrow(pa.table(
        {n: pa.array([r[i] for r in rows], pa.int64())
         for i, n in enumerate(names)}))


def test_incidence_round_trip():
    m = np.array([[1, 0, 2],
                  [0, 1, 0]], dtype=np.int64)
    g, types = incidence_from_matrix(m)
    assert list(types) == [0, 0, 1, 1, 1]
    tds = _ds([(v, int(t)) for v, t in enumerate(types)],
              ["vertex", "type"])
    got = {(r["row"], r["col"]): r["mult"]
           for r in get_incidence(g.edges, tds, num_partitions=2).take_all()}
    assert got == {(0, 0): 1, (0, 2): 2, (1, 1): 1}


def test_create_bipartite_validates():
    types = _ds([(0, 0), (1, 0), (2, 1), (3, 1)], ["vertex", "type"])
    ok = _ds([(0, 2), (1, 3), (0, 3)], ["src", "dst"])
    g = create_bipartite(types, ok, num_partitions=2)
    assert g.edges.count() == 3
    bad = _ds([(0, 2), (0, 1)], ["src", "dst"])  # 0-1 same type
    with pytest.raises(ValueError):
        create_bipartite(types, bad, num_partitions=2)


def test_projection_size_brute():
    # incidence: a-side {0,1,2}, b-side {10,11}
    inc = _ds([(0, 10), (1, 10), (2, 11), (1, 11)], ["a", "b"])
    t = bipartite_projection_size(inc, num_partitions=2).to_pylist()[0]
    # proj1 pairs sharing a b: (0,1) via 10, (1,2) via 11 -> 2 edges
    # proj2 pairs sharing an a: (10,11) via 1 -> 1 edge
    assert t == {"vcount1": 3, "ecount1": 2, "vcount2": 2, "ecount2": 1}
