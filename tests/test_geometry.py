"""Convex hull vs brute-force extreme-point test (other.c:121)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.ops.geometry import convex_hull


def _hull(pts):
    t = pa.table({"vertex": pa.array(np.arange(len(pts), dtype=np.int64)),
                  "x": pa.array(np.array([p[0] for p in pts], np.int64)),
                  "y": pa.array(np.array([p[1] for p in pts], np.int64))})
    return convex_hull(ray.data.from_arrow(t)).to_pandas()


def _brute_extreme(pts):
    """p is extreme iff not in the convex hull of the others (triangle
    + segment containment, exact integers)."""
    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    out = set()
    for i, p in enumerate(pts):
        others = [q for j, q in enumerate(pts) if j != i]
        contained = False
        for a, b in itertools.combinations(others, 2):
            if cross(a, b, p) == 0 and \
               (p[0] - a[0]) * (p[0] - b[0]) <= 0 and \
               (p[1] - a[1]) * (p[1] - b[1]) <= 0:
                contained = True
                break
        if not contained:
            for a, b, c in itertools.combinations(others, 3):
                if cross(a, b, c) == 0:
                    continue
                s1, s2, s3 = cross(a, b, p), cross(b, c, p), cross(c, a, p)
                if (s1 >= 0 and s2 >= 0 and s3 >= 0) or \
                   (s1 <= 0 and s2 <= 0 and s3 <= 0):
                    contained = True
                    break
        if not contained:
            out.add(i)
    return out


def test_square_with_center(ray_session):
    pts = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 5)]
    got = _hull(pts)
    assert sorted(got.vertex) == [0, 1, 2, 3]


def test_collinear_boundary_point_excluded(ray_session):
    # (5, 0) lies on the bottom edge: not an extreme point
    pts = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 0)]
    got = _hull(pts)
    assert sorted(got.vertex) == [0, 1, 2, 3]


@pytest.mark.parametrize("seed", [1, 4, 9])
def test_random_matches_bruteforce(ray_session, seed):
    rng = np.random.RandomState(seed)
    pts = [tuple(p) for p in rng.randint(0, 100, (25, 2)).tolist()]
    pts = list(dict.fromkeys(pts))  # engine and brute both assume no dups
    got = _hull(pts)
    assert set(got.vertex) == _brute_extreme(pts)
