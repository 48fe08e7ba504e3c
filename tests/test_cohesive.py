"""Cohesive blocking (igraph_cohesive_blocks, cohesive_blocks.c:202):
validated against the reference's OWN example outputs
(examples/simple/cohesive_blocks.out) for the Moody-White graph, the
tricky separator-block graph, and the science-camp graph."""

from __future__ import annotations

import numpy as np

from igraph_ray import Graph
from igraph_ray.algorithms.cohesive import cohesive_blocks


def _mk(pairs, n):
    s, d = zip(*pairs)
    return Graph.from_numpy(np.asarray(s, np.int64),
                            np.asarray(d, np.int64), n=n)


def _run(pairs, n):
    info, members = cohesive_blocks(_mk(pairs, n))
    blocks = {}
    for r in members.to_pylist():
        blocks.setdefault(r["block"], []).append(r["vertex"])
    out = []
    for r in info.to_pylist():
        out.append((tuple(sorted(blocks[r["block"]])), r["cohesion"],
                    r["parent"]))
    return out


MOODY_WHITE = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
    (1, 2), (1, 3), (1, 4), (1, 6),
    (2, 3), (2, 5), (2, 6),
    (3, 4), (3, 5), (3, 6),
    (4, 5), (4, 6), (4, 20),
    (5, 6),
    (6, 7), (6, 10), (6, 13), (6, 18),
    (7, 8), (7, 10), (7, 13),
    (8, 9),
    (9, 11), (9, 12),
    (10, 11), (10, 13),
    (11, 15),
    (12, 15),
    (13, 14),
    (14, 15),
    (16, 17), (16, 18), (16, 19),
    (17, 19), (17, 20),
    (18, 19), (18, 21), (18, 22),
    (19, 20),
    (20, 21), (20, 22),
    (21, 22),
]


def test_moody_white_example():
    got = _run(MOODY_WHITE, 23)
    want = [
        (tuple(range(23)), 1, -1),
        (tuple([0, 1, 2, 3, 4, 5, 6, 16, 17, 18, 19, 20, 21, 22]), 2, 0),
        (tuple([6, 7, 8, 9, 10, 11, 12, 13, 14, 15]), 2, 0),
        (tuple([0, 1, 2, 3, 4, 5, 6]), 5, 1),
        (tuple([6, 7, 10, 13]), 3, 2),
    ]
    assert sorted(got) == sorted(want), got


TRICKY = [(0, 1), (0, 4), (0, 5), (1, 2), (1, 4), (1, 5), (1, 6),
          (2, 3), (2, 5), (2, 6), (2, 7), (3, 6), (3, 7), (4, 5),
          (5, 6), (6, 7)]


def test_tricky_separator_block():
    got = _run(TRICKY, 8)
    want = [
        (tuple(range(8)), 2, -1),
        ((0, 1, 4, 5), 3, 0),
        ((2, 3, 6, 7), 3, 0),
        ((1, 2, 5, 6), 3, 0),
    ]
    assert sorted(got) == sorted(want), got


SCIENCE_CAMP = [
    (0, 1), (0, 2), (0, 3),
    (1, 2), (1, 3), (1, 16), (1, 17),
    (2, 3),
    (3, 17),
    (4, 5), (4, 6), (4, 7), (4, 8),
    (5, 6), (5, 7),
    (6, 7), (6, 8),
    (7, 8), (7, 16),
    (8, 9), (8, 10),
    (9, 11), (9, 12), (9, 13), (9, 14),
    (10, 11), (10, 12), (10, 13),
    (11, 14),
    (12, 13), (12, 14), (12, 15),
    (15, 16), (15, 17),
    (16, 17),
]


def test_science_camp():
    got = _run(SCIENCE_CAMP, 18)
    want = [
        (tuple(range(18)), 2, -1),
        ((0, 1, 2, 3), 3, 0),
        ((4, 5, 6, 7, 8), 3, 0),
        ((9, 10, 11, 12, 13, 14), 3, 0),
    ]
    assert sorted(got) == sorted(want), got


def test_karate():
    from tests.fixtures import karate

    n, s, d = karate()
    got = _run(list(zip(s.tolist(), d.tolist())), n)
    want = [
        (tuple(range(34)), 1, -1),
        (tuple([0, 1, 2, 3, 7, 8, 9, 12, 13, 14, 15, 17, 18, 19, 20,
                21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33]),
         2, 0),
        ((0, 4, 5, 6, 10, 16), 2, 0),
        ((0, 1, 2, 3, 7), 4, 1),
        ((0, 1, 2, 8, 30, 32, 33), 3, 1),
        ((0, 4, 5, 6, 10), 3, 2),
        ((0, 1, 2, 3, 13), 4, 1),
        ((2, 23, 24, 25, 27, 28, 29, 31, 32, 33), 3, 1),
    ]
    # parents are block indices in OUR emission order; compare as
    # (vertexset, cohesion, parent-vertexset) triples instead
    def norm(rows):
        sets = [r[0] for r in rows]
        return sorted((r[0], r[1], sets[r[2]] if r[2] >= 0 else None)
                      for r in rows)

    assert norm(got) == norm(want), got
