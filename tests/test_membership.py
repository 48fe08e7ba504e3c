"""community.c membership utilities — exact-numbering goldens plus an
independent union-find partition check."""

import numpy as np

from igraph_ray.ops.membership import (community_to_membership,
                                       eb_get_merges,
                                       reindex_membership)


def test_community_to_membership_golden():
    merges = [(0, 1), (8, 2), (3, 4), (9, 10)]
    mem, csize = community_to_membership(merges, nodes=8, steps=3)
    assert mem.tolist() == [1, 1, 1, 0, 0, 2, 3, 4]
    assert csize.tolist() == [2, 3, 1, 1, 1]
    # steps=4: everything merged down to 4 components -> here 8-4=4
    mem4, csize4 = community_to_membership(merges, nodes=8, steps=4)
    assert sorted(csize4.tolist()) == [1, 1, 1, 5]


def test_partition_matches_union_find():
    rng = np.random.RandomState(3)
    nodes = 12
    # random valid merge matrix: maintain available community ids
    avail = list(range(nodes))
    merges = []
    nxt = nodes
    while len(avail) > 1:
        i, j = sorted(rng.choice(len(avail), 2, replace=False))
        c2 = avail.pop(j)
        c1 = avail.pop(i)
        merges.append((c1, c2))
        avail.append(nxt)
        nxt += 1
    for steps in (0, 3, 7, nodes - 1):
        mem, csize = community_to_membership(merges, nodes, steps)
        # independent union-find partition
        parent = list(range(nodes + steps))

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        for k in range(steps):
            a, b = merges[k]
            parent[find(a)] = find(nodes + k)
            parent[find(b)] = find(nodes + k)
        groups = {}
        for v in range(nodes):
            groups.setdefault(find(v), set()).add(v)
        expect = sorted(map(frozenset, groups.values()),
                        key=lambda s: min(s))
        got = {}
        for v in range(nodes):
            got.setdefault(int(mem[v]), set()).add(v)
        got_parts = sorted(map(frozenset, got.values()),
                           key=lambda s: min(s))
        assert got_parts == expect
        assert len(got_parts) == nodes - steps
        assert sorted(csize.tolist(), reverse=True) == sorted(
            (len(p) for p in got_parts), reverse=True)


def test_reindex_membership():
    new, n2o = reindex_membership(np.array([7, 3, 7, 100, 3]))
    assert new.tolist() == [1, 0, 1, 2, 0]
    assert n2o.tolist() == [3, 7, 100]
    e, eo = reindex_membership(np.array([], dtype=np.int64))
    assert len(e) == 0 and len(eo) == 0


def test_eb_get_merges_roundtrip():
    # path 0-1-2-3, removal order = the path edges in betweenness order
    removed = [(1, 2), (0, 1), (2, 3)]
    merges = eb_get_merges(removed, nodes=4)
    # replaying all merges yields one component
    mem, csize = community_to_membership(merges, 4, len(merges))
    assert len(set(mem.tolist())) == 1
    # first re-added edge (last removed) merges 2 and 3
    assert set(merges[0]) == {2, 3}
