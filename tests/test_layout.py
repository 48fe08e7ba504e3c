"""Layouts (layout.c semantics): circle/star/grid closed forms, FR
determinism + planted-cluster separation."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.ops.layout import (layout_circle,
                                   layout_fruchterman_reingold,
                                   layout_grid, layout_star)


def test_layout_circle(ray_session):
    t = layout_circle(8).to_pandas().sort_values("vertex")
    assert np.allclose(t["x"], np.cos(2 * np.pi * np.arange(8) / 8))
    assert np.allclose(t["y"], np.sin(2 * np.pi * np.arange(8) / 8))


def test_layout_star(ray_session):
    t = layout_star(5, center=2).to_pandas().sort_values(
        "vertex").reset_index(drop=True)
    assert t["x"][2] == 0 and t["y"][2] == 0
    # first non-center vertex sits at angle 0
    assert np.isclose(t["x"][0], 1.0) and np.isclose(t["y"][0], 0.0)
    # all non-center vertices on the unit circle
    r = np.hypot(t["x"], t["y"])
    assert np.allclose(np.delete(r.to_numpy(), 2), 1.0)


def test_layout_grid(ray_session):
    t = layout_grid(7).to_pandas().sort_values("vertex").reset_index(
        drop=True)
    assert list(t["x"]) == [0, 1, 2, 0, 1, 2, 0]
    assert list(t["y"]) == [0, 0, 0, 1, 1, 1, 2]
    t2 = layout_grid(6, width=2).to_pandas().sort_values(
        "vertex").reset_index(drop=True)
    assert list(t2["x"]) == [0, 1, 0, 1, 0, 1]


def test_layout_fr_separates_and_deterministic(ray_session):
    es = set()
    for a in range(8):
        for b in range(a + 1, 8):
            es.add((a, b))
            es.add((a + 8, b + 8))
    es.add((0, 8))
    src = np.array([e[0] for e in es], np.int64)
    dst = np.array([e[1] for e in es], np.int64)
    g = Graph(ray.data.from_arrow(pa.table({"src": src, "dst": dst})),
              n=16)
    pos = layout_fruchterman_reingold(g, iterations=20, n=16).to_pandas()
    pos = pos.sort_values("vertex").reset_index(drop=True)
    xy = pos[["x", "y"]].to_numpy()
    assert ((xy >= 0) & (xy <= 1)).all()
    c1, c2 = xy[:8].mean(axis=0), xy[8:].mean(axis=0)
    intra = max(np.linalg.norm(xy[:8] - c1, axis=1).mean(),
                np.linalg.norm(xy[8:] - c2, axis=1).mean())
    assert np.linalg.norm(c1 - c2) > intra
    pos2 = layout_fruchterman_reingold(g, iterations=20,
                                       n=16).to_pandas()
    pos2 = pos2.sort_values("vertex").reset_index(drop=True)
    assert np.array_equal(xy, pos2[["x", "y"]].to_numpy())


class TestReingoldTilford:
    """igraph_layout_reingold_tilford (layout.c:1052): parents centered
    over subtree leaf spans, sibling subtrees packed in id order, trees
    side by side, y = BFS depth."""

    def _forest(self):
        import pyarrow as pa
        import ray.data
        from igraph_ray.graph import Graph

        # tree A rooted 0: 0-(1,2), 1-(3,4), 2-(5); tree B: 6-7; isolated 8
        t = pa.table({"src": pa.array([0, 0, 1, 1, 2, 6], pa.int64()),
                      "dst": pa.array([1, 2, 3, 4, 5, 7], pa.int64())})
        return Graph(ray.data.from_arrow(t), n=9)

    def test_exact_positions(self, ray_session):
        from igraph_ray.ops.layout import layout_reingold_tilford

        out = layout_reingold_tilford(self._forest(),
                                      num_partitions=3).to_pandas()
        got = {int(r.vertex): (r.x, r.y) for r in out.itertuples()}
        assert got == {0: (1.0, 0.0), 1: (0.5, 1.0), 2: (2.0, 1.0),
                       3: (0.0, 2.0), 4: (1.0, 2.0), 5: (2.0, 2.0),
                       6: (3.0, 0.0), 7: (3.0, 1.0), 8: (4.0, 0.0)}

    def test_structure_random_tree(self, ray_session):
        import pyarrow as pa
        import ray.data
        from igraph_ray.graph import Graph
        from igraph_ray.ops.layout import layout_reingold_tilford

        # deterministic random recursive forest: father(v) < v
        rng = np.random.default_rng(7)
        n = 60
        father = {v: int(rng.integers(0, v)) for v in range(2, n)}
        t = pa.table({
            "src": pa.array([father[v] for v in range(2, n)], pa.int64()),
            "dst": pa.array(list(range(2, n)), pa.int64())})
        g = Graph(ray.data.from_arrow(t), n=n)
        out = layout_reingold_tilford(g, num_partitions=4).to_pandas()
        pos = {int(r.vertex): (r.x, r.y) for r in out.itertuples()}

        # y == depth below root
        depth = {0: 0, 1: 0}
        for v in range(2, n):
            depth[v] = depth[father[v]] + 1
        assert all(pos[v][1] == depth[v] for v in range(n))

        # no two vertices share a position; parents centered over
        # their subtree's leaf extent
        assert len({(x, y) for x, y in pos.values()}) == n
        children = {}
        for v, f in father.items():
            children.setdefault(f, []).append(v)

        def leaves(v):
            ch = children.get(v, [])
            if not ch:
                return [v]
            return [l for c in sorted(ch) for l in leaves(c)]

        for v in range(n):
            lv = leaves(v)
            xs = [pos[l][0] for l in lv]
            assert pos[v][0] == (min(xs) + max(xs)) / 2


class TestLayoutTail:
    """graphopt / DRL / landmark-MDS — the layout.c + src/drl/ tail."""

    def _two_cliques(self):
        es = set()
        for a in range(8):
            for b in range(a + 1, 8):
                es.add((a, b))
                es.add((a + 8, b + 8))
        es.add((0, 8))
        src = np.array([e[0] for e in es], np.int64)
        dst = np.array([e[1] for e in es], np.int64)
        return Graph(ray.data.from_arrow(
            pa.table({"src": src, "dst": dst})), n=16)

    def _check_separates(self, xy):
        c1, c2 = xy[:8].mean(axis=0), xy[8:].mean(axis=0)
        intra = max(np.linalg.norm(xy[:8] - c1, axis=1).mean(),
                    np.linalg.norm(xy[8:] - c2, axis=1).mean())
        assert np.linalg.norm(c1 - c2) > intra

    def test_graphopt_separates_and_deterministic(self, ray_session):
        from igraph_ray.ops.layout import layout_graphopt

        g = self._two_cliques()
        p1 = layout_graphopt(g, iterations=20, n=16).to_pandas() \
            .sort_values("vertex").reset_index(drop=True)
        xy = p1[["x", "y"]].to_numpy()
        assert ((xy >= 0) & (xy <= 1)).all()
        self._check_separates(xy)
        p2 = layout_graphopt(g, iterations=20, n=16).to_pandas() \
            .sort_values("vertex").reset_index(drop=True)
        # bit-wiggle from distributed float-sum order only
        assert np.allclose(xy, p2[["x", "y"]].to_numpy(), atol=1e-12)

    def test_drl_separates_and_deterministic(self, ray_session):
        from igraph_ray.ops.layout import layout_drl

        g = self._two_cliques()
        p1 = layout_drl(g, iterations=20, n=16).to_pandas() \
            .sort_values("vertex").reset_index(drop=True)
        xy = p1[["x", "y"]].to_numpy()
        assert ((xy >= 0) & (xy <= 1)).all()
        self._check_separates(xy)
        p2 = layout_drl(g, iterations=20, n=16).to_pandas() \
            .sort_values("vertex").reset_index(drop=True)
        assert np.allclose(xy, p2[["x", "y"]].to_numpy(), atol=1e-12)

    def test_mds_recovers_path_order(self, ray_session):
        """Classical MDS of a path graph's hop distances is the line:
        the first coordinate must be monotone along the path."""
        from igraph_ray.ops.layout import layout_mds

        n = 24
        t = pa.table({"src": pa.array(np.arange(n - 1), pa.int64()),
                      "dst": pa.array(np.arange(1, n), pa.int64())})
        g = Graph(ray.data.from_arrow(t), n=n)
        # landmarks = all vertices -> exact classical MDS
        out = layout_mds(g, num_landmarks=n, num_partitions=3).to_pandas()
        out = out.sort_values("vertex").reset_index(drop=True)
        x = out["x"].to_numpy()
        d = np.diff(x)
        assert (d > 0).all() or (d < 0).all()
        # y variance negligible vs x (a path is 1-D)
        assert out["y"].to_numpy().std() < 0.05 * x.std()

    def test_mds_landmark_matches_full_on_grid(self, ray_session):
        """Landmark MDS with a spanning landmark set approximates the
        full embedding: pairwise embedded distances correlate strongly
        with hop distances on a 5x5 grid."""
        from igraph_ray.ops.layout import layout_mds

        w = 5
        es = []
        for r in range(w):
            for c in range(w):
                v = r * w + c
                if c + 1 < w:
                    es.append((v, v + 1))
                if r + 1 < w:
                    es.append((v, v + w))
        src = np.array([e[0] for e in es], np.int64)
        dst = np.array([e[1] for e in es], np.int64)
        g = Graph(ray.data.from_arrow(
            pa.table({"src": src, "dst": dst})), n=w * w)
        out = layout_mds(g, num_landmarks=12, num_partitions=3) \
            .to_pandas().sort_values("vertex").reset_index(drop=True)
        xy = out[["x", "y"]].to_numpy()
        # hop distance vs embedded distance over all pairs
        import collections
        adj = collections.defaultdict(list)
        for s, d in es:
            adj[s].append(d)
            adj[d].append(s)
        hop = np.full((w * w, w * w), np.inf)
        for s in range(w * w):
            hop[s, s] = 0
            q = [s]
            while q:
                nq = []
                for u in q:
                    for v2 in adj[u]:
                        if hop[s, v2] == np.inf:
                            hop[s, v2] = hop[s, u] + 1
                            nq.append(v2)
                q = nq
        emb = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
        iu = np.triu_indices(w * w, 1)
        corr = np.corrcoef(hop[iu], emb[iu])[0, 1]
        assert corr > 0.9

def test_layout_random_bounds_and_determinism():
    from igraph_ray.ops.layout import layout_random

    a = layout_random(100, seed=7, dims=3).to_pandas().set_index("vertex")
    b = layout_random(100, seed=7, dims=3).to_pandas().set_index("vertex")
    assert (a == b).all().all()
    for c in ("x", "y", "z"):
        assert a[c].between(-1.0, 1.0).all()
    c2 = layout_random(100, seed=8, dims=3).to_pandas().set_index("vertex")
    assert not (a["x"] == c2["x"]).all()


def test_layout_grid_3d_lattice():
    from igraph_ray.ops.layout import layout_grid_3d

    p = layout_grid_3d(30, width=3, height=2).to_pandas()
    assert len(p) == 30
    v = p.set_index("vertex")
    assert v.loc[0, "x"] == 0 and v.loc[0, "y"] == 0 and v.loc[0, "z"] == 0
    assert v.loc[7, "x"] == 1 and v.loc[7, "y"] == 0 and v.loc[7, "z"] == 1
    # all cells distinct
    assert len(set(zip(p.x, p.y, p.z))) == 30


def test_layout_sphere_on_unit_sphere():
    import numpy as np

    from igraph_ray.ops.layout import layout_sphere

    p = layout_sphere(64).to_pandas().set_index("vertex").sort_index()
    r = np.sqrt(p.x ** 2 + p.y ** 2 + p.z ** 2)
    assert np.allclose(r, 1.0, atol=1e-9)
    # poles pinned
    assert abs(p.loc[0, "z"] + 1.0) < 1e-12
    assert abs(p.loc[63, "z"] - 1.0) < 1e-12
    # neighbors on the spiral stay close (no teleporting)
    d = np.sqrt(np.diff(p.x) ** 2 + np.diff(p.y) ** 2 + np.diff(p.z) ** 2)
    assert d.max() < 1.0
    # partition invariance: same result from a repartitioned range
    q = layout_sphere(64).to_pandas().set_index("vertex").sort_index()
    assert (p == q).all().all()


def test_layout_rt_circular_radius_is_depth():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from igraph_ray.graph import Graph
    from igraph_ray.ops.layout import (layout_reingold_tilford,
                                       layout_reingold_tilford_circular)

    # binary tree on 15 vertices, root 0
    src = [i for i in range(1, 15)]
    dst = [(i - 1) // 2 for i in range(1, 15)]
    g = Graph(ray.data.from_arrow(pa.table(
        {"src": pa.array(src, pa.int64()),
         "dst": pa.array(dst, pa.int64())})), n=15)
    rt = layout_reingold_tilford(g, num_partitions=4).to_pandas() \
        .set_index("vertex")
    cc = layout_reingold_tilford_circular(g, num_partitions=4) \
        .to_pandas().set_index("vertex")
    rad = np.sqrt(cc.x ** 2 + cc.y ** 2)
    for v in range(15):
        assert abs(rad[v] - rt.loc[v, "y"]) < 1e-9  # radius == RT depth
