"""Cross-scale determinism (FIXTURES.md §5): identical results across
partition counts and execution modes — the engine's analogue of the
reference's ARPACK-vs-PRPACK consistency test."""

import numpy as np

from igraph_ray import Graph, connected_components, label_propagation, pagerank, triangle_counts
from tests import fixtures as fx


def _pr(n, src, dst, parts, **kw):
    g = Graph.from_numpy(src, dst, n=n)
    res = pagerank(g, num_partitions=parts, fixed_iterations=12, **kw)
    got = {r["vertex"]: r["pr"] for r in res.state.take_all()}
    return np.array([got[i] for i in range(n)])


def test_pagerank_partition_invariance():
    """Integer-result algorithms are byte-identical across partition
    counts; float PageRank differs only in summation order (last-ulp),
    bounded far below every correctness tolerance."""
    n, src, dst = fx.powerlaw(n=800, m=4000, seed=31)
    a = _pr(n, src, dst, 1)
    b = _pr(n, src, dst, 4)
    c = _pr(n, src, dst, 16)
    assert np.abs(a - b).max() < 1e-14 and np.abs(b - c).max() < 1e-14
    # same partition count twice → byte-identical
    b2 = _pr(n, src, dst, 4)
    assert np.array_equal(b, b2)


def test_components_partition_invariance():
    n, src, dst = fx.forest(seed=19)
    outs = []
    for parts in (1, 4, 16):
        g = Graph.from_numpy(src, dst, n=n)
        res = connected_components(g, num_partitions=parts)
        got = {r["vertex"]: r["label"] for r in res.state.take_all()}
        outs.append([got[i] for i in range(n)])
    assert outs[0] == outs[1] == outs[2]


def test_lpa_partition_invariance():
    n, src, dst = fx.ring_of_cliques()
    outs = []
    for parts in (1, 4, 16):
        g = Graph.from_numpy(src, dst, n=n)
        res = label_propagation(g, num_partitions=parts)
        got = {r["vertex"]: r["community"] for r in res.state.take_all()}
        outs.append([got[i] for i in range(n)])
    assert outs[0] == outs[1] == outs[2]


def test_triangles_partition_invariance():
    n, src, dst = fx.powerlaw(n=400, m=2500, seed=44)
    outs = []
    for parts in (2, 8):
        g = Graph.from_numpy(src, dst, n=n)
        got = {r["vertex"]: r["triangles"] for r in triangle_counts(g, num_partitions=parts).take_all()}
        outs.append([got[i] for i in range(n)])
    assert outs[0] == outs[1]


def test_huge_sparse_id_span():
    """Compressed-row CSR blocks: algorithms must not allocate over the
    raw id span (hashed 64-bit ids on an n=None universe)."""
    import numpy as np

    from igraph_ray import Graph
    from igraph_ray.algorithms.components import connected_components
    from igraph_ray.algorithms.pagerank import pagerank
    from igraph_ray.algorithms.kcore import coreness

    src = np.array([10**12, 5, 7, 8, 9 * 10**11, 5], np.int64)
    dst = np.array([5, 7, 8, 9 * 10**11, 7, 10**12], np.int64)
    g = Graph.from_numpy(src, dst, n=None)
    labs = {r["vertex"]: r["label"] for r in
            connected_components(g, num_partitions=4, densify=False)
            .state.take_all()}
    assert set(labs.values()) == {5}
    pr = {r["vertex"]: r["pr"] for r in
          pagerank(g, fixed_iterations=10, num_partitions=4).state.take_all()}
    assert len(pr) == 5 and abs(sum(pr.values()) - 1.0) < 1e-9
    core = {r["vertex"]: r["coreness"] for r in
            coreness(g, num_partitions=4).state.take_all()}
    assert len(core) == 5


def test_dense_rank_map_many_labels_driver_flat():
    """dense_rank_map must keep rank blocks in the object store: ranking
    8M distinct labels may not grow driver RSS by anything near the
    table size (~128 MB if it were pulled through the driver)."""
    import os

    import pyarrow as pa
    import ray.data

    from igraph_ray.util import dense_rank_map

    def _rss_mb():
        with open(f"/proc/{os.getpid()}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
        return 0.0

    n = 8_000_000
    base = ray.data.range(n).map_batches(
        lambda b: pa.table({"label": pa.array(
            b["id"].to_numpy(zero_copy_only=False) * 7 + 3, pa.int64())}),
        batch_format="pyarrow")
    before = _rss_mb()
    ranked = dense_rank_map(base, "label")
    # consume distributively: the driver sees only scalars
    assert ranked.count() == n
    mn = ranked.min("rank")
    mx = ranked.max("rank")
    assert (mn, mx) == (0, n - 1)
    after = _rss_mb()
    assert after - before < 100.0, f"driver RSS grew {after - before:.0f} MB"
    # spot-check correctness of the dense-rank contract on a slice
    head = ranked.sort("rank").limit(3).take_all()
    assert [(r["label"], r["rank"]) for r in head] == [(3, 0), (10, 1), (17, 2)]


def test_mst_massive_forest_no_driver_blowup():
    """Borůvka round 1 on a perfect-matching forest has |V|/2 components
    — the exact shape that used to land on the driver. The MSF of a
    forest is the forest itself."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from igraph_ray.algorithms.mst import minimum_spanning_forest

    k = 1 << 18  # 262144 components of size 2
    src = np.arange(0, 2 * k, 2, dtype=np.int64)
    dst = src + 1
    w = ((src * 31 + 7) % 1000).astype(np.float64)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst), "weight": pa.array(w)}))
    out = minimum_spanning_forest(edges, num_partitions=4)
    assert out.count() == k
    s = int(out.sum("weight"))
    assert s == int(w.sum())


def test_hash_join_lazy_left_matches_eager(ray_session):
    """lazy_left skips the left-side materialize so broadcast-join
    chains fuse; results must be identical to the eager path for every
    join type, including empty-right and all-null-match edges."""
    import pyarrow as pa
    import ray.data
    from igraph_ray.util import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "a": pa.array([10, 20, 30, 40], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 4, 5], pa.int64()),
        "b": pa.array([200, 400, 500], pa.int64())}))
    empty = ray.data.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))

    for jt in ("inner", "left_outer", "left_semi", "left_anti"):
        for r in (right, empty):
            eager = hash_join(left, r, on="k", join_type=jt).to_pandas()
            lazy = hash_join(left, r, on="k", join_type=jt,
                             lazy_left=True).to_pandas()
            eager = eager.sort_values(list(eager.columns)).reset_index(
                drop=True)
            lazy = lazy.sort_values(list(lazy.columns)).reset_index(
                drop=True)
            assert eager.equals(lazy), (jt, len(r.take_all()))

    # a chain of lazy joins over a map_batches left stays correct
    j = hash_join(left, right, on="k")
    j = hash_join(j, right.map_batches(
        lambda b: pa.table({"k": b["k"], "c": b["b"]}),
        batch_format="pyarrow", batch_size=None), on="k", lazy_left=True)
    got = j.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == [2, 4] and list(got["c"]) == [200, 400]
