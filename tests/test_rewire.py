

class TestRewireEdges:
    def test_zero_prob_identity(self, ray_session):
        import pyarrow as pa
        import ray.data
        from igraph_ray.ops.rewire import rewire_edges

        t = pa.table({"src": pa.array([0, 1, 2, 3], pa.int64()),
                      "dst": pa.array([1, 2, 3, 0], pa.int64())})
        out = rewire_edges(ray.data.from_arrow(t), n=10,
                           prob_e6=0).to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        assert out.values.tolist() == [[0, 1], [1, 2], [2, 3], [3, 0]]

    def test_no_loops_created(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from igraph_ray.ops.rewire import rewire_edges

        rng = np.random.RandomState(3)
        src = rng.randint(0, 40, 300).astype("int64")
        dst = rng.randint(0, 40, 300).astype("int64")
        keep = src != dst
        t = pa.table({"src": pa.array(src[keep]),
                      "dst": pa.array(dst[keep])})
        out = rewire_edges(ray.data.from_arrow(t), n=40,
                           prob_e6=800_000, seed=5).to_pandas()
        assert (out.src != out.dst).all()
        assert len(out) == keep.sum()
        assert out.src.between(0, 39).all() and out.dst.between(0, 39).all()

    def test_rewire_rate(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from igraph_ray.ops.rewire import rewire_edges

        src = np.repeat(np.arange(50, dtype="int64"), 20)
        dst = np.tile(np.arange(50, 100, dtype="int64"), 20)
        t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        out = rewire_edges(ray.data.from_arrow(t), n=200,
                           prob_e6=500_000, seed=7).to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        # ~half the src endpoints should have left the 0..49 band
        moved = (~out.src.between(0, 49)).mean()
        assert 0.3 < moved < 0.55  # p=0.5 less the draws landing back

    def test_parallelism_invariance(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from igraph_ray.ops.rewire import rewire_edges

        rng = np.random.RandomState(9)
        src = rng.randint(0, 30, 200).astype("int64")
        dst = (src + 1 + rng.randint(0, 28, 200)).astype("int64") % 30
        t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        ds = ray.data.from_arrow(t)
        a = rewire_edges(ds, 30, 400_000, seed=2).to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        b = rewire_edges(ds.repartition(7), 30, 400_000,
                         seed=2).to_pandas().sort_values(
            ["src", "dst"]).reset_index(drop=True)
        assert a.values.tolist() == b.values.tolist()
