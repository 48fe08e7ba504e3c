"""embedding covariance / PCA projection vs dense numpy."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.ops.similarity import embedding_covariance, pca_project


def _emb_ds(X, parts=4):
    t = pa.table({
        "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in X.astype(np.float32)],
                              pa.list_(pa.float32()))})
    return ray.data.from_arrow(t).repartition(parts)


def test_covariance_matches_numpy():
    rng = np.random.RandomState(9)
    X = rng.randn(300, 8).astype(np.float32).astype(np.float64)
    got = embedding_covariance(_emb_ds(X), col="embedding").to_pandas()
    C = np.cov(X, rowvar=False, ddof=1)
    for r in got.itertuples():
        assert int(r.cov_e6) == int(round(C[r.i, r.j] * 1e6))
    assert len(got) == 8 * 9 // 2


def test_covariance_partition_invariant():
    rng = np.random.RandomState(2)
    X = rng.randn(200, 5)
    a = embedding_covariance(_emb_ds(X, parts=1)).to_pandas()
    b = embedding_covariance(_emb_ds(X, parts=7)).to_pandas()
    a = a.sort_values(["i", "j"]).reset_index(drop=True)
    b = b.sort_values(["i", "j"]).reset_index(drop=True)
    assert (a["cov_e6"] == b["cov_e6"]).all()


def test_pca_projection_matches_dense_eigh():
    rng = np.random.RandomState(4)
    # anisotropic blob so the top components are well separated
    X = rng.randn(400, 6) * np.array([10.0, 5.0, 1, 1, 1, 1])
    Xf = X.astype(np.float32).astype(np.float64)
    got = pca_project(_emb_ds(X), k=2).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    C = np.cov(Xf, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:2]
    comps = v[:, order]
    for c in range(2):
        m = np.argmax(np.abs(comps[:, c]))
        if comps[m, c] < 0:
            comps[:, c] = -comps[:, c]
    want = (Xf - Xf.mean(0)) @ comps
    np.testing.assert_allclose(
        got[["pc0", "pc1"]].to_numpy(), want, rtol=1e-8, atol=1e-8)
