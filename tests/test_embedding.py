"""Adjacency spectral embedding (embedding.c ASE semantics): eigenpair
agreement with dense numpy eigh, planted-block separation, path-graph
closed-form spectrum, determinism."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.algorithms.embedding import adjacency_spectral_embedding
from igraph_ray.graph import Graph


def _g(src, dst, n):
    return Graph(ray.data.from_arrow(pa.table({
        "src": np.asarray(src, np.int64),
        "dst": np.asarray(dst, np.int64)})), n=n)


def _dense_ref(src, dst, n, k):
    A = np.zeros((n, n))
    A[src, dst] = 1
    A[dst, src] = 1
    ev, U = np.linalg.eigh(A)
    order = np.argsort(-np.abs(ev))[:k]
    return ev[order], U[:, order] * np.sqrt(np.abs(ev[order]))[None, :]


def test_ase_matches_dense_eigh(ray_session):
    rng = np.random.default_rng(2)
    n = 60
    pairs = sorted({(min(a, b), max(a, b))
                    for a, b in rng.integers(0, n, (400, 2)) if a != b})
    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    k = 3
    res = adjacency_spectral_embedding(_g(src, dst, n), k=k, oversample=3,
                                       fixed_iterations=160,
                                       num_partitions=4)
    ev_ref, ref = _dense_ref(src, dst, n, k)
    assert np.allclose(res.scalars["eigenvalues"], ev_ref, atol=1e-5)
    t = res.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    E = t[[f"d{j}" for j in range(k)]].to_numpy()
    for j in range(k):
        err = min(np.abs(E[:, j] - ref[:, j]).max(),
                  np.abs(E[:, j] + ref[:, j]).max())
        assert err < 1e-3, (j, err)


def test_ase_planted_blocks(ray_session):
    # two dense blocks + sparse cross edges: d1 separates the blocks
    rng = np.random.default_rng(4)
    bs = 20
    n = 2 * bs
    es = set()
    for b in range(2):
        vs = np.arange(b * bs, (b + 1) * bs)
        for i in vs:
            for j in rng.choice(vs, 8, replace=False):
                if i != j:
                    es.add((min(i, j), max(i, j)))
    es.add((0, bs))
    src = np.array([e[0] for e in es], np.int64)
    dst = np.array([e[1] for e in es], np.int64)
    res = adjacency_spectral_embedding(_g(src, dst, n), k=2,
                                       fixed_iterations=120,
                                       num_partitions=4)
    t = res.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    d1 = t["d1"].to_numpy()
    # majority separation (numpy's exact u1 also has a couple of
    # boundary vertices crossing zero on this fixture)
    s1 = np.sign(np.median(d1[:bs]))
    assert (np.sign(d1[:bs]) == s1).mean() > 0.8
    assert (np.sign(d1[bs:]) == -s1).mean() > 0.8
    # and the engine's top-2 eigenvalues match the dense reference
    ev_ref, _ = _dense_ref(src, dst, n, 2)
    assert np.allclose(res.scalars["eigenvalues"], ev_ref, atol=1e-4)


def test_ase_path_closed_form(ray_session):
    # P_n eigenvalues are 2cos(pi*j/(n+1))
    n = 12
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    res = adjacency_spectral_embedding(_g(src, dst, n), k=2, oversample=3,
                                       fixed_iterations=200,
                                       num_partitions=2)
    ev = res.scalars["eigenvalues"]
    expect = [2 * np.cos(np.pi / (n + 1)), -2 * np.cos(np.pi / (n + 1))]
    assert np.allclose(sorted(ev), sorted(expect), atol=1e-6)


def test_ase_deterministic(ray_session):
    rng = np.random.default_rng(9)
    n = 40
    pairs = sorted({(min(a, b), max(a, b))
                    for a, b in rng.integers(0, n, (150, 2)) if a != b})
    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    r1 = adjacency_spectral_embedding(_g(src, dst, n), k=2,
                                      fixed_iterations=60, num_partitions=3)
    r2 = adjacency_spectral_embedding(_g(src, dst, n), k=2,
                                      fixed_iterations=60, num_partitions=3)
    t1 = r1.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    t2 = r2.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert np.array_equal(t1["d0"].to_numpy(), t2["d0"].to_numpy())
    assert np.array_equal(t1["d1"].to_numpy(), t2["d1"].to_numpy())


def test_lse_matches_dense_eigh(ray_session):
    # LSE: eigenpairs of D^{-1/2} A D^{-1/2} (embedding.c:998, DAD)
    rng = np.random.default_rng(7)
    n = 50
    pairs = sorted({(min(a, b), max(a, b))
                    for a, b in rng.integers(0, n, (300, 2)) if a != b})
    # ensure no isolated vertices (DAD undefined at degree 0)
    seen = {v for p in pairs for v in p}
    for v in range(n):
        if v not in seen:
            pairs.append((min(v, (v + 1) % n), max(v, (v + 1) % n)))
    pairs = sorted(set(pairs))
    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    k = 3
    res = adjacency_spectral_embedding(_g(src, dst, n), k=k, oversample=3,
                                       fixed_iterations=160,
                                       num_partitions=4, variant="lse")
    A = np.zeros((n, n))
    A[src, dst] = 1.0
    A[dst, src] = 1.0
    d = A.sum(1)
    DAD = A / np.sqrt(np.outer(d, d))
    ev, U = np.linalg.eigh(DAD)
    order = np.argsort(-np.abs(ev))[:k]
    ev_ref = ev[order]
    ref = U[:, order] * np.sqrt(np.abs(ev_ref))[None, :]
    # sign convention: max-|value| entry positive
    for j in range(k):
        i = np.argmax(np.abs(ref[:, j]))
        if ref[i, j] < 0:
            ref[:, j] = -ref[:, j]
    assert np.allclose(res.scalars["eigenvalues"], ev_ref, atol=1e-5)
    t = res.state.to_pandas().sort_values("vertex").reset_index(drop=True)
    E = t[[f"d{j}" for j in range(k)]].to_numpy()
    for j in range(k):
        err = min(np.abs(E[:, j] - ref[:, j]).max(),
                  np.abs(E[:, j] + ref[:, j]).max())
        assert err < 1e-3, (j, err)


def test_dim_select_reference_replay(ray_session):
    """dim_select vs a literal transcription of the reference's
    streaming recurrence (embedding.c:1054)."""
    import math

    from igraph_ray.algorithms.embedding import dim_select

    def ref(sv):
        n = len(sv)
        if n == 1:
            return 1
        sum1 = 0.0
        sum2 = sum(sv)
        sumsq1 = 0.0
        sumsq2 = sum(x * x for x in sv)
        mean1, mean2 = 0.0, sum2 / n
        varsq1, varsq2 = 0.0, sum((mean2 - x) ** 2 for x in sv)
        best, dim = -math.inf, 1
        for i in range(n - 1):
            n1, n2 = i + 1, n - i - 1
            x = sv[i]
            sum1 += x; sum2 -= x
            sumsq1 += x * x; sumsq2 -= x * x
            om1, om2 = mean1, mean2
            mean1, mean2 = sum1 / n1, sum2 / n2
            varsq1 += (x - om1) * (x - mean1)
            varsq2 -= (x - om2) * (x - mean2)
            var1 = 0 if i == 0 else varsq1 / (n1 - 1)
            var2 = 0 if i == n - 2 else varsq2 / (n2 - 1)
            if n == 2:
                continue  # C computes 0/0 = NaN: never wins
            sd = math.sqrt(((n1 - 1) * var1 + (n2 - 1) * var2) / (n - 2))
            prof = math.inf if sd == 0 else (
                -n * math.log(sd)
                - ((sumsq1 - 2 * mean1 * sum1 + n1 * mean1 ** 2)
                   + (sumsq2 - 2 * mean2 * sum2 + n2 * mean2 ** 2))
                / 2.0 / sd / sd)
            if prof > best:
                best, dim = prof, n1
        x = sv[n - 1]
        sum1 += x
        om1 = mean1
        mean1 = sum1 / n
        sumsq1 += x * x
        varsq1 += (x - om1) * (x - mean1)
        sd = math.sqrt(varsq1 / (n - 1))
        prof = math.inf if sd == 0 else (
            -n * math.log(sd)
            - (sumsq1 - 2 * mean1 * sum1 + n * mean1 ** 2) / 2.0 / sd / sd)
        if prof > best:
            dim = n
        return dim

    rng = np.random.default_rng(11)
    for _ in range(40):
        n = int(rng.integers(2, 15))
        sv = np.sort(rng.random(n) * 10)[::-1]
        assert dim_select(sv) == ref(list(sv)), sv
    assert dim_select([10, 9.5, 9, 1, 0.9, 1.1, 0.95, 1.05]) == 3
    assert dim_select([3.0]) == 1
