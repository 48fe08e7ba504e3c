"""Linear sum assignment (igraph_solve_lsap, lsap.c semantics):
brute-force optimality on small matrices, LP-duality certificate,
permutation validity, determinism."""

from __future__ import annotations

import itertools

import numpy as np

from igraph_ray.algorithms.lsap import solve_lsap


def _total(t):
    return sum(t["cost_e6"].to_pylist())


def test_matches_brute_force():
    rng = np.random.default_rng(4)
    for trial in range(4):
        n = 6
        c = rng.integers(0, 50, (n, n)).astype(float)
        t = solve_lsap(c)
        best = min(sum(c[i, p[i]] for i in range(n))
                   for p in itertools.permutations(range(n)))
        assert _total(t) == int(round(best * 1e6)), trial
        cols = t["col"].to_pylist()
        assert sorted(cols) == list(range(n))


def test_duality_certificate():
    rng = np.random.default_rng(9)
    n = 12
    c = rng.uniform(0, 10, (n, n))
    t = solve_lsap(c)
    rows = t.to_pylist()
    u = np.array([r["u_e6"] for r in rows]) / 1e6
    vcol = {r["col"]: r["v_e6"] / 1e6 for r in rows}
    v = np.array([vcol[j] for j in range(n)])
    # feasibility u_i + v_j <= c_ij (tolerance = e6 quantization)
    assert (u[:, None] + v[None, :] <= c + 3e-6).all()
    # strong duality: sum of potentials equals assignment cost
    assert abs(u.sum() + v.sum() - _total(t) / 1e6) < 1e-4


def test_identity_and_determinism():
    c = np.ones((5, 5)) * 9
    np.fill_diagonal(c, 1.0)
    t = solve_lsap(c)
    assert t["col"].to_pylist() == [0, 1, 2, 3, 4]
    assert solve_lsap(c).equals(t)
