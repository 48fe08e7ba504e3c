"""Deterministic synchronous SIR (sir.c compartment semantics, md5
draws): brute-force replay agreement, monotone R, conservation,
determinism, no-edge and beta=0 degenerate cases."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.algorithms.sir import HEX15, sir
from igraph_ray.graph import Graph


def _g(src, dst, n):
    return Graph(ray.data.from_arrow(pa.table({
        "src": np.asarray(src, np.int64),
        "dst": np.asarray(dst, np.int64)})), n=n)


def _brute(pairs, n, beta, gamma, steps, seed_mod):
    bt = int(beta * HEX15)
    gt = int(gamma * HEX15)

    def draw(k, thr):
        return int(hashlib.md5(k.encode()).hexdigest()[:15], 16) < thr

    st = np.where(np.arange(n) % seed_mod == 0, 1, 0)
    out = [(0, int((st == 0).sum()), int((st == 1).sum()),
            int((st == 2).sum()))]
    for t in range(steps):
        new = st.copy()
        for lo, hi in pairs:
            for s_end, i_end in ((lo, hi), (hi, lo)):
                if st[s_end] == 0 and st[i_end] == 1 and draw(
                        f"{lo}:{hi}:{t}", bt):
                    new[s_end] = 1
        for v in range(n):
            if st[v] == 1 and draw(f"r:{v}:{t}", gt):
                new[v] = 2
        st = new
        out.append((t + 1, int((st == 0).sum()), int((st == 1).sum()),
                    int((st == 2).sum())))
    return out


def test_sir_matches_bruteforce(ray_session):
    rng = np.random.default_rng(6)
    n = 40
    pairs = sorted({(min(a, b), max(a, b))
                    for a, b in rng.integers(0, n, (120, 2)) if a != b})
    g = _g([p[0] for p in pairs], [p[1] for p in pairs], n)
    t = sir(g, beta=0.5, gamma=0.3, steps=5, seed_mod=7, n=n)
    got = list(zip(t["step"].to_pylist(), t["s"].to_pylist(),
                   t["i"].to_pylist(), t["r"].to_pylist()))
    assert got == _brute(pairs, n, 0.5, 0.3, 5, 7)


def test_sir_invariants(ray_session):
    rng = np.random.default_rng(8)
    n = 30
    pairs = sorted({(min(a, b), max(a, b))
                    for a, b in rng.integers(0, n, (90, 2)) if a != b})
    g = _g([p[0] for p in pairs], [p[1] for p in pairs], n)
    t = sir(g, beta=0.6, gamma=0.4, steps=6, seed_mod=5, n=n)
    s = t["s"].to_pylist()
    r = t["r"].to_pylist()
    for k in range(len(s)):
        assert s[k] + t["i"][k].as_py() + r[k] == n  # conservation
    assert all(s[k + 1] <= s[k] for k in range(len(s) - 1))  # S monotone
    assert all(r[k + 1] >= r[k] for k in range(len(r) - 1))  # R monotone


def test_sir_beta_zero_and_no_edges(ray_session):
    g = _g([0, 1], [1, 2], 5)
    t = sir(g, beta=0.0, gamma=1.0, steps=2, seed_mod=3, n=5)
    # beta=0: nobody new gets infected; gamma=1: seeds recover at step 1
    assert t["i"].to_pylist() == [2, 0, 0]
    assert t["r"].to_pylist() == [0, 2, 2]
    g2 = _g([], [], 4)
    t2 = sir(g2, beta=0.9, gamma=0.0, steps=2, seed_mod=2, n=4)
    assert t2["i"].to_pylist() == [2, 2, 2]  # isolated infecteds persist


def test_sir_deterministic(ray_session):
    g = _g([0, 1, 2, 3], [1, 2, 3, 4], 6)
    t1 = sir(g, beta=0.5, gamma=0.2, steps=4, seed_mod=2, n=6)
    t2 = sir(g, beta=0.5, gamma=0.2, steps=4, seed_mod=2, n=6)
    assert t1.equals(t2)
