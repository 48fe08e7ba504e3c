"""Adaptive voter model (dynamic.c:1506) — determinism, conservation
and dynamics invariants of the guarded simulation."""

import numpy as np
import pytest

from igraph_ray.algorithms.avm import avm_stream


def _circulant(n, ds=(1, 5)):
    edges = set()
    for i in range(n):
        for d in ds:
            a, b = i, (i + d) % n
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def test_determinism_and_shape():
    e = _circulant(24)
    a = avm_stream(e, 24, steps=8).to_pandas()
    b = avm_stream(e, 24, steps=8).to_pandas()
    assert a.equals(b)
    # every timestep carries the full state
    for t in range(9):
        st = a[a.t == t]
        assert (st.kind == 1).sum() == 24
        assert (st.kind == 0).sum() == len(e)  # rewiring conserves |E|


def test_opinions_binary_and_edges_simple():
    e = _circulant(24)
    df = avm_stream(e, 24, steps=12).to_pandas()
    ops = df[df.kind == 1]["b"].unique()
    assert set(ops) <= {1, 2}
    for t in range(13):
        ed = df[(df.t == t) & (df.kind == 0)]
        assert (ed.a < ed.b).all()  # sorted pairs, no self loops
        assert not ed.duplicated(["a", "b"]).any()  # simple graph


def test_adoption_only_keeps_edges_fixed():
    e = _circulant(24)
    df = avm_stream(e, 24, steps=10, rewiring_p=0.0).to_pandas()
    e0 = set(map(tuple, df[(df.t == 0) & (df.kind == 0)][["a", "b"]].values))
    eT = set(map(tuple, df[(df.t == 10) & (df.kind == 0)][["a", "b"]].values))
    assert e0 == eT


def test_rewiring_only_keeps_opinions_fixed():
    e = _circulant(24)
    df = avm_stream(e, 24, steps=10, rewiring_p=1.0).to_pandas()
    o0 = df[(df.t == 0) & (df.kind == 1)].sort_values("a")["b"].values
    oT = df[(df.t == 10) & (df.kind == 1)].sort_values("a")["b"].values
    assert np.array_equal(o0, oT)


def test_size_guard():
    with pytest.raises(NotImplementedError):
        avm_stream([(0, 1)], 1 << 21)
