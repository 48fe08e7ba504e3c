"""disjoint_union / complementer / rewire / dyad_census + text-format
readers (foreign.c:78-121, operators.c:38/1038,
structural_properties.c:1734, motifs.c:848)."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.ops import relational as rel
from igraph_ray.sources.edgelist import read_edgelist, read_ncol, write_edgelist


def _ds(src, dst):
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def test_disjoint_union():
    a = _ds([0, 1], [1, 2])  # n_a = 3
    b = _ds([0, 1], [1, 0])  # n_b = 2
    out = rel.disjoint_union(a, 3, b, 2).to_pandas().sort_values(["src", "dst"]).values.tolist()
    assert out == [[0, 1], [1, 2], [3, 4], [4, 3]]


def test_complementer_small():
    n = 4
    edges = _ds([0, 1, 2], [1, 2, 0])
    out = rel.complementer(edges, n, num_partitions=3).to_pandas()
    got = set(map(tuple, out.values.tolist()))
    expect = {
        (s, d) for s in range(n) for d in range(n) if s != d
    } - {(0, 1), (1, 2), (2, 0)}
    assert got == expect


def test_complementer_with_loops_flag():
    n = 3
    edges = _ds([0], [1])
    out = rel.complementer(edges, n, loops=True, num_partitions=2).to_pandas()
    got = set(map(tuple, out.values.tolist()))
    expect = {(s, d) for s in range(n) for d in range(n)} - {(0, 1)}
    assert got == expect


def test_rewire_preserves_degrees():
    rng = np.random.default_rng(8)
    n = 40
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # rewire assumes a simple graph for the no-multi-edge rule
    pairs = sorted(set(zip(src.tolist(), dst.tolist())))
    src = np.array([p[0] for p in pairs]); dst = np.array([p[1] for p in pairs])
    before = _ds(src, dst)
    after = rel.rewire(before, seed=7).to_pandas()
    assert len(after) == len(src)
    outd_b = np.bincount(src, minlength=n)
    outd_a = np.bincount(after["src"].values, minlength=n)
    ind_b = np.bincount(dst, minlength=n)
    ind_a = np.bincount(after["dst"].values, minlength=n)
    assert (outd_b == outd_a).all()
    assert (ind_b == ind_a).all()
    # no loops, no duplicates introduced
    assert (after["src"].values != after["dst"].values).all()
    assert len(set(zip(after["src"].tolist(), after["dst"].tolist()))) == len(after)
    # it actually rewired something
    assert set(zip(after["src"].tolist(), after["dst"].tolist())) != set(pairs)


def test_dyad_census():
    # 0<->1 mutual, 0->2 asym, n=4 => null = 6 - 1 - 1 = 4
    t = rel.dyad_census(_ds([0, 1, 0], [1, 0, 2]), n=4)
    assert t["mut"][0].as_py() == 1
    assert t["asym"][0].as_py() == 1
    assert t["null"][0].as_py() == 4


def test_edgelist_roundtrip(tmp_path):
    p = os.path.join(tmp_path, "g.edges")
    src = np.array([0, 5, 2, 9]); dst = np.array([5, 2, 9, 0])
    write_edgelist(_ds(src, dst), p)
    back = read_edgelist(p).to_pandas().sort_values(["src", "dst"]).values.tolist()
    assert [tuple(r) for r in back] == sorted(zip(src.tolist(), dst.tolist()))


def test_edgelist_pairs_spanning_lines(tmp_path):
    p = os.path.join(tmp_path, "g.edges")
    with open(p, "w") as f:
        f.write("0 1 2\n3 4 5\n")  # pairs (0,1) (2,3) (4,5) across lines
    back = read_edgelist(p).to_pandas().values.tolist()
    assert sorted(map(tuple, back)) == [(0, 1), (2, 3), (4, 5)]


def test_ncol_reader(tmp_path):
    p = os.path.join(tmp_path, "g.ncol")
    with open(p, "w") as f:
        f.write("alice bob 2.5\nbob carol 1.0\ncarol alice 3.0\n")
    edges, vocab = read_ncol(p)
    e = edges.to_pandas()
    v = {r["name"]: r["vertex"] for r in vocab.take_all()}
    assert v == {"alice": 0, "bob": 1, "carol": 2}
    assert e["weight"].tolist() == [2.5, 1.0, 3.0]
    assert e["src"].tolist() == [0, 1, 2]
    assert e["dst"].tolist() == [1, 2, 0]


def test_linegraph():
    """Brute-force directed line-graph check (head(e1)=tail(e2) rule,
    edge ids in canonical (src,dst) order)."""
    src = [0, 0, 1, 2, 3]
    dst = [1, 2, 2, 3, 0]
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}))
    got = sorted((r["src"], r["dst"]) for r in
                 rel.linegraph(edges, num_partitions=2).take_all())
    ordered = sorted(zip(src, dst))
    want = sorted(
        (i, j)
        for i, (a, b) in enumerate(ordered)
        for j, (c, d) in enumerate(ordered)
        if b == c
    )
    assert got == want
