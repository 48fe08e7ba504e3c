"""GraphML + GML round-trip tests (foreign-graphml.c / foreign.c:1054
semantics: typed attributes, defaults, first-appearance id order)."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.sources import gml, graphml

GRAPHML_FIXTURE = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <key id="d0" for="node" attr.name="color" attr.type="string">
    <default>yellow</default>
  </key>
  <key id="d1" for="edge" attr.name="weight" attr.type="double"/>
  <key id="d2" for="node" attr.name="level" attr.type="int"/>
  <key id="d3" for="node" attr.name="ok" attr.type="boolean"/>
  <graph id="G" edgedefault="undirected">
    <node id="a"><data key="d0">green</data><data key="d2">7</data>
      <data key="d3">true</data></node>
    <node id="b"><data key="d3">false</data></node>
    <node id="c"/>
    <edge source="a" target="b"><data key="d1">1.5</data></edge>
    <edge source="b" target="c"/>
    <edge source="c" target="a"><data key="d1">-2.25</data></edge>
  </graph>
</graphml>
"""


def test_graphml_read(ray_session, tmp_path):
    p = tmp_path / "g.graphml"
    p.write_text(GRAPHML_FIXTURE)
    g, verts = graphml.read_graphml(str(p))
    assert g.attrs["directed"] is False
    vt = verts.sort("vertex").to_pandas()
    # first-appearance dense ids
    assert list(vt["name"]) == ["a", "b", "c"]
    # declared default fills missing node attrs
    assert list(vt["color"]) == ["green", "yellow", "yellow"]
    assert vt["level"][0] == 7
    assert list(vt["ok"]) == [True, False, None]
    et = g.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(zip(et["src"], et["dst"])) == [(0, 1), (1, 2), (2, 0)]
    w = g.edges.to_pandas()["weight"]
    assert w[0] == 1.5 and w[2] == -2.25 and np.isnan(w[1]) or w[1] is None


def test_graphml_roundtrip(ray_session, tmp_path):
    edges = pa.table({
        "src": pa.array([0, 1, 2, 3], pa.int64()),
        "dst": pa.array([1, 2, 3, 0], pa.int64()),
        "weight": pa.array([0.5, 1.5, 2.5, 3.5], pa.float64()),
        "kind": pa.array(["x", "y", "x", "z"], pa.string()),
    })
    verts = pa.table({
        "vertex": pa.array([0, 1, 2, 3], pa.int64()),
        "name": pa.array(["n0", "n1", "n2", "n3"], pa.string()),
        "score": pa.array([10, 20, 30, 40], pa.int64()),
        "flag": pa.array([True, False, True, False], pa.bool_()),
    })
    g = Graph(ray.data.from_arrow(edges), n=4, weighted=True,
              attrs={"directed": True})
    p = str(tmp_path / "rt.graphml")
    graphml.write_graphml(g, p, vertices=ray.data.from_arrow(verts))
    g2, v2 = graphml.read_graphml(p)
    assert g2.attrs["directed"] is True
    e2 = g2.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    e1 = edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(e2["src"]) == list(e1["src"])
    assert list(e2["dst"]) == list(e1["dst"])
    assert list(e2["weight"]) == list(e1["weight"])
    assert list(e2["kind"]) == list(e1["kind"])
    v2t = v2.sort("vertex").to_pandas()
    assert list(v2t["score"]) == [10, 20, 30, 40]
    assert list(v2t["flag"]) == [True, False, True, False]


def test_graphml_dir_parallel(ray_session, tmp_path):
    for i in range(3):
        g = Graph.from_numpy(np.array([0, 1]), np.array([1, 2]), n=3)
        graphml.write_graphml(g, str(tmp_path / f"f{i}.graphml"))
    paths = sorted(str(tmp_path / f"f{i}.graphml") for i in range(3))
    ds = graphml.read_graphml_dir(paths)
    df = ds.to_pandas()
    assert len(df) == 6
    assert set(df["file"]) == set(paths)


GML_FIXTURE = """Creator "test"
Version 1
graph
[
  directed 1
  node
  [
    id 5
    label "five"
    score 1.25
  ]
  node
  [
    id 9
    label "nine"
  ]
  node
  [
    id 2
  ]
  edge
  [
    source 5
    target 9
    weight 3.5
  ]
  edge
  [
    source 9
    target 2
  ]
]
"""


def test_gml_read(ray_session, tmp_path):
    p = tmp_path / "g.gml"
    p.write_text(GML_FIXTURE)
    g, verts = gml.read_gml(str(p))
    assert g.attrs["directed"] is True
    assert g.attrs["Creator"] == "test"
    vt = verts.sort("vertex").to_pandas()
    assert list(vt["gml_id"]) == [5, 9, 2]  # first-appearance order
    assert list(vt["label"]) == ["five", "nine", None]
    assert vt["score"][0] == 1.25
    et = g.edges.to_pandas()
    assert list(zip(et["src"], et["dst"])) == [(0, 1), (1, 2)]
    assert et["weight"][0] == 3.5


def test_gml_roundtrip(ray_session, tmp_path):
    edges = pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64()),
        "weight": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    verts = pa.table({
        "vertex": pa.array([0, 1, 2], pa.int64()),
        "label": pa.array(['say "hi"', "b\\c", "plain"], pa.string()),
        "rank": pa.array([3, 1, 2], pa.int64()),
    })
    g = Graph(ray.data.from_arrow(edges), n=3, weighted=True,
              attrs={"directed": False})
    p = str(tmp_path / "rt.gml")
    gml.write_gml(g, p, vertices=ray.data.from_arrow(verts))
    g2, v2 = gml.read_gml(p)
    assert g2.attrs["directed"] is False
    e2 = g2.edges.to_pandas()
    assert list(e2["src"]) == [0, 1, 2]
    assert list(e2["dst"]) == [1, 2, 0]
    assert list(e2["weight"]) == [1.0, 2.0, 3.0]
    v2t = v2.sort("vertex").to_pandas()
    assert list(v2t["label"]) == ['say "hi"', "b\\c", "plain"]
    assert list(v2t["rank"]) == [3, 1, 2]


def test_gml_int_float_promotion(ray_session, tmp_path):
    p = tmp_path / "m.gml"
    p.write_text("""graph [ directed 0
      node [ id 0 val 1 ]
      node [ id 1 val 2.5 ]
      edge [ source 0 target 1 ] ]""")
    _g, verts = gml.read_gml(str(p))
    vt = verts.sort("vertex").to_pandas()
    assert list(vt["val"]) == [1.0, 2.5]


PAJEK_FIXTURE = """*Vertices 4
1 "alpha"
2 "beta"
3 "gamma"
4 "delta"
*Arcs
1 2 2.5
2 3
4 1 7
"""


def test_pajek_read(ray_session, tmp_path):
    from igraph_ray.sources import pajek_dimacs as pd_

    p = tmp_path / "g.net"
    p.write_text(PAJEK_FIXTURE)
    g, verts = pd_.read_pajek(str(p))
    assert g.attrs["directed"] is True
    vt = verts.sort("vertex").to_pandas()
    assert list(vt["name"]) == ["alpha", "beta", "gamma", "delta"]
    et = g.edges.to_pandas()
    assert list(zip(et["src"], et["dst"])) == [(0, 1), (1, 2), (3, 0)]
    assert list(et["weight"]) == [2.5, 1.0, 7.0]


def test_pajek_roundtrip(ray_session, tmp_path):
    import ray.data

    from igraph_ray.sources import pajek_dimacs as pd_

    edges = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                      "dst": pa.array([1, 2, 0], pa.int64()),
                      "weight": pa.array([1.5, 2.0, 3.25], pa.float64())})
    verts = pa.table({"vertex": pa.array([0, 1, 2], pa.int64()),
                      "name": pa.array(['a "q"', "b", "c"], pa.string())})
    g = Graph(ray.data.from_arrow(edges), n=3, weighted=True,
              attrs={"directed": False})
    p = str(tmp_path / "rt.net")
    pd_.write_pajek(g, p, vertices=ray.data.from_arrow(verts))
    g2, v2 = pd_.read_pajek(p)
    assert g2.attrs["directed"] is False
    e2 = g2.edges.to_pandas()
    assert list(zip(e2["src"], e2["dst"])) == [(0, 1), (1, 2), (2, 0)]
    assert list(e2["weight"]) == [1.5, 2.0, 3.25]
    assert list(v2.sort("vertex").to_pandas()["name"]) == ['a "q"', "b", "c"]


def test_dimacs_roundtrip_and_flow(ray_session, tmp_path):
    import ray.data

    from igraph_ray.algorithms.flow import maxflow
    from igraph_ray.sources import pajek_dimacs as pd_

    arcs = pa.table({"src": pa.array([0, 0, 1, 2], pa.int64()),
                     "dst": pa.array([1, 2, 3, 3], pa.int64()),
                     "capacity": pa.array([3.0, 2.0, 3.0, 2.0], pa.float64())})
    p = str(tmp_path / "g.dimacs")
    pd_.write_dimacs(ray.data.from_arrow(arcs), source=0, target=3, path=p)
    rd, s, t, n, m = pd_.read_dimacs(p)
    assert (s, t, n, m) == (0, 3, 4, 4)
    df = rd.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(df["capacity"]) == [3.0, 2.0, 3.0, 2.0]
    res = maxflow(rd, s, t, n=n, num_partitions=2)
    assert res.value == 5.0


# ------------------------------------------------------- DL / LGL etc --

DL_EDGELIST = """DL N=5
FORMAT = EDGELIST1
DATA:
1 2 3.0
2 3
3 1 0.5
"""

DL_FULLMATRIX = """dl n=3
data:
0 1 1
1 0 0
0 0 1
"""

DL_NODELIST = """DL N=4
FORMAT = NODELIST1
DATA:
1 2 3
2 4
"""


def test_dl_edgelist(ray_session, tmp_path):
    from igraph_ray.sources.dl_lgl import read_dl

    p = tmp_path / "a.dl"
    p.write_text(DL_EDGELIST)
    g, verts = read_dl(str(p))
    assert g.num_vertices() == 5 and g.attrs["directed"] is True
    et = g.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(zip(et["src"], et["dst"])) == [(0, 1), (1, 2), (2, 0)]
    assert et["weight"].tolist() == [3.0, 1.0, 0.5]


def test_dl_fullmatrix_and_nodelist(ray_session, tmp_path):
    from igraph_ray.sources.dl_lgl import read_dl

    p = tmp_path / "m.dl"
    p.write_text(DL_FULLMATRIX)
    g, _ = read_dl(str(p))
    et = g.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(zip(et["src"], et["dst"])) == [(0, 1), (0, 2), (1, 0), (2, 2)]

    p2 = tmp_path / "n.dl"
    p2.write_text(DL_NODELIST)
    g2, _ = read_dl(str(p2))
    et2 = g2.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(zip(et2["src"], et2["dst"])) == [(0, 1), (0, 2), (1, 3)]


def test_dl_roundtrip(ray_session, tmp_path):
    from igraph_ray.sources.dl_lgl import read_dl, write_dl

    edges = pa.table({
        "src": pa.array([0, 1, 2, 3], pa.int64()),
        "dst": pa.array([1, 2, 3, 0], pa.int64()),
        "weight": pa.array([0.5, 1.5, 2.5, 3.5], pa.float64()),
    })
    g = Graph(ray.data.from_arrow(edges), n=4, weighted=True,
              attrs={"directed": True})
    p = tmp_path / "rt.dl"
    write_dl(g, str(p))
    g2, _ = read_dl(str(p))
    et = g2.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(zip(et["src"], et["dst"])) == [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert et["weight"].tolist() == [0.5, 1.5, 2.5, 3.5]


def test_lgl_roundtrip(ray_session, tmp_path):
    from igraph_ray.sources.dl_lgl import read_lgl, write_lgl

    src = """# n0
n1 1.5
n2
# n2
n3 2.5
"""
    p = tmp_path / "a.lgl"
    p.write_text(src)
    g, verts = read_lgl(str(p))
    assert g.attrs["directed"] is False
    vt = verts.sort("vertex").to_pandas()
    assert list(vt["name"]) == ["n0", "n1", "n2", "n3"]
    et = g.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(zip(et["src"], et["dst"])) == [(0, 1), (0, 2), (2, 3)]

    p2 = tmp_path / "b.lgl"
    write_lgl(g, str(p2), names={i: n for i, n in enumerate(vt["name"])})
    g2, verts2 = read_lgl(str(p2))
    et2 = g2.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    # name-order may permute ids; compare by name pairs
    nm = dict(zip(verts2.to_pandas()["vertex"], verts2.to_pandas()["name"]))
    pairs = sorted((nm[s], nm[d]) for s, d in zip(et2["src"], et2["dst"]))
    assert pairs == [("n0", "n1"), ("n0", "n2"), ("n2", "n3")]


def test_lgl_isolates(ray_session, tmp_path):
    from igraph_ray.sources.dl_lgl import read_lgl, write_lgl

    edges = pa.table({"src": pa.array([0], pa.int64()),
                      "dst": pa.array([1], pa.int64())})
    g = Graph(ray.data.from_arrow(edges), n=3, attrs={"directed": False})
    p = tmp_path / "iso.lgl"
    write_lgl(g, str(p))
    g2, verts2 = read_lgl(str(p))
    assert g2.num_vertices() == 3  # isolate '2' written as bare '# 2'


def test_leda_roundtrip(ray_session, tmp_path):
    from igraph_ray.sources.dl_lgl import read_leda, write_leda

    edges = pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64()),
        "weight": pa.array([1.25, -2.0, 3.0], pa.float64()),
    })
    g = Graph(ray.data.from_arrow(edges), n=4, weighted=True,
              attrs={"directed": True})
    p = tmp_path / "g.leda"
    write_leda(g, str(p))
    txt = p.read_text()
    assert txt.startswith("LEDA.GRAPH\nvoid\nfloat\n-1\n")
    g2 = read_leda(str(p))
    assert g2.num_vertices() == 4 and g2.attrs["directed"] is True
    et = g2.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(zip(et["src"], et["dst"])) == [(0, 1), (1, 2), (2, 0)]
    assert et["weight"].tolist() == [1.25, -2.0, 3.0]


def test_dot_roundtrip(ray_session, tmp_path):
    from igraph_ray.sources.dl_lgl import read_dot, write_dot

    edges = pa.table({"src": pa.array([0, 1, 4], pa.int64()),
                      "dst": pa.array([1, 2, 0], pa.int64())})
    g = Graph(ray.data.from_arrow(edges), n=5, attrs={"directed": True})
    p = tmp_path / "g.dot"
    write_dot(g, str(p))
    assert "digraph {" in p.read_text()
    g2 = read_dot(str(p))
    assert g2.num_vertices() == 5 and g2.attrs["directed"] is True
    et = g2.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(zip(et["src"], et["dst"])) == [(0, 1), (1, 2), (4, 0)]

    g.attrs["directed"] = False
    p2 = tmp_path / "u.dot"
    write_dot(g, str(p2))
    g3 = read_dot(str(p2))
    assert g3.attrs["directed"] is False and g3.num_edges() == 3


def test_graphdb_roundtrip(ray_session, tmp_path):
    """igraph_read_graph_graphdb (foreign.c:893): 16-bit LE words,
    node count then per-node out-lists; truncated files error."""
    import pyarrow as pa
    import ray.data
    from igraph_ray.sources.graphdb import read_graphdb, write_graphdb

    src = [0, 0, 2, 3, 3, 3]
    dst = [1, 2, 0, 1, 2, 3]
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    p = str(tmp_path / "g.graphdb")
    write_graphdb(ray.data.from_arrow(t), 5, p)

    # wire format: n=5, then per-node [len, targets...] incl. empty lists
    words = np.fromfile(p, dtype="<u2").tolist()
    assert words == [5, 2, 1, 2, 0, 1, 0, 3, 1, 2, 3, 0]

    ds, n = read_graphdb(p)
    assert n == 5
    got = sorted((r["src"], r["dst"]) for r in ds.take_all())
    assert got == sorted(zip(src, dst))

    # truncation is an error, like the reference's EFILE path
    np.asarray(words[:-2], dtype="<u2").tofile(p)
    with pytest.raises(ValueError):
        read_graphdb(p)
