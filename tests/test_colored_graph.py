"""Colored-graph writer/reader (fsm.c:95,124) and the maximal-cliques
file writer — round trips."""

import gzip

import pyarrow as pa
import ray.data

from igraph_ray.algorithms.cliques import (maximal_cliques,
                                           write_maximal_cliques_file)
from igraph_ray.graph import Graph
from igraph_ray.sources.velist import (read_colored_graph,
                                       write_colored_graph)


def _edges():
    return ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 3], pa.int64()),
        "ecolor": pa.array([5, 6, 0], pa.int64()),
        "etime": pa.array([1, 2, 3], pa.int64())}))


def test_plain_roundtrip(tmp_path):
    p = str(tmp_path / "g.velist")
    write_colored_graph(4, _edges(), p, vcolors=[9, 8, 7, 6],
                        ecolors_col="ecolor", etimes_col="etime")
    txt = open(p).read()
    assert txt.splitlines()[0] == "v 0 9"
    assert "e 0 1 5 1" in txt
    edges, verts = read_colored_graph(p, has_vcolors=True,
                                      has_ecolors=True, has_etimes=True)
    ed = edges.to_pandas().sort_values(["src", "dst"])
    assert ed[["src", "dst", "ecolor", "etime"]].values.tolist() == \
        [[0, 1, 5, 1], [1, 2, 6, 2], [2, 3, 0, 3]]
    vd = verts.to_pandas().sort_values("vertex")
    assert vd["vcolor"].tolist() == [9, 8, 7, 6]


def test_gz_roundtrip(tmp_path):
    p = str(tmp_path / "g.velist.gz")
    write_colored_graph(4, _edges(), p, gz=True)
    assert gzip.open(p, "rt").readline() == "v 0\n"
    edges, _ = read_colored_graph(p, gz=True)
    assert edges.count() == 3


def test_cliques_file(tmp_path):
    # triangle + pendant: maximal cliques {0,1,2} and {2,3}
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 0, 2], pa.int64()),
        "dst": pa.array([1, 2, 2, 3], pa.int64())})), n=4)
    cl = maximal_cliques(g)
    p = str(tmp_path / "cl.txt")
    write_maximal_cliques_file(cl, p)
    assert open(p).read().splitlines() == ["0 1 2", "2 3"]
