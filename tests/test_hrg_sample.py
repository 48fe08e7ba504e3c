"""hrg_sample / hrg_dendrogram (igraph_hrg.cc counterparts) on a tiny
two-clique fixture whose greedy fit is known."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.algorithms.hrg import hrg_dendrogram, hrg_fit, hrg_sample
from igraph_ray.graph import Graph


def _two_cliques(k=4):
    edges = ([(i, j) for i in range(k) for j in range(i + 1, k)]
             + [(k + i, k + j) for i in range(k) for j in range(i + 1, k)]
             + [(0, k)])
    n = 2 * k
    return Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())})), n=n), n


def test_dendrogram_export_shape():
    g, n = _two_cliques()
    res = hrg_fit(g, n=n)
    t = hrg_dendrogram(res)
    # binary tree over n leaves: n-1 internal nodes x 2 child arcs
    assert t.num_rows == 2 * (n - 1)
    par = t["parent"].to_numpy(zero_copy_only=False)
    ch = t["child"].to_numpy(zero_copy_only=False)
    assert set(par) <= set(range(n, 2 * n - 1))
    # every node except the root appears exactly once as a child
    assert sorted(ch.tolist()) == list(range(2 * n - 2))


def test_sample_deterministic_and_rate():
    g, n = _two_cliques()
    res = hrg_fit(g, n=n)
    a = hrg_sample(res, n).to_pandas().sort_values(["src", "dst"])
    b = hrg_sample(res, n).to_pandas().sort_values(["src", "dst"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # cliques fit with p=1 internal nodes; their pairs must ALL appear
    d = res.dendrogram.to_pandas()
    sure_pairs = int(d[d.prob_e9 == 10 ** 9].pairs.sum())
    got = set(map(tuple, a[["src", "dst"]].values))
    assert len(got) >= sure_pairs
    assert all(s < t for s, t in got)


def test_sample_respects_zero_prob():
    # an empty graph fits all-zero probabilities -> empty sample
    g = Graph(ray.data.from_arrow(pa.table({
        "src": pa.array([0, 2], pa.int64()),
        "dst": pa.array([1, 3], pa.int64())})), n=4)
    res = hrg_fit(g, n=4)
    samp = hrg_sample(res, 4).to_pandas()
    d = res.dendrogram.to_pandas()
    zero_nodes = d[d.prob_e9 == 0]
    assert len(zero_nodes) >= 1
    # pairs under a p=0 node never appear; p=1 pairs always do
    assert {(0, 1), (2, 3)} <= set(map(tuple, samp[["src", "dst"]].values))
    assert np.all(samp.groupby(["src", "dst"]).size() == 1)
