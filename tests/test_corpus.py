import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray import Graph, pagerank
from igraph_ray.sources.corpus import (
    content_sha256,
    extract_edges,
    generate_corpus,
    graph_from_corpus,
    repo_name,
)
from tests import fixtures as fx
from tests.oracles import pagerank_ref


def test_extractor_recovers_planted_edges():
    n, src, dst = fx.powerlaw(n=120, m=500, seed=17)
    corpus_t, manifest = generate_corpus(src, dst, n_repos=n, seed=17)
    corpus = ray.data.from_arrow(corpus_t)
    edges, vocab = extract_edges(corpus, num_partitions=4)
    got = sorted((r["src"], r["dst"]) for r in edges.take_all())
    # vocabulary is lexicographic == id order by construction of repo_name
    want = sorted((int(s), int(t)) for s, t in zip(src, dst))
    assert got == want
    v = {r["repo"]: r["vertex"] for r in vocab.take_all()}
    assert len(v) == n
    assert v[repo_name(0)] == 0 and v[repo_name(n - 1)] == n - 1


def test_sha256_per_row_invariant():
    n, src, dst = fx.er_digraph(n=40, m=120, seed=2)
    corpus_t, manifest = generate_corpus(src, dst, n_repos=n, seed=2)
    recomputed = content_sha256(ray.data.from_arrow(corpus_t))
    got = {(r["repo"], r["path"]): r["content_sha256"] for r in recomputed.take_all()}
    want = {
        (manifest["repo"][i].as_py(), manifest["path"][i].as_py()):
        manifest["content_sha256"][i].as_py()
        for i in range(manifest.num_rows)
    }
    assert got == want


def test_corpus_to_pagerank_end_to_end():
    """The flagship path: corpus → extract → vocabulary → edges → PageRank."""
    n, src, dst = fx.powerlaw(n=100, m=400, seed=23)
    corpus_t, _ = generate_corpus(src, dst, n_repos=n, seed=23)
    g, vocab = graph_from_corpus(ray.data.from_arrow(corpus_t), num_partitions=4)
    assert g.num_vertices() == n
    res = pagerank(g, tol=1e-11, num_partitions=4)
    got = {r["vertex"]: r["pr"] for r in res.state.take_all()}
    ref = pagerank_ref(n, src, dst, fixed=res.iterations)
    gv = np.array([got[i] for i in range(n)])
    assert np.allclose(gv, ref, atol=1e-9)
