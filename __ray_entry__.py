"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in igraph_ray) calls ``ray.init()``/``ray.shutdown()``.

- ``entry()``: flagship pipeline on sf0.001 — synthesize a planted code
  corpus (the BASELINE.json input shape), extract repo→repo import edges,
  build the vocabulary, run PageRank to convergence and connected
  components, return the joined vertex-state table.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator
  (see igraph_ray/pipelines/queries.py); the driver compares both at
  sf=0.01 via DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    import numpy as np
    import pyarrow as pa
    import ray.data

    from igraph_ray import Graph, connected_components, pagerank
    from igraph_ray.context import configure
    from igraph_ray.sources.corpus import generate_corpus, graph_from_corpus
    from igraph_ray.util import hash_join

    configure()

    # planted powerlaw-ish corpus at smoke scale (deterministic, seed 42)
    rng = np.random.default_rng(42)
    n_repos, m = 300, 1500
    alpha = 1.0 / (2.3 - 1.0)
    p = np.arange(1, n_repos + 1, dtype=np.float64) ** (-alpha)
    p /= p.sum()
    src = rng.choice(n_repos, m, p=p).astype(np.int64)
    dst = rng.choice(n_repos, m, p=p).astype(np.int64)
    corpus_t, _ = generate_corpus(src, dst, n_repos=n_repos, seed=42)
    g, vocab = graph_from_corpus(ray.data.from_arrow(corpus_t), num_partitions=4)

    pr = pagerank(g, tol=1e-10, num_partitions=4).state
    cc = connected_components(g, num_partitions=4).state
    joined = hash_join(pr, cc, on="vertex", num_partitions=4)
    return joined.to_pandas().sort_values("vertex").reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from igraph_ray.context import configure
    from igraph_ray.pipelines.queries import queries as _q

    configure()
    return _q()


def oracle_sql() -> dict[str, str]:
    from igraph_ray.pipelines.queries import oracle_sql as _o

    return _o()
