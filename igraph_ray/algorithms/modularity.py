"""Modularity of a membership vector (igraph_modularity, community.c:875-941).

Per edge (each stored edge once, weight w): internal edges add 2w to their
community's e[c]; both endpoints add w to a[c]. Q = Σ_c e[c]/2m − (a[c]/2m)²
with m = Σw. Distributed as: two hash joins to attach memberships →
per-batch partial (community, e, a) sums → one small groupby → scalar
finalize (the partial+final aggregate pattern, SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.util import hash_join


def modularity(
    edges: ray.data.Dataset,
    membership: ray.data.Dataset,
    weighted: bool = False,
    num_partitions: int = 8,
) -> float:
    """membership: Dataset (vertex, community). Returns igraph's Q."""

    def _ms(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"], "c_src": b["community"]})

    def _md(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "c_dst": b["community"]})

    j = hash_join(edges, membership.map_batches(_ms, batch_format="pyarrow", batch_size=None),
                  on="src", num_partitions=num_partitions)
    j = hash_join(j, membership.map_batches(_md, batch_format="pyarrow", batch_size=None),
                  on="dst", num_partitions=num_partitions)

    def _partial(b: pa.Table) -> pa.Table:
        cs = b["c_src"].to_numpy(zero_copy_only=False)
        cd = b["c_dst"].to_numpy(zero_copy_only=False)
        w = (
            b["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
            if weighted and "weight" in b.column_names
            else np.ones(len(cs))
        )
        comm = np.concatenate([cs, cd, cs[cs == cd]])
        val_a = np.concatenate([w, w, np.zeros((cs == cd).sum())])
        val_e = np.concatenate([np.zeros(2 * len(cs)), 2.0 * w[cs == cd]])
        uniq, inv = np.unique(comm, return_inverse=True)
        return pa.table(
            {
                "community": pa.array(uniq, pa.int64()),
                "e": pa.array(np.bincount(inv, weights=val_e), pa.float64()),
                "a": pa.array(np.bincount(inv, weights=val_a), pa.float64()),
                "m": pa.array(
                    np.where(np.arange(len(uniq)) == 0, w.sum(), 0.0), pa.float64()
                ),
            }
        )

    g = (
        j.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("community")
        .sum(["e", "a", "m"])
        .materialize()
    )

    # two distributed scalar passes; community count can be huge, so the
    # per-community table never reaches the driver
    from igraph_ray.superstep import _aggregate

    m = _aggregate(g, ["sum(m)"])["sum(m)"]
    if m <= 0:
        return 0.0

    def _qpart(b: pa.Table) -> pa.Table:
        e = b["sum(e)"].to_numpy(zero_copy_only=False)
        a = b["sum(a)"].to_numpy(zero_copy_only=False)
        q = e / (2 * m) - (a / (2 * m)) ** 2
        return pa.table({"q": pa.array(q, pa.float64())})

    qds = g.map_batches(_qpart, batch_format="pyarrow", batch_size=None).materialize()
    return _aggregate(qds, ["q"])["q"]
