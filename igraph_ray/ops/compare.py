"""Community-structure comparison measures
(igraph_split_join_distance / igraph_compare_communities family,
/root/reference/interfaces/functions.def:1365/1255). Exact-integer
measures only, so the driver hash gate applies.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.util import hash_join


def split_join_distance(
    p1: ray.data.Dataset,
    p2: ray.data.Dataset,
    label1: str = "label",
    label2: str = "label",
    num_partitions: int = 8,
) -> pa.Table:
    """van Dongen split-join distance between two partitions of the same
    vertex set: ``d = 2n − Σ_a max_b |a∩b| − Σ_b max_a |a∩b|`` (also
    reported per side, matching igraph's distance12/distance21 pair).

    Distributed shape: one (vertex)-join of the two membership tables,
    per-batch pre-combined joint counts, one groupby over (l1, l2) —
    the contingency table is tiny next to the vertex set — then two
    grouped maxima. Returns a 1-row Arrow table
    (n, dist12, dist21, split_join) of exact integers.
    """

    def _r1(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"],
                         "l1": pc.cast(b[label1], pa.int64())})

    def _r2(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"],
                         "l2": pc.cast(b[label2], pa.int64())})

    joined = hash_join(
        p1.map_batches(_r1, batch_format="pyarrow", batch_size=None),
        p2.map_batches(_r2, batch_format="pyarrow", batch_size=None),
        on="vertex", num_partitions=num_partitions)

    def _joint(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l1" not in b.column_names:
            return pa.table({"l1": pa.array([], pa.int64()),
                             "l2": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({"l1": b["l1"], "l2": b["l2"]})
        return (t.group_by(["l1", "l2"]).aggregate([([], "count_all")])
                .rename_columns(["l1", "l2", "c"]))

    joint = (joined.map_batches(_joint, batch_format="pyarrow",
                                batch_size=None)
             .groupby(["l1", "l2"]).sum("c").materialize())

    rows = joint.take_all()
    if not rows:
        return pa.table({"n": pa.array([0], pa.int64()),
                         "dist12": pa.array([0], pa.int64()),
                         "dist21": pa.array([0], pa.int64()),
                         "split_join": pa.array([0], pa.int64())})
    l1 = np.array([r["l1"] for r in rows], np.int64)
    l2 = np.array([r["l2"] for r in rows], np.int64)
    c = np.array([r["sum(c)"] for r in rows], np.int64)
    n = int(c.sum())
    max1: dict = {}
    max2: dict = {}
    for a, b, k in zip(l1, l2, c):
        if k > max1.get(a, 0):
            max1[int(a)] = int(k)
        if k > max2.get(b, 0):
            max2[int(b)] = int(k)
    d12 = n - sum(max1.values())
    d21 = n - sum(max2.values())
    return pa.table({"n": pa.array([n], pa.int64()),
                     "dist12": pa.array([d12], pa.int64()),
                     "dist21": pa.array([d21], pa.int64()),
                     "split_join": pa.array([d12 + d21], pa.int64())})


def rand_pair_counts(
    p1: ray.data.Dataset,
    p2: ray.data.Dataset,
    label1: str = "label",
    label2: str = "label",
    num_partitions: int = 8,
) -> pa.Table:
    """Pair-counting contingency sums behind the (adjusted) Rand index
    (igraph_compare_communities method "rand"/"adjusted_rand",
    functions.def:1255): returns exact integers
    (n, pairs = C(n,2), sum_nij2 = Σ C(n_ij,2), sum_a2 = Σ C(a_i,2),
    sum_b2 = Σ C(b_j,2)); Rand = 1 + (2·sum_nij2 − sum_a2 − sum_b2) /
    pairs reconstructs the float measure exactly.
    """

    def _r1(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"],
                         "l1": pc.cast(b[label1], pa.int64())})

    def _r2(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"],
                         "l2": pc.cast(b[label2], pa.int64())})

    joined = hash_join(
        p1.map_batches(_r1, batch_format="pyarrow", batch_size=None),
        p2.map_batches(_r2, batch_format="pyarrow", batch_size=None),
        on="vertex", num_partitions=num_partitions)

    def _joint(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l1" not in b.column_names:
            return pa.table({"l1": pa.array([], pa.int64()),
                             "l2": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({"l1": b["l1"], "l2": b["l2"]})
        return (t.group_by(["l1", "l2"]).aggregate([([], "count_all")])
                .rename_columns(["l1", "l2", "c"]))

    joint = (joined.map_batches(_joint, batch_format="pyarrow",
                                batch_size=None)
             .groupby(["l1", "l2"]).sum("c").materialize())
    rows = joint.take_all()
    l1 = np.array([r["l1"] for r in rows], np.int64)
    l2 = np.array([r["l2"] for r in rows], np.int64)
    c = np.array([r["sum(c)"] for r in rows], np.int64)
    n = int(c.sum())

    def _c2(x: np.ndarray) -> int:
        return int((x * (x - 1) // 2).sum())

    a = {}
    b = {}
    for x, y, k in zip(l1, l2, c):
        a[int(x)] = a.get(int(x), 0) + int(k)
        b[int(y)] = b.get(int(y), 0) + int(k)
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "pairs": pa.array([n * (n - 1) // 2], pa.int64()),
        "sum_nij2": pa.array([_c2(c)], pa.int64()),
        "sum_a2": pa.array([_c2(np.array(list(a.values()), np.int64))], pa.int64()),
        "sum_b2": pa.array([_c2(np.array(list(b.values()), np.int64))], pa.int64()),
    })
