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

    # distributed finalize: only four scalars ever reach the driver —
    # the contingency table itself is O(#label pairs) and stays in the
    # object store (all-singleton partitions make it O(|V|))
    n = joint.sum("sum(c)", ignore_nulls=True)
    if n is None or joint.count() == 0:
        return pa.table({"n": pa.array([0], pa.int64()),
                         "dist12": pa.array([0], pa.int64()),
                         "dist21": pa.array([0], pa.int64()),
                         "split_join": pa.array([0], pa.int64())})
    n = int(n)
    best1 = int(joint.groupby("l1").max("sum(c)").sum("max(sum(c))"))
    best2 = int(joint.groupby("l2").max("sum(c)").sum("max(sum(c))"))
    d12 = n - best1
    d21 = n - best2
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

    # distributed finalize: C(x,2) columns are added block-wise and only
    # the five scalar sums reach the driver — the contingency and its two
    # marginals stay in the object store
    def _choose2(col: str):
        def _f(b: pa.Table) -> pa.Table:
            x = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"c2": pa.array(x * (x - 1) // 2, pa.int64())})
        return _f

    n_raw = joint.sum("sum(c)", ignore_nulls=True)
    n = int(n_raw) if n_raw is not None and joint.count() > 0 else 0
    if n == 0:
        z = pa.array([0], pa.int64())
        return pa.table({"n": z, "pairs": z, "sum_nij2": z,
                         "sum_a2": z, "sum_b2": z})
    sum_nij2 = int(joint.map_batches(_choose2("sum(c)"),
                                     batch_format="pyarrow",
                                     batch_size=None).sum("c2"))
    marg_a = joint.groupby("l1").sum("sum(c)")
    marg_b = joint.groupby("l2").sum("sum(c)")
    sum_a2 = int(marg_a.map_batches(_choose2("sum(sum(c))"),
                                    batch_format="pyarrow",
                                    batch_size=None).sum("c2"))
    sum_b2 = int(marg_b.map_batches(_choose2("sum(sum(c))"),
                                    batch_format="pyarrow",
                                    batch_size=None).sum("c2"))
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "pairs": pa.array([n * (n - 1) // 2], pa.int64()),
        "sum_nij2": pa.array([sum_nij2], pa.int64()),
        "sum_a2": pa.array([sum_a2], pa.int64()),
        "sum_b2": pa.array([sum_b2], pa.int64()),
    })
