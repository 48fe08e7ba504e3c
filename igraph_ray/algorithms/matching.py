"""Maximal matching via deterministic parallel greedy rounds.

Reference context: igraph's matching.c solves *maximum* bipartite
matching (push-relabel style) — inherently sequential augmentation. The
scalable engine counterpart is the classic parallel greedy MAXIMAL
matching (every edge either matched or adjacent to a matched edge — a
2-approximation of maximum): per round, an alive edge joins the
matching iff its priority is the minimum among alive edges at BOTH
endpoints; endpoints of matched edges die, and the alive edge set
shrinks geometrically (O(log m) rounds with random priorities).

Deterministic priorities: first 15 hex chars of md5("lo,hi") as int64 —
the engine-wide md5-prefix trick, so the SQL oracle replays identical
rounds and the output is a pure function of the input at any
parallelism.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.util import hash_join


def _with_prio(und: ray.data.Dataset) -> ray.data.Dataset:
    def _p(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        pr = np.array(
            [int(hashlib.md5(f"{int(a)},{int(c)}".encode()).hexdigest()[:15], 16)
             for a, c in zip(lo, hi)], dtype=np.int64)
        return pa.table({"lo": b["lo"], "hi": b["hi"], "prio": pa.array(pr)})

    return und.map_batches(_p, batch_format="pyarrow", batch_size=None)


def maximal_matching(
    und: ray.data.Dataset, num_partitions: int = 8, max_iter: int = 64
) -> ray.data.Dataset:
    """(lo, hi) matched pairs — a maximal matching of the simple
    undirected graph (``und`` columns lo < hi, one row per edge)."""
    alive = _with_prio(und).materialize()
    matched: list = []

    for _ in range(max_iter):
        if alive.count() == 0:
            break

        def _ends(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "lo" not in b.column_names:
                return pa.table({"v": pa.array([], pa.int64()),
                                 "p": pa.array([], pa.int64())})
            lo = b["lo"].to_numpy(zero_copy_only=False)
            hi = b["hi"].to_numpy(zero_copy_only=False)
            pr = b["prio"].to_numpy(zero_copy_only=False)
            t = pa.table({"v": pa.array(np.concatenate([lo, hi])),
                          "p": pa.array(np.concatenate([pr, pr]))})
            return (pa.TableGroupBy(t, "v").aggregate([("p", "min")])
                    .rename_columns(["v", "p"]))

        mins = (alive.map_batches(_ends, batch_format="pyarrow",
                                  batch_size=None)
                .groupby("v").min("p"))

        def _rm(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "v" not in b.column_names:
                return pa.table({"v": pa.array([], pa.int64()),
                                 "mp": pa.array([], pa.int64())})
            return pa.table({"v": b["v"], "mp": b["min(p)"]})

        mins = mins.map_batches(_rm, batch_format="pyarrow",
                                batch_size=None).materialize()

        j = hash_join(
            alive.map_batches(
                lambda b: pa.table({"v": b["lo"], "hi": b["hi"],
                                    "prio": b["prio"]}),
                batch_format="pyarrow", batch_size=None),
            mins, on="v", num_partitions=num_partitions)

        def _r1(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "v" not in b.column_names:
                return pa.table({"lo": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64()),
                                 "prio": pa.array([], pa.int64()),
                                 "mplo": pa.array([], pa.int64())})
            return pa.table({"lo": b["v"], "v": b["hi"],
                             "prio": b["prio"], "mplo": b["mp"]})

        j = hash_join(
            j.map_batches(_r1, batch_format="pyarrow", batch_size=None),
            mins, on="v", num_partitions=num_partitions)

        def _sel(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "lo" not in b.column_names:
                return pa.table({"lo": pa.array([], pa.int64()),
                                 "hi": pa.array([], pa.int64()),
                                 "prio": pa.array([], pa.int64()),
                                 "sel": pa.array([], pa.int64())})
            pr = b["prio"].to_numpy(zero_copy_only=False)
            sel = ((pr == b["mplo"].to_numpy(zero_copy_only=False))
                   & (pr == b["mp"].to_numpy(zero_copy_only=False)))
            return pa.table({"lo": b["lo"], "hi": b["v"], "prio": b["prio"],
                             "sel": pa.array(sel.astype(np.int64))})

        decided = j.map_batches(_sel, batch_format="pyarrow",
                                batch_size=None).materialize()
        sel = decided.filter(expr="sel == 1").materialize()
        if sel.count() == 0:
            break
        matched.append(sel.select_columns(["lo", "hi"]).materialize())

        def _mv(b: pa.Table) -> pa.Table:
            lo = b["lo"].to_numpy(zero_copy_only=False)
            hi = b["hi"].to_numpy(zero_copy_only=False)
            return pa.table({"v": pa.array(np.concatenate([lo, hi]))})

        mverts = sel.map_batches(_mv, batch_format="pyarrow",
                                 batch_size=None).materialize()
        rest = decided.filter(expr="sel == 0")
        # drop edges touching a matched vertex (two anti-joins)
        rest = hash_join(
            rest.map_batches(
                lambda b: pa.table({"v": b["lo"], "hi": b["hi"],
                                    "prio": b["prio"]}),
                batch_format="pyarrow", batch_size=None),
            mverts, on="v", num_partitions=num_partitions,
            join_type="left_anti")
        rest = hash_join(
            rest.map_batches(
                lambda b: (pa.table({"lo": b["v"], "v": b["hi"],
                                     "prio": b["prio"]})
                           if b.num_rows and "v" in b.column_names
                           else pa.table({"lo": pa.array([], pa.int64()),
                                          "v": pa.array([], pa.int64()),
                                          "prio": pa.array([], pa.int64())})),
                batch_format="pyarrow", batch_size=None),
            mverts, on="v", num_partitions=num_partitions,
            join_type="left_anti")

        def _back(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "lo" not in b.column_names:
                return pa.table({"lo": pa.array([], pa.int64()),
                                 "hi": pa.array([], pa.int64()),
                                 "prio": pa.array([], pa.int64())})
            return pa.table({"lo": b["lo"], "hi": b["v"], "prio": b["prio"]})

        alive = rest.map_batches(_back, batch_format="pyarrow",
                                 batch_size=None).materialize()

    if not matched:
        return ray.data.from_arrow(pa.table({"lo": pa.array([], pa.int64()),
                                             "hi": pa.array([], pa.int64())}))
    out = matched[0]
    for m in matched[1:]:
        out = out.union(m)
    return out


def is_matching(und: ray.data.Dataset, matching: ray.data.Dataset,
                num_partitions: int = 8) -> bool:
    """True iff ``matching`` (lo, hi rows) is a valid matching of the
    simple undirected graph ``und`` (lo < hi rows):
    every matched pair is an edge and no vertex is matched twice
    (igraph_is_matching, /root/reference/src/matching.c — the vector
    form's symmetry/validity checks, restated for the pair-table
    representation)."""
    from igraph_ray.util import hash_join

    matching = matching.materialize()
    m = matching.count()
    if m == 0:
        return True
    # every pair is an edge
    on_edges = hash_join(matching, und.map_batches(
        lambda b: pa.table({"lo": b["lo"], "hi": b["hi"],
                            "e": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow", batch_size=None),
        on=["lo", "hi"], num_partitions=num_partitions).count()
    if on_edges != m:
        return False
    # no endpoint repeats
    ends = matching.map_batches(
        lambda b: pa.table({"v": pa.array(np.concatenate(
            [b["lo"].to_numpy(zero_copy_only=False),
             b["hi"].to_numpy(zero_copy_only=False)]))}),
        batch_format="pyarrow", batch_size=None)
    distinct = ends.groupby("v").count().count()
    return int(distinct) == 2 * m


def is_maximal_matching(und: ray.data.Dataset,
                        matching: ray.data.Dataset,
                        num_partitions: int = 8) -> bool:
    """True iff ``matching`` is a matching and no graph edge has both
    endpoints unmatched (igraph_is_maximal_matching,
    /root/reference/src/matching.c)."""
    from igraph_ray.util import hash_join

    if not is_matching(und, matching, num_partitions=num_partitions):
        return False
    matched_v = matching.map_batches(
        lambda b: pa.table({"v": pa.array(np.concatenate(
            [b["lo"].to_numpy(zero_copy_only=False),
             b["hi"].to_numpy(zero_copy_only=False)])),
            "m": pa.array(np.ones(2 * b.num_rows, np.int64))}),
        batch_format="pyarrow", batch_size=None).groupby("v").min("m")
    matched_v = matched_v.map_batches(
        lambda b: pa.table({"v": b["v"],
                            "m": pc.cast(b["min(m)"], pa.int64())})
        if b.num_rows and "v" in b.column_names else pa.table(
            {"v": pa.array([], pa.int64()),
             "m": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()

    lo_j = hash_join(und.map_batches(
        lambda b: pa.table({"v": b["lo"], "hi": b["hi"]}),
        batch_format="pyarrow", batch_size=None),
        matched_v, on="v", num_partitions=num_partitions)
    lo_matched = lo_j.map_batches(
        lambda b: pa.table({"lo": b["v"], "hi": b["hi"]})
        if b.num_rows and "v" in b.column_names else pa.table(
            {"lo": pa.array([], pa.int64()),
             "hi": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    hi_j = hash_join(und.map_batches(
        lambda b: pa.table({"lo": b["lo"], "v": b["hi"]}),
        batch_format="pyarrow", batch_size=None),
        matched_v, on="v", num_partitions=num_partitions)
    hi_matched = hi_j.map_batches(
        lambda b: pa.table({"lo": b["lo"], "hi": b["v"]})
        if b.num_rows and "lo" in b.column_names else pa.table(
            {"lo": pa.array([], pa.int64()),
             "hi": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    covered = lo_matched.union(hi_matched).groupby(["lo", "hi"]).count()
    return int(covered.count()) == int(und.count())
