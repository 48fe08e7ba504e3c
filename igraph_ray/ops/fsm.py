"""Frequent subgraph mining over a graph database — the engine's
bounded counterpart of the reference fork's igraph_gspan
(/root/reference/src/fsm.c:2246; Yan & Han, "gSpan: graph-based
substructure pattern mining", ICDM 2002) with transaction support
(fsm.c:988 igraph_aggregated_db_support).

The graph database is a snapshot collection — (graph_id, src, dst)
rows, e.g. the per-window event snapshots of ops/temporal.py — with
vertex colors given by an arithmetic rule (v mod C, the engine's
SQL-replayable stand-in for the reference's color vectors). Patterns
are canonical color-labeled subgraphs of ≤2 edges:

    e:a-b    an edge between colors a ≤ b
    w:c|a-b  a wedge centered on color c with leaf colors a ≤ b

i.e. the reference's default single-edge seeds (fsm.c:2058
igraph_i_build_seeds_default) plus one gSpan extension level. Support
= number of graphs containing the pattern (minimum-image/shallow
support distinctions vanish at this pattern size for simple graphs).
The 2-edge bound is the honesty guard: deeper levels square the
candidate space per level (the reference's own enumeration is
exponential); each level here is one distinct-groupby or one
self-join, both single-shuffle data-parallel.

Per-graph wedge generation self-joins the symmetrized edge list on
(graph, center) — O(Σ deg²) pairs, the same quadratic the reference's
extension step pays per embedding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.util import hash_join


def frequent_subgraphs(
    snapshots: ray.data.Dataset,
    min_support: int,
    colors: int = 4,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(pattern, support) rows for every ≤2-edge color pattern
    contained in at least ``min_support`` of the graphs. ``snapshots``
    has (g, src, dst); vertex color = id mod ``colors``."""
    def _canon(b: pa.Table) -> pa.Table:
        g = b["g"]
        lo = pc.min_element_wise(b["src"], b["dst"])
        hi = pc.max_element_wise(b["src"], b["dst"])
        t = pa.table({"g": g, "lo": lo, "hi": hi}).filter(
            pc.not_equal(lo, hi))
        return t.group_by(["g", "lo", "hi"]).aggregate([]).rename_columns(
            ["g", "lo", "hi"])

    und = (snapshots.map_batches(_canon, batch_format="pyarrow",
                                 batch_size=None)
           .groupby(["g", "lo", "hi"]).count()
           .select_columns(["g", "lo", "hi"]).materialize())

    def _singles(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False) % colors
        hi = b["hi"].to_numpy(zero_copy_only=False) % colors
        a = np.minimum(lo, hi)
        z = np.maximum(lo, hi)
        pat = pa.array([f"e:{x}-{y}" for x, y in zip(a, z)], pa.string())
        return (pa.table({"g": b["g"], "pattern": pat})
                .group_by(["g", "pattern"]).aggregate([])
                .rename_columns(["g", "pattern"]))

    singles = (und.map_batches(_singles, batch_format="pyarrow",
                               batch_size=None)
               .groupby(["g", "pattern"]).count()
               .select_columns(["g", "pattern"]))

    def _sym(b: pa.Table) -> pa.Table:
        return pa.table({
            "g": pa.concat_arrays([b["g"].combine_chunks()] * 2),
            "x": pa.concat_arrays([b["lo"].combine_chunks(),
                                   b["hi"].combine_chunks()]),
            "y": pa.concat_arrays([b["hi"].combine_chunks(),
                                   b["lo"].combine_chunks()])})

    sym = und.map_batches(_sym, batch_format="pyarrow",
                          batch_size=None).materialize()
    other = sym.map_batches(
        lambda b: pa.table({"g": b["g"], "x": b["x"], "y2": b["y"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(sym, other, on=["g", "x"],
                  num_partitions=num_partitions)

    def _wedges(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], pa.int64()),
                             "pattern": pa.array([], pa.string())})
        y1 = b["y"].to_numpy(zero_copy_only=False)
        y2 = b["y2"].to_numpy(zero_copy_only=False)
        keep = y1 < y2
        t = b.filter(pa.array(keep))
        x = t["x"].to_numpy(zero_copy_only=False) % colors
        a = t["y"].to_numpy(zero_copy_only=False) % colors
        z = t["y2"].to_numpy(zero_copy_only=False) % colors
        lo = np.minimum(a, z)
        hi = np.maximum(a, z)
        pat = pa.array([f"w:{c}|{p}-{q}" for c, p, q in zip(x, lo, hi)],
                       pa.string())
        return (pa.table({"g": t["g"], "pattern": pat})
                .group_by(["g", "pattern"]).aggregate([])
                .rename_columns(["g", "pattern"]))

    wedges = (j.map_batches(_wedges, batch_format="pyarrow",
                            batch_size=None)
              .groupby(["g", "pattern"]).count()
              .select_columns(["g", "pattern"]))

    def _count_out(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "pattern" not in b.column_names:
            return pa.table({"pattern": pa.array([], pa.string()),
                             "support": pa.array([], pa.int64())})
        t = b.filter(pc.greater_equal(b["count()"], min_support))
        return pa.table({"pattern": t["pattern"],
                         "support": pc.cast(t["count()"], pa.int64())})

    return (singles.union(wedges).groupby("pattern").count()
            .map_batches(_count_out, batch_format="pyarrow",
                         batch_size=None)
            .sort("pattern"))
