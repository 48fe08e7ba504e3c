"""Minimum spanning forest.

Reference semantics: ``igraph_minimum_spanning_tree`` /
``igraph_minimum_spanning_tree_prim``
(/root/reference/src/spanning_trees.c:78-86, 204-292) — per connected
component, a spanning tree of minimum total weight; on a disconnected
graph the result is a spanning forest. The reference runs sequential
Prim with a d-heap; a Ray-native engine uses **Borůvka** instead (public
textbook algorithm), whose rounds are embarrassingly parallel:

each round
  1. join edges to the current component label of both endpoints
     (broadcast hash joins — the label table is one row per vertex but
     shrinks as only *labels* matter; edges drop out once intra-component),
  2. per component pick the minimum cross-component edge
     (groupby(comp).min over a packed (weight, tiebreak) key — one small
     shuffle whose output is ≤ #components rows),
  3. contract: union the chosen edges (driver-side union-find over the
     chosen set — proportionate, because the chosen edges across ALL
     rounds total |V|-1, the size of the result itself) and remap labels
     with a broadcast join.

O(log V) rounds; edges already inside one component are filtered out and
never rejoin the working set, so the working edge set shrinks
monotonically. Ties are broken by (weight, src, dst) so the forest is
deterministic even with duplicate weights.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.util import hash_join


def _find(parent: dict, x: int) -> int:
    root = x
    while parent[root] != root:
        root = parent[root]
    while parent[x] != root:
        parent[x], x = root, parent[x]
    return root


def minimum_spanning_forest(
    edges: ray.data.Dataset,
    weight_col: Optional[str] = "weight",
    num_partitions: int = 8,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """Minimum spanning forest of an undirected view of ``edges``
    (columns src, dst [, weight_col]); returns the chosen edge rows
    (src, dst, weight). ``weight_col=None`` = unweighted (all 1.0,
    spanning_trees.c:89-126 semantics — any spanning forest, made
    deterministic here by the (src,dst) tie-break)."""

    def _prep(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
             if weight_col else np.ones(len(src), np.float64))
        keep = src != dst
        src, dst, w = src[keep], dst[keep], w[keep]
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        # collapse parallel edges to their lightest representative later
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                         "weight": pa.array(w)})

    work = edges.map_batches(_prep, batch_format="pyarrow",
                             batch_size=None).materialize()
    if work.count() == 0:
        return ray.data.from_arrow(pa.table({
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "weight": pa.array([], pa.float64()),
        }))

    # labels start as identity over the vertices present in edges
    def _verts(b: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([
            b["lo"].to_numpy(zero_copy_only=False),
            b["hi"].to_numpy(zero_copy_only=False)]))
        return pa.table({"v": pa.array(v), "comp": pa.array(v)})

    labels = work.map_batches(_verts, batch_format="pyarrow",
                              batch_size=None).groupby("v").min("comp")
    labels = labels.map_batches(
        lambda b: pa.table({"v": b["v"], "comp": b["min(comp)"]}),
        batch_format="pyarrow", batch_size=None).materialize()

    chosen: list[pa.Table] = []
    parent: dict = {}

    for _ in range(max_rounds):
        lab_lo = labels.map_batches(
            lambda b: pa.table({"lo": b["v"], "clo": b["comp"]}),
            batch_format="pyarrow", batch_size=None)
        lab_hi = labels.map_batches(
            lambda b: pa.table({"hi": b["v"], "chi": b["comp"]}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(work, lab_lo, on="lo", num_partitions=num_partitions)
        j = hash_join(j, lab_hi, on="hi", num_partitions=num_partitions)

        def _cross(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "clo" not in b.column_names:
                return pa.table({"lo": pa.array([], pa.int64()),
                                 "hi": pa.array([], pa.int64()),
                                 "weight": pa.array([], pa.float64()),
                                 "clo": pa.array([], pa.int64()),
                                 "chi": pa.array([], pa.int64())})
            keep = pa.compute.not_equal(b["clo"], b["chi"])
            return b.filter(keep)

        cross = j.map_batches(_cross, batch_format="pyarrow",
                              batch_size=None).materialize()
        if cross.count() == 0:
            break
        work = cross.select_columns(["lo", "hi", "weight"]).materialize()

        # candidate per component from both sides; pre-combine per batch
        def _cands(b: pa.Table) -> pa.Table:
            lo = b["lo"].to_numpy(zero_copy_only=False)
            hi = b["hi"].to_numpy(zero_copy_only=False)
            w = b["weight"].to_numpy(zero_copy_only=False)
            clo = b["clo"].to_numpy(zero_copy_only=False)
            chi = b["chi"].to_numpy(zero_copy_only=False)
            comp = np.concatenate([clo, chi])
            ww = np.concatenate([w, w])
            ll = np.concatenate([lo, lo])
            hh = np.concatenate([hi, hi])
            # per-batch pre-combine: keep the min (w, lo, hi) per comp
            order = np.lexsort((hh, ll, ww, comp))
            comp, ww, ll, hh = comp[order], ww[order], ll[order], hh[order]
            first = np.r_[True, comp[1:] != comp[:-1]]
            return pa.table({"comp": pa.array(comp[first]),
                             "w": pa.array(ww[first]),
                             "lo": pa.array(ll[first]),
                             "hi": pa.array(hh[first])})

        cands = cross.map_batches(_cands, batch_format="pyarrow",
                                  batch_size=None)
        best = cands.groupby("comp").map_groups(
            lambda df: df.sort_values(["w", "lo", "hi"]).head(1),
            batch_format="pandas")
        best_t = pa.Table.from_pandas(best.to_pandas(), preserve_index=False)
        # driver-side union-find over the (small) chosen set
        new_edges = []
        lo_a = best_t["lo"].to_numpy()
        hi_a = best_t["hi"].to_numpy()
        w_a = best_t["w"].to_numpy()
        order = np.lexsort((hi_a, lo_a, w_a))
        for i in order:
            a, b_, w = int(lo_a[i]), int(hi_a[i]), float(w_a[i])
            parent.setdefault(a, a)
            parent.setdefault(b_, b_)
            ra, rb = _find(parent, a), _find(parent, b_)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
                new_edges.append((a, b_, w))
        if new_edges:
            arr = np.array([(a, b_, w) for a, b_, w in new_edges])
            chosen.append(pa.table({
                "src": pa.array(arr[:, 0].astype(np.int64)),
                "dst": pa.array(arr[:, 1].astype(np.int64)),
                "weight": pa.array(arr[:, 2]),
            }))

        # remap: comp -> root(comp); broadcast-join the remap table
        # (one row per component ever touched by a chosen edge)
        comps = np.array(sorted(parent), np.int64)
        remap_ds = ray.data.from_arrow(pa.table({
            "comp": pa.array(comps),
            "newc": pa.array(np.array([_find(parent, int(c)) for c in comps],
                                      np.int64)),
        }))
        merged = hash_join(labels, remap_ds, on="comp",
                           num_partitions=num_partitions, join_type="left_outer")

        def _apply(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "v" not in b.column_names:
                return pa.table({"v": pa.array([], pa.int64()),
                                 "comp": pa.array([], pa.int64())})
            comp = (pa.compute.coalesce(b["newc"], b["comp"])
                    if "newc" in b.column_names else b["comp"])
            return pa.table({"v": b["v"],
                             "comp": comp.cast(pa.int64())})

        labels = merged.map_batches(_apply, batch_format="pyarrow",
                                    batch_size=None).materialize()

    if not chosen:
        return ray.data.from_arrow(pa.table({
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "weight": pa.array([], pa.float64()),
        }))
    return ray.data.from_arrow(pa.concat_tables(chosen))
