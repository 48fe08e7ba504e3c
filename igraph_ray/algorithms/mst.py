"""Minimum spanning forest.

Reference semantics: ``igraph_minimum_spanning_tree`` /
``igraph_minimum_spanning_tree_prim``
(/root/reference/src/spanning_trees.c:78-86, 204-292) — per connected
component, a spanning tree of minimum total weight; on a disconnected
graph the result is a spanning forest. The reference runs sequential
Prim with a d-heap; a Ray-native engine uses **Borůvka** instead (public
textbook algorithm), whose rounds are embarrassingly parallel and —
unlike Prim — never pull per-vertex state through the driver:

each round
  1. join edges to the current component label of both endpoints
     (hash joins; edges drop out once intra-component),
  2. per component pick the minimum cross-component edge under the total
     order (weight, lo, hi): candidates are pre-combined per batch, then
     one ``groupby(comp).min`` over a 32-byte order-preserving packed key
     (monotone IEEE-754 weight bits ‖ lo ‖ hi ‖ other-component) — the
     shuffle output is ≤ #components rows and stays in the object store,
  3. contract distributively: hook every component onto its best
     neighbor (``ptr[c] = other``), break the mutual 2-cycles that a
     total edge order guarantees are the only cycles (keep the smaller
     id as root), then pointer-jump ``ptr ← ptr∘ptr`` to convergence —
     O(log depth) self-joins on the component table — and remap vertex
     labels through the root table with one more join.

Because ties are broken by the total order (weight, lo, hi), the per-
component minimum edges can never close a cycle (the classic distinct-
weights Borůvka argument), so each round's distinct chosen edges are
forest edges verbatim — no union-find needed anywhere. O(log V) rounds;
intra-component edges are filtered out and never rejoin the working set.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from igraph_ray.util import hash_join

_SIGN = np.uint64(0x8000000000000000)
_ALL1 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _monotone_u64(w: np.ndarray) -> np.ndarray:
    """Order-preserving float64 → uint64 (flip sign bit for positives,
    all bits for negatives) — the standard IEEE-754 radix-sort key."""
    b = np.ascontiguousarray(w, np.float64).view(np.uint64)
    neg = (b >> np.uint64(63)).astype(bool)
    return b ^ np.where(neg, _ALL1, _SIGN)


def _monotone_inv(u: np.ndarray) -> np.ndarray:
    was_pos = (u >> np.uint64(63)).astype(bool)
    b = u ^ np.where(was_pos, _SIGN, _ALL1)
    return b.view(np.float64)


def _pack32(wkey: np.ndarray, lo: np.ndarray, hi: np.ndarray,
            other: np.ndarray) -> pa.Array:
    """Big-endian (wkey‖lo‖hi‖other) hex-encoded (64 ascii chars) so the
    lexicographic min IS the tuple min — hex digits ascend in ascii order
    and contain no NUL bytes (pyarrow truncates numpy S values at the
    first NUL, so a raw-byte pack is unsafe)."""
    import binascii

    rows = np.stack([wkey,
                     lo.astype(np.uint64),
                     hi.astype(np.uint64),
                     other.astype(np.uint64)], axis=1)
    be = rows.byteswap().view(np.uint8).reshape(len(wkey), 32)
    hx = binascii.hexlify(be.tobytes())
    return pa.array(np.frombuffer(hx, dtype="S64"))


def _unpack32(col: pa.ChunkedArray):
    import binascii

    obj = col.to_numpy(zero_copy_only=False)
    raw = binascii.unhexlify(b"".join(obj))
    flat = np.frombuffer(raw, dtype=np.uint64).reshape(len(obj), 4)
    flat = flat.byteswap()
    return (_monotone_inv(flat[:, 0].copy()),
            flat[:, 1].astype(np.int64),
            flat[:, 2].astype(np.int64),
            flat[:, 3].astype(np.int64))


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
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                         "weight": pa.array(w)})

    work = edges.map_batches(_prep, batch_format="pyarrow",
                             batch_size=None).materialize()
    empty = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64()),
                      "weight": pa.array([], pa.float64())})
    if work.count() == 0:
        return ray.data.from_arrow(empty)

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

    chosen: list[ray.data.Dataset] = []

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
            return b.filter(pc.not_equal(b["clo"], b["chi"]))

        cross = j.map_batches(_cross, batch_format="pyarrow",
                              batch_size=None).materialize()
        if cross.count() == 0:
            break
        work = cross.select_columns(["lo", "hi", "weight"]).materialize()

        # candidates per component from both sides, pre-combined per
        # batch: one packed-key row per comp per batch leaves the task
        def _cands(b: pa.Table) -> pa.Table:
            lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
            hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = b["weight"].to_numpy(zero_copy_only=False)
            clo = b["clo"].to_numpy(zero_copy_only=False).astype(np.int64)
            chi = b["chi"].to_numpy(zero_copy_only=False).astype(np.int64)
            comp = np.concatenate([clo, chi])
            other = np.concatenate([chi, clo])
            ww = np.concatenate([w, w])
            ll = np.concatenate([lo, lo])
            hh = np.concatenate([hi, hi])
            order = np.lexsort((hh, ll, ww, comp))
            comp, ww, ll, hh, other = (comp[order], ww[order], ll[order],
                                       hh[order], other[order])
            first = np.r_[True, comp[1:] != comp[:-1]]
            return pa.table({
                "comp": pa.array(comp[first]),
                "p": _pack32(_monotone_u64(ww[first]), ll[first],
                             hh[first], other[first]),
            })

        best = (cross.map_batches(_cands, batch_format="pyarrow",
                                  batch_size=None)
                .groupby("comp").min("p"))

        def _unbest(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"comp": pa.array([], pa.int64()),
                                 "other": pa.array([], pa.int64()),
                                 "lo": pa.array([], pa.int64()),
                                 "hi": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.float64())})
            w, lo, hi, other = _unpack32(b["min(p)"])
            return pa.table({"comp": b["comp"].cast(pa.int64()),
                             "other": pa.array(other),
                             "lo": pa.array(lo), "hi": pa.array(hi),
                             "w": pa.array(w)})

        best = best.map_batches(_unbest, batch_format="pyarrow",
                                batch_size=None).materialize()

        # chosen edges this round: distinct over the per-comp minima —
        # under the total order (w, lo, hi) they can never close a cycle
        picked = (best.groupby(["lo", "hi"]).min("w")
                  .map_batches(
                      lambda b: pa.table({"src": b["lo"], "dst": b["hi"],
                                          "weight": b["min(w)"]}),
                      batch_format="pyarrow", batch_size=None)
                  .materialize())
        chosen.append(picked)

        # hook: ptr[comp] = other; the only cycles are mutual pairs —
        # keep the smaller id as root (ptr = self)
        ptr = best.select_columns(["comp", "other"])
        back = best.map_batches(
            lambda b: pa.table({"other": b["comp"], "oo": b["other"]}),
            batch_format="pyarrow", batch_size=None)
        hooked = hash_join(ptr, back, on="other",
                           num_partitions=num_partitions)

        def _break_cycles(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "comp" not in b.column_names:
                return pa.table({"c": pa.array([], pa.int64()),
                                 "p": pa.array([], pa.int64())})
            c = b["comp"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = b["other"].to_numpy(zero_copy_only=False).astype(np.int64)
            oo = b["oo"].to_numpy(zero_copy_only=False).astype(np.int64)
            root = (oo == c) & (c < o)
            return pa.table({"c": pa.array(c),
                             "p": pa.array(np.where(root, c, o))})

        ptr = hooked.map_batches(_break_cycles, batch_format="pyarrow",
                                 batch_size=None).materialize()

        # pointer jumping: p ← p[p] until fixpoint (O(log depth) joins,
        # all on the ≤#components-row pointer table)
        for _jump in range(max_rounds):
            hop = ptr.map_batches(
                lambda b: pa.table({"p": b["c"], "pp": b["p"]}),
                batch_format="pyarrow", batch_size=None)
            jj = hash_join(ptr, hop, on="p",
                           num_partitions=num_partitions)

            def _jumped(b: pa.Table) -> pa.Table:
                if b.num_rows == 0 or "c" not in b.column_names:
                    return pa.table({"c": pa.array([], pa.int64()),
                                     "p": pa.array([], pa.int64()),
                                     "moved": pa.array([], pa.int64())})
                p = b["p"].to_numpy(zero_copy_only=False).astype(np.int64)
                pp = b["pp"].to_numpy(zero_copy_only=False).astype(np.int64)
                return pa.table({"c": b["c"].cast(pa.int64()),
                                 "p": pa.array(pp),
                                 "moved": pa.array((p != pp).astype(np.int64))})

            nxt = jj.map_batches(_jumped, batch_format="pyarrow",
                                 batch_size=None).materialize()
            moved = nxt.sum("moved")
            ptr = nxt.select_columns(["c", "p"]).materialize()
            if not moved:
                break

        # remap: comp -> root(comp); components without a best edge
        # (already maximal) keep their label via the left-outer coalesce
        remap = ptr.map_batches(
            lambda b: pa.table({"comp": b["c"], "newc": b["p"]}),
            batch_format="pyarrow", batch_size=None)
        merged = hash_join(labels, remap, on="comp",
                           num_partitions=num_partitions,
                           join_type="left_outer")

        def _apply(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "v" not in b.column_names:
                return pa.table({"v": pa.array([], pa.int64()),
                                 "comp": pa.array([], pa.int64())})
            comp = (pc.coalesce(b["newc"], b["comp"])
                    if "newc" in b.column_names else b["comp"])
            return pa.table({"v": b["v"], "comp": comp.cast(pa.int64())})

        labels = merged.map_batches(_apply, batch_format="pyarrow",
                                    batch_size=None).materialize()

    if not chosen:
        return ray.data.from_arrow(empty)
    out = chosen[0]
    for ds in chosen[1:]:
        out = out.union(ds)
    return out
