"""Bridges and 2-edge-connected components, distributed.

Reference semantics: a *bridge* is an edge whose removal increases the
number of connected components (the reference exposes the concept through
its biconnectivity machinery; see /root/reference/src/components.c —
articulation/biconnectedness — and the cut-edge notion used by
igraph_st_edge_connectivity, flow.c).  Parallel edges are never bridges;
loops are never bridges.  The 2-edge-connected components are the
connected components after removing every bridge.

The classic sequential algorithm is a DFS low-link scan — inherently
serial.  The distributed plan here uses two public building blocks:

1. **BFS spanning forest** (aligned superstep): propagate
   lexicographically-minimal (root-label, depth) pairs until fixpoint;
   the deterministic parent is the minimum neighbor one level up.  Every
   bridge is a tree edge of ANY spanning forest, so only |V|-1 edges are
   candidates.

2. **Random-XOR cover test** (the standard parallel-connectivity
   fingerprint trick, as in AGM graph sketches): give every non-tree
   edge instance a seeded 64-bit fingerprint, XOR them into both
   endpoints, and compute per-vertex *subtree XOR* T(c) over the BFS
   tree.  Edges with both endpoints inside subtree(c) cancel, so T(c)
   is the XOR of exactly the non-tree edges crossing the tree cut above
   c — tree edge (parent(c), c) is a bridge iff T(c) == 0.  A false
   negative needs a non-empty crossing set whose fingerprints XOR to
   zero: probability ≤ 2⁻⁶⁴ per edge, and the fingerprints are
   splitmix-style hashes of (lo, hi, copy), so a run is bit-reproducible
   at any parallelism.

Subtree XOR is an upward sweep along parent pointers: contributions
(cur, val) start at every vertex, each round XOR-combine per ``cur``
(boundary-aligned range sort → one block per range → in-block reduceat)
and hop ``cur`` to its parent; after height(H) rounds every vertex has
absorbed its whole subtree.  All state stays O(V) rows per round and
moves through the object store — no driver-side per-vertex structures.
H = BFS-forest height = O(diameter), the same bound the distance/
centrality family already assumes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray import aligned as al
from igraph_ray.csr import compute_boundaries, fetch_block, slices_for
from igraph_ray.graph import Graph
from igraph_ray.superstep import SuperstepResult
from igraph_ray.util import hash_join

_SENTINEL = np.int64(2**62)

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xBF58476D1CE4E5B9)
_M3 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain constant schedule)."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * _M2
    x = (x ^ (x >> np.uint64(27))) * _M3
    return x ^ (x >> np.uint64(31))


def _fingerprint(lo: np.ndarray, hi: np.ndarray, copy: np.ndarray) -> np.ndarray:
    h = (lo.astype(np.uint64) * _M1 + np.uint64(0x6C62272E07BB0142)) ^ \
        (hi.astype(np.uint64) * _M2) ^ (copy.astype(np.uint64) * _M3)
    f = _mix64(h)
    # 0 is the identity of XOR — remap so a fingerprint is never "absent"
    return np.where(f == 0, np.uint64(1), f)


def bfs_forest(
    graph: Graph, num_partitions: Optional[int] = None, max_iter: int = 10_000
) -> ray.data.Dataset:
    """(vertex, root, depth, parent) for every vertex: the deterministic
    BFS spanning forest of the undirected simple view — root = minimum
    vertex of the component, depth = hop distance to it, parent = the
    minimum neighbor one level up (parent == vertex for roots)."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    csr = graph.csr_index("sym", num_partitions, weighted=False)
    blocks = csr.block_descriptors()

    def _init(sd: dict) -> dict:
        v = sd["vertex"]
        return {"vertex": v, "lab": v.astype(np.int64),
                "dist": np.zeros(len(v), np.int64),
                "changed": np.ones(len(v), bool)}

    if graph._explicit_n:
        state = al.state_from_csr(csr, graph.num_vertices(), init_fn=_init)
    else:
        state = al.state_from_dataset(
            graph.vertices(), [int(b) for b in csr.boundaries], init_fn=_init)

    def gather_fn(sb, csr_desc, starts, scalars):
        nb = len(starts)
        segs = [[] for _ in range(nb)]
        fr = sb["changed"]
        msg_count = 0
        if fr.any():
            verts = sb["vertex"][fr]
            labs = sb["lab"][fr]
            dists = sb["dist"][fr] + 1
            out_d, out_l, out_t = [], [], []
            vmin, vmax = verts.min(), verts.max()
            for (vlo, vhi, ref) in csr_desc:
                if vhi < vmin or vlo > vmax:
                    continue
                sel = (verts >= vlo) & (verts <= vhi)
                if not sel.any():
                    continue
                blk = fetch_block(ref)
                idx, lens = slices_for(blk, verts[sel])
                if len(idx) == 0:
                    continue
                out_d.append(blk["dst"][idx])
                out_l.append(np.repeat(labs[sel], lens))
                out_t.append(np.repeat(dists[sel], lens))
            if out_d:
                alld = np.concatenate(out_d)
                alll = np.concatenate(out_l)
                allt = np.concatenate(out_t)
                # per-dst lexicographic min of (lab, dist)
                order = np.lexsort((allt, alll, alld))
                alld, alll, allt = alld[order], alll[order], allt[order]
                first = np.r_[True, alld[1:] != alld[:-1]]
                dsts, labs_m, dist_m = alld[first], alll[first], allt[first]
                msg_count = len(dsts)
                bounds = np.searchsorted(dsts, starts[1:])
                lo = 0
                for r, hi in enumerate(list(bounds) + [len(dsts)]):
                    if hi > lo:
                        segs[r].append((dsts[lo:hi], labs_m[lo:hi], dist_m[lo:hi]))
                    lo = hi
        return [tuple(s) for s in segs], msg_count

    def apply_fn(old, segments, scalars):
        vertex = old["vertex"]
        lab = old["lab"].copy()
        dist = old["dist"].copy()
        changed = np.zeros(len(vertex), bool)
        for triples in segments:
            for (sd, sl, st) in triples:
                if not len(sd):
                    continue
                pos = np.searchsorted(vertex, sd)
                better = (sl < lab[pos]) | ((sl == lab[pos]) & (st < dist[pos]))
                p = pos[better]
                lab[p] = sl[better]
                dist[p] = st[better]
                changed[p] = True
        return ({"vertex": vertex, "lab": lab, "dist": dist, "changed": changed},
                {"changed": float(changed.sum())})

    res = al.run_aligned_loop(
        state=state,
        csr_descriptors=blocks,
        gather_fn=gather_fn,
        apply_fn=apply_fn,
        scalars={"changed": 1.0},
        make_scalars=lambda s, it: {"changed": s.get("changed", 0.0)},
        converged=lambda s, it: s.get("changed", 1.0) == 0.0,
        max_iter=max_iter,
        state_columns=["vertex", "lab", "dist", "changed"],
    )

    def _project(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "root": b["lab"],
                         "depth": b["dist"]})

    depth = res.state.map_batches(_project, batch_format="pyarrow",
                                  batch_size=None).materialize()

    # deterministic parent: min neighbor one level up (sym distinct view)
    sym = graph.symmetrized(drop_loops=True)
    from igraph_ray.ops.relational import _dedup

    sym = _dedup(sym)
    dsrc = depth.map_batches(
        lambda b: pa.table({"src": b["vertex"], "d_s": b["depth"]}),
        batch_format="pyarrow", batch_size=None)
    ddst = depth.map_batches(
        lambda b: pa.table({"dst": b["vertex"], "d_d": b["depth"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(sym, dsrc, on="src", num_partitions=num_partitions)
    j = hash_join(j, ddst, on="dst", num_partitions=num_partitions)

    def _par(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "parent": pa.array([], pa.int64())})
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        ds_ = b["d_s"].to_numpy(zero_copy_only=False)
        dd = b["d_d"].to_numpy(zero_copy_only=False)
        keep = ds_ == dd - 1
        t = pa.table({"vertex": pa.array(d[keep]), "parent": pa.array(s[keep])})
        return pa.TableGroupBy(t, ["vertex"]).aggregate([("parent", "min")]) \
            .rename_columns(["vertex", "parent"])

    par = j.map_batches(_par, batch_format="pyarrow", batch_size=None) \
        .groupby("vertex").min("parent")
    par = par.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "parent": b["min(parent)"]}),
        batch_format="pyarrow", batch_size=None)

    out = hash_join(depth, par, on="vertex", num_partitions=num_partitions,
                    join_type="left_outer")

    def _fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "root": pa.array([], pa.int64()),
                             "depth": pa.array([], pa.int64()),
                             "parent": pa.array([], pa.int64())})
        v = b["vertex"].to_numpy(zero_copy_only=False)
        if "parent" in b.column_names:
            p = b["parent"].to_numpy(zero_copy_only=False)
            p = np.where(np.isnan(p.astype(np.float64)), v, p).astype(np.int64) \
                if p.dtype != np.int64 else p
        else:
            p = v
        return pa.table({"vertex": pa.array(v), "root": b["root"],
                         "depth": b["depth"],
                         "parent": pa.array(p, pa.int64())})

    return out.map_batches(_fin, batch_format="pyarrow", batch_size=None) \
        .materialize()


def _xor_combine(ds: ray.data.Dataset, key: str, val: str,
                 num_partitions: int) -> ray.data.Dataset:
    """XOR-aggregate ``val`` per ``key``: boundary-aligned range sort (one
    block per key range, the sessionize pattern) then an in-block sorted
    reduceat — a distributed associative reduction without a groupby
    shuffle of Python objects."""
    bnds = compute_boundaries(ds, num_partitions, col=key)
    s = ds.sort(key, boundaries=bnds) if bnds else ds.sort(key)

    def _comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or key not in b.column_names:
            return pa.table({key: pa.array([], pa.int64()),
                             val: pa.array([], pa.int64())})
        k = b[key].to_numpy(zero_copy_only=False)
        v = b[val].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        first = np.r_[True, k[1:] != k[:-1]]
        gid = np.cumsum(first) - 1
        out = np.zeros(int(gid[-1]) + 1, np.uint64)
        np.bitwise_xor.at(out, gid, v)
        return pa.table({key: pa.array(k[first]),
                         val: pa.array(out.view(np.int64))})

    return s.map_batches(_comb, batch_format="pyarrow", batch_size=None)


def _tree_and_fingerprints(
    graph: Graph, forest: ray.data.Dataset, num_partitions: int
) -> Tuple[ray.data.Dataset, ray.data.Dataset]:
    """(tree, xvert): tree = (lo, hi, child) tree edges of the forest;
    xvert = (vertex, x) per-vertex XOR of the fingerprints of every
    NON-TREE undirected edge instance incident to it (multiplicity
    copies of tree pairs count as non-tree, so parallel tree edges
    auto-cover themselves)."""
    # (lo, hi, m) with multiplicity over the loop-free undirected view
    edges = graph.without_loops()

    def _canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        t = pa.table({"lo": pa.array(lo), "hi": pa.array(hi)})
        return pa.TableGroupBy(t, ["lo", "hi"]).aggregate([([], "count_all")]) \
            .rename_columns(["lo", "hi", "m"])

    und = edges.map_batches(_canon, batch_format="pyarrow", batch_size=None) \
        .groupby(["lo", "hi"]).sum("m")
    und = und.map_batches(
        lambda b: pa.table({"lo": b["lo"], "hi": b["hi"], "m": b["sum(m)"]}),
        batch_format="pyarrow", batch_size=None).materialize()

    tree = forest.map_batches(
        lambda b: pa.table(
            {"lo": pa.array(np.minimum(b["vertex"].to_numpy(zero_copy_only=False),
                                       b["parent"].to_numpy(zero_copy_only=False))),
             "hi": pa.array(np.maximum(b["vertex"].to_numpy(zero_copy_only=False),
                                       b["parent"].to_numpy(zero_copy_only=False))),
             "child": b["vertex"]}),
        batch_format="pyarrow", batch_size=None)
    def _drop_roots(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        keep = lo != hi  # roots point at themselves
        return pa.table({"lo": pa.array(lo[keep]), "hi": pa.array(hi[keep]),
                         "child": pa.array(
                             b["child"].to_numpy(zero_copy_only=False)[keep])})

    tree = tree.map_batches(_drop_roots, batch_format="pyarrow", batch_size=None)

    marked = hash_join(und, tree, on=["lo", "hi"], num_partitions=num_partitions,
                       join_type="left_outer")

    def _fps(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64())})
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = b["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        if "child" in b.column_names:
            ch = b["child"].to_numpy(zero_copy_only=False)
            is_tree = (np.ones(len(ch), bool) if ch.dtype == np.int64
                       else ~np.isnan(ch.astype(np.float64)))
        else:
            is_tree = np.zeros(len(lo), bool)
        start = np.where(is_tree, 1, 0).astype(np.int64)
        cnt = m - start
        keep = cnt > 0
        lo, hi, start, cnt = lo[keep], hi[keep], start[keep], cnt[keep]
        total = int(cnt.sum())
        if total == 0:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64())})
        off = np.zeros(len(cnt), np.int64)
        np.cumsum(cnt[:-1], out=off[1:])
        copy = np.arange(total, dtype=np.int64) - np.repeat(off, cnt) \
            + np.repeat(start, cnt)
        elo = np.repeat(lo, cnt)
        ehi = np.repeat(hi, cnt)
        f = _fingerprint(elo, ehi, copy)
        t = pa.table({"vertex": pa.array(np.concatenate([elo, ehi])),
                      "x": pa.array(np.concatenate([f, f]).view(np.int64))})
        # per-block pre-combine
        k = t["vertex"].to_numpy(zero_copy_only=False)
        v = t["x"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        firstm = np.r_[True, k[1:] != k[:-1]]
        gid = np.cumsum(firstm) - 1
        outv = np.zeros(int(gid[-1]) + 1, np.uint64)
        np.bitwise_xor.at(outv, gid, v)
        return pa.table({"vertex": pa.array(k[firstm]),
                         "x": pa.array(outv.view(np.int64))})

    xv = marked.map_batches(_fps, batch_format="pyarrow", batch_size=None)
    xvert = _xor_combine(xv, "vertex", "x", num_partitions)
    return tree.materialize(), xvert.materialize()


def _subtree_xor(
    forest: ray.data.Dataset, xvert: ray.data.Dataset,
    num_partitions: int, max_height: int = 100_000
) -> ray.data.Dataset:
    """(vertex, t): XOR of x over the subtree rooted at each vertex —
    upward sweep along parent pointers, one hop per round, XOR-merging
    per position so in-flight state stays ≤ |V| rows."""
    par = forest.map_batches(
        lambda b: pa.table({"cur": b["vertex"], "nxt": b["parent"],
                            "dep": b["depth"]}),
        batch_format="pyarrow", batch_size=None).materialize()

    contrib = xvert.map_batches(
        lambda b: pa.table({"cur": b["vertex"], "x": b["x"]}),
        batch_format="pyarrow", batch_size=None).materialize()

    results = [contrib]
    for _ in range(max_height):
        stepped = hash_join(contrib, par, on="cur",
                            num_partitions=num_partitions)

        def _step2(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "cur" not in b.column_names:
                return pa.table({"cur": pa.array([], pa.int64()),
                                 "x": pa.array([], pa.int64())})
            cur = b["cur"].to_numpy(zero_copy_only=False)
            nxt = b["nxt"].to_numpy(zero_copy_only=False)
            x = b["x"].to_numpy(zero_copy_only=False)
            keep = nxt != cur
            return pa.table({"cur": pa.array(nxt[keep]),
                             "x": pa.array(x[keep])})

        contrib = _xor_combine(
            stepped.map_batches(_step2, batch_format="pyarrow", batch_size=None),
            "cur", "x", num_partitions).materialize()
        if contrib.count() == 0:
            break
        results.append(contrib)

    allc = results[0]
    for r in results[1:]:
        allc = allc.union(r)
    t = _xor_combine(allc, "cur", "x", num_partitions)
    return t.map_batches(
        lambda b: pa.table({"vertex": b["cur"], "t": b["x"]}),
        batch_format="pyarrow", batch_size=None)


def bridges(graph: Graph, num_partitions: Optional[int] = None) -> ray.data.Dataset:
    """(src, dst) src<dst: every bridge of the undirected multigraph view
    (loops never bridge; parallel edges never bridge).  Seeded XOR
    fingerprints make the output deterministic; the per-edge false-
    negative probability is ≤ 2⁻⁶⁴ (documented in the module header)."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    forest = bfs_forest(graph, num_partitions)
    tree, xvert = _tree_and_fingerprints(graph, forest, num_partitions)
    sub = _subtree_xor(forest, xvert, num_partitions)

    cand = tree.map_batches(
        lambda b: pa.table({"vertex": b["child"], "lo": b["lo"], "hi": b["hi"]}),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(cand, sub, on="vertex", num_partitions=num_partitions,
                  join_type="left_outer")

    def _sel2(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        if "t" in b.column_names:
            t = b["t"].to_numpy(zero_copy_only=False)
            if t.dtype != np.int64:  # left-outer null → no crossing edges
                tz = np.isnan(t.astype(np.float64)) | (t.astype(np.float64) == 0.0)
            else:
                tz = t == 0
        else:
            tz = np.ones(len(lo), bool)
        return pa.table({"src": pa.array(lo[tz]), "dst": pa.array(hi[tz])})

    return j.map_batches(_sel2, batch_format="pyarrow", batch_size=None)


def two_edge_connected_components(
    graph: Graph, num_partitions: Optional[int] = None
) -> ray.data.Dataset:
    """(vertex, label): min-vertex label of each 2-edge-connected
    component (connected components after removing every bridge; bridge
    endpoints end up in different labels unless another path joins
    them).  Vertex universe = the input graph's."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    br = bridges(graph, num_partitions).materialize()

    def _canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"lo": pa.array(np.minimum(s, d)),
                         "hi": pa.array(np.maximum(s, d))})

    und = graph.edges.map_batches(_canon, batch_format="pyarrow", batch_size=None)
    brc = br.map_batches(
        lambda b: pa.table({"lo": b["src"], "hi": b["dst"],
                            "is_br": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow", batch_size=None)
    marked = hash_join(und, brc, on=["lo", "hi"], num_partitions=num_partitions,
                       join_type="left_outer")

    def _keep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        if "is_br" in b.column_names:
            m = b["is_br"].to_numpy(zero_copy_only=False)
            keep = np.isnan(m.astype(np.float64)) if m.dtype != np.int64 \
                else np.zeros(len(m), bool)
        else:
            keep = np.ones(b.num_rows, bool)
        return pa.table({"src": b["lo"].to_numpy(zero_copy_only=False)[keep],
                         "dst": b["hi"].to_numpy(zero_copy_only=False)[keep]})

    kept = marked.map_batches(_keep, batch_format="pyarrow", batch_size=None) \
        .materialize()

    from igraph_ray.algorithms.components import connected_components

    if kept.count() == 0:
        return graph.vertices().map_batches(
            lambda b: pa.table({"vertex": b["vertex"], "label": b["vertex"]}),
            batch_format="pyarrow", batch_size=None)

    sub = Graph(kept, n=None)
    labs = connected_components(sub, num_partitions=num_partitions,
                                densify=False).state
    out = hash_join(graph.vertices(), labs, on="vertex",
                    num_partitions=num_partitions, join_type="left_outer")

    def _fill(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        v = b["vertex"].to_numpy(zero_copy_only=False)
        if "label" in b.column_names:
            l = b["label"].to_numpy(zero_copy_only=False)
            l = np.where(np.isnan(l.astype(np.float64)), v, l).astype(np.int64) \
                if l.dtype != np.int64 else l
        else:
            l = v
        return pa.table({"vertex": pa.array(v), "label": pa.array(l, pa.int64())})

    return out.map_batches(_fill, batch_format="pyarrow", batch_size=None)
