"""Articulation points and biconnected components, distributed.

Reference semantics: ``igraph_articulation_points`` /
``igraph_biconnected_components`` (/root/reference/src/components.c —
the DFS low-point scan).  Loops and edge multiplicities never change
vertex cuts, so everything here runs on the simple undirected view; a
*biconnected component* is an equivalence class of edges under
"lie on a common cycle", and an *articulation point* is a vertex whose
removal increases the number of connected components.

The sequential low-point scan needs a DFS tree — inherently serial.
The distributed plan is Tarjan–Vishkin (SIAM J. Comput. 1985) evaluated
on the deterministic BFS forest that `algorithms.bridges` already
builds, which simplifies the classic construction considerably:

* In a BFS forest every non-tree edge joins *unrelated* vertices (an
  ancestor is the unique path vertex at its depth, and non-tree edges
  span at most one level, so an ancestor endpoint would be the parent —
  i.e. a tree edge).  There are no back edges to special-case.

* Auxiliary graph on tree edges — represent tree edge (parent(w), w)
  by its child w:
    (i)  every non-tree edge {u, x} links u ↔ x (always unrelated);
    (ii) tree edge (v, w) with non-root v links v ↔ w iff subtree(w)
         escapes subtree(v):  low(w) < pre(v)  or
         high(w) ≥ pre(v) + size(v).
  Connected components of the auxiliary graph (computed with the
  engine's own min-label `connected_components`) are exactly the
  biconnected components; a non-tree edge {u, x} shares the component
  of u's and x's tree edges by rule (i).

* Articulation points: a non-root v is a cut vertex iff some child
  edge lands in a different auxiliary component than v's own parent
  edge; a root is a cut vertex iff its child edges span ≥ 2 auxiliary
  components.

Building blocks, all O(V)-row Dataset passes:
  - subtree size / low / high: upward sweeps along parent pointers
    (the `bridges._subtree_xor` hop pattern with sum / min / max
    combines), O(height) rounds;
  - preorder: per-parent sibling-prefix offsets (boundary-aligned
    range sort, in-block segmented cumsum) + pointer-doubling path
    sums, O(log height) join rounds — pre(v) = depth(v) + Σ off over
    the root→v path;
  - label closure: `connected_components` on the auxiliary edge list.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.algorithms.bridges import bfs_forest
from igraph_ray.csr import compute_boundaries
from igraph_ray.graph import Graph
from igraph_ray.util import hash_join

_OPS = {"sum": np.add, "min": np.minimum, "max": np.maximum}
_IDENT = {"sum": 0, "min": np.int64(2**62), "max": np.int64(-(2**62))}


def _assoc_combine(ds: ray.data.Dataset, key: str, vals: Dict[str, str],
                   num_partitions: int) -> ray.data.Dataset:
    """Per-``key`` associative reduction of each value column (op per
    column: sum/min/max): boundary-aligned range sort (one block per key
    range) then in-block sorted reduceat — no Python-object shuffle."""
    bnds = compute_boundaries(ds, num_partitions, col=key)
    s = ds.sort(key, boundaries=bnds) if bnds else ds.sort(key)
    cols = list(vals)

    def _comb(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or key not in b.column_names:
            return pa.table({key: pa.array([], pa.int64()),
                             **{c: pa.array([], pa.int64()) for c in cols}})
        k = b[key].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k = k[order]
        first = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(first)
        out = {key: pa.array(k[first])}
        for c in cols:
            v = b[c].to_numpy(zero_copy_only=False)[order]
            out[c] = pa.array(_OPS[vals[c]].reduceat(v, starts))
        return pa.table(out)

    return s.map_batches(_comb, batch_format="pyarrow", batch_size=None)


def _subtree_sweep(forest: ray.data.Dataset, base: ray.data.Dataset,
                   vals: Dict[str, str], num_partitions: int,
                   max_height: int = 100_000) -> ray.data.Dataset:
    """Per-vertex subtree aggregate of ``base`` columns over the rooted
    forest: contributions hop one parent per round (combined per holder
    so in-flight state stays ≤ |V| rows), then a final combine of every
    round's residue — vertex v ends up with op over its whole subtree."""
    par = forest.map_batches(
        lambda b: pa.table({"cur": b["vertex"], "nxt": b["parent"]}),
        batch_format="pyarrow", batch_size=None).materialize()

    contrib = base.map_batches(
        lambda b: pa.table({"cur": b["vertex"],
                            **{c: b[c] for c in vals}}),
        batch_format="pyarrow", batch_size=None).materialize()

    cols = list(vals)
    results = [contrib]
    for _ in range(max_height):
        stepped = hash_join(contrib, par, on="cur",
                            num_partitions=num_partitions)

        def _hop(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "cur" not in b.column_names:
                return pa.table({"cur": pa.array([], pa.int64()),
                                 **{c: pa.array([], pa.int64())
                                    for c in cols}})
            cur = b["cur"].to_numpy(zero_copy_only=False)
            nxt = b["nxt"].to_numpy(zero_copy_only=False)
            keep = nxt != cur
            return pa.table({"cur": pa.array(nxt[keep]),
                             **{c: pa.array(
                                 b[c].to_numpy(zero_copy_only=False)[keep])
                                for c in cols}})

        contrib = _assoc_combine(
            stepped.map_batches(_hop, batch_format="pyarrow", batch_size=None),
            "cur", vals, num_partitions).materialize()
        if contrib.count() == 0:
            break
        results.append(contrib)

    allc = results[0]
    for r in results[1:]:
        allc = allc.union(r)
    t = _assoc_combine(allc, "cur", vals, num_partitions)
    return t.map_batches(
        lambda b: pa.table({"vertex": b["cur"], **{c: b[c] for c in cols}}),
        batch_format="pyarrow", batch_size=None)


def _np(b: pa.Table, col: str) -> np.ndarray:
    return b[col].to_numpy(zero_copy_only=False)


def _empty(*cols: str) -> pa.Table:
    return pa.table({c: pa.array([], pa.int64()) for c in cols})


def _tarjan_vishkin(graph: Graph, num_partitions: int) -> Dict[str, ray.data.Dataset]:
    """Shared TV pipeline: returns materialized datasets
    ``und`` (lo, hi, is_tree, child), ``tree`` (parent, child),
    ``forest`` (vertex, root, depth, parent) and ``comp`` (vertex, label)
    — the auxiliary-graph component label per non-root vertex-rep."""
    forest = bfs_forest(graph, num_partitions)

    # simple undirected loop-free view
    def _canon(b: pa.Table) -> pa.Table:
        s = _np(b, "src").astype(np.int64)
        d = _np(b, "dst").astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"lo": pa.array(np.minimum(s, d)),
                         "hi": pa.array(np.maximum(s, d))})

    und = graph.edges.map_batches(_canon, batch_format="pyarrow",
                                  batch_size=None) \
        .groupby(["lo", "hi"]).count()
    und = und.map_batches(
        lambda b: (pa.table({"lo": b["lo"], "hi": b["hi"]})
                   if b.num_rows and "lo" in b.column_names
                   else _empty("lo", "hi")),
        batch_format="pyarrow", batch_size=None).materialize()

    # tree edges (parent, child); roots point at themselves and are dropped
    tree = forest.map_batches(
        lambda b: pa.table({"parent": b["parent"], "child": b["vertex"]}),
        batch_format="pyarrow", batch_size=None)
    tree = tree.map_batches(
        lambda b: (lambda p, c: pa.table(
            {"parent": pa.array(p[p != c]), "child": pa.array(c[p != c])}))(
            _np(b, "parent"), _np(b, "child")),
        batch_format="pyarrow", batch_size=None).materialize()

    # mark tree edges on the canonical view
    treec = tree.map_batches(
        lambda b: (lambda p, c: pa.table(
            {"lo": pa.array(np.minimum(p, c)), "hi": pa.array(np.maximum(p, c)),
             "child": pa.array(c)}))(_np(b, "parent"), _np(b, "child")),
        batch_format="pyarrow", batch_size=None)
    und = hash_join(und, treec, on=["lo", "hi"], num_partitions=num_partitions,
                    join_type="left_outer").materialize()

    def _split_child(b: pa.Table):
        if b.num_rows == 0 or "lo" not in b.column_names:
            return None, None, None
        lo, hi = _np(b, "lo"), _np(b, "hi")
        if "child" in b.column_names:
            ch = _np(b, "child")
            is_tree = (np.ones(len(ch), bool) if ch.dtype == np.int64
                       else ~np.isnan(ch.astype(np.float64)))
        else:
            is_tree = np.zeros(len(lo), bool)
        return lo, hi, is_tree

    # subtree sizes
    ones = forest.map_batches(
        lambda b: pa.table({"vertex": b["vertex"],
                            "sz": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow", batch_size=None)
    sizes = _subtree_sweep(forest, ones, {"sz": "sum"}, num_partitions) \
        .materialize()

    # sibling offsets: per parent, children in ascending id order;
    # off(w) = Σ size of smaller siblings
    tsz = hash_join(tree, sizes.map_batches(
        lambda b: pa.table({"child": b["vertex"], "sz": b["sz"]}),
        batch_format="pyarrow", batch_size=None),
        on="child", num_partitions=num_partitions)
    bnds = compute_boundaries(tsz, num_partitions, col="parent")
    tsz_s = tsz.sort("parent", boundaries=bnds) if bnds else tsz.sort("parent")

    def _offsets(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "parent" not in b.column_names:
            return _empty("vertex", "off")
        p, c, sz = _np(b, "parent"), _np(b, "child"), _np(b, "sz")
        order = np.lexsort((c, p))
        p, c, sz = p[order], c[order], sz[order]
        first = np.r_[True, p[1:] != p[:-1]]
        cum = np.cumsum(sz) - sz          # exclusive prefix over the block
        seg_base = np.maximum.accumulate(np.where(first, cum, -1))
        return pa.table({"vertex": pa.array(c),
                         "off": pa.array(cum - seg_base)})

    offs = tsz_s.map_batches(_offsets, batch_format="pyarrow",
                             batch_size=None).materialize()

    # preorder via pointer-doubling path sums: pre(v) = depth(v) + S(v)
    pd = hash_join(forest, offs, on="vertex", num_partitions=num_partitions,
                   join_type="left_outer")

    def _pd_init(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return _empty("v", "ptr", "s")
        v, p = _np(b, "vertex"), _np(b, "parent")
        if "off" in b.column_names:
            o = _np(b, "off")
            o = (np.where(np.isnan(o.astype(np.float64)), 0, o).astype(np.int64)
                 if o.dtype != np.int64 else o)
        else:
            o = np.zeros(len(v), np.int64)
        o = np.where(p == v, 0, o)        # roots contribute nothing
        return pa.table({"v": pa.array(v), "ptr": pa.array(p),
                         "s": pa.array(o)})

    chain = pd.map_batches(_pd_init, batch_format="pyarrow",
                           batch_size=None).materialize()
    max_depth = int(forest.max("depth") or 0)
    rounds = max(0, int(np.ceil(np.log2(max_depth + 1))) if max_depth else 0)
    for _ in range(rounds + 1):
        nxt = chain.map_batches(
            lambda b: (pa.table({"ptr": b["v"], "ptr2": b["ptr"],
                                 "s2": b["s"]})
                       if b.num_rows and "v" in b.column_names
                       else _empty("ptr", "ptr2", "s2")),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(chain, nxt, on="ptr", num_partitions=num_partitions)

        def _double(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "v" not in b.column_names:
                return _empty("v", "ptr", "s")
            return pa.table({"v": b["v"], "ptr": b["ptr2"],
                             "s": pa.array(_np(b, "s") + _np(b, "s2"))})

        chain = j.map_batches(_double, batch_format="pyarrow",
                              batch_size=None).materialize()

    pre = hash_join(forest, chain.map_batches(
        lambda b: (pa.table({"vertex": b["v"], "s": b["s"]})
                   if b.num_rows and "v" in b.column_names
                   else _empty("vertex", "s")),
        batch_format="pyarrow", batch_size=None),
        on="vertex", num_partitions=num_partitions)
    pre = pre.map_batches(
        lambda b: (pa.table({"vertex": b["vertex"],
                             "pre": pa.array(_np(b, "depth") + _np(b, "s"))})
                   if b.num_rows and "vertex" in b.column_names
                   else _empty("vertex", "pre")),
        batch_format="pyarrow", batch_size=None).materialize()

    # low/high bases: own pre, min/max'd with pre of non-tree neighbors
    plo = pre.map_batches(
        lambda b: pa.table({"lo": b["vertex"], "pre_lo": b["pre"]}),
        batch_format="pyarrow", batch_size=None)
    phi = pre.map_batches(
        lambda b: pa.table({"hi": b["vertex"], "pre_hi": b["pre"]}),
        batch_format="pyarrow", batch_size=None)
    undp = hash_join(hash_join(und, plo, on="lo",
                               num_partitions=num_partitions),
                     phi, on="hi", num_partitions=num_partitions)

    def _nt_base(b: pa.Table) -> pa.Table:
        lo, hi, is_tree = _split_child(b)
        if lo is None or "pre_lo" not in b.column_names:
            return _empty("vertex", "bl", "bh")
        pl, ph = _np(b, "pre_lo"), _np(b, "pre_hi")
        nt = ~is_tree
        v = np.concatenate([lo[nt], hi[nt]])
        o = np.concatenate([ph[nt], pl[nt]])
        return pa.table({"vertex": pa.array(v), "bl": pa.array(o),
                         "bh": pa.array(o)})

    nt = undp.map_batches(_nt_base, batch_format="pyarrow", batch_size=None)
    own = pre.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "bl": b["pre"],
                            "bh": b["pre"]}),
        batch_format="pyarrow", batch_size=None)
    base = _assoc_combine(nt.union(own), "vertex",
                          {"bl": "min", "bh": "max"}, num_partitions)
    lowhigh = _subtree_sweep(forest, base, {"bl": "min", "bh": "max"},
                             num_partitions).materialize()

    # auxiliary edges
    def _rule_i(b: pa.Table) -> pa.Table:
        lo, hi, is_tree = _split_child(b)
        if lo is None:
            return _empty("src", "dst")
        nt = ~is_tree
        return pa.table({"src": pa.array(lo[nt]), "dst": pa.array(hi[nt])})

    aux_i = und.map_batches(_rule_i, batch_format="pyarrow", batch_size=None)

    # rule (ii): join tree with pre/size of parent and low/high of child
    info_p = hash_join(
        pre, sizes, on="vertex", num_partitions=num_partitions)
    info_p = info_p.map_batches(
        lambda b: (pa.table({"parent": b["vertex"], "pre_p": b["pre"],
                             "sz_p": b["sz"]})
                   if b.num_rows and "vertex" in b.column_names
                   else _empty("parent", "pre_p", "sz_p")),
        batch_format="pyarrow", batch_size=None)
    info_c = lowhigh.map_batches(
        lambda b: pa.table({"child": b["vertex"], "low_c": b["bl"],
                            "high_c": b["bh"]}),
        batch_format="pyarrow", batch_size=None)
    roots = forest.map_batches(
        lambda b: (lambda v, p: pa.table(
            {"parent": pa.array(v[v == p]),
             "is_root": pa.array(np.ones(int((v == p).sum()), np.int64))}))(
            _np(b, "vertex"), _np(b, "parent")),
        batch_format="pyarrow", batch_size=None)
    t2 = hash_join(tree, info_p, on="parent", num_partitions=num_partitions)
    t2 = hash_join(t2, info_c, on="child", num_partitions=num_partitions)
    t2 = hash_join(t2, roots, on="parent", num_partitions=num_partitions,
                   join_type="left_outer")

    def _rule_ii(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "parent" not in b.column_names:
            return _empty("src", "dst")
        p, c = _np(b, "parent"), _np(b, "child")
        pre_p, sz_p = _np(b, "pre_p"), _np(b, "sz_p")
        low_c, high_c = _np(b, "low_c"), _np(b, "high_c")
        if "is_root" in b.column_names:
            ir = _np(b, "is_root")
            nonroot = (np.isnan(ir.astype(np.float64)) if ir.dtype != np.int64
                       else ir != 1)
        else:
            nonroot = np.ones(len(p), bool)
        link = nonroot & ((low_c < pre_p) | (high_c >= pre_p + sz_p))
        return pa.table({"src": pa.array(p[link]), "dst": pa.array(c[link])})

    aux_ii = t2.map_batches(_rule_ii, batch_format="pyarrow", batch_size=None)
    aux = aux_i.union(aux_ii).materialize()

    # components of the auxiliary graph; isolated reps label themselves
    reps = tree.map_batches(
        lambda b: pa.table({"vertex": b["child"]}),
        batch_format="pyarrow", batch_size=None)
    if aux.count() > 0:
        from igraph_ray.algorithms.components import connected_components

        labs = connected_components(Graph(aux, n=None),
                                    num_partitions=num_partitions,
                                    densify=False).state
        comp = hash_join(reps, labs, on="vertex",
                         num_partitions=num_partitions,
                         join_type="left_outer")
    else:
        comp = reps

    def _fill(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return _empty("vertex", "label")
        v = _np(b, "vertex")
        if "label" in b.column_names:
            l = _np(b, "label")
            l = (np.where(np.isnan(l.astype(np.float64)), v, l).astype(np.int64)
                 if l.dtype != np.int64 else l)
        else:
            l = v
        return pa.table({"vertex": pa.array(v), "label": pa.array(l)})

    comp = comp.map_batches(_fill, batch_format="pyarrow",
                            batch_size=None).materialize()
    return {"und": und, "tree": tree, "forest": forest, "comp": comp}


def articulation_points(
    graph: Graph, num_partitions: Optional[int] = None,
    _tv: Optional[Dict[str, ray.data.Dataset]] = None,
) -> ray.data.Dataset:
    """(vertex): every articulation point of the simple undirected view
    (igraph_articulation_points semantics — loops and multiplicities
    are irrelevant to vertex cuts).  ``_tv``: a precomputed
    ``_tarjan_vishkin`` result to share with biconnected_components."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    tv = _tv if _tv is not None else _tarjan_vishkin(graph, num_partitions)
    tree, comp, forest = tv["tree"], tv["comp"], tv["forest"]

    cw = hash_join(tree, comp.map_batches(
        lambda b: pa.table({"child": b["vertex"], "cw": b["label"]}),
        batch_format="pyarrow", batch_size=None),
        on="child", num_partitions=num_partitions)
    cw = hash_join(cw, comp.map_batches(
        lambda b: pa.table({"parent": b["vertex"], "cp": b["label"]}),
        batch_format="pyarrow", batch_size=None),
        on="parent", num_partitions=num_partitions, join_type="left_outer")

    bnds = compute_boundaries(cw, num_partitions, col="parent")
    cw_s = cw.sort("parent", boundaries=bnds) if bnds else cw.sort("parent")

    def _artic(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "parent" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64())})
        p = _np(b, "parent")
        w = _np(b, "cw")
        if "cp" in b.column_names:
            cp = _np(b, "cp")
            is_root = (np.isnan(cp.astype(np.float64)) if cp.dtype != np.int64
                       else np.zeros(len(cp), bool))
            cp = np.where(is_root, -1, np.nan_to_num(
                cp.astype(np.float64), nan=-1)).astype(np.int64)
        else:
            is_root = np.ones(len(p), bool)
            cp = np.full(len(p), -1, np.int64)
        order = np.lexsort((w, p))
        p, w, cp, is_root = p[order], w[order], cp[order], is_root[order]
        first = np.r_[True, p[1:] != p[:-1]]
        gid = np.cumsum(first) - 1
        n = int(gid[-1]) + 1
        # non-root: any child comp != own parent-edge comp
        mism = np.zeros(n, bool)
        np.logical_or.at(mism, gid, (w != cp) & ~is_root)
        # root: >= 2 distinct child comps (w sorted within group)
        newc = np.r_[True, (p[1:] != p[:-1]) | (w[1:] != w[:-1])]
        ndist = np.zeros(n, np.int64)
        np.add.at(ndist, gid, newc.astype(np.int64))
        rootg = np.zeros(n, bool)
        np.logical_or.at(rootg, gid, is_root)
        hit = np.where(rootg, ndist >= 2, mism)
        return pa.table({"vertex": pa.array(p[first][hit])})

    return cw_s.map_batches(_artic, batch_format="pyarrow", batch_size=None)


def biconnected_components(
    graph: Graph, num_partitions: Optional[int] = None,
    _tv: Optional[Dict[str, ray.data.Dataset]] = None,
) -> ray.data.Dataset:
    """(lo, hi, comp_lo, comp_hi): each simple undirected loop-free edge
    with the lexicographically minimal edge of its biconnected component
    as the component label (deterministic, parallelism-independent).
    ``_tv``: a precomputed ``_tarjan_vishkin`` result to share."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())

    tv = _tv if _tv is not None else _tarjan_vishkin(graph, num_partitions)
    und, comp = tv["und"], tv["comp"]

    # every edge inherits the component of its hi endpoint's rep for
    # non-tree edges (rule (i) makes both reps equivalent) and of the
    # child rep for tree edges.  hi is never a root (roots are only in
    # tree edges, as the parent == lo side... not guaranteed: the child
    # of a root may be lo or hi).  Use the marked child when present,
    # else hi (non-tree edges never touch roots).
    def _rep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return _empty("lo", "hi", "rep")
        lo, hi = _np(b, "lo"), _np(b, "hi")
        if "child" in b.column_names:
            ch = _np(b, "child")
            if ch.dtype != np.int64:
                chf = ch.astype(np.float64)
                rep = np.where(np.isnan(chf), hi, chf).astype(np.int64)
            else:
                rep = ch
        else:
            rep = hi
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                         "rep": pa.array(rep)})

    er = und.map_batches(_rep, batch_format="pyarrow", batch_size=None)
    lab = hash_join(er, comp.map_batches(
        lambda b: pa.table({"rep": b["vertex"], "label": b["label"]}),
        batch_format="pyarrow", batch_size=None),
        on="rep", num_partitions=num_partitions).materialize()

    # canonical component key: lexicographically minimal (lo, hi) member
    m1 = _assoc_combine(lab.map_batches(
        lambda b: (pa.table({"label": b["label"], "mlo": b["lo"]})
                   if b.num_rows and "label" in b.column_names
                   else _empty("label", "mlo")),
        batch_format="pyarrow", batch_size=None),
        "label", {"mlo": "min"}, num_partitions)
    lab2 = hash_join(lab, m1, on="label", num_partitions=num_partitions)

    def _hi_candidates(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "label" not in b.column_names:
            return _empty("label", "mhi")
        lo, hi = _np(b, "lo"), _np(b, "hi")
        mlo = _np(b, "mlo")
        keep = lo == mlo
        return pa.table({"label": pa.array(_np(b, "label")[keep]),
                         "mhi": pa.array(hi[keep])})

    m2 = _assoc_combine(
        lab2.map_batches(_hi_candidates, batch_format="pyarrow",
                         batch_size=None),
        "label", {"mhi": "min"}, num_partitions)
    key = hash_join(m1, m2, on="label", num_partitions=num_partitions)
    out = hash_join(lab, key, on="label", num_partitions=num_partitions)
    return out.map_batches(
        lambda b: (pa.table({"lo": b["lo"], "hi": b["hi"],
                             "comp_lo": b["mlo"], "comp_hi": b["mhi"]})
                   if b.num_rows and "lo" in b.column_names
                   else _empty("lo", "hi", "comp_lo", "comp_hi")),
        batch_format="pyarrow", batch_size=None)
