"""Subgraph isomorphism counting (VF2 family).

Reference semantics: igraph_count_subisomorphisms_vf2 /
igraph_subisomorphic_vf2 (/root/reference/src/topology.c — VF2,
Cordella et al. 2004): the number of injective vertex maps from a small
PATTERN graph into the target graph such that every pattern edge maps
onto a target edge (non-induced matches, the reference's default).

The reference's recursive VF2 search is sequential; the Ray-native
engine re-expresses counting as the classic distributed *binding-join
plan* (worst-case-optimal-join folklore; same shape as the engine's
wedge join): pattern vertices are bound one at a time in a connected
order, each step one hash join of the partial-binding Dataset against
the target edge table, followed by vectorized checks of the remaining
pattern edges (packed-key semi joins) and the injectivity filter.
Patterns are tiny (broadcast); the partial-binding stream is the only
big data and it never lands on the driver.

``isomorphic_small`` closes the igraph_isomorphic surface for tiny
graphs: exact permutation search, guarded to ≤ 8 vertices (documented
ceiling like the maximal-cliques broadcast plan).
"""

from __future__ import annotations

from itertools import permutations
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join


def _pattern_order(p: int, pedges: List[Tuple[int, int]]) -> List[int]:
    """BFS order from vertex 0; every later vertex touches an earlier
    one (the pattern must be connected)."""
    adj = [[] for _ in range(p)]
    for a, b in pedges:
        adj[a].append(b)
        adj[b].append(a)
    seen = [False] * p
    order = [0]
    seen[0] = True
    i = 0
    while i < len(order):
        for nb in sorted(adj[order[i]]):
            if not seen[nb]:
                seen[nb] = True
                order.append(nb)
        i += 1
    if len(order) != p:
        raise ValueError("pattern must be connected")
    return order


def _lad_domains(E, pedges, p: int, num_partitions: int):
    """LAD-style candidate domains (Solnon 2010, the lad.c approach the
    reference bundles): for each pattern vertex v, the target vertices
    whose degree is >= deg_p(v) AND whose sorted neighbor-degree
    sequence dominates v's pattern-neighbor degrees. Built from ONE
    profile table (vertex, deg, nd1..ndK) — a degree join + boundary-
    aligned sort + per-group top-K — then one filter per pattern
    vertex. Returns {pattern vertex: single-column domain Dataset}.
    Undirected E (symmetrized) only; directed callers use plain degree
    prefilters."""
    from igraph_ray.csr import compute_boundaries

    padj = [[] for _ in range(p)]
    for a, b in pedges:
        padj[a].append(b)
        padj[b].append(a)
    pdeg = [len(set(x)) for x in padj]
    K = max(pdeg)

    deg = E.groupby("a").count()
    degb = deg.map_batches(
        lambda b: (pa.table({"b": b["a"], "degb": b["count()"]})
                   if b.num_rows else
                   pa.table({"b": pa.array([], pa.int64()),
                             "degb": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None)
    nb = hash_join(E, degb, on="b", num_partitions=num_partitions)
    nb = nb.map_batches(
        lambda b: (b.select(["a", "degb"]) if "degb" in b.column_names
                   else pa.table({"a": pa.array([], pa.int64()),
                                  "degb": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None).materialize()
    bnds = compute_boundaries(nb, num_partitions, col="a")
    nbs = nb.sort("a", boundaries=bnds) if bnds else nb.sort("a")

    def _profile(b: pa.Table, K=K) -> pa.Table:
        cols = {"v": pa.array([], pa.int64()),
                "deg": pa.array([], pa.int64())}
        cols.update({f"nd{k}": pa.array([], pa.int64())
                     for k in range(1, K + 1)})
        if b.num_rows == 0:
            return pa.table(cols)
        a = b["a"].to_numpy(zero_copy_only=False)
        d = b["degb"].to_numpy(zero_copy_only=False)
        # groups are block-intact (boundary-aligned sort); order inside
        # a group: descending neighbor degree
        order = np.lexsort((-d, a))
        a, d = a[order], d[order]
        start = np.r_[True, a[1:] != a[:-1]]
        starts = np.flatnonzero(start)
        ends = np.append(starts[1:], len(a))
        verts = a[starts]
        degv = (ends - starts).astype(np.int64)
        out = {"v": pa.array(verts), "deg": pa.array(degv)}
        for k in range(1, K + 1):
            idx = starts + (k - 1)
            valid = idx < ends
            ndk = np.where(valid, d[np.minimum(idx, len(d) - 1)], 0)
            out[f"nd{k}"] = pa.array(ndk.astype(np.int64))
        return pa.table(out)

    profile = nbs.map_batches(_profile, batch_format="pyarrow",
                              batch_size=None).materialize()

    domains = {}
    for v in range(p):
        q = sorted((pdeg[u] for u in set(padj[v])), reverse=True)
        conds = [f"deg >= {pdeg[v]}"]
        conds += [f"nd{k} >= {qk}" for k, qk in enumerate(q, 1)]
        domains[v] = (profile.filter(expr=" and ".join(conds))
                      .select_columns(["v"]))
    return domains


def _directed_degree_domains(E, pedges, p: int, num_partitions: int):
    """Directed-pattern candidate domains: target out-degree >= the
    pattern vertex's out-degree AND in-degree >= its in-degree. One
    per-batch pre-combined pass + one grouped sum builds the (v, o, i)
    profile; one filter per pattern vertex."""
    pout = [0] * p
    pin = [0] * p
    for a, b in set(pedges):
        pout[a] += 1
        pin[b] += 1

    def _pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "o": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64())})
        a = b["a"].to_numpy(zero_copy_only=False)
        d = b["b"].to_numpy(zero_copy_only=False)
        va, ca = np.unique(a, return_counts=True)
        vb, cb = np.unique(d, return_counts=True)
        return pa.table({
            "v": pa.array(np.concatenate([va, vb])),
            "o": pa.array(np.concatenate(
                [ca.astype(np.int64), np.zeros(len(vb), np.int64)])),
            "i": pa.array(np.concatenate(
                [np.zeros(len(va), np.int64), cb.astype(np.int64)]))})

    prof = (E.map_batches(_pre, batch_format="pyarrow", batch_size=None)
            .groupby("v").sum(["o", "i"])
            .map_batches(
                lambda b: (pa.table({"v": b["v"], "o": b["sum(o)"],
                                     "i": b["sum(i)"]})
                           if b.num_rows else
                           pa.table({"v": pa.array([], pa.int64()),
                                     "o": pa.array([], pa.int64()),
                                     "i": pa.array([], pa.int64())})),
                batch_format="pyarrow", batch_size=None)
            .materialize())
    return {v: (prof.filter(expr=f"o >= {pout[v]} and i >= {pin[v]}")
                .select_columns(["v"]))
            for v in range(p)}


def count_sub_isomorphisms(
    graph: Graph,
    pattern_src: Sequence[int],
    pattern_dst: Sequence[int],
    directed: bool = False,
    num_partitions: int = 8,
    return_bindings: bool = False,
    domain_filter: Optional[bool] = None,
):
    """Number of injective maps pattern → graph preserving pattern edges
    (non-induced). Undirected mode matches over the symmetrized simple
    view (each pattern edge may map to either direction).

    ``return_bindings=True`` returns (bindings, colmap) instead of the
    count: the full embedding stream as a Dataset whose column
    colmap[v] holds the image of pattern vertex v in each row — the
    building block for the fork's FSM support measures
    (fsm.c:745/890/959 mib/ego/shallow).

    ``domain_filter``: LAD-style candidate-domain pruning (lad.c's
    filtering idea) — a semi-join of every freshly-bound column
    against its pattern vertex's domain. Undirected: degree +
    neighborhood-degree-sequence dominance; directed: out/in-degree
    thresholds. Defaults to on for patterns with >= 6 vertices (where
    the binding stream would otherwise explode); the small pinned
    patterns keep the bare plan."""
    pedges = [(int(a), int(b)) for a, b in zip(pattern_src, pattern_dst)
              if int(a) != int(b)]
    if not pedges:
        raise ValueError("pattern needs at least one edge")
    p = max(max(a, b) for a, b in pedges) + 1
    order = _pattern_order(p, pedges)
    pos = {v: i for i, v in enumerate(order)}

    # target adjacency as a directed row set; undirected = both ways
    def _adj(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        if not directed:
            s, d = np.concatenate([s, d]), np.concatenate([d, s])
        t = pa.table({"a": pa.array(s), "b": pa.array(d)})
        return t.group_by(["a", "b"]).aggregate([])

    E = (graph.edges.map_batches(_adj, batch_format="pyarrow",
                                 batch_size=None)
         .groupby(["a", "b"]).count().select_columns(["a", "b"])
         .materialize())
    colmap = {v: f"c{pos[v]}" for v in range(p)}
    if E.count() == 0:
        if return_bindings:
            empty = ray.data.from_arrow(pa.table(
                {f"c{k}": pa.array([], pa.int64()) for k in range(p)}))
            return empty, colmap
        return 0

    def _has_edge(u: int, v: int) -> Optional[bool]:
        """Pattern-edge direction test: does pattern require u→v / u~v?"""
        if directed:
            return (u, v) in pedges
        return (u, v) in pedges or (v, u) in pedges

    if domain_filter is None:
        domain_filter = p >= 6
    if not domain_filter:
        domains = {}
    elif directed:
        domains = _directed_degree_domains(E, pedges, p, num_partitions)
    else:
        domains = _lad_domains(E, pedges, p, num_partitions)

    def _apply_domain(ds, v):
        if v not in domains:
            return ds
        cv = f"c{pos[v]}"
        dom = domains[v].map_batches(
            lambda b, cv=cv: (b.rename_columns([cv]) if b.num_rows else
                              pa.table({cv: pa.array([], pa.int64())})),
            batch_format="pyarrow", batch_size=None)
        return hash_join(ds, dom, on=cv, num_partitions=num_partitions,
                         join_type="left_semi").materialize()

    # ---- seed: bind the first two pattern vertices over one edge ------
    v0, v1 = order[0], order[1]
    if directed and not _has_edge(v0, v1):
        # only v1→v0 exists: seed from the reversed edge
        seed = E.map_batches(
            lambda b: pa.table({f"c{0}": b["b"], f"c{1}": b["a"]}),
            batch_format="pyarrow", batch_size=None)
    else:
        seed = E.map_batches(
            lambda b: pa.table({f"c{0}": b["a"], f"c{1}": b["b"]}),
            batch_format="pyarrow", batch_size=None)
    state = seed.materialize()
    state = _apply_domain(state, v0)
    state = _apply_domain(state, v1)
    bound = [v0, v1]

    # directed patterns with BOTH v0→v1 and v1→v0 need the extra check
    extra_seed = []
    if directed and (v0, v1) in pedges and (v1, v0) in pedges:
        extra_seed.append((v1, v0))

    def _check_edges(ds, checks: List[Tuple[int, int]]):
        """Semi-join the binding stream against E for each (u, v)
        pattern edge (u, v already bound)."""
        for (u, v) in checks:
            cu, cv = f"c{pos[u]}", f"c{pos[v]}"
            probe = ds.map_batches(
                lambda b, cu=cu, cv=cv: b.append_column(
                    "a", b[cu]).append_column("b", b[cv]),
                batch_format="pyarrow", batch_size=None)
            ds = hash_join(probe, E, on=("a", "b"),
                           num_partitions=num_partitions,
                           join_type="left_semi")
            ds = ds.map_batches(
                lambda b: b.drop_columns(["a", "b"])
                if "a" in b.column_names else b,
                batch_format="pyarrow", batch_size=None).materialize()
        return ds

    state = _check_edges(state, extra_seed)

    for vi in order[2:]:
        # anchor: an already-bound pattern neighbor
        anchors = [u for u in bound if _has_edge(u, vi) or _has_edge(vi, u)]
        anchor = anchors[0]
        ca = f"c{pos[anchor]}"
        # expand along anchor→vi (or vi→anchor when only that exists)
        fwd = _has_edge(anchor, vi)
        join_col = "a" if fwd else "b"
        new_col = "b" if fwd else "a"
        probe = state.map_batches(
            lambda b, ca=ca, join_col=join_col:
            b.append_column(join_col, b[ca]),
            batch_format="pyarrow", batch_size=None)
        joined = hash_join(probe, E, on=join_col,
                           num_partitions=num_partitions)

        ci = f"c{pos[vi]}"

        def _bind(b: pa.Table, ci=ci, new_col=new_col,
                  nb=len(bound)) -> pa.Table:
            if b.num_rows == 0 or new_col not in b.column_names:
                cols = {f"c{k}": pa.array([], pa.int64())
                        for k in range(nb)}
                cols[ci] = pa.array([], pa.int64())
                return pa.table(cols)
            newv = b[new_col].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.ones(len(newv), dtype=bool)
            for k in range(nb):
                keep &= (newv
                         != b[f"c{k}"].to_numpy(zero_copy_only=False))
            t = b.drop_columns([c for c in ("a", "b")
                                if c in b.column_names])
            t = t.append_column(ci, pa.array(newv))
            return t.filter(pa.array(keep))

        state = joined.map_batches(_bind, batch_format="pyarrow",
                                   batch_size=None).materialize()
        state = _apply_domain(state, vi)
        if state.count() == 0 and not return_bindings:
            return 0
        # remaining pattern edges between vi and other bound vertices
        checks = []
        for u in bound:
            if u == anchor:
                # anchor covered by the expansion join except the
                # reverse direction of a directed mutual edge
                if directed and _has_edge(anchor, vi) and _has_edge(vi, anchor):
                    checks.append((vi, anchor))
                continue
            if directed:
                if _has_edge(u, vi):
                    checks.append((u, vi))
                if _has_edge(vi, u):
                    checks.append((vi, u))
            else:
                if _has_edge(u, vi):
                    checks.append((u, vi))
        state = _check_edges(state, checks)
        bound.append(vi)

    if return_bindings:
        return state, colmap
    return int(state.count())


def isomorphic_small(
    g1_src, g1_dst, n1: int, g2_src, g2_dst, n2: int,
    directed: bool = False, max_vertices: int = 8,
) -> bool:
    """igraph_isomorphic for tiny graphs: exact permutation search,
    guarded to ``max_vertices`` (an exponential problem — the honest
    small-graph ceiling; use canonical invariants + count_sub_isomorphisms
    for pattern work at scale)."""
    if n1 != n2:
        return False
    if n1 > max_vertices:
        raise NotImplementedError(
            f"isomorphic_small is guarded to {max_vertices} vertices")

    def _eset(src, dst):
        out = set()
        for a, b in zip(src, dst):
            a, b = int(a), int(b)
            if a == b:
                continue
            out.add((a, b) if directed else (min(a, b), max(a, b)))
        return out

    e1 = _eset(g1_src, g1_dst)
    e2 = _eset(g2_src, g2_dst)
    if len(e1) != len(e2):
        return False
    for perm in permutations(range(n1)):
        mapped = {(perm[a], perm[b]) if directed
                  else (min(perm[a], perm[b]), max(perm[a], perm[b]))
                  for a, b in e1}
        if mapped == e2:
            return True
    return False


# ------------------------------------------------------------- VF2 -----

def _wl_colors(n: int, src: np.ndarray, dst: np.ndarray,
               directed: bool, rounds: int = 10) -> np.ndarray:
    """1-WL color refinement (iterated neighborhood-multiset hashing),
    vectorized: each round sorts (vertex, neighbor_color) pairs and
    densifies the (own_color, sorted neighbor colors) signature. Colors
    are comparable BETWEEN two graphs because the signature densify uses
    lexicographic rank over the union (callers pass both graphs stacked
    with a graph-id offset and split after)."""
    col = np.zeros(n, dtype=np.int64)
    if not directed:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    for _ in range(rounds):
        # signature: own color + sorted multiset of in-neighbor colors,
        # hashed via sorted (dst, col[src]) runs
        order = np.lexsort((col[src], dst))
        d_s, c_s = dst[order], col[src][order]
        # per-vertex rolling hash of the sorted color run (splitmix-ish)
        h = np.zeros(n, dtype=np.uint64)
        x = (c_s.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        # position-sensitive within the sorted run keeps multiset order
        # canonical: h = sum of mix(color)*(pos+1) over the sorted run
        if len(d_s):
            starts = np.r_[0, 1 + np.flatnonzero(d_s[1:] != d_s[:-1])]
            pos = np.arange(len(d_s), dtype=np.uint64)
            pos -= np.repeat(pos[starts], np.diff(np.r_[starts, len(d_s)]))
            contrib = x * (pos + np.uint64(1))
            sums = np.add.reduceat(contrib, starts)
            h[d_s[starts]] = sums
        sig = np.stack([col.astype(np.uint64), h], axis=1)
        _, new = np.unique(sig, axis=0, return_inverse=True)
        if new.max(initial=0) == col.max(initial=0) and len(np.unique(new)) == len(np.unique(col)):
            col = new.astype(np.int64)
            break
        col = new.astype(np.int64)
    return col


def isomorphic_vf2(
    g1_src, g1_dst, n1: int, g2_src, g2_dst, n2: int,
    directed: bool = False, max_edges: int = 1 << 22,
) -> Tuple[bool, Optional[np.ndarray]]:
    """igraph_isomorphic_vf2 (topology.c; Cordella et al. 2004): exact
    graph isomorphism with WL color-refinement invariants as the
    candidate filter. Returns (iso, mapping g1→g2 or None).

    Plan: both graphs are broadcast into one worker (guarded to
    ``max_edges`` — the same honest ceiling style as maximal_cliques);
    WL refinement runs over the two graphs stacked so the color ids are
    directly comparable, then a VF2 backtracking search binds vertices
    in rarest-color-first order with candidates restricted to the same
    WL color and adjacency-consistency checked incrementally. On
    irregular graphs refinement is discrete and the search is linear."""
    src1 = np.asarray(g1_src, dtype=np.int64)
    dst1 = np.asarray(g1_dst, dtype=np.int64)
    src2 = np.asarray(g2_src, dtype=np.int64)
    dst2 = np.asarray(g2_dst, dtype=np.int64)
    if n1 != n2 or len(src1) != len(src2):
        return False, None
    if len(src1) > max_edges:
        raise NotImplementedError(
            f"isomorphic_vf2 broadcast plan is guarded to {max_edges} edges")
    n = n1
    # stacked WL so colors are cross-graph comparable
    col = _wl_colors(2 * n,
                     np.concatenate([src1, src2 + n]),
                     np.concatenate([dst1, dst2 + n]), directed)
    c1, c2 = col[:n], col[n:]
    h1 = np.sort(c1)
    h2 = np.sort(c2)
    if not np.array_equal(h1, h2):
        return False, None

    def _adj_sets(src, dst):
        out = [set() for _ in range(n)]
        inn = [set() for _ in range(n)]
        for a, b in zip(src.tolist(), dst.tolist()):
            out[a].add(b)
            inn[b].add(a)
            if not directed:
                out[b].add(a)
                inn[a].add(b)
        return out, inn

    out1, in1 = _adj_sets(src1, dst1)
    out2, in2 = _adj_sets(src2, dst2)

    # candidates per g1 vertex: g2 vertices of the same WL color
    from collections import defaultdict
    by_color: dict = defaultdict(list)
    for v in range(n):
        by_color[int(c2[v])].append(v)
    mapping = np.full(n, -1, dtype=np.int64)
    used = np.zeros(n, dtype=bool)

    def _ok(v1: int, v2: int) -> bool:
        for u1 in out1[v1]:
            m = mapping[u1]
            if m >= 0 and m not in out2[v2]:
                return False
        for u1 in in1[v1]:
            m = mapping[u1]
            if m >= 0 and m not in in2[v2]:
                return False
        # reverse direction needs no explicit check for SIMPLE graphs:
        # |E1| == |E2| (checked on entry) and every g1 edge maps onto a
        # distinct g2 edge once both endpoints are bound, so the image
        # covers all of E2 — extra g2 edges between mapped pairs cannot
        # exist at a full binding (the reference's VF2 likewise requires
        # simple graphs, topology.c).
        return (len(out1[v1]) == len(out2[v2])
                and len(in1[v1]) == len(in2[v2]))

    # VF2 connectivity-guided dynamic order (Cordella et al. 2004 §III:
    # expand along the frontier of the partial mapping). A static
    # rarest-color order backtracks exponentially on graphs with many
    # WL-equivalent components — binding a vertex disconnected from the
    # mapped set gets no adjacency pruning. Here the next vertex is an
    # unmapped g1 vertex adjacent to the mapped set whenever one exists
    # (rarest color as tie-break), and its candidates come from the
    # image sets of its mapped neighbors, not the whole color class.
    unmapped: set = set(range(n))

    def _pick():
        best, best_key = None, None
        for v in unmapped:
            anch = 0
            for u in out1[v]:
                if mapping[u] >= 0:
                    anch += 1
            for u in in1[v]:
                if mapping[u] >= 0:
                    anch += 1
            key = (-anch, len(by_color[int(c1[v])]),
                   -(len(out1[v]) + len(in1[v])), v)
            if best_key is None or key < best_key:
                best, best_key = v, key
        return best

    def _cands(v1):
        # smallest image-derived candidate pool among mapped neighbors
        pool = None
        for u1 in in1[v1]:
            m = mapping[u1]
            if m >= 0 and (pool is None or len(out2[m]) < len(pool)):
                pool = out2[m]
        for u1 in out1[v1]:
            m = mapping[u1]
            if m >= 0 and (pool is None or len(in2[m]) < len(pool)):
                pool = in2[m]
        if pool is None:
            return by_color[int(c1[v1])]
        cc = int(c1[v1])
        return [v2 for v2 in pool if int(c2[v2]) == cc]

    def _search(i: int) -> bool:
        if i == n:
            return True
        v1 = _pick()
        unmapped.discard(v1)
        for v2 in _cands(v1):
            if used[v2] or not _ok(v1, v2):
                continue
            mapping[v1] = v2
            used[v2] = True
            if _search(i + 1):
                return True
            mapping[v1] = -1
            used[v2] = False
        unmapped.add(v1)
        return False

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, n + 100))
    try:
        found = _search(0)
    finally:
        sys.setrecursionlimit(old)
    return (True, mapping.copy()) if found else (False, None)


def isomorphic(g1: Graph, g2: Graph,
               directed: Optional[bool] = None) -> Tuple[bool, Optional[np.ndarray]]:
    """igraph_isomorphic surface over two Graphs: edge tables are pulled
    through one Ray task (broadcast small-graph plan), VF2 + WL runs
    there; the driver sees only (bool, mapping)."""
    if directed is None:
        directed = bool(g1.attrs.get("directed", True))
    n1, n2 = g1.num_vertices(), g2.num_vertices()

    def _cols(g: Graph):
        t = pa.concat_tables(
            [b.select(["src", "dst"])
             for b in g.edges.iter_batches(batch_format="pyarrow")]
            or [pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})])
        return (t["src"].to_numpy(zero_copy_only=False),
                t["dst"].to_numpy(zero_copy_only=False))

    s1, d1 = _cols(g1)
    s2, d2 = _cols(g2)

    @ray.remote
    def _run(s1, d1, s2, d2):
        return isomorphic_vf2(s1, d1, n1, s2, d2, n2, directed=directed)

    import ray as _ray
    return _ray.get(_run.remote(s1, d1, s2, d2))


def count_isomorphisms_vf2(
    g1_src, g1_dst, n1: int, g2_src, g2_dst, n2: int,
    directed: bool = False, max_edges: int = 1 << 20,
) -> int:
    """igraph_count_isomorphisms_vf2 (topology.c:1720): the number of
    complete isomorphism bindings g1→g2 — with g1 == g2 this is the
    automorphism-group order |Aut(G)|. Same WL-filtered VF2 search as
    ``isomorphic_vf2`` but exhaustive (every complete binding counted
    instead of returning at the first)."""
    src1 = np.asarray(g1_src, dtype=np.int64)
    dst1 = np.asarray(g1_dst, dtype=np.int64)
    src2 = np.asarray(g2_src, dtype=np.int64)
    dst2 = np.asarray(g2_dst, dtype=np.int64)
    if n1 != n2 or len(src1) != len(src2):
        return 0
    if len(src1) > max_edges:
        raise NotImplementedError(
            f"count_isomorphisms_vf2 broadcast plan is guarded to "
            f"{max_edges} edges (exhaustive enumeration)")
    n = n1
    col = _wl_colors(2 * n,
                     np.concatenate([src1, src2 + n]),
                     np.concatenate([dst1, dst2 + n]), directed)
    c1, c2 = col[:n], col[n:]
    if not np.array_equal(np.sort(c1), np.sort(c2)):
        return 0

    def _adj_sets(src, dst):
        out = [set() for _ in range(n)]
        inn = [set() for _ in range(n)]
        for a, b in zip(src.tolist(), dst.tolist()):
            out[a].add(b)
            inn[b].add(a)
            if not directed:
                out[b].add(a)
                inn[a].add(b)
        return out, inn

    out1, in1 = _adj_sets(src1, dst1)
    out2, in2 = _adj_sets(src2, dst2)
    from collections import defaultdict
    by_color: dict = defaultdict(list)
    for v in range(n):
        by_color[int(c2[v])].append(v)
    order = sorted(range(n),
                   key=lambda v: (len(by_color[int(c1[v])]),
                                  -(len(out1[v]) + len(in1[v]))))
    mapping = np.full(n, -1, dtype=np.int64)
    used = np.zeros(n, dtype=bool)

    def _ok(v1: int, v2: int) -> bool:
        for u1 in out1[v1]:
            m = mapping[u1]
            if m >= 0 and m not in out2[v2]:
                return False
        for u1 in in1[v1]:
            m = mapping[u1]
            if m >= 0 and m not in in2[v2]:
                return False
        return (len(out1[v1]) == len(out2[v2])
                and len(in1[v1]) == len(in2[v2]))

    count = 0

    def _search(i: int) -> None:
        nonlocal count
        if i == n:
            count += 1
            return
        v1 = order[i]
        for v2 in by_color[int(c1[v1])]:
            if used[v2] or not _ok(v1, v2):
                continue
            mapping[v1] = v2
            used[v2] = True
            _search(i + 1)
            mapping[v1] = -1
            used[v2] = False

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, n + 100))
    try:
        _search(0)
    finally:
        sys.setrecursionlimit(old)
    return count


def count_automorphisms(n: int, edges, directed: bool = False) -> int:
    """|Aut(G)| = igraph_count_isomorphisms_vf2(G, G) — runs the
    exhaustive VF2 in one Ray task."""
    src = np.asarray([e[0] for e in edges], dtype=np.int64)
    dst = np.asarray([e[1] for e in edges], dtype=np.int64)

    @ray.remote
    def _run():
        return count_isomorphisms_vf2(src, dst, n, src, dst, n,
                                      directed=directed)

    return int(ray.get(_run.remote()))


def _canon_code(edges, n: int, directed: bool) -> int:
    """Canonical adjacency bitcode of a ≤4-vertex graph: the minimum
    over all vertex permutations of the row-major adjacency bitmask.
    Equal codes ⇔ isomorphic (exhaustive for n ≤ 4)."""
    import itertools

    es = {(int(a), int(b)) for a, b in edges if int(a) != int(b)}
    if not directed:
        es = es | {(b, a) for a, b in es}
    best = None
    for perm in itertools.permutations(range(n)):
        code = 0
        for i in range(n):
            for j in range(n):
                if i != j:
                    code = (code << 1) | (
                        1 if (perm[i], perm[j]) in es else 0)
        if best is None or code < best:
            best = code
    return int(best or 0)


def isomorphic_34(edges1, n1: int, edges2, n2: int,
                  directed: bool = False) -> bool:
    """igraph_isomorphic_34 (topology.c): isomorphism decision for
    3- and 4-vertex graphs via exhaustive canonical codes (the
    reference uses its precomputed isoclass tables; equality of
    canonical forms is the same predicate)."""
    if n1 not in (3, 4) or n2 not in (3, 4):
        raise ValueError("isomorphic_34 is defined for 3/4-vertex "
                         "graphs only (topology.c contract)")
    if n1 != n2:
        return False
    return (_canon_code(edges1, n1, directed)
            == _canon_code(edges2, n2, directed))


def graph_isoclass3_directed(edges) -> int:
    """igraph_isoclass for a directed 3-vertex graph, in the
    reference's motif isoclass numbering — via the shared triad
    lookup tables (ops/census.py)."""
    from igraph_ray.ops.census import _CENSUS_TO_ISOCLASS, TRIAD_LOOKUP

    es = {(int(a), int(b)) for a, b in edges if int(a) != int(b)}
    key = 0
    for (x, y) in ((0, 1), (0, 2), (1, 2)):
        c = (1 if (x, y) in es else 0) | (2 if (y, x) in es else 0)
        key = key * 4 + c
    return int(_CENSUS_TO_ISOCLASS[int(TRIAD_LOOKUP[key])])


def is_subisomorphism(map21, target_edges, pattern_edges,
                      directed: bool = False, induced: bool = False,
                      vcolor_target=None, vcolor_pattern=None) -> bool:
    """igraph_is_subisomorphism (topology.c:1946, map21 branch): does
    the mapping pattern-vertex → target-vertex embed the pattern in
    the target? Checks injectivity, optional vertex colors, edge
    preservation, and (``induced``) that every target edge between
    mapped vertices is the image of a pattern edge. Fully vectorized
    over packed edge keys — suitable inside map_batches to verify
    candidate embeddings at scale."""
    m = np.asarray(map21, dtype=np.int64)
    if len(np.unique(m)) != len(m):
        return False
    if vcolor_target is not None and vcolor_pattern is not None:
        vt = np.asarray(vcolor_target)
        vp = np.asarray(vcolor_pattern)
        if not np.array_equal(vt[m], vp[: len(m)]):
            return False

    def _pack(src, dst):
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if not directed:
            lo = np.minimum(src, dst)
            hi = np.maximum(src, dst)
            src, dst = lo, hi
        return src << 32 | dst

    ts, td = (np.array([a for a, _ in target_edges], dtype=np.int64),
              np.array([b for _, b in target_edges], dtype=np.int64))
    ps, pd = (np.array([a for a, _ in pattern_edges], dtype=np.int64),
              np.array([b for _, b in pattern_edges], dtype=np.int64))
    tkeys = np.unique(_pack(ts, td))
    mapped = np.unique(_pack(m[ps], m[pd]))
    if not np.isin(mapped, tkeys).all():
        return False
    if induced:
        inmap = np.isin(ts, m) & np.isin(td, m)
        between = np.unique(_pack(ts[inmap], td[inmap]))
        if not np.isin(between, mapped).all():
            return False
    return True


def isoclass3_create(isoclass: int):
    """igraph_isoclass_create (topology.c) for directed 3-vertex
    graphs: the exemplar edge list of the given motif isoclass (the
    shared census exemplar table, in the reference's
    motifs_randesu numbering)."""
    from igraph_ray.ops.census import _CENSUS_TO_ISOCLASS, _EXEMPLARS

    inv = {m: c for c, m in enumerate(_CENSUS_TO_ISOCLASS)}
    if isoclass not in inv:
        raise ValueError(f"invalid directed 3-vertex isoclass "
                         f"{isoclass} (0..15)")
    return list(_EXEMPLARS[inv[isoclass]])


def isoclass3_subgraph(edges, triple) -> int:
    """igraph_isoclass_subgraph (topology.c) for a directed 3-vertex
    induced subgraph: the isoclass of the subgraph induced by the
    given vertex triple, vertices relabeled in the triple's order."""
    a, b, c = (int(v) for v in triple)
    pos = {a: 0, b: 1, c: 2}
    sub = [(pos[x], pos[y]) for x, y in edges
           if int(x) in pos and int(y) in pos and int(x) != int(y)]
    return graph_isoclass3_directed(sub)


def get_isomorphisms_vf2(
    g1_src, g1_dst, n1: int, g2_src, g2_dst, n2: int,
    directed: bool = False, max_edges: int = 1 << 20,
    max_isos: int = 1 << 20,
) -> List[np.ndarray]:
    """igraph_get_isomorphisms_vf2 (topology.c): EVERY complete
    isomorphism binding g1→g2, as a list of mapping arrays sorted
    lexicographically (with g1 == g2 this enumerates the automorphism
    group). Connectivity-guided VF2 under WL color invariants, guarded
    like the other exhaustive enumerations."""
    src1 = np.asarray(g1_src, dtype=np.int64)
    dst1 = np.asarray(g1_dst, dtype=np.int64)
    src2 = np.asarray(g2_src, dtype=np.int64)
    dst2 = np.asarray(g2_dst, dtype=np.int64)
    if n1 != n2 or len(src1) != len(src2):
        return []
    if len(src1) > max_edges:
        raise NotImplementedError(
            f"get_isomorphisms_vf2 broadcast plan is guarded to "
            f"{max_edges} edges (exhaustive enumeration)")
    n = n1
    col = _wl_colors(2 * n,
                     np.concatenate([src1, src2 + n]),
                     np.concatenate([dst1, dst2 + n]), directed)
    c1, c2 = col[:n], col[n:]
    if not np.array_equal(np.sort(c1), np.sort(c2)):
        return []

    def _adj_sets(src, dst):
        out = [set() for _ in range(n)]
        inn = [set() for _ in range(n)]
        for a, b in zip(src.tolist(), dst.tolist()):
            out[a].add(b)
            inn[b].add(a)
            if not directed:
                out[b].add(a)
                inn[a].add(b)
        return out, inn

    out1, in1 = _adj_sets(src1, dst1)
    out2, in2 = _adj_sets(src2, dst2)
    from collections import defaultdict
    by_color: dict = defaultdict(list)
    for v in range(n):
        by_color[int(c2[v])].append(v)
    mapping = np.full(n, -1, dtype=np.int64)
    used = np.zeros(n, dtype=bool)
    unmapped: set = set(range(n))

    def _ok(v1: int, v2: int) -> bool:
        for u1 in out1[v1]:
            m = mapping[u1]
            if m >= 0 and m not in out2[v2]:
                return False
        for u1 in in1[v1]:
            m = mapping[u1]
            if m >= 0 and m not in in2[v2]:
                return False
        return (len(out1[v1]) == len(out2[v2])
                and len(in1[v1]) == len(in2[v2]))

    def _pick():
        best, best_key = None, None
        for v in unmapped:
            anch = sum(1 for u in out1[v] if mapping[u] >= 0) + \
                sum(1 for u in in1[v] if mapping[u] >= 0)
            key = (-anch, len(by_color[int(c1[v])]),
                   -(len(out1[v]) + len(in1[v])), v)
            if best_key is None or key < best_key:
                best, best_key = v, key
        return best

    def _cands(v1):
        pool = None
        for u1 in in1[v1]:
            m = mapping[u1]
            if m >= 0 and (pool is None or len(out2[m]) < len(pool)):
                pool = out2[m]
        for u1 in out1[v1]:
            m = mapping[u1]
            if m >= 0 and (pool is None or len(in2[m]) < len(pool)):
                pool = in2[m]
        if pool is None:
            return by_color[int(c1[v1])]
        cc = int(c1[v1])
        return [v2 for v2 in pool if int(c2[v2]) == cc]

    found: List[np.ndarray] = []

    def _search(i: int) -> None:
        if len(found) >= max_isos:
            return
        if i == n:
            found.append(mapping.copy())
            return
        v1 = _pick()
        unmapped.discard(v1)
        for v2 in _cands(v1):
            if used[v2] or not _ok(v1, v2):
                continue
            mapping[v1] = v2
            used[v2] = True
            _search(i + 1)
            mapping[v1] = -1
            used[v2] = False
        unmapped.add(v1)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, n + 100))
    try:
        _search(0)
    finally:
        sys.setrecursionlimit(old)
    found.sort(key=lambda m: m.tolist())
    return found


def get_isomorphisms(g1: Graph, g2: Graph,
                     directed: Optional[bool] = None) -> "ray.data.Dataset":
    """Dataset surface of igraph_get_isomorphisms_vf2: (iso_id, vertex,
    image) rows, iso_id = lexicographic rank of the mapping. Edge
    tables are pulled through one Ray task (broadcast small-graph
    plan); the driver sees only the mapping stream."""
    if directed is None:
        directed = bool(g1.attrs.get("directed", True))
    n1, n2 = g1.num_vertices(), g2.num_vertices()

    def _cols(g: Graph):
        t = pa.concat_tables(
            [b.select(["src", "dst"])
             for b in g.edges.iter_batches(batch_format="pyarrow")]
            or [pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})])
        return (t["src"].to_numpy(zero_copy_only=False),
                t["dst"].to_numpy(zero_copy_only=False))

    s1, d1 = _cols(g1)
    s2, d2 = _cols(g2)

    @ray.remote
    def _run(s1, d1, s2, d2) -> pa.Table:
        maps = get_isomorphisms_vf2(s1, d1, n1, s2, d2, n2,
                                    directed=directed)
        if not maps:
            return pa.table({"iso_id": pa.array([], pa.int64()),
                             "vertex": pa.array([], pa.int64()),
                             "image": pa.array([], pa.int64())})
        k = len(maps)
        return pa.table({
            "iso_id": pa.array(np.repeat(np.arange(k, dtype=np.int64), n1)),
            "vertex": pa.array(np.tile(np.arange(n1, dtype=np.int64), k)),
            "image": pa.array(np.concatenate(maps))})

    return ray.data.from_arrow_refs([_run.remote(s1, d1, s2, d2)])


def canonical_permutation(g_src, g_dst, n: int, directed: bool = False,
                          max_branch: int = 1 << 16) -> np.ndarray:
    """igraph_canonical_permutation (topology.c BLISS surface): a
    labeling ``lab`` (lab[v] = canonical id) such that isomorphic
    graphs relabel to the identical canonical edge set.

    Individualization–refinement: iterated WL to a stable coloring;
    while a non-singleton class remains, branch on every member of the
    first one (individualize + re-refine), and keep the labeling whose
    relabeled sorted edge list is lexicographically smallest — the
    textbook IR canonical form (McKay/BLISS family), exact because all
    branches of each first target class are explored. Branching is
    guarded by ``max_branch`` explored leaves (honest ceiling, same
    style as the other exhaustive enumerations)."""
    src = np.asarray(g_src, dtype=np.int64)
    dst = np.asarray(g_dst, dtype=np.int64)
    out = [set() for _ in range(n)]
    inn = [set() for _ in range(n)]
    for a, b in zip(src.tolist(), dst.tolist()):
        out[a].add(b)
        inn[b].add(a)
        if not directed:
            out[b].add(a)
            inn[a].add(b)

    def _refine(col: Tuple[int, ...]) -> Tuple[int, ...]:
        col = np.asarray(col, dtype=np.int64)
        while True:
            sigs = []
            for v in range(n):
                so = tuple(sorted(col[u] for u in out[v]))
                si = (tuple(sorted(col[u] for u in inn[v]))
                      if directed else ())
                sigs.append((int(col[v]), so, si))
            ranks = {s: i for i, s in enumerate(sorted(set(sigs)))}
            new = np.array([ranks[s] for s in sigs], dtype=np.int64)
            if np.array_equal(new, col):
                return tuple(int(x) for x in new)
            col = new

    def _code(lab: np.ndarray):
        if directed:
            es = sorted(zip(lab[src].tolist(), lab[dst].tolist()))
        else:
            ls, ld = lab[src], lab[dst]
            es = sorted(zip(np.minimum(ls, ld).tolist(),
                            np.maximum(ls, ld).tolist()))
        return tuple(es)

    leaves = 0
    best_code = None
    best_lab = None

    def _classes(col):
        from collections import defaultdict
        by = defaultdict(list)
        for v, c in enumerate(col):
            by[c].append(v)
        return by

    def _search(col) -> None:
        nonlocal leaves, best_code, best_lab
        if leaves >= max_branch:
            raise NotImplementedError(
                f"canonical_permutation IR search exceeded {max_branch} "
                "leaves (highly symmetric input)")
        by = _classes(col)
        target = None
        for c in sorted(by):
            if len(by[c]) > 1:
                target = by[c]
                break
        if target is None:
            # discrete: labeling = color rank
            leaves += 1
            lab = np.empty(n, dtype=np.int64)
            order = sorted(range(n), key=lambda v: col[v])
            for i, v in enumerate(order):
                lab[v] = i
            code = _code(lab)
            if best_code is None or code < best_code:
                best_code, best_lab = code, lab.copy()
            return
        for v in target:
            col2 = list(col)
            col2[v] = -1  # individualize: unique smallest color
            _search(_refine(tuple(col2)))

    _search(_refine(tuple([0] * n)))
    return best_lab


def automorphism_generators(
    g_src, g_dst, n: int, directed: bool = False,
    max_edges: int = 1 << 20,
) -> Tuple[List[np.ndarray], int]:
    """igraph_automorphism_group (topology.c BLISS surface): a set of
    generators of Aut(G) plus the exact group order.

    Stabilizer-chain backtrack over the same WL-color-filtered VF2
    state as the exhaustive enumerations: for each base point
    b = 0..n-1 in order and each candidate image w (same WL color, not
    already in b's orbit under the generators found so far that fix
    0..b-1 pointwise), search for ONE automorphism fixing 0..b-1 with
    b -> w; every success is a strong generator. |Aut| is the product
    of the chain's orbit sizes (orbit-stabilizer theorem), with each
    level-b orbit closed over every generator whose level >= b once
    the sweep finishes. The generator SET is engine-deterministic but
    non-canonical — the reference's BLISS generators are likewise just
    "a" generating set, so parity is semantic (same group), checked in
    pytest by closing the generators to the full group and comparing
    against the exhaustive VF2 enumeration / published |Aut|."""
    src = np.asarray(g_src, dtype=np.int64)
    dst = np.asarray(g_dst, dtype=np.int64)
    if len(src) > max_edges:
        raise NotImplementedError(
            f"automorphism_generators broadcast plan is guarded to "
            f"{max_edges} edges (exhaustive backtrack)")
    col = _wl_colors(n, src, dst, directed)

    out = [set() for _ in range(n)]
    inn = [set() for _ in range(n)]
    for a, b in zip(src.tolist(), dst.tolist()):
        out[a].add(b)
        inn[b].add(a)
        if not directed:
            out[b].add(a)
            inn[a].add(b)
    from collections import defaultdict
    by_color: dict = defaultdict(list)
    for v in range(n):
        by_color[int(col[v])].append(v)

    def _find_fixing(b: int, w: int):
        """One automorphism with 0..b-1 -> themselves and b -> w, or
        None — connectivity-guided VF2 over the remaining vertices."""
        mapping = np.full(n, -1, dtype=np.int64)
        used = np.zeros(n, dtype=bool)

        def _ok(v1: int, v2: int) -> bool:
            if int(col[v1]) != int(col[v2]):
                return False
            for u1 in out[v1]:
                m = mapping[u1]
                if m >= 0 and m not in out[v2]:
                    return False
            for u1 in inn[v1]:
                m = mapping[u1]
                if m >= 0 and m not in inn[v2]:
                    return False
            return (len(out[v1]) == len(out[v2])
                    and len(inn[v1]) == len(inn[v2]))

        for v in range(b):
            mapping[v] = v
            used[v] = True
        if used[w] or not _ok(b, w):
            return None
        mapping[b] = w
        used[w] = True
        unmapped = set(range(b + 1, n))

        def _pick():
            best, best_key = None, None
            for v in unmapped:
                anch = (sum(1 for u in out[v] if mapping[u] >= 0)
                        + sum(1 for u in inn[v] if mapping[u] >= 0))
                key = (-anch, len(by_color[int(col[v])]),
                       -(len(out[v]) + len(inn[v])), v)
                if best_key is None or key < best_key:
                    best, best_key = v, key
            return best

        def _cands(v1):
            pool = None
            for u1 in inn[v1]:
                m = mapping[u1]
                if m >= 0 and (pool is None or len(out[m]) < len(pool)):
                    pool = out[m]
            for u1 in out[v1]:
                m = mapping[u1]
                if m >= 0 and (pool is None or len(inn[m]) < len(pool)):
                    pool = inn[m]
            if pool is None:
                return by_color[int(col[v1])]
            cc = int(col[v1])
            return [v2 for v2 in pool if int(col[v2]) == cc]

        def _search() -> bool:
            if not unmapped:
                return True
            v1 = _pick()
            unmapped.discard(v1)
            for v2 in sorted(_cands(v1)):
                if used[v2] or not _ok(v1, v2):
                    continue
                mapping[v1] = v2
                used[v2] = True
                if _search():
                    return True
                mapping[v1] = -1
                used[v2] = False
            unmapped.add(v1)
            return False

        import sys
        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, n + 100))
        try:
            found = _search()
        finally:
            sys.setrecursionlimit(old)
        return mapping.copy() if found else None

    gens: List[np.ndarray] = []
    gen_level: List[int] = []

    def _orbit(b: int) -> set:
        """Closure of {b} under the generators fixing 0..b-1."""
        active = [g for g, lv in zip(gens, gen_level) if lv >= b]
        seen = {b}
        frontier = [b]
        while frontier:
            x = frontier.pop()
            for g in active:
                y = int(g[x])
                if y not in seen:
                    seen.add(y)
                    frontier.append(y)
        return seen

    for b in range(n):
        for w in sorted(by_color[int(col[b])]):
            if w == b or w < b:
                continue
            if w in _orbit(b):
                continue
            g = _find_fixing(b, w)
            if g is not None:
                gens.append(g)
                gen_level.append(b)

    order = 1
    for b in range(n):
        order *= len(_orbit(b))
    return gens, order


def automorphism_group(g: Graph,
                       directed: Optional[bool] = None) -> "ray.data.Dataset":
    """Dataset surface of igraph_automorphism_group: one (gen_id,
    vertex, image) row per generator entry, gen_id in discovery order
    (stabilizer-chain level order — deterministic). The edge blocks go
    to one Ray task by object reference (assembled task-side, never on
    the driver); the driver sees only the generator stream."""
    if directed is None:
        directed = bool(g.attrs.get("directed", True))
    n = g.num_vertices()
    edge_refs = g.edges.to_arrow_refs()

    @ray.remote
    def _run(*blocks) -> pa.Table:
        t = pa.concat_tables(
            [b.select(["src", "dst"]) for b in blocks if b.num_rows]
            or [pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})])
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        gens, order = automorphism_generators(s, d, n, directed=directed)
        if not gens:
            # Trivial Aut(G): a single (gen_id=-1) sentinel row keeps
            # group_order observable (the reference reports the order
            # even for rigid graphs like frucht).
            return pa.table({"gen_id": pa.array([-1], pa.int64()),
                             "vertex": pa.array([-1], pa.int64()),
                             "image": pa.array([-1], pa.int64()),
                             "group_order": pa.array([order], pa.int64())})
        k = len(gens)
        return pa.table({
            "gen_id": pa.array(np.repeat(np.arange(k, dtype=np.int64), n)),
            "vertex": pa.array(np.tile(np.arange(n, dtype=np.int64), k)),
            "image": pa.array(np.concatenate(gens)),
            "group_order": pa.array(
                np.full(k * n, order, dtype=np.int64))})

    return ray.data.from_arrow_refs([_run.remote(*edge_refs)])
