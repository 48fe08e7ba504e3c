"""Relational operators over edge tables — the engine's equivalents of
igraph's predicates, set operations and structural transforms
(SURVEY.md §2.4, §2.9; operators.c, structural_properties.c).

Every function is a lazy Dataset transform (src:int64, dst:int64
[, weight]); wide steps use groupby with per-batch pre-dedup combiners.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.util import hash_join


def _dedup(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Exact distinct over (src, dst): per-batch pre-dedup combiner, then
    hash-partition groupby + per-group first (the canonical exact-dedup
    shape)."""

    def _local(b: pa.Table) -> pa.Table:
        return b.group_by(["src", "dst"]).aggregate([])

    return (
        edges.map_batches(_local, batch_format="pyarrow", batch_size=None)
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
    )


def simplify(edges: ray.data.Dataset, remove_loops: bool = True, remove_multiple: bool = True) -> ray.data.Dataset:
    """igraph_simplify (structural_properties.c:2248): drop loops and/or
    collapse multi-edges (directed interpretation: (a,b) and (b,a) stay
    distinct)."""
    out = edges.select_columns(["src", "dst"])
    if remove_loops:
        out = out.filter(expr="src != dst")
    if remove_multiple:
        out = _dedup(out)
    return out


def reverse(edges: ray.data.Dataset) -> ray.data.Dataset:
    def _flip(b: pa.Table) -> pa.Table:
        cols = {"src": b["dst"], "dst": b["src"]}
        if "weight" in b.column_names:
            cols["weight"] = b["weight"]
        return pa.table(cols)

    return edges.map_batches(_flip, batch_format="pyarrow", batch_size=None)


def to_undirected_collapse(edges: ray.data.Dataset) -> ray.data.Dataset:
    """igraph_to_undirected(mode=COLLAPSE) (conversion.c:413): canonical
    (lo,hi) per undirected edge, duplicates collapsed, loops preserved."""

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table(
            {"src": pc.min_element_wise(b["src"], b["dst"]),
             "dst": pc.max_element_wise(b["src"], b["dst"])}
        )

    return _dedup(edges.map_batches(_canon, batch_format="pyarrow", batch_size=None))


def union_edges(a: ray.data.Dataset, b: ray.data.Dataset) -> ray.data.Dataset:
    """igraph_union (operators.c:676): edge present in either, once."""
    return _dedup(a.select_columns(["src", "dst"]).union(b.select_columns(["src", "dst"])))


def intersection_edges(a: ray.data.Dataset, b: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_intersection (operators.c:389): edges present in both."""
    return hash_join(_dedup(a), _dedup(b), on=("src", "dst"), num_partitions=num_partitions)


def difference_edges(a: ray.data.Dataset, b: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_difference (operators.c:898): edges of a not in b (anti join)."""
    da, db = _dedup(a), _dedup(b)

    def _mark(t: pa.Table) -> pa.Table:
        return t.append_column("_in_b", pa.array(np.ones(t.num_rows, dtype=np.int8)))

    marked = db.map_batches(_mark, batch_format="pyarrow", batch_size=None)
    j = hash_join(da, marked, on=("src", "dst"), num_partitions=num_partitions, join_type="left_outer")

    def _keep(t: pa.Table) -> pa.Table:
        mask = pc.is_null(t["_in_b"])
        return t.filter(mask).select(["src", "dst"])

    return j.map_batches(_keep, batch_format="pyarrow", batch_size=None)


def compose_edges(a: ray.data.Dataset, b: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_compose (operators.c:1114): relational composition — edge
    (x,z) iff (x,y) ∈ a and (y,z) ∈ b; join on the mid vertex."""

    def _ra(t: pa.Table) -> pa.Table:
        return pa.table({"x": t["src"], "mid": t["dst"]})

    def _rb(t: pa.Table) -> pa.Table:
        return pa.table({"mid": t["src"], "z": t["dst"]})

    j = hash_join(
        a.map_batches(_ra, batch_format="pyarrow", batch_size=None),
        b.map_batches(_rb, batch_format="pyarrow", batch_size=None),
        on="mid", num_partitions=num_partitions,
    )

    def _out(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["x"], "dst": t["z"]})

    return _dedup(j.map_batches(_out, batch_format="pyarrow", batch_size=None))


def count_loops(edges: ray.data.Dataset) -> int:
    """igraph_is_loop aggregate (structural_properties.c:3455)."""
    return edges.filter(expr="src == dst").count()


def count_multiple(edges: ray.data.Dataset) -> ray.data.Dataset:
    """igraph_count_multiple (structural_properties.c:3670): multiplicity
    per distinct (src,dst)."""
    g = edges.groupby(["src", "dst"]).count()

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"], "dst": b["dst"], "multiplicity": b["count()"]})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def is_simple(edges: ray.data.Dataset) -> bool:
    """igraph_is_simple (structural_properties.c:3607)."""
    if count_loops(edges) > 0:
        return False
    total = edges.count()
    distinct = _dedup(edges).count()
    return total == distinct


def mutual_edges(edges: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_is_mutual (structural_properties.c:5657): edges whose reverse
    also exists (loops excluded).

    Simple-graph semantics: the input is dedup'd first, so a multi-edge
    counts once. igraph's edge-level is_mutual pairs multi-edges by
    multiplicity via the in/out neighbor merge scan — use count_multiple
    + a multiplicity-aware join if that behavior is needed."""
    d = _dedup(edges.filter(expr="src != dst"))
    rev = reverse(d)
    return hash_join(d, rev, on=("src", "dst"), num_partitions=num_partitions)


def reciprocity(edges: ray.data.Dataset) -> float:
    """Reciprocity over the SIMPLE graph: fraction of non-loop distinct
    edges whose reverse exists.

    Deviation from igraph_reciprocity (structural_properties.c:2417):
    igraph pairs multi-edges by multiplicity (min(in,out) per ordered
    pair) during its neighbor merge scan; this operator collapses
    duplicates first, so results differ on multigraphs. Matching the
    multiplicity rule distributed = count_multiple on both directions +
    SUM(LEAST(m_fwd, m_rev)) — intentionally not the default here."""
    d = _dedup(edges.filter(expr="src != dst")).materialize()
    total = d.count()
    if total == 0:
        return 0.0
    mutual = mutual_edges(d).count()
    return mutual / total


def density(edges: ray.data.Dataset, n: int, directed: bool = True, loops: bool = False) -> float:
    """igraph_density (structural_properties.c:2823)."""
    m = edges.count()
    if n == 0:
        return float("nan")
    if loops:
        denom = n * n if directed else n * (n + 1) / 2
    else:
        denom = n * (n - 1) if directed else n * (n - 1) / 2
    return m / denom


def induced_subgraph(
    edges: ray.data.Dataset, vertices: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """igraph_induced_subgraph (structural_properties.c:2022): edges with
    both endpoints in the vertex set (ids preserved; compaction is a
    separate vocabulary step). Semi-join on each endpoint."""

    def _vs(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"]})

    def _vd(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"]})

    j = hash_join(edges, vertices.map_batches(_vs, batch_format="pyarrow", batch_size=None),
                  on="src", num_partitions=num_partitions)
    j = hash_join(j, vertices.map_batches(_vd, batch_format="pyarrow", batch_size=None),
                  on="dst", num_partitions=num_partitions)
    return j.select_columns(["src", "dst"])


def contract_vertices(
    edges: ray.data.Dataset, mapping: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """igraph_contract_vertices (structural_properties.c:6286): project
    endpoints through (vertex → target) mapping; multi-edges kept (the
    reference does not simplify)."""

    def _ms(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["vertex"], "new_src": b["target"]})

    def _md(b: pa.Table) -> pa.Table:
        return pa.table({"dst": b["vertex"], "new_dst": b["target"]})

    j = hash_join(edges, mapping.map_batches(_ms, batch_format="pyarrow", batch_size=None),
                  on="src", num_partitions=num_partitions)
    j = hash_join(j, mapping.map_batches(_md, batch_format="pyarrow", batch_size=None),
                  on="dst", num_partitions=num_partitions)

    def _out(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["new_src"], "dst": b["new_dst"]})

    return j.map_batches(_out, batch_format="pyarrow", batch_size=None)


def disjoint_union_edges(
    a: ray.data.Dataset, b: ray.data.Dataset, n_left: int
) -> ray.data.Dataset:
    """igraph_disjoint_union (operators.c:38): concatenate two graphs on
    disjoint vertex sets — b's vertex ids are shifted by ``n_left`` (the
    left graph's vertex count), exactly the reference's id-offset rule.
    Pure per-batch map + union: no shuffle, streams at any scale."""

    def _shift(t: pa.Table) -> pa.Table:
        off = pa.scalar(n_left, pa.int64())
        cols = {"src": pc.add(t["src"], off), "dst": pc.add(t["dst"], off)}
        if "weight" in t.column_names:
            cols["weight"] = t["weight"]
        return pa.table(cols)

    keep = ["src", "dst"]
    if "weight" in a.schema().names and "weight" in b.schema().names:
        keep = ["src", "dst", "weight"]
    return a.select_columns(keep).union(
        b.select_columns(keep).map_batches(_shift, batch_format="pyarrow", batch_size=None)
    )


def complementer_edges(
    edges: ray.data.Dataset,
    n: int,
    loops: bool = False,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """igraph_complementer (operators.c:1038): directed edge (i,j) present
    iff absent from the input (loops excluded unless ``loops``).

    The output is inherently Θ(n²) − |E| (same as the reference), so this
    targets small-to-mid vertex counts; the *input* edge set can be large.
    Plan: range-partition the src axis into ``num_partitions`` even vertex
    ranges, sort the (dedup'd) edges by src with exactly those boundaries
    so output block k holds precisely range k's edges, then one Ray task
    per range emits its complement rows (vectorized per-src-row setdiff via
    a masked dense row). Every range task covers ALL its vertices —
    including those with no out-edges — so no driver-side pass touches
    more than P descriptors.
    """
    if n <= 0:
        return ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
    d = _dedup(edges).materialize()
    # even vertex-range splits (complement output is uniform n per src, so
    # equal-vertex = equal-output ranges; edge skew only affects the small
    # "present" side)
    P = max(1, min(num_partitions, n))
    splits = [int(i * n / P) for i in range(1, P)]
    splits = sorted(set(s for s in splits if 0 < s < n))
    if splits:
        sorted_ds = d.sort("src", boundaries=list(splits)).materialize()
    else:
        sorted_ds = d.sort("src").materialize()
    refs = sorted_ds.to_arrow_refs()
    lows = [0] + splits
    highs = splits + [n]
    # sort(boundaries=...) yields exactly len(splits)+1 blocks in range
    # order; guard in case the backend ever merges empty blocks
    if len(refs) != len(lows):
        raise RuntimeError(
            f"boundary-aligned sort returned {len(refs)} blocks for {len(lows)} ranges"
        )

    @ray.remote
    def _complement_range(t: pa.Table, lo: int, hi: int) -> pa.Table:
        srcs_out = []
        dsts_out = []
        if t.num_rows:
            es = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            ed = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            es = np.empty(0, np.int64)
            ed = np.empty(0, np.int64)
        order = np.argsort(es, kind="stable")
        es, ed = es[order], ed[order]
        starts = np.searchsorted(es, np.arange(lo, hi + 1), side="left")
        full = np.arange(n, dtype=np.int64)
        for i, v in enumerate(range(lo, hi)):
            present = ed[starts[i]: starts[i + 1]]
            mask = np.ones(n, dtype=bool)
            mask[present] = False
            if not loops:
                mask[v] = False
            miss = full[mask]
            dsts_out.append(miss)
            srcs_out.append(np.full(len(miss), v, dtype=np.int64))
        src = np.concatenate(srcs_out) if srcs_out else np.empty(0, np.int64)
        dst = np.concatenate(dsts_out) if dsts_out else np.empty(0, np.int64)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    out_refs = [
        _complement_range.remote(r, lo, hi) for r, lo, hi in zip(refs, lows, highs)
    ]
    return ray.data.from_arrow_refs(out_refs)


def top_k_by(ds: ray.data.Dataset, col: str, k: int, descending: bool = True) -> ray.data.Dataset:
    """Top-k helper (engine-side; the reference's analogue is
    sort_vertex_ids_by_degree, structural_properties.c:6223)."""
    return ds.sort(col, descending=descending).limit(k)


def dyad_census(edges: ray.data.Dataset, n: int, num_partitions: int = 8) -> "pa.Table":
    """igraph_dyad_census (/root/reference/src/motifs.c:848): counts of
    (mut, asym, null) unordered vertex pairs over the simple loop-free
    digraph — mutual = both directions present, asymmetric = exactly one,
    null = no edge. Three streaming counts, no pair materialization:
    mut = |mutual ordered edges|/2, asym = |distinct edges| - that*2,
    null = C(n,2) - mut - asym."""
    d = _dedup(edges.filter(expr="src != dst")).materialize()
    e_s = d.count()
    m_rows = mutual_edges(d, num_partitions=num_partitions).count()
    mut = m_rows // 2
    asym = e_s - m_rows
    null = n * (n - 1) // 2 - mut - asym
    return pa.table(
        {"mut": pa.array([mut], pa.int64()),
         "asym": pa.array([asym], pa.int64()),
         "null": pa.array([null], pa.int64())}
    )


def disjoint_union(
    a: ray.data.Dataset, n_a: int, b: ray.data.Dataset, n_b: int
) -> ray.data.Dataset:
    """igraph_disjoint_union (operators.c:38): graphs side by side — b's
    vertex ids shifted by n_a. Returns the combined edge table over the
    dense universe 0..n_a+n_b-1 (pure map + union, no shuffle)."""

    def _shift(t: pa.Table) -> pa.Table:
        cols = {"src": pc.add(t["src"], n_a), "dst": pc.add(t["dst"], n_a)}
        if "weight" in t.column_names:
            cols["weight"] = t["weight"]
        return pa.table(cols)

    return a.select_columns([c for c in a.schema().names if c in ("src", "dst", "weight")]).union(
        b.map_batches(_shift, batch_format="pyarrow", batch_size=None)
    )


def complementer(
    edges: ray.data.Dataset, n: int, loops: bool = False, num_partitions: int = 16
) -> ray.data.Dataset:
    """igraph_complementer (operators.c:1038): directed edges NOT present
    (loops excluded unless ``loops``). Generated per src range — each task
    materializes only its rows of the complement (n*n output total; the
    caller owns that cost, exactly as in the reference)."""
    import ray as _ray

    present = _dedup(edges)
    bnds = [int(x) for x in np.linspace(0, n, num_partitions + 1).astype(np.int64)[1:-1]]
    srted = (
        present.sort("src", boundaries=bnds) if bnds else present.sort("src")
    ).materialize()
    # exactly one block per src range, in range order — each task owns
    # range [ranges[i], ranges[i+1]) and emits only its complement rows
    refs = srted.to_arrow_refs()
    ranges = [0] + bnds + [n]

    @_ray.remote
    def _complement_range(lo: int, hi: int, t: pa.Table) -> pa.Table:
        if t.num_rows and "src" in t.column_names:
            have_src = t["src"].to_numpy(zero_copy_only=False)
            have_dst = t["dst"].to_numpy(zero_copy_only=False)
        else:
            have_src = np.empty(0, np.int64)
            have_dst = np.empty(0, np.int64)
        order = np.lexsort((have_dst, have_src))
        have_key = have_src[order] * n + have_dst[order]
        out_s, out_d = [], []
        row = np.arange(n, dtype=np.int64)
        for s in range(lo, hi):
            keys = s * n + row
            if len(have_key):
                pos = np.searchsorted(have_key, keys)
                pos[pos >= len(have_key)] = len(have_key) - 1
                miss = have_key[pos] != keys
            else:
                miss = np.ones(n, bool)
            if not loops:
                miss &= row != s
            out_s.append(np.full(int(miss.sum()), s, dtype=np.int64))
            out_d.append(row[miss])
        if not out_s:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        return pa.table(
            {"src": pa.array(np.concatenate(out_s)), "dst": pa.array(np.concatenate(out_d))}
        )

    n_blocks = min(len(refs), len(ranges) - 1)
    tasks = [
        _complement_range.remote(ranges[i], ranges[i + 1], refs[i])
        for i in range(n_blocks)
    ]
    # trailing ranges with no block at all (possible when the sort merged
    # empties) still need their complement rows
    empty = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    tasks += [
        _complement_range.remote(ranges[i], ranges[i + 1], empty)
        for i in range(n_blocks, len(ranges) - 1)
    ]
    return ray.data.from_arrow_refs(tasks)


def rewire(
    edges: ray.data.Dataset, n_swaps: Optional[int] = None, seed: int = 42,
) -> ray.data.Dataset:
    """Degree-preserving randomization (igraph_rewire,
    structural_properties.c:1734 / games.c:2816): repeated random
    two-edge swaps (a->b, c->d) => (a->d, c->b), rejecting swaps that
    create loops or duplicate edges. In- and out-degree sequences are
    preserved exactly.

    Distribution note: the reference swaps over the single global edge
    list; distributed, swaps are done independently WITHIN each shuffled
    partition (edges are first repartitioned by a seeded hash so any edge
    pair can meet). Each partition preserves its own degree multiset, so
    the global sequences are preserved; mixing quality grows with
    n_swaps/|E| exactly as in the sequential algorithm."""

    def _key(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        # deterministic pseudo-random partition key (splitmix of src,dst)
        x = (s.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
            d.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
        ) ^ np.uint64(seed)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0x94D049BB133111EB)
        return t.append_column("_rk", pa.array((x >> np.uint64(32)).astype(np.int64)))

    keyed = edges.map_batches(_key, batch_format="pyarrow", batch_size=None)
    srted = keyed.sort("_rk")

    def _swap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        s = t["src"].to_numpy(zero_copy_only=False).copy()
        d = t["dst"].to_numpy(zero_copy_only=False).copy()
        m = len(s)
        rng = np.random.default_rng(seed ^ m ^ int(s[0]) if m else seed)
        swaps = n_swaps if n_swaps is not None else 10 * m
        existing = set(zip(s.tolist(), d.tolist()))
        for _ in range(swaps):
            i, j = rng.integers(0, m, 2)
            if i == j:
                continue
            a, b_, c, dd = int(s[i]), int(d[i]), int(s[j]), int(d[j])
            if a == dd or c == b_:
                continue  # would create a loop
            if (a, dd) in existing or (c, b_) in existing:
                continue  # would create a multi-edge
            existing.discard((a, b_))
            existing.discard((c, dd))
            existing.add((a, dd))
            existing.add((c, b_))
            d[i], d[j] = dd, b_
        return pa.table({"src": pa.array(s), "dst": pa.array(d)})

    return srted.map_batches(_swap, batch_format="pyarrow", batch_size=None)


def linegraph(edges: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """Directed line graph L(G) (igraph_linegraph,
    /root/reference/interfaces/functions.def:140): vertices of L are the
    edges of G numbered 0..|E|−1 in (src, dst) order (the positional
    edge-id contract made deterministic by canonical ordering), with an
    arc eid1→eid2 whenever head(e1) = tail(e2).

    Distributed shape: edge ids come from the zip-with-index dense rank
    over the packed (src<<32|dst) key (requires ids < 2³¹ — asserted);
    the arcs are one mid-vertex hash join, the same physical plan as
    ``compose``. Loops in G become self-loops in L, matching the
    reference.
    """
    from igraph_ray.util import dense_rank_map

    def _key(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and (s.min() < 0 or d.min() < 0
                       or s.max() >= 2**31 or d.max() >= 2**31):
            raise NotImplementedError(
                "linegraph edge-key packing needs vertex ids in [0, 2^31)")
        return pa.table({"k": pa.array((s << 32) | d),
                         "src": b["src"], "dst": b["dst"]})

    keyed = edges.map_batches(_key, batch_format="pyarrow",
                              batch_size=None).materialize()
    ranks = dense_rank_map(keyed, "k")
    eids = hash_join(keyed, ranks, on="k", num_partitions=num_partitions)

    def _a(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "rank" not in b.column_names:
            return pa.table({"mid": pa.array([], pa.int64()),
                             "eid1": pa.array([], pa.int64())})
        return pa.table({"mid": b["dst"], "eid1": b["rank"]})

    def _b(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "rank" not in b.column_names:
            return pa.table({"mid": pa.array([], pa.int64()),
                             "eid2": pa.array([], pa.int64())})
        return pa.table({"mid": b["src"], "eid2": b["rank"]})

    eids = eids.materialize()
    arcs = hash_join(
        eids.map_batches(_a, batch_format="pyarrow", batch_size=None),
        eids.map_batches(_b, batch_format="pyarrow", batch_size=None),
        on="mid", num_partitions=num_partitions,
    )

    def _proj(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "eid1" not in b.column_names:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": b["eid1"], "dst": b["eid2"]})

    return arcs.map_batches(_proj, batch_format="pyarrow", batch_size=None)


def are_connected(edges: ray.data.Dataset, u: int, v: int,
                  directed: bool = True) -> bool:
    """igraph_are_connected (type_indexededgelist.c:1058): does edge
    (u,v) exist — (v,u) also matches when undirected. One predicate
    scan, no shuffle."""
    if directed:
        expr = f"src == {int(u)} and dst == {int(v)}"
    else:
        expr = (f"((src == {int(u)}) and (dst == {int(v)})) or "
                f"((src == {int(v)}) and (dst == {int(u)}))")
    return edges.filter(expr=expr).count() > 0


def adjacency_triplets(edges: ray.data.Dataset, directed: bool = True
                       ) -> ray.data.Dataset:
    """("row", col, mult): the sparse cells of igraph_get_adjacency
    (conversion.c:35-120, eids=False): directed — m[from][to] += 1 per
    edge; undirected BOTH — both cells get +1 per edge, so a loop adds
    2 to its diagonal cell (the reference's documented quirk). Zero
    cells are not emitted."""
    import numpy as np

    def _cells(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if directed:
            r, c = s, d
        else:
            r = np.concatenate([s, d])
            c = np.concatenate([d, s])
        t = pa.table({"row": pa.array(r), "col": pa.array(c),
                      "mult": pa.array(np.ones(len(r), np.int64))})
        return (pa.TableGroupBy(t, ["row", "col"])
                .aggregate([("mult", "sum")])
                .rename_columns(["row", "col", "mult"]))

    out = edges.map_batches(_cells, batch_format="pyarrow",
                            batch_size=None).groupby(["row", "col"]).sum(
        "mult")
    return out.map_batches(
        lambda b: pa.table({"row": b["row"], "col": b["col"],
                            "mult": pc.cast(b["sum(mult)"], pa.int64())})
        if b.num_rows and "row" in b.column_names else pa.table(
            {"row": pa.array([], pa.int64()),
             "col": pa.array([], pa.int64()),
             "mult": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None)


def from_weighted_adjacency(matrix, mode: str = "directed",
                            loops: bool = True):
    """Dense weighted adjacency matrix → weighted edge Dataset
    (igraph_weighted_adjacency, structure_generators.c:470: nonzero
    cell = edge with the cell value as weight; mode "directed" takes
    every cell, "undirected"/"upper" the upper triangle)."""
    import numpy as np

    m = np.asarray(matrix, dtype=np.float64)
    if mode == "directed":
        r, c = np.nonzero(m)
    else:
        r, c = np.nonzero(np.triu(m))
    if not loops:
        keep = r != c
        r, c = r[keep], c[keep]
    w = m[r, c]
    return ray.data.from_arrow(pa.table({
        "src": pa.array(r.astype(np.int64)),
        "dst": pa.array(c.astype(np.int64)),
        "weight": pa.array(w)}))


def union_many_edges(tables) -> ray.data.Dataset:
    """igraph_union_many (operators.c:780): edge present in ANY input,
    once — one concatenated union + one grouped dedup (not a fold of
    pairwise shuffles)."""
    tables = list(tables)
    if not tables:
        return ray.data.from_arrow(pa.table({
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64())}))
    acc = tables[0].select_columns(["src", "dst"])
    for t in tables[1:]:
        acc = acc.union(t.select_columns(["src", "dst"]))
    return _dedup(acc)


def intersection_many_edges(tables,
                            num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_intersection_many (operators.c:491): edges present in
    EVERY input — dedup each input, union them all, one grouped count,
    keep rows counted k times (one shuffle total instead of k-1
    pairwise joins; per-input dedup makes the row count the number of
    inputs containing the edge)."""
    tables = list(tables)
    k = len(tables)
    if k == 0:
        return ray.data.from_arrow(pa.table({
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64())}))
    if k == 1:
        return _dedup(tables[0])
    acc = None
    for t in tables:
        d = _dedup(t)
        acc = d if acc is None else acc.union(d)
    cnt = acc.groupby(["src", "dst"]).count()
    return cnt.map_batches(
        lambda b: (b.filter(pc.equal(b["count()"], k))
                   .select(["src", "dst"]) if b.num_rows else
                   pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None)


def disjoint_union_many_edges(graphs) -> ray.data.Dataset:
    """igraph_disjoint_union_many (operators.c:218): relabel each
    input's vertices by the running vertex-count offset and
    concatenate. ``graphs`` is a list of (edges, n) pairs."""
    out = None
    off = 0
    for edges, n in graphs:
        shifted = edges.map_batches(
            lambda b, _o=off: pa.table({
                "src": pc.add(pc.cast(b["src"], pa.int64()), _o),
                "dst": pc.add(pc.cast(b["dst"], pa.int64()), _o)}),
            batch_format="pyarrow", batch_size=None)
        out = shifted if out is None else out.union(shifted)
        off += int(n)
    if out is None:
        return ray.data.from_arrow(pa.table({
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64())}))
    return out


def induced_subgraph_map(
    edges: ray.data.Dataset, vertices: ray.data.Dataset,
    num_partitions: int = 8,
):
    """igraph_induced_subgraph_map (structural_properties.c:2080):
    induced edges RELABELED to the dense 0..k-1 ids plus the mapping
    table (vertex, new_id) — new ids by ascending old id, the
    reference's creation order for a sorted selector. Returns
    (edges, map_ds)."""
    from igraph_ray.util import dense_rank_map

    sub = induced_subgraph(edges, vertices, num_partitions)
    ranked = dense_rank_map(vertices.map_batches(
        lambda b: pa.table({"v": b["vertex"]}),
        batch_format="pyarrow", batch_size=None), col="v")
    mapping = ranked.map_batches(
        lambda b: pa.table({"vertex": b["v"], "new_id": b["rank"]}),
        batch_format="pyarrow", batch_size=None)
    relabeled = contract_vertices(sub, mapping.map_batches(
        lambda b: pa.table({"vertex": b["vertex"], "target": b["new_id"]}),
        batch_format="pyarrow", batch_size=None), num_partitions)
    return relabeled, mapping
