"""Triad census (Davis–Leinhardt 16-class) and size-3 motif counts.

Reference semantics: ``igraph_triad_census``
(/root/reference/src/motifs.c:976-1100) — every unordered vertex triple
of a directed graph classified into the 16 states 003…300 (doc list at
motifs.c:983-1013); ``igraph_motifs_randesu`` size-3 counts are the same
numbers in isoclass order via the reorder table at motifs.c:1067-1083
(disconnected classes undefined). The input is simplified first (loops
dropped, multi-edges collapsed), matching the census' simple-digraph
domain.

Distributed plan (NOT the reference's per-vertex adjacency walk):

1. ``pairs``: canonical unordered linked pairs (lo, hi, code) with code
   1 = lo→hi, 2 = hi→lo, 3 = mutual — one groupby-sum over the edge
   table.
2. Triples with ≥2 linked dyads are enumerated by WEDGE: every center j
   with linked neighbors i<k yields the triple {i,j,k} exactly once per
   center that links both sides — once if (i,k) is unlinked (open), three
   times if linked (closed; divided back out exactly). Wedge generation
   is a boundary-aligned sort by center plus a fully vectorized
   combination expansion per block; the (i,k) dyad code arrives by a
   (broadcast) left-outer hash join against ``pairs``. Classification is
   a 64-entry lookup on the base-4 key of the three sorted-pair codes,
   built at import from the 16 documented exemplars closed over vertex
   permutations.
3. Triples with exactly ONE linked dyad are counted analytically per
   linked pair: (n−2) − [(deg(lo)−1) + (deg(hi)−1) − common(lo,hi)]
   third vertices are linked to neither endpoint → class 012 (asym) or
   102 (mutual). ``common`` is a groupby over the same wedge stream.
4. 003 = C(n,3) − everything else.

Cost is Σ_j d(j)²/2 wedge rows — the same envelope as the reference's
O(n·d²) (motifs.c randesu full enumeration); heavy hubs dominate both.
"""

from __future__ import annotations

import itertools
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.csr import compute_boundaries
from igraph_ray.graph import Graph
from igraph_ray.util import drop_empty_blocks, hash_join

TRIAD_NAMES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]

# exemplar edge sets on vertices (A,B,C) = (0,1,2), straight from the
# motifs.c:983-1013 doc list
_EXEMPLARS = [
    [],                                                  # 003
    [(0, 1)],                                            # 012  A->B
    [(0, 1), (1, 0)],                                    # 102  A<->B
    [(1, 0), (1, 2)],                                    # 021D A<-B->C
    [(0, 1), (2, 1)],                                    # 021U A->B<-C
    [(0, 1), (1, 2)],                                    # 021C A->B->C
    [(0, 1), (1, 0), (2, 1)],                            # 111D A<->B<-C
    [(0, 1), (1, 0), (1, 2)],                            # 111U A<->B->C
    [(0, 1), (2, 1), (0, 2)],                            # 030T A->B<-C, A->C
    [(1, 0), (2, 1), (0, 2)],                            # 030C A<-B<-C, A->C
    [(0, 1), (1, 0), (1, 2), (2, 1)],                    # 201  A<->B<->C
    [(1, 0), (1, 2), (0, 2), (2, 0)],                    # 120D A<-B->C, A<->C
    [(0, 1), (2, 1), (0, 2), (2, 0)],                    # 120U A->B<-C, A<->C
    [(0, 1), (1, 2), (0, 2), (2, 0)],                    # 120C A->B->C, A<->C
    [(0, 1), (1, 2), (2, 1), (0, 2), (2, 0)],            # 210  A->B<->C, A<->C
    [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)],    # 300
]

# triad-census order -> motifs_randesu isoclass order (motifs.c:1067-1083:
# census[c] = motifs[_CENSUS_TO_ISOCLASS[c]])
_CENSUS_TO_ISOCLASS = [0, 1, 3, 6, 2, 4, 5, 9, 7, 11, 10, 8, 13, 12, 14, 15]


def _build_lookup() -> np.ndarray:
    """64-entry table: key = c01·16 + c02·4 + c12 over the three sorted
    pairs (0,1),(0,2),(1,2) with code 0=none 1=lo→hi 2=hi→lo 3=mutual →
    census class index."""
    table = np.full(64, -1, dtype=np.int64)
    for clazz, edges in enumerate(_EXEMPLARS):
        for perm in itertools.permutations(range(3)):
            remapped = {(perm[a], perm[b]) for (a, b) in edges}
            key = 0
            for (x, y) in ((0, 1), (0, 2), (1, 2)):
                c = (1 if (x, y) in remapped else 0) | (2 if (y, x) in remapped else 0)
                key = key * 4 + c
            if table[key] not in (-1, clazz):  # orbit collision = bad exemplars
                raise AssertionError(f"lookup collision at key {key}")
            table[key] = clazz
    assert (table >= 0).all()
    return table


TRIAD_LOOKUP = _build_lookup()


def _pairs_table(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(lo, hi, code) canonical linked-dyad table from a (possibly
    multi-) edge table; loops dropped, duplicates collapsed."""

    def _canon(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "bit": pa.array([], pa.int64())})
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        bit = np.where(s < d, 1, 2).astype(np.int64)
        # dedup directed edges within the batch before the bit-OR groupby
        key = np.stack([lo, hi, bit], axis=1)
        uk = np.unique(key, axis=0)
        return pa.table({"lo": pa.array(uk[:, 0], pa.int64()),
                         "hi": pa.array(uk[:, 1], pa.int64()),
                         "bit": pa.array(uk[:, 2], pa.int64())})

    canon = edges.map_batches(_canon, batch_format="pyarrow", batch_size=None)
    # global dedup of directed edges, then OR the two direction bits:
    # max(bit) per (lo,hi,bit) is the dedup; sum of distinct bits = code
    dedup = canon.groupby(["lo", "hi", "bit"]).count()
    agg = dedup.groupby(["lo", "hi"]).sum("bit")

    def _code(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "code": pa.array([], pa.int64())})
        return pa.table({"lo": b["lo"], "hi": b["hi"],
                         "code": b["sum(bit)"]})

    return agg.map_batches(_code, batch_format="pyarrow", batch_size=None)


def _wedge_stream(pairs: ray.data.Dataset, num_partitions: int) -> ray.data.Dataset:
    """(i, k, j, cij, cjk) with i<k: one row per (center j, unordered
    linked neighbor pair). Boundary-aligned sort keeps each center's
    adjacency inside one block; pair expansion is vectorized."""

    def _links(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64()),
                             "code": pa.array([], pa.int64())})
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        cd = b["code"].to_numpy(zero_copy_only=False)
        return pa.table({"c": pa.array(np.concatenate([lo, hi]), pa.int64()),
                         "nb": pa.array(np.concatenate([hi, lo]), pa.int64()),
                         "code": pa.array(np.concatenate([cd, cd]), pa.int64())})

    links = pairs.map_batches(_links, batch_format="pyarrow", batch_size=None)
    links = drop_empty_blocks(links.materialize())
    bounds = compute_boundaries(links, num_partitions, col="c")
    if bounds:
        links = links.sort("c", boundaries=[int(x) for x in bounds])
    else:
        links = links.repartition(1).sort("c")

    def _expand(b: pa.Table) -> pa.Table:
        empty = pa.table({"i": pa.array([], pa.int64()),
                          "k": pa.array([], pa.int64()),
                          "j": pa.array([], pa.int64()),
                          "cij": pa.array([], pa.int64()),
                          "cjk": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        c = b["c"].to_numpy(zero_copy_only=False)
        nb = b["nb"].to_numpy(zero_copy_only=False)
        code = b["code"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        lens = np.diff(np.r_[starts, len(c)])
        pos = np.arange(len(c)) - np.repeat(starts, lens)
        cnt = np.repeat(lens, lens) - 1 - pos          # following rows in segment
        total = int(cnt.sum())
        if total == 0:
            return empty
        first = np.repeat(np.arange(len(c)), cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(np.r_[0, cnt[:-1]]), cnt)
        second = first + 1 + offs
        i, k = nb[first], nb[second]
        cij, cjk = code[first], code[second]
        swap = i > k
        i2 = np.where(swap, k, i)
        k2 = np.where(swap, i, k)
        cij2 = np.where(swap, cjk, cij)
        cjk2 = np.where(swap, cij, cjk)
        return pa.table({"i": pa.array(i2, pa.int64()),
                         "k": pa.array(k2, pa.int64()),
                         "j": pa.array(c[first], pa.int64()),
                         "cij": pa.array(cij2, pa.int64()),
                         "cjk": pa.array(cjk2, pa.int64())})

    return links.map_batches(_expand, batch_format="pyarrow", batch_size=None)


def triad_census(
    graph: Graph,
    num_partitions: Optional[int] = None,
) -> pa.Table:
    """16-row table (clazz, name, count) in igraph_triad_census order."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())
    n = graph.num_vertices()
    pairs = _pairs_table(graph.edges).materialize()
    wedges = _wedge_stream(pairs, num_partitions).materialize()

    # --- ≥2-dyad classes: classify each wedge triple --------------------
    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"i": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "cik": pa.array([], pa.int64())})
        return pa.table({"i": b["lo"], "k": b["hi"], "cik": b["code"]})

    pairs_ik = pairs.map_batches(_rn, batch_format="pyarrow", batch_size=None)
    joined = hash_join(wedges, pairs_ik, on=("i", "k"), join_type="left_outer",
                       num_partitions=num_partitions)

    def _classify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"clazz": pa.array([], pa.int64()),
                             "open": pa.array([], pa.int64()),
                             "closed": pa.array([], pa.int64())})
        i = b["i"].to_numpy(zero_copy_only=False)
        k = b["k"].to_numpy(zero_copy_only=False)
        j = b["j"].to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc

        cij = b["cij"].to_numpy(zero_copy_only=False)
        cjk = b["cjk"].to_numpy(zero_copy_only=False)
        # an empty right side leaves the joined column out entirely
        cik = (pc.fill_null(b["cik"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
               if "cik" in b.column_names else np.zeros(b.num_rows, np.int64))
        # slot the three canonical codes into sorted-triple positions
        # (ab, ac, bc); i<k always, j anywhere
        j_lt_i = j < i
        j_gt_k = j > k
        # case j<i<k: (a,b,c)=(j,i,k): ab=c(j,i)=cij, ac=c(j,k)=cjk, bc=c(i,k)=cik
        # case i<j<k: (a,b,c)=(i,j,k): ab=cij, ac=cik, bc=cjk
        # case i<k<j: (a,b,c)=(i,k,j): ab=cik, ac=cij, bc=cjk
        ab = np.where(j_lt_i, cij, np.where(j_gt_k, cik, cij))
        ac = np.where(j_lt_i, cjk, np.where(j_gt_k, cij, cik))
        bc = np.where(j_lt_i, cik, np.where(j_gt_k, cjk, cjk))
        key = ab * 16 + ac * 4 + bc
        clazz = TRIAD_LOOKUP[key]
        closed_mask = cik > 0
        co = np.bincount(clazz[~closed_mask], minlength=16)
        cc = np.bincount(clazz[closed_mask], minlength=16)
        return pa.table({"clazz": pa.array(np.arange(16), pa.int64()),
                         "open": pa.array(co, pa.int64()),
                         "closed": pa.array(cc, pa.int64())})

    cls_counts = (
        joined.map_batches(_classify, batch_format="pyarrow", batch_size=None)
        .groupby("clazz").sum(["open", "closed"])
    )
    counts = np.zeros(16, dtype=np.int64)
    for r in cls_counts.take_all():
        cz = int(r["clazz"])
        closed = int(r["sum(closed)"])
        assert closed % 3 == 0, "closed triples must be triple-counted"
        counts[cz] += int(r["sum(open)"]) + closed // 3

    # --- exactly-one-dyad classes (012 / 102), analytic -----------------
    deg = (
        _wedge_links_degrees(pairs)
    )
    common = wedges.groupby(["i", "k"]).count()

    def _cm(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "i" not in b.column_names:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "cm": pa.array([], pa.int64())})
        return pa.table({"lo": b["i"], "hi": b["k"], "cm": b["count()"]})

    common = common.map_batches(_cm, batch_format="pyarrow", batch_size=None)
    pj = hash_join(pairs, deg.map_batches(
        lambda b: pa.table({"lo": b["vertex"], "dlo": b["deg"]}),
        batch_format="pyarrow", batch_size=None), on="lo",
        join_type="left_outer", num_partitions=num_partitions)
    pj = hash_join(pj, deg.map_batches(
        lambda b: pa.table({"hi": b["vertex"], "dhi": b["deg"]}),
        batch_format="pyarrow", batch_size=None), on="hi",
        join_type="left_outer", num_partitions=num_partitions)
    pj = hash_join(pj, common, on=("lo", "hi"), join_type="left_outer",
                   num_partitions=num_partitions)

    def _iso(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c012": pa.array([], pa.int64()),
                             "c102": pa.array([], pa.int64())})
        import pyarrow.compute as pc

        def _col(name):
            if name not in b.column_names:   # empty joined side
                return np.zeros(b.num_rows, np.int64)
            return pc.fill_null(b[name], 0).to_numpy(zero_copy_only=False).astype(np.int64)

        code = b["code"].to_numpy(zero_copy_only=False)
        # every pair endpoint has degree >= 1 by construction; the fills
        # only defend empty-side joins (e.g. a wedge-free graph)
        dlo = _col("dlo")
        dhi = _col("dhi")
        cm = _col("cm")
        isolated = (n - 2) - (dlo - 1) - (dhi - 1) + cm
        return pa.table({
            "c012": pa.array([int(isolated[(code == 1) | (code == 2)].sum())], pa.int64()),
            "c102": pa.array([int(isolated[code == 3].sum())], pa.int64()),
        })

    iso = pj.map_batches(_iso, batch_format="pyarrow", batch_size=None)
    counts[1] += int(iso.sum("c012") or 0)
    counts[2] += int(iso.sum("c102") or 0)

    # --- 003 by subtraction --------------------------------------------
    total = n * (n - 1) * (n - 2) // 6
    counts[0] = total - int(counts[1:].sum())

    return pa.table({"clazz": pa.array(np.arange(16), pa.int64()),
                     "name": pa.array(TRIAD_NAMES, pa.string()),
                     "count": pa.array(counts, pa.int64())})


def _wedge_links_degrees(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """(vertex, deg) = number of distinct linked neighbors per vertex."""

    def _l(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vertex": pa.array([], pa.int64())})
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table({"vertex": pa.array(np.concatenate([lo, hi]), pa.int64())})

    agg = pairs.map_batches(_l, batch_format="pyarrow", batch_size=None) \
        .groupby("vertex").count()

    def _d(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        return pa.table({"vertex": b["vertex"], "deg": b["count()"]})

    return agg.map_batches(_d, batch_format="pyarrow", batch_size=None)


def motifs3(graph: Graph, num_partitions: Optional[int] = None) -> pa.Table:
    """Directed size-3 motif counts in isoclass order
    (igraph_motifs_randesu(size=3), motifs.c:63-643 full enumeration,
    cut_prob=0): connected classes only — the disconnected isoclasses
    0, 1, 3 are undefined there and omitted here. Derived exactly from
    the triad census via the motifs.c:1067-1083 reorder table."""
    census = triad_census(graph, num_partitions)
    cnt = census["count"].to_numpy(zero_copy_only=False)
    iso = np.full(16, -1, dtype=np.int64)
    for c_idx, m_idx in enumerate(_CENSUS_TO_ISOCLASS):
        iso[m_idx] = cnt[c_idx]
    keep = [m for m in range(16) if m not in (0, 1, 3)]
    return pa.table({"isoclass": pa.array(keep, pa.int64()),
                     "count": pa.array(iso[keep], pa.int64())})


def motifs3_estimate(
    graph: Graph,
    sample_prob: float = 0.25,
    seed: int = 0,
    num_partitions: Optional[int] = None,
) -> pa.Table:
    """Sampled estimate of the connected size-3 motif counts —
    ``igraph_motifs_randesu_estimate`` (motifs.c:427), the reference's
    only approximate aggregate. ESU enumerates each connected subgraph
    exactly once rooted at its minimum-id vertex and the estimate scales
    the counts rooted in a vertex sample by n/|sample|; here the sample
    is the deterministic md5-prefix rule (md5(f"{seed}:{v}")[:8] below
    the probability threshold — the engine-wide parallelism-invariant
    sampling rule), applied to min(i,j,k) of each wedge triple. Closed
    triples keep their exact ÷3 multiplicity correction (all three wedge
    copies share the same min vertex). Returns
    (isoclass, sampled_count, sampled_roots, n, estimate_e6) with
    estimate_e6 = sampled_count·n·10⁶ / sampled_roots as an exact
    integer division; sample_prob=1.0 reproduces motifs3 exactly."""
    import hashlib

    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())
    n = graph.num_vertices()
    thresh = format(int(min(max(sample_prob, 0.0), 1.0) * 0xFFFFFFFF), "08x")

    def _sampled_mask(v: np.ndarray) -> np.ndarray:
        uniq, inv = np.unique(v, return_inverse=True)
        um = np.array([
            hashlib.md5(f"{seed}:{int(x)}".encode()).hexdigest()[:8] <= thresh
            for x in uniq], dtype=bool)
        return um[inv]

    def _roots(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"s": pa.array(
            _sampled_mask(v).astype(np.int64), pa.int64())})

    sampled_roots = int(graph.vertices().map_batches(
        _roots, batch_format="pyarrow", batch_size=None).sum("s") or 0)

    pairs = _pairs_table(graph.edges).materialize()
    wedges = _wedge_stream(pairs, num_partitions).materialize()

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"i": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "cik": pa.array([], pa.int64())})
        return pa.table({"i": b["lo"], "k": b["hi"], "cik": b["code"]})

    pairs_ik = pairs.map_batches(_rn, batch_format="pyarrow", batch_size=None)
    joined = hash_join(wedges, pairs_ik, on=("i", "k"), join_type="left_outer",
                       num_partitions=num_partitions)

    def _classify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"clazz": pa.array([], pa.int64()),
                             "open": pa.array([], pa.int64()),
                             "closed": pa.array([], pa.int64())})
        import pyarrow.compute as pc

        i = b["i"].to_numpy(zero_copy_only=False)
        k = b["k"].to_numpy(zero_copy_only=False)
        j = b["j"].to_numpy(zero_copy_only=False)
        cij = b["cij"].to_numpy(zero_copy_only=False)
        cjk = b["cjk"].to_numpy(zero_copy_only=False)
        cik = (pc.fill_null(b["cik"], 0).to_numpy(zero_copy_only=False)
               .astype(np.int64)
               if "cik" in b.column_names else np.zeros(b.num_rows, np.int64))
        # ESU-root sampling: keep triples whose min vertex is sampled
        # (i < k always, so min(i, j) suffices)
        root = np.minimum(i, j)
        keep = _sampled_mask(root)
        if not keep.any():
            return pa.table({"clazz": pa.array(np.arange(16), pa.int64()),
                             "open": pa.array(np.zeros(16, np.int64)),
                             "closed": pa.array(np.zeros(16, np.int64))})
        i, k, j = i[keep], k[keep], j[keep]
        cij, cjk, cik = cij[keep], cjk[keep], cik[keep]
        j_lt_i = j < i
        j_gt_k = j > k
        ab = np.where(j_lt_i, cij, np.where(j_gt_k, cik, cij))
        ac = np.where(j_lt_i, cjk, np.where(j_gt_k, cij, cik))
        bc = np.where(j_lt_i, cik, np.where(j_gt_k, cjk, cjk))
        key = ab * 16 + ac * 4 + bc
        clazz = TRIAD_LOOKUP[key]
        closed_mask = cik > 0
        co = np.bincount(clazz[~closed_mask], minlength=16)
        cc = np.bincount(clazz[closed_mask], minlength=16)
        return pa.table({"clazz": pa.array(np.arange(16), pa.int64()),
                         "open": pa.array(co, pa.int64()),
                         "closed": pa.array(cc, pa.int64())})

    cls_counts = (
        joined.map_batches(_classify, batch_format="pyarrow", batch_size=None)
        .groupby("clazz").sum(["open", "closed"])
    )
    counts = np.zeros(16, dtype=np.int64)
    for r in cls_counts.take_all():
        cz = int(r["clazz"])
        closed = int(r["sum(closed)"])
        assert closed % 3 == 0, "closed triples must be triple-counted"
        counts[cz] += int(r["sum(open)"]) + closed // 3

    iso = np.full(16, 0, dtype=np.int64)
    for c_idx, m_idx in enumerate(_CENSUS_TO_ISOCLASS):
        iso[m_idx] = counts[c_idx]
    keep_iso = [m for m in range(16) if m not in (0, 1, 3)]
    sc = iso[keep_iso]
    denom = max(sampled_roots, 1)
    est = (sc * np.int64(n) * np.int64(1_000_000)) // np.int64(denom)
    return pa.table({
        "isoclass": pa.array(keep_iso, pa.int64()),
        "sampled_count": pa.array(sc, pa.int64()),
        "sampled_roots": pa.array(np.full(len(keep_iso), sampled_roots,
                                          np.int64)),
        "n": pa.array(np.full(len(keep_iso), n, np.int64)),
        "estimate_e6": pa.array(est, pa.int64()),
    })


def motifs4(graph: Graph, num_partitions: Optional[int] = None) -> pa.Table:
    """Undirected size-4 connected-subgraph census — the isoclass-4
    counts of ``igraph_motifs_randesu(size=4)`` on the simple undirected
    view (/root/reference/src/motifs.c:63-643; classes named here rather
    than isoclass-numbered): path4, star3 (claw), cycle4, paw
    (triangle+pendant), diamond (K4−e), k4.

    Distributed plan — NOT an enumeration of 4-sets: all six induced
    counts follow exactly from six subgraph-copy aggregates by Möbius
    inversion over the containment table (each a one-pass groupby/join
    over streams the engine already has):

      k4       = (adjacent apex pairs over shared triangle edges) / 6
      diamond  = Σ_e C(t_e, 2) − 6·k4
      cycle4   = ½·Σ_{u<v} C(codeg(u,v), 2) − diamond − 3·k4
      paw      = Σ_v t_v·(deg_v−2) − 4·diamond − 12·k4
      star3    = Σ_v C(deg_v, 3) − paw − 2·diamond − 4·k4
      path4    = [Σ_{(u,v)∈E} (deg_u−1)(deg_v−1) − 3T]
                 − 4·cycle4 − 2·paw − 6·diamond − 12·k4

    where t_e / t_v / T are per-edge / per-vertex / total triangles and
    codeg is the common-neighbor count (the cocitation wedge stream).
    Every aggregate is an exact integer; the brute-force pytest checks
    all six on small graphs.
    """
    from igraph_ray.ops.structural import _common_neighbor_pairs
    from igraph_ray.superstep import _aggregate
    from igraph_ray.util import hash_join

    if num_partitions is None:
        num_partitions = 8
    und = graph.canonical_undirected().materialize()

    # --- triangle list (a<b<c) via the shared wedge-join plan ---
    def _e1(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["lo"], "b": b["hi"]})

    def _e2(b: pa.Table) -> pa.Table:
        return pa.table({"b": b["lo"], "c": b["hi"]})

    def _e3(b: pa.Table) -> pa.Table:
        return pa.table({"a": b["lo"], "c": b["hi"]})

    wedge = hash_join(
        und.map_batches(_e1, batch_format="pyarrow", batch_size=None),
        und.map_batches(_e2, batch_format="pyarrow", batch_size=None),
        on="b", num_partitions=num_partitions)
    tri = hash_join(
        wedge, und.map_batches(_e3, batch_format="pyarrow", batch_size=None),
        on=["a", "c"], num_partitions=num_partitions).materialize()

    # --- per-vertex degree and triangle count ---
    def _deg(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vertex": pa.array(np.concatenate([lo, hi]))})

    degs = (und.map_batches(_deg, batch_format="pyarrow", batch_size=None)
            .groupby("vertex").count()).materialize()

    def _tv(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64())})
        v = np.concatenate([
            b["a"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["b"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["c"].to_numpy(zero_copy_only=False).astype(np.int64)])
        return pa.table({"vertex": pa.array(v)})

    tv = (tri.map_batches(_tv, batch_format="pyarrow", batch_size=None)
          .groupby("vertex").count())

    def _rn_tv(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        return pa.table({"vertex": b["vertex"], "t": b["count()"]})

    def _rn_deg(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "deg": b["count()"]})

    vstats = hash_join(
        degs.map_batches(_rn_deg, batch_format="pyarrow", batch_size=None),
        tv.map_batches(_rn_tv, batch_format="pyarrow", batch_size=None),
        on="vertex", num_partitions=num_partitions, join_type="left_outer")

    def _vagg(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vertex" not in b.column_names:
            return pa.table({"claw": pa.array([], pa.int64()),
                             "pawraw": pa.array([], pa.int64()),
                             "tsum": pa.array([], pa.int64())})
        d = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        # a left_outer partition with no right rows can miss "t"
        if "t" in b.column_names:
            t = b["t"].to_numpy(zero_copy_only=False)
            t = np.nan_to_num(t.astype(np.float64)).astype(np.int64)
        else:
            t = np.zeros(b.num_rows, np.int64)
        return pa.table({
            "claw": pa.array(d * (d - 1) * (d - 2) // 6),
            "pawraw": pa.array(t * (d - 2)),
            "tsum": pa.array(t)})

    va = vstats.map_batches(_vagg, batch_format="pyarrow",
                            batch_size=None).materialize()
    agg_v = _aggregate(va, ["claw", "pawraw", "tsum"])
    claw_raw = int(agg_v["claw"])
    paw_raw = int(agg_v["pawraw"])
    T = int(agg_v["tsum"]) // 3

    # --- per-edge triangle stream: t_e + apex pairs for K4 ---
    def _etri(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"ekey": pa.array([], pa.int64()),
                             "apex": pa.array([], pa.int64())})
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and max(int(bb.max()), int(c.max())) >= 2**31:
            raise NotImplementedError(
                "motifs4 edge-key packing needs vertex ids < 2^31")
        ek = np.concatenate([(a << 32) | bb, (a << 32) | c, (bb << 32) | c])
        ap = np.concatenate([c, bb, a])
        return pa.table({"ekey": pa.array(ek), "apex": pa.array(ap)})

    estream = tri.map_batches(_etri, batch_format="pyarrow",
                              batch_size=None).materialize()

    def _te(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "ekey" not in b.column_names:
            return pa.table({"dpairs": pa.array([], pa.int64())})
        c = b["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"dpairs": pa.array(c * (c - 1) // 2)})

    te = (estream.groupby("ekey").count()
          .map_batches(_te, batch_format="pyarrow", batch_size=None)
          .materialize())
    diamond_raw = int(_aggregate(te, ["dpairs"])["dpairs"])

    apex_pairs = _common_neighbor_pairs(estream, "ekey", "apex",
                                        num_partitions)
    hits = hash_join(
        apex_pairs,
        und.map_batches(lambda b: pa.table({"a": b["lo"], "b": b["hi"]}),
                        batch_format="pyarrow", batch_size=None),
        on=["a", "b"], num_partitions=num_partitions)

    def _h(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "common" not in b.column_names:
            return pa.table({"h": pa.array([], pa.int64())})
        return pa.table({"h": b["common"]})

    hits = hits.map_batches(_h, batch_format="pyarrow",
                            batch_size=None).materialize()
    k4 = int(_aggregate(hits, ["h"])["h"]) // 6

    # --- codeg pairs over the symmetrized view ---
    def _sym(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([lo, hi])),
                         "dst": pa.array(np.concatenate([hi, lo]))})

    sym = und.map_batches(_sym, batch_format="pyarrow", batch_size=None)
    codeg = _common_neighbor_pairs(sym, "src", "dst", num_partitions)

    def _cy(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "common" not in b.column_names:
            return pa.table({"cy": pa.array([], pa.int64())})
        c = b["common"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cy": pa.array(c * (c - 1) // 2)})

    cy = codeg.map_batches(_cy, batch_format="pyarrow",
                           batch_size=None).materialize()
    cycle_raw = int(_aggregate(cy, ["cy"])["cy"]) // 2

    # --- path middle-edge aggregate: Σ_e (deg_u−1)(deg_v−1) ---
    def _rn_d(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "deg": b["count()"]})

    dd = degs.map_batches(_rn_d, batch_format="pyarrow", batch_size=None)
    e1 = hash_join(
        und.map_batches(lambda b: pa.table({"vertex": b["lo"], "hi": b["hi"]}),
                        batch_format="pyarrow", batch_size=None),
        dd, on="vertex", num_partitions=num_partitions)

    def _r1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "hi" not in b.column_names:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "dlo": pa.array([], pa.int64())})
        return pa.table({"vertex": b["hi"], "dlo": b["deg"]})

    e2 = hash_join(
        e1.map_batches(_r1, batch_format="pyarrow", batch_size=None),
        dd, on="vertex", num_partitions=num_partitions)

    def _pmid(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "dlo" not in b.column_names:
            return pa.table({"p": pa.array([], pa.int64())})
        dl = b["dlo"].to_numpy(zero_copy_only=False).astype(np.int64)
        dh = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"p": pa.array((dl - 1) * (dh - 1))})

    pm = e2.map_batches(_pmid, batch_format="pyarrow",
                        batch_size=None).materialize()
    path_mid = int(_aggregate(pm, ["p"])["p"]) - 3 * T

    # --- Möbius inversion to induced counts ---
    diamond = diamond_raw - 6 * k4
    cycle4 = cycle_raw - diamond - 3 * k4
    paw = paw_raw - 4 * diamond - 12 * k4
    star3 = claw_raw - paw - 2 * diamond - 4 * k4
    path4 = path_mid - 4 * cycle4 - 2 * paw - 6 * diamond - 12 * k4
    return pa.table({
        "path4": pa.array([path4], pa.int64()),
        "star3": pa.array([star3], pa.int64()),
        "cycle4": pa.array([cycle4], pa.int64()),
        "paw": pa.array([paw], pa.int64()),
        "diamond": pa.array([diamond], pa.int64()),
        "k4": pa.array([k4], pa.int64()),
    })


def motif3_instances(graph: Graph,
                     num_partitions: Optional[int] = None
                     ) -> ray.data.Dataset:
    """One row per CONNECTED 3-vertex induced subgraph instance:
    (v1 < v2 < v3, isoclass) in igraph_motifs_randesu isoclass order —
    the instance stream behind igraph_motifs_randesu_callback
    (motifs.c:165 full enumeration, cut_prob=0). Open triples come
    from their unique center wedge; closed triples keep only the
    min-center copy (i < k always, so j < i ⟺ j is the triple
    minimum) — each instance appears exactly once, at any
    parallelism."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())
    pairs = _pairs_table(graph.edges).materialize()
    wedges = _wedge_stream(pairs, num_partitions).materialize()

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"i": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "cik": pa.array([], pa.int64())})
        return pa.table({"i": b["lo"], "k": b["hi"], "cik": b["code"]})

    pairs_ik = pairs.map_batches(_rn, batch_format="pyarrow",
                                 batch_size=None)
    joined = hash_join(wedges, pairs_ik, on=("i", "k"),
                       join_type="left_outer",
                       num_partitions=num_partitions)
    iso_map = np.asarray(_CENSUS_TO_ISOCLASS, dtype=np.int64)

    def _inst(b: pa.Table) -> pa.Table:
        empty = pa.table({"v1": pa.array([], pa.int64()),
                          "v2": pa.array([], pa.int64()),
                          "v3": pa.array([], pa.int64()),
                          "isoclass": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        import pyarrow.compute as pc

        i = b["i"].to_numpy(zero_copy_only=False)
        k = b["k"].to_numpy(zero_copy_only=False)
        j = b["j"].to_numpy(zero_copy_only=False)
        cij = b["cij"].to_numpy(zero_copy_only=False)
        cjk = b["cjk"].to_numpy(zero_copy_only=False)
        cik = (pc.fill_null(b["cik"], 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
            if "cik" in b.column_names else np.zeros(b.num_rows, np.int64))
        # identical slotting to triad_census._classify (sorted-triple
        # positions ab/ac/bc from the center's location)
        j_lt_i = j < i
        j_gt_k = j > k
        ab = np.where(j_lt_i, cij, np.where(j_gt_k, cik, cij))
        ac = np.where(j_lt_i, cjk, np.where(j_gt_k, cij, cik))
        bc = np.where(j_lt_i, cik, np.where(j_gt_k, cjk, cjk))
        clazz = TRIAD_LOOKUP[ab * 16 + ac * 4 + bc]
        iso = iso_map[clazz]
        closed = cik > 0
        keep = (~closed) | j_lt_i
        v1 = np.where(j_lt_i, j, i)[keep]
        v2 = np.where(j_lt_i, i, np.where(j_gt_k, k, j))[keep]
        v3 = np.where(j_gt_k, j, k)[keep]
        return pa.table({"v1": pa.array(v1, pa.int64()),
                         "v2": pa.array(v2, pa.int64()),
                         "v3": pa.array(v3, pa.int64()),
                         "isoclass": pa.array(iso[keep], pa.int64())})

    return joined.map_batches(_inst, batch_format="pyarrow",
                              batch_size=None)


# motifs4 column order: class index used by motif4_instances
_MOTIF4_NAMES = ("path4", "star3", "cycle4", "paw", "diamond", "k4")

# sorted-quad pair positions (bit p of the induced-edge mask)
_MOTIF4_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _build_motif4_lookup() -> np.ndarray:
    """64-entry table: key = induced-edge bitmask over the six sorted
    pairs (v1v2, v1v3, v1v4, v2v3, v2v4, v3v4) → class index in
    _MOTIF4_NAMES order; -1 for disconnected masks (never produced by
    the spanning-path/claw candidate generation). Classes on four
    vertices are determined by edge count + max degree: m=3 star3/path4,
    m=4 paw/cycle4, m=5 diamond, m=6 k4."""
    table = np.full(64, -1, dtype=np.int64)
    for mask in range(64):
        deg = [0] * 4
        adj = [[False] * 4 for _ in range(4)]
        m = 0
        for p, (i, j) in enumerate(_MOTIF4_PAIRS):
            if mask >> p & 1:
                deg[i] += 1
                deg[j] += 1
                adj[i][j] = adj[j][i] = True
                m += 1
        if m < 3:
            continue
        seen = {0}
        stack = [0]
        while stack:
            x = stack.pop()
            for y in range(4):
                if adj[x][y] and y not in seen:
                    seen.add(y)
                    stack.append(y)
        if len(seen) < 4:
            continue
        if m == 6:
            cls = 5
        elif m == 5:
            cls = 4
        elif m == 4:
            cls = 3 if max(deg) == 3 else 2
        else:
            cls = 1 if max(deg) == 3 else 0
        table[mask] = cls
    return table


MOTIF4_LOOKUP = _build_motif4_lookup()


def motif4_instances(graph: Graph,
                     num_partitions: Optional[int] = None
                     ) -> ray.data.Dataset:
    """One row per CONNECTED 4-vertex induced subgraph of the simple
    undirected view: (v1 < v2 < v3 < v4, clazz, name) with clazz in the
    motifs4 column order (0 path4 … 5 k4) — the size-4 instance stream
    behind igraph_motifs_randesu_callback (motifs.c:165, size=4,
    cut_prob=0; named classes instead of isoclass ids, matching the
    engine's motifs4 census).

    Distributed plan: every connected 4-vertex graph contains a
    spanning path4 or a spanning star3, so candidates = 3-edge walks
    with distinct vertices (two chained hash joins over the symmetric
    adjacency) ∪ per-center neighbor triples (the wedge stream joined
    once more against the center's links). Candidates canonicalize to
    the sorted quad packed into two int64 keys (ids < 2^31 guard, as
    motifs4), dedup with one groupby, and the induced edge mask comes
    back by joining the quad's six pair keys against the undirected
    edge table — classification is the 64-entry MOTIF4_LOOKUP.
    Candidate volume is the subgraph-copy count, the inherent output
    complexity of size-4 enumeration; per-batch np.unique trims the
    shuffle."""
    if num_partitions is None:
        from igraph_ray.context import num_cpus
        num_partitions = max(2, num_cpus())
    und = drop_empty_blocks(graph.canonical_undirected().materialize())

    def _sym(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lo) and int(hi.max()) >= 2**31:
            raise NotImplementedError(
                "motif4_instances quad-key packing needs vertex ids < 2^31")
        return pa.table({"a": pa.array(np.concatenate([lo, hi])),
                         "b": pa.array(np.concatenate([hi, lo]))})

    sym = und.map_batches(_sym, batch_format="pyarrow",
                          batch_size=None).materialize()

    # --- 3-edge walks a-b-c-d with all four vertices distinct ----------
    def _bc(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"b": b["a"], "c": b["b"]})

    w2 = hash_join(sym, sym.map_batches(_bc, batch_format="pyarrow",
                                        batch_size=None),
                   on="b", num_partitions=num_partitions)

    def _wedge_walks(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "bb": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        keep = a != c
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "bb": pa.array(bb[keep], pa.int64()),
                         "c": pa.array(c[keep], pa.int64())})

    wedge_walks = w2.map_batches(_wedge_walks, batch_format="pyarrow",
                                 batch_size=None)

    def _cd(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"c": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        return pa.table({"c": b["a"], "d": b["b"]})

    w3 = hash_join(wedge_walks, sym.map_batches(_cd, batch_format="pyarrow",
                                                batch_size=None),
                   on="c", num_partitions=num_partitions)

    def _walk_quads(b: pa.Table) -> pa.Table:
        empty = pa.table({"k1": pa.array([], pa.int64()),
                          "k2": pa.array([], pa.int64())})
        if b.num_rows == 0 or "a" not in b.column_names:
            return empty
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["bb"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        d = b["d"].to_numpy(zero_copy_only=False)
        keep = (d != a) & (d != bb)
        if not keep.any():
            return empty
        q = np.sort(np.stack([a[keep], bb[keep], c[keep], d[keep]],
                             axis=1), axis=1)
        return _pack_quads(q)

    cand_walks = w3.map_batches(_walk_quads, batch_format="pyarrow",
                                batch_size=None)

    # --- claw triples: wedge (i<k around j) joined with j's links ------
    def _fake_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "code": pa.array([], pa.int64())})
        return pa.table({"lo": b["lo"], "hi": b["hi"],
                         "code": pa.array(
                             np.ones(b.num_rows, np.int64))})

    und_pairs = und.map_batches(_fake_pairs, batch_format="pyarrow",
                                batch_size=None)
    wedges = _wedge_stream(und_pairs, num_partitions)

    def _wj(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "i" not in b.column_names:
            return pa.table({"j": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64())})
        return pa.table({"j": b["j"], "i": b["i"], "k": b["k"]})

    def _jl(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.column_names:
            return pa.table({"j": pa.array([], pa.int64()),
                             "l": pa.array([], pa.int64())})
        return pa.table({"j": b["a"], "l": b["b"]})

    claw = hash_join(
        wedges.map_batches(_wj, batch_format="pyarrow", batch_size=None),
        sym.map_batches(_jl, batch_format="pyarrow", batch_size=None),
        on="j", num_partitions=num_partitions)

    def _claw_quads(b: pa.Table) -> pa.Table:
        empty = pa.table({"k1": pa.array([], pa.int64()),
                          "k2": pa.array([], pa.int64())})
        if b.num_rows == 0 or "i" not in b.column_names:
            return empty
        i = b["i"].to_numpy(zero_copy_only=False)
        k = b["k"].to_numpy(zero_copy_only=False)
        j = b["j"].to_numpy(zero_copy_only=False)
        ll = b["l"].to_numpy(zero_copy_only=False)
        keep = ll > k  # i < k < l: each neighbor triple once
        if not keep.any():
            return empty
        q = np.sort(np.stack([i[keep], j[keep], k[keep], ll[keep]],
                             axis=1), axis=1)
        return _pack_quads(q)

    cand_claws = claw.map_batches(_claw_quads, batch_format="pyarrow",
                                  batch_size=None)

    uniq = (cand_walks.union(cand_claws)
            .groupby(["k1", "k2"]).count())

    # --- induced edge mask via one join of the six pair keys -----------
    def _pairs6(b: pa.Table) -> pa.Table:
        empty = pa.table({"ekey": pa.array([], pa.int64()),
                          "k1": pa.array([], pa.int64()),
                          "k2": pa.array([], pa.int64()),
                          "bit": pa.array([], pa.int64())})
        if b.num_rows == 0 or "k1" not in b.column_names:
            return empty
        k1 = b["k1"].to_numpy(zero_copy_only=False).astype(np.int64)
        k2 = b["k2"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.stack([k1 >> 32, k1 & 0xFFFFFFFF,
                      k2 >> 32, k2 & 0xFFFFFFFF], axis=1)
        eks, bits, r1s, r2s = [], [], [], []
        for p, (x, y) in enumerate(_MOTIF4_PAIRS):
            eks.append((v[:, x] << 32) | v[:, y])
            bits.append(np.full(len(k1), 1 << p, np.int64))
            r1s.append(k1)
            r2s.append(k2)
        return pa.table({"ekey": pa.array(np.concatenate(eks)),
                         "k1": pa.array(np.concatenate(r1s)),
                         "k2": pa.array(np.concatenate(r2s)),
                         "bit": pa.array(np.concatenate(bits))})

    pairs6 = uniq.map_batches(_pairs6, batch_format="pyarrow",
                              batch_size=None)

    def _ekeys(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lo" not in b.column_names:
            return pa.table({"ekey": pa.array([], pa.int64())})
        lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"ekey": pa.array((lo << 32) | hi)})

    hit = hash_join(pairs6,
                    und.map_batches(_ekeys, batch_format="pyarrow",
                                    batch_size=None),
                    on="ekey", num_partitions=num_partitions)
    masks = hit.groupby(["k1", "k2"]).sum("bit")

    lut = MOTIF4_LOOKUP
    names = np.asarray(_MOTIF4_NAMES)

    def _classify(b: pa.Table) -> pa.Table:
        empty = pa.table({"v1": pa.array([], pa.int64()),
                          "v2": pa.array([], pa.int64()),
                          "v3": pa.array([], pa.int64()),
                          "v4": pa.array([], pa.int64()),
                          "clazz": pa.array([], pa.int64()),
                          "name": pa.array([], pa.string())})
        if b.num_rows == 0 or "k1" not in b.column_names:
            return empty
        k1 = b["k1"].to_numpy(zero_copy_only=False).astype(np.int64)
        k2 = b["k2"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = b["sum(bit)"].to_numpy(zero_copy_only=False).astype(np.int64)
        cls = lut[mask]
        if (cls < 0).any():  # spanning-tree candidates are connected
            raise AssertionError("disconnected quad reached classify")
        return pa.table({"v1": pa.array(k1 >> 32),
                         "v2": pa.array(k1 & 0xFFFFFFFF),
                         "v3": pa.array(k2 >> 32),
                         "v4": pa.array(k2 & 0xFFFFFFFF),
                         "clazz": pa.array(cls),
                         "name": pa.array(names[cls], pa.string())})

    out = masks.map_batches(_classify, batch_format="pyarrow",
                            batch_size=None)
    # schema anchor: a quad-free graph still reports the typed columns
    # (drop the null-schema empty blocks a vacuous groupby leaves behind)
    return drop_empty_blocks(out.materialize()).union(
        ray.data.from_arrow(_classify(pa.table({}))))


def _pack_quads(q: np.ndarray) -> pa.Table:
    """Sorted (n,4) id rows → per-batch-unique packed (k1, k2) keys."""
    k1 = (q[:, 0].astype(np.int64) << 32) | q[:, 1].astype(np.int64)
    k2 = (q[:, 2].astype(np.int64) << 32) | q[:, 3].astype(np.int64)
    u = np.unique(np.stack([k1, k2], axis=1), axis=0)
    return pa.table({"k1": pa.array(u[:, 0]), "k2": pa.array(u[:, 1])})


def motifs_randesu_callback(
    graph: Graph,
    callback,
    size: int = 3,
    num_partitions: Optional[int] = None,
    batch_size: Optional[int] = None,
) -> ray.data.Dataset:
    """UDF-over-motif-instances hook (igraph_motifs_randesu_callback,
    motifs.c:165). The reference invokes the callback once per found
    instance and lets it stop the search; the distributed contract is
    batch-granular instead: ``callback`` receives Arrow tables of
    connected-instance rows — (v1, v2, v3, isoclass) at size=3,
    (v1, v2, v3, v4, clazz, name) at size=4 — and whatever tables it
    returns form the resulting Dataset — a plain map_batches over the
    parallel instance stream (no early stop; filter/aggregate
    downstream instead)."""
    if size == 3:
        inst = motif3_instances(graph, num_partitions)
    elif size == 4:
        inst = motif4_instances(graph, num_partitions)
    else:
        raise NotImplementedError(
            "callback surface covers size=3 and size=4 "
            "(motifs.c randesu sizes)")
    return inst.map_batches(callback, batch_format="pyarrow",
                            batch_size=batch_size)
