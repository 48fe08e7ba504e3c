"""Vertex separators — the engine's igraph_is_separator /
igraph_is_minimal_separator (/root/reference/src/separators.c:145,203).

Reference semantics: S separates iff a BFS over G−S from the first
surviving vertex misses some surviving vertex (i.e. G−S has more than
one component over the graph's own vertex set), with the special case
that removing all-but-one vertices counts as separating. Minimality
(separators.c:203) asks that no proper subset separates.

Instead of replaying the reference's |S|+1 sequential BFS passes, the
engine uses the structural criterion: S (a separator) is minimal iff
every v ∈ S has a neighbor in EVERY component of G−S — putting v back
reconnects everything exactly when v touches all components, so
S∖{v} separates iff v misses one. One distributed components run on
the filtered graph plus grouped joins replaces the BFS loop; the
result is identical (proof in any graph-theory text; the criterion is
the contrapositive of the reference's except-loop).

Vertex universe: the observed vertices of the edge table (the
engine's n=None convention) — S is intersected with it, and remainder
vertices whose every neighbor lies in S count as singleton components
(they matter for both the separation count and the adjacency test).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join


def separator_profile(
    graph: Graph,
    vset: Iterable[int],
    num_partitions: int = 8,
) -> Tuple[bool, bool, int]:
    """Returns (is_separator, is_minimal_separator, ncomp) where ncomp
    is the component count of G−S over the observed universe."""
    from igraph_ray.algorithms.components import connected_components

    und = graph.canonical_undirected().materialize()

    def _ends(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": pa.concat_arrays(
            [b["lo"].combine_chunks(), b["hi"].combine_chunks()])})

    universe = (und.map_batches(_ends, batch_format="pyarrow",
                                batch_size=None)
                .groupby("vertex").count().select_columns(["vertex"])
                .materialize())
    u_count = universe.count()
    s_arr = np.array(sorted(set(int(v) for v in vset)), np.int64)

    def _in_s(col) -> np.ndarray:
        return np.isin(col.to_numpy(zero_copy_only=False), s_arr)

    s_count = int(universe.map_batches(
        lambda b: pa.table({"c": pa.array(
            [int(_in_s(b["vertex"]).sum())], pa.int64())}),
        batch_format="pyarrow", batch_size=None).sum("c") or 0)
    r_count = u_count - s_count  # remainder size
    if r_count == 0:
        raise ValueError("separator contains every vertex")
    if r_count == 1:
        # reference special case (separators.c:49-65): removing n-1
        # vertices always separates; minimal iff every member touches
        # the single survivor (S∖{v} leaves exactly {v, w})
        return True, _all_members_touch_all(und, s_arr, None, 1,
                                            num_partitions), 1

    def _filt(b: pa.Table) -> pa.Table:
        keep = ~(_in_s(b["lo"]) | _in_s(b["hi"]))
        t = b.filter(pa.array(keep))
        return pa.table({"src": t["lo"], "dst": t["hi"]})

    rem_edges = und.map_batches(_filt, batch_format="pyarrow",
                                batch_size=None).materialize()
    if rem_edges.count() == 0:
        # every surviving vertex is isolated: r_count singletons
        ncomp = r_count
        is_sep = ncomp > 1
        # v reconnects everything iff adjacent to all components —
        # impossible for ncomp > 1 without remainder edges unless v
        # touches every survivor; check via degree-into-remainder
        return is_sep, bool(is_sep and _all_members_touch_all(
            und, s_arr, None, ncomp, num_partitions)), ncomp
    g_rem = Graph(rem_edges, n=None)
    labels = connected_components(
        g_rem, num_partitions=num_partitions).state.materialize()
    touched = labels.count()
    n_edge_comps = (labels.groupby("label").count().count())
    iso_count = r_count - touched
    ncomp = int(n_edge_comps + iso_count)
    is_sep = ncomp > 1
    if not is_sep or s_count == 0:
        return is_sep, bool(is_sep and s_count == 0), ncomp
    is_min = _all_members_touch_all(und, s_arr, labels, ncomp,
                                    num_partitions)
    return is_sep, is_min, ncomp


def _all_members_touch_all(und, s_arr, labels, ncomp,
                           num_partitions) -> bool:
    """True iff every member of S has ≥1 neighbor in every component
    of G−S (isolated remainder vertices count as their own component,
    label = the vertex id — distinct from every rank-densified edge
    label only via the pairing below, so we label them n+vertex)."""
    import pyarrow.compute as pc

    def _inc(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        in_lo = np.isin(lo, s_arr)
        in_hi = np.isin(hi, s_arr)
        # edges member->survivor (either direction), skip member-member
        m1 = in_lo & ~in_hi
        m2 = in_hi & ~in_lo
        return pa.table({
            "member": pa.array(np.concatenate([lo[m1], hi[m2]])),
            "vertex": pa.array(np.concatenate([hi[m1], lo[m2]]))})

    inc = und.map_batches(_inc, batch_format="pyarrow", batch_size=None)
    if labels is not None:
        j = hash_join(inc, labels, on="vertex",
                      num_partitions=num_partitions,
                      join_type="left_outer")

        def _lab(b: pa.Table) -> pa.Table:
            # unmatched survivors are isolated components: unique label
            # n + vertex (edge-component labels are small dense ranks)
            v = b["vertex"].to_numpy(zero_copy_only=False)
            lab = b["label"].to_numpy(zero_copy_only=False)
            lab = np.where(pc.is_null(b["label"]).to_numpy(
                zero_copy_only=False), v + (1 << 40), lab)
            return pa.table({"member": b["member"],
                             "lab": pa.array(lab.astype(np.int64))})

        pairs = j.map_batches(_lab, batch_format="pyarrow",
                              batch_size=None)
    else:
        pairs = inc.map_batches(
            lambda b: pa.table({"member": b["member"],
                                "lab": b["vertex"]}),
            batch_format="pyarrow", batch_size=None)
    per = (pairs.groupby(["member", "lab"]).count()
           .groupby("member").count())
    rows = per.take_all()
    if len(rows) < len(s_arr):
        return False  # some member touches no component at all
    return all(int(r["count()"]) == ncomp for r in rows)
