"""Dynamic-graph operators — the engine's counterpart of the
reference fork's dynamic.c (/root/reference/src/dynamic.c:568
`igraph_i_compute_union_graph_projection`, :1033
`igraph_compute_dynamic_union_graph_projection`): a timestamped edge
stream is cut into T snapshots, and every consecutive snapshot pair
(G_t, G_t+1) is projected onto its union graph whose edge colors
encode membership — 0b10 = first snapshot only, 0b01 = second only,
0b11 = both (dynamic.c's uncolored branch pushes exactly these
bit codes).

Ray-Data shape: one pass derives distinct (window, src, dst) triples,
one flat expansion emits each edge into the two snapshot pairs it can
participate in (as G1 of pair w and as G2 of pair w−1) with its
membership bit, and one groupby-sum per (pair, src, dst) produces the
color — the whole projection for ALL consecutive pairs is a single
shuffle, instead of the reference's per-pair merge loops. Window
bounds clamp pairs to [w_min, w_max−1] so only pairs with both
snapshots inside the observed range are emitted (the reference gets T
explicitly)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def snapshots_from_events(
    events: ray.data.Dataset,
    window_s: int = 21600,
    num_vertices: int = 512,
) -> ray.data.Dataset:
    """Distinct (w, src, dst) snapshot-database triples derived from
    the events stream: 6h windows, src = user_id % V, dst =
    event_id % 97 (the arithmetic projection family the other queries
    use). Materialized so downstream passes reuse one execution."""
    def _derive(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts // 1_000_000) // window_s
        src = (b["user_id"].to_numpy(zero_copy_only=False)
               % num_vertices).astype(np.int64)
        dst = (b["event_id"].to_numpy(zero_copy_only=False)
               % 97).astype(np.int64)
        t = pa.table({"w": pa.array(w), "src": pa.array(src),
                      "dst": pa.array(dst)})
        return t.group_by(["w", "src", "dst"]).aggregate([]).rename_columns(
            ["w", "src", "dst"])

    return (events.map_batches(_derive, batch_format="pyarrow",
                               batch_size=None)
            .groupby(["w", "src", "dst"]).count()
            .select_columns(["w", "src", "dst"]).materialize())


def union_graph_projection(
    events: ray.data.Dataset,
    window_s: int = 21600,
    num_vertices: int = 512,
) -> ray.data.Dataset:
    """(w, src, dst, color) rows: the union graph of snapshot pair
    (w, w+1) for every consecutive window pair, color ∈ {1, 2, 3}.
    ``events`` needs (ts, user_id, event_id)."""
    dedup = snapshots_from_events(events, window_s, num_vertices)
    return union_edges(dedup).sort(["w", "src", "dst"])


_UNION_EMPTY = {"w": pa.int64(), "src": pa.int64(), "dst": pa.int64(),
                "color": pa.int64()}


def _empty(schema) -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in schema.items()})


def union_edges(snapshots: ray.data.Dataset) -> ray.data.Dataset:
    """The FULL union-graph projection core: distinct snapshot triples
    (w, src, dst) → (w, src, dst, color) union edges of every
    consecutive pair (w, w+1) inside the observed window range, color
    2 = first snapshot only, 1 = second only, 3 = both (dynamic.c:568
    bit codes). One expansion + one grouped sum for ALL pairs."""
    snapshots = snapshots.materialize()
    wmin = snapshots.min("w")
    wmax = snapshots.max("w")

    def _expand(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False)
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        pair = np.concatenate([w, w - 1])
        s2 = np.concatenate([src, src])
        d2 = np.concatenate([dst, dst])
        bit = np.concatenate([np.full(len(w), 2, np.int64),
                              np.full(len(w), 1, np.int64)])
        keep = (pair >= wmin) & (pair <= wmax - 1)
        return pa.table({"w": pa.array(pair[keep]),
                         "src": pa.array(s2[keep]),
                         "dst": pa.array(d2[keep]),
                         "bit": pa.array(bit[keep])})

    return (snapshots.map_batches(_expand, batch_format="pyarrow",
                                  batch_size=None)
            .groupby(["w", "src", "dst"]).sum("bit")
            .map_batches(lambda b: pa.table({
                "w": b["w"], "src": b["src"], "dst": b["dst"],
                "color": b["sum(bit)"]}) if b.num_rows
                else _empty(_UNION_EMPTY),
                batch_format="pyarrow", batch_size=None))


def _changed_vertices(ue: ray.data.Dataset) -> ray.data.Dataset:
    """(w, v) distinct: vertices incident (either endpoint) to an edge
    present in exactly one snapshot of pair w — exactly the vertices
    whose all-neighbor adjacency differs between the two snapshots
    (dynamic.c:751 degree/neighbor change tests, simple-graph form)."""
    def _ends(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty({"w": pa.int64(), "v": pa.int64()})
        keep = b["color"].to_numpy(zero_copy_only=False) != 3
        w = b["w"].to_numpy(zero_copy_only=False)[keep]
        s = b["src"].to_numpy(zero_copy_only=False)[keep]
        d = b["dst"].to_numpy(zero_copy_only=False)[keep]
        t = pa.table({"w": pa.array(np.concatenate([w, w])),
                      "v": pa.array(np.concatenate([s, d]))})
        return t.group_by(["w", "v"]).aggregate([]).rename_columns(
            ["w", "v"])

    return (ue.map_batches(_ends, batch_format="pyarrow", batch_size=None)
            .groupby(["w", "v"]).count().select_columns(["w", "v"]))


def projection_neighbors(snapshots: ray.data.Dataset,
                         num_partitions: int = 8) -> ray.data.Dataset:
    """IGRAPH_PROJECTION_NEIGHBORS (dynamic.c:751): for every
    consecutive snapshot pair, the union graph restricted to the joint
    1-hop neighborhood (in either snapshot, either direction;
    dynamic.c:483) of the changed vertices, with selector-local vertex
    ids assigned by sorted original id (the reference's bw_index
    relabeling, dynamic.c:608). Returns (w, src, dst, color,
    src_local, dst_local). Delta neighborhoods are small by design —
    the per-w rank pass is a map_groups over those selector sets only,
    never over full snapshots."""
    from igraph_ray.util import hash_join

    ue = union_edges(snapshots).materialize()
    changed = _changed_vertices(ue)

    # joint 1-hop neighborhood: changed ∪ neighbors-of-changed,
    # via two endpoint joins (src-side and dst-side)
    e_sd = ue.map_batches(
        lambda b: pa.table({"w": b["w"], "a": b["src"], "b": b["dst"]})
        if b.num_rows else _empty({"w": pa.int64(), "a": pa.int64(),
                                   "b": pa.int64()}),
        batch_format="pyarrow", batch_size=None)
    e_ds = ue.map_batches(
        lambda b: pa.table({"w": b["w"], "a": b["dst"], "b": b["src"]})
        if b.num_rows else _empty({"w": pa.int64(), "a": pa.int64(),
                                   "b": pa.int64()}),
        batch_format="pyarrow", batch_size=None)
    sym = e_sd.union(e_ds)
    ch_a = changed.map_batches(
        lambda b: b.rename_columns(["w", "a"]) if b.num_rows
        else _empty({"w": pa.int64(), "a": pa.int64()}),
        batch_format="pyarrow", batch_size=None)
    neigh = hash_join(sym, ch_a, on=["w", "a"],
                      num_partitions=num_partitions)
    neigh_v = neigh.map_batches(
        lambda b: pa.table({"w": b["w"], "v": b["b"]}) if b.num_rows
        else _empty({"w": pa.int64(), "v": pa.int64()}),
        batch_format="pyarrow", batch_size=None)
    selector = (changed.union(neigh_v)
                .groupby(["w", "v"]).count().select_columns(["w", "v"]))

    # selector-local ids: rank by original id within each pair window
    def _rank(df):
        df = df.sort_values("v").reset_index(drop=True)
        df["local"] = np.arange(len(df), dtype=np.int64)
        return df

    sel_ranked = (selector.groupby("w")
                  .map_groups(_rank, batch_format="pandas")
                  .materialize())

    sl_src = sel_ranked.map_batches(
        lambda b: pa.table({"w": b["w"], "src": b["v"],
                            "src_local": b["local"]}) if b.num_rows
        else _empty({"w": pa.int64(), "src": pa.int64(),
                     "src_local": pa.int64()}),
        batch_format="pyarrow", batch_size=None)
    sl_dst = sel_ranked.map_batches(
        lambda b: pa.table({"w": b["w"], "dst": b["v"],
                            "dst_local": b["local"]}) if b.num_rows
        else _empty({"w": pa.int64(), "dst": pa.int64(),
                     "dst_local": pa.int64()}),
        batch_format="pyarrow", batch_size=None)
    kept = hash_join(ue, sl_src, on=["w", "src"],
                     num_partitions=num_partitions)
    kept = hash_join(kept, sl_dst, on=["w", "dst"],
                     num_partitions=num_partitions)
    return kept.map_batches(
        lambda b: b.select(["w", "src", "dst", "color",
                            "src_local", "dst_local"]) if b.num_rows
        else _empty({"w": pa.int64(), "src": pa.int64(),
                     "dst": pa.int64(), "color": pa.int64(),
                     "src_local": pa.int64(), "dst_local": pa.int64()}),
        batch_format="pyarrow", batch_size=None)


def projection_event(snapshots: ray.data.Dataset,
                     num_partitions: int = 8) -> ray.data.Dataset:
    """IGRAPH_PROJECTION_EVENT (dynamic.c:826): one union graph per
    edge EVENT — each edge inserted or deleted between snapshots w and
    w+1 — restricted to the joint 1-hop neighborhood of the event's
    endpoints. Returns (w, ea, eb, src, dst, color) with (ea, eb) the
    event edge (documented deviation: one event per changed edge,
    where the reference's all-neighbor scan re-emits each undirected
    event once per endpoint; node-color events are N/A in the
    uncolored fixture)."""
    from igraph_ray.util import hash_join

    ue = union_edges(snapshots).materialize()

    def _events(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty({"w": pa.int64(), "ea": pa.int64(),
                           "eb": pa.int64()})
        keep = b["color"].to_numpy(zero_copy_only=False) != 3
        return pa.table({
            "w": pa.array(b["w"].to_numpy(zero_copy_only=False)[keep]),
            "ea": pa.array(b["src"].to_numpy(zero_copy_only=False)[keep]),
            "eb": pa.array(b["dst"].to_numpy(zero_copy_only=False)[keep])})

    events = ue.map_batches(_events, batch_format="pyarrow",
                            batch_size=None).materialize()

    # per-event selector: {ea, eb} ∪ their neighbors in either snapshot
    def _sym(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty({"w": pa.int64(), "a": pa.int64(),
                           "b": pa.int64()})
        w = b["w"].to_numpy(zero_copy_only=False)
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array(np.concatenate([w, w])),
                         "a": pa.array(np.concatenate([s, d])),
                         "b": pa.array(np.concatenate([d, s]))})

    sym = ue.map_batches(_sym, batch_format="pyarrow", batch_size=None)

    ev_ends = events.map_batches(
        lambda b: pa.table({
            "w": pa.array(np.concatenate(
                [b["w"].to_numpy(zero_copy_only=False)] * 2)),
            "ea": pa.array(np.concatenate(
                [b["ea"].to_numpy(zero_copy_only=False)] * 2)),
            "eb": pa.array(np.concatenate(
                [b["eb"].to_numpy(zero_copy_only=False)] * 2)),
            "a": pa.array(np.concatenate(
                [b["ea"].to_numpy(zero_copy_only=False),
                 b["eb"].to_numpy(zero_copy_only=False)]))})
        if b.num_rows else _empty({"w": pa.int64(), "ea": pa.int64(),
                                   "eb": pa.int64(), "a": pa.int64()}),
        batch_format="pyarrow", batch_size=None)
    nb = hash_join(sym, ev_ends, on=["w", "a"],
                   num_partitions=num_partitions)
    nb_v = nb.map_batches(
        lambda b: pa.table({"w": b["w"], "ea": b["ea"], "eb": b["eb"],
                            "v": b["b"]}) if b.num_rows
        else _empty({"w": pa.int64(), "ea": pa.int64(),
                     "eb": pa.int64(), "v": pa.int64()}),
        batch_format="pyarrow", batch_size=None)
    ends_v = ev_ends.map_batches(
        lambda b: pa.table({"w": b["w"], "ea": b["ea"], "eb": b["eb"],
                            "v": b["a"]}) if b.num_rows
        else _empty({"w": pa.int64(), "ea": pa.int64(),
                     "eb": pa.int64(), "v": pa.int64()}),
        batch_format="pyarrow", batch_size=None)
    selector = (nb_v.union(ends_v)
                .groupby(["w", "ea", "eb", "v"]).count()
                .select_columns(["w", "ea", "eb", "v"]).materialize())

    sel_src = selector.map_batches(
        lambda b: b.rename_columns(["w", "ea", "eb", "src"])
        if b.num_rows else _empty({"w": pa.int64(), "ea": pa.int64(),
                                   "eb": pa.int64(), "src": pa.int64()}),
        batch_format="pyarrow", batch_size=None)
    sel_dst = selector.map_batches(
        lambda b: b.rename_columns(["w", "ea", "eb", "dst"])
        if b.num_rows else _empty({"w": pa.int64(), "ea": pa.int64(),
                                   "eb": pa.int64(), "dst": pa.int64()}),
        batch_format="pyarrow", batch_size=None)
    cand = hash_join(sel_src, ue, on=["w", "src"],
                     num_partitions=num_partitions)
    out = hash_join(cand, sel_dst, on=["w", "ea", "eb", "dst"],
                    num_partitions=num_partitions)
    return out.map_batches(
        lambda b: b.select(["w", "ea", "eb", "src", "dst", "color"])
        if b.num_rows else _empty({"w": pa.int64(), "ea": pa.int64(),
                                   "eb": pa.int64(), "src": pa.int64(),
                                   "dst": pa.int64(),
                                   "color": pa.int64()}),
        batch_format="pyarrow", batch_size=None)


def union_edges_colored(snapshots: ray.data.Dataset,
                        max_ecolor: int) -> ray.data.Dataset:
    """Edge-colored FULL union-graph projection (dynamic.c:568, the
    has_ecolors branch): snapshot triples carry a static per-edge
    color ``ecolor`` ≤ max_ecolor, and the union edge's color is the
    base-(max_ecolor+1) pair code  (max_ecolor+1)·c1 + c2  with c1/c2
    the edge's color in the first/second snapshot (0 when absent —
    exactly the reference's uncolored-side contribution). Same
    one-expansion + one-grouped-sum plan as :func:`union_edges`."""
    snapshots = snapshots.materialize()
    wmin = snapshots.min("w")
    wmax = snapshots.max("w")
    base = max_ecolor + 1

    def _expand(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False)
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        ec = b["ecolor"].to_numpy(zero_copy_only=False)
        pair = np.concatenate([w, w - 1])
        s2 = np.concatenate([src, src])
        d2 = np.concatenate([dst, dst])
        # as G1 of pair w the color contributes base*c; as G2 of pair
        # w-1 it contributes c
        bit = np.concatenate([ec * base, ec])
        keep = (pair >= wmin) & (pair <= wmax - 1)
        return pa.table({"w": pa.array(pair[keep]),
                         "src": pa.array(s2[keep]),
                         "dst": pa.array(d2[keep]),
                         "bit": pa.array(bit[keep])})

    return (snapshots.map_batches(_expand, batch_format="pyarrow",
                                  batch_size=None)
            .groupby(["w", "src", "dst"]).sum("bit")
            .map_batches(lambda b: pa.table({
                "w": b["w"], "src": b["src"], "dst": b["dst"],
                "color": b["sum(bit)"]}) if b.num_rows
                else _empty(_UNION_EMPTY),
                batch_format="pyarrow", batch_size=None))


def separate_graph_pattern(union_graph: ray.data.Dataset,
                           max_ecolor: int = 0) -> ray.data.Dataset:
    """igraph_seperate_graph_pattern (dynamic.c:1646): split an
    evolution-pattern union graph back into its two timesteps. Colors
    are the base-(max_ecolor+1) pair codes (uncolored graphs use the
    0b10/0b01 bit codes = max_ecolor 1): side 0 keeps edges with
    c1 = color // (max+1) > 0 (color c1), side 1 keeps edges with
    c2 = color % (max+1) > 0 (color c2). One vectorized pass."""
    base = max_ecolor + 1 if max_ecolor else 2

    def _split(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty({"side": pa.int64(), "w": pa.int64(),
                           "src": pa.int64(), "dst": pa.int64(),
                           "ecolor": pa.int64()})
        c = b["color"].to_numpy(zero_copy_only=False)
        c1 = c // base
        c2 = c % base
        w = b["w"].to_numpy(zero_copy_only=False)
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        k1 = c1 > 0
        k2 = c2 > 0
        return pa.table({
            "side": pa.array(np.concatenate(
                [np.zeros(int(k1.sum()), np.int64),
                 np.ones(int(k2.sum()), np.int64)])),
            "w": pa.array(np.concatenate([w[k1], w[k2]])),
            "src": pa.array(np.concatenate([s[k1], s[k2]])),
            "dst": pa.array(np.concatenate([d[k1], d[k2]])),
            "ecolor": pa.array(np.concatenate([c1[k1], c2[k2]]))})

    return union_graph.map_batches(_split, batch_format="pyarrow",
                                   batch_size=None)


def write_dynamic_union_projection(
    projection: ray.data.Dataset,
    num_vertices: int,
    path: str,
    gz: bool = False,
) -> int:
    """igraph_write_dynamic_union_graph_projection (dynamic.c:939):
    serialize a union-graph projection stream — (w, src, dst, color)
    rows from union_graph_projection / projection_neighbors /
    projection_event — as the reference's transaction text: per
    window-pair a ``t # <tid>`` header (tid = ascending rank of w),
    every vertex as ``v <id>`` (the FULL selector keeps the whole
    universe; vcolors absent exactly like the reference's NULL-vcolors
    call), then ``e <src> <dst> <color>`` in (src, dst) order. Small
    text interchange sink (mining-tool format, sequential by nature —
    same contract as write_velist); returns the number of transactions
    written. ``gz=True`` writes gzip (the reference's gzFile path)."""
    import gzip

    df = projection.to_pandas().sort_values(["w", "src", "dst"])
    windows = sorted(df["w"].unique())
    opener = (lambda p: gzip.open(p, "wt")) if gz else (
        lambda p: open(p, "w"))
    with opener(path) as f:
        for tid, w in enumerate(windows):
            f.write(f"t # {tid}\n")
            for v in range(num_vertices):
                f.write(f"v {v}\n")
            for r in df[df["w"] == w].itertuples():
                f.write(f"e {int(r.src)} {int(r.dst)} {int(r.color)}\n")
    return len(windows)
