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


def union_graph_projection(
    events: ray.data.Dataset,
    window_s: int = 21600,
    num_vertices: int = 512,
) -> ray.data.Dataset:
    """(w, src, dst, color) rows: the union graph of snapshot pair
    (w, w+1) for every consecutive window pair, color ∈ {1, 2, 3}.
    ``events`` needs (ts, user_id, event_id); the derived temporal
    edge is src = user_id % V, dst = event_id % 97 (the same
    arithmetic projection family the other queries use)."""
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

    dedup = (events.map_batches(_derive, batch_format="pyarrow",
                                batch_size=None)
             .groupby(["w", "src", "dst"]).count()
             .select_columns(["w", "src", "dst"]).materialize())
    wmin = dedup.min("w")
    wmax = dedup.max("w")

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

    return (dedup.map_batches(_expand, batch_format="pyarrow",
                              batch_size=None)
            .groupby(["w", "src", "dst"]).sum("bit")
            .map_batches(lambda b: pa.table({
                "w": b["w"], "src": b["src"], "dst": b["dst"],
                "color": b["sum(bit)"]}) if b.num_rows else pa.table({
                    "w": pa.array([], pa.int64()),
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "color": pa.array([], pa.int64())}),
                batch_format="pyarrow", batch_size=None)
            .sort(["w", "src", "dst"]))
