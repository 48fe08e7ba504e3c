"""The fork's gSpan-style transaction "velist" format
(igraph_read_transactions_velist, /root/reference/src/dynamic.c:74):

    t # <tid> [supp]
    v <vid> [vcolor]
    ...
    e <src> <dst> [ecolor] [etime]
    ...
    t # <tid> ...

Vertex ids are LOCAL to each transaction (dense 0..n-1 per graph).
The reader assigns transaction indices by the global order of the
``t #`` header lines; optional columns follow the reference's
positional rule (ecolor occupies the third edge field when
has_ecolors, etime the next one).

Distributed shape: Ray's read_text blocks can start mid-transaction, so
gid attribution needs the number of header lines BEFORE each block —
one per-block header count (tiny ints to the driver), an exclusive
scan, then every block parses independently with its gid offset. The
writer mirrors the format for round-trips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data


def read_velist(
    path: str,
    has_vcolors: bool = False,
    has_ecolors: bool = False,
    has_etimes: bool = False,
) -> Tuple[ray.data.Dataset, ray.data.Dataset, ray.data.Dataset]:
    """Returns (edges, vertices, headers):

    * edges    — (gid, src, dst[, ecolor][, etime])
    * vertices — (gid, vertex[, vcolor])
    * headers  — (gid, tid, supp)  (supp -1 when absent, the
      reference's "no support recorded" sentinel)
    """
    ds = ray.data.read_text(path).materialize()
    refs = ds.to_arrow_refs()

    @ray.remote
    def _hdr_count(t: pa.Table) -> int:
        if t.num_rows == 0:
            return 0
        return sum(1 for ln in t["text"].to_pylist()
                   if ln.startswith("t #"))

    counts = ray.get([_hdr_count.remote(r) for r in refs])
    offsets = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])

    @ray.remote(num_returns=3)
    def _parse(t: pa.Table, gid0: int):
        ge, se, de, ce, te = [], [], [], [], []
        gv, vv, cv = [], [], []
        gh, th, sh = [], [], []
        gid = gid0 - 1  # lines before the block's first header belong
        # to the previous block's last transaction (gid0 - 1)
        for ln in (t["text"].to_pylist() if t.num_rows else []):
            parts = ln.split()
            if not parts:
                continue
            if parts[0] == "t":
                gid += 1
                gh.append(gid)
                th.append(int(parts[2]))
                sh.append(int(parts[3]) if len(parts) > 3 else -1)
            elif parts[0] == "v":
                gv.append(gid)
                vv.append(int(parts[1]))
                if has_vcolors:
                    cv.append(int(parts[2]))
            elif parts[0] == "e":
                ge.append(gid)
                se.append(int(parts[1]))
                de.append(int(parts[2]))
                k = 3
                if has_ecolors:
                    ce.append(int(parts[k]))
                    k += 1
                if has_etimes:
                    te.append(int(parts[k]))
        ecols = {"gid": pa.array(ge, pa.int64()),
                 "src": pa.array(se, pa.int64()),
                 "dst": pa.array(de, pa.int64())}
        if has_ecolors:
            ecols["ecolor"] = pa.array(ce, pa.int64())
        if has_etimes:
            ecols["etime"] = pa.array(te, pa.int64())
        vcols = {"gid": pa.array(gv, pa.int64()),
                 "vertex": pa.array(vv, pa.int64())}
        if has_vcolors:
            vcols["vcolor"] = pa.array(cv, pa.int64())
        hcols = {"gid": pa.array(gh, pa.int64()),
                 "tid": pa.array(th, pa.int64()),
                 "supp": pa.array(sh, pa.int64())}
        return pa.table(ecols), pa.table(vcols), pa.table(hcols)

    eref, vref, href = [], [], []
    for r, off in zip(refs, offsets):
        e, v, h = _parse.remote(r, int(off))
        eref.append(e)
        vref.append(v)
        href.append(h)
    return (ray.data.from_arrow_refs(eref),
            ray.data.from_arrow_refs(vref),
            ray.data.from_arrow_refs(href))


def write_velist(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    path: str,
    headers: Optional[ray.data.Dataset] = None,
) -> None:
    """Serialize a transaction database back to velist text. Small-file
    dev writer (the reference's format is a mining-tool interchange):
    transactions in gid order, vertices then edges in id order."""
    ed = edges.to_pandas().sort_values(["gid", "src", "dst"])
    vd = vertices.to_pandas().sort_values(["gid", "vertex"])
    hd = (headers.to_pandas().sort_values("gid")
          if headers is not None else None)
    gids = sorted(set(ed["gid"]).union(vd["gid"]))
    with open(path, "w") as f:
        for g in gids:
            if hd is not None and (hd["gid"] == g).any():
                row = hd[hd["gid"] == g].iloc[0]
                if int(row["supp"]) >= 0:
                    f.write(f"t # {int(row['tid'])} {int(row['supp'])}\n")
                else:
                    f.write(f"t # {int(row['tid'])}\n")
            else:
                f.write(f"t # {int(g)}\n")
            sub_v = vd[vd["gid"] == g]
            for r in sub_v.itertuples():
                if "vcolor" in vd.columns:
                    f.write(f"v {int(r.vertex)} {int(r.vcolor)}\n")
                else:
                    f.write(f"v {int(r.vertex)}\n")
            sub_e = ed[ed["gid"] == g]
            for r in sub_e.itertuples():
                fields = [f"e {int(r.src)} {int(r.dst)}"]
                if "ecolor" in ed.columns:
                    fields.append(str(int(r.ecolor)))
                if "etime" in ed.columns:
                    fields.append(str(int(r.etime)))
                f.write(" ".join(fields) + "\n")


def read_dynamic_velist(
    path: str,
    has_vcolors: bool = False,
    has_etimesdel: bool = True,
) -> Tuple[ray.data.Dataset, ray.data.Dataset]:
    """The fork's DYNAMIC velist format
    (igraph_read_and_project_dynamic_velist, dynamic.c:75):

        v <vid> [vcolor]
        e <src> <dst> <ctime> [<dtime>]

    with dtime = -1 meaning "never deleted". Unlike the transaction
    format there are no ``t #`` headers — every line is
    self-describing — so blocks parse fully independently (no offset
    scan needed). Returns (edges, vertices): edges =
    (src, dst, ctime, dtime), vertices = (vertex[, vcolor]). The
    reference's ecolors+deletions combination is unimplemented there
    too (dynamic.c:98)."""
    ds = ray.data.read_text(path)

    def _parse(t: pa.Table) -> pa.Table:
        se, de, ce, te = [], [], [], []
        vv, cv = [], []
        for ln in (t["text"].to_pylist() if t.num_rows else []):
            parts = ln.split()
            if len(parts) < 2:
                continue
            if parts[0] == "v":
                vv.append(int(parts[1]))
                cv.append(int(parts[2]) if has_vcolors and len(parts) > 2
                          else 0)
            elif parts[0] == "e" and len(parts) >= 4:
                se.append(int(parts[1]))
                de.append(int(parts[2]))
                ce.append(int(parts[3]))
                te.append(int(parts[4]) if has_etimesdel and len(parts) > 4
                          else -1)
        # tag rows so one pass yields both tables
        n_e, n_v = len(se), len(vv)
        return pa.table({
            "kind": pa.array([0] * n_e + [1] * n_v, pa.int64()),
            "a": pa.array(se + vv, pa.int64()),
            "b": pa.array(de + cv, pa.int64()),
            "ctime": pa.array(ce + [0] * n_v, pa.int64()),
            "dtime": pa.array(te + [0] * n_v, pa.int64())})

    parsed = ds.map_batches(_parse, batch_format="pyarrow",
                            batch_size=None).materialize()
    edges = parsed.filter(expr="kind == 0").map_batches(
        lambda b: pa.table({"src": b["a"], "dst": b["b"],
                            "ctime": b["ctime"], "dtime": b["dtime"]}),
        batch_format="pyarrow", batch_size=None)
    verts = parsed.filter(expr="kind == 1").map_batches(
        lambda b: pa.table({"vertex": b["a"], "vcolor": b["b"]}),
        batch_format="pyarrow", batch_size=None)
    return edges, verts


def write_dynamic_velist(
    edges: ray.data.Dataset,
    vertices: Optional[ray.data.Dataset],
    path: str,
) -> None:
    """Serialize a dynamic edge stream back to dynamic velist text.
    The reference requires edges sorted by creation time
    (dynamic.c:67); the writer enforces (ctime, src, dst) order.
    Small-file dev writer like :func:`write_velist`."""
    ed = edges.to_pandas().sort_values(["ctime", "src", "dst"])
    with open(path, "w") as f:
        if vertices is not None:
            vd = vertices.to_pandas().sort_values("vertex")
            for r in vd.itertuples():
                f.write(f"v {int(r.vertex)}\n")
        for r in ed.itertuples():
            f.write(f"e {int(r.src)} {int(r.dst)} {int(r.ctime)}"
                    f" {int(r.dtime)}\n")


def dynamic_snapshots(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Expand a dynamic edge stream (src, dst, ctime, dtime) into the
    snapshot database (w, src, dst): one snapshot per DISTINCT
    insertion timestamp, edge present in snapshot w iff
    ctime <= w < dtime (dtime = -1 = forever) — the reference reader's
    contract (dynamic.c:193-283: deletions with del_time <= T are
    applied when the graph for timestamp T is constructed, and
    snapshots exist only at insertion timestamps). Vectorized
    searchsorted expansion against the broadcast timestamp list (the
    number of distinct timestamps is small by nature — it is the
    number of output graphs)."""
    edges = edges.materialize()
    ts_rows = (edges.groupby("ctime").count()
               .select_columns(["ctime"]).take_all())
    W = np.sort(np.array([r["ctime"] for r in ts_rows], dtype=np.int64))

    def _expand(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"w": pa.array([], pa.int64()),
                             "src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        c = b["ctime"].to_numpy(zero_copy_only=False)
        d = b["dtime"].to_numpy(zero_copy_only=False)
        s = b["src"].to_numpy(zero_copy_only=False)
        t = b["dst"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(W, c, side="left")
        d_eff = np.where(d < 0, W[-1] + 1, d)
        hi = np.searchsorted(W, d_eff, side="left")
        hi = np.maximum(hi, lo)
        cnt = hi - lo
        idx = np.repeat(np.arange(len(c)), cnt)
        # window index within each edge's [lo, hi) run
        runs = np.arange(int(cnt.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        w = W[lo[idx] + runs]
        out = pa.table({"w": pa.array(w), "src": pa.array(s[idx]),
                        "dst": pa.array(t[idx])})
        return out.group_by(["w", "src", "dst"]).aggregate([]).\
            rename_columns(["w", "src", "dst"])

    return (edges.map_batches(_expand, batch_format="pyarrow",
                              batch_size=None)
            .groupby(["w", "src", "dst"]).count()
            .select_columns(["w", "src", "dst"]))


def write_colored_graph(
    n: int,
    edges: ray.data.Dataset,
    path: str,
    vcolors=None,
    ecolors_col: Optional[str] = None,
    etimes_col: Optional[str] = None,
    gz: bool = False,
) -> None:
    """Single colored graph in the fork's v/e text format
    (igraph_write_colored_graph / _gz, fsm.c:95,124):
    ``v <vid> [vcolor]`` for every vertex 0..n-1, then
    ``e <src> <dst> [ecolor] [etime]`` per edge in (src, dst) order.
    ``vcolors`` is an indexable of length n; edge colors/times come
    from the named columns of ``edges``. ``gz=True`` writes gzip."""
    import gzip

    cols = ["src", "dst"]
    if ecolors_col:
        cols.append(ecolors_col)
    if etimes_col:
        cols.append(etimes_col)
    ed = edges.to_pandas()[cols].sort_values(["src", "dst"])
    opener = (lambda p: gzip.open(p, "wt")) if gz else (
        lambda p: open(p, "w"))
    with opener(path) as f:
        for v in range(n):
            if vcolors is not None:
                f.write(f"v {v} {int(vcolors[v])}\n")
            else:
                f.write(f"v {v}\n")
        for r in ed.itertuples(index=False):
            line = f"e {int(r.src)} {int(r.dst)}"
            if ecolors_col:
                line += f" {int(getattr(r, ecolors_col))}"
            if etimes_col:
                line += f" {int(getattr(r, etimes_col))}"
            f.write(line + "\n")


def read_colored_graph(
    path: str,
    has_vcolors: bool = False,
    has_ecolors: bool = False,
    has_etimes: bool = False,
    gz: bool = False,
) -> Tuple[ray.data.Dataset, ray.data.Dataset]:
    """Round-trip reader for :func:`write_colored_graph`. Returns
    (edges, vertices); gz files are read via Arrow's native gzip
    decompression path."""
    if gz:
        ds = ray.data.read_text(path, arrow_open_stream_args={
            "compression": "gzip"})
    else:
        ds = ray.data.read_text(path)

    def _parse(t: pa.Table):
        se, de, ce, te = [], [], [], []
        vv, cv = [], []
        for ln in (t["text"].to_pylist() if t.num_rows else []):
            parts = ln.split()
            if len(parts) < 2:
                continue
            if parts[0] == "v":
                vv.append(int(parts[1]))
                cv.append(int(parts[2]) if has_vcolors and len(parts) > 2
                          else 0)
            elif parts[0] == "e" and len(parts) >= 3:
                se.append(int(parts[1]))
                de.append(int(parts[2]))
                k = 3
                if has_ecolors:
                    ce.append(int(parts[k]))
                    k += 1
                if has_etimes:
                    te.append(int(parts[k]) if len(parts) > k else 0)
        n_e, n_v = len(se), len(vv)
        return pa.table({
            "kind": pa.array([0] * n_e + [1] * n_v, pa.int64()),
            "a": pa.array(se + vv, pa.int64()),
            "b": pa.array(de + cv, pa.int64()),
            "c": pa.array((ce if has_ecolors else [0] * n_e) + [0] * n_v,
                          pa.int64()),
            "t": pa.array((te if has_etimes else [0] * n_e) + [0] * n_v,
                          pa.int64())})

    parsed = ds.map_batches(_parse, batch_format="pyarrow",
                            batch_size=None).materialize()
    edges = parsed.filter(expr="kind == 0").map_batches(
        lambda b: pa.table({"src": b["a"], "dst": b["b"],
                            "ecolor": b["c"], "etime": b["t"]}),
        batch_format="pyarrow", batch_size=None)
    verts = parsed.filter(expr="kind == 1").map_batches(
        lambda b: pa.table({"vertex": b["a"], "vcolor": b["b"]}),
        batch_format="pyarrow", batch_size=None)
    return edges, verts
