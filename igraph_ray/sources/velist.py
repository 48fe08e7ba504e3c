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
