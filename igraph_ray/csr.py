"""Per-partition CSR blocks in the Ray object store.

The reference keeps one global CSR index pair (oi/os, ii/is) rebuilt
wholesale on mutation (type_indexededgelist.c:835-877). At cluster scale a
global index is impossible; instead edges are **range-partitioned by src**
(equal-|E| boundaries from a sample) and each partition becomes an
immutable CSR block (indptr / dst / weight numpy arrays) ``ray.put`` into
the object store once. Gather stages fetch blocks zero-copy (plasma shared
memory, one copy per node) and cache the handle per worker process — the
"stateful stage" of SURVEY.md §2.5 without per-actor rebuild cost.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data


@dataclasses.dataclass
class CSRBlockMeta:
    vlo: int  # first src vertex covered (inclusive)
    vhi: int  # last src vertex covered (inclusive)
    n_edges: int
    ref: ray.ObjectRef  # -> dict(indptr, dst, weight?, vlo, vhi)


@dataclasses.dataclass
class CSRIndex:
    blocks: List[CSRBlockMeta]
    boundaries: List[int]  # range-partition split points (sorted)
    num_edges: int

    def block_descriptors(self):
        """Plain picklable descriptors for map_batches closures."""
        return [(b.vlo, b.vhi, b.ref) for b in self.blocks]


def _assemble_block(src, dst, w, weighted: bool, with_in_index: bool):
    """Assemble one CSR block from src-sorted edge arrays.

    Two row layouts behind the same consumer API (block_width /
    block_local / slices_for):

    - **dense** (default): ``indptr`` indexed by ``v - vlo`` — O(1) row
      lookup, used when the id span ≈ the edge count;
    - **compressed** (``row_vids`` present): when the block's id span is
      far larger than its edge count (sparse 64-bit ids — e.g. hashed
      identifiers — on an n=None universe), allocating the span would
      explode, so rows are the sorted unique srcs and lookups are a
      searchsorted.  Everything downstream sees only "local slot"
      indices, so kernels are layout-agnostic.

    ``with_in_index`` additionally builds the dst-sorted edge view (the
    per-partition analogue of igraph's ii/is in-index,
    igraph_datatype.h:58-70): ``in_dst`` (unique dsts ascending),
    ``in_starts`` (group offsets), ``in_src`` (local src SLOT per edge,
    int32).  Gather kernels over the in-index are sequential reduceat
    scans with random reads confined to the small per-block vertex
    arrays — the memory-bandwidth-friendly layout for the hot loop.
    """
    vlo = int(src[0])
    vhi = int(src[-1])
    span = vhi - vlo + 1
    data = {"vlo": vlo, "vhi": vhi, "dst": dst}
    if span > max(4 * len(src), 1024):
        newgrp = np.empty(len(src), dtype=bool)
        newgrp[0] = True
        np.not_equal(src[1:], src[:-1], out=newgrp[1:])
        rstarts = np.flatnonzero(newgrp)
        row_vids = src[rstarts]
        indptr = np.append(rstarts, len(src)).astype(np.int64)
        data["row_vids"] = row_vids
        data["indptr"] = indptr
        local_of_src = np.cumsum(newgrp) - 1  # slot per edge, src-sorted
    else:
        counts = np.bincount(src - vlo, minlength=span)
        indptr = np.zeros(span + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        data["indptr"] = indptr
        local_of_src = src - vlo
    if weighted:
        data["weight"] = w
    if with_in_index:
        order = np.argsort(dst, kind="stable")
        dst_sorted = dst[order]
        in_src = local_of_src[order]
        data["in_src"] = in_src.astype(np.int32) \
            if len(in_src) == 0 or int(in_src.max()) < 2**31 else in_src
        newgrp = np.empty(len(dst_sorted), dtype=bool)
        if len(dst_sorted):
            newgrp[0] = True
            np.not_equal(dst_sorted[1:], dst_sorted[:-1], out=newgrp[1:])
        starts = np.flatnonzero(newgrp)
        in_dst = dst_sorted[starts]
        # narrow the in-index streams: the gather hot loop is memory-
        # bandwidth bound, and int32 halves the bytes of the two arrays it
        # streams (valid while ids/offsets fit 31 bits; falls back to
        # int64 on huge blocks / vertex ids)
        if len(in_dst) and 0 <= int(in_dst[0]) and int(in_dst[-1]) < 2**31:
            in_dst = in_dst.astype(np.int32)
        if len(dst_sorted) < 2**31:
            starts = starts.astype(np.int32)
        data["in_dst"] = in_dst
        data["in_starts"] = starts
        if weighted:
            data["in_weight"] = data["weight"][order]
    return ((vlo, vhi, len(src)), data)


def block_width(block: dict) -> int:
    """Number of local row slots in a block (dense: id span; compressed:
    #distinct srcs)."""
    if "row_vids" in block:
        return len(block["row_vids"])
    return block["vhi"] - block["vlo"] + 1


def block_local(block: dict, verts: np.ndarray) -> np.ndarray:
    """Local row slot per vertex (verts already clipped to the block
    range); -1 where the vertex has no out-edges in a compressed block."""
    if "row_vids" in block:
        rv = block["row_vids"]
        if len(rv) == 0:
            return np.full(len(verts), -1, np.int64)
        lid = np.searchsorted(rv, verts)
        lid = np.minimum(lid, len(rv) - 1)
        return np.where(rv[lid] == verts, lid, -1)
    return verts - block["vlo"]


def compute_boundaries(
    edges: ray.data.Dataset,
    num_partitions: int,
    num_edges: Optional[int] = None,
    seed: int = 42,
    max_sample: int = 1_000_000,
    col: str = "src",
) -> List[int]:
    """Equal-|E| range boundaries over ``col`` from a bounded sample.

    Equal-edge (not equal-vertex) split is the straggler defense from
    SURVEY.md §4.2 — hot src ranges get split. Deterministic seed.
    """
    if num_partitions <= 1:
        return []
    if num_edges is None:
        num_edges = edges.count()
    frac = min(1.0, max_sample / max(1, num_edges))
    sample_ds = edges.select_columns([col])
    if frac < 1.0:
        sample_ds = sample_ds.random_sample(frac, seed=seed)
    # pull the sample as numpy per block (never as python row dicts)
    refs = sample_ds.materialize().to_arrow_refs()
    import ray as _ray

    @_ray.remote
    def _np(t):
        return (
            t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            if t.num_rows and col in t.column_names
            else np.empty(0, np.int64)
        )

    parts = _ray.get([_np.remote(r) for r in refs])
    sample = np.concatenate(parts) if parts else np.empty(0, np.int64)
    if len(sample) == 0:
        return []
    qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
    bounds = np.unique(np.quantile(sample, qs).astype(np.int64))
    return [int(b) for b in bounds]


@ray.remote
def _sample_block(ref_chunk, col: str, stride: int):
    """Strided sample over a CHUNK of block refs — one task per ~16 blocks,
    so a confetti-block input (hundreds of tiny read blocks) doesn't pay
    per-block task dispatch."""
    outs = []
    for t in ray.get(list(ref_chunk)):
        if t.num_rows == 0 or col not in t.column_names:
            continue
        v = t[col].to_numpy(zero_copy_only=False)
        outs.append(v[::stride].astype(np.int64))
    return np.concatenate(outs) if outs else np.empty(0, np.int64)


def _boundaries_from_refs(
    refs, num_partitions: int, num_edges: int, max_sample: int = 1_000_000,
    col: str = "src",
) -> List[int]:
    """Equal-|E| boundaries from an already-materialized dataset's blocks:
    strided deterministic per-block sample, no extra dataset scan."""
    if num_partitions <= 1:
        return []
    stride = max(1, num_edges // max_sample)
    refs = list(refs)
    chunk = 16
    chunks = [refs[i : i + chunk] for i in range(0, len(refs), chunk)]
    parts = ray.get([_sample_block.remote(c, col, stride) for c in chunks])
    sample = np.concatenate(parts) if parts else np.empty(0, np.int64)
    if len(sample) == 0:
        return []
    qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
    bounds = np.unique(np.quantile(sample, qs).astype(np.int64))
    return [int(b) for b in bounds]


def build_csr_index(
    edges: ray.data.Dataset,
    num_partitions: int,
    weighted: bool = False,
    drop_loops: bool = False,
    num_edges: Optional[int] = None,
    boundaries: Optional[List[int]] = None,
    with_in_index: bool = False,
) -> CSRIndex:
    """Range-exchange edges by src and build one CSR block per range.

    One-time O(|E| log) exchange (the analogue of igraph's index build at
    igraph_add_edges time, type_indexededgelist.c:258-339); every superstep
    afterwards reads the blocks zero-copy. The input scans ONCE: the
    column-pruned edge table is materialized, boundaries are sampled from
    its blocks in place, then a direct two-hop shuffle — shard tasks
    searchsorted rows into ranges, one build task per range lexsorts
    (src, dst) and assembles — replaces the round-1 `ds.sort` +
    per-block pass (the generic sort's extra materialize + coalesce was
    ~5 s of the 8 s PageRank setup at 2^23 edges). Shard tasks take a
    CHUNK of input blocks each, so confetti-block inputs don't pay
    per-block dispatch; output determinism comes from the lexsort plus
    block-ordered shard concatenation.
    """
    if drop_loops:
        edges = edges.filter(expr="src != dst")
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    mat = edges.select_columns(cols).materialize()
    if num_edges is None:
        num_edges = mat.count()
    refs = list(mat.to_arrow_refs())
    if boundaries is None:
        boundaries = _boundaries_from_refs(refs, num_partitions, num_edges)
    nparts = len(boundaries) + 1
    bounds_arr = np.asarray(list(boundaries), dtype=np.int64)
    # ~2 input blocks per shard task, capped so tiny inputs stay 1 task
    chunk = max(1, (len(refs) + 2 * num_partitions - 1) // (2 * num_partitions))
    chunks = [refs[i : i + chunk] for i in range(0, len(refs), chunk)]
    if nparts == 1:
        pairs = [_build_whole.remote(weighted, with_in_index, *refs)]
    else:
        shard_lists = [
            _shard_chunk.options(num_returns=nparts).remote(
                bounds_arr, weighted, nparts, *c
            )
            for c in chunks
        ]
        pairs = [
            _build_range.options(num_returns=2).remote(
                weighted, with_in_index, *[s[p] for s in shard_lists]
            )
            for p in range(nparts)
        ]
    metas = []
    for meta, data_ref in zip(ray.get([p[0] for p in pairs]), [p[1] for p in pairs]):
        if meta is None:
            continue
        vlo, vhi, ne = meta
        metas.append(CSRBlockMeta(vlo=vlo, vhi=vhi, n_edges=ne, ref=data_ref))
    metas.sort(key=lambda m: m.vlo)
    return CSRIndex(blocks=metas, boundaries=list(boundaries), num_edges=num_edges)


def _tables_to_numpy(tables, weighted: bool):
    srcs, dsts, ws = [], [], []
    for t in tables:
        if t is None or t.num_rows == 0 or "src" not in t.column_names:
            continue
        srcs.append(t["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
        dsts.append(t["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
        if weighted:
            ws.append(
                t["weight"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            )
    if not srcs:
        return None, None, None
    src = np.concatenate(srcs) if len(srcs) > 1 else srcs[0]
    dst = np.concatenate(dsts) if len(dsts) > 1 else dsts[0]
    w = (np.concatenate(ws) if len(ws) > 1 else ws[0]) if weighted else None
    return src, dst, w


@ray.remote
def _shard_chunk(bounds_arr: np.ndarray, weighted: bool, nparts: int, *tables):
    """Partition a chunk of edge blocks into per-range (src, dst[, w])
    shards — range p covers [bounds[p-1], bounds[p]) per the engine's
    boundary convention (same as derive_sym_index / aligned state sort)."""
    src, dst, w = _tables_to_numpy(tables, weighted)
    if src is None:
        return tuple([None] * nparts)
    pid = np.searchsorted(bounds_arr, src, side="right")
    order = np.argsort(pid, kind="stable")
    src, dst, pid = src[order], dst[order], pid[order]
    if weighted:
        w = w[order]
    cuts = np.searchsorted(pid, np.arange(1, nparts))
    out, lo = [], 0
    for c in list(cuts) + [len(src)]:
        c = int(c)
        if c > lo:
            out.append((src[lo:c], dst[lo:c], w[lo:c] if weighted else None))
        else:
            out.append(None)
        lo = c
    return tuple(out)


@ray.remote(num_returns=2)
def _build_range(weighted: bool, with_in_index: bool, *shards):
    """Concatenate one range's shards (block order), lexsort by (src, dst)
    — deterministic at any parallelism, and rows arrive dst-sorted within
    each src — then assemble the CSR block."""
    parts = [s for s in shards if s is not None]
    if not parts:
        return (None, None)
    src = np.concatenate([p[0] for p in parts])
    dst = np.concatenate([p[1] for p in parts])
    w = np.concatenate([p[2] for p in parts]) if weighted else None
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    if weighted:
        w = w[order]
    return _assemble_block(src, dst, w, weighted, with_in_index)


@ray.remote(num_returns=2)
def _build_whole(weighted: bool, with_in_index: bool, *tables):
    """Single-partition build: all edge blocks into one CSR block."""
    src, dst, w = _tables_to_numpy(tables, weighted)
    if src is None:
        return (None, None)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    if weighted:
        w = w[order]
    return _assemble_block(src, dst, w, weighted, with_in_index)


# Per-worker-process cache of fetched CSR blocks. ray.get of a plasma object
# on the same node is zero-copy; this cache just avoids repeated handle
# resolution and keeps the numpy views alive across batches.
_BLOCK_CACHE: dict = {}


def fetch_block(ref: ray.ObjectRef) -> dict:
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    blk = _BLOCK_CACHE.get(key)
    if blk is None:
        blk = ray.get(ref)
        _BLOCK_CACHE[key] = blk
    return blk


def slices_for(block: dict, verts: np.ndarray):
    """Vectorized CSR row gather: for local vertex ids ``verts`` (already
    clipped to the block range), return (edge_index_array, lens) selecting
    each vertex's out-edge slice from the block's dst/weight arrays."""
    indptr = block["indptr"]
    lid = block_local(block, verts)
    present = lid >= 0
    lid0 = np.where(present, lid, 0)
    starts = np.where(present, indptr[lid0], 0)
    lens = np.where(present, indptr[lid0 + 1] - starts, 0).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), lens
    # standard repeat/arange slice-gather
    offs = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    idx = np.arange(total, dtype=np.int64) + np.repeat(starts - offs, lens)
    return idx, lens


@ray.remote(num_returns=2)
def _build_sym_block(lo: int, hi: int, all_descs, weighted: bool):
    """Build one symmetrized CSR block for src range [lo, hi) from the OUT
    index's blocks: local out-edges (src already in range, src-sorted) +
    every block's reversed edges with dst in range (in-index slices,
    dst-sorted = new-src-sorted). One stable argsort merges the P+1 sorted
    runs; no Ray Data shuffle."""
    srcs, dsts, ws = [], [], []
    for (vlo, vhi, ref) in all_descs:
        blk = fetch_block(ref)
        # forward edges of this block that fall in [lo, hi)
        if vlo < hi and vhi >= lo:
            ip = blk["indptr"]
            local = (blk["row_vids"] if "row_vids" in blk
                     else np.arange(blk["vlo"], blk["vhi"] + 1, dtype=np.int64))
            sel = (local >= lo) & (local < hi)
            if sel.any():
                first, last = np.flatnonzero(sel)[[0, -1]]
                e0, e1 = int(ip[first]), int(ip[last + 1])
                if e1 > e0:
                    counts = np.diff(ip[first : last + 2])
                    srcs.append(np.repeat(local[first : last + 1], counts))
                    dsts.append(blk["dst"][e0:e1])
                    if weighted:
                        ws.append(blk["weight"][e0:e1])
        # reversed edges: this block's in-index entries with dst in range
        ind = blk["in_dst"]
        if len(ind) == 0:
            continue
        g0, g1 = np.searchsorted(ind, [lo, hi])
        if g1 <= g0:
            continue
        starts_arr = blk["in_starts"]
        ends_arr = np.append(starts_arr[1:], len(blk["in_src"]))
        e0, e1 = int(starts_arr[g0]), int(ends_arr[g1 - 1])
        glens = (ends_arr[g0:g1] - starts_arr[g0:g1]).astype(np.int64)
        srcs.append(np.repeat(ind[g0:g1].astype(np.int64), glens))
        isrc = blk["in_src"][e0:e1].astype(np.int64)
        dsts.append(blk["row_vids"][isrc] if "row_vids" in blk
                    else isrc + blk["vlo"])
        if weighted:
            ws.append(blk["in_weight"][e0:e1])
    if not srcs:
        return (None, None)
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    w = np.concatenate(ws)[order] if weighted else None
    return _assemble_block(src, dst, w, weighted, True)


def derive_sym_index(csr_out: CSRIndex, weighted: bool = False) -> CSRIndex:
    """Symmetrized CSR derived from an existing out-index — the P x P
    in-index exchange replaces the second full sort-shuffle a fresh build
    would pay (VERDICT round-1: PR and CC/LPA each built separate
    indexes; the sym view is a per-partition flip + merge of the out
    blocks). Same boundaries as the out index; per-range |E| roughly
    doubles (out_p + in_p)."""
    big = np.int64(2**62)
    bounds = list(csr_out.boundaries)
    lows = [-int(big)] + bounds
    highs = bounds + [int(big)]
    descs = csr_out.block_descriptors()
    pairs = [
        _build_sym_block.remote(lo, hi, descs, weighted)
        for lo, hi in zip(lows, highs)
    ]
    metas = []
    for meta, data_ref in zip(ray.get([p[0] for p in pairs]), [p[1] for p in pairs]):
        if meta is None:
            continue
        vlo, vhi, ne = meta
        metas.append(CSRBlockMeta(vlo=vlo, vhi=vhi, n_edges=ne, ref=data_ref))
    metas.sort(key=lambda m: m.vlo)
    return CSRIndex(
        blocks=metas, boundaries=bounds,
        num_edges=int(sum(m.n_edges for m in metas)),
    )
