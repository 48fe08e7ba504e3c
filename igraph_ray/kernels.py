"""Vectorized per-block message kernels shared by both execution modes.

Each kernel takes a CSR block (csr.py) plus the vertex-state arrays for a
batch of source vertices and emits the superstep's messages, pre-combined
within the batch (np.unique / bincount / lexsort+reduceat). The per-batch
combine is the hub-skew defense: a dst with millions of in-edges receives
at most one row per (batch × block) instead of one per edge.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from igraph_ray.csr import fetch_block, slices_for


def _scan_blocks(blocks, verts: np.ndarray, extra_mask=None):
    """Yield (blk, sel, idx, lens) for every CSR block overlapping verts."""
    if len(verts) == 0:
        return
    vmin = verts.min()
    vmax = verts.max()
    for (vlo, vhi, ref) in blocks:
        if vhi < vmin or vlo > vmax:
            continue
        sel = (verts >= vlo) & (verts <= vhi)
        if extra_mask is not None:
            sel = sel & extra_mask
        if not sel.any():
            continue
        blk = fetch_block(ref)
        idx, lens = slices_for(blk, verts[sel])
        if len(idx) == 0:
            continue
        yield blk, sel, idx, lens


def pagerank_messages_csc(
    blocks, verts: np.ndarray, pr: np.ndarray, deg: np.ndarray, weighted: bool
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """In-index (CSC) gather: per block, (unique dsts ascending, summed
    contributions) via one sequential ``np.add.reduceat`` scan.

    The dst-sorted edge layout is prebuilt in the CSR block (csr.py
    with_in_index — the ii/is analogue), so the hot loop has NO sort,
    unique, or large scatter: random reads hit only the block-width contrib
    array (cache resident), everything else streams — this is what keeps
    per-task time flat under full-core parallelism.
    """
    out: List[Tuple[np.ndarray, np.ndarray]] = []
    if len(verts) == 0:
        return out
    vmin = verts.min()
    vmax = verts.max()
    from igraph_ray.csr import fetch_block

    for (vlo, vhi, ref) in blocks:
        if vhi < vmin or vlo > vmax:
            continue
        sel = (verts >= vlo) & (verts <= vhi)
        if not sel.any():
            continue
        blk = fetch_block(ref)
        from igraph_ray.csr import block_local, block_width

        contrib = np.zeros(block_width(blk))
        local = block_local(blk, verts[sel])
        dsel = deg[sel]
        live = (dsel > 0.0) & (local >= 0)
        contrib[local[live]] = pr[sel][live] / dsel[live]
        vals = contrib[blk["in_src"]]
        if weighted:
            vals = vals * blk["in_weight"]
        if len(blk["in_starts"]) == 0:
            continue
        partial = np.add.reduceat(vals, blk["in_starts"])
        out.append((blk["in_dst"], partial))
    return out


def pagerank_messages(
    blocks, verts: np.ndarray, pr: np.ndarray, deg: np.ndarray, weighted: bool
) -> Tuple[np.ndarray, np.ndarray]:
    """(dst, Σ pr[src]*w/deg[src]) pre-combined per dst."""
    out_d: List[np.ndarray] = []
    out_v: List[np.ndarray] = []
    live = deg > 0.0
    for blk, sel, idx, lens in _scan_blocks(blocks, verts, live):
        out_d.append(blk["dst"][idx])
        contrib = pr[sel] / deg[sel]
        if weighted:
            out_v.append(np.repeat(contrib, lens) * blk["weight"][idx])
        else:
            out_v.append(np.repeat(contrib, lens))
    if not out_d:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    alld = np.concatenate(out_d)
    allv = np.concatenate(out_v)
    dsts, inv = np.unique(alld, return_inverse=True)
    partial = np.bincount(inv, weights=allv)
    return dsts, partial


def minlabel_messages_csc(
    blocks, verts: np.ndarray, labels: np.ndarray, sentinel: int
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """In-index variant of the min-label gather: per block, (unique dsts
    ascending, min incoming label) via one sequential
    ``np.minimum.reduceat`` — no sort / scatter in the hot loop."""
    out: List[Tuple[np.ndarray, np.ndarray]] = []
    if len(verts) == 0:
        return out
    vmin = verts.min()
    vmax = verts.max()
    from igraph_ray.csr import fetch_block

    for (vlo, vhi, ref) in blocks:
        if vhi < vmin or vlo > vmax:
            continue
        sel = (verts >= vlo) & (verts <= vhi)
        if not sel.any():
            continue
        blk = fetch_block(ref)
        if "in_src" not in blk:
            # fall back to the generic kernel for this block
            d, m = minlabel_messages([(vlo, vhi, ref)], verts[sel], labels[sel], sentinel)
            if len(d):
                out.append((d, m))
            continue
        from igraph_ray.csr import block_local, block_width

        lab_local = np.full(block_width(blk), sentinel, dtype=np.int64)
        loc = block_local(blk, verts[sel])
        pres = loc >= 0
        lab_local[loc[pres]] = labels[sel][pres]
        vals = lab_local[blk["in_src"]]
        if len(blk["in_starts"]) == 0:
            continue
        minl = np.minimum.reduceat(vals, blk["in_starts"])
        out.append((blk["in_dst"], minl))
    return out


def minlabel_messages(
    blocks, verts: np.ndarray, labels: np.ndarray, sentinel: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(dst, min incoming label) pre-combined per dst."""
    out_d: List[np.ndarray] = []
    out_l: List[np.ndarray] = []
    for blk, sel, idx, lens in _scan_blocks(blocks, verts):
        out_d.append(blk["dst"][idx])
        out_l.append(np.repeat(labels[sel], lens))
    if not out_d:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    alld = np.concatenate(out_d)
    alll = np.concatenate(out_l)
    dsts, inv = np.unique(alld, return_inverse=True)
    minl = np.full(len(dsts), sentinel, dtype=np.int64)
    np.minimum.at(minl, inv, alll)
    return dsts, minl


def label_weight_messages(
    blocks, verts: np.ndarray, labels: np.ndarray, weighted: bool
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(dst, label, Σw) pre-combined per (dst, label)."""
    out_d: List[np.ndarray] = []
    out_l: List[np.ndarray] = []
    out_w: List[np.ndarray] = []
    for blk, sel, idx, lens in _scan_blocks(blocks, verts):
        out_d.append(blk["dst"][idx])
        out_l.append(np.repeat(labels[sel], lens))
        if weighted:
            out_w.append(blk["weight"][idx])
        else:
            out_w.append(np.ones(len(idx)))
    if not out_d:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64)
    alld = np.concatenate(out_d)
    alll = np.concatenate(out_l)
    allw = np.concatenate(out_w)
    return combine_label_weights(alld, alll, allw)


def combine_label_weights(
    dst: np.ndarray, lab: np.ndarray, w: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sum w per (dst, label), output sorted by (dst, label).

    Fast path packs the pair into one uint64 sort key (single-key sort
    beats the two-pass lexsort ~2x on the LPA hot loop); ids outside
    [0, 2^31) fall back to lexsort."""
    if len(dst) == 0:
        return dst, lab, w
    if (dst[0] >= 0 and lab.min() >= 0
            and dst[-1] < 2**31 and lab.max() < 2**31 and dst.min() >= 0
            and dst.max() < 2**31):
        key = (dst.astype(np.uint64) << np.uint64(32)) | lab.astype(np.uint64)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        newgrp = np.empty(len(ks), dtype=bool)
        newgrp[0] = True
        np.not_equal(ks[1:], ks[:-1], out=newgrp[1:])
        starts = np.flatnonzero(newgrp)
        kk = ks[starts]
        return ((kk >> np.uint64(32)).astype(np.int64),
                (kk & np.uint64(0xFFFFFFFF)).astype(np.int64),
                np.add.reduceat(w[order], starts))
    order = np.lexsort((lab, dst))
    dst, lab, w = dst[order], lab[order], w[order]
    newgrp = np.empty(len(dst), dtype=bool)
    newgrp[0] = True
    np.not_equal(dst[1:], dst[:-1], out=newgrp[1:])
    newgrp[1:] |= lab[1:] != lab[:-1]
    starts = np.flatnonzero(newgrp)
    return dst[starts], lab[starts], np.add.reduceat(w, starts)


def lpa_argmax(
    dst: np.ndarray, lab: np.ndarray, w: np.ndarray,
    own_dst: np.ndarray, own_lab: np.ndarray,
    grouped: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Synchronous LPA update: per dst pick the max-weight label, ties →
    smallest label; dsts with no weighted rows keep their own label.
    ``own_dst`` must be sorted ascending and contain every dst exactly once.
    ``grouped=True`` asserts the rows are already sorted by (dst, label)
    with one row per pair (combine_label_weights output) — the aligned
    hot loop's path, which replaces the 3-key lexsort with two reduceat
    segment scans. Returns (new_labels aligned to own_dst, changed mask)."""
    new_lab = own_lab.copy()
    cand = w > 0.0
    if not cand.any():
        return new_lab, new_lab != own_lab
    cd, cl, cw = dst[cand], lab[cand], w[cand]
    if grouped:
        first = np.empty(len(cd), dtype=bool)
        first[0] = True
        np.not_equal(cd[1:], cd[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        gid = np.cumsum(first) - 1
        maxw = np.maximum.reduceat(cw, starts)
        is_max = cw == maxw[gid]
        # labels ascend within each dst group, so the min over max-weight
        # rows is the smallest-label tie-break
        masked = np.where(is_max, cl, np.iinfo(np.int64).max)
        best = np.minimum.reduceat(masked, starts)
        pos = np.searchsorted(own_dst, cd[starts])
        new_lab[pos] = best
        return new_lab, new_lab != own_lab
    order = np.lexsort((cl, -cw, cd))
    cd, cl = cd[order], cl[order]
    first = np.empty(len(cd), dtype=bool)
    first[0] = True
    np.not_equal(cd[1:], cd[:-1], out=first[1:])
    pos = np.searchsorted(own_dst, cd[first])
    new_lab[pos] = cl[first]
    return new_lab, new_lab != own_lab
