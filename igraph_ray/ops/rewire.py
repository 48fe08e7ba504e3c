"""Degree-preserving graph randomization — the engine's counterpart of
igraph_rewire (/root/reference/src/structural_properties.c:1734 →
games.c:2816 igraph_i_rewire), which runs edge-swap trials that keep the
graph simple. Needed for null-model significance testing of
motif/community/census results (SURVEY.md §2.4).

Distributed plan (NOT the reference's sequential MCMC): a full random
permutation of the dst column preserves every vertex's out-degree (src
rows untouched) and in-degree (dst multiset unchanged) in one shot — the
configuration-model shuffle — and mixes *globally*, where per-partition
swaps would only mix locally. The permutation is a seeded splitmix64 sort
key per row: sort the dst column by key (one boundary-free range shuffle),
re-zip with the src column by global row position. Rows whose permuted
result violates simplicity (loops or duplicate (src,dst) pairs) are
re-permuted together with an equal-size seeded sample of clean rows
(the partner-swap that breaks identical-dst deadlocks) for up to
``max_rounds`` shrinking rounds; each round touches only the violating
fraction (~m·d/n expected), not the full edge set.

Determinism: everything keys off splitmix64(rowid, seed) — same seed,
same input order ⇒ identical output on any partition count.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from igraph_ray.util import hash_join

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (public-domain constant
    mix; same recurrence the dedup sketches use)."""
    z = x + _GOLDEN
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


def _with_rowids(ds: ray.data.Dataset) -> Tuple[List[ray.ObjectRef], List[int]]:
    """Materialized block refs + per-block global row offsets (driver holds
    only P descriptors; the id-assignment pass is one task per block)."""
    mat = ds.materialize()
    refs = list(mat.to_arrow_refs())
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64).tolist()
    return refs, offsets


def _permute_dst(
    pairs: ray.data.Dataset, seed: int, num_partitions: int
) -> ray.data.Dataset:
    """Return (src, dst) with the dst column globally permuted by the
    seeded splitmix64 order. Two boundary-free sorts + one hash join,
    all over (int64, int64) columns — no full-row materialization on the
    driver."""
    refs, offsets = _with_rowids(pairs)

    @ray.remote(num_returns=2)
    def _split(t: pa.Table, off: int, sd: int):
        if t.num_rows == 0 or "src" not in t.column_names:
            e = pa.array([], pa.int64())
            return (pa.table({"rowid": e, "src": e}),
                    pa.table({"key": e, "dst": e}))
        rid = np.arange(off, off + t.num_rows, dtype=np.int64)
        key = _splitmix(rid.astype(np.uint64) + np.uint64(sd)).astype(np.int64)
        left = pa.table({"rowid": pa.array(rid), "src": t["src"]})
        right = pa.table({"key": pa.array(key), "dst": t["dst"]})
        return left, right

    split = [_split.remote(r, o, seed) for r, o in zip(refs, offsets)]
    left = ray.data.from_arrow_refs([p[0] for p in split])
    keyed = ray.data.from_arrow_refs([p[1] for p in split])
    # sort dsts into the random order, then assign the SAME global row-id
    # space by position: row i of the sorted stream becomes the dst of
    # row i of the original src order
    srefs, soffs = _with_rowids(keyed.sort("key"))

    @ray.remote
    def _rank(t: pa.Table, off: int) -> pa.Table:
        if t.num_rows == 0 or "dst" not in t.column_names:
            return pa.table(
                {"rowid": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        rid = np.arange(off, off + t.num_rows, dtype=np.int64)
        return pa.table({"rowid": pa.array(rid), "dst": t["dst"]})

    right = ray.data.from_arrow_refs(
        [_rank.remote(r, o) for r, o in zip(srefs, soffs)]
    )
    j = hash_join(left, right, on="rowid", num_partitions=num_partitions)
    return j.select_columns(["src", "dst"])


def _mark_violations(
    edges: ray.data.Dataset, num_partitions: int
) -> ray.data.Dataset:
    """Tag each row ok/violating: loops, plus all-but-one row of every
    duplicate (src,dst) group (the kept one is fine — the pair exists
    once)."""
    refs, offsets = _with_rowids(edges)

    @ray.remote
    def _rid(t: pa.Table, off: int) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            e = pa.array([], pa.int64())
            return pa.table({"src": e, "dst": e, "rowid": e})
        rid = np.arange(off, off + t.num_rows, dtype=np.int64)
        return t.append_column("rowid", pa.array(rid))

    ridded = ray.data.from_arrow_refs(
        [_rid.remote(r, o) for r, o in zip(refs, offsets)]
    )
    # keeper rowid per (src,dst) group = min rowid; every other group
    # member is a duplicate violation
    keepers = ridded.groupby(["src", "dst"]).min("rowid")

    def _k(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "keeper": t["min(rowid)"]}
        )

    keepers = keepers.map_batches(_k, batch_format="pyarrow", batch_size=None)
    j = hash_join(ridded, keepers, on=("src", "dst"), num_partitions=num_partitions)

    def _flag(t: pa.Table) -> pa.Table:
        dup = pc.not_equal(t["rowid"], t["keeper"])
        loop = pc.equal(t["src"], t["dst"])
        return pa.table(
            {"rowid": t["rowid"], "src": t["src"], "dst": t["dst"],
             "bad": pc.or_(dup, loop)}
        )

    return j.map_batches(_flag, batch_format="pyarrow", batch_size=None)


def rewire(
    edges: ray.data.Dataset,
    seed: int = 42,
    num_partitions: int = 8,
    max_rounds: int = 30,
    keep_simple: bool = True,
    tail_cap: int = 200_000,
) -> ray.data.Dataset:
    """Degree-preserving randomization of a simple directed edge table.

    Matches igraph_rewire's contract (structural_properties.c:1734): the
    out- and in-degree sequences are preserved exactly, and with
    ``keep_simple`` the result has no loops and no multi-edges (assuming
    the input is simple). The *distribution* differs from the reference's
    swap MCMC — this is the configuration-model permutation with
    violation repair, which mixes at least as fast and runs distributed.

    Raises RuntimeError if simplicity cannot be repaired in
    ``max_rounds`` (pathological degree sequences, e.g. a star — the
    reference's trial loop equally cannot rewire those).
    """
    clean = edges.select_columns(["src", "dst"])
    out = _permute_dst(clean, seed, num_partitions)
    if not keep_simple:
        return out
    for rnd in range(max_rounds):
        flagged = _mark_violations(out, num_partitions).materialize()
        n_bad = int(
            flagged.map_batches(
                lambda t: pa.table(
                    {"n": pa.array(
                        [pc.sum(t["bad"]).as_py() or 0 if "bad" in t.column_names else 0],
                        pa.int64())}
                ),
                batch_format="pyarrow", batch_size=None,
            ).sum("n")
            or 0
        )
        if n_bad == 0:
            return flagged.select_columns(["src", "dst"])
        out = _repair_round(flagged, n_bad, seed, rnd, num_partitions, tail_cap)
    raise RuntimeError(
        f"rewire: could not restore simplicity in {max_rounds} rounds "
        f"(degree sequence may admit no simple rewiring)"
    )


def _repair_round(
    flagged: ray.data.Dataset,
    n_bad: int,
    seed: int,
    rnd: int,
    num_partitions: int,
    tail_cap: int = 0,  # retained for API compat; repair is uncapped now
) -> ray.data.Dataset:
    """One targeted edge-swap repair round (the distributed analogue of the
    reference's rejection trials, games.c:2816): pair each violating row
    with one seeded-random clean partner, propose the dst swap
    (b.src,c.dst)+(c.src,b.dst), and accept ONLY swaps whose two new pairs
    are loop-free, mutually distinct across this round's proposals, and
    absent from the current edge multiset. Accepted swaps strictly reduce
    the violation count and can never introduce a new violation — unlike
    blind re-permutation, which re-collides at the graph's density rate
    and stalls on dense inputs.

    Fully distributed: pairing is a rank-position hash join (violators
    ranked by rowid, partners by seeded hash — the keyed-segment exchange
    pattern), proposal-key distinctness is a groupby-min over the 2k key
    rows, multiset membership is a left-outer join against the edge
    table, and the accepted replacements apply through one rowid join.
    The driver holds only scalar counts; no violation cap, so repair
    semantics are identical at any violation volume."""
    rsd = np.uint64((seed + 1) * 1_000_003 + rnd)
    from igraph_ray.ops.layout import _global_rank

    # violating rows, deterministically ranked by rowid
    bad = flagged.map_batches(
        lambda t: t.filter(t["bad"]).select(["rowid", "src", "dst"])
        if "bad" in t.column_names else
        pa.table({"rowid": pa.array([], pa.int64()),
                  "src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None,
    )
    bad_ranked = _global_rank(bad, ["rowid"], "pos").map_batches(
        lambda t: pa.table({"pos": t["pos"], "b_rid": t["rowid"],
                            "b_src": t["src"], "b_dst": t["dst"]}),
        batch_format="pyarrow", batch_size=None)
    k = n_bad
    total = flagged.count()
    frac = min(1.0, (4.0 * k + 64.0) / max(1, total - n_bad))

    def _sample_clean(t: pa.Table, _rsd=rsd, _frac=frac) -> pa.Table:
        empty = pa.table({"rowid": pa.array([], pa.int64()),
                          "src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64())})
        if t.num_rows == 0 or "bad" not in t.column_names:
            return empty
        good = pc.invert(t["bad"]).to_numpy(zero_copy_only=False)
        rid = t["rowid"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix(rid ^ _rsd)
        pick = good & ((h.astype(np.float64) / 2**64) < _frac)
        out = t.filter(pa.array(pick)).select(["rowid", "src", "dst"])
        return out.append_column(
            "h", pa.array(h[pick].astype(np.int64), pa.int64()))

    partners = flagged.map_batches(_sample_clean, batch_format="pyarrow",
                                   batch_size=None)
    if partners.count() == 0:
        return flagged.select_columns(["src", "dst"])
    # deterministic pseudo-random pairing order: rank partners by
    # (hash, rowid) and join rank-to-rank with the violator stream
    part_ranked = _global_rank(partners, ["h", "rowid"], "pos").map_batches(
        lambda t: pa.table({"pos": t["pos"], "c_rid": t["rowid"],
                            "c_src": t["src"], "c_dst": t["dst"]}),
        batch_format="pyarrow", batch_size=None)
    props = hash_join(bad_ranked, part_ranked, on="pos",
                      num_partitions=num_partitions).materialize()
    kk = props.count()
    if kk == 0:
        return flagged.select_columns(["src", "dst"])

    # 2·kk proposal keys, pk = global first-occurrence index (n1 keys at
    # pos, n2 keys at pos+kk — the concatenated layout of the original
    # distinctness rule)
    def _keys(t: pa.Table, _kk=kk) -> pa.Table:
        if t.num_rows == 0 or "pos" not in t.column_names:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "pk": pa.array([], pa.int64())})
        pos = t["pos"].to_numpy(zero_copy_only=False)
        n1s = t["b_src"].to_numpy(zero_copy_only=False)
        n1d = t["c_dst"].to_numpy(zero_copy_only=False)
        n2s = t["c_src"].to_numpy(zero_copy_only=False)
        n2d = t["b_dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([n1s, n2s]), pa.int64()),
            "dst": pa.array(np.concatenate([n1d, n2d]), pa.int64()),
            "pk": pa.array(np.concatenate([pos, pos + _kk]), pa.int64())})

    key_rows = props.map_batches(_keys, batch_format="pyarrow",
                                 batch_size=None).materialize()
    # first occurrence per proposed key (mutual distinctness)
    winners = key_rows.groupby(["src", "dst"]).min("pk").map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"],
                            "win_pk": t["min(pk)"]}),
        batch_format="pyarrow", batch_size=None)
    keyed = hash_join(key_rows, winners, on=("src", "dst"),
                      num_partitions=num_partitions)
    # multiset membership: proposed keys already present in the edge
    # table — one broadcast semi-join streaming over the edges (the
    # key_rows side is O(n_bad) and broadcasts; no edge-table shuffle)
    hits = hash_join(flagged.select_columns(["src", "dst"]), key_rows,
                     on=("src", "dst"), num_partitions=num_partitions) \
        .groupby("pk").count().map_batches(
            lambda t: pa.table({"pk": t["pk"],
                                "hit": pc.cast(
                                    pc.greater(t["count()"], 0),
                                    pa.int8())}),
            batch_format="pyarrow", batch_size=None)
    keyed = hash_join(keyed, hits, on="pk",
                      num_partitions=num_partitions,
                      join_type="left_outer")

    def _key_ok(t: pa.Table, _kk=kk) -> pa.Table:
        if t.num_rows == 0 or "pk" not in t.column_names:
            return pa.table({"pos": pa.array([], pa.int64()),
                             "okc": pa.array([], pa.int64())})
        pk = t["pk"].to_numpy(zero_copy_only=False)
        win = t["win_pk"].to_numpy(zero_copy_only=False)
        hit = (pc.is_valid(t["hit"]).to_numpy(zero_copy_only=False)
               if "hit" in t.column_names else np.zeros(len(pk), bool))
        ok = (pk == win) & ~hit
        pos = np.where(pk < _kk, pk, pk - _kk)
        return pa.table({"pos": pa.array(pos, pa.int64()),
                         "okc": pa.array(ok.astype(np.int64), pa.int64())})

    # a proposal is accepted iff BOTH its key rows pass: sum(okc) == 2
    ok_pos = keyed.map_batches(_key_ok, batch_format="pyarrow",
                               batch_size=None) \
        .groupby("pos").sum("okc").map_batches(
            lambda t: pa.table({"pos": t["pos"], "n_ok": t["sum(okc)"]}),
            batch_format="pyarrow", batch_size=None)
    accepted = hash_join(props, ok_pos, on="pos",
                         num_partitions=num_partitions)

    def _repl(t: pa.Table) -> pa.Table:
        empty = pa.table({"rowid": pa.array([], pa.int64()),
                          "new_src": pa.array([], pa.int64()),
                          "new_dst": pa.array([], pa.int64())})
        if t.num_rows == 0 or "n_ok" not in t.column_names:
            return empty
        keep = (t["n_ok"].to_numpy(zero_copy_only=False) == 2)
        # loop-free guard on both new pairs
        n1s = t["b_src"].to_numpy(zero_copy_only=False)
        n1d = t["c_dst"].to_numpy(zero_copy_only=False)
        n2s = t["c_src"].to_numpy(zero_copy_only=False)
        n2d = t["b_dst"].to_numpy(zero_copy_only=False)
        keep &= (n1s != n1d) & (n2s != n2d)
        b_rid = t["b_rid"].to_numpy(zero_copy_only=False)[keep]
        c_rid = t["c_rid"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "rowid": pa.array(np.concatenate([b_rid, c_rid]), pa.int64()),
            "new_src": pa.array(np.concatenate([n1s[keep], n2s[keep]]),
                                pa.int64()),
            "new_dst": pa.array(np.concatenate([n1d[keep], n2d[keep]]),
                                pa.int64())})

    repl = accepted.map_batches(_repl, batch_format="pyarrow",
                                batch_size=None)
    merged = hash_join(flagged.select_columns(["rowid", "src", "dst"]),
                       repl, on="rowid", num_partitions=num_partitions,
                       join_type="left_outer")

    def _apply(t: pa.Table) -> pa.Table:
        if "new_src" not in t.column_names:  # no accepted swaps this round
            return t.select(["src", "dst"])
        s = pc.if_else(pc.is_null(t["new_src"]), t["src"],
                       pc.cast(t["new_src"], pa.int64()))
        d = pc.if_else(pc.is_null(t["new_dst"]), t["dst"],
                       pc.cast(t["new_dst"], pa.int64()))
        return pa.table({"src": s, "dst": d})

    return merged.map_batches(_apply, batch_format="pyarrow",
                              batch_size=None)


def rewire_edges(
    edges: ray.data.Dataset,
    n: int,
    prob_e6: int,
    seed: int = 19,
    loops: bool = False,
) -> ray.data.Dataset:
    """igraph_rewire_edges (games.c:2843, multiple=True branch): every
    edge ENDPOINT is independently rewired with probability p to a
    uniformly drawn vertex; with ``loops=False`` the draw uses the
    reference's r-over-[0, n-2] trick (r != other ? r : n-1) so no loop
    is created. md5-deterministic variant: endpoints are indexed by the
    canonical (src, dst) sort rank — side a first, then side b against
    the ALREADY-REWIRED a, matching the reference's flat in-order
    endpoint walk — with one 32-bit fold per decision/draw and an exact
    integer threshold floor(p·2³²/1e6); SQL-replayable via ROW_NUMBER
    over the same order. Returns the rewired (src, dst)."""
    import hashlib

    from igraph_ray.ops.layout import _global_rank

    thr = int(prob_e6) * (1 << 32) // 1_000_000

    def _f8(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    ranked = _global_rank(
        edges.select_columns(["src", "dst"]), ["src", "dst"], "idx")

    def _rw(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False).astype(np.int64).copy()
        dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64).copy()
        idx = b["idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = np.array([_f8(f"{seed}:a:{int(i)}") for i in idx],
                      np.int64) < thr
        ra = np.array([_f8(f"{seed}:ra:{int(i)}") for i in idx], np.int64)
        db = np.array([_f8(f"{seed}:b:{int(i)}") for i in idx],
                      np.int64) < thr
        rb = np.array([_f8(f"{seed}:rb:{int(i)}") for i in idx], np.int64)
        if loops:
            src = np.where(da, ra % n, src)
            dst = np.where(db, rb % n, dst)
        else:
            r = ra % (n - 1)
            src = np.where(da, np.where(r != dst, r, n - 1), src)
            r2 = rb % (n - 1)
            dst = np.where(db, np.where(r2 != src, r2, n - 1), dst)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return ranked.map_batches(_rw, batch_format="pyarrow",
                              batch_size=None)
