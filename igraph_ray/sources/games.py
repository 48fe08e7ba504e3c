"""Random-graph generators — the engine's games.c analogue
(/root/reference/src/games.c: erdos_renyi :760-814, watts_strogatz
:1441, degree_sequence :1205, static power-law :419-ish family).

Every generator is deterministic AND partition-layout-independent: the
edge/pair index space is cut into fixed-size chunks (CHUNK indices), one
seeded generator per chunk (`default_rng(splitmix(seed, chunk_id))`), and
Ray tasks each own a contiguous run of chunks — so the same (args, seed)
produce the identical edge multiset at any parallelism, the property the
reference gets from its single sequential MT19937 stream (random.c:391)
and that a distributed run must engineer explicitly.

G(n,p) uses the Batagelj–Brandes geometric-jump enumeration of the
loop-free pair-index space (O(m) work, embarrassingly parallel per index
range); G(n,m) samples m distinct pair indices by draw-dedup-top-up
rounds (collision fraction m/n² — negligible at scale); Watts–Strogatz
builds the ring lattice per vertex range and rewires each edge with
probability p; the configuration model pairs out-stubs with a globally
permuted in-stub stream (the same seeded-sort-key permutation rewire
uses); static_power_law is the Chung–Lu sampler bench.py's fixture uses,
with the inverse-CDF table broadcast once via ray.put.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_CHUNK = 1 << 20  # fixed index-space chunk: the unit of determinism


def _mix(seed: int, chunk_id: int) -> int:
    z = (np.uint64(seed) * _GOLDEN) ^ np.uint64(chunk_id)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return int(z ^ (z >> np.uint64(31)))


def _pairs_from_index(k: np.ndarray, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Map loop-free directed pair index k ∈ [0, n(n-1)) to (src, dst)."""
    src = k // (n - 1)
    r = k % (n - 1)
    dst = np.where(r < src, r, r + 1)
    return src.astype(np.int64), dst.astype(np.int64)


def _from_refs(refs: List) -> ray.data.Dataset:
    if not refs:
        return ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
    return ray.data.from_arrow_refs(refs)


def _chunk_runs(total_chunks: int, num_partitions: int) -> List[Tuple[int, int]]:
    """Split chunk ids [0, total_chunks) into ≤num_partitions contiguous runs."""
    P = max(1, min(num_partitions, total_chunks))
    bounds = [total_chunks * i // P for i in range(P + 1)]
    return [(bounds[i], bounds[i + 1]) for i in range(P) if bounds[i + 1] > bounds[i]]


def erdos_renyi_gnp(
    n: int, p: float, seed: int = 42, num_partitions: int = 8
) -> ray.data.Dataset:
    """G(n, p) directed, no loops (igraph_erdos_renyi_game GNP,
    games.c:760): each ordered loop-free pair present independently with
    probability p, via geometric jumps over the pair-index space."""
    if n < 2 or p <= 0.0:
        return _from_refs([])
    if p >= 1.0:
        from igraph_ray.ops.relational import complementer_edges

        none = ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
        return complementer_edges(none, n=n, num_partitions=num_partitions)
    space = n * (n - 1)
    total_chunks = (space + _CHUNK - 1) // _CHUNK

    @ray.remote
    def _run(lo_chunk: int, hi_chunk: int) -> pa.Table:
        outs = []
        for c in range(lo_chunk, hi_chunk):
            rng = np.random.default_rng(_mix(seed, c))
            lo = c * _CHUNK
            hi = min(space, lo + _CHUNK)
            span = hi - lo
            # geometric(p) jump enumeration: expected span*p hits
            est = int(span * p * 1.2) + 16
            ks: List[np.ndarray] = []
            pos = lo - 1
            while pos < hi - 1:
                jumps = rng.geometric(p, size=est)
                hits = pos + np.cumsum(jumps)
                take = hits[hits < hi]
                ks.append(take)
                if len(take) < len(hits):
                    break
                pos = int(hits[-1])
            k = np.concatenate(ks) if ks else np.empty(0, np.int64)
            if len(k):
                s, d = _pairs_from_index(k, n)
                outs.append(pa.table({"src": pa.array(s), "dst": pa.array(d)}))
        if not outs:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    refs = [_run.remote(a, b) for a, b in _chunk_runs(total_chunks, num_partitions)]
    return _from_refs(refs)


def erdos_renyi_gnm(
    n: int, m: int, seed: int = 42, num_partitions: int = 8, max_rounds: int = 8
) -> ray.data.Dataset:
    """G(n, m) directed, no loops, exactly m DISTINCT edges
    (igraph_erdos_renyi_game GNM, games.c:814): m distinct pair indices
    by parallel draw → dedup → top-up; the final exact-m cut takes the
    m smallest splitmix-hashed survivors (deterministic, order-free)."""
    space = n * (n - 1) if n > 1 else 0
    if m <= 0 or space == 0:
        return _from_refs([])
    if m > space:
        raise ValueError(f"m={m} exceeds loop-free pair space {space}")

    got: Optional[ray.data.Dataset] = None
    need = m
    have = 0
    for rnd in range(max_rounds):
        # a uniform draw lands on a NEW pair with prob (space-have)/space;
        # scale the overdraw by the inverse (the coupon-collector tail —
        # m close to the full pair space needs ~space·ln(space) draws)
        hit_rate = max(1e-9, (space - have) / space)
        draw = int(need / hit_rate * 1.2) + 16
        chunks = (draw + _CHUNK - 1) // _CHUNK

        @ray.remote
        def _draw(lo_chunk: int, hi_chunk: int, _rnd=rnd, _draw=draw, _chunks=chunks) -> pa.Table:
            outs = []
            for c in range(lo_chunk, hi_chunk):
                rng = np.random.default_rng(_mix(seed + 7919 * _rnd, c))
                cnt = min(_CHUNK, _draw - c * _CHUNK)
                k = rng.integers(0, space, size=cnt, dtype=np.int64)
                outs.append(pa.table({"k": pa.array(k)}))
            return pa.concat_tables(outs)

        new = _from_refs(
            [_draw.remote(a, b) for a, b in _chunk_runs(chunks, num_partitions)]
        )
        allk = new if got is None else got.union(new)
        got = allk.groupby("k").count().select_columns(["k"]).materialize()
        have = got.count()
        if have >= m:
            break
        need = m - have
    else:
        raise RuntimeError(f"gnm: could not reach {m} distinct pairs in {max_rounds} rounds")

    def _hash_cut(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
        z = (k + np.uint64(seed)) * _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (z ^ (z >> np.uint64(31))).astype(np.int64)
        return pa.table({"k": b["k"], "h": pa.array(h)})

    cut = got.map_batches(_hash_cut, batch_format="pyarrow", batch_size=None) \
        .sort("h").limit(m)

    def _to_pairs(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        s, d = _pairs_from_index(k, n)
        return pa.table({"src": pa.array(s), "dst": pa.array(d)})

    return cut.map_batches(_to_pairs, batch_format="pyarrow", batch_size=None)


def watts_strogatz(
    n: int, k_half: int, p: float, seed: int = 42, num_partitions: int = 8
) -> ray.data.Dataset:
    """Undirected ring lattice (each vertex linked to its k_half nearest
    clockwise neighbors) with per-edge rewiring probability p
    (igraph_watts_strogatz_game, games.c:1441; loops avoided, duplicate
    edges possible like the reference). Edges canonical as (src, dst) in
    ring order; rewired edges point anywhere."""
    if n < 2 or k_half < 1:
        return _from_refs([])
    total_chunks = (n + _CHUNK - 1) // _CHUNK

    @ray.remote
    def _run(lo_chunk: int, hi_chunk: int) -> pa.Table:
        outs = []
        for c in range(lo_chunk, hi_chunk):
            rng = np.random.default_rng(_mix(seed * 31 + 7, c))
            lo = c * _CHUNK
            hi = min(n, lo + _CHUNK)
            v = np.repeat(np.arange(lo, hi, dtype=np.int64), k_half)
            j = np.tile(np.arange(1, k_half + 1, dtype=np.int64), hi - lo)
            dst = (v + j) % n
            rew = rng.random(len(v)) < p
            if rew.any():
                nd = rng.integers(0, n, size=int(rew.sum()), dtype=np.int64)
                # avoid self-loops: shift collisions by one (mod n)
                nd = np.where(nd == v[rew], (nd + 1) % n, nd)
                dst[rew] = nd
            outs.append(pa.table({"src": pa.array(v), "dst": pa.array(dst)}))
        return pa.concat_tables(outs)

    refs = [_run.remote(a, b) for a, b in _chunk_runs(total_chunks, num_partitions)]
    return _from_refs(refs)


def degree_sequence_game(
    out_degrees: np.ndarray,
    in_degrees: Optional[np.ndarray] = None,
    seed: int = 42,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Directed configuration model (igraph_degree_sequence_game,
    games.c:1205 SIMPLE method): expand out-stubs and in-stubs, pair them
    through the seeded global permutation (rewire's sort-key machinery).
    Loops/multi-edges possible, exactly like the reference's SIMPLE
    method. Degree arrays are driver-side (one int per vertex) — at
    10^10+ vertices feed stub Datasets directly into
    igraph_ray.ops.rewire._permute_dst instead."""
    from igraph_ray.ops.rewire import _permute_dst

    out_degrees = np.asarray(out_degrees, dtype=np.int64)
    if in_degrees is None:
        in_degrees = out_degrees
    in_degrees = np.asarray(in_degrees, dtype=np.int64)
    if out_degrees.sum() != in_degrees.sum():
        raise ValueError("out/in stub counts differ")
    src = np.repeat(np.arange(len(out_degrees), dtype=np.int64), out_degrees)
    dst = np.repeat(np.arange(len(in_degrees), dtype=np.int64), in_degrees)
    stubs = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(max(1, num_partitions))
    return _permute_dst(stubs, seed, num_partitions)


def static_power_law(
    n: int, m: int, exponent: float = 2.3, seed: int = 42, num_partitions: int = 8
) -> ray.data.Dataset:
    """Chung–Lu style static power-law digraph: both endpoints drawn with
    P(v) ∝ rank^(−1/(γ−1)) via a broadcast inverse-CDF table (the
    igraph_static_power_law_game analogue, games.c; the same construction
    bench.py's fixture uses). Table is O(n) floats shipped once via
    ray.put — fine to ~10^8 vertices, chunk the CDF beyond that."""
    if n < 1 or m <= 0:
        return _from_refs([])
    s = 1.0 / (exponent - 1.0)
    w = np.arange(1, n + 1, dtype=np.float64) ** (-s)
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    cdf_ref = ray.put(cdf)
    total_chunks = (m + _CHUNK - 1) // _CHUNK

    @ray.remote
    def _run(lo_chunk: int, hi_chunk: int) -> pa.Table:
        table = ray.get(cdf_ref)
        outs = []
        for c in range(lo_chunk, hi_chunk):
            rng = np.random.default_rng(_mix(seed * 13 + 5, c))
            cnt = min(_CHUNK, m - c * _CHUNK)
            src = np.searchsorted(table, rng.random(cnt)).astype(np.int64)
            dst = np.searchsorted(table, rng.random(cnt)).astype(np.int64)
            outs.append(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
        return pa.concat_tables(outs)

    refs = [_run.remote(a, b) for a, b in _chunk_runs(total_chunks, num_partitions)]
    return _from_refs(refs)


def preference_game(
    n: int,
    type_dist: List[float],
    pref_matrix: List[List[float]],
    seed: int = 42,
    num_partitions: int = 8,
) -> Tuple[ray.data.Dataset, ray.data.Dataset]:
    """Directed preference game (igraph_preference_game, games.c —
    fixed-sizes variant): vertices get types in contiguous blocks whose
    sizes are the exact floor proportions of ``type_dist`` (remainders
    to the lowest type ids — deterministic, like the reference's
    fixed_sizes path), then each ordered type pair (i, j) is an
    independent G(block_i × block_j, pref_matrix[i][j]) with loops
    excluded on the diagonal — the same geometric-jump chunk
    enumeration erdos_renyi_gnp uses, seeded per (pair, chunk) so the
    edge set is identical at any parallelism.

    Returns (edges, types): types = (vertex, type)."""
    t = np.asarray(type_dist, dtype=np.float64)
    t = t / t.sum()
    k = len(t)
    sizes = np.floor(t * n).astype(np.int64)
    rem = n - int(sizes.sum())
    sizes[:rem] += 1
    blo = np.zeros(k + 1, np.int64)
    np.cumsum(sizes, out=blo[1:])

    def _types(b: pa.Table) -> pa.Table:
        v = b["vertex"].to_numpy(zero_copy_only=False)
        ty = np.searchsorted(blo[1:], v, side="right")
        return pa.table({"vertex": pa.array(v), "type": pa.array(ty)})

    types = ray.data.range(n).map_batches(
        lambda b: pa.table({"vertex": pa.array(b["id"], pa.int64())}),
        batch_format="pyarrow", batch_size=None,
    ).map_batches(_types, batch_format="pyarrow", batch_size=None)

    jobs = []  # (pair_id, i, j, p, space)
    pid = 0
    for i in range(k):
        for j in range(k):
            ni, nj = int(sizes[i]), int(sizes[j])
            p = float(pref_matrix[i][j])
            space = ni * (ni - 1) if i == j else ni * nj
            if p > 0.0 and space > 0:
                jobs.append((pid, i, j, p, space))
            pid += 1

    @ray.remote
    def _run(pair_id: int, i: int, j: int, p: float,
             lo_chunk: int, hi_chunk: int, space: int) -> pa.Table:
        ni = int(sizes[i])
        lo_i, lo_j = int(blo[i]), int(blo[j])
        outs = []
        for c in range(lo_chunk, hi_chunk):
            rng = np.random.default_rng(_mix(seed * 1009 + pair_id, c))
            lo = c * _CHUNK
            hi = min(space, lo + _CHUNK)
            if p >= 1.0:
                kk = np.arange(lo, hi, dtype=np.int64)
            else:
                est = int((hi - lo) * p * 1.2) + 16
                ks: List[np.ndarray] = []
                pos = lo - 1
                while pos < hi - 1:
                    jumps = rng.geometric(p, size=est)
                    hits = pos + np.cumsum(jumps)
                    take = hits[hits < hi]
                    ks.append(take)
                    if len(take) < len(hits):
                        break
                    pos = int(hits[-1])
                kk = np.concatenate(ks) if ks else np.empty(0, np.int64)
            if len(kk):
                if i == j:
                    s, d = _pairs_from_index(kk, ni)
                else:
                    nj = int(sizes[j])
                    s, d = kk // nj, kk % nj
                outs.append(pa.table({"src": pa.array(s + lo_i),
                                      "dst": pa.array(d + lo_j)}))
        if not outs:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    refs = []
    for (pair_id, i, j, p, space) in jobs:
        total_chunks = (space + _CHUNK - 1) // _CHUNK
        share = max(1, num_partitions // max(1, len(jobs)))
        for a, b in _chunk_runs(total_chunks, share):
            refs.append(_run.remote(pair_id, i, j, p, a, b, space))
    return _from_refs(refs), types


def barabasi_game(
    n: int, m: int = 1, seed: int = 42, num_partitions: int = 8
) -> ray.data.Dataset:
    """Preferential-attachment (Barabási–Albert) generator — the
    igraph_barabasi_game analogue (games.c:419). The reference grows the
    graph one vertex at a time from a sequential RNG stream; that chain
    is broken here with the *position-pointer* formulation used by
    communication-free distributed generators (Sanders & Schulz,
    "Communication-free Massively Distributed Graph Generation",
    IPDPS 2018 — public): choosing a target "with probability
    proportional to degree" IS choosing a uniformly random slot of the
    flattened endpoint array built so far. Slot values resolve by
    pointer chasing — slot 2e is edge e's (known) source, slot 2e+1
    points at an earlier random slot — so every draw is an independent
    md5 of (seed, v, j) and the whole edge list is a deterministic pure
    function of (n, m, seed), identical at any parallelism AND
    SQL-replayable (a recursive CTE chases the same pointers).

    Vertex v (1..n-1) attaches min(v, m) edges to targets among
    0..v-1; draw r for edge e uniform over the 2e existing slots
    (e=0 bootstraps to vertex 0). Resolution is a vectorized
    expected-O(log E) chase; E = Σ min(v, m) arrays live on the driver
    (16·E bytes — the generator's documented ceiling, same class as
    static_power_law's O(n) CDF table)."""
    import hashlib

    if n < 1:
        return _from_refs([])
    counts = np.minimum(np.arange(n, dtype=np.int64), m)
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    E = int(starts[-1])
    if E == 0:
        return _from_refs([])
    src = np.repeat(np.arange(n, dtype=np.int64), counts)
    j_idx = np.arange(E, dtype=np.int64) - starts[src]
    # independent md5 draw per edge: r_e < 2e (slot space before edge e)
    draws = np.array(
        [int(hashlib.md5(f"{seed}:{int(v)}:{int(j)}".encode())
             .hexdigest()[:15], 16)
         for v, j in zip(src, j_idx)], dtype=np.uint64)
    # slot space = slots of edges owned by vertices BEFORE v (igraph's
    # psumtree excludes the vertex being added: no loops, no same-round
    # feedback)
    space = 2 * starts[src]
    slots = np.where(space == 0, 0,
                     (draws % np.maximum(space, 1).astype(np.uint64))
                     .astype(np.int64))
    # chase: even slot -> that edge's source; odd slot -> that edge's
    # (not yet known) target -> jump to its slot
    cur = slots.copy()
    dst = np.full(E, -1, dtype=np.int64)
    unresolved = np.ones(E, dtype=bool)
    while unresolved.any():
        even = unresolved & (cur % 2 == 0)
        dst[even] = src[cur[even] // 2]
        unresolved &= ~even
        if not unresolved.any():
            break
        cur[unresolved] = slots[cur[unresolved] // 2]
    dst[starts[src] == 0] = 0  # bootstrap round attaches to vertex 0
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    return ray.data.from_arrow(t)


def callaway_traits_game(
    n: int,
    types: int = 2,
    edges_per_step: int = 1,
    type_dist=(1, 1),
    pref_e6=((500000, 500000), (500000, 500000)),
    seed: int = 42,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Growing network with vertex types — the
    igraph_callaway_traits_game analogue (games.c:1369). Per discrete
    step i = 1..n-1 and trial j = 0..edges_per_step-1 the reference
    draws two uniform existing vertices and links them with probability
    pref[type1][type2]; vertex types are drawn from type_dist. The
    sequential RNG stream is replaced by independent md5 draws
    (15-hex-prefix uniform over [0, 16^15), the engine's standard
    SQL-replayable draw):

        node1 = md5(seed:a:i:j) % (i+1)
        node2 = md5(seed:b:i:j) % (i+1)
        accept iff md5(seed:p:i:j) < floor(pref_e6[t1][t2]*16^15 / 1e6)
        type(v) = #{k >= 1 : md5(seed:t:v) >= ceil(cum[k]*16^15/maxcum)}

    with integer ``type_dist`` weights and ``pref_e6`` probabilities in
    parts-per-million — every comparison is integer-exact so the DuckDB
    oracle replays the generator bit-for-bit. Deterministic pure
    function of the parameters; per-step draws are embarrassingly
    parallel over a range dataset (no growth-order chain: unlike
    barabasi_game no pointer chasing is needed because targets are
    uniform, not degree-proportional)."""
    import hashlib as _hl

    HEX15 = 16 ** 15
    cum = [0]
    for w in type_dist:
        cum.append(cum[-1] + int(w))
    maxcum = cum[-1]
    if len(type_dist) != types or maxcum <= 0:
        raise ValueError("type_dist must have `types` positive int weights")
    cthr = [-((-c * HEX15) // maxcum) for c in cum]  # ceil, exact
    pthr = [[(int(p) * HEX15) // 1_000_000 for p in row] for row in pref_e6]

    def _d(key: str) -> int:
        return int(_hl.md5(key.encode()).hexdigest()[:15], 16)

    def _vtype(v: int) -> int:
        r = _d(f"{seed}:t:{v}")
        t = 0
        for k in range(1, types):
            if r >= cthr[k]:
                t = k
        return t

    def _gen(b: pa.Table) -> pa.Table:
        src, dst = [], []
        for i in b["id"].to_pylist():
            i = int(i)
            for j in range(edges_per_step):
                n1 = _d(f"{seed}:a:{i}:{j}") % (i + 1)
                n2 = _d(f"{seed}:b:{i}:{j}") % (i + 1)
                if _d(f"{seed}:p:{i}:{j}") < pthr[_vtype(n1)][_vtype(n2)]:
                    src.append(n1)
                    dst.append(n2)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    steps = ray.data.range(n - 1, override_num_blocks=num_partitions) \
        .map_batches(
            lambda b: pa.table({"id": pa.array(
                b["id"].to_numpy(zero_copy_only=False) + 1, pa.int64())}),
            batch_format="pyarrow", batch_size=None)
    return steps.map_batches(_gen, batch_format="pyarrow", batch_size=None)


def establishment_game(
    n: int,
    types: int = 2,
    k: int = 2,
    type_dist=(1, 1),
    pref_e6=((500000, 500000), (500000, 500000)),
    seed: int = 42,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Growing model with vertex types — the igraph_establishment_game
    analogue (games.c, directly below callaway): each new vertex
    i = k..n-1 tries to connect to k existing vertices, succeeding with
    probability pref[type_i][type_target]. Same md5-draw scheme as
    callaway_traits_game (see its docstring for the integer-exact
    thresholds). Documented deviation: the reference samples the k
    targets without replacement (igraph_random_sample's sequential
    stream); the communication-free variant draws each target
    independently (md5(seed:e:i:j) % i) — with-replacement, the same
    relaxation the reference itself uses in callaway_traits_game."""
    import hashlib as _hl

    HEX15 = 16 ** 15
    cum = [0]
    for w in type_dist:
        cum.append(cum[-1] + int(w))
    maxcum = cum[-1]
    if len(type_dist) != types or maxcum <= 0:
        raise ValueError("type_dist must have `types` positive int weights")
    cthr = [-((-c * HEX15) // maxcum) for c in cum]
    pthr = [[(int(p) * HEX15) // 1_000_000 for p in row] for row in pref_e6]

    def _d(key: str) -> int:
        return int(_hl.md5(key.encode()).hexdigest()[:15], 16)

    def _vtype(v: int) -> int:
        r = _d(f"{seed}:t:{v}")
        t = 0
        for kk in range(1, types):
            if r >= cthr[kk]:
                t = kk
        return t

    def _gen(b: pa.Table) -> pa.Table:
        src, dst = [], []
        for i in b["id"].to_pylist():
            i = int(i)
            t1 = _vtype(i)
            for j in range(k):
                tgt = _d(f"{seed}:e:{i}:{j}") % i
                if _d(f"{seed}:p:{i}:{j}") < pthr[t1][_vtype(tgt)]:
                    src.append(i)
                    dst.append(tgt)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    steps = ray.data.range(max(0, n - k), override_num_blocks=num_partitions) \
        .map_batches(
            lambda b: pa.table({"id": pa.array(
                b["id"].to_numpy(zero_copy_only=False) + k, pa.int64())}),
            batch_format="pyarrow", batch_size=None)
    return steps.map_batches(_gen, batch_format="pyarrow", batch_size=None)


def sbm_game(
    block_sizes: Tuple[int, ...],
    pref_e6,
    seed: int = 42,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Stochastic block model, undirected without loops
    (igraph_sbm_game, /root/reference/src/sbm.c:71: one Bernoulli trial
    per vertex pair with rate pref[block(i)][block(j)]; vertex ids
    ordered by block as in the reference's block_sizes contract).

    The reference draws geometric jumps from one sequential RNG; this
    variant gives every pair (i, j) an independent md5 15-hex draw with
    integer-exact thresholds floor(pref_e6 · 16^15 / 1e6), so the edge
    set is a pure function of (sizes, prefs, seed), identical at any
    parallelism and SQL-replayable. O(n²/P) per task over the full pair
    space — the md5-replayable variant; the jump-sampling scale path is
    `preference_game` above (same model with drawn types)."""
    import hashlib

    pref_e6 = [[int(x) for x in row] for row in pref_e6]
    k = len(block_sizes)
    assert len(pref_e6) == k and all(len(r) == k for r in pref_e6)
    assert all(pref_e6[a][b] == pref_e6[b][a] for a in range(k)
               for b in range(k)), "undirected SBM needs symmetric prefs"
    bounds = np.cumsum(np.asarray(block_sizes, np.int64))
    n = int(bounds[-1])
    HEX15 = 16 ** 15
    thr = np.array([[p * HEX15 // 1_000_000 for p in row]
                    for row in pref_e6], dtype=np.uint64)

    def _gen(b: pa.Table) -> pa.Table:
        outs_s, outs_d = [], []
        for i in b["id"].to_numpy(zero_copy_only=False):
            i = int(i)
            j = np.arange(i + 1, n, dtype=np.int64)
            if not len(j):
                continue
            bi = int(np.searchsorted(bounds, i, side="right"))
            bj = np.searchsorted(bounds, j, side="right")
            draws = np.array(
                [int(hashlib.md5(f"{seed}:s:{i}:{int(jj)}".encode())
                     .hexdigest()[:15], 16) for jj in j], dtype=np.uint64)
            keep = draws < thr[bi, bj]
            outs_s.append(np.full(int(keep.sum()), i, np.int64))
            outs_d.append(j[keep])
        if not outs_s:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": pa.array(np.concatenate(outs_s)),
                         "dst": pa.array(np.concatenate(outs_d))})

    return (ray.data.range(n, override_num_blocks=num_partitions)
            .map_batches(_gen, batch_format="pyarrow", batch_size=None))


def dot_product_game(
    n: int,
    dim: int = 4,
    mod: int = 1000,
    seed: int = 42,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Random dot-product graph, undirected (igraph_dot_product_game,
    /root/reference/src/dotproduct.c:59: P(i~j) = <x_i, x_j>, clamped —
    negative products never connect, products above one always do).

    Latent positions are the deterministic integer-e3 grid
    x_v[d] = ((v·7919 + d·104729) mod m) / 1000, so every dot
    product is the exact rational P(i,j)/1e6 with integer
    P = Σ_d ((i·7919+d·104729)%1000)·((j·7919+d·104729)%1000), and the
    edge rule  md5-draw(seed,i,j) < min(P, 1e6)·16^15 / 1e6  is
    integer-exact and SQL-replayable (reference contract: P ≥ 1e6 is an
    unconditional edge). O(n²/P) per task over the pair space, like the
    reference's own double loop."""
    import hashlib

    HEX15 = 16 ** 15

    def _pos(v) -> np.ndarray:
        d = np.arange(dim, dtype=np.int64)
        return (np.asarray(v, np.int64)[..., None] * 7919
                + d * 104729) % mod

    def _gen(b: pa.Table) -> pa.Table:
        outs_s, outs_d = [], []
        for i in b["id"].to_numpy(zero_copy_only=False):
            i = int(i)
            j = np.arange(i + 1, n, dtype=np.int64)
            if not len(j):
                continue
            p = np.minimum((_pos(i)[None, :] * _pos(j)).sum(axis=1),
                           1_000_000)
            # p·16^15 needs 80 bits: per-element Python-int thresholds
            thr = np.array([pp * HEX15 // 1_000_000 for pp in p.tolist()],
                           dtype=np.uint64)
            draws = np.array(
                [int(hashlib.md5(f"{seed}:d:{i}:{int(jj)}".encode())
                     .hexdigest()[:15], 16) for jj in j], dtype=np.uint64)
            keep = draws < thr
            outs_s.append(np.full(int(keep.sum()), i, np.int64))
            outs_d.append(j[keep])
        if not outs_s:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": pa.array(np.concatenate(outs_s)),
                         "dst": pa.array(np.concatenate(outs_d))})

    return (ray.data.range(n, override_num_blocks=num_partitions)
            .map_batches(_gen, batch_format="pyarrow", batch_size=None))


def hsbm_game(
    n: int,
    m: int,
    rho_sizes: Tuple[int, ...],
    c_e6,
    p_e6: int,
    seed: int = 42,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Hierarchical stochastic block model, undirected without loops
    (igraph_hsbm_game, /root/reference/src/sbm.c:243): n vertices in
    n/m blocks of m; inside a block, clusters of sizes ``rho_sizes``
    (the reference's rho·m, summing to m) connect at rate
    C[cl(i)][cl(j)]; vertices of different blocks connect at rate p.
    Same independent-md5-draw scheme as sbm_game — integer-exact
    thresholds, parallelism-invariant, SQL-replayable."""
    import hashlib

    assert n % m == 0 and sum(rho_sizes) == m
    c_e6 = [[int(x) for x in row] for row in c_e6]
    k = len(rho_sizes)
    assert len(c_e6) == k and all(
        c_e6[a][b] == c_e6[b][a] for a in range(k) for b in range(k))
    HEX15 = 16 ** 15
    cthr = np.array([[x * HEX15 // 1_000_000 for x in row]
                     for row in c_e6], dtype=np.uint64)
    pthr = np.uint64(int(p_e6) * HEX15 // 1_000_000)
    cum = np.cumsum(np.asarray(rho_sizes, np.int64))

    def _gen(b: pa.Table) -> pa.Table:
        outs_s, outs_d = [], []
        for i in b["id"].to_numpy(zero_copy_only=False):
            i = int(i)
            j = np.arange(i + 1, n, dtype=np.int64)
            if not len(j):
                continue
            same = (j // m) == (i // m)
            cli = int(np.searchsorted(cum, i % m, side="right"))
            clj = np.searchsorted(cum, j % m, side="right")
            thr = np.where(same, cthr[cli, clj], pthr)
            draws = np.array(
                [int(hashlib.md5(f"{seed}:hs:{i}:{int(jj)}".encode())
                     .hexdigest()[:15], 16) for jj in j], dtype=np.uint64)
            keep = draws < thr
            outs_s.append(np.full(int(keep.sum()), i, np.int64))
            outs_d.append(j[keep])
        if not outs_s:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": pa.array(np.concatenate(outs_s)),
                         "dst": pa.array(np.concatenate(outs_d))})

    return (ray.data.range(n, override_num_blocks=num_partitions)
            .map_batches(_gen, batch_format="pyarrow", batch_size=None))


def forest_fire_game(
    n: int,
    fw_prob: float,
    bw_factor: float = 1.0,
    ambs: int = 1,
    seed: int = 42,
    max_n: int = 1 << 20,
) -> ray.data.Dataset:
    """Forest fire growth model (igraph_forest_fire_game,
    /root/reference/src/forestfire.c:106; Leskovec, Kleinberg &
    Faloutsos, KDD 2005): each new vertex picks ``ambs`` ambassadors
    among the existing vertices and burns outward — from every burning
    vertex, geometric(1−fw_prob) out-neighbors and
    geometric(1−bw_factor·fw_prob) in-neighbors catch fire, sampled
    without replacement; the new vertex links to everything burned.

    The burn frontier reads the prefix graph, so the generator is
    inherently sequential — exactly like the reference's single RNG
    loop — and runs inside ONE Ray task (edge arrays never touch the
    driver), guarded by ``max_n``. The reference's RNG stream is
    replaced by indexed md5 draws (seed, vertex, draw#): a pure
    function of the arguments, identical on every run. Geometric
    draws use the inverse-CDF floor(ln u / ln(1−p)) on the 15-hex
    uniform."""
    import hashlib
    import math

    if n > max_n:
        raise NotImplementedError(
            f"forest fire is a sequential growth process; guarded to "
            f"{max_n} vertices ({n} requested)")
    HEX15 = 16 ** 15

    @ray.remote
    def _gen() -> pa.Table:
        p_out = min(max(fw_prob, 0.0), 0.999999)
        p_in = min(max(bw_factor * fw_prob, 0.0), 0.999999)
        outn: List[List[int]] = [[] for _ in range(n)]
        inn: List[List[int]] = [[] for _ in range(n)]
        src_l: List[int] = []
        dst_l: List[int] = []

        def geom(u: float, p: float) -> int:
            # number of failures before success with prob 1-p
            if p <= 0.0:
                return 0
            return int(math.floor(math.log(u) / math.log(p)))

        for v in range(1, n):
            ctr = 0

            def draw() -> float:
                nonlocal ctr
                h = int(hashlib.md5(f"{seed}:ff:{v}:{ctr}".encode())
                        .hexdigest()[:15], 16)
                ctr += 1
                return (h + 1) / (HEX15 + 1)

            visited = {v}
            queue: List[int] = []
            for _ in range(min(ambs, v)):
                a = int(draw() * v) % v
                if a not in visited:
                    visited.add(a)
                    queue.append(a)
                    src_l.append(v)
                    dst_l.append(a)
            qi = 0
            while qi < len(queue):
                amb = queue[qi]
                qi += 1
                for pool_src, p in ((outn[amb], p_out), (inn[amb], p_in)):
                    want = geom(draw(), p)
                    pool = [x for x in pool_src if x not in visited]
                    take = (pool if want >= len(pool) else
                            sorted(pool, key=lambda x, _d=draw:
                                   _d())[:want])
                    for nei in take:
                        visited.add(nei)
                        queue.append(nei)
                        src_l.append(v)
                        dst_l.append(nei)
            # register the new edges in the adjacency
            for i in range(len(src_l) - 1, -1, -1):
                if src_l[i] != v:
                    break
                outn[v].append(dst_l[i])
                inn[dst_l[i]].append(v)
        return pa.table({"src": pa.array(src_l, pa.int64()),
                         "dst": pa.array(dst_l, pa.int64())})

    return _from_refs([_gen.remote()])


def citing_cited_type_game(
    nodes: int,
    pref,
    k_types: int,
    edges_per_step: int = 1,
    seed: int = 17,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """igraph_citing_cited_type_game (games.c:3258; games.c:3167
    igraph_cited_type_game is the one-row special case): vertex i cites
    ``edges_per_step`` earlier vertices, each target drawn with
    probability ∝ pref[type(i)][type(target)] over vertices 0..i-1.

    md5-deterministic variant: types are ``v mod k_types`` and each
    (i, j) draw is one 48-bit md5 fold r' mapped to r = r'·S_i >> 48
    with S_i the prefix preference mass — because types cycle mod K,
    the cumulative mass C(x) = (x div K)·T + P[x mod K] is CLOSED FORM
    and its inverse (block div + a K-step prefix ladder) vectorizes per
    new vertex with no sequential cumsum state, so generation is
    embarrassingly parallel over i and SQL-replayable. ``pref`` is a
    k×k integer weight matrix (rows = citing type).
    """
    pref = [[int(x) for x in row] for row in pref]
    K = int(k_types)
    assert len(pref) == K and all(len(r) == K for r in pref)
    assert all(x >= 0 for row in pref for x in row)
    assert all(sum(row) > 0 for row in pref)
    HEX12 = 16 ** 12  # 48-bit draws
    # per citing-type prefix sums over cited types 0..K-1
    P = [np.concatenate([[0], np.cumsum(row)]).astype(np.int64)
         for row in pref]  # P[t][r] = Σ_{j<r} pref[t][j]
    T = [int(p[-1]) for p in P]

    def _gen(b: pa.Table) -> pa.Table:
        import hashlib
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids >= 1]
        outs_s, outs_d = [], []
        for i in ids:
            i = int(i)
            t = i % K
            Pt, Tt = P[t], T[t]
            # S_i = mass of vertices 0..i-1 for citing type t
            S = (i // K) * Tt + int(Pt[i % K])
            if S == 0:
                continue
            draws = np.array(
                [int(hashlib.md5(f"{seed}:c:{i}:{j}".encode())
                     .hexdigest()[:12], 16)
                 for j in range(edges_per_step)], dtype=np.int64)
            r = (draws * S) // HEX12
            blk = r // Tt
            rem = r - blk * Tt
            pos = np.searchsorted(Pt[1:], rem, side="right")
            to = blk * K + pos
            outs_s.append(np.full(edges_per_step, i, np.int64))
            outs_d.append(to.astype(np.int64))
        if not outs_s:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": pa.array(np.concatenate(outs_s)),
                         "dst": pa.array(np.concatenate(outs_d))})

    return (ray.data.range(nodes, override_num_blocks=num_partitions)
            .map_batches(_gen, batch_format="pyarrow", batch_size=None))


def cited_type_game(nodes: int, pref_row, k_types: int,
                    edges_per_step: int = 1, seed: int = 17,
                    num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_cited_type_game (games.c:3167): target drawn ∝
    pref[type(target)] regardless of the citing type — the
    constant-rows case of ``citing_cited_type_game``."""
    row = [int(x) for x in pref_row]
    assert len(row) == int(k_types)
    return citing_cited_type_game(
        nodes, [row] * int(k_types), k_types,
        edges_per_step=edges_per_step, seed=seed,
        num_partitions=num_partitions)


def full_bipartite(n1: int, n2: int) -> ray.data.Dataset:
    """igraph_full_bipartite (bipartite.c:388): every bottom vertex
    0..n1-1 connected to every top vertex n1..n1+n2-1 (directed=False
    reading: one edge per pair, bottom→top)."""
    def _gen(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = i[i < n1]
        src = np.repeat(i, n2)
        dst = np.tile(np.arange(n1, n1 + n2, dtype=np.int64), len(i))
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return ray.data.range(n1).map_batches(_gen, batch_format="pyarrow",
                                          batch_size=None)


def bipartite_gnp(n1: int, n2: int, p_e6: int,
                  seed: int = 23,
                  num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_bipartite_game_gnp (bipartite.c:867): one Bernoulli trial
    per (bottom, top) pair — md5-deterministic 15-hex draws with the
    exact integer threshold floor(p·16¹⁵/1e6), identical at any
    parallelism and SQL-replayable (the sbm_game scheme over the
    bipartite pair space). Bottom ids 0..n1-1, top n1..n1+n2-1."""
    import hashlib

    HEX15 = 16 ** 15
    thr = int(p_e6) * HEX15 // 1_000_000

    def _gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids < n1]
        outs_s, outs_d = [], []
        for i in ids:
            i = int(i)
            j = np.arange(n1, n1 + n2, dtype=np.int64)
            draws = np.array(
                [int(hashlib.md5(f"{seed}:bp:{i}:{int(jj)}".encode())
                     .hexdigest()[:15], 16) for jj in j], dtype=np.uint64)
            keep = draws < np.uint64(thr)
            outs_s.append(np.full(int(keep.sum()), i, np.int64))
            outs_d.append(j[keep])
        if not outs_s:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": pa.array(np.concatenate(outs_s)),
                         "dst": pa.array(np.concatenate(outs_d))})

    return (ray.data.range(n1, override_num_blocks=num_partitions)
            .map_batches(_gen, batch_format="pyarrow", batch_size=None))


def bipartite_gnm(n1: int, n2: int, m: int,
                  seed: int = 29,
                  num_partitions: int = 8) -> ray.data.Dataset:
    """igraph_bipartite_game_gnm (bipartite.c:958): exactly m distinct
    (bottom, top) edges, uniform over the pair space —
    md5-rank-selection deterministic variant: every pair gets one
    15-hex fold and the m smallest (fold, i, j) win. One distributed
    sort + limit; SQL-replayable (ORDER BY fold, i, j LIMIT m)."""
    import hashlib

    def _gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids < n1]
        outs = []
        for i in ids:
            i = int(i)
            j = np.arange(n1, n1 + n2, dtype=np.int64)
            draws = np.array(
                [int(hashlib.md5(f"{seed}:bm:{i}:{int(jj)}".encode())
                     .hexdigest()[:15], 16) for jj in j], dtype=np.int64)
            outs.append(pa.table({
                "fold": pa.array(draws),
                "src": pa.array(np.full(n2, i, np.int64)),
                "dst": pa.array(j)}))
        if not outs:
            return pa.table({"fold": pa.array([], pa.int64()),
                             "src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    ranked = (ray.data.range(n1, override_num_blocks=num_partitions)
              .map_batches(_gen, batch_format="pyarrow", batch_size=None)
              .sort(["fold", "src", "dst"]).limit(int(m)))
    return ranked.select_columns(["src", "dst"])


# ---------------------------------------------------------------------------
# Sequential-roulette growth games (the games.c psumtree family tail:
# recent_degree / lastcit / barabasi_aging). The reference grows these
# one vertex at a time from a psumtree whose weights depend on the whole
# history — an inherently sequential contract (games.c documents
# O(|V| log |V| + |E|) single-stream time). The engine keeps that
# contract but replaces the sequential RNG stream with indexed md5
# draws (seed, step, j) so the edge list is a pure function of the
# parameters: identical at any parallelism AND SQL-replayable (the
# DuckDB oracle carries the accumulated edge state through one
# materialized CTE per step and replays every roulette with exact
# integer comparisons). Weights are kept EXACT integers — the roulette
#   to = min{ v : draw32 * S <= 2^32 * cumsum_incl(v) }
# (the microscopic_update.c oracle convention) is then bit-identical in
# numpy and SQL. Parameters are restricted to the integer-exact
# settings (power == 1, integer appeals/preferences, aging_exp in
# {-1, 0}); general float exponents would need float roulettes that no
# SQL replay can match bit-for-bit, so they raise NotImplementedError
# honestly. Driver memory is O(n + E) like barabasi_game's documented
# ceiling; n is guarded accordingly.

_SEQ_GAME_MAX_N = 1 << 22


def _draw32(seed, tag: str, i: int, j: int) -> int:
    import hashlib as _hl

    return int(_hl.md5(f"{seed}:{tag}:{i}:{j}".encode())
               .hexdigest()[:8], 16)


def _roulette(weights: np.ndarray, draw: int) -> int:
    """min v with draw * S <= 2^32 * cum_incl(v); exact in object ints
    via int64 (weights are small ints, S < 2^31 guarded by callers)."""
    cum = np.cumsum(weights, dtype=np.int64)
    s = int(cum[-1])
    lhs = draw * s  # python int, exact
    # 2^32 * cum grows monotonically; searchsorted over int64 is exact
    # as long as 2^32 * S fits (guarded): use the scaled array
    rhs = cum * np.int64(4294967296)
    return int(np.searchsorted(rhs, lhs, side="left"))


def recent_degree_game(
    n: int, m: int = 1, window: int = 2, zero_appeal: int = 1,
    outpref: bool = False, seed: int = 17, power: float = 1,
) -> ray.data.Dataset:
    """igraph_recent_degree_game (games.c:1574): vertex i cites m
    targets drawn ∝ (#edges gained in the last `window` steps)^power
    + zero_appeal. The m draws of one step are independent (the
    reference updates its psumtree only after the draw loop). With
    outpref the citing vertex's own out-edges count toward its weight
    PERMANENTLY — the reference never pushes them onto the history
    queue, so they are never decremented out of the window.

    power == 1 with integer zero_appeal takes the integer-exact path
    (bit-identical SQL replay, the oracle-paired contract); any other
    power takes the float-roulette path — the SAME indexed md5 draw
    stream mapped to uniforms (draw32 / 2^32) against float cumulative
    weights, deterministic at any parallelism but rows-only at the
    driver gate (no SQL replay can match float pow bit-for-bit)."""
    if n > _SEQ_GAME_MAX_N:
        raise NotImplementedError(
            f"sequential growth contract guarded to n <= {_SEQ_GAME_MAX_N}")
    if power != 1:
        return _recent_degree_float(n, m, window, float(zero_appeal),
                                    outpref, seed, float(power))
    if zero_appeal < 1 or int(zero_appeal) != zero_appeal:
        raise NotImplementedError(
            "integer-exact replay needs integer zero_appeal >= 1")
    n, m, window, za = int(n), int(m), int(window), int(zero_appeal)
    # recent in-window citation counts; ledger[s] = targets cited at s
    recent = np.zeros(n, dtype=np.int64)
    ledger: dict = {}
    src_out, dst_out = [], []
    for i in range(1, n):
        drop = i - window  # counts from steps <= i-window leave the window
        if drop >= 1 and drop in ledger:
            for v in ledger.pop(drop):
                recent[v] -= 1
        w = recent[:i] + za
        picks = [
            _roulette(w, _draw32(seed, "rd", i, j)) for j in range(m)
        ]
        for to in picks:
            src_out.append(i)
            dst_out.append(to)
        ledger[i] = list(picks)
        for v in picks:
            recent[v] += 1
        if outpref:
            # own out-edges: counted but never queued for expiry
            recent[i] += m
    t = pa.table({"src": pa.array(src_out, pa.int64()),
                  "dst": pa.array(dst_out, pa.int64())})
    return ray.data.from_arrow(t)


def _roulette_float(weights: np.ndarray, draw: int) -> int:
    """Float psumtree search: min v with cum_incl(v) >= u * S where
    u = draw / 2^32 — the continuous analogue of _roulette (on exact-
    integer weights with power == 1 the two agree except on measure-
    zero float boundaries)."""
    cum = np.cumsum(weights, dtype=np.float64)
    r = (draw / 4294967296.0) * cum[-1]
    return int(min(np.searchsorted(cum, r, side="left"), len(cum) - 1))


def _recent_degree_float(n: int, m: int, window: int, za: float,
                         outpref: bool, seed, power: float
                         ) -> ray.data.Dataset:
    """games.c:1574 general-power path: weight = recent^power + za as
    float64, same history-queue expiry and post-draw update order as
    the integer-exact path."""
    n, m, window = int(n), int(m), int(window)
    recent = np.zeros(n, dtype=np.int64)
    ledger: dict = {}
    src_out, dst_out = [], []
    for i in range(1, n):
        drop = i - window
        if drop >= 1 and drop in ledger:
            for v in ledger.pop(drop):
                recent[v] -= 1
        w = np.power(recent[:i].astype(np.float64), power) + za
        picks = [
            _roulette_float(w, _draw32(seed, "rd", i, j))
            for j in range(m)
        ]
        for to in picks:
            src_out.append(i)
            dst_out.append(to)
        ledger[i] = list(picks)
        for v in picks:
            recent[v] += 1
        if outpref:
            recent[i] += m
    t = pa.table({"src": pa.array(src_out, pa.int64()),
                  "dst": pa.array(dst_out, pa.int64())})
    return ray.data.from_arrow(t)


def lastcit_game(
    n: int, edges_per_node: int = 1, agebins: int = 2,
    preference=None, seed: int = 19,
) -> ray.data.Dataset:
    """igraph_lastcit_game (games.c:3033): vertex i cites targets drawn
    ∝ preference[(i-1-c) // binwidth] where c is the target's last-cited
    step (preference[agebins] for the never-cited), binwidth =
    n//agebins + 1. Unlike the other growth games the reference updates
    the psumtree INSIDE the per-step draw loop (a fresh citation moves
    the target to preference[0] for the very next draw of the same
    step) — replayed faithfully."""
    if preference is None:
        preference = [2] * agebins + [1]
    if len(preference) != agebins + 1:
        raise ValueError("preference must have agebins+1 entries")
    if n > _SEQ_GAME_MAX_N:
        raise NotImplementedError(
            f"sequential growth contract guarded to n <= {_SEQ_GAME_MAX_N}")
    if any(float(x) != int(x) for x in preference):
        # float preferences: same replay with float64 weights and the
        # md5 uniform roulette — deterministic, rows-only at the gate
        return _lastcit_float(n, edges_per_node, agebins,
                              [float(x) for x in preference], seed)
    pref = [int(x) for x in preference]
    if any(x < 0 for x in pref) or pref[agebins] <= 0:
        raise NotImplementedError(
            "integer-exact replay needs non-negative integer preferences "
            "with a positive never-cited tail")
    n, eps = int(n), int(edges_per_node)
    binwidth = n // int(agebins) + 1
    lastcit = np.full(n, -1, dtype=np.int64)  # -1 = never cited
    src_out, dst_out = [], []
    prefarr = np.array(pref, dtype=np.int64)
    for i in range(1, n):
        c = lastcit[:i]
        k = (i - 1 - c) // binwidth
        w = np.where(c < 0, prefarr[agebins], prefarr[np.minimum(k, agebins)])
        for j in range(eps):
            to = _roulette(w, _draw32(seed, "lc", i, j))
            src_out.append(i)
            dst_out.append(to)
            lastcit[to] = i
            w = w.copy()
            w[to] = prefarr[0]  # in-step tree update (games.c:3097)
    t = pa.table({"src": pa.array(src_out, pa.int64()),
                  "dst": pa.array(dst_out, pa.int64())})
    return ray.data.from_arrow(t)


def _barabasi_aging_float(n: int, m: int, aging_bin: int, zda: float,
                          zaa: float, dc: float, ac: float,
                          pa_exp: float, aging_exp: float,
                          outpref: bool, seed) -> ray.data.Dataset:
    """games.c:1732 general-exponent path: the same event-ordered
    psumtree replay as the integer-exact path (citation (age+1)^γ,
    aging boundary (k+2)^γ — the reference's own off-by-one — then
    insertion (1+zaa)·zda), with float64 weights and the md5 uniform
    roulette. Deterministic; rows-only at the driver gate."""
    n, m, ab = int(n), int(m), int(aging_bin)
    binwidth = n // ab + 1
    w = np.zeros(n, dtype=np.float64)
    deg = np.zeros(n, dtype=np.int64)
    w[0] = zda * (1.0 + zaa)
    src_out, dst_out = [], []
    for i in range(1, n):
        ws = w[:i]
        picks = [
            _roulette_float(ws, _draw32(seed, "ba", i, j))
            for j in range(m)
        ]
        for to in picks:
            deg[to] += 1
            src_out.append(i)
            dst_out.append(to)
        for to in picks:
            age = (i - to) // binwidth
            w[to] = (dc * deg[to] ** pa_exp + zda) * \
                (ac * float(age + 1) ** aging_exp + zaa)
        if outpref:
            deg[i] += m
            w[i] = (zaa + 1.0) * (dc * deg[i] ** pa_exp + zda)
        else:
            w[i] = zda * (1.0 + zaa)
        k = 1
        while i - binwidth * k >= 0:
            sh = i - binwidth * k
            w[sh] = (dc * deg[sh] ** pa_exp + zda) * \
                (ac * float(k + 2) ** aging_exp + zaa)
            k += 1
    t = pa.table({"src": pa.array(src_out, pa.int64()),
                  "dst": pa.array(dst_out, pa.int64())})
    return ray.data.from_arrow(t)


def _lastcit_float(n: int, edges_per_node: int, agebins: int,
                   pref, seed) -> ray.data.Dataset:
    """games.c:3033 float-preference path: identical in-step tree
    updates to the integer path, float64 weights + md5 uniforms."""
    n, eps = int(n), int(edges_per_node)
    binwidth = n // int(agebins) + 1
    lastcit = np.full(n, -1, dtype=np.int64)
    src_out, dst_out = [], []
    prefarr = np.array(pref, dtype=np.float64)
    for i in range(1, n):
        c = lastcit[:i]
        k = (i - 1 - c) // binwidth
        w = np.where(c < 0, prefarr[agebins],
                     prefarr[np.minimum(k, agebins)])
        for j in range(eps):
            to = _roulette_float(w, _draw32(seed, "lc", i, j))
            src_out.append(i)
            dst_out.append(to)
            lastcit[to] = i
            w = w.copy()
            w[to] = prefarr[0]  # in-step tree update (games.c:3097)
    t = pa.table({"src": pa.array(src_out, pa.int64()),
                  "dst": pa.array(dst_out, pa.int64())})
    return ray.data.from_arrow(t)


def barabasi_aging_game(
    n: int, m: int = 1, aging_bin: int = 1,
    zero_deg_appeal: int = 1, zero_age_appeal: int = 0,
    deg_coef: int = 1, age_coef: int = 1, aging_exp: int = -1,
    outpref: bool = False, seed: int = 23, pa_exp: float = 1,
) -> ray.data.Dataset:
    """igraph_barabasi_aging_game (games.c:1732) with pa_exp == 1 and
    aging_exp in {-1, 0}: attachment weight = (deg_coef·deg +
    zero_deg_appeal) · (age_coef·(a+1)^aging_exp + zero_age_appeal),
    replaying the reference's EVENT order exactly — a vertex's tree
    weight is set by whichever fired last: its citation update (age
    factor (cite_age+1)^γ), its aging-boundary update at step
    v + binwidth·k (age factor (k+2)^γ — the reference's own off-by-one,
    kept), or its insertion ((1+zero_age_appeal)·zero_deg_appeal). All
    weights are scaled by LCM(1..max_den) so the roulette is exact
    integer arithmetic; the m draws of one step share the pre-step
    weights (psumtree updated after the draw loop).

    General float ``pa_exp`` / ``aging_exp`` / appeals / coefficients
    take the float-roulette path (_barabasi_aging_float): the same md5
    draw stream and event order with float64 weights — deterministic
    but rows-only at the driver gate (no bit-exact SQL replay)."""
    from math import gcd

    if n > _SEQ_GAME_MAX_N:
        raise NotImplementedError(
            f"sequential growth contract guarded to n <= {_SEQ_GAME_MAX_N}")
    integer_exact = (
        pa_exp == 1 and aging_exp in (-1, 0)
        and all(int(v) == v and v >= 0 for v in (
            zero_deg_appeal, zero_age_appeal, deg_coef, age_coef)))
    if not integer_exact:
        return _barabasi_aging_float(
            n, m, aging_bin, float(zero_deg_appeal),
            float(zero_age_appeal), float(deg_coef), float(age_coef),
            float(pa_exp), float(aging_exp), outpref, seed)
    n, m, ab = int(n), int(m), int(aging_bin)
    zda, zaa = int(zero_deg_appeal), int(zero_age_appeal)
    dc, ac = int(deg_coef), int(age_coef)
    binwidth = n // ab + 1
    max_den = (n - 1) // binwidth + 2 if aging_exp == -1 else 1
    L = 1
    for d in range(1, max_den + 1):
        L = L * d // gcd(L, d)

    def agef(a: int) -> int:
        """L · (age_coef·(a+1)^γ + zaa) as an exact integer."""
        if aging_exp == 0:
            return L * (ac + zaa)
        return ac * (L // (a + 1)) + L * zaa

    w = np.zeros(n, dtype=np.int64)
    deg = np.zeros(n, dtype=np.int64)
    w[0] = zda * (L + L * zaa)  # first node: zda·(1+zaa), scaled
    src_out, dst_out = [], []
    for i in range(1, n):
        ws = w[:i]
        picks = [
            _roulette(ws, _draw32(seed, "ba", i, j)) for j in range(m)
        ]
        for to in picks:
            deg[to] += 1
            src_out.append(i)
            dst_out.append(to)
        # post-draw updates, reference order: targets, the new vertex,
        # then the aging boundaries (games.c:1804-1830)
        for to in picks:
            age = (i - to) // binwidth
            w[to] = (dc * deg[to] + zda) * agef(age)
        if outpref:
            deg[i] += m
            w[i] = (dc * deg[i] + zda) * (L + L * zaa)  # (zaa+1)·(deg+zda)
        else:
            w[i] = zda * (L + L * zaa)
        k = 1
        while i - binwidth * k >= 0:
            sh = i - binwidth * k
            w[sh] = (dc * deg[sh] + zda) * agef(k + 1)  # (age+2) factor
            k += 1
    t = pa.table({"src": pa.array(src_out, pa.int64()),
                  "dst": pa.array(dst_out, pa.int64())})
    return ray.data.from_arrow(t)


def recent_degree_aging_game(
    n: int, m: int = 1, aging_bin: int = 1, time_window: int = 2,
    zero_appeal: int = 1, outpref: bool = False, aging_exp: int = -1,
    seed: int = 29,
) -> ray.data.Dataset:
    """igraph_recent_degree_aging_game (games.c:1888) with pa_exp == 1
    and aging_exp in {-1, 0}: the composition of recent_degree_game
    (windowed citation counts via the history queue) and
    barabasi_aging_game (event-ordered psumtree updates). Attachment
    weight = (recent_deg + zero_appeal) · (age+1)^aging_exp, where a
    vertex's stored weight is whatever its LAST update event set:
    window expiry at step s+time_window (factor (age+1)^γ, fired at
    the START of a step before its draws), citation at step c (factor
    (age+1)^γ), aging boundary at step v + binwidth·k (factor
    (age+2)^γ — the reference's own off-by-one, kept, games.c:1998),
    or insertion (factor 1). LCM-scaled exact-integer roulettes; the
    m draws of one step share the pre-step weights (games.c:1970
    updates after the draw loop)."""
    from math import gcd

    if aging_exp not in (-1, 0):
        raise NotImplementedError(
            "integer-exact replay covers aging_exp in {-1, 0}")
    if zero_appeal < 1 or int(zero_appeal) != zero_appeal:
        raise NotImplementedError(
            "integer-exact replay needs integer zero_appeal >= 1")
    if n > _SEQ_GAME_MAX_N:
        raise NotImplementedError(
            f"sequential growth contract guarded to n <= {_SEQ_GAME_MAX_N}")
    n, m, ab, W = int(n), int(m), int(aging_bin), int(time_window)
    za = int(zero_appeal)
    binwidth = n // ab + 1
    max_den = (n - 1) // binwidth + 2 if aging_exp == -1 else 1
    L = 1
    for d in range(1, max_den + 1):
        L = L * d // gcd(L, d)

    def agef(a: int) -> int:
        """L · (a+1)^γ as an exact integer."""
        return L // (a + 1) if aging_exp == -1 else L

    w = np.zeros(n, dtype=np.int64)
    deg = np.zeros(n, dtype=np.int64)   # WINDOWED degree
    w[0] = za * L
    ledger: dict = {}
    src_out, dst_out = [], []
    for i in range(1, n):
        # window expiry first (games.c:1957: pops BEFORE the draws)
        drop = i - W
        if drop >= 1 and drop in ledger:
            for v in ledger.pop(drop):
                deg[v] -= 1
                w[v] = (deg[v] + za) * agef((i - v) // binwidth)
        ws = w[:i]
        picks = [
            _roulette(ws, _draw32(seed, "rda", i, j)) for j in range(m)
        ]
        for to in picks:
            deg[to] += 1
            src_out.append(i)
            dst_out.append(to)
        ledger[i] = list(picks)
        # post-draw updates, reference order (games.c:1976-1989)
        for to in picks:
            w[to] = (deg[to] + za) * agef((i - to) // binwidth)
        if outpref:
            deg[i] += m
            w[i] = (deg[i] + za) * L   # age 0 => factor 1
        else:
            w[i] = za * L
        k = 1
        while i - binwidth * k >= 0:
            sh = i - binwidth * k
            w[sh] = (deg[sh] + za) * agef(k + 1)  # (age+2) factor
            k += 1
    t = pa.table({"src": pa.array(src_out, pa.int64()),
                  "dst": pa.array(dst_out, pa.int64())})
    return ray.data.from_arrow(t)


def growing_random_game(
    n: int,
    m: int = 1,
    citation: bool = False,
    seed: int = 23,
) -> ray.data.Dataset:
    """Growing random graph (igraph_growing_random_game,
    /root/reference/src/games.c:1318): at step i = 1..n-1, add m
    edges — citation mode draws (i, U(0, i-1)); otherwise
    (U(0, i), 1 + U(0, i-1)). The sequential RNG is replaced by the
    engine's indexed md5 draws (one per (i, j, endpoint)), so every
    step is independent, embarrassingly parallel, and SQL-replayable
    (the callaway/establishment contract)."""
    import hashlib

    def _gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        ids = ids[ids >= 1]
        src, dst = [], []
        for i in ids:
            i = int(i)
            for j in range(m):
                if citation:
                    to = int(hashlib.md5(f"{seed}:t:{i}:{j}".encode())
                             .hexdigest()[:15], 16) % i
                    src.append(i)
                    dst.append(to)
                else:
                    fr = int(hashlib.md5(f"{seed}:f:{i}:{j}".encode())
                             .hexdigest()[:15], 16) % (i + 1)
                    to = 1 + int(hashlib.md5(f"{seed}:t:{i}:{j}".encode())
                                 .hexdigest()[:15], 16) % i
                    src.append(fr)
                    dst.append(to)
        return pa.table({"src": pa.array(np.array(src, np.int64)),
                         "dst": pa.array(np.array(dst, np.int64))})

    return ray.data.range(n).map_batches(_gen, batch_format="pyarrow",
                                         batch_size=None)


def islands_game(
    islands_n: int,
    islands_size: int,
    pin_e6: int,
    n_inter: int,
    seed: int = 29,
) -> ray.data.Dataset:
    """Interconnected islands (igraph_simple_interconnected_islands_game,
    /root/reference/src/games.c:3345): islands_n G(size, pin) islands
    plus n_inter random vertex pairs between every island pair. Intra
    edges are independent md5 Bernoulli per pair (the engine's sbm
    deviation from the reference's sequential geometric jumps); inter
    endpoints are indexed md5 draws per (a, b, k). Pure function of
    the parameters, identical at any parallelism."""
    import hashlib

    HEX15 = 16 ** 15
    thr = pin_e6 * HEX15 // 1_000_000
    n = islands_n * islands_size

    def _gen(b: pa.Table) -> pa.Table:
        src, dst = [], []
        for i in b["id"].to_numpy(zero_copy_only=False):
            i = int(i)
            isl = i // islands_size
            hi = (isl + 1) * islands_size
            for j in range(i + 1, hi):
                d = int(hashlib.md5(f"{seed}:p:{i}:{j}".encode())
                        .hexdigest()[:15], 16)
                if d < thr:
                    src.append(i)
                    dst.append(j)
            # vertex i == first of island a owns the inter edges (a, b)
            if i % islands_size == 0:
                for bisl in range(isl + 1, islands_n):
                    for k in range(n_inter):
                        u = isl * islands_size + int(
                            hashlib.md5(f"{seed}:u:{isl}:{bisl}:{k}"
                                        .encode()).hexdigest()[:15],
                            16) % islands_size
                        v = bisl * islands_size + int(
                            hashlib.md5(f"{seed}:v:{isl}:{bisl}:{k}"
                                        .encode()).hexdigest()[:15],
                            16) % islands_size
                        src.append(u)
                        dst.append(v)
        return pa.table({"src": pa.array(np.array(src, np.int64)),
                         "dst": pa.array(np.array(dst, np.int64))})

    return ray.data.range(n).map_batches(_gen, batch_format="pyarrow",
                                         batch_size=None)


GRG_BITS = 20  # coordinate grid: 2^20 cells per axis, integer geometry


def grg_game(
    n: int,
    radius_e6: int,
    seed: int = 31,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Geometric random graph (igraph_grg_game,
    /root/reference/src/games.c — unit square, connect iff
    dist < radius). Coordinates are md5-indexed integers on a 2^20
    grid (x_i = md5(seed:x:i) % 2^20), so the whole construction is
    integer geometry: edge iff dx² + dy² < R², R = radius·2^20/1e6
    floor — exact, parallelism-independent, SQL-replayable.

    Distributed shape — the grid-cell spatial join: each point lands
    in cell (x//R, y//R) and PROBES its 3×3 cell neighborhood; one
    equi-join of probes against cell owners + the integer distance
    filter finds every pair exactly once (pairs are kept as
    probe.id < owner.id, and an owner's cell is unique). Candidate
    work is bounded by cell occupancy — no all-pairs pass anywhere."""
    import hashlib

    from igraph_ray.util import hash_join

    scale = 1 << GRG_BITS
    R = radius_e6 * scale // 1_000_000
    if R <= 0:
        raise ValueError("radius too small for the coordinate grid")

    def _coords(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        x = np.fromiter(
            (int(hashlib.md5(f"{seed}:x:{int(i)}".encode())
                 .hexdigest()[:15], 16) % scale for i in ids),
            dtype=np.int64, count=len(ids))
        y = np.fromiter(
            (int(hashlib.md5(f"{seed}:y:{int(i)}".encode())
                 .hexdigest()[:15], 16) % scale for i in ids),
            dtype=np.int64, count=len(ids))
        return pa.table({"vid": pa.array(ids.astype(np.int64)),
                         "x": pa.array(x), "y": pa.array(y)})

    pts = ray.data.range(n).map_batches(_coords, batch_format="pyarrow",
                                        batch_size=None).materialize()

    def _owners(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vid" not in b.column_names:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "vid": b["vid"] if "vid" in b.column_names
                             else pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        cell = (x // R) * (scale // R + 2) + (y // R)
        return pa.table({"cell": pa.array(cell), "vid": b["vid"],
                         "x": b["x"], "y": b["y"]})

    def _probes(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vid" not in b.column_names:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "pvid": pa.array([], pa.int64()),
                             "px": pa.array([], pa.int64()),
                             "py": pa.array([], pa.int64())})
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        cx, cy = x // R, y // R
        rows = np.repeat(np.arange(b.num_rows), 9)
        dx = np.tile(np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1],
                              np.int64), b.num_rows)
        dy = np.tile(np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1],
                              np.int64), b.num_rows)
        ncx, ncy = cx[rows] + dx, cy[rows] + dy
        ok = (ncx >= 0) & (ncy >= 0)
        rows, ncx, ncy = rows[ok], ncx[ok], ncy[ok]
        ri = pa.array(rows, pa.int64())
        return pa.table({
            "cell": pa.array(ncx * (scale // R + 2) + ncy),
            "pvid": pc.take(b["vid"], ri),
            "px": pc.take(b["x"], ri), "py": pc.take(b["y"], ri)})

    owners = pts.map_batches(_owners, batch_format="pyarrow",
                             batch_size=None)
    probes = pts.map_batches(_probes, batch_format="pyarrow",
                             batch_size=None)
    j = hash_join(probes, owners, on="cell",
                  num_partitions=num_partitions)

    def _pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "pvid" not in b.column_names:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        pv = b["pvid"].to_numpy(zero_copy_only=False)
        ov = b["vid"].to_numpy(zero_copy_only=False)
        dx = (b["px"].to_numpy(zero_copy_only=False)
              - b["x"].to_numpy(zero_copy_only=False))
        dy = (b["py"].to_numpy(zero_copy_only=False)
              - b["y"].to_numpy(zero_copy_only=False))
        keep = (pv < ov) & (dx * dx + dy * dy < R * R)
        return pa.table({"src": pa.array(pv[keep]),
                         "dst": pa.array(ov[keep])})

    return j.map_batches(_pairs, batch_format="pyarrow", batch_size=None)


def correlated_game(
    n: int,
    p_e6: int,
    corr_e6: int,
    seed: int = 37,
) -> ray.data.Dataset:
    """Correlated G(n,p) pair (igraph_correlated_game,
    /root/reference/src/games.c:3905): given base graph G ~ G(n,p),
    the new graph keeps each existing edge with probability
    q = p + corr·(1−p) and adds each missing pair with probability
    (1−q)·p/(1−p), so the result is again G(n,p) marginally with edge
    correlation ``corr``. Both the base membership and the second
    draw are independent md5 Bernoulli per pair (the engine's sbm
    deviation) — the pair of graphs is a pure function of
    (n, p, corr, seed). Returns the NEW graph's (src < dst) edges;
    the base graph is pair-recomputable with the ``:b:`` tag.

    Thresholds are integer-exact in the 16^15 draw space; q and p_add
    are computed in exact rational arithmetic over e6 integers:
    q_e6 = p_e6 + corr_e6·(1e6−p_e6)/1e6 (floor), p_add drawn as
    (1e6−q_e6)·p_e6 // (1e6−p_e6)."""
    import hashlib

    HEX15 = 16 ** 15
    M = 1_000_000
    q_e6 = p_e6 + corr_e6 * (M - p_e6) // M
    add_e6 = (M - q_e6) * p_e6 // (M - p_e6)
    thr_p = p_e6 * HEX15 // M
    thr_q = q_e6 * HEX15 // M
    thr_add = add_e6 * HEX15 // M

    def _gen(b: pa.Table) -> pa.Table:
        src, dst = [], []
        for i in b["id"].to_numpy(zero_copy_only=False):
            i = int(i)
            for j in range(i + 1, n):
                base = int(hashlib.md5(f"{seed}:b:{i}:{j}".encode())
                           .hexdigest()[:15], 16) < thr_p
                d = int(hashlib.md5(f"{seed}:c:{i}:{j}".encode())
                        .hexdigest()[:15], 16)
                if (base and d < thr_q) or (not base and d < thr_add):
                    src.append(i)
                    dst.append(j)
        return pa.table({"src": pa.array(np.array(src, np.int64)),
                         "dst": pa.array(np.array(dst, np.int64))})

    return ray.data.range(n).map_batches(_gen, batch_format="pyarrow",
                                         batch_size=None)


def k_regular_game(n: int, k: int, seed: int = 41) -> ray.data.Dataset:
    """igraph_k_regular_game (games.c:3828): every vertex gets degree k
    (the reference delegates to igraph_degree_sequence_game on the
    constant-k sequence). Engine contract: the n*k stubs (v, s) are
    ranked ascending by the md5 digest of (seed:kr:v:s) — ties by
    (v, s), unreachable in practice — and consecutive rank pairs
    (2r, 2r+1) become edges, the even-rank owner as src. A distributed
    rank replaces the reference's sequential Fisher–Yates pairing;
    loops/multi-edges remain possible exactly as in the reference's
    non-simple methods. n*k must be even."""
    import hashlib

    if (n * k) % 2 != 0:
        raise ValueError("n*k must be even for a k-regular pairing")
    from igraph_ray.util import dense_rank_map

    def _stubs(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        v = ids // k
        s = ids % k
        key = [hashlib.md5(f"{seed}:kr:{int(a)}:{int(c)}".encode())
               .hexdigest() + f":{int(a):012d}:{int(c):06d}"
               for a, c in zip(v, s)]
        return pa.table({"key": pa.array(key, pa.string()),
                         "v": pa.array(v, pa.int64())})

    stubs = ray.data.range(n * k).map_batches(
        _stubs, batch_format="pyarrow", batch_size=None)
    ranked = dense_rank_map(stubs.select_columns(["key"]), "key")
    from igraph_ray.util import hash_join

    j = hash_join(stubs, ranked, on="key")

    def _split(b: pa.Table) -> pa.Table:
        rk = b["rank"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        pos = rk % 2
        return pa.table({"pair": pa.array(rk // 2, pa.int64()),
                         "v0": pa.array(v * (1 - pos), pa.int64()),
                         "v1": pa.array(v * pos, pa.int64())})

    g = j.map_batches(_split, batch_format="pyarrow", batch_size=None) \
        .groupby("pair").sum(["v0", "v1"])
    return g.map_batches(
        lambda b: pa.table({"src": b["sum(v0)"], "dst": b["sum(v1)"]}),
        batch_format="pyarrow", batch_size=None)


def static_fitness_game(
    m: int, fitness_out: List[int], fitness_in: Optional[List[int]] = None,
    seed: int = 43,
) -> ray.data.Dataset:
    """igraph_static_fitness_game (games.c:3468, Goh–Kahng–Kim): m
    edges, src drawn ∝ fitness_out and dst ∝ fitness_in (out vector
    reused when fitness_in is None — the undirected form). Engine
    contract: integer fitnesses, the 2m draws are indexed md5
    roulettes (seed:sfs/sft:e) — independent, embarrassingly
    parallel, SQL-replayable; loops/multiple edges stay (documented
    deviation from the reference's rejection loop, the
    static_power_law contract)."""
    fo = np.asarray(fitness_out, dtype=np.int64)
    fi = np.asarray(fitness_in if fitness_in is not None else fitness_out,
                    dtype=np.int64)
    if fo.min() < 0 or fi.min() < 0:
        raise ValueError("fitness scores must be non-negative")
    cum_o = np.cumsum(fo, dtype=np.int64) * np.int64(4294967296)
    cum_i = np.cumsum(fi, dtype=np.int64) * np.int64(4294967296)
    s_o = int(np.sum(fo))
    s_i = int(np.sum(fi))
    if s_o <= 0 or s_i <= 0:
        raise ValueError("total fitness must be positive")

    def _gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        ds = np.array([_draw32(seed, "sfs", int(e), 0) for e in ids],
                      dtype=np.int64)
        dt = np.array([_draw32(seed, "sft", int(e), 0) for e in ids],
                      dtype=np.int64)
        src = np.searchsorted(cum_o, ds * s_o, side="left")
        dst = np.searchsorted(cum_i, dt * s_i, side="left")
        return pa.table({"src": pa.array(src.astype(np.int64)),
                         "dst": pa.array(dst.astype(np.int64))})

    return ray.data.range(m).map_batches(_gen, batch_format="pyarrow",
                                         batch_size=None)


def asymmetric_preference_game(
    n: int,
    type_dist_matrix: List[List[float]],
    pref_matrix_e6: List[List[int]],
    seed: int = 47,
) -> Tuple[ray.data.Dataset, ray.data.Dataset]:
    """igraph_asymmetric_preference_game (games.c:2428): every vertex
    gets a JOINT (in-type, out-type) pair from type_dist_matrix (row =
    in-type, column = out-type, the reference's k = i*types+j
    unpacking), then each ordered pair (u, v), u != v, gains an edge
    with probability pref_matrix[out(u)][in(v)]. Engine contract:
    joint types are assigned in contiguous vertex blocks of the exact
    floor proportions (row-major joint order, remainders to the lowest
    joint ids — the preference_game fixed-sizes deviation) and every
    pair is an independent md5 Bernoulli with integer-e6 thresholds,
    so the draw set is identical at any parallelism and SQL-replayable.

    Returns (edges, types) where types = (vertex, in_type, out_type)."""
    import hashlib

    td = np.asarray(type_dist_matrix, dtype=np.float64)
    kt = td.shape[0]
    td = td / td.sum()
    sizes = np.floor(td.reshape(-1) * n).astype(np.int64)
    rem = n - int(sizes.sum())
    sizes[:rem] += 1
    blo = np.zeros(kt * kt + 1, np.int64)
    np.cumsum(sizes, out=blo[1:])
    HEX15 = 16 ** 15
    # [out][in] integer thresholds — python ints (16^15 scaling
    # overflows int64, so this table must never become a numpy array)
    thr = [[int(p) * HEX15 // 1_000_000 for p in row]
           for row in pref_matrix_e6]

    def _joint(v: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        jid = np.searchsorted(blo[1:], v, side="right")
        return jid // kt, jid % kt  # (in_type, out_type)

    def _types(b: pa.Table) -> pa.Table:
        v = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        it, ot = _joint(v)
        return pa.table({"vertex": pa.array(v),
                         "in_type": pa.array(it.astype(np.int64)),
                         "out_type": pa.array(ot.astype(np.int64))})

    types = ray.data.range(n).map_batches(_types, batch_format="pyarrow",
                                          batch_size=None)

    all_in, all_out = _joint(np.arange(n, dtype=np.int64))

    def _gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        src, dst = [], []
        for u in ids:
            u = int(u)
            t_row = thr[int(all_out[u])]
            for v in range(n):
                if v == u:
                    continue
                d = int(hashlib.md5(f"{seed}:ap:{u}:{v}".encode())
                        .hexdigest()[:15], 16)
                if d < t_row[int(all_in[v])]:
                    src.append(u)
                    dst.append(v)
        return pa.table({"src": pa.array(np.array(src, np.int64)),
                         "dst": pa.array(np.array(dst, np.int64))})

    edges = ray.data.range(n).map_batches(_gen, batch_format="pyarrow",
                                          batch_size=None)
    return edges, types


def nonlinear_barabasi_game(
    n: int, m: int = 1, power: int = 2, zero_appeal: int = 1,
    seed: int = 53,
) -> ray.data.Dataset:
    """igraph_barabasi_game with power != 1 — the psumtree path
    (games.c:297,558): vertex i cites m targets drawn with probability
    ∝ indeg^power + zero_appeal. Integer power keeps the roulette
    integer-exact on both sides. The m draws of one step share the
    pre-step weight table (the engine's sequential-growth contract,
    cf. recent_degree_game; the reference's psumtree updates inside
    the step — documented deviation)."""
    if power < 1 or int(power) != power:
        raise NotImplementedError("integer-exact replay needs integer power >= 1")
    if zero_appeal < 1 or int(zero_appeal) != zero_appeal:
        raise NotImplementedError(
            "integer-exact replay needs integer zero_appeal >= 1")
    if n > _SEQ_GAME_MAX_N:
        raise NotImplementedError(
            f"sequential growth contract guarded to n <= {_SEQ_GAME_MAX_N}")
    n, m, power, za = int(n), int(m), int(power), int(zero_appeal)
    indeg = np.zeros(n, dtype=np.int64)
    src_out, dst_out = [], []
    for i in range(1, n):
        w = indeg[:i] ** power + za
        picks = [
            _roulette(w, _draw32(seed, "nb", i, j)) for j in range(m)
        ]
        for to in picks:
            src_out.append(i)
            dst_out.append(to)
            indeg[to] += 1
    t = pa.table({"src": pa.array(src_out, pa.int64()),
                  "dst": pa.array(dst_out, pa.int64())})
    return ray.data.from_arrow(t)


def hsbm_list_game(
    n: int,
    mlist: Tuple[int, ...],
    rho_sizes_list,
    c_e6_list,
    p_e6: int,
    seed: int = 42,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """General hierarchical SBM with per-block sizes
    (igraph_hsbm_list_game, /root/reference/src/sbm.c:417): block b has
    ``mlist[b]`` vertices split into clusters of ``rho_sizes_list[b]``
    (summing to mlist[b]) connecting at C_b[cl(i)][cl(j)]; vertices of
    different blocks connect at rate p. Same independent-md5-draw
    scheme as hsbm_game (tag "hsl") — integer-exact thresholds,
    parallelism-invariant, SQL-replayable."""
    import hashlib

    assert sum(mlist) == n
    nb = len(mlist)
    assert len(rho_sizes_list) == nb and len(c_e6_list) == nb
    HEX15 = 16 ** 15
    offs = np.zeros(nb + 1, np.int64)
    np.cumsum(np.asarray(mlist, np.int64), out=offs[1:])
    cums = []   # per-block cluster cumsums
    cthrs = []  # per-block threshold matrices
    for b in range(nb):
        assert sum(rho_sizes_list[b]) == mlist[b]
        k = len(rho_sizes_list[b])
        c = [[int(x) for x in row] for row in c_e6_list[b]]
        assert len(c) == k and all(
            c[a][d] == c[d][a] for a in range(k) for d in range(k))
        cums.append(np.cumsum(np.asarray(rho_sizes_list[b], np.int64)))
        cthrs.append(np.array(
            [[x * HEX15 // 1_000_000 for x in row] for row in c],
            dtype=np.uint64))
    pthr = np.uint64(int(p_e6) * HEX15 // 1_000_000)

    def _gen(b: pa.Table) -> pa.Table:
        outs_s, outs_d = [], []
        for i in b["id"].to_numpy(zero_copy_only=False):
            i = int(i)
            j = np.arange(i + 1, n, dtype=np.int64)
            if not len(j):
                continue
            bi = int(np.searchsorted(offs, i, side="right")) - 1
            bj = np.searchsorted(offs, j, side="right") - 1
            same = bj == bi
            cli = int(np.searchsorted(cums[bi], i - offs[bi],
                                      side="right"))
            clj = np.searchsorted(cums[bi], j - offs[bi], side="right")
            thr = np.where(same, cthrs[bi][cli, np.minimum(
                clj, len(cums[bi]) - 1)], pthr)
            draws = np.array(
                [int(hashlib.md5(f"{seed}:hsl:{i}:{int(jj)}".encode())
                     .hexdigest()[:15], 16) for jj in j], dtype=np.uint64)
            keep = draws < thr
            outs_s.append(np.full(int(keep.sum()), i, np.int64))
            outs_d.append(j[keep])
        if not outs_s:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": pa.array(np.concatenate(outs_s)),
                         "dst": pa.array(np.concatenate(outs_d))})

    return (ray.data.range(n, override_num_blocks=num_partitions)
            .map_batches(_gen, batch_format="pyarrow", batch_size=None))
