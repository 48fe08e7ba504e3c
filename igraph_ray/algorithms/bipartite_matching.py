"""Maximum bipartite matching — distributed Hopcroft–Karp.

Reference semantics: igraph_maximum_bipartite_matching
(/root/reference/src/matching.c, unweighted path: Hopcroft–Karp-style
phases of shortest augmenting paths). The reference's DFS extraction is
sequential; the Ray-native engine runs the textbook HK *phase* structure
(public algorithm, Hopcroft & Karp 1973) with both halves distributed:

* **BFS layering** is level-synchronous: alternating unmatched(L→R) /
  matched(R→L) frontier expansion via dataset joins, stopping at the
  first level that reaches a free right vertex (shortest length D).
* **Maximal disjoint shortest-path extraction** replaces the DFS with
  deterministic *contest rounds*: every still-unmatched top vertex
  (a free right vertex at level D) descends the layered graph one level
  per step — it claims its minimum-md5-priority in-edge, conflicting
  claims on the same left vertex are won by the smallest path id
  (losers abort and retry next round), and the matched hop below a won
  left vertex is forced (match is injective, so forced hops can never
  conflict). Per round at least the globally smallest surviving path id
  wins every contest it enters, so each round completes or kills ≥1
  path — the extracted set is a maximal set of vertex-disjoint shortest
  augmenting paths, preserving HK's O(√V) phase bound.

All state (matching, layers, claims) lives in Datasets; the driver sees
only per-round counts. Determinism: edge priority = first 15 hex chars
of md5("l,r") (the engine-wide md5-prefix rule), path id = the free
right vertex id.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.util import hash_join


def _t(**cols) -> pa.Table:
    return pa.table(cols)


def _empty(**schema) -> pa.Table:
    return pa.table({k: pa.array([], v) for k, v in schema.items()})


def _col(b: pa.Table, name: str) -> np.ndarray:
    return b[name].to_numpy(zero_copy_only=False).astype(np.int64)


def _prep_edges(edges: ray.data.Dataset, l_col: str, r_col: str):
    def _p(b: pa.Table) -> pa.Table:
        l = _col(b, l_col)
        r = _col(b, r_col)
        pr = np.array(
            [int(hashlib.md5(f"{int(a)},{int(c)}".encode()).hexdigest()[:15], 16)
             for a, c in zip(l, r)], dtype=np.int64)
        return _t(l=pa.array(l), r=pa.array(r), prio=pa.array(pr))

    def _local_dedup(b: pa.Table) -> pa.Table:
        return b.group_by(["l", "r"]).aggregate([("prio", "min")]) \
            .rename_columns(["l", "r", "prio"])

    return (edges.map_batches(_p, batch_format="pyarrow", batch_size=None)
            .map_batches(_local_dedup, batch_format="pyarrow", batch_size=None)
            .groupby(["l", "r"]).min("prio")
            .map_batches(lambda b: _t(l=b["l"], r=b["r"], prio=b["min(prio)"]),
                         batch_format="pyarrow", batch_size=None)
            .materialize())


def _distinct(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    return (ds.groupby(col).count().select_columns([col]).materialize())


def maximum_bipartite_matching(
    edges: ray.data.Dataset,
    l_col: str = "l",
    r_col: str = "r",
    num_partitions: int = 8,
    max_phases: int = 10_000,
) -> ray.data.Dataset:
    """Maximum-cardinality matching of the bipartite graph given as an
    edge Dataset (left ids in ``l_col``, right ids in ``r_col`` — two
    independent id namespaces). Returns the matched pairs (l, r)."""
    E = _prep_edges(edges, l_col, r_col)
    if E.count() == 0:
        return ray.data.from_arrow(_empty(l=pa.int64(), r=pa.int64()))

    match = ray.data.from_arrow(_empty(l=pa.int64(), r=pa.int64())).materialize()

    L = _distinct(E, "l")
    R = _distinct(E, "r")
    npn = num_partitions

    for _phase in range(max_phases):
        # ---- free vertices --------------------------------------------
        free_l = hash_join(
            L, match.select_columns(["l"]), on="l",
            num_partitions=npn, join_type="left_anti").materialize()
        free_r_set = hash_join(
            R, match.select_columns(["r"]), on="r",
            num_partitions=npn, join_type="left_anti").materialize()
        if free_l.count() == 0 or free_r_set.count() == 0:
            break

        # ---- BFS layering (alternating, from all free left) -----------
        dist_l_parts = [free_l.map_batches(
            lambda b: _t(l=b["l"], dl=pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow", batch_size=None).materialize()]
        dist_r_parts: list = []
        frontier_l = free_l
        visited_r = ray.data.from_arrow(_empty(r=pa.int64())).materialize()
        visited_l = free_l.materialize()
        D = None
        k = 0
        while True:
            cand = hash_join(E.select_columns(["l", "r"]), frontier_l,
                             on="l", num_partitions=npn)
            cand_r = _distinct(cand, "r")
            new_r = hash_join(cand_r, visited_r, on="r",
                              num_partitions=npn,
                              join_type="left_anti").materialize()
            if new_r.count() == 0:
                break
            dr = k + 1
            dist_r_parts.append(new_r.map_batches(
                lambda b, dr=dr: _t(r=b["r"],
                                    dr=pa.array(np.full(b.num_rows, dr, np.int64))),
                batch_format="pyarrow", batch_size=None).materialize())
            visited_r = visited_r.union(new_r).materialize()
            hit = hash_join(new_r, free_r_set, on="r",
                            num_partitions=npn,
                            join_type="left_semi").materialize()
            if hit.count() > 0:
                D = dr
                T0 = hit
                break
            nxt = hash_join(match, new_r, on="r", num_partitions=npn)
            nxt_l = _distinct(nxt, "l")
            new_l = hash_join(nxt_l, visited_l, on="l",
                              num_partitions=npn,
                              join_type="left_anti").materialize()
            if new_l.count() == 0:
                break
            dl = k + 2
            dist_l_parts.append(new_l.map_batches(
                lambda b, dl=dl: _t(l=b["l"],
                                    dl=pa.array(np.full(b.num_rows, dl, np.int64))),
                batch_format="pyarrow", batch_size=None).materialize())
            visited_l = visited_l.union(new_l).materialize()
            frontier_l = new_l
            k += 2
        if D is None:
            break  # no augmenting path: matching is maximum

        dist_l = dist_l_parts[0]
        for p in dist_l_parts[1:]:
            dist_l = dist_l.union(p)
        dist_r = dist_r_parts[0]
        for p in dist_r_parts[1:]:
            dist_r = dist_r.union(p)

        # layered edges: (l, r, prio, dl) with dr == dl + 1 (only levels
        # on shortest paths; edges past D never qualify)
        LE = hash_join(E, dist_l.materialize(), on="l", num_partitions=npn)
        LE = hash_join(LE, dist_r.materialize(), on="r", num_partitions=npn)

        def _layer(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "dl" not in b.column_names:
                return _empty(l=pa.int64(), r=pa.int64(),
                              prio=pa.int64(), dl=pa.int64())
            keep = pc.equal(b["dr"], pc.add(b["dl"], 1))
            t = b.filter(keep)
            return _t(l=t["l"], r=t["r"], prio=t["prio"], dl=t["dl"])

        LE = LE.map_batches(_layer, batch_format="pyarrow",
                            batch_size=None).materialize()

        # ---- contest rounds: maximal disjoint shortest paths ----------
        T_active = T0
        all_hops: list = []
        guard = int(T0.count()) + 2
        for _round in range(guard):
            if T_active.count() == 0:
                break
            # alive paths: (pid, cur_r); hops this round: (pid, l, r)
            alive = T_active.map_batches(
                lambda b: _t(pid=b["r"], cur_r=b["r"]),
                batch_format="pyarrow", batch_size=None).materialize()
            round_hops: list = []
            dead_pids = ray.data.from_arrow(_empty(pid=pa.int64()))
            j = D
            completed = None
            while j >= 1:
                # claims: layered in-edges of each path's cur_r at dl=j-1
                er = LE.filter(expr=f"dl == {j - 1}").map_batches(
                    lambda b: _t(cur_r=b["r"], l=b["l"], prio=b["prio"]),
                    batch_format="pyarrow", batch_size=None)
                cl = hash_join(er, alive, on="cur_r", num_partitions=npn)

                def _clean(b: pa.Table) -> pa.Table:
                    if b.num_rows == 0 or "pid" not in b.column_names:
                        return _empty(pid=pa.int64(), cur_r=pa.int64(),
                                      l=pa.int64(), prio=pa.int64())
                    return _t(pid=b["pid"], cur_r=b["cur_r"],
                              l=b["l"], prio=b["prio"])

                cl = cl.map_batches(_clean, batch_format="pyarrow",
                                    batch_size=None).materialize()
                # paths with no in-edge are dead (no shortest path left)
                with_claims = _distinct(cl, "pid")
                dead = hash_join(alive.select_columns(["pid"]), with_claims,
                                 on="pid", num_partitions=npn,
                                 join_type="left_anti").materialize()
                if dead.count() > 0:
                    dead_pids = dead_pids.union(dead)
                # each path claims its min-priority edge
                best = cl.groupby("pid").min("prio").map_batches(
                    lambda b: _t(pid=b["pid"], prio=b["min(prio)"]),
                    batch_format="pyarrow", batch_size=None)
                claims = hash_join(cl, best.materialize(), on=("pid", "prio"),
                                   num_partitions=npn,
                                   join_type="left_semi").materialize()
                # contest per left vertex: smallest pid wins
                win = claims.groupby("l").min("pid").map_batches(
                    lambda b: _t(l=b["l"], pid=b["min(pid)"]),
                    batch_format="pyarrow", batch_size=None).materialize()
                winners = hash_join(claims, win, on=("l", "pid"),
                                    num_partitions=npn,
                                    join_type="left_semi").materialize()
                # losing claimants simply stay in T_active and retry
                hop = winners.map_batches(
                    lambda b: _t(pid=b["pid"], l=b["l"], r=b["cur_r"]),
                    batch_format="pyarrow", batch_size=None).materialize()
                round_hops.append(hop)
                if j - 1 == 0:
                    completed = _distinct(hop, "pid")
                    break
                # forced matched hop below each won left vertex
                down = hash_join(hop.select_columns(["pid", "l"]),
                                 match, on="l", num_partitions=npn)
                alive = down.map_batches(
                    lambda b: (_t(pid=b["pid"], cur_r=b["r"])
                               if b.num_rows and "pid" in b.column_names
                               else _empty(pid=pa.int64(), cur_r=pa.int64())),
                    batch_format="pyarrow", batch_size=None).materialize()
                if alive.count() == 0:
                    completed = None
                    break
                j -= 2

            if completed is not None and completed.count() > 0:
                # keep only hops of completed paths; augment lazily later
                hops = round_hops[0]
                for h in round_hops[1:]:
                    hops = hops.union(h)
                done_hops = hash_join(hops, completed, on="pid",
                                      num_partitions=npn,
                                      join_type="left_semi").materialize()
                all_hops.append(done_hops)
                # remove used left vertices from the layered graph and
                # completed/dead pids from the active top set
                used_l = _distinct(done_hops, "l")
                LE = hash_join(LE, used_l, on="l", num_partitions=npn,
                               join_type="left_anti").materialize()
                gone = completed.map_batches(
                    lambda b: _t(r=b["pid"]),
                    batch_format="pyarrow", batch_size=None)
                T_active = hash_join(T_active, gone.materialize(), on="r",
                                     num_partitions=npn,
                                     join_type="left_anti").materialize()
            if dead_pids.count() > 0:
                goner = dead_pids.map_batches(
                    lambda b: _t(r=b["pid"]),
                    batch_format="pyarrow", batch_size=None).materialize()
                T_active = hash_join(T_active, goner, on="r",
                                     num_partitions=npn,
                                     join_type="left_anti").materialize()
            if (completed is None or completed.count() == 0) \
                    and dead_pids.count() == 0:
                # should be impossible (min-pid path always survives);
                # guard against livelock
                break

        if not all_hops:
            break
        aug = all_hops[0]
        for h in all_hops[1:]:
            aug = aug.union(h)
        aug = aug.materialize()
        # augment: flip — matched pairs whose l lies on a path unmatch,
        # path e-edges become matched
        keep = hash_join(match, _distinct(aug, "l"), on="l",
                         num_partitions=npn, join_type="left_anti")
        match = keep.union(aug.select_columns(["l", "r"])).materialize()

    return match.select_columns(["l", "r"])
