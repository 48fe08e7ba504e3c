"""Adaptive voter model — the engine's counterpart of the reference
fork's igraph_write_avm / igraph_write_avm_collected
(/root/reference/src/dynamic.c:1496,1506): opinions in {1, 2} on an
undirected graph; per timestep a discordant edge (endpoints disagree)
is drawn, one endpoint becomes the resolver, and with probability
``rewiring_p`` the resolver rewires the edge to a like-minded vertex,
otherwise it adopts the other endpoint's opinion. The output is the
full colored-graph stream per timestep (dynamic.c writes
``t # <t>`` + igraph_write_colored_graph after every step).

The reference seeds libc rand() with time(NULL) (dynamic.c:1515) — its
output is irreproducible by design — so, like the engine's sir /
imitation / rewire families, every draw here is the repo's
deterministic 15-hex md5 fold, making the whole trajectory a pure
function of (graph, seed) and replayable verbatim in SQL:

- edge draw k of step t: fold15(md5("{seed}:t{t}:e{k}")) % ecount,
  edge ids = rank in the LEXICOGRAPHICALLY SORTED current edge list
  (the reference's insertion-order eids are meaningless without its
  RNG); the first of ``attempts`` draws that is discordant wins; if
  none is, the step is a no-op (the reference spins forever on a
  concordant graph — dynamic.c:1548 "TODO: possibly infinite").
- resolver: fold15(md5("{seed}:t{t}:r")) % 2 → lo endpoint if 0.
- action: rewire iff fold15(md5("{seed}:t{t}:a")) < p·16^15.
- rewire target draw j: fold15(md5("{seed}:t{t}:w{j}")) % n; valid iff
  != resolver, same opinion as the resolver, and not already adjacent
  to the resolver (documented deviation: the reference's
  igraph_add_edge would create a multi-edge; the engine keeps the
  edge SET contract its sorted-rank ids require). First valid draw
  wins; none valid → no-op.

Sequential by nature (each step reads the previous global state); runs
as one guarded task over the small simulation state, like the
reference's other driver-seeded processes. The 100×-scale path for
voter-model-style dynamics is the synchronous imitation family
(algorithms/imitation.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

HEX15 = 16 ** 15


def _fold15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def avm_stream(
    edges,
    n: int,
    steps: int = 12,
    rewiring_p: float = 0.4,
    opinion_prior: float = 0.5,
    attempts: int = 16,
    seed: str = "avm",
    max_n: int = 1 << 20,
) -> pa.Table:
    """Run the deterministic AVM and return the per-timestep stream
    (t, kind, a, b): kind 0 rows are the edge set (a=lo, b=hi) at time
    t, kind 1 rows the opinion vector (a=vertex, b=opinion); t = 0 is
    the initial state, t = steps the final one.

    ``edges`` is an iterable of (lo, hi) sorted unique pairs."""
    if n > max_n:
        raise NotImplementedError(
            f"avm_stream is a guarded sequential simulation (n={n} > "
            f"{max_n}); use algorithms/imitation.py for synchronous "
            "large-scale opinion dynamics")
    E = sorted((int(a), int(b)) for a, b in edges)
    eset = set(E)
    p_thr = int(rewiring_p * HEX15)
    prior_thr = int(opinion_prior * HEX15)
    op = np.empty(n, dtype=np.int64)
    for v in range(n):
        op[v] = 2 if _fold15(f"{seed}:op:{v}") < prior_thr else 1

    ts, kinds, avals, bvals = [], [], [], []

    def _emit(t: int):
        for lo, hi in sorted(eset):
            ts.append(t); kinds.append(0); avals.append(lo); bvals.append(hi)
        for v in range(n):
            ts.append(t); kinds.append(1); avals.append(v)
            bvals.append(int(op[v]))

    _emit(0)
    for t in range(steps):
        E = sorted(eset)
        m = len(E)
        chosen = None
        if m:
            for k in range(attempts):
                lo, hi = E[_fold15(f"{seed}:t{t}:e{k}") % m]
                if op[lo] != op[hi]:
                    chosen = (lo, hi)
                    break
        if chosen is not None:
            lo, hi = chosen
            if _fold15(f"{seed}:t{t}:r") % 2 == 0:
                resolver, other = lo, hi
            else:
                resolver, other = hi, lo
            if _fold15(f"{seed}:t{t}:a") < p_thr:
                # rewiring: first valid like-minded non-adjacent target
                for j in range(attempts):
                    w = _fold15(f"{seed}:t{t}:w{j}") % n
                    if (w != resolver and op[w] == op[resolver]
                            and (min(resolver, w), max(resolver, w))
                            not in eset):
                        eset.discard(chosen)
                        eset.add((min(resolver, w), max(resolver, w)))
                        break
            else:
                op[resolver] = op[other]
        _emit(t + 1)

    return pa.table({"t": pa.array(ts, pa.int64()),
                     "kind": pa.array(kinds, pa.int64()),
                     "a": pa.array(avals, pa.int64()),
                     "b": pa.array(bvals, pa.int64())})
