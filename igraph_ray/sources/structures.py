"""Deterministic structure generators (structure_generators.c): star,
ring, tree (regular k-ary), full. Unlike the seeded random games
(sources/games.py) these are pure functions of the vertex-id range, so
the distributed form is one vectorized ``map_batches`` over
``ray.data.range(n)`` — no RNG, no shuffle, identical output at any
parallelism, and each maps 1:1 onto an ANSI-SQL ``range()`` expression
for the oracle gate.

Reference semantics:
- igraph_star (structure_generators.c, functions.def:101): center 0,
  mode "out" (center→leaf), "in" (leaf→center), or "undirected"
  (canonical lo<hi, same as "out" with center 0).
- igraph_ring (functions.def:110): i→i+1 for i<n−1, plus n−1→0 when
  circular.
- igraph_tree (functions.def:115): k-ary tree, vertex i>0 has parent
  (i−1)//children, edges parent→child.
- igraph_full (functions.def:119): every ordered pair src≠dst
  (directed) or lo<hi pair (undirected); loops optional.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _ids(b: pa.Table) -> np.ndarray:
    return b["id"].to_numpy(zero_copy_only=False).astype(np.int64)


def star(n: int, mode: str = "out") -> ray.data.Dataset:
    """Star on n vertices with center 0 (igraph_star)."""
    if mode not in ("out", "in", "undirected"):
        raise ValueError(f"unknown star mode {mode!r}")

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        v = v[v > 0]
        zeros = np.zeros(len(v), np.int64)
        if mode == "in":
            return pa.table({"src": pa.array(v), "dst": pa.array(zeros)})
        return pa.table({"src": pa.array(zeros), "dst": pa.array(v)})

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)


def ring(n: int, circular: bool = True) -> ray.data.Dataset:
    """Directed path/cycle 0→1→…→n−1 (→0 when circular) (igraph_ring)."""

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        v = v[v < n - 1] if not circular else v
        nxt = (v + 1) % n if circular else v + 1
        return pa.table({"src": pa.array(v), "dst": pa.array(nxt)})

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)


def tree(n: int, children: int = 2) -> ray.data.Dataset:
    """Regular k-ary tree, edges parent→child (igraph_tree)."""

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        v = v[v > 0]
        return pa.table({"src": pa.array((v - 1) // children),
                         "dst": pa.array(v)})

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)


def full(n: int, directed: bool = True, loops: bool = False) -> ray.data.Dataset:
    """Complete graph: one task-side expansion per id block (igraph_full).
    Each block of k source ids emits k·n rows — the expansion happens
    inside the tasks, never on the driver."""

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        src = np.repeat(v, n)
        dst = np.tile(np.arange(n, dtype=np.int64), len(v))
        keep = np.ones(len(src), bool)
        if not loops:
            keep &= src != dst
        if not directed:
            keep &= src < dst
        return pa.table({"src": pa.array(src[keep]),
                         "dst": pa.array(dst[keep])})

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)


def de_bruijn(m: int, n: int) -> ray.data.Dataset:
    """De Bruijn graph B(m, n) (igraph_de_bruijn, functions.def:144):
    m^n vertices, arcs v → (v·m + j) mod m^n for j in 0..m−1 (includes
    the loops the reference keeps)."""
    nv = m ** n

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        src = np.repeat(v, m)
        j = np.tile(np.arange(m, dtype=np.int64), len(v))
        return pa.table({"src": pa.array(src),
                         "dst": pa.array((src * m + j) % nv)})

    return ray.data.range(nv).map_batches(_f, batch_format="pyarrow",
                                          batch_size=None)


def lattice2d(rows: int, cols: int, circular: bool = False) -> ray.data.Dataset:
    """Undirected 2-D lattice (igraph_lattice restricted to 2 dims):
    vertex r·cols+c linked right and down; ``circular`` wraps both axes
    (each wrap edge once, canonical lo<hi ordering not applied — edges
    are emitted (from, to) in the axis direction like the reference's
    order)."""

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        r, c = v // cols, v % cols
        srcs, dsts = [], []
        right = c < cols - 1
        srcs.append(v[right]); dsts.append(v[right] + 1)
        down = r < rows - 1
        srcs.append(v[down]); dsts.append(v[down] + cols)
        if circular and cols > 1:
            wrap = c == cols - 1
            srcs.append(v[wrap]); dsts.append(v[wrap] - (cols - 1))
        if circular and rows > 1:
            wrap = r == rows - 1
            srcs.append(v[wrap]); dsts.append(v[wrap] - (rows - 1) * cols)
        return pa.table({"src": pa.array(np.concatenate(srcs)),
                         "dst": pa.array(np.concatenate(dsts))})

    return ray.data.range(rows * cols).map_batches(
        _f, batch_format="pyarrow", batch_size=None)


# Famous small graphs (igraph_famous, structure_generators.c:2111) —
# written from their public mathematical definitions, not copied:
# each is a closed-form construction or the standard textbook edge
# list of the named graph.
def _petersen():
    # outer C5, inner pentagram (i -> i+2 mod 5), spokes
    e = [(i, (i + 1) % 5) for i in range(5)]
    e += [(5 + i, 5 + (i + 2) % 5) for i in range(5)]
    e += [(i, 5 + i) for i in range(5)]
    return 10, e


def _bull():
    return 5, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)]


def _diamond():
    return 4, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]


def _house():
    # square 0-1-2-3 plus roof apex 4 on the 2-3 wall
    return 5, [(0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 4)]


def _tetrahedral():
    return 4, [(i, j) for i in range(4) for j in range(i + 1, 4)]


def _cubical():
    # Q3: vertices = 3-bit strings, edges = Hamming distance 1
    e = [(v, v ^ (1 << b)) for v in range(8) for b in range(3)
         if v < (v ^ (1 << b))]
    return 8, e


def _octahedral():
    # K_{2,2,2}: complete minus a perfect matching (i, i+3)
    e = [(i, j) for i in range(6) for j in range(i + 1, 6)
         if j != i + 3]
    return 6, e


def _krackhardt_kite():
    return 10, [(0, 1), (0, 2), (0, 3), (0, 5), (1, 3), (1, 4), (1, 6),
                (2, 3), (2, 5), (3, 4), (3, 5), (3, 6), (4, 6), (5, 6),
                (5, 7), (6, 7), (7, 8), (8, 9)]


FAMOUS = {
    "petersen": _petersen,
    "bull": _bull,
    "diamond": _diamond,
    "house": _house,
    "tetrahedral": _tetrahedral,
    "cubical": _cubical,
    "octahedral": _octahedral,
    "krackhardt_kite": _krackhardt_kite,
}


def famous(name: str) -> ray.data.Dataset:
    """igraph_famous analogue: the named undirected graph as a
    canonical (src < dst) edge Dataset."""
    if name not in FAMOUS:
        raise ValueError(f"unknown famous graph {name!r}; "
                         f"have {sorted(FAMOUS)}")
    _, e = FAMOUS[name]()
    e = sorted((min(a, b), max(a, b)) for a, b in e)
    return ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in e], pa.int64()),
        "dst": pa.array([b for _, b in e], pa.int64())}))


# LCF notation (igraph_lcf_vector, structure_generators.c:1617): a
# Hamiltonian cubic graph from a ring 0..n-1 plus chords
# i -> (i + shifts[i mod k]) mod n, shifts repeated around the ring.
def lcf_edges(n: int, shifts, repeats: int):
    """Canonical (lo < hi) edge list of the LCF graph — ring plus
    deduplicated chords (every chord is named twice by the notation)."""
    assert len(shifts) * repeats == n
    ring = [(i, (i + 1) % n) for i in range(n)]
    chords = set()
    for i in range(n):
        s = shifts[i % len(shifts)]
        j = (i + s) % n
        chords.add((min(i, j), max(i, j)))
    out = {(min(a, b), max(a, b)) for a, b in ring} | chords
    return sorted(out)


def _lcf_famous(n, shifts, repeats):
    return lambda: (n, lcf_edges(n, shifts, repeats))


# published LCF codes of the classic cubic graphs (textbook notation)
FAMOUS["heawood"] = _lcf_famous(14, [5, -5], 7)
FAMOUS["pappus"] = _lcf_famous(18, [5, 7, -7, 7, -7, -5], 3)
FAMOUS["frucht"] = _lcf_famous(
    12, [-5, -2, -4, 2, 5, -2, 2, 5, -2, -5, 4, 2], 1)
FAMOUS["desargues"] = _lcf_famous(20, [5, -5, 9, -9], 5)
FAMOUS["moebius_kantor"] = _lcf_famous(16, [5, -5], 8)
FAMOUS["nauru"] = _lcf_famous(24, [5, -9, 7, -7, 9, -5], 4)


def _zachary():
    # Zachary karate club (public dataset; same list as the reference's
    # own example fixtures) — 34 vertices, 78 edges
    e = [
        (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8),
        (0, 10), (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21),
        (0, 31), (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19),
        (1, 21), (1, 30), (2, 3), (2, 7), (2, 8), (2, 9), (2, 13),
        (2, 27), (2, 28), (2, 32), (3, 7), (3, 12), (3, 13), (4, 6),
        (4, 10), (5, 6), (5, 10), (5, 16), (6, 16), (8, 30), (8, 32),
        (8, 33), (9, 33), (13, 33), (14, 32), (14, 33), (15, 32),
        (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
        (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32),
        (23, 33), (24, 25), (24, 27), (24, 31), (25, 31), (26, 29),
        (26, 33), (27, 33), (28, 31), (28, 33), (29, 32), (29, 33),
        (30, 32), (30, 33), (31, 32), (31, 33), (32, 33),
    ]
    return 34, e


FAMOUS["zachary"] = _zachary


def full_citation(n: int) -> ray.data.Dataset:
    """Full citation graph (igraph_full_citation,
    structure_generators.c:1078): directed i → j for every j < i."""

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        src = np.repeat(v, v)  # vertex i emits i arcs
        dst = np.arange(len(src), dtype=np.int64) - np.repeat(
            np.cumsum(v) - v, v)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return ray.data.range(n).map_batches(_f, batch_format="pyarrow",
                                         batch_size=None)


def extended_chordal_ring(nodes: int, w) -> ray.data.Dataset:
    """Extended chordal ring (igraph_extended_chordal_ring,
    structure_generators.c:1188): the n-ring plus, for every vertex i,
    a chord to i + W[j][i mod period] for each row j whenever the
    target stays < nodes (the reference's non-wrapping rule). Edges
    are emitted (from, to) in construction order like the reference;
    undirected semantics."""
    W = np.asarray(w, dtype=np.int64)
    period = W.shape[1]

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        # ring edges owned by their lower endpoint; the wrap edge
        # (0, nodes-1) is owned by vertex 0
        srcs = [v[v < nodes - 1]]
        dsts = [v[v < nodes - 1] + 1]
        if (v == 0).any():
            srcs.append(np.array([0], np.int64))
            dsts.append(np.array([nodes - 1], np.int64))
        for j in range(W.shape[0]):
            off = W[j, v % period]
            ok = v + off < nodes
            srcs.append(v[ok])
            dsts.append(v[ok] + off[ok])
        return pa.table({"src": pa.array(np.concatenate(srcs)),
                         "dst": pa.array(np.concatenate(dsts))})

    return ray.data.range(nodes).map_batches(_f, batch_format="pyarrow",
                                             batch_size=None)


def kautz(m: int, n: int) -> ray.data.Dataset:
    """Kautz graph K(m, n) (igraph_kautz,
    structure_generators.c:1478): vertices are the (m+1)·m^n strings
    of length n+1 over m+1 symbols with no two equal consecutive
    symbols, numbered by LEXICOGRAPHIC rank (the reference assigns ids
    by scanning all (m+1)^(n+1) strings in increasing value and
    indexing the valid ones); arcs u → shift(u)·c for the m symbols
    c != last(u). Everything is closed-form digit algebra per vertex
    id — decode the mixed-radix digits, re-rank the m shifted
    continuations."""
    if m <= 0:
        return ray.data.range(0).map_batches(
            lambda b: pa.table({"src": pa.array([], pa.int64()),
                                "dst": pa.array([], pa.int64())}),
            batch_format="pyarrow", batch_size=None)
    nv = (m + 1) * (m ** n)

    def _rank(digits: np.ndarray) -> np.ndarray:
        """Lexicographic rank among valid strings: first digit free,
        every later digit has m choices (skip the predecessor)."""
        k = digits.shape[1]
        r = digits[:, 0] * (m ** (k - 1))
        for i in range(1, k):
            adj = digits[:, i] - (digits[:, i] > digits[:, i - 1])
            r = r + adj * (m ** (k - 1 - i))
        return r

    def _f(b: pa.Table) -> pa.Table:
        v = _ids(b)
        k = n + 1
        # decode: inverse of _rank
        digits = np.empty((len(v), k), dtype=np.int64)
        r = v.copy()
        digits[:, 0] = r // (m ** (k - 1))
        r = r % (m ** (k - 1))
        for i in range(1, k):
            adj = r // (m ** (k - 1 - i))
            r = r % (m ** (k - 1 - i))
            digits[:, i] = adj + (adj >= digits[:, i - 1])
        # m continuations c != last digit
        src = np.repeat(v, m)
        cs = np.tile(np.arange(m, dtype=np.int64), len(v))
        last = np.repeat(digits[:, -1], m)
        c = cs + (cs >= last)
        nxt = np.empty((len(src), k), dtype=np.int64)
        nxt[:, : k - 1] = np.repeat(digits[:, 1:], m, axis=0)
        nxt[:, -1] = c
        return pa.table({"src": pa.array(src),
                         "dst": pa.array(_rank(nxt))})

    return ray.data.range(nv).map_batches(_f, batch_format="pyarrow",
                                          batch_size=None)


# --- session-6 catalog extension: the rest of the LCF-expressible
# igraph_famous classics + programmatic constructions (published
# graphs; LCF codes and constructions from the standard literature) ---
FAMOUS["dodecahedral"] = _lcf_famous(
    20, [10, 7, 4, -4, -7, 10, -4, 7, -7, 4], 2)
FAMOUS["franklin"] = _lcf_famous(12, [5, -5], 6)
FAMOUS["levi"] = _lcf_famous(30, [-13, -9, 7, -7, 9, 13], 5)
FAMOUS["mcgee"] = _lcf_famous(24, [12, 7, -7], 8)
FAMOUS["folkman"] = _lcf_famous(20, [5, -7, -7, 5], 5)


def _grotzsch():
    # Mycielskian of C5: ring 0..4, shadows 5..9 (5+i ~ neighbors of i
    # in the ring), apex 10 ~ every shadow. Triangle-free, chi = 4.
    ring = [(i, (i + 1) % 5) for i in range(5)]
    shadow = []
    for i in range(5):
        shadow += [(5 + i, (i + 1) % 5), (5 + i, (i - 1) % 5)]
    apex = [(10, 5 + i) for i in range(5)]
    return 11, ring + shadow + apex


def _icosahedral():
    # pentagonal antiprism + two apexes: top 0, ring A 1..5,
    # ring B 6..10, bottom 11. 12 vertices, 30 edges, 5-regular.
    e = [(0, 1 + i) for i in range(5)]
    e += [(1 + i, 1 + (i + 1) % 5) for i in range(5)]
    e += [(6 + i, 6 + (i + 1) % 5) for i in range(5)]
    e += [(1 + i, 6 + i) for i in range(5)]
    e += [(1 + (i + 1) % 5, 6 + i) for i in range(5)]
    e += [(11, 6 + i) for i in range(5)]
    return 12, e


def _housex():
    # the house with both square diagonals (igraph "housex")
    n, e = _house()
    return n, e + [(0, 3), (1, 2)]


def _chvatal():
    # Chvátal graph: 12 vertices, 24 edges, 4-regular, triangle-free,
    # chromatic number 4 (standard published adjacency)
    return 12, [
        (0, 1), (0, 4), (0, 6), (0, 9), (1, 2), (1, 5), (1, 7),
        (2, 3), (2, 6), (2, 8), (3, 4), (3, 7), (3, 9), (4, 5),
        (4, 8), (5, 10), (5, 11), (6, 10), (6, 11), (7, 8), (7, 11),
        (8, 10), (9, 10), (9, 11)]


def _herschel():
    # Herschel graph: smallest non-Hamiltonian polyhedral graph —
    # 11 vertices, 18 edges, bipartite, degrees 3×8 + 4×3
    return 11, [
        (0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 5), (2, 6),
        (2, 7), (3, 8), (3, 9), (4, 6), (4, 8), (5, 7), (5, 9),
        (6, 10), (7, 10), (8, 10), (9, 10)]


FAMOUS["grotzsch"] = _grotzsch
FAMOUS["icosahedral"] = _icosahedral
FAMOUS["housex"] = _housex
FAMOUS["chvatal"] = _chvatal
FAMOUS["herschel"] = _herschel


# platonic-solid alias spellings accepted by the reference's
# igraph_famous (structure_generators.c:2111)
FAMOUS["dodecahedron"] = FAMOUS["dodecahedral"]
FAMOUS["icosahedron"] = FAMOUS["icosahedral"]
FAMOUS["tetrahedron"] = FAMOUS["tetrahedral"]
FAMOUS["octahedron"] = FAMOUS["octahedral"]
FAMOUS["cubical_hexahedron"] = FAMOUS["cubical"]


# --- famous-catalog residue: the remaining igraph_famous graphs with a
# published construction or first-principles characterization
# (structure_generators.c:1722+). Each is built from its mathematical
# definition, never by transcribing the reference's edge arrays; the
# constructions were cross-validated against the reference by VF2
# isomorphism at development time, and pytest pins the published
# invariants (order, size, regularity, girth, |Aut|, matchings). ---


def _coxeter():
    # Coxeter graph (28, 42, cubic, girth 7, |Aut| = 336): the classic
    # construction — three heptagons with step sizes 1, 2 and 4
    # (the quadratic residues mod 7 pattern) plus a 7-vertex hub, each
    # hub vertex spoked to the same index of every heptagon.
    edges = []
    for r, s in enumerate((1, 2, 4)):
        for i in range(7):
            edges.append((7 * r + i, 7 * r + (i + s) % 7))
    for r in range(3):
        for i in range(7):
            edges.append((21 + i, 7 * r + i))
    return 28, edges


def _robertson():
    # Robertson graph = the unique (4,5)-cage: 4-regular, girth 5,
    # 19 vertices (Robertson 1964). Built from that characterization
    # directly: a lexicographic-minimum orderly backtracking search
    # for a 4-regular girth-5 graph on 19 vertices (no shared
    # neighbors = no triangle/C4 through a new edge). Uniqueness of
    # the cage makes the search result THE Robertson graph; the
    # search completes in ~1 ms.
    n = 19
    adj = [set() for _ in range(n)]
    deg = [0] * n
    sol = []

    def edge_ok(u, v):
        if adj[u] & adj[v]:
            return False
        for x in adj[v]:
            if adj[x] & adj[u]:
                return False
        return True

    def search(u, start):
        if sol:
            return
        if deg[u] == 4:
            if u == n - 1:
                sol.append([(a, b) for a in range(n)
                            for b in adj[a] if a < b])
                return
            search(u + 1, u + 2)
            return
        need = 4 - deg[u]
        cands = [v for v in range(max(start, u + 1), n) if deg[v] < 4]
        for i, v in enumerate(cands):
            if len(cands) - i < need:
                break
            if edge_ok(u, v):
                adj[u].add(v)
                adj[v].add(u)
                deg[u] += 1
                deg[v] += 1
                search(u, v + 1)
                adj[u].discard(v)
                adj[v].discard(u)
                deg[u] -= 1
                deg[v] -= 1
            if sol:
                return

    search(0, 1)
    return n, sorted(sol[0])


def _meredith():
    # Meredith graph (70, 140, 4-regular, 4-connected,
    # non-hamiltonian; Meredith 1973): replace every vertex of the
    # Petersen graph by a copy of K_{3,4}; every Petersen edge becomes
    # one edge between 4-side vertices of the two copies, and a
    # perfect matching of Petersen (the spokes) is doubled so each
    # copy's four 4-side vertices all reach degree 4.
    pet = ([(i, (i + 1) % 5) for i in range(5)]
           + [(5 + i, 5 + (i + 2) % 5) for i in range(5)])
    spokes = [(i, i + 5) for i in range(5)]
    edges = []
    for b in range(10):             # block b: 0-3 = 4-side, 4-6 = 3-side
        for i in range(4):
            for j in range(4, 7):
                edges.append((7 * b + i, 7 * b + j))
    slot = [0] * 10

    def connect(u, v):
        edges.append((7 * u + slot[u], 7 * v + slot[v]))
        slot[u] += 1
        slot[v] += 1

    for u, v in pet:
        connect(u, v)
    for u, v in spokes:
        connect(u, v)
        connect(u, v)
    return 70, edges


def _thomassen():
    # Thomassen's smallest hypotraceable graph (34, 52; Thomassen
    # 1974): four copies of (Petersen minus two adjacent vertices
    # u ~ v); two new hub vertices, each adjacent to the former
    # u-neighbors of two copies; the former v-neighbors paired
    # one-to-one between copies attached to DIFFERENT hubs.
    edges = []
    stubs = []
    for k in range(4):
        b = 8 * k
        o = [b, b + 1, b + 2, b + 3]        # outer path o1..o4
        i = [b + 4, b + 5, b + 6, b + 7]    # inner i1..i4
        edges += [(o[0], o[1]), (o[1], o[2]), (o[2], o[3])]
        edges += [(i[0], i[2]), (i[1], i[3]), (i[3], i[0])]
        edges += [(o[j], i[j]) for j in range(4)]
        stubs.append({"u": [o[0], o[3]], "v": [i[1], i[2]]})
    x, y = 32, 33
    for s in stubs[0]["u"] + stubs[1]["u"]:
        edges.append((x, s))
    for s in stubs[2]["u"] + stubs[3]["u"]:
        edges.append((y, s))
    for a, b in ((0, 2), (1, 3)):           # hub-x copy with hub-y copy
        edges.append((stubs[a]["v"][0], stubs[b]["v"][0]))
        edges.append((stubs[a]["v"][1], stubs[b]["v"][1]))
    return 34, edges


# The Tutte fragment (Tutte 1946, "On Hamiltonian circuits"): the
# 15-vertex cubic piece with three contact vertices (0 = apex contact,
# 1 and 2 = lateral contacts, each of internal degree 2) through which
# no Hamiltonian path can route both laterally and through the apex.
# Labeling derived independently here by decomposing the published
# figure (apex contact first, laterals next, interior breadth-first).
_TUTTE_FRAGMENT = [
    (0, 4), (0, 5), (1, 3), (1, 11), (2, 3), (2, 14), (3, 12), (4, 6),
    (4, 11), (5, 6), (5, 9), (6, 7), (7, 8), (7, 10), (8, 9), (8, 13),
    (9, 14), (10, 11), (10, 12), (12, 13), (13, 14),
]


def _tutte():
    # Tutte graph (46, 69, cubic, planar, 3-connected,
    # non-hamiltonian): three Tutte fragments; a central apex joined
    # to each fragment's apex contact; lateral contacts joined
    # cyclically (fragment k's contact 1 to fragment k+1's contact 2).
    edges = []
    for k in range(3):
        off = 15 * k
        edges += [(a + off, b + off) for a, b in _TUTTE_FRAGMENT]
    apex = 45
    for k in range(3):
        edges.append((apex, 15 * k))
        edges.append((15 * k + 1, ((k + 1) % 3) * 15 + 2))
    return 46, edges


def _smallestcyclicgroup():
    # A smallest nontrivial graph with cyclic automorphism group
    # (|Aut| = Z3; 9 vertices, 15 edges): a chiral tri-gadget —
    # triangle t0 t1 t2; for each i (mod 3) a_i ~ t_i, t_{i+1} and
    # b_i ~ a_i, t_{i+1}. The asymmetric (a, b) attachment breaks
    # every reflection, leaving exactly the rotation.
    edges = []
    for i in range(3):
        j = (i + 1) % 3
        edges += [(i, j), (3 + i, i), (3 + i, j), (6 + i, 3 + i),
                  (6 + i, j)]
    return 9, edges


def _noperfectmatching():
    # A connected graph with no perfect matching (16, 27): a center
    # vertex joined to three 5-vertex gadgets (K4 plus an attachment
    # vertex adjacent to two K4 vertices and to the center). Removing
    # the center leaves three odd components, so by Tutte's theorem
    # no perfect matching exists.
    edges = []
    for k in range(3):
        b = 1 + 5 * k
        q = [b, b + 1, b + 2, b + 3]
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((q[i], q[j]))
        t = b + 4
        edges += [(t, q[0]), (t, q[1]), (t, 0)]
    return 16, edges


# Beineke's nine minimal non-line graphs (Beineke 1970): G is a line
# graph iff it contains none of these as a vertex-induced subgraph.
# DERIVED from first principles by tests/test_famous_residue.py's
# exhaustive search: enumerate all connected graphs on <= 6 vertices,
# keep those that are not line graphs (no Krausz clique partition with
# every vertex in <= 2 cliques) but whose every one-vertex-deleted
# induced subgraph IS a line graph; exactly nine survive, matching the
# published theorem. Lists below are the search's lexicographic
# canonical forms, ordered by (order, canonical code).
#
# DOCUMENTED DEVIATION from the reference's igraph_i_famous_nonline
# (structure_generators.c:1849): the reference's second component
# contains an induced K_{1,3} (deleting its degree-4 vertex leaves a
# claw), so it is NOT minimal, and the true ninth minimal graph
# (K4 plus two adjacent subdivision vertices, 5 vertices / 7 edges) is
# absent there. The engine encodes the mathematically correct minimal
# set; the disjoint union still has 50 vertices (the reference's
# stated invariant) with 73 edges (reference: 72).
_BEINEKE = [
    (4, [(0, 1), (0, 2), (0, 3)]),
    (5, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 4), (3, 4)]),
    (5, [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 4),
         (2, 3), (2, 4)]),
    (6, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 4), (3, 5)]),
    (6, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 4), (3, 5),
         (4, 5)]),
    (6, [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 4),
         (2, 3), (4, 5)]),
    (6, [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 5),
         (2, 4), (3, 5)]),
    (6, [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 2), (1, 3),
         (1, 4), (1, 5), (2, 3), (4, 5)]),
    (6, [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 2), (1, 3),
         (2, 4), (3, 5), (4, 5)]),
]


def _nonline():
    # Disjoint union of Beineke's nine minimal non-line graphs.
    edges = []
    off = 0
    for n, e in _BEINEKE:
        edges += [(a + off, b + off) for a, b in e]
        off += n
    return off, edges


def _walther():
    """Walther's graph (H. Walther 1969, "Über die Nichtexistenz eines
    Knotenpunktes, durch den alle längsten Wege eines Graphen gehen";
    structure_generators.c:1915 'Walther'): the planar bipartite
    25-vertex / 31-edge IDENTITY graph (|Aut| = 1) in which no vertex
    lies on every longest path — the published counterexample the graph
    is named for. Encoded as the adjacency of the published drawing;
    derivation verified at dev time by exhaustive check of the defining
    properties (tests/test_famous_residue.py re-runs them: connected,
    bipartite, trivial automorphism group via the stabilizer chain, and
    the 138 longest paths — 21 vertices each — having EMPTY common
    intersection)."""
    adj = {
        0: [1], 1: [2, 8], 2: [3, 13], 3: [4, 16], 4: [5],
        5: [6, 19], 6: [7, 20], 7: [21], 8: [9, 13], 9: [10, 22],
        10: [11, 20], 11: [12], 13: [14], 14: [15, 23], 15: [16, 17],
        17: [18], 18: [19, 24], 20: [24], 22: [23], 23: [24],
    }
    edges = [(a, b) for a, nbrs in adj.items() for b in nbrs]
    return 25, edges


# The reference's igraph_i_famous_nonline component set, exposed under
# a SEPARATE name for reference-parity comparisons (ADVICE round-4:
# consumers diffing against igraph's famous("nonline") need the
# reference-compatible edge set even though it is mathematically
# non-minimal — see the _BEINEKE deviation note above). Each component
# is built from a structural recipe (cliques / pendants / strips), not
# a transcribed array; vertex labels follow the reference's published
# output order (structure_generators.c:1849), which IS the behavioral
# contract being mirrored.
def _nonline_reference():
    edges = []

    def clique(vs):
        edges.extend((a, b) for i, a in enumerate(vs) for b in vs[i + 1:])

    # 1. claw K_{1,3}
    edges += [(0, 1), (0, 2), (0, 3)]
    # 2. diamond (K4 minus an edge) + pendant at a degree-3 vertex —
    #    the non-minimal component (contains an induced claw at 7)
    clique([4, 6, 7])
    clique([5, 6, 7])
    edges.append((7, 8))
    # 3. K5 minus an edge
    clique([9, 11, 12, 13])
    clique([10, 11, 12, 13])
    # 4. diamond + pendants at both degree-2 vertices
    clique([15, 16, 17])
    clique([16, 17, 18])
    edges += [(14, 15), (18, 19)]
    # 5. K4 + a vertex on two of its corners + a pendant
    clique([20, 21, 22, 23])
    edges += [(21, 24), (22, 24), (24, 25)]
    # 6. two K4s sharing an edge
    clique([26, 27, 28, 29])
    clique([27, 28, 30, 31])
    # 7. diamond + a 3-path joining its degree-2 corners
    clique([32, 34, 35])
    clique([33, 34, 35])
    edges += [(32, 36), (36, 37), (33, 37)]
    # 8. wheel W5 (hub 39 on the 5-cycle 38-40-41-42-43)
    edges += [(38, 39), (39, 40), (39, 41), (39, 42), (39, 43),
              (38, 40), (40, 41), (41, 42), (42, 43), (38, 43)]
    # 9. strip of four stacked triangles
    for a in (44, 45, 46, 47):
        clique([a, a + 1, a + 2])
    seen = set()
    out = []
    for a, b in edges:
        k = (min(a, b), max(a, b))
        if k not in seen:
            seen.add(k)
            out.append(k)
    return 50, out


FAMOUS["walther"] = _walther
FAMOUS["nonline_reference"] = _nonline_reference
FAMOUS["coxeter"] = _coxeter
FAMOUS["robertson"] = _robertson
FAMOUS["meredith"] = _meredith
FAMOUS["thomassen"] = _thomassen
FAMOUS["tutte"] = _tutte
FAMOUS["smallestcyclicgroup"] = _smallestcyclicgroup
FAMOUS["noperfectmatching"] = _noperfectmatching
FAMOUS["nonline"] = _nonline
