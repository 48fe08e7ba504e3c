"""Independent single-process reference implementations used as golden
oracles (python-igraph is not installable in this environment; these
implement the exact reference semantics pinned in SURVEY.md §2.2 and are
deliberately written row-wise / dict-based so they share no code with the
engine's vectorized kernels)."""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np


def pagerank_ref(n, src, dst, weight=None, d=0.85, tol=1e-12, max_iter=1000, fixed=None):
    """igraph ARPACK-kernel power iteration (centrality.c:913-973):
    loops excluded from degrees and messages, dangling mass to teleport."""
    nl = src != dst
    s, t = src[nl], dst[nl]
    w = np.maximum(weight[nl], 0.0) if weight is not None else np.ones(len(s))
    deg = np.zeros(n)
    np.add.at(deg, s, w)
    pr = np.full(n, 1.0 / n)
    iters = fixed if fixed is not None else max_iter
    for k in range(iters):
        D = pr[deg == 0].sum()
        base = ((1 - d) + d * D) / n
        msg = np.zeros(n)
        np.add.at(msg, t, pr[s] * w / np.where(deg[s] > 0, deg[s], 1.0))
        new = base + d * msg
        resid = np.abs(new - pr).sum()
        pr = new
        if fixed is None and resid < tol:
            break
    return pr / pr.sum()


def components_ref(n, src, dst):
    """BFS weak components; label = rank of component's min vertex id
    (components.c:120-146)."""
    adj = defaultdict(list)
    for a, b in zip(src, dst):
        if a != b:
            adj[a].append(b)
            adj[b].append(a)
    label = -np.ones(n, dtype=np.int64)
    comp = 0
    for seed in range(n):
        if label[seed] >= 0:
            continue
        q = deque([seed])
        label[seed] = comp
        while q:
            u = q.popleft()
            for v in adj[u]:
                if label[v] < 0:
                    label[v] = comp
                    q.append(v)
        comp += 1
    return label


def lpa_sync_ref(n, src, dst, weight=None, max_iter=50, fixed=None):
    """Synchronous LPA, smallest-label tie-break, canonicalized by first
    appearance in vertex order (community.c:2323-2342)."""
    adj = defaultdict(list)
    for i, (a, b) in enumerate(zip(src, dst)):
        if a == b:
            continue
        w = float(weight[i]) if weight is not None else 1.0
        adj[a].append((b, w))
        adj[b].append((a, w))
    label = np.arange(n, dtype=np.int64)
    iters = fixed if fixed is not None else max_iter
    for _ in range(iters):
        new = label.copy()
        changed = False
        for v in range(n):
            if not adj[v]:
                continue
            tally = defaultdict(float)
            for u, w in adj[v]:
                tally[label[u]] += w
            best = min((l for l in tally if tally[l] == max(tally.values())))
            if best != label[v]:
                changed = True
            new[v] = best
        label = new
        if fixed is None and not changed:
            break
    return canonical_partition(label)


def canonical_partition(label):
    """Renumber labels in order of first appearance scanning vertex ids
    ascending (community.c:2323-2342)."""
    out = np.empty(len(label), dtype=np.int64)
    seen = {}
    for v, l in enumerate(label):
        if l not in seen:
            seen[l] = len(seen)
        out[v] = seen[l]
    return out


def triangles_ref(n, src, dst):
    """Brute-force per-vertex triangle participation counts on the
    simplified undirected graph (triangles.c:535-546)."""
    nbr = defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            nbr[a].add(b)
            nbr[b].add(a)
    count = np.zeros(n, dtype=np.int64)
    for v in range(n):
        ns = sorted(x for x in nbr[v] if x > v)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if ns[j] in nbr[ns[i]]:
                    count[v] += 1
                    count[ns[i]] += 1
                    count[ns[j]] += 1
    return count


def modularity_ref(n, src, dst, membership, weight=None):
    """igraph modularity (community.c:875-941): Q = Σ_c e_c/m − (a_c/2m)²
    over the undirected simple interpretation fed to it."""
    w = weight if weight is not None else np.ones(len(src))
    m = w.sum()
    e = defaultdict(float)
    a = defaultdict(float)
    for s, t, ww in zip(src, dst, w):
        cs, ct = membership[s], membership[t]
        if cs == ct:
            e[cs] += ww
        a[cs] += ww
        a[ct] += ww
    return sum(e[c] / m - (a[c] / (2 * m)) ** 2 for c in a)


def scc_ref(n, src, dst):
    """Strong components oracle: iterative Tarjan (explicit stack), labels
    canonicalized to rank-of-min-vertex — matches
    strongly_connected_components(densify=True)."""
    import numpy as np

    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        if s != d:
            adj[int(s)].append(int(d))
    index = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    stack = []
    comp = [-1] * n
    counter = [0]
    ncomp = [0]

    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp[w] = ncomp[0]
                    if w == v:
                        break
                ncomp[0] += 1
            work.pop()
            if work:
                pv, _ = work[-1]
                low[pv] = min(low[pv], low[v])
    # canonicalize: label = rank of the min vertex of each component
    comp = np.array(comp)
    mins = np.full(ncomp[0], n, dtype=np.int64)
    np.minimum.at(mins, comp, np.arange(n))
    order = np.argsort(mins)
    rank = np.empty(ncomp[0], dtype=np.int64)
    rank[order] = np.arange(ncomp[0])
    return rank[comp]


def bfs_hops_ref(n, src, dst, source, weight=None):
    """Dijkstra/BFS distances from source; dict vertex->dist (reached only)."""
    import heapq

    adj = [[] for _ in range(n)]
    for i, (s, d) in enumerate(zip(src, dst)):
        w = 1 if weight is None else weight[i]
        adj[int(s)].append((int(d), w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        dd, v = heapq.heappop(pq)
        if dd > dist.get(v, float("inf")):
            continue
        for (u, w) in adj[v]:
            nd = dd + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    return dist


def coreness_ref(n, src, dst):
    """Exact coreness by bucket peeling on the symmetrized multigraph view
    (loops dropped, multi-edges with multiplicity) — cores.c:31 semantics."""
    import numpy as np

    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        s, d = int(s), int(d)
        if s != d:
            adj[s].append(d)
            adj[d].append(s)
    deg = np.array([len(a) for a in adj])
    core = deg.copy()
    import heapq

    pq = [(deg[v], v) for v in range(n)]
    heapq.heapify(pq)
    removed = [False] * n
    k = 0
    while pq:
        dv, v = heapq.heappop(pq)
        if removed[v] or dv > core[v]:
            continue
        k = max(k, core[v])
        core[v] = k
        removed[v] = True
        for u in adj[v]:
            if not removed[u]:
                core[u] -= 1
                heapq.heappush(pq, (core[u], u))
    return core
