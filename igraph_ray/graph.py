"""The Graph abstraction: an edge table + an implicit dense vertex universe.

Mirrors the *logical* data model of the reference (igraph's ``igraph_t`` is
two parallel columnar from/to arrays + CSR sort indexes,
include/igraph_datatype.h:78-88) re-expressed Ray-Data-first: the edge list
is a ``ray.data.Dataset`` with Arrow schema ``src:int64, dst:int64
[, weight:float64]``; vertices are dense integer ids. CSR indexes are built
on demand per range partition (csr.py) instead of globally
(type_indexededgelist.c:835-877).

All transforms are lazy Dataset ops; nothing here calls ``ray.init()``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _pa_batch(fn):
    """Wrap a pyarrow.Table -> pyarrow.Table fn for map_batches."""
    return fn


_CANONICAL_SMALL_ROWS = 1 << 24


@ray.remote
def _dedup_packed(*blocks: pa.Table) -> pa.Table:
    """Single-task exact dedup of pre-combined (lo, hi) blocks via one
    np.unique over (lo<<32)|hi packed keys (ids < 2^32, caller-guarded).
    Output sorted by (lo, hi) — deterministic."""
    tables = [b for b in blocks if b.num_rows and "lo" in b.column_names]
    if not tables:
        return pa.table({"lo": pa.array([], pa.int64()),
                         "hi": pa.array([], pa.int64())})
    lo = np.concatenate([t["lo"].to_numpy(zero_copy_only=False)
                         for t in tables]).astype(np.uint64)
    hi = np.concatenate([t["hi"].to_numpy(zero_copy_only=False)
                         for t in tables]).astype(np.uint64)
    keys = np.unique((lo << np.uint64(32)) | hi)
    return pa.table({
        "lo": pa.array((keys >> np.uint64(32)).astype(np.int64)),
        "hi": pa.array((keys & np.uint64(0xFFFFFFFF)).astype(np.int64))})


class Graph:
    """An edge-table graph over dense int64 vertex ids.

    Parameters
    ----------
    edges: Dataset with columns ``src:int64, dst:int64`` and optionally
        ``weight:float64``. Directed interpretation (like igraph's
        ``directed=True`` graphs); undirected algorithms symmetrize or
        canonicalize explicitly (igraph stores undirected edges once with
        from>=to, type_indexededgelist.c:279-287 — we derive equivalent
        views instead of mutating).
    n: vertex count. If None, the universe is the set of distinct endpoint
        ids actually present (computed lazily once).
    """

    def __init__(
        self,
        edges: ray.data.Dataset,
        n: Optional[int] = None,
        weighted: bool = False,
        attrs: Optional[dict] = None,
    ) -> None:
        self.edges = edges
        # graph-level attributes — the GAN/GAS surface (igraph's
        # attribute table, attributes.c GAN/GAS/SETGAN): small scalar/str
        # metadata carried by the graph object and through save()/load().
        self.attrs: dict = dict(attrs) if attrs else {}
        self._n = n
        # whether the user declared a dense 0..n-1 universe; num_vertices()
        # caches the distinct-endpoint count into _n for sparse graphs, so
        # "dense?" must NOT be inferred from `_n is not None` afterwards
        self._explicit_n = n is not None
        self.weighted = weighted
        self._vertices: Optional[ray.data.Dataset] = None  # materialized universe
        self._num_edges: Optional[int] = None
        self._csr_cache: dict = {}

    # ---------------- constructors ----------------

    @classmethod
    def from_parquet(cls, path: str, weighted: bool = False, n: Optional[int] = None) -> "Graph":
        cols = ["src", "dst"] + (["weight"] if weighted else [])
        return cls(ray.data.read_parquet(path, columns=cols), n=n, weighted=weighted)

    @classmethod
    def from_arrow(cls, table: pa.Table, n: Optional[int] = None, weighted: bool = False) -> "Graph":
        return cls(ray.data.from_arrow(table), n=n, weighted=weighted)

    def save(self, path: str) -> None:
        """Persist the graph: partitioned edge Parquet under ``path`` plus
        a ``_GRAPH.json`` carrying n/weighted/attrs — the conventional
        place for graph-level metadata to survive checkpoints (the GAN/GAS
        persistence gap flagged in round 1). Metadata is written LAST so a
        partial write is detectable (no _GRAPH.json = no graph)."""
        import json
        import os

        os.makedirs(os.path.join(path, "edges"), exist_ok=True)
        self.edges.write_parquet(os.path.join(path, "edges"))
        meta = {"n": self._n if self._explicit_n else None,
                "weighted": self.weighted, "attrs": self.attrs}
        tmp = os.path.join(path, "_GRAPH.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "_GRAPH.json"))

    @classmethod
    def load(cls, path: str) -> "Graph":
        """Inverse of save(): restores edges, n, weighted and attrs."""
        import json
        import os

        with open(os.path.join(path, "_GRAPH.json")) as f:
            meta = json.load(f)
        cols = ["src", "dst"] + (["weight"] if meta["weighted"] else [])
        edges = ray.data.read_parquet(os.path.join(path, "edges"), columns=cols)
        return cls(edges, n=meta["n"], weighted=meta["weighted"], attrs=meta["attrs"])

    @classmethod
    def from_numpy(
        cls, src: np.ndarray, dst: np.ndarray, weight: Optional[np.ndarray] = None, n: Optional[int] = None
    ) -> "Graph":
        cols = {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        if weight is not None:
            cols["weight"] = pa.array(weight, pa.float64())
        return cls.from_arrow(pa.table(cols), n=n, weighted=weight is not None)

    # ---------------- universe / counts ----------------

    def vertices(self) -> ray.data.Dataset:
        """Dataset of the vertex universe: one column ``vertex:int64``.

        With explicit ``n``: the dense range 0..n-1 (igraph's implicit
        vertex set, igraph_datatype.h:50). Otherwise: distinct endpoints.
        Materialized once and cached.
        """
        if self._vertices is None:
            if self._explicit_n:
                ds = ray.data.range(self._n).map_batches(
                    lambda b: pa.table({"vertex": pc.cast(b["id"], pa.int64())}),
                    batch_format="pyarrow",
                )
            else:
                ds = endpoint_universe(self.edges)
            self._vertices = ds.materialize()
        return self._vertices

    def num_vertices(self) -> int:
        if self._n is None:
            self._n = self.vertices().count()
        return self._n

    def num_edges(self) -> int:
        if self._num_edges is None:
            self._num_edges = self.edges.count()
        return self._num_edges

    # ---------------- derived edge views ----------------

    def without_loops(self) -> ray.data.Dataset:
        """Drop self-loops (igraph degree ``loops=0`` rule, pagerank kernel
        computes degrees with loops excluded — centrality.c:1414-1417)."""
        return self.edges.filter(expr="src != dst")

    def symmetrized(self, drop_loops: bool = True) -> ray.data.Dataset:
        """Both directions of every edge — the IGRAPH_ALL adjacency view
        (type_indexededgelist.c:788-820) used by components / LPA."""
        base = self.without_loops() if drop_loops else self.edges

        def _flip(b: pa.Table) -> pa.Table:
            cols = {"src": b["dst"], "dst": b["src"]}
            if "weight" in b.column_names:
                cols["weight"] = b["weight"]
            return pa.table(cols)

        return base.union(base.map_batches(_flip, batch_format="pyarrow", batch_size=None))

    def canonical_undirected(self) -> ray.data.Dataset:
        """Simple undirected edge set: ``lo=min(src,dst) < hi=max(src,dst)``,
        loops dropped, duplicates collapsed — igraph_simplify semantics
        (structural_properties.c:2248) + the undirected canonical form
        (type_indexededgelist.c:279-287). Exact dedup = per-batch
        combiner, then TWO physical plans (the triangles-style split):
        below ``_CANONICAL_SMALL_ROWS`` pre-deduped rows with ids <
        2^32, ONE task packs (lo<<32)|hi and np.uniques it — a
        sort-based groupby costs seconds of shuffle overhead for what
        is megabytes of keys; above the guard, hash-partition groupby
        + per-group first (the scale plan)."""

        def _canon(b: pa.Table) -> pa.Table:
            lo = pc.min_element_wise(b["src"], b["dst"])
            hi = pc.max_element_wise(b["src"], b["dst"])
            return pa.table({"lo": lo, "hi": hi})

        canon = self.without_loops().map_batches(_canon, batch_format="pyarrow", batch_size=None)
        # per-batch pre-dedup shrinks either plan's wide step
        # (combiner before the shuffle / the single dedup task)
        def _local_dedup(b: pa.Table) -> pa.Table:
            return b.group_by(["lo", "hi"]).aggregate([])

        pre = canon.map_batches(_local_dedup, batch_format="pyarrow",
                                batch_size=None).materialize()
        n_pre = pre.count()
        if 0 < n_pre <= _CANONICAL_SMALL_ROWS and int(pre.max("hi")) < 2**32:
            refs = pre.to_arrow_refs()
            return ray.data.from_arrow_refs(
                [_dedup_packed.remote(*refs)])
        return (
            pre.groupby(["lo", "hi"])
            .count()
            .select_columns(["lo", "hi"])
        )

    # ---------------- CSR index cache ----------------

    def csr_index(self, variant: str, num_partitions: int, weighted: bool = False,
                  clamp_negative: bool = True):
        """Range-partitioned CSR blocks for a derived edge view, built once
        per (variant, partitioning) and cached — the engine analogue of
        igraph's oi/os & ii/is indexes (igraph_datatype.h:54-70), except
        rebuilt per variant on demand instead of on every mutation.

        variants: "out" = directed, loops dropped (PageRank; negative
        weights clamped per centrality.c:1447-1462); "sym" = both
        directions, loops dropped (components / LPA IGRAPH_ALL view);
        "rev" = every edge flipped, loops dropped (the IGRAPH_IN adjacency
        view — backward reachability passes, e.g. strong components).
        """
        from igraph_ray.csr import build_csr_index

        key = (variant, num_partitions, weighted, clamp_negative)
        if key not in self._csr_cache:
            # all variants carry the in-index: PageRank's reduceat gather
            # and components' reduceat min-label gather rely on it
            with_in_index = True
            if variant == "out":
                edges = self.without_loops()
                # clamp is the PageRank/eigenvector contract
                # (centrality.c:1447-1462); min-plus shortest-path
                # consumers pass clamp_negative=False (Bellman-Ford
                # accepts negative weights, distances.c)
                if weighted and clamp_negative:
                    def _clamp(b: pa.Table) -> pa.Table:
                        w = pc.max_element_wise(pc.cast(b["weight"], pa.float64()), 0.0)
                        return pa.table({"src": b["src"], "dst": b["dst"], "weight": w})
                    edges = edges.map_batches(_clamp, batch_format="pyarrow", batch_size=None)
            elif variant == "rev":
                def _flip(b: pa.Table) -> pa.Table:
                    cols = {"src": b["dst"], "dst": b["src"]}
                    if "weight" in b.column_names:
                        cols["weight"] = b["weight"]
                    return pa.table(cols)

                edges = self.without_loops().map_batches(
                    _flip, batch_format="pyarrow", batch_size=None
                )
            elif variant == "matrix":
                # generic-operator view (igraph_eigen_* plumbing,
                # algorithms/eigen.py): the edge table verbatim — loops
                # kept (matrix diagonal), weights unclamped
                edges = self.edges
            elif variant == "sym":
                if not weighted:
                    # derive from the out index: per-partition flip+merge of
                    # the existing blocks (a P x P in-index exchange)
                    # instead of a second full sort-shuffle. Weighted sym
                    # must NOT inherit the out variant's negative-weight
                    # clamp, so it still builds directly.
                    from igraph_ray.csr import derive_sym_index

                    out_idx = self.csr_index("out", num_partitions, weighted=False)
                    self._csr_cache[key] = derive_sym_index(out_idx, weighted=False)
                    return self._csr_cache[key]
                edges = self.symmetrized(drop_loops=True)
            else:
                raise ValueError(f"unknown CSR variant {variant!r}")
            self._csr_cache[key] = build_csr_index(
                edges, num_partitions, weighted=weighted, with_in_index=with_in_index
            )
        return self._csr_cache[key]

    # ---------------- degrees ----------------

    def out_degrees(self, drop_loops: bool = True) -> ray.data.Dataset:
        """``(vertex, deg)`` for every vertex in the universe (0 for sinks).

        deg = out-degree count, or sum of out-edge weights when weighted
        (igraph_strength, structural_properties.c:5970). Self-loops excluded
        by default (the pagerank degree rule, centrality.c:1414-1417).
        Join-free: union the universe with per-src partial sums, then one
        groupby — the partial-aggregate-before-shuffle pattern.
        """
        edges = self.without_loops() if drop_loops else self.edges
        return _degrees_over(edges, "src", self.vertices(), self.weighted)

    def in_degrees(self, drop_loops: bool = True) -> ray.data.Dataset:
        edges = self.without_loops() if drop_loops else self.edges
        return _degrees_over(edges, "dst", self.vertices(), self.weighted)


def endpoint_universe(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct vertex ids appearing as src or dst → column ``vertex``."""

    def _src(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["src"].combine_chunks().unique()})

    def _dst(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["dst"].combine_chunks().unique()})

    both = edges.map_batches(_src, batch_format="pyarrow", batch_size=None).union(
        edges.map_batches(_dst, batch_format="pyarrow", batch_size=None)
    )
    return both.groupby("vertex").count().select_columns(["vertex"])


def _degrees_over(
    edges: ray.data.Dataset,
    key: str,
    universe: ray.data.Dataset,
    weighted: bool,
) -> ray.data.Dataset:
    def _partial(b: pa.Table) -> pa.Table:
        if weighted:
            g = pa.table({"vertex": b[key], "deg": pc.cast(b["weight"], pa.float64())})
            g = g.group_by("vertex").aggregate([("deg", "sum")])
            return pa.table({"vertex": g["vertex"], "deg": g["deg_sum"]})
        g = b.group_by(key).aggregate([([key], "count")])
        return pa.table(
            {"vertex": g[key], "deg": pc.cast(g[f"{key}_count"], pa.float64())}
        )

    def _zeros(b: pa.Table) -> pa.Table:
        return pa.table(
            {"vertex": b["vertex"], "deg": pa.array(np.zeros(b.num_rows), pa.float64())}
        )

    partials = edges.map_batches(_partial, batch_format="pyarrow", batch_size=None).union(
        universe.map_batches(_zeros, batch_format="pyarrow", batch_size=None)
    )
    g = partials.groupby("vertex").sum("deg")

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["vertex"], "deg": b["sum(deg)"]})

    return g.map_batches(_rename, batch_format="pyarrow", batch_size=None)
