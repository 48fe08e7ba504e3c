"""Deterministic edge-table derivations from the driver's TPC-H-ish
tables. The real input of the north star is a code corpus (repo, path,
commit, lang, content) — sources/corpus.py covers that path with exact
planted-edge tests. For the driver's SQL-oracle gate the graph must be
derivable in BOTH the engine and ANSI SQL from the same parquet, so the
edge table is a fixed arithmetic projection of `orders` (and `lineitem`
for the second edge set): dense pseudo-random digraphs over V=512
vertices with loops removed and duplicates collapsed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.ops.relational import _dedup

V = 512

# SQL fragments shared by every oracle query (kept in lockstep with the
# engine derivations below)
SQL_EDGES_A = (
    f"SELECT DISTINCT (o_orderkey % {V}) AS src, ((o_custkey * 7) % {V}) AS dst "
    f"FROM orders WHERE (o_orderkey % {V}) != ((o_custkey * 7) % {V})"
)
SQL_EDGES_B = (
    f"SELECT DISTINCT (l_orderkey % {V}) AS src, ((l_partkey * 3) % {V}) AS dst "
    f"FROM lineitem WHERE (l_orderkey % {V}) != ((l_partkey * 3) % {V})"
)
# multigraph variant (keeps duplicates) for multiplicity/simplify queries
SQL_EDGES_MULTI = (
    f"SELECT (o_orderkey % {V}) AS src, ((o_custkey * 7) % {V}) AS dst FROM orders"
)
SQL_VERTS_A = (
    f"SELECT src AS v FROM ({SQL_EDGES_A}) UNION SELECT dst FROM ({SQL_EDGES_A})"
)


def edges_a(sf_dir: str) -> ray.data.Dataset:
    """Distinct loop-free digraph from orders: src=o_orderkey%V,
    dst=(o_custkey*7)%V."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def _derive(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        src = (ok % V).astype(np.int64)
        dst = (ck * 7 % V).astype(np.int64)
        keep = src != dst
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    return _dedup(orders.map_batches(_derive, batch_format="pyarrow", batch_size=None))


def edges_a_multi(sf_dir: str) -> ray.data.Dataset:
    """Same derivation but keeping loops and duplicates (multigraph)."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def _derive(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": pa.array((ok % V).astype(np.int64)),
             "dst": pa.array((ck * 7 % V).astype(np.int64))}
        )

    return orders.map_batches(_derive, batch_format="pyarrow", batch_size=None)


def edges_b(sf_dir: str) -> ray.data.Dataset:
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def _derive(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        src = (ok % V).astype(np.int64)
        dst = (pk * 3 % V).astype(np.int64)
        keep = src != dst
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    return _dedup(li.map_batches(_derive, batch_format="pyarrow", batch_size=None))


def graph_a(sf_dir: str) -> Graph:
    return Graph(edges_a(sf_dir).materialize(), n=None)


# thinned variant of edges_a for clique enumeration: graph_a at sf>=0.01
# is dense enough that the DuckDB clique-CTE oracle blows up; keeping one
# in five source rows (deterministic arithmetic filter) keeps the oracle
# tractable while still planting triangles and K4s
SQL_EDGES_SPARSE = (
    f"SELECT DISTINCT (o_orderkey % {V}) AS src, ((o_custkey * 7) % {V}) AS dst "
    f"FROM orders WHERE (o_orderkey % {V}) != ((o_custkey * 7) % {V}) "
    f"AND ((o_orderkey * 13 + o_custkey) % 5) = 0"
)


def edges_sparse(sf_dir: str) -> ray.data.Dataset:
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def _derive(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        src = (ok % V).astype(np.int64)
        dst = (ck * 7 % V).astype(np.int64)
        keep = (src != dst) & ((ok * 13 + ck) % 5 == 0)
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    return _dedup(orders.map_batches(_derive, batch_format="pyarrow", batch_size=None))


def graph_sparse(sf_dir: str) -> Graph:
    return Graph(edges_sparse(sf_dir).materialize(), n=None)


SQL_EDGES_VSPARSE = (
    f"SELECT DISTINCT (o_orderkey % {V}) AS src, ((o_custkey * 7) % {V}) AS dst "
    f"FROM orders WHERE (o_orderkey % {V}) != ((o_custkey * 7) % {V}) "
    f"AND (o_orderkey * 13 + o_custkey) % 50 = 0"
)


def edges_vsparse(sf_dir: str) -> ray.data.Dataset:
    """~2% of the dense rule — average degree ~1 at sf0.01, so the graph
    is forest-like with many bridges / small 2-edge-connected blocks
    (used by the bridges / two_ecc queries, which are vacuous on the
    2-edge-connected dense graph). Kept in lockstep with
    SQL_EDGES_VSPARSE."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def _derive(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        src = (ok % V).astype(np.int64)
        dst = (ck * 7 % V).astype(np.int64)
        keep = (src != dst) & ((ok * 13 + ck) % 50 == 0)
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    return _dedup(orders.map_batches(_derive, batch_format="pyarrow", batch_size=None))


def graph_vsparse(sf_dir: str) -> Graph:
    return Graph(edges_vsparse(sf_dir).materialize(), n=None)


# weighted variant of edges_a: per distinct (src,dst) the MIN of the
# deterministic per-row weight (o_orderkey % 10) + 1 — same multigraph
# weight rule the strength query uses, collapsed for simple-graph algos
SQL_EDGES_A_W = (
    f"SELECT src, dst, MIN(w) AS weight FROM ("
    f"SELECT (o_orderkey % {V}) AS src, ((o_custkey * 7) % {V}) AS dst, "
    f"(o_orderkey % 10) + 1 AS w FROM orders) "
    f"WHERE src != dst GROUP BY src, dst"
)


def edges_a_weighted(sf_dir: str) -> ray.data.Dataset:
    """edges_a with weight = MIN((o_orderkey % 10) + 1) per distinct
    loop-free (src,dst) — kept in lockstep with SQL_EDGES_A_W."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def _derive(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        src = (ok % V).astype(np.int64)
        dst = (ck * 7 % V).astype(np.int64)
        w = (ok % 10 + 1).astype(np.float64)
        keep = src != dst
        t = pa.table(
            {"src": pa.array(src[keep]), "dst": pa.array(dst[keep]),
             "weight": pa.array(w[keep])}
        )
        # per-batch pre-combine before the global min-groupby
        return pa.TableGroupBy(t, ["src", "dst"]).aggregate([("weight", "min")]) \
            .rename_columns(["src", "dst", "weight"])

    g = orders.map_batches(_derive, batch_format="pyarrow", batch_size=None) \
        .groupby(["src", "dst"]).min("weight")

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"], "dst": b["dst"], "weight": b["min(weight)"]})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def graph_a_weighted(sf_dir: str) -> Graph:
    return Graph(edges_a_weighted(sf_dir).materialize(), n=None, weighted=True)


# weighted undirected view of the SPARSE rule: per unordered pair the MIN
# of the deterministic per-row weight (o_orderkey % 10) + 1 — the input
# of the Barrat weighted-clustering query (triangle 3-way join stays
# affordable on the thinned graph)
SQL_UND_SPARSE_W = (
    f"SELECT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi, "
    f"MIN(w) AS weight FROM ("
    f"SELECT (o_orderkey % {V}) AS src, ((o_custkey * 7) % {V}) AS dst, "
    f"(o_orderkey % 10) + 1 AS w FROM orders "
    f"WHERE ((o_orderkey * 13 + o_custkey) % 5) = 0) "
    f"WHERE src != dst GROUP BY lo, hi"
)


def und_sparse_weighted(sf_dir: str) -> ray.data.Dataset:
    """(lo < hi, weight) weighted undirected simple view of edges_sparse —
    kept in lockstep with SQL_UND_SPARSE_W."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def _derive(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        src = (ok % V).astype(np.int64)
        dst = (ck * 7 % V).astype(np.int64)
        w = (ok % 10 + 1).astype(np.int64)
        keep = (src != dst) & ((ok * 13 + ck) % 5 == 0)
        t = pa.table(
            {"lo": pa.array(np.minimum(src[keep], dst[keep])),
             "hi": pa.array(np.maximum(src[keep], dst[keep])),
             "weight": pa.array(w[keep])}
        )
        return pa.TableGroupBy(t, ["lo", "hi"]).aggregate([("weight", "min")]) \
            .rename_columns(["lo", "hi", "weight"])

    g = orders.map_batches(_derive, batch_format="pyarrow", batch_size=None) \
        .groupby(["lo", "hi"]).min("weight")

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"lo": b["lo"], "hi": b["hi"], "weight": b["min(weight)"]})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


# weighted variant of the VSPARSE rule (same MIN-weight collapse as
# SQL_EDGES_A_W) — input of the weighted random-walk query
SQL_EDGES_VSPARSE_W = (
    f"SELECT src, dst, MIN(w) AS weight FROM ("
    f"SELECT (o_orderkey % {V}) AS src, ((o_custkey * 7) % {V}) AS dst, "
    f"(o_orderkey % 10) + 1 AS w FROM orders "
    f"WHERE (o_orderkey * 13 + o_custkey) % 50 = 0) "
    f"WHERE src != dst GROUP BY src, dst"
)


def edges_vsparse_weighted(sf_dir: str) -> ray.data.Dataset:
    """Very-sparse weighted digraph, lockstep with SQL_EDGES_VSPARSE_W."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def _derive(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        src = (ok % V).astype(np.int64)
        dst = (ck * 7 % V).astype(np.int64)
        w = (ok % 10 + 1).astype(np.int64)
        keep = (src != dst) & ((ok * 13 + ck) % 50 == 0)
        t = pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep]),
                      "weight": pa.array(w[keep])})
        return pa.TableGroupBy(t, ["src", "dst"]).aggregate([("weight", "min")]) \
            .rename_columns(["src", "dst", "weight"])

    g = orders.map_batches(_derive, batch_format="pyarrow", batch_size=None) \
        .groupby(["src", "dst"]).min("weight")

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "weight": b["min(weight)"]})

    return g.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def graph_vsparse_weighted(sf_dir: str) -> Graph:
    return Graph(edges_vsparse_weighted(sf_dir).materialize(), n=None,
                 weighted=True)
