"""Distribution statistics over document/score columns.

``exact_quantiles``: exact discrete quantiles of an integer (or
integer-quantized) column, computed as a per-batch value-count
pre-aggregation followed by ONE small groupby — the engine's standard
partial-aggregate shape (SURVEY.md §4.2). The full dataset is never
sorted and never leaves the workers; only the (value, count)
histogram does, whose size is the column's distinct-value count (a
quantized score column at 100 TB still has a bounded value domain —
that boundedness is the op's documented contract; for genuinely
continuous columns quantize first, exactly like the engine's e6
float-reporting rule).

Quantile definition (deterministic, matches the SQL oracle
definitionally): for sorted values v_0..v_{n-1}, quantile(q) =
v_{floor(q * (n-1))} — the lower discrete quantile.

``quantile_threshold_filter``: the pipeline-facing composition — a
percentile cutoff (e.g. "drop the bottom quartile by quality score")
computed from the histogram, then one broadcast-scalar filter pass.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _histogram(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    def _pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or col not in b.column_names:
            return pa.table({col: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = (pa.table({col: pc.cast(b[col], pa.int64())})
             .group_by([col]).aggregate([(col, "count")]))
        return pa.table({col: g[col], "n": pc.cast(g[f"{col}_count"],
                                                   pa.int64())})

    from ray.data.aggregate import Sum

    return (ds.map_batches(_pre, batch_format="pyarrow", batch_size=None)
            .groupby(col).aggregate(Sum("n")))


def exact_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: Sequence[float],
) -> pa.Table:
    """(q, value) rows — the exact lower discrete quantiles of ``col``."""
    hist = _histogram(ds, col)

    @ray.remote
    def _solve(refs, qlist) -> pa.Table:
        parts = [t for t in ray.get(list(refs))
                 if t.num_rows > 0 and col in t.column_names]
        if not parts:
            return pa.table({"q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.int64())})
        h = pa.concat_tables(parts)
        v = h[col].to_numpy(zero_copy_only=False)
        n_ = pc.cast(h["sum(n)"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, n_ = v[order], n_[order]
        cum = np.cumsum(n_)
        total = int(cum[-1])
        targets = np.floor(np.asarray(qlist) * (total - 1)).astype(np.int64)
        pos = np.searchsorted(cum, targets, side="right")
        return pa.table({"q": pa.array(np.asarray(qlist, np.float64)),
                         "value": pa.array(v[pos], pa.int64())})

    return ray.get(_solve.remote(
        hist.materialize().to_arrow_refs(), list(qs)))


def quantile_threshold_filter(
    ds: ray.data.Dataset,
    col: str,
    q: float,
    keep: str = "ge",
    out_cols: List[str] = None,
) -> ray.data.Dataset:
    """Rows of ``ds`` whose ``col`` is >= (keep="ge") or < (keep="lt")
    the exact q-quantile — the percentile-cutoff curation primitive."""
    thr = int(exact_quantiles(ds, col, [q])["value"][0].as_py())
    cols = out_cols

    def _f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or col not in b.column_names:
            names = cols or [col]
            return pa.table({c: pa.array([], pa.int64()) for c in names})
        c = pc.cast(b[col], pa.int64())
        mask = pc.greater_equal(c, thr) if keep == "ge" else pc.less(c, thr)
        out = b.filter(mask)
        return out.select(cols) if cols else out

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=None)
