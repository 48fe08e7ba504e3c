"""Power-law fit — igraph_power_law_fit (reference:
/root/reference/src/other.c:246, Clauset–Shalizi–Newman, SIAM Review
51(4):661-703).

Contract matched: fit P(X=x) ∝ x^-alpha to a sample (typically a
degree sequence); with ``xmin`` given, alpha is the maximum-likelihood
estimate over the tail x >= xmin; with ``xmin=None``, every distinct
sample value is tried as the threshold and the one minimizing the
Kolmogorov–Smirnov distance between the empirical tail CDF and the
fitted CDF wins (CSN §3.3).

Estimator note (documented deviation): the reference's bundled plfit
runs an L-BFGS zeta-MLE for discrete samples; this engine uses the
paper's own closed-form discrete approximation
``alpha = 1 + n / Σ ln(x_i / (xmin - 1/2))`` (CSN eq. 3.7, accurate to
O(xmin^-2)) and the exact continuous MLE
``alpha = 1 + n / Σ ln(x_i / xmin)`` (eq. 3.1) — both pure histogram
algebra, no iterative optimizer. The KS sweep uses the fitted
continuous/discrete-approx CDF ``1 - (x / xmin)^(1-alpha)`` (with the
-1/2 shift in the discrete case), the form CSN recommend for the
scan.

Distributed shape: ONE groupby builds the (value, count) histogram —
the engine's standard partial-aggregate pattern; the xmin sweep is
vectorized numpy over the histogram in a single task (V distinct
values → O(V²) flops on arrays of length V, trivial next to the data
pass). KS distances are e9-quantized BEFORE the argmin on BOTH the
engine and SQL-oracle sides so threshold selection is integer-robust.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.ops.stats import _histogram


def _fit_from_hist(v: np.ndarray, c: np.ndarray, xmin: Optional[float],
                   discrete: bool):
    """(xmin, alpha, ks, n_tail) from a sorted value/count histogram."""
    order = np.argsort(v)
    v, c = v[order].astype(np.float64), c[order].astype(np.float64)
    # suffix sums over the histogram
    n_ge = np.cumsum(c[::-1])[::-1]                     # Σ counts, x >= v_k
    lx = np.log(v)
    slog_ge = np.cumsum((c * lx)[::-1])[::-1]           # Σ c·ln x, x >= v_k

    def stats_for(k: int):
        xm = v[k]
        n = n_ge[k]
        if n < 2 or xm <= (0.5 if discrete else 0.0):
            return None
        shift = xm - 0.5 if discrete else xm
        denom = slog_ge[k] - n * np.log(shift)
        if denom <= 0:
            return None
        alpha = 1.0 + n / denom
        # KS over tail values: empirical CDF at v_j (right-continuous,
        # P(X <= v_j)) vs fitted
        tail_v = v[k:]
        tail_c = c[k:]
        emp_le = np.cumsum(tail_c) / n
        emp_lt = emp_le - tail_c / n
        fit = 1.0 - ((tail_v / shift) if discrete
                     else (tail_v / xm)) ** (1.0 - alpha)
        ks = float(np.max(np.maximum(np.abs(emp_le - fit),
                                     np.abs(emp_lt - fit))))
        return xm, alpha, ks, int(n)

    if xmin is not None:
        ks_ = np.searchsorted(v, xmin, side="left")
        if ks_ >= len(v):
            raise ValueError("xmin beyond the largest sample")
        r = stats_for(ks_)
        if r is None:
            raise ValueError("tail too small for an MLE fit")
        return r
    best = None
    for k in range(len(v)):
        r = stats_for(k)
        if r is None:
            continue
        key = (int(round(r[2] * 1e9)), r[0])  # e9-quantized KS, then xmin
        if best is None or key < best[0]:
            best = (key, r)
    if best is None:
        raise ValueError("no viable xmin candidate")
    return best[1]


def power_law_fit(
    values: ray.data.Dataset,
    col: str = "deg",
    xmin: Optional[float] = None,
    discrete: bool = True,
    drop_zeros: bool = True,
) -> pa.Table:
    """One-row table (xmin, alpha_e6, ks_e9, n_tail) — the CSN fit of
    the value column. Zero values are dropped by default (a power law
    is defined on positive support; igraph's plfit does the same for
    degree-0 vertices when xmin >= 1 is chosen)."""
    hist = _histogram(values, col)

    @ray.remote
    def _solve(refs):
        parts = [t for t in ray.get(list(refs))
                 if t.num_rows > 0 and col in t.column_names]
        if not parts:
            raise ValueError("empty sample")
        h = pa.concat_tables(parts)
        v = h[col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = h["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
        if drop_zeros:
            keep = v > 0
            v, c = v[keep], c[keep]
        xm, alpha, ks, n = _fit_from_hist(v, c, xmin, discrete)
        return pa.table({
            "xmin": pa.array([int(xm)], pa.int64()),
            "alpha_e6": pa.array([int(round(alpha * 1e6))], pa.int64()),
            "ks_e9": pa.array([int(round(ks * 1e9))], pa.int64()),
            "n_tail": pa.array([n], pa.int64())})

    return ray.get(_solve.remote(hist.materialize().to_arrow_refs()))
