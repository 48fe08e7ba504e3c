"""Geometric random sampling — the engine's counterpart of the
reference's igraph_sample_sphere_surface / igraph_sample_sphere_volume
/ igraph_sample_dirichlet (random.c; used by the dot-product game
family). The reference draws from its seeded C RNG; the engine's
draws are the repo's deterministic 15-hex md5 folds so every sample is
a pure function of (seed, index) and SQL-replayable:

- uniform: u(key) = (fold15(md5(key)) + 0.5) / 16^15  (open (0,1))
- gaussian (Box-Muller, cosine branch):
  g = sqrt(-2 ln u("{seed}:g:{i}:{a}:1")) * cos(2*pi*u("{seed}:g:{i}:{a}:2"))
- sphere surface point i: x_a = radius * g_a / ||g||
  (Muller-Marsaglia normalization — the reference's method too);
  ``positive`` folds to the positive orthant with abs().
- sphere volume: surface point scaled by radius * u("{seed}:r:{i}")^(1/d).
- Dirichlet with INTEGER concentration alpha_j: the Erlang sum
  y_j = sum_{k < alpha_j} -ln u("{seed}:d:{i}:{j}:{k}"), x = y / sum(y)
  (gamma(alpha) for integer alpha; the general real-alpha rejection
  sampler is not SQL-replayable and is out of contract).

Each generator is one vectorized map_batches over ray.data.range(n) —
rows are independent, so generation scales embarrassingly."""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pyarrow as pa
import ray.data

HEX15 = 16 ** 15


def _unit(keys) -> np.ndarray:
    out = np.empty(len(keys), dtype=np.float64)
    for i, k in enumerate(keys):
        out[i] = (int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
                  + 0.5) / HEX15
    return out


def _gauss(seed: str, ids: np.ndarray, axis: int) -> np.ndarray:
    u1 = _unit([f"{seed}:g:{i}:{axis}:1" for i in ids.tolist()])
    u2 = _unit([f"{seed}:g:{i}:{axis}:2" for i in ids.tolist()])
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def sample_sphere_surface(dim: int, n: int, radius: float = 1.0,
                          positive: bool = False,
                          seed: str = "sph") -> ray.data.Dataset:
    """(i, x0..x{dim-1}) points uniform on the (dim-1)-sphere."""
    def _gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        G = np.stack([_gauss(seed, ids, a) for a in range(dim)], 1)
        if positive:
            G = np.abs(G)
        P = radius * G / np.linalg.norm(G, axis=1, keepdims=True)
        cols = {"i": pa.array(ids)}
        for a in range(dim):
            cols[f"x{a}"] = pa.array(P[:, a])
        return pa.table(cols)

    return ray.data.range(n).map_batches(_gen, batch_format="pyarrow",
                                         batch_size=None)


def sample_sphere_volume(dim: int, n: int, radius: float = 1.0,
                         positive: bool = False,
                         seed: str = "sph") -> ray.data.Dataset:
    """(i, x0..x{dim-1}) points uniform in the dim-ball."""
    def _gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        G = np.stack([_gauss(seed, ids, a) for a in range(dim)], 1)
        if positive:
            G = np.abs(G)
        P = G / np.linalg.norm(G, axis=1, keepdims=True)
        r = _unit([f"{seed}:r:{i}" for i in ids.tolist()])
        P = P * (radius * r ** (1.0 / dim))[:, None]
        cols = {"i": pa.array(ids)}
        for a in range(dim):
            cols[f"x{a}"] = pa.array(P[:, a])
        return pa.table(cols)

    return ray.data.range(n).map_batches(_gen, batch_format="pyarrow",
                                         batch_size=None)


def sample_dirichlet(n: int, alpha: Sequence[int],
                     seed: str = "dir") -> ray.data.Dataset:
    """(i, x0..x{k-1}) Dirichlet(alpha) rows; integer alpha only (the
    Erlang-sum contract above)."""
    alpha = [int(a) for a in alpha]
    if any(a < 1 for a in alpha):
        raise ValueError("integer alpha >= 1 required")

    def _gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Y = np.zeros((len(ids), len(alpha)))
        for j, aj in enumerate(alpha):
            for k in range(aj):
                Y[:, j] -= np.log(_unit(
                    [f"{seed}:d:{i}:{j}:{k}" for i in ids.tolist()]))
        X = Y / Y.sum(axis=1, keepdims=True)
        cols = {"i": pa.array(ids)}
        for j in range(len(alpha)):
            cols[f"x{j}"] = pa.array(X[:, j])
        return pa.table(cols)

    return ray.data.range(n).map_batches(_gen, batch_format="pyarrow",
                                         batch_size=None)
