"""Geometric samplers (random.c counterparts) — distributional
properties of the deterministic md5 draws."""

import numpy as np
import pytest

from igraph_ray.sources.sampling import (sample_dirichlet,
                                         sample_sphere_surface,
                                         sample_sphere_volume)


def _mat(ds, k):
    df = ds.to_pandas().sort_values("i")
    return df[[f"x{a}" for a in range(k)]].to_numpy()


def test_surface_on_sphere_and_centered():
    P = _mat(sample_sphere_surface(3, 512), 3)
    norms = np.linalg.norm(P, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-12)
    assert np.abs(P.mean(axis=0)).max() < 0.1


def test_surface_positive_orthant():
    P = _mat(sample_sphere_surface(3, 64, positive=True), 3)
    assert (P >= 0).all()


def test_volume_radii_distribution():
    P = _mat(sample_sphere_volume(3, 512), 3)
    r = np.linalg.norm(P, axis=1)
    assert (r <= 1.0 + 1e-12).all()
    # uniform ball: r^3 ~ U(0,1)
    assert abs((r ** 3).mean() - 0.5) < 0.05
    assert abs(np.median(r ** 3) - 0.5) < 0.07


def test_volume_radius_scales():
    P = _mat(sample_sphere_volume(2, 128, radius=3.0), 2)
    r = np.linalg.norm(P, axis=1)
    assert r.max() <= 3.0 + 1e-9 and r.max() > 2.0


def test_dirichlet_rows_simplex_and_means():
    X = _mat(sample_dirichlet(1024, (1, 2, 3)), 3)
    assert np.allclose(X.sum(axis=1), 1.0, atol=1e-12)
    assert (X > 0).all()
    # E[x_j] = alpha_j / sum(alpha)
    assert np.abs(X.mean(axis=0) - np.array([1, 2, 3]) / 6.0).max() < 0.03


def test_dirichlet_alpha_guard():
    with pytest.raises(ValueError):
        sample_dirichlet(4, (1, 0))


def test_determinism():
    a = _mat(sample_sphere_surface(3, 32), 3)
    b = _mat(sample_sphere_surface(3, 32), 3)
    assert np.array_equal(a, b)
