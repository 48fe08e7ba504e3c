"""CSN power-law fit vs hand algebra and planted samples."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.algorithms.plfit import _fit_from_hist, power_law_fit


def _ds(vals, parts=4):
    return ray.data.from_arrow(pa.table(
        {"deg": pa.array(np.asarray(vals, np.int64))})).repartition(parts)


def test_alpha_closed_form_fixed_xmin():
    vals = np.array([1, 1, 2, 3, 5, 8, 13], np.int64)
    got = power_law_fit(_ds(vals), xmin=2, discrete=True).to_pandas()
    tail = vals[vals >= 2]
    alpha = 1.0 + len(tail) / np.sum(np.log(tail / (2 - 0.5)))
    assert int(got["alpha_e6"][0]) == int(round(alpha * 1e6))
    assert int(got["xmin"][0]) == 2
    assert int(got["n_tail"][0]) == len(tail)


def test_recovers_planted_exponent():
    rng = np.random.RandomState(0)
    # discrete power law via inverse transform on the continuous tail;
    # the CSN eq-3.7 shift approximation is O(xmin^-2)-accurate, so
    # plant the tail at xmin=10 (at xmin=1 it is knowingly biased)
    x = np.floor(10 * (1 - rng.rand(20000)) ** (-1 / (2.5 - 1))
                 ).astype(np.int64)
    got = power_law_fit(_ds(x), xmin=10, discrete=True).to_pandas()
    alpha = got["alpha_e6"][0] / 1e6
    assert 2.35 < alpha < 2.65


def test_xmin_sweep_finds_tail_start():
    rng = np.random.RandomState(1)
    noise = rng.randint(1, 8, 3000)  # non-power-law head below 8
    # x = xm*(1-u)^(-1/(alpha-1)) with alpha-1 = 1.8 -> true alpha 2.8
    tail = np.floor(8 * (1 - rng.rand(6000)) ** (-1 / 1.8)).astype(np.int64)
    got = power_law_fit(_ds(np.concatenate([noise, tail])),
                        discrete=True).to_pandas()
    # the sweep must clear the non-power-law head; KS may legitimately
    # prefer a deeper cut, but the exponent estimate stays near truth
    assert int(got["xmin"][0]) >= 8
    assert 2.55 < got["alpha_e6"][0] / 1e6 < 3.05


def test_partition_invariance_and_zero_drop():
    vals = np.array([0, 0, 1, 2, 2, 3, 9, 27], np.int64)
    a = power_law_fit(_ds(vals, parts=1), xmin=1).to_pandas()
    b = power_law_fit(_ds(vals, parts=5), xmin=1).to_pandas()
    assert a.equals(b)
    assert int(a["n_tail"][0]) == 6  # zeros dropped


def test_guards():
    with pytest.raises(Exception):
        power_law_fit(_ds([5]), xmin=100)
    # all-equal tail has zero log-spread -> no MLE
    with pytest.raises(Exception):
        power_law_fit(_ds([3, 3, 3]), xmin=3, discrete=False)
