"""Float-exponent growth games (games.c:1574/1732/3033 general
power / pa_exp / aging_exp / preferences): the round-5 rows-only float
paths. Contracts: (a) the float roulette agrees with the integer-exact
roulette on integer-exact settings (same md5 draw stream, measure-zero
boundary risk only — pinned by exact edge-list equality on a fixed
seed); (b) degree-sequence moments move the right way with the
exponent (super-linear preferential attachment concentrates degree,
sub-linear flattens it); (c) determinism across calls."""
import numpy as np
import pyarrow as pa


def _degs(ds, n):
    t = ds.to_arrow_refs()
    import ray
    tbl = pa.concat_tables([ray.get(r) for r in t])
    d = np.zeros(n, np.int64)
    np.add.at(d, tbl["dst"].to_numpy(zero_copy_only=False), 1)
    return d


def test_recent_degree_float_matches_integer_at_power_one(ray_session):
    from igraph_ray.sources.games import (_recent_degree_float,
                                          recent_degree_game)

    a = recent_degree_game(n=96, m=2, window=4, zero_appeal=1,
                           seed=17).to_pandas()
    b = _recent_degree_float(96, 2, 4, 1.0, False, 17, 1.0).to_pandas()
    assert a.values.tolist() == b.values.tolist()


def test_barabasi_aging_float_matches_integer(ray_session):
    from igraph_ray.sources.games import (_barabasi_aging_float,
                                          barabasi_aging_game)

    a = barabasi_aging_game(n=96, m=2, aging_bin=3,
                            seed=23).to_pandas()
    b = _barabasi_aging_float(96, 2, 3, 1.0, 0.0, 1.0, 1.0, 1.0, -1.0,
                              False, 23).to_pandas()
    assert a.values.tolist() == b.values.tolist()


def test_lastcit_float_matches_integer(ray_session):
    from igraph_ray.sources.games import _lastcit_float, lastcit_game

    a = lastcit_game(n=96, edges_per_node=1, agebins=3,
                     preference=(6, 3, 2, 1), seed=19).to_pandas()
    b = _lastcit_float(96, 1, 3, [6.0, 3.0, 2.0, 1.0], 19).to_pandas()
    assert a.values.tolist() == b.values.tolist()


def test_recent_degree_power_concentration(ray_session):
    """Super-linear power concentrates recent-degree attachment: the
    max in-degree under power=2 dominates power=0.25, and both paths
    are deterministic across calls."""
    from igraph_ray.sources.games import recent_degree_game

    n, m = 512, 3
    hi = _degs(recent_degree_game(n=n, m=m, window=64, zero_appeal=1,
                                  seed=7, power=2.0), n)
    lo = _degs(recent_degree_game(n=n, m=m, window=64, zero_appeal=1,
                                  seed=7, power=0.25), n)
    assert hi.sum() == lo.sum() == (n - 1) * m  # same edge budget
    assert hi.max() > lo.max()
    assert (hi > 0).sum() < (lo > 0).sum()  # flat spreads citations wider
    again = _degs(recent_degree_game(n=n, m=m, window=64, zero_appeal=1,
                                     seed=7, power=2.0), n)
    assert np.array_equal(hi, again)


def test_barabasi_aging_float_properties(ray_session):
    """pa_exp > 1 concentrates degree relative to pa_exp < 1 at equal
    aging; strongly negative aging_exp shifts citations toward recent
    (higher-id) vertices relative to aging_exp=0."""
    from igraph_ray.sources.games import barabasi_aging_game

    n, m = 512, 2
    hi = _degs(barabasi_aging_game(n=n, m=m, aging_bin=4, seed=5,
                                   pa_exp=2.0, aging_exp=-0.5), n)
    lo = _degs(barabasi_aging_game(n=n, m=m, aging_bin=4, seed=5,
                                   pa_exp=0.5, aging_exp=-0.5), n)
    assert hi.max() > lo.max()
    idx = np.arange(n, dtype=np.float64)
    young = _degs(barabasi_aging_game(n=n, m=m, aging_bin=8, seed=5,
                                      pa_exp=1.0, aging_exp=-3.0), n)
    flat = _degs(barabasi_aging_game(n=n, m=m, aging_bin=8, seed=5,
                                     pa_exp=1.0, aging_exp=0.0), n)
    mean_young = float((idx * young).sum() / young.sum())
    mean_flat = float((idx * flat).sum() / flat.sum())
    assert mean_young > mean_flat


def test_lastcit_float_preferences(ray_session):
    """A heavily recency-weighted float preference vector makes
    last-citation attachment self-reinforcing (once cited you jump to
    preference[0] and stay hot): citations concentrate on far fewer
    targets with a far larger max in-degree than a flat vector."""
    from igraph_ray.sources.games import lastcit_game
    import ray

    def conc(pref):
        ds = lastcit_game(n=256, edges_per_node=2, agebins=4,
                          preference=pref, seed=3)
        t = pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])
        d = t["dst"].to_numpy(zero_copy_only=False)
        c = np.bincount(d, minlength=256)
        return int(c.max()), int((c > 0).sum())

    rec_max, rec_supp = conc((64.0, 8.0, 1.0, 0.5, 0.25))
    flat_max, flat_supp = conc((1.0, 1.0, 1.0, 1.0, 1.0))
    assert rec_max > 2 * flat_max
    assert rec_supp < flat_supp // 2
