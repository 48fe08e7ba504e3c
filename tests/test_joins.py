"""asof_join / range_join vs brute-force numpy oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.ops.joins import asof_join, range_join


def _mk(rows: dict) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table(rows)).repartition(3)


def _brute_asof(lk, lt, rk, rt, rv, strict, tol):
    out = []
    for i in range(len(lk)):
        best = None
        for j in range(len(rk)):
            if rk[j] != lk[i]:
                continue
            if strict and not rt[j] < lt[i]:
                continue
            if not strict and not rt[j] <= lt[i]:
                continue
            if tol is not None and lt[i] - rt[j] > tol:
                continue
            if best is None or rt[j] > rt[best]:
                best = j
        out.append(rv[best] if best is not None else None)
    return out


@pytest.mark.parametrize("strict,tol", [(False, None), (True, None),
                                        (False, 50), (True, 30)])
def test_asof_random_vs_brute(strict, tol):
    rng = np.random.RandomState(7)
    nl, nr = 300, 200
    lk = rng.randint(0, 12, nl).astype(np.int64)
    lt = rng.randint(0, 1000, nl).astype(np.int64)
    rk = rng.randint(0, 12, nr).astype(np.int64)
    rt = rng.permutation(5000)[:nr].astype(np.int64)  # unique per (k,t)
    rv = (rk * 100000 + rt).astype(np.int64)
    L = _mk({"k": lk, "t": lt, "lid": np.arange(nl, dtype=np.int64)})
    R = _mk({"k": rk, "t": rt, "rv": rv})
    got = asof_join(L, R, by="k", on="t", left_cols=["lid"],
                    right_cols=["rv"], strict=strict, tolerance_us=tol,
                    join_type="left").to_pandas()
    got = got.sort_values("lid").reset_index(drop=True)
    want = _brute_asof(lk, lt, rk, rt, rv, strict, tol)
    order = np.argsort(np.arange(nl))  # lid == input order
    assert len(got) == nl
    for i in range(nl):
        g = got["rv"][got["lid"] == i]
        w = want[i]
        gv = g.iloc[0]
        if w is None:
            assert gv is None or (isinstance(gv, float) and np.isnan(gv))
        else:
            assert int(gv) == int(w)


def test_asof_inner_drops_unmatched():
    L = _mk({"k": np.array([1, 1, 2], np.int64),
             "t": np.array([10, 5, 10], np.int64),
             "lid": np.array([0, 1, 2], np.int64)})
    R = _mk({"k": np.array([1], np.int64), "t": np.array([7], np.int64),
             "rv": np.array([99], np.int64)})
    got = asof_join(L, R, by="k", on="t", left_cols=["lid"],
                    right_cols=["rv"]).to_pandas()
    assert sorted(got["lid"]) == [0]
    assert list(got["rv"]) == [99]


def test_asof_equal_ts_backward_vs_strict():
    L = _mk({"k": np.array([5], np.int64), "t": np.array([100], np.int64),
             "lid": np.array([0], np.int64)})
    R = _mk({"k": np.array([5, 5], np.int64),
             "t": np.array([100, 40], np.int64),
             "rv": np.array([1, 2], np.int64)})
    back = asof_join(L, R, by="k", on="t", left_cols=["lid"],
                     right_cols=["rv"]).to_pandas()
    assert list(back["rv"]) == [1]
    strict = asof_join(L, R, by="k", on="t", left_cols=["lid"],
                       right_cols=["rv"], strict=True).to_pandas()
    assert list(strict["rv"]) == [2]


def test_asof_empty_right():
    L = _mk({"k": np.array([1, 2], np.int64),
             "t": np.array([1, 2], np.int64),
             "lid": np.array([0, 1], np.int64)})
    R = ray.data.from_arrow(pa.table(
        {"k": pa.array([], pa.int64()), "t": pa.array([], pa.int64()),
         "rv": pa.array([], pa.int64())}))
    inner = asof_join(L, R, by="k", on="t", left_cols=["lid"],
                      right_cols=["rv"]).to_pandas()
    assert len(inner) == 0
    left = asof_join(L, R, by="k", on="t", left_cols=["lid"],
                     right_cols=["rv"], join_type="left").to_pandas()
    assert len(left) == 2 and left["rv"].isna().all()


def test_asof_string_key():
    L = _mk({"k": np.array(["a", "b", "a"], object),
             "t": np.array([10, 10, 3], np.int64),
             "lid": np.array([0, 1, 2], np.int64)})
    R = _mk({"k": np.array(["a", "b"], object),
             "t": np.array([4, 20], np.int64),
             "rv": np.array([7, 8], np.int64)})
    got = asof_join(L, R, by="k", on="t", left_cols=["lid"],
                    right_cols=["rv"], join_type="left").to_pandas()
    m = {r.lid: r.rv for r in got.itertuples()}
    assert int(m[0]) == 7
    assert np.isnan(m[1]) and np.isnan(m[2])


def _brute_range(pk, pt, ik, lo, hi):
    pairs = set()
    for i in range(len(pk)):
        for j in range(len(ik)):
            if pk[i] == ik[j] and lo[j] <= pt[i] < hi[j]:
                pairs.add((i, j))
    return pairs


@pytest.mark.parametrize("bucket", [7, 64, 1000])
def test_range_join_random_vs_brute(bucket):
    rng = np.random.RandomState(11)
    npts, niv = 250, 80
    pk = rng.randint(0, 6, npts).astype(np.int64)
    pt = rng.randint(0, 500, npts).astype(np.int64)
    ik = rng.randint(0, 6, niv).astype(np.int64)
    lo = rng.randint(0, 480, niv).astype(np.int64)
    hi = lo + rng.randint(0, 60, niv).astype(np.int64)
    P = _mk({"k": pk, "t": pt, "pid": np.arange(npts, dtype=np.int64)})
    I = _mk({"k": ik, "lo": lo, "hi": hi,
             "iid": np.arange(niv, dtype=np.int64)})
    got = range_join(P, I, on="t", lo="lo", hi="hi", by="k",
                     point_cols=["pid"], interval_cols=["iid"],
                     bucket_us=bucket).to_pandas()
    gp = set(zip(got["pid"].astype(int), got["iid"].astype(int)))
    assert gp == _brute_range(pk, pt, ik, lo, hi)
    # exactly-once: no duplicate pairs even when intervals span buckets
    assert len(got) == len(gp)


def test_range_join_max_copies_guard():
    P = _mk({"t": np.array([5], np.int64),
             "pid": np.array([0], np.int64)})
    I = _mk({"lo": np.array([0], np.int64),
             "hi": np.array([10_000], np.int64),
             "iid": np.array([0], np.int64)})
    with pytest.raises(Exception):
        range_join(P, I, on="t", lo="lo", hi="hi", point_cols=["pid"],
                   interval_cols=["iid"], bucket_us=10,
                   max_copies=8).to_pandas()


def test_range_join_no_by_key():
    P = _mk({"t": np.array([1, 5, 9], np.int64),
             "pid": np.array([0, 1, 2], np.int64)})
    I = _mk({"lo": np.array([0, 4], np.int64),
             "hi": np.array([2, 10], np.int64),
             "iid": np.array([0, 1], np.int64)})
    got = range_join(P, I, on="t", lo="lo", hi="hi", point_cols=["pid"],
                     interval_cols=["iid"], bucket_us=3).to_pandas()
    gp = set(zip(got["pid"].astype(int), got["iid"].astype(int)))
    assert gp == {(0, 0), (1, 1), (2, 1)}
