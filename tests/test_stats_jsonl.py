"""exact_quantiles / quantile_threshold_filter / JSONL round trip."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.ops.stats import exact_quantiles, quantile_threshold_filter
from igraph_ray.sources.jsonl import read_jsonl, write_jsonl


def _ds(vals):
    return ray.data.from_arrow(pa.table(
        {"v": pa.array(np.asarray(vals, np.int64)),
         "id": pa.array(np.arange(len(vals), dtype=np.int64))})
    ).repartition(4)


def test_quantiles_vs_numpy_lower():
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 50, 1000)  # heavy ties
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = exact_quantiles(_ds(vals), "v", qs).to_pandas()
    srt = np.sort(vals)
    for q, v in zip(got["q"], got["value"]):
        assert int(v) == int(srt[int(np.floor(q * (len(vals) - 1)))])


def test_quantiles_single_value():
    got = exact_quantiles(_ds([7, 7, 7]), "v", [0.5]).to_pandas()
    assert list(got["value"]) == [7]


def test_quantiles_partition_invariance():
    vals = np.arange(101)
    a = exact_quantiles(_ds(vals), "v", [0.3, 0.6]).to_pandas()
    b = exact_quantiles(
        ray.data.from_arrow(pa.table({"v": pa.array(vals, type=pa.int64())})),
        "v", [0.3, 0.6]).to_pandas()
    assert list(a["value"]) == list(b["value"]) == [30, 60]


def test_threshold_filter_matches_brute():
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 30, 400)
    out = quantile_threshold_filter(_ds(vals), "v", 0.25,
                                    out_cols=["id", "v"]).to_pandas()
    thr = np.sort(vals)[int(np.floor(0.25 * (len(vals) - 1)))]
    want = set(np.flatnonzero(vals >= thr))
    assert set(out["id"].astype(int)) == want


def test_jsonl_roundtrip_unicode(tmp_path):
    texts = ["plain ascii", "newline\nand\ttab", "quotes \" and \\",
             "émoji 🎉 中文", ""]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
         "text": pa.array(texts, pa.string())}))
    d = str(tmp_path / "shards")
    write_jsonl(ds, d)
    back = read_jsonl(d, columns=["doc_id", "text"],
                      int_cols=["doc_id"]).to_pandas()
    back = back.sort_values("doc_id").reset_index(drop=True)
    assert list(back["text"]) == texts
    assert back["doc_id"].dtype == np.int64
