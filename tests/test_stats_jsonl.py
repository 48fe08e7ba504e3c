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


def test_chunk_documents_vs_brute():
    from igraph_ray.ops.text import chunk_documents

    texts = ["", "short", "a" * 300, "x" * 1000,
             ("émoji 🎉 中文 " * 40)]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
         "text": pa.array(texts, pa.string())})).repartition(2)
    got = chunk_documents(ds, size_chars=100, overlap=30).to_pandas()
    step = 70
    for i, t in enumerate(texts):
        n = 1 + max(0, (len(t) - 100 + step - 1)) // step if len(t) > 100 \
            else 1
        rows = got[got["doc_id"] == i].sort_values("chunk_id")
        assert len(rows) == n
        for k, chunk in zip(rows["chunk_id"], rows["chunk_text"]):
            assert chunk == t[k * step:k * step + 100]
    # coverage: concatenating chunks minus overlaps rebuilds the text
    t = texts[3]
    rows = got[got["doc_id"] == 3].sort_values("chunk_id")
    rebuilt = rows["chunk_text"].iloc[0] + "".join(
        c[30:] for c in rows["chunk_text"].iloc[1:])
    assert rebuilt == t


def test_chunk_documents_hash_mode_and_guard():
    import hashlib

    import pytest as _pytest

    from igraph_ray.ops.text import chunk_documents

    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([0], pa.int64()),
         "text": pa.array(["hello world"], pa.string())}))
    got = chunk_documents(ds, size_chars=8, overlap=2,
                          hash_chunks=True).to_pandas()
    assert got["chunk_md5"][0] == hashlib.md5(b"hello wo").hexdigest()
    with _pytest.raises(ValueError):
        chunk_documents(ds, size_chars=8, overlap=8)


def test_negative_sample_deterministic_and_uniform():
    import hashlib

    from igraph_ray.ops.curation import negative_sample

    users = np.repeat(np.arange(20, dtype=np.int64), 5)
    items = np.tile(np.arange(5, dtype=np.int64), 20)
    t = pa.table({"u": pa.array(users), "i": pa.array(items)})
    a = negative_sample(ray.data.from_arrow(t).repartition(1),
                        num_items=50, k=3, seed=9,
                        user_col="u", item_col="i").to_pandas()
    b = negative_sample(ray.data.from_arrow(t).repartition(7),
                        num_items=50, k=3, seed=9,
                        user_col="u", item_col="i").to_pandas()
    key = ["u", "i", "j"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert (a["neg_item"] == b["neg_item"]).all()
    assert len(a) == 300
    # draw replay: md5(seed:u:i:j)[:15] % n
    r = a.iloc[42]
    want = int(hashlib.md5(
        f"9:{r.u}:{r.i}:{r.j}".encode()).hexdigest()[:15], 16) % 50
    assert int(r.neg_item) == want
    assert a["neg_item"].nunique() > 25  # spread over the item space


def test_cap_per_group_vs_brute_and_invariance():
    import hashlib

    from igraph_ray.ops.curation import cap_per_group

    rng = np.random.RandomState(13)
    nd = 400
    ids = rng.permutation(10000)[:nd].astype(np.int64)
    grp = np.array([f"g{v}" for v in rng.randint(0, 7, nd)], object)
    t = pa.table({"doc_id": pa.array(ids),
                  "source": pa.array(grp.tolist(), pa.string())})

    def brute(nkeep):
        keep = set()
        for g in set(grp.tolist()):
            members = [(int(hashlib.md5(str(int(i)).encode())
                            .hexdigest()[:15], 16), int(i))
                       for i in ids[grp == g]]
            for _, i in sorted(members)[:nkeep]:
                keep.add(i)
        return keep

    for parts in (1, 6):
        got = cap_per_group(
            ray.data.from_arrow(t).repartition(parts), n=15).to_pandas()
        assert set(got["doc_id"].astype(int)) == brute(15)
    # n larger than every group: everything kept
    allkept = cap_per_group(ray.data.from_arrow(t), n=1000).to_pandas()
    assert len(allkept) == nd


def test_tokenize_to_ids_oov_and_positions():
    from igraph_ray.ops.text import token_vocabulary, tokenize_to_ids

    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         "text": pa.array(["Beta alpha beta!", "gamma zz beta"],
                          pa.string())}))
    vocab = ray.data.from_arrow(pa.table(
        {"token": pa.array(["alpha", "beta", "gamma"], pa.string()),
         "token_id": pa.array([0, 1, 2], pa.int64())}))
    inner = tokenize_to_ids(docs, vocab).to_pandas().sort_values(
        ["doc_id", "pos"]).reset_index(drop=True)
    # doc0: beta(1) alpha(0) beta(1); doc1: gamma(2) [zz oov] beta(1)
    assert list(inner[inner.doc_id == 0]["token_id"]) == [1, 0, 1]
    assert list(inner[inner.doc_id == 0]["pos"]) == [0, 1, 2]
    assert list(inner[inner.doc_id == 1]["token_id"]) == [2, 1]
    keep = tokenize_to_ids(docs, vocab, keep_oov=True).to_pandas()
    d1 = keep[keep.doc_id == 1].sort_values("pos")
    assert list(d1["token_id"]) == [2, -1, 1]
    assert list(d1["pos"]) == [0, 1, 2]
    # full vocabulary round trip: ids dense lexicographic
    v = token_vocabulary(docs).to_pandas().sort_values("token_id")
    assert list(v["token"]) == ["alpha", "beta", "gamma", "zz"]
    assert list(v["token_id"]) == [0, 1, 2, 3]
