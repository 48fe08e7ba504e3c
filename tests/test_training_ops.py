import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.ops import dedup, similarity, text, window
from igraph_ray.ops.multimodal import decode_images, make_fake_media, FrameSampler


def _docs(texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


def test_exact_dedup():
    docs = _docs(["hello world", "foo bar", "hello world", "baz", "foo bar", "foo bar"])
    rows = {r["text_md5"]: (r["keep_id"], r["dup_count"]) for r in dedup.exact_dedup(docs).take_all()}
    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert rows[h("hello world")] == (0, 2)
    assert rows[h("foo bar")] == (1, 3)
    assert rows[h("baz")] == (3, 1)


def test_minhash_lsh_finds_near_dups():
    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    near = base.replace("field", "meadow")
    far = "completely different text about graph engines and ray datasets at scale"
    docs = _docs([base, near, far, base + " extra"])
    pairs = sorted((r["a"], r["b"]) for r in dedup.minhash_lsh_pairs(docs, shingle_k=2).take_all())
    assert (0, 1) in pairs or (0, 3) in pairs  # near-dups bucket together
    assert (0, 2) not in pairs and (1, 2) not in pairs  # far doc does not


def test_ngram_jaccard():
    base = "a b c d e f g h i j k l m n o p"
    docs = _docs([base, base.replace(" p", " q"), "z z z z z"])
    out = {(r["a"], r["b"]): r["jaccard"] for r in
           dedup.ngram_jaccard_pairs(docs, threshold=0.3, shingle_k=2).take_all()}
    assert (0, 1) in out and out[(0, 1)] > 0.8


def test_simhash_close_for_near_dups():
    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = _docs([base, base + "tail", "unrelated words entirely different content"])
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).take_all()}
    d01 = bin(int(sh[0]) ^ int(sh[1])).count("1")
    d02 = bin(int(sh[0]) ^ int(sh[2])).count("1")
    assert d01 < d02


def test_text_ops():
    docs = _docs(["The quick brown fox, it jumps!", "der schöne ich und der"])
    tc = {r["doc_id"]: r["n_tokens"] for r in text.token_count(docs).take_all()}
    assert tc[0] == 8  # 6 words + comma + bang
    q = {r["doc_id"]: r for r in text.quality_score(docs).take_all()}
    assert q[0]["n_words"] == 6
    assert 0 < q[0]["stopword_ratio"] < 1
    lid = {r["doc_id"]: r["lang_pred"] for r in text.language_id(docs).take_all()}
    assert lid[1] == "de"
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs).take_all()}
    assert len(fp[0]) == 32 and fp[0] != fp[1]


def test_similarity_brute_force():
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    emb = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(50), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))})
    )
    queries = vecs[:3].astype(np.float64)
    out = similarity.brute_force_topk(emb, queries, k=5).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["score"]))
    for qi in range(3):
        top = by_q[qi]
        assert len(top) == 5
        assert top[0][0] == qi  # self is nearest
        assert abs(top[0][1] - 1.0) < 1e-9
    # exact check vs numpy for query 0
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ref = np.argsort(-(vn[0] @ vn.T))[:5]
    assert sorted(x[0] for x in by_q[0]) == sorted(int(i) for i in ref)


def test_similarity_lsh_recall_of_self():
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((100, 16)).astype(np.float32)
    emb = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(100), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))})
    )
    out = similarity.lsh_topk(emb, vecs[:5].astype(np.float64), k=3, num_planes=6).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for qi in range(5):
        assert qi in by_q.get(qi, [])  # self always lands in own bucket


def test_tumbling_window():
    ts = pa.array([0, 30, 90, 150, 3700], pa.int64())
    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.Array.from_pandas((ts.to_numpy() * 1_000_000).astype("datetime64[us]")),
        "user_id": pa.array([1, 1, 2, 2, 1], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "a", "a"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
    }))
    rows = {(r["window_us"], r["event_type"]): (r["n"], r["value_sum"])
            for r in window.tumbling_window(ev, minutes=60).take_all()}
    hour = 3600 * 1_000_000
    assert rows[(0, "a")] == (3, 7.0)
    assert rows[(0, "b")] == (1, 3.0)
    assert rows[(hour, "a")] == (1, 5.0)


def test_sessionize():
    base = np.array([0, 60, 120, 4000, 4060, 100], dtype=np.int64)  # seconds
    users = [1, 1, 1, 1, 1, 2]
    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.Array.from_pandas((base * 1_000_000).astype("datetime64[us]")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["x"] * 6, pa.string()),
        "value": pa.array([0.0] * 6, pa.float64()),
    }))
    rows = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in window.sessionize(ev, gap_minutes=30).take_all()
    )
    assert rows == [
        (1, 0, 3), (1, 4000 * 1_000_000, 2), (2, 100 * 1_000_000, 1),
    ]


def test_multimodal_plumbing():
    media = ray.data.from_arrow(make_fake_media(30))
    feats = decode_images(media, fake=True).take_all()
    assert len(feats) == 10  # a third are images
    assert all(len(r["features"]) == 8 for r in feats)
    # determinism: same payload -> same features
    again = decode_images(ray.data.from_arrow(make_fake_media(30)), fake=True).take_all()
    assert [r["features"] for r in feats] == [r["features"] for r in again]
    frames = media.map_batches(FrameSampler, batch_format="pyarrow",
                               concurrency=1, fn_constructor_kwargs={"frames": 2}).take_all()
    assert all(r["frame_offset_ms"] > 0 for r in frames)
    import pytest
    with pytest.raises(NotImplementedError):
        from igraph_ray.ops.multimodal import DecodeImage
        DecodeImage(fake=False)


def test_embedding_near_dups_lsh_recall():
    """exact=False must recover >=95% of the exact near-dup pairs on a
    planted-cluster fixture, with precision 1.0 (candidates are rescored
    with true cosine)."""
    rng = np.random.default_rng(7)
    n_clusters, per, dim = 40, 4, 24
    centers = rng.standard_normal((n_clusters, dim))
    vecs = []
    for c in centers:
        for _ in range(per):
            vecs.append(c + 0.05 * rng.standard_normal(dim))
    # plus background noise vectors with no near neighbors
    for _ in range(80):
        vecs.append(rng.standard_normal(dim) * 3)
    vecs = np.array(vecs)
    ids = np.arange(len(vecs), dtype=np.int64)
    emb = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float64()))})
    )
    thr = 0.9
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sc = vn @ vn.T
    ii, jj = np.nonzero(np.triu(sc >= thr, k=1))
    exact_pairs = set(zip(ii.tolist(), jj.tolist()))
    assert len(exact_pairs) >= n_clusters  # fixture actually has dups

    got = similarity.embedding_near_dups(
        emb, threshold=thr, exact=False, num_planes=4, num_bands=8
    ).take_all()
    lsh_pairs = {(r["a"], r["b"]) for r in got}
    # precision 1.0: every reported pair is a true pair
    assert lsh_pairs <= exact_pairs
    recall = len(lsh_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.95, f"recall {recall:.3f}"
    # scores match the true cosine
    for r in got[:10]:
        assert abs(r["score"] - sc[r["a"], r["b"]]) < 1e-9


def test_minhash_bucket_integrity_across_blocks():
    """A duplicate cluster spread over many input blocks must keep ALL its
    candidate pairs: band buckets are boundary-aligned (one block per key
    range), and oversized buckets emit star pairs instead of dropping
    (round-1 straddle + silent-cap findings)."""
    rng = np.random.default_rng(3)
    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    texts = [dup_text] * 30
    for i in range(300):
        texts.append(" ".join(rng.choice(
            ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"],
            size=12).tolist()) + f" tail{i}")
    ids = np.arange(len(texts), dtype=np.int64)
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())})
    ).repartition(8)

    # small max_bucket forces the star-pair path for the 30-dup cluster
    pairs = {(r["a"], r["b"]) for r in dedup.minhash_lsh_pairs(
        docs, max_bucket=10, num_partitions=4).take_all()}
    # star connectivity: every dup doc pairs (directly or via the hub) —
    # at minimum the hub 0 reaches all 29 others
    for i in range(1, 30):
        assert (0, i) in pairs, f"lost dup pair (0,{i})"

    # generous max_bucket: the full clique must be present
    pairs_full = {(r["a"], r["b"]) for r in dedup.minhash_lsh_pairs(
        docs, max_bucket=200, num_partitions=4).take_all()}
    for i in range(30):
        for j in range(i + 1, 30):
            assert (i, j) in pairs_full, f"lost dup pair ({i},{j})"


def test_similarity_ivf_recall():
    # planted clusters: queries at cluster centers must recover their
    # own cluster members with high recall vs the brute-force oracle
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((6, 24))
    vecs = np.concatenate([
        c + 0.05 * rng.standard_normal((40, 24)) for c in centers
    ])
    emb = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float64()))}))
    q = centers.astype(np.float64)
    k = 10
    exact = similarity.brute_force_topk(emb, q, k=k).take_all()
    approx = similarity.ivf_topk(emb, q, k=k, nlist=12, nprobe=3,
                                 train_size=240, seed=5).take_all()
    by_q_e, by_q_a = {}, {}
    for r in exact:
        by_q_e.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        by_q_a.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(by_q_e[i] & by_q_a.get(i, set())) for i in by_q_e)
    total = sum(len(v) for v in by_q_e.values())
    assert hits / total >= 0.9, (hits, total)


def test_dedup_clusters_transitive():
    # pairs (1,2),(2,3) chain plus isolated pair (10,11): clusters must be
    # the transitive closure with min-id keeper and correct sizes
    from igraph_ray.ops import curation

    pairs = ray.data.from_arrow(
        pa.table({"a": pa.array([1, 2, 10], pa.int64()),
                  "b": pa.array([2, 3, 11], pa.int64())}))
    out = {r["member_id"]: (r["keep_id"], r["cluster_size"])
           for r in curation.dedup_clusters(pairs).take_all()}
    assert out == {1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)}


def test_word_stats_repetition():
    from igraph_ray.ops import curation

    docs = _docs(["spam spam spam eggs", "", "a b c d", "Tick-tock tick; TOCK"])
    rows = {r["doc_id"]: r for r in curation.word_stats(docs).take_all()}
    assert (rows[0]["n_words"], rows[0]["top_tf"]) == (4, 3)
    assert rows[0]["rep_ratio_e6"] == 3 * 1_000_000 // 4
    assert (rows[1]["n_words"], rows[1]["top_tf"], rows[1]["rep_ratio_e6"]) == (0, 0, 0)
    assert (rows[2]["n_words"], rows[2]["top_tf"]) == (4, 1)
    # case-folding + punctuation stripping: tick x2, tock x2
    assert (rows[3]["n_words"], rows[3]["top_tf"]) == (4, 2)


def test_top_terms_ranking():
    from igraph_ray.ops import curation

    # "rare" appears in 1 doc, "common" in all 3 → at equal tf, rare wins
    docs = _docs(["rare common common rare", "common x", "common y"])
    rows = [r for r in curation.top_terms(docs, k=1).take_all() if r["doc_id"] == 0]
    assert len(rows) == 1
    assert rows[0]["term"] == "rare" and rows[0]["tf"] == 2 and rows[0]["df"] == 1


def test_stratified_sample_deterministic():
    from igraph_ray.ops import curation

    t = pa.table({"doc_id": pa.array(range(1000), pa.int64()),
                  "lang": pa.array((["en", "de", "fr"] * 334)[:1000], pa.string())})
    docs = ray.data.from_arrow(t)
    rates = {"en": 500, "de": 100}
    s1 = sorted(r["doc_id"] for r in curation.stratified_sample(docs, rates, 0).take_all())
    s2 = sorted(r["doc_id"] for r in
                curation.stratified_sample(docs.repartition(7), rates, 0).take_all())
    assert s1 == s2  # parallelism-independent
    kept = {r["doc_id"]: r["lang"] for r in curation.stratified_sample(docs, rates, 0).take_all()}
    langs = [kept[i] for i in s1]
    assert "fr" not in langs  # default rate 0 drops the unlisted stratum
    n_en = langs.count("en"); n_de = langs.count("de")
    assert 120 <= n_en <= 215 and 10 <= n_de <= 60  # ≈ rate/1000 of ~334 each


def test_ngram_contamination():
    """Brute-force decontamination oracle: per-doc 5-gram multiset overlap
    with the benchmark subset's distinct shingles."""
    import re

    from igraph_ray.ops.curation import ngram_contamination

    texts = {
        0: "the quick brown fox jumps over the lazy dog tonight",  # benchmark
        1: "the quick brown fox jumps over the lazy dog tonight",  # full copy
        2: "a quick brown fox jumps over the lazy cat instead",    # partial
        3: "completely different words without any shared windows here",
        4: "too short",                                            # < n tokens
        10: "numbers 123 and CAPS Should Normalize fine you know", # benchmark
        11: "numbers 123 and caps should normalize fine you know yes",
    }
    ids = sorted(texts)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string())}))
    got = {r["doc_id"]: (r["contaminated"], r["total_ngrams"])
           for r in ngram_contamination(ds, benchmark_mod=10, n=5).take_all()}

    def toks(s):
        return re.findall(r"[a-z0-9]+", s.lower())

    def shingles(s, n=5):
        t = toks(s)
        return [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]

    bench = set()
    for i in ids:
        if i % 10 == 0:
            bench.update(shingles(texts[i]))
    for i in ids:
        sh = shingles(texts[i])
        want = (sum(1 for s in sh if s in bench), len(sh))
        assert got[i] == want, (i, got[i], want)
    assert got[4] == (0, 0)
    assert got[1][0] == got[1][1] > 0          # full copy fully flagged
    assert 0 < got[2][0] < got[2][1]           # partial overlap
    assert got[3][0] == 0


def test_quality_filter():
    """Reason bits and keep decision on hand-built documents."""
    from igraph_ray.ops.curation import quality_filter

    docs = {
        0: ("one two three four five six seven eight nine ten", 1, 0),
        1: ("short doc", 0, 5),                # too few words + high rep
        2: ("spam " * 50, 0, 4),                               # repetition
        3: ("!!! ??? *** " * 20 + "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", 0, 8),
    }
    ids = sorted(docs)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([docs[i][0] for i in ids], pa.string())}))
    got = {r["doc_id"]: r for r in quality_filter(ds).take_all()}
    for i in ids:
        assert got[i]["keep"] == docs[i][1], (i, dict(got[i]))
        assert got[i]["reasons"] == docs[i][2], (i, dict(got[i]))


def test_curate_pipeline_bits():
    """Composed curation decision: quality + dup-keeper + contamination
    bits combine per document."""
    from igraph_ray.ops.curation import curate

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = {
        0: base,            # benchmark (0%10==0): fully self-contaminated
        1: base,            # exact dup of 0 (keeper is 0) + contaminated
        2: "totally different clean words here one two three four five",
        3: "tiny",          # quality fail (too few words + rep)
    }
    ids = sorted(docs)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([docs[i] for i in ids], pa.string())}))
    got = {r["doc_id"]: r for r in
           curate(ds, benchmark_mod=10, n=5).take_all()}
    assert got[0]["reasons"] == 32                 # self-contaminated keeper
    assert got[1]["reasons"] == 16 + 32            # dup non-keeper + contaminated
    assert got[2]["reasons"] == 0 and got[2]["kept"] == 1
    assert got[3]["reasons"] & 1                   # too few words
    assert got[3]["kept"] == 0


def test_multimodal_resize_plumbing():
    from igraph_ray.ops.multimodal import ResizeImage, make_fake_media, resize_images

    media = ray.data.from_arrow(make_fake_media(30))
    out = resize_images(media, width=16, height=8, fake=True).take_all()
    assert len(out) == 10
    assert all(len(r["payload"]) == 16 * 8 for r in out)
    assert all(r["width"] == 16 and r["height"] == 8 for r in out)
    # deterministic: same input payload -> same resized bytes
    again = resize_images(ray.data.from_arrow(make_fake_media(30)),
                          width=16, height=8, fake=True).take_all()
    assert [r["payload"] for r in out] == [r["payload"] for r in again]
    import pytest
    with pytest.raises(NotImplementedError):
        ResizeImage(fake=False)


def test_token_hll_vocab_sketch():
    """Registers equal brute-force maxima over the distinct token set,
    and the HLL estimate lands near the true vocabulary size."""
    from igraph_ray.ops.curation import _HLL_M, token_hll

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(300)]
    texts, langs = [], []
    for i in range(40):
        lang = "en" if i % 2 == 0 else "de"
        words = rng.choice(vocab[:200] if lang == "en" else vocab[100:], 50)
        texts.append(" ".join(words))
        langs.append(lang)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string())}))
    t = token_hll(ds)
    rows = {t["group"][i].as_py(): [t[f"r{b}"][i].as_py() for b in range(_HLL_M)]
            for i in range(t.num_rows)}

    import re

    for lang in ("en", "de"):
        toks = {w for txt, lg in zip(texts, langs) if lg == lang
                for w in re.findall(r"[a-z0-9]+", txt.lower())}
        want = [0] * _HLL_M
        for w in toks:
            h = hashlib.md5(w.encode()).hexdigest()
            b = int(h[0], 16) % _HLL_M
            x = int(h[1:5], 16)
            want[b] = max(want[b], 17 if x == 0 else 16 - x.bit_length() + 1)
        assert rows[lang] == want, (lang, rows[lang], want)
        z = sum(2.0 ** -r for r in want)
        est = 0.6516 * _HLL_M * _HLL_M / z
        assert abs(est - len(toks)) / len(toks) < 0.8


def test_token_cms_sketch():
    """Counters equal the brute-force sketch; the point estimate is an
    overestimate that is exact for the dominant token."""
    import re

    from igraph_ray.ops.curation import _CMS_D, _CMS_W, cms_estimate, token_cms

    texts = ["spam spam spam eggs ham", "spam eggs toast", "ham ham spam"]
    ds = _docs(texts)
    rows = token_cms(ds).take_all()

    counts = {}
    for txt in texts:
        for w in re.findall(r"[a-z0-9]+", txt.lower()):
            counts[w] = counts.get(w, 0) + 1
    want = {}
    for w, c in counts.items():
        for d in range(_CMS_D):
            h = hashlib.md5(f"{d}:{w}".encode()).hexdigest()
            key = (d, int(h[:8], 16) % _CMS_W)
            want[key] = want.get(key, 0) + c
    got = {(r["d"], r["slot"]): r["cnt"] for r in rows}
    assert got == want
    for w, c in counts.items():
        assert cms_estimate(rows, w) >= c
    assert cms_estimate(rows, "spam") == counts["spam"]  # no collision here


def test_hopping_window():
    """Each event lands in exactly size/hop windows (boundary-clipped);
    counts and e6 sums match brute force."""
    from igraph_ray.ops import window as win

    secs = np.array([0, 900, 1800, 5400], dtype=np.int64)
    ev = ray.data.from_arrow(pa.table({
        "ts": pa.Array.from_pandas((secs * 1_000_000).astype("datetime64[us]")),
        "event_type": pa.array(["a", "a", "b", "a"], pa.string()),
        "value": pa.array([1.5, 2.0, 3.0, 4.0], pa.float64()),
    }))
    got = {(r["window_us"], r["event_type"]): (r["n"], r["value_e6"])
           for r in win.hopping_window(ev, size_minutes=30,
                                       hop_minutes=15).take_all()}
    size, hop = 1800 * 1_000_000, 900 * 1_000_000
    want = {}
    for t, et, v in zip(secs * 1_000_000, ["a", "a", "b", "a"],
                        [1.5, 2.0, 3.0, 4.0]):
        last = t // hop * hop
        for kk in range(size // hop):
            w = last - kk * hop
            if w >= 0 and t < w + size:
                n, s = want.get((w, et), (0, 0))
                want[(w, et)] = (n + 1, s + round(v * 1e6))
    assert got == want


def test_duplicated_spans_planted():
    """Cross-doc planted substring, a within-doc self-repeat, window
    merging into one maximal span, and clean docs absent."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens > l=5
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            f"u0 u1 {shared} u2 u3",                 # dup at pos 2..8
            f"w0 {shared} w1 w2 w3",                 # dup at pos 1..7
            "r0 r1 r2 r3 r4 r5 r0 r1 r2 r3 r4 r5",   # self-repeat
            "c0 c1 c2 c3 c4 c5 c6",                  # clean
        ], pa.string()),
    }))
    out = dedup.duplicated_spans(docs, l=5).to_pandas() \
        .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    got = {(r.doc_id, r.span_start, r.span_end) for r in out.itertuples()}
    # shared occupies tokens [2, 8) in doc 0 and [1, 7) in doc 1:
    # two overlapping 5-windows merge into one maximal span each
    assert (0, 2, 8) in got
    assert (1, 1, 7) in got
    # doc 2: "r0..r5 r0..r5" — every 5-window whose content repeats;
    # windows at 0..1 equal windows at 6..7, and the middle wrap windows
    # (2..5) are unique, so spans are [0,7) and [6,12) merged? they
    # overlap via positions {6}: 1+5=6 >= 6 so [0,x) merges with [6,12)
    d2 = sorted((s, e) for (d, s, e) in got if d == 2)
    # exact expectation: dup window starts {0,1,6,7} -> spans [0,6),[6,12)
    # merged because 6 <= 1+5 -> single [0,12)
    assert d2 == [(0, 12)], d2
    assert not any(d == 3 for (d, s, e) in got)


def test_duplicated_spans_parallelism_invariant():
    """Same spans at 1 block and 8 blocks."""
    texts = []
    base = "tok%d " * 30
    for i in range(40):
        t = " ".join(f"w{i}_{j}" for j in range(20))
        if i % 7 == 0:
            t += " shared a b c d e tail" + str(i)
        texts.append(t)
    tbl = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    a = dedup.duplicated_spans(
        ray.data.from_arrow(tbl), l=5).to_pandas()
    b = dedup.duplicated_spans(
        ray.data.from_arrow(tbl).repartition(8), l=5).to_pandas()
    key = lambda df: sorted(map(tuple, df.values.tolist()))
    assert key(a) == key(b)
    assert len(a) == 6  # 40/7 rounded up -> docs 0,7,14,21,28,35


def test_pii_counts():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "contact me at a.b@example.com or http://x.io/page now",
            "server 10.0.0.1 and 192.168.1.255 up",
            "no pii here at all",
        ], pa.string())}))
    df = text.pii_counts(docs).to_pandas().sort_values("doc_id")
    assert df.n_email.tolist() == [1, 0, 0]
    assert df.n_url.tolist() == [1, 0, 0]
    assert df.n_ip.tolist() == [0, 2, 0]
    assert df.has_pii.tolist() == [1, 1, 0]


def test_remove_duplicated_spans():
    shared = "alpha beta gamma delta epsilon zeta"
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            f"u0 u1 {shared} u2",
            f"w0 {shared} w1",
            "c0 c1 c2 c3",
        ], pa.string())}))
    df = dedup.remove_duplicated_spans(docs, l=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert df.clean_text.tolist() == ["u0 u1 u2", "w0 w1", "c0 c1 c2 c3"]
    assert df.n_removed.tolist() == [6, 6, 0]


class TestKmeansClusters:
    def _blobs(self, n_per=60, k=4, dim=16, seed=3):
        rng = np.random.RandomState(seed)
        centers = rng.randn(k, dim) * 4
        rows = []
        for c in range(k):
            pts = centers[c] + rng.randn(n_per, dim) * 0.2
            rows.append(pts)
        X = np.concatenate(rows)
        ids = np.arange(len(X), dtype=np.int64)
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array([r.tolist() for r in X],
                                  pa.list_(pa.float32()))})), k, n_per

    def test_planted_blobs_recovered(self, ray_session):
        from igraph_ray.ops.similarity import kmeans_clusters

        ds, k, n_per = self._blobs()
        got = kmeans_clusters(ds, nlist=k, train_size=512).to_pandas()
        # every planted blob maps to exactly one cluster id
        truth = got.vec_id // n_per
        tab = got.groupby(truth)["cluster"].nunique()
        assert (tab == 1).all()
        assert got["cluster"].nunique() == k

    def test_assignment_is_argmax(self, ray_session):
        from igraph_ray.ops.similarity import kmeans_clusters

        ds, k, _ = self._blobs(seed=7)
        got = kmeans_clusters(ds, nlist=k, train_size=512).to_pandas()
        # score is the cosine to the OWN centroid => within each cluster
        # the mean score must exceed the cross-cluster mean similarity
        assert (got["score"] > 0.5).all()

    def test_partitioning_invariance(self, ray_session):
        from igraph_ray.ops.similarity import kmeans_clusters

        ds, k, _ = self._blobs(seed=5)
        a = kmeans_clusters(ds, nlist=k).to_pandas().sort_values(
            "vec_id").reset_index(drop=True)
        b = kmeans_clusters(ds.repartition(7), nlist=k).to_pandas(
            ).sort_values("vec_id").reset_index(drop=True)
        # cluster ids exactly invariant; scores to 1 ulp (BLAS matmul
        # rounding differs with batch shape)
        assert a["cluster"].tolist() == b["cluster"].tolist()
        assert (a["score"] - b["score"]).abs().max() < 1e-12
