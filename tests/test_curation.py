

def test_lm_surprisal_properties(ray_session):
    """Corpus-bigram surprisal: a doc made of the corpus's dominant
    repeated bigram scores LOWER mean surprisal than a doc of unique
    gibberish transitions; exact integer replay on a tiny corpus."""
    import pyarrow as pa
    import ray.data

    from igraph_ray.ops.curation import lm_surprisal

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "the cat the cat the cat the cat",
            "the cat the cat",
            "the dog the pig the owl",
            "x",                      # one token: no bigrams
        ], pa.string())}))
    got = {r["doc_id"]: r for r in lm_surprisal(docs).take_all()}
    assert got[3]["n_bigrams"] == 0 and got[3]["surprisal_sum"] == 0
    assert got[0]["mean_surprisal"] < got[2]["mean_surprisal"]
    # exact replay: bigram counts over the 4-doc corpus
    from collections import Counter
    toks = [d.split() for d in
            ["the cat the cat the cat the cat", "the cat the cat",
             "the dog the pig the owl", "x"]]
    bc = Counter()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            bc[(a, b)] += 1
    uc = Counter()
    for (a, _), c in bc.items():
        uc[a] += c
    for did, ts in enumerate(toks):
        ss = sum((uc[a] << 20) // bc[(a, b)] for a, b in zip(ts, ts[1:]))
        nb = len(ts) - 1 if len(ts) > 1 else 0
        assert got[did]["surprisal_sum"] == ss
        assert got[did]["n_bigrams"] == nb


def test_lm_surprisal_zero_bigram_corpus(ray_session):
    """A corpus where EVERY doc has < 2 tokens yields zero bigrams; the
    left_outer join's right side is empty, so the score columns must be
    synthesized as zeros rather than raising KeyError."""
    import pyarrow as pa
    import ray.data

    from igraph_ray.ops.curation import lm_surprisal

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["x", "", "solo"], pa.string())}))
    got = {r["doc_id"]: r for r in lm_surprisal(docs).take_all()}
    assert set(got) == {0, 1, 2}
    for r in got.values():
        assert r["n_bigrams"] == 0
        assert r["surprisal_sum"] == 0
        assert r["mean_surprisal"] == 0
