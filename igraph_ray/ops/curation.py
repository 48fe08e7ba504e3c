"""Training-data curation operators: near-dup cluster resolution,
repetition / top-word statistics (Gopher-style quality signals),
tf-idf-style salient-term extraction, and deterministic stratified
sampling.

These compose the engine's own primitives — the near-dup pair ops
(ops/dedup.py, ops/similarity.py), connected components
(algorithms/components.py) and broadcast hash joins (util.hash_join) —
into the canonical corpus-curation pipeline: candidate pairs → duplicate
clusters → one kept representative per cluster, plus per-document
quality statistics computed on Arrow kernels.

No reference-repo counterpart (igraph has no string/corpus functions,
SURVEY.md §2.10); these are the large-scale-pipeline extensions the
task mandates. Determinism contract: every output is reproducible at
any parallelism and matched by an ANSI-SQL oracle — all ranking keys
are integers, and the sampling rule is an md5-prefix comparison both
engines evaluate identically.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import hash_join

# word tokens for repetition/tf-idf stats: lowercase alnum runs — chosen
# to be expressible identically as regexp_extract_all(lower(text),
# '[a-z0-9]+') in the SQL oracles
_WORD_SEP = "[^a-z0-9]+"


# --------------------------------------------------------------------------
# near-dup clusters: pairs -> connected components -> canonical keeper
# --------------------------------------------------------------------------

def dedup_clusters(
    pairs: ray.data.Dataset,
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(member_id, keep_id, cluster_size) for every document that appears
    in at least one near-duplicate pair: the transitive closure of the
    pair relation (union-find semantics), with the minimum id in each
    cluster as the kept representative — the standard resolution step
    after MinHash / embedding candidate generation.

    Scale shape: the pair table is tiny relative to the corpus (only
    near-dups), so the component loop runs over a graph of |pairs| edges,
    not |docs| vertices; cluster sizes come from one small groupby and a
    broadcast join. Labels are exact min-ids (densify=False), so output
    is independent of partitioning."""
    from igraph_ray.algorithms.components import (
        component_sizes,
        connected_components,
    )

    def _as_edges(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": pc.cast(b[a_col], pa.int64()),
                         "dst": pc.cast(b[b_col], pa.int64())})

    edges = pairs.map_batches(_as_edges, batch_format="pyarrow", batch_size=None)
    g = Graph(edges)  # sparse universe: exactly the pair endpoints
    state = connected_components(
        g, num_partitions=num_partitions, densify=False
    ).state  # (vertex, label) with label = min vertex id in component
    sizes = component_sizes(state)
    joined = hash_join(state, sizes, on="label", num_partitions=num_partitions)

    def _project(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"member_id": pa.array([], pa.int64()),
                             "keep_id": pa.array([], pa.int64()),
                             "cluster_size": pa.array([], pa.int64())})
        return pa.table({"member_id": pc.cast(b["vertex"], pa.int64()),
                         "keep_id": pc.cast(b["label"], pa.int64()),
                         "cluster_size": pc.cast(b["csize"], pa.int64())})

    return joined.map_batches(_project, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# per-document word statistics (repetition ratio)
# --------------------------------------------------------------------------

def _token_table(b: pa.Table, text_col: str) -> tuple:
    """Flatten a document batch into (row_idx, token) arrays with one
    Arrow kernel chain: lower → collapse non-alnum runs to spaces →
    split → drop empties. Equivalent to regexp_extract_all('[a-z0-9]+')."""
    txt = b[text_col].combine_chunks() if isinstance(
        b[text_col], pa.ChunkedArray) else b[text_col]
    clean = pc.replace_substring_regex(pc.utf8_lower(txt), _WORD_SEP, " ")
    lst = pc.split_pattern(clean, " ")
    flat = pc.list_flatten(lst)
    lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
    mask = pc.not_equal(flat, "")
    return row_idx[mask.to_numpy(zero_copy_only=False)], flat.filter(mask)


def word_stats(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_words, top_tf, rep_ratio_e6): total word tokens, count
    of the most frequent token, and the Gopher-style repetition signal
    top_tf·10⁶ ÷ n_words (integer division, 0 for empty docs). High
    values flag boilerplate / keyword-stuffed documents.

    Fully vectorized: Arrow split kernels + one Arrow group_by per batch;
    each document's text lives entirely inside its row, so per-batch
    grouping is globally correct."""

    def _f(b: pa.Table) -> pa.Table:
        n_words = np.zeros(b.num_rows, dtype=np.int64)
        top_tf = np.zeros(b.num_rows, dtype=np.int64)
        if b.num_rows:
            row_idx, toks = _token_table(b, text_col)
            if len(row_idx):
                tf = (
                    pa.table({"r": pa.array(row_idx, pa.int64()), "t": toks})
                    .group_by(["r", "t"])
                    .aggregate([("t", "count")])
                )
                r = tf["r"].to_numpy(zero_copy_only=False)
                c = tf["t_count"].to_numpy(zero_copy_only=False).astype(np.int64)
                np.add.at(n_words, r, c)
                np.maximum.at(top_tf, r, c)
        ratio = np.zeros(b.num_rows, dtype=np.int64)
        nz = n_words > 0
        ratio[nz] = top_tf[nz] * 1_000_000 // n_words[nz]
        return pa.table(
            {"doc_id": b["doc_id"],
             "n_words": pa.array(n_words, pa.int64()),
             "top_tf": pa.array(top_tf, pa.int64()),
             "rep_ratio_e6": pa.array(ratio, pa.int64())})

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# tf-idf salient terms
# --------------------------------------------------------------------------

def term_freqs(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, term, tf): one row per distinct word token per document."""

    def _f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        row_idx, toks = _token_table(b, text_col)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        tf = (
            pa.table({"doc_id": pa.array(ids[row_idx], pa.int64()), "t": toks})
            .group_by(["doc_id", "t"])
            .aggregate([("t", "count")])
        )
        return pa.table({"doc_id": tf["doc_id"],
                         "term": tf["t"],
                         "tf": pc.cast(tf["t_count"], pa.int64())})

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


def top_terms(
    docs: ray.data.Dataset,
    k: int = 3,
    text_col: str = "text",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(doc_id, term, tf, df): the k most salient terms per document,
    ranked tf-idf-style by (tf DESC, df ASC, term ASC) — the
    integer-exact analogue of tf·log(N/df) ordering (log is monotone in
    1/df, and the lexical tie-break pins equalities), so results are
    bit-reproducible at any parallelism and in SQL.

    Scale shape: document frequency is one pre-combined groupby over the
    (doc, term) table (already unique per doc, so no row explosion
    beyond the token vocabulary); the df side joins back via the
    broadcast/partitioned hash join; the final per-document top-k uses a
    boundary-aligned sort so each document's terms stay in one block."""
    tf = term_freqs(docs, text_col).materialize()

    dfd = tf.groupby("term").count()

    def _rename(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "term" not in b.column_names:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        return pa.table({"term": b["term"], "df": pc.cast(b["count()"], pa.int64())})

    dfd = dfd.map_batches(_rename, batch_format="pyarrow", batch_size=None)
    joined = hash_join(tf, dfd, on="term", num_partitions=num_partitions).materialize()

    from igraph_ray.csr import compute_boundaries

    bnds = compute_boundaries(joined, num_partitions=num_partitions, col="doc_id")
    s = (joined.sort(["doc_id", "term"], boundaries=bnds)
         if bnds else joined.sort(["doc_id", "term"]))

    def _topk(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "term": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64()),
                          "df": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        t = np.asarray(b["term"].to_pylist(), dtype=object)
        f = b["tf"].to_numpy(zero_copy_only=False)
        g = b["df"].to_numpy(zero_copy_only=False)
        # stable sort by (doc, -tf, df, term); input is already
        # term-sorted within doc, so lexical ties resolve correctly
        order = np.lexsort((g, -f, d))
        d, t, f, g = d[order], t[order], f[order], g[order]
        keep = np.zeros(len(d), dtype=bool)
        count, prev = 0, None
        for i in range(len(d)):
            if d[i] != prev:
                prev, count = d[i], 0
            if count < k:
                keep[i] = True
                count += 1
        return pa.table({"doc_id": pa.array(d[keep], pa.int64()),
                         "term": pa.array(list(t[keep]), pa.string()),
                         "tf": pa.array(f[keep], pa.int64()),
                         "df": pa.array(g[keep], pa.int64())})

    return s.map_batches(_topk, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# deterministic stratified sampling
# --------------------------------------------------------------------------

def stratified_sample(
    docs: ray.data.Dataset,
    rates_permille: Dict[str, int],
    default_permille: int = 0,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic per-stratum downsampling: a document is kept iff the
    first 8 hex chars of md5(str(doc_id)) compare below the stratum's
    threshold ``format(rate·2³²//1000, '08x')``. The rule is a pure
    function of the id — reproducible at any parallelism, independent of
    row order, and expressible verbatim in SQL (md5 + substr + string
    compare), unlike rand()-based sampling.

    Embarrassingly parallel (one md5 per row, no shuffle). At 100 TB the
    md5 loop is the only per-row Python here; it is the same digest
    primitive exact_dedup already pays and stays ~1 µs/row."""
    thresholds = {
        s: format((r << 32) // 1000, "08x") for s, r in rates_permille.items()
    }
    default_thr = format((default_permille << 32) // 1000, "08x")

    def _f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        ids = b[id_col].to_numpy(zero_copy_only=False)
        strata = b[strata_col].to_pylist()
        keep = np.fromiter(
            (
                hashlib.md5(str(int(i)).encode()).hexdigest()[:8]
                < thresholds.get(s, default_thr)
                for i, s in zip(ids, strata)
            ),
            dtype=bool,
            count=len(ids),
        )
        return b.filter(pa.array(keep))

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# benchmark decontamination: n-gram overlap against a broadcast shingle set
# --------------------------------------------------------------------------

def _shingle_strings(b: pa.Table, text_col: str, n: int):
    """Per-row n-gram shingles as space-joined strings, fully on Arrow
    kernels: flatten tokens, window over the flat array, mask windows
    that cross a document boundary. Returns (row_idx, shingles)."""
    row_idx, toks = _token_table(b, text_col)
    if len(row_idx) < n:
        return np.empty(0, np.int64), pa.array([], pa.string())
    m = len(row_idx) - n + 1
    valid = row_idx[:m] == row_idx[n - 1 :]
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    parts = [toks.slice(k, m) for k in range(n)]
    sh = pc.binary_join_element_wise(*parts, " ")
    vmask = pa.array(valid)
    return row_idx[:m][valid], sh.filter(vmask)


def ngram_contamination(
    docs: ray.data.Dataset,
    benchmark_mod: int = 41,
    n: int = 5,
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, contaminated, total_ngrams): per document, how many of
    its word n-gram shingles appear in the benchmark shingle set — the
    train/eval decontamination check every large-scale training-data
    pipeline needs (exact n-gram overlap flavor). The "benchmark" here
    is the deterministic subset ``doc_id % benchmark_mod == 0`` so the
    operator is oracle-checkable; a real run passes the eval-suite docs
    instead.

    Scale shape: benchmark/eval suites are small (MBs) next to the
    corpus, so the distinct benchmark shingles are assembled once and
    ``ray.put`` into the object store; every corpus batch runs one
    vectorized ``pc.is_in`` membership probe against the broadcast set —
    no shuffle of the corpus at all. Counts include multiplicity;
    documents shorter than n tokens report (0, 0).
    """
    import ray as _ray

    def _bench(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or text_col not in b.column_names:
            return pa.table({"s": pa.array([], pa.string())})
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids % benchmark_mod == 0))
        if b.num_rows == 0:
            return pa.table({"s": pa.array([], pa.string())})
        _, sh = _shingle_strings(b, text_col, n)
        return pa.table({"s": sh.unique() if len(sh) else sh})

    refs = (
        docs.map_batches(_bench, batch_format="pyarrow", batch_size=None)
        .materialize().to_arrow_refs()
    )

    @_ray.remote
    def _assemble(*tables):
        arrs = [t["s"] for t in tables if t.num_rows]
        if not arrs:
            return pa.array([], pa.string())
        return pa.concat_tables(
            [pa.table({"s": a}) for a in arrs])["s"].combine_chunks().unique()

    bench_ref = _assemble.remote(*refs)

    from igraph_ray.util import _fetch_small

    def _probe(b: pa.Table) -> pa.Table:
        """Plain task probe: the broadcast shingle set is fetched once
        per worker process (zero-copy plasma get, _fetch_small cache) —
        same amortization as an actor pool without the pool's startup
        cost, and the stage fuses with its neighbors."""
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "contaminated": pa.array([], pa.int64()),
                             "total_ngrams": pa.array([], pa.int64())})
        bench = _fetch_small(bench_ref)
        row_idx, sh = _shingle_strings(b, text_col, n)
        total = np.zeros(b.num_rows, np.int64)
        cont = np.zeros(b.num_rows, np.int64)
        if len(row_idx):
            np.add.at(total, row_idx, 1)
            hits = pc.is_in(sh, value_set=bench).to_numpy(
                zero_copy_only=False)
            np.add.at(cont, row_idx, hits.astype(np.int64))
        return pa.table({"doc_id": b["doc_id"],
                         "contaminated": pa.array(cont, pa.int64()),
                         "total_ngrams": pa.array(total, pa.int64())})

    return docs.map_batches(_probe, batch_format="pyarrow",
                            batch_size=None)


# --------------------------------------------------------------------------
# composite quality filter (the Gopher-rule keep/drop decision)
# --------------------------------------------------------------------------

def quality_filter(
    docs: ray.data.Dataset,
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    max_rep_e6: int = 200_000,
    max_punct_e6: int = 300_000,
) -> ray.data.Dataset:
    """(doc_id, n_words, rep_ratio_e6, punct_ratio_e6, reasons, keep):
    the composite keep/drop decision a curation pipeline applies per
    document (Gopher-style rule set), with the triggering rules encoded
    as bits so downstream audits can count drop reasons exactly:

      bit 1 = too few words, bit 2 = too many words,
      bit 4 = top-token repetition ratio above threshold,
      bit 8 = punctuation-character ratio above threshold.

    All signals are exact integers (ratios e6-scaled by integer
    division), so the decision is bit-reproducible at any parallelism
    and against the SQL oracle. One pass, no shuffle: every signal is
    computable inside the document's own row.
    """

    def _f(b: pa.Table) -> pa.Table:
        nrows = b.num_rows
        n_words = np.zeros(nrows, np.int64)
        top_tf = np.zeros(nrows, np.int64)
        if nrows:
            row_idx, toks = _token_table(b, text_col)
            if len(row_idx):
                tf = (
                    pa.table({"r": pa.array(row_idx, pa.int64()), "t": toks})
                    .group_by(["r", "t"])
                    .aggregate([("t", "count")])
                )
                r = tf["r"].to_numpy(zero_copy_only=False)
                c = tf["t_count"].to_numpy(zero_copy_only=False).astype(np.int64)
                np.add.at(n_words, r, c)
                np.maximum.at(top_tf, r, c)
        txt = b[text_col]
        n_chars = pc.cast(pc.utf8_length(txt), pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_punct = pc.cast(
            pc.count_substring_regex(txt, r"[^\sA-Za-z0-9]"), pa.int64()
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        rep = np.zeros(nrows, np.int64)
        nz = n_words > 0
        rep[nz] = top_tf[nz] * 1_000_000 // n_words[nz]
        punct = np.zeros(nrows, np.int64)
        cz = n_chars > 0
        punct[cz] = n_punct[cz] * 1_000_000 // n_chars[cz]
        reasons = (
            (n_words < min_words) * 1
            + (n_words > max_words) * 2
            + (rep > max_rep_e6) * 4
            + (punct > max_punct_e6) * 8
        ).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "rep_ratio_e6": pa.array(rep, pa.int64()),
            "punct_ratio_e6": pa.array(punct, pa.int64()),
            "reasons": pa.array(reasons, pa.int64()),
            "keep": pa.array((reasons == 0).astype(np.int64), pa.int64()),
        })

    return docs.map_batches(_f, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# full curation pipeline: quality filter + exact-dup resolution +
# benchmark decontamination, one decision row per document
# --------------------------------------------------------------------------

def curate(
    docs: ray.data.Dataset,
    benchmark_mod: int = 10,
    n: int = 5,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(doc_id, reasons, kept): the end-to-end keep/drop decision a
    training-data curation run makes per document, composing the
    engine's own stages —

      bits 1/2/4/8 : quality_filter rule hits (length / repetition /
                     punctuation),
      bit 16       : exact duplicate that is not its group's keeper
                     (min doc_id per identical text, the exact_dedup
                     contract),
      bit 32       : benchmark contamination (more than half of the
                     document's n-gram shingles appear in the
                     benchmark subset; division-free integer rule
                     ``2·contaminated > total``).

    kept = (reasons == 0). Scale shape inherited from the parts: the
    quality pass is shuffle-free, dedup is one md5 groupby, the
    contamination probe is a broadcast membership test; the final
    assembly is two doc_id joins.
    """
    # all sides stay LAZY map chains where the broadcast-join plan
    # allows it (lazy_left skips the left sanitize materialize;
    # right_map folds projections into the broadcast assembly task) —
    # the whole decision chain then runs as ONE streaming execution
    # instead of paying a fixed executor launch per stage boundary.
    qf = quality_filter(docs)
    cont = ngram_contamination(docs, benchmark_mod=benchmark_mod, n=n)

    from igraph_ray.ops.dedup import dedup_from_hashes, hash_docs

    # one md5 pass over the corpus feeds BOTH the keeper groupby and
    # the per-doc dup join (hash_docs emits keep_id = doc_id per row)
    per_doc = hash_docs(docs).materialize()
    keepers = dedup_from_hashes(per_doc)

    def _pd(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "text_md5" not in b.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "text_md5": pa.array([], pa.string())})
        return pa.table({"doc_id": b["keep_id"], "text_md5": b["text_md5"]})

    hashed = per_doc.map_batches(_pd, batch_format="pyarrow",
                                 batch_size=None)

    def _k(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "text_md5" not in b.column_names:
            return pa.table({"text_md5": pa.array([], pa.string()),
                             "keep_id": pa.array([], pa.int64())})
        return pa.table({"text_md5": b["text_md5"], "keep_id": b["keep_id"]})

    dup = hash_join(
        hashed, keepers,
        on="text_md5", num_partitions=num_partitions,
        lazy_left=True, right_map=_k)

    def _dbit(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dbit": pa.array([], pa.int64())})
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = b["keep_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "dbit": pa.array((d != k).astype(np.int64) * 16)})

    dup = dup.map_batches(_dbit, batch_format="pyarrow", batch_size=None)

    def _q(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"], "qreasons": b["reasons"]})

    def _c(b: pa.Table) -> pa.Table:
        c = b["contaminated"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b["total_ngrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "cbit": pa.array((2 * c > t).astype(np.int64) * 32)})

    j = hash_join(
        qf.map_batches(_q, batch_format="pyarrow", batch_size=None),
        dup, on="doc_id", num_partitions=num_partitions, lazy_left=True)
    j = hash_join(
        j, cont, on="doc_id", num_partitions=num_partitions,
        lazy_left=True, right_map=_c)

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "reasons": pa.array([], pa.int64()),
                             "kept": pa.array([], pa.int64())})
        r = (b["qreasons"].to_numpy(zero_copy_only=False).astype(np.int64)
             + b["dbit"].to_numpy(zero_copy_only=False).astype(np.int64)
             + b["cbit"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"doc_id": b["doc_id"],
                         "reasons": pa.array(r, pa.int64()),
                         "kept": pa.array((r == 0).astype(np.int64))})

    return j.map_batches(_final, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# approximate distinct-token count (HyperLogLog vocabulary sketch)
# --------------------------------------------------------------------------

_HLL_M = 8


def _hll_parts(tokens) -> tuple:
    """(bucket, rho) per token string — md5-derived, identical to the
    SQL ladder (bucket = first hex nibble % 8; rho = 1 + leading zero
    bits of the 16-bit int from hex chars 2..5)."""
    b = np.empty(len(tokens), np.int64)
    r = np.empty(len(tokens), np.int64)
    for i, t in enumerate(tokens):
        h = hashlib.md5(t.encode()).hexdigest()
        b[i] = int(h[0], 16) % _HLL_M
        x = int(h[1:5], 16)
        r[i] = 17 if x == 0 else 16 - x.bit_length() + 1
    return b, r


def token_hll(docs: ray.data.Dataset, text_col: str = "text",
              by: str = "lang") -> ray.data.Dataset:
    """(group, r0..r7): HyperLogLog registers of the DISTINCT word-token
    set per group — the approximate-vocabulary-size sketch a 100-TB
    curation run uses instead of an exact distinct count (which is an
    all-to-all shuffle of every token). Registers are max-merges, so
    per-batch pre-combines collapse the token stream to ≤ groups×8 rows
    before the one tiny groupby; the registers are exact integers
    (functions of the distinct-token set only) and hash-match the SQL
    oracle. Estimate: alpha_8·64/Σ 2^{-r_b}.
    """

    def _f(b: pa.Table) -> pa.Table:
        cols = {"g": pa.array([], pa.string()),
                "b": pa.array([], pa.int64()),
                "rho": pa.array([], pa.int64())}
        if b.num_rows == 0 or text_col not in b.column_names:
            return pa.table(cols)
        row_idx, toks = _token_table(b, text_col)
        if len(row_idx) == 0:
            return pa.table(cols)
        grp = b[by].to_numpy(zero_copy_only=False)[row_idx]
        t = pa.table({"g": pa.array(grp),
                      "t": toks})
        t = t.group_by(["g", "t"]).aggregate([])  # local distinct
        buckets, rhos = _hll_parts(t["t"].to_pylist())
        tt = pa.table({"g": t["g"], "b": pa.array(buckets),
                       "rho": pa.array(rhos)})
        return (pa.TableGroupBy(tt, ["g", "b"]).aggregate([("rho", "max")])
                .rename_columns(["g", "b", "rho"]))

    regs = (docs.map_batches(_f, batch_format="pyarrow", batch_size=None)
            .groupby(["g", "b"]).max("rho")).take_all()
    agg: Dict[str, list] = {}
    for r in regs:
        agg.setdefault(r["g"], [0] * _HLL_M)[int(r["b"])] = int(r["max(rho)"])
    groups = sorted(agg)
    out = {"group": pa.array(groups, pa.string())}
    for b in range(_HLL_M):
        out[f"r{b}"] = pa.array([agg[g][b] for g in groups], pa.int64())
    return pa.table(out)


# --------------------------------------------------------------------------
# Count-Min sketch of token frequencies (heavy-hitter estimation)
# --------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 64


def token_cms(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(d, slot, cnt): a depth-4 × width-64 Count-Min sketch of the
    corpus token-frequency vector — the heavy-hitter estimator a 100-TB
    run uses instead of a full token groupby (est(count(t)) =
    min_d cms[d][h_d(t)], an overestimate with the usual CM guarantee).

    Counters are plain sums, so per-batch partial sketches collapse the
    token stream to ≤ 256 rows before one tiny groupby, and the final
    counters are exact integers the SQL oracle reproduces
    (h_d(token) = int(md5('d:token')[:8], 16) % 64).
    """

    def _f(b: pa.Table) -> pa.Table:
        cols = {"d": pa.array([], pa.int64()),
                "slot": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64())}
        if b.num_rows == 0 or text_col not in b.column_names:
            return pa.table(cols)
        row_idx, toks = _token_table(b, text_col)
        if len(row_idx) == 0:
            return pa.table(cols)
        # local tf first: hash each DISTINCT token once, weight by count
        tf = (pa.table({"t": toks})
              .group_by("t").aggregate([([], "count_all")]))
        words = tf["t"].to_pylist()
        cnts = tf["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        sketch = np.zeros((_CMS_D, _CMS_W), np.int64)
        for w, c in zip(words, cnts):
            for d in range(_CMS_D):
                h = hashlib.md5(f"{d}:{w}".encode()).hexdigest()
                sketch[d, int(h[:8], 16) % _CMS_W] += c
        dd, ss = np.nonzero(sketch)
        return pa.table({"d": pa.array(dd.astype(np.int64)),
                         "slot": pa.array(ss.astype(np.int64)),
                         "cnt": pa.array(sketch[dd, ss])})

    out = (docs.map_batches(_f, batch_format="pyarrow", batch_size=None)
           .groupby(["d", "slot"]).sum("cnt"))

    def _rn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "d" not in b.column_names:
            return pa.table({"d": pa.array([], pa.int64()),
                             "slot": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"d": b["d"], "slot": b["slot"],
                         "cnt": pc.cast(b["sum(cnt)"], pa.int64())})

    return out.map_batches(_rn, batch_format="pyarrow",
                           batch_size=None).sort(["d", "slot"])


def cms_estimate(cms_rows, token: str) -> int:
    """Point estimate from a collected sketch: min over depths."""
    table = {(int(r["d"]), int(r["slot"])): int(r["cnt"]) for r in cms_rows}
    est = None
    for d in range(_CMS_D):
        h = hashlib.md5(f"{d}:{token}".encode()).hexdigest()
        v = table.get((d, int(h[:8], 16) % _CMS_W), 0)
        est = v if est is None else min(est, v)
    return int(est or 0)


# --------------------------------------------------------------------------
# negative sampling for pair/embedding training
# --------------------------------------------------------------------------

def negative_sample(
    pairs: ray.data.Dataset,
    num_items: int,
    k: int = 4,
    seed: int = 17,
    user_col: str = "user",
    item_col: str = "item",
) -> ray.data.Dataset:
    """k uniform negative items per positive (user, item) pair — the
    word2vec/two-tower training-data primitive. Draw j for a pair is
    the indexed md5 fold ``md5(seed:user:item:j)[:15] % num_items``:
    a pure function of the pair, so the sample is reproducible at any
    parallelism and row order and replayable verbatim in SQL
    (the engine's games.c draw scheme). Accidental positives are KEPT
    (the standard word2vec contract — rejection would make draw j
    depend on the global positive set and cost a join; callers who
    need clean negatives anti-join the output once).

    Embarrassingly parallel: one md5 per (pair, j), no shuffle; the
    k-way expansion happens task-side."""

    def _f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or user_col not in b.column_names:
            return pa.table({user_col: pa.array([], pa.int64()),
                             item_col: pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "neg_item": pa.array([], pa.int64())})
        u = b[user_col].to_numpy(zero_copy_only=False)
        it = b[item_col].to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(b.num_rows), k)
        js = np.tile(np.arange(k, dtype=np.int64), b.num_rows)
        neg = np.fromiter(
            (int(hashlib.md5(
                f"{seed}:{int(u[r])}:{int(it[r])}:{int(j)}".encode())
                .hexdigest()[:15], 16) % num_items
             for r, j in zip(rows, js)),
            dtype=np.int64, count=len(rows))
        return pa.table({user_col: pa.array(u[rows].astype(np.int64)),
                         item_col: pa.array(it[rows].astype(np.int64)),
                         "j": pa.array(js),
                         "neg_item": pa.array(neg)})

    return pairs.map_batches(_f, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# per-group caps (grouped deterministic top-n)
# --------------------------------------------------------------------------

def cap_per_group(
    docs: ray.data.Dataset,
    n: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Keep at most ``n`` documents per group, deterministically — the
    "cap every domain at N pages" curation primitive. The kept set is
    the n smallest (md5(id) fold, id) keys within each group: a pure
    function of ids, so the answer is identical at any parallelism
    and row order (same rationale as stratified_sample) and replayable
    in SQL as ROW_NUMBER() over the same key.

    Distributed shape — grouped top-k with a combiner: every batch
    first prunes itself to <= n rows per group (vectorized lexsort +
    run-length head), so at most n x num_blocks rows per group enter
    the ONE boundary-aligned range exchange on the group key (string
    groups ride a deterministic int64 hash, like asof_join); the
    per-block head-n scan then needs no cross-block repair because a
    group never straddles sorted blocks."""

    def _key(ids) -> np.ndarray:
        return np.fromiter(
            (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:15], 16)
             for i in ids), dtype=np.int64, count=len(ids))

    import pandas as pd

    def _prune(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or group_col not in b.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             group_col: pa.array([], pa.string()),
                             "__k": pa.array([], pa.int64()),
                             "__gh": pa.array([], pa.int64())})
        ids = b[id_col].to_numpy(zero_copy_only=False)
        grp = b[group_col].to_numpy(zero_copy_only=False)
        gh = (pd.util.hash_array(grp)
              & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        # exact within-batch group identity (hash collisions must not
        # merge rank spaces): factorized codes, not the hash
        codes = pd.factorize(grp)[0]
        key = _key(ids)
        order = np.lexsort((ids, key, codes))
        cs = codes[order]
        newg = np.r_[True, cs[1:] != cs[:-1]]
        # rank within group = position - group start
        pos = np.arange(len(cs))
        start = np.maximum.accumulate(np.where(newg, pos, -1))
        keep = (pos - start) < n
        sel = pa.array(order[keep], pa.int64())
        return pa.table({id_col: pc.take(b[id_col], sel),
                         group_col: pc.take(b[group_col], sel),
                         "__k": pa.array(key[order][keep]),
                         "__gh": pa.array(gh[order][keep])})

    pruned = docs.map_batches(_prune, batch_format="pyarrow",
                              batch_size=None).materialize()

    from igraph_ray.csr import compute_boundaries

    bnds = compute_boundaries(pruned, num_partitions=num_partitions,
                              col="__gh")
    s = (pruned.sort(["__gh", group_col, "__k", id_col], boundaries=bnds)
         if bnds else pruned.sort(["__gh", group_col, "__k", id_col]))

    def _head(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or group_col not in b.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             group_col: pa.array([], pa.string())})
        grp = b[group_col].to_numpy(zero_copy_only=False)
        newg = np.r_[True, grp[1:] != grp[:-1]]
        pos = np.arange(len(grp))
        start = np.maximum.accumulate(np.where(newg, pos, -1))
        keep = (pos - start) < n
        sel = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table({id_col: pc.take(b[id_col], sel),
                         group_col: pc.take(b[group_col], sel)})

    return s.map_batches(_head, batch_format="pyarrow", batch_size=None)


def dup_ngram_stats(docs: ray.data.Dataset, n: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """(doc_id, n_ngrams, dup_e6): the Gopher-style duplicate-n-gram
    signal (Rae et al. 2021 §A1.1 "fraction of duplicate n-grams") as
    exact integers: total word n-grams per document and
    (total − distinct)·10⁶ // total (0 for docs shorter than n words).
    High values flag templated / repetitive text that the top-token
    rep_ratio misses.

    Vectorized: the shared token flattener, one element-wise string
    join for the n-gram keys, one Arrow group_by per batch (documents
    never span batches)."""

    def _f(b: pa.Table) -> pa.Table:
        total = np.zeros(b.num_rows, dtype=np.int64)
        uniq = np.zeros(b.num_rows, dtype=np.int64)
        if b.num_rows:
            row_idx, toks = _token_table(b, text_col)
            if len(row_idx) >= n:
                same = np.ones(len(row_idx) - (n - 1), dtype=bool)
                for k in range(1, n):
                    same &= row_idx[k:len(row_idx) - (n - 1) + k] == \
                        row_idx[:len(row_idx) - (n - 1)]
                if same.any():
                    parts = [toks.slice(k, len(row_idx) - (n - 1))
                             for k in range(n)]
                    seps = [" "] * (n - 1)
                    ng = pc.binary_join_element_wise(
                        *parts, pa.scalar(" "))
                    keep = pa.array(same)
                    ngk = ng.filter(keep)
                    rk = row_idx[:len(row_idx) - (n - 1)][same]
                    gb = (pa.table({"r": pa.array(rk, pa.int64()),
                                    "g": ngk})
                          .group_by(["r", "g"]).aggregate([("g", "count")]))
                    r = gb["r"].to_numpy(zero_copy_only=False)
                    c = gb["g_count"].to_numpy(
                        zero_copy_only=False).astype(np.int64)
                    np.add.at(total, r, c)
                    np.add.at(uniq, r, np.ones(len(r), np.int64))
        dup = np.zeros(b.num_rows, dtype=np.int64)
        nz = total > 0
        dup[nz] = (total[nz] - uniq[nz]) * 1_000_000 // total[nz]
        return pa.table({id_col: b[id_col],
                         "n_ngrams": pa.array(total),
                         "dup_e6": pa.array(dup)})

    return docs.map_batches(_f, batch_format="pyarrow")


def lm_surprisal(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """CCNet-style corpus-LM quality scoring (Wenzek et al. 2020 score
    documents by LM perplexity; here the LM is the corpus's own bigram
    model) with the repo's integer-exact contract: per doc-bigram
    (w1, w2) the surprisal is (c(w1,·) << 20) // c(w1, w2) — exactly
    2^20 / p(w2|w1) under integer division, monotone in −log p — and
    the doc score is the exact integer sum. High mean surprisal flags
    documents whose word transitions are rare in the corpus (noise,
    gibberish); low values flag boilerplate. Returns (doc_id,
    n_bigrams, surprisal_sum, mean_surprisal); docs with < 2 tokens
    score 0.

    Scale shape: one tokenize pass emits the doc-bigram stream; bigram
    and context counts are grouped aggregates over that stream
    (per-batch pre-combined); the scoring pass is two hash-joins of
    the stream against the count tables and one grouped sum — no
    driver-side state, no all-pairs anything."""

    def _bigrams(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or text_col not in b.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string())})
        row_idx, toks = _token_table(b, text_col)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(row_idx) < 2:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string())})
        same = row_idx[1:] == row_idx[:-1]
        return pa.table({
            id_col: pa.array(ids[row_idx[:-1][same]]),
            "w1": toks.slice(0, len(toks) - 1).filter(pa.array(same)),
            "w2": toks.slice(1).filter(pa.array(same))})

    bg = docs.map_batches(_bigrams, batch_format="pyarrow",
                          batch_size=None).materialize()

    def _pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({"w1": b["w1"], "w2": b["w2"],
                      "c": pa.array(np.ones(b.num_rows, np.int64))})
        return (t.group_by(["w1", "w2"]).aggregate([("c", "sum")])
                .rename_columns(["w1", "w2", "c"]))

    bcounts = (bg.map_batches(_pre, batch_format="pyarrow",
                              batch_size=None)
               .groupby(["w1", "w2"]).sum("c"))
    bcounts = bcounts.map_batches(
        lambda b: (pa.table({"w1": b["w1"], "w2": b["w2"],
                             "cb": b["sum(c)"]})
                   if b.num_rows else
                   pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "cb": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None).materialize()
    ucounts = bcounts.groupby("w1").sum("cb").map_batches(
        lambda b: (pa.table({"w1": b["w1"], "cu": b["sum(cb)"]})
                   if b.num_rows else
                   pa.table({"w1": pa.array([], pa.string()),
                             "cu": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None)
    j = hash_join(bg, bcounts, on=("w1", "w2"),
                  num_partitions=num_partitions)
    j = hash_join(j, ucounts, on="w1", num_partitions=num_partitions)

    def _score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64())})
        cu = b["cu"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = b["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({id_col: b[id_col],
                      "s": pa.array((cu << 20) // cb),
                      "nb": pa.array(np.ones(b.num_rows, np.int64))})
        return (t.group_by([id_col])
                .aggregate([("s", "sum"), ("nb", "sum")])
                .rename_columns([id_col, "s", "nb"]))

    agg = (j.map_batches(_score, batch_format="pyarrow", batch_size=None)
           .groupby(id_col).sum(["s", "nb"]))
    agg = agg.map_batches(
        lambda b: (pa.table({id_col: b[id_col], "ssum": b["sum(s)"],
                             "nb": b["sum(nb)"]})
                   if b.num_rows else
                   pa.table({id_col: pa.array([], pa.int64()),
                             "ssum": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64())})),
        batch_format="pyarrow", batch_size=None)
    base = docs.map_batches(
        lambda b: pa.table({id_col: b[id_col]}),
        batch_format="pyarrow", batch_size=None)
    out = hash_join(base, agg, on=id_col, num_partitions=num_partitions,
                    join_type="left_outer")

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_bigrams": pa.array([], pa.int64()),
                             "surprisal_sum": pa.array([], pa.int64()),
                             "mean_surprisal": pa.array([], pa.int64())})
        # fill nulls on the int64 columns directly — a float64 detour
        # would silently round sums above 2^53 and break the
        # integer-exact oracle contract.  When the corpus yields zero
        # bigrams (every doc < 2 tokens) the broadcast left_outer join
        # passes left blocks through without the right-side columns at
        # all — honor the "docs with < 2 tokens score 0" contract by
        # treating the absent columns as all-zero.
        if "ssum" not in b.column_names:
            z = np.zeros(b.num_rows, np.int64)
            return pa.table({id_col: b[id_col],
                             "n_bigrams": pa.array(z),
                             "surprisal_sum": pa.array(z),
                             "mean_surprisal": pa.array(z)})
        ss = pc.fill_null(pc.cast(b["ssum"], pa.int64()), 0).to_numpy(
            zero_copy_only=False)
        nb = pc.fill_null(pc.cast(b["nb"], pa.int64()), 0).to_numpy(
            zero_copy_only=False)
        return pa.table({
            id_col: b[id_col],
            "n_bigrams": pa.array(nb),
            "surprisal_sum": pa.array(ss),
            "mean_surprisal": pa.array(
                np.where(nb > 0, ss // np.maximum(nb, 1), 0))})

    return out.map_batches(_final, batch_format="pyarrow",
                           batch_size=None)
