"""The code-corpus source: (repo, path, commit, lang, content) → edge table.

This is the engine's analogue of igraph's foreign readers (foreign.c): raw
external bytes → canonical edge table + string→id vocabulary (the NCOL
reader builds a trie of symbolic names → dense ids, foreign.c:133+; here
the vocabulary is a sorted-distinct + dense-rank Dataset).

Corpus schema is mandated by BASELINE.json's input hint:
    repo:string, path:string, commit:string, lang:string, content:string
Edges are repo→repo import/dependency links parsed from ``content`` per
``lang`` with compiled regexes. The extractor is a stateful map_batches
stage (actor pool): patterns compile once per actor in ``__init__``, each
``__call__`` is vectorized over an Arrow batch.

Also includes the deterministic synthetic-corpus generator (FIXTURES.md
§1): it *inverts* a planted edge list into file contents, so
extractor-output == planted-edges is an exact end-to-end test, and a
sidecar manifest records sha256(content) per row for the per-row
invariant check.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.graph import Graph
from igraph_ray.util import dense_rank_map, hash_join

LANGS = ["python", "go", "rust", "js"]
_EXT = {"python": "py", "go": "go", "rust": "rs", "js": "js"}

# repo name token per language; all syntaxes embed the repo name
# "orgNNN/repoNNNNNN" in a recoverable form
def _import_line(lang: str, repo: str) -> str:
    if lang == "python":
        return f"import {repo.replace('/', '.')}"
    if lang == "go":
        return f'import "github.com/{repo}"'
    if lang == "rust":
        return f"use {repo.replace('/', '_')}::prelude;"
    return f'const dep = require("@{repo}");'


# extractor regexes — one per language, compiled once per actor
_PATTERNS: Dict[str, Tuple[str, str]] = {
    # (pattern with one capture group, transform key)
    "python": (r"^import ([A-Za-z0-9_]+\.[A-Za-z0-9_]+)$", "dot"),
    "go": (r'^import "github\.com/([A-Za-z0-9_\-./]+)"$', "plain"),
    "rust": (r"^use ([A-Za-z0-9_]+)::prelude;$", "underscore"),
    "js": (r'require\("@([A-Za-z0-9_\-./]+)"\)', "plain"),
}


def _decode(token: str, how: str) -> str:
    if how == "dot":
        return token.replace(".", "/", 1)
    if how == "underscore":
        return token.replace("_", "/", 1)
    return token


def repo_name(i: int) -> str:
    """Vertex id ↔ repo name, chosen so lexicographic order == id order."""
    return f"org{i // 1000:04d}/repo{i:08d}"


def generate_corpus(
    src: np.ndarray,
    dst: np.ndarray,
    n_repos: int,
    seed: int = 42,
    max_files_per_repo: int = 4,
) -> Tuple[pa.Table, pa.Table]:
    """Invert a planted edge list into a deterministic corpus.

    Returns (corpus_table, manifest_table) where manifest has
    (repo, path, content_sha256) — the generator-side of the per-row
    sha256 invariant.
    """
    rng = np.random.default_rng(seed)
    out_edges: Dict[int, List[int]] = {}
    for s, t in zip(src, dst):
        out_edges.setdefault(int(s), []).append(int(t))

    repos, paths, commits, langs, contents, shas = [], [], [], [], [], []
    for i in range(n_repos):
        name = repo_name(i)
        deps = out_edges.get(i, [])
        nfiles = int(rng.integers(1, max_files_per_repo + 1))
        buckets: List[List[int]] = [[] for _ in range(nfiles)]
        for k, d in enumerate(deps):
            buckets[k % nfiles].append(d)
        for f in range(nfiles):
            lang = LANGS[int(rng.integers(0, len(LANGS)))]
            path = f"src/mod{f}.{_EXT[lang]}"
            lines = [f"// {name} {path}" if lang != "python" else f"# {name} {path}"]
            for d in buckets[f]:
                lines.append(_import_line(lang, repo_name(d)))
            # deterministic filler
            h = hashlib.sha256(f"{name}:{path}:{seed}".encode()).hexdigest()
            lines.append(f"const_filler = '{h[:16]}'" if lang == "python" else f"// filler {h[:16]}")
            content = "\n".join(lines) + "\n"
            repos.append(name)
            paths.append(path)
            commits.append(hashlib.sha256(f"{name}:{path}:{seed}:commit".encode()).hexdigest()[:40])
            langs.append(lang)
            contents.append(content)
            shas.append(hashlib.sha256(content.encode()).hexdigest())

    corpus = pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )
    manifest = pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "content_sha256": pa.array(shas, pa.string()),
        }
    )
    return corpus, manifest


class ImportExtractor:
    """Stateful map_batches stage: compiled regexes live per actor.

    Emits one row per parsed import: (src_repo, dst_repo) plus the row's
    content sha256 (for the per-row invariant; checked against the
    generator manifest downstream). The wide ``content`` column dies here
    — only narrow columns continue down the pipeline (SURVEY.md §7.4).
    """

    def __init__(self) -> None:
        self._compiled = {
            lang: (re.compile(pat, re.MULTILINE), how)
            for lang, (pat, how) in _PATTERNS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos = batch["repo"].to_pylist()
        langs = batch["lang"].to_pylist()
        contents = batch["content"].to_pylist()
        src_out, dst_out = [], []
        for repo, lang, content in zip(repos, langs, contents):
            rx, how = self._compiled[lang]
            for m in rx.findall(content):
                src_out.append(repo)
                dst_out.append(_decode(m, how))
        return pa.table(
            {
                "src_repo": pa.array(src_out, pa.string()),
                "dst_repo": pa.array(dst_out, pa.string()),
            }
        )


def content_sha256(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """(repo, path, content_sha256) — recomputed per row, vectorized batch
    loop (sha256 has no Arrow kernel; the loop is per batch, not per
    pipeline)."""

    def _sha(b: pa.Table) -> pa.Table:
        shas = [
            hashlib.sha256(c.encode()).hexdigest() for c in b["content"].to_pylist()
        ]
        return pa.table(
            {"repo": b["repo"], "path": b["path"],
             "content_sha256": pa.array(shas, pa.string())}
        )

    return corpus.map_batches(_sha, batch_format="pyarrow", batch_size=None)


def build_vocabulary(repo_names: ray.data.Dataset, col: str = "repo") -> ray.data.Dataset:
    """Sorted distinct repo names → dense ids: (repo, vertex).

    The Ray-Data analogue of the NCOL trie (foreign.c:133+): vocabulary
    order is lexicographic, ids contiguous from 0.
    """
    ranked = dense_rank_map(repo_names.select_columns([col]), col)

    def _rn(b: pa.Table) -> pa.Table:
        return pa.table({"repo": b[col], "vertex": b["rank"]})

    return ranked.map_batches(_rn, batch_format="pyarrow", batch_size=None)


def extract_edges(
    corpus: ray.data.Dataset,
    num_partitions: int = 8,
    concurrency: Optional[int] = None,
    vocabulary: Optional[ray.data.Dataset] = None,
) -> Tuple[ray.data.Dataset, ray.data.Dataset]:
    """corpus → (edges Dataset (src:int64, dst:int64), vocabulary).

    Vocabulary covers *all* repos seen as a file owner or an import target,
    so isolated repos (no imports either way) still get vertex ids.
    """
    pairs = corpus.map_batches(
        ImportExtractor,
        batch_format="pyarrow", batch_size=None,
        concurrency=concurrency or 2,
    ).materialize()

    if vocabulary is None:
        def _srcs(b: pa.Table) -> pa.Table:
            return pa.table({"repo": b["src_repo"]})

        def _dsts(b: pa.Table) -> pa.Table:
            return pa.table({"repo": b["dst_repo"]})

        def _owners(b: pa.Table) -> pa.Table:
            return pa.table({"repo": b["repo"]})

        names = (
            pairs.map_batches(_srcs, batch_format="pyarrow", batch_size=None)
            .union(pairs.map_batches(_dsts, batch_format="pyarrow", batch_size=None))
            .union(corpus.map_batches(_owners, batch_format="pyarrow", batch_size=None))
        )
        vocabulary = build_vocabulary(names).materialize()

    def _vsrc(b: pa.Table) -> pa.Table:
        return pa.table({"src_repo": b["repo"], "src": b["vertex"]})

    def _vdst(b: pa.Table) -> pa.Table:
        return pa.table({"dst_repo": b["repo"], "dst": b["vertex"]})

    j = hash_join(
        pairs, vocabulary.map_batches(_vsrc, batch_format="pyarrow", batch_size=None),
        on="src_repo", num_partitions=num_partitions,
    )
    j = hash_join(
        j, vocabulary.map_batches(_vdst, batch_format="pyarrow", batch_size=None),
        on="dst_repo", num_partitions=num_partitions,
    )
    edges = j.select_columns(["src", "dst"])
    return edges, vocabulary


def graph_from_corpus(corpus: ray.data.Dataset, num_partitions: int = 8) -> Tuple[Graph, ray.data.Dataset]:
    """End-to-end: corpus → Graph over the dense vocabulary ids."""
    edges, vocab = extract_edges(corpus, num_partitions=num_partitions)
    n = vocab.count()
    return Graph(edges.materialize(), n=n), vocab
