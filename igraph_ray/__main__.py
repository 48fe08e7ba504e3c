"""CLI runner: config → read parquet → one algorithm → write parquet.

The engine's analogue of the reference's generated shell interface
(interfaces/shell/interface.c.in: getopt parse → read graph → exactly one
library call → write result). Designed for ``ray job submit -- python -m
igraph_ray ...`` on a cluster; locally it initializes a local session
(guarded — never re-inits a provided one).

Examples:
  python -m igraph_ray pagerank --edges /tmp/edges.parquet --out /tmp/pr \
      --n 1048576 --damping 0.85 --tol 1e-9 --checkpoint /tmp/ck
  python -m igraph_ray components --edges /tmp/edges.parquet --out /tmp/cc
  python -m igraph_ray extract --corpus /tmp/corpus.parquet --out /tmp/edges
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _run_demo(args) -> dict:
    """North-star chain in ONE command: deterministic repo corpus ->
    curate keep/drop -> import-edge extraction (with the per-row
    content-sha256 invariant checked against the generator manifest) ->
    PageRank + components + LPA + triangle counts, all graph loops with
    per-superstep lineage checkpoints. Every stage commits a done-marker
    (<stage>.done.json, written atomically AFTER its partitioned parquet
    output) so a killed run skips finished stages on re-invocation, and
    an interrupted loop resumes from its last committed superstep via
    the CheckpointConfig contract — the re-run reproduces a fresh run
    bit-for-bit (tests/test_demo_resume.py)."""
    import hashlib
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from igraph_ray import (
        Graph,
        connected_components,
        label_propagation,
        pagerank,
        triangle_counts,
    )
    from igraph_ray.ops.curation import curate
    from igraph_ray.sources.corpus import extract_edges, generate_corpus
    from igraph_ray.superstep import CheckpointConfig
    from igraph_ray.util import hash_join

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    parts = args.partitions
    if parts is None:
        from igraph_ray.context import num_cpus
        parts = max(2, num_cpus())
    summary: dict = {"cmd": "demo", "workdir": wd}

    def marker(name: str) -> str:
        return os.path.join(wd, f"{name}.done.json")

    def is_done(name: str, *outputs: str) -> bool:
        """True if the stage's done-marker is committed. Otherwise the
        stage's partial parquet outputs (from a killed earlier attempt)
        are deleted first — write_parquet to a dir ADDS uniquely-named
        files, so rerunning over a half-written dir would duplicate
        rows. The marker is the commit point; only the superstep
        checkpoint dirs survive an uncommitted stage."""
        if os.path.exists(marker(name)):
            with open(marker(name)) as f:
                summary[name] = {**json.load(f), "resumed_skip": True}
            return True
        import shutil
        for out in outputs or (name,):
            d = os.path.join(wd, out)
            if os.path.isdir(d):
                shutil.rmtree(d)
        return False

    def done(name: str, **info) -> None:
        info["wall_s"] = round(time.time() - stage_t0, 3)
        tmp = marker(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(info, f)
        os.replace(tmp, marker(name))
        summary[name] = info

    # ---- 1. corpus --------------------------------------------------
    stage_t0 = time.time()
    if not is_done("corpus", "corpus", "manifest"):
        rng = np.random.default_rng(args.seed)
        v, e = args.repos, args.edges
        s_exp = 1.0 / (2.3 - 1.0)
        p = np.arange(1, v + 1, dtype=np.float64) ** (-s_exp)
        cdf = np.cumsum(p)
        cdf /= cdf[-1]
        src = np.searchsorted(cdf, rng.random(e)).astype(np.int64)
        dst = np.searchsorted(cdf, rng.random(e)).astype(np.int64)
        perm = rng.permutation(v)
        src, dst = perm[src], perm[dst]
        keep = src != dst
        corpus, manifest = generate_corpus(src[keep], dst[keep], v,
                                           seed=args.seed)
        ray.data.from_arrow(corpus).repartition(parts).write_parquet(
            os.path.join(wd, "corpus"))
        ray.data.from_arrow(manifest).repartition(parts).write_parquet(
            os.path.join(wd, "manifest"))
        done("corpus", files=corpus.num_rows, repos=v,
             planted_edges=int(keep.sum()))

    # ---- 2. curate ---------------------------------------------------
    stage_t0 = time.time()
    if not is_done("curate", "curated"):
        corpus_ds = ray.data.read_parquet(os.path.join(wd, "corpus"))

        def _docs(b: pa.Table) -> pa.Table:
            did = [int(hashlib.md5(f"{r}:{p}".encode()).hexdigest()[:15],
                       16)
                   for r, p in zip(b["repo"].to_pylist(),
                                   b["path"].to_pylist())]
            return b.append_column("doc_id", pa.array(did, pa.int64()))

        with_ids = corpus_ds.map_batches(_docs, batch_format="pyarrow",
                                         batch_size=None).materialize()
        docs = with_ids.map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"],
                                "text": b["content"]}),
            batch_format="pyarrow", batch_size=None)
        dec = curate(docs, num_partitions=parts)
        kept = dec.map_batches(
            lambda b: (pa.table({"doc_id": b.filter(
                pc.equal(b["kept"], 1))["doc_id"]})
                if b.num_rows and "doc_id" in b.column_names else
                pa.table({"doc_id": pa.array([], pa.int64())})),
            batch_format="pyarrow", batch_size=None)
        curated = hash_join(with_ids, kept, on="doc_id",
                            num_partitions=parts, join_type="left_semi")
        curated = curated.map_batches(
            lambda b: b.drop_columns(["doc_id"])
            if "doc_id" in b.column_names else b,
            batch_format="pyarrow", batch_size=None)
        curated.repartition(parts).write_parquet(
            os.path.join(wd, "curated"))
        n_in = with_ids.count()
        n_kept = ray.data.read_parquet(
            os.path.join(wd, "curated")).count()
        done("curate", files_in=n_in, files_kept=n_kept)

    # ---- 3. extract (+ sha256 invariant) -----------------------------
    stage_t0 = time.time()
    if not is_done("extract", "edges", "vocabulary"):
        curated_ds = ray.data.read_parquet(os.path.join(wd, "curated"))
        edges, vocab = extract_edges(curated_ds, num_partitions=parts)
        edges.write_parquet(os.path.join(wd, "edges"))
        vocab.write_parquet(os.path.join(wd, "vocabulary"))
        # per-row invariant: extractor-observed content sha256 ==
        # generator manifest sha256 (input_hint contract)
        from igraph_ray.sources.corpus import content_sha256
        obs = content_sha256(curated_ds)
        man = ray.data.read_parquet(os.path.join(wd, "manifest"))
        man2 = man.map_batches(
            lambda b: pa.table({"repo": b["repo"], "path": b["path"],
                                "expected": b["content_sha256"]}),
            batch_format="pyarrow", batch_size=None)
        j = hash_join(obs, man2, on=("repo", "path"),
                      num_partitions=parts)
        bad = j.map_batches(
            lambda b: (b.filter(pc.not_equal(b["content_sha256"],
                                             b["expected"]))
                       if b.num_rows and "expected" in b.column_names
                       else b.slice(0, 0)),
            batch_format="pyarrow", batch_size=None).count()
        n_edges = ray.data.read_parquet(os.path.join(wd, "edges")).count()
        done("extract", edges=n_edges, vocab=vocab.count(),
             sha256_mismatches=int(bad))
        if bad:
            raise RuntimeError(f"sha256 invariant violated: {bad} rows")

    # ---- 4. graph loops ----------------------------------------------
    n_vocab = ray.data.read_parquet(
        os.path.join(wd, "vocabulary")).count()
    digest = hashlib.md5(
        f"{args.seed}:{args.repos}:{args.edges}:{n_vocab}".encode()
    ).hexdigest()[:16]

    def graph() -> Graph:
        return Graph(ray.data.read_parquet(
            os.path.join(wd, "edges"), columns=["src", "dst"],
            override_num_blocks=parts), n=n_vocab)

    stage_t0 = time.time()
    if not is_done("pagerank"):
        from igraph_ray.superstep import latest_checkpoint
        pre = latest_checkpoint(os.path.join(wd, "ck_pagerank"), digest)
        res = pagerank(
            graph(), fixed_iterations=args.pr_iterations,
            num_partitions=parts,
            checkpoint=CheckpointConfig(
                path=os.path.join(wd, "ck_pagerank"),
                every=args.checkpoint_every, input_digest=digest))
        res.state.write_parquet(os.path.join(wd, "pagerank"))
        done("pagerank", iterations=res.iterations,
             resumed_from=-1 if pre is None else int(pre))
    stage_t0 = time.time()
    if not is_done("components"):
        res = connected_components(
            graph(), num_partitions=parts,
            checkpoint=CheckpointConfig(
                path=os.path.join(wd, "ck_components"),
                every=args.checkpoint_every, input_digest=digest))
        res.state.write_parquet(os.path.join(wd, "components"))
        done("components", iterations=res.iterations)
    stage_t0 = time.time()
    if not is_done("lpa"):
        res = label_propagation(
            graph(), max_iter=20, num_partitions=parts,
            checkpoint=CheckpointConfig(
                path=os.path.join(wd, "ck_lpa"),
                every=args.checkpoint_every, input_digest=digest))
        res.state.write_parquet(os.path.join(wd, "lpa"))
        done("lpa", iterations=res.iterations)
    stage_t0 = time.time()
    if not is_done("triangles"):
        out = triangle_counts(graph(), num_partitions=parts)
        out.write_parquet(os.path.join(wd, "triangles"))
        done("triangles")
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="igraph_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--edges", required=True, help="edge parquet (src,dst[,weight])")
        p.add_argument("--out", required=True, help="output parquet dir")
        p.add_argument("--n", type=int, default=None, help="vertex count (dense universe)")
        p.add_argument("--partitions", type=int, default=None)
        p.add_argument("--weighted", action="store_true")
        p.add_argument("--checkpoint", default=None)
        p.add_argument("--checkpoint-every", type=int, default=1)
        p.add_argument("--input-digest", default="")

    p = sub.add_parser("pagerank")
    common(p)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-9)
    p.add_argument("--max-iter", type=int, default=200)
    p.add_argument("--iterations", type=int, default=None, help="fixed iteration count")

    p = sub.add_parser("components")
    common(p)
    p.add_argument("--max-iter", type=int, default=200)

    p = sub.add_parser("lpa")
    common(p)
    p.add_argument("--max-iter", type=int, default=50)

    p = sub.add_parser("triangles")
    common(p)

    p = sub.add_parser("extract")
    p.add_argument("--corpus", required=True, help="corpus parquet (repo,path,commit,lang,content)")
    p.add_argument("--out", required=True)
    p.add_argument("--vocabulary-out", default=None)
    p.add_argument("--partitions", type=int, default=8)

    p = sub.add_parser(
        "demo",
        help="north-star chain: corpus -> curate -> extract -> "
             "PR+CC+LPA+triangles, per-stage resume markers + "
             "per-superstep checkpoints")
    p.add_argument("--workdir", required=True)
    p.add_argument("--repos", type=int, default=1 << 17)
    p.add_argument("--edges", type=int, default=1 << 20)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--pr-iterations", type=int, default=20)
    p.add_argument("--checkpoint-every", type=int, default=1)

    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    from igraph_ray.context import configure

    configure()
    t0 = time.time()
    if args.cmd == "demo":
        summary = _run_demo(args)
        summary["wall_s"] = round(time.time() - t0, 3)
        print(json.dumps(summary))
        return 0
    summary = {"cmd": args.cmd, "out": args.out}

    if args.cmd == "extract":
        from igraph_ray.sources.corpus import extract_edges

        corpus = ray.data.read_parquet(args.corpus)
        edges, vocab = extract_edges(corpus, num_partitions=args.partitions)
        edges.write_parquet(args.out)
        if args.vocabulary_out:
            vocab.write_parquet(args.vocabulary_out)
        summary["edges"] = edges.count()
    else:
        from igraph_ray import (
            Graph,
            connected_components,
            label_propagation,
            pagerank,
            triangle_counts,
        )
        from igraph_ray.superstep import CheckpointConfig

        g = Graph.from_parquet(args.edges, weighted=args.weighted, n=args.n)
        ck = None
        if args.checkpoint:
            ck = CheckpointConfig(
                path=args.checkpoint, every=args.checkpoint_every,
                input_digest=args.input_digest,
            )
        if args.cmd == "pagerank":
            res = pagerank(
                g, damping=args.damping, tol=args.tol, max_iter=args.max_iter,
                fixed_iterations=args.iterations, num_partitions=args.partitions,
                checkpoint=ck,
            )
            res.state.write_parquet(args.out)
            summary.update(iterations=res.iterations, converged=res.converged,
                           residual=res.scalars.get("absdiff"))
        elif args.cmd == "components":
            res = connected_components(
                g, max_iter=args.max_iter, num_partitions=args.partitions, checkpoint=ck
            )
            res.state.write_parquet(args.out)
            summary.update(iterations=res.iterations, converged=res.converged)
        elif args.cmd == "lpa":
            res = label_propagation(
                g, max_iter=args.max_iter, num_partitions=args.partitions, checkpoint=ck
            )
            res.state.write_parquet(args.out)
            summary.update(iterations=res.iterations, converged=res.converged)
        elif args.cmd == "triangles":
            out = triangle_counts(g, num_partitions=args.partitions)
            out.write_parquet(args.out)

    summary["wall_s"] = round(time.time() - t0, 3)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
