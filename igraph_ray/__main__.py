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

    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    from igraph_ray.context import configure

    configure()
    t0 = time.time()
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
