"""Hold-at-scale evidence runner for the data-curation pipelines.

Runs the nine pinned data pipelines plus lm_surprisal / prepare_corpus /
tokenize_ids at sf0.1 AND at the deterministic 10x fixture
(tools/make_scale10.py -> /tmp/sf1_data), in ONE Ray session each,
printing a wall-per-pipeline table plus the plasma/spill summary after
each scale. The round-5 "done" bar: <= ~10x wall at 10x input with
streaming execution (no spill-thrash).

Usage: python tools/scale_evidence.py [sf_small] [sf_big]
"""
import sys
import time

import numpy as np
import pyarrow.parquet as pq
import ray


def run_suite(sf_dir: str) -> dict:
    import ray.data

    from igraph_ray.ops import dedup as dd
    from igraph_ray.ops import similarity as sim
    from igraph_ray.ops import text as tx
    from igraph_ray.ops import window as win
    from igraph_ray.ops import curation as cu
    from igraph_ray.pipelines import queries as q

    walls = {}

    def timed(name, fn):
        t = time.perf_counter()
        fn()
        walls[name] = round(time.perf_counter() - t, 3)
        print(f"  {name}: {walls[name]} s", flush=True)

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    timed("exact_dedup", lambda: dd.exact_dedup(docs).count())
    timed("minhash_lsh", lambda: dd.minhash_lsh_pairs(docs).count())
    timed("quality", lambda: tx.quality_score(docs).count())
    timed("ngram_jaccard",
          lambda: dd.ngram_jaccard_pairs(docs, threshold=0.5).count())

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["embedding"]).slice(0, 16)
    queries = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    timed("knn", lambda: sim.brute_force_topk(emb, queries, k=10).count())

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])
    timed("tumbling", lambda: win.tumbling_window(ev).count())
    timed("dedup_clusters", lambda: cu.dedup_clusters(
        sim.embedding_near_dups(emb, threshold=0.35)).count())
    timed("top_terms", lambda: cu.top_terms(docs, k=3).count())
    timed("curate", lambda: cu.curate(docs).count())
    timed("lm_surprisal", lambda: cu.lm_surprisal(docs).count())
    timed("prepare_corpus", lambda: q.q_prepare_corpus(sf_dir).count())
    timed("tokenize_ids", lambda: tx.tokenize_to_ids(
        docs, tx.token_vocabulary(docs)).count())
    return walls


class ShmPeak:
    """Background sampler of /dev/shm usage — the plasma object store
    is shm-backed, so its peak tracks peak object-store residency."""

    def __init__(self) -> None:
        import threading
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self) -> None:
        import shutil
        while not self._stop.is_set():
            u = shutil.disk_usage("/dev/shm")
            used = u.total - u.free
            if used > self.peak:
                self.peak = used
            self._stop.wait(0.2)

    def stop_gib(self) -> float:
        self._stop.set()
        self._t.join(timeout=2)
        return round(self.peak / (1 << 30), 2)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_data"
    out = {}
    for label, sf in (("sf0.1", small), ("10x", big)):
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
        from igraph_ray.context import configure
        configure()
        print(f"[{label}] {sf}", flush=True)
        mem = ShmPeak()
        t0 = time.perf_counter()
        out[label] = run_suite(sf)
        total = round(time.perf_counter() - t0, 3)
        print(f"[{label}] total {total} s")
        print(f"[{label}] peak /dev/shm (object store): "
              f"{mem.stop_gib()} GiB")
        out[label]["TOTAL"] = total
        ray.shutdown()
        time.sleep(2)

    print("\n| pipeline | sf0.1 | 10x | ratio |")
    print("|---|---|---|---|")
    for k in out["sf0.1"]:
        a, b = out["sf0.1"][k], out["10x"][k]
        print(f"| {k} | {a} | {b} | {round(b / max(a, 1e-9), 1)}x |")


if __name__ == "__main__":
    main()
