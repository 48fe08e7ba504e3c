"""Deterministic 10x data-scale fixture for hold-at-scale evidence.

Writes /tmp/sf1_data/{documents,embeddings,events}.parquet as exactly
ten deterministic replicas of the sf0.1 tables (round-5 verdict ask #1:
the graph loop has 2^27-edge scale proof, the curation chain needs a
10x-documents run recorded in BASELINE.md).

Replica r of a row gets shifted ids (r * ID_STRIDE) and a deterministic
perturbation (docs: a seeded word-level shuffle per replica, so the
shingle sets of different replicas are DISJOINT-ish — near-dup
structure inside each replica is preserved while cross-replica
candidate pairs don't explode combinatorially, keeping the pair
workload ~10x rather than ~C(10,2)=45x; embeddings: +0.003*r on
component 0; events: timestamps shifted by r * (span + 1h) so the
window count scales too). Replica 0 is byte-identical to sf0.1. No
randomness beyond seeded permutations — re-running reproduces the same
bytes. Pass --neardup to instead prefix a replica tag (replicas become
mutual near-duplicates — the adversarial pair-explosion stress
variant).

Usage: python tools/make_scale10.py [src_sf_dir] [out_dir]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ID_STRIDE = 1_000_000
REPLICAS = 10


def _perturb(s: str, r: int, neardup: bool) -> str:
    if neardup:
        return f"rep{r} {s}"
    # seeded word shuffle: permutation depends only on (r, word count),
    # so near-identical docs inside a replica stay near-identical while
    # the replica's shingle set diverges from every other replica's
    words = s.split()
    if len(words) < 2:
        return f"rep{r} {s}"
    perm = np.random.default_rng(r * 1_000_003 + len(words)).permutation(
        len(words))
    return " ".join(words[i] for i in perm)


def scale_documents(src: str, out: str, neardup: bool = False) -> int:
    t = pq.read_table(f"{src}/documents.parquet")
    parts = []
    for r in range(REPLICAS):
        did = pa.array(np.asarray(t["doc_id"]) + r * ID_STRIDE)
        if r == 0:
            text = t["text"]
        else:
            text = pa.array([_perturb(s, r, neardup) for s in
                             t["text"].to_pylist()], pa.string())
        nch = pa.array([len(s) for s in text.to_pylist()], pa.int64())
        parts.append(pa.table({
            "doc_id": did, "text": text, "lang": t["lang"],
            "source": t["source"], "n_chars": nch}))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out}/documents.parquet")
    return big.num_rows


def scale_embeddings(src: str, out: str) -> int:
    t = pq.read_table(f"{src}/embeddings.parquet")
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    parts = []
    for r in range(REPLICAS):
        vid = pa.array(np.asarray(t["vec_id"]) + r * ID_STRIDE)
        v = vecs.copy()
        v[:, 0] += np.float32(0.003) * r
        parts.append(pa.table({
            "vec_id": vid,
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": t["label"]}))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out}/embeddings.parquet")
    return big.num_rows


def scale_events(src: str, out: str) -> int:
    t = pq.read_table(f"{src}/events.parquet")
    ts = np.asarray(t["ts"].cast(pa.int64()))
    span = int(ts.max() - ts.min()) + 3_600_000_000  # + 1h in us
    parts = []
    for r in range(REPLICAS):
        parts.append(pa.table({
            "event_id": pa.array(np.asarray(t["event_id"])
                                 + r * ID_STRIDE),
            "ts": pa.array(ts + r * span).cast(pa.timestamp("us")),
            "user_id": t["user_id"], "event_type": t["event_type"],
            "value": t["value"], "props": t["props"]}))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out}/events.parquet")
    return big.num_rows


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--neardup"]
    neardup = "--neardup" in sys.argv[1:]
    src = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/sf1_data"
    os.makedirs(out, exist_ok=True)
    print("documents:", scale_documents(src, out, neardup=neardup))
    print("embeddings:", scale_embeddings(src, out))
    print("events:", scale_events(src, out))
    # graph-table symlinks so sf-dir-shaped pipelines resolve
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem"):
        dst = f"{out}/{tbl}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src}/{tbl}.parquet", dst)
    print("done:", out)


if __name__ == "__main__":
    main()
