import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from igraph_ray import sinks


def _mk_inputs(tmp):
    files = []
    for i in range(6):
        p = os.path.join(tmp, f"in_{i}.parquet")
        pq.write_table(pa.table({"x": pa.array(range(i * 10, i * 10 + 10), pa.int64())}), p)
        files.append(p)
    return files


def _pipe(ds):
    return ds.map_batches(
        lambda b: pa.table({"y": pc.multiply(b["x"], 2)}),
        batch_format="pyarrow", batch_size=None)


def test_write_partitioned_resume(tmp_path):
    tmp = str(tmp_path)
    files = _mk_inputs(tmp)
    out = os.path.join(tmp, "out")

    r1 = sinks.write_partitioned(files, out, _pipe, shard_size=2)
    assert r1 == {"written": 3, "skipped": 0, "shards": 3}
    full = sorted(r["y"] for r in sinks.read_partitioned(out).take_all())
    assert full == [2 * x for x in range(60)]

    # simulate a kill: delete one marker + corrupt that shard dir
    victim = os.path.join(out, "shard=00001")
    os.remove(os.path.join(victim, "_DONE.json"))
    for f in os.listdir(victim):
        os.remove(os.path.join(victim, f))
    # read back skips the uncommitted shard
    partial = sorted(r["y"] for r in sinks.read_partitioned(out).take_all())
    assert len(partial) == 40

    # resume: only the broken shard is rebuilt; output identical
    r2 = sinks.write_partitioned(files, out, _pipe, shard_size=2)
    assert r2 == {"written": 1, "skipped": 2, "shards": 3}
    full2 = sorted(r["y"] for r in sinks.read_partitioned(out).take_all())
    assert full2 == full

    # changed input digest forces a rebuild of that shard only
    pq.write_table(pa.table({"x": pa.array([100, 101, 102], pa.int64())}),
                   files[0])
    r3 = sinks.write_partitioned(files, out, _pipe, shard_size=2)
    assert r3 == {"written": 1, "skipped": 2, "shards": 3}
    vals = sorted(r["y"] for r in sinks.read_partitioned(out).take_all())
    assert 200 in vals and 0 not in vals
