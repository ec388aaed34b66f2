"""Worker for the 2-process gloo scaling datapoint (SCALING artifact).

Two processes x 4 virtual CPU devices = one 8-device 'shards' mesh whose
psum collectives cross a real process boundary through the Gloo backend —
the DCN leg of the scaling story (reference: multi-node mapReduce,
executor.go:6449).  Process 0 prints one JSON line with the measured p50s.

Usage: python tools/scaling_gloo_worker.py <port> <pid>
"""
import json
import sys
import time


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    import os
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from featurebase_tpu.parallel import multihost
    multihost.initialize(f"localhost:{port}", num_processes=2,
                         process_id=pid, cpu_collectives="gloo")

    import numpy as np

    from featurebase_tpu.core.consts import SHARD_WIDTH
    from featurebase_tpu.executor.executor import Executor
    from featurebase_tpu.model.index import Holder

    mesh = multihost.global_mesh()
    heavy_rows = 16
    n_shards = 16
    n = n_shards * 100_000
    rng = np.random.default_rng(0)  # same seed in both processes
    cols = np.sort(rng.choice(n_shards * SHARD_WIDTH, size=n,
                              replace=False))
    f_rows = rng.integers(0, heavy_rows, size=n)
    g_rows = rng.integers(0, heavy_rows, size=n)
    holder = Holder()
    idx = holder.create_index("scale")
    idx.create_field("f")
    idx.create_field("g")
    idx.field("f").import_bits(f_rows, cols)
    idx.field("g").import_bits(g_rows, cols)
    idx.mark_exists(cols)
    e = Executor(holder, mesh=mesh)

    def p50(pql, reps=5):
        e.execute("scale", pql)
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            e.execute("scale", pql)
            samples.append(time.perf_counter() - t0)
        return sorted(samples)[len(samples) // 2] * 1e3

    heavy = p50("GroupBy(Rows(f), Rows(g))")
    tiny = p50("Count(Row(f=1))")
    if pid == 0:
        scanned = n_shards * heavy_rows * heavy_rows * (SHARD_WIDTH // 32) * 4
        print(json.dumps({
            "processes": 2, "devices": 8, "shards": n_shards, "records": n,
            "groupby_p50_ms": round(heavy, 2),
            "tiny_count_p50_ms": round(tiny, 2),
            "scanned_gbps": round(scanned / (heavy / 1e3) / 1e9, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
