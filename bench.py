"""Benchmark: bitmap-kernel throughput at the HBM roofline.

Measures the hot kernel of the engine — fused AND + popcount over dense
bitmap tiles (the TPU replacement for the reference's roaring
IntersectionCount, roaring/roaring.go:1078) — and reports effective GB/s
against the chip's HBM roofline.  The reference publishes no numbers
(BASELINE.json published: {}); the baseline denominator is the HBM
memory-bandwidth roofline, which is the speed-of-light for this op
(2 input streams, popcount-reduce, no reuse).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

# HBM roofline GB/s by TPU generation (public specs).
_ROOFLINE = {
    "v5 lite": 819.0,   # v5e: 819 GB/s HBM BW
    "v5litepod": 819.0,
    "v4": 1228.0,
    "v5p": 2765.0,
    "v6": 1640.0,
    "cpu": 50.0,
}


def _roofline(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for k, v in _ROOFLINE.items():
        if k in kind:
            return v
    return 819.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    on_tpu = "cpu" not in str(dev).lower()
    # moderate operand size: big enough to be HBM-bound, small enough that
    # host->device upload over a tunnel stays fast
    n_words = (256 << 20) // 4 if on_tpu else (16 << 20) // 4
    shape = (n_words // 32768, 32768)

    rng = np.random.default_rng(0)
    a = jax.device_put(
        rng.integers(0, 1 << 32, size=shape, dtype=np.uint32), dev)
    b = jax.device_put(
        rng.integers(0, 1 << 32, size=shape, dtype=np.uint32), dev)

    K = 50 if on_tpu else 3

    # K dependent iterations inside one jitted program: immune to async
    # dispatch, RTT noise, and loop-invariant hoisting (acc feeds back into
    # the xor so no iteration can be elided).
    @jax.jit
    def bench_loop(x, y):
        def body(i, acc):
            xx = jnp.bitwise_xor(x, acc)
            return acc + jnp.sum(jax.lax.population_count(
                jnp.bitwise_and(xx, y)).astype(jnp.uint32), dtype=jnp.uint32)
        return lax.fori_loop(0, K, body, jnp.uint32(0))

    int(bench_loop(a, b))  # warm up + compile (int() forces completion)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(bench_loop(a, b))
        best = min(best, (time.perf_counter() - t0) / K)

    bytes_touched = 2 * a.size * 4  # two input streams per iteration
    gbps = bytes_touched / best / 1e9
    roof = _roofline(dev)
    print(json.dumps({
        "metric": "bitmap_and_popcount_throughput",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / roof, 4),
    }))


if __name__ == "__main__":
    main()
