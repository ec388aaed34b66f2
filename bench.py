"""Benchmark: bitmap-kernel throughput at the HBM roofline.

Measures the hot kernel of the engine — the fused AND + popcount Pallas
streaming kernel (the TPU replacement for the reference's roaring
IntersectionCount, roaring/roaring.go:1078) — and reports effective GB/s
against the chip's HBM roofline.  The reference publishes no numbers
(BASELINE.json published: {}); the baseline denominator is the HBM
memory-bandwidth roofline, which is the speed-of-light for this op
(2 input streams, popcount-reduce, no reuse).

Methodology: K dependent iterations inside one jitted program (the
accumulator is threaded *into* the Pallas kernel as an SMEM operand, so no
iteration can be elided or hoisted), forced to completion with a host
transfer.  Each measurement includes a constant dispatch + tunnel-RTT
overhead (~25 ms on the axon tunnel), so the per-iteration kernel time is
recovered from a two-point fit: t = (T(K2) - T(K1)) / (K2 - K1).

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

    from featurebase_tpu.ops import pallas_kernels as pk

    dev = jax.devices()[0]
    on_tpu = "cpu" not in str(dev).lower()
    nbytes = (256 << 20) if on_tpu else (16 << 20)
    n_words = nbytes // 4
    shape = (n_words // _cols(), _cols())

    # generate on device: uploading operands over a tunnelled link would
    # dominate wall-clock without affecting the measurement
    ka, kb = jax.random.split(jax.random.key(0))
    a = jax.jit(lambda k: jax.random.bits(k, shape, jnp.uint32))(ka)
    b = jax.jit(lambda k: jax.random.bits(k, shape, jnp.uint32))(kb)

    if on_tpu:
        count_and = pk.count_and_pallas
    else:
        # interpret-mode Pallas is orders of magnitude too slow to bench;
        # on CPU measure the XLA-fused path instead.
        def count_and(x, y, acc=None):
            s = jnp.sum(lax.population_count(jnp.bitwise_and(
                x.view(jnp.int32), y.view(jnp.int32))), dtype=jnp.int32)
            if acc is not None:
                s = s + acc[0, 0]
            return s.astype(jnp.uint32)

    # parity check against numpy before timing
    expect = int(np.sum(np.bitwise_count(
        np.bitwise_and(np.asarray(a[:64]), np.asarray(b[:64]))),
        dtype=np.uint64) & 0xFFFFFFFF)
    got = int(count_and(a[:64], b[:64]))
    if got != expect:
        raise SystemExit(f"kernel parity failure: {got} != {expect}")

    def make_loop(K):
        @jax.jit
        def loop(x, y):
            def body(i, acc):
                return lax.reshape(
                    count_and(x, y, acc=acc).astype(jnp.int32), (1, 1))
            return lax.fori_loop(0, K, body, jnp.zeros((1, 1), jnp.int32))
        return loop

    k1, k2 = (50, 350) if on_tpu else (2, 8)
    times = {}
    for K in (k1, k2):
        loop = make_loop(K)
        int(loop(a, b)[0, 0])  # compile + warm (int() forces completion)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(loop(a, b)[0, 0])
            best = min(best, time.perf_counter() - t0)
        times[K] = best

    t_iter = (times[k2] - times[k1]) / (k2 - k1)
    bytes_touched = 2 * nbytes  # two input streams per iteration
    gbps = bytes_touched / t_iter / 1e9
    roof = _roofline(dev)
    print(json.dumps({
        "metric": "bitmap_and_popcount_throughput",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / roof, 4),
    }))


def _cols() -> int:
    return 1024


if __name__ == "__main__":
    main()
