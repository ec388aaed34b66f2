"""Tuning harness for the fused AND+popcount kernel (the headline bench).

Measures, with the same two-point-fit methodology as bench.py (K dependent
iterations inside one jit; constant dispatch overhead cancels in the fit):

  ceiling_dma   two input streams DMA'd through VMEM with near-zero compute
                — the *measured* bandwidth ceiling for a 2-stream kernel on
                this chip (cf. paper roofline 819 GB/s on v5e)
  xla_direct    jnp.sum(popcount(a & b)) — what plain XLA fusion achieves
  csa_SRxC      current production kernel shape: 4-way CSA + SMEM scalar
                accumulator, block (R, C)
  direct_RxC    popcount with per-lane partial-output (grid, C) int32 and
                "parallel" grid semantics; final sum in XLA
  csa_p_RxC     4-way CSA with per-lane partial outputs ("parallel")

Usage: python tools/tune_count_kernel.py [variant ...]
Prints one JSON line per measurement.
"""
import functools
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    try:
        cache_dir = os.path.expanduser("~/.cache/jax_featurebase")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vmem_mb = int(os.environ.get("FEATUREBASE_TUNE_VMEM_MB", "0"))

    def cparams(sem):
        kw = {"dimension_semantics": (sem,)}
        if vmem_mb:
            kw["vmem_limit_bytes"] = vmem_mb << 20
        return pltpu.CompilerParams(**kw)

    dev = jax.devices()[0]
    on_tpu = "cpu" not in str(dev).lower()
    nbytes = (256 << 20) if on_tpu else (16 << 20)
    n_words = nbytes // 4

    ka, kb = jax.random.split(jax.random.key(0))
    a_flat = jax.jit(lambda k: jax.random.bits(
        k, (n_words,), jnp.uint32))(ka)
    b_flat = jax.jit(lambda k: jax.random.bits(
        k, (n_words,), jnp.uint32))(kb)
    a_flat = lax.bitcast_convert_type(a_flat, jnp.int32)
    b_flat = lax.bitcast_convert_type(b_flat, jnp.int32)
    a_flat.block_until_ready()

    expect = None

    def _csa(x, y, z):
        xy = jnp.bitwise_xor(x, y)
        s = jnp.bitwise_xor(xy, z)
        c = jnp.bitwise_or(jnp.bitwise_and(x, y), jnp.bitwise_and(xy, z))
        return s, c

    # ----- variant builders: each returns fn(a2, b2, acc (1,1) i32) -> (1,1)

    def build_ceiling(rows, cols):
        def kernel(acc_ref, a_ref, b_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[0, 0] = acc_ref[0, 0]
            # touch one sublane of each operand so the loads can't be elided
            out_ref[0, 0] += jnp.sum(
                jnp.bitwise_xor(a_ref[0, :], b_ref[0, :]))

        def run(a2, b2, acc):
            grid = (a2.shape[0] // rows,)
            return pl.pallas_call(
                kernel, grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                       memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                compiler_params=cparams("arbitrary"),
            )(acc, a2, b2)
        return run, False  # False: result is not the true popcount

    def build_csa_smem(rows, cols):
        def kernel(acc_ref, a_ref, b_ref, out_ref):
            x = jnp.bitwise_and(a_ref[:], b_ref[:])
            r, w = x.shape
            g = x.reshape(4, r // 4, w)
            s1, c1 = _csa(g[0], g[1], g[2])
            ones = jnp.bitwise_xor(s1, g[3])
            c2 = jnp.bitwise_and(s1, g[3])
            pc = lax.population_count
            s = (jnp.sum(pc(ones))
                 + 2 * (jnp.sum(pc(c1)) + jnp.sum(pc(c2))))

            @pl.when(pl.program_id(0) == 0)
            def _():
                out_ref[0, 0] = acc_ref[0, 0]
            out_ref[0, 0] += s

        def run(a2, b2, acc):
            grid = (a2.shape[0] // rows,)
            return pl.pallas_call(
                kernel, grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows, cols), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                       memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                compiler_params=cparams("arbitrary"),
            )(acc, a2, b2)
        return run, True

    def _partial_call(kernel, rows, cols, a2, b2, acc):
        import jax.numpy as jnp
        grid = (a2.shape[0] // rows,)
        parts = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((rows, cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid[0] * 8, cols), jnp.int32),
            compiler_params=cparams("parallel"),
        )(acc, a2, b2)
        return jnp.sum(parts, dtype=jnp.int32).reshape(1, 1)

    def build_direct_partial(rows, cols):
        def kernel(acc_ref, a_ref, b_ref, out_ref):
            pc = lax.population_count(
                jnp.bitwise_and(a_ref[:], b_ref[:]))
            r, w = pc.shape
            # (8, cols) sublane-aligned partials: reduce over row groups
            partial = jnp.sum(pc.reshape(r // 8, 8, w), axis=0)
            i = pl.program_id(0)
            boost = jnp.where(i == 0, acc_ref[0, 0], 0)
            cell0 = jnp.logical_and(
                lax.broadcasted_iota(jnp.int32, partial.shape, 0) == 0,
                lax.broadcasted_iota(jnp.int32, partial.shape, 1) == 0)
            out_ref[:] = partial + jnp.where(cell0, boost, 0)

        return (functools.partial(_partial_call, kernel, rows, cols), True)

    def build_csa_partial(rows, cols):
        def kernel(acc_ref, a_ref, b_ref, out_ref):
            x = jnp.bitwise_and(a_ref[:], b_ref[:])
            r, w = x.shape
            g = x.reshape(4, r // 4, w)
            s1, c1 = _csa(g[0], g[1], g[2])
            ones = jnp.bitwise_xor(s1, g[3])
            c2 = jnp.bitwise_and(s1, g[3])
            pc = lax.population_count
            tot = pc(ones) + 2 * (pc(c1) + pc(c2))  # (r//4, w)
            partial = jnp.sum(tot.reshape(r // 32, 8, w), axis=0)
            i = pl.program_id(0)
            boost = jnp.where(i == 0, acc_ref[0, 0], 0)
            cell0 = jnp.logical_and(
                lax.broadcasted_iota(jnp.int32, partial.shape, 0) == 0,
                lax.broadcasted_iota(jnp.int32, partial.shape, 1) == 0)
            out_ref[:] = partial + jnp.where(cell0, boost, 0)

        return (functools.partial(_partial_call, kernel, rows, cols), True)

    def build_xla(rows, cols):
        def run(a2, b2, acc):
            s = jnp.sum(lax.population_count(jnp.bitwise_and(a2, b2)),
                        dtype=jnp.int32) + acc[0, 0]
            return s.reshape(1, 1)
        return run, True

    variants = {}
    for (r, c) in [(512, 1024), (1024, 1024), (256, 2048), (512, 2048),
                   (256, 1024), (2048, 1024), (768, 1024), (640, 1024),
                   (896, 1024), (576, 1024), (704, 1024)]:
        variants[f"csa_{r}x{c}"] = ("csa_smem", r, c)
        variants[f"direct_{r}x{c}"] = ("direct", r, c)
        variants[f"csa_p_{r}x{c}"] = ("csa_partial", r, c)
        variants[f"ceil_{r}x{c}"] = ("ceiling", r, c)
    variants["ceiling_dma"] = ("ceiling", 512, 1024)
    variants["ceiling_dma_1024"] = ("ceiling", 1024, 1024)
    variants["xla_direct"] = ("xla", 512, 1024)

    builders = {"csa_smem": build_csa_smem, "direct": build_direct_partial,
                "csa_partial": build_csa_partial, "ceiling": build_ceiling,
                "xla": build_xla}

    want = sys.argv[1:] or ["ceiling_dma", "xla_direct", "csa_512x1024",
                            "direct_512x1024", "csa_p_512x1024",
                            "csa_1024x1024", "direct_1024x1024",
                            "direct_256x2048"]

    k1, k2 = (30, 130) if on_tpu else (2, 6)
    for name in want:
        kind, r, c = variants[name]
        fn, exact = builders[kind](r, c)
        n_use = (n_words // (r * c)) * (r * c)
        a2 = a_flat[:n_use].reshape(-1, c)
        b2 = b_flat[:n_use].reshape(-1, c)

        if exact:
            # cheap parity: single block
            small_a, small_b = a2[:r], b2[:r]
            got = int(fn(small_a, small_b,
                         np.zeros((1, 1), np.int32))[0, 0])
            ref = int(np.sum(np.bitwise_count(np.bitwise_and(
                np.asarray(small_a, dtype=np.int64) & 0xFFFFFFFF,
                np.asarray(small_b, dtype=np.int64) & 0xFFFFFFFF))))
            if got != ref:
                print(json.dumps({"variant": name, "error":
                                  f"parity {got} != {ref}"}))
                continue

        import jax

        def make_loop(K, fn=fn, a2=a2, b2=b2):
            @jax.jit
            def loop(x, y):
                def body(i, acc):
                    return fn(x, y, acc).astype(jnp.int32)
                return lax.fori_loop(
                    0, K, body, jnp.zeros((1, 1), jnp.int32))
            return loop

        times = {}
        try:
            for K in (k1, k2):
                loop = make_loop(K)
                int(loop(a2, b2)[0, 0])
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(loop(a2, b2)[0, 0])
                    best = min(best, time.perf_counter() - t0)
                times[K] = best
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:300]}))
            continue
        t_iter = (times[k2] - times[k1]) / (k2 - k1)
        gbps = 2 * a2.size * 4 / t_iter / 1e9
        print(json.dumps({"variant": name, "gbps": round(gbps, 2),
                          "pct_819": round(gbps / 819 * 100, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
