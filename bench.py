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
Robustness (round-4): the fit is repeated 5 independent times (each point
best-of-3); the headline value is the MEDIAN fit, with all fits + spread
recorded in extras.  Measured context: the kernel is DMA-bound and sits at
the chip's effective ceiling — a zero-compute 2-stream ceiling kernel
measures the same rate within noise — and the ceiling itself moves ±3%
run-to-run on the tunnelled chip (observed fits 734-786 GB/s in one
session), which is why a single fit (rounds 2-3) swung across the 0.90
bar.

Alongside the headline kernel metric, the BASELINE.json latency targets
are measured through the real engine: p50 of Count / TopN / GroupBy /
Sort / BSI-range over a synthetic dataset (reference harness:
cmd/pilosa-bench latency counters, executor_test BenchmarkGroupBy), and a
mesh rows/s figure from the shard_map Count path.  These land in the
"extras" key of the single output line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
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
    import os

    import jax
    # persistent compile cache: tunnel-side XLA compiles are slow and
    # highly variable (25-200s); cache them across bench runs
    try:
        cache_dir = os.path.expanduser("~/.cache/jax_featurebase")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp
    from jax import lax

    from featurebase_tpu.ops import pallas_kernels as pk

    dev = jax.devices()[0]
    on_tpu = "cpu" not in str(dev).lower()
    # rows divisible by the kernel's 640-row block (the measured-optimal
    # DMA size) so the whole stream runs at the tuned block shape
    nbytes = (640 * 102 * _cols() * 4) if on_tpu else (16 << 20)
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
    loops = {K: make_loop(K) for K in (k1, k2)}
    for loop in loops.values():
        int(loop(a, b)[0, 0])  # compile + warm (int() forces completion)

    bytes_touched = 2 * nbytes  # two input streams per iteration
    fits = []
    for _ in range(7):  # 7 independent two-point fits (VERDICT r3 #1)
        times = {}
        for K in (k1, k2):
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                int(loops[K](a, b)[0, 0])
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        t_iter = (times[k2] - times[k1]) / (k2 - k1)
        fits.append(bytes_touched / t_iter / 1e9)
    fits.sort()
    gbps = fits[len(fits) // 2]  # median fit is the headline
    roof = _roofline(dev)
    extras = {}
    try:
        extras = engine_latencies(on_tpu)
    except Exception as e:  # noqa: BLE001 — extras must not sink the bench
        extras = {"error": str(e)[:200]}
    extras["kernel_fits_gbps"] = [round(f, 1) for f in fits]
    extras["kernel_fit_spread_gbps"] = round(fits[-1] - fits[0], 1)
    print(json.dumps({
        "metric": "bitmap_and_popcount_throughput",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / roof, 4),
        "extras": extras,
    }))


def engine_latencies(on_tpu: bool) -> dict:
    """p50 latencies of the BASELINE query mix through the real engine
    (Count / TopN / GroupBy+Sum / Sort / BSI range), plus rows/s for the
    fused Count.  Dataset: 16 shards / 10M records (reference harness
    analog: executor_test.go:6525 BenchmarkGroupBy; pilosa-bench latency
    counters) — big enough that the per-query work is set by the kernels,
    not the dataset's sparsity.  Each query also gets a kernel-time lower
    bound (bytes the fused programs must stream / the measured kernel
    GB/s) so the dispatch overhead is visible rather than hidden.

    Alongside the single-device executor, the mesh (shard_map + psum)
    executor path is measured on the same data over a 1-device mesh — the
    collective lowering must not cost anything when there is nothing to
    merge (VERDICT r2 weak #3: the mesh path had no recorded perf)."""
    import os

    from featurebase_tpu.core.consts import SHARD_WIDTH
    from featurebase_tpu.executor.executor import Executor
    from featurebase_tpu.model.field import FieldOptions
    from featurebase_tpu.model.index import Holder
    from featurebase_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    n_shards = int(os.environ.get("FEATUREBASE_TPU_BENCH_SHARDS", "16"))
    n = n_shards * 625_000  # 16 shards -> 10M records
    cols = np.sort(rng.choice(n_shards * SHARD_WIDTH, size=n,
                              replace=False))
    f_rows = rng.integers(0, 8, size=n)
    g_rows = rng.integers(0, 4, size=n)
    vals = rng.integers(-1000, 10000, size=n)

    holder = Holder()
    idx = holder.create_index("bench")
    idx.create_field("f")
    idx.create_field("g")
    idx.create_field("v", FieldOptions(type="int", min=-1000, max=10000))
    idx.field("f").import_bits(f_rows, cols)
    idx.field("g").import_bits(g_rows, cols)
    idx.field("v").import_values(cols, vals)
    idx.mark_exists(cols)
    e = Executor(holder)

    queries = {
        "count_p50_ms": "Count(Intersect(Row(f=1), Row(g=2)))",
        "bsi_range_p50_ms": "Count(Row(v > 5000))",
        "topn_p50_ms": "TopN(f, n=5)",
        "groupby_sum_p50_ms": "GroupBy(Rows(f), Rows(g), "
                              "aggregate=Sum(field=v))",
        "sort_p50_ms": "Sort(All(), field=v, limit=10)",
        "min_p50_ms": "Min(field=v)",
        "percentile_p50_ms": "Percentile(field=v, nth=90)",
    }
    # kernel-stream lower bounds: bytes the fused device programs read,
    # at the measured fused AND+popcount rate (~720 GB/s on v5e; HBM
    # traffic only — dispatch/tunnel RTT excluded by definition)
    W4 = (SHARD_WIDTH // 32) * 4
    depth = int(idx.field("v").bit_depth) + 2
    kernel_gbps = 720.0 if on_tpu else 5.0
    kernel_bytes = {
        "count_p50_ms": 2 * n_shards * W4,
        "bsi_range_p50_ms": depth * n_shards * W4,
        "topn_p50_ms": 9 * n_shards * W4,
        "groupby_sum_p50_ms": (8 * 4) * (2 * depth + 2) * n_shards * W4,
        "sort_p50_ms": (depth + 4 * 4) * n_shards * W4,  # decode + sort est
        "min_p50_ms": depth * n_shards * W4,
        "percentile_p50_ms": 3 * depth * n_shards * W4,
    }
    reps = 9 if on_tpu else 5
    budget_s = float(os.environ.get(
        "FEATUREBASE_TPU_BENCH_EXTRAS_BUDGET", "240"))
    start = time.perf_counter()

    # irreducible per-sync dispatch floor: p50 of fetching one tiny device
    # scalar.  Engine p50s decompose as (#syncs x this) + kernel time; on
    # a tunnelled chip this floor dominates every small-kernel query.
    # DECIDABILITY (VERDICT r4 #1): the floor is probed INTERLEAVED with
    # every family's reps — probe, query, probe, query, ... — so tunnel-
    # RTT drift during the sequential run cannot masquerade as an extra
    # sync (r2-r4 recorded late-run families at 1.6-1.9x a floor that was
    # probed once, minutes earlier).  Each family's artifact rows carry
    # its own contemporaneous floor and a syncs_est computed from it.
    import jax
    import jax.numpy as jnp
    one = jax.device_put(jnp.ones((1,), jnp.int32))

    def probe_sync():
        t0 = time.perf_counter()
        int(jnp.sum(one))
        return (time.perf_counter() - t0) * 1e3

    def measure(ex, name, pql, prep=None):
        ex.execute("bench", pql)  # warm: compile + upload tiles
        q_samples, s_samples = [], []
        for _ in range(reps):
            if prep is not None:
                prep()
            s_samples.append(probe_sync())
            t0 = time.perf_counter()
            ex.execute("bench", pql)
            q_samples.append((time.perf_counter() - t0) * 1e3)
        q50 = sorted(q_samples)[len(q_samples) // 2]
        s50 = sorted(s_samples)[len(s_samples) // 2]
        return round(q50, 2), round(s50, 2)

    out = {"records": n, "shards": n_shards}
    sync_samples = [probe_sync() for _ in range(reps)]
    out["sync_rtt_ms"] = round(
        sorted(sync_samples)[len(sync_samples) // 2], 2)

    def record(name, p50, s50):
        """One family's artifact rows: p50, contemporaneous sync floor,
        and syncs_est = (p50 - kernel_est) / floor — the decidable
        one-round-trip claim (<= 1.3 passes)."""
        out[name] = p50
        base = name.replace("_p50_ms", "")
        out[base + "_sync_ms"] = s50
        kest = out.get(base + "_kernel_est_ms", 0.0)
        if s50 > 0:
            out[base + "_syncs_est"] = round(max(p50 - kest, 0.0) / s50, 2)

    for name, pql in queries.items():
        if time.perf_counter() - start > budget_s:
            out["truncated"] = True  # tunnel compile variance; never bust
            break                    # the driver's bench timeout
        p50, s50 = measure(e, name, pql)
        out[name.replace("_p50_ms", "_kernel_est_ms")] = round(
            kernel_bytes[name] / kernel_gbps / 1e6, 3)
        record(name, p50, s50)
    # measured device-time slopes for the two fused programs whose cost
    # is NOT a single stream pass (Sort = blocked top_k, Percentile =
    # speculative-tree bisection): K independent dispatches pipeline over
    # the link, so t(K) = RTT + K*kernel and the slope is the real device
    # time.  kernel_est for these becomes max(stream bound, measured).
    try:
        import jax as _jax

        from featurebase_tpu.ops import bsi as _bsiops
        pe = e.plan_executor
        shard_list = idx.available_shards()
        depth_v = max(idx.field("v").bit_depth, 1)
        bsi_g = pe.stacked_bsi(idx, "v", depth_v, shard_list)
        vals_g = pe.stacked_vals(idx, "v", depth_v, shard_list)
        full_g = pe.stacked_full(idx, shard_list)
        exists_g = _jax.jit(lambda b: b[:, 0, :])(bsi_g)
        num_l, num2_l, den_l = _bsiops.nth_limbs(90)

        def slope(dispatch, k1=1, k2=8):
            best = {}
            for k in (k1, k2):
                b = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    r = None
                    for _ in range(k):
                        r = dispatch()
                    _jax.block_until_ready(r)
                    b = min(b, time.perf_counter() - t0)
                best[k] = b
            return (best[k2] - best[k1]) / (k2 - k1) * 1e3

        s_sort = slope(lambda: _bsiops.sort_bsi_stacked(
            vals_g, exists_g, False, 10, full_g))
        s_pctl = slope(lambda: _bsiops.percentile_fused(
            vals_g, exists_g, full_g, 0, num_l, num2_l, den_l))
        out["sort_kernel_est_ms"] = round(
            max(out.get("sort_kernel_est_ms", 0), s_sort), 3)
        out["percentile_kernel_est_ms"] = round(
            max(out.get("percentile_kernel_est_ms", 0), s_pctl), 3)
        # re-derive syncs_est with the measured (larger) kernel times
        for fam in ("sort", "percentile"):
            if fam + "_p50_ms" in out and fam + "_sync_ms" in out:
                record(fam + "_p50_ms", out[fam + "_p50_ms"],
                       out[fam + "_sync_ms"])
    except Exception as ex:  # noqa: BLE001
        out["kernel_slope_error"] = str(ex)[:120]

    # cold TopN: the steady-state number above serves from the
    # incrementally-maintained rank cache; this one clears the cache
    # before every execution so the stacked counting path is what's
    # measured (VERDICT r3 weak #3)
    if time.perf_counter() - start <= budget_s:
        fobj = idx.field("f")
        pql = queries["topn_p50_ms"]
        fobj._topn_cache.clear()
        p50, s50 = measure(e, "topn_cold_p50_ms", pql,
                           prep=fobj._topn_cache.clear)
        out["topn_cold_kernel_est_ms"] = out.get("topn_kernel_est_ms", 0.0)
        record("topn_cold_p50_ms", p50, s50)
    # Apply vs Extract over ~1M records (VERDICT r3 #6 done criterion:
    # vectorized Apply within ~10x an equivalent Extract p50)
    if time.perf_counter() - start <= budget_s:
        try:
            def p50_shard(pql, reps3=3):
                e.execute("bench", pql, shards=[0, 1])
                ts = []
                for _ in range(reps3):
                    t0 = time.perf_counter()
                    e.execute("bench", pql, shards=[0, 1])
                    ts.append((time.perf_counter() - t0) * 1e3)
                return round(sorted(ts)[len(ts) // 2], 1)
            out["extract_1m_p50_ms"] = p50_shard("Extract(All(), Rows(v))")
            out["apply_1m_p50_ms"] = p50_shard(
                'Apply(All(), "v * 2", "sum")')
        except Exception as ex:  # noqa: BLE001
            out["apply_error"] = str(ex)[:120]
    if out.get("count_p50_ms"):
        out["count_rows_per_sec"] = round(
            n / (out["count_p50_ms"] / 1e3))

    # mesh executor path (shard_map + psum over a 1-device mesh on the
    # bench chip; multi-device numbers live in SCALING_r03.json)
    try:
        em = Executor(holder, mesh=make_mesh(1))
        for name, pql in (("mesh_count_p50_ms", queries["count_p50_ms"]),
                          ("mesh_groupby_sum_p50_ms",
                           queries["groupby_sum_p50_ms"]),
                          ("mesh_sort_p50_ms", queries["sort_p50_ms"]),
                          ("mesh_min_p50_ms", queries["min_p50_ms"]),
                          ("mesh_percentile_p50_ms",
                           queries["percentile_p50_ms"])):
            if time.perf_counter() - start > budget_s:
                out["truncated"] = True
                break
            base = name.replace("mesh_", "").replace("_p50_ms", "")
            out[f"mesh_{base}_kernel_est_ms"] = out.get(
                f"{base}_kernel_est_ms", 0.0)
            p50, s50 = measure(em, name, pql)
            record(name, p50, s50)
    except Exception as ex:  # noqa: BLE001
        out["mesh_error"] = str(ex)[:120]

    # ingest throughput (VERDICT r4 #3: the unmeasured axis).  Reference
    # harness analog: fragment_internal_test.go:931,999 BenchmarkImport*,
    # importRoaring fragment.go:2038.  The reference publishes no numbers,
    # so the stated comparison is this host's own CPU path (same machine,
    # numpy scatter) — recorded per-leg so the tunnel-upload cost is
    # visible separately from the host-master merge rate.
    if time.perf_counter() - start <= budget_s:
        try:
            out.update(ingest_bench())
        except Exception as ex:  # noqa: BLE001
            out["ingest_error"] = str(ex)[:200]

    # the decidable one-round-trip verdict: every family's estimate is
    # computed against its own interleaved floor, inside this artifact
    ests = {k: v for k, v in out.items() if k.endswith("_syncs_est")}
    out["one_sync_all"] = bool(ests) and \
        all(v <= 1.3 for v in ests.values())

    # fold the newest committed scaling artifact's verdict into the
    # bench record
    try:
        import glob
        import json as _json
        arts = sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "SCALING_r*.json")))
        with open(arts[-1]) as fh:
            art = _json.load(fh)
        out["scaling"] = {
            "machinery_scales": art.get("machinery_scales"),
            "saturation_gbps": max(r["scanned_gbps"]
                                   for r in art["weak_scaling"]),
            "gloo_2proc_gbps": art.get("gloo_2proc", {}).get("scanned_gbps"),
        }
    except Exception:  # noqa: BLE001
        pass
    return out


def ingest_bench() -> dict:
    """End-to-end ingest rates (records/s), keyed and unkeyed:

    - ingest_roaring_rows_per_sec: reference-wire roaring payloads ->
      host-master merge (api analog: import_roaring, fragment.go:2038)
    - ingest_roaring_e2e_rows_per_sec: same, PLUS device upload + first
      query (the full cold path a fresh shard pays)
    - ingest_values_rows_per_sec: bulk BSI value import (vectorized
      delta-tile scatter, fragment.go:1947 importValue analog)
    - ingest_keyed_rows_per_sec: string-keyed records — key translation
      (create_index_keys) + bit import, the translation-bound path
      (reference batch.go:860 doTranslation)
    """
    from featurebase_tpu.core.consts import SHARD_WIDTH
    from featurebase_tpu.executor.executor import Executor
    from featurebase_tpu.ingest import roaring_import as ri
    from featurebase_tpu.model.field import FieldOptions
    from featurebase_tpu.model.index import Holder

    rng = np.random.default_rng(1)
    n = 1_000_000
    n_shards = 2
    cols = np.sort(rng.choice(n_shards * SHARD_WIDTH, size=n,
                              replace=False))
    rows = rng.integers(0, 8, size=n)
    vals = rng.integers(-1000, 10000, size=n)
    out = {}

    # build reference-format payloads from a scratch index
    src = Holder()
    sidx = src.create_index("src")
    sidx.create_field("f")
    sidx.field("f").import_bits(rows, cols)
    payloads = {s: ri.export_roaring(sidx, "f", s)
                for s in range(n_shards)}

    holder = Holder()
    idx = holder.create_index("ing")
    idx.create_field("f")
    idx.create_field("v", FieldOptions(type="int", min=-1000, max=10000))
    t0 = time.perf_counter()
    for s, data in payloads.items():
        ri.import_roaring(idx, "f", s, data)
    t_host = time.perf_counter() - t0
    out["ingest_roaring_rows_per_sec"] = round(n / t_host)
    e = Executor(holder)
    (cnt,) = e.execute("ing", "Count(Row(f=1))")
    t_e2e = time.perf_counter() - t0
    assert cnt > 0
    out["ingest_roaring_e2e_rows_per_sec"] = round(n / t_e2e)

    t0 = time.perf_counter()
    idx.field("v").import_values(cols, vals)
    out["ingest_values_rows_per_sec"] = round(
        n / (time.perf_counter() - t0))

    # keyed: 200k string keys through partitioned translation + import
    nk = 200_000
    keys = [f"user-{i:07d}" for i in range(nk)]
    from featurebase_tpu.model.index import IndexOptions
    kidx = holder.create_index("ingk", IndexOptions(keys=True))
    kidx.create_field("f")
    t0 = time.perf_counter()
    kmap = kidx.translate_store.create_keys(keys)
    kcols = np.fromiter((kmap[k] for k in keys), dtype=np.int64, count=nk)
    kidx.field("f").import_bits(rows[:nk], kcols)
    out["ingest_keyed_rows_per_sec"] = round(
        nk / (time.perf_counter() - t0))
    return out


def _cols() -> int:
    return 1024


def scaling(n_devices: int = 0, heavy_rows: int = 16,
            shards_per_dev: int = 2, reps: int = 5, out: str = ""):
    """Rows/s scaling-efficiency rig over a virtual (or real) device mesh
    (BASELINE: >=80% rows/s scaling 1 chip -> 1 host -> N hosts).

    Weak scaling: per-device work is fixed (shards_per_dev shards, a
    heavy_rows x heavy_rows GroupBy cross product — the pair_counts
    shard_map kernel scans heavy_rows^2 * W words per shard, kernel-bound
    at these sizes) while the device count doubles.  Alongside the heavy
    query, a tiny Count probes the fixed per-query dispatch + collective
    overhead, isolating machinery cost from compute.

    HONESTY NOTE (recorded in the artifact): on this rig the N "devices"
    are XLA host-platform virtual devices sharing the machine's physical
    cores (2 on the round-3 rig).  Compute-bound weak scaling beyond the
    physical core count is impossible by construction — the classic
    efficiency number saturates at cores/N — so the artifact reports (a)
    total scanned GB/s per device count, whose ceiling is the host's
    memory bandwidth, not the mesh machinery, and (b) the tiny-query
    overhead growth, which IS the mesh machinery cost and must stay ~flat
    for real-silicon scaling to hold (reference contract: mapReduce
    scale-out, executor.go:6449).

    Usage: python bench.py --scaling [N] [--out FILE]
    """
    import os

    import jax

    from featurebase_tpu.core.consts import SHARD_WIDTH
    from featurebase_tpu.executor.executor import Executor
    from featurebase_tpu.model.index import Holder
    from featurebase_tpu.parallel.mesh import make_mesh

    total = n_devices or len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= total]
    rng = np.random.default_rng(0)
    rows_list = []
    heavy_pql = "GroupBy(Rows(f), Rows(g))"
    tiny_pql = "Count(Row(f=1))"
    base_heavy = None
    for nd in sizes:
        n_shards = nd * shards_per_dev
        n = n_shards * 100_000
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
        e = Executor(holder, mesh=make_mesh(nd))

        def p50(pql):
            e.execute("scale", pql)  # warm: compile + upload
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                e.execute("scale", pql)
                samples.append(time.perf_counter() - t0)
            return sorted(samples)[len(samples) // 2]

        t_heavy = p50(heavy_pql)
        t_tiny = p50(tiny_pql)
        # pair_counts work: F*R combos x W words x 4B per shard
        scanned = (n_shards * heavy_rows * heavy_rows
                   * (SHARD_WIDTH // 32) * 4)
        if base_heavy is None:
            base_heavy = t_heavy
        row = {
            "devices": nd, "shards": n_shards, "records": n,
            "groupby_p50_ms": round(t_heavy * 1e3, 2),
            "tiny_count_p50_ms": round(t_tiny * 1e3, 2),
            "scanned_gbps": round(scanned / t_heavy / 1e9, 2),
            "rows_per_sec": round(n / t_heavy),
            "weak_efficiency": round(base_heavy / t_heavy, 3),
        }
        rows_list.append(row)
        print(json.dumps(row), flush=True)

    cores = len(os.sched_getaffinity(0)) if hasattr(os, "sched_getaffinity") \
        else os.cpu_count()
    overhead_growth = (rows_list[-1]["tiny_count_p50_ms"]
                       - rows_list[0]["tiny_count_p50_ms"]) \
        if len(rows_list) > 1 else 0.0
    artifact = {
        "rig": {
            "backend": jax.default_backend(),
            "virtual_devices": total,
            "physical_cores": cores,
            "heavy_query": heavy_pql,
            "methodology": (
                "weak scaling: fixed per-device work "
                f"({shards_per_dev} shards x {heavy_rows}^2 GroupBy cross "
                "product, kernel-bound), device count doubling; tiny Count "
                "isolates per-query dispatch+collective overhead"),
            "caveat": (
                f"virtual devices share {cores} physical cores: "
                "compute-bound weak efficiency is capped at "
                f"cores/N by construction; the mesh-machinery signal is "
                "the tiny-query overhead growth and the scanned-GB/s "
                "saturation level"),
        },
        "weak_scaling": rows_list,
        "tiny_overhead_growth_ms": round(overhead_growth, 2),
        "machinery_scales": bool(
            overhead_growth < 5.0 * max(1, total // 8)),
    }
    if out:
        with open(out, "w") as fh:
            json.dump(artifact, fh, indent=1)
    print(json.dumps({"scaling_artifact": artifact["machinery_scales"],
                      "saturation_gbps": max(
                          r["scanned_gbps"] for r in rows_list)}))
    return artifact


if __name__ == "__main__":
    import sys
    if "--scaling" in sys.argv:
        i = sys.argv.index("--scaling")
        nd = 0
        if len(sys.argv) > i + 1 and sys.argv[i + 1].isdigit():
            nd = int(sys.argv[i + 1])
        out = ""
        if "--out" in sys.argv:
            out = sys.argv[sys.argv.index("--out") + 1]
        scaling(nd, out=out)
    else:
        main()
