"""Staged-plan compiler + multi-device mesh tests.

Covers: plan/interpreter parity on bitmap expressions and counts, plan-cache
reuse across literal values, shard->device placement determinism, and the
full sharded execution path over the virtual 8-device CPU mesh."""
import numpy as np
import pytest

from featurebase_tpu.core.consts import SHARD_WIDTH
from featurebase_tpu.executor.executor import Executor
from featurebase_tpu.executor.plan import PlanCompiler, PlanError
from featurebase_tpu.model.field import FieldOptions
from featurebase_tpu.model.index import Holder
from featurebase_tpu.parallel.mesh import make_mesh, shard_device, \
    shards_by_device
from featurebase_tpu.pql.parser import parse


@pytest.fixture()
def loaded():
    holder = Holder()
    idx = holder.create_index("i")
    idx.create_field("f")
    idx.create_field("n", FieldOptions(type="int", min=-1000, max=1000))
    e = Executor(holder)
    rng = np.random.default_rng(3)
    # scatter data over 5 shards
    for s in range(5):
        base = s * SHARD_WIDTH
        for c in rng.integers(0, 1000, size=30):
            e.execute("i", f"Set({base + int(c)}, f=1)")
        for c in rng.integers(1000, 2000, size=20):
            e.execute("i", f"Set({base + int(c)}, f=2)")
        for c in rng.integers(0, 500, size=15):
            e.execute("i", f"Set({base + int(c)}, n={int(c) - 250})")
    return holder, idx, e


def _interp_row(e, idx, call_src):
    """Force the interpreter path for parity comparison."""
    call = parse(call_src).calls[0]
    call = e._pre_translate(idx, call)
    segs = {}
    for shard in idx.available_shards():
        segs[shard] = e._bitmap_call_shard(idx, call, shard)
    from featurebase_tpu.model.row import Row
    return Row(segs)


PARITY_QUERIES = [
    "Row(f=1)",
    "Union(Row(f=1), Row(f=2))",
    "Intersect(Row(f=1), Row(n > -100))",
    "Difference(Row(f=1), Row(f=2))",
    "Xor(Row(f=1), Row(f=2))",
    "Not(Row(f=1))",
    "Row(n > 0)",
    "Row(n <= -50)",
    "Row(-100 <= n < 100)",
    "Row(n != null)",
    "Row(n == 0)",
    "Intersect(All(), Row(f=1))",
    "Shift(Row(f=1), n=3)",
]


@pytest.mark.parametrize("src", PARITY_QUERIES)
def test_plan_interpreter_parity(loaded, src):
    holder, idx, e = loaded
    plan_row = e.execute("i", src)[0]
    interp_row = _interp_row(e, idx, src)
    np.testing.assert_array_equal(plan_row.columns(), interp_row.columns())


def test_plan_compiles(loaded):
    holder, idx, e = loaded
    call = e._pre_translate(idx, parse("Intersect(Row(f=1), Row(n>0))").calls[0])
    plan = PlanCompiler(idx).compile(call)
    assert len(plan.leaves) == 2
    assert plan.ir[0] == "and"


def test_plan_cache_across_literals(loaded):
    """Same call shape with different literals must reuse the jitted fn."""
    holder, idx, e = loaded
    e.execute("i", "Count(Row(n > 5))")
    n_fns = len(e.plan_executor._fn_cache)
    e.execute("i", "Count(Row(n > 17))")
    e.execute("i", "Count(Row(n > -200))")
    assert len(e.plan_executor._fn_cache) == n_fns


def test_count_parity(loaded):
    holder, idx, e = loaded
    for src in PARITY_QUERIES:
        got = e.execute("i", f"Count({src})")[0]
        want = _interp_row(e, idx, src).count()
        assert got == want, src


def test_shard_device_deterministic():
    assert shard_device("i", 0, 8) == shard_device("i", 0, 8)
    byd = shards_by_device("i", list(range(100)), 8)
    assert sum(len(v) for v in byd.values()) == 100
    # reasonably balanced over 8 devices
    assert all(len(v) > 3 for v in byd.values())


def test_mesh_sharded_execution(loaded):
    """Full engine over the virtual 8-device CPU mesh: results must equal
    the unsharded run."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device")
    holder, idx, e = loaded
    mesh = make_mesh(8)
    em = Executor(holder, mesh=mesh)
    for src in PARITY_QUERIES:
        got = em.execute("i", f"Count({src})")[0]
        want = e.execute("i", f"Count({src})")[0]
        assert got == want, src
    row_m = em.execute("i", "Intersect(Row(f=1), Row(n > -100))")[0]
    row_s = e.execute("i", "Intersect(Row(f=1), Row(n > -100))")[0]
    np.testing.assert_array_equal(row_m.columns(), row_s.columns())


def test_graft_entry_single():
    import __graft_entry__ as ge
    import jax
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_entry_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
