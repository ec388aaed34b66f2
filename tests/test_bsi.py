"""BSI kernel tests against a numpy oracle (modeled on reference
fragment_internal_test.go BSI range/sum/min/max coverage)."""
import numpy as np
import pytest

from featurebase_tpu.core.consts import SHARD_WIDTH, WORDS_PER_ROW
from featurebase_tpu.ops import bitwise as bw
from featurebase_tpu.ops import bsi as bsiops

N = 4096  # columns with values
DEPTH = 12


@pytest.fixture(scope="module")
def data():
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    cols = np.unique(rng.integers(0, SHARD_WIDTH, size=N))
    vals = rng.integers(-(1 << (DEPTH - 1)), 1 << (DEPTH - 1),
                        size=cols.size)
    mags = np.abs(vals)
    exists = bw.cols_to_words(cols)
    sign = bw.cols_to_words(cols[vals < 0])
    slices = np.stack([bw.cols_to_words(cols[((mags >> i) & 1) == 1])
                       for i in range(DEPTH)])
    full = ~np.zeros(WORDS_PER_ROW, dtype=np.uint32)
    return (jnp.asarray(slices), jnp.asarray(exists), jnp.asarray(sign),
            jnp.asarray(full), cols, vals)


def _check(row_words, cols, vals, mask):
    got = bw.words_to_cols(np.asarray(row_words))
    want = cols[mask].astype(np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("pred", [-2000, -37, -1, 0, 1, 5, 100, 2047])
def test_range_eq(data, pred):
    slices, exists, sign, full, cols, vals = data
    _check(bsiops.range_eq(slices, exists, sign, full, pred, DEPTH),
           cols, vals, vals == pred)


@pytest.mark.parametrize("pred", [-2000, -37, -1, 0, 1, 5, 100, 2047])
def test_range_neq(data, pred):
    slices, exists, sign, full, cols, vals = data
    _check(bsiops.range_neq(slices, exists, sign, full, pred, DEPTH),
           cols, vals, vals != pred)


@pytest.mark.parametrize("pred", [-2000, -37, -1, 0, 1, 5, 100, 2047])
@pytest.mark.parametrize("eq", [False, True])
def test_range_lt(data, pred, eq):
    slices, exists, sign, full, cols, vals = data
    m = vals <= pred if eq else vals < pred
    _check(bsiops.range_lt(slices, exists, sign, full, pred, DEPTH, eq),
           cols, vals, m)


@pytest.mark.parametrize("pred", [-2000, -37, -1, 0, 1, 5, 100, 2047])
@pytest.mark.parametrize("eq", [False, True])
def test_range_gt(data, pred, eq):
    slices, exists, sign, full, cols, vals = data
    m = vals >= pred if eq else vals > pred
    _check(bsiops.range_gt(slices, exists, sign, full, pred, DEPTH, eq),
           cols, vals, m)


@pytest.mark.parametrize("lo,hi", [(-100, 100), (0, 0), (-2048, 2047),
                                   (5, 10), (-10, -5)])
def test_range_between(data, lo, hi):
    slices, exists, sign, full, cols, vals = data
    m = (vals >= lo) & (vals <= hi)
    _check(bsiops.range_between(slices, exists, sign, full, lo, hi, DEPTH),
           cols, vals, m)


def test_sum(data):
    slices, exists, sign, full, cols, vals = data
    s, c = bsiops.sum_host(slices, exists, sign, full, DEPTH)
    assert s == int(vals.sum())
    assert c == cols.size


def test_sum_filtered(data):
    import jax.numpy as jnp
    slices, exists, sign, full, cols, vals = data
    filt_cols = cols[::3]
    filt = jnp.asarray(bw.cols_to_words(filt_cols))
    s, c = bsiops.sum_host(slices, exists, sign, filt, DEPTH)
    assert s == int(vals[::3].sum())
    assert c == filt_cols.size


def test_min_max(data):
    slices, exists, sign, full, cols, vals = data
    mn, cn = bsiops.min_host(slices, exists, sign, full, DEPTH)
    mx, cx = bsiops.max_host(slices, exists, sign, full, DEPTH)
    assert mn == int(vals.min())
    assert cn == int((vals == vals.min()).sum())
    assert mx == int(vals.max())
    assert cx == int((vals == vals.max()).sum())


def test_min_max_empty_filter(data):
    import jax.numpy as jnp
    slices, exists, sign, full, cols, vals = data
    filt = jnp.zeros(WORDS_PER_ROW, dtype=jnp.uint32)
    assert bsiops.min_host(slices, exists, sign, filt, DEPTH) == (0, 0)
    assert bsiops.max_host(slices, exists, sign, filt, DEPTH) == (0, 0)
    assert bsiops.sum_host(slices, exists, sign, filt, DEPTH) == (0, 0)


def test_decode_values(data):
    slices, exists, sign, full, cols, vals = data
    dense = np.asarray(bsiops.decode_values(slices, sign, DEPTH))
    np.testing.assert_array_equal(dense[cols], vals)


def test_expand_bits():
    import jax.numpy as jnp
    cols = np.array([0, 1, 31, 32, 63, 1000, SHARD_WIDTH - 1])
    words = jnp.asarray(bw.cols_to_words(cols))
    bits = np.asarray(bsiops.expand_bits(words))
    assert bits.shape == (SHARD_WIDTH,)
    np.testing.assert_array_equal(np.nonzero(bits)[0], cols)


class TestDeviceIngestScatter:
    """Device-side BSI delta scatter (ops/bsi.py bsi_delta_device,
    SURVEY §2.9(7)) must produce bit-identical tiles to the host
    np.bitwise_or.at path."""

    def test_device_delta_matches_host(self, monkeypatch):
        from featurebase_tpu.model.field import Field
        rng = np.random.default_rng(7)
        n = 5000
        c = rng.choice(1 << 20, size=n, replace=False).astype(np.int64)
        v = rng.integers(-500, 3000, size=n)
        mg = np.abs(v).astype(np.uint64)
        depth = 12
        host = Field._bsi_delta(c, v, mg, depth)
        monkeypatch.setenv("FEATUREBASE_TPU_DEVICE_INGEST", "1")
        dev = Field._bsi_delta(c, v, mg, depth)
        assert host.shape == dev.shape == (depth + 2, (1 << 20) // 32)
        assert np.array_equal(host, dev)

    def test_import_values_roundtrip_device(self, monkeypatch):
        monkeypatch.setenv("FEATUREBASE_TPU_DEVICE_INGEST", "1")
        from featurebase_tpu.model.field import FieldOptions
        from featurebase_tpu.model.index import Holder
        holder = Holder()
        idx = holder.create_index("devi")
        idx.create_field("v", FieldOptions(type="int", min=-10, max=100))
        cols = np.array([1, 5, 1 << 20, (1 << 20) + 3])
        vals = np.array([-7, 42, 0, 99])
        idx.field("v").import_values(cols, vals)
        f = idx.field("v")
        got = [f.value(int(cc)) for cc in cols]
        assert [g[0] for g in got] == [-7, 42, 0, 99]
        assert all(g[1] for g in got)
