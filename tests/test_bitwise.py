"""Bitmap kernel parity tests (modeled on reference roaring_test.go
intersect/union/difference/xor/count coverage)."""
import numpy as np
import pytest

from featurebase_tpu.core.consts import SHARD_WIDTH, WORDS_PER_ROW
from featurebase_tpu.ops import bitwise as bw


def rand_cols(rng, n):
    return np.unique(rng.integers(0, SHARD_WIDTH, size=n))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_cols_words_roundtrip(rng):
    cols = rand_cols(rng, 5000)
    words = bw.cols_to_words(cols)
    back = bw.words_to_cols(words)
    np.testing.assert_array_equal(back, cols.astype(np.uint64))


def test_cols_words_empty():
    words = bw.cols_to_words(np.array([], dtype=np.int64))
    assert bw.words_to_cols(words).size == 0


@pytest.mark.parametrize("op,npop", [
    ("b_and", np.intersect1d),
    ("b_or", np.union1d),
    ("b_xor", np.setxor1d),
    ("b_andnot", np.setdiff1d),
])
def test_set_algebra(rng, op, npop):
    import jax.numpy as jnp
    a = rand_cols(rng, 3000)
    b = rand_cols(rng, 3000)
    wa, wb = jnp.asarray(bw.cols_to_words(a)), jnp.asarray(bw.cols_to_words(b))
    got = bw.words_to_cols(np.asarray(getattr(bw, op)(wa, wb)))
    want = npop(a, b).astype(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_popcount(rng):
    import jax.numpy as jnp
    a = rand_cols(rng, 7777)
    wa = jnp.asarray(bw.cols_to_words(a))
    assert int(bw.popcount(wa)) == a.size


def test_count_and(rng):
    import jax.numpy as jnp
    a, b = rand_cols(rng, 4000), rand_cols(rng, 4000)
    wa, wb = jnp.asarray(bw.cols_to_words(a)), jnp.asarray(bw.cols_to_words(b))
    assert int(bw.count_and(wa, wb)) == np.intersect1d(a, b).size


def test_popcount_rows(rng):
    import jax.numpy as jnp
    tiles = []
    sizes = []
    for _ in range(4):
        c = rand_cols(rng, 1000)
        sizes.append(c.size)
        tiles.append(bw.cols_to_words(c))
    t = jnp.asarray(np.stack(tiles))
    np.testing.assert_array_equal(np.asarray(bw.popcount_rows(t)), sizes)


def test_shift(rng):
    import jax.numpy as jnp
    cols = rand_cols(rng, 2000)
    cols = cols[cols < SHARD_WIDTH - 100]
    w = jnp.asarray(bw.cols_to_words(cols))
    for n in (1, 31, 32, 33, 64, 100):
        got = bw.words_to_cols(np.asarray(bw.b_shift(w, n)))
        want = (cols + n).astype(np.uint64)
        want = want[want < SHARD_WIDTH]
        np.testing.assert_array_equal(got, want)


def test_or_reduce_rows(rng):
    import jax.numpy as jnp
    sets = [rand_cols(rng, 500) for _ in range(5)]
    t = jnp.asarray(np.stack([bw.cols_to_words(s) for s in sets]))
    got = bw.words_to_cols(np.asarray(bw.or_reduce_rows(t)))
    want = np.unique(np.concatenate(sets)).astype(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_range_mask():
    m = bw.range_mask(10, 100)
    got = bw.words_to_cols(m)
    np.testing.assert_array_equal(got, np.arange(10, 100, dtype=np.uint64))
    m2 = bw.range_mask(0, SHARD_WIDTH)
    assert int(np.sum([bin(int(x)).count("1") for x in m2])) == SHARD_WIDTH
    assert bw.range_mask(50, 50).sum() == 0


class TestNativeBitops:
    """C++ host bit decode/scatter parity vs numpy (native/bitops.cpp)."""

    def test_native_builds_and_agrees(self):
        import numpy as np
        from featurebase_tpu.native import bitops
        from featurebase_tpu.ops import bitwise as bw
        rng = np.random.default_rng(0)
        words = rng.integers(0, 1 << 32, size=32768, dtype=np.uint32)
        native = bitops.words_to_cols(words, base=12345)
        assert native is not None, "native bitops must build here"
        # numpy path
        flat = words.reshape(-1)
        want = []
        for i in np.nonzero(flat)[0]:
            v = int(flat[i])
            for b in range(32):
                if (v >> b) & 1:
                    want.append(i * 32 + b + 12345)
        assert native.tolist() == want[: len(native)] and \
            len(native) == len(want)

    def test_cols_roundtrip(self):
        import numpy as np
        from featurebase_tpu.ops import bitwise as bw
        rng = np.random.default_rng(1)
        cols = np.unique(rng.integers(0, 1 << 20, size=5000))
        words = bw.cols_to_words(cols)
        back = bw.words_to_cols(words)
        assert back.tolist() == cols.tolist()

    def test_empty_and_odd_sizes(self):
        import numpy as np
        from featurebase_tpu.native import bitops
        assert bitops.words_to_cols(
            np.zeros(7, dtype=np.uint32)).size == 0
        w = np.zeros(7, dtype=np.uint32)
        w[6] = 0x80000001
        got = bitops.words_to_cols(w)
        assert got.tolist() == [6 * 32, 6 * 32 + 31]
