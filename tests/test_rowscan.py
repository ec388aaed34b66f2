"""Row-scan framework (the BitmapFilter visitor redesign, reference:
roaring/filter.go:30-226; ops/rowscan.py)."""
import numpy as np

from featurebase_tpu.model.fragment import Fragment
from featurebase_tpu.ops import bitwise as bw
from featurebase_tpu.ops.rowscan import RowScanSpec, host_prune, \
    scan_fragments


def make_frag(bits):
    f = Fragment("i", "f", "standard", 0)
    for r, c in bits:
        f.set_bit(r, c)
    return f


class TestHostPrune:
    def test_predicates_compose(self):
        rows = [1, 2, 3, 5, 8, 13]
        assert host_prune(rows, RowScanSpec()) == rows
        assert host_prune(rows, RowScanSpec(min_row_excl=3)) == [5, 8, 13]
        assert host_prune(rows, RowScanSpec(max_row=5)) == [1, 2, 3, 5]
        assert host_prune(rows, RowScanSpec(whitelist={2, 8, 99})) == [2, 8]
        assert host_prune(rows, RowScanSpec(like_ids={1, 13})) == [1, 13]
        assert host_prune(rows, RowScanSpec(min_row_excl=1, max_row=8,
                                            whitelist={2, 8})) == [2, 8]


class TestScanFragments:
    def test_nonempty_scan(self):
        f = make_frag([(1, 10), (2, 20), (5, 30)])
        f.clear_bit(2, 20)  # row 2 now empty but still materialized
        assert scan_fragments([f], RowScanSpec()) == [1, 5]

    def test_column_filter(self):
        f = make_frag([(1, 10), (2, 10), (3, 99)])
        assert scan_fragments([f], RowScanSpec(column=10)) == [1, 2]
        assert scan_fragments([f], RowScanSpec(column=7)) == []

    def test_filter_words(self):
        f = make_frag([(1, 10), (2, 20)])
        mask = bw.cols_to_words(np.array([20]))
        import jax.numpy as jnp
        got = scan_fragments([f], RowScanSpec(filter_words=jnp.asarray(mask)))
        assert got == [2]

    def test_limit_applies_last(self):
        f = make_frag([(r, r) for r in range(10)])
        assert scan_fragments([f], RowScanSpec(min_row_excl=2, limit=3)) == \
            [3, 4, 5]

    def test_multi_view_union(self):
        a = make_frag([(1, 10)])
        b = make_frag([(2, 20)])
        assert scan_fragments([a, b, None], RowScanSpec()) == [1, 2]
