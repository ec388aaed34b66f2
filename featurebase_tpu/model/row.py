"""Row: a query-result bitmap over the full column space, segmented by shard.

Mirrors the reference's Row/RowSegment design (reference: row.go:15 Row,
row.go:511 RowSegment, segment ops row.go:546-629) but each segment is a dense
(WORDS_PER_ROW,) uint32 device vector, so cross-row set algebra is pure VPU
work with no container-type dispatch.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import numpy as np

from featurebase_tpu.core.consts import SHARD_WIDTH, WORDS_PER_ROW
from featurebase_tpu.ops import bitwise as bw


class Row:
    __slots__ = ("segments", "keys")

    def __init__(self, segments: Optional[Dict[int, object]] = None,
                 keys: Optional[List[str]] = None):
        # shard -> (W,) uint32 device array
        self.segments: Dict[int, object] = segments or {}
        self.keys = keys  # set after key translation of results

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_columns(cls, cols: Iterable[int]) -> "Row":
        import jax.numpy as jnp
        cols = np.asarray(list(cols) if not isinstance(cols, np.ndarray) else cols,
                          dtype=np.int64)
        segs: Dict[int, object] = {}
        if cols.size:
            shards = cols >> 20
            for s in np.unique(shards):
                words = bw.cols_to_words(cols[shards == s] % SHARD_WIDTH)
                segs[int(s)] = jnp.asarray(words)
        return cls(segs)

    # -- set algebra (reference row.go:202 Merge/Union etc.) ----------------

    def _binary(self, other: "Row", fn, keep_left=True, keep_right=True) -> "Row":
        out: Dict[int, object] = {}
        import jax.numpy as jnp
        zero = None
        for s in set(self.segments) | set(other.segments):
            a = self.segments.get(s)
            b = other.segments.get(s)
            if a is None and b is None:
                continue
            if a is None:
                if not keep_right:
                    continue
                if zero is None:
                    zero = jnp.zeros(WORDS_PER_ROW, dtype=jnp.uint32)
                a = zero
            if b is None:
                if not keep_left:
                    continue
                if zero is None:
                    zero = jnp.zeros(WORDS_PER_ROW, dtype=jnp.uint32)
                b = zero
            out[s] = fn(a, b)
        return Row(out)

    def union(self, other: "Row") -> "Row":
        return self._binary(other, bw.b_or)

    def intersect(self, other: "Row") -> "Row":
        return self._binary(other, bw.b_and, keep_left=False, keep_right=False)

    def difference(self, other: "Row") -> "Row":
        return self._binary(other, bw.b_andnot, keep_right=False)

    def xor(self, other: "Row") -> "Row":
        return self._binary(other, bw.b_xor)

    def shift(self, n: int = 1) -> "Row":
        # per-segment shift; bits crossing shard boundaries are dropped,
        # matching the reference's segment-local shift (row.go Shift).
        return Row({s: bw.b_shift(a, n) for s, a in self.segments.items()})

    # -- reductions ---------------------------------------------------------

    def count(self) -> int:
        total = 0
        for a in self.segments.values():
            total += int(bw.popcount(a))
        return total

    def any(self) -> bool:
        return any(bool(bw.any_set(a)) for a in self.segments.values())

    def includes(self, col: int) -> bool:
        seg = self.segments.get(col >> 20)
        if seg is None:
            return False
        w = np.asarray(seg)
        c = col % SHARD_WIDTH
        return bool((w[c >> 5] >> (c & 31)) & 1)

    def columns(self) -> np.ndarray:
        """Sorted absolute column ids (host decode)."""
        parts = []
        for s in sorted(self.segments):
            parts.append(bw.words_to_cols(np.asarray(self.segments[s]),
                                          base=s * SHARD_WIDTH))
        if not parts:
            return np.empty(0, dtype=np.uint64)
        return np.concatenate(parts)

    def segment(self, shard: int):
        """Device words for one shard (or None)."""
        return self.segments.get(shard)

    def shards(self):
        return sorted(self.segments)

    def to_json(self):
        if self.keys is not None:
            return {"keys": list(self.keys)}
        return {"columns": [int(c) for c in self.columns()]}

    def __eq__(self, other):
        if not isinstance(other, Row):
            return NotImplemented
        return np.array_equal(self.columns(), other.columns())

    def __repr__(self):
        cols = self.columns()
        preview = ", ".join(str(int(c)) for c in cols[:8])
        return f"Row<{cols.size} cols: [{preview}{'...' if cols.size > 8 else ''}]>"


class SignedRow:
    """Pair of negative/positive value bitmaps (reference SignedRow,
    executor.go Distinct-over-BSI results)."""

    __slots__ = ("neg", "pos", "field")

    def __init__(self, neg: Row, pos: Row, field: Optional[str] = None):
        self.neg = neg
        self.pos = pos
        self.field = field

    def values(self) -> np.ndarray:
        """Sorted distinct signed values."""
        n = -self.neg.columns().astype(np.int64)
        p = self.pos.columns().astype(np.int64)
        out = np.unique(np.concatenate([n, p]))
        return out

    def union(self, other: "SignedRow") -> "SignedRow":
        return SignedRow(self.neg.union(other.neg), self.pos.union(other.pos),
                         self.field or other.field)

    def to_json(self):
        return {"values": [int(v) for v in self.values()]}
