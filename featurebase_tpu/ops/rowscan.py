"""Row-scan framework: the TPU-native redesign of the reference's
BitmapFilter visitor machinery (reference: roaring/filter.go:30-226 —
BitmapFilter with ConsiderKey/ConsiderData span logic, and the concrete
filters BitmapColumnFilter, BitmapRowsFilter, BitmapRowLimitFilter,
BitmapBSICountFilter; driven by fragment.rows/rowIterator
fragment.go:2465,2522 and executeRowsShard executor.go:4077).

The reference walks containers one at a time, letting each filter skip key
ranges.  Dense tiles invert the design: a scan is ONE declarative spec
evaluated in two stages —

  1. host stage: row-id predicates prune the candidate list with set
     algebra (whitelist/in, previous/min, max, like-matched ids) — the
     ConsiderKey role;
  2. device stage: data predicates evaluate over the stacked candidate
     tile in a single fused pass (column bit-test via one word gather;
     non-empty-under-filter via per-row fused popcounts) — the
     ConsiderData role, without per-container branching.

Limit applies after both stages (BitmapRowLimitFilter ordering).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Set

import numpy as np

from featurebase_tpu.ops import bitwise as bw


@dataclass
class RowScanSpec:
    """Declarative row filter stack (one instance = one filter chain)."""

    column: Optional[int] = None          # rows containing this column
    whitelist: Optional[Set[int]] = None  # in= (BitmapRowsFilter)
    min_row_excl: Optional[int] = None    # previous= (rows strictly after)
    max_row: Optional[int] = None
    like_ids: Optional[Set[int]] = None   # translate-store LIKE pushdown
    filter_words: Optional[object] = None  # device (W,) row must intersect
    limit: Optional[int] = None           # BitmapRowLimitFilter


def host_prune(row_ids: Sequence[int], spec: RowScanSpec) -> List[int]:
    """Stage 1: key-level pruning (the ConsiderKey role)."""
    out = [int(r) for r in row_ids]
    if spec.min_row_excl is not None:
        out = [r for r in out if r > spec.min_row_excl]
    if spec.max_row is not None:
        out = [r for r in out if r <= spec.max_row]
    if spec.whitelist is not None:
        out = [r for r in out if r in spec.whitelist]
    if spec.like_ids is not None:
        out = [r for r in out if r in spec.like_ids]
    return out


def scan_fragments(frags, spec: RowScanSpec) -> List[int]:
    """Scan one or more fragments (views OR-ed) of one shard: returns the
    sorted row ids passing the whole filter stack.

    Device work is a single pass: candidate rows gather into one stacked
    tile; the data predicate is either a column bit-test (one word gather)
    or a per-row fused popcount against filter_words."""
    frags = [f for f in frags if f is not None]
    if not frags:
        return []
    cand = sorted({r for f in frags for r in map(int, f.row_ids())})
    cand = host_prune(cand, spec)
    if not cand:
        return []

    if spec.column is not None:
        col = int(spec.column)
        keep = []
        for r in cand:
            if any(f.get_bit(r, col) for f in frags):
                keep.append(r)
        return keep[: spec.limit] if spec.limit is not None else keep

    # data predicate: row non-empty (optionally under a filter bitmap)
    acc = None
    for f in frags:
        tile, _ = f.device_rows(cand)
        acc = tile if acc is None else bw.b_or(acc, tile)
    if spec.filter_words is not None:
        pc = np.asarray(bw.count_and_rows(acc, spec.filter_words[None, :]))
    else:
        pc = np.asarray(bw.popcount_rows(acc))
    out = [r for r, c in zip(cand, pc) if c > 0]
    if spec.limit is not None:
        out = out[: int(spec.limit)]
    return out
