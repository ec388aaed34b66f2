"""Traced-predicate BSI kernels for the plan compiler.

Same algorithms as ops/bsi.py (reference fragment.go:963-1305 rangeEQ/LT/GT/
Between) but the predicate arrives as a traced (D,) uint32 bit vector plus a
traced sign flag instead of a Python int.  This lets one compiled XLA plan
serve every literal value of the same bit depth — the executor's staged-plan
cache is keyed by call-tree *shape* only, mirroring how the reference caches
parsed queries but not per-value plans.

Inputs:
  slices: (..., D, W) uint32 magnitude planes (leading dims = stacked shards)
  exists, sign, filter_: (..., W) uint32
  pred_bits: (D,) uint32 {0,1} — |pred| magnitude bits
  pred_neg:  () uint32 {0,1}  — 1 if pred < 0
`allow_eq` stays static (affects formula shape only, two variants compile).
"""
from __future__ import annotations

import jax.numpy as jnp

_u32 = jnp.uint32


def _sel(flag, a, b):
    """Elementwise select by a scalar traced {0,1} flag."""
    return jnp.where(flag != 0, a, b)


def _split(exists, sign, filter_):
    base = jnp.bitwise_and(exists, filter_)
    neg = jnp.bitwise_and(base, sign)
    pos = jnp.bitwise_and(base, jnp.bitwise_not(sign))
    return base, pos, neg


def _slice(slices, i):
    return slices[..., i, :]


# The comparators walk depth+1 planes: plane `depth` is a virtual all-zeros
# slice so saturated out-of-range predicates (encode_pred) resolve correctly —
# a pred magnitude above the fragment's max representable value matches
# everything for <, nothing for > / == (reference: baseValue clamping,
# field.go:2412).

def u_eq_t(slices, base, pred_bits, depth: int):
    b = base
    for i in range(depth, -1, -1):
        s = _slice(slices, i) if i < depth else jnp.zeros_like(base)
        b = _sel(pred_bits[i], jnp.bitwise_and(b, s),
                 jnp.bitwise_and(b, jnp.bitwise_not(s)))
    return b


def u_lt_t(slices, base, pred_bits, depth: int, allow_eq: bool):
    b = base
    keep = jnp.zeros_like(base)
    for i in range(depth, -1, -1):
        s = _slice(slices, i) if i < depth else jnp.zeros_like(base)
        not_s = jnp.bitwise_not(s)
        keep = jnp.bitwise_or(
            keep, _sel(pred_bits[i], jnp.bitwise_and(b, not_s),
                       jnp.zeros_like(b)))
        b = _sel(pred_bits[i], jnp.bitwise_and(b, s),
                 jnp.bitwise_and(b, not_s))
    if allow_eq:
        keep = jnp.bitwise_or(keep, b)
    return keep


def u_gt_t(slices, base, pred_bits, depth: int, allow_eq: bool):
    b = base
    keep = jnp.zeros_like(base)
    for i in range(depth, -1, -1):
        s = _slice(slices, i) if i < depth else jnp.zeros_like(base)
        keep = jnp.bitwise_or(
            keep, _sel(pred_bits[i], jnp.zeros_like(b),
                       jnp.bitwise_and(b, s)))
        b = _sel(pred_bits[i], jnp.bitwise_and(b, s),
                 jnp.bitwise_and(b, jnp.bitwise_not(s)))
    if allow_eq:
        keep = jnp.bitwise_or(keep, b)
    return keep


def range_eq_t(slices, exists, sign, filter_, pred_bits, pred_neg, depth: int):
    _, pos, neg = _split(exists, sign, filter_)
    side = _sel(pred_neg, neg, pos)
    return u_eq_t(slices, side, pred_bits, depth)


def range_neq_t(slices, exists, sign, filter_, pred_bits, pred_neg, depth: int):
    base = jnp.bitwise_and(exists, filter_)
    eq = range_eq_t(slices, exists, sign, filter_, pred_bits, pred_neg, depth)
    return jnp.bitwise_and(base, jnp.bitwise_not(eq))


def range_lt_t(slices, exists, sign, filter_, pred_bits, pred_neg,
               depth: int, allow_eq: bool):
    """value < pred (<= if allow_eq), sign-magnitude semantics.

    pred > 0 (or ==0 with allow_eq): negatives ∪ u_lt(pos)
    pred == 0 strict:               negatives
    pred < 0:                       u_gt(neg, |pred|)   (flipped direction)
    The pred==0 cases fall out naturally: with pred_bits all zero,
    u_lt(pos, 0, allow_eq) = pos-equal-0 if allow_eq else ∅, and
    u_gt(neg, 0, allow_eq) = neg>0 magnitude (∪ neg==0 if allow_eq) — the
    stored encoding never has sign set for 0, so neg==0 side is empty.
    """
    _, pos, neg = _split(exists, sign, filter_)
    pos_branch = jnp.bitwise_or(
        neg, u_lt_t(slices, pos, pred_bits, depth, allow_eq))
    neg_branch = u_gt_t(slices, neg, pred_bits, depth, allow_eq)
    return _sel(pred_neg, neg_branch, pos_branch)


def range_gt_t(slices, exists, sign, filter_, pred_bits, pred_neg,
               depth: int, allow_eq: bool):
    _, pos, neg = _split(exists, sign, filter_)
    neg_branch = jnp.bitwise_or(
        pos, u_lt_t(slices, neg, pred_bits, depth, allow_eq))
    pos_branch = u_gt_t(slices, pos, pred_bits, depth, allow_eq)
    return _sel(pred_neg, neg_branch, pos_branch)


def range_between_t(slices, exists, sign, filter_, lo_bits, lo_neg,
                    hi_bits, hi_neg, depth: int):
    a = range_gt_t(slices, exists, sign, filter_, lo_bits, lo_neg, depth, True)
    b = range_lt_t(slices, exists, sign, filter_, hi_bits, hi_neg, depth, True)
    return jnp.bitwise_and(a, b)


def encode_pred(pred: int, depth: int):
    """Host helper: int predicate -> (pred_bits (D+1,) uint32, pred_neg ()).

    The magnitude is saturated to 2^(depth+1)-1 so any out-of-range pred has
    the virtual MSB (plane `depth`) set, which the comparators resolve as
    all-match / no-match (reference: baseValue clamping, field.go:2412)."""
    import numpy as np
    mag = min(abs(int(pred)), (1 << (depth + 1)) - 1)
    bits = np.array([(mag >> i) & 1 for i in range(depth + 1)],
                    dtype=np.uint32)
    return bits, np.uint32(1 if pred < 0 else 0)
