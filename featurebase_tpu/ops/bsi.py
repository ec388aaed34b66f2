"""Bit-sliced-index (BSI) arithmetic kernels.

Replaces the reference's per-fragment BSI machinery (reference:
fragment.go:579 value, 615 setValue, 724 sum, 754 min, 806 max, 937 rangeOp,
963 rangeEQ, 1024 rangeLT, 1088 rangeGT, 1213 rangeBetween) with vectorized
bit-plane algorithms over dense tiles.

Layout: a BSI fragment is a stack of shard-wide bit rows
    row 0: exists bit, row 1: sign bit, rows 2..2+depth: magnitude slices
(reference: fragment.go:62-65).  Here kernels take the *already separated*
pieces:
    slices: (D, W) uint32 — magnitude bit-planes, slice i = bit i
    exists: (W,) uint32
    sign:   (W,) uint32
    filter: (W,) uint32 — column filter (existence row or query row)
Values are sign-magnitude signed integers (value 0 always has sign bit clear).

All predicate kernels return dense (W,) uint32 row masks.  Loops over bit
depth are Python-unrolled (depth is static, <= 64) so XLA sees straight-line
fused VPU code.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_u32 = jnp.uint32
_ZERO = jnp.uint32(0)


def _full_like(e):
    return jnp.bitwise_not(jnp.zeros_like(e))


# ---------------------------------------------------------------------------
# Unsigned magnitude comparisons over bit-planes
# ---------------------------------------------------------------------------

def _u_eq(slices, base, pred: int, depth: int):
    """Columns in `base` whose magnitude == pred (reference rangeEQ
    fragment.go:963)."""
    if pred < 0 or pred >= (1 << depth):
        # unrepresentable at this fragment's bit depth -> no match
        # (reference: baseValue clamping, field.go:2412)
        return jnp.zeros_like(base)
    b = base
    for i in range(depth - 1, -1, -1):
        if (pred >> i) & 1:
            b = jnp.bitwise_and(b, slices[i])
        else:
            b = jnp.bitwise_and(b, jnp.bitwise_not(slices[i]))
    return b


def _u_lt(slices, base, pred: int, depth: int, allow_eq: bool):
    """Columns in `base` with magnitude < pred (<= if allow_eq) (reference
    rangeLT / rangeLTUnsigned fragment.go:1024,1061)."""
    if pred < 0 or (pred == 0 and not allow_eq):
        return jnp.zeros_like(base)
    if pred >= (1 << depth):
        # every representable magnitude is below pred
        # (reference: baseValue clamping, field.go:2412)
        return base
    b = base
    keep = jnp.zeros_like(base)
    for i in range(depth - 1, -1, -1):
        s = slices[i]
        if (pred >> i) & 1:
            keep = jnp.bitwise_or(keep, jnp.bitwise_and(b, jnp.bitwise_not(s)))
            b = jnp.bitwise_and(b, s)
        else:
            b = jnp.bitwise_and(b, jnp.bitwise_not(s))
    if allow_eq:
        keep = jnp.bitwise_or(keep, b)
    return keep


def _u_gt(slices, base, pred: int, depth: int, allow_eq: bool):
    """Columns in `base` with magnitude > pred (>= if allow_eq) (reference
    rangeGT / rangeGTUnsigned fragment.go:1088,1129)."""
    if pred < 0 or (pred == 0 and allow_eq):
        return base
    if pred >= (1 << depth):
        # nothing representable exceeds pred (== only possible when
        # allow_eq and pred == max, handled by the in-range path)
        return jnp.zeros_like(base)
    b = base
    keep = jnp.zeros_like(base)
    for i in range(depth - 1, -1, -1):
        s = slices[i]
        if (pred >> i) & 1:
            b = jnp.bitwise_and(b, s)
        else:
            keep = jnp.bitwise_or(keep, jnp.bitwise_and(b, s))
            b = jnp.bitwise_and(b, jnp.bitwise_not(s))
    if allow_eq:
        keep = jnp.bitwise_or(keep, b)
    return keep


# ---------------------------------------------------------------------------
# Signed predicate kernels (sign-magnitude semantics, reference rangeOp
# fragment.go:937 dispatch)
# ---------------------------------------------------------------------------

def _split(exists, sign, filter_):
    base = jnp.bitwise_and(exists, filter_)
    neg = jnp.bitwise_and(base, sign)
    pos = jnp.bitwise_and(base, jnp.bitwise_not(sign))
    return base, pos, neg


def range_eq(slices, exists, sign, filter_, pred: int, depth: int):
    _, pos, neg = _split(exists, sign, filter_)
    if pred >= 0:
        return _u_eq(slices, pos, pred, depth)
    return _u_eq(slices, neg, -pred, depth)


def range_neq(slices, exists, sign, filter_, pred: int, depth: int):
    base = jnp.bitwise_and(exists, filter_)
    eq = range_eq(slices, exists, sign, filter_, pred, depth)
    return jnp.bitwise_and(base, jnp.bitwise_not(eq))


def range_lt(slices, exists, sign, filter_, pred: int, depth: int,
             allow_eq: bool = False):
    _, pos, neg = _split(exists, sign, filter_)
    if pred > 0 or (pred == 0 and allow_eq):
        # all negatives qualify; positives with mag < pred
        return jnp.bitwise_or(neg, _u_lt(slices, pos, pred, depth, allow_eq))
    if pred == 0:  # strictly < 0
        return neg
    # pred < 0: negatives with mag > |pred|
    return _u_gt(slices, neg, -pred, depth, allow_eq)


def range_gt(slices, exists, sign, filter_, pred: int, depth: int,
             allow_eq: bool = False):
    _, pos, neg = _split(exists, sign, filter_)
    if pred < 0:
        # all positives qualify; negatives with mag < |pred|
        return jnp.bitwise_or(pos, _u_lt(slices, neg, -pred, depth, allow_eq))
    if pred == 0:
        if allow_eq:
            return pos
        return _u_gt(slices, pos, 0, depth, False)
    return _u_gt(slices, pos, pred, depth, allow_eq)


def range_between(slices, exists, sign, filter_, lo: int, hi: int, depth: int):
    """lo <= value <= hi (reference rangeBetween fragment.go:1213)."""
    a = range_gt(slices, exists, sign, filter_, lo, depth, allow_eq=True)
    b = range_lt(slices, exists, sign, filter_, hi, depth, allow_eq=True)
    return jnp.bitwise_and(a, b)


def range_not_null(exists, filter_):
    return jnp.bitwise_and(exists, filter_)


# ---------------------------------------------------------------------------
# Aggregates
# ---------------------------------------------------------------------------

def _pop(x):
    return jnp.sum(jax.lax.population_count(x).astype(jnp.uint32),
                   axis=-1, dtype=jnp.int32)


def sum_parts_kernel(slices, exists, sign, filter_, depth: int):
    """Per-slice popcounts for Sum (reference fragment.sum fragment.go:724).

    Device math stays 32-bit: each popcount <= 2^20.  Returns
    (pos_pops (D,) int32, neg_pops (D,) int32, count int32); the caller
    assembles sum = Σ 2^i (pos_i - neg_i) with Python ints (exact, unbounded).
    """
    base, pos, neg = _split(exists, sign, filter_)
    pos_pops = jnp.stack([_pop(jnp.bitwise_and(slices[i], pos))
                          for i in range(depth)])
    neg_pops = jnp.stack([_pop(jnp.bitwise_and(slices[i], neg))
                          for i in range(depth)])
    return pos_pops, neg_pops, _pop(base)


def sum_host(slices, exists, sign, filter_, depth: int):
    """(sum, count) finalized host-side as exact Python ints."""
    pos_pops, neg_pops, count = sum_parts_kernel(slices, exists, sign,
                                                 filter_, depth)
    import numpy as np
    pp = np.asarray(pos_pops)
    npops = np.asarray(neg_pops)
    total = 0
    for i in range(depth):
        total += (1 << i) * (int(pp[i]) - int(npops[i]))
    return total, int(count)


def minmax_parts_kernel(slices, exists, sign, filter_, depth: int):
    """Device part of Min/Max (reference fragment.min:754 / max:806).

    Runs all four greedy descents (pos-min, pos-max, neg-min, neg-max) and
    returns their bit vectors + counts + presence flags; the host picks the
    right combination.  Returns dict of small arrays.
    """
    base, pos, neg = _split(exists, sign, filter_)
    out = {}
    out["has_pos"] = jnp.any(pos != 0)
    out["has_neg"] = jnp.any(neg != 0)
    out["pos_min"] = _descend(slices, pos, depth, maximize=False)
    out["pos_max"] = _descend(slices, pos, depth, maximize=True)
    out["neg_min"] = _descend(slices, neg, depth, maximize=False)
    out["neg_max"] = _descend(slices, neg, depth, maximize=True)
    return out


def _bits_to_int(bits) -> int:
    import numpy as np
    b = np.asarray(bits)
    v = 0
    for i in range(b.shape[0]):
        if int(b[i]):
            v |= 1 << i
    return v


def min_host(slices, exists, sign, filter_, depth: int):
    """(min value, count at min); (0, 0) when no columns match."""
    p = minmax_parts_kernel(slices, exists, sign, filter_, depth)
    if bool(p["has_neg"]):
        bits, cnt = p["neg_max"]  # most negative = largest magnitude negative
        return -_bits_to_int(bits), int(cnt)
    if bool(p["has_pos"]):
        bits, cnt = p["pos_min"]
        return _bits_to_int(bits), int(cnt)
    return 0, 0


def max_host(slices, exists, sign, filter_, depth: int):
    """(max value, count at max); (0, 0) when no columns match."""
    p = minmax_parts_kernel(slices, exists, sign, filter_, depth)
    if bool(p["has_pos"]):
        bits, cnt = p["pos_max"]
        return _bits_to_int(bits), int(cnt)
    if bool(p["has_neg"]):
        bits, cnt = p["neg_min"]  # least magnitude negative = max
        return -_bits_to_int(bits), int(cnt)
    return 0, 0


def _descend(slices, b, depth: int, maximize: bool):
    """Greedy bit descent over magnitude planes.

    Returns (bits (depth,) int32 — bit i of the extreme value — and count of
    columns achieving it).  If `b` is empty returns zeros.
    """
    bits = []
    for i in range(depth - 1, -1, -1):
        s = slices[i]
        if maximize:
            t = jnp.bitwise_and(b, s)
        else:
            t = jnp.bitwise_and(b, jnp.bitwise_not(s))
        t_any = jnp.any(t != 0)
        b = jnp.where(t_any, t, b)
        if maximize:
            bit = t_any
        else:
            bit = jnp.logical_not(t_any) & jnp.any(b != 0)
        bits.append(bit.astype(jnp.int32))
    bits.reverse()
    return jnp.stack(bits), _pop(b)


# ---------------------------------------------------------------------------
# Dense value extraction (for Extract / GroupBy sums / Distinct / Sort)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=())
def expand_bits(words):
    """(..., W) uint32 words -> (..., W*32) uint8 bit vector (bit c of the
    shard = element c)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., :, None] >> shifts) & _u32(1)
    return bits.reshape(*words.shape[:-1], words.shape[-1] * 32).astype(jnp.uint8)


def decode_values_host(slices_np, sign_np, depth: int):
    """Host dense decode for any depth <= 62: (D, W) uint32 numpy slices ->
    (W*32,) int64 signed values.

    Vectorized bit expansion via np.unpackbits (little-endian word layout:
    bit c of the shard lives at word c>>5, bit c&31 — matching
    fragment.go:1306 pos()).  Used where the 32-bit device path can't
    represent the magnitude (depth > 31): Sort/Extract/Distinct on wide BSI
    fields."""
    import numpy as np
    if depth > 62:
        raise ValueError("BSI depth > 62 unsupported (int64 magnitude)")
    d = int(depth)
    bits = np.unpackbits(
        np.ascontiguousarray(slices_np[:d]).view(np.uint8).reshape(d, -1),
        axis=-1, bitorder="little")
    # bit-matrix transpose via packbits: 8 planes pack into one BYTE of
    # every value at once, so the magnitude assembles from ceil(d/8)
    # byte planes instead of d int64 multiply-adds (the int64 weighted
    # sum materialized a (d, N) int64 intermediate — ~3x slower at
    # Extract's full-shard decodes)
    n_bytes = (d + 7) // 8
    if d % 8:
        pad = np.zeros((n_bytes * 8 - d, bits.shape[1]), dtype=np.uint8)
        bits = np.concatenate([bits, pad], axis=0)
    byte_planes = np.packbits(bits.reshape(n_bytes, 8, -1), axis=1,
                              bitorder="little")[:, 0, :]
    vals = byte_planes[0].astype(np.int64)
    for b in range(1, n_bytes):
        vals += byte_planes[b].astype(np.int64) << np.int64(8 * b)
    sign_bits = np.unpackbits(np.ascontiguousarray(sign_np).view(np.uint8),
                              bitorder="little").astype(bool)
    np.negative(vals, out=vals, where=sign_bits)
    return vals


def expand_bits_host(words_np):
    """(W,) uint32 numpy words -> (W*32,) bool presence vector."""
    import numpy as np
    return np.unpackbits(np.ascontiguousarray(words_np).view(np.uint8),
                         bitorder="little").astype(bool)


@partial(jax.jit, static_argnums=(4,))
def sum_groups_kernel(slices, exists, sign, masks, depth: int):
    """Batched Sum aggregate over G group masks (reference: GroupBy
    aggregates via BitmapBSICountFilter, executor.go:3176 — one scan per
    group; here one fused op per bit-plane covers all groups).

    masks: (G, W).  Returns (pos_pops (D, G), neg_pops (D, G), counts (G,))
    int32 device arrays; host finalizes sum = Σ 2^i (pos_i - neg_i) with
    exact Python ints."""
    pos = jnp.bitwise_and(exists, jnp.bitwise_not(sign))
    neg = jnp.bitwise_and(exists, sign)
    pos_pops = jnp.stack([
        _pop(jnp.bitwise_and(masks, jnp.bitwise_and(slices[i], pos)[None, :]))
        for i in range(depth)])
    neg_pops = jnp.stack([
        _pop(jnp.bitwise_and(masks, jnp.bitwise_and(slices[i], neg)[None, :]))
        for i in range(depth)])
    counts = _pop(jnp.bitwise_and(masks, exists[None, :]))
    return pos_pops, neg_pops, counts


def sum_groups_host(slices, exists, sign, masks, depth: int):
    """(sums list[int], counts list[int]) per group mask, finalized host-side."""
    import numpy as np
    pos_pops, neg_pops, counts = sum_groups_kernel(slices, exists, sign,
                                                   masks, depth)
    pp = np.asarray(pos_pops).astype(np.int64)
    npp = np.asarray(neg_pops).astype(np.int64)
    sums = [sum((1 << i) * (int(pp[i, g]) - int(npp[i, g]))
                for i in range(depth))
            for g in range(pp.shape[1])]
    return sums, [int(c) for c in np.asarray(counts)]


@partial(jax.jit, static_argnums=(4,))
def decode_gather(slices, exists, sign, cols, depth: int):
    """Decode a shard's BSI group and gather only the requested columns:
    (vals (N,) int32, ok (N,) int32).  Transfers N elements to the host
    instead of the full 2^20-wide decode (Extract's per-record values,
    reference executeExtractShard executor.go:4758).  Callers pad `cols`
    to a size bucket so jit traces stay bounded."""
    vals = decode_values(slices, sign, depth)
    present = expand_bits(exists)
    return jnp.take(vals, cols), jnp.take(present, cols).astype(jnp.int32)


@jax.jit
def sum_planes_stacked(bsi, filt):
    """Global Sum parts over a stacked (S, D+2, W) BSI group under an
    (S, W) filter -> (pos_pops (D,), neg_pops (D,), count) uint32 — one
    program for every shard (non-mesh analog of parallel/agg.sum_planes;
    reference fragment.sum:724)."""
    exists = jnp.bitwise_and(bsi[:, 0, :], filt)
    sign = bsi[:, 1, :]
    slices = bsi[:, 2:, :]
    pos = jnp.bitwise_and(exists, jnp.bitwise_not(sign))
    neg = jnp.bitwise_and(exists, sign)
    pc = jax.lax.population_count

    def pops(mask):
        return jnp.sum(
            pc(jnp.bitwise_and(slices, mask[:, None, :])).astype(jnp.uint32),
            axis=(0, 2), dtype=jnp.uint32)
    count = jnp.sum(pc(exists).astype(jnp.uint32), dtype=jnp.uint32)
    return pops(pos), pops(neg), count


@partial(jax.jit, static_argnums=(2, 3))
def min_max_stacked(bsi, filt, depth: int, is_min: bool):
    """(extreme value, count at it) over a stacked (S, D+2, W) BSI group
    under an (S, W) filter — ONE program + ONE fetch for every shard
    (replaces the per-shard bit-descent loop; reference fragment.min/max
    fragment.go:754,806).  count == 0 means no column matched."""
    exists = jnp.bitwise_and(bsi[:, 0, :], filt)
    sign = bsi[:, 1, :]
    slices = bsi[:, 2:2 + depth, :]
    vals = decode_values(slices, sign, depth)          # (S, C) int32
    present = expand_bits(exists).astype(jnp.bool_)    # (S, C)
    sent = jnp.int32(2**31 - 1) if is_min else jnp.int32(-(2**31))
    masked = jnp.where(present, vals, sent)
    m = jnp.min(masked) if is_min else jnp.max(masked)
    cnt = jnp.sum(jnp.logical_and(present, vals == m),
                  dtype=jnp.uint32)
    return m, jnp.where(jnp.any(present), cnt, jnp.uint32(0))


# -- exact 16-bit-limb integer helpers (scalar math inside jit) --------------
#
# The Percentile thresholds are `left > floor(total*nth/100)` style tests.
# Cross-multiplying turns them into exact integer compares —
# left*D > total*num with nth/100 == num/D — but the products need up to
# ~2^91, far past int32.  These helpers do the products in little-endian
# 16-bit limbs held in uint32 lanes (partial products of two 16-bit digits
# can't overflow uint32), unrolled at trace time: a handful of scalar ops.

_CL = 5            # constant limbs: 80 bits, covers any float-derived nth
_PL = _CL + 3      # product limbs: u32 (2 limbs) x _CL + carry headroom


def nth_limbs(nth) -> tuple:
    """Exact rational encoding of a Percentile nth for percentile_fused:
    (num, D-num, D) as (_CL,) uint32 16-bit-limb arrays with
    nth/100 == num/D exactly (num, den = float(nth).as_integer_ratio())."""
    import math
    num0, den0 = float(nth).as_integer_ratio()
    D = den0 * 100
    g = math.gcd(num0, D)
    num0, D = num0 // g, D // g
    if D >= 1 << (16 * _CL) or num0 >= 1 << (16 * _CL):
        raise ValueError("nth fraction too wide for limb encoding")

    def limbs(v):
        return np.array([(v >> (16 * i)) & 0xFFFF for i in range(_CL)],
                        dtype=np.uint32)
    return limbs(num0), limbs(D - num0), limbs(D)


def _mul_u32_limbs(x, c):
    """x (uint32 scalar) * c ((_CL,) 16-bit limbs) -> (_PL,) 16-bit limbs."""
    xl = jnp.bitwise_and(x, jnp.uint32(0xFFFF))
    xh = jnp.right_shift(x, 16)
    acc = [jnp.uint32(0)] * _PL
    for i in range(_CL):
        lo = xl * c[i]
        hi = xh * c[i]
        acc[i] = acc[i] + jnp.bitwise_and(lo, jnp.uint32(0xFFFF))
        acc[i + 1] = (acc[i + 1] + jnp.right_shift(lo, 16)
                      + jnp.bitwise_and(hi, jnp.uint32(0xFFFF)))
        acc[i + 2] = acc[i + 2] + jnp.right_shift(hi, 16)
    carry = jnp.uint32(0)
    out = []
    for i in range(_PL):
        v = acc[i] + carry
        out.append(jnp.bitwise_and(v, jnp.uint32(0xFFFF)))
        carry = jnp.right_shift(v, 16)
    return jnp.stack(out)


def _limbs_gt(a, b):
    """a > b over (_PL,) little-endian limb arrays."""
    gt = jnp.bool_(False)
    lt = jnp.bool_(False)
    for i in reversed(range(_PL)):
        und = jnp.logical_not(jnp.logical_or(gt, lt))
        gt = jnp.logical_or(gt, jnp.logical_and(und, a[i] > b[i]))
        lt = jnp.logical_or(lt, jnp.logical_and(und, a[i] < b[i]))
    return gt


@jax.jit
def decode_values_jit(bsi):
    """Decoded (S, SHARD_WIDTH) int32 values from a stacked (S, D+2, W)
    BSI group (plane 0 exists, 1 sign, 2.. magnitude) — the device-cached
    form consumed by Sort/Percentile (plan.PlanExecutor.stacked_vals)."""
    depth = bsi.shape[1] - 2
    return decode_values(bsi[:, 2:2 + depth, :], bsi[:, 1, :], depth)


@jax.jit
def percentile_fused(vals, exists_words, filt, base, num_l, num2_l, den_l):
    """Percentile in ONE device program + ONE fetch: prep (total/min/max +
    counts), the desired-count threshold cases, and the reference's
    bisection (executor.go:1310; Go-truncating pivot arithmetic,
    executor.go:1497-1500) all fused into a single lax.while_loop program
    (the r3 two-program flow cost two link round trips).

    desired_less = floor(total*num/D) never materializes: every test is an
    exact cross-multiplied limb compare (left*D > total*num), so no float
    rounding can diverge from the host fallback, which computes the same
    thresholds with Python big ints.  (Deviation from the Go reference
    noted: the reference computes the thresholds in float64
    (executor.go:1462); we define them exact-rational on both paths.)

    All value arithmetic is int32 in BASED field units (caller guarantees
    |base| + 2^depth fits).  `vals` is the cached unbased decode
    (plan.stacked_vals); `exists_words`/`filt` are (S, W) planes.
    Returns (val int32, count uint32); count == 0 <=> no matching row."""
    exists = jnp.bitwise_and(exists_words, filt)
    vals = vals + jnp.int32(base)
    present = expand_bits(exists).astype(jnp.bool_)
    total = jnp.sum(present, dtype=jnp.uint32)
    mn = jnp.min(jnp.where(present, vals, jnp.int32(2**31 - 1)))
    mx = jnp.max(jnp.where(present, vals, jnp.int32(-(2**31))))
    mnc = jnp.sum(jnp.logical_and(present, vals == mn), dtype=jnp.uint32)
    mxc = jnp.sum(jnp.logical_and(present, vals == mx), dtype=jnp.uint32)

    den_pad = jnp.concatenate([den_l.astype(jnp.uint32),
                               jnp.zeros((_PL - _CL,), jnp.uint32)])
    t_num = _mul_u32_limbs(total, num_l)     # total * num
    t_num2 = _mul_u32_limbs(total, num2_l)   # total * (D - num)
    dl_zero = _limbs_gt(den_pad, t_num)      # desired_less == 0
    dg_zero = _limbs_gt(den_pad, t_num2)     # desired_greater == 0

    def tdiv2(a):
        return jnp.where(a < 0, -((-a) // 2), a // 2).astype(jnp.int32)

    def pivot(a, b):
        return (tdiv2(a) + tdiv2(b)
                + tdiv2(tdiv2(a) * -2 + a + tdiv2(b) * -2 + b))

    def cond(state):
        lo_, hi_, _poss, done = state
        return jnp.logical_and(jnp.logical_not(done), lo_ < hi_)

    # Speculative breadth-_SPEC_LEVELS bisection: one sequential probe per
    # data pass measured ~2 ms of loop overhead per iteration on v5e
    # (~14 iterations for a 10^4 value range).  Instead, each while
    # iteration evaluates the full depth-L tree of pivots the next L
    # sequential probes COULD visit (2^L - 1 candidates; left/right counts
    # for all of them are sibling-fused reduces over one read of `vals`),
    # then resolves the L bisection levels with pure scalar logic — the
    # probe sequence, pivot arithmetic, and exit conditions are identical
    # to the reference's one-at-a-time loop (executor.go:1310), just
    # batched.
    L = 5

    def body(state):
        lo_, hi_, poss_, done_ = state
        # pivot tree: node k at level l covers the interval reached by the
        # l go_hi/go_lo decisions encoded in k's bits (go_hi child = 2k,
        # go_lo child = 2k+1); invalid (collapsed) intervals produce
        # garbage pivots that the gated walk below never selects
        level = [(lo_, hi_)]
        pivots = []
        for _ in range(L):
            nxt = []
            for a, b in level:
                p = pivot(a, b)
                pivots.append(p)
                nxt.append((a, p - 1))
                nxt.append((p + 1, b))
            level = nxt
        piv = jnp.stack(pivots)
        lefts = jnp.stack([
            jnp.sum(jnp.logical_and(present, vals < p), dtype=jnp.uint32)
            for p in pivots])
        rights = jnp.stack([
            jnp.sum(jnp.logical_and(present, vals > p), dtype=jnp.uint32)
            for p in pivots])
        # scalar walk of the tree — exact replica of L sequential probes
        k = jnp.int32(0)
        for lvl in range(L):
            node = (1 << lvl) - 1 + k
            p = piv[node]
            left = lefts[node]
            right = rights[node]
            active = jnp.logical_and(jnp.logical_not(done_), lo_ < hi_)
            # left > desired_less  <=>  left*D > total*num (exact)
            go_hi = _limbs_gt(_mul_u32_limbs(left, den_l), t_num)
            go_lo = jnp.logical_and(
                jnp.logical_not(go_hi),
                _limbs_gt(_mul_u32_limbs(right, den_l), t_num2))
            fin = jnp.logical_and(jnp.logical_not(go_hi),
                                  jnp.logical_not(go_lo))
            poss_ = jnp.where(active, p, poss_)
            done_ = jnp.where(active, fin, done_)
            lo_ = jnp.where(jnp.logical_and(active, go_lo), p + 1, lo_)
            hi_ = jnp.where(jnp.logical_and(active, go_hi), p - 1, hi_)
            k = jnp.where(active,
                          2 * k + jnp.where(go_lo, 1, 0), k)
        return lo_, hi_, poss_, done_

    # host-flow case order (executor.go:1470-1480): empty -> None;
    # desired_greater != 0 and desired_less == 0 -> min; dg == 0 -> max
    min_case = jnp.logical_and(jnp.logical_not(dg_zero), dl_zero)
    max_case = dg_zero
    skip = jnp.logical_or(jnp.logical_or(min_case, max_case), total == 0)
    state = jax.lax.while_loop(cond, body, (mn, mx, mn, skip))
    poss = state[2]
    val = jnp.where(total == 0, jnp.int32(0),
                    jnp.where(min_case, mn,
                              jnp.where(max_case, mx, poss)))
    cnt = jnp.where(total == 0, jnp.uint32(0),
                    jnp.where(min_case, mnc,
                              jnp.where(max_case, mxc, jnp.uint32(1))))
    return val, cnt


@partial(jax.jit, static_argnums=(2,))
def sum_groups_stacked(bsi, masks, depth: int):
    """Batched GroupBy-Sum over a stacked (S, D+2, W) BSI group and
    (S, G, W) combination masks -> (pos (G, D), neg (G, D), counts (G,))
    uint32 — one program for every shard (the non-mesh analog of
    parallel/agg.group_sums; with mesh-sharded inputs XLA inserts the
    collectives itself)."""
    exists = bsi[:, 0, :]
    sign = bsi[:, 1, :]
    slices = bsi[:, 2:2 + depth, :]
    pos = jnp.bitwise_and(exists, jnp.bitwise_not(sign))
    neg = jnp.bitwise_and(exists, sign)
    sp = jnp.bitwise_and(slices, pos[:, None, :])
    sn = jnp.bitwise_and(slices, neg[:, None, :])
    pc = jax.lax.population_count

    def tot(planes):
        return jnp.sum(
            pc(jnp.bitwise_and(masks[:, :, None, :], planes[:, None, :, :])
               ).astype(jnp.uint32), axis=(0, 3), dtype=jnp.uint32)
    counts = jnp.sum(
        pc(jnp.bitwise_and(masks, exists[:, None, :])).astype(jnp.uint32),
        axis=(0, 2), dtype=jnp.uint32)
    return tot(sp), tot(sn), counts


def _sort_core(slices, exists, sign, depth: int, desc: bool, filt):
    vals = decode_values(slices, sign, depth)
    base = exists if filt is None else jnp.bitwise_and(exists, filt)
    present = expand_bits(base).astype(jnp.int32)
    key = -vals if desc else vals
    notp = jnp.int32(1) - present
    iota = jnp.arange(vals.shape[-1], dtype=jnp.int32)
    _, key_s, idx_s = jax.lax.sort((notp, key, iota), num_keys=2)
    return idx_s, key_s, jnp.sum(present)


@partial(jax.jit, static_argnums=(3, 4))
def sort_bsi_kernel(slices, exists, sign, depth: int, desc: bool, filt=None):
    """Device Sort: full-shard BSI order in one program (reference:
    executor.go:9321 executeSort sorts per-shard then k-way merges; here the
    shard sort is one lax.sort over the dense decoded value vector).

    Returns (idx_sorted (C,) int32 column order, key_sorted (C,) int32
    values in that order (negated when desc), n_present int32).  Matched
    columns occupy the first n_present positions; ties break by ascending
    column id (stable lexicographic sort)."""
    return _sort_core(slices, exists, sign, depth, desc, filt)


@partial(jax.jit, static_argnums=(2, 3))
def sort_bsi_stacked(vals, exists_words, desc: bool, cut: int, filt=None):
    """All shards' top-`cut` BSI orders in ONE program.  `vals` is the
    device-cached unbased decode (plan.stacked_vals — materializing the
    decode inline cost ~15 ms/query on v5e); `exists_words` the (S, W)
    exists plane.  Returns (idx (S, cut) int32, key (S, cut) int32 sort
    keys (negated values when desc, matching sort_bsi_kernel), n_present
    (S,)).

    Uses lax.top_k instead of a full lax.sort: only the per-shard
    top-(offset+limit) prefix can survive the coordinator merge
    (executor.go:9321 per-shard cut), and a full 2^20-element 3-operand
    sort measured ~58 ms/16 shards on v5e vs ~4 ms for blocked top_k.
    Ties break by ascending column id exactly as the lexicographic sort
    did: XLA TopK is documented to prefer the lower index on equal values.
    Absent columns get a -2^31 sentinel score; magnitudes are
    sign-magnitude with |v| <= 2^31-1 so no real score reaches it."""
    exists = exists_words
    if filt is not None:
        exists = jnp.bitwise_and(exists, filt)
    present = expand_bits(exists).astype(jnp.bool_)
    score = jnp.where(present, vals if desc else -vals,
                      jnp.int32(-(2**31)))
    n_present = jnp.sum(present, axis=-1)
    B = 1024
    S, C = score.shape
    if cut <= B and C % B == 0:
        # two-stage exact top-k: per-1024-block top_k, then top_k over the
        # (C/B)*cut candidates (measured ~4 ms vs ~28 ms for one flat
        # lax.top_k over 16 x 2^20 on v5e).  Exactness: the global top-cut
        # is a subset of the per-block top-cuts.  Tie-break: candidates are
        # laid out block-major with blocks in column order and ties within
        # a block already column-ascending, so stage-2's lower-index-first
        # rule again resolves equal scores to the lowest column id.
        nb = C // B
        sc, ix = jax.lax.top_k(score.reshape(S, nb, B), cut)
        gcol = ix + (jnp.arange(nb, dtype=jnp.int32) * B)[None, :, None]
        sc2, ix2 = jax.lax.top_k(sc.reshape(S, nb * cut), cut)
        top_idx = jnp.take_along_axis(gcol.reshape(S, nb * cut), ix2,
                                      axis=1)
        return top_idx, -sc2, n_present
    top_scores, top_idx = jax.lax.top_k(score, cut)
    return top_idx, -top_scores, n_present


@jax.jit
def pack_bits(b):
    """(..., C) bool -> (..., C//32) uint32 little-endian bitmap words
    (inverse of expand_bits)."""
    shape = b.shape
    x = b.reshape(*shape[:-1], shape[-1] // 32, 32).astype(jnp.uint32)
    w = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(x << w, axis=-1, dtype=jnp.uint32)


@partial(jax.jit, static_argnums=(4,))
def after_mask_stacked(vals, col0, after_val, after_col, desc: bool):
    """Keyset-cursor bitmap for streamed Sort pages: columns strictly
    AFTER (after_val, after_col) in (value, column) sort order.

    `vals` (S, C) int32 unbased decoded values (plan.stacked_vals);
    `col0` (S,) int64 global column base per shard.  Returns (S, W)
    uint32 words to AND into the sort filter — cursor resume instead of
    limit/offset pagination, which is unstable under concurrent writes
    (ADVICE r4 #4; reference ordering contract: executor.go:9321)."""
    iota = jnp.arange(vals.shape[-1], dtype=jnp.int64)
    gcol = col0[:, None] + iota[None, :]
    v64 = vals.astype(jnp.int64)
    later = (v64 < after_val) if desc else (v64 > after_val)
    tie = (v64 == after_val) & (gcol > after_col)
    return pack_bits(later | tie)


@partial(jax.jit, static_argnums=(3,))
def bsi_delta_device(cols, mags, neg, depth: int):
    """Device-side BSI ingest scatter (SURVEY §2.9(7); reference position
    sort: fragment.go:1614 parallelSlices, importPositions:1731).

    Builds the (depth+2, W) delta tile — exists, sign, magnitude planes —
    entirely on device from (n,) record arrays: cols int32 (column within
    shard), mags uint32 magnitudes, neg uint32 sign flags.  Per plane a
    scatter-max of the plane's bit lands duplicates idempotently; the
    bit-space result packs to words with pack_bits.  The host path
    (Field.import_values) computes the same tile with np.bitwise_or.at;
    this kernel moves that scatter onto the chip for rigs where the
    device link outruns host memory (bench records both)."""
    width = 1 << 20  # SHARD_WIDTH; static here to keep ops standalone

    def plane(bit_vals):
        return jnp.zeros((width,), jnp.uint8).at[cols].max(
            bit_vals.astype(jnp.uint8))

    planes = [plane(jnp.ones_like(cols, dtype=jnp.uint8)),
              plane(neg)]
    for i in range(depth):
        planes.append(plane((mags >> jnp.uint32(i)) & jnp.uint32(1)))
    return pack_bits(jnp.stack(planes))


def decode_values(slices, sign, depth: int):
    """Per-column signed values as (..., SHARD_WIDTH) int32 dense vector.

    Device path covers magnitudes up to 2^31-1 (depth <= 31); wider fields are
    finalized host-side from raw slices.  Columns without the exists bit get
    arbitrary values — callers mask with the exists row.
    """
    if depth > 31:
        raise ValueError("decode_values device path supports depth <= 31; "
                         "use host decode for wider fields")
    width = slices.shape[-1] * 32
    acc = jnp.zeros(slices.shape[:-2] + (width,), dtype=jnp.int32)
    for i in range(depth):
        acc = acc + (expand_bits(slices[..., i, :]).astype(jnp.int32) << i)
    s = expand_bits(sign).astype(jnp.int32)
    return jnp.where(s == 1, -acc, acc)


# -- statistical moments (SQL VAR/CORR pushdown; reference aggregators:
# sql3/planner/expressionagg.go:1110 aggregateVar, :950 aggregateCorr) ------


@jax.jit
def var_moments_stacked(bsi, filt):
    """One fused program computing everything VAR(x) needs over a stacked
    (S, D+2, W) BSI group under an (S, W) filter:
      cnt           -- matching rows
      pos, neg (D,) -- per-plane popcounts split by sign (-> exact sum)
      sq (D, D)     -- pc(plane_i & plane_j & exists) cross matrix
                       (-> exact sum of squares: sign squares away)
    All uint32 raw counts; the host finalizes with exact Python ints
    (sums of 2^(i+j)-weighted counts overflow any device dtype)."""
    D = bsi.shape[1] - 2
    exists = jnp.bitwise_and(bsi[:, 0, :], filt)
    sign = bsi[:, 1, :]
    slices = bsi[:, 2:, :]
    pos = jnp.bitwise_and(exists, jnp.bitwise_not(sign))
    neg = jnp.bitwise_and(exists, sign)
    pc = jax.lax.population_count

    def tot(x):
        return jnp.sum(pc(x).astype(jnp.uint32), dtype=jnp.uint32)
    cnt = tot(exists)
    p = jnp.stack([tot(jnp.bitwise_and(slices[:, i, :], pos))
                   for i in range(D)])
    n = jnp.stack([tot(jnp.bitwise_and(slices[:, i, :], neg))
                   for i in range(D)])
    sq = jnp.stack([
        jnp.stack([tot(jnp.bitwise_and(
            jnp.bitwise_and(slices[:, i, :], slices[:, j, :]), exists))
            for j in range(D)])
        for i in range(D)])
    return cnt, p, n, sq


@jax.jit
def corr_moments_stacked(bsi_x, bsi_y, filt):
    """One fused program computing everything CORR(x, y) needs: rows where
    BOTH values exist under the filter (reference skips a row when either
    argument is NULL, expressionagg.go:950), per-plane sign-split counts
    for each field, per-field square matrices, and the (Dx, Dy) cross
    matrix split by the four sign combinations."""
    Dx = bsi_x.shape[1] - 2
    Dy = bsi_y.shape[1] - 2
    present = jnp.bitwise_and(jnp.bitwise_and(bsi_x[:, 0, :],
                                              bsi_y[:, 0, :]), filt)
    sx, sy = bsi_x[:, 1, :], bsi_y[:, 1, :]
    X = bsi_x[:, 2:, :]
    Y = bsi_y[:, 2:, :]
    pc = jax.lax.population_count

    def tot(v):
        return jnp.sum(pc(v).astype(jnp.uint32), dtype=jnp.uint32)

    def sign_split(splanes, D, sgn):
        p_ = jnp.bitwise_and(present, jnp.bitwise_not(sgn))
        n_ = jnp.bitwise_and(present, sgn)
        return (jnp.stack([tot(jnp.bitwise_and(splanes[:, i, :], p_))
                           for i in range(D)]),
                jnp.stack([tot(jnp.bitwise_and(splanes[:, i, :], n_))
                           for i in range(D)]))

    def sq_mat(splanes, D):
        return jnp.stack([
            jnp.stack([tot(jnp.bitwise_and(
                jnp.bitwise_and(splanes[:, i, :], splanes[:, j, :]),
                present)) for j in range(D)])
            for i in range(D)])

    cnt = tot(present)
    xp, xn = sign_split(X, Dx, sx)
    yp, yn = sign_split(Y, Dy, sy)
    sqx = sq_mat(X, Dx)
    sqy = sq_mat(Y, Dy)
    classes = []
    for mx in (False, True):
        for my in (False, True):
            m = present
            m = jnp.bitwise_and(m, sx if mx else jnp.bitwise_not(sx))
            m = jnp.bitwise_and(m, sy if my else jnp.bitwise_not(sy))
            classes.append(jnp.stack([
                jnp.stack([tot(jnp.bitwise_and(
                    jnp.bitwise_and(X[:, i, :], Y[:, j, :]), m))
                    for j in range(Dy)])
                for i in range(Dx)]))
    xy_pp, xy_pm, xy_mp, xy_mm = classes
    return cnt, xp, xn, yp, yn, sqx, sqy, xy_pp, xy_pm, xy_mp, xy_mm


def finalize_var_moments(cnt, p, n, sq, base: int):
    """Exact (n, sum, sum-of-squares) of TRUE values from raw counts
    (Python big ints; x = stored + base, stored sign-magnitude)."""
    cnt = int(cnt)
    s_stored = sum((1 << i) * (int(p[i]) - int(n[i])) for i in range(len(p)))
    sq_stored = sum((1 << (i + j)) * int(sq[i][j])
                    for i in range(len(p)) for j in range(len(p)))
    total = s_stored + base * cnt
    total_sq = sq_stored + 2 * base * s_stored + base * base * cnt
    return cnt, total, total_sq


def finalize_cross_moments(xp, xn, yp, yn, classes, base_x: int,
                           base_y: int, cnt: int):
    """Exact (sum_x, sum_y, sum_xy) of TRUE values from raw counts."""
    sx = sum((1 << i) * (int(xp[i]) - int(xn[i])) for i in range(len(xp)))
    sy = sum((1 << j) * (int(yp[j]) - int(yn[j])) for j in range(len(yp)))
    pp, pm, mp, mm = classes
    sxy = sum((1 << (i + j)) * (int(pp[i][j]) - int(pm[i][j])
                                - int(mp[i][j]) + int(mm[i][j]))
              for i in range(len(xp)) for j in range(len(yp)))
    tx = sx + base_x * cnt
    ty = sy + base_y * cnt
    txy = sxy + base_x * sy + base_y * sx + base_x * base_y * cnt
    return tx, ty, txy
