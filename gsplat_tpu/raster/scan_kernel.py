"""Fused multi-array cumulative-max Pallas kernel.

binning.py drives four owner-scans (cummax of scattered range markers) per
rasterization. XLA lowers each `lax.cummax` to its own multi-pass
reduce-window over the full array (~2ms each at 5M duplicates); fusing all
four into ONE sequential-grid Pallas pass makes the whole thing
bandwidth-bound (~0.5ms): each block is loaded once, scanned in registers
(lane roll/max doubling + sublane combine), and carried across blocks in
SMEM scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 32          # block = _ROWS x 128 = 4096 elements
_NEG = -2147483648  # python int: jnp constants may not be captured by kernels


def _block_cummax(x):
    """Inclusive row-major cummax of a (R, 128) int32 block."""
    rows, lanes = x.shape
    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    shift = 1
    while shift < lanes:  # prefix along lanes within each row
        rolled = jnp.roll(acc, shift, axis=1)
        acc = jnp.maximum(acc, jnp.where(col >= shift, rolled, _NEG))
        shift *= 2
    # combine: prefix of previous rows' totals along sublanes
    tot = jnp.broadcast_to(acc[:, -1:], x.shape)  # per-row inclusive total
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    pre = jnp.where(row >= 1, jnp.roll(tot, 1, axis=0), _NEG)  # exclusive
    shift = 1
    while shift < rows:  # inclusive scan of `pre` == exclusive of totals
        rolled = jnp.roll(pre, shift, axis=0)
        pre = jnp.maximum(pre, jnp.where(row >= shift, rolled, _NEG))
        shift *= 2
    return jnp.maximum(acc, pre)


def _kernel(*refs, n_arrays: int):
    in_refs = refs[:n_arrays]
    out_refs = refs[n_arrays:2 * n_arrays]
    carry = refs[2 * n_arrays]
    first = pl.program_id(0) == 0
    for i in range(n_arrays):
        @pl.when(first)
        def _(i=i):
            carry[i, 0] = _NEG
        scanned = _block_cummax(in_refs[i][...])
        scanned = jnp.maximum(scanned, carry[i, 0])
        out_refs[i][...] = scanned
        # a cummax block is monotone row-major: its max IS its last element
        carry[i, 0] = jnp.max(scanned)


def _block_cumsum(x):
    """Inclusive row-major cumsum of a (R, 128) f32 block."""
    rows, lanes = x.shape
    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    shift = 1
    while shift < lanes:  # prefix along lanes within each row
        rolled = jnp.roll(acc, shift, axis=1)
        acc = acc + jnp.where(col >= shift, rolled, 0.0)
        shift *= 2
    tot = jnp.broadcast_to(acc[:, -1:], x.shape)  # per-row inclusive total
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    pre = jnp.where(row >= 1, jnp.roll(tot, 1, axis=0), 0.0)  # exclusive
    shift = 1
    while shift < rows:
        rolled = jnp.roll(pre, shift, axis=0)
        pre = pre + jnp.where(row >= shift, rolled, 0.0)
        shift *= 2
    return acc + pre


def _cumsum_kernel(*refs, n_arrays: int):
    in_refs = refs[:n_arrays]
    out_refs = refs[n_arrays:2 * n_arrays]
    carry = refs[2 * n_arrays]  # [n, 2] (Kahan sum, compensation)
    first = pl.program_id(0) == 0
    for i in range(n_arrays):
        @pl.when(first)
        def _(i=i):
            carry[i, 0] = 0.0
            carry[i, 1] = 0.0
        scanned = _block_cumsum(in_refs[i][...])
        c_hi = carry[i, 0]
        c_lo = carry[i, 1]
        out_refs[i][...] = scanned + (c_hi + c_lo)
        # Kahan/Neumaier-compensated running total: the uncompensated carry
        # random-walks to ~sqrt(K)|x| and its eps-relative error would leak
        # into every downstream segment DIFFERENCE of this cumsum.
        y = scanned[_ROWS - 1, _LANES - 1] + c_lo
        t = c_hi + y
        comp = jnp.where(jnp.abs(c_hi) >= jnp.abs(y),
                         (c_hi - t) + y, (y - t) + c_hi)
        carry[i, 0] = t
        carry[i, 1] = comp


def multi_cumsum(arrays, interpret: bool = False):
    """Inclusive Kahan-compensated cumsum of each 1-D f32 array, fused.

    All arrays must share the same length; returns outputs in order. The
    per-element error stays at within-block (~4096-element) scale instead
    of growing with the global running total."""
    n = len(arrays)
    k = arrays[0].shape[0]
    blk = _ROWS * _LANES
    k_pad = -(-k // blk) * blk
    padded = [jnp.pad(a, (0, k_pad - k)).reshape(k_pad // _LANES, _LANES)
              for a in arrays]

    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_cumsum_kernel, n_arrays=n),
        grid=(k_pad // blk,),
        in_specs=[spec] * n,
        out_specs=[spec] * n,
        out_shape=[jax.ShapeDtypeStruct((k_pad // _LANES, _LANES),
                                        jnp.float32)] * n,
        scratch_shapes=[pltpu.SMEM((n, 2), jnp.float32)],
        interpret=interpret,
    )(*padded)
    return [o.reshape(-1)[:k] for o in outs]


def _block_carry(x, incoming):
    """Latest-nonzero scan of a (R, 128) int32 block: out[i] = last
    non-zero value at or before i (``incoming`` if none). 'Take the later
    operand unless it is zero' is associative, so log-doubling works —
    and unlike cummax it needs NO monotone rank field in the carried pack
    (the owner-scan trick that previously forced rank bits into every
    scattered marker, and a second scatter when they did not fit)."""
    rows, lanes = x.shape
    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    shift = 1
    while shift < lanes:  # prefix along lanes within each row
        rolled = jnp.where(col >= shift, jnp.roll(acc, shift, axis=1), 0)
        acc = jnp.where(acc != 0, acc, rolled)
        shift *= 2
    tot = jnp.broadcast_to(acc[:, -1:], x.shape)  # per-row latest nonzero
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    pre = jnp.where(row >= 1, jnp.roll(tot, 1, axis=0), 0)  # exclusive
    shift = 1
    while shift < rows:
        rolled = jnp.where(row >= shift, jnp.roll(pre, shift, axis=0), 0)
        pre = jnp.where(pre != 0, pre, rolled)
        shift *= 2
    acc = jnp.where(acc != 0, acc, pre)
    return jnp.where(acc != 0, acc, incoming)


def _block_cumsum_i32(x):
    """Inclusive row-major int32 cumsum of a (R, 128) block (exact)."""
    rows, lanes = x.shape
    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    shift = 1
    while shift < lanes:
        acc = acc + jnp.where(col >= shift, jnp.roll(acc, shift, axis=1), 0)
        shift *= 2
    tot = jnp.broadcast_to(acc[:, -1:], x.shape)
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    pre = jnp.where(row >= 1, jnp.roll(tot, 1, axis=0), 0)
    shift = 1
    while shift < rows:
        pre = pre + jnp.where(row >= shift, jnp.roll(pre, shift, axis=0), 0)
        shift *= 2
    return acc + pre


def _expand_kernel(m_ref, b_ref, pack_ref, base_ref, rank_ref, carry):
    """Fused owner-scan triple for binning's duplicate expansion:
    pack = latest-nonzero(marks), base = cummax(base_in),
    rank = cumsum(marks != 0) (1-based at the first start)."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        carry[0] = 0       # latest nonzero pack so far
        carry[1] = 0       # running max base (slot ids are >= 0)
        carry[2] = 0       # number of starts so far

    m = m_ref[...]
    pack = _block_carry(m, carry[0])
    pack_ref[...] = pack
    carry[0] = pack[_ROWS - 1, _LANES - 1]

    base = jnp.maximum(_block_cummax(b_ref[...]), carry[1])
    base_ref[...] = base
    carry[1] = base[_ROWS - 1, _LANES - 1]

    rank = _block_cumsum_i32((m != 0).astype(jnp.int32)) + carry[2]
    rank_ref[...] = rank
    carry[2] = rank[_ROWS - 1, _LANES - 1]


def expand_scan(marks, base_in, interpret: bool = False):
    """One fused pass over the slot axis for binning's expansion:
    returns (carried pack, cummax base, 1-based owner rank) — see
    binning.bin_gaussians. All int32, same length."""
    k = marks.shape[0]
    blk = _ROWS * _LANES
    k_pad = -(-k // blk) * blk
    mp = jnp.pad(marks, (0, k_pad - k)).reshape(k_pad // _LANES, _LANES)
    bp = jnp.pad(base_in, (0, k_pad - k)).reshape(k_pad // _LANES, _LANES)

    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _expand_kernel,
        grid=(k_pad // blk,),
        in_specs=[spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((k_pad // _LANES, _LANES),
                                        jnp.int32)] * 3,
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        interpret=interpret,
    )(mp, bp)
    return [o.reshape(-1)[:k] for o in outs]


def multi_cummax(arrays, interpret: bool = False):
    """Inclusive cummax of each 1-D int32 array, all in one fused pass.

    All arrays must share the same length; returns outputs in order.
    """
    n = len(arrays)
    k = arrays[0].shape[0]
    blk = _ROWS * _LANES
    k_pad = -(-k // blk) * blk
    padded = [jnp.pad(a, (0, k_pad - k), constant_values=-2147483648)
              .reshape(k_pad // _LANES, _LANES) for a in arrays]

    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, n_arrays=n),
        grid=(k_pad // blk,),
        in_specs=[spec] * n,
        out_specs=[spec] * n,
        out_shape=[jax.ShapeDtypeStruct((k_pad // _LANES, _LANES), jnp.int32)
                   ] * n,
        scratch_shapes=[pltpu.SMEM((n, 1), jnp.int32)],
        interpret=interpret,
    )(*padded)
    return [o.reshape(-1)[:k] for o in outs]
