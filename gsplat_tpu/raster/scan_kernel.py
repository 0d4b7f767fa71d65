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
