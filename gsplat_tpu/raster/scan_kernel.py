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
