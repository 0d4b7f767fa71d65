"""Fused scan + owner-expansion Pallas kernels for binning.

Three families:
- ``multi_cummax`` / ``multi_cumsum``: several 1-D scans in ONE
  sequential-grid pass (XLA lowers each `lax.cummax` to its own
  multi-pass reduce-window, ~2ms each at 5M duplicates; fused they are
  bandwidth-bound, ~0.5ms) — blocks scanned in registers (lane roll/max
  doubling + sublane combine), carried across blocks in SMEM scalars.
  The cumsum variant keeps a Kahan-compensated carry.
- ``expand_scan``: the owner-scan triple (latest-nonzero pack, cummax
  base, start-count rank) consumed by binning's duplicate expansion after
  a scatter-max of range markers.
- ``merge_expand``: the scatter-FREE equivalent of scatter-max +
  expand_scan — resolves each slot's owning range by comparing the slot
  index against a windowed slice of the ascending range starts (the
  windows come from a tiny host-side searchsorted) and extracts the
  owner's values with one byte-split bf16 matmul. Cost scales with the
  SLOT count (~2.6 ns/slot measured at K=1.45M) instead of the GAUSSIAN
  count (~8.8 ns/row for the scatter at P=1M), so binning picks
  whichever is statically cheaper for the config.

Mosaic pitfall encountered here on v5e (workaround in ``_merge_kernel``,
kept because the miscompile is SILENT): `x | (y << s)` DROPS the shifted
term for s >= 16 when y is a lane-slice of an MXU output, while the
slice, the shift, and the whole-matrix store are each exact in isolation
— compose with multiply-add instead.
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


_MB = 512       # merge_expand: slots resolved per grid step.  Swept on
                # v5e at K=1.45M: 256 -> 4.04 ms, 512 -> 3.77, 1024 -> 5.18
                # (smaller blocks shrink the (mb, 3*mb) one-hot quadratically
                # but pay more searchsorted/window bookkeeping per slot).
_MW = 3         # candidate windows of _MB rows fetched per step


def _merge_kernel(win_ref, s0, s1, s2, p0, p1, p2,
                  pack_o, base_o, rank_o):
    """Owner resolution for one block of _MB slots (see merge_expand).

    Operands arrive as (1, 1, _MB) blocks — already on LANES with a
    T(1,128) tiling, so the (1, _MB) candidate rows below are free
    reshapes (the previous (rows, 128) layout paid a sublanes->lanes
    relayout per operand that dominated the kernel: 8.0 -> 2.9 ms at
    K=1.45M on v5e). The owner one-hot of slot d is the telescope
    (starts[g] <= d) & (starts[g+1] > d) — exactly one lane per live
    slot. Owner values come back through ONE batched matmul contracting
    the candidate lanes — transposed so the SLOT axis stays on lanes in
    the (24, _MB) output: the lhs stacks byte-splits of (pack, start,
    lane index), all EXACT in bf16 (0/1 one-hots, 8-bit values), so each
    f32 output element is exact; bytes recompose in int32."""
    k = pl.program_id(0)
    wb = win_ref[k]
    g_lanes = _MW * _MB
    imax = 2147483647

    def row(ref):
        return ref[...].reshape(1, _MB)  # (1, 1, _MB) -> (1, _MB), free

    starts_row = jnp.concatenate([row(s0), row(s1), row(s2)], axis=1)
    pack_row = jnp.concatenate([row(p0), row(p1), row(p2)], axis=1)
    col = lax.broadcasted_iota(jnp.int32, (1, g_lanes), 1)
    s_next = jnp.where(col < g_lanes - 1,
                       jnp.roll(starts_row, -1, axis=1), imax)

    d_col = (k * _MB + lax.broadcasted_iota(jnp.int32, (_MB, 1), 0))
    onehot = ((starts_row <= d_col)
              & (s_next > d_col)).astype(jnp.bfloat16)  # (_MB, 3*_MB)

    # lhs logical rows: pack bytes 0-3, start bytes 0-3, lane-index bytes
    # 0-1, built with sublane broadcasts + per-element shifts and spread
    # onto even (2,1)-packed bf16 sublane pairs (logical row j at physical
    # row (j//2)*4 + (j%2)). The spread + broadcast construction dates to
    # chasing a corruption that turned out to be the compose() or-shift
    # miscompile below; both are kept as belt-and-braces — they cost
    # nothing (lhs height stays under one MXU tile) and this Mosaic
    # version has shown several silent lowering bugs in this kernel.
    ridx = lax.broadcasted_iota(jnp.int32, (24, g_lanes), 0)
    jj = (ridx // 4) * 2 + (ridx % 2)  # logical byte-slot of this row
    val = jnp.where(jj < 4, pack_row,
                    jnp.where(jj < 8, starts_row, col))
    byte = jnp.where(jj < 4, jj,
                     jnp.where(jj < 8, jj - 4, jj - 8))
    rhs = ((val >> (byte * 8)) & 255).astype(jnp.bfloat16)  # (24, 3*_MB)
    # transposed contraction: output (24, _MB) — slots stay on LANES
    picked = lax.dot_general(rhs, onehot, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    pi = picked.astype(jnp.int32)  # (24, _MB) — each element exact

    def compose(j, nbytes):
        # Multiply-add, NOT or-with-shift: this Mosaic version silently
        # drops `x << s` terms for s >= 16 when x is a slice of the
        # matmul output (verified: the slices and standalone shifts are
        # both exact; the or-shift combination loses the high bytes).
        # Bytes occupy disjoint ranges, so + == | exactly.
        def c(b):  # logical byte-slot -> physical lhs row (see above)
            jb = j + b
            return (jb // 2) * 4 + (jb % 2)
        acc = pi[c(0):c(0) + 1, :]
        for b in range(1, nbytes):
            acc = acc + pi[c(b):c(b) + 1, :] * (1 << (8 * b))
        return acc

    out_shape = (1, 1, _MB)
    pack_o[...] = compose(0, 4).reshape(out_shape)
    base_o[...] = compose(4, 4).reshape(out_shape)
    # rank = global owner row + 1; dead slots (no owner) read 0+wb*_MB+1,
    # which every consumer masks (d >= num_dup)
    rank_o[...] = (wb * _MB + compose(8, 2) + 1).reshape(out_shape)


def merge_expand(starts, pack, k: int, interpret: bool = False):
    """Scatter-free duplicate expansion: (pack_d, base_of_d, rank_d) [k].

    Drop-in replacement for binning's ``fill.at[starts].max(pack)`` +
    ``expand_scan`` pipeline (the scatter-max alone measured 8.8 ms at
    P=1M on v5e). ``starts`` must be ascending (strictly increasing
    wherever the row is a live marker — binning's actives-prefix cumsum
    guarantees it); slot d's owner is the LAST g with starts[g] <= d:

      pack_d[d] = pack[owner],  base_of_d[d] = starts[owner],
      rank_d[d] = owner + 1  (== #{g : starts[g] <= d} wherever starts
      are distinct — everywhere that matters: the repeated inactive-tail
      starts own only slots >= num_dup, which every consumer masks).

    The per-block candidate window is located host-side with a small
    searchsorted (one query per _MB slots) and fetched through three
    block-aligned BlockSpecs — the window [wb, wb+3) x _MB always covers
    the block's owners because consecutive live starts differ by >= 1."""
    p = starts.shape[0]
    n_sub = -(-k // _MB)
    k_pad = n_sub * _MB
    # candidate table padded so any clamped 3-window fetch is in bounds;
    # +inf (i32 max) pad rows can never win the <= d test
    p_pad = max(-(-p // _MB), _MW) * _MB
    imax = jnp.iinfo(jnp.int32).max
    sp = jnp.full((p_pad,), imax, jnp.int32).at[:p].set(starts)
    pp = jnp.pad(pack, (0, p_pad - p))

    d0s = jnp.arange(n_sub, dtype=jnp.int32) * _MB
    lo = jnp.searchsorted(sp, d0s, side="right").astype(jnp.int32) - 1
    win = jnp.clip(lo // _MB, 0, p_pad // _MB - _MW)

    # (blocks, 1, _MB): the last two block dims equal the array dims, so
    # Mosaic tiles T(1,128) — candidates land on LANES with no relayout
    sp2 = sp.reshape(-1, 1, _MB)
    pp2 = pp.reshape(-1, 1, _MB)

    def wspec(off):
        # w[i] is in _MB-element units == (1, 1, _MB)-block units
        return pl.BlockSpec((1, 1, _MB),
                            lambda i, w, off=off: (w[i] + off, 0, 0),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, 1, _MB), lambda i, w: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_sub,),
        in_specs=[wspec(0), wspec(1), wspec(2)] * 2,
        out_specs=[out_spec] * 3,
    )
    outs = pl.pallas_call(
        _merge_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_sub, 1, _MB), jnp.int32)] * 3,
        interpret=interpret,
    )(win, sp2, sp2, sp2, pp2, pp2, pp2)
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
