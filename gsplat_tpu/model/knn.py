"""K-nearest-neighbor mean squared distance for Gaussian scale init.

TPU-native replacement for the simple-knn CUDA extension
(submodules/simple-knn/simple_knn.cu:185-221, spatial.cu:15-26): the
reference computes, per point, the mean squared distance to its 3 nearest
neighbors via Morton-sorted boxes. Here we compute it EXACTLY with a blocked
distance matrix: the -2<x,y> cross term is an MXU matmul and a top-3 running
minimum is carried across column blocks with lax.scan — O(P^2) flops but
one-time at init and MXU-friendly (~seconds for 300k sfm points).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_indices(points: jnp.ndarray, k: int = 20, block: int = 2048):
    """Exact k-NN indices + squared distances (excluding self).

    The TPU replacement for the open3d KDTree neighbor build the reference
    uses for its ARAP regularizer (utils/loss_utils.py:71-101). Blocked
    top-k over an MXU distance matrix. Returns (sq_dists [P,k], idx [P,k]).
    """
    p = points.shape[0]
    pad = (-p) % block
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    n = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=1)
    num_blocks = n // block
    blocks = pts.reshape(num_blocks, block, 3)
    sq_blocks = sq.reshape(num_blocks, block)
    inf = jnp.float32(jnp.inf)
    idx_all = jnp.arange(n, dtype=jnp.int32)

    def body(carry, inputs):
        best_d, best_i = carry
        blk_pts, blk_sq, blk_id = inputs
        cross = jnp.dot(pts, blk_pts.T, precision="highest")
        d2 = sq[:, None] + blk_sq[None, :] - 2.0 * cross
        col_ids = blk_id * block + jnp.arange(block, dtype=jnp.int32)
        invalid = (col_ids[None, :] == idx_all[:, None]) | (col_ids >= p)[None, :]
        d2 = jnp.where(invalid, inf, jnp.maximum(d2, 0.0))
        blk_d, blk_j = lax.top_k(-d2, k)
        blk_i = col_ids[blk_j]
        merged_d = jnp.concatenate([best_d, -blk_d], axis=1)
        merged_i = jnp.concatenate([best_i, blk_i], axis=1)
        keep_d, keep_j = lax.top_k(-merged_d, k)
        return (-keep_d, jnp.take_along_axis(merged_i, keep_j, axis=1)), None

    init = (jnp.full((n, k), inf), jnp.zeros((n, k), jnp.int32))
    (best_d, best_i), _ = lax.scan(
        body, init,
        (blocks, sq_blocks, jnp.arange(num_blocks, dtype=jnp.int32)))
    return best_d[:p], best_i[:p]


@functools.partial(jax.jit, static_argnames=("block",))
def mean_sq_dist_3nn(points: jnp.ndarray, block: int = 2048) -> jnp.ndarray:
    """points [P, 3] -> [P] mean of squared distances to the 3 nearest
    neighbors (excluding self)."""
    p = points.shape[0]
    pad = (-p) % block
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    n = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=1)

    num_blocks = n // block
    blocks = pts.reshape(num_blocks, block, 3)
    sq_blocks = sq.reshape(num_blocks, block)

    inf = jnp.float32(jnp.inf)
    idx_all = jnp.arange(n, dtype=jnp.int32)
    pad_mask_all = idx_all >= p  # padded rows are not real neighbors

    def body(carry, inputs):
        top3 = carry  # [n, 3] current smallest squared distances, sorted asc
        blk_pts, blk_sq, blk_id = inputs
        # d2[i, j] = |x_i|^2 + |y_j|^2 - 2 <x_i, y_j>
        cross = jnp.dot(pts, blk_pts.T, precision="highest")  # MXU [n, block]
        d2 = sq[:, None] + blk_sq[None, :] - 2.0 * cross
        # mask self-pairs and padded columns
        col_ids = blk_id * block + jnp.arange(block, dtype=jnp.int32)
        invalid = (col_ids[None, :] == idx_all[:, None]) | (col_ids >= p)[None, :]
        d2 = jnp.where(invalid, inf, jnp.maximum(d2, 0.0))
        # merge block's 3 smallest into the carry
        blk_top3 = -lax.top_k(-d2, 3)[0]  # [n, 3] ascending? top_k desc of -d2
        merged = jnp.concatenate([top3, blk_top3], axis=1)
        top3 = -lax.top_k(-merged, 3)[0]
        return top3, None

    init = jnp.full((n, 3), inf)
    top3, _ = lax.scan(
        body, init,
        (blocks, sq_blocks, jnp.arange(num_blocks, dtype=jnp.int32)))
    out = jnp.mean(top3, axis=1)
    out = jnp.where(pad_mask_all, 0.0, out)
    return out[:p]
