"""Shared in-kernel helpers for the Pallas TPU kernels."""

import jax.numpy as jnp


def lane_mean(x):
    """Mean over the lane (last) dim, returned broadcast to ALL lanes, via
    one [NN, H] @ ones[H, H]/H matmul on the MXU. A VPU lane reduction
    materializes a 1-lane array and re-broadcasts it — two relayout passes
    over a cubic array; the ones matmul skips both (round-3 in-model sweep:
    12.96 -> 11.07 ms/step with this in the edge + triplet kernels). Runs
    at the default MXU precision — the same noise class as every other
    matmul in these kernels (Precision.HIGHEST costs 3x the VPU path)."""
    H = x.shape[-1]
    ones_h = jnp.full((H, H), 1.0 / H, jnp.float32)
    return jnp.dot(x.reshape(-1, H), ones_h,
                   preferred_element_type=jnp.float32).reshape(x.shape)


def head_matrix(H: int, n_heads: int):
    """[H, H] same-head indicator: hh[i, j] = 1 iff i, j belong to the same
    attention head. Shared by the edge and triplet kernels (the in-kernel
    head softmax is an hh matmul instead of a lane-splitting reshape)."""
    head_id = jnp.arange(H) // (H // n_heads)
    return (head_id[:, None] == head_id[None, :]).astype(jnp.float32)
