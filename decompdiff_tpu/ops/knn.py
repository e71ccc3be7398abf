"""Masked k-nearest-neighbor graph construction over padded point sets.

TPU-native replacement for PyG `knn_graph` (ref models/encoders/
uni_transformer_edge.py:349-359, models/common.py:250-277): instead of ragged
edge lists rebuilt on host/CUDA every block, we compute a dense masked distance
matrix per complex and take top-k per destination row, yielding a regular
[B, N, K] neighbor tensor. Each real node has exactly K in-edges (fewer only if
the complex has < K+1 real atoms), so scatter_softmax becomes a plain row
softmax over the K axis.

The dense [B, N, N] distance matrix is a single batched matmul-shaped op that
XLA tiles onto the MXU; for N ~ 500 this is microseconds, far cheaper than any
sparse alternative on this hardware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 3], [..., M, 3] -> [..., N, M] squared distances."""
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def knn_neighbors(pos: jnp.ndarray, mask: jnp.ndarray, k: int,
                  return_d2: bool = False):
    """Top-k nearest real neighbors for every node (self excluded).

    Args:
        pos:  [B, N, 3]
        mask: [B, N] bool — real (non-padding) nodes
        k:    neighbors per destination
        return_d2: also return the squared edge distances, which top_k has
            already computed — callers (edge weights, radius cutoff) can then
            skip a narrow [B, N, K, 3] coordinate gather, which on TPU is
            far more expensive per byte than a wide row gather.

    Returns:
        nbr_idx:  [B, N, K] int32 — source-node indices j for edges j -> i
        nbr_mask: [B, N, K] bool  — valid edges (dst real, src real, src != dst)
        nbr_d2:   [B, N, K] float (only when return_d2) — |xi - xj|^2 per
                  edge; invalid slots hold float32.max.
    """
    n = pos.shape[-2]
    d2 = pairwise_sqdist(pos, pos)  # [B, N, N], entry [i, j] = |xi - xj|^2
    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    eye = jnp.eye(n, dtype=bool)
    invalid = eye[None] | ~mask[:, None, :]  # self or padded source
    d2 = jnp.where(invalid, big, d2)
    neg_d2, nbr_idx = jax.lax.top_k(-d2, k)  # [B, N, K]
    nbr_mask = (neg_d2 > -big) & mask[:, :, None]
    if return_d2:
        return nbr_idx.astype(jnp.int32), nbr_mask, -neg_d2
    return nbr_idx.astype(jnp.int32), nbr_mask


def hybrid_neighbors(pos: jnp.ndarray, mask: jnp.ndarray,
                     mask_ligand: jnp.ndarray, k: int, num_protein: int,
                     return_d2: bool = False):
    """The reference's 'hybrid' edge connection in padded form
    (ref models/common.py:230-277 batch_hybrid_edge_connection with
    add_p_index=True):

      * ligand(+prior) destination rows: fully connected to every other
        real ligand node, plus the k nearest real protein atoms;
      * protein destination rows: the k nearest real neighbors of any kind.

    Context layout is [protein | ligand(+prior)] with the protein block a
    static prefix of `num_protein` columns. Returns ([B, N, L + k] indices,
    mask) where L = N - num_protein (the ligand block width).

    Args:
        pos:         [B, N, 3]
        mask:        [B, N] real nodes
        mask_ligand: [B, N] ligand(+prior) nodes
        num_protein: static protein block size
    """
    B, n, _ = pos.shape
    L = n - num_protein
    d2 = pairwise_sqdist(pos, pos)
    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    eye = jnp.eye(n, dtype=bool)

    # slot block 1 [L]: the ligand block columns, fc for ligand dst rows
    lig_cols = jnp.arange(num_protein, n, dtype=jnp.int32)
    fc_idx = jnp.broadcast_to(lig_cols[None, None, :], (B, n, L))
    src_real = mask[:, None, :] & mask_ligand[:, None, :]
    fc_valid = jnp.take_along_axis(
        src_real & ~eye[None], fc_idx, axis=2)
    fc_valid = fc_valid & mask_ligand[:, :, None]  # only ligand dst rows

    # slot block 2 [k]: ligand dst -> k nearest protein; protein dst -> k
    # nearest anything (add_p_index=True)
    src_protein_ok = mask & ~mask_ligand                       # [B, N]
    allowed = jnp.where(mask_ligand[:, :, None],               # per dst row
                        src_protein_ok[:, None, :],
                        mask[:, None, :])
    d2k = jnp.where(allowed & ~eye[None], d2, big)
    neg_d2, knn_idx = jax.lax.top_k(-d2k, k)
    knn_valid = (neg_d2 > -big) & mask[:, :, None]

    nbr_idx = jnp.concatenate([fc_idx, knn_idx.astype(jnp.int32)], axis=2)
    nbr_mask = jnp.concatenate([fc_valid & mask[:, :, None], knn_valid],
                               axis=2)
    if return_d2:
        fc_d2 = jnp.take_along_axis(d2, fc_idx, axis=2)
        return nbr_idx, nbr_mask, jnp.concatenate([fc_d2, -neg_d2], axis=2)
    return nbr_idx, nbr_mask
