"""Bucketed padding collator: featurized numpy records -> ComplexBatch.

This is the contract that keeps jit recompiles bounded (SURVEY.md §5
"bucketed padding"): padded sizes (Np, Nl, A) are rounded up to a small fixed
ladder of bucket edges, so the whole corpus compiles to a handful of XLA
programs instead of one per ragged shape.
"""

from __future__ import annotations

import bisect
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from decompdiff_tpu.data.batch import ComplexBatch, make_bond_mask

# default bucket ladders (atoms); chosen to cover CrossDocked pockets
# (~150-500 atoms) and ligands (~8-60 atoms) with <2x padding waste
PROTEIN_BUCKETS = (128, 192, 256, 320, 384, 448, 512, 640, 768)
LIGAND_BUCKETS = (16, 24, 32, 48, 64)
GROUP_BUCKETS = (4, 8, 12)


def bucketize(n: int, buckets: Sequence[int]) -> int:
    idx = bisect.bisect_left(buckets, n)
    if idx == len(buckets):
        raise ValueError(f'size {n} exceeds largest bucket {buckets[-1]}')
    return buckets[idx]


def _pad_to(x: np.ndarray, shape) -> np.ndarray:
    pad = [(0, t - s) for s, t in zip(x.shape, shape)]
    return np.pad(x, pad)


def collate(records: List[dict],
            protein_buckets=PROTEIN_BUCKETS,
            ligand_buckets=LIGAND_BUCKETS,
            group_buckets=GROUP_BUCKETS,
            np_override: Optional[int] = None,
            nl_override: Optional[int] = None,
            na_override: Optional[int] = None) -> ComplexBatch:
    """Pad a list of featurized records into one fixed-shape ComplexBatch."""
    B = len(records)
    Np = np_override or bucketize(
        max(len(r['protein_pos']) for r in records), protein_buckets)
    Nl = nl_override or bucketize(
        max(len(r['ligand_pos']) for r in records), ligand_buckets)
    A = na_override or bucketize(
        max(len(r['prior_centers']) for r in records), group_buckets)

    feat_dim = records[0]['protein_feat'].shape[-1]
    aux_dim = records[0]['ligand_aux'].shape[-1]

    protein_pos = np.zeros((B, Np, 3), np.float32)
    protein_feat = np.zeros((B, Np, feat_dim), np.float32)
    protein_mask = np.zeros((B, Np), bool)
    ligand_pos = np.zeros((B, Nl, 3), np.float32)
    ligand_v = np.zeros((B, Nl), np.int32)
    ligand_aux = np.zeros((B, Nl, aux_dim), np.float32)
    ligand_mask = np.zeros((B, Nl), bool)
    decomp_idx = np.zeros((B, Nl), np.int32)
    bond_type = np.zeros((B, Nl, Nl), np.int32)
    prior_centers = np.zeros((B, A, 3), np.float32)
    prior_stds = np.ones((B, A, 3), np.float32)
    prior_num = np.zeros((B, A), np.int32)
    prior_mask = np.zeros((B, A), bool)
    num_arms = np.zeros((B,), np.int32)

    for b, r in enumerate(records):
        np_, nl_ = len(r['protein_pos']), len(r['ligand_pos'])
        a_ = len(r['prior_centers'])
        protein_pos[b, :np_] = r['protein_pos']
        protein_feat[b, :np_] = r['protein_feat']
        protein_mask[b, :np_] = True
        ligand_pos[b, :nl_] = r['ligand_pos']
        ligand_v[b, :nl_] = r['ligand_v']
        ligand_aux[b, :nl_] = r['ligand_aux']
        ligand_mask[b, :nl_] = True
        decomp_idx[b, :nl_] = r['ligand_decomp_idx']
        bond_type[b, :nl_, :nl_] = r['bond_type']
        prior_centers[b, :a_] = r['prior_centers']
        prior_stds[b, :a_] = r['prior_stds']
        prior_num[b, :a_] = r['prior_num_atoms']
        prior_mask[b, :a_] = True
        num_arms[b] = r['num_arms']

    bond_mask = make_bond_mask(ligand_mask)
    bond_type = np.where(bond_mask, bond_type, 0)

    return ComplexBatch(
        protein_pos=jnp.asarray(protein_pos),
        protein_feat=jnp.asarray(protein_feat),
        protein_mask=jnp.asarray(protein_mask),
        ligand_pos=jnp.asarray(ligand_pos),
        ligand_v=jnp.asarray(ligand_v),
        ligand_aux=jnp.asarray(ligand_aux),
        ligand_mask=jnp.asarray(ligand_mask),
        ligand_decomp_idx=jnp.asarray(decomp_idx),
        bond_type=jnp.asarray(bond_type),
        bond_mask=jnp.asarray(bond_mask),
        prior_centers=jnp.asarray(prior_centers),
        prior_stds=jnp.asarray(prior_stds),
        prior_num_atoms=jnp.asarray(prior_num),
        prior_mask=jnp.asarray(prior_mask),
        num_arms=jnp.asarray(num_arms),
    )


def bucket_key(record: dict,
               protein_buckets=PROTEIN_BUCKETS,
               ligand_buckets=LIGAND_BUCKETS,
               group_buckets=GROUP_BUCKETS):
    """The compile-cache key a record lands in."""
    return (bucketize(len(record['protein_pos']), protein_buckets),
            bucketize(len(record['ligand_pos']), ligand_buckets),
            bucketize(len(record['prior_centers']), group_buckets))
