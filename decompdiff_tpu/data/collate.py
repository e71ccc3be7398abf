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
# (~150-500 atoms) and ligands (~8-60 atoms) with <2x padding waste.
# LIGAND_BUCKETS is tuned against the committed CrossDocked ligand-size
# tables (benchmarks/bench_mixed_buckets.py --ladders-only: mean 23.7
# atoms, p95=38): the 40 rung serves ~12% of the corpus that previously
# padded to 48 — the triplet stream is cubic in Nl, so that rung alone cuts
# those pockets' dominant kernel work by (48/40)^3 = 1.7x. Rungs stay
# multiples of 8 (Mosaic: the bond/triplet kernels block on Nl sublanes).
PROTEIN_BUCKETS = (128, 192, 256, 320, 384, 448, 512, 640, 768)
LIGAND_BUCKETS = (16, 24, 32, 40, 48, 64)
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
            na_override: Optional[int] = None,
            to_device: bool = True) -> ComplexBatch:
    """Pad a list of featurized records into one fixed-shape ComplexBatch.

    to_device=False keeps the leaves as numpy: jit transfers them at
    dispatch anyway, and a host-resident batch lets drivers read masks and
    index arrays without a device->host round trip that would queue behind
    in-flight work on the (serialized) TPU tunnel stream."""
    B = len(records)
    Np = np_override or bucketize(
        max(len(r['protein_pos']) for r in records), protein_buckets)
    Nl = nl_override or bucketize(
        max(len(r['ligand_pos']) for r in records), ligand_buckets)
    A = na_override or bucketize(
        max(len(r['prior_centers']) for r in records), group_buckets)
    # the native pad routines memcpy without bounds checks — an override
    # smaller than a record would be silent heap corruption, not an error
    for name, cap, key in (('np_override', Np, 'protein_pos'),
                           ('nl_override', Nl, 'ligand_pos'),
                           ('na_override', A, 'prior_centers')):
        worst = max(len(r[key]) for r in records)
        if worst > cap:
            raise ValueError(
                f'collate: {name}={cap} is smaller than the largest '
                f'record ({key} has {worst} rows)')

    from decompdiff_tpu import native

    def f32(key):
        return [np.asarray(r[key], np.float32) for r in records]

    def i32(key):
        return [np.asarray(r[key], np.int32) for r in records]

    p_counts = [len(r['protein_pos']) for r in records]
    l_counts = [len(r['ligand_pos']) for r in records]
    a_counts = [len(r['prior_centers']) for r in records]

    protein_pos = native.pad_stack_f32(f32('protein_pos'), Np)
    protein_feat = native.pad_stack_f32(f32('protein_feat'), Np)
    protein_mask = native.length_masks(p_counts, Np)
    ligand_pos = native.pad_stack_f32(f32('ligand_pos'), Nl)
    ligand_v = native.pad_stack_i32(i32('ligand_v'), Nl)[..., 0]
    ligand_aux = native.pad_stack_f32(f32('ligand_aux'), Nl)
    ligand_mask = native.length_masks(l_counts, Nl)
    decomp_idx = native.pad_stack_i32(i32('ligand_decomp_idx'), Nl)[..., 0]
    bond_type = native.pad_square_stack_i32(
        [np.asarray(r['bond_type'], np.int32) for r in records], Nl)
    prior_centers = native.pad_stack_f32(f32('prior_centers'), A)
    prior_stds = native.pad_stack_f32(f32('prior_stds'), A)
    # padded prior rows keep std 1 so padded-atom math stays harmless
    prior_mask = native.length_masks(a_counts, A)
    prior_stds = np.where(prior_mask[..., None], prior_stds, 1.0)
    prior_num = native.pad_stack_i32(i32('prior_num_atoms'), A)[..., 0]
    num_arms = np.array([r['num_arms'] for r in records], np.int32)

    bond_mask = native.fc_bond_masks(l_counts, Nl)
    if any('bond_graph_mask' in r for r in records):
        # restricted bond graphs (decomp_fc / scaffold_fc modes,
        # ref utils/transforms.py:339-378)
        gmask = np.stack([
            _pad_to(np.asarray(r['bond_graph_mask'], bool), (Nl, Nl))
            if 'bond_graph_mask' in r else np.ones((Nl, Nl), bool)
            for r in records])
        bond_mask = bond_mask & gmask
    bond_type = np.where(bond_mask, bond_type, 0)

    conv = jnp.asarray if to_device else np.asarray
    return ComplexBatch(
        protein_pos=conv(protein_pos),
        protein_feat=conv(protein_feat),
        protein_mask=conv(protein_mask),
        ligand_pos=conv(ligand_pos),
        ligand_v=conv(ligand_v),
        ligand_aux=conv(ligand_aux),
        ligand_mask=conv(ligand_mask),
        ligand_decomp_idx=conv(decomp_idx),
        bond_type=conv(bond_type),
        bond_mask=conv(bond_mask),
        prior_centers=conv(prior_centers),
        prior_stds=conv(prior_stds),
        prior_num_atoms=conv(prior_num),
        prior_mask=conv(prior_mask),
        num_arms=conv(num_arms),
    )


def bucket_key(record: dict,
               protein_buckets=PROTEIN_BUCKETS,
               ligand_buckets=LIGAND_BUCKETS,
               group_buckets=GROUP_BUCKETS):
    """The compile-cache key a record lands in."""
    return (bucketize(len(record['protein_pos']), protein_buckets),
            bucketize(len(record['ligand_pos']), ligand_buckets),
            bucketize(len(record['prior_centers']), group_buckets))
