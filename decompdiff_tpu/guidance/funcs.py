"""Validity/drift guidance energies — fully vectorized, jax.grad-able, and
mask-clean so they run *inside* the jitted sampling scan (no host round trips).

Parity targets (ref utils/guidance_funcs.py):
  * clash: smooth-min surface field G(x) = -sigma*log(1e-3 + sum_j exp(-|x-b_j|^2/sigma)),
    loss = mean over ligand atoms of max(0, ct - G)  (ref :24-42)
  * armsca_prox: hinge on the min arm<->scaffold atom distance per arm,
    averaged over arms, summed over valid graphs / num_graphs (ref :50-78)
  * center_prox: pull toward the assigned prior center (ref :45-47; the
    reference's autograd call requires a scalar, so we sum the per-atom norms)
  * arms_repul: arm-arm minimum-distance hinge (ref :81-118)

The reference loops over graphs in Python and calls torch.autograd per energy
(ref models/decompdiff.py:638-677); here every energy is a masked batch
reduction and the total gradient is one jax.grad of their weighted sum.
"""

from __future__ import annotations

import jax.numpy as jnp

from decompdiff_tpu.models.common import safe_norm

_BIG = 1e10


def center_prox_energy(ligand_pos, centers, ligand_mask):
    """sum over real atoms of ||x - mu_assigned||  (ref :45-47).

    ligand_pos/centers [B, Nl, 3]; ligand_mask [B, Nl].
    """
    d = safe_norm(ligand_pos - centers, axis=-1)
    return jnp.sum(d * ligand_mask.astype(d.dtype))


def armsca_prox_energy(ligand_pos, decomp_idx, num_arms, ligand_mask,
                       num_groups, min_d=1.2, max_d=1.9):
    """Keep each arm's closest approach to the scaffold inside [min_d, max_d].

    Per graph: for each arm a, m_a = min over (arm-a atom, scaffold atom) pair
    distances; loss = mean_a hinge(m_a). Graphs lacking arms or scaffold atoms
    contribute 0. Returns sum over valid graphs / num_graphs, matching
    ref :60-78 (which then divides the autograd gradient implicitly).
    """
    B, Nl = ligand_mask.shape
    f32 = ligand_pos.dtype
    is_arm = (decomp_idx < num_arms[:, None]) & ligand_mask
    is_sca = (decomp_idx == num_arms[:, None]) & ligand_mask

    diff = ligand_pos[:, :, None, :] - ligand_pos[:, None, :, :]
    dist = safe_norm(diff, axis=-1)                       # [B, Nl, Nl]
    pair_ok = is_arm[:, :, None] & is_sca[:, None, :]
    dist = jnp.where(pair_ok, dist, _BIG)
    atom_min = dist.min(axis=2)                           # [B, Nl] min over scaffold

    # segment-min per arm group (one-hot trick; A small)
    group_ids = jnp.arange(num_groups)
    in_group = (decomp_idx[:, :, None] == group_ids) & is_arm[:, :, None]
    per_arm = jnp.where(in_group, atom_min[:, :, None], _BIG).min(axis=1)  # [B, A]
    arm_valid = (per_arm < _BIG / 2)
    hinge = (jnp.clip(min_d - per_arm, 0.0, None)
             + jnp.clip(per_arm - max_d, 0.0, None))
    hinge = jnp.where(arm_valid, hinge, 0.0)
    n_arms_valid = arm_valid.sum(axis=1).astype(f32)
    per_graph = hinge.sum(axis=1) / jnp.maximum(n_arms_valid, 1.0)
    graph_valid = (n_arms_valid > 0).astype(f32)
    return (per_graph * graph_valid).sum() / B


def clash_energy(protein_pos, protein_mask, ligand_pos, ligand_mask,
                 sigma=25.0, surface_ct=10.0):
    """Protein-ligand body-intersection loss, summed over graphs (ref :24-42).

    protein_pos [B, Nf, 3] is the *full* protein in original coordinates;
    ligand_pos must be un-centered before calling
    (ref models/decompdiff.py:662).
    """
    d2 = jnp.sum((ligand_pos[:, :, None, :] - protein_pos[:, None, :, :]) ** 2,
                 axis=-1)                                 # [B, Nl, Nf]
    e = jnp.where(protein_mask[:, None, :], jnp.exp(-d2 / sigma), 0.0)
    g = -sigma * jnp.log(1e-3 + e.sum(axis=2))            # [B, Nl]
    viol = jnp.clip(surface_ct - g, 0.0, None)
    m = ligand_mask.astype(viol.dtype)
    per_graph = (viol * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    return per_graph.sum()


def arms_repul_energy(ligand_pos, decomp_idx, num_arms, ligand_mask,
                      num_groups, max_d=1.9, mode='min'):
    """Arm-arm repulsion: min (or all) pairwise distance between different
    arms should exceed max_d (ref :81-118). Sum over valid arm pairs / B."""
    B = ligand_pos.shape[0]
    f32 = ligand_pos.dtype
    is_arm = (decomp_idx < num_arms[:, None]) & ligand_mask

    diff = ligand_pos[:, :, None, :] - ligand_pos[:, None, :, :]
    dist = safe_norm(diff, axis=-1)
    group_ids = jnp.arange(num_groups)
    in_g = (decomp_idx[:, :, None] == group_ids) & is_arm[:, :, None]  # [B,Nl,A]

    # pairwise (a1, a2) arm-group min distances: [B, A, A]
    pair_ok = in_g[:, :, None, :, None] & in_g[:, None, :, None, :]
    d = jnp.where(pair_ok, dist[:, :, :, None, None], _BIG).min(axis=(1, 2))
    valid = (d < _BIG / 2) & (group_ids[:, None] < group_ids[None, :])
    if mode == 'min':
        hinge = jnp.clip(max_d - d, 0.0, None)
    else:
        raise NotImplementedError(mode)
    hinge = jnp.where(valid, hinge, 0.0)
    return hinge.sum() / B
