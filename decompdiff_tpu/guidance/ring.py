"""Ring-repulsion drift (host-side; parity with
ref utils/guidance_funcs.py:161-230 compute_ring_repulsion_drift).

Limits fused-ring growth during sampling: perceive a distance-bonded graph
from the current point cloud, find fused ring systems, and push apart the
longest candidate bonds of systems exceeding `max_allow_rings`. Pure python
over the lightweight MolRecord machinery (no RDKit needed); exposed in
pure_callback-compatible form like the MMFF drift.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Tuple

import numpy as np

from decompdiff_tpu.utils.chem import get_ring_systems, _record_rings
from decompdiff_tpu.data.mol import MolRecord


def ring_repulsion_energy_single(pos: np.ndarray, bond_d: float = 1.9,
                                 max_allow_rings: int = 2) -> Tuple[float, int]:
    """Energy = mean hinge(bond_d - d) over the longest candidate bonds of
    over-fused ring systems (ref :172-229). Returns (energy, n_valid)."""
    pos = np.asarray(pos, np.float64)
    n = len(pos)
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    bond_mask = (d < bond_d) & ~np.eye(n, dtype=bool)
    src, dst = np.nonzero(bond_mask)
    keep = src < dst
    bond_index = np.stack([np.concatenate([src[keep], dst[keep]]),
                           np.concatenate([dst[keep], src[keep]])])
    mol = MolRecord(element=np.full(n, 6), pos=pos.astype(np.float32),
                    bond_index=bond_index,
                    bond_type=np.ones(bond_index.shape[1], np.int64),
                    aromatic=np.zeros(n, bool))
    rings = _record_rings(mol)
    if not rings:
        return 0.0, 0
    systems = get_ring_systems(mol)

    num_atom_rings = np.zeros(n, np.int64)
    for ring in rings:
        for a in ring:
            num_atom_rings[a] += 1

    sys_of_ring = {}
    for ri, ring in enumerate(rings):
        for si, s in enumerate(systems):
            if ring[0] in s and ring[1] in s:
                sys_of_ring[ri] = si
                break

    ringsys_max_distance = defaultdict(list)
    ringsys_num = defaultdict(int)
    for ri, ring in enumerate(rings):
        si = sys_of_ring.get(ri)
        if si is None:
            continue
        idx = np.asarray(ring)
        bm = bond_mask[np.ix_(idx, idx)]
        # only bonds whose endpoints sit in < 4 rings combined (ref :206)
        cand = (num_atom_rings[idx][:, None] + num_atom_rings[idx][None, :]) < 4
        dd = d[np.ix_(idx, idx)][bm & cand]
        if len(dd):
            ringsys_max_distance[si].append(dd.max())
        ringsys_num[si] += 1

    repulsion = []
    for si, dists in ringsys_max_distance.items():
        num_sys = ringsys_num[si]
        if num_sys > max_allow_rings:
            dists = sorted(dists, reverse=True)[:num_sys - max_allow_rings]
            repulsion += dists
    if not repulsion:
        return 0.0, 0
    energy = float(np.mean(np.clip(bond_d - np.asarray(repulsion), 0, None)))
    return energy, 1


def make_ring_repulsion_callback(bond_d: float = 1.9,
                                 max_allow_rings: int = 2,
                                 step_scale: float = 0.1):
    """Numerical-gradient drift callback f(pos, v, mask) -> drift [B, Nl, 3].

    The reference backprops through the hinge on pairwise distances of a
    detached bond graph; here the (host) gradient is taken by perturbing the
    atoms participating in the repulsion bonds directly: for each penalized
    bond (a, b), push a and b apart along their axis by the hinge magnitude.
    """

    def callback(pos, v, mask):
        pos = np.asarray(pos, np.float64)
        mask = np.asarray(mask)
        B, Nl, _ = pos.shape
        out = np.zeros((B, Nl, 3), np.float32)
        for b in range(B):
            p = pos[b][mask[b]]
            n = len(p)
            if n < 3:
                continue
            d = np.linalg.norm(p[:, None] - p[None], axis=-1)
            energy, valid = ring_repulsion_energy_single(
                p, bond_d, max_allow_rings)
            if not valid:
                continue
            # push apart the closest intra-ring bonds (descent direction of
            # the hinge): numerical symmetric difference over bond axes
            grads = np.zeros_like(p)
            bond = (d < bond_d) & ~np.eye(n, dtype=bool)
            for a in range(n):
                for c in range(a + 1, n):
                    if not bond[a, c]:
                        continue
                    axis = p[a] - p[c]
                    norm = np.linalg.norm(axis)
                    if norm < 1e-6:
                        continue
                    hinge = max(bond_d - norm, 0.0)
                    grads[a] -= step_scale * hinge * axis / norm
                    grads[c] += step_scale * hinge * axis / norm
            out[b, mask[b]] = (energy * grads).astype(np.float32)
        return out

    return callback
