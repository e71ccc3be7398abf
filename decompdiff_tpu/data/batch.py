"""Fixed-shape padded batch structures — the device-side data contract.

This replaces the reference's ragged PyG graphs + `__inc__` offset batching
(ref utils/data.py:367-446, datasets/pl_data.py:11) with dense [B, ...] arrays
and boolean masks. All per-graph bookkeeping (batch vectors, decomp-group
offsets, follow_batch) disappears: the batch axis separates graphs, and decomp
group indices are per-sample local integers into the [B, A] prior tables.

Shapes (one size bucket):
    B  — complexes per batch
    Np — padded protein pocket atoms
    Nl — padded ligand atoms
    A  — padded decomposition groups (arms + 1 scaffold slot; scaffold group
         index for sample b is `num_arms[b]`)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ComplexBatch:
    # --- protein pocket ---
    protein_pos: jnp.ndarray       # [B, Np, 3] float32
    protein_feat: jnp.ndarray      # [B, Np, Fp] float32 (27 base + 2 decomp ind)
    protein_mask: jnp.ndarray      # [B, Np] bool

    # --- ligand ---
    ligand_pos: jnp.ndarray        # [B, Nl, 3] float32
    ligand_v: jnp.ndarray          # [B, Nl] int32 atom-type class
    ligand_aux: jnp.ndarray        # [B, Nl, Fa] float32 (arm/scaffold indicator)
    ligand_mask: jnp.ndarray       # [B, Nl] bool
    ligand_decomp_idx: jnp.ndarray  # [B, Nl] int32 group id (scaffold = num_arms)

    # --- dense fc bond graph (entry [b, i, j] = bond j -> i) ---
    bond_type: jnp.ndarray         # [B, Nl, Nl] int32 (0 = none)
    bond_mask: jnp.ndarray         # [B, Nl, Nl] bool (i != j, both atoms real)

    # --- decomposed priors ---
    prior_centers: jnp.ndarray     # [B, A, 3] float32
    prior_stds: jnp.ndarray        # [B, A, 3] float32
    prior_num_atoms: jnp.ndarray   # [B, A] int32
    prior_mask: jnp.ndarray        # [B, A] bool (num_arms + 1 entries valid)
    num_arms: jnp.ndarray          # [B] int32

    # 1 = atom participates in generation / may move; 0 = frozen (scaffold-only
    # or arms-only generation; ref models/decompdiff.py:597,621-622,682-683).
    ligand_update_mask: Optional[jnp.ndarray] = None  # [B, Nl] bool

    @property
    def batch_size(self) -> int:
        return self.protein_pos.shape[0]

    @property
    def num_protein_atoms(self) -> int:
        return self.protein_pos.shape[1]

    @property
    def num_ligand_atoms(self) -> int:
        return self.ligand_pos.shape[1]

    @property
    def num_groups(self) -> int:
        return self.prior_centers.shape[1]

    def update_mask(self) -> jnp.ndarray:
        if self.ligand_update_mask is None:
            return self.ligand_mask
        return self.ligand_update_mask & self.ligand_mask

    def atom_prior_centers(self) -> jnp.ndarray:
        """Per-atom prior centers [B, Nl, 3], gathered by decomp index
        (ref models/decompdiff.py:438)."""
        return jnp.take_along_axis(
            self.prior_centers, self.ligand_decomp_idx[..., None], axis=1)

    def atom_prior_stds(self) -> jnp.ndarray:
        """Per-atom prior stds [B, Nl, 3] (ref models/decompdiff.py:439)."""
        return jnp.take_along_axis(
            self.prior_stds, self.ligand_decomp_idx[..., None], axis=1)


@struct.dataclass
class FullProtein:
    """The complete (un-cropped) protein, used only by clash guidance
    (ref scripts/sample_diffusion_decomp.py:564-565, models/decompdiff.py:660-668)."""
    pos: jnp.ndarray   # [B, Nfull, 3]
    mask: jnp.ndarray  # [B, Nfull] bool


def make_bond_mask(ligand_mask: np.ndarray) -> np.ndarray:
    """[B, Nl] -> [B, Nl, Nl] fc bond mask (i != j, both real)."""
    m = ligand_mask
    pair = m[..., :, None] & m[..., None, :]
    eye = np.eye(m.shape[-1], dtype=bool)
    return pair & ~eye
