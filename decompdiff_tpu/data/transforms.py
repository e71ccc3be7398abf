"""Host-side featurization pipeline (numpy) — the L2 layer.

Behavioral parity with ref utils/transforms.py, operating on plain-dict
samples instead of PyG Data objects:
  * featurize_protein_atom:      ref :114-131 (27-dim)
  * featurize_ligand_atom:       ref :134-163 (atom-class index per mode)
  * compute_noise_dist:          ref :166-254 (prior centers/stds per mode)
  * add_decomp_indicator:        ref :257-320 (2-dim arm/scaffold indicators,
                                 pocket-contact protein bit)
  * dense bond matrix:           replaces FeaturizeLigandBond 'fc' mode
                                 (ref :323-389) — the fc edge list over padded
                                 atoms is exactly the dense [Nl, Nl] matrix
  * random_rotation:             ref :392-403

The output of `featurize_sample` is the flat numpy record consumed by the
bucketed padding collator (decompdiff_tpu/data/collate.py).
"""

from __future__ import annotations

import numpy as np

from decompdiff_tpu.constants import (
    AA_NAME_TO_INDEX, NUM_AA_TYPES, PROTEIN_ATOM_ELEMENTS, atom_index,
    atom_class_count)

MIN_PRIOR_STD = 0.6  # ref utils/transforms.py:196


def featurize_protein_atom(element, atom_to_aa_type, is_backbone):
    """[Np] arrays -> [Np, 27] float32 (ref :114-131)."""
    el = np.asarray(element)[:, None] == np.asarray(PROTEIN_ATOM_ELEMENTS)[None]
    aa = np.eye(NUM_AA_TYPES, dtype=np.float32)[np.asarray(atom_to_aa_type)]
    bb = np.asarray(is_backbone, np.float32)[:, None]
    return np.concatenate([el.astype(np.float32), aa, bb], axis=-1)


def featurize_ligand_atom(element, hybridization, aromatic, mode='basic'):
    """-> [Nl] int class indices (ref :134-163)."""
    n = len(element)
    hyb = hybridization if hybridization is not None else [None] * n
    aro = aromatic if aromatic is not None else [False] * n
    return np.array([atom_index(element[i], hyb[i], aro[i], mode)
                     for i in range(n)], np.int64)


def compute_noise_dist(sample: dict, version: str) -> dict:
    """Build ligand_decomp_centers/stds [A, 3] + per-part atom counts
    (ref ComputeLigandAtomNoiseDist, :166-254). Returns {'centers', 'stds',
    'num_atoms'} with A = num_arms + 1 rows (scaffold last)."""
    num_arms = int(sample['num_arms'])
    protein_pos = np.asarray(sample['protein_pos'], np.float32)
    atom_mask = np.asarray(sample['ligand_atom_mask'])

    if version == 'subpocket':
        centers = []
        for arm_idx, pocket_mask in enumerate(sample['pocket_atom_masks']):
            if pocket_mask.sum() > 0:
                centers.append(protein_pos[pocket_mask].mean(0))
            else:  # special case (ref :186-188)
                centers.append(
                    sample['ligand_pos'][atom_mask == arm_idx].mean(0))
        centers.append(protein_pos.mean(0))
        centers = np.stack(centers).astype(np.float32)
        stds = np.ones_like(centers)

    elif version in ('ref_prior', 'beta_prior'):
        centers, stds = [], []
        for (num, iso_mu, iso_cov, _a, _b) in sample['arms_prior']:
            centers.append(np.asarray(iso_mu, np.float32).reshape(3))
            if num > 1:
                s = float(np.sqrt(np.asarray(iso_cov).flat[0]))
                stds.append(np.full(3, max(s, MIN_PRIOR_STD), np.float32))
            else:
                stds.append(np.full(3, MIN_PRIOR_STD, np.float32))
        scaffold_prior = sample['scaffold_prior']
        if len(scaffold_prior) > 0:
            assert len(scaffold_prior) == 1
            (num, iso_mu, iso_cov, _a, _b) = scaffold_prior[0]
            centers.append(np.asarray(iso_mu, np.float32).reshape(3))
            # ref_prior: min_std clamp for num>1, exact min_std for num==1
            # (ref :223-231); beta_prior: ALWAYS clamp(sqrt(cov), min) with
            # no atom-count check (ref :232-240 — cov may be scalar or
            # matrix) — a 1-atom scaffold with cov > min_std^2 keeps
            # sqrt(cov) there, unlike ref_prior
            if version == 'beta_prior':
                s = float(np.sqrt(np.asarray(iso_cov).flat[0]))
            else:
                s = (float(np.sqrt(np.asarray(iso_cov).flat[0]))
                     if num > 1 else 0.0)
            stds.append(np.full(3, max(s, MIN_PRIOR_STD), np.float32))
        else:  # no scaffold: protein centroid, min std (ref :241-243)
            centers.append(protein_pos.mean(0))
            stds.append(np.full(3, MIN_PRIOR_STD, np.float32))
        centers = np.stack(centers)
        stds = np.stack(stds)
    else:
        raise NotImplementedError(version)

    num_atoms = np.array(
        [(atom_mask == i).sum() for i in range(num_arms)]
        + [(atom_mask == -1).sum()], np.int64)
    return {'centers': centers, 'stds': stds, 'num_atoms': num_atoms}


def add_decomp_indicator(sample: dict, add_ord_feat: bool = False,
                         max_num_arms: int = 10) -> dict:
    """Arm/scaffold indicators (ref :257-320). Returns
    {'ligand_aux' [Nl, 2(+A)], 'protein_contact' [Np, 2(+A)],
    'decomp_idx' [Nl]}.

    add_ord_feat (ref :296-303,316-319; released config has it False)
    prepends a one-hot of the arm/scaffold index (A = max_num_arms + 1
    classes) to the ligand aux feature and inserts an A-wide block into the
    protein feature. NOTE: the reference's protein block is all zeros — its
    `protein_arm_scaffold_index[mask][arm_id] = 1` writes into a copy
    (ref :310-313) — and we reproduce that behavior exactly so feature
    values match a reference checkpoint."""
    atom_mask = np.asarray(sample['ligand_atom_mask'])
    num_arms = int(sample['num_arms'])
    num_classes = max_num_arms + 1
    decomp_idx = atom_mask.copy()
    decomp_idx[decomp_idx == -1] = num_arms
    arm_ind = np.eye(2, dtype=np.float32)[(atom_mask >= 0).astype(np.int64)]
    if add_ord_feat:
        arm_scaffold = np.eye(num_classes, dtype=np.float32)[decomp_idx]
        ligand_aux = np.concatenate([arm_scaffold, arm_ind], -1)
    else:
        ligand_aux = arm_ind

    pocket_masks = np.asarray(sample['pocket_atom_masks'])
    n_prot = len(sample['protein_pos'])
    if pocket_masks.size:
        in_pocket = (pocket_masks.sum(0) > 0).astype(np.int64)
    else:
        in_pocket = np.zeros(n_prot, np.int64)
    protein_ind = np.eye(2, dtype=np.float32)[in_pocket]
    if add_ord_feat:
        protein_ind = np.concatenate(
            [np.zeros((n_prot, num_classes), np.float32), protein_ind], -1)
    return {'ligand_aux': ligand_aux, 'protein_contact': protein_ind,
            'decomp_idx': decomp_idx.astype(np.int64)}


def bond_graph_mask(mode: str, atom_mask, num_arms: int) -> np.ndarray:
    """Directed ligand bond-graph mask [Nl(dst), Nl(src)] per
    FeaturizeLigandBond mode (ref :323-378):
      * 'fc':          all ordered pairs i != j
      * 'decomp_fc':   fully-connected within each arm and within the
                       scaffold (ref :339-353)
      * 'scaffold_fc': fully-connected within each arm, plus edges from
                       every scaffold atom to every atom (ref :354-378 —
                       note the reference only emits scaffold->all, so the
                       graph is directed)
    atom_mask is the per-atom arm id with scaffold = -1."""
    atom_mask = np.asarray(atom_mask)
    n = len(atom_mask)
    neq = ~np.eye(n, dtype=bool)
    if mode == 'fc':
        return neq
    if mode == 'decomp_fc':
        same = atom_mask[:, None] == atom_mask[None, :]
        return same & neq
    if mode == 'scaffold_fc':
        is_arm = atom_mask >= 0
        same_arm = ((atom_mask[:, None] == atom_mask[None, :])
                    & is_arm[:, None] & is_arm[None, :])
        src_scaffold = np.broadcast_to((atom_mask == -1)[None, :], (n, n))
        return (same_arm | src_scaffold) & neq
    raise ValueError(mode)


def dense_bond_matrix(num_atoms: int, bond_index, bond_type) -> np.ndarray:
    """Scatter the sparse bond list into a dense [Nl, Nl] class matrix
    (replaces ref :383-388)."""
    mat = np.zeros((num_atoms, num_atoms), np.int64)
    if bond_index is not None and np.asarray(bond_index).size:
        src, dst = np.asarray(bond_index)
        mat[dst, src] = np.asarray(bond_type)
    return mat


def random_rotation_matrix(rng: np.random.Generator) -> np.ndarray:
    """QR-orthogonal rotation matrix (ref :392-403)."""
    M = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(M)
    return Q.astype(np.float32)


def random_rotation(rng: np.random.Generator, *pos_arrays):
    """QR-orthogonal global rotation (ref :392-403)."""
    Q = random_rotation_matrix(rng)
    return tuple(np.asarray(p, np.float32) @ Q for p in pos_arrays)


def featurize_sample(sample: dict, prior_mode: str = 'ref_prior',
                     ligand_atom_mode: str = 'basic',
                     ligand_bond_mode: str = 'fc',
                     add_ord_feat: bool = False,
                     max_num_arms: int = 10,
                     random_rot: bool = False,
                     rng: np.random.Generator | None = None) -> dict:
    """Full L2 pipeline on one raw sample dict -> flat numpy record.

    Raw sample keys (the host record contract, produced by the dataset layer):
        protein_pos, protein_element, protein_atom_to_aa_type,
        protein_is_backbone, ligand_pos, ligand_element,
        ligand_hybridization (opt), ligand_atom_is_aromatic (opt),
        ligand_bond_index, ligand_bond_type, ligand_atom_mask,
        pocket_atom_masks, num_arms, arms_prior, scaffold_prior
    """
    if random_rot:
        rng = rng or np.random.default_rng()
        sample = dict(sample)
        Q = random_rotation_matrix(rng)
        sample['protein_pos'] = np.asarray(
            sample['protein_pos'], np.float32) @ Q
        sample['ligand_pos'] = np.asarray(sample['ligand_pos'], np.float32) @ Q
        # the stored arm/scaffold prior anchors (iso/aniso mu, aniso cov)
        # must rotate WITH the atoms, or the anchored forward process pulls
        # rotated atoms toward un-rotated centers. The reference has this
        # bug latently (ComputeLigandAtomNoiseDist runs before
        # RandomRotation, ref train_diffusion_decomp.py:98-105) but ships
        # random_rot: False; we fix it since the knob is exposed here.
        # Isotropic covs are rotation-invariant; aniso covs get Q^T C Q.
        for key in ('arms_prior', 'scaffold_prior'):
            if key in sample and len(sample[key]):
                rotated = []
                for (num, iso_mu, iso_cov, aniso_mu, aniso_cov) in sample[key]:
                    iso_mu = np.asarray(iso_mu, np.float32).reshape(3) @ Q
                    if aniso_mu is not None:
                        aniso_mu = np.asarray(
                            aniso_mu, np.float32).reshape(3) @ Q
                    if aniso_cov is not None and np.ndim(aniso_cov) == 2:
                        aniso_cov = Q.T @ np.asarray(
                            aniso_cov, np.float32) @ Q
                    rotated.append((num, iso_mu, iso_cov, aniso_mu,
                                    aniso_cov))
                sample[key] = rotated

    protein_feat = featurize_protein_atom(
        sample['protein_element'], sample['protein_atom_to_aa_type'],
        sample['protein_is_backbone'])
    ligand_v = featurize_ligand_atom(
        sample['ligand_element'], sample.get('ligand_hybridization'),
        sample.get('ligand_atom_is_aromatic'), mode=ligand_atom_mode)
    noise = compute_noise_dist(sample, prior_mode)
    ind = add_decomp_indicator(sample, add_ord_feat=add_ord_feat,
                               max_num_arms=max_num_arms)
    protein_feat = np.concatenate([protein_feat, ind['protein_contact']], -1)
    nl = len(sample['ligand_element'])
    bond_mat = dense_bond_matrix(nl, sample.get('ligand_bond_index'),
                                 sample.get('ligand_bond_type'))
    extra = {}
    if ligand_bond_mode != 'fc':
        gmask = bond_graph_mask(ligand_bond_mode, sample['ligand_atom_mask'],
                                int(sample['num_arms']))
        bond_mat = np.where(gmask, bond_mat, 0)
        extra['bond_graph_mask'] = gmask
    return {
        **extra,
        'protein_pos': np.asarray(sample['protein_pos'], np.float32),
        'protein_feat': protein_feat,
        'ligand_pos': np.asarray(sample['ligand_pos'], np.float32),
        'ligand_v': ligand_v,
        'ligand_aux': ind['ligand_aux'],
        'ligand_decomp_idx': ind['decomp_idx'],
        'bond_type': bond_mat,
        'prior_centers': noise['centers'],
        'prior_stds': noise['stds'],
        'prior_num_atoms': noise['num_atoms'],
        'num_arms': int(sample['num_arms']),
    }


def ligand_feature_dim(mode: str) -> int:
    return atom_class_count(mode)
