"""Reconstruction + evaluation layer tests (RDKit-free paths)."""

import numpy as np
import pytest
from collections import Counter

from decompdiff_tpu.data.mol import MolRecord
from decompdiff_tpu.evaluation.eval_atom_type import eval_atom_type_distribution
from decompdiff_tpu.evaluation.eval_bond_length import (
    REF_BOND_DISTRIBUTIONS, bond_distances_from_mol, eval_bond_length_profile,
    eval_pair_length_profile, get_bond_length_profile,
    get_pair_length_profile, pair_distances_from_pos)
from decompdiff_tpu.evaluation.scoring import get_ring_sizes
from decompdiff_tpu.reconstruct.builder import (
    MolReconsError, is_connected, mol_record_from_prediction, perceive_bonds,
    reconstruct_from_generated, reconstruct_from_generated_with_bond)


def chain_mol(n=5, spacing=1.5, element=6):
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 0] = np.arange(n) * spacing
    return xyz, np.full(n, element)


def test_bond_aware_reconstruction_basic():
    xyz, z = chain_mol(4)
    src = np.array([0, 1, 2])
    bond_index = np.stack([np.concatenate([src, src + 1]),
                           np.concatenate([src + 1, src])])
    bond_type = np.ones(6, np.int64)
    mol = reconstruct_from_generated_with_bond(xyz, z, bond_index, bond_type)
    assert isinstance(mol, MolRecord)
    assert mol.num_atoms == 4
    assert mol.bond_index.shape[1] == 6
    assert is_connected(mol)


def test_bond_aware_reconstruction_n4_charged():
    """N with 4 single bonds gets a +1 charge instead of failing."""
    xyz = np.array([[0, 0, 0], [1.5, 0, 0], [-1.5, 0, 0],
                    [0, 1.5, 0], [0, -1.5, 0]], np.float32)
    z = np.array([7, 6, 6, 6, 6])
    src = np.array([0, 0, 0, 0])
    dst = np.array([1, 2, 3, 4])
    bond_index = np.stack([np.concatenate([src, dst]),
                           np.concatenate([dst, src])])
    bond_type = np.ones(8, np.int64)
    mol = reconstruct_from_generated_with_bond(xyz, z, bond_index, bond_type)
    assert mol.charges[0] == 1


def test_hypervalent_carbon_prunes_stretched_bond():
    """C with 5 bonds drops the most stretched one."""
    xyz = np.array([[0, 0, 0], [1.5, 0, 0], [-1.5, 0, 0],
                    [0, 1.5, 0], [0, -1.5, 0], [0, 0, 1.9]], np.float32)
    z = np.full(6, 6)
    src = np.zeros(5, np.int64)
    dst = np.arange(1, 6)
    bond_index = np.stack([np.concatenate([src, dst]),
                           np.concatenate([dst, src])])
    bond_type = np.ones(10, np.int64)
    mol = reconstruct_from_generated_with_bond(xyz, z, bond_index, bond_type)
    # atom 5 (the farthest) should have lost its bond
    assert 5 not in set(mol.bond_index.reshape(-1).tolist())


def test_geometry_only_reconstruction():
    xyz, z = chain_mol(5, spacing=1.5)
    mol = reconstruct_from_generated(xyz, z)
    assert mol.bond_index.shape[1] == 8  # 4 undirected bonds both ways
    assert is_connected(mol)
    # far-apart atoms are not bonded
    xyz2, z2 = chain_mol(3, spacing=5.0)
    bonds, _ = perceive_bonds(xyz2, z2)
    assert len(bonds) == 0


def test_mol_record_from_prediction_dense_bond():
    nl = 4
    pos = np.zeros((nl, 3), np.float32)
    pos[:, 0] = np.arange(nl) * 1.4
    pred_v = np.array([1, 1, 2, 3])  # basic mode: C C N O
    bm = np.zeros((nl, nl), np.int64)
    for i in range(nl - 1):
        bm[i, i + 1] = bm[i + 1, i] = 1
    mol = mol_record_from_prediction(pos, pred_v, bm, atom_mode='basic')
    np.testing.assert_array_equal(mol.element, [6, 6, 7, 8])
    assert is_connected(mol)


def test_bond_length_profiles_and_jsd():
    # synthetic C-C bonds at exactly 1.5 A -> peaked profile, valid JSD
    lengths = [((6, 6, 1), 1.5 + 0.01 * np.sin(i)) for i in range(200)]
    profile = get_bond_length_profile(lengths)
    assert (6, 6, 1) in profile
    np.testing.assert_allclose(profile[(6, 6, 1)].sum(), 1.0, rtol=1e-6)
    metrics = eval_bond_length_profile(profile)
    assert metrics['JSD_6-6|1'] is not None
    assert 0 <= metrics['JSD_6-6|1'] <= 1
    # untracked types give None
    assert metrics['JSD_6-7|2'] is None
    # key symmetrization: (8, 6) -> (6, 8)
    p2 = get_bond_length_profile([((8, 6, 1), 1.4)])
    assert (6, 8, 1) in p2


def test_pair_length_profiles():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(10, 3)) * 2
    elements = [6] * 10
    pairs = pair_distances_from_pos(pos, elements)
    assert len(pairs) == 45
    profile = get_pair_length_profile(pairs)
    m = eval_pair_length_profile(profile)
    assert m['JSD_CC_2A'] is not None and m['JSD_All_12A'] is not None


def test_atom_type_jsd():
    perfect = Counter({6: 6715, 7: 1170, 8: 1696, 9: 131, 15: 111, 16: 112,
                       17: 64})
    assert eval_atom_type_distribution(perfect) < 0.02
    bad = Counter({6: 10000})
    assert eval_atom_type_distribution(bad) > 0.2


def test_ring_sizes_on_record():
    # benzene-like 6-ring
    theta = np.linspace(0, 2 * np.pi, 7)[:-1]
    xyz = np.stack([1.4 * np.cos(theta), 1.4 * np.sin(theta),
                    np.zeros(6)], -1).astype(np.float32)
    z = np.full(6, 6)
    idx = np.arange(6)
    src = np.concatenate([idx, (idx + 1) % 6])
    dst = np.concatenate([(idx + 1) % 6, idx])
    mol = MolRecord(element=z, pos=xyz, bond_index=np.stack([src, dst]),
                    bond_type=np.ones(12, np.int64),
                    aromatic=np.zeros(6, bool))
    sizes = get_ring_sizes(mol)
    assert sizes == Counter({6: 1})


def test_reference_distributions_loaded():
    assert len(REF_BOND_DISTRIBUTIONS) == 8
    for v in REF_BOND_DISTRIBUTIONS.values():
        np.testing.assert_allclose(v.sum(), 1.0, rtol=1e-3)
