"""Geometry-only (liGAN cascade) reconstruction fixtures — VERDICT.md round-1
item 3: benzene / pyridine / acetamide / ethene / acetylene point clouds must
round-trip to correct bond orders, RDKit-free.
"""

import numpy as np
import pytest

from decompdiff_tpu.reconstruct import ligan
from decompdiff_tpu.reconstruct.builder import (
    is_connected, mol_record_from_prediction, reconstruct_from_generated)


def hexagon(r=1.39):
    ang = np.arange(6) * np.pi / 3
    return np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(6)], -1)


def _bond_map(record):
    out = {}
    for e in range(record.bond_index.shape[1]):
        a, b = int(record.bond_index[0, e]), int(record.bond_index[1, e])
        out[(min(a, b), max(a, b))] = int(record.bond_type[e])
    return out


def test_benzene_aromatic_ring():
    pos = hexagon()
    rec = reconstruct_from_generated(pos, [6] * 6)
    bonds = _bond_map(rec)
    assert len(bonds) == 6
    assert all(t == 4 for t in bonds.values()), bonds
    assert rec.aromatic.all()
    assert is_connected(rec)


def test_pyridine_aromatic_with_nitrogen():
    pos = hexagon()
    rec = reconstruct_from_generated(pos, [7, 6, 6, 6, 6, 6])
    bonds = _bond_map(rec)
    assert len(bonds) == 6
    assert all(t == 4 for t in bonds.values()), bonds


def test_cyclohexane_not_aromatic():
    # chair-conformation cyclohexane: C-C 1.54, decidedly non-planar
    ang = np.arange(6) * np.pi / 3
    pos = np.stack([1.46 * np.cos(ang), 1.46 * np.sin(ang),
                    0.25 * (-1) ** np.arange(6)], -1)
    rec = reconstruct_from_generated(pos, [6] * 6)
    bonds = _bond_map(rec)
    assert len(bonds) == 6
    assert all(t == 1 for t in bonds.values()), bonds
    assert not rec.aromatic.any()


def test_acetamide_bond_orders():
    # heavy atoms of CH3-C(=O)-NH2: C=O double, C-N and C-C single
    pos = np.array([
        [-1.519, 0.000, 0.0],   # methyl C
        [0.000, 0.000, 0.0],    # carbonyl C
        [0.617, 1.066, 0.0],    # O (1.232 A)
        [0.578, -1.200, 0.0],   # N (1.332 A)
    ])
    rec = reconstruct_from_generated(pos, [6, 6, 8, 7])
    bonds = _bond_map(rec)
    assert bonds == {(0, 1): 1, (1, 2): 2, (1, 3): 1}, bonds


def test_ethane_ethene_acetylene():
    def c2(d):
        pos = np.array([[0.0, 0, 0], [d, 0, 0]])
        return _bond_map(reconstruct_from_generated(pos, [6, 6]))

    assert c2(1.54) == {(0, 1): 1}
    assert c2(1.33) == {(0, 1): 2}
    assert c2(1.20) == {(0, 1): 3}


def test_dioxirane_oo_bond_removed():
    # 3-ring C-O-O: the O-O ring bond must be removed (ref :444-451)
    pos = np.array([
        [0.000, 0.000, 0.0],       # C
        [0.758, 1.158, 0.0],       # O (C-O 1.385)
        [-0.758, 1.158, 0.0],      # O (O-O 1.516)
    ])
    rec = reconstruct_from_generated(pos, [6, 8, 8])
    bonds = _bond_map(rec)
    assert (1, 2) not in bonds
    assert set(bonds) == {(0, 1), (0, 2)}


def test_stretch_pruning_drops_long_redundant_bond():
    # atom 3 bonds to both 1 (1.5 A) and 2 (1.9 A, stretch 1.25 > 1.2);
    # the long redundant bond is pruned, connectivity preserved
    pos = np.array([
        [0.0, 0.0, 0.0],
        [1.5, 0.0, 0.0],
        [3.0, 0.0, 0.0],
        [1.797, 1.470, 0.0],
    ])
    elem = np.array([6, 6, 6, 6])
    bonds = ligan.connect_the_dots(pos, elem)
    assert (2, 3) not in bonds
    assert set(bonds) == {(0, 1), (1, 2), (1, 3)}
    # but a long bond that is the ONLY path stays (don't fragment; ref :163)
    pos2 = np.array([[0.0, 0, 0], [1.5, 0, 0], [1.5 + 1.9, 0.3, 0]])
    bonds2 = ligan.connect_the_dots(pos2, np.array([6, 6, 6]))
    assert (1, 2) in bonds2


def test_hypervalency_repair_order():
    # a central carbon crowded by 6 neighbors: repair must bring it to <= 4
    # bonds without disconnecting the molecule
    rng = np.random.default_rng(0)
    center = np.zeros(3)
    nbrs = []
    for k in range(6):
        v = rng.normal(size=3)
        nbrs.append(1.5 * v / np.linalg.norm(v))
    pos = np.vstack([center] + nbrs)
    element = np.array([6] + [6] * 6)
    bonds = ligan.connect_the_dots(pos, element)
    deg0 = sum(1 for ab in bonds if 0 in ab)
    assert deg0 <= 4


def test_no_bond_sampling_path_uses_cascade():
    # mol_record_from_prediction without pred_bond -> geometry-only cascade
    pos = hexagon()
    rec = mol_record_from_prediction(pos, np.ones(6, np.int64),  # class 1 = C
                                     pred_bond=None, atom_mode='basic')
    bonds = _bond_map(rec)
    assert all(t == 4 for t in bonds.values()), bonds


def test_indicator_mode_marks_flagged_atoms():
    # basic_mode=False: the aromatic indicator channel drives the flags
    # (ref fixup :331-346); slightly-distorted hexagon still aromatic
    pos = hexagon(1.42)
    rec = reconstruct_from_generated(pos, [6] * 6,
                                     aromatic=[True] * 6, basic_mode=False)
    assert rec.aromatic.all()
    # and all-False indicators suppress aromaticity even on perfect geometry
    rec2 = reconstruct_from_generated(pos, [6] * 6,
                                      aromatic=[False] * 6, basic_mode=False)
    assert not rec2.aromatic.any()


def test_find_rings_basis():
    # two fused triangles share an edge -> two 3-rings
    bonds = {(0, 1): 1, (1, 2): 1, (0, 2): 1, (2, 3): 1, (1, 3): 1}
    rings = ligan.find_rings(4, bonds)
    sizes = sorted(len(r) for r in rings)
    assert sizes == [3, 3]


def test_sulfone_maxb_frozen_from_candidate_graph():
    """atom_maxb must be computed ONCE from the initial candidate graph
    (ref utils/reconstruct.py:111-125): a sulfone S whose second S-O
    candidate gets stretch-pruned must keep max valence 6 during
    hypervalency repair, not fall back to 2 and lose valid S-C bonds
    (round-3 review; the old live-graph recompute deleted the S-C3 ring
    bond in exactly this fixture)."""
    import numpy as np

    from decompdiff_tpu.reconstruct.ligan import connect_the_dots

    element = np.array([16, 8, 8, 6, 6, 6])  # S, O1, O2, C1, C2, C3
    pos = np.array([
        [0.0, 0.0, 0.0],      # S
        [-1.45, 0.0, 0.0],    # O1: S=O kept (stretch 0.85)
        [-0.9, 1.9, 0.0],     # O2: S-O2 candidate, stretch-pruned; stays via C1
        [0.0, 1.8, 0.0],      # C1 (ring)
        [1.4, 2.3, 0.0],      # C2 (ring)
        [1.7, 0.6, 0.0],      # C3 (ring, closes back to S)
    ], np.float64)
    bonds = connect_the_dots(pos, element)
    assert (0, 2) not in bonds          # stretched S-O2 pruned
    assert (2, 3) in bonds              # O2 still attached via C1
    assert (0, 1) in bonds              # S=O1
    assert (0, 3) in bonds and (0, 5) in bonds   # BOTH ring S-C bonds kept
