"""utils/chem helpers on the first-party (RDKit-free) paths: fused ring
systems on MolRecords (ref utils/chem.py:110-139) and the ffmin-backed
ff_optimize fallback (role parity with ref utils/chem.py:71-107)."""

import numpy as np

from decompdiff_tpu.data.mol import MolRecord
from decompdiff_tpu.utils.chem import (
    _kabsch_rmsd, ff_optimize, get_ring_systems, num_x_mem_ring)


def _record(element, pos, bonds):
    """bonds: {(a, b): order} undirected -> directed both ways."""
    idx, typ = [[], []], []
    for (a, b), t in bonds.items():
        idx[0] += [a, b]
        idx[1] += [b, a]
        typ += [t, t]
    return MolRecord(element=np.asarray(element),
                     pos=np.asarray(pos, np.float32),
                     bond_index=np.asarray(idx),
                     bond_type=np.asarray(typ),
                     aromatic=np.zeros(len(element), bool))


def _naphthalene_record():
    """Two fused 6-rings (10 atoms), flat hexagonal lattice coordinates."""
    ang = np.pi / 3 * np.arange(6)
    hexagon = 1.39 / (2 * np.sin(np.pi / 6)) * np.stack(
        [np.cos(ang), np.sin(ang), np.zeros(6)], axis=1)
    # second ring shares the (0, 1) edge: mirror across it
    edge_mid = (hexagon[0] + hexagon[1]) / 2
    extra = 2 * edge_mid - hexagon[2:6]
    pos = np.concatenate([hexagon, extra])
    bonds = {(i, (i + 1) % 6): 1 for i in range(6)}
    ring2 = [0, 6, 7, 8, 9, 1]
    for a, b in zip(ring2, ring2[1:] + ring2[:1]):
        bonds[(min(a, b), max(a, b))] = 1
    return _record([6] * 10, pos, bonds)


def test_ring_systems_on_record_fused():
    rec = _naphthalene_record()
    systems = get_ring_systems(rec)
    # the two fused rings merge into one 10-atom system
    assert len(systems) == 1
    assert sorted(systems[0]) == list(range(10))
    assert num_x_mem_ring(rec, (6, 10)) == [0, 1]


def test_ring_systems_spiro_gating():
    # two triangles sharing exactly one atom (spiro at atom 0)
    pos = np.zeros((5, 3))
    pos[:, 0] = np.arange(5)
    bonds = {(0, 1): 1, (1, 2): 1, (0, 2): 1,
             (0, 3): 1, (3, 4): 1, (0, 4): 1}
    rec = _record([6] * 5, pos, bonds)
    assert len(get_ring_systems(rec, includeSpiro=False)) == 2
    assert len(get_ring_systems(rec, includeSpiro=True)) == 1


def test_kabsch_rmsd_rotation_invariant():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 3))
    # a random proper rotation + translation: RMSD must be ~0
    q = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    q *= np.sign(np.linalg.det(q))
    assert _kabsch_rmsd(a, a @ q.T + 5.0) < 1e-9
    assert _kabsch_rmsd(a, a + rng.normal(size=(8, 3))) > 0.1


def test_ff_optimize_record_relaxes_stretched_bond():
    # C-C stretched to 2.2 A (equilibrium 2 * 0.76 = 1.52): the first-party
    # fallback must recover it and report a positive energy drop
    rec = _record([6, 6], [[0., 0., 0.], [2.2, 0., 0.]], {(0, 1): 1})
    energy_change, rmsd, out = ff_optimize(rec)
    assert energy_change > 0
    assert rmsd > 0.05
    d = np.linalg.norm(out.pos[1] - out.pos[0])
    assert abs(d - 1.52) < 1e-2
    # input record untouched
    assert np.linalg.norm(rec.pos[1] - rec.pos[0]) == np.float32(2.2)


def test_ff_optimize_record_no_bonds_returns_none():
    rec = MolRecord(element=np.array([6]), pos=np.zeros((1, 3), np.float32),
                    bond_index=np.zeros((2, 0), int),
                    bond_type=np.zeros((0,), int),
                    aromatic=np.zeros(1, bool))
    assert ff_optimize(rec) == (None,)


def test_rotatable_bonds_record_semantics():
    # butane C0-C1-C2-C3: only the central C1-C2 bond is rotatable
    # (terminal bonds fail the !D1 test)
    from decompdiff_tpu.utils.chem import (
        break_rotatable_bond, get_num_rotatable_bonds)
    rec = _record([6] * 4, np.zeros((4, 3)),
                  {(0, 1): 1, (1, 2): 1, (2, 3): 1})
    assert get_num_rotatable_bonds(rec) == 1
    frags, rot = break_rotatable_bond(rec)
    assert rot == [(1, 2)]
    assert sorted(f.num_atoms for f in frags) == [2, 2]
    # the fragments keep their internal bond
    for f in frags:
        assert f.bond_index.shape[1] == 2 and (f.bond_type == 1).all()


def test_rotatable_bonds_exclusions():
    from decompdiff_tpu.utils.chem import get_num_rotatable_bonds
    # ring bonds are never rotatable (cyclohexane -> 0)
    ring = {(i, (i + 1) % 6): 1 for i in range(6)}
    assert get_num_rotatable_bonds(
        _record([6] * 6, np.zeros((6, 3)), ring)) == 0
    # a double bond is not rotatable; neither is a single bond whose
    # endpoint sits in a triple bond (!$(*#*)): propyne-CH2-CH3 chain
    # C0#C1-C2-C3: the C1-C2 single bond touches the triple, C2-C3 is
    # terminal -> 0 rotatable
    assert get_num_rotatable_bonds(
        _record([6] * 4, np.zeros((4, 3)),
                {(0, 1): 3, (1, 2): 1, (2, 3): 1})) == 0
    # chain with a double bond in the middle C0-C1=C2-C3-C4: only C2-C3
    # is rotatable (both ends degree>=2, single, acyclic, no triples;
    # C0-C1 and C3-C4 have terminal endpoints, C1=C2 is double)
    assert get_num_rotatable_bonds(
        _record([6] * 5, np.zeros((5, 3)),
                {(0, 1): 1, (1, 2): 2, (2, 3): 1, (3, 4): 1})) == 1


def test_break_rotatable_explicit_bonds_and_none():
    from decompdiff_tpu.utils.chem import break_rotatable_bond
    rec = _record([6, 6], np.zeros((2, 3)), {(0, 1): 1})
    frags, rot = break_rotatable_bond(rec)   # terminal bond: nothing to cut
    assert rot == [] and len(frags) == 1 and frags[0] is rec
    # explicit cut list overrides detection
    chain = _record([6] * 4, np.zeros((4, 3)),
                    {(0, 1): 1, (1, 2): 1, (2, 3): 1})
    frags, rot = break_rotatable_bond(chain, rotatable_bond=[(0, 1)])
    assert sorted(f.num_atoms for f in frags) == [1, 3]
