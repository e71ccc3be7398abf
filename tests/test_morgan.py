"""First-party Morgan/ECFP (evaluation/morgan.py) — RDKit-exact env ids.

Exactness is certified by corpus membership: fpscores.pkl.gz (pinned
identical to the reference's, tests/test_asset_exactness.py) keys 705k
uint32 ids out of 2^32, so a random id hits with p ~ 1.6e-4. Every
environment id of the anchor molecules below hitting the corpus (66/66)
is conclusive evidence the hashing pipeline reproduces RDKit's
GetMorganFingerprint(mol, 2) bit ids — which makes the Ertl SA fragment
term (ref utils/evaluation/sascorer.py:29-56) computable without RDKit.
"""

import numpy as np
import pytest

from decompdiff_tpu.data.mol import MolRecord
from decompdiff_tpu.evaluation.descriptors import (
    _undirected, implicit_h_counts, sa_score)
from decompdiff_tpu.evaluation.morgan import (
    connectivity_invariants, fragment_score, load_fpscores,
    morgan_fingerprint)


def rec(element, bonds, aromatic=None, charges=None):
    element = np.asarray(element, np.int64)
    src, dst, typ = [], [], []
    for (a, b), o in bonds.items():
        src += [a, b]
        dst += [b, a]
        typ += [o, o]
    if aromatic is None:
        aromatic = np.zeros(len(element), bool)
    return MolRecord(
        element=element,
        pos=np.zeros((len(element), 3), np.float32),
        bond_index=np.asarray([src, dst], np.int64).reshape(2, -1),
        bond_type=np.asarray(typ, np.int64),
        aromatic=np.asarray(aromatic, bool),
        charges=None if charges is None else np.asarray(charges, np.int64))


RING6 = {(i, (i + 1) % 6): 4 for i in range(6)}


def fp_of(m):
    bonds = _undirected(m)
    h = implicit_h_counts(m.element, bonds, m.charges)
    return morgan_fingerprint(m.element, bonds, h, m.charges)


def _mols():
    benzene = rec([6] * 6, RING6, [True] * 6)
    ethanol = rec([6, 6, 8], {(0, 1): 1, (1, 2): 1})
    bonds = dict(RING6)
    bonds.update({(0, 6): 1, (3, 7): 1, (7, 8): 1, (8, 9): 2, (8, 10): 1})
    paracetamol = rec([6] * 6 + [8, 7, 6, 8, 6], bonds,
                      [True] * 6 + [False] * 5)
    toluene_b = dict(RING6)
    toluene_b[(0, 6)] = 1
    toluene = rec([6] * 7, toluene_b, [True] * 6 + [False])
    acetic = rec([6, 6, 8, 8], {(0, 1): 1, (1, 2): 2, (1, 3): 1})
    pyridine = rec([7] + [6] * 5, RING6, [True] * 6)
    naph_b = {(0, 1): 4, (1, 2): 4, (2, 3): 4, (3, 4): 4, (4, 5): 4,
              (5, 0): 4, (4, 6): 4, (6, 7): 4, (7, 8): 4, (8, 9): 4,
              (9, 5): 4}
    naphthalene = rec([6] * 10, naph_b, [True] * 10)
    return dict(benzene=benzene, ethanol=ethanol, paracetamol=paracetamol,
                toluene=toluene, acetic_acid=acetic, pyridine=pyridine,
                naphthalene=naphthalene)


@pytest.mark.parametrize('name', sorted(_mols()))
def test_all_env_ids_in_corpus(name):
    scores = load_fpscores()
    fp = fp_of(_mols()[name])
    missing = [b for b in fp if b not in scores]
    assert not missing, f'{name}: ids not in fpscores corpus: {missing}'


def test_known_rdkit_env_ids():
    """Ids documented in RDKit examples: the aromatic carbon radius-0
    invariant and its radius-1 environment (drawMorganBit docs), the CH3
    radius-0 invariant."""
    benzene_fp = fp_of(_mols()['benzene'])
    assert benzene_fp[3218693969] == 6     # aromatic CH, radius 0
    assert benzene_fp[98513984] == 6       # aromatic CH, radius 1
    ethanol_fp = fp_of(_mols()['ethanol'])
    assert 2246728737 in ethanol_fp        # CH3 radius 0
    # hydroxyl O radius 0 — shared by ethanol/acetic acid/paracetamol
    assert 864662311 in ethanol_fp
    assert 864662311 in fp_of(_mols()['acetic_acid'])
    assert 864662311 in fp_of(_mols()['paracetamol'])


def test_env_dedup_structure():
    """Ethanol: 3 radius-0 + 3 radius-1 envs; both radius-2 environments
    cover the same full bond set already seen at radius 1, so they emit
    nothing (RDKit's neighborhood deduplication)."""
    fp = fp_of(_mols()['ethanol'])
    assert len(fp) == 6
    assert all(c == 1 for c in fp.values())
    # benzene: 6 symmetric atoms -> one id per radius, count 6 each at
    # r0/r1; at r2 every env is a new bond set per atom but identical
    # invariant
    bfp = fp_of(_mols()['benzene'])
    assert sorted(bfp.values()) == [6, 6, 6]


def test_connectivity_invariants_deterministic():
    m = _mols()['acetic_acid']
    bonds = _undirected(m)
    h = implicit_h_counts(m.element, bonds, m.charges)
    inv = connectivity_invariants(m.element, bonds, h, m.charges)
    # CH3: z=6, totalDegree 4, numHs 3, q 0, dM 0, no ring
    assert inv[0] == 2246728737
    # acid OH oxygen: z=8, totalDegree 2, numHs 1
    assert inv[3] == 864662311


def test_sa_score_anchors():
    """Normalized (10-sa)/9 values for standard sascorer anchors:
    calculateScore(benzene) ~= 1.0, calculateScore(ethanol) ~= 2.0."""
    assert sa_score(_mols()['benzene']) == pytest.approx(1.0, abs=0.03)
    assert sa_score(_mols()['ethanol']) == pytest.approx(0.89, abs=0.03)
    # fragment term is active: a xenon chain (all envs outside the corpus,
    # each contributing -4) must score far below benzene
    xe = rec([54, 54, 54], {(0, 1): 1, (1, 2): 1})
    assert sa_score(xe) < 0.7


def test_fragment_score_unknown_envs_penalized():
    """Environments absent from the corpus contribute exactly -4 (ref
    sascorer.py:52-55)."""
    weird = rec([54, 54, 54], {(0, 1): 1, (1, 2): 1})
    bonds = _undirected(weird)
    h = implicit_h_counts(weird.element, bonds, weird.charges)
    s1, _ = fragment_score(weird.element, bonds, h)
    assert s1 == pytest.approx(-4.0)
