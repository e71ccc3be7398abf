"""Full Wildman-Crippen logP (evaluation/crippen.py) — published atom-type
assignments and anchor sums.

The reference scores logP via RDKit Crippen.MolLogP
(ref utils/evaluation/scoring_func.py:81). RDKit is absent from this image,
so exactness is certified two ways:
  * type assignments: each anchor molecule's atoms must get the published
    Wildman-Crippen 1999 type labels (hand-derived from the published
    SMARTS patterns);
  * value anchors: molecules whose RDKit MolLogP values are standard
    published examples (benzene 1.6866, ethanol -0.0014, octane 3.3668,
    acetic acid 0.0909, paracetamol 1.3506, naphthalene 2.8398, ...).
"""

import numpy as np
import pytest

from decompdiff_tpu.data.mol import MolRecord
from decompdiff_tpu.evaluation.crippen import (
    CRIPPEN_LOGP, crippen_atom_types, crippen_logp_exact)
from decompdiff_tpu.evaluation.descriptors import (
    _undirected, implicit_h_counts)


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


def types_of(m):
    bonds = _undirected(m)
    h = implicit_h_counts(m.element, bonds, m.charges)
    return crippen_atom_types(m.element, bonds, m.aromatic, h, m.charges)


def logp_of(m):
    bonds = _undirected(m)
    h = implicit_h_counts(m.element, bonds, m.charges)
    return crippen_logp_exact(m.element, bonds, m.aromatic, h, m.charges)


RING6 = {(i, (i + 1) % 6): 4 for i in range(6)}
AROM6 = [True] * 6


def phenyl(extra_elements, extra_bonds, extra_arom=None, charges=None):
    """Benzene ring (atoms 0-5) + substituent atoms starting at index 6."""
    n_extra = len(extra_elements)
    bonds = dict(RING6)
    bonds.update(extra_bonds)
    arom = AROM6 + list(extra_arom or [False] * n_extra)
    return rec([6] * 6 + list(extra_elements), bonds, arom, charges)


# ---------------------------------------------------------------- types

def test_types_aliphatic_chains():
    ethanol = rec([6, 6, 8], {(0, 1): 1, (1, 2): 1})
    assert types_of(ethanol) == ['C1', 'C3', 'O2']
    octane = rec([6] * 8, {(i, i + 1): 1 for i in range(7)})
    assert types_of(octane) == ['C1'] * 8
    isobutane = rec([6] * 4, {(0, 1): 1, (1, 2): 1, (1, 3): 1})
    assert types_of(isobutane) == ['C1', 'C2', 'C1', 'C1']
    neopentane = rec([6] * 5, {(0, 1): 1, (1, 2): 1, (1, 3): 1, (1, 4): 1})
    assert types_of(neopentane)[1] == 'C2'
    # tert-butanol: quaternary-ish C on O -> C4
    tbuoh = rec([6, 6, 6, 6, 8],
                {(0, 1): 1, (1, 2): 1, (1, 3): 1, (1, 4): 1})
    assert types_of(tbuoh) == ['C1', 'C4', 'C1', 'C1', 'O2']


def test_types_aromatics():
    benzene = rec([6] * 6, RING6, AROM6)
    assert types_of(benzene) == ['C18'] * 6
    pyridine = rec([7] + [6] * 5, RING6, AROM6)
    assert types_of(pyridine) == ['N11'] + ['C18'] * 5
    toluene = phenyl([6], {(0, 6): 1})
    assert types_of(toluene) == ['C21'] + ['C18'] * 5 + ['C8']
    aniline = phenyl([7], {(0, 6): 1})
    assert types_of(aniline) == ['C22'] + ['C18'] * 5 + ['N3']
    phenol = phenyl([8], {(0, 6): 1})
    assert types_of(phenol) == ['C23'] + ['C18'] * 5 + ['O2']
    thioanisole = phenyl([16, 6], {(0, 6): 1, (6, 7): 1})
    assert types_of(thioanisole)[0] == 'C24'
    assert types_of(thioanisole)[6] == 'S1'
    chlorobenzene = phenyl([17], {(0, 6): 1})
    assert types_of(chlorobenzene) == ['C15'] + ['C18'] * 5 + ['Cl']
    # naphthalene bridgeheads are C19
    naph_bonds = {(0, 1): 4, (1, 2): 4, (2, 3): 4, (3, 4): 4, (4, 5): 4,
                  (5, 0): 4, (4, 6): 4, (6, 7): 4, (7, 8): 4, (8, 9): 4,
                  (9, 5): 4}
    naphthalene = rec([6] * 10, naph_bonds, [True] * 10)
    t = types_of(naphthalene)
    assert sorted(t).count('C19') == 2 and sorted(t).count('C18') == 8
    # biphenyl link carbons are C20
    bonds = dict(RING6)
    bonds.update({(i + 6, (i + 1) % 6 + 6): 4 for i in range(6)})
    bonds[(0, 6)] = 1
    biphenyl = rec([6] * 12, bonds, [True] * 12)
    t = types_of(biphenyl)
    assert t[0] == 'C20' and t[6] == 'C20' and t.count('C18') == 10


def test_types_carbonyls():
    # acetic acid CH3-C(=O)-OH
    acoh = rec([6, 6, 8, 8], {(0, 1): 1, (1, 2): 2, (1, 3): 1})
    assert types_of(acoh) == ['C1', 'C5', 'O9', 'O2']
    acetone = rec([6, 6, 8, 6], {(0, 1): 1, (1, 2): 2, (1, 3): 1})
    assert types_of(acetone) == ['C1', 'C5', 'O9', 'C1']
    # acetamide CH3-C(=O)-NH2
    acnh2 = rec([6, 6, 8, 7], {(0, 1): 1, (1, 2): 2, (1, 3): 1})
    assert types_of(acnh2) == ['C1', 'C5', 'O9', 'N1']
    # urea H2N-C(=O)-NH2: carbonyl O between two heteroatoms -> O11
    urea = rec([7, 6, 8, 7], {(0, 1): 1, (1, 2): 2, (1, 3): 1})
    assert types_of(urea) == ['N1', 'C5', 'O11', 'N1']
    # benzaldehyde: [O]=[CH]c -> O10
    benzald = phenyl([6, 8], {(0, 6): 1, (6, 7): 2})
    assert types_of(benzald)[6] == 'C5' and types_of(benzald)[7] == 'O10'
    # benzoic acid: [O]=C(c)[A] -> O10
    bzoh = phenyl([6, 8, 8], {(0, 6): 1, (6, 7): 2, (6, 8): 1})
    assert types_of(bzoh)[7] == 'O10' and types_of(bzoh)[8] == 'O2'
    # methyl acetate: ester -O- is O3 (aliphatic both sides), C=O is O9
    meoac = rec([6, 6, 8, 8, 6],
                {(0, 1): 1, (1, 2): 2, (1, 3): 1, (3, 4): 1})
    assert types_of(meoac) == ['C1', 'C5', 'O9', 'O3', 'C3']
    # phenyl acetate: aryl ester -O- is O4
    phoac = phenyl([8, 6, 8, 6],
                   {(0, 6): 1, (6, 7): 1, (7, 8): 2, (7, 9): 1})
    assert types_of(phoac)[6] == 'O4' and types_of(phoac)[8] == 'O9'


def test_types_nitrogen():
    et2nh = rec([6, 6, 7, 6, 6],
                {(0, 1): 1, (1, 2): 1, (2, 3): 1, (3, 4): 1})
    assert types_of(et2nh)[2] == 'N2'
    tma = rec([6, 7, 6, 6], {(0, 1): 1, (1, 2): 1, (1, 3): 1})
    assert types_of(tma)[1] == 'N7'
    # N-methylaniline -> N4; N,N-dimethylaniline -> N8
    nma = phenyl([7, 6], {(0, 6): 1, (6, 7): 1})
    assert types_of(nma)[6] == 'N4'
    dma = phenyl([7, 6, 6], {(0, 6): 1, (6, 7): 1, (6, 8): 1})
    assert types_of(dma)[6] == 'N8'
    # acetonitrile: C7 carbon, N9 nitrogen
    mecn = rec([6, 6, 7], {(0, 1): 1, (1, 2): 3})
    assert types_of(mecn) == ['C1', 'C7', 'N9']
    # nitrobenzene ([N+](=O)[O-]): N13 + O5 + O5
    nb = phenyl([7, 8, 8], {(0, 6): 1, (6, 7): 2, (6, 8): 1},
                charges=[0] * 6 + [1, 0, -1])
    assert types_of(nb)[6:] == ['N13', 'O5', 'O5']
    # methylammonium -> N10
    mam = rec([6, 7], {(0, 1): 1}, charges=[0, 1])
    assert types_of(mam)[1] == 'N10'
    # imine CH3-CH=NH -> N5; CH3-CH=N-CH3 -> N6
    imine = rec([6, 6, 7], {(0, 1): 1, (1, 2): 2})
    assert types_of(imine)[2] == 'N5'
    imine2 = rec([6, 6, 7, 6], {(0, 1): 1, (1, 2): 2, (2, 3): 1})
    assert types_of(imine2)[2] == 'N6'


def test_types_sulfur_misc():
    # DMSO: S2 sulfur, O6 oxygen
    dmso = rec([6, 16, 8, 6], {(0, 1): 1, (1, 2): 2, (1, 3): 1})
    assert types_of(dmso) == ['C3', 'S2', 'O6', 'C3']
    # thiophene: aromatic S3
    ring5 = {(i, (i + 1) % 5): 4 for i in range(5)}
    thiophene = rec([16] + [6] * 4, ring5, [True] * 5)
    assert types_of(thiophene) == ['S3'] + ['C18'] * 4
    # furan: aromatic O1
    furan = rec([8] + [6] * 4, ring5, [True] * 5)
    assert types_of(furan)[0] == 'O1'
    # diethyl ether O3; anisole O4 + C3 methyl
    et2o = rec([6, 6, 8, 6, 6],
               {(0, 1): 1, (1, 2): 1, (2, 3): 1, (3, 4): 1})
    assert types_of(et2o)[2] == 'O3'
    anisole = phenyl([8, 6], {(0, 6): 1, (6, 7): 1})
    assert types_of(anisole)[6] == 'O4' and types_of(anisole)[7] == 'C3'
    # carboxylate -> O12
    acetate = rec([6, 6, 8, 8], {(0, 1): 1, (1, 2): 2, (1, 3): 1},
                  charges=[0, 0, 0, -1])
    assert types_of(acetate)[3] == 'O12'
    # styrene: ring link C21, CH= is C26, =CH2 is C6
    styrene = phenyl([6, 6], {(0, 6): 1, (6, 7): 2})
    assert types_of(styrene)[6] == 'C26' and types_of(styrene)[7] == 'C6'


# ---------------------------------------------------------------- values

# RDKit Crippen.MolLogP published-example anchors (each is the sum of the
# published contributions for the hand-assigned types above)
ANCHORS = [
    ('benzene', rec([6] * 6, RING6, AROM6), 1.6866),
    ('ethanol', rec([6, 6, 8], {(0, 1): 1, (1, 2): 1}), -0.0014),
    ('octane', rec([6] * 8, {(i, i + 1): 1 for i in range(7)}), 3.3668),
    ('acetic_acid',
     rec([6, 6, 8, 8], {(0, 1): 1, (1, 2): 2, (1, 3): 1}), 0.0909),
    ('phenol', phenyl([8], {(0, 6): 1}), 1.3922),
    ('toluene', phenyl([6], {(0, 6): 1}), 1.9950),
    ('aniline', phenyl([7], {(0, 6): 1}), 1.2688),
    ('pyridine', rec([7] + [6] * 5, RING6, AROM6), 1.0816),
    # paracetamol: 4x(C18+H1) + C23 + C22 + (O2+H2) + (N4+H3) + C5 + O9
    # + C1 + 3xH1 (RDKit standard example value)
    ('paracetamol',
     phenyl([8, 7, 6, 8, 6],
            {(0, 6): 1, (3, 7): 1, (7, 8): 1, (8, 9): 2, (8, 10): 1}),
     1.3506),
]

NAPH_BONDS = {(0, 1): 4, (1, 2): 4, (2, 3): 4, (3, 4): 4, (4, 5): 4,
              (5, 0): 4, (4, 6): 4, (6, 7): 4, (7, 8): 4, (8, 9): 4,
              (9, 5): 4}
ANCHORS.append(('naphthalene', rec([6] * 10, NAPH_BONDS, [True] * 10),
                2.8398))

# aspirin CC(=O)Oc1ccccc1C(=O)O — the one standard anchor whose VALUE
# exercises the aromatic-ether type O4 (-0.4195; a sign-flipped table entry
# here once inflated every aryl ether/ester by +0.9028). RDKit
# Crippen.MolLogP(aspirin) = 1.3101.
ANCHORS.append(('aspirin',
                # extras: 6=CH3, 7=ester C, 8=bridge O, 9=ester =O,
                #         10=acid C, 11=acid =O, 12=acid OH
                phenyl([6, 6, 8, 8, 6, 8, 8],
                       {(8, 0): 1,                         # ring C0 - O
                        (8, 7): 1, (7, 9): 2, (7, 6): 1,   # O-C(=O)-CH3
                        (1, 10): 1, (10, 11): 2, (10, 12): 1}),  # COOH
                1.3101))
# anisole COc1ccccc1 — pure O4 aryl ether (no carbonyl in range).
# RDKit Crippen.MolLogP(anisole) = sum of the published contributions for
# the verified typing (5xC18 + C23 + O4 + C3 + 8xH1).
ANCHORS.append(('anisole',
                phenyl([8, 6], {(0, 6): 1, (6, 7): 1}),
                5 * CRIPPEN_LOGP['C18'] + CRIPPEN_LOGP['C23']
                + CRIPPEN_LOGP['O4'] + CRIPPEN_LOGP['C3']
                + 8 * CRIPPEN_LOGP['H1']))


@pytest.mark.parametrize('name,mol,expect',
                         ANCHORS, ids=[a[0] for a in ANCHORS])
def test_logp_anchor(name, mol, expect):
    assert logp_of(mol) == pytest.approx(expect, abs=2e-4)


def test_h_typing():
    # acid O-H is H4: acetic acid = C1 + C5 + O9 + O2 + 3xH1 + H4
    parts = (CRIPPEN_LOGP['C1'] + CRIPPEN_LOGP['C5'] + CRIPPEN_LOGP['O9']
             + CRIPPEN_LOGP['O2'] + 3 * CRIPPEN_LOGP['H1']
             + CRIPPEN_LOGP['H4'])
    acoh = rec([6, 6, 8, 8], {(0, 1): 1, (1, 2): 2, (1, 3): 1})
    assert logp_of(acoh) == pytest.approx(parts, abs=1e-9)
    # thiol S-H is H2
    etsh = rec([6, 6, 16], {(0, 1): 1, (1, 2): 1})
    want = (CRIPPEN_LOGP['C1'] + CRIPPEN_LOGP['C3'] + CRIPPEN_LOGP['S1']
            + 5 * CRIPPEN_LOGP['H1'] + CRIPPEN_LOGP['H2'])
    assert logp_of(etsh) == pytest.approx(want, abs=1e-9)
    # pyrrole N-H is H3 (the valence model assigns aromatic N no implicit
    # H — pyridine-style — so the N-H is supplied explicitly here)
    ring5 = {(i, (i + 1) % 5): 4 for i in range(5)}
    pyrrole = rec([7] + [6] * 4, ring5, [True] * 5)
    want = (CRIPPEN_LOGP['N11'] + 4 * CRIPPEN_LOGP['C18']
            + 4 * CRIPPEN_LOGP['H1'] + CRIPPEN_LOGP['H3'])
    got = crippen_logp_exact(pyrrole.element, _undirected(pyrrole),
                             pyrrole.aromatic, [1, 1, 1, 1, 1])
    assert got == pytest.approx(want, abs=1e-9)
