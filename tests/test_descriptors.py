"""First-party descriptor stack (evaluation/descriptors.py) against known
molecules — the RDKit-free fallback for ref utils/evaluation/
scoring_func.py get_chem/obey_lipinski and similarity.py Tanimoto."""

import numpy as np
import pytest

from decompdiff_tpu.data.mol import MolRecord
from decompdiff_tpu.evaluation import scoring
from decompdiff_tpu.evaluation.descriptors import (
    _estimate_stereocenters, _undirected, crippen_logp, implicit_h_counts,
    lipinski_count, mol_weight, num_aromatic_rings, num_h_acceptors,
    num_h_donors, num_rings, path_fingerprint, qed_score, sa_score,
    tanimoto, tpsa)


def rec(element, bonds, aromatic=None, charges=None):
    """MolRecord from {(a, b): order} undirected bonds."""
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


@pytest.fixture(scope='module')
def mols():
    ethanol = rec([6, 6, 8], {(0, 1): 1, (1, 2): 1})
    ring6 = {(i, (i + 1) % 6): 4 for i in range(6)}
    benzene = rec([6] * 6, ring6, aromatic=[True] * 6)
    pyridine = rec([7] + [6] * 5, ring6, aromatic=[True] * 6)
    octane = rec([6] * 8, {(i, i + 1): 1 for i in range(7)})
    heptane = rec([6] * 7, {(i, i + 1): 1 for i in range(6)})
    ether = rec([6, 6, 8, 6, 6],
                {(0, 1): 1, (1, 2): 1, (2, 3): 1, (3, 4): 1})
    naph_bonds = {(0, 1): 4, (1, 2): 4, (2, 3): 4, (3, 4): 4, (4, 5): 4,
                  (5, 0): 4, (4, 6): 4, (6, 7): 4, (7, 8): 4, (8, 9): 4,
                  (9, 5): 4}
    naphthalene = rec([6] * 10, naph_bonds, aromatic=[True] * 10)
    # aspirin: ring C0-C5 aromatic; C6(=O7)(O8-H) on C0; O9-C10(=O11)-C12
    # ester on C1
    aspirin_bonds = dict(ring6)
    aspirin_bonds.update({(0, 6): 1, (6, 7): 2, (6, 8): 1,
                          (1, 9): 1, (9, 10): 1, (10, 11): 2, (10, 12): 1})
    aspirin = rec([6] * 6 + [6, 8, 8, 8, 6, 8, 6], aspirin_bonds,
                  aromatic=[True] * 6 + [False] * 7)
    # spiro[4.4]nonane: two cyclopentanes sharing atom 0
    spiro_bonds = {(0, 1): 1, (1, 2): 1, (2, 3): 1, (3, 4): 1, (4, 0): 1,
                   (0, 5): 1, (5, 6): 1, (6, 7): 1, (7, 8): 1, (8, 0): 1}
    spiro = rec([6] * 9, spiro_bonds)
    return dict(ethanol=ethanol, benzene=benzene, pyridine=pyridine,
                octane=octane, heptane=heptane, ether=ether,
                naphthalene=naphthalene, aspirin=aspirin, spiro=spiro)


def _h(m):
    return implicit_h_counts(m.element, _undirected(m), m.charges)


def test_implicit_h(mols):
    np.testing.assert_array_equal(_h(mols['ethanol']), [3, 2, 1])
    np.testing.assert_array_equal(_h(mols['benzene']), [1] * 6)
    # pyridine N: two aromatic bonds sum to 3.0 -> no H
    np.testing.assert_array_equal(_h(mols['pyridine']), [0] + [1] * 5)


def test_implicit_h_charges():
    # N+ with 4 single bonds -> 0 H; with 3 -> 1 H
    ammonium = rec([7, 6, 6, 6], {(0, 1): 1, (0, 2): 1, (0, 3): 1},
                   charges=[1, 0, 0, 0])
    assert _h(ammonium)[0] == 1
    # carboxylate O-
    olate = rec([6, 8], {(0, 1): 1}, charges=[0, -1])
    assert _h(olate)[1] == 0


def test_mol_weight(mols):
    m = mols['ethanol']
    assert mol_weight(m.element, _h(m)) == pytest.approx(46.0419, abs=1e-3)
    b = mols['benzene']
    assert mol_weight(b.element, _h(b)) == pytest.approx(78.0470, abs=1e-3)
    a = mols['aspirin']
    assert mol_weight(a.element, _h(a)) == pytest.approx(180.0423, abs=1e-3)


def test_donors_acceptors(mols):
    e = mols['ethanol']
    assert num_h_donors(e.element, _h(e)) == 1
    assert num_h_acceptors(e.element) == 1
    p = mols['pyridine']
    assert num_h_donors(p.element, _h(p)) == 0
    assert num_h_acceptors(p.element) == 1
    a = mols['aspirin']
    assert num_h_donors(a.element, _h(a)) == 1
    assert num_h_acceptors(a.element) == 4


def test_tpsa_exact_table(mols):
    def t(m):
        return tpsa(m.element, _undirected(m), m.aromatic, _h(m), m.charges)
    assert t(mols['benzene']) == 0.0
    assert t(mols['ethanol']) == pytest.approx(20.23)
    assert t(mols['ether']) == pytest.approx(9.23)
    assert t(mols['pyridine']) == pytest.approx(12.89)
    # aspirin's published TPSA: COOH (17.07 + 20.23) + ester (9.23 + 17.07)
    assert t(mols['aspirin']) == pytest.approx(63.60)


def test_logp_anchors(mols):
    def lp(m):
        return crippen_logp(m.element, _undirected(m), m.aromatic, _h(m))
    # anchors reproduced exactly by the reduced class table
    assert lp(mols['ethanol']) == pytest.approx(-0.0014, abs=0.01)
    assert lp(mols['benzene']) == pytest.approx(1.6866, abs=0.01)
    assert lp(mols['octane']) == pytest.approx(3.3668, abs=0.01)
    # qualitative ordering: greasy > aromatic > polar
    assert lp(mols['octane']) > lp(mols['benzene']) > lp(mols['ethanol'])


def test_lipinski(mols):
    assert lipinski_count(mols['ethanol']) == 5
    assert lipinski_count(mols['aspirin']) == 5


def test_ring_counts(mols):
    assert num_aromatic_rings(mols['benzene']) == 1
    assert num_aromatic_rings(mols['naphthalene']) == 2
    assert num_aromatic_rings(mols['ethanol']) == 0
    assert num_rings(mols['spiro']) == 2
    counts = scoring.batched_number_of_rings(
        [mols['benzene'], mols['naphthalene'], mols['ethanol']])
    np.testing.assert_array_equal(counts, [1, 2, 0])


def test_fingerprint_tanimoto(mols):
    fp_oct = path_fingerprint(mols['octane'])
    assert tanimoto(fp_oct, fp_oct) == 1.0
    sim_alkanes = tanimoto(fp_oct, path_fingerprint(mols['heptane']))
    sim_cross = tanimoto(fp_oct, path_fingerprint(mols['benzene']))
    assert sim_alkanes > 0.5
    assert sim_cross < 0.3
    assert sim_alkanes > sim_cross


def test_tanimoto_sim_entrypoints(mols):
    assert scoring.tanimoto_sim(mols['octane'], mols['octane']) == 1.0
    sims = scoring.tanimoto_sim_N_to_1(
        [mols['heptane'], mols['benzene']], mols['octane'])
    assert sims[0] > sims[1]
    with pytest.raises((TypeError, ImportError)):
        scoring.tanimoto_sim(mols['octane'], object())


def test_qed_ordering(mols):
    qa = qed_score(mols['aspirin'])
    qo = qed_score(mols['octane'])
    assert 0.3 < qa <= 1.0
    assert qo < qa


def test_sa_complexity_ordering(mols):
    # normalized SA: higher = more synthesizable; a plain chain beats a
    # spiro bicycle of similar size
    assert sa_score(mols['octane']) > sa_score(mols['spiro'])
    assert 0.0 < sa_score(mols['spiro']) <= 1.0


def test_stereocenter_estimate():
    # CHFClBr: one stereocenter
    chiral = rec([6, 9, 17, 35], {(0, 1): 1, (0, 2): 1, (0, 3): 1})
    assert _estimate_stereocenters(chiral, _h(chiral)) == 1
    # neopentane: none (4 identical branches)
    neo = rec([6] * 5, {(0, i): 1 for i in range(1, 5)})
    assert _estimate_stereocenters(neo, _h(neo)) == 0
    # branches that differ only 5 bonds out (beyond any fixed WL radius):
    # center C bearing OH, CH3, and two pentyl chains terminated Cl vs Br
    # — the converged partition must still tell them apart (RDKit's
    # canonical ranks do), where a radius-limited estimate could not
    far = {(0, 1): 1, (0, 2): 1, (0, 3): 1, (3, 4): 1, (4, 5): 1,
           (5, 6): 1, (6, 7): 1, (7, 8): 1, (0, 9): 1, (9, 10): 1,
           (10, 11): 1, (11, 12): 1, (12, 13): 1, (13, 14): 1}
    el = [6, 8, 6] + [6] * 5 + [17] + [6] * 5 + [35]
    m = rec(el, far)
    assert _estimate_stereocenters(m, _h(m)) == 1
    # same skeleton with both chains ending Cl: the branches are
    # equivalent, no stereocenter
    el_sym = [6, 8, 6] + [6] * 5 + [17] + [6] * 5 + [17]
    m_sym = rec(el_sym, far)
    assert _estimate_stereocenters(m_sym, _h(m_sym)) == 0


def test_get_chem_routes_molrecord(mols):
    assert scoring.can_score(mols['aspirin'])
    chem = scoring.get_chem(mols['aspirin'])
    assert set(chem) == {'qed', 'sa', 'logp', 'lipinski', 'ring_size',
                         'chem_backend'}
    assert chem['chem_backend'] == 'first_party'
    assert np.isfinite(chem['qed']) and np.isfinite(chem['sa'])
    assert chem['lipinski'] == 5
    assert chem['ring_size'][6] == 1
    assert scoring.obey_lipinski(mols['aspirin']) == 5


def test_diversity_metric(mols):
    from decompdiff_tpu.evaluation import protocol
    assert protocol.pocket_diversity([mols['octane']]) is None
    same = protocol.pocket_diversity([mols['octane'], mols['octane']])
    assert same == pytest.approx(0.0)
    mixed = protocol.pocket_diversity(
        [mols['octane'], mols['benzene'], mols['ethanol']])
    assert 0.5 < mixed <= 1.0
    agg = protocol.diversity({
        'a': [mols['octane'], mols['octane']],
        'b': [mols['octane'], mols['benzene'], mols['ethanol']],
        'c': [mols['ethanol']]})  # <2 mols: excluded from the mean
    assert agg == pytest.approx((same + mixed) / 2)


def test_get_basic(mols):
    n_atoms, n_bonds, n_rings, weight = scoring.get_basic(mols['aspirin'])
    assert (n_atoms, n_bonds, n_rings) == (13, 13, 1)
    assert weight == pytest.approx(180.0423, abs=1e-3)


def test_hybridization_from_index():
    from decompdiff_tpu.constants import hybridization_from_index
    h = hybridization_from_index(np.array([1, 2, 4]), 'full')
    assert list(h) == ['SP', 'SP2', 'SP3']
    with pytest.raises(ValueError):
        hybridization_from_index(np.array([0]), 'basic')


def test_force_field_front(mols):
    # stretched ethanol: Minimize should lower the ffmin energy
    m = mols['ethanol']
    stretched = MolRecord(
        element=m.element, pos=np.array([[0, 0, 0], [3.0, 0, 0],
                                         [6.0, 0, 0]], np.float32),
        bond_index=m.bond_index, bond_type=m.bond_type, aromatic=m.aromatic)
    ff = scoring.get_molecule_force_field(stretched)
    e0 = ff.CalcEnergy()
    assert ff.Minimize() == 0
    assert ff.CalcEnergy() < e0
    energies = scoring.get_conformer_energies(stretched)
    assert energies.shape == (1,) and energies[0] == pytest.approx(e0)


def test_plot_distance_hist(tmp_path, mols):
    from decompdiff_tpu.evaluation.eval_bond_length import (
        eval_pair_length_profile, get_pair_length_profile,
        pair_distances_from_pos, plot_distance_hist)
    rng = np.random.default_rng(0)
    pairs = pair_distances_from_pos(rng.normal(size=(12, 3)) * 3,
                                    np.full(12, 6))
    profile = get_pair_length_profile(pairs)
    metrics = eval_pair_length_profile(profile)
    out = tmp_path / 'hist.png'
    plot_distance_hist(profile, metrics=metrics, save_path=str(out))
    assert out.exists() and out.stat().st_size > 1000
