"""First-party SMILES parser + SMARTS engine + structural-alert catalog
(evaluation/{smiles,smarts,alerts}.py — the in-image execution path for the
reference's RDKit-catalog `is_pains`, ref utils/evaluation/scoring_func.py:
15-25). RDKit-parity cases are asserted against committed expectations
(and re-checked live when RDKit is installed)."""

import numpy as np
import pytest

from decompdiff_tpu.evaluation.smiles import (SmilesError, mol_from_smiles)
from decompdiff_tpu.evaluation.smarts import (
    MolContext, SmartsError, compile_smarts, has_substruct)
from decompdiff_tpu.evaluation import alerts as A
from decompdiff_tpu.evaluation.scoring import is_pains


# --------------------------------------------------------------------------
# SMILES parser

def test_smiles_benzene():
    m = mol_from_smiles('c1ccccc1')
    assert m.num_atoms == 6
    assert m.aromatic.all()
    assert (np.asarray(m.element) == 6).all()
    assert m.bond_index.shape == (2, 12)  # directed both ways
    assert (np.asarray(m.bond_type) == 4).all()


def test_smiles_paracetamol_graph():
    m = mol_from_smiles('CC(=O)Nc1ccc(O)cc1')
    assert m.num_atoms == 11
    assert int(m.aromatic.sum()) == 6
    orders = sorted(np.asarray(m.bond_type).tolist())
    assert orders.count(2) == 2   # one C=O, both directions
    assert orders.count(4) == 12


def test_smiles_bracket_charge_and_h():
    m = mol_from_smiles('[NH4+]')
    assert m.num_atoms == 1 and m.charges[0] == 1
    assert m.props['explicit_h'][0] == 4
    m = mol_from_smiles('[O-]C')
    assert m.charges[0] == -1
    m = mol_from_smiles('[Fe+2]')
    assert m.charges[0] == 2 and m.element[0] == 26


def test_smiles_ring_closures_and_fragments():
    naph = mol_from_smiles('c1ccc2ccccc2c1')
    assert naph.num_atoms == 10 and naph.bond_index.shape[1] // 2 == 11
    pct = mol_from_smiles('C%10CC%10')
    assert pct.bond_index.shape[1] // 2 == 3
    salt = mol_from_smiles('[Na+].[Cl-]')
    assert salt.num_atoms == 2 and salt.bond_index.shape[1] == 0


def test_smiles_explicit_bond_orders():
    m = mol_from_smiles('C#N')
    assert np.asarray(m.bond_type)[0] == 3
    m = mol_from_smiles('C/C=C/C')  # directional bonds -> single
    orders = sorted(np.asarray(m.bond_type).tolist())
    assert orders == [1, 1, 2, 2, 1, 1] or orders == [1, 1, 1, 1, 2, 2]


def test_smiles_errors():
    for bad in ['C(', 'C)', 'C1CC', 'Xx', '', '[Q]', '1CC',
                # error-contract regressions: these used to escape as bare
                # ValueError (unterminated bracket, malformed %), or parse
                # silently (conflicting ring-closure orders; RDKit rejects)
                'C[NH2', 'C%', 'C%1C', 'C=1CCCCC#1']:
        with pytest.raises(SmilesError):
            mol_from_smiles(bad)
    # agreeing ring-closure orders stay legal (either or both ends)
    m = mol_from_smiles('C=1CCCCC=1')
    assert sorted(np.asarray(m.bond_type).tolist())[-2:] == [2, 2]


def test_smiles_canonical_for_wl_tied_nonautomorphic_atoms():
    """The Frucht graph (3-regular, trivial automorphism group) is
    WL-indistinguishable at every refinement level; the writer must still
    emit ONE canonical string across atom orders (regression: the
    tie-break picked min(input index))."""
    from decompdiff_tpu.data.mol import MolRecord as MR
    from decompdiff_tpu.evaluation.smiles import mol_to_smiles as to_smi
    lcf = [-5, -2, -4, 2, 5, -2, 2, 5, -2, -5, 4, 2]
    edges = set()
    for i in range(12):
        edges.add((min(i, (i + 1) % 12), max(i, (i + 1) % 12)))
        j = (i + lcf[i]) % 12
        edges.add((min(i, j), max(i, j)))

    def build(perm):
        inv = {old: new for new, old in enumerate(perm)}
        und = np.array(sorted((min(inv[a], inv[b]), max(inv[a], inv[b]))
                              for a, b in edges), np.int64).T
        bi = np.concatenate([und, und[::-1]], axis=1)
        return MR(element=np.full(12, 6, np.int64),
                  pos=np.zeros((12, 3), np.float32),
                  bond_index=bi, bond_type=np.ones(bi.shape[1], np.int64),
                  aromatic=np.zeros(12, bool),
                  charges=np.zeros(12, np.int64))

    rng = np.random.default_rng(5)
    outs = {to_smi(build(rng.permutation(12))) for _ in range(12)}
    assert len(outs) == 1


# --------------------------------------------------------------------------
# SMARTS matching (expectations mirror RDKit HasSubstructMatch)

MATCH_CASES = [
    ('c1ccccc1', 'c1ccccc1', True),
    ('c1ccccc1', 'C1CCCCC1', False),
    ('C1CCCCC1', '[R]', True),
    ('CCCC', '[R]', False),
    ('CC(=O)Nc1ccc(O)cc1', '[OX2H]', True),
    ('CC(=O)Nc1ccc(O)cc1', 'C(=O)[NH]', True),
    ('Oc1ccccc1O', '[OX2H]c1ccccc1[OX2H]', True),
    ('Oc1ccccc1', '[OX2H]c1ccccc1[OX2H]', False),
    ('CN=NC', '[#6]N=N[#6]', True),
    ('CC=CC(C)=O', 'C=CC=O', True),
    ('CCCC(C)=O', 'C=CC=O', False),
    ('c1cc[nH]c1', '[nH]', True),
    ('c1ccncc1', '[nH]', False),
    ('[NH4+]', '[N+]', True),
    ('CC(=O)O', '[CX3](=O)[OX2H1]', True),
    ('CC(=O)OC', '[CX3](=O)[OX2H1]', False),
    ('c1ccccc1', '[$(c1ccccc1)]', True),
    ('C1CCCCC1', '[$(c1ccccc1)]', False),
    ('c1ccc2ccccc2c1', '[R2]', True),
    ('c1ccccc1', '[R2]', False),
    ('Clc1ccccc1', '[Cl,Br,I]', True),
    ('Fc1ccccc1', '[Cl,Br,I]', False),
    ('C1CC1', '[r3]', True),
    ('C1CCC1', '[r3]', False),
    ('CC=O', '[CX3H1]=O', True),
    ('CC(C)=O', '[CX3H1]=O', False),
    ('c1ccccc1', '*@*', True),
    ('CC', '*@*', False),
    ('CC', '*!@*', True),
    ('C1CC1', '*!@*', False),
    ('O.CC', 'O.C', True),
    ('CCO', '[!#6]', True),
    ('CC', '[!#6]', False),
    ('CN(C)C', '[NX3](C)(C)C', True),
    ('CCCC', 'C~C~C', True),
    ('CC#N', 'C#N', True),
    ('c1ccsc1', '[#16;a]', True),
    ('CS(C)=O', '[#16;a]', False),
    ('CC(C)(C)C', '[CH0](C)(C)(C)C', True),
    ('O=[N+]([O-])c1ccccc1', 'c[N+](=O)[O-]', True),
    ('CC[N+](=O)[O-]', 'c[N+](=O)[O-]', False),
    ('NC(=O)c1ccccc1', '[CX3](=[OX1])[NX3H2]', True),
    ('CNC(=O)c1ccccc1', '[CX3](=[OX1])[NX3H2]', False),
    # low-precedence and vs or: aromatic-N or (aliphatic-N and ring)
    ('C1CCNC1', '[n,N;R]', True),
    ('NCC', '[n,N;R]', False),
    ('c1ccncc1', '[n,N;R]', True),
    # valence / degree / connectivity
    ('CS(=O)(=O)C', '[Sv6]', True),
    ('CSC', '[Sv6]', False),
    # aromatic valence snaps DOWN to default+charge (RDKit kekulized
    # semantics): pyrrole [nH] is v3, furan o / thiophene s v2,
    # N-methylpyrrole n v3, pyridinium [nH+] v4
    ('c1cc[nH]c1', '[nH;v3]', True),
    ('c1cc[nH]c1', '[nH;v4]', False),
    ('c1ccncc1', '[n;v3]', True),
    ('c1ccoc1', '[o;v2]', True),
    ('c1ccsc1', '[s;v2]', True),
    ('Cn1cccc1', '[n;v3]', True),
    ('c1cc[nH+]cc1', '[n;v4]', True),
    ('c1ccccc1', '[c;v4]', True),
    ('c1ccc2ccccc2c1', '[c;v4;D3]', True),
    ('CC(C)C', '[CD3]', True),
    ('CCCC', '[CD3]', False),
    # negated element class
    ('CCO', '[!C;!c]', True),
    ('CC', '[!C;!c]', False),
]


@pytest.mark.parametrize('smi,sma,exp', MATCH_CASES)
def test_smarts_match(smi, sma, exp):
    assert has_substruct(mol_from_smiles(smi), sma) == exp


@pytest.mark.parametrize('smi,sma,exp', MATCH_CASES)
def test_smarts_match_rdkit_parity(smi, sma, exp):
    rdkit = pytest.importorskip('rdkit')
    from rdkit import Chem
    mol = Chem.MolFromSmiles(smi)
    patt = Chem.MolFromSmarts(sma)
    assert mol is not None and patt is not None
    assert mol.HasSubstructMatch(patt) == exp


def test_smarts_find_counts():
    m = mol_from_smiles('Oc1ccc(O)cc1')
    # two phenol oxygens, each one embedding of [OX2H]
    assert len(compile_smarts('[OX2H]').find(m)) == 2
    # benzene has 12 embeddings of c1ccccc1 (6 rotations x 2 orientations)
    assert len(compile_smarts('c1ccccc1').find(mol_from_smiles('c1ccccc1'))) == 12


def test_smarts_default_bond_single_or_aromatic():
    # 'CC' default bond must match aromatic cc too via lowercase query
    assert has_substruct(mol_from_smiles('c1ccccc1'), 'cc')
    # but not a double bond
    assert not has_substruct(mol_from_smiles('C=C'), 'CC')
    assert has_substruct(mol_from_smiles('C=C'), 'C~C')


def test_smarts_context_properties():
    ctx = MolContext(mol_from_smiles('Oc1ccc2ccccc2c1'))
    assert ctx.ring_count.max() == 2           # fusion atoms in 2 rings
    assert ctx.min_ring[1] == 6
    assert ctx.h[0] == 1                       # phenol OH
    assert ctx.degree[0] == 1


def test_smarts_explicit_h_queries_merge():
    """[#1] query atoms fold into min-H-count constraints on their heavy
    neighbor (RDKit mergeQueryHs parity) — real PAINS corpora write N-H/C-H
    this way; before the merge every such pattern silently never matched
    heavy-atom-only MolRecords."""
    # wehi_pains.csv ene_cyano_A
    pat = '[#6](=[#6](-[#6]#[#7])-[#7](-[#1])-[#1])(-[#1])-[#6]:[#6]'
    assert has_substruct(mol_from_smiles('NC(=Cc1ccccc1)C#N'), pat)
    assert not has_substruct(mol_from_smiles('CN(C)C(=Cc1ccccc1)C#N'), pat)
    # H-count semantics are >= (two merged Hs need >= 2, not exactly 2)
    assert has_substruct(mol_from_smiles('N'), '[#7](-[#1])-[#1]')     # NH3
    assert has_substruct(mol_from_smiles('NC'), '[#7]-[#1]')           # NH2
    assert not has_substruct(mol_from_smiles('CN(C)C'), '[#7]-[#1]')
    # unmergeable: a lone [#1] stays a graph atom and never matches
    assert not has_substruct(mol_from_smiles('C'), '[#1]')
    # the merged pattern keeps its other bonds intact
    p = compile_smarts('[#6](-[#1])(-[#1])=O')
    assert len(p.atoms) == 2 and len(p.bonds) == 1
    assert p.match(mol_from_smiles('C=O'))
    assert not p.match(mol_from_smiles('CC(C)=O'))


def test_smarts_errors():
    for bad in ['[', 'C(', 'C1', '[Zq]', '', '[C', '$(C']:
        with pytest.raises((SmartsError, Exception)):
            compile_smarts(bad).match(mol_from_smiles('CC'))


# --------------------------------------------------------------------------
# alert catalog + is_pains wiring

ALERT_POS_NEG = {
    'quinone_para': ('O=C1C=CC(=O)C=C1', 'Oc1ccc(O)cc1'),
    'quinone_ortho': ('O=C1C(=O)C=CC=C1', 'Oc1ccccc1O'),
    'catechol': ('Oc1ccccc1O', 'Oc1ccccc1'),
    'hydroquinone': ('Oc1ccc(O)cc1', 'Oc1ccccc1'),
    'azo': ('c1ccccc1N=Nc1ccccc1', 'CC=NO'),
    'acyclic_imine': ('CC=NC', 'C1CCN=C1'),
    'hydrazone': ('CC=NN(C)C', 'CC=NC'),
    'rhodanine': ('O=C1CSC(=S)N1', 'O=C1CSC(=O)N1'),
    'ene_rhodanine': ('O=C1N/C(=S)SC1=C/c1ccccc1', 'O=C1CSC(=S)N1'),
    'thiazolidinone_ene': ('O=C1NC(=O)SC1=Cc1ccccc1', 'O=C1CSC(=O)N1'),
    'isothiazolone': ('O=C1C=CSN1C', 'O=C1CCSN1'),
    'michael_acceptor': ('C=CC(C)=O', 'CCC(C)=O'),
    'nitro_arom': ('[O-][N+](=O)c1ccccc1', 'CC[N+](=O)[O-]'),
    'nitro_arom_neutral': ('O=N(=O)c1ccccc1', 'CN(=O)=O'),
    'thiourea': ('NC(=S)N', 'NC(=O)N'),
    'aldehyde': ('CC=O', 'CC(C)=O'),
    'alkyl_halide': ('CCCl', 'Clc1ccccc1'),
    'peroxide': ('CCOOC', 'CCOC'),
    'disulfide': ('CCSSC', 'CCSC'),
    'mannich_phenol': ('Oc1ccccc1CN(C)C', 'Oc1ccccc1'),
}


@pytest.mark.parametrize('name', sorted(ALERT_POS_NEG))
def test_alert_positive_negative(name):
    pos, neg = ALERT_POS_NEG[name]
    assert name in A.match_alerts(mol_from_smiles(pos), first_only=False)
    assert name not in A.match_alerts(mol_from_smiles(neg), first_only=False)


def test_every_shipped_alert_has_a_case():
    assert {n for n, _ in A.FIRST_PARTY_ALERTS} == set(ALERT_POS_NEG)


def test_is_pains_molrecord_wiring():
    assert is_pains(mol_from_smiles('O=C1C=CC(=O)C=C1')) is True
    assert is_pains(mol_from_smiles('CC(C)Cc1ccc(cc1)C(C)C(=O)O')) is False
    assert A.pains_backend() == 'first_party_subset'


def test_catalog_file_override(tmp_path, monkeypatch):
    cat = tmp_path / 'pains.txt'
    cat.write_text('# custom corpus\n'
                   '"c1ccccc1","<regId=any_benzene>"\n'
                   'C#N nitrile_alert\n')
    loaded = A.load_catalog(str(cat))
    assert loaded == [('any_benzene', 'c1ccccc1'), ('nitrile_alert', 'C#N')]
    monkeypatch.setenv('DD_PAINS_SMARTS', str(cat))
    assert A.pains_backend() == 'catalog_file'
    assert is_pains(mol_from_smiles('c1ccccc1'))
    assert is_pains(mol_from_smiles('CC#N'))
    assert not is_pains(mol_from_smiles('CCO'))


# --------------------------------------------------------------------------
# SMILES writer (canonical within this implementation)

from decompdiff_tpu.data.mol import MolRecord
from decompdiff_tpu.evaluation.smiles import mol_to_smiles


def _permute(m, perm):
    inv = np.argsort(perm)
    rec = MolRecord(
        element=np.asarray(m.element)[perm],
        pos=m.pos[perm],
        bond_index=inv[np.asarray(m.bond_index)],
        bond_type=np.asarray(m.bond_type).copy(),
        aromatic=np.asarray(m.aromatic)[perm],
        charges=(np.asarray(m.charges)[perm]
                 if m.charges is not None else None))
    eh = (m.props or {}).get('explicit_h')
    if eh:
        rec.props['explicit_h'] = {int(inv[k]): v for k, v in eh.items()}
    return rec


WRITER_SMILES = [
    'c1ccccc1', 'CC(=O)Nc1ccc(O)cc1', 'O=C1C=CC(=O)C=C1', 'c1cc[nH]c1',
    'C1CC2CCC1CC2', 'CC(C)(C)c1ccc2occ(CC(=O)Nc3ccccc3F)c2c1',
    'OC(=O)C1CCCN1C', '[O-][N+](=O)c1ccc(Cl)cc1', 'c1ccc2ncccc2c1',
    'CC1=CC(=O)C=CC1=O', 'S=C1NC(=O)CS1', 'C1CCC2(CC1)CCCCC2',
    '[NH4+].[Cl-]', 'N#Cc1ccccc1',
]


@pytest.mark.parametrize('smi', WRITER_SMILES)
def test_writer_roundtrip_stable(smi):
    m = mol_from_smiles(smi)
    can = mol_to_smiles(m)
    m2 = mol_from_smiles(can)
    assert m2.num_atoms == m.num_atoms
    assert m2.bond_index.shape == m.bond_index.shape
    assert mol_to_smiles(m2) == can


@pytest.mark.parametrize('smi', WRITER_SMILES)
def test_writer_canonical_under_permutation(smi):
    rng = np.random.default_rng(hash(smi) % 2**31)
    m = mol_from_smiles(smi)
    can = mol_to_smiles(m)
    for _ in range(5):
        assert mol_to_smiles(_permute(m, rng.permutation(m.num_atoms))) == can


def test_writer_preserves_graph_invariants():
    # descriptor-level equality through the round trip (bond orders, H,
    # aromaticity all preserved)
    from decompdiff_tpu.evaluation.descriptors import get_chem_record
    for smi in ['CC(=O)Nc1ccc(O)cc1', 'O=C1C=CC(=O)C=C1', 'OC(=O)C1CCCN1C']:
        a = get_chem_record(mol_from_smiles(smi))
        b = get_chem_record(mol_from_smiles(mol_to_smiles(mol_from_smiles(smi))))
        assert a['qed'] == pytest.approx(b['qed'])
        assert a['sa'] == pytest.approx(b['sa'])
        assert a['logp'] == pytest.approx(b['logp'])


def test_writer_order4_bond_to_unwritable_aromatic_atom():
    # an aromatic flag on an atom outside the lowercase organic subset
    # (e.g. a halogen) is unrepresentable in SMILES; the writer must then
    # emit an explicit ':' so the order-4 bond survives the roundtrip
    # instead of defaulting to single (regression: bond_token used the
    # record's flags, not what the written tokens re-parse as)
    rec = MolRecord(
        element=np.array([6, 17], np.int64),
        pos=np.zeros((2, 3), np.float32),
        bond_index=np.array([[0, 1], [1, 0]], np.int64),
        bond_type=np.array([4, 4], np.int64),
        aromatic=np.array([True, True]),
        charges=np.zeros(2, np.int64))
    out = mol_to_smiles(rec)
    m2 = mol_from_smiles(out)
    assert np.asarray(m2.bond_type).tolist() == [4, 4]


@pytest.mark.parametrize('smi', WRITER_SMILES)
def test_writer_rdkit_reads_our_output(smi):
    rdkit = pytest.importorskip('rdkit')
    from rdkit import Chem
    out = mol_to_smiles(mol_from_smiles(smi))
    mol = Chem.MolFromSmiles(out)
    assert mol is not None
    assert Chem.MolToSmiles(mol) == Chem.MolToSmiles(Chem.MolFromSmiles(smi))


def test_qed_alerts_env_corpus(tmp_path, monkeypatch):
    from decompdiff_tpu.evaluation.descriptors import (qed_properties,
                                                       qed_score)
    quinone = mol_from_smiles('O=C1C=CC(=O)C=C1')
    base = qed_score(quinone)
    cat = tmp_path / 'brenk.txt'
    cat.write_text('O=C1C=CC(=O)C=C1 quinone\nN=[N+]=[N-] azide\n')
    monkeypatch.setenv('DD_QED_ALERTS_SMARTS', str(cat))
    props = qed_properties(quinone)
    assert props['ALERTS'] == 1
    assert qed_score(quinone) < base  # alert hit lowers desirability
    assert qed_properties(mol_from_smiles('CCO'))['ALERTS'] == 0


# --------------------------------------------------------------------------
# randomized writer fuzz: random heavy-atom graphs -> write -> reparse ->
# graph equality (the sampler's reconstructed molecules are arbitrary
# graphs, not curated drug-like SMILES — the writer must survive them)

def _random_record(rng):
    n = int(rng.integers(2, 14))
    # random spanning tree keeps the graph connected
    pairs = {(int(rng.integers(0, i)), i) for i in range(1, n)}
    for _ in range(int(rng.integers(0, n))):  # extra edges -> rings
        a, b = sorted(int(x) for x in rng.choice(n, size=2, replace=False))
        pairs.add((a, b))
    pairs = sorted(pairs)
    orders = rng.choice([1, 1, 1, 2, 3], size=len(pairs))
    element = rng.choice([6, 6, 6, 7, 8, 9, 16, 17], size=n)
    charges = rng.choice([0, 0, 0, 0, 0, 1, -1], size=n)
    src = [a for a, b in pairs] + [b for a, b in pairs]
    dst = [b for a, b in pairs] + [a for a, b in pairs]
    return MolRecord(
        element=np.asarray(element, np.int64),
        pos=np.zeros((n, 3), np.float32),
        bond_index=np.asarray([src, dst], np.int64),
        bond_type=np.asarray(list(orders) * 2, np.int64),
        aromatic=np.zeros(n, bool),
        charges=np.asarray(charges, np.int64))


def _heavy_graph_key(m):
    """Canonical-independent invariant: sorted multiset of
    (element, charge) per atom and per-bond (endpoint sorted keys, order)."""
    el = np.asarray(m.element)
    q = (np.asarray(m.charges) if m.charges is not None
         else np.zeros(len(el), np.int64))
    atoms = sorted(zip(el.tolist(), q.tolist()))
    seen = {}
    bi, bt = np.asarray(m.bond_index), np.asarray(m.bond_type)
    for k in range(bi.shape[1]):
        a, b = int(bi[0, k]), int(bi[1, k])
        if a > b:
            a, b = b, a
        seen[(a, b)] = int(bt[k])
    bonds = sorted(((el[a], q[a]) if (el[a], q[a]) <= (el[b], q[b])
                    else (el[b], q[b]),
                    max((el[a], q[a]), (el[b], q[b])), o)
                   for (a, b), o in seen.items())
    return atoms, bonds


def test_writer_fuzz_roundtrip_random_graphs():
    rng = np.random.default_rng(12345)
    for trial in range(60):
        m = _random_record(rng)
        can = mol_to_smiles(m)
        m2 = mol_from_smiles(can)
        assert m2.num_atoms == m.num_atoms, (trial, can)
        assert _heavy_graph_key(m2) == _heavy_graph_key(m), (trial, can)
        # canonical: permuting the input cannot change the string, and the
        # reparse re-canonicalizes to itself (idempotence)
        assert mol_to_smiles(m2) == can, (trial, can)
        perm = rng.permutation(m.num_atoms)
        assert mol_to_smiles(_permute(m, perm)) == can, (trial, can)


def test_writer_fuzz_aromatic_rings():
    # aromatic flags + order-4 bonds on random even cycles with random
    # substituents: lowercase-writable and ':'-fallback paths both land in
    # an equal heavy-atom graph after reparse
    rng = np.random.default_rng(54321)
    for trial in range(20):
        k = int(rng.choice([5, 6, 7]))
        n = k + int(rng.integers(0, 3))
        element = [6] * k + list(rng.choice([6, 7, 8], size=n - k))
        pairs = [(i, (i + 1) % k) for i in range(k)]
        orders = [4] * k
        for j in range(k, n):  # hang substituents off the ring
            pairs.append((int(rng.integers(0, k)), j))
            orders.append(1)
        src = [a for a, b in pairs] + [b for a, b in pairs]
        dst = [b for a, b in pairs] + [a for a, b in pairs]
        m = MolRecord(
            element=np.asarray(element, np.int64),
            pos=np.zeros((n, 3), np.float32),
            bond_index=np.asarray([src, dst], np.int64),
            bond_type=np.asarray(orders * 2, np.int64),
            aromatic=np.asarray([True] * k + [False] * (n - k)),
            charges=np.zeros(n, np.int64))
        can = mol_to_smiles(m)
        m2 = mol_from_smiles(can)
        assert _heavy_graph_key(m2) == _heavy_graph_key(m), (trial, can)
        assert mol_to_smiles(m2) == can, (trial, can)
