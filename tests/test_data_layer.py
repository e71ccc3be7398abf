"""Host data layer: PDB/SDF parsing, featurization, store, collation."""

import numpy as np
import pytest

from decompdiff_tpu.data.collate import bucket_key, bucketize, collate
from decompdiff_tpu.data.dataset import DecompDataset, make_raw_record
from decompdiff_tpu.data.mol import mol_to_sdf_block, parse_mol_block, parse_sdf_file
from decompdiff_tpu.data.protein import PDBProtein
from decompdiff_tpu.data.store import DDStore, DDStoreWriter
from decompdiff_tpu.data.transforms import (
    compute_noise_dist, featurize_protein_atom, featurize_sample)
from decompdiff_tpu.priors.golden import compute_golden_prior

PDB_BLOCK = """HEADER    TEST PROTEIN
ATOM      1  N   ALA A   1      11.104   6.134  -6.504  1.00  0.00           N
ATOM      2  CA  ALA A   1      11.639   6.071  -5.147  1.00  0.00           C
ATOM      3  C   ALA A   1      10.938   6.992  -4.190  1.00  0.00           C
ATOM      4  O   ALA A   1      10.057   7.751  -4.565  1.00  0.00           O
ATOM      5  CB  ALA A   1      13.136   6.398  -5.157  1.00  0.00           C
ATOM      6  N   CYS A   2      11.351   6.944  -2.931  1.00  0.00           N
ATOM      7  CA  CYS A   2      10.790   7.775  -1.895  1.00  0.00           C
ATOM      8  SG  CYS A   2      11.789   9.045  -1.202  1.00  0.00           S
END
"""

SDF_BLOCK = """test-mol
  synthetic

  6  6  0  0  0  0  0  0  0  0999 V2000
    0.0000    1.3960    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.2090    0.6980    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.2090   -0.6980    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    0.0000   -1.3960    0.0000 N   0  0  0  0  0  0  0  0  0  0  0  0
   -1.2090   -0.6980    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
   -1.2090    0.6980    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  4  0
  2  3  4  0
  3  4  4  0
  4  5  4  0
  5  6  1  0
  6  1  1  0
M  END
$$$$
"""


def test_pdb_parser():
    p = PDBProtein(PDB_BLOCK, mode='block')
    d = p.to_dict_atom()
    assert len(d['element']) == 8
    np.testing.assert_array_equal(d['element'][:5], [7, 6, 6, 8, 6])
    assert d['element'][7] == 16  # SG sulfur
    # ALA=0, CYS=1 (reference AA_NAME_NUMBER insertion order)
    np.testing.assert_array_equal(d['atom_to_aa_type'], [0] * 5 + [1] * 3)
    np.testing.assert_array_equal(
        d['is_backbone'], [True] * 4 + [False, True, True, False])
    r = p.to_dict_residue()
    assert len(r['amino_acid']) == 2
    # pocket query: residue 1 center is near its CA
    sel = p.query_residues_ligand(np.array([[11.6, 6.0, -5.1]]), 3.0)
    assert len(sel) == 1 and sel[0]['name'] == 'ALA'
    block = p.residues_to_pdb_block(sel)
    assert 'ALA' in block and 'CYS' not in block


def test_sdf_parse_and_roundtrip():
    mol = parse_mol_block(SDF_BLOCK)
    assert mol.num_atoms == 6
    np.testing.assert_array_equal(mol.element, [6, 6, 6, 7, 6, 8])
    assert mol.bond_index.shape == (2, 12)  # directed both ways
    # atoms 0-4 touch aromatic bonds; atom 5 (O) only single bonds
    np.testing.assert_array_equal(mol.aromatic,
                                  [True, True, True, True, True, False])
    block = mol_to_sdf_block(mol)
    mol2 = parse_mol_block(block)
    np.testing.assert_array_equal(mol2.element, mol.element)
    np.testing.assert_allclose(mol2.pos, mol.pos, atol=1e-3)
    assert sorted(mol2.bond_type.tolist()) == sorted(mol.bond_type.tolist())


def _raw_sample(rng, n_prot=30, n_lig=9, num_arms=2):
    atom_mask = rng.integers(-1, num_arms, size=n_lig)
    atom_mask[:num_arms] = np.arange(num_arms)  # each arm nonempty
    atom_mask[-1] = -1
    protein_pos = rng.normal(size=(n_prot, 3)).astype(np.float32) * 5
    ligand_pos = rng.normal(size=(n_lig, 3)).astype(np.float32) * 2
    arms, sca, _ = compute_golden_prior(ligand_pos, atom_mask, protein_pos,
                                        num_arms)
    src = np.arange(n_lig - 1)
    bond_index = np.stack([np.concatenate([src, src + 1]),
                           np.concatenate([src + 1, src])])
    bond_type = np.ones(bond_index.shape[1], np.int64)
    return {
        'protein_pos': protein_pos,
        'protein_element': rng.choice([6, 7, 8, 16], size=n_prot),
        'protein_atom_to_aa_type': rng.integers(0, 20, size=n_prot),
        'protein_is_backbone': rng.random(n_prot) < 0.4,
        'ligand_pos': ligand_pos,
        'ligand_element': rng.choice([6, 7, 8], size=n_lig),
        'ligand_bond_index': bond_index,
        'ligand_bond_type': bond_type,
        'ligand_atom_is_aromatic': rng.random(n_lig) < 0.3,
        'ligand_atom_mask': atom_mask,
        'pocket_atom_masks': rng.random((num_arms, n_prot)) < 0.3,
        'num_arms': num_arms,
        'num_scaffold': 1,
        'arms_prior': arms,
        'scaffold_prior': sca,
        'src_ligand_filename': 'test/mol.sdf',
    }


def test_featurize_and_collate_end_to_end():
    rng = np.random.default_rng(0)
    recs = [featurize_sample(_raw_sample(rng, 30 + i, 9 + i, 2), 'ref_prior')
            for i in range(3)]
    assert recs[0]['protein_feat'].shape == (30, 29)  # 27 + 2 contact bits
    batch = collate(recs)
    assert batch.protein_pos.shape == (3, 128, 3)
    assert batch.ligand_pos.shape[2] == 3
    assert int(batch.num_arms[0]) == 2
    # decomp_idx of scaffold atoms equals num_arms
    real = np.asarray(batch.ligand_mask[0])
    d = np.asarray(batch.ligand_decomp_idx[0])[real]
    assert d.max() == 2
    # prior std respects the 0.6 clamp
    stds = np.asarray(batch.prior_stds)[np.asarray(batch.prior_mask)]
    assert (stds >= 0.6 - 1e-6).all()
    # bond matrix symmetric chain of single bonds
    bm = np.asarray(batch.bond_type[0])
    assert bm[0, 1] == 1 and bm[1, 0] == 1


def test_subpocket_noise_dist():
    rng = np.random.default_rng(1)
    s = _raw_sample(rng)
    nd = compute_noise_dist(s, 'subpocket')
    assert nd['centers'].shape == (3, 3)  # 2 arms + scaffold
    np.testing.assert_allclose(nd['stds'], 1.0)
    # scaffold center = protein centroid
    np.testing.assert_allclose(nd['centers'][-1], s['protein_pos'].mean(0),
                               rtol=1e-5)
    # atom counts per part
    assert nd['num_atoms'].sum() == len(s['ligand_element'])


def test_store_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    path = str(tmp_path / 'test.ddstore')
    samples = [_raw_sample(rng) for _ in range(5)]
    with DDStoreWriter(path, meta={'v': 1}) as w:
        for i, s in enumerate(samples):
            w.append(f'key{i}', s)
    store = DDStore(path)
    assert len(store) == 5
    assert store.meta == {'v': 1}
    got = store[3]
    np.testing.assert_allclose(got['protein_pos'], samples[3]['protein_pos'])
    got2 = store.get_by_key('key1')
    np.testing.assert_allclose(got2['ligand_pos'], samples[1]['ligand_pos'])

    ds = DecompDataset(store)
    rec = ds[0]
    assert rec['protein_feat'].shape[-1] == 29
    split = ds.split_by_names({'train': ['key0', 'key2', 'missing'],
                               'test': ['key4']})
    assert split['train'] == [0, 2] and split['test'] == [4]


def test_bucketize():
    assert bucketize(100, (128, 256)) == 128
    assert bucketize(128, (128, 256)) == 128
    assert bucketize(129, (128, 256)) == 256
    with pytest.raises(ValueError):
        bucketize(300, (128, 256))


def test_make_raw_record(tmp_path):
    pdb_path = str(tmp_path / 'pocket.pdb')
    sdf_path = str(tmp_path / 'lig.sdf')
    with open(pdb_path, 'w') as f:
        f.write(PDB_BLOCK)
    with open(sdf_path, 'w') as f:
        f.write(SDF_BLOCK)
    rec = make_raw_record(
        pdb_path, sdf_path,
        all_pocket_atom_serial=[[1, 2, 3]],
        all_submol_atom_idx=[[0, 1, 2], [3, 4, 5]],
        num_arms=1, num_scaffold=1)
    assert rec['pocket_atom_masks'].shape == (1, 8)
    assert rec['pocket_atom_masks'][0, :3].all()
    np.testing.assert_array_equal(rec['ligand_atom_mask'],
                                  [0, 0, 0, -1, -1, -1])
    assert len(rec['arms_prior']) == 1 and len(rec['scaffold_prior']) == 1
    # golden prior center = arm fragment centroid
    np.testing.assert_allclose(rec['arms_prior'][0][1],
                               rec['ligand_pos'][:3].mean(0), rtol=1e-5)


def test_collate_override_too_small_raises():
    """Overrides below a record's size must raise, not memcpy past the
    native pad buffers (round-3 review: ddnative pad_* have no bounds
    check, so a short nl_override was silent heap corruption)."""
    import pytest
    from decompdiff_tpu.data.collate import collate
    rng = np.random.default_rng(5)
    recs = [featurize_sample(_raw_sample(rng, 30, 9, 2), 'ref_prior')]
    with pytest.raises(ValueError, match='nl_override'):
        collate(recs, nl_override=4)
    with pytest.raises(ValueError, match='np_override'):
        collate(recs, np_override=16, nl_override=16, na_override=4)


def test_random_rot_rotates_prior_anchors():
    """random_rot must rotate the stored arm/scaffold prior mus with the
    atoms (round-3 review): the anchored forward process otherwise pulls
    rotated atoms toward un-rotated centers. Check that each prior center
    keeps its distance to the arm's atom centroid across the rotation."""
    from decompdiff_tpu.data.transforms import compute_noise_dist

    def center_dists(rec_sample):
        nd = compute_noise_dist(rec_sample, 'ref_prior')
        atom_mask = np.asarray(rec_sample['ligand_atom_mask'])
        lig = np.asarray(rec_sample['ligand_pos'])
        out = []
        for arm in range(int(rec_sample['num_arms'])):
            c = lig[atom_mask == arm].mean(0)
            out.append(np.linalg.norm(nd['centers'][arm] - c))
        out.append(np.linalg.norm(nd['centers'][-1]
                                  - lig[atom_mask == -1].mean(0)))
        return np.array(out)

    raw = _raw_sample(np.random.default_rng(8), 30, 12, 2)
    before = center_dists(raw)

    # featurize_sample with random_rot mutates a COPY; recover the rotated
    # sample by reapplying the same seed's rotation path
    from decompdiff_tpu.data.transforms import random_rotation_matrix
    rng = np.random.default_rng(123)
    rec = featurize_sample(dict(raw), 'ref_prior', random_rot=True,
                           rng=np.random.default_rng(123))
    Q = random_rotation_matrix(rng)
    rotated = dict(raw)
    rotated['protein_pos'] = raw['protein_pos'] @ Q
    rotated['ligand_pos'] = raw['ligand_pos'] @ Q
    # the featurized record's prior centers must match compute_noise_dist on
    # a consistently-rotated sample: distance to each part's atom centroid
    # is rotation-invariant ONLY if the priors rotated with the atoms
    atom_mask = np.asarray(raw['ligand_atom_mask'])
    lig_rot = rotated['ligand_pos']
    after = []
    for arm in range(int(raw['num_arms'])):
        c = lig_rot[atom_mask == arm].mean(0)
        after.append(np.linalg.norm(rec['prior_centers'][arm] - c))
    after.append(np.linalg.norm(rec['prior_centers'][-1]
                                - lig_rot[atom_mask == -1].mean(0)))
    np.testing.assert_allclose(np.array(after), before, rtol=1e-4, atol=1e-4)


def test_degenerate_ligands_through_pipeline():
    """Real-data hardening: bond-less ligands, 3-atom ligands, and
    single-arm decompositions must featurize, collate (mixed batch), and
    produce finite losses — the shapes CrossDocked's long tail will hit."""
    import jax

    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.utils.testing import tiny_model_config

    rng = np.random.default_rng(0)
    raw = _raw_sample(rng, 30, 9, 2)
    raw['ligand_bond_index'] = np.zeros((2, 0), np.int64)
    raw['ligand_bond_type'] = np.zeros((0,), np.int64)
    rec_nobond = featurize_sample(raw, 'ref_prior')
    assert rec_nobond['bond_type'].sum() == 0
    rec_tiny = featurize_sample(_raw_sample(rng, 30, 3, 2), 'ref_prior')
    rec_onearm = featurize_sample(_raw_sample(rng, 30, 6, 1), 'ref_prior')

    batch = collate([rec_nobond, rec_tiny, rec_onearm])
    assert batch.batch_size == 3

    model = DecompDiffModel.create(tiny_model_config(), num_classes=8)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    out = model.get_diffusion_loss(params, jax.random.PRNGKey(1), batch)
    for k, v in out['losses'].items():
        assert np.isfinite(float(v)), (k, v)
