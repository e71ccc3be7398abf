"""Dress rehearsal for the real-data import path (VERDICT r2 item 3).

The day real CrossDocked data / reference checkpoints arrive, only numerics
should be able to fail — not plumbing. These tests exercise, against
synthetic fixtures shaped EXACTLY like the reference's on-disk contracts:

  * `build_store_from_index` on an `index.pkl` + per-pair `*_meta.pkl` tree
    (ref scripts/data_preparation/preprocess_subcomplex.py:264-290 writes
    them; ref datasets/pl_pair_dataset.py:112-222 consumes them);
  * `import_reference_lmdb` against a mocked lmdb module serving pickled
    reference LMDB records (torch tensors, `data.to_dict()` layout, ref
    pl_pair_dataset.py:158-176);
  * `scripts/convert_checkpoint.py` end-to-end on a REAL torch `.pt` file
    (torch-cpu is available here; ref checkpoint dict layout
    `{config, model, optimizer, scheduler, iteration}`,
    ref scripts/train_diffusion_decomp.py:293-300);
  * reference-shaped meta tree -> store -> featurize -> collate ->
    `get_diffusion_loss` finite.
"""

import os
import pickle
import subprocess
import sys

import jax
import numpy as np
import pytest

from decompdiff_tpu.data.collate import collate
from decompdiff_tpu.data.dataset import (
    DecompDataset, build_store_from_index, import_reference_lmdb)
from test_data_layer import PDB_BLOCK, SDF_BLOCK

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# index.pkl + *_meta.pkl tree, shaped per the reference preprocessor
# ---------------------------------------------------------------------------

def _write_reference_tree(root, n_good=2, n_fail=1):
    """Mimic preprocess_subcomplex.py's outputs: per-pair files + meta pkl +
    index.pkl. Failure entries carry a string 'data' bucket tag exactly like
    the reference's result_dict on error (ref :245-262)."""
    os.makedirs(root, exist_ok=True)
    index = []
    for i in range(n_good):
        name = f'POCK{i}/mol{i}'
        pair_dir = os.path.join(root, f'POCK{i}')
        os.makedirs(pair_dir, exist_ok=True)
        pocket_pdb = os.path.join(pair_dir, f'mol{i}_pocket.pdb')
        ligand_sdf = os.path.join(pair_dir, f'mol{i}.sdf')
        sub_pockets = [os.path.join(pair_dir, f'mol{i}_pocket_{a}.pdb')
                       for a in range(2)]
        frags_sdf = os.path.join(pair_dir, f'mol{i}_frags.sdf')
        with open(pocket_pdb, 'w') as f:
            f.write(PDB_BLOCK)
        with open(ligand_sdf, 'w') as f:
            f.write(SDF_BLOCK)
        for p in sub_pockets:
            with open(p, 'w') as f:
                f.write(PDB_BLOCK)
        with open(frags_sdf, 'w') as f:
            f.write(SDF_BLOCK)

        item = {'src_protein_filename': f'POCK{i}/prot{i}.pdb',
                'src_ligand_filename': name + '.sdf'}
        # extract_subcomplex's full return dict (ref :196-213); keys the
        # importer does not read are populated with stand-ins of the right
        # python type
        r = {
            'al_snapshot': None,
            'all_pockets': [None, None],
            'all_pocket_atom_serial': [[1, 2, 3], [4, 5]],
            'all_pocket_residues': [[], []],
            'all_submols': [None, None, None],
            'all_submol_atom_idx': [[0, 1], [2, 3], [4, 5]],
            'protein_file': pocket_pdb,
            'ligand_file': ligand_sdf,
            'sub_pocket_files': sub_pockets,
            'sub_ligand_file': frags_sdf,
            'num_pockets': 4,
            'num_frags': 3,
            'num_arms': 2,
            'num_scaffold': 1,
            'pocket_occupancies_by_mol': [0.5, 0.4],
            'pocket_occupancies_by_submol': [0.5, 0.4],
        }
        meta_fn = os.path.join(pair_dir, f'mol{i}_meta.pkl')
        with open(meta_fn, 'wb') as f:
            pickle.dump({**item, 'data': r}, f)
        index.append({**item, 'data': {
            'protein_file': pocket_pdb,
            'ligand_file': ligand_sdf,
            'sub_pocket_files': sub_pockets,
            'sub_ligand_file': frags_sdf,
            'meta_file': meta_fn,
        }})
    for i in range(n_fail):
        index.append({'src_protein_filename': f'FAIL{i}/p.pdb',
                      'src_ligand_filename': f'FAIL{i}/l.sdf',
                      'data': 'al_fail'})
    with open(os.path.join(root, 'index.pkl'), 'wb') as f:
        pickle.dump(index, f)
    return index


def test_build_store_from_index_reference_tree(tmp_path):
    root = str(tmp_path / 'raw')
    _write_reference_tree(root, n_good=2, n_fail=1)
    store = build_store_from_index(root, str(tmp_path / 'imported.ddstore'))
    assert len(store) == 2  # failure entries skipped, not fatal
    rec = store[0]
    assert rec['src_ligand_filename'] == 'POCK0/mol0.sdf'
    # pocket mask from atom serials (PDB serials 1-based -> row indices)
    assert rec['pocket_atom_masks'].shape == (2, 8)
    np.testing.assert_array_equal(np.where(rec['pocket_atom_masks'][0])[0],
                                  [0, 1, 2])
    np.testing.assert_array_equal(np.where(rec['pocket_atom_masks'][1])[0],
                                  [3, 4])
    # arm ids 0..num_arms-1, scaffold (last submol) = -1
    np.testing.assert_array_equal(rec['ligand_atom_mask'],
                                  [0, 0, 1, 1, -1, -1])
    # golden prior baked in: per-arm centroid
    assert len(rec['arms_prior']) == 2 and len(rec['scaffold_prior']) == 1
    np.testing.assert_allclose(rec['arms_prior'][0][1],
                               rec['ligand_pos'][:2].mean(0), rtol=1e-5)
    # keyed by src_ligand_filename (ref name2id uses it minus extension)
    assert store.get_by_key('POCK0/mol0.sdf') is not None


def test_store_key_matches_reference_split_names(tmp_path):
    """ref get_decomp_dataset (:33-41) splits by split_by_name.pt entries of
    (protein_fn, ligand_fn) tuples, matching ligand_fn minus its 4-char
    extension; the store keys (src_ligand_filename) must resolve them."""
    root = str(tmp_path / 'raw')
    _write_reference_tree(root, n_good=2, n_fail=0)
    store = build_store_from_index(root, str(tmp_path / 's.ddstore'))
    ds = DecompDataset(store)
    # split entries are the raw (protein_fn, ligand_fn) pairs; resolution
    # strips n[1][:-4] and matches the extension-stripped store key
    got = ds.split_by_names(
        {'train': [('POCK0/prot0.pdb', 'POCK0/mol0.sdf')],
         'test': [('POCK1/prot1.pdb', 'POCK1/mol1.sdf')]})
    assert got['train'] == [0] and got['test'] == [1]


# ---------------------------------------------------------------------------
# reference LMDB import (mocked lmdb module; records are real torch tensors)
# ---------------------------------------------------------------------------

def _reference_lmdb_record(rng, n_prot=12, n_lig=6):
    """A record shaped like the reference's pickled `data.to_dict()`
    (ref pl_pair_dataset.py:158-176: ProteinLigandData keys + golden
    prior from compute_golden_prior_from_data, utils/prior.py:126-159)."""
    torch = pytest.importorskip('torch')
    pos_l = torch.tensor(rng.normal(size=(n_lig, 3)), dtype=torch.float32)
    pos_p = torch.tensor(rng.normal(size=(n_prot, 3)) * 4,
                         dtype=torch.float32)
    atom_mask = torch.tensor([0, 0, 1, 1, -1, -1])
    feat = torch.zeros((n_lig, 8), dtype=torch.long)
    feat[:3, 2] = 1  # column 2 = Aromatic family
    src = torch.arange(n_lig - 1)
    bond_index = torch.stack([torch.cat([src, src + 1]),
                              torch.cat([src + 1, src])])

    def prior_entry(sel):
        mu = pos_l[sel].mean(0)
        cov = ((pos_l[sel] - mu) ** 2).sum() / max(len(sel), 1) / 3
        return (len(sel), mu, cov, mu.clone(), torch.eye(3))

    record = {
        'protein_pos': pos_p,
        'protein_element': torch.tensor(
            rng.choice([6, 7, 8, 16], size=n_prot)),
        'protein_atom_to_aa_type': torch.tensor(
            rng.integers(0, 20, size=n_prot)),
        'protein_is_backbone': torch.tensor(
            rng.random(n_prot) < 0.4),
        'protein_atom_name': ['CA'] * n_prot,
        'ligand_pos': pos_l,
        'ligand_element': torch.tensor([6, 6, 7, 6, 8, 6]),
        'ligand_bond_index': bond_index,
        'ligand_bond_type': torch.ones(bond_index.shape[1],
                                       dtype=torch.long),
        'ligand_atom_feature': feat,
        'ligand_hybridization': ['SP2'] * n_lig,
        'ligand_nbh_list': {i: [j for j in (i - 1, i + 1)
                                if 0 <= j < n_lig] for i in range(n_lig)},
        'ligand_atom_mask': atom_mask,
        'pocket_atom_masks': torch.tensor(
            rng.random((2, n_prot)) < 0.4),
        'num_arms': 2,
        'num_scaffold': 1,
        'src_protein_filename': 'POCK/p.pdb',
        'src_ligand_filename': 'POCK/l.sdf',
        'arms_prior': [prior_entry([0, 1]), prior_entry([2, 3])],
        'scaffold_prior': [prior_entry([4, 5])],
        'pocket_prior_masks': torch.tensor(
            rng.random((3, n_prot)) < 0.5),
    }
    return record


class _FakeCursor:
    def __init__(self, items):
        self._items = items

    def __iter__(self):
        return iter(self._items)


class _FakeTxn:
    def __init__(self, items):
        self._items = items

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def cursor(self):
        return _FakeCursor(self._items)


class _FakeEnv:
    def __init__(self, items):
        self._items = items

    def begin(self, *a, **k):
        return _FakeTxn(self._items)

    def close(self):
        pass


def test_import_reference_lmdb_mocked(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    items = [(f'{i:08d}'.encode(),
              pickle.dumps(_reference_lmdb_record(rng)))
             for i in range(3)]

    import types
    fake = types.ModuleType('lmdb')
    fake.open = lambda *a, **k: _FakeEnv(items)
    monkeypatch.setitem(sys.modules, 'lmdb', fake)

    store = import_reference_lmdb('/nonexistent.lmdb',
                                  str(tmp_path / 'ref.ddstore'))
    assert len(store) == 3
    rec = store[0]
    assert rec['protein_pos'].dtype == np.float32
    assert rec['ligand_bond_index'].shape[0] == 2
    # aromatic derived from feature-matrix column 2
    np.testing.assert_array_equal(rec['ligand_atom_is_aromatic'],
                                  [True, True, True, False, False, False])
    # prior tuples detorchified
    num, mu, cov, amu, acov = rec['arms_prior'][0]
    assert isinstance(mu, np.ndarray) and mu.shape == (3,)
    assert rec['pocket_prior_masks'].shape == (3, 12)
    # the record must featurize + collate without touching torch again
    ds = DecompDataset(store)
    out = ds[0]
    batch = collate([out])
    assert bool(np.isfinite(np.asarray(batch.ligand_pos)).all())


def test_import_reference_data_cli(tmp_path):
    """scripts/import_reference_data.py --index + --split_pt end-to-end:
    the CLI writes the store and converts a torch split_by_name.pt into the
    pickle scripts/train.py consumes."""
    torch = pytest.importorskip('torch')
    root = str(tmp_path / 'raw')
    _write_reference_tree(root, n_good=2, n_fail=1)
    split_pt = str(tmp_path / 'split_by_name.pt')
    torch.save({'train': [('POCK0/prot0.pdb', 'POCK0/mol0.sdf')],
                'test': [('POCK1/prot1.pdb', 'POCK1/mol1.sdf')]}, split_pt)
    out = str(tmp_path / 'imported.ddstore')
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'scripts/import_reference_data.py'),
         '--index', root, '--out', out, '--split_pt', split_pt],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
    assert r.returncode == 0, r.stdout + r.stderr
    assert 'wrote 2 records' in r.stdout

    from decompdiff_tpu.data.store import DDStore
    ds = DecompDataset(DDStore(out))
    with open(str(tmp_path / 'imported_split.pkl'), 'rb') as f:
        split = pickle.load(f)
    got = ds.split_by_names(split)
    assert got['train'] == [0] and got['test'] == [1]


# ---------------------------------------------------------------------------
# convert_checkpoint.py on a real torch .pt file
# ---------------------------------------------------------------------------

def test_convert_checkpoint_script_on_torch_file(tmp_path):
    torch = pytest.importorskip('torch')
    from test_convert_checkpoint import (
        H, HEADS, LAYERS, make_reference_state_dict)
    from decompdiff_tpu.utils.testing import tiny_model_config

    sd_np = make_reference_state_dict(np.random.default_rng(1))
    sd_torch = {k: torch.tensor(np.asarray(v, np.float32))
                for k, v in sd_np.items()}
    cfg = tiny_model_config(num_layers=LAYERS, hidden_dim=H, n_heads=HEADS)
    ref_ckpt = {
        'config': {'model': cfg, 'train': {'seed': 2021}},
        'model': sd_torch,
        'optimizer': {'state': {}},
        'scheduler': {'factor': 0.6},
        'iteration': 4321,
    }
    pt_path = str(tmp_path / 'ref.pt')
    torch.save(ref_ckpt, pt_path)

    out_path = str(tmp_path / 'converted.ckpt')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts/convert_checkpoint.py'),
         pt_path, '--out', out_path],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
    assert r.returncode == 0, r.stdout + r.stderr
    with open(out_path, 'rb') as f:
        payload = pickle.load(f)
    assert payload['iteration'] == 4321
    assert payload['config']['model']['hidden_dim'] == H

    # the converted params must load and run in the flax model
    import jax.numpy as jnp
    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.utils.testing import random_complex_batch
    model = DecompDiffModel.create(payload['config']['model'], num_classes=8)
    batch = random_complex_batch(np.random.default_rng(0), batch_size=1,
                                 num_protein=12, num_ligand=5)
    preds = model.apply(jax.tree.map(jnp.asarray, payload['params']), batch,
                        batch.ligand_pos, batch.ligand_v, batch.bond_type,
                        jnp.asarray([3]))
    assert bool(np.isfinite(np.asarray(preds['pred_ligand_pos'])).all())


# ---------------------------------------------------------------------------
# end-to-end: reference meta tree -> store -> featurize -> collate -> loss
# ---------------------------------------------------------------------------

def test_reference_tree_to_diffusion_loss(tmp_path):
    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.utils.testing import tiny_model_config

    root = str(tmp_path / 'raw')
    _write_reference_tree(root, n_good=2, n_fail=0)
    store = build_store_from_index(root, str(tmp_path / 'e2e.ddstore'))
    ds = DecompDataset(store, prior_mode='ref_prior')
    batch = collate([ds[i] for i in range(len(ds))])

    cfg = tiny_model_config()
    model = DecompDiffModel.create(cfg, num_classes=8)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    out = model.get_diffusion_loss(params, jax.random.PRNGKey(1), batch)
    for k in ('pos', 'v', 'bond'):
        assert np.isfinite(float(out['losses'][k])), k
