"""Docking/evaluation protocol tests with mocked Vina/meeko/subprocess —
VERDICT.md round-1 items 2 (vina protocol + HA/SR) and 8 (QVina pipeline).

No vina/meeko/rdkit/qvina2 needed: the python vina module is faked via
sys.modules, the subprocess pipeline is monkeypatched, and the end-to-end
driver runs on a synthetic result pickle with MolRecord molecules.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest

from decompdiff_tpu.data.mol import MolRecord
from decompdiff_tpu.evaluation import docking, protocol


def _mol_record(rng, n=6):
    pos = rng.normal(size=(n, 3)).astype(np.float32) * 2
    src, dst, bt = [], [], []
    for i in range(n - 1):
        src += [i, i + 1]
        dst += [i + 1, i]
        bt += [1, 1]
    return MolRecord(element=np.full(n, 6), pos=pos,
                     bond_index=np.array([src, dst]),
                     bond_type=np.array(bt), aromatic=np.zeros(n, bool))


# ---------------------------------------------------------------------------
# box geometry (center / size_factor honored; ref docking_vina.py:193-202)
# ---------------------------------------------------------------------------

def test_compute_box_defaults():
    pos = np.array([[0., 0, 0], [4, 2, 6]])
    center, size = docking.compute_box(pos)
    assert center == [2.0, 1.0, 3.0]
    assert size == [9.0, 7.0, 11.0]  # extent * 1.0 + 5


def test_compute_box_overrides():
    pos = np.array([[0., 0, 0], [4, 2, 6]])
    center, size = docking.compute_box(pos, center=[1, 1, 1],
                                       size_factor=2.0, buffer=1.0)
    assert center == [1.0, 1.0, 1.0]
    assert size == [9.0, 5.0, 13.0]
    _, size20 = docking.compute_box(pos, size_factor=None)
    assert size20 == [20.0, 20.0, 20.0]


def test_vina_task_honors_center_and_size_factor(tmp_path):
    mol = _mol_record(np.random.default_rng(0))
    task = docking.VinaDockingTask(mol, protein_path=str(tmp_path / 'p.pdb'),
                                   center=[3, 3, 3], size_factor=None)
    assert task.center == [3.0, 3.0, 3.0]
    assert task.box_size == [20.0, 20.0, 20.0]


def test_vina_task_requires_protein_path():
    mol = _mol_record(np.random.default_rng(0))
    with pytest.raises(ValueError, match='protein_path'):
        docking.VinaDockingTask(mol, protein_path=None)


def test_from_generated_mol_protein_path():
    mol = _mol_record(np.random.default_rng(0))
    task = docking.VinaDockingTask.from_generated_mol(
        mol, 'ABCD_EFGH/1abc_A_rec_xyz_lig.sdf', protein_root='/data/test')
    assert task.protein_path == '/data/test/ABCD_EFGH/1abc_A_rec.pdb'


# ---------------------------------------------------------------------------
# VinaDockingTask.run with a fake vina module + stubbed prep
# ---------------------------------------------------------------------------

class _FakeVina:
    SCORES = {'score_only': -4.5, 'minimize': -6.0, 'dock': -8.5}

    def __init__(self, sf_name='vina', seed=0, verbosity=0):
        self.mode = None

    def set_receptor(self, p):
        self.receptor = p

    def set_ligand_from_file(self, p):
        self.ligand = p

    def compute_vina_maps(self, center, box_size):
        self.center, self.box_size = center, box_size

    def score(self):
        return [self.SCORES['score_only']]

    def optimize(self):
        return [self.SCORES['minimize']]

    def dock(self, exhaustiveness=8, n_poses=1):
        pass

    def energies(self, n_poses=1):
        return [[self.SCORES['dock']]]

    def poses(self, n_poses=1):
        return 'POSE'

    def write_pose(self, path, overwrite=True):
        with open(path, 'w') as f:
            f.write('MINPOSE')


@pytest.fixture
def fake_vina_env(monkeypatch, tmp_path):
    monkeypatch.setitem(sys.modules, 'vina',
                        types.SimpleNamespace(Vina=_FakeVina))
    monkeypatch.setattr(docking, 'PrepLig',
                        lambda sdf, fmt: types.SimpleNamespace(
                            get_pdbqt=lambda out: open(out, 'w').write('LIG')))
    monkeypatch.setattr(docking.PrepProt, 'addH',
                        lambda self, pqr: open(pqr, 'w').write('PQR'))
    monkeypatch.setattr(docking.PrepProt, 'get_pdbqt',
                        lambda self, out: open(out, 'w').write('PROT'))
    prot = tmp_path / 'prot.pdb'
    prot.write_text('ATOM      1  N   ALA A   1      0.000   0.000   0.000\n')
    return str(prot)


def test_vina_task_run_modes(fake_vina_env, tmp_path):
    mol = _mol_record(np.random.default_rng(1))
    task = docking.VinaDockingTask(mol, protein_path=fake_vina_env,
                                   tmp_dir=str(tmp_path))
    assert task.run(mode='score_only') == [{'affinity': -4.5, 'pose': None}]
    assert task.run(mode='minimize')[0]['affinity'] == -6.0
    r = task.run(mode='dock')
    assert r == [{'affinity': -8.5, 'pose': 'POSE'}]


def test_receptor_prep_thread_safe(fake_vina_env, tmp_path, monkeypatch):
    """Concurrent docking tasks on one receptor (the evaluate driver's
    --num_workers pool) must serialize the cached PDBQT prep: the old
    pid-only scratch suffix was shared by every pool thread, so one
    os.replace consumed the tmp file and the losers raised ENOENT, silently
    dropping their samples from the evaluation (regression, b4296c0)."""
    import threading
    import time
    from concurrent.futures import ThreadPoolExecutor

    start = threading.Barrier(4)
    prep_calls = []

    def slow_get_pdbqt(self, out):
        prep_calls.append(out)
        time.sleep(0.05)  # widen the replace/unlink race window
        open(out, 'w').write('PROT')

    monkeypatch.setattr(docking.PrepProt, 'get_pdbqt', slow_get_pdbqt)

    mol = _mol_record(np.random.default_rng(1))

    def dock_one(_):
        start.wait()
        task = docking.VinaDockingTask(mol, protein_path=fake_vina_env,
                                       tmp_dir=str(tmp_path))
        return task._receptor_pdbqt()

    with ThreadPoolExecutor(4) as pool:
        paths = list(pool.map(dock_one, range(4)))
    assert len(set(paths)) == 1 and os.path.exists(paths[0])
    # the lock also deduplicates the expensive prep: exactly one call
    assert len(prep_calls) == 1


def test_run_docking_mode_dispatch(fake_vina_env, tmp_path):
    mol = _mol_record(np.random.default_rng(1))
    kw = dict(protein_path=fake_vina_env, tmp_dir=str(tmp_path))
    r = protocol.run_docking(mol, 'vina_score', **kw)
    assert set(r) == {'score_only', 'minimize'}
    r = protocol.run_docking(mol, 'vina_full', **kw)
    assert set(r) == {'score_only', 'minimize', 'dock'}
    assert protocol.dock_affinity(r, 'vina_full') == -8.5
    r = protocol.run_docking(mol, 'vina', **kw)
    assert protocol.dock_affinity(r, 'vina') == -8.5
    assert protocol.run_docking(mol, 'none', **kw) is None


# ---------------------------------------------------------------------------
# aggregates: Vina Score/Min/Dock + High Affinity + Success Rate
# ---------------------------------------------------------------------------

def test_aggregate_vina_full():
    rows = [{'score_only': [{'affinity': -4.0}],
             'minimize': [{'affinity': -5.0}],
             'dock': [{'affinity': -7.0}]},
            {'score_only': [{'affinity': -6.0}],
             'minimize': [{'affinity': -7.0}],
             'dock': [{'affinity': -9.0}]}]
    m = protocol.aggregate_vina(rows, 'vina_full')
    assert m['vina_score_mean'] == -5.0
    assert m['vina_min_median'] == -6.0
    assert m['vina_dock_mean'] == -8.0


def test_aggregate_vina_dock_only():
    rows = [[{'affinity': -7.0}], [{'affinity': -9.0}]]
    m = protocol.aggregate_vina(rows, 'qvina')
    assert m == {'vina_dock_mean': -8.0, 'vina_dock_median': -8.0}


def test_success_rate():
    chem = [{'qed': 0.5, 'sa': 0.7}, {'qed': 0.5, 'sa': 0.7},
            {'qed': 0.1, 'sa': 0.7}, None]
    dock = [-9.0, -5.0, -9.0, -9.0]
    # only sample 0 passes all three thresholds; denominator = 4
    assert protocol.success_rate(chem, dock) == 0.25
    assert protocol.success_rate([None, None], [None, -9.0]) is None


def test_high_affinity():
    assert protocol.high_affinity([-9.0, -7.0, None], -8.0) == 0.5
    assert protocol.high_affinity([-9.0], None) is None


# ---------------------------------------------------------------------------
# QVina subprocess pipeline (ref utils/evaluation/docking.py:56-183)
# ---------------------------------------------------------------------------

QVINA_SDF = """pose1
 OpenBabel

  1  0  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
M  END
> <REMARK>
VINA RESULT:    -7.3      0.000      0.000

$$$$
pose2
 OpenBabel

  1  0  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
M  END
> <REMARK>
VINA RESULT:    -6.1      1.200      2.300

$$$$
"""


def test_parse_qvina_outputs(tmp_path):
    p = tmp_path / 'out.sdf'
    p.write_text(QVINA_SDF)
    results = docking.parse_qvina_outputs(str(p))
    assert len(results) == 2
    assert results[0]['affinity'] == -7.3
    assert results[1] == {'mode_id': 1, 'affinity': -6.1,
                          'rmsd_lb': 1.2, 'rmsd_ub': 2.3}


def test_qvina_commands_content(tmp_path):
    mol = _mol_record(np.random.default_rng(2))
    prot = tmp_path / 'p.pdb'
    prot.write_text('ATOM\n')
    task = docking.QVinaDockingTask(mol, str(prot), tmp_dir=str(tmp_path),
                                    center=[1, 2, 3])
    cmd = task.commands(exhaustiveness=16)
    assert 'prepare_receptor4.py' in cmd and 'obabel' in cmd
    assert '--center_x 1.0000' in cmd and '--exhaustiveness 16' in cmd
    assert f'--receptor {task.receptor_id}.pdbqt' in cmd


def test_qvina_run_sync_mocked(tmp_path, monkeypatch):
    mol = _mol_record(np.random.default_rng(2))
    prot = tmp_path / 'p.pdb'
    prot.write_text('ATOM      1  N   ALA A   1      0.000   0.000   0.000\n')
    task = docking.QVinaDockingTask(mol, str(prot), tmp_dir=str(tmp_path))
    monkeypatch.setattr(docking, '_have', lambda cmd: True)

    def fake_run(cmd, input=None, capture_output=True):
        # "qvina2 ran": write the converted output SDF the pipeline expects
        with open(task.docked_sdf_path, 'w') as f:
            f.write(QVINA_SDF)
        return types.SimpleNamespace(stdout=b'ok', stderr=b'')

    monkeypatch.setattr(docking.subprocess, 'run', fake_run)
    results = task.run_sync()
    assert results[0]['affinity'] == -7.3
    # inputs were prepared on disk
    assert os.path.exists(os.path.join(str(tmp_path),
                                       task.receptor_id + '.pdb'))
    assert os.path.exists(os.path.join(str(tmp_path),
                                       task.ligand_id + '.sdf'))


def test_qvina_missing_tools_raises(monkeypatch, tmp_path):
    mol = _mol_record(np.random.default_rng(2))
    prot = tmp_path / 'p.pdb'
    prot.write_text('ATOM\n')
    monkeypatch.setattr(docking, '_have', lambda cmd: False)
    task = docking.QVinaDockingTask(mol, str(prot), tmp_dir=str(tmp_path))
    with pytest.raises(FileNotFoundError, match='qvina pipeline tools'):
        task.run_sync()


# ---------------------------------------------------------------------------
# end-to-end driver: synthetic result pickle -> Score/Min/Dock/HA/SR numbers
# ---------------------------------------------------------------------------

def test_evaluate_driver_vina_full(tmp_path, monkeypatch, fake_vina_env):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), 'scripts'))
    import evaluate as evaluate_mod

    rng = np.random.default_rng(3)
    results = []
    for _ in range(4):
        mol = _mol_record(rng)
        results.append({
            'mol': mol, 'complete': True,
            'pred_pos': np.asarray(mol.pos),
            'pred_v': np.zeros(mol.num_atoms, np.int64),
            'ligand_filename': 'POCKET/1abc_A_rec_lig.sdf',
            'protein_path': fake_vina_env,
        })
    outdir = tmp_path / 'out'
    outdir.mkdir()
    with open(outdir / 'result_0.pkl', 'wb') as f:
        pickle.dump({'results': results, 'atom_mode': 'basic'}, f)

    # reference-ligand dock value for High Affinity
    with open(tmp_path / 'ref_vina.pkl', 'wb') as f:
        pickle.dump({'POCKET/1abc_A_rec_lig.sdf': -8.0}, f)

    # fake chem so Success Rate is computable without RDKit
    from decompdiff_tpu.evaluation import scoring
    monkeypatch.setattr(scoring, 'can_score', lambda mol: True)
    monkeypatch.setattr(scoring, 'get_chem',
                        lambda mol: {'qed': 0.5, 'sa': 0.7, 'logp': 1.0,
                                     'lipinski': 5})

    summary = evaluate_mod.main([
        str(outdir), '--docking_mode', 'vina_full',
        '--ref_vina_pkl', str(tmp_path / 'ref_vina.pkl'),
        '--tmp_dir', str(tmp_path)])

    assert summary['n_dock_success'] == 4
    m = summary['vina_metrics']
    assert m['vina_score_mean'] == -4.5
    assert m['vina_min_mean'] == -6.0
    assert m['vina_dock_mean'] == -8.5
    # every dock (-8.5) beats the reference (-8.0)
    assert summary['high_affinity'] == 1.0
    # QED 0.5 > 0.25, SA 0.7 > 0.59, dock -8.5 < -8.18 for all 4
    assert summary['success_rate'] == 1.0

    # a serial pool gives identical numbers (ordered executor.map keeps
    # per-sample alignment regardless of --num_workers; ref :138)
    serial = evaluate_mod.main([
        str(outdir), '--docking_mode', 'vina_full', '--num_workers', '1',
        '--ref_vina_pkl', str(tmp_path / 'ref_vina.pkl'),
        '--tmp_dir', str(tmp_path)])
    assert serial['vina_metrics'] == summary['vina_metrics']
    assert serial['high_affinity'] == summary['high_affinity']
    assert serial['success_rate'] == summary['success_rate']

    # -n caps the evaluated set (ref evaluate_mol_from_meta_full.py:132)
    capped = evaluate_mod.main([
        str(outdir), '--docking_mode', 'vina_full', '-n', '2',
        '--result_path', str(tmp_path / 'alt_summary.pkl'),
        '--tmp_dir', str(tmp_path)])
    assert capped['n_total'] == 2 and capped['n_dock_success'] == 2
    assert (tmp_path / 'alt_summary.pkl').is_file()


def test_evaluate_driver_filters_incomplete_and_failed(
        tmp_path, monkeypatch, fake_vina_env):
    """The reference protocol excludes disconnected molecules and samples
    whose chem scoring fails from EVERY statistic (ref
    evaluate_mol_from_meta_full.py:73-108); round-3 review regression."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), 'scripts'))
    import evaluate as evaluate_mod

    rng = np.random.default_rng(4)
    results = []
    for i in range(4):
        mol = _mol_record(rng)
        results.append({
            'mol': mol,
            'complete': i != 1,          # sample 1 is disconnected
            'pred_pos': np.asarray(mol.pos),
            'pred_v': np.zeros(mol.num_atoms, np.int64),
            'ligand_filename': 'POCKET/1abc_A_rec_lig.sdf',
            'protein_path': fake_vina_env,
        })
    # sample 2's chem scoring raises (flag survives pickling on the mol)
    results[2]['mol'].props['chem_poison'] = True
    outdir = tmp_path / 'out'
    outdir.mkdir()
    with open(outdir / 'result_0.pkl', 'wb') as f:
        pickle.dump({'results': results, 'atom_mode': 'basic'}, f)

    from decompdiff_tpu.evaluation import scoring
    monkeypatch.setattr(scoring, 'can_score', lambda mol: True)

    def fake_chem(mol):
        if getattr(mol, 'props', {}).get('chem_poison'):
            raise RuntimeError('sanitize failed')
        return {'qed': 0.5, 'sa': 0.7, 'logp': 1.0, 'lipinski': 5}

    monkeypatch.setattr(scoring, 'get_chem', fake_chem)

    summary = evaluate_mod.main([
        str(outdir), '--docking_mode', 'vina_full',
        '--tmp_dir', str(tmp_path)])

    # only samples 0 and 3 survive: 1 is incomplete, 2 failed chem
    assert summary['n_recon'] == 4
    assert summary['n_complete'] == 3
    assert summary['n_dock_success'] == 2
    assert len(summary['chem']) == 2
    assert len(summary['vina']) == 2
