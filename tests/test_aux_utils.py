"""Coverage for the small aux modules: misc, profiling, eval_arms, and the
two data-preparation CLIs (split_dataset, clean_crossdocked)."""

import gzip
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(cmd):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f'{cmd}\nSTDOUT:{r.stdout}\nSTDERR:{r.stderr}'
    return r


# ---------------------------------------------------------------- utils.misc

def test_black_hole_absorbs_everything():
    from decompdiff_tpu.utils.misc import BlackHole
    bh = BlackHole()
    bh.some_attr = 3          # swallowed
    assert bh.anything is bh
    assert bh('x', kw=1) is bh
    assert bh.a.b.c(1)(2) is bh


def test_get_new_log_dir_and_logger(tmp_path):
    from decompdiff_tpu.utils.misc import get_logger, get_new_log_dir
    d = get_new_log_dir(root=str(tmp_path), prefix='run', tag='t1')
    assert os.path.isdir(d)
    base = os.path.basename(d)
    assert base.startswith('run_') and base.endswith('_t1')
    logger = get_logger('test_aux_utils_logger', log_dir=d)
    logger.info('hello')
    # second call returns the same handler set (no duplicate handlers)
    assert get_logger('test_aux_utils_logger') is logger
    for h in logger.handlers:
        h.flush()
    assert 'hello' in open(os.path.join(d, 'log.txt')).read()


def test_snapshot_source_copies_package(tmp_path):
    """Run-dir reproducibility snapshot (ref train_diffusion_decomp.py:86-87
    copytree('./models')): the package source lands in <log_dir>/source and
    a failure (read-only target) degrades to a warning, not an abort."""
    from decompdiff_tpu.utils.misc import snapshot_source
    snapshot_source(str(tmp_path))
    dst = tmp_path / 'source' / 'decompdiff_tpu'
    assert (dst / 'utils' / 'misc.py').is_file()
    assert (dst / 'models').is_dir()
    assert not list(dst.rglob('__pycache__'))
    # best-effort contract: unwritable target must not raise
    snapshot_source('/proc/definitely-not-writable')


def test_seed_all_and_count_parameters():
    from decompdiff_tpu.utils.misc import count_parameters, seed_all
    seed_all(7)
    a = np.random.rand(3)
    seed_all(7)
    assert np.allclose(a, np.random.rand(3))
    params = {'w': np.zeros((4, 5)), 'nested': {'b': np.zeros(5)}}
    assert count_parameters(params) == 25


# ----------------------------------------------------------- utils.profiling

def test_timer_accumulates_phases():
    import time

    from decompdiff_tpu.utils.profiling import Timer
    t = Timer()
    for _ in range(3):
        with t.time('phase'):
            time.sleep(0.01)
    s = t.summary()
    assert s['phase']['count'] == 3
    assert s['phase']['total_s'] >= 0.03
    assert s['phase']['mean_ms'] >= 10


def test_trace_noop_without_logdir():
    from decompdiff_tpu.utils.profiling import trace
    with trace(None):
        pass
    with trace(''):
        pass


# ------------------------------------------------------- evaluation.eval_arms

def test_occupancy_from_alphas():
    from decompdiff_tpu.evaluation.eval_arms import (
        compute_occupancy, compute_occupancy_from_alphas)
    # 3 alpha centers: two in contact with the ligand atom, one far away
    centers = np.array([[0., 0., 0.], [1., 0., 0.], [50., 0., 0.]])
    spaces = np.array([2.0, 3.0, 5.0])
    lig = np.array([[0.5, 0., 0.]])
    occ = compute_occupancy_from_alphas(centers, spaces,
                                        pocket_nonpolar_space=10.0,
                                        ligand_pos=lig)
    assert occ == pytest.approx(0.5)   # (2 + 3) / 10

    class Alpha:
        def __init__(self, c, s):
            self.centroid = np.asarray(c)
            self.nonpolar_space = s

    class Pocket:
        alphas = [Alpha(c, s) for c, s in zip(centers, spaces)]
        nonpolar_space = 10.0

    assert compute_occupancy(Pocket(), lig) == pytest.approx(0.5)


def test_polar_ratio_from_elements():
    from decompdiff_tpu.evaluation.eval_arms import (
        compute_polar_ratio_from_elements)
    pocket = [6, 6, 7, 8]            # 2 polar of 4
    ligand = [6, 16, 0, 0]           # zeros are padding; 1 polar of 2
    pr, lr = compute_polar_ratio_from_elements(pocket, ligand)
    assert pr == pytest.approx(0.5)
    assert lr == pytest.approx(0.5)
    assert compute_polar_ratio_from_elements([], []) == (0.0, 0.0)


# ------------------------------------------------------ scripts/split_dataset

def _tiny_store(path, n=10):
    from decompdiff_tpu.data.store import DDStoreWriter
    with DDStoreWriter(str(path)) as w:
        for i in range(n):
            w.append(f'complex_{i}',
                     {'src_protein_filename': f'prot_{i % 3}.pdb', 'x': i})


def test_split_dataset_random(tmp_path):
    store = tmp_path / 's.ddstore'
    _tiny_store(store)
    run_script(['scripts/split_dataset.py', str(store),
                '--test_frac', '0.3', '--seed', '1'])
    split = pickle.load(open(tmp_path / 's_split.pkl', 'rb'))
    assert len(split['test']) == 3
    assert len(split['train']) == 7
    assert not set(split['train']) & set(split['test'])
    assert all(k.startswith('complex_') for k in split['train'])


def test_split_dataset_unique_pocket(tmp_path):
    store = tmp_path / 's.ddstore'
    _tiny_store(store)           # only 3 distinct protein files
    run_script(['scripts/split_dataset.py', str(store),
                '--test_frac', '0.9', '--seed', '1',
                '--unique_pocket_test'])
    split = pickle.load(open(tmp_path / 's_split.pkl', 'rb'))
    assert 1 <= len(split['test']) <= 3  # at most one per protein file


def test_split_dataset_by_names(tmp_path):
    store = tmp_path / 's.ddstore'
    _tiny_store(store)
    names = {'train': ['complex_0'], 'test': ['complex_1']}
    np_path = tmp_path / 'names.pkl'
    pickle.dump(names, open(np_path, 'wb'))
    out = tmp_path / 'out.pkl'
    run_script(['scripts/split_dataset.py', str(store), '--mode', 'by_names',
                '--names', str(np_path), '--out', str(out)])
    assert pickle.load(open(out, 'rb')) == names


# -------------------------------------------------- scripts/clean_crossdocked

def test_clean_crossdocked_extracts_selected_pose(tmp_path):
    from decompdiff_tpu.data.mol import (MolRecord, mol_to_sdf_block,
                                         parse_sdf_file)
    # a 3-pose sdf.gz: poses differ by a translated carbon pair
    poses = []
    for p in range(3):
        poses.append(MolRecord(
            element=np.array([6, 6]),
            pos=np.array([[0., 0., float(p)], [1.5, 0., float(p)]],
                         np.float32),
            bond_index=np.array([[0, 1], [1, 0]]),
            bond_type=np.array([1, 1]),
            aromatic=np.zeros(2, bool), name=f'pose{p}'))
    src = tmp_path / 'src'
    (src / 'POC').mkdir(parents=True)
    with gzip.open(src / 'POC' / 'lig_tt_docked.sdf.gz', 'wt') as f:
        f.write('$$$$\n'.join(mol_to_sdf_block(m) for m in poses) + '$$$$\n')

    types = tmp_path / 'it0.types'
    types.write_text(
        # label affinity rmsd receptor ligand_pose
        '1 -7.2 0.4 POC/rec.gninatypes POC/lig_tt_docked_1.sdf.gz\n'   # keep
        '1 -6.0 2.5 POC/rec.gninatypes POC/lig_tt_docked_0.sdf.gz\n'   # rmsd
        '1 -5.0 0.2 POC/rec.gninatypes POC/missing_3.sdf.gz\n'         # gone
        'garbage line\n')

    dest = tmp_path / 'dest'
    r = run_script(['scripts/clean_crossdocked.py', str(types),
                    '--source', str(src), '--dest', str(dest),
                    '--rmsd_thr', '1.0'])
    assert 'kept 1 poses (skipped 1)' in r.stdout
    index = pickle.load(open(dest / 'index.pkl', 'rb'))
    assert index == [{'protein': 'POC/rec.pdb',
                      'ligand': 'POC/lig_tt_docked_1.sdf',
                      'rmsd': 0.4}]
    got = parse_sdf_file(str(dest / 'POC' / 'lig_tt_docked_1.sdf'))
    assert np.allclose(got.pos[:, 2], 1.0)   # pose index 1, not 0 or 2


# ----------------------------------------------------------------- config

def test_config_to_dict_recurses_nested_lists(tmp_path):
    """to_dict must unwrap Config objects at ANY list nesting depth
    (round-3 review: a dict two list levels down stayed a Config and
    yaml.safe_dump raised RepresenterError in save_config)."""
    import yaml

    from decompdiff_tpu.config import Config, save_config
    cfg = Config({'deep': [[{'y': 2}]], 'flat': [1, 2],
                  'sub': {'tables': [[{'bins': [0.1]}], 'x']}})
    d = cfg.to_dict()
    assert d['deep'][0][0] == {'y': 2}
    assert type(d['deep'][0][0]) is dict
    assert type(d['sub']['tables'][0][0]) is dict
    out = tmp_path / 'c.yml'
    save_config(cfg, str(out))   # must not raise RepresenterError
    assert yaml.safe_load(open(out))['deep'][0][0]['y'] == 2


def test_polar_ratio_pocket_front():
    from decompdiff_tpu.evaluation.eval_arms import compute_polar_ratio

    receptor = np.array([6, 7, 8, 6, 16, 6])

    class FirstParty:                 # AlphaPocket-style attribute
        lining_atom_idx = np.array([1, 2, 3])

    pr, lr = compute_polar_ratio(receptor, FirstParty(), [6, 7])
    assert pr == pytest.approx(2 / 3)
    assert lr == pytest.approx(0.5)

    class AlphaSpace2:                # alphaspace2-style attribute
        lining_atoms_idx = np.array([0, 4])

    pr2, _ = compute_polar_ratio(receptor, AlphaSpace2(), [6])
    assert pr2 == pytest.approx(0.5)  # S polar, C not (ref eval_arms.py:20-24)


def test_set_dihedral_on_point_cloud():
    import numpy as np
    from decompdiff_tpu.utils.geometry import (
        dihedral_from_four_points, set_dihedral_on_point_cloud)
    rng = np.random.default_rng(3)
    pos = rng.normal(size=(6, 3)) * 2.0
    idx = (0, 1, 2, 3)
    for target in (0.5, -2.0, 3.0):
        out = np.asarray(set_dihedral_on_point_cloud(pos, idx, target,
                                                     moving_idx=[3, 4]))
        got = float(dihedral_from_four_points(out[0], out[1], out[2], out[3]))
        assert abs(((got - target) + np.pi) % (2 * np.pi) - np.pi) < 1e-5
        # non-moving atoms stay put; moved atoms keep their distance to k
        np.testing.assert_allclose(out[[0, 1, 2, 5]], pos[[0, 1, 2, 5]],
                                   atol=1e-7)
        np.testing.assert_allclose(
            np.linalg.norm(out[[3, 4]] - out[2], axis=-1),
            np.linalg.norm(pos[[3, 4]] - pos[2], axis=-1), atol=1e-5)
