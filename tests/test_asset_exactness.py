"""Exactness of the extracted JSON data assets vs the live reference tables
(VERDICT.md round-1 item 9). The reference files are importable python /
pickle data; these tests fail if any extracted histogram drifts.

Skipped when /root/reference is not present (the assets remain the committed
source of truth)."""

import gzip
import importlib.util
import json
import os
import pickle

import numpy as np
import pytest

REF = '/root/reference'
ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'decompdiff_tpu', 'evaluation', 'assets')

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason='reference repo not available')


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def ref_bond_cfg():
    return _load_ref_module(
        'ref_eval_bond_length_config',
        os.path.join(REF, 'utils/evaluation/eval_bond_length_config.py'))


def test_bond_distance_bins_exact(ref_bond_cfg):
    with open(os.path.join(ASSETS, 'crossdocked_distributions.json')) as f:
        asset = json.load(f)
    np.testing.assert_allclose(asset['distance_bins'],
                               np.asarray(ref_bond_cfg.DISTANCE_BINS),
                               rtol=0, atol=0)


def test_bond_distributions_exact(ref_bond_cfg):
    with open(os.path.join(ASSETS, 'crossdocked_distributions.json')) as f:
        asset = json.load(f)
    ref = ref_bond_cfg.EMPIRICAL_DISTRIBUTIONS
    assert len(asset['bond_distributions']) == len(ref)
    for (z1, z2, bt), values in ref.items():
        key = f'{z1}-{z2}|{bt}'
        assert key in asset['bond_distributions'], key
        np.testing.assert_array_equal(asset['bond_distributions'][key],
                                      values, err_msg=key)


def test_pair_distributions_exact(ref_bond_cfg):
    with open(os.path.join(ASSETS, 'crossdocked_distributions.json')) as f:
        asset = json.load(f)
    for key, values in ref_bond_cfg.PAIR_EMPIRICAL_DISTRIBUTIONS.items():
        np.testing.assert_array_equal(asset['pair_distributions'][key],
                                      values, err_msg=key)
    for key, bins in ref_bond_cfg.PAIR_EMPIRICAL_BINS.items():
        np.testing.assert_allclose(asset['pair_bins'][key],
                                   np.asarray(bins), err_msg=key)


def test_atom_num_config_exact():
    ref = _load_ref_module(
        'ref_atom_num_config',
        os.path.join(REF, 'utils/evaluation/atom_num_config.py')).CONFIG
    with open(os.path.join(ASSETS, 'atom_num_config.json')) as f:
        asset = json.load(f)
    np.testing.assert_allclose(asset['bounds'], ref['bounds'])
    assert len(asset['bins']) == len(ref['bins'])
    for a, r in zip(asset['bins'], ref['bins']):
        np.testing.assert_array_equal(a, r)


@pytest.mark.parametrize('name', ['arm_num_config', 'scaffold_num_config'])
def test_arm_scaffold_num_configs_exact(name):
    with open(os.path.join(REF, f'utils/evaluation/{name}.pkl'), 'rb') as f:
        ref = pickle.load(f)
    with open(os.path.join(ASSETS, f'{name}.json')) as f:
        asset = json.load(f)
    np.testing.assert_allclose(asset['bounds'], ref['bounds'])
    assert len(asset['bins']) == len(ref['bins'])
    for a, r in zip(asset['bins'], ref['bins']):
        np.testing.assert_array_equal(a, r)


def test_fpscores_identical():
    ours = os.path.join(ASSETS, 'fpscores.pkl.gz')
    theirs = os.path.join(REF, 'utils/evaluation/fpscores.pkl.gz')
    with gzip.open(ours) as f1, gzip.open(theirs) as f2:
        d1, d2 = pickle.load(f1), pickle.load(f2)
    assert len(d1) == len(d2)
    for a, b in zip(d1[:50] + d1[-50:], d2[:50] + d2[-50:]):
        assert list(a) == list(b)


def test_atom_type_marginal_exact():
    """Atom-type JSD marginal vs ref utils/evaluation/eval_atom_type.py."""
    ref = _load_ref_module(
        'ref_eval_atom_type',
        os.path.join(REF, 'utils/evaluation/eval_atom_type.py'))
    from decompdiff_tpu.evaluation import eval_atom_type
    ours = eval_atom_type.ATOM_TYPE_DISTRIBUTION
    theirs = ref.ATOM_TYPE_DISTRIBUTION
    assert dict(ours) == dict(theirs)
