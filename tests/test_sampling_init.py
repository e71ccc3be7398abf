"""Generation initialization across prior modes and atom-count modes
(ref scripts/sample_diffusion_decomp.py:56-316 behavior matrix)."""

import numpy as np
import pytest

from decompdiff_tpu.data.collate import collate
from decompdiff_tpu.priors.atom_num import (
    get_space_size, load_num_config, sample_atom_num)
from decompdiff_tpu.priors.beta import (
    apply_num_atoms_change, apply_std_coef, substitute_with_given_prior)
from decompdiff_tpu.sampling.init import (
    build_generation_records, init_types_host)
from tests.test_data_layer import _raw_sample


@pytest.fixture()
def raw():
    return _raw_sample(np.random.default_rng(0), n_prot=40, n_lig=12,
                       num_arms=2)


def test_ref_prior_counts_match_reference_ligand(raw):
    rng = np.random.default_rng(1)
    recs = build_generation_records(raw, 3, 'ref_prior', 'ref', rng)
    assert len(recs) == 3
    ref_mask = np.asarray(raw['ligand_atom_mask'])
    for r in recs:
        # per-part atom counts equal the reference ligand's
        for a in range(raw['num_arms']):
            assert (r['ligand_decomp_idx'] == a).sum() == (ref_mask == a).sum()
        assert r['prior_num_atoms'].sum() == len(ref_mask)
        # init positions concentrated near prior centers
        assert np.isfinite(r['ligand_pos']).all()


def test_subpocket_prior_mode(raw):
    rng = np.random.default_rng(2)
    recs = build_generation_records(
        raw, 2, 'subpocket', 'prior', rng,
        arms_natoms_config=load_num_config('arm_num_config'),
        scaffold_natoms_config=load_num_config('scaffold_num_config'))
    for r in recs:
        assert r['num_arms'] == raw['num_arms']
        assert len(r['ligand_pos']) == r['prior_num_atoms'].sum()
        np.testing.assert_allclose(r['prior_stds'], 1.0)  # subpocket: std 1


def test_subpocket_ref_large(raw):
    rng = np.random.default_rng(3)
    recs = build_generation_records(raw, 1, 'subpocket', 'ref_large', rng)
    ref_n = len(raw['ligand_atom_mask'])
    assert len(recs[0]['ligand_pos']) > ref_n  # inflated counts


def test_beta_prior_old_and_v2(raw):
    import copy
    prior_dict = {
        'arms_prior': [(5, np.zeros(3), np.eye(3) * 1.2, None, None),
                       (4, np.ones(3), np.eye(3) * 0.9, None, None)],
        'scaffold_prior': [(6, np.ones(3) * 2, np.eye(3) * 1.5, None, None)],
    }
    s = substitute_with_given_prior(copy.deepcopy(raw), prior_dict)
    assert s['num_arms'] == 2
    assert s['pocket_atom_masks'].shape[0] == 2

    rng = np.random.default_rng(4)
    recs_v2 = build_generation_records(s, 1, 'beta_prior', 'v2', rng)
    assert len(recs_v2[0]['ligand_pos']) == 5 + 4 + 6

    recs_old = build_generation_records(s, 1, 'beta_prior', 'old', rng)
    n = len(recs_old[0]['ligand_pos'])
    assert n >= 2 * 3  # each part floored at 2 atoms

    # prior editing
    s2 = apply_std_coef(copy.deepcopy(s), 2.0)
    assert np.allclose(np.asarray(s2['arms_prior'][0][2]),
                       np.asarray(s['arms_prior'][0][2]) * 4.0)
    s3 = apply_num_atoms_change(copy.deepcopy(s), -10)
    assert s3['arms_prior'][0][0] == 1  # floored at 1


def test_init_types_and_collate(raw):
    rng = np.random.default_rng(5)
    recs = build_generation_records(raw, 4, 'ref_prior', 'ref', rng)
    recs = init_types_host(rng, recs, num_classes=8, num_bond_classes=5)
    for r in recs:
        assert r['ligand_v'].max() < 8
        assert np.all(np.diagonal(r['bond_type']) == 0)
    batch = collate(recs)
    assert batch.batch_size == 4
    # marginal-prob variant
    probs = np.array([0., 0.7, 0.1, 0.1, 0.05, 0.02, 0.02, 0.01])
    recs = init_types_host(rng, recs, 8, 5, atom_prior_probs=probs)
    assert all((r['ligand_v'] != 0).all() for r in recs)


def test_atom_num_tables():
    cfg = load_num_config('atom_num_config')
    assert 'bounds' in cfg and 'bins' in cfg
    rng = np.random.default_rng(6)
    pos = rng.normal(size=(50, 3)) * 5
    size = get_space_size(pos)
    assert size > 0
    n = sample_atom_num(size, cfg, rng)
    assert isinstance(n, int) and n > 0
