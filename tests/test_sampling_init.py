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


def test_sample_atom_num_bins_with_global_bounds():
    """The reference quirk (ref utils/evaluation/atom_num.py:19-31):
    _get_bin_idx always bins with the GLOBAL atom-config bounds, even for
    the arm/scaffold override configs — binning with the override's own
    bounds would push every whole-pocket space size (~26-35 A) past the
    scaffold table's 10.4 A top bound into the last bin."""
    from decompdiff_tpu.priors.atom_num import DEFAULT_CONFIG
    gb = DEFAULT_CONFIG['bounds']
    # override config with distinct singleton bins AND decoy bounds that
    # would bin everything into the last bin if (wrongly) used
    cfg = {'bounds': [0.1] * len(gb),
           'bins': [([100 + i], [1.0]) for i in range(len(gb) + 1)]}
    rng = np.random.default_rng(0)
    # below the global lower bound -> bin 0
    assert sample_atom_num(gb[0] - 1.0, cfg, rng) == 100
    # between global bounds 3 and 4 -> bin 4
    mid = 0.5 * (gb[3] + gb[4])
    assert sample_atom_num(mid, cfg, rng) == 104
    # above the global top bound -> last bin
    assert sample_atom_num(gb[-1] + 1.0, cfg, rng) == 100 + len(gb)


def test_scaffold_std_version_split(raw):
    """A 1-atom scaffold prior with cov > min_std^2: ref_prior pins the std
    to min_std (ref utils/transforms.py:227-229) while beta_prior always
    uses clamp(sqrt(cov), min_std) with no atom-count check (ref :232-240)."""
    from decompdiff_tpu.data.transforms import compute_noise_dist
    mu = np.zeros(3, np.float32)
    raw = dict(raw)
    raw['scaffold_prior'] = [(1, mu, np.eye(3) * 1.44, None, None)]
    nd_ref = compute_noise_dist(raw, 'ref_prior')
    nd_beta = compute_noise_dist(raw, 'beta_prior')
    np.testing.assert_allclose(nd_ref['stds'][-1], 0.6)
    np.testing.assert_allclose(nd_beta['stds'][-1], 1.2)
    # and a scalar covariance (beta priors store scalars, ref :236-239)
    raw['scaffold_prior'] = [(1, mu, np.float64(1.44), None, None)]
    nd_beta2 = compute_noise_dist(raw, 'beta_prior')
    np.testing.assert_allclose(nd_beta2['stds'][-1], 1.2)


def test_stat_mode_without_scaffold_prior_zero_std(raw):
    """beta_prior 'stat' REPLACES the transform's std table with the sampled
    stds; the scaffold row is 0 when there is no scaffold prior (ref
    sample_diffusion_decomp.py:229-230,320-321)."""
    from decompdiff_tpu.sampling.init import _sample_part_atom_counts

    class FakeSampler:
        def sample_arm_natoms(self, centers, protein_pos, rng=None):
            n = len(centers)
            return [3] * n, np.full((n, 3), 0.7, np.float32)

        def sample_sca_natoms(self, *a, **k):
            raise AssertionError('must not be called without scaffold prior')

    raw = dict(raw)
    raw['scaffold_prior'] = []
    raw['num_scaffold'] = 0
    rng = np.random.default_rng(1)
    arm_counts, sca_count, centers, stds = _sample_part_atom_counts(
        raw, 'beta_prior', 'stat', rng, natoms_sampler=FakeSampler())
    assert sca_count == 0
    assert arm_counts == [3, 3]
    np.testing.assert_allclose(stds[:2], 0.7)
    np.testing.assert_allclose(stds[-1], 0.0)


def test_stat_mode_with_real_sklearn_pickle(raw, tmp_path):
    """Dress rehearsal for the released natom_models.pkl: REAL sklearn
    regressors pickled in the exact reference dict schema (ref
    utils/prior.py:162-208 — keys arm_model/armstd_model/sca_model/
    scastd_model, radial-count features over np.linspace(1, 10, 50)),
    loaded via NumAtomsSampler.from_pickle and driven through the
    beta_prior/'stat' generation init."""
    import pickle

    sklearn = pytest.importorskip('sklearn')
    from sklearn.ensemble import GradientBoostingRegressor
    from sklearn.linear_model import LinearRegression

    from decompdiff_tpu.priors.atom_num import NumAtomsSampler

    gen = np.random.default_rng(0)
    x_arm = gen.integers(0, 60, (60, 50)).astype(float)
    arm = GradientBoostingRegressor(
        n_estimators=5, max_depth=2, random_state=0).fit(
        x_arm, 5.0 + x_arm.mean(1) / 10.0)
    x_std = gen.integers(2, 20, (30, 1)).astype(float)
    armstd = LinearRegression().fit(x_std, 0.05 * x_std[:, 0] + 0.5)
    x_sca = np.concatenate(
        [gen.integers(0, 60, (60, 50)), gen.normal(size=(60, 1))], axis=1)
    sca = GradientBoostingRegressor(
        n_estimators=5, max_depth=2, random_state=1).fit(
        x_sca, 7.0 + x_sca[:, :50].mean(1) / 10.0)
    scastd = LinearRegression().fit(x_std, 0.03 * x_std[:, 0] + 0.4)

    pkl = tmp_path / 'natom_models.pkl'
    pkl.write_bytes(pickle.dumps({
        'arm_model': arm, 'armstd_model': armstd,
        'sca_model': sca, 'scastd_model': scastd}))
    sampler = NumAtomsSampler.from_pickle(str(pkl))

    rng = np.random.default_rng(7)
    recs = build_generation_records(raw, 2, 'beta_prior', 'stat', rng,
                                    natoms_sampler=sampler)
    assert len(recs) == 2
    for r in recs:
        counts = np.asarray(r['prior_num_atoms'])
        assert (counts >= 2).all()          # min_natoms clamp (ref :206-208)
        assert len(r['ligand_pos']) == counts.sum()
        stds = np.asarray(r['prior_stds'])
        assert stds.shape[-1] == 3 and np.isfinite(stds).all()
        # each part's std is the regressor's prediction for its atom count,
        # tiled across xyz (ref :177-178,:203-204)
        np.testing.assert_allclose(
            stds[:raw['num_arms']],
            armstd.predict(counts[:raw['num_arms'], None]).astype(
                np.float32)[:, None].repeat(3, 1), rtol=1e-6)
        np.testing.assert_allclose(
            stds[-1], np.float32(scastd.predict([[counts[-1]]])[0]),
            rtol=1e-6)


def test_stat_mode_min_natoms_clamp():
    """Predictions below 2 clamp to min_natoms=2 (ref utils/prior.py:206-208)."""
    from decompdiff_tpu.priors.atom_num import NumAtomsSampler
    out = NumAtomsSampler._sample_from_prediction(
        np.array([-5.0, 0.4, 11.2]), std=0.0,
        rng=np.random.default_rng(0))
    assert out.tolist() == [2, 2, 12]
