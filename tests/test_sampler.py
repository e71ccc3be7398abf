"""End-to-end sampler tests on tiny shapes (SURVEY.md §4 item 5):
the scanned reverse diffusion runs, freezes masked atoms, respects guidance,
and produces finite outputs of the right shape."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.data.batch import FullProtein
from decompdiff_tpu.models.diffusion_model import DecompDiffModel
from decompdiff_tpu.sampling.sampler import SampleConfig, sample_diffusion
from decompdiff_tpu.guidance.funcs import (
    armsca_prox_energy, center_prox_energy, clash_energy)
from decompdiff_tpu.utils.testing import random_complex_batch, tiny_model_config


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_model_config(num_diffusion_timesteps=20)
    model = DecompDiffModel.create(cfg, num_classes=8)
    rng = np.random.default_rng(3)
    batch = random_complex_batch(rng, batch_size=2, num_protein=20,
                                 num_ligand=6)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    return model, batch, params


def _init_state(model, batch, seed=0):
    rng = jax.random.PRNGKey(seed)
    r1, r2, r3 = jax.random.split(rng, 3)
    centers = batch.atom_prior_centers()
    stds = batch.atom_prior_stds()
    init_pos = centers + stds * jax.random.normal(r1, centers.shape)
    init_v = model.atom_diff.sample_terminal(r2, batch.ligand_v.shape)
    init_b = model.bond_diff.sample_terminal(r3, batch.bond_type.shape)
    init_b = jnp.where(batch.bond_mask, init_b, 0)
    return init_pos, init_v.astype(jnp.int32), init_b.astype(jnp.int32)


def test_sampler_runs_and_shapes(setup):
    model, batch, params = setup
    cfg = SampleConfig(num_steps=20, save_traj=True)
    init_pos, init_v, init_b = _init_state(model, batch)
    out = sample_diffusion(model, cfg, params, jax.random.PRNGKey(1), batch,
                           init_pos, init_v, init_b)
    assert out['pos'].shape == (2, 6, 3)
    assert out['v'].shape == (2, 6)
    assert out['bond'].shape == (2, 6, 6)
    assert out['traj']['pos'].shape == (20, 2, 6, 3)
    assert np.isfinite(np.asarray(out['pos'])).all()
    v = np.asarray(out['v'])
    assert ((v >= 0) & (v < 8)).all()


def test_sampler_freezes_masked_atoms(setup):
    model, batch, params = setup
    upd = np.asarray(batch.ligand_mask).copy()
    upd[:, :2] = False
    b2 = batch.replace(ligand_update_mask=jnp.asarray(upd))
    cfg = SampleConfig(num_steps=10, save_traj=False)
    init_pos, init_v, init_b = _init_state(model, b2)
    out = sample_diffusion(model, cfg, params, jax.random.PRNGKey(1), b2,
                           init_pos, init_v, init_b)
    np.testing.assert_allclose(np.asarray(out['pos'])[:, :2],
                               np.asarray(init_pos)[:, :2], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out['v'])[:, :2],
                                  np.asarray(init_v)[:, :2])


def test_sampler_with_guidance(setup):
    model, batch, params = setup
    Nf = 30
    rng = np.random.default_rng(5)
    fp = FullProtein(
        pos=jnp.asarray(rng.normal(size=(2, Nf, 3)) * 5, jnp.float32),
        mask=jnp.ones((2, Nf), bool))
    cfg = SampleConfig(
        num_steps=10, save_traj=False,
        energy_drift=({'type': 'armsca_prox', 'min_d': 1.2, 'max_d': 1.9},
                      {'type': 'clash', 'sigma': 2.0, 'gamma': 4.0},
                      {'type': 'center_prox'}))
    init_pos, init_v, init_b = _init_state(model, batch)
    out = sample_diffusion(model, cfg, params, jax.random.PRNGKey(1), batch,
                           init_pos, init_v, init_b, full_protein=fp)
    assert np.isfinite(np.asarray(out['pos'])).all()


def test_guidance_energies_finite_and_grad():
    rng = np.random.default_rng(11)
    batch = random_complex_batch(rng, batch_size=3, num_protein=16,
                                 num_ligand=8)
    x = batch.ligand_pos

    e = armsca_prox_energy(x, batch.ligand_decomp_idx, batch.num_arms,
                           batch.ligand_mask, batch.num_groups)
    assert np.isfinite(float(e))
    g = jax.grad(lambda p: armsca_prox_energy(
        p, batch.ligand_decomp_idx, batch.num_arms, batch.ligand_mask,
        batch.num_groups))(x)
    assert np.isfinite(np.asarray(g)).all()

    centers = batch.atom_prior_centers()
    g = jax.grad(lambda p: center_prox_energy(p, centers, batch.ligand_mask))(x)
    assert np.isfinite(np.asarray(g)).all()

    fp_pos = jnp.asarray(rng.normal(size=(3, 25, 3)), jnp.float32)
    fp_mask = jnp.ones((3, 25), bool)
    g = jax.grad(lambda p: clash_energy(fp_pos, fp_mask, p,
                                        batch.ligand_mask, 2.0, 4.0))(x)
    assert np.isfinite(np.asarray(g)).all()
    # padded atoms must receive zero gradient
    pad = ~np.asarray(batch.ligand_mask)
    assert np.allclose(np.asarray(g)[pad], 0.0)


def test_armsca_energy_matches_loop_reference():
    """Vectorized armsca_prox equals a direct per-graph python reimplementation
    of ref utils/guidance_funcs.py:50-78."""
    rng = np.random.default_rng(13)
    batch = random_complex_batch(rng, batch_size=4, num_protein=10,
                                 num_ligand=9)
    x = np.asarray(batch.ligand_pos)
    decomp = np.asarray(batch.ligand_decomp_idx)
    num_arms = np.asarray(batch.num_arms)
    mask = np.asarray(batch.ligand_mask)
    min_d, max_d = 1.2, 1.9

    total = 0.0
    B = x.shape[0]
    for b in range(B):
        pos = x[b][mask[b]]
        dec = decomp[b][mask[b]]
        arm_m = dec < num_arms[b]
        arm_pos, sca_pos = pos[arm_m], pos[~arm_m]
        if len(arm_pos) == 0 or len(sca_pos) == 0:
            continue
        arm_idx = dec[arm_m]
        d = np.linalg.norm(arm_pos[:, None] - sca_pos[None], axis=-1)
        mins = []
        for a in sorted(set(arm_idx.tolist())):
            mins.append(d[arm_idx == a].min())
        mins = np.array(mins)
        loss = np.mean(np.clip(min_d - mins, 0, None)
                       + np.clip(mins - max_d, 0, None))
        total += loss
    expected = total / B

    got = float(armsca_prox_energy(
        batch.ligand_pos, batch.ligand_decomp_idx, batch.num_arms,
        batch.ligand_mask, batch.num_groups, min_d, max_d))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_clash_energy_matches_loop_reference():
    """Vectorized clash equals a per-graph reimplementation of
    ref utils/guidance_funcs.py:24-42."""
    rng = np.random.default_rng(21)
    B, Nl, Nf = 3, 7, 20
    lig = rng.normal(size=(B, Nl, 3)).astype(np.float32) * 2
    prot = rng.normal(size=(B, Nf, 3)).astype(np.float32) * 3
    lig_mask = np.ones((B, Nl), bool)
    lig_mask[0, 5:] = False
    prot_mask = np.ones((B, Nf), bool)
    prot_mask[1, 15:] = False
    sigma, ct = 2.0, 4.0

    total = 0.0
    for b in range(B):
        p = prot[b][prot_mask[b]]
        l = lig[b][lig_mask[b]]
        e = np.exp(-((p[None, :, :] - l[:, None, :]) ** 2).sum(-1) / sigma)
        g = -sigma * np.log(1e-3 + e.sum(1))
        total += np.clip(ct - g, 0, None).mean()

    got = float(clash_energy(jnp.asarray(prot), jnp.asarray(prot_mask),
                             jnp.asarray(lig), jnp.asarray(lig_mask),
                             sigma=sigma, surface_ct=ct))
    np.testing.assert_allclose(got, total, rtol=1e-5)


def test_center_prox_energy_matches_loop():
    rng = np.random.default_rng(22)
    B, Nl = 2, 5
    x = rng.normal(size=(B, Nl, 3)).astype(np.float32)
    c = rng.normal(size=(B, Nl, 3)).astype(np.float32)
    mask = np.ones((B, Nl), bool)
    mask[1, 3:] = False
    expected = sum(np.linalg.norm(x[b][mask[b]] - c[b][mask[b]], axis=-1).sum()
                   for b in range(B))
    got = float(center_prox_energy(jnp.asarray(x), jnp.asarray(c),
                                   jnp.asarray(mask)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_sampler_data_parallel_matches_unsharded():
    """Sampling is the embarrassingly-parallel axis of the whole >=5x v5e-8
    scaling claim (ref scripts/sample_diffusion_decomp.py:314-360 batches
    complexes independently): a batch sharded over the 8-device dp mesh must
    reproduce the unsharded run per complex, guidance included (same evidence
    grade as the training DP test in test_train_step.py)."""
    from decompdiff_tpu.parallel.mesh import make_mesh, shard_batch

    assert jax.device_count() >= 8
    cfg_m = tiny_model_config(num_diffusion_timesteps=20)
    model = DecompDiffModel.create(cfg_m, num_classes=8)
    rng = np.random.default_rng(13)
    batch = random_complex_batch(rng, batch_size=8, num_protein=20,
                                 num_ligand=6)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    Nf = 30
    fp = FullProtein(
        pos=jnp.asarray(rng.normal(size=(8, Nf, 3)) * 5, jnp.float32),
        mask=jnp.ones((8, Nf), bool))
    cfg = SampleConfig(
        num_steps=10, save_traj=False,
        energy_drift=({'type': 'armsca_prox', 'min_d': 1.2, 'max_d': 1.9},
                      {'type': 'clash', 'sigma': 2.0, 'gamma': 4.0},
                      {'type': 'center_prox'}))
    init_pos, init_v, init_b = _init_state(model, batch, seed=4)

    out_ref = sample_diffusion(model, cfg, params, jax.random.PRNGKey(2),
                               batch, init_pos, init_v, init_b,
                               full_protein=fp)

    mesh = make_mesh(8)
    sharded = shard_batch(batch, mesh)
    sharding = jax.tree.leaves(sharded)[0].sharding
    init_pos_s = jax.device_put(init_pos, sharding)
    init_v_s = jax.device_put(init_v, sharding)
    init_b_s = jax.device_put(init_b, sharding)
    fp_s = jax.tree.map(lambda x: jax.device_put(x, sharding), fp)
    out_dp = sample_diffusion(model, cfg, params, jax.random.PRNGKey(2),
                              sharded, init_pos_s, init_v_s, init_b_s,
                              full_protein=fp_s)

    np.testing.assert_allclose(np.asarray(out_dp['pos']),
                               np.asarray(out_ref['pos']),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_dp['v']),
                                  np.asarray(out_ref['v']))
    np.testing.assert_array_equal(np.asarray(out_dp['bond']),
                                  np.asarray(out_ref['bond']))


def test_clash_without_full_protein_raises(setup):
    """Clash guidance with no full_protein must fail loudly: the internal
    fully-masked placeholder would make the clash energy identically zero
    (silent no-op) — round-3 review finding."""
    model, batch, params = setup
    cfg = SampleConfig(num_steps=2, save_traj=False,
                       energy_drift=({'type': 'clash', 'sigma': 2.0,
                                      'gamma': 4.0},))
    init_pos, init_v, init_b = _init_state(model, batch)
    with pytest.raises(ValueError, match='full_protein'):
        sample_diffusion(model, cfg, params, jax.random.PRNGKey(1), batch,
                         init_pos, init_v, init_b)


def test_center_pos_mode_none_translation_equivalence(setup):
    """center_pos_mode='none' (ref models/decompdiff.py:20-24) must be
    honored: since the denoiser is translation-equivariant, sampling an
    already-protein-centered batch with mode='none' must match mode='protein'
    on the same batch."""
    model, batch, params = setup
    # center the batch at its protein centroid so both modes see the same
    # effective coordinates
    m = np.asarray(batch.protein_mask)[..., None]
    centroid = ((np.asarray(batch.protein_pos) * m).sum(1)
                / m.sum(1))[:, None, :]
    centered = batch.replace(
        protein_pos=jnp.asarray(np.asarray(batch.protein_pos) - centroid),
        prior_centers=jnp.asarray(
            np.asarray(batch.prior_centers) - centroid))
    init_pos, init_v, init_b = _init_state(model, centered)

    out_p = sample_diffusion(
        model, SampleConfig(num_steps=10, center_pos_mode='protein'),
        params, jax.random.PRNGKey(5), centered, init_pos, init_v, init_b)
    out_n = sample_diffusion(
        model, SampleConfig(num_steps=10, center_pos_mode='none'),
        params, jax.random.PRNGKey(5), centered, init_pos, init_v, init_b)

    np.testing.assert_allclose(np.asarray(out_n['pos']),
                               np.asarray(out_p['pos']),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_n['v']),
                                  np.asarray(out_p['v']))
