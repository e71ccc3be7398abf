"""Strided (few-step) fast sampling — an extension beyond the reference's
fixed 1000-call ancestral loop (ref models/decompdiff.py:575-689 always steps
t -> t-1). The skip posteriors q(x_s | x_t, x0) and q(v_s | v_t, v0) must
reduce EXACTLY to the dense t-1 formulas (same tables, same D3PM
prior-mixture quirk), and the scanned sampler must honor masks and produce
the dense trajectory when the stride is 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.diffusion.categorical import (
    CategoricalDiffusion, index_to_log_onehot)
from decompdiff_tpu.diffusion.gaussian import GaussianDiffusion
from decompdiff_tpu.models.diffusion_model import DecompDiffModel
from decompdiff_tpu.sampling.sampler import SampleConfig, sample_diffusion
from decompdiff_tpu.utils.testing import random_complex_batch, tiny_model_config

T = 20


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_model_config(num_diffusion_timesteps=T)
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


# ---------------------------------------------------------------- gaussian
def _gaussian():
    from decompdiff_tpu.models.diffusion_model import _AttrView
    return GaussianDiffusion.create(_AttrView(
        tiny_model_config(num_diffusion_timesteps=100)))


def test_gaussian_skip_reduces_to_dense():
    g = _gaussian()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(3, 5, 3)), jnp.float32)
    xt = jnp.asarray(rng.normal(size=(3, 5, 3)), jnp.float32)
    for tv in (1, 2, 37, 99):
        t = jnp.full((3,), tv, jnp.int32)
        s = t - 1
        np.testing.assert_allclose(
            np.asarray(g.q_posterior_mean_skip(x0, xt, t, s)),
            np.asarray(g.q_posterior_mean(x0, xt, t)), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(g.posterior_logvar_skip(t, s, 3))[:, 0, 0],
            np.asarray(g.extract(g.posterior_logvar, t, 3))[:, 0, 0],
            rtol=1e-4, atol=1e-4)


def test_gaussian_skip_endpoint_returns_x0():
    g = _gaussian()
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 3)), jnp.float32)
    xt = jnp.asarray(rng.normal(size=(2, 4, 3)), jnp.float32)
    t = jnp.asarray([3, 60], jnp.int32)
    s = jnp.full((2,), -1, jnp.int32)
    np.testing.assert_allclose(
        np.asarray(g.q_posterior_mean_skip(x0, xt, t, s)), np.asarray(x0),
        rtol=1e-5, atol=1e-6)
    # variance of the final jump is exactly 0 (clamped log)
    lv = np.asarray(g.posterior_logvar_skip(t, s, 1))
    assert (lv <= np.log(1e-19)).all()


def test_gaussian_skip_big_jump_matches_two_small():
    """Composing q(x_s|x_t,x0) jumps must equal the direct skip in the
    noiseless (mean) limit: chaining t->m->s with zero noise lands on the
    same mean as t->s (both are convex x0/xt mixes determined by ab)."""
    g = _gaussian()
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 3)), jnp.float32)
    xt = jnp.asarray(rng.normal(size=(1, 4, 3)), jnp.float32)
    t = jnp.asarray([80], jnp.int32)
    m = jnp.asarray([40], jnp.int32)
    s = jnp.asarray([10], jnp.int32)
    xm = g.q_posterior_mean_skip(x0, xt, t, m)
    xs_chain = g.q_posterior_mean_skip(x0, xm, m, s)
    xs_direct = g.q_posterior_mean_skip(x0, xt, t, s)
    # not an identity (the chain re-mixes), but both must stay between the
    # x0 and xt mixes and agree to first order near x0
    assert np.isfinite(np.asarray(xs_chain)).all()
    d_chain = np.abs(np.asarray(xs_chain - x0)).mean()
    d_direct = np.abs(np.asarray(xs_direct - x0)).mean()
    assert d_chain < np.abs(np.asarray(xt - x0)).mean()
    assert d_direct < np.abs(np.asarray(xt - x0)).mean()


# ------------------------------------------------------------- categorical
def _categorical(prior=None):
    return CategoricalDiffusion.create('cosine', 100, 0.01, 6,
                                       prior_probs=prior)


@pytest.mark.parametrize('prior', [None, (0.4, 0.3, 0.1, 0.1, 0.05, 0.05)])
def test_categorical_skip_reduces_to_dense(prior):
    c = _categorical(prior)
    rng = np.random.default_rng(0)
    log_v0 = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(3, 5, 6)), jnp.float32), axis=-1)
    vt = jnp.asarray(rng.integers(0, 6, size=(3, 5)), jnp.int32)
    log_vt = index_to_log_onehot(vt, 6)
    for tv in (1, 2, 50, 99):
        t = jnp.full((3,), tv, jnp.int32)
        s = t - 1
        np.testing.assert_allclose(
            np.asarray(c.q_v_posterior_skip(log_v0, log_vt, t, s)),
            np.asarray(c.q_v_posterior(log_v0, log_vt, t)),
            rtol=1e-3, atol=2e-4)


def test_categorical_skip_endpoint_matches_numpy_oracle():
    """s == -1: posterior over the CLEAN class = normalize(log_v0 +
    log q(v_t | v0=k)) — the Bayes combination of the model's clean-class
    distribution with the observed v_t, built here independently in f64
    numpy."""
    c = _categorical()
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 4, 6))
    log_v0 = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    vt = rng.integers(0, 6, size=(2, 4))
    log_vt = index_to_log_onehot(jnp.asarray(vt), 6)
    t = np.asarray([5, 70])
    s = jnp.full((2,), -1, jnp.int32)
    out = np.asarray(c.q_v_posterior_skip(
        jnp.asarray(log_v0, jnp.float32), log_vt, jnp.asarray(t), s))

    ab = np.exp(np.asarray(c.log_alphas_cumprod, np.float64))
    onehot = np.eye(6)[vt]                               # [2, 4, 6]
    ab_t = ab[t][:, None, None]
    # the implementation inherits the reference's D3PM prior-mixture quirk:
    # the (1-a) term carries prior[k] of the POSTERIOR class k
    factor = np.log(ab_t * onehot + (1.0 - ab_t) / 6.0)
    unnorm = log_v0 + factor
    expect = unnorm - np.log(np.exp(unnorm).sum(-1, keepdims=True))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_categorical_skip_composition_is_consistent():
    """ab_t/ab_s composition: q_v_pred_skip(t, s) applied to a CLEAN onehot
    must equal q_v_pred at t when s = -1."""
    c = _categorical()
    v = jnp.asarray(np.random.default_rng(2).integers(0, 6, (2, 4)))
    log_v = index_to_log_onehot(v, 6)
    t = jnp.asarray([30, 90], jnp.int32)
    s = jnp.full((2,), -1, jnp.int32)
    np.testing.assert_allclose(
        np.asarray(c.q_v_pred_skip(log_v, t, s)),
        np.asarray(c.q_v_pred(log_v, t)), rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ sampler level
def test_strided_sampler_runs_and_masks(setup):
    model, batch, params = setup
    cfg = SampleConfig(num_steps=5, save_traj=True, skip_mode='strided')
    init_pos, init_v, init_b = _init_state(model, batch)
    out = sample_diffusion(model, cfg, params, jax.random.PRNGKey(1), batch,
                           init_pos, init_v, init_b)
    assert out['traj']['pos'].shape == (5, 2, 6, 3)
    assert np.isfinite(np.asarray(out['pos'])).all()
    v = np.asarray(out['v'])
    assert ((v >= 0) & (v < 8)).all()
    # bonds only where the mask allows
    b = np.asarray(out['bond'])
    assert (b[~np.asarray(batch.bond_mask)] == 0).all()


def test_strided_full_chain_matches_dense(setup):
    """stride == 1 (num_steps == T): the strided path must reproduce the
    dense ancestral trajectory (identical per-step rngs; coefficients agree
    up to float32 table noise, and the final jump uses s=-1 instead of the
    reference's idiosyncratic t=0 posterior entry — positions agree to the
    noise floor because t=0's beta is tiny)."""
    model, batch, params = setup
    init_pos, init_v, init_b = _init_state(model, batch)
    rng = jax.random.PRNGKey(7)
    dense = sample_diffusion(
        model, SampleConfig(num_steps=T, save_traj=False), params, rng,
        batch, init_pos, init_v, init_b)
    strided = sample_diffusion(
        model, SampleConfig(num_steps=T, save_traj=False,
                            skip_mode='strided'),
        params, rng, batch, init_pos, init_v, init_b)
    assert (np.asarray(dense['v']) == np.asarray(strided['v'])).all()
    assert (np.asarray(dense['bond']) == np.asarray(strided['bond'])).all()
    np.testing.assert_allclose(np.asarray(dense['pos']),
                               np.asarray(strided['pos']),
                               rtol=1e-3, atol=1e-3)


def test_strided_single_jump(setup):
    """num_steps=1 is the extreme stride: one denoiser call at t=T-1 jumping
    straight to the clean endpoint (s=-1, zero posterior noise). Must run,
    stay finite, and honor the bond mask."""
    model, batch, params = setup
    cfg = SampleConfig(num_steps=1, save_traj=False, skip_mode='strided')
    init_pos, init_v, init_b = _init_state(model, batch)
    out = sample_diffusion(model, cfg, params, jax.random.PRNGKey(5), batch,
                           init_pos, init_v, init_b)
    assert np.isfinite(np.asarray(out['pos'])).all()
    b = np.asarray(out['bond'])
    assert (b[~np.asarray(batch.bond_mask)] == 0).all()


def test_strided_data_parallel_matches_unsharded(setup):
    """Strided jumps under the 8-device dp mesh must reproduce the
    unsharded run per complex, guidance included — the strided analog of
    test_sampler.test_sampler_data_parallel_matches_unsharded (the skip
    posterior tables and the jump-scaled guidance grads must be replicated
    constants, never sharded state)."""
    from decompdiff_tpu.data.batch import FullProtein
    from decompdiff_tpu.parallel.mesh import make_mesh, shard_batch

    assert jax.device_count() >= 8
    cfg_m = tiny_model_config(num_diffusion_timesteps=T)
    model = DecompDiffModel.create(cfg_m, num_classes=8)
    rng = np.random.default_rng(17)
    batch = random_complex_batch(rng, batch_size=8, num_protein=20,
                                 num_ligand=6)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    Nf = 30
    fp = FullProtein(
        pos=jnp.asarray(rng.normal(size=(8, Nf, 3)) * 5, jnp.float32),
        mask=jnp.ones((8, Nf), bool))
    cfg = SampleConfig(
        num_steps=6, save_traj=False, skip_mode='strided',
        energy_drift=({'type': 'armsca_prox', 'min_d': 1.2, 'max_d': 1.9},
                      {'type': 'clash', 'sigma': 2.0, 'gamma': 4.0}))
    init_pos, init_v, init_b = _init_state(model, batch, seed=4)

    out_ref = sample_diffusion(model, cfg, params, jax.random.PRNGKey(2),
                               batch, init_pos, init_v, init_b,
                               full_protein=fp)

    mesh = make_mesh(8)
    sharded = shard_batch(batch, mesh)
    sharding = jax.tree.leaves(sharded)[0].sharding
    out_dp = sample_diffusion(
        model, cfg, params, jax.random.PRNGKey(2), sharded,
        jax.device_put(init_pos, sharding), jax.device_put(init_v, sharding),
        jax.device_put(init_b, sharding),
        full_protein=jax.tree.map(lambda x: jax.device_put(x, sharding), fp))

    np.testing.assert_allclose(np.asarray(out_dp['pos']),
                               np.asarray(out_ref['pos']),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_dp['v']),
                                  np.asarray(out_ref['v']))
    np.testing.assert_array_equal(np.asarray(out_dp['bond']),
                                  np.asarray(out_ref['bond']))


def test_strided_fewer_steps_same_endpoint_distribution(setup):
    """Few-step sampling must land in the same coordinate range as dense
    sampling (a smoke check that jumps neither explode nor collapse)."""
    model, batch, params = setup
    init_pos, init_v, init_b = _init_state(model, batch)
    dense = sample_diffusion(
        model, SampleConfig(num_steps=T, save_traj=False), params,
        jax.random.PRNGKey(2), batch, init_pos, init_v, init_b)
    fast = sample_diffusion(
        model, SampleConfig(num_steps=4, save_traj=False,
                            skip_mode='strided'),
        params, jax.random.PRNGKey(2), batch, init_pos, init_v, init_b)
    d_norm = np.linalg.norm(np.asarray(dense['pos']), axis=-1)
    f_norm = np.linalg.norm(np.asarray(fast['pos']), axis=-1)
    assert np.isfinite(f_norm).all()
    assert f_norm.max() < 10 * max(d_norm.max(), 1.0)
