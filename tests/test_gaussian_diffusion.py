"""Decomposed-prior Gaussian diffusion: forward-process statistics and
reverse-step identities."""

import jax
import jax.numpy as jnp
import numpy as np

from decompdiff_tpu.diffusion.gaussian import GaussianDiffusion
from decompdiff_tpu.models.diffusion_model import _AttrView


def make_diff(T=100):
    return GaussianDiffusion.create(_AttrView({
        'beta_schedule': 'sigmoid', 'beta_start': 1e-7, 'beta_end': 2e-3,
        'num_diffusion_timesteps': T}))


def test_q_sample_terminal_statistics():
    """At t = T-1 the anchored forward process is ~ N(mu_k, abar*var0 +
    (1-abar)*sigma_k^2) around the prior center; with abar(T) small the
    samples concentrate at N(mu_k, sigma_k)."""
    T = 100
    diff = make_diff(T)
    rng = jax.random.PRNGKey(0)
    n = 20000
    x0 = jnp.zeros((n, 1, 3)) + 5.0           # far from the prior center
    centers = jnp.full((n, 1, 3), -2.0)
    stds = jnp.full((n, 1, 3), 1.5)
    t = jnp.full((n,), T - 1, jnp.int32)
    noise = jax.random.normal(rng, x0.shape)
    xt = np.asarray(diff.q_sample(x0, t, noise, centers, stds))

    abar = float(diff.alphas_cumprod[T - 1])
    exp_mean = np.sqrt(abar) * (5.0 - (-2.0)) + (-2.0)
    exp_std = np.sqrt(1 - abar) * 1.5
    np.testing.assert_allclose(xt.mean(), exp_mean, atol=0.05)
    np.testing.assert_allclose(xt.std(), exp_std, atol=0.05)


def test_q_sample_t0_close_to_x0():
    diff = make_diff()
    rng = jax.random.PRNGKey(1)
    x0 = jax.random.normal(rng, (10, 4, 3)) * 3
    centers = jnp.zeros_like(x0)
    stds = jnp.ones_like(x0)
    t = jnp.zeros((10,), jnp.int32)
    xt = diff.q_sample(x0, t, jax.random.normal(rng, x0.shape), centers, stds)
    # beta_0 ~ 1e-7: x_t ~= x0
    np.testing.assert_allclose(np.asarray(xt), np.asarray(x0), atol=0.01)


def test_predict_x0_inverts_eps_param():
    """x0 -> (q_sample w/o anchoring) -> predict_x0_from_eps round trip."""
    diff = make_diff()
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.normal(rng, (6, 5, 3))
    t = jnp.asarray([3, 17, 42, 77, 50, 99])
    eps = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    centers = jnp.zeros_like(x0)
    stds = jnp.ones_like(x0)
    xt = diff.q_sample(x0, t, eps, centers, stds)
    x0_rec = diff.predict_x0_from_eps(xt, eps, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                               rtol=1e-3, atol=1e-4)


def test_posterior_mean_at_t1_recovers_x0_weighting():
    """c0 + ct ~= 1 and c0 -> 1 as t -> 1 for tiny beta schedules."""
    diff = make_diff()
    c0 = np.asarray(diff.posterior_mean_c0_coef)
    ct = np.asarray(diff.posterior_mean_ct_coef)
    np.testing.assert_allclose(c0 + ct, 1.0, atol=1e-3)
    assert c0[1] > 0.4  # early steps weight x0 strongly for sigmoid schedule


def test_reverse_step_no_noise_at_t0():
    diff = make_diff()
    rng = jax.random.PRNGKey(4)
    x0 = jax.random.normal(rng, (3, 4, 3))
    xt = x0 + 0.1
    stds = jnp.ones_like(x0) * 2.0
    t0 = jnp.zeros((3,), jnp.int32)
    out = diff.reverse_step(jax.random.PRNGKey(5), x0, xt, t0, stds)
    expected = diff.q_posterior_mean(x0, xt, t0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-6)


def test_pos_mse_loss_masking():
    diff = make_diff()
    pred = jnp.ones((2, 4, 3))
    target = jnp.zeros((2, 4, 3))
    stds = jnp.ones((2, 4, 3)) * 2.0
    mask = jnp.asarray([[True, True, False, False],
                        [True, True, True, True]])
    # per atom: sum_xyz(1/4) = 0.75; per graph mean = 0.75; mean over graphs
    loss = float(diff.pos_mse_loss(pred, target, stds, mask))
    np.testing.assert_allclose(loss, 0.75, rtol=1e-6)
    # padded values must not affect the loss
    pred2 = pred.at[0, 2:].set(100.0)
    loss2 = float(diff.pos_mse_loss(pred2, target, stds, mask))
    np.testing.assert_allclose(loss2, loss, rtol=1e-6)


def test_reverse_chain_with_oracle_denoiser_converges():
    """Iterating reverse_step from x_T ~ N(mu, sigma) with a perfect x0
    prediction must land on x0 — validates the posterior mean/variance tables
    and the prior-std-scaled noise end to end."""
    T = 100
    diff = make_diff(T)
    rng = jax.random.PRNGKey(0)
    n = 512
    x0 = jnp.concatenate([jnp.full((n, 1, 3), 3.0),
                          jnp.full((n, 1, 3), -1.0)], axis=1)
    centers = jnp.zeros_like(x0)
    stds = jnp.full_like(x0, 1.3)

    rng, sub = jax.random.split(rng)
    xt = centers + stds * jax.random.normal(sub, x0.shape)
    for t in range(T - 1, -1, -1):
        rng, sub = jax.random.split(rng)
        tb = jnp.full((n,), t, jnp.int32)
        xt = diff.reverse_step(sub, x0, xt, tb, stds)
    err = np.abs(np.asarray(xt) - np.asarray(x0))
    assert err.mean() < 0.02, err.mean()


def test_forward_reverse_roundtrip_distribution():
    """q_sample then a full oracle reverse pass preserves per-atom means."""
    T = 50
    diff = make_diff(T)
    rng = jax.random.PRNGKey(1)
    n = 2000
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(n, 1, 3)) * 2,
                     jnp.float32)
    centers = jnp.zeros_like(x0)
    stds = jnp.ones_like(x0)
    t = jnp.full((n,), T - 1, jnp.int32)
    xt = diff.q_sample(x0, t, jax.random.normal(rng, x0.shape), centers, stds)
    # one oracle posterior step at T-1 must contract toward x0
    mean = diff.q_posterior_mean(x0, xt, t)
    d_before = float(jnp.abs(xt - x0).mean())
    d_after = float(jnp.abs(mean - x0).mean())
    assert d_after < d_before
