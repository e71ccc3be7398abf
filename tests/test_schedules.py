"""Unit tests for noise schedules and coefficient tables — the parity anchor
(SURVEY.md §7 stage 2). Expected values recomputed independently with numpy
from the published formulas."""

import numpy as np

from decompdiff_tpu.diffusion.schedules import (
    cosine_alpha_schedule, get_beta_schedule, pos_schedule_coefficients)
from decompdiff_tpu.models.diffusion_model import _AttrView


def test_sigmoid_schedule_endpoints():
    betas = get_beta_schedule('sigmoid', beta_start=1e-7, beta_end=2e-3,
                              num_diffusion_timesteps=1000)
    assert betas.shape == (1000,)
    # sigmoid(-6) ~ 0.0025, sigmoid(6) ~ 0.9975
    s = 1 / (1 + np.exp(6.0))
    np.testing.assert_allclose(betas[0], s * (2e-3 - 1e-7) + 1e-7, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], (1 - s) * (2e-3 - 1e-7) + 1e-7,
                               rtol=1e-12)
    assert np.all(np.diff(betas) > 0)


def test_linear_quad_const_jsd():
    b = get_beta_schedule('linear', beta_start=1e-4, beta_end=2e-2,
                          num_diffusion_timesteps=10)
    np.testing.assert_allclose(b, np.linspace(1e-4, 2e-2, 10))
    b = get_beta_schedule('quad', beta_start=1e-4, beta_end=2e-2,
                          num_diffusion_timesteps=10)
    np.testing.assert_allclose(b, np.linspace(1e-2, np.sqrt(2e-2), 10) ** 2)
    b = get_beta_schedule('const', beta_start=0, beta_end=0.5,
                          num_diffusion_timesteps=5)
    np.testing.assert_allclose(b, 0.5)
    b = get_beta_schedule('jsd', beta_start=0, beta_end=0,
                          num_diffusion_timesteps=4)
    np.testing.assert_allclose(b, [1 / 4, 1 / 3, 1 / 2, 1.0])


def test_cosine_alpha_schedule_matches_formula():
    T, s = 100, 0.01
    alphas = cosine_alpha_schedule(T, s)
    steps = T + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    expected = np.sqrt(np.clip(ac[1:] / ac[:-1], 0.001, 1.0))
    np.testing.assert_allclose(alphas, expected, rtol=1e-12)
    assert alphas.shape == (T,)
    assert np.all(alphas <= 1.0) and np.all(alphas > 0)


def _coefs(T=50):
    cfg = _AttrView({'beta_schedule': 'sigmoid', 'beta_start': 1e-7,
                     'beta_end': 2e-3, 'num_diffusion_timesteps': T})
    return pos_schedule_coefficients(cfg), T


def test_posterior_coefficient_identities():
    # recompute in float64 (module computes in f64 and casts to f32 at the end)
    c, T = _coefs()
    betas = get_beta_schedule('sigmoid', beta_start=1e-7, beta_end=2e-3,
                              num_diffusion_timesteps=T)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    np.testing.assert_allclose(c['alphas_cumprod'], ac, rtol=1e-5)
    np.testing.assert_allclose(c['sqrt_alphas_cumprod'] ** 2, ac, rtol=1e-5)
    np.testing.assert_allclose(
        c['sqrt_one_minus_alphas_cumprod'] ** 2, 1 - ac, rtol=1e-4, atol=1e-7)
    # posterior mean coefficients from the DDPM closed form
    ac_prev = np.append(1.0, ac[:-1])
    np.testing.assert_allclose(
        c['posterior_mean_c0_coef'],
        betas * np.sqrt(ac_prev) / (1 - ac), rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(
        c['posterior_mean_ct_coef'],
        (1 - ac_prev) * np.sqrt(alphas) / (1 - ac), rtol=1e-4, atol=1e-8)
    # the reference's posterior_logvar replaces the t=0 entry with t=1's
    assert c['posterior_logvar'][0] == c['posterior_logvar'][1]
    np.testing.assert_allclose(
        np.exp(c['posterior_logvar'][1:]), c['posterior_var'][1:], rtol=1e-5)


def test_cosine_pos_schedule_branch():
    cfg = _AttrView({'beta_schedule': 'cosine', 'pos_beta_s': 0.01,
                     'num_diffusion_timesteps': 20})
    c = pos_schedule_coefficients(cfg)
    alphas_sqrt = cosine_alpha_schedule(20, 0.01)
    np.testing.assert_allclose(c['betas'], 1 - alphas_sqrt ** 2, rtol=1e-6)
