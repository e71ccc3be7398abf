"""Categorical (D3PM) transition tests against brute-force matrix math."""

import jax
import jax.numpy as jnp
import numpy as np

from decompdiff_tpu.diffusion.categorical import (
    CategoricalDiffusion, index_to_log_onehot, log_onehot_to_index,
    log_sample_categorical)
from decompdiff_tpu.diffusion.schedules import cosine_alpha_schedule


def make_trans(K=5, T=30, prior=None):
    return CategoricalDiffusion.create('cosine', T, 0.01, K, prior)


def test_log_onehot_roundtrip():
    x = jnp.asarray([[0, 3, 2], [4, 1, 0]])
    log_x = index_to_log_onehot(x, 5)
    assert log_x.shape == (2, 3, 5)
    np.testing.assert_array_equal(log_onehot_to_index(log_x), x)
    # clamped at log(1e-30)
    np.testing.assert_allclose(log_x.min(), np.log(1e-30), rtol=1e-6)


def test_q_v_pred_matches_bruteforce():
    K, T = 5, 30
    trans = make_trans(K, T)
    alphas = cosine_alpha_schedule(T, 0.01)
    abar = np.cumprod(alphas)
    v0 = jnp.asarray([[1, 4, 0, 2]])
    log_v0 = index_to_log_onehot(v0, K)
    for t in [0, 7, T - 1]:
        probs = np.exp(np.asarray(
            trans.q_v_pred(log_v0, jnp.asarray([t]))))
        onehot = np.eye(K)[np.asarray(v0[0])]
        expected = abar[t] * onehot + (1 - abar[t]) / K
        np.testing.assert_allclose(probs[0], expected, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_q_v_pred_with_marginal_prior():
    K, T = 4, 20
    prior = np.array([0.1, 0.2, 0.3, 0.4])
    trans = make_trans(K, T, prior)
    alphas = cosine_alpha_schedule(T, 0.01)
    abar = np.cumprod(alphas)
    v0 = jnp.asarray([[2]])
    log_v0 = index_to_log_onehot(v0, K)
    t = 10
    probs = np.exp(np.asarray(trans.q_v_pred(log_v0, jnp.asarray([t]))))
    expected = abar[t] * np.eye(K)[2] + (1 - abar[t]) * prior
    np.testing.assert_allclose(probs[0, 0], expected, rtol=1e-4, atol=1e-6)


def test_q_v_posterior_is_normalized_and_bayes_consistent():
    K, T = 5, 30
    trans = make_trans(K, T)
    rng = np.random.default_rng(0)
    log_v0 = jnp.asarray(np.log(rng.dirichlet(np.ones(K), size=(2, 3))),
                         jnp.float32)
    vt = jnp.asarray(rng.integers(0, K, size=(2, 3)))
    log_vt = index_to_log_onehot(vt, K)
    t = jnp.asarray([5, 20])
    log_post = trans.q_v_posterior(log_v0, log_vt, t)
    probs = np.exp(np.asarray(log_post))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    # brute-force Bayes for one-hot v0: q(v_{t-1}|v_t,v0) ∝ q(v_t|v_{t-1}) q(v_{t-1}|v0)
    alphas = cosine_alpha_schedule(T, 0.01)
    abar = np.cumprod(alphas)
    v0_idx, vt_idx, tt = 1, 3, 9
    log_v0_oh = index_to_log_onehot(jnp.asarray([[v0_idx]]), K)
    log_vt_oh = index_to_log_onehot(jnp.asarray([[vt_idx]]), K)
    got = np.exp(np.asarray(trans.q_v_posterior(
        log_v0_oh, log_vt_oh, jnp.asarray([tt]))))[0, 0]
    q_tm1_given_0 = abar[tt - 1] * np.eye(K)[v0_idx] + (1 - abar[tt - 1]) / K
    # single step: q(vt | v_{t-1}) as function of v_{t-1}, with vt fixed
    a_t = alphas[tt]
    q_t_given_tm1 = a_t * np.eye(K)[:, vt_idx] + (1 - a_t) / K
    expected = q_tm1_given_0 * q_t_given_tm1
    expected = expected / expected.sum()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_gumbel_sampling_distribution():
    K = 4
    logits = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    rng = jax.random.PRNGKey(0)
    samples = log_sample_categorical(
        rng, jnp.broadcast_to(logits, (20000, K)))
    freq = np.bincount(np.asarray(samples), minlength=K) / 20000
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_sample_terminal_uniform():
    trans = make_trans(K=5, T=10)
    s = trans.sample_terminal(jax.random.PRNGKey(1), (10000,))
    freq = np.bincount(np.asarray(s), minlength=5) / 10000
    np.testing.assert_allclose(freq, 0.2, atol=0.03)
