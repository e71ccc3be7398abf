"""Decomposed-prior Gaussian coordinate diffusion.

Forward process anchored on per-arm/scaffold prior centers/stds
(ref models/decompdiff.py:437-447):

    x_t = sqrt(a_bar) * (x0 - mu_k) + sqrt(1 - a_bar) * eps * sigma_k + mu_k

Reverse posterior mean uses the *unanchored* DDPM coefficients exactly as the
reference does (ref models/decompdiff.py:358-362), and the reverse noise is
scaled by the prior std (ref models/decompdiff.py:679-681).

Everything operates on padded arrays:
    x            [B, Nl, 3]
    t            [B]           integer timestep per complex
    centers/stds [B, Nl, 3]    per-atom prior center/std (already gathered from
                               the [B, A, 3] group tables by decomp index)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from decompdiff_tpu.diffusion.schedules import pos_schedule_coefficients


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Coefficient tables (float32 jnp constants, shape [T])."""
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    one_minus_alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_mean_c0_coef: jnp.ndarray
    posterior_mean_ct_coef: jnp.ndarray
    posterior_var: jnp.ndarray
    posterior_logvar: jnp.ndarray
    pos_score_coef: jnp.ndarray

    @classmethod
    def create(cls, config) -> "GaussianDiffusion":
        coefs = pos_schedule_coefficients(config)
        return cls(**{k: jnp.asarray(v) for k, v in coefs.items()
                      if k in {f.name for f in dataclasses.fields(cls)}})

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    # -- helpers -------------------------------------------------------------
    @staticmethod
    def _bcast(coef_t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        """[B] -> [B, 1, ..., 1] with `ndim` total dims."""
        return coef_t.reshape(coef_t.shape + (1,) * (ndim - 1))

    def extract(self, table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        return self._bcast(table[t], ndim)

    # -- forward -------------------------------------------------------------
    def q_sample(self, x0, t, noise, centers, stds):
        """Anchored forward sample x_t (ref models/decompdiff.py:442-447)."""
        a = self.extract(self.sqrt_alphas_cumprod, t, x0.ndim)
        one_minus = self.extract(self.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
        return a * (x0 - centers) + one_minus * noise * stds + centers

    # -- reverse -------------------------------------------------------------
    def predict_x0_from_eps(self, xt, eps, t):
        """ref models/decompdiff.py:353-356."""
        return (self.extract(self.sqrt_recip_alphas_cumprod, t, xt.ndim) * xt -
                self.extract(self.sqrt_recipm1_alphas_cumprod, t, xt.ndim) * eps)

    def q_posterior_mean(self, x0, xt, t):
        """Posterior mean c0*x0 + ct*xt (ref models/decompdiff.py:358-362)."""
        return (self.extract(self.posterior_mean_c0_coef, t, xt.ndim) * x0 +
                self.extract(self.posterior_mean_ct_coef, t, xt.ndim) * xt)

    def _ab_pair(self, t, s, ndim):
        """(ab_t, om_t, ab_s, om_s) broadcast helpers for skip steps, where
        om = 1 - alpha_bar comes from the f64-computed complement table
        (computing 1 - ab in float32 cancels catastrophically at ab ~ 1,
        which every early timestep of the sigmoid schedule hits). s == -1
        denotes the fully-denoised endpoint (ab = 1, om = 0)."""
        ab_t = self.extract(self.alphas_cumprod, t, ndim)
        om_t = self.extract(self.one_minus_alphas_cumprod, t, ndim)
        sc = jnp.maximum(s, 0)
        live = (s >= 0)
        ab_s = self._bcast(
            jnp.where(live, self.alphas_cumprod[sc], 1.0), ndim)
        om_s = self._bcast(
            jnp.where(live, self.one_minus_alphas_cumprod[sc], 0.0), ndim)
        return ab_t, om_t, ab_s, om_s

    def q_posterior_mean_skip(self, x0, xt, t, s):
        """Posterior mean of q(x_s | x_t, x0) for an ARBITRARY earlier step
        s < t (strided/few-step sampling — an extension beyond the
        reference's fixed t-1 ancestral loop). With s == t-1 this equals
        `q_posterior_mean` (a_ts = alpha_t); s == -1 collapses onto x0.
        Cancellation-safe form: 1 - a_ts = (om_t - om_s) / ab_s, a
        difference of two accurately-tabled small numbers."""
        ab_t, om_t, ab_s, om_s = self._ab_pair(t, s, xt.ndim)
        one_minus_a_ts = (om_t - om_s) / ab_s
        c0 = jnp.sqrt(ab_s) * one_minus_a_ts / om_t
        ct = jnp.sqrt(ab_t / ab_s) * om_s / om_t
        return c0 * x0 + ct * xt

    def posterior_logvar_skip(self, t, s, ndim):
        """log Var[q(x_s | x_t, x0)] = log[om_s/om_t * (om_t - om_s)/ab_s];
        equals posterior_logvar[t] at s == t-1 (t >= 1). The s == -1 /
        variance-0 endpoint is clamped — callers gate the noise on s >= 0
        exactly as the dense path gates on t > 0."""
        ab_t, om_t, ab_s, om_s = self._ab_pair(t, s, ndim)
        var = om_s / om_t * (om_t - om_s) / ab_s
        return jnp.log(jnp.maximum(var, 1e-20))

    def reverse_step(self, rng, x0_pred, xt, t, stds):
        """One ancestral step: mean + 1[t>0] * exp(0.5 logvar) * eps * sigma_k
        (ref models/decompdiff.py:612-615,679-684)."""
        mean = self.q_posterior_mean(x0_pred, xt, t)
        logvar = self.extract(self.posterior_logvar, t, xt.ndim)
        nonzero = self._bcast((t > 0).astype(xt.dtype), xt.ndim)
        eps = jax.random.normal(rng, xt.shape, xt.dtype)
        return mean + nonzero * jnp.exp(0.5 * logvar) * eps * stds

    # -- losses ----------------------------------------------------------------
    def pos_mse_per_graph(self, pred, target, stds, atom_mask):
        """std-normalized per-graph-mean MSE (ref models/decompdiff.py:530-531).

        pred/target [B, Nl, 3]; stds [B, Nl, 3]; atom_mask [B, Nl] bool.
        Returns [B]: per-graph mean over atoms of
        sum_xyz((pred-target)^2 / sigma^2). The per-graph values feed the
        importance-sampling Lt history; `pos_mse_loss` is their mean. This
        is the ONLY implementation of the formula — the model's
        get_diffusion_loss calls it.
        """
        per_atom = (((pred - target) ** 2) / (stds ** 2)).sum(-1)
        m = atom_mask.astype(per_atom.dtype)
        return (per_atom * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)

    def pos_mse_loss(self, pred, target, stds, atom_mask):
        """Scalar mean over graphs of `pos_mse_per_graph`."""
        return self.pos_mse_per_graph(pred, target, stds, atom_mask).mean()


def normal_kl(mean1, logvar1, mean2, logvar2):
    """ref models/decompdiff.py:44-49 (sum over last dim)."""
    kl = 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                + (mean1 - mean2) ** 2 * jnp.exp(-logvar2))
    return kl.sum(-1)


def log_normal(values, means, log_scales):
    """ref models/decompdiff.py:52-55 (sum over last dim)."""
    var = jnp.exp(log_scales * 2)
    log_prob = (-((values - means) ** 2) / (2 * var) - log_scales
                - np.log(np.sqrt(2 * np.pi)))
    return log_prob.sum(-1)
