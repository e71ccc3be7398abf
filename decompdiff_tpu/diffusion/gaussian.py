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
