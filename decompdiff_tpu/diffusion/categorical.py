"""Log-space categorical (D3PM-style uniform-or-prior) diffusion for atom and
bond types.

Behavioral parity with ref models/transitions.py:97-161 (DiscreteTransition)
and the log-categorical helpers at ref models/transitions.py:65-93.

Padded layout: class variables live in [..., K] log-one-hot arrays; the
timestep index t is [B] and broadcasts over the atom/bond axes. Invalid
(padding) entries are harmless — they run through the same math and are masked
out at the loss/sampling sites.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from decompdiff_tpu.diffusion.schedules import cosine_alpha_schedule


def index_to_log_onehot(x: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """[..., ] int -> [..., K] log-one-hot, clamped at 1e-30
    (ref models/transitions.py:65-71)."""
    onehot = jax.nn.one_hot(x, num_classes, dtype=jnp.float32)
    return jnp.log(jnp.clip(onehot, 1e-30, None))


def log_onehot_to_index(log_x: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(log_x, axis=-1)


def log_sample_categorical(rng, logits: jnp.ndarray) -> jnp.ndarray:
    """Gumbel-max sample over the last axis (ref models/transitions.py:78-84).

    Matches the reference's explicit -log(-log(U + 1e-30) + 1e-30) construction
    rather than jax.random.categorical, so numerics under clipping agree.
    """
    uniform = jax.random.uniform(rng, logits.shape, dtype=logits.dtype)
    gumbel = -jnp.log(-jnp.log(uniform + 1e-30) + 1e-30)
    return jnp.argmax(gumbel + logits, axis=-1)


def log_add_exp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    maximum = jnp.maximum(a, b)
    return maximum + jnp.log(jnp.exp(a - maximum) + jnp.exp(b - maximum))


def log_1_min_a(a: np.ndarray) -> np.ndarray:
    return np.log(1 - np.exp(a) + 1e-40)


def categorical_kl(log_p, log_q):
    """sum_k p * (log p - log q), over the last axis (ref models/decompdiff.py:35-37)."""
    return (jnp.exp(log_p) * (log_p - log_q)).sum(-1)


def log_categorical(log_x0, log_prob):
    """sum_k onehot(x0) * log_prob (ref models/decompdiff.py:40-41)."""
    return (jnp.exp(log_x0) * log_prob).sum(-1)


@dataclasses.dataclass(frozen=True)
class CategoricalDiffusion:
    """Uniform-or-prior categorical transition in log space.

    Tables are [T]; prior_logprobs is [K] (log of the terminal distribution;
    uniform by default, or dataset marginals when `prior_types` is enabled —
    ref models/transitions.py:114-120).
    """
    log_alphas: jnp.ndarray
    log_one_minus_alphas: jnp.ndarray
    log_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    prior_logprobs: jnp.ndarray
    num_classes: int

    @classmethod
    def create(cls, noise_schedule: str, num_timesteps: int, s: float,
               num_classes: int, prior_probs=None) -> "CategoricalDiffusion":
        if noise_schedule != 'cosine':
            raise NotImplementedError(noise_schedule)
        alphas = cosine_alpha_schedule(num_timesteps, s)
        log_alphas = np.log(alphas)
        log_alphas_cumprod = np.cumsum(log_alphas)
        if prior_probs is None:
            prior = np.full((num_classes,), -np.log(num_classes))
        else:
            prior = np.log(np.clip(np.asarray(prior_probs, np.float64),
                                   1e-30, None))
        return cls(
            log_alphas=jnp.asarray(log_alphas, jnp.float32),
            log_one_minus_alphas=jnp.asarray(log_1_min_a(log_alphas), jnp.float32),
            log_alphas_cumprod=jnp.asarray(log_alphas_cumprod, jnp.float32),
            log_one_minus_alphas_cumprod=jnp.asarray(
                log_1_min_a(log_alphas_cumprod), jnp.float32),
            prior_logprobs=jnp.asarray(prior, jnp.float32),
            num_classes=num_classes,
        )

    # t: [B]; log_v: [B, N, K] (or [B, N, M, K] for dense bond matrices)
    def _coef(self, table, t, ndim):
        return table[t].reshape(t.shape + (1,) * (ndim - 1))

    def q_v_pred_one_timestep(self, log_vt_1, t):
        """q(v_t | v_{t-1}) (ref models/transitions.py:123-133)."""
        log_alpha_t = self._coef(self.log_alphas, t, log_vt_1.ndim)
        log_1_min_alpha_t = self._coef(self.log_one_minus_alphas, t, log_vt_1.ndim)
        return log_add_exp(log_vt_1 + log_alpha_t,
                           log_1_min_alpha_t + self.prior_logprobs)

    def q_v_pred(self, log_v0, t):
        """q(v_t | v_0) (ref models/transitions.py:135-144)."""
        log_cum = self._coef(self.log_alphas_cumprod, t, log_v0.ndim)
        log_1_min_cum = self._coef(self.log_one_minus_alphas_cumprod, t, log_v0.ndim)
        return log_add_exp(log_v0 + log_cum,
                           log_1_min_cum + self.prior_logprobs)

    def q_v_sample(self, rng, log_v0, t):
        """Sample v_t ~ q(v_t | v_0); returns (index, log-one-hot)
        (ref models/transitions.py:146-150)."""
        log_qvt_v0 = self.q_v_pred(log_v0, t)
        idx = log_sample_categorical(rng, log_qvt_v0)
        return idx, index_to_log_onehot(idx, self.num_classes)

    def q_v_posterior(self, log_v0, log_vt, t):
        """q(v_{t-1} | v_t, v_0), normalized over classes
        (ref models/transitions.py:153-161)."""
        t_minus_1 = jnp.maximum(t - 1, 0)
        log_qvt1_v0 = self.q_v_pred(log_v0, t_minus_1)
        unnormed = log_qvt1_v0 + self.q_v_pred_one_timestep(log_vt, t)
        return unnormed - jax.nn.logsumexp(unnormed, axis=-1, keepdims=True)

    def _log_ab(self, s, ndim):
        """log alpha_bar_s broadcast; s == -1 denotes the clean endpoint
        (alpha_bar = 1, log = 0)."""
        tab = self.log_alphas_cumprod[jnp.maximum(s, 0)]
        return jnp.where(s >= 0, tab, 0.0).reshape(
            s.shape + (1,) * (ndim - 1))

    def q_v_pred_skip(self, log_vs, t, s):
        """q(v_t | v_s) for an arbitrary pair s < t: the composition of
        uniform/prior-mixture kernels is again a mixture with
        alpha_ts = ab_t / ab_s (strided-sampling extension; with s == t-1
        this equals `q_v_pred_one_timestep` up to float32 cumsum noise)."""
        log_a_ts = (self._coef(self.log_alphas_cumprod, t, log_vs.ndim)
                    - self._log_ab(s, log_vs.ndim))
        # expm1 keeps 1 - a_ts accurate when a_ts ~ 1 (adjacent early steps)
        log_1m = jnp.log(-jnp.expm1(log_a_ts) + 1e-40)
        return log_add_exp(log_vs + log_a_ts, log_1m + self.prior_logprobs)

    def q_v_posterior_skip(self, log_v0, log_vt, t, s):
        """q(v_s | v_t, v_0) for an arbitrary earlier step s (s == -1
        returns the normalized log_v0: the jump lands on the clean class).
        With s == t-1 this matches `q_v_posterior` for t >= 1."""
        log_ab_s = self._log_ab(s, log_v0.ndim)
        log_qvs_v0 = log_add_exp(
            log_v0 + log_ab_s,
            jnp.log(-jnp.expm1(log_ab_s) + 1e-40) + self.prior_logprobs)
        unnormed = log_qvs_v0 + self.q_v_pred_skip(log_vt, t, s)
        return unnormed - jax.nn.logsumexp(unnormed, axis=-1, keepdims=True)

    def sample_terminal(self, rng, shape) -> jnp.ndarray:
        """Sample from the terminal distribution (uniform or marginal prior) —
        used for init types at sampling time (ref scripts/sample_diffusion_decomp.py:306-312)."""
        logits = jnp.broadcast_to(self.prior_logprobs, tuple(shape) + (self.num_classes,))
        return log_sample_categorical(rng, logits)
