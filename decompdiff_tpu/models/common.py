"""Shared feature blocks for the equivariant graph transformer.

Parity targets:
  * GaussianSmearing (custom fixed offsets or linspace): ref models/common.py:11-31
  * AngularEncoding: ref models/common.py:34-54
  * ShiftedSoftplus: ref models/common.py:66-72
  * MLP (Linear -> LayerNorm -> ReLU -> Linear): ref models/common.py:85-105
  * outer_product edge features: ref models/common.py:116-123

All blocks are pure functions of dense padded arrays; no edge lists.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# The custom RBF offsets used whenever fix_offset=True (ref models/common.py:18).
# coeff = -0.5 / (offset[1]-offset[0])**2 = -0.5 (first gap is 1.0).
FIXED_RBF_OFFSETS = np.array(
    [0, 1, 1.25, 1.5, 1.75, 2, 2.25, 2.5, 2.75, 3, 3.5, 4, 4.5, 5, 5.5, 6, 7, 8, 9, 10],
    dtype=np.float32)
FIXED_RBF_COEFF = -0.5


def gaussian_smearing(dist: jnp.ndarray, offsets: jnp.ndarray,
                      coeff: float) -> jnp.ndarray:
    """dist [...] -> [..., num_gaussians]. Matches ref models/common.py:29-31."""
    d = dist[..., None] - offsets
    return jnp.exp(coeff * d * d)


def fixed_rbf(dist: jnp.ndarray) -> jnp.ndarray:
    """The fix_offset=True expansion used on every hot path
    (ref models/common.py:16-19 — note it ignores start/stop/num_gaussians)."""
    return gaussian_smearing(dist, jnp.asarray(FIXED_RBF_OFFSETS), FIXED_RBF_COEFF)


def linspace_rbf(dist: jnp.ndarray, start: float, stop: float,
                 num_gaussians: int) -> jnp.ndarray:
    """fix_offset=False variant (ref models/common.py:20-23)."""
    offsets = jnp.linspace(start, stop, num_gaussians)
    coeff = -0.5 / float((stop - start) / (num_gaussians - 1)) ** 2
    return gaussian_smearing(dist, offsets, coeff)


def angular_encoding(x: jnp.ndarray, num_funcs: int = 3) -> jnp.ndarray:
    """x [...] -> [..., 4*num_funcs + 1] (ref models/common.py:34-54)."""
    freq = np.array([i + 1 for i in range(num_funcs)]
                    + [1.0 / (i + 1) for i in range(num_funcs)], dtype=np.float32)
    xf = x[..., None] * freq
    return jnp.concatenate([x[..., None], jnp.sin(xf), jnp.cos(xf)], axis=-1)


ANGULAR_DIM = 4 * 3 + 1  # 13 with num_funcs=3


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softplus(x) - float(np.log(2.0))


def outer_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., A], [..., B] -> [..., A*B], matching the reference flattening
    order (a-index major; ref models/common.py:116-123 flattens with `a`
    unsqueezed last, so out[..., i*B + j] = a[..., i] * b[..., j])."""
    out = a[..., :, None] * b[..., None, :]
    return out.reshape(out.shape[:-2] + (a.shape[-1] * b.shape[-1],))


class MLP(nn.Module):
    """Linear -> LayerNorm -> ReLU -> ... -> Linear (ref models/common.py:85-105).

    num_layer counts Linear layers; norm/activation after every layer except
    the last (unless act_last). dtype selects the compute precision (params
    stay float32).
    """
    out_dim: int
    hidden_dim: int
    num_layer: int = 2
    norm: bool = True
    act_last: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        for layer_idx in range(self.num_layer):
            dim = self.out_dim if layer_idx == self.num_layer - 1 else self.hidden_dim
            x = nn.Dense(dim, dtype=self.dtype)(x)
            if layer_idx < self.num_layer - 1 or self.act_last:
                if self.norm:
                    x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
                x = nn.relu(x)
        return x


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray,
                   axis: int) -> jnp.ndarray:
    """Numerically-safe masked softmax; fully-masked rows return all zeros.

    This is the dense equivalent of torch_scatter.scatter_softmax over edges
    grouped by destination (ref encoders' attention, e.g.
    ref models/encoders/uni_transformer_edge.py:64-68).
    """
    logits = logits.astype(jnp.float32)
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(mask, logits, neg)
    m = jnp.max(masked, axis=axis, keepdims=True)
    # guard fully-masked rows (max = neg) so exp() stays finite
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(mask, jnp.exp(masked - m), 0.0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-16)


def safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = False,
              eps: float = 1e-12) -> jnp.ndarray:
    """Gradient-safe L2 norm (grad at 0 is 0, not NaN)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps))
