"""Fused bond-triplet angular attention kernel (Pallas/TPU).

The triplet stream is the HBM-bandwidth hot spot of the uni_o2_bond denoiser:
the dense XLA path materializes ~6 O(Nl^3 * H) tensors per layer (first
projection, LayerNorm stats/out, relu, second projection for both k and v
nets). This kernel keeps every cubic intermediate in VMEM — HBM traffic drops
to the O(Nl^2 * H) inputs/outputs plus the O(Nl^3) scalar angle tensor.

Grid: (B, Nl) over (batch, destination atom i). Per program:
    af    = angular_encoding(angle[i])              [Nl_j, Nl_k, 13->16]
    pre_k = af @ Wa_k + t_kj'[j,k] + t_ij[i,j]      (factorized first linear)
    k     = LN(pre_k) -> relu -> @ Wo_k             [Nl_j, Nl_k, H]
    v     = same with the v-net params
    alpha = softmax_k((q[i,j,h,:] . k[j,k,h,:]) / sqrt(hd)) with triplet mask
    out[i, j] = sum_k alpha * v                     [Nl_j, H]

Semantics match models.uni_transformer_bond.BondTripletAttention exactly
(verified by tests/test_pallas_triplet.py); the reference origin is
BondUpdateLayer (ref models/encoders/uni_transformer_edge.py:77-167).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ANG_PAD = 16  # 13-dim angular code padded to a lane-friendly 16


_ANG_FREQS = (1.0, 2.0, 3.0, 1.0, 0.5, 1.0 / 3.0)


def _angular_encode_padded(x):
    """[...,] -> [..., 16]: [x, sin(x*f), cos(x*f), 0, 0, 0] with
    f = (1, 2, 3, 1, 1/2, 1/3) (models/common.py angular_encoding + zero pad).
    Frequencies are python scalars so the kernel captures no array constants.
    """
    cols = [x]
    cols += [jnp.sin(x * f) for f in _ANG_FREQS]
    cols += [jnp.cos(x * f) for f in _ANG_FREQS]
    cols += [jnp.zeros_like(x)] * 3
    return jnp.stack(cols, axis=-1)


def _layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(angle_ref, tkj_k_ref, tij_k_ref, tkj_v_ref, tij_v_ref,
            q_ref, mask_ref, hsum_ref,
            wa_k_ref, wo_k_ref, bo_k_ref, lns_k_ref, lnb_k_ref,
            wa_v_ref, wo_v_ref, bo_v_ref, lns_v_ref, lnb_v_ref,
            out_ref, *, n_heads: int, bf16: bool):
    i = pl.program_id(1)
    angle = angle_ref[0, 0]         # [Nl_j, Nl_k]
    Nl = angle.shape[0]
    H = tkj_k_ref.shape[-1]
    hd = H // n_heads

    af = _angular_encode_padded(angle)                 # [Nl, Nl, 16]
    af2 = af.reshape(Nl * Nl, ANG_PAD)

    def branch(tkj_ref, tij_ref, wa_ref, wo_ref, bo_ref, lns_ref, lnb_ref):
        pre = jnp.dot(af2, wa_ref[:],
                      preferred_element_type=jnp.float32)    # [Nl*Nl, H]
        pre = pre.reshape(Nl, Nl, H)
        pre = pre + tkj_ref[0]                              # (j,k) terms+bias
        pre = pre + tij_ref[0, 0][:, None, :]               # (i,j) term
        y = _layer_norm(pre, lns_ref[0], lnb_ref[0])
        y = jnp.maximum(y, 0.0)
        y2 = y.reshape(Nl * Nl, H)
        wo = wo_ref[:]
        if bf16:
            # the second linear dominates the kernel's FLOPs; bf16 inputs
            # with f32 accumulation trade ~1e-3 absolute error for MXU rate
            y2 = y2.astype(jnp.bfloat16)
            wo = wo.astype(jnp.bfloat16)
        o = jnp.dot(y2, wo, preferred_element_type=jnp.float32)
        return o.reshape(Nl, Nl, H) + bo_ref[0]

    k_t = branch(tkj_k_ref, tij_k_ref, wa_k_ref, wo_k_ref, bo_k_ref,
                 lns_k_ref, lnb_k_ref)
    v_t = branch(tkj_v_ref, tij_v_ref, wa_v_ref, wo_v_ref, bo_v_ref,
                 lns_v_ref, lnb_v_ref)

    # Head grouping without lane-splitting reshapes (unsupported in Mosaic):
    # hsum [H, heads] has 1 where feature d belongs to head h, so
    # (q*k) @ hsum sums within heads and alpha @ hsum.T expands per feature.
    hsum = hsum_ref[:]                                     # [H, heads]
    q = q_ref[0, 0]                                        # [j, H]
    qk = q[:, None, :] * k_t                               # [j, k, H]
    scale = 1.0 / np.sqrt(hd)
    logits = jnp.dot(qk.reshape(Nl * Nl, H), hsum,
                     preferred_element_type=jnp.float32)
    logits = logits.reshape(Nl, Nl, n_heads) * scale       # [j, k, heads]

    # triplet mask: bond (j->i) at mask[i, j], bond (k->j) at mask[j, k], k != i
    bm = mask_ref[0]                                       # [Nl, Nl] float
    bm_i = mask_ref[0, pl.ds(i, 1), :][0]                  # [Nl_j] row i
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (Nl, Nl), 1)
    valid = (bm_i[:, None] * bm) * (k_ids != i).astype(jnp.float32)
    neg = jnp.float32(-1e30)
    logits = jnp.where(valid[..., None] > 0.5, logits, neg)
    m = jnp.max(logits, axis=1, keepdims=True)
    m = jnp.maximum(m, -1e29)
    e = jnp.where(valid[..., None] > 0.5, jnp.exp(logits - m), 0.0)
    denom = jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
    alpha = e / denom                                       # [j, k, heads]

    alpha_full = jnp.dot(alpha.reshape(Nl * Nl, n_heads), hsum.T,
                         preferred_element_type=jnp.float32)
    alpha_full = alpha_full.reshape(Nl, Nl, H)
    out = (alpha_full * v_t).sum(axis=1)                    # [j, H]
    out_ref[0, 0] = out


@partial(jax.jit, static_argnames=('n_heads', 'bf16'))
def triplet_attention_pallas(angle, tkj_k, tij_k, tkj_v, tij_v, q, bond_mask,
                             wa_k, wo_k, bo_k, lns_k, lnb_k,
                             wa_v, wo_v, bo_v, lns_v, lnb_v, *, n_heads: int,
                             bf16: bool = False):
    """Args:
        angle:       [B, Nl(i), Nl(j), Nl(k)] triplet angles at vertex i
        tkj_k/tkj_v: [B, Nl(j), Nl(k), H] factorized (k->j) first-linear term
                     per branch (h_bond/r_feat/h_k/h_j contributions + bias)
        tij_k/tij_v: [B, Nl(i), Nl(j), H] factorized (i,j) term (r_feat_ij)
        q:           [B, Nl(i), Nl(j), H] query projections
        bond_mask:   [B, Nl, Nl] float (1 = real fc bond)
        wa_*:        [16, H] angular-code projection (13 rows used)
        wo_*:        [H, H] second linear;  lns_/lnb_: [1, H] LayerNorm params
    Returns out [B, Nl, Nl, H].
    """
    B, Nl = angle.shape[0], angle.shape[1]
    H = tkj_k.shape[-1]
    hd = H // n_heads
    hsum = (jnp.arange(H)[:, None] // hd ==
            jnp.arange(n_heads)[None, :]).astype(jnp.float32)  # [H, heads]
    grid = (B, Nl)

    def b_only(b, i):
        return (b, 0, 0, 0)

    def bi(b, i):
        return (b, i, 0, 0)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_kernel, n_heads=n_heads, bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Nl, Nl), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),     # angle[b, i]
            pl.BlockSpec((1, Nl, Nl, H), b_only, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nl, H), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, Nl, H), b_only, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nl, H), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nl, H), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, Nl), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),     # bond_mask[b]
            w_spec((H, n_heads)),                      # head-sum matrix
            w_spec((ANG_PAD, H)), w_spec((H, H)), w_spec((1, H)),
            w_spec((1, H)), w_spec((1, H)),
            w_spec((ANG_PAD, H)), w_spec((H, H)), w_spec((1, H)),
            w_spec((1, H)), w_spec((1, H)),
        ],
        out_specs=pl.BlockSpec((1, 1, Nl, H), bi, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Nl, Nl, H), jnp.float32),
        interpret=jax.default_backend() == 'cpu',
    )(angle, tkj_k, tij_k, tkj_v, tij_v, q, bond_mask, hsum,
      wa_k, wo_k, bo_k, lns_k, lnb_k, wa_v, wo_v, bo_v, lns_v, lnb_v)
