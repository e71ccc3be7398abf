"""Fused dense bond-graph attention kernel (Pallas/TPU).

Fuses NodeBondAttention / PosBondAttention (models/uni_transformer_bond.py;
reference NodeUpdateLayer over bond edges + PosUpdateLayer over bond edges,
ref models/encoders/uni_transformer_edge.py:239-257,273-285): the bond hidden
state is the per-edge feature, neighbors are the dense [Nl, Nl] ligand graph.

    pre_m = h_bond @ We_m + (h @ Wi_m)[dst] + (h @ Wj_m)[src]
    y_m   = relu(LayerNorm(pre_m));  k = y_k @ Wo_k + bo_k
    v     = y_v @ Wo_v + bo_v
    alpha = masked softmax over src of (q . k)/sqrt(hd)
    node mode: out[dst] = sum_src alpha * v              [Nl, H]
    pos mode:  dx[dst]  = sum_src (mean_h alpha*v) * rel [Nl, 4]

Grid: (B,) — one ligand complex per program; all [Nl^2, H] intermediates stay
in VMEM (Nl <= 64 -> <= 2 MB per tensor).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bond_kernel(hbond_ref, h_ref, rel_ref, q_ref, mask_ref, hsum_ref,
                 wek_ref, wik_ref, wjk_ref, wok_ref, bok_ref, bek_ref,
                 lnsk_ref, lnbk_ref,
                 wev_ref, wiv_ref, wjv_ref, wov_ref, bov_ref, bev_ref,
                 lnsv_ref, lnbv_ref,
                 out_ref, *, n_heads: int, pos_mode: bool):
    hbond = hbond_ref[0]                             # [Nl, Nl, H]
    Nl = hbond.shape[0]
    H = hbond.shape[-1]
    hd = H // n_heads
    h = h_ref[0]                                     # [Nl, H]
    hb2 = hbond.reshape(Nl * Nl, H)

    def branch(we_ref, wi_ref, wj_ref, wo_ref, bo_ref, be_ref,
               lns_ref, lnb_ref, out_dim):
        pre = jnp.dot(hb2, we_ref[:], preferred_element_type=jnp.float32)
        pre = pre.reshape(Nl, Nl, H)
        ti = jnp.dot(h, wi_ref[:], preferred_element_type=jnp.float32)
        tj = jnp.dot(h, wj_ref[:], preferred_element_type=jnp.float32)
        pre = pre + ti[:, None, :] + tj[None, :, :] + be_ref[0]
        mean = pre.mean(-1, keepdims=True)
        var = ((pre - mean) ** 2).mean(-1, keepdims=True)
        y = (pre - mean) * jax.lax.rsqrt(var + 1e-5) * lns_ref[0] + lnb_ref[0]
        y = jnp.maximum(y, 0.0)
        o = jnp.dot(y.reshape(Nl * Nl, H), wo_ref[:],
                    preferred_element_type=jnp.float32)
        return o.reshape(Nl, Nl, out_dim) + bo_ref[0]

    k_t = branch(wek_ref, wik_ref, wjk_ref, wok_ref, bok_ref, bek_ref,
                 lnsk_ref, lnbk_ref, H)
    v_dim = n_heads if pos_mode else H
    v_t = branch(wev_ref, wiv_ref, wjv_ref, wov_ref, bov_ref, bev_ref,
                 lnsv_ref, lnbv_ref, v_dim)

    hsum = hsum_ref[:]
    q = q_ref[0]                                     # [Nl, H]
    qk = q[:, None, :] * k_t
    logits = jnp.dot(qk.reshape(Nl * Nl, H), hsum,
                     preferred_element_type=jnp.float32)
    logits = logits.reshape(Nl, Nl, n_heads) / np.sqrt(hd)

    valid = mask_ref[0]                              # [Nl, Nl] float
    neg = jnp.float32(-1e30)
    logits = jnp.where(valid[..., None] > 0.5, logits, neg)
    m = jnp.maximum(jnp.max(logits, axis=1, keepdims=True), -1e29)
    e = jnp.where(valid[..., None] > 0.5, jnp.exp(logits - m), 0.0)
    denom = jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
    alpha = e / denom

    if pos_mode:
        rel = rel_ref[0]                             # [Nl, Nl, 4]
        w = (alpha * v_t).sum(-1) / n_heads
        out_ref[0] = (w[..., None] * rel).sum(axis=1)
    else:
        alpha_full = jnp.dot(alpha.reshape(Nl * Nl, n_heads), hsum.T,
                             preferred_element_type=jnp.float32)
        out_ref[0] = (alpha_full.reshape(Nl, Nl, H) * v_t).sum(axis=1)


@partial(jax.jit, static_argnames=('n_heads', 'pos_mode'))
def bond_attention_pallas(h_bond, h_lig, rel_pad, q, bond_mask,
                          we_k, wi_k, wj_k, wo_k, bo_k, be_k, lns_k, lnb_k,
                          we_v, wi_v, wj_v, wo_v, bo_v, be_v, lns_v, lnb_v,
                          *, n_heads: int, pos_mode: bool):
    """h_bond [B,Nl,Nl,H]; h_lig/q [B,Nl,H]; rel_pad [B,Nl,Nl,4];
    bond_mask [B,Nl,Nl] float; weights [H,H] (wo_v [H,heads] in pos mode);
    biases/LN [1,dim]. Returns [B,Nl,H] or [B,Nl,4]."""
    B, Nl, _, H = h_bond.shape
    out_dim = 4 if pos_mode else H
    v_out = n_heads if pos_mode else H

    def b4(b):
        return (b, 0, 0, 0)

    def b3(b):
        return (b, 0, 0)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_bond_kernel, n_heads=n_heads, pos_mode=pos_mode),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Nl, Nl, H), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, H), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, Nl, 4), b4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, H), b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, Nl), b3, memory_space=pltpu.VMEM),
            w_spec((H, n_heads)),
            w_spec((H, H)), w_spec((H, H)), w_spec((H, H)),
            w_spec((H, H)), w_spec((1, H)), w_spec((1, H)),
            w_spec((1, H)), w_spec((1, H)),
            w_spec((H, H)), w_spec((H, H)), w_spec((H, H)),
            w_spec((H, v_out)), w_spec((1, v_out)), w_spec((1, H)),
            w_spec((1, H)), w_spec((1, H)),
        ],
        out_specs=pl.BlockSpec((1, Nl, out_dim), b3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Nl, out_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == 'cpu',
    )(h_bond, h_lig, rel_pad, q, bond_mask,
      (jnp.arange(H)[:, None] // (H // n_heads) ==
       jnp.arange(n_heads)[None, :]).astype(jnp.float32),
      we_k, wi_k, wj_k, wo_k, bo_k, be_k, lns_k, lnb_k,
      we_v, wi_v, wj_v, wo_v, bo_v, be_v, lns_v, lnb_v)
