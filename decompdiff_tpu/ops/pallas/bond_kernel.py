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


def _specs(B, Nl, H, n_heads, pos_mode):
    out_dim = 4 if pos_mode else H
    v_out = n_heads if pos_mode else H

    def b4(b):
        return (b, 0, 0, 0)

    def b3(b):
        return (b, 0, 0)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # node mode never reads rel: callers pass a [B, 1, 1, 4] dummy and the
    # block shrinks with it — no dead [Nl, Nl, 4] DMA per program
    rel_block = (1, Nl, Nl, 4) if pos_mode else (1, 1, 1, 4)
    in_specs = [
        pl.BlockSpec((1, Nl, Nl, H), b4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Nl, H), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec(rel_block, b4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Nl, H), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Nl, Nl), b3, memory_space=pltpu.VMEM),
        w_spec((H, n_heads)),
        w_spec((H, H)), w_spec((H, H)), w_spec((H, H)),
        w_spec((H, H)), w_spec((1, H)), w_spec((1, H)),
        w_spec((1, H)), w_spec((1, H)),
        w_spec((H, H)), w_spec((H, H)), w_spec((H, H)),
        w_spec((H, v_out)), w_spec((1, v_out)), w_spec((1, H)),
        w_spec((1, H)), w_spec((1, H)),
    ]
    return in_specs, b3, b4, w_spec, out_dim, v_out


def _hsum(H, n_heads):
    return (jnp.arange(H)[:, None] // (H // n_heads) ==
            jnp.arange(n_heads)[None, :]).astype(jnp.float32)


def _bond_fwd_call(n_heads, pos_mode, h_bond, h_lig, rel_pad, q, bond_mask,
                   hsum, *params):
    B, Nl, _, H = h_bond.shape
    in_specs, b3, b4, w_spec, out_dim, _ = _specs(B, Nl, H, n_heads, pos_mode)
    return pl.pallas_call(
        partial(_bond_kernel, n_heads=n_heads, pos_mode=pos_mode),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Nl, out_dim), b3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Nl, out_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == 'cpu',
    )(h_bond, h_lig, rel_pad, q, bond_mask, hsum, *params)


# --------------------------------------------------------------------------
# Backward: fused kernel, recompute-in-VMEM (see triplet_kernel.py for the
# scheme). Node cotangents are per-program; parameter cotangents accumulate
# across the sequential (B,) grid into resident VMEM blocks.
# --------------------------------------------------------------------------

def _bond_bwd_kernel(g_ref, hbond_ref, h_ref, rel_ref, q_ref, mask_ref,
                     hsum_ref,
                     wek_ref, wik_ref, wjk_ref, wok_ref, bok_ref, bek_ref,
                     lnsk_ref, lnbk_ref,
                     wev_ref, wiv_ref, wjv_ref, wov_ref, bov_ref, bev_ref,
                     lnsv_ref, lnbv_ref,
                     d_hbond_ref, d_h_ref, d_rel_ref, d_q_ref,
                     d_wek_ref, d_wik_ref, d_wjk_ref, d_wok_ref, d_bok_ref,
                     d_bek_ref, d_lnsk_ref, d_lnbk_ref,
                     d_wev_ref, d_wiv_ref, d_wjv_ref, d_wov_ref, d_bov_ref,
                     d_bev_ref, d_lnsv_ref, d_lnbv_ref,
                     *, n_heads: int, pos_mode: bool):
    b = pl.program_id(0)
    hbond = hbond_ref[0]
    Nl = hbond.shape[0]
    H = hbond.shape[-1]
    hd = H // n_heads
    NN = Nl * Nl
    h = h_ref[0]
    hb2 = hbond.reshape(NN, H)
    eps = 1e-5

    def recompute(we_ref, wi_ref, wj_ref, wo_ref, bo_ref, be_ref,
                  lns_ref, lnb_ref, out_dim):
        pre = jnp.dot(hb2, we_ref[:], preferred_element_type=jnp.float32)
        pre = pre.reshape(Nl, Nl, H)
        ti = jnp.dot(h, wi_ref[:], preferred_element_type=jnp.float32)
        tj = jnp.dot(h, wj_ref[:], preferred_element_type=jnp.float32)
        pre = pre + ti[:, None, :] + tj[None, :, :] + be_ref[0]
        mean = pre.mean(-1, keepdims=True)
        var = ((pre - mean) ** 2).mean(-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (pre - mean) * rstd
        y = jnp.maximum(xhat * lns_ref[0] + lnb_ref[0], 0.0)
        o = jnp.dot(y.reshape(NN, H), wo_ref[:],
                    preferred_element_type=jnp.float32)
        return xhat, rstd, y, o.reshape(Nl, Nl, out_dim) + bo_ref[0]

    xhat_k, rstd_k, y_k, k_t = recompute(wek_ref, wik_ref, wjk_ref, wok_ref,
                                         bok_ref, bek_ref, lnsk_ref,
                                         lnbk_ref, H)
    v_dim = n_heads if pos_mode else H
    xhat_v, rstd_v, y_v, v_t = recompute(wev_ref, wiv_ref, wjv_ref, wov_ref,
                                         bov_ref, bev_ref, lnsv_ref,
                                         lnbv_ref, v_dim)

    hsum = hsum_ref[:]
    q = q_ref[0]
    qk = q[:, None, :] * k_t
    scale = 1.0 / np.sqrt(hd)
    logits = jnp.dot(qk.reshape(NN, H), hsum,
                     preferred_element_type=jnp.float32)
    logits = logits.reshape(Nl, Nl, n_heads) * scale
    valid = mask_ref[0]
    logits = jnp.where(valid[..., None] > 0.5, logits, jnp.float32(-1e30))
    m = jnp.maximum(jnp.max(logits, axis=1, keepdims=True), -1e29)
    e = jnp.where(valid[..., None] > 0.5, jnp.exp(logits - m), 0.0)
    denom = jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
    alpha = e * (1.0 / denom)                         # [dst, src, heads]

    g = g_ref[0]                                      # [Nl, H] or [Nl, 4]
    if pos_mode:
        rel = rel_ref[0]                              # [Nl, Nl, 4]
        w = (alpha * v_t).sum(-1) * (1.0 / n_heads)   # [dst, src]
        d_rel_ref[0] = w[..., None] * g[:, None, :]
        d_w = (rel * g[:, None, :]).sum(-1)           # [dst, src]
        d_alpha = d_w[..., None] * v_t * (1.0 / n_heads)
        d_vt = d_w[..., None] * alpha * (1.0 / n_heads)
    else:
        d_rel_ref[0] = jnp.zeros_like(rel_ref[0])
        alpha_full = jnp.dot(alpha.reshape(NN, n_heads), hsum.T,
                             preferred_element_type=jnp.float32)
        alpha_full = alpha_full.reshape(Nl, Nl, H)
        d_vt = alpha_full * g[:, None, :]
        d_alpha_full = g[:, None, :] * v_t
        d_alpha = jnp.dot(d_alpha_full.reshape(NN, H), hsum,
                          preferred_element_type=jnp.float32)
        d_alpha = d_alpha.reshape(Nl, Nl, n_heads)

    s_dot = (alpha * d_alpha).sum(axis=1, keepdims=True)
    d_logits = alpha * (d_alpha - s_dot)
    d_qk = jnp.dot(d_logits.reshape(NN, n_heads), hsum.T,
                   preferred_element_type=jnp.float32)
    d_qk = d_qk.reshape(Nl, Nl, H) * scale
    d_q_ref[0] = (d_qk * k_t).sum(axis=1)
    d_kt = d_qk * q[:, None, :]

    first = b == 0

    def branch_bwd(d_o, xhat, rstd, y, we_ref, wi_ref, wj_ref, wo_ref,
                   lns_ref,
                   d_we_ref, d_wi_ref, d_wj_ref, d_wo_ref, d_bo_ref,
                   d_be_ref, d_lns_ref, d_lnb_ref, out_dim):
        d_o2 = d_o.reshape(NN, out_dim)
        y2 = y.reshape(NN, H)

        @pl.when(first)
        def _():
            d_we_ref[...] = jnp.zeros_like(d_we_ref)
            d_wi_ref[...] = jnp.zeros_like(d_wi_ref)
            d_wj_ref[...] = jnp.zeros_like(d_wj_ref)
            d_wo_ref[...] = jnp.zeros_like(d_wo_ref)
            d_bo_ref[...] = jnp.zeros_like(d_bo_ref)
            d_be_ref[...] = jnp.zeros_like(d_be_ref)
            d_lns_ref[...] = jnp.zeros_like(d_lns_ref)
            d_lnb_ref[...] = jnp.zeros_like(d_lnb_ref)

        d_bo_ref[...] += d_o2.sum(axis=0, keepdims=True)
        d_wo_ref[...] += jax.lax.dot_general(
            y2, d_o2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_y = jax.lax.dot_general(
            d_o2, wo_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(Nl, Nl, H)
        d_u = d_y * (y > 0.0).astype(jnp.float32)
        d_lns_ref[...] += (d_u * xhat).reshape(NN, H).sum(axis=0,
                                                          keepdims=True)
        d_lnb_ref[...] += d_u.reshape(NN, H).sum(axis=0, keepdims=True)
        d_xhat = d_u * lns_ref[0]
        d_pre = rstd * (d_xhat - d_xhat.mean(-1, keepdims=True)
                        - xhat * (d_xhat * xhat).mean(-1, keepdims=True))
        d_be_ref[...] += d_pre.reshape(NN, H).sum(axis=0, keepdims=True)
        d_ti = d_pre.sum(axis=1)                      # [dst, H]
        d_tj = d_pre.sum(axis=0)                      # [src, H]
        d_wi_ref[...] += jax.lax.dot_general(
            h, d_ti, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_wj_ref[...] += jax.lax.dot_general(
            h, d_tj, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_h = (jax.lax.dot_general(d_ti, wi_ref[:], (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(d_tj, wj_ref[:], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32))
        d_pre2 = d_pre.reshape(NN, H)
        d_we_ref[...] += jax.lax.dot_general(
            hb2, d_pre2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_hb = jax.lax.dot_general(
            d_pre2, we_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(Nl, Nl, H)
        return d_hb, d_h

    d_hb_k, d_h_k = branch_bwd(
        d_kt, xhat_k, rstd_k, y_k, wek_ref, wik_ref, wjk_ref, wok_ref,
        lnsk_ref, d_wek_ref, d_wik_ref, d_wjk_ref, d_wok_ref, d_bok_ref,
        d_bek_ref, d_lnsk_ref, d_lnbk_ref, H)
    d_hb_v, d_h_v = branch_bwd(
        d_vt, xhat_v, rstd_v, y_v, wev_ref, wiv_ref, wjv_ref, wov_ref,
        lnsv_ref, d_wev_ref, d_wiv_ref, d_wjv_ref, d_wov_ref, d_bov_ref,
        d_bev_ref, d_lnsv_ref, d_lnbv_ref, v_dim)

    d_hbond_ref[0] = d_hb_k + d_hb_v
    d_h_ref[0] = d_h_k + d_h_v


def _bond_bwd_call(n_heads, pos_mode, g, h_bond, h_lig, rel_pad, q,
                   bond_mask, hsum, *params):
    B, Nl, _, H = h_bond.shape
    in_specs, b3, b4, w_spec, out_dim, v_out = _specs(B, Nl, H, n_heads,
                                                     pos_mode)
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((B, Nl, Nl, H), f32),    # d_hbond
        jax.ShapeDtypeStruct((B, Nl, H), f32),        # d_h
        jax.ShapeDtypeStruct(rel_pad.shape, f32),     # d_rel (tiny in node mode)
        jax.ShapeDtypeStruct((B, Nl, H), f32),        # d_q
        jax.ShapeDtypeStruct((H, H), f32),            # d_we_k
        jax.ShapeDtypeStruct((H, H), f32),            # d_wi_k
        jax.ShapeDtypeStruct((H, H), f32),            # d_wj_k
        jax.ShapeDtypeStruct((H, H), f32),            # d_wo_k
        jax.ShapeDtypeStruct((1, H), f32),            # d_bo_k
        jax.ShapeDtypeStruct((1, H), f32),            # d_be_k
        jax.ShapeDtypeStruct((1, H), f32),            # d_lns_k
        jax.ShapeDtypeStruct((1, H), f32),            # d_lnb_k
        jax.ShapeDtypeStruct((H, H), f32),            # d_we_v
        jax.ShapeDtypeStruct((H, H), f32),            # d_wi_v
        jax.ShapeDtypeStruct((H, H), f32),            # d_wj_v
        jax.ShapeDtypeStruct((H, v_out), f32),        # d_wo_v
        jax.ShapeDtypeStruct((1, v_out), f32),        # d_bo_v
        jax.ShapeDtypeStruct((1, H), f32),            # d_be_v
        jax.ShapeDtypeStruct((1, H), f32),            # d_lns_v
        jax.ShapeDtypeStruct((1, H), f32),            # d_lnb_v
    )
    rel_block = (1, Nl, Nl, 4) if pos_mode else (1, 1, 1, 4)
    out_specs = (
        pl.BlockSpec((1, Nl, Nl, H), b4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Nl, H), b3, memory_space=pltpu.VMEM),
        pl.BlockSpec(rel_block, b4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Nl, H), b3, memory_space=pltpu.VMEM),
        w_spec((H, H)), w_spec((H, H)), w_spec((H, H)), w_spec((H, H)),
        w_spec((1, H)), w_spec((1, H)), w_spec((1, H)), w_spec((1, H)),
        w_spec((H, H)), w_spec((H, H)), w_spec((H, H)), w_spec((H, v_out)),
        w_spec((1, v_out)), w_spec((1, H)), w_spec((1, H)), w_spec((1, H)),
    )
    g_spec = pl.BlockSpec((1, Nl, out_dim), b3, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_bond_bwd_kernel, n_heads=n_heads, pos_mode=pos_mode),
        grid=(B,),
        in_specs=[g_spec] + in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == 'cpu',
    )(g, h_bond, h_lig, rel_pad, q, bond_mask, hsum, *params)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _bond_core(n_heads, pos_mode, h_bond, h_lig, rel_pad, q, bond_mask,
               hsum, *params):
    return _bond_fwd_call(n_heads, pos_mode, h_bond, h_lig, rel_pad, q,
                          bond_mask, hsum, *params)


def _bond_core_fwd(n_heads, pos_mode, *args):
    return _bond_core(n_heads, pos_mode, *args), args


def _bond_core_bwd(n_heads, pos_mode, res, g):
    h_bond, h_lig, rel_pad, q, bond_mask, hsum = res[:6]
    params = res[6:]
    outs = _bond_bwd_call(n_heads, pos_mode, g, h_bond, h_lig, rel_pad, q,
                          bond_mask, hsum, *params)
    d_hbond, d_h, d_rel, d_q = outs[:4]
    return (d_hbond, d_h, d_rel, d_q, jnp.zeros_like(bond_mask),
            jnp.zeros_like(hsum)) + tuple(outs[4:])


_bond_core.defvjp(_bond_core_fwd, _bond_core_bwd)


@partial(jax.jit, static_argnames=('n_heads', 'pos_mode'))
def bond_attention_pallas(h_bond, h_lig, rel_pad, q, bond_mask,
                          we_k, wi_k, wj_k, wo_k, bo_k, be_k, lns_k, lnb_k,
                          we_v, wi_v, wj_v, wo_v, bo_v, be_v, lns_v, lnb_v,
                          *, n_heads: int, pos_mode: bool):
    """h_bond [B,Nl,Nl,H]; h_lig/q [B,Nl,H]; rel_pad [B,Nl,Nl,4];
    bond_mask [B,Nl,Nl] float; weights [H,H] (wo_v [H,heads] in pos mode);
    biases/LN [1,dim]. Returns [B,Nl,H] or [B,Nl,4].

    Differentiable via a fused recompute-in-VMEM backward kernel (same
    scheme as triplet_kernel.py)."""
    H = h_bond.shape[-1]
    return _bond_core(n_heads, pos_mode, h_bond, h_lig, rel_pad, q,
                      bond_mask, _hsum(H, n_heads),
                      we_k, wi_k, wj_k, wo_k, bo_k, be_k, lns_k, lnb_k,
                      we_v, wi_v, wj_v, wo_v, bo_v, be_v, lns_v, lnb_v)
