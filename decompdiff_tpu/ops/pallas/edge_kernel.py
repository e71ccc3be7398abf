"""Fused kNN edge attention kernel (Pallas/TPU).

Fuses, for one attention stream (node h-update or equivariant pos-update),
the whole per-edge pipeline of NodeEdgeAttention / PosEdgeAttention
(models/uni_transformer_bond.py; reference NodeUpdateLayer / PosUpdateLayer,
ref models/encoders/uni_transformer_edge.py:16-74,170-210):

    edge_feat = [outer(onehot(type), RBF(dist)), onehot(type)]   (84 dims)
    pre_m     = edge_feat @ We_m + t_i_m[dst] + t_j_m[src]       (m in {k, v})
    y_m       = relu(LayerNorm(pre_m))
    k         = y_k @ Wo_k + bo_k ;  v = (y_v @ Wo_v + bo_v) * e_w
    alpha     = masked softmax over the K neighbors of (q . k)/sqrt(hd)
    node mode: out[dst] = sum_k alpha * v                        [N, H]
    pos mode:  dx[dst]  = sum_k (mean_h alpha*v) * rel_x         [N, 4]

Only the O(N*K*H) j-projections (gathered once per layer by XLA) cross HBM;
every per-edge intermediate (84->128 features, pre, LN, relu, k, v, logits)
stays in VMEM. Head grouping uses the block-sum-matrix trick (no lane-split
reshapes). Distances/RBF are recomputed in-kernel from coordinate planes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from decompdiff_tpu.models.common import FIXED_RBF_OFFSETS

EDGE_FEAT_PAD = 128  # 4*20 outer + 4 type = 84, zero-padded


def _edge_kernel(xd_ref, xs_ref, eattr_ref, ew_ref, mask_ref, offs_ref,
                 hj_ref, tik_ref, tiv_ref, q_ref, hsum_ref,
                 wek_ref, wjk_ref, wok_ref, bok_ref, lnsk_ref, lnbk_ref,
                 wev_ref, wjv_ref, wov_ref, bov_ref, lnsv_ref, lnbv_ref,
                 out_ref, *, n_heads: int, pos_mode: bool):
    # xd [1,T,4]; xs [1,T,K,4]; etype/ew/mask [1,T,K]; hj [1,T,K,H]
    xd = xd_ref[0]                                  # [T, 4]
    xs = xs_ref[0]                                  # [T, K, 4]
    T, K, _ = xs.shape
    H = hj_ref.shape[-1]
    hd = H // n_heads
    hj = hj_ref[0].reshape(T * K, H)                # gathered raw h_src

    rel = xd[:, None, :] - xs                       # [T, K, 4] (4th comp 0)
    d2 = (rel * rel).sum(-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-24))         # [T, K]

    # RBF against the 20 fixed offsets (passed as an input row vector)
    dd = dist.reshape(T * K, 1) - offs_ref[0][None, :]   # [TK, R]
    rbf = jnp.exp(-0.5 * dd * dd)                        # [TK, R]
    eattr = eattr_ref[0]                            # [T, K, F] one-hot attrs
    F = eattr.shape[-1]
    R = rbf.shape[-1]
    attrs = [eattr[..., f].reshape(T * K, 1) for f in range(F)]

    def edge_first_linear(we_ref):
        # ef @ We decomposed: sum_f attr_f * (rbf @ We[f*R:(f+1)*R])
        #                   + sum_f attr_f * We[F*R + f]
        pre = None
        for f in range(F):
            proj = jnp.dot(rbf, we_ref[f * R:(f + 1) * R, :],
                           preferred_element_type=jnp.float32)   # [TK, H]
            term = attrs[f] * (proj + we_ref[F * R + f, :][None, :])
            pre = term if pre is None else pre + term
        return pre

    def branch(we_ref, wj_ref, wo_ref, bo_ref, lns_ref, lnb_ref, ti_ref,
               out_dim):
        # j-projection applied in-kernel: one raw-h gather feeds both nets
        pre = edge_first_linear(we_ref)
        pre = pre + jnp.dot(hj, wj_ref[:],
                            preferred_element_type=jnp.float32)
        pre = pre.reshape(T, K, H)
        pre = pre + ti_ref[0][:, None, :]
        mean = pre.mean(-1, keepdims=True)
        var = ((pre - mean) ** 2).mean(-1, keepdims=True)
        y = (pre - mean) * jax.lax.rsqrt(var + 1e-5) * lns_ref[0] + lnb_ref[0]
        y = jnp.maximum(y, 0.0)
        o = jnp.dot(y.reshape(T * K, H), wo_ref[:],
                    preferred_element_type=jnp.float32)
        return o.reshape(T, K, out_dim) + bo_ref[0]

    k_t = branch(wek_ref, wjk_ref, wok_ref, bok_ref, lnsk_ref, lnbk_ref,
                 tik_ref, H)
    v_dim = n_heads if pos_mode else H
    v_t = branch(wev_ref, wjv_ref, wov_ref, bov_ref, lnsv_ref, lnbv_ref,
                 tiv_ref, v_dim)
    v_t = v_t * ew_ref[0][..., None]

    hsum = hsum_ref[:]                               # [H, heads]
    q = q_ref[0]                                     # [T, H]
    qk = q[:, None, :] * k_t                         # [T, K, H]
    logits = jnp.dot(qk.reshape(T * K, H), hsum,
                     preferred_element_type=jnp.float32)
    logits = logits.reshape(T, K, n_heads) / np.sqrt(hd)

    valid = mask_ref[0]                              # [T, K] float
    neg = jnp.float32(-1e30)
    logits = jnp.where(valid[..., None] > 0.5, logits, neg)
    m = jnp.maximum(jnp.max(logits, axis=1, keepdims=True), -1e29)
    e = jnp.where(valid[..., None] > 0.5, jnp.exp(logits - m), 0.0)
    denom = jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
    alpha = e / denom                                # [T, K, heads]

    if pos_mode:
        # dx = sum_k (mean_h alpha*v) * rel  (ref PosUpdateLayer :201-210)
        w = (alpha * v_t).sum(-1) / n_heads          # [T, K]
        out_ref[0] = (w[..., None] * rel).sum(axis=1)  # [T, 4]
    else:
        alpha_full = jnp.dot(alpha.reshape(T * K, n_heads), hsum.T,
                             preferred_element_type=jnp.float32)
        alpha_full = alpha_full.reshape(T, K, H)
        out_ref[0] = (alpha_full * v_t).sum(axis=1)  # [T, H]


@partial(jax.jit, static_argnames=('n_heads', 'pos_mode', 'tile'))
def edge_attention_pallas(x_pad, xj_pad, eattr, e_w, nbr_mask,
                          hj, ti_k, ti_v, q,
                          we_k, wj_k, wo_k, bo_k, lns_k, lnb_k,
                          we_v, wj_v, wo_v, bo_v, lns_v, lnb_v,
                          *, n_heads: int, pos_mode: bool, tile: int = 64):
    """Args (all float32 unless noted):
        x_pad:   [B, N, 4] dst coords (4th component 0)
        xj_pad:  [B, N, K, 4] gathered src coords
        eattr:   [B, N, K, F] one-hot edge attrs (4-dim ll/lp/pl/pp, +2 when
                 the same-decomp-group bit is on; F*21 <= 128)
        e_w:     [B, N, K] global edge weights (1.0 when disabled)
        nbr_mask:[B, N, K] valid-edge floats
        hj:      [B, N, K, H] gathered raw src features (one gather feeds
                 both nets; j-projections run in-kernel via wj_*)
        ti_*:    [B, N, H] dst projections (include first-linear bias here)
        q:       [B, N, H] query projections
        we_*:    [128, H] padded edge-feature projection (84 rows used)
        wo_k:    [H, H]; wo_v: [H, H] (node) or [H, heads] (pos)
        bo_*/lns_*/lnb_*: [1, H] (bo_v [1, heads] in pos mode)
    Returns [B, N, H] (node mode) or [B, N, 4] dx (pos mode).
    """
    B, N, K, H = hj.shape
    F = eattr.shape[-1]
    assert F * 21 <= EDGE_FEAT_PAD, F
    offsets = jnp.asarray(np.asarray(FIXED_RBF_OFFSETS, np.float32))[None, :]
    if N % tile != 0:
        tile = min(tile, N)
        while N % tile != 0:
            tile //= 2
    assert N % tile == 0, (N, tile)
    grid = (B, N // tile)
    out_dim = 4 if pos_mode else H

    def bt3(b, t):
        return (b, t, 0)

    def bt4(b, t):
        return (b, t, 0, 0)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    v_out = n_heads if pos_mode else H
    return pl.pallas_call(
        partial(_edge_kernel, n_heads=n_heads, pos_mode=pos_mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, 4), bt3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, K, 4), bt4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, K, F), bt4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, K), bt3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, K), bt3, memory_space=pltpu.VMEM),
            w_spec((1, len(FIXED_RBF_OFFSETS))),
            pl.BlockSpec((1, tile, K, H), bt4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, H), bt3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, H), bt3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, H), bt3, memory_space=pltpu.VMEM),
            w_spec((H, n_heads)),
            w_spec((EDGE_FEAT_PAD, H)), w_spec((H, H)), w_spec((H, H)),
            w_spec((1, H)), w_spec((1, H)), w_spec((1, H)),
            w_spec((EDGE_FEAT_PAD, H)), w_spec((H, H)), w_spec((H, v_out)),
            w_spec((1, v_out)), w_spec((1, H)), w_spec((1, H)),
        ],
        out_specs=pl.BlockSpec((1, tile, out_dim), bt3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, out_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == 'cpu',
    )(x_pad, xj_pad, eattr, e_w, nbr_mask, offsets, hj, ti_k, ti_v, q,
      (jnp.arange(H)[:, None] // (H // n_heads) ==
       jnp.arange(n_heads)[None, :]).astype(jnp.float32),
      we_k, wj_k, wo_k, bo_k, lns_k, lnb_k,
      we_v, wj_v, wo_v, bo_v, lns_v, lnb_v)
