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
            q_ref, mask_ref, hh_ref,
            wa_k_ref, wo_k_ref, bo_k_ref, lns_k_ref, lnb_k_ref,
            wa_v_ref, wo_v_ref, bo_v_ref, lns_v_ref, lnb_v_ref,
            out_ref, *, n_heads: int, bf16: bool, i_block: int):
    # a block of i_block destination atoms per program: fewer, larger
    # programs amortize per-program overhead and DMA latency
    IB = i_block
    i0 = pl.program_id(1) * IB
    angle = angle_ref[0]            # [IB, Nl_j, Nl_k]
    Nl = angle.shape[-1]
    H = tkj_k_ref.shape[-1]
    hd = H // n_heads
    NN = IB * Nl * Nl

    af = _angular_encode_padded(angle)                 # [IB, Nl, Nl, 16]
    af2 = af.reshape(NN, ANG_PAD)

    def branch(tkj_ref, tij_ref, wa_ref, wo_ref, bo_ref, lns_ref, lnb_ref):
        pre = jnp.dot(af2, wa_ref[:],
                      preferred_element_type=jnp.float32)    # [NN, H]
        pre = pre.reshape(IB, Nl, Nl, H)
        pre = pre + tkj_ref[0][None]                        # (j,k) terms+bias
        pre = pre + tij_ref[0][:, :, None, :]               # (i,j) term
        y = _layer_norm(pre, lns_ref[0], lnb_ref[0])
        y = jnp.maximum(y, 0.0)
        y2 = y.reshape(NN, H)
        wo = wo_ref[:]
        if bf16:
            # the second linear dominates the kernel's FLOPs; bf16 inputs
            # with f32 accumulation trade ~1e-3 absolute error for MXU rate
            y2 = y2.astype(jnp.bfloat16)
            wo = wo.astype(jnp.bfloat16)
        o = jnp.dot(y2, wo, preferred_element_type=jnp.float32)
        return o.reshape(IB, Nl, Nl, H) + bo_ref[0]

    k_t = branch(tkj_k_ref, tij_k_ref, wa_k_ref, wo_k_ref, bo_k_ref,
                 lns_k_ref, lnb_k_ref)
    v_t = branch(tkj_v_ref, tij_v_ref, wa_v_ref, wo_v_ref, bo_v_ref,
                 lns_v_ref, lnb_v_ref)

    # Head grouping without lane-splitting reshapes (unsupported in Mosaic):
    # HH = hsum @ hsum.T is block-diagonal ones over each head's hd lanes, so
    # ONE (q*k) @ HH matmul both sums logits within heads and replicates the
    # head logit back to all of its lanes; the softmax then runs per-lane and
    # no post-softmax head-expansion matmul is needed.
    q = q_ref[0]                                           # [IB, j, H]
    qk = q[:, :, None, :] * k_t                            # [IB, j, k, H]
    scale = 1.0 / np.sqrt(hd)
    hlog = jnp.dot(qk.reshape(NN, H), hh_ref[:],
                   preferred_element_type=jnp.float32)
    hlog = hlog.reshape(IB, Nl, Nl, H) * scale             # lane = head logit

    # triplet mask: bond (j->i) at mask[i, j], bond (k->j) at mask[j, k], k != i
    bm = mask_ref[0]                                       # [Nl, Nl] float
    bm_i = mask_ref[0, pl.ds(i0, IB), :]                   # [IB, Nl_j]
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (IB, Nl, Nl), 2)
    i_ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (IB, Nl, Nl), 0)
    valid = (bm_i[:, :, None] * bm[None]) * (
        k_ids != i_ids).astype(jnp.float32)
    neg = jnp.float32(-1e30)
    hlog = jnp.where(valid[..., None] > 0.5, hlog, neg)
    m = jnp.max(hlog, axis=2, keepdims=True)
    m = jnp.maximum(m, -1e29)
    e = jnp.where(valid[..., None] > 0.5, jnp.exp(hlog - m), 0.0)
    denom = jnp.maximum(e.sum(axis=2, keepdims=True), 1e-16)
    alpha = e * (1.0 / denom)                   # [IB, j, k, H] head-replicated

    out = (alpha * v_t).sum(axis=2)                         # [IB, j, H]
    out_ref[0] = out


@partial(jax.jit, static_argnames=('n_heads', 'bf16', 'i_block'))
def triplet_attention_pallas(angle, tkj_k, tij_k, tkj_v, tij_v, q, bond_mask,
                             wa_k, wo_k, bo_k, lns_k, lnb_k,
                             wa_v, wo_v, bo_v, lns_v, lnb_v, *, n_heads: int,
                             bf16: bool = False, i_block: int = 4):
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
    head_id = jnp.arange(H) // hd
    hh = (head_id[:, None] == head_id[None, :]).astype(jnp.float32)  # [H, H]
    IB = min(i_block, Nl)
    while Nl % IB != 0:
        IB //= 2
    grid = (B, Nl // IB)

    def b_only(b, i):
        return (b, 0, 0, 0)

    def bi(b, i):
        return (b, i, 0, 0)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_kernel, n_heads=n_heads, bf16=bf16, i_block=IB),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, IB, Nl, Nl), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),     # angle[b, i-block]
            pl.BlockSpec((1, Nl, Nl, H), b_only, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IB, Nl, H), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, Nl, H), b_only, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IB, Nl, H), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IB, Nl, H), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, Nl), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),     # bond_mask[b]
            w_spec((H, H)),                            # block-diag head matrix
            w_spec((ANG_PAD, H)), w_spec((H, H)), w_spec((1, H)),
            w_spec((1, H)), w_spec((1, H)),
            w_spec((ANG_PAD, H)), w_spec((H, H)), w_spec((1, H)),
            w_spec((1, H)), w_spec((1, H)),
        ],
        out_specs=pl.BlockSpec((1, IB, Nl, H), bi, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Nl, Nl, H), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == 'cpu',
    )(angle, tkj_k, tij_k, tkj_v, tij_v, q, bond_mask, hh,
      wa_k, wo_k, bo_k, lns_k, lnb_k, wa_v, wo_v, bo_v, lns_v, lnb_v)
