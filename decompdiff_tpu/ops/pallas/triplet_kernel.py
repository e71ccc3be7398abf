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

from decompdiff_tpu.ops.pallas.common import head_matrix as _head_matrix
from decompdiff_tpu.ops.pallas.common import lane_mean as _lane_mean

ANG_PAD = 16  # 13-dim angular code padded to a lane-friendly 16


_ANG_FREQS = (1.0, 2.0, 3.0, 1.0, 0.5, 1.0 / 3.0)


def _ang_table() -> np.ndarray:
    """[4, 16] lane tables for the in-kernel angular code: rows are
    (frequency, x-select, sin-select, cos-select) over the 16 output lanes
    [x | sin(x*f) x6 | cos(x*f) x6 | 0 x3]. Passed as a kernel input —
    Mosaic kernels cannot capture array constants."""
    t = np.zeros((4, ANG_PAD), np.float32)
    t[0, 1:7] = _ANG_FREQS
    t[0, 7:13] = _ANG_FREQS
    t[1, 0] = 1.0
    t[2, 1:7] = 1.0
    t[3, 7:13] = 1.0
    return t


def _fast_sincos(arg):
    """sin/cos for args bounded by a few pi (here [0, 3*pi]): round-to-
    nearest-pi range reduction + degree-9/10 Taylor on [-pi/2, pi/2]
    (|err| < 4e-6 — float32 noise level). The generic jnp.sin/cos lowering
    with full IEEE range reduction costs ~4x more VPU ops and was ~35% of
    this kernel's runtime (round-3 microbench)."""
    k = jnp.floor(arg * (1.0 / np.pi) + 0.5)
    r = arg - k * np.pi
    odd = k - 2.0 * jnp.floor(k * 0.5)
    sign = 1.0 - 2.0 * odd
    r2 = r * r
    s = r * (1.0 + r2 * (-1.0 / 6 + r2 * (1.0 / 120 + r2 * (
        -1.0 / 5040 + r2 * (1.0 / 362880)))))
    c = 1.0 + r2 * (-0.5 + r2 * (1.0 / 24 + r2 * (-1.0 / 720 + r2 * (
        1.0 / 40320 + r2 * (-1.0 / 3628800)))))
    return sign * s, sign * c


def _angular_encode_padded(x, angf):
    """[IB, Nj, Nk] -> [IB*Nj*Nk, 16]: [x, sin(x*f), cos(x*f), 0, 0, 0] with
    f = (1, 2, 3, 1, 1/2, 1/3) (models/common.py angular_encoding + zero
    pad), built lane-parallel: ONE [NN, 16] broadcast of the cubic scalar,
    then one fast sin/cos pass selected per lane by the `angf` table rows.
    The round-2 13-way jnp.stack forced a cubic-array relayout per column
    and dominated the whole kernel (~half its runtime)."""
    NN = int(np.prod(x.shape))
    xb = jnp.broadcast_to(x[..., None], x.shape + (ANG_PAD,)).reshape(
        NN, ANG_PAD)
    freq, xsel, sinsel, cossel = (angf[0:1], angf[1:2], angf[2:3], angf[3:4])
    s, c = _fast_sincos(xb * freq)
    return xb * xsel + s * sinsel + c * cossel


def _layer_norm(x, scale, bias, eps=1e-5):
    d = x - _lane_mean(x)
    var = _lane_mean(d * d)
    return d * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(angle_ref, tkj_k_ref, tij_k_ref, tkj_v_ref, tij_v_ref,
            q_ref, mask_ref, hh_ref, angf_ref,
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

    af2 = _angular_encode_padded(angle, angf_ref[:])   # [NN, 16]

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


def _pick_i_block(i_block: int, Nl: int) -> int:
    IB = min(i_block, Nl)
    while Nl % IB != 0:
        IB //= 2
    return IB


def _fwd_call(n_heads, bf16, IB, angle, tkj_k, tij_k, tkj_v, tij_v, q,
              bond_mask, hh, angf, wa_k, wo_k, bo_k, lns_k, lnb_k,
              wa_v, wo_v, bo_v, lns_v, lnb_v):
    B, Nl = angle.shape[0], angle.shape[1]
    H = tkj_k.shape[-1]
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
            w_spec((4, ANG_PAD)),                      # angular lane tables
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
    )(angle, tkj_k, tij_k, tkj_v, tij_v, q, bond_mask, hh, angf,
      wa_k, wo_k, bo_k, lns_k, lnb_k, wa_v, wo_v, bo_v, lns_v, lnb_v)


# --------------------------------------------------------------------------
# Backward: one fused kernel that recomputes every cubic intermediate in
# VMEM (rematerialization — the HBM cost of saving them would dwarf the
# recompute FLOPs on TPU) and emits cotangents for all inputs and params.
# Parameter grads and the i-summed d_tkj accumulate across sequential grid
# programs into resident VMEM output blocks.
# --------------------------------------------------------------------------

def _angular_grad_code(x, angf):
    """d(angular code)/dx as 16 lanes: [1, f*cos(f x)..., -f*sin(f x)..., 0],
    lane-parallel like _angular_encode_padded."""
    NN = int(np.prod(x.shape))
    xb = jnp.broadcast_to(x[..., None], x.shape + (ANG_PAD,)).reshape(
        NN, ANG_PAD)
    freq, xsel, sinsel, cossel = (angf[0:1], angf[1:2], angf[2:3], angf[3:4])
    s, c = _fast_sincos(xb * freq)
    return xsel + freq * c * sinsel - freq * s * cossel


def _bwd_kernel(g_ref, angle_ref, tkj_k_ref, tij_k_ref, tkj_v_ref, tij_v_ref,
                q_ref, mask_ref, hh_ref, angf_ref,
                wa_k_ref, wo_k_ref, bo_k_ref, lns_k_ref, lnb_k_ref,
                wa_v_ref, wo_v_ref, bo_v_ref, lns_v_ref, lnb_v_ref,
                d_angle_ref, d_tkj_k_ref, d_tij_k_ref, d_tkj_v_ref,
                d_tij_v_ref, d_q_ref,
                d_wa_k_ref, d_wo_k_ref, d_bo_k_ref, d_lns_k_ref, d_lnb_k_ref,
                d_wa_v_ref, d_wo_v_ref, d_bo_v_ref, d_lns_v_ref, d_lnb_v_ref,
                *, n_heads: int, i_block: int):
    IB = i_block
    b = pl.program_id(0)
    ip = pl.program_id(1)
    i0 = ip * IB
    angle = angle_ref[0]            # [IB, Nl, Nl]
    Nl = angle.shape[-1]
    H = tkj_k_ref.shape[-1]
    hd = H // n_heads
    NN = IB * Nl * Nl
    eps = 1e-5

    af2 = _angular_encode_padded(angle, angf_ref[:])

    def recompute(tkj_ref, tij_ref, wa_ref, lns_ref, lnb_ref):
        """Replay of the forward branch, returning what its backward needs."""
        pre = jnp.dot(af2, wa_ref[:], preferred_element_type=jnp.float32)
        pre = pre.reshape(IB, Nl, Nl, H)
        pre = pre + tkj_ref[0][None] + tij_ref[0][:, :, None, :]
        d = pre - _lane_mean(pre)
        rstd = jax.lax.rsqrt(_lane_mean(d * d) + eps)
        xhat = d * rstd
        u = xhat * lns_ref[0] + lnb_ref[0]
        y = jnp.maximum(u, 0.0)
        return xhat, rstd, y

    xhat_k, rstd_k, y_k = recompute(tkj_k_ref, tij_k_ref, wa_k_ref,
                                    lns_k_ref, lnb_k_ref)
    xhat_v, rstd_v, y_v = recompute(tkj_v_ref, tij_v_ref, wa_v_ref,
                                    lns_v_ref, lnb_v_ref)
    k_t = (jnp.dot(y_k.reshape(NN, H), wo_k_ref[:],
                   preferred_element_type=jnp.float32).reshape(IB, Nl, Nl, H)
           + bo_k_ref[0])
    v_t = (jnp.dot(y_v.reshape(NN, H), wo_v_ref[:],
                   preferred_element_type=jnp.float32).reshape(IB, Nl, Nl, H)
           + bo_v_ref[0])

    # attention replay (identical masking to _kernel)
    q = q_ref[0]
    qk = q[:, :, None, :] * k_t
    scale = 1.0 / np.sqrt(hd)
    hlog = jnp.dot(qk.reshape(NN, H), hh_ref[:],
                   preferred_element_type=jnp.float32)
    hlog = hlog.reshape(IB, Nl, Nl, H) * scale
    bm = mask_ref[0]
    bm_i = mask_ref[0, pl.ds(i0, IB), :]
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (IB, Nl, Nl), 2)
    i_ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (IB, Nl, Nl), 0)
    valid = (bm_i[:, :, None] * bm[None]) * (
        k_ids != i_ids).astype(jnp.float32)
    hlog = jnp.where(valid[..., None] > 0.5, hlog, jnp.float32(-1e30))
    m = jnp.maximum(jnp.max(hlog, axis=2, keepdims=True), -1e29)
    e = jnp.where(valid[..., None] > 0.5, jnp.exp(hlog - m), 0.0)
    denom = jnp.maximum(e.sum(axis=2, keepdims=True), 1e-16)
    alpha = e * (1.0 / denom)

    # attention backward
    g = g_ref[0]                                       # [IB, j, H]
    d_vt = alpha * g[:, :, None, :]
    d_alpha = g[:, :, None, :] * v_t
    s_dot = (alpha * d_alpha).sum(axis=2, keepdims=True)
    d_hlog = alpha * (d_alpha - s_dot)
    d_qk = jnp.dot(d_hlog.reshape(NN, H), hh_ref[:],
                   preferred_element_type=jnp.float32)
    d_qk = d_qk.reshape(IB, Nl, Nl, H) * scale
    d_q_ref[0] = (d_qk * k_t).sum(axis=2)
    d_kt = d_qk * q[:, :, None, :]

    first = jnp.logical_and(b == 0, ip == 0)

    def branch_bwd(d_o, xhat, rstd, y, wa_ref, wo_ref, lns_ref,
                   d_tkj_ref, d_tij_ref, d_wa_ref, d_wo_ref, d_bo_ref,
                   d_lns_ref, d_lnb_ref):
        d_o2 = d_o.reshape(NN, H)
        y2 = y.reshape(NN, H)

        @pl.when(first)
        def _():
            d_wa_ref[...] = jnp.zeros_like(d_wa_ref)
            d_wo_ref[...] = jnp.zeros_like(d_wo_ref)
            d_bo_ref[...] = jnp.zeros_like(d_bo_ref)
            d_lns_ref[...] = jnp.zeros_like(d_lns_ref)
            d_lnb_ref[...] = jnp.zeros_like(d_lnb_ref)

        d_bo_ref[...] += d_o2.sum(axis=0, keepdims=True)
        d_wo_ref[...] += jax.lax.dot_general(
            y2, d_o2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_y = jax.lax.dot_general(
            d_o2, wo_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(IB, Nl, Nl, H)
        d_u = d_y * (y > 0.0).astype(jnp.float32)
        d_lns_ref[...] += (d_u * xhat).reshape(NN, H).sum(axis=0,
                                                          keepdims=True)
        d_lnb_ref[...] += d_u.reshape(NN, H).sum(axis=0, keepdims=True)
        d_xhat = d_u * lns_ref[0]
        d_pre = rstd * (d_xhat - _lane_mean(d_xhat)
                        - xhat * _lane_mean(d_xhat * xhat))

        @pl.when(ip == 0)
        def _():
            d_tkj_ref[...] = jnp.zeros_like(d_tkj_ref)

        d_tkj_ref[0] += d_pre.sum(axis=0)
        d_tij_ref[0] = d_pre.sum(axis=2)
        d_pre2 = d_pre.reshape(NN, H)
        d_wa_ref[...] += jax.lax.dot_general(
            af2, d_pre2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_af2 = jax.lax.dot_general(
            d_pre2, wa_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return d_af2

    d_af_k = branch_bwd(d_kt, xhat_k, rstd_k, y_k, wa_k_ref, wo_k_ref,
                        lns_k_ref, d_tkj_k_ref, d_tij_k_ref, d_wa_k_ref,
                        d_wo_k_ref, d_bo_k_ref, d_lns_k_ref, d_lnb_k_ref)
    d_af_v = branch_bwd(d_vt, xhat_v, rstd_v, y_v, wa_v_ref, wo_v_ref,
                        lns_v_ref, d_tkj_v_ref, d_tij_v_ref, d_wa_v_ref,
                        d_wo_v_ref, d_bo_v_ref, d_lns_v_ref, d_lnb_v_ref)

    dcode = _angular_grad_code(angle, angf_ref[:])
    d_angle = ((d_af_k + d_af_v) * dcode).sum(axis=-1)
    d_angle_ref[0] = d_angle.reshape(IB, Nl, Nl)


def _bwd_call(n_heads, IB, g, angle, tkj_k, tij_k, tkj_v, tij_v, q,
              bond_mask, hh, angf, wa_k, wo_k, bo_k, lns_k, lnb_k,
              wa_v, wo_v, bo_v, lns_v, lnb_v):
    B, Nl = angle.shape[0], angle.shape[1]
    H = tkj_k.shape[-1]
    grid = (B, Nl // IB)

    def b_only(b, i):
        return (b, 0, 0, 0)

    def bi(b, i):
        return (b, i, 0, 0)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((B, Nl, Nl, Nl), f32),    # d_angle
        jax.ShapeDtypeStruct((B, Nl, Nl, H), f32),     # d_tkj_k (i-summed)
        jax.ShapeDtypeStruct((B, Nl, Nl, H), f32),     # d_tij_k
        jax.ShapeDtypeStruct((B, Nl, Nl, H), f32),     # d_tkj_v
        jax.ShapeDtypeStruct((B, Nl, Nl, H), f32),     # d_tij_v
        jax.ShapeDtypeStruct((B, Nl, Nl, H), f32),     # d_q
        jax.ShapeDtypeStruct((ANG_PAD, H), f32),
        jax.ShapeDtypeStruct((H, H), f32),
        jax.ShapeDtypeStruct((1, H), f32),
        jax.ShapeDtypeStruct((1, H), f32),
        jax.ShapeDtypeStruct((1, H), f32),
        jax.ShapeDtypeStruct((ANG_PAD, H), f32),
        jax.ShapeDtypeStruct((H, H), f32),
        jax.ShapeDtypeStruct((1, H), f32),
        jax.ShapeDtypeStruct((1, H), f32),
        jax.ShapeDtypeStruct((1, H), f32),
    )
    out_specs = (
        pl.BlockSpec((1, IB, Nl, Nl), bi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Nl, Nl, H), b_only, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, IB, Nl, H), bi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Nl, Nl, H), b_only, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, IB, Nl, H), bi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, IB, Nl, H), bi, memory_space=pltpu.VMEM),
        w_spec((ANG_PAD, H)), w_spec((H, H)), w_spec((1, H)),
        w_spec((1, H)), w_spec((1, H)),
        w_spec((ANG_PAD, H)), w_spec((H, H)), w_spec((1, H)),
        w_spec((1, H)), w_spec((1, H)),
    )
    return pl.pallas_call(
        partial(_bwd_kernel, n_heads=n_heads, i_block=IB),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, IB, Nl, H), bi, memory_space=pltpu.VMEM),  # g
            pl.BlockSpec((1, IB, Nl, Nl), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, Nl, H), b_only, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IB, Nl, H), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, Nl, H), b_only, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IB, Nl, H), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IB, Nl, H), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nl, Nl), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec((H, H)),
            w_spec((4, ANG_PAD)),
            w_spec((ANG_PAD, H)), w_spec((H, H)), w_spec((1, H)),
            w_spec((1, H)), w_spec((1, H)),
            w_spec((ANG_PAD, H)), w_spec((H, H)), w_spec((1, H)),
            w_spec((1, H)), w_spec((1, H)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == 'cpu',
    )(g, angle, tkj_k, tij_k, tkj_v, tij_v, q, bond_mask, hh, angf,
      wa_k, wo_k, bo_k, lns_k, lnb_k, wa_v, wo_v, bo_v, lns_v, lnb_v)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _triplet_core(n_heads, bf16, IB, angle, tkj_k, tij_k, tkj_v, tij_v, q,
                  bond_mask, hh, angf, wa_k, wo_k, bo_k, lns_k, lnb_k,
                  wa_v, wo_v, bo_v, lns_v, lnb_v):
    return _fwd_call(n_heads, bf16, IB, angle, tkj_k, tij_k, tkj_v, tij_v, q,
                     bond_mask, hh, angf, wa_k, wo_k, bo_k, lns_k, lnb_k,
                     wa_v, wo_v, bo_v, lns_v, lnb_v)


def _triplet_core_fwd(n_heads, bf16, IB, *args):
    return _triplet_core(n_heads, bf16, IB, *args), args


def _triplet_core_bwd(n_heads, bf16, IB, res, g):
    (angle, tkj_k, tij_k, tkj_v, tij_v, q, bond_mask, hh, angf,
     wa_k, wo_k, bo_k, lns_k, lnb_k, wa_v, wo_v, bo_v, lns_v, lnb_v) = res
    (d_angle, d_tkj_k, d_tij_k, d_tkj_v, d_tij_v, d_q,
     d_wa_k, d_wo_k, d_bo_k, d_lns_k, d_lnb_k,
     d_wa_v, d_wo_v, d_bo_v, d_lns_v, d_lnb_v) = _bwd_call(
        n_heads, IB, g, angle, tkj_k, tij_k, tkj_v, tij_v, q, bond_mask, hh,
        angf, wa_k, wo_k, bo_k, lns_k, lnb_k, wa_v, wo_v, bo_v, lns_v, lnb_v)
    return (d_angle, d_tkj_k, d_tij_k, d_tkj_v, d_tij_v, d_q,
            jnp.zeros_like(bond_mask), jnp.zeros_like(hh),
            jnp.zeros_like(angf),
            d_wa_k, d_wo_k, d_bo_k, d_lns_k, d_lnb_k,
            d_wa_v, d_wo_v, d_bo_v, d_lns_v, d_lnb_v)


_triplet_core.defvjp(_triplet_core_fwd, _triplet_core_bwd)


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

    Differentiable: a custom VJP runs a second fused kernel that
    rematerializes the cubic intermediates in VMEM, so training never
    materializes the O(Nl^3 H) tensors in HBM either. The backward kernel is
    always f32 (bf16 only affects forward numerics).
    """
    B, Nl = angle.shape[0], angle.shape[1]
    H = tkj_k.shape[-1]
    hh = _head_matrix(H, n_heads)
    angf = jnp.asarray(_ang_table())
    IB = _pick_i_block(i_block, Nl)
    return _triplet_core(n_heads, bf16, IB, angle, tkj_k, tij_k, tkj_v,
                         tij_v, q, bond_mask, hh, angf, wa_k, wo_k, bo_k,
                         lns_k, lnb_k, wa_v, wo_v, bo_v, lns_v, lnb_v)
