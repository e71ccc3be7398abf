"""SE(3)-equivariant graph transformer without bond streams — the `uni_o2`
refine net (ref models/encoders/uni_transformer.py:15-332).

Same padded [B, N, K] neighbor-attention layout as the bond variant; the
differences vs uni_o2_bond:
  * x2h layers carry their own residual (out = attn + h; ref :88)
  * per-layer edge weighting options ew_net_type in {r, m, global, none}
    (ref :39-42,62-70): 'r' gates values by sigmoid(Linear(r_feat)), 'm' by
    sigmoid(Linear(v)), 'global' uses one block-level MLP over RBF(dist)
  * num_x2h / num_h2x inner repetitions, with rel_x recomputed after each
    coordinate update (ref :200-212)
  * an extra init layer (num_init_x2h/num_init_h2x) exists in the reference
    but is never called in its forward (dead parameters, ref :248-249);
    we do not reproduce dead weights.

The kv first linear over [edge_type | outer(edge_type, RBF) | h_i | h_j]
is held as raw factorized params (we/wi/wj/b1 + LN + second linear), shared
verbatim by the dense XLA path and the fused Pallas path: the per-edge math
is IDENTICAL to the bond variant's kNN edge streams, so `use_pallas=True`
routes x2h through edge_attention_pallas node mode and h2x through pos mode
(in-kernel geometry/typing/gathers; custom-VJP backward — trainable).
ew_net_type 'm' (gate from the per-edge v) runs in-kernel too: the kernel
computes sigmoid(v @ wm + bm) from the raw v before the e_w multiply, so
all four ew modes are fused.

NOTE (round-2 refactor): the factorized-kv layout requires the reference's
4-dim edge-type feature (edge_feat_dim == 4, the released-config value);
edge_feat_dim == 0 is rejected rather than silently growing features. The
refactor also replaced the kv-MLP submodules with raw hk_*/hv_*/xk_*/xv_*
kernels, so uni_o2 param trees saved before round 2 do not load (the
checkpoint converter only maps uni_o2_bond and is unaffected).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from decompdiff_tpu.models.common import (
    MLP, fixed_rbf, masked_softmax, outer_product, safe_norm)
from decompdiff_tpu.models.uni_transformer_bond import (
    _EdgeStreamParams, _heads, _pad4, _pallas_prep_we, gather_nodes)
from decompdiff_tpu.ops.knn import knn_neighbors


def _kv_params(module, name, hidden_dim, out_dim, n_etypes=4, num_rbf=20):
    """Raw factorized kv-net params. The reference's first Dense over the
    concatenated [edge_feat | outer | h_i | h_j] input (ref :27-33) splits
    into we ([outer | edge_type] rows, the bond-variant edge_feat layout),
    wi (h_i rows) and wj (h_j rows); the first-linear bias rides the
    dst-side ti term."""
    feat_dim = n_etypes * num_rbf + n_etypes
    p = _EdgeStreamParams(module, name, feat_dim, hidden_dim, out_dim)
    init = nn.initializers.lecun_normal()
    p.wi = module.param(f'{name}_i_kernel', init, (hidden_dim, hidden_dim))
    p.wj = module.param(f'{name}_j_kernel', init, (hidden_dim, hidden_dim))
    return p


def _kv_branch_dense(p, edge_feat, hj, h):
    """pre -> LN -> relu -> second linear on the dense path."""
    pre = (edge_feat @ p.we.astype(edge_feat.dtype) + p.be
           + (h @ p.wi.astype(h.dtype))[:, :, None, :]
           + hj @ p.wj.astype(hj.dtype))
    mean = pre.mean(-1, keepdims=True)
    var = ((pre - mean) ** 2).mean(-1, keepdims=True)
    y = (pre - mean) * jax.lax.rsqrt(var + 1e-5) * p.lns + p.lnb
    y = nn.relu(y)
    return y @ p.wo.astype(y.dtype) + p.bo


def _edge_feat_o2(edge_type, dist):
    """[outer(edge_type, RBF(dist)) | edge_type] — the bond-variant layout;
    algebraically the reference's [edge_feat | r_feat] concat (ref :40-44)
    with the block order fixed by how we declare the rows of `we`."""
    return jnp.concatenate(
        [outer_product(edge_type, fixed_rbf(dist)), edge_type], axis=-1)


def _ew_r_from_d2(module, name, nbr_d2, lig_src, lig_dst, n_etypes=4):
    """ew_net_type='r': sigmoid(Linear(r_feat)) per edge (ref :48-49,87-88)
    WITHOUT materializing the [B,N,K,n_etypes*20] outer product: project the
    RBF by each type's weight block and select by the edge's type."""
    w = module.param(f'{name}_ew_kernel', nn.initializers.lecun_normal(),
                     (n_etypes * 20, 1))
    b = module.param(f'{name}_ew_bias', nn.initializers.zeros, (1,))
    rbfd = fixed_rbf(jnp.sqrt(jnp.clip(nbr_d2, 1e-12, 1e12)))  # [B,N,K,20]
    proj = rbfd @ w.reshape(n_etypes, 20, 1).transpose(1, 0, 2).reshape(20,
                                                                        n_etypes)
    ls = lig_src.astype(proj.dtype)
    ld = lig_dst.astype(proj.dtype)
    etype = jnp.stack([ls * ld, ls * (1 - ld), (1 - ls) * ld,
                       (1 - ls) * (1 - ld)], axis=-1)
    return jax.nn.sigmoid((proj * etype).sum(-1, keepdims=True) + b)


class X2HAttention(nn.Module):
    """ref BaseX2HAttLayer (:15-88)."""
    hidden_dim: int
    n_heads: int
    ew_net_type: str = 'r'
    out_fc: bool = True
    use_pallas: bool = False
    num_protein: int = 0

    @nn.compact
    def __call__(self, h, ed, nbr_idx, nbr_mask, e_w=None):
        """ed: dense path = (edge_type, dist, hj); pallas path =
        (x4, idx_flat, mld, nbr_d2, lig_src)."""
        H = self.hidden_dim
        pk = _kv_params(self, 'hk', H, H)
        pv = _kv_params(self, 'hv', H, H)
        q = MLP(H, H, name='hq')(h)
        ti_k = h @ pk.wi.astype(h.dtype)
        ti_v = h @ pv.wi.astype(h.dtype)

        if self.ew_net_type == 'm':
            # gate from the per-edge v: sigmoid(v @ wm + bm)
            # (ref uni_transformer.py:62-70,87-88); raw params shared by the
            # dense path and the in-kernel gate
            wm = self.param('ew_kernel', nn.initializers.lecun_normal(),
                            (H, 1))
            bm = self.param('ew_bias', nn.initializers.zeros, (1,))

        if self.use_pallas:
            from decompdiff_tpu.ops.pallas.edge_kernel import (
                edge_attention_pallas)
            x4, idx_flat, mld, nbr_d2, lig_src = ed
            mkw = {}
            if self.ew_net_type == 'r':
                ew = _ew_r_from_d2(self, 'hk', nbr_d2, lig_src,
                                   mld[..., 0:1] > 0.5)[..., 0]
            elif self.ew_net_type == 'global' and e_w is not None:
                ew = e_w[..., 0] if e_w.ndim == 4 else e_w
            else:
                ew = jnp.ones_like(nbr_mask, dtype=jnp.float32)
                if self.ew_net_type == 'm':
                    mkw = dict(wm=wm, bm=bm)
            hx = _pack_hx_o2(h, x4)
            out = edge_attention_pallas(
                x4, mld, idx_flat, jnp.zeros_like(idx_flat, jnp.float32),
                ew.astype(jnp.float32), nbr_mask.astype(jnp.float32),
                hx,
                (ti_k + pk.be).astype(jnp.float32),
                (ti_v + pv.be).astype(jnp.float32),
                q.astype(jnp.float32),
                _pallas_prep_we(pk, 4), pk.wj.astype(jnp.float32),
                pk.wo.astype(jnp.float32), pk.bo[None].astype(jnp.float32),
                pk.lns[None].astype(jnp.float32),
                pk.lnb[None].astype(jnp.float32),
                _pallas_prep_we(pv, 4), pv.wj.astype(jnp.float32),
                pv.wo.astype(jnp.float32), pv.bo[None].astype(jnp.float32),
                pv.lns[None].astype(jnp.float32),
                pv.lnb[None].astype(jnp.float32),
                n_heads=self.n_heads, pos_mode=False,
                num_protein=self.num_protein, **mkw)
            out = out.astype(h.dtype)
        else:
            edge_type, dist, hj = ed
            edge_feat = _edge_feat_o2(edge_type, dist).astype(h.dtype)
            k = _heads(_kv_branch_dense(pk, edge_feat, hj, h),
                       self.n_heads)
            v = _kv_branch_dense(pv, edge_feat, hj, h)
            if self.ew_net_type == 'r':
                r_feat = edge_feat[..., :4 * 20]
                w = self.param('hk_ew_kernel', nn.initializers.lecun_normal(),
                               (4 * 20, 1))
                b = self.param('hk_ew_bias', nn.initializers.zeros, (1,))
                e_w = jax.nn.sigmoid(r_feat @ w.astype(r_feat.dtype) + b)
            elif self.ew_net_type == 'm':
                e_w = jax.nn.sigmoid(v @ wm.astype(v.dtype) + bm)
            elif e_w is None:
                e_w = 1.0
            v = _heads(v * e_w, self.n_heads)
            qh = _heads(q, self.n_heads)
            scale = 1.0 / np.sqrt(k.shape[-1])
            logits = (qh[:, :, None, :, :] * k).sum(-1) * scale
            alpha = masked_softmax(logits, nbr_mask[..., None], axis=2)
            out = (alpha[..., None] * v).sum(axis=2)
            out = out.reshape(h.shape[:-1] + (self.hidden_dim,))
        if self.out_fc:
            out = MLP(self.hidden_dim, self.hidden_dim, name='node_output')(
                jnp.concatenate([out, h], axis=-1))
        return out + h  # residual inside the layer (ref :88)


def _pack_hx_o2(h, x4):
    return jnp.concatenate([h.astype(jnp.float32), x4], axis=-1)


class H2XAttention(nn.Module):
    """ref BaseH2XAttLayer (:91-144)."""
    hidden_dim: int
    n_heads: int
    ew_net_type: str = 'r'
    use_pallas: bool = False
    num_protein: int = 0

    @nn.compact
    def __call__(self, h, ed, nbr_idx, nbr_mask, e_w=None):
        """ed: dense path = (edge_type, dist, rel_x, hj); pallas path =
        (x4, idx_flat, mld, nbr_d2, lig_src)."""
        H = self.hidden_dim
        heads = self.n_heads
        pk = _kv_params(self, 'xk', H, H)
        pv = _kv_params(self, 'xv', H, heads)
        q = MLP(H, H, name='xq')(h)
        ti_k = h @ pk.wi.astype(h.dtype)
        ti_v = h @ pv.wi.astype(h.dtype)

        if self.use_pallas:
            from decompdiff_tpu.ops.pallas.edge_kernel import (
                edge_attention_pallas)
            x4, idx_flat, mld, nbr_d2, lig_src = ed
            if self.ew_net_type == 'r':
                ew = _ew_r_from_d2(self, 'xk', nbr_d2, lig_src,
                                   mld[..., 0:1] > 0.5)[..., 0]
            elif self.ew_net_type != 'global' or e_w is None:
                # 'm' is identity for h2x in the reference (:89)
                ew = jnp.ones_like(nbr_mask, dtype=jnp.float32)
            else:
                ew = e_w[..., 0] if e_w.ndim == 4 else e_w
            hx = _pack_hx_o2(h, x4)
            hd = H // heads
            dx4 = edge_attention_pallas(
                x4, mld, idx_flat, jnp.zeros_like(idx_flat, jnp.float32),
                ew.astype(jnp.float32), nbr_mask.astype(jnp.float32),
                hx,
                (ti_k + pk.be).astype(jnp.float32),
                (ti_v + pv.be).astype(jnp.float32),
                q.astype(jnp.float32),
                _pallas_prep_we(pk, 4), pk.wj.astype(jnp.float32),
                pk.wo.astype(jnp.float32), pk.bo[None].astype(jnp.float32),
                pk.lns[None].astype(jnp.float32),
                pk.lnb[None].astype(jnp.float32),
                _pallas_prep_we(pv, 4), pv.wj.astype(jnp.float32),
                # v-net second linear is [H, heads]; replicate each head
                # column to its hd lanes so the kernel stays per-lane
                jnp.repeat(pv.wo.astype(jnp.float32), hd, axis=1),
                jnp.repeat(pv.bo[None].astype(jnp.float32), hd, axis=1),
                pv.lns[None].astype(jnp.float32),
                pv.lnb[None].astype(jnp.float32),
                n_heads=heads, pos_mode=True,
                num_protein=self.num_protein)
            return dx4[..., :3].astype(h.dtype)

        edge_type, dist, rel_x, hj = ed
        edge_feat = _edge_feat_o2(edge_type, dist).astype(h.dtype)
        k = _heads(_kv_branch_dense(pk, edge_feat, hj, h), heads)
        v = _kv_branch_dense(pv, edge_feat, hj, h)
        if self.ew_net_type == 'r':
            r_feat = edge_feat[..., :4 * 20]
            w = self.param('xk_ew_kernel', nn.initializers.lecun_normal(),
                           (4 * 20, 1))
            b = self.param('xk_ew_bias', nn.initializers.zeros, (1,))
            e_w = jax.nn.sigmoid(r_feat @ w.astype(r_feat.dtype) + b)
        elif self.ew_net_type == 'm':
            e_w = 1.0
        elif e_w is None:
            e_w = 1.0
        v = v * e_w
        v = v[..., None] * rel_x[..., None, :]
        qh = _heads(q, heads)
        scale = 1.0 / np.sqrt(k.shape[-1])
        logits = (qh[:, :, None, :, :] * k).sum(-1) * scale
        alpha = masked_softmax(logits, nbr_mask[..., None], axis=2)
        out = (alpha[..., None] * v).sum(axis=2)
        return out.mean(axis=2)


class AttentionLayerO2(nn.Module):
    """ref AttentionLayerO2TwoUpdateNodeGeneral (:147-214)."""
    hidden_dim: int
    n_heads: int
    edge_feat_dim: int
    num_x2h: int = 1
    num_h2x: int = 1
    ew_net_type: str = 'r'
    x2h_out_fc: bool = True
    sync_twoup: bool = False
    use_pallas: bool = False
    num_protein: int = 0

    @nn.compact
    def __call__(self, h, x, edge_type, nbr_idx, nbr_mask, movable_mask,
                 e_w=None, nbr_d2=None, mld=None, lig_src=None, fix_x=False):
        B, N, K = nbr_idx.shape

        def pallas_ed(x_cur, d2_cur):
            return (_pad4(x_cur.astype(jnp.float32)),
                    nbr_idx.reshape(B, N * K, 1), mld, d2_cur, lig_src)

        def dense_geom(x_cur):
            xj = gather_nodes(x_cur, nbr_idx)
            rel_x = x_cur[:, :, None, :] - xj
            return rel_x, safe_norm(rel_x, axis=-1)

        if self.use_pallas:
            # nbr_d2 is the block-level snapshot; x moves layer to layer, and
            # the ew='r' gate must see the CURRENT geometry (the kernels
            # recompute theirs in VMEM; only this gate reads d2 outside)
            if self.ew_net_type == 'r':
                xj = gather_nodes(x, nbr_idx)
                d2_cur = ((x[:, :, None, :] - xj) ** 2).sum(-1)
            else:
                d2_cur = nbr_d2
        else:
            rel_x, dist = dense_geom(x)

        h_in = h
        for i in range(self.num_x2h):
            if self.use_pallas:
                ed = pallas_ed(x, d2_cur)
            else:
                ed = (edge_type, dist, gather_nodes(h_in, nbr_idx))
            h_in = X2HAttention(
                self.hidden_dim, self.n_heads, self.ew_net_type,
                self.x2h_out_fc, use_pallas=self.use_pallas,
                num_protein=self.num_protein, name=f'x2h_{i}')(
                h_in, ed, nbr_idx, nbr_mask, e_w)
        x2h_out = h_in

        new_h = h if self.sync_twoup else x2h_out
        for i in range(self.num_h2x):
            if self.use_pallas:
                ed = pallas_ed(x, d2_cur)
            else:
                ed = (edge_type, dist, rel_x, gather_nodes(new_h, nbr_idx))
            delta_x = H2XAttention(
                self.hidden_dim, self.n_heads, self.ew_net_type,
                use_pallas=self.use_pallas, num_protein=self.num_protein,
                name=f'h2x_{i}')(
                new_h, ed, nbr_idx, nbr_mask, e_w)
            if not fix_x:
                x = x + delta_x * movable_mask[..., None].astype(x.dtype)
            if self.use_pallas:
                xj = gather_nodes(x, nbr_idx)
                d2_cur = ((x[:, :, None, :] - xj) ** 2).sum(-1)
            else:
                rel_x, dist = dense_geom(x)

        return x2h_out, x


class UniTransformerO2(nn.Module):
    """ref UniTransformerO2TwoUpdateGeneral (:217-332)."""
    num_blocks: int
    num_layers: int
    hidden_dim: int
    n_heads: int
    k: int
    edge_feat_dim: int = 4
    num_r_gaussian: int = 20
    ew_net_type: str = 'global'
    num_x2h: int = 1
    num_h2x: int = 1
    x2h_out_fc: bool = True
    sync_twoup: bool = False
    cutoff_mode: str = 'knn'
    r_max: float = 10.0
    use_pallas: bool = False

    @nn.compact
    def __call__(self, h, x, mask_all, mask_ligand, movable_mask,
                 fix_x=False, num_protein=None):
        assert self.edge_feat_dim == 4, (
            'the factorized kv layout bakes in the 4-dim edge-type block '
            '(released config value); see module docstring')
        use_pallas = self.use_pallas
        if use_pallas:
            assert num_protein is not None, \
                'the Pallas path derives edge typing from the static layout'
            assert self.cutoff_mode != 'hybrid', \
                'hybrid cutoff runs the dense path only'

        # Pallas path: pad the context to a 64-multiple so the edge kernels
        # run at tile=64 (Mosaic block sublane dims must divide by 8 — odd N
        # would otherwise degrade the tile fallback to 1-2); same scheme as
        # UniTransformerBond.__call__, pad nodes masked out and sliced below
        N0 = h.shape[1]
        # pad UNCONDITIONALLY (round-3 review): an unpadded small
        # context would push the edge kernels into non-multiple-of-8
        # tile fallbacks that Mosaic rejects at TPU compile time
        pad_n = (-N0) % 64 if use_pallas else 0
        if pad_n:
            def _pad(a, value=0):
                widths = [(0, 0), (0, pad_n)] + [(0, 0)] * (a.ndim - 2)
                return jnp.pad(a, widths, constant_values=value)

            h, x = _pad(h), _pad(x)
            mask_all, mask_ligand = _pad(mask_all), _pad(mask_ligand)
            movable_mask = _pad(movable_mask)

        layers = [AttentionLayerO2(
            self.hidden_dim, self.n_heads, self.edge_feat_dim,
            self.num_x2h, self.num_h2x, self.ew_net_type, self.x2h_out_fc,
            self.sync_twoup, use_pallas, num_protein or 0,
            name=f'layer_{i}')
            for i in range(self.num_layers)]

        for _ in range(self.num_blocks):
            if self.cutoff_mode == 'hybrid':
                # ref batch_hybrid_edge_connection (models/common.py:250-277)
                assert num_protein is not None
                from decompdiff_tpu.ops.knn import hybrid_neighbors
                nbr_idx, nbr_mask, nbr_d2 = hybrid_neighbors(
                    x, mask_all, mask_ligand, self.k, num_protein,
                    return_d2=True)
            else:
                nbr_idx, nbr_mask, nbr_d2 = knn_neighbors(
                    x, mask_all, self.k, return_d2=True)
                if self.cutoff_mode == 'radius':
                    nbr_mask = nbr_mask & (nbr_d2 <= self.r_max ** 2)
                elif self.cutoff_mode != 'knn':
                    raise NotImplementedError(self.cutoff_mode)
            lig_src = gather_nodes(
                mask_ligand[..., None].astype(jnp.float32), nbr_idx)[..., 0] > 0.5
            lig_dst = mask_ligand[:, :, None]
            type_id = jnp.where(
                lig_src & lig_dst, 0,
                jnp.where(lig_src & ~lig_dst, 1,
                          jnp.where(~lig_src & lig_dst, 2, 3)))
            edge_type = jax.nn.one_hot(type_id, 4, dtype=h.dtype)
            mld = jnp.stack([mask_ligand.astype(jnp.float32),
                             jnp.zeros_like(mask_ligand, jnp.float32)],
                            axis=-1)

            if self.ew_net_type == 'global':
                dist = jnp.sqrt(jnp.clip(nbr_d2, 1e-12, 1e12))
                e_w = jax.nn.sigmoid(
                    MLP(1, self.hidden_dim, name='edge_pred')(fixed_rbf(dist)))
            else:
                e_w = None

            for layer in layers:
                h, x = layer(h, x, edge_type, nbr_idx, nbr_mask, movable_mask,
                             e_w=e_w, nbr_d2=nbr_d2, mld=mld,
                             lig_src=lig_src, fix_x=fix_x)

        if pad_n:
            h, x = h[:, :N0], x[:, :N0]
        return {'x': x, 'h': h}
