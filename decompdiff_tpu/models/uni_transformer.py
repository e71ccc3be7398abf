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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from decompdiff_tpu.models.common import (
    MLP, fixed_rbf, masked_softmax, outer_product, safe_norm)
from decompdiff_tpu.models.uni_transformer_bond import _heads, gather_nodes
from decompdiff_tpu.ops.knn import knn_neighbors


class X2HAttention(nn.Module):
    """ref BaseX2HAttLayer (:15-88)."""
    hidden_dim: int
    n_heads: int
    ew_net_type: str = 'r'
    out_fc: bool = True

    @nn.compact
    def __call__(self, h, r_feat, edge_feat, nbr_idx, nbr_mask, e_w=None):
        hj = gather_nodes(h, nbr_idx)
        hi = jnp.broadcast_to(h[:, :, None, :], hj.shape)
        kv_input = jnp.concatenate([r_feat, hi, hj], axis=-1)
        if edge_feat is not None:
            kv_input = jnp.concatenate([edge_feat, kv_input], axis=-1)

        k = _heads(MLP(self.hidden_dim, self.hidden_dim, name='hk')(kv_input),
                   self.n_heads)
        v = MLP(self.hidden_dim, self.hidden_dim, name='hv')(kv_input)
        if self.ew_net_type == 'r':
            e_w = jax.nn.sigmoid(nn.Dense(1, name='ew')(r_feat))
        elif self.ew_net_type == 'm':
            e_w = jax.nn.sigmoid(nn.Dense(1, name='ew')(v))
        elif e_w is None:
            e_w = 1.0
        v = _heads(v * e_w, self.n_heads)
        q = _heads(MLP(self.hidden_dim, self.hidden_dim, name='hq')(h),
                   self.n_heads)

        scale = 1.0 / np.sqrt(k.shape[-1])
        logits = (q[:, :, None, :, :] * k).sum(-1) * scale
        alpha = masked_softmax(logits, nbr_mask[..., None], axis=2)
        out = (alpha[..., None] * v).sum(axis=2)
        out = out.reshape(h.shape[:-1] + (self.hidden_dim,))
        if self.out_fc:
            out = MLP(self.hidden_dim, self.hidden_dim, name='node_output')(
                jnp.concatenate([out, h], axis=-1))
        return out + h  # residual inside the layer (ref :88)


class H2XAttention(nn.Module):
    """ref BaseH2XAttLayer (:91-144)."""
    hidden_dim: int
    n_heads: int
    ew_net_type: str = 'r'

    @nn.compact
    def __call__(self, h, rel_x, r_feat, edge_feat, nbr_idx, nbr_mask,
                 e_w=None):
        hj = gather_nodes(h, nbr_idx)
        hi = jnp.broadcast_to(h[:, :, None, :], hj.shape)
        kv_input = jnp.concatenate([r_feat, hi, hj], axis=-1)
        if edge_feat is not None:
            kv_input = jnp.concatenate([edge_feat, kv_input], axis=-1)

        k = _heads(MLP(self.hidden_dim, self.hidden_dim, name='xk')(kv_input),
                   self.n_heads)
        v = MLP(self.n_heads, self.hidden_dim, name='xv')(kv_input)
        if self.ew_net_type == 'r':
            e_w = jax.nn.sigmoid(nn.Dense(1, name='ew')(r_feat))
        elif self.ew_net_type == 'm':
            e_w = 1.0
        elif e_w is None:
            e_w = 1.0
        v = v * e_w
        v = v[..., None] * rel_x[..., None, :]
        q = _heads(MLP(self.hidden_dim, self.hidden_dim, name='xq')(h),
                   self.n_heads)

        scale = 1.0 / np.sqrt(k.shape[-1])
        logits = (q[:, :, None, :, :] * k).sum(-1) * scale
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

    @nn.compact
    def __call__(self, h, x, edge_type, nbr_idx, nbr_mask, movable_mask,
                 e_w=None, fix_x=False):
        xj = gather_nodes(x, nbr_idx)
        rel_x = x[:, :, None, :] - xj
        dist = safe_norm(rel_x, axis=-1)

        edge_feat = edge_type if self.edge_feat_dim > 0 else None

        h_in = h
        for i in range(self.num_x2h):
            dist_feat = outer_product(edge_type, fixed_rbf(dist))
            h_in = X2HAttention(
                self.hidden_dim, self.n_heads, self.ew_net_type,
                self.x2h_out_fc, name=f'x2h_{i}')(
                h_in, dist_feat, edge_feat, nbr_idx, nbr_mask, e_w)
        x2h_out = h_in

        new_h = h if self.sync_twoup else x2h_out
        for i in range(self.num_h2x):
            dist_feat = outer_product(edge_type, fixed_rbf(dist))
            delta_x = H2XAttention(
                self.hidden_dim, self.n_heads, self.ew_net_type,
                name=f'h2x_{i}')(
                new_h, rel_x, dist_feat, edge_feat, nbr_idx, nbr_mask, e_w)
            if not fix_x:
                x = x + delta_x * movable_mask[..., None].astype(x.dtype)
            xj = gather_nodes(x, nbr_idx)
            rel_x = x[:, :, None, :] - xj
            dist = safe_norm(rel_x, axis=-1)

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

    @nn.compact
    def __call__(self, h, x, mask_all, mask_ligand, movable_mask,
                 fix_x=False, num_protein=None):
        layers = [AttentionLayerO2(
            self.hidden_dim, self.n_heads, self.edge_feat_dim,
            self.num_x2h, self.num_h2x, self.ew_net_type, self.x2h_out_fc,
            self.sync_twoup, name=f'layer_{i}')
            for i in range(self.num_layers)]

        for _ in range(self.num_blocks):
            if self.cutoff_mode == 'hybrid':
                # ref batch_hybrid_edge_connection (models/common.py:250-277)
                assert num_protein is not None
                from decompdiff_tpu.ops.knn import hybrid_neighbors
                nbr_idx, nbr_mask = hybrid_neighbors(
                    x, mask_all, mask_ligand, self.k, num_protein)
            else:
                nbr_idx, nbr_mask = knn_neighbors(x, mask_all, self.k)
                if self.cutoff_mode == 'radius':
                    xj0 = gather_nodes(x, nbr_idx)
                    d0 = safe_norm(x[:, :, None, :] - xj0, axis=-1)
                    nbr_mask = nbr_mask & (d0 <= self.r_max)
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

            if self.ew_net_type == 'global':
                xj = gather_nodes(x, nbr_idx)
                dist = safe_norm(x[:, :, None, :] - xj, axis=-1)
                e_w = jax.nn.sigmoid(
                    MLP(1, self.hidden_dim, name='edge_pred')(fixed_rbf(dist)))
            else:
                e_w = None

            for layer in layers:
                h, x = layer(h, x, edge_type, nbr_idx, nbr_mask, movable_mask,
                             e_w=e_w, fix_x=fix_x)

        return {'x': x, 'h': h}
