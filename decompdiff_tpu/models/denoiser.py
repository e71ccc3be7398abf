"""The denoiser network: embeddings + refine net + inference heads.

Behavioral parity with DecompScorePosNet3D.forward
(ref models/decompdiff.py:213-351):
  * ligand input = one_hot(v) ++ decomp aux feature (+ optional time feature)
  * protein/ligand Linear embeddings to hidden_dim - 1, then a 0/1 node
    indicator channel (ref :245-256); with prior nodes, hidden_dim - 3 and a
    3-way indicator (ref :247-250)
  * refine net over the composed context
  * v_inference MLP (Linear -> ShiftedSoftplus -> Linear; ref :194-198)
  * bond head: 'lin' reads the bond hidden state; 'pre_att' builds
    RBF(dist) ++ (h_i + h_j)/2 pair features (ref :323-341)

Context composition is a static concatenation [protein | ligand] (+ [prior])
along the node axis — the reference's stable-sort-by-batch
(ref models/common.py:167-227) is unnecessary in padded layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from decompdiff_tpu.data.batch import ComplexBatch
from decompdiff_tpu.models.common import linspace_rbf, shifted_softplus
from decompdiff_tpu.models.uni_transformer_bond import UniTransformerBond


class SinusoidalTimeEmb(nn.Module):
    """ref models/decompdiff.py:59-71."""
    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        emb = np.log(10000) / (half - 1)
        freqs = jnp.exp(jnp.arange(half) * -emb)
        args = t[:, None].astype(jnp.float32) * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class DecompDenoiser(nn.Module):
    """One forward pass of the joint (pos, atom-type, bond-type) denoiser."""
    config: dict
    num_classes: int
    num_bond_classes: int

    @nn.compact
    def __call__(self, batch: ComplexBatch, ligand_pos, ligand_v, bond_type,
                 time_step: Optional[jnp.ndarray] = None):
        """
        Args:
            batch:      static features (protein, masks, priors, aux)
            ligand_pos: [B, Nl, 3] current (noised) ligand coordinates
            ligand_v:   [B, Nl] current atom-type indices
            bond_type:  [B, Nl, Nl] current bond-type indices
            time_step:  [B] integer t (only used when time_emb_dim > 0)

        Returns dict with 'pred_ligand_pos' [B, Nl, 3], 'pred_ligand_v'
        [B, Nl, K], and 'pred_bond' [B, Nl, Nl, Kb] when bond_diffusion.
        """
        cfg = self.config
        hidden_dim = cfg['hidden_dim']
        node_indicator = cfg.get('node_indicator', True)
        add_prior_node = cfg.get('add_prior_node', False)
        if node_indicator:
            emb_dim = hidden_dim - (3 if add_prior_node else 1)
        else:
            emb_dim = hidden_dim

        Np = batch.num_protein_atoms
        Nl = batch.num_ligand_atoms

        # --- ligand input features (ref :219-236) ---
        v_onehot = jax.nn.one_hot(ligand_v, self.num_classes)
        lig_feat = jnp.concatenate(
            [v_onehot, batch.ligand_aux.astype(v_onehot.dtype)], axis=-1)
        time_emb_dim = cfg.get('time_emb_dim', 0)
        if time_emb_dim > 0:
            mode = cfg.get('time_emb_mode', 'simple')
            if mode == 'simple':
                tfeat = (time_step.astype(jnp.float32)
                         / cfg['num_diffusion_timesteps'])
                tfeat = jnp.broadcast_to(tfeat[:, None, None], (lig_feat.shape[0], Nl, 1))
            elif mode == 'sin':
                te = SinusoidalTimeEmb(time_emb_dim)(time_step)
                te = nn.Dense(time_emb_dim * 4)(te)
                te = nn.gelu(te)
                te = nn.Dense(time_emb_dim)(te)
                tfeat = jnp.broadcast_to(te[:, None, :],
                                         (lig_feat.shape[0], Nl, time_emb_dim))
            else:
                raise NotImplementedError(mode)
            lig_feat = jnp.concatenate([lig_feat, tfeat], axis=-1)

        h_protein = nn.Dense(emb_dim, name='protein_atom_emb')(
            batch.protein_feat)
        h_ligand = nn.Dense(emb_dim, name='ligand_atom_emb')(lig_feat)

        # --- compose context (static concat [protein | ligand | prior];
        # ref models/common.py:167-227) ---
        group_idx = None
        if add_prior_node:
            # prior dummy nodes carry an RBF embedding of their std
            # (ref models/decompdiff.py:162-163,241-250; the reference embeds
            # linspace(0, 5, 20) RBFs of the std — we use the per-node mean
            # std since stds are isotropic)
            prior_std_feat = linspace_rbf(batch.prior_stds.mean(-1),
                                          0.0, 5.0, 20)
            h_prior = nn.Dense(emb_dim, name='prior_atom_emb')(prior_std_feat)
            if node_indicator:
                def ind(h, which):
                    onehot = jnp.zeros(h.shape[:-1] + (3,), h.dtype)
                    return jnp.concatenate(
                        [h, onehot.at[..., which].set(1.0)], axis=-1)
                h_protein, h_ligand, h_prior = (
                    ind(h_protein, 0), ind(h_ligand, 1), ind(h_prior, 2))
            h_all = jnp.concatenate([h_protein, h_ligand, h_prior], axis=1)
            pos_all = jnp.concatenate(
                [batch.protein_pos, ligand_pos, batch.prior_centers], axis=1)
            mask_all = jnp.concatenate(
                [batch.protein_mask, batch.ligand_mask, batch.prior_mask],
                axis=1)
            false_p = jnp.zeros_like(batch.protein_mask)
            false_a = jnp.zeros_like(batch.prior_mask)
            # prior dummies count as ligand for edge typing but never move
            # (ref models/common.py:206-219)
            mask_ligand = jnp.concatenate(
                [false_p, batch.ligand_mask, batch.prior_mask], axis=1)
            movable = jnp.concatenate(
                [false_p, batch.update_mask(), false_a], axis=1)
            A = batch.num_groups
            group_idx = jnp.concatenate([
                jnp.full(batch.protein_mask.shape, -1, jnp.int32),
                batch.ligand_decomp_idx.astype(jnp.int32),
                jnp.broadcast_to(jnp.arange(A, dtype=jnp.int32)[None],
                                 batch.prior_mask.shape),
            ], axis=1)
        else:
            if node_indicator:
                zeros = jnp.zeros(h_protein.shape[:-1] + (1,), h_protein.dtype)
                ones = jnp.ones(h_ligand.shape[:-1] + (1,), h_ligand.dtype)
                h_protein = jnp.concatenate([h_protein, zeros], axis=-1)
                h_ligand = jnp.concatenate([h_ligand, ones], axis=-1)
            h_all = jnp.concatenate([h_protein, h_ligand], axis=1)
            pos_all = jnp.concatenate([batch.protein_pos, ligand_pos], axis=1)
            mask_all = jnp.concatenate(
                [batch.protein_mask, batch.ligand_mask], axis=1)
            false_p = jnp.zeros_like(batch.protein_mask)
            mask_ligand = jnp.concatenate([false_p, batch.ligand_mask], axis=1)
            movable = jnp.concatenate([false_p, batch.update_mask()], axis=1)

        compute_dtype = {'float32': None, None: None,
                         'bfloat16': jnp.bfloat16}[cfg.get('compute_dtype')]
        if compute_dtype is not None:
            h_all = h_all.astype(compute_dtype)

        # --- refine net (ref models/encoders/__init__.py:5-47) ---
        model_type = cfg.get('model_type', 'uni_o2_bond')
        if model_type == 'uni_o2_bond':
            bond_onehot = jax.nn.one_hot(bond_type, self.num_bond_classes,
                                         dtype=compute_dtype or jnp.float32)
            h_bond = nn.Dense(hidden_dim, dtype=compute_dtype,
                              name='ligand_bond_emb')(bond_onehot)
            refine = UniTransformerBond(
                num_blocks=cfg['num_blocks'],
                num_layers=cfg['num_layers'],
                hidden_dim=hidden_dim,
                n_heads=cfg['n_heads'],
                k=cfg['knn'],
                edge_feat_dim=cfg.get('edge_feat_dim', 4),
                num_r_gaussian=cfg.get('num_r_gaussian', 20),
                # the reference NEVER forwards use_global_ew to this net
                # (ref models/encoders/__init__.py:30-46): the sigmoid e_w
                # weighting is always on, so a config key cannot disable it
                use_global_ew=True,
                x2h_out_fc=cfg.get('x2h_out_fc', True),
                include_h_node=cfg.get('h_node_in_bond_net', False),
                remat=cfg.get('remat', False),
                dtype=compute_dtype,
                use_pallas=cfg.get('use_pallas', False),
                pallas_bf16=cfg.get('pallas_bf16', False),
                gather_bf16=cfg.get('pallas_gather_bf16', False),
                triplet_i_block=cfg.get('pallas_triplet_i_block', 4),
                edge_tile=cfg.get('pallas_edge_tile', 64),
                cutoff_mode=cfg.get('cutoff_mode', 'knn'),
                r_max=cfg.get('r_max', 10.0),
                name='refine_net')
            outputs = refine(h_all, pos_all, h_bond, mask_all, mask_ligand,
                             movable, batch.bond_mask, num_protein=Np,
                             group_idx=group_idx)
        elif model_type == 'uni_o2':
            from decompdiff_tpu.models.uni_transformer import UniTransformerO2
            refine = UniTransformerO2(
                num_blocks=cfg['num_blocks'],
                num_layers=cfg['num_layers'],
                hidden_dim=hidden_dim,
                n_heads=cfg['n_heads'],
                k=cfg['knn'],
                edge_feat_dim=cfg.get('edge_feat_dim', 4),
                num_r_gaussian=cfg.get('num_r_gaussian', 20),
                ew_net_type=cfg.get('ew_net_type', 'global'),
                num_x2h=cfg.get('num_x2h', 1),
                num_h2x=cfg.get('num_h2x', 1),
                x2h_out_fc=cfg.get('x2h_out_fc', True),
                sync_twoup=cfg.get('sync_twoup', False),
                cutoff_mode=cfg.get('cutoff_mode', 'knn'),
                r_max=cfg.get('r_max', 10.0),
                use_pallas=cfg.get('use_pallas', False),
                name='refine_net')
            outputs = refine(h_all, pos_all, mask_all, mask_ligand, movable,
                             num_protein=Np)
        else:
            raise ValueError(model_type)

        final_h_lig = outputs['h'][:, Np:Np + Nl].astype(jnp.float32)
        final_pos_lig = outputs['x'][:, Np:Np + Nl].astype(jnp.float32)

        # v head (ref :194-198,317)
        y = nn.Dense(hidden_dim, name='v_inf_0')(final_h_lig)
        y = shifted_softplus(y)
        pred_v = nn.Dense(self.num_classes, name='v_inf_1')(y)

        preds = {'pred_ligand_pos': final_pos_lig, 'pred_ligand_v': pred_v}

        if cfg.get('bond_diffusion', False):
            bond_net_type = cfg.get('bond_net_type', 'lin')
            if bond_net_type == 'lin':
                assert 'h_bond' in outputs, \
                    "bond_net_type 'lin' requires the uni_o2_bond refine net"
                bond_in = outputs['h_bond'].astype(jnp.float32)
            elif bond_net_type == 'pre_att':
                # pair features over the dense bond graph (ref :325-333)
                diff = final_pos_lig[:, :, None, :] - final_pos_lig[:, None, :, :]
                dist = jnp.sqrt(jnp.maximum((diff * diff).sum(-1), 1e-12))
                r_feat = linspace_rbf(dist, 0.0, 5.0, cfg.get('num_r_gaussian', 20))
                hi = final_h_lig[:, :, None, :]
                hj = final_h_lig[:, None, :, :]
                pair_h = jnp.broadcast_to(
                    (hi + hj) / 2, r_feat.shape[:-1] + (final_h_lig.shape[-1],))
                bond_in = jnp.concatenate([r_feat, pair_h], axis=-1)
            else:
                raise ValueError(bond_net_type)
            y = nn.Dense(hidden_dim, name='bond_inf_0')(bond_in)
            y = shifted_softplus(y)
            preds['pred_bond'] = nn.Dense(
                self.num_bond_classes, name='bond_inf_1')(y)

        return preds
