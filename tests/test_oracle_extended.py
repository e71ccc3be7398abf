"""Oracle parity for the non-released topologies (VERDICT r2 item 6):
the `uni_o2` refine net, `add_prior_node` composition, and one reverse
sampling step with injected noise. Together with test_oracle_parity.py this
anchors every code path a sampling config can select to the pure-numpy
reference transcription.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.models.diffusion_model import DecompDiffModel
from decompdiff_tpu.sampling.sampler import SampleConfig, sample_diffusion
from decompdiff_tpu.utils.convert_checkpoint import convert_reference_state_dict

from test_oracle_parity import (
    NUM_BOND, NUM_CLASSES, PROTEIN_FEAT, _compare_preds, _config,
    _padded_batch, _ragged_arrays, _ragged_fixture)
from tests import reference_oracle as oracle


# ---------------------------------------------------------------------------
# uni_o2 refine net
# ---------------------------------------------------------------------------

def _o2_setup(ew, bond_diffusion=False, seed=7):
    cfg = _config(model_type='uni_o2', ew_net_type=ew,
                  bond_diffusion=bond_diffusion,
                  bond_net_type='pre_att' if bond_diffusion else 'lin')
    rng = np.random.default_rng(seed)
    graphs = _ragged_fixture(rng)
    ragged = _ragged_arrays(graphs)
    batch = _padded_batch(graphs)
    sd = oracle.make_reference_state_dict_o2(
        np.random.default_rng(11), cfg, NUM_CLASSES, NUM_BOND,
        PROTEIN_FEAT, NUM_CLASSES + 2)
    params = jax.tree.map(jnp.asarray, convert_reference_state_dict(sd, cfg))
    model = DecompDiffModel.create(cfg, num_classes=NUM_CLASSES)
    return cfg, graphs, ragged, batch, sd, params, model


@pytest.mark.parametrize('ew', ['global', 'r', 'm', 'none'])
def test_uni_o2_forward_parity(ew):
    cfg, graphs, ragged, batch, sd, params, model = _o2_setup(ew)
    t = jnp.asarray([3, 7])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                        batch.bond_type, t)
    opreds = oracle.decomp_forward_o2(
        sd, cfg, NUM_CLASSES, NUM_BOND,
        ragged['protein_pos'], ragged['protein_feat'],
        ragged['batch_protein'], ragged['ligand_pos'], ragged['ligand_v'],
        ragged['aux'], ragged['batch_ligand'])
    pred_pos = np.asarray(preds['pred_ligand_pos'], np.float64)
    pred_v = np.asarray(preds['pred_ligand_v'], np.float64)
    off = 0
    for b, g in enumerate(graphs):
        n_l = len(g['ligand_pos'])
        np.testing.assert_allclose(
            pred_pos[b, :n_l], opreds['pred_ligand_pos'][off:off + n_l],
            rtol=3e-4, atol=3e-4, err_msg=f'pred_ligand_pos graph {b}')
        np.testing.assert_allclose(
            pred_v[b, :n_l], opreds['pred_ligand_v'][off:off + n_l],
            rtol=3e-4, atol=3e-4, err_msg=f'pred_ligand_v graph {b}')
        off += n_l


def test_uni_o2_pre_att_bond_head_parity():
    cfg, graphs, ragged, batch, sd, params, model = _o2_setup(
        'global', bond_diffusion=True)
    t = jnp.asarray([3, 7])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                        batch.bond_type, t)
    opreds = oracle.decomp_forward_o2(
        sd, cfg, NUM_CLASSES, NUM_BOND,
        ragged['protein_pos'], ragged['protein_feat'],
        ragged['batch_protein'], ragged['ligand_pos'], ragged['ligand_v'],
        ragged['aux'], ragged['batch_ligand'],
        ligand_fc_bond_index=ragged['bond_index'])
    _compare_preds(preds, opreds, ragged, graphs)


# ---------------------------------------------------------------------------
# add_prior_node composition over uni_o2_bond
# ---------------------------------------------------------------------------

def _prior_ragged(graphs, ragged):
    """Ragged prior-node arrays: per graph num_arms+1 dummies with scalar
    stds and the AddDecompIndicator group scheme (ref transforms.py:288-314:
    protein -1, ligand decomp idx, prior arange)."""
    out = dict(ragged)
    out['prior_centers'] = np.concatenate(
        [g['prior_centers'] for g in graphs])
    out['prior_stds'] = np.concatenate(
        [g['prior_stds'][:, 0] for g in graphs])
    out['batch_prior'] = np.concatenate(
        [np.full(g['num_arms'] + 1, i) for i, g in enumerate(graphs)])
    out['prior_group_idx'] = np.concatenate(
        [np.arange(g['num_arms'] + 1) for g in graphs])
    out['ligand_group_idx'] = np.concatenate(
        [g['decomp_idx'] for g in graphs])
    return out


def test_prior_node_forward_parity():
    cfg = _config(add_prior_node=True, edge_feat_dim=6)
    rng = np.random.default_rng(9)
    graphs = _ragged_fixture(rng)
    ragged = _prior_ragged(graphs, _ragged_arrays(graphs))
    batch = _padded_batch(graphs)
    # isotropic scalar stds (the transform emits one std per group,
    # ref transforms.py:181-249; the fixture's [A, 3] rows replicate it)
    ps = np.asarray(batch.prior_stds)
    batch = batch.replace(prior_stds=jnp.asarray(
        np.repeat(ps[..., :1], 3, axis=-1)))
    for g in graphs:
        g['prior_stds'] = np.repeat(g['prior_stds'][:, :1], 3, axis=1)
    ragged = _prior_ragged(graphs, _ragged_arrays(graphs))

    sd = oracle.make_reference_state_dict(
        np.random.default_rng(13), cfg, NUM_CLASSES, NUM_BOND,
        PROTEIN_FEAT, NUM_CLASSES + 2)
    sd = oracle.extend_state_dict_prior(sd, np.random.default_rng(14), cfg)
    params = jax.tree.map(jnp.asarray, convert_reference_state_dict(sd, cfg))
    model = DecompDiffModel.create(cfg, num_classes=NUM_CLASSES)

    t = jnp.asarray([3, 7])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                        batch.bond_type, t)
    opreds = oracle.decomp_forward_prior(
        sd, cfg, NUM_CLASSES, NUM_BOND,
        ragged['protein_pos'], ragged['protein_feat'],
        ragged['batch_protein'], ragged['ligand_pos'], ragged['ligand_v'],
        ragged['aux'], ragged['batch_ligand'], ragged['ligand_group_idx'],
        ragged['prior_centers'], ragged['prior_stds'],
        ragged['batch_prior'], ragged['prior_group_idx'],
        ragged['bond_index'], ragged['bond_type'])
    _compare_preds(preds, opreds, ragged, graphs)


# ---------------------------------------------------------------------------
# one reverse sampling step with injected noise
# ---------------------------------------------------------------------------

def test_reverse_step_parity():
    """ref models/decompdiff.py:601-636,679-684: posterior mean coefficients,
    categorical posterior + Gumbel draw, prior-std-scaled noise, t=0 mask —
    given identical network predictions and identical injected draws, the
    scanned sampler's step must equal the numpy oracle exactly."""
    cfg = _config(bond_net_type='lin', num_diffusion_timesteps=50)
    rng = np.random.default_rng(31)
    graphs = _ragged_fixture(rng)
    ragged = _ragged_arrays(graphs)
    batch = _padded_batch(graphs)
    sd = oracle.make_reference_state_dict(
        np.random.default_rng(11), cfg, NUM_CLASSES, NUM_BOND,
        PROTEIN_FEAT, NUM_CLASSES + 2)
    params = jax.tree.map(jnp.asarray, convert_reference_state_dict(sd, cfg))
    model = DecompDiffModel.create(cfg, num_classes=NUM_CLASSES)

    B, Nl = batch.batch_size, batch.num_ligand_atoms
    S = 1  # single reverse step at t = T-1 = 49
    pos_eps = np.zeros((S, B, Nl, 3), np.float32)
    v_uniform = rng.random((S, B, Nl, NUM_CLASSES)).astype(np.float32)
    b_uniform = rng.random((S, B, Nl, Nl, NUM_BOND)).astype(np.float32)
    lm = np.asarray(batch.ligand_mask)
    for b, g in enumerate(graphs):
        n_l = len(g['ligand_pos'])
        pos_eps[0, b, :n_l] = rng.normal(size=(n_l, 3))

    scfg = SampleConfig(num_steps=1, save_traj=False)
    out = sample_diffusion(
        model, scfg, params, jax.random.PRNGKey(0), batch,
        batch.ligand_pos, batch.ligand_v, batch.bond_type,
        noise_override={'pos_eps': jnp.asarray(pos_eps),
                        'v_uniform': jnp.asarray(v_uniform),
                        'b_uniform': jnp.asarray(b_uniform)})

    # oracle: center, forward, reverse step, uncenter
    t_scalar = cfg['num_diffusion_timesteps'] - 1
    t = np.full(len(graphs), t_scalar, np.int64)
    offset = oracle.scatter_mean(np.asarray(ragged['protein_pos'], np.float64),
                                 ragged['batch_protein'], len(graphs))
    prot_c = ragged['protein_pos'] - offset[ragged['batch_protein']]
    lig_c = ragged['ligand_pos'] - offset[ragged['batch_ligand']]
    opreds = oracle.decomp_forward(
        sd, cfg, NUM_CLASSES, NUM_BOND,
        prot_c, ragged['protein_feat'], ragged['batch_protein'],
        lig_c, ragged['ligand_v'], ragged['aux'], ragged['batch_ligand'],
        ragged['bond_index'], ragged['bond_type'])

    # ragged injected draws from the same padded arrays
    pos_eps_r, v_u_r = [], []
    for b, g in enumerate(graphs):
        n_l = len(g['ligand_pos'])
        pos_eps_r.append(pos_eps[0, b, :n_l])
        v_u_r.append(v_uniform[0, b, :n_l])
    pos_eps_r = np.concatenate(pos_eps_r).astype(np.float64)
    v_u_r = np.concatenate(v_u_r).astype(np.float64)
    b_u_r = np.stack([b_uniform[0, gi, i, j]
                      for (gi, i, j) in ragged['bond_local']]).astype(
        np.float64)

    pos_next, v_next, b_next = oracle.reverse_step(
        cfg, NUM_CLASSES, NUM_BOND, opreds,
        lig_c, ragged['ligand_v'], ragged['bond_type'],
        ragged['atom_stds'], t, ragged['batch_ligand'], ragged['batch_bond'],
        pos_eps_r, v_u_r, b_u_r)
    pos_next = pos_next + offset[ragged['batch_ligand']]

    got_pos = np.asarray(out['pos'], np.float64)
    got_v = np.asarray(out['v'])
    got_b = np.asarray(out['bond'])
    off_a = 0
    for b, g in enumerate(graphs):
        n_l = len(g['ligand_pos'])
        np.testing.assert_allclose(
            got_pos[b, :n_l], pos_next[off_a:off_a + n_l],
            rtol=3e-4, atol=3e-4, err_msg=f'pos_next graph {b}')
        np.testing.assert_array_equal(
            got_v[b, :n_l], v_next[off_a:off_a + n_l],
            err_msg=f'v_next graph {b}')
        off_a += n_l
    for e, (gi, i, j) in enumerate(ragged['bond_local']):
        assert got_b[gi, i, j] == b_next[e], f'bond edge {e} ({gi},{i},{j})'
