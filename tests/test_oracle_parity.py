"""End-to-end numeric parity: reference state dict -> (a) converter -> padded
flax model vs (b) pure-numpy ragged oracle (tests/reference_oracle.py).

This is the composition-level proof the per-component tests can't give: if any
detail of edge typing order, e_w placement, bond residual timing, triplet
enumeration, masking, centering or loss reduction diverges from the reference,
the padded model and the ragged oracle disagree.

Covers VERDICT.md round-1 item 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.data.batch import ComplexBatch, make_bond_mask
from decompdiff_tpu.models.diffusion_model import DecompDiffModel
from decompdiff_tpu.utils.convert_checkpoint import convert_reference_state_dict
from decompdiff_tpu.utils.testing import tiny_model_config

from tests import reference_oracle as oracle

NUM_CLASSES = 8
NUM_BOND = 5
PROTEIN_FEAT = 29  # 27 + 2 decomp indicator
K = 8


def _ragged_fixture(rng, sizes=((14, 6, 2), (11, 5, 1))):
    """Build one ragged complex set: list of per-graph dicts."""
    graphs = []
    for (n_p, n_l, n_arms) in sizes:
        g = {}
        g['protein_pos'] = rng.normal(size=(n_p, 3)) * 4.0
        g['protein_feat'] = (rng.random((n_p, PROTEIN_FEAT)) < 0.2).astype(
            np.float64)
        g['ligand_pos'] = rng.normal(size=(n_l, 3)) * 2.0
        g['ligand_v'] = rng.integers(0, NUM_CLASSES, size=(n_l,))
        g['num_arms'] = n_arms
        g['decomp_idx'] = rng.integers(0, n_arms + 1, size=(n_l,))
        arm_ind = (g['decomp_idx'] < n_arms).astype(np.float64)
        g['aux'] = np.stack([1 - arm_ind, arm_ind], -1)
        g['prior_centers'] = rng.normal(size=(n_arms + 1, 3)) * 2.0
        g['prior_stds'] = 0.6 + rng.random((n_arms + 1, 3))
        bt = rng.integers(0, NUM_BOND, size=(n_l, n_l))
        bt = np.triu(bt, 1)
        g['bond_mat'] = bt + bt.T  # symmetric ground-truth types, 0 diag
        graphs.append(g)
    return graphs


def _ragged_arrays(graphs):
    """Concatenate graphs into reference-style ragged arrays + batch vectors."""
    out = {}
    out['protein_pos'] = np.concatenate([g['protein_pos'] for g in graphs])
    out['protein_feat'] = np.concatenate([g['protein_feat'] for g in graphs])
    out['batch_protein'] = np.concatenate(
        [np.full(len(g['protein_pos']), i) for i, g in enumerate(graphs)])
    out['ligand_pos'] = np.concatenate([g['ligand_pos'] for g in graphs])
    out['ligand_v'] = np.concatenate([g['ligand_v'] for g in graphs])
    out['aux'] = np.concatenate([g['aux'] for g in graphs])
    out['batch_ligand'] = np.concatenate(
        [np.full(len(g['ligand_pos']), i) for i, g in enumerate(graphs)])
    # fc bond edge list: all ordered pairs (src=j, dst=i), per graph, with a
    # global ligand-atom index offset (the reference's __inc__ batching)
    src, dst, btype, bbatch, local = [], [], [], [], []
    off = 0
    for gi, g in enumerate(graphs):
        n = len(g['ligand_pos'])
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                src.append(off + j)
                dst.append(off + i)
                btype.append(g['bond_mat'][i, j])
                bbatch.append(gi)
                local.append((gi, i, j))
        off += n
    out['bond_index'] = np.array([src, dst], np.int64)
    out['bond_type'] = np.array(btype, np.int64)
    out['batch_bond'] = np.array(bbatch, np.int64)
    out['bond_local'] = local  # (graph, dst_i, src_j) per edge
    # per-ligand-atom prior center/std (ref decompdiff.py:437-441)
    centers = np.concatenate(
        [g['prior_centers'][g['decomp_idx']] for g in graphs])
    stds = np.concatenate([g['prior_stds'][g['decomp_idx']] for g in graphs])
    out['atom_centers'] = centers
    out['atom_stds'] = stds
    return out


def _padded_batch(graphs, n_p_pad=16, n_l_pad=8, a_pad=4):
    B = len(graphs)
    pp = np.zeros((B, n_p_pad, 3), np.float32)
    pf = np.zeros((B, n_p_pad, PROTEIN_FEAT), np.float32)
    pm = np.zeros((B, n_p_pad), bool)
    lp = np.zeros((B, n_l_pad, 3), np.float32)
    lv = np.zeros((B, n_l_pad), np.int32)
    la = np.zeros((B, n_l_pad, 2), np.float32)
    lm = np.zeros((B, n_l_pad), bool)
    di = np.zeros((B, n_l_pad), np.int32)
    bt = np.zeros((B, n_l_pad, n_l_pad), np.int32)
    pc = np.zeros((B, a_pad, 3), np.float32)
    ps = np.ones((B, a_pad, 3), np.float32)
    pn = np.zeros((B, a_pad), np.int32)
    pmask = np.zeros((B, a_pad), bool)
    arms = np.zeros((B,), np.int32)
    # padded ligand slots get far-away positions so they can never win a knn
    # slot — they are masked anyway; this just keeps the fixture honest
    for b, g in enumerate(graphs):
        n_p, n_l, n_a = len(g['protein_pos']), len(g['ligand_pos']), g['num_arms']
        pp[b, :n_p] = g['protein_pos']
        pf[b, :n_p] = g['protein_feat']
        pm[b, :n_p] = True
        lp[b, :n_l] = g['ligand_pos']
        lp[b, n_l:] = 1e3
        lv[b, :n_l] = g['ligand_v']
        la[b, :n_l] = g['aux']
        lm[b, :n_l] = True
        di[b, :n_l] = g['decomp_idx']
        bt[b, :n_l, :n_l] = g['bond_mat']
        pc[b, :n_a + 1] = g['prior_centers']
        ps[b, :n_a + 1] = g['prior_stds']
        pmask[b, :n_a + 1] = True
        arms[b] = n_a
        for a in range(n_a + 1):
            pn[b, a] = int((g['decomp_idx'] == a).sum())
    bm = make_bond_mask(lm)
    bt = np.where(bm, bt, 0)
    return ComplexBatch(
        protein_pos=jnp.asarray(pp), protein_feat=jnp.asarray(pf),
        protein_mask=jnp.asarray(pm), ligand_pos=jnp.asarray(lp),
        ligand_v=jnp.asarray(lv), ligand_aux=jnp.asarray(la),
        ligand_mask=jnp.asarray(lm), ligand_decomp_idx=jnp.asarray(di),
        bond_type=jnp.asarray(bt), bond_mask=jnp.asarray(bm),
        prior_centers=jnp.asarray(pc), prior_stds=jnp.asarray(ps),
        prior_num_atoms=jnp.asarray(pn), prior_mask=jnp.asarray(pmask),
        num_arms=jnp.asarray(arms))


def _config(**over):
    cfg = tiny_model_config(knn=K, num_layers=2, hidden_dim=32, n_heads=4)
    cfg.update(over)
    return cfg


@pytest.fixture(scope='module', params=['lin', 'pre_att'])
def setup(request):
    bond_net_type = request.param
    cfg = _config(bond_net_type=bond_net_type)
    rng = np.random.default_rng(7)
    graphs = _ragged_fixture(rng)
    ragged = _ragged_arrays(graphs)
    batch = _padded_batch(graphs)
    sd = oracle.make_reference_state_dict(
        np.random.default_rng(11), cfg, NUM_CLASSES, NUM_BOND,
        PROTEIN_FEAT, NUM_CLASSES + 2)
    params = convert_reference_state_dict(sd, cfg)
    params = jax.tree.map(jnp.asarray, params)
    model = DecompDiffModel.create(cfg, num_classes=NUM_CLASSES)
    return cfg, graphs, ragged, batch, sd, params, model


def _compare_preds(preds, opreds, ragged, graphs, rtol=3e-4, atol=3e-4):
    pred_pos = np.asarray(preds['pred_ligand_pos'], np.float64)
    pred_v = np.asarray(preds['pred_ligand_v'], np.float64)
    off = 0
    for b, g in enumerate(graphs):
        n_l = len(g['ligand_pos'])
        np.testing.assert_allclose(
            pred_pos[b, :n_l], opreds['pred_ligand_pos'][off:off + n_l],
            rtol=rtol, atol=atol, err_msg=f'pred_ligand_pos graph {b}')
        np.testing.assert_allclose(
            pred_v[b, :n_l], opreds['pred_ligand_v'][off:off + n_l],
            rtol=rtol, atol=atol, err_msg=f'pred_ligand_v graph {b}')
        off += n_l
    pred_bond = np.asarray(preds['pred_bond'], np.float64)
    for e, (gi, i, j) in enumerate(ragged['bond_local']):
        np.testing.assert_allclose(
            pred_bond[gi, i, j], opreds['pred_bond'][e],
            rtol=rtol, atol=atol, err_msg=f'pred_bond edge {e} ({gi},{i},{j})')


def test_forward_parity(setup):
    cfg, graphs, ragged, batch, sd, params, model = setup
    t = jnp.asarray([3, 7])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                        batch.bond_type, t)
    opreds = oracle.decomp_forward(
        sd, cfg, NUM_CLASSES, NUM_BOND,
        ragged['protein_pos'], ragged['protein_feat'], ragged['batch_protein'],
        ragged['ligand_pos'], ragged['ligand_v'], ragged['aux'],
        ragged['batch_ligand'], ragged['bond_index'], ragged['bond_type'])
    _compare_preds(preds, opreds, ragged, graphs)


@pytest.mark.parametrize('tval', [(3, 17), (0, 9)])
def test_loss_parity(setup, tval):
    cfg, graphs, ragged, batch, sd, params, model = setup
    rng = np.random.default_rng(23)
    B, Nl = batch.batch_size, batch.num_ligand_atoms
    t = np.asarray(tval, np.int64)

    pos_noise = np.zeros((B, Nl, 3), np.float32)
    v_pert = np.zeros((B, Nl), np.int64)
    b_pert = np.zeros((B, Nl, Nl), np.int64)
    lig_mask = np.asarray(batch.ligand_mask)
    bond_mask = np.asarray(batch.bond_mask)
    for b, g in enumerate(graphs):
        n_l = len(g['ligand_pos'])
        pos_noise[b, :n_l] = rng.normal(size=(n_l, 3))
        v_pert[b, :n_l] = rng.integers(0, NUM_CLASSES, size=(n_l,))
    b_pert = np.where(bond_mask, rng.integers(0, NUM_BOND, b_pert.shape), 0)
    v_pert = np.where(lig_mask, v_pert, 0)

    out = model.get_diffusion_loss(
        params, jax.random.PRNGKey(0), batch, time_step=jnp.asarray(t),
        noise_override={'pos_noise': pos_noise, 'v_perturbed': v_pert,
                        'b_perturbed': b_pert})

    # ragged injections from the same padded draws
    pos_noise_r, v_pert_r = [], []
    for b, g in enumerate(graphs):
        n_l = len(g['ligand_pos'])
        pos_noise_r.append(pos_noise[b, :n_l])
        v_pert_r.append(v_pert[b, :n_l])
    pos_noise_r = np.concatenate(pos_noise_r).astype(np.float64)
    v_pert_r = np.concatenate(v_pert_r)
    b_pert_r = np.array([b_pert[gi, i, j]
                         for (gi, i, j) in ragged['bond_local']], np.int64)

    oloss = oracle.decomp_loss(
        sd, cfg, NUM_CLASSES, NUM_BOND,
        ragged['protein_pos'], ragged['protein_feat'], ragged['batch_protein'],
        ragged['ligand_pos'], ragged['ligand_v'], ragged['aux'],
        ragged['batch_ligand'], ragged['atom_centers'], ragged['atom_stds'],
        ragged['bond_index'], ragged['bond_type'], ragged['batch_bond'],
        t, pos_noise_r, v_pert_r, b_pert_r)

    for key in ('pos', 'v', 'bond'):
        np.testing.assert_allclose(
            float(out['losses'][key]), float(oloss[key]),
            rtol=5e-4, atol=5e-4, err_msg=f'loss {key} (t={tval})')


def test_forward_parity_x2h_out_fc_full_context():
    """x2h_out_fc=True: the reference applies the bond-stream node update's
    out_fc MLP to the FULL context (bond edges only reach ligand atoms, so
    the scatter message is zero on protein rows, but node_output([0, h_row])
    is not; ref uni_transformer_edge.py:70-71,273). Regression for the
    ligand-only-slice bug (round-3 review): every other parity test uses
    x2h_out_fc=False (the released-config value)."""
    cfg = _config(bond_net_type='lin', x2h_out_fc=True)
    rng = np.random.default_rng(7)
    graphs = _ragged_fixture(rng)
    ragged = _ragged_arrays(graphs)
    batch = _padded_batch(graphs)
    sd = oracle.make_reference_state_dict(
        np.random.default_rng(29), cfg, NUM_CLASSES, NUM_BOND,
        PROTEIN_FEAT, NUM_CLASSES + 2)
    params = convert_reference_state_dict(sd, cfg)
    params = jax.tree.map(jnp.asarray, params)
    model = DecompDiffModel.create(cfg, num_classes=NUM_CLASSES)
    t = jnp.asarray([3, 7])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                        batch.bond_type, t)
    opreds = oracle.decomp_forward(
        sd, cfg, NUM_CLASSES, NUM_BOND,
        ragged['protein_pos'], ragged['protein_feat'], ragged['batch_protein'],
        ragged['ligand_pos'], ragged['ligand_v'], ragged['aux'],
        ragged['batch_ligand'], ragged['bond_index'], ragged['bond_type'])
    _compare_preds(preds, opreds, ragged, graphs)
