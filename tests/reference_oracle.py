r"""Pure-numpy ragged oracle of the reference DecompDiff forward + loss.

This is a direct transcription of the torch math over edge lists —
scatter_softmax / scatter_sum attention, CSR-style triplet enumeration, the
exact layer wiring of ref models/encoders/uni_transformer_edge.py:16-443 and
ref models/decompdiff.py:213-351,419-550 — with NO torch and NO jax. It
consumes a reference-layout state dict (the same key names/shapes as
`DecompScorePosNet3D.state_dict()`), so a single test proves the whole chain:

    reference state dict --convert_reference_state_dict--> flax padded model
                         \--this oracle (ragged numpy)---/  must agree.

Everything is float64 for a stable ground truth. Covered topologies: the
released `uni_o2_bond` (bond_diffusion, bond_net_type='lin'/'pre_att',
node_indicator, knn cutoff), the non-bond `uni_o2` refine net
(`make_reference_state_dict_o2`/`decomp_forward_o2`), prior-node context
composition (`add_prior_node`), and a single reverse-diffusion step with
injected noise (exercised by test_oracle_parity.py + test_oracle_extended.py).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# feature blocks (ref models/common.py)
# ---------------------------------------------------------------------------

FIXED_OFFSETS = np.array(
    [0, 1, 1.25, 1.5, 1.75, 2, 2.25, 2.5, 2.75, 3, 3.5, 4, 4.5, 5, 5.5, 6,
     7, 8, 9, 10], dtype=np.float64)


def fixed_rbf(dist):
    """GaussianSmearing with fix_offset=True (ref models/common.py:11-31).
    dist [...] -> [..., 20]; coeff = -0.5 / (offset[1]-offset[0])^2 = -0.5."""
    d = np.asarray(dist, np.float64)[..., None] - FIXED_OFFSETS
    return np.exp(-0.5 * d * d)


def linspace_rbf(dist, start, stop, num):
    offsets = np.linspace(start, stop, num)
    coeff = -0.5 / ((stop - start) / (num - 1)) ** 2
    d = np.asarray(dist, np.float64)[..., None] - offsets
    return np.exp(coeff * d * d)


def angular_encoding(x, num_funcs=3):
    """ref models/common.py:34-54; [...] -> [..., 4f+1]."""
    freq = np.array([i + 1 for i in range(num_funcs)]
                    + [1.0 / (i + 1) for i in range(num_funcs)], np.float64)
    x = np.asarray(x, np.float64)[..., None]
    return np.concatenate([x, np.sin(x * freq), np.cos(x * freq)], axis=-1)


def outer_product(a, b):
    """a-major flattening (ref models/common.py:116-123)."""
    out = a[..., :, None] * b[..., None, :]
    return out.reshape(out.shape[:-2] + (a.shape[-1] * b.shape[-1],))


def shifted_softplus(x):
    return np.logaddexp(0.0, x) - np.log(2.0)


def log_softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    s = np.log(np.exp(x - m).sum(axis=axis, keepdims=True))
    return x - m - s


# ---------------------------------------------------------------------------
# scatter ops (torch_scatter equivalents)
# ---------------------------------------------------------------------------

def scatter_sum(src, index, dim_size):
    out = np.zeros((dim_size,) + src.shape[1:], np.float64)
    np.add.at(out, index, src)
    return out


def scatter_mean(src, index, dim_size):
    s = scatter_sum(src, index, dim_size)
    cnt = np.zeros((dim_size,), np.float64)
    np.add.at(cnt, index, 1.0)
    cnt = np.maximum(cnt, 1.0).reshape((dim_size,) + (1,) * (src.ndim - 1))
    return s / cnt


def scatter_softmax(src, index, dim_size):
    """Groupwise softmax along axis 0 (torch_scatter.scatter_softmax)."""
    big = np.full((dim_size,) + src.shape[1:], -np.inf)
    np.maximum.at(big, index, src)
    e = np.exp(src - big[index])
    denom = scatter_sum(e, index, dim_size)
    return e / denom[index]


# ---------------------------------------------------------------------------
# parameter access (reference-layout state dict)
# ---------------------------------------------------------------------------

def _linear(sd, prefix, x):
    w = np.asarray(sd[f'{prefix}.weight'], np.float64)
    b = np.asarray(sd[f'{prefix}.bias'], np.float64)
    return x @ w.T + b


def _layernorm(x, w, b, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * w + b


def _mlp(sd, prefix, x):
    """MLP = Linear -> LayerNorm -> ReLU -> Linear (ref models/common.py:85-105)."""
    y = _linear(sd, f'{prefix}.net.0', x)
    y = _layernorm(y, np.asarray(sd[f'{prefix}.net.1.weight'], np.float64),
                   np.asarray(sd[f'{prefix}.net.1.bias'], np.float64))
    y = np.maximum(y, 0.0)
    return _linear(sd, f'{prefix}.net.3', y)


# ---------------------------------------------------------------------------
# graph construction
# ---------------------------------------------------------------------------

def knn_graph(pos, batch, k):
    """PyG knn_graph(flow='source_to_target'): for each node i, edges j->i
    from its k nearest same-graph neighbors (self excluded)."""
    pos = np.asarray(pos, np.float64)
    src, dst = [], []
    for g in np.unique(batch):
        idxs = np.nonzero(batch == g)[0]
        p = pos[idxs]
        d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        kk = min(k, len(idxs) - 1)
        nbr = np.argsort(d2, axis=1)[:, :kk]
        for li, i in enumerate(idxs):
            for j in nbr[li]:
                src.append(idxs[j])
                dst.append(i)
    return np.array([src, dst], np.int64)


def triplets(bond_index, num_nodes):
    """ref models/encoders/uni_transformer_edge.py:103-123. bond_index rows
    are (j=src, i=dst); for each edge e=(j->i) and each in-edge f=(k->j) with
    k != i, emit triplet (i, j, k, idx_kj=f, idx_ji=e)."""
    row, col = bond_index  # j -> i
    E = row.shape[0]
    in_edges = [[] for _ in range(num_nodes)]  # in_edges[n] = edge ids k->n
    for f in range(E):
        in_edges[col[f]].append(f)
    idx_i, idx_j, idx_k, idx_kj, idx_ji = [], [], [], [], []
    for e in range(E):
        j, i = row[e], col[e]
        for f in in_edges[j]:
            kk = row[f]
            if kk == i:
                continue
            idx_i.append(i)
            idx_j.append(j)
            idx_k.append(kk)
            idx_kj.append(f)
            idx_ji.append(e)
    return (np.array(idx_i, np.int64), np.array(idx_j, np.int64),
            np.array(idx_k, np.int64), np.array(idx_kj, np.int64),
            np.array(idx_ji, np.int64))


# ---------------------------------------------------------------------------
# attention layers (ref models/encoders/uni_transformer_edge.py)
# ---------------------------------------------------------------------------

def node_update_layer(sd, prefix, h, edge_feat, edge_index, n_heads,
                      e_w=None, out_fc=True):
    """ref uni_transformer_edge.py:16-74."""
    N = h.shape[0]
    src, dst = edge_index
    kv_input = np.concatenate([edge_feat, h[dst], h[src]], -1)
    k = _mlp(sd, f'{prefix}.hk_func', kv_input)
    v = _mlp(sd, f'{prefix}.hv_func', kv_input)
    if e_w is not None:
        v = v * e_w.reshape(-1, 1)
    H = k.shape[-1]
    hd = H // n_heads
    k = k.reshape(-1, n_heads, hd)
    v = v.reshape(-1, n_heads, hd)
    q = _mlp(sd, f'{prefix}.hq_func', h).reshape(-1, n_heads, hd)
    logits = (q[dst] * k).sum(-1) / np.sqrt(hd)
    alpha = scatter_softmax(logits, dst, N)
    out = scatter_sum(alpha[..., None] * v, dst, N).reshape(N, H)
    if out_fc:
        out = _mlp(sd, f'{prefix}.node_output', np.concatenate([out, h], -1))
    return out


def bond_update_layer(sd, prefix, h, h_bond, pos, bond_index, n_heads,
                      include_h_node):
    """ref uni_transformer_edge.py:77-167 (triplet angular attention)."""
    N, E = h.shape[0], h_bond.shape[0]
    idx_i, idx_j, idx_k, idx_kj, idx_ji = triplets(bond_index, N)
    j, i = bond_index
    dist = np.sqrt(((pos[i] - pos[j]) ** 2).sum(-1))  # (E,)
    pos_i = pos[idx_i]
    pos_ji = pos[idx_j] - pos_i
    pos_ki = pos[idx_k] - pos_i
    a = (pos_ji * pos_ki).sum(-1)
    b = np.linalg.norm(np.cross(pos_ji, pos_ki), axis=-1)
    angle = np.arctan2(b, a)
    r_feat = fixed_rbf(dist)
    a_feat = angular_encoding(angle)

    if include_h_node:
        kv_input = np.concatenate(
            [h_bond[idx_kj], r_feat[idx_kj], r_feat[idx_ji], a_feat,
             h[idx_k], h[idx_j]], -1)
        q_input = np.concatenate([h_bond, h[i]], -1)
    else:
        kv_input = np.concatenate(
            [h_bond[idx_kj], r_feat[idx_kj], r_feat[idx_ji], a_feat], -1)
        q_input = h_bond

    k = _mlp(sd, f'{prefix}.hk_func', kv_input)
    v = _mlp(sd, f'{prefix}.hv_func', kv_input)
    H = k.shape[-1]
    hd = H // n_heads
    k = k.reshape(-1, n_heads, hd)
    v = v.reshape(-1, n_heads, hd)
    q = _mlp(sd, f'{prefix}.hq_func', q_input).reshape(-1, n_heads, hd)
    logits = (q[idx_ji] * k).sum(-1) / np.sqrt(hd)
    alpha = scatter_softmax(logits, idx_ji, E)
    out = scatter_sum(alpha[..., None] * v, idx_ji, E).reshape(E, H)
    return out


def pos_update_layer(sd, prefix, h, rel_x, edge_feat, edge_index, n_heads,
                     e_w=None):
    """ref uni_transformer_edge.py:170-210."""
    N = h.shape[0]
    src, dst = edge_index
    kv_input = np.concatenate([edge_feat, h[dst], h[src]], -1)
    k = _mlp(sd, f'{prefix}.xk_func', kv_input)
    v = _mlp(sd, f'{prefix}.xv_func', kv_input)  # [E, n_heads]
    if e_w is not None:
        v = v * e_w.reshape(-1, 1)
    v = v[..., None] * rel_x[:, None, :]          # [E, heads, 3]
    H = k.shape[-1]
    hd = H // n_heads
    k = k.reshape(-1, n_heads, hd)
    q = _mlp(sd, f'{prefix}.xq_func', h).reshape(-1, n_heads, hd)
    logits = (q[dst] * k).sum(-1) / np.sqrt(hd)
    alpha = scatter_softmax(logits, dst, N)
    out = scatter_sum(alpha[..., None] * v, dst, N)  # [N, heads, 3]
    return out.mean(1)


def attention_layer(sd, base, h, x, edge_attr, edge_index, h_bond,
                    bond_index, mask_ligand_atom, n_heads, e_w=None,
                    x2h_out_fc=True, include_h_node=False):
    """ref uni_transformer_edge.py:213-287."""
    src, dst = edge_index
    rel_x = x[dst] - x[src]
    dist = np.sqrt((rel_x ** 2).sum(-1))
    dist_feat = fixed_rbf(dist)
    dist_feat = outer_product(edge_attr, dist_feat)
    edge_feat = np.concatenate([dist_feat, edge_attr], -1)
    new_h_with_edge = node_update_layer(
        sd, f'{base}.node_layer_with_edge', h, edge_feat, edge_index,
        n_heads, e_w=e_w, out_fc=x2h_out_fc)
    new_h_with_bond = node_update_layer(
        sd, f'{base}.node_layer_with_bond', h, h_bond, bond_index,
        n_heads, e_w=None, out_fc=x2h_out_fc)
    new_h_bond = h_bond + bond_update_layer(
        sd, f'{base}.bond_layer', h, h_bond, x, bond_index, n_heads,
        include_h_node)
    new_h = h + _linear(sd, f'{base}.lin_node',
                        new_h_with_edge + new_h_with_bond)
    dx_edge = pos_update_layer(sd, f'{base}.pos_layer_with_edge', new_h,
                               rel_x, edge_feat, edge_index, n_heads, e_w=e_w)
    bond_src, bond_dst = bond_index
    rel_bond_x = x[bond_dst] - x[bond_src]
    dx_bond = pos_update_layer(sd, f'{base}.pos_layer_with_bond', new_h,
                               rel_bond_x, new_h_bond, bond_index, n_heads)
    dx = dx_edge + dx_bond
    x = x + dx * mask_ligand_atom[:, None]
    return new_h, new_h_bond, x


def build_edge_type(edge_index, mask_ligand, group_idx=None):
    """ref uni_transformer_edge.py:361-392."""
    src, dst = edge_index
    n_src = mask_ligand[src]
    n_dst = mask_ligand[dst]
    et = np.zeros(len(src), np.int64)
    et[n_src & n_dst] = 0
    et[n_src & ~n_dst] = 1
    et[~n_src & n_dst] = 2
    et[~n_src & ~n_dst] = 3
    out = np.eye(4)[et]
    if group_idx is not None:
        same = (group_idx[src] == group_idx[dst]).astype(np.int64)
        out = np.concatenate([out, np.eye(2)[same]], -1)
    return out


def uni_transformer_bond(sd, cfg, h, x, group_idx, bond_index, h_bond,
                         mask_ligand, mask_ligand_atom, batch):
    """ref uni_transformer_edge.py:290-443 forward."""
    n_heads = cfg['n_heads']
    k = cfg['knn']
    for _ in range(cfg['num_blocks']):
        edge_index = knn_graph(x, batch, k)
        edge_type = build_edge_type(edge_index, mask_ligand, group_idx)
        src, dst = edge_index
        # the reference never forwards use_global_ew to the bond net (ref
        # models/encoders/__init__.py:30-46) — e_w is unconditionally on
        if True:
            dist = np.sqrt(((x[dst] - x[src]) ** 2).sum(-1))
            logits = _mlp(sd, 'refine_net.edge_pred_layer', fixed_rbf(dist))
            e_w = 1.0 / (1.0 + np.exp(-logits))
        else:
            e_w = None
        for l in range(cfg['num_layers']):
            h, h_bond, x = attention_layer(
                sd, f'refine_net.base_block.{l}', h, x, edge_type,
                edge_index, h_bond, bond_index, mask_ligand_atom, n_heads,
                e_w=e_w, x2h_out_fc=cfg.get('x2h_out_fc', True),
                include_h_node=cfg.get('h_node_in_bond_net', False))
    return {'x': x, 'h': h, 'h_bond': h_bond}


# ---------------------------------------------------------------------------
# context composition (ref models/common.py:167-194)
# ---------------------------------------------------------------------------

def compose_context(h_protein, h_ligand, pos_protein, pos_ligand,
                    batch_protein, batch_ligand):
    batch_ctx = np.concatenate([batch_protein, batch_ligand])
    sort_idx = np.argsort(batch_ctx, kind='stable')
    mask_ligand = np.concatenate([
        np.zeros(len(batch_protein), bool), np.ones(len(batch_ligand), bool),
    ])[sort_idx]
    batch_all = batch_ctx[sort_idx]
    h_all = np.concatenate([h_protein, h_ligand], 0)[sort_idx]
    pos_all = np.concatenate([pos_protein, pos_ligand], 0)[sort_idx]
    # ligand_index_in_ctx: position of each original ligand atom in ctx
    inv = np.empty_like(sort_idx)
    inv[sort_idx] = np.arange(len(sort_idx))
    l_index_in_ctx = inv[len(batch_protein):]
    return h_all, pos_all, batch_all, mask_ligand, l_index_in_ctx


# ---------------------------------------------------------------------------
# DecompScorePosNet3D.forward (ref models/decompdiff.py:213-351)
# ---------------------------------------------------------------------------

def decomp_forward(sd, cfg, num_classes, num_bond_classes,
                   protein_pos, protein_v, batch_protein,
                   ligand_pos, ligand_v, ligand_v_aux, batch_ligand,
                   ligand_fc_bond_index, ligand_fc_bond_type):
    """Released topology: node_indicator, no prior node, no time embedding."""
    assert not cfg.get('add_prior_node', False)
    assert cfg.get('time_emb_dim', 0) == 0
    v_onehot = np.eye(num_classes)[ligand_v]
    lig_feat = np.concatenate([v_onehot, ligand_v_aux], -1)
    h_protein = _linear(sd, 'protein_atom_emb', np.asarray(protein_v, np.float64))
    h_ligand = _linear(sd, 'ligand_atom_emb', lig_feat)
    if cfg.get('node_indicator', True):
        h_protein = np.concatenate(
            [h_protein, np.zeros((len(h_protein), 1))], -1)
        h_ligand = np.concatenate([h_ligand, np.ones((len(h_ligand), 1))], -1)

    h_all, pos_all, batch_all, mask_ligand, l_index_in_ctx = compose_context(
        h_protein, h_ligand, np.asarray(protein_pos, np.float64),
        np.asarray(ligand_pos, np.float64), batch_protein, batch_ligand)
    bond_index_in_all = l_index_in_ctx[ligand_fc_bond_index]

    bond_onehot = np.eye(num_bond_classes)[ligand_fc_bond_type]
    h_bond = _linear(sd, 'ligand_bond_emb', bond_onehot)

    outputs = uni_transformer_bond(
        sd, cfg, h_all, pos_all, None, bond_index_in_all, h_bond,
        mask_ligand, mask_ligand.astype(np.float64), batch_all)

    final_pos, final_h = outputs['x'], outputs['h']
    final_ligand_pos = final_pos[mask_ligand]
    final_ligand_h = final_h[mask_ligand]
    y = _linear(sd, 'v_inference.0', final_ligand_h)
    final_ligand_v = _linear(sd, 'v_inference.2', shifted_softplus(y))
    preds = {'pred_ligand_pos': final_ligand_pos,
             'pred_ligand_v': final_ligand_v}

    if cfg.get('bond_diffusion', False):
        bond_net_type = cfg.get('bond_net_type', 'lin')
        if bond_net_type == 'lin':
            bond_inf_input = outputs['h_bond']
        elif bond_net_type == 'pre_att':
            src, dst = bond_index_in_all
            dist = np.sqrt(((final_pos[dst] - final_pos[src]) ** 2).sum(-1))
            r_feat = linspace_rbf(dist, 0.0, 5.0, cfg.get('num_r_gaussian', 20))
            hi, hj = final_h[dst], final_h[src]
            bond_inf_input = np.concatenate([r_feat, (hi + hj) / 2], -1)
        else:
            raise ValueError(bond_net_type)
        y = _linear(sd, 'bond_inference.0', bond_inf_input)
        preds['pred_bond'] = _linear(sd, 'bond_inference.2',
                                     shifted_softplus(y))
    return preds


# ---------------------------------------------------------------------------
# schedules + transitions (ref models/transitions.py, decompdiff.py:96-131)
# ---------------------------------------------------------------------------

def cosine_alpha_schedule(timesteps, s=0.008):
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    alphas = np.clip(ac[1:] / ac[:-1], 0.001, 1.0)
    return np.sqrt(alphas)


def sigmoid_betas(beta_start, beta_end, T):
    x = np.linspace(-6, 6, T)
    return 1.0 / (np.exp(-x) + 1) * (beta_end - beta_start) + beta_start


class PosSchedule:
    """Gaussian schedule coefficients (ref models/decompdiff.py:96-131)."""

    def __init__(self, cfg):
        T = cfg['num_diffusion_timesteps']
        if cfg['beta_schedule'] == 'cosine':
            alphas = cosine_alpha_schedule(T, cfg['pos_beta_s']) ** 2
            betas = 1.0 - alphas
        elif cfg['beta_schedule'] == 'sigmoid':
            betas = sigmoid_betas(cfg['beta_start'], cfg['beta_end'], T)
            alphas = 1.0 - betas
        else:
            raise NotImplementedError(cfg['beta_schedule'])
        self.alphas_cumprod = np.cumprod(alphas)
        ac_prev = np.append(1.0, self.alphas_cumprod[:-1])
        self.posterior_mean_c0_coef = (
            betas * np.sqrt(ac_prev) / (1.0 - self.alphas_cumprod))
        self.posterior_mean_ct_coef = (
            (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - self.alphas_cumprod))
        pv = betas * (1.0 - ac_prev) / (1.0 - self.alphas_cumprod)
        self.posterior_var = pv
        self.posterior_logvar = np.log(np.append(pv[1], pv[1:]))


class DiscreteTransition:
    """ref models/transitions.py:97-161 (uniform prior only)."""

    def __init__(self, T, s, num_classes):
        la = np.log(cosine_alpha_schedule(T, s))
        self.log_alphas = la
        self.log_one_minus_alphas = np.log(1 - np.exp(la) + 1e-40)
        self.log_ac = np.cumsum(la)
        self.log_one_minus_ac = np.log(1 - np.exp(self.log_ac) + 1e-40)
        self.prior = np.full((num_classes,), -np.log(num_classes))
        self.K = num_classes

    @staticmethod
    def _log_add_exp(a, b):
        m = np.maximum(a, b)
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    def q_v_pred_one_timestep(self, log_vt_1, t, batch):
        la = self.log_alphas[t][batch][:, None]
        l1a = self.log_one_minus_alphas[t][batch][:, None]
        return self._log_add_exp(log_vt_1 + la, l1a + self.prior)

    def q_v_pred(self, log_v0, t, batch):
        lc = self.log_ac[t][batch][:, None]
        l1c = self.log_one_minus_ac[t][batch][:, None]
        return self._log_add_exp(log_v0 + lc, l1c + self.prior)

    def q_v_posterior(self, log_v0, log_vt, t, batch):
        tm1 = np.maximum(t - 1, 0)
        log_qvt1_v0 = self.q_v_pred(log_v0, tm1, batch)
        un = log_qvt1_v0 + self.q_v_pred_one_timestep(log_vt, t, batch)
        return un - _logsumexp(un)


def _logsumexp(x):
    m = x.max(-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(-1, keepdims=True))


def index_to_log_onehot(x, K):
    return np.log(np.clip(np.eye(K)[x], 1e-30, None))


def categorical_kl(log_p, log_q):
    return (np.exp(log_p) * (log_p - log_q)).sum(-1)


def log_categorical(log_x0, log_prob):
    return (np.exp(log_x0) * log_prob).sum(-1)


def compute_v_lt(log_model, log_v0, log_true, t, batch, num_graphs):
    """ref models/decompdiff.py:411-417."""
    kl = categorical_kl(log_true, log_model)
    nll = -log_categorical(log_v0, log_model)
    mask = (t == 0).astype(np.float64)[batch]
    return scatter_mean(mask * nll + (1 - mask) * kl, batch, num_graphs)


# ---------------------------------------------------------------------------
# get_diffusion_loss (ref models/decompdiff.py:419-550) with injected noise
# ---------------------------------------------------------------------------

def decomp_loss(sd, cfg, num_classes, num_bond_classes,
                protein_pos, protein_v, batch_protein,
                ligand_pos, ligand_v, ligand_v_aux, batch_ligand,
                atom_prior_centers, atom_prior_stds,
                ligand_fc_bond_index, ligand_fc_bond_type, batch_ligand_bond,
                time_step, pos_noise, v_perturbed, b_perturbed):
    """All randomness injected: time_step [B], pos_noise [Nl,3],
    v_perturbed [Nl], b_perturbed [E]. atom_prior_* are per-ligand-atom."""
    num_graphs = int(batch_protein.max()) + 1
    pos_sched = PosSchedule(cfg)
    atom_trans = DiscreteTransition(cfg['num_diffusion_timesteps'],
                                    cfg.get('v_beta_s', 0.01), num_classes)
    bond_trans = DiscreteTransition(cfg['num_diffusion_timesteps'],
                                    cfg.get('v_beta_s', 0.01), num_bond_classes)

    a = pos_sched.alphas_cumprod[time_step]
    a_pos = a[batch_ligand][:, None]
    ligand_pos = np.asarray(ligand_pos, np.float64)
    ligand_pos_perturbed = (
        np.sqrt(a_pos) * (ligand_pos - atom_prior_centers)
        + np.sqrt(1.0 - a_pos) * pos_noise * atom_prior_stds
        + atom_prior_centers)

    log_v0 = index_to_log_onehot(ligand_v, num_classes)
    log_vt = index_to_log_onehot(v_perturbed, num_classes)
    log_b0 = index_to_log_onehot(ligand_fc_bond_type, num_bond_classes)
    log_bt = index_to_log_onehot(b_perturbed, num_bond_classes)

    # center by protein centroid (ref :20-32,459-462)
    offset = scatter_mean(np.asarray(protein_pos, np.float64),
                          batch_protein, num_graphs)
    protein_pos_c = protein_pos - offset[batch_protein]
    ligand_pos_perturbed_c = ligand_pos_perturbed - offset[batch_ligand]
    ligand_pos_c = ligand_pos - offset[batch_ligand]

    preds = decomp_forward(
        sd, cfg, num_classes, num_bond_classes,
        protein_pos_c, protein_v, batch_protein,
        ligand_pos_perturbed_c, v_perturbed, ligand_v_aux, batch_ligand,
        ligand_fc_bond_index, b_perturbed)

    pred_pos, pred_v = preds['pred_ligand_pos'], preds['pred_ligand_v']
    assert cfg.get('model_mean_type', 'C0') == 'C0'

    log_v_recon = log_softmax(pred_v, -1)
    log_v_model = atom_trans.q_v_posterior(log_v_recon, log_vt, time_step,
                                            batch_ligand)
    log_v_true = atom_trans.q_v_posterior(log_v0, log_vt, time_step,
                                           batch_ligand)
    kl_v = compute_v_lt(log_v_model, log_v0, log_v_true, time_step,
                        batch_ligand, num_graphs)
    loss_v = kl_v.mean()

    log_b_recon = log_softmax(preds['pred_bond'], -1)
    log_b_model = bond_trans.q_v_posterior(log_b_recon, log_bt, time_step,
                                            batch_ligand_bond)
    log_b_true = bond_trans.q_v_posterior(log_b0, log_bt, time_step,
                                           batch_ligand_bond)
    kl_b = compute_v_lt(log_b_model, log_b0, log_b_true, time_step,
                        batch_ligand_bond, num_graphs)
    loss_bond = kl_b.mean()

    per_atom = (((pred_pos - ligand_pos_c) ** 2)
                / (atom_prior_stds ** 2)).sum(-1)
    loss_pos = scatter_mean(per_atom, batch_ligand, num_graphs).mean()

    return {'pos': loss_pos, 'v': loss_v, 'bond': loss_bond,
            'pred_ligand_pos': pred_pos, 'pred_ligand_v': pred_v,
            'pred_bond': preds['pred_bond'],
            'ligand_pos_perturbed_c': ligand_pos_perturbed_c}


# ---------------------------------------------------------------------------
# reference-layout synthetic state dict builder
# ---------------------------------------------------------------------------

def make_reference_state_dict(rng, cfg, num_classes, num_bond_classes,
                              protein_feat_dim, ligand_feat_dim):
    """Random state dict with the reference's exact key names and shapes for
    the released uni_o2_bond topology."""
    H = cfg['hidden_dim']
    heads = cfg['n_heads']
    fe = cfg.get('edge_feat_dim', 4) * 21
    include_h = cfg.get('h_node_in_bond_net', False)
    x2h_out_fc = cfg.get('x2h_out_fc', True)
    emb = H - 1 if cfg.get('node_indicator', True) else H
    sd = {}

    def lin(prefix, i, o):
        sd[f'{prefix}.weight'] = rng.normal(size=(o, i)) * (1.0 / np.sqrt(i))
        sd[f'{prefix}.bias'] = rng.normal(size=(o,)) * 0.05

    def mlp(prefix, i, o):
        lin(f'{prefix}.net.0', i, H)
        sd[f'{prefix}.net.1.weight'] = 1.0 + rng.normal(size=(H,)) * 0.05
        sd[f'{prefix}.net.1.bias'] = rng.normal(size=(H,)) * 0.05
        lin(f'{prefix}.net.3', H, o)

    lin('protein_atom_emb', protein_feat_dim, emb)
    lin('ligand_atom_emb', ligand_feat_dim, emb)
    lin('ligand_bond_emb', num_bond_classes, H)
    lin('v_inference.0', H, H)
    lin('v_inference.2', H, num_classes)
    if cfg.get('bond_diffusion', False):
        bond_in = (H if cfg.get('bond_net_type', 'lin') == 'lin'
                   else cfg.get('num_r_gaussian', 20) + H)
        lin('bond_inference.0', bond_in, H)
        lin('bond_inference.2', H, num_bond_classes)
    # use_global_ew is not a real reference knob for the bond net (never
    # forwarded; always constructor-default True)
    mlp('refine_net.edge_pred_layer', 20, 1)
    bond_kv = H + 20 * 2 + 13 + (2 * H if include_h else 0)
    bond_q = 2 * H if include_h else H
    for l in range(cfg['num_layers']):
        base = f'refine_net.base_block.{l}'
        lin(f'{base}.lin_node', H, H)
        for m in ('hk', 'hv'):
            mlp(f'{base}.node_layer_with_edge.{m}_func', fe + 2 * H, H)
            mlp(f'{base}.node_layer_with_bond.{m}_func', 3 * H, H)
            mlp(f'{base}.bond_layer.{m}_func', bond_kv, H)
        mlp(f'{base}.node_layer_with_edge.hq_func', H, H)
        mlp(f'{base}.node_layer_with_bond.hq_func', H, H)
        mlp(f'{base}.bond_layer.hq_func', bond_q, H)
        if x2h_out_fc:
            mlp(f'{base}.node_layer_with_edge.node_output', 2 * H, H)
            mlp(f'{base}.node_layer_with_bond.node_output', 2 * H, H)
        mlp(f'{base}.pos_layer_with_edge.xk_func', fe + 2 * H, H)
        mlp(f'{base}.pos_layer_with_edge.xv_func', fe + 2 * H, heads)
        mlp(f'{base}.pos_layer_with_edge.xq_func', H, H)
        mlp(f'{base}.pos_layer_with_bond.xk_func', 3 * H, H)
        mlp(f'{base}.pos_layer_with_bond.xv_func', 3 * H, heads)
        mlp(f'{base}.pos_layer_with_bond.xq_func', H, H)
    return sd


# ---------------------------------------------------------------------------
# uni_o2 refine net (ref models/encoders/uni_transformer.py:15-332)
# ---------------------------------------------------------------------------

def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def base_x2h_layer(sd, prefix, h, r_feat, edge_feat, edge_index, n_heads,
                   ew_net_type, e_w=None, out_fc=True):
    """ref BaseX2HAttLayer (:15-88); kv = [edge_feat?, r_feat, h_i, h_j],
    residual inside the layer."""
    N = h.shape[0]
    src, dst = edge_index
    kv_input = np.concatenate([r_feat, h[dst], h[src]], -1)
    if edge_feat is not None:
        kv_input = np.concatenate([edge_feat, kv_input], -1)
    k = _mlp(sd, f'{prefix}.hk_func', kv_input)
    v = _mlp(sd, f'{prefix}.hv_func', kv_input)
    H = k.shape[-1]
    if ew_net_type == 'r':
        ew = _sigmoid(_linear(sd, f'{prefix}.ew_net.0', r_feat))
    elif ew_net_type == 'm':
        ew = _sigmoid(_linear(sd, f'{prefix}.ew_net.0', v[..., :H]))
    elif e_w is not None:
        ew = np.asarray(e_w).reshape(-1, 1)
    else:
        ew = 1.0
    v = v * ew
    hd = H // n_heads
    k = k.reshape(-1, n_heads, hd)
    v = v.reshape(-1, n_heads, hd)
    q = _mlp(sd, f'{prefix}.hq_func', h).reshape(-1, n_heads, hd)
    logits = (q[dst] * k).sum(-1) / np.sqrt(hd)
    alpha = scatter_softmax(logits, dst, N)
    out = scatter_sum(alpha[..., None] * v, dst, N).reshape(N, H)
    if out_fc:
        out = _mlp(sd, f'{prefix}.node_output', np.concatenate([out, h], -1))
    return out + h


def base_h2x_layer(sd, prefix, h, rel_x, r_feat, edge_feat, edge_index,
                   n_heads, ew_net_type, e_w=None):
    """ref BaseH2XAttLayer (:91-144); 'm' is identity here (ref :128-129)."""
    N = h.shape[0]
    src, dst = edge_index
    kv_input = np.concatenate([r_feat, h[dst], h[src]], -1)
    if edge_feat is not None:
        kv_input = np.concatenate([edge_feat, kv_input], -1)
    k = _mlp(sd, f'{prefix}.xk_func', kv_input)
    v = _mlp(sd, f'{prefix}.xv_func', kv_input)   # [E, n_heads]
    if ew_net_type == 'r':
        ew = _sigmoid(_linear(sd, f'{prefix}.ew_net.0', r_feat))
    elif ew_net_type == 'm':
        ew = 1.0
    elif e_w is not None:
        ew = np.asarray(e_w).reshape(-1, 1)
    else:
        ew = 1.0
    v = v * ew
    v = v[..., None] * rel_x[:, None, :]
    H = k.shape[-1]
    hd = H // n_heads
    k = k.reshape(-1, n_heads, hd)
    q = _mlp(sd, f'{prefix}.xq_func', h).reshape(-1, n_heads, hd)
    logits = (q[dst] * k).sum(-1) / np.sqrt(hd)
    alpha = scatter_softmax(logits, dst, N)
    out = scatter_sum(alpha[..., None] * v, dst, N)
    return out.mean(1)


def o2_attention_layer(sd, base, h, x, edge_attr, edge_index, mask_update,
                       n_heads, cfg, e_w=None):
    """ref AttentionLayerO2TwoUpdateNodeGeneral.forward (:200-213).
    NOTE the reference gates the x update on `mask_ligand`; prior nodes can
    never reach this net upstream (DecompScorePosNet3D passes group_idx /
    bond_index kwargs the net does not accept, so the uni_o2 + prior-node
    combination crashes in the reference), hence mask_update == the movable
    ligand atoms in every reachable configuration."""
    src, dst = edge_index
    ew_t = cfg.get('ew_net_type', 'r')
    edge_feat = edge_attr if cfg.get('edge_feat_dim', 4) > 0 else None
    rel_x = x[dst] - x[src]
    dist = np.sqrt((rel_x ** 2).sum(-1))
    h_in = h
    for i in range(cfg.get('num_x2h', 1)):
        r_feat = outer_product(edge_attr, fixed_rbf(dist))
        h_in = base_x2h_layer(sd, f'{base}.x2h_layers.{i}', h_in, r_feat,
                              edge_feat, edge_index, n_heads, ew_t, e_w,
                              cfg.get('x2h_out_fc', True))
    x2h_out = h_in
    new_h = h if cfg.get('sync_twoup', False) else x2h_out
    for i in range(cfg.get('num_h2x', 1)):
        r_feat = outer_product(edge_attr, fixed_rbf(dist))
        delta_x = base_h2x_layer(sd, f'{base}.h2x_layers.{i}', new_h, rel_x,
                                 r_feat, edge_feat, edge_index, n_heads,
                                 ew_t, e_w)
        x = x + delta_x * mask_update[:, None]
        rel_x = x[dst] - x[src]
        dist = np.sqrt((rel_x ** 2).sum(-1))
    return x2h_out, x


def uni_transformer_o2(sd, cfg, h, x, mask_ligand, mask_update, batch):
    """ref UniTransformerO2TwoUpdateGeneral.forward (:319-332)."""
    n_heads = cfg['n_heads']
    for _ in range(cfg['num_blocks']):
        edge_index = knn_graph(x, batch, cfg['knn'])
        edge_type = build_edge_type(edge_index, mask_ligand)
        src, dst = edge_index
        if cfg.get('ew_net_type', 'r') == 'global':
            dist = np.sqrt(((x[dst] - x[src]) ** 2).sum(-1))
            logits = _mlp(sd, 'refine_net.edge_pred_layer', fixed_rbf(dist))
            e_w = _sigmoid(logits)
        else:
            e_w = None
        for l in range(cfg['num_layers']):
            h, x = o2_attention_layer(
                sd, f'refine_net.base_block.{l}', h, x, edge_type, edge_index,
                mask_update, n_heads, cfg, e_w)
    return {'x': x, 'h': h}


# ---------------------------------------------------------------------------
# prior-node composition (ref models/common.py:197-227, decompdiff.py:241-258)
# ---------------------------------------------------------------------------

def compose_context_with_prior(h_protein, h_ligand, h_prior,
                               pos_protein, pos_ligand, pos_prior,
                               batch_protein, batch_ligand, batch_prior,
                               group_protein, group_ligand, group_prior):
    batch_ctx = np.concatenate([batch_protein, batch_ligand, batch_prior])
    sort_idx = np.argsort(batch_ctx, kind='stable')
    n_p, n_l, n_pr = len(batch_protein), len(batch_ligand), len(batch_prior)
    mask_ligand = np.concatenate(
        [np.zeros(n_p, bool), np.ones(n_l + n_pr, bool)])[sort_idx]
    mask_ligand_atom = np.concatenate(
        [np.zeros(n_p, bool), np.ones(n_l, bool),
         np.zeros(n_pr, bool)])[sort_idx]
    batch_all = batch_ctx[sort_idx]
    h_all = np.concatenate([h_protein, h_ligand, h_prior], 0)[sort_idx]
    pos_all = np.concatenate([pos_protein, pos_ligand, pos_prior],
                             0)[sort_idx]
    group_all = np.concatenate([group_protein, group_ligand, group_prior],
                               0)[sort_idx]
    inv = np.empty_like(sort_idx)
    inv[sort_idx] = np.arange(len(sort_idx))
    l_index_in_ctx = inv[n_p:n_p + n_l]
    return (h_all, pos_all, group_all, batch_all, mask_ligand,
            mask_ligand_atom, l_index_in_ctx)


def decomp_forward_prior(sd, cfg, num_classes, num_bond_classes,
                         protein_pos, protein_v, batch_protein,
                         ligand_pos, ligand_v, ligand_v_aux, batch_ligand,
                         ligand_group_idx,
                         prior_centers, prior_stds, batch_prior,
                         prior_group_idx,
                         ligand_fc_bond_index, ligand_fc_bond_type):
    """add_prior_node topology over uni_o2_bond (ref decompdiff.py:241-316):
    prior dummies embed linspace(0,5,20) RBFs of their std, carry a 3-way
    indicator, count as ligand for edge typing, and never move. prior_stds
    here are per-node scalars.

    DELIBERATE DIVERGENCE from the torch reference (documented in
    PARITY.md): the reference's prior_stds arrive [n_prior, 3] and
    GaussianSmearing's dist.view(-1, 1) (ref models/common.py:30) expands
    them to 3*n_prior rows, of which compose_context_with_prior keeps only
    the first n_prior (ref models/common.py:222) — so reference prior node
    k is embedded with the std of node k//3, a BATCH-GLOBAL index that
    crosses graph boundaries and depends on how the torch collator
    flattened the batch. That scramble is an unintended artifact, cannot be
    expressed in per-graph padded batching, and is unreachable by released
    configs (training.yml sets add_prior_node: False); this oracle and the
    production model both use the intended per-node std."""
    assert cfg.get('add_prior_node', False)
    v_onehot = np.eye(num_classes)[ligand_v]
    lig_feat = np.concatenate([v_onehot, ligand_v_aux], -1)
    h_protein = _linear(sd, 'protein_atom_emb',
                        np.asarray(protein_v, np.float64))
    h_ligand = _linear(sd, 'ligand_atom_emb', lig_feat)
    prior_std_feat = linspace_rbf(np.asarray(prior_stds, np.float64), 0.0,
                                  5.0, 20)
    h_prior = _linear(sd, 'prior_atom_emb', prior_std_feat)
    if cfg.get('node_indicator', True):
        eye = np.eye(3)
        h_protein = np.concatenate(
            [h_protein, np.tile(eye[0], (len(h_protein), 1))], -1)
        h_ligand = np.concatenate(
            [h_ligand, np.tile(eye[1], (len(h_ligand), 1))], -1)
        h_prior = np.concatenate(
            [h_prior, np.tile(eye[2], (len(h_prior), 1))], -1)

    protein_group_idx = np.full(len(h_protein), -1, np.int64)
    (h_all, pos_all, group_all, batch_all, mask_ligand, mask_ligand_atom,
     l_index_in_ctx) = compose_context_with_prior(
        h_protein, h_ligand, h_prior,
        np.asarray(protein_pos, np.float64),
        np.asarray(ligand_pos, np.float64),
        np.asarray(prior_centers, np.float64),
        batch_protein, batch_ligand, batch_prior,
        protein_group_idx, ligand_group_idx, prior_group_idx)
    bond_index_in_all = l_index_in_ctx[ligand_fc_bond_index]

    bond_onehot = np.eye(num_bond_classes)[ligand_fc_bond_type]
    h_bond = _linear(sd, 'ligand_bond_emb', bond_onehot)

    outputs = uni_transformer_bond(
        sd, cfg, h_all, pos_all, group_all, bond_index_in_all, h_bond,
        mask_ligand, mask_ligand_atom.astype(np.float64), batch_all)

    final_pos, final_h = outputs['x'], outputs['h']
    final_ligand_pos = final_pos[mask_ligand_atom]
    final_ligand_h = final_h[mask_ligand_atom]
    y = _linear(sd, 'v_inference.0', final_ligand_h)
    final_ligand_v = _linear(sd, 'v_inference.2', shifted_softplus(y))
    preds = {'pred_ligand_pos': final_ligand_pos,
             'pred_ligand_v': final_ligand_v}
    if cfg.get('bond_diffusion', False):
        assert cfg.get('bond_net_type', 'lin') == 'lin'
        y = _linear(sd, 'bond_inference.0', outputs['h_bond'])
        preds['pred_bond'] = _linear(sd, 'bond_inference.2',
                                     shifted_softplus(y))
    return preds


def decomp_forward_o2(sd, cfg, num_classes, num_bond_classes,
                      protein_pos, protein_v, batch_protein,
                      ligand_pos, ligand_v, ligand_v_aux, batch_ligand,
                      ligand_fc_bond_index=None):
    """model_type='uni_o2' (no bond stream; bond head only as 'pre_att')."""
    assert not cfg.get('add_prior_node', False)
    v_onehot = np.eye(num_classes)[ligand_v]
    lig_feat = np.concatenate([v_onehot, ligand_v_aux], -1)
    h_protein = _linear(sd, 'protein_atom_emb',
                        np.asarray(protein_v, np.float64))
    h_ligand = _linear(sd, 'ligand_atom_emb', lig_feat)
    if cfg.get('node_indicator', True):
        h_protein = np.concatenate(
            [h_protein, np.zeros((len(h_protein), 1))], -1)
        h_ligand = np.concatenate([h_ligand, np.ones((len(h_ligand), 1))], -1)
    h_all, pos_all, batch_all, mask_ligand, l_index_in_ctx = compose_context(
        h_protein, h_ligand, np.asarray(protein_pos, np.float64),
        np.asarray(ligand_pos, np.float64), batch_protein, batch_ligand)

    outputs = uni_transformer_o2(sd, cfg, h_all, pos_all, mask_ligand,
                                 mask_ligand.astype(np.float64), batch_all)

    final_pos, final_h = outputs['x'], outputs['h']
    final_ligand_pos = final_pos[mask_ligand]
    final_ligand_h = final_h[mask_ligand]
    y = _linear(sd, 'v_inference.0', final_ligand_h)
    final_ligand_v = _linear(sd, 'v_inference.2', shifted_softplus(y))
    preds = {'pred_ligand_pos': final_ligand_pos,
             'pred_ligand_v': final_ligand_v}
    if cfg.get('bond_diffusion', False):
        assert cfg.get('bond_net_type') == 'pre_att', \
            "uni_o2 has no bond stream; only 'pre_att' applies"
        src, dst = l_index_in_ctx[ligand_fc_bond_index]
        dist = np.sqrt(((final_pos[dst] - final_pos[src]) ** 2).sum(-1))
        r_feat = linspace_rbf(dist, 0.0, 5.0, cfg.get('num_r_gaussian', 20))
        hi, hj = final_h[dst], final_h[src]
        bond_inf_input = np.concatenate([r_feat, (hi + hj) / 2], -1)
        y = _linear(sd, 'bond_inference.0', bond_inf_input)
        preds['pred_bond'] = _linear(sd, 'bond_inference.2',
                                     shifted_softplus(y))
    return preds


# ---------------------------------------------------------------------------
# one reverse sampling step with injected noise (ref decompdiff.py:601-636,
# 679-684)
# ---------------------------------------------------------------------------

def reverse_step(cfg, num_classes, num_bond_classes, preds,
                 ligand_pos, ligand_v, ligand_bond,
                 atom_prior_stds, t, batch_ligand, batch_ligand_bond,
                 pos_eps, v_uniform, b_uniform):
    """One ancestral update given the network predictions and FIXED draws:
    pos_eps ~ N(0,1) [Nl,3]; v_uniform/b_uniform ~ U(0,1) (the reference's
    explicit Gumbel construction, ref transitions.py:78-84). Positions are
    centered coords. Returns (pos_next, v_next, bond_next)."""
    pos_sched = PosSchedule(cfg)
    atom_trans = DiscreteTransition(cfg['num_diffusion_timesteps'],
                                    cfg.get('v_beta_s', 0.01), num_classes)
    bond_trans = DiscreteTransition(cfg['num_diffusion_timesteps'],
                                    cfg.get('v_beta_s', 0.01),
                                    num_bond_classes)
    assert cfg.get('model_mean_type', 'C0') == 'C0'
    pos0 = np.asarray(preds['pred_ligand_pos'], np.float64)
    xt = np.asarray(ligand_pos, np.float64)

    c0 = pos_sched.posterior_mean_c0_coef[t][batch_ligand][:, None]
    ct = pos_sched.posterior_mean_ct_coef[t][batch_ligand][:, None]
    pos_model_mean = c0 * pos0 + ct * xt
    logvar = pos_sched.posterior_logvar[t][batch_ligand][:, None]
    nonzero = (1.0 - (t == 0).astype(np.float64))[batch_ligand][:, None]
    pos_next = (pos_model_mean
                + nonzero * np.exp(0.5 * logvar) * pos_eps
                * np.asarray(atom_prior_stds, np.float64))

    def gumbel_sample(log_prob, uniform):
        g = -np.log(-np.log(uniform + 1e-30) + 1e-30)
        return np.argmax(g + log_prob, axis=-1)

    log_v_recon = log_softmax(np.asarray(preds['pred_ligand_v'], np.float64))
    log_vt = index_to_log_onehot(ligand_v, num_classes)
    log_v_model = atom_trans.q_v_posterior(log_v_recon, log_vt, t,
                                           batch_ligand)
    v_next = gumbel_sample(log_v_model, v_uniform)

    bond_next = ligand_bond
    if cfg.get('bond_diffusion', False):
        log_b_recon = log_softmax(np.asarray(preds['pred_bond'], np.float64))
        log_bt = index_to_log_onehot(ligand_bond, num_bond_classes)
        log_b_model = bond_trans.q_v_posterior(log_b_recon, log_bt, t,
                                               batch_ligand_bond)
        bond_next = gumbel_sample(log_b_model, b_uniform)
    return pos_next, v_next, bond_next


# ---------------------------------------------------------------------------
# state-dict builders for the extended topologies
# ---------------------------------------------------------------------------

def make_reference_state_dict_o2(rng, cfg, num_classes, num_bond_classes,
                                 protein_feat_dim, ligand_feat_dim):
    """Reference-layout state dict for model_type='uni_o2'
    (ref uni_transformer.py module tree; the dead init_h_emb_layer params
    are not reproduced)."""
    H = cfg['hidden_dim']
    heads = cfg['n_heads']
    fe = cfg.get('edge_feat_dim', 4)
    rfe = 4 * 20                     # outer(edge_type, fixed 20-RBF)
    ew_t = cfg.get('ew_net_type', 'r')
    x2h_out_fc = cfg.get('x2h_out_fc', True)
    emb = H - 1 if cfg.get('node_indicator', True) else H
    sd = {}

    def lin(prefix, i, o):
        sd[f'{prefix}.weight'] = rng.normal(size=(o, i)) * (1.0 / np.sqrt(i))
        sd[f'{prefix}.bias'] = rng.normal(size=(o,)) * 0.05

    def mlp(prefix, i, o):
        lin(f'{prefix}.net.0', i, H)
        sd[f'{prefix}.net.1.weight'] = 1.0 + rng.normal(size=(H,)) * 0.05
        sd[f'{prefix}.net.1.bias'] = rng.normal(size=(H,)) * 0.05
        lin(f'{prefix}.net.3', H, o)

    lin('protein_atom_emb', protein_feat_dim, emb)
    lin('ligand_atom_emb', ligand_feat_dim, emb)
    lin('v_inference.0', H, H)
    lin('v_inference.2', H, num_classes)
    if cfg.get('bond_diffusion', False):
        lin('bond_inference.0', cfg.get('num_r_gaussian', 20) + H, H)
        lin('bond_inference.2', H, num_bond_classes)
    if ew_t == 'global':
        mlp('refine_net.edge_pred_layer', 20, 1)
    kv = fe + rfe + 2 * H
    for l in range(cfg['num_layers']):
        base = f'refine_net.base_block.{l}'
        for i in range(cfg.get('num_x2h', 1)):
            p = f'{base}.x2h_layers.{i}'
            mlp(f'{p}.hk_func', kv, H)
            mlp(f'{p}.hv_func', kv, H)
            mlp(f'{p}.hq_func', H, H)
            if x2h_out_fc:
                mlp(f'{p}.node_output', 2 * H, H)
            if ew_t == 'r':
                lin(f'{p}.ew_net.0', rfe, 1)
            elif ew_t == 'm':
                lin(f'{p}.ew_net.0', H, 1)
        for i in range(cfg.get('num_h2x', 1)):
            p = f'{base}.h2x_layers.{i}'
            mlp(f'{p}.xk_func', kv, H)
            mlp(f'{p}.xv_func', kv, heads)
            mlp(f'{p}.xq_func', H, H)
            if ew_t == 'r':
                lin(f'{p}.ew_net.0', rfe, 1)
    return sd


def extend_state_dict_prior(sd, rng, cfg):
    """Add the prior-node params (ref decompdiff.py:162-163) and re-shape the
    embeddings for the 3-way indicator (emb = hidden - 3)."""
    H = cfg['hidden_dim']
    emb = H - 3 if cfg.get('node_indicator', True) else H
    for key in ('protein_atom_emb', 'ligand_atom_emb'):
        in_dim = sd[f'{key}.weight'].shape[1]
        sd[f'{key}.weight'] = rng.normal(size=(emb, in_dim)) / np.sqrt(in_dim)
        sd[f'{key}.bias'] = rng.normal(size=(emb,)) * 0.05
    sd['prior_atom_emb.weight'] = rng.normal(size=(emb, 20)) / np.sqrt(20)
    sd['prior_atom_emb.bias'] = rng.normal(size=(emb,)) * 0.05
    return sd
