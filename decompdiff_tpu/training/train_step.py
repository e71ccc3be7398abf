"""Data-parallel training step.

Protocol parity with ref scripts/train_diffusion_decomp.py:155-210 and
utils/train.py:34-56:
  * protein position jitter (pos_noise_std) and prior-center jitter
    (prior_noise_std) per step (ref :160-164)
  * Adam(b1=0.95, b2=0.999, wd=0), lr 5e-4 (ref configs/training.yml:75-80)
  * global-norm gradient clipping at 8.0 (ref :195)
  * weighted loss sum pos*1 + v*100 + bond*100 (ref utils/train.py:58-70)
  * plateau LR scheduler on validation loss (factor 0.6, patience 10,
    min_lr 1e-6; ref utils/train.py:46-56)

The step is one jit WITHOUT buffer donation — this is load-bearing: the
async checkpoint saver (scripts/train.py) snapshots `state` on a background
thread and relies on the old buffers staying valid; adding donate_argnums
here would hand it deleted buffers mid-save. The batch is sharded over the
mesh's 'dp' axis and XLA derives the gradient all-reduce from the shardings
(no hand-written collectives).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from decompdiff_tpu.data.batch import ComplexBatch
from decompdiff_tpu.models.diffusion_model import DecompDiffModel


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState
    # importance-time-sampling buffers (ref models/decompdiff.py:146-147
    # Lt_history/Lt_count — registered but never updated in the reference;
    # here the train step maintains them so 'importance' mode actually works)
    lt_history: Optional[jnp.ndarray] = None   # [T] running E[L_t]
    lt_count: Optional[jnp.ndarray] = None     # [T]


def make_optimizer(optimizer_cfg, max_grad_norm: float = 8.0):
    """ref utils/train.py:34-43: torch.optim.Adam(lr, weight_decay, betas),
    NotImplementedError on any other type. torch's Adam weight_decay is L2
    ADDED TO THE GRADIENT before the moment updates (not decoupled AdamW),
    so it maps to add_decayed_weights placed before adam; clipping stays
    first — the reference clips raw grads before optimizer.step."""
    opt_type = optimizer_cfg.get('type', 'adam')
    if opt_type != 'adam':
        raise NotImplementedError(f'Optimizer not supported: {opt_type}')
    wd = float(optimizer_cfg.get('weight_decay', 0.0))
    parts = [optax.clip_by_global_norm(max_grad_norm)]
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(optax.inject_hyperparams(optax.adam)(
        learning_rate=optimizer_cfg.get('lr', 5e-4),
        b1=optimizer_cfg.get('beta1', 0.95),
        b2=optimizer_cfg.get('beta2', 0.999),
    ))
    return optax.chain(*parts)


def _adam_index(opt_state) -> int:
    """The adam element's position in the chain state shifts when
    weight_decay inserts add_decayed_weights — locate it by hyperparams."""
    for i, s in enumerate(opt_state):
        if hasattr(s, 'hyperparams'):
            return i
    raise ValueError('no inject_hyperparams state found in opt_state')


def get_learning_rate(opt_state) -> float:
    return float(
        opt_state[_adam_index(opt_state)].hyperparams['learning_rate'])


def set_learning_rate(opt_state, lr: float):
    i = _adam_index(opt_state)
    inner = opt_state[i]
    hyper = dict(inner.hyperparams)
    hyper['learning_rate'] = jnp.asarray(lr, jnp.float32)
    return tuple(inner._replace(hyperparams=hyper) if j == i else s
                 for j, s in enumerate(opt_state))


def create_train_state(model: DecompDiffModel, rng, example_batch: ComplexBatch,
                       train_cfg) -> tuple[TrainState, optax.GradientTransformation]:
    params = model.init_params(rng, example_batch)
    tx = make_optimizer(train_cfg.get('optimizer', {}),
                        train_cfg.get('max_grad_norm', 8.0))
    opt_state = tx.init(params)
    T = model.num_timesteps
    return TrainState(step=jnp.asarray(0), params=params,
                      opt_state=opt_state,
                      lt_history=jnp.zeros((T,)),
                      lt_count=jnp.zeros((T,))), tx


def weighted_loss(losses: dict, weights: dict) -> jnp.ndarray:
    """ref utils/train.py:58-70."""
    total = 0.0
    for k, v in losses.items():
        total = total + float(weights.get(k, 1.0)) * v
    return total


def make_train_fns(model: DecompDiffModel, tx, train_cfg):
    """Build (train_step, grad_step, apply_grads).

    `train_step` is the fused single-batch step. `grad_step` + `apply_grads`
    support gradient accumulation over n_acc_batch micro-batches (ref
    scripts/train_diffusion_decomp.py:159-196: per-micro loss / n_acc and
    backward, ONE clip + optimizer step on the accumulated grads — here the
    driver sums grad_step outputs and apply_grads divides by n_acc, which is
    the same mean). Micro-batches may come from different size buckets, so
    accumulation runs as a host loop of jitted grad_steps rather than a
    stacked scan."""
    loss_weights = dict(train_cfg.get('loss_weights',
                                      {'pos': 1.0, 'v': 100.0, 'bond': 100.0}))
    pos_noise_std = float(train_cfg.get('pos_noise_std', 0.1))
    prior_noise_std = float(train_cfg.get('prior_noise_std', 0.5))
    n_acc = int(train_cfg.get('n_acc_batch', 1))

    method = train_cfg.get('sample_time_method', 'symmetric')

    def loss_fn(params, rng, batch, time_step):
        out = model.get_diffusion_loss(params, rng, batch,
                                       time_step=time_step)
        loss = weighted_loss(out['losses'], loss_weights)
        metrics = {f'loss_{k}': v for k, v in out['losses'].items()}
        metrics['loss'] = loss
        return loss, (metrics, out['time_step'], out['per_graph_pos_loss'])

    def _jitter_grads(state: TrainState, batch: ComplexBatch, rng):
        rng_prot, rng_prior, rng_t, rng_t2, rng_loss = jax.random.split(rng, 5)
        # input jitter (ref scripts/train_diffusion_decomp.py:160-164)
        batch = batch.replace(
            protein_pos=batch.protein_pos + pos_noise_std * jax.random.normal(
                rng_prot, batch.protein_pos.shape),
            prior_centers=batch.prior_centers
            + prior_noise_std * jax.random.normal(
                rng_prior, batch.prior_centers.shape),
        )

        time_step = None
        T = model.num_timesteps
        if method == 'importance' and state.lt_history is not None:
            # importance-weighted t (ref models/decompdiff.py:374-385):
            # p(t) ~ sqrt(E[L_t^2]) once every t has >10 visits; before
            # that, the reference falls back to SYMMETRIC antithetic
            # sampling (ref :377,387-393), not uniform — jit-safe via a
            # per-element select between the two draws. lt_history holds a
            # rolling EMA of the squared per-graph pos loss (improved-DDPM
            # scheme), so the weighting tracks the CURRENT loss landscape
            # instead of an infinite-horizon average dominated by stale
            # early-training values.
            lt_sqrt = jnp.sqrt(state.lt_history + 1e-10) + 1e-4
            lt_sqrt = lt_sqrt.at[0].set(lt_sqrt[1])
            p_imp = lt_sqrt / lt_sqrt.sum()
            ready = (state.lt_count > 10).all()
            t_imp = jax.random.choice(rng_t, T, (batch.batch_size,), p=p_imp)
            half = jax.random.randint(rng_t2, (batch.batch_size // 2 + 1,),
                                      0, T)
            t_sym = jnp.concatenate([half, T - half - 1])[:batch.batch_size]
            time_step = jnp.where(ready, t_imp, t_sym)

        (_, (metrics, t_used, per_graph)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, rng_loss, batch, time_step)
        return grads, metrics, t_used, per_graph

    def _lt_update(lt_history, lt_count, t_used, per_graph):
        if lt_history is None:
            return lt_history, lt_count
        # rolling EMA of squared per-graph pos loss per timestep
        # (improved-DDPM importance scheme; the reference registers the
        # buffers but never updates them, ref :506-507 commented out)
        T = lt_history.shape[0]
        sq = jax.lax.stop_gradient(per_graph) ** 2
        sums = jnp.zeros((T,), lt_history.dtype).at[t_used].add(sq)
        cnts = jnp.zeros((T,), lt_count.dtype).at[t_used].add(1.0)
        step_mean = sums / jnp.maximum(cnts, 1.0)
        decay = 0.9
        lt_history = jnp.where(
            cnts > 0, decay * lt_history + (1 - decay) * step_mean,
            lt_history)
        return lt_history, lt_count + cnts

    @jax.jit
    def train_step(state: TrainState, batch: ComplexBatch, rng):
        grads, metrics, t_used, per_graph = _jitter_grads(state, batch, rng)
        metrics['grad_norm'] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        lt_history, lt_count = _lt_update(state.lt_history, state.lt_count,
                                          t_used, per_graph)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, lt_history=lt_history,
                          lt_count=lt_count), metrics

    @jax.jit
    def grad_step(state: TrainState, batch: ComplexBatch, rng):
        return _jitter_grads(state, batch, rng)

    @jax.jit
    def apply_grads(state: TrainState, grads_sum, t_used, per_graph):
        """grads_sum over n_acc micro-batches -> mean, clip, update.
        t_used/per_graph are the concatenation over micros."""
        grads = jax.tree.map(lambda g: g / n_acc, grads_sum)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        lt_history, lt_count = _lt_update(state.lt_history, state.lt_count,
                                          t_used, per_graph)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, lt_history=lt_history,
                          lt_count=lt_count), grad_norm

    return train_step, grad_step, apply_grads


def make_train_step(model: DecompDiffModel, tx, train_cfg):
    return make_train_fns(model, tx, train_cfg)[0]


def make_eval_step(model: DecompDiffModel, train_cfg):
    """Validation loss at fixed timesteps with unit prior stds
    (ref scripts/train_diffusion_decomp.py:212-260: prior_stds=ones)."""
    loss_weights = dict(train_cfg.get('loss_weights',
                                      {'pos': 1.0, 'v': 100.0, 'bond': 100.0}))

    @jax.jit
    def eval_step(params, batch: ComplexBatch, time_value, rng):
        batch = batch.replace(prior_stds=jnp.ones_like(batch.prior_stds))
        t = jnp.full((batch.batch_size,), time_value, jnp.int32)
        out = model.get_diffusion_loss(params, rng, batch, time_step=t)
        metrics = {f'loss_{k}': v for k, v in out['losses'].items()}
        metrics['loss'] = weighted_loss(out['losses'], loss_weights)
        return metrics, out['ligand_v_recon'], out.get('ligand_b_recon')

    return eval_step


class PlateauScheduler:
    """Host-side reduce-on-plateau (ref utils/train.py:46-56 wiring of
    torch.optim.lr_scheduler.ReduceLROnPlateau, factor/patience/min_lr from
    config). Matches torch's default RELATIVE improvement threshold
    (threshold=1e-4, mode 'min', threshold_mode 'rel'): an improvement only
    counts when val < best * (1 - threshold) — without it, noise-level
    1e-5 dips keep resetting patience and the LR never drops on a real
    plateau."""

    def __init__(self, factor=0.6, patience=10, min_lr=1e-6,
                 threshold=1e-4):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best: Optional[float] = None
        self.num_bad = 0

    def _is_better(self, val_loss: float) -> bool:
        if self.best is None:
            return True
        return val_loss < self.best * (1.0 - self.threshold)

    def step(self, val_loss: float, current_lr: float) -> float:
        if self._is_better(val_loss):
            self.best = val_loss
            self.num_bad = 0
            return current_lr
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(current_lr * self.factor, self.min_lr)
        return current_lr

    def state_dict(self):
        return {'best': self.best, 'num_bad': self.num_bad,
                'factor': self.factor, 'patience': self.patience,
                'min_lr': self.min_lr, 'threshold': self.threshold}

    def load_state_dict(self, d):
        self.best = d['best']
        self.num_bad = d['num_bad']
        self.factor = d.get('factor', self.factor)
        self.patience = d.get('patience', self.patience)
        self.min_lr = d.get('min_lr', self.min_lr)
        self.threshold = d.get('threshold', self.threshold)
