"""Training driver (L6).

Usage:
    python scripts/train.py configs/training.yml [--outdir logs]
        [--resume CKPT] [--max_iters N]

Protocol parity with ref scripts/train_diffusion_decomp.py: transform stack
from config, infinite bucketed loader, Adam + plateau-on-val, input jitter,
grad clip, validation at 10 fixed timesteps with unit prior stds + AUROC,
best-checkpoint saving — plus real resume (absent in the reference).
"""

import argparse
import threading
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/decompdiff_tpu_jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('--outdir', default='./logs')
    parser.add_argument('--resume', default=None)
    parser.add_argument('--max_iters', type=int, default=None)
    parser.add_argument('--val_freq', type=int, default=None)
    parser.add_argument('--report_freq', type=int, default=200)
    parser.add_argument('--tag', default='',
                        help='suffix appended to the auto-named run dir '
                             '(ref train_diffusion_decomp.py:67)')
    parser.add_argument('--profile_steps', type=int, default=0,
                        help='capture a device trace over N steps (from step 10)')
    args = parser.parse_args()

    from decompdiff_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from decompdiff_tpu.config import load_config, save_config
    from decompdiff_tpu.constants import atom_class_count
    from decompdiff_tpu.data.dataset import DecompDataset
    from decompdiff_tpu.data.store import DDStore
    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.parallel.mesh import make_mesh, shard_batch
    from decompdiff_tpu.training.loader import BucketedLoader
    from decompdiff_tpu.training.metrics import get_auroc, get_bond_auroc
    from decompdiff_tpu.training.train_step import (
        PlateauScheduler, create_train_state, get_learning_rate,
        make_eval_step, make_train_fns, set_learning_rate)
    from decompdiff_tpu.utils.checkpoint import (
        load_checkpoint, restore_train_state, save_checkpoint)
    from decompdiff_tpu.utils.metrics_logger import (MetricsLogger,
                                                      ValidationLossTape)
    from decompdiff_tpu.utils.misc import (
        count_parameters, get_logger, get_new_log_dir, seed_all,
        snapshot_source)

    config = load_config(args.config)
    seed_all(config.train.seed)
    log_dir = get_new_log_dir(args.outdir, prefix='train', tag=args.tag)
    ckpt_dir = os.path.join(log_dir, 'checkpoints')
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = get_logger('train', log_dir)
    save_config(config, os.path.join(log_dir, 'config.yml'))
    snapshot_source(log_dir)  # ref train_diffusion_decomp.py:86-87
    metrics_logger = MetricsLogger(log_dir)

    # --- data ---
    store = DDStore(config.data.path)
    dataset = DecompDataset(
        store,
        prior_mode=config.data.get('prior_mode', 'ref_prior'),
        ligand_atom_mode=config.data.transform.get('ligand_atom_mode', 'basic'),
        ligand_bond_mode=config.data.transform.get('ligand_bond_mode', 'fc'),
        add_ord_feat=config.data.transform.get('add_ord_feat', False),
        max_num_arms=config.data.transform.get('max_num_arms', 10),
        random_rot=config.data.transform.get('random_rot', False))
    split_path = config.data.get('split')
    if split_path and os.path.exists(split_path):
        import pickle
        with open(split_path, 'rb') as f:
            split_names = pickle.load(f)
        split = dataset.split_by_names(split_names)
    else:
        ids = list(range(len(dataset)))
        n_test = max(1, len(ids) // 10)
        split = {'train': ids[:-n_test], 'test': ids[-n_test:]}
    logger.info(f'train: {len(split["train"])}, test: {len(split["test"])}')

    batch_size = config.train.batch_size
    num_workers = int(config.train.get('num_workers', 4))  # ref training.yml:67
    # peek the resume checkpoint before building the loader: a resumed run
    # must not REPLAY the epoch-0 shuffle order (exact in-epoch position is
    # not checkpointed — infinite shuffled stream — but reseeding by the
    # resume iteration gives a fresh, non-repeating order)
    resume_ckpt = None
    start_iter = 1
    if args.resume:
        resume_ckpt = load_checkpoint(args.resume)
        start_iter = resume_ckpt['iteration'] + 1
    train_loader = BucketedLoader(dataset, split['train'], batch_size,
                                  shuffle=True,
                                  seed=config.train.seed + start_iter - 1,
                                  num_threads=num_workers)
    train_iter = iter(train_loader)

    # --- model ---
    num_classes = atom_class_count(
        config.data.transform.get('ligand_atom_mode', 'basic'))
    model = DecompDiffModel.create(config.model.to_dict(), num_classes)

    example = next(train_iter)
    state, tx = create_train_state(model, jax.random.PRNGKey(config.train.seed),
                                   example, config.train)
    logger.info(f'# parameters: {count_parameters(state.params) / 1e6:.4f} M')

    scheduler = PlateauScheduler(
        factor=config.train.scheduler.get('factor', 0.6),
        patience=config.train.scheduler.get('patience', 10),
        min_lr=config.train.scheduler.get('min_lr', 1e-6),
        threshold=config.train.scheduler.get('threshold', 1e-4))
    resumed_rng = None
    best_loss, best_iter = None, None
    if resume_ckpt is not None:
        state = restore_train_state(resume_ckpt, state)
        scheduler.load_state_dict(resume_ckpt['scheduler'])
        extra = resume_ckpt.get('extra', {})
        # continue the training rng stream and the best-checkpoint tracking
        # where they stopped — otherwise a resumed run replays iteration-1
        # randomness and unconditionally crowns its first validation "best"
        if extra.get('rng') is not None:
            resumed_rng = jnp.asarray(np.asarray(extra['rng']))
        best_loss = extra.get('best_loss')
        best_iter = extra.get('best_iter')
        logger.info(f'resumed from {args.resume} at iteration {start_iter}'
                    + (f' (best val {best_loss:.6f} @ {best_iter})'
                       if best_loss is not None else ''))

    # dp mesh (all visible devices); requires the batch to divide evenly
    n_dev = jax.device_count()
    mesh = None
    if n_dev > 1 and batch_size % n_dev == 0:
        mesh = make_mesh()
        logger.info(f'data-parallel over {n_dev} devices')
    elif n_dev > 1:
        logger.info(f'{n_dev} devices but batch_size {batch_size} not '
                    'divisible — running unsharded')

    # sample_time_method lives in the model section (ref configs/training.yml)
    train_cfg_full = dict(config.train.to_dict())
    train_cfg_full.setdefault(
        'sample_time_method',
        config.model.get('sample_time_method', 'symmetric'))
    train_step, grad_step, apply_grads = make_train_fns(
        model, tx, train_cfg_full)
    n_acc = int(config.train.get('n_acc_batch', 1))
    eval_step = make_eval_step(model, config.train)
    if resumed_rng is not None:
        rng = resumed_rng
    elif start_iter > 1:
        # old checkpoint without a saved rng: at least don't replay the
        # iteration-1 stream
        rng = jax.random.fold_in(jax.random.PRNGKey(config.train.seed),
                                 start_iter)
    else:
        rng = jax.random.PRNGKey(config.train.seed)

    # Validation wall-time fixes (a fresh loader per call used to
    # re-featurize the whole split and a host sync ran per (batch, t),
    # dominating training wall time):
    #  * small splits are featurized/collated ONCE and cached; big splits
    #    (real CrossDocked scale) stream through a pooled loader instead of
    #    pinning GBs of host RAM for the run's lifetime
    #  * host syncs trail the eval dispatches by a bounded window so they
    #    pipeline over the tunnel with O(window) live device buffers
    VAL_CACHE_MAX_RECORDS = 2048
    val_batches = []
    cache_val = len(split['test']) <= VAL_CACHE_MAX_RECORDS

    def _val_batch_stream():
        if cache_val and val_batches:
            return iter(val_batches)
        val_loader = BucketedLoader(dataset, split['test'], batch_size,
                                    shuffle=False, infinite=False,
                                    num_threads=num_workers)

        def gen():
            # finally (not a trailing close()) so an exception mid-validate
            # — or the generator being abandoned — still stops the producer
            # thread and releases the featurize pool
            try:
                for b in val_loader:
                    if cache_val:
                        val_batches.append(b)
                    yield b
            finally:
                val_loader.close()
        return gen()

    def validate(it):
        tape = ValidationLossTape()     # ref utils/train.py:97-124
        all_pred_v, all_true_v = [], []
        all_pred_b, all_true_b = [], []
        window = []

        def drain_one():
            batch, (metrics, v_recon, b_recon) = window.pop(0)
            tape.update(metrics, weight=1)
            lm = np.asarray(batch.ligand_mask)
            all_pred_v.append(np.asarray(v_recon)[lm])
            all_true_v.append(np.asarray(batch.ligand_v)[lm])
            if b_recon is not None:
                bm = np.asarray(batch.bond_mask)
                all_pred_b.append(np.asarray(b_recon)[bm])
                all_true_b.append(np.asarray(batch.bond_type)[bm])

        vkey = jax.random.PRNGKey(it)
        for bi, batch in enumerate(_val_batch_stream()):
            for t in np.linspace(0, model.num_timesteps - 1, 10).astype(int):
                # fresh noise per (batch, t) — a shared key would correlate
                # all 10 grid losses (the reference draws from the global
                # torch rng per call, ref train_diffusion_decomp.py:223-250)
                k = jax.random.fold_in(jax.random.fold_in(vkey, bi), int(t))
                window.append((batch, eval_step(
                    state.params, batch, int(t), k)))
                if len(window) > 16:
                    drain_one()
        while window:
            drain_one()
        losses = tape.averages()
        atom_auroc = get_auroc(np.concatenate(all_true_v),
                               np.concatenate(all_pred_v))
        bond_auroc = (get_bond_auroc(np.concatenate(all_true_b),
                                     np.concatenate(all_pred_b))
                      if all_pred_b else 0.0)
        logger.info(f'[val {it}] ' + ' '.join(
            f'{k}={v:.4f}' for k, v in losses.items())
            + f' atom_auroc={atom_auroc:.4f} bond_auroc={bond_auroc:.4f}')
        metrics_logger.log(it, 'val', {**losses, 'atom_auroc': atom_auroc,
                                       'bond_auroc': bond_auroc})
        return losses['loss']

    max_iters = args.max_iters or config.train.max_iters
    val_freq = args.val_freq or config.train.val_freq

    # async checkpointing: device->host transfer + pickle of the full state
    # runs on a worker thread so training keeps dispatching (the state
    # pytree stays valid — train_step does NOT donate its buffers, a
    # load-bearing invariant documented in training/train_step.py; jax
    # arrays are immutable). Over the tunneled chip a save costs ~60 s of
    # wall otherwise. One save in flight at a time; joined before the next
    # save and at exit, and a failed save re-raises at the join so a run
    # cannot finish "successfully" pointing at a checkpoint that was never
    # written.
    ckpt_thread = None
    ckpt_error: list = []

    def _save_worker(path, state_snapshot, sched_state, it, extra):
        try:
            save_checkpoint(path, config.to_dict(), state_snapshot,
                            sched_state, it, extra=extra)
        except BaseException as e:
            ckpt_error.append(e)

    def join_ckpt():
        nonlocal ckpt_thread
        if ckpt_thread is not None:
            ckpt_thread.join()
            ckpt_thread = None
        if ckpt_error:
            raise RuntimeError(
                'async checkpoint save failed') from ckpt_error[0]

    def save_async(path, state_snapshot, sched_state, it, extra=None):
        nonlocal ckpt_thread
        join_ckpt()
        ckpt_thread = threading.Thread(
            target=_save_worker,
            args=(path, state_snapshot, sched_state, it, extra),
            daemon=False)
        ckpt_thread.start()

    # profiling window is anchored to the warmup boundary of THIS run, not
    # absolute iteration 10 — a resumed run (start_iter > 10) would otherwise
    # never start the trace yet still hit the stop condition, and
    # jax.profiler.stop_trace() raises when no trace is active
    profile_start = max(10, start_iter + 1)
    trace_running = False
    try:
        for it in range(start_iter, max_iters + 1):
            if args.profile_steps and it == profile_start:
                jax.profiler.start_trace(os.path.join(log_dir, 'profile'))
                trace_running = True
            # NOTE on the OOM catch: with static bucket shapes, a TPU HBM
            # OOM surfaces SYNCHRONOUSLY at the first compile of a bucket
            # shape (jit dispatch raises), which this try does catch; a
            # genuinely async runtime OOM would surface at a later host
            # sync instead (ref train_diffusion_decomp.py:202-210 catches
            # torch's synchronous allocator error — same effective scope)
            try:
                if n_acc <= 1:
                    batch = next(train_iter)
                    if mesh:
                        batch = shard_batch(batch, mesh)
                    rng, sub = jax.random.split(rng)
                    state, metrics = train_step(state, batch, sub)
                else:
                    # gradient accumulation over n_acc micro-batches: sum
                    # grads, ONE clip + optimizer step on the mean (ref
                    # :159-196); metrics report the last micro's losses
                    # like the reference's loss_dict
                    grads_sum, t_parts, pg_parts = None, [], []
                    for _ in range(n_acc):
                        batch = next(train_iter)
                        if mesh:
                            batch = shard_batch(batch, mesh)
                        rng, sub = jax.random.split(rng)
                        g, metrics, t_u, pg = grad_step(state, batch, sub)
                        grads_sum = g if grads_sum is None else jax.tree.map(
                            jnp.add, grads_sum, g)
                        t_parts.append(t_u)
                        pg_parts.append(pg)
                    state, grad_norm = apply_grads(
                        state, grads_sum, jnp.concatenate(t_parts),
                        jnp.concatenate(pg_parts))
                    metrics['grad_norm'] = grad_norm
            except Exception as e:  # OOM catch-and-skip parity
                if 'RESOURCE_EXHAUSTED' in str(e) or 'out of memory' in str(e).lower():
                    logger.warning('| WARNING: ran out of memory, skipping batch')
                    continue
                raise
            if trace_running and it == profile_start + args.profile_steps:
                jax.block_until_ready(metrics['loss'])
                jax.profiler.stop_trace()
                trace_running = False
                logger.info(f'device trace written to {log_dir}/profile')
            if it % args.report_freq == 0 or it == 1:
                logger.info(f'[train {it}] ' + ' '.join(
                    f'{k}={float(v):.4f}' for k, v in metrics.items())
                    + f' lr={get_learning_rate(state.opt_state):.2e}')
                metrics_logger.log(
                    it, 'train',
                    {**{k: float(v) for k, v in metrics.items()},
                     'lr': get_learning_rate(state.opt_state)})
            if it % val_freq == 0 or it == max_iters:
                if train_loader.skip_counts:
                    logger.warning(
                        'loader skipped samples so far: '
                        f'{dict(train_loader.skip_counts)}')
                val_loss = validate(it)
                lr = get_learning_rate(state.opt_state)
                new_lr = scheduler.step(val_loss, lr)
                if new_lr != lr:
                    state = state.replace(
                        opt_state=set_learning_rate(state.opt_state, new_lr))
                    logger.info(f'lr reduced to {new_lr:.2e}')
                if best_loss is None or val_loss < best_loss:
                    best_loss, best_iter = val_loss, it
                    path = os.path.join(ckpt_dir, f'{it}.ckpt')
                    save_async(path, state, scheduler.state_dict(), it,
                               extra={'best_loss': best_loss,
                                      'best_iter': best_iter,
                                      'rng': np.asarray(rng)})
                    logger.info(f'[val] best val loss {val_loss:.6f}, '
                                f'saving {path} (async)')
                else:
                    logger.info(f'[val] not improved; best {best_loss:.6f} '
                                f'at iter {best_iter}')
    except KeyboardInterrupt:
        logger.info('Terminating...')
    finally:
        if trace_running:
            # profile window extended past the end of the run (or an error
            # aborted it): flush what was captured instead of dropping it
            try:
                jax.profiler.stop_trace()
            except Exception:
                logger.exception('failed to stop the profiler trace')
        train_loader.close()
        if sys.exc_info()[1] is not None:
            # an exception is already propagating: a failed async save must
            # not replace it as the terminal error — log and let the real
            # failure surface
            try:
                join_ckpt()
            except Exception:
                logger.exception(
                    'async checkpoint save also failed during shutdown')
        else:
            join_ckpt()


if __name__ == '__main__':
    main()
