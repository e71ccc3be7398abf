"""Device-trace profiler for the Pallas training step (bench shapes).

Captures a jax.profiler trace of a serial 10-step value_and_grad scan on the
current backend (works over the axon TPU tunnel — CLAUDE.md) and prints the
per-step device-time breakdown grouped by kernel/op name. This is the
committed form of the harness behind the recorded train-step numbers
(195.9 dense -> 91.0 r2 -> 49.3 -> 39.2 ms r3).

Usage: python benchmarks/profile_train_step.py [--trace-dir DIR] [--steps N]
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

BATCH, NUM_PROTEIN, NUM_LIGAND = 8, 320, 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--trace-dir', default='/tmp/ddtpu_trace_train')
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--top', type=int, default=20)
    args = ap.parse_args()

    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
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

    def loss_fn(params, key):
        out = model.get_diffusion_loss(params, key, batch)
        ls = out['losses']
        return ls['pos'] + 100.0 * ls['v'] + 100.0 * ls.get('bond', 0.0)

    @partial(jax.jit, static_argnames='n')
    def steps(params, key, n):
        def body(carry, _):
            acc, key = carry
            key, sub = jax.random.split(key)
            l, g = jax.value_and_grad(loss_fn)(params, sub)
            # data dependency keeps the scan serial (tunnel-safe timing)
            acc = acc + l + sum(jnp.sum(x) * 0.0
                                for x in jax.tree.leaves(g))
            return (acc, key), None

        (acc, _), _ = jax.lax.scan(body, (0.0, key), None, length=n)
        return acc

    n = args.steps
    jax.block_until_ready(steps(params, jax.random.PRNGKey(1), n))
    t0 = time.perf_counter()
    jax.block_until_ready(steps(params, jax.random.PRNGKey(2), n))
    dt = time.perf_counter() - t0
    print(f'{n}-step scan: {dt * 1000:.1f} ms total, '
          f'{dt * 1000 / n:.2f} ms/step')

    jax.profiler.start_trace(args.trace_dir)
    jax.block_until_ready(steps(params, jax.random.PRNGKey(3), n))
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
    for e in data.get('traceEvents', []):
        if e.get('ph') != 'X' or e.get('name', '').startswith('$'):
            continue
        group = re.sub(r'\.\d+$', '', e['name'])
        ev[group] += e.get('dur', 0)
        cnt[group] += 1
    print(f'--- device time per step (top {args.top}) ---')
    for k, v in ev.most_common(args.top):
        print(f'{v / 1e3 / n:8.3f} ms  x{cnt[k] // n:<5} {k[:90]}')


if __name__ == '__main__':
    main()
