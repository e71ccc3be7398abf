"""Training-step benchmark: dense XLA path vs fused Pallas kernels (TPU).

Times value_and_grad of the full diffusion loss (bench-sized batch: B=8,
Np=320, Nl=32, full-size model) through a serial lax.scan with a data
dependency — python-loop timing over the axon tunnel under-reports wildly
(CLAUDE.md). The Pallas path runs the custom-VJP backward kernels
(ops/pallas/{edge,bond,triplet}_kernel.py), which rematerialize every cubic
intermediate in VMEM instead of writing the O(Nl^3 H) tensors to HBM for
the backward pass.

Usage: python benchmarks/bench_train_step.py [--steps N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/decompdiff_tpu_jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

BATCH, NUM_PROTEIN, NUM_LIGAND = 8, 320, 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.utils.testing import (DEFAULT_MODEL_CONFIG,
                                              random_complex_batch)

    rng = np.random.default_rng(0)
    batch = random_complex_batch(rng, batch_size=BATCH,
                                 num_protein=NUM_PROTEIN,
                                 num_ligand=NUM_LIGAND, num_groups=6)

    def build(use_pallas):
        cfg = dict(DEFAULT_MODEL_CONFIG)
        cfg['use_pallas'] = use_pallas
        return DecompDiffModel.create(cfg, num_classes=8)

    model_d = build(False)
    model_p = build(True)
    params = model_d.init_params(jax.random.PRNGKey(0), batch)

    def timed(model):
        def f(params, key):
            out = model.get_diffusion_loss(params, key, batch)
            ls = out['losses']
            return ls['pos'] + 100.0 * ls['v'] + 100.0 * ls.get('bond', 0.0)

        lg = jax.value_and_grad(f)

        @jax.jit
        def many(params, key):
            def body(c, _):
                p, k = c
                k, sub = jax.random.split(k)
                _, g = lg(p, sub)
                p = jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)
                return (p, k), ()

            (p, _), _ = jax.lax.scan(body, (params, key), None,
                                     length=args.steps)
            return p

        key = jax.random.PRNGKey(7)
        jax.block_until_ready(many(params, key))  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(many(params, key))
        return (time.perf_counter() - t0) * 1000 / args.steps

    ms_d = timed(model_d)
    ms_p = timed(model_p)
    print(json.dumps({
        'metric': 'train_step_ms_b8',
        'dense_ms': round(ms_d, 2),
        'pallas_ms': round(ms_p, 2),
        'speedup': round(ms_d / ms_p, 2),
    }))


if __name__ == '__main__':
    main()
