"""A/B perf sweep harness: serial-scan sampling timings over config variants.

One-shot `bench.py` runs jitter by +-0.2 s/mol over the axon tunnel
(CLAUDE.md); perf decisions are made from this harness instead: each variant
runs `--reps` repetitions of a `--steps`-step guided sampling scan (the same
protocol as bench.py — the scan has a data dependency per step, so python-loop
dispatch overhead cannot hide), and the JSON output records per-rep seconds,
per-step milliseconds, and the extrapolated 1000-step s/mol.

Usage:
    python benchmarks/sweep.py --steps 200 --reps 3 \
        --variant name=fused use_pallas=true \
        --variant name=ib8 use_pallas=true triplet_i_block=8 \
        --variant name=dense use_pallas=false \
        --out /tmp/sweep.json

Variant entries are `key=value` pairs: `name` labels the variant; `batch`
overrides the batch size; every other key overrides DEFAULT_MODEL_CONFIG
(values parsed as YAML scalars, so `true`/`8`/`lin` all work).
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

import numpy as np
import yaml

NUM_PROTEIN = 320
NUM_LIGAND = 32
NUM_FULL_PROTEIN = 2048


def set_shapes(num_protein: int, num_ligand: int) -> None:
    """Point the sweep at a different collator-ladder bucket (the blended
    bench's 192/24 and 448/48 rungs; default is the headline 320/32)."""
    global NUM_PROTEIN, NUM_LIGAND
    NUM_PROTEIN = num_protein
    NUM_LIGAND = num_ligand


def parse_variant(tokens):
    spec = {'name': None, 'batch': 8, 'overrides': {}}
    for tok in tokens:
        k, _, v = tok.partition('=')
        v = yaml.safe_load(v)
        if k == 'name':
            spec['name'] = v
        elif k == 'batch':
            spec['batch'] = int(v)
        else:
            spec['overrides'][k] = v
    if spec['name'] is None:
        spec['name'] = ','.join(f'{k}={v}'
                                for k, v in spec['overrides'].items()) or 'base'
    return spec


def time_variant(spec, steps, reps):
    import jax
    import jax.numpy as jnp

    from decompdiff_tpu.data.batch import FullProtein
    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.sampling.sampler import SampleConfig, sample_diffusion
    from decompdiff_tpu.utils.testing import (
        DEFAULT_MODEL_CONFIG, random_complex_batch)

    cfg = dict(DEFAULT_MODEL_CONFIG)
    cfg.update(spec['overrides'])
    model = DecompDiffModel.create(cfg, num_classes=8)

    B = spec['batch']
    rng = np.random.default_rng(0)
    batch = random_complex_batch(rng, batch_size=B, num_protein=NUM_PROTEIN,
                                 num_ligand=NUM_LIGAND, num_groups=6)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    full_protein = FullProtein(
        pos=jnp.asarray(rng.normal(size=(B, NUM_FULL_PROTEIN, 3)) * 8,
                        jnp.float32),
        mask=jnp.ones((B, NUM_FULL_PROTEIN), bool))
    sample_cfg = SampleConfig(
        num_steps=steps, save_traj=False,
        energy_drift=({'type': 'armsca_prox', 'min_d': 1.2, 'max_d': 1.9},
                      {'type': 'clash', 'sigma': 2.0, 'gamma': 4.0}))

    centers = batch.atom_prior_centers()
    stds = batch.atom_prior_stds()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    init_pos = centers + stds * jax.random.normal(k1, centers.shape)
    init_v = model.atom_diff.sample_terminal(
        k2, batch.ligand_v.shape).astype(jnp.int32)
    init_b = jnp.where(
        batch.bond_mask,
        model.bond_diff.sample_terminal(k3, batch.bond_type.shape),
        0).astype(jnp.int32)

    def run(seed):
        out = sample_diffusion(model, sample_cfg, params,
                               jax.random.PRNGKey(seed), batch,
                               init_pos, init_v, init_b, full_protein)
        jax.block_until_ready(out['pos'])

    run(0)  # compile
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    step_ms = times / steps * 1e3
    return {
        'name': spec['name'],
        'batch': B,
        'steps': steps,
        'overrides': spec['overrides'],
        'rep_seconds': [round(float(t), 4) for t in times],
        'step_ms_mean': round(float(step_ms.mean()), 3),
        'step_ms_min': round(float(step_ms.min()), 3),
        'sec_per_mol_1000step': round(
            float(step_ms.mean()) * 1000 / 1e3 / B, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--variant', action='append', nargs='+', required=True,
                    metavar='KEY=VAL')
    ap.add_argument('--out', default=None, help='also write JSON here')
    ap.add_argument('--num_protein', type=int, default=NUM_PROTEIN)
    ap.add_argument('--num_ligand', type=int, default=NUM_LIGAND)
    args = ap.parse_args()
    set_shapes(args.num_protein, args.num_ligand)

    results = []
    for tokens in args.variant:
        spec = parse_variant(tokens)
        print(f'# running {spec["name"]} ...', file=sys.stderr, flush=True)
        r = time_variant(spec, args.steps, args.reps)
        print(json.dumps(r), flush=True)
        results.append(r)
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({'steps': args.steps, 'reps': args.reps,
                       'results': results}, f, indent=1)


if __name__ == '__main__':
    main()
