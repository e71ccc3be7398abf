"""Mixed-bucket sampling throughput + padding-ladder analysis (VERDICT r3
item 3).

The headline bench (bench.py) runs ONE padded bucket (Np=320/Nl=32). Real
pocket sets span the collator ladder (data/collate.py PROTEIN_BUCKETS /
LIGAND_BUCKETS), and each NEW bucket costs a one-time compiled-executable
load per process (~4 s over the tunnel, CLAUDE.md). This benchmark:

1. derives the CrossDocked LIGAND-size distribution from the committed
   atom-num tables (evaluation/assets/atom_num_config.json — decile bins of
   pocket space size, each carrying an empirical ligand-atom-count
   distribution; ref utils/evaluation/atom_num_config.py) and reports the
   expected padding waste of candidate ligand ladders;
2. runs the full guided-sampling protocol across >=3 (Np, Nl) buckets in ONE
   process, reporting per-bucket first-dispatch cost (compile/executable
   load), steady per-step ms, and the BLENDED s/mol for a pocket mix.

Protein sizes have no committed CrossDocked statistics (the assets only
cover ligand counts and bond geometry); the protein mix below is the
SURVEY.md range (~150-500 pocket atoms) spread over three ladder rungs and
is reported as an assumption, not data.

Usage: python benchmarks/bench_mixed_buckets.py [--steps 200] [--reps 2]
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

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'decompdiff_tpu', 'evaluation', 'assets')

# three-bucket pocket mix (Np, Nl, weight): small/median/large rungs of the
# default ladders; weights from the ligand-distribution bucket shares
# computed below are printed alongside
BUCKET_MIX = ((192, 24, 0.35), (320, 32, 0.45), (448, 48, 0.20))
NUM_FULL_PROTEIN = 2048
BATCH = 8


def ligand_size_distribution():
    """Marginal ligand-atom-count distribution from the committed decile
    tables: bounds are pocket-space-size deciles, so each bin carries 1/10
    of the corpus."""
    with open(os.path.join(ASSETS, 'atom_num_config.json')) as f:
        cfg = json.load(f)
    counts = {}
    for support, probs in cfg['bins']:
        for n, p in zip(support, probs):
            counts[n] = counts.get(n, 0.0) + p / len(cfg['bins'])
    total = sum(counts.values())
    return {n: p / total for n, p in sorted(counts.items())}


def ladder_waste(dist, ladder):
    """Expected padded/real atom ratio - 1 under the size distribution, plus
    per-rung corpus share. Sizes above the ladder top are clamped (they
    would raise in collate; counted separately)."""
    waste, shares, overflow = 0.0, {b: 0.0 for b in ladder}, 0.0
    for n, p in dist.items():
        bs = [b for b in ladder if b >= n]
        if not bs:
            overflow += p
            continue
        b = bs[0]
        waste += p * (b / n - 1.0)
        shares[b] += p
    return waste, shares, overflow


def analyze_ladders():
    from decompdiff_tpu.data.collate import LIGAND_BUCKETS
    dist = ligand_size_distribution()
    print('--- ligand-size distribution (from atom_num_config deciles) ---')
    mean = sum(n * p for n, p in dist.items())
    print(f'mean {mean:.1f} atoms; p5/p50/p95 = '
          + '/'.join(str(_pct(dist, q)) for q in (0.05, 0.5, 0.95)))
    # rungs stay multiples of 8: the bond/triplet kernels block on Nl
    # sublanes (Mosaic: block sublane dims must divide by 8)
    for ladder in (LIGAND_BUCKETS, (16, 24, 32, 48), (24, 32, 48, 64),
                   (16, 24, 32, 40, 48, 64), (8, 16, 24, 32, 40, 48, 64)):
        waste, shares, overflow = ladder_waste(dist, ladder)
        tag = ' (current)' if tuple(ladder) == tuple(LIGAND_BUCKETS) else ''
        print(f'ladder {ladder}{tag}: expected pad waste {waste:.1%}, '
              f'overflow {overflow:.2%}, rung shares '
              + ' '.join(f'{b}:{s:.0%}' for b, s in shares.items() if s))
    return dist


def _pct(dist, q):
    acc = 0.0
    for n, p in dist.items():
        acc += p
        if acc >= q:
            return n
    return max(dist)


def bench_buckets(steps, reps):
    import jax
    import jax.numpy as jnp

    from decompdiff_tpu.data.batch import FullProtein
    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.sampling.sampler import SampleConfig, sample_diffusion
    from decompdiff_tpu.utils.testing import (DEFAULT_MODEL_CONFIG,
                                              random_complex_batch)

    cfg = dict(DEFAULT_MODEL_CONFIG)
    cfg['use_pallas'] = True
    model = DecompDiffModel.create(cfg, num_classes=8)
    sample_cfg = SampleConfig(
        num_steps=steps, save_traj=False,
        energy_drift=({'type': 'armsca_prox', 'min_d': 1.2, 'max_d': 1.9},
                      {'type': 'clash', 'sigma': 2.0, 'gamma': 4.0}))

    params = None
    results = []
    for (n_p, n_l, weight) in BUCKET_MIX:
        rng = np.random.default_rng(n_p)
        batch = random_complex_batch(rng, batch_size=BATCH, num_protein=n_p,
                                     num_ligand=n_l, num_groups=6)
        if params is None:
            # one parameter tree serves every bucket (shape-independent)
            params = model.init_params(jax.random.PRNGKey(0), batch)
        full_protein = FullProtein(
            pos=jnp.asarray(
                rng.normal(size=(BATCH, NUM_FULL_PROTEIN, 3)) * 8,
                jnp.float32),
            mask=jnp.ones((BATCH, NUM_FULL_PROTEIN), bool))
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

        t0 = time.perf_counter()
        run(0)
        first = time.perf_counter() - t0
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            run(i + 1)
            times.append(time.perf_counter() - t0)
        step_ms = min(times) / steps * 1e3
        rec = {
            'bucket': [n_p, n_l], 'weight': weight,
            'first_dispatch_s': round(first, 2),
            'bucket_load_overhead_s': round(first - min(times), 2),
            'step_ms': round(step_ms, 3),
            'sec_per_mol_1000step': round(step_ms * 1000 / 1e3 / BATCH, 4),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    blended = sum(r['sec_per_mol_1000step'] * r['weight'] for r in results) \
        / sum(r['weight'] for r in results)
    load = sum(r['bucket_load_overhead_s'] for r in results)
    print(json.dumps({'blended_sec_per_mol': round(blended, 4),
                      'one_time_bucket_loads_s': round(load, 1),
                      'mix': [list(m) for m in BUCKET_MIX]}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--reps', type=int, default=2)
    ap.add_argument('--ladders-only', action='store_true')
    args = ap.parse_args()
    analyze_ladders()
    if not args.ladders_only:
        bench_buckets(args.steps, args.reps)


if __name__ == '__main__':
    main()
