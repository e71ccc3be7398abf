"""Headline benchmark: 1000-step DDPM sampling throughput (sec/molecule).

This is the metric in BASELINE.json ("Sampling sec/molecule, 1000-step DDPM").
The reference publishes no wall-clock numbers (BASELINE.md "Throughput"); its
sampler is a 1000-iteration Python loop with per-step kNN rebuilds, two
torch.autograd guidance graphs and a .cpu() trajectory copy
(ref models/decompdiff.py:552-703), and its torch_geometric/torch_scatter
stack is not installable here, so no reference wall-clock can be measured on
this host either.

`vs_baseline` is therefore a MEASURED same-chip ratio: the dense (no-Pallas)
XLA implementation of the same model and sampling protocol versus the fused
Pallas path, on the same TPU chip. The dense path is the XLA analog of the
reference's unfused per-op execution; 6.97 s/mol was measured in round 1
(BASELINE.md table) and can be re-measured any time with `--dense`.

Run configuration mirrors the released sampling protocol: full-size model
(hidden 128, 6 layers, 16 heads, k=32, bond diffusion + triplet stream),
armsca_prox + clash guidance at every step (ref configs/sampling_drift.yml).
"""

import json
import time

import numpy as np

import os

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/decompdiff_tpu_jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')


# Measured dense (no-Pallas) XLA path on this chip, round 1 (BASELINE.md);
# re-measure with --dense.
BASELINE_SEC_PER_MOL = 6.97

BATCH = 8
NUM_PROTEIN = 320
NUM_LIGAND = 32
NUM_FULL_PROTEIN = 2048
NUM_STEPS = 1000


def main():
    import sys

    import jax
    import jax.numpy as jnp

    from decompdiff_tpu.data.batch import FullProtein
    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.sampling.sampler import SampleConfig, sample_diffusion
    from decompdiff_tpu.utils.testing import (
        DEFAULT_MODEL_CONFIG, random_complex_batch)

    dense = '--dense' in sys.argv[1:]  # re-measure the baseline path
    cfg = dict(DEFAULT_MODEL_CONFIG)
    cfg['use_pallas'] = not dense  # fused triplet-attention kernel
    model = DecompDiffModel.create(cfg, num_classes=8)

    rng = np.random.default_rng(0)
    batch = random_complex_batch(
        rng, batch_size=BATCH, num_protein=NUM_PROTEIN,
        num_ligand=NUM_LIGAND, num_groups=6)
    params = model.init_params(jax.random.PRNGKey(0), batch)

    full_protein = FullProtein(
        pos=jnp.asarray(rng.normal(size=(BATCH, NUM_FULL_PROTEIN, 3)) * 8,
                        jnp.float32),
        mask=jnp.ones((BATCH, NUM_FULL_PROTEIN), bool))

    sample_cfg = SampleConfig(
        num_steps=NUM_STEPS, save_traj=False,
        energy_drift=({'type': 'armsca_prox', 'min_d': 1.2, 'max_d': 1.9},
                      {'type': 'clash', 'sigma': 2.0, 'gamma': 4.0}))

    centers = batch.atom_prior_centers()
    stds = batch.atom_prior_stds()
    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    init_pos = centers + stds * jax.random.normal(k1, centers.shape)
    init_v = model.atom_diff.sample_terminal(k2, batch.ligand_v.shape).astype(jnp.int32)
    init_b = jnp.where(batch.bond_mask,
                       model.bond_diff.sample_terminal(k3, batch.bond_type.shape),
                       0).astype(jnp.int32)

    def run(seed):
        out = sample_diffusion(model, sample_cfg, params,
                               jax.random.PRNGKey(seed), batch,
                               init_pos, init_v, init_b, full_protein)
        jax.block_until_ready(out['pos'])
        return out

    run(0)  # compile
    t0 = time.perf_counter()
    n_runs = 2
    for i in range(n_runs):
        run(i + 1)
    elapsed = (time.perf_counter() - t0) / n_runs

    sec_per_mol = elapsed / BATCH
    print(json.dumps({
        'metric': ('sampling_sec_per_molecule_1000step_guided_dense'
                   if dense else 'sampling_sec_per_molecule_1000step_guided'),
        'value': round(sec_per_mol, 4),
        'unit': 's/mol',
        'vs_baseline': round(BASELINE_SEC_PER_MOL / sec_per_mol, 2),
    }))


if __name__ == '__main__':
    main()
