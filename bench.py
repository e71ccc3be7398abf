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

The headline `value` is the BLENDED s/mol over a three-rung collator-ladder
mix (round-5 change; VERDICT r4 item 4): ligand-rung weights are corpus
shares from the committed CrossDocked atom-count tables, the protein rung
pairing is a labeled assumption, and `single_bucket_sec_per_mol` preserves
the rounds-1-4 Np=320/Nl=32 series. `vs_baseline` remains the same-shape
measured dense/fused ratio on that single bucket.
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


def _relay_running() -> bool:
    """Cheap check: is the axon stdio relay (/root/.tpu_init.py) running?

    When the relay dies, `jax.devices()` HANGS rather than raising, so a
    /proc scan avoids paying the probe subprocess's timeout in the dead case.
    """
    for pid in os.listdir('/proc'):
        if not pid.isdigit():
            continue
        try:
            with open(f'/proc/{pid}/cmdline', 'rb') as f:
                if b'tpu_init' in f.read():
                    return True
        except OSError:
            continue
    return False


def _tpu_alive(timeout_s: float = 180.0) -> bool:
    """Probe TPU availability in a subprocess.

    The axon tunnel can die mid-session (its relay process exits and nothing
    in-VM can restart it); when that happens `jax.devices()` HANGS rather than
    raising, so the probe must run out-of-process under a hard timeout. The
    relay /proc scan short-circuits the obviously-dead case.
    """
    import subprocess
    import sys
    if not _relay_running():
        return False
    try:
        proc = subprocess.run(
            [sys.executable, '-c',
             'import jax; d = jax.devices(); '
             'raise SystemExit(0 if d and d[0].platform != "cpu" else 1)'],
            timeout=timeout_s, capture_output=True)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import sys

    cpu_fallback = False
    if not _tpu_alive():
        # Dead tunnel: record an honest degraded measurement instead of
        # hanging the driver. CPU + dense + few steps; the metric name says so.
        cpu_fallback = True
        os.environ['JAX_PLATFORMS'] = 'cpu'

    import jax

    if cpu_fallback:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from decompdiff_tpu.data.batch import FullProtein
    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.sampling.sampler import SampleConfig, sample_diffusion
    from decompdiff_tpu.utils.testing import (
        DEFAULT_MODEL_CONFIG, random_complex_batch)

    dense = '--dense' in sys.argv[1:]  # re-measure the baseline path
    num_steps = NUM_STEPS
    batch_size, num_protein, num_ligand, num_full = (
        BATCH, NUM_PROTEIN, NUM_LIGAND, NUM_FULL_PROTEIN)
    n_runs = 2
    if cpu_fallback:
        # Dense CPU at the real shapes is minutes/step (cubic triplet
        # tensors); shrink everything so the fallback finishes in ~2 min.
        dense = True   # interpret-mode Pallas on CPU is pathologically slow
        num_steps, n_runs = 10, 1
        batch_size, num_protein, num_ligand, num_full = 2, 96, 16, 256
    cfg = dict(DEFAULT_MODEL_CONFIG)
    cfg['use_pallas'] = not dense  # fused triplet-attention kernel
    model = DecompDiffModel.create(cfg, num_classes=8)

    rng = np.random.default_rng(0)
    batch = random_complex_batch(
        rng, batch_size=batch_size, num_protein=num_protein,
        num_ligand=num_ligand, num_groups=6)
    params = model.init_params(jax.random.PRNGKey(0), batch)

    full_protein = FullProtein(
        pos=jnp.asarray(rng.normal(size=(batch_size, num_full, 3)) * 8,
                        jnp.float32),
        mask=jnp.ones((batch_size, num_full), bool))

    sample_cfg = SampleConfig(
        num_steps=num_steps, save_traj=False,
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
    for i in range(n_runs):
        run(i + 1)
    elapsed = (time.perf_counter() - t0) / n_runs

    sec_per_mol = elapsed / batch_size
    if cpu_fallback:
        metric = 'sampling_sec_per_molecule_CPU_FALLBACK_tunnel_dead_tiny'
    elif dense:
        metric = 'sampling_sec_per_molecule_1000step_guided_dense'
    else:
        metric = 'sampling_sec_per_molecule_1000step_guided_blended'
    record = {
        'metric': metric,
        'value': round(sec_per_mol, 4),
        'unit': 's/mol',
        # not comparable to the TPU dense baseline in fallback mode
        'vs_baseline': 0.0 if cpu_fallback else round(
            BASELINE_SEC_PER_MOL / sec_per_mol, 2),
    }
    if not cpu_fallback and not dense:
        # Blend across the collator ladder (VERDICT r4 item 4): the
        # single Np=320/Nl=32 bucket is one rung of a real pocket set.
        # Two more rungs are measured with shorter scans (per-step cost is
        # scan-length-invariant) and blended by mix weight. Guarded: a
        # failure here (e.g. the axon tunnel dying mid-session — a
        # twice-observed mode) must not discard the already-completed
        # ~35-min single-bucket measurement.
        import dataclasses
        import traceback
        try:
            blended, buckets = _blended_measurement(
                jax, model, dataclasses.replace(sample_cfg, num_steps=200),
                params, sec_per_mol)
            record.update({
                'value': round(blended, 4),
                'single_bucket_sec_per_mol': round(sec_per_mol, 4),
                # vs_baseline stays the same-shape measured dense/fused
                # ratio on the 320/32 bucket (the only shape with a
                # measured dense baseline; re-measure with --dense)
                'vs_baseline': round(BASELINE_SEC_PER_MOL / sec_per_mol, 2),
                'buckets': buckets,
            })
        except Exception:
            traceback.print_exc()
            record['metric'] = 'sampling_sec_per_molecule_1000step_guided'
            record['blend_error'] = 'blended measurement failed; ' \
                'single 320/32 bucket reported (rounds 1-4 metric)'
    print(json.dumps(record))


def _bucket_mix():
    """(Np, Nl, weight, source) rows. Ligand-rung weights are corpus shares
    computed from the committed CrossDocked atom-count tables
    (evaluation/assets/atom_num_config.json decile bins — data, not
    guesswork); the protein rung paired with each ligand rung is the
    SURVEY.md pocket range spread monotonically (assumption: pocket size
    correlates with ligand size; no protein-size statistics exist in the
    committed assets)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'benchmarks'))
    from bench_mixed_buckets import ladder_waste, ligand_size_distribution
    dist = ligand_size_distribution()
    _, shares, overflow = ladder_waste(dist, (24, 32, 48))
    shares[48] += overflow  # oversize ligands run in the top rung
    protein_for = {24: 192, 32: 320, 48: 448}
    total = sum(shares.values())
    return [(protein_for[nl], nl, shares[nl] / total,
             'ligand share: atom_num_config deciles; '
             'protein rung: assumed monotone pairing')
            for nl in (24, 32, 48)]


def _blended_measurement(jax, model, sample_cfg, params, single_1000):
    """Measure per-step cost on each mix bucket (200-step scans, min of 2
    reps) and return (blended s/mol at 1000 steps, per-bucket detail). The
    320/32 rung reuses the full 1000-step measurement for continuity with
    rounds 1-4."""
    import jax.numpy as jnp

    from decompdiff_tpu.data.batch import FullProtein
    from decompdiff_tpu.sampling.sampler import sample_diffusion
    from decompdiff_tpu.utils.testing import random_complex_batch

    buckets = []
    blended = 0.0
    for n_p, n_l, weight, source in _bucket_mix():
        if (n_p, n_l) == (NUM_PROTEIN, NUM_LIGAND):
            spm = single_1000
        else:
            rng = np.random.default_rng(n_p)
            b = random_complex_batch(rng, batch_size=BATCH, num_protein=n_p,
                                     num_ligand=n_l, num_groups=6)
            fp = FullProtein(
                pos=jnp.asarray(
                    rng.normal(size=(BATCH, NUM_FULL_PROTEIN, 3)) * 8,
                    jnp.float32),
                mask=jnp.ones((BATCH, NUM_FULL_PROTEIN), bool))
            centers, stds = b.atom_prior_centers(), b.atom_prior_stds()
            k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
            init_pos = centers + stds * jax.random.normal(k1, centers.shape)
            init_v = model.atom_diff.sample_terminal(
                k2, b.ligand_v.shape).astype(jnp.int32)
            init_b = jnp.where(
                b.bond_mask,
                model.bond_diff.sample_terminal(k3, b.bond_type.shape),
                0).astype(jnp.int32)

            def one(seed):
                out = sample_diffusion(model, sample_cfg, params,
                                       jax.random.PRNGKey(seed), b,
                                       init_pos, init_v, init_b, fp)
                jax.block_until_ready(out['pos'])

            one(0)  # compile / executable load
            times = []
            for i in range(2):
                t0 = time.perf_counter()
                one(i + 1)
                times.append(time.perf_counter() - t0)
            spm = min(times) / sample_cfg.num_steps * NUM_STEPS / BATCH
        buckets.append({'bucket': [n_p, n_l], 'weight': round(weight, 4),
                        'sec_per_mol': round(spm, 4), 'source': source})
        blended += weight * spm
    return blended, buckets


if __name__ == '__main__':
    main()
