"""Strided few-step sampling: quality-vs-steps curve with bootstrap CIs.

Measures the knee of the quality/denoiser-calls trade-off for
`sample.skip_mode: strided` (the exact-skip-posterior fast sampler,
PARITY.md "Strided few-step sampling"): for each rung R it runs the full
guided sampling protocol (ref configs/sampling_drift.yml via
benchmarks/configs/sample_synth256.yml) with `num_steps: R`, then computes
the reference JSD metrics (ref utils/evaluation/eval_bond_length.py:73-90,
eval_atom_type.py:19-39) with molecule-level bootstrap 95% CIs, so
single-digit JSD differences between rungs can be told apart from
resampling noise.

Usage:
    python benchmarks/strided_curve.py --ckpt CKPT \
        [--rungs 25 50 100 250 1000] [--num_samples 64] [--pockets 0 1 2 3] \
        [--outroot /tmp/strided_curve] [--boot 1000] [--analyze-only]

Writes <outroot>/curve.json and prints a markdown table.
"""

import argparse
import glob
import json
import os
import pickle
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_CONFIG = os.path.join(REPO, 'benchmarks/configs/sample_synth256.yml')


def run_rung(args, rung: int, outdir: str) -> None:
    """Run scripts/sample.py for one rung (all pockets in one process)."""
    import yaml
    with open(BASE_CONFIG) as f:
        cfg = yaml.safe_load(f)
    cfg['sample']['num_steps'] = int(rung)
    # At num_steps == num_timesteps the strided code path's skip posteriors
    # reduce to the dense ones (equivalence-tested allclose on pos, exact on
    # v/bond: tests/test_strided_sampling.py test_strided_full_chain_matches
    # _dense) — it still runs the skip-posterior arithmetic, not the dense
    # branch. Keeping the knob constant isolates the rung variable.
    cfg['sample']['skip_mode'] = 'strided'
    os.makedirs(outdir, exist_ok=True)
    cfg_path = os.path.join(outdir, f'sample_rung{rung}.yml')
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg, f)
    env = dict(os.environ)
    env.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/ddtpu_cache')
    cmd = [sys.executable, os.path.join(REPO, 'scripts/sample.py'), cfg_path,
           '--ckpt', args.ckpt, '-i', *map(str, args.pockets),
           '--num_samples', str(args.num_samples),
           '--batch_size', str(args.batch_size),
           '--outdir', outdir, '--use_pallas']
    print(f'[rung {rung}] {" ".join(cmd)}', flush=True)
    subprocess.run(cmd, check=True, env=env, cwd=REPO)


def per_mol_stats(outdir: str):
    """Per-molecule metric ingredients for the bootstrap.

    Each entry: dict(recon, complete, bond, pair, atoms) where bond/pair are
    the reference distance-sample lists and atoms the element multiset —
    aggregating entries reproduces scripts/evaluate.py's population metrics
    (same disconnected-molecule filter, ref
    evaluate_mol_from_meta_full.py:73-74; evaluate.py additionally drops the
    rare molecule whose chem scoring raises, which this script does not, so
    the two can differ by those drops).
    """
    from collections import Counter

    from decompdiff_tpu.constants import atomic_numbers_from_index
    from decompdiff_tpu.evaluation.eval_bond_length import (
        bond_distances_from_mol, pair_distances_from_pos)

    mols = []
    for rf in sorted(glob.glob(os.path.join(outdir, 'result_*.pkl'))):
        with open(rf, 'rb') as f:
            payload = pickle.load(f)
        atom_mode = payload.get('atom_mode', 'basic')
        for r in payload['results']:
            entry = {'recon': r.get('mol') is not None,
                     'complete': bool(r.get('complete', False)),
                     'bond': [], 'pair': [], 'atoms': Counter()}
            if entry['recon'] and entry['complete']:
                elements = atomic_numbers_from_index(r['pred_v'], atom_mode)
                entry['atoms'] = Counter(int(z) for z in elements)
                entry['pair'] = pair_distances_from_pos(r['pred_pos'],
                                                        elements)
                entry['bond'] = bond_distances_from_mol(r['mol'])
            mols.append(entry)
    return mols


def aggregate(mols):
    """Population metrics from a list of per-molecule entries."""
    from collections import Counter

    from decompdiff_tpu.evaluation.eval_atom_type import (
        eval_atom_type_distribution)
    from decompdiff_tpu.evaluation.eval_bond_length import (
        eval_bond_length_profile, eval_pair_length_profile,
        get_bond_length_profile, get_pair_length_profile)

    n = len(mols)
    pair, bond, atoms = [], [], Counter()
    for m in mols:
        pair += m['pair']
        bond += m['bond']
        atoms.update(m['atoms'])
    pm = eval_pair_length_profile(get_pair_length_profile(pair))
    bm = eval_bond_length_profile(get_bond_length_profile(bond))
    return {
        'recon_rate': sum(m['recon'] for m in mols) / max(n, 1),
        'complete_rate': sum(m['complete'] for m in mols) / max(n, 1),
        'JSD_All_12A': pm.get('JSD_All_12A'),
        'JSD_CC_2A': pm.get('JSD_CC_2A'),
        # perceived C-C single-bond length JSD (evaluate.py's bond_jsd
        # headline row, ref eval_bond_length.py:57-69)
        'JSD_CC_bond': bm.get('JSD_6-6|1'),
        'atom_jsd': eval_atom_type_distribution(atoms) if atoms else None,
    }


def _binned_matrices(mols):
    """Per-molecule additive bin-count rows for every bootstrap metric.

    get_distribution's histograms are additive at the count level, so a
    resampling round reduces to an O(n_mols) row-sum over these matrices
    instead of re-binning every raw pair distance (the naive per-round
    re-aggregation cost minutes at 512 mols x 1000 rounds on the 1-core
    driver VM). Exact parity with aggregate() is tested in
    tests/test_bench_tools.py::test_fast_bootstrap_matches_aggregate.
    """
    from decompdiff_tpu.evaluation.eval_atom_type import (
        ATOM_TYPE_DISTRIBUTION)
    from decompdiff_tpu.evaluation.eval_bond_length import (
        DISTANCE_BINS, PAIR_BINS)

    n = len(mols)
    atom_keys = list(ATOM_TYPE_DISTRIBUTION)
    cc_bins, all_bins = PAIR_BINS['CC_2A'], PAIR_BINS['All_12A']
    M = {
        'recon': np.array([m['recon'] for m in mols], float),
        'complete': np.array([m['complete'] for m in mols], float),
        'cc': np.zeros((n, len(cc_bins) + 1)),
        'all': np.zeros((n, len(all_bins) + 1)),
        'bond_cc1': np.zeros((n, len(DISTANCE_BINS) + 1)),
        'atoms': np.zeros((n, len(atom_keys))),
        'atoms_total': np.zeros(n),
    }
    for i, m in enumerate(mols):
        cc = [d for k, d in m['pair'] if k == (6, 6) and d < 2]
        alld = [d for _, d in m['pair'] if d < 12]
        bcc = [d for (z1, z2, c), d in m['bond']
               if (min(z1, z2), max(z1, z2), c) == (6, 6, 1)]
        if cc:
            M['cc'][i] = np.bincount(np.searchsorted(cc_bins, cc),
                                     minlength=len(cc_bins) + 1)
        if alld:
            M['all'][i] = np.bincount(np.searchsorted(all_bins, alld),
                                      minlength=len(all_bins) + 1)
        if bcc:
            M['bond_cc1'][i] = np.bincount(
                np.searchsorted(DISTANCE_BINS, bcc),
                minlength=len(DISTANCE_BINS) + 1)
        M['atoms'][i] = [m['atoms'].get(k, 0) for k in atom_keys]
        M['atoms_total'][i] = sum(m['atoms'].values())
    return M


def _round_metrics(M, idx):
    """aggregate() over a resample index vector, from the binned matrices.

    Metric-for-metric identical arithmetic to aggregate(): histograms are
    normalized by max(count, 1) (get_distribution), the atom marginal by the
    ALL-element total (eval_atom_type_distribution), and zero-sample rounds
    come out NaN (scipy renormalizes a zero vector to 0/0) exactly where
    aggregate() yields NaN or None — the caller drops both.
    """
    from scipy.spatial import distance as sci_distance

    from decompdiff_tpu.evaluation.eval_atom_type import (
        ATOM_TYPE_DISTRIBUTION)
    from decompdiff_tpu.evaluation.eval_bond_length import (
        REF_BOND_DISTRIBUTIONS, REF_PAIR_DISTRIBUTIONS)

    n = len(idx)

    def _jsd(gt, counts):
        if counts.sum() == 0:
            return float('nan')
        return float(sci_distance.jensenshannon(
            gt, counts / max(counts.sum(), 1)))

    atoms = M['atoms'][idx].sum(0)
    total = M['atoms_total'][idx].sum()
    ref_atom = np.array(list(ATOM_TYPE_DISTRIBUTION.values()))
    return {
        'recon_rate': float(M['recon'][idx].sum()) / max(n, 1),
        'complete_rate': float(M['complete'][idx].sum()) / max(n, 1),
        'JSD_All_12A': _jsd(REF_PAIR_DISTRIBUTIONS['All_12A'],
                            M['all'][idx].sum(0)),
        'JSD_CC_2A': _jsd(REF_PAIR_DISTRIBUTIONS['CC_2A'],
                          M['cc'][idx].sum(0)),
        'JSD_CC_bond': (_jsd(REF_BOND_DISTRIBUTIONS[(6, 6, 1)],
                             M['bond_cc1'][idx].sum(0))
                        if (6, 6, 1) in REF_BOND_DISTRIBUTIONS
                        else None),
        'atom_jsd': (float(sci_distance.jensenshannon(
            ref_atom, atoms / max(total, 1))) if total > 0
            else float('nan')),
    }


def bootstrap(mols, n_boot: int, seed: int = 0):
    """Molecule-level bootstrap: resample molecules with replacement and
    re-aggregate (via the precomputed binned matrices); 95% percentile CIs
    per metric."""
    rng = np.random.default_rng(seed)
    n = len(mols)
    M = _binned_matrices(mols)
    samples = {}
    for _ in range(n_boot):
        idx = rng.integers(0, n, size=n)
        agg = _round_metrics(M, idx)
        for k, v in agg.items():
            # a resample with zero complete molecules yields NaN JSDs
            # (empty profile); drop those rounds per metric
            if v is not None and np.isfinite(v):
                samples.setdefault(k, []).append(v)
    return {k: (float(np.percentile(v, 2.5)), float(np.percentile(v, 97.5)))
            for k, v in samples.items()}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--ckpt', required='--analyze-only' not in sys.argv)
    parser.add_argument('--rungs', type=int, nargs='+',
                        default=[25, 50, 100, 250, 1000])
    parser.add_argument('--num_samples', type=int, default=128)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--pockets', type=int, nargs='+', default=[0, 1, 2, 3])
    parser.add_argument('--outroot', default='/tmp/strided_curve')
    parser.add_argument('--boot', type=int, default=1000)
    parser.add_argument('--analyze-only', action='store_true')
    args = parser.parse_args()

    curve = []
    for rung in args.rungs:
        outdir = os.path.join(args.outroot, f'rung_{rung}')
        if not args.analyze_only:
            run_rung(args, rung, outdir)
        mols = per_mol_stats(outdir)
        point = aggregate(mols)
        cis = bootstrap(mols, args.boot)
        row = {'rung': rung, 'n_mols': len(mols),
               'n_complete': int(sum(m['complete'] for m in mols)),
               'point': point, 'ci95': cis}
        curve.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(args.outroot, exist_ok=True)
    with open(os.path.join(args.outroot, 'curve.json'), 'w') as f:
        json.dump(curve, f, indent=1)

    # markdown table for BASELINE.md
    print('\n| calls | recon | complete | JSD_All_12A [95% CI] | '
          'JSD_CC_2A [95% CI] | JSD_CC_bond [95% CI] | atom JSD [95% CI] |')
    print('|---|---|---|---|---|---|---|')
    for row in curve:
        p, c = row['point'], row['ci95']

        def fmt(key):
            if p[key] is None or key not in c:
                return 'n/a'
            return f'{p[key]:.3f} [{c[key][0]:.3f}, {c[key][1]:.3f}]'

        print(f"| {row['rung']} | {p['recon_rate']:.2f} | "
              f"{row['n_complete']}/{row['n_mols']} | "
              f"{fmt('JSD_All_12A')} | {fmt('JSD_CC_2A')} | "
              f"{fmt('JSD_CC_bond')} | {fmt('atom_jsd')} |")


if __name__ == '__main__':
    main()
