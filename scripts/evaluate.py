"""Evaluation driver (L9).

Usage:
    python scripts/evaluate.py OUTDIR [--docking_mode {none,vina_score,
        vina_full,vina,qvina}] [--protein_root DIR]

Protocol parity with ref scripts/evaluate_mol_from_meta_full.py: aggregate
result pickles, (re)reconstruct if needed, chem properties (RDKit-gated),
docking (tool-gated), bond/pair JSD profiles, completeness and ring-size
reports.
"""

import argparse
import glob
import os
import pickle
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('outdir')
    parser.add_argument('--docking_mode', default='none',
                        choices=['none', 'vina_score', 'vina_full', 'vina',
                                 'qvina'])
    parser.add_argument('--protein_root', default=None)
    args = parser.parse_args()

    from decompdiff_tpu.constants import atomic_numbers_from_index
    from decompdiff_tpu.evaluation.eval_atom_type import (
        eval_atom_type_distribution)
    from decompdiff_tpu.evaluation.eval_bond_length import (
        bond_distances_from_mol, eval_bond_length_profile,
        eval_pair_length_profile, get_bond_length_profile,
        get_pair_length_profile, pair_distances_from_pos)
    from decompdiff_tpu.evaluation.scoring import HAS_RDKIT, get_chem, get_ring_sizes
    from decompdiff_tpu.utils.misc import get_logger

    logger = get_logger('evaluate', args.outdir)
    result_files = sorted(glob.glob(os.path.join(args.outdir, 'result_*.pkl')))
    assert result_files, f'no result_*.pkl under {args.outdir}'

    n_total, n_recon, n_complete = 0, 0, 0
    all_bond_lengths, all_pair_lengths = [], []
    atom_counter = Counter()
    ring_sizes = Counter()
    chem_rows = []
    vina_rows = []

    for rf in result_files:
        with open(rf, 'rb') as f:
            payload = pickle.load(f)
        atom_mode = payload.get('atom_mode', 'basic')
        for r in payload['results']:
            n_total += 1
            mol = r.get('mol')
            if mol is None:
                continue
            n_recon += 1
            n_complete += int(r.get('complete', False))

            elements = atomic_numbers_from_index(r['pred_v'], atom_mode)
            atom_counter.update(int(z) for z in elements)
            all_pair_lengths += pair_distances_from_pos(r['pred_pos'],
                                                        elements)
            all_bond_lengths += bond_distances_from_mol(mol)
            try:
                ring_sizes.update(get_ring_sizes(mol))
            except Exception:
                pass
            if HAS_RDKIT and not hasattr(mol, 'bond_index'):
                try:
                    chem_rows.append(get_chem(mol))
                except Exception as e:
                    logger.info(f'chem scoring failed: {e}')
                if args.docking_mode != 'none':
                    from decompdiff_tpu.evaluation.docking import (
                        VinaDockingTask)
                    try:
                        task = VinaDockingTask(
                            mol, protein_path=r.get('protein_path'),
                            tmp_dir='/tmp')
                        mode = {'vina_score': 'score_only',
                                'vina': 'dock', 'vina_full': 'dock',
                                'qvina': 'dock'}[args.docking_mode]
                        vina_rows.append(task.run(mode=mode))
                    except Exception as e:
                        logger.info(f'docking failed: {e}')

    logger.info(f'total {n_total}, reconstructed {n_recon} '
                f'({n_recon / max(n_total, 1):.1%}), complete {n_complete} '
                f'({n_complete / max(n_total, 1):.1%})')

    bond_profile = get_bond_length_profile(all_bond_lengths)
    bond_metrics = eval_bond_length_profile(bond_profile)
    logger.info('bond-length JSD: ' + ' '.join(
        f'{k}={v:.4f}' for k, v in bond_metrics.items() if v is not None))

    pair_profile = get_pair_length_profile(all_pair_lengths)
    pair_metrics = eval_pair_length_profile(pair_profile)
    logger.info('pair-distance JSD: ' + ' '.join(
        f'{k}={v:.4f}' for k, v in pair_metrics.items() if v is not None))

    atom_jsd = eval_atom_type_distribution(atom_counter)
    logger.info(f'atom-type JSD: {atom_jsd:.4f}')
    logger.info(f'ring sizes: {dict(sorted(ring_sizes.items()))}')

    if chem_rows:
        for key in ('qed', 'sa', 'logp', 'lipinski'):
            vals = [c[key] for c in chem_rows]
            logger.info(f'{key}: mean {np.mean(vals):.4f} '
                        f'median {np.median(vals):.4f}')
    if vina_rows:
        logger.info(f'vina: mean {np.mean(vina_rows):.4f} '
                    f'median {np.median(vina_rows):.4f}')

    summary = {
        'n_total': n_total, 'n_recon': n_recon, 'n_complete': n_complete,
        'bond_jsd': bond_metrics, 'pair_jsd': pair_metrics,
        'atom_type_jsd': atom_jsd,
        'ring_sizes': dict(ring_sizes),
        'chem': chem_rows, 'vina': vina_rows,
    }
    out = os.path.join(args.outdir, 'eval_summary.pkl')
    with open(out, 'wb') as f:
        pickle.dump(summary, f)
    logger.info(f'saved {out}')


if __name__ == '__main__':
    main()
