"""Learning-signal metric for the sampling-evidence artifact: JSD between
SAMPLED pair-distance distributions and the TRAINING DATA's own distributions.

scripts/evaluate.py reports JSD against the reference CrossDocked tables
(ref utils/evaluation/eval_bond_length.py:57-90) — the right protocol for
real pockets, but meaningless for a model trained on the synthetic store:
training moves samples toward the synthetic geometry and therefore AWAY from
real-chemistry tables. The self-consistent check is sampled-vs-training-data,
computed here over ALL reconstructed samples' raw (pred_pos, pred_v) so the
statistic does not rest on the few fully-connected molecules.

Usage:
    python benchmarks/jsd_vs_training.py STORE OUTDIR [OUTDIR2 ...]
prints one JSON line per OUTDIR:
    {"outdir": ..., "n_samples": N, "JSD_CC_2A": ..., "JSD_All_12A": ...}
"""

import glob
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from decompdiff_tpu.constants import atomic_numbers_from_index
from decompdiff_tpu.data.store import DDStore
from decompdiff_tpu.evaluation.eval_bond_length import (
    get_pair_length_profile, pair_distances_from_pos)

from scipy.spatial import distance as sci_distance


def _store_profile(store_path):
    pairs = []
    store = DDStore(store_path)
    for rec in store:
        pairs += pair_distances_from_pos(rec['ligand_pos'],
                                         rec['ligand_element'])
    return get_pair_length_profile(pairs)


def _sampled_profile(outdir):
    pairs, n = [], 0
    for rf in sorted(glob.glob(os.path.join(outdir, 'result_*.pkl'))):
        with open(rf, 'rb') as f:
            payload = pickle.load(f)
        atom_mode = payload.get('atom_mode', 'basic')
        for r in payload['results']:
            elements = atomic_numbers_from_index(r['pred_v'], atom_mode)
            pairs += pair_distances_from_pos(r['pred_pos'], elements)
            n += 1
    return get_pair_length_profile(pairs), n


def main(argv):
    store_path, outdirs = argv[0], argv[1:]
    gt = _store_profile(store_path)
    for outdir in outdirs:
        prof, n = _sampled_profile(outdir)
        row = {'outdir': outdir, 'n_samples': n}
        for k in ('CC_2A', 'All_12A'):
            row[f'JSD_{k}'] = (
                float(sci_distance.jensenshannon(gt[k], prof[k]))
                if prof[k].sum() and gt[k].sum() else None)
        print(json.dumps(row))


if __name__ == '__main__':
    main(sys.argv[1:])
