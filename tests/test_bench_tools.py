"""Benchmark tooling invariants: bench.py's blended bucket mix and the
strided-curve bootstrap analysis (no device work — pure host logic)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'benchmarks'))


def test_bucket_mix_weights_are_derived_and_normalized():
    from bench import _bucket_mix
    mix = _bucket_mix()
    assert len(mix) == 3
    weights = [w for _, _, w, _ in mix]
    assert abs(sum(weights) - 1.0) < 1e-9
    # ligand-rung shares come from the committed atom-count tables: the
    # 24-atom rung carries the majority of the corpus
    by_nl = {nl: w for _, nl, w, _ in mix}
    assert by_nl[24] > by_nl[32] > by_nl[48]
    # provenance labels present on every row
    assert all('atom_num_config' in src for _, _, _, src in mix)
    # protein pairing is monotone in ligand size
    ps = [p for p, _, _, _ in mix]
    assert ps == sorted(ps)


def _fake_mols(n_complete, n_total, seed=0):
    rng = np.random.default_rng(seed)
    mols = []
    for i in range(n_total):
        complete = i < n_complete
        entry = {'recon': True, 'complete': complete, 'bond': [],
                 'pair': [], 'atoms': {}}
        if complete:
            from collections import Counter
            entry['atoms'] = Counter({6: 10, 7: 2, 8: 2})
            entry['pair'] = [((6, 6), float(d))
                             for d in rng.uniform(1.2, 11.5, size=40)]
            entry['bond'] = [((6, 6, 1), float(d))
                             for d in rng.uniform(1.35, 1.65, size=12)]
        mols.append(entry)
    return mols


def test_curve_aggregate_and_bootstrap():
    from strided_curve import aggregate, bootstrap
    mols = _fake_mols(10, 64)
    point = aggregate(mols)
    assert point['complete_rate'] == 10 / 64
    assert np.isfinite(point['JSD_All_12A'])
    # the bond-length JSD must flow into the curve (regression: per-mol
    # bond samples were computed but never aggregated)
    assert np.isfinite(point['JSD_CC_bond'])
    cis = bootstrap(mols, n_boot=50)
    lo, hi = cis['JSD_All_12A']
    assert lo <= hi
    assert np.isfinite(lo) and np.isfinite(hi)
    lo_c, hi_c = cis['complete_rate']
    assert lo_c <= point['complete_rate'] <= hi_c


def test_fast_bootstrap_matches_aggregate():
    """The binned-matrix per-round metrics must equal aggregate() on the
    same resample — the bootstrap's O(n_mols) row-sum path is only valid
    because get_distribution's histograms are additive counts."""
    from collections import Counter

    from strided_curve import _binned_matrices, _round_metrics, aggregate

    rng = np.random.default_rng(3)
    mols = _fake_mols(12, 32, seed=3)
    # exercise the untracked-element total accounting (5 = boron is not in
    # ATOM_TYPE_DISTRIBUTION but inflates the normalizing total) and a
    # complete molecule with no (6,6,1) bond samples
    mols[0]['atoms'] = Counter({6: 4, 5: 3})
    mols[1]['bond'] = [((6, 7, 1), 1.4), ((7, 6, 2), 1.3)]
    M = _binned_matrices(mols)
    for trial in range(5):
        idx = rng.integers(0, len(mols), size=len(mols))
        fast = _round_metrics(M, idx)
        slow = aggregate([mols[i] for i in idx])
        for k, v in slow.items():
            fv = fast[k]
            if v is None or not np.isfinite(v):
                assert fv is None or not np.isfinite(fv), (k, v, fv)
            else:
                assert fv == pytest.approx(v, rel=1e-12, abs=1e-12), (k, v, fv)


def test_curve_bootstrap_drops_empty_resamples():
    """With a single complete molecule most resamples miss it entirely and
    yield NaN JSDs; those rounds must be dropped, not propagated."""
    from strided_curve import bootstrap
    mols = _fake_mols(1, 64)
    cis = bootstrap(mols, n_boot=50)
    if 'JSD_All_12A' in cis:
        assert np.isfinite(cis['JSD_All_12A']).all()
