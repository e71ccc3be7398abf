#!/bin/bash
# BASELINE.json config 3: beta_prior sampling (AlphaSpace2-derived priors).
# Needs beta-prior pickles (BETA=dir with {id:08d}.pkl) for real data;
# without them the prior substitution falls back to the stored golden prior.
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/ddtpu_cache}
STORE=${STORE:-./data/synth64.ddstore}
[ -f "$STORE" ] || python scripts/make_synthetic_data.py --out "$STORE" --n 64 --seed 0
CKPT=${CKPT:?set CKPT=path/to/checkpoint.ckpt}
OUT=${OUT:-benchmarks/artifacts/bench3}
TMP=$(mktemp)
python - <<PY
import yaml
cfg = yaml.safe_load(open('configs/sampling.yml'))
cfg['data']['path'] = '$STORE'
cfg['data'].pop('split', None)
cfg['sample'].update(num_samples=20, num_steps=1000, prior_mode='beta_prior',
                     energy_drift=[])
beta = '${BETA:-}'
if beta:
    cfg['sample']['beta_prior_path'] = beta + '/{id:08d}.pkl'
yaml.safe_dump(cfg, open('$TMP', 'w'))
PY
time python scripts/sample.py $TMP --ckpt "$CKPT" -i "${POCKET:-0}" \
    --outdir "$OUT" --batch_size "${BATCH:-20}" --use_pallas
