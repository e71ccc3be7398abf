#!/bin/bash
# BASELINE.json config 1: ref_prior sampling, single pocket, 100-step DDPM,
# batch=4, CPU-runnable.
set -e
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/ddtpu_cache}
STORE=${STORE:-./data/synth64.ddstore}
[ -f "$STORE" ] || python scripts/make_synthetic_data.py --out "$STORE" --n 64 --seed 0
CKPT=${CKPT:?set CKPT=path/to/checkpoint.ckpt}
OUT=${OUT:-benchmarks/artifacts/bench1}
TMP=$(mktemp)
python - <<PY
import yaml
cfg = yaml.safe_load(open('configs/sampling.yml'))
cfg['data']['path'] = '$STORE'
cfg['data'].pop('split', None)
cfg['sample'].update(num_samples=4, num_steps=100, sample_num_atoms='ref',
                     energy_drift=[])
yaml.safe_dump(cfg, open('$TMP', 'w'))
PY
time python scripts/sample.py $TMP --ckpt "$CKPT" -i 0 --outdir "$OUT" --batch_size 4
