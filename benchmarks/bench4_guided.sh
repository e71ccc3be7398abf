#!/bin/bash
# BASELINE.json config 4: drift-guided sampling (armsca_prox + clash inside
# the scanned reverse loop). Same protocol as ../bench.py, which times it on
# synthetic weights; this script runs it from a real checkpoint.
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/ddtpu_cache}
STORE=${STORE:-./data/synth64.ddstore}
[ -f "$STORE" ] || python scripts/make_synthetic_data.py --out "$STORE" --n 64 --seed 0
CKPT=${CKPT:?set CKPT=path/to/checkpoint.ckpt}
OUT=${OUT:-benchmarks/artifacts/bench4}
TMP=$(mktemp)
python - <<PY
import yaml
cfg = yaml.safe_load(open('configs/sampling.yml'))
cfg['data']['path'] = '$STORE'
cfg['data'].pop('split', None)
cfg['sample'].update(num_samples=8, num_steps=1000, sample_num_atoms='ref')
yaml.safe_dump(cfg, open('$TMP', 'w'))
PY
time python scripts/sample.py $TMP --ckpt "$CKPT" -i "${POCKET:-0}" \
    --outdir "$OUT" --batch_size 8 --use_pallas
