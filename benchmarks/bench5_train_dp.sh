#!/bin/bash
# BASELINE.json config 5: training with data-parallel mesh allreduce.
# On a multi-chip host the dp mesh engages automatically (batch divisible by
# device count); on CPU use the virtual 8-device mesh below.
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/ddtpu_cache}
if [ "${VIRTUAL_MESH:-0}" = "1" ]; then
    export JAX_PLATFORMS=cpu
    export XLA_FLAGS="--xla_force_host_platform_device_count=8"
fi
STORE=${STORE:-./data/synth256.ddstore}
[ -f "$STORE" ] || python scripts/make_synthetic_data.py --out "$STORE" --n 256 --seed 0
TMP=$(mktemp)
python - <<PY
import yaml
cfg = yaml.safe_load(open('benchmarks/configs/train_synth256.yml'))
cfg['data']['path'] = '$STORE'
cfg['train']['batch_size'] = 8
yaml.safe_dump(cfg, open('$TMP', 'w'))
PY
python scripts/train.py $TMP --outdir benchmarks/artifacts/bench5 \
    --max_iters "${ITERS:-200}" --val_freq 200 --report_freq 20
