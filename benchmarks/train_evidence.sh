#!/bin/bash
# Training evidence: 3000 iters on data/synth256.ddstore (real TPU or CPU).
# Writes logs + metrics.jsonl under benchmarks/artifacts/train_evidence/.
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/ddtpu_cache}
[ -f data/synth256.ddstore ] || python scripts/make_synthetic_data.py --out data/synth256.ddstore --n 256 --seed 0
python scripts/train.py benchmarks/configs/train_synth256.yml \
    --outdir benchmarks/artifacts/train_evidence --report_freq 100 "$@"
