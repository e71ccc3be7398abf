#!/bin/bash
# Data-parallel sampling over the device mesh: sampling is embarrassingly
# parallel across pockets/samples (ref scripts/sample_diffusion_decomp.py
# :314-360 batches complexes independently); scripts/sample.py shards the
# batch over all devices whenever batch_size divides the device count.
# On a multi-chip host the dp mesh engages automatically; on CPU use the
# virtual 8-device mesh (VIRTUAL_MESH=1). Correctness evidence:
# tests/test_sampler.py::test_sampler_data_parallel_matches_unsharded.
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/ddtpu_cache}
if [ "${VIRTUAL_MESH:-0}" = "1" ]; then
    export JAX_PLATFORMS=cpu
    export XLA_FLAGS="--xla_force_host_platform_device_count=8"
fi
STORE=${STORE:-./data/synth64.ddstore}
[ -f "$STORE" ] || python scripts/make_synthetic_data.py --out "$STORE" --n 64 --seed 0
CKPT=${CKPT:?set CKPT=path/to/checkpoint.ckpt}
OUT=${OUT:-benchmarks/artifacts/bench6}
TMP=$(mktemp)
python - <<PY
import yaml
cfg = yaml.safe_load(open('configs/sampling.yml'))
cfg['data']['path'] = '$STORE'
cfg['data'].pop('split', None)
cfg['sample'].update(num_samples=${NUM_SAMPLES:-16}, num_steps=${STEPS:-100},
                     sample_num_atoms='ref', energy_drift=[])
yaml.safe_dump(cfg, open('$TMP', 'w'))
PY
# batch_size = device count -> one complex per device
python scripts/sample.py $TMP --ckpt "$CKPT" -i 0 --outdir "$OUT" \
    --batch_size "${BATCH:-8}"
