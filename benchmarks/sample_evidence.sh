#!/bin/bash
# Sampling-quality evidence: full 1000-step guided sampling from a
# train_evidence checkpoint on the synthetic store, then reconstruction +
# evaluation (JSD profiles, completeness). Usage:
#   bash benchmarks/sample_evidence.sh CKPT [OUTDIR] [extra sample.py args]
# Writes result_*.pkl + eval_summary.pkl under OUTDIR
# (default benchmarks/artifacts/sample_evidence).
set -e
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/ddtpu_cache}
CKPT=${1:?usage: sample_evidence.sh CKPT [OUTDIR]}
OUT=${2:-benchmarks/artifacts/sample_evidence}
shift || true; shift || true
[ -f data/synth256.ddstore ] || python scripts/make_synthetic_data.py --out data/synth256.ddstore --n 256 --seed 0
# one process for all pockets: startup/checkpoint/compiled-scan state is
# shared, results bit-identical to per-pocket processes (regression-tested)
python scripts/sample.py benchmarks/configs/sample_synth256.yml \
    --ckpt "$CKPT" -i 0 1 2 3 --outdir "$OUT" --batch_size 8 --use_pallas "$@"
python scripts/evaluate.py "$OUT"
python - "$OUT" <<'EOF'
import json, pickle, sys
out = sys.argv[1]
with open(f'{out}/eval_summary.pkl', 'rb') as f:
    s = pickle.load(f)
def clean(x):
    if isinstance(x, dict):
        return {k: clean(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [clean(v) for v in x]
    if hasattr(x, 'item'):
        return x.item()
    return x
with open(f'{out}/eval_summary.json', 'w') as f:
    json.dump(clean(s), f, indent=1, default=str)
print(json.dumps({k: clean(v) for k, v in s.items()
                  if not isinstance(v, (list, dict))}, default=str))
EOF
