#!/bin/bash
# Hardware validation runbook — run when the TPU worker is reachable.
#
# Order matters: one heavy config per process (the remote worker has
# crashed under long multi-config sessions), warm the compile cache with
# --smoke first, and capture everything to timestamped logs.
#
# Usage: bash scripts/validate_hw.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_validate_$(date -u +%H%M)}
mkdir -p "$OUT"
echo "logs -> $OUT"

probe() {
    timeout 150 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

if ! probe; then
    echo "TPU worker unreachable; aborting" >&2
    exit 1
fi

# 1. smoke: pipeline sanity + compile-cache warmup (~2 min warm)
timeout 1800 python bench.py --smoke > "$OUT/smoke.json" 2> "$OUT/smoke.log"
echo "smoke rc=$?"

# 2. the full driver matrix: gate + func/floor/sign/decomp + device CKKS
#    (median-of-k, decrypt-verified; ~60-90 min cold, ~25 warm)
timeout 7200 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.log"
echo "bench rc=$?  headline: $(tail -1 "$OUT/bench.json")"

# 3. CHES harness (1000 x 256-ct AND + func batch sweep)
if probe; then
    timeout 3600 python examples/ches_experiments.py \
        > "$OUT/ches.log" 2>&1
    echo "ches rc=$?"
fi

# 4. RNS kernel tile sweep at N=2048 (the sign/decomp retune candidate)
if probe; then
    timeout 3600 python scripts/tune_rns.py > "$OUT/tune_rns.log" 2>&1
    echo "tune_rns rc=$?"
fi

# 5. device pke + FFT-factored CKKS bootstrap (budget/sparse/iterative tour)
if probe; then
    timeout 3600 python examples/ckks_bootstrapping.py --device \
        > "$OUT/ckks_boot.log" 2>&1
    echo "ckks_boot rc=$?"
fi

echo "done; update STATUS.md with the numbers in $OUT"
