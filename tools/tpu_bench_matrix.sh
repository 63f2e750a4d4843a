#!/usr/bin/env bash
# Bench matrix for the CLIP RN50 serving path on the real TPU chip.
# Run from the repo root when the tunnel is up: bash tools/tpu_bench_matrix.sh
# One JSON line per configuration (bench.py slope-timing; ~2-3 min each).
set -u
cd "$(dirname "$0")/.."

run() {
  local label="$1"; shift
  echo "=== $label"
  env "$@" timeout 900 python bench.py 2>/dev/null | tail -1
}

run "serving default (int8 trunk, relu folds, einsum down)"
run "pallas stem3 (ECT_PALLAS_STEM=1)" ECT_PALLAS_STEM=1
run "pallas stage1 (ECT_PALLAS_STAGE1=1)" ECT_PALLAS_STAGE1=1
run "bf16 fidelity reference" BENCH_QUANT=none
