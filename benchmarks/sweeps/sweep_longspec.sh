#!/usr/bin/env bash
# Two-model grid (the analog of run_files longspec drivers): draft modes x
# budgets for the standalone-draft engine.
set -euo pipefail
cd "$(dirname "$0")/../.."
MODEL=${MODEL:-llama-3.2-1b} DRAFT=${DRAFT:-test-tiny} B=${B:-8}
PREFIX=${PREFIX:-2048} GEN=${GEN:-80} CSV=${CSV:-sweep_longspec.csv}
for MODE in "" "snapkv" "streaming"; do
  for BUDGET in 256 512; do
    ARGS=(--model "$MODEL" --draft_model "$DRAFT" --B "$B"
          --prefix_len "$PREFIX" --gen_len "$GEN" --gamma 4
          --num_batches 3 --warmup 1 --benchmark --csv "$CSV")
    if [ -n "$MODE" ]; then
      ARGS+=(--draft_spec "$MODE" --draft_budget "$BUDGET")
    fi
    python benchmarks/longspec_benchmark.py "${ARGS[@]}"
    [ -z "$MODE" ] && break   # full-KV mode has no budget axis
  done
done
