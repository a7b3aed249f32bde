#!/usr/bin/env bash
# Grid sweeps over speculation length / budget / prefix, the analog of the
# reference's run_files/*.sh (e.g. run.sh: gamma in {2..16}, budget in
# {257,513,1025,...}, prefix in {8224,16416,...}). Budgets/prefixes here are
# 128-aligned (this engine's page/tile size) instead of the reference's
# flashinfer page+1 oddities.
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL=${MODEL:-llama-3.2-1b}
B=${B:-8}
GEN=${GEN:-80}
CSV=${CSV:-sweep_results.csv}

for PREFIX in 1024 2048 4096; do
  for BUDGET in 128 256 512; do
    for GAMMA in 2 3 4 6; do
      python benchmarks/selfspec_benchmark.py \
        --model "$MODEL" --B "$B" --prefix_len "$PREFIX" --gen_len "$GEN" \
        --gamma "$GAMMA" --draft_budget "$BUDGET" \
        --num_batches 3 --warmup 1 --benchmark --csv "$CSV"
    done
  done
done
