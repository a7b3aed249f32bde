#!/usr/bin/env bash
# Engine grid: every drafting engine x budget x gamma (the analog of the
# reference's run_quest.sh / run_retroinfer.sh families).
set -euo pipefail
cd "$(dirname "$0")/../.."
MODEL=${MODEL:-llama-3.2-1b} B=${B:-8} PREFIX=${PREFIX:-2048} GEN=${GEN:-80}
CSV=${CSV:-sweep_engines.csv}
for SPEC in snapkv streaming quest retro squeeze; do
  for BUDGET in 128 256 512; do
    for GAMMA in 3 6; do
      python benchmarks/selfspec_benchmark.py \
        --spec "$SPEC" --model "$MODEL" --B "$B" --prefix_len "$PREFIX" \
        --gen_len "$GEN" --gamma "$GAMMA" --draft_budget "$BUDGET" \
        --num_batches 3 --warmup 1 --benchmark --csv "$CSV"
    done
  done
done
