#!/usr/bin/env bash
# Model grid (the analog of run_qwen_pg19.sh etc): every registry family;
# random weights unless --model_name points at a converted checkpoint.
set -euo pipefail
cd "$(dirname "$0")/../.."
B=${B:-4} PREFIX=${PREFIX:-1024} GEN=${GEN:-64} CSV=${CSV:-sweep_models.csv}
for MODEL in llama-3.2-1b llama-3.2-3b llama-2-7b-32k qwen-2.5-7b \
             mistral-7b yi-6b; do
  python benchmarks/selfspec_benchmark.py \
    --spec snapkv --model "$MODEL" --B "$B" --prefix_len "$PREFIX" \
    --gen_len "$GEN" --gamma 4 --draft_budget 256 \
    --num_batches 2 --warmup 1 --benchmark --csv "$CSV" || echo "skip $MODEL"
done
