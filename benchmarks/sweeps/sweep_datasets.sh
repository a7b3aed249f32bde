#!/usr/bin/env bash
# Dataset grid (the analog of run_longbenchv1.sh / run_qwen_pg19.sh): every
# converter-backed corpus; network-gated datasets fall back cleanly when
# offline (common.load_batches), hermetic corpora always run.
set -euo pipefail
cd "$(dirname "$0")/../.."
MODEL=${MODEL:-llama-3.2-1b} B=${B:-8} PREFIX=${PREFIX:-2048} GEN=${GEN:-80}
CSV=${CSV:-sweep_datasets.csv}
for DATASET in random mixed_markov pg19 c4 wiki cnn longbench:narrativeqa; do
  python benchmarks/selfspec_benchmark.py \
    --spec snapkv --model "$MODEL" --dataset "$DATASET" --B "$B" \
    --prefix_len "$PREFIX" --gen_len "$GEN" --gamma 4 --draft_budget 256 \
    --num_batches 3 --warmup 1 --benchmark --csv "$CSV" || echo "skip $DATASET"
done
