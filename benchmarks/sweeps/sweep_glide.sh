#!/usr/bin/env bash
# GliDe grid: linear gamma sweep + tree shapes (the analog of the
# reference's longspec_llama_glide driver runs).
set -euo pipefail
cd "$(dirname "$0")/../.."
MODEL=${MODEL:-llama-3.2-1b} B=${B:-4} PREFIX=${PREFIX:-1024} GEN=${GEN:-64}
CSV=${CSV:-sweep_glide.csv}
for GAMMA in 2 4 6; do
  python benchmarks/glide_benchmark.py --model "$MODEL" --B "$B" \
    --prefix_len "$PREFIX" --gen_len "$GEN" --gamma "$GAMMA" \
    --num_batches 2 --warmup 1 --benchmark --csv "$CSV"
done
for TREE in 2,2 3,2,2 4,2: ; do
  TREE=${TREE%:}
  python benchmarks/glide_benchmark.py --model "$MODEL" --B "$B" \
    --prefix_len "$PREFIX" --gen_len "$GEN" --tree "$TREE" \
    --num_batches 2 --warmup 1 --benchmark --csv "$CSV" || echo "skip $TREE"
done
