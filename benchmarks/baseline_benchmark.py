"""Plain autoregressive decoding benchmark.

Parity with the reference's tests/baseline_benchmark.py: chunked prefill then
1-token decode until EOS/gen_len, tokens/s over the post-warmup batches.

Example (single chip, random weights):
  python benchmarks/baseline_benchmark.py --B 4 --prefix_len 1024 \
      --gen_len 64 --num_batches 3 --warmup 1 --benchmark
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks import common


def main():
    p = common.add_common_args(argparse.ArgumentParser(description=__doc__))
    args = p.parse_args()

    from magicdec_tpu.engine.backend import Engine
    from magicdec_tpu.engine.spec import generate_autoregressive

    params, config = common.load_params(args)
    mesh = common.make_mesh_or_none(args)
    max_len = args.max_len or (args.prefix_len + args.gen_len + 16)
    engine = Engine(config, params, batch_size=args.B, max_len=max_len,
                    prefill_chunk=128, mesh=mesh)
    batches = common.load_batches(args, config.vocab_size)

    total_tokens, total_time = 0, 0.0
    for i, ids in enumerate(batches):
        engine.clear_kv()
        out, stats = generate_autoregressive(engine, ids, args.gen_len)
        if args.printoutput:
            print(out[:, :16])
        if not args.benchmark or i >= args.warmup:
            total_tokens += stats.generated_tokens
            total_time += stats.wall_time_s
        print(f"batch {i}: {stats.generated_tokens} tok in "
              f"{stats.wall_time_s:.3f}s "
              f"({stats.generated_tokens / stats.wall_time_s:.1f} tok/s)")

    row = common.report("baseline", tokens=total_tokens, seconds=total_time,
                        extra={"model": args.model, "B": args.B,
                               "prefix_len": args.prefix_len})
    if args.csv:
        common.append_csv(args.csv, row)


if __name__ == "__main__":
    main()
