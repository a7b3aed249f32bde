"""Self-speculation benchmark (draft = target weights + compressed KV budget).

Parity with the reference's canonical drivers
tests/SnapKV/selfspec_benchmark.py and tests/StreamingLLM/selfspec_benchmark.py
(SURVEY.md §3.2): chunked prefill builds the draft cache, then rounds of
gamma draft steps + one verify with vectorized cumprod acceptance, rollback by
length rewind, bonus token. Reports tokens/s, acceptance rate and the
per-token alpha solved from it.

Example (single chip, random weights):
  python benchmarks/selfspec_benchmark.py --spec snapkv --B 4 \
      --prefix_len 1024 --gen_len 64 --gamma 3 --draft_budget 256 \
      --num_batches 3 --warmup 1 --benchmark
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks import common


def main():
    p = common.add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--spec", default="snapkv",
                   choices=["snapkv", "streaming", "quest", "retro",
                            "squeeze"])
    p.add_argument("--gamma", type=int, default=3,
                   help="draft tokens per round (reference --gamma)")
    p.add_argument("--draft_budget", type=int, default=512,
                   help="draft KV budget in tokens (reference --draft_budget)")
    p.add_argument("--window_size", type=int, default=32,
                   help="SnapKV observation window (reference --window_size)")
    p.add_argument("--sink_size", type=int, default=16,
                   help="StreamingLLM attention-sink tokens")
    p.add_argument("--latest_k", type=int, default=128,
                   help="quest/retro/squeeze forced-recent window "
                        "(reference Quest --latest_k)")
    p.add_argument("--retro_cap", type=int, default=32,
                   help="retro/squeeze cluster capacity")
    p.add_argument("--squeeze_threshold", type=float, default=0.01)
    args = p.parse_args()
    # reference asserts 128-alignment of prefix/budget (selfspec_benchmark.py:37-41)
    assert args.prefix_len % 128 == 0, "prefix_len must be a multiple of 128"

    from magicdec_tpu.engine.backend import Engine
    from magicdec_tpu.engine.spec import generate_selfspec

    params, config = common.load_params(args)
    mesh = common.make_mesh_or_none(args)
    max_len = args.max_len or (args.prefix_len + args.gen_len + args.gamma + 8)
    engine = Engine(config, params, batch_size=args.B, max_len=max_len,
                    spec=args.spec, draft_budget=args.draft_budget,
                    window_size=args.window_size, sink_size=args.sink_size,
                    latest_k=args.latest_k, retro_cap=args.retro_cap,
                    squeeze_threshold=args.squeeze_threshold,
                    prefill_chunk=128, mesh=mesh)
    batches = common.load_batches(args, config.vocab_size)

    total_tokens, total_time = 0, 0.0
    drafted = accepted = 0
    for i, ids in enumerate(batches):
        engine.clear_kv()
        out, counts, stats = generate_selfspec(engine, ids, args.gamma,
                                               args.gen_len)
        if args.printoutput:
            print(out[:, :16])
        if not args.benchmark or i >= args.warmup:
            total_tokens += stats.generated_tokens
            total_time += stats.wall_time_s
            drafted += stats.total_drafted
            accepted += stats.total_accepted_drafts
        print(f"batch {i}: {stats.generated_tokens} tok in "
              f"{stats.wall_time_s:.3f}s "
              f"({stats.generated_tokens / stats.wall_time_s:.1f} tok/s), "
              f"acceptance {stats.acceptance_rate:.4f}, "
              f"rounds {stats.rounds}")

    rate = accepted / drafted if drafted else 0.0
    alpha = common.find_alpha(args.gamma, rate)
    row = common.report(
        f"selfspec_{args.spec}", tokens=total_tokens, seconds=total_time,
        extra={"model": args.model, "B": args.B, "prefix_len": args.prefix_len,
               "gamma": args.gamma, "draft_budget": args.draft_budget,
               "acceptance_rate": round(rate, 4), "alpha": round(alpha, 4)})
    if args.csv:
        common.append_csv(args.csv, row)


if __name__ == "__main__":
    main()
