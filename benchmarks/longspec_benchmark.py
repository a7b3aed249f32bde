"""Standalone-draft (two-model) speculative decoding benchmark.

Parity with the reference's tests/{SnapKV,StreamingLLM}/longspec_benchmark.py
(SURVEY.md §3.3): a small draft model speculates, the large target verifies.
Where the reference splits NCCL ranks into target/draft groups
(--rank_group/--draft_rank_group + token broadcast), GSPMD shards both
models' weights over the same mesh with their own layouts — no process
choreography (see engine/longspec.py docstring).

Example (single chip, random weights):
  python benchmarks/longspec_benchmark.py --model llama-3.2-1b \
      --draft_model test-tiny --B 2 --prefix_len 512 --gen_len 64 --gamma 3 \
      --num_batches 2 --warmup 1 --benchmark
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks import common


def main():
    p = common.add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--draft_model", type=str, default="llama-3.2-1b",
                   help="draft config/checkpoint (reference --draft_model)")
    p.add_argument("--draft_spec", default=None,
                   choices=[None, "snapkv", "streaming"],
                   help="draft KV compression; None = full-KV classic SD "
                        "(reference draft_budget=-1)")
    p.add_argument("--gamma", type=int, default=3)
    p.add_argument("--draft_budget", type=int, default=512)
    p.add_argument("--window_size", type=int, default=32)
    args = p.parse_args()

    import jax

    from magicdec_tpu.engine.backend import Engine
    from magicdec_tpu.engine.longspec import LongSpecEngine
    from magicdec_tpu.models import llama
    from magicdec_tpu.models.config import ModelArgs

    params, config = common.load_params(args)
    dcfg = ModelArgs.from_name(args.draft_model)
    import jax.numpy as jnp
    dparams = llama.init_params(jax.random.PRNGKey(args.seed + 7), dcfg,
                                dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                                else jnp.float32)
    mesh = common.make_mesh_or_none(args)
    max_len = args.max_len or (args.prefix_len + args.gen_len + args.gamma + 8)
    target = Engine(config, params, batch_size=args.B, max_len=max_len,
                    prefill_chunk=128, mesh=mesh)
    draft = Engine(dcfg, dparams, batch_size=args.B,
                   max_len=max_len + args.gamma + 8, spec=args.draft_spec,
                   draft_budget=args.draft_budget if args.draft_spec else 0,
                   window_size=args.window_size, prefill_chunk=128, mesh=mesh)
    eng = LongSpecEngine(target, draft)
    batches = common.load_batches(args, min(config.vocab_size,
                                            dcfg.vocab_size))

    total_tokens, total_time, drafted, accepted = 0, 0.0, 0, 0
    for i, ids in enumerate(batches):
        target.clear_kv()
        draft.clear_kv()
        out, counts, stats = eng.generate(ids, args.gamma, args.gen_len)
        if args.printoutput:
            print(out[:, :16])
        if not args.benchmark or i >= args.warmup:
            total_tokens += stats.generated_tokens
            total_time += stats.wall_time_s
            drafted += stats.total_drafted
            accepted += stats.total_accepted_drafts
        print(f"batch {i}: {stats.generated_tokens} tok in "
              f"{stats.wall_time_s:.3f}s, acceptance "
              f"{stats.acceptance_rate:.4f}")

    rate = accepted / drafted if drafted else 0.0
    row = common.report(
        "longspec", tokens=total_tokens, seconds=total_time,
        extra={"model": args.model, "draft_model": args.draft_model,
               "B": args.B, "prefix_len": args.prefix_len,
               "gamma": args.gamma, "acceptance_rate": round(rate, 4),
               "alpha": round(common.find_alpha(args.gamma, rate), 4)})
    if args.csv:
        common.append_csv(args.csv, row)


if __name__ == "__main__":
    main()
