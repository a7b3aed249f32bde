"""Headline benchmark: self-speculation speedup over autoregressive decoding.

Replicates the reference's measurement protocol (SURVEY.md §6;
tests/SnapKV/selfspec_benchmark.py:117,233,272,283): fixed number of generated
tokens per sequence, greedy (argmax) acceptance, warmup batches discarded,
`tokens per second = generated_tokens / total_time`. The headline number is
the ratio (spec tokens/s) / (autoregressive tokens/s) at the same batch and
prefix — the quantity the reference publishes (BASELINE.md, up to 2.0x on
8xA100; 1.22x for Llama-3.1-8B B=32 prefill 32000 gamma=3).

Run on one TPU v5e chip. The model is the largest reference-family member
that fits a single chip with a long-context KV cache (llama-3.2-1b, bf16,
seeded random weights — no checkpoints are downloadable in this environment,
so acceptance is measured honestly on the engine's own argmax parity).

Prints ONE JSON line:
  {"metric": ..., "value": tokens_s_ratio, "unit": "x", "vs_baseline": ...}
vs_baseline normalizes against the reference's closest published config
(Llama-3.1-8B self-spec B=32, prefill 32000, gamma=3 on 8xA100: 1.22x).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

REFERENCE_SPEEDUP = 1.22  # BASELINE.md: Llama-3.1-8B selfspec B=32 P=32000 g=3


def build_engine(config, params, args, spec):
    from magicdec_tpu.engine.backend import Engine
    return Engine(config, params, batch_size=args.B,
                  max_len=args.prefix_len + args.gen_len + args.gamma + 8,
                  spec=spec, draft_budget=args.draft_budget if spec else 0,
                  window_size=args.window_size, prefill_chunk=128)


def run_autoregressive(engine, input_ids, gen_len):
    from magicdec_tpu.engine.spec import generate_autoregressive
    _, stats = generate_autoregressive(engine, input_ids, gen_len)
    return stats.generated_tokens, stats.wall_time_s


def run_selfspec(engine, input_ids, gen_len, gamma):
    from magicdec_tpu.engine.spec import generate_selfspec
    _, gen_counts, stats = generate_selfspec(engine, input_ids, gamma, gen_len)
    total = int(jnp.sum(jnp.minimum(gen_counts, gen_len)))
    return total, stats.wall_time_s, stats.acceptance_rate


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="llama-3.2-1b")
    p.add_argument("--B", type=int, default=16)
    p.add_argument("--prefix_len", type=int, default=8192)
    p.add_argument("--gen_len", type=int, default=80)
    p.add_argument("--gamma", type=int, default=3)
    p.add_argument("--draft_budget", type=int, default=512)
    p.add_argument("--window_size", type=int, default=32)
    p.add_argument("--batches", type=int, default=3,
                   help="timed batches per mode (first is warmup, discarded)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes for CPU smoke testing")
    args = p.parse_args()

    if args.smoke:
        args.model, args.B = "test-tiny", 2
        args.prefix_len, args.gen_len, args.draft_budget = 256, 16, 64
        args.window_size = 16

    from magicdec_tpu.models import llama
    from magicdec_tpu.models.config import ModelArgs

    config = ModelArgs.from_name(args.model)
    key = jax.random.PRNGKey(args.seed)
    params = llama.init_params(key, config, dtype=jnp.bfloat16)

    data_key = jax.random.PRNGKey(args.seed + 1)
    batches = [
        jax.random.randint(jax.random.fold_in(data_key, i),
                           (args.B, args.prefix_len), 0, config.vocab_size,
                           dtype=jnp.int32)
        for i in range(args.batches)
    ]

    # --- autoregressive baseline -------------------------------------------
    engine = build_engine(config, params, args, spec=None)
    ar_tokens = ar_time = 0.0
    for i, ids in enumerate(batches):
        engine.clear_kv()
        n, dt = run_autoregressive(engine, ids, args.gen_len)
        if i > 0:  # discard warmup (compile) batch
            ar_tokens += n
            ar_time += dt
    del engine
    ar_tps = ar_tokens / ar_time

    # --- SnapKV self-speculation --------------------------------------------
    engine = build_engine(config, params, args, spec="snapkv")
    sp_tokens = sp_time = 0.0
    acc_rates = []
    for i, ids in enumerate(batches):
        engine.clear_kv()
        n, dt, acc = run_selfspec(engine, ids, args.gen_len, args.gamma)
        if i > 0:
            sp_tokens += n
            sp_time += dt
            acc_rates.append(acc)
    sp_tps = sp_tokens / sp_time

    speedup = sp_tps / ar_tps
    result = {
        "metric": (f"selfspec_speedup_{args.model}_B{args.B}"
                   f"_P{args.prefix_len}_g{args.gamma}_bud{args.draft_budget}"),
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / REFERENCE_SPEEDUP, 4),
        "detail": {
            "autoregressive_tokens_per_s": round(ar_tps, 1),
            "selfspec_tokens_per_s": round(sp_tps, 1),
            "acceptance_rate": round(sum(acc_rates) / len(acc_rates), 4),
            "device": jax.devices()[0].device_kind,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
