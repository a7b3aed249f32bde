"""Continuous-batching throughput: ServeEngine vs static batching.

Serves N mixed-length requests (uniform prompt P, max_new drawn cyclically
from a spread) two ways and prints one JSON line:
  * static: requests grouped in arrival order into batches of B; each batch
    runs generate_selfspec to its LONGEST member's budget (the fixed-batch
    discipline every reference driver uses) — short requests ride along as
    dead rows until the batch drains.
  * serve:  ServeEngine recycles rows at round granularity.
Useful tokens = sum over requests of the tokens that request asked for;
throughput = useful tokens / wall (prefill included for both sides).

Usage: python benchmarks/serve_benchmark.py --B 16 --prefix_len 2048 \
           --n_requests 48
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent
                      / ".bench_cache" / "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=16)
    p.add_argument("--prefix_len", type=int, default=2048)
    p.add_argument("--n_requests", type=int, default=48)
    p.add_argument("--gamma", type=int, default=6)
    p.add_argument("--draft_budget", type=int, default=128)
    p.add_argument("--new_spread", default="16,32,48,64,96,128",
                   help="max_new_tokens per request, cycled")
    p.add_argument("--train_seq", type=int, default=2048)
    p.add_argument("--train_steps", type=int, default=1200)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import get_bench_model
    from magicdec_tpu.data.converters import mixed_markov_dataset
    from magicdec_tpu.engine.backend import Engine
    from magicdec_tpu.engine.serve import Request, ServeEngine
    from magicdec_tpu.engine.spec import generate_selfspec

    params, config = get_bench_model(train_seq=args.train_seq,
                                     steps=args.train_steps, seed=args.seed)
    B, P, N = args.B, args.prefix_len, args.n_requests
    spread = [int(x) for x in args.new_spread.split(",")]
    new_lens = [spread[i % len(spread)] for i in range(N)]
    cap = max(spread)
    prompts = np.asarray(mixed_markov_dataset(
        seq_len=P, num_seqs=N, vocab_size=config.vocab_size, seed=10_000))
    useful = sum(new_lens)
    max_len = P + cap + args.gamma + 8

    # --- static batching ------------------------------------------------------
    eng = Engine(config, params, batch_size=B, max_len=max_len,
                 spec="snapkv", draft_budget=args.draft_budget,
                 prefill_chunk=128)
    # warmup batch (compile discard, the repo's bench protocol)
    eng.clear_kv()
    generate_selfspec(eng, jnp.asarray(prompts[:B]), args.gamma, cap)
    t0 = time.perf_counter()
    for g0 in range(0, N, B):
        idx = list(range(g0, min(g0 + B, N)))
        idx += [idx[-1]] * (B - len(idx))            # pad the last group
        eng.clear_kv()
        budget = max(new_lens[i] for i in idx)
        out, counts, st = generate_selfspec(eng, jnp.asarray(prompts[idx]),
                                            args.gamma, budget)
    static_s = time.perf_counter() - t0
    static_tps = useful / static_s
    print(f"# static  {static_tps:.1f} useful tok/s ({static_s:.1f}s)",
          file=sys.stderr, flush=True)
    del eng

    # --- continuous batching --------------------------------------------------
    srv = ServeEngine(config, params, batch_size=B, max_len=max_len,
                      draft_budget=args.draft_budget, gamma=args.gamma,
                      max_new_cap=cap, prefill_chunk=128)
    # warmup: one tiny request compiles stage-prefill + install + round
    srv.run([Request(-1, prompts[0], spread[0])])
    t0 = time.perf_counter()
    done = srv.run([Request(i, prompts[i], new_lens[i]) for i in range(N)])
    serve_s = time.perf_counter() - t0
    got = sum(len(c.tokens) for c in done)
    serve_tps = got / serve_s
    print(f"# serve   {serve_tps:.1f} useful tok/s ({serve_s:.1f}s, "
          f"{srv.rounds} rounds)", file=sys.stderr, flush=True)

    print(json.dumps(dict(
        B=B, prefix_len=P, n_requests=N, new_spread=spread,
        static_useful_tokens_per_s=round(static_tps, 1),
        serve_useful_tokens_per_s=round(serve_tps, 1),
        serve_over_static=round(serve_tps / static_tps, 3))))


if __name__ == "__main__":
    main()
