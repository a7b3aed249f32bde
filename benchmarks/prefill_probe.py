"""Prefill (encode) timing probe: the chunked-prefill wall time at the
reference drivers' shape (B=128, P=2048, 8L/1024d bench tier by default).

The prefill path under measurement is Engine.encode: per-chunk
prefill_chunk_step programs with power-of-2 attention caps riding
flash_prefill (h-grouped kernel, mask triage, class-0 DMA skip). Weights are
random — prefill time is weight-value-independent.

Usage: python benchmarks/prefill_probe.py [--B 128] [--prefix_len 2048]
       [--tier base|deep] [--reps 3] [--spec none|snapkv]
Prints one JSON line with median encode ms.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=128)
    p.add_argument("--prefix_len", type=int, default=2048)
    p.add_argument("--tier", default="base", choices=["base", "deep"])
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--spec", default="none", choices=["none", "snapkv"])
    p.add_argument("--draft_budget", type=int, default=128)
    p.add_argument("--prefill_chunk", type=int, default=128)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (JAX_PLATFORMS is NOT "
                        "honored: sitecustomize pre-imports jax on axon)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench
    from magicdec_tpu.engine.backend import Engine
    from magicdec_tpu.models import llama
    from magicdec_tpu.models.config import ModelArgs

    cfg = ModelArgs(**(bench.BENCH_MODEL if args.tier == "base"
                       else bench.BENCH_DEEP))
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16,
                               scale=0.02)
    B, P = args.B, args.prefix_len
    eng = Engine(cfg, params, batch_size=B, max_len=P + 128,
                 prefill_chunk=args.prefill_chunk,
                 spec=None if args.spec == "none" else args.spec,
                 draft_budget=args.draft_budget)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                cfg.vocab_size, dtype=jnp.int32)

    times = []
    for r in range(args.reps + 1):           # rep 0 = compile warmup
        eng.clear_kv()
        t0 = time.perf_counter()
        tok = eng.encode(prompt)
        jax.block_until_ready(tok)
        dt = (time.perf_counter() - t0) * 1e3
        if r > 0:
            times.append(dt)
        print(f"# encode rep{r}: {dt:.1f} ms", file=sys.stderr, flush=True)
    times.sort()
    med = times[len(times) // 2]
    print(json.dumps(dict(metric="prefill_ms", B=B, prefix_len=P,
                          tier=args.tier, spec=args.spec,
                          chunk=args.prefill_chunk,
                          median_ms=round(med, 1),
                          all_ms=[round(t, 1) for t in times])))


if __name__ == "__main__":
    main()
