"""Production-shape validation: real model geometries on one v5e chip.

VERDICT r3 #3: every end-to-end number so far rode the ~50M bench model;
this driver runs REAL weight shapes (random weights — no checkpoints in
this environment) where tok/s is meaningful independently of acceptance:

  * llama-3.2-1b (16L/2048d, GQA 32/8, 128K vocab) at long context:
    AR decode, FULL-BUDGET self-spec (bit-exact draft => acceptance is
    forced to 1.0, so spec tok/s is real), and budgeted snapkv spec
    (tok/s at the measured chaotic-argmax acceptance — a lower bound).
  * llama-3.1-8b INT8 (the BASELINE.json north star: 8B int8 @ 16K):
    weight-only int8 halves the 16 GB bf16 weights so model + KV fit
    15.75 GB; AR + full-budget self-spec feasibility row.

Reports tokens/s plus the HBM roofline account (bytes/step = weights +
KV-prefix read + write; v5e ~819 GB/s) — the % column says how close the
whole engine runs to speed-of-light. Usage:
  python benchmarks/production_shape.py --model llama-3.2-1b --B 16 \
      --prefix_len 16384
  python benchmarks/production_shape.py --model llama-3.1-8b --B 2 \
      --prefix_len 16384 --quant int8 --skip_snapkv
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

HBM_GBPS = 819e9  # v5e spec sheet


def param_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(params) if hasattr(x, "size"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="llama-3.2-1b")
    p.add_argument("--B", type=int, default=16)
    p.add_argument("--prefix_len", type=int, default=16384)
    p.add_argument("--gen_len", type=int, default=64)
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--snapkv_budget", type=int, default=1024)
    p.add_argument("--quant", default=None, choices=[None, "int8", "int4"])
    p.add_argument("--skip_snapkv", action="store_true")
    p.add_argument("--skip_fullbudget", action="store_true")
    args = p.parse_args()

    from magicdec_tpu.engine.backend import Engine
    from magicdec_tpu.engine.spec import (generate_autoregressive,
                                          generate_selfspec)
    from magicdec_tpu.models import llama
    from magicdec_tpu.models.config import ModelArgs

    cfg = ModelArgs.from_name(args.model)
    if args.quant:
        # init + quantize on the HOST: the bf16 8B weights (16 GB) exceed
        # HBM before quantization ever runs; only the int8 tree is shipped
        from magicdec_tpu.quant.int8 import quantize_params
        with jax.default_device(jax.devices("cpu")[0]):
            params = llama.init_params(jax.random.PRNGKey(0), cfg,
                                       jnp.bfloat16, scale=0.02)
            params = quantize_params(params, args.quant)
        params = jax.device_put(params, jax.devices()[0])
    else:
        params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16,
                                   scale=0.02)
    wbytes = param_bytes(params)
    B, P, NEW = args.B, args.prefix_len, args.gen_len
    max_len = P + NEW + args.gamma + 8
    HD = cfg.n_kv_head * cfg.head_dim
    kv_gb = 2 * cfg.n_layer * B * (-(-max_len // 128) * 128) * HD * 2 / 1e9
    print(f"# {args.model}: {wbytes/1e9:.2f} GB weights"
          f"{' (' + args.quant + ')' if args.quant else ''}, "
          f"{kv_gb:.2f} GB KV @ B={B} S={max_len}", file=sys.stderr,
          flush=True)

    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                min(cfg.vocab_size, 32000), dtype=jnp.int32)
    rows = []

    def roofline(tps, kv_frac=1.0):
        # bytes per decode step: all weights + the KV prefix read (k+v)
        step_bytes = wbytes + kv_frac * 2 * cfg.n_layer * B * P * HD * 2
        t_step = B / tps
        return (step_bytes / t_step) / HBM_GBPS

    # --- AR ------------------------------------------------------------------
    eng = Engine(cfg, params, batch_size=B, max_len=max_len,
                 prefill_chunk=128)
    t0 = time.perf_counter()
    out, st = generate_autoregressive(eng, prompt, NEW)
    first = time.perf_counter() - t0
    eng.clear_kv()
    out, st = generate_autoregressive(eng, prompt, NEW)
    ar_tps = st.generated_tokens / st.wall_time_s
    rows.append(dict(mode="autoregressive", tokens_per_s=round(ar_tps, 1),
                     hbm_roofline_frac=round(roofline(ar_tps), 3)))
    print(f"# AR {ar_tps:.1f} tok/s ({roofline(ar_tps)*100:.0f}% HBM "
          f"roofline; first run incl compiles {first:.0f}s)",
          file=sys.stderr, flush=True)
    del eng

    # --- full-budget self-spec: acceptance forced 1.0 ------------------------
    # snapkv at budget == P is the lean full-budget mode: the draft cache is
    # dual-written during prefill (streaming's full-budget gather build peaks
    # at target + draft + gather temp ~= 3 cache copies and OOMs at real
    # shapes; measured llama-3.2-1b B=8 P=16384)
    if not args.skip_fullbudget:
        eng = Engine(cfg, params, batch_size=B, max_len=max_len,
                     spec="snapkv", draft_budget=P,
                     prefill_chunk=128)
        eng.clear_kv()
        out, counts, st = generate_selfspec(eng, prompt, args.gamma, NEW)
        eng.clear_kv()
        out, counts, st = generate_selfspec(eng, prompt, args.gamma, NEW)
        sp = st.generated_tokens / st.wall_time_s
        rows.append(dict(mode="selfspec_fullbudget",
                         tokens_per_s=round(sp, 1),
                         acceptance=round(st.acceptance_rate, 4),
                         speedup_vs_ar=round(sp / ar_tps, 3)))
        print(f"# full-budget spec {sp:.1f} tok/s (acc "
              f"{st.acceptance_rate:.3f}) = {sp/ar_tps:.2f}x AR",
              file=sys.stderr, flush=True)
        assert st.acceptance_rate == 1.0, st.acceptance_rate
        del eng

    # --- budgeted snapkv (random-weights acceptance: lower bound) ------------
    if not args.skip_snapkv:
        eng = Engine(cfg, params, batch_size=B, max_len=max_len,
                     spec="snapkv", draft_budget=args.snapkv_budget,
                     prefill_chunk=128)
        eng.clear_kv()
        out, counts, st = generate_selfspec(eng, prompt, args.gamma, NEW)
        eng.clear_kv()
        out, counts, st = generate_selfspec(eng, prompt, args.gamma, NEW)
        sp = st.generated_tokens / st.wall_time_s
        rows.append(dict(mode=f"selfspec_snapkv{args.snapkv_budget}",
                         tokens_per_s=round(sp, 1),
                         acceptance=round(st.acceptance_rate, 4),
                         speedup_vs_ar=round(sp / ar_tps, 3)))
        print(f"# snapkv-{args.snapkv_budget} spec {sp:.1f} tok/s (acc "
              f"{st.acceptance_rate:.3f}) = {sp/ar_tps:.2f}x AR",
              file=sys.stderr, flush=True)

    print(json.dumps(dict(
        model=args.model, quant=args.quant, B=B, prefix_len=P,
        weights_gb=round(wbytes / 1e9, 2), kv_gb=round(kv_gb, 2),
        rows=rows)))


if __name__ == "__main__":
    main()
