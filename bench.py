"""Headline benchmark: self-speculation speedup over autoregressive decoding.

Replicates the reference's measurement protocol (SURVEY.md §6;
tests/SnapKV/selfspec_benchmark.py:117,233,272,283): fixed tokens per
sequence, greedy (argmax) acceptance, warmup batch discarded,
tokens/s = generated_tokens / total_time. The headline number is
(spec tokens/s) / (autoregressive tokens/s) at the same batch and prefix —
the quantity the reference publishes (BASELINE.md). The default config uses
the reference's FLAGSHIP prefix (32768; its best published number there is
2.0x, Llama-2-7B B=32 g=4 on 8xA100) at the largest batch whose full KV
cache fits ONE v5e chip (B=8 — B=32 at 32k needs 17.2 GB of KV > 15.75 GB
HBM; the reference spans 8 GPUs). Same prefix, smaller batch: both sides of
the ratio are measured at the identical operating point, but note a smaller
batch is more KV-bandwidth-bound per token, which favors speculation — the
vs_baseline ratio against the 8-GPU B=32 row is indicative, not same-batch.

No checkpoints are downloadable in this environment, and random weights give
meaningless (chaotic-argmax) acceptance — so the benchmark TRAINS a real
model on device first (cached across runs under .bench_cache/): an 8-layer
GQA Llama on the mixed-Markov corpus (data/converters.mixed_markov_dataset),
whose held-out acceptance profile matches published language-model numbers
(~0.93 at a 12.5% budget here vs 0.79-0.99 in BASELINE.md). Evaluation data
is held out (different seed): acceptance reflects true in-context behavior.

Prints ONE JSON line:
  {"metric": ..., "value": spec/AR tokens-per-s ratio, "unit": "x",
   "vs_baseline": value / REFERENCE_SPEEDUP}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax

# persistent XLA compile cache: the flagship fused-generation programs cost
# minutes to compile cold (measured 415 s for the AR while-loop at P=32k
# through the remote-compile path) and seconds warm; cache survives across
# bench invocations and engines
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent / ".bench_cache"
                      / "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

# the reference's BEST published number, at its flagship PREFIX (32000):
# 2.0x, Llama-2-7B self-spec B=32 g=4 on 8xA100 (BASELINE.md, index.html
# table1). The default config below matches the prefix but runs B=8 — the
# largest batch whose KV fits one v5e chip (see module docstring) — so
# vs_baseline compares across batch sizes, indicative rather than same-batch.
REFERENCE_SPEEDUP = 2.0

BENCH_MODEL = dict(block_size=8192, vocab_size=4096, n_layer=8, n_head=16,
                   n_kv_head=8, dim=1024, intermediate_size=2816,
                   rope_base=500000.0, tie_word_embeddings=True)
# the standalone-draft tier (reference longspec: Llama-2-7B + TinyLlama-1.1B,
# BASELINE.md 1.29-1.91x): ~1/8 the target's params, same corpus
BENCH_DRAFT = dict(block_size=8192, vocab_size=4096, n_layer=4, n_head=8,
                   n_kv_head=4, dim=512, intermediate_size=1408,
                   rope_base=500000.0, tie_word_embeddings=True)
# deeper tier (VERDICT r1 #7: harden the headline): 2x the layers
BENCH_DEEP = dict(BENCH_MODEL, n_layer=16)
CACHE_DIR = Path(__file__).resolve().parent / ".bench_cache"


def get_bench_model(train_seq: int, steps: int, seed: int,
                    spec: dict | None = None, tag: str = ""):
    from magicdec_tpu import train as train_lib
    from magicdec_tpu.checkpoint.store import load_params, save_params
    from magicdec_tpu.data.converters import mixed_markov_dataset
    from magicdec_tpu.models import llama
    from magicdec_tpu.models.config import ModelArgs

    config = ModelArgs(**(spec or BENCH_MODEL))
    CACHE_DIR.mkdir(exist_ok=True)
    ckpt = CACHE_DIR / f"bench_model{tag}_s{train_seq}_t{steps}_seed{seed}.npz"
    like = jax.eval_shape(
        lambda k: llama.init_params(k, config, jnp.bfloat16),
        jax.random.PRNGKey(0))
    if ckpt.exists():
        return load_params(str(ckpt), like=like), config
    data = mixed_markov_dataset(seq_len=train_seq, num_seqs=2048, seed=seed)
    params, loss = train_lib.train(config, data, steps=steps, batch=8,
                                   lr=1e-3, seed=seed)
    params = train_lib.cast_params(params, jnp.bfloat16)
    save_params(str(ckpt), params)
    # stdout carries exactly ONE JSON line (the driver contract)
    print(f"# trained bench model: loss {loss:.3f}", file=sys.stderr,
          flush=True)
    return params, config


def get_glide_block(params, config, train_seq: int, steps: int, seed: int,
                    tag: str = ""):
    """Train (or load the cached) GliDe draft block against the frozen bench
    target (reference trains glide with a fused CE loss,
    tests/Quest/longspec_llama_glide.py:492-502)."""
    import jax.numpy as jnp

    from magicdec_tpu import train as train_lib
    from magicdec_tpu.checkpoint.store import load_params, save_params
    from magicdec_tpu.data.converters import mixed_markov_dataset
    from magicdec_tpu.models import glide as glide_lib

    CACHE_DIR.mkdir(exist_ok=True)
    ckpt = CACHE_DIR / f"glide{tag}_s{train_seq}_t{steps}_seed{seed}.npz"
    like = jax.eval_shape(
        lambda k: glide_lib.init_glide_params(k, config),
        jax.random.PRNGKey(0))
    like = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
                        like)
    if ckpt.exists():
        return load_params(str(ckpt), like=like)
    data = mixed_markov_dataset(seq_len=min(train_seq, 1024), num_seqs=1024,
                                seed=seed)
    gp, loss = train_lib.train_glide(params, config, data, steps=steps)
    gp = train_lib.cast_params(gp, jnp.bfloat16)
    save_params(str(ckpt), gp)
    print(f"# trained glide block: loss {loss:.3f}", file=sys.stderr,
          flush=True)
    return gp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=8)
    p.add_argument("--prefix_len", type=int, default=32768)
    p.add_argument("--gen_len", type=int, default=80)
    p.add_argument("--gamma", type=int, default=6)
    p.add_argument("--draft_budget", type=int, default=1024)
    p.add_argument("--window_size", type=int, default=32)
    p.add_argument("--spec", default="snapkv",
                   choices=["snapkv", "streaming", "quest", "retro",
                            "squeeze", "glide", "glide_tree"])
    p.add_argument("--tree", default="3,2,2",
                   help="glide_tree branching factors (comma-separated)")
    p.add_argument("--glide_train_steps", type=int, default=800)
    p.add_argument("--two_model", action="store_true",
                   help="standalone-draft SD: a trained 4L/512d draft tier "
                        "speculates, the target verifies (reference "
                        "longspec_benchmark; --spec then selects the "
                        "DRAFT's KV compression, snapkv/streaming only)")
    p.add_argument("--batches", type=int, default=3,
                   help="batches per mode; the first is compile warmup")
    p.add_argument("--quant", default=None, choices=[None, "int8", "int4"],
                   help="weight-only quantization for BOTH baseline and spec "
                        "(reference --quantize parity); KV stays bf16")
    p.add_argument("--train_steps", type=int, default=1200)
    p.add_argument("--train_seq", type=int, default=2048,
                   help="bench-model training sequence length")
    p.add_argument("--tier", default="base", choices=["base", "deep"],
                   help="bench model size tier (deep = 16L/1024d)")
    p.add_argument("--quest_page", type=int, default=128,
                   help="quest page granularity (smaller pages = finer "
                        "selection, smaller effective budget floor)")
    p.add_argument("--retro_cap", type=int, default=32,
                   help="retro/squeeze cluster capacity (memory rows per "
                        "cluster; larger cap = fewer DMA descriptors per "
                        "round, coarser retrieval)")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes + random weights for CPU smoke testing")
    args = p.parse_args()

    from magicdec_tpu.data.converters import mixed_markov_dataset
    from magicdec_tpu.engine.backend import Engine
    from magicdec_tpu.engine.spec import (generate_autoregressive,
                                          generate_selfspec)
    from magicdec_tpu.models import llama
    from magicdec_tpu.models.config import ModelArgs

    if args.smoke:
        config = ModelArgs.from_name("test-tiny")
        params = llama.init_params(jax.random.PRNGKey(0), config,
                                   dtype=jnp.bfloat16)
        args.B, args.prefix_len, args.gen_len = 2, 256, 16
        args.draft_budget, args.window_size = 64, 16
    else:
        # benchmark prefixes beyond train_seq measure honest length
        # extrapolation, which this corpus supports (acceptance 0.956 at
        # 2048 / 0.961 at 4096 for the seq-1024 model — docs/RESULTS.md)
        spec = BENCH_DEEP if args.tier == "deep" else None
        params, config = get_bench_model(
            train_seq=args.train_seq, steps=args.train_steps, seed=args.seed,
            spec=spec, tag="_deep" if args.tier == "deep" else "")
    if args.quant:
        from magicdec_tpu.quant.int8 import quantize_params
        params = quantize_params(params, args.quant)
    else:
        quantize_params = None

    # held-out evaluation prompts (fresh per-sequence tables, same corpus law)
    batches = [
        jnp.asarray(mixed_markov_dataset(
            seq_len=args.prefix_len, num_seqs=args.B,
            vocab_size=config.vocab_size, seed=10_000 + i))
        for i in range(args.batches)
    ]
    max_len = args.prefix_len + args.gen_len + args.gamma + 8

    # --- autoregressive baseline -------------------------------------------
    engine = Engine(config, params, batch_size=args.B, max_len=max_len,
                    prefill_chunk=128)
    ar_tokens = ar_time = 0.0
    for i, ids in enumerate(batches):
        engine.clear_kv()
        _, st = generate_autoregressive(engine, ids, args.gen_len)
        if i > 0:
            ar_tokens += st.generated_tokens
            ar_time += st.wall_time_s
    del engine
    ar_tps = ar_tokens / ar_time

    # --- speculation ---------------------------------------------------------
    if args.two_model:
        from magicdec_tpu.engine.longspec import LongSpecEngine
        assert args.spec in ("snapkv", "streaming") or not args.draft_budget
        dparams, dconfig = get_bench_model(train_seq=args.train_seq,
                                           steps=args.train_steps,
                                           seed=args.seed, spec=BENCH_DRAFT,
                                           tag="_draft")
        if args.quant:
            dparams = quantize_params(dparams, args.quant)
        target = Engine(config, params, batch_size=args.B, max_len=max_len,
                        prefill_chunk=128)
        dspec = args.spec if args.draft_budget else None
        draft = Engine(dconfig, dparams, batch_size=args.B,
                       max_len=max_len + args.gamma + 8, spec=dspec,
                       draft_budget=args.draft_budget if dspec else 0,
                       window_size=args.window_size, prefill_chunk=128)
        engine = LongSpecEngine(target, draft)

        def run(ids):
            target.clear_kv()
            draft.clear_kv()
            return engine.generate(ids, args.gamma, args.gen_len)
    elif args.spec in ("glide", "glide_tree"):
        # GliDe: 1-layer cross-attention draft block trained against the
        # frozen bench target (cached); linear or static-tree speculation
        from magicdec_tpu.engine.glide_engine import GlideEngine, SpecTree
        from magicdec_tpu.models import glide as glide_lib

        gp = get_glide_block(params, config, train_seq=args.train_seq,
                             steps=args.glide_train_steps, seed=args.seed,
                             tag="_deep" if args.tier == "deep" else "")
        tree = (SpecTree(tuple(int(x) for x in args.tree.split(",")))
                if args.spec == "glide_tree" else None)
        slack = (tree.n_nodes if tree else args.gamma) + 8
        target = Engine(config, params, batch_size=args.B,
                        max_len=args.prefix_len + args.gen_len + slack,
                        prefill_chunk=128)
        engine = GlideEngine(target, gp)

        def run(ids):
            target.clear_kv()
            engine.own_len = jnp.zeros((args.B,), jnp.int32)
            return engine.generate(ids, args.gen_len, gamma=args.gamma,
                                   tree=tree)
    else:
        engine = Engine(config, params, batch_size=args.B, max_len=max_len,
                        spec=args.spec, draft_budget=args.draft_budget,
                        window_size=args.window_size, prefill_chunk=128,
                        retro_cap=args.retro_cap,
                        quest_page=args.quest_page)

        def run(ids):
            engine.clear_kv()
            return generate_selfspec(engine, ids, args.gamma, args.gen_len)

    sp_tokens = sp_time = 0.0
    acc_rates = []
    for i, ids in enumerate(batches):
        _, counts, st = run(ids)
        if i > 0:
            # count every token actually generated (rows past gen_len keep
            # producing while stragglers finish — the reference counts all
            # generated tokens, num_gen_tokens/total_time)
            sp_tokens += st.generated_tokens
            sp_time += st.wall_time_s
            acc_rates.append(st.acceptance_rate)
    sp_tps = sp_tokens / sp_time

    speedup = sp_tps / ar_tps
    result = {
        "metric": ((f"longspec_speedup_{args.spec}" if args.two_model
                    else f"selfspec_speedup_{args.spec}") + f"_B{args.B}"
                   + f"_P{args.prefix_len}_g{args.gamma}"
                   f"_bud{args.draft_budget}"
                   + (f"_t{args.tree.replace(',', '')}"
                      if args.spec == "glide_tree" else "")
                   + (f"_{args.quant}" if args.quant else "")
                   + (f"_cap{args.retro_cap}" if args.retro_cap != 32
                      else "")
                   + (f"_pg{args.quest_page}" if args.quest_page != 128
                      else "")
                   + (f"_{args.tier}" if args.tier != "base" else "")
                   + (f"_ts{args.train_seq}" if args.train_seq != 1024
                      else "")),
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / REFERENCE_SPEEDUP, 4),
        "detail": {
            "autoregressive_tokens_per_s": round(ar_tps, 1),
            "selfspec_tokens_per_s": round(sp_tps, 1),
            "acceptance_rate": round(sum(acc_rates) / len(acc_rates), 4),
            "device": jax.devices()[0].device_kind,
            "model": (f"trained-on-device "
                      f"{config.n_layer}L/{config.dim}d GQA llama "
                      f"(bf16, seq {args.train_seq})"),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
