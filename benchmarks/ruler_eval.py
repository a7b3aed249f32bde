"""RULER task-accuracy eval: budget drafting must preserve task quality.

The losslessness invariant proves the EMITTED STREAM is unchanged; this
driver closes the remaining quality loop (VERDICT r3 missing #4, reference
harness: Engine/RetrievalAttention/benchmark/LongBench/eval.py + the RULER
suite): train a model ON the hermetic RULER task (a small decoder learns
niah retrieval through induction heads in a few hundred steps), then score
every engine's generated answers with exact match (data/ruler.score).
Lossless engines must score IDENTICALLY to the autoregressive baseline;
approximate modes (GliDe TREE verification on TPU, which may deviate at
numerical near-ties) are quantified by their score delta instead of a
bit-equality claim.

Usage: python benchmarks/ruler_eval.py [--task niah] [--seq_len 512]
       [--engines snapkv,streaming,quest,retro,squeeze]
Prints ONE JSON line: {"task", "baseline_acc", "engines": {name: acc}}.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent
                      / ".bench_cache" / "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

RULER_MODEL = dict(block_size=4096, vocab_size=4096, n_layer=4, n_head=8,
                   n_kv_head=4, dim=512, intermediate_size=1408,
                   rope_base=500000.0, tie_word_embeddings=True)


def get_ruler_model(task: str, seq_len: int, steps: int, seed: int):
    from magicdec_tpu import train as train_lib
    from magicdec_tpu.checkpoint.store import load_params, save_params
    from magicdec_tpu.data import ruler
    from magicdec_tpu.models import llama
    from magicdec_tpu.models.config import ModelArgs

    config = ModelArgs(**RULER_MODEL)
    cache_dir = Path(__file__).resolve().parent.parent / ".bench_cache"
    cache_dir.mkdir(exist_ok=True)
    ckpt = cache_dir / f"ruler_{task}_s{seq_len}_t{steps}_seed{seed}.npz"
    like = jax.eval_shape(
        lambda k: llama.init_params(k, config, jnp.bfloat16),
        jax.random.PRNGKey(0))
    if ckpt.exists():
        return load_params(str(ckpt), like=like), config
    # training sequences: prompt (seq_len - alen) + gold answer appended, so
    # the LM learns to emit the answer after [QUERY key SEP]
    probe_p, probe_a = ruler.prepare(task, 64, 1, seed=0)
    alen = probe_a.shape[1]
    prompts, answers = ruler.prepare(task, seq_len - alen, 2048, seed=seed)
    data = np.concatenate([prompts, answers], axis=1)
    params, loss = train_lib.train(config, jnp.asarray(data), steps=steps,
                                  batch=16, lr=1e-3, seed=seed)
    params = train_lib.cast_params(params, jnp.bfloat16)
    save_params(str(ckpt), params)
    print(f"# trained ruler model: loss {loss:.3f}", file=sys.stderr,
          flush=True)
    return params, config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="niah", choices=["niah", "qa",
                                                      "variable_tracking"])
    p.add_argument("--seq_len", type=int, default=512,
                   help="prompt length (multiple of 128)")
    p.add_argument("--B", type=int, default=32)
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--draft_budget", type=int, default=256)
    p.add_argument("--train_steps", type=int, default=1500)
    p.add_argument("--engines",
                   default="snapkv,streaming,quest,retro,squeeze")
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    from magicdec_tpu.data import ruler
    from magicdec_tpu.engine.backend import Engine
    from magicdec_tpu.engine.spec import (generate_autoregressive,
                                          generate_selfspec)

    params, config = get_ruler_model(args.task, args.seq_len,
                                     args.train_steps, args.seed)
    probe_p, probe_a = ruler.prepare(args.task, 64, 1, seed=0)
    alen = probe_a.shape[1]
    # held-out eval prompts (different seed); pad prompts to a chunk multiple
    prompts, answers = ruler.prepare(args.task, args.seq_len, args.B,
                                     seed=args.seed + 10_000)
    max_len = args.seq_len + alen + args.gamma + 8

    eng = Engine(config, params, batch_size=args.B, max_len=max_len,
                 prefill_chunk=128)
    base_out, _ = generate_autoregressive(eng, prompts, alen)
    base_acc = ruler.score(args.task, np.asarray(base_out), answers)
    del eng
    result = {"task": args.task, "seq_len": args.seq_len,
              "baseline_acc": round(base_acc, 4), "engines": {}}
    print(f"# baseline acc {base_acc:.3f}", file=sys.stderr, flush=True)

    for name in args.engines.split(","):
        eng = Engine(config, params, batch_size=args.B, max_len=max_len,
                     spec=name, draft_budget=args.draft_budget,
                     window_size=32, latest_k=128, prefill_chunk=128)
        out, counts, st = generate_selfspec(eng, prompts, args.gamma, alen)
        acc = ruler.score(args.task, np.asarray(out), answers)
        result["engines"][name] = {
            "acc": round(acc, 4),
            "acceptance": round(st.acceptance_rate, 4)}
        flag = "" if acc == base_acc else "  <-- DIFFERS"
        print(f"# {name}: acc {acc:.3f} (acceptance "
              f"{st.acceptance_rate:.3f}){flag}", file=sys.stderr, flush=True)
        del eng

    print(json.dumps(result))


if __name__ == "__main__":
    main()
