"""GliDe (cross-attention draft) speculation benchmark: linear and tree.

Parity with the reference's tests/Quest/longspec_llama_glide.py drivers
(spec_generate / tree_spec_generate). The glide block is trained on the fly
against the frozen target unless --glide_ckpt points at a saved one.

Example (single chip, random weights -> low acceptance; structure check):
  python benchmarks/glide_benchmark.py --model test-tiny --B 2 \
      --prefix_len 256 --gen_len 32 --gamma 3 --glide_train_steps 0
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks import common


def main():
    p = common.add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--tree", type=str, default="",
                   help="comma branching, e.g. 4,2,2 -> tree speculation")
    p.add_argument("--glide_ckpt", type=str, default=None)
    p.add_argument("--glide_train_steps", type=int, default=400)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from magicdec_tpu.engine.backend import Engine
    from magicdec_tpu.engine.glide_engine import GlideEngine, SpecTree
    from magicdec_tpu.models import glide as glide_lib

    params, config = common.load_params(args)
    batches = common.load_batches(args, config.vocab_size)

    if args.glide_ckpt:
        from magicdec_tpu.checkpoint.store import load_params
        like = jax.eval_shape(
            lambda k: glide_lib.init_glide_params(k, config),
            jax.random.PRNGKey(0))
        gp = load_params(args.glide_ckpt, like=like)
    elif args.glide_train_steps > 0:
        from magicdec_tpu import train as train_lib
        from magicdec_tpu.data.converters import mixed_markov_dataset
        data = mixed_markov_dataset(seq_len=min(args.prefix_len, 1024),
                                    num_seqs=1024,
                                    vocab_size=config.vocab_size,
                                    seed=args.seed)
        gp, loss = train_lib.train_glide(params, config, data,
                                         steps=args.glide_train_steps)
        print(f"# glide trained: loss {loss:.3f}")
    else:
        gp = glide_lib.init_glide_params(jax.random.PRNGKey(args.seed + 3),
                                         config, scale=0.3)
    gp = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if args.dtype == "bfloat16" else x, gp)

    tree = SpecTree(tuple(int(x) for x in args.tree.split(","))) \
        if args.tree else None
    max_len = args.max_len or (args.prefix_len + args.gen_len
                               + (tree.n_nodes if tree else args.gamma) + 8)

    total_tokens, total_time, drafted, accepted = 0, 0.0, 0, 0
    for i, ids in enumerate(batches):
        target = Engine(config, params, batch_size=args.B, max_len=max_len,
                        prefill_chunk=128)
        eng = GlideEngine(target, gp)
        out, counts, stats = eng.generate(ids, args.gen_len,
                                          gamma=args.gamma, tree=tree)
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
        "glide_tree" if tree else "glide", tokens=total_tokens,
        seconds=total_time,
        extra={"model": args.model, "B": args.B,
               "prefix_len": args.prefix_len, "tree": args.tree or None,
               "gamma": args.gamma, "acceptance_rate": round(rate, 4)})
    if args.csv:
        common.append_csv(args.csv, row)


if __name__ == "__main__":
    main()
