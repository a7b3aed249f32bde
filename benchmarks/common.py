"""Shared plumbing for the benchmark CLI drivers.

The reference's drivers (tests/baseline_benchmark.py, tests/{SnapKV,
StreamingLLM}/selfspec_benchmark.py) share argparse conventions, a dataloader
over fixed-length token tensors, a warmup-discard timing protocol and final
tokens/s + acceptance + alpha reporting. This module centralizes those.

Measurement protocol (reference tests/SnapKV/selfspec_benchmark.py:117-283):
  * fixed number of generated tokens per sequence (default 80 here, to match
    BASELINE.md);
  * the first `warmup` batches are excluded from the timers (compile warmup);
  * tokens per second = generated_tokens / total_time;
  * acceptance rate = accepted draft tokens / drafted tokens; per-token alpha
    via bisection of (1 - a^(g+1))/(1 - a) - 1 = g * r (find_alpha.py:4-30).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp


def add_common_args(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    p.add_argument("--model", type=str, default="llama-3.2-1b",
                   help="config name or HF checkpoint dir (models/config.py)")
    p.add_argument("--model_name", type=str, default=None,
                   help="override config lookup name (reference --model_name)")
    p.add_argument("--B", type=int, default=8, help="batch size")
    p.add_argument("--prefix_len", type=int, default=4096,
                   help="prompt tokens per sequence (multiple of 128)")
    p.add_argument("--max_len", type=int, default=None,
                   help="cache capacity; default prefix_len + gen_len + slack")
    p.add_argument("--gen_len", type=int, default=80,
                   help="tokens generated per sequence (reference uses 80)")
    p.add_argument("--dataset", type=str, default="random",
                   help="random | pg19 | a .npy/.npz file of token ids")
    p.add_argument("--benchmark", action="store_true",
                   help="run the warmup-discard timing protocol")
    p.add_argument("--num_batches", type=int, default=10)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel size (0 = all visible devices)")
    p.add_argument("--dp", type=int, default=1, help="data-parallel size")
    p.add_argument("--printoutput", action="store_true")
    p.add_argument("--csv", type=str, default=None,
                   help="append a result row to this CSV file")
    return p


def load_params(args, config=None):
    """Checkpoint if --model is a directory, else seeded random weights."""
    from magicdec_tpu.models import llama
    from magicdec_tpu.models.config import ModelArgs

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    name = args.model_name or args.model
    if os.path.isdir(args.model):
        from magicdec_tpu.checkpoint.convert_hf import load_hf_checkpoint
        cfg = ModelArgs.from_name(name) if config is None else config
        params, cfg = load_hf_checkpoint(args.model, cfg, dtype=dtype)
        return params, cfg
    cfg = ModelArgs.from_name(name) if config is None else config
    params = llama.init_params(jax.random.PRNGKey(args.seed), cfg, dtype=dtype)
    return params, cfg


def make_mesh_or_none(args):
    if args.tp == 0 and args.dp == 1 and len(jax.devices()) == 1:
        return None
    from magicdec_tpu.parallel import sharding as shard_lib
    tp = args.tp or (len(jax.devices()) // args.dp)
    return shard_lib.make_mesh(dp=args.dp, tp=tp)


def load_batches(args, vocab_size: int):
    """Token batches [B, prefix_len]; `random` needs no datasets/network."""
    if args.dataset == "random":
        key = jax.random.PRNGKey(args.seed + 1)
        return [jax.random.randint(jax.random.fold_in(key, i),
                                   (args.B, args.prefix_len), 0, vocab_size,
                                   dtype=jnp.int32)
                for i in range(args.num_batches)]
    if args.dataset.endswith((".npy", ".npz")):
        import numpy as np
        arr = np.load(args.dataset)
        if hasattr(arr, "files"):
            arr = arr[arr.files[0]]
        toks = jnp.asarray(arr, jnp.int32)
        n = (toks.shape[0] // args.B) * args.B
        toks = toks[:n, :args.prefix_len].reshape(-1, args.B, args.prefix_len)
        return list(toks[:args.num_batches])
    if args.dataset == "mixed_markov":
        from magicdec_tpu.data.converters import mixed_markov_dataset
        return [jnp.asarray(mixed_markov_dataset(
            seq_len=args.prefix_len, num_seqs=args.B,
            vocab_size=min(vocab_size, 4096), seed=args.seed + 10_000 + i))
            for i in range(args.num_batches)]
    if args.dataset.startswith("ruler:"):
        from magicdec_tpu.data import ruler
        prompts, _ = ruler.prepare(args.dataset.split(":", 1)[1],
                                   args.prefix_len,
                                   args.B * args.num_batches,
                                   vocab_size=min(vocab_size, 4096),
                                   seed=args.seed)
        ds = prompts.reshape(-1, args.B, args.prefix_len)
        return [jnp.asarray(x, jnp.int32) for x in ds[:args.num_batches]]

    def chunked(ds):
        n = (ds.shape[0] // args.B) * args.B
        ds = ds[:n].reshape(-1, args.B, ds.shape[-1])
        return [jnp.asarray(x, jnp.int32) for x in ds[:args.num_batches]]

    from magicdec_tpu.data import converters as C
    if args.dataset == "pg19":
        return chunked(C.convert_pg19_dataset(seq_len=args.prefix_len))
    if args.dataset == "c4":
        return chunked(C.convert_c4_dataset(seq_len=args.prefix_len))
    if args.dataset == "wiki":
        return chunked(C.convert_wiki_dataset(seq_len=args.prefix_len))
    if args.dataset == "cnn":
        return chunked(C.convert_cnn_dataset(seq_len=args.prefix_len))
    if args.dataset.startswith("longbench:"):
        task = args.dataset.split(":", 1)[1]
        return chunked(C.convert_longbench_v1_dataset(task, args.prefix_len))
    if args.dataset == "longbench_v2":
        return chunked(C.convert_longbench_v2_dataset(args.prefix_len))
    raise ValueError(f"unknown dataset {args.dataset!r}")


def find_alpha(gamma: int, rate: float, tol: float = 1e-6) -> float:
    from magicdec_tpu.analysis import find_alpha as _fa
    return _fa(gamma, rate, tol)


def append_csv(path: str, row: dict):
    p = Path(path)
    new = not p.exists()
    with p.open("a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row))
        if new:
            w.writeheader()
        w.writerow(row)


def report(tag: str, *, tokens: int, seconds: float, extra: dict | None = None):
    tps = tokens / seconds if seconds else float("nan")
    line = {"bench": tag, "tokens": tokens, "seconds": round(seconds, 4),
            "tokens_per_s": round(tps, 2), **(extra or {})}
    print(json.dumps(line))
    return line


class PhaseTimer:
    """Wall-clock phase buckets, the reference's draft/verify/loop timing
    (tests/SnapKV/selfspec_benchmark.py:153-171) without per-step syncs."""

    def __init__(self):
        self.buckets: dict[str, float] = {}

    def measure(self, name: str, fn, *a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        self.buckets[name] = self.buckets.get(name, 0.0) + time.perf_counter() - t0
        return out
