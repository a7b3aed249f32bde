"""Host-offload capacity benchmark: context KV larger than HBM, served from
the C++ host cluster store, with the device-resident ClusterLRU block cache.

The capacity config (default B=16, P=65536, 8L/1024d trained bench model)
has a hypothetical full KV cache of 17.2 GB > 15.75 GB v5e HBM — the context
is undeployable on-device and every decode step must retrieve its clusters.
Reference counterpart: RetroInfer's CPU wave buffer + GPU BufferManager block
cache (Engine/RetrievalAttention/library/retroinfer/retroinfer_kernels/src/
wave_buffer_cpu.cpp:48-260) serving decode at contexts beyond GPU memory.

Phases measured (one JSON line on stdout):
  * layer-at-a-time prefill -> host cluster store (wall s)
  * AR offload decode WITH the LRU (the reference's BufferManager serves its
    AR decode too) — tok/s + hit rate
  * SPEC over offload without LRU — tok/s (round-economy alone)
  * SPEC over offload WITH the LRU — tok/s + hit rate + acceptance
The LRU is sized to a fraction of the store (default 88 of 128 clusters per
(layer, sequence)) so hits measure real cross-round reuse, not residency.

Usage: python benchmarks/offload_capacity.py            # capacity config
       python benchmarks/offload_capacity.py --B 2 --prefix_len 8192 \
           --n_clusters 32 --cap 256 --nprobe 8 --gen_len 16   # small drive
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
    p.add_argument("--prefix_len", type=int, default=65536)
    p.add_argument("--n_clusters", type=int, default=128)
    p.add_argument("--cap", type=int, default=512,
                   help="rows per cluster (n_clusters*cap == prefix_len)")
    p.add_argument("--nprobe", type=int, default=16)
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--gen_len", type=int, default=48,
                   help="spec-phase tokens per sequence")
    p.add_argument("--ar_steps", type=int, default=32,
                   help="AR-phase decode steps")
    p.add_argument("--tail_keep", type=int, default=512)
    p.add_argument("--lru_slots", type=int, default=88,
                   help="device block-cache slots per (layer, sequence); "
                        "must be >= the spec round union (gamma+1)*nprobe "
                        "capped at n_clusters")
    p.add_argument("--skip_nolru", action="store_true")
    p.add_argument("--train_seq", type=int, default=2048)
    p.add_argument("--train_steps", type=int, default=1200)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (random weights smoke drive; "
                        "the env var is not honored here — see conftest)")
    args = p.parse_args()
    assert args.n_clusters * args.cap == args.prefix_len
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import get_bench_model
    from magicdec_tpu.data.converters import mixed_markov_dataset
    from magicdec_tpu.engine import offload

    params, config = get_bench_model(train_seq=args.train_seq,
                                     steps=args.train_steps, seed=args.seed)
    B, P = args.B, args.prefix_len
    L = config.n_layer
    HD = config.n_kv_head * config.head_dim
    kv_gb = 2 * L * B * P * HD * 2 / 1e9
    lru_gb = L * B * args.lru_slots * 2 * args.cap * HD * 2 / 1e9
    print(f"# hypothetical full KV {kv_gb:.1f} GB; LRU cache "
          f"{args.lru_slots}/{args.n_clusters} slots = {lru_gb:.1f} GB HBM",
          file=sys.stderr, flush=True)

    prompt = jnp.asarray(mixed_markov_dataset(
        seq_len=P, num_seqs=B, vocab_size=config.vocab_size, seed=10_000))

    store = offload.HostBlockStore(L, B, args.n_clusters, args.cap, HD,
                                   np.asarray(jnp.zeros(0, jnp.bfloat16)).dtype)
    slack = max(args.ar_steps, args.gen_len + args.gamma + 2) + 64
    t0 = time.perf_counter()
    state, buffer0 = offload.offload_prefill(
        params, config, store, prompt, n_clusters=args.n_clusters,
        cap=args.cap, tail_keep=args.tail_keep, tail_slack=slack)
    jax.block_until_ready(buffer0)
    prefill_s = time.perf_counter() - t0
    print(f"# prefill {prefill_s:.0f}s", file=sys.stderr, flush=True)
    rows = dict(prefill_s=round(prefill_s, 1))

    # --- AR offload decode (with LRU — the reference's AR path has one too)
    lru_ar = offload.ClusterLRU(store, nslots=args.lru_slots)
    t0 = time.perf_counter()
    ar_out, _ = offload.offload_generate_hostloop(
        params, config, state, store, buffer0, args.ar_steps,
        nprobe=args.nprobe, cap=args.cap, lru=lru_ar)
    jax.block_until_ready(ar_out)
    ar_s = time.perf_counter() - t0
    ar_tps = B * (args.ar_steps - 1) / ar_s
    rows.update(ar_tokens_per_s=round(ar_tps, 2),
                ar_hit_rate=round(lru_ar.hit_rate, 3))
    print(f"# AR {ar_tps:.2f} tok/s (hit rate {lru_ar.hit_rate:.3f})",
          file=sys.stderr, flush=True)
    del lru_ar

    # --- spec over offload, no LRU (round economy alone) ---------------------
    if not args.skip_nolru:
        t0 = time.perf_counter()
        sp_out, _, st = offload.offload_generate_spec(
            params, config, state, store, buffer0, args.gen_len,
            gamma=args.gamma, nprobe=args.nprobe, cap=args.cap)
        jax.block_until_ready(sp_out)
        sp_s = time.perf_counter() - t0
        sp_tps = st["generated"] / sp_s
        rows.update(spec_nolru_tokens_per_s=round(sp_tps, 2),
                    spec_nolru_speedup=round(sp_tps / ar_tps, 2))
        print(f"# spec (no LRU) {sp_tps:.2f} tok/s = {sp_tps/ar_tps:.2f}x AR",
              file=sys.stderr, flush=True)

    # --- spec over offload, with LRU -----------------------------------------
    lru = offload.ClusterLRU(store, nslots=args.lru_slots)
    t0 = time.perf_counter()
    sp_out, _, st = offload.offload_generate_spec(
        params, config, state, store, buffer0, args.gen_len,
        gamma=args.gamma, nprobe=args.nprobe, cap=args.cap, lru=lru)
    jax.block_until_ready(sp_out)
    sp_s = time.perf_counter() - t0
    sp_tps = st["generated"] / sp_s
    acc = st["accepted_drafts"] / max(st["total_drafted"], 1)
    n_cmp = min(args.ar_steps, sp_out.shape[1])
    match = bool(jnp.all(ar_out[:, :n_cmp] == sp_out[:, :n_cmp]))
    rows.update(spec_lru_tokens_per_s=round(sp_tps, 2),
                spec_lru_speedup=round(sp_tps / ar_tps, 2),
                spec_hit_rate=round(lru.hit_rate, 3),
                acceptance=round(acc, 4),
                stream_matches_ar=match)
    print(f"# spec (LRU) {sp_tps:.2f} tok/s = {sp_tps/ar_tps:.2f}x AR "
          f"(hit {lru.hit_rate:.3f}, acc {acc:.3f}, stream==AR: {match})",
          file=sys.stderr, flush=True)

    print(json.dumps(dict(
        B=B, prefix_len=P, n_clusters=args.n_clusters, cap=args.cap,
        nprobe=args.nprobe, gamma=args.gamma, lru_slots=args.lru_slots,
        kv_gb=round(kv_gb, 1), lru_gb=round(lru_gb, 1), **rows)))


if __name__ == "__main__":
    main()
