"""Engine: the runtime layer owning KV state and jitted step functions.

TPU-native analog of the reference's LMBackend (Engine/SnapKV/backend.py,
Engine/StreamingLLM/backend.py): where the reference mutates page-table tensors
and re-plans flashinfer wrappers before every forward, this Engine holds
immutable cache pytrees and calls jitted pure step functions — XLA's
fixed-shape compilation provides what torch.compile + CUDA graphs provide
there, and re-"plan" is free because raggedness is carried in length vectors.

Public surface (parity with LMBackend):
  encode(input_ids)        chunked prefill (+ SnapKV/StreamingLLM draft build)
  inference(tokens)        target decode/verify without draft writes
  speculate(tokens)        one draft step (gamma-loop lives in engine/spec.py)
  verify(tokens)           target verify, dual-writing the draft cache (SnapKV)
  rollback/advance         pure length arithmetic on cache state
  clear_kv()               reset lengths (buffers are reused)

Speculation modes: spec=None (baseline), "snapkv", "streaming".
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from magicdec_tpu import cache as cache_lib
from magicdec_tpu.cache import DraftKVCache, KVCache
from magicdec_tpu.engine import attention_impls as impls
from magicdec_tpu.engine.sampling import argmax_tokens
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs


# ---------------------------------------------------------------------------
# Pure step functions (jitted per static config)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("config", "last_only", "cap", "mesh"),
                   donate_argnames=("cache",))
def prefill_chunk_step(params, config: ModelArgs, cache: KVCache, tokens,
                       last_only: bool = True, cap: int | None = None,
                       mesh=None, start=None):
    """`start` (traced int32 scalar, optional): uniform chunk offset — every
    sequence prefills the same prompt length, so the append collapses to one
    dynamic_update_slice and the rope tables to [1, T] (see target_attn)."""
    impl = impls.target_attn(config, cache.lengths, cap=cap, mesh=mesh,
                             uniform_start=start)
    logits, (ck, cv) = llama.forward(params, config, tokens, impl,
                                     (cache.k, cache.v), last_only=last_only)
    new_cache = KVCache(ck, cv, cache.lengths + tokens.shape[1])
    return argmax_tokens(logits), new_cache


def _pow2_cap(frontier: int, max_len: int) -> int:
    """Power-of-2 attention bound >= the chunk's causal frontier: early
    prefill chunks then neither read nor compute over the whole max_len
    cache, while shapes stay bucketed (<= log2 compile variants)."""
    cap = 128
    while cap < frontier:
        cap *= 2
    return min(cap, max_len)


@functools.partial(jax.jit,
                   static_argnames=("config", "context_len", "budget",
                                    "window", "mesh"),
                   donate_argnames=("cache", "draft"))
def prefill_last_chunk_snapkv_step(params, config: ModelArgs, cache: KVCache,
                                   draft: DraftKVCache, tokens,
                                   context_len: int, budget: int, window: int,
                                   mesh=None, start=None):
    """Final prefill chunk + SnapKV draft-cache construction."""
    impl = impls.prefill_snapkv_attn(config, cache.lengths, context_len,
                                     budget, window,
                                     cap=_pow2_cap(context_len, cache.max_len),
                                     mesh=mesh, uniform_start=start)
    logits, (ck, cv, dk, dv) = llama.forward(
        params, config, tokens, impl, (cache.k, cache.v, draft.k, draft.v),
        last_only=True)
    new_cache = KVCache(ck, cv, cache.lengths + tokens.shape[1])
    new_draft = DraftKVCache(dk, dv,
                             jnp.full_like(draft.lengths, budget),
                             draft.evicted)
    return argmax_tokens(logits), new_cache, new_draft


@functools.partial(jax.jit, static_argnames=("config", "budget", "sink"),
                   donate_argnames=("draft",))
def build_streaming_draft_step(config: ModelArgs, cache: KVCache,
                               draft: DraftKVCache, budget: int, sink: int):
    """Construct the StreamingLLM draft cache from the target cache.

    TPU-native shortcut over the reference's separate chunked draft prefill
    (Engine/StreamingLLM/backend.py:233-298): for SELF-speculation the draft
    shares the target weights, and the draft cache stores K rotated at its
    original position (see attention_impls.streaming_draft_attn), so the
    sink + recent-window K/V can be gathered from the target cache verbatim.
    """
    B = cache.lengths.shape[0]
    keep = jnp.minimum(cache.lengths, budget)            # [B]
    slot = jnp.arange(draft.size, dtype=jnp.int32)[None, :].repeat(B, 0)
    # source slot in the target cache: sink slots map identity; window slots
    # map to the tail of the prefix
    win_src = cache.lengths[:, None] - (keep[:, None] - slot)
    src = jnp.where(slot < sink, slot, win_src)
    src = jnp.clip(src, 0, cache.max_len - 1)

    def per_layer(k_l, v_l):  # [B, S, H*D]
        take = jax.vmap(lambda a, i: a[i])
        return take(k_l, src), take(v_l, src)

    dk, dv = jax.vmap(per_layer)(cache.k, cache.v)
    dk = dk.astype(draft.k.dtype)
    dv = dv.astype(draft.v.dtype)
    return DraftKVCache(dk, dv, keep, jnp.maximum(cache.lengths - keep, 0))


@functools.partial(jax.jit, static_argnames=("config", "mesh"),
                   donate_argnames=("cache",))
def target_decode_step(params, config: ModelArgs, cache: KVCache, tokens,
                       mesh=None):
    """Decode/verify WITHOUT draft writes (baseline + StreamingLLM verify)."""
    impl = impls.target_attn(config, cache.lengths, mesh=mesh)
    logits, (ck, cv) = llama.forward(params, config, tokens, impl,
                                     (cache.k, cache.v),
                                     fused=llama.fused_for_mesh(mesh))
    new_cache = KVCache(ck, cv, cache.lengths + tokens.shape[1])
    return argmax_tokens(logits), new_cache


@functools.partial(jax.jit, static_argnames=("config", "mesh"),
                   donate_argnames=("cache", "draft"))
def verify_dual_step(params, config: ModelArgs, cache: KVCache,
                     draft: DraftKVCache, tokens, mesh=None):
    """SnapKV verify: target attention, k/v appended to BOTH caches at the
    round-start draft offset (overwrite of spec-written entries — reference
    pre_verify/Attention.verify semantics, Engine/SnapKV/backend.py:182-199)."""
    impl = impls.verify_dual_attn(config, cache.lengths, draft.lengths,
                                  mesh=mesh)
    logits, (ck, cv, dk, dv) = llama.forward(
        params, config, tokens, impl, (cache.k, cache.v, draft.k, draft.v),
        fused=llama.fused_for_mesh(mesh))
    T = tokens.shape[1]
    new_cache = KVCache(ck, cv, cache.lengths + T)
    new_draft = DraftKVCache(dk, dv, draft.lengths + T, draft.evicted)
    return argmax_tokens(logits), new_cache, new_draft


@functools.partial(jax.jit, static_argnames=("config", "mesh"),
                   donate_argnames=("draft",))
def draft_decode_snapkv_step(params, config: ModelArgs, draft: DraftKVCache,
                             tokens, position_base, mesh=None):
    """One SnapKV draft step; queries rotate at true absolute positions."""
    impl = impls.snapkv_draft_attn(config, position_base, draft.lengths,
                                   mesh=mesh)
    logits, (dk, dv) = llama.forward(params, config, tokens, impl,
                                     (draft.k, draft.v),
                                     fused=llama.fused_for_mesh(mesh))
    new_draft = DraftKVCache(dk, dv, draft.lengths + tokens.shape[1],
                             draft.evicted)
    return argmax_tokens(logits), new_draft


@functools.partial(jax.jit,
                   static_argnames=("config", "budget", "sink", "mesh"),
                   donate_argnames=("draft",))
def draft_decode_streaming_step(params, config: ModelArgs, draft: DraftKVCache,
                                tokens, budget: int, sink: int, mesh=None):
    """One StreamingLLM draft step (original-position K store, delta-rope read)."""
    impl = impls.streaming_draft_attn(config, draft.lengths, draft.evicted,
                                      budget, sink, mesh=mesh)
    logits, (dk, dv) = llama.forward(params, config, tokens, impl,
                                     (draft.k, draft.v),
                                     fused=llama.fused_for_mesh(mesh))
    new_draft = DraftKVCache(dk, dv, draft.lengths + tokens.shape[1],
                             draft.evicted)
    return argmax_tokens(logits), new_draft


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

class Engine:
    def __init__(self, config: ModelArgs, params, *, batch_size: int,
                 max_len: int, spec: Optional[str] = None, draft_budget: int = 0,
                 window_size: int = 32, sink_size: int = 16,
                 latest_k: int = 128, draft_headroom: int = 64,
                 quest_page: int = 128,
                 prefill_chunk: int = 128, kv_dtype=None, mesh=None,
                 replicate_tp: bool = False,
                 retro_clusters: int = 0, retro_cap: int = 32,
                 squeeze_threshold: float = 0.01):
        assert spec in (None, "snapkv", "streaming", "quest", "retro",
                        "squeeze"), spec
        if spec:
            assert draft_budget > 0
        self.config = config
        self.params = params
        self.batch_size = batch_size
        # page/tile alignment (also Quest's page-metadata granularity)
        self.max_len = -(-max_len // 128) * 128
        self.spec = spec
        self.draft_budget = draft_budget
        self.window_size = window_size
        self.sink_size = sink_size
        self.latest_k = latest_k
        self.quest_page = quest_page
        self.retro_cap = retro_cap
        # reference sizing is n_clusters = ctx/16 (RetrievalAttention
        # benchmark/config.py:17-56); ctx/32 with cap=32 halves it so the
        # KV-fused cluster-major store is cache-sized (C*2cap == 2*ctx
        # rows) — ctx/16 OOMs next to the live cache at B=128/P=2048
        self.retro_clusters = retro_clusters or max(max_len // 32, 8)
        self.squeeze_threshold = squeeze_threshold
        self.prefill_chunk = prefill_chunk
        self.draft_headroom = draft_headroom
        if kv_dtype is None:
            w = params["layers"]["wqkv"]
            kv_dtype = w.dtype if hasattr(w, "dtype") else jnp.bfloat16
        self.kv_dtype = kv_dtype

        c = config
        self.mesh = mesh
        # replicate_tp: asymmetric-TP draft — weights/caches replicated over
        # the tp axis (draft TP degree 1, parallel/sharding.py docstring)
        self.replicate_tp = replicate_tp
        if mesh is not None:
            from magicdec_tpu.parallel import sharding as shard_lib
            self.params = shard_lib.shard_params(params, mesh, config,
                                                 replicate_tp=replicate_tp)
            # the flash kernels run under jax.shard_map on >1-device meshes
            # (attention is per-KV-head: a dpxtp shard needs no collectives)
            # — see attention_impls._flash_stacked/_flash_intervals.
        self._create_cache()
        # quest/retro/squeeze retrieval state, built at encode() (prefill)
        # time like the reference's prefill-time clustering/metadata
        self.spec_index = None
        self.draft: Optional[DraftKVCache] = None
        # quest/retro/squeeze draft straight out of the target cache
        if spec and spec not in ("quest", "retro", "squeeze"):
            self.draft = DraftKVCache.create(
                c.n_layer, batch_size, draft_budget + draft_headroom,
                c.n_kv_head, c.head_dim, kv_dtype)
            if mesh is not None:
                from magicdec_tpu.parallel import sharding as shard_lib
                self.draft = shard_lib.shard_cache(self.draft, mesh,
                                                   self.replicate_tp)

    def _create_cache(self):
        c = self.config
        self.cache = KVCache.create(c.n_layer, self.batch_size, self.max_len,
                                    c.n_kv_head, c.head_dim, self.kv_dtype)
        if self.mesh is not None:
            from magicdec_tpu.parallel import sharding as shard_lib
            self.cache = shard_lib.shard_cache(self.cache, self.mesh,
                                               self.replicate_tp)

    def drop_cache(self):
        """Free the target-cache buffers (recreated at the next encode).
        Used by LongSpecEngine: a compressed standalone draft only needs its
        budget cache after prefill."""
        self.cache = None

    def _tokens(self, t) -> jax.Array:
        t = jnp.asarray(t, jnp.int32)
        if self.mesh is not None:
            from magicdec_tpu.parallel.sharding import shard_tokens
            t = shard_tokens(t, self.mesh)
        return t

    # -- prefill ------------------------------------------------------------

    def encode(self, input_ids) -> jax.Array:
        """Chunked prefill; returns the first generated token [B, 1].

        Matches LMBackend.encode (Engine/SnapKV/backend.py:231-268): fixed-size
        chunks bound activation memory; the last chunk builds the SnapKV draft
        cache; StreamingLLM instead gathers its draft cache from the target
        cache afterwards.
        """
        if self.cache is None:
            self._create_cache()
        input_ids = self._tokens(input_ids)
        B, P = input_ids.shape
        assert B == self.batch_size
        chunk = self.prefill_chunk
        assert P % chunk == 0, f"prefix length {P} must be a multiple of {chunk}"
        if self.spec == "snapkv":
            assert self.draft_budget <= P, "SnapKV budget must fit the prefix"

        n_chunks = P // chunk
        next_tok = None
        for i in range(n_chunks):
            tok = input_ids[:, i * chunk:(i + 1) * chunk]
            # every sequence prefills the same prompt length -> the uniform
            # fast path (single-slice append, [1, T] rope tables)
            start = jnp.int32(i * chunk)
            if self.spec == "snapkv" and i == n_chunks - 1:
                next_tok, self.cache, self.draft = prefill_last_chunk_snapkv_step(
                    self.params, self.config, self.cache, self.draft, tok,
                    context_len=P, budget=self.draft_budget,
                    window=self.window_size, mesh=self.mesh, start=start)
            else:
                cap = _pow2_cap((i + 1) * chunk, self.max_len)
                next_tok, self.cache = prefill_chunk_step(
                    self.params, self.config, self.cache, tok, cap=cap,
                    mesh=self.mesh, start=start)
        if self.spec == "streaming":
            self.draft = build_streaming_draft_step(
                self.config, self.cache, self.draft,
                budget=self.draft_budget, sink=self.sink_size)
        elif self.spec in ("retro", "squeeze"):
            from magicdec_tpu.engine.retro import build_retro_state
            self.spec_index = build_retro_state(
                self.config, self.cache, self.retro_clusters, self.retro_cap)
        elif self.spec == "quest":
            from magicdec_tpu.engine.quest import make_page_meta
            self.spec_index = make_page_meta(self.cache, self.quest_page)
        if self.draft is not None:
            # default round-start snapshot so the decode-side API is usable
            # right after encode(); begin_spec_round() refreshes it per round
            self._draft_round_start_lengths = self.draft.lengths
        return next_tok

    # -- decode-side API ------------------------------------------------------

    def inference(self, tokens) -> jax.Array:
        out, self.cache = target_decode_step(self.params, self.config,
                                             self.cache, self._tokens(tokens),
                                             mesh=self.mesh)
        return out

    def verify(self, tokens) -> jax.Array:
        if self.spec == "snapkv":
            out, self.cache, self.draft = verify_dual_step(
                self.params, self.config, self.cache, self.draft,
                self._tokens(tokens), mesh=self.mesh)
            return out
        return self.inference(tokens)

    def speculate(self, tokens) -> jax.Array:
        tokens = self._tokens(tokens)
        if self.spec == "snapkv":
            # absolute position of the first spec token = target len + already
            # speculated count (draft cache holds budget + spec'd tokens)
            offset = self.draft.lengths - self._draft_round_start_lengths
            out, self.draft = draft_decode_snapkv_step(
                self.params, self.config, self.draft, tokens,
                self.cache.lengths + offset, mesh=self.mesh)
        else:
            out, self.draft = draft_decode_streaming_step(
                self.params, self.config, self.draft, tokens,
                budget=self.draft_budget, sink=self.sink_size,
                mesh=self.mesh)
        return out

    def begin_spec_round(self):
        """Snapshot draft lengths at round start (verify dual-writes here)."""
        self._draft_round_start_lengths = self.draft.lengths

    # -- state management -----------------------------------------------------

    def rollback_target(self, n):
        self.cache = self.cache.rollback(jnp.asarray(n, jnp.int32))

    def rollback_draft(self, n):
        self.draft = self.draft.rollback(jnp.asarray(n, jnp.int32))

    def set_lengths(self, target=None, draft=None):
        if target is not None:
            self.cache = self.cache.set_lengths(jnp.asarray(target, jnp.int32))
        if draft is not None:
            self.draft = DraftKVCache(self.draft.k, self.draft.v,
                                      jnp.asarray(draft, jnp.int32),
                                      self.draft.evicted)

    def compact_draft(self):
        """StreamingLLM amortized window compaction (between rounds)."""
        if self.spec == "streaming":
            trigger = self.draft.size - (self.draft_headroom // 2)
            self.draft = cache_lib.streaming_compact(
                self.draft, self.draft_budget, self.sink_size, trigger)

    def clear_kv(self):
        if self.cache is not None:
            self.cache = self.cache.set_lengths(
                jnp.zeros((self.batch_size,), jnp.int32))
        self.spec_index = None
        if self.draft is not None:
            zero = jnp.zeros((self.batch_size,), jnp.int32)
            self.draft = DraftKVCache(self.draft.k, self.draft.v, zero, zero)
