"""KV cache state pytrees and pure update functions.

TPU-native redesign of the reference's paged KV cache + page tables
(Engine/SnapKV/model.py:83-114, Engine/SnapKV/backend.py:31-107):

* The reference allocates contiguous page ranges per request, so a page table
  is isomorphic to a fixed-shape per-sequence buffer `[L, B, S_max, Hkv, D]`
  plus a length vector. We use the latter directly: static shapes for XLA, no
  indirection on the hot path, rollback is a pure `lengths` rewind and stale
  tail slots are masked at attention time (SURVEY.md §3.2 invariant).

* K/V are stored PACKED as [L, B, S, Hkv*D]: with head_dim 64 the unpacked
  [..., Hkv, 64] layout leaves every TPU (8,128) tile half-empty (2x HBM and
  2x bandwidth waste — measured as a "2.0x expansion" OOM on v5e); the packed
  minor dimension is a multiple of 128, and reshaping to [..., Hkv, D] at the
  attention site is a free bitcast (same row-major order).

* Draft caches come in two flavors matching the reference's drafting engines:
  - SnapKV (Engine/SnapKV/model.py:391-445): rotated K at original positions,
    built once at prefill end; verify appends to BOTH caches; rollback rewinds.
  - StreamingLLM (Engine/StreamingLLM/model.py:116-157): sink+window cache with
    K stored UNROTATED and rope applied at read under remapped positions
    0..kv_len-1. The reference shifts the window on every overflow; we instead
    keep `slack` headroom slots and compact with a gather once per `slack`
    appends (amortized O(1)), which also makes speculative rollback safe.

Cache arrays are stacked over layers on axis 0 so the model's `lax.scan` over
layers can thread per-layer slices through as scan xs/ys.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass, data_fields=["k", "v", "lengths"],
         meta_fields=[])
@dataclass
class KVCache:
    """Target cache. k/v: [L, B, S, Hkv*D] (packed); lengths: [B] valid slots."""
    k: jax.Array
    v: jax.Array
    lengths: jax.Array

    @staticmethod
    def create(n_layer: int, batch: int, max_len: int, n_kv_head: int,
               head_dim: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (n_layer, batch, max_len, n_kv_head * head_dim)
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                       lengths=jnp.zeros((batch,), jnp.int32))

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def rollback(self, n) -> "KVCache":
        """Rewind lengths by n (scalar or [B]); data beyond stays as garbage."""
        return KVCache(self.k, self.v, jnp.maximum(self.lengths - n, 0))

    def set_lengths(self, lengths: jax.Array) -> "KVCache":
        return KVCache(self.k, self.v, lengths)


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "v", "lengths", "evicted"], meta_fields=[])
@dataclass
class DraftKVCache:
    """Draft cache (budget-bounded). k/v: [L, B, Sd, Hkv*D] (packed).

    `lengths` counts physical valid slots; `evicted` counts tokens compacted
    away (StreamingLLM only; always 0 for SnapKV). The logical token count seen
    so far is lengths + evicted.
    """
    k: jax.Array
    v: jax.Array
    lengths: jax.Array
    evicted: jax.Array

    @staticmethod
    def create(n_layer: int, batch: int, size: int, n_kv_head: int,
               head_dim: int, dtype=jnp.bfloat16) -> "DraftKVCache":
        shape = (n_layer, batch, size, n_kv_head * head_dim)
        return DraftKVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                            lengths=jnp.zeros((batch,), jnp.int32),
                            evicted=jnp.zeros((batch,), jnp.int32))

    @property
    def size(self) -> int:
        return self.k.shape[2]

    def rollback(self, n) -> "DraftKVCache":
        return DraftKVCache(self.k, self.v, jnp.maximum(self.lengths - n, 0),
                            self.evicted)


def append_at_layer(cache: jax.Array, new: jax.Array, lengths: jax.Array,
                    l: jax.Array, write_mask: jax.Array | None = None
                    ) -> jax.Array:
    """Scatter new K or V [B, T, H, D] (or packed [B, T, H*D]) into the FULL
    stacked cache [L, B, S, H*D] at (l, b, lengths[b]+t).

    Writes only B*T*H*D elements. The model's layer scan carries the stacked
    cache and XLA performs this scatter in place — threading per-layer slices
    through scan as xs/ys instead would rewrite the whole cache every step
    (measured ~10x decode slowdown at 16 layers x 8k context).

    write_mask [B, T] bool (optional): rows with False are dropped (their
    slot keeps its existing contents). Used by the speculative re-feed paths:
    XLA's matmul tilings differ between prefill (T=128) and decode (T<=8)
    shapes, so re-computed K/V may differ in low bits from the prefill-written
    values — a masked append preserves the original bits unless the slot is
    genuinely stale (see spec.streaming_round).
    """
    B, T = new.shape[:2]
    if new.ndim == 4:
        new = new.reshape(B, T, -1)
    new = new.astype(cache.dtype)
    b_idx = jnp.arange(B)[:, None]
    s_idx = lengths[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    if write_mask is not None:
        # out-of-bounds indices are dropped -> masked rows keep old contents
        s_idx = jnp.where(write_mask, s_idx, cache.shape[2])
    return cache.at[l, b_idx, s_idx].set(new, mode="drop")


def append_at_layer_uniform(cache: jax.Array, new: jax.Array,
                            start, l: jax.Array) -> jax.Array:
    """append_at_layer for the UNIFORM case (every sequence writes at the
    same offset — chunked prefill): one dynamic_update_slice instead of a
    [B*T]-row scatter. The scatter costs ~1 ms per call at B=128/T=128 on
    v5e (~50x the HBM floor); the slice update aliases in place and runs at
    copy speed. `start` is a traced int32 scalar."""
    B, T = new.shape[:2]
    new = new.reshape(1, B, T, -1).astype(cache.dtype)
    return jax.lax.dynamic_update_slice(
        cache, new, (jnp.asarray(l, jnp.int32), jnp.int32(0),
                     jnp.asarray(start, jnp.int32), jnp.int32(0)))


def append_layer_kv(cache_k_l: jax.Array, cache_v_l: jax.Array,
                    k_new: jax.Array, v_new: jax.Array,
                    lengths: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Write k_new/v_new [B, T, H, D] (or packed [B, T, H*D]) at per-sequence
    offsets into the packed cache layer [B, S, H*D].

    TPU-native replacement for flashinfer append_paged_kv_cache
    (Engine/utils.py:31-66). dynamic_update_slice clamps out-of-range starts,
    so callers must guarantee lengths + T <= S.
    """
    B, T = k_new.shape[:2]
    if k_new.ndim == 4:
        k_new = k_new.reshape(B, T, -1)
        v_new = v_new.reshape(B, T, -1)

    def upd(c, n, l):
        return jax.lax.dynamic_update_slice(c, n.astype(c.dtype), (l, 0))
    new_k = jax.vmap(upd)(cache_k_l, k_new, lengths)
    new_v = jax.vmap(upd)(cache_v_l, v_new, lengths)
    return new_k, new_v


# ---------------------------------------------------------------------------
# StreamingLLM sink+window bookkeeping
# ---------------------------------------------------------------------------

def streaming_positions(lengths: jax.Array, size: int, budget: int,
                        sink: int) -> tuple[jax.Array, jax.Array]:
    """Remapped rope positions and validity for a sink+window draft cache.

    Slot s of sequence b (with `lengths[b]` physical entries) is:
      * sink     (s < sink):                    position s, always valid
      * window   (start <= s < lengths):        position sink + (s - start)
      * evicted-but-not-compacted or empty:     invalid
    where start = max(sink, lengths - (budget - sink)) caps the live window so
    at most `budget` slots are ever attended to — matching the reference's
    re-assigned positions 0..kv_len-1 (Engine/StreamingLLM/model.py:116-157).

    Returns (positions [B, size] int32, valid [B, size] bool).
    """
    B = lengths.shape[0]
    slot = jnp.arange(size, dtype=jnp.int32)[None, :]
    lens = lengths[:, None]
    start = jnp.maximum(sink, lens - (budget - sink))
    in_sink = slot < jnp.minimum(sink, lens)
    in_window = (slot >= start) & (slot < lens)
    positions = jnp.where(slot < sink, slot, sink + slot - start)
    valid = in_sink | in_window
    return jnp.where(valid, positions, 0), valid


def streaming_compact(draft: DraftKVCache, budget: int, sink: int,
                      slack_trigger: int) -> DraftKVCache:
    """Amortized window compaction: gather sink + live window to the front.

    Runs the gather only when some sequence's physical length exceeds
    `slack_trigger` (<= size - max_append), keeping rollback safe: compaction
    never discards slots a <=gamma rollback could rewind into as long as
    slack_trigger >= budget + gamma.
    """
    need = jnp.any(draft.lengths > slack_trigger)

    def do_compact(d: DraftKVCache) -> DraftKVCache:
        size = d.size
        slot = jnp.arange(size, dtype=jnp.int32)[None, :]
        lens = d.lengths[:, None]
        start = jnp.maximum(sink, lens - (budget - sink))
        # gather index for new slot s: s if s < sink else start + (s - sink)
        src = jnp.where(slot < sink, slot, start + slot - sink)
        src = jnp.clip(src, 0, size - 1)
        # After the gather every sequence's live data occupies a prefix of at
        # most `budget` slots (identity mapping for sequences already within
        # budget, since then start == sink).
        new_len = jnp.minimum(d.lengths, budget)

        def gather_layer(k_l, v_l):  # [B, S, H*D]
            take = jax.vmap(lambda a, i: a[i])  # per-batch gather on slot axis
            return take(k_l, src), take(v_l, src)

        new_k, new_v = jax.vmap(gather_layer)(d.k, d.v)
        shrink = d.lengths - new_len
        return DraftKVCache(new_k, new_v, new_len, d.evicted + shrink)

    return jax.lax.cond(need, do_compact, lambda d: d, draft)
