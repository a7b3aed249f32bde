"""Attention implementations plugged into the model core's layer scan.

Each factory closes over step-invariant metadata (positions, lengths, masks —
identical for every layer) and returns an `attn_impl(q, k, v, cache_layers)`
used by models/llama.py. Together these replace the reference's four
hand-duplicated forward variants (Engine/SnapKV/model.py:173-247 forward /
verify / draft_forward / prefill) and its flashinfer plan()/run() wrapper pairs
(Engine/SnapKV/backend.py:41-107): under jit every variant is just a different
fixed-shape XLA program.

The `kernels` module argument selects the compute backend: `dense` (XLA oracle,
runs anywhere) or Pallas TPU kernels with identical semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from magicdec_tpu import cache as cache_lib
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops import attention as dense
from magicdec_tpu.ops import snapkv as snapkv_ops
from magicdec_tpu.ops.rope import rope, rope_cos_sin, apply_rope


def _flat(ctx: jax.Array) -> jax.Array:
    B, T, H, D = ctx.shape
    return ctx.reshape(B, T, H * D)


def target_attn(config: ModelArgs, lengths_before: jax.Array, attend=None):
    """Decode/verify/prefill against the target cache.

    cache_layers = (ck, cv) [B, S, Hkv, D]. Queries sit at absolute positions
    lengths_before + t; K is rotated before being appended (reference flow:
    mylib::rope -> update_kv -> attention, Engine/SnapKV/model.py:324-339).
    """
    attend = attend or dense.masked_attention

    def impl(q, k, v, cache_layers):
        ck, cv = cache_layers
        T = q.shape[1]
        positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        ck, cv = cache_lib.append_layer_kv(ck, cv, k, v, lengths_before)
        valid = dense.decode_valid_upto(lengths_before, T)
        ctx = attend(q, ck, cv, valid)
        return _flat(ctx), (ck, cv)

    return impl


def verify_dual_attn(config: ModelArgs, lengths_before: jax.Array,
                     draft_lengths_before: jax.Array, attend=None):
    """SnapKV verify: full-cache target attention that ALSO appends the rotated
    k/v into the draft cache (Engine/SnapKV/model.py:340-355 Attention.verify),
    keeping the compressed cache in sync; acceptance then rewinds lengths only.

    cache_layers = (ck, cv, dk, dv).
    """
    attend = attend or dense.masked_attention

    def impl(q, k, v, cache_layers):
        ck, cv, dk, dv = cache_layers
        T = q.shape[1]
        positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        ck, cv = cache_lib.append_layer_kv(ck, cv, k, v, lengths_before)
        dk, dv = cache_lib.append_layer_kv(dk, dv, k, v, draft_lengths_before)
        valid = dense.decode_valid_upto(lengths_before, T)
        ctx = attend(q, ck, cv, valid)
        return _flat(ctx), (ck, cv, dk, dv)

    return impl


def snapkv_draft_attn(config: ModelArgs, target_positions_base: jax.Array,
                      draft_lengths_before: jax.Array, attend=None):
    """Draft decode against a SnapKV-compressed cache.

    Keys in the draft cache are rotated at their ORIGINAL absolute positions,
    so draft queries rotate at the true context position (target cache length
    + offset) while masking runs in draft-slot coordinates
    (Engine/SnapKV/model.py:211-228 draft_forward).
    """
    attend = attend or dense.masked_attention

    def impl(q, k, v, cache_layers):
        dk, dv = cache_layers
        T = q.shape[1]
        positions = target_positions_base[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        dk, dv = cache_lib.append_layer_kv(dk, dv, k, v, draft_lengths_before)
        valid = dense.decode_valid_upto(draft_lengths_before, T)
        ctx = attend(q, dk, dv, valid)
        return _flat(ctx), (dk, dv)

    return impl


def streaming_draft_attn(config: ModelArgs, draft_lengths_before: jax.Array,
                         evicted: jax.Array, budget: int, sink: int,
                         attend=None):
    """Draft decode against a StreamingLLM sink+window cache.

    The reference stores K UNROTATED and re-applies rope at read under
    remapped positions 0..kv_len-1 (sink keeps 0..sink-1, live window follows
    contiguously — Engine/StreamingLLM/model.py:116-157). We instead store K
    ROTATED at its ORIGINAL absolute position (bit-identical to what the
    target cache holds, so the prefix can be gathered from it exactly) and
    apply a DELTA rotation at read: rope rotations compose additively
    (R(a)∘R(b) = R(a+b)), and remap − original = sink − window_start − evicted
    is one constant per sequence for every window slot (0 for sink slots).
    When nothing has been evicted the delta is 0 and the read rotation is an
    exact identity — the budget ≥ context case is bit-exact with the target,
    which the unrotate/re-rotate scheme cannot achieve in bf16.

    cache_layers = (dk, dv) sized [B, size >= budget + slack, Hkv, D].
    """
    attend = attend or dense.masked_attention_general

    def impl(q, k, v, cache_layers):
        dk, dv = cache_layers
        B, T = q.shape[:2]
        size = dk.shape[1]
        # slot s >= sink of sequence b holds original position evicted[b] + s
        # (compaction preserves this: it shifts slots and grows evicted by the
        # same amount); sink slots hold original position s.
        q_slot = draft_lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        k_true_pos = evicted[:, None] + q_slot
        # append K ROTATED at its true absolute position (target-identical)
        dk, dv = cache_lib.append_layer_kv(dk, dv, rope(config, k, k_true_pos),
                                           v, draft_lengths_before)
        lengths_after = draft_lengths_before + T
        start = jnp.maximum(sink, lengths_after - (budget - sink))   # [B]
        delta = sink - start - evicted                               # [B] <= 0
        # per-slot read rotation: identity on sink slots, R(delta) on window
        slot = jnp.arange(size, dtype=jnp.int32)
        slot_delta = jnp.where(slot[None, :] < sink, 0, delta[:, None])
        cos, sin = rope_cos_sin(config, slot_delta)
        k_read = apply_rope(dk, cos, sin)
        # queries sit in window slots: remapped position = true + delta
        q = rope(config, q, evicted[:, None] + q_slot + delta[:, None])
        # valid = sink slots + live window, causal up to own slot
        _, slot_valid = cache_lib.streaming_positions(lengths_after, size,
                                                      budget, sink)
        mask = slot_valid[:, None, :] & (slot[None, None, :] <= q_slot[:, :, None])
        ctx = attend(q, k_read, dv, mask)
        return _flat(ctx), (dk, dv)

    return impl


def prefill_snapkv_attn(config: ModelArgs, lengths_before: jax.Array,
                        context_len: int, budget: int, window: int,
                        attend=None):
    """Last prefill chunk: target prefill attention + SnapKV draft-cache build
    (reference: Attention.prefill is_last=True -> gen_draft_kv,
    Engine/SnapKV/model.py:383-445).

    cache_layers = (ck, cv, dk, dv); writes the first `budget` slots of dk/dv.
    """
    attend = attend or dense.masked_attention

    def impl(q, k, v, cache_layers):
        ck, cv, dk, dv = cache_layers
        T = q.shape[1]
        positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        ck, cv = cache_lib.append_layer_kv(ck, cv, k, v, lengths_before)
        valid = dense.decode_valid_upto(lengths_before, T)
        ctx = attend(q, ck, cv, valid)

        scores = snapkv_ops.snapkv_scores(q, ck, context_len, window)
        sel_k, sel_v = snapkv_ops.snapkv_select(scores, ck, cv, context_len,
                                                budget, window)
        dk = jax.lax.dynamic_update_slice(
            dk, sel_k.astype(dk.dtype), (0, 0, 0, 0))
        dv = jax.lax.dynamic_update_slice(
            dv, sel_v.astype(dv.dtype), (0, 0, 0, 0))
        return _flat(ctx), (ck, cv, dk, dv)

    return impl
