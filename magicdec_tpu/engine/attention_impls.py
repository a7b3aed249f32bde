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
                         budget: int, sink: int, attend=None):
    """Draft decode against a StreamingLLM sink+window cache.

    K is stored UNROTATED; every read re-applies rope under remapped positions
    0..kv_len-1 (sink keeps 0..sink-1, live window follows contiguously) —
    the reference's prefill_draft/draft position-reassignment trick
    (Engine/StreamingLLM/model.py:116-157). Queries take the remapped position
    of their own slot, clamping their effective position to the budget.

    cache_layers = (dk, dv) sized [B, size >= budget + slack, Hkv, D].
    """
    attend = attend or dense.masked_attention_general

    def impl(q, k, v, cache_layers):
        dk, dv = cache_layers
        B, T = q.shape[:2]
        size = dk.shape[1]
        # append UNROTATED k
        dk, dv = cache_lib.append_layer_kv(dk, dv, k, v, draft_lengths_before)
        lengths_after = draft_lengths_before + T
        slot_pos, slot_valid = cache_lib.streaming_positions(
            lengths_after, size, budget, sink)
        # rotate the whole (small) cache at remapped positions
        cos, sin = rope_cos_sin(config, slot_pos)
        k_rot = apply_rope(dk, cos, sin)
        # query t lives in slot lengths_before + t; take that slot's position
        q_slot = draft_lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q_pos = jnp.take_along_axis(slot_pos, q_slot, axis=1)
        q = rope(config, q, q_pos)
        # causal: a query may see valid slots up to and including its own
        slot = jnp.arange(size, dtype=jnp.int32)
        mask = slot_valid[:, None, :] & (slot[None, None, :] <= q_slot[:, :, None])
        ctx = attend(q, k_rot, dv, mask)
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
