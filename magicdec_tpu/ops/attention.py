"""Dense ragged attention — the XLA-fused reference path and numerical oracle.

This is the semantic ground truth that the Pallas kernels (ops/pallas/) are
unit-tested against. It replaces the reference's flashinfer paged wrappers
(Engine/SnapKV/backend.py:41-107): instead of page indirection, the cache is a
fixed-shape [B, S_max, H_kv, D] buffer and raggedness is expressed as a
per-query count of valid cache slots, so rollback is a pure length rewind and
stale tail slots are masked out (SURVEY.md §3.2 invariant).

Convention: new K/V are appended to the cache BEFORE attention (as the
reference's update-then-run flow does), so for a decode step the t-th query of
sequence b may attend to slots [0, len_before[b] + t].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def masked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     valid_upto: jax.Array) -> jax.Array:
    """GQA attention over a fixed-shape cache with per-query slot masks.

    Args:
      q: [B, T, Hq, D] queries (already rotated).
      k, v: [B, S, Hkv, D] cache including the freshly appended tokens.
      valid_upto: [B, T] int32 — query (b, t) attends to slots < valid_upto[b, t].

    Returns: [B, T, Hq, D] in q.dtype; logits and softmax accumulate in
    float32 but K/V are consumed in their storage dtype — casting the cache
    to f32 would materialize multi-GB copies and triple the HBM traffic of
    this (bandwidth-bound) op; the MXU natively accumulates bf16 x bf16 into
    f32 via preferred_element_type.
    """
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D)
    # [B, T, Hkv, G, S]
    logits = jnp.einsum("bthgd,bshd->bthgs", qg, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    slot = jnp.arange(S, dtype=jnp.int32)
    mask = slot[None, None, :] < valid_upto[:, :, None]  # [B, T, S]
    logits = jnp.where(mask[:, :, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bthgs,bshd->bthgd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def masked_attention_general(q: jax.Array, k: jax.Array, v: jax.Array,
                             mask: jax.Array) -> jax.Array:
    """As masked_attention but with an explicit [B, T, S] bool mask.

    Needed for sink+window (StreamingLLM) draft caches where the valid set is
    not a slot prefix: sink slots stay valid while evicted-but-uncompacted
    middle slots must be skipped.
    """
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D)
    logits = jnp.einsum("bthgd,bshd->bthgs", qg, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    logits = jnp.where(mask[:, :, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bthgs,bshd->bthgd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def masked_attention_lse(q: jax.Array, k: jax.Array, v: jax.Array,
                         mask: jax.Array):
    """As masked_attention_general but ALSO returns the online-softmax state
    (m = rowmax logits, l = sum exp(s - m)), so a caller can MERGE this
    attention with another partial attention over a disjoint slot set
    (merge_lse) — the flash-decoding split-K combine. Used by the GliDe tree
    verify: [flash kernel over the prefix | tiny dense tree block] instead of
    one dense [B, T, S] masked attention (reference triton_tree_part_fwd,
    tests/Quest/longspec_llama_glide.py:309, does the same merge in Triton).

    Returns (ctx [B, T, Hq, D] in q.dtype, m [B, T, Hq] f32, l [B, T, Hq] f32).
    Rows with an empty mask produce m = NEG_INF, l = 0 (ctx garbage — the
    merge weight is 0).
    """
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D)
    logits = jnp.einsum("bthgd,bshd->bthgs", qg, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    logits = jnp.where(mask[:, :, None, None, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1)                          # [B, T, Hkv, G]
    p = jnp.exp(logits - m[..., None])
    p = jnp.where(mask[:, :, None, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bthgs,bshd->bthgd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out / jnp.maximum(l[..., None], 1e-30)
    return (out.reshape(B, T, Hq, D).astype(q.dtype),
            m.reshape(B, T, Hq), l.reshape(B, T, Hq))


def merge_lse(ctx_a, m_a, l_a, ctx_b, m_b, l_b):
    """Combine two partial softmax attentions over DISJOINT slot sets.
    ctx_* [B, T, Hq, D] (normalized), m_*/l_* [B, T, Hq] f32."""
    m = jnp.maximum(m_a, m_b)
    w_a = l_a * jnp.exp(m_a - m)
    w_b = l_b * jnp.exp(m_b - m)
    tot = jnp.maximum(w_a + w_b, 1e-30)
    out = (ctx_a.astype(jnp.float32) * w_a[..., None]
           + ctx_b.astype(jnp.float32) * w_b[..., None]) / tot[..., None]
    return out.astype(ctx_a.dtype)


def decode_valid_upto(lengths_before: jax.Array, T: int,
                      cap: int | None = None) -> jax.Array:
    """valid_upto for T tokens appended after lengths_before [B] (causal)."""
    t = jnp.arange(T, dtype=jnp.int32)
    upto = lengths_before[:, None] + t[None, :] + 1
    if cap is not None:
        upto = jnp.minimum(upto, cap)
    return upto
