"""GliDe draft model: a 1-layer decoder with cross-attention into the
target's last-layer KV cache.

TPU-native re-design of the reference's GlideAttention /
LlamaGlideDecoderLayer (tests/Quest/longspec_llama_glide.py:23-393): the
draft block runs self-attention over its own small KV cache, then
cross-attends to the TARGET model's last-layer keys/values (which our target
cache exposes for free as cache.k[-1]/cache.v[-1]), then an MLP; token
embeddings and the unembedding are shared with the target. Because the
cross-attention reads activations the target already computed, the draft adds
one cheap layer of compute yet sees the target's full-context representation
— the GliDe thesis.

The draft is trained (reference trains glide with a fused CE loss,
longspec_llama_glide.py:492-502) — see train_glide() in magicdec_tpu/train.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops.norms import rms_norm
from magicdec_tpu.ops.rope import rope
from magicdec_tpu.ops import attention as dense

Params = dict[str, Any]


def init_glide_params(key: jax.Array, config: ModelArgs,
                      dtype=jnp.float32, scale: float = 0.02) -> Params:
    """Glide block params. config is the TARGET's config (shared dims)."""
    D = config.dim
    Dh, Hq, Hkv = config.head_dim, config.n_head, config.n_kv_head
    qkv_out = (Hq + 2 * Hkv) * Dh
    I = config.intermediate_size
    ks = jax.random.split(key, 6)

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    return {
        "self_norm": jnp.ones((D,), dtype),
        "wqkv": rnd(ks[0], (D, qkv_out)),
        "wo": rnd(ks[1], (Hq * Dh, D)),
        "cross_norm": jnp.ones((D,), dtype),
        "wq_cross": rnd(ks[2], (D, Hq * Dh)),
        "wo_cross": rnd(ks[3], (Hq * Dh, D)),
        "ffn_norm": jnp.ones((D,), dtype),
        "w_gate_up": rnd(ks[4], (D, 2, I)),
        "w_down": rnd(ks[5], (I, D)),
    }


def _split_qkv(qkv, config: ModelArgs):
    B, T = qkv.shape[:2]
    Dh, Hq, Hkv = config.head_dim, config.n_head, config.n_kv_head
    G = Hq // Hkv
    grouped = qkv.reshape(B, T, Hkv, (G + 2) * Dh)
    q = grouped[..., :G * Dh].reshape(B, T, Hq, Dh)
    return q, grouped[..., G * Dh:(G + 1) * Dh], grouped[..., (G + 1) * Dh:]


def glide_forward(glide: Params, target_params: Params, config: ModelArgs,
                  tokens: jax.Array, positions: jax.Array,
                  own_k, own_v, own_lengths,
                  tgt_k_last, tgt_v_last, tgt_valid_upto,
                  attn_mask=None):
    """One glide step.

    tokens [B, T] at absolute `positions` [B, T]; own_k/own_v [B, Sd, Hkv*D]
    is the glide's OWN self-attention cache (small; appended in place);
    tgt_k_last/tgt_v_last [B, S, Hkv*D] the target's last-layer cache slice;
    tgt_valid_upto [B, T] bounds the cross-attention (the target has only
    verified that many positions). attn_mask optionally replaces the causal
    self-mask (tree speculation passes the ancestor mask).

    Returns (logits [B, T, V] f32, own_k, own_v).
    """
    c = config
    x = target_params["tok_embeddings"][tokens]
    B, T = tokens.shape

    # self-attention over the glide's own cache
    h = rms_norm(x, glide["self_norm"], c.norm_eps)
    q, k, v = _split_qkv(h @ glide["wqkv"], c)
    q = rope(c, q, positions)
    k = rope(c, k, positions)
    from magicdec_tpu import cache as cache_lib
    own_k, own_v = cache_lib.append_layer_kv(own_k, own_v, k, v, own_lengths)
    Sd = own_k.shape[1]
    if attn_mask is None:
        valid = dense.decode_valid_upto(own_lengths, T)
        ctx = dense.masked_attention(
            q, own_k.reshape(B, Sd, c.n_kv_head, c.head_dim),
            own_v.reshape(B, Sd, c.n_kv_head, c.head_dim), valid)
    else:
        ctx = dense.masked_attention_general(
            q, own_k.reshape(B, Sd, c.n_kv_head, c.head_dim),
            own_v.reshape(B, Sd, c.n_kv_head, c.head_dim), attn_mask)
    x = x + ctx.reshape(B, T, -1) @ glide["wo"]

    # cross-attention into the target's last-layer KV (GQA layout shared)
    h = rms_norm(x, glide["cross_norm"], c.norm_eps)
    qc = (h @ glide["wq_cross"]).reshape(B, T, c.n_head, c.head_dim)
    qc = rope(c, qc, positions)
    S = tgt_k_last.shape[1]
    ctx = dense.masked_attention(
        qc, tgt_k_last.reshape(B, S, c.n_kv_head, c.head_dim),
        tgt_v_last.reshape(B, S, c.n_kv_head, c.head_dim), tgt_valid_upto)
    x = x + ctx.reshape(B, T, -1) @ glide["wo_cross"]

    # MLP
    h = rms_norm(x, glide["ffn_norm"], c.norm_eps)
    gate_up = jnp.einsum("btd,dzi->btzi", h, glide["w_gate_up"])
    x = x + (jax.nn.silu(gate_up[..., 0, :]) * gate_up[..., 1, :]) @ glide["w_down"]

    # shared unembedding
    x = rms_norm(x, target_params["norm"], c.norm_eps)
    w_out = (target_params["tok_embeddings"].T if c.tie_word_embeddings
             else target_params["output"])
    logits = jnp.dot(x, w_out, preferred_element_type=jnp.float32)
    return logits, own_k, own_v
