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


def _tree_slice(flat: jax.Array, base: jax.Array, n: int) -> jax.Array:
    """[B, S, HD] -> the n rows at [base[b], base[b] + n) per sequence."""
    HD = flat.shape[2]
    return jax.vmap(
        lambda a, i: jax.lax.dynamic_slice(a, (i, 0), (n, HD)))(flat, base)


def glide_forward(glide: Params, target_params: Params, config: ModelArgs,
                  tokens: jax.Array, positions: jax.Array,
                  own_k, own_v, own_lengths,
                  tgt_k_last, tgt_v_last, tgt_valid_upto,
                  attn_mask=None, use_flash: bool = False, tree=None):
    """One glide step.

    tokens [B, T] at absolute `positions` [B, T]; own_k/own_v [B, Sd, Hkv*D]
    is the glide's OWN self-attention cache (small; appended in place);
    tgt_k_last/tgt_v_last [B, S, Hkv*D] the target's last-layer cache slice;
    tgt_valid_upto [B, T] bounds the cross-attention (the target has only
    verified that many positions). attn_mask optionally replaces the causal
    self-mask (tree speculation's ancestor mask, dense path).

    use_flash: route both attentions through the flash-decode kernel — the
    dense path materializes [B, Hq, T, S] logits against the target's FULL
    last-layer cache every draft step, which is what kept GliDe from being a
    throughput path. tree=(anc_rows [T, n_nodes] static bools, tree_base [B])
    replaces attn_mask on the flash path: self-attention = flash over the
    prefix [0, tree_base) LSE-merged with a dense block over the n_nodes
    tree slots at [tree_base, tree_base + n) (ops/attention.merge_lse — the
    reference's triton_tree_part_fwd does the same two-part merge,
    tests/Quest/longspec_llama_glide.py:309).

    Returns (logits [B, T, V] f32, own_k, own_v).
    """
    c = config
    x = target_params["tok_embeddings"][tokens]
    B, T = tokens.shape
    Hkv, Dh = c.n_kv_head, c.head_dim

    # self-attention over the glide's own cache
    h = rms_norm(x, glide["self_norm"], c.norm_eps)
    q, k, v = _split_qkv(h @ glide["wqkv"], c)
    q = rope(c, q, positions)
    k = rope(c, k, positions)
    from magicdec_tpu import cache as cache_lib
    own_k, own_v = cache_lib.append_layer_kv(own_k, own_v, k, v, own_lengths)
    Sd = own_k.shape[1]
    if use_flash and tree is not None:
        from magicdec_tpu.engine.attention_impls import _interp
        from magicdec_tpu.ops.pallas.flash_decode import flash_decode_intervals
        anc_rows, tree_base = tree
        n = anc_rows.shape[1]
        zero = jnp.zeros((B, T), jnp.int32)
        hi = jnp.broadcast_to(tree_base[:, None], (B, T))
        ctx_p, m_p, l_p = flash_decode_intervals(
            q, own_k, own_v, zero, zero, hi, return_lse=True,
            interpret=_interp())
        kt = _tree_slice(own_k, tree_base, n).reshape(B, n, Hkv, Dh)
        vt = _tree_slice(own_v, tree_base, n).reshape(B, n, Hkv, Dh)
        tm = jnp.broadcast_to(jnp.asarray(anc_rows)[None], (B, T, n))
        ctx_t, m_t, l_t = dense.masked_attention_lse(q, kt, vt, tm)
        ctx = dense.merge_lse(ctx_p, m_p, l_p, ctx_t, m_t, l_t)
    elif use_flash:
        from magicdec_tpu.engine.attention_impls import _interp
        from magicdec_tpu.ops.pallas.flash_decode import flash_decode
        valid = dense.decode_valid_upto(own_lengths, T)
        ctx = flash_decode(q, own_k, own_v, valid, interpret=_interp())
    elif attn_mask is None:
        valid = dense.decode_valid_upto(own_lengths, T)
        ctx = dense.masked_attention(q, own_k.reshape(B, Sd, Hkv, Dh),
                                     own_v.reshape(B, Sd, Hkv, Dh), valid)
    else:
        ctx = dense.masked_attention_general(
            q, own_k.reshape(B, Sd, Hkv, Dh),
            own_v.reshape(B, Sd, Hkv, Dh), attn_mask)
    x = x + ctx.reshape(B, T, -1) @ glide["wo"]

    # cross-attention into the target's last-layer KV (GQA layout shared);
    # bounded by the verified prefix, so the flash path needs no tree part
    h = rms_norm(x, glide["cross_norm"], c.norm_eps)
    qc = (h @ glide["wq_cross"]).reshape(B, T, c.n_head, c.head_dim)
    qc = rope(c, qc, positions)
    S = tgt_k_last.shape[1]
    if use_flash:
        from magicdec_tpu.engine.attention_impls import _interp
        from magicdec_tpu.ops.pallas.flash_decode import flash_decode
        ctx = flash_decode(qc, tgt_k_last, tgt_v_last, tgt_valid_upto,
                           interpret=_interp())
    else:
        ctx = dense.masked_attention(
            qc, tgt_k_last.reshape(B, S, Hkv, Dh),
            tgt_v_last.reshape(B, S, Hkv, Dh), tgt_valid_upto)
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
