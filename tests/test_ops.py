"""Unit tests for rope, rmsnorm, dense ragged attention, SnapKV selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops import attention as attn
from magicdec_tpu.ops import snapkv as snapkv_ops
from magicdec_tpu.ops.norms import rms_norm
from magicdec_tpu.ops.rope import apply_rope, rope, rope_cos_sin, rope_inv_freq

CFG = ModelArgs(block_size=512, vocab_size=64, n_layer=1, n_head=4,
                n_kv_head=2, dim=64, intermediate_size=128)


def test_rope_inverse():
    """rotate(x, p) then rotate with -sin at p recovers x (streaming unrotate)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4, 16))
    pos = jnp.arange(8, dtype=jnp.int32)[None, :].repeat(2, 0) * 7
    cos, sin = rope_cos_sin(CFG, pos)
    y = apply_rope(x, cos, sin)
    x_back = apply_rope(y, cos, -sin)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)


def test_rope_position_shift_is_rotation_composition():
    """R(p1) applied after R(p2) == R(p1+p2) — sanity of the rotation algebra."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 16))
    p1 = jnp.full((1, 4), 3, jnp.int32)
    p2 = jnp.full((1, 4), 11, jnp.int32)
    a = rope(CFG, rope(CFG, x, p1), p2)
    b = rope(CFG, x, p1 + p2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_llama31_inv_freq_bands():
    cfg = ModelArgs.from_name("llama-3.1-8b")
    f = rope_inv_freq(cfg)
    plain = 1.0 / (cfg.rope_base ** (np.arange(0, cfg.head_dim, 2) / cfg.head_dim))
    # high-frequency bands untouched, low-frequency bands divided by factor
    np.testing.assert_allclose(f[0], plain[0], rtol=1e-6)
    np.testing.assert_allclose(f[-1], plain[-1] / cfg.scaling_factor, rtol=1e-6)
    assert (f <= plain * (1 + 1e-6)).all()


def test_rms_norm_matches_reference_formula():
    x = np.random.default_rng(0).normal(size=(2, 3, 8)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(8,)).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-5))
    ref = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * w
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_masked_attention_ignores_garbage_tail():
    """Entries beyond valid_upto must not affect the result (rollback safety)."""
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (2, 3, 4, 16))
    k = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 2, 16))
    v = jax.random.normal(jax.random.PRNGKey(4), (2, 10, 2, 16))
    valid = attn.decode_valid_upto(jnp.array([4, 6], jnp.int32), 3)
    out1 = attn.masked_attention(q, k, v, valid)
    k2 = k.at[:, 9].set(1e4)  # poison the tail
    v2 = v.at[:, 9].set(-1e4)
    out2 = attn.masked_attention(q, k2, v2, valid)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_masked_attention_equals_softmax_oracle():
    q = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 2, 8))
    k = jax.random.normal(jax.random.PRNGKey(6), (1, 5, 2, 8))
    v = jax.random.normal(jax.random.PRNGKey(7), (1, 5, 2, 8))
    out = attn.masked_attention(q, k, v, jnp.array([[3]], jnp.int32))
    # manual per-head softmax over first 3 slots
    for h in range(2):
        logits = (np.asarray(q)[0, 0, h] @ np.asarray(k)[0, :3, h].T) / np.sqrt(8)
        w = np.exp(logits - logits.max())
        w /= w.sum()
        ref = w @ np.asarray(v)[0, :3, h]
        np.testing.assert_allclose(np.asarray(out)[0, 0, h], ref, rtol=1e-5)


def test_snapkv_scores_match_dense_softmax():
    """Streaming 2-pass LSE scores == naive full-softmax scores."""
    B, Tobs, Hq, Hkv, D, S = 1, 8, 4, 2, 16, 64
    ctx, window = 48, 8
    q = jax.random.normal(jax.random.PRNGKey(8), (B, Tobs, Hq, D))
    k = jax.random.normal(jax.random.PRNGKey(9), (B, S, Hkv, D))
    got = np.asarray(snapkv_ops.snapkv_scores(q, k, ctx, window, key_chunk=16))

    # naive: causal softmax per query over all ctx keys, sum over queries+group
    qn, kn = np.asarray(q), np.asarray(k)
    scores = np.zeros((B, Hkv, S), np.float32)
    G = Hq // Hkv
    for t in range(Tobs):
        qpos = ctx - Tobs + t
        for hq in range(Hq):
            logits = (qn[0, t, hq] @ kn[0, :ctx, hq // G].T) / np.sqrt(D)
            logits[qpos + 1:] = -np.inf
            w = np.exp(logits - logits.max())
            w /= w.sum()
            scores[0, hq // G, :ctx] += w
    # avg-pool kernel 5, zero padding
    pooled = np.zeros_like(scores)
    padded = np.pad(scores, ((0, 0), (0, 0), (2, 2)))
    for i in range(5):
        pooled += padded[:, :, i:i + S]
    pooled /= 5
    eligible = np.arange(S) < ctx - window
    ref = np.where(eligible[None, None], pooled, np.float32(np.finfo(np.float32).min))
    np.testing.assert_allclose(got[:, :, eligible], ref[:, :, eligible],
                               rtol=1e-4, atol=1e-5)
    assert (got[:, :, ~eligible] <= np.finfo(np.float32).min / 2).all()


def test_snapkv_select_keeps_window_tail_and_topk():
    B, S, Hkv, D = 1, 16, 2, 4
    ctx, budget, window = 12, 6, 2
    k_cache = jnp.arange(B * S * Hkv * D, dtype=jnp.float32).reshape(B, S, Hkv, D)
    scores = jnp.zeros((B, Hkv, S)).at[0, 0, 3].set(9.).at[0, 0, 7].set(8.) \
        .at[0, 0, 1].set(7.).at[0, 0, 5].set(6.) \
        .at[0, 1, 0].set(9.).at[0, 1, 2].set(8.).at[0, 1, 4].set(7.).at[0, 1, 6].set(6.)
    dk, dv = snapkv_ops.snapkv_select(scores, k_cache, k_cache, ctx, budget, window)
    assert dk.shape == (B, budget, Hkv, D)
    # last `window` slots are the window tail in order
    np.testing.assert_array_equal(np.asarray(dk)[0, budget - window:, 0],
                                  np.asarray(k_cache)[0, ctx - window:ctx, 0])
    # head 0 selected slots {3,7,1,5}, head 1 {0,2,4,6} (any order)
    sel0 = {tuple(r) for r in np.asarray(dk)[0, :4, 0].tolist()}
    exp0 = {tuple(np.asarray(k_cache)[0, i, 0].tolist()) for i in (3, 7, 1, 5)}
    assert sel0 == exp0
