"""Weight-only quantization tests (reference Engine/quantize.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.spec import generate_autoregressive
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.quant import int8 as q

CFG = ModelArgs.from_name("test-tiny")


def test_int8_roundtrip_error_small():
    w = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 96))
    qw = q.quantize_int8(w, reduce_axes=(-2,))
    back = q.dequantize_int8(qw, jnp.float32)
    rel = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 1.5 / 127


def test_int4_roundtrip_error_small():
    w = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 96))
    qw = q.quantize_int4(w, in_axis=-2, group_size=128)
    assert qw.q4.shape == (2, 128, 96)
    back = q.dequantize_int4(qw, jnp.float32)
    rel = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 1.5 / 7


def test_int8_qmatmul_matches_dequant_matmul():
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 64))
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 96))
    qw = q.quantize_int8(w, reduce_axes=(-2,))
    got = q.qmatmul(x, qw)
    want = x @ q.dequantize_int8(qw, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_quantized_model_logits_track_fp():
    """Quantized forward wiring check: logits stay strongly correlated with
    the fp32 model's (argmax-path equality is not a meaningful criterion for
    a random tiny model, where margins are smaller than quantization noise).
    Also exercises the full generation path end to end."""
    from magicdec_tpu.train import causal_attn

    params = llama.init_params(jax.random.PRNGKey(0), CFG, jnp.float32,
                               scale=0.3)
    toks = jax.random.randint(jax.random.PRNGKey(3), (2, 32), 0,
                              CFG.vocab_size, dtype=jnp.int32)
    ref, _ = llama.forward(params, CFG, toks, causal_attn(CFG), ())
    refn = np.asarray(ref).ravel()
    # int4's 15 levels give ~1/7 worst-case element error; on a 2-layer
    # random model that compounds to a weak (but clearly non-broken)
    # correlation — the roundtrip test above owns numerical correctness.
    for mode, min_corr in (("int8", 0.99), ("int4", 0.6)):
        qp = q.quantize_params(params, mode)
        got, _ = llama.forward(qp, CFG, toks, causal_attn(CFG), ())
        corr = np.corrcoef(np.asarray(got).ravel(), refn)[0, 1]
        assert corr >= min_corr, (mode, corr)
        # generation path runs with quantized weights
        eng = Engine(CFG, qp, batch_size=2, max_len=192, prefill_chunk=128,
                     kv_dtype=jnp.float32)
        out, _ = generate_autoregressive(eng, toks[:, :32].repeat(4, 1), 8)
        assert np.asarray(out).shape == (2, 8)


def test_int8_spec_lossless_and_fullbudget_exact():
    """Losslessness + full-budget acceptance==1.0 must hold for an int8-
    quantized model exactly as for bf16: the draft step (T=1) and verify
    (T=gamma+1) must produce bit-identical logits. Regression canary for
    qmatmul's dequant placement — an OUTPUT epilogue (y*s in bf16, or
    f32-accum-then-scale) fuses shape-dependently (bf16 epilogue: 0.80-0.85
    full-budget acceptance on v5e; f32-accum: lossless failures at some
    max_len on CPU). Scaling the WEIGHT element-wise before the dot is
    shape-independent by construction. Two max_len values because the
    f32-accum failure was max_len-dependent."""
    from magicdec_tpu.engine.spec import generate_selfspec

    cfg = ModelArgs.from_name("test-tiny")
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16,
                               scale=0.3)
    qp = q.quantize_params(params, "int8")
    B, P, NEW, G = 2, 128, 24, 3
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                cfg.vocab_size, dtype=jnp.int32)
    for max_len in (P + NEW + G + 8, P + NEW + G + 24):
        eng = Engine(cfg, qp, batch_size=B, max_len=max_len,
                     prefill_chunk=128)
        ar, _ = generate_autoregressive(eng, prompt, NEW)
        for budget in (32, P):
            e = Engine(cfg, qp, batch_size=B, max_len=max_len,
                       spec="snapkv", draft_budget=budget,
                       prefill_chunk=128)
            out, counts, st = generate_selfspec(e, prompt, G, NEW)
            assert np.array_equal(np.asarray(out[:, :NEW]),
                                  np.asarray(ar[:, :NEW])), \
                (max_len, budget)
            if budget == P:
                assert st.acceptance_rate == 1.0, (max_len,
                                                   st.acceptance_rate)


def test_int4_matmul_kernel_matches_dequant_oracle():
    """Fused int4 dequant-matmul (packed nibbles streamed, unpacked in
    registers) == x @ dequantized weight."""
    import jax
    import jax.numpy as jnp

    from magicdec_tpu.ops.pallas.int4_matmul import (int4_matmul,
                                                     pack_int4_cols)

    M, K, N, g = 16, 256, 512, 128
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (M, K),
                          jnp.float32).astype(jnp.bfloat16)
    q4, scales = pack_int4_cols(w, group_size=g)

    # oracle: reconstruct the dequantized weight from the packed layout
    # (nibbles are BIASED by +8 — pack_int4_cols)
    qu = jnp.bitwise_and(q4.astype(jnp.int32), 0xFF)
    lo = (jnp.bitwise_and(qu, 0xF) - 8).astype(jnp.float32)
    hi = ((qu >> 4) - 8).astype(jnp.float32)
    qw = jnp.concatenate([lo, hi], axis=1)                    # [K, N]
    sc = jnp.repeat(scales, g, axis=0)                        # [K, N]
    w_deq = (qw * sc).astype(jnp.bfloat16)
    ref = (x @ w_deq).astype(jnp.float32)

    out = int4_matmul(x, q4, scales, group_size=g, n_block=128, k_block=128,
                      interpret=True)
    # kernel scales in f32 AFTER the integer matmul; the oracle rounds
    # q*s to bf16 BEFORE it — allow bf16-rounding-scale absolute error
    # (relative error is meaningless at cancellation outputs)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=2e-2 * scale, rtol=0)


def test_int4_matmul_non_divisible_n_block():
    """N/2 not a multiple of the default n_block (the bench model's gate/up
    weight: N2=2816, default n_block 512) — the kernel must clamp n_block to
    a divisor instead of crashing in _interleave_scales."""
    import jax
    import jax.numpy as jnp

    from magicdec_tpu.ops.pallas.int4_matmul import (int4_matmul,
                                                     pack_int4_cols)

    M, K, N, g = 8, 256, 2 * 2816, 128
    key = jax.random.PRNGKey(2)
    w = jax.random.normal(key, (K, N), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (M, K),
                          jnp.float32).astype(jnp.bfloat16)
    q4, scales = pack_int4_cols(w, group_size=g)
    out = int4_matmul(x, q4, scales, group_size=g, n_block=512, k_block=256,
                      interpret=True)
    qu = jnp.bitwise_and(q4.astype(jnp.int32), 0xFF)
    lo = (jnp.bitwise_and(qu, 0xF) - 8).astype(jnp.float32)
    hi = ((qu >> 4) - 8).astype(jnp.float32)
    qw = jnp.concatenate([lo, hi], axis=1)
    w_deq = (qw * jnp.repeat(scales, g, axis=0)).astype(jnp.bfloat16)
    ref = (x @ w_deq).astype(jnp.float32)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=2e-2 * scale, rtol=0)
