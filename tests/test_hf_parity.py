"""Logit parity vs HuggingFace transformers (torch CPU) on tiny random models.

This is the numerical anchor the reference lacks (its only correctness signal
is acceptance rate + eyeballing text, SURVEY.md §4): a randomly initialized HF
LlamaForCausalLM / Qwen2ForCausalLM must produce the same logits as this
framework after weight conversion, for GQA, qkv-bias, linear rope scaling and
llama-3.1 rope scaling variants.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import jax

from magicdec_tpu.checkpoint.convert_hf import params_from_hf_state_dict
from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.models.config import ModelArgs

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def make_hf_llama(config: ModelArgs, rope_scaling=None):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=config.vocab_size,
        hidden_size=config.dim,
        intermediate_size=config.intermediate_size,
        num_hidden_layers=config.n_layer,
        num_attention_heads=config.n_head,
        num_key_value_heads=config.n_kv_head,
        rms_norm_eps=config.norm_eps,
        rope_theta=config.rope_base,
        max_position_embeddings=config.block_size,
        tie_word_embeddings=config.tie_word_embeddings,
        attention_bias=False,
        rope_scaling=rope_scaling,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


def hf_logits(model, tokens_np):
    with torch.no_grad():
        out = model(torch.from_numpy(tokens_np))
    return out.logits.float().numpy()


def framework_logits(model, config, tokens_np, prefill_chunk=None):
    state = {k: v.float().numpy() for k, v in model.state_dict().items()}
    if config.tie_word_embeddings:
        state.pop("lm_head.weight", None)
    params = params_from_hf_state_dict(state, config, dtype=jnp.float32)
    B, T = tokens_np.shape
    eng = Engine(config, params, batch_size=B, max_len=max(2 * T, 64),
                 prefill_chunk=prefill_chunk or T)
    # run as a single decode step from an empty cache -> logits for every pos
    from magicdec_tpu.engine import attention_impls as impls
    from magicdec_tpu.models import llama as llama_lib

    impl = impls.target_attn(config, eng.cache.lengths)
    logits, _ = llama_lib.forward(params, config, jnp.asarray(tokens_np),
                                  impl, (eng.cache.k, eng.cache.v))
    return np.asarray(logits)


CASES = {
    "mha_plain": (ModelArgs(block_size=512, vocab_size=128, n_layer=2, n_head=4,
                            n_kv_head=4, dim=64, intermediate_size=128), None),
    "gqa_plain": (ModelArgs(block_size=512, vocab_size=128, n_layer=2, n_head=4,
                            n_kv_head=2, dim=64, intermediate_size=128), None),
    "tied": (ModelArgs(block_size=512, vocab_size=128, n_layer=2, n_head=4,
                       n_kv_head=2, dim=64, intermediate_size=128,
                       tie_word_embeddings=True), None),
    "linear_rope": (ModelArgs(block_size=512, vocab_size=128, n_layer=2,
                              n_head=4, n_kv_head=2, dim=64,
                              intermediate_size=128, scaling_factor=4.0),
                    {"rope_type": "linear", "factor": 4.0}),
    "llama31_rope": (ModelArgs(block_size=512, vocab_size=128, n_layer=2,
                               n_head=4, n_kv_head=2, dim=64,
                               intermediate_size=128, rope_base=500000.0,
                               scaling_factor=8.0, low_freq_factor=1.0,
                               high_freq_factor=4.0,
                               original_max_position_embeddings=64),
                     {"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64}),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_llama_parity(name):
    config, rope_scaling = CASES[name]
    model = make_hf_llama(config, rope_scaling)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, config.vocab_size, size=(2, 96), dtype=np.int64)
    ref = hf_logits(model, tokens)
    got = framework_logits(model, config, tokens.astype(np.int32))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_qwen_qkv_bias_parity():
    config = ModelArgs(block_size=512, vocab_size=128, n_layer=2, n_head=4,
                       n_kv_head=2, dim=64, intermediate_size=128,
                       qkv_bias=True, norm_eps=1e-6, rope_base=1000000.0)
    hf_cfg = transformers.Qwen2Config(
        vocab_size=config.vocab_size, hidden_size=config.dim,
        intermediate_size=config.intermediate_size,
        num_hidden_layers=config.n_layer, num_attention_heads=config.n_head,
        num_key_value_heads=config.n_kv_head, rms_norm_eps=config.norm_eps,
        rope_theta=config.rope_base, max_position_embeddings=config.block_size,
        tie_word_embeddings=False)
    torch.manual_seed(1)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, config.vocab_size, size=(2, 64), dtype=np.int64)
    ref = hf_logits(model, tokens)
    got = framework_logits(model, config, tokens.astype(np.int32))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_chunked_prefill_plus_decode_matches_full_forward():
    """encode() in 32-token chunks + a decode step == one full HF forward."""
    config, _ = CASES["gqa_plain"]
    model = make_hf_llama(config)
    state = {k: v.float().numpy() for k, v in model.state_dict().items()}
    params = params_from_hf_state_dict(state, config, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, config.vocab_size, size=(2, 65), dtype=np.int64)
    ref = hf_logits(model, tokens)
    ref_next = ref[:, -1, :].argmax(-1)

    eng = Engine(config, params, batch_size=2, max_len=128, prefill_chunk=32)
    next_tok = eng.encode(jnp.asarray(tokens[:, :64], jnp.int32))
    # prefill argmax of position 63 must equal HF argmax at position 63
    np.testing.assert_array_equal(np.asarray(next_tok)[:, 0],
                                  ref[:, 63, :].argmax(-1))
    # decode step on token 64 -> must match HF argmax at position 64
    out = eng.inference(jnp.asarray(tokens[:, 64:65], jnp.int32))
    np.testing.assert_array_equal(np.asarray(out)[:, 0], ref_next)
    np.testing.assert_array_equal(np.asarray(eng.cache.lengths), [65, 65])
