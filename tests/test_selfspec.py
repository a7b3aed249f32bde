"""End-to-end self-speculation properties on tiny random models.

Key invariant (the reference's implicit correctness test, SURVEY.md §4): with a
draft budget covering the FULL context, the draft path is numerically identical
to the target path, so greedy acceptance must be 100% and the speculative
output must equal the autoregressive output token-for-token. With a small
budget, outputs must still be exactly the autoregressive outputs (speculative
decoding is lossless) — only the acceptance rate changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.spec import generate_autoregressive, generate_selfspec
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.models.llama import init_params

CFG = ModelArgs(block_size=512, vocab_size=512, n_layer=2, n_head=4,
                n_kv_head=2, dim=64, intermediate_size=128)
B, PREFIX, MAX_NEW = 2, 64, 24


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG, jnp.float32, scale=0.5)


@pytest.fixture(scope="module")
def prompt():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.integers(0, CFG.vocab_size, size=(B, PREFIX)),
                       jnp.int32)


@pytest.fixture(scope="module")
def baseline_tokens(params, prompt):
    eng = Engine(CFG, params, batch_size=B, max_len=256, prefill_chunk=32)
    out, _ = generate_autoregressive(eng, prompt, MAX_NEW)
    return np.asarray(out)


def _spec_tokens(params, prompt, spec, budget, gamma, **kw):
    eng = Engine(CFG, params, batch_size=B, max_len=256, prefill_chunk=32,
                 spec=spec, draft_budget=budget, **kw)
    out, counts, stats = generate_selfspec(eng, prompt, gamma=gamma,
                                           max_new_tokens=MAX_NEW)
    return np.asarray(out), np.asarray(counts), stats


@pytest.mark.parametrize("spec", ["snapkv", "streaming"])
@pytest.mark.parametrize("gamma", [1, 3])
def test_full_budget_accepts_everything(params, prompt, baseline_tokens,
                                        spec, gamma):
    budget = PREFIX if spec == "snapkv" else PREFIX + MAX_NEW + gamma + 4
    out, counts, stats = _spec_tokens(params, prompt, spec, budget, gamma,
                                      window_size=16, sink_size=4)
    assert stats.acceptance_rate == pytest.approx(1.0), stats
    for b in range(B):
        n = min(counts[b], MAX_NEW)
        np.testing.assert_array_equal(out[b, :n], baseline_tokens[b, :n])


@pytest.mark.parametrize("spec", ["snapkv", "streaming"])
def test_small_budget_is_lossless(params, prompt, baseline_tokens, spec):
    out, counts, stats = _spec_tokens(params, prompt, spec, budget=32, gamma=3,
                                      window_size=8, sink_size=4)
    # speculative decoding never changes the emitted tokens, only the speed
    for b in range(B):
        n = min(counts[b], MAX_NEW)
        assert n > 0
        np.testing.assert_array_equal(out[b, :n], baseline_tokens[b, :n])
    assert 0.0 <= stats.acceptance_rate <= 1.0


def test_acceptance_counters_consistent(params, prompt):
    out, counts, stats = _spec_tokens(params, prompt, "snapkv", budget=PREFIX,
                                      gamma=3, window_size=16, sink_size=4)
    # every round emits accept_nums tokens; bonus added at the end
    assert stats.generated_tokens == int(counts.sum())
    assert stats.rounds >= MAX_NEW // (3 + 1)
