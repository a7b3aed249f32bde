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


def test_streaming_refeed_preserves_fresh_slots(params, prompt):
    """The round's T=2 re-feed must NOT overwrite the last accepted token's
    K/V when its slot is fresh (stale=False): XLA's matmul numerics differ
    between prefill and decode shapes, so re-computed K/V can change low
    bits and break the full-budget bit-exactness invariant (observed on
    llama-3.2-1b dims, TPU). Plant sentinel bits and check they survive."""
    from magicdec_tpu.engine.spec import streaming_round, _eot_array
    from magicdec_tpu.cache import DraftKVCache

    budget = PREFIX + MAX_NEW + 16
    eng = Engine(CFG, params, batch_size=B, max_len=256, prefill_chunk=32,
                 spec="streaming", draft_budget=budget, sink_size=4)
    buffer0 = eng.encode(prompt)
    last_acc = prompt[:, -1:]
    d = eng.draft
    d = DraftKVCache(d.k, d.v, d.lengths - 1, d.evicted)
    slot = int(d.lengths[0])
    sentinel_k = jnp.full_like(d.k[:, :, slot], 7.25)
    d = DraftKVCache(d.k.at[:, :, slot].set(sentinel_k), d.v, d.lengths,
                     d.evicted)

    out = jnp.zeros((B, MAX_NEW + 8), jnp.int32)
    gc = jnp.zeros((B,), jnp.int32)
    stale = jnp.zeros((B,), bool)
    (_, new_draft, _, _, new_stale, _, _, _) = streaming_round(
        eng.params, eng.config, eng.cache, d, buffer0, last_acc, stale, out,
        gc, _eot_array(()), 3, budget, eng.sink_size)
    np.testing.assert_array_equal(np.asarray(new_draft.k[:, :, slot]),
                                  np.asarray(sentinel_k))
    # ...and with stale=True the slot IS (re)written (fresh engine: the
    # jitted round donates its cache buffers)
    eng2 = Engine(CFG, params, batch_size=B, max_len=256, prefill_chunk=32,
                  spec="streaming", draft_budget=budget, sink_size=4)
    buffer0b = eng2.encode(prompt)
    d2 = eng2.draft
    d2 = DraftKVCache(d2.k.at[:, :, slot].set(sentinel_k), d2.v,
                      jnp.full_like(d2.lengths, slot), d2.evicted)
    out2 = jnp.zeros((B, MAX_NEW + 8), jnp.int32)
    gc2 = jnp.zeros((B,), jnp.int32)
    (_, new_draft2, _, _, _, _, _, _) = streaming_round(
        eng2.params, eng2.config, eng2.cache, d2, buffer0b, last_acc,
        jnp.ones((B,), bool), out2, gc2, _eot_array(()), 3, budget,
        eng2.sink_size)
    assert not np.array_equal(np.asarray(new_draft2.k[:, :, slot]),
                              np.asarray(sentinel_k))


def test_acceptance_counters_consistent(params, prompt):
    out, counts, stats = _spec_tokens(params, prompt, "snapkv", budget=PREFIX,
                                      gamma=3, window_size=16, sink_size=4)
    # every round emits accept_nums tokens; bonus added at the end
    assert stats.generated_tokens == int(counts.sum())
    assert stats.rounds >= MAX_NEW // (3 + 1)
