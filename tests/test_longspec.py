"""Standalone-draft (two-model) speculative decoding tests.

Invariants mirrored from the reference's longspec drivers (SURVEY.md §3.3):
  * losslessness: emitted tokens == the target's own autoregressive argmax
    stream, whatever the draft model or compression mode;
  * self-draft sanity: when the draft IS the target (same weights, full KV),
    acceptance must be exactly 1.0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.longspec import LongSpecEngine
from magicdec_tpu.engine.spec import generate_autoregressive
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs

TCFG = ModelArgs.from_name("test-tiny")
DCFG = ModelArgs.from_name("test-tiny").replace(n_layer=1, dim=64, n_head=2,
                                                n_kv_head=1,
                                                intermediate_size=128)
B, P, NEW, GAMMA = 2, 256, 24, 3


@pytest.fixture(scope="module")
def setup():
    tparams = llama.init_params(jax.random.PRNGKey(0), TCFG, scale=0.3)
    dparams = llama.init_params(jax.random.PRNGKey(7), DCFG, scale=0.3)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                TCFG.vocab_size, dtype=jnp.int32)
    eng = Engine(TCFG, tparams, batch_size=B, max_len=P + NEW + 16,
                 prefill_chunk=128)
    base, _ = generate_autoregressive(eng, prompt, NEW)
    return tparams, dparams, prompt, np.asarray(base)


def _run(setup, draft_cfg, draft_params, spec, budget):
    tparams, _, prompt, base = setup
    target = Engine(TCFG, tparams, batch_size=B, max_len=P + NEW + 16,
                    prefill_chunk=128)
    draft = Engine(draft_cfg, draft_params, batch_size=B,
                   max_len=P + NEW + GAMMA + 16, spec=spec,
                   draft_budget=budget or 0, window_size=16,
                   prefill_chunk=128)
    eng = LongSpecEngine(target, draft)
    out, counts, stats = eng.generate(prompt, GAMMA, NEW)
    n = min(int(counts.min()), NEW)
    np.testing.assert_array_equal(np.asarray(out)[:, :n], base[:, :n])
    return stats


def test_self_draft_full_kv_accepts_everything(setup):
    tparams = setup[0]
    stats = _run(setup, TCFG, tparams, spec=None, budget=None)
    assert stats.acceptance_rate == 1.0


def test_small_draft_full_kv_lossless(setup):
    _, dparams = setup[:2]
    stats = _run(setup, DCFG, dparams, spec=None, budget=None)
    assert 0.0 <= stats.acceptance_rate <= 1.0


def test_small_draft_snapkv_budget_lossless(setup):
    _, dparams = setup[:2]
    _run(setup, DCFG, dparams, spec="snapkv", budget=128)


def test_small_draft_streaming_budget_lossless(setup):
    _, dparams = setup[:2]
    _run(setup, DCFG, dparams, spec="streaming", budget=128)


def test_self_draft_snapkv_full_budget_accepts_everything(setup):
    """Compressed-mode plumbing check: budget == prefix keeps every key, so a
    self-draft must still accept everything."""
    tparams = setup[0]
    stats = _run(setup, TCFG, tparams, spec="snapkv", budget=P)
    assert stats.acceptance_rate == 1.0
