"""Continuous batching (engine/serve.py): per-request streams must be
IDENTICAL to a standalone generation of the same prompt — row recycling and
frame co-tenancy may change throughput, never tokens."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.serve import Request, ServeEngine
from magicdec_tpu.engine.spec import generate_selfspec
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.models.llama import init_params

CFG = ModelArgs(block_size=512, vocab_size=512, n_layer=2, n_head=4,
                n_kv_head=2, dim=64, intermediate_size=128)
PREFIX, BUDGET, GAMMA = 64, 32, 3
MAX_LEN = 256


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG, jnp.float32, scale=0.5)


@pytest.fixture(scope="module")
def prompts():
    rng = np.random.default_rng(11)
    return [rng.integers(0, CFG.vocab_size, size=(PREFIX,)).astype(np.int32)
            for _ in range(5)]


def _solo(params, prompt, max_new):
    """The stream a standalone engine emits for this prompt."""
    eng = Engine(CFG, params, batch_size=1, max_len=MAX_LEN, prefill_chunk=32,
                 spec="snapkv", draft_budget=BUDGET)
    out, counts, _ = generate_selfspec(eng, jnp.asarray(prompt)[None, :],
                                       gamma=GAMMA, max_new_tokens=max_new)
    return np.asarray(out[0, :max_new])


def test_serve_streams_equal_solo_runs(params, prompts):
    """5 requests with distinct lengths through a 2-row frame: every
    completion must equal the standalone stream, and every row must have
    been recycled (5 > 2)."""
    new_lens = [10, 17, 24, 8, 15]
    reqs = [Request(i, p, n) for i, (p, n) in enumerate(zip(prompts,
                                                            new_lens))]
    srv = ServeEngine(CFG, params, batch_size=2, max_len=MAX_LEN,
                      draft_budget=BUDGET, gamma=GAMMA, max_new_cap=32,
                      prefill_chunk=32)
    done = srv.run(reqs)
    assert sorted(c.req_id for c in done) == list(range(5))
    for c in done:
        want = _solo(params, prompts[c.req_id], new_lens[c.req_id])
        np.testing.assert_array_equal(
            c.tokens, want[:len(c.tokens)],
            err_msg=f"request {c.req_id} stream diverged under serving")
        assert len(c.tokens) == new_lens[c.req_id]


def test_serve_eot_clips_stream(params, prompts):
    """A request whose solo stream contains token X, served with eot=X,
    must stop at X's first occurrence."""
    solo = _solo(params, prompts[0], 24)
    eot_tok = int(solo[5])
    cut = int(np.nonzero(solo == eot_tok)[0][0])
    srv = ServeEngine(CFG, params, batch_size=2, max_len=MAX_LEN,
                      draft_budget=BUDGET, gamma=GAMMA, max_new_cap=32,
                      prefill_chunk=32, eot_ids=(eot_tok,))
    done = srv.run([Request(0, prompts[0], 24)])
    assert len(done) == 1
    np.testing.assert_array_equal(done[0].tokens, solo[:cut + 1])


def test_serve_more_requests_than_frame(params, prompts):
    """Occupancy accounting: the frame serves the queue in fewer rounds than
    5 sequential solo runs would take (row recycling overlaps requests)."""
    reqs = [Request(i, p, 12) for i, p in enumerate(prompts)]
    srv = ServeEngine(CFG, params, batch_size=2, max_len=MAX_LEN,
                      draft_budget=BUDGET, gamma=GAMMA, max_new_cap=16,
                      prefill_chunk=32)
    done = srv.run(reqs)
    assert len(done) == 5
    solo_rounds = sum(c.rounds for c in done)
    assert srv.rounds < solo_rounds, (srv.rounds, solo_rounds)
