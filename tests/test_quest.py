"""Quest page-selection drafting tests (fork engine parity, SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdec_tpu.cache import KVCache
from magicdec_tpu.engine import quest as quest_lib
from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.spec import generate_autoregressive, generate_selfspec
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs

CFG = ModelArgs.from_name("test-tiny")
B, P, NEW, GAMMA = 2, 512, 32, 3


def test_page_meta_boxes():
    c = KVCache.create(1, 2, 256, 1, 4, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(0), c.k.shape)
    c = KVCache(k, c.v, jnp.array([200, 128], jnp.int32))
    kmin, kmax = quest_lib.make_page_meta(c, page=128)
    assert kmin.shape == (1, 2, 2, 4)
    kf = np.asarray(k)
    # seq 0, page 0 fully valid
    np.testing.assert_allclose(np.asarray(kmin)[0, 0, 0],
                               kf[0, 0, :128].min(0), rtol=1e-6)
    # seq 0, page 1 valid only to slot 200
    np.testing.assert_allclose(np.asarray(kmax)[0, 0, 1],
                               kf[0, 0, 128:200].max(0), rtol=1e-6)
    # seq 1, page 1 empty -> neutral boxes keep it unselectable
    assert np.asarray(kmin)[0, 1, 1].min() > 1e38 / 2


def test_update_page_meta_matches_full_recompute():
    c = KVCache.create(2, 2, 512, 1, 4, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), c.k.shape)
    c = KVCache(k, c.v, jnp.array([300, 420], jnp.int32))
    kmin0, kmax0 = quest_lib.make_page_meta(c, page=128)
    # grow each sequence by 4 tokens
    k2 = k.at[:, 0, 300:304].set(9.0).at[:, 1, 420:424].set(-9.0)
    c2 = KVCache(k2, c.v, c.lengths + 4)
    kmin_inc, kmax_inc = quest_lib.update_page_meta(c2, kmin0, kmax0,
                                                    c.lengths, 4, page=128)
    kmin_full, kmax_full = quest_lib.make_page_meta(c2, page=128)
    np.testing.assert_allclose(np.asarray(kmin_inc), np.asarray(kmin_full))
    np.testing.assert_allclose(np.asarray(kmax_inc), np.asarray(kmax_full))


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(jax.random.PRNGKey(0), CFG, scale=0.3)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                CFG.vocab_size, dtype=jnp.int32)
    eng = Engine(CFG, params, batch_size=B, max_len=P + NEW + 16,
                 prefill_chunk=128)
    base, _ = generate_autoregressive(eng, prompt, NEW)
    return params, prompt, np.asarray(base)


def test_quest_full_coverage_lossless_and_accepting(setup):
    """budget covering the whole prefix -> the draft sees every page, so
    acceptance should be (near-)perfect and the output lossless."""
    params, prompt, base = setup
    eng = Engine(CFG, params, batch_size=B, max_len=P + NEW + GAMMA + 16,
                 spec="quest", draft_budget=P + 128, latest_k=128,
                 prefill_chunk=128)
    out, counts, stats = generate_selfspec(eng, prompt, GAMMA, NEW)
    n = min(int(counts.min()), NEW)
    np.testing.assert_array_equal(np.asarray(out)[:, :n], base[:, :n])
    assert stats.acceptance_rate >= 0.9, stats.acceptance_rate


def test_quest_small_budget_lossless(setup):
    params, prompt, base = setup
    eng = Engine(CFG, params, batch_size=B, max_len=P + NEW + GAMMA + 16,
                 spec="quest", draft_budget=256, latest_k=128,
                 prefill_chunk=128)
    out, counts, stats = generate_selfspec(eng, prompt, GAMMA, NEW)
    n = min(int(counts.min()), NEW)
    np.testing.assert_array_equal(np.asarray(out)[:, :n], base[:, :n])
    assert 0.0 <= stats.acceptance_rate <= 1.0
