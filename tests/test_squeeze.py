"""SqueezedAttention thresholded-cluster drafting tests."""

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.spec import generate_autoregressive, generate_selfspec
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs

CFG = ModelArgs.from_name("test-tiny")
B, P, NEW, GAMMA = 2, 512, 24, 3


def test_squeeze_lossless_and_runs():
    params = llama.init_params(jax.random.PRNGKey(0), CFG, scale=0.3)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                CFG.vocab_size, dtype=jnp.int32)
    eng0 = Engine(CFG, params, batch_size=B, max_len=P + NEW + 16,
                  prefill_chunk=128)
    base, _ = generate_autoregressive(eng0, prompt, NEW)
    eng = Engine(CFG, params, batch_size=B, max_len=P + NEW + GAMMA + 16,
                 spec="squeeze", draft_budget=256, latest_k=64,
                 prefill_chunk=128, retro_cap=16, squeeze_threshold=0.005)
    out, counts, stats = generate_selfspec(eng, prompt, GAMMA, NEW)
    n = min(int(counts.min()), NEW)
    np.testing.assert_array_equal(np.asarray(out)[:, :n],
                                  np.asarray(base)[:, :n])
    assert 0.0 <= stats.acceptance_rate <= 1.0
