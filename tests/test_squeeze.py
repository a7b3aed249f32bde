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


def test_squeeze_selection_rule_matches_oracle():
    """squeeze_select == an explicit numpy oracle of the mass-threshold rule:
    rank clusters by count-weighted softmax(q . centroid) mass, keep those
    whose normalized mass clears the threshold (bounded by max_clusters)."""
    from magicdec_tpu.engine.squeeze import squeeze_select

    rng = np.random.default_rng(0)
    Bq, T, C, maxC, thr = 3, 2, 8, 4, 0.12
    Hq, Hkv, Dh = CFG.n_head, CFG.n_kv_head, CFG.head_dim
    G = Hq // Hkv
    q = rng.normal(size=(Bq, T, Hq, Dh)).astype(np.float32)
    cent = rng.normal(size=(Bq, C, Hkv * Dh)).astype(np.float32)
    counts = rng.integers(1, 20, size=(Bq, C)).astype(np.float32)

    top_c, keep = squeeze_select(CFG, jnp.asarray(q), jnp.asarray(cent),
                                 jnp.asarray(counts), max_clusters=maxC,
                                 threshold=thr)
    top_c, keep = np.asarray(top_c), np.asarray(keep)

    qg = q.reshape(Bq, T, Hkv, G, Dh)
    cg = cent.reshape(Bq, C, Hkv, Dh)
    logit = np.einsum("bthgd,bchd->bthgc", qg, cg) / np.sqrt(Dh)
    e = np.exp(logit - logit.max(-1, keepdims=True))
    w = e / e.sum(-1, keepdims=True) * counts[:, None, None, None, :]
    mass = w.sum(axis=(1, 2, 3))
    mass = mass / mass.sum(-1, keepdims=True)
    for b in range(Bq):
        want = set(np.argsort(-mass[b])[:maxC])
        assert set(top_c[b]) == want
        for j in range(maxC):
            assert keep[b, j] == (mass[b, top_c[b, j]] >= thr)
    # at least one cluster always survives, and the rule is non-trivial here
    assert keep[:, 0].all() and not keep.all()


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
