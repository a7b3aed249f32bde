"""RetroInfer-style clustered-KV drafting tests + native wave buffer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdec_tpu.cache import KVCache
from magicdec_tpu.engine import retro as retro_lib
from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.spec import generate_autoregressive, generate_selfspec
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops.kmeans import kmeans

CFG = ModelArgs.from_name("test-tiny")
B, P, NEW, GAMMA = 2, 512, 24, 3


def test_kmeans_separates_blobs():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (64, 8)) * 0.1 + 5.0
    b = jax.random.normal(jax.random.fold_in(key, 1), (64, 8)) * 0.1 - 5.0
    x = jnp.concatenate([a, b])[None]
    valid = jnp.ones((1, 128))
    cent, assign = kmeans(x, valid, n_clusters=2, iters=6)
    assign = np.asarray(assign)[0]
    assert len(set(assign[:64])) == 1 and len(set(assign[64:])) == 1
    assert assign[0] != assign[64]


def test_cluster_index_slots_cover_members():
    c = KVCache.create(1, 1, 256, 2, 8, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), c.k.shape)
    c = KVCache(k, c.v, jnp.array([200], jnp.int32))
    cent, slots = retro_lib.build_cluster_index(CFG.replace(n_kv_head=2,
                                                            n_head=4, dim=32),
                                                c, n_clusters=8, cap=64)
    s = np.asarray(slots)[0, 0]           # [H, C, cap]
    for h in range(2):
        members = s[h][s[h] >= 0]
        assert len(np.unique(members)) == len(members)
        assert (members < 200).all()
        assert len(members) == 200        # every valid slot indexed once


def test_wave_buffer_roundtrip():
    from magicdec_tpu.engine.wave_buffer import HostWaveBuffer
    rng = np.random.default_rng(0)
    data = rng.standard_normal((32, 64)).astype(np.float32)
    buf = HostWaveBuffer(32, 64 * 4)
    buf.put(0, data)
    ids = np.array([5, 0, 31, 7, 7], np.int64)
    out = buf.gather(ids).view(np.float32).reshape(5, 64)
    np.testing.assert_array_equal(out, data[ids])
    assert buf.gathered_slots == 5


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(jax.random.PRNGKey(0), CFG, scale=0.3)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                CFG.vocab_size, dtype=jnp.int32)
    eng = Engine(CFG, params, batch_size=B, max_len=P + NEW + 16,
                 prefill_chunk=128)
    base, _ = generate_autoregressive(eng, prompt, NEW)
    return params, prompt, np.asarray(base)


def test_retro_lossless(setup):
    params, prompt, base = setup
    eng = Engine(CFG, params, batch_size=B, max_len=P + NEW + GAMMA + 16,
                 spec="retro", draft_budget=256, latest_k=64,
                 prefill_chunk=128, retro_cap=16)
    out, counts, stats = generate_selfspec(eng, prompt, GAMMA, NEW)
    n = min(int(counts.min()), NEW)
    np.testing.assert_array_equal(np.asarray(out)[:, :n], base[:, :n])
    assert 0.0 <= stats.acceptance_rate <= 1.0


def test_host_cluster_store_gather(setup):
    params, prompt, _ = setup
    cfg = CFG
    eng = Engine(cfg, params, batch_size=B, max_len=P + 16, prefill_chunk=128)
    eng.encode(prompt)
    cent, slots = retro_lib.build_cluster_index(cfg, eng.cache, n_clusters=8,
                                                cap=96)
    store = retro_lib.HostClusterStore(cfg, eng.cache, slots, cap=96)
    top_c = np.zeros((B, cfg.n_kv_head, 2), np.int64)
    top_c[..., 1] = 3
    blocks = store.gather_clusters(0, top_c)
    assert blocks.shape == (B, cfg.n_kv_head, 2, 2, 96, cfg.head_dim)
    # cross-check one block against a direct device-side gather
    s = np.clip(np.asarray(slots)[0, 0, 0, 0], 0, eng.cache.k.shape[2] - 1)
    k_dev = np.asarray(eng.cache.k).reshape(
        cfg.n_layer, B, -1, cfg.n_kv_head, cfg.head_dim)[0, 0, :, 0][s]
    np.testing.assert_array_equal(blocks[0, 0, 0, 0], k_dev)
