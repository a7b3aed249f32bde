"""Host-offload clustered-KV generation (the capacity path).

The reference serves RetroInfer decode from a CPU wave buffer
(retroinfer_cache.py:540, wave_buffer_cpu.cpp:261); here the equivalent
io_callback-per-layer decode must produce EXACTLY the tokens of the
on-device twin (same selection, same attention, different block source).
"""

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu.engine import offload
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs

CFG = ModelArgs(block_size=512, vocab_size=512, n_layer=2, n_head=4,
                n_kv_head=2, dim=64, intermediate_size=128)
B, P, NEW = 2, 256, 12
NCLUST, CAP, NPROBE, KEEP = 16, 32, 4, 64


def _setup():
    params = llama.init_params(jax.random.PRNGKey(0), CFG, jnp.float32,
                               scale=0.4)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                CFG.vocab_size, dtype=jnp.int32)
    HD = CFG.n_kv_head * CFG.head_dim
    store = offload.HostBlockStore(CFG.n_layer, B, NCLUST, CAP, HD,
                                   np.float32)
    state, buffer0 = offload.offload_prefill(
        params, CFG, store, prompt, n_clusters=NCLUST, cap=CAP,
        tail_keep=KEEP)
    return params, store, state, buffer0


def test_host_offload_decode_equals_device_twin():
    params, store, state, buffer0 = _setup()
    out_host, _ = offload.offload_generate(
        params, CFG, state, store, buffer0, NEW, nprobe=NPROBE, cap=CAP)

    # on-device twin: same blocks, gathered from a device array
    blocks = np.stack([store.gather_clusters(l, np.tile(np.arange(NCLUST),
                                                        (B, 1)))
                       for l in range(CFG.n_layer)])
    dev_blocks = jnp.asarray(blocks.reshape(CFG.n_layer, B, NCLUST, 2, CAP,
                                            -1))
    out_dev, _ = offload.offload_generate(
        params, CFG, state, store, buffer0, NEW, nprobe=NPROBE, cap=CAP,
        fetch_fn=offload.device_fetch_fn(dev_blocks))
    np.testing.assert_array_equal(np.asarray(out_host), np.asarray(out_dev))
    assert store.buf.gathered_slots > 0      # the host path really served


def test_offload_prefill_matches_dense_forward_logits():
    """Layer-at-a-time prefill == the standard full-cache forward (same
    weights, same prompt -> same first generated token)."""
    from magicdec_tpu.engine.backend import Engine

    params, store, state, buffer0 = _setup()
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                CFG.vocab_size, dtype=jnp.int32)
    eng = Engine(CFG, params, batch_size=B, max_len=P + 16, prefill_chunk=128)
    tok = eng.encode(prompt)
    np.testing.assert_array_equal(np.asarray(buffer0), np.asarray(tok))


def test_hostloop_decode_equals_io_callback_decode():
    """The tunnel-safe host-driven decode must be token-identical to the
    io_callback decode (same selection, same attention)."""
    params, store, state, buffer0 = _setup()
    out_cb, _ = offload.offload_generate(
        params, CFG, state, store, buffer0, NEW, nprobe=NPROBE, cap=CAP)
    out_hl, _ = offload.offload_generate_hostloop(
        params, CFG, state, store, buffer0, NEW, nprobe=NPROBE, cap=CAP)
    np.testing.assert_array_equal(np.asarray(out_cb), np.asarray(out_hl))


def test_spec_over_offload_lossless_vs_hostloop():
    """Speculation over the offloaded store: the emitted stream must equal
    the AR hostloop's stream position-for-position (the verify runs the
    exact per-token clustered-attention program, so greedy acceptance is
    lossless), while issuing one host gather per LAYER per ROUND instead of
    per token."""
    params, store, state, buffer0 = _setup()
    out_ar, _ = offload.offload_generate_hostloop(
        params, CFG, state, store, buffer0, NEW, nprobe=NPROBE, cap=CAP)
    before = store.buf.gathered_slots
    out_sp, _, stats = offload.offload_generate_spec(
        params, CFG, state, store, buffer0, NEW, gamma=3, nprobe=NPROBE,
        cap=CAP)
    n = NEW
    np.testing.assert_array_equal(np.asarray(out_sp)[:, :n],
                                  np.asarray(out_ar)[:, :n])
    # host-hop economy: gathers happen per (layer, round), not per token,
    # and the union-dedup fetch caps them at U unique clusters per sequence
    U = min(NCLUST, (3 + 1) * NPROBE)
    assert stats["rounds"] * CFG.n_layer * B * U \
        == store.buf.gathered_slots - before


def test_lru_spec_stream_identical_and_fewer_host_fetches():
    """The device-resident cluster LRU (reference BufferManager analog) must
    leave the emitted stream bit-identical — it only changes WHERE block
    bytes are fetched from — while cutting host-link slot fetches by the
    cross-round hit rate."""
    params, store, state, buffer0 = _setup()
    out_plain, _, _ = offload.offload_generate_spec(
        params, CFG, state, store, buffer0, NEW, gamma=3, nprobe=NPROBE,
        cap=CAP)

    lru = offload.ClusterLRU(store, nslots=NCLUST)
    before = store.buf.gathered_slots
    out_lru, _, stats = offload.offload_generate_spec(
        params, CFG, state, store, buffer0, NEW, gamma=3, nprobe=NPROBE,
        cap=CAP, lru=lru)
    fetched = store.buf.gathered_slots - before
    np.testing.assert_array_equal(np.asarray(out_lru), np.asarray(out_plain))
    U = min(NCLUST, (3 + 1) * NPROBE)
    plain_fetches = stats["rounds"] * CFG.n_layer * B * U
    assert lru.misses == fetched
    assert lru.hits > 0 and fetched < plain_fetches
    assert lru.hit_rate > 0.3, lru.hit_rate     # adjacent rounds overlap


def test_lru_hostloop_stream_identical():
    """AR offload decode through the LRU == plain AR offload decode."""
    params, store, state, buffer0 = _setup()
    out_plain, _ = offload.offload_generate_hostloop(
        params, CFG, state, store, buffer0, NEW, nprobe=NPROBE, cap=CAP)
    lru = offload.ClusterLRU(store, nslots=NPROBE + 2)   # tiny: force evicts
    out_lru, _ = offload.offload_generate_hostloop(
        params, CFG, state, store, buffer0, NEW, nprobe=NPROBE, cap=CAP,
        lru=lru)
    np.testing.assert_array_equal(np.asarray(out_lru), np.asarray(out_plain))
    assert lru.misses > 0
