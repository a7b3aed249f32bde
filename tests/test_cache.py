"""Unit tests for KV cache semantics: append, rollback, streaming window."""

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu import cache as cache_lib
from magicdec_tpu.cache import DraftKVCache, KVCache


def test_append_ragged_offsets():
    ck = jnp.zeros((2, 8, 2))  # packed layer [B, S, H*D]
    cv = jnp.zeros((2, 8, 2))
    lengths = jnp.array([1, 3], jnp.int32)
    k_new = jnp.arange(2 * 2 * 1 * 2, dtype=jnp.float32).reshape(2, 2, 1, 2) + 1
    nk, nv = cache_lib.append_layer_kv(ck, cv, k_new, k_new, lengths)
    nk = np.asarray(nk)
    # sequence 0 wrote slots 1..2, sequence 1 wrote slots 3..4
    assert (nk[0, 1:3] != 0).all() and nk[0, 0].sum() == 0 and nk[0, 3:].sum() == 0
    assert (nk[1, 3:5] != 0).all() and nk[1, :3].sum() == 0 and nk[1, 5:].sum() == 0


def test_rollback_is_length_rewind_only():
    c = KVCache.create(1, 2, 8, 1, 2)
    c = c.set_lengths(jnp.array([5, 3], jnp.int32))
    r = c.rollback(jnp.array([2, 4], jnp.int32))
    assert np.asarray(r.lengths).tolist() == [3, 0]
    assert r.k is c.k  # no data movement


def test_streaming_positions_under_and_over_budget():
    budget, sink, size = 8, 2, 12
    lengths = jnp.array([5, 11], jnp.int32)
    pos, valid = cache_lib.streaming_positions(lengths, size, budget, sink)
    pos, valid = np.asarray(pos), np.asarray(valid)
    # seq 0: under budget -> identity positions for the first 5 slots
    assert pos[0, :5].tolist() == [0, 1, 2, 3, 4]
    assert valid[0].tolist() == [True] * 5 + [False] * 7
    # seq 1: 11 entries, live window = last (budget - sink) = 6 -> slots 5..10
    assert valid[1].tolist() == [True, True, False, False, False,
                                 True, True, True, True, True, True, False]
    assert pos[1, :2].tolist() == [0, 1]
    assert pos[1, 5:11].tolist() == [2, 3, 4, 5, 6, 7]


def test_streaming_compact_gathers_sink_and_window():
    budget, sink = 6, 2
    d = DraftKVCache.create(1, 1, 10, 1, 1)
    data = jnp.arange(10, dtype=jnp.float32).reshape(1, 1, 10, 1)
    d = DraftKVCache(data, data, jnp.array([9], jnp.int32),
                     jnp.zeros((1,), jnp.int32))
    out = cache_lib.streaming_compact(d, budget, sink, slack_trigger=8)
    k = np.asarray(out.k)[0, 0, :, 0]
    # sink slots 0,1 kept; window = last (budget-sink)=4 of the 9 entries: 5..8
    assert k[:6].tolist() == [0, 1, 5, 6, 7, 8]
    assert np.asarray(out.lengths).tolist() == [6]
    assert np.asarray(out.evicted).tolist() == [3]


def test_streaming_compact_noop_below_trigger():
    d = DraftKVCache.create(1, 1, 10, 1, 1)
    d = DraftKVCache(d.k, d.v, jnp.array([5], jnp.int32), d.evicted)
    out = cache_lib.streaming_compact(d, 6, 2, slack_trigger=8)
    assert np.asarray(out.lengths).tolist() == [5]
    assert np.asarray(out.evicted).tolist() == [0]


def test_streaming_delta_rotation_matches_remapped_oracle():
    """First-principles check of the sink-twist scheme at NONZERO delta:
    streaming_draft_attn (which stores K rotated at true positions, rotates
    queries at true positions, and twists only the sink keys by -delta) must
    equal the reference semantics — rope applied to RAW keys/queries at the
    REMAPPED positions (sink at 0..sink-1, live window contiguous after)."""
    import jax
    from magicdec_tpu.engine import attention_impls as impls
    from magicdec_tpu.models.config import ModelArgs
    from magicdec_tpu.ops import attention as dense
    from magicdec_tpu.ops.rope import rope

    cfg = ModelArgs(block_size=512, vocab_size=64, n_layer=1, n_head=2,
                    n_kv_head=1, dim=32)
    B, size, sink, budget = 1, 8, 2, 6
    evicted = jnp.array([3], jnp.int32)
    lengths_before = jnp.array([6], jnp.int32)   # appending 1 -> 7
    key = jax.random.PRNGKey(0)
    raw_k = jax.random.normal(key, (B, size, 1, 16))      # raw (unrotated)
    vvals = jax.random.normal(jax.random.fold_in(key, 1), (B, size, 1, 16))
    q_raw = jax.random.normal(jax.random.fold_in(key, 2), (B, 1, 2, 16))
    k_new_raw = raw_k[:, 6:7]                              # appended this step
    v_new = vvals[:, 6:7]

    # cache as the engine stores it: K rotated at TRUE positions
    slot = jnp.arange(size)
    true_pos = jnp.where(slot < sink, slot, evicted[:, None] + slot[None, :])
    k_store = rope(cfg, raw_k, true_pos)
    dk = jnp.zeros((1, B, size, 16))
    dk = dk.at[0, :, :6].set(k_store[:, :6].reshape(B, 6, 16))
    dv = jnp.zeros((1, B, size, 16))
    dv = dv.at[0, :, :6].set(vvals[:, :6].reshape(B, 6, 16))

    impl = impls.streaming_draft_attn(cfg, lengths_before, evicted, budget,
                                      sink)
    ctx, _ = impl(q_raw, k_new_raw, v_new, (dk, dv), jnp.int32(0))

    # oracle: raw K/q rotated at REMAPPED positions
    # lengths_after=7, start=max(sink, 7-(budget-sink))=3, valid={0,1,3..6}
    start = 3
    remap = jnp.where(slot < sink, slot, sink + slot - start)
    k_remap = rope(cfg, raw_k, jnp.broadcast_to(remap[None], (B, size)))
    q_pos = jnp.array([[sink + 6 - start]])                # query slot 6 -> 5
    q_rot = rope(cfg, q_raw, q_pos)
    valid = jnp.array([[True, True, False, True, True, True, True, False]])
    ctx_oracle = dense.masked_attention_general(
        q_rot, k_remap, vvals, valid[:, None, :])
    np.testing.assert_allclose(np.asarray(ctx),
                               np.asarray(ctx_oracle.reshape(B, 1, -1)),
                               rtol=2e-5, atol=2e-5)
