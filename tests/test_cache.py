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
