"""Flash-decode kernel tests in Pallas interpret mode (run anywhere).

On TPU the kernel is additionally exercised by the verify-skill drive and the
full-budget acceptance==1.0 invariant; these tests pin its semantics (ragged
bounds, interval masks, partial tail blocks, stacked-layer indexing, batch
blocking) against the dense oracle on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdec_tpu.ops import attention as dense
from magicdec_tpu.ops.pallas import flash_decode as fd

L, B, Hkv, G, D = 2, 4, 4, 2, 16
Hq, HD = Hkv * G, Hkv * D


def _mk(S, seed=0):
    key = jax.random.PRNGKey(seed)
    k = jax.random.normal(key, (L, B, S, HD), jnp.float32) * 0.5
    v = jax.random.normal(jax.random.fold_in(key, 1), (L, B, S, HD),
                          jnp.float32)
    return k, v


@pytest.mark.parametrize("S,lens,T", [(256, 200, 1), (256, 200, 4),
                                      (136, 100, 1), (264, 264, 2)])
def test_flash_matches_oracle_ragged(S, lens, T):
    k, v = _mk(S)
    q = jax.random.normal(jax.random.PRNGKey(2), (B, T, Hq, D), jnp.float32)
    lengths = jnp.asarray([lens - T, lens - T - 1, 3, lens - T][:B], jnp.int32)
    valid = dense.decode_valid_upto(lengths, T)
    for l in range(L):
        ref = dense.masked_attention(q, k[l].reshape(B, S, Hkv, D),
                                     v[l].reshape(B, S, Hkv, D), valid)
        out = fd.flash_decode_stacked(q, k, v, jnp.int32(l), valid,
                                      s_block=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_flash_interval_mask_matches_oracle():
    """Sink+window (two-interval) masking against the general dense oracle."""
    S, T = 256, 2
    k, v = _mk(S, seed=3)
    q = jax.random.normal(jax.random.PRNGKey(4), (B, T, Hq, D), jnp.float32)
    sink_end = jnp.full((B, T), 16, jnp.int32)
    lo = jnp.asarray([[64, 64], [80, 80], [100, 100], [64, 66]], jnp.int32)
    hi = lo + 60
    out = fd.flash_decode_intervals(q, k[0], v[0], sink_end, lo, hi,
                                    s_block=128, interpret=True)
    slot = jnp.arange(S)[None, None, :]
    mask = ((slot < sink_end[:, :, None])
            | ((slot >= lo[:, :, None]) & (slot < hi[:, :, None])))
    ref = dense.masked_attention_general(q, k[0].reshape(B, S, Hkv, D),
                                         v[0].reshape(B, S, Hkv, D), mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_nan_in_padded_tail_is_harmless():
    """Partial tail blocks read past the array; NaN there must not leak
    (the 0*NaN P@V poisoning this kernel guards against)."""
    S, T = 136, 1  # s_block 128 -> last block has 8 real rows
    k, v = _mk(S, seed=5)
    q = jax.random.normal(jax.random.PRNGKey(6), (B, T, Hq, D), jnp.float32)
    lengths = jnp.full((B,), 130, jnp.int32)
    valid = dense.decode_valid_upto(lengths, T)
    out = fd.flash_decode_stacked(q, k, v, jnp.int32(0), valid, s_block=128,
                                  interpret=True)
    assert not np.isnan(np.asarray(out)).any()


def test_b_block_partition_is_bitexact():
    S, T = 256, 1
    k, v = _mk(S, seed=7)
    q = jax.random.normal(jax.random.PRNGKey(8), (B, T, Hq, D), jnp.float32)
    valid = dense.decode_valid_upto(jnp.full((B,), 200, jnp.int32), T)
    orig = fd._pick_b_block
    try:
        fd._pick_b_block = lambda *a, **kw: 1
        o1 = fd.flash_decode_stacked.__wrapped__(q, k, v, jnp.int32(0), valid,
                                                 s_block=128, interpret=True)
        fd._pick_b_block = lambda *a, **kw: 4
        o4 = fd.flash_decode_stacked.__wrapped__(q, k, v, jnp.int32(0), valid,
                                                 s_block=128, interpret=True)
    finally:
        fd._pick_b_block = orig
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o4))


def test_page_gather_matches_slices():
    from magicdec_tpu.ops.pallas.page_gather import page_gather

    L2, B2, S2, HD2, page = 2, 3, 512, 128, 128
    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (L2, B2, S2, HD2), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 1), (L2, B2, S2, HD2),
                          jnp.float32)
    pages = jnp.asarray([[0, 3], [2, 2], [1, 0]], jnp.int32)
    for l in (0, 1):
        ks, vs = page_gather(k, v, jnp.int32(l), pages, page=page,
                             interpret=True)
        for b in range(B2):
            for j in range(2):
                p = int(pages[b, j])
                np.testing.assert_array_equal(
                    np.asarray(ks[b, j]),
                    np.asarray(k[l, b, p * page:(p + 1) * page]))
                np.testing.assert_array_equal(
                    np.asarray(vs[b, j]),
                    np.asarray(v[l, b, p * page:(p + 1) * page]))


@pytest.mark.parametrize("S,NS,T", [(256, 128, 1), (264, 96, 2)])
def test_flash_stacked_masked_matches_oracle(S, NS, T):
    """Column-masked variant (round-buffer draft caches): top region
    [0, NS) gated by per-column bits, tail region causal via [lo, hi)."""
    k, v = _mk(S, seed=11)
    q = jax.random.normal(jax.random.PRNGKey(12), (B, T, Hq, D), jnp.float32)
    key = jax.random.PRNGKey(13)
    colmask = jax.random.bernoulli(key, 0.7, (L, B, 1, S)).astype(jnp.int32)
    colmask = colmask.at[:, :, :, NS:].set(1)     # tail bits always 1
    tail_len = jnp.asarray([40, 3, S - NS - T - 1, 17][:B], jnp.int32)
    ns = jnp.full((B, T), NS, jnp.int32)
    hi = NS + tail_len[:, None] + jnp.arange(1, T + 1, dtype=jnp.int32)[None, :]

    col = jnp.arange(S, dtype=jnp.int32)
    for l in range(L):
        mask = ((col[None, None, :] < NS) & (colmask[l][:, 0, :][:, None, :] > 0)
                | ((col[None, None, :] >= NS)
                   & (col[None, None, :] < hi[:, :, None])))
        ref = dense.masked_attention_general(
            q, k[l].reshape(B, S, Hkv, D), v[l].reshape(B, S, Hkv, D), mask)
        out = fd.flash_decode_stacked_masked(q, k, v, jnp.int32(l), colmask,
                                             ns, ns, hi, s_block=128,
                                             interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_page_gather_single_kv_fused():
    from magicdec_tpu.ops.pallas.page_gather import page_gather_single

    L2, B2, R2, HD2, page = 2, 3, 512, 128, 64
    key = jax.random.PRNGKey(0)
    store = jax.random.normal(key, (L2, B2, R2, HD2), jnp.float32)
    ids = jnp.asarray([[0, 7], [3, 3], [5, 1]], jnp.int32)
    for l in (0, 1):
        out = page_gather_single(store, jnp.int32(l), ids, page=page,
                                 interpret=True)
        for b in range(B2):
            for j in range(2):
                p = int(ids[b, j])
                np.testing.assert_array_equal(
                    np.asarray(out[b, j]),
                    np.asarray(store[l, b, p * page:(p + 1) * page]))


def test_flash_prefill_dma_skip_blocks():
    """Blocks past EVERY sequence's causal bound are class 0: their K/V
    index_map repeats the last needed block (the pipeline skips the copy on
    the real chip). The kernel must still match the oracle — the clamped
    fetch may only co-occur with skipped compute."""
    S, T, cap = 512, 16, 512
    k, v = _mk(S, seed=31)
    q = jax.random.normal(jax.random.PRNGKey(32), (B, T, Hq, D), jnp.float32)
    # every bound < 128: blocks 1..3 of the 4-block grid are all-empty
    lengths = jnp.asarray([100, 64, 3, 90][:B], jnp.int32)
    valid = dense.decode_valid_upto(lengths, T)
    for l in range(L):
        ref = dense.masked_attention(q, k[l].reshape(B, S, Hkv, D),
                                     v[l].reshape(B, S, Hkv, D), valid)
        out = fd.flash_prefill(q, k, v, jnp.int32(l), valid, s_block=128,
                               s_cap=cap, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("S,T,cap", [(256, 32, 256), (384, 16, 256)])
def test_flash_prefill_matches_oracle(S, T, cap):
    """h-grouped prefill kernel == dense oracle under ragged causal bounds
    (and an s_cap that stops the S-grid early)."""
    k, v = _mk(S, seed=21)
    q = jax.random.normal(jax.random.PRNGKey(22), (B, T, Hq, D), jnp.float32)
    lengths = jnp.asarray([cap - T, 100, 3, cap - T - 5][:B], jnp.int32)
    valid = dense.decode_valid_upto(lengths, T)
    for l in range(L):
        ref = dense.masked_attention(q, k[l].reshape(B, S, Hkv, D),
                                     v[l].reshape(B, S, Hkv, D), valid)
        out = fd.flash_prefill(q, k, v, jnp.int32(l), valid, s_block=128,
                               s_cap=cap, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
