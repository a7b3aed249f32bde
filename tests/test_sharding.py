"""Tensor-parallel correctness on a virtual 8-device CPU mesh.

The invariant the reference can never test without 8 GPUs (SURVEY.md §4):
sharded execution must produce the SAME tokens as single-device execution —
TP/GSPMD is a layout change, not a numerics change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.spec import generate_autoregressive, generate_selfspec
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.models.llama import init_params
from magicdec_tpu.parallel import sharding as shard_lib

CFG = ModelArgs(block_size=512, vocab_size=512, n_layer=2, n_head=8,
                n_kv_head=4, dim=128, intermediate_size=256)
B, PREFIX, MAX_NEW = 4, 64, 16


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG, jnp.float32, scale=0.5)


@pytest.fixture(scope="module")
def prompt():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.integers(0, CFG.vocab_size, size=(B, PREFIX)),
                       jnp.int32)


def test_mesh_construction():
    mesh = shard_lib.make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(AssertionError):
        shard_lib.make_mesh(dp=3, tp=3)


def test_param_sharding_layouts(params):
    mesh = shard_lib.make_mesh(dp=2, tp=4)
    sharded = shard_lib.shard_params(params, mesh, CFG)
    wqkv = sharded["layers"]["wqkv"]
    # each tp shard owns whole KV groups: shard width divisible by (G+2)*Dh
    G = CFG.n_head // CFG.n_kv_head
    shard_cols = wqkv.sharding.shard_shape(wqkv.shape)[2]
    assert shard_cols % ((G + 2) * CFG.head_dim) == 0
    emb = sharded["tok_embeddings"]
    assert emb.sharding.shard_shape(emb.shape)[0] == CFG.vocab_size // 4


def test_tp_baseline_matches_single_device(params, prompt):
    ref_eng = Engine(CFG, params, batch_size=B, max_len=128, prefill_chunk=32)
    ref, _ = generate_autoregressive(ref_eng, prompt, MAX_NEW)

    mesh = shard_lib.make_mesh(dp=2, tp=4)
    eng = Engine(CFG, params, batch_size=B, max_len=128, prefill_chunk=32,
                 mesh=mesh)
    got, _ = generate_autoregressive(eng, prompt, MAX_NEW)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_tp_selfspec_matches_single_device(params, prompt):
    ref_eng = Engine(CFG, params, batch_size=B, max_len=128, prefill_chunk=32,
                     spec="snapkv", draft_budget=32, window_size=8, sink_size=4)
    ref, ref_counts, _ = generate_selfspec(ref_eng, prompt, gamma=2,
                                           max_new_tokens=MAX_NEW)

    mesh = shard_lib.make_mesh(dp=2, tp=4)
    eng = Engine(CFG, params, batch_size=B, max_len=128, prefill_chunk=32,
                 spec="snapkv", draft_budget=32, window_size=8, sink_size=4,
                 mesh=mesh)
    got, counts, _ = generate_selfspec(eng, prompt, gamma=2,
                                       max_new_tokens=MAX_NEW)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_counts))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_validate_tp_rejects_uneven():
    with pytest.raises(AssertionError):
        shard_lib.validate_tp(CFG, 3)


def test_pad_model_for_tp_exact_and_sharded():
    """Uneven KV-head TP (reference Engine/tp.py:36-52 remainder heads): the
    zero-weight head padding must (a) leave logits bit-identical and (b) make
    the padded model shardable and token-equal on the mesh."""
    cfg = ModelArgs(block_size=512, vocab_size=512, n_layer=2, n_head=6,
                    n_kv_head=3, dim=192, intermediate_size=256)
    params = init_params(jax.random.PRNGKey(1), cfg, jnp.float32, scale=0.5)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, PREFIX)),
                      jnp.int32)

    pparams, pcfg = shard_lib.pad_model_for_tp(params, cfg, 4)
    assert pcfg.n_kv_head == 4 and pcfg.n_head == 8
    assert pcfg.head_dim == cfg.head_dim

    ref_eng = Engine(cfg, params, batch_size=B, max_len=128, prefill_chunk=32)
    ref, _ = generate_autoregressive(ref_eng, ids, MAX_NEW)
    pad_eng = Engine(pcfg, pparams, batch_size=B, max_len=128,
                     prefill_chunk=32)
    got, _ = generate_autoregressive(pad_eng, ids, MAX_NEW)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    mesh = shard_lib.make_mesh(dp=2, tp=4)
    sh_eng = Engine(pcfg, pparams, batch_size=B, max_len=128, prefill_chunk=32,
                    mesh=mesh)
    got_sh, _ = generate_autoregressive(sh_eng, ids, MAX_NEW)
    np.testing.assert_array_equal(np.asarray(got_sh), np.asarray(ref))


def test_flash_stacked_sharded_equals_unsharded():
    """The shard_mapped flash-decode kernel (dp x tp mesh) must be bit-equal
    to the single-device kernel: attention is per-KV-head, so the tp split
    needs zero collectives and introduces no numeric change."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from magicdec_tpu.engine.attention_impls import _flash_stacked
    from magicdec_tpu.ops.pallas.flash_decode import flash_decode_stacked

    L, Bk, S, Hkv, G, D = 2, 4, 256, 4, 2, 32
    Hq, HD, T = Hkv * G, Hkv * D, 3
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (Bk, T, Hq, D), jnp.float32)
    ck = jax.random.normal(jax.random.PRNGKey(1), (L, Bk, S, HD), jnp.float32)
    cv = jax.random.normal(jax.random.PRNGKey(2), (L, Bk, S, HD), jnp.float32)
    valid = jnp.asarray([[100, 101, 102], [256, 256, 256],
                         [7, 8, 9], [130, 131, 132]], jnp.int32)
    layer = jnp.int32(1)

    ref = flash_decode_stacked(q, ck, cv, layer, valid, interpret=True)

    mesh = shard_lib.make_mesh(dp=2, tp=4)
    qs = jax.device_put(q, NamedSharding(mesh, P("dp", None, "tp", None)))
    cks = jax.device_put(ck, NamedSharding(mesh, P(None, "dp", None, "tp")))
    cvs = jax.device_put(cv, NamedSharding(mesh, P(None, "dp", None, "tp")))
    vs = jax.device_put(valid, NamedSharding(mesh, P("dp", None)))
    got = _flash_stacked(qs, cks, cvs, layer, vs, mesh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_tp_selfspec_flash_kernel_matches_single_device(params, prompt):
    """VERDICT r1 #1: the flash path must stay ON under a multi-device mesh
    (no process-wide dense fallback), with outputs bit-equal to the
    single-device flash run. Forced-flash mode runs the kernels in interpret
    mode on CPU — the same shard_mapped program the TPU executes."""
    from magicdec_tpu.engine import attention_impls as impls

    impls.set_attend_mode("flash")
    try:
        ref_eng = Engine(CFG, params, batch_size=B, max_len=128,
                         prefill_chunk=32, spec="snapkv", draft_budget=32,
                         window_size=8, sink_size=4)
        ref, ref_counts, _ = generate_selfspec(ref_eng, prompt, gamma=2,
                                               max_new_tokens=MAX_NEW)

        mesh = shard_lib.make_mesh(dp=2, tp=4)
        eng = Engine(CFG, params, batch_size=B, max_len=128, prefill_chunk=32,
                     spec="snapkv", draft_budget=32, window_size=8,
                     sink_size=4, mesh=mesh)
        got, counts, _ = generate_selfspec(eng, prompt, gamma=2,
                                           max_new_tokens=MAX_NEW)
    finally:
        impls.set_attend_mode("auto")
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_counts))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_tp_streaming_flash_kernel_matches_single_device(params, prompt):
    """Streaming's interval-flash draft path under the mesh, bit-equal."""
    from magicdec_tpu.engine import attention_impls as impls

    impls.set_attend_mode("flash")
    try:
        ref_eng = Engine(CFG, params, batch_size=B, max_len=128,
                         prefill_chunk=32, spec="streaming", draft_budget=48,
                         sink_size=4)
        ref, ref_counts, _ = generate_selfspec(ref_eng, prompt, gamma=2,
                                               max_new_tokens=MAX_NEW)

        mesh = shard_lib.make_mesh(dp=2, tp=4)
        eng = Engine(CFG, params, batch_size=B, max_len=128, prefill_chunk=32,
                     spec="streaming", draft_budget=48, sink_size=4, mesh=mesh)
        got, counts, _ = generate_selfspec(eng, prompt, gamma=2,
                                           max_new_tokens=MAX_NEW)
    finally:
        impls.set_attend_mode("auto")
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_counts))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_asymmetric_longspec_matches_single_device(params, prompt):
    """Asymmetric TP (reference: draft on a NCCL sub-group,
    tests/SnapKV/longspec_benchmark.py:54-64,189): target tp-sharded, draft
    REPLICATED over tp (draft TP degree 1). Two-model generation must be
    bit-equal to the single-device run, and the self-draft (same weights)
    must accept everything."""
    from magicdec_tpu.engine.longspec import LongSpecEngine

    def mk(mesh=None, replicate=False):
        tgt = Engine(CFG, params, batch_size=B, max_len=128, prefill_chunk=32,
                     mesh=mesh)
        drf = Engine(CFG, params, batch_size=B, max_len=128, prefill_chunk=32,
                     mesh=mesh, replicate_tp=replicate)
        return LongSpecEngine(tgt, drf)

    ref_out, ref_counts, ref_stats = mk().generate(prompt, gamma=2,
                                                   max_new_tokens=MAX_NEW)
    assert ref_stats.acceptance_rate == pytest.approx(1.0)

    mesh = shard_lib.make_mesh(dp=2, tp=4)
    out, counts, stats = mk(mesh, replicate=True).generate(
        prompt, gamma=2, max_new_tokens=MAX_NEW)
    assert stats.acceptance_rate == pytest.approx(1.0)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ref_counts))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
