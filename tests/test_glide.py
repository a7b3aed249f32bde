"""GliDe engine tests: tree structure, linear/tree losslessness, stochastic
verification properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.glide_engine import (GlideEngine, SpecTree,
                                              stochastic_verify)
from magicdec_tpu.engine.spec import generate_autoregressive
from magicdec_tpu.models import glide as glide_lib
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs

CFG = ModelArgs.from_name("test-tiny")
B, P, NEW = 2, 256, 24


def test_spec_tree_structure():
    t = SpecTree((2, 3))
    assert t.n_nodes == 1 + 2 + 6
    assert t.parents.tolist() == [-1, 0, 0, 1, 1, 1, 2, 2, 2]
    assert t.depth.tolist() == [0, 1, 1, 2, 2, 2, 2, 2, 2]
    assert t.ancestor[5].tolist() == [True, True, False, False, False, True,
                                      False, False, False]


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(jax.random.PRNGKey(0), CFG, scale=0.3)
    gp = glide_lib.init_glide_params(jax.random.PRNGKey(5), CFG, scale=0.3)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                CFG.vocab_size, dtype=jnp.int32)
    eng = Engine(CFG, params, batch_size=B, max_len=P + NEW + 16,
                 prefill_chunk=128)
    base, _ = generate_autoregressive(eng, prompt, NEW)
    return params, gp, prompt, np.asarray(base)


def _mk_engine(params, gp, max_len):
    target = Engine(CFG, params, batch_size=B, max_len=max_len,
                    prefill_chunk=128, kv_dtype=jnp.float32)
    return GlideEngine(target, gp)


def test_glide_linear_lossless(setup):
    params, gp, prompt, base = setup
    eng = _mk_engine(params, gp, P + NEW + 24)
    out, counts, stats = eng.generate(prompt, NEW, gamma=3)
    n = min(int(counts.min()), NEW)
    np.testing.assert_array_equal(np.asarray(out)[:, :n], base[:, :n])


def test_glide_tree_lossless(setup):
    """Greedy tree verification must emit exactly the target's own greedy
    stream (reference tree_verification invariant)."""
    params, gp, prompt, base = setup
    tree = SpecTree((2, 2))
    eng = _mk_engine(params, gp, P + NEW + 8 * tree.n_nodes)
    out, counts, stats = eng.generate(prompt, NEW, tree=tree)
    n = min(int(counts.min()), NEW)
    np.testing.assert_array_equal(np.asarray(out)[:, :n], base[:, :n])


def test_stochastic_verify_identical_dists_accepts_all():
    key = jax.random.PRNGKey(0)
    V, G = 16, 4
    logits = jax.random.normal(key, (B, G, V))
    p = jax.nn.softmax(logits, -1)
    toks = jax.random.randint(jax.random.fold_in(key, 1), (B, G), 0, V)
    acc, repl, has = stochastic_verify(key, p, p, toks)
    assert np.asarray(acc).tolist() == [G, G]
    assert not np.asarray(has).any()


def test_stochastic_verify_disjoint_rejects_and_resamples_from_target():
    key = jax.random.PRNGKey(0)
    V, G = 8, 3
    dp = jnp.zeros((B, G, V)).at[..., 0].set(1.0)
    tp = jnp.zeros((B, G, V)).at[..., 5].set(1.0)
    toks = jnp.zeros((B, G), jnp.int32)         # draft always proposes 0
    acc, repl, has = stochastic_verify(key, dp, tp, toks)
    assert np.asarray(acc).tolist() == [0, 0]
    assert np.asarray(has).all()
    assert np.asarray(repl).tolist() == [5, 5]  # residual = target dist


def test_stochastic_verify_marginal_matches_target():
    """Over many trials, the emitted first token's distribution must equal
    the target distribution (the core speculative-sampling guarantee)."""
    V, G = 4, 1
    dp = jnp.broadcast_to(jnp.asarray([[0.7, 0.1, 0.1, 0.1]]), (1, 1, V))
    tp = jnp.broadcast_to(jnp.asarray([[0.4, 0.3, 0.2, 0.1]]), (1, 1, V))
    counts = np.zeros(V)
    n = 3000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    dks = jax.random.split(jax.random.PRNGKey(1), n)
    for i in range(n):
        tok = jax.random.categorical(dks[i], jnp.log(dp[0, 0]))[None, None]
        acc, repl, has = stochastic_verify(keys[i], dp, tp,
                                           tok.astype(jnp.int32))
        emitted = int(tok[0, 0]) if int(acc[0]) == 1 else int(repl[0])
        counts[emitted] += 1
    freq = counts / n
    np.testing.assert_allclose(freq, np.asarray(tp[0, 0]), atol=0.04)


def test_stochastic_tree_walk_marginal_matches_target():
    """Depth-1 tree with b sampled children: the emitted first token's
    marginal must equal the target distribution (SpecInfer guarantee)."""
    from magicdec_tpu.engine.glide_engine import stochastic_tree_walk

    V, b = 4, 2
    tree = SpecTree((b,))
    q = jnp.asarray([0.7, 0.1, 0.1, 0.1])
    p = jnp.asarray([0.4, 0.3, 0.2, 0.1])
    n = 4000
    counts = np.zeros(V)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    for i in range(n):
        k1, k2 = jax.random.split(keys[i])
        draws = jax.random.categorical(k1, jnp.log(q), shape=(b,))
        node_tokens = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), draws.astype(jnp.int32)])[None, :]
        tp = jnp.broadcast_to(p, (1, tree.n_nodes, V))
        dp = jnp.broadcast_to(q, (1, tree.n_nodes, V))
        path, emit_len, bonus = stochastic_tree_walk(k2, tree, node_tokens,
                                                     tp, dp)
        if int(emit_len[0]) == 2:   # a child accepted -> it is the emission
            counts[int(node_tokens[0, int(path[0, 1])])] += 1
        else:                       # all rejected -> bonus is the emission
            counts[int(bonus[0, 0])] += 1
    freq = counts / n
    np.testing.assert_allclose(freq, np.asarray(p), atol=0.035)


def test_glide_tree_stochastic_runs_and_is_plausible(setup):
    """End-to-end stochastic tree round: shapes, compaction, emit bounds."""
    from magicdec_tpu.engine.glide_engine import glide_tree_round_stochastic

    params, gp, prompt, base = setup
    tree = SpecTree((2, 2))
    eng = _mk_engine(params, gp, P + NEW + 8 * tree.n_nodes)
    buffer0 = eng.encode(prompt)
    out = glide_tree_round_stochastic(
        eng.target.params, gp, CFG, tree, eng.target.cache, eng.own_k,
        eng.own_v, eng.own_len, buffer0, jnp.asarray([-1, -1], jnp.int32),
        jax.random.PRNGKey(3))
    cache, ok, ov, olen, emitted, emit_len, bonus, terminal = out
    assert emitted.shape == (B, 3)
    el = np.asarray(emit_len)
    assert ((1 <= el) & (el <= 3)).all()
    np.testing.assert_array_equal(np.asarray(cache.lengths),
                                  np.asarray(P + el))
