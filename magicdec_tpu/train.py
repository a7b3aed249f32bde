"""Minimal causal-LM training: enough to produce REAL model weights on-device.

The reference ships no training (SURVEY.md §5.4); this module exists because
this environment has no downloadable checkpoints, and speculative-decoding
acceptance rates are only meaningful for a model with sharp, context-dependent
argmax. bench.py trains a small Llama on the synthetic Zipf+copy corpus
(data/converters.synthetic_dataset) in ~a minute on one v5e chip and then
benchmarks with realistic acceptance; tests use it for a loss-decreases check
and the multi-chip dry run uses its jitted step as the "full training step"
over a dp x tp mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops.rope import rope

NEG_INF = float(jnp.finfo(jnp.float32).min)


def causal_attn(config: ModelArgs):
    """Cache-free causal self-attention impl for training forwards."""
    def impl(q, k, v, caches, l):
        B, T, Hq, D = q.shape
        Hkv = config.n_kv_head
        G = Hq // Hkv
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :],
                                     (B, T))
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        qg = q.reshape(B, T, Hkv, G, D)
        logits = jnp.einsum("bthgd,bshd->bthgs", qg, k,
                            preferred_element_type=jnp.float32) * (D ** -0.5)
        causal = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(causal[None, :, None, None, :], logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bthgs,bshd->bthgd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return out.reshape(B, T, Hq * D).astype(q.dtype), caches

    return impl


def lm_loss(params, config: ModelArgs, tokens: jax.Array) -> jax.Array:
    """Mean next-token cross-entropy over tokens [B, T]."""
    logits, _ = llama.forward(params, config, tokens[:, :-1],
                              causal_attn(config), (), remat=True)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)


def make_train_step(config: ModelArgs, optimizer):
    """Jitted (params, opt_state, tokens) -> (params, opt_state, loss)."""
    import optax

    @functools.partial(jax.jit, donate_argnames=("params", "opt_state"))
    def train_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(lm_loss)(params, config, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def train(config: ModelArgs, data, *, steps: int = 400, batch: int = 16,
          lr: float = 3e-3, seed: int = 0, dtype=jnp.float32, log_every: int = 0):
    """Train from random init on `data` [N, T] int32; returns (params, loss).

    Params train in float32 (bf16 master weights destabilize adamw at this
    scale); cast to bf16 for inference afterwards.
    """
    import optax

    warmup = min(max(steps // 20, 10), max(steps // 2, 1))
    schedule = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, steps,
                                                  lr * 0.05)
    optimizer = optax.adamw(schedule, weight_decay=0.01)
    params = llama.init_params(jax.random.PRNGKey(seed), config, dtype)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(config, optimizer)

    data = jnp.asarray(data, jnp.int32)
    n = data.shape[0]
    key = jax.random.PRNGKey(seed + 1)
    loss = jnp.inf
    # TPU lowers f32 matmuls to bf16 passes by default — with a small model
    # the precision loss can stall learning entirely; force true f32.
    with jax.default_matmul_precision("highest"):
        for step in range(steps):
            idx = jax.random.randint(jax.random.fold_in(key, step), (batch,),
                                     0, n)
            tokens = data[idx]
            params, opt_state, loss = step_fn(params, opt_state, tokens)
            if log_every and step % log_every == 0:
                print(f"step {step}: loss {float(loss):.4f}", flush=True)
    return params, float(loss)


def cast_params(params, dtype):
    return jax.tree.map(lambda x: x.astype(dtype) if x is not None else None,
                        params)


# ---------------------------------------------------------------------------
# GliDe draft training (reference trains glide with a fused CE loss,
# tests/Quest/longspec_llama_glide.py:492-502; the target stays frozen)
# ---------------------------------------------------------------------------

def _target_last_kv(params, config: ModelArgs, tokens):
    """Run the frozen target over `tokens`, returning its last-layer K/V
    [B, T, Hkv*D] (rotated, as the cache stores them)."""
    from magicdec_tpu.cache import KVCache
    from magicdec_tpu.engine import attention_impls as impls

    B, T = tokens.shape
    # cache in the PARAM dtype: a bf16 target with an f32 cache feeds the
    # flash prefill kernel a mixed-dtype matmul, which Mosaic rejects
    dtype = params["layers"]["wqkv"].dtype
    cache = KVCache.create(config.n_layer, B, T, config.n_kv_head,
                           config.head_dim, dtype)
    impl = impls.target_attn(config, cache.lengths)
    _, (ck, cv) = llama.forward(params, config, tokens, impl,
                                (cache.k, cache.v))
    return ck[-1], cv[-1]


def glide_loss(glide_params, target_params, config: ModelArgs, tokens):
    from magicdec_tpu.models import glide as glide_lib

    B, T = tokens.shape
    tgt_k, tgt_v = _target_last_kv(target_params, config, tokens)
    Sd = T
    own_k = jnp.zeros((B, Sd, config.n_kv_head * config.head_dim), jnp.float32)
    own_v = jnp.zeros_like(own_k)
    pos = jnp.broadcast_to(jnp.arange(T - 1, dtype=jnp.int32)[None, :],
                           (B, T - 1))
    logits, _, _ = glide_lib.glide_forward(
        glide_params, target_params, config, tokens[:, :-1], pos, own_k,
        own_v, jnp.zeros((B,), jnp.int32), tgt_k, tgt_v, pos + 1)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], -1))


def train_glide(target_params, config: ModelArgs, data, *, steps: int = 600,
                batch: int = 8, lr: float = 1e-3, seed: int = 0,
                log_every: int = 0):
    """Fit the 1-layer glide draft block against the frozen target."""
    import optax

    from magicdec_tpu.models import glide as glide_lib

    warmup = min(max(steps // 20, 10), max(steps // 2, 1))
    schedule = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, steps,
                                                  lr * 0.05)
    optimizer = optax.adamw(schedule, weight_decay=0.01)
    gp = glide_lib.init_glide_params(jax.random.PRNGKey(seed), config)
    opt_state = optimizer.init(gp)

    @functools.partial(jax.jit, donate_argnames=("gp", "opt_state"))
    def step_fn(gp, opt_state, tparams, tokens):
        # tparams must be an ARGUMENT: closing over the (frozen) target
        # weights would embed hundreds of MB of constants into the compile
        # payload and stall remote compilation
        loss, grads = jax.value_and_grad(glide_loss)(gp, tparams, config,
                                                     tokens)
        updates, opt_state = optimizer.update(grads, opt_state, gp)
        gp = optax.apply_updates(gp, updates)
        return gp, opt_state, loss

    data = jnp.asarray(data, jnp.int32)
    n = data.shape[0]
    key = jax.random.PRNGKey(seed + 1)
    loss = jnp.inf
    with jax.default_matmul_precision("highest"):
        for step in range(steps):
            idx = jax.random.randint(jax.random.fold_in(key, step), (batch,),
                                     0, n)
            gp, opt_state, loss = step_fn(gp, opt_state, target_params, data[idx])
            if log_every and step % log_every == 0:
                print(f"glide step {step}: loss {float(loss):.4f}", flush=True)
    return gp, float(loss)
