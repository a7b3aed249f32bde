"""Token selection: greedy argmax and temperature/top-p sampling.

Parity with the reference's Engine/utils.py:68-179 (get_sampling_logits,
sample, cuda-graph-captured samplers). CUDA graphs are unnecessary here —
everything is called inside jitted fixed-shape programs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def argmax_tokens(logits: jax.Array) -> jax.Array:
    """Greedy tokens, int32. With a vocab-sharded lm_head under GSPMD this
    lowers to the reference's distributed argmax (Engine/SnapKV/model.py:180-189)
    automatically."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    """Mask logits outside the top-p nucleus (applied along the last axis)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (always keep the best)
    cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    return jnp.where(logits < cutoff, -jnp.inf, logits)


def sample(logits: jax.Array, key: jax.Array, temperature: float = 0.6,
           top_p: float = 0.9) -> jax.Array:
    """Temperature + nucleus sampling (reference Engine/utils.py sample)."""
    logits = logits / jnp.maximum(temperature, 1e-5)
    logits = top_p_filter(logits, top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
