"""Rotary position embeddings (HF half-split convention).

Covers the three variants the reference needs (Engine/SnapKV/model.py:135-158,
where flashinfer apply_rope / apply_llama31_rope is used): plain rope, linear
position interpolation (llama-2-7b-32k style, positions / scaling_factor), and
llama-3.1 frequency rescaling (factor applied to inv_freq bands).

All functions are pure jnp; positions are per-token int32 arrays so ragged
batches (every sequence at a different cache length) rotate correctly inside
one fixed-shape jitted program.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu.models.config import ModelArgs


@functools.lru_cache(maxsize=64)
def _inv_freq_cached(head_dim: int, rope_base: float, use_llama31: bool,
                     factor: float, low: float | None, high: float | None,
                     orig_ctx: int | None):
    # numpy on purpose: a cached numpy constant is embedded afresh into every
    # trace, whereas caching a jax.Array here can leak tracers across jits.
    inv_freq = 1.0 / (rope_base ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    if use_llama31:
        low_wavelen = orig_ctx / low
        high_wavelen = orig_ctx / high
        wavelen = 2.0 * math.pi / inv_freq
        # smooth interpolation between the scaled and unscaled bands
        smooth = (orig_ctx / wavelen - low) / (high - low)
        inv_freq = np.where(
            wavelen > low_wavelen,
            inv_freq / factor,
            np.where(wavelen < high_wavelen, inv_freq,
                     (1.0 - smooth) * inv_freq / factor + smooth * inv_freq),
        ).astype(np.float32)
    return inv_freq


def rope_inv_freq(config: ModelArgs) -> np.ndarray:
    """Per-band inverse frequencies [head_dim//2], with llama-3.1 rescaling baked in."""
    return _inv_freq_cached(
        config.head_dim, config.rope_base, config.use_llama31_rope,
        float(config.scaling_factor), config.low_freq_factor,
        config.high_freq_factor, config.original_max_position_embeddings)


def rope_cos_sin(config: ModelArgs, positions: jax.Array) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for integer positions of any shape -> [..., head_dim]."""
    inv_freq = rope_inv_freq(config)
    pos = positions.astype(jnp.float32)
    if not config.use_llama31_rope and config.scaling_factor != 1.0:
        pos = pos / config.scaling_factor  # linear position interpolation
    freqs = pos[..., None] * inv_freq  # [..., head_dim//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate x: [..., T, H, D] with cos/sin [..., T, D] (broadcast over heads)."""
    cos = cos[..., None, :].astype(jnp.float32)
    sin = sin[..., None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * cos + _rotate_half(xf) * sin).astype(x.dtype)


def rope(config: ModelArgs, x: jax.Array, positions: jax.Array) -> jax.Array:
    """Convenience: rotate x [B, T, H, D] at integer positions [B, T]."""
    cos, sin = rope_cos_sin(config, positions)
    return apply_rope(x, cos, sin)
