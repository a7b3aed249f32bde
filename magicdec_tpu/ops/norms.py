"""RMSNorm (reference: Engine/SnapKV/model.py RMSNorm), fp32 accumulation."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """x * rsqrt(mean(x^2) + eps) * weight, computed in float32.

    Matches HF LlamaRMSNorm numerics: normalize in fp32, cast back to the
    input dtype, then scale by the (possibly lower-precision) weight.
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * weight
