"""Fused decode-block matmul kernels vs the XLA composition."""

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu.ops.norms import rms_norm
from magicdec_tpu.ops.pallas.fused_block import fused_post_attn, fused_qkv

D, HqD, I, O = 256, 256, 704, 512
EPS = 1e-5


def _mk(key, *shape):
    return (jax.random.normal(key, shape, jnp.float32) * 0.3).astype(
        jnp.bfloat16)


def _oracle_qkv(x, n, w, b=None):
    y = rms_norm(x, n, EPS) @ w
    return y + b if b is not None else y


def _oracle_post(x, ctx, wo, n, gu, wd):
    t = x + ctx @ wo
    h = rms_norm(t, n, EPS)
    z = jnp.einsum("md,dzi->mzi", h, gu)
    return t + (jax.nn.silu(z[:, 0]) * z[:, 1]) @ wd


def test_fused_qkv_matches_oracle():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = _mk(ks[0], 24, D)
    n = jnp.ones((D,), jnp.bfloat16)
    w = _mk(ks[1], D, O)
    b = _mk(ks[2], O)
    got = fused_qkv(x, n, w, b, eps=EPS, interpret=True)
    ref = _oracle_qkv(x, n, w, b)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)
    got2 = fused_qkv(x, n, w, eps=EPS, interpret=True)
    ref2 = _oracle_qkv(x, n, w)
    np.testing.assert_allclose(np.asarray(got2, np.float32),
                               np.asarray(ref2, np.float32),
                               rtol=0.05, atol=0.05)


def test_fused_post_attn_matches_oracle():
    """The kernel's bf16 rounding path differs from XLA's (silu in f32,
    staged residual) — require its error vs an f32 oracle to be of the same
    magnitude as the bf16 XLA composition's own error."""
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x = _mk(ks[0], 24, D)
    ctx = _mk(ks[1], 24, HqD)
    wo = _mk(ks[2], HqD, D)
    n = jnp.ones((D,), jnp.bfloat16)
    gu = _mk(ks[3], D, 2, I)
    wd = _mk(ks[4], I, D)
    got = fused_post_attn(x, ctx, wo, n, gu, wd, eps=EPS, interpret=True)
    ref16 = _oracle_post(x, ctx, wo, n, gu, wd)
    f32 = [a.astype(jnp.float32) for a in (x, ctx, wo, n, gu, wd)]
    ref32 = np.asarray(_oracle_post(*f32))
    scale = np.abs(ref32) + 1e-2
    err_kernel = np.abs(np.asarray(got, np.float32) - ref32) / scale
    err_xla = np.abs(np.asarray(ref16, np.float32) - ref32) / scale
    assert np.quantile(err_kernel, 0.99) < max(
        2.5 * np.quantile(err_xla, 0.99), 0.02)
    assert np.max(err_kernel) < max(4 * np.max(err_xla), 0.05)


def test_row_count_invariance_bitexact():
    """The invariant the spec engines need: a token's values must not depend
    on how many tokens share the call (draft T=1 vs verify T=gamma+1)."""
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    x = _mk(ks[0], 56, D)
    ctx = _mk(ks[1], 56, HqD)
    wo = _mk(ks[2], HqD, D)
    n = jnp.ones((D,), jnp.bfloat16)
    gu = _mk(ks[3], D, 2, I)
    wd = _mk(ks[4], I, D)
    full = fused_post_attn(x, ctx, wo, n, gu, wd, eps=EPS, interpret=True)
    one = fused_post_attn(x[:1], ctx[:1], wo, n, gu, wd, eps=EPS,
                          interpret=True)
    np.testing.assert_array_equal(
        np.asarray(full[:1]).view(np.uint16), np.asarray(one).view(np.uint16))
    wq = _mk(ks[2], D, O)
    fq = fused_qkv(x, n, wq, eps=EPS, interpret=True)
    oq = fused_qkv(x[:1], n, wq, eps=EPS, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(fq[:1]).view(np.uint16), np.asarray(oq).view(np.uint16))
