"""Fused centroid-scoring kernel vs the XLA oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu.ops.pallas.gemm_softmax import (centroid_scores,
                                                  centroid_scores_xla)


def test_centroid_scores_matches_xla():
    key = jax.random.PRNGKey(0)
    B, T, Hkv, G, D, C = 3, 2, 4, 2, 16, 24
    q = jax.random.normal(key, (B, T, Hkv * G, D), jnp.float32)
    cent = jax.random.normal(jax.random.fold_in(key, 1), (B, Hkv, C, D),
                             jnp.float32)
    got = centroid_scores(q, cent, interpret=True)
    want = centroid_scores_xla(q, cent)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # each query row contributes softmax mass 1 -> totals sum to T*G
    np.testing.assert_allclose(np.asarray(got).sum(-1),
                               np.full((B, Hkv), T * G), rtol=1e-5)


def test_centroid_scores_pad_rows_removed():
    key = jax.random.PRNGKey(2)
    B, T, Hkv, G, D, C = 2, 1, 2, 2, 16, 16   # TG=2 -> padded to 8
    q = jax.random.normal(key, (B, T, Hkv * G, D), jnp.float32)
    cent = jax.random.normal(jax.random.fold_in(key, 1), (B, Hkv, C, D),
                             jnp.float32)
    got = centroid_scores(q, cent, interpret=True)
    want = centroid_scores_xla(q, cent)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
