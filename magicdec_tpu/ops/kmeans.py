"""Batched k-means over cache keys (XLA, jit-friendly fixed iterations).

Counterpart of the reference's Triton segmented k-means
(Engine/RetrievalAttention/cache_hub/kmeans.py:224 segment_k_means) and
SqueezedAttention's cuML clustering (squeezedattention/clustering.py:12-101):
clusters each (layer, sequence, kv-head)'s keys so drafting can score
centroids instead of every key. Pure jnp — Lloyd iterations with fixed trip
count, mask-aware (slots beyond each sequence's length are ignored), empty
clusters retain their previous centroid (the deterministic strided init
spreads seeds widely enough that re-seeding never mattered in practice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def kmeans(x: jax.Array, valid: jax.Array, n_clusters: int, iters: int = 8,
           seed: int = 0):
    """Cluster x [..., N, D] with validity mask [..., N].

    Returns (centroids [..., C, D] f32, assign [..., N] int32; invalid slots
    get assignment C-1... their contribution is masked everywhere).
    Initialization: strided sample of valid points (deterministic).
    """
    # x stays in its storage dtype: materializing an f32 copy of a full
    # bf16 KV cache costs +4.25 GB at B=128/S=2176/8L (the OOM that capped
    # retro/squeeze) — the dot accumulates in f32 on the MXU anyway
    N = x.shape[-2]
    C = n_clusters
    # deterministic spread init: every (N // C)-th slot (valid-dense prefixes
    # make this a stratified sample)
    idx = (jnp.arange(C) * max(N // C, 1)) % N
    cent = jnp.take(x, idx, axis=-2).astype(jnp.float32)   # [..., C, D]

    def dist(cent):
        # |x|^2 - 2 x.c + |c|^2 up to the x-constant term; argmin over C
        return (-2.0 * jnp.einsum("...nd,...cd->...nc", x,
                                  cent.astype(x.dtype),
                                  preferred_element_type=jnp.float32)
                + jnp.sum(cent * cent, axis=-1)[..., None, :])

    def step(cent, _):
        assign = jnp.argmin(dist(cent), axis=-1)           # [..., N]
        onehot = jax.nn.one_hot(assign, C, dtype=x.dtype)
        onehot = onehot * valid[..., None].astype(x.dtype)
        counts = jnp.sum(onehot.astype(jnp.float32), axis=-2)  # [..., C]
        sums = jnp.einsum("...nc,...nd->...cd", onehot, x,
                          preferred_element_type=jnp.float32)
        new_cent = sums / jnp.maximum(counts, 1.0)[..., None]
        # keep old centroid for empty clusters
        cent = jnp.where((counts > 0)[..., None], new_cent, cent)
        return cent, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    assign = jnp.argmin(dist(cent), axis=-1).astype(jnp.int32)
    return cent, assign
