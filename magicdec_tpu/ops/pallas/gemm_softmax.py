"""Fused GEMM + softmax: centroid scoring for clustered-KV drafting.

TPU-native counterpart of the reference's CUTLASS batch_gemm_softmax kernel
(Engine/RetrievalAttention/library/retroinfer/retroinfer_kernels/src/
batch_gemm_softmax.cu: fused QK^T over centroids + row softmax). One grid
cell per batch element computes, for every KV head, q·centroidsᵀ, the row
softmax, and the reduction over the query rows — the centroid score vector
the draft uses to pick top-nprobe clusters — without materializing the
[B, T, H, G, C] logits in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, cent_ref, o_ref, *, n_kv_head: int, scale: float):
    # q_ref [1, Hkv, TG, D]; cent_ref [1, Hkv, C, D]; o_ref [1, Hkv, C]
    for h in range(n_kv_head):
        qh = q_ref[0, h]                                   # [TG, D]
        ch = cent_ref[0, h]                                # [C, D]
        s = jax.lax.dot_general(qh, ch, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)                     # rows over C
        o_ref[0, h] = jnp.sum(p, axis=0)                   # reduce T*G rows


@functools.partial(jax.jit, static_argnames=("interpret",))
def centroid_scores(q: jax.Array, centroids: jax.Array, *,
                    interpret: bool = False) -> jax.Array:
    """q [B, T, Hq, D] (rotated), centroids [B, Hkv, C, D] f32 ->
    scores [B, Hkv, C] f32 (softmax mass summed over queries and the GQA
    group — the quantity RetroInfer ranks clusters by)."""
    B, T, Hq, D = q.shape
    Hkv, C = centroids.shape[1], centroids.shape[2]
    G = Hq // Hkv
    TG = T * G
    TG_pad = -(-max(TG, 8) // 8) * 8
    q_r = q.reshape(B, T, Hkv, G, D).transpose(0, 2, 1, 3, 4)
    q_r = q_r.reshape(B, Hkv, TG, D).astype(jnp.float32)
    if TG_pad != TG:
        # padded rows produce uniform softmax mass; subtract it afterwards
        q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, TG_pad - TG), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, n_kv_head=Hkv, scale=D ** -0.5),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, TG_pad, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, C, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hkv, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, C), jnp.float32),
        interpret=interpret,
    )(q_r, centroids.astype(jnp.float32))
    if TG_pad != TG:
        out = out - (TG_pad - TG) / C  # remove the pad rows' uniform mass
    return out


def centroid_scores_sharded(q, centroids, *, mesh=None,
                            interpret: bool = False):
    """centroid_scores under a (dp, tp) mesh: batch over dp, KV heads over tp
    (q's Hq axis and centroids' Hkv axis shard together; the per-head scores
    need no collectives — the caller's sum over heads does, and GSPMD inserts
    it). Falls through to the plain kernel off-mesh."""
    if mesh is None or mesh.devices.size == 1:
        return centroid_scores(q, centroids, interpret=interpret)
    from jax.sharding import PartitionSpec as P
    fn = jax.shard_map(
        functools.partial(centroid_scores, interpret=interpret),
        mesh=mesh,
        in_specs=(P("dp", None, "tp", None), P("dp", "tp", None, None)),
        out_specs=P("dp", "tp", None), check_vma=False)
    return fn(q, centroids)


def centroid_scores_xla(q: jax.Array, centroids: jax.Array) -> jax.Array:
    """Reference XLA path (used on CPU and as the test oracle)."""
    B, T, Hq, D = q.shape
    Hkv = centroids.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, T, Hkv, G, D).astype(jnp.float32)
    logits = jnp.einsum("bthgd,bhcd->bthgc", qg,
                        centroids.astype(jnp.float32)) * (D ** -0.5)
    return jnp.sum(jax.nn.softmax(logits, axis=-1), axis=(1, 3))
