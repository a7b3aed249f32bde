"""RetroInfer-style drafting: clustered-KV ("wave index") attention.

TPU-native re-design of the fork's RetrievalAttention engine
(Engine/RetrievalAttention/: Triton segment k-means cache_hub/kmeans.py:224,
centroid scoring with CUTLASS batch_gemm_softmax + top-nprobe cluster gather
via gather_copy CUDA kernels + WaveBufferCPU host store, combined with a
steady zone — retroinfer_cache.py:349,540).

Differences by design, not translation:
  * The cluster store is an INDEX (per-cluster slot lists into the flat
    packed cache), not a second copy of K/V: a draft step scores centroids,
    takes the top-nprobe clusters per KV head, gathers their members' K/V
    from the target cache ON DEVICE, and runs dense attention over
    O(nprobe * cap) keys plus the forced recent window — draft HBM traffic
    is O(budget), the MagicDec property.
  * Speculated tokens ride the target-cache tail (verify overwrites the same
    slots, rollback = length rewind), exactly like the Quest engine.
  * The host-offload variant stores cluster K/V bytes in the native
    HostWaveBuffer (C++ threadpool gather, engine/wave_buffer.py) so contexts
    can exceed HBM; see HostClusterStore below. The hot self-spec path stays
    on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu import cache as cache_lib
from magicdec_tpu.cache import KVCache
from magicdec_tpu.engine.sampling import argmax_tokens
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops import attention as dense
from magicdec_tpu.ops.kmeans import kmeans
from magicdec_tpu.ops.rope import rope

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("config", "n_clusters", "cap"))
def build_cluster_index(config: ModelArgs, cache: KVCache, n_clusters: int,
                        cap: int):
    """Cluster every (layer, sequence)'s keys over the FULL packed rows
    (all KV heads jointly).

    Returns (centroids [L,B,C,Hkv*D] f32, slots [L,B,C,cap] int32 with -1
    padding). The upstream RetroInfer clusters per attention head, but a
    per-head member gather on TPU needs either a full-cache relayout or an
    element gather of 64-wide rows (both measured catastrophically slow);
    clustering the concatenated per-slot key rows keeps ONE shared member
    list whose gather is full [Hkv*D]-wide rows — every head's data for a
    selected slot travels together, no redundancy. cap bounds cluster size;
    overflow members are dropped from the index (scoring stays sound, they
    are reachable only through other clusters — matching the reference's
    n_clusters = ctx/16 sizing where overflow is rare).
    """
    L, B, S, HD = cache.k.shape
    slot = jnp.arange(S, dtype=jnp.int32)
    valid = (slot[None, :] < cache.lengths[:, None]).astype(jnp.float32)
    valid = jnp.broadcast_to(valid[None], (L, B, S))
    cent, assign = kmeans(cache.k, valid, n_clusters)      # [L,B,C,HD], [L,B,S]

    # per-cluster member slots, capped: rank each slot within its cluster by
    # slot order, then scatter slot ids into the [C, cap] table
    onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.int32)
    onehot = onehot * valid.astype(jnp.int32)[..., None]   # [L,B,S,C]
    rank = jnp.cumsum(onehot, axis=-2) - 1                 # member index
    member_rank = jnp.take_along_axis(rank, assign[..., None],
                                      axis=-1)[..., 0]     # [L,B,S]
    is_member = jnp.take_along_axis(onehot, assign[..., None],
                                    axis=-1)[..., 0] > 0
    ok = is_member & (member_rank < cap)
    flat_target = jnp.where(ok, assign * cap + member_rank, n_clusters * cap)

    def scatter_slots(ft):
        out = jnp.full((n_clusters * cap,), -1, jnp.int32)
        return out.at[ft].set(slot, mode="drop")

    slots = jax.vmap(jax.vmap(scatter_slots))(flat_target)
    return cent, slots.reshape(L, B, n_clusters, cap)


@functools.partial(jax.jit, static_argnames=("cap",))
def build_clustered_store(cache: KVCache, cluster_slots, cap: int):
    """Materialize cluster-major K/V copies [L, B, C*cap, HD] (one
    prefill-time gather), so draft steps fetch whole clusters as contiguous
    blocks through the Pallas DMA gather — the device analog of the
    reference's CPU wave buffer layout (cluster-major bytes, gather by
    cluster id). Pad slots (-1) hold garbage and are masked at attention.
    Costs ~(C*cap/S)x extra cache memory, paid only by retro/squeeze."""
    L, B, S, HD = cache.k.shape
    src = jnp.clip(cluster_slots, 0, S - 1).reshape(L, B, -1)  # [L,B,C*cap]
    take = jax.vmap(jax.vmap(lambda a, i: a[i]))
    return take(cache.k, src), take(cache.v, src)


def retro_draft_attn(config: ModelArgs, lengths_before: jax.Array,
                     centroids, cluster_slots, clustered_kv=None, *,
                     nprobe: int, recent: int, mesh=None):
    """attn_impl for one RetroInfer-style draft step.

    caches = (ck, cv); centroids [L,B,C,Hkv*D], cluster_slots [L,B,C,cap]
    (joint over heads, see build_cluster_index). Selected-cluster members +
    the recent window are gathered and attended densely. When
    `clustered_kv` (the cluster-major store from build_clustered_store) is
    given — the TPU fast path — clusters are fetched as contiguous blocks
    through the Pallas DMA gather; otherwise member rows are sliced from the
    stacked cache.
    """
    Hkv, Dh = config.n_kv_head, config.head_dim
    G = config.n_head // Hkv

    def impl(q, k, v, caches, l):
        ck, cv = caches
        B, T = q.shape[:2]
        S = ck.shape[2]
        positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        ck = cache_lib.append_at_layer(ck, k, lengths_before, l)
        cv = cache_lib.append_at_layer(cv, v, lengths_before, l)

        # ---- centroid scores (reference: batch_gemm_softmax over centroids;
        # here the fused Pallas kernel on TPU, XLA elsewhere); per-head
        # scores summed over heads to rank the shared clusters
        from magicdec_tpu.ops.pallas.gemm_softmax import (
            centroid_scores_sharded, centroid_scores_xla)
        C = centroids.shape[2]
        cent = centroids[l].reshape(B, C, Hkv, Dh).transpose(0, 2, 1, 3)
        if jax.default_backend() == "tpu":
            scores = centroid_scores_sharded(q, cent, mesh=mesh)  # [B,Hkv,C]
        else:
            scores = centroid_scores_xla(q, cent)
        scores = jnp.sum(scores, axis=1)                   # [B, C]
        _, top_c = jax.lax.top_k(scores, nprobe)           # [B, nprobe]

        # ---- gather selected clusters' member slots (shared across heads) --
        cs = cluster_slots[l]                              # [B, C, cap]
        sel = jax.vmap(lambda a, i: a[i])(cs, top_c).reshape(B, -1)
        # forced recent window (covers the spec tokens written this round);
        # its start is clamped at 0 and the slot ids are derived from the
        # clamped start so gathered data and mask ids stay aligned. Overlap
        # with cluster members double-counts those keys in the softmax — an
        # accepted approximation (slight recent-key upweighting), also
        # present upstream when the steady zone meets the wave index.
        rec0 = jnp.maximum(lengths_before + T - recent, 0)  # [B]
        rec = rec0[:, None] + jnp.arange(recent, dtype=jnp.int32)[None, :]
        slot_sel = jnp.concatenate([sel, rec], axis=1)     # [B, Ssel]
        member_ok = slot_sel >= 0
        slot_gather = jnp.clip(slot_sel, 0, S - 1)
        HD = ck.shape[3]
        cap = cluster_slots.shape[3]

        if clustered_kv is not None:
            # cluster blocks from the cluster-major store (Pallas DMA) + the
            # recent window as one contiguous dynamic_slice from the cache
            from magicdec_tpu.ops.pallas.page_gather import \
                page_gather_sharded
            cl_k, cl_v = clustered_kv                      # [L,B,C*cap,HD]
            kc, vc = page_gather_sharded(cl_k, cl_v, l, top_c, page=cap,
                                         mesh=mesh)
            kc = kc.reshape(B, -1, HD)
            vc = vc.reshape(B, -1, HD)

            def rec_slice(b, s0):
                kr = jax.lax.dynamic_slice(ck, (l, b, s0, 0),
                                           (1, 1, recent, HD))
                vr = jax.lax.dynamic_slice(cv, (l, b, s0, 0),
                                           (1, 1, recent, HD))
                return kr[0, 0], vr[0, 0]

            kr, vr = jax.vmap(rec_slice)(jnp.arange(B), rec0)
            k_sel = jnp.concatenate([kc, kr], axis=1)
            v_sel = jnp.concatenate([vc, vr], axis=1)
        else:
            # full packed rows sliced from the stacked cache (CPU fallback)
            def slice_row(b, s):
                kr = jax.lax.dynamic_slice(ck, (l, b, s, 0), (1, 1, 1, HD))
                vr = jax.lax.dynamic_slice(cv, (l, b, s, 0), (1, 1, 1, HD))
                return kr[0, 0, 0], vr[0, 0, 0]

            take = jax.vmap(jax.vmap(slice_row, (None, 0)), (0, 0))
            k_sel, v_sel = take(jnp.arange(B), slot_gather)  # [B, Ssel, HD]
        Ssel = slot_gather.shape[1]
        k_sel = k_sel.reshape(B, Ssel, Hkv, Dh)
        v_sel = v_sel.reshape(B, Ssel, Hkv, Dh)

        from magicdec_tpu.ops.attention import decode_valid_upto
        upto = decode_valid_upto(lengths_before, T)
        mask = (member_ok[:, None, :]
                & (slot_gather[:, None, :] < upto[:, :, None]))  # [B,T,Ssel]
        ctx = dense.masked_attention_general(q, k_sel, v_sel, mask)
        return ctx.reshape(B, T, Hkv * G * Dh), (ck, cv)

    return impl


@functools.partial(
    jax.jit,
    static_argnames=("config", "gamma", "max_new_tokens", "n_clusters", "cap",
                     "nprobe", "recent", "mesh"),
    donate_argnames=("cache", "output", "gen_counts"))
def retro_generate_fused(params, config: ModelArgs, cache: KVCache, buffer0,
                         output, gen_counts, eot, gamma: int,
                         max_new_tokens: int, n_clusters: int, cap: int,
                         nprobe: int, recent: int, mesh=None):
    """Full RetroInfer-style self-spec generation in one while_loop. The
    cluster index is built once from the prefill cache; freshly generated
    tokens are covered by the forced recent window (the reference similarly
    rebuilds its wave index only at prefill)."""
    from magicdec_tpu.engine import attention_impls as impls
    from magicdec_tpu.engine.spec import _accept_and_update

    max_len = cache.k.shape[2]
    centroids, cluster_slots = build_cluster_index(config, cache, n_clusters,
                                                   cap)
    clustered_kv = (build_clustered_store(cache, cluster_slots, cap)
                    if jax.default_backend() == "tpu" else None)

    def cond(state):
        cache, gen_counts, terminal = state[0], state[3], state[6]
        return (~terminal
                & (jnp.min(gen_counts) < max_new_tokens)
                & (jnp.max(cache.lengths) + gamma + 1 <= max_len))

    def body(state):
        cache, buffer0, output, gen_counts, rounds, accepted, terminal = state
        lenT0 = cache.lengths

        # unrolled (a lax.scan would copy the cache across the scan boundary)
        ck, cv, lens, tok = cache.k, cache.v, lenT0, buffer0
        drafted = []
        for _ in range(gamma):
            impl = retro_draft_attn(config, lens, centroids, cluster_slots,
                                    clustered_kv, nprobe=nprobe,
                                    recent=recent, mesh=mesh)
            logits, (ck, cv) = llama.forward(params, config, tok, impl,
                                             (ck, cv), last_only=True)
            tok = argmax_tokens(logits)
            lens = lens + 1
            drafted.append(tok)
        buffer = jnp.concatenate([buffer0] + drafted, axis=1)

        impl = impls.target_attn(config, lenT0, mesh=mesh)
        logits, (ck, cv) = llama.forward(params, config, buffer, impl,
                                         (ck, cv))
        target_tokens = argmax_tokens(logits)
        accept, bonus, output, gen_counts, term, acc = _accept_and_update(
            buffer, target_tokens, eot, gamma, output, gen_counts)
        cache = KVCache(ck, cv, lenT0 + accept)
        return (cache, bonus, output, gen_counts, rounds + 1, accepted + acc,
                terminal | term)

    state = (cache, buffer0, output, gen_counts, jnp.int32(0), jnp.int32(0),
             jnp.bool_(False))
    state = jax.lax.while_loop(cond, body, state)
    cache, buffer0, output, gen_counts, rounds, accepted, terminal = state
    B, capo = output.shape
    idx = jnp.minimum(gen_counts, capo - 1)
    output = output.at[jnp.arange(B), idx].set(buffer0[:, 0])
    return cache, output, gen_counts + 1, rounds, accepted


class HostClusterStore:
    """Offload variant: cluster K/V bytes live in the native host wave buffer
    (one slot per (layer, sequence, head, cluster)); gather_clusters pulls the
    selected clusters into a contiguous staging array for device upload.

    This is the capacity path (contexts larger than HBM): the reference keeps
    full KV in CPU pinned memory with GPU-side centroids
    (retroinfer_cache.py:1-12). Selection still happens on device from the
    centroids; only member K/V bytes live on the host.
    """

    def __init__(self, config: ModelArgs, cache: KVCache, cluster_slots,
                 cap: int):
        from magicdec_tpu.engine.wave_buffer import HostWaveBuffer

        L, B, S, HD = cache.k.shape
        C = cluster_slots.shape[2]
        self.shape = (L, B, C, cap, HD)
        itemsize = jnp.dtype(cache.k.dtype).itemsize
        slot_bytes = cap * HD * 2 * itemsize                # K and V blocks
        self.buf = HostWaveBuffer(L * B * C, slot_bytes)
        # materialize clustered K/V once (host-side numpy gather of the full
        # packed rows — clusters are joint over heads, build_cluster_index)
        k = np.asarray(cache.k)                             # [L,B,S,HD]
        v = np.asarray(cache.v)
        cs = np.asarray(cluster_slots)                      # [L,B,C,cap]
        csc = np.clip(cs, 0, S - 1)
        blocks = np.empty((L, B, C, 2, cap, HD), k.dtype)
        for li in range(L):
            for bi in range(B):
                sel = csc[li, bi]                           # [C, cap]
                blocks[li, bi, :, 0] = k[li, bi][sel]
                blocks[li, bi, :, 1] = v[li, bi][sel]
        self.member_valid = cs >= 0
        self.buf.put(0, blocks.reshape(L * B * C, -1))
        self.dtype = k.dtype
        self.cap, self.HD, self.C = cap, HD, C

    def gather_clusters(self, layer: int, top_c: np.ndarray) -> np.ndarray:
        """top_c [B, nprobe] -> K/V blocks [B, nprobe, 2, cap, Hkv*D]."""
        B, C = self.shape[1], self.C
        ids = ((layer * B + np.arange(B)[:, None]) * C + top_c).reshape(-1)
        out = self.buf.gather(ids.astype(np.int64))
        return out.view(self.dtype).reshape(B, top_c.shape[-1], 2,
                                            self.cap, self.HD)
