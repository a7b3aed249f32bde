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
    """Materialize a KV-FUSED cluster-major store [L, B, C*(2*cap), HD]:
    cluster c's K rows at [c*2cap, c*2cap+cap) immediately followed by its V
    rows (one prefill-time gather). Draft steps then fetch a whole cluster's
    K AND V with ONE DMA descriptor (page_gather_single, page=2*cap) — the
    gather is descriptor-issue-bound (~1.7us each measured on v5e), so the
    fused layout halves its cost. Device analog of the reference's CPU wave
    buffer layout + gather_copy_and_concat (gather_copy.cu). Pad slots (-1)
    hold garbage and are masked at attention. Costs ~(2*C*cap/S)x extra
    cache memory, paid only by retro/squeeze."""
    L, B, S, HD = cache.k.shape
    C = cluster_slots.shape[2]
    src = jnp.clip(cluster_slots, 0, S - 1).reshape(L, B, -1)  # [L,B,C*cap]
    take = jax.vmap(jax.vmap(lambda a, i: a[i]))
    k_rows = take(cache.k, src).reshape(L, B, C, cap, HD)
    v_rows = take(cache.v, src).reshape(L, B, C, cap, HD)
    kv = jnp.concatenate([k_rows, v_rows], axis=3)          # [L,B,C,2cap,HD]
    return kv.reshape(L, B, C * 2 * cap, HD)


def _recent_kv(ck, cv, l, rec0, recent: int):
    """Per-sequence contiguous recent-window slices from the stacked cache:
    [B, recent, HD] each. rec0 [B] are the window starts (callers guarantee
    rec0 + recent <= S)."""
    B = rec0.shape[0]
    HD = ck.shape[3]

    def rec_slice(b, s0):
        kr = jax.lax.dynamic_slice(ck, (l, b, s0, 0), (1, 1, recent, HD))
        vr = jax.lax.dynamic_slice(cv, (l, b, s0, 0), (1, 1, recent, HD))
        return kr[0, 0], vr[0, 0]

    return jax.vmap(rec_slice)(jnp.arange(B), rec0)


def _attend_selected(config, q, k_sel, v_sel, slot_sel, ck, cv, l,
                     lengths_before, rec0, recent_rows: int):
    """Dense draft attention over [gathered working set + the round's recent
    window]. slot_sel [B, NS] holds each gathered row's absolute cache slot
    (-1 = invalid); the window [rec0, rec0 + recent_rows) is FIXED for the
    whole round (rec0 [B] chosen at round start so the window spans the
    latest_k prefix rows plus every slot the round's draft steps append).
    Gathered rows whose slot falls inside the window are masked out — the
    window covers them — so the union is exact: no hole at the window's
    page/cluster boundary and no double-counted keys."""
    Hkv, Dh = config.n_kv_head, config.head_dim
    B, T = q.shape[:2]
    kr, vr = _recent_kv(ck, cv, l, rec0, recent_rows)
    rec_slots = rec0[:, None] + jnp.arange(recent_rows,
                                           dtype=jnp.int32)[None, :]
    slot_sel = jnp.where(slot_sel < rec0[:, None], slot_sel, -1)  # dedup
    k_all = jnp.concatenate([k_sel, kr], axis=1)
    v_all = jnp.concatenate([v_sel, vr], axis=1)
    slot_all = jnp.concatenate([slot_sel, rec_slots], axis=1)   # [B, Ssel]
    upto = dense.decode_valid_upto(lengths_before, T)
    mask = ((slot_all >= 0)[:, None, :]
            & (slot_all[:, None, :] < upto[:, :, None]))        # [B,T,Ssel]
    Ssel = slot_all.shape[1]
    ctx = dense.masked_attention_general(
        q, k_all.reshape(B, Ssel, Hkv, Dh), v_all.reshape(B, Ssel, Hkv, Dh),
        mask)
    return ctx.reshape(B, T, -1)


def retro_select_fn(config: ModelArgs, centroids, *, nprobe: int,
                    mesh=None):
    """Default cluster selection: fused centroid GEMM+softmax scores summed
    over heads, fixed top-nprobe (the RetroInfer rule). Returns
    select_fn(q_rotated, l) -> (top_c [B, nprobe], keep [B, nprobe])."""
    Hkv, Dh = config.n_kv_head, config.head_dim

    def select(q, l):
        from magicdec_tpu.ops.pallas.gemm_softmax import (
            centroid_scores_sharded, centroid_scores_xla)
        B = q.shape[0]
        C = centroids.shape[2]
        cent = centroids[l].reshape(B, C, Hkv, Dh).transpose(0, 2, 1, 3)
        if jax.default_backend() == "tpu":
            scores = centroid_scores_sharded(q, cent, mesh=mesh)  # [B,Hkv,C]
        else:
            scores = centroid_scores_xla(q, cent)
        scores = jnp.sum(scores, axis=1)                   # [B, C]
        _, top_c = jax.lax.top_k(scores, nprobe)           # [B, nprobe]
        return top_c, jnp.ones(top_c.shape, bool)

    return select


def retro_select_gather_attn(config: ModelArgs, lengths_before: jax.Array,
                             select_fn, cluster_slots, kv_store, rec0, *,
                             nprobe: int, recent_rows: int, mesh=None):
    """attn_impl for the ROUND-OPENING draft step: select clusters
    (select_fn(q, l) -> (top_c, keep) — RetroInfer fixed top-nprobe or
    SqueezedAttention mass-threshold), gather them, WRITE them into
    per-round buffers, attend.

    caches = (ck, cv, rk, rv, rslot) with rk/rv [L, B, nprobe*cap, HD] and
    rslot [L, B, nprobe*cap] int32 (absolute slot ids, -1 invalid). The
    remaining gamma-1 draft steps of the round reuse the buffers
    (roundbuf_draft_attn) so the descriptor-issue-bound cluster gather is
    paid ONCE per round instead of once per draft token; selections are at
    most gamma tokens stale, and the live recent window covers everything
    appended during the round.
    """
    cap = cluster_slots.shape[3]

    def impl(q, k, v, caches, l):
        ck, cv, rk, rv, rslot = caches
        B, T = q.shape[:2]
        S = ck.shape[2]
        positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        ck = cache_lib.append_at_layer(ck, k, lengths_before, l)
        cv = cache_lib.append_at_layer(cv, v, lengths_before, l)

        top_c, keep = select_fn(q, l)                      # [B, nprobe] x2

        cs = cluster_slots[l]                              # [B, C, cap]
        sel_slots = jax.vmap(lambda a, i: a[i])(cs, top_c)  # [B, nprobe, cap]
        sel_slots = jnp.where(keep[..., None], sel_slots, -1)
        sel_slots = sel_slots.reshape(B, -1)               # [B, nprobe*cap]
        HD = ck.shape[3]

        if kv_store is not None:
            # whole clusters (K rows + V rows) per DMA descriptor
            from magicdec_tpu.ops.pallas.page_gather import \
                page_gather_single_sharded
            blocks = page_gather_single_sharded(kv_store, l, top_c,
                                                page=2 * cap, mesh=mesh)
            k_sel = blocks[:, :, :cap].reshape(B, nprobe * cap, HD)
            v_sel = blocks[:, :, cap:].reshape(B, nprobe * cap, HD)
        else:
            # CPU fallback: member rows sliced from the stacked cache
            slot_gather = jnp.clip(sel_slots, 0, S - 1)

            def slice_row(b, s):
                kr = jax.lax.dynamic_slice(ck, (l, b, s, 0), (1, 1, 1, HD))
                vr = jax.lax.dynamic_slice(cv, (l, b, s, 0), (1, 1, 1, HD))
                return kr[0, 0, 0], vr[0, 0, 0]

            take = jax.vmap(jax.vmap(slice_row, (None, 0)), (0, 0))
            k_sel, v_sel = take(jnp.arange(B), slot_gather)

        rk = jax.lax.dynamic_update_slice(rk, k_sel[None].astype(rk.dtype),
                                          (l, 0, 0, 0))
        rv = jax.lax.dynamic_update_slice(rv, v_sel[None].astype(rv.dtype),
                                          (l, 0, 0, 0))
        rslot = jax.lax.dynamic_update_slice(rslot, sel_slots[None],
                                             (l, 0, 0))
        ctx = _attend_selected(config, q, k_sel, v_sel, sel_slots, ck, cv, l,
                               lengths_before, rec0, recent_rows)
        return ctx, (ck, cv, rk, rv, rslot)

    return impl


def roundbuf_draft_attn(config: ModelArgs, lengths_before: jax.Array,
                        rk, rv, rslot, rec0, *, recent_rows: int):
    """attn_impl for draft steps 2..gamma: attend the round's gathered
    working set (rk/rv/rslot, built by the round-opening step) plus the live
    recent window. No gather, no scoring — the draft's HBM traffic is the
    O(budget) buffer read only."""

    def impl(q, k, v, caches, l):
        ck, cv = caches
        B, T = q.shape[:2]
        positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        ck = cache_lib.append_at_layer(ck, k, lengths_before, l)
        cv = cache_lib.append_at_layer(cv, v, lengths_before, l)
        ctx = _attend_selected(config, q, rk[l], rv[l], rslot[l], ck, cv, l,
                               lengths_before, rec0, recent_rows)
        return ctx, (ck, cv)

    return impl


def clustered_draft_loop(params, config: ModelArgs, ck, cv, lenT0, buffer0,
                         select_fn, cluster_slots, kv_store, *, gamma: int,
                         nprobe: int, cap: int, recent: int, mesh=None):
    """The gamma-step clustered draft loop shared by the RetroInfer and
    SqueezedAttention engines: one select+gather step, then gamma-1 steps
    over the round buffer. Returns (ck, cv, buffer [B, gamma+1])."""
    L, B = ck.shape[0], ck.shape[1]
    HD = ck.shape[3]
    NS = nprobe * cap
    rk = jnp.zeros((L, B, NS, HD), ck.dtype)
    rv = jnp.zeros((L, B, NS, HD), cv.dtype)
    rslot = jnp.full((L, B, NS), -1, jnp.int32)

    # round-fixed recent window: spans the last `recent` prefix rows plus
    # every slot this round's draft steps will append (gamma tokens)
    recent_rows = recent + gamma
    rec0 = jnp.maximum(lenT0 + 1 - recent, 0)
    lens, tok = lenT0, buffer0
    impl = retro_select_gather_attn(config, lens, select_fn, cluster_slots,
                                    kv_store, rec0, nprobe=nprobe,
                                    recent_rows=recent_rows, mesh=mesh)
    logits, (ck, cv, rk, rv, rslot) = llama.forward(
        params, config, tok, impl, (ck, cv, rk, rv, rslot), last_only=True)
    tok = argmax_tokens(logits)
    lens = lens + 1
    drafted = [tok]
    for _ in range(gamma - 1):
        impl = roundbuf_draft_attn(config, lens, rk, rv, rslot, rec0,
                                   recent_rows=recent_rows)
        logits, (ck, cv) = llama.forward(params, config, tok, impl, (ck, cv),
                                         last_only=True)
        tok = argmax_tokens(logits)
        lens = lens + 1
        drafted.append(tok)
    return ck, cv, jnp.concatenate([buffer0] + drafted, axis=1)


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
    cluster index is built once from the prefill cache; fresh tokens are
    covered by the forced recent window (the reference similarly rebuilds
    its wave index only at prefill). Cluster selection+gather runs once per
    ROUND (the gather is DMA-descriptor-bound); steps 2..gamma attend the
    round buffer."""
    from magicdec_tpu.engine import attention_impls as impls
    from magicdec_tpu.engine.spec import _accept_and_update

    max_len = cache.k.shape[2]
    centroids, cluster_slots = build_cluster_index(config, cache, n_clusters,
                                                   cap)
    kv_store = (build_clustered_store(cache, cluster_slots, cap)
                if jax.default_backend() == "tpu" else None)

    def cond(state):
        cache, gen_counts, terminal = state[0], state[3], state[6]
        return (~terminal
                & (jnp.min(gen_counts) < max_new_tokens)
                & (jnp.max(cache.lengths) + gamma + 1 <= max_len))

    def body(state):
        cache, buffer0, output, gen_counts, rounds, accepted, terminal = state
        lenT0 = cache.lengths
        select_fn = retro_select_fn(config, centroids, nprobe=nprobe,
                                    mesh=mesh)
        ck, cv, buffer = clustered_draft_loop(
            params, config, cache.k, cache.v, lenT0, buffer0, select_fn,
            cluster_slots, kv_store, gamma=gamma, nprobe=nprobe, cap=cap,
            recent=recent, mesh=mesh)

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
