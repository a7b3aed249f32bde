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

# generations up to this many tokens keep every generated row in the tail
# window (no in-loop index maintenance); longer ones fold aged rows into the
# cluster index per round (update_cluster_index) — see
# _roundtail_generate_fused. Tests monkeypatch this to force the fold path.
TAIL_COVERS_MAX = 256


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

    # layer-by-layer scan: the Lloyd distance matrix and the member one-hot
    # are [B, S, C] transients — materializing them for ALL layers at once
    # is O(L*B*S*C) and OOMs at long context (8.7 GB at P=32k, C=S/32)
    def per_layer(_, k_l):
        cent_l, assign_l = kmeans(k_l, valid, n_clusters)
        slots_l = member_slot_table(assign_l, valid, n_clusters, cap)
        return None, (cent_l, slots_l)

    _, (cent, slots) = jax.lax.scan(per_layer, None, cache.k)
    return cent, slots


def member_slot_table(assign, valid, n_clusters: int, cap: int):
    """Per-cluster member slot lists [..., C, cap] (-1 padding) from k-means
    assignments [..., S]: rank each slot within its cluster by slot order,
    then scatter slot ids into the table (cap overflow members dropped)."""
    S = assign.shape[-1]
    slot = jnp.arange(S, dtype=jnp.int32)
    onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.int32)
    onehot = onehot * valid.astype(jnp.int32)[..., None]   # [..., S, C]
    rank = jnp.cumsum(onehot, axis=-2) - 1                 # member index
    member_rank = jnp.take_along_axis(rank, assign[..., None],
                                      axis=-1)[..., 0]     # [..., S]
    is_member = jnp.take_along_axis(onehot, assign[..., None],
                                    axis=-1)[..., 0] > 0
    ok = is_member & (member_rank < cap)
    flat_target = jnp.where(ok, assign * cap + member_rank, n_clusters * cap)

    def scatter_slots(ft):
        out = jnp.full((n_clusters * cap,), -1, jnp.int32)
        return out.at[ft].set(slot, mode="drop")

    for _ in range(flat_target.ndim - 1):
        scatter_slots = jax.vmap(scatter_slots)
    slots = scatter_slots(flat_target)
    return slots.reshape(*assign.shape[:-1], n_clusters, cap)


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
    out = jnp.zeros((L, B, C, 2 * cap, HD), cache.k.dtype)

    # layer-by-layer scan with in-place writes: the whole-store gather would
    # otherwise materialize ~3x the store transiently (k rows + v rows +
    # interleave) and OOM next to the live cache at production sizes
    def per_layer(out, xs):
        k_l, v_l, src_l = xs
        take = jax.vmap(lambda a, i: a[i])
        k_rows = take(k_l, src_l).reshape(B, C, cap, HD)
        v_rows = take(v_l, src_l).reshape(B, C, cap, HD)
        layer = jnp.concatenate([k_rows, v_rows], axis=2)   # [B,C,2cap,HD]
        return out, layer

    _, layers = jax.lax.scan(per_layer, out, (cache.k, cache.v, src))
    return layers.reshape(L, B, C * 2 * cap, HD)


# ---------------------------------------------------------------------------
# Round-buffer + tail drafting machinery (shared by quest/retro/squeeze)
# ---------------------------------------------------------------------------
# Layout: ONE stacked draft buffer [L, B, R = NS + Wcap, Hkv*D] per fused
# generation. Columns [0, NS) are the round's gathered working set (pages or
# clusters — refreshed by the round-opening draft step; pad/dedup holes
# expressed by a colmask), columns [NS, NS+Wcap) a rolling TAIL window
# maintained INCREMENTALLY: draft steps append their K/V there, verify
# dual-writes it (identical to the SnapKV dual-cache discipline), rollback
# rewinds tail_len, and an amortized compaction shifts the window left.
# Nothing on the draft hot path slices the target cache — the per-step
# XLA gathers that capped these engines below 1x are gone — and attention
# runs through the flash kernel (two intervals + colmask), the same class of
# program as the SnapKV draft.


def build_retro_state(config: ModelArgs, cache: KVCache, n_clusters: int,
                      cap: int):
    """Build the full retrieval-index state at PREFILL time: (centroids,
    cluster_slots, kv_store|None, counts, indexed_upto).

    The reference clusters during prefill too (RetroInfer's
    prefill_update_kv_cache runs its Triton k-means inside the prefill pass,
    Engine/RetrievalAttention/cache_hub/retroinfer_cache.py:349), so index
    construction belongs to encode(), not the decode loop — at P=32k the
    in-jit build (k-means over 33k keys/layer + the store gather) costs
    hundreds of ms, which round 3 paid INSIDE the timed generation and which
    inverted the flagship speedup (0.59x)."""
    centroids, cluster_slots = build_cluster_index(config, cache, n_clusters,
                                                   cap)
    kv_store = (build_clustered_store(cache, cluster_slots, cap)
                if jax.default_backend() == "tpu" else None)
    counts = jnp.sum(cluster_slots >= 0, axis=-1).astype(jnp.int32)
    # fresh buffer (not an alias of cache.lengths): the generate call donates
    # `cache`, and an aliased lengths array in the index tuple would trip
    # XLA's donated-buffer-reuse check (`f(donate(a), a)`)
    indexed_upto = cache.lengths + jnp.zeros_like(cache.lengths)
    return centroids, cluster_slots, kv_store, counts, indexed_upto


def update_cluster_index(config: ModelArgs, cache: KVCache, centroids,
                         cluster_slots, kv_store, counts, old_base, new_base,
                         indexed_upto, *, age_max: int, cap: int):
    """Keep generated tokens selectable after they age out of the tail
    window: rows [old_base, new_base) per sequence (just compacted away)
    are assigned to their NEAREST existing centroid and appended to the
    member table — and, on device, to the KV-fused cluster store — so the
    draft can still retrieve them (quest's update_page_meta discipline;
    reference parity: RetroInfer's wrapper re-runs clustered attention over
    the whole updated prefix each speculate,
    Engine/RetrievalAttention/backend.py:113-129, so generated tokens are
    always retrievable there).

    counts [L, B, C] int32 live member counts (fill pointers); rows landing
    in a full cluster (fill >= cap) are dropped from the index, like
    build_cluster_index's overflow members. Centroids stay fixed — the
    assignment uses the k-means metric (ops/kmeans.py step).

    indexed_upto [B]: the prefill lengths the index was BUILT from — prefix
    rows below it are already members (the first compactions age out
    prefill-era tail rows, which must not be double-indexed: a duplicate key
    would be attended twice)."""
    L, B, S, HD = cache.k.shape
    C = cluster_slots.shape[2]
    j = jnp.arange(age_max, dtype=jnp.int32)
    slot = old_base[:, None] + j[None, :]                     # [B, A]
    valid = (j[None, :] < (new_base - old_base)[:, None]) \
        & (slot >= indexed_upto[:, None])
    src = jnp.clip(slot, 0, S - 1)

    def per_layer(k_l, v_l):
        take = jax.vmap(lambda a, i: a[i])
        return take(k_l, src), take(v_l, src)

    k_rows, v_rows = jax.vmap(per_layer)(cache.k, cache.v)    # [L,B,A,HD]
    kf = k_rows.astype(jnp.float32)
    d = (-2.0 * jnp.einsum("lbad,lbcd->lbac", kf, centroids)
         + jnp.sum(centroids * centroids, axis=-1)[:, :, None, :])
    assign = jnp.argmin(d, axis=-1).astype(jnp.int32)         # [L, B, A]

    onehot = jax.nn.one_hot(assign, C, dtype=jnp.int32)       # [L,B,A,C]
    onehot = onehot * valid[None, :, :, None]
    rank = jnp.cumsum(onehot, axis=2) - 1
    rank = jnp.take_along_axis(rank, assign[..., None], -1)[..., 0]
    fill = jnp.take_along_axis(counts, assign, axis=-1) + rank  # [L,B,A]
    ok = valid[None] & (fill < cap)
    added = jnp.sum(onehot * ok[..., None].astype(jnp.int32), axis=2)
    new_counts = jnp.minimum(counts + added, cap)

    slot_lba = jnp.broadcast_to(slot[None], (L, B, age_max))
    flat_tgt = jnp.where(ok, assign * cap + fill, C * cap)    # OOB -> drop

    def scat_slots(tbl, ft, sl):                              # per (l, b)
        return tbl.reshape(-1).at[ft].set(sl, mode="drop").reshape(tbl.shape)

    new_slots = jax.vmap(jax.vmap(scat_slots))(cluster_slots, flat_tgt,
                                               slot_lba)
    if kv_store is not None:
        rk = jnp.where(ok, assign * (2 * cap) + fill, kv_store.shape[2])
        rv = jnp.where(ok, assign * (2 * cap) + cap + fill, kv_store.shape[2])

        def scat_rows(st, r_k, r_v, kr, vr):                  # per (l, b)
            st = st.at[r_k].set(kr.astype(st.dtype), mode="drop")
            return st.at[r_v].set(vr.astype(st.dtype), mode="drop")

        kv_store = jax.vmap(jax.vmap(scat_rows))(kv_store, rk, rv, k_rows,
                                                 v_rows)
    return new_slots, kv_store, new_counts


def init_tail(cache: KVCache, NS: int, Wcap: int, keep: int):
    """Allocate the combined draft buffer and fill its tail region with the
    last `keep` rows of the (prefilled) target cache. Returns
    (bufk, bufv [L,B,R,HD], colmask [L,B,R] int32, tail_len [B],
    tail_base [B] = absolute slot of tail column 0)."""
    L, B, S, HD = cache.k.shape
    R = NS + Wcap
    tail_len = jnp.minimum(cache.lengths, keep)
    tail_base = cache.lengths - tail_len
    src = tail_base[:, None] + jnp.arange(Wcap, dtype=jnp.int32)[None, :]
    src = jnp.clip(src, 0, S - 1)

    def per_layer(k_l, v_l):
        take = jax.vmap(lambda a, i: a[i])
        return take(k_l, src), take(v_l, src)

    tk, tv = jax.vmap(per_layer)(cache.k, cache.v)          # [L,B,Wcap,HD]
    bufk = jnp.zeros((L, B, R, HD), cache.k.dtype).at[:, :, NS:].set(tk)
    bufv = jnp.zeros((L, B, R, HD), cache.v.dtype).at[:, :, NS:].set(tv)
    # top region bits are rewritten by each round's opening step; tail bits
    # stay 1 forever (causality is the kernel's [lo, hi) interval); the
    # singleton axis keeps the kernel's block shapes TPU-legal
    colmask = jnp.concatenate(
        [jnp.zeros((L, B, 1, NS), jnp.int32),
         jnp.ones((L, B, 1, Wcap), jnp.int32)], axis=3)
    return bufk, bufv, colmask, tail_len, tail_base


def tail_compact(bufk, bufv, tail_len, tail_base, *, NS: int, keep: int,
                 trigger: int):
    """Amortized left-shift of the tail window (keep the newest `keep`
    rows), triggered when any sequence's tail exceeds `trigger`."""
    need = jnp.any(tail_len > trigger)

    def do(args):
        bufk, bufv, tail_len, tail_base = args
        Wcap = bufk.shape[2] - NS
        shift = jnp.maximum(tail_len - keep, 0)              # [B]
        src = NS + shift[:, None] + jnp.arange(Wcap, dtype=jnp.int32)[None, :]
        src = jnp.clip(src, 0, bufk.shape[2] - 1)

        def per_layer(k_l, v_l):
            take = jax.vmap(lambda a, i: a[i])
            return take(k_l, src), take(v_l, src)

        tk, tv = jax.vmap(per_layer)(bufk, bufv)
        bufk = bufk.at[:, :, NS:].set(tk)
        bufv = bufv.at[:, :, NS:].set(tv)
        return bufk, bufv, tail_len - shift, tail_base + shift

    return jax.lax.cond(need, do, lambda a: a,
                        (bufk, bufv, tail_len, tail_base))


def _tail_attend(config, q, bufk, bufv, colmask, l, tail_len_before, *,
                 NS: int, mesh=None):
    """Flash attention over [gathered top region | causal tail]: row t
    attends top columns with colmask bits plus tail columns [NS, NS +
    tail_len_before + t + 1). Dense (mask-equivalent) off-TPU."""
    from magicdec_tpu.engine.attention_impls import _interp, _use_flash
    B, T = q.shape[:2]
    ns = jnp.full((B, T), NS, jnp.int32)
    hi = (NS + tail_len_before[:, None]
          + jnp.arange(1, T + 1, dtype=jnp.int32)[None, :])
    if _use_flash(config, T):
        from magicdec_tpu.ops.pallas.flash_decode import \
            flash_decode_stacked_masked
        if mesh is None or mesh.devices.size == 1:
            return flash_decode_stacked_masked(q, bufk, bufv, l, colmask,
                                               ns, ns, hi,
                                               interpret=_interp())
        from jax.sharding import PartitionSpec as P
        fn = jax.shard_map(
            functools.partial(flash_decode_stacked_masked,
                              interpret=_interp()),
            mesh=mesh,
            in_specs=(P("dp", None, "tp", None), P(None, "dp", None, "tp"),
                      P(None, "dp", None, "tp"), P(),
                      P(None, "dp", None, None),
                      P("dp", None), P("dp", None), P("dp", None)),
            out_specs=P("dp", None, "tp", None), check_vma=False)
        return fn(q, bufk, bufv, l, colmask, ns, ns, hi)
    Hkv, Dh = config.n_kv_head, config.head_dim
    R = bufk.shape[2]
    col = jnp.arange(R, dtype=jnp.int32)
    mask = ((col[None, None, :] < NS) & (colmask[l][:, 0, :][:, None, :] > 0)
            | ((col[None, None, :] >= NS) & (col[None, None, :] < hi[:, :, None])))
    ctx = dense.masked_attention_general(
        q, bufk[l].reshape(B, R, Hkv, Dh), bufv[l].reshape(B, R, Hkv, Dh),
        mask)
    return ctx


def roundtail_select_attn(config: ModelArgs, lengths_before: jax.Array,
                          tail_len_before, tail_base, select_gather_fn, *,
                          NS: int, mesh=None):
    """attn_impl for the ROUND-OPENING draft step: select + gather blocks
    into the buffer's top region, stamp the colmask (pad holes, and rows the
    tail already covers — exact dedup), append the step's K/V to the tail,
    attend. caches = (ck, cv, bufk, bufv, colmask).

    select_gather_fn(q_rotated, ck, cv, l) -> (k_sel, v_sel [B, NS, HD],
    sel_slots [B, NS] absolute cache slots, -1 invalid) — page scoring
    (quest) or centroid scoring (retro/squeeze).
    """

    def impl(q, k, v, caches, l):
        ck, cv, bufk, bufv, colmask = caches
        B, T = q.shape[:2]
        positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        # no target-cache write: verify dual-writes these slots
        k_sel, v_sel, sel_slots = select_gather_fn(q, ck, cv, l)
        bufk = jax.lax.dynamic_update_slice(
            bufk, k_sel[None].astype(bufk.dtype), (l, 0, 0, 0))
        bufv = jax.lax.dynamic_update_slice(
            bufv, v_sel[None].astype(bufv.dtype), (l, 0, 0, 0))
        cm_top = ((sel_slots >= 0)
                  & (sel_slots < tail_base[:, None])).astype(jnp.int32)
        colmask = jax.lax.dynamic_update_slice(
            colmask, cm_top[None, :, None, :], (l, 0, 0, 0))
        bufk = cache_lib.append_at_layer(bufk, k, NS + tail_len_before, l)
        bufv = cache_lib.append_at_layer(bufv, v, NS + tail_len_before, l)
        ctx = _tail_attend(config, q, bufk, bufv, colmask, l,
                           tail_len_before, NS=NS, mesh=mesh)
        B_, T_ = q.shape[:2]
        return ctx.reshape(B_, T_, -1), (ck, cv, bufk, bufv, colmask)

    return impl


def roundtail_draft_attn(config: ModelArgs, lengths_before: jax.Array,
                         tail_len_before, *, NS: int, mesh=None):
    """attn_impl for draft steps 2..gamma: append to the tail, attend the
    round buffer — no gather, no scoring, no target-cache reads OR writes
    (speculated K/V live only in the tail; the verify recomputes them and
    dual-writes the target cache at the same slots, so a draft-side target
    write would be dead — removing it saves 2 scatters x n_layer per step).
    caches = (ck, cv, bufk, bufv, colmask)."""

    def impl(q, k, v, caches, l):
        ck, cv, bufk, bufv, colmask = caches
        B, T = q.shape[:2]
        positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        bufk = cache_lib.append_at_layer(bufk, k, NS + tail_len_before, l)
        bufv = cache_lib.append_at_layer(bufv, v, NS + tail_len_before, l)
        ctx = _tail_attend(config, q, bufk, bufv, colmask, l,
                           tail_len_before, NS=NS, mesh=mesh)
        return ctx.reshape(B, T, -1), (ck, cv, bufk, bufv, colmask)

    return impl


def roundtail_draft_loop(params, config: ModelArgs, ck, cv, bufk, bufv,
                         colmask, tail_len, tail_base, lenT0, buffer0,
                         select_gather_fn, *, gamma: int, NS: int, mesh=None):
    """The gamma-step round-buffer draft loop shared by quest/retro/squeeze:
    one select+gather step, then gamma-1 tail steps. Returns
    (ck, cv, bufk, bufv, colmask, buffer [B, gamma+1])."""
    lens, tlen, tok = lenT0, tail_len, buffer0
    impl = roundtail_select_attn(config, lens, tlen, tail_base,
                                 select_gather_fn, NS=NS, mesh=mesh)
    logits, (ck, cv, bufk, bufv, colmask) = llama.forward(
        params, config, tok, impl, (ck, cv, bufk, bufv, colmask),
        last_only=True, fused=llama.fused_for_mesh(mesh))
    tok = argmax_tokens(logits)
    lens, tlen = lens + 1, tlen + 1
    drafted = [tok]
    for _ in range(gamma - 1):
        impl = roundtail_draft_attn(config, lens, tlen, NS=NS, mesh=mesh)
        logits, (ck, cv, bufk, bufv, colmask) = llama.forward(
            params, config, tok, impl, (ck, cv, bufk, bufv, colmask),
            last_only=True, fused=llama.fused_for_mesh(mesh))
        tok = argmax_tokens(logits)
        lens, tlen = lens + 1, tlen + 1
        drafted.append(tok)
    return ck, cv, bufk, bufv, colmask, jnp.concatenate([buffer0] + drafted,
                                                        axis=1)


def retro_select_gather_fn(config: ModelArgs, centroids, cluster_slots,
                           kv_store, tail_base, *, nprobe: int, mesh=None,
                           select_fn=None):
    """select_gather_fn for the clustered engines: centroid-score top-nprobe
    (or a custom select_fn — SqueezedAttention's threshold rule), then fetch
    whole clusters (K and V together) from the KV-fused cluster-major store
    with one DMA descriptor each. CPU fallback slices member rows."""
    Hkv, Dh = config.n_kv_head, config.head_dim
    cap = cluster_slots.shape[3]

    def default_select(q, l):
        from magicdec_tpu.ops.pallas.gemm_softmax import (
            centroid_scores_sharded, centroid_scores_xla)
        B = q.shape[0]
        C = centroids.shape[2]
        cent = centroids[l].reshape(B, C, Hkv, Dh).transpose(0, 2, 1, 3)
        if jax.default_backend() == "tpu":
            scores = centroid_scores_sharded(q, cent, mesh=mesh)
        else:
            scores = centroid_scores_xla(q, cent)
        scores = jnp.sum(scores, axis=1)                   # [B, C]
        _, top_c = jax.lax.top_k(scores, nprobe)
        return top_c, jnp.ones(top_c.shape, bool)

    sel = select_fn or default_select

    def select_gather(q, ck, cv, l):
        B = q.shape[0]
        S = ck.shape[2]
        HD = ck.shape[3]
        top_c, keep = sel(q, l)                            # [B, nprobe] x2
        cs = cluster_slots[l]                              # [B, C, cap]
        sel_slots = jax.vmap(lambda a, i: a[i])(cs, top_c)  # [B,nprobe,cap]
        sel_slots = jnp.where(keep[..., None], sel_slots, -1)
        sel_slots = sel_slots.reshape(B, -1)
        if kv_store is not None:
            from magicdec_tpu.ops.pallas.page_gather import \
                page_gather_single_sharded
            blocks = page_gather_single_sharded(kv_store, l, top_c,
                                                page=2 * cap, mesh=mesh)
            k_sel = blocks[:, :, :cap].reshape(B, nprobe * cap, HD)
            v_sel = blocks[:, :, cap:].reshape(B, nprobe * cap, HD)
        else:
            slot_gather = jnp.clip(sel_slots, 0, S - 1)

            def slice_row(b, s):
                kr = jax.lax.dynamic_slice(ck, (l, b, s, 0), (1, 1, 1, HD))
                vr = jax.lax.dynamic_slice(cv, (l, b, s, 0), (1, 1, 1, HD))
                return kr[0, 0, 0], vr[0, 0, 0]

            take = jax.vmap(jax.vmap(slice_row, (None, 0)), (0, 0))
            k_sel, v_sel = take(jnp.arange(B), slot_gather)
        return k_sel, v_sel, sel_slots

    return select_gather


def _roundtail_generate_fused(params, config: ModelArgs, cache: KVCache,
                              buffer0, output, gen_counts, eot, gamma: int,
                              max_new_tokens: int, make_select_gather, *,
                              NS: int, keep: int, mesh=None,
                              index_state=None, update_index=None):
    """Shared fused generation loop for the round-buffer engines.
    make_select_gather(tail_base, index_state) -> select_gather_fn
    (tail_base enters the selection exclusion / dedup).

    index_state (loop-carried pytree) + update_index(index_state, cache,
    old_base, new_base): keeps the retrieval index fresh — when compaction
    ages rows out of the tail window, they are folded into the index so the
    draft can still select them (update_cluster_index).

    Short generations (max_new_tokens <= 256, incl. the reference's 80-token
    protocol) instead widen the tail window to cover the WHOLE generation:
    nothing ages out, so no in-loop index maintenance runs at all — and the
    draft ALWAYS attends every generated token, which is exactly the
    reference wrapper's semantics (it re-attends the whole updated prefix
    each speculate, RetrievalAttention/backend.py:113-129). The index fold
    is the long-generation path: an unconditional per-round fold costs
    ~20 ms/round (gather+scatter over the store), and a lax.cond around a
    multi-GB carried store makes XLA materialize select-copies."""
    from magicdec_tpu.engine import attention_impls as impls
    from magicdec_tpu.engine.spec import _accept_and_update

    max_len = cache.k.shape[2]
    if max_new_tokens <= TAIL_COVERS_MAX:
        keep = keep + max_new_tokens + gamma + 1
        update_index = None
    # slack >> one round's appends: the compaction gather then amortizes
    # over ~8 rounds instead of firing every round; rounded up so the
    # round buffer's column count stays TPU-tile (8) aligned
    Wcap = -(-(keep + 8 * (gamma + 2)) // 8) * 8
    trigger = Wcap - (gamma + 2)
    # max compaction shift = tail_len - keep <= Wcap - keep (derived from the
    # ACTUAL Wcap including its tile-alignment padding, so no aged row can
    # fall outside the fold window and silently drop from the index)
    age_max = Wcap - keep
    bufk, bufv, colmask, tail_len, tail_base = init_tail(cache, NS, Wcap,
                                                         keep)

    def cond(state):
        cache, gen_counts, terminal = state[0], state[7], state[9]
        return (~terminal
                & (jnp.min(gen_counts) < max_new_tokens)
                & (jnp.max(cache.lengths) + gamma + 1 <= max_len))

    # when no in-loop index maintenance runs (the tail-covers path), the
    # index must NOT ride the while carry: XLA materializes carry copies of
    # the multi-GB KV-fused store every round (measured ~48 ms/round at
    # P=32k) — close over it as a constant instead
    carry_index = update_index is not None
    const_index = None if carry_index else index_state

    def body(state):
        (cache, bufk, bufv, colmask, tail_len, tail_base, output, gen_counts,
         rounds, terminal, accepted, buffer0, index_state) = state
        if not carry_index:
            index_state = const_index
        old_base = tail_base
        bufk, bufv, tail_len, tail_base = tail_compact(
            bufk, bufv, tail_len, tail_base, NS=NS, keep=keep,
            trigger=trigger)
        if update_index is not None:
            # UNconditional: when nothing aged out the row mask is empty and
            # the scatters write nothing — a lax.cond here would make XLA
            # materialize select-copies of the carried store (OOM at B=128)
            index_state = update_index(index_state, cache, old_base,
                                       tail_base, age_max)
        lenT0, tlen0 = cache.lengths, tail_len
        select_gather_fn = make_select_gather(tail_base, index_state)
        ck, cv, bufk, bufv, colmask, buffer = roundtail_draft_loop(
            params, config, cache.k, cache.v, bufk, bufv, colmask, tail_len,
            tail_base, lenT0, buffer0, select_gather_fn, gamma=gamma, NS=NS,
            mesh=mesh)

        # verify: full target attention, dual-writing the tail region at the
        # round-start offset (the SnapKV dual-cache discipline)
        impl = impls.verify_dual_attn(config, lenT0, NS + tlen0, mesh=mesh)
        logits, (ck, cv, bufk, bufv) = llama.forward(
            params, config, buffer, impl, (ck, cv, bufk, bufv),
            fused=llama.fused_for_mesh(mesh))
        target_tokens = argmax_tokens(logits)
        accept, bonus, output, gen_counts, term, acc = _accept_and_update(
            buffer, target_tokens, eot, gamma, output, gen_counts)
        cache = KVCache(ck, cv, lenT0 + accept)
        tail_len = tlen0 + accept
        return (cache, bufk, bufv, colmask, tail_len, tail_base, output,
                gen_counts, rounds + 1, terminal | term, accepted + acc,
                bonus, index_state if carry_index else None)

    state = (cache, bufk, bufv, colmask, tail_len, tail_base, output,
             gen_counts, jnp.int32(0), jnp.bool_(False), jnp.int32(0),
             buffer0, index_state if carry_index else None)
    state = jax.lax.while_loop(cond, body, state)
    (cache, bufk, bufv, colmask, tail_len, tail_base, output, gen_counts,
     rounds, terminal, accepted, buffer0, index_state) = state
    B, capo = output.shape
    idx = jnp.minimum(gen_counts, capo - 1)
    output = output.at[jnp.arange(B), idx].set(buffer0[:, 0])
    return cache, output, gen_counts + 1, rounds, accepted


@functools.partial(
    jax.jit,
    static_argnames=("config", "gamma", "max_new_tokens", "cap", "nprobe",
                     "recent", "mesh"),
    donate_argnames=("cache", "output", "gen_counts"))
def retro_generate_fused(params, config: ModelArgs, cache: KVCache, index,
                         buffer0, output, gen_counts, eot, gamma: int,
                         max_new_tokens: int, cap: int, nprobe: int,
                         recent: int, mesh=None):
    """Full RetroInfer-style self-spec generation in one while_loop. `index`
    is the PREFILL-BUILT retrieval state from build_retro_state (the
    reference also clusters at prefill); fresh tokens live in the rolling
    tail window (`recent` rows) and, once they age out of it, are folded into
    the index (update_cluster_index) so they stay selectable for the rest of
    the generation. Cluster selection+gather runs once per ROUND (the gather
    is DMA-descriptor-bound); every draft step attends
    [gathered clusters | tail] through the flash kernel."""
    centroids, cluster_slots, kv_store, counts, indexed_upto = index

    def update_index(index_state, cache, old_base, new_base, age_max):
        slots, store, cnts = index_state
        return update_cluster_index(config, cache, centroids, slots, store,
                                    cnts, old_base, new_base, indexed_upto,
                                    age_max=age_max, cap=cap)

    def make_select_gather(tail_base, index_state):
        slots, store, _ = index_state
        return retro_select_gather_fn(config, centroids, slots, store,
                                      tail_base, nprobe=nprobe, mesh=mesh)

    return _roundtail_generate_fused(
        params, config, cache, buffer0, output, gen_counts, eot, gamma,
        max_new_tokens, make_select_gather, NS=nprobe * cap, keep=recent,
        mesh=mesh, index_state=(cluster_slots, kv_store, counts),
        update_index=update_index)



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
