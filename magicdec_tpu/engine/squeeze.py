"""SqueezedAttention-style drafting: thresholded cluster selection.

TPU-native re-design of the fork's SqueezedAttention engine
(Engine/SqueezedAttention/: offline cuML k-means over the fixed-context keys
squeezedattention/clustering.py:12-101, online query-vs-centroid comparison
keeping clusters above a probability-threshold percentile with Triton sparse
gathers kernels.py:10+, draft = same model with use_centroids=True
backend.py:149-175, verify = full forward backend.py:124-147).

Shares the cluster index machinery with the RetroInfer engine
(engine/retro.py) — both cluster prefix keys per (layer, sequence, KV head);
they differ in the selection rule: RetroInfer takes a FIXED top-nprobe,
SqueezedAttention keeps every cluster whose estimated softmax mass clears a
threshold. Fixed XLA shapes can't gather a variable cluster count, so the
adaptation is: rank clusters by estimated mass, take a fixed max_clusters
superset, and MASK OUT the members of clusters below the threshold — the
effective (attended) cluster count adapts per query exactly as the method
prescribes, under a static compute envelope.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from magicdec_tpu import cache as cache_lib
from magicdec_tpu.cache import KVCache
from magicdec_tpu.engine.retro import build_cluster_index
from magicdec_tpu.engine.sampling import argmax_tokens
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops import attention as dense
from magicdec_tpu.ops.rope import rope

NEG_INF = -1e30


def squeeze_select(config: ModelArgs, q, cent_l, counts_l, *,
                   max_clusters: int, threshold: float):
    """The SqueezedAttention selection rule, standalone for unit testing.

    q [B,T,Hq,D] (rotated), cent_l [B,C,Hkv*D], counts_l [B,C] member counts.
    A cluster's estimated softmax mass = count * softmax(q . centroid),
    summed over heads/query rows and normalized; the top `max_clusters` by
    mass are ranked and those clearing `threshold` are kept (the fork's
    probability-threshold percentile, squeezedattention/kernels.py:10+, under
    a static compute envelope). Returns (top_c [B,maxC] int32 cluster ids,
    keep [B,maxC] bool).
    """
    Hkv, Dh = config.n_kv_head, config.head_dim
    G = config.n_head // Hkv
    B, T = q.shape[:2]
    C = cent_l.shape[1]
    qg = q.reshape(B, T, Hkv, G, Dh).astype(jnp.float32)
    cent = cent_l.reshape(B, C, Hkv, Dh)                   # [B,C,Hkv,D]
    logit = jnp.einsum("bthgd,bchd->bthgc", qg, cent) * (Dh ** -0.5)
    w = jax.nn.softmax(logit, axis=-1) * counts_l[:, None, None, None, :]
    mass = jnp.sum(w, axis=(1, 2, 3))                      # [B, C]
    mass = mass / jnp.maximum(jnp.sum(mass, -1, keepdims=True), 1e-9)
    top_mass, top_c = jax.lax.top_k(mass, max_clusters)
    keep = top_mass >= threshold                           # [B, maxC]
    return top_c, keep


def squeeze_draft_attn(config: ModelArgs, lengths_before: jax.Array,
                       centroids, cluster_slots, counts, clustered_kv=None, *,
                       max_clusters: int, threshold: float, recent: int,
                       mesh=None):
    """attn_impl for one SqueezedAttention draft step.

    centroids [L,B,C,Hkv*D] / cluster_slots [L,B,C,cap] are joint over heads
    (see retro.build_cluster_index); counts [L,B,C] are member counts. A
    cluster's estimated softmax mass = count * softmax(q . centroid), summed
    over heads; clusters whose mass fraction clears `threshold` are attended,
    bounded above by max_clusters.
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

        # estimated per-cluster softmax mass (count-weighted centroid score)
        top_c, keep = squeeze_select(config, q, centroids[l], counts[l],
                                     max_clusters=max_clusters,
                                     threshold=threshold)

        cs = cluster_slots[l]                              # [B, C, cap]
        sel = jax.vmap(lambda a, i: a[i])(cs, top_c)       # [B, maxC, cap]
        sel = jnp.where(keep[..., None], sel, -1).reshape(B, -1)
        rec0 = jnp.maximum(lengths_before + T - recent, 0)
        rec = rec0[:, None] + jnp.arange(recent, dtype=jnp.int32)[None, :]
        slot_sel = jnp.concatenate([sel, rec], axis=1)     # [B, Ssel]
        member_ok = slot_sel >= 0
        slot_gather = jnp.clip(slot_sel, 0, S - 1)
        HD = ck.shape[3]
        cap = cluster_slots.shape[3]

        if clustered_kv is not None:
            from magicdec_tpu.ops.pallas.page_gather import \
                page_gather_sharded
            cl_k, cl_v = clustered_kv
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
            def slice_row(b, s):
                kr = jax.lax.dynamic_slice(ck, (l, b, s, 0), (1, 1, 1, HD))
                vr = jax.lax.dynamic_slice(cv, (l, b, s, 0), (1, 1, 1, HD))
                return kr[0, 0, 0], vr[0, 0, 0]

            take = jax.vmap(jax.vmap(slice_row, (None, 0)), (0, 0))
            k_sel, v_sel = take(jnp.arange(B), slot_gather)
        Ssel = slot_gather.shape[1]
        k_sel = k_sel.reshape(B, Ssel, Hkv, Dh)
        v_sel = v_sel.reshape(B, Ssel, Hkv, Dh)

        from magicdec_tpu.ops.attention import decode_valid_upto
        upto = decode_valid_upto(lengths_before, T)
        mask = (member_ok[:, None, :]
                & (slot_gather[:, None, :] < upto[:, :, None]))
        ctx = dense.masked_attention_general(q, k_sel, v_sel, mask)
        return ctx.reshape(B, T, Hkv * G * Dh), (ck, cv)

    return impl


@functools.partial(
    jax.jit,
    static_argnames=("config", "gamma", "max_new_tokens", "n_clusters", "cap",
                     "max_clusters", "recent", "mesh"),
    donate_argnames=("cache", "output", "gen_counts"))
def squeeze_generate_fused(params, config: ModelArgs, cache: KVCache, buffer0,
                           output, gen_counts, eot, gamma: int,
                           max_new_tokens: int, n_clusters: int, cap: int,
                           max_clusters: int, threshold: float, recent: int,
                           mesh=None):
    """Full SqueezedAttention-style self-spec generation (one while_loop)."""
    from magicdec_tpu.engine import attention_impls as impls
    from magicdec_tpu.engine.spec import _accept_and_update

    max_len = cache.k.shape[2]
    centroids, cluster_slots = build_cluster_index(config, cache, n_clusters,
                                                   cap)
    counts = jnp.sum(cluster_slots >= 0, axis=-1).astype(jnp.float32)
    from magicdec_tpu.engine.retro import build_clustered_store
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
            impl = squeeze_draft_attn(config, lens, centroids, cluster_slots,
                                      counts, clustered_kv,
                                      max_clusters=max_clusters,
                                      threshold=threshold, recent=recent,
                                      mesh=mesh)
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
