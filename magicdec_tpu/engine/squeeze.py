"""SqueezedAttention-style drafting: thresholded cluster selection.

TPU-native re-design of the fork's SqueezedAttention engine
(Engine/SqueezedAttention/: offline cuML k-means over the fixed-context keys
squeezedattention/clustering.py:12-101, online query-vs-centroid comparison
keeping clusters above a probability-threshold percentile with Triton sparse
gathers kernels.py:10+, draft = same model with use_centroids=True
backend.py:149-175, verify = full forward backend.py:124-147).

Shares the cluster index + round-buffer draft machinery with the RetroInfer
engine (engine/retro.py) — both cluster prefix keys per (layer, sequence);
they differ ONLY in the selection rule: RetroInfer takes a FIXED top-nprobe,
SqueezedAttention keeps every cluster whose estimated softmax mass clears a
threshold. Fixed XLA shapes can't gather a variable cluster count, so the
adaptation is: rank clusters by estimated mass, take a fixed max_clusters
superset, and MASK OUT the members of clusters below the threshold — the
effective (attended) cluster count adapts per query exactly as the method
prescribes, under a static compute envelope. Selection+gather runs once per
ROUND (the gather is DMA-descriptor-bound, ~1.7us each on v5e); draft steps
2..gamma attend the round buffer plus the live recent window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from magicdec_tpu.cache import KVCache
from magicdec_tpu.models.config import ModelArgs

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


def squeeze_select_fn(config: ModelArgs, centroids, counts, *,
                      max_clusters: int, threshold: float):
    """select_fn adapter for retro's round-buffer draft machinery."""
    def select(q, l):
        return squeeze_select(config, q, centroids[l], counts[l],
                              max_clusters=max_clusters, threshold=threshold)
    return select


@functools.partial(
    jax.jit,
    static_argnames=("config", "gamma", "max_new_tokens", "cap",
                     "max_clusters", "recent", "mesh"),
    donate_argnames=("cache", "output", "gen_counts"))
def squeeze_generate_fused(params, config: ModelArgs, cache: KVCache, index,
                           buffer0, output, gen_counts, eot, gamma: int,
                           max_new_tokens: int, cap: int,
                           max_clusters: int, threshold: float, recent: int,
                           mesh=None):
    """Full SqueezedAttention-style self-spec generation (one while_loop):
    the retro round-buffer + tail machinery with the mass-threshold
    selection rule plugged in as select_fn. `index` is the PREFILL-BUILT
    retrieval state (retro.build_retro_state — the upstream clusters OFFLINE,
    squeezedattention/clustering.py:12-101, so prefill-time construction is
    the faithful placement). Rows aging out of the tail window are folded
    into the cluster index (update_cluster_index), and the mass estimate uses
    the LIVE member counts."""
    from magicdec_tpu.engine.retro import (_roundtail_generate_fused,
                                           retro_select_gather_fn,
                                           update_cluster_index)

    centroids, cluster_slots, kv_store, counts, indexed_upto = index

    def update_index(index_state, cache, old_base, new_base, age_max):
        slots, store, cnts = index_state
        return update_cluster_index(config, cache, centroids, slots, store,
                                    cnts, old_base, new_base, indexed_upto,
                                    age_max=age_max, cap=cap)

    def make_select_gather(tail_base, index_state):
        slots, store, cnts = index_state
        select_fn = squeeze_select_fn(config, centroids,
                                      cnts.astype(jnp.float32),
                                      max_clusters=max_clusters,
                                      threshold=threshold)
        return retro_select_gather_fn(config, centroids, slots, store,
                                      tail_base, nprobe=max_clusters,
                                      mesh=mesh, select_fn=select_fn)

    return _roundtail_generate_fused(
        params, config, cache, buffer0, output, gen_counts, eot, gamma,
        max_new_tokens, make_select_gather, NS=max_clusters * cap,
        keep=recent, mesh=mesh, index_state=(cluster_slots, kv_store, counts),
        update_index=update_index)
