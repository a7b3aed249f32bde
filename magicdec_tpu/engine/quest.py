"""Quest-style drafting: query-aware top-k KV page selection.

TPU-native re-design of the fork's Quest engine (Engine/Quest, an empty
submodule of mit-han-lab/Quest in the reference; its interface is known from
the callers tests/Quest/selfspec_benchmark.py:14,80-86 and
tests/selfspec_benchmark_common.py:14,166-167,262-265 — load_draft_model(
draft_budget, chunk_size, bsz, max_len, latest_k), speculate(tok, bsz, gamma),
verify, draft_kv_update(accepted)).

Method: the target cache is viewed as pages of `page` slots; each page and KV
head keeps elementwise min/max key boxes. The ROUND-OPENING draft step scores
every page with the upper bound sum_d max(q_d*kmin_d, q_d*kmax_d) (summed
over the GQA group) and gathers the top pages into the round buffer's top
region; all draft steps attend [top pages | rolling tail window] through the
flash kernel (retro.py round-buffer machinery — the gather is DMA-descriptor-
bound, so it runs once per round, not once per token). Speculated K/V ride
the target cache AND the tail window; verify dual-writes both, so rollback
is a pure length rewind.

Pages here are a SCORING granularity, not a memory layout: the cache stays
the flat packed [L, B, S, Hkv*D] buffer, so no page tables, and the draft's
HBM traffic is O(budget + metadata) with metadata = cache/page size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from magicdec_tpu.cache import KVCache
from magicdec_tpu.models.config import ModelArgs

NEG_INF = -1e30


def make_page_meta(cache: KVCache, page: int = 128):
    """Per-page/per-KV-head elementwise key boxes from the full cache.

    Returns (kmin, kmax) [L, B, P, Hkv*D] float32; slots beyond each
    sequence's length contribute +inf/-inf-neutral values so stale tails
    never attract selection.
    """
    L, B, S, HD = cache.k.shape
    P = S // page
    kf = cache.k.reshape(L, B, P, page, HD).astype(jnp.float32)
    slot = jnp.arange(S, dtype=jnp.int32).reshape(P, page)
    valid = slot[None, :, :] < cache.lengths[:, None, None]      # [B, P, page]
    big = jnp.float32(3e38)
    kmin = jnp.min(jnp.where(valid[None, ..., None], kf, big), axis=3)
    kmax = jnp.max(jnp.where(valid[None, ..., None], kf, -big), axis=3)
    return kmin, kmax


def quest_select_gather_fn(config: ModelArgs, kmin, kmax, tail_base, *,
                           n_pages: int, page: int = 128, mesh=None):
    """select_gather_fn for retro.roundtail_draft_loop: score pages with the
    min/max key boxes, gather the winners.

    Upstream Quest selects pages per attention head, but on TPU a per-head
    gather needs either a full-cache relayout or a slow element gather
    (measured 70+ ms per draft step); selecting one shared page set per
    sequence keeps the gather contiguous [page, Hkv*D] blocks — every head's
    data for a selected slot travels together. Pages fully inside the tail
    window are excluded (the window covers them); a straddling page stays
    scoreable, its covered rows deduped by the colmask.
    """
    Hkv, Dh = config.n_kv_head, config.head_dim
    G = config.n_head // Hkv

    def select_gather(q, ck, cv, l):
        B, T = q.shape[:2]
        S = ck.shape[2]
        P = S // page
        HD = ck.shape[3]
        qg = q.reshape(B, T, Hkv, G, Dh).astype(jnp.float32)
        mn = kmin[l].reshape(B, P, Hkv, Dh)
        mx = kmax[l].reshape(B, P, Hkv, Dh)
        lo = jnp.einsum("bthgd,bphd->bthgp", qg, mn)
        hi = jnp.einsum("bthgd,bphd->bthgp", qg, mx)
        scores = jnp.sum(jnp.maximum(lo, hi), axis=(2, 3))[:, -1]  # [B, P]
        first_covered = -(-tail_base // page)              # ceil
        pid = jnp.arange(P, dtype=jnp.int32)
        scores = jnp.where(pid[None, :] < first_covered[:, None], scores,
                           NEG_INF)
        top_scores, top_pages = jax.lax.top_k(scores, n_pages)   # [B, n]
        # NEG_INF ties (early generation / budget > context) return masked
        # indices — mark those page slots invalid
        top_ok = top_scores > NEG_INF / 2

        if jax.default_backend() == "tpu":
            from magicdec_tpu.ops.pallas.page_gather import \
                page_gather_sharded
            k_sel, v_sel = page_gather_sharded(ck, cv, l, top_pages,
                                               page=page, mesh=mesh)
        else:
            def slice_page(b, p):
                blk = jax.lax.dynamic_slice(ck, (l, b, p * page, 0),
                                            (1, 1, page, HD))
                vlk = jax.lax.dynamic_slice(cv, (l, b, p * page, 0),
                                            (1, 1, page, HD))
                return blk[0, 0], vlk[0, 0]

            take = jax.vmap(jax.vmap(slice_page, (None, 0)), (0, 0))
            k_sel, v_sel = take(jnp.arange(B), top_pages)
        k_sel = k_sel.reshape(B, n_pages * page, HD)
        v_sel = v_sel.reshape(B, n_pages * page, HD)
        slot_sel = jnp.where(
            top_ok[:, :, None],
            top_pages[:, :, None] * page
            + jnp.arange(page, dtype=jnp.int32)[None, None, :],
            -1).reshape(B, -1)                             # [B, n*page]
        return k_sel, v_sel, slot_sel

    return select_gather


def update_page_meta(cache: KVCache, kmin, kmax, span_start, span: int,
                     page: int = 128):
    """Incrementally recompute the boxes of the pages covering
    [span_start, span_start + span) per sequence — the region a round's
    draft+verify writes touched (at most gamma+1 slots, so 2-3 pages). Reads
    O(pages * page) of cache instead of the whole thing, keeping the
    metadata maintenance cost O(budget)-ish per round."""
    L, B, S, HD = cache.k.shape
    P = S // page
    W = span // page + 2
    start_page = jnp.clip(span_start // page, 0, P - W)          # [B]
    pidx = start_page[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    kp = cache.k.reshape(L, B, P, page, HD)
    take_b = jax.vmap(lambda a, i: a[:, i], (1, 0), 1)           # over B
    kwin = take_b(kp, pidx).astype(jnp.float32)                  # [L,B,W,page,HD]
    slot = (pidx[..., None] * page
            + jnp.arange(page, dtype=jnp.int32)).reshape(B, W, page)
    valid = slot < cache.lengths[:, None, None]
    big = jnp.float32(3e38)
    wmin = jnp.min(jnp.where(valid[None, ..., None], kwin, big), axis=3)
    wmax = jnp.max(jnp.where(valid[None, ..., None], kwin, -big), axis=3)
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    kmin = kmin.at[:, b_idx, pidx].set(wmin)
    kmax = kmax.at[:, b_idx, pidx].set(wmax)
    return kmin, kmax


@functools.partial(
    jax.jit,
    static_argnames=("config", "gamma", "max_new_tokens", "budget",
                     "latest_k", "page", "mesh"),
    donate_argnames=("cache", "output", "gen_counts"))
def quest_generate_fused(params, config: ModelArgs, cache: KVCache, index,
                         buffer0, output, gen_counts, eot, gamma: int,
                         max_new_tokens: int, budget: int, latest_k: int,
                         page: int = 128, mesh=None):
    """Full Quest self-spec generation as one on-device while_loop: rounds
    of [select+gather draft step, gamma-1 round-buffer draft steps,
    dual-write verify] plus incremental page-metadata refresh of the touched
    window (so pages of generated tokens stay selectable after they age out
    of the tail window). `index` = the PREFILL-BUILT (kmin, kmax) page boxes
    (make_page_meta) — page metadata construction belongs to encode, like the
    clustered engines' index build."""
    from magicdec_tpu.engine import attention_impls as impls
    from magicdec_tpu.engine.retro import (init_tail, roundtail_draft_loop,
                                           tail_compact)
    from magicdec_tpu.engine.sampling import argmax_tokens
    from magicdec_tpu.engine.spec import _accept_and_update
    from magicdec_tpu.models import llama

    max_len = cache.k.shape[2]
    kmin, kmax = index
    # the budget covers BOTH the selected pages and the forced tail window:
    # a budget below latest_k + page cannot be honored (it would silently
    # re-interpret as 1 page + latest_k tail > budget)
    if budget < latest_k + page:
        raise ValueError(
            f"quest draft_budget={budget} is below latest_k + page = "
            f"{latest_k + page}; the effective budget is n_pages*{page} + "
            f"{latest_k}-token tail — raise draft_budget or lower latest_k")
    n_pages = max(budget // page - latest_k // page, 1)
    NS = n_pages * page
    keep = latest_k
    Wcap = -(-(keep + 8 * (gamma + 2)) // 8) * 8
    trigger = Wcap - (gamma + 2)
    bufk, bufv, colmask, tail_len, tail_base = init_tail(cache, NS, Wcap,
                                                         keep)

    def cond(state):
        cache, gen_counts, terminal = state[0], state[9], state[11]
        return (~terminal
                & (jnp.min(gen_counts) < max_new_tokens)
                & (jnp.max(cache.lengths) + gamma + 1 <= max_len))

    def body(state):
        (cache, kmin, kmax, bufk, bufv, colmask, tail_len, tail_base, output,
         gen_counts, rounds, terminal, accepted, buffer0) = state
        old_base = tail_base
        bufk, bufv, tail_len, tail_base = tail_compact(
            bufk, bufv, tail_len, tail_base, NS=NS, keep=keep,
            trigger=trigger)
        # refresh page metadata ONLY when pages age out of the tail window
        # (they are unselectable while inside it): the per-round refresh of
        # the old design cost a ~4ms f32 gather every round
        kmin, kmax = jax.lax.cond(
            jnp.any(tail_base > old_base),
            lambda args: update_page_meta(cache, args[0], args[1], old_base,
                                          Wcap, page),
            lambda args: args,
            (kmin, kmax))
        lenT0, tlen0 = cache.lengths, tail_len
        select_gather = quest_select_gather_fn(config, kmin, kmax, tail_base,
                                               n_pages=n_pages, page=page,
                                               mesh=mesh)
        ck, cv, bufk, bufv, colmask, buffer = roundtail_draft_loop(
            params, config, cache.k, cache.v, bufk, bufv, colmask, tail_len,
            tail_base, lenT0, buffer0, select_gather, gamma=gamma, NS=NS,
            mesh=mesh)

        impl = impls.verify_dual_attn(config, lenT0, NS + tlen0, mesh=mesh)
        logits, (ck, cv, bufk, bufv) = llama.forward(
            params, config, buffer, impl, (ck, cv, bufk, bufv),
            fused=llama.fused_for_mesh(mesh))
        target_tokens = argmax_tokens(logits)
        accept, bonus, output, gen_counts, term, acc = _accept_and_update(
            buffer, target_tokens, eot, gamma, output, gen_counts)
        cache = KVCache(ck, cv, lenT0 + accept)
        tail_len = tlen0 + accept
        return (cache, kmin, kmax, bufk, bufv, colmask, tail_len, tail_base,
                output, gen_counts, rounds + 1, terminal | term,
                accepted + acc, bonus)

    state = (cache, kmin, kmax, bufk, bufv, colmask, tail_len, tail_base,
             output, gen_counts, jnp.int32(0), jnp.bool_(False), jnp.int32(0),
             buffer0)
    state = jax.lax.while_loop(cond, body, state)
    (cache, kmin, kmax, bufk, bufv, colmask, tail_len, tail_base, output,
     gen_counts, rounds, terminal, accepted, buffer0) = state
    B, cap = output.shape
    idx = jnp.minimum(gen_counts, cap - 1)
    output = output.at[jnp.arange(B), idx].set(buffer0[:, 0])
    return cache, output, gen_counts + 1, rounds, accepted
