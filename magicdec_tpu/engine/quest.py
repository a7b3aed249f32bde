"""Quest-style drafting: query-aware top-k KV page selection.

TPU-native re-design of the fork's Quest engine (Engine/Quest, an empty
submodule of mit-han-lab/Quest in the reference; its interface is known from
the callers tests/Quest/selfspec_benchmark.py:14,80-86 and
tests/selfspec_benchmark_common.py:14,166-167,262-265 — load_draft_model(
draft_budget, chunk_size, bsz, max_len, latest_k), speculate(tok, bsz, gamma),
verify, draft_kv_update(accepted)).

Method: the target cache is viewed as pages of `page` slots; each page and KV
head keeps elementwise min/max key boxes. A draft step scores every page with
the upper bound sum_d max(q_d*kmin_d, q_d*kmax_d) (summed over the GQA group),
always includes the most recent `latest_k` slots' pages, attends only to the
top budget/page pages, and appends its K/V into the TARGET cache tail — the
verify pass overwrites those slots with full-attention activations (same
positions), so acceptance rollback stays a pure length rewind and no separate
draft cache exists at all.

Pages here are a SCORING granularity, not a memory layout: the cache stays
the flat packed [L, B, S, Hkv*D] buffer, so no page tables, and the gather of
selected pages feeds a dense attention over O(budget) keys — the draft's
memory traffic is O(budget + metadata) with metadata = cache/page size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from magicdec_tpu import cache as cache_lib
from magicdec_tpu.cache import KVCache
from magicdec_tpu.engine.sampling import argmax_tokens
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops import attention as dense
from magicdec_tpu.ops.rope import rope

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


def quest_select_gather_attn(config: ModelArgs, lengths_before: jax.Array,
                             kmin, kmax, rec0, *, n_pages: int,
                             recent_rows: int, page: int = 128, mesh=None):
    """attn_impl for the ROUND-OPENING Quest draft step: score pages with
    the min/max key boxes, gather the top pages into per-round buffers,
    attend them plus the live recent window.

    caches = (ck, cv, rk, rv, rslot) with rk/rv [L, B, n_pages*page, HD] and
    rslot [L, B, n_pages*page] int32. Steps 2..gamma reuse the buffers
    (retro.roundbuf_draft_attn): the page gather — descriptor-issue-bound on
    TPU (~1.7us per block) — is paid once per ROUND, selections go at most
    gamma tokens stale, and the recent window (sliced fresh each step)
    covers all tokens appended during the round. This replaces the page-
    aligned forced-recent of upstream Quest with a row-granular recent
    window shared with the retro/squeeze engines.
    """
    Hkv, Dh = config.n_kv_head, config.head_dim
    G = config.n_head // Hkv

    def impl(q, k, v, caches, l):
        from magicdec_tpu.engine.retro import _attend_selected
        ck, cv, rk, rv, rslot = caches
        B, T = q.shape[:2]
        S = ck.shape[2]
        P = S // page
        positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        ck = cache_lib.append_at_layer(ck, k, lengths_before, l)
        cv = cache_lib.append_at_layer(cv, v, lengths_before, l)

        # ---- page scores: sum_{g,d} max(q*kmin, q*kmax) per head, then
        # SUMMED OVER HEADS: upstream Quest selects pages per attention head,
        # but on TPU a per-head gather needs either a full-cache relayout or
        # a slow element gather (measured 70+ ms per draft step); selecting
        # one shared page set per sequence keeps the gather a handful of
        # contiguous [page, Hkv*D] blocks (every head's data travels
        # together).
        qg = q.reshape(B, T, Hkv, G, Dh).astype(jnp.float32)
        mn = kmin[l].reshape(B, P, Hkv, Dh)
        mx = kmax[l].reshape(B, P, Hkv, Dh)
        lo = jnp.einsum("bthgd,bphd->bthgp", qg, mn)
        hi = jnp.einsum("bthgd,bphd->bthgp", qg, mx)
        scores = jnp.sum(jnp.maximum(lo, hi), axis=(2, 3))[:, -1]  # [B, P]
        # pages FULLY inside the round's recent window are excluded from
        # top-k (the window covers them); a page straddling rec0 stays
        # scoreable — its rows >= rec0 are deduped at the attention mask
        rec_page_lo = -(-rec0 // page)          # ceil: first fully-covered
        pid = jnp.arange(P, dtype=jnp.int32)
        scores = jnp.where(pid[None, :] < rec_page_lo[:, None], scores,
                           NEG_INF)
        top_scores, top_pages = jax.lax.top_k(scores, n_pages)   # [B, n]
        # NEG_INF ties (early generation / budget > context) return masked
        # indices — mark those page slots invalid
        top_ok = top_scores > NEG_INF / 2                        # [B, n]

        if jax.default_backend() == "tpu":
            from magicdec_tpu.ops.pallas.page_gather import \
                page_gather_sharded
            k_sel, v_sel = page_gather_sharded(ck, cv, l, top_pages,
                                               page=page, mesh=mesh)
        else:
            HD = ck.shape[3]

            def slice_page(b, p):
                blk = jax.lax.dynamic_slice(ck, (l, b, p * page, 0),
                                            (1, 1, page, HD))
                vlk = jax.lax.dynamic_slice(cv, (l, b, p * page, 0),
                                            (1, 1, page, HD))
                return blk[0, 0], vlk[0, 0]

            take = jax.vmap(jax.vmap(slice_page, (None, 0)), (0, 0))
            k_sel, v_sel = take(jnp.arange(B), top_pages)
        HD = ck.shape[3]
        k_sel = k_sel.reshape(B, n_pages * page, HD)
        v_sel = v_sel.reshape(B, n_pages * page, HD)
        slot_sel = jnp.where(
            top_ok[:, :, None],
            top_pages[:, :, None] * page
            + jnp.arange(page, dtype=jnp.int32)[None, None, :],
            -1).reshape(B, -1)                             # [B, n*page]

        rk = jax.lax.dynamic_update_slice(rk, k_sel[None].astype(rk.dtype),
                                          (l, 0, 0, 0))
        rv = jax.lax.dynamic_update_slice(rv, v_sel[None].astype(rv.dtype),
                                          (l, 0, 0, 0))
        rslot = jax.lax.dynamic_update_slice(rslot, slot_sel[None],
                                             (l, 0, 0))
        ctx = _attend_selected(config, q, k_sel, v_sel, slot_sel, ck, cv, l,
                               lengths_before, rec0, recent_rows)
        return ctx, (ck, cv, rk, rv, rslot)

    return impl


@functools.partial(
    jax.jit, static_argnames=("config", "gamma", "budget", "latest_k",
                              "page", "mesh"),
    donate_argnames=("cache", "output", "gen_counts"))
def quest_round(params, config: ModelArgs, cache: KVCache, kmin, kmax,
                buffer0, output, gen_counts, eot, gamma: int, budget: int,
                latest_k: int, page: int = 128, mesh=None):
    """One Quest self-speculation round: a select+gather draft step, gamma-1
    round-buffer draft steps, then a full-attention verify; spec K/V live in
    (and are overwritten in) the target cache, so rollback is the usual
    length rewind."""
    from magicdec_tpu.engine import attention_impls as impls
    from magicdec_tpu.engine.retro import roundbuf_draft_attn
    from magicdec_tpu.engine.spec import _accept_and_update

    lenT0 = cache.lengths
    n_pages = max(budget // page - latest_k // page, 1)
    recent_rows = latest_k + gamma
    rec0 = jnp.maximum(lenT0 + 1 - latest_k, 0)
    L, B = cache.k.shape[0], cache.k.shape[1]
    HD = cache.k.shape[3]
    NS = n_pages * page
    rk = jnp.zeros((L, B, NS, HD), cache.k.dtype)
    rv = jnp.zeros((L, B, NS, HD), cache.v.dtype)
    rslot = jnp.full((L, B, NS), -1, jnp.int32)

    ck, cv, lens, tok = cache.k, cache.v, lenT0, buffer0
    impl = quest_select_gather_attn(config, lens, kmin, kmax, rec0,
                                    n_pages=n_pages, recent_rows=recent_rows,
                                    page=page, mesh=mesh)
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
    buffer = jnp.concatenate([buffer0] + drafted, axis=1)

    # verify with full attention, overwriting the draft-written slots
    impl = impls.target_attn(config, lenT0, mesh=mesh)
    logits, (ck, cv) = llama.forward(params, config, buffer, impl, (ck, cv))
    target_tokens = argmax_tokens(logits)

    accept, bonus, output, gen_counts, terminal, accepted = _accept_and_update(
        buffer, target_tokens, eot, gamma, output, gen_counts)
    new_cache = KVCache(ck, cv, lenT0 + accept)
    return (new_cache, bonus, output, gen_counts,
            dict(terminal=terminal, accepted_drafts=accepted,
                 accept_nums=accept))



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
def quest_generate_fused(params, config: ModelArgs, cache: KVCache, buffer0,
                         output, gen_counts, eot, gamma: int,
                         max_new_tokens: int, budget: int, latest_k: int,
                         page: int = 128, mesh=None):
    """Full Quest self-spec generation as one on-device while_loop: rounds of
    quest_round + incremental page-metadata refresh of the touched window."""
    max_len = cache.k.shape[2]
    kmin, kmax = make_page_meta(cache, page)

    def cond(state):
        cache = state[0]
        gen_counts, terminal = state[5], state[8]
        return (~terminal
                & (jnp.min(gen_counts) < max_new_tokens)
                & (jnp.max(cache.lengths) + gamma + 1 <= max_len))

    def body(state):
        (cache, kmin, kmax, buffer0, output, gen_counts, rounds, accepted,
         terminal) = state
        lenT0 = cache.lengths
        cache, buffer0, output, gen_counts, info = quest_round(
            params, config, cache, kmin, kmax, buffer0, output, gen_counts,
            eot, gamma, budget, latest_k, page, mesh=mesh)
        kmin, kmax = update_page_meta(cache, kmin, kmax, lenT0, gamma + 1,
                                      page)
        return (cache, kmin, kmax, buffer0, output, gen_counts, rounds + 1,
                accepted + info["accepted_drafts"],
                terminal | info["terminal"])

    state = (cache, kmin, kmax, buffer0, output, gen_counts, jnp.int32(0),
             jnp.int32(0), jnp.bool_(False))
    state = jax.lax.while_loop(cond, body, state)
    (cache, kmin, kmax, buffer0, output, gen_counts, rounds, accepted,
     terminal) = state
    B, cap = output.shape
    idx = jnp.minimum(gen_counts, cap - 1)
    output = output.at[jnp.arange(B), idx].set(buffer0[:, 0])
    return cache, output, gen_counts + 1, rounds, accepted
