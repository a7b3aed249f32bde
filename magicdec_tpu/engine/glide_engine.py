"""GliDe speculation engine: linear + tree drafting with a cross-attention
draft block, greedy and stochastic verification.

TPU-native re-design of the reference's self-contained GliDe driver
(tests/Quest/longspec_llama_glide.py): spec_generate (linear SD, L621),
tree_spec_generate (static-tree SD, L915) with greedy tree_verification
(L1129) and verify_stochastic (L1178, per-token rejection sampling with
residual renormalization). The triton tree attention (triton_tree_part_fwd
L309) becomes dense attention under a static ancestor mask — the tree shape
is a compile-time constant, so XLA specializes the mask for free.

Slot discipline: tree node j (ids assigned level by level) occupies cache
slot base+j in BOTH the glide's own cache and the target cache during a
round; the accepted root-to-leaf path is compacted to the front afterwards,
so rollback stays a pure length rewind. The reference compacts only the last
layer's KV (L1165-1173) because its draft cross-attends it; we compact every
layer (O(depth) traffic — negligible).

Losslessness scope: LINEAR glide verification runs the same flash target
attention as autoregressive decoding, so its stream is bit-equal to the
baseline. TREE verification necessarily attends under the ancestor mask
(scattered per-row valid sets the two-interval flash kernel cannot express),
so its target argmax can differ from the linear kernel's at numerical
near-ties: the emitted stream is the greedy stream of the tree-masked
target forward — self-consistent and exact on CPU test shapes, but on TPU
it may deviate from the flash AR stream at tie points (the reference's
triton tree attention deviates from its flash linear path identically).

The glide draft block is models/glide.py; train_glide() in train.py fits it
against a frozen target.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu import cache as cache_lib
from magicdec_tpu.cache import KVCache
from magicdec_tpu.engine import attention_impls as impls
from magicdec_tpu.engine.sampling import argmax_tokens
from magicdec_tpu.engine.spec import _accept_and_update
from magicdec_tpu.models import glide as glide_lib
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops.attention import (masked_attention_general,
                                        masked_attention_lse, merge_lse)
from magicdec_tpu.ops.rope import rope

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Linear GliDe speculation (reference spec_generate L621)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("config", "gamma", "max_new_tokens", "mesh",
                              "use_flash"),
    donate_argnames=("cache", "output", "gen_counts"))
def glide_generate_fused(params, glide_params, config: ModelArgs,
                         cache: KVCache, own_k, own_v, own_lengths, buffer0,
                         output, gen_counts, eot, gamma: int,
                         max_new_tokens: int, mesh=None,
                         use_flash: bool = False):
    """Linear glide SD, whole generation in one while_loop.

    own_k/own_v [B, Sd, Hkv*D]: the glide block's self-attention cache
    (primed by glide prefill); cross-attention reads cache.k[-1]/v[-1] of the
    VERIFIED prefix (bound lenT0)."""
    max_len = cache.k.shape[2]

    def cond(state):
        cache, gen_counts, terminal = state[0], state[6], state[9]
        return (~terminal
                & (jnp.min(gen_counts) < max_new_tokens)
                & (jnp.max(cache.lengths) + gamma + 1 <= max_len))

    def body(state):
        (cache, own_k, own_v, own_len, buffer0, output, gen_counts, rounds,
         accepted, terminal) = state
        lenT0 = cache.lengths

        # unrolled (a lax.scan would copy the glide cache across the boundary)
        ok, ov, ol, tok = own_k, own_v, own_len, buffer0
        drafted = []
        for i in range(gamma):
            pos = lenT0[:, None] + i
            logits, ok, ov = glide_lib.glide_forward(
                glide_params, params, config, tok, pos, ok, ov, ol,
                cache.k[-1], cache.v[-1],
                jnp.broadcast_to(lenT0[:, None], tok.shape),
                use_flash=use_flash)
            tok = argmax_tokens(logits[:, -1:])
            ol = ol + 1
            drafted.append(tok)
        # one extra forward appends the FINAL drafted token's K/V: accept can
        # reach gamma+1 and own_len advances by accept, so slot ol0+gamma must
        # hold drafted[gamma-1], not stale garbage the next round would attend
        _, ok, ov = glide_lib.glide_forward(
            glide_params, params, config, tok, lenT0[:, None] + gamma, ok, ov,
            ol, cache.k[-1], cache.v[-1],
            jnp.broadcast_to(lenT0[:, None], tok.shape), use_flash=use_flash)
        own_k2, own_v2 = ok, ov
        buffer = jnp.concatenate([buffer0] + drafted, axis=1)

        impl = impls.target_attn(config, lenT0, mesh=mesh)
        logits, (ck, cv) = llama.forward(params, config, buffer, impl,
                                         (cache.k, cache.v),
                                         fused=llama.fused_for_mesh(mesh))
        target_tokens = argmax_tokens(logits)
        accept, bonus, output, gen_counts, term, acc = _accept_and_update(
            buffer, target_tokens, eot, gamma, output, gen_counts)
        cache = KVCache(ck, cv, lenT0 + accept)
        return (cache, own_k2, own_v2, own_len + accept, bonus, output,
                gen_counts, rounds + 1, accepted + acc, terminal | term)

    state = (cache, own_k, own_v, own_lengths, buffer0, output, gen_counts,
             jnp.int32(0), jnp.int32(0), jnp.bool_(False))
    state = jax.lax.while_loop(cond, body, state)
    (cache, own_k, own_v, own_len, buffer0, output, gen_counts, rounds,
     accepted, terminal) = state
    B, cap = output.shape
    idx = jnp.minimum(gen_counts, cap - 1)
    output = output.at[jnp.arange(B), idx].set(buffer0[:, 0])
    return (cache, own_k, own_v, own_len, output, gen_counts + 1, rounds,
            accepted)


# ---------------------------------------------------------------------------
# Static speculation trees
# ---------------------------------------------------------------------------

class SpecTree:
    """Static token tree (reference tree_shape). branching[d] = children per
    node at depth d. Node ids are assigned level by level; node 0 (root) is
    the round's input token."""

    def __init__(self, branching):
        self.branching = tuple(branching)
        parents = [-1]
        levels = [[0]]
        for b in self.branching:
            nxt = []
            for p in levels[-1]:
                for _ in range(b):
                    nxt.append(len(parents))
                    parents.append(p)
            levels.append(nxt)
        self.parents = np.asarray(parents, np.int32)
        self.n_nodes = len(parents)
        self.levels = [np.asarray(l, np.int32) for l in levels]
        self.depth = np.zeros(self.n_nodes, np.int32)
        for i in range(1, self.n_nodes):
            self.depth[i] = self.depth[self.parents[i]] + 1
        anc = np.eye(self.n_nodes, dtype=bool)   # ancestor-or-self
        for i in range(self.n_nodes):
            j = self.parents[i]
            while j != -1:
                anc[i, j] = True
                j = self.parents[j]
        self.ancestor = anc


def _tree_mask(anc_rows: jax.Array, base: jax.Array, n_nodes: int, S: int):
    """[B, T, S] mask: columns < base[b] (prefix) plus ancestor node slots
    base[b]+j for anc_rows[t, j]. anc_rows: [T, n_nodes] static bools."""
    B = base.shape[0]
    slot = jnp.arange(S, dtype=jnp.int32)
    rel = slot[None, :] - base[:, None]                      # [B, S]
    prefix = rel < 0
    in_tree = (rel >= 0) & (rel < n_nodes)
    relc = jnp.clip(rel, 0, n_nodes - 1)
    anc_cols = jax.vmap(lambda r: jnp.take(anc_rows, r, axis=1))(relc)
    return prefix[:, None, :] | (in_tree[:, None, :] & anc_cols)


def _tree_target_impl(config, lengths_before, positions, full_mask):
    """Target attention over prefix + ancestor-masked tree block (the tree's
    K/V are appended at slots lengths_before+node_id before attending)."""
    def impl(q, k, v, caches, l):
        ck, cv = caches
        B, T = q.shape[:2]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        ck = cache_lib.append_at_layer(ck, k, lengths_before, l)
        cv = cache_lib.append_at_layer(cv, v, lengths_before, l)
        Hkv, Dh = config.n_kv_head, config.head_dim
        S = ck.shape[2]
        ctx = masked_attention_general(q, ck[l].reshape(B, S, Hkv, Dh),
                                       cv[l].reshape(B, S, Hkv, Dh),
                                       full_mask)
        return ctx.reshape(B, T, -1), (ck, cv)

    return impl


def _tree_target_impl_flash(config, lengths_before, positions, anc, mesh):
    """Tree verify as [flash kernel over the prefix | dense attention over
    the N tree rows], LSE-merged (ops/attention.merge_lse) — replaces the
    dense [B, N, S] ancestor-masked attention the round-2 build used. The
    tree rows need no cache re-read: this layer's freshly-rotated k/v
    operands ARE the tree block. Counterpart of the reference's
    triton_tree_part_fwd prefix/branch merge
    (tests/Quest/longspec_llama_glide.py:309)."""
    anc_m = jnp.asarray(anc)

    def impl(q, k, v, caches, l):
        ck, cv = caches
        B, N = q.shape[:2]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        ck = cache_lib.append_at_layer(ck, k, lengths_before, l)
        cv = cache_lib.append_at_layer(cv, v, lengths_before, l)
        hi = jnp.broadcast_to(lengths_before[:, None], (B, N))
        ctx_p, m_p, l_p = impls.flash_stacked_lse(q, ck, cv, l, hi, mesh)
        tm = jnp.broadcast_to(anc_m[None], (B, N, N))
        ctx_t, m_t, l_t = masked_attention_lse(q, k, v, tm)
        ctx = merge_lse(ctx_p, m_p, l_p, ctx_t, m_t, l_t)
        return ctx.reshape(B, N, -1), (ck, cv)

    return impl


def _compact_path(arrays, base, path, keep_len):
    """arrays: per-layer-less [B, S, HD] (glide) or stacked [L, B, S, HD];
    move slots base+path[i] -> base+i for i < keep_len.

    The write is CONTIGUOUS [base, base+depth1) with NO keep mask: rows at
    i >= keep_len land on slots past the new length (base+keep_len), which
    are dead — the next round appends its tree nodes over exactly those
    slots before any attention can reach them (prefix reads are bounded by
    the new length).

    Two lowerings, each measured pathological for the other operand shape
    (B=8, S=33k, v5e, 20-round loops): the [B, S, HD] glide cache takes
    per-depth vmapped dynamic_slice reads + one vmapped
    dynamic_update_slice write (1.3 ms; a scattered .at[].set was 50 ms —
    a full-cache rewrite — and a take_along gather 4.9 ms); the stacked
    [L, B, S, HD] caches keep the batched gather + scatter (2.5 ms; the
    slice form vmapped over L regressed to 15.5 ms)."""
    B, depth1 = path.shape
    src = base[:, None] + path

    def per4(c_l):                                           # [B, S, HD] of L
        gathered = jax.vmap(lambda a, i: a[i])(c_l, src)
        dst = base[:, None] + jnp.arange(depth1, dtype=jnp.int32)[None, :]
        return jax.vmap(lambda a, i, g: a.at[i].set(g, mode="drop"))(
            c_l, dst, gathered)

    def per3(c_l):                                           # [B, S, HD]
        HD = c_l.shape[-1]
        rows = [jax.vmap(
            lambda a, s: jax.lax.dynamic_slice(a, (s, 0), (1, HD)))(
                c_l, base + path[:, i]) for i in range(depth1)]
        gathered = jnp.concatenate(rows, axis=1)             # [B, depth1, HD]

        def upd(c, n, l):
            return jax.lax.dynamic_update_slice(c, n, (l, 0))
        return jax.vmap(upd)(c_l, gathered, base)

    if arrays[0].ndim == 4:
        return tuple(jax.vmap(per4)(a) for a in arrays)
    return tuple(per3(a) for a in arrays)


def _write_leaf_level_kv(params, glide_params, config, tree: SpecTree,
                         node_tokens, own_k, own_v, own_len, lenT0, cache,
                         use_flash: bool = False):
    """Append the leaf level's K/V to the glide cache (logits discarded).

    The level-by-level draft loop only forwards levels 0..depth-1 (leaves
    never spawn children), yet a fully-accepted path ends AT a leaf and
    _compact_path moves that slot into the live prefix — without this write
    the next round's draft would attend a never-written slot."""
    B = node_tokens.shape[0]
    d = len(tree.branching)
    lvl = tree.levels[d]
    toks = node_tokens[:, jnp.asarray(lvl)]
    Sd = own_k.shape[1]
    if use_flash:
        kw = dict(use_flash=True, tree=(tree.ancestor[lvl], own_len))
    else:
        kw = dict(attn_mask=_tree_mask(jnp.asarray(tree.ancestor[lvl]),
                                       own_len, tree.n_nodes, Sd))
    _, own_k, own_v = glide_lib.glide_forward(
        glide_params, params, config, toks,
        jnp.broadcast_to(lenT0[:, None] + d, toks.shape), own_k, own_v,
        own_len + int(lvl[0]), cache.k[-1], cache.v[-1],
        jnp.broadcast_to(lenT0[:, None], toks.shape), **kw)
    return own_k, own_v


def glide_tree_round(params, glide_params, config: ModelArgs, tree: SpecTree,
                     cache: KVCache, own_k, own_v, own_len, root_tok, eot,
                     use_flash: bool = False, mesh=None):
    """One greedy tree-speculation round. Returns (cache, own_k, own_v,
    new_own_len, emitted [B, depth+1], emit_len [B], bonus [B,1], terminal).

    emitted[:, 0] is the root (already-verified input token); emit_len counts
    root + accepted draft tokens; bonus is the target's continuation after
    the accepted path and seeds the next round.
    """
    B = root_tok.shape[0]
    N = tree.n_nodes
    lenT0 = cache.lengths
    anc = jnp.asarray(tree.ancestor)
    depth_arr = jnp.asarray(tree.depth)

    # ---- draft the tree level by level (glide forwards) --------------------
    node_tokens = jnp.zeros((B, N), jnp.int32).at[:, 0].set(root_tok[:, 0])
    Sd = own_k.shape[1]
    for d, b in enumerate(tree.branching):
        lvl = tree.levels[d]
        n_lvl = len(lvl)
        toks = node_tokens[:, jnp.asarray(lvl)]
        pos = jnp.broadcast_to(lenT0[:, None] + d, (B, n_lvl))
        if use_flash:
            kw = dict(use_flash=True, tree=(tree.ancestor[lvl], own_len))
        else:
            kw = dict(attn_mask=_tree_mask(jnp.asarray(tree.ancestor[lvl]),
                                           own_len, N, Sd))
        logits, own_k, own_v = glide_lib.glide_forward(
            glide_params, params, config, toks, pos, own_k, own_v,
            own_len + int(lvl[0]), cache.k[-1], cache.v[-1],
            jnp.broadcast_to(lenT0[:, None], (B, n_lvl)), **kw)
        top = jax.lax.top_k(logits, b)[1].astype(jnp.int32)  # [B, n_lvl, b]
        child_ids = jnp.asarray(tree.levels[d + 1]).reshape(n_lvl, b)
        node_tokens = node_tokens.at[:, child_ids].set(top)
    own_k, own_v = _write_leaf_level_kv(params, glide_params, config, tree,
                                        node_tokens, own_k, own_v, own_len,
                                        lenT0, cache, use_flash=use_flash)

    # ---- verify all nodes in one target forward ----------------------------
    S = cache.k.shape[2]
    positions = lenT0[:, None] + depth_arr[None, :]
    if use_flash:
        impl = _tree_target_impl_flash(config, lenT0, positions,
                                       tree.ancestor, mesh)
    else:
        impl = _tree_target_impl(config, lenT0, positions,
                                 _tree_mask(anc, lenT0, N, S))
    logits, (ck, cv) = llama.forward(params, config, node_tokens, impl,
                                     (cache.k, cache.v),
                                     fused=llama.fused_for_mesh(mesh))
    target_tokens = argmax_tokens(logits)                    # [B, N]

    # ---- greedy root-to-leaf walk ------------------------------------------
    cur = jnp.zeros((B,), jnp.int32)
    emit_len = jnp.ones((B,), jnp.int32)
    path = jnp.zeros((B, len(tree.branching) + 1), jnp.int32)
    alive = jnp.ones((B,), bool)
    for d, b in enumerate(tree.branching):
        tgt = jnp.take_along_axis(target_tokens, cur[:, None], 1)[:, 0]
        lvl = jnp.asarray(tree.levels[d])
        child_tbl = jnp.asarray(tree.levels[d + 1]).reshape(len(tree.levels[d]), b)
        lvl_idx = jnp.searchsorted(lvl, cur)
        childs = child_tbl[lvl_idx]                          # [B, b]
        ctoks = jnp.take_along_axis(node_tokens, childs, 1)
        hit = ctoks == tgt[:, None]
        step_ok = jnp.any(hit, axis=1) & alive & ~_is_eot_tok(tgt, eot)
        pick = jnp.argmax(hit, axis=1)
        nxt = jnp.take_along_axis(childs, pick[:, None], 1)[:, 0]
        cur = jnp.where(step_ok, nxt, cur)
        path = path.at[:, d + 1].set(jnp.where(step_ok, nxt, 0))
        emit_len = emit_len + step_ok.astype(jnp.int32)
        alive = step_ok

    bonus = jnp.take_along_axis(target_tokens, cur[:, None], 1)
    emitted = jnp.take_along_axis(node_tokens, path, 1)      # [B, depth+1]

    # ---- compact accepted path K/V to the front (target + glide caches) ----
    ck, cv = _compact_path((ck, cv), lenT0, path, emit_len)
    own_k, own_v = _compact_path((own_k, own_v), own_len, path, emit_len)
    new_cache = KVCache(ck, cv, lenT0 + emit_len)
    terminal = jnp.any(_is_eot_tok(bonus[:, 0], eot))
    return (new_cache, own_k, own_v, own_len + emit_len, emitted, emit_len,
            bonus, terminal)


def _is_eot_tok(tok, eot):
    return (tok == eot[0]) | (tok == eot[1])


@functools.partial(
    jax.jit, static_argnames=("config", "tree", "max_new_tokens",
                              "use_flash", "mesh"),
    donate_argnames=("cache", "output", "gen_counts"))
def glide_tree_generate_fused(params, glide_params, config: ModelArgs,
                              tree: SpecTree, cache: KVCache, own_k, own_v,
                              own_len, root0, output, gen_counts, eot,
                              max_new_tokens: int, use_flash: bool = False,
                              mesh=None):
    """Greedy tree speculation, whole generation in one while_loop — the
    round-2 build dispatched each tree round from the host (~4 ms tunnel
    latency per round); here the host syncs once per generation, matching
    every other engine's fused-loop discipline."""
    max_len = cache.k.shape[2]
    N = tree.n_nodes
    depth1 = len(tree.branching) + 1

    def cond(state):
        cache, gen_counts, terminal = state[0], state[6], state[9]
        return (~terminal
                & (jnp.min(gen_counts) < max_new_tokens)
                & (jnp.max(cache.lengths) + N <= max_len))

    def body(state):
        (cache, own_k, own_v, own_len, root, output, gen_counts, rounds,
         accepted, terminal) = state
        (cache, own_k, own_v, own_len, emitted, emit_len, bonus,
         term) = glide_tree_round(params, glide_params, config, tree, cache,
                                  own_k, own_v, own_len, root, eot,
                                  use_flash=use_flash, mesh=mesh)
        B, O = output.shape
        pos = gen_counts[:, None] + jnp.arange(depth1, dtype=jnp.int32)[None, :]
        keep = jnp.arange(depth1, dtype=jnp.int32)[None, :] < emit_len[:, None]
        pos = jnp.where(keep, jnp.minimum(pos, O - 1), O)    # OOB -> dropped
        output = output.at[jnp.arange(B)[:, None], pos].set(emitted,
                                                            mode="drop")
        return (cache, own_k, own_v, own_len, bonus, output,
                gen_counts + emit_len, rounds + 1,
                accepted + jnp.sum(emit_len - 1), terminal | term)

    state = (cache, own_k, own_v, own_len, root0, output, gen_counts,
             jnp.int32(0), jnp.int32(0), jnp.bool_(False))
    state = jax.lax.while_loop(cond, body, state)
    (cache, own_k, own_v, own_len, root0, output, gen_counts, rounds,
     accepted, terminal) = state
    B, cap = output.shape
    idx = jnp.minimum(gen_counts, cap - 1)
    output = output.at[jnp.arange(B), idx].set(root0[:, 0])
    return (cache, own_k, own_v, own_len, output, gen_counts + 1, rounds,
            accepted)


# ---------------------------------------------------------------------------
# Stochastic TREE verification (reference verify_stochastic L1178-1244:
# per-node multi-round rejection sampling with residual renormalization)
# ---------------------------------------------------------------------------

def stochastic_tree_walk(key, tree: SpecTree, node_tokens, target_probs,
                         draft_probs):
    """SpecInfer-style stochastic root-to-leaf walk.

    node_tokens [B, N]; target_probs/draft_probs [B, N, V]: the target's and
    the draft's next-token distributions AT each node (draft_probs[n] is the
    distribution the children of n were SAMPLED from). At each node the
    children are tried in order: child c is accepted with prob
    min(1, p(c)/q(c)); after each rejection the residual target distribution
    becomes norm(max(p - q, 0)). If every child is rejected the bonus is
    sampled from the final residual; if a leaf is reached the bonus is
    sampled from the target distribution at the leaf. This preserves the
    target marginal exactly (the speculative-sampling guarantee).

    Returns (path [B, depth+1] node ids, emit_len [B], bonus [B, 1]).
    """
    B, N, V = target_probs.shape
    cur = jnp.zeros((B,), jnp.int32)
    emit_len = jnp.ones((B,), jnp.int32)
    path = jnp.zeros((B, len(tree.branching) + 1), jnp.int32)
    alive = jnp.ones((B,), bool)
    # residual distribution carried for the bonus sample of rejected rows
    p_resid = target_probs[:, 0]
    for d, b in enumerate(tree.branching):
        p = jnp.take_along_axis(target_probs, cur[:, None, None], 1)[:, 0]
        q = jnp.take_along_axis(draft_probs, cur[:, None, None], 1)[:, 0]
        lvl = jnp.asarray(tree.levels[d])
        child_tbl = jnp.asarray(tree.levels[d + 1]).reshape(-1, b)
        childs = child_tbl[jnp.searchsorted(lvl, cur)]       # [B, b]
        ctoks = jnp.take_along_axis(node_tokens, childs, 1)  # [B, b]
        accepted = jnp.zeros((B,), bool)
        pick = jnp.zeros((B,), jnp.int32)
        for i in range(b):
            key, sub = jax.random.split(key)
            tok_i = ctoks[:, i]
            p_i = jnp.take_along_axis(p, tok_i[:, None], 1)[:, 0]
            q_i = jnp.take_along_axis(q, tok_i[:, None], 1)[:, 0]
            u = jax.random.uniform(sub, (B,))
            acc_i = (u < jnp.minimum(p_i / jnp.maximum(q_i, 1e-20), 1.0)
                     ) & ~accepted & alive
            pick = jnp.where(acc_i, i, pick)
            # rejected rows move to the residual distribution
            move = ~accepted & alive & ~acc_i
            p_new = jnp.maximum(p - q, 0.0)
            p_new = p_new / jnp.maximum(jnp.sum(p_new, -1, keepdims=True),
                                        1e-20)
            p = jnp.where(move[:, None], p_new, p)
            accepted = accepted | acc_i
        nxt = jnp.take_along_axis(childs, pick[:, None], 1)[:, 0]
        step_ok = accepted
        cur = jnp.where(step_ok, nxt, cur)
        path = path.at[:, d + 1].set(jnp.where(step_ok, nxt, 0))
        emit_len = emit_len + step_ok.astype(jnp.int32)
        # rows that reject every child at this level stop; their bonus comes
        # from the residual p at the moment of rejection
        p_resid = jnp.where((alive & ~step_ok)[:, None], p, p_resid)
        alive = alive & step_ok
    # rows that accepted a full path take the bonus from the leaf's target
    leaf_p = jnp.take_along_axis(target_probs, cur[:, None, None], 1)[:, 0]
    p_bonus = jnp.where(alive[:, None], leaf_p, p_resid)
    key, sub = jax.random.split(key)
    bonus = jax.random.categorical(
        sub, jnp.log(jnp.maximum(p_bonus, 1e-30)))[:, None].astype(jnp.int32)
    return path, emit_len, bonus


def glide_tree_round_stochastic(params, glide_params, config: ModelArgs,
                                tree: SpecTree, cache: KVCache, own_k, own_v,
                                own_len, root_tok, eot, key,
                                temperature: float = 1.0):
    """Stochastic variant of glide_tree_round: children are SAMPLED from the
    glide distribution (i.i.d. per child, as SpecInfer) and verified by
    stochastic_tree_walk, so emitted tokens follow the target distribution
    exactly rather than the greedy argmax chain."""
    B = root_tok.shape[0]
    N = tree.n_nodes
    V = config.vocab_size
    lenT0 = cache.lengths
    anc = jnp.asarray(tree.ancestor)
    depth_arr = jnp.asarray(tree.depth)

    node_tokens = jnp.zeros((B, N), jnp.int32).at[:, 0].set(root_tok[:, 0])
    draft_probs = jnp.full((B, N, V), 1.0 / V, jnp.float32)
    Sd = own_k.shape[1]
    for d, b in enumerate(tree.branching):
        lvl = tree.levels[d]
        n_lvl = len(lvl)
        toks = node_tokens[:, jnp.asarray(lvl)]
        pos = jnp.broadcast_to(lenT0[:, None] + d, (B, n_lvl))
        mask = _tree_mask(jnp.asarray(tree.ancestor[lvl]), own_len, N, Sd)
        logits, own_k, own_v = glide_lib.glide_forward(
            glide_params, params, config, toks, pos, own_k, own_v,
            own_len + int(lvl[0]), cache.k[-1], cache.v[-1],
            jnp.broadcast_to(lenT0[:, None], (B, n_lvl)), attn_mask=mask)
        logits = logits.astype(jnp.float32) / max(temperature, 1e-5)
        probs = jax.nn.softmax(logits, -1)                   # [B, n_lvl, V]
        draft_probs = draft_probs.at[:, jnp.asarray(lvl)].set(probs)
        key, sub = jax.random.split(key)
        draws = jax.random.categorical(sub, logits[:, :, None, :].repeat(b, 2))
        child_ids = jnp.asarray(tree.levels[d + 1]).reshape(n_lvl, b)
        node_tokens = node_tokens.at[:, child_ids].set(draws.astype(jnp.int32))
    own_k, own_v = _write_leaf_level_kv(params, glide_params, config, tree,
                                        node_tokens, own_k, own_v, own_len,
                                        lenT0, cache)

    S = cache.k.shape[2]
    positions = lenT0[:, None] + depth_arr[None, :]
    full_mask = _tree_mask(anc, lenT0, N, S)
    logits, (ck, cv) = llama.forward(
        params, config, node_tokens,
        _tree_target_impl(config, lenT0, positions, full_mask),
        (cache.k, cache.v))
    target_probs = jax.nn.softmax(
        logits.astype(jnp.float32) / max(temperature, 1e-5), -1)

    key, sub = jax.random.split(key)
    path, emit_len, bonus = stochastic_tree_walk(sub, tree, node_tokens,
                                                 target_probs, draft_probs)
    emitted = jnp.take_along_axis(node_tokens, path, 1)
    ck, cv = _compact_path((ck, cv), lenT0, path, emit_len)
    own_k, own_v = _compact_path((own_k, own_v), own_len, path, emit_len)
    new_cache = KVCache(ck, cv, lenT0 + emit_len)
    terminal = jnp.any(_is_eot_tok(bonus[:, 0], eot))
    return (new_cache, own_k, own_v, own_len + emit_len, emitted, emit_len,
            bonus, terminal)


# ---------------------------------------------------------------------------
# Engine wrapper
# ---------------------------------------------------------------------------

class GlideEngine:
    """Target Engine + glide draft block; linear or tree speculation."""

    def __init__(self, target, glide_params, own_capacity: int | None = None):
        self.target = target
        self.glide_params = glide_params
        c = target.config
        cap = own_capacity or target.max_len
        B = target.batch_size
        self.own_k = jnp.zeros((B, cap, c.n_kv_head * c.head_dim),
                               target.kv_dtype)
        self.own_v = jnp.zeros_like(self.own_k)
        self.own_len = jnp.zeros((B,), jnp.int32)

    def encode(self, input_ids):
        """Target chunked prefill, then glide prefill over the same prompt
        (cross-attention causally bounded per position)."""
        input_ids = jnp.asarray(input_ids, jnp.int32)
        buffer0 = self.target.encode(input_ids)
        B, P = input_ids.shape
        chunk = self.target.prefill_chunk
        c = self.target.config
        for i in range(P // chunk):
            toks = input_ids[:, i * chunk:(i + 1) * chunk]
            pos = (self.own_len[:, None]
                   + jnp.arange(chunk, dtype=jnp.int32)[None, :])
            _, self.own_k, self.own_v = glide_lib.glide_forward(
                self.glide_params, self.target.params, c, toks, pos,
                self.own_k, self.own_v, self.own_len,
                self.target.cache.k[-1], self.target.cache.v[-1], pos + 1)
            self.own_len = self.own_len + chunk
        return buffer0

    def generate(self, input_ids, max_new_tokens: int, *, gamma: int = 4,
                 tree: SpecTree | None = None, eot_ids=()):
        import time as _time
        from magicdec_tpu.engine.spec import SpecStats, _eot_array

        eot = _eot_array(eot_ids)
        B = self.target.batch_size
        buffer0 = self.encode(input_ids)
        stats = SpecStats()
        jax.block_until_ready(buffer0)
        mesh = self.target.mesh
        # flash paths are single-device pallas calls (the glide block is not
        # shard_mapped yet); dense GSPMD remains the multi-chip path
        use_flash = (jax.default_backend() == "tpu"
                     and (mesh is None or mesh.devices.size == 1))
        t0 = _time.perf_counter()
        if tree is None:
            cap = max_new_tokens + gamma + 2
            output = jnp.zeros((B, cap), jnp.int32)
            gen_counts = jnp.zeros((B,), jnp.int32)
            (self.target.cache, self.own_k, self.own_v, self.own_len, output,
             gen_counts, rounds, accepted) = glide_generate_fused(
                self.target.params, self.glide_params, self.target.config,
                self.target.cache, self.own_k, self.own_v, self.own_len,
                buffer0, output, gen_counts, eot, gamma, max_new_tokens,
                mesh=mesh, use_flash=use_flash)
            stats.total_drafted = int(rounds) * B * gamma
        else:
            depth1 = len(tree.branching) + 1
            output = jnp.zeros((B, max_new_tokens + depth1 + 1), jnp.int32)
            gen_counts = jnp.zeros((B,), jnp.int32)
            (self.target.cache, self.own_k, self.own_v, self.own_len, output,
             gen_counts, rounds, accepted) = glide_tree_generate_fused(
                self.target.params, self.glide_params, self.target.config,
                tree, self.target.cache, self.own_k, self.own_v, self.own_len,
                buffer0, output, gen_counts, eot, max_new_tokens,
                use_flash=use_flash, mesh=mesh)
            stats.total_drafted = int(rounds) * B * len(tree.branching)
        jax.block_until_ready(output)
        stats.wall_time_s = _time.perf_counter() - t0
        stats.rounds = int(rounds)
        stats.total_accepted_drafts = int(accepted)
        stats.generated_tokens = int(jnp.sum(gen_counts))
        return output, gen_counts, stats


# ---------------------------------------------------------------------------
# Stochastic (rejection-sampling) verification — reference verify_stochastic
# ---------------------------------------------------------------------------

def stochastic_verify(key, draft_probs, target_probs, draft_tokens):
    """Per-token speculative rejection sampling (reference verify_stochastic
    L1178 restricted to a linear chain), vectorized over the batch.

    draft_probs/target_probs [B, gamma, V]; draft_tokens [B, gamma].
    Token i is accepted with prob min(1, p_t/p_d); each row's first rejection
    is replaced by a sample from norm(max(p_t - p_d, 0)). Rows accepting all
    gamma take their bonus from the target's next-position distribution (the
    caller's responsibility). Returns (accept_len [B], replacement [B],
    has_replacement [B])."""
    B, G, V = draft_probs.shape
    pt = jnp.take_along_axis(target_probs, draft_tokens[..., None], -1)[..., 0]
    pd = jnp.take_along_axis(draft_probs, draft_tokens[..., None], -1)[..., 0]
    u = jax.random.uniform(key, (B, G))
    ok = u < jnp.minimum(pt / jnp.maximum(pd, 1e-20), 1.0)
    accept_len = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)
    rej = jnp.minimum(accept_len, G - 1)                     # first rejected
    has_rej = accept_len < G
    t_at = jnp.take_along_axis(target_probs, rej[:, None, None], 1)[:, 0]
    d_at = jnp.take_along_axis(draft_probs, rej[:, None, None], 1)[:, 0]
    resid = jnp.maximum(t_at - d_at, 0.0)
    resid = resid / jnp.maximum(jnp.sum(resid, -1, keepdims=True), 1e-20)
    repl = jax.random.categorical(jax.random.fold_in(key, 1),
                                  jnp.log(jnp.maximum(resid, 1e-30)))
    return accept_len, repl.astype(jnp.int32), has_rej
