"""Speculative decoding control loops, fused into single XLA programs.

The reference drives draft/verify/accept from Python with one kernel launch and
one flashinfer plan() per draft token (tests/SnapKV/selfspec_benchmark.py:150-
259). On TPU the whole round — gamma draft steps (lax.scan), verify, vectorized
cumprod acceptance, length rollback, output scatter, bonus pick — is ONE jitted
program per round; the host syncs once per round on the terminal flag.

Acceptance semantics match the reference exactly (selfspec_benchmark.py:177-246):
  * a drafted token equal to the target argmax AND not EOS is accepted;
  * accept_nums = 1 + length of the accepted cumprod prefix (the +1 emits the
    round's input token, which was the previous round's bonus);
  * emitted tokens are the BUFFER tokens [0..accept), the bonus
    target_tokens[accept-1] seeds the next round;
  * rollback rewinds cache lengths only; garbage tails are masked at attention.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from magicdec_tpu import cache as cache_lib
from magicdec_tpu.cache import DraftKVCache, KVCache
from magicdec_tpu.engine import attention_impls as impls
from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.sampling import argmax_tokens
from magicdec_tpu.models import llama


def _is_eot(tokens: jax.Array, eot: jax.Array) -> jax.Array:
    return (tokens == eot[0]) | (tokens == eot[1])


def _accept_and_update(buffer, target_tokens, eot, gamma,
                       output, gen_counts):
    """Vectorized acceptance, output scatter, bonus/terminal computation."""
    draft_tokens = buffer[:, 1:]
    flag = (target_tokens[:, :gamma] == draft_tokens) & ~_is_eot(draft_tokens, eot)
    cum = jnp.cumprod(flag.astype(jnp.int32), axis=1)
    accept = 1 + jnp.sum(cum, axis=1)                      # [B] in [1, gamma+1]
    bonus = jnp.take_along_axis(target_tokens, accept[:, None] - 1, axis=1)

    B, O = output.shape
    pos = gen_counts[:, None] + jnp.arange(gamma + 1, dtype=jnp.int32)[None, :]
    keep = jnp.arange(gamma + 1, dtype=jnp.int32)[None, :] < accept[:, None]
    pos = jnp.where(keep, jnp.minimum(pos, O - 1), O)      # OOB -> dropped
    output = output.at[jnp.arange(B)[:, None], pos].set(buffer, mode="drop")
    gen_counts = gen_counts + accept

    terminal = (jnp.any(cum.astype(bool) & _is_eot(draft_tokens, eot))
                | jnp.any(_is_eot(bonus, eot)))
    accepted_drafts = jnp.sum(cum)
    return accept, bonus, output, gen_counts, terminal, accepted_drafts


@functools.partial(
    jax.jit, static_argnames=("config", "gamma", "mesh"),
    donate_argnames=("cache", "draft", "output", "gen_counts"))
def snapkv_round(params, config, cache: KVCache, draft: DraftKVCache,
                 buffer0, output, gen_counts, eot, gamma: int, mesh=None):
    """One SnapKV self-speculation round (draft shares target weights)."""
    lenT0, lenD0 = cache.lengths, draft.lengths

    # unrolled draft loop: a lax.scan would copy the draft cache across the
    # scan boundary (~2x cache size per round); straight-line SSA aliases
    # in place, and gamma is small and static
    dk, dv, lens, tok = draft.k, draft.v, lenD0, buffer0
    drafted = []
    for i in range(gamma):
        impl = impls.snapkv_draft_attn(config, lenT0 + i, lens, mesh=mesh)
        logits, (dk, dv) = llama.forward(params, config, tok, impl, (dk, dv),
                                         last_only=True,
                                         fused=llama.fused_for_mesh(mesh))
        tok = argmax_tokens(logits)
        lens = lens + 1
        drafted.append(tok)
    buffer = jnp.concatenate([buffer0] + drafted, axis=1)  # [B, g+1]

    # verify: target attention, dual-append at the ROUND-START draft offset
    # (overwrites the spec-written entries with target-quality k/v).
    impl = impls.verify_dual_attn(config, lenT0, lenD0, mesh=mesh)
    logits, (ck, cv, dk, dv) = llama.forward(
        params, config, buffer, impl, (cache.k, cache.v, dk, dv),
        fused=llama.fused_for_mesh(mesh))
    target_tokens = argmax_tokens(logits)

    accept, bonus, output, gen_counts, terminal, accepted = _accept_and_update(
        buffer, target_tokens, eot, gamma, output, gen_counts)

    new_cache = KVCache(ck, cv, lenT0 + accept)
    new_draft = DraftKVCache(dk, dv, lenD0 + accept, draft.evicted)
    return (new_cache, new_draft, bonus, output, gen_counts,
            dict(terminal=terminal, accepted_drafts=accepted, accept_nums=accept))


@functools.partial(
    jax.jit, static_argnames=("config", "gamma", "budget", "sink", "mesh"),
    donate_argnames=("cache", "draft", "output", "gen_counts"))
def streaming_round(params, config, cache: KVCache, draft: DraftKVCache,
                    buffer0, last_acc_tok, stale, output, gen_counts, eot,
                    gamma: int, budget: int, sink: int, mesh=None):
    """One StreamingLLM self-speculation round.

    Invariant at entry: draft.lengths == slot of `last_acc_tok` (the newest
    accepted token, re-fed together with the bonus so the first draft step
    always has dec_len 2, uniformizing the reference's ragged double-advance
    path, tests/StreamingLLM/selfspec_benchmark.py:216-224).

    `stale` [B] bool: True iff last_acc_tok's slot was never written (only
    after a fully-accepted round — the final drafted token is never appended
    by the draft loop). The re-feed writes that slot's K/V ONLY then: XLA's
    matmul tilings differ between prefill (T=128) and decode shapes, so
    re-computing K/V for a token whose slot holds prefill-written values can
    change low bits and break the draft==target bit-exactness invariant
    (observed: llama-3.2-1b dims, first round after encode).
    """
    lenT0, lenD0 = cache.lengths, draft.lengths
    B = buffer0.shape[0]

    def step(dk, dv, lens, tokens, write_mask=None):
        impl = impls.streaming_draft_attn(config, lens, draft.evicted, budget,
                                          sink, mesh=mesh,
                                          write_mask=write_mask)
        logits, (dk, dv) = llama.forward(params, config, tokens, impl,
                                         (dk, dv), last_only=True,
                                         fused=llama.fused_for_mesh(mesh))
        return dk, dv, lens + tokens.shape[1], argmax_tokens(logits)

    # step 1: re-feed last accepted + current token; remaining steps unrolled
    # (a lax.scan would copy the draft cache across the scan boundary)
    mask0 = jnp.concatenate([stale[:, None],
                             jnp.ones((B, 1), bool)], axis=1)
    dk, dv, lens, nxt = step(draft.k, draft.v, lenD0,
                             jnp.concatenate([last_acc_tok, buffer0], axis=1),
                             write_mask=mask0)
    drafted = [nxt]
    for _ in range(gamma - 1):
        dk, dv, lens, nxt = step(dk, dv, lens, nxt)
        drafted.append(nxt)
    buffer = jnp.concatenate([buffer0] + drafted, axis=1)  # [B, gamma+1]

    # verify: target-only (StreamingLLM verify never writes the draft cache,
    # Engine/StreamingLLM/model.py:209)
    impl = impls.target_attn(config, lenT0, mesh=mesh)
    logits, (ck, cv) = llama.forward(params, config, buffer, impl,
                                     (cache.k, cache.v),
                                     fused=llama.fused_for_mesh(mesh))
    target_tokens = argmax_tokens(logits)

    accept, bonus, output, gen_counts, terminal, accepted = _accept_and_update(
        buffer, target_tokens, eot, gamma, output, gen_counts)

    new_cache = KVCache(ck, cv, lenT0 + accept)
    # slot(buffer[a-1]) = lenD0 + a  (last_acc@lenD0, buffer[j]@lenD0+1+j)
    new_draft = DraftKVCache(dk, dv, lenD0 + accept, draft.evicted)
    new_last_acc = jnp.take_along_axis(buffer, accept[:, None] - 1, axis=1)
    # the draft loop wrote slots lenD0..lenD0+gamma; slot lenD0+gamma+1 (the
    # final drafted token, reached only on full acceptance) is unwritten
    new_stale = accept == gamma + 1
    return (new_cache, new_draft, bonus, new_last_acc, new_stale, output,
            gen_counts,
            dict(terminal=terminal, accepted_drafts=accepted, accept_nums=accept))


# ---------------------------------------------------------------------------
# Fused whole-generation programs (one device dispatch per generation)
# ---------------------------------------------------------------------------
# The reference pays one CUDA-graph launch + flashinfer plan() per draft token
# plus a host sync per round (tests/SnapKV/selfspec_benchmark.py:150-259). On
# TPU the entire generation — every round, including acceptance, rollback and
# termination — runs inside a single jitted lax.while_loop: the host blocks
# exactly once per batch, so tunnel/dispatch latency is off the critical path.


@functools.partial(jax.jit,
                   static_argnames=("config", "max_new_tokens",
                                    "temperature", "top_p", "mesh"),
                   donate_argnames=("cache",))
def autoregressive_generate_fused(params, config, cache: KVCache, tok, eot,
                                  max_new_tokens: int,
                                  temperature: float = 0.0,
                                  top_p: float = 1.0, key=None, mesh=None):
    """Baseline decode: while-loop of 1-token steps, EOS-checked on device.

    temperature 0.0 = greedy argmax (the reference's benchmark mode); > 0
    samples with nucleus filtering (reference Engine/utils.py sample()).
    Returns (output [B, max_new_tokens], gen_counts [B], new_cache).
    """
    from magicdec_tpu.engine.sampling import sample

    B = tok.shape[0]
    output = jnp.zeros((B, max_new_tokens), jnp.int32)
    output = output.at[:, 0].set(tok[:, 0])
    if key is None:
        key = jax.random.PRNGKey(0)

    def cond(s):
        step = s[0]
        alive = s[4]
        return (step < max_new_tokens) & jnp.any(alive)

    def body(s):
        step, tok, cache, output, alive, counts, key = s
        impl = impls.target_attn(config, cache.lengths, mesh=mesh)
        logits, (ck, cv) = llama.forward(params, config, tok, impl,
                                         (cache.k, cache.v),
                                         fused=llama.fused_for_mesh(mesh))
        if temperature > 0.0:
            key, sub = jax.random.split(key)
            nxt = sample(logits, sub, temperature, top_p)
        else:
            nxt = argmax_tokens(logits)
        cache = KVCache(ck, cv, cache.lengths + jnp.where(alive, 1, 0))
        output = output.at[:, jnp.minimum(step, max_new_tokens - 1)].set(
            jnp.where(alive, nxt[:, 0], 0))
        counts = counts + alive.astype(jnp.int32)
        alive = alive & ~_is_eot(nxt[:, 0], eot)
        return step + 1, nxt, cache, output, alive, counts, key

    alive = ~_is_eot(tok[:, 0], eot)
    counts = jnp.ones((B,), jnp.int32)     # output[:, 0] is always emitted
    step, tok, cache, output, alive, counts, key = jax.lax.while_loop(
        cond, body, (jnp.int32(1), tok, cache, output, alive, counts, key))
    return output, counts, cache


def _round_body(round_fn):
    """Wrap a *_round function as a while_loop body over the generation state."""
    def body(state):
        (cache, draft, buffer0, extra, output, gen_counts, rounds, accepted,
         terminal) = state
        out = round_fn(cache, draft, buffer0, extra, output, gen_counts)
        (cache, draft, buffer0, extra, output, gen_counts, info) = out
        return (cache, draft, buffer0, extra, output, gen_counts,
                rounds + 1, accepted + info["accepted_drafts"],
                terminal | info["terminal"])
    return body


def _spec_generate_fused(params, config, cache, draft, buffer0, extra, output,
                         gen_counts, eot, gamma, max_new_tokens, round_fn):
    max_len = cache.k.shape[2]

    def cond(state):
        cache, draft, b0, extra, output, gen_counts, rounds, acc, term = state
        return (~term
                & (jnp.min(gen_counts) < max_new_tokens)
                & (jnp.max(cache.lengths) + gamma + 1 <= max_len))

    state = (cache, draft, buffer0, extra, output, gen_counts,
             jnp.int32(0), jnp.int32(0), jnp.bool_(False))
    state = jax.lax.while_loop(cond, _round_body(round_fn), state)
    (cache, draft, buffer0, extra, output, gen_counts, rounds, accepted,
     terminal) = state
    # final bonus token
    B, cap = output.shape
    idx = jnp.minimum(gen_counts, cap - 1)
    output = output.at[jnp.arange(B), idx].set(buffer0[:, 0])
    gen_counts = gen_counts + 1
    return cache, draft, output, gen_counts, rounds, accepted


@functools.partial(
    jax.jit, static_argnames=("config", "gamma", "max_new_tokens", "mesh"),
    donate_argnames=("cache", "draft", "output", "gen_counts"))
def snapkv_generate_fused(params, config, cache: KVCache, draft: DraftKVCache,
                          buffer0, output, gen_counts, eot, gamma: int,
                          max_new_tokens: int, mesh=None):
    def round_fn(cache, draft, b0, extra, output, gen_counts):
        cache, draft, b0, output, gen_counts, info = snapkv_round(
            params, config, cache, draft, b0, output, gen_counts, eot, gamma,
            mesh=mesh)
        return cache, draft, b0, extra, output, gen_counts, info

    extra = jnp.zeros((buffer0.shape[0], 0), jnp.int32)
    (cache, draft, output, gen_counts, rounds, accepted) = _spec_generate_fused(
        params, config, cache, draft, buffer0, extra, output, gen_counts, eot,
        gamma, max_new_tokens, round_fn)
    return cache, draft, output, gen_counts, rounds, accepted


@functools.partial(
    jax.jit,
    static_argnames=("config", "gamma", "max_new_tokens", "budget", "sink",
                     "compact_trigger", "mesh"),
    donate_argnames=("cache", "draft", "output", "gen_counts"))
def streaming_generate_fused(params, config, cache: KVCache,
                             draft: DraftKVCache, buffer0, last_acc, output,
                             gen_counts, eot, gamma: int, max_new_tokens: int,
                             budget: int, sink: int, compact_trigger: int,
                             mesh=None):
    def round_fn(cache, draft, b0, extra, output, gen_counts):
        last_acc, stale = extra
        draft = cache_lib.streaming_compact(draft, budget, sink,
                                            compact_trigger)
        (cache, draft, b0, last_acc, stale, output, gen_counts,
         info) = streaming_round(
            params, config, cache, draft, b0, last_acc, stale, output,
            gen_counts, eot, gamma, budget, sink, mesh=mesh)
        return cache, draft, b0, (last_acc, stale), output, gen_counts, info

    extra0 = (last_acc, jnp.zeros((buffer0.shape[0],), bool))
    (cache, draft, output, gen_counts, rounds, accepted) = _spec_generate_fused(
        params, config, cache, draft, buffer0, extra0, output, gen_counts,
        eot, gamma, max_new_tokens, round_fn)
    return cache, draft, output, gen_counts, rounds, accepted


# ---------------------------------------------------------------------------
# Host-side generation drivers
# ---------------------------------------------------------------------------

@dataclass
class SpecStats:
    rounds: int = 0
    total_drafted: int = 0
    total_accepted_drafts: int = 0
    generated_tokens: int = 0
    wall_time_s: float = 0.0
    draft_time_s: float = 0.0
    phase_times: dict = field(default_factory=dict)

    @property
    def acceptance_rate(self) -> float:
        return (self.total_accepted_drafts / self.total_drafted
                if self.total_drafted else 0.0)

    @property
    def avg_accepted_per_round(self) -> float:
        return (self.generated_tokens / self.rounds) if self.rounds else 0.0


def generate_autoregressive(engine: Engine, input_ids, max_new_tokens: int,
                            eot_ids=(), fused: bool = True,
                            temperature: float = 0.0, top_p: float = 1.0,
                            key=None) -> tuple[jax.Array, SpecStats]:
    """Baseline decode loop (reference tests/baseline_benchmark.py:80-92).

    fused=True (default) runs the whole decode as one on-device while_loop;
    fused=False keeps the step-per-dispatch host loop (useful for debugging).
    temperature > 0 samples (nucleus top_p) instead of greedy argmax.
    Timing starts after prefill, as in the reference.
    """
    eot = _eot_array(eot_ids)
    tok = engine.encode(input_ids)
    B = tok.shape[0]
    stats = SpecStats()
    jax.block_until_ready(tok)
    t0 = time.perf_counter()
    if fused:
        output, counts, engine.cache = autoregressive_generate_fused(
            engine.params, engine.config, engine.cache, tok, eot,
            max_new_tokens, temperature=temperature, top_p=top_p, key=key,
            mesh=engine.mesh)
        jax.block_until_ready(output)
        stats.wall_time_s = time.perf_counter() - t0
        stats.generated_tokens = int(jnp.sum(counts))
        stats.rounds = int(jnp.max(counts))
        return output, stats
    out = [tok]
    for _ in range(max_new_tokens - 1):
        tok = engine.inference(tok)
        out.append(tok)
        if bool(jnp.any(_is_eot(tok, eot))):
            break
    jax.block_until_ready(out[-1])
    stats.wall_time_s = time.perf_counter() - t0
    stats.generated_tokens = len(out) * B
    stats.rounds = len(out)
    return jnp.concatenate(out, axis=1), stats


def _eot_array(eot_ids) -> jax.Array:
    ids = list(eot_ids)[:2] + [-1, -1]
    return jnp.asarray(ids[:2], jnp.int32)


def generate_selfspec(engine: Engine, input_ids, gamma: int,
                      max_new_tokens: int, eot_ids=(), fused: bool = True
                      ) -> tuple[jax.Array, jax.Array, SpecStats]:
    """Self-speculation driver (reference tests/{SnapKV,StreamingLLM}/
    selfspec_benchmark.py). Returns (output [B, cap], gen_counts [B], stats).

    fused=True (default) runs every round inside one on-device while_loop
    (single host dispatch); fused=False drives round-per-dispatch from the
    host, syncing on the terminal flag each round like the reference.
    """
    assert engine.spec in ("snapkv", "streaming", "quest", "retro", "squeeze")
    input_ids = jnp.asarray(input_ids, jnp.int32)
    B, P = input_ids.shape
    eot = _eot_array(eot_ids)
    cap = max_new_tokens + gamma + 2
    output = jnp.zeros((B, cap), jnp.int32)
    gen_counts = jnp.zeros((B,), jnp.int32)

    buffer0 = engine.encode(input_ids)
    if engine.spec == "streaming":
        # invariant: draft.lengths points at the newest accepted token's slot
        last_acc = input_ids[:, -1:]
        stale = jnp.zeros((B,), bool)    # slot holds prefill-exact K/V
        engine.set_lengths(draft=engine.draft.lengths - 1)

    stats = SpecStats()
    jax.block_until_ready(buffer0)
    if engine.spec_index is not None:
        # the index build dispatched at encode() time must FINISH before the
        # timer starts, or the device queue silently charges it to the timed
        # generation (it belongs to prefill, like the reference's in-prefill
        # clustering — retroinfer_cache.py:349)
        jax.block_until_ready(engine.spec_index)
    t0 = time.perf_counter()
    if fused:
        if engine.spec in ("quest", "retro", "squeeze"):
            index = engine.spec_index
            if engine.spec == "squeeze":
                from magicdec_tpu.engine.squeeze import squeeze_generate_fused
                recent = engine.latest_k
                max_clusters = max(
                    (engine.draft_budget - recent) // engine.retro_cap, 1)
                (engine.cache, output, gen_counts, rounds,
                 accepted) = squeeze_generate_fused(
                    engine.params, engine.config, engine.cache, index,
                    buffer0, output, gen_counts, eot, gamma, max_new_tokens,
                    engine.retro_cap, max_clusters,
                    engine.squeeze_threshold, recent, mesh=engine.mesh)
            elif engine.spec == "quest":
                from magicdec_tpu.engine.quest import quest_generate_fused
                (engine.cache, output, gen_counts, rounds,
                 accepted) = quest_generate_fused(
                    engine.params, engine.config, engine.cache, index,
                    buffer0, output, gen_counts, eot, gamma, max_new_tokens,
                    engine.draft_budget, engine.latest_k,
                    page=engine.quest_page, mesh=engine.mesh)
            else:
                from magicdec_tpu.engine.retro import retro_generate_fused
                recent = engine.latest_k
                nprobe = max((engine.draft_budget - recent) // engine.retro_cap,
                             1)
                (engine.cache, output, gen_counts, rounds,
                 accepted) = retro_generate_fused(
                    engine.params, engine.config, engine.cache, index,
                    buffer0, output, gen_counts, eot, gamma, max_new_tokens,
                    engine.retro_cap, nprobe, recent,
                    mesh=engine.mesh)
            engine.spec_index = None
            jax.block_until_ready(output)
            stats.wall_time_s = time.perf_counter() - t0
            stats.rounds = int(rounds)
            stats.total_drafted = stats.rounds * B * gamma
            stats.total_accepted_drafts = int(accepted)
            stats.generated_tokens = int(jnp.sum(gen_counts))
            return output, gen_counts, stats
        if engine.spec == "snapkv":
            (engine.cache, engine.draft, output, gen_counts, rounds,
             accepted) = snapkv_generate_fused(
                engine.params, engine.config, engine.cache, engine.draft,
                buffer0, output, gen_counts, eot, gamma, max_new_tokens,
                mesh=engine.mesh)
        else:
            trigger = engine.draft.size - (engine.draft_headroom // 2)
            (engine.cache, engine.draft, output, gen_counts, rounds,
             accepted) = streaming_generate_fused(
                engine.params, engine.config, engine.cache, engine.draft,
                buffer0, last_acc, output, gen_counts, eot, gamma,
                max_new_tokens, engine.draft_budget, engine.sink_size, trigger,
                mesh=engine.mesh)
        jax.block_until_ready(output)
        stats.wall_time_s = time.perf_counter() - t0
        stats.rounds = int(rounds)
        stats.total_drafted = stats.rounds * B * gamma
        stats.total_accepted_drafts = int(accepted)
        stats.generated_tokens = int(jnp.sum(gen_counts))
        return output, gen_counts, stats
    assert engine.spec not in ("quest", "retro", "squeeze"), \
        f"{engine.spec} supports fused=True only"
    while True:
        if engine.spec == "snapkv":
            (engine.cache, engine.draft, buffer0, output, gen_counts,
             info) = snapkv_round(engine.params, engine.config, engine.cache,
                                  engine.draft, buffer0, output, gen_counts,
                                  eot, gamma, mesh=engine.mesh)
        else:
            engine.compact_draft()
            (engine.cache, engine.draft, buffer0, last_acc, stale, output,
             gen_counts, info) = streaming_round(
                engine.params, engine.config, engine.cache,
                engine.draft, buffer0, last_acc, stale, output,
                gen_counts, eot, gamma,
                engine.draft_budget, engine.sink_size,
                mesh=engine.mesh)
        stats.rounds += 1
        stats.total_drafted += B * gamma
        stats.total_accepted_drafts += int(info["accepted_drafts"])
        done = bool(info["terminal"])
        max_gen = int(jnp.max(gen_counts))
        if done or max_gen >= max_new_tokens:
            break
        if int(jnp.max(engine.cache.lengths)) + gamma + 1 > engine.max_len:
            break
    # final bonus token
    idx = jnp.minimum(gen_counts, cap - 1)
    output = output.at[jnp.arange(B), idx].set(buffer0[:, 0])
    gen_counts = gen_counts + 1
    jax.block_until_ready(output)
    stats.wall_time_s = time.perf_counter() - t0
    stats.generated_tokens = int(jnp.sum(gen_counts))
    return output, gen_counts, stats
