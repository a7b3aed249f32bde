"""Standalone-draft speculative decoding (two models).

TPU-native analog of the reference's longspec drivers + LMBackend_Draft
(tests/SnapKV/longspec_benchmark.py, tests/StreamingLLM/longspec_benchmark.py,
Engine/SnapKV/{model_draft,backend_draft}.py): a small draft model (e.g.
llama-3.2-1b) speculates gamma tokens, the large target verifies. The draft
keeps its OWN KV cache in one of three modes (reference backend_draft.py:15-21):
  * "full"       draft_budget=-1 -> classic SD over the draft's full KV;
  * "snapkv"     draft compresses its own prefill KV to the budget
                 (model_draft.py:345-395 gen_draft_kv);
  * "streaming"  sink+window budget cache (StreamingLLM/model_draft.py:102-145).

Where the reference runs the draft on a NCCL sub-group of ranks and
broadcasts tokens (asymmetric TP, tp.py:54-64 + longspec_benchmark.py:189),
GSPMD needs no process choreography: the draft's weights simply carry their
own (possibly smaller) shardings on the same mesh, XLA partitions each step,
and "broadcast draft tokens to all ranks" is the implicit all-gather of a
replicated output. The reference's ragged double-advance path
(longspec_benchmark.py:271-281) is uniformized by always re-feeding the last
accepted token together with the bonus (first draft step has dec_len 2).

Like engine/spec.py, the whole generation runs as ONE jitted lax.while_loop.
"""

from __future__ import annotations

import functools
import time
import jax
import jax.numpy as jnp

from magicdec_tpu.cache import DraftKVCache, KVCache
from magicdec_tpu.engine import attention_impls as impls
from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.sampling import argmax_tokens
from magicdec_tpu.engine.spec import SpecStats, _accept_and_update, _eot_array
from magicdec_tpu.models import llama


def _draft_step_fn(dconfig, mode: str, budget: int, sink: int, mesh=None):
    """One draft decode step reading/writing the draft's own cache pytree."""
    def step(dparams, dcache, tokens, target_len, write_mask=None):
        if mode == "full":
            impl = impls.target_attn(dconfig, dcache.lengths, mesh=mesh,
                                     write_mask=write_mask)
        elif mode == "snapkv":
            # fresh tokens rotate at their true absolute positions
            impl = impls.snapkv_draft_attn(dconfig, target_len, dcache.lengths,
                                           mesh=mesh, write_mask=write_mask)
        else:
            impl = impls.streaming_draft_attn(dconfig, dcache.lengths,
                                              dcache.evicted, budget, sink,
                                              mesh=mesh,
                                              write_mask=write_mask)
        logits, (dk, dv) = llama.forward(dparams, dconfig, tokens, impl,
                                         (dcache.k, dcache.v), last_only=True,
                                         fused=llama.fused_for_mesh(mesh))
        T = tokens.shape[1]
        if mode == "full":
            new = KVCache(dk, dv, dcache.lengths + T)
        else:
            new = DraftKVCache(dk, dv, dcache.lengths + T, dcache.evicted)
        return new, argmax_tokens(logits)
    return step


@functools.partial(
    jax.jit,
    static_argnames=("tconfig", "dconfig", "gamma", "max_new_tokens", "mode",
                     "budget", "sink", "mesh"),
    donate_argnames=("tcache", "dcache", "output", "gen_counts"))
def longspec_generate_fused(tparams, tconfig, dparams, dconfig,
                            tcache: KVCache, dcache, buffer0, last_acc,
                            output, gen_counts, eot, gamma: int,
                            max_new_tokens: int, mode: str, budget: int,
                            sink: int, mesh=None):
    """Full two-model generation as one on-device while_loop.

    Invariant at round entry: dcache.lengths is the slot of `last_acc` (the
    newest accepted token, re-fed with the round's first input so its draft
    K/V is always fresh — subsumes the reference's double-advance).
    """
    step = _draft_step_fn(dconfig, mode, budget, sink, mesh=mesh)
    max_len = tcache.k.shape[2]

    def round_body(state):
        (tcache, dcache, buffer0, last_acc, stale, output, gen_counts, rounds,
         accepted, terminal) = state
        lenT0, lenD0 = tcache.lengths, dcache.lengths
        B = buffer0.shape[0]

        # -- draft: dec_len-2 first step, then gamma-1 single steps (unrolled;
        # a lax.scan would copy the draft cache across the scan boundary).
        # The re-feed writes last_acc's slot ONLY when stale (fully-accepted
        # previous round): XLA numerics differ between prefill and decode
        # shapes, so overwriting a prefill-written slot with re-computed K/V
        # would break the self-draft bit-exactness (see spec.streaming_round).
        mask0 = jnp.concatenate([stale[:, None], jnp.ones((B, 1), bool)],
                                axis=1)
        dcache2, nxt = step(dparams, dcache,
                            jnp.concatenate([last_acc, buffer0], axis=1),
                            lenT0 - 1, write_mask=mask0)
        drafted = [nxt]
        tlen = lenT0 + 1
        for _ in range(gamma - 1):
            dcache2, nxt = step(dparams, dcache2, nxt, tlen)
            tlen = tlen + 1
            drafted.append(nxt)
        buffer = jnp.concatenate([buffer0] + drafted, axis=1)  # [B, gamma+1]

        # -- target verify (plain decode over gamma+1 tokens,
        #    longspec_benchmark.py:198) ---------------------------------------
        impl = impls.target_attn(tconfig, lenT0, mesh=mesh)
        logits, (ck, cv) = llama.forward(tparams, tconfig, buffer, impl,
                                         (tcache.k, tcache.v),
                                         fused=llama.fused_for_mesh(mesh))
        target_tokens = argmax_tokens(logits)

        accept, bonus, output, gen_counts, term, acc = _accept_and_update(
            buffer, target_tokens, eot, gamma, output, gen_counts)

        new_tcache = KVCache(ck, cv, lenT0 + accept)
        # draft wrote slots lenD0..lenD0+gamma; keep the accepted prefix; the
        # slot of the newest accepted token is lenD0 + accept (last_acc@lenD0)
        new_dcache = (dcache2.set_lengths(lenD0 + accept)
                      if mode == "full" else
                      DraftKVCache(dcache2.k, dcache2.v, lenD0 + accept,
                                   dcache2.evicted))
        new_last_acc = jnp.take_along_axis(buffer, accept[:, None] - 1, axis=1)
        new_stale = accept == gamma + 1      # final drafted token never appended
        return (new_tcache, new_dcache, bonus, new_last_acc, new_stale, output,
                gen_counts, rounds + 1, accepted + acc, terminal | term)

    def cond(state):
        tcache = state[0]
        gen_counts, rounds, accepted, terminal = state[6:10]
        return (~terminal
                & (jnp.min(gen_counts) < max_new_tokens)
                & (jnp.max(tcache.lengths) + gamma + 1 <= max_len))

    state = (tcache, dcache, buffer0, last_acc,
             jnp.zeros((buffer0.shape[0],), bool), output, gen_counts,
             jnp.int32(0), jnp.int32(0), jnp.bool_(False))
    state = jax.lax.while_loop(cond, round_body, state)
    (tcache, dcache, buffer0, last_acc, stale, output, gen_counts, rounds,
     accepted, terminal) = state
    B, cap = output.shape
    idx = jnp.minimum(gen_counts, cap - 1)
    output = output.at[jnp.arange(B), idx].set(buffer0[:, 0])
    return tcache, dcache, output, gen_counts + 1, rounds, accepted


class LongSpecEngine:
    """Two-model speculative decoding engine.

    target/draft are Engine instances: the draft Engine carries the
    compression mode (spec=None -> full-KV classic SD); its budget cache is
    built by its own encode(), after which its full prefill cache is freed
    (the reference's standalone draft equally discards nothing it needs:
    model_draft.py compresses in place at prefill end).
    """

    def __init__(self, target: Engine, draft: Engine):
        assert target.batch_size == draft.batch_size
        self.target = target
        self.draft = draft
        self.mode = draft.spec or "full"

    def generate(self, input_ids, gamma: int, max_new_tokens: int,
                 eot_ids=()):
        input_ids = jnp.asarray(input_ids, jnp.int32)
        B = input_ids.shape[0]
        eot = _eot_array(eot_ids)
        cap = max_new_tokens + gamma + 2
        output = jnp.zeros((B, cap), jnp.int32)
        gen_counts = jnp.zeros((B,), jnp.int32)

        buffer0 = self.target.encode(input_ids)
        self.draft.encode(input_ids)
        if self.mode == "full":
            dcache = self.draft.cache
        else:
            dcache = self.draft.draft
            # the draft's full prefill cache is no longer needed
            self.draft.drop_cache()
        # invariant: dcache.lengths -> slot of the last prompt token
        last_acc = input_ids[:, -1:]
        dcache = dcache.set_lengths(dcache.lengths - 1) if isinstance(
            dcache, KVCache) else DraftKVCache(
            dcache.k, dcache.v, dcache.lengths - 1, dcache.evicted)

        stats = SpecStats()
        jax.block_until_ready(buffer0)
        t0 = time.perf_counter()
        (self.target.cache, dcache, output, gen_counts, rounds,
         accepted) = longspec_generate_fused(
            self.target.params, self.target.config, self.draft.params,
            self.draft.config, self.target.cache, dcache, buffer0, last_acc,
            output, gen_counts, eot, gamma, max_new_tokens, self.mode,
            self.draft.draft_budget, self.draft.sink_size,
            mesh=self.target.mesh)
        jax.block_until_ready(output)
        stats.wall_time_s = time.perf_counter() - t0
        if self.mode == "full":
            self.draft.cache = dcache
        else:
            self.draft.draft = dcache
        stats.rounds = int(rounds)
        stats.total_drafted = stats.rounds * B * gamma
        stats.total_accepted_drafts = int(accepted)
        stats.generated_tokens = int(jnp.sum(gen_counts))
        return output, gen_counts, stats
