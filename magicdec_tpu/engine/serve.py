"""Continuous batching: per-sequence admission/eviction mid-generation.

The reference has no serving loop (its drivers run a fixed batch to
completion); BASELINE.json's north star names continuous batching as the
production-serving gap, so this subsystem goes BEYOND reference parity.

TPU-native design: XLA wants static shapes, so the batch is a fixed B-row
frame and continuous batching is ROW RECYCLING around the per-round jitted
step (engine/spec.snapkv_round — the same program the fused generation loop
runs, so a request's token stream is IDENTICAL to what Engine/generate_
selfspec would emit for it; rows are mathematically independent in every
batched op). The host syncs once per speculation round (gen_counts +
output), finalizes rows that hit their token budget or an EOT, and installs
queued requests into freed rows:

  * each new request is prefilled on a 1-row STAGING engine (reusing the
    chunked-prefill programs at batch 1 — no whole-batch forward is wasted
    on one row), then its target cache row, SnapKV draft row, and first
    token are copied into the freed frame row by one jitted install step;
  * parked (empty) rows keep decoding garbage into a dead output row —
    static shapes make that free compute-wise; their lengths are reset at
    finalize so they can never overflow the frame's max_len.

Throughput intuition: a static-batch server running mixed-length requests
stalls the whole batch on its longest member; here short requests leave and
new ones enter at round granularity (gamma+1 tokens), so occupancy stays
~1 whenever the queue is non-empty.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu.cache import DraftKVCache, KVCache
from magicdec_tpu.engine.backend import Engine
from magicdec_tpu.engine.spec import _eot_array, snapkv_round


@dataclass
class Request:
    """One generation request. `prompt` length must be a multiple of the
    engine's prefill_chunk and >= draft_budget (SnapKV's constraint)."""
    req_id: int
    prompt: np.ndarray
    max_new_tokens: int


@dataclass
class Completion:
    req_id: int
    tokens: np.ndarray          # generated tokens (<= max_new, EOT-clipped)
    prompt_len: int
    rounds: int                 # speculation rounds this request was live


@functools.partial(jax.jit, donate_argnames=("cache", "draft", "buffer0",
                                             "output", "gen_counts"))
def _install_row(cache: KVCache, draft: DraftKVCache, buffer0, output,
                 gen_counts, st_cache: KVCache, st_draft: DraftKVCache,
                 st_tok, row):
    """Copy the staging engine's single row into frame row `row` (traced
    scalar -> one compiled program for every row) and reset its counters."""
    ck = cache.k.at[:, row].set(st_cache.k[:, 0])
    cv = cache.v.at[:, row].set(st_cache.v[:, 0])
    lens = cache.lengths.at[row].set(st_cache.lengths[0])
    dk = draft.k.at[:, row].set(st_draft.k[:, 0])
    dv = draft.v.at[:, row].set(st_draft.v[:, 0])
    dlen = draft.lengths.at[row].set(st_draft.lengths[0])
    dev = draft.evicted.at[row].set(st_draft.evicted[0])
    buffer0 = buffer0.at[row, 0].set(st_tok[0, 0])
    output = output.at[row].set(0)
    gen_counts = gen_counts.at[row].set(0)
    return (KVCache(ck, cv, lens), DraftKVCache(dk, dv, dlen, dev), buffer0,
            output, gen_counts)


@functools.partial(jax.jit, donate_argnames=("cache", "draft"))
def _park_row(cache: KVCache, draft: DraftKVCache, row):
    """Reset a finalized row's lengths so its dead decode can never overflow
    max_len (slots 0..8 hold stale but finite values — no empty-softmax
    NaNs)."""
    return (cache.set_lengths(cache.lengths.at[row].set(8)),
            DraftKVCache(draft.k, draft.v, draft.lengths.at[row].set(8),
                         draft.evicted.at[row].set(0)))


class ServeEngine:
    """Continuous-batching server over SnapKV self-speculation.

    Usage:
        srv = ServeEngine(config, params, batch_size=4, max_len=4096,
                          draft_budget=128, gamma=4, max_new_cap=128)
        done = srv.run([Request(0, prompt0, 64), Request(1, prompt1, 96), ...])
    """

    def __init__(self, config, params, *, batch_size: int, max_len: int,
                 draft_budget: int, gamma: int = 4, max_new_cap: int = 256,
                 window_size: int = 32, prefill_chunk: int = 128,
                 eot_ids=(), kv_dtype=None):
        self.gamma = gamma
        self.max_new_cap = max_new_cap
        self.eot = _eot_array(eot_ids)
        self.eot_ids = tuple(eot_ids)
        self.frame = Engine(config, params, batch_size=batch_size,
                            max_len=max_len, spec="snapkv",
                            draft_budget=draft_budget,
                            window_size=window_size,
                            prefill_chunk=prefill_chunk, kv_dtype=kv_dtype)
        self.stage = Engine(config, params, batch_size=1, max_len=max_len,
                            spec="snapkv", draft_budget=draft_budget,
                            window_size=window_size,
                            prefill_chunk=prefill_chunk, kv_dtype=kv_dtype)
        self.frame._create_cache()
        B = batch_size
        cap = max_new_cap + gamma + 2
        self.buffer0 = jnp.zeros((B, 1), jnp.int32)
        self.output = jnp.zeros((B, cap), jnp.int32)
        self.gen_counts = jnp.zeros((B,), jnp.int32)
        self.row_req: list[Request | None] = [None] * B
        self.row_rounds = [0] * B
        self.rounds = 0

    # -- admission -------------------------------------------------------------

    def _admit(self, row: int, req: Request):
        assert req.max_new_tokens <= self.max_new_cap
        self.stage.clear_kv()
        tok = self.stage.encode(np.asarray(req.prompt)[None, :])
        (self.frame.cache, self.frame.draft, self.buffer0, self.output,
         self.gen_counts) = _install_row(
            self.frame.cache, self.frame.draft, self.buffer0, self.output,
            self.gen_counts, self.stage.cache, self.stage.draft, tok,
            jnp.int32(row))
        self.row_req[row] = req
        self.row_rounds[row] = 0

    def _finalize(self, row: int, counts: np.ndarray,
                  out_np: np.ndarray) -> Completion:
        req = self.row_req[row]
        n = min(int(counts[row]), req.max_new_tokens)
        toks = out_np[row, :n].copy()
        for e in self.eot_ids:                      # clip at the first EOT
            hit = np.nonzero(toks == e)[0]
            if hit.size:
                toks = toks[:hit[0] + 1]
        self.row_req[row] = None
        (self.frame.cache, self.frame.draft) = _park_row(
            self.frame.cache, self.frame.draft, jnp.int32(row))
        return Completion(req.req_id, toks, len(req.prompt),
                          self.row_rounds[row])

    # -- the serving loop --------------------------------------------------------

    def run(self, requests, max_rounds: int | None = None):
        """Serve `requests` (list[Request], FIFO) to completion; returns
        list[Completion] in finish order. One host sync per round."""
        queue = list(requests)
        done: list[Completion] = []
        B = self.frame.batch_size
        for row in range(B):                        # initial fill
            if queue and self.row_req[row] is None:
                self._admit(row, queue.pop(0))

        while any(r is not None for r in self.row_req):
            (self.frame.cache, self.frame.draft, self.buffer0, self.output,
             self.gen_counts, info) = snapkv_round(
                self.frame.params, self.frame.config, self.frame.cache,
                self.frame.draft, self.buffer0, self.output, self.gen_counts,
                self.eot, self.gamma, mesh=self.frame.mesh)
            self.rounds += 1
            for row in range(B):
                if self.row_req[row] is not None:
                    self.row_rounds[row] += 1

            counts = np.asarray(self.gen_counts)
            out_np = np.asarray(self.output)
            for row in range(B):
                req = self.row_req[row]
                if req is None:
                    continue
                seg = out_np[row, :int(counts[row])]
                hit_eot = any((seg == e).any() for e in self.eot_ids)
                full = int(counts[row]) >= req.max_new_tokens
                near_cap = (int(np.asarray(
                    self.frame.cache.lengths)[row])
                    + self.gamma + 1 > self.frame.max_len)
                if full or hit_eot or near_cap:
                    done.append(self._finalize(row, counts, out_np))
                    if queue:
                        self._admit(row, queue.pop(0))
            if max_rounds is not None and self.rounds >= max_rounds:
                break
        return done
