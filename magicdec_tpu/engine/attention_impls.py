"""Attention implementations plugged into the model core's layer scan.

Each factory closes over step-invariant metadata (positions, lengths, masks —
identical for every layer) and returns an `attn_impl(q, k, v, caches, l)`
used by models/llama.py: `caches` are FULL stacked [L, B, S, Hkv*D] arrays
carried in place through the layer scan, `l` the traced layer index. Appends
are tiny scatters (cache.append_at_layer); reads go either through the Pallas
flash-decode kernel (which indexes the stacked cache directly via scalar
prefetch — no layer-slice copy) or the dense XLA oracle.

Together these replace the reference's four hand-duplicated forward variants
(Engine/SnapKV/model.py:173-247 forward / verify / draft_forward / prefill)
and its flashinfer plan()/run() wrapper pairs (Engine/SnapKV/backend.py:41-107):
under jit every variant is just a different fixed-shape XLA program.

Kernel selection: flash-decode on TPU for decode/verify-sized queries, dense
XLA otherwise (CPU tests, prefill chunks, the small budget-bounded draft
caches where a layer copy is cheap). Override per-factory via `attend=` or
globally via set_attend_mode("dense"|"flash"|"auto").

Multi-device: pallas_call does not auto-partition under GSPMD, so every
factory takes a `mesh`; when it spans >1 device the kernel call is wrapped in
jax.shard_map over (dp: batch, tp: heads) — attention is per-KV-head, so a tp
shard computes its heads' output with ZERO collectives (the reference instead
runs flashinfer per rank under NCCL TP, Engine/tp.py:202-207). Off-TPU the
kernels run in interpret mode, which lets the CPU test mesh exercise the
exact sharded-flash program the TPU runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from magicdec_tpu import cache as cache_lib
from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops import attention as dense
from magicdec_tpu.ops import snapkv as snapkv_ops
from magicdec_tpu.ops.pallas.flash_decode import (flash_decode_intervals,
                                                  flash_decode_stacked)
from magicdec_tpu.ops.rope import rope, rope_cos_sin, apply_rope

_ATTEND_MODE = "auto"  # "auto" | "dense" | "flash"
# flash-decode embeds queries block-diagonally: M = Hkv * T * G rows must
# stay VMEM-friendly; prefill chunks (T=128) go dense regardless.
_FLASH_MAX_TG = 64


def set_attend_mode(mode: str):
    global _ATTEND_MODE
    assert mode in ("auto", "dense", "flash"), mode
    _ATTEND_MODE = mode


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _flash_stacked(q, ck, cv, l, valid, mesh, s_cap=None, s_block=512):
    """flash_decode_stacked, shard_mapped when the mesh spans >1 device."""
    if mesh is None or mesh.devices.size == 1:
        return flash_decode_stacked(q, ck, cv, l, valid, interpret=_interp(),
                                    s_cap=s_cap, s_block=s_block)
    fn = jax.shard_map(
        functools.partial(flash_decode_stacked, interpret=_interp(),
                          s_cap=s_cap, s_block=s_block),
        mesh=mesh,
        in_specs=(P("dp", None, "tp", None), P(None, "dp", None, "tp"),
                  P(None, "dp", None, "tp"), P(), P("dp", None)),
        out_specs=P("dp", None, "tp", None), check_vma=False)
    return fn(q, ck, cv, l, valid)


_PREFILL_S_BLOCK = 1024          # measured best on v5e (4.47 ms/call vs
_PREFILL_VMEM = 32 * 1024 * 1024  # 5.4 at the decode kernels' 512/8MB)


def flash_stacked_lse(q, ck, cv, l, valid, mesh, s_cap=None):
    """flash_decode_stacked with the online-softmax state (m, l) returned for
    split-attention merging (ops/attention.merge_lse) — the GliDe tree verify
    runs [flash prefix | dense tree block]."""
    if mesh is None or mesh.devices.size == 1:
        return flash_decode_stacked(q, ck, cv, l, valid, interpret=_interp(),
                                    s_cap=s_cap, return_lse=True)
    fn = jax.shard_map(
        functools.partial(flash_decode_stacked, interpret=_interp(),
                          s_cap=s_cap, return_lse=True),
        mesh=mesh,
        in_specs=(P("dp", None, "tp", None), P(None, "dp", None, "tp"),
                  P(None, "dp", None, "tp"), P(), P("dp", None)),
        out_specs=(P("dp", None, "tp", None), P("dp", None, "tp"),
                   P("dp", None, "tp")), check_vma=False)
    return fn(q, ck, cv, l, valid)


def _flash_prefill_dispatch(q, ck, cv, l, valid, mesh, s_cap=None):
    """flash_prefill (h-grouped chunk attention), shard_mapped when needed."""
    from magicdec_tpu.ops.pallas.flash_decode import flash_prefill
    if mesh is None or mesh.devices.size == 1:
        return flash_prefill(q, ck, cv, l, valid, interpret=_interp(),
                             s_cap=s_cap, s_block=_PREFILL_S_BLOCK,
                             vmem_budget=_PREFILL_VMEM)
    fn = jax.shard_map(
        functools.partial(flash_prefill, interpret=_interp(), s_cap=s_cap,
                          s_block=_PREFILL_S_BLOCK,
                          vmem_budget=_PREFILL_VMEM),
        mesh=mesh,
        in_specs=(P("dp", None, "tp", None), P(None, "dp", None, "tp"),
                  P(None, "dp", None, "tp"), P(), P("dp", None)),
        out_specs=P("dp", None, "tp", None), check_vma=False)
    return fn(q, ck, cv, l, valid)


def _flash_intervals(q, k, v, sink_end, lo, hi, mesh):
    """flash_decode_intervals (flat [B,S,HD] k/v), shard_mapped when needed."""
    if mesh is None or mesh.devices.size == 1:
        return flash_decode_intervals(q, k, v, sink_end, lo, hi,
                                      interpret=_interp())
    fn = jax.shard_map(
        functools.partial(flash_decode_intervals, interpret=_interp()),
        mesh=mesh,
        in_specs=(P("dp", None, "tp", None), P("dp", None, "tp"),
                  P("dp", None, "tp"), P("dp", None), P("dp", None),
                  P("dp", None)),
        out_specs=P("dp", None, "tp", None), check_vma=False)
    return fn(q, k, v, sink_end, lo, hi)


def _flat(ctx: jax.Array) -> jax.Array:
    B, T, H, D = ctx.shape
    return ctx.reshape(B, T, H * D)


def _unpack(cache_l: jax.Array, config: ModelArgs) -> jax.Array:
    """[B, S, Hkv*D] packed cache layer -> [B, S, Hkv, D] view (free bitcast:
    identical row-major order; packing exists only to keep the HBM minor
    dimension 128-aligned)."""
    B, S, _ = cache_l.shape
    return cache_l.reshape(B, S, config.n_kv_head, config.head_dim)


def _use_flash(config: ModelArgs, T: int) -> bool:
    if _ATTEND_MODE == "dense":
        return False
    tg = T * (config.n_head // config.n_kv_head)
    if _ATTEND_MODE == "flash":
        return True
    return jax.default_backend() == "tpu" and tg <= _FLASH_MAX_TG


def _use_flash_prefill(config: ModelArgs, T: int) -> bool:
    """Prefill-sized queries (T >= 8): flash with T sub-blocking on TPU."""
    if _ATTEND_MODE == "dense":
        return False
    return (_ATTEND_MODE == "flash" or jax.default_backend() == "tpu") \
        and T >= 8


def _attend_stacked(config: ModelArgs, q, ck, cv, l, valid, attend=None,
                    cap: int | None = None, mesh=None):
    """Ragged prefix attention against stacked caches, kernel-dispatched.

    `cap` bounds the attended slots: the flash kernels' s_cap stops their
    S-grid at the causal bucket (no fetch past it); the dense path slices
    the layer instead. Decode/verify queries (small T) go through the
    block-diagonal decode kernel; prefill chunks (T >= 8) through the
    h-grouped flash_prefill kernel (K/V for the whole chunk are appended
    before any row attends, so per-row causal bounds suffice)."""
    if attend is not None:
        k_l, v_l = ck[l], cv[l]
        if cap is not None and cap < k_l.shape[1]:
            k_l, v_l = k_l[:, :cap], v_l[:, :cap]
        return attend(q, _unpack(k_l, config), _unpack(v_l, config), valid)
    T = q.shape[1]
    if _use_flash(config, T):
        return _flash_stacked(q, ck, cv, l, valid, mesh)
    if _use_flash_prefill(config, T):
        return _flash_prefill_dispatch(q, ck, cv, l, valid, mesh, s_cap=cap)
    k_l, v_l = ck[l], cv[l]
    if cap is not None and cap < k_l.shape[1]:
        k_l, v_l = k_l[:, :cap], v_l[:, :cap]
    return dense.masked_attention(q, _unpack(k_l, config),
                                  _unpack(v_l, config), valid)


def target_attn(config: ModelArgs, lengths_before: jax.Array, attend=None,
                cap: int | None = None, mesh=None, write_mask=None,
                uniform_start=None):
    """Decode/verify/prefill against the target cache.

    caches = (ck, cv) stacked [L, B, S, Hkv*D]. Queries sit at absolute
    positions lengths_before + t; K is rotated before being appended
    (reference flow: mylib::rope -> update_kv -> attention,
    Engine/SnapKV/model.py:324-339).

    `cap` (static) bounds the attended slot range: chunked prefill passes a
    power-of-2 bucket >= the chunk's causal frontier, so early chunks don't
    read (and dense-path compute over) the whole max_len cache. Lengths must
    satisfy lengths_before + T <= cap.

    `uniform_start` (traced int32 scalar, optional): asserts every sequence
    writes at the same offset (chunked prefill). The append becomes one
    dynamic_update_slice instead of a [B*T]-row scatter (~50x cheaper,
    cache.append_at_layer_uniform) and the rope tables collapse to [1, T]
    positions (B x fewer transcendentals).
    """
    def impl(q, k, v, caches, l):
        ck, cv = caches
        T = q.shape[1]
        if uniform_start is not None:
            positions = (uniform_start
                         + jnp.arange(T, dtype=jnp.int32))[None, :]  # [1, T]
            q = rope(config, q, positions)
            k = rope(config, k, positions)
            ck = cache_lib.append_at_layer_uniform(ck, k, uniform_start, l)
            cv = cache_lib.append_at_layer_uniform(cv, v, uniform_start, l)
            valid = jnp.broadcast_to(positions + 1, (q.shape[0], T))
        else:
            positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
            q = rope(config, q, positions)
            k = rope(config, k, positions)
            ck = cache_lib.append_at_layer(ck, k, lengths_before, l,
                                           write_mask)
            cv = cache_lib.append_at_layer(cv, v, lengths_before, l,
                                           write_mask)
            valid = dense.decode_valid_upto(lengths_before, T)
        ctx = _attend_stacked(config, q, ck, cv, l, valid, attend, cap=cap,
                              mesh=mesh)
        return _flat(ctx), (ck, cv)

    return impl


def verify_dual_attn(config: ModelArgs, lengths_before: jax.Array,
                     draft_lengths_before: jax.Array, attend=None,
                     mesh=None):
    """SnapKV verify: full-cache target attention that ALSO appends the rotated
    k/v into the draft cache (Engine/SnapKV/model.py:340-355 Attention.verify),
    keeping the compressed cache in sync; acceptance then rewinds lengths only.

    caches = (ck, cv, dk, dv).
    """
    def impl(q, k, v, caches, l):
        ck, cv, dk, dv = caches
        T = q.shape[1]
        positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        ck = cache_lib.append_at_layer(ck, k, lengths_before, l)
        cv = cache_lib.append_at_layer(cv, v, lengths_before, l)
        dk = cache_lib.append_at_layer(dk, k, draft_lengths_before, l)
        dv = cache_lib.append_at_layer(dv, v, draft_lengths_before, l)
        valid = dense.decode_valid_upto(lengths_before, T)
        ctx = _attend_stacked(config, q, ck, cv, l, valid, attend,
                              mesh=mesh)
        return _flat(ctx), (ck, cv, dk, dv)

    return impl


def snapkv_draft_attn(config: ModelArgs, target_positions_base: jax.Array,
                      draft_lengths_before: jax.Array, attend=None,
                      mesh=None, write_mask=None):
    """Draft decode against a SnapKV-compressed cache.

    Keys in the draft cache are rotated at their ORIGINAL absolute positions,
    so draft queries rotate at the true context position (target cache length
    + offset) while masking runs in draft-slot coordinates
    (Engine/SnapKV/model.py:211-228 draft_forward).
    """
    def impl(q, k, v, caches, l):
        dk, dv = caches
        T = q.shape[1]
        positions = target_positions_base[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        q = rope(config, q, positions)
        k = rope(config, k, positions)
        dk = cache_lib.append_at_layer(dk, k, draft_lengths_before, l,
                                       write_mask)
        dv = cache_lib.append_at_layer(dv, v, draft_lengths_before, l,
                                       write_mask)
        valid = dense.decode_valid_upto(draft_lengths_before, T)
        ctx = _attend_stacked(config, q, dk, dv, l, valid, attend,
                              mesh=mesh)
        return _flat(ctx), (dk, dv)

    return impl


def streaming_draft_attn(config: ModelArgs, draft_lengths_before: jax.Array,
                         evicted: jax.Array, budget: int, sink: int,
                         attend=None, mesh=None, write_mask=None):
    """Draft decode against a StreamingLLM sink+window cache.

    The reference stores K UNROTATED and re-applies rope at read under
    remapped positions 0..kv_len-1 (sink keeps 0..sink-1, live window follows
    contiguously — Engine/StreamingLLM/model.py:116-157). We instead store K
    ROTATED at its ORIGINAL absolute position (bit-identical to what the
    target cache holds, so the prefix can be gathered from it exactly) and
    exploit that rope attention depends only on RELATIVE positions: under the
    remap, queries and window keys shift by the SAME per-sequence constant
    delta = sink − window_start − evicted, so window scores equal the plain
    true-position scores — no read rotation at all. Only the `sink` keys
    (whose remapped position stays 0..sink-1) differ: rotating those few
    slots by −delta reproduces the remapped geometry exactly. When nothing
    has been evicted, delta = 0 and the rotation is an exact identity — the
    budget ≥ context case is bit-exact with the target, which the reference's
    unrotate/re-rotate scheme cannot achieve in bf16. (An earlier version
    rotated the WHOLE cache by delta each step — same math, ~4x the draft
    step cost.)

    The attention runs through the SAME flash kernel as the target/verify
    path (interval-mask form) so the full-budget case stays bit-exact — or
    densely when attend= is forced.
    caches = (dk, dv) sized [L, B, size >= budget + slack, Hkv*D].
    """

    def impl(q, k, v, caches, l):
        dk, dv = caches
        B, T = q.shape[:2]
        size = dk.shape[2]
        # slot s >= sink of sequence b holds original position evicted[b] + s
        # (compaction preserves this: it shifts slots and grows evicted by the
        # same amount); sink slots hold original position s.
        q_slot = draft_lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        k_true_pos = evicted[:, None] + q_slot
        # append K ROTATED at its true absolute position (target-identical)
        dk = cache_lib.append_at_layer(dk, rope(config, k, k_true_pos),
                                       draft_lengths_before, l, write_mask)
        dv = cache_lib.append_at_layer(dv, v, draft_lengths_before, l,
                                       write_mask)
        lengths_after = draft_lengths_before + T
        start = jnp.maximum(sink, lengths_after - (budget - sink))   # [B]
        delta = sink - start - evicted                               # [B] <= 0
        # queries at TRUE positions; only the sink keys get the -delta twist
        q = rope(config, q, k_true_pos)
        k_l = dk[l]                                          # [B, size, HD]
        cos, sin = rope_cos_sin(config, -delta[:, None])     # [B, 1, D]
        sink_rot = apply_rope(_unpack(k_l[:, :sink], config), cos, sin)
        k_read = jax.lax.dynamic_update_slice(
            k_l, sink_rot.reshape(B, sink, -1).astype(k_l.dtype), (0, 0, 0))
        # valid = sink slots + live window, causal up to own slot:
        # [0, min(sink, q_slot+1)) ∪ [start, q_slot+1)
        if attend is None and _use_flash(config, T):
            hi = q_slot + 1
            ctx = _flash_intervals(
                q, k_read, dv[l], jnp.minimum(sink, hi),
                jnp.broadcast_to(start[:, None], hi.shape), hi, mesh)
        else:
            att = attend or dense.masked_attention_general
            slot = jnp.arange(size, dtype=jnp.int32)
            _, slot_valid = cache_lib.streaming_positions(lengths_after, size,
                                                          budget, sink)
            mask = slot_valid[:, None, :] & (slot[None, None, :] <= q_slot[:, :, None])
            ctx = att(q, _unpack(k_read, config), _unpack(dv[l], config), mask)
        return _flat(ctx), (dk, dv)

    return impl


def prefill_snapkv_attn(config: ModelArgs, lengths_before: jax.Array,
                        context_len: int, budget: int, window: int,
                        attend=None, cap: int | None = None, mesh=None,
                        uniform_start=None):
    """Last prefill chunk: target prefill attention + SnapKV draft-cache build
    (reference: Attention.prefill is_last=True -> gen_draft_kv,
    Engine/SnapKV/model.py:383-445).

    caches = (ck, cv, dk, dv); writes the first `budget` slots of dk/dv.
    """
    def impl(q, k, v, caches, l):
        ck, cv, dk, dv = caches
        T = q.shape[1]
        if uniform_start is not None:
            positions = (uniform_start
                         + jnp.arange(T, dtype=jnp.int32))[None, :]
            q = rope(config, q, positions)
            k = rope(config, k, positions)
            ck = cache_lib.append_at_layer_uniform(ck, k, uniform_start, l)
            cv = cache_lib.append_at_layer_uniform(cv, v, uniform_start, l)
            valid = jnp.broadcast_to(positions + 1, (q.shape[0], T))
        else:
            positions = lengths_before[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
            q = rope(config, q, positions)
            k = rope(config, k, positions)
            ck = cache_lib.append_at_layer(ck, k, lengths_before, l)
            cv = cache_lib.append_at_layer(cv, v, lengths_before, l)
            valid = dense.decode_valid_upto(lengths_before, T)
        # the chunk attention MUST take the same kernel path as the plain
        # prefill chunks (prefill_chunk_step -> target_attn): the AR baseline
        # and every engine must produce bit-identical prefill states or
        # their greedy streams diverge from token 0
        ctx = _attend_stacked(config, q, ck, cv, l, valid, attend, cap=cap,
                              mesh=mesh)
        k_l, v_l = ck[l], cv[l]
        if cap is not None and cap < k_l.shape[1]:
            k_l, v_l = k_l[:, :cap], v_l[:, :cap]
        cku, cvu = _unpack(k_l, config), _unpack(v_l, config)

        scores = snapkv_ops.snapkv_scores(q, cku, context_len, window)
        sel_k, sel_v = snapkv_ops.snapkv_select(scores, cku, cvu, context_len,
                                                budget, window)
        Bq, bud = sel_k.shape[:2]
        zero = jnp.zeros((Bq,), jnp.int32)
        dk = cache_lib.append_at_layer(dk, sel_k.reshape(Bq, bud, -1), zero, l)
        dv = cache_lib.append_at_layer(dv, sel_v.reshape(Bq, bud, -1), zero, l)
        return _flat(ctx), (ck, cv, dk, dv)

    return impl
