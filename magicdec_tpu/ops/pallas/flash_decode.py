"""Flash-decode: ragged GQA decode attention over the packed KV cache.

TPU-native replacement for the reference's flashinfer
BatchDecodeWithPagedKVCache path (Engine/SnapKV/backend.py:49-107). XLA's
fused attention at decode shapes (tiny query count x huge S) runs far below
HBM roofline (~130 GB/s measured on v5e for B=16, S=8k, GQA 32/8); this
kernel streams K/V blocks HBM->VMEM and keeps the online softmax state
(m, l, acc) in VMEM scratch across the S-block grid walk — standard
flash-decoding.

GQA trick: the cache is packed [S, Hkv*D], and slicing one head's D=64
columns out of a VMEM block costs lane shuffles on every element (measured
44 GB/s). Instead the queries are embedded BLOCK-DIAGONALLY into a dense
[M, Hkv*D] matrix (M = Hkv * T * G rows; row (h, t, g) holds q[t, h*G+g] in
columns h*D..(h+1)*D, zeros elsewhere): one MXU matmul per K block computes
every head's logits with K read exactly once and no data rearrangement, at
the cost of Hkv x redundant FLOPs — irrelevant, the op is bandwidth-bound.
P@V gets the same treatment in reverse; each row's D live columns are
extracted outside the kernel. v5e measured: ~8x over the XLA fused path.

Masking: every caller's valid set is expressible as the union of two slot
intervals [0, a) ∪ [lo, hi) per query row — plain ragged-causal decode uses
(a=0, lo=0, hi=valid_upto); StreamingLLM sink+window uses (a=sink_end,
lo=window_start, hi=causal_end). One mask form = one kernel = bit-identical
numerics between the target/verify path and every draft path, which the
full-budget acceptance==1.0 invariant depends on.

Mask triage (PREFILL kernel): the kernels are jointly MXU/VPU-bound, and at realistic shapes
roughly half the VPU work is mask construction — yet most blocks need no
mask at all (fully inside the valid interval) and blocks past every row's
bound need no COMPUTE at all. Each block's class (0 = all-invalid: skip,
1 = all-valid: no mask, 2 = mixed: build the mask) is a handful of [B, T]
reductions, so it is computed OUTSIDE the kernel and prefetched to SMEM
(in-kernel vector->scalar reductions measured slower than the masks they
saved). The masked path adds a 0/NEG_INF penalty to the logits instead of
two where()s: exp underflows masked columns to exactly 0, and any garbage a
row accumulates before its first valid block is flushed by alpha =
exp(NEG_INF - finite) = 0 — bit-identical to explicit masking (see
tests/test_flash_decode.py).

Serves decode (T=1), verify (T=gamma+1), and prefill chunks (T=128, the
h-grouped flash_prefill below).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _block_classes(a, lo, hi, n_blk: int, s_block: int, s_real: int,
                   cmin=None):
    """Per-(sequence, S-block) mask triage: 0 = every (row, col) invalid,
    1 = every pair valid, 2 = mixed. a/lo/hi [B, T] int32 (mask = col < a or
    lo <= col < hi, identical for every head-expanded row of a sequence);
    cmin [B, n_blk] optional per-block column-mask minima (colmask holes
    disqualify a block from class 1). Returns [B, n_blk] int32.

    Single-block grids get a CONSTANT all-class-2 array instead (triage can
    save nothing there)."""
    if n_blk == 1:
        return jnp.full((a.shape[0], 1), 2, jnp.int32)
    be = (jnp.arange(n_blk, dtype=jnp.int32) + 1) * s_block      # [n]
    bs = be - s_block
    a_mn = jnp.min(a, 1, keepdims=True)
    a_mx = jnp.max(a, 1, keepdims=True)
    lo_mn = jnp.min(lo, 1, keepdims=True)
    lo_mx = jnp.max(lo, 1, keepdims=True)
    hi_mn = jnp.min(hi, 1, keepdims=True)
    hi_mx = jnp.max(hi, 1, keepdims=True)
    full = ((a_mn >= be[None, :])
            | ((lo_mx <= bs[None, :]) & (hi_mn >= be[None, :]))) \
        & (be[None, :] <= s_real)
    if cmin is not None:
        full = full & (cmin > 0)
    empty = (a_mx <= bs[None, :]) & ((hi_mx <= bs[None, :])
                                     | (lo_mn >= be[None, :]))
    return jnp.where(full, 1, jnp.where(empty, 0, 2)).astype(jnp.int32)


def _flash_body(bi, cls, col, a, lo, hi, qd, k_blk, v_blk, o_ref, m_scr,
                l_scr, acc_scr, pen_scr, *, s_real: int, scale: float,
                cleanup: bool, cm_blk=None, s_axis: int = 1, o_idx=None,
                lse_refs=None):
    """One S-block online-softmax update for sub-batch element bi.

    cls: this (sequence, block)'s prefetched triage class (see
    _block_classes). col [M, S_BLK] the block's absolute column indices
    (shared across bi). a/lo/hi [M,1] int32 interval bounds, qd [M,HD],
    k_blk/v_blk [S_BLK,HD]; state in VMEM scratch indexed by bi (the kernels
    process b_block batch elements per grid cell to amortize per-cell grid
    overhead). pen_scr [M, S_BLK] f32 scratch holding the 0/NEG_INF logit
    penalty (rebuilt per bi; class-1 blocks splat zeros instead of building
    the mask).

    cm_blk [1, S_BLK] int32 (optional): per-COLUMN validity bits ANDed into
    the interval mask — the round-buffer draft caches of the
    quest/retro/squeeze engines have pad/dedup holes in their gathered
    region that no interval pair can express.

    cleanup (static): only when the S-grid's final block extends past the
    true array bound s_real can v_blk contain undefined memory; masked
    columns get probability exactly 0, but IEEE 0 * NaN = NaN would poison
    the P@V matmul, so out-of-range V rows are zeroed. (K needs no cleanup:
    garbage logits get the NEG_INF penalty before max/exp, since the bounds
    never exceed s_real.)
    """
    sblk = pl.program_id(s_axis)
    n_sblk = pl.num_programs(s_axis)

    @pl.when(sblk == 0)
    def _init():
        m_scr[bi] = jnp.full(m_scr.shape[1:], NEG_INF, m_scr.dtype)
        l_scr[bi] = jnp.zeros(l_scr.shape[1:], l_scr.dtype)
        acc_scr[bi] = jnp.zeros(acc_scr.shape[1:], acc_scr.dtype)

    @pl.when(cls > 0)
    def _run():
        @pl.when(cls == 1)
        def _pen_clear():
            pen_scr[...] = jnp.zeros(pen_scr.shape, pen_scr.dtype)

        @pl.when(cls != 1)
        def _pen_build():
            mask = (col < a) | ((col >= lo) & (col < hi))    # [M, S_BLK]
            if cm_blk is not None:
                mask = mask & (cm_blk > 0)  # cm_blk [1, S_BLK] broadcasts
            pen_scr[...] = jnp.where(mask, 0.0, NEG_INF).astype(pen_scr.dtype)

        k, v = k_blk, v_blk
        if cleanup:
            row = (sblk * v_blk.shape[0]
                   + jax.lax.broadcasted_iota(jnp.int32,
                                              (v_blk.shape[0], 1), 0))
            # K too: unlike the old explicit where()-mask, the penalty ADD
            # does not neutralize NaN garbage (NaN + NEG_INF = NaN)
            k = jnp.where(row < s_real, k, jnp.zeros_like(k))
            v = jnp.where(row < s_real, v, jnp.zeros_like(v))
        # precision pinned: an ambient default_matmul_precision("highest")
        # (training contexts) would ask Mosaic for a 3-pass bf16 matmul it
        # cannot emit ("Bad lhs type"); the kernel owns its numerics
        s = jax.lax.dot_general(qd, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT) * scale
        s = s + pen_scr[...]
        m_old = m_scr[bi]                                    # [M, 1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(s - m_new)                               # [M, S_BLK]
        m_scr[bi] = m_new
        l_scr[bi] = l_scr[bi] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)
        acc_scr[bi] = acc_scr[bi] * alpha + pv               # [M, Hkv*D]

    @pl.when(sblk == n_sblk - 1)
    def _finish():
        idx = (bi,) if o_idx is None else o_idx
        o_ref[idx] = (acc_scr[bi] / l_scr[bi]).astype(o_ref.dtype)
        if lse_refs is not None:
            lse_refs[0][idx] = m_scr[bi]
            lse_refs[1][idx] = l_scr[bi]


def _block_col(M: int, S_BLK: int, s_axis: int):
    sblk = pl.program_id(s_axis)
    return (sblk * S_BLK
            + jax.lax.broadcasted_iota(jnp.int32, (M, S_BLK), 1))


def _flash_body_inline(bi, a, lo, hi, qd, k_blk, v_blk, o_ref, m_scr, l_scr,
                       acc_scr, *, s_real: int, scale: float, cm_blk=None,
                       s_axis: int = 1, o_idx=None, lse_refs=None):
    """Inline-masked online-softmax block update — the DECODE kernels' body.

    The prefill body (_flash_body) triages blocks via prefetched classes and
    a penalty scratch, a measured win at chunk sizes (most blocks are fully
    valid); at decode shapes the same structure measured ~10% SLOWER inside
    the fused generation loops (the pen VMEM round-trip and the extra launch
    dependency outweigh the saved mask passes), so decode keeps the
    straight-line masked body. The two bodies are numerically bit-identical
    (see _flash_body's flush argument), which the full-budget
    acceptance==1.0 invariant relies on when prefill and decode mix.
    """
    sblk = pl.program_id(s_axis)
    n_sblk = pl.num_programs(s_axis)
    S_BLK = k_blk.shape[0]
    M = qd.shape[0]

    @pl.when(sblk == 0)
    def _init():
        m_scr[bi] = jnp.full(m_scr.shape[1:], NEG_INF, m_scr.dtype)
        l_scr[bi] = jnp.zeros(l_scr.shape[1:], l_scr.dtype)
        acc_scr[bi] = jnp.zeros(acc_scr.shape[1:], acc_scr.dtype)

    col = sblk * S_BLK + jax.lax.broadcasted_iota(jnp.int32, (M, S_BLK), 1)
    mask = (col < a) | ((col >= lo) & (col < hi))        # [M, S_BLK]
    if cm_blk is not None:
        mask = mask & (cm_blk > 0)          # cm_blk [1, S_BLK] broadcasts
    row = sblk * S_BLK + jax.lax.broadcasted_iota(jnp.int32, (S_BLK, 1), 0)
    v_blk = jnp.where(row < s_real, v_blk, jnp.zeros_like(v_blk))

    s = jax.lax.dot_general(qd, k_blk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT) * scale
    s = jnp.where(mask, s, NEG_INF)
    m_old = m_scr[bi]                                    # [M, 1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)         # [M, S_BLK]
    m_scr[bi] = m_new
    l_scr[bi] = l_scr[bi] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v_blk.dtype), v_blk,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
    acc_scr[bi] = acc_scr[bi] * alpha + pv               # [M, Hkv*D]

    @pl.when(sblk == n_sblk - 1)
    def _finish():
        idx = (bi,) if o_idx is None else o_idx
        o_ref[idx] = (acc_scr[bi] / l_scr[bi]).astype(o_ref.dtype)
        if lse_refs is not None:
            lse_refs[0][idx] = m_scr[bi]
            lse_refs[1][idx] = l_scr[bi]


def _kernel(a_ref, lo_ref, hi_ref, qd_ref, k_ref, v_ref, *rest,
            s_real: int, scale: float):
    *outs, m_scr, l_scr, acc_scr = rest
    lse = tuple(outs[1:]) or None
    for bi in range(qd_ref.shape[0]):                    # static unroll
        _flash_body_inline(bi, a_ref[bi], lo_ref[bi], hi_ref[bi], qd_ref[bi],
                           k_ref[bi], v_ref[bi], outs[0], m_scr, l_scr,
                           acc_scr, s_real=s_real, scale=scale, lse_refs=lse)


def _kernel_stacked(l_ref, a_ref, lo_ref, hi_ref, qd_ref, k_ref,
                    v_ref, *rest, s_real: int, scale: float):
    """Stacked k/v blocks arrive as [1, b_block, s_block, HD] (layer picked
    by the scalar-prefetch index_map)."""
    del l_ref
    *outs, m_scr, l_scr, acc_scr = rest
    lse = tuple(outs[1:]) or None
    for bi in range(qd_ref.shape[0]):
        _flash_body_inline(bi, a_ref[bi], lo_ref[bi], hi_ref[bi], qd_ref[bi],
                           k_ref[0, bi], v_ref[0, bi], outs[0], m_scr, l_scr,
                           acc_scr, s_real=s_real, scale=scale, lse_refs=lse)


def _pick_s_block(S: int, target: int) -> int:
    """Block size must be a GLOBAL constant (same for every cache size):
    the full-budget acceptance==1.0 invariant needs the draft-path and
    verify-path online softmax to chunk the shared data at identical slot
    boundaries, so per-S divisor-seeking is not allowed. Unbalanced partial
    tail blocks pipeline poorly (measured ~25% bandwidth at s_block=1024 on
    S=1152 v5e), so the default target is a moderate 512."""
    return min(target, _round_up(S, 8))


def _pick_b_block(B: int, s_block: int, HD: int, itemsize: int = 2,
                  vmem_budget: int = 8 * 1024 * 1024, M: int = 0) -> int:
    """Sub-batch per grid cell: as many b as keep the double-buffered K+V
    blocks (plus, for prefill-sized M, the q/out/accumulator buffers) within
    the VMEM budget, and dividing B evenly."""
    per_b = s_block * HD * itemsize * 4          # k+v, double-buffered
    # qd + out (bf16) + f32 acc scratch; negligible at decode M but decisive
    # for prefill chunks (M = Hkv * T * G reaches thousands of rows)
    per_b += M * HD * (2 * itemsize + 4)
    # NB: only the decode kernels (_flash_body_inline, no penalty scratch)
    # call this; flash_prefill sizes its own BB including pen_scr
    b = max(1, min(16, vmem_budget // max(per_b, 1)))
    while B % b:
        b -= 1
    return b


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _needs_cleanup(s_extent: int, s_block: int, S: int) -> bool:
    return pl.cdiv(s_extent, s_block) * s_block > S


def _embed_q(q, Hkv, G, D):
    """[B,T,Hq,D] -> block-diagonal [B, M, HD] plus (TG, TG_pad, eye)."""
    B, T = q.shape[:2]
    TG = T * G
    TG_pad = _round_up(max(TG, 8), 8)
    q_r = q.reshape(B, T, Hkv, G, D).transpose(0, 2, 1, 3, 4)
    q_r = q_r.reshape(B, Hkv, TG, D)
    if TG_pad != TG:
        q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, TG_pad - TG), (0, 0)))
    eye = jnp.eye(Hkv, dtype=q.dtype)
    qd = jnp.einsum("bhtd,hj->bhtjd", q_r, eye).reshape(B, Hkv * TG_pad,
                                                        Hkv * D)
    return qd, TG, TG_pad, eye


def _expand_rows(x, G, TG, TG_pad, Hkv):
    """Per-query [B, T] int32 -> per-kernel-row [B, M, 1]. Padded rows
    replicate the last real row's bound (edge padding): their output is
    discarded, but constant-padded bounds would defeat the block triage
    (_block_classes assumes every row's bounds lie within the sequence's
    [min, max] over real query positions)."""
    x = jnp.repeat(x, G, axis=1)
    if TG_pad != TG:
        x = jnp.pad(x, ((0, 0), (0, TG_pad - TG)), mode="edge")
    return jnp.tile(x, (1, Hkv))[:, :, None]


def _extract_out(out, B, T, Hkv, G, D, TG, TG_pad, eye):
    out = out.reshape(B, Hkv, TG_pad, Hkv, D)
    out = jnp.einsum("bhtjd,hj->bhtd", out, eye.astype(out.dtype))
    out = out[:, :, :TG].reshape(B, Hkv, T, G, D).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, T, Hkv * G, D)


def _extract_lse(x, B, T, Hkv, G, TG, TG_pad):
    """Kernel-row [B, M, 1] -> per-query-head [B, T, Hq] (row (h, t, g) is
    head h*G+g at position t)."""
    x = x.reshape(B, Hkv, TG_pad)[:, :, :TG].reshape(B, Hkv, T, G)
    return x.transpose(0, 2, 1, 3).reshape(B, T, Hkv * G)


@functools.partial(jax.jit,
                   static_argnames=("s_block", "interpret", "return_lse"))
def flash_decode_intervals(q, k_cache, v_cache, sink_end, lo, hi, *,
                           s_block: int = 512, interpret: bool = False,
                           return_lse: bool = False):
    """General two-interval flash decode (flat cache).

    Args:
      q: [B, T, Hq, D] rotated queries.
      k_cache, v_cache: [B, S, Hkv*D] packed.
      sink_end, lo, hi: [B, T] int32 — query (b, t) attends to slots in
        [0, sink_end) ∪ [lo, hi).
      return_lse: also return the online-softmax state (m, l) [B, T, Hq] f32
        for a split-attention merge (ops/attention.merge_lse).
    """
    B, T, Hq, D = q.shape
    S, HD = k_cache.shape[1], k_cache.shape[2]
    if q.dtype != k_cache.dtype:
        q = q.astype(k_cache.dtype)   # Mosaic rejects mixed-dtype matmuls
    Hkv = HD // D
    G = Hq // Hkv
    qd, TG, TG_pad, eye = _embed_q(q, Hkv, G, D)
    M = Hkv * TG_pad
    s_block = _pick_s_block(S, s_block)
    BB = _pick_b_block(B, s_block, HD)
    # padded rows replicate the last real row's bounds (finite softmax);
    # their output columns are discarded by _extract_out
    a_r = _expand_rows(sink_end, G, TG, TG_pad, Hkv)
    lo_r = _expand_rows(lo, G, TG, TG_pad, Hkv)
    hi_r = _expand_rows(hi, G, TG, TG_pad, Hkv)

    row_spec = pl.BlockSpec((BB, M, 1), lambda b, s: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct((B, M, HD), q.dtype),) + (
        jax.ShapeDtypeStruct((B, M, 1), jnp.float32),) * (2 * return_lse)
    out = pl.pallas_call(
        functools.partial(_kernel, s_real=S, scale=D ** -0.5),
        grid=(B // BB, pl.cdiv(S, s_block)),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec((BB, M, HD), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, s_block, HD), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, s_block, HD), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            (pl.BlockSpec((BB, M, HD), lambda b, s: (b, 0, 0),
                          memory_space=pltpu.VMEM),)
            + (row_spec, row_spec) * return_lse),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BB, M, 1), jnp.float32),
            pltpu.VMEM((BB, M, 1), jnp.float32),
            pltpu.VMEM((BB, M, HD), jnp.float32),
        ],
        interpret=interpret,
    )(a_r, lo_r, hi_r, qd, k_cache, v_cache)
    ctx = _extract_out(out[0], B, T, Hkv, G, D, TG, TG_pad, eye)
    if not return_lse:
        return ctx
    return (ctx, _extract_lse(out[1], B, T, Hkv, G, TG, TG_pad),
            _extract_lse(out[2], B, T, Hkv, G, TG, TG_pad))


@functools.partial(jax.jit, static_argnames=("s_block", "interpret"))
def flash_decode(q, k_cache, v_cache, valid_upto, *, s_block: int = 512,
                 interpret: bool = False):
    """Ragged-causal flash decode (flat cache): query (b, t) attends to
    slots < valid_upto[b, t]."""
    zero = jnp.zeros_like(valid_upto)
    return flash_decode_intervals(q, k_cache, v_cache, zero, zero, valid_upto,
                                  s_block=s_block, interpret=interpret)


def flash_decode_attend(q, k, v, valid_upto, *, interpret: bool = False):
    """Adapter with the dense.masked_attention signature: k/v arrive unpacked
    [B, S, Hkv, D] from the attention impls — reshape back to packed (free)."""
    B, S, Hkv, D = k.shape
    return flash_decode(q, k.reshape(B, S, Hkv * D), v.reshape(B, S, Hkv * D),
                        valid_upto, interpret=interpret)


# ---------------------------------------------------------------------------
# Stacked-cache variant: read one layer of [L, B, S, HD] directly from HBM
# ---------------------------------------------------------------------------
# The model scans over layers with the FULL cache as an in-place carry
# (models/llama.py run_layers). Slicing cache[l] on the host side would
# materialize a layer-sized copy as the kernel operand; instead the traced
# layer index arrives as a scalar-prefetch argument and the BlockSpec
# index_map picks blocks straight out of the stacked array.


@functools.partial(jax.jit,
                   static_argnames=("s_block", "interpret", "s_cap",
                                    "return_lse"))
def flash_decode_stacked(q, k_cache, v_cache, layer, valid_upto, *,
                         s_block: int = 512, interpret: bool = False,
                         s_cap: int | None = None, return_lse: bool = False):
    """As flash_decode, but k_cache/v_cache are stacked [L, B, S, Hkv*D] and
    `layer` (traced int32 scalar) selects the layer without a copy.

    s_cap (static) bounds the attended slot range: the S-grid walks only the
    blocks below the cap, so chunked-prefill callers neither fetch nor
    compute over the whole max_len cache (callers guarantee
    valid_upto <= s_cap).
    """
    B, T, Hq, D = q.shape
    L, _, S, HD = k_cache.shape
    if q.dtype != k_cache.dtype:
        q = q.astype(k_cache.dtype)   # Mosaic rejects mixed-dtype matmuls
    Hkv = HD // D
    G = Hq // Hkv
    qd, TG, TG_pad, eye = _embed_q(q, Hkv, G, D)
    M = Hkv * TG_pad
    s_block = _pick_s_block(S, s_block)
    BB = _pick_b_block(B, s_block, HD, M=M)
    s_extent = S if s_cap is None else min(max(s_cap, s_block), S)
    zero = jnp.zeros_like(valid_upto)
    a_r = _expand_rows(zero, G, TG, TG_pad, Hkv)
    lo_r = _expand_rows(zero, G, TG, TG_pad, Hkv)
    hi_r = _expand_rows(valid_upto, G, TG, TG_pad, Hkv)

    row_spec = pl.BlockSpec((BB, M, 1), lambda b, s, l_ref: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // BB, pl.cdiv(s_extent, s_block)),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec((BB, M, HD), lambda b, s, l_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, s_block, HD),
                         lambda b, s, l_ref: (l_ref[0], b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, s_block, HD),
                         lambda b, s, l_ref: (l_ref[0], b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            (pl.BlockSpec((BB, M, HD),
                          lambda b, s, l_ref: (b, 0, 0),
                          memory_space=pltpu.VMEM),)
            + (row_spec, row_spec) * return_lse),
        scratch_shapes=[
            pltpu.VMEM((BB, M, 1), jnp.float32),
            pltpu.VMEM((BB, M, 1), jnp.float32),
            pltpu.VMEM((BB, M, HD), jnp.float32),
        ],
    )
    out_shape = (jax.ShapeDtypeStruct((B, M, HD), q.dtype),) + (
        jax.ShapeDtypeStruct((B, M, 1), jnp.float32),) * (2 * return_lse)
    out = pl.pallas_call(
        functools.partial(_kernel_stacked, s_real=S, scale=D ** -0.5),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), a_r, lo_r, hi_r, qd,
      k_cache, v_cache)
    ctx = _extract_out(out[0], B, T, Hkv, G, D, TG, TG_pad, eye)
    if not return_lse:
        return ctx
    return (ctx, _extract_lse(out[1], B, T, Hkv, G, TG, TG_pad),
            _extract_lse(out[2], B, T, Hkv, G, TG, TG_pad))


# ---------------------------------------------------------------------------
# Prefill kernel: h-grouped flash attention over the packed stacked cache
# ---------------------------------------------------------------------------
# The decode kernels embed queries block-diagonally over ALL Hkv heads —
# right for bandwidth-bound decode (K read once, Hkv x redundant FLOPs
# irrelevant), wrong for compute-relevant prefill chunks. Here heads are
# processed in GROUPS of 2 KV heads: the block-diagonal embedding within a
# group gives contraction depth 2*D = 128 (the MXU's full systolic depth)
# at only 2x FLOP redundancy, the K/V BlockSpec column-blocks the packed
# cache so each group's columns are read exactly once, and the whole
# 128-token chunk rides one q-block (no VMEM blowup: the group's q is
# [hg*T*G, 128]).


def _kernel_prefill(l_ref, cls_ref, fetch_ref, rows_ref, qd_ref, k_ref, v_ref,
                    o_ref, m_scr, l_scr, acc_scr, pen_scr, *, s_real: int,
                    scale: float, cleanup: bool):
    """Grid (B//BB, n_groups, n_s): qd_ref [BB, 1, Mg, HDg], k/v
    [1, BB, s_block, HDg] (columns of group g), rows [BB, Mg, 3] packing
    (a, lo, hi) in one operand (three separate [Mg, 1] operands each pad to
    128 lanes — 3x the VMEM for the same bits) shared across groups.

    fetch_ref [B//BB, n_s] (scalar-prefetch) is consumed by the K/V
    index_maps, not here: where a whole sub-batch's block is class 0 it
    repeats the previous needed block's index, and Pallas's pipeline only
    issues a copy when the block index CHANGES — the skipped blocks then
    cost neither compute (cls==0 below) nor HBM traffic."""
    del l_ref, fetch_ref
    BB, _, Mg = qd_ref.shape[0], qd_ref.shape[1], qd_ref.shape[2]
    b0 = pl.program_id(0) * BB
    col = _block_col(Mg, k_ref.shape[2], 2)
    for bi in range(BB):
        rows = rows_ref[bi]
        _flash_body(bi, cls_ref[b0 + bi, pl.program_id(2)], col,
                    rows[:, 0:1], rows[:, 1:2], rows[:, 2:3],
                    qd_ref[bi, 0],
                    k_ref[0, bi], v_ref[0, bi], o_ref, m_scr, l_scr, acc_scr,
                    pen_scr, s_real=s_real, scale=scale, cleanup=cleanup,
                    s_axis=2, o_idx=(bi, 0))


@functools.partial(jax.jit,
                   static_argnames=("s_block", "interpret", "s_cap",
                                    "hg_size", "vmem_budget"))
def flash_prefill(q, k_cache, v_cache, layer, valid_upto, *,
                  s_block: int = 512, interpret: bool = False,
                  s_cap: int | None = None, hg_size: int = 2,
                  vmem_budget: int = 8 * 1024 * 1024):
    """Chunked-prefill flash attention over the stacked packed cache.

    q [B, T, Hq, D] (T = the prefill chunk, rotated), k_cache/v_cache
    [L, B, S, Hkv*D], layer a traced scalar, valid_upto [B, T] causal
    bounds, s_cap the static power-of-2 attention bound (the S-grid stops
    there). Replaces the reference's flashinfer paged prefill
    (Engine/SnapKV/backend.py:55).
    """
    B, T, Hq, D = q.shape
    L, _, S, HD = k_cache.shape
    if q.dtype != k_cache.dtype:
        q = q.astype(k_cache.dtype)   # Mosaic rejects mixed-dtype matmuls
    Hkv = HD // D
    G = Hq // Hkv
    hg = min(hg_size, Hkv)
    ngroups = Hkv // hg
    TG = T * G
    TG_pad = _round_up(max(TG, 8), 8)
    Mg = hg * TG_pad
    HDg = hg * D

    # per-group block-diagonal embedding: row (h_in_group, t, g) carries
    # q[t, group*hg*G + h_in_group*G + g] in columns h_in_group*D..(+D)
    q_r = q.reshape(B, T, ngroups, hg, G, D).transpose(0, 2, 3, 1, 4, 5)
    q_r = q_r.reshape(B, ngroups, hg, TG, D)
    if TG_pad != TG:
        q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, 0), (0, TG_pad - TG),
                            (0, 0)))
    eye = jnp.eye(hg, dtype=q.dtype)
    qd = jnp.einsum("bnhtd,hj->bnhtjd", q_r, eye)
    qd = qd.reshape(B, ngroups, Mg, HDg)

    s_block = _pick_s_block(S, s_block)
    s_extent = S if s_cap is None else min(max(s_cap, s_block), S)
    n_sblk = pl.cdiv(s_extent, s_block)
    # VMEM per cell ~ BB*(qd + out + f32 acc + 2x double-buffered K/V cols
    # + the packed [Mg, 3] bound-row operand, which pads to 128 lanes)
    per_b = (s_block * HDg * 2 * 4) + Mg * HDg * (2 * 2 + 4) \
        + Mg * 128 * 4 * 2
    BB = max(1, min(16, (vmem_budget - Mg * s_block * 4) // per_b))
    while B % BB:
        BB -= 1
    # Mosaic's default scoped-VMEM limit is 16 MB; budgets above the default
    # deliberately trade more (the chip has 128 MB) for bigger grid cells
    compiler_params = None
    if vmem_budget > 8 * 1024 * 1024:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * vmem_budget + 8 * 1024 * 1024,
                                 100 * 1024 * 1024))

    zero = jnp.zeros_like(valid_upto)
    a_r = _expand_rows(zero, G, TG, TG_pad, hg)
    lo_r = _expand_rows(zero, G, TG, TG_pad, hg)
    hi_r = _expand_rows(valid_upto, G, TG, TG_pad, hg)
    rows = jnp.concatenate([a_r, lo_r, hi_r], axis=2)        # [B, Mg, 3]
    cls = _block_classes(zero, zero, valid_upto, n_sblk, s_block, S)
    # DMA-skip map: for each (sub-batch row of the grid, s) the block index
    # the K/V index_maps should fetch — s itself when ANY sequence in the
    # sub-batch needs the block, else the last needed index before it (a
    # repeated index makes the pipeline skip the copy; the kernel does no
    # compute there, so the stale VMEM contents are never read)
    need = (cls.reshape(B // BB, BB, n_sblk) > 0).any(axis=1)
    blk_idx = jnp.arange(n_sblk, dtype=jnp.int32)[None, :]
    fetch = jnp.maximum(
        jax.lax.cummax(jnp.where(need, blk_idx, -1), axis=1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // BB, ngroups, n_sblk),
        in_specs=[
            pl.BlockSpec((BB, Mg, 3),
                         lambda b, g, s, l_ref, c_ref, f_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, Mg, HDg),
                         lambda b, g, s, l_ref, c_ref, f_ref: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, s_block, HDg),
                         lambda b, g, s, l_ref, c_ref, f_ref:
                         (l_ref[0], b, f_ref[b, s], g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, s_block, HDg),
                         lambda b, g, s, l_ref, c_ref, f_ref:
                         (l_ref[0], b, f_ref[b, s], g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, 1, Mg, HDg),
                               lambda b, g, s, l_ref, c_ref, f_ref:
                               (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BB, Mg, 1), jnp.float32),
            pltpu.VMEM((BB, Mg, 1), jnp.float32),
            pltpu.VMEM((BB, Mg, HDg), jnp.float32),
            pltpu.VMEM((Mg, s_block), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_prefill, s_real=S, scale=D ** -0.5,
                          cleanup=_needs_cleanup(s_extent, s_block, S)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, ngroups, Mg, HDg), q.dtype),
        interpret=interpret,
        **({"compiler_params": compiler_params} if compiler_params else {}),
    )(jnp.asarray(layer, jnp.int32).reshape(1), cls, fetch, rows, qd,
      k_cache, v_cache)
    # extract: [B, n, Mg, HDg] -> [B, n, hg, TG_pad, hg, D] -> diag over hg
    out = out.reshape(B, ngroups, hg, TG_pad, hg, D)
    out = jnp.einsum("bnhtjd,hj->bnhtd", out, eye.astype(out.dtype))
    out = out[:, :, :, :TG].reshape(B, ngroups, hg, T, G, D)
    out = out.transpose(0, 3, 1, 2, 4, 5).reshape(B, T, Hq, D)
    return out


# ---------------------------------------------------------------------------
# Stacked + column-masked variant: the round-buffer draft caches
# ---------------------------------------------------------------------------


def _kernel_stacked_cm(l_ref, a_ref, lo_ref, hi_ref, qd_ref, cm_ref,
                       k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                       *, s_real: int, scale: float):
    del l_ref
    for bi in range(qd_ref.shape[0]):
        _flash_body_inline(bi, a_ref[bi], lo_ref[bi], hi_ref[bi], qd_ref[bi],
                           k_ref[0, bi], v_ref[0, bi], o_ref, m_scr, l_scr,
                           acc_scr, s_real=s_real, scale=scale,
                           cm_blk=cm_ref[0, bi])


@functools.partial(jax.jit, static_argnames=("s_block", "interpret"))
def flash_decode_stacked_masked(q, k_cache, v_cache, layer, colmask,
                                sink_end, lo, hi, *, s_block: int = 512,
                                interpret: bool = False):
    """Stacked-cache flash decode with two-interval row bounds AND a
    per-(layer, b, column) validity mask.

    Serves the quest/retro/squeeze ROUND-BUFFER draft caches: columns
    [0, NS) hold gathered pages/clusters (pad and window-dedup holes ->
    colmask bits), columns [NS, R) the incrementally-maintained tail whose
    causality the (lo, hi) interval expresses. Callers pass
    sink_end = lo = NS and hi = NS + tail_causal_bound.

    q [B, T, Hq, D]; k_cache/v_cache [L, B, R, Hkv*D]; layer traced scalar;
    colmask [L, B, 1, R] int32 (nonzero = attendable; the singleton axis
    keeps TPU block shapes legal); sink_end/lo/hi [B, T].
    """
    B, T, Hq, D = q.shape
    L, _, S, HD = k_cache.shape
    if q.dtype != k_cache.dtype:
        q = q.astype(k_cache.dtype)   # Mosaic rejects mixed-dtype matmuls
    Hkv = HD // D
    G = Hq // Hkv
    qd, TG, TG_pad, eye = _embed_q(q, Hkv, G, D)
    M = Hkv * TG_pad
    s_block = _pick_s_block(S, s_block)
    BB = _pick_b_block(B, s_block, HD)
    a_r = _expand_rows(sink_end, G, TG, TG_pad, Hkv)
    lo_r = _expand_rows(lo, G, TG, TG_pad, Hkv)
    hi_r = _expand_rows(hi, G, TG, TG_pad, Hkv)

    row_spec = pl.BlockSpec((BB, M, 1), lambda b, s, l_ref: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // BB, pl.cdiv(S, s_block)),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec((BB, M, HD), lambda b, s, l_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1, s_block),
                         lambda b, s, l_ref: (l_ref[0], b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, s_block, HD),
                         lambda b, s, l_ref: (l_ref[0], b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, s_block, HD),
                         lambda b, s, l_ref: (l_ref[0], b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, M, HD),
                               lambda b, s, l_ref: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BB, M, 1), jnp.float32),
            pltpu.VMEM((BB, M, 1), jnp.float32),
            pltpu.VMEM((BB, M, HD), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_stacked_cm, s_real=S, scale=D ** -0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, M, HD), q.dtype),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), a_r, lo_r, hi_r, qd,
      jnp.asarray(colmask, jnp.int32), k_cache, v_cache)
    return _extract_out(out, B, T, Hkv, G, D, TG, TG_pad, eye)
