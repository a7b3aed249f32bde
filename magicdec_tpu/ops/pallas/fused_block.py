"""Fused decode-block weight matmuls: the decode "megakernel" pair.

Decode steps are WEIGHT-bandwidth-bound (a 1-token step moves ~20 MB of
layer weights against ~kB of activations), but the XLA decode layer runs as
~10 separate fusions (norm, qkv matmul, rope/append, attention, wo matmul,
residual, norm, gate_up matmul, silu-mul, down matmul, residual) whose
per-launch overhead (~3-5 us each through the fused-loop scheduler) is a
material fraction of the ~0.6 ms weights floor at 8L/1024d. The reference
buys the same effect with torch.compile max-autotune + CUDA graphs
(Engine/SnapKV/backend.py:116-125); here the two kernels around the
attention call keep every activation in VMEM and stream the weights once:

  fused_qkv:       qkv = rmsnorm(x) @ wqkv (+bias)
  fused_post_attn: t = x + ctx @ wo;  out = t + swiglu(rmsnorm(t)) @ w_down

Numerics: per ROW the computation is deterministic and independent of the
row count — rows are processed in fixed-size M-blocks and the contraction
splits are fixed by (D, HqD, I) only — so a draft step (T=1) and a verify
step (T=gamma+1) produce BIT-IDENTICAL values for the same token, which the
full-budget acceptance==1.0 invariant requires (prefill keeps the XLA path;
prefill-vs-decode drift is the pre-existing, handled regime — see
attention_impls / spec.py notes). Dtype flow mirrors models/llama.py: bf16
matmul outputs (f32 MXU accumulation), bf16 residual adds, rms_norm
normalized in f32 then cast to the input dtype before the weight multiply
(ops/norms.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fixed row-block: per-row numerics must not depend on the caller's B*T, so
# the M tiling is a constant, not a function of M
M_BLOCK = 512
_VMEM_BUDGET = 48 * 1024 * 1024


def _round_up(n: int, k: int) -> int:
    return -(-n // k) * k


def _pick_block(total: int, target: int) -> int:
    """Largest divisor of `total` <= target, preferring multiples of 128."""
    quantum = 128 if total % 128 == 0 else 8
    assert total % quantum == 0, (total, quantum)
    blk = min(total, max(target - target % quantum, quantum))
    while total % blk:
        blk -= quantum
    return max(blk, quantum)


def _compiler_params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024)


def _rms(xf, n_ref, eps, out_dtype):
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(out_dtype)
    return normed * n_ref[...].reshape(1, -1).astype(out_dtype)


def _qkv_kernel(x_ref, n_ref, w_ref, b_ref, o_ref, *, eps: float,
                has_bias: bool):
    y = _rms(x_ref[...].astype(jnp.float32), n_ref, eps, x_ref.dtype)
    o = jax.lax.dot(y, w_ref[...],
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)
    if has_bias:
        o = o + b_ref[...].reshape(1, -1).astype(o_ref.dtype)
    o_ref[...] = o


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_qkv(x, attn_norm, wqkv, bqkv=None, *, eps: float = 1e-5,
              interpret: bool = False):
    """rmsnorm(x) @ wqkv (+ bqkv). x [M, D], wqkv [D, O] -> [M, O] in
    x.dtype. Grid over (M row-blocks, O column-blocks)."""
    M, D = x.shape
    O = wqkv.shape[1]
    MB = min(_round_up(M, 8), M_BLOCK)
    Mp = _round_up(M, MB)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    # VMEM: x block + norm + 2x double-buffered (w col-block, out block)
    avail = _VMEM_BUDGET - MB * D * 2
    ob_target = max(avail // (2 * 2 * (D + MB) * 2), 128)
    OB = _pick_block(O, min(ob_target, 4096))
    has_bias = bqkv is not None
    if bqkv is None:
        bqkv = jnp.zeros((O,), x.dtype)
    out = pl.pallas_call(
        functools.partial(_qkv_kernel, eps=eps, has_bias=has_bias),
        grid=(Mp // MB, O // OB),
        in_specs=[
            pl.BlockSpec((MB, D), lambda m, i: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda m, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, OB), lambda m, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((OB,), lambda m, i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((MB, OB), lambda m, i: (m, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, O), x.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, attn_norm, wqkv, bqkv)
    return out[:M]


def _post_kernel(x_ref, ctx_ref, wo_ref, n_ref, gu_ref, wd_ref, o_ref,
                 t_scr, h_scr, acc_scr, *, eps: float, n_wo: int,
                 n_ffn: int):
    """Grid (n_m, n_wo + n_ffn): per row-block, phases [0, n_wo) accumulate
    t = x + ctx @ wo over wo row-blocks; phase n_wo-1 finishes the norm;
    phases [n_wo, ...) stream gate_up/down I-blocks, accumulating SwiGLU."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc_scr[...] = x_ref[...].astype(jnp.float32)

    @pl.when(i < n_wo)
    def _wo():
        acc_scr[...] += jax.lax.dot(ctx_ref[...], wo_ref[...],
                                    preferred_element_type=jnp.float32)

    @pl.when(i == n_wo - 1)
    def _norm():
        # residual rounded once to bf16 (mirrors x + qmatmul(ctx, wo)):
        # acc holds x + full wo product in f32
        xf = x_ref[...].astype(jnp.float32)
        t = (xf + (acc_scr[...] - xf).astype(x_ref.dtype)
             .astype(jnp.float32)).astype(x_ref.dtype)
        t_scr[...] = t
        h_scr[...] = _rms(t.astype(jnp.float32), n_ref, eps, t.dtype)
        acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)

    @pl.when(i >= n_wo)
    def _ffn():
        h = h_scr[...]
        gate = jax.lax.dot(h, gu_ref[:, 0],
                           preferred_element_type=jnp.float32)
        up = jax.lax.dot(h, gu_ref[:, 1],
                         preferred_element_type=jnp.float32)
        a = (jax.nn.sigmoid(gate) * gate).astype(h.dtype) \
            * up.astype(h.dtype)
        acc_scr[...] += jax.lax.dot(a, wd_ref[...],
                                    preferred_element_type=jnp.float32)

    @pl.when(i == n_wo + n_ffn - 1)
    def _emit():
        t = t_scr[...]
        o_ref[...] = (t + acc_scr[...].astype(t.dtype)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_post_attn(x, ctx, wo, ffn_norm, w_gate_up, w_down, *,
                    eps: float = 1e-5, interpret: bool = False):
    """t = x + ctx @ wo; out = t + swiglu(rmsnorm(t) @ w_gate_up) @ w_down.

    x [M, D], ctx [M, HqD], wo [HqD, D], w_gate_up [D, 2, I], w_down [I, D]
    -> [M, D] in x.dtype. One pallas_call per layer: wo row-blocks then FFN
    I-blocks stream through VMEM while t/h/acc stay resident in scratch;
    rows processed in fixed M_BLOCK chunks (row-count-independent numerics).
    """
    M, D = x.shape
    HqD = wo.shape[0]
    I = w_down.shape[0]
    MB = min(_round_up(M, 8), M_BLOCK)
    Mp = _round_up(M, MB)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        ctx = jnp.pad(ctx, ((0, Mp - M), (0, 0)))
    # VMEM: persistent x/out + t/h/acc scratch, then 2x double-buffered
    # streamed blocks: (ctx col-block + wo row-block) and (gate_up + down)
    act = MB * D * (2 + 2) + MB * D * (2 + 2 + 4)
    avail = max(_VMEM_BUDGET - act, 4 * 1024 * 1024)
    wb_target = max((avail // 2) // (2 * (MB + D) * 2), 128)
    ib_target = max((avail // 2) // (2 * (2 * D + D) * 2), 128)
    WB = _pick_block(HqD, min(wb_target, 4096))
    IB = _pick_block(I, min(ib_target, 4096))
    n_wo, n_ffn = HqD // WB, I // IB
    kernel = functools.partial(_post_kernel, eps=eps, n_wo=n_wo, n_ffn=n_ffn)

    out = pl.pallas_call(
        kernel,
        grid=(Mp // MB, n_wo + n_ffn),
        in_specs=[
            pl.BlockSpec((MB, D), lambda m, i: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MB, WB),
                         lambda m, i: (m, jnp.minimum(i, n_wo - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, D), lambda m, i: (jnp.minimum(i, n_wo - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda m, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 2, IB),
                         lambda m, i: (0, 0, jnp.clip(i - n_wo, 0,
                                                      n_ffn - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((IB, D),
                         lambda m, i: (jnp.clip(i - n_wo, 0, n_ffn - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((MB, D), lambda m, i: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((MB, D), x.dtype),
            pltpu.VMEM((MB, D), x.dtype),
            pltpu.VMEM((MB, D), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, ctx, wo, ffn_norm, w_gate_up, w_down)
    return out[:M]
