"""Weight-only quantization: int8 (per-channel) and int4 (group-wise).

Capability parity with the reference's WeightOnlyInt8QuantHandler /
WeightOnlyInt8Linear (Engine/quantize.py:7-87: symmetric per-output-channel
int8, dequantized inside forward), extended with int4 group-wise scales (the
north-star "int8/int4 weight-only with dequant fused into matmuls").

TPU-native shape: instead of swapping nn.Module classes at load time, a
quantized weight is a pytree dict ({"q": int8, "s": f32 scales} or
{"q4": nibble-packed int8, "s4": group scales}) whose leaves carry the same
leading layer axis as the plain weights, so the model's layer scan slices
them like any other parameter; models/llama.py's matmul helper (qmatmul)
dequantizes inline. For int8 XLA fuses the cast into the matmul and the
per-output-channel scale into the epilogue, so HBM traffic is the int8
bytes — the entire point, decode being weight-bandwidth-bound. int4 v1
materializes the unpacked operand (storage halved; traffic not yet — a fused
Pallas dequant-matmul is the planned follow-up).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass, data_fields=["q4", "s4"],
         meta_fields=["in_axis", "group_size"])
@dataclass
class Int4Weight:
    """Nibble-packed int4 weight. in_axis is NEGATIVE (so it indexes the same
    contraction axis whether the leading layer axis is present or already
    scan-sliced away); the pack axis of q4 is in_axis with half the length."""
    q4: jax.Array
    s4: jax.Array
    in_axis: int
    group_size: int


def quantize_int8(w: jax.Array, reduce_axes: tuple) -> dict:
    """Symmetric int8 with scales over `reduce_axes` (the contraction axes),
    keepdims so the scale broadcasts against the matmul output by trailing
    alignment after the leading layer axis is scan-sliced away."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -128, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.float32)}


def dequantize_int8(qw: dict, dtype=jnp.bfloat16) -> jax.Array:
    return (qw["q"].astype(jnp.float32) * qw["s"]).astype(dtype)


def quantize_int4(w: jax.Array, in_axis: int, group_size: int = 128
                  ) -> Int4Weight:
    """Group-wise symmetric int4 along the contraction axis `in_axis` (must
    be negative); nibble pairs packed into one int8 along that axis (even
    index -> low nibble)."""
    assert in_axis < 0, "in_axis must be negative (layer-axis agnostic)"
    K = w.shape[in_axis]
    assert K % group_size == 0 and group_size % 2 == 0, (K, group_size)
    wf = jnp.moveaxis(w.astype(jnp.float32), in_axis, -2)   # [..., K, out]
    lead, out = wf.shape[:-2], wf.shape[-1]
    grouped = wf.reshape(*lead, K // group_size, group_size, out)
    absmax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0                  # [..., G, 1, out]
    q = jnp.clip(jnp.round(grouped / scale), -8, 7).astype(jnp.int8)
    q = q.reshape(*lead, K, out)
    packed = ((q[..., 1::2, :].astype(jnp.uint8) & 0xF) << 4
              | (q[..., 0::2, :].astype(jnp.uint8) & 0xF)).astype(jnp.int8)
    packed = jnp.moveaxis(packed, -2, in_axis)
    scale = jnp.moveaxis(scale.squeeze(-2), -2, in_axis)     # groups on in_axis
    return Int4Weight(q4=packed, s4=scale.astype(jnp.float32),
                      in_axis=in_axis, group_size=group_size)


def dequantize_int4(qw: Int4Weight, dtype=jnp.bfloat16) -> jax.Array:
    in_axis, g = qw.in_axis, qw.group_size
    packed = jnp.moveaxis(qw.q4, in_axis, -2)
    s4 = jnp.moveaxis(qw.s4, in_axis, -2)
    lead, K2, out = packed.shape[:-2], packed.shape[-2], packed.shape[-1]
    lo = jnp.left_shift(packed, 4) >> 4                      # sign-extend
    hi = packed >> 4
    q = jnp.stack([lo, hi], axis=-2)                         # [..., K//2, 2, out]
    q = q.reshape(*lead, K2 * 2, out).astype(jnp.float32)
    grouped = q.reshape(*lead, (K2 * 2) // g, g, out)
    wf = (grouped * s4[..., :, None, :]).reshape(*lead, K2 * 2, out)
    return jnp.moveaxis(wf, -2, in_axis).astype(dtype)


@partial(jax.tree_util.register_dataclass, data_fields=["q4", "s4"],
         meta_fields=["out_shape"])
@dataclass
class Int4ColWeight:
    """Column-pair nibble packing for the fused Pallas dequant-matmul
    (ops/pallas/int4_matmul.py): q4 [(L,) K, N/2] int8, s4 [(L,) K/g, N]
    f32; out_shape the matmul output trailing shape (e.g. (2, I) for the
    stacked gate/up weight, whose [D, 2, I] collapses to [D, 2I])."""
    q4: jax.Array
    s4: jax.Array
    out_shape: tuple


def quantize_int4_cols(w: jax.Array, in_axis: int,
                       group_size: int = 128) -> Int4ColWeight:
    """Layer-stacked weight [L, ..in/out..] -> Int4ColWeight (kernel layout).
    in_axis NEGATIVE; trailing axes after it collapse into one output dim."""
    from magicdec_tpu.ops.pallas.int4_matmul import pack_int4_cols

    lead = w.shape[:w.ndim + in_axis]
    K = w.shape[in_axis]
    out_shape = w.shape[w.ndim + in_axis + 1:]
    w2 = w.reshape(*lead, K, -1)
    q4, s4 = pack_int4_cols(w2, group_size=group_size)
    return Int4ColWeight(q4=q4, s4=s4, out_shape=tuple(out_shape))


_QUANT_SPECS = {  # weight name -> contraction axis, NEGATIVE (layer-agnostic)
    "wqkv": -2,        # [L, D, O]
    "wo": -2,          # [L, HqD, D]
    "w_gate_up": -3,   # [L, D, 2, I]
    "w_down": -2,      # [L, I, D]
}


def quantize_params(params: dict, mode: str = "int8") -> dict:
    """Quantize the layer matmul weights of a params pytree (embeddings,
    norms and lm_head stay high-precision, as in the reference where only
    nn.Linear weights are swapped). mode: "int8" | "int4"."""
    assert mode in ("int8", "int4"), mode
    out = dict(params)
    layers = dict(params["layers"])
    for name, axis in _QUANT_SPECS.items():
        w = layers[name]
        if mode == "int8":
            qw = quantize_int8(w, reduce_axes=(axis,))
            # store TRANSPOSED-folded: [L, prod(out), K]. XLA's s8 matmul
            # operand layout is K-on-lanes ({1,2,0:T(8,128)(4,1)}): keeping
            # the default [L, K, out] storage makes every program open with a
            # full-weight relayout copy as an HLO temp — measured 4.25 GB at
            # llama-3.1-8b (copy.19/copy.20 in the OOM dump), pushing the
            # 15.75 GB chip over capacity at compile time. [L, N, K] with the
            # default major-to-minor layout IS the layout the dot wants (K
            # minor on lanes, N on sublanes), so the copies vanish. Folding
            # the trailing output axes (gate_up [L,D,2,I] -> N=2I) also kills
            # the size-2-axis pad (2->4 under T(4,128), a 2x expansion). The
            # scale keeps the true trailing shape; qmatmul unfolds the output.
            q = qw["q"]
            lead = q.shape[:q.ndim + axis]
            q = q.reshape(*lead, q.shape[q.ndim + axis], -1)
            qw = {"qT": jnp.swapaxes(q, -1, -2), "s": qw["s"]}
            layers[name] = qw
        else:
            layers[name] = quantize_int4_cols(w, in_axis=axis)
    out["layers"] = layers
    return out


def qmatmul(x: jax.Array, w, einsum: str | None = None) -> jax.Array:
    """x @ w (or einsum) for plain, int8 or int4 weights.

    For int8 the scale multiplies the OUTPUT: valid because the scales are
    constant along every contraction axis, and it keeps the matmul operand in
    int8->bf16 cast form that XLA fuses into the MXU read. Scales keep their
    keepdim-1 contraction axes, which align by trailing broadcast against the
    output (e.g. [B,T,O] * [1,O], [B,T,2,I] * [1,2,I]).
    """
    if isinstance(w, dict) and "qT" in w:
        # transposed-folded storage (quantize_params): qT is [N, K] per layer
        # (N = prod(out)); contract x's last axis against qT's last axis (the
        # caller's einsum string describes the UNfolded [K, *out] weight and
        # is superseded here), unfold via the scale's trailing shape.
        # The scale multiplies the WEIGHT, element-wise, before the dot —
        # NOT the output. An output epilogue (y*s in bf16, or f32-accum
        # then scale) rounds SHAPE-DEPENDENTLY: XLA fuses it differently
        # for the T=1 draft step vs the T=gamma+1 verify, breaking the
        # draft==verify bit-exactness the losslessness invariant rests on
        # (measured: bf16 epilogue 0.80-0.85 full-budget acceptance on v5e;
        # f32-accum exact on TPU but lossless-FAIL at some shapes on CPU).
        # Per-element dequant is shape-independent by construction, and the
        # dot then IS the plain bf16-weights dot, whose T-consistency every
        # bf16 engine test already pins. XLA fuses convert+mul into the dot's
        # operand stream, so HBM traffic stays the int8 bytes.
        s = _strip_lead_ones(w["s"])
        wd = (w["qT"].astype(jnp.float32)
              * s.reshape(-1)[:, None]).astype(x.dtype)
        y = jnp.einsum("...k,nk->...n", x, wd)
        if s.ndim > 1:
            y = y.reshape(*y.shape[:-1], *s.shape)
        return y
    if isinstance(w, dict) and "q" in w:
        wd = w["q"].astype(x.dtype)
        s = _strip_lead_ones(w["s"])
        y = x @ wd if einsum is None else jnp.einsum(einsum, x, wd)
        return y * s.astype(y.dtype)
    if isinstance(w, Int4ColWeight):
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if jax.default_backend() == "tpu":
            from magicdec_tpu.ops.pallas.int4_matmul import int4_matmul
            y = int4_matmul(x2, w.q4, w.s4)
        else:
            # reference path: unpack + scale, then matmul (storage halved,
            # traffic not — the kernel is the TPU fast path). Nibbles are
            # BIASED by +8 (pack_int4_cols)
            qu = jnp.bitwise_and(w.q4.astype(jnp.int32), 0xFF)
            lo = (jnp.bitwise_and(qu, 0xF) - 8).astype(jnp.float32)
            hi = ((qu >> 4) - 8).astype(jnp.float32)
            qw = jnp.concatenate([lo, hi], axis=1)
            g = qw.shape[0] // w.s4.shape[0]
            wd = (qw * jnp.repeat(w.s4, g, axis=0)).astype(x.dtype)
            y = x2 @ wd
        return y.reshape(*lead, *w.out_shape) if w.out_shape else \
            y.reshape(*lead, y.shape[-1])
    if isinstance(w, Int4Weight):
        w = dequantize_int4(w, x.dtype)
    return x @ w if einsum is None else jnp.einsum(einsum, x, w)


def _strip_lead_ones(s: jax.Array) -> jax.Array:
    """Drop leading size-1 (contraction) axes so the per-output-channel scale
    aligns with the matmul output by trailing broadcast."""
    while s.ndim > 1 and s.shape[0] == 1:
        s = s[0]
    return s
