"""Fused int4 dequant-matmul: weight-streaming at nibble bandwidth.

The reference's weight-only quantization dequantizes inside forward
(Engine/quantize.py:71-87 WeightOnlyInt8Linear) — int8 gets that for free
from XLA (the int8->bf16 cast fuses into the MXU read), but int4 does NOT:
XLA materializes the unpacked weight, so storage halves while HBM traffic
doesn't. This kernel streams the PACKED nibbles into VMEM and unpacks in
registers, so a decode step's weight traffic is truly K*N/2 bytes.

Measured v5e reality (llama-3.2-1b, B=128 weights-only forward): bf16
3.66 ms (~670 GB/s, roofline), int8 2.5 ms (XLA-fused cast), THIS KERNEL
3.6 ms — the nibble unpack is VPU-BOUND (~5 int32 vector ops per weight
element, i8/i16 vector shifts unsupported by Mosaic), which costs ~2 ms per
1B params and cancels the bandwidth saving. On v5e int8 remains the
weight-only throughput choice; int4's value is CAPACITY (half the weight
HBM -> larger batch/context), which the kernel delivers without the 2x
unpacked-materialization spike of the XLA path.

Layout: nibbles pack OUTPUT-column pairs (n, n + N/2) into one int8 at
q4[:, n] — unpacking yields two contiguous column blocks (no sublane
interleave, which Mosaic handles poorly). The kernel writes a split-halves
output [2, M, N/2] that the wrapper stitches back (one [M, N] copy, tiny at
decode shapes). Scales are group-wise along K: the K-block walk applies
each group's [1, N] scale row to its partial product, accumulating in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_int4_cols(w: jax.Array, group_size: int = 128):
    """Quantize [..., K, N] -> (q4 [..., K, N/2] int8 packing column pairs
    (n, n+N/2), scales [..., K/g, N] f32)."""
    wf = w.astype(jnp.float32)
    K, N = wf.shape[-2:]
    assert K % group_size == 0 and N % 2 == 0, (K, N, group_size)
    lead = wf.shape[:-2]
    grouped = wf.reshape(*lead, K // group_size, group_size, N)
    absmax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(grouped / scale), -8, 7).astype(jnp.int32)
    # BIASED nibbles: store q + 8 in [0, 15] so the kernel unpacks with one
    # mask + one shift (3 int ops per byte instead of 7 — the unpack was
    # VPU-bound) and corrects with the rank-1 term x @ W = s*(x @ Qu) -
    # 8*s*rowsum(x) per K-group
    qb = (q + 8).reshape(*lead, K, N)
    lo = qb[..., :, : N // 2]
    hi = qb[..., :, N // 2:]
    q4 = ((hi.astype(jnp.uint8) & 0xF) << 4
          | (lo.astype(jnp.uint8) & 0xF)).astype(jnp.int8)
    return q4, scale.reshape(*lead, K // group_size, N).astype(jnp.float32)


def _kernel(x_ref, q4_ref, s_ref, o_ref, acc_lo, acc_hi, *, n_groups: int,
            group: int, out_dtype):
    kb = pl.program_id(1)
    n_kb = pl.num_programs(1)

    @pl.when(kb == 0)
    def _init():
        acc_lo[...] = jnp.zeros_like(acc_lo)
        acc_hi[...] = jnp.zeros_like(acc_hi)

    # BIASED-nibble extraction in int32 (Mosaic supports vector shifts only
    # at i32): mask the sign-extension, then one & / one >> per half — the
    # bias is folded out below with the rank-1 term 8 * rowsum(x_group)
    q32 = jnp.bitwise_and(q4_ref[...].astype(jnp.int32), 0xFF)
    lo = jnp.bitwise_and(q32, 0xF).astype(jnp.bfloat16)  # [K_blk, N_blk]
    hi = (q32 >> 4).astype(jnp.bfloat16)
    x = x_ref[...]                                      # [M, K_blk]
    for g in range(n_groups):
        xg = x[:, g * group:(g + 1) * group]
        # s_ref carries ALL K-groups' rows (the [n_groups, ...] block
        # shape is not TPU-tileable); this K-block's rows start at
        # kb * n_groups
        srow = kb * n_groups + g
        sg_lo = s_ref[srow, : lo.shape[1]][None, :]     # [1, N_blk]
        sg_hi = s_ref[srow, lo.shape[1]:][None, :]
        xsum8 = 8.0 * jnp.sum(xg.astype(jnp.float32), axis=1,
                              keepdims=True)            # [M, 1]
        plo = jax.lax.dot_general(
            xg, lo[g * group:(g + 1) * group], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        phi = jax.lax.dot_general(
            xg, hi[g * group:(g + 1) * group], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_lo[...] += (plo - xsum8) * sg_lo
        acc_hi[...] += (phi - xsum8) * sg_hi

    @pl.when(kb == n_kb - 1)
    def _finish():
        o_ref[0] = acc_lo[...].astype(out_dtype)
        o_ref[1] = acc_hi[...].astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("group_size", "n_block", "k_block",
                                    "interpret"))
def int4_matmul(x: jax.Array, q4: jax.Array, scales: jax.Array, *,
                group_size: int = 128, n_block: int = 512,
                k_block: int = 4096, interpret: bool = False) -> jax.Array:
    """x [M, K] @ packed int4 weight -> [M, N].

    q4 [K, N/2] int8 (pack_int4_cols layout), scales [K/g, N] f32.
    M is the token count (decode: B) — kept whole in VMEM.
    """
    M, K = x.shape
    N2 = q4.shape[1]
    N = 2 * N2
    # largest K block <= the target that divides K in whole scale groups
    # (e.g. K=2816 with 128-groups -> 256)
    k_block = (min(k_block, K) // group_size) * group_size
    while K % k_block:
        k_block -= group_size
    n_block = min(n_block, N2)
    # n_block must divide N2 exactly: _interleave_scales reshapes the scale
    # rows into whole n-blocks (e.g. N2=2816 with the default 512 would fail)
    while N2 % n_block:
        n_block -= 128
        if n_block <= 0:
            n_block = N2
            break
    n_groups = k_block // group_size

    out = pl.pallas_call(
        functools.partial(_kernel, n_groups=n_groups, group=group_size,
                          out_dtype=x.dtype),
        grid=(pl.cdiv(N2, n_block), K // k_block),
        in_specs=[
            pl.BlockSpec((M, k_block), lambda n, kb: (0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_block, n_block), lambda n, kb: (kb, n),
                         memory_space=pltpu.VMEM),
            # ALL scale rows, this n-block's lo cols then hi cols
            pl.BlockSpec((K // group_size, 2 * n_block),
                         lambda n, kb: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, M, n_block), lambda n, kb: (0, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, M, N2), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((M, n_block), jnp.float32),
            pltpu.VMEM((M, n_block), jnp.float32),
        ],
        interpret=interpret,
    )(x, q4, _interleave_scales(scales, N2, n_block))
    return jnp.concatenate([out[0], out[1]], axis=1)


def _interleave_scales(scales: jax.Array, N2: int, n_block: int) -> jax.Array:
    """[K/g, N] -> [K/g, N] reordered so each n-block's slice holds its lo
    columns followed by its hi columns: block j covers output columns
    [j*n_block, (j+1)*n_block) and [N/2 + j*n_block, ...)."""
    G = scales.shape[0]
    lo = scales[:, :N2].reshape(G, -1, n_block)
    hi = scales[:, N2:].reshape(G, -1, n_block)
    return jnp.concatenate([lo, hi], axis=2).reshape(G, -1)
