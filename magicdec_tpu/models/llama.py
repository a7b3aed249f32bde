"""Functional Llama/Qwen/Yi/Mistral decoder core.

TPU-first re-design of the reference's gpt-fast Transformer
(Engine/SnapKV/model.py:115-475): pure functions over a params pytree, layers
stacked on a leading axis and executed with `lax.scan` (one compiled layer
body, fast compile even at 80 layers), and attention delegated to a pluggable
`attn_impl` so the same core serves target decode / prefill / verify /
draft-decode variants without duplicating model code (the reference instead
duplicates the whole model file four times: model.py, model_draft.py, x2
engines).

Weights use [in, out] layout so forward matmuls are plain `x @ w` (MXU-friendly,
no transposes). QKV is fused into one matmul, gate/up into another, mirroring
the reference's wqkv fusion (Engine/SnapKV/model.py:311-322) — but with
TP-native column ordering: wqkv columns are KV-HEAD-MAJOR
([q-heads of kv-group 0 | k0 | v0 | q-heads of kv-group 1 | ...]) and gate/up
are stacked as [..., 2, I] (I minor so HBM tiles stay dense and sharding the I
axis over a `tp` mesh axis keeps each shard's gate and up together) — the
GSPMD analog of the reference's KV-head-aware column sharding
(Engine/tp.py:36-52).

attn_impl contract:
    attn_impl(q, k, v, cache_layers: tuple[Array, ...])
        -> (ctx [B, T, Hq*Dh], new_cache_layers)
with q [B,T,Hq,Dh], k/v [B,T,Hkv,Dh] all PRE-rope; the impl owns rope (target
caches store rotated K; StreamingLLM draft caches store unrotated K and rotate
at read — Engine/StreamingLLM/model.py:116-157).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops.norms import rms_norm

Params = dict[str, Any]
AttnImpl = Callable


def init_params(key: jax.Array, config: ModelArgs, dtype=jnp.float32,
                scale: float = 0.02) -> Params:
    """Random-normal params (for tests/benchmarks without checkpoints)."""
    c = config
    L, D, I = c.n_layer, c.dim, c.intermediate_size
    Dh, Hq, Hkv = c.head_dim, c.n_head, c.n_kv_head
    qkv_out = (Hq + 2 * Hkv) * Dh
    ks = jax.random.split(key, 8)

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    params: Params = {
        "tok_embeddings": rnd(ks[0], (c.vocab_size, D)),
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "wqkv": rnd(ks[1], (L, D, qkv_out)),
            "wo": rnd(ks[2], (L, Hq * Dh, D)),
            "ffn_norm": jnp.ones((L, D), dtype),
            "w_gate_up": rnd(ks[3], (L, D, 2, I)),
            "w_down": rnd(ks[4], (L, I, D)),
        },
        "norm": jnp.ones((D,), dtype),
        "output": None if c.tie_word_embeddings else rnd(ks[5], (D, c.vocab_size)),
    }
    if c.qkv_bias:
        params["layers"]["bqkv"] = rnd(ks[6], (L, qkv_out))
    return params


def _split_qkv(qkv: jax.Array, config: ModelArgs):
    """Split KV-head-major fused qkv [B, T, Hkv*(G+2)*Dh] into q/k/v.

    Global q-head index = kv_head * G + g, matching HF's head order and the
    [B, T, Hkv, G, Dh] grouping the attention oracle uses.
    """
    B, T = qkv.shape[:2]
    Dh, Hq, Hkv = config.head_dim, config.n_head, config.n_kv_head
    G = Hq // Hkv
    grouped = qkv.reshape(B, T, Hkv, (G + 2) * Dh)
    q = grouped[..., :G * Dh].reshape(B, T, Hq, Dh)
    k = grouped[..., G * Dh:(G + 1) * Dh]
    v = grouped[..., (G + 1) * Dh:]
    return q, k, v


def _block(x: jax.Array, lp: Params, config: ModelArgs, attn_impl: AttnImpl,
           caches: tuple, l: jax.Array, fused: bool = False):
    """One decoder block: pre-norm attn + pre-norm SwiGLU MLP.

    fused=True routes the weight matmuls through the two decode megakernels
    (ops/pallas/fused_block.py): activations stay VMEM-resident around each
    kernel and the ~10 XLA fusions per layer collapse to 3 launches — the
    decode path is weight-bandwidth-bound, so launch overhead is a material
    share of the step (reference analog: torch.compile max-autotune fusion,
    Engine/SnapKV/backend.py:116-125)."""
    from magicdec_tpu.quant.int8 import qmatmul

    if fused:
        from magicdec_tpu.ops.pallas.fused_block import (fused_post_attn,
                                                         fused_qkv)
        B, T, D = x.shape
        qkv = fused_qkv(x.reshape(B * T, D), lp["attn_norm"], lp["wqkv"],
                        lp.get("bqkv"), eps=config.norm_eps)
        q, k, v = _split_qkv(qkv.reshape(B, T, -1), config)
        ctx, caches = attn_impl(q, k, v, caches, l)
        x = fused_post_attn(x.reshape(B * T, D),
                            ctx.reshape(B * T, -1), lp["wo"],
                            lp["ffn_norm"], lp["w_gate_up"], lp["w_down"],
                            eps=config.norm_eps).reshape(B, T, D)
        return x, caches

    h = rms_norm(x, lp["attn_norm"], config.norm_eps)
    qkv = qmatmul(h, lp["wqkv"])
    if "bqkv" in lp:
        qkv = qkv + lp["bqkv"]
    q, k, v = _split_qkv(qkv, config)
    ctx, caches = attn_impl(q, k, v, caches, l)
    x = x + qmatmul(ctx, lp["wo"])

    h = rms_norm(x, lp["ffn_norm"], config.norm_eps)
    gate_up = qmatmul(h, lp["w_gate_up"], einsum="btd,dzi->btzi")
    x = x + qmatmul(jax.nn.silu(gate_up[..., 0, :]) * gate_up[..., 1, :],
                    lp["w_down"])
    return x, caches


_FUSED_MODE = "off"  # "auto" | "off" — see set_fused_mode


def set_fused_mode(mode: str):
    """Process-wide decode-megakernel switch (mirrors
    attention_impls.set_attend_mode): "auto" fuses TPU decode/verify-sized
    calls, "off" keeps the XLA path everywhere. Default OFF: the fused pair
    measured SLOWER in context at the flagship regime (B=8 P=32768 A/B:
    AR 1266 -> 1106 tok/s, snapkv spec 4153 -> 2792 — XLA's automatic
    cross-op weight prefetch under the attention reads beats the kernel's
    short-grid pipeline at decode M). Kept as an opt-in for larger-M
    regimes and further tuning; see ops/pallas/fused_block.py."""
    global _FUSED_MODE
    assert mode in ("auto", "off"), mode
    _FUSED_MODE = mode


def fused_for_mesh(mesh) -> bool | None:
    """forward(..., fused=) value for a mesh-parameterized caller: auto on a
    single device, OFF when the program is GSPMD-partitioned (pallas_call
    does not auto-partition; the XLA path shards fine)."""
    return None if (mesh is None or mesh.devices.size == 1) else False


def _fused_auto(params: Params, T: int, fused: bool | None) -> bool:
    """Resolve the fused-megakernel switch: explicit wins; auto = TPU decode/
    verify-sized calls (T <= 32) with plain (unquantized) weights. Callers
    running under a >1-device mesh must pass fused=False — pallas_call does
    not auto-partition under GSPMD."""
    if fused is not None:
        return fused
    if _FUSED_MODE == "off":
        return False
    w = params["layers"]["wqkv"]
    return (jax.default_backend() == "tpu" and T <= 32
            and isinstance(w, jax.Array))


def run_layers(params: Params, config: ModelArgs, x: jax.Array,
               attn_impl: AttnImpl, cache_arrays: tuple,
               remat: bool = False, fused: bool | None = None,
               unroll: int | bool = 1):
    """Scan the decoder stack. cache_arrays: tuple of FULL stacked [L, ...]
    cache arrays carried through the scan; attn_impl receives (caches, l) and
    appends via in-place scatters at layer l (cache.append_at_layer). Caches
    must NOT be threaded as scan xs/ys — that rewrites every layer's full
    cache each step (see append_at_layer docstring).

    remat=True checkpoints each layer (training: softmax activations are
    recomputed in backward instead of stored — O(1-layer) activation memory,
    jax.checkpoint-over-scan, the standard XLA remat recipe).

    fused: see _fused_auto/_block."""
    use_fused = _fused_auto(params, x.shape[1], fused)

    def body(carry, xs):
        x, caches = carry
        lp, l = xs
        x, caches = _block(x, lp, config, attn_impl, caches, l,
                           fused=use_fused)
        return (x, caches), None

    if remat:
        body = jax.checkpoint(body)
    (x, new_caches), _ = jax.lax.scan(
        body, (x, tuple(cache_arrays)),
        (params["layers"], jnp.arange(config.n_layer, dtype=jnp.int32)),
        unroll=unroll)
    return x, new_caches


def unembed(params: Params, config: ModelArgs, x: jax.Array) -> jax.Array:
    """Final norm + lm_head; logits in float32 (vocab-sharded under GSPMD, the
    distributed argmax of Engine/SnapKV/model.py:180-189 then falls out of a
    plain jnp.argmax)."""
    x = rms_norm(x, params["norm"], config.norm_eps)
    w_out = (params["tok_embeddings"].T if config.tie_word_embeddings
             else params["output"])
    return jnp.dot(x, w_out, preferred_element_type=jnp.float32)


def forward(params: Params, config: ModelArgs, tokens: jax.Array,
            attn_impl: AttnImpl, cache_arrays: tuple, last_only: bool = False,
            remat: bool = False, fused: bool | None = None,
            unroll: int | bool = 1):
    """tokens [B, T] -> (logits fp32, new_cache_arrays).

    last_only=True unembeds just the final position ([B, 1, V]) — prefill
    chunks never materialize a [B, T, V] logits tensor (the reference instead
    relies on flashinfer returning per-token outputs and slices afterwards).
    fused: decode megakernel switch (None = auto; see _fused_auto). Pass
    False under a >1-device mesh.
    """
    x = params["tok_embeddings"][tokens]
    x, new_caches = run_layers(params, config, x, attn_impl, cache_arrays,
                               remat=remat, fused=fused, unroll=unroll)
    if last_only:
        x = x[:, -1:]
    return unembed(params, config, x), new_caches
