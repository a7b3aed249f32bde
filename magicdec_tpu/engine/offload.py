"""Host-offloaded clustered-KV generation: context KV beyond HBM.

The capacity path of the RetroInfer design (reference
Engine/RetrievalAttention: full KV in CPU pinned memory managed by the C++
WaveBufferCPU threadpool, retroinfer_cache.py:1-12; decode gathers the
selected clusters' K/V from the host and combines them with the on-device
steady zone, retroinfer_cache.py:540 + wave_buffer_cpu.cpp:261).

TPU-native layout here:

* PREFILL runs LAYER-AT-A-TIME (the reference's layer_prefill, LLM.py:32):
  only ONE layer's full-prefix K/V is device-resident at a time — it is
  attended (flash_prefill in T-chunks), k-means clustered, shipped to the
  host store, and freed. Device peak = activations + one layer's KV, so the
  CONTEXT KV can exceed HBM by ~n_layer x.
* The device keeps per-layer centroids [L, B, C, Hkv*D] (S/16-ish of the
  KV), a rolling tail cache [L, B, Wcap, Hkv*D], and the weights.
* DECODE scores centroids per layer, fetches the top-nprobe clusters' K/V
  blocks from the host through an ORDERED io_callback into the C++
  threadpool gather (engine/wave_buffer.py), and attends
  [gathered clusters | causal tail] densely — O(budget) device traffic.

The gather function is injected (`fetch_fn`), so the identical decode step
can serve clusters from a DEVICE store instead — the CPU test proves
token-equality between the host-offload path and the on-device path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu.models.config import ModelArgs
from magicdec_tpu.ops.kmeans import kmeans
from magicdec_tpu.ops.norms import rms_norm
from magicdec_tpu.ops.rope import rope
from magicdec_tpu.ops import attention as dense
from magicdec_tpu.models.llama import _split_qkv


# ---------------------------------------------------------------------------
# Layer-at-a-time prefill
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config", "chunk", "mega"),
                   donate_argnums=(2,))
def _layer_prefill(lp, config: ModelArgs, x, chunk: int = 128,
                   mega: int = 8192):
    """One decoder layer over the whole prefix, chunked along T: a
    monolithic layer forward's qkv/FFN transients are O(P * intermediate)
    and OOM exactly at the context sizes this path exists for. Structure:
    a python loop over `mega` spans (each with a static pow2 attention cap)
    wrapping a lax.scan over `chunk`-token steps (uniform program — the
    512-step unrolled variant explodes compile time, and the flash kernel's
    VMEM budget fits at chunk=128). Returns (x_next, k_rot, v) with K/V
    packed [B, P, Hkv*D]."""
    from magicdec_tpu.quant.int8 import qmatmul

    B, P, D = x.shape
    HD = config.n_kv_head * config.head_dim
    kf = jnp.zeros((B, P, HD), x.dtype)
    vf = jnp.zeros((B, P, HD), x.dtype)
    use_flash = jax.default_backend() == "tpu"
    outs = []
    for m0 in range(0, P, mega):
        Tm = min(mega, P - m0)
        n_sub = Tm // chunk
        cap = 512
        while cap < m0 + Tm:
            cap *= 2
        cap = min(cap, P)
        xm = x[:, m0:m0 + Tm].reshape(B, n_sub, chunk, D).transpose(1, 0, 2, 3)
        t0s = m0 + jnp.arange(n_sub, dtype=jnp.int32) * chunk

        def body(carry, xs, cap=cap):
            kf, vf = carry
            xc, t0 = xs
            h = rms_norm(xc, lp["attn_norm"], config.norm_eps)
            qkv = qmatmul(h, lp["wqkv"])
            if "bqkv" in lp:
                qkv = qkv + lp["bqkv"]
            q, k, v = _split_qkv(qkv, config)
            positions = t0 + jnp.broadcast_to(
                jnp.arange(chunk, dtype=jnp.int32)[None], (B, chunk))
            q = rope(config, q, positions)
            k_rot = rope(config, k, positions)
            kf = jax.lax.dynamic_update_slice(
                kf, k_rot.reshape(B, chunk, HD), (0, t0, 0))
            vf = jax.lax.dynamic_update_slice(
                vf, v.reshape(B, chunk, HD), (0, t0, 0))
            upto = positions + 1
            if use_flash:
                from magicdec_tpu.ops.pallas.flash_decode import flash_prefill
                ctx = flash_prefill(q, kf[None], vf[None], jnp.int32(0),
                                    upto, s_cap=cap)
            else:
                ctx = dense.masked_attention(
                    q, kf.reshape(B, P, config.n_kv_head, config.head_dim),
                    vf.reshape(B, P, config.n_kv_head, config.head_dim),
                    upto)
            xc = xc + qmatmul(ctx.reshape(B, chunk, -1), lp["wo"])
            h = rms_norm(xc, lp["ffn_norm"], config.norm_eps)
            gate_up = qmatmul(h, lp["w_gate_up"], einsum="btd,dzi->btzi")
            xc = xc + qmatmul(jax.nn.silu(gate_up[..., 0, :])
                              * gate_up[..., 1, :], lp["w_down"])
            return (kf, vf), xc

        (kf, vf), ys = jax.lax.scan(body, (kf, vf), (xm, t0s))
        outs.append(ys.transpose(1, 0, 2, 3).reshape(B, Tm, D))
    return jnp.concatenate(outs, axis=1), kf, vf


@functools.partial(jax.jit, static_argnames=("n_clusters", "cap"))
def _cluster_segment(kf, vf, n_clusters: int, cap: int):
    from magicdec_tpu.engine.retro import member_slot_table

    B, P, HD = kf.shape
    valid = jnp.ones((B, P), jnp.float32)
    cent, assign = kmeans(kf, valid, n_clusters)
    slots = member_slot_table(assign, valid, n_clusters, cap)  # [B,C,cap]
    src = jnp.clip(slots, 0, P - 1)
    take = jax.vmap(lambda a, i: a[i])
    k_blk = take(kf, src.reshape(B, -1)).reshape(B, n_clusters, cap, HD)
    v_blk = take(vf, src.reshape(B, -1)).reshape(B, n_clusters, cap, HD)
    blocks = jnp.stack([k_blk, v_blk], axis=2)       # [B,C,2,cap,HD]
    return cent.astype(kf.dtype), slots >= 0, blocks


def _cluster_layer(kf, vf, n_clusters: int, cap: int, segment: int = 8192):
    """Cluster one layer's keys SEGMENTED (the reference's segment k-means,
    cache_hub/kmeans.py:224): Lloyd's distance matrix at S=64k+ would be
    O(S * C) per iteration — per-8k-segment clustering bounds it, and long
    contexts cluster locally anyway. Returns (centroids [B,C,HD] in the
    cache dtype, member_valid [B,C,cap] bool, blocks [B,C,2,cap,HD])."""
    B, P, HD = kf.shape
    if P <= segment:
        return _cluster_segment(kf, vf, n_clusters, cap)
    n_seg = -(-P // segment)
    c_seg = max(n_clusters // n_seg, 1)
    cents, valids, blocks = [], [], []
    for s0 in range(0, P, segment):
        s1 = min(s0 + segment, P)
        c, v, b = _cluster_segment(kf[:, s0:s1], vf[:, s0:s1], c_seg, cap)
        cents.append(c)
        valids.append(v)
        blocks.append(b)
    return (jnp.concatenate(cents, axis=1), jnp.concatenate(valids, axis=1),
            jnp.concatenate(blocks, axis=1))


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["centroids", "member_valid", "tail_k", "tail_v",
                 "tail_len", "tail_base"],
    meta_fields=["prefix_len"])
@dataclass
class OffloadState:
    centroids: jax.Array      # [L, B, C, HD] f32
    member_valid: jax.Array   # [L, B, C, cap] bool
    tail_k: jax.Array         # [L, B, Wcap, HD]
    tail_v: jax.Array
    tail_len: jax.Array       # [B]
    tail_base: jax.Array      # [B] absolute slot of tail column 0
    prefix_len: int


def offload_prefill(params, config: ModelArgs, store, tokens, *,
                    n_clusters: int, cap: int, tail_keep: int,
                    tail_slack: int = 64):
    """Layer-at-a-time prefill into a host cluster store.

    `store` must expose put_layer(l, blocks [B,C,2,cap,HD]). Returns
    (OffloadState, buffer0 [B,1] the first generated token). Device-resident
    peak is activations + ONE layer's K/V — the full-context KV never
    coexists in HBM.
    """
    B, P = tokens.shape
    x = params["tok_embeddings"][tokens]
    L = config.n_layer
    HD = config.n_kv_head * config.head_dim
    cents, valids, tks, tvs = [], [], [], []
    for l in range(L):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        x, kf, vf = _layer_prefill(lp, config, x)
        cent, member_valid, blocks = _cluster_layer(kf, vf, n_clusters, cap)
        store.put_layer(l, np.asarray(blocks))
        cents.append(cent)
        valids.append(member_valid)
        tks.append(kf[:, P - tail_keep:])
        tvs.append(vf[:, P - tail_keep:])
        del kf, vf, blocks                       # free the layer's KV
    from magicdec_tpu.models import llama
    logits = llama.unembed(params, config, x[:, -1:])
    buffer0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    Wcap = tail_keep + tail_slack
    pad = Wcap - tail_keep
    tail_k = jnp.stack([jnp.pad(t, ((0, 0), (0, pad), (0, 0))) for t in tks])
    tail_v = jnp.stack([jnp.pad(t, ((0, 0), (0, pad), (0, 0))) for t in tvs])
    state = OffloadState(
        centroids=jnp.stack(cents), member_valid=jnp.stack(valids),
        tail_k=tail_k, tail_v=tail_v,
        tail_len=jnp.full((B,), tail_keep, jnp.int32),
        tail_base=jnp.full((B,), P - tail_keep, jnp.int32), prefix_len=P)
    return state, buffer0


# ---------------------------------------------------------------------------
# Decode from the store
# ---------------------------------------------------------------------------


def _decode_step_fn(config: ModelArgs, fetch_fn, *, nprobe: int, cap: int):
    """One decode step over (x-token, state): per layer score centroids,
    fetch_fn(l, top_c [B, nprobe]) -> blocks [B, nprobe, 2, cap, HD], attend
    [clusters | causal tail]. fetch_fn is an ordered io_callback for the
    host store, or a device-store gather for the on-device twin."""
    Hkv, Dh = config.n_kv_head, config.head_dim
    G = config.n_head // Hkv

    @jax.jit
    def step(params, state: OffloadState, tok):
        from magicdec_tpu.quant.int8 import qmatmul

        B = tok.shape[0]
        positions = (state.tail_base + state.tail_len)[:, None]
        x = params["tok_embeddings"][tok]
        new_tk, new_tv = state.tail_k, state.tail_v
        for l in range(config.n_layer):
            lp = jax.tree.map(lambda a: a[l], params["layers"])
            h = rms_norm(x, lp["attn_norm"], config.norm_eps)
            qkv = qmatmul(h, lp["wqkv"])
            if "bqkv" in lp:
                qkv = qkv + lp["bqkv"]
            q, k, v = _split_qkv(qkv, config)
            q = rope(config, q, positions)
            k = rope(config, k, positions)
            kf = k.reshape(B, 1, -1)
            vf = v.reshape(B, 1, -1)
            b_idx = jnp.arange(B)
            new_tk = new_tk.at[l, b_idx, state.tail_len].set(kf[:, 0])
            new_tv = new_tv.at[l, b_idx, state.tail_len].set(vf[:, 0])

            # centroid scores, joint over heads (retro selection rule)
            cent = state.centroids[l]                  # [B, C, HD]
            C = cent.shape[1]
            qg = q.reshape(B, 1, Hkv, G, Dh).astype(jnp.float32)
            cg = cent.reshape(B, C, Hkv, Dh)
            logit = jnp.einsum("bthgd,bchd->bthgc", qg, cg) * (Dh ** -0.5)
            scores = jnp.sum(jax.nn.softmax(logit, -1), axis=(1, 2, 3))
            _, top_c = jax.lax.top_k(scores, nprobe)   # [B, nprobe]

            blocks = fetch_fn(l, top_c)                # [B,nprobe,2,cap,HD]
            k_sel = blocks[:, :, 0].reshape(B, nprobe * cap, -1)
            v_sel = blocks[:, :, 1].reshape(B, nprobe * cap, -1)
            mem_ok = jax.vmap(lambda a, i: a[i])(state.member_valid[l], top_c)
            mem_ok = mem_ok.reshape(B, nprobe * cap)

            Wcap = new_tk.shape[2]
            k_all = jnp.concatenate([k_sel.astype(new_tk.dtype), new_tk[l]],
                                    axis=1)
            v_all = jnp.concatenate([v_sel.astype(new_tv.dtype), new_tv[l]],
                                    axis=1)
            NS = nprobe * cap
            col = jnp.arange(NS + Wcap, dtype=jnp.int32)
            tail_ok = ((col[None, :] >= NS)
                       & (col[None, :] < NS + state.tail_len[:, None] + 1))
            mask = jnp.concatenate([mem_ok, jnp.zeros((B, Wcap), bool)],
                                   axis=1)[:, None, :] | tail_ok[:, None, :]
            S_all = NS + Wcap
            ctx = dense.masked_attention_general(
                q, k_all.reshape(B, S_all, Hkv, Dh),
                v_all.reshape(B, S_all, Hkv, Dh), mask)
            x = x + qmatmul(ctx.reshape(B, 1, -1), lp["wo"])
            h = rms_norm(x, lp["ffn_norm"], config.norm_eps)
            gate_up = qmatmul(h, lp["w_gate_up"], einsum="btd,dzi->btzi")
            x = x + qmatmul(jax.nn.silu(gate_up[..., 0, :])
                            * gate_up[..., 1, :], lp["w_down"])
        from magicdec_tpu.models import llama
        logits = llama.unembed(params, config, x)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_state = OffloadState(
            centroids=state.centroids, member_valid=state.member_valid,
            tail_k=new_tk, tail_v=new_tv, tail_len=state.tail_len + 1,
            tail_base=state.tail_base, prefix_len=state.prefix_len)
        return nxt, new_state

    return step


def host_fetch_fn(store, B: int, nprobe: int, cap: int, HD: int, dtype):
    """fetch_fn serving clusters from the host store through an ORDERED
    io_callback (the reference's decode-from-wave-buffer boundary)."""
    def cb(l, top_c):
        return store.gather_clusters(int(l), np.asarray(top_c))

    def fetch(l, top_c):
        return jax.experimental.io_callback(
            cb, jax.ShapeDtypeStruct((B, nprobe, 2, cap, HD), dtype),
            jnp.int32(l), top_c, ordered=True)

    return fetch


def device_fetch_fn(device_blocks):
    """On-device twin: device_blocks [L, B, C, 2, cap, HD]."""
    def fetch(l, top_c):
        return jax.vmap(lambda a, i: a[i])(device_blocks[l], top_c)
    return fetch


def offload_generate(params, config: ModelArgs, state: OffloadState, store,
                     buffer0, max_new_tokens: int, *, nprobe: int, cap: int,
                     fetch_fn=None):
    """Autoregressive generation with clustered-KV attention served from the
    host store (or a custom fetch_fn). Returns tokens [B, max_new]."""
    B = buffer0.shape[0]
    HD = config.n_kv_head * config.head_dim
    if fetch_fn is None:
        fetch_fn = host_fetch_fn(store, B, nprobe, cap, HD,
                                 state.tail_k.dtype)
    step = _decode_step_fn(config, fetch_fn, nprobe=nprobe, cap=cap)
    toks = [buffer0]
    tok = buffer0
    for _ in range(max_new_tokens - 1):
        tok, state = step(params, state, tok)
        toks.append(tok)
    return jnp.concatenate(toks, axis=1), state


@functools.partial(jax.jit, static_argnames=("config", "nprobe"))
def _hostloop_part1(lp, config: ModelArgs, x, positions, cent_l, tail_k_l,
                    tail_v_l, tail_len, nprobe: int):
    """Up to the cluster selection: returns (q rotated, top_c, tail slices
    with this token's K/V appended)."""
    from magicdec_tpu.quant.int8 import qmatmul

    Hkv, Dh = config.n_kv_head, config.head_dim
    G = config.n_head // Hkv
    B = x.shape[0]
    h = rms_norm(x, lp["attn_norm"], config.norm_eps)
    qkv = qmatmul(h, lp["wqkv"])
    if "bqkv" in lp:
        qkv = qkv + lp["bqkv"]
    q, k, v = _split_qkv(qkv, config)
    q = rope(config, q, positions)
    k = rope(config, k, positions)
    b_idx = jnp.arange(B)
    tail_k_l = tail_k_l.at[b_idx, tail_len].set(k.reshape(B, -1))
    tail_v_l = tail_v_l.at[b_idx, tail_len].set(v.reshape(B, -1))

    C = cent_l.shape[1]
    qg = q.reshape(B, 1, Hkv, G, Dh).astype(jnp.float32)
    cg = cent_l.reshape(B, C, Hkv, Dh)
    logit = jnp.einsum("bthgd,bchd->bthgc", qg, cg) * (Dh ** -0.5)
    scores = jnp.sum(jax.nn.softmax(logit, -1), axis=(1, 2, 3))
    _, top_c = jax.lax.top_k(scores, nprobe)
    return q, top_c, tail_k_l, tail_v_l


@functools.partial(jax.jit, static_argnames=("config",))
def _hostloop_part2(lp, config: ModelArgs, x, q, blocks, mem_ok, tail_k_l,
                    tail_v_l, tail_len):
    """After the host gather: attend [clusters | causal tail], finish the
    block (wo + FFN)."""
    from magicdec_tpu.quant.int8 import qmatmul

    Hkv, Dh = config.n_kv_head, config.head_dim
    B = x.shape[0]
    nprobe, _, cap, HD = blocks.shape[1:]
    k_sel = blocks[:, :, 0].reshape(B, nprobe * cap, HD)
    v_sel = blocks[:, :, 1].reshape(B, nprobe * cap, HD)
    Wcap = tail_k_l.shape[1]
    k_all = jnp.concatenate([k_sel.astype(tail_k_l.dtype), tail_k_l], axis=1)
    v_all = jnp.concatenate([v_sel.astype(tail_v_l.dtype), tail_v_l], axis=1)
    NS = nprobe * cap
    col = jnp.arange(NS + Wcap, dtype=jnp.int32)
    tail_ok = ((col[None, :] >= NS)
               & (col[None, :] < NS + tail_len[:, None] + 1))
    mask = jnp.concatenate([mem_ok.reshape(B, NS),
                            jnp.zeros((B, Wcap), bool)],
                           axis=1)[:, None, :] | tail_ok[:, None, :]
    S_all = NS + Wcap
    ctx = dense.masked_attention_general(
        q, k_all.reshape(B, S_all, Hkv, Dh), v_all.reshape(B, S_all, Hkv, Dh),
        mask)
    x = x + qmatmul(ctx.reshape(B, 1, -1), lp["wo"])
    h = rms_norm(x, lp["ffn_norm"], config.norm_eps)
    gate_up = qmatmul(h, lp["w_gate_up"], einsum="btd,dzi->btzi")
    return x + qmatmul(jax.nn.silu(gate_up[..., 0, :]) * gate_up[..., 1, :],
                       lp["w_down"])


def offload_generate_hostloop(params, config: ModelArgs, state: OffloadState,
                              store, buffer0, max_new_tokens: int, *,
                              nprobe: int, cap: int):
    """Tunnel-safe offload decode: io_callback hangs on remotely-attached
    TPU backends (axon), so the per-layer host gather runs in a host loop
    around two jitted layer halves. Token-identical to offload_generate
    (same selection, same attention) — the CPU test pins that."""
    B = buffer0.shape[0]
    L = config.n_layer
    tail_k = [state.tail_k[l] for l in range(L)]
    tail_v = [state.tail_v[l] for l in range(L)]
    tail_len = state.tail_len
    toks = [buffer0]
    tok = buffer0
    emb = jax.jit(lambda p, t: p["tok_embeddings"][t])
    from magicdec_tpu.models import llama

    @jax.jit
    def finish(params, x):
        logits = llama.unembed(params, config, x)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    for _ in range(max_new_tokens - 1):
        positions = (state.tail_base + tail_len)[:, None]
        x = emb(params, tok)
        for l in range(L):
            lp = jax.tree.map(lambda a: a[l], params["layers"])
            q, top_c, tail_k[l], tail_v[l] = _hostloop_part1(
                lp, config, x, positions, state.centroids[l], tail_k[l],
                tail_v[l], tail_len, nprobe)
            blocks = store.gather_clusters(l, np.asarray(top_c))
            mem_ok = jax.vmap(lambda a, i: a[i])(state.member_valid[l], top_c)
            x = _hostloop_part2(lp, config, x, q, jnp.asarray(blocks),
                                mem_ok, tail_k[l], tail_v[l], tail_len)
        tok = finish(params, x)
        tail_len = tail_len + 1
        toks.append(tok)
    new_state = OffloadState(
        centroids=state.centroids, member_valid=state.member_valid,
        tail_k=jnp.stack(tail_k), tail_v=jnp.stack(tail_v),
        tail_len=tail_len, tail_base=state.tail_base,
        prefix_len=state.prefix_len)
    return jnp.concatenate(toks, axis=1), new_state


class HostBlockStore:
    """HostWaveBuffer wrapper with the (layer, batch, cluster) slot layout
    used by offload_prefill/offload_generate (one slot per (l, b, c) holding
    a cluster's K block followed by its V block)."""

    def __init__(self, L: int, B: int, C: int, cap: int, HD: int, dtype):
        from magicdec_tpu.engine.wave_buffer import HostWaveBuffer

        self.L, self.B, self.C, self.cap, self.HD = L, B, C, cap, HD
        self.dtype = np.dtype(dtype)
        slot_bytes = 2 * cap * HD * self.dtype.itemsize
        self.buf = HostWaveBuffer(L * B * C, slot_bytes)

    def put_layer(self, l: int, blocks: np.ndarray):
        """blocks [B, C, 2, cap, HD]."""
        # gather_clusters strides by the constructor's C; a clustering pass
        # that yielded fewer clusters (non-divisible segment count) would lay
        # rows out desynced from that stride and silently gather wrong bytes
        assert blocks.shape[:2] == (self.B, self.C), (blocks.shape,
                                                      self.B, self.C)
        self.buf.put(l * self.B * self.C,
                     np.ascontiguousarray(blocks).reshape(self.B * self.C, -1))

    def gather_clusters(self, l: int, top_c: np.ndarray) -> np.ndarray:
        ids = ((l * self.B + np.arange(self.B)[:, None]) * self.C
               + top_c).reshape(-1)
        out = self.buf.gather(ids.astype(np.int64))
        return out.view(self.dtype).reshape(self.B, top_c.shape[-1], 2,
                                            self.cap, self.HD)
