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


def _part1_body(lp, config: ModelArgs, x, positions, cent_l, tail_k_l,
                tail_v_l, tail_slot, nprobe: int):
    """Layer first half for ONE token [B, 1]: qkv + rope + tail append at
    tail_slot + per-token centroid selection. Shared by the AR hostloop and
    the verify path of the spec mode, so both run the exact same per-token
    program shapes (losslessness: verify == gamma+1 AR steps)."""
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
    tail_k_l = tail_k_l.at[b_idx, tail_slot].set(k.reshape(B, -1))
    tail_v_l = tail_v_l.at[b_idx, tail_slot].set(v.reshape(B, -1))

    C = cent_l.shape[1]
    qg = q.reshape(B, 1, Hkv, G, Dh).astype(jnp.float32)
    cg = cent_l.reshape(B, C, Hkv, Dh)
    logit = jnp.einsum("bthgd,bchd->bthgc", qg, cg) * (Dh ** -0.5)
    scores = jnp.sum(jax.nn.softmax(logit, -1), axis=(1, 2, 3))
    _, top_c = jax.lax.top_k(scores, nprobe)
    return q, top_c, tail_k_l, tail_v_l


def _attend_body(lp, config: ModelArgs, x, q, k_sel, v_sel, mem_ok, tail_k_l,
                 tail_v_l, tail_bound):
    """Layer second half for ONE token: attend [clusters | tail rows
    < tail_bound], then wo + FFN. k_sel/v_sel [B, NS, HD]; mem_ok [B, NS];
    tail_bound [B] (the token's causal bound INCLUDING itself)."""
    from magicdec_tpu.quant.int8 import qmatmul

    Hkv, Dh = config.n_kv_head, config.head_dim
    B = x.shape[0]
    NS = k_sel.shape[1]
    Wcap = tail_k_l.shape[1]
    k_all = jnp.concatenate([k_sel.astype(tail_k_l.dtype), tail_k_l], axis=1)
    v_all = jnp.concatenate([v_sel.astype(tail_v_l.dtype), tail_v_l], axis=1)
    col = jnp.arange(NS + Wcap, dtype=jnp.int32)
    tail_ok = ((col[None, :] >= NS)
               & (col[None, :] < NS + tail_bound[:, None]))
    mask = jnp.concatenate([mem_ok, jnp.zeros((B, Wcap), bool)],
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


@functools.partial(jax.jit, static_argnames=("config", "nprobe"))
def _hostloop_part1(lp, config: ModelArgs, x, positions, cent_l, tail_k_l,
                    tail_v_l, tail_len, nprobe: int):
    """Up to the cluster selection: returns (q rotated, top_c, tail slices
    with this token's K/V appended)."""
    return _part1_body(lp, config, x, positions, cent_l, tail_k_l, tail_v_l,
                       tail_len, nprobe)


@functools.partial(jax.jit, static_argnames=("config",))
def _hostloop_part2(lp, config: ModelArgs, x, q, blocks, mem_ok, tail_k_l,
                    tail_v_l, tail_len):
    """After the host gather: attend [clusters | causal tail], finish the
    block (wo + FFN)."""
    B = x.shape[0]
    nprobe, _, cap, HD = blocks.shape[1:]
    k_sel = blocks[:, :, 0].reshape(B, nprobe * cap, HD)
    v_sel = blocks[:, :, 1].reshape(B, nprobe * cap, HD)
    return _attend_body(lp, config, x, q, k_sel, v_sel,
                        mem_ok.reshape(B, nprobe * cap), tail_k_l, tail_v_l,
                        tail_len + 1)


def offload_generate_hostloop(params, config: ModelArgs, state: OffloadState,
                              store, buffer0, max_new_tokens: int, *,
                              nprobe: int, cap: int, lru: "ClusterLRU" = None):
    """Tunnel-safe offload decode: io_callback hangs on remotely-attached
    TPU backends (axon), so the per-layer host gather runs in a host loop
    around two jitted layer halves. Token-identical to offload_generate
    (same selection, same attention) — the CPU test pins that.

    `lru`: optional device-resident block cache (ClusterLRU); per-token
    cluster fetches then hit HBM for resident clusters and the host link
    only on misses."""
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
            if lru is not None:
                blocks = lru.fetch(l, np.asarray(top_c))
            else:
                blocks = jnp.asarray(store.gather_clusters(l,
                                                           np.asarray(top_c)))
            mem_ok = jax.vmap(lambda a, i: a[i])(state.member_valid[l], top_c)
            x = _hostloop_part2(lp, config, x, q, blocks,
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


# ---------------------------------------------------------------------------
# Speculation over the offloaded store
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config", "gamma"))
def _spec_draft_round(params, config: ModelArgs, tok0, pos0, draft_k, draft_v,
                      draft_ok, tail_k, tail_v, tail_len0, gamma: int):
    """gamma draft steps with ZERO host traffic: each step attends
    [the previous verify's cluster blocks (draft_k/draft_v [L, B, NS, HD],
    <= gamma+1 tokens stale — the round-buffer staleness discipline) |
    causal tail], appending its K/V to the tail (verify overwrites the same
    slots: the SnapKV dual-write rollback discipline). Returns
    (buffer [B, gamma+1], tail_k, tail_v)."""
    from magicdec_tpu.quant.int8 import qmatmul
    from magicdec_tpu.models import llama

    B = tok0.shape[0]
    L = config.n_layer
    tok = tok0
    drafted = [tok0]
    for i in range(gamma):
        x = params["tok_embeddings"][tok]
        for l in range(L):
            lp = jax.tree.map(lambda a: a[l], params["layers"])
            q, _, tk_l, tv_l = _part1_body(
                lp, config, x, pos0 + i, jnp.zeros_like(draft_k[l][:, :1]),
                tail_k[l], tail_v[l], tail_len0 + i, nprobe=1)
            tail_k = [tk_l if j == l else tail_k[j] for j in range(L)]
            tail_v = [tv_l if j == l else tail_v[j] for j in range(L)]
            x = _attend_body(lp, config, x, q, draft_k[l], draft_v[l],
                             draft_ok[l], tk_l, tv_l, tail_len0 + i + 1)
        logits = llama.unembed(params, config, x)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        drafted.append(tok)
    return jnp.concatenate(drafted, axis=1), tail_k, tail_v


@functools.partial(jax.jit, static_argnames=("config", "nprobe", "T"))
def _spec_verify_l1(lp, config: ModelArgs, x_all, pos0, cent_l, tail_k_l,
                    tail_v_l, tail_len0, nprobe: int, T: int):
    """Verify, layer first half: the EXACT per-token program of
    _hostloop_part1 unrolled over the round's T = gamma+1 tokens (per-token
    [B, 1] shapes so selection and numerics match the AR twin), all host
    gathers deferred to one batched fetch."""
    qs, tops = [], []
    for j in range(T):
        q, top_c, tail_k_l, tail_v_l = _part1_body(
            lp, config, x_all[:, j:j + 1], pos0 + j, cent_l, tail_k_l,
            tail_v_l, tail_len0 + j, nprobe)
        qs.append(q)
        tops.append(top_c)
    return (jnp.concatenate(qs, axis=1), jnp.stack(tops, axis=1),
            tail_k_l, tail_v_l)


@functools.partial(jax.jit, static_argnames=("config", "T"))
def _spec_verify_l2(lp, config: ModelArgs, x_all, q_all, blocks, mem_ok,
                    tail_k_l, tail_v_l, tail_len0, T: int):
    """Verify, layer second half: per token, attend ITS OWN fetched blocks
    (blocks [B, T, nprobe, 2, cap, HD]) + the causal tail."""
    outs = []
    B = x_all.shape[0]
    npb, _, cap, HD = blocks.shape[2:]
    for j in range(T):
        k_sel = blocks[:, j, :, 0].reshape(B, npb * cap, HD)
        v_sel = blocks[:, j, :, 1].reshape(B, npb * cap, HD)
        xj = _attend_body(lp, config, x_all[:, j:j + 1],
                          q_all[:, j:j + 1], k_sel, v_sel,
                          mem_ok[:, j].reshape(B, npb * cap),
                          tail_k_l, tail_v_l, tail_len0 + j + 1)
        outs.append(xj)
    return jnp.concatenate(outs, axis=1)


def offload_generate_spec(params, config: ModelArgs, state: OffloadState,
                          store, buffer0, max_new_tokens: int, *, gamma: int,
                          nprobe: int, cap: int, eot_ids=(),
                          lru: "ClusterLRU" = None):
    """Speculative decoding OVER the offloaded cluster store — the
    throughput re-design of the reference's RetroInfer-as-draft composition
    (Engine/RetrievalAttention/backend.py:113-129, which re-prefills per
    speculate): the draft proposes gamma tokens attending [the previous
    verify's cluster blocks | causal tail] with no host traffic at all; the
    verify re-runs the exact per-token clustered attention of
    offload_generate_hostloop for all gamma+1 tokens with ONE host gather
    per LAYER per ROUND — host/tunnel round-trips per emitted token drop by
    ~(accepted + 1)x. Greedy acceptance; rollback is a tail-length rewind
    (verify dual-writes the tail slots the draft wrote).

    Losslessness: the verify program IS gamma+1 copies of the AR per-token
    program (same [B, 1] op shapes, same selection rule), so the emitted
    stream equals offload_generate_hostloop's — bit-exact on CPU
    (tests/test_offload.py); on TPU co-scheduling may flip argmax at
    numerical near-ties, as with GliDe's tree scope.

    `lru`: optional ClusterLRU (device-resident block cache, the reference's
    BufferManager analog). The per-round union fetch then resolves resident
    clusters from HBM and pulls only MISSES over the host link — across
    rounds the selections overlap heavily, so the link traffic drops by the
    hit rate on top of the within-round union dedup. Bytes are identical
    either way (losslessness untouched). Requires lru.nslots >= the round
    union size U.

    Returns (tokens [B, >= max_new_tokens], state, stats dict).
    """
    from magicdec_tpu.engine.spec import _accept_and_update, _eot_array
    from magicdec_tpu.models import llama

    B = buffer0.shape[0]
    L = config.n_layer
    HD = config.n_kv_head * config.head_dim
    NS = nprobe * cap
    T = gamma + 1
    eot = _eot_array(eot_ids)
    need = int(jnp.max(state.tail_len)) + max_new_tokens + gamma + 2
    assert state.tail_k.shape[2] >= need, (
        f"tail Wcap {state.tail_k.shape[2]} < {need}; size tail_slack for "
        f"the whole generation (the offload tail has no compaction)")

    tail_k = [state.tail_k[l] for l in range(L)]
    tail_v = [state.tail_v[l] for l in range(L)]
    tail_len = state.tail_len
    draft_k = [jnp.zeros((B, NS, HD), state.tail_k.dtype) for _ in range(L)]
    draft_v = [jnp.zeros((B, NS, HD), state.tail_v.dtype) for _ in range(L)]
    draft_ok = [jnp.zeros((B, NS), bool) for _ in range(L)]

    emb = jax.jit(lambda p, t: p["tok_embeddings"][t])

    @jax.jit
    def target_argmax(params, x_all):
        return jnp.argmax(llama.unembed(params, config, x_all),
                          axis=-1).astype(jnp.int32)

    output = jnp.zeros((B, max_new_tokens + gamma + 2), jnp.int32)
    gen_counts = jnp.zeros((B,), jnp.int32)
    tok = buffer0
    rounds = accepted = 0
    while int(jnp.min(gen_counts)) < max_new_tokens:
        pos0 = (state.tail_base + tail_len)[:, None]
        buffer, tail_k, tail_v = _spec_draft_round(
            params, config, tok, pos0, draft_k, draft_v, draft_ok,
            tail_k, tail_v, tail_len, gamma)

        x_all = emb(params, buffer)
        C = state.centroids.shape[2]
        U = min(C, T * nprobe)
        for l in range(L):
            lp = jax.tree.map(lambda a: a[l], params["layers"])
            q_all, top_all, tail_k[l], tail_v[l] = _spec_verify_l1(
                lp, config, x_all, pos0, state.centroids[l], tail_k[l],
                tail_v[l], tail_len, nprobe, T)
            # UNION-dedup fetch: adjacent verify tokens select overlapping
            # clusters, and the host->device link is bytes-bound (measured
            # ~2 s per 12.6 MB hop through the tunnel) — fetch each unique
            # cluster once, then reconstruct the exact per-token block
            # layout with an on-device gather, so the attention numerics
            # (and the AR bit-equality) are untouched
            top_np = np.asarray(top_all).reshape(B, T * nprobe)
            union = np.zeros((B, U), np.int64)
            posmap = np.zeros((B, T * nprobe), np.int32)
            for b in range(B):
                u = np.unique(top_np[b])[:U]
                union[b, :len(u)] = u
                union[b, len(u):] = u[-1] if len(u) else 0
                posmap[b] = np.minimum(np.searchsorted(u, top_np[b]),
                                       max(len(u) - 1, 0))
            if lru is not None:
                # resolve the union through the device block cache: only
                # misses cross the host link; per-token layout reconstructed
                # by ONE device gather straight from cache slots
                slots = lru.admit(l, union)              # np [B, U]
                final = slots[np.arange(B)[:, None], posmap]
                blocks = _lru_gather(lru.dev, l, jnp.asarray(final))
            else:
                blocks_u = jnp.asarray(store.gather_clusters(l, union))
                blocks = jax.vmap(lambda a, i: a[i])(blocks_u,
                                                     jnp.asarray(posmap))
            blocks = blocks.reshape(B, T, nprobe, 2, cap, HD)
            mem_ok = jax.vmap(lambda a, i: a[i])(
                state.member_valid[l], top_all.reshape(B, T * nprobe))
            mem_ok = mem_ok.reshape(B, T, nprobe * cap)
            x_all = _spec_verify_l2(lp, config, x_all, q_all, blocks, mem_ok,
                                    tail_k[l], tail_v[l], tail_len, T)
            # next round's draft working set: the newest token's blocks
            draft_k[l] = blocks[:, T - 1, :, 0].reshape(B, NS, HD)
            draft_v[l] = blocks[:, T - 1, :, 1].reshape(B, NS, HD)
            draft_ok[l] = mem_ok[:, T - 1]
        target_tokens = target_argmax(params, x_all)

        accept, bonus, output, gen_counts, terminal, acc = _accept_and_update(
            buffer, target_tokens, eot, gamma, output, gen_counts)
        tail_len = tail_len + accept
        tok = bonus
        rounds += 1
        accepted += int(acc)
        if bool(terminal):
            break
    idx = jnp.minimum(gen_counts, output.shape[1] - 1)
    output = output.at[jnp.arange(B), idx].set(tok[:, 0])
    new_state = OffloadState(
        centroids=state.centroids, member_valid=state.member_valid,
        tail_k=jnp.stack(tail_k), tail_v=jnp.stack(tail_v),
        tail_len=tail_len, tail_base=state.tail_base,
        prefix_len=state.prefix_len)
    stats = dict(rounds=rounds, accepted_drafts=accepted,
                 total_drafted=rounds * B * gamma,
                 generated=int(jnp.sum(gen_counts + 1)))
    return output, new_state, stats


@functools.partial(jax.jit, donate_argnums=(0,))
def _lru_scatter(dev, l, slots, blocks):
    """Admit miss blocks into the device block cache in place.
    dev [L, B, S, 2, cap, HD]; slots [B, M] int32 (pad entries = S -> OOB
    dropped); blocks [B, M, 2, cap, HD]."""
    b_idx = jnp.arange(slots.shape[0])[:, None]
    return dev.at[l, b_idx, slots].set(blocks.astype(dev.dtype), mode="drop")


@jax.jit
def _lru_gather(dev, l, idx):
    """dev [L, B, S, 2, cap, HD], idx [B, n] -> [B, n, 2, cap, HD]."""
    return jax.vmap(lambda a, i: a[i])(dev[l], idx)


class ClusterLRU:
    """Device-resident LRU cache of host-store cluster blocks.

    TPU-native counterpart of the reference's BufferManager (GPU block cache
    with LRU admission and hit/miss accounting over the CPU wave buffer,
    Engine/RetrievalAttention/.../wave_buffer_cpu.cpp:48-260): adjacent
    decode rounds select heavily overlapping clusters, so an HBM cache of
    `nslots` blocks per (layer, sequence) turns most per-round fetches into
    device gathers — only MISSES cross the host link. The directory (id ->
    slot, recency order) lives host-side in numpy: the offload decode is
    host-driven anyway (the tunnel forbids io_callback), so admission costs
    no extra device round-trips.

    Correctness: a cached block is bit-identical to the host store's bytes,
    so the attention (and the emitted stream) is unchanged — the LRU only
    moves WHERE bytes are fetched from. Pinned by tests/test_offload.py.
    """

    def __init__(self, store: "HostBlockStore", nslots: int):
        self.store = store
        self.nslots = nslots
        L, B, cap, HD = store.L, store.B, store.cap, store.HD
        self.dev = jnp.zeros((L, B, nslots, 2, cap, HD),
                             jnp.dtype(store.dtype))
        # per-(l, b) directory: id -> slot, insertion order = recency
        from collections import OrderedDict
        self._dir = [[OrderedDict() for _ in range(B)] for _ in range(L)]
        self.hits = 0
        self.misses = 0

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0

    def fetch(self, l: int, ids: np.ndarray) -> jax.Array:
        """ids [B, n] cluster ids -> blocks [B, n, 2, cap, HD] (device).

        Resolves hits from the device cache, fetches misses from the host
        store in ONE gather, admits them (evicting least-recently-used
        slots), and returns the device-side gather for all n ids.
        """
        slots = self.admit(l, ids)
        return _lru_gather(self.dev, l, jnp.asarray(slots))

    def admit(self, l: int, ids: np.ndarray) -> np.ndarray:
        """Resolve ids [B, n] to device slots [B, n], fetching misses.

        n (unique ids per row) must be <= nslots, or this round would evict
        blocks it is itself using.
        """
        ids = np.asarray(ids)
        B, n = ids.shape
        out = np.empty((B, n), np.int32)
        miss_ids = [[] for _ in range(B)]
        miss_slots = [[] for _ in range(B)]
        for b in range(B):
            d = self._dir[l][b]
            assert len(dict.fromkeys(ids[b].tolist())) <= self.nslots, \
                (n, self.nslots)
            for j, cid in enumerate(ids[b].tolist()):
                slot = d.get(cid)
                if slot is not None:
                    d.move_to_end(cid)
                    out[b, j] = slot
                    self.hits += 1
                    continue
                self.misses += 1
                if len(d) < self.nslots:
                    slot = len(d)
                else:
                    _, slot = d.popitem(last=False)      # evict LRU
                d[cid] = slot
                out[b, j] = slot
                miss_ids[b].append(cid)
                miss_slots[b].append(slot)
        m = max(len(x) for x in miss_ids)
        if m:
            # EXACT flat host gather (no pad-row fetches — the host link and
            # the threadpool do only miss work); pads exist only in the
            # rectangular device upload, dropped via OOB slots
            st = self.store
            flat = np.concatenate([
                (l * st.B + b) * st.C + np.asarray(miss_ids[b], np.int64)
                for b in range(B) if miss_ids[b]])
            rows = st.buf.gather(flat).view(st.dtype)
            rows = rows.reshape(len(flat), 2, st.cap, st.HD)
            pad_blocks = np.zeros((B, m, 2, st.cap, st.HD), st.dtype)
            pad_slots = np.full((B, m), self.nslots, np.int32)  # OOB = drop
            r0 = 0
            for b in range(B):
                k = len(miss_ids[b])
                pad_blocks[b, :k] = rows[r0:r0 + k]
                pad_slots[b, :k] = miss_slots[b]
                r0 += k
            self.dev = _lru_scatter(self.dev, l, jnp.asarray(pad_slots),
                                    jnp.asarray(pad_blocks))
        return out


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
