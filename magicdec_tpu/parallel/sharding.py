"""GSPMD sharding: mesh construction and NamedShardings for params/caches.

TPU-native replacement for the reference's NCCL tensor parallelism
(Engine/tp.py): instead of hand-sharding nn.Linear weights and inserting
all_reduce calls (Engine/tp.py:67-159, Engine/SnapKV/model.py:336-338,459-461),
we annotate weight and KV-cache shardings over a Mesh("dp", "tp") and let XLA
emit the per-layer psums on ICI. The KV-head-aware column sharding
(Engine/tp.py:36-52) is guaranteed by construction: wqkv columns are
KV-head-major, so a tp shard always owns whole GQA groups. The vocab-sharded
lm_head + distributed argmax (Engine/SnapKV/model.py:180-189) falls out of
sharding the output projection's vocab axis.

Axes:
  dp — batch (sequences); shards the KV cache batch dim and all per-seq state.
  tp — KV heads / FFN intermediate / vocab.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from magicdec_tpu.models.config import ModelArgs


def make_mesh(dp: int = 1, tp: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // dp
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    # a sub-mesh over the first dp*tp devices is the analog of the reference's
    # rank_group ⊂ world (tests/SnapKV/longspec_benchmark.py:54-64)
    arr = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def make_multihost_mesh(tp_per_host: int | None = None) -> Mesh:
    """Multi-host mesh: dp over hosts (DCN), tp within each host (ICI).

    The reference never runs multi-node (SURVEY.md §2.3: torchrun
    --standalone only); here the standard JAX recipe is provided so the same
    engine scales across hosts — weights replicate over the dp/DCN axis,
    per-layer psums stay on ICI, only batch-parallel work crosses DCN.
    Requires jax.distributed.initialize() on each host.
    """
    n_local = jax.local_device_count()
    tp = tp_per_host or n_local
    assert tp <= n_local
    n_hosts = jax.device_count() // n_local
    arr = np.asarray(jax.devices()).reshape(n_hosts, n_local)[:, :tp]
    return Mesh(arr, ("dp", "tp"))


def validate_tp(config: ModelArgs, tp: int):
    """The reference distributes remainder KV heads unevenly (tp.py:36-52);
    GSPMD shards must be even, so configs whose KV heads don't divide tp go
    through pad_model_for_tp (zero-weight remainder heads) first."""
    assert config.n_kv_head % tp == 0, (
        f"n_kv_head={config.n_kv_head} does not divide tp={tp}; pad the "
        f"model with sharding.pad_model_for_tp(params, config, tp) first")
    assert config.intermediate_size % tp == 0
    assert config.vocab_size % tp == 0
    assert config.dim % tp == 0


def pad_model_for_tp(params, config: ModelArgs, tp: int):
    """Zero-pad the attention heads so n_kv_head divides tp; returns
    (padded_params, padded_config).

    TPU-native answer to the reference's uneven KV-head distribution
    (Engine/tp.py:36-52 gives remainder heads to the first ranks): GSPMD
    NamedShardings need even partitions, so instead whole zero-weight KV-head
    GROUPS (G q-heads + 1 k + 1 v each) are appended until tp divides. The
    padded heads are numerically inert — their wqkv columns are zero (q=k=v=0,
    softmax over zero logits attends a zero V) and their wo rows are zero, so
    logits are bit-identical to the unpadded model; they cost their share of
    attention FLOPs/cache, the price of even shards. Registry configs that
    need this at tp=8: 68m (12 KV heads), tinyllama/Qwen2.5-7b/Yi-1.5-6b (4).
    """
    import jax.numpy as jnp

    Hkv, Hq, Dh = config.n_kv_head, config.n_head, config.head_dim
    if Hkv % tp == 0:
        return params, config
    G = Hq // Hkv
    new_kv = -(-Hkv // tp) * tp
    pad_kv = new_kv - Hkv
    new_cfg = config.replace(n_kv_head=new_kv, n_head=new_kv * G,
                             head_dim=Dh)

    def pad_cols(w, extra):               # [..., out] -> zeros appended
        pad = [(0, 0)] * (w.ndim - 1) + [(0, extra)]
        return jnp.pad(w, pad)

    layers = dict(params["layers"])
    layers["wqkv"] = pad_cols(layers["wqkv"], pad_kv * (G + 2) * Dh)
    if "bqkv" in layers:
        layers["bqkv"] = pad_cols(layers["bqkv"], pad_kv * (G + 2) * Dh)
    # wo rows are q-head-major; new q heads sit at the end
    wo = layers["wo"]
    layers["wo"] = jnp.pad(wo, ((0, 0), (0, pad_kv * G * Dh), (0, 0)))
    out = dict(params)
    out["layers"] = layers
    return out, new_cfg


def param_pspecs(config: ModelArgs) -> dict:
    layers = {
        "attn_norm": P(None, None),
        "wqkv": P(None, None, "tp"),          # [L, D, Hkv*(G+2)*Dh] kv-major
        "wo": P(None, "tp", None),            # [L, Hq*Dh, D] row-parallel
        "ffn_norm": P(None, None),
        "w_gate_up": P(None, None, None, "tp"),  # [L, D, 2, I]
        "w_down": P(None, "tp", None),        # [L, I, D] row-parallel
    }
    if config.qkv_bias:
        layers["bqkv"] = P(None, "tp")
    return {
        "tok_embeddings": P("tp", None),      # vocab-parallel embedding
        "layers": layers,
        "norm": P(None),
        "output": None if config.tie_word_embeddings else P(None, "tp"),
    }


def cache_pspec() -> P:
    """KV caches [L, B, S, Hkv*D] (packed, head-major): batch over dp, the
    packed head axis over tp — a tp shard gets (Hkv/tp)*D contiguous columns,
    i.e. whole KV heads."""
    return P(None, "dp", None, "tp")


def replicated_param_pspecs(config: ModelArgs) -> dict:
    """All-replicated parameter specs: the asymmetric-TP draft
    (reference: draft model on a NCCL sub-group of ranks,
    tests/SnapKV/longspec_benchmark.py:54-64). Under GSPMD the analog is
    draft TP degree 1 — weights replicated over tp, per-layer psums vanish,
    and the "broadcast draft tokens to all ranks" is the implicit gather of
    a replicated output. Kernel calls stay tp-shard_mapped (a replicated
    operand shards locally for free), so the flash path survives."""
    spec = jax.tree.map(
        lambda s: P(*(None,) * len(s)) if isinstance(s, P) else None,
        param_pspecs(config),
        is_leaf=lambda x: isinstance(x, P) or x is None)
    return spec


def _tree_shardings(mesh: Mesh, pspecs):
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), pspecs,
        is_leaf=lambda x: isinstance(x, P) or x is None)


def shard_params(params, mesh: Mesh, config: ModelArgs,
                 replicate_tp: bool = False):
    if not replicate_tp:
        validate_tp(config, mesh.shape["tp"])
    pspecs = (replicated_param_pspecs(config) if replicate_tp
              else param_pspecs(config))
    shardings = _tree_shardings(mesh, pspecs)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_cache(cache, mesh: Mesh, replicate_tp: bool = False):
    """Shard a KVCache/DraftKVCache pytree (k/v 4-D, int32 per-seq vectors)."""
    def put(x):
        if x.ndim == 4:
            spec = P(None, "dp", None, None) if replicate_tp else cache_pspec()
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P("dp")))
    return jax.tree.map(put, cache)


def shard_tokens(tokens, mesh: Mesh):
    return jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))


def replicated(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
