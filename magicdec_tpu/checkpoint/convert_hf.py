"""HF checkpoint -> framework params conversion.

Counterpart of the reference's convert_hf_checkpoint.py (weight-map renaming,
QKV fusion convert_hf_checkpoint.py:151-161, tied-embedding fallback L147-149),
with two TPU-native differences:
  * weights land in [in, out] layout (forward is x @ w, no transposes);
  * NO rotary permutation — this framework uses the HF half-split rope
    convention directly (the reference permutes to interleaved for flashinfer,
    convert_hf_checkpoint.py:103-114).

Layer weights are stacked on a leading axis for the model's lax.scan.
"""

from __future__ import annotations

import gc
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from magicdec_tpu.models.config import ModelArgs


def params_from_hf_state_dict(state_dict, config: ModelArgs, dtype=None):
    """Convert an HF LlamaForCausalLM-style state dict (numpy arrays or
    anything np.asarray accepts) into the framework params pytree."""
    def get(name):
        t = state_dict[name]
        a = np.asarray(t, dtype=np.float32)
        return a

    L = config.n_layer

    def stack(fmt, transpose=False):
        ws = [get(fmt.format(i=i)) for i in range(L)]
        if transpose:
            ws = [w.T for w in ws]
        return np.stack(ws)

    Dh, Hq, Hkv = config.head_dim, config.n_head, config.n_kv_head
    G = Hq // Hkv

    def stack_qkv(kind):  # kind in ("weight", "bias")
        """Fuse q/k/v KV-HEAD-MAJOR: [qs of group 0 | k0 | v0 | qs of 1 | ...],
        so a tp shard never splits a GQA group (TP-native wqkv layout)."""
        parts = []
        for i in range(L):
            q = get(f"model.layers.{i}.self_attn.q_proj.{kind}")
            k = get(f"model.layers.{i}.self_attn.k_proj.{kind}")
            v = get(f"model.layers.{i}.self_attn.v_proj.{kind}")
            if kind == "weight":
                D = q.shape[1]
                qg = q.T.reshape(D, Hkv, G * Dh)
                kg = k.T.reshape(D, Hkv, Dh)
                vg = v.T.reshape(D, Hkv, Dh)
                fused = np.concatenate([qg, kg, vg], axis=2)  # [D,Hkv,(G+2)Dh]
                parts.append(fused.reshape(D, Hkv * (G + 2) * Dh))
            else:
                qg = q.reshape(Hkv, G * Dh)
                kg = k.reshape(Hkv, Dh)
                vg = v.reshape(Hkv, Dh)
                parts.append(np.concatenate([qg, kg, vg], axis=1).reshape(-1))
        return np.stack(parts)

    def stack_gate_up():
        ws = []
        for i in range(L):
            g = get(f"model.layers.{i}.mlp.gate_proj.weight")
            u = get(f"model.layers.{i}.mlp.up_proj.weight")
            ws.append(np.stack([g.T, u.T], axis=1))  # [D, 2, I]
        return np.stack(ws)

    layers = {
        "attn_norm": stack("model.layers.{i}.input_layernorm.weight"),
        "wqkv": stack_qkv("weight"),
        "wo": stack("model.layers.{i}.self_attn.o_proj.weight", transpose=True),
        "ffn_norm": stack("model.layers.{i}.post_attention_layernorm.weight"),
        "w_gate_up": stack_gate_up(),
        "w_down": stack("model.layers.{i}.mlp.down_proj.weight", transpose=True),
    }
    if config.qkv_bias:
        layers["bqkv"] = stack_qkv("bias")

    params = {
        "tok_embeddings": get("model.embed_tokens.weight"),
        "layers": layers,
        "norm": get("model.norm.weight"),
        "output": (None if config.tie_word_embeddings
                   else get("lm_head.weight").T),
    }
    if dtype is None:
        dtype = jnp.float32
    return _cast(params, dtype)


def _cast(tree, dtype):
    import jax
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)


def load_hf_checkpoint(checkpoint_dir: str, config: ModelArgs | None = None,
                       dtype=jnp.bfloat16):
    """Load an HF model directory (safetensors index or single file, or
    pytorch_model.bin index) and convert. Mirrors the reference's index
    handling (convert_hf_checkpoint.py:36-77)."""
    d = Path(checkpoint_dir)
    if config is None:
        config = ModelArgs.from_name(d.name)

    state_dict = {}
    st_index = d / "model.safetensors.index.json"
    single = d / "model.safetensors"
    if st_index.exists() or single.exists():
        from safetensors import safe_open
        files = ([single] if single.exists() else
                 sorted({d / f for f in
                         json.loads(st_index.read_text())["weight_map"].values()}))
        for f in files:
            with safe_open(str(f), framework="np") as handle:
                for key in handle.keys():
                    state_dict[key] = handle.get_tensor(key)
    else:
        import torch
        bins = sorted(d.glob("pytorch_model*.bin"))
        if not bins:
            raise FileNotFoundError(f"no safetensors or .bin weights in {d}")
        for f in bins:
            sd = torch.load(str(f), map_location="cpu", weights_only=True,
                            mmap=True)
            for k, v in sd.items():
                state_dict[k] = v.to(torch.float32).numpy()
        del sd
        gc.collect()

    return params_from_hf_state_dict(state_dict, config, dtype=dtype), config
