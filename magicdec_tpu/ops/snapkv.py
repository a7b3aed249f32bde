"""SnapKV observation-window scoring and top-k KV selection.

Re-design of the reference's `gen_draft_kv` (Engine/SnapKV/model.py:391-445):
the last prefill chunk's queries score every past key; softmax weights are
summed over the observation queries and over each GQA group, avg/max-pooled
along the key axis (kernel 5), and the top-(budget - window) keys are selected
PER KV HEAD; the last `window` keys are always kept. Selected K stays rotated
at original positions (order inside the draft cache is irrelevant to softmax).

Unlike the reference (which materializes [B, H, obs, S] per query-chunk in a
Python loop and masks only the trailing window x window corner), we stream over
key chunks with an online log-sum-exp so peak memory is O(B*Hq*obs*chunk), and
we apply the full causal mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def snapkv_scores(q_obs: jax.Array, k_all: jax.Array, context_len: int,
                  window: int, key_chunk: int = 1024) -> jax.Array:
    """Pooled, group-summed attention mass per key.

    Args:
      q_obs: [B, Tobs, Hq, D] rotated queries of the LAST prefill chunk, at
        absolute positions context_len - Tobs + t.
      k_all: [B, S, Hkv, D] rotated keys (target cache layer); slots
        >= context_len are garbage and masked.
      context_len: static prefill length (uniform across the batch).
      window: observation window the selection must exclude (those keys are
        kept unconditionally by the caller).

    Returns: scores [B, Hkv, S] float32, -inf at ineligible keys
      (>= context_len - window).
    """
    B, Tobs, Hq, D = q_obs.shape
    S, Hkv = k_all.shape[1], k_all.shape[2]
    G = Hq // Hkv
    key_chunk = min(key_chunk, S)
    S_pad = -(-S // key_chunk) * key_chunk
    if S_pad != S:
        # padded slots sit beyond every query position -> causally masked out
        k_all = jnp.pad(k_all, ((0, 0), (0, S_pad - S), (0, 0), (0, 0)))
    n_chunks = S_pad // key_chunk

    qf = q_obs.astype(jnp.float32) * (D ** -0.5)
    qf = qf.reshape(B, Tobs, Hkv, G, D)
    kf = k_all.astype(jnp.float32).reshape(B, n_chunks, key_chunk, Hkv, D)
    q_pos = context_len - Tobs + jnp.arange(Tobs, dtype=jnp.int32)  # [Tobs]

    def chunk_logits(k_chunk, c):
        # [B, Tobs, Hkv, G, key_chunk]
        logits = jnp.einsum("bthgd,bshd->bthgs", qf, k_chunk)
        j = c * key_chunk + jnp.arange(key_chunk, dtype=jnp.int32)
        causal = j[None, :] <= q_pos[:, None]  # [Tobs, key_chunk]
        return jnp.where(causal[None, :, None, None, :], logits, NEG_INF)

    # Pass 1: online log-sum-exp per query over all causal keys.
    def lse_body(carry, c):
        m, l = carry
        logits = chunk_logits(kf[:, c], c)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(logits - m_new[..., None]), axis=-1)
        return (m_new, l), None

    m0 = jnp.full((B, Tobs, Hkv, G), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Tobs, Hkv, G), jnp.float32)
    (m, l), _ = jax.lax.scan(lse_body, (m0, l0), jnp.arange(n_chunks))
    lse = m + jnp.log(l)

    # Pass 2: accumulate sum over queries & GQA group of softmax probabilities.
    def score_body(_, c):
        logits = chunk_logits(kf[:, c], c)
        probs = jnp.exp(logits - lse[..., None])
        return None, jnp.sum(probs, axis=(1, 3))  # [B, Hkv, key_chunk]

    _, score_chunks = jax.lax.scan(score_body, None, jnp.arange(n_chunks))
    scores = jnp.moveaxis(score_chunks, 0, 2).reshape(B, Hkv, S_pad)[:, :, :S]

    # Avg-pool kernel 5, stride 1, zero 'same' padding (count_include_pad, as
    # in the reference's F.avg_pool1d).
    ksize = 5
    pad = ksize // 2
    padded = jnp.pad(scores, ((0, 0), (0, 0), (pad, pad)))
    pooled = sum(padded[:, :, i:i + S] for i in range(ksize)) / ksize

    j = jnp.arange(S, dtype=jnp.int32)
    eligible = j < (context_len - window)
    return jnp.where(eligible[None, None, :], pooled, NEG_INF)


def snapkv_select(scores: jax.Array, k_cache_l: jax.Array, v_cache_l: jax.Array,
                  context_len: int, budget: int, window: int):
    """Top-k gather building one layer of the draft cache.

    Returns (dk, dv) [B, budget, Hkv, D]: per-KV-head top-(budget - window)
    keys (rotated, original positions; unsorted — softmax is order-invariant)
    followed by the last `window` keys in order.
    """
    B, S, Hkv, D = k_cache_l.shape
    topk = budget - window
    _, idx = jax.lax.top_k(scores, topk)  # [B, Hkv, topk]
    # keep selected keys in ORIGINAL slot order: softmax is order-invariant
    # mathematically, but bitwise reproducibility (the full-budget
    # acceptance==1.0 invariant) requires the draft cache to be an identity
    # copy of the target prefix when the budget covers everything
    idx = jnp.sort(idx, axis=-1)

    def gather_bh(cache_bh, idx_bh):  # [S, D], [topk]
        return cache_bh[idx_bh]

    # per batch, per kv head gather on the slot axis
    gk = jax.vmap(jax.vmap(gather_bh, in_axes=(1, 0), out_axes=1))
    dk_sel = gk(k_cache_l, idx)  # [B, topk, Hkv, D]
    dv_sel = gk(v_cache_l, idx)
    tail = slice(context_len - window, context_len)
    dk = jnp.concatenate([dk_sel, k_cache_l[:, tail]], axis=1)
    dv = jnp.concatenate([dv_sel, v_cache_l[:, tail]], axis=1)
    return dk, dv
