"""Data-layer and checkpoint-store tests."""

import jax
import jax.numpy as jnp
import numpy as np

from magicdec_tpu.checkpoint.store import load_params, save_params
from magicdec_tpu.data import converters, ruler
from magicdec_tpu.models import llama
from magicdec_tpu.models.config import ModelArgs


def test_synthetic_dataset_shape_and_bos():
    ds = converters.synthetic_dataset(seq_len=256, num_seqs=4, vocab_size=100)
    assert ds.shape == (4, 256) and ds.dtype == np.int32
    assert (ds[:, 0] == 1).all()
    assert ds.max() < 100


def test_mixed_markov_modes_learnable():
    """Global-mode transitions must be shared across sequences and seeds
    (that is what a model can absorb into weights)."""
    a = converters.mixed_markov_dataset(512, 8, seed=1)
    b = converters.mixed_markov_dataset(512, 8, seed=2)
    # collect observed global-half transitions from both corpora
    def transitions(ds):
        t = {}
        for row in ds:
            for x, y in zip(row[:-1], row[1:]):
                if x < 2048 and y < 2048 and x > 1:
                    t.setdefault(int(x), []).append(int(y))
        return t
    ta, tb = transitions(a), transitions(b)
    shared = set(ta) & set(tb)
    assert len(shared) > 50
    agree = sum(1 for k in shared
                if max(set(ta[k]), key=ta[k].count)
                == max(set(tb[k]), key=tb[k].count))
    assert agree / len(shared) > 0.8


def test_markov_dataset_follow_structure():
    ds = converters.markov_dataset(512, 4, vocab_size=512, active=32,
                                   p_follow=1.0, seed=0)
    # deterministic chains: the successor of each token is unique per seq
    for row in ds:
        succ = {}
        for x, y in zip(row[1:-1], row[2:]):
            if int(x) in succ:
                assert succ[int(x)] == int(y)
            succ[int(x)] = int(y)


def test_ruler_niah_answer_embedded():
    prompts, answers = ruler.prepare("niah", 512, 4, vocab_size=1000, seed=3)
    assert prompts.shape == (4, 512) and answers.shape[0] == 4
    for p, a in zip(prompts, answers):
        s = p.tolist()
        # the needle value appears contiguously in the haystack
        joined = ",".join(map(str, s))
        assert ",".join(map(str, a.tolist())) in joined


def test_checkpoint_roundtrip_params():
    cfg = ModelArgs.from_name("test-tiny")
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    save_params("/tmp/_ckpt_test.npz", params)
    like = jax.eval_shape(
        lambda k: llama.init_params(k, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0))
    back = load_params("/tmp/_ckpt_test.npz", like=like)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
