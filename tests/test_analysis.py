"""Acceptance-alpha analysis tests (reference find_alpha.py parity)."""

import numpy as np

from magicdec_tpu.analysis import (best_gamma, expected_accepted, find_alpha,
                                   speedup_model)


def test_alpha_roundtrip():
    for gamma in (2, 3, 6):
        for alpha in (0.3, 0.8, 0.95):
            rate = (expected_accepted(alpha, gamma) - 1) / gamma
            back = find_alpha(gamma, rate)
            assert abs(back - alpha) < 1e-4, (gamma, alpha, back)


def test_expected_accepted_limits():
    assert expected_accepted(0.0, 5) == 1.0
    assert expected_accepted(1.0, 5) == 6.0


def test_speedup_model_monotone_in_alpha():
    s = [speedup_model(a, 4, 0.2) for a in (0.2, 0.5, 0.8, 0.95)]
    assert all(b > a for a, b in zip(s, s[1:]))


def test_best_gamma_tradeoff():
    # cheap draft + high alpha -> large gamma; expensive draft -> small gamma
    g_cheap, _ = best_gamma(0.95, 0.05)
    g_costly, _ = best_gamma(0.6, 0.8)
    assert g_cheap > g_costly
    assert g_costly <= 2


def test_selection_fidelity_bounds_and_ordering():
    """Per-head TRUE-mass oracle must dominate the joint rule; all recalls
    are softmax-mass fractions in [0, 1]."""
    import jax
    import jax.numpy as jnp

    from magicdec_tpu.analysis import selection_fidelity

    B, Hq, Hkv, D, S = 2, 4, 2, 16, 512
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Hq, D))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv * D))
    lengths = jnp.asarray([S, S - 100], jnp.int32)
    r = selection_fidelity(q, k, lengths, page=128, n_pages=2)
    for v in r.values():
        assert 0.0 <= v <= 1.0 + 1e-6
    assert r["perhead_true"] >= r["joint"] - 1e-6
    assert r["perhead_true"] >= r["perhead_box"] - 1e-6
