"""Pallas-fused InfoNCE vs the XLA implementation — value and gradients.

Runs in interpreter mode on CPU (the guide's debugging path); the compiled
kernel is exercised on the real chip by Stage-1 training.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geopurify_tpu.ops.contrastive import info_nce_loss
from geopurify_tpu.ops.pallas_infonce import info_nce_loss_fused


def _data(rng, A=512, NEG=7, E=16):
    a = rng.normal(size=(A, E)).astype(np.float32)
    p = rng.normal(size=(A, E)).astype(np.float32)
    n = rng.normal(size=(A, NEG, E)).astype(np.float32)
    valid = rng.random(A) < 0.8
    return jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), jnp.asarray(valid)


def test_fused_value_matches_xla(rng):
    a, p, n, valid = _data(rng)
    ref = info_nce_loss(a, p, n, valid, temperature=0.07)
    got = info_nce_loss_fused(a, p, n, valid, 0.07, True)
    assert float(got) == pytest.approx(float(ref), rel=1e-5)


def test_fused_grads_match_xla(rng):
    a, p, n, valid = _data(rng, A=512, NEG=5, E=8)

    def ref_loss(a_, p_, n_):
        return info_nce_loss(a_, p_, n_, valid, temperature=0.1)

    def fused_loss(a_, p_, n_):
        return info_nce_loss_fused(a_, p_, n_, valid, 0.1, True)

    ga = jax.grad(ref_loss, argnums=(0, 1, 2))(a, p, n)
    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(a, p, n)
    for r, f in zip(ga, gf):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r), rtol=2e-4, atol=1e-6)


def test_fused_all_invalid_is_zero(rng):
    a, p, n, _ = _data(rng, A=512, NEG=3, E=8)
    valid = jnp.zeros(512, bool)
    got = info_nce_loss_fused(a, p, n, valid, 0.07, True)
    assert float(got) == 0.0
    g = jax.grad(lambda x: info_nce_loss_fused(x, p, n, valid, 0.07, True))(a)
    np.testing.assert_allclose(np.asarray(g), 0.0)
