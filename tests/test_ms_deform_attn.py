"""MS-deformable-attention vs a numpy oracle — the reference-impl-vs-kernel
equivalence pattern of the reference's only unit test (SURVEY §4,
third_party/.../ops/test.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from geopurify_tpu.ops.ms_deform_attn import bilinear_sample, ms_deform_attn


def np_bilinear(value, x, y):
    """Zero-padded bilinear sampling oracle (grid_sample semantics)."""
    Hl, Wl, C = value.shape
    out = np.zeros((len(x), C))
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    for (dxi, dyi) in [(0, 0), (1, 0), (0, 1), (1, 1)]:
        xi, yi = x0 + dxi, y0 + dyi
        wgt = (1 - np.abs(x - xi)) * (1 - np.abs(y - yi))
        inside = (xi >= 0) & (xi < Wl) & (yi >= 0) & (yi < Hl)
        v = value[np.clip(yi, 0, Hl - 1), np.clip(xi, 0, Wl - 1)]
        out += np.where(inside[:, None], v * wgt[:, None], 0.0)
    return out


def test_bilinear_sample_oracle(rng):
    v = rng.normal(size=(9, 13, 4)).astype(np.float32)
    x = rng.uniform(-1.5, 14.0, 200)
    y = rng.uniform(-1.5, 10.0, 200)
    got = np.asarray(bilinear_sample(jnp.asarray(v), jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, np_bilinear(v, x, y), rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_oracle(rng):
    B, H, D, Q, P = 2, 2, 4, 6, 3
    shapes = ((8, 10), (4, 5))
    L = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, L, H, D)).astype(np.float32)
    locs = rng.uniform(0.05, 0.95, (B, Q, H, len(shapes), P, 2)).astype(np.float32)
    w = rng.random((B, Q, H, len(shapes), P)).astype(np.float32)
    w /= w.sum(axis=(3, 4), keepdims=True)

    got = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
    ))

    # numpy oracle
    ref = np.zeros((B, Q, H, D))
    for b in range(B):
        off = 0
        for lvl, (hl, wl) in enumerate(shapes):
            v = value[b, off: off + hl * wl].reshape(hl, wl, H, D)
            off += hl * wl
            for h in range(H):
                for p in range(P):
                    x = locs[b, :, h, lvl, p, 0] * wl - 0.5
                    y = locs[b, :, h, lvl, p, 1] * hl - 0.5
                    s = np_bilinear(v[:, :, h], x, y)
                    ref[b, :, h] += s * w[b, :, h, lvl, p][:, None]
    np.testing.assert_allclose(got, ref.reshape(B, Q, H * D), rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_differentiable(rng):
    B, H, D, Q, P = 1, 1, 2, 3, 2
    shapes = ((6, 6),)
    value = jnp.asarray(rng.normal(size=(B, 36, H, D)).astype(np.float32))
    locs = jnp.asarray(rng.uniform(0.2, 0.8, (B, Q, H, 1, P, 2)).astype(np.float32))
    w = jnp.full((B, Q, H, 1, P), 0.5)

    def loss(v, l):
        return jnp.sum(ms_deform_attn(v, shapes, l, w) ** 2)

    gv, gl = jax.grad(loss, argnums=(0, 1))(value, locs)
    assert np.isfinite(np.asarray(gv)).all() and np.abs(np.asarray(gv)).sum() > 0
    assert np.isfinite(np.asarray(gl)).all() and np.abs(np.asarray(gl)).sum() > 0
