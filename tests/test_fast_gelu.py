"""fast_gelu (views-path throughput option): the A&S-polynomial erf GELU
must be numerically invisible at bf16 and interchangeable in the FocalNet
forward. ≙ reference focal.py's nn.GELU (exact erf)."""

import jax
import jax.numpy as jnp
import numpy as np

from geopurify_tpu.models.focalnet import FocalNet
from geopurify_tpu.models.layers import gelu_poly


def test_gelu_poly_bf16_equivalence():
    """In the numerically relevant range (|gelu| > 1e-3) the bf16-rounded
    outputs match the exact-erf gelu except rounding-boundary single ulps
    (<0.05% of points); everywhere the ABSOLUTE difference stays at the
    bf16-ulp level. (The deep negative tail, |gelu| < 1e-6, differs
    bitwise — the 1-(1-e) cancellation loses those sub-bf16 magnitudes —
    measured max|d| there < 1e-6.)"""
    g = jnp.linspace(-12.0, 12.0, 500_001, dtype=jnp.float32)
    e32 = np.asarray(jax.nn.gelu(g, approximate=False))
    p32 = np.asarray(gelu_poly(g))
    exact = np.asarray(jnp.asarray(e32).astype(jnp.bfloat16), np.float32)
    poly = np.asarray(jnp.asarray(p32).astype(jnp.bfloat16), np.float32)
    assert np.abs(exact - poly).max() < 2.1e-3          # one ulp at |x|~0.5
    relevant = np.abs(e32) > 1e-3
    frac = np.mean((exact != poly) & relevant) / max(np.mean(relevant), 1e-9)
    assert frac < 2e-3, f"bf16 flips on {frac:.2e} of the relevant range"


def test_gelu_poly_f32_error_bound():
    g = jnp.linspace(-6.0, 6.0, 200_001, dtype=jnp.float32)
    exact = np.asarray(jax.nn.gelu(g, approximate=False))
    poly = np.asarray(gelu_poly(g))
    # 0.5*x*(1+erf) with |erf err| <= 1.5e-7 -> |gelu err| <= 0.5*|x|*1.5e-7
    assert np.abs(exact - poly).max() < 6 * 0.5 * 2e-7 + 1e-7


def test_focalnet_fast_gelu_interchangeable():
    """Same params, fast vs exact gelu: bf16 forward outputs stay within
    bf16 noise (the mode is a views-path throughput switch, not a model
    change)."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (1, 32, 48, 3), jnp.float32)
    kw = dict(embed_dim=8, depths=(1, 1, 1, 1), focal_levels=(2, 2, 2, 2),
              dtype=jnp.bfloat16)
    exact_bb = FocalNet(fast_gelu=False, **kw)
    fast_bb = FocalNet(fast_gelu=True, **kw)
    v = exact_bb.init(key, x)
    a = exact_bb.apply(v, x)
    b = fast_bb.apply(v, x)          # identical param tree
    for k in a:
        d = np.abs(np.asarray(a[k], np.float32) - np.asarray(b[k], np.float32))
        scale = np.abs(np.asarray(a[k], np.float32)).max()
        assert d.max() <= 0.02 * scale + 1e-6, f"{k}: {d.max():.3e}"
