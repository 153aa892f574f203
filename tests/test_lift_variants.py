"""LSeg/APE-style lift backends + fused-feature loader."""

import numpy as np
import jax
import jax.numpy as jnp

from geopurify_tpu.models.lift_variants import lift_view_dense, lift_view_instance


def _common(rng, H=16, W=20, Pv=64, C=8, n_cls=4):
    rows = jnp.asarray(rng.integers(0, H, Pv).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, W, Pv).astype(np.int32))
    pv_valid = jnp.asarray(rng.random(Pv) < 0.8)
    coords = jnp.asarray(rng.normal(size=(Pv, 3)).astype(np.float32))
    text = rng.normal(size=(n_cls, C)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    return rows, cols, pv_valid, coords, jnp.asarray(text)


def test_dense_lift_gathers_pixel_features(rng):
    H, W, C = 16, 20, 8
    rows, cols, pv_valid, coords, text = _common(rng, H, W, C=C)
    pix = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    out = lift_view_dense(pix, rows, cols, pv_valid, coords, text, jnp.float32(10.0))
    f = np.asarray(out.features)
    pv = np.asarray(pv_valid)
    np.testing.assert_allclose(np.linalg.norm(f[pv], axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(f[~pv], 0.0)
    # gathered from the right pixel
    i = int(np.where(pv)[0][0])
    expected = np.asarray(pix)[int(rows[i]), int(cols[i])]
    expected = expected / np.linalg.norm(expected)
    np.testing.assert_allclose(f[i], expected, rtol=1e-5)
    assert out.logits.shape == (64, 4)


def test_instance_lift_masks_and_fill(rng):
    H, W, Q, C = 16, 20, 5, 8
    rows, cols, pv_valid, coords, text = _common(rng, H, W, C=C)
    # one mask dominates everywhere -> all covered points share its embed
    masks = jnp.full((Q, H, W), -10.0).at[2].set(10.0)
    embeds = jnp.asarray(rng.normal(size=(Q, C)).astype(np.float32))
    scores = jnp.ones((Q,))
    out = lift_view_instance(
        masks, embeds, scores, rows, cols, pv_valid, coords, text, jnp.float32(10.0)
    )
    f = np.asarray(out.features)
    pv = np.asarray(pv_valid)
    e2 = np.asarray(embeds)[2]
    e2 = e2 / np.linalg.norm(e2)
    np.testing.assert_allclose(f[pv], np.tile(e2, (pv.sum(), 1)), rtol=1e-4)


def test_fused_feature_loader(tmp_path, rng):
    import torch

    from geopurify_tpu.data.feature_loader import load_fused_features

    n, c = 100, 16
    mask = rng.random(n) < 0.6
    feat = rng.normal(size=(int(mask.sum()), c)).astype(np.float32)
    p = str(tmp_path / "scene0000_00_0.pt")
    torch.save({"feat": torch.tensor(feat), "mask_full": torch.tensor(mask)}, p)
    full, m = load_fused_features(p, n)
    assert full.shape == (n, c)
    np.testing.assert_array_equal(m, mask)
    np.testing.assert_allclose(full[mask], feat)
    np.testing.assert_allclose(full[~mask], 0.0)
