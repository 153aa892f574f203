"""Sonata internals — grid-pool hierarchy, upcast recipe, patch attention."""

import numpy as np
import jax
import jax.numpy as jnp

from geopurify_tpu.models.sonata import (
    PatchAttention,
    SonataEncoder,
    StageLevel,
    sonata_features,
)


def _tiny_scene(rng, n=200, extent=16):
    vox = np.unique(rng.integers(0, extent, (n, 3)), axis=0).astype(np.int32)
    order = np.lexsort((vox[:, 2], vox[:, 1], vox[:, 0]))
    vox = vox[order]
    m = len(vox)
    feats = rng.normal(size=(m, 6)).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(vox), jnp.ones(m, bool)


def test_encoder_grid_pool_hierarchy(rng):
    feats, coords, valid = _tiny_scene(rng)
    enc = SonataEncoder(
        in_channels=6, enc_depths=(1, 1, 1), enc_channels=(8, 16, 24),
        enc_num_head=(2, 4, 4), enc_patch_size=(32, 32, 32),
    )
    vars_ = enc.init(jax.random.key(0), feats, coords, valid)
    levels = enc.apply(vars_, feats, coords, valid)
    assert len(levels) == 3

    for li in range(1, len(levels)):
        child = levels[li - 1]
        parent = levels[li]
        inv = np.asarray(parent.pooling_inverse)
        cvalid = np.asarray(child.valid)
        pcoords = np.asarray(parent.coords)
        ccoords = np.asarray(child.coords)
        # every valid child maps to the parent cell at child_coords // 2
        pv = np.asarray(parent.valid)
        ok = inv[cvalid] < pv.sum()
        assert ok.all()
        np.testing.assert_array_equal(
            pcoords[inv[cvalid]], ccoords[cvalid] // 2
        )
        # parent grids shrink
        assert pv.sum() <= cvalid.sum()
    # valid rows produce nonzero features, invalid rows zeros
    for lv in levels:
        f = np.asarray(lv.feats)
        v = np.asarray(lv.valid)
        assert np.abs(f[v]).sum() > 0
        np.testing.assert_allclose(f[~v], 0)


def test_upcast_recipe_math(rng):
    """sonata_features with hand-built levels: concat for the top
    upcast_levels, propagate (replace) below."""
    # 3 levels: M0=6, M1=3, M2=2; child i maps to parent i//2
    f0 = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(2, 7)).astype(np.float32))
    inv01 = jnp.asarray([0, 0, 1, 1, 2, 2], jnp.int32)   # level0 -> level1
    inv12 = jnp.asarray([0, 0, 1], jnp.int32)            # level1 -> level2
    ones = jnp.ones
    levels = [
        StageLevel(f0, None, ones(6, bool), None),
        StageLevel(f1, None, ones(3, bool), inv01),
        StageLevel(f2, None, ones(2, bool), inv12),
    ]
    out = np.asarray(sonata_features(levels, upcast_levels=2))
    # level1 gets [f1 || f2[inv12]]; level0 gets [f0 || that[inv01]]
    l1 = np.concatenate([np.asarray(f1), np.asarray(f2)[np.asarray(inv12)]], -1)
    ref = np.concatenate([np.asarray(f0), l1[np.asarray(inv01)]], -1)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    assert out.shape == (6, 4 + 5 + 7)

    # upcast_levels=1: ONLY the deepest transition concats
    # (parent.feat = [f1 || f2[inv12]]); the rest replace-propagate
    # (reference affinity_module.py:1038-1050 — upcast at the top,
    # plain inverse-gather below)
    out1 = np.asarray(sonata_features(levels, upcast_levels=1))
    l1c = np.concatenate([np.asarray(f1), np.asarray(f2)[np.asarray(inv12)]], -1)
    ref1 = l1c[np.asarray(inv01)]
    np.testing.assert_allclose(out1, ref1, rtol=1e-6)
    assert out1.shape == (6, 5 + 7)


def test_patch_attention_masks_invalid(rng):
    """Invalid rows must not influence valid outputs, under any permutation."""
    N, C = 24, 8
    x = rng.normal(size=(N, C)).astype(np.float32)
    valid = np.ones(N, bool)
    valid[16:] = False
    attn = PatchAttention(dim=C, num_heads=2, patch_size=8)
    perm = jnp.asarray(np.argsort(rng.random(N)).astype(np.int32))
    vars_ = attn.init(jax.random.key(0), jnp.asarray(x), perm, jnp.asarray(valid))

    out1 = attn.apply(vars_, jnp.asarray(x), perm, jnp.asarray(valid))
    x2 = x.copy()
    x2[16:] = rng.normal(size=(8, C))  # perturb ONLY invalid rows
    out2 = attn.apply(vars_, jnp.asarray(x2), perm, jnp.asarray(valid))
    np.testing.assert_allclose(
        np.asarray(out1)[valid], np.asarray(out2)[valid], atol=2e-5
    )


def _teacher_setup(rng):
    from geopurify_tpu.models.sonata import SonataTeacher

    _, coords, valid = _tiny_scene(rng, n=300, extent=20)
    m = coords.shape[0]
    P = 2 * m
    # per-POINT geometric features (rgb||normal), the pipeline contract
    feats = jnp.asarray(rng.normal(size=(P, 6)).astype(np.float32))
    p2v = rng.integers(0, m, P).astype(np.int32)
    pv = np.ones(P, bool)
    teacher = SonataTeacher(
        in_channels=6, enc_depths=(1, 1), enc_channels=(8, 16),
        enc_num_head=(2, 4), enc_patch_size=(32, 32),
    )
    vars_ = teacher.init(
        jax.random.key(0), feats, coords, valid,
        jnp.asarray(p2v), jnp.asarray(pv),
    )
    return teacher, vars_, feats, coords, valid, p2v, pv, m


def test_sonata_point_permutation_equivariance(rng):
    """Shuffling the POINT order (point2voxel rows) must shuffle the
    per-point teacher features correspondingly — the full-res output is a
    pure gather through point.inverse (reference affinity_module.py:1052),
    so any order dependence would be a serialization/pooling mask leak."""
    teacher, vars_, feats, coords, valid, p2v, pv, m = _teacher_setup(rng)
    out = np.asarray(teacher.apply(
        vars_, feats, coords, valid, jnp.asarray(p2v), jnp.asarray(pv)
    ))
    perm = rng.permutation(len(p2v))
    out_p = np.asarray(teacher.apply(
        vars_, feats[jnp.asarray(perm)], coords, valid,
        jnp.asarray(p2v[perm]), jnp.asarray(pv[perm]),
    ))
    np.testing.assert_allclose(out_p, out[perm], rtol=1e-5, atol=1e-6)


def test_sonata_padding_invariance(rng):
    """Growing the static voxel capacity (extra valid=False rows) must not
    change any valid per-point feature — catches padding leaks through the
    serialization permutation, grid pooling, and patch attention. Weights
    are shared by initializing at the SMALL capacity and reusing the params
    (flax params are shape-independent of M here)."""
    rng2 = np.random.default_rng(rng.integers(1 << 30))
    teacher, vars_, feats, coords, valid, p2v, pv, m = _teacher_setup(rng2)
    out_small = np.asarray(teacher.apply(
        vars_, feats, coords, valid, jnp.asarray(p2v), jnp.asarray(pv)
    ))
    pad = m + 64
    coords_p = jnp.concatenate([coords, jnp.zeros((pad - m, 3), jnp.int32)])
    valid_p = jnp.concatenate([valid, jnp.zeros(pad - m, bool)])
    out_pad = np.asarray(teacher.apply(
        vars_, feats, coords_p, valid_p, jnp.asarray(p2v), jnp.asarray(pv)
    ))
    np.testing.assert_allclose(out_pad, out_small, rtol=1e-5, atol=1e-6)
