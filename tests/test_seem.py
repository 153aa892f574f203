"""SEEM interactive head — shapes, group isolation, prompt masking."""

import jax
import jax.numpy as jnp
import numpy as np

from geopurify_tpu.models.seem import SEEMHead, sample_mask_points


def _inputs(rng, B=1, C=16, n_cls=4):
    ms = [jnp.asarray(rng.normal(size=(B, 2, 3, C)).astype(np.float32)),
          jnp.asarray(rng.normal(size=(B, 4, 6, C)).astype(np.float32)),
          jnp.asarray(rng.normal(size=(B, 8, 12, C)).astype(np.float32))]
    mf = jnp.asarray(rng.normal(size=(B, 16, 24, C)).astype(np.float32))
    text = rng.normal(size=(n_cls, C)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    return ms, mf, jnp.asarray(text)


def _head(C=16, S=8, G=4):
    return SEEMHead(hidden_dim=C, dim_proj=C, num_queries=5, nheads=2,
                    dim_feedforward=32, dec_layers=2, mask_dim=C,
                    max_spatial_tokens=S, max_grounding_tokens=G)


def test_seem_shapes_and_interactive_outputs(rng):
    C, S, G = 16, 8, 4
    ms, mf, text = _inputs(rng, C=C)
    head = _head(C, S, G)
    pts = jnp.asarray(rng.uniform(0, 1, (1, S, 2)).astype(np.float32))
    pv = jnp.asarray(np.array([[True] * 5 + [False] * 3]))
    pn = jnp.asarray(np.array([[1] * 4 + [-1] * 4]))
    gt = jnp.asarray(rng.normal(size=(1, G, C)).astype(np.float32))
    gv = jnp.asarray(np.array([[True, True, False, False]]))
    vars_ = head.init(jax.random.key(0), ms, mf, text, jnp.float32(10.0),
                      pts, pv, pn, gt, gv)
    out = head.apply(vars_, ms, mf, text, jnp.float32(10.0), pts, pv, pn, gt, gv)
    assert out["pred_logits"].shape == (1, 5, 4)
    assert out["pred_masks"].shape == (1, 5, 16, 24)
    assert out["spatial_masks"].shape == (1, 16, 24)
    assert out["grounding_masks"].shape == (1, 16, 24)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_seem_object_queries_isolated_from_prompts(rng):
    """Semantic predictions must be IDENTICAL with and without interactive
    prompts — object queries attend only each other (the attention_data
    group-isolation semantics)."""
    C, S = 16, 8
    ms, mf, text = _inputs(rng, C=C)
    head = _head(C, S)
    pts = jnp.asarray(rng.uniform(0, 1, (1, S, 2)).astype(np.float32))
    pv = jnp.ones((1, S), bool)
    pn = jnp.ones((1, S), jnp.int32)
    vars_ = head.init(jax.random.key(0), ms, mf, text, jnp.float32(10.0),
                      pts, pv, pn)
    with_prompts = head.apply(vars_, ms, mf, text, jnp.float32(10.0),
                              pts, pv, pn)
    without = head.apply(vars_, ms, mf, text, jnp.float32(10.0))
    np.testing.assert_allclose(
        np.asarray(with_prompts["pred_logits"]),
        np.asarray(without["pred_logits"]), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(with_prompts["pred_masks"]),
        np.asarray(without["pred_masks"]), atol=2e-3,
    )


def test_seem_invalid_prompt_slots_inert(rng):
    """Perturbing coordinates of INVALID prompt slots must not change the
    interactive mask."""
    C, S = 16, 8
    ms, mf, text = _inputs(rng, C=C)
    head = _head(C, S)
    pts = rng.uniform(0, 1, (1, S, 2)).astype(np.float32)
    pv = np.zeros((1, S), bool)
    pv[0, :3] = True
    pn = np.ones((1, S), np.int32)
    vars_ = head.init(jax.random.key(0), ms, mf, text, jnp.float32(10.0),
                      jnp.asarray(pts), jnp.asarray(pv), jnp.asarray(pn))
    out1 = head.apply(vars_, ms, mf, text, jnp.float32(10.0),
                      jnp.asarray(pts), jnp.asarray(pv), jnp.asarray(pn))
    pts2 = pts.copy()
    pts2[0, 3:] = rng.uniform(0, 1, (S - 3, 2))     # mutate ONLY invalid slots
    out2 = head.apply(vars_, ms, mf, text, jnp.float32(10.0),
                      jnp.asarray(pts2), jnp.asarray(pv), jnp.asarray(pn))
    np.testing.assert_allclose(
        np.asarray(out1["spatial_masks"]), np.asarray(out2["spatial_masks"]),
        atol=1e-5,
    )


def test_sample_mask_points():
    rng = np.random.default_rng(0)
    mask = np.zeros((10, 20), bool)
    mask[2, 5] = True
    mask[7, 15] = True
    pts, valid = sample_mask_points(mask, budget=4, rng=rng)
    assert valid.sum() == 2
    got = set(map(tuple, np.round(pts[valid] * [10, 20]).astype(int)))
    assert got == {(2, 5), (7, 15)}
    # over-budget: subsampled to the budget
    mask[:] = True
    pts, valid = sample_mask_points(mask, budget=4, rng=rng)
    assert valid.all() and pts.shape == (4, 2)
    # empty prompt
    pts, valid = sample_mask_points(np.zeros((4, 4), bool), 4, rng)
    assert not valid.any()
