"""X-Decoder torch->flax converter: structural completeness + value fidelity.

No released checkpoint ships in this environment, so the mapping is pinned
structurally: a synthetic torch state dict with the exact reference key
layout must convert into trees that match our models' init trees
shape-for-shape, and known layout transforms (transpose/HWIO/qkv-split) are
checked by value on individual leaves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geopurify_tpu.utils.convert_xdecoder import (
    convert_xdecoder_checkpoint,
    synthesize_torch_state_dict,
)


@pytest.fixture(scope="module")
def tiny_models():
    from tests.test_pipeline import tiny_cfg
    from geopurify_tpu.models.lang import LanguageEncoder
    from geopurify_tpu.models.xdecoder import XDecoderSegModel

    cfg = tiny_cfg()
    model = XDecoderSegModel(cfg.xdecoder)
    key = jax.random.key(0)
    text = jnp.zeros((5, cfg.xdecoder.hidden_dim))
    img = jnp.zeros((1, *cfg.xdecoder.mask_shape, 3))
    xshapes = jax.eval_shape(model.init, key, img, text, jnp.float32(1.0))

    lang = LanguageEncoder(
        vocab_size=64, width=16, layers=2, heads=2, context_length=8, dim_proj=16
    )
    lshapes = jax.eval_shape(lang.init, key, jnp.zeros((1, 8), jnp.int32))
    return cfg, xshapes, lshapes


def test_converter_structural_roundtrip(tiny_models):
    import chex

    cfg, xshapes, lshapes = tiny_models
    sd = synthesize_torch_state_dict(xshapes["params"], lshapes["params"])
    out = convert_xdecoder_checkpoint(
        sd,
        depths=tuple(cfg.xdecoder.backbone.depths),
        enc_layers=cfg.xdecoder.enc_layers,
        dec_layers=cfg.xdecoder.dec_layers,
    )
    converted = jax.tree_util.tree_map(jnp.asarray, out["xdecoder"]["params"])
    chex.assert_trees_all_equal_shapes(converted, xshapes["params"])
    lconv = jax.tree_util.tree_map(jnp.asarray, out["lang"]["params"])
    chex.assert_trees_all_equal_shapes(lconv, lshapes["params"])
    assert out["logit_scale"] == pytest.approx(1.0)  # exp(0)


def test_layout_transforms(tiny_models):
    cfg, xshapes, lshapes = tiny_models
    sd = synthesize_torch_state_dict(xshapes["params"], lshapes["params"])
    out = convert_xdecoder_checkpoint(
        sd,
        depths=tuple(cfg.xdecoder.backbone.depths),
        enc_layers=cfg.xdecoder.enc_layers,
        dec_layers=cfg.xdecoder.dec_layers,
    )
    p = out["xdecoder"]["params"]
    # Linear transpose: modulation.f — stacked under the scanned stage's
    # "block" subtree, block j on the leading axis
    tw = sd["backbone.layers.0.blocks.0.modulation.f.weight"]
    np.testing.assert_array_equal(
        np.asarray(p["backbone"]["layers0_blocks"]["block"]["modulation"]["f"]["kernel"])[0],
        tw.T,
    )
    # Conv OIHW -> HWIO: patch_embed.proj
    cw = sd["backbone.patch_embed.proj.weight"]
    np.testing.assert_array_equal(
        np.asarray(p["backbone"]["patch_embed"]["proj"]["kernel"]),
        cw.transpose(2, 3, 1, 0),
    )
    # qkv split: predictor self_attn0
    w = sd["sem_seg_head.predictor.transformer_self_attention_layers.0.self_attn.in_proj_weight"]
    C = w.shape[1]
    np.testing.assert_array_equal(
        np.asarray(p["predictor"]["self_attn0"]["self_attn"]["q_proj"]["kernel"]),
        w[:C].T,
    )
    np.testing.assert_array_equal(
        np.asarray(p["predictor"]["self_attn0"]["self_attn"]["v_proj"]["kernel"]),
        w[2 * C:].T,
    )
