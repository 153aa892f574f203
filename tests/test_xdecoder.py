"""X-Decoder teacher stack: shapes, masking semantics, language encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geopurify_tpu.config import FocalNetConfig, XDecoderConfig
from geopurify_tpu.models.focalnet import FocalNet
from geopurify_tpu.models.lang import (
    HashTokenizer,
    LanguageEncoder,
    PROMPT_TEMPLATES,
    embed_class_names,
)
from geopurify_tpu.models.pixel_decoder import TransformerEncoderPixelDecoder
from geopurify_tpu.models.xdecoder import (
    XDecoderHead,
    XDecoderSegModel,
    _structured_self_attn_mask,
)


def tiny_backbone_cfg():
    return FocalNetConfig(embed_dim=16, depths=(1, 1, 1, 1), focal_levels=(2, 2, 2, 2))


def tiny_xdec_cfg():
    return XDecoderConfig(
        backbone=tiny_backbone_cfg(),
        hidden_dim=32, conv_dim=32, mask_dim=32, num_queries=9,
        nheads=4, dim_feedforward=64, dec_layers=3, enc_layers=2,
        mask_shape=(24, 32), dtype="float32",
    )


def test_focalnet_output_strides():
    model = FocalNet(embed_dim=16, depths=(1, 1, 1, 1), focal_levels=(2, 2, 2, 2))
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = model.init(jax.random.key(0), x)
    out = model.apply(vars_, x)
    assert set(out) == {"res2", "res3", "res4", "res5"}
    assert out["res2"].shape == (1, 16, 24, 16)
    assert out["res3"].shape == (1, 8, 12, 32)
    assert out["res4"].shape == (1, 4, 6, 64)
    assert out["res5"].shape == (1, 2, 3, 128)


def test_pixel_decoder_shapes():
    feats = {
        "res2": jnp.zeros((1, 16, 24, 16)),
        "res3": jnp.zeros((1, 8, 12, 32)),
        "res4": jnp.zeros((1, 4, 6, 64)),
        "res5": jnp.zeros((1, 2, 3, 128)),
    }
    pd = TransformerEncoderPixelDecoder(
        conv_dim=32, mask_dim=32, num_enc_layers=2, num_heads=4, dim_feedforward=64
    )
    vars_ = pd.init(jax.random.key(0), feats)
    mask_features, tfeat, ms = pd.apply(vars_, feats)
    assert mask_features.shape == (1, 16, 24, 32)
    assert tfeat.shape == (1, 2, 3, 32)
    assert [m.shape[1:3] for m in ms] == [(2, 3), (4, 6), (8, 12)]


def test_structured_self_attn_mask():
    m = _structured_self_attn_mask(5)
    assert m[:4, 4].all() and m[4, :4].all()
    assert not m[:4, :4].any() and not m[4, 4]


def test_xdecoder_head_shapes_and_logits():
    Q, C, ncls = 9, 32, 6
    ms = [jnp.ones((1, 2, 3, C)), jnp.ones((1, 4, 6, C)), jnp.ones((1, 8, 12, C))]
    mf = jnp.ones((1, 16, 24, C))
    text = jnp.asarray(np.random.default_rng(0).normal(size=(ncls + 1, C)), jnp.float32)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    head = XDecoderHead(hidden_dim=C, dim_proj=C, num_queries=Q, nheads=4,
                        dim_feedforward=64, dec_layers=3, mask_dim=C)
    vars_ = head.init(jax.random.key(0), ms, mf, text, jnp.float32(100.0))
    out = head.apply(vars_, ms, mf, text, jnp.float32(100.0))
    assert out["pred_logits"].shape == (1, Q - 1, ncls + 1)
    assert out["pred_masks"].shape == (1, Q - 1, 16, 24)
    assert out["mask_embed"].shape == (1, Q - 1, C)
    # cosine * scale bound
    assert np.abs(np.asarray(out["pred_logits"])).max() <= 100.0 + 1e-3


def test_full_seg_model_runs_and_pads():
    cfg = tiny_xdec_cfg()
    model = XDecoderSegModel(cfg)
    img = jnp.zeros((1, 30, 45, 3))  # not divisible by 32 -> pads to 32x64
    text = jnp.ones((5, cfg.hidden_dim), jnp.float32)
    vars_ = model.init(jax.random.key(0), img, text, jnp.float32(50.0))
    out = model.apply(vars_, img, text, jnp.float32(50.0))
    assert tuple(np.asarray(out["padded_hw"])) == (32, 64)
    assert out["pred_masks"].shape == (1, cfg.num_queries - 1, 8, 16)
    assert out["pred_logits"].shape == (1, cfg.num_queries - 1, 5)


def test_language_encoder_and_prompt_averaging():
    tok = HashTokenizer(vocab_size=1000, context_length=16)
    ids, mask = tok(["a chair in a scene", "background"])
    assert ids.shape == (2, 16)
    # EOT is the argmax id position
    assert ids.max() == tok.eot
    enc = LanguageEncoder(vocab_size=1000, width=32, layers=2, heads=4,
                          context_length=16, dim_proj=32)
    vars_ = enc.init(jax.random.key(0), jnp.asarray(ids))
    emb = enc.apply(vars_, jnp.asarray(ids))
    assert emb.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5)

    assert len(PROMPT_TEMPLATES) == 81
    text = embed_class_names(
        lambda v, i: enc.apply(v, i), vars_, tok, ["chair", "table"],
    )
    assert text.shape == (3, 32)  # 2 classes + background
    np.testing.assert_allclose(np.linalg.norm(text, axis=1), 1.0, rtol=1e-5)


def test_scene_prompt_wrapping_pins_reference_strings():
    """The exact label strings fed to text embedding must match the reference's
    prompt construction (affinity_module.py:242-245): every class name wrapped
    as "a {label} in a scene", plus a trailing unwrapped "background"."""
    from geopurify_tpu.config import GeoPurifyConfig
    from geopurify_tpu.models.lang import class_name_prompts

    cfg = GeoPurifyConfig()
    got = class_name_prompts(["wall", "floor", "chair"], cfg.text.prompt_template)
    assert got == [
        "a wall in a scene",
        "a floor in a scene",
        "a chair in a scene",
        "background",
    ]
    # the template knob actually reaches embed_class_names: distinct prompts
    # must produce distinct embeddings
    tok = HashTokenizer(vocab_size=1000, context_length=16)
    enc = LanguageEncoder(vocab_size=1000, width=32, layers=2, heads=4,
                          context_length=16, dim_proj=32)
    ids, _ = tok(["x"])
    vars_ = enc.init(jax.random.key(0), jnp.asarray(ids))
    raw = embed_class_names(lambda v, i: enc.apply(v, i), vars_, tok, ["chair"],
                            use_templates=False)
    wrapped = embed_class_names(lambda v, i: enc.apply(v, i), vars_, tok,
                                ["chair"], use_templates=False,
                                template=cfg.text.prompt_template)
    assert not np.allclose(raw[0], wrapped[0])
    np.testing.assert_allclose(raw[1], wrapped[1], atol=1e-6)  # background unwrapped


def test_causal_text_encoding_prefix_invariance():
    """Causal mask: embedding at EOT must not depend on future padding tokens."""
    tok = HashTokenizer(vocab_size=500, context_length=12)
    enc = LanguageEncoder(vocab_size=500, width=16, layers=1, heads=2,
                          context_length=12, dim_proj=16)
    ids, _ = tok(["hello world"])
    vars_ = enc.init(jax.random.key(0), jnp.asarray(ids))
    e1 = enc.apply(vars_, jnp.asarray(ids))
    ids2 = ids.copy()
    ids2[0, -1] = 7  # mutate padding after EOT
    e2 = enc.apply(vars_, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_deformable_pixel_decoder_assembly():
    """The MSDeformAttn pixel decoder (transformer_encoder_deform.py:140-377
    equivalent) plugs into the full seg model via xdecoder.pixel_decoder."""
    import dataclasses

    from geopurify_tpu.config import FocalNetConfig, XDecoderConfig
    from geopurify_tpu.models.xdecoder import XDecoderSegModel

    cfg = XDecoderConfig(
        backbone=FocalNetConfig(embed_dim=8, depths=(1, 1, 1, 1),
                                focal_levels=(2, 2, 2, 2)),
        hidden_dim=16, conv_dim=16, mask_dim=16, num_queries=5, nheads=2,
        dim_feedforward=32, dec_layers=2, enc_layers=1,
        mask_shape=(32, 64), dtype="float32", pixel_decoder="deform",
    )
    model = XDecoderSegModel(cfg)
    img = jnp.zeros((1, 30, 60, 3))
    text = jax.random.normal(jax.random.key(0), (6, 16))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    vars_ = model.init(jax.random.key(1), img, text, jnp.float32(20.0))
    out = model.apply(vars_, img, text, jnp.float32(20.0))
    assert out["pred_masks"].shape == (1, 4, 8, 16)
    assert out["pred_logits"].shape == (1, 4, 6)  # logits vs all 6 text rows
    assert np.isfinite(np.asarray(out["pred_masks"])).all()
    # the deformable encoder's params actually exist in the tree
    assert "encoder_layer0" in vars_["params"]["pixel_decoder"]
    assert "sampling_offsets" in vars_["params"]["pixel_decoder"]["encoder_layer0"]
