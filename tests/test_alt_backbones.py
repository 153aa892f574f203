"""Alternative backbones (DaViT / ViT) — output strides + seg-model plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from geopurify_tpu.models.davit import DaViT
from geopurify_tpu.models.vit_backbone import ViTBackbone


def test_davit_output_strides():
    m = DaViT(embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
              num_heads=(2, 2, 2, 2), num_groups=(2, 2, 2, 2), window_size=4)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = m.init(jax.random.key(0), x)
    out = m.apply(vars_, x)
    assert out["res2"].shape == (1, 16, 24, 8)
    assert out["res3"].shape == (1, 8, 12, 16)
    assert out["res4"].shape == (1, 4, 6, 24)
    assert out["res5"].shape == (1, 2, 3, 32)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_vit_backbone_output_strides():
    m = ViTBackbone(embed_dim=16, depth=2, num_heads=2, window_size=2,
                    global_attn_indexes=(1,), out_dims=(8, 12, 16, 24),
                    pretrain_grid=8)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = m.init(jax.random.key(0), x)
    out = m.apply(vars_, x)
    assert out["res2"].shape == (1, 16, 24, 8)   # stride 4
    assert out["res3"].shape == (1, 8, 12, 12)   # stride 8
    assert out["res4"].shape == (1, 4, 6, 16)    # stride 16
    assert out["res5"].shape == (1, 2, 3, 24)    # stride 32
    # rel-pos params exist on blocks
    assert "rel_pos_h" in vars_["params"]["block0"]["attn"]


def test_seg_model_with_davit_backbone():
    import dataclasses

    from geopurify_tpu.config import FocalNetConfig, XDecoderConfig
    from geopurify_tpu.models.xdecoder import XDecoderSegModel

    cfg = XDecoderConfig(
        backbone=FocalNetConfig(embed_dim=8, depths=(1, 1, 1, 1)),
        hidden_dim=16, conv_dim=16, mask_dim=16, num_queries=5, nheads=2,
        dim_feedforward=32, dec_layers=2, enc_layers=1,
        mask_shape=(32, 64), dtype="float32", backbone_type="davit",
    )
    model = XDecoderSegModel(cfg)
    img = jnp.zeros((1, 32, 64, 3))
    text = jnp.ones((4, 16)) / 4.0
    vars_ = model.init(jax.random.key(0), img, text, jnp.float32(10.0))
    out = model.apply(vars_, img, text, jnp.float32(10.0))
    assert out["pred_masks"].shape[2:] == (8, 16)
    assert "stage0_block0" in vars_["params"]["backbone"]
